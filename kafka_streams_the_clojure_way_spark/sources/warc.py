"""WARC (Web ARChive, ISO 28500) record codec — the container format
web-crawl training corpora actually arrive in (Common Crawl publishes
WARC/WET files; every large-scale text pipeline's first step is
demuxing them). Pure stdlib, same contract as ``functions/codecs``:

- :func:`warc_encode` manufactures a spec-shaped multi-record WARC blob
  from (uri, payload) pairs — the fixture side (a production corpus
  arrives already encoded; encode exists so the parse path can be
  value-checked against payloads the DuckDB oracle reproduces from the
  documents table).
- :func:`warc_parse` is a REAL parser: per record it reads the version
  line (must be ``WARC/1.0``), walks the header block line by line to
  the blank-line terminator, requires ``Content-Length``, slices
  exactly that many payload bytes, and consumes the two-CRLF record
  separator. Raises ``ValueError`` on any malformation — truncated
  payload, bad version, missing separator — the quarantine behavior an
  ingest path needs (a silently mis-framed record shifts every byte
  after it).

Scale shape: WARC files are splittable only at record boundaries; the
Spark-side pattern is one file (or one bounded record-group blob) per
task, parsed inside ``mapInPandas``, emitting small typed rows — the
classic funnel. Record-group size is bounded by the grouping key
(source x shard), never by the corpus.
"""

from __future__ import annotations

WARC_VERSION = b"WARC/1.0"
_CRLF = b"\r\n"
_SEP = _CRLF + _CRLF


def warc_encode(records: list[tuple[str, bytes]]) -> bytes:
    """Encode (uri, payload) pairs as consecutive WARC/1.0 resource
    records: version line, headers (``WARC-Type``, ``WARC-Target-URI``,
    ``Content-Length``), blank line, payload, two-CRLF separator."""
    out = bytearray()
    for uri, payload in records:
        out += WARC_VERSION + _CRLF
        out += b"WARC-Type: resource" + _CRLF
        out += b"WARC-Target-URI: " + uri.encode("utf-8") + _CRLF
        out += b"Content-Length: " + str(len(payload)).encode() + _CRLF
        out += _CRLF
        out += payload
        out += _SEP
    return bytes(out)


def warc_parse(blob: bytes) -> list[dict]:
    """Parse a multi-record WARC blob into
    ``[{uri, warc_type, content_length, payload}, ...]`` by real header
    walking (case-insensitive header names, Content-Length-framed
    payload slicing, mandatory record separator). Raises ``ValueError``
    on any corruption."""
    records: list[dict] = []
    pos = 0
    n = len(blob)
    while pos < n:
        eol = blob.find(_CRLF, pos)
        if eol < 0:
            raise ValueError(f"unterminated WARC version line at offset {pos}")
        if blob[pos:eol] != WARC_VERSION:
            raise ValueError(
                f"bad WARC version line {blob[pos:eol]!r} at offset {pos}"
            )
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = blob.find(_CRLF, pos)
            if eol < 0:
                raise ValueError(f"unterminated WARC header block at offset {pos}")
            line = blob[pos:eol]
            pos = eol + 2
            if not line:
                break
            if b":" not in line:
                raise ValueError(f"malformed WARC header line {line!r}")
            k, v = line.split(b":", 1)
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "utf-8"
            )
        if "content-length" not in headers:
            raise ValueError("WARC record missing Content-Length")
        length = int(headers["content-length"])
        if length < 0 or pos + length > n:
            raise ValueError(f"truncated WARC payload at offset {pos}")
        payload = blob[pos : pos + length]
        pos += length
        if blob[pos : pos + 4] != _SEP:
            raise ValueError(f"missing WARC record separator at offset {pos}")
        pos += 4
        records.append(
            {
                "uri": headers.get("warc-target-uri", ""),
                "warc_type": headers.get("warc-type", ""),
                "content_length": length,
                "payload": payload,
            }
        )
    return records
