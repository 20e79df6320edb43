"""WARC codec: round-trip property + framing-corruption quarantine."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_streams_the_clojure_way_spark.sources.warc import (
    warc_encode,
    warc_parse,
)

uris = st.text(
    st.characters(min_codepoint=33, max_codepoint=126, exclude_characters=":"),
    min_size=1,
    max_size=30,
).map(lambda s: f"urn:x:{s}")
payloads = st.binary(min_size=0, max_size=400)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(uris, payloads), min_size=0, max_size=8))
def test_warc_roundtrip(records):
    parsed = warc_parse(warc_encode(records))
    assert [(r["uri"], r["payload"]) for r in parsed] == records
    assert all(r["warc_type"] == "resource" for r in parsed)
    assert all(r["content_length"] == len(p) for r, (_, p) in zip(parsed, records))


def test_warc_payload_may_contain_separators():
    """Content-Length framing, not delimiter scanning: a payload that
    CONTAINS the record separator (or a fake version line) must round-
    trip — a scanner-based parser would mis-frame here."""
    evil = b"\r\n\r\nWARC/1.0\r\nContent-Length: 0\r\n\r\n"
    parsed = warc_parse(warc_encode([("urn:x:a", evil), ("urn:x:b", b"ok")]))
    assert [r["payload"] for r in parsed] == [evil, b"ok"]


def test_warc_corruption_detected():
    blob = warc_encode([("urn:x:a", b"hello world"), ("urn:x:b", b"again")])
    with pytest.raises(ValueError, match="version"):
        warc_parse(b"WARC/9.9" + blob[8:])
    with pytest.raises(ValueError, match="truncated|separator|unterminated"):
        warc_parse(blob[:-6])
    # inflate a Content-Length so it frames into the next record
    broken = blob.replace(b"Content-Length: 11", b"Content-Length: 13", 1)
    with pytest.raises(ValueError, match="separator|version|truncated"):
        warc_parse(broken)
    with pytest.raises(ValueError, match="Content-Length"):
        warc_parse(b"WARC/1.0\r\nWARC-Type: resource\r\n\r\n\r\n\r\n")
