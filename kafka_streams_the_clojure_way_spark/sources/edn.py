"""EDN file format as a Spark Python DataSource.

The reference's serialization is EDN end to end
(``jackdaw.serdes.edn/serde``, core.clj:6,18-19,24-26): self-describing
Clojure data with keyword-keyed maps. Our Kafka path maps that to JSON
(sources/kafka.py); this module closes the remaining gap for FILES of
EDN records — a first-class ``spark.read.format("edn")`` built on the
Spark 4 Python DataSource API, so EDN corpora can join the engine
without a pre-conversion step.

Design:

- **EDN-lines layout** (one record per line), the file twin of the
  reference's one-record-per-Kafka-message framing. Maps with keyword
  keys become rows; ``:kebab-case`` keywords become ``snake_case``
  columns (SURVEY §1.4 mapping — ``:user-id`` ↔ ``user_id``).
- **Parser is an original, dependency-free subset parser** (maps,
  vectors, sets, keywords, strings, ints, floats, booleans, nil) —
  NOT a port of any Clojure reader; the reference contains no parser
  (EDN parsing there lives in the Clojure runtime itself).
- **Scale**: one InputPartition per file — the unit of parallelism the
  format allows (EDN-lines, like JSON-lines, is line-splittable in
  principle; per-file is the simple correct start and matches how
  Spark's own json reader schedules small files). Schema must be
  supplied (schema-first engine, SURVEY §1.2 "hard part 1"); a
  sampling-based ``infer_edn_schema`` helper bridges dev ergonomics.
"""

from __future__ import annotations

import glob as _glob
import os
from typing import Any, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# --------------------------------------------------------------------------
# Minimal EDN (subset) tokenizer/parser — original implementation
# --------------------------------------------------------------------------

_WS = " \t\n\r,"  # EDN treats comma as whitespace


def _skip_ws(s: str, i: int) -> int:
    while i < len(s) and s[i] in _WS:
        i += 1
    return i


def _parse_string(s: str, i: int) -> tuple[str, int]:
    # s[i] == '"'
    out = []
    i += 1
    while i < len(s):
        c = s[i]
        if c == "\\":
            nxt = s[i + 1]
            out.append({"n": "\n", "t": "\t", "r": "\r"}.get(nxt, nxt))
            i += 2
        elif c == '"':
            return "".join(out), i + 1
        else:
            out.append(c)
            i += 1
    raise ValueError("unterminated EDN string")


_SYM_END = _WS + "]})"


def _parse_atom(s: str, i: int) -> tuple[Any, int]:
    j = i
    while j < len(s) and s[j] not in _SYM_END:
        j += 1
    tok = s[i:j]
    if tok == "nil":
        return None, j
    if tok == "true":
        return True, j
    if tok == "false":
        return False, j
    if tok.startswith(":"):
        return Keyword(tok[1:]), j
    try:
        return int(tok), j
    except ValueError:
        pass
    try:
        return float(tok), j
    except ValueError:
        pass
    return Symbol(tok), j


class Keyword(str):
    """EDN keyword (``:amount``). Subclass of str carrying the name."""

    __slots__ = ()


class Symbol(str):
    """EDN symbol (bare identifier) — kept distinct from strings."""

    __slots__ = ()


def parse_edn(s: str, i: int = 0) -> tuple[Any, int]:
    """Parse ONE EDN value starting at ``i``; returns (value, next_idx)."""
    i = _skip_ws(s, i)
    if i >= len(s):
        raise ValueError("empty EDN input")
    c = s[i]
    if c == "{":
        out: dict[Any, Any] = {}
        i += 1
        while True:
            i = _skip_ws(s, i)
            if s[i] == "}":
                return out, i + 1
            k, i = parse_edn(s, i)
            v, i = parse_edn(s, i)
            out[k] = v
    if c == "[" or (c == "(" and True):
        close = "]" if c == "[" else ")"
        arr: list[Any] = []
        i += 1
        while True:
            i = _skip_ws(s, i)
            if s[i] == close:
                return arr, i + 1
            v, i = parse_edn(s, i)
            arr.append(v)
    if c == "#" and s[i : i + 2] == "#{":
        st: list[Any] = []  # sets surface as lists (Spark has no set type)
        i += 2
        while True:
            i = _skip_ws(s, i)
            if s[i] == "}":
                return st, i + 1
            v, i = parse_edn(s, i)
            st.append(v)
    if c == '"':
        return _parse_string(s, i)
    return _parse_atom(s, i)


def keyword_to_column(name: str) -> str:
    """``:user-id`` → ``user_id`` (SURVEY §1.4 keyword↔column mapping)."""
    return name.replace("-", "_")


def column_to_keyword(name: str) -> str:
    return name.replace("_", "-")


def _coerce(value: Any, dtype) -> Any:
    if value is None:
        return None
    if isinstance(dtype, LongType):
        return int(value)
    if isinstance(dtype, DoubleType):
        return float(value)
    if isinstance(dtype, BooleanType):
        return bool(value)
    if isinstance(dtype, StringType):
        return str(value)
    return value


def record_to_row(record: dict, schema: StructType) -> tuple:
    by_col = {keyword_to_column(str(k)): v for k, v in record.items()}
    return tuple(
        _coerce(by_col.get(f.name), f.dataType) for f in schema.fields
    )


def infer_edn_schema(path: str, sample_lines: int = 100) -> StructType:
    """Sampling-based schema inference for dev ergonomics (production
    callers pass an explicit schema — inference is an extra read pass)."""
    fields: dict[str, Any] = {}
    for f in sorted(_expand(path)):
        with open(f, encoding="utf-8") as fh:
            for n, line in enumerate(fh):
                if n >= sample_lines:
                    break
                if not line.strip():
                    continue
                rec, _ = parse_edn(line)
                for k, v in rec.items():
                    col = keyword_to_column(str(k))
                    t = fields.get(col)
                    if isinstance(v, bool):
                        new = BooleanType()
                    elif isinstance(v, int):
                        new = LongType()
                    elif isinstance(v, float):
                        new = DoubleType()
                    else:
                        new = StringType()
                    if t is None:
                        fields[col] = new
                    elif type(t) is not type(new):
                        # int/float widen to double; anything else -> string
                        if {type(t), type(new)} == {LongType, DoubleType}:
                            fields[col] = DoubleType()
                        else:
                            fields[col] = StringType()
        break  # first file is enough for a sample
    return StructType([StructField(k, v) for k, v in fields.items()])


def _expand(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(_glob.glob(os.path.join(path, "*.edn")))
    return sorted(_glob.glob(path)) or [path]


# --------------------------------------------------------------------------
# DataSource plumbing
# --------------------------------------------------------------------------

class _EdnFilePartition(InputPartition):
    def __init__(self, file_path: str):
        self.file_path = file_path


class EdnReader(DataSourceReader):
    """``mode`` option: ``failfast`` (default) raises on the first
    malformed line; ``permissive`` tolerates malformed lines and non-map
    records — at a 100 TB corpus a handful of torn lines must not kill
    the job. Loss accounting follows Spark's own convention: declare a
    ``_corrupt_record`` string column in the schema and permissive mode
    lands each unparseable raw line there (data columns null) instead of
    silently dropping it — filter/count that column for an exact audit.
    Without the column, permissive drops bad lines."""

    CORRUPT_COL = "_corrupt_record"

    def __init__(self, schema: StructType, options):
        self._schema = schema
        self._path = options.get("path")
        self._permissive = options.get("mode", "failfast").lower() == "permissive"
        self._corrupt_idx = (
            schema.names.index(self.CORRUPT_COL)
            if self.CORRUPT_COL in schema.names
            else None
        )
        if not self._path:
            raise ValueError("edn datasource requires a path")

    def partitions(self):
        # one partition per file: files are the format's parallel unit
        return [_EdnFilePartition(f) for f in _expand(self._path)]

    def read(self, partition: _EdnFilePartition) -> Iterator[tuple]:
        for line in open(partition.file_path, encoding="utf-8"):
            if not line.strip():
                continue
            try:
                rec, _ = parse_edn(line)
                if not isinstance(rec, dict):
                    raise ValueError(f"EDN record is not a map: {line[:80]!r}")
            except Exception:
                if not self._permissive:
                    raise
                if self._corrupt_idx is not None:
                    row = [None] * len(self._schema.names)
                    row[self._corrupt_idx] = line.rstrip("\n")
                    yield tuple(row)
                continue
            yield record_to_row(rec, self._schema)


class _EdnCommit(WriterCommitMessage):
    def __init__(self, temp_file: str, final_name: str):
        self.temp_file = temp_file
        self.final_name = final_name


class EdnWriter(DataSourceWriter):
    """Task-temp + driver-commit protocol (same shape as Hadoop's
    FileOutputCommitter v1): every task writes to a per-attempt temp file
    under ``_temporary-<write_id>/``; ``commit()`` renames the successful
    attempts into place and — only then, for overwrite mode — removes
    pre-existing part files. Aborted/speculative attempts never leave
    partial files in the visible directory, appends can't clobber earlier
    appends (the write UUID is part of every final name), and a crashed
    job leaves the previous contents intact. Assumes a shared filesystem
    between executors and driver (true for local mode and any
    NFS/object-store mount; on HDFS/S3 a real deployment would swap in
    Spark's native committers)."""

    def __init__(self, schema: StructType, options, overwrite: bool = False):
        import uuid

        self._schema = schema
        self._path = options.get("path")
        if not self._path:
            raise ValueError("edn datasource requires a path")
        self._overwrite = overwrite
        self._write_id = uuid.uuid4().hex[:12]
        self._tmp_dir = os.path.join(self._path, f"_temporary-{self._write_id}")
        os.makedirs(self._tmp_dir, exist_ok=True)

    def write(self, iterator) -> WriterCommitMessage:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        os.makedirs(self._tmp_dir, exist_ok=True)  # executor-side, shared FS
        final_name = f"part-{ctx.partitionId():05d}-{self._write_id}.edn"
        temp = os.path.join(
            self._tmp_dir, f"{final_name}.attempt-{ctx.taskAttemptId()}"
        )
        with open(temp, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(dump_edn_record(row.asDict()) + "\n")
        return _EdnCommit(temp, final_name)

    def commit(self, messages):
        import glob as _glob
        import shutil

        if self._overwrite:
            for old in _glob.glob(os.path.join(self._path, "*.edn")):
                os.remove(old)
        for m in messages:
            os.replace(m.temp_file, os.path.join(self._path, m.final_name))
        shutil.rmtree(self._tmp_dir, ignore_errors=True)

    def abort(self, messages):
        import shutil

        shutil.rmtree(self._tmp_dir, ignore_errors=True)


def dump_edn_value(v: Any) -> str:
    if v is None:
        return "nil"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    s = str(v).replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")
    return f'"{s}"'


def dump_edn_record(d: dict) -> str:
    inner = " ".join(
        f":{column_to_keyword(k)} {dump_edn_value(v)}" for k, v in d.items()
    )
    return "{" + inner + "}"


class EdnDataSource(DataSource):
    """``spark.read.format("edn").schema(s).load(path)`` /
    ``df.write.format("edn").save(path)`` for EDN-lines files."""

    @classmethod
    def name(cls) -> str:
        return "edn"

    def schema(self):
        inferred = infer_edn_schema(self.options.get("path", ""))
        if not inferred.fields:
            raise ValueError(
                "edn datasource: pass .schema(...) or point at non-empty files"
            )
        return inferred

    def reader(self, schema: StructType) -> DataSourceReader:
        return EdnReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return EdnWriter(schema, self.options, overwrite)

    def simpleStreamReader(self, schema: StructType):
        return EdnStreamReader(schema, self.options)


def register(spark) -> None:
    """Idempotently register the ``edn`` format on a session."""
    spark.dataSource.register(EdnDataSource)


# --------------------------------------------------------------------------
# Streaming reader: tail a directory of EDN-lines files
# --------------------------------------------------------------------------

class EdnStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch source over a directory of EDN files — the brokerless
    twin of the reference's EDN Kafka topics: each newly arrived file is
    one batch of records. Offsets are the sorted list of files already
    consumed (files are immutable once written, the same assumption
    Spark's own file source makes); exactly-once follows from offset
    replay via ``readBetweenOffsets``."""

    def __init__(self, schema: StructType, options):
        self._schema = schema
        self._path = options.get("path")
        if not self._path:
            raise ValueError("edn stream requires a path")

    def initialOffset(self) -> dict:
        return {"files": []}

    def _rows_for(self, files) -> list[tuple]:
        # materialized list, not a generator: the simple-stream harness
        # pickles the prefetched batch for replay
        rows: list[tuple] = []
        for f in files:
            with open(f, encoding="utf-8") as fh:
                for line in fh:
                    if line.strip():
                        rec, _ = parse_edn(line)
                        rows.append(record_to_row(rec, self._schema))
        return rows

    def read(self, start: dict):
        seen = set(start.get("files", []))
        now = [f for f in _expand(self._path) if f not in seen]
        end = {"files": sorted(seen | set(now))}
        return self._rows_for(sorted(now)), end

    def readBetweenOffsets(self, start: dict, end: dict) -> list[tuple]:
        delta = sorted(set(end.get("files", [])) - set(start.get("files", [])))
        return self._rows_for(delta)
