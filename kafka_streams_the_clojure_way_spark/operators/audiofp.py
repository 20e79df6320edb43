"""Audio fingerprinting + shared-fingerprint dedup — the audio leg of
the multimodal dedup tier (text: six index families; image: pHash,
``operators/imagehash.py``; this module: frame fingerprints).

The design is the public Chromaprint/AcoustID shape (Lalinsky 2011;
same family as Haitsma & Kalker's "A Highly Robust Audio Fingerprinting
System", ISMIR'02): frame the sample stream, compute per-frame band
energies, and derive one small fingerprint per frame from the SIGN of
the energy double-difference across (band, time) — robust to volume
and small local edits because only orderings, not magnitudes, matter.
Matching is shared-fingerprint counting, never waveform comparison.

Stub decode (this container has no audio codecs): the asset payload's
bytes ARE the 8-bit sample stream — the exact convention of the other
multimodal kernels (a real build swaps the decoder; every Spark-side
shape below is unchanged). All arithmetic is integer, so the DuckDB
oracle recomputes fingerprints bit-for-bit from the same bytes.

Geometry: frames of ``FRAME_W`` = 32 samples, ``N_BANDS`` = 8 bands of
4 samples; energy E[f,b] = sum of the band's bytes; fingerprint of
frame f (f = 0..F-2) has bit b (b = 0..6) set iff
``(E[f,b] - E[f+1,b]) > (E[f,b+1] - E[f+1,b+1])`` — 7-bit values.

Scale notes (100 TB): fingerprints are ~1 int per 32 payload bytes —
the posting table is ~3% of corpus bytes; the pair join is an equi-join
on (frame_idx, fp) postings with a document-frequency cap (the
``dedup_winnow_pairs`` discipline), so a degenerate fingerprint shared
by millions of clips can never fan out quadratically — dropped keys
cost recall on REPEATED boilerplate audio only, and the cap is part of
the operator's contract (the oracle applies the same cap).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_streams_the_clojure_way_spark.sources.files import with_min_parallelism

FRAME_W = 32
N_BANDS = 8
BAND_W = FRAME_W // N_BANDS  # 4
FP_BITS = N_BANDS - 1  # 7: band double-diff needs b+1

#: drop (frame_idx, fp) posting keys seen in more than this many docs —
#: quadratic-fanout guard, same discipline as dedup_winnow_pairs.
AUDIO_DF_CAP = 50

#: a pair needs at least this many shared (frame_idx, fp) postings.
#: Measured at sf0.01 (originals + twins): chance collisions die off
#: steeply after 2 shares (40.7k@1, 3.0k@2, 230@3, 12@4) while twins
#: and genuine near-dups hold 4-16 — 4 is the knee.
AUDIO_MIN_SHARED = 4


def audio_fingerprints(
    df: DataFrame, id_col: str = "doc_id", decode: str | None = None
) -> DataFrame:
    """(id, frame_idx, fp) per asset via one Arrow-batched mapInPandas
    kernel — each payload's energy matrix, double-diff, and bit-pack are
    whole-array numpy ops; the only per-row Python is the payload loop
    (variable-length binary has no columnar kernel). Clips shorter than
    two frames (64 bytes) emit no fingerprint — too short to match.

    ``decode=None`` fingerprints the raw payload bytes as the sample
    stream (the stub convention); ``decode="wav"`` runs every payload
    through the REAL stdlib RIFF/WAVE parser
    (``functions/codecs.wav_decode_pcm8``) and fingerprints the DECODED
    8-bit PCM samples — same plan, and still oracle-bit-exact because
    mono 8-bit PCM decode round-trips the sample bytes exactly."""
    import numpy as np
    import pandas as pd

    if decode not in (None, "wav"):
        raise ValueError(f"decode must be None or 'wav', got {decode!r}")
    bitpow = None

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        nonlocal bitpow
        if bitpow is None:
            bitpow = np.left_shift(1, np.arange(FP_BITS, dtype=np.int64))
        if decode == "wav":
            from kafka_streams_the_clojure_way_spark.functions.codecs import (
                wav_decode_pcm8,
            )

            unwrap = lambda raw: wav_decode_pcm8(bytes(raw))  # noqa: E731
        else:
            unwrap = bytes
        for pdf in batches:
            ids, frames, fps = [], [], []
            for doc_id, asset in zip(pdf[id_col].values, pdf["asset"].values):
                buf = np.frombuffer(unwrap(asset["bytes"]), dtype=np.uint8)
                n_frames = buf.size // FRAME_W
                if n_frames < 2:
                    continue
                e = (
                    buf[: n_frames * FRAME_W]
                    .reshape(n_frames, N_BANDS, BAND_W)
                    .sum(axis=2, dtype=np.int64)
                )
                d = e[:-1] - e[1:]  # (F-1, 8): E[f,b] - E[f+1,b]
                bits = d[:, : FP_BITS] > d[:, 1:]
                fp = (bits * bitpow[None, :]).sum(axis=1)
                ids.extend([doc_id] * fp.size)
                frames.extend(range(fp.size))
                fps.extend(fp.tolist())
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": frames, "fp": fps},
                dtype="int64" if ids else None,
            )

    return df.select(id_col, "asset").mapInPandas(
        kernel, schema=f"{id_col} long, frame_idx long, fp long"
    )


def audio_fingerprints_sql(
    table: str = "documents", id_col: str = "doc_id", text: str = "text"
) -> str:
    """DuckDB twin of :func:`audio_fingerprints` for the stub decode
    path (payload = UTF-8 bytes of ``text``; ASCII corpus => code points
    are bytes). Returns a sub-SELECT of (id_col, frame_idx, fp)."""
    return f"""(
    WITH geo AS (
        SELECT {id_col} AS aid, {text} AS t,
               octet_length(CAST({text} AS BLOB)) AS n
        FROM {table}
    ),
    pos AS (
        SELECT aid, t, unnest(range(0, CAST((n // {FRAME_W}) * {FRAME_W} AS INT))) AS g
        FROM geo
    ),
    en AS (
        SELECT aid, (g // {FRAME_W}) AS f, ((g % {FRAME_W}) // {BAND_W}) AS b,
               SUM(unicode(substr(t, CAST(g AS INT) + 1, 1))) AS e
        FROM pos GROUP BY 1, 2, 3
    )
    SELECT a.aid AS {id_col}, CAST(a.f AS BIGINT) AS frame_idx,
           CAST(SUM(CASE WHEN (a.e - c.e) > (b.e - d.e)
                         THEN (1 << CAST(a.b AS INT)) ELSE 0 END) AS BIGINT) AS fp
    FROM en a
    JOIN en c ON c.aid = a.aid AND c.f = a.f + 1 AND c.b = a.b
    JOIN en b ON b.aid = a.aid AND b.f = a.f     AND b.b = a.b + 1
    JOIN en d ON d.aid = a.aid AND d.f = a.f + 1 AND d.b = a.b + 1
    WHERE a.b < {FP_BITS}
    GROUP BY 1, 2
)"""


def audio_fp_pairs(
    assets: DataFrame,
    id_col: str = "doc_id",
    min_shared: int = AUDIO_MIN_SHARED,
    df_cap: int = AUDIO_DF_CAP,
    decode: str | None = None,
    cache_registry: list | None = None,
) -> DataFrame:
    """Audio near-dup pairs (id_a < id_b, n_shared): equi-join the
    (frame_idx, fp) posting lists — frame-aligned, so a match means the
    same fingerprint at the same position, the bar a re-encode of the
    same clip clears and unrelated clips don't — count shared postings
    per pair, keep pairs with >= ``min_shared``. Posting keys in more
    than ``df_cap`` docs are dropped BEFORE the join (the winnowing
    discipline): no key can fan out past cap^2/2 candidate rows. The
    fingerprint frame is cached (it feeds the df-cap pass and both join
    sides); pass ``cache_registry`` to own its unpersist (the
    ``minhash_index_probe`` lifecycle contract)."""
    fps = audio_fingerprints(with_min_parallelism(assets), id_col, decode).cache()
    if cache_registry is not None:
        cache_registry.append(fps)
    keys = (
        fps.groupBy("frame_idx", "fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= df_cap)
        .select("frame_idx", "fp")
    )
    kept = fps.join(keys, ["frame_idx", "fp"], "left_semi")
    a, b = kept.alias("a"), kept.alias("b")
    return (
        a.join(
            b,
            (F.col("a.frame_idx") == F.col("b.frame_idx"))
            & (F.col("a.fp") == F.col("b.fp"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def audio_fp_pairs_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text: str = "text",
    min_shared: int = AUDIO_MIN_SHARED,
    df_cap: int = AUDIO_DF_CAP,
    prelude_ctes: str = "",
) -> str:
    """DuckDB twin of :func:`audio_fp_pairs` (same cap, same bar).
    ``prelude_ctes``: extra CTE definitions (``"name AS (...),"``)
    spliced ahead of the fingerprint CTEs so a caller can derive
    ``table`` without nesting WITH clauses."""
    return f"""
    WITH {prelude_ctes} fps AS (
        SELECT {id_col}, frame_idx, fp
        FROM {audio_fingerprints_sql(table, id_col, text)} s
    ),
    keys AS (
        SELECT frame_idx, fp FROM fps
        GROUP BY frame_idx, fp HAVING COUNT(*) <= {df_cap}
    ),
    kept AS (
        SELECT f.* FROM fps f JOIN keys USING (frame_idx, fp)
    )
    SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM kept a JOIN kept b
      ON a.frame_idx = b.frame_idx AND a.fp = b.fp
     AND a.{id_col} < b.{id_col}
    GROUP BY 1, 2 HAVING COUNT(*) >= {min_shared}
    """
