"""Text-analysis operators for LLM training-data pipelines (SURVEY.md §7
M5): token counting, quality scoring, language ID, and document
fingerprinting — all as JVM-side Catalyst expressions (no Python in the
hot path), each with a DuckDB-SQL twin generated from the SAME constants
so the oracle can't drift from the implementation.

Scale: every operator here is a narrow per-row map — no shuffle, fully
pipelined into the scan, and safe at any scale factor. The expressions
stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_streams_the_clojure_way_spark.functions.portable import MERSENNE_31

# --------------------------------------------------------------------------
# Tokenization (shared with functions.portable, re-exported for operators)
# --------------------------------------------------------------------------

TOKEN_SPLIT_RE = r"\s+"

#: BPE-ish subword proxy: word pieces, numbers, or single non-space symbols.
#: Used for token *counting* only (a real BPE vocab is model-specific).
BPE_ISH_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

#: marker stopwords per language for the n-gram/stopword language-ID
#: heuristic. Deterministic CASE priority: en > de > es > fr; 'und' etc.
#: chosen to be disjoint across languages.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "und", "die", "nicht", "ein"),
    "es": ("el", "los", "que", "y", "una"),
    "fr": ("le", "et", "les", "des", "une"),
}

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

PUNCT_CLASS = r"[^a-zA-Z0-9\s]"


def tokens_col(text: Column) -> Column:
    return F.split(F.lower(F.trim(text)), TOKEN_SPLIT_RE)


def tokens_sql(expr: str) -> str:
    return f"string_split_regex(lower(trim({expr})), '\\s+')"


# --------------------------------------------------------------------------
# Token counting
# --------------------------------------------------------------------------

def token_stats(df: DataFrame, text: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish subword count + chars/token."""
    toks = tokens_col(F.col(text))
    n_tokens = F.array_size(toks).cast("long")
    n_bpeish = F.array_size(
        F.regexp_extract_all(F.lower(F.col(text)), F.lit(BPE_ISH_RE), 0)
    ).cast("long")
    return df.withColumns(
        {
            "n_tokens": n_tokens,
            "n_bpeish_tokens": n_bpeish,
            "chars_per_token": F.round(
                F.length(text).cast("double") / F.greatest(n_tokens, F.lit(1)), 6
            ),
        }
    )


def token_stats_sql(text: str = "text") -> dict[str, str]:
    """DuckDB column expressions matching token_stats (same aliases)."""
    toks = tokens_sql(text)
    n_tokens = f"CAST(len({toks}) AS BIGINT)"
    return {
        "n_tokens": n_tokens,
        "n_bpeish_tokens": (
            f"CAST(len(regexp_extract_all(lower({text}), '{BPE_ISH_RE}')) AS BIGINT)"
        ),
        "chars_per_token": (
            f"round(CAST(length({text}) AS DOUBLE) / greatest({n_tokens}, 1), 6)"
        ),
    }


# --------------------------------------------------------------------------
# BPE-style subword tokenizer (greedy longest-match over a literal vocab)
# --------------------------------------------------------------------------

#: fixed literal subword vocabulary — the "merges" of a trained BPE/
#: WordPiece tokenizer, frozen as code so both engines share it verbatim
#: (a production build ships the real tokenizer's vocab the same way:
#: as data, not as an algorithm re-derivation). Longest-match-first is
#: implicit: the fold takes the MAX matching length at each position.
BPE_VOCAB: tuple[str, ...] = (
    "tion", "ment", "able", "ing", "ent", "ess", "ous", "ati", "the",
    "and", "ion", "er", "ed", "es", "re", "on", "at", "en", "an", "in",
    "it", "is", "of", "or", "ar", "st", "te", "ti", "le", "ri", "ro",
    "al", "de", "se", "he", "ou", "nd", "nt", "to", "as",
)


def _bpe_match_len(word: Column, pos: Column) -> Column:
    """Longest vocab unit matching ``word`` at 1-based ``pos`` (1 when
    nothing matches — every single char is implicitly in-vocab, the BPE
    base-alphabet property)."""
    return F.greatest(
        F.lit(1),
        *[
            F.when(word.substr(pos, F.lit(len(v))) == v, F.lit(len(v))).otherwise(1)
            for v in BPE_VOCAB
        ],
    )


def _bpe_word_count(w: Column) -> Column:
    """Greedy longest-match subword count of ONE word: an ``aggregate``
    fold over its character positions advancing ``pos`` by the longest
    vocab match (the fold body is a 40-branch ``greatest`` evaluated
    JVM-side — no Python)."""
    return F.aggregate(
        F.sequence(F.lit(1), F.greatest(F.length(w), F.lit(1))),
        F.struct(
            F.lit(1).cast("int").alias("pos"), F.lit(0).cast("int").alias("cnt")
        ),
        lambda acc, _: F.when(acc["pos"] > F.length(w), acc).otherwise(
            F.struct(
                (acc["pos"] + _bpe_match_len(w, acc["pos"])).alias("pos"),
                (acc["cnt"] + 1).alias("cnt"),
            )
        ),
        lambda acc: acc["cnt"],
    )


def bpe_token_count_col(text: Column) -> Column:
    """Tokenizer-faithful token count: greedy longest-match subword
    segmentation of every whitespace word against :data:`BPE_VOCAB` —
    the unit a training-data pipeline actually budgets in (whitespace
    counts misprice morphology-heavy text by 2-3x). Entirely row-local
    HOFs (no Python, no shuffle), and a DuckDB recursive-CTE twin
    replays the greedy fold exactly.

    This is the STREAMING-SAFE / single-projection form: it folds every
    word OCCURRENCE. Batch corpus accounting should prefer
    :func:`bpe_token_counts`, which folds each DISTINCT word once."""
    return F.aggregate(
        F.transform(tokens_col(text), _bpe_word_count),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )


def bpe_token_counts(
    df: DataFrame, *, id_col: str = "doc_id", text: str = "text"
) -> DataFrame:
    """(id, n_tokens_bpe) per document — the batch form of
    :func:`bpe_token_count_col`, restructured around Zipf: the greedy
    per-character fold (the heaviest per-byte scan in the registry) runs
    once per DISTINCT word, not once per occurrence. One explode ->
    distinct-word fold (|vocab| rows; Heaps' law keeps vocabulary
    sublinear in corpus size) -> re-join counts onto the occurrence
    stream -> per-doc sum. The word join is left to Catalyst/AQE: at
    bench scale the vocab side converts to a broadcast; at corpus scale
    where a vocabulary outgrows broadcast it degrades to a hash join on
    the word key — never a forced driver-side collect. Values are
    bit-identical to the occurrence fold (integer sums of the same
    per-word counts; same recursive-CTE oracle).

    Row preservation: the token stream uses ``explode_outer`` and the
    count join is a LEFT join folded with ``coalesce(sum, 0)``, so a doc
    whose token array is NULL or empty still yields a count row (0) —
    exactly like :func:`bpe_token_count_col` keeps the row. The batch
    form must not re-introduce dependence on the tokenizer's
    split('')->[''] invariant to keep rows (ADVICE r8)."""
    tok = df.select(
        F.col(id_col), F.explode_outer(tokens_col(F.col(text))).alias("__w")
    )
    vocab = (
        tok.select("__w")
        .where(F.col("__w").isNotNull())
        .distinct()
        .withColumn("__c", _bpe_word_count(F.col("__w")))
    )
    return (
        tok.join(vocab, "__w", "left")
        .groupBy(id_col)
        .agg(
            F.coalesce(F.sum("__c"), F.lit(0))
            .cast("long")
            .alias("n_tokens_bpe")
        )
    )


def bpe_token_counts_sql(pred: str = "TRUE", text: str = "text") -> str:
    """DuckDB twin of :func:`bpe_token_count_col`: the same greedy fold
    as a recursive CTE over (doc, word) rows — returns a sub-SELECT of
    (doc_id, n_tokens_bpe). UNION ALL keeps repeated words distinct, so
    duplicate words in one doc each contribute their count."""
    match_cases = ", ".join(
        f"CASE WHEN substr(w, pos, {len(v)}) = '{v}' THEN {len(v)} ELSE 1 END"
        for v in BPE_VOCAB
    )
    toks = tokens_sql(text)
    return f"""(
    WITH RECURSIVE wrds AS (
        SELECT doc_id, unnest({toks}) AS w
        FROM documents WHERE {pred}
    ),
    seg(doc_id, w, pos, cnt) AS (
        SELECT doc_id, w, 1, 0 FROM wrds
        UNION ALL
        SELECT doc_id, w, pos + greatest(1, {match_cases}), cnt + 1
        FROM seg WHERE pos <= length(w)
    )
    SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens_bpe
    FROM seg WHERE pos > length(w)
    GROUP BY doc_id
)"""


# --------------------------------------------------------------------------
# Quality scoring
# --------------------------------------------------------------------------

def quality_scores(df: DataFrame, text: str = "text") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio quality features and a
    composite 0-100 score. Pure arithmetic — identical cross-engine.
    Tokens are materialized through a projection boundary so the split
    runs once per row (the feature columns reference it twice; Catalyst's
    CollapseProject keeps a non-cheap multi-referenced producer)."""
    df = df.withColumn("__toks_q", tokens_col(F.col(text)))
    toks = F.col("__toks_q")
    n_tokens = F.greatest(F.array_size(toks), F.lit(1)).cast("double")
    n_chars = F.length(text).cast("long")
    n_punct = (
        n_chars - F.length(F.regexp_replace(F.col(text), PUNCT_CLASS, ""))
    ).cast("long")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.array_size(
        F.filter(toks, lambda t: F.array_contains(stop_arr, t))
    ).cast("double")
    punct_ratio = F.round(n_punct.cast("double") / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(n_stop / n_tokens, 6)
    # composite: long docs with some stopwords and few symbols score high.
    score = F.round(
        F.least(n_chars.cast("double") / F.lit(500.0), F.lit(1.0)) * 40
        + F.least(stop_ratio * 5, F.lit(1.0)) * 40
        + (1 - F.least(punct_ratio * 10, F.lit(1.0))) * 20,
        4,
    )
    return df.withColumns(
        {
            "n_chars_obs": n_chars,
            "punct_ratio": punct_ratio,
            "stopword_ratio": stop_ratio,
            "quality_score": score,
        }
    ).drop("__toks_q")


def quality_scores_sql(text: str = "text") -> dict[str, str]:
    toks = tokens_sql(text)
    n_tokens = f"CAST(greatest(len({toks}), 1) AS DOUBLE)"
    n_chars = f"CAST(length({text}) AS BIGINT)"
    n_punct = (
        f"CAST(length({text}) - length(regexp_replace({text}, '{PUNCT_CLASS}', '', 'g')) AS BIGINT)"
    )
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    n_stop = f"CAST(len(list_filter({toks}, t -> t IN ({stop_list}))) AS DOUBLE)"
    punct_ratio = f"round(CAST({n_punct} AS DOUBLE) / greatest({n_chars}, 1), 6)"
    stop_ratio = f"round({n_stop} / {n_tokens}, 6)"
    score = (
        f"round(least(CAST({n_chars} AS DOUBLE) / 500.0, 1.0) * 40"
        f" + least({stop_ratio} * 5, 1.0) * 40"
        f" + (1 - least({punct_ratio} * 10, 1.0)) * 20, 4)"
    )
    return {
        "n_chars_obs": n_chars,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio,
        "quality_score": score,
    }


# --------------------------------------------------------------------------
# Language ID (marker-word heuristic)
# --------------------------------------------------------------------------

def lang_id(df: DataFrame, text: str = "text") -> DataFrame:
    """Rule-based language ID: count marker stopwords per language over the
    token set; argmax with fixed priority (en,de,es,fr), 'und' (undetermined)
    when nothing matches. A real pipeline would use fastText/CLD3 — this is
    the deterministic, dependency-free heuristic variant; the *shape*
    (per-row map, no shuffle) is what matters at scale. Tokens are
    materialized through a projection boundary — the four per-language
    filter counts would otherwise each re-split the text per row."""
    df = df.withColumn("__toks_l", tokens_col(F.col(text)))
    toks = F.col("__toks_l")
    counts = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        counts[lang] = F.array_size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    best = F.greatest(*counts.values())
    pred = F.when(best <= 0, F.lit("und"))
    for lang in LANG_MARKERS:  # fixed priority = dict order
        pred = pred.when(counts[lang] == best, F.lit(lang))
    cols = {f"n_{lang}": c.cast("long") for lang, c in counts.items()}
    cols["lang_pred"] = pred
    return df.withColumns(cols).drop("__toks_l")


def lang_id_sql(text: str = "text") -> dict[str, str]:
    toks = tokens_sql(text)
    counts = {}
    for lang, markers in LANG_MARKERS.items():
        lst = ", ".join(f"'{m}'" for m in markers)
        counts[lang] = f"len(list_filter({toks}, t -> t IN ({lst})))"
    best = "greatest(" + ", ".join(counts.values()) + ")"
    branches = " ".join(
        f"WHEN {counts[lang]} = {best} THEN '{lang}'" for lang in LANG_MARKERS
    )
    out = {f"n_{lang}": f"CAST({c} AS BIGINT)" for lang, c in counts.items()}
    out["lang_pred"] = f"(CASE WHEN {best} <= 0 THEN 'und' {branches} END)"
    return out


# --------------------------------------------------------------------------
# Document fingerprinting (polynomial rolling hash over tokens)
# --------------------------------------------------------------------------

FP_BASE = 31


def fingerprint(df: DataFrame, text: str = "text") -> DataFrame:
    """Order-sensitive document fingerprint: fold the token stream through
    ``acc = (acc * 31 + token_hash) mod M31``. Detects exact and
    prefix-shifted duplicates; cheap (one pass, no shuffle)."""
    toks = tokens_col(F.col(text))
    # portable per-token 31-bit hash (md5-based, see functions.portable)
    tok_hash = lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long") % F.lit(  # noqa: E731
        MERSENNE_31
    )
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * F.lit(FP_BASE) + tok_hash(t)) % F.lit(MERSENNE_31),
    )
    return df.withColumn("fingerprint", fp)


def fingerprint_sql(text: str = "text") -> str:
    toks = tokens_sql(text)
    tok_hash = "(('0x' || substring(md5(t), 1, 15))::BIGINT % " + str(MERSENNE_31) + ")"
    # DuckDB list_reduce uses the first element as the seed, so prepend the
    # zero seed explicitly to mirror Spark's aggregate(…, 0, …).
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform({toks}, t -> {tok_hash})), "
        f"(acc, h) -> (acc * {FP_BASE} + h) % {MERSENNE_31})"
    )


# --------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD'03)
# --------------------------------------------------------------------------

#: winnowing parameters: k-gram size and window width. Guarantee: any
#: shared substring of >= WINNOW_K + WINNOW_W - 1 tokens produces at
#: least one shared selected fingerprint.
WINNOW_K = 5
WINNOW_W = 4


def _winnow_grams_col(text: Column) -> Column:
    """hash60 of every WINNOW_K-token gram (array<bigint>; empty under K
    tokens). Token array let-bound — the per-gram lambda must slice a
    bound attribute, not re-split the text per element (portable.let_col)."""
    from kafka_streams_the_clojure_way_spark.functions.portable import (
        hash60,
        let_col,
    )

    def body(toks: Column) -> Column:
        n = F.array_size(toks)
        return F.when(
            n < WINNOW_K, F.array().cast("array<bigint>")
        ).otherwise(
            F.transform(
                F.sequence(F.lit(1), n - (WINNOW_K - 1)),
                lambda i: hash60(F.array_join(F.slice(toks, i, WINNOW_K), " ")),
            )
        )

    return let_col(tokens_col(text), body)


def winnow_fingerprints(
    df: DataFrame, text: str = "text"
) -> DataFrame:
    """Per-document winnowing fingerprint summary (Schleimer et al.
    SIGMOD'03 — the MOSS local fingerprinting scheme): hash every
    k-token gram, slide a w-gram window, keep each window's MINIMUM
    hash; the distinct selected hashes are the document's fingerprints.
    Unlike MinHash (a global sketch) the guarantee is LOCAL: any shared
    run of >= k+w-1 tokens yields a shared fingerprint, which is what
    plagiarism/partial-copy detection needs.

    Output columns: ``n_grams``, ``n_fingerprints`` (distinct selected
    hashes) and ``fp_xor`` (order-free XOR fold of the selected set —
    a comparable per-doc digest). Entirely row-local higher-order
    functions — zero shuffle, zero Python; selection uses the hash
    VALUE only (not its position), so the result is deterministic and
    engine-portable without the rightmost-tie rule."""
    df = df.withColumn("_grams", _winnow_grams_col(F.col(text)))
    ng = F.array_size(F.col("_grams"))
    sel = F.when(ng == 0, F.array().cast("array<bigint>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(1), F.greatest(ng - (WINNOW_W - 1), F.lit(1))
                ),
                lambda j: F.array_min(F.slice(F.col("_grams"), j, WINNOW_W)),
            )
        )
    )
    df = df.withColumn("_sel", sel)
    fp_xor = F.aggregate(
        F.col("_sel"),
        F.lit(0).cast("long"),
        lambda acc, v: acc.bitwiseXOR(v),
    )
    return df.select(
        *[c for c in df.columns if c not in ("_grams", "_sel")],
        ng.cast("long").alias("n_grams"),
        F.array_size(F.col("_sel")).cast("long").alias("n_fingerprints"),
        fp_xor.alias("fp_xor"),
    )


#: document-frequency cap for fingerprint postings: a fingerprint
#: selected in more than this many documents is corpus boilerplate —
#: joining on it would fan out quadratically in its df (the hot-shingle
#: pathology), and MOSS-style matching drops such grams for relevance
#: anyway.
WINNOW_MAX_DF = 10


def winnow_posts(
    df: DataFrame, *, id_col: str = "doc_id", text: str = "text"
) -> DataFrame:
    """(id, h) posting of every SELECTED winnowing fingerprint — the
    shared upstream of the corpus-level MOSS join (:func:`winnow_pairs`)
    and anything else that matches on selected fingerprints. Row-local
    (gram hashing + window-min selection are higher-order functions over
    the token array), so the posting table is the one artifact worth
    materializing per corpus: ~1/w of the gram stream, written once."""
    g = df.select(F.col(id_col), _winnow_grams_col(F.col(text)).alias("_grams"))
    ng = F.array_size(F.col("_grams"))
    sel = F.when(ng == 0, F.array().cast("array<bigint>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(1), F.greatest(ng - (WINNOW_W - 1), F.lit(1))
                ),
                lambda j: F.array_min(F.slice(F.col("_grams"), j, WINNOW_W)),
            )
        )
    )
    return g.select(F.col(id_col), F.explode(sel).alias("h"))


def winnow_pairs(
    df: DataFrame,
    *,
    min_shared: int = 3,
    max_df: int = WINNOW_MAX_DF,
    id_col: str = "doc_id",
    text: str = "text",
    posts: DataFrame | None = None,
) -> DataFrame:
    """Partial-copy candidate pairs via shared winnowing fingerprints
    (the corpus-level MOSS join): documents sharing >= ``min_shared``
    selected fingerprints. Because selection keeps ~1/w of the grams,
    the posting table is a fraction of a full shingle-posting join's,
    and the local guarantee still holds — any shared run of
    >= k + w - 1 tokens contributes a shared fingerprint.

    Scale shape: one explode -> df-capped postings -> equi-join on the
    fingerprint hash -> pair count. The ``max_df`` cap bounds the fanout
    of any single fingerprint to df^2 <= {max_df}^2 pairs, so a
    boilerplate gram can never funnel O(corpus^2) rows through one key
    (drop it: it carries no copy signal).

    ``posts``: a precomputed :func:`winnow_posts` frame (same corpus,
    same K/W) — the shared-upstream convention; the df cap and join
    still run here, so thresholds stay per-call dials."""
    if posts is None:
        posts = winnow_posts(df, id_col=id_col, text=text)
    live = (
        posts.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
        .select("h")
    )
    posts = posts.join(live, "h")
    a = posts.select(F.col("h"), F.col(id_col).alias("id_a"))
    b = posts.select(F.col("h"), F.col(id_col).alias("id_b"))
    return (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def winnow_sql(text: str = "text") -> dict[str, str]:
    """DuckDB twins of :func:`winnow_fingerprints`'s three outputs, as
    expressions over a ``grams`` list column (see the query's CTE)."""
    from kafka_streams_the_clojure_way_spark.functions.portable import hash60_sql

    toks = tokens_sql(text)
    gram = hash60_sql(
        f"array_to_string({toks}[i:i+{WINNOW_K - 1}], ' ')"
    )
    grams = (
        f"CASE WHEN len({toks}) < {WINNOW_K} THEN CAST([] AS BIGINT[]) "
        f"ELSE list_transform(range(1, len({toks}) - {WINNOW_K - 2}), "
        f"i -> {gram}) END"
    )
    sel = (
        f"CASE WHEN len(grams) = 0 THEN CAST([] AS BIGINT[]) "
        f"ELSE list_distinct(list_transform("
        f"range(1, greatest(len(grams) - {WINNOW_W - 1}, 1) + 1), "
        f"j -> list_min(grams[j:j+{WINNOW_W - 1}]))) END"
    )
    fp_xor = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), sel), "
        "(acc, v) -> xor(acc, v))"
    )
    return {"grams": grams, "sel": sel, "fp_xor": fp_xor}


# --------------------------------------------------------------------------
# Gopher-style quality rules (repetition + structure signals)
# --------------------------------------------------------------------------

#: Rule thresholds (Gopher, Rae et al. 2021 §A1.1, adapted to the corpus:
#: the synthetic docs are single-line, so line-level rules are replaced by
#: the token-diversity rule that catches the same repetition failure mode).
GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 100_000
GOPHER_MEAN_WORD_LEN = (3.0, 10.0)
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_DISTINCT_RATIO = 0.2


def gopher_quality(df: DataFrame, text: str = "text") -> DataFrame:
    """Per-document quality-rule flags: word-count bounds, mean word
    length, symbol-to-word ratio, distinct-token ratio, and the composite
    keep/drop decision. Row-local Catalyst expressions only — pipelined
    into the scan, no shuffle, no Python. Tokens are materialized
    through a projection boundary so the split runs once per row (the
    rule columns reference it 3x)."""
    df = df.withColumn("__toks_g", tokens_col(F.col(text)))
    toks = F.col("__toks_g")
    n_words = F.array_size(toks).cast("long")
    n_words_d = F.greatest(n_words, F.lit(1)).cast("double")
    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    mean_wl = F.round(sum_len.cast("double") / n_words_d, 6)
    n_symbols = (
        F.length(text) - F.length(F.regexp_replace(F.col(text), PUNCT_CLASS, ""))
    ).cast("double")
    symbol_ratio = F.round(n_symbols / n_words_d, 6)
    distinct_ratio = F.round(
        F.array_size(F.array_distinct(toks)).cast("double") / n_words_d, 6
    )
    lo, hi = GOPHER_MEAN_WORD_LEN
    keep = (
        n_words.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & mean_wl.between(lo, hi)
        & (symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO)
        & (distinct_ratio >= GOPHER_MIN_DISTINCT_RATIO)
    )
    return df.withColumns(
        {
            "n_words": n_words,
            "mean_word_len": mean_wl,
            "symbol_word_ratio": symbol_ratio,
            "distinct_token_ratio": distinct_ratio,
            "quality_keep": keep,
        }
    ).drop("__toks_g")


def gopher_quality_sql(text: str = "text") -> dict[str, str]:
    toks = tokens_sql(text)
    n_words = f"CAST(len({toks}) AS BIGINT)"
    n_words_d = f"CAST(greatest({n_words}, 1) AS DOUBLE)"
    sum_len = f"list_sum(list_transform({toks}, t -> length(t)))"
    mean_wl = f"round(coalesce(CAST({sum_len} AS DOUBLE), 0) / {n_words_d}, 6)"
    n_symbols = (
        f"CAST(length({text}) - length(regexp_replace({text}, '{PUNCT_CLASS}', '', 'g')) AS DOUBLE)"
    )
    symbol_ratio = f"round({n_symbols} / {n_words_d}, 6)"
    distinct_ratio = f"round(CAST(len(list_distinct({toks})) AS DOUBLE) / {n_words_d}, 6)"
    lo, hi = GOPHER_MEAN_WORD_LEN
    keep = (
        f"({n_words} BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}"
        f" AND {mean_wl} BETWEEN {lo} AND {hi}"
        f" AND {symbol_ratio} <= {GOPHER_MAX_SYMBOL_RATIO}"
        f" AND {distinct_ratio} >= {GOPHER_MIN_DISTINCT_RATIO})"
    )
    return {
        "n_words": n_words,
        "mean_word_len": mean_wl,
        "symbol_word_ratio": symbol_ratio,
        "distinct_token_ratio": distinct_ratio,
        "quality_keep": keep,
    }


# --------------------------------------------------------------------------
# Benchmark contamination (n-gram overlap against a held-out probe set)
# --------------------------------------------------------------------------

CONTAM_NGRAM = 5


def shingles_col(text: Column, k: int = CONTAM_NGRAM) -> Column:
    """Distinct k-token shingles of a document (empty array when the
    document is shorter than k tokens). The token array is let-bound so
    the per-shingle lambda slices a bound attribute instead of
    re-splitting the text per element (see portable.let_col — the inline
    form is O(len^2) per doc and measured 8x slower at sf0.1)."""
    from kafka_streams_the_clojure_way_spark.functions.portable import let_col

    def body(toks: Column) -> Column:
        n = F.array_size(toks)
        return F.when(n < k, F.array().cast("array<string>")).otherwise(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), n - (k - 1)),
                    lambda i: F.array_join(F.slice(toks, i, k), " "),
                )
            )
        )

    return let_col(tokens_col(text), body)


def shingles_sql(expr: str, k: int = CONTAM_NGRAM) -> str:
    toks = tokens_sql(expr)
    return (
        f"CASE WHEN len({toks}) < {k} THEN [] "
        f"ELSE list_distinct(list_transform(range(1, len({toks}) - {k - 2}), "
        f"i -> array_to_string({toks}[i:i+{k - 1}], ' '))) END"
    )


# --------------------------------------------------------------------------
# Repetition signature (Gopher-style repetitive-content flags)
# --------------------------------------------------------------------------

REP_NGRAM = 5  # duplicate-n-gram size for the repetition fraction


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    *,
    toks_col: str | None = None,
) -> DataFrame:
    """Repetitive-content signature per document (Rae et al. 2021 §A1.1
    adapted to an unlined corpus): the fraction of all bigrams taken by
    the single most frequent bigram (``top_bigram_frac``) and the
    duplicate fraction of 5-grams (``dup_5gram_frac``) — the two signals
    that catch boilerplate/looping text that per-token quality scores
    miss.

    Scale: n-gram construction is a per-row Catalyst expression; the
    counts are two explode→count aggregations keyed by (doc, gram), both
    shuffles carrying one row per DISTINCT gram per doc (partial
    aggregation collapses repeats map-side — the repetitive docs this
    operator flags are exactly the ones that compress best). Documents
    shorter than 2 (bigrams) tokens drop out; shorter than 5 get a NULL
    dup_5gram_frac via the left join — same semantics in the SQL twin.

    ``toks_col``: consume a pre-tokenized array column instead of
    tokenizing ``text`` (r12) — callers with a materialized token table
    (``toks`` IS ``tokens_col(text)``) skip the tokenize pass; the gram
    expressions are unchanged either way.
    """
    toks = F.col(toks_col) if toks_col else tokens_col(F.col(text))
    d = df.select(F.col(id_col), toks.alias("__w"))
    grams = d.select(
        id_col,
        F.expr(
            "zip_with(slice(__w, 1, size(__w) - 1), slice(__w, 2, size(__w) - 1),"
            " (a, b) -> concat(a, ' ', b))"
        ).alias("__bi"),
        F.expr(
            f"CASE WHEN size(__w) >= {REP_NGRAM} THEN "
            f"transform(sequence(1, size(__w) - {REP_NGRAM - 1}),"
            f" i -> array_join(slice(__w, i, {REP_NGRAM}), ' ')) "
            "ELSE array() END"
        ).alias("__five"),
    )
    # explode_outer + isNotNull (not plain explode): see text_ngram_contamination
    bi = (
        grams.select(id_col, F.explode_outer("__bi").alias("bg"))
        .filter(F.col("bg").isNotNull())
        .groupBy(id_col, "bg")
        .count()
        .groupBy(id_col)
        .agg(
            F.sum("count").alias("n_bigrams"),
            F.max("count").alias("top_bigram_n"),
        )
    )
    five = (
        grams.select(id_col, F.explode_outer("__five").alias("g"))
        .filter(F.col("g").isNotNull())
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_5grams"),
            F.count_distinct("g").alias("__d5"),
        )
    )
    return bi.join(five, id_col, "left").select(
        id_col,
        "n_bigrams",
        "top_bigram_n",
        F.round(F.col("top_bigram_n") / F.col("n_bigrams"), 6).alias("top_bigram_frac"),
        "n_5grams",
        F.round(1 - F.col("__d5") / F.col("n_5grams"), 6).alias("dup_5gram_frac"),
    )


def repetition_stats_sql(table: str = "documents", id_col: str = "doc_id", text: str = "text") -> str:
    toks = tokens_sql(text)
    return f"""
    WITH toks AS (SELECT {id_col}, {toks} AS w FROM {table}),
    bi AS (
        SELECT {id_col}, w[CAST(i AS INTEGER)] || ' ' || w[CAST(i AS INTEGER) + 1] AS bg
        FROM toks, unnest(range(1, len(w))) AS t(i)
    ),
    bic AS (SELECT {id_col}, bg, COUNT(*) AS c FROM bi GROUP BY 1, 2),
    bstats AS (
        SELECT {id_col}, CAST(SUM(c) AS BIGINT) AS n_bigrams,
               CAST(MAX(c) AS BIGINT) AS top_bigram_n
        FROM bic GROUP BY 1
    ),
    fv AS (
        SELECT {id_col},
               array_to_string(w[CAST(i AS INTEGER):CAST(i AS INTEGER) + {REP_NGRAM - 1}], ' ') AS g
        FROM toks, unnest(range(1, len(w) - {REP_NGRAM - 2})) AS t(i)
        WHERE len(w) >= {REP_NGRAM}
    ),
    fstats AS (
        SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS n_5grams,
               COUNT(DISTINCT g) AS d5
        FROM fv GROUP BY 1
    )
    SELECT b.{id_col}, b.n_bigrams, b.top_bigram_n,
           round(CAST(b.top_bigram_n AS DOUBLE) / b.n_bigrams, 6) AS top_bigram_frac,
           f.n_5grams,
           round(1 - CAST(f.d5 AS DOUBLE) / f.n_5grams, 6) AS dup_5gram_frac
    FROM bstats b LEFT JOIN fstats f USING ({id_col})
    """


# --------------------------------------------------------------------------
# PII scrubbing (emails / URLs / phone numbers)
# --------------------------------------------------------------------------

#: Patterns restricted to the syntax subset Java regex and RE2 (DuckDB)
#: interpret identically: no backreferences, no lookaround.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_URL_RE = r"https?://[^\s]+"
PII_PHONE_RE = r"\+?[0-9][0-9 ()\-]{6,}[0-9]"

_PII_ORDER = (  # applied sequentially; order matters (URLs may contain digits)
    ("email", PII_EMAIL_RE, "<EMAIL>"),
    ("url", PII_URL_RE, "<URL>"),
    ("phone", PII_PHONE_RE, "<PHONE>"),
)


def pii_scrub(df: DataFrame, text: str = "text") -> DataFrame:
    """Redact emails, URLs, and phone numbers; emit per-kind match counts
    and the scrubbed text as ``clean``. The training-corpus hygiene pass
    every pipeline needs before release. Pure per-row regex — pipelined
    into the scan, no shuffle, no Python. Counts are taken on the
    progressively scrubbed text (emails on the original, URLs after
    email redaction, phones after URL redaction) so the three patterns
    can't double-count one span; the SQL twin applies the identical
    order."""
    out = df
    col = F.col(text)
    for kind, pat, repl in _PII_ORDER:
        out = out.withColumn(f"n_{kind}s", F.regexp_count(col, F.lit(pat)))
        col = F.regexp_replace(col, pat, repl)
    return out.withColumn("clean", col)


def pii_scrub_sql(text: str = "text") -> dict[str, str]:
    """Column expr -> SQL, in output order (``n_emails``...``clean``)."""
    out: dict[str, str] = {}
    col = text
    for kind, pat, repl in _PII_ORDER:
        out[f"n_{kind}s"] = f"len(regexp_extract_all({col}, '{pat}'))"
        col = f"regexp_replace({col}, '{pat}', '{repl}', 'g')"
    out["clean"] = col
    return out


# --------------------------------------------------------------------------
# DSIR importance scoring, stateless form (streaming-safe)
# --------------------------------------------------------------------------

DSIR_BUCKETS = 256


def dsir_bucket_ratios(
    corpus: DataFrame,
    target,
    *,
    text: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> list[float]:
    """Train the DSIR log-ratio table (Xie et al. NeurIPS'23) from a
    reference corpus: ln(p_target/p_source) per hashed unigram bucket,
    add-1 smoothed, as a plain Python list of length ``n_buckets``.
    ``target`` is a boolean Column selecting the target slice.

    The collect is n_buckets rows — bounded by the MODEL (hashed
    features), never the corpus/vocabulary, exactly like the k-means
    centroid collects. One conditional-agg token pass builds both
    distributions."""
    from kafka_streams_the_clojure_way_spark.functions import portable as P

    tok = corpus.select(
        target.alias("__t"),
        F.explode_outer(tokens_col(F.col(text))).alias("__tok"),
    ).filter(F.col("__tok").isNotNull())
    dist = (
        tok.groupBy((P.hash60(F.col("__tok")) % n_buckets).alias("__b"))
        .agg(
            F.count(F.lit(1)).alias("n_s"),
            F.count_if(F.col("__t")).alias("n_t"),
        )
        .collect()
    )
    t_s = float(sum(r.n_s for r in dist))
    t_t = float(sum(r.n_t for r in dist))
    import math

    ratios = [
        math.log((0 + 1.0) / (t_t + n_buckets) / ((0 + 1.0) / (t_s + n_buckets)))
    ] * n_buckets
    for r in dist:
        ratios[r["__b"]] = math.log(
            ((r.n_t + 1.0) / (t_t + n_buckets))
            / ((r.n_s + 1.0) / (t_s + n_buckets))
        )
    return ratios


#: fixed-point micro-units for quantized DSIR scoring: one part in 1e6
#: of a log-ratio — the same resolution the round(·, 6) output reports.
DSIR_Q = 1_000_000


def dsir_score_stateless(
    docs: DataFrame,
    ratios: list[float],
    *,
    text: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DSIR_BUCKETS,
    quantize: bool = False,
) -> DataFrame:
    """Score documents against a trained DSIR ratio table with ZERO
    shuffle and ZERO aggregation state: the ratio table rides along as a
    256-element array literal, and the per-doc log-weight is a row-local
    higher-order fold over the token array — so this exact expression
    runs unchanged on a STREAMING DataFrame in append mode (the
    continuous-ingestion quality gate: train ratios on the reference
    corpus batch-side, score every arriving micro-batch statelessly).

    Output: (id, n_tokens, dsir_logweight_r) per document. NULL text
    scores 0.0 over 0 tokens (no evidence); empty text follows the
    shared tokenizer (one "" token) for consistency with token_stats.

    ``quantize=True`` folds each ratio as a BIGINT of micro-units
    (``round(r * 1e6)``) and divides once at the end — the sum is then
    exact and ORDER-INDEPENDENT, so a SQL oracle that groups tokens by
    bucket reproduces the fold bit-for-bit and a downstream threshold
    filter (the ingestion gate) can never flip on summation-order ULPs.
    Default False keeps the original double fold (round-6 output is
    unchanged in practice; existing parity tests pin it)."""
    from kafka_streams_the_clojure_way_spark.functions import portable as P

    if len(ratios) != n_buckets:
        raise ValueError(f"ratio table must have {n_buckets} entries, got {len(ratios)}")
    # projection boundary: the fold input and the n_tokens output both
    # reference the token array — split once per row (streaming-safe:
    # withColumn is a stateless projection).
    docs = docs.withColumn("__toks_d", tokens_col(F.col(text)))
    toks = F.col("__toks_d")
    bucket_ix = lambda t: (P.hash60(t) % n_buckets + 1).cast("int")  # noqa: E731
    if quantize:
        import math

        def _q(r: float) -> int:
            # HALF-AWAY-FROM-ZERO, matching SQL round() in both engines —
            # Python's built-in round is banker's rounding and would
            # disagree on exact .5 boundaries.
            v = float(r) * DSIR_Q
            return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))

        qarr = F.array(*[F.lit(_q(r)) for r in ratios])
        qsum = F.aggregate(
            toks,
            F.lit(0).cast("long"),
            lambda acc, t: acc + F.element_at(qarr, bucket_ix(t)),
        )
        logw = F.round(qsum.cast("double") / DSIR_Q, 6)
    else:
        ratio_arr = F.array(*[F.lit(float(r)) for r in ratios])
        logw = F.round(
            F.aggregate(
                toks,
                F.lit(0.0),
                lambda acc, t: acc + F.element_at(ratio_arr, bucket_ix(t)),
            ),
            6,
        )
    return docs.select(
        F.col(id_col),
        F.coalesce(F.array_size(toks), F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce(logw, F.lit(0.0)).alias("dsir_logweight_r"),
    )


# --------------------------------------------------------------------------
# PSI drift monitoring (stateless-per-batch form, streaming-safe)
# --------------------------------------------------------------------------

#: PSI token-length bins: fixed edges (not quantiles) so two populations
#: bin identically — quantile edges would move with the data and absorb
#: exactly the drift being measured. 6 bins over the shipped 10..99
#: token range; values outside clamp into the edge bins.
PSI_BINS = 6
PSI_LO = 10
PSI_WIDTH = 16
#: fixed-point micro-units for per-bin PSI terms — quantized BEFORE the
#: sum so the reported index is exact and order/partitioning-free (same
#: ULP-proofing as the quantized DSIR fold).
PSI_Q = 1_000_000


def psi_token_bin(text: Column) -> Column:
    """Fixed-edge token-count bin of a text column (0..PSI_BINS-1).
    Clamped BEFORE the division: DuckDB's // truncates toward zero
    while Spark's floor() floors, so negatives must never reach it."""
    n_tok = F.size(tokens_col(text))
    return F.least(
        F.lit(PSI_BINS - 1),
        F.floor(F.greatest(F.lit(0), n_tok - F.lit(PSI_LO)) / F.lit(PSI_WIDTH)),
    )


def psi_reference_counts(
    df: DataFrame, *, text: str = "text", source_col: str = "source"
) -> list[tuple]:
    """Train the drift monitor's reference: per-(source, bin) doc counts
    of the reference corpus, collected to the driver — model-sized
    (|sources| x PSI_BINS rows, like the 256-entry DSIR ratio table),
    so the monitor can score every arriving batch against a broadcast
    literal with no reference re-scan."""
    rows = (
        df.select(F.col(source_col).alias("source"), psi_token_bin(F.col(text)).alias("bin"))
        .groupBy("source", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return [(r["source"], int(r["bin"]), int(r["n"])) for r in rows]


def psi_against_reference(
    spark,
    batch: DataFrame,
    ref_counts: list[tuple],
    *,
    text: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Population Stability Index of an arriving batch against a trained
    reference, per source: ONE batch scan into a (source x bin) count
    grid, then all arithmetic on the grid joined to the broadcast
    reference literal. Add-1 smoothing keeps empty bins defined; per-bin
    terms quantize to BIGINT micro-units before the sum (exact,
    order-free — the same contract as the registered
    ``dq_source_drift_psi``, pinned by a parity test). Sources absent
    from the reference are ignored: a NEW source is a topology event
    for the ingest operator, not a drift measurement (PSI against an
    empty reference is unbounded by construction).

    Output: (source, n_batch, n_ref, psi_r) — one row per reference
    source, including sources the batch never hit (their drift is
    exactly the batch's absence)."""
    srcs = sorted({s for s, _, _ in ref_counts})
    lookup = {(s, b): n for s, b, n in ref_counts}
    grid_rows = [
        (s, b, lookup.get((s, b), 0)) for s in srcs for b in range(PSI_BINS)
    ]
    grid = spark.createDataFrame(grid_rows, "source string, bin long, c_ref long")
    counts = (
        batch.select(
            F.col(source_col).alias("source"), psi_token_bin(F.col(text)).alias("bin")
        )
        .groupBy("source", "bin")
        .agg(F.count(F.lit(1)).alias("c_new"))
    )
    # broadcast the batch-count side (bounded by |batch sources| x bins);
    # the grid must stay the preserved side of the left join.
    joined = grid.join(F.broadcast(counts), ["source", "bin"], "left").select(
        "source", "bin", "c_ref", F.coalesce("c_new", F.lit(0)).alias("c_new")
    )
    totals = joined.groupBy("source").agg(
        F.sum("c_new").alias("n_batch"), F.sum("c_ref").alias("n_ref")
    )
    full = joined.join(totals, "source")
    pa = (F.col("c_new") + F.lit(1)).cast("double") / (
        F.col("n_batch") + F.lit(PSI_BINS)
    ).cast("double")
    pb = (F.col("c_ref") + F.lit(1)).cast("double") / (
        F.col("n_ref") + F.lit(PSI_BINS)
    ).cast("double")
    q = F.round(((pa - pb) * F.log(pa / pb)) * F.lit(1000000.0)).cast("long")
    return (
        full.select("source", "n_batch", "n_ref", q.alias("q"))
        .groupBy("source", "n_batch", "n_ref")
        .agg(F.round(F.sum("q").cast("double") / F.lit(PSI_Q), 6).alias("psi_r"))
    )
