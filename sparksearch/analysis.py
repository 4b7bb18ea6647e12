"""Text-analysis operators for training-data pipelines.

These extend the reference's capabilities (the reference has only the
tokenizer, hw2/DataLoader.cpp:27-70) with the document-level statistics a
100 TB pretraining-data pipeline needs: quality scoring, language ID, token
counting, and fingerprinting.  Everything here is pure Catalyst column
expressions (whole-stage codegen, no Python in the hot path) — each operator
is a narrow per-row map or a single skew-free aggregation, so the plans
scale linearly with input splits.

Determinism contract: every function here has an exact ANSI-SQL twin (see
__spark_entry__.py oracle_sql) — hashes use the portable md5-prefix family
(:data:`HASH60_SQL`), identical bit-for-bit in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .constants import SEPARATOR_REGEX

# Languages profiles for the heuristic language-ID: marker tokens per lang.
# Deliberately tiny + hard-coded (deterministic, broadcastable anywhere).
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is", "in", "to", "it"],
    "py": ["def", "self", "import", "None", "elif", "lambda", "print"],
    "c": ["int", "void", "struct", "char", "sizeof", "include", "static"],
    "go": ["func", "nil", "err", "range", "chan", "defer", "package"],
    "java": ["public", "class", "static", "void", "new", "extends", "final"],
}

STOPWORDS = LANG_PROFILES["en"]


def md5_hash60(col: Column) -> Column:
    """Portable 60-bit hash: int of the first 15 hex chars of md5.

    Identical in DuckDB as ``('0x' || substr(md5(x), 1, 15))::bigint`` —
    the shared deterministic hash family for minhash/simhash/fingerprints.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def tokens_array(text: Column) -> Column:
    """Array of reference-charset tokens (empty strings dropped)."""
    return F.filter(F.split(text, SEPARATOR_REGEX), lambda x: F.length(x) > 0)


def text_quality(documents: DataFrame, text_col: str = "content") -> DataFrame:
    """Per-doc quality features: (doc_id, n_chars, n_tokens, n_distinct,
    avg_token_len, alnum_ratio, stopword_ratio, quality_score).

    Narrow map stage — no shuffle; at 100 TB this is a pure scan whose cost
    is I/O-bound, and the score is usable as a pushdown-able filter column.
    """
    toks = tokens_array(F.col(text_col))
    n_chars = F.length(text_col).cast("long")
    n_tokens = F.size(toks).cast("long")
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    tok_chars = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
    stop_lit = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_lit, x))).cast("long")
    alnum = F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z0-9]", "")).cast("long")

    d = documents.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        tok_chars.alias("tok_chars"),
        n_stop.alias("n_stop"),
        alnum.alias("n_alnum"),
    )
    safe_tok = F.greatest(F.col("n_tokens"), F.lit(1)).cast("double")
    safe_chr = F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
    avg_token_len = F.col("tok_chars").cast("double") / safe_tok
    alnum_ratio = F.col("n_alnum").cast("double") / safe_chr
    stop_ratio = F.col("n_stop").cast("double") / safe_tok
    distinct_ratio = F.col("n_distinct").cast("double") / safe_tok
    # simple interpretable blend: in-range token length + alnum density +
    # lexical diversity; the exact blend is ours (no reference analog).
    score = (
        F.when((avg_token_len >= 2.0) & (avg_token_len <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
        + alnum_ratio
        + distinct_ratio
    ) / F.lit(3.0)
    return d.select(
        "doc_id",
        "n_chars",
        "n_tokens",
        "n_distinct",
        F.round(avg_token_len, 6).alias("avg_token_len"),
        F.round(alnum_ratio, 6).alias("alnum_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def language_id(documents: DataFrame, text_col: str = "content") -> DataFrame:
    """Heuristic language/dialect ID: (doc_id, pred_lang, hits).

    Marker-token voting: explode tokens, broadcast-join the (tiny) profile
    table, argmax hits per doc with (hits desc, lang asc) tie-break; docs
    with zero marker hits get 'und'.  One shuffle keyed by dense doc_id —
    skew-free by construction.
    """
    spark = documents.sparkSession
    profile_rows = [(lang, tok) for lang, toks in LANG_PROFILES.items() for tok in toks]
    profiles = spark.createDataFrame(profile_rows, "lang_cand string, term string")

    toks = documents.select("doc_id", F.explode(tokens_array(F.col(text_col))).alias("term"))
    hits = (
        toks.join(F.broadcast(profiles), "term")
        .groupBy("doc_id", "lang_cand")
        .agg(F.count("*").alias("hits"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("hits"), F.asc("lang_cand"))
    best = hits.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        documents.select("doc_id")
        .join(best.select("doc_id", "lang_cand", "hits"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("lang_cand"), F.lit("und")).alias("pred_lang"),
            F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits"),
        )
    )


# BPE-ish pre-tokenization pattern: letter runs | single digits | other glyph.
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"


def token_counts(documents: DataFrame, text_col: str = "content") -> DataFrame:
    """(doc_id, n_chars, ws_tokens, sep_tokens, bpe_ish_tokens).

    ws_tokens: whitespace-split count; sep_tokens: reference-charset count;
    bpe_ish_tokens: matches of :data:`BPE_ISH_PATTERN` (a cheap stand-in for
    a BPE pre-tokenizer pass).  Pure narrow map.
    """
    ws = F.size(F.filter(F.split(F.col(text_col), "\\s+"), lambda x: F.length(x) > 0))
    sep = F.size(tokens_array(F.col(text_col)))
    bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), F.lit(0)))
    return documents.select(
        "doc_id",
        F.length(text_col).cast("long").alias("n_chars"),
        ws.cast("long").alias("ws_tokens"),
        sep.cast("long").alias("sep_tokens"),
        bpe.cast("long").alias("bpe_ish_tokens"),
    )


def shingles(documents: DataFrame, n: int = 3, text_col: str = "content") -> DataFrame:
    """Distinct token n-gram shingles: (doc_id, shingle).

    Built with array lambdas (no UDF): slide a window of n over the token
    array.  Narrow map + explode; the downstream consumer decides the
    shuffle (dedup joins key on shingle hash).
    """
    toks = tokens_array(F.col(text_col))
    # Docs with < n tokens emit NO shingles: sequence(1, size-(n-1)) would
    # otherwise count DOWN (e.g. [1, 0] for a 2-token doc) and the window
    # would index past the array (INVALID_ARRAY_INDEX_IN_ELEMENT_AT).  The
    # guard mirrors the oracle's WHERE len(arr) >= n.
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]),
    )
    return documents.select(
        "doc_id", F.explode(F.array_distinct(gram)).alias("shingle")
    )


def eval_means(results: DataFrame, group_col: str, metric_cols: list[str], sentinel: float = -1.0) -> DataFrame:
    """Columnwise means ignoring sentinel values, per group — the
    reference's snippet-evaluation aggregation (hw3/metrix/genExpResult.py:
    1-38: mean of precision/recall columns skipping ``-1`` placeholders).

    One skew-free groupBy; each metric contributes avg + count of
    non-sentinel rows.
    """
    aggs = []
    for c in metric_cols:
        valid = F.when(F.col(c) != sentinel, F.col(c))
        aggs.append(F.round(F.avg(valid), 6).alias(f"avg_{c}"))
        aggs.append(F.count(valid).cast("long").alias(f"n_{c}"))
    return results.groupBy(group_col).agg(*aggs)


def doc_fingerprint(documents: DataFrame, n: int = 3, text_col: str = "content") -> DataFrame:
    """(doc_id, n_shingles, fp_min, fp_max): content fingerprint from the
    md5-60 hash of token n-gram shingles (rolling-hash analog of the
    reference's keyword weighting, hw3/Snippets.cpp:440-450, repurposed as a
    near-dup prefilter).  fp_min is a 1-function MinHash."""
    sh = shingles(documents, n=n, text_col=text_col)
    h = sh.select("doc_id", md5_hash60(F.col("shingle")).alias("h"))
    return h.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_shingles"),
        F.min("h").alias("fp_min"),
        F.max("h").alias("fp_max"),
    )
