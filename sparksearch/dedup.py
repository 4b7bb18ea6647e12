"""Deduplication operators — exact and near-dup, designed for 100 TB corpora.

Cache lifecycle (ADVICE r2): the shingle / signature / fingerprint
intermediates are ``persist()``-ed because each feeds several subplans of
the RETURNED lazy DataFrame, so this module cannot unpersist them before
the caller's action runs.  Spark's ContextCleaner releases the blocks once
the returned plan is garbage-collected; a long-lived session issuing many
dedup scans back-to-back can reclaim memory sooner via
``spark.catalog.clearCache()`` or by unpersisting explicitly.  The blocks
are MEMORY_AND_DISK and evictable, so accumulation degrades to recompute,
never to OOM.

Scale design notes (per operator):

* exact: one shuffle keyed by content hash (uniform by construction — sha256
  of content cannot skew).
* n-gram Jaccard: pair generation via an equi-join on shared shingles, NOT a
  cross join; hot shingles are the skew risk, so pairs are generated from
  *distinct* (doc, shingle) rows and a ``max_df`` guard drops stop-shingles
  (a shingle in >max_df docs contributes O(df²) pairs and near-zero signal —
  the standard suffix-filtering trick).
* MinHash/LSH: signatures are k independent min-aggregations (map-side
  partial agg, skew-free); banding turns near-dup search into an equi-join
  on (band, band_hash) buckets.  All hashes use the portable md5-60 family
  so every stage has an exact DuckDB oracle.
* SimHash: 60-bit weighted-projection fingerprint; hamming candidates via
  (t+1)-segment blocking — pigeonhole: hamming <= t differences cannot touch
  all t+1 segments, so some segment is equal and the equi-join finds the
  pair.  FULL recall at the requested threshold by construction; the
  trade-off is selectivity (segment width 60/(t+1) bits), which is why
  production simhash dedup keeps t small (3-8 for 60-64 bits).

The reference engine has no dedup (its corpus is pre-cleaned MS MARCO);
these operators are the training-data-pipeline extension mandated by the
build brief, built only from Catalyst primitives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .analysis import md5_hash60, shingles

DEFAULT_NUM_HASHES = 16
DEFAULT_BANDS = 4
SIMHASH_BITS = 60


def simhash_segments(max_hamming: int) -> list[tuple[int, int, int]]:
    """[(seg_idx, bit_offset, width)]: the pigeonhole blocking layout for a
    hamming threshold t — t+1 segments covering all 60 bits (wider segments
    first).  t=3 gives the classic 4x15-bit layout."""
    s = max_hamming + 1
    if s > SIMHASH_BITS:
        raise ValueError(f"max_hamming must be < {SIMHASH_BITS}")
    base, rem = divmod(SIMHASH_BITS, s)
    segs, off = [], 0
    for i in range(s):
        w = base + (1 if i < rem else 0)
        segs.append((i, off, w))
        off += w
    return segs

# Affine MinHash permutation family over the Mersenne prime 2^31-1:
# h_i(x) = (a_i * x31 + b_i) mod P with x31 = md5_60(shingle) mod P.
# One md5 per shingle instead of k; the (a_i, b_i) table is a pure function
# of i so the DuckDB oracle regenerates it bit-identically.
MINHASH_PRIME = 2_147_483_647


def minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    # Weyl-style deterministic constants; any fixed odd multiplier works.
    return [
        ((2 * i + 1) * 2_654_435_761 % MINHASH_PRIME, (i * 40_503 + 1) % MINHASH_PRIME)
        for i in range(num_hashes)
    ]


def exact_duplicates(documents: DataFrame, text_col: str = "content") -> DataFrame:
    """(doc_id, dup_group, group_size, is_canonical): exact dedup by sha256.

    Canonical = min doc_id per group (deterministic survivor).  Single
    uniform shuffle; at 10^12 rows the groupBy key is the hash itself so no
    salting is ever needed.
    """
    hashed = documents.select("doc_id", F.sha2(F.col(text_col), 256).alias("dup_group"))
    w = Window.partitionBy("dup_group")
    return (
        hashed.withColumn("group_size", F.count("*").over(w).cast("long"))
        .withColumn("is_canonical", F.col("doc_id") == F.min("doc_id").over(w))
        .select("doc_id", "dup_group", "group_size", "is_canonical")
    )


def ngram_jaccard_pairs(
    documents: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 100,
    text_col: str = "content",
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs: (doc_a, doc_b, inter, size_a,
    size_b, jaccard) for pairs sharing >=1 (non-hot) shingle with
    jaccard >= threshold.

    jaccard = |A∩B| / (|A| + |B| - |A∩B|) over *distinct* shingle sets.
    ``max_df`` drops shingles present in more than max_df docs before the
    self-join (skew + O(df²) pair-blowup guard; exactness caveat documented:
    pairs connected ONLY through dropped hot shingles are not emitted, the
    standard trade-off — set max_df=None for the fully exact quadratic-risk
    variant).
    """
    # join on the 60-bit shingle hash, not the string: far smaller shuffle
    # payload + integer comparisons (collision odds ~n²/2^61 — negligible,
    # and the oracle hashes identically so parity is exact either way).
    # persist(): the shingle table feeds FOUR subplans (hot-shingle agg,
    # anti-join probe, set sizes, both self-join sides) — without it the
    # tokenize+shingle+md5 map recomputes per consumer (measured 2.6x
    # slower at sf0.1).  MEMORY_AND_DISK and evictable; at 100 TB you
    # would write the shingle table out once and share it with minhash.
    sh = shingles(documents, n=n, text_col=text_col).select(
        "doc_id", md5_hash60(F.col("shingle")).alias("sh")
    ).persist()
    if max_df is not None:
        hot = sh.groupBy("sh").agg(F.count("*").alias("df")).filter(F.col("df") > max_df)
        sh = sh.join(hot.select("sh"), "sh", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("set_size"))

    a = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    b = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("set_size", "size_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("set_size", "size_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("size_a") + F.col("size_b") - F.col("inter")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("doc_a", "doc_b", "inter", "size_a", "size_b", "jaccard")


def minhash_signatures(
    documents: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    n: int = 3,
    text_col: str = "content",
) -> DataFrame:
    """(doc_id, sig_idx, minhash): k-function MinHash over token n-gram
    shingles via the affine family h_i(x) = (a_i·x + b_i) mod 2^31-1 on the
    single md5-60 base hash (one md5 per shingle, not k).

    Shape: explode shingles once, cross the (tiny, literal) hash-index range
    with ``explode(sequence(...))``, one min-aggregation keyed by
    (doc_id, sig_idx) — partial-aggregates map-side, so the shuffle carries
    exactly k rows per doc regardless of doc size.
    """
    coeffs = minhash_coeffs(num_hashes)
    a_arr = F.array(*[F.lit(a).cast("long") for a, _ in coeffs])
    b_arr = F.array(*[F.lit(b).cast("long") for _, b in coeffs])
    sh = shingles(documents, n=n, text_col=text_col).select(
        "doc_id", (md5_hash60(F.col("shingle")) % MINHASH_PRIME).alias("x")
    )
    idx = sh.select(
        "doc_id",
        "x",
        F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("sig_idx"),
    )
    h = idx.select(
        "doc_id",
        "sig_idx",
        (
            (
                F.element_at(a_arr, F.col("sig_idx") + 1) * F.col("x")
                + F.element_at(b_arr, F.col("sig_idx") + 1)
            )
            % MINHASH_PRIME
        ).alias("h"),
    )
    return h.groupBy("doc_id", "sig_idx").agg(F.min("h").alias("minhash"))


def minhash_lsh_pairs(
    documents: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    n: int = 3,
    text_col: str = "content",
    min_sig_agreement: float = 0.0,
) -> DataFrame:
    """MinHash-LSH candidate pairs: (doc_a, doc_b, agree, sig_agreement).

    Signatures are split into ``bands`` bands of ``num_hashes/bands`` rows;
    a pair is a candidate iff some band's minhashes all agree (band hash =
    md5_60 of the concatenated band values — an equi-join on
    (band, band_hash), never a cross join).  ``sig_agreement`` = fraction of
    the k signature components agreeing — the unbiased Jaccard estimate.
    Dedup policy downstream: drop non-canonical docs of pairs above a
    threshold.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(documents, num_hashes=num_hashes, n=n, text_col=text_col)
    # signatures feed the band hash AND both verification join sides —
    # persist so the shingle+minhash pipeline runs once (same rationale
    # and measurement as ngram_jaccard_pairs)
    sig = sig.withColumn("band", (F.col("sig_idx") / rows_per_band).cast("int")).persist()
    band_hash = (
        sig.groupBy("doc_id", "band")
        .agg(F.sort_array(F.collect_list(F.struct("sig_idx", "minhash"))).alias("vals"))
        .select(
            "doc_id",
            "band",
            md5_hash60(
                F.concat_ws(",", F.transform(F.col("vals"), lambda v: v["minhash"].cast("string")))
            ).alias("band_hash"),
        )
    )
    a = band_hash.select(F.col("doc_id").alias("doc_a"), "band", "band_hash")
    b = band_hash.select(F.col("doc_id").alias("doc_b"), "band", "band_hash")
    cand = (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sig.select(F.col("doc_id").alias("doc_a"), "sig_idx", F.col("minhash").alias("mh_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), "sig_idx", F.col("minhash").alias("mh_b"))
    agree = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "sig_idx"])
        .groupBy("doc_a", "doc_b")
        .agg(F.sum((F.col("mh_a") == F.col("mh_b")).cast("long")).alias("agree"))
        .withColumn("sig_agreement", F.round(F.col("agree") / F.lit(float(num_hashes)), 6))
    )
    return agree.filter(F.col("sig_agreement") >= min_sig_agreement).select(
        "doc_a", "doc_b", "agree", "sig_agreement"
    )


def simhash(documents: DataFrame, text_col: str = "content") -> DataFrame:
    """(doc_id, simhash): 60-bit tf-weighted SimHash over tokens.

    Per (doc, term, tf): h = md5_60(term); each bit b contributes +tf if set
    else -tf; simhash bit b = 1 iff the sum is > 0.  Expressed as explode
    over the 60 bit positions + one sum aggregation + one bit-OR rebuild —
    all JVM-side; the 60× row blowup stays map-local before partial agg.
    """
    toks = documents.select(
        "doc_id", F.explode(F.split(F.col(text_col), "[^A-Za-z0-9_]+")).alias("term")
    ).filter(F.length("term") > 0)
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").cast("long").alias("tf"))
    hashed = tf.withColumn("h", md5_hash60(F.col("term")))
    bits = hashed.select(
        "doc_id",
        "tf",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("b"),
    ).select(
        "doc_id",
        "b",
        F.when(F.expr("(h >> b) & 1") == 1, F.col("tf")).otherwise(-F.col("tf")).alias("contrib"),
    )
    acc = bits.groupBy("doc_id", "b").agg(F.sum("contrib").alias("s"))
    return acc.groupBy("doc_id").agg(
        F.sum(F.when(F.col("s") > 0, F.expr("cast(1 as bigint) << b")).otherwise(F.lit(0))).alias(
            "simhash"
        )
    )


def simhash_pairs(
    documents: DataFrame, max_hamming: int = 3, text_col: str = "content"
) -> DataFrame:
    """(doc_a, doc_b, hamming): ALL pairs with hamming(simhash) <= t, found
    via (t+1)-segment pigeonhole blocking — an equi-join on (segment_idx,
    segment_value), never quadratic, with full recall at the threshold by
    construction (t differing bits cannot cover t+1 segments)."""
    # both join sides read the fingerprints — compute the 60-bit projection
    # once, not twice
    sh = simhash(documents, text_col=text_col).persist()
    seg_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("seg"),
                F.expr(f"(simhash >> {off}) & {(1 << w) - 1}").alias("seg_val"),
            )
            for i, off, w in simhash_segments(max_hamming)
        ]
    )
    segs = sh.select(
        "doc_id", "simhash", F.explode(seg_structs).alias("s")
    ).select("doc_id", "simhash", F.col("s.seg").alias("seg"), F.col("s.seg_val").alias("seg_val"))
    a = segs.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"), "seg", "seg_val")
    b = segs.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"), "seg", "seg_val")
    cand = (
        a.join(b, ["seg", "seg_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .distinct()
    )
    out = cand.withColumn("hamming", F.expr("bit_count(sh_a ^ sh_b)").cast("int"))
    return out.filter(F.col("hamming") <= max_hamming).select("doc_a", "doc_b", "hamming")
