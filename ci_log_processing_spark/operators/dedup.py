"""Deduplication operators for the training-data pipeline tier.

The reference's dedup surface is small (page-level set dedup +
checkpoint anti-join, logscraper.py:424-439/457-468); at 100 TB a
corpus engine needs content dedup. All operators below are pure
DataFrame compositions — shuffles only on hash/band keys, never on
raw text pairs:

  * exact          — md5(content) groupBy (one shuffle on a 32-hex key)
  * ngram jaccard  — 5-token shingles, inverted-index self-join on
                     shingle, intersection/union counting
  * minhash + LSH  — 16 permutations, 4 bands x 4 rows; candidate
                     generation by band-key equi-join (the only
                     strategy whose cost is ~linear at 100 TB)
  * simhash        — 32-bit majority-vote fingerprint per doc

Hash primitive: h32(s) = first 8 hex chars of md5 as int — chosen
because it evaluates identically in Spark, DuckDB and Python, which
the correctness oracle needs (Spark's xxhash64 and DuckDB's hash()
disagree). At production scale swap H32_EXPR for xxhash64 — the
plan shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# ---- shared primitives ------------------------------------------------

MERSENNE_P = 4294967311  # prime > 2^32; (a*h+b) stays < 2^63 for a < 2^30


def h32(col: Column) -> Column:
    """Deterministic 32-bit hash, identical across engines."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 8), 16, 10).cast(
        "long"
    )


def tokens_col(text: Column) -> Column:
    return F.split(F.lower(text), " ")


def shingles_col(toks: Column, k: int = 5) -> Column:
    """Distinct k-token shingles; [] when the doc has < k tokens."""
    sh = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (k - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    return F.when(F.size(toks) >= k, F.array_distinct(sh)).otherwise(
        F.array().cast("array<string>")
    )


# 16 fixed (a, b) minhash permutation params (deterministic; a < 2^30)
MINHASH_PARAMS = [
    (387420489, 12345), (268435399, 54321), (536870909, 98765),
    (805306457, 13579), (134217689, 24680), (671088637, 11111),
    (402653171, 22222), (201326611, 33333), (738197503, 44444),
    (167772107, 55555), (603979769, 66666), (335544301, 77777),
    (872415231, 88888), (100663291, 99999), (469762043, 10101),
    (234881023, 20202),
]
N_BANDS = 4
ROWS_PER_BAND = 4


# ---- operators --------------------------------------------------------


def exact_dup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup: md5-groupBy; one partial-aggregated shuffle."""
    return (
        docs.select(
            F.col("doc_id"), F.md5(F.col(text_col).cast("binary")).alias("h")
        )
        .groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("copies"),
            F.min("doc_id").alias("keeper"),
        )
        .filter(F.col("copies") > 1)
    )


def doc_shingles(docs: DataFrame, text_col: str = "text", k: int = 5) -> DataFrame:
    toks = tokens_col(F.col(text_col))
    return (
        docs.select("doc_id", shingles_col(toks, k).alias("shingles"))
        .select("doc_id", F.explode("shingles").alias("s"))
    )


def _with_jaccard(inter: DataFrame, sizes: DataFrame, threshold: float) -> DataFrame:
    """Attach jaccard = inter / (na + nb - inter) to (doc_a, doc_b,
    inter) rows and filter by threshold."""
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.6, k: int = 5
) -> DataFrame:
    """Near-dup pairs by Jaccard over distinct k-shingles.

    Inverted-index join: only docs sharing >= 1 shingle are paired,
    so cost tracks true-duplicate density, not |docs|^2.
    """
    sh = doc_shingles(docs, k=k)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, "s")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return _with_jaccard(inter, sizes, threshold)


def _signatures_from_shingles(sh: DataFrame, spark: SparkSession) -> DataFrame:
    perms = spark.createDataFrame(
        [(j, a, b) for j, (a, b) in enumerate(MINHASH_PARAMS)],
        "j int, a long, b long",
    )
    mins = (
        sh.withColumn("h", h32(F.col("s")))
        .join(F.broadcast(perms))
        .withColumn("ph", (F.col("a") * F.col("h") + F.col("b")) % MERSENNE_P)
        .groupBy("doc_id", "j")
        .agg(F.min("ph").alias("mh"))
    )
    return mins.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "mh"))),
            lambda s: s["mh"],
        ).alias("sig")
    )


def minhash_signatures(
    docs: DataFrame, spark: SparkSession, k: int = 5
) -> DataFrame:
    """doc_id -> minhash signature array (ordered by permutation id).

    Plan: explode shingles -> broadcast-join the 16-row permutation
    dim -> per-(doc, perm) min -> collect ordered array. The only
    shuffle keys on doc_id.
    """
    return _signatures_from_shingles(doc_shingles(docs, k=k), spark)


def minhash_lsh_pairs(
    docs: DataFrame,
    spark: SparkSession,
    threshold: float = 0.6,
    k: int = 5,
) -> DataFrame:
    """MinHash-LSH candidate pairs, verified by true Jaccard.

    Banding: 4 bands x 4 rows; same md5(band values) in any band ->
    candidate. Candidates are then exact-verified (the standard
    LSH-then-verify contract), so output == jaccard >= threshold
    among banded candidates.
    """
    # shingles feed three consumers (signatures, sizes, verify) —
    # cache them once instead of re-scanning + re-exploding the corpus
    sh_cached = doc_shingles(docs, k=k).persist()
    sigs = _signatures_from_shingles(sh_cached, spark)
    bands = sigs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(N_BANDS - 1)),
                lambda b: F.md5(
                    F.concat_ws(
                        ",",
                        F.slice(
                            F.col("sig"), b * ROWS_PER_BAND + 1, ROWS_PER_BAND
                        ).cast("array<string>"),
                    )
                ),
            )
        ).alias("band", "key"),
    )
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), ["band", "key"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    # exact-verify ONLY the banded candidates — jaccard cost is
    # O(|candidates|), not O(|pairs sharing a shingle|)
    sh = doc_shingles(docs, k=k)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        cand.join(sh.alias("a"), cand["doc_a"] == F.col("a.doc_id"))
        .join(
            sh.alias("b"),
            (cand["doc_b"] == F.col("b.doc_id"))
            & (F.col("a.s") == F.col("b.s")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return _with_jaccard(inter, sizes, threshold)


def simhash_col(toks: Column, bits: int = 32) -> Column:
    """32-bit SimHash over distinct tokens as one expression.

    bit_i(doc) = 1 iff sum over tokens of (+1 if token-hash bit i
    set else -1) > 0; computed with aggregate() over the token
    array — no Python, no shuffle at all (per-row expression).
    """
    toks_d = F.array_distinct(toks)
    hashes = F.transform(
        toks_d,
        lambda t: F.conv(
            F.substring(F.md5(t.cast("binary")), 1, 8), 16, 10
        ).cast("long"),
    )
    terms = []
    for i in range(bits):
        vote = F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        terms.append(
            F.when(vote > 0, F.lit(2**i).cast("long")).otherwise(F.lit(0))
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def simhash_fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.select(
        "doc_id", simhash_col(tokens_col(F.col(text_col))).alias("simhash")
    )
