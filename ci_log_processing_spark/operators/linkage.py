"""Fuzzy record linkage — edit-distance near-dup keys WITHOUT an
all-pairs scan (SymSpell delete-neighborhood blocking).

Training corpora carry short near-identical keys everywhere: page
titles differing by one typo, tool names with a dropped character,
user queries with transposed letters. Jaccard/MinHash (dedup.py)
saturates on such short strings — one edit flips a large fraction of
the shingles — so the right similarity is LEVENSHTEIN distance, and
the classic scalable blocking for it is the SymSpell delete
neighborhood (Garbe's symmetric-delete algorithm, the public
SymSpell/spellfix design): two strings are within edit distance d
only if deleting <= d characters from each can produce a COMMON
string. Indexing every <=d-deletion variant therefore finds every
qualifying pair through an EQUI-join — no quadratic compare, no
per-row trie, and the verify step (one built-in `levenshtein` call
per candidate) removes the false positives hash blocking admits.

Reference tie-in: the reference's OpenSearch backend offers fuzzy
term queries (AUTO fuzziness ~ Damerau distance 1-2) over exactly
the kind of short keyword fields logsender ships
(logsender.py:563-618 index DDL keyword columns); this operator is
the engine-side batch equivalent: materialize all fuzzy-equal key
pairs across the corpus in one pass.

Determinism contract: the key is a pure-Catalyst canonicalization
(lower -> strip non-[a-z0-9 ] -> collapse runs of spaces -> trim ->
prefix), shared character-for-character with the DuckDB twin; the
verify distance comes from the engines' built-in Levenshtein (both
classic single-character edit distance, integer); pair identity is
(doc_a < doc_b) + DISTINCT. No floats anywhere.

Scale shape (the 100 TB audit):
- variant generation is a per-row array expression — key length is
  capped at `key_len`, so fan-out is <= key_len + 1 rows per doc at
  d=1 (<= ~key_len^2/2 at d=2, documented below), independent of
  document size;
- the join key is the 64-bit md5 prefix of the variant, NOT the
  variant string — the candidate shuffle moves (hash, doc_id) pairs
  only; hash collisions merely create extra candidates that the
  exact verify discards;
- candidate generation is a bucket equi-join on that hash — cost
  tracks fuzzy-duplicate density, never |docs|^2; `bucket_cap`
  applies the same deterministic sub-bucket split as
  minhash_lsh_pairs / simhash_pairs for corpora where one key
  dominates (boilerplate titles), with the same documented recall
  trade;
- verify is one codegen `levenshtein` per candidate pair on <=
  key_len-char strings — bounded constant work per pair.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import _register_persist


def canonical_key(text_col: Column, key_len: int = 24) -> Column:
    """Short canonical linkage key: lowercase, alnum+space only,
    single-spaced, first `key_len` chars. Pure Catalyst; the DuckDB
    twin runs the identical regex chain (RE2-portable patterns)."""
    t = F.lower(text_col)
    t = F.regexp_replace(t, "[^a-z0-9 ]", "")
    t = F.regexp_replace(t, "  +", " ")
    return F.substring(F.trim(t), 1, key_len)


def _delete_variants(key: Column, max_dist: int) -> Column:
    """All strings reachable by deleting <= max_dist characters,
    including the key itself — as one per-row array expression."""
    def deletes1(s: Column) -> Column:
        # delete position i (1-based): prefix [1, i-1] + suffix [i+1, end]
        return F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(s), F.lit(1))),
            lambda i: F.concat(
                F.substring(s, F.lit(1), i - 1),
                s.substr(i + 1, F.length(s)),
            ),
        )

    d1 = F.array_union(F.array(key), deletes1(key))
    if max_dist == 1:
        return d1
    # d=2: deletes of every d<=1 variant, flattened + distinct.
    # fan-out is O(key_len^2 / 2) rows per doc — still bounded by the
    # key cap, but ~12x d=1; opt in where recall at distance 2 pays.
    return F.array_distinct(
        F.flatten(F.transform(d1, lambda v: F.array_union(F.array(v), deletes1(v))))
    )


def symspell_pairs(
    docs: DataFrame,
    max_dist: int = 1,
    key_len: int = 24,
    text_col: str = "text",
    bucket_cap: int | None = None,
) -> DataFrame:
    """All doc pairs whose canonical keys are within Levenshtein
    distance `max_dist`, via delete-neighborhood blocking.

    Output: (doc_a, doc_b, dist) with doc_a < doc_b, dist the exact
    Levenshtein distance between the two canonical keys (0 = keys
    identical — exact dupes surface here too, by design: the caller
    feeds the pair stream to duplicate_components like every other
    pair generator in dedup.py).

    Completeness: for classic Levenshtein distance d, any two
    strings within distance d share a common string reachable by
    <= d deletions from each (delete the edited positions), so the
    variant equi-join has TOTAL recall at the configured max_dist;
    precision comes from the exact verify. max_dist is capped at 2 —
    beyond that the neighborhood explodes combinatorially and
    blocking should switch to the n-gram/LSH family instead.
    """
    if not 1 <= max_dist <= 2:
        raise ValueError(
            f"symspell_pairs: max_dist={max_dist} out of range [1, 2]"
        )
    keys = docs.select(
        "doc_id", canonical_key(F.col(text_col), key_len).alias("key")
    )
    variants = keys.select(
        "doc_id",
        "key",
        F.explode(_delete_variants(F.col("key"), max_dist)).alias("variant"),
    ).select(
        "doc_id",
        "key",
        # 64-bit join key: the shuffle moves a long, not the string
        F.conv(F.substring(F.md5(F.col("variant")), 1, 15), 16, 10)
        .cast("long")
        .alias("vh"),
    ).dropDuplicates(["doc_id", "vh"])
    variants = _register_persist(variants)
    join_keys = [F.col("a.vh") == F.col("b.vh")]
    if bucket_cap is not None:
        wn = Window.partitionBy("vh")
        nsub = F.ceil(
            F.count(F.lit(1)).over(wn) / F.lit(float(bucket_cap))
        ).cast("long")
        variants = variants.withColumn(
            "sub",
            F.pmod(
                F.conv(
                    F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                    16,
                    10,
                ).cast("long"),
                nsub,
            ),
        )
        join_keys.append(F.col("a.sub") == F.col("b.sub"))
    a = variants.alias("a")
    b = variants.alias("b")
    cond = join_keys[0]
    for jk in join_keys[1:]:
        cond = cond & jk
    return (
        a.join(b, cond & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.levenshtein(F.col("a.key"), F.col("b.key")).alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
        .distinct()
    )
