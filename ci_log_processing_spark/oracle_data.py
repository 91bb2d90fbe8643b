"""DuckDB oracle SQL for the training-data operators (dedup,
similarity, text analysis) — independent re-implementations checked
against the Spark DataFrame operators by the driver.

The dedup corpus plants duplicates deterministically (the raw
synthetic documents contain none): every doc_id % 10 == 0 gets an
exact copy, every doc_id % 7 == 0 a near-copy with a 3-token suffix.
The Spark side derives the identical corpus (sources/corpus.py).
"""

from __future__ import annotations

from .operators.dedup import (
    MERSENNE_P,
    MINHASH_PARAMS,
    N_BANDS,
    ROWS_PER_BAND,
)
from .operators.textstats import BPE_RX, LANG_MARKERS, STOPWORDS

# --- shared corpus -----------------------------------------------------

CORPUS_SQL = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id,
         concat(text, ' near duplicate suffix') AS text
  FROM documents WHERE doc_id % 7 = 0
"""

_TOKS = "string_split(lower(text), ' ')"

# distinct 5-token shingles (k=5); empty when < 5 tokens
_SHINGLES = (
    "list_distinct(CASE WHEN len({t}) >= 5 THEN "
    "list_transform(range(1, len({t}) - 3), i -> "
    "array_to_string(list_slice({t}, i, i + 4), ' ')) "
    "ELSE []::VARCHAR[] END)"
).format(t=_TOKS)

_H32 = "CAST(('0x' || substr(md5({x}), 1, 8)) AS BIGINT)"


def _sql_str(s: str) -> str:
    """Format a python string as a SQL string literal, doubling
    single quotes — caller-supplied keys (source names, langs) must
    not be able to break the oracle query the operator side handles
    fine."""
    return "'" + s.replace("'", "''") + "'"


def q_dedup_exact() -> str:
    return f"""
WITH corpus AS ({CORPUS_SQL})
SELECT md5(text) AS h, count(*) AS copies, min(doc_id) AS keeper
FROM corpus GROUP BY 1 HAVING count(*) > 1
"""


def q_dedup_exact_apply() -> str:
    return f"""
WITH corpus AS ({CORPUS_SQL})
SELECT doc_id, h FROM (
  SELECT doc_id, md5(text) AS h,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM corpus
) WHERE rn = 1
"""


def _shingle_ctes() -> str:
    return f"""
WITH corpus AS ({CORPUS_SQL}),
sh AS (
  SELECT doc_id, unnest({_SHINGLES}) AS s FROM corpus
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1)
"""


_JACCARD_TAIL = """
SELECT i.doc_a, i.doc_b,
       round(i.inter / CAST(sa.n + sb.n - i.inter AS DOUBLE), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE round(i.inter / CAST(sa.n + sb.n - i.inter AS DOUBLE), 6) >= {thr}
"""


def q_dedup_ngram_jaccard(
    threshold: float = 0.6, df_cut: int = 128
) -> str:
    # identical two-phase rule as operators.dedup.ngram_jaccard_pairs:
    # candidates only via shingles with document frequency <= df_cut,
    # exact jaccard verify over ALL shingles of candidate pairs
    return (
        _shingle_ctes()
        + f""",
rare AS (
  SELECT s FROM sh GROUP BY s HAVING count(*) <= {df_cut}
),
idx AS (SELECT sh.doc_id, sh.s FROM sh JOIN rare USING (s)),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM idx a JOIN idx b ON a.s = b.s AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND a.s = b.s
  GROUP BY 1, 2
)
"""
        + _JACCARD_TAIL.format(thr=threshold)
    )


def _minhash_cand_ctes(bucket_cap: int | None) -> str:
    """Shared signature/band/candidate CTE chunk (appends to
    _shingle_ctes(), ends with `cand` and keeps `sigs` in scope) —
    used by the verify (q_dedup_minhash_lsh) and estimate
    (q_dedup_minhash_estimate) twins so cap/pair semantics cannot
    drift between them, mirroring dedup._banded_candidate_pairs."""
    perm_rows = ", ".join(
        f"({j}, {a}, {b})" for j, (a, b) in enumerate(MINHASH_PARAMS)
    )
    if bucket_cap is not None:
        sub_h = _H32.format(x="CAST(bands.doc_id AS VARCHAR)")
        band_ctes = f"""
bsz AS (SELECT band, key, count(*) AS n FROM bands GROUP BY 1, 2),
bsub AS (
  SELECT bands.doc_id, bands.band, bands.key,
         {sub_h} % CAST(ceil(n / {bucket_cap}.0) AS BIGINT) AS sub
  FROM bands JOIN bsz USING (band, key)
),"""
        pair_src, sub_eq = "bsub", " AND x.sub = y.sub"
    else:
        band_ctes = ""
        pair_src, sub_eq = "bands", ""
    return f""",
perms AS (SELECT * FROM (VALUES {perm_rows}) p(j, a, b)),
mins AS (
  SELECT sh.doc_id, p.j,
         min((p.a * {_H32.format(x='sh.s')} + p.b) % {MERSENNE_P}) AS mh
  FROM sh, perms p GROUP BY 1, 2
),
sigs AS (
  SELECT doc_id, list(mh ORDER BY j) AS sig FROM mins GROUP BY 1
),
bands AS (
  SELECT doc_id, b.band,
         md5(array_to_string(
           list_slice(sig, b.band * {ROWS_PER_BAND} + 1,
                      b.band * {ROWS_PER_BAND} + {ROWS_PER_BAND}), ',')) AS key
  FROM sigs, (SELECT unnest(range({N_BANDS})) AS band) b
),{band_ctes}
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM {pair_src} x JOIN {pair_src} y
    ON x.band = y.band AND x.key = y.key{sub_eq} AND x.doc_id < y.doc_id
)"""


def q_dedup_minhash_lsh(
    threshold: float = 0.6, bucket_cap: int | None = 64
) -> str:
    """Twin of operators.dedup.minhash_lsh_pairs, including its
    default mega-bucket guard: (band, key) buckets larger than
    bucket_cap split into ceil(n / cap) sub-buckets by the same
    deterministic doc_id hash, pairs only inside a sub-bucket."""
    return (
        _shingle_ctes()
        + _minhash_cand_ctes(bucket_cap)
        + """,
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND a.s = b.s
  GROUP BY 1, 2
)
"""
        + _JACCARD_TAIL.format(thr=threshold)
    )


def q_dedup_minhash_estimate(
    threshold: float = 0.5, bucket_cap: int | None = 64
) -> str:
    """Twin of operators.dedup.minhash_estimate_pairs: identical
    candidate generation, scored by the signature-component match
    fraction instead of the exact-Jaccard verify. n_equal is an
    integer, /16 a power-of-two division — exact in both engines."""
    n_perm = len(MINHASH_PARAMS)
    n_eq = (
        f"len(list_filter(range(1, {n_perm} + 1), "
        "i -> a.sig[i] = b.sig[i]))"
    )
    return (
        _shingle_ctes()
        + _minhash_cand_ctes(bucket_cap)
        + f"""
SELECT c.doc_a, c.doc_b,
       {n_eq} AS n_equal,
       {n_eq} / {n_perm} AS est_jaccard
FROM cand c
JOIN sigs a ON a.doc_id = c.doc_a
JOIN sigs b ON b.doc_id = c.doc_b
WHERE {n_eq} / {n_perm} >= {threshold}
"""
    )


def q_incremental_minhash_dedup(
    threshold: float = 0.6, candidate_cap: int = 64
) -> str:
    """Twin of operators.dedup.incremental_minhash_dedup over the
    planted-dupes corpus split by id range: index = original docs
    (doc_id < 1000000), batch = the planted exact/near copies
    (doc_id >= 1000000). Same band derivation as q_dedup_minhash_lsh;
    per (band, key) bucket only the candidate_cap smallest INDEX ids
    are offered; a batch doc survives iff no offered candidate
    verifies at shingle-Jaccard >= threshold."""
    perm_rows = ", ".join(
        f"({j}, {a}, {b})" for j, (a, b) in enumerate(MINHASH_PARAMS)
    )
    return (
        _shingle_ctes()
        + f""",
perms AS (SELECT * FROM (VALUES {perm_rows}) p(j, a, b)),
mins AS (
  SELECT sh.doc_id, p.j,
         min((p.a * {_H32.format(x='sh.s')} + p.b) % {MERSENNE_P}) AS mh
  FROM sh, perms p GROUP BY 1, 2
),
sigs AS (
  SELECT doc_id, list(mh ORDER BY j) AS sig FROM mins GROUP BY 1
),
bands AS (
  SELECT doc_id, b.band,
         md5(array_to_string(
           list_slice(sig, b.band * {ROWS_PER_BAND} + 1,
                      b.band * {ROWS_PER_BAND} + {ROWS_PER_BAND}), ',')) AS key
  FROM sigs, (SELECT unnest(range({N_BANDS})) AS band) b
),
bidx AS (
  SELECT band, key, idx_id FROM (
    SELECT band, key, doc_id AS idx_id,
           row_number() OVER (PARTITION BY band, key
                              ORDER BY doc_id) AS rn
    FROM bands WHERE doc_id < 1000000
  ) WHERE rn <= {candidate_cap}
),
cand AS (
  SELECT DISTINCT y.doc_id, b.idx_id
  FROM bands y JOIN bidx b USING (band, key)
  WHERE y.doc_id >= 1000000
),
inter AS (
  SELECT c.doc_id, c.idx_id, count(*) AS inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_id
  JOIN sh b ON b.doc_id = c.idx_id AND a.s = b.s
  GROUP BY 1, 2
),
dups AS (
  SELECT DISTINCT i.doc_id
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.doc_id
  JOIN sizes sb ON sb.doc_id = i.idx_id
  WHERE round(i.inter / CAST(sa.n + sb.n - i.inter AS DOUBLE), 6)
        >= {threshold}
)
SELECT c.doc_id, c.text
FROM corpus c
WHERE c.doc_id >= 1000000
  AND c.doc_id NOT IN (SELECT doc_id FROM dups)
"""
    )


def q_stream_neardup(
    threshold: float = 0.6, candidate_cap: int = 64
) -> str:
    """Twin of streaming/neardup_ingest.py's gate run: originals
    (batch 0) then planted copies (batch 1, ids >= 1000000), wave
    order forced by file mtimes on the Spark side. Replicates the
    full per-batch semantics: exact keep-first WITHIN each wave,
    batch-1 docs dropped iff banded (capped candidate rule) and
    verified at shingle-Jaccard >= threshold against batch 0's
    SURVIVING docs. Output: surviving doc_ids of both waves."""
    perm_rows = ", ".join(
        f"({j}, {a}, {b})" for j, (a, b) in enumerate(MINHASH_PARAMS)
    )
    return f"""
WITH corpus AS ({CORPUS_SQL}),
w0s AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           row_number() OVER (PARTITION BY md5(text)
                              ORDER BY doc_id) AS rn
    FROM corpus WHERE doc_id < 1000000
  ) WHERE rn = 1
),
w1s AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           row_number() OVER (PARTITION BY md5(text)
                              ORDER BY doc_id) AS rn
    FROM corpus WHERE doc_id >= 1000000
  ) WHERE rn = 1
),
live AS (SELECT * FROM w0s UNION ALL SELECT * FROM w1s),
sh AS (
  SELECT doc_id, unnest({_SHINGLES}) AS s FROM live
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
perms AS (SELECT * FROM (VALUES {perm_rows}) p(j, a, b)),
mins AS (
  SELECT sh.doc_id, p.j,
         min((p.a * {_H32.format(x='sh.s')} + p.b) % {MERSENNE_P}) AS mh
  FROM sh, perms p GROUP BY 1, 2
),
sigs AS (
  SELECT doc_id, list(mh ORDER BY j) AS sig FROM mins GROUP BY 1
),
bands AS (
  SELECT doc_id, b.band,
         md5(array_to_string(
           list_slice(sig, b.band * {ROWS_PER_BAND} + 1,
                      b.band * {ROWS_PER_BAND} + {ROWS_PER_BAND}), ',')) AS key
  FROM sigs, (SELECT unnest(range({N_BANDS})) AS band) b
),
bidx AS (
  SELECT band, key, idx_id FROM (
    SELECT band, key, doc_id AS idx_id,
           row_number() OVER (PARTITION BY band, key
                              ORDER BY doc_id) AS rn
    FROM bands WHERE doc_id < 1000000
  ) WHERE rn <= {candidate_cap}
),
cand AS (
  SELECT DISTINCT y.doc_id, b.idx_id
  FROM bands y JOIN bidx b USING (band, key)
  WHERE y.doc_id >= 1000000
),
inter AS (
  SELECT c.doc_id, c.idx_id, count(*) AS inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_id
  JOIN sh b ON b.doc_id = c.idx_id AND a.s = b.s
  GROUP BY 1, 2
),
dups AS (
  SELECT DISTINCT i.doc_id
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.doc_id
  JOIN sizes sb ON sb.doc_id = i.idx_id
  WHERE round(i.inter / CAST(sa.n + sb.n - i.inter AS DOUBLE), 6)
        >= {threshold}
)
SELECT doc_id FROM w0s
UNION ALL
SELECT doc_id FROM w1s
WHERE doc_id NOT IN (SELECT doc_id FROM dups)
"""


def q_dedup_simhash(bits: int = 32) -> str:
    h = _H32.format(x="tok")
    bit_terms = " + ".join(
        f"(CASE WHEN sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) > 0 "
        f"THEN CAST({2**i} AS BIGINT) ELSE 0 END)"
        for i in range(bits)
    )
    return f"""
WITH corpus AS ({CORPUS_SQL}),
tok AS (
  SELECT doc_id, unnest(list_distinct({_TOKS})) AS tok FROM corpus
),
th AS (SELECT doc_id, {h} AS h FROM tok)
SELECT doc_id, {bit_terms} AS simhash FROM th GROUP BY doc_id
"""


def q_dedup_simhash_pairs(
    max_hamming: int = 3, bits: int = 32, bucket_cap: int | None = None
) -> str:
    """Banded Hamming-pair oracle: same pigeonhole rule as
    operators.dedup.simhash_pairs (4 bands of bits/4 bits each);
    bucket_cap mirrors its opt-in mega-bucket sub-split."""
    h = _H32.format(x="tok")
    bit_terms = " + ".join(
        f"(CASE WHEN sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) > 0 "
        f"THEN CAST({2**i} AS BIGINT) ELSE 0 END)"
        for i in range(bits)
    )
    band_w = bits // 4
    mask = (1 << band_w) - 1
    if bucket_cap is not None:
        sub_h = _H32.format(x="CAST(bands.doc_id AS VARCHAR)")
        band_ctes = f""",
bsz AS (SELECT band, key, count(*) AS n FROM bands GROUP BY 1, 2),
bsub AS (
  SELECT bands.doc_id, bands.simhash, bands.band, bands.key,
         {sub_h} % CAST(ceil(n / {bucket_cap}.0) AS BIGINT) AS sub
  FROM bands JOIN bsz USING (band, key)
)"""
        pair_src, sub_eq = "bsub", " AND x.sub = y.sub"
    else:
        band_ctes = ""
        pair_src, sub_eq = "bands", ""
    return f"""
WITH corpus AS ({CORPUS_SQL}),
tok AS (
  SELECT doc_id, unnest(list_distinct({_TOKS})) AS tok FROM corpus
),
th AS (SELECT doc_id, {h} AS h FROM tok),
sims AS (SELECT doc_id, {bit_terms} AS simhash FROM th GROUP BY doc_id),
bands AS (
  SELECT doc_id, simhash, b.band,
         (simhash >> (b.band * {band_w})) & {mask} AS key
  FROM sims, (SELECT unnest(range(4)) AS band) b
){band_ctes},
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         x.simhash AS sa, y.simhash AS sb
  FROM {pair_src} x JOIN {pair_src} y
    ON x.band = y.band AND x.key = y.key{sub_eq} AND x.doc_id < y.doc_id
)
SELECT doc_a, doc_b, bit_count(xor(sa, sb)) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= {max_hamming}
"""


def q_embed_near_dup(threshold: float = 0.95) -> str:
    return f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_dot_product(a.emb, b.emb) /
             (sqrt(list_dot_product(a.emb, a.emb)) *
              sqrt(list_dot_product(b.emb, b.emb))), 5) AS cosine
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(list_dot_product(a.emb, b.emb) /
            (sqrt(list_dot_product(a.emb, a.emb)) *
             sqrt(list_dot_product(b.emb, b.emb))), 5) >= {threshold}
"""


def q_embed_near_dup_capped(
    threshold: float = 0.95, bucket_cap: int = 32
) -> str:
    """Capped near-dup oracle: identical deterministic sub-bucket
    rule (hash(vec_id) % ceil(bucket_size / cap))."""
    h = _H32.format(x="CAST(vec_id AS VARCHAR)")
    cos = (
        "round(list_dot_product(a.emb, b.emb) /"
        " (sqrt(list_dot_product(a.emb, a.emb)) *"
        " sqrt(list_dot_product(b.emb, b.emb))), 5)"
    )
    return f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings),
s AS (SELECT label, count(*) AS n FROM e GROUP BY 1),
k AS (
  SELECT e.vec_id, e.label, e.emb,
         {h} % CAST(ceil(n / {bucket_cap}.0) AS BIGINT) AS sub
  FROM e JOIN s USING (label)
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {cos} AS cosine
FROM k a JOIN k b
  ON a.label = b.label AND a.sub = b.sub AND a.vec_id < b.vec_id
WHERE {cos} >= {threshold}
"""


_TOPK_TAIL = """
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {k}
"""


def q_ann_brute_force(k: int = 10, n_queries: int = 5) -> str:
    return f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings),
q AS (SELECT vec_id AS query_id, emb AS q_emb FROM e WHERE vec_id < {n_queries}),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round(list_dot_product(q.q_emb, e.emb) /
               (sqrt(list_dot_product(q.q_emb, q.q_emb)) *
                sqrt(list_dot_product(e.emb, e.emb))), 5) AS cosine
  FROM e, q WHERE e.vec_id != q.query_id
)
""" + _TOPK_TAIL.format(k=k)


def q_ann_ivf_multiprobe(
    k: int = 10, n_queries: int = 5, nprobe: int = 2
) -> str:
    """IVF multiprobe oracle: element-wise MEDIAN centroids (order-
    independent — see operators.similarity.bucket_centroids), rank
    buckets per query by centroid cosine, probe nprobe buckets,
    exact top-k inside."""
    return f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings),
px AS (SELECT label, emb, unnest(generate_series(1, len(emb))) AS pos FROM e),
cm AS (SELECT label, pos, median(emb[pos]) AS cv FROM px GROUP BY 1, 2),
cent AS (SELECT label, list(cv ORDER BY pos) AS centroid FROM cm GROUP BY 1),
q AS (SELECT vec_id AS query_id, emb AS q_emb FROM e WHERE vec_id < {n_queries}),
probes AS (
  SELECT query_id, q_emb, label FROM (
    SELECT q.query_id, q.q_emb, c.label,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_dot_product(q.q_emb, c.centroid) /
                     (sqrt(list_dot_product(q.q_emb, q.q_emb)) *
                      sqrt(list_dot_product(c.centroid, c.centroid))), 5)
               DESC, c.label ASC) AS c_rank
    FROM q, cent c
  ) WHERE c_rank <= {nprobe}
),
scored AS (
  SELECT p.query_id, e.vec_id AS neighbor_id,
         round(list_dot_product(p.q_emb, e.emb) /
               (sqrt(list_dot_product(p.q_emb, p.q_emb)) *
                sqrt(list_dot_product(e.emb, e.emb))), 5) AS cosine
  FROM e JOIN probes p ON e.label = p.label
  WHERE e.vec_id != p.query_id
)
""" + _TOPK_TAIL.format(k=k)


def q_ann_bucketed(k: int = 10, n_queries: int = 5) -> str:
    return f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings),
q AS (SELECT vec_id AS query_id, label AS q_bucket, emb AS q_emb
      FROM e WHERE vec_id < {n_queries}),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round(list_dot_product(q.q_emb, e.emb) /
               (sqrt(list_dot_product(q.q_emb, q.q_emb)) *
                sqrt(list_dot_product(e.emb, e.emb))), 5) AS cosine
  FROM e JOIN q ON e.label = q.q_bucket
  WHERE e.vec_id != q.query_id
)
""" + _TOPK_TAIL.format(k=k)


def q_incremental_dedup() -> str:
    """Incremental ingest dedup oracle: the known-hash index is every
    EVEN document's md5; the incoming batch is the planted corpus."""
    return f"""
WITH corpus AS ({CORPUS_SQL}),
known AS (
  SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 2 = 0
),
firsts AS (
  SELECT doc_id, text, h FROM (
    SELECT doc_id, text, md5(text) AS h,
           row_number() OVER (PARTITION BY md5(text)
                              ORDER BY doc_id) AS rn
    FROM corpus
  ) WHERE rn = 1
)
SELECT f.doc_id, f.text, f.h
FROM firsts f LEFT JOIN known k USING (h)
WHERE k.h IS NULL
"""


def q_dedup_substring_spans(k: int = 20) -> str:
    """Substring-span dedup oracle: positional k-shingles over the
    planted corpus, spans occurring > 1x flagged, per-doc interval
    merge via gaps-and-islands windowing."""
    return f"""
WITH corpus AS ({CORPUS_SQL}),
base AS (
  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM corpus
),
sp0 AS (
  SELECT doc_id, toks,
         unnest(range(greatest(len(toks) - {k} + 1, 0))) AS p
  FROM base
),
sp AS (
  SELECT doc_id, CAST(p AS INT) AS pos,
         md5(array_to_string(
           list_slice(toks, CAST(p + 1 AS INT), CAST(p + {k} AS INT)),
           ' ')) AS h
  FROM sp0
),
dup AS (SELECT h FROM sp GROUP BY h HAVING count(*) > 1),
fl AS (SELECT sp.doc_id, sp.pos FROM sp JOIN dup USING (h)),
w AS (
  SELECT doc_id, pos,
         CASE WHEN pos > coalesce(
           max(pos + {k - 1}) OVER (
             PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2) + 1
         THEN 1 ELSE 0 END AS is_start
  FROM fl
),
isl AS (
  SELECT doc_id, pos,
         sum(is_start) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM w
),
m AS (
  SELECT doc_id, island, min(pos) AS s, max(pos) + {k - 1} AS e
  FROM isl GROUP BY 1, 2
)
SELECT doc_id, count(*) AS n_spans,
       CAST(sum(e - s + 1) AS BIGINT) AS n_dup_tokens
FROM m GROUP BY doc_id
"""


def q_dedup_components(threshold: float = 0.6) -> str:
    """Components over exact-star + verified-LSH edges: transitive
    closure via recursive CTE (min reachable doc_id = component),
    checked against the Spark min-label-propagation operator."""
    lsh = q_dedup_minhash_lsh(threshold)
    return f"""
WITH lsh AS ({lsh}),
corpus AS ({CORPUS_SQL}),
star0 AS (
  SELECT min(doc_id) OVER (PARTITION BY md5(text)) AS doc_a,
         doc_id AS doc_b
  FROM corpus
),
pe AS (
  SELECT doc_a, doc_b FROM star0 WHERE doc_a != doc_b
  UNION
  SELECT doc_a, doc_b FROM lsh
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pe
  UNION
  SELECT doc_b, doc_a FROM pe
),
nodes AS (SELECT DISTINCT doc_id FROM corpus),
reach AS (
  WITH RECURSIVE r(node, label) AS (
    SELECT doc_id, doc_id FROM nodes
    UNION
    SELECT e.dst, r.label FROM r JOIN edges e ON e.src = r.node
  ) SELECT * FROM r
)
SELECT node AS doc_id, min(label) AS component,
       (node = min(label)) AS is_keeper
FROM reach GROUP BY node
"""


def q_dedup_keep_best(threshold: float = 0.6) -> str:
    """dedup_keep_best twin: the components oracle wrapped as a CTE,
    joined to the same per-doc quality formula as q_quality (computed
    over the CORPUS, planted dups included), survivor = max quality
    with doc_id tie-break."""
    sr, pr, ls = _quality_micro_frags("text", _TOKS)
    return f"""
WITH comp AS ({q_dedup_components(threshold)}),
corpq AS (
  SELECT doc_id, ({_QM}) / 1000000.0 AS quality
  FROM (
    SELECT doc_id, {sr} AS srm, {pr} AS prm, {ls} AS lsm
    FROM ({CORPUS_SQL})
  )
)
SELECT c.doc_id, c.component, q.quality,
       (row_number() OVER (
          PARTITION BY c.component
          ORDER BY q.quality DESC, c.doc_id) = 1) AS is_best
FROM comp c JOIN corpq q USING (doc_id)
"""


def q_dedup_semantic_apply(threshold: float = 0.30) -> str:
    """SemDeDup-style apply: components over embedding-cosine
    near-dup pairs; every vector gets a cluster id + keeper flag."""
    return f"""
WITH nd AS ({q_embed_near_dup(threshold)}),
pe AS (SELECT vec_a AS doc_a, vec_b AS doc_b FROM nd),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pe
  UNION
  SELECT doc_b, doc_a FROM pe
),
nodes AS (SELECT vec_id FROM embeddings),
reach AS (
  WITH RECURSIVE r(node, label) AS (
    SELECT vec_id, vec_id FROM nodes
    UNION
    SELECT e.dst, r.label FROM r JOIN edges e ON e.src = r.node
  ) SELECT * FROM r
)
SELECT node AS vec_id, min(label) AS component,
       (node = min(label)) AS is_keeper
FROM reach GROUP BY node
"""


# --- curation ----------------------------------------------------------


def q_decontaminate(snippets: list[str]) -> str:
    hit = "NULL"
    for s in reversed(snippets):
        hit = f"CASE WHEN contains(text, '{s}') THEN '{s}' ELSE {hit} END"
    return f"""
SELECT doc_id, ({hit}) IS NOT NULL AS contaminated,
       {hit} AS matched_snippet
FROM documents
"""


def q_stratified_downsample(keep_one_in: int = 3) -> str:
    return f"""
SELECT doc_id, stratum FROM (
  SELECT doc_id, CAST(doc_id % 7 AS BIGINT) AS stratum,
         row_number() OVER (PARTITION BY doc_id % 7 ORDER BY doc_id) AS rn
  FROM documents
) WHERE (rn - 1) % {keep_one_in} = 0
"""


def q_token_histogram(bucket: int = 16) -> str:
    n = f"len({_TOKS})"
    return f"""
SELECT CAST(({n} // {bucket}) * {bucket} AS BIGINT) AS bucket_lo,
       count(*) AS n_docs, CAST(sum({n}) AS BIGINT) AS total_tokens
FROM documents GROUP BY 1
"""


def q_overlap_decontaminate(threshold: float = 0.5) -> str:
    """Overlap-ratio decontamination oracle: benchmark = every
    doc_id % 31 == 0 document; a doc is contaminated when >=
    threshold of its distinct 5-shingles appear in the benchmark."""
    return f"""
WITH sh AS (
  SELECT doc_id, unnest({_SHINGLES}) AS s FROM documents
),
bench AS (
  SELECT DISTINCT s FROM sh WHERE doc_id % 31 = 0
),
per AS (
  SELECT sh.doc_id, count(*) AS n_shingles,
         CAST(sum(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_overlap
  FROM sh LEFT JOIN bench b ON sh.s = b.s
  GROUP BY 1
)
SELECT doc_id, n_shingles, n_overlap,
       round(n_overlap / CAST(n_shingles AS DOUBLE), 6) AS overlap_frac,
       (round(n_overlap / CAST(n_shingles AS DOUBLE), 6) >= {threshold})
         AS contaminated
FROM per
"""


def q_top_ngrams(k: int = 20) -> str:
    """Corpus top-k bigram oracle (n fixed at 2; the Spark operator
    is generic over n)."""
    return f"""
WITH base AS (
  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
),
g AS (
  SELECT doc_id,
         unnest(list_transform(
           list_zip(toks[1:len(toks)-1], toks[2:len(toks)]),
           s -> s[1] || ' ' || s[2])) AS ngram
  FROM base
),
c AS (
  SELECT ngram, count(*) AS occurrences,
         count(DISTINCT doc_id) AS doc_freq
  FROM g GROUP BY 1
),
r AS (
  SELECT ngram, occurrences, doc_freq,
         row_number() OVER (ORDER BY occurrences DESC, ngram ASC) AS rank
  FROM c
)
SELECT * FROM r WHERE rank <= {k}
"""


def q_pack_sequences(capacity: int = 256) -> str:
    """Next-fit packing per source group via recursive CTE — one row
    of recursion per document, all groups advancing in lock-step."""
    return f"""
WITH base AS (
  SELECT source, doc_id,
         CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS nt,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
),
pk AS (
  WITH RECURSIVE p(source, rn, doc_id, nt, bin, used) AS (
    SELECT source, rn, doc_id, nt, CAST(0 AS BIGINT), nt
    FROM base WHERE rn = 1
    UNION ALL
    SELECT b.source, b.rn, b.doc_id, b.nt,
           CASE WHEN p.used + b.nt <= {capacity} THEN p.bin
                ELSE p.bin + 1 END,
           CASE WHEN p.used + b.nt <= {capacity} THEN p.used + b.nt
                ELSE b.nt END
    FROM p JOIN base b ON b.source = p.source AND b.rn = p.rn + 1
  ) SELECT * FROM p
)
SELECT source, doc_id, nt AS n_tokens, bin AS bin_idx,
       CAST(used - nt AS BIGINT) AS offset_in_bin
FROM pk
"""


# --- text analysis -----------------------------------------------------


def q_pii_scrub() -> str:
    """PII plant + scrub oracle; patterns and planting derived from
    operators.pii so the two sides cannot drift."""
    from .operators.pii import PII_RULES

    plant = """
  text
  || CASE WHEN doc_id % 3 = 0 THEN ' contact user'
       || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
  || CASE WHEN doc_id % 4 = 1 THEN ' from 10.'
       || CAST(doc_id % 200 AS VARCHAR) || '.0.'
       || CAST(doc_id % 250 AS VARCHAR) ELSE '' END
  || CASE WHEN doc_id % 5 = 2 THEN ' call 555-'
       || CAST(doc_id % 900 + 100 AS VARCHAR) || '-'
       || CAST(doc_id % 9000 + 1000 AS VARCHAR) ELSE '' END
  || CASE WHEN doc_id % 7 = 3 THEN ' ssn '
       || CAST(doc_id % 900 + 100 AS VARCHAR) || '-'
       || CAST(doc_id % 90 + 10 AS VARCHAR) || '-'
       || CAST(doc_id % 9000 + 1000 AS VARCHAR) ELSE '' END
"""
    counts = ",\n       ".join(
        f"len(regexp_extract_all(pii_text, '{rx}')) AS n_{stem}"
        for stem, rx, _ in PII_RULES
    )
    total = " + ".join(
        f"len(regexp_extract_all(pii_text, '{rx}'))" for _, rx, _ in PII_RULES
    )
    redacted = "pii_text"
    for _, rx, token in PII_RULES:
        redacted = f"regexp_replace({redacted}, '{rx}', '{token}', 'g')"
    return f"""
WITH planted AS (
  SELECT doc_id, ({plant}) AS pii_text FROM documents
)
SELECT doc_id,
       {counts},
       {total} AS n_pii,
       {redacted} AS redacted
FROM planted
"""


def q_repetition() -> str:
    """Gopher-repetition oracle: same planted line-doubling, same
    tie-break. The rank key joins the bigram's tokens with chr(1) —
    NOT the display space — because the Spark side compares (a, b)
    token STRUCTS: struct order equals sep-joined string order only
    when the separator sorts below every in-token character, and
    tokens CAN contain newlines (attach_lines plants them), which
    sort below space but above chr(1). Divergence would need a
    token containing NUL."""
    ranked = (
        "list_sort(list_transform(list_distinct(bigrams), "
        "x -> {'neg': -len(list_filter(bigrams, y -> y = x)), "
        "'key': replace(x, ' ', chr(1)), 'bg': x}))"
    )
    return f"""
WITH lined AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0 THEN text || chr(10) || text
              ELSE text END AS ltext
  FROM documents
),
base AS (
  SELECT doc_id, string_split(ltext, chr(10)) AS lines,
         string_split(lower(ltext), ' ') AS toks
  FROM lined
),
bg AS (
  SELECT doc_id, lines, toks,
         list_transform(list_zip(toks[1:len(toks)-1], toks[2:len(toks)]),
                        s -> s[1] || ' ' || s[2]) AS bigrams
  FROM base
)
SELECT doc_id,
       len(lines) AS n_lines,
       round((len(lines) - len(list_distinct(lines)))
             / CAST(len(lines) AS DOUBLE), 6) AS dup_line_frac,
       round(coalesce(list_aggregate(list_transform(
               list_filter(lines,
                 x -> len(list_filter(lines, y -> y = x)) > 1),
               x -> length(x)), 'sum'), 0)
             / CAST(greatest(list_aggregate(
                 list_transform(lines, x -> length(x)), 'sum'), 1)
               AS DOUBLE), 6) AS dup_line_char_frac,
       CASE WHEN len(bigrams) > 0 THEN {ranked}[1].bg
            ELSE NULL END AS top_bigram,
       CASE WHEN len(bigrams) > 0 THEN
         round(-{ranked}[1].neg * 2.0 / len(toks), 6)
       ELSE 0.0 END AS top_bigram_frac
FROM bg
"""


def q_token_entropy() -> str:
    """token_entropy twin (operators/textstats.py): identical
    ascending-count sequential fold for Σ c·ln c (list_reduce with a
    prepended 0.0 as the init slot), so the float result matches
    Spark's sorted-array aggregate bit-for-bit up to libm's ln —
    value-compared at the gate's 6-decimal normalization."""
    return f"""
WITH terms AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, unnest({_TOKS}) AS term FROM documents
  ) WHERE term <> ''
),
tf AS (
  SELECT doc_id, term, count(*) AS c FROM terms GROUP BY 1, 2
),
per AS (
  SELECT doc_id, sum(c) AS n_tok,
         list_sort(list(CAST(c AS DOUBLE))) AS cs
  FROM tf GROUP BY 1
)
SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
       round(
         ln(CAST(n_tok AS DOUBLE))
         - list_reduce(
             list_prepend(CAST(0 AS DOUBLE), cs),
             (a, b) -> a + b * ln(b)
           ) / CAST(n_tok AS DOUBLE),
         6) AS token_entropy
FROM per
"""


def q_url_dedup() -> str:
    """Twin of operators.urls.url_dedup over operators.urls.
    attach_urls' deterministic plant: same normalization rule
    (https-canonical scheme, lowercased host, www./port strip,
    trailing-slash strip, tracking params dropped, remaining params
    sorted, fragment dropped), same blocklist (tracker.biz + its
    subdomains), keep lowest doc_id per canonical URL."""
    return """
WITH planted AS (
  SELECT doc_id,
    concat(
      CASE WHEN doc_id % 5 = 0 THEN 'http://' ELSE 'https://' END,
      CASE doc_id % 6
        WHEN 0 THEN 'example.com'
        WHEN 1 THEN 'www.Example.com'
        WHEN 2 THEN 'example.com:443'
        WHEN 3 THEN 'blog.example.com'
        WHEN 4 THEN 'tracker.biz'
        ELSE 'cdn.tracker.biz' END,
      '/p/', CAST(doc_id % 50 AS VARCHAR),
      CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END,
      CASE doc_id % 3
        WHEN 0 THEN concat('?utm_source=x&id=', CAST(doc_id % 50 AS VARCHAR))
        WHEN 1 THEN concat('?id=', CAST(doc_id % 50 AS VARCHAR), '&fbclid=abc')
        ELSE '' END
    ) AS url
  FROM documents
),
normed AS (
  SELECT doc_id, url,
    regexp_replace(
      regexp_replace(
        lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)),
        '^www\\.', ''),
      ':(80|443)$', '') AS domain,
    regexp_replace(
      regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1),
      '/$', '') AS path,
    array_to_string(
      list_sort(
        list_filter(
          string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
          x -> x <> '' AND NOT starts_with(x, 'utm_')
               AND NOT list_contains(
                 ['fbclid', 'gclid', 'ref'], string_split(x, '=')[1])
        )
      ), '&') AS q
  FROM planted
),
canon AS (
  SELECT doc_id, url, domain,
    concat('https://', domain, path,
           CASE WHEN q <> '' THEN concat('?', q) ELSE '' END) AS url_norm
  FROM normed
  WHERE NOT (domain = 'tracker.biz' OR domain LIKE '%.tracker.biz')
)
SELECT doc_id, url, url_norm, domain FROM (
  SELECT doc_id, url, url_norm, domain,
         row_number() OVER (PARTITION BY url_norm ORDER BY doc_id) AS rn
  FROM canon
) WHERE rn = 1
"""


def q_c4_clean(min_words: int = 5, min_kept_lines: int = 1) -> str:
    """C4 line-filter oracle; planting and rules mirror
    operators.textstats.attach_c4_lines / c4_line_filter."""
    from .operators.textstats import C4_BLOCKLIST

    blocked = " AND ".join(
        f"NOT contains(lower(x), '{p}')" for p in C4_BLOCKLIST
    )
    return f"""
WITH lined AS (
  SELECT doc_id,
         substr(text, 1, 40) || '.' || chr(10) || 'too short' || chr(10)
           || substr(text, 41, 40)
           || CASE WHEN doc_id % 9 = 0
                THEN chr(10) || 'this page uses javascript heavily.'
                ELSE '' END AS ltext
  FROM documents
),
base AS (
  SELECT doc_id, string_split(ltext, chr(10)) AS lines FROM lined
),
k AS (
  SELECT doc_id, lines,
         list_filter(lines, x ->
           (ends_with(x, '.') OR ends_with(x, '!')
            OR ends_with(x, '?') OR ends_with(x, '"'))
           AND len(string_split(x, ' ')) >= {min_words}
           AND {blocked}) AS kept
  FROM base
)
SELECT doc_id, len(lines) AS n_lines, len(kept) AS n_kept,
       array_to_string(kept, chr(10)) AS cleaned,
       (len(kept) >= {min_kept_lines}) AS doc_kept
FROM k
"""


def q_chunk_documents(chunk_tokens: int = 64, overlap: int = 16) -> str:
    stride = chunk_tokens - overlap
    return f"""
WITH base AS (
  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
),
c AS (
  SELECT doc_id, toks,
         unnest(range(greatest(
           CAST(ceil((len(toks) - {overlap}) / {stride}.0) AS BIGINT),
           1))) AS ci
  FROM base
)
SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
       CAST(ci * {stride} AS BIGINT) AS start_tok,
       CAST(len(list_slice(toks, ci * {stride} + 1,
                           ci * {stride} + {chunk_tokens})) AS BIGINT)
         AS n_chunk_tokens,
       md5(array_to_string(
         list_slice(toks, ci * {stride} + 1,
                    ci * {stride} + {chunk_tokens}), ' ')) AS chunk_hash
FROM c
"""


def q_full_curation(
    min_quality: float = 0.45,
    capacity: int = 128,
    min_words: int = 5,
    model_gate: bool = False,
    source_cap: int | None = None,
    mixture: dict[str, float] | None = None,
    mixture_default: float = 1.0,
    shuffle_shard: int | None = None,
) -> str:
    """Composed curation pipeline oracle: C4 clean -> quality gate ->
    exact dedup keep-first -> [optional model-quality gate ->
    mixture sample -> per-source cap ->] next-fit pack [-> global
    shuffle index], all over `cleaned` text. Each stage mirrors its
    standalone oracle exactly."""
    from .operators.textstats import C4_BLOCKLIST

    blocked = " AND ".join(
        f"NOT contains(lower(x), '{p}')" for p in C4_BLOCKLIST
    )
    ctoks = "string_split(lower(cleaned), ' ')"
    csr, cpr, cls = _quality_micro_frags("cleaned", ctoks)
    extra_ctes = ""
    pack_src = "dd"
    if model_gate:
        w_uni = f"({_H32.format(x='t')} % 2001) - 1000"
        bigram = "ctk[i] || ' ' || ctk[i+1]"
        w_bi = f"({_H32.format(x=bigram)} % 2001) - 1000"
        extra_ctes += f"""
mqf AS (
  SELECT doc_id, source, cleaned,
    coalesce(list_sum(list_transform(ctk, t -> {w_uni})), 0) AS uni,
    coalesce(list_sum(list_transform(range(1, len(ctk)),
                                     i -> {w_bi})), 0) AS bi,
    len(ctk) + greatest(len(ctk) - 1, 0) AS n_feat
  FROM (SELECT doc_id, source, cleaned, {ctoks} AS ctk FROM dd)
),
mq AS (
  SELECT doc_id, source, cleaned FROM mqf
  WHERE (uni + bi) / (CAST(n_feat AS DOUBLE) * 1000.0) > 0
),"""
        pack_src = "mq"
    if mixture is not None:
        h = _H32.format(x="'mix1' || CAST(doc_id AS VARCHAR)")
        cut = str(int(mixture_default * 2**32))
        for src, r in mixture.items():
            cut = (
                f"CASE WHEN source = {_sql_str(src)} THEN {int(r * 2**32)} "
                f"ELSE {cut} END"
            )
        extra_ctes += f"""
mix AS (
  SELECT doc_id, source, cleaned FROM {pack_src}
  WHERE {h} < ({cut})
),"""
        pack_src = "mix"
    if source_cap is not None:
        extra_ctes += f"""
cap AS (
  SELECT doc_id, source, cleaned FROM (
    SELECT doc_id, source, cleaned,
           row_number() OVER (
             PARTITION BY source
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS crn
    FROM {pack_src}
  ) WHERE crn <= {source_cap}
),"""
        pack_src = "cap"
    if shuffle_shard is not None:
        skey = "md5('shuf1' || CAST(doc_id AS VARCHAR))"
        srn = f"row_number() OVER (ORDER BY {skey}, doc_id) - 1"
        shuffle_tail = (
            f",\n       {srn} AS global_idx,"
            f"\n       CAST(floor(({srn}) / {shuffle_shard}) AS BIGINT)"
            " AS shard"
        )
    else:
        shuffle_tail = ""
    return f"""
WITH lined AS (
  SELECT doc_id, source,
         substr(text, 1, 40) || '.' || chr(10) || 'too short' || chr(10)
           || substr(text, 41, 40)
           || CASE WHEN doc_id % 9 = 0
                THEN chr(10) || 'this page uses javascript heavily.'
                ELSE '' END AS ltext
  FROM documents
),
k AS (
  SELECT doc_id, source,
         list_filter(string_split(ltext, chr(10)), x ->
           (ends_with(x, '.') OR ends_with(x, '!')
            OR ends_with(x, '?') OR ends_with(x, '"'))
           AND len(string_split(x, ' ')) >= {min_words}
           AND {blocked}) AS kept
  FROM lined
),
c AS (
  SELECT doc_id, source, array_to_string(kept, chr(10)) AS cleaned
  FROM k WHERE len(kept) >= 1
),
sq AS (
  SELECT doc_id, source, cleaned,
    {csr} AS srm,
    {cpr} AS prm,
    {cls} AS lsm
  FROM c
),
surv AS (
  SELECT doc_id, source, cleaned FROM sq
  WHERE ({_QM}) / 1000000.0 >= {min_quality}
),
dd AS (
  SELECT doc_id, source, cleaned FROM (
    SELECT doc_id, source, cleaned,
           row_number() OVER (PARTITION BY md5(cleaned)
                              ORDER BY doc_id) AS rn
    FROM surv
  ) WHERE rn = 1
),{extra_ctes}
pbase AS (
  SELECT source, doc_id,
         CAST(len({ctoks}) AS BIGINT) AS nt,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM {pack_src}
),
pk AS (
  WITH RECURSIVE p(source, rn, doc_id, nt, bin, used) AS (
    SELECT source, rn, doc_id, nt, CAST(0 AS BIGINT), nt
    FROM pbase WHERE rn = 1
    UNION ALL
    SELECT b.source, b.rn, b.doc_id, b.nt,
           CASE WHEN p.used + b.nt <= {capacity} THEN p.bin
                ELSE p.bin + 1 END,
           CASE WHEN p.used + b.nt <= {capacity} THEN p.used + b.nt
                ELSE b.nt END
    FROM p JOIN pbase b ON b.source = p.source AND b.rn = p.rn + 1
  ) SELECT * FROM p
)
SELECT source, doc_id, nt AS n_tokens, bin AS bin_idx,
       CAST(used - nt AS BIGINT) AS offset_in_bin{shuffle_tail}
FROM pk
"""


def q_token_counts() -> str:
    rx = BPE_RX.replace("\\", "\\\\")
    return f"""
SELECT doc_id,
       len({_TOKS}) AS n_tokens_ws,
       len(regexp_extract_all(text, '{BPE_RX}')) AS n_tokens_bpe,
       length(text) AS n_chars_actual
FROM documents
"""


def _in_list(var: str, words: list[str]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"list_contains([{lst}], {var})"


def _quality_micro_frags(text: str, toks: str) -> tuple[str, str, str]:
    """The round-5 exact-integer quality fragments, mirroring
    textstats.quality_scores: (sr_micro, pr_micro, ls_micro)
    expressions — every ratio an integer floor division in MICRO
    units, so quality = micro/1e6 is the bit-identical IEEE double
    in both engines (the earlier float formula hit engine-dependent
    1-ulp rounding ties at the 6th printed decimal at sf0.1)."""
    stop_filter = f"len(list_filter({toks}, x -> {_in_list('x', STOPWORDS)}))"
    sr = f"(1000000 * {stop_filter}) // greatest(len({toks}), 1)"
    pr = (
        f"(1000000 * len(regexp_extract_all({text}, '[^A-Za-z0-9\\s]')))"
        f" // greatest(length({text}), 1)"
    )
    ls = f"least((1000000 * len({toks})) // 64, 1000000)"
    return sr, pr, ls


_QM = "(4 * least(4 * srm, 1000000) + 3 * lsm + 3 * (1000000 - prm)) // 10"


def q_quality() -> str:
    sr, pr, ls = _quality_micro_frags("text", _TOKS)
    return f"""
WITH base AS (
  SELECT doc_id,
    len({_TOKS}) AS n_tokens,
    {sr} AS srm,
    {pr} AS prm,
    {ls} AS lsm
  FROM documents
)
SELECT doc_id, n_tokens,
       srm / 1000000.0 AS stopword_ratio,
       prm / 1000000.0 AS punct_ratio,
       lsm / 1000000.0 AS len_score,
       ({_QM}) / 1000000.0 AS quality,
       CAST({_QM} AS BIGINT) AS quality_micro
FROM base
"""


def q_lang_id() -> str:
    structs = ", ".join(
        "{{'neg': -len(list_filter({t}, x -> {inlist})), "
        "'lang': '{lang}', "
        "'hits': len(list_filter({t}, x -> {inlist}))}}".format(
            t=_TOKS, inlist=_in_list("x", LANG_MARKERS[lang]), lang=lang
        )
        for lang in sorted(LANG_MARKERS)
    )
    return f"""
WITH scored AS (
  SELECT doc_id, list_sort([{structs}]) AS s FROM documents
)
SELECT doc_id, s[1].lang AS lang_guess, s[1].hits AS marker_hits
FROM scored
"""


def q_fingerprint() -> str:
    return f"""
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct({_TOKS})), ' '))
         AS fingerprint
FROM documents
"""


def q_tfidf_top_terms(k: int, max_df_frac: float | None = None) -> str:
    """tfidf_top_terms twin (operators/textstats.py): same integer
    (tf DESC, df ASC, term ASC) ranking; the float tfidf column is
    recomputed independently (ln over doubles — value-compared at
    the gate's 6-decimal normalization, never used for ordering).
    max_df_frac applies the IDENTICAL Zipf-head vocabulary cut the
    operator takes (df_docs <= frac * N) before the tf ⋈ df join."""
    df_cut = (
        ""
        if max_df_frac is None
        else (
            f" HAVING count(*) <= {max_df_frac!r}"
            " * (SELECT count(*) FROM documents)"
        )
    )
    return f"""
WITH terms AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, unnest({_TOKS}) AS term FROM documents
  ) WHERE term <> ''
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2
),
dfr AS (
  SELECT term, count(*) AS df_docs FROM tf GROUP BY 1{df_cut}
),
n AS (SELECT count(*) AS n_docs FROM documents),
ranked AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfr.df_docs,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf DESC, dfr.df_docs ASC, tf.term ASC
         ) AS term_rank,
         tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfr.df_docs) AS tfidf
  FROM tf JOIN dfr USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df_docs, term_rank, tfidf
FROM ranked WHERE term_rank <= {k}
"""


def q_model_quality() -> str:
    """Independent recompute of the hashed-ngram linear scorer
    (operators/textstats.py model_quality_scores): integer weight
    sums, one final double division — bit-identical across engines."""
    w_uni = f"({_H32.format(x='t')} % 2001) - 1000"
    bigram = "toks[i] || ' ' || toks[i+1]"
    w_bi = f"({_H32.format(x=bigram)} % 2001) - 1000"
    return f"""
WITH base AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
),
f AS (
  SELECT doc_id,
    coalesce(list_sum(list_transform(toks, t -> {w_uni})), 0) AS uni,
    coalesce(list_sum(list_transform(range(1, len(toks)),
                                     i -> {w_bi})), 0) AS bi,
    len(toks) + greatest(len(toks) - 1, 0) AS n_feat
  FROM base
)
SELECT doc_id,
       (uni + bi) / (CAST(n_feat AS DOUBLE) * 1000.0) AS model_logit,
       ((uni + bi) / (CAST(n_feat AS DOUBLE) * 1000.0)) > 0 AS model_keep
FROM f
"""


def q_source_caps(cap: int) -> str:
    """cap_per_group twin: same md5-of-id pseudo-random survivor
    order, plain window SQL."""
    return f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
) WHERE rn <= {cap}
"""


def q_length_quantiles() -> str:
    """length_quantiles twin: nearest-rank ceil(q*n) via integer
    (q_num*n + q_den - 1) // q_den — the same arithmetic the Spark
    side runs, no float quantile anywhere."""
    return f"""
WITH l AS (
  SELECT source, doc_id, len({_TOKS}) AS tok_len FROM documents
),
r AS (
  SELECT source, tok_len,
         row_number() OVER (PARTITION BY source
                            ORDER BY tok_len, doc_id) AS rn,
         count(*) OVER (PARTITION BY source) AS n
  FROM l
)
SELECT source,
  max(CASE WHEN rn = (n + 1) // 2 THEN tok_len END) AS p50_tokens,
  max(CASE WHEN rn = (9 * n + 9) // 10 THEN tok_len END) AS p90_tokens,
  max(CASE WHEN rn = (99 * n + 99) // 100 THEN tok_len END) AS p99_tokens,
  CAST(max(n) AS BIGINT) AS n_docs
FROM r GROUP BY source
"""


def q_kmeans_fit(k: int = 8, n_iter: int = 3) -> str:
    """kmeans_fit twin (operators/similarity.py): the SAME
    deterministic k-medians run, UNROLLED into one SQL chain — seed
    draw by (md5(id), id), argmin of round(sqdist, 5) with bucket
    index tie-break, element-wise median update, empty clusters keep
    the previous centroid. Iterative-but-deterministic algorithms
    stay fully oracle-checkable this way."""
    return _kmeans_ctes(k, n_iter) + "\nSELECT vec_id, bkt, dist FROM final"


def _kmeans_ctes(k: int, n_iter: int) -> str:
    """Shared unrolled k-medians CTE chain ending in `final`
    (vec_id, emb, bkt, dist) — q_kmeans_fit returns it directly,
    q_semantic_cluster_dedup appends the within-cluster pair step."""
    dist = (
        "round(list_sum(list_transform(range(1, len(e.emb) + 1), "
        "i -> (e.emb[i] - c.centroid[i]) * (e.emb[i] - c.centroid[i]))), 5)"
    )

    def assign(cent_rel: str, name: str) -> str:
        return f"""
{name}_all AS (
  SELECT e.vec_id, e.emb, c.bkt, {dist} AS dist,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {dist} ASC, c.bkt ASC) AS rnk
  FROM e, {cent_rel} c
),
{name} AS (SELECT vec_id, emb, bkt, dist FROM {name}_all WHERE rnk = 1)"""

    parts = [
        f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
cent_0 AS (
  SELECT CAST(row_number() OVER (
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS INT)
           AS bkt,
         emb AS centroid
  FROM e
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k}
)"""
    ]
    for i in range(1, n_iter + 1):
        parts.append("," + assign(f"cent_{i - 1}", f"a_{i}"))
        parts.append(f""",
med_{i} AS (
  SELECT bkt, list(cv ORDER BY pos) AS centroid FROM (
    SELECT bkt, pos, median(v) AS cv FROM (
      SELECT bkt, unnest(generate_series(1, len(emb))) AS pos,
             unnest(emb) AS v
      FROM a_{i}
    ) GROUP BY 1, 2
  ) GROUP BY 1
),
cent_{i} AS (
  SELECT p.bkt, coalesce(n.centroid, p.centroid) AS centroid
  FROM cent_{i - 1} p LEFT JOIN med_{i} n USING (bkt)
)""")
    parts.append("," + assign(f"cent_{n_iter}", "final"))
    return "".join(parts)


def q_semantic_cluster_dedup(
    k: int = 8, n_iter: int = 2, threshold: float = 0.95
) -> str:
    """semantic_cluster_dedup twin (operators/similarity.py): the
    same unrolled k-medians assignment, then a vector is kept iff no
    same-cluster vector with a smaller id has cosine >= threshold
    (SemDeDup keep-lowest-id rule)."""
    cos = (
        "round(list_dot_product(a.emb, b.emb) /"
        " (sqrt(list_dot_product(a.emb, a.emb)) *"
        " sqrt(list_dot_product(b.emb, b.emb))), 5)"
    )
    return f"""{_kmeans_ctes(k, n_iter)},
losers AS (
  SELECT DISTINCT b.vec_id
  FROM final a JOIN final b
    ON a.bkt = b.bkt AND a.vec_id < b.vec_id
  WHERE {cos} >= {threshold}
)
SELECT f.vec_id, f.bkt, f.dist,
       (l.vec_id IS NULL) AS is_kept
FROM final f LEFT JOIN losers l USING (vec_id)
"""


def q_mixture_sample(
    rates: dict[str, float],
    default_rate: float = 1.0,
    seed: str = "mix1",
    group_col: str = "source",
) -> str:
    """mixture_sample twin (operators/curation.py): identical
    integer-threshold md5 draw — keep iff
    h32(seed || id) < rate * 2^32."""
    h = _H32.format(x=f"'{seed}' || CAST(doc_id AS VARCHAR)")
    cut = str(int(default_rate * 2**32))
    for src, r in rates.items():
        cut = (
            f"CASE WHEN {group_col} = {_sql_str(src)} THEN {int(r * 2**32)} "
            f"ELSE {cut} END"
        )
    return f"""
SELECT doc_id, text, lang, source, n_chars, {h} AS u32
FROM documents
WHERE {h} < ({cut})
"""


def q_quality_top_frac(frac_num: int, frac_den: int) -> str:
    """quality_top_fraction twin: same quality formula as q_quality,
    same integer ceil cut rank per source."""
    sr, pr, ls = _quality_micro_frags("text", _TOKS)
    return f"""
WITH base AS (
  SELECT doc_id, source, {sr} AS srm, {pr} AS prm, {ls} AS lsm
  FROM documents
),
q AS (
  SELECT doc_id, source, ({_QM}) / 1000000.0 AS quality
  FROM base
),
r AS (
  SELECT doc_id, source, quality,
    row_number() OVER (PARTITION BY source
                       ORDER BY quality DESC, doc_id) AS rn,
    count(*) OVER (PARTITION BY source) AS n
  FROM q
)
SELECT doc_id, source, quality FROM r
WHERE rn <= ({frac_num} * n + {frac_den - 1}) // {frac_den}
"""


def q_stream_ingest_curation(min_quality: float = 0.45) -> str:
    """Streaming ingest-curation twin: the stream's quality gate +
    content-hash dedup over (documents + planted copies at higher
    ids) reduces to plain batch SQL — one row per distinct
    quality-passing text. Only the order-INDEPENDENT columns
    (h, quality) are stated: which copy's doc_id survives depends on
    micro-batch arrival order (file-source mtime ordering is not
    guaranteed for same-millisecond files), and both copies share
    h and quality."""
    sr, pr, ls = _quality_micro_frags("text", _TOKS)
    # DISTINCT is load-bearing: the stream's content-hash dedup
    # emits each text ONCE even when the documents table itself
    # carries duplicate texts (first observed at sf0.1 — 8 intra-
    # table dup texts; sf0.01 happens to have none), not just the
    # planted +1000000 copies. quality is a function of text, so
    # DISTINCT (h, quality) == distinct text.
    return f"""
WITH base AS (
  SELECT doc_id, text, {sr} AS srm, {pr} AS prm, {ls} AS lsm
  FROM documents
)
SELECT DISTINCT md5(text) AS h,
       ({_QM}) / 1000000.0 AS quality
FROM base
WHERE ({_QM}) / 1000000.0 >= {min_quality}
"""


def q_token_budget(budget: int, seed: str = "mix1") -> str:
    """token_budget_sample twin: cumulative token sum per source in
    (md5, id) order, admit while cum <= budget."""
    key = f"md5('{seed}' || CAST(doc_id AS VARCHAR))"
    return f"""
SELECT doc_id, source, n_tok, cum_tok FROM (
  SELECT doc_id, source,
    CAST(len({_TOKS}) AS BIGINT) AS n_tok,
    CAST(sum(CAST(len({_TOKS}) AS BIGINT)) OVER (
      PARTITION BY source ORDER BY {key}, doc_id
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
  FROM documents
)
WHERE cum_tok <= {budget}
"""


def q_shuffle_index(shard_size: int = 100, seed: str = "shuf1") -> str:
    """shuffle_index twin (operators/curation.py): the Spark side
    computes the permutation via two-level bucket ranks; the oracle
    states the SAME order as one global window — the equivalence of
    the two formulations is exactly what the hash check proves."""
    key = f"md5('{seed}' || CAST(doc_id AS VARCHAR))"
    return f"""
SELECT doc_id,
       row_number() OVER (ORDER BY {key}, doc_id) - 1 AS global_idx,
       CAST(floor((row_number() OVER (ORDER BY {key}, doc_id) - 1)
                  / {shard_size}) AS BIGINT) AS shard
FROM documents
"""


def q_line_dedup(min_count: int = 3) -> str:
    """line_dedup twin (operators/textstats.py): same planted
    boilerplate (attach_boilerplate), same occurrence-count rule,
    same in-order rebuild, all-hot docs dropped."""
    return f"""
WITH lined AS (
  SELECT doc_id,
    CASE WHEN doc_id % 97 = 0 THEN 'boilerplate footer'
    ELSE (
      CASE WHEN doc_id % 5 = 0 THEN
        CASE WHEN doc_id % 3 != 0
             THEN 'boilerplate banner ' || CAST(doc_id % 16 AS VARCHAR)
                  || chr(10) || text || chr(10) || 'boilerplate footer'
             ELSE text || chr(10) || 'boilerplate footer' END
      ELSE
        CASE WHEN doc_id % 3 != 0
             THEN 'boilerplate banner ' || CAST(doc_id % 16 AS VARCHAR)
                  || chr(10) || text
             ELSE text END
      END
    ) END AS btext
  FROM documents
),
base AS (
  SELECT doc_id, string_split(btext, chr(10)) AS ls FROM lined
),
flat AS (
  SELECT doc_id, len(ls) AS n_lines,
         CAST(unnest(range(1, len(ls) + 1)) AS INT) AS pos, ls
  FROM base
),
lines AS (SELECT doc_id, n_lines, pos, ls[pos] AS line FROM flat),
hot AS (
  SELECT line FROM lines GROUP BY 1 HAVING count(*) >= {min_count}
)
SELECT doc_id, max(n_lines) AS n_lines,
       CAST(count(*) AS BIGINT) AS n_kept,
       array_to_string(list(line ORDER BY pos), chr(10)) AS clean_text
FROM lines ANTI JOIN hot USING (line)
GROUP BY doc_id
"""


def q_unigram_logprob() -> str:
    """unigram_logprob twin (operators/textstats.py): identical
    integer bit-surprisal — bits = length(bin(N)) - length(bin(cnt))
    per token instance, summed per doc; the only float op is the
    final per-token average, on identical integers."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
),
vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1),
tot AS (SELECT sum(cnt)::BIGINT AS n_total FROM vocab),
bits AS (
  SELECT t.doc_id,
         length(bin(tot.n_total)) - length(bin(v.cnt)) AS b
  FROM toks t JOIN vocab v USING (tok), tot
)
SELECT doc_id,
       sum(b)::BIGINT AS surprisal_bits,
       count(*) AS n_tokens,
       round(sum(b)::BIGINT / count(*), 5) AS bits_per_token
FROM bits GROUP BY doc_id
"""


def q_knn_graph(
    k_nn: int = 5, k_clusters: int = 8, n_iter: int = 2, nprobe: int = 1
) -> str:
    """knn_graph twin (operators/similarity.py): the same unrolled
    k-medians assignment, then per vector the k_nn neighbors from its
    nprobe nearest cells (source side probes final_all rnk <= nprobe;
    corpus side stays in its rnk = 1 argmin cell) ranked by
    (cosine DESC, neighbor id ASC) — cosine rounded to 5 decimals in
    both engines before ranking, so the edge set is identical."""
    cos = (
        "round(list_dot_product(a.emb, b.emb) /"
        " (sqrt(list_dot_product(a.emb, a.emb)) *"
        " sqrt(list_dot_product(b.emb, b.emb))), 5)"
    )
    return f"""{_kmeans_ctes(k_clusters, n_iter)},
probe AS (
  SELECT vec_id, emb, bkt FROM final_all WHERE rnk <= {nprobe}
),
scored AS (
  SELECT a.vec_id AS src, b.vec_id AS nbr, {cos} AS cos_sim
  FROM probe a JOIN final b
    ON a.bkt = b.bkt AND a.vec_id <> b.vec_id
),
ranked AS (
  SELECT src, nbr, cos_sim,
         row_number() OVER (PARTITION BY src
                            ORDER BY cos_sim DESC, nbr ASC) AS rank
  FROM scored
)
SELECT src AS vec_id, nbr AS nbr_id, rank, cos_sim
FROM ranked WHERE rank <= {k_nn}
"""


def q_priority_sample(k: int = 10, seed: str = "prio") -> str:
    """priority_sample twin (operators/curation.py): identical
    priority w * 2^32 / (h32(seed||id) + 1) — one fp multiply + one
    correctly-rounded division over exact integers, so both engines
    hold the same doubles; rank/tau windows mirror the operator."""
    h = _H32.format(x=f"{_sql_str(seed)} || CAST(doc_id AS VARCHAR)")
    return f"""
WITH pri AS (
  SELECT source, doc_id, n_chars AS w,
         n_chars::DOUBLE * 4294967296 / ({h} + 1) AS priority
  FROM documents
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY source
                               ORDER BY priority DESC, doc_id ASC) AS rn
  FROM pri
),
taus AS (
  SELECT source, max(CASE WHEN rn = {k + 1} THEN priority END) AS tau
  FROM ranked GROUP BY source
)
SELECT r.source, r.doc_id, r.w, r.priority,
       greatest(r.w::DOUBLE, coalesce(t.tau, 0.0)) AS w_hat
FROM ranked r JOIN taus t USING (source)
WHERE r.rn <= {k}
"""


def q_perplexity_buckets(n_buckets: int = 3) -> str:
    """perplexity_buckets twin (operators/curation.py): the
    q_unigram_logprob integer bit-surprisal, then the deterministic
    ntile ((rank-1)*n) div count over (bits_per_token, doc_id)."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
),
vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1),
tot AS (SELECT sum(cnt)::BIGINT AS n_total FROM vocab),
bits AS (
  SELECT t.doc_id,
         length(bin(tot.n_total)) - length(bin(v.cnt)) AS b
  FROM toks t JOIN vocab v USING (tok), tot
),
scored AS (
  SELECT doc_id, round(sum(b)::BIGINT / count(*), 5) AS bits_per_token
  FROM bits GROUP BY doc_id
),
ranked AS (
  SELECT s.doc_id, d.source, s.bits_per_token,
         row_number() OVER (PARTITION BY d.source
                            ORDER BY s.bits_per_token, s.doc_id) AS rn,
         count(*) OVER (PARTITION BY d.source) AS n
  FROM scored s JOIN documents d USING (doc_id)
)
SELECT doc_id, source, bits_per_token,
       ((rn - 1) * {n_buckets}) // n AS ppl_bucket
FROM ranked
"""


def q_bloom_decontaminate(
    bits: list[int], m_bits: int = 4096, k_hashes: int = 4
) -> str:
    """bloom_decontaminate twin (operators/curation.py): the SAME
    driver-computed bit positions (passed in, not recomputed — one
    build, two membership checkers), the same md5-based h32 over
    f"{{i}}:{{shingle}}", the same 5-token whitespace shingles."""
    bit_arr = "[" + ", ".join(str(b) for b in bits) + "]"
    checks = " AND ".join(
        "list_contains("
        + bit_arr
        + ", CAST("
        + _H32.format(x=f"'{i}:' || s")
        + f" % {m_bits} AS INT))"
        for i in range(k_hashes)
    )
    return f"""
WITH sh AS (
  SELECT doc_id, unnest({_SHINGLES}) AS s FROM documents
),
hits AS (
  SELECT doc_id, count(*) AS n_hit
  FROM sh WHERE {checks} GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(h.n_hit, 0) > 0 AS bloom_hit,
       coalesce(h.n_hit, 0) AS n_hit_shingles
FROM documents d LEFT JOIN hits h USING (doc_id)
"""


def q_sqrt_temperature_mixture(seed: str = "temp") -> str:
    """sqrt_temperature_mixture twin (operators/curation.py): the
    same sqrt(n_min/n_g) rate — int divide, sqrt, x 2^32, all
    correctly-rounded IEEE ops — and the same md5 admission gate."""
    h = _H32.format(x=f"{_sql_str(seed)} || CAST(doc_id AS VARCHAR)")
    return f"""
WITH counts AS (
  SELECT source, count(*) AS n FROM documents GROUP BY source
),
rates AS (
  SELECT source,
         sqrt((SELECT min(n) FROM counts)::DOUBLE / n) AS keep_rate
  FROM counts
)
SELECT d.source, d.doc_id, r.keep_rate
FROM documents d JOIN rates r USING (source)
WHERE {h}::DOUBLE < r.keep_rate * 4294967296
"""


def q_full_curation_v4(
    bits: list[int],
    k: int = 20,
    m_bits: int = 4096,
    k_hashes: int = 4,
) -> str:
    """q_full_curation_v4 twin (__spark_entry__): the four round-4
    sampling stages composed as one CTE chain — perplexity head+middle
    gate, Bloom shingle decontamination (same driver-built bits),
    sqrt-temperature admission (counts over the CURRENT survivor set,
    as the operator computes them), and priority sampling with the
    (k+1)-th-priority tau estimator."""
    bit_arr = "[" + ", ".join(str(b) for b in bits) + "]"
    checks = " AND ".join(
        "list_contains("
        + bit_arr
        + ", CAST("
        + _H32.format(x=f"'{i}:' || s")
        + f" % {m_bits} AS INT))"
        for i in range(k_hashes)
    )
    h_temp = _H32.format(x="'temp' || CAST(doc_id AS VARCHAR)")
    h_prio = _H32.format(x="'prio' || CAST(k3.doc_id AS VARCHAR)")
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
),
vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1),
tot AS (SELECT sum(cnt)::BIGINT AS n_total FROM vocab),
bits_t AS (
  SELECT t.doc_id,
         length(bin(tot.n_total)) - length(bin(v.cnt)) AS b
  FROM toks t JOIN vocab v USING (tok), tot
),
scored AS (
  SELECT doc_id, round(sum(b)::BIGINT / count(*), 5) AS bpt
  FROM bits_t GROUP BY doc_id
),
rankedq AS (
  SELECT s.doc_id, d.source,
         row_number() OVER (PARTITION BY d.source
                            ORDER BY s.bpt, s.doc_id) AS rn,
         count(*) OVER (PARTITION BY d.source) AS n
  FROM scored s JOIN documents d USING (doc_id)
),
head AS (
  SELECT doc_id, source FROM rankedq WHERE ((rn - 1) * 3) // n <= 1
),
sh AS (
  SELECT d.doc_id, unnest({_SHINGLES}) AS s
  FROM documents d JOIN head USING (doc_id)
),
bloomhit AS (SELECT DISTINCT doc_id FROM sh WHERE {checks}),
kept2 AS (
  SELECT h.doc_id, h.source FROM head h
  LEFT JOIN bloomhit b USING (doc_id) WHERE b.doc_id IS NULL
),
counts AS (SELECT source, count(*) AS n FROM kept2 GROUP BY source),
rates AS (
  SELECT source,
         sqrt((SELECT min(n) FROM counts)::DOUBLE / n) AS keep_rate
  FROM counts
),
kept3 AS (
  SELECT k2.doc_id, k2.source, d.n_chars
  FROM kept2 k2 JOIN rates r USING (source)
  JOIN documents d USING (doc_id)
  WHERE {h_temp}::DOUBLE < r.keep_rate * 4294967296
),
pri AS (
  SELECT k3.source, k3.doc_id, k3.n_chars AS w,
         k3.n_chars::DOUBLE * 4294967296 / ({h_prio} + 1) AS priority
  FROM kept3 k3
),
rankedp AS (
  SELECT *, row_number() OVER (PARTITION BY source
                               ORDER BY priority DESC, doc_id ASC) AS rn
  FROM pri
),
taus AS (
  SELECT source, max(CASE WHEN rn = {k + 1} THEN priority END) AS tau
  FROM rankedp GROUP BY source
)
SELECT r.source, r.doc_id, r.w, r.priority,
       greatest(r.w::DOUBLE, coalesce(t.tau, 0.0)) AS w_hat
FROM rankedp r JOIN taus t USING (source)
WHERE r.rn <= {k}
"""


def q_cms_token_counts(
    candidates_k: int = 20,
    width: int = 512,
    depth: int = 4,
    seed: str = "cms",
) -> str:
    """cms_token_counts twin (operators/curation.py): the identical
    depth-row count-min sketch on the shared 32-bit md5 hash, the
    same top-k candidates, estimate = min over cells — the one-sided
    overestimate property (inflation >= 0) is checked row-by-row by
    the hash comparison."""
    h = (
        f"CAST(('0x' || substr(md5('{seed}' || CAST(i AS VARCHAR)"
        f" || ':' || token), 1, 8)) AS BIGINT) % {width}"
    )
    return f"""
WITH toks AS (
  SELECT unnest({_TOKS}) AS token FROM documents
),
ex AS (
  SELECT token, count(*) AS exact_n FROM toks
  WHERE token <> '' GROUP BY 1
),
ii AS (SELECT unnest(range({depth})) AS i),
cells AS (
  SELECT token, exact_n, i, {h} AS cell FROM ex CROSS JOIN ii
),
sk AS (
  SELECT i, cell, sum(exact_n)::BIGINT AS cell_n
  FROM cells GROUP BY 1, 2
),
top AS (
  SELECT token, exact_n,
         row_number() OVER (ORDER BY exact_n DESC, token ASC) AS rank
  FROM ex
  QUALIFY rank <= {candidates_k}
),
est AS (
  SELECT t.token, t.exact_n, t.rank, min(sk.cell_n) AS cms_n
  FROM top t CROSS JOIN ii
  JOIN sk ON sk.i = ii.i
   AND sk.cell = {h.replace('token', 't.token').replace('CAST(i ', 'CAST(ii.i ')}
  GROUP BY 1, 2, 3
)
SELECT token, exact_n, cms_n, cms_n - exact_n AS inflation, rank
FROM est
"""


def q_curriculum_order(seed: str = "curr1") -> str:
    """curriculum_order twin (operators/curation.py): the Spark side
    computes the staged permutation via two-level (stage, bucket)
    ranks; the oracle states the SAME order as one global window over
    (stage, md5 key, id) — the equivalence is what the hash proves.
    Stage derivation (length bands, capped at 3) matches the gate
    wrapper's expression exactly."""
    key = f"md5('{seed}' || CAST(doc_id AS VARCHAR))"
    stage = f"least(CAST(floor(len({_TOKS}) / 64) AS INT), 3)"
    return f"""
WITH staged AS (
  SELECT doc_id, {stage} AS stage FROM documents
)
SELECT doc_id, stage,
       row_number() OVER (ORDER BY stage, {key}, doc_id) - 1
         AS curriculum_idx
FROM staged
"""


def q_bigram_logprob(min_count: int = 2, backoff_bits: int = 2) -> str:
    """bigram_logprob twin (operators/textstats.py): Stupid Backoff
    with the same whole-bit quantization — kept bigram costs
    length(bin(c1)) - length(bin(bcnt)), pruned one costs
    backoff_bits + unigram surprisal of w2; all-integer until the
    final per-position average."""
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS l FROM documents),
pairs AS (
  SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(l) - 1),
                  i -> struct_pack(w1 := l[i], w2 := l[i + 1]))) AS bg
    FROM toks WHERE len(l) >= 2
  )
),
uni AS (
  SELECT tok, count(*) AS cnt
  FROM (SELECT unnest(l) AS tok FROM toks) GROUP BY 1
),
tot AS (SELECT sum(cnt)::BIGINT AS n_total FROM uni),
bi AS (
  SELECT w1, w2, count(*) AS bcnt FROM pairs GROUP BY 1, 2
  HAVING count(*) >= {min_count}
),
bits AS (
  SELECT p.doc_id,
         CASE WHEN b.bcnt IS NOT NULL
              THEN length(bin(u1.cnt)) - length(bin(b.bcnt))
              ELSE {backoff_bits} + length(bin(tot.n_total))
                   - length(bin(u2.cnt)) END AS b,
         CASE WHEN b.bcnt IS NULL THEN 1 ELSE 0 END AS is_bo
  FROM pairs p
  JOIN uni u1 ON p.w1 = u1.tok
  JOIN uni u2 ON p.w2 = u2.tok
  LEFT JOIN bi b ON p.w1 = b.w1 AND p.w2 = b.w2, tot
)
SELECT doc_id,
       sum(b)::BIGINT AS bigram_bits,
       count(*) AS n_bigrams,
       sum(is_bo)::BIGINT AS n_backoff,
       round(sum(b)::BIGINT / count(*), 5) AS bits_per_bigram
FROM bits GROUP BY doc_id
"""


def q_leakage_safe_split(
    test_permille: int = 100, seed: str = "split1"
) -> str:
    """leakage_safe_split twin (operators/curation.py): group-hash
    test draw, then train docs sharing any distinct 5-shingle with
    the test side are quarantined."""
    h = _H32.format(x=f"'{seed}' || source")
    return f"""
WITH base AS (
  SELECT doc_id, source,
         ({h}) % 1000 < {test_permille} AS is_test,
         {_SHINGLES} AS sh
  FROM documents
),
ex AS (SELECT doc_id, is_test, unnest(sh) AS s FROM base),
test_sh AS (SELECT DISTINCT s FROM ex WHERE is_test),
hits AS (
  SELECT DISTINCT doc_id FROM ex
  WHERE NOT is_test AND s IN (SELECT s FROM test_sh)
)
SELECT b.doc_id, b.source,
       CASE WHEN b.is_test THEN 'test'
            WHEN h.doc_id IS NOT NULL THEN 'quarantined'
            ELSE 'train' END AS split
FROM base b LEFT JOIN hits h USING (doc_id)
"""


def q_embedding_diversity() -> str:
    """embedding_diversity twin (operators/similarity.py): the same
    pair-free identity sum_{x,y}||x-y||^2 = 2n*S2 - 2*||S1||^2 —
    per-row squared norms via list_dot_product, the centroid term
    via unnest + generate_subscripts (zipped in one select) grouped
    on (label, dim), both engines summing the identical
    float->double values and rounding to 5."""
    return """
WITH e AS (SELECT label, embedding::DOUBLE[] AS emb FROM embeddings),
norms AS (
  SELECT label, count(*) AS n, sum(list_dot_product(emb, emb)) AS s2
  FROM e GROUP BY label
),
expl AS (
  SELECT label, unnest(emb) AS val, generate_subscripts(emb, 1) AS pos
  FROM e
),
dims AS (
  SELECT label, pos, sum(val) AS sv FROM expl GROUP BY label, pos
),
qq AS (SELECT label, sum(sv * sv) AS q FROM dims GROUP BY label)
SELECT norms.label, n,
       round(s2 / n, 5) AS mean_sq_norm,
       round(q / (n * n), 5) AS centroid_sq_norm,
       CASE WHEN n > 1 THEN round((2 * n * s2 - 2 * q) / (n * (n - 1)), 5)
            ELSE 0.0 END AS mean_pair_dist_sq
FROM norms JOIN qq USING (label)
"""


def _dsir_weights_cte(
    target_source: str,
    n_buckets: int,
    seed: str,
    rel: str = "documents",
) -> str:
    """Shared weight CTE chain for the DSIR twins: hashed-bigram
    buckets (same h32 % n_buckets as _bigram_buckets), Laplace-
    smoothed whole-bit log-ratio per bucket, per-doc instance sum.
    `rel` lets a composed pipeline (q_full_curation_v5) run the
    chain over an upstream CTE instead of the raw table."""
    h = _H32.format(x=f"'{seed}:' || l[i] || ' ' || l[i + 1]")
    src = "'" + target_source.replace("'", "''") + "'"
    return f"""
toks AS (
  SELECT doc_id, source, {_TOKS} AS l FROM {rel}
),
inst AS (
  SELECT doc_id, source,
         unnest(list_transform(generate_series(1, len(l) - 1),
                i -> ({h}) % {n_buckets})) AS b
  FROM toks WHERE len(l) >= 2
),
raw AS (SELECT b, count(*) AS raw_n FROM inst GROUP BY 1),
tgt AS (
  SELECT b, count(*) AS tgt_n FROM inst
  WHERE source = {src} GROUP BY 1
),
rt AS (SELECT sum(raw_n)::BIGINT AS raw_total FROM raw),
tt AS (SELECT coalesce(sum(tgt_n), 0)::BIGINT AS tgt_total FROM tgt),
ratio AS (
  SELECT raw.b,
         (length(bin(rt.raw_total + {n_buckets}))
          - length(bin(raw.raw_n + 1)))
       - (length(bin(tt.tgt_total + {n_buckets}))
          - length(bin(coalesce(tgt.tgt_n, 0) + 1))) AS dbits
  FROM raw LEFT JOIN tgt USING (b), rt, tt
),
w AS (
  SELECT doc_id, count(*) AS n_pairs,
         sum(dbits)::BIGINT AS dsir_bits,
         round(sum(dbits)::BIGINT / count(*), 5) AS bits_per_pair
  FROM inst JOIN ratio USING (b)
  GROUP BY doc_id
)"""


def q_dsir_weights(
    target_source: str = "src0",
    n_buckets: int = 1024,
    seed: str = "dsir1",
) -> str:
    """dsir_importance twin (operators/curation.py): hashed-bigram
    DSIR importance weights, target = the docs of one source."""
    return f"""
WITH {_dsir_weights_cte(target_source, n_buckets, seed)}
SELECT doc_id, n_pairs, dsir_bits, bits_per_pair FROM w
"""


def q_dsir_sample(
    target_source: str = "src0",
    keep_permille: int = 250,
    n_buckets: int = 1024,
    seed: str = "dsir1",
) -> str:
    """dsir_sample twin: global top-fraction by (dsir_bits DESC,
    doc_id) with m = ceil(keep_permille * n / 1000) — the oracle runs
    the naive global window the distributed histogram-threshold
    version provably equals."""
    return f"""
WITH {_dsir_weights_cte(target_source, n_buckets, seed)},
m AS (SELECT (count(*) * {keep_permille} + 999) // 1000 AS m FROM w),
r AS (
  SELECT *, row_number() OVER (ORDER BY dsir_bits DESC, doc_id) AS rn
  FROM w
)
SELECT doc_id, n_pairs, dsir_bits, bits_per_pair
FROM r, m WHERE r.rn <= m.m
"""


def _spans_ctes(benchmark_snippets: list[str], k: int = 5) -> str:
    """The decontaminate_spans CTE chain (driver-built md5 shingle
    set, positional shingles, island merge, original-case rebuild),
    ending at `spans` (per-doc interval stats) and `clean` (per-doc
    rebuilt text) over base relation `d` — shared by the standalone
    twin and the composed q_full_curation_v5."""
    import hashlib

    hashes: set[str] = set()
    for s in benchmark_snippets:
        toks = s.lower().split(" ")
        for i in range(len(toks) - k + 1):
            hashes.add(
                hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()
            )
    if not hashes:
        raise ValueError(f"no snippet has >= {k} tokens")
    in_list = ", ".join("'" + h + "'" for h in sorted(hashes))
    return f"""d AS (
  SELECT doc_id, text, string_split(text, ' ') AS lo,
         string_split(lower(text), ' ') AS ll
  FROM documents
),
pos AS (
  SELECT doc_id, ph.p AS pos, ph.h AS h FROM (
    SELECT doc_id,
           unnest(CASE WHEN len(ll) >= {k} THEN
             list_transform(generate_series(1, len(ll) - {k - 1}),
               i -> struct_pack(p := i - 1,
                 h := md5(array_to_string(
                        list_slice(ll, i, i + {k - 1}), ' '))))
             ELSE [] END) AS ph
    FROM d
  )
),
hits AS (SELECT doc_id, pos FROM pos WHERE h IN ({in_list})),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos > coalesce(max(pos + {k - 1}) OVER (
                PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              -2) + 1 THEN 1 ELSE 0 END AS is_start
  FROM hits
),
isl2 AS (
  SELECT doc_id, pos,
         sum(is_start) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM isl
),
merged AS (
  SELECT doc_id, island, min(pos) AS s, max(pos) + {k - 1} AS e
  FROM isl2 GROUP BY 1, 2
),
spans AS (
  SELECT doc_id, count(*) AS n_spans,
         sum(e - s + 1)::BIGINT AS n_tokens_removed
  FROM merged GROUP BY doc_id
),
tokpos AS (
  SELECT doc_id, unnest(lo) AS tok,
         generate_subscripts(lo, 1) - 1 AS p
  FROM d
),
covered AS (
  SELECT doc_id, unnest(generate_series(s, e)) AS p FROM merged
),
kept AS (
  SELECT t.doc_id, t.tok, t.p
  FROM tokpos t LEFT JOIN covered c
    ON t.doc_id = c.doc_id AND t.p = c.p
  WHERE c.p IS NULL
),
clean AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean_text
  FROM kept GROUP BY doc_id
)"""


def q_decontaminate_spans(benchmark_snippets: list[str], k: int = 5) -> str:
    """decontaminate_spans twin (operators/curation.py): same
    driver-built md5 shingle-hash set (python md5 == both engines'
    md5), positional k-shingles over lowercased tokens, gaps-and-
    islands merge, and an original-case token rebuild that drops
    covered positions."""
    return f"""
WITH {_spans_ctes(benchmark_snippets, k)}
SELECT d.doc_id,
       coalesce(s.n_spans, 0)::BIGINT AS n_spans,
       coalesce(s.n_tokens_removed, 0)::BIGINT AS n_tokens_removed,
       coalesce(cl.clean_text, '') AS clean_text
FROM d LEFT JOIN spans s USING (doc_id)
       LEFT JOIN clean cl ON d.doc_id = cl.doc_id
"""


def q_full_curation_v5(
    benchmark_snippets: list[str],
    k: int = 3,
    target_source: str = "src0",
    keep_permille: int = 500,
    n_buckets: int = 1024,
    seed: str = "dsir1",
    shard_size: int = 100,
    shuffle_seed: str = "shuf1",
) -> str:
    """q_full_curation_v5 twin (__spark_entry__): the round-4-restart
    chain composed end-to-end — span-level decontamination EXCISION
    (the cleaned text, not a drop flag, feeds downstream), DSIR
    importance selection over the CLEANED corpus (weights change
    when spans are cut — the composition is not order-free), and the
    deterministic global shuffle order over the survivors. The
    oracle states DSIR's top-fraction and the shuffle as global
    windows; the Spark side computes both distributed."""
    key = f"md5('{shuffle_seed}' || CAST(doc_id AS VARCHAR))"
    rn = f"row_number() OVER (ORDER BY {key}, doc_id)"
    return f"""
WITH {_spans_ctes(benchmark_snippets, k)},
cleaned AS (
  SELECT d.doc_id, coalesce(cl.clean_text, '') AS text, doc.source
  FROM d LEFT JOIN clean cl USING (doc_id)
  JOIN documents doc ON d.doc_id = doc.doc_id
),
{_dsir_weights_cte(target_source, n_buckets, seed, rel="cleaned")},
m AS (SELECT (count(*) * {keep_permille} + 999) // 1000 AS m FROM w),
r AS (
  SELECT *, row_number() OVER (ORDER BY dsir_bits DESC, doc_id) AS rn
  FROM w
),
sel AS (SELECT doc_id, dsir_bits FROM r, m WHERE r.rn <= m.m)
SELECT doc_id, dsir_bits,
       {rn} - 1 AS global_idx,
       CAST(floor(({rn} - 1) / {shard_size}) AS BIGINT) AS shard
FROM sel
"""


def q_fuzzy_decontaminate(threshold: float = 0.5) -> str:
    """Twin of curation.fuzzy_decontaminate (MinHash-LSH near-dup
    decontamination): benchmark = every doc_id % 31 == 0 raw
    document; corpus = the planted dedup corpus (CORPUS_SQL), so
    verbatim benchmark leaks, their exact copies and their
    near-copies are all present. Same MINHASH_PARAMS / N_BANDS /
    ROWS_PER_BAND banding on BOTH sides, candidates = any band-key
    collision, verified by exact shingle Jaccard >= threshold."""
    perm_rows = ", ".join(
        f"({j}, {a}, {b})" for j, (a, b) in enumerate(MINHASH_PARAMS)
    )
    band_key = (
        "md5(array_to_string(list_slice(sig, "
        f"b.band * {ROWS_PER_BAND} + 1, "
        f"b.band * {ROWS_PER_BAND} + {ROWS_PER_BAND}), ','))"
    )
    bands_src = f"(SELECT unnest(range({N_BANDS})) AS band) b"
    return f"""
WITH corpus AS ({CORPUS_SQL}),
bench AS (
  SELECT doc_id AS bench_id, text FROM documents WHERE doc_id % 31 = 0
),
sh AS (SELECT doc_id, unnest({_SHINGLES}) AS s FROM corpus),
shb AS (SELECT bench_id, unnest({_SHINGLES}) AS s FROM bench),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
sizesb AS (SELECT bench_id, count(*) AS n FROM shb GROUP BY 1),
perms AS (SELECT * FROM (VALUES {perm_rows}) p(j, a, b)),
mins AS (
  SELECT sh.doc_id, p.j,
         min((p.a * {_H32.format(x='sh.s')} + p.b) % {MERSENNE_P}) AS mh
  FROM sh, perms p GROUP BY 1, 2
),
sigs AS (SELECT doc_id, list(mh ORDER BY j) AS sig FROM mins GROUP BY 1),
bandsc AS (
  SELECT doc_id, b.band, {band_key} AS key FROM sigs, {bands_src}
),
minsb AS (
  SELECT shb.bench_id, p.j,
         min((p.a * {_H32.format(x='shb.s')} + p.b) % {MERSENNE_P}) AS mh
  FROM shb, perms p GROUP BY 1, 2
),
sigsb AS (
  SELECT bench_id, list(mh ORDER BY j) AS sig FROM minsb GROUP BY 1
),
bandsb AS (
  SELECT bench_id, b.band, {band_key} AS key FROM sigsb, {bands_src}
),
cand AS (
  SELECT DISTINCT c.doc_id, bb.bench_id
  FROM bandsc c JOIN bandsb bb ON c.band = bb.band AND c.key = bb.key
),
inter AS (
  SELECT cand.doc_id, cand.bench_id, count(*) AS i
  FROM cand
  JOIN sh a ON a.doc_id = cand.doc_id
  JOIN shb b2 ON b2.bench_id = cand.bench_id AND a.s = b2.s
  GROUP BY 1, 2
),
jac AS (
  SELECT i.doc_id,
         round(i.i / CAST(sa.n + sb.n - i.i AS DOUBLE), 6) AS jaccard
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.doc_id
  JOIN sizesb sb ON sb.bench_id = i.bench_id
  WHERE round(i.i / CAST(sa.n + sb.n - i.i AS DOUBLE), 6) >= {threshold}
),
per AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bench_matches,
         max(jaccard) AS best_jaccard
  FROM jac GROUP BY 1
)
SELECT c.doc_id,
       coalesce(p.n_bench_matches, 0) AS n_bench_matches,
       coalesce(p.best_jaccard, 0.0) AS best_jaccard,
       coalesce(p.n_bench_matches, 0) > 0 AS contaminated
FROM corpus c LEFT JOIN per p USING (doc_id)
"""


_GOPHER_WORDS = f"list_filter({_TOKS}, x -> x <> '')"
_GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def _gopher_flags_sql(
    min_words: int = 50,
    max_words: int = 100000,
    min_mwl: float = 3.0,
    max_mwl: float = 10.0,
    rel: str = "documents",
) -> str:
    """Shared per-document Gopher rule-flag derivation (twin of
    operators/textstats.py gopher_rules): same tokenization, same
    6-dp rounding BEFORE every threshold comparison, rule flags as
    0/1 ints. `rel` lets composed pipelines run the rules over an
    upstream CTE (any relation with doc_id + text)."""
    w = _GOPHER_WORDS
    hits = " + ".join(
        f"CAST(list_contains(w, '{s}') AS INT)" for s in _GOPHER_STOPS
    )
    return f"""
base AS (
  SELECT doc_id, {w} AS w,
         string_split(text, chr(10)) AS lines,
         len(regexp_extract_all(text, '#')) +
         len(regexp_extract_all(text, '\\.\\.\\.')) +
         len(regexp_extract_all(text, '…')) AS n_sym
  FROM {rel}
),
m AS (
  SELECT doc_id,
    CAST(len(w) AS INT) AS n_words,
    round(coalesce(list_sum(list_transform(w, x -> len(x))), 0)
          / greatest(CAST(len(w) AS DOUBLE), 1.0), 6) AS mean_word_len,
    round(n_sym / greatest(CAST(len(w) AS DOUBLE), 1.0), 6) AS symbol_ratio,
    round(len(list_filter(lines, x -> regexp_matches(x, '^\\s*[-*•]')))
          / greatest(CAST(len(lines) AS DOUBLE), 1.0), 6) AS bullet_ratio,
    round(len(list_filter(lines, x -> regexp_matches(x, '(\\.\\.\\.|…)\\s*$')))
          / greatest(CAST(len(lines) AS DOUBLE), 1.0), 6) AS ellipsis_ratio,
    round(len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
          / greatest(CAST(len(w) AS DOUBLE), 1.0), 6) AS alpha_ratio,
    CAST({hits} AS INT) AS stopword_hits
  FROM base
),
flags AS (
  SELECT *,
    CAST(n_words >= {min_words} AND n_words <= {max_words} AS INT)
      AS r_word_count,
    CAST(mean_word_len >= {min_mwl} AND mean_word_len <= {max_mwl} AS INT)
      AS r_mean_word_len,
    CAST(symbol_ratio < 0.1 AS INT) AS r_symbol,
    CAST(bullet_ratio < 0.9 AS INT) AS r_bullet,
    CAST(ellipsis_ratio < 0.3 AS INT) AS r_ellipsis,
    CAST(alpha_ratio > 0.8 AS INT) AS r_alpha,
    CAST(stopword_hits >= 2 AS INT) AS r_stopwords
  FROM m
)"""


def q_gopher_rules() -> str:
    """gopher_rules twin (operators/textstats.py): Rae et al. 2021
    rule filter, per-rule 0/1 flags + conjunction keep."""
    return f"""
WITH {_gopher_flags_sql()}
SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_ratio,
       ellipsis_ratio, alpha_ratio, stopword_hits,
       r_word_count, r_mean_word_len, r_symbol, r_bullet, r_ellipsis,
       r_alpha, r_stopwords,
       CAST(r_word_count * r_mean_word_len * r_symbol * r_bullet *
            r_ellipsis * r_alpha * r_stopwords AS INT) AS keep
FROM flags
"""


_GOPHER_ORDER = (
    "r_word_count", "r_mean_word_len", "r_symbol", "r_bullet",
    "r_ellipsis", "r_alpha", "r_stopwords",
)


def q_gopher_funnel() -> str:
    """gopher_funnel twin: isolated-fail count per rule + cumulative
    survivors of rules 1..i in the fixed stage order."""
    aggs = ["CAST(count(*) AS BIGINT) AS n_docs"]
    cum: list[str] = []
    for i, r in enumerate(_GOPHER_ORDER):
        cum.append(r)
        aggs.append(f"CAST(sum(1 - {r}) AS BIGINT) AS fail_{i}")
        aggs.append(
            f"CAST(sum({' * '.join(cum)}) AS BIGINT) AS cum_{i}"
        )
    rows = " UNION ALL ".join(
        f"SELECT {i + 1} AS stage_idx, '{r}' AS stage,"
        f" fail_{i} AS n_fail_alone, cum_{i} AS n_survive_cum, n_docs"
        " FROM agg"
        for i, r in enumerate(_GOPHER_ORDER)
    )
    return f"""
WITH {_gopher_flags_sql()},
agg AS (SELECT {', '.join(aggs)} FROM flags)
{rows}
"""


def q_srp_near_dup(
    threshold: float = 0.30,
    n_bits: int = 16,
    bands: int = 4,
    dim: int = 64,
    bucket_cap: int | None = None,
    seed: str = "srp",
) -> str:
    """srp_near_dup_pairs twin (operators/similarity.py): the SAME
    deterministic Rademacher plane constants (srp_planes — a shared
    parameter, like the bloom bit positions), independently applied:
    per-bit sign of the round-5 dot, band keys via string concat,
    DISTINCT band-collision candidates, exact round-5 cosine verify.
    With bucket_cap: the identical hash sub-split rule as
    q_embed_near_dup_capped on (band, key) cells."""
    from .operators.similarity import srp_planes

    rpb = n_bits // bands
    planes = srp_planes(n_bits, dim, seed)

    def plane_lit(p: int) -> str:
        return (
            "[" + ",".join(str(v) for v in planes[p]) + "]::DOUBLE[]"
        )

    bit_exprs = ",\n    ".join(
        f"CASE WHEN round(list_sum(list_transform(range(1, {dim} + 1),"
        f" i -> emb[i] * ({plane_lit(p)})[i])), 5) >= 0"
        f" THEN '1' ELSE '0' END AS b{p}"
        for p in range(n_bits)
    )
    band_selects = "\n  UNION ALL ".join(
        f"SELECT vec_id, {b} AS band, "
        + "||".join(f"b{b * rpb + i}" for i in range(rpb))
        + " AS key FROM sig"
        for b in range(bands)
    )
    cos = (
        "round(list_dot_product(ea.emb, eb.emb) /"
        " (sqrt(list_dot_product(ea.emb, ea.emb)) *"
        " sqrt(list_dot_product(eb.emb, eb.emb))), 5)"
    )
    if bucket_cap is None:
        pair_src, sub_eq, cap_ctes = "keyed", "", ""
    else:
        h = _H32.format(x="CAST(vec_id AS VARCHAR)")
        cap_ctes = f""",
s AS (SELECT band, key, count(*) AS n FROM keyed GROUP BY 1, 2),
capped AS (
  SELECT k.vec_id, k.band, k.key,
         {h} % CAST(ceil(n / {bucket_cap}.0) AS BIGINT) AS sub
  FROM keyed k JOIN s USING (band, key)
)"""
        pair_src, sub_eq = "capped", " AND x.sub = y.sub"
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
sig AS (
  SELECT vec_id, {bit_exprs}
  FROM e
),
keyed AS (
  {band_selects}
){cap_ctes},
cand AS (
  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
  FROM {pair_src} x JOIN {pair_src} y
    ON x.band = y.band AND x.key = y.key{sub_eq} AND x.vec_id < y.vec_id
)
SELECT vec_a, vec_b, {cos} AS cosine
FROM cand JOIN e ea ON ea.vec_id = vec_a JOIN e eb ON eb.vec_id = vec_b
WHERE {cos} >= {threshold}
"""


def q_data_card() -> str:
    """data_card twin (operators/curation.py): the q_quality per-doc
    score chain with source/lang carried, rolled up per source —
    count, token sum, exact interpolated p50 (quantile_cont), round-5
    mean quality, exact-dup doc fraction via a (source, md5) count,
    and the modal language with (count desc, lang asc) tie-break."""
    sr, pr, ls = _quality_micro_frags("text", _TOKS)
    return f"""
WITH perdoc AS (
  SELECT source, lang, md5(text) AS h,
    len({_TOKS}) AS n_tokens,
    CAST({_QM} AS BIGINT) AS quality_micro
  FROM (
    SELECT source, lang, text,
           {sr} AS srm, {pr} AS prm, {ls} AS lsm
    FROM documents
  )
),
main AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         quantile_cont(n_tokens, 0.5) AS p50_tokens,
         round(CAST(sum(quality_micro) AS DOUBLE) / count(*)
               / 1000000.0, 5) AS mean_quality
  FROM perdoc GROUP BY 1
),
grp AS (SELECT source, h, count(*) AS cnt FROM perdoc GROUP BY 1, 2),
dup AS (
  SELECT source,
         sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup_docs
  FROM grp GROUP BY 1
),
lc AS (SELECT source, lang, count(*) AS n FROM perdoc GROUP BY 1, 2),
toplang AS (
  SELECT source, lang AS top_lang,
         row_number() OVER (PARTITION BY source
                            ORDER BY n DESC, lang ASC) AS r
  FROM lc
)
SELECT m.source, m.n_docs, m.total_tokens, m.p50_tokens,
       m.mean_quality,
       round(CAST(d.dup_docs AS DOUBLE) / m.n_docs, 5) AS dup_doc_frac,
       t.top_lang
FROM main m JOIN dup d USING (source)
JOIN toplang t ON t.source = m.source AND t.r = 1
"""


def q_ivfpq_ann(
    k_coarse: int = 8,
    m: int = 4,
    k_codes: int = 8,
    n_iter: int = 2,
    dim: int = 64,
    n_queries: int = 5,
    topk: int = 10,
    nprobe: int = 2,
    rerank: int | None = None,
) -> str:
    """ivfpq_ann_topk twin (operators/similarity.py): the shared
    unrolled k-medians chain supplies BOTH the coarse inverted-list
    assignment (`final`) and the query probe ranking
    (`cent_{n_iter}`); the per-subspace PQ chains supply the
    reconstruction; ADC ranks only rows whose list id is among the
    query's nprobe nearest, with the same round-5 + id tie-break
    discipline at every ranking step; rerank=R re-ranks the ADC
    shortlist by exact distance."""
    d_sub = dim // m
    pq_chains = ",".join(
        _pq_subspace_ctes(j, j * d_sub + 1, (j + 1) * d_sub, k_codes, n_iter)
        for j in range(m)
    )
    recon = " || ".join(f"f{j}.centroid" for j in range(m))
    pq_joins = "".join(
        f" JOIN fin_{j} f{j} USING (vec_id)" for j in range(1, m)
    )
    cdist = (
        "round(list_sum(list_transform(range(1, {d} + 1), "
        "i -> (q.qe[i] - c.centroid[i]) * (q.qe[i] - c.centroid[i]))), 5)"
    ).format(d=dim)
    head = f"""{_kmeans_ctes(k_coarse, n_iter)},
{pq_chains.lstrip()},
recon AS (
  SELECT f0.vec_id, {recon} AS recon
  FROM fin_0 f0{pq_joins}
),
q AS (
  SELECT vec_id AS query_id, emb AS qe FROM e WHERE vec_id < {n_queries}
),
probe_all AS (
  SELECT q.query_id, q.qe, c.bkt,
         row_number() OVER (PARTITION BY q.query_id
                            ORDER BY {cdist} ASC, c.bkt ASC) AS rnk
  FROM q, cent_{n_iter} c
),
probe AS (SELECT query_id, qe, bkt FROM probe_all WHERE rnk <= {nprobe}),
corpus AS (
  SELECT f.vec_id, f.bkt, r.recon, e.emb AS ne
  FROM final f JOIN recon r USING (vec_id) JOIN e USING (vec_id)
),
scored AS (
  SELECT p.query_id, c.vec_id AS neighbor_id,
         round(list_sum(list_transform(range(1, {dim} + 1),
           i -> (p.qe[i] - c.recon[i]) * (p.qe[i] - c.recon[i]))), 5)
           AS adc_dist,
         c.ne, p.qe
  FROM corpus c JOIN probe p ON c.bkt = p.bkt AND c.vec_id <> p.query_id
),
rnk AS (
  SELECT query_id, neighbor_id, adc_dist, ne, qe,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY adc_dist ASC, neighbor_id ASC) AS INT) AS rank
  FROM scored
)"""
    if rerank is None:
        return (
            head
            + f"""
SELECT query_id, neighbor_id, adc_dist, rank FROM rnk
WHERE rank <= {topk}
"""
        )
    return (
        head
        + f""",
cand AS (
  SELECT query_id, neighbor_id,
         round(list_sum(list_transform(range(1, {dim} + 1),
           i -> (qe[i] - ne[i]) * (qe[i] - ne[i]))), 5) AS exact_dist
  FROM rnk WHERE rank <= {rerank}
),
rnk2 AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
             ORDER BY exact_dist ASC, neighbor_id ASC) AS INT) AS rank
  FROM cand
)
SELECT query_id, neighbor_id, exact_dist, rank FROM rnk2 WHERE rank <= {topk}
"""
    )


def q_contrastive_triplets(
    t_pos: float = 0.35,
    n_bits: int = 24,
    bands: int = 8,
    dim: int = 64,
) -> str:
    """contrastive_triplets twin (operators/similarity.py): the full
    SRP candidate set (threshold -1 keeps every band collision with
    its cosine) serves both pair members as anchors; per anchor the
    best positive (cosine >= t_pos) and hardest negative (< t_pos)
    are picked by (cosine DESC, id ASC) row_number; anchors missing
    either role drop out via the inner join."""
    return f"""
WITH nd AS ({q_srp_near_dup(-1.0, n_bits, bands, dim)}),
both_roles AS (
  SELECT vec_a AS anchor_id, vec_b AS other_id, cosine FROM nd
  UNION ALL
  SELECT vec_b AS anchor_id, vec_a AS other_id, cosine FROM nd
),
pos AS (
  SELECT anchor_id, other_id AS pos_id, cosine AS pos_cos,
         row_number() OVER (PARTITION BY anchor_id
                            ORDER BY cosine DESC, other_id ASC) AS rnk
  FROM both_roles WHERE cosine >= {t_pos}
),
neg AS (
  SELECT anchor_id, other_id AS neg_id, cosine AS neg_cos,
         row_number() OVER (PARTITION BY anchor_id
                            ORDER BY cosine DESC, other_id ASC) AS rnk
  FROM both_roles WHERE cosine < {t_pos}
)
SELECT p.anchor_id, p.pos_id, p.pos_cos, n.neg_id, n.neg_cos
FROM pos p JOIN neg n ON p.anchor_id = n.anchor_id
WHERE p.rnk = 1 AND n.rnk = 1
"""


def _pq_subspace_ctes(j: int, lo: int, hi: int, k: int, n_iter: int) -> str:
    """One subspace's unrolled k-medians chain for the PQ twin —
    the _kmeans_ctes recipe over a 1-based inclusive list slice of
    the embedding, with the CHOSEN CENTROID carried through the
    final assignment (the reconstruction needs it)."""
    dist = (
        "round(list_sum(list_transform(range(1, len(e.emb) + 1), "
        "i -> (e.emb[i] - c.centroid[i]) * (e.emb[i] - c.centroid[i]))), 5)"
    )

    def assign(cent_rel: str, name: str, keep_centroid: bool) -> str:
        extra = ", c.centroid AS centroid" if keep_centroid else ""
        return f"""
{name}_all AS (
  SELECT e.vec_id, e.emb, c.bkt, {dist} AS dist{extra},
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {dist} ASC, c.bkt ASC) AS rnk
  FROM e_{j} e, {cent_rel} c
),
{name} AS (SELECT * EXCLUDE (rnk) FROM {name}_all WHERE rnk = 1)"""

    parts = [
        f"""
e_{j} AS (
  SELECT vec_id, (embedding::DOUBLE[])[{lo}:{hi}] AS emb FROM embeddings
),
cent_{j}_0 AS (
  SELECT CAST(row_number() OVER (
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS INT)
           AS bkt,
         emb AS centroid
  FROM e_{j}
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k}
)"""
    ]
    for i in range(1, n_iter + 1):
        parts.append(
            "," + assign(f"cent_{j}_{i - 1}", f"a_{j}_{i}", False)
        )
        parts.append(f""",
med_{j}_{i} AS (
  SELECT bkt, list(cv ORDER BY pos) AS centroid FROM (
    SELECT bkt, pos, median(v) AS cv FROM (
      SELECT bkt, unnest(generate_series(1, len(emb))) AS pos,
             unnest(emb) AS v
      FROM a_{j}_{i}
    ) GROUP BY 1, 2
  ) GROUP BY 1
),
cent_{j}_{i} AS (
  SELECT p.bkt, coalesce(n.centroid, p.centroid) AS centroid
  FROM cent_{j}_{i - 1} p LEFT JOIN med_{j}_{i} n USING (bkt)
)""")
    parts.append("," + assign(f"cent_{j}_{n_iter}", f"fin_{j}", True))
    return "".join(parts)


def q_pq_ann(
    m: int = 4,
    k_codes: int = 8,
    n_iter: int = 2,
    dim: int = 64,
    n_queries: int = 5,
    topk: int = 10,
    rerank: int | None = None,
) -> str:
    """pq_ann_topk twin (operators/similarity.py): per-subspace
    k-medians codebooks -> nearest-code assignment -> ADC distance
    of the exact query against the concatenated reconstruction,
    one linear list_sum fold over all dim positions (the same float
    addition order as the Spark aggregate), round-5, id tie-break.
    With rerank=R: ADC builds a per-query shortlist of R rows which
    is re-ranked by exact round-5 distance against the original
    embeddings (IVFADC+R), id tie-break at both stages."""
    d_sub = dim // m
    chains = ",".join(
        _pq_subspace_ctes(j, j * d_sub + 1, (j + 1) * d_sub, k_codes, n_iter)
        for j in range(m)
    )
    recon = " || ".join(f"f{j}.centroid" for j in range(m))
    joins = "".join(
        f" JOIN fin_{j} f{j} USING (vec_id)" for j in range(1, m)
    )
    head = f"""
WITH {chains.lstrip()[0:]},
recon AS (
  SELECT f0.vec_id, {recon} AS recon
  FROM fin_0 f0{joins}
),
q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
  FROM embeddings WHERE vec_id < {n_queries}
),
scored AS (
  SELECT q.query_id, r.vec_id AS neighbor_id,
         round(list_sum(list_transform(range(1, {dim} + 1),
           i -> (q.qe[i] - r.recon[i]) * (q.qe[i] - r.recon[i]))), 5)
           AS adc_dist
  FROM recon r, q
  WHERE r.vec_id <> q.query_id
),
rnk AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
             ORDER BY adc_dist ASC, neighbor_id ASC) AS INT) AS rank
  FROM scored
)"""
    if rerank is None:
        return (
            head
            + f"""
SELECT query_id, neighbor_id, adc_dist, rank FROM rnk WHERE rank <= {topk}
"""
        )
    return (
        head
        + f""",
shortlist AS (
  SELECT query_id, neighbor_id FROM rnk WHERE rank <= {rerank}
),
cand AS (
  SELECT s.query_id, s.neighbor_id,
         round(list_sum(list_transform(range(1, {dim} + 1),
           i -> (q.qe[i] - ne[i]) * (q.qe[i] - ne[i]))), 5) AS exact_dist
  FROM shortlist s
  JOIN q USING (query_id)
  JOIN (SELECT vec_id, embedding::DOUBLE[] AS ne FROM embeddings) e
    ON e.vec_id = s.neighbor_id
),
rnk2 AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
             ORDER BY exact_dist ASC, neighbor_id ASC) AS INT) AS rank
  FROM cand
)
SELECT query_id, neighbor_id, exact_dist, rank FROM rnk2 WHERE rank <= {topk}
"""
    )


def _bpe_cte_chain(n_merges: int) -> str:
    """Shared UNROLLED BPE training chain (operators/tokenizer.py
    bpe_train_words twin): one (word, freq) aggregate, then n_merges
    rounds of pair-count -> deterministic argmax -> boundary-framed
    literal replace. The \x01\x01 double-separator framing makes the
    single-pass L2R `replace` boundary-safe without lookarounds
    (RE2-less DuckDB and Spark's literal replace agree bytewise).
    Ends with CTEs syms{n_merges} and best0..best{n_merges-1}."""
    chain = """
WITH words0 AS (
  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents
  ) WHERE word <> '' AND NOT contains(word, chr(1)) GROUP BY 1
),
syms0 AS (
  SELECT word, freq,
         chr(1) || chr(1) ||
         array_to_string(
           list_append(
             list_transform(range(1, length(word) + 1),
                            i -> substr(word, CAST(i AS INT), 1)),
             '</w>'),
           chr(1) || chr(1)) || chr(1) || chr(1) AS s
  FROM words0
)"""
    for k in range(n_merges):
        chain += f""",
lst{k} AS (
  SELECT freq, list_filter(string_split(s, chr(1) || chr(1)),
                           x -> x <> '') AS syms
  FROM syms{k}
),
pairs{k} AS (
  SELECT a, b, CAST(sum(freq) AS BIGINT) AS f FROM (
    SELECT syms[CAST(u.i AS INT)] AS a,
           syms[CAST(u.i AS INT) + 1] AS b, freq
    FROM lst{k}, UNNEST(range(1, len(syms))) AS u(i)
  ) GROUP BY 1, 2
),
best{k} AS (SELECT a, b, f FROM pairs{k} ORDER BY f DESC, a, b LIMIT 1),
syms{k + 1} AS (
  SELECT word, freq,
         replace(s, chr(1) || b.a || chr(1) || chr(1) || b.b || chr(1),
                 chr(1) || b.a || b.b || chr(1)) AS s
  FROM syms{k}, best{k} b
)"""
    return chain


def q_bpe_merges(n_merges: int = 8) -> str:
    """bpe_merges twin: the n_merges learned merge rows."""
    selects = "\nUNION ALL ".join(
        f"SELECT {k + 1} AS merge_rank, a AS lhs, b AS rhs, "
        f"a || b AS merged, f AS pair_freq FROM best{k}"
        for k in range(n_merges)
    )
    return _bpe_cte_chain(n_merges) + f"""
SELECT CAST(merge_rank AS INT) AS merge_rank, lhs, rhs, merged,
       pair_freq
FROM ({selects})
"""


def q_bpe_token_counts(n_merges: int = 8) -> str:
    """bpe_token_counts twin: re-run the training chain, count final
    symbols per word, explode the corpus and sum per doc."""
    return _bpe_cte_chain(n_merges) + f""",
per_word AS (
  SELECT word,
         CAST(len(list_filter(string_split(s, chr(1) || chr(1)),
                              x -> x <> '')) AS BIGINT)
           AS n_word_tokens
  FROM syms{n_merges}
),
exploded AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word
  FROM documents
)
SELECT doc_id, CAST(sum(n_word_tokens) AS BIGINT) AS n_bpe_tokens
FROM exploded JOIN per_word USING (word)
WHERE word <> '' AND NOT contains(word, chr(1))
GROUP BY doc_id
"""


def q_token_budget_bpe(
    budget: int, n_merges: int = 8, seed: str = "mix1"
) -> str:
    """token_budget_sample(n_tok_col=...) ∘ bpe_token_counts twin:
    the per-source running-sum admission of q_token_budget, but the
    per-doc count is the BPE-tokenizer-true symbol count from the
    q_bpe_token_counts chain instead of the whitespace proxy. Docs
    with no countable word (empty text) have no count row and are
    excluded by the inner join — same on the Spark side."""
    key = f"md5('{seed}' || CAST(doc_id AS VARCHAR))"
    return _bpe_cte_chain(n_merges) + f""",
per_word AS (
  SELECT word,
         CAST(len(list_filter(string_split(s, chr(1) || chr(1)),
                              x -> x <> '')) AS BIGINT)
           AS n_word_tokens
  FROM syms{n_merges}
),
exploded AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word
  FROM documents
),
counts AS (
  SELECT doc_id, CAST(sum(n_word_tokens) AS BIGINT) AS n_tok
  FROM exploded JOIN per_word USING (word)
  WHERE word <> '' AND NOT contains(word, chr(1))
  GROUP BY doc_id
)
SELECT doc_id, source, n_tok, cum_tok FROM (
  SELECT doc_id, source, n_tok,
    CAST(sum(n_tok) OVER (
      PARTITION BY source ORDER BY {key}, doc_id
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
  FROM documents JOIN counts USING (doc_id)
)
WHERE cum_tok <= {budget}
"""


def q_softdedup_weights(threshold: float = 0.6) -> str:
    """softdedup_weights twin (operators/curation.py, cluster mode):
    the components oracle wrapped as a CTE, cluster size per
    component, weight = round(1/n, 5) and weighted_tokens =
    round(n_tokens / n, 5) — the same single long/long IEEE division
    Spark performs (1.0 is cast to DOUBLE explicitly: DuckDB's bare
    1.0 literal is DECIMAL and would divide under decimal rounding)."""
    return f"""
WITH comp AS ({q_dedup_components(threshold)}),
corp AS ({CORPUS_SQL}),
sized AS (
  SELECT doc_id, CAST(component AS VARCHAR) AS cluster_key,
         count(*) OVER (PARTITION BY component)::BIGINT AS cluster_n
  FROM comp
)
SELECT c.doc_id, s.cluster_key, s.cluster_n,
       round(1.0::DOUBLE / s.cluster_n, 5) AS weight,
       len({_TOKS})::BIGINT AS n_tokens,
       round(len({_TOKS}) / CAST(s.cluster_n AS DOUBLE), 5)
         AS weighted_tokens,
       ((1000 * len({_TOKS})) // s.cluster_n)::BIGINT
         AS weighted_tokens_milli
FROM corp c JOIN sized s USING (doc_id)
"""


def q_token_budget_soft(budget_milli: int, seed: str = "mix1") -> str:
    """token_budget_sample(n_tok_col=weighted_tokens_milli) ∘
    softdedup_weights (exact mode) twin: the per-source running-sum
    admission of q_token_budget, but each document contributes its
    SOFT token mass — (1000 * n_tokens) floor-div its exact-dup
    cluster size, in integer milli-tokens — so a cluster of n copies
    costs the budget one document's tokens no matter how many copies
    the mix admits. Same md5(seed||id) order, same cum<=budget rule."""
    key = f"md5('{seed}' || CAST(doc_id AS VARCHAR))"
    return f"""
WITH w AS (
  SELECT doc_id,
         count(*) OVER (PARTITION BY md5(text))::BIGINT AS cn,
         len({_TOKS})::BIGINT AS ntk
  FROM documents
),
counts AS (
  SELECT doc_id, ((1000 * ntk) // cn)::BIGINT AS n_tok FROM w
)
SELECT doc_id, source, n_tok, cum_tok FROM (
  SELECT doc_id, source, n_tok,
    CAST(sum(n_tok) OVER (
      PARTITION BY source ORDER BY {key}, doc_id
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
  FROM documents JOIN counts USING (doc_id)
)
WHERE cum_tok <= {budget_milli}
"""


def q_snapshot_drift() -> str:
    """snapshot_drift twin (operators/similarity.py): vec_id parity
    splits the embeddings into the two snapshots; per-(label, dim)
    conditional sums + counts, per-dim means divided BEFORE the
    group fold, cosine/L2 between the two centroids rounded at 5 —
    the same float->double + round-5 convention as the
    embedding_diversity twin."""
    return """
WITH e AS (
  SELECT label, (vec_id % 2 = 0) AS is_a, embedding::DOUBLE[] AS emb
  FROM embeddings
),
expl AS (
  SELECT label, is_a, unnest(emb) AS val,
         generate_subscripts(emb, 1) AS pos
  FROM e
),
dims AS (
  SELECT label, pos,
         sum(CASE WHEN is_a THEN val END) AS sa,
         sum(CASE WHEN NOT is_a THEN val END) AS sb,
         sum(CASE WHEN is_a THEN 1 ELSE 0 END)::BIGINT AS na,
         sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END)::BIGINT AS nb
  FROM expl GROUP BY label, pos
),
cent AS (
  SELECT label, max(na) AS n_a, max(nb) AS n_b,
         sum((sa / na) * (sb / nb)) AS dot,
         sum((sa / na) * (sa / na)) AS qa,
         sum((sb / nb) * (sb / nb)) AS qb,
         sum((sa / na - sb / nb) * (sa / na - sb / nb)) AS d2
  FROM dims GROUP BY label
)
SELECT label, n_a, n_b,
       round(dot / sqrt(qa * qb), 5) AS centroid_cosine,
       round(sqrt(d2), 5) AS centroid_l2
FROM cent WHERE n_a > 0 AND n_b > 0
"""


def q_nb_quality(
    pos_sources: tuple[str, ...] = ("src0", "src1", "src2"),
    min_df: int = 2,
) -> str:
    """nb_quality_classifier twin (operators/textstats.py): the same
    Laplace-smoothed multinomial NB with every log quantized to
    whole bits via length(bin(x)) — integer arithmetic end to end,
    so both engines produce identical scores. Weak labels here are
    CCNet's source-membership rule (wiki-vs-crawl analogue)."""
    srcs = ", ".join(_sql_str(s) for s in pos_sources)
    return f"""
WITH labeled AS (
  SELECT doc_id,
         CASE WHEN source IN ({srcs}) THEN 1 ELSE 0 END AS label,
         text
  FROM documents
),
toks AS (
  SELECT doc_id, label,
         unnest(list_filter({_TOKS}, x -> x != '')) AS tok
  FROM labeled
),
vocab AS (
  SELECT tok,
         sum(label)::BIGINT AS pos_c,
         (count(*) - sum(label))::BIGINT AS neg_c
  FROM toks GROUP BY 1 HAVING count(*) >= {min_df}
),
tot AS (
  SELECT sum(pos_c)::BIGINT AS pos_tot,
         sum(neg_c)::BIGINT AS neg_tot,
         count(*)::BIGINT AS v_size
  FROM vocab
),
model AS (
  SELECT tok,
         ((length(bin(pos_c + 1)) - length(bin(pos_tot + v_size)))
          - (length(bin(neg_c + 1)) - length(bin(neg_tot + v_size))
         ))::BIGINT AS llr_tok
  FROM vocab, tot
),
scored AS (
  SELECT t.doc_id,
         sum(m.llr_tok)::BIGINT AS llr_bits,
         count(*)::BIGINT AS n_vocab_tokens
  FROM toks t JOIN model m USING (tok) GROUP BY 1
),
prior AS (
  SELECT (length(bin(sum(label)::BIGINT))
          - length(bin((count(*) - sum(label))::BIGINT)))::BIGINT
         AS prior_bits
  FROM labeled
)
SELECT l.doc_id,
       l.label::BIGINT AS label,
       coalesce(s.n_vocab_tokens, 0)::BIGINT AS n_vocab_tokens,
       coalesce(s.llr_bits, 0)::BIGINT AS llr_bits,
       p.prior_bits,
       (coalesce(s.llr_bits, 0) + p.prior_bits)::BIGINT AS score_bits,
       (CASE WHEN coalesce(s.llr_bits, 0) + p.prior_bits > 0
             THEN 1 ELSE 0 END)::BIGINT AS predicted
FROM labeled l LEFT JOIN scored s USING (doc_id), prior p
"""


def q_corpus_diff() -> str:
    """corpus_diff twin (operators/snapshot.py): snapshot B derived
    from documents by the same deterministic rule as
    derive_snapshot_b (doc_id%11==3 removed, %7==2 suffixed ' v2',
    %13==5 re-added at doc_id+10M with a 'new ' prefix), diffed by
    md5 content-hash equality under a full outer join on doc_id."""
    return """
WITH b AS (
  SELECT doc_id,
    CASE WHEN doc_id % 7 = 2 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 11 <> 3
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id, 'new ' || text AS text
  FROM documents WHERE doc_id % 13 = 5
),
ha AS (SELECT doc_id, md5(text) AS h FROM documents),
hb AS (SELECT doc_id, md5(text) AS h FROM b)
SELECT COALESCE(ha.doc_id, hb.doc_id) AS doc_id,
  CASE WHEN ha.h IS NULL THEN 'added'
       WHEN hb.h IS NULL THEN 'removed'
       WHEN ha.h <> hb.h THEN 'changed'
       ELSE 'unchanged' END AS status
FROM ha FULL OUTER JOIN hb ON ha.doc_id = hb.doc_id
"""


def q_cdc_chunks(window: int = 8, divisor: int = 16) -> str:
    """cdc_chunk_stats twin (operators/dedup.py): identical
    content-defined boundary rule — cut after position i when
    h32(window ending at i) % divisor == 0, i in [window, n-1] —
    then chunk-hash document frequency and per-doc shared totals."""
    w = window
    h = _H32.format(x=f"substr(text, CAST(i AS INT) - {w - 1}, {w})")
    return f"""
WITH base AS (
  SELECT doc_id, text, length(text) AS n FROM documents
),
bounds AS (
  SELECT doc_id, text,
    list_concat(list_concat(
      [0::BIGINT],
      CASE WHEN n - 1 >= {w} THEN
        list_filter(range({w}::BIGINT, CAST(n AS BIGINT)),
                    i -> ({h}) % {divisor} = 0)
      ELSE []::BIGINT[] END),
      [CAST(n AS BIGINT)]) AS bs
  FROM base
),
chunks AS (
  SELECT doc_id, chunk FROM (
    SELECT doc_id,
      unnest(list_transform(range(1, len(bs)), j ->
        substr(text, CAST(bs[j] AS INT) + 1,
               CAST(bs[j + 1] - bs[j] AS INT)))) AS chunk
    FROM bounds)
  WHERE length(chunk) > 0
),
hashed AS (
  SELECT doc_id, md5(chunk) AS h, length(chunk) AS clen FROM chunks
),
freq AS (SELECT h, count(DISTINCT doc_id) AS nd FROM hashed GROUP BY h)
SELECT doc_id,
  CAST(count(*) AS BIGINT) AS n_chunks,
  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS shared_chunks,
  CAST(sum(CASE WHEN nd > 1 THEN clen ELSE 0 END) AS BIGINT)
    AS shared_chars
FROM hashed JOIN freq USING (h)
GROUP BY doc_id
"""


# attach_mess + NFC/whitespace normalization CTE pair, shared by
# q_normalize and the composed q_full_curation_v6
_NORMALIZE_CTES = """messy AS (
  SELECT doc_id,
    CASE CAST(doc_id % 4 AS INT)
      WHEN 0 THEN text || '  cafe' || chr(769) || chr(9) || 'ok'
      WHEN 1 THEN text || ' nin' || chr(771) || 'o'
                       || chr(13) || chr(10) || 'end'
      WHEN 2 THEN text || ' caf' || chr(233) || chr(160)
                       || 'done' || chr(8203)
      ELSE text END AS mtext
  FROM documents
),
normed AS (
  SELECT doc_id, mtext,
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(nfc_normalize(mtext),
                         '\\x{00a0}', ' ', 'g'),
          '[\\x{200b}\\x{200c}\\x{200d}\\x{feff}]', '', 'g'),
        '[\\t\\r\\n\\x0B\\x0C]', ' ', 'g'),
      '  +', ' ', 'g')) AS text_norm
  FROM messy
)"""


def q_normalize() -> str:
    """normalize_text twin (operators/textstats.py): same planted
    mess (attach_mess — decomposed accents, CRLF, NBSP, zero-width),
    then DuckDB nfc_normalize standing in for Python unicodedata NFC
    and the identical regexp chain (RE2 'g')."""
    return f"""
WITH {_NORMALIZE_CTES}
SELECT doc_id, text_norm,
  text_norm <> mtext AS changed,
  length(text_norm) AS n_chars_norm
FROM normed
"""


def q_epoch_plan(
    target_tokens: float,
    weights: dict[str, float],
    default_weight: float = 1.0,
    max_epochs: float = 4.0,
) -> str:
    """epoch_plan twin (operators/curation.py): per-source token
    sums, literal weight CASE chain, total-weight window over the
    tiny per-source table, same least/round arithmetic order."""
    wexpr = repr(float(default_weight))
    for src, wt in weights.items():
        wexpr = (
            f"CASE WHEN source = {_sql_str(src)} "
            f"THEN {float(wt)!r} ELSE {wexpr} END"
        )
    t = repr(float(target_tokens))
    me = repr(float(max_epochs))
    return f"""
WITH avail AS (
  SELECT source,
    CAST(sum(len({_TOKS})) AS BIGINT) AS available_tokens
  FROM documents GROUP BY source
),
w AS (
  SELECT source, available_tokens, {wexpr} AS weight FROM avail
),
t AS (SELECT *, sum(weight) OVER () AS total_w FROM w)
SELECT source, available_tokens, weight,
  round(least({me}, ({t} * weight / total_w) / available_tokens), 6)
    AS epochs,
  round(least({t} * weight / total_w, {me} * available_tokens), 6)
    AS planned_tokens
FROM t
"""


def q_vocab_stats() -> str:
    """vocab_stats twin (operators/textstats.py): per-source
    (grp, token) counts then one per-source rollup; milli ratios in
    exact integer floor division (// here, div on the Spark side —
    identical on the all-positive operands)."""
    return f"""
WITH vocab AS (
  SELECT source AS grp, tok, count(*)::BIGINT AS cnt FROM (
    SELECT source, unnest({_TOKS}) AS tok FROM documents)
  GROUP BY 1, 2
)
SELECT grp AS source,
  count(*)::BIGINT AS n_types,
  sum(cnt)::BIGINT AS n_tokens,
  sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax,
  ((count(*) * 1000) // sum(cnt)::BIGINT)::BIGINT AS ttr_milli,
  ((sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)::BIGINT * 1000)
    // count(*))::BIGINT AS hapax_milli
FROM vocab GROUP BY grp
"""


def q_bm25_topk(
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    q_mod: int = 101,
    q_rem: int = 7,
) -> str:
    """bm25_topk twin (operators/retrieval.py): whole-bit idf
    (length(bin(N)) - length(bin(df))), the identical pinned-order
    IEEE chain for the per-term score, floored to integer milli
    BEFORE the per-document sum so distributed float reassociation
    cannot move the total. Constants are pre-computed in Python and
    repr()-formatted so both engines parse the SAME doubles."""
    k1p1 = repr(float(k1) + 1.0)
    one_minus_b = repr(1.0 - float(b))
    bs = repr(float(b))
    k1s = repr(float(k1))
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2
),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
nd AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
dl AS (
  SELECT doc_id, len({_TOKS})::BIGINT AS dl FROM documents
),
tt AS (SELECT sum(dl)::BIGINT AS t_total FROM dl),
qt AS (
  SELECT doc_id AS qid, unnest(list_distinct({_TOKS})) AS term
  FROM documents WHERE doc_id % {q_mod} = {q_rem}
),
scored AS (
  SELECT q.qid, t.doc_id,
    CAST(floor(
      1000.0 * (length(bin(n.n_docs)) - length(bin(f.df)))
             * (t.tf * {k1p1})
      / (t.tf + {k1s} * ({one_minus_b}
                         + {bs} * (d.dl / (s.t_total / n.n_docs))))
    ) AS BIGINT) AS s
  FROM qt q
  JOIN tf t USING (term)
  JOIN df f ON t.term = f.term
  JOIN dl d ON t.doc_id = d.doc_id, nd n, tt s
  WHERE q.qid <> t.doc_id
),
agg AS (
  SELECT qid, doc_id, count(*)::BIGINT AS n_terms,
         sum(s)::BIGINT AS score_milli
  FROM scored GROUP BY 1, 2
)
SELECT qid, doc_id, n_terms, score_milli, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY qid ORDER BY score_milli DESC, doc_id) AS rank
  FROM agg)
WHERE rank <= {k}
"""


def q_winnow_pairs(
    overlap_milli: int = 400,
    k: int = 4,
    window: int = 4,
    df_cut: int = 128,
) -> str:
    """winnow_pairs twin (operators/dedup.py): identical k-gram h32
    hashes, identical rightmost-min frame fold (list_reduce over
    [j..j+w-1], whose first element is the init — matching Spark's
    aggregate with init j over [j+1..j+w-1]), df-cut candidate
    index, exact containment verify on the fingerprint SETS (order
    never matters downstream, only membership)."""
    w = window
    gram = "concat_ws(' ', " + ", ".join(
        f"toks[CAST(i AS INT) + {off}]" for off in range(k)
    ) + ")"
    h = _H32.format(x=gram)
    return f"""
WITH tk AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
kgt AS (
  SELECT doc_id,
    CASE WHEN len(toks) - {k - 1} >= 1 THEN
      list_transform(range(1::BIGINT, len(toks) - {k - 1} + 1), i -> {h})
    ELSE []::BIGINT[] END AS kg
  FROM tk
),
selt AS (
  SELECT doc_id, kg,
    CASE WHEN len(kg) >= {w} THEN
      list_transform(range(1::BIGINT, len(kg) - {w - 1} + 1),
        j -> list_reduce(range(j, j + {w}),
             (acc, p) -> CASE WHEN kg[CAST(p AS INT)]
                              <= kg[CAST(acc AS INT)]
                         THEN p ELSE acc END))
    WHEN len(kg) >= 1 THEN range(1::BIGINT, len(kg) + 1)
    ELSE []::BIGINT[] END AS sel
  FROM kgt
),
fps AS (
  SELECT doc_id,
    list_distinct(list_transform(list_distinct(sel),
                                 p -> kg[CAST(p AS INT)])) AS fps
  FROM selt
),
ex AS (
  SELECT doc_id, unnest(fps) AS fp FROM fps WHERE len(fps) > 0
),
rare AS (
  SELECT fp FROM (SELECT fp, count(*) AS dfc FROM ex GROUP BY 1)
  WHERE dfc <= {df_cut}
),
idx AS (SELECT e.doc_id, e.fp FROM ex e JOIN rare USING (fp)),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM idx a JOIN idx b USING (fp) WHERE a.doc_id < b.doc_id
),
verified AS (
  SELECT c.doc_a, c.doc_b,
    len(list_intersect(fa.fps, fb.fps))::BIGINT AS n_shared,
    len(fa.fps)::BIGINT AS na, len(fb.fps)::BIGINT AS nb
  FROM cand c
  JOIN fps fa ON c.doc_a = fa.doc_id
  JOIN fps fb ON c.doc_b = fb.doc_id
)
SELECT doc_a, doc_b, n_shared,
       (n_shared * 1000) // least(na, nb) AS overlap_milli
FROM verified
WHERE (n_shared * 1000) // least(na, nb) >= {overlap_milli}
"""


def q_full_curation_v6(
    budget: int = 600, min_words: int = 40, seed: str = "v6"
) -> str:
    """Composed v6 twin: the shared normalize CTEs, keep-first dedup
    on text_norm (same md5 window), the shared Gopher flag fragment
    over the surviving relation, then the per-source token budget in
    the identical (md5 seed, doc_id) admission order."""
    flags = _gopher_flags_sql(min_words=min_words, rel="surv")
    key = f"md5('{seed}' || CAST(doc_id AS VARCHAR))"
    return f"""
WITH {_NORMALIZE_CTES},
nd AS (
  SELECT n.doc_id, n.text_norm AS text, d.source
  FROM normed n JOIN documents d USING (doc_id)
),
surv AS (
  SELECT doc_id, text, source FROM (
    SELECT doc_id, text, source,
           row_number() OVER (PARTITION BY md5(text)
                              ORDER BY doc_id) AS rn
    FROM nd) WHERE rn = 1
),{flags},
sel AS (
  -- configured rule subset (no r_stopwords — the synthetic corpus
  -- has no English stopwords), mirroring the Spark composition
  SELECT s.doc_id, s.text, s.source
  FROM surv s JOIN flags f USING (doc_id)
  WHERE f.r_word_count * f.r_mean_word_len * f.r_symbol *
        f.r_bullet * f.r_ellipsis * f.r_alpha = 1
)
SELECT doc_id, source, n_tok, cum_tok FROM (
  SELECT doc_id, source,
    CAST(len({_TOKS}) AS BIGINT) AS n_tok,
    CAST(sum(CAST(len({_TOKS}) AS BIGINT)) OVER (
      PARTITION BY source ORDER BY {key}, doc_id
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
  FROM sel)
WHERE cum_tok <= {budget}
"""


def q_quantile_norm(n_buckets: int = 1000) -> str:
    """quantile_normalize twin (operators/curation.py) over the
    q_quality scores: identical (score, doc_id) rank order, exact
    integer bucket division, singleton groups at 0."""
    return f"""
WITH q AS ({q_quality()}),
j AS (
  SELECT d.doc_id, d.source, q.quality
  FROM documents d JOIN q USING (doc_id)
),
r AS (
  SELECT doc_id, source, quality,
    row_number() OVER (PARTITION BY source
                       ORDER BY quality, doc_id) AS rk,
    count(*) OVER (PARTITION BY source) AS n
  FROM j
)
SELECT doc_id, source, quality,
  CAST(CASE WHEN n > 1 THEN ((rk - 1) * {int(n_buckets)}) // (n - 1)
       ELSE 0 END AS BIGINT) AS q_milli
FROM r
"""


def q_cross_source_dup_matrix(
    threshold: float = 0.6, df_cut: int = 128
) -> str:
    """cross_source_dup_matrix twin (operators/dedup.py): the ngram-
    jaccard pair query verbatim as a CTE, each side joined to its
    source, least/greatest cell canonicalization."""
    return f"""
WITH pairs AS ({q_dedup_ngram_jaccard(threshold, df_cut)})
SELECT least(da.source, db.source) AS source_a,
       greatest(da.source, db.source) AS source_b,
       count(*)::BIGINT AS n_pairs
FROM pairs p
JOIN documents da ON da.doc_id = p.doc_a
JOIN documents db ON db.doc_id = p.doc_b
GROUP BY 1, 2
"""


def _morton_sql(rx: str, ry: str, bits: int) -> str:
    """The same static interleave expression zorder_key builds as a
    Catalyst tree, rendered as DuckDB bit arithmetic."""
    terms = []
    for i in range(bits):
        terms.append(f"((({rx} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ry} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def q_zorder_audit(
    x_col: str = "n_chars",
    bits: int = 8,
    bucket_bits: int = 6,
    probe: tuple = (150, 300, 100, 250),
) -> str:
    """zorder_layout_audit twin (operators/layout.py) over documents
    with x = n_chars, y = doc_id: identical global-min/max integer
    rescale, Morton interleave, top-bit bucket assignment for both
    layouts, min/max audit + probe-rectangle overlap flag."""
    top = (1 << bits) - 1
    x_lo, x_hi, y_lo, y_hi = (int(v) for v in probe)
    return f"""
WITH t AS (
  SELECT CAST({x_col} AS BIGINT) AS x, CAST(doc_id AS BIGINT) AS y
  FROM documents
),
b AS (
  SELECT min(x) mnx, max(x) mxx, min(y) mny, max(y) mxy FROM t
),
r AS (
  SELECT x, y,
    ((x - mnx) * {top}) // greatest(mxx - mnx, 1) AS rx,
    ((y - mny) * {top}) // greatest(mxy - mny, 1) AS ry
  FROM t, b
),
k AS (
  SELECT x, y, rx, ({_morton_sql('rx', 'ry', bits)}) AS z FROM r
),
layouts AS (
  SELECT 'zorder' AS layout, z >> {2 * bits - bucket_bits} AS bucket,
         x, y FROM k
  UNION ALL
  SELECT 'linear' AS layout, rx >> {bits - bucket_bits} AS bucket,
         x, y FROM k
)
SELECT layout, CAST(bucket AS BIGINT) AS bucket,
  count(*)::BIGINT AS n_rows,
  min(x) AS min_x, max(x) AS max_x,
  min(y) AS min_y, max(y) AS max_y,
  (min(x) <= {x_hi} AND max(x) >= {x_lo}
   AND min(y) <= {y_hi} AND max(y) >= {y_lo}) AS overlaps_probe
FROM layouts GROUP BY 1, 2
"""


def q_event_funnel(steps: tuple = ("view", "click", "purchase")) -> str:
    """event_funnel twin (operators/aggregate.py): sequential
    first-occurrence CTE chain over the events view, union of step
    counts, lag window for the conversion ratio."""
    ctes = [
        f"s0 AS (SELECT user_id, min(ts) AS t FROM events "
        f"WHERE event_type = '{steps[0]}' GROUP BY user_id)"
    ]
    for i, s in enumerate(steps[1:], start=1):
        ctes.append(
            f"s{i} AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
            f"JOIN s{i - 1} p USING (user_id) "
            f"WHERE e.event_type = '{s}' AND e.ts >= p.t "
            f"GROUP BY e.user_id)"
        )
    unions = "\nUNION ALL\n".join(
        f"SELECT {i + 1} AS step, '{s}' AS step_name, "
        f"count(*)::BIGINT AS n_users FROM s{i}"
        for i, s in enumerate(steps)
    )
    return f"""
WITH {', '.join(ctes)},
cnt AS ({unions})
SELECT step, step_name, n_users,
  CASE WHEN lag(n_users) OVER (ORDER BY step) IS NOT NULL
       THEN (n_users * 1000) // lag(n_users) OVER (ORDER BY step)
  END::BIGINT AS conv_milli
FROM cnt
"""


def q_k_anon_audit(
    k: int = 5, bucket_width: int = 100
) -> str:
    """k_anonymity_audit twin (operators/curation.py) over the
    (source, lang, n_chars-bucket) quasi-identifier tuple."""
    return f"""
SELECT source, lang,
  (n_chars // {int(bucket_width)})::BIGINT AS len_bucket,
  count(*)::BIGINT AS n_docs,
  (count(*) < {int(k)}) AS at_risk
FROM documents GROUP BY 1, 2, 3
"""


def q_full_curation_v7(
    budget_milli: int = 200_000,
    cut_milli: int = 800,
    seed: str = "v7",
    n_buckets: int = 1000,
) -> str:
    """Composed v7 twin: the quality CTE, the per-source quantile
    rank gate (identical (score, doc_id) order and exact bucket
    division as q_quantile_norm), exact-cluster soft token masses
    over the SURVIVORS, and the per-source budget admission in the
    same (md5 seed, doc_id) order."""
    key = f"md5('{seed}' || CAST(doc_id AS VARCHAR))"
    return f"""
WITH q AS ({q_quality()}),
j AS (
  SELECT d.doc_id, d.source, d.text, q.quality
  FROM documents d JOIN q USING (doc_id)
),
r AS (
  SELECT doc_id, source, text,
    row_number() OVER (PARTITION BY source
                       ORDER BY quality, doc_id) AS rk,
    count(*) OVER (PARTITION BY source) AS n
  FROM j
),
kept AS (
  SELECT doc_id, source, text FROM r
  WHERE (CASE WHEN n > 1
         THEN ((rk - 1) * {int(n_buckets)}) // (n - 1)
         ELSE 0 END) >= {int(cut_milli)}
),
w AS (
  SELECT doc_id,
         count(*) OVER (PARTITION BY md5(text))::BIGINT AS cn,
         len({_TOKS})::BIGINT AS ntk
  FROM kept
),
counts AS (
  SELECT doc_id, ((1000 * ntk) // cn)::BIGINT AS n_tok FROM w
)
SELECT doc_id, source, n_tok, cum_tok FROM (
  SELECT k2.doc_id, k2.source, c.n_tok,
    CAST(sum(c.n_tok) OVER (
      PARTITION BY k2.source ORDER BY {key}, k2.doc_id
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
  FROM kept k2 JOIN counts c USING (doc_id))
WHERE cum_tok <= {int(budget_milli)}
"""


def q_dedup_threshold_curve(
    cutoffs: tuple = (4, 8, 12, 16), bucket_cap: int | None = 64
) -> str:
    """dedup_threshold_curve twin (operators/dedup.py): the minhash
    estimate query verbatim as a CTE, each pair exploded onto the
    cutoffs it clears, two cutoff-keyed rollups."""
    lo = min(cutoffs) / 16
    lst = ", ".join(str(int(c)) for c in sorted(cutoffs))
    return f"""
WITH pairs AS ({q_dedup_minhash_estimate(lo, bucket_cap)}),
cl AS (
  SELECT t.c AS cutoff_sixteenths, doc_a, doc_b
  FROM pairs, unnest([{lst}]) AS t(c)
  WHERE t.c <= n_equal
),
np AS (
  SELECT cutoff_sixteenths, count(*)::BIGINT AS n_pairs
  FROM cl GROUP BY 1
),
nd AS (
  SELECT cutoff_sixteenths, count(DISTINCT d)::BIGINT AS n_docs
  FROM (SELECT cutoff_sixteenths, unnest([doc_a, doc_b]) AS d FROM cl)
  GROUP BY 1
)
SELECT np.cutoff_sixteenths::BIGINT AS cutoff_sixteenths,
       n_pairs, n_docs
FROM np JOIN nd USING (cutoff_sixteenths)
"""


def q_hashed_features(dim: int = 64) -> str:
    """hashed_features twin (operators/textstats.py): identical
    md5-prefix bucket and independent sign-bit hash over the shared
    whitespace tokenization."""
    b = _H32.format(x="t")
    s = _H32.format(x="'s|' || t")
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS}) AS t FROM documents
)
SELECT doc_id,
  ({b} % {int(dim)})::BIGINT AS bucket,
  sum(1 - 2 * ({s} % 2))::BIGINT AS weight
FROM tok WHERE t <> ''
GROUP BY 1, 2
"""


def q_apply_cdc() -> str:
    """apply_cdc twin (operators/snapshot.py): the same deterministic
    change set in SQL, last-writer-wins by seq, anti-join + union."""
    return """
WITH ch AS (
  SELECT doc_id, 'U' AS op, 1 AS seq, upper(text) AS text,
         lang, source, n_chars
  FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id, 'U', 2, text || ' final', lang, source, n_chars
  FROM documents WHERE doc_id % 7 = 0 AND doc_id % 2 = 0
  UNION ALL
  SELECT doc_id, 'D', 3, text, lang, source, n_chars
  FROM documents WHERE doc_id % 11 = 3
  UNION ALL
  SELECT doc_id + 1000000, 'I', 1, text || ' v2',
         lang, source, n_chars
  FROM documents WHERE doc_id % 13 = 5
),
last AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
                                 ORDER BY seq DESC) AS rn
    FROM ch) WHERE rn = 1
),
kept AS (
  SELECT d.doc_id, d.source, d.text FROM documents d
  ANTI JOIN last l ON d.doc_id = l.doc_id
)
SELECT doc_id, source, text FROM kept
UNION ALL
SELECT doc_id, source, text FROM last WHERE op <> 'D'
"""


def q_dq_audit(max_chars: int = 1_000_000) -> str:
    """dq_audit twin (operators/dq.py): the same five constraints as
    conditional aggregates over ONE documents scan, exploded to a
    row per constraint. Null check inputs count as violations
    (coalesce(cond, TRUE)) in both engines."""
    langs = "'en', 'de', 'es', 'zh'"
    return f"""
WITH a AS (
  SELECT count(*)::BIGINT AS n_rows,
    sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END)::BIGINT AS v_text,
    sum(CASE WHEN coalesce(NOT lang IN ({langs}), TRUE)
        THEN 1 ELSE 0 END)::BIGINT AS v_lang,
    sum(CASE WHEN coalesce(n_chars < 1 OR n_chars > {int(max_chars)},
        TRUE) THEN 1 ELSE 0 END)::BIGINT AS v_range,
    sum(CASE WHEN coalesce(n_chars <> length(text), TRUE)
        THEN 1 ELSE 0 END)::BIGINT AS v_cons,
    count(DISTINCT doc_id)::BIGINT AS n_distinct
  FROM documents
)
SELECT 'not_null:text' AS check_name, v_text AS n_violations,
       n_rows, v_text = 0 AS passed FROM a
UNION ALL
SELECT 'accepted:lang', v_lang, n_rows, v_lang = 0 FROM a
UNION ALL
SELECT 'range:n_chars', v_range, n_rows, v_range = 0 FROM a
UNION ALL
SELECT 'consistent:n_chars', v_cons, n_rows, v_cons = 0 FROM a
UNION ALL
SELECT 'unique:doc_id', n_rows - n_distinct, n_rows,
       n_rows - n_distinct = 0 FROM a
"""


def q_snapshot_asof(as_of_seq: int = 2) -> str:
    """snapshot_asof twin (operators/snapshot.py): the q_apply_cdc
    change set replayed only through seq <= as_of_seq — time-travel
    by CDC-prefix replay."""
    return f"""
WITH ch AS (
  SELECT doc_id, 'U' AS op, 1 AS seq, upper(text) AS text,
         lang, source, n_chars
  FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id, 'U', 2, text || ' final', lang, source, n_chars
  FROM documents WHERE doc_id % 7 = 0 AND doc_id % 2 = 0
  UNION ALL
  SELECT doc_id, 'D', 3, text, lang, source, n_chars
  FROM documents WHERE doc_id % 11 = 3
  UNION ALL
  SELECT doc_id + 1000000, 'I', 1, text || ' v2',
         lang, source, n_chars
  FROM documents WHERE doc_id % 13 = 5
),
pre AS (SELECT * FROM ch WHERE seq <= {int(as_of_seq)}),
last AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
                                 ORDER BY seq DESC) AS rn
    FROM pre) WHERE rn = 1
),
kept AS (
  SELECT d.doc_id, d.source, d.text FROM documents d
  ANTI JOIN last l ON d.doc_id = l.doc_id
)
SELECT doc_id, source, text FROM kept
UNION ALL
SELECT doc_id, source, text FROM last WHERE op <> 'D'
"""


def q_compaction_plan(target_bytes: int = 4096) -> str:
    """compaction_plan + compaction_summary twin
    (operators/snapshot.py): running-sum binning of the file
    manifest, per-bin rollup."""
    return f"""
WITH plan AS (
  SELECT source AS part, doc_id AS file_id, n_chars AS bytes,
    (coalesce(sum(n_chars) OVER (
        PARTITION BY source ORDER BY doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      0) // {int(target_bytes)})::BIGINT AS bin_idx
  FROM documents
)
SELECT part, bin_idx, count(*)::BIGINT AS n_files,
       sum(bytes)::BIGINT AS out_bytes
FROM plan GROUP BY 1, 2
"""


def q_column_profile() -> str:
    """column_profile twin (operators/dq.py): the same per-column
    statistics as one aggregate CTE, a UNION ALL row per column,
    min/max serialized to VARCHAR for the uniform schema."""
    cols = ["doc_id", "lang", "source", "n_chars"]
    aggs = ", ".join(
        f"sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)::BIGINT "
        f"AS nn_{c}, count(DISTINCT {c})::BIGINT AS nd_{c}, "
        f"min({c})::VARCHAR AS mn_{c}, max({c})::VARCHAR AS mx_{c}"
        for c in cols
    )
    rows = " UNION ALL ".join(
        f"SELECT '{c}' AS column, n_rows, nn_{c} AS n_nulls, "
        f"nd_{c} AS n_distinct, mn_{c} AS min_value, "
        f"mx_{c} AS max_value FROM a"
        for c in cols
    )
    return (
        f"WITH a AS (SELECT count(*)::BIGINT AS n_rows, {aggs} "
        f"FROM documents) {rows}"
    )


def q_merge_stats_refresh() -> str:
    """Composed twin: the q_apply_cdc merged snapshot (full payload)
    feeding the q_column_profile statistics — write then ANALYZE."""
    cols = ["doc_id", "lang", "source", "n_chars"]
    aggs = ", ".join(
        f"sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)::BIGINT "
        f"AS nn_{c}, count(DISTINCT {c})::BIGINT AS nd_{c}, "
        f"min({c})::VARCHAR AS mn_{c}, max({c})::VARCHAR AS mx_{c}"
        for c in cols
    )
    rows = " UNION ALL ".join(
        f"SELECT '{c}' AS column, n_rows, nn_{c} AS n_nulls, "
        f"nd_{c} AS n_distinct, mn_{c} AS min_value, "
        f"mx_{c} AS max_value FROM a"
        for c in cols
    )
    return f"""
WITH ch AS (
  SELECT doc_id, 'U' AS op, 1 AS seq, upper(text) AS text,
         lang, source, n_chars
  FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id, 'U', 2, text || ' final', lang, source, n_chars
  FROM documents WHERE doc_id % 7 = 0 AND doc_id % 2 = 0
  UNION ALL
  SELECT doc_id, 'D', 3, text, lang, source, n_chars
  FROM documents WHERE doc_id % 11 = 3
  UNION ALL
  SELECT doc_id + 1000000, 'I', 1, text || ' v2',
         lang, source, n_chars
  FROM documents WHERE doc_id % 13 = 5
),
last AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
                                 ORDER BY seq DESC) AS rn
    FROM ch) WHERE rn = 1
),
merged AS (
  SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
  FROM documents d ANTI JOIN last l ON d.doc_id = l.doc_id
  UNION ALL
  SELECT doc_id, text, lang, source, n_chars
  FROM last WHERE op <> 'D'
),
a AS (SELECT count(*)::BIGINT AS n_rows, {aggs} FROM merged)
{rows}
"""


def q_html_clean() -> str:
    """html_clean twin (functions/html.py): the same wrap -> strip ->
    decode -> collapse chain in DuckDB (RE2 via 'gis' options where
    Spark uses inline (?is); no backreferences used so both engines
    accept every pattern; &amp; decoded last in both)."""
    return r"""
WITH wrapped AS (
  SELECT doc_id,
    '<html><head><style>p{margin:0}</style></head><body><h1>Doc '
    || doc_id || '</h1>' || chr(10) || '<p>' || text
    || ' &amp; more &lt;tail&gt;&nbsp;end</p>'
    || '<script>var x = 1 < 2;</script></body></html>' AS html
  FROM documents
),
stripped AS (
  SELECT doc_id,
    regexp_replace(
      regexp_replace(
        regexp_replace(html, '<script[^>]*>.*?</script>', ' ', 'gis'),
        '<style[^>]*>.*?</style>', ' ', 'gis'),
      '<[^>]+>', ' ', 'g') AS t
  FROM wrapped
),
decoded AS (
  SELECT doc_id,
    replace(replace(replace(replace(replace(replace(
      t, '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
      '&quot;', '"'), '&#39;', ''''), '&amp;', '&') AS t
  FROM stripped
)
SELECT doc_id,
  trim(regexp_replace(t, '\s+', ' ', 'g')) AS clean_text,
  length(trim(regexp_replace(t, '\s+', ' ', 'g')))::BIGINT
    AS n_chars_clean
FROM decoded
"""


def q_stream_cdc_merge() -> str:
    """run_cdc_merge twin (streaming/cdc_merge.py): because the gate
    routes every key's ops into one micro-batch, the sequential
    bucket-rewrite merge equals this GLOBAL last-writer merge."""
    return """
WITH ch AS (
  SELECT doc_id, 'U' AS op, 1 AS seq, upper(text) AS text
  FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id, 'U', 2, text || ' final'
  FROM documents WHERE doc_id % 7 = 0 AND doc_id % 2 = 0
  UNION ALL
  SELECT doc_id, 'D', 3, text
  FROM documents WHERE doc_id % 11 = 3
  UNION ALL
  SELECT doc_id + 1000000, 'I', 1, text || ' v2'
  FROM documents WHERE doc_id % 13 = 5
),
last AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
                                 ORDER BY seq DESC) AS rn
    FROM ch) WHERE rn = 1
),
kept AS (
  SELECT d.doc_id, d.text FROM documents d
  ANTI JOIN last l ON d.doc_id = l.doc_id
)
SELECT doc_id, text FROM kept
UNION ALL
SELECT doc_id, text FROM last WHERE op <> 'D'
"""


def q_stratified_split(
    val_pct: int = 10, test_pct: int = 10, seed: str = "split1"
) -> str:
    """stratified_split twin (operators/curation.py): identical
    md5(seed || id) pseudo-random rank within each source, identical
    integer cut-offs — exact per-stratum proportions, not expected
    ones."""
    key = f"md5({_sql_str(seed)} || CAST(doc_id AS VARCHAR))"
    return f"""
WITH r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY {key}, doc_id) AS rk,
         count(*) OVER (PARTITION BY source) AS n
  FROM documents
)
SELECT doc_id, source,
       CASE WHEN rk <= (n * {int(test_pct)}) // 100 THEN 'test'
            WHEN rk <= (n * {int(test_pct)}) // 100
                       + (n * {int(val_pct)}) // 100 THEN 'val'
            ELSE 'train' END AS split
FROM r
"""


def q_length_batches(batch_size: int = 8) -> str:
    """length_batches twin (operators/curation.py): same
    length-DESC/id rank, same (rank-1)//batch_size chunking, same
    exact-integer padding-waste share."""
    return f"""
WITH t AS (
  SELECT doc_id, source, len({_TOKS})::BIGINT AS tok
  FROM documents
),
r AS (
  SELECT source, tok,
         row_number() OVER (PARTITION BY source
                            ORDER BY tok DESC, doc_id) AS rk
  FROM t
),
b AS (
  SELECT source, ((rk - 1) // {int(batch_size)})::BIGINT AS batch_id,
         tok
  FROM r
)
SELECT source, batch_id, count(*)::BIGINT AS n_docs,
       max(tok)::BIGINT AS max_tokens, min(tok)::BIGINT AS min_tokens,
       sum(tok)::BIGINT AS sum_tokens,
       (((count(*) * max(tok) - sum(tok)) * 1000)
        // (count(*) * max(tok)))::BIGINT AS pad_waste_milli
FROM b GROUP BY 1, 2
"""


def q_skipgram_pairs(window: int = 3, min_count: int = 2) -> str:
    """skipgram_pairs twin (operators/textstats.py): positions via
    unnest WITH ORDINALITY semantics (generate_subscripts), the same
    forward window join, directed pairs, min_count HAVING."""
    return f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
),
p AS (
  SELECT doc_id, unnest(toks) AS tok,
         generate_subscripts(toks, 1) AS i
  FROM t
)
SELECT a.tok AS tok_a, b.tok AS tok_b, count(*)::BIGINT AS n
FROM p a JOIN p b
  ON a.doc_id = b.doc_id
 AND b.i > a.i AND b.i <= a.i + {int(window)}
GROUP BY 1, 2 HAVING count(*) >= {int(min_count)}
"""


def q_inverted_index(min_df: int = 1, max_df: int = 64) -> str:
    """inverted_index twin (operators/retrieval.py): per-(term, doc)
    position list via string_agg ORDER BY i, postings via string_agg
    ORDER BY doc_id, df band on the term table."""
    return f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
),
p AS (
  SELECT doc_id, unnest(toks) AS term,
         generate_subscripts(toks, 1) AS i
  FROM t
),
td AS (
  SELECT term, doc_id,
         string_agg(CAST(i AS VARCHAR), ',' ORDER BY i) AS plist,
         count(*)::BIGINT AS n_occ
  FROM p GROUP BY 1, 2
),
d AS (
  SELECT term, count(*)::BIGINT AS df,
         sum(n_occ)::BIGINT AS n_occurrences
  FROM td GROUP BY 1
)
SELECT td.term, d.df, d.n_occurrences,
       string_agg(CAST(td.doc_id AS VARCHAR) || ':' || td.plist,
                  '|' ORDER BY td.doc_id) AS postings
FROM td JOIN d USING (term)
WHERE d.df BETWEEN {int(min_df)} AND {int(max_df)}
GROUP BY 1, 2, 3
"""


def q_count_cosine_pairs(
    threshold_milli: int = 800, df_cut: int = 128, ngram: int = 4
) -> str:
    """count_cosine_pairs twin (operators/dedup.py) over the dedup
    corpus: positional n-gram counts keyed by the 60-bit integer
    md5 prefix (the operator's round-5 key — same value both
    engines, h32/LSH precedent; multiplicity kept), the same df-cut
    candidate gate, and the same SQUARED integer threshold test in
    HUGEINT (int128 == Spark's decimal(38,0) at these
    magnitudes)."""
    grams = (
        "CASE WHEN len({t}) >= {n} THEN "
        "list_transform(range(1, len({t}) - {nm2}), i -> "
        "CAST(('0x' || substr(md5(array_to_string("
        "list_slice({t}, i, i + {nm1}), ' ')), 1, 15)) AS BIGINT)) "
        "ELSE []::BIGINT[] END"
    ).format(t=_TOKS, n=int(ngram), nm1=int(ngram) - 1,
             nm2=int(ngram) - 2)
    t2 = int(threshold_milli) ** 2
    return f"""
WITH corpus AS ({CORPUS_SQL}),
g AS (
  SELECT doc_id, unnest({grams}) AS term FROM corpus
),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM g GROUP BY 1, 2
),
norms AS (
  SELECT doc_id, sum(tf * tf)::BIGINT AS n2 FROM tf GROUP BY 1
),
rare AS (
  SELECT term FROM (
    SELECT term, count(*) AS df FROM tf GROUP BY 1
  ) WHERE df <= {int(df_cut)}
),
idx AS (
  SELECT * FROM tf WHERE term IN (SELECT term FROM rare)
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         sum(a.tf * b.tf)::BIGINT AS dot
  FROM idx a JOIN idx b
    ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, dot, na.n2 AS norm_a2, nb.n2 AS norm_b2
FROM pairs
JOIN norms na ON na.doc_id = doc_a
JOIN norms nb ON nb.doc_id = doc_b
WHERE CAST(1000000 AS HUGEINT) * dot * dot
      >= CAST({t2} AS HUGEINT) * na.n2 * nb.n2
"""


def q_collocations(window: int = 3, min_count: int = 5) -> str:
    """collocations twin (operators/textstats.py): the skipgram pair
    CTE + unigram marginals + the same exact integral lift in
    HUGEINT — both engines truncate toward zero, no float
    anywhere."""
    return f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
),
p AS (
  SELECT doc_id, unnest(toks) AS tok,
         generate_subscripts(toks, 1) AS i
  FROM t
),
pairs AS (
  SELECT a.tok AS tok_a, b.tok AS tok_b, count(*)::BIGINT AS n_ab
  FROM p a JOIN p b
    ON a.doc_id = b.doc_id
   AND b.i > a.i AND b.i <= a.i + {int(window)}
  GROUP BY 1, 2 HAVING count(*) >= {int(min_count)}
),
uni AS (
  SELECT tok, count(*)::BIGINT AS n_tok FROM p GROUP BY 1
),
tot AS (SELECT sum(n_tok)::BIGINT AS nt FROM uni),
ptot AS (SELECT sum(n_ab)::BIGINT AS np FROM pairs)
SELECT tok_a, tok_b, n_ab,
       ua.n_tok AS n_a, ub.n_tok AS n_b,
       CAST((CAST(1000 AS HUGEINT) * n_ab * nt * nt)
            // (CAST(np AS HUGEINT) * ua.n_tok * ub.n_tok)
            AS BIGINT) AS lift_milli
FROM pairs
JOIN uni ua ON ua.tok = tok_a
JOIN uni ub ON ub.tok = tok_b, tot, ptot
"""


def q_mm_ahash_pairs(max_hamming: int = 7) -> str:
    """image_ahash + ahash_near_dup_pairs twin (operators/
    multimodal.py): reconstructs the BMP pixel stream from the
    cycled text bytes (the same derivation MM_IMAGE_ORACLE uses),
    computes the identical all-integer aHash — gray = byte-triple
    div 3, 64 linear cells, bit k iff s_k*N > S*n_k, bits packed
    via four 16-bit words into HUGEINT then two's-complemented to
    BIGINT — and compares ALL pairs (banding is total-recall at
    max_hamming <= n_bands - 1, so the pair sets are identical)."""
    return f"""
WITH imgs AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + 3000000, text FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + 6000000,
         substr(text, 1, length(text) - 1) || 'x'
  FROM documents WHERE doc_id % 3 = 0
),
g AS (
  SELECT doc_id, text, length(text) AS L,
         4 * (1 + length(text) % 16) AS w,
         1 + (length(text) * 31) % 16 AS h
  FROM imgs
),
px AS (
  SELECT doc_id, text, L, w * h AS n_pix,
         unnest(range(0, w * h)) AS p
  FROM g
),
gr AS (
  SELECT doc_id, n_pix, p,
         (ascii(substr(text, ((3 * p) % L) + 1, 1))
          + ascii(substr(text, ((3 * p + 1) % L) + 1, 1))
          + ascii(substr(text, ((3 * p + 2) % L) + 1, 1))) // 3
           AS gray
  FROM px
),
cs AS (
  SELECT doc_id, n_pix, (p * 64) // n_pix AS k,
         sum(gray)::BIGINT AS s_k, count(*)::BIGINT AS n_k
  FROM gr GROUP BY 1, 2, 3
),
tot AS (
  SELECT doc_id, sum(s_k)::BIGINT AS s, sum(n_k)::BIGINT AS n
  FROM cs GROUP BY 1
),
words AS (
  SELECT cs.doc_id,
         cs.k // 16 AS wi,
         sum(CASE WHEN cs.s_k * t.n > t.s * cs.n_k
              THEN 1 << (cs.k % 16) ELSE 0 END)::BIGINT AS wv
  FROM cs JOIN tot t ON t.doc_id = cs.doc_id
  GROUP BY 1, 2
),
hu AS (
  SELECT doc_id,
         sum(CAST(wv AS HUGEINT) * (CASE wi
              WHEN 0 THEN CAST(1 AS HUGEINT)
              WHEN 1 THEN CAST(65536 AS HUGEINT)
              WHEN 2 THEN CAST(4294967296 AS HUGEINT)
              ELSE CAST(281474976710656 AS HUGEINT) END)) AS u
  FROM words GROUP BY 1
),
hv AS (
  SELECT doc_id,
         CAST(CASE WHEN u >= CAST(9223372036854775808 AS HUGEINT)
              THEN u - CAST(18446744073709551616 AS HUGEINT)
              ELSE u END AS BIGINT) AS ahash
  FROM hu
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.ahash, b.ahash))::INT AS hamming
FROM hv a JOIN hv b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.ahash, b.ahash)) <= {int(max_hamming)}
"""


def q_phrase_merge(
    min_count: int = 5, lift_cut: int = 1450
) -> str:
    """phrase_merge twin (operators/textstats.py): the adjacent-pair
    collocation query as the phrase table (window=1, lift cut), then
    the SAME greedy-as-islands rewrite — running matched count ->
    island key, run-head min, offset parity for starts, lag(start)
    for consumption, string_agg ORDER BY i rebuild."""
    return f"""
WITH colls AS ({q_collocations(window=1, min_count=min_count)}),
ph AS (
  SELECT DISTINCT tok_a, tok_b FROM colls
  WHERE lift_milli >= {int(lift_cut)}
),
t AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
),
p AS (
  SELECT doc_id, unnest(toks) AS tok,
         generate_subscripts(toks, 1) AS i
  FROM t
),
cand AS (
  SELECT doc_id, i, tok,
         lead(tok) OVER (PARTITION BY doc_id ORDER BY i) AS nxt
  FROM p
),
mk AS (
  SELECT c.doc_id, c.i, c.tok, c.nxt,
         (ph.tok_a IS NOT NULL) AS matched
  FROM cand c
  LEFT JOIN ph ON ph.tok_a = c.tok AND ph.tok_b = c.nxt
),
isl AS (
  SELECT *, i - sum(CASE WHEN matched THEN 1 ELSE 0 END) OVER (
           PARTITION BY doc_id ORDER BY i
           ROWS UNBOUNDED PRECEDING) AS island
  FROM mk
),
st AS (
  SELECT *, matched AND ((i - min(CASE WHEN matched THEN i END)
           OVER (PARTITION BY doc_id, matched, island)) % 2 = 0)
           AS strt
  FROM isl
),
fin AS (
  SELECT *, coalesce(lag(strt) OVER (
           PARTITION BY doc_id ORDER BY i), false) AS ps
  FROM st
),
ot AS (
  SELECT doc_id, i, strt,
         CASE WHEN strt THEN tok || '_' || nxt
              WHEN NOT ps THEN tok END AS t
  FROM fin
)
SELECT doc_id, string_agg(t, ' ' ORDER BY i) AS text,
       sum(CASE WHEN strt THEN 1 ELSE 0 END)::BIGINT AS n_phrases
FROM ot WHERE t IS NOT NULL GROUP BY 1
"""


def q_rrf_fusion(
    k: int = 10, k0: int = 60, q_mod: int = 101, q_rem: int = 7
) -> str:
    """rrf_fuse twin (operators/retrieval.py): the bm25 oracle and
    an inline brute-force ANN ranking over the SAME query id set
    (doc_id/vec_id % q_mod == q_rem), fused by the exact integer
    1000000 // (k0 + rank) rule and re-ranked (rrf DESC, doc_id)."""
    return f"""
WITH bm AS ({q_bm25_topk(k=k, q_mod=q_mod, q_rem=q_rem)}),
e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
q AS (
  SELECT vec_id AS query_id, emb AS q_emb FROM e
  WHERE vec_id % {q_mod} = {q_rem}
),
ann_scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round(list_dot_product(q.q_emb, e.emb) /
               (sqrt(list_dot_product(q.q_emb, q.q_emb)) *
                sqrt(list_dot_product(e.emb, e.emb))), 5) AS cosine
  FROM e, q WHERE e.vec_id != q.query_id
),
ann AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id)
           AS rank
  FROM ann_scored
  QUALIFY rank <= {k}
),
u AS (
  SELECT qid, doc_id, rank FROM bm
  UNION ALL
  SELECT query_id AS qid, neighbor_id AS doc_id, rank FROM ann
),
s AS (
  SELECT qid, doc_id,
         sum(1000000 // ({k0} + rank))::BIGINT AS rrf_micro,
         count(*)::BIGINT AS n_systems
  FROM u GROUP BY 1, 2
)
SELECT qid, doc_id, rrf_micro, n_systems,
       CAST(row_number() OVER (PARTITION BY qid
            ORDER BY rrf_micro DESC, doc_id) AS INT) AS rank
FROM s
QUALIFY rank <= {k}
"""


def q_symspell_pairs(max_dist: int = 1, key_len: int = 24) -> str:
    """symspell_pairs twin (operators/linkage.py) — DELIBERATELY a
    different algorithm: brute-force all-pairs Levenshtein with only
    a length-band prefilter (|len(a)-len(b)| <= d is a necessary
    condition for distance <= d). The operator blocks through the
    delete-neighborhood equi-join; the oracle proves its TOTAL
    recall by comparing against the exhaustive scan, which is
    exactly the check hash blocking needs."""
    return f"""
WITH k AS (
  SELECT doc_id,
         substr(trim(regexp_replace(regexp_replace(
                lower(substr(text, 1, 4 * {key_len})),
                '[^a-z0-9 ]', '', 'g'), '  +', ' ', 'g')),
                1, {key_len}) AS key
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.key, b.key) AS INT) AS dist
FROM k a JOIN k b ON a.doc_id < b.doc_id
WHERE abs(length(a.key) - length(b.key)) <= {max_dist}
  AND levenshtein(a.key, b.key) <= {max_dist}
"""


def q_reliability_isotonic(n_bins: int = 8) -> str:
    """reliability_isotonic twin (operators/calibrate.py): the NB
    quality oracle feeds the SAME equal-width integer binning, then
    isotonic regression by its exact minimax closed form
    iso(i) = max_{a<=i} min_{b>=i} pooled_rate(a, b) over the bin
    table — pooled rates floored to integer micro units BEFORE the
    lattice, so every comparison is exact int64 in both engines
    (floor commutes with min/max: monotone integer-valued map)."""
    return f"""
WITH scored AS ({q_nb_quality()}),
base AS (SELECT score_bits AS s, label AS y FROM scored),
span AS (SELECT min(s) AS mn, max(s) AS mx FROM base),
binned AS (
  SELECT ((s - mn) * {n_bins}) // (mx - mn + 1) AS bin, y, mn, mx
  FROM base, span
),
bins AS (
  SELECT bin,
         mn + (bin * (mx - mn + 1) + {n_bins} - 1) // {n_bins} AS score_lo,
         count(*) AS n, sum(y) AS pos
  FROM binned GROUP BY bin, mn, mx
),
cum AS (
  SELECT bin, score_lo, n, pos,
         sum(n) OVER (ORDER BY bin) AS cn,
         sum(pos) OVER (ORDER BY bin) AS cpos
  FROM bins
),
pooled AS (
  SELECT a.bin AS pa, b.bin AS pb,
         (1000000 * (b.cpos - (a.cpos - a.pos)))
           // (b.cn - (a.cn - a.n)) AS rate_ab
  FROM cum a JOIN cum b ON a.bin <= b.bin
),
mm AS (
  SELECT i.bin AS i, p.pa, min(p.rate_ab) AS m
  FROM cum i JOIN pooled p ON p.pa <= i.bin AND p.pb >= i.bin
  GROUP BY 1, 2
),
iso AS (SELECT i, max(m) AS iso_micro FROM mm GROUP BY 1)
SELECT CAST(c.bin AS BIGINT) AS bin,
       CAST(c.score_lo AS BIGINT) AS score_lo,
       CAST(c.n AS BIGINT) AS n,
       CAST(c.pos AS BIGINT) AS pos,
       CAST((1000000 * c.pos) // c.n AS BIGINT) AS rate_micro,
       CAST(iso.iso_micro AS BIGINT) AS iso_micro
FROM cum c JOIN iso ON iso.i = c.bin
"""


def q_scene_cuts(threshold_milli: int = 4000) -> str:
    """scene_cuts twin (operators/multimodal.py): recomputes every
    frame's Y-plane mean straight from the cycled-text pixel stream
    the synthesiser embeds (geometry = _y4m_geometry), then the same
    integer milli luma, lag delta and threshold flag. Frame 0 keeps
    a NULL delta and is_cut = false."""
    return f"""
WITH v AS (
  SELECT doc_id, text, length(text) AS L,
         2 * (2 + length(text) % 8) AS w,
         2 * (2 + (length(text) * 3) % 8) AS h,
         3 + length(text) % 6 AS T
  FROM documents WHERE doc_id % 3 = 2
),
g AS (SELECT *, w * h * 3 // 2 AS fsz FROM v),
f AS (SELECT *, unnest(range(T)) AS fi FROM g),
lu AS (
  SELECT doc_id, CAST(fi AS INT) AS frame_idx,
         1000 * list_aggregate(list_transform(range(1, w * h + 1),
             i -> ord(substr(substr(repeat(text,
                      CAST(T * fsz // L + 1 AS INT)),
                      CAST(fi * fsz + 1 AS INT), CAST(fsz AS INT)),
                  CAST(i AS INT), 1))), 'sum')
           // (w * h) AS luma_milli
  FROM f
),
d AS (
  SELECT doc_id, frame_idx, CAST(luma_milli AS BIGINT) AS luma_milli,
         CAST(abs(luma_milli - lag(luma_milli) OVER (
             PARTITION BY doc_id ORDER BY frame_idx)) AS BIGINT)
           AS delta_milli
  FROM lu
)
SELECT doc_id, frame_idx, luma_milli, delta_milli,
       coalesce(delta_milli > {threshold_milli}, false) AS is_cut
FROM d
"""


def q_kcenter_select(k: int = 6) -> str:
    """kcenter_select twin (operators/similarity.py): the SAME
    greedy farthest-point traversal UNROLLED — seed = lowest id,
    then k-1 rounds of "least over round-5 squared distances to the
    chosen set, pick (d DESC, id ASC)". Each chosen center is a
    1-row CTE the next round cross-joins."""
    dist = (
        "round(list_sum(list_transform(range(1, len(e.emb) + 1), "
        "i -> (e.emb[i] - {c}.emb[i]) * (e.emb[i] - {c}.emb[i]))), 5)"
    )
    parts = ["""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
c0 AS (SELECT vec_id, emb FROM e ORDER BY vec_id LIMIT 1)"""]
    sel = ["SELECT CAST(0 AS INT) AS round_idx, vec_id, "
           "CAST(NULL AS DOUBLE) AS radius FROM c0"]
    prev = ["c0"]
    for r in range(1, k):
        dists = ", ".join(dist.format(c=c) for c in prev)
        least = f"least({dists})" if len(prev) > 1 else dists
        froms = ", ".join(["e"] + [f"{c} {c}" for c in prev])
        parts.append(f""",
m{r} AS (SELECT e.vec_id, e.emb, {least} AS d FROM {froms}),
p{r} AS (SELECT vec_id, emb, d FROM m{r} ORDER BY d DESC, vec_id LIMIT 1)""")
        sel.append(
            f"SELECT CAST({r} AS INT), vec_id, d FROM p{r}"
        )
        prev.append(f"p{r}")
    return "".join(parts) + "\n" + "\nUNION ALL ".join(sel)


def q_watermark_scores(z2_thresh: int = 4, seed: str = "wm1") -> str:
    """watermark_scores twin (operators/textstats.py): the same
    green rule — h32(seed || prev || \\x01 || tok) even — folded
    over positions 2..n, the same sqrt-free z-test
    (2g > n AND (2g-n)^2 > lambda^2 * n)."""
    return f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
),
s AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 2 THEN len(toks) - 1 ELSE 0 END
           AS n_scored,
         CASE WHEN len(toks) >= 2 THEN
           list_sum(list_transform(range(2, len(toks) + 1),
             i -> CASE WHEN
               CAST(('0x' || substr(md5('{seed}' || toks[i - 1]
                     || chr(1) || toks[i]), 1, 8)) AS BIGINT) % 2 = 0
               THEN 1 ELSE 0 END))
         ELSE 0 END AS n_green
  FROM t
)
SELECT doc_id, CAST(n_scored AS BIGINT) AS n_scored,
       CAST(n_green AS BIGINT) AS n_green,
       CAST(CASE WHEN n_scored > 0
            THEN (1000 * n_green) // n_scored END AS BIGINT)
         AS green_milli,
       (n_scored > 0 AND 2 * n_green > n_scored AND
        (2 * n_green - n_scored) * (2 * n_green - n_scored)
          > {z2_thresh} * n_scored) AS suspect
FROM s
"""


def q_source_keyness(k: int = 5, min_count: int = 5) -> str:
    """source_keyness twin (operators/textstats.py): the same
    (source, term) 2x2 chi-square with the IDENTICAL pinned double
    chain floored to milli, ranked (chi2_milli DESC, term ASC)."""
    return f"""
WITH e AS (
  SELECT source, unnest({_TOKS}) AS term FROM documents
),
st AS (
  SELECT source, term, count(*) AS a FROM e
  WHERE term <> '' GROUP BY 1, 2
),
tt AS (SELECT term, sum(a) AS y_w FROM st GROUP BY 1),
srct AS (SELECT source, sum(a) AS n_s FROM st GROUP BY 1),
g AS (SELECT sum(a) AS N FROM st),
full_t AS (
  SELECT st.source, st.term, st.a AS n_in,
         tt.y_w - st.a AS n_out,
         CAST(st.a AS DOUBLE) * CAST(g.N - srct.n_s - (tt.y_w - st.a) AS DOUBLE)
           > CAST(tt.y_w - st.a AS DOUBLE) * CAST(srct.n_s - st.a AS DOUBLE)
           AS overrep,
         CAST(floor(((1000.0 * CAST(g.N AS DOUBLE))
           * (CAST(st.a AS DOUBLE) * CAST(g.N - srct.n_s - (tt.y_w - st.a) AS DOUBLE)
              - CAST(tt.y_w - st.a AS DOUBLE) * CAST(srct.n_s - st.a AS DOUBLE))
           * (CAST(st.a AS DOUBLE) * CAST(g.N - srct.n_s - (tt.y_w - st.a) AS DOUBLE)
              - CAST(tt.y_w - st.a AS DOUBLE) * CAST(srct.n_s - st.a AS DOUBLE)))
           / (CAST(tt.y_w AS DOUBLE) * CAST(g.N - tt.y_w AS DOUBLE)
              * CAST(srct.n_s AS DOUBLE) * CAST(g.N - srct.n_s AS DOUBLE)))
           AS BIGINT) AS chi2_milli
  FROM st JOIN tt USING (term) JOIN srct USING (source), g
  WHERE st.a >= {min_count}
)
SELECT source, term, CAST(n_in AS BIGINT) AS n_in,
       CAST(n_out AS BIGINT) AS n_out, overrep, chi2_milli,
       CAST(rank AS INT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY source
            ORDER BY chi2_milli DESC, term) AS rank
  FROM full_t
)
WHERE rank <= {k}
"""


def q_cluster_cards(threshold: float = 0.6) -> str:
    """cluster_cards twin (operators/dedup.py): the components
    oracle wrapped as a CTE, joined back to the corpus text lengths,
    one GROUP BY component with the size >= 2 card filter."""
    return f"""
WITH comp AS ({q_dedup_components(threshold)}),
corpus AS ({CORPUS_SQL}),
j AS (
  SELECT c.doc_id, c.component, c.is_keeper,
         length(corpus.text) AS chars
  FROM comp c JOIN corpus USING (doc_id)
)
SELECT component, count(*)::BIGINT AS size,
       min(CASE WHEN is_keeper THEN doc_id END) AS keeper,
       sum(chars)::BIGINT AS total_chars,
       CAST(min(CASE WHEN is_keeper THEN chars END) AS BIGINT)
         AS keeper_chars,
       (sum(chars) - min(CASE WHEN is_keeper THEN chars END))::BIGINT
         AS saved_chars
FROM j GROUP BY component HAVING count(*) >= 2
"""


def q_eval_token_f1() -> str:
    """eval_token_f1 twin (operators/textstats.py) over the same
    derived pair table the gate builds (each doc scored against its
    source-neighbor): the identical multiset-intersection fold —
    per distinct prediction token, min(count in pred, count in ref)
    — and the same milli F1/precision/recall integer division."""
    return """
WITH d AS (
  SELECT doc_id, source, text,
         lead(text) OVER (PARTITION BY source ORDER BY doc_id)
           AS ref_text
  FROM documents
),
pairs AS (
  SELECT doc_id, text AS prediction, ref_text AS reference
  FROM d WHERE ref_text IS NOT NULL
),
tk AS (
  SELECT doc_id,
         list_filter(string_split(lower(prediction), ' '),
                     x -> x <> '') AS p,
         list_filter(string_split(lower(reference), ' '),
                     x -> x <> '') AS r
  FROM pairs
),
sc AS (
  SELECT doc_id, len(p) AS n_pred, len(r) AS n_ref,
         list_sum(list_transform(list_distinct(p),
           t -> least(len(list_filter(p, x -> x = t)),
                      len(list_filter(r, x -> x = t))))) AS nc
  FROM tk
)
SELECT doc_id, CAST(n_pred AS BIGINT) AS n_pred,
       CAST(n_ref AS BIGINT) AS n_ref,
       CAST(coalesce(nc, 0) AS BIGINT) AS n_common,
       CAST(CASE WHEN n_pred = 0 AND n_ref = 0 THEN 1000
                 WHEN n_pred = 0 THEN 0
                 ELSE (1000 * coalesce(nc, 0)) // n_pred END AS BIGINT)
         AS precision_milli,
       CAST(CASE WHEN n_pred = 0 AND n_ref = 0 THEN 1000
                 WHEN n_ref = 0 THEN 0
                 ELSE (1000 * coalesce(nc, 0)) // n_ref END AS BIGINT)
         AS recall_milli,
       CAST(CASE WHEN n_pred = 0 AND n_ref = 0 THEN 1000
                 ELSE (2000 * coalesce(nc, 0)) // (n_pred + n_ref)
            END AS BIGINT) AS f1_milli
FROM sc
"""


def q_bpe_fertility(n_merges: int = 8) -> str:
    """bpe_fertility twin (operators/tokenizer.py): the bpe encode
    oracle as a CTE, joined back to per-doc whitespace/char counts,
    one GROUP BY source with the same milli integer divisions."""
    return f"""
WITH enc AS ({q_bpe_token_counts(n_merges)}),
base AS (
  SELECT doc_id, source,
         len(list_filter(string_split(text, ' '), x -> x <> ''))
           AS n_ws,
         length(text) AS n_chars
  FROM documents
),
g AS (
  SELECT b.source, count(*) AS n_docs, sum(b.n_ws) AS n_ws_tokens,
         sum(e.n_bpe_tokens) AS n_bpe_tokens,
         sum(b.n_chars) AS n_chars
  FROM base b JOIN enc e USING (doc_id)
  GROUP BY 1
)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_ws_tokens AS BIGINT) AS n_ws_tokens,
       CAST(n_bpe_tokens AS BIGINT) AS n_bpe_tokens,
       CAST(CASE WHEN n_ws_tokens > 0
            THEN (1000 * n_bpe_tokens) // n_ws_tokens END AS BIGINT)
         AS fertility_milli,
       CAST(CASE WHEN n_bpe_tokens > 0
            THEN (1000 * n_chars) // n_bpe_tokens END AS BIGINT)
         AS chars_per_token_milli
FROM g
"""


def q_pack_bfd(capacity: int = 256) -> str:
    """pack_sequences_bfd twin (operators/curation.py): the BFD
    placement replayed by a recursive CTE whose VALUE STATE is the
    bin-load list — best bin = list_max(list_filter(bins, fits)),
    its index via list_position (first match = lowest index, the
    tie rule), update via an indexed list_transform. The per-group
    sequential scan the operator runs in pandas, expressed as
    relational recursion."""
    return f"""
WITH RECURSIVE sized AS (
  SELECT source, doc_id,
         CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS nt
  FROM documents
),
seq AS (
  SELECT source, doc_id, nt,
         CAST(row_number() OVER (PARTITION BY source
              ORDER BY nt DESC, doc_id) AS BIGINT) AS rn
  FROM sized
),
step AS (
  SELECT source, CAST(0 AS BIGINT) AS rn,
         CAST([] AS BIGINT[]) AS bins,
         CAST([] AS STRUCT(d BIGINT, nt BIGINT, b BIGINT,
                           o BIGINT)[]) AS acc
  FROM (SELECT DISTINCT source FROM seq)
  UNION ALL
  SELECT st.source, st.rn + 1,
         CASE WHEN t.bv IS NULL THEN list_append(st.bins, q.nt)
              ELSE list_transform(st.bins,
                     (u, i) -> CASE WHEN i = t.bi THEN u + q.nt
                               ELSE u END) END,
         list_append(st.acc,
           {{'d': q.doc_id, 'nt': q.nt,
            'b': CASE WHEN t.bv IS NULL THEN len(st.bins)
                 ELSE t.bi - 1 END,
            'o': CASE WHEN t.bv IS NULL THEN 0 ELSE t.bv END}})
  FROM step st
  JOIN seq q ON q.source = st.source AND q.rn = st.rn + 1
  CROSS JOIN LATERAL (
    SELECT list_max(list_filter(st.bins,
             u -> u + q.nt <= {capacity})) AS bv,
           list_position(st.bins,
             list_max(list_filter(st.bins,
               u -> u + q.nt <= {capacity}))) AS bi
  ) t
),
fin AS (
  SELECT s.source, s.acc
  FROM step s
  JOIN (SELECT source, max(rn) AS n FROM seq GROUP BY 1) m
    ON s.source = m.source AND s.rn = m.n
),
ex AS (SELECT source, unnest(acc) AS a FROM fin)
SELECT source, a.d AS doc_id, a.nt AS n_tokens,
       a.b AS bin_idx, a.o AS offset_in_bin
FROM ex
"""


def q_sorted_neighborhood(
    window: int = 4, max_dist: int = 2, key_len: int = 24
) -> str:
    """sorted_neighborhood_pairs twin (operators/linkage.py): the
    same canonical keys, a PLAIN global row_number (the oracle can
    afford the global sort the operator's two-level bucket rank
    avoids — their equality is the point), rank-gap window pairs,
    exact levenshtein cutoff."""
    return f"""
WITH k AS (
  SELECT doc_id,
         substr(trim(regexp_replace(regexp_replace(
                lower(substr(text, 1, 4 * {key_len})),
                '[^a-z0-9 ]', '', 'g'), '  +', ' ', 'g')),
                1, {key_len}) AS key
  FROM documents
),
r AS (
  SELECT doc_id, key,
         row_number() OVER (ORDER BY key, doc_id) AS rnk
  FROM k
)
SELECT least(a.doc_id, b.doc_id) AS doc_a,
       greatest(a.doc_id, b.doc_id) AS doc_b,
       CAST(b.rnk - a.rnk AS INT) AS gap,
       CAST(levenshtein(a.key, b.key) AS INT) AS dist
FROM r a JOIN r b
  ON b.rnk - a.rnk BETWEEN 1 AND {window}
WHERE levenshtein(a.key, b.key) <= {max_dist}
"""


def q_ks_drift() -> str:
    """ks_drift twin (operators/dq.py) over the gate's two slices
    (even vs odd doc_id, n_chars distribution): the same value
    histogram, cumulative counts, cross-multiplied integer max and
    final milli floor; argmax tie broken to the lowest value."""
    return """
WITH a AS (SELECT n_chars AS v FROM documents WHERE doc_id % 2 = 0),
b AS (SELECT n_chars AS v FROM documents WHERE doc_id % 2 = 1),
ha AS (SELECT v, count(*) AS ca FROM a GROUP BY 1),
hb AS (SELECT v, count(*) AS cb FROM b GROUP BY 1),
m AS (
  SELECT coalesce(ha.v, hb.v) AS v,
         coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
  FROM ha FULL OUTER JOIN hb ON ha.v = hb.v
),
cum AS (
  SELECT v, sum(ca) OVER (ORDER BY v) AS cum_a,
         sum(cb) OVER (ORDER BY v) AS cum_b
  FROM m
),
t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM m),
s AS (
  SELECT v, na, nb, abs(cum_a * nb - cum_b * na) AS num
  FROM cum, t
)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       CAST(v AS BIGINT) AS v_at_max,
       CAST((1000 * num) // (na * nb) AS BIGINT) AS d_milli
FROM s ORDER BY num DESC, v LIMIT 1
"""
