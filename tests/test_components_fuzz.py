"""Randomized cross-checks: duplicate_components vs a pure-Python
union-find, pack_sequences vs a pure-Python next-fit simulation.
Seeded RNG — failures reproduce exactly."""

import random

from ci_log_processing_spark.operators.curation import pack_sequences
from ci_log_processing_spark.operators.dedup import duplicate_components


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min node id of each set
    comp = {}
    for v in range(n_nodes):
        r = find(v)
        comp.setdefault(r, []).append(v)
    return {v: min(vs) for r, vs in comp.items() for v in vs}


def _spark_graph(spark, edges, n):
    pairs = spark.createDataFrame(
        edges or [(0, 0)], "doc_a long, doc_b long"
    )
    if not edges:
        pairs = pairs.filter("doc_a != doc_a")  # empty edge list
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    return pairs, nodes


def test_components_match_union_find_random_graphs(spark):
    rng = random.Random(20260817)
    for trial in range(3):
        n = rng.randint(10, 60)
        m = rng.randint(0, n * 2)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        expected = _union_find(n, edges)
        pairs, nodes = _spark_graph(spark, edges, n)
        got = {
            r["doc_id"]: r["component"]
            for r in duplicate_components(pairs, nodes).collect()
        }
        assert got == expected, f"trial {trial}: n={n} edges={edges}"


def test_star_components_match_union_find(spark):
    from ci_log_processing_spark.operators.dedup import (
        duplicate_components_star,
    )

    rng = random.Random(20260819)
    cases = []
    for _ in range(2):
        n = rng.randint(10, 50)
        m = rng.randint(0, n * 2)
        es = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        cases.append((n, [(a, b) for a, b in es if a != b]))
    # the shape propagation is worst at: a long path (diameter = n-1);
    # star contraction must converge in O(log^2 n) rounds
    cases.append((40, [(i, i + 1) for i in range(39)]))
    for n, edges in cases:
        expected = _union_find(n, edges)
        pairs, nodes = _spark_graph(spark, edges, n)
        rows = duplicate_components_star(pairs, nodes).collect()
        got = {r["doc_id"]: r["component"] for r in rows}
        assert got == expected, f"n={n} edges={edges}"
        keepers = {r["doc_id"] for r in rows if r["is_keeper"]}
        assert keepers == set(expected.values())


def _next_fit(items, capacity):
    out = {}
    bin_i, used = 0, 0
    for i, (doc_id, nt) in enumerate(items):
        if i > 0 and used + nt > capacity:
            bin_i += 1
            used = 0
        out[doc_id] = (bin_i, used)
        used += nt
    return out


def test_pack_matches_python_simulation(spark):
    rng = random.Random(20260818)
    rows = []
    expected = {}
    for g in range(5):
        src = f"s{g}"
        items = []
        for i in range(rng.randint(1, 40)):
            doc_id = g * 1000 + i
            nt = rng.randint(1, 30)
            items.append((doc_id, nt))
            rows.append((src, doc_id, " ".join(["w"] * nt)))
        for doc_id, (b, off) in _next_fit(items, 64).items():
            expected[doc_id] = (b, off)
    docs = spark.createDataFrame(
        rows, "source string, doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["bin_idx"], r["offset_in_bin"])
        for r in pack_sequences(docs, capacity=64).collect()
    }
    assert got == expected
