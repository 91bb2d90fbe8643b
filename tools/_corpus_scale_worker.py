#!/usr/bin/env python
"""Worker for tools/run_corpus_scaling.py — one fresh JVM per
(core-count) measurement of the training-data-tier operators.

Synthesizes a deterministic corpus ENTIRELY JVM-side (no Python in
the generation path): doc text is 61-120 words drawn from a fixed
400-word vocabulary by xxhash64(doc_id, position), plus 2% planted
exact copies and 2% near copies so dedup has real work. The corpus
is materialized to tmpfs parquet first, so generation cost never
contaminates operator timings.

Usage (via spark-submit):
  _corpus_scale_worker.py <n_docs> <summary_json> [ops_csv]

ops_csv (optional) restricts the timed set — e.g.
"line_dedup,shuffle_index" for the large-corpus runs where the
LSH/components tier would dominate wall-clock without adding
evidence.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

VOCAB = [f"w{i}" for i in range(360)] + [
    "the", "a", "and", "of", "to", "in", "is", "table", "scan", "row",
    "batch", "merge", "sort", "hash", "join", "value", "query", "part",
    "fast", "slow", "data", "line", "key", "agg", "window", "filter",
    "stream", "group", "order", "column", "small", "big", "spark",
    "vector", "customer", "date", "file", "disk", "node", "task",
]


def build_corpus(spark, n_docs: int, work: str) -> str:
    v = F.array(*[F.lit(w) for w in VOCAB])
    nv = len(VOCAB)
    doc_id = F.col("id")
    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(60) + F.pmod(doc_id, 60)),
            lambda i: F.element_at(
                v, F.pmod(F.xxhash64(doc_id, i), nv).cast("int") + 1
            ),
        ),
    )
    base = spark.range(n_docs).select(
        doc_id.alias("doc_id"),
        text.alias("text"),
        F.concat(F.lit("s"), F.pmod(doc_id, 64)).alias("source"),
    )
    exact = base.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text", "source"
    )
    near = base.filter(F.col("doc_id") % 50 == 7).select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" near duplicate suffix")).alias(
            "text"
        ),
        "source",
    )
    path = os.path.join(work, "corpus")
    (
        base.unionAll(exact)
        .unionAll(near)
        .repartition(spark.sparkContext.defaultParallelism * 2, "doc_id")
        .write.parquet(path)
    )
    return path


def main():
    n_docs = int(sys.argv[1])
    summary = sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    spark = SparkSession.builder.getOrCreate()
    # strict ANSI, same as the unified session default (session.py) —
    # the scaling evidence measures the mode the engine actually runs
    spark.conf.set("spark.sql.ansi.enabled", "true")

    from ci_log_processing_spark.operators.curation import (
        pack_sequences,
        shuffle_index,
        top_ngrams,
    )
    from ci_log_processing_spark.operators.textstats import line_dedup
    from ci_log_processing_spark.operators.dedup import (
        dedup_pair_edges,
        duplicate_components,
    )
    from ci_log_processing_spark.operators.pii import pii_scrub
    from ci_log_processing_spark.operators.textstats import (
        repetition_stats,
        repetition_stats_arrow,
        tfidf_top_terms,
    )

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    work = tempfile.mkdtemp(prefix="corpus_scale_", dir=shm)
    timings: dict[str, float] = {}
    try:
        corpus = spark.read.parquet(build_corpus(spark, n_docs, work))
        n_rows = corpus.count()  # warm the scan

        def t(name, fn, warmup=False):
            # scan-bound ops finish in seconds even at 150k docs, so
            # a 2-4 s Janino codegen compile would dominate their
            # ratio; warm those up and report steady-state (the
            # LSH/components tier runs long enough to amortize it)
            if only is not None and name not in only:
                return
            if warmup:
                fn()
            t0 = time.time()
            fn()
            timings[name] = round(time.time() - t0, 2)

        # scan-bound tier (documents-shaped input: doc_id + text)
        t(
            "pii_scrub",
            lambda: pii_scrub(corpus, text_col="text")
            .select(F.bit_xor(F.xxhash64("doc_id", "n_pii", "redacted")))
            .collect(),
            warmup=True,
        )
        t(
            "repetition",
            lambda: repetition_stats(corpus, text_col="text")
            .select(
                F.bit_xor(
                    F.xxhash64(
                        "doc_id", "dup_line_frac", "top_bigram_frac"
                    )
                )
            )
            .collect(),
            warmup=True,
        )
        t(
            "repetition_arrow",
            lambda: repetition_stats_arrow(corpus, text_col="text")
            .select(
                F.bit_xor(
                    F.xxhash64(
                        "doc_id", "dup_line_frac", "top_bigram_frac"
                    )
                )
            )
            .collect(),
            warmup=True,
        )
        t(
            "top_ngrams",
            lambda: top_ngrams(corpus, n=2, k=20)
            .select(F.bit_xor(F.xxhash64("ngram", "occurrences")))
            .collect(),
            warmup=True,
        )
        t(
            "pack_sequences",
            lambda: pack_sequences(corpus, capacity=256)
            .select(F.bit_xor(F.xxhash64("doc_id", "bin_idx")))
            .collect(),
            warmup=True,
        )
        # lakehouse tier (round 4): CDC merge (delta-sized window +
        # key anti-join against the corpus-sized base), manifest
        # compaction binning, the one-scan DQ audit, and the skew
        # diagnostic — the maintenance ops a 100 TB table needs
        from ci_log_processing_spark.operators.dedup import (
            release_persisted as _release_persisted,
        )
        from ci_log_processing_spark.operators.dq import dq_audit
        from ci_log_processing_spark.operators.skew import (
            key_skew_audit,
        )
        from ci_log_processing_spark.operators.snapshot import (
            apply_cdc,
            compaction_plan,
            compaction_summary,
        )

        def _cdc():
            base = corpus.select("doc_id", "text", "source")
            upd = base.filter(F.col("doc_id") % 9 == 0).select(
                "doc_id",
                F.lit("U").alias("op"),
                F.lit(1).cast("long").alias("seq"),
                F.upper("text").alias("text"),
                "source",
            )
            dele = base.filter(F.col("doc_id") % 17 == 3).select(
                "doc_id",
                F.lit("D").alias("op"),
                F.lit(2).cast("long").alias("seq"),
                "text",
                "source",
            )
            ins = base.filter(F.col("doc_id") % 23 == 5).select(
                (F.col("doc_id") + 30_000_000).alias("doc_id"),
                F.lit("I").alias("op"),
                F.lit(1).cast("long").alias("seq"),
                "text",
                "source",
            )
            return (
                apply_cdc(base, upd.unionByName(dele).unionByName(ins))
                .select(F.bit_xor(F.xxhash64("doc_id", "text")))
                .collect()
            )

        t("apply_cdc", _cdc, warmup=True)

        def _cdc_low():
            # ~1% change rate — the production regime, where the
            # touched-key build side is broadcast-sized and base
            # should cross zero exchanges (BASELINE.md claim)
            base = corpus.select("doc_id", "text", "source")
            upd = base.filter(F.col("doc_id") % 97 == 0).select(
                "doc_id",
                F.lit("U").alias("op"),
                F.lit(1).cast("long").alias("seq"),
                F.upper("text").alias("text"),
                "source",
            )
            return (
                apply_cdc(base, upd)
                .select(F.bit_xor(F.xxhash64("doc_id", "text")))
                .collect()
            )

        t("apply_cdc_low", _cdc_low, warmup=True)
        t(
            "compaction",
            lambda: compaction_summary(
                compaction_plan(
                    corpus.withColumn("n_chars", F.length("text")),
                    target_bytes=64 * 1024,
                )
            )
            .select(
                F.bit_xor(
                    F.xxhash64("part", "bin_idx", "n_files", "out_bytes")
                )
            )
            .collect(),
            warmup=True,
        )
        t(
            "dq_audit",
            lambda: dq_audit(
                corpus,
                {
                    "not_null:text": F.col("text").isNull(),
                    "range:len": (F.length("text") < 1)
                    | (F.length("text") > 10_000),
                },
                unique_key="doc_id",
            )
            .select(
                F.bit_xor(F.xxhash64("check_name", "n_violations"))
            )
            .collect(),
            warmup=True,
        )

        def _skew():
            r = (
                key_skew_audit(corpus, "source", top_n=20)
                .select(
                    F.bit_xor(F.xxhash64("key", "cnt", "share_milli"))
                )
                .collect()
            )
            _release_persisted()  # free the counts cache
            return r

        t("skew_audit", _skew, warmup=True)
        from ci_log_processing_spark.operators import dedup as _dedup
        from ci_log_processing_spark.operators.dedup import winnow_pairs
        from ci_log_processing_spark.operators.retrieval import bm25_topk
        from ci_log_processing_spark.operators.textstats import vocab_stats

        # 8 query docs — on this uniform-vocabulary synthetic corpus
        # every term is a stop-term (df ~ n_docs/5), so candidate
        # volume is ~n_docs * |qterms| per query; the bounded query
        # set keeps the leg a candidate-join measurement instead of
        # an all-pairs blow-up (natural corpora rely on the Zipf df
        # distribution + max_df_frac instead)
        def _bm25():
            q = corpus.filter(
                F.col("doc_id") % max(n_docs // 8, 1) == 3
            )
            r = (
                bm25_topk(corpus, q, k=10)
                .select(
                    F.bit_xor(
                        F.xxhash64("qid", "doc_id", "score_milli")
                    )
                )
                .collect()
            )
            _dedup.release_persisted()
            return r

        t("bm25", _bm25, warmup=True)

        def _winnow():
            r = (
                winnow_pairs(corpus, overlap_milli=500)
                .select(
                    F.bit_xor(
                        F.xxhash64("doc_a", "doc_b", "overlap_milli")
                    )
                )
                .collect()
            )
            _dedup.release_persisted()
            return r

        t("winnow_pairs", _winnow, warmup=True)
        t(
            "vocab_stats",
            lambda: vocab_stats(corpus)
            .select(F.bit_xor(F.xxhash64("source", "n_types", "n_hapax")))
            .collect(),
            warmup=True,
        )
        from ci_log_processing_spark.operators.aggregate import (
            log_templates,
        )
        from ci_log_processing_spark.operators.layout import (
            zorder_layout_audit,
        )

        # routed-shaped view of the corpus: one visible turn per doc
        routed_like = corpus.select(
            F.col("source").alias("conv_id"),
            F.col("doc_id").cast("int").alias("turn_idx"),
            F.col("text").alias("message"),
            F.lit("agent_turns").alias("sink"),
        )
        t(
            "log_templates",
            lambda: log_templates(routed_like)
            .select(F.bit_xor(F.xxhash64("template", "n_msgs", "n_convs")))
            .collect(),
            warmup=True,
        )
        zin = corpus.select(
            "doc_id", F.length("text").alias("n_chars")
        )
        t(
            "zorder_audit",
            lambda: zorder_layout_audit(
                zin, "n_chars", "doc_id", probe=(0, 100, 0, 1000)
            )
            .select(
                F.bit_xor(
                    F.xxhash64("layout", "bucket", "n_rows", "min_x")
                )
            )
            .collect(),
            warmup=True,
        )
        from ci_log_processing_spark.operators import dedup as _dedup

        def _tfidf():
            r = (
                tfidf_top_terms(corpus, k=3)
                .select(F.bit_xor(F.xxhash64("doc_id", "term", "tf")))
                .collect()
            )
            _dedup.release_persisted()  # free the tf cache per run
            return r

        t("tfidf", _tfidf, warmup=True)

        def _shuffle_index():
            r = (
                shuffle_index(corpus, shard_size=10_000)
                .select(F.bit_xor(F.xxhash64("doc_id", "global_idx")))
                .collect()
            )
            _dedup.release_persisted()  # free the ranked cache per run
            return r

        t("shuffle_index", _shuffle_index, warmup=True)

        def _softdedup():
            from ci_log_processing_spark.operators.curation import (
                softdedup_weights,
            )

            return (
                softdedup_weights(corpus)
                .select(
                    F.bit_xor(
                        F.xxhash64(
                            "doc_id", "cluster_n", "weighted_tokens_milli"
                        )
                    )
                )
                .collect()
            )

        # exact-mode SoftDeDup: one md5-keyed window exchange over the
        # corpus — the line_dedup scale class, measured independently
        t("softdedup_exact", _softdedup, warmup=True)

        def _bpe():
            from ci_log_processing_spark.operators.tokenizer import (
                bpe_merges,
            )

            assert bpe_merges(corpus, n_merges=8).count() == 8
            _dedup.release_persisted()  # free the word-freq cache

        # BPE training end-to-end. NOTE: with this worker's fixed
        # 400-word vocab the 8 merge rounds are a job-count latency
        # floor (~16 fixed tiny jobs), so end-to-end 8->32 ratios at
        # moderate n_docs measure the floor, not the engine — the
        # corpus-sized component is isolated as bpe_wordfreq below
        t("bpe_train", _bpe, warmup=True)

        def _bpe_wordfreq():
            from ci_log_processing_spark.operators.tokenizer import (
                word_freq,
            )

            word_freq(corpus).select(
                F.bit_xor(F.xxhash64("word", "freq"))
            ).collect()

        # the corpus-sized pass of BPE training alone (explode +
        # partial/final count — the top_ngrams shape)
        t("bpe_wordfreq", _bpe_wordfreq, warmup=True)

        def _bpe_encode():
            from ci_log_processing_spark.operators.tokenizer import (
                bpe_token_counts,
            )

            bpe_token_counts(corpus, n_merges=8).select(
                F.bit_xor(F.xxhash64("doc_id", "n_bpe_tokens"))
            ).collect()
            _dedup.release_persisted()

        # the OTHER corpus-sized BPE pass: encode = explode ⋈ trained
        # word table + doc-keyed sum (feeds cur_token_budget_bpe's
        # tokenizer-true budget)
        t("bpe_encode", _bpe_encode, warmup=True)

        def _bpe_encode_arrow():
            from ci_log_processing_spark.operators.tokenizer import (
                bpe_token_counts_arrow,
            )

            bpe_token_counts_arrow(corpus, n_merges=8).select(
                F.bit_xor(F.xxhash64("doc_id", "n_bpe_tokens"))
            ).collect()
            _dedup.release_persisted()

        # hot-vocab closure-dict variant: one zero-shuffle Arrow
        # pass, no explode / join / doc-keyed agg — the A/B for the
        # bpe_encode watch item (BASELINE.md BPE-tier legs)
        t("bpe_encode_arrow", _bpe_encode_arrow, warmup=True)
        # two-line docs: a 64-value header line (always corpus-hot)
        # plus the body (hot only inside planted duplicate groups)
        two_line = corpus.withColumn(
            "btext", F.concat("source", F.lit("\n"), "text")
        )
        t(
            "line_dedup",
            lambda: line_dedup(two_line, min_count=3)
            .select(F.bit_xor(F.xxhash64("doc_id", "n_kept")))
            .collect(),
            warmup=True,
        )
        # round-4 sampling tier (documents-shaped input; n_chars
        # derived — the synthetic corpus has none)
        from ci_log_processing_spark.operators.curation import (
            bloom_decontaminate,
            perplexity_buckets,
            priority_sample,
            sqrt_temperature_mixture,
        )

        weighted = corpus.withColumn("n_chars", F.length("text"))
        t(
            "priority_sample",
            lambda: priority_sample(weighted, k=1000)
            .select(F.bit_xor(F.xxhash64("doc_id", "w_hat")))
            .collect(),
            warmup=True,
        )
        t(
            "temperature_mixture",
            lambda: sqrt_temperature_mixture(corpus)
            .select(F.bit_xor(F.xxhash64("doc_id", "keep_rate")))
            .collect(),
            warmup=True,
        )
        t(
            "perplexity_buckets",
            lambda: perplexity_buckets(corpus)
            .select(F.bit_xor(F.xxhash64("doc_id", "ppl_bucket")))
            .collect(),
            warmup=True,
        )
        t(
            "bloom_decontaminate",
            lambda: bloom_decontaminate(
                corpus, ["key agg row scan slow fast"]
            )
            .select(F.bit_xor(F.xxhash64("doc_id", "n_hit_shingles")))
            .collect(),
            warmup=True,
        )
        # round-4 restart tier: DSIR selection (two bucket aggregates
        # + broadcast ratio + doc agg + histogram threshold) and span
        # excision (positional-shingle scan + hit-sized windows).
        # k=2 spans: a specific 2-gram of the ~400-word vocab occurs
        # ~6e-6/position, so the flag stream stays hit-sized while
        # the SCAN stays corpus-sized — the shape being measured.
        from ci_log_processing_spark.operators.curation import (
            decontaminate_spans,
            dsir_sample,
        )

        def _dsir():
            r = (
                dsir_sample(
                    corpus,
                    corpus.filter(F.col("source") == "s0"),
                    keep_permille=250,
                )
                .select(F.bit_xor(F.xxhash64("doc_id", "dsir_bits")))
                .collect()
            )
            _dedup.release_persisted()  # free the weights cache
            return r

        t("dsir_sample", _dsir, warmup=True)
        span_snips = [
            "the scan", "row batch", "hash join", "value query",
            "fast slow", "agg window", "stream group", "order column",
        ]
        t(
            "decontaminate_spans",
            lambda: decontaminate_spans(corpus, span_snips, k=2)
            .select(
                F.bit_xor(
                    F.xxhash64("doc_id", "n_spans", "n_tokens_removed")
                )
            )
            .collect(),
            warmup=True,
        )
        # round-4 LM tier: vocab-keyed aggregates + instance joins —
        # the shuffle-heaviest of the per-doc scorers
        from ci_log_processing_spark.operators.textstats import (
            bigram_logprob,
        )

        def _bigram():
            r = (
                bigram_logprob(corpus)
                .select(
                    F.bit_xor(
                        F.xxhash64("doc_id", "bigram_bits", "n_backoff")
                    )
                )
                .collect()
            )
            _dedup.release_persisted()  # free the unigram cache
            return r

        t("bigram_lm", _bigram, warmup=True)
        # round-4e tier: skip-gram pair counts, positional inverted
        # index, sparse count-cosine near-dup, stratified split,
        # length batches — requested via ops_csv like the embed tier
        R4E_OPS = {
            "skipgram",
            "inverted_index",
            "count_cosine",
            "stratified_split",
            "length_batches",
        }
        if only is not None and only & R4E_OPS:
            from ci_log_processing_spark.operators.curation import (
                length_batches,
                stratified_split,
            )
            from ci_log_processing_spark.operators.dedup import (
                count_cosine_pairs,
            )
            from ci_log_processing_spark.operators.retrieval import (
                inverted_index,
            )
            from ci_log_processing_spark.operators.textstats import (
                skipgram_pairs,
            )

            t(
                "skipgram",
                lambda: skipgram_pairs(corpus, window=3, min_count=2)
                .select(F.bit_xor(F.xxhash64("tok_a", "tok_b", "n")))
                .collect(),
                warmup=True,
            )

            def _invidx():
                # The synthetic 400-word vocabulary gives EVERY term
                # df ~ n_docs — indexing it with the max_df guard
                # disabled collects corpus-sized posting lists into
                # single reducer rows (the exact mega-bucket the
                # operator's docstring warns about; measured: heap
                # OOM at local[32]/1M docs). Salt each token by a
                # 4096-way position hash instead: ~1.6M distinct
                # terms at df ~ 50, so the documented df band
                # [2, 64] is exercised on BOTH edges and per-term
                # state stays bounded — the Zipf-middle shape a real
                # index build runs over.
                salted = corpus.select(
                    "doc_id",
                    F.array_join(
                        F.transform(
                            F.split("text", " "),
                            lambda w, i: F.concat(
                                w,
                                F.lit("_"),
                                F.pmod(
                                    F.xxhash64(F.col("doc_id"), i), 4096
                                ),
                            ),
                        ),
                        " ",
                    ).alias("text"),
                )
                r = (
                    inverted_index(salted, min_df=2, max_df=64)
                    .select(
                        F.bit_xor(
                            F.xxhash64("term", "df", "postings")
                        )
                    )
                    .collect()
                )
                _dedup.release_persisted()
                return r

            t("inverted_index", _invidx, warmup=True)

            def _ccos():
                r = (
                    count_cosine_pairs(
                        corpus, threshold_milli=800, df_cut=128,
                        ngram=4,
                    )
                    .select(
                        F.bit_xor(F.xxhash64("doc_a", "doc_b", "dot"))
                    )
                    .collect()
                )
                _dedup.release_persisted()
                return r

            t("count_cosine", _ccos, warmup=True)
            t(
                "stratified_split",
                lambda: stratified_split(corpus)
                .select(F.bit_xor(F.xxhash64("doc_id", "split")))
                .collect(),
                warmup=True,
            )
            t(
                "length_batches",
                lambda: length_batches(corpus)
                .select(
                    F.bit_xor(
                        F.xxhash64(
                            "source", "batch_id", "pad_waste_milli"
                        )
                    )
                )
                .collect(),
                warmup=True,
            )
        # round-4f tier: symspell delete-neighborhood linkage
        # (explode + hashed equi-join), watermark z-test (zero-shuffle
        # per-row fold), chi-square keyness (one corpus agg + vocab
        # joins + rank window), isotonic reliability (NB train + bin
        # agg + B^3 lattice on <= 8 rows) — requested via ops_csv
        R4F_OPS = {"symspell", "watermark", "keyness", "reliability"}
        if only is not None and only & R4F_OPS:
            from ci_log_processing_spark.operators import (
                dedup as _dedup4f,
            )
            from ci_log_processing_spark.operators.calibrate import (
                reliability_isotonic,
            )
            from ci_log_processing_spark.operators.linkage import (
                symspell_pairs,
            )
            from ci_log_processing_spark.operators.textstats import (
                nb_quality_classifier,
                source_keyness,
                watermark_scores,
            )

            def _sym():
                r = (
                    symspell_pairs(corpus, max_dist=1)
                    .select(
                        F.bit_xor(F.xxhash64("doc_a", "doc_b", "dist"))
                    )
                    .collect()
                )
                _dedup4f.release_persisted()
                return r

            t("symspell", _sym, warmup=True)
            t(
                "watermark",
                lambda: watermark_scores(corpus)
                .select(
                    F.bit_xor(
                        F.xxhash64("doc_id", "n_green", "suspect")
                    )
                )
                .collect(),
                warmup=True,
            )

            def _key():
                r = (
                    source_keyness(corpus, k=5)
                    .select(
                        F.bit_xor(
                            F.xxhash64("source", "term", "chi2_milli")
                        )
                    )
                    .collect()
                )
                _dedup4f.release_persisted()
                return r

            t("keyness", _key, warmup=True)

            def _rel():
                lab = corpus.withColumn(
                    "label", (F.col("doc_id") % 7 < 3).cast("int")
                )
                r = (
                    reliability_isotonic(
                        nb_quality_classifier(lab), n_bins=8
                    )
                    .select(
                        F.bit_xor(
                            F.xxhash64("bin", "n", "pos", "iso_micro")
                        )
                    )
                    .collect()
                )
                _dedup4f.release_persisted()
                return r

            t("reliability", _rel, warmup=True)
        # shuffle/iteration tier: materializing `pairs` IS the LSH
        # timing; components then consumes the persisted pairs so its
        # number isolates edge-symmetrization + propagation rounds
        stats: dict[str, int] = {}
        if only is None or only & {"lsh_pairs", "components"}:
            # warm the LSH tier too (round 4): the Arrow shingler cut
            # its wall ~5x, so the one-time Janino compile + python
            # worker fork no longer amortizes inside the timed run —
            # at 600k docs the cold overhead inverted the 8->32 ratio
            # (39->55 s cold vs 32->26 s steady; see BASELINE.md)
            from ci_log_processing_spark.operators import (
                dedup as _dedup_mod,
            )

            dedup_pair_edges(corpus, spark, threshold=0.6).count()
            _dedup_mod.release_persisted()
            pairs = dedup_pair_edges(
                corpus, spark, threshold=0.6
            ).persist()
            t("lsh_pairs", lambda: stats.update(n_pairs=pairs.count()))
            t(
                "components",
                lambda: stats.update(
                    n_keepers=duplicate_components(
                        pairs, corpus.select("doc_id")
                    )
                    .filter("is_keeper")
                    .count()
                ),
            )
        # embedding tier (round 4): only when explicitly requested via
        # ops_csv, so the long-standing document-tier legs stay
        # comparable run-to-run. Vectors are synthesized JVM-side —
        # 64-dim, ~4096 soft clusters (sin of a hashed label) plus
        # hashed per-element noise — and materialized to tmpfs parquet
        # so generation never contaminates the timings. n_vecs = the
        # n_docs argument.
        EMBED_OPS = {
            "pq_fit_encode",
            "srp_pairs",
            "ivfpq_query",
            "snapshot_drift",
        }
        if only is not None and only & EMBED_OPS:
            from ci_log_processing_spark.operators.similarity import (
                ivfpq_ann_topk,
                pq_codebooks,
                pq_encode,
                srp_near_dup_pairs,
            )

            dim = 64
            lbl = F.pmod(F.xxhash64(F.col("id")), F.lit(4096))
            vec = F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: (
                    F.sin(lbl.cast("double") * 0.131 + i.cast("double") * 1.7)
                    + (
                        F.pmod(
                            F.xxhash64(F.col("id"), i), F.lit(1000)
                        ).cast("double")
                        / 1000.0
                        - 0.5
                    )
                    * 0.25
                ).cast("float"),
            )
            emb_path = os.path.join(work, "emb")
            (
                spark.range(n_docs)
                .select(
                    F.col("id").alias("vec_id"), vec.alias("embedding")
                )
                .write.mode("overwrite")
                .parquet(emb_path)
            )
            emb = spark.read.parquet(emb_path)
            stats["n_vecs"] = emb.count()  # warm the scan

            def _pq():
                books = pq_codebooks(emb, m=4, k=8, n_iter=1)
                return (
                    pq_encode(emb, books)
                    .select(
                        F.bit_xor(F.xxhash64("vec_id", "c0", "c1", "c2", "c3"))
                    )
                    .collect()
                )

            t("pq_fit_encode", _pq, warmup=True)
            # wide 8-bit band keys + a tight cap: at n >= 10^5 the
            # 3-bit gate-default keys would make every cell huge; the
            # cap bounds pair volume at ~n_keyed x cap/2 (linear in n)
            def _srp():
                n = srp_near_dup_pairs(
                    emb,
                    threshold=0.9,
                    n_bits=64,
                    bands=8,
                    bucket_cap=16,
                ).count()
                stats["n_srp_pairs"] = n
                _dedup.release_persisted()  # free the keyed cache

            t("srp_pairs", _srp, warmup=True)
            def _drift():
                from ci_log_processing_spark.operators.similarity import (
                    snapshot_drift,
                )

                labeled = emb.select(
                    "vec_id",
                    "embedding",
                    F.pmod(F.xxhash64("vec_id"), F.lit(32)).alias(
                        "label"
                    ),
                )
                return (
                    snapshot_drift(
                        labeled.filter(F.col("vec_id") % 2 == 0),
                        labeled.filter(F.col("vec_id") % 2 != 0),
                    )
                    .select(F.bit_xor(F.xxhash64("label", "n_a", "n_b")))
                    .collect()
                )

            # shift monitor: shuffled volume = labels x dim cells,
            # independent of corpus size — the claim under test
            t("snapshot_drift", _drift, warmup=True)

            t(
                "ivfpq_query",
                lambda: ivfpq_ann_topk(
                    emb,
                    emb.filter(F.col("vec_id") < 8),
                    k=10,
                    nprobe=2,
                    k_coarse=8,
                    m=4,
                    k_codes=8,
                    n_iter=1,
                    rerank=50,
                )
                .select(F.bit_xor(F.xxhash64("query_id", "neighbor_id")))
                .collect(),
                warmup=True,
            )

        spark.catalog.clearCache()  # drop pairs + operator persists
        with open(summary, "w") as f:
            json.dump(
                {"n_docs": n_rows, "timings": timings, **stats}, f
            )
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
