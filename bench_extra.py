"""Per-operator isolation bench (round 6 optimization work).

``bench.py`` is the FROZEN driver-timed surface; this file exists so the
optimization loop can time one operator at a time (guide §1.4: noop-sink
style forcing via ``checksum_count``, job labels via
``setJobDescription``) without touching the frozen harness.

Usage::

    python bench_extra.py                 # all stages, bench.py-sized corpus
    python bench_extra.py quality lines   # just those stages
    SPARK_GRAFT_BENCH_DOCS=50000 python bench_extra.py quality

Prints one ``name: seconds`` line per stage (median of N repeats, first
run reported separately as warm-up) plus the row count so output-size
changes are caught immediately.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "200000"))
N_VECS = int(os.environ.get("SPARK_GRAFT_BENCH_VECS", "100000"))
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))


def main() -> None:
    from anofox_forecast_spark.bench_util import checksum_count
    from anofox_forecast_spark.session import get_spark
    from anofox_forecast_spark.sources.webtext_synth import (
        synthesize_documents,
        synthesize_embeddings,
    )

    spark = get_spark("anofox-bench-extra", cpus=CPUS, shuffle_partitions=CPUS)
    sc = spark.sparkContext

    docs = synthesize_documents(spark, n_docs=N_DOCS).persist()
    docs.count()
    emb_c = synthesize_embeddings(spark, n_vecs=N_VECS, n_clusters=1000).persist()
    emb_c.count()

    def stage_quality():
        from anofox_forecast_spark.webtext.text_stats import quality_scores

        return quality_scores(docs, "doc_id", "text")

    def stage_lines():
        from anofox_forecast_spark.webtext.dedup import line_dedup

        return line_dedup(docs, "doc_id", "text", tokens_per_line=12)

    def stage_minhash():
        from anofox_forecast_spark.webtext.dedup import minhash_lsh_candidates

        return minhash_lsh_candidates(
            docs, "doc_id", "text", n_hashes=32, bands=8, est_threshold=0.2)

    def stage_simhash():
        from anofox_forecast_spark.webtext.dedup import simhash_near_dups

        return simhash_near_dups(docs, "doc_id", "text", max_hamming=3)

    def stage_repetition():
        from anofox_forecast_spark.webtext.text_stats import repetition_stats

        return repetition_stats(docs, "doc_id", "text")

    def stage_fingerprint():
        from anofox_forecast_spark.webtext.text_stats import fingerprint

        return fingerprint(docs, "doc_id", "text")

    def stage_lm_ppl():
        from anofox_forecast_spark.webtext.lm import lm_perplexity

        return lm_perplexity(docs, "doc_id", "text", hashed=True)

    def stage_dsir():
        from anofox_forecast_spark.webtext.lm import dsir_log_weights

        return dsir_log_weights(
            docs, docs.filter("doc_id % 7 = 0"), "doc_id", "text",
            hash_buckets=1 << 22)

    def stage_corpus_prep():
        from anofox_forecast_spark.webtext.pipeline import prepare_corpus

        domained = docs.withColumn(
            "source", F.concat(F.lit("src"), (F.col("doc_id") % 4)))
        packed, stats = prepare_corpus(
            domained, "doc_id", "text", "source",
            mixture_rates={"src0": 0.8}, default_rate=0.95)
        n = checksum_count(packed)
        stats.collect()
        return n

    def stage_semantic():
        from anofox_forecast_spark.webtext.dedup import semantic_dedup

        return semantic_dedup(emb_c, threshold=0.95, n_cells=256)

    def stage_emb_lsh():
        from anofox_forecast_spark.webtext.dedup import embedding_near_dups

        emb_u = synthesize_embeddings(spark, n_vecs=N_VECS, n_clusters=0,
                                      near_rate=0.08, seed=7)
        return embedding_near_dups(
            emb_u, threshold=0.8, method="lsh", n_planes=16, n_tables=16)

    stages = {
        "quality": stage_quality,
        "lines": stage_lines,
        "minhash": stage_minhash,
        "simhash": stage_simhash,
        "repetition": stage_repetition,
        "fingerprint": stage_fingerprint,
        "lm_ppl": stage_lm_ppl,
        "dsir": stage_dsir,
        "corpus_prep": stage_corpus_prep,
        "semantic": stage_semantic,
        "emb_lsh": stage_emb_lsh,
    }
    want = sys.argv[1:] or list(stages)
    for name in want:
        fn = stages[name]
        times = []
        n = None
        for i in range(REPEATS):
            sc.setJobDescription(f"r06 isolate: {name} #{i}")
            t0 = time.perf_counter()
            out = fn()
            n = out if isinstance(out, int) else checksum_count(out)
            times.append(round(time.perf_counter() - t0, 3))
        sc.setJobDescription(None)
        print(f"{name}: {times} rows={n}", flush=True)


if __name__ == "__main__":
    main()
