"""Training-mix pipeline demo: compose the training-data operators into
the standard corpus-curation flow —

    documents
      → quality filter          (pipeline/text.quality_score)
      → near-dup clustering     (pipeline/cluster.dedup_clusters)
      → keep canonical survivor per cluster
      → semantic dedup          (pipeline/cluster.semantic_clusters)
      → mixture planning        (pipeline/cluster.mixture_plan)
      → deterministic stratified sample at the planned rates
      → token-budget accounting (pipeline/text.token_counts)

Every stage is a DataFrame transformation — one lazily-composed plan per
stage, no driver-side data (except the component loop's convergence
counts), reproducible end-to-end: re-running yields the byte-identical
corpus, and raising any sampling rate strictly grows the previous one.

For the gate → exact-dedup → sample portion of this flow there is also a
pre-composed single-plan operator, ``pipeline.text.curate_corpus`` (one
scan, one shuffle, oracle-gated as the ``curate_corpus`` registry
entry); this demo keeps the stages explicit to show the composition.

    python examples/training_mix.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from akumuli_spark import get_spark  # noqa: E402
from akumuli_spark.pipeline import cluster, text  # noqa: E402
from akumuli_spark.sources.testdata import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

#: target mixture weights + token budget — mixture_plan turns these
#: into the per-language rates the stratified sampler consumes
WEIGHTS = {"en": 0.5, "de": 0.15, "fr": 0.1, "es": 0.1, "zh": 0.15}
BUDGET_TOKENS = 2_000

QUALITY_FLOOR = 0.35


def main() -> None:
    spark = get_spark("training-mix-demo")
    docs = load_table(spark, SF_DIR, "documents")
    n_total = docs.count()

    # 1. quality floor — drop boilerplate/repetitive docs
    quality = text.quality_score(docs)
    good = docs.join(
        quality.filter(F.col("quality") >= QUALITY_FLOOR).select("doc_id"),
        "doc_id",
    )

    # 2. near-dup clusters over the quality-passed corpus; keep the
    #    canonical survivor of each duplicate group
    clusters = cluster.dedup_clusters(good, n=5, threshold=0.5, max_df=64)
    canonical = good.join(
        clusters.filter("is_canonical").select("doc_id"), "doc_id"
    )

    # 3a. semantic dedup on the embedding side: prune near-copies the
    #     text-shingle clusters cannot see (paraphrases, re-encodes)
    embs = load_table(spark, SF_DIR, "embeddings")
    sem = cluster.semantic_clusters(embs, nlist=16, threshold=0.4)
    sem_keep = sem.filter("is_canonical").select(
        F.col("vec_id").alias("doc_id")
    )
    canonical = canonical.join(sem_keep, "doc_id", "left_semi")

    # 3b. size the mix: token budget + target weights → per-language
    #     rates (mixture_plan), then the deterministic stratified sample
    #     consumes those rates verbatim
    plan = cluster.mixture_plan(canonical, WEIGHTS, BUDGET_TOKENS)
    rates = {r["stratum"]: r["rate"] for r in plan.collect()}
    sampled = cluster.stratified_sample(canonical, rates)
    final = canonical.join(sampled.select("doc_id"), "doc_id")

    # 4. token-budget accounting for the final mix
    budget = (
        text.token_counts(final)
        .join(final.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("docs"),
            F.sum("n_ws_tokens").alias("ws_tokens"),
            F.sum("n_bpe_tokens").alias("bpe_tokens"),
        )
        .orderBy("lang")
    )

    n_good = good.count()
    n_canon = canonical.count()
    rows = budget.collect()
    n_final = sum(r["docs"] for r in rows)
    print(f"corpus: {n_total} docs -> quality>={QUALITY_FLOOR}: {n_good} "
          f"-> canonical: {n_canon} -> sampled mix: {n_final}")
    for r in rows:
        print(f"  {r['lang']}: {r['docs']} docs, {r['ws_tokens']} ws tokens, "
              f"{r['bpe_tokens']} bpe tokens")


if __name__ == "__main__":
    main()
