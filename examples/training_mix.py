"""Training-mix pipeline demo: compose the training-data operators into
the standard corpus-curation flow —

    documents
      → quality filter          (pipeline/text.quality_score)
      → near-dup clustering     (pipeline/cluster.dedup_clusters)
      → keep canonical survivor per cluster
      → deterministic stratified sample by language
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

#: per-language sampling rates for the target mix
MIX = {"en": 0.8, "de": 0.5, "fr": 0.5, "es": 0.5, "zh": 0.3}

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

    # 3. deterministic stratified sample on the *stored* language label
    #    (swap in text.language_id(...) for unlabeled corpora)
    sampled = cluster.stratified_sample(canonical, MIX)
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
