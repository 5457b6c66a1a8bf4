"""End-to-end corpus curation with the round-7 operators — the flow a
100 TB pre-training data pipeline runs, composed from this repo's
oracle-gated pieces:

    documents
      → normalize               (pipeline/text.normalize_text)
      → PII scrub               (pipeline/pii.pii_scrub)
      → quality + repetition gate
      → exact dedup, keep-best  (survivorship by quality)
      → cross-doc span signal   (pipeline/dedup.duplicated_span_coverage)
      → containment filter      (pipeline/dedup.ngram_containment_pairs)
      → DSIR target-likeness    (pipeline/text.dsir_logweights)
      → HLL vocabulary report   (operators/distinct.approx_distinct)
      → deterministic shuffle + shard for training export

Every stage is a lazy DataFrame transformation; nothing but tiny
summaries reaches the driver; re-running reproduces byte-identical
output (all hashes are md5-derived, no RNG).

    python examples/curation_full.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from akumuli_spark import get_spark  # noqa: E402
from akumuli_spark.pipeline import cluster, dedup, pii, text  # noqa: E402
from akumuli_spark.sources.testdata import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("curation-full-demo")
    docs = load_table(spark, SF_DIR, "documents")
    n0 = docs.count()

    # 1. normalize, then scrub PII in the normalized text
    normed = text.normalize_text(docs).select(
        "doc_id", F.col("norm_text").alias("text")
    )
    clean = pii.pii_scrub(normed, text_col="text").select(
        "doc_id", F.col("clean_text").alias("text"),
    )

    # 2. quality + within-doc repetition gates
    q = text.quality_score(clean).select("doc_id", "quality")
    rep = text.repetition_signals(clean).select("doc_id", "rep_2gram_frac")
    gated = (
        clean.join(q, "doc_id").join(rep, "doc_id")
        .filter((F.col("quality") >= 0.3) & (F.col("rep_2gram_frac") < 0.9))
        .select("doc_id", "text")
    )
    n_gated = gated.count()

    # 3. exact dedup with survivorship policy: the BEST-quality copy
    # survives (ties -> smallest id), not simply the first one seen
    keep = (
        dedup.exact_duplicates_keep_best(
            gated.join(q, "doc_id"), score_col="quality"
        )
        .select(F.col("keep_id").alias("doc_id"))
    )
    unique = gated.join(keep, "doc_id")

    # 4. drop docs mostly contained in another surviving doc
    contained = (
        dedup.ngram_containment_pairs(unique, n=5, threshold=0.9, max_df=64)
        .filter(F.col("doc_src") > F.col("doc_dst"))  # keep the older copy
        .select(F.col("doc_src").alias("doc_id")).distinct()
    )
    survivors = unique.join(contained, "doc_id", "left_anti")
    n_survivors = survivors.count()

    # 5. corpus-level boilerplate diagnostic (reported, not filtered)
    span = dedup.duplicated_span_coverage(survivors, n=5)
    boilerplate = span.filter(F.col("dup_span_frac") > 0.5).count()

    # 6. DSIR importance weights toward the 'src0' slice: the
    # target-likeness signal a selection pass samples against
    target = docs.filter(F.col("source") == "src0").select("doc_id", "text")
    dsir = text.dsir_logweights(survivors, target, buckets=256)
    n_targetlike = dsir.filter(F.col("dsir_logw") > 0).count()

    # 7. corpus cardinality report without a distinct shuffle: HLL
    # estimate of the surviving vocabulary
    from akumuli_spark.operators.distinct import approx_distinct

    toks = survivors.select(F.explode(F.split("text", " ")).alias("tok"))
    (vocab_est,) = approx_distinct(toks, "tok", b=12).collect()

    # 8. deterministic shuffle into training shards
    shards = cluster.deterministic_shuffle(survivors, seed="r7", n_shards=8)
    per_shard = shards.groupBy("shard").count().orderBy("shard").collect()

    print(f"documents: {n0} → gated {n_gated} → unique+containment "
          f"{n_survivors}; {boilerplate} boilerplate-flagged; "
          f"{n_targetlike} target-like; "
          f"~{vocab_est['approx_distinct']:.0f} distinct tokens")
    for r in per_shard:
        print(f"  shard {r['shard']}: {r['count']} docs")


if __name__ == "__main__":
    main()
