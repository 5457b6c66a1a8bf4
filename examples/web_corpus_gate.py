"""Web-corpus intake with the round-8 quality layer — the FineWeb-style
front half of a crawl pipeline, composed from this repo's oracle-gated
pieces:

    crawl batches (streamed)
      → Bloom seen-gate          (streaming/membership.bloom_gate_batch —
                                  never-seen fingerprints pass, the filter
                                  learns them; append-only delta store)
      → Gopher quality rules     (pipeline/quality.gopher_quality_flags —
                                  word/line/symbol/stop-word heuristics)
      → line-repetition gate     (pipeline/quality.line_repetition_signals)
      → paragraph dedup          (pipeline/quality.dedup_paragraphs —
                                  global first-occurrence keep + rebuild)
      → span scrub               (pipeline/dedup.scrub_duplicated_spans —
                                  cut cross-doc duplicated n-grams)

Every stage is a DataFrame transformation; the Bloom store is the only
state and it is a mergeable (word_idx, bits) table.  Deterministic end
to end — re-running reproduces byte-identical survivors.

    python examples/web_corpus_gate.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from akumuli_spark import get_spark  # noqa: E402
from akumuli_spark.pipeline import dedup, quality  # noqa: E402
from akumuli_spark.sources.testdata import load_table  # noqa: E402
from akumuli_spark.streaming.membership import (  # noqa: E402
    bloom_gate_batch,
    compact_bloom_store,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("web-corpus-gate-demo")
    docs = load_table(spark, SF_DIR, "documents")
    store = tempfile.mkdtemp(prefix="bloom_store_") + "/filter"

    # ---- crawl arrives in batches; the Bloom gate drops re-crawls ----
    # (second batch overlaps the first by construction: re-crawled URLs)
    b1 = docs.filter(F.col("doc_id") % 3 != 2)
    b2 = docs.filter(F.col("doc_id") % 3 != 0)  # overlaps b1 on %3==1
    passed = []
    for i, b in enumerate((b1, b2)):
        keyed = b.withColumn("fingerprint", F.md5("text"))
        out = bloom_gate_batch(spark, keyed, store)
        passed.append(out.select("doc_id", "text"))
        print(f"batch {i}: {b.count()} arrived, {out.count()} never-seen")
    print("bloom store rows after compaction:",
          compact_bloom_store(spark, store))
    fresh = passed[0].unionByName(passed[1])

    # ---- rule gates: Gopher quality + line repetition ----
    flags = quality.gopher_quality_flags(fresh)
    reps = quality.line_repetition_signals(fresh)
    kept_ids = (
        flags.filter(F.col("n_words") >= 30)  # relaxed for the tiny demo SF
        .join(reps.filter(F.col("dup_line_frac") <= 0.3), "doc_id")
        .select("doc_id")
    )
    gated = fresh.join(kept_ids, "doc_id")
    print(f"rule gates: {fresh.count()} -> {gated.count()} docs")

    # ---- paragraph dedup (2-word pseudo-lines for the demo corpus) ----
    paras = quality.dedup_paragraphs(
        quality.with_word_chunk_lines(gated, 12)
    )
    rebuilt = paras.filter(F.col("n_kept") > 0).select(
        "doc_id", F.col("text_clean").alias("text")
    )
    dropped = paras.filter(F.col("n_kept") == 0).count()
    print(f"paragraph dedup: {dropped} fully-duplicated docs emptied")

    # ---- cross-document span scrub ----
    scrubbed = dedup.scrub_duplicated_spans(rebuilt, n=5)
    stats = scrubbed.agg(
        F.sum("n_tokens").alias("toks_in"),
        F.sum("n_kept").alias("toks_out"),
    ).collect()[0]
    print(
        f"span scrub: {stats['toks_in']} tokens -> {stats['toks_out']} "
        f"({stats['toks_in'] - stats['toks_out']} duplicated-span tokens cut)"
    )
    shutil.rmtree(os.path.dirname(store), ignore_errors=True)


if __name__ == "__main__":
    main()
