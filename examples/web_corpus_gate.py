"""Web-corpus intake with the round-8 quality layer — the FineWeb-style
front half of a crawl pipeline, composed from this repo's oracle-gated
pieces:

    crawl batches (streamed)
      → Bloom seen-gate          (streaming/membership.bloom_gate_batch —
                                  never-seen fingerprints pass, the filter
                                  learns them; append-only delta store)
      → in-doc boilerplate strip (pipeline/quality.dedup_lines_within_doc —
                                  repeated nav/footer lines cut, no shuffle)
      → Gopher quality rules     (pipeline/quality.gopher_quality_flags —
                                  word/line/symbol/stop-word heuristics)
      → line-repetition gate     (pipeline/quality.line_repetition_signals)
      → paragraph dedup          (pipeline/quality.dedup_paragraphs —
                                  global first-occurrence keep + rebuild)
      → substring scrub          (pipeline/dedup.scrub_substring_spans —
                                  maximal repeated spans >= min_len,
                                  keep-first survivorship)
      → fuzzy decontamination    (pipeline/dedup.fuzzy_decontaminate —
                                  drop near-dups of benchmark docs)
      → shard export + manifest  (pipeline/cluster.export_jsonl_shards —
                                  the integrity-checked hand-off)

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
from akumuli_spark.pipeline import cluster, dedup, quality  # noqa: E402
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

    # ---- in-document boilerplate strip (zero shuffle) ----
    fresh = quality.dedup_lines_within_doc(fresh).filter(
        F.col("n_kept") > 0
    ).select("doc_id", F.col("text_clean").alias("text"))

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

    # ---- exact substring scrub (true maximal spans, keep one copy) ----
    # keep='first': each verbatim-repeated span of >=10 tokens survives
    # in its earliest document only — the production survivorship rule;
    # sub-threshold incidental matches are left alone (unlike the
    # fixed-width scrub_duplicated_spans pass)
    scrubbed = dedup.scrub_substring_spans(
        rebuilt, n=5, min_len=10, keep="first"
    )
    stats = scrubbed.agg(
        F.sum("n_tokens").alias("toks_in"),
        F.sum("n_kept").alias("toks_out"),
    ).collect()[0]
    print(
        f"substring scrub: {stats['toks_in']} tokens -> {stats['toks_out']} "
        f"({stats['toks_in'] - stats['toks_out']} repeated-span tokens cut)"
    )
    final = scrubbed.filter(F.col("n_kept") > 0).select(
        "doc_id", F.col("text_clean").alias("text")
    )

    # ---- fuzzy decontamination vs a held-out "benchmark" slice ----
    # (normalized through the same line treatment as the corpus: shingles
    # are whitespace-split, so the two sides must tokenize identically)
    bench = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    final_ws = final.select(
        "doc_id", F.expr("replace(text, chr(10), ' ')").alias("text")
    )
    flagged = dedup.fuzzy_decontaminate(final_ws, bench, n=5, threshold=0.5)
    flagged_ids = flagged.select("doc_id").distinct()
    clean = final.join(flagged_ids, "doc_id", "left_anti")
    print(f"decontamination: {flagged_ids.count()} near-benchmark docs dropped")

    # ---- shard export with integrity manifest ----
    out_dir = tempfile.mkdtemp(prefix="corpus_export_")
    manifest = cluster.export_jsonl_shards(clean, out_dir, n_shards=8)
    print("export manifest:")
    for r in sorted(manifest.collect(), key=lambda r: r["shard"])[:3]:
        print(f"  shard {r['shard']}: {r['n_rows']} rows, "
              f"{r['n_chars']} chars, sum {r['content_sum']}")
    shutil.rmtree(out_dir, ignore_errors=True)
    shutil.rmtree(os.path.dirname(store), ignore_errors=True)


if __name__ == "__main__":
    main()
