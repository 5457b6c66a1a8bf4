"""Physical-plan audit for the headline queries.

Asserts the plan-shape invariants the engine is designed around, per
query, and prints one line each:

* no ``CartesianProduct`` anywhere (broadcast nested-loop joins against
  one-row/broadcast frames are allowed — those are the documented
  broadcast-small cross joins);
* at least one ``WholeStageCodegen`` span (expressions stay JVM-side);
* the number of ``Exchange`` (shuffle) nodes, reported so regressions in
  shuffle count are visible round over round;
* for the production-layout path: non-empty ``PartitionFilters`` on the
  scan (partition pruning reaches the reader).

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from akumuli_spark import registry  # noqa: E402
from akumuli_spark.session import get_spark  # noqa: E402
from bench import HEADLINE  # noqa: E402


def plan_of(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def audit_one(name: str, df) -> tuple[bool, str]:
    plan = plan_of(df)
    problems = []
    if "CartesianProduct" in plan:
        problems.append("CartesianProduct")
    # a shuffle that funnels the full data through one task is a scale-killer
    # (global no-partition windows/sorts produce these).  Benign exception:
    # the final step of a global scalar aggregate — its child is a PARTIAL
    # HashAggregate, so the single partition receives one row per upstream
    # partition, not the data.  TakeOrderedAndProject and broadcast exchanges
    # are the other sanctioned alternatives and don't emit SinglePartition.
    single_ids = {
        m.group(1)
        for m in re.finditer(
            r"^\((\d+)\) Exchange\nArguments: SinglePartition", plan, re.M
        )
    }
    for sid in single_ids:
        tree_m = re.search(rf"^(\s*)(?:[+:]-\s*)?Exchange \({sid}\)\s*$", plan, re.M)
        child_is_partial_agg = False
        if tree_m:
            rest = plan[tree_m.end():]
            child_m = re.search(r"^\s*(?:[+:]-\s*|\*\s*)*([A-Za-z]+)", rest, re.M)
            child_is_partial_agg = bool(
                child_m and "Aggregate" in child_m.group(1)
            )
        if not child_is_partial_agg:
            problems.append(f"single-partition Exchange ({sid})")
    # formatted mode marks whole-stage-codegen membership per node as
    # "[codegen id : N]"
    if "codegen id" not in plan:
        problems.append("no WholeStageCodegen")
    # node-detail headers "(N) Exchange" appear exactly once per node
    # (the tree spells them "Exchange (N)")
    n_exchange = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    ok = not problems
    detail = f"shuffles={n_exchange}" + (
        f" PROBLEMS: {', '.join(problems)}" if problems else ""
    )
    return ok, detail


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("akumuli-plan-audit")
    # audit the static plan: AQE wraps everything in AdaptiveSparkPlan
    # (isFinalPlan=false) whose formatted output carries no codegen
    # annotations until execution
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    qs = registry.queries()
    failures = 0
    # HEADLINE plus scale-sensitive queries the bench doesn't time
    audited = [*HEADLINE, "ann_ivf_topk", "ann_lsh_topk",
               "decontaminate_ngram", "sample_stratified",
               "apply_anomaly_ewma_sketch",
               "apply_frequent_items_sketch", "apply_heavy_hitters_sketch",
               "multimodal_decode_bmp", "multimodal_decode_jpeg",
               "multimodal_decode_png", "multimodal_decode_wav",
               "text_repetition", "corpus_report", "curate_corpus",
               "candlesticks",
               "pii_signals", "pii_scrub", "dedup_span_coverage",
               "corpus_shuffle", "events_props_json", "vocab_topk",
               "corpus_length_quantiles", "ann_ivf_indexed", "events_funnel",
               "events_retention", "text_normalize", "dedup_containment",
               "group_aggregate_filled", "top_series_per_bucket",
               "lttb_downsample", "join_asof", "join_asof_tolerance",
               "apply_counter_rate", "group_aggregate_percentiles",
               "text_perplexity", "value_histogram", "metrics_correlation",
               "events_active_users", "kmeans_lloyd_step",
               "bpe_pair_counts", "dedup_semantic", "text_classifier_score",
               "sample_quota", "sample_mixture_plan",
               "dedup_semantic_clusters", "dedup_semantic_indexed",
               "events_distinct_users_hll", "text_distinct_tokens_hll",
               "text_tfidf_topk", "join_interval",
               "multimodal_resize", "multimodal_frame_sample",
               "dedup_exact_keep_best", "events_transitions",
               "text_dsir_weights", "metrics_correlation_lagged",
               "text_entropy", "events_quantiles_sketch",
               "session_sequences", "multimodal_features",
               "join_interval_anti", "text_dsir_resample",
               "pack_materialize", "ann_ivf_append",
               "dedup_minhash_incremental", "dedup_simhash_incremental",
               "multimodal_decode_dirty", "ann_ivf_batch",
               "dedup_embedding_lsh_multi", "metrics_tag_rollup",
               "bpe_tokenize_counts",
               "text_gopher_quality", "text_line_repetition",
               "dedup_paragraphs", "ann_pq_topk", "ann_ivfadc",
               "dedup_scrub_spans", "ann_ivfadc_indexed",
               "ann_ivfadc_append", "dedup_bloom_probe",
               "decontaminate_fuzzy", "curate_gopher_paragraphs",
               "ann_pq_refined", "sample_cluster_balanced",
               "export_manifest", "dedup_lines_within_doc",
               "dedup_clusters_keep_best",
               "dedup_simhash_h9", "dedup_substring_spans",
               "dedup_scrub_substring", "dedup_substring_within",
               "dedup_scrub_substring_keepfirst", "text_bm25_topk",
               "multimodal_image_dhash", "multimodal_image_near_dup",
               "multimodal_audio_fingerprint", "multimodal_audio_near_dup",
               "multimodal_decode_avi", "multimodal_decode_webp",
               "multimodal_video_frame_sample",
               "multimodal_video_fingerprint", "mine_triplets",
               "multimodal_image_dedup_incremental", "text_bm25_indexed",
               "text_bm25_indexed_df", "text_bm25_append",
               "retrieval_hybrid_rrf", "multimodal_image_dhash_payload",
               "retrieval_hybrid_rrf_indexed", "text_phrase_match",
               "text_phrase_indexed",
               "zorder_select_time_slice", "zorder_group_aggregate",
               "zorder_database_select_where", "zorder_corpus_gate",
               "sketch_store_distinct_range", "sketch_store_quantiles_range",
               "group_aggregate_tiered", "bucketed_join_docs_embeddings",
               "zorder_optimize_select", "sketch_store_distinct_tiered",
               "sketch_store_quantiles_tiered",
               "curate_embedding_gate_bucketed",
               "multimodal_image_dhash_payload_jpeg_progressive",
               # (multimodal_decode_report is oracle- and robustness-
               # gated but not plan-audited: its plan is MapInPandas →
               # two-phase hash agg with no JVM expression stage, so
               # the codegen-span heuristic has nothing to check)
               "zorder_uri_append_select",
               "multimodal_decode_gif",
               "multimodal_image_dhash_payload_gif",
               "multimodal_image_dhash_payload_png_variants",
               "zorder_cas_lifecycle_select",
               "zorder_catalog_routed_select"]
    for name in audited:
        ok, detail = audit_one(name, qs[name](spark, sf_dir))
        print(f"{'OK  ' if ok else 'FAIL'} {name}: {detail}")
        failures += 0 if ok else 1

    # layout path: partition pruning must reach the scan
    import tempfile

    from akumuli_spark.query.engine import execute_query
    from akumuli_spark.query.plan import parse_timestamp_ns
    from akumuli_spark.sources.layout import read_metrics_table, write_metrics_table
    from akumuli_spark.sources.testdata import metrics_view

    t96 = parse_timestamp_ns("19960101T000000")
    t96_feb = parse_timestamp_ns("19960201T000000")
    path = os.path.join(tempfile.gettempdir(), "akumuli_audit_layout")
    write_metrics_table(metrics_view(spark, sf_dir), path,
                        bucket_ns=90 * 86_400 * 10**9)
    table = read_metrics_table(spark, path)
    df = execute_query(
        spark,
        {"select": "lineitem.price", "range": {"from": t96, "to": t96_feb}},
        table,
    )
    plan = plan_of(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    pruned = bool(m and m.group(1).strip())
    print(f"{'OK  ' if pruned else 'FAIL'} layout_select: "
          f"PartitionFilters=[{m.group(1).strip() if m else ''}]")
    failures += 0 if pruned else 1

    import shutil

    shutil.rmtree(path, ignore_errors=True)

    # z-order store: manifest file skipping must fire on BOTH dimensions
    # — a series-equality probe AND a time slice across all series (the
    # case the (series, ts) sort cannot file-prune).  Same store shape
    # as the registry entries (year buckets, 4 files/partition).
    from akumuli_spark.sources.zorder import zorder_metrics_table, zorder_select

    year_ns = 365 * 86_400 * 10**9
    zpath = os.path.join(tempfile.gettempdir(), "akumuli_audit_zorder")
    shutil.rmtree(zpath, ignore_errors=True)
    zorder_metrics_table(spark, metrics_view(spark, sf_dir), zpath,
                         bucket_ns=year_ns, files_per_partition=4)
    n_zfail = 0
    for label, kw in (
        ("zorder_series_probe",
         dict(metric="lineitem.price",
              series="lineitem.price linestatus=O returnflag=N")),
        ("zorder_time_slice",
         dict(metric="lineitem.qty",
              ts_from=t96 + 100 * 86_400 * 10**9,
              ts_to=t96 + 107 * 86_400 * 10**9)),
    ):
        st: dict = {}
        zorder_select(spark, zpath, stats=st, **kw)
        ok = 0 < st["files_selected"] < st["files_total"]
        print(f"{'OK  ' if ok else 'FAIL'} {label}: "
              f"files {st['files_selected']}/{st['files_total']} scanned")
        n_zfail += 0 if ok else 1
    failures += n_zfail
    shutil.rmtree(zpath, ignore_errors=True)

    # sketch rollup serving: the covered ts_bucket range must reach the
    # partial scans as PARTITION pruning (never a post-scan filter)
    from akumuli_spark.sources.sketch_store import (
        build_sketch_store,
        distinct_over_range,
        quantiles_over_range,
    )
    from akumuli_spark.sources.testdata import load_table, ts_ns_expr

    e0 = 1_704_067_200 * 10**9  # 2024-01-01, the events epoch
    day = 86_400 * 10**9
    spath = os.path.join(tempfile.gettempdir(), "akumuli_audit_sketch")
    shutil.rmtree(spath, ignore_errors=True)
    ev = load_table(spark, sf_dir, "events")
    build_sketch_store(
        ev.withColumn("ts_ns", ts_ns_expr(ev, "ts")), spath,
        group_col="event_type", distinct_col="user_id", value_col="value",
    )
    n_sfail = 0
    for label, df in (
        ("sketch_distinct_serve",
         distinct_over_range(spark, spath, e0 + 7 * day, e0 + 21 * day)),
        ("sketch_quantiles_serve",
         quantiles_over_range(spark, spath, e0 + 7 * day, e0 + 21 * day,
                              [0.5, 0.99])),
    ):
        plan = plan_of(df)
        seg = plan.split("PartitionFilters", 1)
        ok = len(seg) > 1 and "ts_bucket" in seg[1][:300]
        print(f"{'OK  ' if ok else 'FAIL'} {label}: "
              f"ts_bucket partition pruning "
              f"{'present' if ok else 'MISSING'}")
        n_sfail += 0 if ok else 1
    failures += n_sfail
    shutil.rmtree(spath, ignore_errors=True)

    # bucketed co-located join: zero Exchange nodes when both sides are
    # same-bucketed (broadcast disabled — at corpus scale neither side
    # broadcasts, which is the regime bucketing exists for)
    from akumuli_spark.registry import _bucketed_tables
    from akumuli_spark.sources.bucketed import bucketed_join

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        from akumuli_spark.sources.bucketed import curate_embedding_gate

        lt, rt = _bucketed_tables(spark, sf_dir)
        for label, bdf in (
            ("bucketed_join", bucketed_join(spark, lt, rt)),
            # the consuming pipeline op must stay zero-Exchange
            # END-TO-END: co-located join + narrow codegen gates
            ("curate_embedding_gate",
             curate_embedding_gate(spark, lt, rt,
                                   n_chars_lo=100, n_chars_hi=300)),
        ):
            bplan = bdf._jdf.queryExecution().executedPlan().toString()
            n_ex = bplan.count("Exchange")
            ok = n_ex == 0
            print(f"{'OK  ' if ok else 'FAIL'} {label}: "
                  f"Exchanges={n_ex} (need 0)")
            failures += 0 if ok else 1
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    # BM25 serving: static term-bucket pruning must reach BOTH scans —
    # postings AND dfreq (VERDICT r9 Next #2) — on the literal-list path
    # and on the DataFrame-query path (bounded distinct-bucket collect)
    n_bm25_fail = 0
    for entry in ("text_bm25_indexed", "text_bm25_indexed_df"):
        bplan = plan_of(qs[entry](spark, sf_dir))
        pruned_scans = sum(
            "term_bucket" in seg[:250]
            for seg in bplan.split("PartitionFilters")[1:]
        )
        ok = pruned_scans >= 2
        print(f"{'OK  ' if ok else 'FAIL'} {entry}_pruning: "
              f"bucket-pruned scans={pruned_scans} (need postings+dfreq)")
        n_bm25_fail += 0 if ok else 1
    failures += n_bm25_fail

    print(f"\n{len(audited) + 9 - failures} ok, {failures} failing")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
