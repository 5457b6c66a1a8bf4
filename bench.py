"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end through the noop sink so the timing covers
the full plan (scan → shuffle → sort), not just the driver-side head.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from akumuli_spark import registry  # noqa: E402
from akumuli_spark.session import get_spark  # noqa: E402

#: headline queries: one per operator family, weighted toward the
#: shuffle-heavy plans that dominate at scale
HEADLINE = [
    "select_fwd",
    "select_value_filter",
    "aggregate_all_funcs",
    "group_aggregate",
    "group_aggregate_bwd",
    "join_metrics",
    "group_aggregate_join",
    "apply_rate",
    "apply_cusum",
    "apply_ewma",
    "apply_top",
    "apply_eval_revenue",
    "apply_heavy_hitters",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_cosine_topk",
    "text_quality",
    "multimodal_decode",
]


def run_one(spark, fn, sf_dir: str) -> float:
    t0 = time.time()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    spark = get_spark("akumuli-spark-bench")
    qs = registry.queries()

    # warm-up: JVM codegen/JIT + parquet footers for every table the
    # headline queries touch, so timings reflect steady state rather than
    # first-query class-loading
    for tbl in ("lineitem", "events", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{tbl}.parquet").count()
    run_one(spark, qs["select_value_filter"], sf_dir)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = round(run_one(spark, qs[name], sf_dir), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
