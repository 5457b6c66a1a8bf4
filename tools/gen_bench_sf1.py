"""Generate the sf1-equivalent RESOLVING-POWER bench input (VERDICT r14
Next #6): the sf0.1 headline can no longer detect plan wins on the
select/aggregate/join/apply entries — their 8-vs-32-core scaling ratios
sit at ~1, i.e. per-query fixed overhead dominates.  This tool derives a
10×-density variant of the QUERY half's input from the sf0.1 parquet:

* ``lineitem`` rows replicated 10× (the only table the headline metrics
  view reads) — same time range, 10× rows per (series, ts);
* every other table copied byte-compatible (same Spark writer), so the
  text/dedup/ANN/multimodal headline entries run unchanged at their
  sf0.1 size — those already show real compute (scaling 1.45–1.83) and
  replicating documents would manufacture quadratic cross-replica
  near-duplicate blowup, distorting what they measure.

Derived at run time from /root/testdata (read-only source, never
modified); the output is a bench INPUT, not a cached result.

Usage: python tools/gen_bench_sf1.py [dst_dir] [factor]
       (default /root/bench_extra/sf1.0, factor 10)
Then:  SPARK_GRAFT_SF_DIR=<dst> SPARK_GRAFT_HEADLINE_ONLY=1 python bench.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from akumuli_spark.session import get_spark  # noqa: E402
from akumuli_spark.sources.testdata import TABLES  # noqa: E402

SRC = "/root/testdata/sf0.1"


def main() -> None:
    dst = sys.argv[1] if len(sys.argv) > 1 else "/root/bench_extra/sf1.0"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("gen-bench-sf1")
    for t in TABLES:
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        if t == "lineitem":
            df = df.crossJoin(spark.range(factor)).drop("id")
            df = df.repartition(16)
        df.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        print(f"wrote {t}")
    print(f"done: {dst} (lineitem x{factor})")


if __name__ == "__main__":
    main()
