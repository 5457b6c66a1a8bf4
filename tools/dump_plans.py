"""Dump `.explain("formatted")` for registry queries to plans/<dir>/.

Usage: python tools/dump_plans.py <out_dir> <suffix> <name>...
e.g.   python tools/dump_plans.py plans/r14 after aggregate_all_funcs join_metrics

Writes plans/r14/<name>_<suffix>.txt for each query name, using
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) — the same frames the
bench times, so the committed plan files match the bench's plan digests.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from akumuli_spark import registry  # noqa: E402
from akumuli_spark.session import get_spark  # noqa: E402


def formatted(df) -> str:
    jqe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    return jqe.explainString(mode.fromString("formatted"))


def main() -> None:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("akumuli-dump-plans")
    qs = registry.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(formatted(df))
        print("wrote", path, file=sys.stderr)


if __name__ == "__main__":
    main()
