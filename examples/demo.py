"""End-to-end demo of akumuli_spark: ingest RESP data through Structured
Streaming, open a Database, and run the reference's query language plus
the training-data operators.

    python examples/demo.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from akumuli_spark import get_spark, open_database  # noqa: E402
from akumuli_spark.output.format import to_csv  # noqa: E402
from akumuli_spark.pipeline import dedup  # noqa: E402
from akumuli_spark.sources.testdata import (  # noqa: E402
    app_metrics_view,
    events_view,
    load_table,
)
from akumuli_spark.streaming.ingest import (  # noqa: E402
    parsed_stream_from_files,
    start_parquet_ingest,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("demo")

    # -- 1. streaming ingestion of RESP PDUs --------------------------------
    tmp = tempfile.mkdtemp()
    os.makedirs(f"{tmp}/in")
    with open(f"{tmp}/in/pdus.txt", "w") as f:
        for i in range(100):
            f.write(f"+cpu.user host=demo\n:{(i + 1) * 10**9}\n:{i}\n")
    q = start_parquet_ingest(
        parsed_stream_from_files(spark, f"{tmp}/in"), f"{tmp}/out", f"{tmp}/chk"
    )
    q.processAllAvailable()
    q.stop()
    print("ingested:", spark.read.parquet(f"{tmp}/out").count(), "samples\n")

    # -- 2. the JSON query language over the testdata views -----------------
    db = open_database(spark, app_metrics_view(spark, SF_DIR), events_view(spark, SF_DIR))
    print("stats:", db.stats())

    res = db.query(
        {
            "group-aggregate": {"metric": "app.click", "step": "1d",
                                "func": ["count", "mean"]},
            "range": {"from": "20240101T000000", "to": "20240108T000000"},
            "where": {"user": ["0", "1"]},
        }
    )
    print("\ngroup-aggregate (first 5 rows as CSV):")
    for line in list(to_csv(res, ["count", "mean"]))[:5]:
        print(" ", line)

    res = db.query(
        {
            "select": "app.purchase",
            "range": {"from": "20240101T000000", "to": "20240201T000000"},
            "apply": [{"name": "top", "N": 3}],
        }
    )
    print("\ntop-3 series by time-weighted purchase volume:")
    for r in res.collect():
        print(f"  {r['series']}: {r['value']:.1f}")

    # -- 3. training-data operators ------------------------------------------
    docs = load_table(spark, SF_DIR, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, n=5, threshold=0.8)
    print("\nminhash-LSH near-duplicate pairs (jaccard ≥ 0.8):", pairs.count())
    spark.stop()


if __name__ == "__main__":
    main()
