"""Dual-schema regression pin for ``events.ts``.

The driver has generated ``events.parquet`` with two different physical
timestamp types across rounds: TIMESTAMP(NANOS) (rounds 1-4; Spark 4 reads
it only as long ns under ``spark.sql.legacy.parquet.nanosAsLong``) and
TIMESTAMP(MICROS) (round 5+; Spark reads it as TIMESTAMP_NTZ).  Either may
come back in a future regeneration, so ``ts_ns_expr``
(akumuli_spark/sources/testdata.py) must keep normalizing both onto the
same µs-truncated int64-ns axis.  This test writes the SAME logical rows
under both physical schemas and asserts bit-identical ts_ns output and
agreement with DuckDB's ``epoch_ns``.
"""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from akumuli_spark.sources.testdata import ts_ns_expr

# logical instants (ns since epoch, UTC) with sub-µs noise in the ns rows to
# prove the µs truncation; the µs file stores the same instants truncated.
_NS_VALUES = [
    1_577_836_800_000_000_000,  # 2020-01-01T00:00:00
    1_577_836_800_123_456_789,  # sub-µs tail 789 must truncate away
    1_700_000_000_999_999_001,
    1_000_000_000_000_001_000,
]


def _write_both(tmpdir: str) -> tuple[str, str]:
    ns_path = os.path.join(tmpdir, "events_ns.parquet")
    us_path = os.path.join(tmpdir, "events_us.parquet")
    ids = list(range(len(_NS_VALUES)))
    t_ns = pa.table(
        {"row_id": ids, "ts": pa.array(_NS_VALUES, type=pa.timestamp("ns"))}
    )
    # version='2.6' keeps TIMESTAMP(NANOS) physical type (no µs coercion)
    pq.write_table(t_ns, ns_path, version="2.6")
    t_us = pa.table(
        {
            "row_id": ids,
            "ts": pa.array([v // 1000 for v in _NS_VALUES], type=pa.timestamp("us")),
        }
    )
    pq.write_table(t_us, us_path, version="2.6")
    return ns_path, us_path


@pytest.fixture(scope="module")
def both_paths(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dual_schema"))
    return _write_both(d)


def _physical_type(path: str) -> str:
    col = pq.ParquetFile(path).schema_arrow.field("ts").type
    return str(col)


def test_files_really_carry_both_schemas(both_paths):
    ns_path, us_path = both_paths
    assert _physical_type(ns_path) == "timestamp[ns]"
    assert _physical_type(us_path) == "timestamp[us]"


def test_ts_ns_expr_identical_across_schemas(spark, both_paths):
    ns_path, us_path = both_paths
    expected = [(i, (v // 1000) * 1000) for i, v in enumerate(_NS_VALUES)]
    for path in both_paths:
        df = spark.read.parquet(path)
        got = sorted(
            (r["row_id"], r["ts_ns"])
            for r in df.select("row_id", ts_ns_expr(df).alias("ts_ns")).collect()
        )
        assert got == expected, f"mismatch for {path} ({_physical_type(path)})"


def test_ts_ns_expr_matches_duckdb_epoch_ns(both_paths):
    # the oracle side: DuckDB reads both files and epoch_ns agrees with the
    # expected µs-truncated axis (DuckDB TIMESTAMP is µs-resolution, so the
    # ns file is truncated on read — exactly what ts_ns_expr mirrors).
    con = duckdb.connect()
    expected = sorted((i, (v // 1000) * 1000) for i, v in enumerate(_NS_VALUES))
    for path in both_paths:
        got = sorted(
            (int(a), int(b))
            for a, b in con.sql(
                f"SELECT row_id, epoch_ns(ts) FROM read_parquet('{path}')"
            ).fetchall()
        )
        assert got == expected, f"duckdb mismatch for {path}"
    con.close()


def test_ts_ns_expr_handles_date_regeneration(spark, tmp_path):
    """If a future testdata regeneration downgrades a timestamp column to
    parquet DATE (as happened µs↔ns for events.ts), ts_ns_expr's NTZ
    fallback must still land on the DuckDB epoch_ns axis: midnight UTC of
    the stored day."""
    import datetime

    path = str(tmp_path / "dates.parquet")
    days = [datetime.date(1996, 1, 1), datetime.date(2024, 2, 29)]
    pq.write_table(
        pa.table({"row_id": [0, 1], "ts": pa.array(days, type=pa.date32())}),
        path,
    )
    df = spark.read.parquet(path)
    got = sorted(
        (r["row_id"], r["ts_ns"])
        for r in df.select("row_id", ts_ns_expr(df).alias("ts_ns")).collect()
    )
    con = duckdb.connect()
    want = sorted(
        (int(a), int(b))
        for a, b in con.sql(
            f"SELECT row_id, epoch_ns(ts) FROM read_parquet('{path}')"
        ).fetchall()
    )
    con.close()
    assert got == want
    assert got[0][1] == 820454400 * 10**9  # 1996-01-01T00:00:00Z


def test_dtype_branch_is_plan_time(spark, both_paths):
    """The schema branch happens at plan build (dtype inspection), not via a
    per-row CASE: the generated expression for the long-ns file must not
    reference unix_micros, and vice versa."""
    ns_path, us_path = both_paths
    ns_df = spark.read.parquet(ns_path)
    us_df = spark.read.parquet(us_path)
    assert dict(ns_df.dtypes)["ts"] in ("bigint", "long")
    assert dict(us_df.dtypes)["ts"].startswith("timestamp")
    ns_sql = str(ts_ns_expr(ns_df)._jc)
    us_sql = str(ts_ns_expr(us_df)._jc)
    assert "unix_micros" not in ns_sql
    assert "div" in ns_sql
    assert "unix_micros" in us_sql


def test_pipeline_table_contracts(spark):
    """Pin the driver-table shapes the pipeline operators depend on, so
    a testdata regeneration that changes them fails HERE with a clear
    message instead of as an opaque oracle hash mismatch.

    * documents: ids unique; text non-null ASCII (the PII/multimodal
      oracles equate DuckDB length() with byte length — r6's BMP-oracle
      lesson, generalized); lang in the marker-lexicon universe.
    * embeddings: ids unique; fixed dimension; no null/NaN components
      (sign-LSH and cosine paths assume finite floats).
    * events: props is a JSON object with a numeric $.k (the
      events_props_json oracle extracts it typed).
    """
    import math
    import os

    from pyspark.sql import functions as F

    from akumuli_spark.pipeline.text import LANG_MARKERS
    from akumuli_spark.sources.testdata import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    n = docs.count()
    assert docs.select("doc_id").distinct().count() == n
    assert docs.filter(F.col("text").isNull()).count() == 0
    non_ascii = docs.filter(
        F.length(F.col("text")) != F.octet_length(F.col("text"))
    ).count()
    assert non_ascii == 0, (
        "documents.text is no longer pure ASCII — the PII/multimodal "
        "oracles' length()==octet_length() assumption breaks"
    )
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    assert langs <= set(LANG_MARKERS), langs

    embs = load_table(spark, SF_DIR, "embeddings")
    m = embs.count()
    assert embs.select("vec_id").distinct().count() == m
    dims = embs.select(F.size("embedding").alias("d")).distinct().collect()
    assert [r["d"] for r in dims] == [64], "embedding dimension changed"
    bad = embs.filter(
        F.exists("embedding", lambda x: x.isNull() | F.isnan(x))
    ).count()
    assert bad == 0, "null/NaN embedding components"

    events = load_table(spark, SF_DIR, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("double")
    assert events.filter(F.col("props").isNull()).count() == 0
    assert events.filter(k.isNull()).count() == 0, (
        "events.props no longer carries a numeric $.k — the "
        "events_props_json oracle's field extraction breaks"
    )
