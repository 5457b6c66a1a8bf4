"""High-cardinality series analogue of the reference's
functests/test_high_cardinality.py: ingest a corpus with 100 k DISTINCT
series (the reference writes 1 M series, 10 samples each, then asserts
``meta:names`` returns every one), and prove the metadata surface —
series-dim derivation, meta:names, suggest — and a per-series select
stay correct and fully distributed (no driver-side series registry).

The frame is synthesized with spark.range (distributed, no driver
list), the same tag rotation shape as the reference's generator:
tag1 is constant, tag2 is the unique per-series value."""

from __future__ import annotations

from pyspark.sql import functions as F

from akumuli_spark.query.metadata import search, suggest
from akumuli_spark.sources.testdata import series_dim

N_SERIES = 100_000
PER_SERIES = 5


def _frame(spark):
    return (
        spark.range(N_SERIES * PER_SERIES)
        .select(
            F.concat(
                F.lit("test tag1=A tag2="),
                (F.col("id") % N_SERIES).cast("string"),
            ).alias("series"),
            F.lit("test").alias("metric"),
            F.create_map(
                F.lit("tag1"), F.lit("A"),
                F.lit("tag2"), (F.col("id") % N_SERIES).cast("string"),
            ).alias("tags"),
            (F.lit(10**15) + F.col("id") * F.lit(10**6)).alias("ts_ns"),
            (F.col("id") % 97).cast("double").alias("value"),
        )
    )


def test_meta_names_returns_every_series(spark):
    dim = series_dim(_frame(spark))
    out = search(dim, {"select": "meta:names"})
    assert out.count() == N_SERIES
    # endpoints of the sorted name list, the reference's full-equality
    # check scoped to a spot-checkable form
    first = out.limit(1).collect()[0]["name"]
    assert first == "test tag1=A tag2=0"
    # membership for an arbitrary mid-range series
    assert out.filter(F.col("name") == "test tag1=A tag2=54321").count() == 1


def test_suggest_tag_values_at_cardinality(spark):
    dim = series_dim(_frame(spark))
    vals = suggest(
        dim,
        {"select": "tag-values", "metric": "test", "tag": "tag2",
         "starts-with": "1234"},
    )
    # values with prefix "1234": 1234 and 12340..12349 → 11
    assert vals.count() == 11


def test_select_one_series_among_many(spark):
    from akumuli_spark.query.engine import execute_query

    frame = _frame(spark)
    out = execute_query(
        spark,
        {
            "select": "test",
            "range": {"from": 10**15, "to": 10**15 + N_SERIES * PER_SERIES * 10**6},
            "where": {"tag2": "777"},
        },
        frame,
    )
    rows = out.collect()
    assert len(rows) == PER_SERIES
    assert all(r["series"] == "test tag1=A tag2=777" for r in rows)
