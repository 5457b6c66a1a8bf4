"""Bucketed corpus tables: the co-located join must plan with ZERO
Exchange nodes (vs two for the plain join), return identical rows, and
refuse a non-bucketed side rather than silently reintroduce the
shuffle."""

from __future__ import annotations

import pytest

from akumuli_spark.sources.bucketed import bucket_table, bucketed_join
from akumuli_spark.sources.testdata import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("bucketed"))
    docs = load_table(spark, SF_DIR, "documents")
    embs = load_table(spark, SF_DIR, "embeddings").withColumnRenamed(
        "vec_id", "doc_id")
    bucket_table(docs, "t_bdocs", base + "/docs", 8)
    bucket_table(embs, "t_bembs", base + "/embs", 8)
    return docs, embs


def test_colocated_join_has_zero_exchanges(spark, tables):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "t_bdocs", "t_bembs")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 0
        assert "SortMergeJoin" in plan
        docs, embs = tables
        plain = docs.join(embs, "doc_id")
        pplan = plain._jdf.queryExecution().executedPlan().toString()
        assert pplan.count("Exchange") >= 2  # what bucketing removed
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_rows_match_plain_join(spark, tables):
    docs, embs = tables
    got = sorted(r.doc_id for r in bucketed_join(
        spark, "t_bdocs", "t_bembs").select("doc_id").collect())
    exp = sorted(r.doc_id for r in docs.join(
        embs, "doc_id").select("doc_id").collect())
    assert got == exp and got


def test_non_bucketed_side_refused(spark, tables):
    docs, _ = tables
    docs.limit(5).write.mode("overwrite").saveAsTable("t_plain")
    with pytest.raises(ValueError, match="not bucketed"):
        bucketed_join(spark, "t_bdocs", "t_plain")
    spark.sql("DROP TABLE IF EXISTS t_plain")


def test_rebuild_is_idempotent(spark, tables, tmp_path):
    docs, _ = tables
    bucket_table(docs, "t_redocs", str(tmp_path / "a"), 8)
    n1 = spark.table("t_redocs").count()
    bucket_table(docs, "t_redocs", str(tmp_path / "b"), 8)
    assert spark.table("t_redocs").count() == n1
    spark.sql("DROP TABLE IF EXISTS t_redocs")


def test_mismatched_bucket_specs_refused(spark, tables, tmp_path):
    """Differing bucket counts (or a different bucket column) would
    silently reintroduce the Exchange — refuse up front (ADVICE r11)."""
    docs, embs = tables
    bucket_table(docs, "t_b16", str(tmp_path / "b16"), 16)
    with pytest.raises(ValueError, match="counts differ"):
        bucketed_join(spark, "t_b16", "t_bembs")
    bucket_table(embs, "t_blang", str(tmp_path / "blang"), 8, key="label")
    with pytest.raises(ValueError, match="not on the join key"):
        bucketed_join(spark, "t_bdocs", "t_blang")
    spark.sql("DROP TABLE IF EXISTS t_b16")
    spark.sql("DROP TABLE IF EXISTS t_blang")


def test_curate_embedding_gate_zero_exchange_and_rows(spark, tables):
    """The consuming curation pass stays zero-Exchange END-TO-END and
    gates exactly like the plain-join equivalent."""
    from pyspark.sql import functions as F

    from akumuli_spark.sources.bucketed import curate_embedding_gate

    docs, embs = tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = curate_embedding_gate(spark, "t_bdocs", "t_bembs",
                                    n_chars_lo=100, n_chars_hi=300)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 0
        norm = F.sqrt(F.expr(
            "aggregate(embedding, 0.0D, "
            "(a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"))
        exp_df = (
            docs.join(embs, "doc_id").withColumn("n", norm)
            .filter("NOT isnan(n) AND n >= 1e-6")
            .filter("n_chars >= 100 AND n_chars < 300")
        )
        got = sorted(r.doc_id for r in out.collect())
        exp = sorted(r.doc_id for r in exp_df.collect())
        assert got == exp and got
        assert "embedding" not in out.columns and "emb_norm" in out.columns
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
