"""Bucketed corpus tables: shuffle-FREE equi-joins for the pipelines
that repeatedly join documents ↔ embeddings ↔ signatures on ``doc_id``.

Every near-dup/ANN/curation pass that joins two corpus-scale tables on
the same key pays a full shuffle of both sides per run.  Spark's native
answer is bucketing (`DataFrameWriter.bucketBy`): both tables are
hash-partitioned into the same number of buckets ON DISK, each bucket
sorted by the key, so an equi-join on the bucket key is planned as a
zero-Exchange sort-merge join — the co-located join every warehouse
schema designs for, and at 100 TB the difference between an
O(data) shuffle per pipeline run and none.

Bucketed writes go through the session catalog (``saveAsTable`` with an
explicit external ``path`` — bucket metadata lives in the catalog, the
parquet lives where all the other stores live).  ``bucket_table``
(re)registers idempotently: re-running a build replaces the catalog
entry and the files.  The reader side needs nothing special — `
``spark.table(name)`` exposes the bucketing to the planner, and
``bucketed_join`` just asserts the expectation (both sides bucketed the
same way) before returning the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def bucket_table(df: DataFrame, name: str, path: str, n_buckets: int,
                 key: str = "doc_id") -> None:
    """Write ``df`` as a bucketed external table: ``n_buckets`` hash
    buckets on ``key``, each bucket key-sorted (so the join needs no
    sort either).  Idempotent: an existing registration is dropped and
    replaced — the catalog entry is derived state over the parquet,
    never the source of truth for rows."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(name)
    )


def bucketed_join(spark: SparkSession, left: str, right: str,
                  key: str = "doc_id", how: str = "inner") -> DataFrame:
    """Equi-join two same-bucketed catalog tables on ``key`` — planned
    without ANY Exchange when both sides carry matching bucket specs
    (asserted here: a silently mis-bucketed side — different bucket
    count, or bucketed on another column — would quietly reintroduce
    the shuffle this store exists to remove; plan_audit pins the
    zero-Exchange shape per round)."""
    specs = {}
    for t in (left, right):
        desc = spark.sql(f"DESCRIBE TABLE EXTENDED {t}").collect()
        info = {r.col_name: r.data_type for r in desc}
        if "Num Buckets" not in info:
            raise ValueError(f"table {t} is not bucketed — rebuild with "
                             "bucket_table before joining co-located")
        cols = [
            c.strip(" `")
            for c in info.get("Bucket Columns", "").strip("[]").split(",")
            if c.strip(" `")
        ]
        specs[t] = (int(info["Num Buckets"]), cols)
        if cols != [key]:
            raise ValueError(
                f"table {t} is bucketed on {cols}, not on the join key "
                f"{key!r} — the join would shuffle; rebuild with "
                f"bucket_table(key={key!r})"
            )
    if specs[left][0] != specs[right][0]:
        raise ValueError(
            f"bucket counts differ ({left}: {specs[left][0]}, "
            f"{right}: {specs[right][0]}) — Spark would re-shuffle one "
            "side; rebuild both with the same n_buckets"
        )
    lt, rt = spark.table(left), spark.table(right)
    right_cols = [c for c in rt.columns if c != key]
    return lt.join(rt.select(key, *right_cols), key, how)


def curate_embedding_gate(spark: SparkSession, docs_table: str,
                          emb_table: str, key: str = "doc_id",
                          norm_lo: float | None = 1e-6,
                          norm_hi: float | None = None,
                          n_chars_lo: int | None = None,
                          n_chars_hi: int | None = None) -> DataFrame:
    """The store's flagship consumer: a curation pass that joins the
    document and embedding bucketed tables CO-LOCATED and gates docs on
    embedding health (NaN / degenerate / out-of-band L2 norm — the
    pre-flight every ANN index build wants, since a zero-norm vector
    poisons cosine) plus an optional length band.

    The whole plan is two bucketed scans → zero-Exchange sort-merge
    join → narrow JVM-side filters (the norm is an ``aggregate`` fold
    inside codegen, no UDF): at corpus scale this repeated pass costs
    ZERO shuffles, vs two full-table shuffles per run for unbucketed
    inputs — the exact economics bucketing exists for (plan-audited:
    Exchanges=0 end-to-end).  Returns the surviving docs (embedding
    column dropped, ``emb_norm`` kept as the audit trail)."""
    j = bucketed_join(spark, docs_table, emb_table, key=key)
    norm = F.sqrt(F.expr(
        "aggregate(embedding, 0.0D, "
        "(a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
    ))
    out = j.withColumn("emb_norm", norm).filter(~F.isnan(F.col("emb_norm")))
    if norm_lo is not None:
        out = out.filter(F.col("emb_norm") >= float(norm_lo))
    if norm_hi is not None:
        out = out.filter(F.col("emb_norm") < float(norm_hi))
    if n_chars_lo is not None:
        out = out.filter(F.col("n_chars") >= int(n_chars_lo))
    if n_chars_hi is not None:
        out = out.filter(F.col("n_chars") < int(n_chars_hi))
    return out.drop("embedding")
