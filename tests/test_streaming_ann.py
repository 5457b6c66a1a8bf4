"""Continuous ANN serving: the stream's cumulative top-k output must
equal the one-shot batch run over the same query set (serving is
stateless per query; the stored index is the only state), across
arbitrary micro-batch splits — and results served after an index append
must see the grown corpus."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from akumuli_spark.pipeline import similarity
from akumuli_spark.sources.testdata import load_table
from akumuli_spark.streaming.ann import start_streaming_ann
from tests.conftest import SF_DIR

Q_SCHEMA = "query_id long, embedding array<float>"


def _build_index(spark, embs, path: str) -> None:
    cents = similarity._centroids(embs, similarity.IVF_NLIST)
    similarity.build_ivf_index(embs, path, centroids=cents)


def test_streaming_ann_matches_batch(spark, tmp_path):
    embs = load_table(spark, SF_DIR, "embeddings")
    idx = str(tmp_path / "ivf")
    _build_index(spark, embs, idx)

    queries = [
        (r["vec_id"], r["embedding"])
        for r in embs.filter(F.col("vec_id") % 9 == 2).collect()
    ]
    in_dir, chk = str(tmp_path / "in"), str(tmp_path / "chk")
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)
    # micro-batch splits that cut the query set at arbitrary points
    cuts = [0, 3, 4, 11, len(queries)]
    for i in range(len(cuts) - 1):
        spark.createDataFrame(queries[cuts[i]:cuts[i + 1]], Q_SCHEMA) \
            .coalesce(1).write.parquet(os.path.join(in_dir, f"c{i}"))

    stream = (
        spark.readStream.schema(Q_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(in_dir, "*"))
    )
    q = start_streaming_ann(stream, idx, out_dir, chk, k=5)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # the sink adds an epoch partition column (idempotent-replay keying);
    # the result rows themselves must equal the batch run
    got = sorted(map(tuple, spark.read.parquet(out_dir).drop("epoch").collect()))
    qdf = spark.createDataFrame(queries, Q_SCHEMA)
    want = sorted(map(tuple, similarity.ivf_topk_batch_from_index(
        spark, idx, qdf, k=5
    ).collect()))
    assert got == want
    assert len(got) == len(queries) * 5


def test_streaming_ann_serves_appended_corpus(spark, tmp_path):
    """A query batch served AFTER append_ivf_index must rank appended
    vectors; one served before must not (the index is the only state)."""
    embs = load_table(spark, SF_DIR, "embeddings")
    initial = embs.filter(F.col("vec_id") % 4 != 3)
    growth = embs.filter(F.col("vec_id") % 4 == 3)
    idx = str(tmp_path / "ivf")
    _build_index(spark, embs, idx.replace("ivf", "unused"))  # warm path
    cents = similarity._centroids(embs, similarity.IVF_NLIST)
    similarity.build_ivf_index(initial, idx, centroids=cents)

    qdf = embs.filter(F.col("vec_id") % 50 == 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    before = similarity.ivf_topk_batch_from_index(spark, idx, qdf, k=10)
    growth_ids = {r["vec_id"] for r in growth.collect()}
    assert not [
        r for r in before.collect() if r["neighbor_id"] in growth_ids
    ]
    similarity.append_ivf_index(growth, idx)
    after = similarity.ivf_topk_batch_from_index(spark, idx, qdf, k=10)
    # the appended quarter of the corpus must now be servable
    assert [r for r in after.collect() if r["neighbor_id"] in growth_ids]
    # and the grown index must equal a fresh build over the union
    fresh = str(tmp_path / "fresh")
    similarity.build_ivf_index(embs, fresh, centroids=cents)
    assert sorted(map(tuple, after.collect())) == sorted(
        map(tuple, similarity.ivf_topk_batch_from_index(
            spark, fresh, qdf, k=10
        ).collect())
    )
