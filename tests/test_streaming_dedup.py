"""Streaming exact dedup: first-arrival keep set must equal the batch
exact_duplicates keep set for an id-ordered stream, across arbitrary
micro-batch splits and a checkpoint restart."""

from __future__ import annotations

import os

from akumuli_spark.pipeline.dedup import exact_duplicates
from akumuli_spark.streaming.dedup import streaming_exact_dedup

SCHEMA = "doc_id long, text string"


def _rows(n: int = 60, n_distinct: int = 20):
    # deterministic dup pattern: text i uses i % n_distinct, so every
    # fingerprint recurs three times across the id range
    return [(i, f"document body {i % n_distinct}") for i in range(n)]


def _run_stream(spark, in_dir: str, chk: str, name: str):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(in_dir, "*"))
    )
    q = (
        streaming_exact_dedup(stream)
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", chk).outputMode("append").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"select * from {name}").collect()


def test_streaming_dedup_matches_batch_keep_set(spark, tmp_path):
    rows = _rows()
    in_dir, chk = str(tmp_path / "in"), str(tmp_path / "chk")
    os.makedirs(in_dir)
    # id-ordered chunks with boundaries mid-dup-group
    cuts = [0, 7, 19, 20, 44, len(rows)]
    for i in range(len(cuts) - 1):
        df = spark.createDataFrame(rows[cuts[i]:cuts[i + 1]], SCHEMA)
        df.coalesce(1).write.parquet(os.path.join(in_dir, f"c{i}"))

    got = _run_stream(spark, in_dir, chk, "dedup_sink")
    batch = exact_duplicates(
        spark.createDataFrame(rows, SCHEMA)
    ).collect()
    assert {(r["fingerprint"], r["doc_id"]) for r in got} == {
        (r["fingerprint"], r["keep_id"]) for r in batch
    }
    # exactly one survivor per fingerprint
    assert len(got) == len({r["fingerprint"] for r in got})


def test_streaming_dedup_checkpoint_restart_keeps_state(spark, tmp_path):
    """Restart from the checkpoint: fingerprints seen before the restart
    must stay suppressed after it.  Parquet sink — the memory sink does
    not support checkpoint recovery."""
    rows = _rows()
    in_dir = str(tmp_path / "in")
    chk = str(tmp_path / "chk")
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)

    def start():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(in_dir, "*"))
        )
        return (
            streaming_exact_dedup(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", chk).outputMode("append").start()
        )

    spark.createDataFrame(rows[:30], SCHEMA).coalesce(1).write.parquet(
        os.path.join(in_dir, "c0")
    )
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # second half arrives after a restart: every fingerprint already seen
    # must stay suppressed (state restored from the checkpoint)
    spark.createDataFrame(rows[30:], SCHEMA).coalesce(1).write.parquet(
        os.path.join(in_dir, "c1")
    )
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    got = spark.read.parquet(out_dir).collect()
    batch = exact_duplicates(spark.createDataFrame(rows, SCHEMA)).collect()
    assert {(r["fingerprint"], r["doc_id"]) for r in got} == {
        (r["fingerprint"], r["keep_id"]) for r in batch
    }


def test_streaming_near_dup_equals_batch_pairs(spark, tmp_path):
    """The continuous near-dup pipeline: streamed micro-batches deduped
    against the growing signature store must emit EXACTLY the batch
    minhash_lsh_pairs set over the full corpus — each pair once, in the
    batch where its later endpoint arrived."""
    from akumuli_spark.pipeline.dedup import minhash_lsh_pairs
    from akumuli_spark.streaming.dedup import start_streaming_near_dup

    # 30 docs, clear near-dups: doc i and i+10 share a long prefix for
    # i in 0..4 (one word changed), everything else distinct
    def body(i: int) -> str:
        words = [f"w{(i * 7 + j) % 97}" for j in range(12)]
        return " ".join(words)

    rows = [(i, body(i)) for i in range(30)]
    for i in range(5):
        prefix = rows[i][1].rsplit(" ", 1)[0]
        rows[i + 10] = (i + 10, prefix + " changed")
    docs = spark.createDataFrame(rows, SCHEMA)

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    # three micro-batches split mid-duplicate-group so cross-batch pairs
    # exist in both directions
    for k, lo, hi in ((0, 0, 11), (1, 11, 22), (2, 22, 30)):
        docs.filter(f"doc_id >= {lo} AND doc_id < {hi}").coalesce(1) \
            .write.parquet(os.path.join(in_dir, f"b{k}"))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(in_dir, "*"))
    )
    store = str(tmp_path / "store")
    pairs_dir = str(tmp_path / "pairs")
    q = start_streaming_near_dup(
        stream, store, pairs_dir, str(tmp_path / "chk"), n=3, threshold=0.5
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in spark.read.parquet(pairs_dir).collect()
    )
    want = sorted(
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in minhash_lsh_pairs(docs, n=3, threshold=0.5).collect()
    )
    assert got == want and len(got) > 0
    assert len(got) == len(set(got))  # each pair exactly once
    # the store accumulated every doc and its signature exactly once
    assert spark.read.parquet(f"{store}/docs").count() == 30
    sig = spark.read.parquet(f"{store}/signatures")
    assert sig.count() == 30 and sig.select("id").distinct().count() == 30


def test_near_dup_epoch_replay_exactly_once(spark, tmp_path):
    """Replaying an epoch (foreachBatch retry after a partial append)
    must emit the identical pair set and leave the store's row counts
    unchanged: epoch-keyed partitions are overwritten, and the pair
    computation excludes the in-flight epoch's stored rows (VERDICT r8
    Next #5)."""
    from akumuli_spark.pipeline.dedup import minhash_lsh_pairs
    from akumuli_spark.streaming.dedup import near_dup_batch_against_store

    def body(i: int) -> str:
        return " ".join(f"w{(i * 7 + j) % 97}" for j in range(12))

    rows = [(i, body(i)) for i in range(30)]
    for i in range(5):
        prefix = rows[i][1].rsplit(" ", 1)[0]
        rows[i + 10] = (i + 10, prefix + " changed")
    docs = spark.createDataFrame(rows, SCHEMA)
    store = str(tmp_path / "store")

    splits = [(0, 0, 11), (1, 11, 22), (2, 22, 30)]
    pair_sets = {}
    for e, lo, hi in splits:
        batch = docs.filter(f"doc_id >= {lo} AND doc_id < {hi}")
        pair_sets[e] = {
            (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
            for r in near_dup_batch_against_store(
                spark, batch, store, n=3, threshold=0.5, epoch_id=e
            ).collect()
        }
    n_docs = spark.read.parquet(f"{store}/docs").count()
    n_sigs = spark.read.parquet(f"{store}/signatures").count()
    assert n_docs == 30
    # replay the LAST epoch — the only one a stream checkpoint can retry
    e, lo, hi = splits[-1]
    replay = {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in near_dup_batch_against_store(
            spark, docs.filter(f"doc_id >= {lo} AND doc_id < {hi}"),
            store, n=3, threshold=0.5, epoch_id=e
        ).collect()
    }
    assert replay == pair_sets[e]  # identical pair decisions
    assert spark.read.parquet(f"{store}/docs").count() == n_docs
    assert spark.read.parquet(f"{store}/signatures").count() == n_sigs
    # cumulative output still equals the one-shot batch pair set
    got = sorted(set().union(*pair_sets.values()))
    want = sorted(
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in minhash_lsh_pairs(docs, n=3, threshold=0.5).collect()
    )
    assert got == want and len(got) > 0
