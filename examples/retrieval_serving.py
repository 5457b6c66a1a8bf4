"""Retrieval-serving demo: the full lifecycle of the IVF ANN index —

    embeddings
      → codebook training       (similarity.ivf_kmeans_centroids)
      → index build             (similarity.build_ivf_index — lists
                                 partitioned by list_id = the serving layout)
      → interactive probe       (similarity.ivf_topk_from_index —
                                 literal ids, partition-pruned scan)
      → batch serve             (similarity.ivf_topk_batch_from_index —
                                 a query DATAFRAME joined on list_id,
                                 nothing collected)
      → corpus growth           (similarity.append_ivf_index — frozen
                                 codebook, cost ∝ appended rows)
      → streaming serve         (streaming.ann.start_streaming_ann —
                                 query micro-batches through foreachBatch)
      → sparse + hybrid         (text.build_bm25_index /
                                 bm25_topk_from_index — term-bucket-pruned
                                 postings; dense+lexical blend)
      → streaming fusion        (streaming.bm25 + streaming.fingerprint:
                                 one doc stream grows the BM25 index AND
                                 the dedup store; hybrid_rrf serves
                                 mid-stream with batch parity)

Build once, serve three ways; the append never rewrites existing lists,
so probes before/after the append see a consistent index.

    python examples/retrieval_serving.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from akumuli_spark import get_spark  # noqa: E402
from akumuli_spark.pipeline import similarity  # noqa: E402
from akumuli_spark.sources.testdata import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("retrieval-serving-demo")
    embs = load_table(spark, SF_DIR, "embeddings")
    base = tempfile.mkdtemp(prefix="retrieval_demo_")
    idx = os.path.join(base, "ivf")

    initial = embs.filter(F.col("vec_id") % 4 != 3)
    growth = embs.filter(F.col("vec_id") % 4 == 3)

    cents = similarity.ivf_kmeans_centroids(embs, nlist=16, max_iter=3)
    similarity.build_ivf_index(initial, idx, centroids=cents)
    print(f"index built over {initial.count()} vectors")

    probe = similarity.ivf_topk_from_index(spark, idx, [0, 1, 2], k=5)
    print("interactive probe (3 ids, partition-pruned):")
    probe.show(6, truncate=False)

    queries = embs.filter(F.col("vec_id") % 25 == 7).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    batch = similarity.ivf_topk_batch_from_index(spark, idx, queries, k=3)
    print(f"batch serve: {batch.count()} results "
          f"for {queries.count()} queries")

    similarity.append_ivf_index(growth, idx)
    after = similarity.ivf_topk_batch_from_index(spark, idx, queries, k=3)
    grown = after.join(
        growth.select(F.col("vec_id").alias("neighbor_id")), "neighbor_id"
    ).count()
    print(f"after append: {grown} results now rank appended vectors")

    # streaming serve: the same queries as two micro-batches
    from akumuli_spark.streaming.ann import start_streaming_ann

    in_dir = os.path.join(base, "in")
    qrows = queries.collect()
    for i, half in enumerate((qrows[: len(qrows) // 2],
                              qrows[len(qrows) // 2:])):
        spark.createDataFrame(
            half, "query_id long, embedding array<float>"
        ).coalesce(1).write.parquet(os.path.join(in_dir, f"c{i}"))
    stream = (
        spark.readStream.schema("query_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(in_dir, "*"))
    )
    q = start_streaming_ann(
        stream, idx, os.path.join(base, "out"), os.path.join(base, "chk"),
        k=3,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    served = spark.read.parquet(os.path.join(base, "out"))
    print(f"streaming serve: {served.count()} results across micro-batches "
          f"(equals the batch run: "
          f"{served.count() == after.count()})")

    # ---- sparse side: BM25 over the documents, same build-once shape ----
    # (dense ANN + sparse lexical = the standard hybrid retrieval pair;
    # the BM25 postings live in their own term-bucket-pruned index)
    from akumuli_spark.pipeline import text as T
    from akumuli_spark.sources.testdata import load_table as load

    docs = load(spark, SF_DIR, "documents")
    bm_idx = os.path.join(base, "bm25")
    # growth story: build over most of the corpus, append the rest as
    # an epoch-keyed partial batch — served idf stays EXACT because
    # every BM25 statistic is a sum the serve path folds
    T.build_bm25_index(docs.filter(F.col("doc_id") % 10 != 9), bm_idx,
                       positions=True)
    T.append_bm25_index(docs.filter(F.col("doc_id") % 10 == 9), bm_idx,
                        epoch=1)  # grows positions too (auto-detected)
    qs = [(1, "fast table scan"), (2, "hash join merge batch")]
    sparse = T.bm25_topk_from_index(spark, bm_idx, qs, k=5)
    print(f"bm25 serve: {sparse.count()} lexical results "
          f"for {len(qs)} queries (term-bucket-pruned postings+dfreq, "
          f"grown by one epoch append)")
    # exact-phrase serving from the same index's positional postings
    phrases = [(1, "fast table"), (2, "hash join")]
    ph = T.phrase_counts_from_index(spark, bm_idx, phrases)
    print(f"phrase serve: {ph.count()} docs contain the exact phrases "
          "(bucket-pruned positional postings)")
    T.compact_bm25_index(spark, bm_idx)
    # re-plan after compaction: a DataFrame created before the swap
    # pins the pre-compaction file listing
    sparse = T.bm25_topk_from_index(spark, bm_idx, qs, k=5)
    print(f"bm25 compacted: still {sparse.count()} results")
    # hybrid retrieval: reciprocal-rank fusion of the sparse and dense
    # top-k lists — the first-class operator (text.hybrid_rrf)
    dense_ranked = after.select(
        F.col("query_id"),
        F.col("neighbor_id").alias("doc_id"),
        "rank",
    )
    hybrid = T.hybrid_rrf(sparse, dense_ranked, k=5)
    print(f"hybrid rrf: {hybrid.count()} fused rows "
          "(sparse ∪ dense, reciprocal-rank scored)")

    # ---- streaming retrieval, end to end: one document stream feeds
    # BOTH the BM25 index (continuous epoch appends) and the
    # fingerprint dedup store; hybrid_rrf serves MID-STREAM and equals
    # the batch build over the same prefix (the snapshot gate: a serve
    # never mixes a half-landed epoch) ----
    from akumuli_spark.pipeline.dedup import simhash_signatures
    from akumuli_spark.streaming.bm25 import start_streaming_bm25_index
    from akumuli_spark.streaming.fingerprint import (
        start_streaming_fingerprint_dedup,
    )

    sidx = os.path.join(base, "bm25_stream")
    in_docs, in_sigs = os.path.join(base, "sd"), os.path.join(base, "ss")
    os.makedirs(in_docs)
    os.makedirs(in_sigs)
    drows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    half = len(drows) // 2
    dstream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1).parquet(os.path.join(in_docs, "*"))
    )
    sstream = (
        spark.readStream.schema("id long, simhash long")
        .option("maxFilesPerTrigger", 1).parquet(os.path.join(in_sigs, "*"))
    )
    q1 = start_streaming_bm25_index(dstream, sidx,
                                    os.path.join(base, "chk1"))
    q2 = start_streaming_fingerprint_dedup(
        sstream, os.path.join(base, "sig_store"),
        os.path.join(base, "sig_pairs"), os.path.join(base, "chk2"))
    try:
        for i, lo, hi in ((0, 0, half), (1, half, len(drows))):
            chunk = spark.createDataFrame(
                drows[lo:hi], "doc_id long, text string")
            chunk.coalesce(1).write.parquet(os.path.join(in_docs, f"c{i}"))
            simhash_signatures(chunk).select("id", "simhash").coalesce(1) \
                .write.parquet(os.path.join(in_sigs, f"c{i}"))
            q1.processAllAvailable()
            q2.processAllAvailable()
            mid = T.hybrid_rrf(
                T.bm25_topk_from_index(spark, sidx, qs, k=5),
                dense_ranked, k=5,
            )
            ref_idx = os.path.join(base, f"bm25_ref{i}")
            T.build_bm25_index(
                spark.createDataFrame(drows[:hi], "doc_id long, text string"),
                ref_idx)
            ref = T.hybrid_rrf(
                T.bm25_topk_from_index(spark, ref_idx, qs, k=5),
                dense_ranked, k=5,
            )
            same = sorted(map(tuple, mid.collect())) == sorted(
                map(tuple, ref.collect()))
            n_store = spark.read.parquet(
                os.path.join(base, "sig_store")).count()
            print(f"mid-stream serve after batch {i}: parity with batch "
                  f"build over prefix = {same}; dedup store holds "
                  f"{n_store} signatures")
    finally:
        q1.stop()
        q2.stop()
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
