"""Recall@k of every approximate ANN path against the exact cosine
top-k — the honesty metric for the approximate family: the speed/memory
wins mean nothing without the recall they buy.

Measures, per query set at the given sf_dir:
  * sign-LSH bucketed     (single table, and the multi-table variant)
  * IVF (probed lists)    at the default and a widened nprobe
  * flat PQ (ADC)
  * IVFADC                at the default and widened nprobe

Usage: python tools/ann_recall.py [sf_dir] [k] [n_queries]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from akumuli_spark.session import get_spark  # noqa: E402
from akumuli_spark.sources.testdata import load_table  # noqa: E402


def topk_sets(df, k):
    out = {}
    for r in df.collect():
        if r["rank"] <= k:
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def recall(approx, exact):
    num = sum(len(approx.get(q, set()) & n) for q, n in exact.items())
    den = sum(len(n) for n in exact.values())
    return round(num / den, 4) if den else None


def main() -> None:
    from akumuli_spark.pipeline import similarity as S

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_q = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    spark = get_spark("ann-recall")
    embs = load_table(spark, sf_dir, "embeddings").localCheckpoint()
    qids = list(range(n_q))

    exact = topk_sets(S.cosine_topk(embs, qids, k=k), k)
    out = {
        "lsh": recall(topk_sets(
            S.lsh_bucketed_topk(embs, qids, k=k), k), exact),
        "ivf_nprobe4": recall(topk_sets(
            S.ivf_topk(embs, qids, k=k), k), exact),
        "ivf_nprobe8": recall(topk_sets(
            S.ivf_topk(embs, qids, k=k, nprobe=8), k), exact),
        "pq_flat": recall(topk_sets(
            S.pq_topk(embs, qids, k=k), k), exact),
        "ivfadc_nprobe4": recall(topk_sets(
            S.ivfadc_topk(embs, qids, k=k), k), exact),
        "ivfadc_nprobe8": recall(topk_sets(
            S.ivfadc_topk(embs, qids, k=k, nprobe=8), k), exact),
        "pq_refine_r100": recall(topk_sets(
            S.refine_topk(embs, S.pq_topk(embs, qids, k=100), k=k), k),
            exact),
    }
    print(json.dumps({"sf_dir": sf_dir, "k": k, "n_queries": n_q,
                      "recall": out}))


if __name__ == "__main__":
    main()
