"""Recall/precision of the approximate near-dup paths against the exact
n-gram-Jaccard pair set — the dedup twin of tools/ann_recall.py: banding
and pigeonhole schemes trade recall for never-all-pairs joins, and that
trade should be a measured number, not a vibe.

Truth = ngram_jaccard_pairs (exact Jaccard over word shingles, skew
guard off — the corpus is small enough) at the probed threshold.
Candidates-only paths (MinHash bands, SimHash chunks) can only MISS
pairs (their verify step is exact), so precision is 1.0 by construction
and the interesting number is recall; both are printed anyway as a
self-check.

Usage: python tools/dedup_recall.py [sf_dir] [threshold]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from akumuli_spark.session import get_spark  # noqa: E402
from akumuli_spark.sources.testdata import load_table  # noqa: E402


def pairs(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.collect()}


def pr(approx: set, truth: set):
    if not truth:
        return {"recall": None, "precision": None,
                "truth": 0, "found": len(approx)}
    tp = len(approx & truth)
    return {
        "recall": round(tp / len(truth), 4),
        "precision": round(tp / len(approx), 4) if approx else None,
        "truth": len(truth), "found": len(approx),
    }


def main() -> None:
    from akumuli_spark.pipeline import dedup as D

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    spark = get_spark("dedup-recall")
    docs = load_table(spark, sf_dir, "documents").localCheckpoint()

    truth = pairs(D.ngram_jaccard_pairs(docs, n=5, threshold=threshold,
                                        max_df=None))
    out = {
        "minhash_lsh": pr(
            pairs(D.minhash_lsh_pairs(docs, n=5, threshold=threshold)),
            truth),
    }
    # SimHash bounds HAMMING distance, not Jaccard: sweep the radius
    # presets against the same Jaccard truth so the operating-point
    # table in simhash_pairs' docstring is a measured number per
    # (shingle n, radius) — the chunk count auto-derives from the
    # radius (pigeonhole completeness), so recall here is the
    # measure-mismatch cost alone, not missed candidates
    for sim_n in (3, 5):
        for h in (3, 5, 9):
            out[f"simhash_n{sim_n}_h{h}_vs_jaccard"] = pr(
                pairs(D.simhash_pairs(docs, n=sim_n, max_hamming=h)), truth)
    print(json.dumps({"sf_dir": sf_dir, "threshold": threshold,
                      "pairs": out}))


if __name__ == "__main__":
    main()
