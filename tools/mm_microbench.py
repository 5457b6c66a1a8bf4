"""Pure-Python microbench of the multimodal codec kernels (no Spark).

Times the per-row functions the mapInPandas kernels loop over, on a
synthetic text corpus matching the sf0.1 documents distribution
(~300-char texts), so kernel-level optimizations can be paired-A/B'd
without Spark scheduling noise.  Usage:

    python tools/mm_microbench.py [n_docs] [rounds]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from akumuli_spark.pipeline import multimodal as mm  # noqa: E402


def _texts(n: int) -> list[str]:
    # deterministic texts, lengths ~ uniform 250..350 like the corpus
    out = []
    for i in range(n):
        ln = 250 + (i * 37) % 101
        out.append(("w%d " % i) * (ln // 6))
    return out


def _grids(texts):
    grids = []
    for t in texts:
        n_text = len(t.encode("utf-8"))
        w = 8 + n_text % 25
        h = 8 + (n_text * 31) % 17
        row_size = ((w * 3 + 3) // 4) * 4
        n_bytes = 54 + row_size * h
        ys = np.arange(h, dtype=np.int64)
        xs = (31 * np.arange(w, dtype=np.int64)) % 256
        grid = (((17 * ys[:, None]) + xs[None, :] + n_bytes) % 256)
        grids.append((grid, w, h, n_bytes))
    return grids


def _synth_one(fn, texts):
    """Run a synth mapInPandas kernel over one pandas batch, return payloads."""
    import pandas as pd

    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = list(fn(iter([pdf])))
    return list(out[0]["payload"])


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    texts = _texts(n)
    grids = _grids(texts)

    # build payload corpora once via the module's own synth kernels
    import pandas as pd  # noqa: F401

    def kernel_of(df_fn):
        # extract the inner mapInPandas function from the module factory
        # by calling with a stub DataFrame-like that records the kernel
        raise SystemExit("unused")

    # the synth factories close over `docs`; replicate their bodies by
    # calling the real factories' inner kernels is awkward — instead use
    # the public per-row building blocks round-trip style:
    from akumuli_spark.pipeline.multimodal import (
        _payload_pixel_grid,
    )

    # JPEG sequential corpus
    jf = mm.synth_jpeg_pixel_payloads.__wrapped__ if hasattr(
        mm.synth_jpeg_pixel_payloads, "__wrapped__") else None

    # Build payloads through the DataFrame-free path: reuse the synth
    # kernels by faking the mapInPandas call. The factories build the
    # kernel inside, so call the factory with a dummy object exposing
    # select(...).mapInPandas(kernel, schema) that captures the kernel.
    class _Cap:
        def __init__(self):
            self.kernel = None

        def select(self, *a, **k):
            return self

        def mapInPandas(self, kernel, schema=None):
            self.kernel = kernel
            return self

    def captured(factory, **kw):
        cap = _Cap()
        factory(cap, **kw)
        return cap.kernel

    jpeg_k = captured(mm.synth_jpeg_pixel_payloads)
    prog_k = captured(mm.synth_jpeg_progressive_pixel_payloads)
    gif_k = captured(mm.synth_gif_pixel_payloads)
    png_k = captured(mm.synth_png_pixel_payloads)
    bmp_k = captured(mm.synth_bmp_pixel_payloads)

    corpora = {}
    for name, k in (("jpeg", jpeg_k), ("jpeg_prog", prog_k),
                    ("gif", gif_k), ("png", png_k), ("bmp", bmp_k)):
        t0 = time.time()
        corpora[name] = _synth_one(k, texts)
        print(f"synth_{name:10s} {time.time() - t0:7.3f} s  ({n} docs)")

    # decode timing (the dhash-payload hot path)
    for _ in range(rounds):
        for name, payloads in corpora.items():
            sx = None
            t0 = time.time()
            bad = 0
            for p, (grid, w, h, n_bytes) in zip(payloads, grids):
                sx = (np.arange(7, dtype=np.int64) * w) // 7
                sy = (np.arange(10, dtype=np.int64) * h) // 10
                g = _payload_pixel_grid(p, sx, sy)
                if g is None:
                    bad += 1
            dt = time.time() - t0
            print(f"decode_{name:10s} {dt:7.3f} s  bad={bad}")
        print("---")

    # correctness spot-check: decoded grid equals the _PX formula
    for name, payloads in corpora.items():
        p = payloads[7]
        grid, w, h, n_bytes = grids[7]
        sx = (np.arange(7, dtype=np.int64) * w) // 7
        sy = (np.arange(10, dtype=np.int64) * h) // 10
        g = _payload_pixel_grid(p, sx, sy)
        ref = grid[sy[:, None], sx[None, :]]
        if name.startswith("jpeg"):
            ok = g is not None and np.abs(
                g.astype(int) - ref.astype(int)).max() <= 2
        else:
            ok = g is not None and (g == ref).all()
        print(f"check_{name:10s} {'OK' if ok else 'MISMATCH'}")


if __name__ == "__main__":
    main()
