"""Batched grouped-map seam: ``groupBy(keys).applyInPandas(kernel)``
without the per-group JVM sort or the per-group Python round trip.

``groupBy().applyInPandas`` plans as Exchange(hash keys) → Sort(keys) →
FlatMapGroupsInPandas: the sort exists only to delimit groups, and every
group pays one JVM↔Python Arrow round trip — for kernels applied to
thousands of small groups (anomaly sketch cells, SAX series) the
boundary crossings dominate.  The only *distribution* requirement of a
per-group kernel is hash co-location, so :func:`grouped_map_batched`
plans ``repartition(keys)`` + ``mapInPandas`` instead: one Python call
per shuffle partition, the partition's Arrow batches concatenated once,
and the UNCHANGED kernel run per pandas group (guide §4.5 — amortize
the boundary; the per-group sort disappears from the plan).  Every
emitted value is identical: same kernel, same per-group rows.

Null keys group together (``dropna=False``), matching Spark's groupBy.

Memory note: one shuffle partition's rows buffer in the Python worker —
the same class of bound the per-GROUP buffering already imposed (the
largest single group must fit either way), now governed by shuffle
partition sizing.  First used by the r15 EWMA rework; shared here by
SAX / anomaly / spacesaver-sketch / sequence-packing kernels.
"""

from __future__ import annotations

from typing import Callable, Sequence

import pandas as pd
from pyspark.sql import DataFrame


def grouped_map_batched(
    df: DataFrame,
    keys: Sequence[str],
    kernel: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
    out_cols: Sequence[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """``df.groupBy(*keys).applyInPandas(kernel, schema)`` with the
    batched mapInPandas plan described in the module docstring.

    ``out_cols`` names the output columns in schema order (the per-group
    frames are re-indexed to it before crossing back to the JVM, so the
    kernel may return columns in any order).  ``num_partitions`` pins an
    explicit shuffle width (AQE-coalescing-exempt, like
    ``repartition(n, keys)``); default None matches groupBy's
    AQE-managed exchange.
    """
    keys = list(keys)
    cols = list(out_cols)

    def per_partition(pdfs):
        chunks = list(pdfs)
        if not chunks:
            return
        pdf = (pd.concat(chunks, ignore_index=True)
               if len(chunks) > 1 else chunks[0])
        if not len(pdf):
            return
        outs = [kernel(g)
                for _, g in pdf.groupby(keys, sort=False, dropna=False)]
        # zero-row kernel outputs contribute nothing and would only
        # pollute the concat's dtypes (empty frames carry object cols)
        outs = [o for o in outs if o is not None and len(o)]
        if not outs:
            return
        out = (pd.concat(outs, ignore_index=True)
               if len(outs) > 1 else outs[0])
        yield out.reindex(columns=cols)

    rep = (df.repartition(num_partitions, *keys) if num_partitions
           else df.repartition(*keys))
    return rep.mapInPandas(per_partition, schema=schema)
