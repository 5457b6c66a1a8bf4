"""Materialize-once seam for corpus-scale intermediates.

Several operators compute an expensive corpus-scale frame that feeds
two or more consumers (both sides of a self-join, an aggregate plus a
final join); materializing it once is the r14 optimization family.
``localCheckpoint`` is the fastest mechanism — executor-local storage,
lineage truncated — but that exact property is a FAULT-TOLERANCE trade
(ADVICE r14): on a real cluster, losing an executor (crash, spot
reclaim, dynamic-allocation decommission) loses its checkpoint
partitions, and with no lineage left the job FAILS instead of
recomputing.  Fine on local[*]; wrong default for a 100 TB run on
preemptible capacity.

:func:`corpus_checkpoint` routes the corpus-scale call sites through a
config so cluster deployments can pick the recoverable trade:

* ``spark.akumuli.materialize.mode=local`` (default) —
  ``localCheckpoint(eager=…)``; fastest, non-recoverable.
* ``spark.akumuli.materialize.mode=disk`` — ``persist(DISK_ONLY)``:
  the frame still computes once (first action populates the cache),
  lineage is retained, so a lost partition recomputes instead of
  failing the job.  Spark's ContextCleaner unpersists it when the
  frame is garbage-collected, same lifetime story as localCheckpoint.

PROVABLY TINY frames (band signatures, label frames, codebooks,
bounded sketches) keep calling ``localCheckpoint`` directly — their
loss-and-fail blast radius is one cheap recompute of a small job, and
the checkpoint copy is what frees their (wide) upstream for GC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_MODE_CONF = "spark.akumuli.materialize.mode"


def corpus_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize a corpus-scale intermediate once for its multiple
    consumers; mechanism per ``spark.akumuli.materialize.mode`` (see
    module docstring).  ``eager=True`` triggers the materializing job
    immediately in both modes, so construction-time cost stays visible
    where the operator documents it."""
    try:
        mode = df.sparkSession.conf.get(_MODE_CONF, "local")
    except Exception:  # connect-mode sessions without conf access
        mode = "local"
    if mode == "disk":
        out = df.persist(StorageLevel.DISK_ONLY)
        if eager:
            out.count()
        return out
    return df.localCheckpoint(eager=eager)
