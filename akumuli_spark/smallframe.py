"""Single-partition local DataFrames for metadata-sized Python rows.

``spark.createDataFrame(python_list, schema)`` parallelizes the list
over ``defaultParallelism`` slices — on local[32], THIRTY-TWO Python-RDD
partitions for a one-row meta frame.  Every evaluation of such a frame
then runs one PythonRunner per slice (~0.1-0.2 s each for worker
handshake + serializer init), and any ``coalesce(1)`` downstream — the
standard shape for meta/ledger/manifest writes — evaluates all slices
SEQUENTIALLY inside one task: a one-row ``.coalesce(1).write`` measured
4.8 s against 0.27 s single-partition (18×), and even a plain broadcast
side pays ~0.1 s of parallel worker spin-up per evaluation.

:func:`local_frame` creates the same DataFrame from a ONE-partition RDD
(the rows are driver-local and metadata-sized by contract — query term
sets, probe lists, layout metas, ledgers, manifests), so evaluation
costs one Python round, and ``coalesce(1)`` writes stay one cheap task.
Falls back to plain ``createDataFrame`` where no RDD API exists
(connect-mode sessions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_frame(spark: SparkSession, rows, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` for a driver-local,
    metadata-sized ``rows`` list — one RDD partition instead of
    ``defaultParallelism`` slices (see module docstring).  Same rows,
    same schema handling, same verification."""
    try:
        sc = spark.sparkContext
    except Exception:  # connect-mode: no RDD API, keep the classic path
        return spark.createDataFrame(rows, schema)
    return spark.createDataFrame(sc.parallelize(list(rows), 1), schema)
