"""Database facade — the functional equivalent of the reference's HTTP API
surface (/root/reference/akumulid/httpserver.cpp:43-52,123-154): one object
exposing the query, search, suggest, stats, and function-names endpoints
over a bound pair of metrics/events frames.

The reference serves these over MHD; here the *functions* are the API (the
driver checks capabilities, not transports) — wrap them in any HTTP layer
if a wire protocol is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from akumuli_spark.query import metadata
from akumuli_spark.query.apply import _NODES
from akumuli_spark.query.engine import execute_query
from akumuli_spark.query.errors import QueryParseError
from akumuli_spark.query.plan import AGG_FUNCS
from akumuli_spark.sources.testdata import series_dim

VERSION = "akumuli_spark 0.1"


class Database:
    """A bound database: metrics + events frames and the derived series
    dimension (the analogue of Storage + SeriesMatcher,
    /root/reference/libakumuli/storage2.cpp)."""

    def __init__(self, spark: SparkSession, metrics: DataFrame,
                 events: DataFrame | None = None):
        self.spark = spark
        self.metrics = metrics
        self.events = events
        dims = [series_dim(metrics)]
        if events is not None:
            dims.append(series_dim(events))
        dim = dims[0]
        for d in dims[1:]:
            dim = dim.unionByName(d)
        self.series = dim.dropDuplicates(["series"])

    # -- POST /api/query ---------------------------------------------------
    def query(self, query_json: dict) -> DataFrame:
        return execute_query(self.spark, query_json, self.metrics, self.events)

    # -- POST /api/search --------------------------------------------------
    def search(self, query_json: dict) -> DataFrame:
        return metadata.search(self.series, query_json)

    # -- POST /api/suggest -------------------------------------------------
    def suggest(self, query_json: dict) -> DataFrame:
        return metadata.suggest(self.series, query_json)

    # -- GET /api/stats ----------------------------------------------------
    def stats(self) -> dict:
        return {
            "n_series": self.series.count(),
            "n_metrics": self.series.select("metric").distinct().count(),
        }

    # -- GET /api/function-names ------------------------------------------
    @staticmethod
    def function_names() -> list[str]:
        return sorted(set(AGG_FUNCS) | set(_NODES))

    # -- GET /api/version --------------------------------------------------
    @staticmethod
    def version() -> str:
        return VERSION


def open_database(spark: SparkSession, metrics: DataFrame,
                  events: DataFrame | None = None) -> Database:
    return Database(spark, metrics, events)
