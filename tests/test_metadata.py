"""search/suggest tests vs DuckDB (mirrors the reference's
test_search_api.py coverage)."""

import pytest

from akumuli_spark.query.metadata import search, suggest
from akumuli_spark.query.errors import QueryParseError
from akumuli_spark.sources.testdata import (
    APP_METRICS_SQL,
    app_metrics_view,
    series_dim,
)
from tests.conftest import SF_DIR, assert_matches_oracle

DIM_SQL = f"""{APP_METRICS_SQL},
dim AS (SELECT DISTINCT series, metric, tag_user FROM app_metrics)"""


@pytest.fixture(scope="module")
def dim(spark):
    return series_dim(app_metrics_view(spark, SF_DIR))


def test_search(spark, duck, dim):
    out = search(dim, {"select": "app.click", "where": {"user": ["1", "3"]}})
    assert_matches_oracle(
        out,
        duck,
        f"""WITH {DIM_SQL}
        SELECT series AS name FROM dim
        WHERE metric = 'app.click' AND tag_user IN ('1', '3')""",
    )


def test_suggest_metric_names(spark, duck, dim):
    out = suggest(dim, {"select": "metric-names", "starts-with": "app.c"})
    assert_matches_oracle(
        out,
        duck,
        f"""WITH {DIM_SQL}
        SELECT DISTINCT metric AS name FROM dim WHERE metric LIKE 'app.c%'""",
    )


def test_suggest_tag_names(spark, duck, dim):
    out = suggest(dim, {"select": "tag-names", "metric": "app.view"})
    rows = [r["name"] for r in out.collect()]
    assert rows == ["user"]


def test_suggest_tag_values(spark, duck, dim):
    out = suggest(
        dim, {"select": "tag-values", "metric": "app.view", "tag": "user"}
    )
    assert_matches_oracle(
        out,
        duck,
        f"""WITH {DIM_SQL}
        SELECT DISTINCT tag_user AS name FROM dim WHERE metric = 'app.view'""",
    )


def test_suggest_rejects_bad_kind(dim):
    with pytest.raises(QueryParseError):
        suggest(dim, {"select": "bogus"})
