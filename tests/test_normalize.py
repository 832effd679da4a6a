"""Stage-2 ETL tests: star-schema invariants, quarantine routing,
determinism, and a DuckDB differential on the bridge cardinalities."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.yelp_fixtures import make_results, write_ndjson
from yelp_data_engineering_pipeline_spark.plans.normalize import normalize
from yelp_data_engineering_pipeline_spark.schemas import RESULTS_SCHEMA, WEEKDAY_ORDER


@pytest.fixture(scope="module")
def ndjson_path(tmp_path_factory):
    rows = make_results(80, seed=7)
    return write_ndjson(rows, tmp_path_factory.mktemp("yelp") / "results.ndjson")


@pytest.fixture(scope="module")
def tables(spark, ndjson_path):
    bronze = spark.read.schema(RESULTS_SCHEMA).json(str(ndjson_path))
    return normalize(bronze)


def test_quarantine_split(spark, tables, ndjson_path):
    bronze = spark.read.schema(RESULTS_SCHEMA).json(str(ndjson_path))
    assert tables["business"].count() + tables["quarantine"].count() == bronze.count()
    # quarantined rows really violate a constraint
    for r in tables["quarantine"].collect():
        bad_price = r["price"] is not None and not __import__("re").fullmatch(r"\$\$?\$?\$?", r["price"])
        bad_health = r["health_score"] is not None and not __import__("re").fullmatch(
            "[A-Z]", r["health_score"]
        )
        assert bad_price or bad_health or r["name"] is None


def test_ids_dense_and_unique(tables):
    for name in ("business", "weekday", "food_category", "search_term", "highlight", "amenity"):
        ids = [r["id"] for r in tables[name].select("id").collect()]
        assert sorted(ids) == list(range(1, len(ids) + 1)), name


def test_weekday_canonical_order(tables):
    rows = tables["weekday"].orderBy("id").collect()
    names = [r["name"] for r in rows]
    assert names == [d for d in WEEKDAY_ORDER if d in set(names)]


def test_fk_integrity(tables):
    biz_ids = {r["id"] for r in tables["business"].select("id").collect()}
    for bridge, dim, fk in [
        ("business_food_category", "food_category", "food_category_id"),
        ("business_search_term", "search_term", "search_term_id"),
        ("business_highlight", "highlight", "highlight_id"),
        ("business_amenity", "amenity", "amenity_id"),
        ("open_hours", "weekday", "weekday_id"),
    ]:
        dim_ids = {r["id"] for r in tables[dim].select("id").collect()}
        for r in tables[bridge].select("business_id", fk).collect():
            assert r["business_id"] in biz_ids, bridge
            assert r[fk] in dim_ids, bridge


def test_split_shifts_multiple_rows(spark, tables, ndjson_path):
    """N1: a split-shift hours string yields one open_hours row per
    range — cross-checked against DuckDB counting ranges in the raw
    NDJSON independently."""
    con = duckdb.connect()
    expected = con.execute(
        f"""
        WITH entries AS (
          SELECT unnest(open_hours) AS oh
          FROM read_ndjson_auto('{ndjson_path}')
          WHERE (price IS NULL OR regexp_full_match(price, '\\$\\$?\\$?\\$?'))
            AND (health_score IS NULL OR regexp_full_match(health_score, '[A-Z]'))
        )
        SELECT
          SUM(CASE WHEN oh.open_hours = 'Closed' THEN 0
                   WHEN oh.open_hours = 'Open 24 hours' THEN 1
                   ELSE len(regexp_extract_all(oh.open_hours,
                        '(\\d{{1,2}}(?::\\d{{2}})? [AP]M) - (\\d{{1,2}}(?::\\d{{2}})? [AP]M)'))
              END) AS n
        FROM entries
        """
    ).fetchone()[0]
    assert tables["open_hours"].count() == expected


def test_overnight_rows_close_before_open(tables):
    # overnight fixture strings produce close < open rows
    n = tables["open_hours"].filter(F.col("close_time") < F.col("open_time")).count()
    assert n > 0


def test_hours_rejects_routed(tables):
    # 'see website' entries land in rejects, not open_hours
    assert tables["hours_rejects"].count() > 0
    assert tables["hours_rejects"].filter(F.col("hours_str") == "see website").count() > 0


def test_bridge_cardinality_matches_arrays(spark, tables, ndjson_path):
    bronze = spark.read.schema(RESULTS_SCHEMA).json(str(ndjson_path))
    from yelp_data_engineering_pipeline_spark.plans.normalize import validity_predicate

    valid = bronze.filter(validity_predicate())
    for col, bridge in [
        ("food_category", "business_food_category"),
        ("related_search_terms", "business_search_term"),
        ("highlights", "business_highlight"),
        ("amenities", "business_amenity"),
    ]:
        expected = valid.select(F.explode(col)).count()
        assert tables[bridge].count() == expected, bridge


def test_amenity_payload_preserved(spark, tables, ndjson_path):
    bronze = spark.read.schema(RESULTS_SCHEMA).json(str(ndjson_path))
    from yelp_data_engineering_pipeline_spark.plans.normalize import validity_predicate

    expected_true = (
        bronze.filter(validity_predicate())
        .select(F.explode("amenities").alias("a"))
        .filter(F.col("a.is_available"))
        .count()
    )
    assert tables["business_amenity"].filter(F.col("is_available")).count() == expected_true


def test_deterministic_rerun(spark, ndjson_path):
    bronze = spark.read.schema(RESULTS_SCHEMA).json(str(ndjson_path))
    a = normalize(bronze)
    b = normalize(bronze)
    for name in ("business", "open_hours", "business_amenity"):
        ra = sorted(map(tuple, a[name].collect()))
        rb = sorted(map(tuple, b[name].collect()))
        assert ra == rb, name
