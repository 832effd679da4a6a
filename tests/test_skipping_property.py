"""Randomized exactness of the data-skipping plane: for ANY
conjunctive range probe, read_where / count_where / read_point must
equal the unpruned full-scan filter — zone-map pruning is a scan-cost
optimization and may NEVER change results (rows silently dropped by a
wrong bound are the worst failure a skipping layer can have).

The table is built ONCE (session-scoped, ~3k rows, range-clustered so
zones have traction, NULLs in every probed column, a deletion vector
AND a metadata-only-dropped file in force); hypothesis then fuzzes
probes only — each example costs one small scan."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from yelp_data_engineering_pipeline_spark.operators.upsert import (
    ParquetMergeTable,
)


@pytest.fixture(scope="module")
def skip_table(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("skipprop") / "tbl")
    t = ParquetMergeTable(spark, root, key="id")
    df = spark.range(0, 3000).selectExpr(
        "id",
        # doubles with NULLs every 17th row
        "case when id % 17 = 0 then null else cast(id as double) * 1.5 "
        "end as f",
        # strings with NULLs every 23rd row
        "case when id % 23 = 0 then null else concat('s', lpad(cast(id "
        "as string), 5, '0')) end as s",
    ).repartitionByRange(6, "id").sortWithinPartitions("id")
    t.merge(df)
    # a DV in force (boundary-only range) and a metadata-only drop
    t.delete_where({"id": (700, 820)}, use_deletion_vectors=True)
    t.delete_where({"id": (2995, None)})
    return t


_int_bound = st.one_of(st.none(), st.integers(-100, 3200))
_flt_bound = st.one_of(st.none(),
                       st.floats(min_value=-50.0, max_value=5000.0,
                                 allow_nan=False, allow_infinity=False))
_str_bound = st.one_of(st.none(), st.text("s0123456789", min_size=1,
                                          max_size=7))


@st.composite
def _ranges(draw):
    out = {}
    if draw(st.booleans()):
        out["id"] = (draw(_int_bound), draw(_int_bound))
    if draw(st.booleans()):
        out["f"] = (draw(_flt_bound), draw(_flt_bound))
    if draw(st.booleans()):
        out["s"] = (draw(_str_bound), draw(_str_bound))
    if not out:
        out["id"] = (draw(_int_bound), draw(_int_bound))
    return out


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ranges=_ranges())
def test_read_where_and_count_where_equal_full_scan(skip_table, ranges):
    t = skip_table
    residual = t._range_residual(ranges)
    full = t.read()
    want = (full.filter(residual) if residual is not None else full)
    want_ids = sorted(r.id for r in want.select("id").collect())
    got_ids = sorted(r.id for r in
                     t.read_where(ranges).select("id").collect())
    assert got_ids == want_ids, ranges
    assert t.count_where(ranges) == len(want_ids), ranges


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(st.one_of(st.none(), st.integers(-10, 3200)),
                     min_size=1, max_size=6))
def test_read_point_equals_isin_filter(skip_table, vals):
    t = skip_table
    nn = [v for v in vals if v is not None]
    want = sorted(
        r.id for r in t.read().filter(F.col("id").isin(nn)).collect()
    ) if nn else []
    got = sorted(r.id for r in t.read_point("id", vals).collect())
    assert got == want, vals
