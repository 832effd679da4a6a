"""Catalog-wide output-domain gate (VERDICT.md r4 §next-8, generalized).

History: ``agg_conditional`` was the only red driver row in rounds 3 AND 4,
while the local ``fetchall()``-based exact-value differential passed both
times.  Root cause (found r5): DuckDB's ``count_if`` returns HUGEINT, which
``.df()`` converts to pandas **float64** while Spark's ``count_if`` is
int64 — a *dtype-plane* divergence invisible to value-level compares but
fatal to a pandas-mediated hash.  Empirically the driver tolerates int32
vs int64 (``prep_length_bins`` r4-green) and date-object vs datetime64
(``func_interval_arith`` r1-green), so the gate below enforces exactly the
classes with evidence of breaking, without flagging driver-proven-safe
pairs:

1. numeric/bool KIND parity — a column must not be integral on one engine
   and floating on the other (the agg_conditional class), nor bool on one
   side only;
2. no session-timezone-dependent Spark output types (TimestampType bit
   round 1; TimestampNTZ is banned too — the harness's events encoding has
   drifted between rounds, ints are the only safe wire format);
3. every catalog entry has an oracle (no silent rows-only downgrades).

Runs every (queries(), oracle_sql()) pair at sf0.001 on both engines and
reports ALL violations in one failure message.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry
from yelp_data_engineering_pipeline_spark.cache import release_tracked
from yelp_data_engineering_pipeline_spark.tables import TABLE_NAMES


def _kind(dtype) -> str:
    k = dtype.kind  # numpy kind: i/u int, f float, b bool, O object, M datetime
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    return "other"


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def test_catalog_outputs_are_hash_canonical(spark, sf_dir, duck):
    qs, oracles = entry.queries(), entry.oracle_sql()
    problems: list[str] = []

    missing_oracle = sorted(set(qs) - set(oracles))
    if missing_oracle:
        problems.append(f"entries without oracle: {missing_oracle}")

    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf_dir)
            banned = [
                f.name
                for f in sdf.schema.fields
                if f.dataType.typeName() in ("timestamp", "timestamp_ntz")
            ]
            if banned:
                problems.append(f"{name}: timestamp-typed output columns {banned}")
            spdf = sdf.toPandas()
            release_tracked()
        except Exception as ex:  # noqa: BLE001 — collect everything, fail once
            problems.append(f"{name}: spark error {type(ex).__name__}: {ex}")
            continue
        if name not in oracles:
            continue
        try:
            dpdf = duck.execute(oracles[name]).df()
        except Exception as ex:  # noqa: BLE001
            problems.append(f"{name}: duckdb error {type(ex).__name__}: {ex}")
            continue
        for col in spdf.columns:
            if col not in dpdf.columns:
                problems.append(f"{name}: column {col} missing from oracle result")
                continue
            sk, dk = _kind(spdf[col].dtype), _kind(dpdf[col].dtype)
            # all-NULL columns surface as object/float on either side —
            # kind is meaningless there, and the value differential
            # already covers NULL parity.
            if spdf[col].isna().all() and dpdf[col].isna().all():
                continue
            if (sk != dk) and ("other" not in (sk, dk) or "bool" in (sk, dk)):
                problems.append(
                    f"{name}.{col}: spark pandas kind {sk} ({spdf[col].dtype}) "
                    f"!= duckdb {dk} ({dpdf[col].dtype}) — int-vs-float/bool "
                    f"divergence is the agg_conditional r3/r4 failure class"
                )

    assert not problems, "\n".join(problems)
