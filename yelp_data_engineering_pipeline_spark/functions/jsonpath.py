"""JSONPath recursive descent (SURVEY.md §2.7 F14, §7 hard point 5).

The reference queries apollo-state blobs with ``$..["key"]`` deep-scan
paths (web_scraping.py:309,318,328-329). Spark's ``get_json_object``
does not support ``$..``, so this is the engine's one deliberate
Python scalar: a stdlib recursive-descent collector, shipped as an
ARROW-BATCHED ``pandas_udf`` (VERDICT r9 next-6 retired the last
row-at-a-time ``F.udf`` here — same per-value stdlib descent, but the
blobs cross the JVM↔Python boundary in Arrow record batches instead
of one pickled row at a time). Everything downstream of the one-time
apollo-state parse uses fixed schemas + ``from_json`` (the fast path);
this UDF exists for the schema-unknown first touch only — keep it OFF
fact-scale hot paths.
"""

from __future__ import annotations

import json
from typing import Any

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType


def descend(obj: Any, key: str, out: list[Any]) -> None:
    """Collect every value under ``key`` at any depth (the `$..["key"]`
    semantics: dict-order document traversal)."""
    if isinstance(obj, dict):
        for k, v in obj.items():
            if k == key:
                out.append(v)
            descend(v, key, out)
    elif isinstance(obj, list):
        for v in obj:
            descend(v, key, out)


def json_descend_py(blob: str | None, key: str | None) -> list[str] | None:
    if blob is None or key is None:
        return None
    try:
        doc = json.loads(blob)
    except ValueError:
        return None
    out: list[Any] = []
    descend(doc, key, out)
    # serialize each hit so heterogeneous value types fit one column
    return [v if isinstance(v, str) else json.dumps(v) for v in out]


@pandas_udf(ArrayType(StringType()))
def _json_descend_pudf(blob: pd.Series, key: pd.Series) -> pd.Series:
    """Arrow-batched transport around the same stdlib descent: one
    Python invocation per RECORD BATCH (vs one per row for F.udf), the
    10-100x UDF-boundary win the pyspark guide measures. pandas NaN
    (Arrow null) normalizes to None before the scalar twin runs."""
    return pd.Series([
        json_descend_py(None if not isinstance(b, str) else b,
                        None if not isinstance(k, str) else k)
        for b, k in zip(blob, key)
    ])


def json_descend(blob: Column, key: str) -> Column:
    """`$..["key"]` over a JSON string column → array<string> of every
    match (objects/arrays re-serialized as JSON text)."""
    return _json_descend_pudf(blob, F.lit(key))
