"""JSONPath recursive descent (SURVEY.md §2.7 F14, §7 hard point 5).

The reference queries apollo-state blobs with ``$..["key"]`` deep-scan
paths (web_scraping.py:309,318,328-329). Spark's ``get_json_object``
does not support ``$..``, so this is the engine's one deliberate
Python-UDF scalar: a stdlib recursive-descent collector, registered as
an Arrow-friendly UDF. Everything downstream of the one-time
apollo-state parse uses fixed schemas + ``from_json`` (the fast path);
this UDF exists for the schema-unknown first touch only — keep it OFF
fact-scale hot paths.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F
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


_json_descend_udf = F.udf(json_descend_py, ArrayType(StringType()))


def json_descend(blob: Column, key: str) -> Column:
    """`$..["key"]` over a JSON string column → array<string> of every
    match (objects/arrays re-serialized as JSON text)."""
    return _json_descend_udf(blob, F.lit(key))
