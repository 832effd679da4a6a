"""NDJSON source/sink (SURVEY.md §2.1 S1/S2).

The reference appends one JSON object per line per business
(web_scraping.py:221-224,410-413) and reads files back with per-line
``json.loads`` (web_scraping.py:514-515). Spark equivalents with
explicit schemas (no inference pass — a hard requirement at 100 TB).

Write semantics: Spark's file sink is atomic per task via the commit
protocol — the exactly-once upgrade of the reference's append-lock
(ST6; the reference's per-call asyncio.Lock is actually ineffective,
web_scraping.py:410).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_ndjson(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """S2: schema-first NDJSON scan (never inferred)."""
    return spark.read.schema(schema).json(path)


def append_ndjson(df: DataFrame, path: str) -> None:
    """S1: append-mode NDJSON sink (one JSON object per line)."""
    df.write.mode("append").json(path)


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """S9: one row per line (the reference's proxies list,
    web_scraping.py:537-538)."""
    return spark.read.text(path)
