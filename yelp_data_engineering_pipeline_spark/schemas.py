"""Yelp-domain schemas (SURVEY.md §1).

Explicit StructTypes for every boundary the reference crosses with
implicit/inferred schemas — at 100 TB, JSON schema inference is both a
full extra pass over the data and a correctness hazard, so every
``spark.read.json`` in this engine passes one of these.

Mirrors:
- ``BUSINESS_LIST_SCHEMA`` — stage-1 work list ``businesses.ndjson``
  (reference web_scraping.py:101-115, README.md:63-71).
- ``RESULTS_SCHEMA`` — stage-1 output / stage-2 input ``results.ndjson``
  (web_scraping.py:232-247,406-408, README.md:81-105): the pydantic
  ``BusinessInfo`` contract as a Spark schema.
- ``STAR_SCHEMA_COLUMNS`` — stage-2 output, the 11-table star schema
  (model.py:9-85). TIME columns are seconds-since-midnight ints
  (Spark has no TIME type — SURVEY §7 hard point 1).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WEEKDAY_ORDER = ["Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"]

BUSINESS_LIST_SCHEMA = StructType(
    [
        StructField("bizId", StringType(), nullable=False),
        StructField("ranking", IntegerType(), nullable=True),
        StructField("name", StringType(), nullable=True),
        StructField("businessUrl", StringType(), nullable=True),
    ]
)

OPEN_HOURS_ENTRY = StructType(
    [
        StructField("weekday", StringType(), True),
        StructField("open_hours", StringType(), True),
    ]
)

AMENITY_ENTRY = StructType(
    [
        StructField("amenity", StringType(), True),
        StructField("is_available", BooleanType(), True),
    ]
)

RESULTS_SCHEMA = StructType(
    [
        StructField("bizId", StringType(), False),
        StructField("ranking", IntegerType(), True),
        StructField("name", StringType(), True),
        StructField("website", StringType(), True),
        StructField("phone_number", StringType(), True),
        StructField("open_hours", ArrayType(OPEN_HOURS_ENTRY), True),
        StructField("address", StringType(), True),
        StructField("food_category", ArrayType(StringType()), True),
        StructField("price", StringType(), True),
        StructField("health_score", StringType(), True),
        StructField("amenities", ArrayType(AMENITY_ENTRY), True),
        StructField("highlights", ArrayType(StringType()), True),
        StructField("related_search_terms", ArrayType(StringType()), True),
    ]
)

# Constraint regexes from the pydantic model (web_scraping.py:242-244).
PRICE_PATTERN = r"^\${1,4}$"
HEALTH_SCORE_PATTERN = r"^[A-Z]$"

# Star-schema table → column list (model.py:9-85); ids are bigint
# surrogates, times are seconds-since-midnight ints.
STAR_SCHEMA_COLUMNS: dict[str, list[str]] = {
    "business": ["id", "name", "website", "phone_number", "address", "price", "health_score"],
    "weekday": ["id", "name"],
    "food_category": ["id", "name"],
    "search_term": ["id", "name"],
    "highlight": ["id", "name"],
    "amenity": ["id", "name"],
    "open_hours": ["id", "business_id", "weekday_id", "open_time", "close_time"],
    "business_food_category": ["id", "business_id", "food_category_id"],
    "business_search_term": ["id", "business_id", "search_term_id"],
    "business_highlight": ["id", "business_id", "highlight_id"],
    "business_amenity": ["id", "business_id", "amenity_id", "is_available"],
}


def star_schema(table: str) -> StructType:
    """Explicit StructType for a star-schema table."""
    types = {
        "id": LongType(),
        "business_id": LongType(),
        "weekday_id": LongType(),
        "food_category_id": LongType(),
        "search_term_id": LongType(),
        "highlight_id": LongType(),
        "amenity_id": LongType(),
        "open_time": IntegerType(),
        "close_time": IntegerType(),
        "is_available": BooleanType(),
    }
    return StructType(
        [
            StructField(c, types.get(c, StringType()), nullable=(c not in ("id", "name")))
            for c in STAR_SCHEMA_COLUMNS[table]
        ]
    )
