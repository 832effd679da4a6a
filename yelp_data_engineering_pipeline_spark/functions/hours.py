"""Opening-hours parsing as declarative column expressions (SURVEY.md
§2.7 F2/F4/F5, §2.8 N1).

Re-expresses the reference's ``parse_time``/``parse_hours``
(parse_and_upload_to_db.py:50-81) with JVM built-ins — regexp
extract-all, zip_with, try_to_timestamp — so the whole transformation
stays inside whole-stage codegen (the reference does this row-at-a-time
in Python).

Semantics preserved:
- ``"Closed"`` → no ranges
- ``"Open 24 hours"`` → one range (00:00:00, 23:59:59)
- ``"(Next day)"`` markers stripped before parsing (overnight ranges
  keep close < open — the open-now predicate handles the wraparound)
- multiple concatenated ranges ("11:00 AM - 3:00 PM4:30 PM - 10:00 PM")
  each become a row (split shifts)
- time-of-day is encoded as **seconds since midnight** (Spark has no
  TIME type — SURVEY §7 hard point 1)

Deliberate extension: hour-only times ("11 AM - 9 PM") parse via the
same fallback the reference's ``parse_time`` has ("%I %p"); the
reference's range REGEX however only matches "H:MM" so such strings
raise ValueError there (parse_and_upload_to_db.py:76-79) — we accept
them (FIXTURES.md A2 requires it) instead of failing the batch.

Unparseable strings yield a NULL range array (callers route these to a
quarantine instead of the reference's batch-aborting ValueError).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

OPEN_24H_CLOSE = 23 * 3600 + 59 * 60 + 59  # 23:59:59

_RANGE_RE = r"(\d{1,2}(?::\d{2})? [AP]M) - (\d{1,2}(?::\d{2})? [AP]M)"


def time_to_seconds(t: Column) -> Column:
    """'11:00 AM' / '11 PM' → seconds since midnight (int); NULL if
    unparseable. Mirrors parse_time's %I:%M %p → %I %p fallback."""
    parsed = F.coalesce(
        F.try_to_timestamp(F.trim(t), F.lit("h:mm a")),
        F.try_to_timestamp(F.trim(t), F.lit("h a")),
    )
    return (F.hour(parsed) * 3600 + F.minute(parsed) * 60).cast("int")


def hours_ranges(hours_str: Column) -> Column:
    """Hours string → array<struct<open_time:int, close_time:int>>.

    Empty array for "Closed"; NULL for unparseable input (quarantine
    signal — the reference raises ValueError here).
    """
    cleaned = F.trim(F.replace(hours_str, F.lit("(Next day)"), F.lit("")))
    opens = F.regexp_extract_all(cleaned, F.lit(_RANGE_RE), 1)
    closes = F.regexp_extract_all(cleaned, F.lit(_RANGE_RE), 2)
    parsed = F.zip_with(
        opens,
        closes,
        lambda o, c: F.struct(
            time_to_seconds(o).alias("open_time"), time_to_seconds(c).alias("close_time")
        ),
    )
    empty = F.array().cast("array<struct<open_time:int,close_time:int>>")
    return (
        F.when(cleaned == "Closed", empty)
        .when(
            cleaned == "Open 24 hours",
            F.array(
                F.struct(
                    F.lit(0).cast("int").alias("open_time"),
                    F.lit(OPEN_24H_CLOSE).cast("int").alias("close_time"),
                )
            ),
        )
        .when(F.size(parsed) > 0, parsed)
        .otherwise(F.lit(None).cast("array<struct<open_time:int,close_time:int>>"))
    )
