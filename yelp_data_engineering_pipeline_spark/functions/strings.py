"""String helpers that Spark lacks as built-ins (SURVEY.md §2.7).

Everything here is a *Column → Column* expression composed from JVM
built-ins (stays inside whole-stage codegen) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Single-pass entity replacement, same one-level semantics as python's
# html.unescape for the five common entities the reference encounters
# (web_scraping.py:292). '&amp;' MUST be last so '&amp;lt;' → '&lt;'
# (not '<') in one pass.
_HTML_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]


def html_unescape(col: Column) -> Column:
    out = col
    for entity, char in _HTML_ENTITIES:
        out = F.replace(out, F.lit(entity), F.lit(char))
    return out


def strip_query_string(url: Column) -> Column:
    """`rsplit('?', 1)[0]` equivalent (web_scraping.py:114)."""
    return F.substring_index(url, "?", 1)


def normalize_business_url(path: Column) -> Column:
    """Prefix the site origin and drop the query string
    (web_scraping.py:114)."""
    return F.concat(F.lit("https://www.yelp.com"), strip_query_string(path))
