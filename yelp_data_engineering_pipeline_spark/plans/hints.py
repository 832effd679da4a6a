"""Join-strategy hint selection that respects the session's memory
posture.

Some operator joins carry an O(corpus)-sized side (shingle-set arrays,
per-node label frames) that must NEVER broadcast — at scale a planner
broadcast of such a side kills the driver (observed at the 10× stress
tier, round 4). The remaining choice is shuffled-hash vs sort-merge:

- **shuffled-hash** skips the sort and wins on wide array payloads, but
  its per-partition build map needs real execution memory — under a
  bare 1 GiB driver heap it dies with "Can't acquire N bytes to build
  hash relation" (observed round 5, composed minhash→graph at 10×);
- **sort-merge** spills gracefully at any heap size.

Spark already has a first-class switch for exactly this preference:
``spark.sql.join.preferSortMergeJoin``. The engine session factory
(session.py) sets it false — it provisions an 8g driver and wants the
fast build. A bare session keeps Spark's default (true) and the same
operator code degrades to the spill-safe strategy instead of OOMing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def nonbroadcast_hint(df: DataFrame) -> str:
    """The join hint for a side that must not broadcast: "shuffle_hash"
    when the session opts into hash builds, else spill-safe "merge"."""
    prefer_smj = df.sparkSession.conf.get("spark.sql.join.preferSortMergeJoin", "true")
    return "merge" if str(prefer_smj).lower() == "true" else "shuffle_hash"
