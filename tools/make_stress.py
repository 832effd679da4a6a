"""Regenerate the 10x blowup stress dataset used by COVERAGE.md's
"10x blowup stress" table.

    python tools/make_stress.py [src_sf_dir] [out_dir]

Defaults: /root/testdata/sf0.1 -> /tmp/stressx10. Replicas are MUTATED,
not copied: replica i>0 tags every 3rd word (documents) / perturbs every
float component (embeddings), so cross-replica pairs fall BELOW near-dup
thresholds and the dup rate stays realistic — verbatim replication would
create 10-clone clusters and quadratically inflate LSH verify pairs,
stress-testing the wrong thing.
"""

from __future__ import annotations

import sys

import duckdb


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/stressx10"
    import os

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"""
    COPY (
      SELECT d.doc_id + 5000*r.i AS doc_id,
             CASE WHEN r.i = 0 THEN d.text
                  ELSE array_to_string(
                         list_transform(string_split(d.text, ' '),
                           (w, j) -> CASE WHEN j % 3 = 0 THEN 'r' || r.i || '_' || w ELSE w END),
                         ' ')
             END AS text,
             d.lang, d.source, d.n_chars
      FROM '{src}/documents.parquet' d
      CROSS JOIN (SELECT unnest(range(10)) AS i) r
    ) TO '{out}/documents.parquet' (FORMAT PARQUET)
    """)
    con.sql(f"""
    COPY (
      SELECT e.vec_id + 2000*r.i AS vec_id,
             CASE WHEN r.i = 0 THEN e.embedding
                  ELSE list_transform(e.embedding,
                         (x, j) -> CAST(x + 0.01 * r.i *
                           (CASE WHEN (j + r.i) % 2 = 0 THEN 1 ELSE -1 END) AS FLOAT))
             END AS embedding,
             e.label
      FROM '{src}/embeddings.parquet' e
      CROSS JOIN (SELECT unnest(range(10)) AS i) r
    ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
    """)
    # events: 10 replicas as DISJOINT user populations (user_id offset) —
    # per-key windows/sessions get 10x keys, the parallelism axis that
    # matters; DuckDB re-writes ts as TIMESTAMP(US), which tables.load
    # reads natively (the nanos path only triggers on the driver files).
    con.sql(f"""
    COPY (
      SELECT e.event_id + 1000000*r.i AS event_id,
             e.ts,
             e.user_id + 10000*r.i AS user_id,
             e.event_type, e.value, e.props
      FROM '{src}/events.parquet' e
      CROSS JOIN (SELECT unnest(range(10)) AS i) r
    ) TO '{out}/events.parquet' (FORMAT PARQUET)
    """)
    for t in ("documents", "embeddings", "events"):
        n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{out}/{t}.parquet: {n} rows")

    # Composite check dir: 10x scaled tables + the sf0.1 star tables, so
    # tools/check_oracle.py can run the full VALUE differential at the 10x
    # tier (this sweep caught the OLS int64 overflow and two planner
    # broadcast-OOM traps in round 4):
    #   python tools/check_oracle.py --bare /tmp/stresscheck <entries...>
    check = f"{out}check" if out.endswith("10") else f"{out}_check"
    check = "/tmp/stresscheck" if out == "/tmp/stressx10" else check
    os.makedirs(check, exist_ok=True)
    star = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
    for t in star:
        dst = f"{check}/{t}.parquet"
        if not os.path.lexists(dst):
            os.symlink(f"{src}/{t}.parquet", dst)
    for t in ("documents", "embeddings", "events"):
        dst = f"{check}/{t}.parquet"
        if os.path.lexists(dst):
            os.remove(dst)
        os.symlink(f"{out}/{t}.parquet", dst)
    print(f"{check}: composite dir for the 10x value differential")


if __name__ == "__main__":
    main()
