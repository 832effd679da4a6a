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
    args = [a for a in sys.argv[1:] if a != "--docs-only"]
    docs_only = "--docs-only" in sys.argv  # skip star tables (100x tier)
    build_stress(
        src=args[0] if len(args) > 0 else "/root/testdata/sf0.1",
        out=args[1] if len(args) > 1 else "/tmp/stressx10",
        factor=int(args[2]) if len(args) > 2 else 10,
        docs_only=docs_only,
    )


def build_stress(
    src: str, out: str, factor: int = 10, docs_only: bool = False,
    star_only: bool = False,
) -> None:
    """Importable entry point (tests/test_stress_smoke.py builds its
    tier through this; the CLI above just forwards argv). ``star_only``
    skips the docs/embeddings/events blowup and the composite check dir
    — the cheap path for the star-axis pytest smoke (r7)."""
    import os

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    if star_only:
        _build_star(con, src, out, factor)
        for t in ("lineitem", "orders", "customer", "supplier", "part"):
            n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
            print(f"{out}/{t}.parquet: {n} rows")
        return
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
      CROSS JOIN (SELECT unnest(range({factor})) AS i) r
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
      CROSS JOIN (SELECT unnest(range({factor})) AS i) r
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
      CROSS JOIN (SELECT unnest(range({factor})) AS i) r
    ) TO '{out}/events.parquet' (FORMAT PARQUET)
    """)
    # Star tables at 10x with FK integrity preserved: replica i offsets
    # every key by its table's sf0.1 cardinality (custkey +15000*i,
    # orderkey +150000*i, suppkey +1000*i, partkey +20000*i) on BOTH the
    # primary and every referencing side, so join fan-outs stay exactly
    # the per-replica fan-out — the honest scaling axis for the TPC-H
    # tier (VERDICT r4 next-5). region/nation are fixed dims (5/25 rows
    # at every scale factor) and stay as-is.
    if not docs_only:
        _build_star(con, src, out, factor)
    report = ("documents", "embeddings", "events") if docs_only else (
        "documents", "embeddings", "events", "lineitem", "orders",
        "customer", "supplier", "part")
    for t in report:
        n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{out}/{t}.parquet: {n} rows")

    _build_check_dir(src, out)


def _build_star(con, src: str, out: str, factor: int) -> None:
    """Star tables at ``factor``x with FK integrity preserved (see the
    offset comment in build_stress's original block)."""
    import os

    C, O, S, P = 15_000, 150_000, 1_000, 20_000
    rep = f"CROSS JOIN (SELECT unnest(range({factor})) AS i) r"
    con.sql(f"""
    COPY (
      SELECT c_custkey + {C}*r.i AS c_custkey,
             c_name || '_r' || r.i AS c_name,
             c_nationkey, c_acctbal, c_mktsegment
      FROM '{src}/customer.parquet' {rep}
    ) TO '{out}/customer.parquet' (FORMAT PARQUET)
    """)
    con.sql(f"""
    COPY (
      SELECT s_suppkey + {S}*r.i AS s_suppkey,
             s_name || '_r' || r.i AS s_name,
             s_nationkey, s_acctbal
      FROM '{src}/supplier.parquet' {rep}
    ) TO '{out}/supplier.parquet' (FORMAT PARQUET)
    """)
    con.sql(f"""
    COPY (
      SELECT p_partkey + {P}*r.i AS p_partkey,
             p_name || '_r' || r.i AS p_name,
             p_brand, p_type, p_size, p_retailprice
      FROM '{src}/part.parquet' {rep}
    ) TO '{out}/part.parquet' (FORMAT PARQUET)
    """)
    con.sql(f"""
    COPY (
      SELECT o_orderkey + {O}*r.i AS o_orderkey,
             o_custkey + {C}*r.i AS o_custkey,
             o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM '{src}/orders.parquet' {rep}
    ) TO '{out}/orders.parquet' (FORMAT PARQUET)
    """)
    con.sql(f"""
    COPY (
      SELECT l_orderkey + {O}*r.i AS l_orderkey,
             l_partkey + {P}*r.i AS l_partkey,
             l_suppkey + {S}*r.i AS l_suppkey,
             l_linenumber, l_quantity, l_extendedprice, l_discount,
             l_tax, l_returnflag, l_linestatus, l_shipdate
      FROM '{src}/lineitem.parquet' {rep}
    ) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
    """)
    for t in ("region", "nation"):
        dst = f"{out}/{t}.parquet"
        if not os.path.lexists(dst):
            os.symlink(f"{src}/{t}.parquet", dst)


def _build_check_dir(src: str, out: str) -> None:
    """Composite check dir: 10x scaled tables + the sf0.1 star tables,
    so tools/check_oracle.py can run the full VALUE differential at the
    10x tier (this sweep caught the OLS int64 overflow and two planner
    broadcast-OOM traps in round 4):
      python tools/check_oracle.py --bare /tmp/stresscheck <entries...>
    """
    import os

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
