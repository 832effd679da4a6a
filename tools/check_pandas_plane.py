"""Pandas-plane differential: the third comparison surface.

tools/check_oracle.py compares fetchall() Python objects; the round
driver hashes PANDAS frames (spark.toPandas() vs duckdb .df()) — a
plane where dtype conversions can diverge even when values match
(round-5 root cause: DuckDB count_if HUGEIT -> float64 vs Spark
int64). tests/test_schema_domain.py gates dtype KINDS; this harness
closes the remaining gap by comparing VALUES through the same pandas
plane the driver uses: columns sorted by name, rows sorted by value
tuple, numpy-level equality with NaN == NaN.

Usage: python tools/check_pandas_plane.py [--first-n N] [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    import datetime

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
            # DATE columns arrive as datetime.date objects from Spark but
            # datetime64 from DuckDB; the round driver tolerates this pair
            # (func_interval_arith has a green r1 row with exactly this
            # shape), so canonicalize rather than flag it.
            first = df[c].dropna().head(1)
            if len(first) and isinstance(first.iloc[0], datetime.date):
                df[c] = pd.to_datetime(df[c])
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), key=lambda s: s.map(str)).reset_index(
        drop=True
    )


def main() -> int:
    args = [a for a in sys.argv[1:]]
    first_n = None
    if "--first-n" in args:
        i = args.index("--first-n")
        first_n = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    names = [a for a in args if "/" not in a]

    import __spark_entry__ as entry
    from yelp_data_engineering_pipeline_spark.cache import release_tracked
    from yelp_data_engineering_pipeline_spark.session import get_spark

    spark = get_spark("pandas-plane")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    todo = names or list(qs)
    if first_n:
        todo = todo[:first_n]
    n_pass = n_fail = 0
    for name in todo:
        if name not in oracles:
            continue
        try:
            sp = _canon(qs[name](spark, sf_dir).toPandas())
            release_tracked()
            du = _canon(con.execute(oracles[name]).df())
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        ok = sp.shape == du.shape
        # column-name parity BEFORE the per-column loop: equal shapes
        # with different names would otherwise raise an uncaught
        # KeyError on du[c] and abort the whole sweep (ADVICE r5)
        if ok and list(sp.columns) != list(du.columns):
            ok = False
            print(f"  {name}: columns {list(sp.columns)} vs {list(du.columns)}")
        if ok:
            for c in sp.columns:
                a, b = sp[c].to_numpy(), du[c].to_numpy()
                if a.dtype.kind == "f" and b.dtype.kind == "f":
                    col_ok = bool(np.all((a == b) | (np.isnan(a) & np.isnan(b))))
                else:
                    col_ok = bool(
                        np.all(pd.isna(a) == pd.isna(b))
                        and np.all((a == b) | pd.isna(a))
                    )
                if not col_ok:
                    ok = False
                    print(f"  {name}.{c}: pandas-plane value mismatch "
                          f"(dtypes {a.dtype} vs {b.dtype})")
                    break
        else:
            print(f"  {name}: shape {sp.shape} vs {du.shape}")
        print(("PASS" if ok else "FAIL") + f" {name}")
        n_pass += ok
        n_fail += not ok
    print(f"\n{n_pass} pass, {n_fail} fail (pandas plane)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
