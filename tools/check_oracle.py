#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (driver-side tooling only —
not part of the shipped Scala library).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json query in DuckDB against the parquet tables in
sfDir, loads the corresponding Spark parquet result, and compares
row-count, schema (column names) and values (rows sorted, columns sorted
by name). Prints one line per query: OK / MISMATCH / SPARK-MISSING.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    import numpy as np
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            # lists/arrays → tuples so rows sort and compare
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple, np.ndarray)) else v)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        import decimal
        if isinstance(a, decimal.Decimal) or isinstance(b, decimal.Decimal):
            return decimal.Decimal(str(a)) == decimal.Decimal(str(b))
    except Exception:
        pass
    return a == b


def main() -> None:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"ORACLE-ERR  {name}: {str(e).splitlines()[0][:160]}")
            n_bad += 1
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"SPARK-MISSING {name}: {e}")
            n_bad += 1
            continue
        w, g = canon(want), canon(got)
        if list(w.columns) != list(g.columns):
            print(f"SCHEMA-MISMATCH {name}: oracle={list(w.columns)} spark={list(g.columns)}")
            n_bad += 1
            continue
        if len(w) != len(g):
            print(f"ROWS-MISMATCH {name}: oracle={len(w)} spark={len(g)}")
            n_bad += 1
            continue
        bad_cells = []
        for c in w.columns:
            wv, gv = list(w[c]), list(g[c])
            for i, (x, y) in enumerate(zip(wv, gv)):
                if not values_equal(x, y):
                    bad_cells.append((c, i, x, y))
                    if len(bad_cells) >= 3:
                        break
            if bad_cells:
                break
        if bad_cells:
            c, i, x, y = bad_cells[0]
            print(f"VALUE-MISMATCH {name}: col={c} row={i} oracle={x!r} spark={y!r}")
            n_bad += 1
        else:
            print(f"OK          {name} ({len(w)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
