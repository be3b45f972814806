#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the
same test tables, sorts columns by name + rows by all columns, and
compares values exactly.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint", "Int", "UInt")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
        elif df[c].dtype == bool:
            df[c] = df[c].astype(bool)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = normalize(pd.read_parquet(f"{out_dir}/{name}"))
            exp = normalize(con.execute(sql).df())
            if list(got.columns) != list(exp.columns):
                raise AssertionError(
                    f"columns differ: spark={list(got.columns)} oracle={list(exp.columns)}")
            if len(got) != len(exp):
                raise AssertionError(f"rows differ: spark={len(got)} oracle={len(exp)}")
            for c in got.columns:
                g, e = got[c], exp[c]
                if str(g.dtype) == "float64":
                    import numpy as np
                    bad = ~(np.isclose(g, e, rtol=0, atol=0) | (g.isna() & e.isna()))
                else:
                    bad = ~((g == e) | (g.isna() & e.isna()))
                if bad.any():
                    i = bad.idxmax()
                    raise AssertionError(
                        f"col {c} row {i}: spark={g[i]!r} oracle={e[i]!r} "
                        f"({int(bad.sum())} mismatches)")
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: {exc}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
