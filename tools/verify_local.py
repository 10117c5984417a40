#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only — the Scala
library never depends on this). Runs DuckDB on each oracle_sql.json entry and
compares against the parquet Verify dumped, strictly:
  - columns sorted by name
  - rows sorted by all columns
  - exact value equality (floats must be bit-equal; we report max abs diff)
Usage: python3 tools/verify_local.py <sfDir> <verifyOutDir>
"""
import json, math, sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    # oracle SQL must be timezone-independent, but pin UTC anyway so a
    # non-UTC host can't shift any timestamptz-routed expression
    con.sql("SET TimeZone='UTC'")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = norm(con.sql(f"SELECT * FROM ({sql}) q").df())
            exp = norm(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: load error: {e}")
            n_fail += 1
            continue
        problems = []
        if list(got.columns) != list(exp.columns):
            problems.append(f"columns duckdb={list(got.columns)} spark={list(exp.columns)}")
        elif len(got) != len(exp):
            problems.append(f"rows duckdb={len(got)} spark={len(exp)}")
        else:
            for c in got.columns:
                g, e = got[c], exp[c]
                if str(g.dtype) != str(e.dtype):
                    problems.append(f"dtype[{c}] duckdb={g.dtype} spark={e.dtype}")
                if g.dtype.kind == "f":
                    ga, ea = g.fillna(math.nan).values, e.fillna(math.nan).values
                    neq = [(x, y) for x, y in zip(ga, ea)
                           if x != y and not (math.isnan(x) and math.isnan(y))]
                    if neq:
                        mx = max(abs(x - y) for x, y in neq)
                        problems.append(f"float[{c}] {len(neq)} diffs, max={mx:.3e}")
                else:
                    neq = (g.astype(str) != e.astype(str)).sum()
                    if neq:
                        idx = (g.astype(str) != e.astype(str)).idxmax()
                        problems.append(
                            f"val[{c}] {neq} diffs, first@{idx}: duckdb={g[idx]!r} spark={e[idx]!r}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
