#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output
against DuckDB oracles on the same parquet tables.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

(Dev tool only — the Scala library has no python dependency.)
"""
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
            exp = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        ok_shape = got.shape == exp.shape and list(got.columns) == list(exp.columns)
        ok = False
        if ok_shape:
            for c in got.columns:
                if str(got[c].dtype) != str(exp[c].dtype):
                    print(f"WARN {name}: dtype mismatch on {c}: "
                          f"spark={got[c].dtype} oracle={exp[c].dtype}")
            try:
                pd.testing.assert_frame_equal(
                    got, exp, check_dtype=False, check_exact=True)
                ok = True
            except AssertionError as e:
                msg = str(e).splitlines()
                print(f"FAIL {name}: value mismatch: {msg[0]}")
                for line in msg[1:6]:
                    print("   ", line)
        else:
            print(f"FAIL {name}: shape {got.shape}{list(got.columns)} "
                  f"vs oracle {exp.shape}{list(exp.columns)}")
        if ok:
            print(f"PASS {name} ({got.shape[0]} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
