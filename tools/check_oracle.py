#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <out>/<query>/ parquet dump produced by graft.Verify, runs the
corresponding oracle SQL from oracle_sql.json in DuckDB against views over
the sf_dir parquet tables, and compares: schema (column names), row count,
and values (columns sorted by name; compared both order-sensitively and
after sorting rows, so we catch either driver behavior).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison: timestamps → iso strings, floats kept
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.reset_index(drop=True)


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    checked = 0
    import os
    for name, sql in sorted(oracle.items()):
        # a filtered Verify run (SPARK_GRAFT_QUERIES) dumps a subset;
        # only compare what is present
        if not os.path.exists(f"{out_dir}/{name}"):
            continue
        checked += 1
        try:
            got = norm(pd.read_parquet(f"{out_dir}/{name}"))
            want = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: exception {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = []
        if list(got.columns) != list(want.columns):
            problems.append(f"columns {list(got.columns)} != {list(want.columns)}")
        elif len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        else:
            if not got.equals(want):
                # dtype-lenient compare
                try:
                    pd.testing.assert_frame_equal(
                        got, want, check_dtype=False, check_exact=True)
                    problems.append("values equal but dtypes differ: "
                                    + str([(c, str(got[c].dtype), str(want[c].dtype))
                                           for c in got.columns
                                           if str(got[c].dtype) != str(want[c].dtype)]))
                except AssertionError as e:
                    problems.append("ordered values differ: " + str(e).split("\n")[0])
                    gs = got.sort_values(list(got.columns)).reset_index(drop=True)
                    ws = want.sort_values(list(want.columns)).reset_index(drop=True)
                    try:
                        pd.testing.assert_frame_equal(gs, ws, check_dtype=False,
                                                      check_exact=True)
                        problems.append("(row-sorted values DO match)")
                    except AssertionError:
                        pass
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            for c in got.columns:
                if c in want.columns and len(got) == len(want):
                    neq = (got[c].astype(str) != want[c].astype(str))
                    if neq.any():
                        i = neq.idxmax()
                        print(f"  first diff col={c} row={i}: "
                              f"got={got[c][i]!r} want={want[c][i]!r}")
            failures += 1
        else:
            print(f"OK   {name} ({len(got)} rows, {len(got.columns)} cols)")
    skipped = len(oracle) - checked
    note = f" ({skipped} not dumped, skipped)" if skipped else ""
    print(f"\n{checked - failures}/{checked} queries match{note}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
