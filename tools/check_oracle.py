#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [--json <path>]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB against the raw testdata
parquet tables, and compares: row count, column names, and exact values
(columns sorted by name, rows sorted by all columns).

With --json <path>, also writes a machine-readable per-query summary
(the round's SELF-ATTESTATION record — round-14's driver-side
CORRECTNESS_r14.json came back `{}`, leaving the round unattested; a
committed self-run record makes that impossible to repeat silently).
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str, json_out: str | None = None) -> int:
    con = duckdb.connect()
    # Derive the table list from the testdata dir (single source of truth —
    # a second hardcoded list here would drift from graft.Tables.names).
    for path in sorted(glob.glob(f"{sf_dir}/*.parquet")):
        t = os.path.splitext(os.path.basename(path))[0]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = 0
    n_skip = 0
    record = {}
    for name, sql in sorted(oracle.items()):
        # A dump dir produced with SPARK_GRAFT_VERIFY_ONLY holds a subset;
        # absent results are "not run here", not failures.
        if not os.path.exists(f"{out_dir}/{name}"):
            n_skip += 1
            record[name] = {"status": "not_dumped"}
            continue
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
            duck_df = con.execute(sql).df()
            a, b = norm(spark_df), norm(duck_df)
            if list(a.columns) != list(b.columns):
                print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
                record[name] = {"status": "fail", "why": "columns"}
                n_fail += 1
                continue
            if len(a) != len(b):
                print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
                record[name] = {"status": "fail", "why": "rows"}
                n_fail += 1
                continue
            # exact compare, treating NaN == NaN; report first mismatch
            neq = ~((a.values == b.values) | (a.isna().values & b.isna().values))
            if neq.any():
                r, c = [x[0] for x in neq.nonzero()]
                col = a.columns[c]
                print(f"FAIL {name}: value mismatch at row {r} col {col}: "
                      f"spark={a.iloc[r, c]!r} duck={b.iloc[r, c]!r} "
                      f"({neq.sum()} cells differ)")
                record[name] = {"status": "fail", "why": f"values:{col}"}
                n_fail += 1
                continue
            print(f"PASS {name}: {len(a)} rows x {len(a.columns)} cols exact")
            record[name] = {"status": "pass", "rows": len(a),
                            "cols": len(a.columns)}
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            record[name] = {"status": "fail",
                            "why": f"{type(e).__name__}: {e}"[:300]}
            n_fail += 1
    skipped = f", {n_skip} not dumped" if n_skip else ""
    summary = (f"{'ALL PASS' if n_fail == 0 else f'{n_fail} FAILURES'} "
               f"({len(oracle) - n_skip} oracle-checked queries{skipped})")
    print(summary)
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"summary": summary, "sf_dir": sf_dir,
                       "n_queries": len(oracle), "n_checked":
                       len(oracle) - n_skip, "n_fail": n_fail,
                       "queries": record}, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("sf_dir", help="testdata dir with the raw parquet tables")
    p.add_argument("out_dir", help="graft.Verify dump dir")
    p.add_argument("--json", metavar="PATH", default=None,
                   help="also write a machine-readable per-query summary")
    a = p.parse_args()
    sys.exit(main(a.sf_dir, a.out_dir, a.json))
