#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run Verify's parquet dumps
against the DuckDB oracle SQL and compare (columns sorted by name, rows
sorted, exact values). Usage:
    python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes for compare: timestamps -> ns, categorials -> str
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        na_position="last")
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            results[name] = "EMPTY-DIR"
            continue
        if name not in oracle:
            # rows-only check: array/struct columns may not be sortable
            n = con.sql(f"SELECT COUNT(*) FROM '{d}/*.parquet'").fetchone()[0]
            results[name] = f"NO-ORACLE rows={n}"
            continue
        got = norm(con.sql(f"SELECT * FROM '{d}/*.parquet'").df())
        try:
            want = norm(con.sql(oracle[name]).df())
        except Exception as e:
            results[name] = f"ORACLE-SQL-ERROR {e}"
            continue
        if list(got.columns) != list(want.columns):
            results[name] = f"COLS got={list(got.columns)} want={list(want.columns)}"
            continue
        if len(got) != len(want):
            results[name] = f"ROWS got={len(got)} want={len(want)}"
            continue
        bad = []
        for c in got.columns:
            g, w = got[c], want[c]
            if g.dtype.kind == "f" or w.dtype.kind == "f":
                g = g.astype(float); w = w.astype(float)
                eq = (g.values == w.values) | (g.isna().values & w.isna().values)
                if not eq.all():
                    i = int(np.argmin(eq))
                    bad.append(f"{c}[{i}]: {g.iloc[i]!r} != {w.iloc[i]!r} "
                               f"(maxdiff={np.nanmax(np.abs(g.values - w.values))})")
            else:
                eq = (g.astype(str).values == w.astype(str).values)
                if not eq.all():
                    i = int(np.argmin(eq))
                    bad.append(f"{c}[{i}]: {g.iloc[i]!r} != {w.iloc[i]!r}")
        results[name] = "OK rows=%d" % len(got) if not bad else "VALUES " + "; ".join(bad[:3])
    npass = sum(1 for v in results.values() if v.startswith("OK"))
    for k, v in results.items():
        print(("PASS " if v.startswith("OK") else "FAIL ") + k + ": " + v)
    print(f"== {npass}/{len(results)} PASS")
    # Self-published machine-readable gate (round-12 verdict task 2a):
    # the driver's CORRECTNESS artifact has come back `{}` two rounds
    # running, so the repo publishes its own in the driver's per-query
    # schema. Written to the repo root (parent of tools/) and committed
    # each round so the judge always has a hard signal. ONLY a FULL
    # gate may write it: a targeted (SPARK_GRAFT_ONLY) run has dump
    # dirs for a subset of the oracle surface and must never replace
    # the committed full-gate artifact with a partial one.
    if len(results) < len(oracle):
        print(f"(partial gate {len(results)}/{len(oracle)} — "
              "CORRECTNESS_SELF.json not written)")
        return 0 if npass == len(results) else 1
    self_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "CORRECTNESS_SELF.json")
    per_q = {}
    for k, v in sorted(results.items()):
        ok = v.startswith("OK")
        no_oracle = v.startswith("NO-ORACLE")
        if no_oracle:
            # honest marker (round-13 advice): a rows-only check verified
            # NOTHING about schema or values — say so instead of counting
            # it as matching.
            per_q[k] = {"oracle": False, "rows_match": None,
                        "schema_match": None, "hash_match": None,
                        "err": None, "note": v}
            continue
        per_q[k] = {
            "oracle": True,
            "rows_match": ok,
            "schema_match": ok,
            "hash_match": ok,          # exact-value compare == hash match
            "err": None if ok else v,
        }
    with open(self_path, "w") as f:
        json.dump({"sf_dir": sf_dir, "out_dir": out_dir,
                   "n_pass": npass, "n_total": len(results),
                   "queries": per_q}, f, indent=1)
    print(f"wrote {self_path}")
    return 0 if npass == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
