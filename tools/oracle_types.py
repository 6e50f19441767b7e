#!/usr/bin/env python3
"""Dtype guard for the oracle surface (round-6 lesson): DuckDB SUM over
integers returns HUGEINT, which pandas materializes as float64 and the
driver's dtype-sensitive hash rejects even when every value matches.
This audit runs every oracle's type signature and fails on any
HUGEINT/UHUGEINT output column. Run after Verify:

    python3 tools/oracle_types.py <sfDir> <verifyOutDir>

(only reads <verifyOutDir>/oracle_sql.json; sf0.001 is enough).
"""
import sys, os, json
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    bad = []
    for name, q in sorted(oracle.items()):
        try:
            rel = con.sql(q)
            hits = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
                    if str(t) in ("HUGEINT", "UHUGEINT")]
            if hits:
                bad.append((name, hits))
        except Exception as e:  # noqa: BLE001 - report, keep auditing
            bad.append((name, f"SQL-ERROR {str(e)[:160]}"))
    for name, detail in bad:
        print(f"BAD {name}: {detail}")
    print(f"== {len(oracle) - len(bad)}/{len(oracle)} oracles dtype-clean")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
