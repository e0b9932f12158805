#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: tools/compare.py <sfDir> <verifyOut> [query ...]

Reads each <verifyOut>/<name> parquet (written by graft.Verify), runs the
matching SQL from <verifyOut>/oracle_sql.json in DuckDB over the sfDir
parquet tables, then compares row count, column-name set, and a hash of
the values with columns sorted by name and rows sorted canonically —
the same shape the driver's CORRECTNESS_r{N}.json check uses.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(con, rel_sql):
    df = con.execute(rel_sql).fetchdf()
    df = df.reindex(sorted(df.columns), axis=1)
    cols = list(df.columns)
    rows = []
    for t in df.itertuples(index=False):
        row = []
        for v in t:
            if isinstance(v, float):
                row.append(f"{v:.6g}")
            elif hasattr(v, "tolist"):  # numpy scalars / arrays
                lv = v.tolist()
                row.append(f"{lv:.6g}" if isinstance(lv, float) else str(lv))
            else:
                row.append(str(v))
        rows.append("\x01".join(row))
    rows.sort()
    return cols, len(rows), hash(tuple(rows))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    failures = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            scols, srows, shash = canon(
                con, f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            ocols, orows, ohash = canon(con, sql)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        ok = scols == ocols and srows == orows and shash == ohash
        if not ok:
            failures += 1
            print(f"FAIL {name}: rows {srows}/{orows} cols {scols}=={ocols}: "
                  f"{scols == ocols} hash {shash == ohash}")
        else:
            print(f"ok   {name} ({srows} rows)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
