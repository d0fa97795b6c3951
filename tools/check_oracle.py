#!/usr/bin/env python3
"""Local differential harness: compare Verify.scala's parquet dumps
against the DuckDB oracles in oracle_sql.json, value-by-value with
columns sorted by name (mirrors the driver's compare).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import duckdb, json, os, sys

TABLES = ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']


def main(sf, out):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    fails, oks = [], []
    for name, sql in sorted(oracle.items()):
        sdir = f"{out}/{name}"
        if not os.path.isdir(sdir):
            fails.append((name, "no spark output"))
            continue
        try:
            cols = sorted(con.sql(f"SELECT * FROM '{sdir}/*.parquet'").columns)
            sp = con.sql(
                f"SELECT {', '.join(cols)} FROM '{sdir}/*.parquet'").fetchall()
            dcols = sorted(con.sql(sql).columns)
            dk = con.sql(
                f"SELECT {', '.join(dcols)} FROM ({sql}) q").fetchall()
        except Exception as e:
            fails.append((name, f"exec: {e}"))
            continue
        if cols != dcols:
            fails.append((name, f"cols {cols} vs {dcols}"))
        elif len(sp) != len(dk):
            fails.append((name, f"rows {len(sp)} vs {len(dk)}"))
        else:
            bad = next((
                (i, a, b) for i, (a, b) in enumerate(zip(sp, dk)) if a != b),
                None)
            if bad:
                fails.append((name, f"value@{bad[0]}: {bad[1]} vs {bad[2]}"))
            else:
                oks.append(name)
    print(f"OK: {len(oks)}/{len(oracle)}")
    for n, m in fails:
        print("FAIL", n, str(m)[:300])
    sys.exit(1 if fails else 0)


if __name__ == '__main__':
    main(sys.argv[1], sys.argv[2])
