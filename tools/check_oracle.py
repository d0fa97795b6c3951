#!/usr/bin/env python3
"""Local differential harness: compare Verify.scala's parquet dumps
against the DuckDB oracles in oracle_sql.json, value-by-value with
columns sorted by name (mirrors the driver's compare).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import duckdb, json, os, sys

TABLES = ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']

INT64 = {'TINYINT', 'SMALLINT', 'INTEGER', 'BIGINT',
         'UTINYINT', 'USMALLINT', 'UINTEGER'}


def norm(types):
    return ['INT64' if t in INT64 else t for t in types]


def main(sf, out):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    # The mm_frame_dedup / md5-over-text oracles slice text with
    # character-based substr while Spark hashes UTF-8 byte ranges —
    # identical only for pure-ASCII text. Fail loudly if the generator
    # ever emits non-ASCII documents instead of silently diverging.
    non_ascii = con.sql(
        "SELECT count(*) FROM documents "
        "WHERE text IS NOT NULL AND octet_length(encode(text)) <> length(text)"
    ).fetchone()[0]
    assert non_ascii == 0, (
        f"{non_ascii} non-ASCII documents.text rows: char-based DuckDB "
        "oracles (substr/md5 slicing) no longer match Spark's byte-based "
        "hashing — rewrite those oracles with encode() blob slicing")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    fails, oks = [], []
    for name, sql in sorted(oracle.items()):
        sdir = f"{out}/{name}"
        if not os.path.isdir(sdir):
            fails.append((name, "no spark output"))
            continue
        try:
            cols = sorted(con.sql(f"SELECT * FROM '{sdir}/*.parquet'").columns)
            srel = con.sql(
                f"SELECT {', '.join(cols)} FROM '{sdir}/*.parquet'")
            stypes = [str(t) for t in srel.types]
            sp = srel.fetchall()
            dcols = sorted(con.sql(sql).columns)
            drel = con.sql(
                f"SELECT {', '.join(dcols)} FROM ({sql}) q")
            dtypes = [str(t) for t in drel.types]
            dk = drel.fetchall()
        except Exception as e:
            fails.append((name, f"exec: {e}"))
            continue
        if cols != dcols:
            fails.append((name, f"cols {cols} vs {dcols}"))
        elif norm(stypes) != norm(dtypes):
            # The driver's hash is type-sensitive to width overflow:
            # DuckDB SUM(int) is HUGEINT (int128) while Spark emits
            # BIGINT, and that alone fails the driver even when every
            # value matches (r1: 8 queries). Int widths <= 64 bit all
            # hash identically, so only flag cross-family drift.
            diff = [(c, a, b) for c, a, b in
                    zip(cols, norm(stypes), norm(dtypes)) if a != b]
            fails.append((name, f"types {diff}"))
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
