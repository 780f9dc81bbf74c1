#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_correctness.py <verify_out_dir> <sf_dir>

Loads each <name>/ parquet result written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over views of the
fixture tables, and compares: column names (sorted), dtype classes, and
canonicalized row values (floats rounded to 9 significant decimals).
"""
import json, math, sys, glob
import duckdb

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(bool(v))
    return str(v)

def main(out_dir, sf_dir):
    con = duckdb.connect()
    tables = ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]
    for t in tables:
        con.execute(f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no result parquet"); fail += 1; continue
        try:
            mine = con.execute(
                f"select * from read_parquet({files!r})").fetchall()
            mine_cols = [d[0] for d in con.description]
            theirs = con.execute(sql).fetchall()
            their_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"[ERR ] {name}: {e}"); fail += 1; continue
        if sorted(mine_cols) != sorted(their_cols):
            print(f"[COLS] {name}: mine={sorted(mine_cols)} oracle={sorted(their_cols)}")
            fail += 1; continue
        # reorder oracle columns to match mine
        perm = [their_cols.index(c) for c in mine_cols]
        theirs = [tuple(r[i] for i in perm) for r in theirs]
        if len(mine) != len(theirs):
            print(f"[ROWS] {name}: mine={len(mine)} oracle={len(theirs)}")
            fail += 1; continue
        bad = None
        for i, (a, b) in enumerate(zip(mine, theirs)):
            ca, cb = [canon(x) for x in a], [canon(x) for x in b]
            if ca != cb:
                bad = (i, ca, cb); break
        if bad:
            print(f"[HASH] {name}: first diff at row {bad[0]}:\n  mine  ={bad[1]}\n  oracle={bad[2]}")
            fail += 1
        else:
            print(f"[ OK ] {name} ({len(mine)} rows)")
            ok += 1
    print(f"\n{ok} ok, {fail} failed")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
