#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_correctness.py <verify_out_dir> <sf_dir>

Bit-faithful to the driver's pandas-based canonicalizer (round-3 lesson:
a fetchall()-based compare silently converts DuckDB HUGEINT to Python
int and accepts ordered rows, hiding two failures the driver caught):

- Spark results are loaded with pandas.read_parquet, the oracle with
  duckdb .df() — so DuckDB HUGEINT surfaces as float64 and mismatches an
  int64 Spark column exactly like it does at the gate.
- Both frames are column-sorted by name, then row-sorted with
  DataFrame.sort_values over ALL columns — an ARRAY output column raises
  TypeError here (unhashable numpy.ndarray), reported as ERR like the
  driver run does.
- Values canonicalize dtype-sensitively: floats as '%.6f' (so 2082.0
  never equals int 2082), ints bare, NaN/None as NULL markers.
  Timestamps/dates normalize to ISO so pyarrow date objects vs duckdb
  datetime64 don't false-positive.
"""
import json, math, sys, glob
import datetime
import duckdb
import numpy as np
import pandas as pd


def canon(v):
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return "NULL"
        return f"{float(v):.6f}"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        if v == v.normalize():
            return v.date().isoformat()
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.datetime):
        return canon(pd.Timestamp(v))
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def canon_frame(df):
    """Sort columns by name, rows by all columns (driver order), then
    canonicalize every cell. Raises on unsortable (array) columns."""
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return [[canon(v) for v in row] for row in df.itertuples(index=False, name=None)]


def main(out_dir, sf_dir):
    con = duckdb.connect()
    tables = ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]
    for t in tables:
        con.execute(f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"[MISS] {name}: no result parquet"); fail += 1; continue
        try:
            mine = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
            theirs = con.execute(sql).df()
        except Exception as e:
            print(f"[ERR ] {name}: {e}"); fail += 1; continue
        if sorted(mine.columns) != sorted(theirs.columns):
            print(f"[COLS] {name}: mine={sorted(mine.columns)} oracle={sorted(theirs.columns)}")
            fail += 1; continue
        if len(mine) != len(theirs):
            print(f"[ROWS] {name}: mine={len(mine)} oracle={len(theirs)}")
            fail += 1; continue
        try:
            ca, cb = canon_frame(mine), canon_frame(theirs)
        except Exception as e:
            print(f"[ERR ] {name}: canonicalize: {type(e).__name__}: {e}")
            fail += 1; continue
        bad = next(((i, a, b) for i, (a, b) in enumerate(zip(ca, cb)) if a != b), None)
        if bad:
            print(f"[HASH] {name}: first diff at sorted row {bad[0]}:\n  mine  ={bad[1]}\n  oracle={bad[2]}")
            fail += 1
        else:
            print(f"[ OK ] {name} ({len(mine)} rows)")
            ok += 1
    print(f"\n{ok} ok, {fail} failed")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
