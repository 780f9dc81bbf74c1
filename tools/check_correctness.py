#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_correctness.py <verify_out_dir> <sf_dir>
         [--json <artifact.json>] [--cache <cache_dir>] [--timing]

--json    write a CORRECTNESS-style artifact (per-query rows/schema/hash
          match + err) alongside the console report.
--cache   reuse oracle RESULTS across runs: keyed by (query name,
          sha256 of its SQL, fixture fingerprint = per-table size+mtime).
          An unchanged oracle on an unchanged fixture never re-runs —
          this is what makes the FULL sf0.1 pass tractable to repeat
          (round-12 judge directive #1). The SPARK side always re-runs;
          only the DuckDB reference is cached.
--timing  print per-query oracle wall seconds (finds the slow oracles).

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
import hashlib, json, math, os, sys, glob, time
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


def fixture_fingerprint(sf_dir, tables):
    h = hashlib.sha256()
    for t in tables:
        p = f"{sf_dir}/{t}.parquet"
        st = os.stat(p)
        h.update(f"{t}:{st.st_size}:{st.st_mtime_ns};".encode())
    return h.hexdigest()[:16]


def main(out_dir, sf_dir, json_out=None, cache_dir=None, timing=False):
    con = duckdb.connect()
    tables = ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]
    for t in tables:
        con.execute(f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fixfp = fixture_fingerprint(sf_dir, tables) if cache_dir else None
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
    ok = fail = 0
    report = {}

    def oracle_df(name, sql):
        """DuckDB result, cached by (name, sql-hash, fixture fingerprint)."""
        if not cache_dir:
            return con.execute(sql).df(), False
        key = hashlib.sha256(sql.encode()).hexdigest()[:16]
        path = f"{cache_dir}/{name}.{key}.{fixfp}.parquet"
        if os.path.exists(path):
            return pd.read_parquet(path), True
        df = con.execute(sql).df()
        df.to_parquet(path + ".tmp")
        os.replace(path + ".tmp", path)
        return df, False

    for name, sql in sorted(oracle.items()):
        rec = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None,
               "oracle_rows": None, "err": None}
        report[name] = rec
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"[MISS] {name}: no result parquet")
            rec["err"] = "no result parquet"; fail += 1; continue
        t0 = time.time()
        try:
            mine = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
            theirs, cached = oracle_df(name, sql)
        except Exception as e:
            print(f"[ERR ] {name}: {e}")
            rec["err"] = f"{type(e).__name__}: {e}"[:500]; fail += 1; continue
        wall = time.time() - t0
        tag = f" [{wall:.1f}s{' cached' if cached else ''}]" if timing else ""
        rec["spark_rows"], rec["oracle_rows"] = len(mine), len(theirs)
        if sorted(mine.columns) != sorted(theirs.columns):
            print(f"[COLS] {name}: mine={sorted(mine.columns)} oracle={sorted(theirs.columns)}")
            rec["err"] = "schema mismatch"; fail += 1; continue
        rec["schema_match"] = True
        if len(mine) != len(theirs):
            print(f"[ROWS] {name}: mine={len(mine)} oracle={len(theirs)}")
            rec["err"] = "row count mismatch"; fail += 1; continue
        rec["rows_match"] = True
        try:
            ca, cb = canon_frame(mine), canon_frame(theirs)
        except Exception as e:
            print(f"[ERR ] {name}: canonicalize: {type(e).__name__}: {e}")
            rec["err"] = f"canonicalize: {type(e).__name__}"[:500]
            fail += 1; continue
        bad = next(((i, a, b) for i, (a, b) in enumerate(zip(ca, cb)) if a != b), None)
        if bad:
            print(f"[HASH] {name}: first diff at sorted row {bad[0]}:\n  mine  ={bad[1]}\n  oracle={bad[2]}")
            rec["err"] = "hash mismatch"; fail += 1
        else:
            print(f"[ OK ] {name} ({len(mine)} rows){tag}")
            rec["hash_match"] = True
            ok += 1
    print(f"\n{ok} ok, {fail} failed")
    if json_out:
        with open(json_out + ".tmp", "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        os.replace(json_out + ".tmp", json_out)
        print(f"artifact -> {json_out}")
    return 1 if fail else 0


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("sf_dir")
    ap.add_argument("--json", dest="json_out")
    ap.add_argument("--cache", dest="cache_dir")
    ap.add_argument("--timing", action="store_true")
    a = ap.parse_args()
    sys.exit(main(a.out_dir, a.sf_dir, json_out=a.json_out,
                  cache_dir=a.cache_dir, timing=a.timing))
