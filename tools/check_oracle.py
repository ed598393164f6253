#!/usr/bin/env python3
"""Local dev mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]

Assumes `graft.Verify` already ran into <verifyOutDir> (parquet per query
+ oracle_sql.json). For each query: run the oracle SQL in DuckDB with a
view per table, load the Spark parquet, sort columns by name, compare
schema + values exactly (floats: exact first, then 1e-9 tolerance note).
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_type(t: str) -> str:
    t = str(t).upper()
    return {"INTEGER": "INT32", "INT": "INT32", "BIGINT": "INT64",
            "HUGEINT": "INT128", "VARCHAR": "STRING", "DOUBLE": "FLOAT64",
            "FLOAT": "FLOAT32", "DATE": "DATE", "BOOLEAN": "BOOL"}.get(t, t)


def cells_equal(a, b):
    if a is None and b is None:
        return True, False
    if isinstance(a, float) and isinstance(b, float):
        if a == b or (math.isnan(a) and math.isnan(b)):
            return True, False
        if math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12):
            return True, True   # equal only with tolerance -> flag
        return False, False
    return a == b, False


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # Bound the allocator so one heavy statement spills to temp instead of
    # exhausting the box (the default limit is 80% of RAM; an OOM'd
    # statement can cascade-fail every later one in the same process).
    con.execute("SET memory_limit='32GB'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    failures = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        pq = Path(out_dir, name)
        if not pq.exists():
            print(f"FAIL {name}: no spark output at {pq}")
            failures += 1
            continue
        try:
            duck = con.execute(sql)
            d_cols = [c[0] for c in duck.description]
            d_types = [str(c[1]) for c in duck.description]
            d_rows = duck.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        sp = con.execute(f"SELECT * FROM read_parquet('{pq}/*.parquet')")
        s_cols = [c[0] for c in sp.description]
        s_types = [str(c[1]) for c in sp.description]
        s_rows = sp.fetchall()
        # driver sorts columns by name before hashing
        d_ix = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
        s_ix = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
        if [d_cols[i] for i in d_ix] != [s_cols[i] for i in s_ix]:
            print(f"FAIL {name}: columns differ spark={sorted(s_cols)} oracle={sorted(d_cols)}")
            failures += 1
            continue
        ty_mismatch = [
            (s_cols[si], norm_type(s_types[si]), norm_type(d_types[di]))
            for si, di in zip(s_ix, d_ix)
            if norm_type(s_types[si]) != norm_type(d_types[di])]
        if len(d_rows) != len(s_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} oracle={len(d_rows)}")
            failures += 1
            continue
        bad = tol = 0
        first_bad = None
        for r, (dr, sr) in enumerate(zip(d_rows, s_rows)):
            for si, di in zip(s_ix, d_ix):
                eq, tolerated = cells_equal(sr[si], dr[di])
                if tolerated:
                    tol += 1
                if not eq:
                    bad += 1
                    if first_bad is None:
                        first_bad = (r, s_cols[si], sr[si], dr[di])
        if bad:
            print(f"FAIL {name}: {bad} cell mismatches; first at row {first_bad[0]} col {first_bad[1]}: spark={first_bad[2]!r} oracle={first_bad[3]!r}")
            failures += 1
        else:
            notes = []
            if ty_mismatch:
                notes.append(f"TYPE-MISMATCH {ty_mismatch}")
            if tol:
                notes.append(f"{tol} float cells only equal within tolerance")
            note = ("  [" + "; ".join(notes) + "]") if notes else ""
            print(f"ok   {name}: {len(s_rows)} rows{note}")
    print(f"\n{'ALL OK' if failures == 0 else str(failures) + ' FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
