#!/usr/bin/env python3
"""Same-window DuckDB yardstick for the bench headline.

Usage: python3 tools/duckdb_bench.py <sfDir> <sqlDir>

<sqlDir> holds one "<idx>_<name>.sql" file per headline query (written
by graft.Bench just before invoking this). Executes each statement
twice against DuckDB views over the same parquet tables the Spark bench
just read (pass 1 warms the OS page cache to match Spark's warm
min-of-N methodology; pass 2 is the measurement, per-query min of the
two is reported) and prints ONE JSON line:

  {"duckdb_total": <sec>, "n": <queries run>, "queries": {name: sec}}

Any per-query failure is recorded as null for that query and excluded
from the total (the driver's CORRECTNESS gate is where failures
matter; here a crash must not cost the bench its yardstick).
"""
import json
import sys
import time
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> None:
    sf_dir, sql_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # Bound the allocator so one heavy statement spills to temp instead of
    # exhausting the box (the default limit is 80% of RAM; an OOM'd
    # statement can cascade-fail every later one in the same process).
    con.execute("SET memory_limit='32GB'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    files = sorted(Path(sql_dir).glob("*.sql"))
    per: dict[str, float | None] = {}
    for f in files:
        name = f.stem.split("_", 1)[1]
        sql = f.read_text()
        try:
            times = []
            for _ in range(2):
                t0 = time.time()
                con.execute(sql).fetchall()
                times.append(time.time() - t0)
            per[name] = min(times)
        except Exception as e:  # noqa: BLE001 - yardstick must survive
            print(f"[duckdb_bench] {name} failed: {e}", file=sys.stderr)
            per[name] = None
    ok = [v for v in per.values() if v is not None]
    print(json.dumps({
        "duckdb_total": round(sum(ok), 4),
        "n": len(ok),
        "queries": {k: (round(v, 4) if v is not None else None)
                    for k, v in per.items()},
    }))


if __name__ == "__main__":
    main()
