#!/usr/bin/env python3
"""Deterministic N-replica upsample of a testdata SF directory (dev
harness for the PLANS.md scale datapoints; driver-side python only).

Usage: tools/upsample.py <srcDir> <dstDir> <replicas> [--mutate]
  e.g.  tools/upsample.py /root/testdata/sf0.1 /tmp/sfup10 100
        tools/upsample.py /root/testdata/sf0.1 /tmp/sfup10m 100 --mutate

Keys are shifted by replica * 10^7 so joins stay consistent; nation/
region (constant dims) are copied as-is.

Two document modes:

- default: documents get a per-replica TAIL TAG so the EXACT-duplicate
  rate stays realistic. Caveat (see PLANS.md): the tail tag does NOT
  perturb MinHash signatures (min over mostly-shared shingles), so
  signature-level dedup queries measure an upsampling artifact at high
  replica counts — use low factors (~10) for those, any factor for
  scan/join/agg/training queries.

- --mutate: per-replica TOKEN RENAMING — every whitespace token t in
  replica r > 0 becomes t<US>r (US = unit separator \\x1f, absent from
  the source corpus, checked). The map t -> t<US>r is injective and
  applied identically to every document of the replica, so each
  replica is a vocabulary-isomorphic copy of the source corpus:
  within-replica shingle-set relationships (Jaccard, exact-dup
  structure, near-dup cluster shapes) are preserved EXACTLY, while
  across replicas the token sets are DISJOINT — cross-replica Jaccard
  is 0 by construction and MinHash/LSH cannot bucket replicas
  together. N replicas therefore carry exactly N x the source's
  duplicate structure: the realistic-duplicate-rate upsample that
  signature-level dedup queries need (PLANS.md round-8 datapoint).
"""
import os, sys, shutil, time
import duckdb

def main():
    if len(sys.argv) not in (4, 5) or (len(sys.argv) == 5 and sys.argv[4] != '--mutate'):
        sys.exit(__doc__)
    src, dst, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    mutate = len(sys.argv) == 5
    K = 10_000_000
    os.makedirs(dst, exist_ok=True)  # DuckDB COPY won't create parents
    con = duckdb.connect()
    con.execute("SET threads TO 16")

    def gen(table, sel):
        t0 = time.time()
        con.execute(f"COPY ({sel}) TO '{dst}/{table}.parquet' "
                    "(FORMAT PARQUET, COMPRESSION ZSTD)")
        n = con.sql(f"SELECT count(*) FROM read_parquet('{dst}/{table}.parquet')").fetchone()[0]
        print(f"{table} {n} {time.time()-t0:.1f}s")

    rep = lambda t: f"read_parquet('{src}/{t}.parquet') CROSS JOIN range({reps}) t(r)"
    gen('lineitem', f"""SELECT l_orderkey + r*{K} AS l_orderkey, l_partkey + r*{K} AS l_partkey,
      l_suppkey + r*{K} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount,
      l_tax, l_returnflag, l_linestatus, l_shipdate FROM {rep('lineitem')}""")
    gen('orders', f"""SELECT o_orderkey + r*{K} AS o_orderkey, o_custkey + r*{K} AS o_custkey,
      o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM {rep('orders')}""")
    gen('customer', f"""SELECT c_custkey + r*{K} AS c_custkey, c_name, c_nationkey,
      c_acctbal, c_mktsegment FROM {rep('customer')}""")
    gen('supplier', f"""SELECT s_suppkey + r*{K} AS s_suppkey, s_name, s_nationkey,
      s_acctbal FROM {rep('supplier')}""")
    gen('part', f"""SELECT p_partkey + r*{K} AS p_partkey, p_name, p_brand, p_type,
      p_size, p_retailprice FROM {rep('part')}""")
    if mutate:
        # the renaming separator must be absent from the source text (or
        # replica-0 tokens could collide with renamed ones), and the text
        # must be strictly single-space tokenized (tabs/newlines/multiple
        # spaces would make string_split(' ') disagree with the engine's
        # strings.Fields tokenization and break the isomorphism)
        n_bad = con.sql(
            f"SELECT count(*) FROM read_parquet('{src}/documents.parquet') "
            "WHERE contains(text, chr(31)) "
            "   OR regexp_matches(text, '[\\t\\n\\r\\x0b\\x0c]|  ') "
            "   OR text LIKE ' %' OR text LIKE '% '").fetchone()[0]
        assert n_bad == 0, f"{n_bad} source docs break the --mutate preconditions"
        mutated = ("array_to_string(list_transform(string_split(text, ' '), "
                   "t -> t || chr(31) || r), ' ')")
        new_text = f"CASE WHEN r = 0 THEN text ELSE {mutated} END"
    else:
        new_text = "CASE WHEN r = 0 THEN text ELSE text || ' r' || r END"
    # n_chars recomputed so it stays consistent with the rewritten text
    gen('documents', f"""SELECT doc_id + r*{K} AS doc_id,
      {new_text} AS text,
      lang, source,
      CAST(len({new_text}) AS BIGINT) AS n_chars
      FROM {rep('documents')}""")
    gen('embeddings', f"""SELECT vec_id + r*{K} AS vec_id, embedding, label
      FROM {rep('embeddings')}""")
    gen('events', f"""SELECT event_id + r*{K} AS event_id, ts, user_id + r*{K} AS user_id,
      event_type, value, props FROM {rep('events')}""")
    for t in ('nation', 'region'):
        shutil.copy(f'{src}/{t}.parquet', f'{dst}/{t}.parquet')
    print("dims copied")

if __name__ == '__main__':
    main()
