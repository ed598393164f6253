#!/usr/bin/env python3
"""Deterministic N-replica upsample of a testdata SF directory (dev
harness for the PLANS.md scale datapoints; driver-side python only).

Usage: tools/upsample.py <srcDir> <dstDir> <replicas> [--mutate] [--tables=a,b]
  e.g.  tools/upsample.py /root/testdata/sf0.1 /tmp/sfup10 100
        tools/upsample.py /root/testdata/sf0.1 /tmp/sfup10m 100 --mutate
        tools/upsample.py /root/testdata/sf0.1 /tmp/sfe100 100 --mutate --tables=embeddings

--tables limits generation to the named tables (dims still copied) —
the embedding-path scale runs only need embeddings.parquet, and
skipping the 100x lineitem regeneration saves minutes per datapoint.

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

  --mutate also perturbs EMBEDDINGS: replica r > 0 gets a per-replica
  deterministic SIGN PATTERN s_r in {-1,+1}^dim (bit i of hash(r, i)),
  applied element-wise. Sign flips are exact in IEEE float, so for any
  two vectors of the SAME replica dot(s*x, s*y) = dot(x, y) with
  bit-identical arithmetic — within-replica cosine structure (near-dup
  pairs, k-means geometry, top-k rankings) is preserved EXACTLY. For
  vectors of DIFFERENT replicas the cosine becomes a random-sign
  weighted sum concentrating near 0 (measured on the sf0.1 corpus:
  avg |cos| ~ 0.2 across replicas, with a small tail that can cross a
  dedup threshold) — so N replicas carry ~N x the source's
  semantic-duplicate structure plus realistic cross-replica noise,
  instead of the all-replicas-identical explosion a plain copy would
  fake.
"""
import os, sys, shutil, time
import duckdb

def main():
    args = sys.argv[1:]
    flags = [a for a in args if a.startswith('--')]
    pos = [a for a in args if not a.startswith('--')]
    only = None
    for f in list(flags):
        if f.startswith('--tables='):
            only = set(f[len('--tables='):].split(','))
            flags.remove(f)
    if len(pos) != 3 or flags not in ([], ['--mutate']):
        sys.exit(__doc__)
    src, dst, reps = pos[0], pos[1], int(pos[2])
    mutate = flags == ['--mutate']
    K = 10_000_000
    os.makedirs(dst, exist_ok=True)  # DuckDB COPY won't create parents
    con = duckdb.connect()
    con.execute("SET threads TO 16")

    def gen(table, sel):
        if only is not None and table not in only:
            return
        t0 = time.time()
        # small ROW_GROUP_SIZE: DuckDB's default writes a handful of huge
        # row groups, and parquet splits at row-group boundaries — a 100x
        # documents file came out as 5 groups, capping every Spark scan of
        # the upsampled corpus at 5 tasks (measured: the r16 embed-family
        # 100x runs crawled at ~4 cores of 32). 10k-row groups give any
        # realistic upsample enough splits to use the whole box, matching
        # the many-files layout a real 100 TB corpus has anyway.
        con.execute(f"COPY ({sel}) TO '{dst}/{table}.parquet' "
                    "(FORMAT PARQUET, COMPRESSION ZSTD, ROW_GROUP_SIZE 10000)")
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
    if mutate:
        # per-(replica, dim) sign from one hash each; r*1024 + i keeps the
        # hash inputs distinct per (r, i) for any dim <= 1024. (-x)::FLOAT
        # keeps the element type FLOAT so the parquet schema is unchanged;
        # negation is exact in IEEE so within-replica dot products are
        # bit-identical to the source corpus (see the module doc)
        new_emb = ("CASE WHEN r = 0 THEN embedding ELSE "
                   "list_transform(embedding, (x, i) -> "
                   "CASE WHEN (hash(r * 1024 + i) & 1) = 1 "
                   "THEN (-x)::FLOAT ELSE x END) END")
    else:
        new_emb = "embedding"
    gen('embeddings', f"""SELECT vec_id + r*{K} AS vec_id, {new_emb} AS embedding, label
      FROM {rep('embeddings')}""")
    gen('events', f"""SELECT event_id + r*{K} AS event_id, ts, user_id + r*{K} AS user_id,
      event_type, value, props FROM {rep('events')}""")
    for t in ('nation', 'region'):
        shutil.copy(f'{src}/{t}.parquet', f'{dst}/{t}.parquet')
    print("dims copied")

if __name__ == '__main__':
    main()
