#!/usr/bin/env python3
"""Dev-loop replica of the driver's correctness gate (t2): for each query
output written by graft.Verify, run the declared oracle SQL in DuckDB over
the same parquet tables, sort columns by name + rows by value, and compare.

STRICTER than the driver on purpose (round-1 lesson: a lenient local gate
passed 43/43 while the driver failed 13): the comparison is

  - type-sensitive: the DuckDB logical type of every column must be
    identical between the Spark parquet output and the oracle result
    (catches BIGINT vs HUGEINT, DECIMAL(18,2) vs DECIMAL(38,2), ...);
  - bit-exact on floats (float.hex(), no rounding);
  - scale-exact on decimals (str(Decimal) keeps trailing zeros).

Local green under this gate implies driver green for any reasonable
driver-side normalization.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

NOT part of the engine (the engine is Scala/Spark only); this is local
tooling mirroring the driver-side DuckDB oracle.
"""
import json
import math
import os
import sys
from decimal import Decimal

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v.hex()
    if isinstance(v, Decimal):
        return "dec:" + str(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table(con, sql):
    rel = con.sql(sql)
    cols = rel.columns
    types = [str(t) for t in rel.types]
    rows = rel.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    scols = [cols[i] for i in order]
    stypes = [types[i] for i in order]
    # NULL-DISTINCT row sort (round-9 verdict #7): the old key mapped
    # NULL to "", so two rows differing ONLY by a NULL vs '' (or any
    # stringified collision) tied — Python's stable sort then preserved
    # each engine's own fetch order and the row-by-row zip compare could
    # fail on an identical multiset. A (is-null, value) pair per column
    # is injective on normalized rows, so the order is engine-independent.
    srows = sorted([tuple(norm(r[i]) for i in order) for r in rows],
                   key=lambda t: tuple((x is None, "" if x is None else str(x))
                                       for x in t))
    return scols, stypes, srows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            # sharded table (tools/shard_testdata.py): a dir of part files
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    # The driver enumerates EVERY subdir of out_dir (round-3 evidence: a
    # legacy $outDir/_aux produced a spurious `err` row in
    # CORRECTNESS_r03.json). Aux intermediates now live in the sibling
    # `${out_dir}_aux`; mirror the driver exactly — any dir found here IS
    # a compared result, and a stray `_aux` must fail loudly.
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    if "_aux" in names:
        print("  ✗ _aux: aux exports leaked into the compared out_dir "
              "(must live in the ${out_dir}_aux sibling)")
        return 1
    n_pass = n_fail = n_noracle = 0
    for name in names:
        # RECURSIVE glob, mirroring the driver's gate: any stray subdir
        # under a query dir would be hashed into its result there, so it
        # must fail here too (round-2 lesson: aux subdirs inside result
        # dirs passed locally with a flat glob, failed the driver)
        got_cols, got_types, got_rows = table(
            con, f"SELECT * FROM '{os.path.join(out_dir, name)}/**/*.parquet'")
        if name not in oracles:
            print(f"  ~ {name}: no oracle, rows={len(got_rows)}")
            n_noracle += 1
            continue
        try:
            exp_cols, exp_types, exp_rows = table(con, oracles[name])
        except Exception as e:
            print(f"  ✗ {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"  ✗ {name}: column mismatch spark={got_cols} duck={exp_cols}")
            n_fail += 1
            continue
        if got_types != exp_types:
            print(f"  ✗ {name}: TYPE mismatch spark={list(zip(got_cols, got_types))} "
                  f"duck={list(zip(exp_cols, exp_types))}")
            n_fail += 1
            continue
        if len(got_rows) != len(exp_rows):
            print(f"  ✗ {name}: row count spark={len(got_rows)} duck={len(exp_rows)}")
            n_fail += 1
            continue
        bad = [(g, e) for g, e in zip(got_rows, exp_rows) if g != e]
        if bad:
            print(f"  ✗ {name}: {len(bad)}/{len(got_rows)} rows differ; first: spark={bad[0][0]} duck={bad[0][1]}")
            n_fail += 1
        else:
            print(f"  ✓ {name}: {len(got_rows)} rows match")
            n_pass += 1
    # an oracle with NO result dir is a FAILED query, not a skipped one:
    # a build that crashed before writing produced PASS=N FAIL=0 with the
    # broken query silently absent (observed live — a stack() type error
    # yielded FAIL=0 while dumping nothing). The driver marks such rows
    # `err`; mirror it loudly.
    for name in sorted(set(oracles) - set(names)):
        print(f"  ✗ {name}: declared oracle but NO result written by Verify")
        n_fail += 1
    print(f"PASS={n_pass} FAIL={n_fail} NO_ORACLE={n_noracle}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
