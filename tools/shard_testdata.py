#!/usr/bin/env python3
"""Build a SHARDED copy of a testdata sf dir: documents.parquet and
events.parquet become directories of N row-sliced parquet files; every
other table is symlinked unchanged.

The driver's gate reads monolithic single-file tables, but the engine's
100-TB read path is many files/splits per table — this produces the
fixture that lets the FULL oracle gate run over multi-split inputs:

  python3 tools/shard_testdata.py /root/testdata/sf0.01 /tmp/sf0.01-sharded
  sbt -batch 'runMain graft.Verify /tmp/sf0.01-sharded /tmp/vout_sharded'
  python3 tools/oracle_check.py /tmp/sf0.01-sharded /tmp/vout_sharded

Driver-side tooling only (pyarrow), like oracle_check.py — not part of
the engine.
"""
import os
import shutil
import sys

import pyarrow.parquet as pq

SHARDED = {"documents": 8, "events": 8}


def main(src, dst, shards=SHARDED):
    os.makedirs(dst, exist_ok=True)
    for fn in sorted(os.listdir(src)):
        if not fn.endswith(".parquet"):
            continue
        name = fn[: -len(".parquet")]
        # abspath: a relative src would make the symlinks below resolve
        # relative to dst and dangle
        s, d = os.path.abspath(os.path.join(src, fn)), os.path.join(dst, fn)
        if name not in shards:
            if os.path.lexists(d):
                os.remove(d)
            os.symlink(s, d)
            continue
        n = shards[name]
        t = pq.read_table(s)
        if os.path.isdir(d):
            shutil.rmtree(d)
        os.makedirs(d)
        rows = t.num_rows
        # contiguous slices: same rows, same per-file order, n files
        step = (rows + n - 1) // n
        for i in range(n):
            part = t.slice(i * step, step)
            pq.write_table(part, os.path.join(d, f"part-{i:04d}.parquet"),
                           compression="snappy")
        print(f"sharded {name}: {rows} rows -> {n} files")


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
