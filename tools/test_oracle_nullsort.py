#!/usr/bin/env python3
"""Regression fixture for oracle_check's NULL-distinct row sort (round-9
verdict #7): two rows that differ ONLY by NULL vs '' collide on the old
stringified sort key, so the stable sort preserved each engine's own
fetch order and the row-by-row compare could fail on an identical
multiset. This drives oracle_check.main() against a synthetic result
whose parquet row order is the REVERSE of the oracle's fetch order, in
both directions; both must PASS.

Usage: python3 tools/test_oracle_nullsort.py  (exit 0 = pass)
"""
import json
import os
import sys
import tempfile

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import oracle_check  # noqa: E402


def run_case(order):
    """order: 'null_first' or 'empty_first' — the parquet's physical row
    order; the oracle emits the OPPOSITE order via UNION ALL."""
    tmp = tempfile.mkdtemp(prefix="nullsort_")
    sf = os.path.join(tmp, "sf")
    out = os.path.join(tmp, "out")
    os.makedirs(sf)
    os.makedirs(os.path.join(out, "q_nullsort"))
    rows = ["SELECT NULL AS a, 'same' AS b", "SELECT '' AS a, 'same' AS b"]
    if order == "empty_first":
        rows = rows[::-1]
    con = duckdb.connect()
    con.execute(
        "COPY ({}) TO '{}' (FORMAT PARQUET)".format(
            " UNION ALL ".join(rows),
            os.path.join(out, "q_nullsort", "part0.parquet")))
    # oracle fetches in the reverse physical order
    with open(os.path.join(out, "oracle_sql.json"), "w") as f:
        json.dump({"q_nullsort": " UNION ALL ".join(rows[::-1])}, f)
    return oracle_check.main(sf, out)


def main():
    rc = 0
    for order in ("null_first", "empty_first"):
        r = run_case(order)
        print(f"case {order}: {'PASS' if r == 0 else 'FAIL'}")
        rc |= r
    return rc


if __name__ == "__main__":
    sys.exit(main())
