#!/usr/bin/env python3
"""Round-over-round bench comparison: bench_diff.py OLD.json NEW.json.

Prints per-query best/median deltas sorted by absolute regression, with
the ±2x machine-variance caveat in mind: a delta is only flagged when
BOTH the best and the median moved the same direction by >25% (a
single-stat swing on this box is usually warmup noise — the d27 lesson
from round 6).
"""
import json
import sys


def load(p):
    with open(p) as f:
        d = json.load(f)
    # the driver's BENCH_r*.json wraps Bench's JSON line under "parsed"
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    if "queries" not in d and isinstance(d.get("tail"), str):
        # pre-round-8 driver files where the tail clipped the JSON line's
        # head ("parsed": null): recover the per-query pairs that DID
        # survive in the tail — a partial but usable comparison
        import re
        pairs = re.findall(r'"([a-z][a-z0-9_]+)":([0-9]+\.[0-9]+)', d["tail"])
        skip = {"value", "total_median", "sf", "median", "best", "total", "n"}
        d = {"queries": {k: float(v) for k, v in pairs if k not in skip}}
    return d


def stats(d):
    s = d.get("queries_stats")
    if s:
        return {k: (v["best"], v.get("median", v["best"])) for k, v in s.items()}
    return {k: (v, v) for k, v in d["queries"].items()}


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    so, sn = stats(old), stats(new)
    rows = []
    for k in sorted(set(so) | set(sn)):
        if k not in so:
            rows.append((0.0, f"{k:28s}  NEW        best={sn[k][0]:.3f} median={sn[k][1]:.3f}"))
            continue
        if k not in sn:
            rows.append((0.0, f"{k:28s}  REMOVED"))
            continue
        (ob, om), (nb, nm) = so[k], sn[k]
        db = (nb - ob) / ob if ob else 0.0
        dm = (nm - om) / om if om else 0.0
        flag = ""
        if db > 0.25 and dm > 0.25:
            flag = "  << REGRESSION"
        elif db < -0.25 and dm < -0.25:
            flag = "  << improvement"
        rows.append((-max(db, dm) if flag.endswith("REGRESSION") else 0.0,
                     f"{k:28s}  best {ob:6.3f}->{nb:6.3f} ({db:+6.1%})"
                     f"  median {om:6.3f}->{nm:6.3f} ({dm:+6.1%}){flag}"))
    for _, line in sorted(rows):
        print(line)
    tv_o, tv_n = old.get("value"), new.get("value")
    tm_o = old.get("total_median", tv_o)
    tm_n = new.get("total_median", tv_n)
    if tv_o and tv_n:
        print(f"\n{'TOTAL':28s}  best {tv_o:6.3f}->{tv_n:6.3f} "
              f"({(tv_n - tv_o) / tv_o:+.1%})  median {tm_o:6.3f}->{tm_n:6.3f} "
              f"({(tm_n - tm_o) / tm_o:+.1%})")


if __name__ == "__main__":
    main()
