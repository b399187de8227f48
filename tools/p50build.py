#!/usr/bin/env python3
"""Build tools/p50_rNN.json from two full Bench stdout captures.

Usage: python3 tools/p50build.py <run1.txt> <run2.txt> <out.json>

Each input is a full `runMain graft.Bench` stdout; the per-query map is
reassembled from the `queries_part` lines (every line standalone JSON).
Emits {query: {c1, c2, min, p50}} — c1/c2 are each run's min-of-two,
so `min` is min-of-four and `p50` the midpoint of the two closes.
"""
import json
import sys


def load(path):
    q = {}
    for line in open(path):
        line = line.strip()
        if not line.startswith('{"metric":"queries_part"'):
            continue
        q.update(json.loads(line)["queries"])
    if not q:
        raise SystemExit(f"{path}: no queries_part lines found")
    return q


def main(a, b, out):
    qa, qb = load(a), load(b)
    if set(qa) != set(qb):
        # a gate added between the two closes shows up once — keep its
        # single observation (BENCHNOTES splice precedent) and say so
        print(f"note: single-close queries: {sorted(set(qa) ^ set(qb))}")
    rows = {}
    for k in sorted(set(qa) | set(qb)):
        vs = [v for v in (qa.get(k), qb.get(k)) if v is not None]
        rows[k] = {"c1": qa.get(k, qb.get(k)), "c2": qb.get(k, qa.get(k)),
                   "min": min(vs), "p50": round(sum(vs) / len(vs), 4)}
    with open(out, "w") as f:
        json.dump(rows, f, indent=0)
    t1, t2 = sum(qa.values()), sum(qb.values())
    print(f"{len(rows)} queries; run totals {t1:.1f} / {t2:.1f} s; "
          f"min-of-both total {sum(r['min'] for r in rows.values()):.1f} s")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
