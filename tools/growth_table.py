#!/usr/bin/env python3
"""Render the BASELINE.md scale-growth table from bench artifacts
(driver-side tool, like oracle_compare.py — never imported by engine
code).

Usage:
  python3 tools/growth_table.py sf0.1=/tmp/a.json sf0.5=/tmp/b.json \
      sf1=/tmp/c.json --exp sf1/sf0.5=2 [--top 15]

Each positional arg labels a bench JSON (the `bench_out.json` contract
line). --exp names the exponent column as t-ratio of two labels with
the row-scale ratio to take the log base against, e.g. `sf1/sf0.5=2`
means exp = log(t_sf1/t_sf0.5) / log(2). Rows sort by exponent
descending. Medians are used; pass --min to use per-rep minima instead
(interference-robust: a wide max band with a near-baseline min is host
noise, per the CLAUDE.md spread rule).
"""
import json
import math
import sys

labels = []
data = {}
exp_spec = None
top = 15
use_min = False
args = iter(sys.argv[1:])
for a in args:
    if a == "--exp":
        exp_spec = next(args)
    elif a == "--top":
        top = int(next(args))
    elif a == "--min":
        use_min = True
    else:
        lbl, path = a.split("=", 1)
        labels.append(lbl)
        data[lbl] = json.load(open(path))

ratio, base = exp_spec.split("=")
hi, lo = ratio.split("/")
base = float(base)


def t(lbl, q):
    d = data[lbl]
    if use_min and q in d.get("spread", {}):
        return d["spread"][q][0]
    return d["queries"].get(q)


rows = []
for q in data[hi]["queries"]:
    th, tl = t(hi, q), t(lo, q)
    if th and tl and th > 0 and tl > 0:
        e = math.log(th / tl) / math.log(base)
        rows.append((e, q))
rows.sort(reverse=True)

print(f"| query | {' | '.join(labels)} | exp(rows) |")
print("|---|" + "---|" * (len(labels) + 1))
for e, q in rows[:top]:
    cells = " | ".join(
        f"{t(l, q):.2f}" if t(l, q) else "—" for l in labels)
    print(f"| {q} | {cells} | {e:.2f} |")

tot = {l: sum(v for v in data[l]["queries"].values() if v > 0) for l in labels}
print()
print("totals: " + " → ".join(f"{l} {tot[l]:.1f} s" for l in labels)
      + f"; {sum(1 for e, _ in rows if e > 1.0)} rows with exp > 1.0"
      + (" (min-based)" if use_min else " (median-based)"))
