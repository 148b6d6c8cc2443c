#!/usr/bin/env python3
"""Build the one-table BASELINE reference from >=3 idle interleaved Bench
runs: per query, the MEDIAN of the runs' medians (never the minimum —
an all-time-best floor reads normal jitter as a 2x regression), plus the
across-run band [min of mins, max of maxes] for adjudication.

Usage: baseline_table.py run1.json run2.json [run3.json ...]
Prints a markdown table + totals to stdout.
"""
import json
import statistics
import sys

runs = []
for path in sys.argv[1:]:
    with open(path) as f:
        doc = json.load(f)
    if "queries" not in doc and "parsed" in doc:
        doc = doc["parsed"]
    runs.append(doc)
if len(runs) < 3:
    print(f"WARNING: only {len(runs)} runs; convention wants >= 3",
          file=sys.stderr)

names = list(runs[0]["queries"].keys())
for r in runs[1:]:
    assert set(r["queries"]) == set(names), "runs cover different query sets"

rows = []
for q in names:
    meds = [r["queries"][q] for r in runs]
    spreads = [r["spread"][q] for r in runs if q in r["spread"]]
    rows.append((q, statistics.median(meds),
                 min(s[0] for s in spreads), max(s[2] for s in spreads)))

print("| query | sec | band | query | sec | band |")
print("|---|---|---|---|---|---|")
half = (len(rows) + 1) // 2
for i in range(half):
    cells = []
    for j in (i, i + half):
        if j < len(rows):
            q, med, lo, hi = rows[j]
            cells += [q, f"{med:.2f}", f"[{lo:.2f}, {hi:.2f}]"]
        else:
            cells += ["", "", ""]
    print("| " + " | ".join(cells) + " |")

total = sum(r[1] for r in rows)
print(f"\nTotal (sum of median-of-medians): {total:.2f} s "
      f"over {len(rows)} queries, {len(runs)} runs")
for i, r in enumerate(runs):
    print(f"  run {i + 1}: sum of medians {sum(r['queries'].values()):.2f} s, "
          f"streaming {r.get('streaming')}")
