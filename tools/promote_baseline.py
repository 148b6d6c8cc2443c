#!/usr/bin/env python3
"""Build a canonical baseline table from >= 3 full Bench artifacts.

Usage: promote_baseline.py run1.json run2.json run3.json [...]

Per query: the MEDIAN of the runs' medians (never the minimum - the
all-time-best floor reads normal jitter as a 2x regression), band =
[min of per-run spread minima, max of per-run spread maxima]. Emits the
two-column markdown table BASELINE.md's reference sections use, plus
run totals and per-run band verdicts, on stdout.
"""
import json
import statistics
import sys


def load(path):
    with open(path) as f:
        doc = json.load(f)
    if "queries" not in doc and "parsed" in doc:
        doc = doc["parsed"]
    return doc


runs = [load(p) for p in sys.argv[1:]]
if len(runs) < 3:
    sys.exit("need >= 3 full-run artifacts for a promotion")

names = set(runs[0]["queries"])
for r in runs[1:]:
    if set(r["queries"]) != names:
        sys.exit(f"artifacts disagree on the query set: "
                 f"{sorted(names ^ set(r['queries']))[:6]}")

# A failed query carries a negative sentinel (and no spread row) — it
# would poison medians/totals silently. A promotion run must be clean:
# fail loudly instead of filtering (ADVICE r17).
for i, r in enumerate(runs):
    bad = sorted(q for q in names if r["queries"][q] < 0
                 or q not in r.get("spread", {}))
    if bad:
        sys.exit(f"run {i + 1} has failed/spread-less queries "
                 f"{bad[:6]} - not promotable")

rows = []
for q in sorted(names, key=lambda n: (int("".join(
        c for c in n.split("_")[0][1:] if c.isdigit()) or 0), n)):
    meds = [r["spread"][q][1] for r in runs]
    lo = min(r["spread"][q][0] for r in runs)
    hi = max(r["spread"][q][2] for r in runs)
    rows.append((q, statistics.median(meds), lo, hi))

total = sum(r[1] for r in rows)
print(f"<!-- promoted from {len(runs)} runs; med-of-med sum "
      f"{total:.2f} s over {len(rows)} queries -->")
for r in runs:
    med_sum = sum(r["spread"][q][1] for q in names)
    min_sum = sum(r["spread"][q][0] for q in names)
    band = f"{med_sum / min_sum:.2f}" if min_sum > 0 else "n/a (min_sum 0)"
    print(f"<!-- run total {sum(r['queries'][q] for q in names):.1f} s, "
          f"band {band} -->")

print("\n| query | sec | band | query | sec | band |")
print("|---|---|---|---|---|---|")
half = (len(rows) + 1) // 2
for i in range(half):
    left = rows[i]
    cells = [left[0], f"{left[1]:.2f}", f"[{left[2]:.2f}, {left[3]:.2f}]"]
    if i + half < len(rows):
        right = rows[i + half]
        cells += [right[0], f"{right[1]:.2f}", f"[{right[2]:.2f}, {right[3]:.2f}]"]
    else:
        cells += ["", "", ""]
    print("| " + " | ".join(cells) + " |")

print("\nStreaming legs (per run):")
for i, r in enumerate(runs):
    legs = {k: round(v, 1) for k, v in r.get("streaming", {}).items()
            if k.endswith("per_sec")}
    print(f"  run {i + 1}: {legs}")
