#!/usr/bin/env python3
"""Loud validator for a bench artifact: fails (exit 1) unless the file
contains the complete per-query blocks the round adjudication needs.

Usage: check_bench_artifact.py <path> [min_query_count]

Accepts either the raw Bench output line (bench_out.json /
BENCH_full.json) or a driver-side BENCH_r{N}.json wrapper whose
"parsed" field holds the same object. A wrapper with "parsed": null is
exactly the truncation failure this script exists to catch (BENCH_r11
and BENCH_r12 both shipped that way).
"""
import json
import sys


def fail(msg):
    print(f"BENCH ARTIFACT INVALID: {msg}", file=sys.stderr)
    sys.exit(1)


path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_full.json"
min_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 1

try:
    with open(path) as f:
        doc = json.load(f)
except Exception as e:
    fail(f"{path} does not parse as JSON: {e}")

if isinstance(doc, dict) and "queries" not in doc and "parsed" in doc:
    doc = doc["parsed"]
    if doc is None:
        fail(f"{path} carries parsed: null (truncated stdout capture)")

if not isinstance(doc, dict):
    fail(f"{path} top level is {type(doc).__name__}, not an object")

for key in ("queries", "spread", "streaming", "errors"):
    if key not in doc:
        fail(f"{path} lacks the '{key}' block")

queries = doc["queries"]
spread = doc["spread"]
if not isinstance(queries, dict) or len(queries) < min_queries:
    fail(f"'queries' has {len(queries)} entries, expected >= {min_queries}")

succeeded = {q for q, v in queries.items() if isinstance(v, (int, float)) and v >= 0}
missing_spread = sorted(succeeded - set(spread))
if missing_spread:
    fail(f"spread rows missing for {len(missing_spread)} succeeded "
         f"queries, e.g. {missing_spread[:5]}")
bad_spread = [q for q in succeeded
              if not (isinstance(spread[q], list) and len(spread[q]) == 3)]
if bad_spread:
    fail(f"spread rows not [min, median, max] for {bad_spread[:5]}")

failed = sorted(set(queries) - succeeded)

# Interference band verdict: an artifact whose med-sum runs far above its
# min-sum was measured under host bursts (r15's closing run: med-sum 1.56x
# baseline, min-sum 0.97x). Such a file must not be read as a regression or
# committed as a reference table — gate on min-sum, rerun idle for medians.
med_sum = sum(spread[q][1] for q in succeeded)
min_sum = sum(spread[q][0] for q in succeeded)
band = med_sum / min_sum if min_sum > 0 else float("inf")
band_verdict = "IDLE" if band <= 1.2 else "INTERFERENCE-DOMINATED"

print(f"OK {path}: {len(succeeded)} queries with spreads, "
      f"{len(doc['streaming'])} streaming metrics, "
      f"{len(failed)} failed ({failed[:5]}), "
      f"{len(doc['errors'])} error entries, reps={doc.get('reps')}")
print(f"band: med-sum {med_sum:.1f}s / min-sum {min_sum:.1f}s = "
      f"{band:.2f} -> {band_verdict}"
      + ("" if band <= 1.2 else
         " (do NOT commit as reference or read medians as regressions; "
         "judge by min-sum and rerun idle)"))
