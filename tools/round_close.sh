#!/usr/bin/env bash
# End-of-round artifact hygiene (the r15/r16 dirty-tree fix): run the
# full gate chain, adjudicate the closing bench artifact's interference
# band, and land every round artifact in ONE commit so the driver's
# closing bench never leaves the tree dirty.
#
# Usage: tools/round_close.sh [round-number]
#   - runs Verify @ sf0.01 + oracle compare (must be N/N OK)
#   - runs sbt test (must be green)
#   - runs the full Bench @ sf0.1 (writes BENCH_full.json)
#   - if check_bench_artifact says INTERFERENCE-DOMINATED, restores the
#     committed BENCH_full.json (per the tool's own "do NOT commit as
#     reference" rule) and says so; otherwise keeps the fresh artifact
#   - commits BENCH_full.json + LEAKCHECK.json + CORRECTNESS_r*/BENCH_r*
#     (whatever of them changed) in one step
set -euo pipefail
cd "$(dirname "$0")/.."

ROUND="${1:-}"

echo "== gate 1/4: Verify @ sf0.01"
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/round_close_out" \
  > /tmp/round_close_verify.log 2>&1 || { tail -20 /tmp/round_close_verify.log; exit 1; }

echo "== gate 2/4: oracle compare"
python3 tools/oracle_compare.py /root/testdata/sf0.01 /tmp/round_close_out \
  | tail -1 | tee /tmp/round_close_compare.txt
grep -qE '^[0-9]+/[0-9]+ OK$' /tmp/round_close_compare.txt
N=$(sed -E 's#^([0-9]+)/([0-9]+) OK#\1 \2#' /tmp/round_close_compare.txt)
[ "$(echo "$N" | cut -d' ' -f1)" = "$(echo "$N" | cut -d' ' -f2)" ] \
  || { echo "oracle compare not all-OK"; exit 1; }

echo "== gate 3/4: sbt test"
sbt -batch test > /tmp/round_close_test.log 2>&1 \
  || { tail -20 /tmp/round_close_test.log; exit 1; }
tail -3 /tmp/round_close_test.log

echo "== gate 4/4: full Bench @ sf0.1"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > /tmp/round_close_bench.log 2>&1 || { tail -20 /tmp/round_close_bench.log; exit 1; }

EXPECTED=$(python3 -c 'import json;print(len(json.load(open("/tmp/round_close_out/oracle_sql.json"))))')
BAND=$(python3 tools/check_bench_artifact.py BENCH_full.json "$EXPECTED" | tee /dev/stderr)
if echo "$BAND" | grep -q "INTERFERENCE-DOMINATED"; then
  echo "== closing bench is interference-banded: restoring committed BENCH_full.json"
  git checkout BENCH_full.json
else
  echo "== closing bench is idle-banded: keeping the fresh artifact"
fi

echo "== committing round artifacts"
git add BENCH_full.json 2>/dev/null || true
for f in LEAKCHECK.json CORRECTNESS_r*.json BENCH_r*.json VERDICT.md ADVICE.md; do
  [ -e "$f" ] && git add "$f" || true
done
if git diff --cached --quiet; then
  echo "nothing to commit - tree already clean"
else
  git commit -m "Land round${ROUND:+ $ROUND} closing artifacts (bench/leakcheck/correctness)"
fi
git status --short
echo "== round close done"
