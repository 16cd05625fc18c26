#!/usr/bin/env bash
# Pre-commit gate: the one command to run before claiming anything works.
#
# Round-8 postmortem: a 30-query loader regression shipped because the
# builder's ritual checked pieces (a spec here, a query there) instead of
# the whole contract. This script runs the contract end-to-end at the
# fast scale factor and fails loudly on ANY regression:
#   1. sbt test            — every spec suite incl. AnalysisGuardSpec
#                            (schema drift guard + all-query analysis
#                            sweep); live counts echoed from sbt output
#   2. graft.Verify sf0.001 — every registered query executes and dumps
#   3. tools/check.py      — DuckDB oracle compare (rows/schema/hash)
#
# Usage: tools/gate.sh [sf]     (default 0.001; pass 0.01 for the
#                                driver-scale leg, ~3 min)
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-0.001}"
OUT="/tmp/graft_gate_sf$SF"

echo "== gate: sbt test"
TESTLOG="$(mktemp)"
if ! sbt -batch test >"$TESTLOG" 2>&1; then
  grep -E "Tests:|TESTS FAILED|\*\*\* FAILED|aborted" "$TESTLOG" | tail -20
  echo "GATE FAILED: sbt test"; exit 1
fi
grep -E "Tests:|All tests passed" "$TESTLOG" | tail -2
rm -f "$TESTLOG"

echo "== gate: Verify sf$SF"
# Clear any previous run's output FIRST: a crashed Verify (compile error,
# OOM) must leave nothing behind for the summary check and oracle compare
# to read, or a stale green run would pass the gate silently.
rm -rf "$OUT"
# Verify exits nonzero on any query failure (default since round 11;
# the SPARK_GRAFT_VERIFY_EXIT0=1 escape hatch is driver-facing and
# nothing here sets it — VerifyExitSpec pins both branches). The
# summary-file re-check below is still the gate's real guard because
# the grep pipeline swallows exit status.
sbt -batch "runMain graft.Verify /root/testdata/sf$SF $OUT" 2>&1 \
  | grep -E '\[verify' || true
# The grep pipeline swallows sbt's exit status; re-check the summary file
# so a swallowed exit can't sneak through (and a missing file fails here)
python3 - "$OUT/verify_summary.json" <<'EOF'
import json, sys
s = json.load(open(sys.argv[1]))
if s["failed"] > 0:
    print(f"GATE FAILED: {s['failed']} queries threw: {s['failed_names']}")
    sys.exit(1)
print(f"verify ok: {s['attempted']} queries dumped")
EOF

echo "== gate: DuckDB oracle compare"
python3 tools/check.py "/root/testdata/sf$SF" "$OUT" | tail -1

echo "== GATE GREEN (sf$SF)"
