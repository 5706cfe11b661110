#!/usr/bin/env bash
# Full pre-snapshot test gate: fast suite + slow-marked subprocess tests.
#
# Round-4 post-mortem (VERDICT r4 weak #1/#4): a broken dryrun assertion
# shipped because `-m slow` tests were not in the pre-commit loop. This is
# the one command that must be green before an end-of-round snapshot:
#
#     bash tools/run_all_tests.sh
#
# It runs the fast suite first (fail fast on cheap regressions), then the
# slow markers with a generous per-test timeout, and prints a combined
# summary. Exit code is non-zero if EITHER phase fails.
set -u
cd "$(dirname "$0")/.."

FAST_LOG=$(mktemp /tmp/slowtv_fast.XXXX.log)
SLOW_LOG=$(mktemp /tmp/slowtv_slow.XXXX.log)
t0=$(date +%s)

echo "== phase 1: fast suite (-m 'not slow') =="
python -m pytest tests/ -q -m 'not slow' -p no:cacheprovider 2>&1 | tee "$FAST_LOG" | tail -5
fast_rc=${PIPESTATUS[0]}
t1=$(date +%s)

echo "== phase 2: slow suite (-m slow, 7200s phase budget) =="
timeout 7200 python -m pytest tests/ -q -m slow -p no:cacheprovider 2>&1 | tee "$SLOW_LOG" | tail -5
slow_rc=${PIPESTATUS[0]}
t2=$(date +%s)

echo
echo "== run_all_tests summary =="
echo "fast: rc=$fast_rc  $(grep -Eo '[0-9]+ (passed|failed|error|skipped)[^,]*' "$FAST_LOG" | tr '\n' ' ')  (${t1}-${t0} => $((t1 - t0))s)"
echo "slow: rc=$slow_rc  $(grep -Eo '[0-9]+ (passed|failed|error|skipped)[^,]*' "$SLOW_LOG" | tr '\n' ' ')  ($((t2 - t1))s)"
echo "total wall: $((t2 - t0))s"
rm -f "$FAST_LOG" "$SLOW_LOG"
[ "$fast_rc" -eq 0 ] && [ "$slow_rc" -eq 0 ]
