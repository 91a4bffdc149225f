#!/bin/bash
# Suite runner: one pytest process PER TEST FILE.
#
# Why: XLA:CPU reproducibly segfaults/aborts in backend_compile_and_load
# after ~120 in-process compilations on this host (the persistent-cache
# CPU AOT loader also warns about machine-feature mismatches); every test
# passes when its file runs in a fresh process. Per-file isolation bounds
# the blast radius and keeps the persistent compile cache effective.
#
# Usage: tools/run_suite.sh ["-m 'not slow'"]   (default: the fast+heavy tier)
set -u
cd "$(dirname "$0")/.."
MARK=${1:-not slow}
fail=0
total_pass=0
total_fail=0
t0=$(date +%s)
for f in tests/test_*.py; do
    out=$(timeout 3600 python -m pytest "$f" -q -m "$MARK" -p no:cacheprovider 2>&1 | tail -1)
    p=$(grep -oE '[0-9]+ passed' <<<"$out" | grep -oE '[0-9]+' || echo 0)
    fl=$(grep -oE '[0-9]+ failed' <<<"$out" | grep -oE '[0-9]+' || echo 0)
    total_pass=$((total_pass + p))
    total_fail=$((total_fail + fl))
    if [ "$fl" != "0" ]; then
        fail=1
        echo "FAIL $f: $out"
    else
        echo "ok   $f: $out"
    fi
done
echo "== total: $total_pass passed, $total_fail failed in $(( $(date +%s) - t0 ))s =="
exit $fail
