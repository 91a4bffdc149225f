#!/bin/bash
# Suite runner: one pytest process PER TEST FILE, J files in parallel.
#
# Why per-file: XLA:CPU reproducibly segfaults/aborts in
# backend_compile_and_load after ~120 in-process compilations on this host
# (tools/xla_cpu_segfault_repro.py is the minimal repro; the persistent-
# cache CPU AOT loader also warns about machine-feature mismatches); every
# test passes when its file runs in a fresh process. Per-file isolation
# bounds the blast radius and keeps the persistent compile cache effective.
#
# Why parallel (round 4, VERDICT r3 #8): the cold sweep is compile-bound
# and XLA:CPU compilation is mostly single-threaded per program, so J
# concurrent files scale nearly linearly until the core count. J defaults
# to min(4, nproc). Files run largest-first so the long poles (parallel/
# pssmlt/envmap) never straggle at the end.
#
# Usage: tools/run_suite.sh ["-m expr"] [J]
#   tools/run_suite.sh                 # fast+heavy tier, J=auto
#   tools/run_suite.sh "not slow" 2    # explicit marker + parallelism
set -u
cd "$(dirname "$0")/.."
MARK=${1:-not slow}
J=${2:-$(( $(nproc) < 4 ? $(nproc) : 4 ))}
t0=$(date +%s)
mkdir -p /tmp/fermat_suite_logs
rm -f /tmp/fermat_suite_logs/*.log

# largest files first: better tail behavior under parallelism
files=$(ls -S tests/test_*.py)

run_one() {
    f=$1
    log="/tmp/fermat_suite_logs/$(basename "$f").log"
    timeout 3600 python -m pytest "$f" -q -m "$MARK" -p no:cacheprovider \
        >"$log" 2>&1
}
export -f run_one
export MARK

echo "$files" | xargs -n1 -P "$J" -I{} bash -c 'run_one {}'

fail=0
total_pass=0
total_fail=0
for f in $files; do
    out=$(tail -1 "/tmp/fermat_suite_logs/$(basename "$f").log" 2>/dev/null)
    p=$(grep -oE '[0-9]+ passed' <<<"$out" | grep -oE '[0-9]+' || echo 0)
    fl=$(grep -oE '[0-9]+ (failed|error)' <<<"$out" | grep -oE '[0-9]+' || echo 0)
    total_pass=$((total_pass + p))
    total_fail=$((total_fail + fl))
    if [ "$fl" != "0" ] || [ "$p" == "0" ] && ! grep -qE "no tests ran|deselected" <<<"$out"; then
        fail=1
        echo "FAIL $f: $out"
    else
        echo "ok   $f: $out"
    fi
done
echo "== total: $total_pass passed, $total_fail failed in $(( $(date +%s) - t0 ))s (J=$J) =="
exit $fail
