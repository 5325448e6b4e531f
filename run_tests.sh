#!/bin/bash
# CPU test runner — sharded per test file.
#
# PYTHONPATH is overridden to drop the axon TPU sitecustomize (its PJRT
# registration adds minutes of interpreter startup and deadlocks when a
# second process claims the single tunneled chip); tests force JAX_PLATFORMS
# =cpu with an 8-device virtual mesh anyway (tests/conftest.py).
#
# Each test file runs in its OWN pytest subprocess: big XLA:CPU compiles
# inside one long-lived interpreter could SIGSEGV late in a monolithic run
# on this 1-core box (round-4 verdict: exit 139 at test_train.py after ~260
# green tests; the same files pass in isolation). Per-file processes bound
# each compile arena's lifetime, and a shard that dies on a non-pytest exit
# code (e.g. 139) is retried once before being counted as failed.
#
# Usage: ./run_tests.sh [pytest flags] [test paths...]
#   flags (-q, -x, -k pat) are forwarded to every shard; explicit test
#   paths restrict the shard list.
set -u
cd "$(dirname "$0")"

FLAGS=()
PATHS=()
for a in "$@"; do
  case "$a" in
    tests/*|*.py) PATHS+=("$a") ;;
    *) FLAGS+=("$a") ;;
  esac
done
if [ ${#PATHS[@]} -eq 0 ]; then
  PATHS=(tests/test_*.py)
fi

run_shard() {
  env PYTHONPATH="$(pwd)" JAX_PLATFORMS=cpu \
    python -m pytest "${FLAGS[@]}" "$1"
}

failed=()
crashed=()
for f in "${PATHS[@]}"; do
  run_shard "$f"
  rc=$?
  # pytest: 0 ok, 5 no tests collected (fine for -k filters)
  if [ $rc -eq 0 ] || [ $rc -eq 5 ]; then
    continue
  fi
  if [ $rc -ge 128 ] || [ $rc -eq 3 ]; then
    # killed by signal (e.g. 139=SIGSEGV) or internal error: retry once
    echo "--- shard $f exited $rc; retrying once ---" >&2
    run_shard "$f"
    rc=$?
    if [ $rc -eq 0 ] || [ $rc -eq 5 ]; then
      continue
    fi
    crashed+=("$f:$rc")
  else
    failed+=("$f:$rc")
  fi
done

echo
if [ ${#failed[@]} -eq 0 ] && [ ${#crashed[@]} -eq 0 ]; then
  echo "ALL SHARDS GREEN (${#PATHS[@]} files)"
  exit 0
fi
[ ${#failed[@]} -gt 0 ] && echo "FAILED shards: ${failed[*]}"
[ ${#crashed[@]} -gt 0 ] && echo "CRASHED shards (after retry): ${crashed[*]}"
exit 1
