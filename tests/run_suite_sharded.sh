#!/usr/bin/env bash
# Full test suite in THREE sequential pytest processes.
#
# Why: on some build machines, XLA:CPU's persistent-cache executable
# deserialization segfaults/aborts late in a LONG pytest process — the
# crash roams across tests (observed at the serve cascade and at
# MobileFaceNet enroll, always >85% into a 40+ min single-process run,
# always inside compilation_cache.get/put_executable_and_time), while
# every shorter process over the same tests and cache is reliably green
# (CLAUDE.md "Environment gotchas"). Sharding bounds process
# lifetime/heap; the tests, fixtures, and compile cache are identical.
#
# Usage: bash tests/run_suite_sharded.sh  [extra pytest args...]
set -u
cd "$(dirname "$0")/.."
overall=0
run() {
  echo "=== shard: $* ==="
  python -m pytest "$@" -q || overall=$?
}
# Shard 1: a–g (heavy: accuracy_eval, cli, examples, face_cascade, golden)
run tests/test_a*.py tests/test_b*.py tests/test_c*.py tests/test_d*.py \
    tests/test_e*.py tests/test_f*.py tests/test_g*.py "${@}"
# Shard 2: h–o (heavy: onnx_fuzz, multi_face, hand cascades)
run tests/test_h*.py tests/test_i*.py tests/test_m*.py tests/test_n*.py \
    tests/test_o*.py "${@}"
# Shard 3: p–z (heavy: pallas_kernels, parallel, serve, training)
run tests/test_p*.py tests/test_r*.py tests/test_s*.py tests/test_t*.py \
    tests/test_v*.py "${@}"
echo "=== sharded suite exit: $overall ==="
exit $overall
