#!/usr/bin/env bash
# Full-suite gate inside one review budget (VERDICT r2 item 10): the
# serial run (`python -m pytest tests/ -q`) is Spark-session-heavy and
# takes ~50-60 min on this host. This wrapper shards the test FILES
# round-robin across N concurrent pytest processes, each with its own
# small Spark session, cutting wall time to roughly 1/N while running
# the exact same tests (no skips, no marks).
#
#   SHARDS=4 scripts/pytest_sharded.sh          # default: 4 shards
#   SHARDS=6 SPARK_TEST_CPUS=5 scripts/pytest_sharded.sh
#
# Memory budget: each shard JVM gets SPARK_DRIVER_MEM (default 20g here,
# not session.py's 48g solo default) so 4 shards fit the 128 GiB host.
# Exit status is non-zero iff any shard fails; per-shard tails print at
# the end, full logs in /tmp/pytest_shard_<i>.log.
set -uo pipefail
cd "$(dirname "$0")/.."

N=${SHARDS:-4}
export SPARK_TEST_CPUS=${SPARK_TEST_CPUS:-6}
export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-20g}

mapfile -t FILES < <(ls tests/test_*.py | sort)
echo "sharding ${#FILES[@]} test files across $N workers" \
     "(cores/shard=$SPARK_TEST_CPUS, mem/shard=$SPARK_DRIVER_MEM)"

start=$(date +%s)
pids=()
for ((i = 0; i < N; i++)); do
  shard=()
  for ((j = i; j < ${#FILES[@]}; j += N)); do
    shard+=("${FILES[$j]}")
  done
  if [ "${#shard[@]}" -eq 0 ]; then
    # More shards than test files: a bare `pytest -q` would re-collect
    # the whole tree and silently duplicate the suite. Skip the shard.
    echo "ok (empty shard)" >"/tmp/pytest_shard_$i.log"
    (exit 0) &
    pids+=($!)
    continue
  fi
  (python -m pytest -q -p no:cacheprovider "${shard[@]}" \
    >"/tmp/pytest_shard_$i.log" 2>&1) &
  pids+=($!)
done

fail=0
for ((i = 0; i < N; i++)); do
  wait "${pids[$i]}"
  rc=$?
  tail -n 2 "/tmp/pytest_shard_$i.log" | sed "s/^/[shard $i] /"
  if [ $rc -ne 0 ]; then fail=1; fi
done
echo "total wall: $(($(date +%s) - start))s, exit=$fail"
exit $fail
