#!/usr/bin/env bash
# Full round validation battery: everything the driver gates on, locally.
# Usage: bash tools/full_check.sh
set -e
cd "$(dirname "$0")/.."

echo "=== compile + tests ==="
sbt -batch test 2>&1 | grep -aE "Tests: succeeded|All tests passed|TESTS FAILED|Failed tests" | head -5

echo "=== t1 smoke (entry) ==="
sbt -batch "runMain graft.Smoke" 2>&1 | grep -aE "ENTRY_ROWS|QUERIES"

for SF in 0.001 0.01 0.1; do
  echo "=== t2 oracle diff @ sf$SF ==="
  rm -rf "/tmp/graft_v$SF"
  sbt -batch "runMain graft.Verify /root/testdata/sf$SF /tmp/graft_v$SF" 2>&1 \
    | grep -a "\[verify\].*failed" || true
  python3 tools/check.py "/root/testdata/sf$SF" "/tmp/graft_v$SF" | tail -1
done

echo "=== determinism probes @ sf0.001 (7 shuffle partitions; AQE off) ==="
rm -rf /tmp/graft_v7p
SPARK_GRAFT_CPUS=7 sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/graft_v7p" 2>&1 \
  | grep -a "\[verify\].*failed" || true
python3 tools/check.py /root/testdata/sf0.001 /tmp/graft_v7p | tail -1
rm -rf /tmp/graft_vnoaqe
SPARK_GRAFT_EXTRA_JAVA_OPTS="-Dspark.sql.adaptive.enabled=false" \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/graft_vnoaqe" 2>&1 \
  | grep -a "\[verify\].*failed" || true
python3 tools/check.py /root/testdata/sf0.001 /tmp/graft_vnoaqe | tail -1

echo "=== bench @ sf0.1 ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>&1 \
  | grep -a '"metric"' | head -1
