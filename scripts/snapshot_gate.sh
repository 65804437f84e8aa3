#!/usr/bin/env bash
# Snapshot gate: refuse an end-of-round snapshot commit when HEAD (or the
# working tree about to be committed) does not build and smoke-run.
#
# Round 5 shipped a non-compiling snapshot (BENCH_r05.json rc=1,
# CORRECTNESS_r05.json empty) because nothing stood between "time ran
# out" and "git commit". This script is that gate:
#
#   scripts/snapshot_gate.sh && git commit ...
#
# Exit 0  -> compile green AND the sf0.001 smoke entry returns rows.
# Exit !0 -> DO NOT snapshot; the failure output names the reason.
set -u
cd "$(dirname "$0")/.."

echo "[gate] sbt compile..." >&2
if ! sbt -batch compile > /tmp/snapshot_gate_compile.log 2>&1; then
  echo "[gate] FAIL: sbt compile is red - see /tmp/snapshot_gate_compile.log" >&2
  tail -n 20 /tmp/snapshot_gate_compile.log >&2
  exit 1
fi

SMOKE_SF="${SNAPSHOT_GATE_SF_DIR:-/root/testdata/sf0.001}"
echo "[gate] smoke: SparkEntry.entry on $SMOKE_SF ..." >&2
cat > /tmp/snapshot_gate_smoke.scala <<EOF
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
spark.conf.set("spark.sql.session.timeZone", "UTC")
val n = graft.SparkEntry.entry(spark).count()
println(s"SMOKE_ROWS=\$n")
System.exit(if (n > 0) 0 else 1)
EOF
if ! /opt/spark/bin/spark-shell --master 'local[4]' \
    --driver-class-path target/scala-2.13/classes \
    -i /tmp/snapshot_gate_smoke.scala \
    > /tmp/snapshot_gate_smoke.log 2>&1; then
  echo "[gate] FAIL: smoke run errored - see /tmp/snapshot_gate_smoke.log" >&2
  grep -E "Exception|error" /tmp/snapshot_gate_smoke.log | head -n 10 >&2
  exit 1
fi
if ! grep -q "SMOKE_ROWS=" /tmp/snapshot_gate_smoke.log; then
  echo "[gate] FAIL: smoke produced no row count" >&2
  exit 1
fi
ROWS=$(grep -o "SMOKE_ROWS=[0-9]*" /tmp/snapshot_gate_smoke.log | head -1 | cut -d= -f2)
if [ "${ROWS:-0}" -le 0 ]; then
  echo "[gate] FAIL: smoke entry returned 0 rows" >&2
  exit 1
fi
echo "[gate] OK: compile green, smoke entry returned $ROWS rows" >&2
exit 0
