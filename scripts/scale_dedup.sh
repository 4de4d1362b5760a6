#!/usr/bin/env bash
# Full dedup/ANN scale sweep (graft.tools.ScaleDedup) on a frozen copy of
# target/scala-2.13/classes — outside sbt, so the run neither holds the
# build lock nor breaks on mid-run recompiles (same pattern as
# scale_sweep.sh).
#
#   scripts/scale_dedup.sh [outLog]
#
# Knobs via env: SPARK_GRAFT_SCALE_N (default 500000), SPARK_GRAFT_CPUS,
# SPARK_GRAFT_SCALE_RUNS, SPARK_GRAFT_SCALE_OPS, SPARK_DRIVER_MEM
# (default 24g — the full suite OOMs an 8g driver at 500 k).
set -euo pipefail
OUT=${1:-/tmp/scale_dedup.log}
MEM=${SPARK_DRIVER_MEM:-24g}
CLASSES=${GRAFT_DEDUP_CLASSES:-/tmp/graft_classes_dedup}
rm -rf "$CLASSES"
cp -r /root/repo/target/scala-2.13/classes "$CLASSES"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec env SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  java $ADD_OPENS -Xmx"$MEM" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:/opt/spark/jars/*" graft.tools.ScaleDedup > "$OUT" 2>"$OUT.err"
