#!/usr/bin/env bash
# Build the sf10 suite directory at TRUE 100x over the driver sf0.1 data:
#   - TPC-H/events families: scripts/scaleup.py factor 100 (replication with
#     key offsets — sound for relational tables at any factor).
#   - documents/embeddings: graft.tools.GenCorpus (realistic Zipf-50k
#     vocabulary, planted duplicate groups) at 100x the sf0.1 row counts
#     (500 k docs / 200 k vecs). Rotation-replication is UNSOUND for these
#     families past 31x (vocabulary-rotation decorrelation bound) and the
#     31-word vocabulary saturates the shingle space either way — see
#     GenCorpus.scala. The corpus stamp in every BENCH artifact records
#     which generation a number came from.
#
#   scripts/make_sf10.sh [baseDir] [outDir]
set -euo pipefail
BASE=${1:-/root/testdata/sf0.1}
OUT=${2:-/tmp/testdata/sf10}
FACTOR=${SF10_FACTOR:-100}
NDOCS=${SF10_NDOCS:-500000}
NVECS=${SF10_NVECS:-200000}
CLASSES=${GRAFT_GEN_CLASSES:-/tmp/graft_classes_gen}
rm -rf "$CLASSES"
cp -r /root/repo/target/scala-2.13/classes "$CLASSES"
python3 "$(dirname "$0")/scaleup.py" "$BASE" "$OUT" "$FACTOR" \
  region,nation,customer,supplier,part,orders,lineitem,events
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
env SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  java $ADD_OPENS -Xmx"${SPARK_DRIVER_MEM:-24g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:/opt/spark/jars/*" graft.tools.GenCorpus "$OUT" "$NDOCS" "$NVECS"
