#!/bin/bash
# Reproduction of the r12 versioned_merge_composite hash miss: TWO
# concurrent Verify processes running the same query against the SAME
# scratch root (the pre-r13 literal /tmp/graft_cache behavior, forced
# here via SPARK_GRAFT_CACHE_DIR). Each destroys + rebuilds the same
# table path; a reader that lands between the other process's destroy
# and merge commits sees a pre-merge snapshot — rows/schema match, the
# hash does not (the exact r12 driver signature) — or dies on
# FILE_NOT_EXIST mid-rewrite. Usage: tools/vmc_race.sh [N] [shared|pid]
set -u
cd "$(dirname "$0")/.."
CP="/tmp/vmc_classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
N="${1:-10}"
MODE="${2:-shared}"
Q=versioned_merge_composite
mkdir -p /tmp/vmc_race
for i in $(seq 1 "$N"); do
  rm -rf /tmp/vmc_race/a_$i /tmp/vmc_race/b_$i /tmp/vmc_shared
  ENVV=""
  if [ "$MODE" = "shared" ]; then export SPARK_GRAFT_CACHE_DIR=/tmp/vmc_shared; else unset SPARK_GRAFT_CACHE_DIR; fi
  SPARK_GRAFT_CPUS=4 java $OPENS -Xmx4g -Dspark.ui.enabled=false \
    -cp "$CP" graft.Verify /root/testdata/sf0.01 /tmp/vmc_race/a_$i $Q \
    > /tmp/vmc_race/a_$i.log 2>&1 &
  PA=$!
  # stagger the second process into the first's merge window
  sleep $((i % 7 + 2))
  SPARK_GRAFT_CPUS=4 java $OPENS -Xmx4g -Dspark.ui.enabled=false \
    -cp "$CP" graft.Verify /root/testdata/sf0.01 /tmp/vmc_race/b_$i $Q \
    > /tmp/vmc_race/b_$i.log 2>&1 &
  PB=$!
  wait $PA; wait $PB
  for side in a b; do
    out=/tmp/vmc_race/${side}_$i
    res=$(python3 tools/check.py /root/testdata/sf0.01 $out 2>&1 | grep "$Q")
    echo "run $i $side($MODE): $res" | tee -a /tmp/vmc_race/summary.log
  done
done
echo "RACE LOOP DONE ($MODE)" | tee -a /tmp/vmc_race/summary.log
