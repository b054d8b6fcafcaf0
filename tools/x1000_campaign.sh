#!/bin/bash
# Round-9 scale-validation sweep: the five ×1000-relevant queries, one
# fresh JVM + ONE pass each (SPARK_GRAFT_PASSES=1), first against the
# ×1000 replica then against ×100 for scaling ratios. A sampler records
# shuffle/block scratch (du of the JVM's blockmgr/spark dirs) and free
# disk every 5 s to /tmp/x1000_scratch.log so peak-scratch-vs-budget is
# measurable per query, not guessed.
set -u
cd "$(dirname "$0")/.."
QUERIES="dedup_minhash dedup_simhash dedup_sem_lsh sim_join eval_cider_d"
for sf in /tmp/graft_x1000 /tmp/graft_x100; do
  for q in $QUERIES; do
    echo "=== $sf $q start $(date +%T) ==="
    ( while true; do
        b=$(du -sb /tmp/blockmgr-* /tmp/spark-* 2>/dev/null | awk '{s+=$1} END{print s+0}')
        f=$(df -B1 --output=avail / | tail -1 | tr -d ' ')
        echo "scratch $(date +%s) $sf $q $b $f" >> /tmp/x1000_scratch.log
        sleep 5
      done ) &
    MON=$!
    SPARK_GRAFT_SF_DIR="$sf" SPARK_GRAFT_PASSES=1 tools/standalone_bench.sh "$q"
    kill "$MON" 2>/dev/null
    echo "=== $sf $q end $(date +%T) ==="
  done
done
echo CAMPAIGN_DONE
