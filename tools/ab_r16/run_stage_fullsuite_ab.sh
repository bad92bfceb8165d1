#!/bin/bash
# Full-suite cold A/B: localCheckpoint (r15 HEAD) vs lazy persist for the
# three incremental-batch staging sites. The r15 driver regression on
# incremental_embedding_dedup / semantic_dedup_incremental only shows in
# full-suite context (subset runs are flat), so the adjudication runs the
# whole bench per variant, interleaved.
set -u
cd /root/repo
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
export SCIO_AB_CONTAM_FANOUT=1 SCIO_AB_DECON_FANOUT=1 SCIO_AB_STORES=16
for tag in ckpt_a persist_a ckpt_b persist_b; do
  export SCIO_AB_STAGE="${tag%%_*}"
  echo "=== $tag start $(date +%T) ==="
  python bench.py > "tools/ab_r16/stage_${tag}_stdout.txt" 2> /dev/null
  cp BENCH_RESULT.json "tools/ab_r16/stage_${tag}.json"
done
echo ALL_DONE
