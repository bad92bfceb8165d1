#!/bin/bash
# Round-16 cold-protocol A/B for the four r15-contested changes
# (VERDICT r16 item 1). Each run is a FRESH process/session (cold = the
# driver's protocol); variants interleaved V1,V2,V3 x3 rounds.
#   V1 = r15 HEAD behavior: localCheckpoint, contamination fan-out ON,
#        decontaminate fan-out ON, discarding_panes stores = width
#   V2 = lazy persist(MEMORY_AND_DISK), contamination fan-out OFF,
#        decontaminate fan-out OFF, stores = 16
#   V3 = no materialization (r14 revert), contamination fan-out OFF,
#        decontaminate fan-out ON, stores = 8
set -u
cd /root/repo
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_QUERIES="incremental_dedup,incremental_embedding_dedup,semantic_dedup_incremental,contamination_report,decontaminate,discarding_panes"
for round in 1 2 3; do
  for v in 1 2 3; do
    case $v in
      1) export SCIO_AB_STAGE=ckpt    SCIO_AB_CONTAM_FANOUT=1 SCIO_AB_DECON_FANOUT=1 SCIO_AB_STORES=;;
      2) export SCIO_AB_STAGE=persist SCIO_AB_CONTAM_FANOUT=0 SCIO_AB_DECON_FANOUT=0 SCIO_AB_STORES=16;;
      3) export SCIO_AB_STAGE=none    SCIO_AB_CONTAM_FANOUT=0 SCIO_AB_DECON_FANOUT=1 SCIO_AB_STORES=8;;
    esac
    echo "=== v$v round$round start $(date +%T) ==="
    python bench.py > /dev/null 2> "tools/ab_r16/contested_v${v}_r${round}.err"
    cp BENCH_RESULT.json "tools/ab_r16/contested_v${v}_r${round}.json"
  done
done
echo ALL_DONE
