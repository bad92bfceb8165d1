#!/bin/bash
# zorder_layout interleaved cold evidence (VERDICT item 4) + streaming
# state-store A/B for streaming_join / stateful_stream (item 7).
set -u
cd /root/repo
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_QUERIES="zorder_layout,streaming_join,stateful_stream,continuous_rollup"
for round in 1 2 3; do
  for v in 1 2 3; do
    case $v in
      1) export SCIO_AB_SJ=4 SCIO_AB_SS=8;;   # current settings
      2) export SCIO_AB_SJ=2 SCIO_AB_SS=4;;
      3) export SCIO_AB_SJ=8 SCIO_AB_SS=16;;
    esac
    echo "=== v$v round$round start $(date +%T) ==="
    python bench.py > /dev/null 2>&1
    cp BENCH_RESULT.json "tools/ab_r16/misc_v${v}_r${round}.json"
  done
done
echo ALL_DONE
