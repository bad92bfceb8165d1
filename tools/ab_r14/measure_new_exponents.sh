#!/bin/bash
# sf0.1 -> sf1 exponents for the r14 additions (+ their collected anchors)
set -u
cd /root/repo
QS="dedup_embedding_lsh,incremental_embedding_dedup,ann_ivf_streamed,ann_ivf,dedup_embedding"
SPARK_GRAFT_QUERIES="$QS" SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py >/dev/null 2>&1
cp BENCH_RESULT.json tools/ab_r14/new_sf01.json
SPARK_GRAFT_QUERIES="$QS" SPARK_GRAFT_SF_DIR=/root/repo/localdata/sf1 python bench.py >/dev/null 2>&1
cp BENCH_RESULT.json tools/ab_r14/new_sf1.json
python tools/scaling_report.py tools/ab_r14/new_sf01.json tools/ab_r14/new_sf1.json 10
