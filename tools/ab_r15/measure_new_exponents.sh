#!/bin/bash
# sf0.1 -> sf1 exponents for the r15 additions (+ anchors):
#   ann_hnsw_sharded (cogrouped shard build, no side-input bound)
#   ann_ivf_appended (staged IVF index + batch append + exact search)
# anchors: ann_hnsw (side-input HNSW), ann_ivf (one-shot IVF)
set -u
cd /root/repo
QS="ann_hnsw_sharded,ann_ivf_appended,ann_hnsw,ann_ivf"
SPARK_GRAFT_QUERIES="$QS" SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py >/dev/null 2>&1
cp BENCH_RESULT.json tools/ab_r15/new_sf01.json
SPARK_GRAFT_QUERIES="$QS" SPARK_GRAFT_SF_DIR=/root/repo/localdata/sf1 python bench.py >/dev/null 2>&1
cp BENCH_RESULT.json tools/ab_r15/new_sf1.json
python tools/scaling_report.py tools/ab_r15/new_sf01.json tools/ab_r15/new_sf1.json 10
