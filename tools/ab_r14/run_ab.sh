#!/bin/bash
# Round-14 bench A/B: adjudicate the r13 +27% warm-compute move and the
# 32g->8g driver-heap default. Three back-to-back full-suite runs on the
# same commit, same host session: 8g, 32g, 8g.
set -u
cd /root/repo
for tag in 8g_a 32g_a 8g_b; do
  mem="${tag%%_*}"
  echo "=== run $tag (driver mem $mem) start $(date +%T) ==="
  SPARK_GRAFT_DRIVER_MEM="$mem" python bench.py > "tools/ab_r14/stdout_$tag.json" 2> "tools/ab_r14/stderr_$tag.log"
  cp BENCH_RESULT.json "tools/ab_r14/result_$tag.json"
  echo "=== run $tag done $(date +%T) exit=$? ==="
done
echo ALL_DONE
