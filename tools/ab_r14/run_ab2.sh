#!/bin/bash
# Runs 2-3 of the r14 A/B, executed from the pristine r13 worktree
# (.ab_r13) because the main tree is being edited this round.
set -u
cd /root/repo/.ab_r13
for tag in 32g_a 8g_b; do
  mem="${tag%%_*}"
  echo "=== run $tag (driver mem $mem) start $(date +%T) ==="
  SPARK_GRAFT_DRIVER_MEM="$mem" python bench.py > "/root/repo/tools/ab_r14/stdout_$tag.json" 2> "/root/repo/tools/ab_r14/stderr_$tag.log"
  echo "exit=$?"
  cp BENCH_RESULT.json "/root/repo/tools/ab_r14/result_$tag.json"
  echo "=== run $tag done $(date +%T) ==="
done
echo ALL_DONE
