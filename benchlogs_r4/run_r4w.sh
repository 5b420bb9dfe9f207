#!/bin/bash
cd /root/repo
L=/root/repo/benchlogs_r4
run() { name=$1; shift; echo "=== $name start $(date +%T)" >> $L/runner.log
  for a in 1 2 3; do
    timeout 3600 "$@" > $L/$name.log 2>&1 && { echo "=== $name rc=0 attempt=$a end $(date +%T)" >> $L/runner.log; return 0; }
    echo "=== $name FAIL attempt=$a rc=$? $(date +%T)" >> $L/runner.log; sleep 30
  done; }
run prefix_on  python benches/serving_bench.py --requests 16 --shared-prefix 448 --prompt-len 64 --max-new 64 --capacity 8
run prefix_off python benches/serving_bench.py --requests 16 --shared-prefix 448 --prompt-len 64 --max-new 64 --capacity 8 --no-prefix-cache
echo ALL_DONE_W >> $L/runner.log
