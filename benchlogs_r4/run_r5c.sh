#!/bin/bash
cd /root/repo
L=/root/repo/benchlogs_r4
run() { name=$1; shift; echo "=== $name start $(date +%T)" >> $L/runner.log
  for a in 1 2 3; do
    timeout 3600 "$@" > $L/$name.log 2>&1 && { echo "=== $name rc=0 attempt=$a end $(date +%T)" >> $L/runner.log; return 0; }
    echo "=== $name FAIL attempt=$a rc=$? $(date +%T)" >> $L/runner.log; sleep 30
  done; }
run vmem_repro3 python benches/qwen3_vmem_repro.py
run bench_reviewfix python bench.py
echo ALL_DONE_5C >> $L/runner.log
