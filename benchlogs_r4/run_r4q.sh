#!/bin/bash
cd /root/repo
L=/root/repo/benchlogs_r4
run() { name=$1; shift; echo "=== $name start $(date +%T)" >> $L/runner.log
  for a in 1 2 3; do
    timeout 3600 "$@" > $L/$name.log 2>&1 && { echo "=== $name rc=0 attempt=$a end $(date +%T)" >> $L/runner.log; return 0; }
    echo "=== $name FAIL attempt=$a rc=$? $(date +%T)" >> $L/runner.log; sleep 30
  done; }
run vmem_repro2 python benches/qwen3_vmem_repro.py
run qwen3_standalone2 python benches/flagship_bench.py --shape qwen3_17b --serving
run bench_final python bench.py
echo ALL_DONE_Q >> $L/runner.log
