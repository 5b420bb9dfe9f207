#!/bin/bash
cd /root/repo
L=/root/repo/benchlogs_r4
run() { name=$1; shift; echo "=== $name start $(date +%T)" >> $L/runner.log
  for a in 1 2 3; do
    timeout 2400 "$@" > $L/$name.log 2>&1 && { echo "=== $name rc=0 attempt=$a end $(date +%T)" >> $L/runner.log; return 0; }
    echo "=== $name FAIL attempt=$a rc=$? $(date +%T)" >> $L/runner.log; sleep 30
  done; }
run fused_check python benches/qwen_fused_check.py
run profile_ropefused python benches/flagship_profile.py --group 64 --phases full,attn,head
run bench_ropefused python bench.py
run hotspot2 python benches/hotspot_tune.py --group 64 --which head
echo ALL_DONE_D >> $L/runner.log
