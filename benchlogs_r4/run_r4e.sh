#!/bin/bash
cd /root/repo
L=/root/repo/benchlogs_r4
# wait for run_r4d to finish (serialized TPU access)
while ! grep -q ALL_DONE_D $L/runner.log 2>/dev/null; do sleep 20; done
run() { name=$1; shift; echo "=== $name start $(date +%T)" >> $L/runner.log
  for a in 1 2 3; do
    timeout 2400 "$@" > $L/$name.log 2>&1 && { echo "=== $name rc=0 attempt=$a end $(date +%T)" >> $L/runner.log; return 0; }
    echo "=== $name FAIL attempt=$a rc=$? $(date +%T)" >> $L/runner.log; sleep 30
  done; }
run fused_check2 python benches/qwen_fused_check.py
run profile_headfused python benches/flagship_profile.py --group 64 --phases head,full
run flagship_fp8 python benches/flagship_bench.py --kv-dtype fp8
run mm_qkv_bo2048 python benches/flagship_profile.py --group 64 --phases mm_qkv --bo 2048
run mm_down_bo4096 python benches/flagship_profile.py --group 64 --phases mm_down --bo 4096
run mm_o_bo2048 python benches/flagship_profile.py --group 64 --phases mm_o --bo 2048
echo ALL_DONE_E >> $L/runner.log
