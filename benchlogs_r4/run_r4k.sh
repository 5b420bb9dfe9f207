#!/bin/bash
cd /root/repo
L=/root/repo/benchlogs_r4
while ! grep -q ALL_DONE_J $L/runner.log 2>/dev/null; do sleep 20; done
run() { name=$1; shift; echo "=== $name start $(date +%T)" >> $L/runner.log
  for a in 1 2 3; do
    timeout 3000 "$@" > $L/$name.log 2>&1 && { echo "=== $name rc=0 attempt=$a end $(date +%T)" >> $L/runner.log; return 0; }
    echo "=== $name FAIL attempt=$a rc=$? $(date +%T)" >> $L/runner.log; sleep 30
  done; }
run mm_qkv_bo3072 python benches/flagship_profile.py --group 64 --phases mm_qkv --bo 3072
run mm_qkv_bo6144 python benches/flagship_profile.py --group 64 --phases mm_qkv --bo 6144
run mm_o_bo4096 python benches/flagship_profile.py --group 64 --phases mm_o --bo 4096
echo ALL_DONE_K >> $L/runner.log
