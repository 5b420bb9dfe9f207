#!/bin/bash
cd /root/repo
L=/root/repo/benchlogs_r4
while ! grep -q ALL_DONE_L $L/runner.log 2>/dev/null; do sleep 30; done
run() { name=$1; shift; echo "=== $name start $(date +%T)" >> $L/runner.log
  for a in 1 2 3; do
    timeout 3600 "$@" > $L/$name.log 2>&1 && { echo "=== $name rc=0 attempt=$a end $(date +%T)" >> $L/runner.log; return 0; }
    echo "=== $name FAIL attempt=$a rc=$? $(date +%T)" >> $L/runner.log; sleep 30
  done; }
run llama1b_bf16 python benches/flagship_bench.py --shape llama32_1b --bits 16
run llama1b_int8 python benches/flagship_bench.py --shape llama32_1b --bits 8
run llama1b_int4 python benches/flagship_bench.py --shape llama32_1b --bits 4
run moe_8x1b_int4 python benches/flagship_bench.py --shape moe_8x1b --bits 4
run moe_kernel_check python benches/moe_kernel_check.py
echo ALL_DONE_M >> $L/runner.log
