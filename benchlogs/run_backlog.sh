#!/bin/bash
# Serialized TPU measurement backlog (one real chip - no concurrency).
cd /root/repo
L=/root/repo/benchlogs
run() { name=$1; shift; echo "=== $name start $(date +%T)" >> $L/runner.log; timeout 1500 "$@" > $L/$name.log 2>&1; echo "=== $name rc=$? end $(date +%T)" >> $L/runner.log; }
run profile_g64 python benches/flagship_profile.py --group 64
run bench python bench.py
run moe_check python benches/moe_kernel_check.py
run qwen_check python benches/qwen_fused_check.py
echo ALL_DONE >> $L/runner.log
