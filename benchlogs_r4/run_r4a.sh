#!/bin/bash
# Round-4 serialized TPU backlog, phase A: profile + fresh headline.
cd /root/repo
L=/root/repo/benchlogs_r4
run() { name=$1; shift; echo "=== $name start $(date +%T)" >> $L/runner.log
  for a in 1 2 3; do
    timeout 2400 "$@" > $L/$name.log 2>&1 && { echo "=== $name rc=0 attempt=$a end $(date +%T)" >> $L/runner.log; return 0; }
    echo "=== $name FAIL attempt=$a rc=$? $(date +%T)" >> $L/runner.log; sleep 30
  done; }
run profile_g64 python benches/flagship_profile.py --group 64
run bench python bench.py
echo ALL_DONE >> $L/runner.log
