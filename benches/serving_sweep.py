"""TTFT tuning sweep at the flagship shape: one param build, several
serving_leg configurations (prefill-chunk size x capacity). Finds the
admission policy that hits the BASELINE p50-TTFT target without a
steady-state regression. Prints one JSON line per leg."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import tinygpt_tpu

    tinygpt_tpu.ensure_compile_cache()
    from benches.flagship_bench import build_flagship, serving_leg

    cfg, params, _ = build_flagship(bits=4, group=64)
    for chunk, cap in ((256, 16), (512, 16), (0, 16)):
        res = serving_leg(cfg, params, prefill_chunk=chunk, capacity=cap)
        res["prefill_chunk"] = chunk
        res["capacity"] = cap
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
