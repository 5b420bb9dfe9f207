"""Repro for the qwen3_17b admission-prefill VMEM OOM (round 4).

The failing op (benchlogs_r4/qwen3_standalone.log) was
matmul_dequant_int4_stacked on x=[512, 2048] against the qwen3 qkv
stack [28, 1024, 4096] g64 — "Scoped allocation with size 20.94M and
limit 16.00M". Compile the exact shape at several (bm, bk, bo) picks
to find which tile OOMs and which fits.

History: with the original PER-GROUP kernel body, (bm 256, bk 1024,
bo 1024, n_k 1) OOMed while bm 128 / bk 512 / bo 512 each compiled
(benchlogs_r4/vmem_repro2.log). The round-4 dequant_full branch
(whole-block VMEM dequant + one full-K dot at bm > 32) replaced that
body and the same combo now compiles (vmem_repro3.log) — _cap_single_k
remains as a guard on auto picks only; explicit overrides bypass it so
this script keeps measuring the requested tiles.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import tinygpt_tpu

    tinygpt_tpu.ensure_compile_cache()
    import jax
    import jax.numpy as jnp

    from tinygpt_tpu.ops.quant_kernels import matmul_dequant_int4_stacked

    G = 64
    M, IN = 512, 2048
    L, INP = 28, 1024
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((M, IN), np.float32)).astype(jnp.bfloat16)
    li = jnp.asarray(2, jnp.int32)

    for OUT in (4096, 12288):
        data = jnp.asarray(rng.integers(0, 255, (L, INP, OUT), np.uint8)
                           ).astype(jnp.int8)
        scales = jnp.asarray(rng.random((L, IN // G, OUT), np.float32)
                             ) * 0.01
        for bm, bk, bo in ((256, 1024, None), (256, 1024, 512),
                           (256, 512, 1024), (256, 512, 512),
                           (128, 1024, 1024), (256, 1024, 1024)):
            try:
                out = matmul_dequant_int4_stacked(
                    x, data, scales, li, group=G, bm=bm, bk=bk, bo=bo)
                np.asarray(out)
                print(f"OUT={OUT} bm={bm} bk={bk} bo={bo}: OK")
            except Exception as e:  # noqa: BLE001
                msg = str(e).splitlines()[0][:120]
                print(f"OUT={OUT} bm={bm} bk={bk} bo={bo}: FAIL {msg}")
        del data, scales


if __name__ == "__main__":
    main()
