"""Tuning microbench for the two non-matmul hotspots the round-4 phase
profile exposed (PROFILE_r04.json: attn 1.476 ms/step vs 0.86 ideal,
head 0.329 vs 0.12; the mm chain already runs at ~95% of the measured
ceiling).

Separates KERNEL time from GLUE time (rope + in-flight updates around
the attention kernel; embed-gather + norm + argmax around the head
matmul), and sweeps kernel tilings. Same chained-fence discipline as
benches/flagship_profile.py. Prints one JSON line.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 4
N_STEPS = 32
T = 1024


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--group", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--which", default="attn,head")
    args = ap.parse_args()
    which = args.which.split(",")

    import tinygpt_tpu

    tinygpt_tpu.ensure_compile_cache()
    import jax
    import jax.numpy as jnp

    from benches.flagship_bench import build_flagship
    from tinygpt_tpu.engine.kv_cache import create_kv_cache
    from tinygpt_tpu.models import causal_lm
    from tinygpt_tpu.ops.attention_kernels import flash_decode_frozen
    from tinygpt_tpu.ops.norms import rms_norm
    from tinygpt_tpu.ops.quant_kernels import matmul_dequant_int4
    from tinygpt_tpu.ops.rope import apply_rope

    cfg, params, nbytes = build_flagship(bits=4, group=args.group)
    L, H, D = cfg.num_hidden_layers, cfg.hidden_size, cfg.head_dim
    Nq, Nk = cfg.num_attention_heads, cfg.num_kv_heads
    q_dim = Nq * D
    results = {}

    def fence_time(fn, x0, chain=4):
        x = fn(x0)
        np.asarray(jax.tree.leaves(x)[0])
        best = float("inf")
        for _ in range(args.reps):
            x = x0
            t0 = time.perf_counter()
            for _ in range(chain):
                x = fn(x)
            np.asarray(jax.tree.leaves(x)[0])
            best = min(best, (time.perf_counter() - t0) / chain)
        return best

    def report(name, secs, ideal_bytes):
        ms = secs / N_STEPS * 1e3
        results[name] = {
            "ms_per_step": round(ms, 3),
            "eff_gb_s": round(ideal_bytes / 1e9 / (ms / 1e3), 0)
            if ideal_bytes else 0,
        }
        print(f"{name:22s} {ms:7.3f} ms/step  "
              f"{results[name]['eff_gb_s']:5.0f} GB/s", file=sys.stderr)

    x0 = jnp.ones((B, H), jnp.bfloat16) * 0.01
    ls = jnp.arange(L, dtype=jnp.int32)

    if "attn" in which:
        cache = create_kv_cache(cfg, B, T, dtype=jnp.bfloat16)
        cache = cache._replace(
            k=jnp.ones_like(cache.k) * 0.01,
            v=jnp.ones_like(cache.v) * 0.01,
            valid=jnp.ones((B, T), bool),
        )
        cos, sin = params["rope_cos"], params["rope_sin"]
        kv_read = L * B * Nk * T * D * 2 * 2
        mask = jnp.ones((B, T), bool)

        # kernel-only: the frozen flash kernel per layer per step, no
        # rope / in-flight-update glue (q/k/v derived from x by slicing).
        # The cache rides as an ARGUMENT — a closure would embed 0.54 GB
        # as jit constants, re-serialized per call through the tunnel
        # (first version of this leg measured 14 ms/step that way).
        def kernel_only(bt):
            @jax.jit
            def prog(x, kf, vf, m):
                ik = jnp.zeros((B, Nk, N_STEPS, D), jnp.bfloat16)
                iv = jnp.zeros_like(ik)

                def step(x, step_i):
                    def lf(x, l):
                        q = x.reshape(B, Nq, D)
                        attn = flash_decode_frozen(
                            q, kf, vf, m, ik, iv, l, step_i,
                            scale=D ** -0.5, window=cfg.sliding_window,
                            bt=bt)
                        return attn.reshape(B, q_dim).astype(x.dtype), None

                    x, _ = jax.lax.scan(lf, x, ls)
                    return x, None

                x, _ = jax.lax.scan(step, x,
                                    jnp.arange(N_STEPS, dtype=jnp.int32))
                return x
            return lambda x: prog(x, cache.k, cache.v, mask)

        for bt in (256, 512, 1024):
            if T % bt:
                continue
            secs = fence_time(kernel_only(bt), x0)
            report(f"attn_kernel_bt{bt}", secs, kv_read)

        # glue-only: rope + in-flight dynamic_update_slice per layer,
        # NO attention kernel (what the full attn phase adds around it)
        @jax.jit
        def glue_prog(x, cos=cos, sin=sin):
            infl_k0 = jnp.zeros((L, B, Nk, N_STEPS, D), jnp.bfloat16)
            infl_v0 = jnp.zeros_like(infl_k0)

            def step(carry, step_i):
                x, ik_all, iv_all = carry
                positions = jnp.full((B, 1), 64 + step_i, jnp.int32)

                def lf(x, scanned):
                    ik, iv, l = scanned
                    q = x.reshape(B, 1, Nq, D)
                    k = (x[:, : Nk * D]).reshape(B, 1, Nk, D)
                    v = (x[:, Nk * D: 2 * Nk * D]).reshape(B, 1, Nk, D)
                    q, k = apply_rope(q, k, cos, sin, positions)
                    ik = jax.lax.dynamic_update_slice(
                        ik, k.transpose(0, 2, 1, 3).astype(ik.dtype),
                        (0, 0, step_i, 0))
                    iv = jax.lax.dynamic_update_slice(
                        iv, v.transpose(0, 2, 1, 3).astype(iv.dtype),
                        (0, 0, step_i, 0))
                    out = (q.reshape(B, q_dim)
                           + ik[:, :, 0, :].reshape(B, Nk * D).mean()
                           ).astype(x.dtype)
                    return out, (ik, iv)

                x, (ik_all, iv_all) = jax.lax.scan(
                    lf, x, (ik_all, iv_all, ls))
                return (x, ik_all, iv_all), None

            (x, _, _), _ = jax.lax.scan(
                step, (x, infl_k0, infl_v0),
                jnp.arange(N_STEPS, dtype=jnp.int32))
            return x

        secs = fence_time(glue_prog, x0)
        report("attn_glue_only", secs, 0)
        del cache

    if "head" in which:
        head_qt = params["lm_head"]
        V = cfg.vocab_size
        hb = head_qt.data.size + head_qt.scales.size * 4

        # matmul-only with tiling sweep (no embed/norm/argmax epilogue);
        # weights ride as arguments, not captured constants
        def mm_only(bk, bo):
            @jax.jit
            def prog(x, hd, hs):
                def step(x, _):
                    lg = matmul_dequant_int4(
                        x, hd, hs,
                        group=head_qt.group_size, bk=bk, bo=bo)
                    return (x + lg[:, :H] * 1e-6).astype(x.dtype), None

                x, _ = jax.lax.scan(step, x, None, length=N_STEPS)
                return x
            return lambda x: prog(x, head_qt.data, head_qt.scales)

        for bk, bo in ((1024, 4096), (1024, 2048), (1024, 8192),
                       (2048, 4096), (512, 4096)):
            if (H // 2) % bk:
                continue
            try:
                secs = fence_time(mm_only(bk, bo), x0)
            except Exception as e:  # noqa: BLE001 — tiling may not compile
                print(f"head_mm_bk{bk}_bo{bo}: {type(e).__name__}",
                      file=sys.stderr)
                continue
            report(f"head_mm_bk{bk}_bo{bo}", secs, hb)

        # epilogue-only: embed gather + rms_norm + argmax, no matmul
        # (embed is 268 MB — argument, not a captured constant)
        @jax.jit
        def epi_prog(tok, embed, fln):
            def step(tok, _):
                x = embed[tok]
                x = rms_norm(x, fln, cfg.rms_norm_eps)
                nxt = (jnp.argmax(x, -1) + tok) % 1000
                return nxt.astype(jnp.int32), None

            tok, _ = jax.lax.scan(step, tok, None, length=N_STEPS)
            return tok

        secs = fence_time(
            lambda t: epi_prog(t, params["embed"], params["final_ln"]),
            jnp.zeros((B,), jnp.int32))
        report("head_epilogue_only", secs, 0)

        # epilogue components: which op eats the 0.2 ms?
        @jax.jit
        def gather_prog(tok, embed):
            def step(tok, _):
                x = embed[tok]
                return (tok + x[:, 0].astype(jnp.int32)) % 1000, None

            tok, _ = jax.lax.scan(step, tok, None, length=N_STEPS)
            return tok

        secs = fence_time(lambda t: gather_prog(t, params["embed"]),
                          jnp.zeros((B,), jnp.int32))
        report("head_gather_only", secs, 0)

        # same lookup as B unrolled dynamic-slices (causal_lm.embed_rows)
        @jax.jit
        def slice_prog(tok, embed):
            def step(tok, _):
                rows = [jax.lax.dynamic_slice_in_dim(embed, tok[b], 1, 0)
                        for b in range(B)]
                x = jnp.concatenate(rows, axis=0)
                return (tok + x[:, 0].astype(jnp.int32)) % 1000, None

            tok, _ = jax.lax.scan(step, tok, None, length=N_STEPS)
            return tok

        secs = fence_time(lambda t: slice_prog(t, params["embed"]),
                          jnp.zeros((B,), jnp.int32))
        report("head_gather_slices", secs, 0)

        @jax.jit
        def argmax_prog(x, fln):
            def step(x, _):
                h = rms_norm(x, fln, cfg.rms_norm_eps)
                # real [B, V] argmax input (iota-scaled, not foldable)
                lg = h[:, :1].astype(jnp.float32) * jax.lax.broadcasted_iota(
                    jnp.float32, (B, V), 1)
                nxt = jnp.argmax(lg, -1)
                return (x + nxt[:, None].astype(x.dtype) * 1e-6), None

            x, _ = jax.lax.scan(step, x, None, length=N_STEPS)
            return x

        secs = fence_time(lambda x: argmax_prog(x, params["final_ln"]), x0)
        report("head_rms_argmax_only", secs, 0)

    print(json.dumps({"metric": "hotspot_tune", "b": B, "t": T,
                      "group": args.group, "results": results}))


if __name__ == "__main__":
    main()
