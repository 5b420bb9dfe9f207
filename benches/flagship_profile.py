"""Phase-by-phase profile of the flagship INT4 decode step.

The axon TPU backend has no working profiler hooks (block_until_ready is
a no-op, trace capture doesn't survive the tunnel), so this measures by
ABLATION: each phase of the decode step is rebuilt as its own scanned
program (same lax.scan structure over layers x steps as
causal_lm.decode_steps, same kernels, same shapes) and timed with the
np.asarray fence. The sum of phases vs the full step exposes glue; each
phase's measured ms vs its ideal HBM-bytes time exposes per-phase
overhead. Output: a JSON table used to decide what to attack
(VERDICT round 2: "the optimization is currently unguided").

Phases:
  ceiling  - HBM streaming ceiling (read+write of a 1.9 GB array)
  mm       - the 4 fused dequant matmuls x L x n_steps, chained
  mm_qkv/mm_o/mm_gateup/mm_down - each matmul alone x L x n_steps
  attn     - rope + in-flight update + frozen-merge attention x L x steps
  head     - final norm + int4 lm_head + argmax + embed x steps
  full     - the real causal_lm.decode_steps (the bench number)
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


def fence_time(fn, *args, reps=3, chain=4):
    """Best per-call seconds of `fn`. When `chain` > 1 and fn is a
    carry -> carry program (single argument, same-shape output), CHAIN
    data-dependent calls per fence: a single-call fence pays the full
    ~27 ms tunnel round trip (measured: the round-3 'head' phase read
    LESS than 'empty' — sub-milli phases were pure fence noise), while a
    chain amortizes it to ~27/chain ms and the dispatches overlap device
    execution exactly like the engine's run-ahead."""
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])  # compile + first
    chain = chain if len(args) == 1 else 1
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        if chain > 1:
            x = args[0]
            for _ in range(chain):
                x = fn(x)
            np.asarray(jax.tree.leaves(x)[0])
        else:
            out = fn(*args)
            np.asarray(jax.tree.leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / chain)
    return best


def main():
    global B, N_STEPS, T
    ap = argparse.ArgumentParser()
    ap.add_argument("--phases", default="ceiling,empty,mm,mm_qkv,mm_o,"
                    "mm_gateup,mm_down,attn,head,full")
    ap.add_argument("--group", type=int, default=128)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--shape", default="mistral7b",
                    help="BASELINE measurement-config architecture "
                         "(benches/flagship_bench.SHAPES)")
    ap.add_argument("--batch", type=int, default=B)
    ap.add_argument("--steps", type=int, default=N_STEPS)
    ap.add_argument("--context", type=int, default=T)
    ap.add_argument("--bk", type=int, default=None,
                    help="override contraction tile for the mm_* singles")
    ap.add_argument("--bo", type=int, default=None,
                    help="override output tile for the mm_* singles")
    ap.add_argument("--attn-impl", default="pallas",
                    help="frozen-merge route for the `full` phase: "
                         "pallas (the shipped routing) | pallas_frozen "
                         "(force the flash_decode_frozen kernel) | xla")
    ap.add_argument("--compiler-options", dest="compiler_options",
                    default=None,
                    help="JSON dict of XLA compiler options for the "
                         "`full` phase jit (TPU flags must ride here: "
                         "the tunneled backend compiles remotely and "
                         "ignores client XLA_FLAGS)")
    ap.add_argument("--trace", default=None,
                    help="directory for a jax.profiler device trace of "
                         "the `full` phase (per-XLA-op durations)")
    args = ap.parse_args()
    B, N_STEPS, T = args.batch, args.steps, args.context
    phases = args.phases.split(",")

    import tinygpt_tpu

    tinygpt_tpu.ensure_compile_cache()
    global jax
    import jax
    import jax.numpy as jnp

    from benches.flagship_bench import build_flagship
    from tinygpt_tpu.engine.kv_cache import create_kv_cache
    from tinygpt_tpu.models import causal_lm
    from tinygpt_tpu.ops.attention import sdpa_decode_frozen
    from tinygpt_tpu.ops.norms import rms_norm
    from tinygpt_tpu.ops.quant import matmul_any
    from tinygpt_tpu.models.causal_lm import _sliced_scales
    from tinygpt_tpu.ops.quant_kernels import (
        matmul_dequant_int4_stacked_fused as _mm_fused_raw,
    )

    def mm_fused(x, data, scales_qt_l, l, **kw):
        """mm_fused with the model's MSA-denial scale slicing (see
        causal_lm._sliced_scales): phases must run the SAME operand
        shapes as decode_steps or they re-create the MSA re-prefetch
        the model no longer pays."""
        qt, = scales_qt_l
        sc, ssl = _sliced_scales(qt, l)
        return _mm_fused_raw(x, data, sc, l, scales_sliced=ssl, **kw)
    from tinygpt_tpu.ops.rope import apply_rope

    results = {}

    def report(name, secs, ideal_bytes, per="step"):
        div = N_STEPS if per == "step" else 1
        ms = secs / div * 1e3
        gbs = ideal_bytes / 1e9 / (secs / div) if ideal_bytes else 0
        results[name] = {
            "ms_per_step": round(ms, 3),
            "ideal_gb": round(ideal_bytes / 1e9, 3),
            "eff_gb_s": round(gbs, 0),
        }
        print(f"{name:10s} {ms:8.3f} ms/step   ideal "
              f"{ideal_bytes/1e9:6.3f} GB -> {gbs:5.0f} GB/s",
              file=sys.stderr)

    # -- ceiling -----------------------------------------------------------
    # Read ceiling via a max-reduction of a step-dependent window: the
    # program's OUTPUT is one scalar, so the fence transfers nothing over
    # the tunnel (a streamed y = f(x) output would sync 2 GB back to
    # host — minutes). bf16 max is ~1 VPU op/element (an f32
    # multiply-accumulate reduction is 3+ and measures the VPU, not HBM
    # — advisor finding, round 3), and the dynamic-slice offset makes
    # each scan iteration's read i-DEPENDENT so XLA cannot hoist a
    # loop-invariant reduce out of the scan and collapse the slope.
    def run_ceiling():
        rows = 950 * 1024           # x [rows+pad, 1024] bf16 ~= 1.99 GB
        pad = 16
        big = jnp.ones((rows + pad, 1024), jnp.bfloat16)
        win_bytes = rows * 1024 * 2

        # slope of two in-program loop counts: a single-call timing is
        # swamped by the tunnel round trip (~26 ms/call measured
        # 2026-08-19 — an 'empty' call and a 2 GB stream both time ~27 ms),
        # so bandwidth = extra bytes / extra time between k=1 and k=11.
        def stream_k(k):
            @jax.jit
            def prog(x):
                def body(c, i):
                    w = jax.lax.dynamic_slice_in_dim(x, i, rows, axis=0)
                    return jnp.maximum(c, jnp.max(w)), None
                c, _ = jax.lax.scan(body, jnp.bfloat16(0),
                                    jnp.arange(k, dtype=jnp.int32))
                return c
            return prog

        t1 = fence_time(stream_k(1), big, reps=args.reps, chain=1)
        t11 = fence_time(stream_k(11), big, reps=args.reps, chain=1)
        secs = (t11 - t1) / 10.0
        report("ceiling", secs, win_bytes, per="one")
        results["ceiling"]["ms_per_step"] = round(secs * 1e3, 3)
        big.delete()  # free eagerly — 2 GB must not shadow other phases

    # -- empty: the per-dispatch + scan floor ------------------------------
    # A 32-step scan doing [B]-int work measures what one jitted call of
    # the same shape costs with no HBM traffic: the axon dispatch round
    # trip + scan machinery. Subtract from every other phase mentally.
    if "empty" in phases:
        @jax.jit
        def prog(t):
            def step(t, _):
                return t + 1, None

            t, _ = jax.lax.scan(step, t, None, length=N_STEPS)
            return t

        secs = fence_time(prog, jnp.zeros((B,), jnp.int32),
                          reps=args.reps)
        report("empty", secs, 0)

    if not any(p not in ("ceiling", "empty") for p in phases):
        if "ceiling" in phases:
            run_ceiling()
        print(json.dumps({"metric": "flagship_phase_profile", "b": B,
                          "t": T, "n_steps": N_STEPS,
                          "group": args.group, "phases": results}))
        return

    cfg, params, nbytes = build_flagship(bits=4, group=args.group,
                                         shape=args.shape)
    L, H, D = cfg.num_hidden_layers, cfg.hidden_size, cfg.head_dim
    Nq, Nk, I = (cfg.num_attention_heads, cfg.num_kv_heads,
                 cfg.intermediate_size)
    V = cfg.vocab_size
    q_dim = Nq * D
    lyr = params["layers"]
    eps = cfg.rms_norm_eps

    def qbytes(qt):
        return qt.data.size + qt.scales.size * qt.scales.dtype.itemsize

    w_bytes = {k: qbytes(lyr[k]) for k in
               ("qkv_w", "o_w", "gate_up_w", "down_w")}
    ln_bytes = 2 * L * H * 2

    x0 = jnp.ones((B, H), jnp.bfloat16) * 0.01
    ls = jnp.arange(L, dtype=jnp.int32)

    def invrms(v2):
        vf32 = v2.astype(jnp.float32)
        return jax.lax.rsqrt(jnp.mean(vf32 * vf32, axis=-1, keepdims=True)
                             + eps)

    ln_in = lyr["input_ln"][:, None, :]
    ln_post = lyr["post_ln"][:, None, :]

    def scan_steps(layer_body, nm):
        """Build jit program: n_steps x (scan over L of layer_body).
        `lyr` rides as an ARGUMENT pytree — closing over 3.9 GB of
        weights would embed them as jit constants (re-serialized per
        program through the tunnel)."""

        @jax.jit
        def prog(x, ly):
            def step(x, _):
                def lf(x, l):
                    return layer_body(x, l, ly), None

                x, _ = jax.lax.scan(lf, x, ls)
                return x, None

            x, _ = jax.lax.scan(step, x, None, length=N_STEPS)
            return x

        return lambda x: prog(x, lyr)

    # -- mm: the 4 fused matmuls chained ----------------------------------
    if "mm" in phases:
        def body(x, l, ly):
            qt = ly["qkv_w"]
            qkv = mm_fused(x, qt.data, (qt,), l, group=qt.group_size,
                           ln=ly["input_ln"][:, None, :], invrms=invrms(x))
            a = qkv[:, :q_dim]
            qt = ly["o_w"]
            x2 = mm_fused(a, qt.data, (qt,), l, group=qt.group_size,
                          res=x)
            qt = ly["gate_up_w"]
            gu = mm_fused(x2, qt.data, (qt,), l, group=qt.group_size,
                          ln=ly["post_ln"][:, None, :], invrms=invrms(x2))
            qt = ly["down_w"]
            return mm_fused(gu, qt.data, (qt,), l, group=qt.group_size,
                            silu=True, res=x2)

        secs = fence_time(scan_steps(body, "mm"), x0, reps=args.reps)
        report("mm", secs, (sum(w_bytes.values()) + ln_bytes))

    # -- individual matmuls ------------------------------------------------
    singles = {
        "mm_qkv": ("qkv_w", lambda out, x: out[:, :H] * 1e-3 + x),
        "mm_o": ("o_w", lambda out, x: out + x),
        "mm_gateup": ("gate_up_w", lambda out, x: out[:, :H] * 1e-3 + x),
        "mm_down": ("down_w", None),  # in = [B, I]
    }
    for nm in ("mm_qkv", "mm_o", "mm_gateup"):
        if nm not in phases:
            continue
        key, fold = singles[nm]

        def body(x, l, ly, key=key, fold=fold):
            qt = ly[key]
            kw = {}
            if args.bk:
                kw["bk"] = args.bk
            if args.bo:
                kw["bo"] = args.bo
            out = mm_fused(x, qt.data, (qt,), l, group=qt.group_size,
                           **kw)
            return fold(out, x)

        secs = fence_time(scan_steps(body, nm), x0, reps=args.reps)
        report(nm, secs, w_bytes[key])
    if "mm_down" in phases:
        xI = jnp.ones((B, I), jnp.bfloat16) * 0.01

        def body(x, l, ly):
            qt = ly["down_w"]
            kw = {}
            if args.bk:
                kw["bk"] = args.bk
            if args.bo:
                kw["bo"] = args.bo
            out = mm_fused(x[:, :I], qt.data, (qt,), l,
                           group=qt.group_size, **kw)
            return x + jnp.pad(out, ((0, 0), (0, I - H))) * 1e-3

        secs = fence_time(scan_steps(body, "mm_down"), xI, reps=args.reps)
        report("mm_down", secs, w_bytes["down_w"])

    # -- mlp: the gate_up+silu+down MEGA-kernel (one pallas call) ---------
    if "mlp" in phases:
        from tinygpt_tpu.ops.quant_kernels import (
            mlp_fused_int4_stacked,
            mlp_supported,
        )

        assert mlp_supported(H, I, args.group, batch=B)

        def body(x, l, ly):
            gqt, dqt = ly["gate_up_w"], ly["down_w"]
            gsc, gssl = _sliced_scales(gqt, l)
            dsc, dssl = _sliced_scales(dqt, l)
            return mlp_fused_int4_stacked(
                x, gqt.data, gsc, dqt.data, dsc,
                ly["post_ln"][:, None, :], invrms(x), l,
                group=gqt.group_size, gu_sliced=gssl, dn_sliced=dssl)

        secs = fence_time(scan_steps(body, "mlp"), x0, reps=args.reps)
        report("mlp", secs, w_bytes["gate_up_w"] + w_bytes["down_w"])

    # -- attn: rope + in-flight + frozen merge ----------------------------
    # attn      - bf16 cache through the XLA merge (the b4 default route)
    # attn_fp8  - fp8 (e4m3) cache through the same route: measures
    #             whether XLA fuses the fp8->bf16 convert into the dots
    #             or materializes a bf16 copy (which would eat the
    #             bandwidth win fp8 exists for)
    # attn_kernel[_fp8] - the flash_decode_frozen Pallas kernel route
    for attn_nm in ("attn", "attn_fp8"):
        if attn_nm not in phases:
            continue
        cache_dt = (jnp.float8_e4m3fn if attn_nm.endswith("fp8")
                    else jnp.bfloat16)
        cache = create_kv_cache(cfg, B, T, dtype=cache_dt)
        cache = cache._replace(
            k=(jnp.ones_like(cache.k, jnp.bfloat16) * 0.01).astype(
                cache_dt),
            v=(jnp.ones_like(cache.v, jnp.bfloat16) * 0.01).astype(
                cache_dt),
            kv_pos=jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None],
                                    (B, T)),
            valid=jnp.ones((B, T), bool),
        )
        cos, sin = params["rope_cos"], params["rope_sin"]

        @jax.jit
        def prog(x, k_frozen, v_frozen, kv_pos, valid):
            kT = jnp.swapaxes(k_frozen, 3, 4)
            infl_k0 = jnp.zeros((L, B, Nk, N_STEPS, D), jnp.bfloat16)
            infl_v0 = jnp.zeros_like(infl_k0)

            def step(carry, step_i):
                x, ik_all, iv_all = carry
                positions = jnp.full((B, 1), 64 + step_i, jnp.int32)

                def lf(x, scanned):
                    ik, iv, l = scanned
                    kf = jax.lax.dynamic_index_in_dim(kT, l, 0,
                                                      keepdims=False)
                    vf = jax.lax.dynamic_index_in_dim(v_frozen, l, 0,
                                                      keepdims=False)
                    q = x.reshape(B, 1, Nq, D)
                    k = (x[:, : Nk * D]).reshape(B, 1, Nk, D)
                    v = (x[:, Nk * D : 2 * Nk * D]).reshape(B, 1, Nk, D)
                    q, k = apply_rope(q, k, cos, sin, positions)
                    ik = jax.lax.dynamic_update_slice(
                        ik, k.transpose(0, 2, 1, 3).astype(ik.dtype),
                        (0, 0, step_i, 0))
                    iv = jax.lax.dynamic_update_slice(
                        iv, v.transpose(0, 2, 1, 3).astype(iv.dtype),
                        (0, 0, step_i, 0))
                    attn = sdpa_decode_frozen(
                        q, kf, vf, kv_pos, valid, ik, iv, step_i,
                        positions, sliding_window=cfg.sliding_window,
                        k_transposed=True)
                    return attn.reshape(B, q_dim).astype(x.dtype), (ik, iv)

                x, (ik_all, iv_all) = jax.lax.scan(
                    lf, x, (ik_all, iv_all, ls))
                return (x, ik_all, iv_all), None

            (x, _, _), _ = jax.lax.scan(
                step, (x, infl_k0, infl_v0),
                jnp.arange(N_STEPS, dtype=jnp.int32))
            return x

        secs = fence_time(
            lambda x: prog(x, cache.k, cache.v, cache.kv_pos, cache.valid),
            x0, reps=args.reps)
        isz = jnp.dtype(cache_dt).itemsize
        kv_read = L * B * Nk * T * D * isz * 2  # K + V
        # + the once-per-chunk transpose (read+write), amortized
        kT_amort = 2 * (L * B * Nk * T * D * isz) / N_STEPS
        report(attn_nm, secs, kv_read + kT_amort)
        cache.k.delete()
        cache.v.delete()

    # -- attn via the flash_decode_frozen Pallas kernel --------------------
    # The kernel reads the stacked cache directly (no whole-chunk K
    # transpose) and upcasts per tile in VMEM — the route that should
    # keep fp8's bandwidth win if the XLA route loses it to a
    # materialized convert.
    for attn_nm in ("attn_kernel", "attn_kernel_fp8"):
        if attn_nm not in phases:
            continue
        from tinygpt_tpu.ops.attention_kernels import flash_decode_frozen

        cache_dt = (jnp.float8_e4m3fn if attn_nm.endswith("fp8")
                    else jnp.bfloat16)
        k_st = jnp.full((L, B, Nk, T, D), 0.01, cache_dt)
        v_st = jnp.full((L, B, Nk, T, D), 0.01, cache_dt)
        valid = jnp.ones((B, T), bool)
        scale = D ** -0.5

        @jax.jit
        def prog(x, k_stack, v_stack, valid):
            infl_k0 = jnp.zeros((L, B, Nk, N_STEPS, D), jnp.bfloat16)
            infl_v0 = jnp.zeros_like(infl_k0)

            def step(carry, step_i):
                x, ik_all, iv_all = carry
                mask = valid  # frozen slots all visible at these positions

                def lf(x, scanned):
                    ik, iv, l = scanned
                    q = x.reshape(B, Nq, D)
                    k = (x[:, : Nk * D]).reshape(B, Nk, 1, D)
                    v = (x[:, Nk * D : 2 * Nk * D]).reshape(B, Nk, 1, D)
                    ik = jax.lax.dynamic_update_slice(
                        ik, k.astype(ik.dtype), (0, 0, step_i, 0))
                    iv = jax.lax.dynamic_update_slice(
                        iv, v.astype(iv.dtype), (0, 0, step_i, 0))
                    attn = flash_decode_frozen(
                        q, k_stack, v_stack, mask, ik, iv, l, step_i,
                        scale=scale, window=cfg.sliding_window)
                    return attn.reshape(B, q_dim).astype(x.dtype), (ik, iv)

                x, (ik_all, iv_all) = jax.lax.scan(
                    lf, x, (ik_all, iv_all, ls))
                return (x, ik_all, iv_all), None

            (x, _, _), _ = jax.lax.scan(
                step, (x, infl_k0, infl_v0),
                jnp.arange(N_STEPS, dtype=jnp.int32))
            return x

        secs = fence_time(lambda x: prog(x, k_st, v_st, valid),
                          x0, reps=args.reps)
        isz = jnp.dtype(cache_dt).itemsize
        report(attn_nm, secs, L * B * Nk * T * D * isz * 2)
        k_st.delete()
        v_st.delete()

    # -- head: final norm + lm_head + argmax + embed ----------------------
    if "head" in phases:
        head_qt = params["lm_head"]

        @jax.jit
        def prog(tok, embed, fln, hq):
            def step(tok, _):
                x = embed[tok]  # [B, H]
                x = rms_norm(x, fln, eps)
                logits = matmul_any(x, hq)
                nxt = jnp.argmax(logits, -1).astype(jnp.int32)
                return nxt, None

            tok, _ = jax.lax.scan(step, tok, None, length=N_STEPS)
            return tok

        secs = fence_time(
            lambda t: prog(t, params["embed"], params["final_ln"],
                           head_qt),
            jnp.zeros((B,), jnp.int32), reps=args.reps)
        report("head", secs, qbytes(head_qt))

    # -- prefill: one 512-token admission-shaped forward -------------------
    # TTFT's compute term. Arithmetic intensity at M=512 is ~2048 FLOP/B
    # of weights — compute-bound, so this phase measures the MXU operand
    # path of the stacked dequant kernels (bf16 vs f32 dots), not HBM.
    if "prefill" in phases:
        M_PF = 512
        cache = create_kv_cache(cfg, B, T, dtype=jnp.bfloat16)

        @jax.jit
        def prog(p, ids, c):
            # params ride as an ARGUMENT (closing over 4.27 GB embeds
            # them as jit constants re-serialized through the tunnel)
            pos = jnp.broadcast_to(jnp.arange(M_PF, dtype=jnp.int32)[None],
                                   (B, M_PF))
            logits, c = causal_lm.forward(
                p, cfg, ids, c, pos, jnp.ones((B, M_PF), bool),
                last_only=True,
                attn_impl="pallas"
                if jax.devices()[0].platform == "tpu" else "xla")
            return jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32)

        ids = jnp.ones((B, M_PF), jnp.int32)
        t0 = time.perf_counter()
        np.asarray(prog(params, ids, cache))
        print(f"prefill compile+first: {time.perf_counter()-t0:.0f}s",
              file=sys.stderr)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(prog(params, ids, cache))
            best = min(best, time.perf_counter() - t0)
        results["prefill"] = {"ms_per_step": round(best * 1e3, 3),
                              "ideal_gb": 0.0, "eff_gb_s": 0}
        print(f"prefill ({B}x{M_PF} tok) {best*1e3:8.1f} ms/call",
              file=sys.stderr)
        del cache

    # -- full --------------------------------------------------------------
    if "full" in phases:
        cache = create_kv_cache(cfg, B, T, dtype=jnp.bfloat16)

        copts = (json.loads(args.compiler_options)
                 if args.compiler_options else None)

        @functools.partial(jax.jit, donate_argnums=(2,),
                           compiler_options=copts)
        def decode_n(p, tok, c, pos0):
            keys = jax.random.split(jax.random.PRNGKey(0), N_STEPS)
            return causal_lm.decode_steps(
                p, cfg, tok, c, pos0, keys,
                lambda lg, k: jnp.argmax(lg, -1).astype(jnp.int32),
                attn_impl=args.attn_impl
                if jax.devices()[0].platform == "tpu" else "xla",
            )

        tok = jnp.zeros((B,), jnp.int32)
        pos0 = jnp.full((B, 1), 64, jnp.int32)
        toks, cache = decode_n(params, tok, cache, pos0)
        np.asarray(toks)
        chain = 4  # token-chained chunks per fence, as in bench.py
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            for _ in range(chain):
                toks, cache = decode_n(params, toks[-1], cache, pos0)
            np.asarray(toks)
            best = min(best, (time.perf_counter() - t0) / chain)
        hot = nbytes - params["embed"].size * 2
        kv_read = L * B * Nk * T * D * 2 * 2
        report("full", best, hot + kv_read)

        if args.trace:
            # one fenced chain under a device trace: per-XLA-op
            # durations land in <trace>/plugins/profile/*/vm.trace.json.gz
            with jax.profiler.trace(args.trace):
                for _ in range(2):
                    toks, cache = decode_n(params, toks[-1], cache, pos0)
                np.asarray(toks)
            print(f"trace written to {args.trace}", file=sys.stderr)

    # ceiling runs LAST: its 2 GB buffer OOMed build_flagship when it
    # ran first (round-3 profile_g64.log, RESOURCE_EXHAUSTED in
    # quantize_weight — the gate_up bf16 transient alone is 7.5 GB)
    if "ceiling" in phases:
        run_ceiling()

    print(json.dumps({"metric": "flagship_phase_profile",
                      "shape": args.shape, "b": B,
                      "t": T, "n_steps": N_STEPS, "group": args.group,
                      "phases": results}))


if __name__ == "__main__":
    main()
