"""Flagship benchmark: Mistral-7B-shaped INT4 decode throughput per chip.

BASELINE.json's north-star config (tokens/sec/chip, Mistral-7B INT4).
Weights are random but layout/shape-exact (Mistral-7B-v0.3: 32 layers,
hidden 4096, kv-heads 8, intermediate 14336, vocab 32768); each stacked
weight is generated on device in bf16, quantized to int4, and the float
copy freed before the next — peak HBM stays under one spare bf16 key.

Prints one JSON line. ~16 GB HBM required.
"""

from __future__ import annotations

import argparse
import functools
import gc
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# BASELINE.json measurement-config shapes, architecture-exact (HF
# configs of the published checkpoints; weights random).
SHAPES = {
    "mistral7b": {
        "model_type": "mistral", "vocab_size": 32768, "hidden_size": 4096,
        "num_hidden_layers": 32, "num_attention_heads": 32,
        "num_key_value_heads": 8, "intermediate_size": 14336,
        "max_position_embeddings": 32768, "rope_theta": 1000000.0,
        "rms_norm_eps": 1e-5, "tie_word_embeddings": False,
    },
    "qwen25_05b": {  # Qwen2.5-0.5B (qkv bias, tied embeddings)
        "model_type": "qwen2", "vocab_size": 151936, "hidden_size": 896,
        "num_hidden_layers": 24, "num_attention_heads": 14,
        "num_key_value_heads": 2, "intermediate_size": 4864,
        "max_position_embeddings": 32768, "rope_theta": 1000000.0,
        "rms_norm_eps": 1e-6, "tie_word_embeddings": True,
    },
    "llama32_1b": {  # Llama-3.2-1B (GQA, tied)
        "model_type": "llama", "vocab_size": 128256, "hidden_size": 2048,
        "num_hidden_layers": 16, "num_attention_heads": 32,
        "num_key_value_heads": 8, "head_dim": 64,
        "intermediate_size": 8192, "max_position_embeddings": 32768,
        "rope_theta": 500000.0, "rms_norm_eps": 1e-5,
        "tie_word_embeddings": True,
    },
    "llama32_3b": {  # Llama-3.2-3B
        "model_type": "llama", "vocab_size": 128256, "hidden_size": 3072,
        "num_hidden_layers": 28, "num_attention_heads": 24,
        "num_key_value_heads": 8, "head_dim": 128,
        "intermediate_size": 8192, "max_position_embeddings": 32768,
        "rope_theta": 500000.0, "rms_norm_eps": 1e-5,
        "tie_word_embeddings": True,
    },
    "qwen3_17b": {  # Qwen3-1.7B (qk-norm, tied)
        "model_type": "qwen3", "vocab_size": 151936, "hidden_size": 2048,
        "num_hidden_layers": 28, "num_attention_heads": 16,
        "num_key_value_heads": 8, "head_dim": 128,
        "intermediate_size": 6144, "max_position_embeddings": 32768,
        "rope_theta": 1000000.0, "rms_norm_eps": 1e-6,
        "tie_word_embeddings": True,
    },
    "moe_8x1b": {  # Mixtral-architecture 8-expert ~9B-total MoE (fits
        # one chip at int4: ~3.3 GB experts) — exercises the gathered
        # int4 expert kernel at scale
        "model_type": "mixtral", "vocab_size": 32768, "hidden_size": 2048,
        "num_hidden_layers": 16, "num_attention_heads": 32,
        "num_key_value_heads": 8, "head_dim": 64,
        "intermediate_size": 4096, "num_local_experts": 8,
        "num_experts_per_tok": 2, "max_position_embeddings": 32768,
        "rope_theta": 1000000.0, "rms_norm_eps": 1e-5,
        "tie_word_embeddings": False,
    },
}


def build_flagship(bits: int = 4, group: int = 128,
                   shape: str = "mistral7b"):
    """Build architecture-exact quantized (or bf16 when bits=16) params
    for a BASELINE measurement shape (random weights). Returns
    (cfg, params, nbytes). Shared by the flagship bench and the phase
    profiler (benches/flagship_profile.py)."""
    import jax
    import jax.numpy as jnp

    from tinygpt_tpu.hf.config import parse_model_config
    from tinygpt_tpu.ops.quant import quantize_weight
    from tinygpt_tpu.ops.rope import compute_rope_freqs

    cfg = parse_model_config(SHAPES[shape])
    L, H, D = cfg.num_hidden_layers, cfg.hidden_size, cfg.head_dim
    Nq, Nk, I = cfg.num_attention_heads, cfg.num_kv_heads, \
        cfg.intermediate_size
    V = cfg.vocab_size
    key = jax.random.PRNGKey(0)

    def qkey(shp, k):
        """Generate bf16 on device, quantize (bits<16), free the float
        copy."""
        w = jax.random.normal(k, shp, jnp.bfloat16) * 0.02
        if bits == 16:
            return w
        q = quantize_weight(w, bits=bits, group_size=group)
        jax.block_until_ready(q.data)
        del w
        gc.collect()
        return q

    ks = list(jax.random.split(key, 8))
    t0 = time.perf_counter()
    layers = {
        "input_ln": jnp.ones((L, H), jnp.bfloat16),
        "post_ln": jnp.ones((L, H), jnp.bfloat16),
        "qkv_w": qkey((L, H, (Nq + 2 * Nk) * D), ks[0]),
        "o_w": qkey((L, Nq * D, H), ks[1]),
    }
    E = cfg.num_local_experts
    if E:
        from tinygpt_tpu.ops.quant import _quantize_moe_stacked

        def qmoe(shp, k):
            # per-layer to bound the bf16 transient ([1, E, ...] each)
            outs = []
            for i in range(L):
                w = jax.random.normal(
                    jax.random.fold_in(k, i), (1, *shp), jnp.bfloat16
                ) * 0.02
                q = (w if bits == 16 else
                     _quantize_moe_stacked(w, bits=bits, group_size=group))
                jax.block_until_ready(q.data if bits != 16 else q)
                del w
                gc.collect()
                outs.append(q)
            if bits == 16:
                return jnp.concatenate(outs)
            from tinygpt_tpu.ops.quant import QuantizedTensor

            return QuantizedTensor(
                jnp.concatenate([q.data for q in outs]),
                jnp.concatenate([q.scales for q in outs]),
                bits=outs[0].bits, group_size=outs[0].group_size,
                in_dim=outs[0].in_dim,
            )

        layers["router_w"] = (jax.random.normal(ks[6], (L, H, E),
                                                jnp.bfloat16) * 0.02)
        layers["moe_gate_up_w"] = qmoe((E, H, 2 * I), ks[2])
        layers["moe_down_w"] = qmoe((E, I, H), ks[3])
    else:
        layers["gate_up_w"] = qkey((L, H, 2 * I), ks[2])
        layers["down_w"] = qkey((L, I, H), ks[3])
    if cfg.qkv_bias:
        layers["qkv_b"] = jnp.zeros((L, (Nq + 2 * Nk) * D), jnp.bfloat16)
    if cfg.qk_norm:
        layers["q_norm"] = jnp.ones((L, D), jnp.bfloat16)
        layers["k_norm"] = jnp.ones((L, D), jnp.bfloat16)
    cos, sin = compute_rope_freqs(D, 4096, cfg.rope_theta, None)
    from tinygpt_tpu.ops.quant import HEAD_PAD_MULTIPLE

    # head OUT padded exactly as the engine's quantize path
    # (ops/quant.pad_head_out): non-pow2 vocabs (qwen 151936) otherwise
    # tile at bo=128 and the head phase runs at 189 GB/s
    Vp = V + (-V % HEAD_PAD_MULTIPLE) if bits != 16 else V
    params = {
        "embed": jax.random.normal(ks[4], (V, H), jnp.bfloat16) * 0.02,
        "layers": layers,
        "final_ln": jnp.ones((H,), jnp.bfloat16),
        # tied checkpoints reuse the embedding as the head; the engine
        # materializes a quantized transposed copy at load — mirror that
        "lm_head": qkey((H, Vp), ks[5]),
        "rope_cos": jnp.asarray(cos),
        "rope_sin": jnp.asarray(sin),
    }
    nbytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(params)
    )
    print(f"params built in {time.perf_counter()-t0:.0f}s, "
          f"{nbytes/1e9:.2f} GB resident", file=sys.stderr)
    return cfg, params, nbytes


def run(batch: int = 4, decode_steps: int = 32, bits: int = 4,
        group: int = 0, context: int = 1024,
        serving: bool = False, kv_dtype: str = "bf16",
        shape: str = "mistral7b", shared_prefix: int = 0) -> dict:
    """Build a BASELINE-shape quantized model and measure decode
    tokens/s/chip; returns the result dict (also used by bench.py as the
    driver's headline metric). group 0 = the shipped default
    (engine.resolve_quant_group: int4 64 dense / 128 moe, int8 128)."""
    import types

    from tinygpt_tpu.engine.engine import resolve_quant_group

    if not group:
        group = resolve_quant_group(bits, None, moe=shape.startswith("moe"))

    args = types.SimpleNamespace(batch=batch, decode_steps=decode_steps,
                                 bits=bits, group=group, context=context,
                                 serving=serving)

    import tinygpt_tpu

    tinygpt_tpu.ensure_compile_cache()  # decode program compiles in
    # minutes cold; the persistent cache makes reruns start in seconds

    import jax
    import jax.numpy as jnp

    from tinygpt_tpu.engine.kv_cache import create_kv_cache
    from tinygpt_tpu.models import causal_lm

    cfg, params, nbytes = build_flagship(bits=bits, group=group,
                                         shape=shape)

    B, N = args.batch, args.decode_steps
    kv_dt = jnp.float8_e4m3fn if kv_dtype in ("fp8", "e4m3") \
        else jnp.bfloat16
    cache = create_kv_cache(cfg, B, args.context, dtype=kv_dt)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def decode_n(p, tok, c, pos0):
        # frozen-cache chunked decode (causal_lm.decode_steps): the big KV
        # cache is a loop invariant — no per-step cache round-trip
        keys = jax.random.split(jax.random.PRNGKey(0), N)
        return causal_lm.decode_steps(
            p, cfg, tok, c, pos0, keys,
            lambda lg, k: jnp.argmax(lg, -1).astype(jnp.int32),
            attn_impl="pallas" if jax.devices()[0].platform == "tpu"
            else "xla",
        )

    tok = jnp.zeros((B,), jnp.int32)
    pos0 = jnp.full((B, 1), 64, jnp.int32)
    t0 = time.perf_counter()
    toks, cache = decode_n(params, tok, cache, pos0)
    np.asarray(toks)
    print(f"compile+first: {time.perf_counter()-t0:.0f}s", file=sys.stderr)
    # chain several chunk dispatches per fence: the tunneled backend's
    # host sync costs ~25 ms per np.asarray round trip (measured,
    # benches/flagship_profile.py "empty" phase) — a single-call timing
    # would charge ~0.8 ms/step of pure host latency to the device. The
    # engine and scheduler pipeline dispatches exactly like this
    # (device-ahead-of-host / pipelined quanta), so the chained number is
    # the honest steady-state decode rate. Token chaining keeps the calls
    # data-dependent (no overlap-cheating): each chunk consumes the
    # previous chunk's last token.
    chain = 4
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(chain):
            toks, cache = decode_n(params, toks[-1], cache, pos0)
        np.asarray(toks)  # one fence per chain (see bench.py)
        best = min(best, (time.perf_counter() - t0) / chain)

    # hot bytes/step = weights+scales (embed gather is traffic-free)
    # PLUS the KV-cache read — the same accounting as the phase
    # profiler's "full" row (round 4's 4.01-vs-4.543 GB discrepancy was
    # this term; see README "Roofline and byte accounting")
    kv_read = (cfg.num_hidden_layers * B * cfg.num_kv_heads
               * args.context * cfg.head_dim
               * jnp.dtype(kv_dt).itemsize * 2)
    hot = nbytes - params["embed"].size * 2 + kv_read
    if cfg.num_local_experts:
        # the gathered decode kernels read only the ROUTED k/E experts
        moe_bytes = sum(
            x.size * x.dtype.itemsize
            for key in ("moe_gate_up_w", "moe_down_w")
            for x in jax.tree.leaves(params["layers"][key])
        )
        # each of the B*k row-slots streams its own expert copy (the
        # kernel does not dedup), so traffic = B*k/E of the stack —
        # which can exceed 1x when B*k > E
        frac = batch * cfg.num_experts_per_tok / cfg.num_local_experts
        hot = hot - moe_bytes + moe_bytes * frac
    prec = "bf16" if bits == 16 else f"int{bits}"
    res = {
        "metric": f"decode_tokens_per_sec_{shape}_{prec}_b{B}"
                  + ("_fp8kv" if kv_dtype in ("fp8", "e4m3") else ""),
        "value": round(B * N / best, 1),
        "unit": "tokens/s",
        "ms_per_step": round(best / N * 1e3, 2),
        "hot_gb_per_step": round(hot / 1e9, 2),
        "eff_gb_s": round(hot / 1e9 / (best / N), 0),
    }
    if getattr(args, "serving", False):
        del cache
        gc.collect()
        res.update(streaming_leg(cfg, params))
        res.update(serving_leg(cfg, params, shared_prefix=shared_prefix))
        if shared_prefix:
            res["serving_shared_prefix"] = shared_prefix
    return res


def streaming_leg(cfg, params, max_new: int = 96, chunk: int = 8) -> dict:
    """Inter-token cadence of the STREAMING decode path at the flagship
    shape: the engine's generate_async runs decode in `stream_chunk`-step
    dispatches with run-ahead (launch chunk k+1 before syncing chunk k),
    so an SSE client sees a burst of `chunk` tokens every chunk-execution
    interval. Reports client-perceived inter-token gap percentiles and
    the steady streaming rate (same loop structure as
    engine._prefill_and_loop, driven directly on the bench params)."""
    import functools

    import jax
    import jax.numpy as jnp

    from tinygpt_tpu.engine.kv_cache import create_kv_cache
    from tinygpt_tpu.models import causal_lm

    attn = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    cache = create_kv_cache(cfg, 1, 512, dtype=jnp.bfloat16)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def chunk_fn(p, tok, c, pos0):
        keys = jax.random.split(jax.random.PRNGKey(0), chunk)
        return causal_lm.decode_steps(
            p, cfg, tok, c, pos0, keys,
            lambda lg, k: jnp.argmax(lg, -1).astype(jnp.int32),
            attn_impl=attn,
        )

    tok = jnp.zeros((1,), jnp.int32)
    step = 0
    pos = 8

    def launch(t):
        nonlocal pos
        out = chunk_fn(params, t, cache, jnp.full((1, 1), pos, jnp.int32))
        pos += chunk
        return out

    nxt, cache = launch(tok)          # warm/compile
    np.asarray(nxt)
    arrivals = []
    last_sync = None
    min_gap = float("inf")
    step_dt = 0.0
    # run-ahead depth 2 + threaded fetch (engine._prefill_and_loop):
    # two chunks queued device-side and the next chunk's fetch running
    # in a worker thread while this chunk's tokens pace out, so the
    # inter-sync gap is pure chunk execution (the ~27 ms tunnel round
    # trip otherwise serializes between pacing loops)
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=1)
    nxt, cache = launch(nxt[-1])
    ahead = None
    if chunk < max_new:
        ahead, cache = launch(nxt[-1])
    fut = pool.submit(np.asarray, nxt)
    while step < max_new:
        ahead2 = None
        if ahead is not None and step + 2 * chunk < max_new:
            ahead2, cache = launch(ahead[-1])
        nh = fut.result()
        fut = pool.submit(np.asarray, ahead) if ahead is not None else None
        now = time.perf_counter()
        if last_sync is not None:
            # 1.15x min-gap estimate — a last-gap estimate feeds back
            # through the pacing sleeps (see engine._prefill_and_loop)
            min_gap = min(min_gap, now - last_sync)
            step_dt = min(1.15 * min_gap / chunk,
                          0.98 * min_gap / max(1, chunk - 1), 0.25)
        last_sync = now
        # paced emission (engine stream_pace, the SSE default): each
        # already-produced token is released at the measured per-step
        # interval while the run-ahead chunk executes underneath
        for i in range(len(nh)):
            if ahead is not None and step_dt and i:
                wait = now + i * step_dt - time.perf_counter()
                if wait > 0:
                    time.sleep(wait)
            arrivals.append(time.perf_counter())
        step += len(nh)
        if ahead is None:
            break
        nxt, ahead = ahead, ahead2
    pool.shutdown(wait=False)
    gaps = np.diff(arrivals[chunk:]) * 1e3  # ms; skip first burst
    span = arrivals[-1] - arrivals[chunk - 1]
    return {
        "stream_chunk": chunk,
        "stream_itl_p50_ms": round(float(np.percentile(gaps, 50)), 2),
        "stream_itl_p95_ms": round(float(np.percentile(gaps, 95)), 2),
        "stream_tok_s": round((len(arrivals) - chunk) / span, 1),
    }


def serving_leg(cfg, params, n_requests: int = 16, prompt_len: int = 512,
                max_new: int = 256, arrival_gap_s: float = 0.25,
                prefill_chunk: int = 0, capacity: int = 16,
                shared_prefix: int = 0) -> dict:
    """Sustained serving throughput under continuous batching at the
    flagship shape (BASELINE: ">=85% of roofline decode tokens/s/chip
    under continuous batching"), reusing the quantized params.

    Requests arrive STAGGERED (one every `arrival_gap_s`, injected
    between scheduler steps) and decode max_new=256 tokens against a
    512-token prompt, so the measurement is decode-dominated
    (256*16=4096 decode vs 8192 prefill tokens processed at ~50x the
    rate) — unlike the round-2 leg, which was prefill-bound at
    max_new=32. Steady-state throughput is reported over the middle
    half of the run (ramp-up and drain excluded) alongside whole-run
    throughput and real TTFT percentiles (np.percentile, distinct
    p50/p95 under staggering)."""
    import jax

    from tinygpt_tpu.engine.scheduler import (
        ContinuousBatcher,
        Request,
        SchedulerConfig,
    )
    from tinygpt_tpu.models import causal_lm

    rng = np.random.default_rng(0)
    attn = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    # capacity >= n_requests in flight: the serving-tax decomposition
    # (benches/serving_tax.py, PROFILE_r04) showed the decode quantum
    # itself runs AT dense speed — the old leg's 35% "tax" was requests
    # queueing for rows at capacity 8 plus admission interleave. 16 rows
    # admit every arrival immediately (b16 decode is bandwidth-bound, so
    # the wider quantum is nearly free per token). prefill_chunk=0 =
    # whole-prompt admission, the scheduler default: the round-4 sweep
    # (benchlogs_r4/serving_sweep.log) measured TTFT p50 0.196 s at
    # chunk 0 vs 1.06 s at chunk 256 — at 512-token prompts a whole
    # prompt is a single quantum, while chunking splits admission across
    # decode-interleaved quanta and defers the first token; chunked
    # prefill earns its keep on prompts MUCH longer than a decode
    # quantum (it bounds running streams' stall), not at this load. The
    # prefix cache rides the shipped default (no hits on random prompts;
    # its bookkeeping cost is part of the honest measurement).
    batcher = ContinuousBatcher(
        causal_lm, cfg, params, eos_ids=set(),
        config=SchedulerConfig(
            batch_capacity=capacity, block_size=64,
            n_blocks=capacity * 16 + 1,
            max_blocks_per_seq=16, prefill_bucket=64, dtype="bfloat16",
            attn_impl=attn, prefill_chunk_tokens=prefill_chunk,
        ),
    )
    # warmup: compile admission + quantum
    warm = [int(x) for x in rng.integers(2, cfg.vocab_size, prompt_len)]
    batcher.add_request(Request(request_id=-1, prompt_ids=warm,
                                max_new_tokens=max_new))
    while batcher.has_work:
        batcher.step()

    # shared_prefix > 0: every prompt opens with the same system-prompt-
    # like prefix (prefix-cache measurement leg; whole 64-token blocks of
    # it are reused read-only after the first admission) followed by
    # (prompt_len - shared_prefix) private tokens
    assert 0 <= shared_prefix < prompt_len, \
        f"--shared-prefix must be < prompt_len ({prompt_len})"
    if shared_prefix % 64:
        print(f"note: shared_prefix {shared_prefix} is not a multiple of "
              f"the 64-token block size — only whole blocks are reused "
              f"({shared_prefix // 64 * 64} tokens)", file=sys.stderr)
    shared = [int(x) for x in rng.integers(2, cfg.vocab_size, shared_prefix)]
    if shared_prefix:
        # the HIT-shaped admission program (p_blk shared blocks + short
        # suffix) is a different compile than the cold full-prompt one:
        # warm it too, or its in-run compile stall wrecks the window
        # (measured: p95 TTFT 3.5 s, steady 246 vs 796 tok/s,
        # benchlogs_r4/flagship_prefix.log). The warm prompts use a
        # DIFFERENT prefix so only shapes are warmed, not the measured
        # run's cache entries... the prefix bytes differ, the block
        # hashes differ, and the measured run still does its own first
        # cold admission.
        wshared = [int(x) for x in
                   rng.integers(2, cfg.vocab_size, shared_prefix)]
        for rid in (-2, -3):
            batcher.add_request(Request(
                request_id=rid,
                prompt_ids=wshared + [int(x) for x in rng.integers(
                    2, cfg.vocab_size, prompt_len - shared_prefix)],
                max_new_tokens=8))
            while batcher.has_work:
                batcher.step()
    prompts = [shared + [int(x) for x in rng.integers(
        2, cfg.vocab_size, prompt_len - shared_prefix)]
        for _ in range(n_requests)]
    submit = {}
    first = {}
    finish = {}
    toks = 0
    tok_times = []  # (time, cumulative tokens) for the steady-state window
    nxt = 0
    t0 = time.perf_counter()
    while nxt < n_requests or batcher.has_work:
        now = time.perf_counter()
        while nxt < n_requests and now - t0 >= nxt * arrival_gap_s:
            batcher.add_request(Request(request_id=nxt,
                                        prompt_ids=prompts[nxt],
                                        max_new_tokens=max_new))
            submit[nxt] = now
            nxt += 1
        if not batcher.has_work:
            time.sleep(0.001)
            continue
        for ev in batcher.step():
            if ev.token_id is not None:
                toks += 1
                if ev.request_id not in first:
                    first[ev.request_id] = time.perf_counter()
            if ev.finished:
                finish[ev.request_id] = time.perf_counter()
        tok_times.append((time.perf_counter(), toks))
    wall = time.perf_counter() - t0
    ttfts = [first[i] - submit[i] for i in sorted(first)]
    # steady state: middle half of the run by wall time — excludes the
    # admission ramp-up and the drain tail (robust even when the first
    # completion precedes the last admission)
    lo, hi = t0 + 0.25 * wall, t0 + 0.75 * wall
    win = [(t, n) for t, n in tok_times if lo <= t <= hi]
    if len(win) >= 2 and win[-1][0] > win[0][0]:
        steady = (win[-1][1] - win[0][1]) / (win[-1][0] - win[0][0])
    else:
        steady = toks / wall
    return {
        "serving_ttft_p50_s": round(float(np.percentile(ttfts, 50)), 3),
        "serving_ttft_p95_s": round(float(np.percentile(ttfts, 95)), 3),
        "serving_tok_s": round(toks / wall, 1),
        "serving_steady_tok_s": round(float(steady), 1),
        "serving_requests": n_requests,
        "serving_prompt_len": prompt_len,
        "serving_max_new": max_new,
        "serving_arrival_gap_s": arrival_gap_s,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--decode-steps", type=int, default=32)
    ap.add_argument("--bits", type=int, default=4, choices=[4, 8, 16],
                    help="16 = unquantized bf16")
    ap.add_argument("--group", type=int, default=0,
                    help="0 = the shipped default (engine resolve_quant_group)")
    ap.add_argument("--context", type=int, default=1024)
    ap.add_argument("--serving", action="store_true",
                    help="also measure TTFT/throughput under continuous "
                         "batching at the flagship shape")
    ap.add_argument("--kv-dtype", default="bf16", choices=["bf16", "fp8"])
    ap.add_argument("--shape", default="mistral7b",
                    choices=sorted(SHAPES),
                    help="BASELINE measurement-config architecture")
    ap.add_argument("--shared-prefix", type=int, default=0,
                    help="serving leg: tokens of system prompt shared by "
                         "all requests (prefix-cache measurement)")
    args = ap.parse_args()
    print(json.dumps(run(args.batch, args.decode_steps, args.bits,
                         args.group, args.context, serving=args.serving,
                         kv_dtype=args.kv_dtype, shape=args.shape,
                         shared_prefix=args.shared_prefix)))


if __name__ == "__main__":
    main()
