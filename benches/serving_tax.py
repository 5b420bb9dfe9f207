"""Decompose the continuous-batching tax at the flagship shape.

VERDICT r3 weak #3: serving steady-state ran ~35% below dense decode at
the SAME row count (469 vs 741 tok/s at B=8) and nobody had decomposed
it. This bench measures, in one process on the same quantized params:

  dense      causal_lm.decode_steps        B=8, dense 1024-slot cache
  paged      _decode_quantum_frozen        B=8, frozen paged pools,
             device-chained tokens, NO per-quantum host re-uploads
  paged_host same quantum, but mirroring the scheduler's per-quantum
             host work: meta + sampler-param uploads and a host-side
             jax.random.split before every dispatch
  sched      ContinuousBatcher.step() steady state (8 admitted rows,
             no arrivals inside the timed window)

dense->paged      = paged-kernel + quantum-structure cost
paged->paged_host = per-quantum upload / host-dispatch tax
paged_host->sched = scheduler bookkeeping (_ensure_blocks, event
                    emission, snapshot dicts) + drain interleave

All legs use the serving quantum length (8 steps per dispatch) and the
same fence discipline as bench.py (token-chained dispatches, one
np.asarray per chain — the axon tunnel's ~25 ms sync would otherwise
dominate). Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 8
QUANTUM = 8
BLOCK = 64
MAX_BLOCKS = 16  # 1024 slots per row, matching the dense leg's cache
PROMPT = 512


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--group", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--chain", type=int, default=8,
                    help="quanta per fence")
    ap.add_argument("--shape", default="mistral7b",
                    help="BASELINE shape (smaller ones smoke-test on CPU)")
    args = ap.parse_args()

    import tinygpt_tpu

    tinygpt_tpu.ensure_compile_cache()
    import functools

    import jax
    import jax.numpy as jnp

    from benches.flagship_bench import build_flagship
    from tinygpt_tpu.engine.kv_cache import create_kv_cache
    from tinygpt_tpu.engine.paged_kv import create_paged_state
    from tinygpt_tpu.engine.scheduler import _decode_quantum_frozen
    from tinygpt_tpu.models import causal_lm

    attn = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    cfg, params, nbytes = build_flagship(bits=4, group=args.group,
                                         shape=args.shape)
    hot = nbytes - params["embed"].size * 2
    results = {}

    def report(name, secs_per_quantum, steps=QUANTUM):
        ms = secs_per_quantum / steps * 1e3
        results[name] = {
            "ms_per_step": round(ms, 3),
            "tok_s": round(B * steps / secs_per_quantum, 1),
            "eff_gb_s": round(hot / 1e9 / (ms / 1e3), 0),
        }
        print(f"{name:11s} {ms:7.3f} ms/step  {results[name]['tok_s']:7.1f}"
              f" tok/s  {results[name]['eff_gb_s']:5.0f} GB/s",
              file=sys.stderr)

    # -- dense ---------------------------------------------------------------
    cache = create_kv_cache(cfg, B, MAX_BLOCKS * BLOCK, dtype=jnp.bfloat16)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def dense_q(p, tok, c, pos0):
        keys = jax.random.split(jax.random.PRNGKey(0), QUANTUM)
        return causal_lm.decode_steps(
            p, cfg, tok, c, pos0, keys,
            lambda lg, k: jnp.argmax(lg, -1).astype(jnp.int32),
            attn_impl=attn)

    tok = jnp.zeros((B,), jnp.int32)
    pos0 = jnp.full((B, 1), PROMPT, jnp.int32)
    toks, cache = dense_q(params, tok, cache, pos0)
    np.asarray(toks)
    best = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        for _ in range(args.chain):
            toks, cache = dense_q(params, toks[-1], cache, pos0)
        np.asarray(toks)
        best = min(best, (time.perf_counter() - t0) / args.chain)
    report("dense", best)
    del cache

    # -- paged (pure device chain) -------------------------------------------
    n_blocks = 1 + B * MAX_BLOCKS
    state = create_paged_state(cfg, n_blocks, BLOCK, B, MAX_BLOCKS,
                               dtype=jnp.bfloat16)
    tables = np.zeros((B, MAX_BLOCKS), np.int32)
    for r in range(B):
        tables[r] = 1 + r * MAX_BLOCKS + np.arange(MAX_BLOCKS)
    lengths = np.full(B, PROMPT, np.int32)
    state = state._replace(
        block_tables=jnp.asarray(tables),
        lengths=jnp.asarray(lengths),
        starts=jnp.zeros(B, jnp.int32),
        active=jnp.ones(B, bool),
    )
    zeros_f = jnp.zeros(B, jnp.float32)
    zeros_i = jnp.zeros(B, jnp.int32)
    ones_f = jnp.ones(B, jnp.float32)
    key0 = jax.random.PRNGKey(0)
    q_fn = functools.partial(
        _decode_quantum_frozen,
        decode_paged_steps=causal_lm.decode_paged_steps,
        cfg=cfg, attn_impl=attn, n_steps=QUANTUM, all_greedy=True)

    toks, state = q_fn(params, state, tok, zeros_f, zeros_i, ones_f,
                       zeros_f, key0)
    np.asarray(toks)
    best = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        for _ in range(args.chain):
            toks, state = q_fn(params, state, toks[-1], zeros_f, zeros_i,
                               ones_f, zeros_f, key0)
        np.asarray(toks)
        best = min(best, (time.perf_counter() - t0) / args.chain)
    report("paged", best)

    # -- paged + per-quantum host uploads (the scheduler's pattern) ----------
    key = jax.random.PRNGKey(0)
    temps = np.zeros(B, np.float32)
    topks = np.zeros(B, np.int32)
    topps = np.ones(B, np.float32)
    minps = np.zeros(B, np.float32)
    tabs_h = tables.copy()
    lens_h = lengths.copy()
    starts_h = np.zeros(B, np.int32)
    act_h = np.ones(B, bool)

    def host_quantum(state, tok_dev, key):
        # mirrors ContinuousBatcher._decode + _sync_state_meta
        state = state._replace(
            block_tables=jnp.asarray(tabs_h.copy()),
            lengths=jnp.asarray(lens_h.copy()),
            starts=jnp.asarray(starts_h.copy()),
            active=jnp.asarray(act_h.copy()),
        )
        key, k = jax.random.split(key)
        toks, state = q_fn(params, state,
                           tok_dev, jnp.asarray(temps.copy()),
                           jnp.asarray(topks.copy()),
                           jnp.asarray(topps.copy()),
                           jnp.asarray(minps.copy()), k)
        return toks, state, key

    toks, state, key = host_quantum(state, toks[-1], key)
    np.asarray(toks)
    best = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        for _ in range(args.chain):
            toks, state, key = host_quantum(state, toks[-1], key)
        np.asarray(toks)
        best = min(best, (time.perf_counter() - t0) / args.chain)
    report("paged_host", best)
    del state

    # -- scheduler steady state ----------------------------------------------
    from tinygpt_tpu.engine.scheduler import (
        ContinuousBatcher,
        Request,
        SchedulerConfig,
    )

    n_quanta = args.chain * args.reps + 8
    batcher = ContinuousBatcher(
        causal_lm, cfg, params, eos_ids=set(),
        config=SchedulerConfig(
            batch_capacity=B, block_size=BLOCK,
            n_blocks=n_blocks + B * 8, max_blocks_per_seq=MAX_BLOCKS + 8,
            prefill_bucket=64, dtype="bfloat16", attn_impl=attn,
            enable_prefix_cache=False, decode_quantum=QUANTUM,
        ),
    )
    rng = np.random.default_rng(0)
    for i in range(B):
        prompt = [int(x) for x in rng.integers(2, cfg.vocab_size, PROMPT)]
        batcher.add_request(Request(
            request_id=i, prompt_ids=prompt,
            max_new_tokens=QUANTUM * (n_quanta + 4)))
    # admit all 8 + warm the quantum compile
    for _ in range(B + 4):
        batcher.step()
    assert batcher.n_running == B, batcher.n_running
    n_ev = 0
    t0 = time.perf_counter()
    for _ in range(args.chain * args.reps):
        n_ev += sum(1 for ev in batcher.step() if ev.token_id is not None)
    # drain the pipelined tail so every issued quantum is counted
    wall = time.perf_counter() - t0
    secs = wall / (args.chain * args.reps)
    report("sched", secs)
    results["sched"]["tokens_emitted"] = n_ev

    d = results
    print(json.dumps({
        "metric": "serving_tax_decomposition", "b": B,
        "quantum": QUANTUM, "group": args.group,
        "legs": d,
        "tax_ms_per_step": {
            "paged_kernel": round(d["paged"]["ms_per_step"]
                                  - d["dense"]["ms_per_step"], 3),
            "host_uploads": round(d["paged_host"]["ms_per_step"]
                                  - d["paged"]["ms_per_step"], 3),
            "scheduler_loop": round(d["sched"]["ms_per_step"]
                                    - d["paged_host"]["ms_per_step"], 3),
        },
    }))


if __name__ == "__main__":
    main()
