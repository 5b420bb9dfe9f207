"""Headline benchmark: decode throughput (tokens/sec).

Mirrors the reference's example benchmark (batch=4 prompts, 32 new tokens,
bf16 — /root/reference/README.md:113: 83.90 token/s on an unspecified GPU)
on a Llama-3.2-1B-shaped model with random weights, run on whatever
accelerator jax.devices() provides (one TPU v5e chip under the driver).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_TOKENS_PER_S = 83.90  # reference README.md:113

B = 4
PREFILL_LEN = 64
DECODE_STEPS = 32


def main() -> None:
    from tinygpt_tpu.engine.kv_cache import create_kv_cache
    from tinygpt_tpu.hf.config import parse_model_config
    from tinygpt_tpu.models import causal_lm
    from tinygpt_tpu.ops.sampling import SamplerConfig, sample

    # Llama-3.2-1B architecture
    cfg = parse_model_config({
        "model_type": "llama",
        "vocab_size": 128256,
        "hidden_size": 2048,
        "num_hidden_layers": 16,
        "num_attention_heads": 32,
        "num_key_value_heads": 8,
        "intermediate_size": 8192,
        "max_position_embeddings": 4096,
        "rope_theta": 500000.0,
        "rms_norm_eps": 1e-5,
        "tie_word_embeddings": True,
    })
    dtype = jnp.bfloat16
    params = causal_lm.init_params(cfg, seed=0, dtype=dtype)
    params = jax.device_put(params)

    T = PREFILL_LEN + DECODE_STEPS + 8
    cache = create_kv_cache(cfg, B, T, dtype=dtype)
    ids = jnp.zeros((B, PREFILL_LEN), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(PREFILL_LEN), (B, PREFILL_LEN))
    valid = jnp.ones((B, PREFILL_LEN), jnp.bool_)
    sampler = SamplerConfig()  # greedy, like the reference example defaults

    prefill = jax.jit(
        lambda p, i, c, pos, v: causal_lm.forward(
            p, cfg, i, c, pos, v, last_only=True
        ),
        donate_argnums=(2,),
    )

    # The decode loop is ONE jit program: a lax.scan of whole decode steps
    # (the idiomatic XLA decode loop — no per-step host dispatch). Same
    # shape the engine's chunked decode uses.
    @functools.partial(jax.jit, donate_argnums=(2,))
    def decode_n(p, tok, c, pos0):
        def body(carry, _):
            tok, c, pos = carry
            logits, c = causal_lm.forward(
                p, cfg, tok[:, None], c, pos,
                jnp.ones((B, 1), jnp.bool_), last_only=True,
            )
            nxt = sample(logits[:, -1, :], sampler)
            return (nxt, c, pos + 1), nxt

        (tok, c, _), toks = jax.lax.scan(
            body, (tok, c, pos0), None, length=DECODE_STEPS
        )
        return toks, c

    # warmup/compile
    logits, cache = prefill(params, ids, cache, positions, valid)
    tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
    pos0 = jnp.full((B, 1), PREFILL_LEN, jnp.int32)
    toks, cache = decode_n(params, tok, cache, pos0)
    np.asarray(toks)  # full fence (see below)

    # timed. NOTE: the final np.asarray is the timing fence — it forces
    # device execution of the whole scanned loop plus a host fetch. On the
    # tunneled "axon" platform block_until_ready returns before execution
    # finishes, so fetching a value that depends on every step is the only
    # reliable fence (validated against the MXU roofline).
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        toks, cache = decode_n(params, tok, cache, pos0)
        np.asarray(toks)
        best = min(best, time.perf_counter() - t0)
    dt = best

    tokens = B * DECODE_STEPS
    tps = tokens / dt
    print(json.dumps({
        "metric": "decode_tokens_per_sec_llama1b_bf16_b4",
        "value": round(tps, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tps / BASELINE_TOKENS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
