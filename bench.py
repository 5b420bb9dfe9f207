"""Headline benchmark: decode throughput (tokens/sec).

Mirrors the reference's example benchmark (batch=4 prompts, 32 new tokens,
bf16 — /root/reference/README.md:113: 83.90 token/s on an unspecified GPU)
on a Llama-3.2-1B-shaped model with random weights, run on whatever
accelerator jax.devices() provides (one TPU v5e chip under the driver).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

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

    @jax.jit
    def decode_step(p, tok, c, pos):
        logits, c = causal_lm.forward(
            p, cfg, tok[:, None], c, pos,
            jnp.ones((B, 1), jnp.bool_), last_only=True,
        )
        return sample(logits[:, -1, :], sampler), c

    # warmup/compile
    logits, cache = prefill(params, ids, cache, positions, valid)
    tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
    pos = jnp.full((B, 1), PREFILL_LEN, jnp.int32)
    tok, cache = decode_step(params, tok, cache, pos)
    jax.block_until_ready(tok)

    # timed decode loop
    t0 = time.perf_counter()
    for step in range(1, DECODE_STEPS):
        pos = jnp.full((B, 1), PREFILL_LEN + step, jnp.int32)
        tok, cache = decode_step(params, tok, cache, pos)
    jax.block_until_ready(tok)
    dt = time.perf_counter() - t0

    tokens = B * (DECODE_STEPS - 1)
    tps = tokens / dt
    print(json.dumps({
        "metric": "decode_tokens_per_sec_llama1b_bf16_b4",
        "value": round(tps, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tps / BASELINE_TOKENS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
