"""TPU check: the extended fused int4 decode path (qkv-bias epilogue,
qk-norm interleave in decode_steps) must match the UNFUSED composition
on qwen2/qwen3-shaped models. The oracle is per-step forward() greedy —
it uses the plain stacked dequant kernels + XLA norm/bias/silu ops, so
any error in the fused epilogues shows up as token divergence. Run on
TPU (the fuse gate is TPU-only)."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def check(model_type: str) -> None:
    import jax
    import jax.numpy as jnp

    from tinygpt_tpu.engine.kv_cache import create_kv_cache
    from tinygpt_tpu.hf.config import parse_model_config
    from tinygpt_tpu.models import causal_lm
    from tinygpt_tpu.ops.quant import quantize_params

    base = {
        "model_type": model_type, "vocab_size": 2048, "hidden_size": 512,
        "num_hidden_layers": 2, "num_attention_heads": 8,
        "num_key_value_heads": 4, "intermediate_size": 1024,
        "max_position_embeddings": 2048, "rope_theta": 10000.0,
        "rms_norm_eps": 1e-6, "tie_word_embeddings": False,
    }
    if model_type == "qwen3":
        base["head_dim"] = 128
    if model_type == "mistral":
        # D=128 so the in-kernel RoPE epilogue engages (the flagship
        # family's geometry; qwen2's D=64 falls back to XLA rope)
        base["num_attention_heads"] = 4
        base["num_key_value_heads"] = 2
    cfg = parse_model_config(base)
    if model_type == "mistral":
        from tinygpt_tpu.ops.quant_kernels import rope_fuse_supported

        assert rope_fuse_supported(
            cfg.hidden_size, cfg.num_attention_heads * cfg.head_dim,
            cfg.num_kv_heads * cfg.head_dim, cfg.head_dim, 64, 4,
        ), "rope fusion must engage for this check to be meaningful"
    params = causal_lm.init_params(cfg, seed=7, dtype=jnp.bfloat16)
    qp = quantize_params(params, bits=4, group_size=64)
    assert (cfg.qkv_bias or cfg.attention_bias) == (model_type == "qwen2")
    assert cfg.qk_norm == (model_type == "qwen3")

    B, N, T = 4, 16, 256
    tok0 = jnp.arange(B, dtype=jnp.int32) + 3
    pos0_i = 32
    pos0 = jnp.full((B, 1), pos0_i, jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(0), N)
    greedy = lambda lg, k: jnp.argmax(lg, -1).astype(jnp.int32)

    # fused chunked decode (TPU fuse gate on), through the SHIPPED
    # attention routing — at D=128/T%128/N%16 shapes this engages the
    # flash_decode_frozen kernel (round 4), so the agreement below also
    # gates the kernel route against the XLA per-step oracle
    cache = create_kv_cache(cfg, B, T, dtype=jnp.bfloat16)
    fused, _ = jax.jit(
        lambda p, c: causal_lm.decode_steps(
            p, cfg, tok0, c, pos0, keys, greedy, attn_impl="pallas")
    )(qp, cache)
    fused = np.asarray(fused)  # [N, B]

    # oracle: per-step forward() (unfused stacked kernels + XLA glue),
    # TEACHER-FORCED on the fused path's token stream — both paths see
    # identical inputs at every step, so a mismatch is an isolated
    # near-tie numeric flip, not a diverged-context cascade (a random
    # tiny model's logits are near-uniform; free-running streams fork
    # permanently at the first flip — see CLAUDE.md compile variance).
    @jax.jit
    def step(p, tok, c, pos):
        logits, c = causal_lm.forward(
            p, cfg, tok[:, None], c, pos, jnp.ones((B, 1), bool),
            last_only=True, attn_impl="xla",
        )
        return jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32), c

    cache = create_kv_cache(cfg, B, T, dtype=jnp.bfloat16)
    inputs = np.concatenate([np.asarray(tok0)[None], fused[:-1]])  # [N, B]
    oracle = []
    for i in range(N):
        nxt, cache = step(qp, jnp.asarray(inputs[i]), cache, pos0 + i)
        oracle.append(np.asarray(nxt))
    oracle = np.stack(oracle)

    agree = (fused == oracle).mean()
    print(f"{model_type}: fused-vs-unfused teacher-forced agreement "
          f"{agree:.3f} ({fused.size} tokens)")
    # bf16 int4 logits on a tiny random model: allow rare near-tie flips
    assert agree >= 0.95, (model_type, fused.T, oracle.T)


def main():
    check("qwen2")
    check("qwen3")
    check("mistral")  # rope-fused qkv epilogue (round 4)
    print("OK")


if __name__ == "__main__":
    main()
