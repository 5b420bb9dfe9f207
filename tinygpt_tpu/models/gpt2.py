"""GPT-2 model.

Capability parity with the reference's bespoke GPT-2 stack
(/root/reference/src/model/ModelGPT2.h): Conv1D weights (already [in,out]
in HF checkpoints, no transpose needed — the "transposed-weight linear" at
ModelGPT2.h:23-44), learned positional embeddings indexed at the current
position (ModelGPT2.h:164-169), pre-norm LayerNorm blocks with biases,
fused QKV, GELU(new) 4x MLP, tied lm_head, weights under the
`transformer.` prefix (ModelGPT2.h:226).

Same functional/stacked-scan design as causal_lm.py.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tinygpt_tpu.engine.kv_cache import KVCache
from tinygpt_tpu.hf.config import ModelConfig
from tinygpt_tpu.ops.attention import attention_with_cache
from tinygpt_tpu.ops.norms import layer_norm
from tinygpt_tpu.ops.quant import matmul_any


def load_params(
    cfg: ModelConfig,
    weights: Dict[str, np.ndarray],
    dtype=jnp.float32,
) -> Dict:
    import ml_dtypes

    nd = np.dtype(ml_dtypes.bfloat16) if dtype == jnp.bfloat16 else np.dtype(
        jnp.dtype(dtype).name
    )

    def g(name: str) -> np.ndarray:
        for prefix in ("transformer.", ""):
            if prefix + name in weights:
                return np.asarray(weights[prefix + name])
        raise KeyError(f"missing weight {name!r}")

    def a(name: str) -> np.ndarray:
        return np.ascontiguousarray(g(name)).astype(nd)

    L = cfg.num_hidden_layers
    layers = []
    for i in range(L):
        p = f"h.{i}."
        layers.append({
            "ln1_w": a(p + "ln_1.weight"), "ln1_b": a(p + "ln_1.bias"),
            # Conv1D weights are [in, out] already
            "qkv_w": a(p + "attn.c_attn.weight"),
            "qkv_b": a(p + "attn.c_attn.bias"),
            "o_w": a(p + "attn.c_proj.weight"),
            "o_b": a(p + "attn.c_proj.bias"),
            "ln2_w": a(p + "ln_2.weight"), "ln2_b": a(p + "ln_2.bias"),
            "fc_w": a(p + "mlp.c_fc.weight"), "fc_b": a(p + "mlp.c_fc.bias"),
            "proj_w": a(p + "mlp.c_proj.weight"),
            "proj_b": a(p + "mlp.c_proj.bias"),
        })
    stacked = {k: jnp.asarray(np.stack([l[k] for l in layers]))
               for k in layers[0]}
    return {
        "wte": jnp.asarray(a("wte.weight")),
        "wpe": jnp.asarray(a("wpe.weight")),
        "layers": stacked,
        "lnf_w": jnp.asarray(a("ln_f.weight")),
        "lnf_b": jnp.asarray(a("ln_f.bias")),
    }


def init_params(cfg: ModelConfig, seed: int = 0, dtype=jnp.float32) -> Dict:
    rng = np.random.default_rng(seed)
    H, V, P, I = (cfg.hidden_size, cfg.vocab_size,
                  cfg.max_position_embeddings, cfg.intermediate_size)

    def w(*shape, scale=0.02):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    weights = {
        "wte.weight": w(V, H), "wpe.weight": w(P, H),
        "ln_f.weight": np.ones(H, np.float32),
        "ln_f.bias": np.zeros(H, np.float32),
    }
    for i in range(cfg.num_hidden_layers):
        p = f"h.{i}."
        weights.update({
            p + "ln_1.weight": np.ones(H, np.float32),
            p + "ln_1.bias": np.zeros(H, np.float32),
            p + "attn.c_attn.weight": w(H, 3 * H),
            p + "attn.c_attn.bias": w(3 * H),
            p + "attn.c_proj.weight": w(H, H),
            p + "attn.c_proj.bias": w(H),
            p + "ln_2.weight": np.ones(H, np.float32),
            p + "ln_2.bias": np.zeros(H, np.float32),
            p + "mlp.c_fc.weight": w(H, I),
            p + "mlp.c_fc.bias": w(I),
            p + "mlp.c_proj.weight": w(I, H),
            p + "mlp.c_proj.bias": w(H),
        })
    return load_params(cfg, weights, dtype)


def forward(
    params: Dict,
    cfg: ModelConfig,
    input_ids: jnp.ndarray,    # [B, S]
    cache: KVCache,
    positions: jnp.ndarray,    # [B, S]
    token_valid: jnp.ndarray,  # [B, S]
    last_only: bool = False,
    attn_impl: str = "xla",
    last_pos=None,  # [B] int32 — index of the last REAL token per row
) -> Tuple[jnp.ndarray, KVCache]:
    B, S = input_ids.shape
    N = cfg.num_attention_heads
    D = cfg.head_dim
    H = cfg.hidden_size
    slot = cache.length

    x = params["wte"][input_ids] + params["wpe"][positions]
    kv_pos = jax.lax.dynamic_update_slice(
        cache.kv_pos, positions.astype(jnp.int32), (0, slot)
    )
    valid = jax.lax.dynamic_update_slice(cache.valid, token_valid, (0, slot))

    def layer_fn(x, scanned):
        lp, k_cache, v_cache = scanned
        h = layer_norm(x, lp["ln1_w"], lp["ln1_b"], cfg.layer_norm_epsilon)
        qkv = matmul_any(h, lp["qkv_w"]) + lp["qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, S, N, D)
        k = k.reshape(B, S, N, D)
        v = v.reshape(B, S, N, D)
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k.transpose(0, 2, 1, 3).astype(k_cache.dtype),
            (0, 0, slot, 0),
        )
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v.transpose(0, 2, 1, 3).astype(v_cache.dtype),
            (0, 0, slot, 0),
        )
        attn = attention_with_cache(
            q, k_cache, v_cache,
            q_pos=positions, kv_pos=kv_pos, kv_valid=valid, slot=slot,
            kernel=attn_impl,
        )
        x = x + matmul_any(attn.reshape(B, S, H), lp["o_w"]) + lp["o_b"]
        h = layer_norm(x, lp["ln2_w"], lp["ln2_b"], cfg.layer_norm_epsilon)
        h = jax.nn.gelu(matmul_any(h, lp["fc_w"]) + lp["fc_b"], approximate=True)
        x = x + matmul_any(h, lp["proj_w"]) + lp["proj_b"]
        return x, (k_cache, v_cache)

    x, (new_k, new_v) = jax.lax.scan(
        layer_fn, x, (params["layers"], cache.k, cache.v)
    )
    x = layer_norm(x, params["lnf_w"], params["lnf_b"], cfg.layer_norm_epsilon)
    if last_only:
        if last_pos is not None:
            x = x[jnp.arange(B), last_pos][:, None, :]
        else:
            x = x[:, -1:, :]
    logits = x @ params["wte"].T  # tied lm_head
    new_cache = KVCache(k=new_k, v=new_v, kv_pos=kv_pos, valid=valid,
                        length=slot + S)
    return logits.astype(jnp.float32), new_cache


def forward_paged(
    params: Dict,
    cfg: ModelConfig,
    input_ids: jnp.ndarray,  # [B]
    state,                   # PagedKVState
    attn_impl: str = "xla",
):
    """One paged decode step (continuous batching) — GPT-2 variant of
    causal_lm.forward_paged: learned positional embeddings, LayerNorm,
    GELU MLP, no RoPE/GQA."""
    from tinygpt_tpu.ops.paged_attention import paged_decode

    B = input_ids.shape[0]
    N, D, H = cfg.num_attention_heads, cfg.head_dim, cfg.hidden_size
    bs = state.block_size

    lengths, starts, tables = state.lengths, state.starts, state.block_tables
    positions = (lengths - starts)[:, None]
    rows = jnp.arange(B)
    blk = tables[rows, lengths // bs]
    blk = jnp.where(state.active, blk, 0)
    off = lengths % bs
    new_lengths = jnp.where(state.active, lengths + 1, lengths)

    x = params["wte"][input_ids[:, None]] + params["wpe"][positions]

    def layer_fn(x, scanned):
        lp, k_pool, v_pool = scanned
        h = layer_norm(x, lp["ln1_w"], lp["ln1_b"], cfg.layer_norm_epsilon)
        qkv = matmul_any(h, lp["qkv_w"]) + lp["qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, 1, N, D)
        k = k.reshape(B, 1, N, D)
        v = v.reshape(B, 1, N, D)
        k_pool = k_pool.at[blk, :, off, :].set(
            k[:, 0].astype(k_pool.dtype), mode="drop")
        v_pool = v_pool.at[blk, :, off, :].set(
            v[:, 0].astype(v_pool.dtype), mode="drop")
        attn = paged_decode(
            q[:, 0], k_pool, v_pool, tables, new_lengths, starts,
            scale=D ** -0.5, kernel=attn_impl,
        )
        x = x + matmul_any(attn.reshape(B, 1, H), lp["o_w"]) + lp["o_b"]
        h = layer_norm(x, lp["ln2_w"], lp["ln2_b"], cfg.layer_norm_epsilon)
        h = jax.nn.gelu(matmul_any(h, lp["fc_w"]) + lp["fc_b"],
                        approximate=True)
        x = x + matmul_any(h, lp["proj_w"]) + lp["proj_b"]
        return x, (k_pool, v_pool)

    x, (new_k, new_v) = jax.lax.scan(
        layer_fn, x, (params["layers"], state.k_pool, state.v_pool)
    )
    x = layer_norm(x, params["lnf_w"], params["lnf_b"],
                   cfg.layer_norm_epsilon)
    logits = x[:, 0] @ params["wte"].T
    new_state = state._replace(k_pool=new_k, v_pool=new_v,
                               lengths=new_lengths)
    return logits.astype(jnp.float32), new_state
