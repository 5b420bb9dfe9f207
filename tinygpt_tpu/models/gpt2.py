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
    moe_impl: str = "auto",  # module-protocol compat; gpt2 has no MoE
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


def decode_steps(
    params: Dict,
    cfg: ModelConfig,
    tok0: jnp.ndarray,   # [B] first input token of the chunk
    cache: KVCache,
    pos0: jnp.ndarray,   # [B, 1] logical position of tok0
    keys: jnp.ndarray,   # [n_steps, ...] per-step sampler keys
    sample_fn,           # (logits [B, V], key) -> tok [B] int32
    attn_impl: str = "xla",
) -> Tuple[jnp.ndarray, KVCache]:
    """n_steps single-token decode steps as ONE scanned program with the
    KV cache FROZEN — the GPT-2 variant of causal_lm.decode_steps
    (learned wpe instead of RoPE, LayerNorm biases, GELU MLP, Nk == Nq).
    The reference decodes GPT-2 through the same uniform engine loop as
    every family (/root/reference/src/engine/GPTEngine.cpp:154-174)."""
    from tinygpt_tpu.ops.attention import sdpa_decode_frozen

    B = tok0.shape[0]
    n_steps = keys.shape[0]
    L = cfg.num_hidden_layers
    N, D, H = cfg.num_attention_heads, cfg.head_dim, cfg.hidden_size
    slot0 = cache.length

    infl_k0 = jnp.zeros((L, B, N, n_steps, D), cache.k.dtype)
    infl_v0 = jnp.zeros((L, B, N, n_steps, D), cache.v.dtype)
    # one whole-chunk K transpose for the scores dot (see causal_lm)
    kT = jnp.swapaxes(cache.k, 3, 4)

    def one_step(tok, positions, infl_k, infl_v, step):
        x = params["wte"][tok[:, None]] + params["wpe"][positions]

        def layer_fn(x, scanned):
            lp, ik, iv = scanned
            h = layer_norm(x, lp["ln1_w"], lp["ln1_b"],
                           cfg.layer_norm_epsilon)
            qkv = matmul_any(h, lp["qkv_w"]) + lp["qkv_b"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(B, 1, N, D)
            k = k.reshape(B, 1, N, D)
            v = v.reshape(B, 1, N, D)
            ik = jax.lax.dynamic_update_slice(
                ik, k.transpose(0, 2, 1, 3).astype(ik.dtype),
                (0, 0, step, 0))
            iv = jax.lax.dynamic_update_slice(
                iv, v.transpose(0, 2, 1, 3).astype(iv.dtype),
                (0, 0, step, 0))
            lix = lp["_l"]
            kfz = jax.lax.dynamic_index_in_dim(kT, lix, 0, keepdims=False)
            vfz = jax.lax.dynamic_index_in_dim(cache.v, lix, 0,
                                               keepdims=False)
            attn = sdpa_decode_frozen(
                q, kfz, vfz, cache.kv_pos, cache.valid, ik, iv, step,
                positions, k_transposed=True)
            x = x + matmul_any(attn.reshape(B, 1, H), lp["o_w"]) \
                + lp["o_b"]
            h = layer_norm(x, lp["ln2_w"], lp["ln2_b"],
                           cfg.layer_norm_epsilon)
            h = jax.nn.gelu(matmul_any(h, lp["fc_w"]) + lp["fc_b"],
                            approximate=True)
            x = x + matmul_any(h, lp["proj_w"]) + lp["proj_b"]
            return x, (ik, iv)

        lyrs = dict(params["layers"])
        lyrs["_l"] = jnp.arange(L, dtype=jnp.int32)
        x, (infl_k, infl_v) = jax.lax.scan(
            layer_fn, x, (lyrs, infl_k, infl_v))
        x = layer_norm(x, params["lnf_w"], params["lnf_b"],
                       cfg.layer_norm_epsilon)
        logits = x @ params["wte"].T
        return logits.astype(jnp.float32), infl_k, infl_v

    def body(carry, key_step):
        tok, pos, infl_k, infl_v, step = carry
        logits, infl_k, infl_v = one_step(tok, pos, infl_k, infl_v, step)
        nxt = sample_fn(logits[:, -1, :], key_step).astype(jnp.int32)
        return (nxt, pos + 1, infl_k, infl_v, step + 1), nxt

    (tok, pos, infl_k, infl_v, _), toks = jax.lax.scan(
        body, (tok0.astype(jnp.int32), pos0, infl_k0, infl_v0,
               jnp.asarray(0, jnp.int32)), keys)

    k = jax.lax.dynamic_update_slice(
        cache.k, infl_k.astype(cache.k.dtype), (0, 0, 0, slot0, 0))
    v = jax.lax.dynamic_update_slice(
        cache.v, infl_v.astype(cache.v.dtype), (0, 0, 0, slot0, 0))
    win_pos = pos0 + jnp.arange(n_steps, dtype=jnp.int32)[None, :]
    kv_pos = jax.lax.dynamic_update_slice(cache.kv_pos, win_pos, (0, slot0))
    valid = jax.lax.dynamic_update_slice(
        cache.valid, jnp.ones((B, n_steps), jnp.bool_), (0, slot0))
    new_cache = KVCache(k=k, v=v, kv_pos=kv_pos, valid=valid,
                        length=slot0 + n_steps)
    return toks, new_cache


def decode_paged_steps(
    params: Dict,
    cfg: ModelConfig,
    tok0: jnp.ndarray,   # [B]
    state,               # PagedKVState
    keys: jnp.ndarray,   # [n_steps, ...]
    sample_fn,
    attn_impl: str = "xla",
):
    """n_steps paged decode steps with the block POOLS frozen — the GPT-2
    variant of causal_lm.decode_paged_steps (same frozen-quantum serving
    architecture as every other family; learned wpe, no RoPE/GQA)."""
    from tinygpt_tpu.ops.paged_attention import paged_decode_frozen

    B = tok0.shape[0]
    n_steps = keys.shape[0]
    L = cfg.num_hidden_layers
    N, D, H = cfg.num_attention_heads, cfg.head_dim, cfg.hidden_size
    bs = state.block_size
    lengths0, starts = state.lengths, state.starts
    tables, active = state.block_tables, state.active
    act_i = active.astype(jnp.int32)

    from tinygpt_tpu.models.causal_lm import vary_like

    infl_k0 = vary_like(jnp.zeros((L, B, N, n_steps, D),
                                  state.k_pool.dtype), state.k_pool)
    infl_v0 = vary_like(jnp.zeros((L, B, N, n_steps, D),
                                  state.v_pool.dtype), state.k_pool)

    def one_step(tok, infl_k, infl_v, step, kp, vp):
        lengths_t = lengths0 + step * act_i
        positions = (lengths_t - starts)[:, None]
        x = params["wte"][tok[:, None]] + params["wpe"][positions]

        def layer_fn(x, scanned):
            lp, ik, iv = scanned
            h = layer_norm(x, lp["ln1_w"], lp["ln1_b"],
                           cfg.layer_norm_epsilon)
            qkv = matmul_any(h, lp["qkv_w"]) + lp["qkv_b"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(B, 1, N, D)
            k = k.reshape(B, 1, N, D)
            v = v.reshape(B, 1, N, D)
            ik = jax.lax.dynamic_update_slice(
                ik, k.transpose(0, 2, 1, 3).astype(ik.dtype),
                (0, 0, step, 0))
            iv = jax.lax.dynamic_update_slice(
                iv, v.transpose(0, 2, 1, 3).astype(iv.dtype),
                (0, 0, step, 0))
            attn = paged_decode_frozen(
                q[:, 0], kp, vp, tables, lengths0, starts, ik, iv,
                lp["_l"], step, scale=D ** -0.5, kernel=attn_impl)
            x = x + matmul_any(attn.reshape(B, 1, H), lp["o_w"]) \
                + lp["o_b"]
            h = layer_norm(x, lp["ln2_w"], lp["ln2_b"],
                           cfg.layer_norm_epsilon)
            h = jax.nn.gelu(matmul_any(h, lp["fc_w"]) + lp["fc_b"],
                            approximate=True)
            x = x + matmul_any(h, lp["proj_w"]) + lp["proj_b"]
            return x, (ik, iv)

        lyrs = dict(params["layers"])
        lyrs["_l"] = jnp.arange(L, dtype=jnp.int32)
        x, (infl_k, infl_v) = jax.lax.scan(
            layer_fn, x, (lyrs, infl_k, infl_v))
        x = layer_norm(x, params["lnf_w"], params["lnf_b"],
                       cfg.layer_norm_epsilon)
        logits = x[:, 0] @ params["wte"].T
        return logits.astype(jnp.float32), infl_k, infl_v

    def body(carry, key_step):
        tok, infl_k, infl_v, kp, vp, step = carry
        logits, infl_k, infl_v = one_step(tok, infl_k, infl_v, step,
                                          kp, vp)
        nxt = sample_fn(logits, key_step).astype(jnp.int32)
        return (nxt, infl_k, infl_v, kp, vp, step + 1), nxt

    (tok, infl_k, infl_v, kp_out, vp_out, _), toks = jax.lax.scan(
        body, (tok0.astype(jnp.int32), infl_k0, infl_v0,
               state.k_pool, state.v_pool, jnp.asarray(0, jnp.int32)),
        keys)

    steps = jnp.arange(n_steps, dtype=jnp.int32)
    slot_t = lengths0[None, :] + steps[:, None] * act_i[None, :]
    rows = jnp.arange(B)
    blk = tables[rows[None, :], slot_t // bs]
    blk = jnp.where(active[None, :], blk, 0)
    off = slot_t % bs
    blkf, offf = blk.reshape(-1), off.reshape(-1)
    vals_k = infl_k.transpose(3, 1, 0, 2, 4).reshape(
        n_steps * B, L, N, D).astype(state.k_pool.dtype)
    vals_v = infl_v.transpose(3, 1, 0, 2, 4).reshape(
        n_steps * B, L, N, D).astype(state.v_pool.dtype)
    k_pool = kp_out.at[:, blkf, :, offf, :].set(vals_k, mode="drop")
    v_pool = vp_out.at[:, blkf, :, offf, :].set(vals_v, mode="drop")
    new_state = state._replace(
        k_pool=k_pool, v_pool=v_pool,
        lengths=lengths0 + n_steps * act_i,
    )
    return toks, new_state


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
