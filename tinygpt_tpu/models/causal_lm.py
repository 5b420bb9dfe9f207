"""Generic CausalLM for the HF-Llama family (llama / qwen2 / qwen3 / mistral).

Capability parity with the reference's CausalLM template + family deltas
(/root/reference/src/model/GPTModel.h:18-65, ModelLlama.h, ModelQwen2.h,
ModelQwen3.h, ModelMistral.h): embed → N pre-norm decoder layers (fused
QKV matmul, RoPE, GQA attention over the KV cache, fused gate-up SwiGLU)
→ RMSNorm → lm_head, with tied embeddings, qkv-bias (qwen2), per-head
q/k RMSNorm (qwen3), explicit head_dim (qwen3), Llama-3 rope scaling, and
sliding-window masking (mistral/qwen — which the reference parses but
never applies, ModelMistral.h:23-40).

TPU-first design decisions:
  * functional: params are a pytree, forward is pure, state (KV cache)
    is an explicit carry — jit once, use for every step;
  * layers are STACKED along a leading axis and executed with lax.scan —
    O(1) compile time in depth instead of unrolled HLO;
  * weights transposed to [in, out] at load so the hot path is plain
    x @ W (MXU-friendly, no per-step transposes), with q/k/v and
    gate/up pre-fused into single matmuls (same fusion the reference
    does via MergedLinear, src/layer/Linear.h);
  * lm_head can run on the last position only (`last_only`), skipping
    the full-vocab matmul for all prefill positions — the reference
    computes [B,S,V] and throws away all but the last row
    (GPTModel.h:57, GPTEngine.cpp:97).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tinygpt_tpu.engine.kv_cache import KVCache
from tinygpt_tpu.hf.config import ModelConfig
from tinygpt_tpu.ops.attention import attention_with_cache
from tinygpt_tpu.ops.norms import rms_norm
from tinygpt_tpu.ops.quant import matmul_any
from tinygpt_tpu.ops.rope import apply_rope, compute_rope_freqs


def load_params(
    cfg: ModelConfig,
    weights: Dict[str, np.ndarray],
    dtype=jnp.bfloat16,
) -> Dict:
    """Map HF safetensors names into the stacked-layer param pytree.

    HF name scheme (reference registers the same names,
    GPTModel.h:43-48, DecoderLayer.h:46-53): model.embed_tokens,
    model.layers.{i}.self_attn.{q,k,v,o}_proj, .mlp.{gate,up,down}_proj,
    .input_layernorm, .post_attention_layernorm, model.norm, lm_head.

    The repack (transpose to [in, out], q/k/v and gate/up fusion, dtype
    cast, layer stacking) runs ON DEVICE: raw mmap views are uploaded
    byte-for-byte and one jit-compiled writer (donated buffers, traced
    layer index => single compile) packs each layer in place. Host-side
    numpy would convert GB-scale weights at single-core speed — minutes
    for 1B, the better part of an hour for 7B.
    """
    import functools

    L = cfg.num_hidden_layers
    D = cfg.head_dim
    Nq, Nk = cfg.num_attention_heads, cfg.num_kv_heads
    H, I = cfg.hidden_size, cfg.intermediate_size
    dt = jnp.dtype(dtype)

    def g(name: str) -> np.ndarray:
        if name not in weights:
            raise KeyError(f"missing weight {name!r}")
        return weights[name]

    has_bias = bool(cfg.qkv_bias or cfg.attention_bias)

    shapes = {
        "input_ln": (H,),
        "qkv_w": (H, (Nq + 2 * Nk) * D),
        "o_w": (Nq * D, H),
        "post_ln": (H,),
        "gate_up_w": (H, 2 * I),
        "down_w": (I, H),
    }
    if has_bias:
        shapes["qkv_b"] = ((Nq + 2 * Nk) * D,)
    if cfg.qk_norm:
        shapes["q_norm"] = (D,)
        shapes["k_norm"] = (D,)

    bufs = {k: jnp.zeros((L, *s), dt) for k, s in shapes.items()}

    @functools.partial(jax.jit, donate_argnums=(0,))
    def write_layer(bufs, i, raw):
        upd = {
            "input_ln": raw["input_ln"].astype(dt),
            "qkv_w": jnp.concatenate(
                [raw["q"].T, raw["k"].T, raw["v"].T], axis=1
            ).astype(dt),
            "o_w": raw["o"].T.astype(dt),
            "post_ln": raw["post_ln"].astype(dt),
            "gate_up_w": jnp.concatenate(
                [raw["gate"].T, raw["up"].T], axis=1
            ).astype(dt),
            "down_w": raw["down"].T.astype(dt),
        }
        if "qb" in raw:
            upd["qkv_b"] = jnp.concatenate(
                [raw["qb"], raw["kb"], raw["vb"]]
            ).astype(dt)
        if "q_norm" in raw:
            upd["q_norm"] = raw["q_norm"].astype(dt)
            upd["k_norm"] = raw["k_norm"].astype(dt)
        return {k: bufs[k].at[i].set(upd[k]) for k in bufs}

    for i in range(L):
        p = f"model.layers.{i}."
        raw = {
            "input_ln": g(p + "input_layernorm.weight"),
            "q": g(p + "self_attn.q_proj.weight"),
            "k": g(p + "self_attn.k_proj.weight"),
            "v": g(p + "self_attn.v_proj.weight"),
            "o": g(p + "self_attn.o_proj.weight"),
            "post_ln": g(p + "post_attention_layernorm.weight"),
            "gate": g(p + "mlp.gate_proj.weight"),
            "up": g(p + "mlp.up_proj.weight"),
            "down": g(p + "mlp.down_proj.weight"),
        }
        if has_bias:
            raw["qb"] = g(p + "self_attn.q_proj.bias")
            raw["kb"] = g(p + "self_attn.k_proj.bias")
            raw["vb"] = g(p + "self_attn.v_proj.bias")
        if cfg.qk_norm:
            raw["q_norm"] = g(p + "self_attn.q_norm.weight")
            raw["k_norm"] = g(p + "self_attn.k_norm.weight")
        raw = {k: jnp.asarray(v) for k, v in raw.items()}  # upload raw bytes
        bufs = write_layer(bufs, jnp.asarray(i, jnp.int32), raw)

    embed = jnp.asarray(g("model.embed_tokens.weight")).astype(dt)
    if cfg.tie_word_embeddings or "lm_head.weight" not in weights:
        lm_head = None  # reuse embed
    else:
        lm_head = jnp.asarray(g("lm_head.weight")).T.astype(dt)

    cos, sin = compute_rope_freqs(
        D, cfg.max_position_embeddings, cfg.rope_theta, cfg.rope_scaling
    )
    return {
        "embed": embed,
        "layers": bufs,
        "final_ln": jnp.asarray(g("model.norm.weight")).astype(dt),
        "lm_head": lm_head,
        "rope_cos": jnp.asarray(cos),
        "rope_sin": jnp.asarray(sin),
    }


def init_params(cfg: ModelConfig, seed: int = 0, dtype=jnp.bfloat16) -> Dict:
    """Random params with the stacked-layer layout (for tests / benches).

    Built directly on device in the FINAL (pre-fused, [in, out]) layout —
    host-side numpy generation + bf16 conversion of GB-scale weights costs
    minutes on a small host, and tests/benches only need plausible
    magnitudes, not HF-layout provenance (load_params covers that path)."""
    L = cfg.num_hidden_layers
    H, D = cfg.hidden_size, cfg.head_dim
    Nq, Nk = cfg.num_attention_heads, cfg.num_kv_heads
    I = cfg.intermediate_size
    V = cfg.vocab_size
    key = jax.random.PRNGKey(seed)

    def w(key, *shape, scale=0.02):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(
            dtype
        )

    ks = list(jax.random.split(key, 8))
    layers = {
        "input_ln": jnp.ones((L, H), dtype),
        "qkv_w": w(ks[0], L, H, (Nq + 2 * Nk) * D),
        "o_w": w(ks[1], L, Nq * D, H),
        "post_ln": jnp.ones((L, H), dtype),
        "gate_up_w": w(ks[2], L, H, 2 * I),
        "down_w": w(ks[3], L, I, H),
    }
    if cfg.qkv_bias or cfg.attention_bias:
        layers["qkv_b"] = w(ks[4], L, (Nq + 2 * Nk) * D)
    if cfg.qk_norm:
        layers["q_norm"] = jnp.ones((L, D), dtype)
        layers["k_norm"] = jnp.ones((L, D), dtype)

    cos, sin = compute_rope_freqs(
        D, cfg.max_position_embeddings, cfg.rope_theta, cfg.rope_scaling
    )
    return {
        "embed": w(ks[5], V, H),
        "layers": layers,
        "final_ln": jnp.ones((H,), dtype),
        "lm_head": None if cfg.tie_word_embeddings else w(ks[6], H, V),
        "rope_cos": jnp.asarray(cos),
        "rope_sin": jnp.asarray(sin),
    }


def decoder_layer_step(
    lp: Dict,
    x: jnp.ndarray,          # [B, S, H]
    k_cache: jnp.ndarray,    # [B, Nk, T, D]
    v_cache: jnp.ndarray,    # [B, Nk, T, D]
    *,
    cfg: ModelConfig,
    positions: jnp.ndarray,  # [B, S]
    kv_pos: jnp.ndarray,     # [B, T]
    valid: jnp.ndarray,      # [B, T]
    slot,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    attn_impl: str,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One pre-norm decoder layer (attention + SwiGLU MLP) over the dense
    cache. Shared by the single-program forward below and the pipeline-
    parallel stage runner (parallel/pipeline.py)."""
    B, S = x.shape[0], x.shape[1]
    D = cfg.head_dim
    Nq, Nk = cfg.num_attention_heads, cfg.num_kv_heads
    q_dim = Nq * D

    h = rms_norm(x, lp["input_ln"], cfg.rms_norm_eps)
    qkv = matmul_any(h, lp["qkv_w"])
    if "qkv_b" in lp:
        qkv = qkv + lp["qkv_b"]
    q = qkv[..., :q_dim].reshape(B, S, Nq, D)
    k = qkv[..., q_dim : q_dim + Nk * D].reshape(B, S, Nk, D)
    v = qkv[..., q_dim + Nk * D :].reshape(B, S, Nk, D)
    if cfg.qk_norm:
        q = rms_norm(q, lp["q_norm"], cfg.rms_norm_eps)
        k = rms_norm(k, lp["k_norm"], cfg.rms_norm_eps)
    q, k = apply_rope(q, k, cos, sin, positions)
    # cache layout [B, Nk, T, D]
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
        sliding_window=cfg.sliding_window, kernel=attn_impl,
    )
    x = x + matmul_any(attn.reshape(B, S, q_dim), lp["o_w"])
    h = rms_norm(x, lp["post_ln"], cfg.rms_norm_eps)
    gate_up = matmul_any(h, lp["gate_up_w"])
    gate, up = jnp.split(gate_up, 2, axis=-1)
    x = x + matmul_any(
        jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up,
        lp["down_w"],
    )
    return x, k_cache, v_cache


def forward(
    params: Dict,
    cfg: ModelConfig,
    input_ids: jnp.ndarray,    # [B, S]
    cache: KVCache,
    positions: jnp.ndarray,    # [B, S] logical positions (RoPE/causality)
    token_valid: jnp.ndarray,  # [B, S] bool — real token vs pad
    last_only: bool = False,
    attn_impl: str = "xla",    # "xla" | "pallas" (static under jit)
    last_pos=None,             # [B] int32 — row of the last REAL token; for
                               # trailing-padded prompts (default: S-1)
) -> Tuple[jnp.ndarray, KVCache]:
    """One forward step (prefill S>1 or decode S=1).

    Returns (logits [B, S, V] or [B, 1, V] if last_only, updated cache).
    """
    B, S = input_ids.shape

    x = params["embed"][input_ids]  # [B, S, H]
    cos, sin = params["rope_cos"], params["rope_sin"]
    slot = cache.length  # scalar: write offset for this step

    # update slot bookkeeping (shared by all layers)
    kv_pos = jax.lax.dynamic_update_slice(
        cache.kv_pos, positions.astype(jnp.int32), (0, slot)
    )
    valid = jax.lax.dynamic_update_slice(cache.valid, token_valid, (0, slot))

    def layer_fn(x, scanned):
        lp, k_cache, v_cache = scanned
        x, k_cache, v_cache = decoder_layer_step(
            lp, x, k_cache, v_cache,
            cfg=cfg, positions=positions, kv_pos=kv_pos, valid=valid,
            slot=slot, cos=cos, sin=sin, attn_impl=attn_impl,
        )
        return x, (k_cache, v_cache)

    x, (new_k, new_v) = jax.lax.scan(
        layer_fn, x, (params["layers"], cache.k, cache.v)
    )
    x = rms_norm(x, params["final_ln"], cfg.rms_norm_eps)
    if last_only:
        if last_pos is not None:
            x = x[jnp.arange(B), last_pos][:, None, :]
        else:
            x = x[:, -1:, :]
    head = params["lm_head"]
    if head is None:
        logits = x @ params["embed"].T
    else:
        logits = matmul_any(x, head)
    new_cache = KVCache(
        k=new_k, v=new_v, kv_pos=kv_pos, valid=valid,
        length=slot + S,
    )
    return logits.astype(jnp.float32), new_cache


def forward_paged(
    params: Dict,
    cfg: ModelConfig,
    input_ids: jnp.ndarray,  # [B] — one decode token per row
    state,                   # PagedKVState
    attn_impl: str = "xla",
):
    """One decode step over the paged block pool (continuous batching).

    Each row's new token goes to slot `lengths[b]` of its block table; its
    logical RoPE position is lengths[b] - starts[b]. Inactive rows write
    into the reserved null block and their outputs are discarded by the
    scheduler. Returns (logits [B, V], new PagedKVState with lengths
    advanced for active rows).
    """
    from tinygpt_tpu.ops.paged_attention import paged_decode

    B = input_ids.shape[0]
    D = cfg.head_dim
    Nq, Nk = cfg.num_attention_heads, cfg.num_kv_heads
    q_dim = Nq * D
    bs = state.block_size

    lengths, starts, tables = state.lengths, state.starts, state.block_tables
    positions = (lengths - starts)[:, None]  # [B, 1] logical
    rows = jnp.arange(B)
    blk = tables[rows, lengths // bs]  # [B] target block per row
    blk = jnp.where(state.active, blk, 0)  # inactive rows → null block
    off = lengths % bs
    new_lengths = jnp.where(state.active, lengths + 1, lengths)

    x = params["embed"][input_ids[:, None]]  # [B, 1, H]
    cos, sin = params["rope_cos"], params["rope_sin"]

    def layer_fn(x, scanned):
        lp, k_pool, v_pool = scanned
        h = rms_norm(x, lp["input_ln"], cfg.rms_norm_eps)
        qkv = matmul_any(h, lp["qkv_w"])
        if "qkv_b" in lp:
            qkv = qkv + lp["qkv_b"]
        q = qkv[..., :q_dim].reshape(B, 1, Nq, D)
        k = qkv[..., q_dim : q_dim + Nk * D].reshape(B, 1, Nk, D)
        v = qkv[..., q_dim + Nk * D :].reshape(B, 1, Nk, D)
        if cfg.qk_norm:
            q = rms_norm(q, lp["q_norm"], cfg.rms_norm_eps)
            k = rms_norm(k, lp["k_norm"], cfg.rms_norm_eps)
        q, k = apply_rope(q, k, cos, sin, positions)
        # scatter the new K/V into each row's current block/offset
        k_pool = k_pool.at[blk, :, off, :].set(
            k[:, 0].astype(k_pool.dtype), mode="drop"
        )
        v_pool = v_pool.at[blk, :, off, :].set(
            v[:, 0].astype(v_pool.dtype), mode="drop"
        )
        attn = paged_decode(
            q[:, 0], k_pool, v_pool, tables, new_lengths, starts,
            scale=D ** -0.5, sliding_window=cfg.sliding_window,
            kernel=attn_impl,
        )
        x = x + matmul_any(attn.reshape(B, 1, q_dim), lp["o_w"])
        h = rms_norm(x, lp["post_ln"], cfg.rms_norm_eps)
        gate_up = matmul_any(h, lp["gate_up_w"])
        gate, up = jnp.split(gate_up, 2, axis=-1)
        x = x + matmul_any(
            jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up,
            lp["down_w"],
        )
        return x, (k_pool, v_pool)

    x, (new_k, new_v) = jax.lax.scan(
        layer_fn, x, (params["layers"], state.k_pool, state.v_pool)
    )
    x = rms_norm(x, params["final_ln"], cfg.rms_norm_eps)
    head = params["lm_head"]
    if head is None:
        logits = x[:, 0] @ params["embed"].T
    else:
        logits = matmul_any(x[:, 0], head)
    new_state = state._replace(k_pool=new_k, v_pool=new_v,
                               lengths=new_lengths)
    return logits.astype(jnp.float32), new_state
