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
from tinygpt_tpu.ops.attention import (
    attention_with_cache,
    sdpa_decode_frozen,
)
from tinygpt_tpu.ops.norms import rms_norm
from tinygpt_tpu.ops.quant import (
    QuantizedTensor,
    matmul_any,
    matmul_dequant_stacked,
)
from tinygpt_tpu.ops.rope import (apply_rope, apply_rope_gathered,
                                  compute_rope_freqs, gather_rope)


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

    E = cfg.num_local_experts
    shapes = {
        "input_ln": (H,),
        "qkv_w": (H, (Nq + 2 * Nk) * D),
        "o_w": (Nq * D, H),
        "post_ln": (H,),
    }
    if E:  # mixtral MoE MLP (router + stacked experts)
        shapes["router_w"] = (H, E)
        shapes["moe_gate_up_w"] = (E, H, 2 * I)
        shapes["moe_down_w"] = (E, I, H)
    else:
        shapes["gate_up_w"] = (H, 2 * I)
        shapes["down_w"] = (I, H)
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
        }
        if "router" in raw:
            upd["router_w"] = raw["router"].T.astype(dt)
            upd["moe_gate_up_w"] = jnp.stack([
                jnp.concatenate(
                    [raw[f"w1_{e}"].T, raw[f"w3_{e}"].T], axis=1
                ) for e in range(E)
            ]).astype(dt)
            upd["moe_down_w"] = jnp.stack(
                [raw[f"w2_{e}"].T for e in range(E)]
            ).astype(dt)
        else:
            upd["gate_up_w"] = jnp.concatenate(
                [raw["gate"].T, raw["up"].T], axis=1
            ).astype(dt)
            upd["down_w"] = raw["down"].T.astype(dt)
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
        }
        if E:  # mixtral block_sparse_moe: gate (router) + experts w1/w2/w3
            raw["router"] = g(p + "block_sparse_moe.gate.weight")
            for e in range(E):
                ep = p + f"block_sparse_moe.experts.{e}."
                raw[f"w1_{e}"] = g(ep + "w1.weight")
                raw[f"w2_{e}"] = g(ep + "w2.weight")
                raw[f"w3_{e}"] = g(ep + "w3.weight")
        else:
            raw["gate"] = g(p + "mlp.gate_proj.weight")
            raw["up"] = g(p + "mlp.up_proj.weight")
            raw["down"] = g(p + "mlp.down_proj.weight")
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
    }
    E = cfg.num_local_experts
    if E:
        layers["router_w"] = w(ks[2], L, H, E)
        ke1, ke2 = jax.random.split(ks[3])
        layers["moe_gate_up_w"] = w(ke1, L, E, H, 2 * I)
        layers["moe_down_w"] = w(ke2, L, E, I, H)
    else:
        layers["gate_up_w"] = w(ks[2], L, H, 2 * I)
        layers["down_w"] = w(ks[3], L, I, H)
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


def _moe_layer_params(lp: Dict, quant, l) -> Dict:
    """Per-layer MoE weights for the DENSE path. Quantized expert stacks
    live in `quant` (kept out of scan xs like every QuantizedTensor);
    the dense fallback/prefill dequantizes layer l's [E, in, out] slice
    on the fly — the gathered decode kernels read the packed bytes
    directly and never call this."""
    if quant and "moe_gate_up_w" in quant:
        from tinygpt_tpu.ops.quant import dequantize

        lp = dict(lp)
        for k in ("moe_gate_up_w", "moe_down_w"):
            qt = quant[k]
            lp[k] = dequantize(QuantizedTensor(
                qt.data[l], qt.scales[l], qt.bits, qt.group_size,
                qt.in_dim,
            ))
        # odd-64-lane stacks dequantize with their quantize-time row
        # padding (exact-zero rows); slice back to the logical dims the
        # dense einsums expect — gate_up's rows are H (= down's out),
        # down's rows are I (= gate_up's out / 2)
        gu, dn = lp["moe_gate_up_w"], lp["moe_down_w"]
        lp["moe_gate_up_w"] = gu[:, : dn.shape[-1], :]
        lp["moe_down_w"] = dn[:, : gu.shape[-1] // 2, :]
    return lp


def moe_mlp(h: jnp.ndarray, lp: Dict, cfg: ModelConfig,
            impl: str = "auto") -> jnp.ndarray:
    """Mixtral block-sparse MoE MLP, HF semantics: full softmax over the
    router logits -> top-k -> renormalize the selected weights -> weighted
    sum of the selected experts' SwiGLU outputs.

    Beyond-reference capability (the reference has no MoE family).
    Two formulations, same math:

    * ``impl="routed"`` — tokens sort by expert and each expert
      contracts only its own contiguous group via `lax.ragged_dot`
      (XLA's MXU-tiled grouped matmul): k/E of the dense FLOPs+reads,
      the idiomatic TPU prefill path. Keep the expert dim UNSHARDED
      here — under EP sharding GSPMD would all-gather the expert
      stacks (correct but slow); callers on EP meshes pass "dense".
    * ``impl="dense"`` — every expert's FFN runs on every token,
      weighted by a (mostly zero) routing coefficient. The expert dim
      stays WHOLE inside each einsum, which is what lets GSPMD turn the
      contraction into expert parallelism when the dim is sharded over
      the decode-idle "sp" axis (parallel/sharding.py): each device
      computes only its local experts and the weighted sum becomes a
      psum. Memory is bounded by chunking the flattened token dim;
      decode (S=1) is a single chunk.
    * ``impl="auto"`` — routed for prefill-sized token counts (B*S >=
      32), dense for decode-sized ones (tiny sorts/gathers beat nothing
      there, and the quantized decode path uses the gathered Pallas
      kernels instead — ops/moe_kernels.py).

    h: [B, S, H] (post-norm). lp: router_w [H, E],
    moe_gate_up_w [E, H, 2I], moe_down_w [E, I, H]. Returns [B, S, H].
    """
    k = cfg.num_experts_per_tok
    E = cfg.num_local_experts
    B, S, H = h.shape
    if impl == "auto":
        impl = "routed" if B * S >= 32 else "dense"
    logits = (h.astype(jnp.float32)
              @ lp["router_w"].astype(jnp.float32))          # [B, S, E]
    probs = jax.nn.softmax(logits, axis=-1)
    w_top, idx = jax.lax.top_k(probs, k)                     # [B, S, k]
    w_top = w_top / jnp.sum(w_top, axis=-1, keepdims=True)
    if impl == "routed":
        return _moe_ffn_routed(h, w_top, idx, lp["moe_gate_up_w"],
                               lp["moe_down_w"], E)
    # dense per-expert coefficient map: [B, S, E], zero off the top-k
    we = jnp.sum(
        jax.nn.one_hot(idx, E, dtype=jnp.float32) * w_top[..., None],
        axis=-2,
    )

    gw, dw = lp["moe_gate_up_w"], lp["moe_down_w"]

    def ffn_chunk(carry, args):
        ht, wt = args  # [C, H], [C, E]
        gate_up = jnp.einsum("ch,eho->ceo", ht, gw)     # [C, E, 2I]
        gate, up = jnp.split(gate_up, 2, axis=-1)
        act = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
        out = jnp.einsum("ce,cei,eih->ch", wt.astype(ht.dtype), act, dw)
        return carry, out

    T = B * S
    C = min(T, 256)  # bounds the [C, E, 2I] activation
    n_chunks = -(-T // C)
    pad = n_chunks * C - T
    hf = jnp.pad(h.reshape(T, H), ((0, pad), (0, 0)))
    wf = jnp.pad(we.reshape(T, E), ((0, pad), (0, 0)))
    if n_chunks == 1:
        _, out = ffn_chunk(None, (hf, wf))
    else:
        _, out = jax.lax.scan(
            ffn_chunk, None,
            (hf.reshape(n_chunks, C, H), wf.reshape(n_chunks, C, E)),
        )
        out = out.reshape(n_chunks * C, H)
    return out[:T].reshape(B, S, H)


def _moe_ffn_routed(h, w_top, idx, gw, dw, E: int) -> jnp.ndarray:
    """Token-ragged expert FFN: sort (token, choice) pairs by expert id,
    run each expert's SwiGLU over its contiguous group with
    `lax.ragged_dot` (grouped matmul — tiles straight onto the MXU), and
    scatter-add the weighted outputs back. Exactly the dense weighted
    sum, computed over only the routed k/E slice of the FLOPs.

    h [B, S, H]; w_top/idx [B, S, k] renormalized top-k routing;
    gw [E, H, 2I]; dw [E, I, H].
    """
    B, S, H = h.shape
    k = idx.shape[-1]
    T = B * S
    hf = h.reshape(T, H)
    eid = idx.reshape(T * k)
    # stable sort keeps (token, choice) order within an expert's group,
    # so the scatter-add below is deterministic
    order = jnp.argsort(eid, stable=True)                  # [T*k]
    tok_of = order // k                                    # source token
    x_s = jnp.take(hf, tok_of, axis=0)                     # [T*k, H]
    counts = jnp.zeros(E, jnp.int32).at[eid].add(1)        # group sizes
    gate_up = jax.lax.ragged_dot(x_s, gw, counts)          # [T*k, 2I]
    gate, up = jnp.split(gate_up, 2, axis=-1)
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
    o = jax.lax.ragged_dot(act, dw, counts)                # [T*k, H]
    w_s = w_top.reshape(T * k)[order].astype(jnp.float32)
    out = jnp.zeros((T, H), jnp.float32).at[tok_of].add(
        o.astype(jnp.float32) * w_s[:, None])
    return out.astype(h.dtype).reshape(B, S, H)


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
    moe_impl: str = "auto",        # moe_mlp formulation (see its docstring)
    quant: Optional[Dict] = None,  # stacked QuantizedTensors (full [L,...])
    l=None,                        # traced layer index for `quant`
    rope_c=None,                   # [B, S, 1, D] pre-gathered rope rows —
    rope_s=None,                   # callers inside a layer scan hoist the
                                   # gather (gather_rope) out of the body
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One pre-norm decoder layer (attention + SwiGLU MLP) over the dense
    cache. Shared by the single-program forward below and the pipeline-
    parallel stage runner (parallel/pipeline.py).

    Quantized matmul weights arrive via `quant` (the FULL stacked arrays)
    plus the traced layer index `l` instead of per-layer slices in `lp`:
    scan-xs slices of quantized weights would be copied across the Pallas
    custom-call boundary every layer (2x weight traffic — see
    ops/quant_kernels.py stacked variants)."""
    B, S = x.shape[0], x.shape[1]
    D = cfg.head_dim
    Nq, Nk = cfg.num_attention_heads, cfg.num_kv_heads
    q_dim = Nq * D

    def mm(h, key):
        if quant is not None and key in quant:
            return matmul_dequant_stacked(h, quant[key], l)
        return matmul_any(h, lp[key])

    h = rms_norm(x, lp["input_ln"], cfg.rms_norm_eps)
    qkv = mm(h, "qkv_w")
    if "qkv_b" in lp:
        qkv = qkv + lp["qkv_b"]
    q = qkv[..., :q_dim].reshape(B, S, Nq, D)
    k = qkv[..., q_dim : q_dim + Nk * D].reshape(B, S, Nk, D)
    v = qkv[..., q_dim + Nk * D :].reshape(B, S, Nk, D)
    if cfg.qk_norm:
        q = rms_norm(q, lp["q_norm"], cfg.rms_norm_eps)
        k = rms_norm(k, lp["k_norm"], cfg.rms_norm_eps)
    if rope_c is None:
        rope_c, rope_s = gather_rope(cos, sin, positions)
    q, k = apply_rope_gathered(q, k, rope_c, rope_s)
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
    x = x + mm(attn.reshape(B, S, q_dim), "o_w")
    h = rms_norm(x, lp["post_ln"], cfg.rms_norm_eps)
    if cfg.num_local_experts:
        x = x + moe_mlp(h, _moe_layer_params(lp, quant, l), cfg,
                        impl=moe_impl)
    else:
        gate_up = mm(h, "gate_up_w")
        gate, up = jnp.split(gate_up, 2, axis=-1)
        x = x + mm(
            jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up,
            "down_w",
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
    moe_impl: str = "auto",    # moe_mlp formulation; EP-sharded callers
                               # pass "dense" (see moe_mlp docstring)
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

    # quantized stacked weights stay OUT of the scan xs (they reach the
    # Pallas kernels whole, indexed by the traced layer counter) — a scan
    # slice would be copied across the custom-call boundary every layer
    quant = {k: v for k, v in params["layers"].items()
             if isinstance(v, QuantizedTensor)}
    rest = {k: v for k, v in params["layers"].items() if k not in quant}
    n_layers = cfg.num_hidden_layers

    rope_c, rope_s = gather_rope(cos, sin, positions)

    def layer_fn(x, scanned):
        lp, k_cache, v_cache, l = scanned
        x, k_cache, v_cache = decoder_layer_step(
            lp, x, k_cache, v_cache,
            cfg=cfg, positions=positions, kv_pos=kv_pos, valid=valid,
            slot=slot, cos=cos, sin=sin, attn_impl=attn_impl,
            moe_impl=moe_impl,
            quant=quant or None, l=l, rope_c=rope_c, rope_s=rope_s,
        )
        return x, (k_cache, v_cache)

    x, (new_k, new_v) = jax.lax.scan(
        layer_fn, x,
        (rest, cache.k, cache.v, jnp.arange(n_layers, dtype=jnp.int32)),
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
        # [..., :V]: quantized heads may carry DMA-alignment pad columns
        # (ops/quant.pad_head_out) — exact zeros, sliced off here
        logits = matmul_any(x, head)[..., : cfg.vocab_size]
    new_cache = KVCache(
        k=new_k, v=new_v, kv_pos=kv_pos, valid=valid,
        length=slot + S,
    )
    return logits.astype(jnp.float32), new_cache



# XLA's memory-space-assignment pass re-prefetches small stacked scale
# arrays into VMEM (S(1)) on EVERY layer iteration of the decode scan
# when they fit its budget — 28 x 19 us/step at the qwen3_17b shape,
# 0.52 ms of a 3.34 ms step (round-5 device trace). Compiler flags
# can't reach the tunneled remote compiler, so deny MSA the buffer:
# slice the layer's scales outside the kernel (one extra pass of the
# scale bytes per step) and index the slice layer-invariantly. Large
# stacks (7B: 50 MB) never tempted MSA and stay stacked for free.
_MSA_SCALE_SLICE_BYTES = 32 * 2**20


def _sliced_scales(qt: QuantizedTensor, l):
    """(scales_operand, scales_sliced_flag) for the fused kernels."""
    if qt.scales.nbytes <= _MSA_SCALE_SLICE_BYTES:
        return jax.lax.dynamic_index_in_dim(qt.scales, l, 0,
                                            keepdims=True), True
    return qt.scales, False


def decode_steps(
    params: Dict,
    cfg: ModelConfig,
    tok0: jnp.ndarray,       # [B] first input token of the chunk
    cache: KVCache,
    pos0: jnp.ndarray,       # [B, 1] logical position of tok0
    keys: jnp.ndarray,       # [n_steps, ...] per-step sampler keys
    sample_fn,               # (logits [B, V], key) -> tok [B] int32
    attn_impl: str = "xla",
) -> Tuple[jnp.ndarray, KVCache]:
    """n_steps single-token decode steps as ONE scanned program with the
    big KV cache FROZEN.

    forward() in a scan carries the full [L, B, Nk, T, D] cache through
    the loop, and XLA materializes its bytes twice per step (profiled:
    2 x ~820 us copies at Mistral-7B/T=1024 — ~17% of the step). Here the
    cache is a loop INVARIANT: each step's K/V land in a tiny in-flight
    buffer ([L, B, Nk, n_steps, D]) merged by sdpa_decode_frozen, and the
    chunk's tokens are written into the cache ONCE at the end.

    Returns (toks [n_steps, B] — the tokens sampled AFTER each input —
    and the advanced cache).
    """
    B = tok0.shape[0]
    n_steps = keys.shape[0]
    L = cfg.num_hidden_layers
    D, Nq, Nk = cfg.head_dim, cfg.num_attention_heads, cfg.num_kv_heads
    q_dim = Nq * D
    slot0 = cache.length
    cos, sin = params["rope_cos"], params["rope_sin"]

    quant = {k: v for k, v in params["layers"].items()
             if isinstance(v, QuantizedTensor)}
    rest = {k: v for k, v in params["layers"].items() if k not in quant}
    ls = jnp.arange(L, dtype=jnp.int32)

    # MoE decode: the expert stacks stay OUT of the scan and reach the
    # gathered-expert kernel whole, (layer, expert) indexed via scalar
    # prefetch — a scan-xs slice of [L, E, H, 2I] would copy every
    # layer's expert bytes across the custom-call boundary each step
    # (the same trap the stacked dequant kernels avoid), and the kernel
    # reads only the ROUTED k/E experts (ops/moe_kernels.py).
    moe_stacks = None
    if (cfg.num_local_experts and jax.devices()[0].platform == "tpu"
            and "moe_gate_up_w" in quant):
        # QUANTIZED expert stacks ride the gathered kernels (int4 MoE
        # measured 462 GB/s of routed bytes end-to-end, moe_8x1b leg).
        # bf16 stacks DO NOT: the bf16 gathered kernel streams at only
        # ~56 GB/s at Mixtral-8x7B shapes vs ~520 for the dense XLA
        # contraction (benchlogs_r4/moe_kernel_check.log), so even at a
        # B*k/E = 1/4 routed-bytes advantage dense wins — bf16 decode
        # routes to moe_mlp below.
        moe_stacks = {k: quant.pop(k)
                      for k in ("moe_gate_up_w", "moe_down_w")}

    # in-flight K/V stay bf16 even for narrower cache dtypes until the
    # final merge (free precision on the most recent tokens)
    infl_dt = jnp.bfloat16 if jnp.dtype(cache.k.dtype).itemsize < 2 \
        else cache.k.dtype
    infl_k0 = jnp.zeros((L, B, Nk, n_steps, D), infl_dt)
    infl_v0 = jnp.zeros((L, B, Nk, n_steps, D), infl_dt)

    # Frozen-merge attention routing, re-measured on v5e at Mistral-7B
    # b4/T=1024 AFTER the round-4 rope/tile fusions
    # (benchlogs_r4/profile_attn_routes.log, full_kernel_attn.log): the
    # flash_decode_frozen kernel runs the attn slice at 1.08 ms/step
    # (498 GB/s) vs 1.47 for the XLA merge, and the FULL step at 7.27 ms
    # vs 8.27 — the kernel reads the stacked cache directly (no
    # whole-chunk K transpose, no per-layer slice copies), which is also
    # what lets b16 int4 fit (the transpose duplicated cache.k in HBM).
    # The round-3 measurement that favored XLA (9.89 vs 10.47 ms) predates
    # the rope fusion — the XLA path's rope glue masked the kernel's win.
    # "pallas" therefore routes EVERY aligned shape to the kernel;
    # attn_impl="xla" keeps the oracle path selectable.
    T = cache.k.shape[3]
    use_kernel = (
        attn_impl in ("pallas", "pallas_frozen")
        and D % 128 == 0
        and T % 128 == 0
        and n_steps % 16 == 0
        # Mosaic fp8 VMEM loads scalarize (measured 66 GB/s vs 498 bf16)
        # — fp8 caches route to XLA under "pallas"; the explicit
        # "pallas_frozen" FORCE keeps its documented contract (benchable)
        and (jnp.dtype(cache.k.dtype).itemsize >= 2
             or attn_impl == "pallas_frozen")
    )
    # one whole-chunk K transpose ([L,B,Nk,T,D] -> [...,D,T]): the scores
    # dot consumes K in [D, T] layout, and feeding the natural layout
    # makes XLA re-transpose (copy) every layer every step — ~50x this
    # cost per chunk (see sdpa_decode_frozen)
    kT = None if use_kernel else jnp.swapaxes(cache.k, 3, 4)

    # elementwise-fused int4 path: rms-norm prologue, silu(g)*u prologue
    # and residual/bias epilogues run inside the dequant matmuls (the XLA
    # per-op overhead of the [B, H]-sized chain costs ~1 ms/step at
    # Mistral-7B b4). Engaged when every layer matmul is int4; qkv bias
    # (qwen2) rides the kernel's bias epilogue and per-head qk-norm
    # (qwen3) stays as the small XLA ops between the fused matmuls.
    from tinygpt_tpu.ops.quant_kernels import int4_lowerable

    fuse = (
        all(k in quant and quant[k].bits == 4
            and int4_lowerable(quant[k].in_dim)  # e.g. H=896 has no
            # legal packed-nibble tile — unfused reference fallback
            for k in ("qkv_w", "o_w", "gate_up_w", "down_w"))
        and jax.devices()[0].platform == "tpu"
    )
    if fuse:
        from tinygpt_tpu.ops.quant_kernels import (
            matmul_dequant_int4_stacked_fused as mm_fused,
        )
        from tinygpt_tpu.ops.quant_kernels import (
            mlp_fused_int4_stacked,
            mlp_supported,
        )

        ln_in = params["layers"]["input_ln"][:, None, :]    # [L, 1, H]
        ln_post = params["layers"]["post_ln"][:, None, :]
        qkv_bias = (params["layers"]["qkv_b"][:, None, :]
                    if "qkv_b" in params["layers"] else None)
        # whole-MLP mega-kernel (gate_up+silu+down one pallas call) when
        # the tiling contract holds and the batch fits one M tile
        mlp_mega = (
            quant["gate_up_w"].group_size == quant["down_w"].group_size
            and B <= 32
            and mlp_supported(cfg.hidden_size, cfg.intermediate_size,
                              quant["gate_up_w"].group_size, batch=B)
        )
        # RoPE folded into the qkv kernel's epilogue (q||k columns roped
        # while the tile is in VMEM) — kills the per-layer XLA rope glue.
        # qk-norm models (qwen3) fuse their per-head RMSNorm into the
        # same epilogue (pre-rope), so they ride the fused path too —
        # round 4 excluded them, and the per-layer XLA norm+rope glue was
        # the largest overhead of the qwen3_17b step (28 layers of
        # [B, 1, N, D]-sized ops between kernel launches).
        from tinygpt_tpu.ops.quant_kernels import rope_fuse_supported

        rope_fused = rope_fuse_supported(cfg.hidden_size, q_dim, Nk * D, D,
                                         quant["qkv_w"].group_size, B)
        qk_fused = rope_fused and cfg.qk_norm

    def one_step(tok, positions, infl_k, infl_v, step):
        x = params["embed"][tok[:, None]]  # [B, 1, H]
        rope_c, rope_s = gather_rope(cos, sin, positions)
        if use_kernel:
            # frozen-slot mask (causal & valid & window), shared by layers
            t_pos = cache.kv_pos  # [B, T]
            mask_f = (t_pos <= positions) & cache.valid
            if cfg.sliding_window is not None:
                mask_f &= t_pos > positions - cfg.sliding_window

        def layer_fn(x, scanned):
            lp, ik, iv, l = scanned
            if not use_kernel:
                # XLA path: frozen cache indexed INSIDE the body
                # (invariant, not scan xs — an xs slice is materialized as
                # a per-layer copy). The kernel path reads the stacked
                # cache directly via its prefetched layer index.
                kf = jax.lax.dynamic_index_in_dim(kT, l, 0, keepdims=False)
                vf = jax.lax.dynamic_index_in_dim(cache.v, l, 0,
                                                  keepdims=False)

            def mm(h, key):
                if key in quant:
                    return matmul_dequant_stacked(h, quant[key], l)
                return matmul_any(h, lp[key])

            def invrms(v2):
                vf32 = v2.astype(jnp.float32)
                return jax.lax.rsqrt(
                    jnp.mean(vf32 * vf32, axis=-1, keepdims=True)
                    + cfg.rms_norm_eps
                )

            if fuse:
                x2 = x[:, 0, :]
                qt = quant["qkv_w"]
                rkw = {}
                if rope_fused:
                    rkw = dict(rope_cos=rope_c[:, 0, 0, :],
                               rope_sin=rope_s[:, 0, 0, :],
                               rope_heads=Nq + Nk, rope_dim=D)
                    if qk_fused:
                        rkw.update(
                            qk_norm_w=(params["layers"]["q_norm"],
                                       params["layers"]["k_norm"]),
                            qk_heads=Nq, eps=cfg.rms_norm_eps)
                sc, ssl = _sliced_scales(qt, l)
                qkv = mm_fused(x2, qt.data, sc, l,
                               group=qt.group_size, ln=ln_in,
                               invrms=invrms(x2), bias=qkv_bias,
                               scales_sliced=ssl, **rkw)[:, None, :]
            else:
                h = rms_norm(x, lp["input_ln"], cfg.rms_norm_eps)
                qkv = mm(h, "qkv_w")
                if "qkv_b" in lp:
                    qkv = qkv + lp["qkv_b"]
            q = qkv[..., :q_dim].reshape(B, 1, Nq, D)
            k = qkv[..., q_dim : q_dim + Nk * D].reshape(B, 1, Nk, D)
            v = qkv[..., q_dim + Nk * D :].reshape(B, 1, Nk, D)
            if cfg.qk_norm and not (fuse and qk_fused):
                q = rms_norm(q, lp["q_norm"], cfg.rms_norm_eps)
                k = rms_norm(k, lp["k_norm"], cfg.rms_norm_eps)
            if not (fuse and rope_fused):
                q, k = apply_rope_gathered(q, k, rope_c, rope_s)
            ik = jax.lax.dynamic_update_slice(
                ik, k.transpose(0, 2, 1, 3).astype(ik.dtype),
                (0, 0, step, 0),
            )
            iv = jax.lax.dynamic_update_slice(
                iv, v.transpose(0, 2, 1, 3).astype(iv.dtype),
                (0, 0, step, 0),
            )
            if use_kernel:
                from tinygpt_tpu.ops.attention_kernels import (
                    flash_decode_frozen,
                )

                attn = flash_decode_frozen(
                    q[:, 0], cache.k, cache.v, mask_f, ik, iv, l, step,
                    scale=D ** -0.5, window=cfg.sliding_window,
                )[:, None]
            else:
                attn = sdpa_decode_frozen(
                    q, kf, vf, cache.kv_pos, cache.valid, ik, iv, step,
                    positions, sliding_window=cfg.sliding_window,
                    k_transposed=True,
                )
            if fuse:
                qt = quant["o_w"]
                sc, ssl = _sliced_scales(qt, l)
                x2 = mm_fused(attn.reshape(B, q_dim), qt.data, sc,
                              l, group=qt.group_size, res=x[:, 0, :],
                              scales_sliced=ssl)
                if mlp_mega:
                    gqt, dqt = quant["gate_up_w"], quant["down_w"]
                    gsc, gssl = _sliced_scales(gqt, l)
                    dsc, dssl = _sliced_scales(dqt, l)
                    x2 = mlp_fused_int4_stacked(
                        x2, gqt.data, gsc, dqt.data, dsc,
                        ln_post, invrms(x2), l, group=gqt.group_size,
                        gu_sliced=gssl, dn_sliced=dssl,
                    )
                else:
                    qt = quant["gate_up_w"]
                    sc, ssl = _sliced_scales(qt, l)
                    gate_up = mm_fused(x2, qt.data, sc, l,
                                       group=qt.group_size, ln=ln_post,
                                       invrms=invrms(x2),
                                       scales_sliced=ssl)
                    qt = quant["down_w"]
                    sc, ssl = _sliced_scales(qt, l)
                    x2 = mm_fused(gate_up, qt.data, sc, l,
                                  group=qt.group_size, silu=True, res=x2,
                                  scales_sliced=ssl)
                return x2[:, None, :], (ik, iv)
            x = x + mm(attn.reshape(B, 1, q_dim), "o_w")
            h = rms_norm(x, lp["post_ln"], cfg.rms_norm_eps)
            if cfg.num_local_experts:
                if moe_stacks is not None:
                    from tinygpt_tpu.ops.moe_kernels import moe_mlp_gathered

                    x = x + moe_mlp_gathered(
                        h, lp["router_w"], moe_stacks["moe_gate_up_w"],
                        moe_stacks["moe_down_w"], l, cfg,
                    )
                else:
                    x = x + moe_mlp(h, _moe_layer_params(lp, quant, l),
                                    cfg)
            else:
                gate_up = mm(h, "gate_up_w")
                gate, up = jnp.split(gate_up, 2, axis=-1)
                x = x + mm(
                    jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype)
                    * up,
                    "down_w",
                )
            return x, (ik, iv)

        x, (infl_k, infl_v) = jax.lax.scan(
            layer_fn, x, (rest, infl_k, infl_v, ls)
        )
        head = params["lm_head"]
        if (fuse and isinstance(head, QuantizedTensor) and head.bits == 4):
            # final-norm prologue fused into the int4 lm_head matmul
            # (the stacked kernel with a single layer) — the separate
            # rms_norm + matmul ops cost scan-glue time per step
            x2 = x[:, 0, :]
            xf = x2.astype(jnp.float32)
            inv = jax.lax.rsqrt(
                jnp.mean(xf * xf, axis=-1, keepdims=True)
                + cfg.rms_norm_eps)
            logits = mm_fused(
                x2, head.data[None], head.scales[None],
                jnp.asarray(0, jnp.int32), group=head.group_size,
                ln=params["final_ln"][None, None, :], invrms=inv,
            )[:, None, : cfg.vocab_size]  # drop head pad cols (quant.py)
        else:
            x = rms_norm(x, params["final_ln"], cfg.rms_norm_eps)
            if head is None:
                logits = x @ params["embed"].T
            else:
                logits = matmul_any(x, head)[..., : cfg.vocab_size]
        return logits.astype(jnp.float32), infl_k, infl_v

    def body(carry, key_step):
        tok, pos, infl_k, infl_v, step = carry
        logits, infl_k, infl_v = one_step(tok, pos, infl_k, infl_v, step)
        nxt = sample_fn(logits[:, -1, :], key_step).astype(jnp.int32)
        return (nxt, pos + 1, infl_k, infl_v, step + 1), nxt

    (tok, pos, infl_k, infl_v, _), toks = jax.lax.scan(
        body, (tok0.astype(jnp.int32), pos0, infl_k0, infl_v0,
               jnp.asarray(0, jnp.int32)), keys
    )

    # merge the chunk into the cache once (in-place under donation)
    k = jax.lax.dynamic_update_slice(
        cache.k, infl_k.astype(cache.k.dtype), (0, 0, 0, slot0, 0)
    )
    v = jax.lax.dynamic_update_slice(
        cache.v, infl_v.astype(cache.v.dtype), (0, 0, 0, slot0, 0)
    )
    win_pos = pos0 + jnp.arange(n_steps, dtype=jnp.int32)[None, :]  # [B, N]
    kv_pos = jax.lax.dynamic_update_slice(cache.kv_pos, win_pos, (0, slot0))
    valid = jax.lax.dynamic_update_slice(
        cache.valid, jnp.ones((B, n_steps), jnp.bool_), (0, slot0)
    )
    new_cache = KVCache(k=k, v=v, kv_pos=kv_pos, valid=valid,
                        length=slot0 + n_steps)
    return toks, new_cache


def vary_like(x, ref):
    """Give x the same varying-manual-axes type as ref (no-op outside
    shard_map). Under the scheduler's row-parallel serving the decode
    quantum runs inside shard_map with a manual dp axis; scan carries
    that start as freshly-created zeros (invariant) but get dp-varying
    writes must ENTER the scan already dp-varying or vma typing rejects
    the loop."""
    vma = getattr(jax.typeof(ref), "vma", frozenset())
    return jax.lax.pcast(x, tuple(vma), to="varying") if vma else x


def decode_paged_steps(
    params: Dict,
    cfg: ModelConfig,
    tok0: jnp.ndarray,   # [B] first input token of the quantum
    state,               # PagedKVState
    keys: jnp.ndarray,   # [n_steps, ...] per-step sampler keys
    sample_fn,           # (logits [B, V], key) -> tok [B] int32
    attn_impl: str = "xla",
):
    """n_steps paged decode steps as ONE scanned program with the block
    POOLS frozen (the paged analogue of decode_steps): carrying the
    [L, n_blocks, ...] pools through the scan costs a full pool
    read+write per layer per step plus a per-layer slab copy across any
    Pallas call — at the serving-bench shape that's ~4.3 GB/step of pure
    bookkeeping traffic. Here each step's K/V land in an in-flight
    buffer merged by paged_decode_frozen, and ONE scatter writes the
    quantum's tokens into their (block, offset) slots at the end.

    Sliding windows are handled inside the frozen merge (the current
    token's slot is lengths0[b] + step, and slot deltas equal logical
    deltas within a row).

    Returns (toks [n_steps, B], advanced PagedKVState).
    """
    from tinygpt_tpu.ops.paged_attention import paged_decode_frozen

    B = tok0.shape[0]
    n_steps = keys.shape[0]
    L = cfg.num_hidden_layers
    D, Nq, Nk = cfg.head_dim, cfg.num_attention_heads, cfg.num_kv_heads
    q_dim = Nq * D
    bs = state.block_size
    lengths0, starts = state.lengths, state.starts
    tables, active = state.block_tables, state.active
    act_i = active.astype(jnp.int32)
    cos, sin = params["rope_cos"], params["rope_sin"]

    quant = {k: v for k, v in params["layers"].items()
             if isinstance(v, QuantizedTensor)}
    rest = {k: v for k, v in params["layers"].items() if k not in quant}
    ls = jnp.arange(L, dtype=jnp.int32)

    # MoE: routed experts via the gathered kernel (see decode_steps)
    moe_stacks = None
    if (cfg.num_local_experts and jax.devices()[0].platform == "tpu"
            and "moe_gate_up_w" in quant):
        # QUANTIZED expert stacks ride the gathered kernels (int4 MoE
        # measured 462 GB/s of routed bytes end-to-end, moe_8x1b leg).
        # bf16 stacks DO NOT: the bf16 gathered kernel streams at only
        # ~56 GB/s at Mixtral-8x7B shapes vs ~520 for the dense XLA
        # contraction (benchlogs_r4/moe_kernel_check.log), so even at a
        # B*k/E = 1/4 routed-bytes advantage dense wins — bf16 decode
        # routes to moe_mlp below.
        moe_stacks = {k: quant.pop(k)
                      for k in ("moe_gate_up_w", "moe_down_w")}

    infl_dt = jnp.bfloat16 if jnp.dtype(state.k_pool.dtype).itemsize < 2 \
        else state.k_pool.dtype
    infl_k0 = vary_like(jnp.zeros((L, B, Nk, n_steps, D), infl_dt),
                        state.k_pool)
    infl_v0 = vary_like(jnp.zeros((L, B, Nk, n_steps, D), infl_dt),
                        state.k_pool)

    # elementwise-fused int4 path + MLP mega-kernel, exactly as in
    # decode_steps — the serving quantum pays the same ~1 ms/step of XLA
    # per-op glue at 7B shapes otherwise. Shape gates use the ACTUAL
    # tensor dims (under shard_map tp they are the per-shard dims).
    from tinygpt_tpu.ops.quant_kernels import int4_lowerable

    fuse = (
        all(k in quant and quant[k].bits == 4
            and int4_lowerable(quant[k].in_dim)  # e.g. H=896 has no
            # legal packed-nibble tile — unfused reference fallback
            for k in ("qkv_w", "o_w", "gate_up_w", "down_w"))
        and jax.devices()[0].platform == "tpu"
    )
    if fuse:
        from tinygpt_tpu.ops.quant_kernels import (
            matmul_dequant_int4_stacked_fused as mm_fused,
        )
        from tinygpt_tpu.ops.quant_kernels import (
            mlp_fused_int4_stacked,
            mlp_supported,
        )

        ln_in = params["layers"]["input_ln"][:, None, :]
        ln_post = params["layers"]["post_ln"][:, None, :]
        qkv_bias = (params["layers"]["qkv_b"][:, None, :]
                    if "qkv_b" in params["layers"] else None)
        # actual (per-shard under shard_map tp) LOGICAL dims, derived
        # from never-padded tensors: quantize_weight may row-pad a
        # stack's contraction dim (odd-64-lane), so data.shape[1] can
        # exceed the activation width — ln widths and OUT dims cannot.
        h_loc = ln_in.shape[-1]
        i_loc = quant["gate_up_w"].data.shape[2] // 2
        mlp_mega = (
            quant["gate_up_w"].group_size == quant["down_w"].group_size
            and B <= 32
            and mlp_supported(h_loc, i_loc,
                              quant["gate_up_w"].group_size, batch=B)
        )
        from tinygpt_tpu.ops.quant_kernels import rope_fuse_supported

        # qkv_w's (unpadded) output is q_dim + 2*kv_dim; split via the
        # shard-invariant GQA ratio
        out_qkv = quant["qkv_w"].data.shape[2]
        gqa = cfg.num_attention_heads // cfg.num_kv_heads
        kv_loc = out_qkv // (gqa + 2)
        q_loc = out_qkv - 2 * kv_loc
        rope_fused = rope_fuse_supported(h_loc, q_loc, kv_loc, D,
                                         quant["qkv_w"].group_size, B)
        # per-head qk RMSNorm (qwen3) fused into the same epilogue —
        # norm weights are per-head-dim [L, D], replicated under tp
        qk_fused = rope_fused and cfg.qk_norm

    def one_step(tok, infl_k, infl_v, step, kp, vp):
        lengths_t = lengths0 + step * act_i
        positions = (lengths_t - starts)[:, None]  # [B, 1] logical
        x = params["embed"][tok[:, None]]
        rope_c, rope_s = gather_rope(cos, sin, positions)

        def layer_fn(x, scanned):
            lp, ik, iv, l = scanned

            def mm(h, key):
                if key in quant:
                    return matmul_dequant_stacked(h, quant[key], l)
                return matmul_any(h, lp[key])

            def invrms(v2):
                vf32 = v2.astype(jnp.float32)
                return jax.lax.rsqrt(
                    jnp.mean(vf32 * vf32, axis=-1, keepdims=True)
                    + cfg.rms_norm_eps
                )

            if fuse:
                x2 = x[:, 0, :]
                qt = quant["qkv_w"]
                rkw = {}
                if rope_fused:
                    rkw = dict(rope_cos=rope_c[:, 0, 0, :],
                               rope_sin=rope_s[:, 0, 0, :],
                               rope_heads=Nq + Nk, rope_dim=D)
                    if qk_fused:
                        rkw.update(
                            qk_norm_w=(params["layers"]["q_norm"],
                                       params["layers"]["k_norm"]),
                            qk_heads=Nq, eps=cfg.rms_norm_eps)
                sc, ssl = _sliced_scales(qt, l)
                qkv = mm_fused(x2, qt.data, sc, l,
                               group=qt.group_size, ln=ln_in,
                               invrms=invrms(x2), bias=qkv_bias,
                               scales_sliced=ssl, **rkw)[:, None, :]
            else:
                h = rms_norm(x, lp["input_ln"], cfg.rms_norm_eps)
                qkv = mm(h, "qkv_w")
                if "qkv_b" in lp:
                    qkv = qkv + lp["qkv_b"]
            q = qkv[..., :q_dim].reshape(B, 1, Nq, D)
            k = qkv[..., q_dim : q_dim + Nk * D].reshape(B, 1, Nk, D)
            v = qkv[..., q_dim + Nk * D :].reshape(B, 1, Nk, D)
            if cfg.qk_norm and not (fuse and qk_fused):
                q = rms_norm(q, lp["q_norm"], cfg.rms_norm_eps)
                k = rms_norm(k, lp["k_norm"], cfg.rms_norm_eps)
            if not (fuse and rope_fused):
                q, k = apply_rope_gathered(q, k, rope_c, rope_s)
            ik = jax.lax.dynamic_update_slice(
                ik, k.transpose(0, 2, 1, 3).astype(ik.dtype),
                (0, 0, step, 0),
            )
            iv = jax.lax.dynamic_update_slice(
                iv, v.transpose(0, 2, 1, 3).astype(iv.dtype),
                (0, 0, step, 0),
            )
            attn = paged_decode_frozen(
                q[:, 0], kp, vp, tables, lengths0,
                starts, ik, iv, l, step, scale=D ** -0.5,
                sliding_window=cfg.sliding_window, kernel=attn_impl,
            )
            if fuse:
                qt = quant["o_w"]
                sc, ssl = _sliced_scales(qt, l)
                x2 = mm_fused(attn.reshape(B, q_dim), qt.data, sc,
                              l, group=qt.group_size, res=x[:, 0, :],
                              scales_sliced=ssl)
                if mlp_mega:
                    gqt, dqt = quant["gate_up_w"], quant["down_w"]
                    gsc, gssl = _sliced_scales(gqt, l)
                    dsc, dssl = _sliced_scales(dqt, l)
                    x2 = mlp_fused_int4_stacked(
                        x2, gqt.data, gsc, dqt.data, dsc,
                        ln_post, invrms(x2), l, group=gqt.group_size,
                        gu_sliced=gssl, dn_sliced=dssl,
                    )
                else:
                    qt = quant["gate_up_w"]
                    sc, ssl = _sliced_scales(qt, l)
                    gate_up = mm_fused(x2, qt.data, sc, l,
                                       group=qt.group_size, ln=ln_post,
                                       invrms=invrms(x2),
                                       scales_sliced=ssl)
                    qt = quant["down_w"]
                    sc, ssl = _sliced_scales(qt, l)
                    x2 = mm_fused(gate_up, qt.data, sc, l,
                                  group=qt.group_size, silu=True, res=x2,
                                  scales_sliced=ssl)
                return x2[:, None, :], (ik, iv)
            x = x + mm(attn.reshape(B, 1, q_dim), "o_w")
            h = rms_norm(x, lp["post_ln"], cfg.rms_norm_eps)
            if cfg.num_local_experts:
                if moe_stacks is not None:
                    from tinygpt_tpu.ops.moe_kernels import moe_mlp_gathered

                    x = x + moe_mlp_gathered(
                        h, lp["router_w"], moe_stacks["moe_gate_up_w"],
                        moe_stacks["moe_down_w"], l, cfg,
                    )
                else:
                    x = x + moe_mlp(h, _moe_layer_params(lp, quant, l),
                                    cfg)
            else:
                gate_up = mm(h, "gate_up_w")
                gate, up = jnp.split(gate_up, 2, axis=-1)
                x = x + mm(
                    jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype)
                    * up,
                    "down_w",
                )
            return x, (ik, iv)

        x, (infl_k, infl_v) = jax.lax.scan(
            layer_fn, x, (rest, infl_k, infl_v, ls)
        )
        head = params["lm_head"]
        if (fuse and isinstance(head, QuantizedTensor) and head.bits == 4):
            # final-norm prologue fused into the int4 lm_head matmul
            # (see decode_steps)
            x2 = x[:, 0, :]
            xf = x2.astype(jnp.float32)
            inv = jax.lax.rsqrt(
                jnp.mean(xf * xf, axis=-1, keepdims=True)
                + cfg.rms_norm_eps)
            logits = mm_fused(
                x2, head.data[None], head.scales[None],
                jnp.asarray(0, jnp.int32), group=head.group_size,
                ln=params["final_ln"][None, None, :], invrms=inv,
            )[:, : cfg.vocab_size]  # drop head pad cols (quant.py)
        else:
            x = rms_norm(x, params["final_ln"], cfg.rms_norm_eps)
            if head is None:
                logits = x[:, 0] @ params["embed"].T
            else:
                logits = matmul_any(x[:, 0], head)[..., : cfg.vocab_size]
        return logits.astype(jnp.float32), infl_k, infl_v

    # the pools ride through the scan as UNCHANGED carry: consumed only
    # by the loop and then by the final scatter, one linear ownership
    # chain XLA can alias end-to-end. Leaving them outside the scan gives
    # them two consumers (loop + scatter) and XLA materializes full-pool
    # copies around the loop (profiled: 2x1.56 ms before + 4 after).
    def body(carry, key_step):
        tok, infl_k, infl_v, kp, vp, step = carry
        logits, infl_k, infl_v = one_step(tok, infl_k, infl_v, step,
                                          kp, vp)
        nxt = sample_fn(logits, key_step).astype(jnp.int32)
        return (nxt, infl_k, infl_v, kp, vp, step + 1), nxt

    (tok, infl_k, infl_v, kp_out, vp_out, _), toks = jax.lax.scan(
        body, (tok0.astype(jnp.int32), infl_k0, infl_v0,
               state.k_pool, state.v_pool, jnp.asarray(0, jnp.int32)),
        keys
    )

    # scatter the quantum's K/V into their (block, offset) slots: step t's
    # token occupies slot lengths0 + t of its row (inactive rows -> the
    # reserved null block, same as forward_paged)
    steps = jnp.arange(n_steps, dtype=jnp.int32)
    slot_t = lengths0[None, :] + steps[:, None] * act_i[None, :]  # [N, B]
    rows = jnp.arange(B)
    blk = tables[rows[None, :], slot_t // bs]
    blk = jnp.where(active[None, :], blk, 0)
    off = slot_t % bs
    blkf, offf = blk.reshape(-1), off.reshape(-1)
    # advanced indexing pulls the two indexed dims to the FRONT: target
    # k_pool[:, blkf, :, offf, :] has shape [N*B, L, Nk, D]
    vals_k = infl_k.transpose(3, 1, 0, 2, 4).reshape(
        n_steps * B, L, Nk, D).astype(state.k_pool.dtype)
    vals_v = infl_v.transpose(3, 1, 0, 2, 4).reshape(
        n_steps * B, L, Nk, D).astype(state.v_pool.dtype)
    k_pool = kp_out.at[:, blkf, :, offf, :].set(vals_k, mode="drop")
    v_pool = vp_out.at[:, blkf, :, offf, :].set(vals_v, mode="drop")
    new_state = state._replace(
        k_pool=k_pool, v_pool=v_pool,
        lengths=lengths0 + n_steps * act_i,
    )
    return toks, new_state


def decode_paged_spec_steps(
    params: Dict,
    cfg: ModelConfig,
    tok0: jnp.ndarray,        # [B] current input token per row
    state,                    # PagedKVState (frozen pools)
    ctx_tokens: jnp.ndarray,  # [B, C] int32 — prompt+generated, cur last
    ctx_lens: jnp.ndarray,    # [B] int32
    n_rounds: int,
    gamma: int,               # draft length; S = gamma + 1 verify positions
    ngram: int,
    attn_impl: str = "xla",
    sampler=None,             # None = greedy; else (temps, topks, topps,
                              # minps) [B] arrays -> rejection sampling
    key=None,                 # PRNG key (required with sampler); folded
                              # per round
):
    """n_rounds of n-gram speculative verification for the continuous
    scheduler, fully device-resident: per-row prompt-lookup drafting
    over the context buffer, a gamma+1-position verify forward per round
    against the FROZEN pools (+ accepted in-flight slots), and prefix
    acceptance — all in one scanned program. One scatter writes every
    ACCEPTED slot to its (block, offset) at the end. A verify forward
    reads the same weight bytes as one decode step, so each row's
    throughput multiplies by (1 + its mean accepted drafts).

    Acceptance is exact for BOTH sampling regimes. Greedy rows accept
    the matched prefix of the argmax predictions (`sampler=None` path,
    or rows with temperature 0). Sampled rows use speculative rejection
    sampling against the deterministic n-gram draft: draft token d at a
    position with processed sampling distribution p (temperature +
    top-k/top-p/min-p masking, ops/sampling.masked_logits_batched) is
    accepted with probability p(d); the first rejected position emits a
    sample from the residual p with d's mass removed and renormalized —
    with a point-mass draft this makes every emitted token an EXACT
    sample from p (Leviathan et al., speculative sampling, public
    algorithm). Full acceptance emits a bonus sample from the final
    position's distribution.

    Returns (toks [R, B, S], counts [R, B] emitted per round, cur [B]
    next input per row, advanced PagedKVState). Rows draft from their
    OWN context. Sliding windows are exact: verify positions carry their
    prospective pool slots and accepted in-flight entries carry theirs,
    so the windowed merge masks in slot space (slot deltas equal logical
    deltas within a row) — the reference parses but ignores the window
    entirely (/root/reference/src/model/ModelMistral.h).
    """
    from tinygpt_tpu.ops.paged_attention import paged_decode_spec

    B = tok0.shape[0]
    C = ctx_tokens.shape[1]
    S = gamma + 1
    N = n_rounds * S
    L = cfg.num_hidden_layers
    D, Nq, Nk = cfg.head_dim, cfg.num_attention_heads, cfg.num_kv_heads
    q_dim = Nq * D
    bs = state.block_size
    lengths0, starts = state.lengths, state.starts
    tables, active = state.block_tables, state.active
    act_i = active.astype(jnp.int32)
    cos, sin = params["rope_cos"], params["rope_sin"]

    quant = {k: v for k, v in params["layers"].items()
             if isinstance(v, QuantizedTensor)}
    rest = {k: v for k, v in params["layers"].items() if k not in quant}
    ls = jnp.arange(L, dtype=jnp.int32)
    infl_dt = jnp.bfloat16 if jnp.dtype(state.k_pool.dtype).itemsize < 2 \
        else state.k_pool.dtype

    iota_c = jnp.arange(C - ngram + 1, dtype=jnp.int32)[None, :]
    iota_s = jnp.arange(S, dtype=jnp.int32)
    rows_b = jnp.arange(B)

    def draft_fn(ctx, clen, cur):
        """Vectorized prompt-lookup: most recent earlier window matching
        each row's final n-gram; rows without a match draft `cur`."""
        idx = jnp.clip(clen[:, None] - ngram + jnp.arange(ngram)[None, :],
                       0, C - 1)
        tail = jnp.take_along_axis(ctx, idx, axis=1)  # [B, n]
        match = jnp.ones((B, C - ngram + 1), bool)
        for j in range(ngram):
            match &= ctx[:, j : C - ngram + 1 + j] == tail[:, j : j + 1]
        match &= iota_c <= (clen[:, None] - ngram - 1)
        i_star = jnp.max(jnp.where(match, iota_c, -1), axis=1)  # [B]
        found = i_star >= 0
        p = i_star[:, None] + ngram + jnp.arange(gamma)[None, :]
        avail = found[:, None] & (p < clen[:, None])
        vals = jnp.take_along_axis(ctx, jnp.clip(p, 0, C - 1), axis=1)
        return jnp.where(avail, vals, cur[:, None])  # [B, gamma]

    def verify_forward(ids, positions, infl_k, infl_v, valid, r, kp, vp,
                       q_slots, infl_slots):
        x = params["embed"][ids]  # [B, S, H]
        rope_c, rope_s = gather_rope(cos, sin, positions)

        def layer_fn(x, scanned):
            lp, ik, iv, l = scanned

            def mm(h, key):
                if key in quant:
                    return matmul_dequant_stacked(h, quant[key], l)
                return matmul_any(h, lp[key])

            h = rms_norm(x, lp["input_ln"], cfg.rms_norm_eps)
            qkv = mm(h, "qkv_w")
            if "qkv_b" in lp:
                qkv = qkv + lp["qkv_b"]
            q = qkv[..., :q_dim].reshape(B, S, Nq, D)
            k = qkv[..., q_dim : q_dim + Nk * D].reshape(B, S, Nk, D)
            v = qkv[..., q_dim + Nk * D :].reshape(B, S, Nk, D)
            if cfg.qk_norm:
                q = rms_norm(q, lp["q_norm"], cfg.rms_norm_eps)
                k = rms_norm(k, lp["k_norm"], cfg.rms_norm_eps)
            q, k = apply_rope_gathered(q, k, rope_c, rope_s)
            ik = jax.lax.dynamic_update_slice(
                ik, k.transpose(0, 2, 1, 3).astype(ik.dtype),
                (0, 0, r * S, 0),
            )
            iv = jax.lax.dynamic_update_slice(
                iv, v.transpose(0, 2, 1, 3).astype(iv.dtype),
                (0, 0, r * S, 0),
            )
            attn = paged_decode_spec(
                q, kp, vp, tables, lengths0, starts,
                ik, iv, valid, l, r * S, scale=D ** -0.5,
                kernel=attn_impl, sliding_window=cfg.sliding_window,
                q_slots=q_slots, infl_slots=infl_slots,
            )
            x = x + mm(attn.reshape(B, S, q_dim), "o_w")
            h = rms_norm(x, lp["post_ln"], cfg.rms_norm_eps)
            if cfg.num_local_experts:
                x = x + moe_mlp(h, _moe_layer_params(lp, quant, l), cfg)
            else:
                gate_up = mm(h, "gate_up_w")
                gate, up = jnp.split(gate_up, 2, axis=-1)
                x = x + mm(
                    jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype)
                    * up,
                    "down_w",
                )
            return x, (ik, iv)

        x, (infl_k, infl_v) = jax.lax.scan(
            layer_fn, x, (rest, infl_k, infl_v, ls)
        )
        x = rms_norm(x, params["final_ln"], cfg.rms_norm_eps)
        head = params["lm_head"]
        if head is None:
            logits = x @ params["embed"].T
        else:
            logits = matmul_any(x, head)[..., : cfg.vocab_size]
        return logits.astype(jnp.float32), infl_k, infl_v

    def round_fn(carry, r):
        (cur, infl_k, infl_v, valid, acc, ctx, clen, kp, vp,
         infl_slots) = carry
        draft = draft_fn(ctx, clen, cur)                    # [B, gamma]
        ids = jnp.concatenate([cur[:, None], draft], axis=1)  # [B, S]
        positions = (lengths0 - starts + acc)[:, None] + iota_s[None, :]
        # pool slot each verify position will occupy (windowed masking)
        q_slots = (lengths0 + acc)[:, None] + iota_s[None, :]
        logits, infl_k, infl_v = verify_forward(
            ids, positions, infl_k, infl_v, valid, r, kp, vp,
            q_slots, infl_slots)
        preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, S]
        if sampler is None:
            m = jnp.sum(jnp.cumprod(
                (preds[:, :gamma] == draft).astype(jnp.int32), axis=1),
                axis=1)
            nxt = jnp.take_along_axis(
                preds, jnp.clip(m, 0, gamma)[:, None], axis=1)[:, 0]
            emit = preds
        else:
            from tinygpt_tpu.ops.sampling import (
                NEG_INF,
                masked_logits_batched,
            )

            temps, topks, topps, minps = sampler
            V = logits.shape[-1]
            ml = masked_logits_batched(
                logits.reshape(B * S, V),
                jnp.repeat(temps, S), jnp.repeat(topks, S),
                jnp.repeat(topps, S), jnp.repeat(minps, S),
            ).reshape(B, S, V)
            p = jax.nn.softmax(ml, axis=-1)
            greedy_row = temps <= 0
            k_u, k_res = jax.random.split(jax.random.fold_in(key, r))
            p_draft = jnp.take_along_axis(
                p[:, :gamma], draft[..., None], axis=-1)[..., 0]
            u = jax.random.uniform(k_u, (B, gamma))
            ok = jnp.where(greedy_row[:, None],
                           preds[:, :gamma] == draft, u < p_draft)
            m = jnp.sum(jnp.cumprod(ok.astype(jnp.int32), axis=1), axis=1)
            mc = jnp.clip(m, 0, gamma)[:, None]
            # emission at m: a reject masks the draft token's mass out of
            # p_m (the residual); full acceptance (m == gamma) samples
            # the bonus from the final position's distribution
            ml_m = jnp.take_along_axis(ml, mc[..., None], axis=1)[:, 0]
            d_m = jnp.take_along_axis(
                draft, jnp.clip(m, 0, gamma - 1)[:, None], axis=1)[:, 0]
            vio = jnp.arange(V, dtype=jnp.int32)[None, :]
            ml_res = jnp.where(
                (m < gamma)[:, None] & (vio == d_m[:, None]),
                NEG_INF, ml_m)
            nxt_s = jax.random.categorical(
                k_res, ml_res, axis=-1).astype(jnp.int32)
            nxt_g = jnp.take_along_axis(preds, mc, axis=1)[:, 0]
            nxt = jnp.where(greedy_row, nxt_g, nxt_s)
            pad_draft = jnp.concatenate(
                [draft, jnp.zeros((B, 1), jnp.int32)], axis=1)
            emit_s = jnp.where(iota_s[None, :] < m[:, None], pad_draft,
                               nxt[:, None])
            emit = jnp.where(greedy_row[:, None], preds, emit_s)
        # accept this round's slots 0..m into the in-flight validity
        pos_in = jnp.arange(N, dtype=jnp.int32)[None, :]
        this_round = (pos_in >= r * S) & (pos_in < (r + 1) * S)
        accepted_now = this_round & (pos_in - r * S <= m[:, None])
        valid = valid | accepted_now
        # record the accepted entries' pool slots for later rounds' masks
        infl_slots = jnp.where(
            accepted_now,
            (lengths0 + acc)[:, None] + (pos_in - r * S), infl_slots)
        # append the emitted tokens (emit[:, :m+1]) to the context
        idx2 = clen[:, None] + iota_s[None, :]
        old = jnp.take_along_axis(ctx, jnp.clip(idx2, 0, C - 1), axis=1)
        newv = jnp.where(
            (iota_s[None, :] <= m[:, None]) & (idx2 < C), emit, old)
        ctx = ctx.at[rows_b[:, None], jnp.clip(idx2, 0, C - 1)].set(newv)
        emitted = (m + 1) * act_i
        carry = (nxt, infl_k, infl_v, valid, acc + emitted, ctx,
                 clen + emitted, kp, vp, infl_slots)
        return carry, (emit, m + 1)

    # zeros carries must enter the scan already dp-varying under the
    # scheduler's row-parallel shard_map (vma typing, see vary_like)
    infl_k0 = vary_like(jnp.zeros((L, B, Nk, N, D), infl_dt),
                        state.k_pool)
    infl_v0 = vary_like(jnp.zeros((L, B, Nk, N, D), infl_dt),
                        state.k_pool)
    valid0 = vary_like(jnp.zeros((B, N), bool), state.k_pool)
    # pools ride through the scan as UNCHANGED carry (single ownership
    # chain -> XLA aliases loop + final scatter; see decode_paged_steps)
    carry0 = (tok0.astype(jnp.int32), infl_k0, infl_v0, valid0,
              vary_like(jnp.zeros((B,), jnp.int32), state.k_pool),
              ctx_tokens, ctx_lens.astype(jnp.int32),
              state.k_pool, state.v_pool,
              vary_like(jnp.zeros((B, N), jnp.int32), state.k_pool))
    (cur, infl_k, infl_v, valid, acc, _, _, kp_out, vp_out, _), \
        (toks, counts) = jax.lax.scan(
            round_fn, carry0, jnp.arange(n_rounds, dtype=jnp.int32)
        )
    # counts from ys are raw m+1 (pre active-mask); recompute emitted
    counts = counts * act_i[None, :]

    # scatter accepted slots: round r slot i -> pool slot
    # lengths0 + A_r + i, where A_r = accepted+1 emitted before round r
    A = jnp.concatenate(
        [jnp.zeros((1, B), jnp.int32), jnp.cumsum(counts, axis=0)[:-1]],
        axis=0,
    )  # [R, B]
    slot = (lengths0[None, None, :] + A[:, None, :]
            + iota_s[None, :, None])                        # [R, S, B]
    keep = (iota_s[None, :, None] < counts[:, None, :]) & active[None, None, :]
    blk = tables[rows_b[None, None, :], jnp.clip(slot // bs, 0,
                                                 tables.shape[1] - 1)]
    blk = jnp.where(keep, blk, 0)
    off = slot % bs
    blkf, offf = blk.reshape(-1), off.reshape(-1)
    # infl slots are (r, i) -> r*S + i; vals laid out [R, S, B] to match
    vals_k = infl_k.reshape(L, B, Nk, n_rounds, S, D).transpose(
        3, 4, 1, 0, 2, 5).reshape(n_rounds * S * B, L, Nk, D)
    vals_v = infl_v.reshape(L, B, Nk, n_rounds, S, D).transpose(
        3, 4, 1, 0, 2, 5).reshape(n_rounds * S * B, L, Nk, D)
    k_pool = kp_out.at[:, blkf, :, offf, :].set(
        vals_k.astype(state.k_pool.dtype), mode="drop")
    v_pool = vp_out.at[:, blkf, :, offf, :].set(
        vals_v.astype(state.v_pool.dtype), mode="drop")
    new_state = state._replace(
        k_pool=k_pool, v_pool=v_pool, lengths=lengths0 + acc,
    )
    return toks, counts, cur, new_state


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
    rope_c, rope_s = gather_rope(cos, sin, positions)

    quant = {k: v for k, v in params["layers"].items()
             if isinstance(v, QuantizedTensor)}
    rest = {k: v for k, v in params["layers"].items() if k not in quant}

    def layer_fn(x, scanned):
        lp, k_pool, v_pool, l = scanned

        def mm(h, key):
            if key in quant:
                return matmul_dequant_stacked(h, quant[key], l)
            return matmul_any(h, lp[key])

        h = rms_norm(x, lp["input_ln"], cfg.rms_norm_eps)
        qkv = mm(h, "qkv_w")
        if "qkv_b" in lp:
            qkv = qkv + lp["qkv_b"]
        q = qkv[..., :q_dim].reshape(B, 1, Nq, D)
        k = qkv[..., q_dim : q_dim + Nk * D].reshape(B, 1, Nk, D)
        v = qkv[..., q_dim + Nk * D :].reshape(B, 1, Nk, D)
        if cfg.qk_norm:
            q = rms_norm(q, lp["q_norm"], cfg.rms_norm_eps)
            k = rms_norm(k, lp["k_norm"], cfg.rms_norm_eps)
        q, k = apply_rope_gathered(q, k, rope_c, rope_s)
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
        x = x + mm(attn.reshape(B, 1, q_dim), "o_w")
        h = rms_norm(x, lp["post_ln"], cfg.rms_norm_eps)
        if cfg.num_local_experts:
            x = x + moe_mlp(h, _moe_layer_params(lp, quant, l), cfg)
        else:
            gate_up = mm(h, "gate_up_w")
            gate, up = jnp.split(gate_up, 2, axis=-1)
            x = x + mm(
                jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up,
                "down_w",
            )
        return x, (k_pool, v_pool)

    x, (new_k, new_v) = jax.lax.scan(
        layer_fn, x,
        (rest, state.k_pool, state.v_pool,
         jnp.arange(cfg.num_hidden_layers, dtype=jnp.int32)),
    )
    x = rms_norm(x, params["final_ln"], cfg.rms_norm_eps)
    head = params["lm_head"]
    if head is None:
        logits = x[:, 0] @ params["embed"].T
    else:
        logits = matmul_any(x[:, 0], head)[..., : cfg.vocab_size]
    new_state = state._replace(k_pool=new_k, v_pool=new_v,
                               lengths=new_lengths)
    return logits.astype(jnp.float32), new_state
