"""AWQ-style activation-aware weight scaling for INT4/INT8 quantization.

North-star functionality with no reference counterpart (the reference is
FP32/FP16/BF16-only, /root/reference/README.md:17). Implements the core
idea of Lin et al., "AWQ: Activation-aware Weight Quantization" (public
algorithm): per-input-channel scales s chosen from calibration activation
statistics are folded INTO the weights before quantization (w' = w * s)
and exactly compensated upstream (x' = x / s), so salient channels — the
ones with large activations — get finer quantization grids at ZERO
runtime cost.

TPU-native shape of the implementation:
- Stats collection is one jitted scan over the stacked layers (the same
  layout the models use) accumulating per-channel second moments E[x^2]
  at every quantized-matmul input; no hooks, no eager mode.
- The alpha grid search is fully vectorized on device (lax.map over
  layers), using the diagonal proxy  sum_i m_i * sum_o (dq(w*s)/s - w)^2
  for the calibration MSE (m = E[x_i^2]).
- Folding is an EXACT model identity on the float params (rms-norm
  weights, up-projection columns, v-projection columns, biases), so the
  unquantized forward is bit-unchanged up to dtype rounding — tested.

Fold map (per layer):
  qkv_w rows    * s  <-> input_ln    / s
  gate_up_w rows* s  <-> post_ln     / s
  down_w rows   * s  <-> up columns  / s   (silu(g) * (u/s) scales the
                                            product linearly)
  o_w rows      * s  <-> v columns   / s   (attention output is linear in
                                            v; s shared across the q heads
                                            of each kv group for GQA)
  lm_head rows  * s  <-> final_ln    / s

MoE (mixtral) fold map — post_ln feeds the ROUTER as well as every
expert, so the expert-input scale must be shared across experts and
counter-folded into the router too (router logits stay bit-identical):
  moe_gate_up_w[e] rows * s  <-> post_ln / s, router_w rows * s
  moe_down_w[e] rows * s_e   <-> expert e's up columns / s_e
                                 (per-expert: act_e feeds only expert e)
"""

from __future__ import annotations


from typing import Dict, Optional

import jax
import jax.numpy as jnp

from tinygpt_tpu.ops.norms import rms_norm
from tinygpt_tpu.ops.rope import gather_rope, apply_rope_gathered

# The standard AWQ alpha grid. alpha=0 is the identity (plain RTN), so
# AWQ can never be worse than round-to-nearest under the search proxy.
ALPHA_GRID = (0.0, 0.25, 0.5, 0.75, 1.0)


# -- calibration: per-channel activation second moments ------------------------


def collect_act_stats(
    params: Dict,
    cfg,
    input_ids: jnp.ndarray,  # [B, S] calibration tokens
) -> Dict[str, jnp.ndarray]:
    """Run one float prefill over the calibration batch and return
    per-channel second moments E[x^2] at each quantized-matmul input:

      qkv_in     [L, H]      o_in   [L, Nq*D]
      gate_up_in [L, H]      down_in [L, I]
      head_in    [H]

    Must be called on FLOAT params (before quantize_params). A dedicated
    stats forward (rather than instrumenting `forward`) keeps the model's
    hot path free of dead stat outputs; the layer math mirrors
    causal_lm.decoder_layer_step 1:1.
    """
    B, S = input_ids.shape
    D = cfg.head_dim
    Nq, Nk = cfg.num_attention_heads, cfg.num_kv_heads
    q_dim = Nq * D

    # causal (+ optional sliding window) mask, shared by all layers
    i = jnp.arange(S)[:, None]
    j = jnp.arange(S)[None, :]
    mask = j <= i
    if cfg.sliding_window:
        mask = mask & (j > i - cfg.sliding_window)
    neg = jnp.finfo(jnp.float32).min

    def second_moment(h):  # [..., C] -> [C]
        hf = h.astype(jnp.float32)
        return jnp.mean(hf * hf, axis=tuple(range(h.ndim - 1)))

    def make_layer_fn(rope_c, rope_s):
      # two-space body indent: the closure only threads the hoisted rope rows
      def layer_fn(x, lp):
        h = rms_norm(x, lp["input_ln"], cfg.rms_norm_eps)
        st_qkv = second_moment(h)
        qkv = h @ lp["qkv_w"].astype(jnp.float32)
        if "qkv_b" in lp:
            qkv = qkv + lp["qkv_b"].astype(jnp.float32)
        q = qkv[..., :q_dim].reshape(B, S, Nq, D)
        k = qkv[..., q_dim : q_dim + Nk * D].reshape(B, S, Nk, D)
        v = qkv[..., q_dim + Nk * D :].reshape(B, S, Nk, D)
        if cfg.qk_norm:
            q = rms_norm(q, lp["q_norm"], cfg.rms_norm_eps)
            k = rms_norm(k, lp["k_norm"], cfg.rms_norm_eps)
        q, k = apply_rope_gathered(q, k, rope_c, rope_s)
        # GQA: repeat kv heads across query groups
        rep = Nq // Nk
        kq = jnp.repeat(k, rep, axis=2)
        vq = jnp.repeat(v, rep, axis=2)
        logits = jnp.einsum("bsnd,btnd->bnst", q, kq) / (D ** 0.5)
        logits = jnp.where(mask[None, None], logits, neg)
        probs = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("bnst,btnd->bsnd", probs, vq)
        attn = attn.reshape(B, S, q_dim)
        st_o = second_moment(attn)
        x = x + attn @ lp["o_w"].astype(jnp.float32)
        h = rms_norm(x, lp["post_ln"], cfg.rms_norm_eps)
        st_gu = second_moment(h)
        if "router_w" in lp:
            # MoE (mixtral): h feeds the router AND every expert, so
            # gate_up_in is shared; down_in is PER-EXPERT [E, I], the
            # routing-mass-weighted second moment of each expert's act
            # (mirrors moe_mlp's dense formulation, chunked over tokens)
            k_top = cfg.num_experts_per_tok
            E = cfg.num_local_experts
            r_logits = h @ lp["router_w"].astype(jnp.float32)
            r_probs = jax.nn.softmax(r_logits, axis=-1)
            w_top, idx = jax.lax.top_k(r_probs, k_top)
            w_top = w_top / jnp.sum(w_top, axis=-1, keepdims=True)
            we = jnp.sum(jax.nn.one_hot(idx, E, dtype=jnp.float32)
                         * w_top[..., None], axis=-2)          # [B, S, E]
            gw = lp["moe_gate_up_w"].astype(jnp.float32)       # [E, H, 2I]
            dw = lp["moe_down_w"].astype(jnp.float32)          # [E, I, H]
            T, H_, I_ = B * S, h.shape[-1], dw.shape[1]
            C = min(T, 256)
            n_chunks = -(-T // C)
            pad = n_chunks * C - T
            hfl = jnp.pad(h.reshape(T, H_), ((0, pad), (0, 0)))
            wfl = jnp.pad(we.reshape(T, E), ((0, pad), (0, 0)))

            def moe_chunk(carry, args):
                m_acc, w_acc = carry
                ht, wt = args  # [C, H], [C, E]
                gu = jnp.einsum("ch,eho->ceo", ht, gw)
                g_, u_ = jnp.split(gu, 2, axis=-1)
                act = jax.nn.silu(g_) * u_                     # [C, E, I]
                out = jnp.einsum("ce,cei,eih->ch", wt, act, dw)
                m_acc = m_acc + jnp.einsum("ce,cei->ei", wt, act * act)
                w_acc = w_acc + wt.sum(axis=0)
                return (m_acc, w_acc), out

            (m_acc, w_acc), outs = jax.lax.scan(
                moe_chunk,
                (jnp.zeros((E, I_), jnp.float32),
                 jnp.zeros(E, jnp.float32)),
                (hfl.reshape(n_chunks, C, H_),
                 wfl.reshape(n_chunks, C, E)),
            )
            st_down = m_acc / jnp.maximum(w_acc, 1e-6)[:, None]
            x = x + outs.reshape(n_chunks * C, H_)[:T].reshape(B, S, H_)
            return x, {"qkv_in": st_qkv, "o_in": st_o,
                       "gate_up_in": st_gu, "down_in": st_down}
        gate_up = h @ lp["gate_up_w"].astype(jnp.float32)
        gate, up = jnp.split(gate_up, 2, axis=-1)
        act = jax.nn.silu(gate) * up
        st_down = second_moment(act)
        x = x + act @ lp["down_w"].astype(jnp.float32)
        return x, {"qkv_in": st_qkv, "o_in": st_o,
                   "gate_up_in": st_gu, "down_in": st_down}
      return layer_fn

    @jax.jit
    def run(params, input_ids):
        positions = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))
        rope_c, rope_s = gather_rope(
            params["rope_cos"], params["rope_sin"], positions
        )
        x0 = params["embed"][input_ids].astype(jnp.float32)
        xN, stats = jax.lax.scan(
            make_layer_fn(rope_c, rope_s), x0, params["layers"]
        )
        hN = rms_norm(xN, params["final_ln"], cfg.rms_norm_eps)
        stats["head_in"] = second_moment(hN)
        return stats

    return run(params, input_ids)


# -- alpha grid search ---------------------------------------------------------


def _qdq(w: jnp.ndarray, bits: int, g: int) -> jnp.ndarray:
    """Quantize-dequantize [in, out] through the same symmetric per-group
    grid quantize_weight uses (quant.py:101-122), without packing."""
    in_dim, out_dim = w.shape
    qmax = 127.0 if bits == 8 else 7.0
    wg = w.reshape(in_dim // g, g, out_dim)
    absmax = jnp.abs(wg).max(axis=-2)
    scales = jnp.where(absmax == 0, 1e-8, absmax / qmax)
    q = jnp.clip(jnp.round(wg / scales[:, None, :]), -qmax - 1, qmax)
    return (q * scales[:, None, :]).reshape(in_dim, out_dim)


def _scales_from_alpha(m: jnp.ndarray, alpha: float) -> jnp.ndarray:
    """s = (a / gmean(a))^alpha with a = sqrt(E[x^2]); normalized so the
    geometric mean is 1 (keeps the folded weights in the same dynamic
    range) and clamped to [1/32, 32]."""
    a = jnp.sqrt(jnp.maximum(m, 1e-12))
    log_a = jnp.log(a)
    s = jnp.exp((log_a - log_a.mean()) * alpha)
    return jnp.clip(s, 1.0 / 32.0, 32.0)


def search_scales(
    w: jnp.ndarray,       # [L, in, out] stacked float weight
    m: jnp.ndarray,       # [L, in] activation second moments
    bits: int,
    group_size: int,
    kv_share: Optional[tuple] = None,  # (Nk, G, D): share s across the G
                                       # q heads of each kv group (o_w)
) -> jnp.ndarray:
    """Per-layer alpha grid search minimizing the diagonal calibration-MSE
    proxy  sum_i m_i * sum_o (dq(w*s)[i,o]/s_i - w[i,o])^2.  Returns the
    winning s [L, in] (alpha=0 -> all-ones, so never worse than RTN under
    the proxy).

    The alpha candidates and the layer loop both run under lax.map so the
    f32 working set stays one (weight, candidate) large — a 7B gate_up
    stack would otherwise materialize tens of GB."""
    in_dim = w.shape[-2]
    g = min(group_size, in_dim)
    if bits == 4:
        g = min(g, in_dim // 2)

    def one(args):
        w2, m2 = args  # [in, out], [in]
        m_eff = m2
        if kv_share is not None:
            # rows are ordered (q_head, d), q head h -> kv head h // G
            # (consecutive grouping, ops/attention.py:49); average the
            # stats over each kv group so every member row gets the SAME
            # scale (s is elementwise in m_eff)
            nk, grp, d = kv_share
            m_eff = jnp.broadcast_to(
                m2.reshape(nk, grp, d).mean(axis=1, keepdims=True),
                (nk, grp, d),
            ).reshape(in_dim)

        cand = jnp.stack(
            [_scales_from_alpha(m_eff, a) for a in ALPHA_GRID]
        )  # [A, in]

        def err_for(s):
            wf = w2.astype(jnp.float32)
            dq = _qdq(wf * s[:, None], bits, g) / s[:, None]
            e = dq - wf
            return jnp.sum(m2 * jnp.sum(e * e, axis=-1))

        errs = jax.lax.map(err_for, cand)
        return cand[jnp.argmin(errs)]

    return jax.lax.map(one, (w, m))


def search_scales_shared(
    w: jnp.ndarray,       # [L, E, in, out] stacked expert weights
    m: jnp.ndarray,       # [L, in] shared activation second moments
    bits: int,
    group_size: int,
) -> jnp.ndarray:
    """Alpha grid search for ONE scale vector shared by all E experts of
    a layer (the MoE gate_up fold: the scale counter-folds into post_ln
    and the router, which every expert shares). Error = sum over experts
    of the same diagonal proxy; experts stream under lax.map so the f32
    working set stays one expert large. Returns s [L, in]."""
    in_dim = w.shape[-2]
    g = min(group_size, in_dim)
    if bits == 4:
        g = min(g, in_dim // 2)

    def one(args):
        wE, m2 = args  # [E, in, out], [in]
        cand = jnp.stack(
            [_scales_from_alpha(m2, a) for a in ALPHA_GRID]
        )

        def err_for(s):
            def per_expert(w2):
                wf = w2.astype(jnp.float32)
                dq = _qdq(wf * s[:, None], bits, g) / s[:, None]
                e = dq - wf
                return jnp.sum(m2 * jnp.sum(e * e, axis=-1))

            return jax.lax.map(per_expert, wE).sum()

        errs = jax.lax.map(err_for, cand)
        return cand[jnp.argmin(errs)]

    return jax.lax.map(one, (w, m))


# -- exact-identity folding ----------------------------------------------------


def apply_awq(
    params: Dict,
    cfg,
    stats: Dict[str, jnp.ndarray],
    bits: int = 4,
    group_size: int = 128,
) -> Dict:
    """Return a NEW float param pytree with AWQ scales folded in. The
    result is mathematically identical to `params` (up to dtype rounding)
    — quantize it with quant.quantize_params to get the benefit.

    Tied-embedding models get an explicit scaled `lm_head` (= embed.T * s)
    so the embedding gather keeps the unscaled table.
    """
    D = cfg.head_dim
    Nq, Nk = cfg.num_attention_heads, cfg.num_kv_heads
    q_dim = Nq * D
    rep = Nq // Nk

    @jax.jit
    def fold(params):
        layers = params["layers"]
        dt = layers["qkv_w"].dtype

        is_moe = "router_w" in layers
        s_qkv = search_scales(layers["qkv_w"], stats["qkv_in"],
                              bits, group_size)                       # [L, H]
        s_o = search_scales(layers["o_w"], stats["o_in"], bits,
                            group_size, kv_share=(Nk, rep, D))        # [L, Nq*D]
        if is_moe:
            # one expert-input scale per layer (shared — it counter-
            # folds into post_ln and the router); per-expert down scales
            s_gu = search_scales_shared(
                layers["moe_gate_up_w"], stats["gate_up_in"],
                bits, group_size)                                     # [L, H]
            dwn = layers["moe_down_w"]                        # [L, E, I, Hd]
            Lz, Ez, Iz, Hz = dwn.shape
            s_down = search_scales(
                dwn.reshape(Lz * Ez, Iz, Hz),
                stats["down_in"].reshape(Lz * Ez, Iz),
                bits, group_size,
            ).reshape(Lz, Ez, Iz)                                     # [L,E,I]
        else:
            s_gu = search_scales(layers["gate_up_w"], stats["gate_up_in"],
                                 bits, group_size)                    # [L, H]
            s_down = search_scales(layers["down_w"], stats["down_in"],
                                   bits, group_size)                  # [L, I]
        s_kv = s_o.reshape(-1, Nq, D)[:, ::rep].reshape(-1, Nk * D)   # [L, Nk*D]

        def fold_layer(args):
            """One layer's folds — under lax.map so the f32 working set
            stays one layer large."""
            lp, sq, so, sg, sd, skv = args
            new = dict(lp)
            # qkv fold: rows * s_qkv, input_ln / s_qkv; v COLUMNS / s_kv
            # (o_w input channel (h, d) is fed by v channel (h // rep, d))
            qkv = lp["qkv_w"].astype(jnp.float32) * sq[:, None]
            qkv = qkv.at[:, q_dim + Nk * D :].set(
                qkv[:, q_dim + Nk * D :] / skv[None, :]
            )
            new["qkv_w"] = qkv.astype(dt)
            new["input_ln"] = (
                lp["input_ln"].astype(jnp.float32) / sq
            ).astype(dt)
            if "qkv_b" in lp:
                b = lp["qkv_b"].astype(jnp.float32)
                new["qkv_b"] = b.at[q_dim + Nk * D :].set(
                    b[q_dim + Nk * D :] / skv
                ).astype(dt)
            new["o_w"] = (
                lp["o_w"].astype(jnp.float32) * so[:, None]
            ).astype(dt)
            if "router_w" in lp:
                # MoE folds: post_ln / sg is shared by router + experts,
                # so the router rows scale UP by sg (logits unchanged);
                # sd is per-expert [E, I]
                new["router_w"] = (
                    lp["router_w"].astype(jnp.float32) * sg[:, None]
                ).astype(dt)
                gu = (lp["moe_gate_up_w"].astype(jnp.float32)
                      * sg[None, :, None])
                half = gu.shape[-1] // 2
                gu = gu.at[..., half:].set(
                    gu[..., half:] / sd[:, None, :]
                )
                new["moe_gate_up_w"] = gu.astype(dt)
                new["post_ln"] = (
                    lp["post_ln"].astype(jnp.float32) / sg
                ).astype(dt)
                new["moe_down_w"] = (
                    lp["moe_down_w"].astype(jnp.float32) * sd[:, :, None]
                ).astype(dt)
                return new
            # mlp folds: post_ln <-> gate_up rows; up columns <-> down rows
            gu = lp["gate_up_w"].astype(jnp.float32) * sg[:, None]
            half = gu.shape[-1] // 2
            gu = gu.at[:, half:].set(gu[:, half:] / sd[None, :])
            new["gate_up_w"] = gu.astype(dt)
            new["post_ln"] = (
                lp["post_ln"].astype(jnp.float32) / sg
            ).astype(dt)
            new["down_w"] = (
                lp["down_w"].astype(jnp.float32) * sd[:, None]
            ).astype(dt)
            return new

        out = dict(params)
        out["layers"] = jax.lax.map(
            fold_layer, (dict(layers), s_qkv, s_o, s_gu, s_down, s_kv)
        )

        # head fold
        head = params.get("lm_head")
        if head is None and "embed" in params:
            head = params["embed"].T
        if head is not None:
            s_head = search_scales(
                head[None], stats["head_in"][None], bits, group_size,
            )[0]
            out["lm_head"] = (head.astype(jnp.float32)
                              * s_head[:, None]).astype(dt)
            out["final_ln"] = (
                params["final_ln"].astype(jnp.float32) / s_head
            ).astype(dt)
        return out

    return fold(params)


# Compact built-in calibration corpus: mixed register English + code +
# numerals, enough signal to expose salient channels when the caller has
# no corpus on hand. Real deployments should pass their own text.
DEFAULT_CALIB_TEXT = (
    "The transformer architecture processes sequences of tokens through "
    "stacked layers of self-attention and feed-forward networks. Each "
    "attention head computes a weighted average over earlier positions; "
    "the weights come from a softmax over scaled dot products.\n"
    "def attention(q, k, v, mask):\n"
    "    scores = q @ k.T / math.sqrt(d)\n"
    "    scores = scores.masked_fill(mask == 0, float('-inf'))\n"
    "    return softmax(scores, dim=-1) @ v\n"
    "In 1868, the first practical typewriter reached production; by 1910 "
    "over two million units had been sold at prices from $60 to $125.\n"
    "for i in range(len(xs)):\n"
    "    total += xs[i] * weights[i % len(weights)]\n"
    "The quick brown fox jumps over the lazy dog. Pack my box with five "
    "dozen liquor jugs. 0 1 2 3 4 5 6 7 8 9 10 42 1729 65536.\n"
    "Les mots français portent des accents: été, naïve, cœur, garçon.\n"
    "SELECT name, COUNT(*) FROM users WHERE active GROUP BY name;\n"
    "E = mc^2; F = ma; PV = nRT; entropy never decreases in a closed "
    "system, and information is physical.\n"
)


def default_calib_ids(tokenizer, n_tokens: int = 2048,
                      path: Optional[str] = None, seq_len: int = 512):
    """Tokenize a calibration corpus into a [B, S] id batch. `path` reads
    a UTF-8 text file; otherwise the built-in sample corpus is repeated
    to length. Returns a numpy int32 array."""
    import numpy as np

    if path is not None:
        with open(path, "r", encoding="utf-8") as f:
            text = f.read()
    else:
        text = DEFAULT_CALIB_TEXT
    ids = tokenizer.encode(text)
    while len(ids) < n_tokens:
        ids = ids + ids
    ids = ids[:n_tokens]
    S = min(seq_len, len(ids))
    B = max(1, len(ids) // S)
    return np.asarray(ids[: B * S], dtype=np.int32).reshape(B, S)


def awq_policy(awq_flag, bits: int, layers) -> tuple:
    """THE single decision point for 'does AWQ apply here': returns
    (awq_on, layout_ok). awq_flag None = auto (on for int4 — the
    PPL_GATE-passing shipped default); layout needs the causal_lm keys,
    dense-MLP or MoE (gpt2 has neither). Shared by the engine and the
    evaluate CLI so the two can never quantize differently."""
    on = awq_flag if awq_flag is not None else bits == 4
    dense = all(k in layers for k in ("qkv_w", "gate_up_w", "down_w"))
    moe = all(k in layers for k in
              ("qkv_w", "router_w", "moe_gate_up_w", "moe_down_w"))
    return on, dense or moe


def awq_quantize_params(
    params: Dict,
    cfg,
    calib_ids,             # [B, S] calibration token ids (np or jnp)
    bits: int = 4,
    group_size: int = 128,
    quantize_lm_head: bool = True,
) -> Dict:
    """Calibrate → fold → quantize, in one call. The single entry point
    the engine and the ppl gate use."""
    from tinygpt_tpu.ops.quant import quantize_params

    stats = collect_act_stats(params, cfg, jnp.asarray(calib_ids))
    folded = apply_awq(params, cfg, stats, bits=bits, group_size=group_size)
    return quantize_params(folded, bits=bits, group_size=group_size,
                           quantize_lm_head=quantize_lm_head)
