"""Attention over a static-shape KV cache (jnp reference path).

TPU-native replacement for the reference's flashAttention/sdpAttention
calls (/root/reference/src/layer/Attention.h:103-112,
src/model/ModelGPT2.h:71-79). Where the reference concatenates the whole
KV cache every step (CacheManager.h:24-42, the O(seq²) hot spot), this path
writes new K/V into a preallocated buffer with dynamic_update_slice and
masks invalid slots — static shapes, one jit trace for every step.

The Pallas flash/paged kernels in ops/flash_attention.py and
ops/decode_attention.py supersede this on the hot path; this version is
the numerics oracle and the fallback for odd head dims.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def sdpa_with_cache(
    q: jnp.ndarray,  # [B, S, Nq, D] (RoPE already applied)
    k_cache: jnp.ndarray,  # [B, Nk, T, D] full cache buffer
    v_cache: jnp.ndarray,  # [B, Nk, T, D]
    q_pos: jnp.ndarray,  # [B, S] logical position of each query token
    kv_pos: jnp.ndarray,  # [B, T] logical position of each cache slot
    kv_valid: jnp.ndarray,  # [B, T] bool: slot holds a real token
    scale: float | None = None,
    soft_cap: float | None = None,
    sliding_window: int | None = None,
) -> jnp.ndarray:
    """Grouped-query attention of S query tokens against the cache.

    Causality runs in LOGICAL position space: a query at position p sees
    key slots with kv_pos <= p and kv_valid (left-pad slots are invalid,
    so their kv_pos never matters). With a sliding window w, additionally
    kv_pos > p - w. Returns [B, S, Nq, D].
    """
    B, S, Nq, D = q.shape
    Nk, T = k_cache.shape[1], k_cache.shape[2]
    G = Nq // Nk
    if scale is None:
        scale = D ** -0.5

    qg = q.reshape(B, S, Nk, G, D)
    # scores: [B, Nk, G, S, T]
    scores = jnp.einsum(
        "bskgd,bktd->bkgst", qg.astype(jnp.float32),
        k_cache.astype(jnp.float32),
    ) * scale
    if soft_cap is not None:
        scores = soft_cap * jnp.tanh(scores / soft_cap)

    t_pos = kv_pos[:, None, :]  # [B, 1, T]
    p = q_pos[:, :, None]  # [B, S, 1]
    causal = t_pos <= p  # [B, S, T]
    if sliding_window is not None:
        causal &= t_pos > p - sliding_window
    mask = causal & kv_valid[:, None, :]  # [B, S, T]
    scores = jnp.where(mask[:, None, None, :, :], scores, NEG_INF)

    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bkgst,bktd->bskgd", probs, v_cache.astype(jnp.float32)
    )
    return out.reshape(B, S, Nq, D).astype(q.dtype)


def sdpa_decode_frozen(
    q: jnp.ndarray,        # [B, 1, Nq, D] (RoPE applied)
    k_frozen: jnp.ndarray,  # [B, Nk, T, D] cache as of chunk start (FROZEN)
    v_frozen: jnp.ndarray,  # [B, Nk, T, D]
    kv_pos: jnp.ndarray,    # [B, T] logical position per frozen slot
    kv_valid: jnp.ndarray,  # [B, T] frozen-slot validity (chunk start)
    k_infl: jnp.ndarray,    # [B, Nk, N, D] in-flight K (this chunk's tokens)
    v_infl: jnp.ndarray,    # [B, Nk, N, D]
    step: jnp.ndarray,      # scalar int32: index of the CURRENT token in
                            # the in-flight buffer (slots 0..step are real)
    q_pos: jnp.ndarray,     # [B, 1]
    scale: float | None = None,
    sliding_window: int | None = None,
    k_transposed: bool = False,
) -> jnp.ndarray:
    """Decode attention for a chunked scan that does NOT rewrite the big
    cache every step: the chunk's new K/V accumulate in a tiny in-flight
    buffer and the main cache stays a loop invariant.

    Why: carrying the full [L,B,Nk,T,D] cache through the per-step scan
    makes XLA round-trip its bytes (profiled: two ~820 us copies per
    Mistral-7B step at T=1024 — ~17% of the step). Freezing it leaves only
    the unavoidable attention reads.

    In-flight slot j holds the token at logical position q_pos - (step-j);
    all slots j <= step are causally visible (window permitting).

    k_transposed=True reads k_frozen as [B, Nk, D, T] — the layout the
    scores dot wants on the MXU. Feeding the natural [B, Nk, T, D] makes
    XLA materialize a TRANSPOSED COPY of every layer's K inside the scan
    (profiled ~71 us/layer at Mistral-7B/T=1024); callers that run many
    steps should transpose K once per chunk instead (decode_steps does)."""
    B, S, Nq, D = q.shape
    if k_transposed:
        Nk, T = k_frozen.shape[1], k_frozen.shape[3]
    else:
        Nk, T = k_frozen.shape[1], k_frozen.shape[2]
    N = k_infl.shape[2]
    G = Nq // Nk
    if scale is None:
        scale = D ** -0.5

    # bf16 operands + f32 accumulation (preferred_element_type): the MXU
    # runs bf16 natively; casting K to f32 would either materialize a
    # 2x-sized copy or force half-rate f32 MXU passes. Scores/probs stay
    # f32 throughout. An fp8 cache is upcast to bf16 inside the dot (the
    # convert fuses); q/probs are never narrowed below bf16.
    cdt = k_frozen.dtype
    if jnp.dtype(cdt).itemsize < 2:
        cdt = jnp.bfloat16
    if jax.default_backend() != "tpu":
        cdt = jnp.float32  # CPU XLA has no BF16xBF16=F32 dot thunk
    qg = q.reshape(B, 1, Nk, G, D).astype(cdt)
    if k_transposed:
        sf = jnp.einsum("bskgd,bkdt->bkgst", qg, k_frozen.astype(cdt),
                        preferred_element_type=jnp.float32) * scale
    else:
        sf = jnp.einsum("bskgd,bktd->bkgst", qg, k_frozen.astype(cdt),
                        preferred_element_type=jnp.float32) * scale
    si = jnp.einsum("bskgd,bkjd->bkgsj", qg, k_infl.astype(cdt),
                    preferred_element_type=jnp.float32) * scale

    p = q_pos[:, :, None]                      # [B, 1, 1]
    t_pos = kv_pos[:, None, :]                 # [B, 1, T]
    mask_f = (t_pos <= p) & kv_valid[:, None, :]
    j = jnp.arange(N, dtype=jnp.int32)
    mask_i = j <= step                         # [N]
    if sliding_window is not None:
        mask_f &= t_pos > p - sliding_window
        mask_i &= (step - j) < sliding_window
    sf = jnp.where(mask_f[:, None, None, :, :], sf, NEG_INF)
    si = jnp.where(mask_i[None, None, None, None, :], si, NEG_INF)

    s_all = jnp.concatenate([sf, si], axis=-1)
    probs = jax.nn.softmax(s_all, axis=-1)
    pf, pi = probs[..., :T], probs[..., T:]
    out = jnp.einsum("bkgst,bktd->bskgd", pf.astype(cdt),
                     v_frozen.astype(cdt),
                     preferred_element_type=jnp.float32)
    out = out + jnp.einsum("bkgsj,bkjd->bskgd",
                           pi.astype(cdt), v_infl.astype(cdt),
                           preferred_element_type=jnp.float32)
    return out.reshape(B, 1, Nq, D).astype(q.dtype)


def attention_with_cache(
    q: jnp.ndarray,         # [B, S, Nq, D]
    k_cache: jnp.ndarray,   # [B, Nk, T, D]
    v_cache: jnp.ndarray,   # [B, Nk, T, D]
    q_pos: jnp.ndarray,     # [B, S]
    kv_pos: jnp.ndarray,    # [B, T]
    kv_valid: jnp.ndarray,  # [B, T]
    slot: jnp.ndarray,      # scalar int32 — slot of the first query row
    scale: float | None = None,
    sliding_window: int | None = None,
    kernel: str = "xla",    # "xla" | "pallas" (static under jit)
) -> jnp.ndarray:
    """Dispatch between the XLA oracle path and the Pallas kernels.

    The Pallas path exploits the slot/position split: within a row every
    token shares one pad offset, so logical causality equals slot-index
    causality (offsets cancel) — the kernels take only a validity byte
    per slot plus the scalar first-query slot.
    """
    if kernel != "pallas":
        return sdpa_with_cache(
            q, k_cache, v_cache, q_pos=q_pos, kv_pos=kv_pos,
            kv_valid=kv_valid, scale=scale, sliding_window=sliding_window,
        )
    from tinygpt_tpu.ops.attention_kernels import flash_decode, flash_prefill

    B, S, Nq, D = q.shape
    T = k_cache.shape[2]
    if scale is None:
        scale = D ** -0.5
    # q stays in a >=16-bit dtype: casting it to an fp8 KV-cache dtype
    # would throw away query precision for no bandwidth win (q is tiny)
    q_dt = q.dtype if jnp.dtype(q.dtype).itemsize >= 2 else jnp.bfloat16
    if S == 1:
        # Single-token decode goes through XLA: measured on v5e it matches
        # or beats the Pallas decode kernel (318 vs 359 us at T=2048 —
        # decode attention is a sliver of the weight-bound step either
        # way), and XLA handles fp8 caches and odd head dims uniformly.
        # flash_decode remains available for explicit use.
        return sdpa_with_cache(
            q, k_cache, v_cache, q_pos=q_pos, kv_pos=kv_pos,
            kv_valid=kv_valid, scale=scale, sliding_window=sliding_window,
        )
    out = flash_prefill(
        q.transpose(0, 2, 1, 3).astype(q_dt), k_cache, v_cache,
        kv_valid, scale=scale, sliding_window=sliding_window,
        q_slot=slot,
    )
    return out.transpose(0, 2, 1, 3).astype(q.dtype)
