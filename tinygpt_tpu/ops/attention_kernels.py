"""Pallas TPU attention kernels: flash prefill + GQA decode.

TPU-native replacement for TinyFA's CUDA flash attention
(/root/reference/src/layer/Attention.h:103-112, head dims 64/128 at
src/CMakeLists.txt:17-23) — here any head dim that tiles to 128 lanes.

Both kernels run over the engine's dense slot cache. Causality uses SLOT
indices: with left padding, every token in a row shares one pad offset, so
(logical kv_pos <= logical q_pos) ⟺ (kv slot <= q slot) — the offsets
cancel. Slot indices come from program_id iota; the only mask input is a
per-slot validity byte [B, 1, T] (pads = 0), so no position tensors are
relayouted inside the kernel. Sliding windows work the same way (slot
deltas == logical deltas within a row).

Prefill:  grid (B, Nq, S/BQ, T/BT), online softmax (m, l, acc scratch),
          fully-masked KV tiles are skipped (causal upper triangle).
Decode:   grid (B, Nk, T/BT); the G = Nq/Nk query heads that share a KV
          head form the 'row' axis of one MXU tile — S=1 decode becomes a
          [G, D] x [D, BT] matmul, not a vector op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _e4m3_expand_f32(raw_i8: jnp.ndarray) -> jnp.ndarray:
    """Expand float8_e4m3fn RAW BYTES (loaded as int8) to f32 with
    integer ops — exact for normals, subnormals, and zeros.

    Mosaic scalarizes fp8 VMEM loads (measured 66 GB/s vs ~500 bf16,
    round-4 README routing note), but int8 loads run at full rate — so
    the fp8 cache is BITCAST to int8 outside the kernel and the e4m3
    decode happens on the VPU: a normal (exp field e>=1) maps to the f32
    bit pattern ((mag << 20) + (120 << 23)) — the e4m3 mantissa's 3 bits
    land in the f32 mantissa's top bits and the +120 rebias turns the
    4-bit exponent into f32's 8-bit one; subnormals are m * 2^-9 computed
    arithmetically (an integer->float convert is exact) to avoid f32
    subnormal intermediates, which TPU flushes to zero. e4m3fn NaN (mag
    0x7F) maps to a large finite — KV quantization never writes NaN."""
    i = raw_i8.astype(jnp.int32)  # sign-extends: i < 0 iff sign bit set
    mag = i & 0x7F
    nrm = jax.lax.bitcast_convert_type(
        (mag << 20) + (120 << 23), jnp.float32)
    sub = mag.astype(jnp.float32) * (2.0 ** -9)  # covers mag == 0 exactly
    f = jnp.where(mag >= 8, nrm, sub)
    return jnp.where(i < 0, -f, f)


def _pick_bt(T: int, target: int) -> int:
    """KV-tile length: the largest multiple of 128 that divides T, at
    most `target`, else T itself (one full tile). Two constraints meet
    here: KV tiles MUST tile T exactly (an out-of-bounds tail tile reads
    unspecified K/V, and even fully-masked columns poison the output
    through 0 * NaN in the p @ v contraction), and the 1-D validity
    vector's block (1, 1, bt) needs bt % 128 == 0 or bt == T (Mosaic's
    lane-dim rule)."""
    best = 0
    for bt in range(128, min(T, target) + 1, 128):
        if T % bt == 0:
            best = bt
    return best if best else T


# -- prefill ------------------------------------------------------------------


def _prefill_kernel(
    q_ref,      # [1, 1, BQ, D]
    k_ref,      # [1, 1, BT, D]
    v_ref,      # [1, 1, BT, D]
    valid_ref,  # [1, 1, BT] int8
    slot_ref,   # [1, 1] int32 SMEM — slot of the first query row
    o_ref,      # [1, 1, BQ, D]
    m_scr,      # [BQ, 128] f32
    l_scr,      # [BQ, 128] f32
    acc_scr,    # [BQ, D] f32
    *,
    scale: float,
    n_t: int,
    bq: int,
    bt: int,
    sliding_window,
):
    iq = pl.program_id(2)
    jt = pl.program_id(3)

    @pl.when(jt == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # slot coordinates of this tile
    q_start = slot_ref[0, 0] + iq * bq
    t_start = jt * bt

    # skip KV tiles entirely above the causal diagonal
    not_all_masked = t_start <= q_start + bq - 1

    @pl.when(not_all_masked)
    def _():
        q = q_ref[0, 0].astype(jnp.float32)  # [BQ, D]
        k = k_ref[0, 0].astype(jnp.float32)  # [BT, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [BQ, BT]

        rows = q_start + jax.lax.broadcasted_iota(jnp.int32, (bq, bt), 0)
        cols = t_start + jax.lax.broadcasted_iota(jnp.int32, (bq, bt), 1)
        mask = cols <= rows
        if sliding_window is not None:
            mask &= cols > rows - sliding_window
        mask &= valid_ref[0, 0][None, :] != 0
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:, :1]  # [BQ, 1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)  # [BQ, BT]
        alpha = jnp.exp(m_prev - m_new)  # [BQ, 1]
        l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p, v_ref[0, 0].astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(jt == n_t - 1)
    def _():
        l = l_scr[:, :1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[:] / safe_l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "sliding_window", "bq", "bt", "interpret"),
)
def flash_prefill(
    q: jnp.ndarray,        # [B, Nq, S, D]
    k_cache: jnp.ndarray,  # [B, Nk, T, D]
    v_cache: jnp.ndarray,  # [B, Nk, T, D]
    valid: jnp.ndarray,    # [B, T] bool/int8 — slot holds a real token
    scale: float,
    q_slot=0,              # scalar int32 — slot index of the first query row
    sliding_window=None,
    bq: int = 256,
    bt: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    B, Nq, S, D = q.shape
    Nk, T = k_cache.shape[1], k_cache.shape[2]
    G = Nq // Nk
    bq = min(bq, S)
    bt = _pick_bt(T, bt)
    n_q, n_t = _cdiv(S, bq), T // bt
    valid8 = valid.astype(jnp.int8).reshape(B, 1, T)
    slot_arr = jnp.asarray(q_slot, jnp.int32).reshape(1, 1)

    kernel = functools.partial(
        _prefill_kernel, scale=scale, n_t=n_t, bq=bq, bt=bt,
        sliding_window=sliding_window,
    )
    return pl.pallas_call(
        kernel,
        grid=(B, Nq, n_q, n_t),
        in_specs=[
            pl.BlockSpec((1, 1, bq, D), lambda b, h, iq, jt: (b, h, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bt, D),
                         lambda b, h, iq, jt, _G=G: (b, h // _G, jt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bt, D),
                         lambda b, h, iq, jt, _G=G: (b, h // _G, jt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bt), lambda b, h, iq, jt: (b, 0, jt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b, h, iq, jt: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, bq, D), lambda b, h, iq, jt: (b, h, iq, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Nq, S, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Nq * S * T * D,
            bytes_accessed=(q.size + 2 * k_cache.size) * 2,
            transcendentals=B * Nq * S * T,
        ),
        interpret=interpret,
    )(q, k_cache, v_cache, valid8, slot_arr)


# -- decode -------------------------------------------------------------------


def _decode_kernel(
    q_ref,      # [1, 1, G, D]
    k_ref,      # [1, 1, BT, D]
    v_ref,      # [1, 1, BT, D]
    mask_ref,   # [1, 1, BT] int8 — validity (incl. window) precomputed
    o_ref,      # [1, 1, G, D]
    m_scr,      # [G, 128]
    l_scr,      # [G, 128]
    acc_scr,    # [G, D]
    *,
    scale: float,
    n_t: int,
):
    jt = pl.program_id(2)

    @pl.when(jt == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0].astype(jnp.float32)  # [G, D]
    k = k_ref[0, 0].astype(jnp.float32)  # [BT, D]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [G, BT]
    s = jnp.where(mask_ref[0, 0][None, :] != 0, s, NEG_INF)

    m_prev = m_scr[:, :1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p, v_ref[0, 0].astype(jnp.float32),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(jt == n_t - 1)
    def _():
        l = l_scr[:, :1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[:] / safe_l).astype(o_ref.dtype)


def _decode_frozen_kernel(
    s_ref,      # SMEM [2] int32: [layer, step]
    q_ref,      # [1, Nk, G, D]
    k_ref,      # [1, 1, Nk, BT, D] — layer slab of the STACKED frozen cache
    v_ref,      # [1, 1, Nk, BT, D]
    mask_ref,   # [1, 1, BT] int8 — frozen validity (incl. window), per step
    ik_ref,     # [1, Nk, N, D] — this layer's in-flight K (chunk tokens)
    iv_ref,     # [1, Nk, N, D]
    o_ref,      # [1, Nk, G, D]
    m_scr, l_scr, acc_scr,  # [Nk*G, 128] x2, [Nk*G, D]
    *,
    scale: float,
    n_t: int,
    n_kv: int,
    window,     # Optional[int] — sliding window for the in-flight mask
    kv_e4m3: bool = False,  # frozen K/V are e4m3 bytes bitcast to int8
):
    # Grid is (B, T/BT): one KV tile carries ALL Nk heads (≈1 MB DMAs —
    # a per-(b, head) grid issues 8x smaller transfers and goes
    # latency-bound). Only the MXU dots unroll over heads; every VPU op
    # (mask, exp, max, sum, rescale) runs once on the stacked
    # [Nk*G, BT] tile — a per-head loop over [G<=8, BT] slivers was
    # measured compute-bound at ~97 us/layer vs the DMA's ~48.
    jt = pl.program_id(1)
    G = q_ref.shape[2]
    R = n_kv * G

    @pl.when(jt == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    def dots(x_rows, kv_ref, idx, contract, expand=False):
        """Per-head MXU dots, rows stacked to [Nk*G, cols]."""
        outs = []
        for h in range(n_kv):
            tile = kv_ref[idx + (h,)]
            tile = (_e4m3_expand_f32(tile) if expand
                    else tile.astype(jnp.float32))
            outs.append(jax.lax.dot_general(
                x_rows[h * G : (h + 1) * G], tile,
                ((contract, ((), ()))),
                preferred_element_type=jnp.float32,
            ))
        return jnp.concatenate(outs, axis=0)

    q = q_ref[0].astype(jnp.float32).reshape(R, q_ref.shape[3])
    s = dots(q, k_ref, (0, 0), ((1,), (1,)), expand=kv_e4m3) * scale
    s = jnp.where(mask_ref[0, 0][None, :] != 0, s, NEG_INF)  # [R, BT]

    m_prev = m_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc = acc_scr[:] * alpha + dots(p, v_ref, (0, 0), ((1,), (0,)),
                                    expand=kv_e4m3)

    @pl.when(jt < n_t - 1)
    def _():
        acc_scr[:] = acc
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(jt == n_t - 1)
    def _():
        # fold in the in-flight block (slots 0..step visible)
        step = s_ref[1]
        N = ik_ref.shape[2]
        si = dots(q, ik_ref, (0,), ((1,), (1,))) * scale  # [R, N]
        j = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
        mi = j <= step
        if window is not None:
            mi &= (step - j) < window
        si = jnp.where(mi, si, NEG_INF)

        m2 = jnp.maximum(m_new, jnp.max(si, axis=1, keepdims=True))
        pi = jnp.exp(si - m2)
        alpha2 = jnp.exp(m_new - m2)
        l2 = l_new * alpha2 + jnp.sum(pi, axis=1, keepdims=True)
        acc2 = acc * alpha2 + dots(pi, iv_ref, (0,), ((1,), (0,)))
        safe_l = jnp.where(l2 == 0.0, 1.0, l2)
        o_ref[0] = (acc2 / safe_l).reshape(o_ref.shape[1:]).astype(
            o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "window", "bt", "interpret")
)
def flash_decode_frozen(
    q: jnp.ndarray,        # [B, Nq, D] — single query position
    k_stack: jnp.ndarray,  # [L, B, Nk, T, D] FROZEN stacked cache
    v_stack: jnp.ndarray,  # [L, B, Nk, T, D]
    mask: jnp.ndarray,     # [B, T] bool — frozen validity & window & causal
    k_infl: jnp.ndarray,   # [B, Nk, N, D] — this layer's in-flight K
    v_infl: jnp.ndarray,   # [B, Nk, N, D]
    l: jnp.ndarray,        # scalar int32 layer index
    step: jnp.ndarray,     # scalar int32 current in-flight slot
    scale: float,
    window=None,           # Optional[int] sliding window
    bt: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Decode attention for the frozen-cache chunked scan, reading layer
    `l` of the STACKED cache via a prefetched scalar index.

    This exists for the same reason as the stacked dequant matmuls
    (ops/quant_kernels.py): inside a lax.scan over layers XLA materializes
    a copy of each layer's K/V before any custom call or einsum that
    can't fuse the slice (profiled ~55 us/layer at Mistral-7B/T=1024 =
    1.8 ms/step). The kernel's index_map reads the stacked buffer
    directly. The chunk's in-flight K/V (see causal_lm.decode_steps) are
    folded in with one extra online-softmax block."""
    B, Nq, D = q.shape
    L, _, Nk, T, _ = k_stack.shape
    N = k_infl.shape[2]
    G = Nq // Nk
    bt = _pick_bt(T, bt)
    n_t = T // bt
    q4 = q.reshape(B, Nk, G, D)
    mask8 = mask.astype(jnp.int8).reshape(B, 1, T)
    scalars = jnp.stack([jnp.asarray(l, jnp.int32),
                         jnp.asarray(step, jnp.int32)])

    kv_e4m3 = k_stack.dtype == jnp.float8_e4m3fn
    if kv_e4m3:
        # Mosaic fp8 VMEM loads scalarize; int8 loads run at full rate —
        # ship the raw bytes and decode on the VPU (_e4m3_expand_f32)
        k_stack = jax.lax.bitcast_convert_type(k_stack, jnp.int8)
        v_stack = jax.lax.bitcast_convert_type(v_stack, jnp.int8)

    kernel = functools.partial(_decode_frozen_kernel, scale=scale, n_t=n_t,
                               n_kv=Nk, window=window, kv_e4m3=kv_e4m3)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_t),
        in_specs=[
            pl.BlockSpec((1, Nk, G, D), lambda b, jt, s: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Nk, bt, D),
                         lambda b, jt, s: (s[0], b, 0, jt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Nk, bt, D),
                         lambda b, jt, s: (s[0], b, 0, jt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bt), lambda b, jt, s: (b, 0, jt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nk, N, D), lambda b, jt, s: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nk, N, D), lambda b, jt, s: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, Nk, G, D), lambda b, jt, s: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((Nk * G, 128), jnp.float32),
            pltpu.VMEM((Nk * G, 128), jnp.float32),
            pltpu.VMEM((Nk * G, D), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Nk, G, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Nq * (T + N) * D,
            bytes_accessed=2 * B * Nk * T * D * 2,
            transcendentals=B * Nq * (T + N),
        ),
        compiler_params=pltpu.CompilerParams(
            # b rows are independent; the T tiles accumulate the online
            # softmax in order
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(scalars, q4, k_stack, v_stack, mask8, k_infl, v_infl)
    return out.reshape(B, Nq, D)


@functools.partial(
    jax.jit, static_argnames=("scale", "bt", "interpret")
)
def flash_decode(
    q: jnp.ndarray,        # [B, Nq, D] — single query position
    k_cache: jnp.ndarray,  # [B, Nk, T, D]
    v_cache: jnp.ndarray,  # [B, Nk, T, D]
    mask: jnp.ndarray,     # [B, T] bool — valid & window, precomputed
    scale: float,
    bt: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    B, Nq, D = q.shape
    Nk, T = k_cache.shape[1], k_cache.shape[2]
    G = Nq // Nk
    bt = _pick_bt(T, bt)
    n_t = T // bt
    q4 = q.reshape(B, Nk, G, D)
    mask8 = mask.astype(jnp.int8).reshape(B, 1, T)

    kernel = functools.partial(_decode_kernel, scale=scale, n_t=n_t)
    out = pl.pallas_call(
        kernel,
        grid=(B, Nk, n_t),
        in_specs=[
            pl.BlockSpec((1, 1, G, D), lambda b, h, jt: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bt, D), lambda b, h, jt: (b, h, jt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bt, D), lambda b, h, jt: (b, h, jt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bt), lambda b, h, jt: (b, 0, jt),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, G, D), lambda b, h, jt: (b, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Nk, G, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((G, 128), jnp.float32),
            pltpu.VMEM((G, 128), jnp.float32),
            pltpu.VMEM((G, D), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Nq * T * D,
            bytes_accessed=2 * k_cache.size * 2,
            transcendentals=B * Nq * T,
        ),
        interpret=interpret,
    )(q4, k_cache, v_cache, mask8)
    return out.reshape(B, Nq, D)
