"""Pallas TPU kernels for MoE decode: gathered-expert matmul.

The dense-over-experts formulation (causal_lm.moe_mlp) reads EVERY
expert's weights each step — E/k more HBM traffic than the routing
actually needs. Decode is HBM-bound, so for small batches (B*k < E)
streaming only the ROUTED experts' weights multiplies throughput.

The TPU-native trick is the same one the stacked dequant kernels use
(ops/quant_kernels.py): the weights stay WHOLE in HBM as [L, E, IN, OUT]
and the (layer, expert) indices arrive as PREFETCHED SCALARS consumed by
the BlockSpec index_maps — each grid step's DMA fetches the selected
expert's tile directly, no gather materialization, no scan-slice copy.

Layout notes:
- Every token-slot row (one (token, routed-expert) pair) is its own grid
  row; rows are [R, 1, IN] with a singleton middle dim so the (1, bk)
  block's sublane dim legally equals the array dim (Mosaic requires the
  second-to-last block dim to divide 8 or equal the array dim).
- M=1 GEMV tiles waste MXU rows, which is irrelevant here: decode is
  bandwidth-bound and the weight stream dominates.

`moe_mlp_gathered` is the routed-MLP wrapper (router + two gathered
matmuls + weighted slot sum); `causal_lm.moe_mlp`'s dense path is its
oracle, tested 1:1 in interpret mode (tests/test_moe_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return (a + b - 1) // b


def _kernel(s_ref, x_ref, w_ref, o_ref, acc_ref, *, n_k: int):
    """One (row-slot, out-tile, k-tile) step: acc += x[0] @ w[0, 0]."""
    del s_ref
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[0].astype(jnp.float32)          # [1, bk]
    w = w_ref[0, 0].astype(jnp.float32)       # [bk, bo]
    acc_ref[0:1] += jnp.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[0] = acc_ref[0:1].astype(o_ref.dtype)


def moe_gather_matmul(
    x: jnp.ndarray,      # [R, IN] — one row per (token, expert-slot)
    w: jnp.ndarray,      # [L, E, IN, OUT] stacked expert weights (bf16)
    l,                   # scalar int32 traced layer index
    idx: jnp.ndarray,    # [R] int32 routed expert per row
    bk: int = 512,
    bo: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[r] = x[r] @ w[l, idx[r]] — expert selection via scalar
    prefetch, weights streamed straight from HBM."""
    R, IN = x.shape
    L, E, _, OUT = w.shape
    bk = min(bk, IN)
    while IN % bk:
        bk //= 2
    bo = min(bo, OUT)
    while OUT % bo:
        bo //= 2
    n_o, n_k = _cdiv(OUT, bo), IN // bk

    scalars = jnp.concatenate(
        [jnp.asarray(l, jnp.int32).reshape(1), idx.astype(jnp.int32)]
    )  # [1 + R]: layer first, then per-row expert ids

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R, n_o, n_k),
        in_specs=[
            pl.BlockSpec((1, 1, bk), lambda r, o, k, s: (r, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, bo),
                         lambda r, o, k, s: (s[0], s[1 + r], k, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bo), lambda r, o, k, s: (r, 0, o),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, bo), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, n_k=n_k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, 1, OUT), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * R * IN * OUT,
            bytes_accessed=R * (IN + OUT) * 2 + R * IN * OUT * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(scalars, x.reshape(R, 1, IN), w)
    return out.reshape(R, OUT)


def _int4_kernel_moe(s_ref, x_lo_ref, x_hi_ref, w_ref, s_lo_ref, s_hi_ref,
                     o_ref, acc_ref, *, n_k: int, group: int,
                     full_scales: bool):
    """Gathered-expert int4 dequant GEMV: one (row-slot, out, k) step of
    the biased-nibble half-split math (quant_kernels._int4_kernel_stacked
    adapted to single-row blocks with the expert dim indexed away by the
    BlockSpec)."""
    del s_ref
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    packed = w_ref[0, 0].astype(jnp.int32)   # [bk, bo]
    bkp, bo = packed.shape
    rows = bkp // group
    lo = (packed & 0x0F).astype(jnp.float32)
    hi = ((packed >> 4) & 0x0F).astype(jnp.float32)

    x_lo = x_lo_ref[0].astype(jnp.float32)   # [1, bk]
    x_hi = x_hi_ref[0].astype(jnp.float32)
    s_lo = s_lo_ref[0, 0].astype(jnp.float32)
    s_hi = s_hi_ref[0, 0].astype(jnp.float32)
    hi_off = rows if full_scales else 0
    acc = acc_ref[0:1]
    for r in range(rows):
        sl = slice(r * group, (r + 1) * group)
        xs_lo = jnp.sum(x_lo[:, sl], axis=1, keepdims=True)
        xs_hi = jnp.sum(x_hi[:, sl], axis=1, keepdims=True)
        acc = acc + s_lo[r][None, :] * (
            jnp.dot(x_lo[:, sl], lo[sl, :],
                    preferred_element_type=jnp.float32) - 8.0 * xs_lo
        )
        acc = acc + s_hi[hi_off + r][None, :] * (
            jnp.dot(x_hi[:, sl], hi[sl, :],
                    preferred_element_type=jnp.float32) - 8.0 * xs_hi
        )
    acc_ref[0:1] = acc

    @pl.when(k == n_k - 1)
    def _():
        o_ref[0] = acc_ref[0:1].astype(o_ref.dtype)


def _int8_kernel_moe(s_ref, x_ref, w_ref, sc_ref, o_ref, acc_ref, *,
                     n_k: int, group: int):
    """Gathered-expert int8 dequant GEMV (per-group scales, same grouped
    structure as quant_kernels._int8_kernel_stacked, single-row blocks)."""
    del s_ref
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[0, 0].astype(jnp.float32)      # [bk, bo]
    bk, bo = w.shape
    rows = bk // group
    x = x_ref[0].astype(jnp.float32)         # [1, bk]
    sc = sc_ref[0, 0].astype(jnp.float32)    # [rows, bo]
    acc = acc_ref[0:1]
    for r in range(rows):
        sl = slice(r * group, (r + 1) * group)
        acc = acc + sc[r][None, :] * jnp.dot(
            x[:, sl], w[sl, :], preferred_element_type=jnp.float32
        )
    acc_ref[0:1] = acc

    @pl.when(k == n_k - 1)
    def _():
        o_ref[0] = acc_ref[0:1].astype(o_ref.dtype)


def moe_gather_matmul_int8(
    x: jnp.ndarray,       # [R, IN]
    data: jnp.ndarray,    # [L, E, IN, OUT] int8
    scales: jnp.ndarray,  # [L, E, IN/group, OUT]
    l,                    # scalar int32 traced layer index
    idx: jnp.ndarray,     # [R] int32 routed expert per row
    group: int,
    bk: int = 512,
    bo: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[r] = x[r] @ dequant(data[l, idx[r]]) for int8 expert stacks."""
    from tinygpt_tpu.ops.quant_kernels import _pick_bk

    R, IN = x.shape
    L, E, _, OUT = data.shape
    bk = _pick_bk(IN, group, min(bk, IN))
    bo = min(bo, OUT)
    while OUT % bo:
        bo //= 2
    n_o, n_k = _cdiv(OUT, bo), IN // bk
    rows = bk // group

    scalars = jnp.concatenate(
        [jnp.asarray(l, jnp.int32).reshape(1), idx.astype(jnp.int32)]
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R, n_o, n_k),
        in_specs=[
            pl.BlockSpec((1, 1, bk), lambda r, o, k, s: (r, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, bo),
                         lambda r, o, k, s: (s[0], s[1 + r], k, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows, bo),
                         lambda r, o, k, s: (s[0], s[1 + r], k, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bo), lambda r, o, k, s: (r, 0, o),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, bo), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_int8_kernel_moe, n_k=n_k, group=group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, 1, OUT), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * R * IN * OUT,
            bytes_accessed=R * (IN + OUT) * 2 + R * IN * OUT,
            transcendentals=0,
        ),
        interpret=interpret,
    )(scalars, x.reshape(R, 1, IN), data, scales)
    return out.reshape(R, OUT)


def moe_gather_matmul_int4(
    x: jnp.ndarray,       # [R, IN]
    data: jnp.ndarray,    # [L, E, IN/2, OUT] packed int8 (biased nibbles)
    scales: jnp.ndarray,  # [L, E, IN/group, OUT]
    l,                    # scalar int32 traced layer index
    idx: jnp.ndarray,     # [R] int32 routed expert per row
    group: int,
    bk: int = 512,
    bo: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[r] = x[r] @ dequant(data[l, idx[r]]) — int4 expert bytes are
    the only weight traffic; selection via scalar prefetch."""
    from tinygpt_tpu.ops.quant_kernels import _pick_bk

    R, IN = x.shape
    L, E, INP, OUT = data.shape
    if IN != 2 * INP:
        # odd-64-lane expert stacks row-pad at quantize time
        # (quantize_weight); the pad rows are exact zeros, so padding x
        # to match contributes exactly 0 (same contract as pad_x_to on
        # the dense wrappers)
        from tinygpt_tpu.ops.quant import pad_x_to

        x = pad_x_to(x, 2 * INP)
        IN = 2 * INP
    half = IN // 2
    assert INP == half, "packed rows must be in/2"
    bk = _pick_bk(INP, group, min(bk, INP))
    bo = min(bo, OUT)
    while OUT % bo:
        bo //= 2
    n_o, n_k = _cdiv(OUT, bo), INP // bk
    rows = bk // group
    full_scales = rows % 8 != 0
    s_rows = scales.shape[2] if full_scales else rows

    def s_lo_map(r, o, k, s):
        return (s[0], s[1 + r], 0 if full_scales else k, o)

    def s_hi_map(r, o, k, s, _nk=n_k):
        return (s[0], s[1 + r], 0 if full_scales else k + _nk, o)

    scalars = jnp.concatenate(
        [jnp.asarray(l, jnp.int32).reshape(1), idx.astype(jnp.int32)]
    )
    x3 = x.reshape(R, 1, IN)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R, n_o, n_k),
        in_specs=[
            # lo nibble rows pair with x[:half], hi with x[half:] — the
            # two x views are block-k offsets into the same array
            pl.BlockSpec((1, 1, bk), lambda r, o, k, s: (r, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk),
                         lambda r, o, k, s, _nk=n_k: (r, 0, k + _nk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, bo),
                         lambda r, o, k, s: (s[0], s[1 + r], k, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_rows, bo), s_lo_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_rows, bo), s_hi_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bo), lambda r, o, k, s: (r, 0, o),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, bo), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_int4_kernel_moe, n_k=n_k, group=group,
                          full_scales=full_scales),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, 1, OUT), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * R * IN * OUT,
            bytes_accessed=R * (IN + OUT) * 2 + R * IN * OUT // 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(scalars, x3, x3, data, scales, scales)
    return out.reshape(R, OUT)


def moe_mlp_gathered(
    h: jnp.ndarray,          # [B, 1, H] or [B, H] post-norm activations
    router_w: jnp.ndarray,   # [H, E] (this layer's router)
    gate_up_w: jnp.ndarray,  # [L, E, H, 2I] STACKED
    down_w: jnp.ndarray,     # [L, E, I, H] STACKED
    l,                       # traced layer index
    cfg,
    interpret: bool = False,
) -> jnp.ndarray:
    """Routed Mixtral MLP for decode: HF routing (full softmax -> top-k
    -> renormalize) + two gathered-expert matmuls + weighted slot sum.
    Reads k/E of the dense path's expert bytes."""
    lead = h.shape[:-1]
    H = h.shape[-1]
    h2 = h.reshape(-1, H)                     # [B, H]
    B = h2.shape[0]
    k = cfg.num_experts_per_tok

    logits = h2.astype(jnp.float32) @ router_w.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    w_top, idx = jax.lax.top_k(probs, k)      # [B, k]
    w_top = w_top / jnp.sum(w_top, axis=-1, keepdims=True)

    xr = jnp.repeat(h2, k, axis=0)            # [B*k, H] slot-major rows
    idx_flat = idx.reshape(-1)

    def gmm(xx, w):
        # quantized expert stacks stream int4 nibbles / int8 bytes; bf16
        # stacks stream raw tiles
        from tinygpt_tpu.ops.quant import QuantizedTensor

        if isinstance(w, QuantizedTensor):
            fn = (moe_gather_matmul_int4 if w.bits == 4
                  else moe_gather_matmul_int8)
            return fn(xx, w.data, w.scales, l, idx_flat,
                      group=w.group_size, interpret=interpret)
        return moe_gather_matmul(xx, w, l, idx_flat, interpret=interpret)

    gate_up = gmm(xr, gate_up_w)                          # [B*k, 2I]
    gate, up = jnp.split(gate_up, 2, axis=-1)
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
    down = gmm(act, down_w)                               # [B*k, H]
    out = (w_top.reshape(-1, 1).astype(jnp.float32)
           * down.astype(jnp.float32)).reshape(B, k, H).sum(axis=1)
    return out.astype(h.dtype).reshape(*lead, H)
