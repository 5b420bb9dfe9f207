"""Pallas TPU kernels: fused dequant(INT8/INT4) + matmul.

The weight bytes (int8, or packed int4 nibbles) are the only weight
traffic from HBM; dequantization happens in VMEM right before the MXU
dot. Decode-time GEMV is HBM-bandwidth-bound, so throughput scales with
the compression ratio — the north-star "speed-of-light dequant kernel"
from BASELINE.json (no reference counterpart; the reference is
FP32/FP16/BF16-only, /root/reference/README.md:17).

Grid layout: (m, o, k) with k innermost; partial products accumulate in
a VMEM fp32 scratch, and the bf16 output tile is written once on the last
k step (no fp32 output round-trip through HBM).
"""

from __future__ import annotations

import functools
from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

if TYPE_CHECKING:
    from tinygpt_tpu.ops.quant import QuantizedTensor


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


def _pick_bk(total: int, group: int, target: int) -> int:
    """Largest multiple of `group` that divides `total` and is <= target.
    The contraction dim must tile EXACTLY: a padded tail block would feed
    unspecified values into the accumulator (M/OUT tails are safe — their
    garbage rows/cols are sliced away by out_shape).

    Prefers tiles whose scale-row count (bk/group) is a multiple of 8:
    Mosaic requires a VMEM block's second-to-last dim be sublane-aligned
    (8) or equal to the whole array dim, and the stacked kernels block
    scales as [1, bk/group, bo] slices of the native [L, S, OUT] array.
    When no aligned divisor exists (tiny models; IN=3072 at group 128),
    fall back to ONE k-tile (bk == total) — the stacked int4 wrappers
    then switch to full-scales blocks (see their full_scales flag)."""
    if total % group:
        raise ValueError(f"in_dim {total} not divisible by group {group}")
    best = None
    for mult in range(1, total // group + 1):
        bk = group * mult
        if total % bk == 0 and bk <= target and (bk // group) % 8 == 0:
            best = bk
    return best if best is not None else total


def _pick_bo(out: int, n_k: int, target: int = 4096,
             min_grid: int = 8) -> int:
    """Output-tile width. Two forces, measured on v5e (gate_up/down/o at
    Mistral-7B shapes): each weight row's contiguous DMA run is `bo`
    bytes, so bigger bo reads closer to the HBM streaming rate (1 KB
    segments: ~605 GB/s; 4 KB: ~736); but the grid needs a few blocks
    total for the DMA pipeline to overlap compute (whole-matrix blocks
    measured ~350 GB/s). Pick the largest power-of-two tile <= target
    that divides `out` and keeps n_o * n_k >= min_grid.

    min_grid: DECODE-shaped callers (bm <= 32) pass 4 — the round-4 tile
    sweep (benchlogs_r4/mm_{qkv,o,down}_bo*.log) showed the
    wider-DMA-run force dominating well below the old >=8-block floor:
    qkv (OUT 6144) 1.66 -> 1.00 ms at bo 2048 (grid 6), o (OUT 4096)
    1.33 -> 0.78 ms at bo 2048 (grid 4), down (n_k 7) 2.51 -> 1.96 ms
    at bo 4096 (grid 7). PREFILL-shaped callers keep 8: their bm-scaled
    VMEM terms are 8-32x larger and Mosaic's scoped stack is ~3x the
    naive double-buffer estimate — bo 1024 at bm 256 on the qwen3 qkv
    stack compiles to a 20.94M scoped allocation vs the 16M limit
    (benches/qwen3_vmem_repro.py: bo 512 fits, 1024+ OOMs), while the
    old >=8 pick (512) has run every prefill since round 2."""
    for bo in (4096, 2048, 1024, 512, 256, 128):
        if bo <= target and out % bo == 0 and (out // bo) * n_k >= min_grid:
            return bo
    return min(out, target)


def int4_lowerable(in_dim: int) -> bool:
    """Can the packed-int4 kernels lower for a weight with this
    contraction dim? The half-split nibble packing makes the packed row
    count INP = in_dim/2, and the kernels window x as (bm, bk) blocks
    with bk | INP — Mosaic requires the block's last dim be divisible
    by 128 or equal to the whole array dim, so an INP that is an ODD
    multiple of 64 lanes (e.g. Qwen2.5-0.5B: H=896 -> INP=448) has no
    legal tile (bk=448 is neither 128-divisible nor the x array's 896).
    Callers fall back to the XLA reference dequant (correct, unfused);
    int8 has no such restriction (bk == in_dim is a whole-dim block)."""
    return (in_dim // 2) % 128 == 0


def _cap_single_k(bm: int, bk: int, bo: int, inp: int, out: int,
                  group: int) -> tuple[int, int]:
    """Cap (bk, bo) for prefill-shaped single-k-tile calls.

    Mosaic's scoped-VMEM stack for the dequant kernels at bm > 32 blows
    the 16 MB limit EXACTLY when the k grid dim is 1 and the weight
    block is 1 MB: measured on hardware (benches/qwen3_vmem_repro.py,
    'Scoped allocation with size 20.94M'), (bm 256, bk 1024, bo 1024,
    n_k 1) fails while every one of bm 128 / bk 512 / bo 512 compiles —
    and the SAME 1 MB block at n_k >= 2 (the flagship prefill) has
    compiled all round. With one k step there is no accumulate-only
    iteration: the epilogue write coexists with both double-buffered
    operand sets on the scoped stack. Halve bo (keeping divisibility)
    or else bk until the block is <= 512 KB."""
    while (bm > 32 and inp // bk == 1 and bk * bo > 512 * 1024):
        if bo % 256 == 0 and out % (bo // 2) == 0:
            bo //= 2
        elif (bk % (2 * group) == 0 and inp % (bk // 2) == 0
              and (bk // 2 // group) % 8 == 0):
            bk //= 2
        else:
            # neither dim can legally halve (non-256-divisible explicit
            # bo, exotic OUT): the scoped-VMEM compile failure the cap
            # exists to prevent may still fire — surface it instead of
            # silently returning an uncapped geometry (advisor finding)
            import logging

            logging.getLogger(__name__).warning(
                "dequant tile cap fell through: bm=%d n_k=1 block "
                "%d KB > 512 KB (bk=%d bo=%d inp=%d out=%d group=%d) "
                "— Mosaic scoped-VMEM compile may OOM; prefer a "
                "256-divisible bo or the unfused XLA path",
                bm, bk * bo // 1024, bk, bo, inp, out, group)
            break
    return bk, bo


# -- int8 ---------------------------------------------------------------------


def _int8_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k: int,
                 group: int, mxu_dtype=jnp.float32):
    # s_ref: [1, rows, BO] — this k-block's scale rows, pre-blocked by the
    # wrapper (Mosaic cannot dynamically slice sub-8-row tiles in VMEM).
    #
    # Scales are applied to per-GROUP partial sums, not per weight:
    #   out = sum_g scale[g] * (x_g @ w_g)
    # which moves the scale multiply from IN*OUT VPU ops to rows*M*OUT —
    # the dequant path's VPU cost is then just the int8→f32 convert that
    # feeds the MXU.
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[:].astype(mxu_dtype)  # [BK, BO] int8 exact (feeds MXU)
    bk, bo = w.shape
    rows = bk // group
    x = x_ref[:].astype(mxu_dtype)  # [BM, BK]
    s = s_ref[0].astype(jnp.float32)  # [rows, BO]
    acc = acc_ref[:]
    for r in range(rows):
        part = jnp.dot(
            x[:, r * group : (r + 1) * group],
            w[r * group : (r + 1) * group, :],
            preferred_element_type=jnp.float32,
        )  # [BM, BO]
        acc = acc + s[r][None, :] * part
    acc_ref[:] = acc

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("group", "bm", "bk", "bo", "interpret")
)
def matmul_dequant_int8(
    x: jnp.ndarray,       # [M, IN] (bf16/f32)
    data: jnp.ndarray,    # [IN, OUT] int8
    scales: jnp.ndarray,  # [IN/group, OUT]
    group: int,
    bm: int = 256,
    bk: int = 1024,
    bo=None,  # None: auto (_pick_bo)
    interpret: bool = False,
) -> jnp.ndarray:
    M, IN = x.shape
    OUT = data.shape[1]
    bm = min(bm, _round_up(M, 8))
    bk = _pick_bk(IN, group, bk)
    # wide output tiles are a decode (small-bm) tuning; prefill-sized bm
    # with bo=4096 blows the 16 MB VMEM scoped budget
    if bo is None:
        bo = _pick_bo(OUT, IN // bk, target=4096 if bm <= 32 else 1024,
                      min_grid=4 if bm <= 32 else 8)
        bk, bo = _cap_single_k(bm, bk, bo, IN, OUT, group)
    else:
        bo = min(bo, OUT)  # explicit picks bypass the cap (repro/sweep tools)
    mxu_dtype = (jnp.bfloat16 if x.dtype == jnp.bfloat16
                 else jnp.float32)  # interpret keeps the same dtype so
    # the XLA oracle tests the exact TPU operand path 1:1
    n_m, n_o, n_k = _cdiv(M, bm), _cdiv(OUT, bo), IN // bk

    rows = bk // group
    s_blocks = scales.reshape(n_k, rows, OUT)
    return pl.pallas_call(
        functools.partial(_int8_kernel, n_k=n_k, group=group,
                          mxu_dtype=mxu_dtype),
        grid=(n_m, n_o, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda m, o, k: (m, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bo), lambda m, o, k: (k, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, bo), lambda m, o, k: (k, 0, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bo), lambda m, o, k: (m, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, OUT), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bo), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * M * IN * OUT,
            bytes_accessed=M * IN * 2 + IN * OUT + M * OUT * 2,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(x, data, s_blocks)


# -- int4 (half-split nibble packing, see quant.pack_int4) -------------------


def _int4_kernel(x_lo_ref, x_hi_ref, w_ref, s_lo_ref, s_hi_ref, o_ref,
                 acc_ref, *, n_k: int, group: int,
                 mxu_dtype=jnp.float32):
    # s_lo/s_hi: [1, rows, BO] — this k-block's scale rows per nibble
    # plane, pre-blocked by the wrapper.
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    packed = w_ref[:].astype(jnp.int32)  # [BKP, BO] — packed rows
    bkp, bo = packed.shape
    rows = bkp // group
    # BIASED nibbles (u = q + 8): unpack is pure mask/shift + convert; the
    # -8 bias is folded into a per-group rank-1 correction below, and
    # scales post-multiply per-group partial sums (see _int8_kernel) — so
    # the per-weight VPU work is minimal.
    # nibbles and bf16 activations are exact in mxu_dtype (see the MXU
    # operand note at _pick_bo): ONE convert per operand, full-rate dots
    lo = (packed & 0x0F).astype(mxu_dtype)            # u_lo in [0, 15]
    hi = ((packed >> 4) & 0x0F).astype(mxu_dtype)     # u_hi in [0, 15]

    x_lo = x_lo_ref[:].astype(jnp.float32)
    x_hi = x_hi_ref[:].astype(jnp.float32)
    x_lo_m = x_lo_ref[:].astype(mxu_dtype)
    x_hi_m = x_hi_ref[:].astype(mxu_dtype)
    s_lo = s_lo_ref[0].astype(jnp.float32)  # [rows, BO]
    s_hi = s_hi_ref[0].astype(jnp.float32)
    acc = acc_ref[:]
    for r in range(rows):
        sl = slice(r * group, (r + 1) * group)
        # x @ (s*(u-8)) = s ⊙ (x @ u) - 8s ⊙ sum(x)
        xs_lo = jnp.sum(x_lo[:, sl], axis=1, keepdims=True)  # [BM, 1]
        xs_hi = jnp.sum(x_hi[:, sl], axis=1, keepdims=True)
        acc = acc + s_lo[r][None, :] * (
            jnp.dot(x_lo_m[:, sl], lo[sl, :],
                    preferred_element_type=jnp.float32) - 8.0 * xs_lo
        )
        acc = acc + s_hi[r][None, :] * (
            jnp.dot(x_hi_m[:, sl], hi[sl, :],
                    preferred_element_type=jnp.float32) - 8.0 * xs_hi
        )
    acc_ref[:] = acc

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("group", "bm", "bk", "bo", "interpret")
)
def matmul_dequant_int4(
    x: jnp.ndarray,       # [M, IN]
    data: jnp.ndarray,    # [IN/2, OUT] packed int8 (half-split nibbles)
    scales: jnp.ndarray,  # [IN/group, OUT]
    group: int,
    bm: int = 256,
    bk: int = 1024,      # tile of PACKED rows
    bo=None,  # None: auto (_pick_bo)
    interpret: bool = False,
) -> jnp.ndarray:
    M, IN = x.shape
    INP = data.shape[0]  # IN // 2
    OUT = data.shape[1]
    half = IN // 2
    assert INP == half, "packed rows must be in/2"
    # scales for the lo plane are rows [0, half/group); hi plane rows
    # [half/group, ...). bk must divide the packed rows exactly so both
    # nibble planes and both scale planes tile cleanly.
    bm = min(bm, _round_up(M, 8))
    bk = _pick_bk(INP, group, bk)
    if bo is None:  # see the bm<=32 note in matmul_dequant_int8
        bo = _pick_bo(OUT, INP // bk, target=4096 if bm <= 32 else 1024,
                      min_grid=4 if bm <= 32 else 8)
        bk, bo = _cap_single_k(bm, bk, bo, INP, OUT, group)
    else:
        bo = min(bo, OUT)  # explicit picks bypass the cap (repro/sweep tools)
    mxu_dtype = (jnp.bfloat16 if x.dtype == jnp.bfloat16
                 else jnp.float32)  # interpret keeps the same dtype so
    # the XLA oracle tests the exact TPU operand path 1:1
    n_m, n_o, n_k = _cdiv(M, bm), _cdiv(OUT, bo), INP // bk
    half_groups = half // group

    rows = bk // group
    s_lo_blocks = scales[:half_groups].reshape(n_k, rows, OUT)
    s_hi_blocks = scales[half_groups:].reshape(n_k, rows, OUT)
    return pl.pallas_call(
        functools.partial(_int4_kernel, n_k=n_k, group=group,
                          mxu_dtype=mxu_dtype),
        grid=(n_m, n_o, n_k),
        in_specs=[
            # x lo plane: columns [k*bk, k*bk+bk)
            pl.BlockSpec((bm, bk), lambda m, o, k: (m, k),
                         memory_space=pltpu.VMEM),
            # x hi plane: columns [half + k*bk, ...) — block index shifted
            pl.BlockSpec((bm, bk),
                         lambda m, o, k, _nk=n_k: (m, k + _nk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bo), lambda m, o, k: (k, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, bo), lambda m, o, k: (k, 0, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, bo), lambda m, o, k: (k, 0, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bo), lambda m, o, k: (m, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, OUT), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bo), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * M * IN * OUT,
            bytes_accessed=M * IN * 2 + IN * OUT // 2 + M * OUT * 2,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(x, x, data, s_lo_blocks, s_hi_blocks)


def matmul_dequant_tpu(x: jnp.ndarray, qt: "QuantizedTensor",
                       interpret: bool = False) -> jnp.ndarray:
    """Dispatch by bit width; x is [M, IN] 2-D."""
    if qt.bits == 8:
        return matmul_dequant_int8(
            x, qt.data, qt.scales, group=qt.group_size, interpret=interpret
        )
    return matmul_dequant_int4(
        x, qt.data, qt.scales, group=qt.group_size, interpret=interpret
    )


# -- stacked-layer variants (scalar-prefetch layer index) --------------------
#
# Inside a lax.scan over layers, slicing a stacked weight as a scan `xs`
# feeds a dynamic-slice into the pallas custom call — XLA cannot pass a
# view across a custom-call boundary, so it MATERIALIZES a copy of every
# layer's weight bytes each iteration (profiled at ~78 us for a 59 MB
# gate_up slice: the copy costs as much as the matmul itself, ~2x total
# weight traffic). These variants instead take the FULL stacked [L, ...]
# arrays plus the layer index as a prefetched scalar: the kernel's
# index_map picks layer l's tiles and the DMA engine streams them
# directly from the stacked buffer — zero copies, one compile for all
# layers.


def _int8_kernel_stacked(l_ref, x_ref, w_ref, s_ref, o_ref, acc_ref, *,
                         n_k: int, group: int, mxu_dtype=jnp.float32,
                         dequant_full: bool = False):
    del l_ref  # consumed by the index_maps
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(mxu_dtype)
    s = s_ref[0].astype(jnp.float32)  # [rows, BO]
    acc = acc_ref[:]
    if dequant_full:
        # prefill-shaped: one full-K dot on VMEM-dequantized weights
        # (see the int4 stacked kernel's branch)
        wf = w_ref[0].astype(jnp.float32)
        bk, bo = wf.shape
        rows = bk // group
        wd = (wf.reshape(rows, group, bo) * s[:, None, :]).reshape(bk, bo)
        acc = acc + jnp.dot(x, wd.astype(mxu_dtype),
                            preferred_element_type=jnp.float32)
    else:
        w = w_ref[0].astype(mxu_dtype)  # [BK, BO] int8 exact
        bk, bo = w.shape
        rows = bk // group
        for r in range(rows):
            part = jnp.dot(
                x[:, r * group : (r + 1) * group],
                w[r * group : (r + 1) * group, :],
                preferred_element_type=jnp.float32,
            )
            acc = acc + s[r][None, :] * part
    acc_ref[:] = acc

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("group", "bm", "bk", "bo", "interpret",
                              "scales_sliced")
)
def matmul_dequant_int8_stacked(
    x: jnp.ndarray,       # [M, IN]
    data: jnp.ndarray,    # [L, IN, OUT] int8
    scales: jnp.ndarray,  # [L, IN/group, OUT]
    l: jnp.ndarray,       # scalar int32 layer index (traced)
    group: int,
    bm: int = 256,
    bk: int = 1024,
    bo=None,  # None: auto (_pick_bo)
    interpret: bool = False,
    scales_sliced: bool = False,  # scales is this layer's [1, ...] slice
    #   (see matmul_dequant_int4_stacked_fused: denies XLA's MSA pass
    #   the small stacked scale buffer it re-prefetches every layer)
) -> jnp.ndarray:
    M, IN = x.shape
    L, _, OUT = data.shape
    bm = min(bm, _round_up(M, 8))
    bk = _pick_bk(IN, group, bk)
    if bo is None:  # see the bm<=32 note in matmul_dequant_int8
        bo = _pick_bo(OUT, IN // bk, target=4096 if bm <= 32 else 1024,
                      min_grid=4 if bm <= 32 else 8)
        bk, bo = _cap_single_k(bm, bk, bo, IN, OUT, group)
    else:
        bo = min(bo, OUT)  # explicit picks bypass the cap (repro/sweep tools)
    mxu_dtype = (jnp.bfloat16 if x.dtype == jnp.bfloat16
                 else jnp.float32)  # interpret keeps the same dtype so
    # the XLA oracle tests the exact TPU operand path 1:1
    n_m, n_o, n_k = _cdiv(M, bm), _cdiv(OUT, bo), IN // bk
    rows = bk // group
    # scales are consumed in their NATIVE [L, IN/group, OUT] layout: block
    # k covers scale rows [k*rows, (k+1)*rows) — no reshape/slice, which
    # inside a lax.scan body would materialize a copy every layer.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_m, n_o, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda m, o, k, l: (m, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, bo), lambda m, o, k, l: (l[0], k, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, bo),
                         lambda m, o, k, l: (0 if scales_sliced else l[0],
                                             k, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bo), lambda m, o, k, l: (m, o),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, bo), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_int8_kernel_stacked, n_k=n_k, group=group,
                          mxu_dtype=mxu_dtype, dequant_full=bm > 32),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, OUT), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * IN * OUT,
            bytes_accessed=M * IN * 2 + IN * OUT + M * OUT * 2,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(jnp.asarray(l, jnp.int32).reshape(1), x, data, scales)


def _int4_kernel_stacked(l_ref, x_lo_ref, x_hi_ref, w_ref, s_lo_ref,
                         s_hi_ref, o_ref, acc_ref, *, n_k: int, group: int,
                         full_scales: bool = False,
                         mxu_dtype=jnp.float32,
                         dequant_full: bool = False):
    del l_ref
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    packed = w_ref[0].astype(jnp.int32)  # [BKP, BO]
    bkp, bo = packed.shape
    rows = bkp // group
    x_lo_m = x_lo_ref[:].astype(mxu_dtype)
    x_hi_m = x_hi_ref[:].astype(mxu_dtype)
    # full_scales: n_k == 1 and both refs hold the whole [S, BO] scale
    # plane pair; the hi rows sit at a static offset `rows` (a sub-8-row
    # BLOCK is illegal in Mosaic, but static row indexing is fine).
    s_lo = s_lo_ref[0].astype(jnp.float32)
    s_hi = s_hi_ref[0].astype(jnp.float32)
    hi_off = rows if full_scales else 0
    acc = acc_ref[:]
    if dequant_full:
        # PREFILL-shaped (bm > 32): the per-group decomposition below
        # runs K=group(=64) dots that only half-fill the 128-deep MXU —
        # measured 80 TFLOPS (~40% of peak) on the 4x512-token flagship
        # prefill. Dequantize the whole block in VMEM instead (a few
        # VPU ops per weight, ~0.5 us/block) and run ONE K=bk dot.
        lo_w = (packed & 0x0F).astype(jnp.float32) - 8.0
        hi_w = ((packed >> 4) & 0x0F).astype(jnp.float32) - 8.0
        bo = lo_w.shape[1]
        w_lo = (lo_w.reshape(rows, group, bo)
                * s_lo[:rows][:, None, :]).reshape(bkp, bo)
        w_hi = (hi_w.reshape(rows, group, bo)
                * s_hi[hi_off:hi_off + rows][:, None, :]).reshape(bkp, bo)
        acc = acc + jnp.dot(x_lo_m, w_lo.astype(mxu_dtype),
                            preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(x_hi_m, w_hi.astype(mxu_dtype),
                            preferred_element_type=jnp.float32)
        acc_ref[:] = acc
    else:
        lo = (packed & 0x0F).astype(mxu_dtype)
        hi = ((packed >> 4) & 0x0F).astype(mxu_dtype)
        x_lo = x_lo_ref[:].astype(jnp.float32)
        x_hi = x_hi_ref[:].astype(jnp.float32)
        for r in range(rows):
            sl = slice(r * group, (r + 1) * group)
            xs_lo = jnp.sum(x_lo[:, sl], axis=1, keepdims=True)
            xs_hi = jnp.sum(x_hi[:, sl], axis=1, keepdims=True)
            acc = acc + s_lo[r][None, :] * (
                jnp.dot(x_lo_m[:, sl], lo[sl, :],
                        preferred_element_type=jnp.float32) - 8.0 * xs_lo
            )
            acc = acc + s_hi[hi_off + r][None, :] * (
                jnp.dot(x_hi_m[:, sl], hi[sl, :],
                        preferred_element_type=jnp.float32) - 8.0 * xs_hi
            )
        acc_ref[:] = acc

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("group", "bm", "bk", "bo", "interpret",
                              "scales_sliced")
)
def matmul_dequant_int4_stacked(
    x: jnp.ndarray,       # [M, IN]
    data: jnp.ndarray,    # [L, IN/2, OUT] packed int8 (half-split nibbles)
    scales: jnp.ndarray,  # [L, IN/group, OUT]
    l: jnp.ndarray,       # scalar int32 layer index (traced)
    group: int,
    bm: int = 256,
    bk: int = 1024,
    bo=None,  # None: auto (_pick_bo)
    interpret: bool = False,
    scales_sliced: bool = False,  # scales is this layer's [1, ...] slice
    #   (see matmul_dequant_int4_stacked_fused: denies XLA's MSA pass
    #   the small stacked scale buffer it re-prefetches every layer)
) -> jnp.ndarray:
    M, IN = x.shape
    L, INP, OUT = data.shape
    half = IN // 2
    assert INP == half, "packed rows must be in/2"
    bm = min(bm, _round_up(M, 8))
    bk = _pick_bk(INP, group, bk)
    if bo is None:  # see the bm<=32 note in matmul_dequant_int8
        bo = _pick_bo(OUT, INP // bk, target=4096 if bm <= 32 else 1024,
                      min_grid=4 if bm <= 32 else 8)
        bk, bo = _cap_single_k(bm, bk, bo, INP, OUT, group)
    else:
        bo = min(bo, OUT)  # explicit picks bypass the cap (repro/sweep tools)
    mxu_dtype = (jnp.bfloat16 if x.dtype == jnp.bfloat16
                 else jnp.float32)  # interpret keeps the same dtype so
    # the XLA oracle tests the exact TPU operand path 1:1
    n_m, n_o, n_k = _cdiv(M, bm), _cdiv(OUT, bo), INP // bk
    rows = bk // group
    # scales consumed in NATIVE [L, IN/group, OUT] layout: the lo plane's
    # rows for block k start at block-row k, the hi plane's at k + n_k
    # (half/group == n_k*rows exactly). No reshape/slice — those would
    # materialize a copy every layer inside a lax.scan body.
    # rows % 8 != 0 (then n_k == 1, see _pick_bk): a [1, rows, bo] block
    # is illegal in Mosaic — load the FULL scale dim and let the kernel
    # index the hi plane at static offset `rows`.
    full_scales = rows % 8 != 0
    s_rows = scales.shape[1] if full_scales else rows

    def s_lo_map(m, o, k, l):
        return (0 if scales_sliced else l[0],
                0 if full_scales else k, o)

    def s_hi_map(m, o, k, l, _nk=n_k):
        return (0 if scales_sliced else l[0],
                0 if full_scales else k + _nk, o)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_m, n_o, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda m, o, k, l: (m, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bk), lambda m, o, k, l, _nk=n_k: (m, k + _nk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, bo), lambda m, o, k, l: (l[0], k, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_rows, bo), s_lo_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_rows, bo), s_hi_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bo), lambda m, o, k, l: (m, o),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, bo), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_int4_kernel_stacked, n_k=n_k, group=group,
                          full_scales=full_scales, mxu_dtype=mxu_dtype,
                          dequant_full=bm > 32),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, OUT), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * IN * OUT,
            bytes_accessed=M * IN * 2 + IN * OUT // 2 + M * OUT * 2,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(jnp.asarray(l, jnp.int32).reshape(1), x, x, data, scales, scales)


def matmul_dequant_stacked_tpu(x: jnp.ndarray, qt: "QuantizedTensor",
                               l: jnp.ndarray,
                               interpret: bool = False) -> jnp.ndarray:
    """Dispatch by bit width for stacked [L, in, out] quantized weights;
    x is [M, IN] 2-D, l the traced layer index. Small scale stacks are
    sliced per layer outside the kernel — XLA's MSA pass otherwise
    re-prefetches the whole stacked array into VMEM every layer
    iteration of a decode scan (see matmul_dequant_int4_stacked_fused's
    scales_sliced note)."""
    sc, ssl = qt.scales, False
    if qt.data.ndim == 3 and qt.scales.nbytes <= 32 * 2**20             and qt.scales.shape[0] > 1:
        sc = jax.lax.dynamic_index_in_dim(qt.scales, l, 0, keepdims=True)
        ssl = True
    if qt.bits == 8:
        return matmul_dequant_int8_stacked(
            x, qt.data, sc, l, group=qt.group_size,
            interpret=interpret, scales_sliced=ssl,
        )
    return matmul_dequant_int4_stacked(
        x, qt.data, sc, l, group=qt.group_size, interpret=interpret,
        scales_sliced=ssl,
    )


# -- fused-elementwise stacked int4 ------------------------------------------
#
# The decode step's per-layer elementwise chain (rms-norm scaling,
# silu(gate)*up, residual adds) costs ~1 ms/step at Mistral-7B b4 purely
# in XLA per-op overhead on [4, H]-sized arrays. The fused variant folds
# them into the dequant matmul where the data already sits in VMEM:
#   * ln + invrms prologue: x_eff = x * invrms[m] * ln[l, col] — the
#     rsqrt(mean(x^2)) reduce stays one small XLA op, only the two
#     broadcasts move in;
#   * silu prologue: x is [M, 2*IN] = gate||up and the kernel computes
#     silu(g)*u per block (gate/up arrive as extra x blocks);
#   * residual epilogue: o = acc + res.
# The per-group rank-1 bias correction uses the TRANSFORMED x, so the
# fusions compose exactly with the biased-nibble math.


def _int4_kernel_stacked_fused(*refs, n_k: int, group: int, has_ln: bool,
                               has_silu: bool, has_res: bool,
                               has_bias: bool = False,
                               full_scales: bool = False,
                               rope_cols: int = 0, rope_dim: int = 0,
                               qk_cols: int = 0, eps: float = 0.0):
    it = iter(refs[1:])  # refs[0] = scalar prefetch (consumed by index_maps)
    if has_silu:
        g_lo_ref, g_hi_ref, u_lo_ref, u_hi_ref = (next(it) for _ in range(4))
    else:
        x_lo_ref, x_hi_ref = next(it), next(it)
    if has_ln:
        ln_lo_ref, ln_hi_ref, inv_ref = (next(it) for _ in range(3))
    w_ref, s_lo_ref, s_hi_ref = next(it), next(it), next(it)
    res_ref = next(it) if has_res else None
    bias_ref = next(it) if has_bias else None
    cos_ref = sin_ref = None
    if rope_cols:
        cos_ref, sin_ref = next(it), next(it)
    qn_ref = kn_ref = None
    if qk_cols:
        qn_ref, kn_ref = next(it), next(it)
    o_ref, acc_ref = next(it), next(it)

    k = pl.program_id(2)
    o_id = pl.program_id(1)  # top-level: program_id inside a pl.when
    # body lowers through lax.cond, which interpret mode can't resolve

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    packed = w_ref[0].astype(jnp.int32)
    bkp, bo = packed.shape
    rows = bkp // group
    lo = (packed & 0x0F).astype(jnp.float32)
    hi = ((packed >> 4) & 0x0F).astype(jnp.float32)

    if has_silu:
        g_lo = g_lo_ref[:].astype(jnp.float32)
        g_hi = g_hi_ref[:].astype(jnp.float32)
        x_lo = g_lo * jax.nn.sigmoid(g_lo) * u_lo_ref[:].astype(
            jnp.float32)
        x_hi = g_hi * jax.nn.sigmoid(g_hi) * u_hi_ref[:].astype(
            jnp.float32)
    else:
        x_lo = x_lo_ref[:].astype(jnp.float32)
        x_hi = x_hi_ref[:].astype(jnp.float32)
    if has_ln:
        inv = inv_ref[:].astype(jnp.float32)  # [BM, 1]
        x_lo = x_lo * inv * ln_lo_ref[0].astype(jnp.float32)
        x_hi = x_hi * inv * ln_hi_ref[0].astype(jnp.float32)

    # full_scales: n_k == 1 and both refs hold the whole [S, BO] scale
    # plane pair; hi rows sit at static offset `rows` (see
    # _int4_kernel_stacked).
    s_lo = s_lo_ref[0].astype(jnp.float32)
    s_hi = s_hi_ref[0].astype(jnp.float32)
    hi_off = rows if full_scales else 0
    acc = acc_ref[:]
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
    acc_ref[:] = acc

    @pl.when(k == n_k - 1)
    def _():
        out = acc_ref[:]
        if has_bias:
            out = out + bias_ref[0].astype(jnp.float32)  # [1, BO]
        if rope_cols:
            # RoPE epilogue on the q||k column range (rotate-half, HF
            # convention — ops/rope.py): per-head rotation while the
            # tile is still in VMEM. Saves the whole XLA rope + slice
            # glue between the qkv matmul and the attention (measured
            # ~0.5 ms/step of per-op overhead at Mistral-7B b4,
            # benches/hotspot_tune.py attn_glue_only). Gated PER HEAD
            # on the head's global column (the q||k / v boundary need
            # not be tile-aligned — only head-aligned, which it is by
            # construction): heads past rope_cols pass through.
            c = cos_ref[:].astype(jnp.float32)  # [BM, D]
            s = sin_ref[:].astype(jnp.float32)
            half = rope_dim // 2
            bo_cols = out.shape[1]
            parts = []
            for h in range(bo_cols // rope_dim):
                a = out[:, h * rope_dim : (h + 1) * rope_dim]
                col0 = o_id * bo_cols + h * rope_dim
                if qk_cols:
                    # per-head qk RMSNorm (qwen3) fused pre-rope: heads
                    # below qk_cols take q_norm, k heads take k_norm, v
                    # heads pass through (col0 >= rope_cols). The norm
                    # runs on the f32 accumulator — the XLA path norms
                    # the bf16-rounded matmul output.
                    inv = jax.lax.rsqrt(
                        jnp.mean(a * a, axis=1, keepdims=True) + eps)
                    nw = jnp.where(col0 < qk_cols,
                                   qn_ref[0, 0].astype(jnp.float32),
                                   kn_ref[0, 0].astype(jnp.float32))
                    a = jnp.where(col0 < rope_cols,
                                  a * inv * nw[None, :], a)
                rot = jnp.concatenate([-a[:, half:], a[:, :half]], axis=1)
                parts.append(jnp.where(col0 < rope_cols,
                                       a * c + rot * s, a))
            out = jnp.concatenate(parts, axis=1)
        if has_res:
            out = out + res_ref[:].astype(jnp.float32)
        o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group", "silu", "bm", "bk", "bo", "interpret",
                     "rope_heads", "rope_dim", "qk_heads", "eps",
                     "scales_sliced"),
)
def matmul_dequant_int4_stacked_fused(
    x: jnp.ndarray,       # [M, IN]; with silu: [M, 2*IN] = gate||up
    data: jnp.ndarray,    # [L, IN/2, OUT]
    scales: jnp.ndarray,  # [L, IN/group, OUT]
    l: jnp.ndarray,
    group: int,
    ln: jnp.ndarray = None,      # [L, 1, IN] norm weight (with invrms)
    invrms: jnp.ndarray = None,  # [M, 1] f32 per-row 1/rms
    res: jnp.ndarray = None,     # [M, OUT] residual added in the epilogue
    bias: jnp.ndarray = None,    # [L, 1, OUT] per-layer bias epilogue
    silu: bool = False,          # x is gate||up; compute silu(g)*u
    rope_cos: jnp.ndarray = None,  # [M, D] gathered rotation rows —
    rope_sin: jnp.ndarray = None,  # RoPE epilogue on the q||k columns
    rope_heads: int = 0,         # static: leading heads to rope (Nq+Nk)
    rope_dim: int = 0,           # static: head_dim D
    qk_norm_w=None,              # (q_norm [L, D], k_norm [L, D]) — fused
    #                              per-head qk RMSNorm pre-rope (qwen3)
    qk_heads: int = 0,           # static: q heads (q/k norm boundary)
    eps: float = 0.0,            # static: rms eps for the fused qk norm
    bm: int = 256,
    bk: int = 1024,
    bo=None,
    interpret: bool = False,
    scales_sliced: bool = False,  # scales is THIS layer's [1, IN/group,
    #   OUT] slice (layer-invariant index 0), not the [L, ...] stack.
    #   Callers inside a layer scan slice small scale stacks per layer:
    #   XLA's memory-space-assignment pass otherwise re-prefetches the
    #   WHOLE stacked array into VMEM (S(1)) every layer iteration when
    #   it fits its budget — 28 x 19 us/step of copy-done at the
    #   qwen3_17b shape (0.52 ms of a 3.34 ms step, round-5 trace).
    #   A per-layer dynamic slice costs one extra pass of the scale
    #   bytes (~23 us/step there) and denies MSA the stacked buffer.
) -> jnp.ndarray:
    has_silu = bool(silu)
    L, INP, OUT = data.shape
    in_p = 2 * INP  # the weight's (possibly row-padded) contraction dim
    IN = x.shape[1] // 2 if has_silu else x.shape[1]
    if IN != in_p:
        # odd-64-lane contraction dims are row-padded at quantize time
        # (quantize_weight); pad x per plane-segment to match — the pad
        # columns multiply zero weight rows, contributing exactly 0
        assert IN < in_p, (IN, in_p)
        z = jnp.zeros((x.shape[0], in_p - IN), x.dtype)
        x = (jnp.concatenate([x[:, :IN], z, x[:, IN:], z], axis=1)
             if has_silu else jnp.concatenate([x, z], axis=1))
        if ln is not None and ln.shape[-1] != in_p:
            ln = jnp.pad(ln, ((0, 0), (0, 0), (0, in_p - ln.shape[-1])))
        IN = in_p
    IN2 = x.shape[1]
    M = x.shape[0]
    half = IN // 2
    assert INP == half
    has_ln = ln is not None
    has_res = res is not None
    has_bias = bias is not None
    bm = min(bm, _round_up(M, 8))
    bk = _pick_bk(INP, group, bk)
    if bo is None:  # see the bm<=32 note in matmul_dequant_int8
        bo = _pick_bo(OUT, INP // bk, target=4096 if bm <= 32 else 1024,
                      min_grid=4 if bm <= 32 else 8)
        bk, bo = _cap_single_k(bm, bk, bo, INP, OUT, group)
    else:
        bo = min(bo, OUT)  # explicit picks bypass the cap (repro/sweep tools)
    n_m, n_o, n_k = _cdiv(M, bm), _cdiv(OUT, bo), INP // bk
    rows = bk // group

    def xspec(block_off):
        return pl.BlockSpec(
            (bm, bk),
            lambda m, o, k, l, _off=block_off: (m, k + _off),
            memory_space=pltpu.VMEM,
        )

    inputs = []
    in_specs = []
    if has_silu:
        # gate cols [0, IN) -> planes at block offsets 0 / n_k;
        # up cols [IN, 2*IN) -> 2*n_k / 3*n_k
        for off in (0, n_k, 2 * n_k, 3 * n_k):
            inputs.append(x)
            in_specs.append(xspec(off))
    else:
        inputs.extend([x, x])
        in_specs.extend([xspec(0), xspec(n_k)])
    if has_ln:
        inputs.extend([ln, ln, invrms.astype(jnp.float32)])
        in_specs.extend([
            pl.BlockSpec((1, 1, bk), lambda m, o, k, l: (l[0], 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk),
                         lambda m, o, k, l, _nk=n_k: (l[0], 0, k + _nk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda m, o, k, l: (m, 0),
                         memory_space=pltpu.VMEM),
        ])
    # rows % 8 != 0 (then n_k == 1, see _pick_bk): sub-8-row scale blocks
    # are illegal in Mosaic — load the full scale dim, static hi offset.
    full_scales = rows % 8 != 0
    s_rows = scales.shape[1] if full_scales else rows

    def s_lo_map(m, o, k, l):
        return (0 if scales_sliced else l[0],
                0 if full_scales else k, o)

    def s_hi_map(m, o, k, l, _nk=n_k):
        return (0 if scales_sliced else l[0],
                0 if full_scales else k + _nk, o)

    inputs.extend([data, scales, scales])
    in_specs.extend([
        pl.BlockSpec((1, bk, bo), lambda m, o, k, l: (l[0], k, o),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, s_rows, bo), s_lo_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, s_rows, bo), s_hi_map,
                     memory_space=pltpu.VMEM),
    ])
    if has_res:
        inputs.append(res)
        in_specs.append(pl.BlockSpec((bm, bo), lambda m, o, k, l: (m, o),
                                     memory_space=pltpu.VMEM))
    if has_bias:
        inputs.append(bias)
        in_specs.append(pl.BlockSpec((1, 1, bo),
                                     lambda m, o, k, l: (l[0], 0, o),
                                     memory_space=pltpu.VMEM))
    rope_cols = 0
    if rope_cos is not None:
        # whole heads per o-tile (rope_fuse_supported); the q||k / v
        # boundary may fall mid-tile — the kernel gates per head
        assert rope_heads and rope_dim and not has_res
        assert bo % rope_dim == 0
        rope_cols = rope_heads * rope_dim
        inputs.extend([rope_cos, rope_sin])
        in_specs.extend([
            pl.BlockSpec((bm, rope_dim), lambda m, o, k, l: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, rope_dim), lambda m, o, k, l: (m, 0),
                         memory_space=pltpu.VMEM),
        ])
    qk_cols = 0
    if qk_norm_w is not None:
        assert rope_cols and qk_heads, "fused qk norm rides the rope epilogue"
        qk_cols = qk_heads * rope_dim
        qn, kn = qk_norm_w  # [L, D] each, layer-indexed like ln
        # dummy middle axis: Mosaic requires the last-two block dims be
        # (8k, 128k) or equal to the array dims — (1, D) over [L, D]
        # is illegal, (1, 1, D) over [L, 1, D] is exact
        inputs.extend([qn.reshape(qn.shape[0], 1, qn.shape[1]),
                       kn.reshape(kn.shape[0], 1, kn.shape[1])])
        in_specs.extend([
            pl.BlockSpec((1, 1, rope_dim), lambda m, o, k, l: (l[0], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rope_dim), lambda m, o, k, l: (l[0], 0, 0),
                         memory_space=pltpu.VMEM),
        ])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_m, n_o, n_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bo), lambda m, o, k, l: (m, o),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, bo), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_int4_kernel_stacked_fused, n_k=n_k, group=group,
                          has_ln=has_ln, has_silu=has_silu,
                          has_res=has_res, has_bias=has_bias,
                          full_scales=full_scales,
                          rope_cols=rope_cols, rope_dim=rope_dim,
                          qk_cols=qk_cols, eps=eps),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, OUT), res.dtype if has_res
                                       else x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * IN * OUT,
            bytes_accessed=M * IN2 * 2 + IN * OUT // 2 + M * OUT * 2,
            transcendentals=M * IN if has_silu else 0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(jnp.asarray(l, jnp.int32).reshape(1), *inputs)


def rope_fuse_supported(H: int, q_dim: int, kv_dim: int, D: int,
                        group: int, batch: int, bk: int = 1024) -> bool:
    """Can matmul_dequant_int4_stacked_fused apply RoPE in its epilogue
    for a qkv projection [H -> q_dim + 2*kv_dim]? Requires whole heads
    per output tile with the same bo the wrapper will pick (the q||k / v
    boundary may fall mid-tile — the kernel gates rope per head). D must
    be lane-sized (128) — smaller head dims fall back to the XLA rope."""
    if D % 128:
        return False
    if (H // 2) % 128:
        # odd-64-lane hidden dims are row-padded at quantize time
        # (quantize_weight); mirror the padded geometry the wrapper sees
        H = -(-H // 256) * 256
    if H % (2 * group):
        return False
    OUT = q_dim + 2 * kv_dim
    INP = H // 2
    bka = _pick_bk(INP, group, bk)
    bm = min(256, _round_up(max(batch, 1), 8))
    bo = _pick_bo(OUT, INP // bka, target=4096 if bm <= 32 else 1024,
                      min_grid=4 if bm <= 32 else 8)
    return bo % D == 0


# -- MLP pair mega-kernel ------------------------------------------------------
#
# gate_up + silu + down as ONE pallas_call: a flat sequential grid runs
# the gate_up tiles first (phase A, accumulating the [M, 2I] activation
# into VMEM scratch), then the down tiles (phase B, reading silu(g)*u
# straight from scratch). vs two fused calls this removes one per-layer
# call's pipeline fill/drain (~8 us x L, measured in
# benches/flagship_profile.py) and the gate_up HBM round trip, and lets
# down's first weight DMA prefetch while gate_up is still computing.
# Decode-shaped only (M <= bm): the whole activation must fit one M-tile.


def _mlp_kernel_int4_stacked(*refs, na: int, nka: int, nkb: int,
                             boa: int, bob: int, tw: int, group: int,
                             n_i: int, n_h: int):
    (x_lo_ref, ln_lo_ref, x_hi_ref, ln_hi_ref, inv_ref,
     guw_ref, gus_lo_ref, gus_hi_ref,
     dnw_ref, dns_lo_ref, dns_hi_ref,
     res_ref, o_ref, gu_ref, acc_ref) = refs[1:]

    i = pl.program_id(0)

    def dot4(x_lo, x_hi, w_ref, s_lo, s_hi, acc):
        packed = w_ref[0].astype(jnp.int32)
        bkp, _ = packed.shape
        rows = bkp // group
        lo = (packed & 0x0F).astype(jnp.float32)
        hi = ((packed >> 4) & 0x0F).astype(jnp.float32)
        for r in range(rows):
            sl = slice(r * group, (r + 1) * group)
            xs_lo = jnp.sum(x_lo[:, sl], axis=1, keepdims=True)
            xs_hi = jnp.sum(x_hi[:, sl], axis=1, keepdims=True)
            acc = acc + s_lo[r][None, :] * (
                jnp.dot(x_lo[:, sl], lo[sl, :],
                        preferred_element_type=jnp.float32) - 8.0 * xs_lo
            )
            acc = acc + s_hi[r][None, :] * (
                jnp.dot(x_hi[:, sl], hi[sl, :],
                        preferred_element_type=jnp.float32) - 8.0 * xs_hi
            )
        return acc

    @pl.when(i < na)
    def _phase_a():
        k = jax.lax.rem(i, nka)

        @pl.when(k == 0)
        def _():
            acc_ref[:, :boa] = jnp.zeros_like(acc_ref[:, :boa])

        inv = inv_ref[:].astype(jnp.float32)  # [BM, 1]
        x_lo = (x_lo_ref[:].astype(jnp.float32) * inv
                * ln_lo_ref[0].astype(jnp.float32))
        x_hi = (x_hi_ref[:].astype(jnp.float32) * inv
                * ln_hi_ref[0].astype(jnp.float32))
        acc_ref[:, :boa] = dot4(
            x_lo, x_hi, guw_ref,
            gus_lo_ref[0].astype(jnp.float32),
            gus_hi_ref[0].astype(jnp.float32), acc_ref[:, :boa])

        @pl.when(k == nka - 1)
        def _():
            o = jax.lax.div(i, nka)
            for j in range(boa // tw):
                gu_ref[o * (boa // tw) + j] = acc_ref[:, j * tw:(j + 1) * tw]

    @pl.when(i >= na)
    def _phase_b():
        ib = i - na
        k = jax.lax.rem(ib, nkb)

        @pl.when(k == 0)
        def _():
            acc_ref[:, :bob] = jnp.zeros_like(acc_ref[:, :bob])

        def silu_mul(g_t, u_t):
            g = gu_ref[g_t]
            return g * jax.nn.sigmoid(g) * gu_ref[u_t]

        # down's lo plane inputs are silu(g)*u cols [k*tw, +tw); the hi
        # plane is offset by I/2 (= n_h tiles). gate tiles 0..n_i-1, up
        # tiles n_i..2n_i-1 in scratch.
        x_lo = silu_mul(k, n_i + k)
        x_hi = silu_mul(n_h + k, n_i + n_h + k)
        acc_ref[:, :bob] = dot4(
            x_lo, x_hi, dnw_ref,
            dns_lo_ref[0].astype(jnp.float32),
            dns_hi_ref[0].astype(jnp.float32), acc_ref[:, :bob])

        @pl.when(k == nkb - 1)
        def _():
            o_ref[:] = (acc_ref[:, :bob]
                        + res_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _pick_pow2_divisor(out: int, target: int = 4096):
    """Largest power-of-two <= target dividing `out`, or None. Unlike
    _pick_bo this NEVER falls back to a non-divisor — a non-dividing
    output tile would leave the tail columns of a Pallas output
    unwritten (silent garbage, not an error)."""
    for bo in (4096, 2048, 1024, 512, 256, 128):
        if bo <= target and out % bo == 0:
            return bo
    return None


MLP_MEGA_BOA = 2048  # phase-A/B output tile targets: 4096 tiles put the
MLP_MEGA_BOB = 2048  # double-buffered weight blocks alone at 16 MB and
# the real v5e compile dies with "scoped vmem limit exceeded" (19.35M >
# 16.00M) — a failure interpret-mode tests can't see. 2048 halves every
# weight/scale block (~10 MB total); same HBM bytes, 2x grid steps.


def _mlp_vmem_bytes(bm, bka, bkb, boa, bob, rows_a, rows_b, out2i, tw):
    """Scoped-VMEM estimate for the mega-kernel: every BlockSpec block is
    double-buffered by the Pallas pipeline; scratch is single."""
    dbuf = 2 * (
        2 * (bm * bka * 2 + bka)          # x lo/hi (bf16) + ln rows
        + bm * 4                           # invrms
        + bka * boa + bkb * bob            # weight blocks (packed int8)
        + 2 * (rows_a * boa + rows_b * bob) * 4  # scale planes f32
        + 2 * bm * bob * 2                 # residual + output (bf16)
    )
    scratch = (out2i // tw) * bm * tw * 4 + bm * max(boa, bob) * 4
    return dbuf + scratch


def mlp_supported(H: int, I: int, group: int, bk: int = 1024,
                  vmem_budget: int = 14 << 20, batch: int = 8) -> bool:
    """Shape gate for mlp_fused_int4_stacked (see its tiling contract).

    Includes a scoped-VMEM budget check (default 14 MB of the chip's
    16 MB limit): configs that would blow the Mosaic stack allocation
    gate OFF (falling back to the 2-call fused path) instead of crashing
    the TPU compile helper. `batch` must be the caller's actual M — the
    kernel's M-tile is _round_up(M, 8) and the bm-scaled VMEM terms
    (gate_up scratch, x/res/out blocks) grow ~3.4 MB between bm=8 and
    bm=32 at flagship shapes (advisor finding, round 3)."""
    tw = bk
    if H % (2 * group) or I % (2 * group):
        return False
    if (H // 2) % 128 or (I // 2) % 128:
        # row-padded stacks (quantize_weight's odd-64-lane pad) don't
        # match the mega kernel's whole-activation tiling — the 2-call
        # fused path (which pads x internally) handles them
        return False
    bka = _pick_bk(H // 2, group, bk)
    bkb = _pick_bk(I // 2, group, bk)
    if not ((bka // group) % 8 == 0 and (bkb // group) % 8 == 0):
        return False
    boa = _pick_bo(2 * I, (H // 2) // bka, target=MLP_MEGA_BOA,
                   min_grid=4)
    bob = _pick_pow2_divisor(H, target=MLP_MEGA_BOB)
    if not (bkb == tw and (I // 2) % tw == 0 and boa % tw == 0
            and bob is not None):
        return False
    vmem = _mlp_vmem_bytes(_round_up(max(batch, 1), 8), bka, bkb, boa,
                           bob, bka // group, bkb // group, 2 * I, tw)
    return vmem <= vmem_budget


@functools.partial(
    jax.jit, static_argnames=("group", "bm", "bk", "interpret",
                              "gu_sliced", "dn_sliced")
)
def mlp_fused_int4_stacked(
    x: jnp.ndarray,          # [M, H] residual stream (post-attention)
    gu_data: jnp.ndarray,    # [L, H/2, 2I] packed int4
    gu_scales: jnp.ndarray,  # [L, H/group, 2I]
    dn_data: jnp.ndarray,    # [L, I/2, H]
    dn_scales: jnp.ndarray,  # [L, I/group, H]
    ln: jnp.ndarray,         # [L, 1, H] post-attention norm weight
    invrms: jnp.ndarray,     # [M, 1] f32 per-row 1/rms of x
    l: jnp.ndarray,          # traced layer index
    group: int,
    bm: int = 32,
    bk: int = 1024,
    interpret: bool = False,
    gu_sliced: bool = False,  # gu_scales is this layer's [1, ...] slice
    dn_sliced: bool = False,  # dn_scales likewise — see the
    #   scales_sliced note on matmul_dequant_int4_stacked_fused (MSA
    #   re-prefetches small stacked scale arrays every layer iteration)
) -> jnp.ndarray:
    """x + down(silu(g)*u) with [g||u] = gate_up(rms(x)*ln), one call."""
    M, H = x.shape
    L, INPA, OUT2I = gu_data.shape
    I = OUT2I // 2
    _, INPB, OUTH = dn_data.shape
    assert INPA == H // 2 and INPB == I // 2 and OUTH == H
    assert M <= bm, "mega-kernel is decode-shaped: one M tile"
    bm = _round_up(M, 8)
    tw = bk
    bka = _pick_bk(INPA, group, bk)
    bkb = _pick_bk(INPB, group, bk)
    assert bkb == tw and (I // 2) % tw == 0, "see mlp_supported"
    nka = INPA // bka
    nkb = INPB // bkb
    boa = _pick_bo(OUT2I, nka, target=MLP_MEGA_BOA, min_grid=4)
    assert boa % tw == 0
    bob = _pick_pow2_divisor(OUTH, target=MLP_MEGA_BOB)
    assert bob is not None, "see mlp_supported"  # non-divisor tile would
    # leave OUTH tail columns unwritten (silent corruption, round-3 fix)
    noa, nob = OUT2I // boa, OUTH // bob
    na, nb = noa * nka, nob * nkb
    rows_a, rows_b = bka // group, bkb // group
    assert rows_a % 8 == 0 and rows_b % 8 == 0, "see mlp_supported"
    n_i = I // tw        # up-plane tile offset in scratch
    n_h = (I // 2) // tw  # down hi-plane tile offset

    def a_idx(i):
        """(k, o) of phase A, held at the last A block during B."""
        ia = jnp.minimum(i, na - 1)
        return jax.lax.rem(ia, nka), jax.lax.div(ia, nka)

    def b_idx(i):
        """(k, o) of phase B, held at the FIRST B block during A (it
        prefetches while phase A computes)."""
        ib = jnp.clip(i - na, 0, nb - 1)
        return jax.lax.rem(ib, nkb), jax.lax.div(ib, nkb)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(na + nb,),
        in_specs=[
            # x lo/hi planes + ln rows + invrms (phase A prologue)
            pl.BlockSpec((bm, bka), lambda i, l: (0, a_idx(i)[0]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bka), lambda i, l: (l[0], 0, a_idx(i)[0]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bka),
                         lambda i, l, _n=nka: (0, a_idx(i)[0] + _n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bka),
                         lambda i, l, _n=nka: (l[0], 0, a_idx(i)[0] + _n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, l: (0, 0),
                         memory_space=pltpu.VMEM),
            # gate_up weight + scale planes
            pl.BlockSpec((1, bka, boa),
                         lambda i, l: (l[0], a_idx(i)[0], a_idx(i)[1]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows_a, boa),
                         lambda i, l: (0 if gu_sliced else l[0],
                                       a_idx(i)[0], a_idx(i)[1]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows_a, boa),
                         lambda i, l, _n=nka:
                         (0 if gu_sliced else l[0],
                          a_idx(i)[0] + _n, a_idx(i)[1]),
                         memory_space=pltpu.VMEM),
            # down weight + scale planes
            pl.BlockSpec((1, bkb, bob),
                         lambda i, l: (l[0], b_idx(i)[0], b_idx(i)[1]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows_b, bob),
                         lambda i, l: (0 if dn_sliced else l[0],
                                       b_idx(i)[0], b_idx(i)[1]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows_b, bob),
                         lambda i, l, _n=nkb:
                         (0 if dn_sliced else l[0],
                          b_idx(i)[0] + _n, b_idx(i)[1]),
                         memory_space=pltpu.VMEM),
            # residual (phase B epilogue)
            pl.BlockSpec((bm, bob), lambda i, l: (0, b_idx(i)[1]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bob), lambda i, l: (0, b_idx(i)[1]),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((OUT2I // tw, bm, tw), jnp.float32),  # gu
            pltpu.VMEM((bm, max(boa, bob)), jnp.float32),    # acc
        ],
    )
    return pl.pallas_call(
        functools.partial(_mlp_kernel_int4_stacked, na=na, nka=nka,
                          nkb=nkb, boa=boa, bob=bob, tw=tw, group=group,
                          n_i=n_i, n_h=n_h),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, H), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * (H * 2 * I + I * H),
            bytes_accessed=(H * I + I * H // 2) + M * H * 4,
            transcendentals=M * I,
        ),
        interpret=interpret,
    )(jnp.asarray(l, jnp.int32).reshape(1), x, ln, x, ln,
      invrms.astype(jnp.float32), gu_data, gu_scales, gu_scales,
      dn_data, dn_scales, dn_scales, x)
