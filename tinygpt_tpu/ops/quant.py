"""Weight-only quantization: INT8 / INT4 with per-channel or per-group
scales, plus the fused dequant+matmul path.

This is north-star functionality with NO reference implementation — the
reference is FP32/FP16/BF16 only (/root/reference/README.md:17); INT8/INT4
weight-only quant and the fused dequant kernels are TinyGPT TODO-class
capabilities built TPU-native here.

Layout: weights are stored [in, out] (as everywhere in this framework).
Quantization groups run along the `in` (contraction) dim:
  data   int8  [in, out]            (int4: two nibbles packed per byte,
                                     [in/2, out])
  scales fp    [in/group, out]
Dequant: w[i, o] = data[i, o] * scales[i // group, o].

The Pallas kernel fuses dequantization into the matmul so the int8/int4
bytes are the ONLY weight traffic from HBM — decode GEMV is HBM-bound, so
this directly multiplies decode throughput by the compression ratio.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class QuantizedTensor:
    """A quantized [in, out] weight. Pytree: (data, scales) dynamic;
    bits/group static."""

    def __init__(self, data, scales, bits: int, group_size: int,
                 in_dim: int):
        self.data = data          # int8 [in, out] or packed [in/2, out]
        self.scales = scales      # [in/group, out] (float32/bf16)
        self.bits = bits
        self.group_size = group_size
        self.in_dim = in_dim

    @property
    def out_dim(self) -> int:
        return self.data.shape[-1]

    @property
    def shape(self):
        return (self.in_dim, self.out_dim)

    def tree_flatten(self):
        return (self.data, self.scales), (self.bits, self.group_size,
                                          self.in_dim)

    @classmethod
    def tree_unflatten(cls, aux, children):
        data, scales = children
        bits, group_size, in_dim = aux
        return cls(data, scales, bits, group_size, in_dim)

    def __repr__(self):
        return (f"QuantizedTensor(int{self.bits}, {self.shape}, "
                f"group={self.group_size})")


def pack_int4(q: np.ndarray) -> np.ndarray:
    """Pack int4 values in [-8, 7] along axis 0 with the HALF-SPLIT,
    BIASED scheme: values are stored as u = q + 8 in [0, 15]; packed row
    p holds original row p in the low nibble and row p + in/2 in the high
    nibble. Half-split keeps each nibble plane a contiguous row range (the
    Pallas kernel pairs one packed tile with two contiguous x tiles); the
    +8 bias makes unpacking pure mask/shift — the dequant kernel folds
    the bias into a per-group rank-1 correction instead of a per-weight
    sign-extend."""
    assert q.shape[0] % 2 == 0
    half = q.shape[0] // 2
    u = (q.astype(np.int16) + 8).astype(np.uint8)
    return ((u[:half] & 0x0F) | (u[half:] << 4)).astype(np.int8)


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of pack_int4 (jit-friendly): [in/2, out] int8 → [in, out]
    int8 in [-8, 7] (original row order)."""
    u = packed.astype(jnp.uint8)
    lo = (u & 0x0F).astype(jnp.int8) - 8
    hi = ((u >> 4) & 0x0F).astype(jnp.int8) - 8
    return jnp.concatenate([lo, hi], axis=0)


def _pack_int4_jnp(q: jnp.ndarray) -> jnp.ndarray:
    """pack_int4 on device (same half-split biased scheme), leading-dim
    agnostic: packs along axis -2."""
    half = q.shape[-2] // 2
    u = (q.astype(jnp.int32) + 8).astype(jnp.uint8)
    lo = u[..., :half, :] & 0x0F
    hi = u[..., half:, :] << 4
    return (lo | hi).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("bits", "g"))
def _quantize_core(w, bits: int, g: int):
    """Symmetric per-group quantization on device. w: [in, out] or
    [L, in, out]. Stacked weights quantize layer-by-layer via lax.map so
    the f32 working set stays one layer large (a 7B gate_up stack would
    otherwise materialize ~15 GB of f32)."""
    in_dim, out_dim = w.shape[-2], w.shape[-1]
    qmax = 127.0 if bits == 8 else 7.0

    def one(w2):  # [in, out]
        wg = w2.astype(jnp.float32).reshape(in_dim // g, g, out_dim)
        absmax = jnp.abs(wg).max(axis=-2)  # [in/g, out]
        scales = jnp.where(absmax == 0, 1e-8, absmax / qmax)
        q = jnp.clip(
            jnp.round(wg / scales[:, None, :]), -qmax - 1, qmax
        ).astype(jnp.int8).reshape(in_dim, out_dim)
        data = _pack_int4_jnp(q) if bits == 4 else q
        return data, scales

    if w.ndim == 2:
        return one(w)
    return jax.lax.map(one, w)


def quantize_weight(
    w,  # [in, out] float (numpy or jax)
    bits: int = 8,
    group_size: Optional[int] = None,
    scale_dtype=jnp.float32,
) -> QuantizedTensor:
    """Symmetric per-group (or per-channel when group_size=None) quant.
    Runs on device — host-side numpy converts GB-scale weights at
    single-core speed.

    int4 contraction dims that are an odd multiple of 64 lanes (e.g.
    Qwen2.5-0.5B H=896 → packed rows 448, no legal Mosaic tile — see
    int4_lowerable) are ZERO-PADDED to the next 256 multiple before
    packing, so the packed kernels always lower. Pad rows contribute
    exactly 0 (zero weight rows; the matmul wrappers pad x with zeros to
    match), the QuantizedTensor's in_dim reports the PADDED dim, and the
    pad costs in_p/in_dim − 1 extra weight bytes (~14% at 896 → 1024 —
    still far cheaper than the unfused XLA fallback it replaces,
    measured 813 tok/s unfused vs 2,216 int8-fused on the 0.5B)."""
    assert bits in (8, 4)
    in_dim, out_dim = w.shape[-2], w.shape[-1]
    if bits == 4 and (in_dim // 2) % 128:
        in_p = -(-in_dim // 256) * 256
        widths = [(0, 0)] * (w.ndim - 2) + [(0, in_p - in_dim), (0, 0)]
        w = jnp.pad(jnp.asarray(w), widths)
        in_dim = in_p
    g = min(group_size or in_dim, in_dim)  # clamp: small projections
    if bits == 4:
        # the packed kernel needs whole groups inside each nibble plane
        g = min(g, in_dim // 2)
    if in_dim % g:
        raise ValueError(f"in_dim {in_dim} not divisible by group {g}")
    data, scales = _quantize_core(jnp.asarray(w), bits, g)
    return QuantizedTensor(
        data, scales.astype(scale_dtype),
        bits=bits, group_size=g, in_dim=in_dim,
    )


def _unpack_int4_lead(packed: jnp.ndarray) -> jnp.ndarray:
    """unpack_int4 along axis -2, any leading dims."""
    u = packed.astype(jnp.uint8)
    lo = (u & 0x0F).astype(jnp.int8) - 8
    hi = ((u >> 4) & 0x0F).astype(jnp.int8) - 8
    return jnp.concatenate([lo, hi], axis=-2)


def dequantize(qt: QuantizedTensor, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Reference full dequantization (tests / CPU fallback). Handles any
    leading dims (stacked [L, ...] and MoE [L, E, ...] layouts)."""
    data = qt.data if qt.bits == 8 else _unpack_int4_lead(qt.data)
    g = qt.group_size
    lead = data.shape[:-2]
    w = data.astype(jnp.float32).reshape(
        *lead, qt.in_dim // g, g, qt.out_dim
    )
    w = w * qt.scales.astype(jnp.float32)[..., :, None, :]
    return w.reshape(*lead, qt.in_dim, qt.out_dim).astype(dtype)


# -- fused dequant matmul -----------------------------------------------------


def _matmul_dequant_reference(x: jnp.ndarray, qt: QuantizedTensor) -> jnp.ndarray:
    w = dequantize(qt, dtype=jnp.bfloat16)
    return (x @ w.astype(x.dtype))


def _use_pallas() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def pad_x_to(x2: jnp.ndarray, in_dim: int) -> jnp.ndarray:
    """Zero-pad activations to a quantized weight's (row-padded)
    contraction dim — see quantize_weight's odd-64-lane note. Pad rows
    of the weight are zero, so the padded columns contribute exactly 0."""
    pad = in_dim - x2.shape[-1]
    if not pad:
        return x2
    widths = [(0, 0)] * (x2.ndim - 1) + [(0, pad)]
    return jnp.pad(x2, widths)


def matmul_dequant(x: jnp.ndarray, qt: QuantizedTensor) -> jnp.ndarray:
    """x [..., in] @ dequant(qt) → [..., out], fusing dequant into the
    matmul. Dispatches to the Pallas TPU kernel; falls back to the XLA
    reference path elsewhere (tests run it in interpret mode too)."""
    from tinygpt_tpu.ops.quant_kernels import (
        int4_lowerable,
        matmul_dequant_tpu,
    )

    lead = x.shape[:-1]
    x2 = pad_x_to(x.reshape(-1, x.shape[-1]), qt.in_dim)
    if _use_pallas() and (qt.bits != 4 or int4_lowerable(qt.in_dim)):
        out = matmul_dequant_tpu(x2, qt)
    else:
        out = _matmul_dequant_reference(x2, qt)
    return out.reshape(*lead, qt.out_dim)


def matmul_any(x: jnp.ndarray, w) -> jnp.ndarray:
    """Matmul against either a plain array or a QuantizedTensor — the
    single call-site hook the model layers use."""
    if isinstance(w, QuantizedTensor):
        return matmul_dequant(x, w)
    return x @ w


def matmul_dequant_stacked(x: jnp.ndarray, qt: QuantizedTensor,
                           l) -> jnp.ndarray:
    """x [..., in] @ dequant(qt[l]) for a STACKED [L, in, out] quantized
    weight and a traced layer index l. On TPU the layer index reaches the
    Pallas kernel as a prefetched scalar, so the stacked bytes stream
    straight from HBM (a lax.scan `xs` slice would force XLA to copy each
    layer's weights across the custom-call boundary every iteration,
    doubling weight traffic — profiled, see quant_kernels.py)."""
    from tinygpt_tpu.ops.quant_kernels import (
        int4_lowerable,
        matmul_dequant_stacked_tpu,
    )

    lead = x.shape[:-1]
    x2 = pad_x_to(x.reshape(-1, x.shape[-1]), qt.in_dim)
    if _use_pallas() and (qt.bits != 4 or int4_lowerable(qt.in_dim)):
        out = matmul_dequant_stacked_tpu(x2, qt, l)
    else:
        qt_l = QuantizedTensor(qt.data[l], qt.scales[l], qt.bits,
                               qt.group_size, qt.in_dim)
        out = _matmul_dequant_reference(x2, qt_l)
    return out.reshape(*lead, qt.out_dim)


# -- whole-model quantization --------------------------------------------------

# stacked per-layer matmul weights ([L, in, out]) eligible for weight-only
# quantization, per model family
_QUANT_KEYS = {"qkv_w", "o_w", "gate_up_w", "down_w", "fc_w", "proj_w"}
# MoE expert stacks ([L, E, in, out]) — quantized via the flattened
# [L*E, in, out] layout (groups run along `in`, so per-expert quant is
# identical), reshaped back so the gathered kernels index (layer, expert)
_QUANT_MOE_KEYS = {"moe_gate_up_w", "moe_down_w"}


def _quantize_moe_stacked(w, bits: int,
                          group_size: Optional[int]) -> QuantizedTensor:
    L, E, in_dim, out_dim = w.shape
    qt = quantize_weight(jnp.asarray(w).reshape(L * E, in_dim, out_dim),
                         bits=bits, group_size=group_size)
    return QuantizedTensor(
        qt.data.reshape(L, E, -1, out_dim),
        qt.scales.reshape(L, E, -1, out_dim),
        # qt.in_dim, NOT the caller's: odd-64-lane dims row-pad inside
        # quantize_weight and in_dim must report the padded rows
        bits=qt.bits, group_size=qt.group_size, in_dim=qt.in_dim,
    )


def _quantize_stacked(w, bits: int, group_size: Optional[int]) -> QuantizedTensor:
    """Quantize a stacked [L, in, out] weight in one device program (the
    group axis is per-layer, so the stacked form quantizes identically to
    layer-by-layer), so lax.scan slices out one QuantizedTensor per
    layer."""
    return quantize_weight(jnp.asarray(w), bits=bits, group_size=group_size)


def quantize_params(
    params: dict,
    bits: int = 8,
    group_size: Optional[int] = 128,
    quantize_lm_head: bool = True,
) -> dict:
    """Convert a loaded param pytree to weight-only quantized form.
    Norm weights, biases, embeddings and rope tables stay in float.

    With tied embeddings the lm_head matmul would read the full-precision
    embed table every decode step (the single largest weight) — so a
    quantized TRANSPOSED copy is materialized for the head while the
    float table stays for the (traffic-free) embedding gather. Costs
    bits/16 of the table in extra HBM, saves its bf16 read per step."""
    out = dict(params)
    layers = dict(params["layers"])
    moe_int8 = set()
    if bits == 4:
        from tinygpt_tpu.ops.quant_kernels import int4_lowerable

        # DENSE weights with odd-64-lane contraction dims (H=896 etc.)
        # no longer fall off the fused path: quantize_weight zero-pads
        # their rows to the next 256 multiple so every packed kernel
        # lowers (the matmul wrappers pad x to match). MoE expert stacks
        # keep the int8 fallback: the gathered kernels are the only
        # gather-free decode route and take no row padding yet.
        moe_int8 = {k for k, w in layers.items()
                    if k in _QUANT_MOE_KEYS
                    and not int4_lowerable(w.shape[-2])}
        if moe_int8:
            import logging

            logging.getLogger("tinygpt_tpu.quant").warning(
                "int4 gathered kernels cannot lower for %s (contraction "
                "dim an odd multiple of 64 lanes): these MoE expert "
                "stacks quantize at int8 instead", sorted(moe_int8))
    for key, w in layers.items():
        if key in _QUANT_KEYS:
            layers[key] = _quantize_stacked(w, bits, group_size)
        elif key in _QUANT_MOE_KEYS:
            layers[key] = _quantize_moe_stacked(
                w, 8 if key in moe_int8 else bits, group_size)
    out["layers"] = layers
    head = params.get("lm_head")
    if quantize_lm_head:
        if head is not None:
            out["lm_head"] = quantize_weight(pad_head_out(head), bits=bits,
                                             group_size=group_size)
        elif "embed" in params:  # tied: quantize a transposed copy
            out["lm_head"] = quantize_weight(
                pad_head_out(jnp.asarray(params["embed"]).T), bits=bits,
                group_size=group_size,
            )
    return out


HEAD_PAD_MULTIPLE = 2048


def pad_head_out(w) -> jnp.ndarray:
    """Zero-pad the lm_head's OUT (vocab) dim to a 2048 multiple before
    quantization. The packed kernels need a power-of-two output tile that
    divides OUT; a vocab like Qwen's 151936 = 2^7*1187 only tiles at
    bo=128, whose 128-byte DMA runs measured 189 GB/s vs ~600 at 2048+
    (PROFILE_r05_qwen3.json head phase). Zero columns are exact under the
    biased-nibble encoding (q=0, scale placeholder -> logits exactly 0);
    every model head path slices [..., :vocab_size] after the matmul so
    pad columns can never win sampling. ~1% extra head bytes."""
    V = w.shape[-1]
    pad = -V % HEAD_PAD_MULTIPLE
    if not pad:
        return jnp.asarray(w)
    return jnp.pad(jnp.asarray(w), ((0, 0), (0, pad)))
