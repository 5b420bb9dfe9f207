"""Quantization tests: pack/unpack roundtrip, dequant error bounds, fused
kernel parity (interpret mode on CPU) for int8/int4, model-level accuracy."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tinygpt_tpu.ops.quant import (
    QuantizedTensor,
    dequantize,
    matmul_any,
    pack_int4,
    quantize_weight,
    unpack_int4,
)
from tinygpt_tpu.ops.quant_kernels import (
    matmul_dequant_int4,
    matmul_dequant_int8,
)


def test_int4_pack_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.integers(-8, 8, (64, 32)).astype(np.int8)
    packed = pack_int4(q)
    assert packed.shape == (32, 32)
    back = np.asarray(unpack_int4(jnp.asarray(packed)))
    np.testing.assert_array_equal(back, q)


@pytest.mark.parametrize("bits,group", [(8, None), (8, 64), (4, 64), (4, 32)])
def test_quantize_dequant_error(bits, group):
    rng = np.random.default_rng(1)
    w = rng.standard_normal((256, 128)).astype(np.float32) * 0.05
    qt = quantize_weight(w, bits=bits, group_size=group)
    back = np.asarray(dequantize(qt, dtype=jnp.float32))
    err = np.abs(back - w).max()
    step = np.abs(w).max() / (127 if bits == 8 else 7)
    assert err <= step  # max error is one quantization step of the group max


@pytest.mark.parametrize("bits,group,M", [
    (8, 64, 16), (8, 128, 100), (4, 64, 16), (4, 32, 100),
])
def test_fused_kernel_matches_reference(bits, group, M):
    """Pallas kernel (interpret mode) vs explicit dequant matmul."""
    rng = np.random.default_rng(2)
    IN, OUT = 256, 384
    w = rng.standard_normal((IN, OUT)).astype(np.float32) * 0.05
    x = rng.standard_normal((M, IN)).astype(np.float32)
    qt = quantize_weight(w, bits=bits, group_size=group)
    ref = np.asarray(x @ np.asarray(dequantize(qt, dtype=jnp.float32)))
    if bits == 8:
        got = matmul_dequant_int8(
            jnp.asarray(x), qt.data, qt.scales, group=qt.group_size,
            interpret=True,
        )
    else:
        got = matmul_dequant_int4(
            jnp.asarray(x), qt.data, qt.scales, group=qt.group_size,
            interpret=True,
        )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("bits,group,M,x_dtype", [
    (8, 64, 16, "float32"), (4, 64, 16, "float32"), (4, 32, 4, "float32"),
    # bf16 activations select the bf16 MXU operand path (mxu_dtype) —
    # exercised here under interpret's f32 fallback AND the dtype gate
    (8, 64, 16, "bfloat16"), (4, 64, 16, "bfloat16"),
    # M > 32 engages the prefill-shaped dequant_full branch (whole-block
    # VMEM dequant + one full-K dot instead of per-group K=64 dots)
    (8, 64, 40, "float32"), (4, 64, 40, "float32"),
    (4, 32, 40, "bfloat16"),
])
def test_stacked_kernel_matches_reference(bits, group, M, x_dtype):
    """Scalar-prefetch stacked-layer kernels (interpret mode) vs explicit
    per-layer dequant matmul, for every layer index."""
    from tinygpt_tpu.ops.quant_kernels import (
        matmul_dequant_int4_stacked,
        matmul_dequant_int8_stacked,
    )

    rng = np.random.default_rng(7)
    L, IN, OUT = 3, 256, 384
    w = rng.standard_normal((L, IN, OUT)).astype(np.float32) * 0.05
    x = rng.standard_normal((M, IN)).astype(np.float32)
    if x_dtype == "bfloat16":
        x = np.asarray(jnp.asarray(x).astype(jnp.bfloat16)
                       ).astype(np.float32)
    qt = quantize_weight(w, bits=bits, group_size=group)
    for l in range(L):
        qt_l = QuantizedTensor(qt.data[l], qt.scales[l], bits,
                               qt.group_size, IN)
        ref = np.asarray(x @ np.asarray(dequantize(qt_l, dtype=jnp.float32)))
        xk = jnp.asarray(x).astype(x_dtype)
        if bits == 8:
            got = matmul_dequant_int8_stacked(
                xk, qt.data, qt.scales,
                jnp.asarray(l, jnp.int32), group=qt.group_size,
                interpret=True,
            )
        else:
            got = matmul_dequant_int4_stacked(
                xk, qt.data, qt.scales,
                jnp.asarray(l, jnp.int32), group=qt.group_size,
                interpret=True,
            )
        # bf16 x means a bf16 OUTPUT (dtype follows x): the final
        # accumulator->bf16 rounding adds up to one bf16 ulp (2^-8 rel)
        tol = 8e-3 if x_dtype == "bfloat16" else 2e-3
        np.testing.assert_allclose(np.asarray(got), ref, rtol=tol,
                                   atol=tol, err_msg=f"layer {l}")


def test_stacked_fused_kernel_matches_composition():
    """Fused ln/silu/residual options of the stacked int4 kernel
    (interpret mode) vs the explicit XLA composition."""
    from tinygpt_tpu.ops.quant_kernels import (
        matmul_dequant_int4_stacked_fused,
    )

    rng = np.random.default_rng(13)
    L, IN, OUT, M, G = 2, 256, 384, 4, 64
    w = rng.standard_normal((L, IN, OUT)).astype(np.float32) * 0.05
    qt = quantize_weight(w, bits=4, group_size=G)
    wd = [np.asarray(dequantize(
        QuantizedTensor(qt.data[i], qt.scales[i], 4, G, IN), jnp.float32))
        for i in range(L)]
    x = rng.standard_normal((M, IN)).astype(np.float32)
    ln = rng.standard_normal((L, 1, IN)).astype(np.float32)
    res = rng.standard_normal((M, OUT)).astype(np.float32)
    gate_up = rng.standard_normal((M, 2 * IN)).astype(np.float32) * 0.5

    def silu(v):
        return v / (1 + np.exp(-v))

    for l in range(L):
        li = jnp.asarray(l, jnp.int32)
        # ln + invrms prologue
        inv = 1.0 / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-6)
        ref = (x * inv * ln[l]) @ wd[l]
        got = matmul_dequant_int4_stacked_fused(
            jnp.asarray(x), qt.data, qt.scales, li, group=G,
            ln=jnp.asarray(ln), invrms=jnp.asarray(inv), interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3,
                                   atol=2e-3, err_msg=f"ln l={l}")
        # silu(gate)*up prologue + residual epilogue
        ref = silu(gate_up[:, :IN]) * gate_up[:, IN:] @ wd[l] + res
        got = matmul_dequant_int4_stacked_fused(
            jnp.asarray(gate_up), qt.data, qt.scales, li, group=G,
            silu=True, res=jnp.asarray(res), interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3,
                                   atol=2e-3, err_msg=f"silu l={l}")
        # ln prologue + per-layer bias epilogue (qwen2 qkv path)
        bias = rng.standard_normal((L, 1, OUT)).astype(np.float32)
        inv = 1.0 / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-6)
        ref = (x * inv * ln[l]) @ wd[l] + bias[l]
        got = matmul_dequant_int4_stacked_fused(
            jnp.asarray(x), qt.data, qt.scales, li, group=G,
            ln=jnp.asarray(ln), invrms=jnp.asarray(inv),
            bias=jnp.asarray(bias), interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3,
                                   atol=2e-3, err_msg=f"bias l={l}")


@pytest.mark.parametrize(
    "L,IN,Nq,Nk",
    [
        (2, 256, 6, 1),     # tiny: bo=256, q||k/v boundary 896 mid-tile
        (1, 4096, 32, 8),   # flagship qkv shape: bo=2048, boundary 5120
        # mid-tile (the per-head rope gate, not tile-aligned)
    ],
)
def test_stacked_fused_rope_epilogue_matches_xla_rope(L, IN, Nq, Nk):
    """RoPE folded into the fused qkv kernel's epilogue (interpret mode)
    vs the XLA apply_rope_gathered on the kernel's unroped output —
    q||k columns rotated, v columns untouched, incl. tiles where the
    q||k / v boundary falls mid-tile (head-granular gating)."""
    from tinygpt_tpu.ops.quant_kernels import (
        matmul_dequant_int4_stacked_fused,
        rope_fuse_supported,
    )
    from tinygpt_tpu.ops.rope import apply_rope_gathered, compute_rope_freqs

    rng = np.random.default_rng(17)
    M, G, D = 4, 64, 128
    OUT = (Nq + 2 * Nk) * D
    assert rope_fuse_supported(IN, Nq * D, Nk * D, D, G, M)
    w = rng.standard_normal((L, IN, OUT)).astype(np.float32) * 0.05
    qt = quantize_weight(w, bits=4, group_size=G)
    x = rng.standard_normal((M, IN)).astype(np.float32)
    ln = rng.standard_normal((L, 1, IN)).astype(np.float32)
    bias = rng.standard_normal((L, 1, OUT)).astype(np.float32)
    cos, sin = compute_rope_freqs(D, 64)
    positions = np.array([3, 11, 0, 42], np.int32)
    cos_r = jnp.asarray(cos[positions])  # [M, D]
    sin_r = jnp.asarray(sin[positions])
    inv = 1.0 / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-6)
    for l in range(L):
        li = jnp.asarray(l, jnp.int32)
        base = matmul_dequant_int4_stacked_fused(
            jnp.asarray(x), qt.data, qt.scales, li, group=G,
            ln=jnp.asarray(ln), invrms=jnp.asarray(inv),
            bias=jnp.asarray(bias), interpret=True,
        )
        got = matmul_dequant_int4_stacked_fused(
            jnp.asarray(x), qt.data, qt.scales, li, group=G,
            ln=jnp.asarray(ln), invrms=jnp.asarray(inv),
            bias=jnp.asarray(bias), rope_cos=cos_r, rope_sin=sin_r,
            rope_heads=Nq + Nk, rope_dim=D, interpret=True,
        )
        q = np.asarray(base)[:, : Nq * D].reshape(M, 1, Nq, D)
        k = np.asarray(base)[:, Nq * D : (Nq + Nk) * D].reshape(M, 1, Nk, D)
        qr, kr = apply_rope_gathered(
            jnp.asarray(q), jnp.asarray(k),
            cos_r[:, None, None, :], sin_r[:, None, None, :])
        ref = np.concatenate(
            [np.asarray(qr).reshape(M, -1), np.asarray(kr).reshape(M, -1),
             np.asarray(base)[:, (Nq + Nk) * D :]], axis=1)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3,
                                   atol=2e-3, err_msg=f"rope l={l}")


@pytest.mark.parametrize(
    "L,IN,Nq,Nk",
    [
        (2, 256, 6, 1),     # boundary mid-tile
        (1, 2048, 16, 8),   # qwen3-1.7B qkv shape (the fusion's target)
    ],
)
def test_stacked_fused_qk_norm_epilogue_matches_xla(L, IN, Nq, Nk):
    """Per-head qk RMSNorm (qwen3) fused into the rope epilogue
    (interpret mode) vs the XLA composition on the kernel's raw output:
    q heads normed with q_norm, k heads with k_norm — both pre-rope —
    v heads untouched."""
    from tinygpt_tpu.ops.quant_kernels import (
        matmul_dequant_int4_stacked_fused,
        rope_fuse_supported,
    )
    from tinygpt_tpu.ops.norms import rms_norm
    from tinygpt_tpu.ops.rope import apply_rope_gathered, compute_rope_freqs

    rng = np.random.default_rng(23)
    M, G, D = 4, 64, 128
    EPS = 1e-6
    OUT = (Nq + 2 * Nk) * D
    assert rope_fuse_supported(IN, Nq * D, Nk * D, D, G, M)
    w = rng.standard_normal((L, IN, OUT)).astype(np.float32) * 0.05
    qt = quantize_weight(w, bits=4, group_size=G)
    x = rng.standard_normal((M, IN)).astype(np.float32)
    ln = rng.standard_normal((L, 1, IN)).astype(np.float32)
    qn = (1 + 0.1 * rng.standard_normal((L, D))).astype(np.float32)
    kn = (1 + 0.1 * rng.standard_normal((L, D))).astype(np.float32)
    cos, sin = compute_rope_freqs(D, 64)
    positions = np.array([3, 11, 0, 42], np.int32)
    cos_r = jnp.asarray(cos[positions])
    sin_r = jnp.asarray(sin[positions])
    inv = 1.0 / np.sqrt((x ** 2).mean(-1, keepdims=True) + EPS)
    for l in range(L):
        li = jnp.asarray(l, jnp.int32)
        base = matmul_dequant_int4_stacked_fused(
            jnp.asarray(x), qt.data, qt.scales, li, group=G,
            ln=jnp.asarray(ln), invrms=jnp.asarray(inv), interpret=True,
        )
        got = matmul_dequant_int4_stacked_fused(
            jnp.asarray(x), qt.data, qt.scales, li, group=G,
            ln=jnp.asarray(ln), invrms=jnp.asarray(inv),
            rope_cos=cos_r, rope_sin=sin_r,
            rope_heads=Nq + Nk, rope_dim=D,
            qk_norm_w=(jnp.asarray(qn), jnp.asarray(kn)),
            qk_heads=Nq, eps=EPS, interpret=True,
        )
        q = np.asarray(base)[:, : Nq * D].reshape(M, 1, Nq, D)
        k = np.asarray(base)[:, Nq * D : (Nq + Nk) * D].reshape(M, 1, Nk, D)
        qn_x = rms_norm(jnp.asarray(q), jnp.asarray(qn[l]), EPS)
        kn_x = rms_norm(jnp.asarray(k), jnp.asarray(kn[l]), EPS)
        qr, kr = apply_rope_gathered(
            qn_x, kn_x, cos_r[:, None, None, :], sin_r[:, None, None, :])
        ref = np.concatenate(
            [np.asarray(qr).reshape(M, -1), np.asarray(kr).reshape(M, -1),
             np.asarray(base)[:, (Nq + Nk) * D :]], axis=1)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3,
                                   atol=2e-3, err_msg=f"qk-norm l={l}")


def test_int4_odd64_lane_padding():
    """Odd-64-lane contraction dims (Qwen2.5-0.5B's H=896 family):
    quantize_weight row-pads to the next 256 multiple so the packed
    kernels lower; the wrappers pad x to match. Checks (a) the padded
    reference path equals the float matmul up to quant noise, (b) the
    packed kernel (interpret) equals the padded reference exactly-ish,
    (c) the fused stacked kernel pads internally for ln and silu
    prologues."""
    from tinygpt_tpu.ops.quant import matmul_dequant
    from tinygpt_tpu.ops.quant_kernels import (
        matmul_dequant_int4,
        matmul_dequant_int4_stacked_fused,
    )

    rng = np.random.default_rng(31)
    IN, OUT, M, G = 192, 256, 4, 64  # IN/2 = 96, not 128-divisible
    w = rng.standard_normal((IN, OUT)).astype(np.float32) * 0.05
    qt = quantize_weight(w, bits=4, group_size=G)
    assert qt.in_dim == 256 and qt.data.shape == (128, OUT)
    x = rng.standard_normal((M, IN)).astype(np.float32)

    ref_f = x @ w
    got = np.asarray(matmul_dequant(jnp.asarray(x), qt))
    assert got.shape == (M, OUT)
    # int4 g64 quant noise on random weights; the exact check is below
    np.testing.assert_allclose(got, ref_f, rtol=0, atol=0.4)

    # kernel vs the dequantize-based reference on the same padded tensor
    xp = np.pad(x, ((0, 0), (0, 64)))
    ref_q = xp @ np.asarray(dequantize(qt, jnp.float32))
    kern = np.asarray(matmul_dequant_int4(
        jnp.asarray(xp), qt.data, qt.scales, group=G, interpret=True))
    np.testing.assert_allclose(kern, ref_q, rtol=2e-3, atol=2e-3)

    # fused stacked wrapper pads x and ln internally (unpadded inputs)
    L = 2
    ws = rng.standard_normal((L, IN, OUT)).astype(np.float32) * 0.05
    qs = quantize_weight(ws, bits=4, group_size=G)
    ln = rng.standard_normal((L, 1, IN)).astype(np.float32)
    inv = 1.0 / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-6)
    for l in range(L):
        wd = np.asarray(dequantize(
            QuantizedTensor(qs.data[l], qs.scales[l], 4, G, qs.in_dim),
            jnp.float32))
        ref = np.pad(x * inv * ln[l], ((0, 0), (0, 64))) @ wd
        got = np.asarray(matmul_dequant_int4_stacked_fused(
            jnp.asarray(x), qs.data, qs.scales, jnp.asarray(l, jnp.int32),
            group=G, ln=jnp.asarray(ln), invrms=jnp.asarray(inv),
            interpret=True))
        np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3,
                                   err_msg=f"fused ln l={l}")
    # silu prologue: gate||up segments pad independently
    gate_up = rng.standard_normal((M, 2 * IN)).astype(np.float32) * 0.5

    def silu(v):
        return v / (1 + np.exp(-v))

    act = silu(gate_up[:, :IN]) * gate_up[:, IN:]
    for l in range(L):
        wd = np.asarray(dequantize(
            QuantizedTensor(qs.data[l], qs.scales[l], 4, G, qs.in_dim),
            jnp.float32))
        ref = np.pad(act, ((0, 0), (0, 64))) @ wd
        got = np.asarray(matmul_dequant_int4_stacked_fused(
            jnp.asarray(gate_up), qs.data, qs.scales,
            jnp.asarray(l, jnp.int32), group=G, silu=True,
            interpret=True))
        np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3,
                                   err_msg=f"fused silu l={l}")


def test_int4_odd64_model_forward(tmp_path):
    """Model-level: an H=896-family architecture (hidden an odd multiple
    of 64) quantizes at int4 without warnings and its forward tracks the
    float model — the path Qwen2.5-0.5B takes (geometry previously
    warned + fell back to the unfused XLA dequant)."""
    from tinygpt_tpu.engine.kv_cache import create_kv_cache
    from tinygpt_tpu.hf.config import parse_model_config
    from tinygpt_tpu.models import causal_lm
    from tinygpt_tpu.ops.quant import quantize_params

    cfg = parse_model_config({
        "model_type": "qwen2", "vocab_size": 512, "hidden_size": 192,
        "num_hidden_layers": 2, "num_attention_heads": 3,
        "num_key_value_heads": 1, "intermediate_size": 320,
        "max_position_embeddings": 128, "rope_theta": 10000.0,
        "rms_norm_eps": 1e-6, "tie_word_embeddings": False,
    })
    params = causal_lm.init_params(cfg, seed=5, dtype=jnp.float32)
    qparams = quantize_params(params, bits=4, group_size=32)
    assert qparams["layers"]["qkv_w"].in_dim == 256  # padded from 192
    assert qparams["layers"]["down_w"].in_dim == 512  # padded from 320
    # (next 256 multiple: the packed planes need 128-divisible rows)

    rng = np.random.default_rng(2)
    ids = rng.integers(0, cfg.vocab_size, (2, 8))
    pos = jnp.broadcast_to(jnp.arange(8), (2, 8))
    vld = jnp.ones((2, 8), jnp.bool_)
    cache = create_kv_cache(cfg, 2, 16, dtype=jnp.float32)
    ref, _ = causal_lm.forward(params, cfg, jnp.asarray(ids), cache,
                               pos, vld)
    cache = create_kv_cache(cfg, 2, 16, dtype=jnp.float32)
    got, _ = causal_lm.forward(qparams, cfg, jnp.asarray(ids), cache,
                               pos, vld)
    assert got.shape == ref.shape
    agree = (np.asarray(ref).argmax(-1) == np.asarray(got).argmax(-1)).mean()
    assert agree > 0.6, agree


def test_matmul_any_dispatch():
    rng = np.random.default_rng(3)
    w = rng.standard_normal((128, 64)).astype(np.float32) * 0.05
    x = rng.standard_normal((2, 5, 128)).astype(np.float32)
    qt = quantize_weight(w, bits=8, group_size=64)
    plain = np.asarray(matmul_any(jnp.asarray(x), jnp.asarray(w)))
    quant = np.asarray(matmul_any(jnp.asarray(x), qt))
    assert quant.shape == plain.shape == (2, 5, 64)
    # int8 with small weights: close but not equal
    assert np.abs(plain - quant).max() < 0.05
    assert np.abs(plain - quant).max() > 0  # actually quantized


def test_quantized_tensor_is_pytree():
    w = np.ones((64, 32), np.float32)
    qt = quantize_weight(w, bits=8, group_size=32)
    leaves, treedef = jax.tree.flatten(qt)
    assert len(leaves) == 2
    qt2 = jax.tree.unflatten(treedef, leaves)
    assert isinstance(qt2, QuantizedTensor)
    assert qt2.bits == 8 and qt2.group_size == 32

    # stackable for lax.scan (the model stacks per-layer weights)
    stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), qt, qt2)
    assert stacked.data.shape == (2, 64, 32)


def test_mlp_mega_kernel_matches_composition():
    """mlp_fused_int4_stacked (one-call gate_up+silu+down, interpret
    mode) vs the explicit XLA/numpy composition through dequantized
    weights, for each stacked layer."""
    import jax

    from tinygpt_tpu.ops.quant_kernels import (
        mlp_fused_int4_stacked,
        mlp_supported,
    )

    rng = np.random.default_rng(7)
    L, H, I, M, G, BK = 2, 1024, 3072, 4, 64, 512
    assert mlp_supported(H, I, G, bk=BK)
    gu_w = rng.standard_normal((L, H, 2 * I)).astype(np.float32) * 0.05
    dn_w = rng.standard_normal((L, I, H)).astype(np.float32) * 0.05
    gu_qt = quantize_weight(gu_w, bits=4, group_size=G)
    dn_qt = quantize_weight(dn_w, bits=4, group_size=G)
    gu_d = [np.asarray(dequantize(
        QuantizedTensor(gu_qt.data[i], gu_qt.scales[i], 4, G, H),
        jnp.float32)) for i in range(L)]
    dn_d = [np.asarray(dequantize(
        QuantizedTensor(dn_qt.data[i], dn_qt.scales[i], 4, G, I),
        jnp.float32)) for i in range(L)]
    x = rng.standard_normal((M, H)).astype(np.float32)
    ln = rng.standard_normal((L, 1, H)).astype(np.float32)
    inv = 1.0 / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-6)

    def silu(v):
        return v / (1 + np.exp(-v))

    for l in range(L):
        gu = (x * inv * ln[l]) @ gu_d[l]
        ref = x + silu(gu[:, :I]) * gu[:, I:] @ dn_d[l]
        got = mlp_fused_int4_stacked(
            jnp.asarray(x), gu_qt.data, gu_qt.scales,
            dn_qt.data, dn_qt.scales, jnp.asarray(ln),
            jnp.asarray(inv), jnp.asarray(l, jnp.int32),
            group=G, bk=BK, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3,
                                   atol=2e-3, err_msg=f"layer {l}")


def test_mlp_mega_kernel_nonpow2_hidden():
    """Regression (round-3 review): OUTH > 4096 and not a multiple of
    4096 (e.g. H=6144) must tile with a DIVIDING output width — the old
    bob=min(OUTH, 4096) left columns 4096.. unwritten."""
    import jax

    from tinygpt_tpu.ops.quant_kernels import (
        mlp_fused_int4_stacked,
        mlp_supported,
    )

    rng = np.random.default_rng(11)
    L, H, I, M, G, BK = 1, 6144, 3072, 2, 64, 512
    assert mlp_supported(H, I, G, bk=BK)
    gu_w = rng.standard_normal((L, H, 2 * I)).astype(np.float32) * 0.05
    dn_w = rng.standard_normal((L, I, H)).astype(np.float32) * 0.05
    gu_qt = quantize_weight(gu_w, bits=4, group_size=G)
    dn_qt = quantize_weight(dn_w, bits=4, group_size=G)
    gu_d = np.asarray(dequantize(
        QuantizedTensor(gu_qt.data[0], gu_qt.scales[0], 4, G, H),
        jnp.float32))
    dn_d = np.asarray(dequantize(
        QuantizedTensor(dn_qt.data[0], dn_qt.scales[0], 4, G, I),
        jnp.float32))
    x = rng.standard_normal((M, H)).astype(np.float32)
    ln = rng.standard_normal((L, 1, H)).astype(np.float32)
    inv = 1.0 / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-6)
    gu = (x * inv * ln[0]) @ gu_d
    ref = x + (gu[:, :I] / (1 + np.exp(-gu[:, :I]))) * gu[:, I:] @ dn_d
    got = mlp_fused_int4_stacked(
        jnp.asarray(x), gu_qt.data, gu_qt.scales,
        dn_qt.data, dn_qt.scales, jnp.asarray(ln),
        jnp.asarray(inv), jnp.asarray(0, jnp.int32),
        group=G, bk=BK, interpret=True,
    )
    # the TAIL columns (>= 4096) are the regression surface
    np.testing.assert_allclose(np.asarray(got)[:, 4096:], ref[:, 4096:],
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-3)


def test_single_k_prefill_block_cap():
    """Tile-pick regression for the qwen3 admission-prefill VMEM OOM:
    at bm > 32 with one k tile, Mosaic's scoped stack dies on a 1 MB
    weight block ('Scoped allocation with size 20.94M', hardware bisect
    in benches/qwen3_vmem_repro.py) — the cap must shrink the block to
    <= 512 KB, and must leave decode-shaped and multi-k picks alone."""
    from tinygpt_tpu.ops.quant_kernels import _cap_single_k, _pick_bo

    # qwen3 qkv prefill: INP 1024, OUT 4096, n_k 1 -> bo halves to 512
    assert _cap_single_k(256, 1024, 1024, 1024, 4096, 64) == (1024, 512)
    # qwen3 gate_up prefill (OUT 12288): the auto pick (min_grid=8)
    # chooses the fatal (1024, 1024) and the cap must fix it
    bo = _pick_bo(12288, 1, target=1024, min_grid=8)
    assert bo == 1024
    assert _cap_single_k(256, 1024, bo, 1024, 12288, 64) == (1024, 512)
    # flagship qkv prefill (n_k 2): unchanged — this combo compiles
    assert _cap_single_k(256, 1024, 1024, 2048, 6144, 64) == (1024, 1024)
    # decode-shaped: untouched regardless of block size
    assert _cap_single_k(8, 1024, 4096, 1024, 4096, 64) == (1024, 4096)
    # non-halvable bo (odd divisor fallback): falls back to halving bk
    assert _cap_single_k(256, 1024, 1187 * 128, 1024, 1187 * 128,
                         64)[0] == 512
