"""Pallas attention kernel tests (interpret mode on CPU) against the XLA
sdpa oracle: prefill causal/padding/window, GQA decode, multi-block tiles."""

import numpy as np
import pytest

import jax.numpy as jnp

from tinygpt_tpu.ops.attention import sdpa_with_cache
from tinygpt_tpu.ops.attention_kernels import flash_decode, flash_prefill


def _mk(B, Nq, Nk, T, D, S, pad_lens, seed=0):
    """Build a left-padded cache state: row b has pad_lens[b] pads then
    S real tokens written at slots [0, pad+S)."""
    rng = np.random.default_rng(seed)
    k = rng.standard_normal((B, Nk, T, D)).astype(np.float32) * 0.3
    v = rng.standard_normal((B, Nk, T, D)).astype(np.float32) * 0.3
    q = rng.standard_normal((B, S, Nq, D)).astype(np.float32) * 0.3
    valid = np.zeros((B, T), bool)
    kv_pos = np.zeros((B, T), np.int32)
    q_pos = np.zeros((B, S), np.int32)
    for b, p in enumerate(pad_lens):
        for t in range(p, S):
            valid[b, t] = True
            kv_pos[b, t] = t - p
        q_pos[b] = np.arange(S) - p
        q_pos[b, :p] = 0
    return q, k, v, valid, kv_pos, q_pos


@pytest.mark.parametrize("pad_lens", [(0, 0), (0, 3)])
@pytest.mark.parametrize("window", [None, 4])
def test_prefill_kernel_vs_oracle(pad_lens, window):
    B, Nq, Nk, T, D, S = 2, 4, 2, 16, 64, 16
    q, k, v, valid, kv_pos, q_pos = _mk(B, Nq, Nk, T, D, S, pad_lens)
    scale = D ** -0.5

    ref = sdpa_with_cache(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        q_pos=jnp.asarray(q_pos), kv_pos=jnp.asarray(kv_pos),
        kv_valid=jnp.asarray(valid), scale=scale, sliding_window=window,
    )
    got = flash_prefill(
        jnp.asarray(q).transpose(0, 2, 1, 3), jnp.asarray(k),
        jnp.asarray(v), jnp.asarray(valid), scale=scale, q_slot=0,
        sliding_window=window, bq=8, bt=8, interpret=True,
    ).transpose(0, 2, 1, 3)
    # compare only valid (non-pad) query rows — pad rows are don't-care
    for b, p in enumerate(pad_lens):
        np.testing.assert_allclose(
            np.asarray(got)[b, p:], np.asarray(ref)[b, p:],
            rtol=2e-5, atol=2e-5,
        )


def test_prefill_kernel_multiblock():
    """S and T spanning several 8-wide blocks, uneven tail."""
    B, Nq, Nk, T, D, S = 1, 2, 1, 40, 64, 40
    q, k, v, valid, kv_pos, q_pos = _mk(B, Nq, Nk, T, D, S, (0,), seed=3)
    scale = D ** -0.5
    ref = sdpa_with_cache(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        q_pos=jnp.asarray(q_pos), kv_pos=jnp.asarray(kv_pos),
        kv_valid=jnp.asarray(valid), scale=scale,
    )
    got = flash_prefill(
        jnp.asarray(q).transpose(0, 2, 1, 3), jnp.asarray(k),
        jnp.asarray(v), jnp.asarray(valid), scale=scale, q_slot=0,
        bq=8, bt=16, interpret=True,
    ).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_prefill_kernel_slot_offset():
    """Chunked prefill: queries written at slot offset>0 must still see
    the earlier cache content causally."""
    B, Nq, Nk, T, D = 1, 2, 2, 32, 64
    S1, S2 = 8, 8
    rng = np.random.default_rng(7)
    k = rng.standard_normal((B, Nk, T, D)).astype(np.float32) * 0.3
    v = rng.standard_normal((B, Nk, T, D)).astype(np.float32) * 0.3
    q = rng.standard_normal((B, S2, Nq, D)).astype(np.float32) * 0.3
    valid = np.zeros((B, T), bool)
    valid[:, : S1 + S2] = True
    kv_pos = np.zeros((B, T), np.int32)
    kv_pos[:, : S1 + S2] = np.arange(S1 + S2)
    q_pos = (np.arange(S2) + S1)[None, :].astype(np.int32)

    ref = sdpa_with_cache(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        q_pos=jnp.asarray(q_pos), kv_pos=jnp.asarray(kv_pos),
        kv_valid=jnp.asarray(valid), scale=D ** -0.5,
    )
    got = flash_prefill(
        jnp.asarray(q).transpose(0, 2, 1, 3), jnp.asarray(k),
        jnp.asarray(v), jnp.asarray(valid), scale=D ** -0.5,
        q_slot=S1, bq=8, bt=8, interpret=True,
    ).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("G", [1, 4])
def test_decode_kernel_vs_oracle(G):
    B, Nk, T, D = 2, 2, 24, 64
    Nq = Nk * G
    rng = np.random.default_rng(5)
    L = 17  # current length: slots [0, L) valid, query at slot L
    k = rng.standard_normal((B, Nk, T, D)).astype(np.float32) * 0.3
    v = rng.standard_normal((B, Nk, T, D)).astype(np.float32) * 0.3
    q = rng.standard_normal((B, 1, Nq, D)).astype(np.float32) * 0.3
    valid = np.zeros((B, T), bool)
    valid[:, : L + 1] = True
    kv_pos = np.zeros((B, T), np.int32)
    kv_pos[:, : L + 1] = np.arange(L + 1)
    q_pos = np.full((B, 1), L, np.int32)

    ref = sdpa_with_cache(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        q_pos=jnp.asarray(q_pos), kv_pos=jnp.asarray(kv_pos),
        kv_valid=jnp.asarray(valid), scale=D ** -0.5,
    )
    got = flash_decode(
        jnp.asarray(q[:, 0]), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(valid), scale=D ** -0.5, bt=8, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref)[:, 0], rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("window", [None, 12])
@pytest.mark.parametrize("G", [1, 4])
def test_decode_frozen_kernel_vs_oracle(G, window):
    """flash_decode_frozen (stacked cache + in-flight merge, interpret
    mode) vs the XLA sdpa_decode_frozen oracle, mid-chunk."""
    from tinygpt_tpu.ops.attention import sdpa_decode_frozen
    from tinygpt_tpu.ops.attention_kernels import flash_decode_frozen

    Lyr, B, Nk, T, D, N = 3, 2, 2, 24, 64, 8
    Nq = Nk * G
    rng = np.random.default_rng(9)
    P = 17   # frozen tokens per row
    step = 3  # current in-flight slot (4 chunk tokens so far)
    ks = rng.standard_normal((Lyr, B, Nk, T, D)).astype(np.float32) * 0.3
    vs = rng.standard_normal((Lyr, B, Nk, T, D)).astype(np.float32) * 0.3
    ki = rng.standard_normal((B, Nk, N, D)).astype(np.float32) * 0.3
    vi = rng.standard_normal((B, Nk, N, D)).astype(np.float32) * 0.3
    q = rng.standard_normal((B, 1, Nq, D)).astype(np.float32) * 0.3
    valid = np.zeros((B, T), bool)
    valid[:, :P] = True
    kv_pos = np.zeros((B, T), np.int32)
    kv_pos[:, :P] = np.arange(P)
    q_pos = np.full((B, 1), P + step, np.int32)

    for l in range(Lyr):
        ref = sdpa_decode_frozen(
            jnp.asarray(q), jnp.asarray(ks[l]), jnp.asarray(vs[l]),
            jnp.asarray(kv_pos), jnp.asarray(valid), jnp.asarray(ki),
            jnp.asarray(vi), jnp.asarray(step, jnp.int32),
            jnp.asarray(q_pos), scale=D ** -0.5, sliding_window=window,
        )
        mask = (kv_pos <= q_pos) & valid
        if window is not None:
            mask &= kv_pos > q_pos - window
        got = flash_decode_frozen(
            jnp.asarray(q[:, 0]), jnp.asarray(ks), jnp.asarray(vs),
            jnp.asarray(mask), jnp.asarray(ki), jnp.asarray(vi),
            jnp.asarray(l, jnp.int32), jnp.asarray(step, jnp.int32),
            scale=D ** -0.5, window=window, bt=8, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref)[:, 0], rtol=2e-5, atol=2e-5,
            err_msg=f"layer {l}",
        )


def test_e4m3_expand_exact_all_bytes():
    """_e4m3_expand_f32 (the integer-op fp8 decode the frozen kernels use
    for fp8 caches) vs the hardware convert, over EVERY byte value —
    normals, subnormals, both zeros. The two NaN encodings (0x7f/0xff)
    are excluded: KV quantization never writes NaN."""
    import ml_dtypes

    from tinygpt_tpu.ops.attention_kernels import _e4m3_expand_f32

    raw = np.arange(256, dtype=np.uint8)
    expected = raw.view(ml_dtypes.float8_e4m3fn).astype(np.float32)
    got = np.asarray(_e4m3_expand_f32(jnp.asarray(raw.view(np.int8))))
    finite = ~np.isnan(expected)
    np.testing.assert_array_equal(got[finite], expected[finite])


@pytest.mark.parametrize("window", [None, 12])
def test_decode_frozen_kernel_fp8_vs_oracle(window):
    """flash_decode_frozen on an fp8 (e4m3) stacked cache — the raw-byte
    int8 load + VPU expand path — vs the XLA oracle reading the same fp8
    cache through convert."""
    from tinygpt_tpu.ops.attention import sdpa_decode_frozen
    from tinygpt_tpu.ops.attention_kernels import flash_decode_frozen

    Lyr, B, Nk, G, T, D, N = 2, 2, 2, 4, 24, 64, 8
    Nq = Nk * G
    rng = np.random.default_rng(11)
    P = 17
    step = 3
    ks = (rng.standard_normal((Lyr, B, Nk, T, D)) * 0.3).astype(np.float32)
    vs = (rng.standard_normal((Lyr, B, Nk, T, D)) * 0.3).astype(np.float32)
    # sprinkle values in the subnormal range so the expand's exactness
    # there is actually exercised
    ks[..., :8] *= 0.01
    ks8 = jnp.asarray(ks).astype(jnp.float8_e4m3fn)
    vs8 = jnp.asarray(vs).astype(jnp.float8_e4m3fn)
    ki = (rng.standard_normal((B, Nk, N, D)) * 0.3).astype(np.float32)
    vi = (rng.standard_normal((B, Nk, N, D)) * 0.3).astype(np.float32)
    q = (rng.standard_normal((B, 1, Nq, D)) * 0.3).astype(np.float32)
    valid = np.zeros((B, T), bool)
    valid[:, :P] = True
    kv_pos = np.zeros((B, T), np.int32)
    kv_pos[:, :P] = np.arange(P)
    q_pos = np.full((B, 1), P + step, np.int32)

    for l in range(Lyr):
        ref = sdpa_decode_frozen(
            jnp.asarray(q), ks8[l], vs8[l],
            jnp.asarray(kv_pos), jnp.asarray(valid), jnp.asarray(ki),
            jnp.asarray(vi), jnp.asarray(step, jnp.int32),
            jnp.asarray(q_pos), scale=D ** -0.5, sliding_window=window,
        )
        mask = (kv_pos <= q_pos) & valid
        if window is not None:
            mask &= kv_pos > q_pos - window
        got = flash_decode_frozen(
            jnp.asarray(q[:, 0]), ks8, vs8,
            jnp.asarray(mask), jnp.asarray(ki), jnp.asarray(vi),
            jnp.asarray(l, jnp.int32), jnp.asarray(step, jnp.int32),
            scale=D ** -0.5, window=window, bt=8, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref)[:, 0], rtol=2e-5, atol=2e-5,
            err_msg=f"layer {l}",
        )


def test_model_forward_pallas_interpret_matches_xla(tmp_path):
    """Whole-model check: forward with attn_impl pallas-interpret equals
    the XLA path (uses a tiny random llama)."""
    import jax

    from tests.fixtures import build_tiny_model_dir
    from tinygpt_tpu.engine.kv_cache import create_kv_cache
    from tinygpt_tpu.hf.config import load_model_config
    from tinygpt_tpu.hf.safetensors_io import load_safetensors_dir
    from tinygpt_tpu.models import causal_lm
    from tinygpt_tpu.ops import attention as attn_mod

    d = str(tmp_path / "m")
    build_tiny_model_dir("llama", d, seed=5)
    cfg = load_model_config(d)
    params = causal_lm.load_params(cfg, load_safetensors_dir(d),
                                   dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, (2, 8))
    pos = jnp.broadcast_to(jnp.arange(8), (2, 8))
    vld = jnp.ones((2, 8), jnp.bool_)

    cache = create_kv_cache(cfg, 2, 16, dtype=jnp.float32)
    ref, _ = causal_lm.forward(params, cfg, jnp.asarray(ids), cache,
                               pos, vld, attn_impl="xla")

    # monkeypatch the kernels to interpret mode for the CPU run
    orig_prefill, orig_decode = (
        attn_mod.__dict__.get("flash_prefill"), None
    )
    from tinygpt_tpu.ops import attention_kernels as ak
    import functools
    real_prefill = ak.flash_prefill
    ak_interp = functools.partial(real_prefill, interpret=True, bq=8, bt=8)
    try:
        import tinygpt_tpu.ops.attention_kernels as mod
        mod_flash = mod.flash_prefill
        mod.flash_prefill = ak_interp
        cache = create_kv_cache(cfg, 2, 16, dtype=jnp.float32)
        got, _ = causal_lm.forward(params, cfg, jnp.asarray(ids), cache,
                                   pos, vld, attn_impl="pallas")
    finally:
        mod.flash_prefill = mod_flash
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
