"""AWQ activation-aware quantization tests.

The fold is claimed to be an EXACT model identity on float params
(ops/awq.py docstring) — test that literally, per family (GQA grouping,
qkv bias, qk-norm, tied embeddings all take different fold paths). Then
test that the chosen scales never lose to round-to-nearest under the
search's own weighted-error objective, and that the end-to-end
calibrate->fold->quantize entry point produces a working quantized model.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.fixtures import build_tiny_model_dir
from tinygpt_tpu.hf.config import load_model_config
from tinygpt_tpu.hf.safetensors_io import load_safetensors_dir
from tinygpt_tpu.models import causal_lm
from tinygpt_tpu.ops import awq
from tinygpt_tpu.ops.quant import QuantizedTensor, quantize_params


def _load_float(model_type, tmp_path, seed=3):
    d = str(tmp_path / model_type)
    build_tiny_model_dir(model_type, d, seed=seed)
    cfg = load_model_config(d)
    params = causal_lm.load_params(
        cfg, load_safetensors_dir(d), dtype=jnp.float32
    )
    return cfg, params


def _forward_logits(params, cfg, ids):
    from tinygpt_tpu.engine.kv_cache import create_kv_cache

    B, S = ids.shape
    cache = create_kv_cache(cfg, B, S + 4, dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    vld = jnp.ones((B, S), jnp.bool_)
    logits, _ = causal_lm.forward(params, cfg, jnp.asarray(ids), cache,
                                  pos, vld)
    return np.asarray(logits)


# llama: GQA no-bias untied; qwen2: GQA + qkv bias; qwen3: qk-norm;
# llama_scaled: tied embeddings (head fold materializes an lm_head);
# mixtral: MoE folds (shared expert-input scale counter-folded into the
# router, per-expert down scales)
@pytest.mark.parametrize(
    "family", ["llama", "qwen2", "qwen3", "llama_scaled", "mixtral"]
)
def test_fold_is_exact_identity(family, tmp_path):
    cfg, params = _load_float(family, tmp_path)
    rng = np.random.default_rng(0)
    calib = rng.integers(0, cfg.vocab_size, (2, 24))
    ids = rng.integers(0, cfg.vocab_size, (2, 12))

    stats = awq.collect_act_stats(params, cfg, jnp.asarray(calib))
    for k, v in stats.items():
        assert np.all(np.isfinite(np.asarray(v))), k
    folded = awq.apply_awq(params, cfg, stats, bits=4, group_size=16)

    ref = _forward_logits(params, cfg, ids)
    got = _forward_logits(folded, cfg, ids)
    # float32 params, float32 folds: only reassociation noise remains
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-3)


def test_scales_never_lose_to_rtn():
    """The alpha grid includes 0 (identity), so the winning scales are
    <= RTN under the weighted-error objective — check on a weight with
    deliberately salient channels."""
    rng = np.random.default_rng(1)
    w = rng.normal(size=(2, 64, 32)).astype(np.float32)
    m = rng.uniform(0.01, 1.0, size=(2, 64)).astype(np.float32)
    m[:, :4] = 100.0  # salient channels
    w = jnp.asarray(w)
    m = jnp.asarray(m)

    s = awq.search_scales(w, m, bits=4, group_size=16)
    assert s.shape == (2, 64)

    def weighted_err(w2, m2, s2):
        dq = awq._qdq(np.asarray(w2 * s2[:, None]), 4, 16) / s2[:, None]
        e = np.asarray(dq) - np.asarray(w2)
        return float(np.sum(np.asarray(m2) * np.sum(e * e, axis=-1)))

    for l in range(2):
        err_awq = weighted_err(w[l], m[l], np.asarray(s[l]))
        err_rtn = weighted_err(w[l], m[l], np.ones(64, np.float32))
        assert err_awq <= err_rtn * (1 + 1e-6), (err_awq, err_rtn)
        # salient channels must be present for the search to act on; with
        # 100x second moments the chosen alpha should be > 0 somewhere
    assert float(jnp.abs(s - 1.0).max()) > 1e-3  # not the identity


def test_kv_share_grouping():
    """o_w scales must be constant across the q heads of one kv group
    (consecutive grouping, ops/attention.py:49)."""
    rng = np.random.default_rng(2)
    nk, g, d = 2, 2, 8  # Nq=4 heads, in_dim=32
    w = jnp.asarray(rng.normal(size=(1, nk * g * d, 16)).astype(np.float32))
    m = jnp.asarray(rng.uniform(0.01, 10.0, size=(1, nk * g * d))
                    .astype(np.float32))
    s = np.asarray(awq.search_scales(w, m, bits=4, group_size=16,
                                     kv_share=(nk, g, d)))[0]
    s = s.reshape(nk, g, d)
    np.testing.assert_allclose(s[:, 0], s[:, 1], rtol=1e-6)


def test_awq_quantize_end_to_end(tmp_path):
    cfg, params = _load_float("llama", tmp_path, seed=7)
    rng = np.random.default_rng(4)
    calib = rng.integers(0, cfg.vocab_size, (2, 32))
    ids = rng.integers(0, cfg.vocab_size, (2, 10))

    qparams = awq.awq_quantize_params(params, cfg, calib, bits=4,
                                      group_size=16)
    assert isinstance(qparams["layers"]["qkv_w"], QuantizedTensor)

    ref = _forward_logits(params, cfg, ids)
    got_awq = _forward_logits(qparams, cfg, ids)
    plain = quantize_params(params, bits=4, group_size=16)
    got_rtn = _forward_logits(plain, cfg, ids)

    # int4 on a tiny random model is rough; AWQ should track the float
    # logits at least as well as plain RTN does (mean squared logit error)
    mse_awq = float(np.mean((got_awq - ref) ** 2))
    mse_rtn = float(np.mean((got_rtn - ref) ** 2))
    assert np.isfinite(mse_awq)
    assert mse_awq <= mse_rtn * 1.25, (mse_awq, mse_rtn)


def test_awq_default_applies_to_moe_layout(tmp_path):
    """int4's AWQ-on default now covers the MoE layout: the engine must
    calibrate + fold + quantize a mixtral model (4D expert stacks) and
    still decode."""
    from tests.fixtures import build_tiny_model_dir
    from tinygpt_tpu.engine.engine import GPTConfig, GPTEngine

    import shutil

    d = str(tmp_path / "m")
    build_tiny_model_dir("mixtral", d, seed=19)
    for f in ("tokenizer.json", "tokenizer_config.json"):
        shutil.copy(f"/root/reference/assets/tokenizer/gpt2/{f}", d)
    eng = GPTEngine(GPTConfig(model_dir=d, dtype="float32", max_tokens=3,
                              quantization="int4", quant_group_size=16,
                              prefill_bucket=16))
    eng.prepare()
    from tinygpt_tpu.ops.quant import QuantizedTensor

    layers = eng.ctx.params["layers"]
    assert isinstance(layers["qkv_w"], QuantizedTensor)
    assert isinstance(layers["moe_gate_up_w"], QuantizedTensor)
    out = eng.generate_sync(["hello world"])
    assert len(out[0].token_ids) == 3
