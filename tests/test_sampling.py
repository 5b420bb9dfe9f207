"""Sampler tests (the reference has none — SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from tinygpt_tpu.ops.sampling import (
    SamplerConfig,
    apply_min_p,
    apply_top_k,
    apply_top_p,
    sample,
)


def test_greedy_default():
    cfg = SamplerConfig()
    assert cfg.is_greedy
    logits = jnp.asarray([[0.1, 3.0, -1.0], [5.0, 0.0, 0.0]])
    toks = sample(logits, cfg)
    np.testing.assert_array_equal(np.asarray(toks), [1, 0])


def test_temperature_zero_is_greedy():
    assert SamplerConfig(temperature=0.0, top_p=0.9).is_greedy


def test_top_k_masks():
    logits = jnp.asarray([[1.0, 2.0, 3.0, 4.0, 5.0]])
    out = np.asarray(apply_top_k(logits, 2))
    assert np.isfinite(out[0, 3]) and np.isfinite(out[0, 4])
    assert (out[0, :3] < -1e29).all()


def test_top_p_keeps_top1():
    # one dominant token: top_p tiny must still keep it
    logits = jnp.asarray([[10.0, 0.0, 0.0, 0.0]])
    out = np.asarray(apply_top_p(logits, 0.01))
    assert np.isfinite(out[0, 0])
    assert (out[0, 1:] < -1e29).all()


def test_top_p_mass():
    # probs 0.4/0.3/0.2/0.1 → p=0.6 keeps first two
    probs = np.array([0.4, 0.3, 0.2, 0.1])
    logits = jnp.asarray(np.log(probs)[None, :])
    out = np.asarray(apply_top_p(logits, 0.6))
    assert np.isfinite(out[0, 0]) and np.isfinite(out[0, 1])
    assert (out[0, 2:] < -1e29).all()


def test_min_p():
    probs = np.array([0.5, 0.3, 0.1, 0.1])
    logits = jnp.asarray(np.log(probs)[None, :])
    out = np.asarray(apply_min_p(logits, 0.5))  # threshold 0.25
    assert np.isfinite(out[0, 0]) and np.isfinite(out[0, 1])
    assert (out[0, 2:] < -1e29).all()


def test_stochastic_sampling_distribution():
    cfg = SamplerConfig(temperature=1.0, top_k=2)
    probs = np.array([0.05, 0.65, 0.25, 0.05])
    logits = jnp.log(jnp.asarray(probs))[None, :].repeat(4096, axis=0)
    toks = np.asarray(sample(logits, cfg, jax.random.PRNGKey(0)))
    # only the top-2 tokens can appear
    assert set(np.unique(toks)) <= {1, 2}
    # and roughly in renormalized proportion 0.65/0.9 vs 0.25/0.9
    frac1 = (toks == 1).mean()
    assert 0.64 < frac1 < 0.81


def test_sampler_is_jittable():
    cfg = SamplerConfig(temperature=0.7, top_k=5, top_p=0.9, min_p=0.05)
    f = jax.jit(lambda l, k: sample(l, cfg, k))
    logits = jax.random.normal(jax.random.PRNGKey(1), (3, 100))
    toks = f(logits, jax.random.PRNGKey(2))
    assert toks.shape == (3,)
