"""Pipeline-parallel tests on the virtual 8-device CPU mesh.

The stage runner must reproduce the single-program forward exactly
(prefill and decode), for pure-pp and composed pp x tp meshes, across
model-family deltas (qkv-bias, qk-norm). The reference has no distributed
layer to compare against (README.md:32) — the oracle is our own
single-device forward, which is itself logit-parity-tested vs HF
transformers in test_models.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import requires_devices
from tinygpt_tpu.engine.kv_cache import create_kv_cache
from tinygpt_tpu.hf.config import parse_model_config
from tinygpt_tpu.models import causal_lm
from tinygpt_tpu.parallel import pipeline as pl


def _cfg(**over):
    base = {
        "model_type": "llama", "vocab_size": 503, "hidden_size": 64,
        "num_hidden_layers": 4, "num_attention_heads": 4,
        "num_key_value_heads": 2, "intermediate_size": 128,
        "max_position_embeddings": 128, "rope_theta": 10000.0,
        "rms_norm_eps": 1e-5, "tie_word_embeddings": True,
    }
    base.update(over)
    return parse_model_config(base)


def _ref_forward(cfg, params, ids, cache, positions, valid):
    return jax.jit(
        causal_lm.forward, static_argnames=("cfg", "last_only", "attn_impl")
    )(params, cfg, ids, cache, positions, valid, last_only=True)


def _staged(cfg, params, mesh, pp, B, T):
    params_staged = dict(params)
    params_staged["layers"] = pl.stage_layers(params["layers"], pp)
    cache = pl.stage_cache(
        create_kv_cache(cfg, B, T, dtype=jnp.float32), pp
    )
    return pl.shard_staged(params_staged, cache, mesh, cfg)


@pytest.mark.parametrize(
    "dp,pp,tp,n_micro",
    [(1, 2, 2, 4), (1, 4, 1, 2), (2, 2, 2, 2), (1, 2, 1, 8)],
)
def test_pipeline_matches_dense(dp, pp, tp, n_micro):
    requires_devices(dp * pp * tp)
    cfg = _cfg()
    params = causal_lm.init_params(cfg, seed=0, dtype=jnp.float32)
    B, S, T = 8, 16, 64
    key = jax.random.PRNGKey(1)
    ids = jax.random.randint(key, (B, S), 2, cfg.vocab_size)
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    valid = jnp.ones((B, S), jnp.bool_)

    ref_logits, ref_cache = _ref_forward(
        cfg, params, ids, create_kv_cache(cfg, B, T, dtype=jnp.float32),
        positions, valid,
    )

    mesh = pl.make_pipeline_mesh(dp=dp, pp=pp, tp=tp)
    params_staged, cache = _staged(cfg, params, mesh, pp, B, T)
    fwd = jax.jit(pl.make_pipelined_forward(mesh, cfg, n_micro=n_micro))
    out, new_cache = fwd(params_staged, ids, cache, positions, valid)

    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_logits[:, -1, :]),
        rtol=2e-5, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(pl.unstage_cache(new_cache).k), np.asarray(ref_cache.k),
        rtol=2e-5, atol=2e-5,
    )

    # decode step (S=1) through the same pipelined program
    tok = jnp.argmax(out, -1).astype(jnp.int32)[:, None]
    pos1 = jnp.full((B, 1), S, jnp.int32)
    ones = jnp.ones((B, 1), jnp.bool_)
    ref2, _ = _ref_forward(cfg, params, tok, ref_cache, pos1, ones)
    out2, _ = fwd(params_staged, tok, new_cache, pos1, ones)
    np.testing.assert_allclose(
        np.asarray(out2), np.asarray(ref2[:, -1, :]), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize(
    "over",
    [
        {"model_type": "qwen2", "qkv_bias": True},
        {"model_type": "qwen3", "qk_norm": True, "head_dim": 16},
    ],
    ids=["qkv-bias", "qk-norm"],
)
def test_pipeline_family_deltas(over):
    requires_devices(4)
    cfg = _cfg(**over)
    params = causal_lm.init_params(cfg, seed=1, dtype=jnp.float32)
    B, S, T = 4, 8, 32
    ids = jax.random.randint(jax.random.PRNGKey(2), (B, S), 2, cfg.vocab_size)
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    valid = jnp.ones((B, S), jnp.bool_)
    ref_logits, _ = _ref_forward(
        cfg, params, ids, create_kv_cache(cfg, B, T, dtype=jnp.float32),
        positions, valid,
    )
    mesh = pl.make_pipeline_mesh(dp=1, pp=2, tp=2)
    params_staged, cache = _staged(cfg, params, mesh, 2, B, T)
    fwd = jax.jit(pl.make_pipelined_forward(mesh, cfg, n_micro=2))
    out, _ = fwd(params_staged, ids, cache, positions, valid)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_logits[:, -1, :]),
        rtol=2e-5, atol=2e-5,
    )


def test_pipeline_left_padded_batch():
    """Padded rows (ragged prompts) must behave identically to the dense
    path — validity/positions flow through the stage runner."""
    requires_devices(2)
    cfg = _cfg()
    params = causal_lm.init_params(cfg, seed=2, dtype=jnp.float32)
    B, S, T = 4, 8, 32
    ids = np.zeros((B, S), np.int32)
    valid = np.zeros((B, S), bool)
    positions = np.zeros((B, S), np.int32)
    rng = np.random.default_rng(0)
    for b, n in enumerate((8, 5, 3, 7)):
        ids[b, S - n:] = rng.integers(2, cfg.vocab_size, n)
        valid[b, S - n:] = True
        positions[b, S - n:] = np.arange(n)
    ids, positions, valid = map(jnp.asarray, (ids, positions, valid))
    ref_logits, _ = _ref_forward(
        cfg, params, ids, create_kv_cache(cfg, B, T, dtype=jnp.float32),
        positions, valid,
    )
    mesh = pl.make_pipeline_mesh(dp=1, pp=2, tp=1)
    params_staged, cache = _staged(cfg, params, mesh, 2, B, T)
    fwd = jax.jit(pl.make_pipelined_forward(mesh, cfg, n_micro=4))
    out, _ = fwd(params_staged, ids, cache, positions, valid)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_logits[:, -1, :]),
        rtol=2e-5, atol=2e-5,
    )


def test_stage_roundtrip():
    cfg = _cfg()
    params = causal_lm.init_params(cfg, seed=0, dtype=jnp.float32)
    staged = pl.stage_layers(params["layers"], 2)
    back = pl.unstage_layers(staged)
    for k in params["layers"]:
        np.testing.assert_array_equal(
            np.asarray(back[k]), np.asarray(params["layers"][k])
        )
