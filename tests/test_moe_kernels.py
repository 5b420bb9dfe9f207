"""Gathered-expert MoE kernel vs the dense-over-experts oracle.

Every Pallas kernel has an XLA oracle path tested 1:1 (repo rule);
here the oracle is causal_lm.moe_mlp (the dense formulation), and the
gathered matmul is additionally checked against a direct gather-matmul
in plain jnp.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tinygpt_tpu.ops.moe_kernels import moe_gather_matmul, moe_mlp_gathered


def test_gather_matmul_matches_direct():
    rng = np.random.default_rng(0)
    L, E, IN, OUT = 3, 4, 256, 384
    R = 6
    w = jnp.asarray(rng.normal(size=(L, E, IN, OUT)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(R, IN)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, E, R).astype(np.int32))
    for l in (0, 2):
        got = moe_gather_matmul(x, w, jnp.int32(l), idx, interpret=True)
        ref = jnp.einsum("ri,rio->ro", x, w[l, idx])
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-4)


def test_gather_matmul_odd_tiles():
    """IN/OUT that don't divide the default tiles force the halving
    fallback; still exact."""
    rng = np.random.default_rng(1)
    L, E, IN, OUT = 2, 3, 384, 640
    R = 4
    w = jnp.asarray(rng.normal(size=(L, E, IN, OUT)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(R, IN)).astype(np.float32))
    idx = jnp.asarray([0, 2, 2, 1], np.int32)
    got = moe_gather_matmul(x, w, jnp.int32(1), idx, interpret=True)
    ref = jnp.einsum("ri,rio->ro", x, w[1, idx])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_moe_mlp_gathered_matches_dense():
    """The routed wrapper must equal the dense-over-experts moe_mlp on
    the same layer slice (same routing semantics, k/E of the reads)."""
    from tinygpt_tpu.hf.config import parse_model_config
    from tinygpt_tpu.models.causal_lm import moe_mlp

    cfg = parse_model_config({
        "model_type": "mixtral", "vocab_size": 128, "hidden_size": 128,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 2, "intermediate_size": 256,
        "num_local_experts": 4, "num_experts_per_tok": 2,
        "max_position_embeddings": 64, "rms_norm_eps": 1e-5,
    })
    rng = np.random.default_rng(2)
    L, E, H, I = 2, 4, 128, 256
    B = 3
    router = jnp.asarray(rng.normal(size=(L, H, E)).astype(np.float32))
    gw = jnp.asarray(rng.normal(size=(L, E, H, 2 * I)).astype(np.float32)
                     * 0.1)
    dw = jnp.asarray(rng.normal(size=(L, E, I, H)).astype(np.float32)
                     * 0.1)
    h = jnp.asarray(rng.normal(size=(B, 1, H)).astype(np.float32))

    for l in range(L):
        lp = {"router_w": router[l], "moe_gate_up_w": gw[l],
              "moe_down_w": dw[l]}
        ref = moe_mlp(h, lp, cfg)
        got = moe_mlp_gathered(h, router[l], gw, dw, jnp.int32(l), cfg,
                               interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
