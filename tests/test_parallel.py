"""Distributed-runtime helper tests (single-process degradations of the
multi-host API — the reference has no distributed layer at all)."""

import jax
import numpy as np
import pytest

from tests.conftest import requires_devices
from tinygpt_tpu.parallel import distributed, make_mesh


def test_initialize_single_process_noop():
    distributed.initialize()  # no coordinator → no-op
    assert jax.process_count() == 1


def test_host_local_batch_slice(monkeypatch):
    start, size = distributed.host_local_batch_slice(16)
    assert (start, size) == (0, 16)
    # simulate host 2 of 4
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    monkeypatch.setattr(jax, "process_index", lambda: 2)
    assert distributed.host_local_batch_slice(16) == (8, 4)
    with pytest.raises(ValueError):
        distributed.host_local_batch_slice(7)


def test_hybrid_mesh_flat_fallback():
    requires_devices(8)
    m = distributed.hybrid_mesh(dcn_dp=2, dp=2, sp=1, tp=2)
    assert dict(m.shape) == {"dcn_dp": 2, "dp": 2, "sp": 1, "tp": 2}
    with pytest.raises(ValueError):
        distributed.hybrid_mesh(dcn_dp=3, dp=1, sp=1, tp=1)


def test_make_mesh_axes():
    requires_devices(8)
    m = make_mesh(dp=2, sp=2, tp=2)
    assert tuple(m.axis_names) == ("dp", "sp", "tp")
    with pytest.raises(ValueError):
        make_mesh(n_devices=8, dp=3, sp=1, tp=1)


def test_mixtral_expert_parallel_forward_parity(tmp_path):
    """MoE expert parallelism: sharding the expert dim over the sp axis
    (parallel/sharding.py moe specs) must be a pure layout change — the
    sharded forward's logits equal the single-device forward's. sp=2
    splits the 4 experts 2-per-device-group; tp=2 Megatron-shards inside
    each expert; GSPMD inserts the psum over expert contributions."""
    import jax.numpy as jnp

    from tests.fixtures import build_tiny_model_dir
    from tinygpt_tpu.engine.kv_cache import create_kv_cache
    from tinygpt_tpu.hf.config import load_model_config
    from tinygpt_tpu.hf.safetensors_io import load_safetensors_dir
    from tinygpt_tpu.models import get_model
    from tinygpt_tpu.parallel.sharding import param_pspecs, shard_params

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    d = str(tmp_path / "m")
    build_tiny_model_dir("mixtral", d, seed=17)
    cfg = load_model_config(d)
    model = get_model(cfg.model_type)
    params = model.load_params(cfg, load_safetensors_dir(d),
                               dtype=jnp.float32)

    rng = np.random.default_rng(5)
    B, S = 2, 10
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, S)))
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    vld = jnp.ones((B, S), jnp.bool_)

    def fwd(p):
        cache = create_kv_cache(cfg, B, 16, dtype=jnp.float32)
        logits, _ = model.forward(p, cfg, ids, cache, pos, vld)
        return np.asarray(logits)

    ref = fwd(params)

    mesh = make_mesh(n_devices=4, dp=1, sp=2, tp=2)
    specs = param_pspecs(cfg, params)
    # assert the moe specs actually bound (sp divides E=4, tp divides)
    assert specs["layers"]["moe_gate_up_w"] == jax.sharding.PartitionSpec(
        None, "sp", None, "tp")
    sharded = shard_params(params, mesh, specs)
    with mesh:
        got = fwd(sharded)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
