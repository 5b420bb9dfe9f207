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
