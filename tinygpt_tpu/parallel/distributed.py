"""Multi-host runtime: process bootstrap and hybrid ICI/DCN meshes.

Green-field component (the reference is single-process, single-device —
/root/reference/src/engine/GPTEngine.h:27, README.md:32). The JAX-native
shape of a multi-host inference runtime:

  * every host runs the SAME program; `initialize()` wires the hosts into
    one JAX runtime (`jax.distributed.initialize`), after which
    jax.devices() spans all hosts and jit-compiled programs execute
    SPMD across them;
  * mesh axes are laid out so that tensor-parallel collectives ride ICI
    (fast intra-slice interconnect) while data/pipeline parallelism
    crosses DCN (inter-slice network): `hybrid_mesh` puts `dcn_dp` on the
    slice granularity and (dp, sp, tp) within a slice via
    mesh_utils.create_hybrid_device_mesh;
  * per-host I/O: each host feeds its local batch shard
    (`host_local_batch_slice`) and reads back only replicated or
    host-local outputs (jax.experimental.multihost_utils helpers).

Single-process use degrades gracefully: initialize() is a no-op when no
coordinator is configured, and hybrid_mesh falls back to a flat mesh.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

from tinygpt_tpu.utils.logging import get_logger

log = get_logger("parallel.distributed")


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the multi-host runtime. Args fall back to the standard env
    (JAX_COORDINATOR_ADDRESS etc. / TPU metadata); a no-op single-process
    runtime when nothing is configured."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None and num_processes is None:
        log.info("single-process runtime (no coordinator configured)")
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    log.info(
        "distributed runtime up: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def hybrid_mesh(
    dcn_dp: int = 1,
    dp: int = 1,
    sp: int = 1,
    tp: Optional[int] = None,
) -> Mesh:
    """Mesh ("dcn_dp", "dp", "sp", "tp"): the leading axis crosses slices
    over DCN (data parallel only — no per-layer collectives), the inner
    axes stay within a slice so tp's all-reduces ride ICI."""
    n = jax.device_count()
    per_slice = n // dcn_dp
    if tp is None:
        tp = per_slice // (dp * sp)
    if dcn_dp * dp * sp * tp != n:
        raise ValueError(
            f"dcn_dp({dcn_dp}) * dp({dp}) * sp({sp}) * tp({tp}) != {n}"
        )
    if dcn_dp > 1:
        try:
            from jax.experimental import mesh_utils

            arr = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(1, dp, sp, tp),
                dcn_mesh_shape=(dcn_dp, 1, 1, 1),
            )
            return Mesh(arr, ("dcn_dp", "dp", "sp", "tp"))
        except Exception as e:  # no slice topology info (CPU test meshes)
            log.warning("hybrid mesh unavailable (%s); flat layout", e)
    arr = np.asarray(jax.devices()[:n]).reshape(dcn_dp, dp, sp, tp)
    return Mesh(arr, ("dcn_dp", "dp", "sp", "tp"))


def host_local_batch_slice(global_batch: int) -> Tuple[int, int]:
    """(start, size) of this host's row range under pure data-parallel
    input feeding: hosts own contiguous equal slices of the batch."""
    pc, pi = jax.process_count(), jax.process_index()
    if global_batch % pc:
        raise ValueError(f"batch {global_batch} not divisible by {pc} hosts")
    size = global_batch // pc
    return pi * size, size
