"""Profiling: device traces + phase timers.

TPU-native replacement for the reference's PROFILE_START/PROFILE_STOP +
Timer wall-clocking (TinyTorch Utils/Profiler.h, used at
/root/reference/examples/inference/main.cpp:97-115): jax.profiler traces
capture the real device timeline (HLO ops, Pallas kernels, transfers) for
TensorBoard/Perfetto/XProf, and `device_fence` gives trustworthy wall
timing — on tunneled backends block_until_ready can return before
execution, so fencing fetches a value that depends on the computation.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Any, Optional

import jax
import numpy as np

from tinygpt_tpu.utils.logging import get_logger

log = get_logger("profiler")


@contextmanager
def trace(log_dir: str = "/tmp/tinygpt_trace", annotate: Optional[str] = None):
    """Capture a device trace viewable in TensorBoard / Perfetto.

    with profiler.trace("/tmp/t"):
        engine.generate_sync(prompts)
    """
    with jax.profiler.trace(log_dir):
        if annotate:
            with jax.profiler.TraceAnnotation(annotate):
                yield
        else:
            yield
    log.info("trace written to %s", log_dir)


def annotation(name: str):
    """Named span inside an active trace (host side)."""
    return jax.profiler.TraceAnnotation(name)


def device_fence(x: Any) -> Any:
    """Force execution + host materialization of everything `x` depends
    on. Returns the fetched numpy value(s)."""
    return jax.tree.map(lambda a: np.asarray(a), x)


@contextmanager
def timed_fenced(result_holder: dict, key: str = "seconds"):
    """Time a block whose last device output the caller stores in
    result_holder['value']; the fence is applied before the clock stops."""
    t0 = time.perf_counter()
    yield result_holder
    if "value" in result_holder:
        result_holder["value"] = device_fence(result_holder["value"])
    result_holder[key] = time.perf_counter() - t0
