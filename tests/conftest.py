"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding correctness is
validated on XLA's host platform with 8 virtual devices (the JAX-native
analog of a fake backend — the C++ reference had no distributed tests at
all, SURVEY.md §4).
"""

import os

# Hard-set (not setdefault): the host environment pins JAX_PLATFORMS=axon
# and a sitecustomize calls jax.config.update("jax_platforms", "axon,cpu")
# at interpreter start, so both the env var and the config must be forced.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("TINYGPT_LOG_LEVEL", "WARNING")
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got "
    f"{jax.devices()[0].platform}"
)
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"

import pytest  # noqa: E402

REFERENCE_ASSETS = "/root/reference/assets/tokenizer"


def reference_asset(name: str) -> str:
    """Path to a read-only HF tokenizer fixture shipped with the reference
    checkout; tests that need one skip when it is absent."""
    path = os.path.join(REFERENCE_ASSETS, name)
    if not os.path.exists(path):
        pytest.skip(f"reference asset {name} not available")
    return path


def requires_devices(n: int) -> None:
    """Skip when the virtual mesh has fewer than n devices."""
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices, have {len(jax.devices())}")
