"""Rotary position embeddings, HF rotate-half convention.

TPU-native equivalent of TinyTorch's nn::RoPE + RopeScalingConfig used at
/root/reference/src/layer/Attention.h:81-83 and the Llama-3 frequency
scaling parsed at src/huggingface/ModelConfig.cpp:79-87.

Frequencies are precomputed once on host (numpy) and closed over by the
jitted forward — no per-step trig on the device beyond a gather.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from tinygpt_tpu.hf.config import RopeScaling


def _llama3_scale_freqs(inv_freq: np.ndarray, scaling: RopeScaling) -> np.ndarray:
    """Llama-3 piecewise frequency scaling (public HF algorithm)."""
    factor = scaling.factor
    low = scaling.low_freq_factor
    high = scaling.high_freq_factor
    orig = scaling.original_max_position_embeddings
    wavelen = 2 * math.pi / inv_freq
    low_wavelen = orig / low
    high_wavelen = orig / high
    out = np.where(wavelen > low_wavelen, inv_freq / factor, inv_freq)
    smooth = (orig / wavelen - low) / (high - low)
    smoothed = (1 - smooth) / factor * inv_freq + smooth * inv_freq
    is_medium = (wavelen <= low_wavelen) & (wavelen >= high_wavelen)
    return np.where(is_medium, smoothed, out)


def compute_rope_freqs(
    head_dim: int,
    max_positions: int,
    theta: float = 10000.0,
    scaling: Optional[RopeScaling] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (cos, sin) tables of shape [max_positions, head_dim] in fp32,
    already duplicated across the two rotate-half halves."""
    inv_freq = 1.0 / (
        theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim)
    )
    if scaling is not None and scaling.rope_type in ("llama3",):
        inv_freq = _llama3_scale_freqs(inv_freq, scaling)
    t = np.arange(max_positions, dtype=np.float64)
    freqs = np.outer(t, inv_freq)  # [P, D/2]
    emb = np.concatenate([freqs, freqs], axis=-1)  # [P, D]
    return (
        np.cos(emb).astype(np.float32),
        np.sin(emb).astype(np.float32),
    )


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def gather_rope(
    cos: jnp.ndarray,  # [P, D] table
    sin: jnp.ndarray,
    positions: jnp.ndarray,  # [B, S] absolute positions
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather the per-position rotation rows once. Layer scans should
    hoist this OUT of the per-layer body (positions are layer-invariant;
    the gather would otherwise run L times per step) and pass the result
    to apply_rope_gathered."""
    return cos[positions][:, :, None, :], sin[positions][:, :, None, :]


def apply_rope_gathered(
    q: jnp.ndarray,  # [B, S, Nq, D]
    k: jnp.ndarray,  # [B, S, Nk, D]
    c: jnp.ndarray,  # [B, S, 1, D] gathered rows (gather_rope)
    s: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    q_out = qf * c + _rotate_half(qf) * s
    k_out = kf * c + _rotate_half(kf) * s
    return q_out.astype(q.dtype), k_out.astype(k.dtype)


def apply_rope(
    q: jnp.ndarray,  # [B, S, Nq, D]
    k: jnp.ndarray,  # [B, S, Nk, D]
    cos: jnp.ndarray,  # [P, D] table
    sin: jnp.ndarray,
    positions: jnp.ndarray,  # [B, S] absolute positions
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    c, s = gather_rope(cos, sin, positions)
    return apply_rope_gathered(q, k, c, s)
