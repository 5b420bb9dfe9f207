"""Normalization ops (fp32 accumulation, cast back to input dtype).

TPU-native equivalents of the reference's TinyTorch nn::RMSNorm /
nn::LayerNorm usage (/root/reference/src/model/GPTModel.h:26-48,
src/model/ModelGPT2.h). Plain jnp — XLA fuses these into neighboring ops;
a hand-written Pallas kernel would only re-derive the same fusion.
"""

from __future__ import annotations

import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jnp.reciprocal(jnp.sqrt(var + eps))
    return (y * weight.astype(jnp.float32)).astype(dtype)


def layer_norm(
    x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-5
) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    return (y * weight.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dtype)
