"""Dense preallocated KV cache.

TPU-native replacement for the reference's KVCacheManager
(/root/reference/src/engine/CacheManager.h), which re-concatenates the
whole K/V tensor every decode step (O(seq²) memory traffic). Here the
cache is a preallocated static-shape buffer; each step writes new K/V at
the current slot with dynamic_update_slice — one jit trace covers every
step, and XLA emits an in-place update.

Slots vs positions: slot index is the physical write offset (identical
across a left-padded batch); `kv_pos` is each token's logical position
(what RoPE and causality use); `valid` masks pad slots. The paged cache in
engine/paged_kv.py supersedes this under continuous batching.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from tinygpt_tpu.hf.config import ModelConfig


class KVCache(NamedTuple):
    k: jnp.ndarray        # [L, B, Nk, T, D] — kernel-native layout: the
    v: jnp.ndarray        #   Pallas kernels tile (T, D) per (batch, head)
    kv_pos: jnp.ndarray   # [B, T] int32 logical position of each slot
    valid: jnp.ndarray    # [B, T] bool — slot holds a real (non-pad) token
    length: jnp.ndarray   # scalar int32 — next free slot

    @property
    def max_len(self) -> int:
        return self.k.shape[3]

    @property
    def batch_size(self) -> int:
        return self.k.shape[1]


def create_kv_cache(
    cfg: ModelConfig,
    batch_size: int,
    max_len: int,
    dtype=jnp.bfloat16,
) -> KVCache:
    shape = (
        cfg.num_hidden_layers,
        batch_size,
        cfg.num_kv_heads,
        max_len,
        cfg.head_dim,
    )
    return KVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        kv_pos=jnp.zeros((batch_size, max_len), jnp.int32),
        valid=jnp.zeros((batch_size, max_len), jnp.bool_),
        length=jnp.zeros((), jnp.int32),
    )
