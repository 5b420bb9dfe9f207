"""Paged KV cache: block pool + per-sequence block tables.

This implements the reference's unchecked "Paged Attention" TODO
(/root/reference/README.md:30-34) TPU-natively. The dense per-request
cache (kv_cache.py) wastes slots on pads and can't share capacity across
requests; here K/V live in a global pool of fixed-size blocks
[L, n_blocks, Nk, block_size, D], each sequence owns an ordered block
table, and the allocator is a host-side free list (allocation happens at
request admission — never inside jit).

Static shapes everywhere: block tables are [B_max, max_blocks] int32 (0 =
unallocated; block 0 is reserved as the null block and never handed out),
lengths are [B_max] int32, so one compiled decode step serves any mix of
active sequences — the substrate for continuous batching
(engine/scheduler.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from tinygpt_tpu.hf.config import ModelConfig


class PagedKVState(NamedTuple):
    """Device-side state carried through the jitted decode step."""

    k_pool: jnp.ndarray        # [L, n_blocks, Nk, bs, D]
    v_pool: jnp.ndarray        # [L, n_blocks, Nk, bs, D]
    block_tables: jnp.ndarray  # [B_max, max_blocks] int32 (0 = null)
    lengths: jnp.ndarray       # [B_max] int32 slots used per row (incl. pads)
    starts: jnp.ndarray        # [B_max] int32 first real slot (left-pad skip)
    active: jnp.ndarray        # [B_max] bool

    @property
    def block_size(self) -> int:
        return self.k_pool.shape[3]

    @property
    def max_blocks(self) -> int:
        return self.block_tables.shape[1]


def create_paged_state(
    cfg: ModelConfig,
    n_blocks: int,
    block_size: int,
    batch_capacity: int,
    max_blocks_per_seq: int,
    dtype=jnp.bfloat16,
) -> PagedKVState:
    shape = (cfg.num_hidden_layers, n_blocks, cfg.num_kv_heads,
             block_size, cfg.head_dim)
    return PagedKVState(
        k_pool=jnp.zeros(shape, dtype),
        v_pool=jnp.zeros(shape, dtype),
        block_tables=jnp.zeros((batch_capacity, max_blocks_per_seq),
                               jnp.int32),
        lengths=jnp.zeros((batch_capacity,), jnp.int32),
        starts=jnp.zeros((batch_capacity,), jnp.int32),
        active=jnp.zeros((batch_capacity,), jnp.bool_),
    )


@dataclass
class BlockAllocator:
    """Host-side allocator over the pool with reference counting and an
    idle-cached tier (prefix caching). Block 0 is the reserved null block
    (the paged kernel clamps out-of-range table entries to it).

    A block is in exactly one state: free (on the free list), live
    (refcount > 0), or idle-cached (refcount 0 but its contents are a
    registered prompt prefix — reclaimable under pressure, LRU order).
    """

    n_blocks: int
    free: List[int] = field(default_factory=list)
    refcount: dict = field(default_factory=dict)      # block -> rc > 0
    cached_idle: dict = field(default_factory=dict)   # block -> lru tick
    _tick: int = 0
    # eviction callback set by the prefix cache so hash entries die with
    # their blocks
    on_evict = None

    def __post_init__(self):
        self.free = list(range(self.n_blocks - 1, 0, -1))  # 0 reserved

    @property
    def n_free(self) -> int:
        return len(self.free) + len(self.cached_idle)

    def _reclaim(self, n: int) -> bool:
        """Evict idle-cached blocks (oldest first) until free >= n."""
        if len(self.free) >= n:
            return True
        need = n - len(self.free)
        victims = sorted(self.cached_idle.items(), key=lambda kv: kv[1])
        if len(victims) < need:
            return False
        for b, _ in victims[:need]:
            del self.cached_idle[b]
            if self.on_evict is not None:
                self.on_evict(b)
            self.free.append(b)
        return True

    def alloc(self, n: int) -> Optional[List[int]]:
        if not self._reclaim(n):
            return None
        out = []
        for _ in range(n):
            b = self.free.pop()
            self.refcount[b] = 1
            out.append(b)
        return out

    def share(self, blocks: List[int]) -> None:
        """Take an extra reference on live or idle-cached blocks."""
        for b in blocks:
            if b == 0:
                continue
            if b in self.cached_idle:  # revive
                del self.cached_idle[b]
                self.refcount[b] = 1
            else:
                self.refcount[b] = self.refcount.get(b, 0) + 1

    def release(self, blocks: List[int], keep_cached=()) -> None:
        """Drop one reference per block; rc==0 blocks go to the free list,
        or to the idle-cached tier when listed in keep_cached."""
        keep = set(keep_cached)
        for b in blocks:
            if b == 0:
                continue
            rc = self.refcount.get(b, 1) - 1
            if rc > 0:
                self.refcount[b] = rc
                continue
            self.refcount.pop(b, None)
            if b in keep:
                self._tick += 1
                self.cached_idle[b] = self._tick
            else:
                if self.on_evict is not None:
                    self.on_evict(b)
                self.free.append(b)


def blocks_needed(n_tokens: int, block_size: int) -> int:
    return max(1, -(-n_tokens // block_size))
