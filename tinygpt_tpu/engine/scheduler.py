"""Continuous batching scheduler over the paged KV pool.

Implements the reference's unchecked "Continuous Batching" TODO
(/root/reference/README.md:30-34) TPU-natively: where the reference server
serializes whole requests through one worker (HttpServer.cpp:118-163),
here requests join and leave a SINGLE static-shape decode step mid-flight.

Static-shape discipline (everything jit-compiled once):
  * decode runs at fixed row capacity B_max; a row is a live sequence or
    masked; per-row sampler knobs are arrays, sampled in one fused op;
  * prefill admits one request per step through the dense bucketed
    forward (a handful of compiles), then scatters its K/V into pool
    blocks; its first token is sampled from the prefill logits;
  * block tables grow host-side (the allocator is plain Python — never
    inside jit) and are re-uploaded as small int32 arrays.

Scheduling policy: admit-first (prefill preempts decode while free rows
and blocks exist — favors TTFT), then one decode step for all live rows.
Rows finish on EOS / stop ids / max_tokens / OOM-of-blocks (mapped to
length finish) and their blocks return to the free list.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence, Set

import jax
import jax.numpy as jnp
import numpy as np

from tinygpt_tpu.engine.kv_cache import create_kv_cache
from tinygpt_tpu.engine.paged_kv import (
    BlockAllocator,
    PagedKVState,
    blocks_needed,
    create_paged_state,
)
from tinygpt_tpu.hf.config import ModelConfig
from tinygpt_tpu.hf.loader import resolve_dtype
from tinygpt_tpu.ops.sampling import SamplerConfig, sample_batched
from tinygpt_tpu.utils.logging import get_logger

log = get_logger("engine.scheduler")


@dataclass
class SchedulerConfig:
    batch_capacity: int = 8
    block_size: int = 64
    n_blocks: int = 512
    max_blocks_per_seq: int = 64
    prefill_bucket: int = 64
    dtype: str = "bfloat16"
    kv_cache_dtype: str = "auto"  # "auto" | "fp8" | explicit dtype name
    attn_impl: str = "xla"  # "pallas" on TPU
    seed: int = 0
    # decode steps per device dispatch (a lax.scan inside ONE jit program).
    # Amortizes host dispatch; admissions wait at most one quantum. Rows
    # that finish mid-quantum run out the quantum in their own blocks and
    # the host discards the surplus tokens.
    decode_quantum: int = 4


@dataclass
class Request:
    request_id: int
    prompt_ids: List[int]
    max_new_tokens: int
    sampler: SamplerConfig = field(default_factory=SamplerConfig)
    stop_token_ids: Set[int] = field(default_factory=set)
    # filled by the scheduler
    row: int = -1
    blocks: List[int] = field(default_factory=list)
    generated: List[int] = field(default_factory=list)
    finished: bool = False
    finish_reason: str = ""
    # device-side pending first token from prefill
    _pending_token: Optional[int] = None


@dataclass
class TokenEvent:
    request_id: int
    token_id: Optional[int]  # None on the finish event
    finished: bool
    finish_reason: str = ""


class ContinuousBatcher:
    def __init__(
        self,
        model,
        model_config: ModelConfig,
        params,
        eos_ids: Set[int],
        config: Optional[SchedulerConfig] = None,
    ):
        self.model = model
        self.cfg = model_config
        self.params = params
        self.eos_ids = set(eos_ids)
        self.sc = config or SchedulerConfig()
        sc = self.sc
        self.dtype = resolve_dtype(sc.dtype)
        if sc.kv_cache_dtype in ("auto", None):
            self.kv_dtype = self.dtype
        elif sc.kv_cache_dtype in ("fp8", "float8_e4m3", "e4m3"):
            self.kv_dtype = jnp.float8_e4m3fn
        else:
            self.kv_dtype = resolve_dtype(sc.kv_cache_dtype)
        self.state: PagedKVState = create_paged_state(
            model_config, sc.n_blocks, sc.block_size, sc.batch_capacity,
            sc.max_blocks_per_seq, dtype=self.kv_dtype,
        )
        self.allocator = BlockAllocator(sc.n_blocks)
        self.waiting: List[Request] = []
        self.running: Dict[int, Request] = {}  # row -> Request
        self.free_rows = list(range(sc.batch_capacity - 1, -1, -1))
        self._key = jax.random.PRNGKey(sc.seed)
        # host mirrors of device state
        self._tables = np.zeros((sc.batch_capacity, sc.max_blocks_per_seq),
                                np.int32)
        self._lengths = np.zeros(sc.batch_capacity, np.int32)
        self._starts = np.zeros(sc.batch_capacity, np.int32)
        self._active = np.zeros(sc.batch_capacity, bool)
        self._tokens = np.zeros(sc.batch_capacity, np.int32)
        self._temps = np.zeros(sc.batch_capacity, np.float32)
        self._topks = np.zeros(sc.batch_capacity, np.int32)
        self._topps = np.ones(sc.batch_capacity, np.float32)
        self._minps = np.zeros(sc.batch_capacity, np.float32)

        self._decode_fn = jax.jit(
            functools.partial(self._decode_step_impl),
            donate_argnums=(1,),
            static_argnames=("n_steps",),
        )
        self._prefill_fn = jax.jit(
            self.model.forward,
            static_argnames=("cfg", "last_only", "attn_impl"),
        )

    # -- public API -------------------------------------------------------

    def add_request(self, req: Request) -> None:
        self.waiting.append(req)

    @property
    def has_work(self) -> bool:
        return bool(self.waiting or self.running)

    @property
    def n_running(self) -> int:
        return len(self.running)

    def step(self) -> List[TokenEvent]:
        """Admit (prefill) if possible, else decode one step."""
        events: List[TokenEvent] = []
        if self.waiting and self.free_rows:
            req = self.waiting[0]
            if self._try_admit(req):
                self.waiting.pop(0)
                events.extend(self._emit(req, req._pending_token))
                req._pending_token = None
                return events
            if req.finished:  # rejected outright (too long for the pool)
                self.waiting.pop(0)
                events.append(TokenEvent(
                    req.request_id, None, True, req.finish_reason
                ))
                return events
        if self.running:
            events.extend(self._decode())
        return events

    def release(self, req: Request) -> None:
        if req.row >= 0:
            self.allocator.release(req.blocks)
            req.blocks = []
            self._active[req.row] = False
            self.running.pop(req.row, None)
            self.free_rows.append(req.row)
            req.row = -1

    def cancel(self, request_id: int) -> None:
        self.waiting = [r for r in self.waiting
                        if r.request_id != request_id]
        for row, req in list(self.running.items()):
            if req.request_id == request_id:
                req.finished = True
                req.finish_reason = "abort"
                self.release(req)

    # -- admission / prefill ----------------------------------------------

    def _try_admit(self, req: Request) -> bool:
        import math

        sc = self.sc
        S = len(req.prompt_ids)
        # pad unit must satisfy both the prefill bucket (bounds compiles)
        # and the block size (prefill scatter fills whole blocks)
        unit = math.lcm(sc.prefill_bucket, sc.block_size)
        S_pad = max(unit, -(-S // unit) * unit)
        total_slots = S_pad + req.max_new_tokens
        n_blk = blocks_needed(total_slots, sc.block_size)
        if n_blk > sc.max_blocks_per_seq:
            req.finished = True
            req.finish_reason = "length"
            return False
        blocks = self.allocator.alloc(blocks_needed(S_pad, sc.block_size))
        if blocks is None:
            return False  # no memory yet — stay queued
        row = self.free_rows.pop()
        req.row = row
        req.blocks = blocks
        self.running[row] = req

        pad = S_pad - S
        ids = np.zeros((1, S_pad), np.int32)
        ids[0, pad:] = req.prompt_ids
        valid = np.zeros((1, S_pad), bool)
        valid[0, pad:] = True
        positions = np.zeros((1, S_pad), np.int32)
        positions[0, pad:] = np.arange(S)

        # dense bucketed prefill (cache length = S_pad exactly); the dense
        # cache already stores in the paged pool's dtype (e.g. fp8)
        cache = create_kv_cache(self.cfg, 1, S_pad, dtype=self.kv_dtype)
        logits, cache = self._prefill_fn(
            self.params, self.cfg, jnp.asarray(ids), cache,
            jnp.asarray(positions), jnp.asarray(valid), last_only=True,
            attn_impl=self.sc.attn_impl,
        )
        # scatter prefill K/V into this row's blocks
        self.state = _scatter_prefill(
            self.state, cache.k[:, 0], cache.v[:, 0],
            jnp.asarray(np.asarray(blocks, np.int32)), self.sc.block_size,
        )
        # sample the first token with this request's knobs
        self._key, k = jax.random.split(self._key)
        tok = int(np.asarray(sample_batched(
            logits[:, -1, :],
            jnp.asarray([req.sampler.temperature or 0.0], jnp.float32),
            jnp.asarray([req.sampler.top_k or 0], jnp.int32),
            jnp.asarray([req.sampler.top_p
                         if req.sampler.top_p is not None else 1.0],
                        jnp.float32),
            jnp.asarray([req.sampler.min_p or 0.0], jnp.float32),
            k,
        ))[0])

        # host bookkeeping
        self._tables[row] = 0
        self._tables[row, : len(blocks)] = blocks
        self._lengths[row] = S_pad
        self._starts[row] = pad
        self._active[row] = True
        self._tokens[row] = tok
        s = req.sampler
        self._temps[row] = s.temperature or 0.0
        self._topks[row] = s.top_k or 0
        self._topps[row] = s.top_p if s.top_p is not None else 1.0
        self._minps[row] = s.min_p or 0.0
        self._sync_state_meta()
        req._pending_token = tok
        return True

    # -- decode ------------------------------------------------------------

    def _decode_step_impl(self, params, state, tokens, temps, topks,
                          topps, minps, key, n_steps):
        """n_steps whole decode steps as one scanned program; returns
        tokens [n_steps, B] and the advanced state."""

        def body(carry, key_step):
            state, toks = carry
            logits, state = self.model.forward_paged(
                params, self.cfg, toks, state, attn_impl=self.sc.attn_impl
            )
            nxt = sample_batched(logits, temps, topks, topps, minps,
                                 key_step)
            return (state, nxt), nxt

        keys = jax.random.split(key, n_steps)
        (state, _), toks_seq = jax.lax.scan(body, (state, tokens), keys)
        return toks_seq, state

    def _ensure_blocks(self, n_steps: int) -> Dict[int, int]:
        """Reserve blocks covering the next n_steps slots per active row.
        Returns row -> safe step count (how many of the quantum's steps
        have owned storage); rows with 0 safe steps are not in the map and
        have been evicted with reason 'length' by the caller's loop."""
        sc = self.sc
        safe: Dict[int, int] = {}
        for row, req in list(self.running.items()):
            length = int(self._lengths[row])
            first_blk = length // sc.block_size
            last_blk = (length + n_steps - 1) // sc.block_size
            covered_until = length  # exclusive slot bound with owned blocks
            for blk_idx in range(first_blk, last_blk + 1):
                if blk_idx >= sc.max_blocks_per_seq:
                    break
                if blk_idx >= len(req.blocks):
                    got = self.allocator.alloc(1)
                    if got is None:
                        break
                    req.blocks.extend(got)
                    self._tables[row, blk_idx] = got[0]
                covered_until = (blk_idx + 1) * sc.block_size
            safe[row] = min(n_steps, covered_until - length)
        return safe

    def _decode(self) -> List[TokenEvent]:
        events: List[TokenEvent] = []
        n_steps = max(1, self.sc.decode_quantum)
        safe = self._ensure_blocks(n_steps)
        for row, m in list(safe.items()):
            if m <= 0:
                req = self.running[row]
                req.finished = True
                req.finish_reason = "length"
                events.append(TokenEvent(req.request_id, None, True,
                                         "length"))
                self.release(req)
                safe.pop(row)
        if not self.running:
            return events
        self._sync_state_meta()
        self._key, k = jax.random.split(self._key)
        toks_seq, self.state = self._decode_fn(
            self.params, self.state, jnp.asarray(self._tokens),
            jnp.asarray(self._temps), jnp.asarray(self._topks),
            jnp.asarray(self._topps), jnp.asarray(self._minps), k,
            n_steps=n_steps,
        )
        was_active = self._active.copy()
        self._lengths[was_active] += n_steps
        toks_host = np.asarray(toks_seq)  # [n_steps, B]
        for row, req in list(self.running.items()):
            m = safe.get(row, 0)
            for step in range(n_steps):
                if req.finished:
                    break
                if step >= m:
                    # ran out of owned storage mid-quantum: pool exhausted
                    req.finished = True
                    req.finish_reason = "length"
                    events.append(TokenEvent(req.request_id, None, True,
                                             "length"))
                    self.release(req)
                    break
                tok = int(toks_host[step, row])
                self._tokens[row] = tok
                events.extend(self._emit(req, tok))
        return events

    def _emit(self, req: Request, tok: Optional[int]) -> List[TokenEvent]:
        """Process one sampled token for a request into events."""
        if tok is None:
            return []
        stops = self.eos_ids | req.stop_token_ids
        if tok in stops:
            req.finished = True
            req.finish_reason = "stop"
            self.release(req)
            return [TokenEvent(req.request_id, None, True, "stop")]
        req.generated.append(tok)
        if len(req.generated) >= req.max_new_tokens:
            req.finished = True
            req.finish_reason = "length"
            self.release(req)
            return [TokenEvent(req.request_id, tok, True, "length")]
        return [TokenEvent(req.request_id, tok, False)]

    def _sync_state_meta(self) -> None:
        """Upload the small host-side metadata arrays."""
        self.state = self.state._replace(
            block_tables=jnp.asarray(self._tables),
            lengths=jnp.asarray(self._lengths),
            starts=jnp.asarray(self._starts),
            active=jnp.asarray(self._active),
        )


@functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(4,))
def _scatter_prefill(state: PagedKVState, k_dense, v_dense, blocks,
                     block_size: int) -> PagedKVState:
    """Copy dense prefill K/V [L, Nk, S_pad, D] into pool blocks."""
    L, Nk, S_pad, D = k_dense.shape
    n_blk = blocks.shape[0]

    def to_blocks(x):
        return (
            x.reshape(L, Nk, n_blk, block_size, D)
            .transpose(0, 2, 1, 3, 4)
            .astype(state.k_pool.dtype)
        )

    k_pool = state.k_pool.at[:, blocks].set(to_blocks(k_dense))
    v_pool = state.v_pool.at[:, blocks].set(to_blocks(v_dense))
    return state._replace(k_pool=k_pool, v_pool=v_pool)
