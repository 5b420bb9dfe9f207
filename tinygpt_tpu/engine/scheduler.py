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
from typing import Callable, Dict, List, Optional, Sequence, Set, Union

import jax
import jax.numpy as jnp
import numpy as np

from tinygpt_tpu.engine.kv_cache import create_kv_cache
from tinygpt_tpu.engine.paged_kv import (
    PagedKVState,
    blocks_needed,
    create_paged_state,
)
from tinygpt_tpu.hf.config import ModelConfig
from tinygpt_tpu.hf.loader import resolve_dtype
from tinygpt_tpu.ops.sampling import SamplerConfig, sample_batched
from tinygpt_tpu.utils.logging import get_logger

log = get_logger("engine.scheduler")


def _round_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


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
    # the host discards the surplus tokens. 8 measured best on the
    # serving bench (183 -> 217 tok/s vs 4, TTFT p50 unchanged).
    decode_quantum: int = 8
    # prefix caching: completed whole blocks of a prompt are content-
    # addressed (hash chain over block-size token chunks); admissions
    # reuse matching blocks read-only (refcounted) and prefill only the
    # suffix. Idle cached blocks are reclaimed LRU under pool pressure.
    enable_prefix_cache: bool = True
    # chunked prefill: 0 admits a whole prompt in one step (decode stalls
    # for its duration); > 0 prefills at most this many tokens per
    # scheduler step, running a decode quantum for live rows BETWEEN
    # chunks — long prompts no longer freeze running streams. Rounded up
    # to lcm(prefill_bucket, block_size).
    prefill_chunk_tokens: int = 0
    # (dp, sp, tp) serving mesh. Params shard Megatron-style on tp, the
    # paged K/V pools shard kv-heads on tp and rows on dp, admission
    # prefill shards its sequence dim on sp, and every jitted program
    # (admit / chunk / decode quantum) runs under GSPMD on the mesh.
    # Under dp the quantum/admit programs are shard_map with ONLY the dp
    # axes manual — sp and tp stay GSPMD-automatic inside, so all three
    # axes compose (dp x sp x tp greedy-parity-tested). sp is
    # single-process only; None = single device.
    mesh_shape: Optional[tuple] = None
    # speculative decoding IN THE SCHEDULER: None | "ngram". The decode
    # quantum becomes R rounds of device-resident n-gram drafting +
    # gamma+1-token verification per row — each row's throughput
    # multiplies by (1 + its mean accepted drafts). Greedy rows verify
    # by argmax prefix match; rows with sampling knobs use exact
    # speculative REJECTION sampling (accept draft d w.p. p(d) under the
    # row's processed top-k/top-p/min-p distribution, emit from the
    # residual on reject — distribution-preserving, tested). An
    # all-greedy batch keeps its own randomness-free compile.
    # Sliding-window models verify exactly (slot-space window masks).
    speculative: Optional[str] = None
    spec_draft_len: int = 4
    spec_ngram: int = 3
    # device context-buffer capacity for drafting (tokens per row)
    spec_ctx: int = 2048
    # telemetry-driven auto-off: n-gram speculation only pays when the
    # text is self-repetitive (code, extraction); on text where drafts
    # rarely match it costs (gamma+1)x attention/head compute per
    # emitted token for nothing. When mean accepted-drafts-per-verify
    # over a spec_window of verifies falls below spec_min_acceptance
    # (two consecutive low windows from a cold start; ONE low window
    # when the window is a re-probe), the scheduler falls back to plain
    # quanta and re-probes with one speculative window every
    # spec_probe_every plain quanta — a failed re-probe costs exactly
    # one window of unprofitable verifies.
    spec_auto_off: bool = True
    spec_min_acceptance: float = 0.25
    spec_window: int = 32
    spec_probe_every: int = 64
    # pipeline decode quanta: issue quantum k+1 (chaining the last token
    # device-to-device) BEFORE syncing quantum k's tokens to the host, so
    # the ~25 ms dispatch round trip overlaps device execution. EOS is
    # noticed one quantum late (surplus tokens discarded, same as
    # mid-quantum finishes); admissions drain the pipeline first.
    pipeline_quanta: bool = True


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
    # pending first token from prefill: burst admissions store a DEVICE
    # [1] jax array here (synced lazily by step() via np.asarray — don't
    # int() it at store time, that would serialize the burst)
    _pending_token: Optional[Union[int, "jax.Array"]] = None
    # chunked-admission progress (tokens already in the pool) + hashes
    _chunk_pos: int = 0
    _hashes: List[int] = field(default_factory=list)


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
        import tinygpt_tpu

        tinygpt_tpu.ensure_compile_cache()
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
        # mesh / sharding (dp x tp serving; see SchedulerConfig.mesh_shape)
        self._mesh = None
        self._pool_spec = None
        self._dp = 1
        self._sp = 1
        self._meta_spec = None  # PartitionSpec for row-indexed metadata
        self._seq_spec = None   # PartitionSpec for prefill sequence inputs
        if sc.mesh_shape is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from tinygpt_tpu.parallel.sharding import (
                make_mesh,
                param_pspecs,
                shard_params,
            )

            shape = tuple(sc.mesh_shape)
            if len(shape) == 2:
                dp, sp, tp = shape[0], 1, shape[1]
            else:
                dp, sp, tp = shape
            procs = jax.process_count()
            if sp != 1 and procs > 1:
                # multi-host admission replays the host loop in lockstep
                # on every process; an sp axis would have to span the DCN
                # boundary there — single-host only
                raise ValueError("scheduler sp is single-process only")
            if dp > 1 or procs > 1:
                # row-parallel serving: rows, pools and allocators are
                # PARTITIONED over dp shards (shard_map with dp manual,
                # tp automatic) — the decode quantum needs zero cross-
                # shard collectives beyond tp's own all-reduces
                if dp % procs:
                    raise ValueError(
                        f"dp={dp} must divide by process count {procs}")
                if sc.batch_capacity % dp:
                    raise ValueError("batch_capacity must divide by dp")
                if sc.n_blocks % dp:
                    raise ValueError("n_blocks must divide by dp")
                if not hasattr(self.model, "decode_paged_steps"):
                    raise ValueError("dp serving needs the frozen-quantum "
                                     "model path (decode_paged_steps)")
            self._dp = dp
            if procs > 1:
                # multi-host serving: row shards span hosts over DCN (dp
                # crosses slices, tp rides ICI within a slice). Every
                # process runs the SAME scheduler host loop on the SAME
                # request stream (SPMD serving — the multi-host contract,
                # same as the dense engine's generate path); bookkeeping
                # is deterministic so all hosts stay in lockstep.
                from tinygpt_tpu.parallel.distributed import hybrid_mesh

                self._mesh = hybrid_mesh(dcn_dp=procs, dp=dp // procs,
                                         sp=1, tp=tp)
                self._dp_axes = ("dcn_dp", "dp")
            else:
                self._mesh = make_mesh(n_devices=dp * sp * tp, dp=dp,
                                       sp=sp, tp=tp)
                self._dp_axes = ("dp",)
            self.params = shard_params(
                self.params, self._mesh,
                param_pspecs(model_config, self.params),
            )
            kv_tp = ("tp" if model_config.num_kv_heads % tp == 0 and tp > 1
                     else None)
            dp_ax = self._dp_axes if dp > 1 else None
            self._pool_spec = P(None, dp_ax, kv_tp, None, None)
            self._meta_spec = P(dp_ax) if dp > 1 else None
            self._sp = sp
            # admission prefill inputs shard their sequence dim on sp
            # (GSPMD all-gathers K/V at the attention boundary, exactly
            # the dense engine's data_pspecs(sp=True) layout); the decode
            # quantum (S=1) and the pools stay sp-replicated
            self._seq_spec = P(None, "sp") if sp > 1 else None
            log.info("scheduler sharded over dp=%d sp=%d tp=%d (%d "
                     "processes, kv heads %s)", dp, sp, tp, procs,
                     "sharded" if kv_tp else "replicated")
        # moe_mlp formulation for admission prefill: routed ragged_dot
        # unless the expert dim is sp-sharded (EP) — see moe_mlp docstring
        self._moe_impl = ("dense" if (self._sp > 1
                                      and model_config.num_local_experts)
                          else "auto")
        self.state: PagedKVState = create_paged_state(
            model_config, sc.n_blocks, sc.block_size, sc.batch_capacity,
            sc.max_blocks_per_seq, dtype=self.kv_dtype,
        )
        if self._mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self.state = self.state._replace(
                k_pool=jax.device_put(
                    self.state.k_pool,
                    NamedSharding(self._mesh, self._pool_spec)),
                v_pool=jax.device_put(
                    self.state.v_pool,
                    NamedSharding(self._mesh, self._pool_spec)),
                block_tables=self._put(self.state.block_tables,
                                       self._meta_spec),
                lengths=self._put(self.state.lengths, self._meta_spec),
                starts=self._put(self.state.starts, self._meta_spec),
                active=self._put(self.state.active, self._meta_spec),
            )
        # block bookkeeping + prefix index: native (csrc/kvpool.cpp) when
        # available, pure-Python otherwise — identical semantics and
        # allocation order. Under dp serving each shard owns its OWN
        # allocator over n_blocks/dp LOCAL block ids (each shard's local
        # block 0 is its null block); tables store shard-local ids and the
        # prefix cache shares only within a shard.
        from tinygpt_tpu.engine.native_pool import create_pool_index

        self._rows_per_shard = sc.batch_capacity // self._dp
        self.allocators = [create_pool_index(sc.n_blocks // self._dp)
                           for _ in range(self._dp)]
        self.allocator = self.allocators[0]  # dp=1 compat alias
        self.waiting: List[Request] = []
        self._admitting: Optional[Request] = None  # chunked prefill
        self.running: Dict[int, Request] = {}  # row -> Request
        self.free_rows = list(range(sc.batch_capacity - 1, -1, -1))
        # pipelined decode: the issued-but-unsynced quantum and the
        # device-resident chained input tokens for the next one
        self._inflight = None
        self._tokens_dev = None
        self._key = jax.random.PRNGKey(sc.seed)
        # per-quantum host-overhead elision (serving-tax decomposition,
        # round 4): sampler params and pool metadata are re-uploaded only
        # when they actually changed, PRNG keys derive from a host
        # counter (no jax.random.split device dispatch per quantum), and
        # all-greedy quanta reuse one cached key their sampler ignores.
        self._qctr = 0
        self._meta_dirty = True
        self._sampler_dirty = True
        self._sampler_dev = None
        self._greedy_key_dev = None
        # speculative telemetry: emitted tokens vs verify forwards —
        # mean accepted drafts per verify = emitted/verifies - 1
        self.spec_emitted = 0
        self.spec_verifies = 0
        # auto-off policy state (SchedulerConfig.spec_auto_off)
        self._spec_disabled = False
        self._spec_win_emitted = 0
        self._spec_win_verifies = 0
        self._spec_low_windows = 0
        self._plain_since_probe = 0
        # True while the current window was opened by a re-probe: a low
        # probe window disables after ONE window (the draft context is
        # warm, so the cold-start excuse doesn't apply)
        self._spec_probing = False
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

        # module-level jitted programs shared across batcher instances:
        # one compile per (model, shape) for the whole process — a fresh
        # batcher must not recompile (wasteful, and XLA CPU's compile-time
        # parallel-reduction splits vary with load, which would make
        # numerics differ between otherwise identical batchers)
        use_frozen = hasattr(self.model, "decode_paged_steps")
        if self._dp > 1:
            # row-parallel quantum: shard_map over dp, tp automatic
            self._decode_fn = _make_dp_decode_frozen(
                self._mesh, self.model.decode_paged_steps, self.cfg,
                self.sc.attn_impl, axes=self._dp_axes,
            )
        elif use_frozen:
            # frozen-pool quantum: pools are loop invariants, one scatter
            # per quantum (see causal_lm.decode_paged_steps)
            self._decode_fn = functools.partial(
                _decode_quantum_frozen,
                decode_paged_steps=self.model.decode_paged_steps,
                cfg=self.cfg, attn_impl=self.sc.attn_impl,
            )
        else:
            self._decode_fn = functools.partial(
                _decode_quantum, forward_paged=self.model.forward_paged,
                cfg=self.cfg, attn_impl=self.sc.attn_impl,
            )
        self._admit_dp = None
        self._admit_chunk_dp = None
        if self._dp > 1:
            self._admit_dp = _make_dp_admit(
                self._mesh, self.model.forward, self.cfg, sc.attn_impl,
                sc.block_size, jnp.dtype(self.kv_dtype).name,
                axes=self._dp_axes, moe_impl=self._moe_impl,
            )
            self._admit_chunk_dp = _make_dp_admit_chunk(
                self._mesh, self.model.forward, self.cfg, sc.attn_impl,
                sc.block_size, jnp.dtype(self.kv_dtype).name,
                axes=self._dp_axes, moe_impl=self._moe_impl,
            )
        self._spec_fn = None
        if (
            sc.speculative == "ngram"
            and hasattr(self.model, "decode_paged_spec_steps")
        ):
            if self._dp > 1:
                self._spec_fn = _make_dp_decode_spec(
                    self._mesh, self.model.decode_paged_spec_steps,
                    self.cfg, self.sc.attn_impl,
                    gamma=max(1, sc.spec_draft_len),
                    ngram=max(1, sc.spec_ngram), axes=self._dp_axes,
                )
            else:
                self._spec_fn = functools.partial(
                    _decode_quantum_spec,
                    decode_paged_spec_steps=(
                        self.model.decode_paged_spec_steps),
                    cfg=self.cfg, attn_impl=self.sc.attn_impl,
                    gamma=max(1, sc.spec_draft_len),
                    ngram=max(1, sc.spec_ngram),
                )
        self._prefill_fn = _jitted_forward(self.model.forward)

    def _next_key(self) -> jnp.ndarray:
        """Fresh PRNG key as (seed, counter) raw threefry key data —
        one tiny upload instead of a jax.random.split device dispatch
        per quantum (the tunneled backend charges ~ms for any dispatch;
        distinct key words are exactly as sound as split outputs)."""
        self._qctr += 1
        return self._put(np.array(
            [self.sc.seed & 0xFFFFFFFF, self._qctr], np.uint32))

    def _greedy_key(self) -> jnp.ndarray:
        """Cached device key for all-greedy programs (sampler ignores
        it; reusing one resident array makes the upload free)."""
        if self._greedy_key_dev is None:
            self._greedy_key_dev = self._next_key()
        return self._greedy_key_dev

    def _sampler_params_dev(self):
        """Device copies of the per-row sampler params, re-uploaded only
        when an admission changed them (4 fewer uploads per quantum)."""
        if self._sampler_dirty or self._sampler_dev is None:
            ms = self._meta_spec
            self._sampler_dev = (
                self._put(self._temps.copy(), ms),
                self._put(self._topks.copy(), ms),
                self._put(self._topps.copy(), ms),
                self._put(self._minps.copy(), ms),
            )
            self._sampler_dirty = False
        return self._sampler_dev

    def _put(self, x, spec=None):
        """Upload a host array: replicated (or `spec`-sharded) on the mesh
        when sharded, plain asarray otherwise. All inputs of the jitted
        programs must live on the SAME device set — a stray single-device
        upload alongside mesh-sharded params is an error."""
        if self._mesh is None:
            return jnp.asarray(x)
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(x, NamedSharding(self._mesh, spec or P()))

    def _shard_of(self, row: int) -> int:
        return row // self._rows_per_shard

    def _fetch(self, x) -> np.ndarray:
        """Device values -> host numpy. Multi-process: row-sharded
        outputs are not fully addressable on any one host — gather the
        global value on every host (tokens are tiny; rides DCN)."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(
                x, tiled=True))
        return np.asarray(x)

    def _alloc_of(self, row: int):
        return self.allocators[self._shard_of(row)]

    # -- public API -------------------------------------------------------

    def add_request(self, req: Request) -> None:
        self.waiting.append(req)

    @property
    def has_work(self) -> bool:
        return bool(self.waiting or self.running
                    or self._admitting is not None
                    or self._inflight is not None)

    @property
    def n_running(self) -> int:
        return len(self.running)

    def step(self) -> List[TokenEvent]:
        """Admit (prefill — whole or one chunk) if possible, then decode."""
        events: List[TokenEvent] = []
        if (self._admitting is not None or self.waiting
                or not self.running):
            # admissions (and idle wrap-up) need host state in sync; a
            # drain may also free rows/blocks the admission needs
            events.extend(self._drain_inflight())
        if self._admitting is not None:
            events.extend(self._continue_admission())
            if self.running:
                events.extend(self._decode())
            return events
        if self.waiting and self.free_rows:
            req = self.waiting[0]
            if self.sc.prefill_chunk_tokens > 0:
                if self._start_admission(req):
                    self.waiting.pop(0)
                    events.extend(self._continue_admission())
                elif req.finished:
                    self.waiting.pop(0)
                    events.append(TokenEvent(
                        req.request_id, None, True, req.finish_reason
                    ))
                if self.running:
                    events.extend(self._decode())
                return events
            admitted: List[Request] = []
            while self.waiting and self.free_rows:
                req = self.waiting[0]
                if self._try_admit(req):
                    self.waiting.pop(0)
                    admitted.append(req)
                    continue
                if req.finished:  # rejected outright (too long)
                    self.waiting.pop(0)
                    events.append(TokenEvent(
                        req.request_id, None, True, req.finish_reason
                    ))
                    continue
                break  # no memory yet — stay queued
            if admitted:
                # one sync point for the whole admission burst
                for req in admitted:
                    tok = int(self._fetch(req._pending_token)[0])
                    req._pending_token = None
                    if req.row >= 0:
                        self._tokens[req.row] = tok
                    events.extend(self._emit(req, tok))
                return events
        if self.running:
            events.extend(self._decode())
        return events

    def release(self, req: Request) -> None:
        if req.row >= 0:
            # blocks registered in the prefix cache survive as idle-cached
            # (reclaimed LRU when the pool runs dry)
            alloc = self._alloc_of(req.row)
            keep = [b for b in req.blocks if alloc.is_registered(b)]
            alloc.release(req.blocks, keep_cached=keep)
            req.blocks = []
            self._active[req.row] = False
            self._meta_dirty = True  # device must stop writing this row
            self.running.pop(req.row, None)
            self.free_rows.append(req.row)
            req.row = -1

    def cancel(self, request_id: int) -> None:
        self._drain_inflight()
        self.waiting = [r for r in self.waiting
                        if r.request_id != request_id]
        if (self._admitting is not None
                and self._admitting.request_id == request_id):
            req = self._admitting
            self._admitting = None
            req.finished = True
            req.finish_reason = "abort"
            alloc = self._alloc_of(req.row) if req.row >= 0 \
                else self.allocator
            keep = [b for b in req.blocks if alloc.is_registered(b)]
            alloc.release(req.blocks, keep_cached=keep)
            req.blocks = []
            if req.row >= 0:
                self.free_rows.append(req.row)
                req.row = -1
        for row, req in list(self.running.items()):
            if req.request_id == request_id:
                req.finished = True
                req.finish_reason = "abort"
                self.release(req)
        self._meta_dirty = True

    # -- admission / prefill ----------------------------------------------

    def _block_hashes(self, prompt_ids: List[int]) -> List[int]:
        """Chain hashes for each COMPLETE block of the prompt: h_j commits
        to every token in blocks 0..j (content addressing).

        SHA-256 truncated to 128 bits — NOT Python's builtin hash(),
        which is trivially collidable: in a multi-tenant server a crafted
        collision would alias another prompt's K/V block (output
        corruption + cross-request prompt leakage, the vLLM builtin-hash
        prefix-cache CVE class)."""
        import hashlib

        bs = self.sc.block_size
        out: List[int] = []
        h = b"\x00" * 16
        for j in range(len(prompt_ids) // bs):
            chunk = np.asarray(
                prompt_ids[j * bs : (j + 1) * bs], np.int64
            ).tobytes()
            h = hashlib.sha256(h + chunk).digest()[:16]
            out.append(int.from_bytes(h, "little"))
        return out

    def _try_admit(self, req: Request) -> bool:
        """Admit one request: reuse any cached prefix blocks (read-only,
        refcounted), prefill ONLY the suffix into a trailing-padded dense
        cache seeded with the prefix K/V, scatter the new whole blocks
        into the pool, and register them in the prefix cache.

        Prompts are trailing-padded (slot == logical position for every
        row), which is what makes block contents pad-independent and
        therefore shareable across prompts of different lengths."""
        import math

        sc = self.sc
        bs = sc.block_size
        S = len(req.prompt_ids)
        if blocks_needed(S + req.max_new_tokens, bs) > sc.max_blocks_per_seq:
            req.finished = True
            req.finish_reason = "length"
            return False

        # pick a target row/shard: under dp, rows and blocks live in
        # per-shard partitions — try each shard that has a free row until
        # one can hold the prompt (prefix reuse is shard-local)
        hashes = self._block_hashes(req.prompt_ids)
        n_shareable = min(len(hashes), (S - 1) // bs)
        row = None
        # one candidate row per DISTINCT shard (pop order): same-shard
        # rows share an allocator, so retrying them repeats the identical
        # lookup/share/alloc/release cycle and churns the idle-cache LRU
        seen_shards = set()
        cands = []
        for cand in reversed(self.free_rows):
            sh = self._shard_of(cand)
            if sh not in seen_shards:
                seen_shards.add(sh)
                cands.append(cand)
        for cand in cands:
            alloc = self._alloc_of(cand)
            # longest cached block prefix, leaving >= 1 token to prefill.
            # share() PINS the looked-up blocks immediately: alloc()'s LRU
            # reclaim may otherwise evict an idle-cached prefix block we
            # just found and hand it back as this request's private suffix
            # block (same physical block twice in the table -> silent
            # corruption).
            shared: List[int] = []
            if sc.enable_prefix_cache:
                for j in range(n_shareable):
                    b = alloc.lookup_prefix(hashes[j])
                    if b is None:
                        break
                    shared.append(b)
            alloc.share(shared)
            p_blk = len(shared)
            p_len = p_blk * bs
            suffix = req.prompt_ids[p_len:]
            S_suf = len(suffix)

            n_private = blocks_needed(S_suf, bs)
            private = alloc.alloc(n_private)
            if private is not None:
                row = cand
                break
            # no memory in this shard — unpin the prefix back to the
            # idle-cached tier so it stays reclaimable; try another shard
            keep = [b for b in shared if alloc.is_registered(b)]
            alloc.release(shared, keep_cached=keep)
        if row is None:
            return False
        self.free_rows.remove(row)
        req.row = row
        req.blocks = shared + private
        self.running[row] = req

        # one jitted admission program: gather shared prefix -> suffix
        # prefill -> scatter into private blocks -> sample first token
        # (a single device dispatch; compiled per (p_blk, S_in) shape)
        unit = math.lcm(sc.prefill_bucket, bs, self._sp)
        S_in = max(unit, -(-S_suf // unit) * unit)  # padded suffix input
        ids = np.zeros((1, S_in), np.int32)
        ids[0, :S_suf] = suffix
        valid = np.zeros((1, S_in), bool)
        valid[0, :S_suf] = True
        positions = np.zeros((1, S_in), np.int32)
        positions[0, :S_suf] = p_len + np.arange(S_suf)

        k = self._next_key()
        s = req.sampler
        admit_args = (
            self.params, self.state,
            self._put(np.asarray(shared, np.int32)),
            self._put(np.asarray(private, np.int32)),
            self._put(ids, self._seq_spec),
            self._put(positions, self._seq_spec),
            self._put(valid, self._seq_spec),
            self._put(np.asarray([S_suf - 1], np.int32)),
            self._put(np.asarray([s.temperature or 0.0], np.float32)),
            self._put(np.asarray([s.top_k or 0], np.int32)),
            self._put(np.asarray([s.top_p if s.top_p is not None else 1.0],
                                 np.float32)),
            self._put(np.asarray([s.min_p or 0.0], np.float32)),
            self._put(k),
        )
        if self._dp > 1:
            owner = self._shard_of(row)
            tok_dev, self.state = self._admit_dp(
                *admit_args, self._put(np.asarray([owner], np.int32)))
            tok_dev = tok_dev[owner : owner + 1]
        else:
            tok_dev, self.state = _admit_program(
                *admit_args,
                forward=self.model.forward, cfg=self.cfg,
                attn_impl=sc.attn_impl, moe_impl=self._moe_impl,
                block_size=bs,
                kv_dtype=jnp.dtype(self.kv_dtype).name,
            )
        # register newly completed whole blocks for future reuse
        if sc.enable_prefix_cache:
            for j in range(p_blk, len(hashes)):
                self._alloc_of(row).register_prefix(hashes[j],
                                                    req.blocks[j])

        # host bookkeeping: trailing padding ⇒ starts = 0, length = S.
        # The first token stays a DEVICE array: step() admits every
        # waiting request back-to-back and syncs afterwards, so the
        # ~25 ms fetch round trips overlap the later admissions' prefill
        # compute instead of serializing with it.
        self._tables[row] = 0
        self._tables[row, : len(req.blocks)] = req.blocks
        self._lengths[row] = S
        self._starts[row] = 0
        self._active[row] = True
        self._tokens_dev = None  # host mirrors are authoritative again
        s = req.sampler
        self._temps[row] = s.temperature or 0.0
        self._topks[row] = s.top_k or 0
        self._topps[row] = s.top_p if s.top_p is not None else 1.0
        self._minps[row] = s.min_p or 0.0
        self._sampler_dirty = True
        self._sync_state_meta()
        req._pending_token = tok_dev  # device [1] — synced in step()
        return True

    # -- chunked admission --------------------------------------------------

    def _start_admission(self, req: Request) -> bool:
        """Begin chunked admission: upfront feasibility + prefix lookup.
        Returns True when `req` became the in-flight admission."""
        sc = self.sc
        bs = sc.block_size
        S = len(req.prompt_ids)
        need = blocks_needed(S + req.max_new_tokens, bs)
        # capacity is PER SHARD under dp (each shard owns n_blocks/dp
        # local blocks incl. its null block) — a global-pool check would
        # admit a request no shard can ever hold and wedge the scheduler
        if (need > sc.max_blocks_per_seq
                or need > sc.n_blocks // self._dp - 1):
            req.finished = True
            req.finish_reason = "length"
            return False
        hashes = self._block_hashes(req.prompt_ids)
        n_shareable = min(len(hashes), (S - 1) // bs)
        # reserve the target ROW up front: under dp the row fixes the
        # shard, and every chunk's blocks must come from that shard's
        # allocator (tables hold shard-local ids)
        # prefer a shard that can hold the whole request; else the one
        # with the most reclaimable space (chunks then stall under
        # pressure instead of deadlocking on an arbitrary shard)
        def capacity(r):
            a = self._alloc_of(r)
            return a.n_free + a.n_idle_cached

        row = max(reversed(self.free_rows), key=capacity)
        for cand in reversed(self.free_rows):
            if capacity(cand) >= need:
                row = cand
                break
        self.free_rows.remove(row)
        req.row = row
        alloc = self._alloc_of(row)
        shared: List[int] = []
        if sc.enable_prefix_cache:
            for j in range(n_shareable):
                b = alloc.lookup_prefix(hashes[j])
                if b is None:
                    break
                shared.append(b)
        alloc.share(shared)
        req.blocks = list(shared)
        req._chunk_pos = len(shared) * bs  # tokens already in the pool
        req._hashes = hashes
        self._admitting = req
        return True

    def _continue_admission(self) -> List[TokenEvent]:
        """Prefill ONE chunk of the in-flight admission; finalize on the
        last chunk. Chunks start block-aligned (sizes are lcm multiples);
        the chunk program gathers the request's blocks so far into a
        fixed-size dense workspace (one compile per chunk shape)."""
        import math

        req = self._admitting
        sc = self.sc
        bs = sc.block_size
        S = len(req.prompt_ids)
        unit = math.lcm(sc.prefill_bucket, bs, self._sp)
        chunk_cap = max(unit, _round_to(sc.prefill_chunk_tokens, unit))
        pos0 = req._chunk_pos
        n_tok = min(chunk_cap, S - pos0)
        final = pos0 + n_tok >= S

        n_private = blocks_needed(n_tok, bs)
        alloc = self._alloc_of(req.row)
        private = alloc.alloc(n_private)
        if private is None:
            return []  # pool pressure: stay admitting, decode continues
        req.blocks.extend(private)

        S_in = max(unit, -(-n_tok // unit) * unit)
        chunk = req.prompt_ids[pos0 : pos0 + n_tok]
        ids = np.zeros((1, S_in), np.int32)
        ids[0, :n_tok] = chunk
        valid = np.zeros((1, S_in), bool)
        valid[0, :n_tok] = True
        positions = np.zeros((1, S_in), np.int32)
        positions[0, :n_tok] = pos0 + np.arange(n_tok)
        table = np.zeros(sc.max_blocks_per_seq, np.int32)
        table[: len(req.blocks)] = req.blocks

        k = self._next_key()
        s = req.sampler
        chunk_args = (
            self.params, self.state,
            self._put(table), self._put(np.asarray(pos0, np.int32)),
            self._put(np.asarray(private, np.int32)),
            self._put(ids, self._seq_spec),
            self._put(positions, self._seq_spec),
            self._put(valid, self._seq_spec),
            self._put(np.asarray([n_tok - 1], np.int32)),
            self._put(np.asarray([s.temperature or 0.0], np.float32)),
            self._put(np.asarray([s.top_k or 0], np.int32)),
            self._put(np.asarray([s.top_p if s.top_p is not None else 1.0],
                                 np.float32)),
            self._put(np.asarray([s.min_p or 0.0], np.float32)),
            self._put(k),
        )
        if self._dp > 1:
            owner = self._shard_of(req.row)
            tok_dev, self.state = self._admit_chunk_dp(
                *chunk_args, self._put(np.asarray([owner], np.int32)))
            tok_dev = tok_dev[owner : owner + 1]
        else:
            tok_dev, self.state = _admit_chunk_program(
                *chunk_args,
                forward=self.model.forward, cfg=self.cfg,
                attn_impl=sc.attn_impl, moe_impl=self._moe_impl,
                block_size=bs,
                kv_dtype=jnp.dtype(self.kv_dtype).name,
            )
        req._chunk_pos = pos0 + n_tok
        if not final:
            return []

        # finalize: row bookkeeping, registration, first-token event
        self._admitting = None
        if sc.enable_prefix_cache:
            for j in range(len(req._hashes)):
                alloc.register_prefix(req._hashes[j], req.blocks[j])
        tok = int(np.asarray(tok_dev)[0])
        row = req.row  # reserved at _start_admission
        self.running[row] = req
        self._tables[row] = 0
        self._tables[row, : len(req.blocks)] = req.blocks
        self._lengths[row] = S
        self._starts[row] = 0
        self._active[row] = True
        self._tokens[row] = tok
        self._tokens_dev = None  # host mirrors are authoritative again
        self._temps[row] = s.temperature or 0.0
        self._topks[row] = s.top_k or 0
        self._topps[row] = s.top_p if s.top_p is not None else 1.0
        self._minps[row] = s.min_p or 0.0
        self._sampler_dirty = True
        self._sync_state_meta()
        return self._emit(req, tok)

    # -- decode ------------------------------------------------------------

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
                    got = self._alloc_of(row).alloc(1)
                    if got is None:
                        break
                    req.blocks.extend(got)
                    self._tables[row, blk_idx] = got[0]
                    self._meta_dirty = True
                covered_until = (blk_idx + 1) * sc.block_size
            safe[row] = min(n_steps, covered_until - length)
        return safe

    def _spec_eligible(self) -> bool:
        """Speculative quanta run whenever speculation is configured and
        rows are live: greedy rows verify by argmax prefix matching,
        sampled rows by exact rejection sampling (both in the same
        quantum program; the all-greedy case keeps its own randomness-
        free compile). The auto-off policy (SchedulerConfig.spec_auto_off)
        falls back to plain quanta when measured acceptance is too low
        to pay for the (gamma+1)-wide verify, re-probing periodically."""
        if self._spec_fn is None or not self.running:
            return False
        if self._spec_disabled:
            self._plain_since_probe += 1
            if self._plain_since_probe >= max(1, self.sc.spec_probe_every):
                self._spec_disabled = False
                self._plain_since_probe = 0
                self._spec_win_emitted = 0
                self._spec_win_verifies = 0
                self._spec_probing = True
                log.info("speculation re-probe after %d plain quanta",
                         self.sc.spec_probe_every)
                return True
            return False
        return True

    def _spec_policy_update(self, emitted: int, verifies: int) -> None:
        """Feed one quantum's telemetry into the auto-off window."""
        if not self.sc.spec_auto_off:
            return
        self._spec_win_emitted += emitted
        self._spec_win_verifies += verifies
        if self._spec_win_verifies < max(1, self.sc.spec_window):
            return
        accept = self._spec_win_emitted / self._spec_win_verifies - 1.0
        self._spec_win_emitted = 0
        self._spec_win_verifies = 0
        probing, self._spec_probing = self._spec_probing, False
        if accept < self.sc.spec_min_acceptance:
            # TWO consecutive low windows to disable on a COLD start: the
            # first window has the least draft context to match against —
            # measured on natural code text
            # (benchlogs_r4/spec_natural_default.log) a run whose overall
            # acceptance was 0.656 still opened with a 0.22 window and a
            # single-window policy switched speculation off exactly where
            # it pays. Random text fails both windows and still disables
            # within ~2*spec_window verifies. A RE-PROBE window disables
            # after one low window: its draft context is already warm, so
            # a failed probe costs exactly one spec_window of verifies.
            self._spec_low_windows += 1
            if self._spec_low_windows < 2 and not probing:
                return
            self._spec_disabled = True
            self._spec_low_windows = 0
            self._plain_since_probe = 0
            log.info("speculation auto-off: acceptance %.2f < %.2f over "
                     "%d verifies (re-probe every %d quanta)", accept,
                     self.sc.spec_min_acceptance, self.sc.spec_window,
                     self.sc.spec_probe_every)
        else:
            self._spec_low_windows = 0

    def _all_greedy(self) -> bool:
        rows = list(self.running.keys())
        return bool(np.all(self._temps[rows] == 0.0))

    def _decode_spec(self) -> List[TokenEvent]:
        """Speculative decode quantum: R rounds x (gamma+1)-token verify
        (causal_lm.decode_paged_spec_steps). Worst case a row writes
        R*(gamma+1) slots; rows without that much owned storage emit up
        to their safe count and finish by length, like the plain
        quantum."""
        events: List[TokenEvent] = []
        sc = self.sc
        gamma = max(1, sc.spec_draft_len)
        S = gamma + 1
        n_rounds = max(1, sc.decode_quantum // S)
        worst = n_rounds * S
        safe = self._ensure_blocks(worst)
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
        # per-row draft context: prompt + generated (cur token last)
        C = max(sc.spec_ctx, 2 * worst + sc.spec_ngram + 2)
        ctx = np.zeros((sc.batch_capacity, C), np.int32)
        clen = np.zeros(sc.batch_capacity, np.int32)
        for row, req in self.running.items():
            toks = (req.prompt_ids + req.generated)[-C:]
            ctx[row, : len(toks)] = toks
            clen[row] = len(toks)
        k = (self._greedy_key() if self._all_greedy()
             else self._next_key())
        packed, self.state = self._spec_fn(
            self.params, self.state, self._put(self._tokens.copy()),
            self._put(ctx), self._put(clen),
            self._put(self._temps.copy()), self._put(self._topks.copy()),
            self._put(self._topps.copy()), self._put(self._minps.copy()),
            k, n_rounds=n_rounds,
            all_greedy=self._all_greedy(),
        )
        B = self.sc.batch_capacity
        flat = self._fetch(packed)      # ONE download (allgather multi-host)
        n_tok = n_rounds * B * S
        toks_h = flat[:n_tok].reshape(n_rounds, B, S)
        counts_h = flat[n_tok : n_tok + n_rounds * B].reshape(n_rounds, B)
        cur_h = flat[n_tok + n_rounds * B :]
        for row, req in list(self.running.items()):
            budget = safe.get(row, 0)
            emitted = 0
            for r in range(n_rounds):
                if req.finished:
                    break
                for i in range(int(counts_h[r, row])):
                    if req.finished:
                        break
                    if emitted >= budget:
                        # device wrote past this row's owned blocks (the
                        # scatter clamps to the null block); finish it
                        req.finished = True
                        req.finish_reason = "length"
                        events.append(TokenEvent(req.request_id, None,
                                                 True, "length"))
                        self.release(req)
                        break
                    tok = int(toks_h[r, row, i])
                    self._tokens[row] = tok
                    events.extend(self._emit(req, tok))
                    emitted += 1
            if not req.finished:
                self._lengths[row] += int(counts_h[:, row].sum())
                self._tokens[row] = int(cur_h[row])
        self.spec_emitted += int(counts_h.sum())
        self.spec_verifies += n_rounds * len(safe)
        self._spec_policy_update(int(counts_h.sum()), n_rounds * len(safe))
        # host lengths re-derived from device counts — re-upload next time
        self._meta_dirty = True
        return events

    @property
    def spec_acceptance(self) -> float:
        """Mean accepted drafts per verify forward (0 when speculation
        never ran); each verify costs one decode step of weight reads,
        so per-row speedup ~ (1 + spec_acceptance)."""
        if not self.spec_verifies:
            return 0.0
        return self.spec_emitted / self.spec_verifies - 1.0

    def _decode(self) -> List[TokenEvent]:
        if self._spec_eligible():
            events = list(self._drain_inflight())
            if not self.running:
                return events
            events.extend(self._decode_spec())
            self._tokens_dev = None
            return events
        events: List[TokenEvent] = []
        n_steps = max(1, self.sc.decode_quantum)
        safe = self._ensure_blocks(n_steps)
        if any(m <= 0 for m in safe.values()):
            # pool exhausted for some rows: their pending tokens must be
            # delivered before finishing them (and drains may free blocks)
            events.extend(self._drain_inflight())
            safe = self._ensure_blocks(n_steps)
            for row, m in list(safe.items()):
                if m <= 0 and row in self.running:
                    req = self.running[row]
                    req.finished = True
                    req.finish_reason = "length"
                    events.append(TokenEvent(req.request_id, None, True,
                                             "length"))
                    self.release(req)
                    safe.pop(row)
        if not self.running:
            events.extend(self._drain_inflight())
            return events
        if self._meta_dirty:
            # the quantum program advances state.lengths exactly as the
            # host mirror does (lengths0 + n_steps*active) and leaves
            # tables/starts/active untouched, so an unchanged-membership
            # quantum needs NO re-upload of the metadata arrays
            self._sync_state_meta()
        rows_live = list(self.running.keys())
        all_greedy = bool(np.all(self._temps[rows_live] == 0.0))
        k = self._greedy_key() if all_greedy else self._next_key()
        # chained input tokens stay ON DEVICE between pipelined quanta
        ms = self._meta_spec
        tok_in = (self._tokens_dev if self._tokens_dev is not None
                  else self._put(self._tokens.copy(), ms))
        temps_d, topks_d, topps_d, minps_d = self._sampler_params_dev()
        toks_seq, self.state = self._decode_fn(
            self.params, self.state, tok_in,
            temps_d, topks_d, topps_d, minps_d,
            k, n_steps=n_steps, all_greedy=all_greedy,
        )
        was_active = self._active.copy()
        self._lengths[was_active] += n_steps
        snapshot = {row: (self.running[row], safe.get(row, 0))
                    for row in rows_live}
        prev, self._inflight = self._inflight, (toks_seq, n_steps,
                                                snapshot)
        self._tokens_dev = toks_seq[-1]
        if prev is not None:
            # sync the PREVIOUS quantum while this one executes
            events.extend(self._process_quantum(prev))
        if not self.sc.pipeline_quanta:
            events.extend(self._drain_inflight())
        return events

    def _drain_inflight(self) -> List[TokenEvent]:
        if self._inflight is None:
            return []
        prev, self._inflight = self._inflight, None
        return self._process_quantum(prev)

    def _process_quantum(self, inflight) -> List[TokenEvent]:
        """Sync one issued quantum's tokens and emit its events. Rows
        released here may have been written by an ALREADY-ISSUED next
        quantum — harmless: the device stream is ordered, so any later
        admission's prefill overwrites those slots after the stale
        writes, and registered prefix blocks are never written by decode
        (slots >= prompt length land in later blocks)."""
        toks_seq, n_steps, snapshot = inflight
        events: List[TokenEvent] = []
        toks_host = self._fetch(toks_seq)  # [n_steps, B]
        for row, (req, m) in snapshot.items():
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
        """Upload the small host-side metadata arrays.

        The .copy() calls are load-bearing: jnp.asarray of a numpy array
        can ALIAS the host buffer on the CPU backend, and these mirrors
        are mutated right after the (async) dispatch — an aliased upload
        lets the in-flight program read post-mutation values (observed as
        K/V writes landing one slot too far, rarely and timing-dependent)."""
        ms = self._meta_spec
        self.state = self.state._replace(
            block_tables=self._put(self._tables.copy(), ms),
            lengths=self._put(self._lengths.copy(), ms),
            starts=self._put(self._starts.copy(), ms),
            active=self._put(self._active.copy(), ms),
        )
        self._meta_dirty = False


@functools.partial(
    jax.jit,
    donate_argnums=(1,),
    static_argnames=("forward", "cfg", "attn_impl", "moe_impl",
                     "block_size", "kv_dtype"),
)
def _admit_program(params, state, shared, private, ids, positions, valid,
                   last_pos, temp, topk, topp, minp, key, *,
                   forward, cfg, attn_impl, moe_impl="auto", block_size,
                   kv_dtype):
    """The whole admission as ONE device program: gather the shared
    prefix blocks into a fresh dense cache, prefill the suffix, scatter
    its K/V into the private blocks, sample the first token. A single
    dispatch regardless of prefix reuse (compiled per (n_shared, S_in))."""
    bs = block_size
    p_blk = shared.shape[0]
    p_len = p_blk * bs
    n_private = private.shape[0]
    S_in = ids.shape[1]
    T_dense = p_len + S_in

    cache = create_kv_cache(cfg, 1, T_dense, dtype=jnp.dtype(kv_dtype))
    if p_blk:
        cache = _seed_dense_from_pool.__wrapped__(cache, state, shared, bs)
    logits, cache = forward(
        params, cfg, ids, cache, positions, valid, last_only=True,
        attn_impl=attn_impl, moe_impl=moe_impl, last_pos=last_pos,
    )
    state = _scatter_prefill.__wrapped__(
        state,
        jax.lax.dynamic_slice_in_dim(
            cache.k[:, 0], p_len, n_private * bs, axis=2
        ),
        jax.lax.dynamic_slice_in_dim(
            cache.v[:, 0], p_len, n_private * bs, axis=2
        ),
        private, bs,
    )
    tok = sample_batched(logits[:, -1, :], temp, topk, topp, minp, key)
    return tok, state


@functools.partial(
    jax.jit,
    donate_argnums=(1,),
    static_argnames=("forward", "cfg", "attn_impl", "moe_impl",
                     "block_size", "kv_dtype"),
)
def _admit_chunk_program(params, state, table, p_len, private, ids,
                         positions, valid, last_pos, temp, topk, topp,
                         minp, key, *, forward, cfg, attn_impl,
                         moe_impl="auto", block_size, kv_dtype):
    """One CHUNK of an admission as a single device program. Unlike
    _admit_program (exact shapes per prefix length), the workspace here is
    fixed-size: the request's full (padded) block table is gathered into a
    dense cache of max_blocks*bs + S_in slots and masked by the traced
    token count p_len — so every chunk of every admission reuses one
    compile per chunk shape."""
    bs = block_size
    MB = table.shape[0]
    n_private = private.shape[0]
    S_in = ids.shape[1]
    T_dense = MB * bs + S_in

    cache = create_kv_cache(cfg, 1, T_dense, dtype=jnp.dtype(kv_dtype))
    k_g, v_g = _gather_table(state, table)  # [L, Nk, MB*bs, D]
    idx = jnp.arange(T_dense, dtype=jnp.int32)
    cache = cache._replace(
        k=cache.k.at[:, 0, :, : MB * bs, :].set(k_g.astype(cache.k.dtype)),
        v=cache.v.at[:, 0, :, : MB * bs, :].set(v_g.astype(cache.v.dtype)),
        kv_pos=jnp.broadcast_to(idx[None, :], (1, T_dense)),
        valid=(idx[None, :] < p_len),
        length=p_len.astype(jnp.int32),
    )
    logits, cache = forward(
        params, cfg, ids, cache, positions, valid, last_only=True,
        attn_impl=attn_impl, moe_impl=moe_impl, last_pos=last_pos,
    )
    state = _scatter_prefill.__wrapped__(
        state,
        jax.lax.dynamic_slice_in_dim(
            cache.k[:, 0], p_len, n_private * bs, axis=2
        ),
        jax.lax.dynamic_slice_in_dim(
            cache.v[:, 0], p_len, n_private * bs, axis=2
        ),
        private, bs,
    )
    tok = sample_batched(logits[:, -1, :], temp, topk, topp, minp, key)
    return tok, state


def _gather_table(state, table):
    """Pool blocks by (padded) table -> dense [L, Nk, n*bs, D] K and V."""
    def g(pool):
        x = pool[:, table]  # [L, n, Nk, bs, D]
        L, n, Nk, bs, D = x.shape
        return x.transpose(0, 2, 1, 3, 4).reshape(L, Nk, n * bs, D)

    return g(state.k_pool), g(state.v_pool)


@functools.lru_cache(maxsize=None)
def _jitted_forward(forward_fn):
    """One jit wrapper per model-forward function for the whole process
    (jax.jit caches by wrapper identity, not by wrapped function)."""
    return jax.jit(
        forward_fn, static_argnames=("cfg", "last_only", "attn_impl")
    )


@functools.partial(
    jax.jit,
    donate_argnums=(1,),
    static_argnames=("decode_paged_spec_steps", "cfg", "attn_impl",
                     "gamma", "ngram", "n_rounds", "all_greedy"),
)
def _decode_quantum_spec(params, state, tokens, ctx, clen, temps, topks,
                         topps, minps, key, *,
                         decode_paged_spec_steps, cfg, attn_impl, gamma,
                         ngram, n_rounds, all_greedy=True):
    """Speculative decode quantum: R device-resident draft + verify
    rounds (causal_lm.decode_paged_spec_steps) — greedy prefix matching
    when every row is greedy (all_greedy compile), exact rejection
    sampling per row otherwise. Outputs are PACKED into one int32 array
    — on the tunneled TPU backend every device->host fetch is a full
    round trip (~25 ms), so three separate downloads would triple the
    per-dispatch overhead."""
    sampler = None if all_greedy else (temps, topks, topps, minps)
    toks, counts, cur, state = decode_paged_spec_steps(
        params, cfg, tokens, state, ctx, clen, n_rounds, gamma, ngram,
        attn_impl=attn_impl, sampler=sampler, key=key,
    )
    packed = jnp.concatenate(
        [toks.reshape(-1), counts.reshape(-1), cur.reshape(-1)]
    ).astype(jnp.int32)
    return packed, state


@functools.partial(
    jax.jit,
    donate_argnums=(1,),
    static_argnames=("decode_paged_steps", "cfg", "attn_impl", "n_steps",
                     "all_greedy"),
)
def _decode_quantum_frozen(params, state, tokens, temps, topks, topps,
                           minps, key, *, decode_paged_steps, cfg,
                           attn_impl, n_steps, all_greedy=False):
    """Frozen-pool decode quantum (causal_lm.decode_paged_steps): the
    pools stay loop invariants; the donated state aliases in place at the
    final scatter. all_greedy compiles the sampler down to argmax (the
    full per-row sampler costs a [B, V] sort per step)."""
    keys = jax.random.split(key, n_steps)
    if all_greedy:
        sample_fn = lambda lg, k: jnp.argmax(lg, -1).astype(jnp.int32)
    else:
        sample_fn = lambda lg, k: sample_batched(lg, temps, topks, topps,
                                                 minps, k)
    return decode_paged_steps(
        params, cfg, tokens, state, keys, sample_fn, attn_impl=attn_impl,
    )


@functools.partial(
    jax.jit,
    donate_argnums=(1,),
    static_argnames=("forward_paged", "cfg", "attn_impl", "n_steps",
                     "all_greedy"),
)
def _decode_quantum(params, state, tokens, temps, topks, topps, minps,
                    key, *, forward_paged, cfg, attn_impl, n_steps,
                    all_greedy=False):
    """n_steps whole decode steps as one scanned program; returns tokens
    [n_steps, B] and the advanced state."""

    def body(carry, key_step):
        state, toks = carry
        logits, state = forward_paged(params, cfg, toks, state,
                                      attn_impl=attn_impl)
        if all_greedy:
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
        else:
            nxt = sample_batched(logits, temps, topks, topps, minps,
                                 key_step)
        return (state, nxt), nxt

    keys = jax.random.split(key, n_steps)
    (state, _), toks_seq = jax.lax.scan(body, (state, tokens), keys)
    return toks_seq, state


@functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(3,))
def _seed_dense_from_pool(cache, state: PagedKVState, blocks,
                          block_size: int):
    """Gather shared prefix blocks from the pool into the head of a dense
    cache (the inverse of _scatter_prefill): slots [0, n_blk*block_size)
    get the prefix K/V; kv_pos/valid reflect slot==position."""
    n_blk = blocks.shape[0]
    p_len = n_blk * block_size
    # pool [L, n_blocks, Nk, bs, D] -> [L, Nk, p_len, D]
    def from_blocks(pool):
        x = pool[:, blocks]  # [L, n_blk, Nk, bs, D]
        return x.transpose(0, 2, 1, 3, 4).reshape(
            x.shape[0], x.shape[2], p_len, x.shape[4]
        )

    k = cache.k.at[:, 0, :, :p_len, :].set(
        from_blocks(state.k_pool).astype(cache.k.dtype)
    )
    v = cache.v.at[:, 0, :, :p_len, :].set(
        from_blocks(state.v_pool).astype(cache.v.dtype)
    )
    T = cache.kv_pos.shape[1]
    idx = jnp.arange(T, dtype=jnp.int32)[None, :]
    kv_pos = jnp.where(idx < p_len, idx, cache.kv_pos)
    valid = cache.valid | (idx < p_len)
    return cache._replace(
        k=k, v=v, kv_pos=kv_pos, valid=valid,
        length=jnp.asarray(p_len, jnp.int32),
    )


# -- dp (row-parallel) serving ----------------------------------------------
#
# Rows, pools and allocators are PARTITIONED over the mesh's dp axis:
# shard s owns rows [s*B/dp, (s+1)*B/dp) and its own n_blocks/dp block
# pool (tables hold shard-LOCAL block ids; each shard's local block 0 is
# its null block). The decode quantum runs under jax.shard_map with ONLY
# "dp" manual — inside, each shard executes the unmodified frozen-pool
# quantum on its local rows/pool, so dp adds ZERO cross-shard collectives;
# "tp" stays automatic and GSPMD inserts its usual all-reduces from the
# params' NamedShardings (same partial-manual composition as
# parallel/pipeline.py). Admission replicates the prefill compute across
# dp shards (prompt-sized, cheap relative to idle) and masks the pool
# scatter to the owner shard; non-owners write their local null block.


def _dp_state_specs(axes=("dp",)):
    from jax.sharding import PartitionSpec as P

    return PagedKVState(
        k_pool=P(None, axes), v_pool=P(None, axes),
        block_tables=P(axes), lengths=P(axes), starts=P(axes),
        active=P(axes),
    )


def _dp_shard_index(axes):
    """Global row-shard index inside shard_map: shards are ordered
    major-to-minor over the manual axes (dcn_dp outer, dp inner)."""
    idx = jnp.asarray(0, jnp.int32)
    for ax in axes:
        idx = idx * jax.lax.axis_size(ax) + jax.lax.axis_index(ax)
    return idx


def _make_dp_decode_frozen(mesh, decode_paged_steps, cfg, attn_impl,
                           axes=("dp",)):
    from jax.sharding import PartitionSpec as P

    st = _dp_state_specs(axes)

    @functools.partial(jax.jit, donate_argnums=(1,),
                       static_argnames=("n_steps", "all_greedy"))
    def fn(params, state, tokens, temps, topks, topps, minps, key, *,
           n_steps, all_greedy=False):
        def body(params, state, tokens, temps, topks, topps, minps, key):
            keys = jax.random.split(key, n_steps)
            if all_greedy:
                sample_fn = lambda lg, k: jnp.argmax(lg, -1).astype(
                    jnp.int32)
            else:
                sample_fn = lambda lg, k: sample_batched(
                    lg, temps, topks, topps, minps, k)
            return decode_paged_steps(
                params, cfg, tokens, state, keys, sample_fn,
                attn_impl=attn_impl,
            )

        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(), st, P(axes), P(axes), P(axes), P(axes),
                      P(axes), P()),
            out_specs=(P(None, axes), st),
            axis_names=set(axes),
        )(params, state, tokens, temps, topks, topps, minps, key)

    return fn


def _make_dp_decode_spec(mesh, decode_paged_spec_steps, cfg, attn_impl,
                         gamma, ngram, axes=("dp",)):
    """Row-parallel speculative quantum: rows, draft contexts and pools
    shard over dp (shard_map, tp automatic inside); the three result
    arrays pack into one download AFTER the shard_map, inside the same
    jit, so the caller still pays a single host round trip."""
    from jax.sharding import PartitionSpec as P

    st = _dp_state_specs(axes)

    @functools.partial(jax.jit, donate_argnums=(1,),
                       static_argnames=("n_rounds", "all_greedy"))
    def fn(params, state, tokens, ctx, clen, temps, topks, topps, minps,
           key, *, n_rounds, all_greedy=True):
        def body(params, state, tokens, ctx, clen, temps, topks, topps,
                 minps, key):
            if all_greedy:
                sampler = None
            else:
                sampler = (temps, topks, topps, minps)
                # decorrelate the rejection uniforms across row shards
                key = jax.random.fold_in(key, _dp_shard_index(axes))
            return decode_paged_spec_steps(
                params, cfg, tokens, state, ctx, clen, n_rounds, gamma,
                ngram, attn_impl=attn_impl, sampler=sampler, key=key,
            )

        toks, counts, cur, state = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(), st, P(axes), P(axes, None), P(axes), P(axes),
                      P(axes), P(axes), P(axes), P()),
            out_specs=(P(None, axes, None), P(None, axes), P(axes), st),
            axis_names=set(axes),
        )(params, state, tokens, ctx, clen, temps, topks, topps, minps,
          key)
        packed = jnp.concatenate(
            [toks.reshape(-1), counts.reshape(-1), cur.reshape(-1)]
        ).astype(jnp.int32)
        return packed, state

    return fn


def _make_dp_admit_chunk(mesh, forward, cfg, attn_impl, block_size,
                         kv_dtype, axes=("dp",), moe_impl="auto"):
    """Row-parallel chunked admission: every dp shard runs the SAME
    fixed-size chunk program (gather its LOCAL pool by the padded table,
    prefill, scatter) but only the OWNER shard's scatter targets real
    blocks — non-owners write their local null block 0 and their logits
    are discarded by the caller (same dumpster convention as
    _make_dp_admit)."""
    from jax.sharding import PartitionSpec as P

    st = _dp_state_specs(axes)
    bs = block_size

    @functools.partial(jax.jit, donate_argnums=(1,))
    def fn(params, state, table, p_len, private, ids, positions, valid,
           last_pos, temp, topk, topp, minp, key, owner):
        def body(params, state, table, p_len, private, ids, positions,
                 valid, last_pos, temp, topk, topp, minp, key, owner):
            ids, positions, valid = (
                jax.lax.pcast(a, axes, to="varying")
                for a in (ids, positions, valid))
            mine = _dp_shard_index(axes) == owner[0]
            MB = table.shape[0]
            n_private = private.shape[0]
            S_in = ids.shape[1]
            T_dense = MB * bs + S_in

            cache = create_kv_cache(cfg, 1, T_dense,
                                    dtype=jnp.dtype(kv_dtype))
            k_g, v_g = _gather_table(state, table)
            idx = jnp.arange(T_dense, dtype=jnp.int32)
            cache = cache._replace(
                k=cache.k.at[:, 0, :, : MB * bs, :].set(
                    k_g.astype(cache.k.dtype)),
                v=cache.v.at[:, 0, :, : MB * bs, :].set(
                    v_g.astype(cache.v.dtype)),
                kv_pos=jnp.broadcast_to(idx[None, :], (1, T_dense)),
                valid=(idx[None, :] < p_len),
                length=p_len.astype(jnp.int32),
            )
            logits, cache = forward(
                params, cfg, ids, cache, positions, valid, last_only=True,
                attn_impl=attn_impl, moe_impl=moe_impl, last_pos=last_pos,
            )
            tgt = jnp.where(mine, private, jnp.zeros_like(private))
            state = _scatter_prefill.__wrapped__(
                state,
                jax.lax.dynamic_slice_in_dim(
                    cache.k[:, 0], p_len, n_private * bs, axis=2),
                jax.lax.dynamic_slice_in_dim(
                    cache.v[:, 0], p_len, n_private * bs, axis=2),
                tgt, bs,
            )
            tok = sample_batched(logits[:, -1, :], temp, topk, topp,
                                 minp, key)
            return tok, state

        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(), st, P(), P(), P(), P(), P(), P(), P(), P(),
                      P(), P(), P(), P(), P()),
            out_specs=(P(axes), st),
            axis_names=set(axes),
        )(params, state, table, p_len, private, ids, positions, valid,
          last_pos, temp, topk, topp, minp, key, owner)

    return fn


def _make_dp_admit(mesh, forward, cfg, attn_impl, block_size, kv_dtype,
                   axes=("dp",), moe_impl="auto"):
    from jax.sharding import PartitionSpec as P

    st = _dp_state_specs(axes)
    bs = block_size

    @functools.partial(jax.jit, donate_argnums=(1,))
    def fn(params, state, shared, private, ids, positions, valid,
           last_pos, temp, topk, topp, minp, key, owner):
        def body(params, state, shared, private, ids, positions, valid,
                 last_pos, temp, topk, topp, minp, key, owner):
            # the prefill scan mixes replicated inputs (ids) with the
            # dp-varying pool (prefix seed), so its carry would flip from
            # invariant to varying mid-scan — cast the inputs to varying
            # up front (vma typing, see shard_map docs)
            ids, positions, valid = (
                jax.lax.pcast(a, axes, to="varying")
                for a in (ids, positions, valid))
            mine = _dp_shard_index(axes) == owner[0]
            p_blk = shared.shape[0]
            p_len = p_blk * bs
            n_private = private.shape[0]
            S_in = ids.shape[1]
            T_dense = p_len + S_in

            cache = create_kv_cache(cfg, 1, T_dense,
                                    dtype=jnp.dtype(kv_dtype))
            if p_blk:
                # non-owners gather garbage from their local pool; their
                # logits are discarded below
                cache = _seed_dense_from_pool.__wrapped__(
                    cache, state, shared, bs)
            logits, cache = forward(
                params, cfg, ids, cache, positions, valid, last_only=True,
                attn_impl=attn_impl, moe_impl=moe_impl, last_pos=last_pos,
            )
            # owner scatters into its private blocks; non-owners dump
            # into their local null block 0 (a write-only dumpster)
            tgt = jnp.where(mine, private, jnp.zeros_like(private))
            state = _scatter_prefill.__wrapped__(
                state,
                jax.lax.dynamic_slice_in_dim(
                    cache.k[:, 0], p_len, n_private * bs, axis=2),
                jax.lax.dynamic_slice_in_dim(
                    cache.v[:, 0], p_len, n_private * bs, axis=2),
                tgt, bs,
            )
            tok = sample_batched(logits[:, -1, :], temp, topk, topp, minp,
                                 key)
            return tok, state

        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(), st, P(), P(), P(), P(), P(), P(), P(), P(),
                      P(), P(), P(), P()),
            out_specs=(P(axes), st),
            axis_names=set(axes),
        )(params, state, shared, private, ids, positions, valid,
          last_pos, temp, topk, topp, minp, key, owner)

    return fn


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
