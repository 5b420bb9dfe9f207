"""Paged decode attention: Pallas kernel over a block pool + XLA oracle.

The kernel walks each sequence's block table with
PrefetchScalarGridSpec — table entries are scalar-prefetched so the
index_map can point each grid step's DMA at the right pool block. Blocks
past the sequence length resolve to the reserved null block (index 0),
which is all-zeros, and their scores are masked; compute for them is
skipped with pl.when.

The XLA oracle gathers the table into a dense [B, Nk, T, D] view — O(T)
copies per step, used for tests/CPU only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinygpt_tpu.ops.attention_kernels import _e4m3_expand_f32

NEG_INF = -1e30


def _bitcast_e4m3_pools(*pools):
    """fp8 pools ride the kernels as raw int8 bytes (Mosaic scalarizes
    fp8 VMEM loads; int8 loads run at full rate — see
    attention_kernels._e4m3_expand_f32). Returns (pools..., kv_e4m3)."""
    if pools[0].dtype != jnp.float8_e4m3fn:
        return (*pools, False)
    return (*(jax.lax.bitcast_convert_type(p, jnp.int8) for p in pools),
            True)


def paged_gather_dense(pool: jnp.ndarray, block_tables: jnp.ndarray):
    """[n_blocks, Nk, bs, D] pool + [B, MB] tables → dense [B, Nk, MB*bs, D]."""
    g = pool[block_tables]  # [B, MB, Nk, bs, D]
    B, MB, Nk, bs, D = g.shape
    return g.transpose(0, 2, 1, 3, 4).reshape(B, Nk, MB * bs, D)


def paged_decode_xla(
    q: jnp.ndarray,            # [B, Nq, D]
    k_pool: jnp.ndarray,       # [n_blocks, Nk, bs, D] (single layer)
    v_pool: jnp.ndarray,
    block_tables: jnp.ndarray,  # [B, MB]
    lengths: jnp.ndarray,       # [B] — slots used per row (incl. current)
    starts: jnp.ndarray,        # [B] — first real slot (left-pad offset)
    scale: float,
    sliding_window=None,
) -> jnp.ndarray:
    from tinygpt_tpu.ops.attention import sdpa_with_cache

    k = paged_gather_dense(k_pool, block_tables)
    v = paged_gather_dense(v_pool, block_tables)
    B, Nk, T, D = k.shape
    t_idx = jnp.arange(T, dtype=jnp.int32)[None, :]
    valid = (t_idx < lengths[:, None]) & (t_idx >= starts[:, None])
    kv_pos = jnp.broadcast_to(t_idx, (B, T))
    q_pos = (lengths - 1)[:, None]
    out = sdpa_with_cache(
        q[:, None], k, v, q_pos=q_pos, kv_pos=kv_pos, kv_valid=valid,
        scale=scale, sliding_window=sliding_window,
    )
    return out[:, 0]


def _paged_decode_kernel(
    tables_ref,  # scalar prefetch: [B, MB] int32
    lengths_ref,  # scalar prefetch: [B] int32
    starts_ref,  # scalar prefetch: [B] int32
    q_ref,       # [1, 1, G, D]
    k_ref,       # [1, 1, bs, D] — the selected pool block for this step
    v_ref,       # [1, 1, bs, D]
    o_ref,       # [1, 1, G, D]
    m_scr, l_scr, acc_scr,
    *,
    scale: float,
    n_blk: int,
    bs: int,
    sliding_window,
    kv_e4m3: bool = False,
):
    b = pl.program_id(0)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    length = lengths_ref[b]
    start = starts_ref[b]
    block_live = (j * bs < length) & ((j + 1) * bs > start)

    def expand(tile):
        return (_e4m3_expand_f32(tile) if kv_e4m3
                else tile.astype(jnp.float32))

    @pl.when(block_live)
    def _():
        q = q_ref[0, 0].astype(jnp.float32)      # [G, D]
        k = expand(k_ref[0, 0])                  # [bs, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                 # [G, bs]
        t = j * bs + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        mask = (t < length) & (t >= start)
        if sliding_window is not None:
            mask &= t > length - 1 - sliding_window
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_scr[:] = jnp.broadcast_to(
            l_scr[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True),
            l_scr.shape,
        )
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p, expand(v_ref[0, 0]),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(j == n_blk - 1)
    def _():
        l = l_scr[:, :1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[:] / safe_l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "sliding_window", "interpret")
)
def paged_decode_tpu(
    q: jnp.ndarray,            # [B, Nq, D]
    k_pool: jnp.ndarray,       # [n_blocks, Nk, bs, D] single layer
    v_pool: jnp.ndarray,
    block_tables: jnp.ndarray,  # [B, MB] int32
    lengths: jnp.ndarray,       # [B] int32
    starts: jnp.ndarray,        # [B] int32
    scale: float,
    sliding_window=None,
    interpret: bool = False,
) -> jnp.ndarray:
    B, Nq, D = q.shape
    n_blocks, Nk, bs, _ = k_pool.shape
    MB = block_tables.shape[1]
    G = Nq // Nk
    q4 = q.reshape(B, Nk, G, D)

    def table_lookup(b, h, j, tables, lengths, starts):
        idx = tables[b, j]
        # dead table entries resolve to the reserved null block
        return (jnp.where(j * bs < lengths[b], idx, 0), h, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, Nk, MB),
        in_specs=[
            pl.BlockSpec((1, 1, G, D),
                         lambda b, h, j, *_: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bs, D), table_lookup,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bs, D), table_lookup,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, G, D), lambda b, h, j, *_: (b, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((G, 128), jnp.float32),
            pltpu.VMEM((G, 128), jnp.float32),
            pltpu.VMEM((G, D), jnp.float32),
        ],
    )
    k_pool, v_pool, kv_e4m3 = _bitcast_e4m3_pools(k_pool, v_pool)
    kernel = functools.partial(
        _paged_decode_kernel, scale=scale, n_blk=MB, bs=bs,
        sliding_window=sliding_window, kv_e4m3=kv_e4m3,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Nk, G, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Nq * MB * bs * D,
            bytes_accessed=2 * B * MB * bs * D * Nk * 2,
            transcendentals=B * Nq * MB * bs,
        ),
        interpret=interpret,
    )(block_tables, lengths, starts, q4, k_pool, v_pool)
    return out.reshape(B, Nq, D)


def paged_decode(
    q, k_pool, v_pool, block_tables, lengths, starts, scale,
    sliding_window=None,
    kernel: str = "xla",
) -> jnp.ndarray:
    if kernel == "pallas":
        return paged_decode_tpu(q, k_pool, v_pool, block_tables, lengths,
                                starts, scale, sliding_window=sliding_window)
    return paged_decode_xla(q, k_pool, v_pool, block_tables, lengths,
                            starts, scale, sliding_window=sliding_window)


# -- frozen-pool decode (chunked decode quantum) ----------------------------
#
# During an n-step decode quantum the pools stay loop INVARIANTS: each
# step's K/V land in a small in-flight buffer and attention merges
# (frozen pool) + (in-flight slots <= current step) with a two-part
# online softmax, exactly like the dense-cache causal_lm.decode_steps.
# Carrying the pools through the scan costs a full pool read+write per
# layer per step (~4.3 GB/step at the serving-bench shape), plus a copy
# of each layer's pool slab across the Pallas custom-call boundary; the
# frozen kernel instead reads the STACKED [L, ...] pools directly via a
# prefetched layer index.


def paged_decode_frozen_xla(
    q: jnp.ndarray,            # [B, Nq, D]
    k_pool: jnp.ndarray,       # [n_blocks, Nk, bs, D] (single layer)
    v_pool: jnp.ndarray,
    block_tables: jnp.ndarray,  # [B, MB]
    lengths0: jnp.ndarray,      # [B] — slots used at QUANTUM START
    starts: jnp.ndarray,        # [B]
    k_infl: jnp.ndarray,        # [B, Nk, N, D] — this layer's in-flight K
    v_infl: jnp.ndarray,
    step: jnp.ndarray,          # scalar int32 current in-flight slot
    scale: float,
    sliding_window=None,
) -> jnp.ndarray:
    """Oracle: gather + two-part merge (tests / CPU). Every frozen slot
    is causally visible (all predate the quantum); in-flight slot j holds
    each row's own token at quantum step j, visible iff j <= step. With a
    window w, the current token sits at slot lengths0[b] + step, so pool
    slots need t > that - w and in-flight slots step - j < w (slot deltas
    equal logical deltas within a row)."""
    k = paged_gather_dense(k_pool, block_tables)
    v = paged_gather_dense(v_pool, block_tables)
    B, Nk, T, D = k.shape
    N = k_infl.shape[2]
    Nq = q.shape[1]
    G = Nq // Nk

    qg = q.reshape(B, 1, Nk, G, D).astype(jnp.float32)
    sf = jnp.einsum("bskgd,bktd->bkgst", qg, k.astype(jnp.float32)) * scale
    si = jnp.einsum("bskgd,bkjd->bkgsj", qg,
                    k_infl.astype(jnp.float32)) * scale
    t_idx = jnp.arange(T, dtype=jnp.int32)[None, :]
    mask_f = (t_idx < lengths0[:, None]) & (t_idx >= starts[:, None])
    j = jnp.arange(N, dtype=jnp.int32)
    mask_i = j <= step
    if sliding_window is not None:
        q_slot = lengths0[:, None] + step  # current token's slot per row
        mask_f &= t_idx > q_slot - sliding_window
        mask_i &= (step - j) < sliding_window
    sf = jnp.where(mask_f[:, None, None, None, :], sf, NEG_INF)
    si = jnp.where(mask_i[None, None, None, None, :], si, NEG_INF)
    s_all = jnp.concatenate([sf, si], axis=-1)
    probs = jax.nn.softmax(s_all, axis=-1)
    out = jnp.einsum("bkgst,bktd->bskgd", probs[..., :T],
                     v.astype(jnp.float32))
    out = out + jnp.einsum("bkgsj,bkjd->bskgd", probs[..., T:],
                           v_infl.astype(jnp.float32))
    return out.reshape(B, 1, Nq, D)[:, 0].astype(q.dtype)


def _paged_frozen_kernel(
    tables_ref,   # scalar prefetch: [B, MB] int32
    lengths_ref,  # scalar prefetch: [B] int32 (quantum-start lengths)
    starts_ref,   # scalar prefetch: [B] int32
    ls_ref,       # scalar prefetch: [2] int32 (layer, step)
    q_ref,        # [1, Nk, G, D]
    k_ref,        # [1, 1, Nk, bs, D] — selected pool block, layer l
    v_ref,        # [1, 1, Nk, bs, D]
    ik_ref,       # [1, Nk, N, D]
    iv_ref,       # [1, Nk, N, D]
    o_ref,        # [1, Nk, G, D]
    m_scr, l_scr, acc_scr,  # [Nk*G, 128] x2, [Nk*G, D]
    *,
    scale: float,
    n_blk: int,
    n_kv: int,
    bs: int,
    sliding_window,
    kv_e4m3: bool = False,
):
    b = pl.program_id(0)
    j = pl.program_id(1)
    G = q_ref.shape[2]
    R = n_kv * G

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    length = lengths_ref[b]
    start = starts_ref[b]
    block_live = (j * bs < length) & ((j + 1) * bs > start)

    def dots(x_rows, kv_ref, idx, contract, expand=False):
        outs = []
        for h in range(n_kv):
            tile = kv_ref[idx + (h,)]
            tile = (_e4m3_expand_f32(tile) if expand
                    else tile.astype(jnp.float32))
            outs.append(jax.lax.dot_general(
                x_rows[h * G : (h + 1) * G], tile,
                ((contract, ((), ()))),
                preferred_element_type=jnp.float32,
            ))
        return jnp.concatenate(outs, axis=0)

    q = q_ref[0].astype(jnp.float32).reshape(R, q_ref.shape[3])

    @pl.when(block_live)
    def _():
        s = dots(q, k_ref, (0, 0), ((1,), (1,)),
                 expand=kv_e4m3) * scale  # [R, bs]
        t = j * bs + jax.lax.broadcasted_iota(jnp.int32, (1, bs), 1)
        mask = (t < length) & (t >= start)
        if sliding_window is not None:
            mask &= t > length + ls_ref[1] - sliding_window
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_scr[:] = jnp.broadcast_to(
            l_scr[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True),
            l_scr.shape,
        )
        acc_scr[:] = acc_scr[:] * alpha + dots(p, v_ref, (0, 0),
                                               ((1,), (0,)),
                                               expand=kv_e4m3)
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(j == n_blk - 1)
    def _():
        step = ls_ref[1]
        N = ik_ref.shape[2]
        si = dots(q, ik_ref, (0,), ((1,), (1,))) * scale  # [R, N]
        ji = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
        mi = ji <= step
        if sliding_window is not None:
            mi &= (step - ji) < sliding_window
        si = jnp.where(mi, si, NEG_INF)

        m_prev = m_scr[:, :1]
        m2 = jnp.maximum(m_prev, jnp.max(si, axis=1, keepdims=True))
        pi = jnp.exp(si - m2)
        alpha2 = jnp.exp(m_prev - m2)
        l2 = l_scr[:, :1] * alpha2 + jnp.sum(pi, axis=1, keepdims=True)
        acc2 = acc_scr[:] * alpha2 + dots(pi, iv_ref, (0,), ((1,), (0,)))
        safe_l = jnp.where(l2 == 0.0, 1.0, l2)
        o_ref[0] = (acc2 / safe_l).reshape(o_ref.shape[1:]).astype(
            o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "sliding_window", "interpret")
)
def paged_decode_frozen_tpu(
    q: jnp.ndarray,            # [B, Nq, D]
    k_pools: jnp.ndarray,      # [L, n_blocks, Nk, bs, D] STACKED pools
    v_pools: jnp.ndarray,
    block_tables: jnp.ndarray,  # [B, MB] int32
    lengths0: jnp.ndarray,      # [B] int32 (quantum-start)
    starts: jnp.ndarray,        # [B] int32
    k_infl: jnp.ndarray,        # [B, Nk, N, D]
    v_infl: jnp.ndarray,
    l: jnp.ndarray,             # scalar int32 layer index
    step: jnp.ndarray,          # scalar int32 in-flight slot
    scale: float,
    sliding_window=None,
    interpret: bool = False,
) -> jnp.ndarray:
    B, Nq, D = q.shape
    L, n_blocks, Nk, bs, _ = k_pools.shape
    MB = block_tables.shape[1]
    N = k_infl.shape[2]
    G = Nq // Nk
    q4 = q.reshape(B, Nk, G, D)
    ls = jnp.stack([jnp.asarray(l, jnp.int32),
                    jnp.asarray(step, jnp.int32)])

    def table_lookup(b, j, tables, lengths, starts, ls):
        idx = tables[b, j]
        return (ls[0], jnp.where(j * bs < lengths[b], idx, 0), 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, MB),
        in_specs=[
            pl.BlockSpec((1, Nk, G, D), lambda b, j, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Nk, bs, D), table_lookup,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Nk, bs, D), table_lookup,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nk, N, D), lambda b, j, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nk, N, D), lambda b, j, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, Nk, G, D), lambda b, j, *_: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((Nk * G, 128), jnp.float32),
            pltpu.VMEM((Nk * G, 128), jnp.float32),
            pltpu.VMEM((Nk * G, D), jnp.float32),
        ],
    )
    k_pools, v_pools, kv_e4m3 = _bitcast_e4m3_pools(k_pools, v_pools)
    kernel = functools.partial(
        _paged_frozen_kernel, scale=scale, n_blk=MB, n_kv=Nk, bs=bs,
        sliding_window=sliding_window, kv_e4m3=kv_e4m3,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Nk, G, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Nq * (MB * bs + N) * D,
            bytes_accessed=2 * B * MB * bs * D * Nk * 2,
            transcendentals=B * Nq * (MB * bs + N),
        ),
        interpret=interpret,
    )(block_tables, lengths0, starts, ls, q4, k_pools, v_pools,
      k_infl, v_infl)
    return out.reshape(B, Nq, D)


# -- frozen-pool SPEC-VERIFY attention (S query positions) ------------------
#
# Speculative verification runs S = draft_len + 1 query positions per row
# in one forward. Queries attend the frozen pool (all slots predate the
# quantum), PRIOR rounds' accepted in-flight slots (given by a validity
# byte per slot), and their OWN round's slots causally (slot base + j
# visible to query s iff j <= s).


def paged_decode_spec_xla(
    q: jnp.ndarray,            # [B, S, Nq, D]
    k_pool: jnp.ndarray,       # [n_blocks, Nk, bs, D] (single layer)
    v_pool: jnp.ndarray,
    block_tables: jnp.ndarray,  # [B, MB]
    lengths0: jnp.ndarray,      # [B]
    starts: jnp.ndarray,        # [B]
    k_infl: jnp.ndarray,        # [B, Nk, N, D]
    v_infl: jnp.ndarray,
    infl_valid: jnp.ndarray,    # [B, N] bool — prior rounds' ACCEPTED slots
    base: jnp.ndarray,          # scalar int32 — own round's first slot
    scale: float,
    sliding_window=None,
    q_slots=None,              # [B, S] pool slot each verify position will
                               # occupy (required with a window)
    infl_slots=None,           # [B, N] pool slot per ACCEPTED in-flight
                               # entry (required with a window)
) -> jnp.ndarray:
    k = paged_gather_dense(k_pool, block_tables)
    v = paged_gather_dense(v_pool, block_tables)
    B, Nk, T, D = k.shape
    S = q.shape[1]
    N = k_infl.shape[2]
    Nq = q.shape[2]
    G = Nq // Nk

    qg = q.reshape(B, S, Nk, G, D).astype(jnp.float32)
    sf = jnp.einsum("bskgd,bktd->bkgst", qg, k.astype(jnp.float32)) * scale
    si = jnp.einsum("bskgd,bkjd->bkgsj", qg,
                    k_infl.astype(jnp.float32)) * scale
    t_idx = jnp.arange(T, dtype=jnp.int32)[None, :]
    mask_f = (t_idx < lengths0[:, None]) & (t_idx >= starts[:, None])
    mask_f = mask_f[:, None, :]                                # [B, 1, T]
    j = jnp.arange(N, dtype=jnp.int32)[None, None, :]          # [1, 1, N]
    s_idx = jnp.arange(S, dtype=jnp.int32)[None, :, None]      # [1, S, 1]
    own = (j >= base) & (j <= base + s_idx)                    # [1, S, N]
    mask_i = infl_valid[:, None, :] | own                      # [B, S, N]
    if sliding_window is not None:
        # slot deltas equal logical deltas within a row (frozen slot
        # index IS the pool slot; accepted in-flight slots carry theirs
        # in infl_slots; own-round slot j occupies q_slots[:, j - base])
        w = sliding_window
        qs = q_slots[:, :, None]                               # [B, S, 1]
        mask_f = mask_f & (t_idx[:, None, :] > qs - w)
        jidx = jnp.arange(N, dtype=jnp.int32)[None, :]         # [1, N]
        own_slot = jnp.take_along_axis(
            q_slots, jnp.clip(jidx - base, 0, S - 1), axis=1
        )                                                      # [B, N]
        slot_j = jnp.where(jidx >= base, own_slot, infl_slots)
        mask_i = mask_i & (slot_j[:, None, :] > qs - w)
    sf = jnp.where(mask_f[:, None, None, :, :], sf, NEG_INF)
    si = jnp.where(mask_i[:, None, None, :, :], si, NEG_INF)
    s_all = jnp.concatenate([sf, si], axis=-1)
    probs = jax.nn.softmax(s_all, axis=-1)
    out = jnp.einsum("bkgst,bktd->bskgd", probs[..., :T],
                     v.astype(jnp.float32))
    out = out + jnp.einsum("bkgsj,bkjd->bskgd", probs[..., T:],
                           v_infl.astype(jnp.float32))
    return out.reshape(B, S, Nq, D).astype(q.dtype)


def _paged_spec_kernel(
    tables_ref,   # scalar prefetch: [B, MB] int32
    lengths_ref,  # scalar prefetch: [B] int32
    starts_ref,   # scalar prefetch: [B] int32
    lb_ref,       # scalar prefetch: [2] int32 (layer, own-round base)
    q_ref,        # [1, Nk, S*G, D] (rows s-major within head)
    k_ref,        # [1, 1, Nk, bs, D]
    v_ref,        # [1, 1, Nk, bs, D]
    ik_ref,       # [1, Nk, N, D]
    iv_ref,       # [1, Nk, N, D]
    valid_ref,    # [1, 1, N] int8 — prior accepted in-flight slots
    o_ref,        # [1, Nk, S*G, D]
    m_scr, l_scr, acc_scr,
    *,
    scale: float,
    n_blk: int,
    n_kv: int,
    bs: int,
    n_g: int,     # G = Nq // Nk (rows per query position)
    kv_e4m3: bool = False,
):
    b = pl.program_id(0)
    j = pl.program_id(1)
    SG = q_ref.shape[2]
    R = n_kv * SG

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    length = lengths_ref[b]
    start = starts_ref[b]
    block_live = (j * bs < length) & ((j + 1) * bs > start)

    def dots(x_rows, kv_ref, idx, contract, expand=False):
        outs = []
        for h in range(n_kv):
            tile = kv_ref[idx + (h,)]
            tile = (_e4m3_expand_f32(tile) if expand
                    else tile.astype(jnp.float32))
            outs.append(jax.lax.dot_general(
                x_rows[h * SG : (h + 1) * SG], tile,
                ((contract, ((), ()))),
                preferred_element_type=jnp.float32,
            ))
        return jnp.concatenate(outs, axis=0)

    q = q_ref[0].astype(jnp.float32).reshape(R, q_ref.shape[3])

    @pl.when(block_live)
    def _():
        s = dots(q, k_ref, (0, 0), ((1,), (1,)),
                 expand=kv_e4m3) * scale  # [R, bs]
        t = j * bs + jax.lax.broadcasted_iota(jnp.int32, (1, bs), 1)
        mask = (t < length) & (t >= start)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_scr[:] = jnp.broadcast_to(
            l_scr[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True),
            l_scr.shape,
        )
        acc_scr[:] = acc_scr[:] * alpha + dots(p, v_ref, (0, 0),
                                               ((1,), (0,)),
                                               expand=kv_e4m3)
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(j == n_blk - 1)
    def _():
        base = lb_ref[1]
        N = ik_ref.shape[2]
        si = dots(q, ik_ref, (0,), ((1,), (1,))) * scale  # [R, N]
        # row r of the stacked scores is query position s = (r % SG) // G
        row = jax.lax.broadcasted_iota(jnp.int32, (R, N), 0)
        s_pos = (row % SG) // n_g
        ji = jax.lax.broadcasted_iota(jnp.int32, (R, N), 1)
        own = (ji >= base) & (ji <= base + s_pos)
        prior = valid_ref[0, 0][None, :] != 0
        si = jnp.where(prior | own, si, NEG_INF)

        m_prev = m_scr[:, :1]
        m2 = jnp.maximum(m_prev, jnp.max(si, axis=1, keepdims=True))
        pi = jnp.exp(si - m2)
        alpha2 = jnp.exp(m_prev - m2)
        l2 = l_scr[:, :1] * alpha2 + jnp.sum(pi, axis=1, keepdims=True)
        acc2 = acc_scr[:] * alpha2 + dots(pi, iv_ref, (0,), ((1,), (0,)))
        safe_l = jnp.where(l2 == 0.0, 1.0, l2)
        o_ref[0] = (acc2 / safe_l).reshape(o_ref.shape[1:]).astype(
            o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def paged_decode_spec_tpu(
    q: jnp.ndarray,            # [B, S, Nq, D]
    k_pools: jnp.ndarray,      # [L, n_blocks, Nk, bs, D] STACKED
    v_pools: jnp.ndarray,
    block_tables: jnp.ndarray,
    lengths0: jnp.ndarray,
    starts: jnp.ndarray,
    k_infl: jnp.ndarray,       # [B, Nk, N, D]
    v_infl: jnp.ndarray,
    infl_valid: jnp.ndarray,   # [B, N] bool
    l: jnp.ndarray,
    base: jnp.ndarray,
    scale: float,
    interpret: bool = False,
) -> jnp.ndarray:
    B, S, Nq, D = q.shape
    L, n_blocks, Nk, bs, _ = k_pools.shape
    MB = block_tables.shape[1]
    N = k_infl.shape[2]
    G = Nq // Nk
    # rows s-major within each head: [B, Nk, S*G, D]
    q4 = q.reshape(B, S, Nk, G, D).transpose(0, 2, 1, 3, 4).reshape(
        B, Nk, S * G, D)
    valid8 = infl_valid.astype(jnp.int8).reshape(B, 1, N)
    lb = jnp.stack([jnp.asarray(l, jnp.int32),
                    jnp.asarray(base, jnp.int32)])

    def table_lookup(b, j, tables, lengths, starts, lb):
        idx = tables[b, j]
        return (lb[0], jnp.where(j * bs < lengths[b], idx, 0), 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, MB),
        in_specs=[
            pl.BlockSpec((1, Nk, S * G, D), lambda b, j, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Nk, bs, D), table_lookup,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Nk, bs, D), table_lookup,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nk, N, D), lambda b, j, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nk, N, D), lambda b, j, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda b, j, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, Nk, S * G, D), lambda b, j, *_: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((Nk * S * G, 128), jnp.float32),
            pltpu.VMEM((Nk * S * G, 128), jnp.float32),
            pltpu.VMEM((Nk * S * G, D), jnp.float32),
        ],
    )
    k_pools, v_pools, kv_e4m3 = _bitcast_e4m3_pools(k_pools, v_pools)
    kernel = functools.partial(
        _paged_spec_kernel, scale=scale, n_blk=MB, n_kv=Nk, bs=bs, n_g=G,
        kv_e4m3=kv_e4m3,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Nk, S * G, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * S * Nq * (MB * bs + N) * D,
            bytes_accessed=2 * B * MB * bs * D * Nk * 2,
            transcendentals=B * S * Nq * (MB * bs + N),
        ),
        interpret=interpret,
    )(block_tables, lengths0, starts, lb, q4, k_pools, v_pools,
      k_infl, v_infl, valid8)
    # rows back to [B, S, Nq, D]
    return out.reshape(B, Nk, S, G, D).transpose(0, 2, 1, 3, 4).reshape(
        B, S, Nq, D)


def paged_decode_spec(
    q, k_pools, v_pools, block_tables, lengths0, starts, k_infl, v_infl,
    infl_valid, l, base, scale, kernel: str = "xla",
    sliding_window=None, q_slots=None, infl_slots=None,
) -> jnp.ndarray:
    # A window that cannot bind is no window: every key slot lives in
    # [0, MB*bs) and every query slot below MB*bs, so window >= MB*bs
    # masks nothing — the routine case for Mistral-7B (w=4096) serving
    # at max_blocks_per_seq*block_size <= 4096, which keeps the fast
    # kernel. A BINDING window rides the XLA path (the merge einsums
    # fuse the slot masks for free; the kernel variant stays window-free).
    if sliding_window is not None:
        max_span = block_tables.shape[1] * k_pools.shape[3]
        if sliding_window >= max_span:
            sliding_window = None
    if kernel == "pallas" and sliding_window is None:
        return paged_decode_spec_tpu(
            q, k_pools, v_pools, block_tables, lengths0, starts,
            k_infl, v_infl, infl_valid, l, base, scale,
        )
    kp = jax.lax.dynamic_index_in_dim(k_pools, l, 0, keepdims=False)
    vp = jax.lax.dynamic_index_in_dim(v_pools, l, 0, keepdims=False)
    return paged_decode_spec_xla(
        q, kp, vp, block_tables, lengths0, starts, k_infl, v_infl,
        infl_valid, base, scale, sliding_window=sliding_window,
        q_slots=q_slots, infl_slots=infl_slots,
    )


def paged_decode_frozen(
    q, k_pools, v_pools, block_tables, lengths0, starts, k_infl, v_infl,
    l, step, scale, sliding_window=None, kernel: str = "xla",
) -> jnp.ndarray:
    """Dispatch: `k_pools`/`v_pools` are the STACKED [L, ...] pools; the
    XLA oracle slices layer l, the kernel indexes it via scalar
    prefetch."""
    if kernel == "pallas":
        return paged_decode_frozen_tpu(
            q, k_pools, v_pools, block_tables, lengths0, starts,
            k_infl, v_infl, l, step, scale,
            sliding_window=sliding_window,
        )
    kp = jax.lax.dynamic_index_in_dim(k_pools, l, 0, keepdims=False)
    vp = jax.lax.dynamic_index_in_dim(v_pools, l, 0, keepdims=False)
    return paged_decode_frozen_xla(
        q, kp, vp, block_tables, lengths0, starts, k_infl, v_infl, step,
        scale, sliding_window=sliding_window,
    )
