"""Pipeline parallelism: microbatched stage execution over a "pp" mesh axis.

Green-field distributed design (the reference has no distributed layer at
all — /root/reference/README.md:32 lists "Distributed Inference" as an
unchecked TODO). TPU-native shape:

  * the model's layers are already STACKED on a leading axis (causal_lm
    params); pipeline staging is just a reshape [L, ...] -> [PP, L/PP, ...]
    sharded with PartitionSpec("pp", ...) — stage s owns layers
    [s*L/PP, (s+1)*L/PP);
  * execution runs under jax.shard_map with ONLY "pp" manual; "tp"/"dp"
    stay auto, so GSPMD still shards the per-stage matmuls and batch
    exactly as in the single-program path (composes TPxPPxDP);
  * the batch is cut into n_micro microbatches; tick t runs microbatch
    (t - stage) on each stage, activations hop stage->stage+1 over ICI via
    lax.ppermute — the classic 1F schedule with (PP-1) bubble ticks;
  * each stage updates only its own KV-cache shard; last-stage logits are
    psum-broadcast over "pp" so every host sees the same output.

Works for prefill (S = prompt length) and decode (S = 1) alike: one
compiled program per shape, no Python-level per-stage dispatch.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tinygpt_tpu.engine.kv_cache import KVCache
from tinygpt_tpu.hf.config import ModelConfig
from tinygpt_tpu.models.causal_lm import decoder_layer_step
from tinygpt_tpu.ops.norms import rms_norm


def stage_layers(layers: Dict, pp: int) -> Dict:
    """[L, ...] stacked layer tree -> [PP, L/PP, ...]."""
    L = next(iter(layers.values())).shape[0]
    if L % pp:
        raise ValueError(f"num layers {L} not divisible by pp={pp}")
    return jax.tree.map(
        lambda x: x.reshape(pp, L // pp, *x.shape[1:]), layers
    )


def unstage_layers(layers: Dict) -> Dict:
    return jax.tree.map(
        lambda x: x.reshape(x.shape[0] * x.shape[1], *x.shape[2:]), layers
    )


def stage_cache(cache: KVCache, pp: int) -> KVCache:
    """KVCache k/v [L, B, Nk, T, D] -> [PP, L/PP, B, Nk, T, D]."""
    L = cache.k.shape[0]
    if L % pp:
        raise ValueError(f"num layers {L} not divisible by pp={pp}")
    r = lambda x: x.reshape(pp, L // pp, *x.shape[1:])
    return cache._replace(k=r(cache.k), v=r(cache.v))


def unstage_cache(cache: KVCache) -> KVCache:
    r = lambda x: x.reshape(x.shape[0] * x.shape[1], *x.shape[2:])
    return cache._replace(k=r(cache.k), v=r(cache.v))


def staged_param_specs(cfg: ModelConfig, params_staged: Dict, tp: int) -> Dict:
    """PartitionSpecs for the staged param tree: layers get a leading "pp"
    dim on top of the Megatron-style tp sharding; everything else is
    replicated across pp (embed is needed on the first stage, lm_head /
    final norm on the last)."""
    layer_specs = {
        "input_ln": P("pp"),
        "qkv_w": P("pp", None, None, "tp"),
        "qkv_b": P("pp", None, "tp"),
        "o_w": P("pp", None, "tp", None),
        "post_ln": P("pp"),
        "gate_up_w": P("pp", None, None, "tp"),
        "down_w": P("pp", None, "tp", None),
        "q_norm": P("pp"),
        "k_norm": P("pp"),
    }
    vocab_tp = "tp" if tp > 1 and cfg.vocab_size % tp == 0 else None
    return {
        "embed": P(vocab_tp, None),
        "layers": {k: layer_specs[k] for k in params_staged["layers"]},
        "final_ln": P(),
        "lm_head": (
            None if params_staged.get("lm_head") is None
            else P(None, vocab_tp)
        ),
        "rope_cos": P(),
        "rope_sin": P(),
    }


def staged_cache_specs(cfg: ModelConfig, tp: int) -> KVCache:
    kv_tp = "tp" if tp > 1 and cfg.num_kv_heads % tp == 0 else None
    return KVCache(
        k=P("pp", None, "dp", kv_tp, None, None),
        v=P("pp", None, "dp", kv_tp, None, None),
        kv_pos=P("dp", None),
        valid=P("dp", None),
        length=P(),
    )


def make_pipelined_forward(
    mesh: Mesh,
    cfg: ModelConfig,
    n_micro: int,
    attn_impl: str = "xla",
):
    """Build fn(params_staged, ids, cache_staged, positions, token_valid)
    -> (last-position logits [B, V] f32, updated staged cache).

    B must be divisible by n_micro; layers must already be staged to the
    mesh's "pp" axis size. The returned function is jit-compatible.
    """
    pp = mesh.shape["pp"]
    tp = mesh.shape.get("tp", 1)
    _layer_spec_map = {
        "input_ln": P("pp"),
        "qkv_w": P("pp", None, None, "tp"),
        "qkv_b": P("pp", None, "tp"),
        "o_w": P("pp", None, "tp", None),
        "post_ln": P("pp"),
        "gate_up_w": P("pp", None, None, "tp"),
        "down_w": P("pp", None, "tp", None),
        "q_norm": P("pp"),
        "k_norm": P("pp"),
    }

    def fwd(params, ids, cache, positions, token_valid):
        B, S = ids.shape
        if B % n_micro:
            raise ValueError(f"batch {B} not divisible by n_micro={n_micro}")
        mb = B // n_micro
        slot = cache.length

        # slot bookkeeping for the full batch (replicated, tiny)
        kv_pos = jax.lax.dynamic_update_slice(
            cache.kv_pos, positions.astype(jnp.int32), (0, slot)
        )
        valid = jax.lax.dynamic_update_slice(
            cache.valid, token_valid, (0, slot)
        )

        layers_all = params["layers"]
        embed = params["embed"]
        head = params["lm_head"]
        if head is None:
            head = embed.T
        cos, sin = params["rope_cos"], params["rope_sin"]
        final_ln = params["final_ln"]
        H = embed.shape[1]
        V = head.shape[1]

        def stage_fn(layers_loc, k_loc, v_loc, ids, positions, kv_pos,
                     valid, embed, head, cos, sin, final_ln, slot):
            """Runs on every device; manual over "pp" only.

            layers_loc: [1, Lp, ...] local shard; k/v_loc: [1, Lp, B, ...];
            everything else replicated across pp.
            """
            layers_loc = jax.tree.map(lambda x: x[0], layers_loc)
            k_loc, v_loc = k_loc[0], v_loc[0]
            stage = jax.lax.axis_index("pp")
            is_first = stage == 0
            is_last = stage == pp - 1
            Lp = k_loc.shape[0]
            T = k_loc.shape[3]
            Nk, D = k_loc.shape[2], k_loc.shape[4]

            perm = [(i, i + 1) for i in range(pp - 1)]

            def tick(t, carry):
                send, k_loc, v_loc, out = carry
                recv = jax.lax.ppermute(send, "pp", perm)
                m = t - stage
                active = (m >= 0) & (m < n_micro)
                mc = jnp.clip(m, 0, n_micro - 1)
                o = mc * mb

                ids_m = jax.lax.dynamic_slice(ids, (o, 0), (mb, S))
                pos_m = jax.lax.dynamic_slice(positions, (o, 0), (mb, S))
                kvpos_m = jax.lax.dynamic_slice(kv_pos, (o, 0), (mb, T))
                valid_m = jax.lax.dynamic_slice(valid, (o, 0), (mb, T))

                x0 = embed[ids_m]
                x = jnp.where(is_first, x0, recv)

                k_blk = jax.lax.dynamic_slice(
                    k_loc, (0, o, 0, 0, 0), (Lp, mb, Nk, T, D)
                )
                v_blk = jax.lax.dynamic_slice(
                    v_loc, (0, o, 0, 0, 0), (Lp, mb, Nk, T, D)
                )

                def layer_fn(x, scanned):
                    lp, kc, vc = scanned
                    x, kc, vc = decoder_layer_step(
                        lp, x, kc, vc,
                        cfg=cfg, positions=pos_m, kv_pos=kvpos_m,
                        valid=valid_m, slot=slot, cos=cos, sin=sin,
                        attn_impl=attn_impl,
                    )
                    return x, (kc, vc)

                x, (k_new, v_new) = jax.lax.scan(
                    layer_fn, x, (layers_loc, k_blk, v_blk)
                )

                k_loc = jax.lax.dynamic_update_slice(
                    k_loc, jnp.where(active, k_new, k_blk), (0, o, 0, 0, 0)
                )
                v_loc = jax.lax.dynamic_update_slice(
                    v_loc, jnp.where(active, v_new, v_blk), (0, o, 0, 0, 0)
                )

                # last-stage head on the final position only
                h = rms_norm(x[:, -1, :], final_ln, cfg.rms_norm_eps)
                logits = (h @ head).astype(jnp.float32)  # [mb, V]
                cur = jax.lax.dynamic_slice(out, (o, 0), (mb, V))
                out = jax.lax.dynamic_update_slice(
                    out, jnp.where(active & is_last, logits, cur), (o, 0)
                )
                return (x, k_loc, v_loc, out)

            # initial carry must already be "pp"-varying for the loop's
            # VMA typing (values diverge per stage from tick 0)
            send0 = jax.lax.pcast(
                jnp.zeros((mb, S, H), embed.dtype), ("pp",), to="varying"
            )
            out0 = jax.lax.pcast(
                jnp.zeros((B, V), jnp.float32), ("pp",), to="varying"
            )
            _, k_loc, v_loc, out = jax.lax.fori_loop(
                0, n_micro + pp - 1, tick, (send0, k_loc, v_loc, out0)
            )
            # replicate last-stage logits to every stage
            out = jax.lax.psum(jnp.where(is_last, out, 0.0), "pp")
            return out, k_loc[None], v_loc[None]

        # partial-manual shard_map: specs may only mention the manual axis
        # ("pp"); tp/dp shardings propagate automatically (GSPMD) from the
        # arguments' NamedShardings.
        layer_specs = {k: P("pp") for k in layers_all}
        rep = lambda: P()
        out, new_k, new_v = jax.shard_map(
            stage_fn,
            mesh=mesh,
            in_specs=(
                layer_specs, P("pp"), P("pp"),
                rep(), rep(), rep(), rep(), rep(), rep(), rep(), rep(),
                rep(), rep(),
            ),
            out_specs=(P(), P("pp"), P("pp")),
            axis_names={"pp"},
        )(layers_all, cache.k, cache.v, ids, positions, kv_pos, valid,
          embed, head, cos, sin, final_ln, slot)

        new_cache = cache._replace(
            k=new_k, v=new_v, kv_pos=kv_pos, valid=valid,
            length=slot + S,
        )
        return out, new_cache

    return fwd


def shard_staged(params_staged, cache_staged, mesh: Mesh, cfg: ModelConfig):
    """device_put the staged params/cache with their pp/tp/dp shardings."""
    tp = mesh.shape.get("tp", 1)
    p_specs = staged_param_specs(cfg, params_staged, tp)
    c_specs = staged_cache_specs(cfg, tp)

    def put(x, spec):
        if x is None:
            return None
        return jax.device_put(x, NamedSharding(mesh, spec or P()))

    params = jax.tree.map(
        put, params_staged, p_specs, is_leaf=lambda x: x is None
    )
    cache = jax.tree.map(put, cache_staged, c_specs)
    return params, cache


def make_pipeline_mesh(dp: int, pp: int, tp: int, devices=None) -> Mesh:
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    n = dp * pp * tp
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(dp, pp, tp)
    return Mesh(arr, ("dp", "pp", "tp"))
