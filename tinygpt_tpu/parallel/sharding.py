"""Mesh construction and tensor-parallel sharding rules.

The reference has NO distributed layer at all ("Distributed Inference" is
an unchecked TODO, /root/reference/README.md:32) — this component is
green-field TPU-native design:

  * a jax.sharding.Mesh over (dp, tp) axes — tp rides ICI within a slice,
    dp spans slices/hosts (DCN);
  * Megatron-style TP: QKV and gate/up projections sharded on the output
    feature dim, O and down projections on the input dim (so each layer
    needs one psum, inserted by GSPMD), KV cache sharded over kv-heads,
    vocab/lm_head sharded over vocab;
  * plain NamedSharding + jit: XLA GSPMD propagates intermediates and
    inserts the collectives. shard_map overlap tuning comes on top for
    the multi-host configs.

Head-count divisibility: tp must divide num_kv_heads for the cache spec;
otherwise KV is replicated on tp (GQA models with few KV heads).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tinygpt_tpu.hf.config import ModelConfig
from tinygpt_tpu.utils.logging import get_logger

log = get_logger("parallel")


def make_mesh(
    n_devices: Optional[int] = None,
    dp: int = 1,
    tp: Optional[int] = None,
    sp: int = 1,
    devices=None,
) -> Mesh:
    """Mesh over ("dp", "sp", "tp"). sp (sequence parallelism) shards the
    prompt/sequence axis of prefill activations — GSPMD all-gathers K/V
    for attention and keeps the per-token matmuls local; size-1 axes are
    free, so dp/tp-only callers are unaffected."""
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    devices = devices[:n]
    if tp is None:
        tp = n // (dp * sp)
    if dp * sp * tp != n:
        raise ValueError(f"dp({dp}) * sp({sp}) * tp({tp}) != devices({n})")
    arr = np.asarray(devices).reshape(dp, sp, tp)
    return Mesh(arr, ("dp", "sp", "tp"))


def data_pspecs(sp: bool = False, batch_axes="dp"):
    """PartitionSpecs for (ids, positions, valid) prefill inputs: batch on
    dp (or a ("dcn_dp", "dp") tuple on hybrid multi-host meshes),
    optionally sequence on sp."""
    s = "sp" if sp else None
    return P(batch_axes, s)


def param_pspecs(cfg: ModelConfig, params: Dict) -> Dict:
    """PartitionSpec pytree matching the causal_lm/gpt2 param layout."""
    if cfg.model_type == "gpt2":
        layer_specs = {
            "ln1_w": P(), "ln1_b": P(),
            "qkv_w": P(None, None, "tp"), "qkv_b": P(None, "tp"),
            "o_w": P(None, "tp", None), "o_b": P(),
            "ln2_w": P(), "ln2_b": P(),
            "fc_w": P(None, None, "tp"), "fc_b": P(None, "tp"),
            "proj_w": P(None, "tp", None), "proj_b": P(),
        }
        specs = {
            "wte": P("tp", None),
            "wpe": P(),
            "layers": {k: layer_specs[k] for k in params["layers"]},
            "lnf_w": P(), "lnf_b": P(),
        }
        return specs

    layer_specs = {
        "input_ln": P(),
        "qkv_w": P(None, None, "tp"),
        "qkv_b": P(None, "tp"),
        "o_w": P(None, "tp", None),
        "post_ln": P(),
        "gate_up_w": P(None, None, "tp"),
        "down_w": P(None, "tp", None),
        "q_norm": P(),
        "k_norm": P(),
        # MoE (mixtral): experts shard over the sp axis — idle during
        # decode, so each device holds E/sp experts and GSPMD turns the
        # dense expert contraction (causal_lm.moe_mlp) into expert
        # parallelism (local experts + psum). Megatron tp inside each
        # expert rides the last/middle dims as usual. shard_params drops
        # any axis the dim doesn't divide, so odd E degrades gracefully.
        "router_w": P(),
        "moe_gate_up_w": P(None, "sp", None, "tp"),
        "moe_down_w": P(None, "sp", "tp", None),
    }
    specs = {
        "embed": P("tp", None),
        "layers": {k: layer_specs[k] for k in params["layers"]},
        "final_ln": P(),
        "lm_head": None if params.get("lm_head") is None else P(None, "tp"),
        "rope_cos": P(),
        "rope_sin": P(),
    }
    return specs


def cache_pspecs(cfg: ModelConfig, tp_size: int, batch_axes="dp"):
    """KV cache [L, B, Nk, T, D]: shard kv-heads on tp when divisible,
    batch on dp (or ("dcn_dp", "dp") on hybrid multi-host meshes)."""
    kv_tp = "tp" if cfg.num_kv_heads % max(tp_size, 1) == 0 and tp_size > 1 else None
    from tinygpt_tpu.engine.kv_cache import KVCache

    return KVCache(
        k=P(None, batch_axes, kv_tp, None, None),
        v=P(None, batch_axes, kv_tp, None, None),
        kv_pos=P(batch_axes, None),
        valid=P(batch_axes, None),
        length=P(),
    )


def shard_params(params: Dict, mesh: Mesh, specs: Dict) -> Dict:
    """device_put the param pytree with NamedShardings.

    QuantizedTensor leaves get their weight spec applied to both the
    packed data and the scales: both are laid out [.., in(-ish), out], so
    the same dim-wise PartitionSpec describes them (int4 packs rows and
    scales group rows — divisibility permitting, else replicated)."""
    from tinygpt_tpu.ops.quant import QuantizedTensor

    def is_leaf(x):
        return x is None or isinstance(x, QuantizedTensor)

    def put_arr(x, spec):
        spec = spec or P()
        # drop axis shardings the (packed/grouped) dim no longer divides
        fixed = []
        for d, ax in enumerate(spec):
            if ax is None:
                fixed.append(None)
                continue
            size = mesh.shape[ax] if not isinstance(ax, tuple) else 0
            fixed.append(ax if size and x.shape[d] % size == 0 else None)
        return jax.device_put(x, NamedSharding(mesh, P(*fixed)))

    def put(x, spec):
        if x is None:
            return None
        if isinstance(x, QuantizedTensor):
            return QuantizedTensor(
                put_arr(x.data, spec), put_arr(x.scales, spec),
                bits=x.bits, group_size=x.group_size, in_dim=x.in_dim,
            )
        return put_arr(x, spec)

    return jax.tree.map(put, params, specs, is_leaf=is_leaf)
