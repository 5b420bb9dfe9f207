"""One-stop HF model-dir loader.

Capability parity with /root/reference/src/huggingface/ModelLoader.{h,cpp}:
config.json → generation_config.json → tokenizer → model_type dispatch →
safetensors (single or sharded index) → params on device, returned as a
GPTContext bundle.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax.numpy as jnp

from tinygpt_tpu.hf.config import (
    GenerationConfig,
    ModelConfig,
    load_generation_config,
    load_model_config,
)
from tinygpt_tpu.hf.safetensors_io import load_safetensors_dir
from tinygpt_tpu.tokenizer import Tokenizer
from tinygpt_tpu.utils.logging import get_logger
from tinygpt_tpu.utils.timer import timed

log = get_logger("hf.loader")

_DTYPE_MAP = {
    "float32": jnp.float32,
    "fp32": jnp.float32,
    "float16": jnp.float16,
    "fp16": jnp.float16,
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
}


def resolve_dtype(dtype: Any):
    if isinstance(dtype, str):
        if dtype not in _DTYPE_MAP:
            raise ValueError(f"unknown dtype {dtype!r}")
        return _DTYPE_MAP[dtype]
    return dtype


@dataclass
class GPTContext:
    """Everything loaded from a model dir (reference: ModelLoader.h:16-21)."""

    model_config: ModelConfig
    generation_config: Optional[GenerationConfig]
    tokenizer: Tokenizer
    params: Dict
    model: Any  # namespace with forward/load_params/init_params


def load_model_dir(
    model_dir: str,
    dtype: Any = jnp.bfloat16,
    load_weights: bool = True,
) -> GPTContext:
    # deferred: models.{causal_lm,gpt2} import engine.kv_cache, whose
    # package __init__ imports this module (circular at import time)
    from tinygpt_tpu.models import get_model

    if not os.path.isdir(model_dir):
        raise FileNotFoundError(f"model dir {model_dir!r} not found")
    dtype = resolve_dtype(dtype)
    cfg = load_model_config(model_dir)
    gen_cfg = load_generation_config(model_dir)
    tokenizer = Tokenizer.from_dir(model_dir)
    model = get_model(cfg.model_type)
    params = None
    if load_weights:
        with timed() as t:
            weights = load_safetensors_dir(model_dir)
            params = model.load_params(cfg, weights, dtype=dtype)
        log.info(
            "loaded %s weights from %s in %.1fs",
            cfg.model_type, model_dir, t(),
        )
    return GPTContext(
        model_config=cfg,
        generation_config=gen_cfg,
        tokenizer=tokenizer,
        params=params,
        model=model,
    )
