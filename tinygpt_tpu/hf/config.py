"""HuggingFace `config.json` / `generation_config.json` parsing.

Capability parity with the reference's hand-rolled rapidjson parser
(/root/reference/src/huggingface/ModelConfig.{h,cpp}): typed configs for
gpt2 / llama / qwen2 / qwen3 / mistral, including Llama-3 rope_scaling and
the generation defaults (eos list, sampling knobs).

Design differences from the reference (TPU-first, not a port):
  * one unified dataclass instead of a C++ subclass hierarchy — model
    families differ only by config deltas (qkv bias, qk-norm, head_dim,
    rope scaling), which is how the model builder consumes them;
  * normalized accessors (`head_dim`, `num_kv_heads` default) so model
    code never re-derives them;
  * dtype is a jnp dtype, not a torch DType.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, Optional

import jax.numpy as jnp

MODEL_TYPE_GPT2 = "gpt2"
MODEL_TYPE_LLAMA = "llama"
MODEL_TYPE_QWEN2 = "qwen2"
MODEL_TYPE_QWEN3 = "qwen3"
MODEL_TYPE_MISTRAL = "mistral"
MODEL_TYPE_MIXTRAL = "mixtral"

SUPPORTED_MODEL_TYPES = (
    MODEL_TYPE_GPT2,
    MODEL_TYPE_LLAMA,
    MODEL_TYPE_QWEN2,
    MODEL_TYPE_QWEN3,
    MODEL_TYPE_MISTRAL,
    MODEL_TYPE_MIXTRAL,
)

_TORCH_DTYPE_MAP = {
    "float32": jnp.float32,
    "float16": jnp.float16,
    "bfloat16": jnp.bfloat16,
}


@dataclass(frozen=True)
class RopeScaling:
    """Llama-3-style rope scaling (reference: ModelConfig.cpp:79-87)."""

    rope_type: str = "default"
    factor: float = 1.0
    high_freq_factor: float = 4.0
    low_freq_factor: float = 1.0
    original_max_position_embeddings: int = 0

    @staticmethod
    def from_json(obj: Optional[dict]) -> Optional["RopeScaling"]:
        if not obj:
            return None
        return RopeScaling(
            rope_type=obj.get("rope_type", obj.get("type", "default")),
            factor=float(obj.get("factor", 1.0)),
            high_freq_factor=float(obj.get("high_freq_factor", 4.0)),
            low_freq_factor=float(obj.get("low_freq_factor", 1.0)),
            original_max_position_embeddings=int(
                obj.get("original_max_position_embeddings", 0)
            ),
        )


@dataclass(frozen=True)
class ModelConfig:
    """Unified decoder-only transformer config for all supported families."""

    model_type: str
    vocab_size: int
    hidden_size: int
    num_hidden_layers: int
    num_attention_heads: int
    intermediate_size: int
    max_position_embeddings: int

    num_key_value_heads: Optional[int] = None
    explicit_head_dim: Optional[int] = None  # qwen3 sets head_dim explicitly
    hidden_act: str = "silu"
    rms_norm_eps: float = 1e-6
    layer_norm_epsilon: float = 1e-5  # gpt2
    rope_theta: float = 10000.0
    rope_scaling: Optional[RopeScaling] = None
    attention_bias: bool = False  # qkv+o bias (llama knob)
    qkv_bias: bool = False  # qwen2: bias on qkv only
    qk_norm: bool = False  # qwen3: per-head RMSNorm on q/k
    sliding_window: Optional[int] = None  # mistral/qwen (parsed; applied in attn)
    # MoE (mixtral): >0 experts turns the MLP into a routed top-k mixture
    num_local_experts: int = 0
    num_experts_per_tok: int = 2
    tie_word_embeddings: bool = False
    bos_token_id: Optional[int] = None
    eos_token_id: tuple = ()
    torch_dtype: Any = jnp.float32

    raw: dict = field(default_factory=dict, repr=False, compare=False)

    @property
    def head_dim(self) -> int:
        if self.explicit_head_dim:
            return self.explicit_head_dim
        return self.hidden_size // self.num_attention_heads

    @property
    def num_kv_heads(self) -> int:
        return self.num_key_value_heads or self.num_attention_heads

    @property
    def context_size(self) -> int:
        """Max supported positions. With Llama-3 rope scaling the scaled
        range extends beyond original_max_position_embeddings; the reference
        conservatively clamps to the original (ModelLlama.h:26-31) — we keep
        the full scaled max_position_embeddings, which is the HF behavior."""
        return self.max_position_embeddings

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


def _eos_tuple(v: Any) -> tuple:
    if v is None:
        return ()
    if isinstance(v, list):
        return tuple(int(x) for x in v)
    return (int(v),)


def parse_model_config(cfg: dict) -> ModelConfig:
    """Parse a loaded HF config.json dict into a ModelConfig."""
    model_type = cfg.get("model_type")
    if model_type not in SUPPORTED_MODEL_TYPES:
        raise ValueError(
            f"unsupported model_type {model_type!r}; "
            f"supported: {SUPPORTED_MODEL_TYPES}"
        )
    torch_dtype = _TORCH_DTYPE_MAP.get(cfg.get("torch_dtype", "float32"), jnp.float32)

    if model_type == MODEL_TYPE_GPT2:
        n_embd = int(cfg.get("n_embd", 768))
        return ModelConfig(
            model_type=model_type,
            vocab_size=int(cfg.get("vocab_size", 50257)),
            hidden_size=n_embd,
            num_hidden_layers=int(cfg.get("n_layer", 12)),
            num_attention_heads=int(cfg.get("n_head", 12)),
            intermediate_size=int(cfg.get("n_inner") or 4 * n_embd),
            max_position_embeddings=int(cfg.get("n_positions", 1024)),
            hidden_act=cfg.get("activation_function", "gelu_new"),
            layer_norm_epsilon=float(cfg.get("layer_norm_epsilon", 1e-5)),
            attention_bias=True,
            tie_word_embeddings=bool(cfg.get("tie_word_embeddings", True)),
            bos_token_id=cfg.get("bos_token_id"),
            eos_token_id=_eos_tuple(cfg.get("eos_token_id")),
            torch_dtype=torch_dtype,
            raw=cfg,
        )

    common = dict(
        model_type=model_type,
        vocab_size=int(cfg["vocab_size"]),
        hidden_size=int(cfg["hidden_size"]),
        num_hidden_layers=int(cfg["num_hidden_layers"]),
        num_attention_heads=int(cfg["num_attention_heads"]),
        intermediate_size=int(cfg["intermediate_size"]),
        max_position_embeddings=int(cfg.get("max_position_embeddings", 2048)),
        num_key_value_heads=(
            int(cfg["num_key_value_heads"])
            if cfg.get("num_key_value_heads") is not None
            else None
        ),
        hidden_act=cfg.get("hidden_act", "silu"),
        rms_norm_eps=float(cfg.get("rms_norm_eps", 1e-6)),
        rope_theta=float(cfg.get("rope_theta", 10000.0)),
        sliding_window=(
            int(cfg["sliding_window"])
            if cfg.get("sliding_window") is not None
            and cfg.get("use_sliding_window", True)
            else None
        ),
        tie_word_embeddings=bool(cfg.get("tie_word_embeddings", False)),
        bos_token_id=cfg.get("bos_token_id"),
        eos_token_id=_eos_tuple(cfg.get("eos_token_id")),
        torch_dtype=torch_dtype,
        raw=cfg,
    )

    if model_type == MODEL_TYPE_LLAMA:
        return ModelConfig(
            **common,
            attention_bias=bool(cfg.get("attention_bias", False)),
            explicit_head_dim=(
                int(cfg["head_dim"]) if cfg.get("head_dim") is not None else None
            ),
            rope_scaling=RopeScaling.from_json(cfg.get("rope_scaling")),
        )
    if model_type == MODEL_TYPE_QWEN2:
        # Qwen2 has bias on q/k/v projections but not o (HF Qwen2Attention).
        return ModelConfig(**common, qkv_bias=True)
    if model_type == MODEL_TYPE_QWEN3:
        return ModelConfig(
            **common,
            explicit_head_dim=(
                int(cfg["head_dim"]) if cfg.get("head_dim") is not None else None
            ),
            qk_norm=True,
        )
    if model_type == MODEL_TYPE_MIXTRAL:
        # Mixtral: Mistral attention + block-sparse MoE MLP (top-k routed
        # experts, full-softmax -> topk -> renormalize, HF semantics)
        return ModelConfig(
            **common,
            num_local_experts=int(cfg.get("num_local_experts", 8)),
            num_experts_per_tok=int(cfg.get("num_experts_per_tok", 2)),
        )
    # mistral
    return ModelConfig(**common)


@dataclass(frozen=True)
class GenerationConfig:
    """generation_config.json (reference: ModelConfig.cpp:127-164)."""

    bos_token_id: Optional[int] = None
    eos_token_ids: tuple = ()
    do_sample: bool = False
    temperature: Optional[float] = None
    top_k: Optional[int] = None
    top_p: Optional[float] = None
    min_p: Optional[float] = None

    @staticmethod
    def from_json(cfg: dict) -> "GenerationConfig":
        return GenerationConfig(
            bos_token_id=cfg.get("bos_token_id"),
            eos_token_ids=_eos_tuple(cfg.get("eos_token_id")),
            do_sample=bool(cfg.get("do_sample", False)),
            temperature=cfg.get("temperature"),
            top_k=cfg.get("top_k"),
            top_p=cfg.get("top_p"),
            min_p=cfg.get("min_p"),
        )


def load_model_config(path: str) -> ModelConfig:
    """Load config.json from a file path or a model dir."""
    if os.path.isdir(path):
        path = os.path.join(path, "config.json")
    with open(path, "r", encoding="utf-8") as f:
        return parse_model_config(json.load(f))


def load_generation_config(path: str) -> Optional[GenerationConfig]:
    """Load generation_config.json; returns None if absent (it is optional
    in HF model dirs, reference: ModelLoader.cpp:34-39)."""
    if os.path.isdir(path):
        path = os.path.join(path, "generation_config.json")
    if not os.path.exists(path):
        return None
    with open(path, "r", encoding="utf-8") as f:
        return GenerationConfig.from_json(json.load(f))
