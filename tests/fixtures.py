"""Tiny-model fixtures: random HF models saved to disk via transformers,
used as golden oracles for logit parity (the reference had no model-level
numerics tests at all — SURVEY.md §4)."""

from __future__ import annotations

import json
import os

import numpy as np


def tiny_hf_config(model_type: str):
    """A tiny transformers config per family (deterministic shapes)."""
    import transformers

    if model_type == "gpt2":
        return transformers.GPT2Config(
            vocab_size=503, n_positions=128, n_embd=64, n_layer=3, n_head=4,
            bos_token_id=0, eos_token_id=1,
        )
    if model_type == "llama":
        return transformers.LlamaConfig(
            vocab_size=503, hidden_size=64, intermediate_size=128,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, rope_theta=10000.0,
            rms_norm_eps=1e-5, tie_word_embeddings=False,
            bos_token_id=0, eos_token_id=1, attention_bias=False,
        )
    if model_type == "llama_scaled":
        return transformers.LlamaConfig(
            vocab_size=503, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=256, rope_theta=10000.0,
            rms_norm_eps=1e-5, tie_word_embeddings=True,
            bos_token_id=0, eos_token_id=1,
            rope_scaling={
                "rope_type": "llama3", "factor": 4.0,
                "high_freq_factor": 4.0, "low_freq_factor": 1.0,
                "original_max_position_embeddings": 64,
            },
        )
    if model_type == "qwen2":
        return transformers.Qwen2Config(
            vocab_size=503, hidden_size=64, intermediate_size=128,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, rms_norm_eps=1e-5,
            tie_word_embeddings=False, bos_token_id=0, eos_token_id=1,
        )
    if model_type == "qwen3":
        return transformers.Qwen3Config(
            vocab_size=503, hidden_size=64, intermediate_size=128,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
            head_dim=32, max_position_embeddings=128, rms_norm_eps=1e-5,
            tie_word_embeddings=False, bos_token_id=0, eos_token_id=1,
        )
    if model_type == "mistral":
        return transformers.MistralConfig(
            vocab_size=503, hidden_size=64, intermediate_size=128,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, rms_norm_eps=1e-5,
            sliding_window=None, bos_token_id=0, eos_token_id=1,
        )
    if model_type == "mixtral":
        return transformers.MixtralConfig(
            vocab_size=503, hidden_size=64, intermediate_size=128,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
            num_local_experts=4, num_experts_per_tok=2,
            max_position_embeddings=128, rms_norm_eps=1e-5,
            sliding_window=None, bos_token_id=0, eos_token_id=1,
            router_jitter_noise=0.0,
        )
    raise ValueError(model_type)


def build_tiny_model_dir(model_type: str, out_dir: str, seed: int = 0) -> str:
    """Instantiate a tiny random HF model and save_pretrained it (config
    + safetensors) — entirely offline."""
    import torch
    import transformers

    torch.manual_seed(seed)
    cfg = tiny_hf_config(model_type)
    model = transformers.AutoModelForCausalLM.from_config(cfg)
    model = model.eval()
    os.makedirs(out_dir, exist_ok=True)
    model.save_pretrained(out_dir, safe_serialization=True)
    return out_dir


def build_full_model_dir(
    out_dir: str,
    seed: int = 0,
    n_layer: int = 2,
    n_embd: int = 32,
    model_type: str = "gpt2",
    tokenizer_asset: str = "/root/reference/assets/tokenizer/gpt2",
) -> str:
    """A complete generate-able model dir: tiny random model with the REAL
    gpt2 tokenizer vocab (tokenizer files are read from the reference's
    read-only assets at test time, never committed)."""
    import shutil

    import torch
    import transformers

    torch.manual_seed(seed)
    if model_type == "llama":
        cfg = transformers.LlamaConfig(
            vocab_size=50257, hidden_size=n_embd,
            intermediate_size=n_embd * 2, num_hidden_layers=n_layer,
            num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=256, rope_theta=10000.0,
            rms_norm_eps=1e-5, tie_word_embeddings=True,
            bos_token_id=50256, eos_token_id=50256,
        )
    else:
        cfg = transformers.GPT2Config(
            vocab_size=50257, n_positions=256, n_embd=n_embd,
            n_layer=n_layer, n_head=4, bos_token_id=50256,
            eos_token_id=50256,
        )
    model = transformers.AutoModelForCausalLM.from_config(cfg).eval()
    os.makedirs(out_dir, exist_ok=True)
    model.save_pretrained(out_dir, safe_serialization=True)
    for f in ("tokenizer.json", "tokenizer_config.json"):
        src = os.path.join(tokenizer_asset, f)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(out_dir, f))
    with open(os.path.join(out_dir, "generation_config.json"), "w") as f:
        json.dump({"eos_token_id": 50256, "bos_token_id": 50256}, f)
    return out_dir


def hf_reference_logits(model_dir: str, input_ids: np.ndarray) -> np.ndarray:
    """Golden logits from transformers (fp32, CPU)."""
    import torch
    import transformers

    model = transformers.AutoModelForCausalLM.from_pretrained(
        model_dir, torch_dtype=torch.float32
    ).eval()
    with torch.no_grad():
        out = model(torch.from_numpy(np.asarray(input_ids, dtype=np.int64)))
    return out.logits.float().numpy()
