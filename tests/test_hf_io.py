"""Tests for HF config parsing and safetensors I/O (round-trip + sharded)."""

import json
import os

import ml_dtypes
import numpy as np
import pytest

from tinygpt_tpu.hf.config import (
    GenerationConfig,
    parse_model_config,
)
from tinygpt_tpu.hf.safetensors_io import (
    SafeTensorsError,
    load_safetensors,
    load_safetensors_dir,
    match_state,
    save_safetensors,
)

LLAMA32_1B = {
    "model_type": "llama",
    "vocab_size": 128256,
    "hidden_size": 2048,
    "num_hidden_layers": 16,
    "num_attention_heads": 32,
    "num_key_value_heads": 8,
    "intermediate_size": 8192,
    "max_position_embeddings": 131072,
    "rms_norm_eps": 1e-5,
    "rope_theta": 500000.0,
    "rope_scaling": {
        "factor": 32.0,
        "high_freq_factor": 4.0,
        "low_freq_factor": 1.0,
        "original_max_position_embeddings": 8192,
        "rope_type": "llama3",
    },
    "tie_word_embeddings": True,
    "torch_dtype": "bfloat16",
    "bos_token_id": 128000,
    "eos_token_id": [128001, 128008, 128009],
}


def test_parse_llama_config():
    cfg = parse_model_config(LLAMA32_1B)
    assert cfg.model_type == "llama"
    assert cfg.head_dim == 64
    assert cfg.num_kv_heads == 8
    assert cfg.rope_scaling.rope_type == "llama3"
    assert cfg.rope_scaling.original_max_position_embeddings == 8192
    assert cfg.eos_token_id == (128001, 128008, 128009)
    assert cfg.tie_word_embeddings


def test_parse_gpt2_config():
    cfg = parse_model_config(
        {"model_type": "gpt2", "n_embd": 768, "n_layer": 12, "n_head": 12,
         "n_positions": 1024, "vocab_size": 50257, "eos_token_id": 50256}
    )
    assert cfg.hidden_size == 768
    assert cfg.intermediate_size == 3072
    assert cfg.max_position_embeddings == 1024
    assert cfg.num_kv_heads == 12
    assert cfg.eos_token_id == (50256,)


def test_parse_qwen3_config():
    cfg = parse_model_config(
        {"model_type": "qwen3", "vocab_size": 151936, "hidden_size": 1024,
         "num_hidden_layers": 28, "num_attention_heads": 16,
         "num_key_value_heads": 8, "intermediate_size": 3072,
         "head_dim": 128, "max_position_embeddings": 40960}
    )
    assert cfg.head_dim == 128  # explicit, not hidden/heads = 64
    assert cfg.qk_norm


def test_parse_qwen2_has_qkv_bias():
    cfg = parse_model_config(
        {"model_type": "qwen2", "vocab_size": 151936, "hidden_size": 896,
         "num_hidden_layers": 24, "num_attention_heads": 14,
         "num_key_value_heads": 2, "intermediate_size": 4864}
    )
    assert cfg.qkv_bias and not cfg.attention_bias


def test_unsupported_model_type():
    with pytest.raises(ValueError):
        parse_model_config({"model_type": "mamba"})


def test_generation_config():
    gc = GenerationConfig.from_json(
        {"bos_token_id": 1, "eos_token_id": [2, 32000], "do_sample": True,
         "temperature": 0.7, "top_p": 0.8, "top_k": 20}
    )
    assert gc.eos_token_ids == (2, 32000)
    assert gc.do_sample and gc.temperature == 0.7


def test_safetensors_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "a.weight": rng.standard_normal((4, 8)).astype(np.float32),
        "b.bias": rng.standard_normal((8,)).astype(ml_dtypes.bfloat16),
        "c.scale": np.array(3, dtype=np.int64),
        "q.int8": rng.integers(-127, 127, (16, 8)).astype(np.int8),
    }
    path = str(tmp_path / "model.safetensors")
    save_safetensors(path, tensors, metadata={"format": "pt"})
    loaded = load_safetensors(path)
    assert set(loaded) == set(tensors)
    for k in tensors:
        assert loaded[k].dtype == tensors[k].dtype
        np.testing.assert_array_equal(np.asarray(loaded[k]), tensors[k])


def test_safetensors_sharded(tmp_path):
    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    b = np.arange(6, dtype=np.float32).reshape(2, 3)
    save_safetensors(str(tmp_path / "model-00001.safetensors"), {"w.a": a})
    save_safetensors(str(tmp_path / "model-00002.safetensors"), {"w.b": b})
    index = {
        "metadata": {"total_size": a.nbytes + b.nbytes},
        "weight_map": {"w.a": "model-00001.safetensors",
                       "w.b": "model-00002.safetensors"},
    }
    with open(tmp_path / "model.safetensors.index.json", "w") as f:
        json.dump(index, f)
    loaded = load_safetensors_dir(str(tmp_path))
    np.testing.assert_array_equal(np.asarray(loaded["w.a"]), a)
    np.testing.assert_array_equal(np.asarray(loaded["w.b"]), b)


def test_safetensors_parity_with_hf_library(tmp_path):
    """Cross-validate our writer/reader against the official safetensors lib."""
    st = pytest.importorskip("safetensors.numpy")
    rng = np.random.default_rng(1)
    tensors = {"x": rng.standard_normal((5, 7)).astype(np.float32)}
    ours = str(tmp_path / "ours.safetensors")
    save_safetensors(ours, tensors)
    theirs = st.load_file(ours)
    np.testing.assert_array_equal(theirs["x"], tensors["x"])

    theirs_path = str(tmp_path / "theirs.safetensors")
    st.save_file(tensors, theirs_path)
    back = load_safetensors(theirs_path)
    np.testing.assert_array_equal(np.asarray(back["x"]), tensors["x"])


def test_match_state_strict(tmp_path):
    loaded = {"a": np.zeros((2, 2), np.float32)}
    missing, unexpected = match_state(
        loaded, {"a": ((2, 2), None), "b": ((3,), None)}, strict=False
    )
    assert missing == ["b"] and unexpected == []
    with pytest.raises(SafeTensorsError):
        match_state(loaded, {"a": ((9, 9), None)})
    with pytest.raises(SafeTensorsError):
        match_state(loaded, {}, strict=True)
