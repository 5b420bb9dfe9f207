"""Perplexity harness + FP8 KV cache + quantization quality-delta tests."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from tests.fixtures import build_tiny_model_dir
from tinygpt_tpu.engine.kv_cache import create_kv_cache
from tinygpt_tpu.evaluate import perplexity, window_nll
from tinygpt_tpu.hf.config import load_model_config
from tinygpt_tpu.hf.safetensors_io import load_safetensors_dir
from tinygpt_tpu.models import get_model
from tinygpt_tpu.ops.quant import quantize_params


@pytest.fixture(scope="module")
def llama(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_llama_eval")
    build_tiny_model_dir("llama", str(d), seed=33)
    cfg = load_model_config(str(d))
    model = get_model(cfg.model_type)
    params = model.load_params(cfg, load_safetensors_dir(str(d)),
                               dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = [int(x) for x in rng.integers(2, cfg.vocab_size, 300)]
    return cfg, model, params, ids


def test_perplexity_sane(llama):
    cfg, model, params, ids = llama
    ppl = perplexity(model, cfg, params, ids, window=64, stride=32)
    # random model on random tokens: ppl near vocab size, definitely finite
    assert 1.0 < ppl < cfg.vocab_size * 10
    # windowing consistency: same data, bigger window → similar ppl
    ppl2 = perplexity(model, cfg, params, ids, window=128, stride=64)
    assert abs(math.log(ppl) - math.log(ppl2)) < 0.2


def test_all_tokens_scored_once(llama):
    cfg, model, params, ids = llama
    nll, n = window_nll(model, cfg, params, ids, window=64, stride=32)
    assert n == len(ids) - 1


@pytest.mark.parametrize("bits,budget", [(8, 0.05), (4, 0.5)])
def test_quantization_ppl_delta(llama, bits, budget):
    """Δppl gates (scaled-down analog of the BASELINE.json WikiText gates:
    int8 ≤ 0.1, int4 ≤ 0.5 — here log-ppl deltas on a tiny model)."""
    cfg, model, params, ids = llama
    base = perplexity(model, cfg, params, ids, window=64, stride=32)
    qparams = quantize_params(params, bits=bits, group_size=32)
    qppl = perplexity(model, cfg, qparams, ids, window=64, stride=32)
    delta = abs(math.log(qppl) - math.log(base))
    assert delta < budget, f"int{bits}: log-ppl delta {delta:.4f}"


def test_fp8_kv_cache_close_to_fp32(llama):
    """FP8 (e4m3) KV storage: logits must stay close to the fp32-KV path."""
    cfg, model, params, ids = llama
    rng = np.random.default_rng(1)
    toks = jnp.asarray([ids[:16]], jnp.int32)
    pos = jnp.arange(16)[None, :]
    vld = jnp.ones((1, 16), jnp.bool_)

    cache32 = create_kv_cache(cfg, 1, 32, dtype=jnp.float32)
    ref, _ = model.forward(params, cfg, toks, cache32, pos, vld)

    cache8 = create_kv_cache(cfg, 1, 32, dtype=jnp.float8_e4m3fn)
    assert cache8.k.dtype == jnp.float8_e4m3fn
    got, _ = model.forward(params, cfg, toks, cache8, pos, vld)

    ref, got = np.asarray(ref), np.asarray(got)
    # top-1 agreement stays high under fp8 KV
    agree = (ref.argmax(-1) == got.argmax(-1)).mean()
    assert agree > 0.85, agree


def test_fp8_kv_in_engine(tmp_path):
    from tests.fixtures import build_full_model_dir
    from tinygpt_tpu.engine.engine import GPTConfig, GPTEngine

    d = str(tmp_path / "m")
    build_full_model_dir(d, seed=17)
    eng = GPTEngine(GPTConfig(model_dir=d, dtype="float32", max_tokens=4,
                              prefill_bucket=16, kv_cache_dtype="fp8"))
    eng.prepare()
    out = eng.generate_sync(["fp8 kv test"])[0]
    assert len(out.token_ids) > 0


def test_fp8_kv_in_scheduler(llama):
    from tinygpt_tpu.engine.scheduler import (
        ContinuousBatcher, Request, SchedulerConfig,
    )

    cfg, model, params, ids = llama
    batcher = ContinuousBatcher(
        model, cfg, params, eos_ids=set(),
        config=SchedulerConfig(
            batch_capacity=2, block_size=16, n_blocks=32,
            max_blocks_per_seq=4, prefill_bucket=16, dtype="float32",
            kv_cache_dtype="fp8",
        ),
    )
    assert batcher.state.k_pool.dtype == jnp.float8_e4m3fn
    batcher.add_request(Request(request_id=0, prompt_ids=ids[:8],
                                max_new_tokens=3))
    toks = []
    steps = 0
    while batcher.has_work and steps < 20:
        for ev in batcher.step():
            if ev.token_id is not None:
                toks.append(ev.token_id)
        steps += 1
    assert len(toks) == 3
