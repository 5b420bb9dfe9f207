"""Engine end-to-end tests on a tiny GPT-2 with the real gpt2 tokenizer:
sync batch, streaming, EOS/abort, determinism, prefill/decode consistency.
(The reference validates the engine only manually — SURVEY.md §4.)"""

import numpy as np
import pytest

from tests.fixtures import build_full_model_dir
from tinygpt_tpu.engine.engine import (
    FinishReason,
    GPTConfig,
    GPTEngine,
)
from tinygpt_tpu.ops.sampling import SamplerConfig


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    d = tmp_path_factory.mktemp("full_gpt2")
    build_full_model_dir(str(d), seed=7)
    eng = GPTEngine(GPTConfig(
        model_dir=str(d), dtype="float32", max_tokens=8,
        prefill_bucket=16,
    ))
    eng.prepare()
    return eng


def test_generate_sync_batch(engine):
    outs = engine.generate_sync(["Hello world", "The quick brown fox"])
    assert len(outs) == 2
    for o in outs:
        assert 0 < len(o.token_ids) <= 8
        assert o.finish_reason in (FinishReason.LENGTH, FinishReason.STOP)
        assert isinstance(o.text, str)


def test_greedy_determinism(engine):
    a = engine.generate_sync(["Deterministic prompt"])[0]
    b = engine.generate_sync(["Deterministic prompt"])[0]
    assert a.token_ids == b.token_ids
    assert a.text == b.text


def test_batch_matches_single(engine):
    """A sequence generated in a batch must equal the same sequence
    generated alone (left-padding invariance end-to-end)."""
    solo = engine.generate_sync(["One fish two fish"])[0]
    batch = engine.generate_sync(
        ["One fish two fish", "A much much much longer prompt than that one"]
    )[0]
    assert solo.token_ids == batch.token_ids


def test_streaming_matches_sync(engine):
    chunks = []
    out = engine.generate_async(
        "Hello world", lambda chunk, done: (chunks.append(chunk), True)[1]
    )
    sync = engine.generate_sync(["Hello world"])[0]
    assert out.token_ids == sync.token_ids
    assert "".join(chunks) == sync.text == out.text


def test_streaming_abort(engine):
    seen = []

    def cb(chunk, done):
        seen.append(chunk)
        return False  # abort immediately

    out = engine.generate_async("Hello world", cb)
    assert out.finish_reason == FinishReason.ABORT
    assert len(out.token_ids) <= 2


def test_extra_stop_token(engine):
    base = engine.generate_sync(["Stop test prompt"])[0]
    assert len(base.token_ids) >= 2
    stop_tok = base.token_ids[1]
    expected = base.token_ids[: base.token_ids.index(stop_tok)]
    engine.reconfigure(extra_stop_token_ids=[stop_tok])
    try:
        out = engine.generate_sync(["Stop test prompt"])[0]
        assert out.finish_reason == FinishReason.STOP
        assert out.token_ids == expected
    finally:
        engine.reconfigure(extra_stop_token_ids=[])


def test_reconfigure_sampler_and_max_tokens(engine):
    engine.reconfigure(
        sampler=SamplerConfig(temperature=0.8, top_p=0.9), max_tokens=3
    )
    try:
        out = engine.generate_sync(["Sampling prompt"])[0]
        assert len(out.token_ids) <= 3
    finally:
        engine.reconfigure(sampler=SamplerConfig(), max_tokens=8)


def test_empty_prompt(engine):
    out = engine.generate_sync([""])[0]
    assert isinstance(out.text, str)


def test_chat_template_missing_raises(engine):
    # gpt2 has no chat template and no ChatML tokens
    with pytest.raises(ValueError):
        engine.apply_chat_template([{"role": "user", "content": "hi"}])


@pytest.fixture(scope="module")
def full_model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("full_gpt2_spec")
    build_full_model_dir(str(d), seed=7)
    return str(d)


def test_speculative_ngram_matches_greedy(full_model_dir):
    """n-gram speculative decoding must be EXACT for greedy sampling —
    identical token streams with and without it, on text repetitive
    enough to exercise real acceptances."""
    from tinygpt_tpu.engine.engine import GPTConfig, GPTEngine, ngram_draft

    prompt = "the cat sat on the mat. the cat sat on the"
    outs = {}
    for spec in (None, "ngram"):
        eng = GPTEngine(GPTConfig(
            model_dir=full_model_dir, dtype="float32", max_tokens=24,
            speculative=spec, spec_draft_len=4, spec_ngram=2,
        ))
        eng.prepare()
        outs[spec] = eng.generate_sync([prompt])[0].token_ids
    assert outs[None] == outs["ngram"]

    # streaming path too
    eng = GPTEngine(GPTConfig(
        model_dir=full_model_dir, dtype="float32", max_tokens=16,
        speculative="ngram",
    ))
    eng.prepare()
    chunks = []
    res = eng.generate_async(prompt, lambda c, fin: (chunks.append(c), True)[1])
    assert res.token_ids == outs["ngram"][:16] or len(res.token_ids) <= 16

    # drafting helper semantics
    assert ngram_draft([1, 2, 3, 9, 1, 2, 3], 3, 2) == [9, 1]
    assert ngram_draft([1, 2, 3], 3, 2) == []
    # most-recent match wins (standard prompt-lookup), so the continuation
    # can be shorter than k near the tail
    assert ngram_draft([5, 5, 5, 5], 1, 3) == [5]


def test_engine_sharded_matches_single(full_model_dir):
    """GPTEngine with a (dp, sp, tp) mesh must produce the same greedy
    tokens as single-device execution (GSPMD sharding is a layout, not a
    numerics change — modulo reduction-order noise, which the tiny
    fixture tolerates poorly, hence token-level check on short output)."""
    prompts = ["Hello world", "The quick brown fox"]
    outs = {}
    for mesh_shape in (None, (2, 1, 4), (1, 2, 4), (1, 1, 8)):
        eng = GPTEngine(GPTConfig(
            model_dir=full_model_dir, dtype="float32", max_tokens=6,
            mesh_shape=mesh_shape,
        ))
        eng.prepare()
        outs[mesh_shape] = [o.token_ids for o in eng.generate_sync(prompts)]
    for shape, toks in outs.items():
        assert toks == outs[None], f"mesh {shape} diverged: {toks}"


def test_engine_sharded_quantized(full_model_dir):
    """Mesh + weight-only quantization compose (QuantizedTensor leaves
    shard data+scales with the weight's spec)."""
    eng = GPTEngine(GPTConfig(
        model_dir=full_model_dir, dtype="float32", max_tokens=4,
        mesh_shape=(1, 1, 4), quantization="int8", quant_group_size=8,
    ))
    eng.prepare()
    outs = eng.generate_sync(["Hello world"])
    assert len(outs[0].token_ids) > 0


@pytest.fixture(scope="module")
def llama_model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("full_llama_pp")
    build_full_model_dir(str(d), seed=9, n_layer=4, model_type="llama")
    return str(d)


def test_engine_pipeline_parallel_matches_single(llama_model_dir):
    """mesh_shape=(dp, sp, pp, tp) runs the engine through the
    microbatched pipeline stages; greedy tokens must match single-device
    execution."""
    prompts = ["Hello world", "The quick brown fox"]
    outs = {}
    for mesh_shape in (None, (1, 1, 2, 4), (2, 1, 2, 2)):
        eng = GPTEngine(GPTConfig(
            model_dir=llama_model_dir, dtype="float32", max_tokens=6,
            mesh_shape=mesh_shape,
        ))
        eng.prepare()
        outs[mesh_shape] = [o.token_ids for o in eng.generate_sync(prompts)]
    for shape, toks in outs.items():
        assert toks == outs[None], f"mesh {shape} diverged: {toks}"


def test_engine_pipeline_rejects_unsupported(llama_model_dir):
    eng = GPTEngine(GPTConfig(
        model_dir=llama_model_dir, dtype="float32",
        mesh_shape=(1, 1, 2, 4), quantization="int8",
    ))
    with pytest.raises(ValueError):
        eng.prepare()


def test_generation_config_sampling_defaults(tmp_path):
    """generation_config.json do_sample defaults are adopted when the
    caller set no sampler knobs (and ignored otherwise)."""
    import json
    import os

    d = str(tmp_path / "m")
    build_full_model_dir(d, seed=7)
    with open(os.path.join(d, "generation_config.json"), "w") as f:
        json.dump({"eos_token_id": 50256, "do_sample": True,
                   "temperature": 0.7, "top_p": 0.9}, f)
    eng = GPTEngine(GPTConfig(model_dir=d, dtype="float32", max_tokens=2))
    eng.prepare()
    assert eng.config.sampler.temperature == 0.7
    assert eng.config.sampler.top_p == 0.9

    eng2 = GPTEngine(GPTConfig(
        model_dir=d, dtype="float32", max_tokens=2,
        sampler=SamplerConfig(temperature=0.1),
    ))
    eng2.prepare()
    assert eng2.config.sampler.temperature == 0.1  # explicit wins

    eng3 = GPTEngine(GPTConfig(
        model_dir=d, dtype="float32", max_tokens=2,
        use_generation_defaults=False,
    ))
    eng3.prepare()
    assert eng3.config.sampler == SamplerConfig()


def test_fp8_kv_cache_generates(full_model_dir):
    """fp8 KV storage runs end-to-end (quality is gated separately in
    test_evaluate; here: the engine path executes and emits tokens)."""
    eng = GPTEngine(GPTConfig(
        model_dir=full_model_dir, dtype="float32", max_tokens=4,
        kv_cache_dtype="fp8",
    ))
    eng.prepare()
    out = eng.generate_sync(["Hello world"])[0]
    assert len(out.token_ids) == 4


def test_speculative_sampled_batch1(full_model_dir):
    """Stochastic sampling rides the speculative path too (exact
    rejection sampling against the processed distribution): every token
    must come from the request's top-k support and the stream must
    complete. A one-rank tie margin covers float threshold flips."""
    import numpy as np

    from tests.fixtures import hf_reference_logits

    eng = GPTEngine(GPTConfig(
        model_dir=full_model_dir, dtype="float32", max_tokens=6,
        speculative="ngram", spec_draft_len=3, spec_ngram=2,
        sampler=SamplerConfig(temperature=1.0, top_k=4), seed=5,
    ))
    eng.prepare()
    prompt = "the cat sat on the mat. the cat sat on the"
    out = eng.generate_sync([prompt])[0]
    assert len(out.token_ids) == 6
    ids = eng.ctx.tokenizer.encode(prompt)
    context = list(ids)
    for tok in out.token_ids:
        logits = hf_reference_logits(
            full_model_dir, np.asarray([context]))[0, -1]
        order = np.argsort(logits)[::-1]
        assert tok in set(int(t) for t in order[:5]), (
            tok, [int(t) for t in order[:5]])
        context.append(tok)


def test_speculative_batch_falls_back(full_model_dir):
    """Batch > 1 bypasses speculation (per-row cache truncation differs);
    outputs must match the non-speculative batch exactly."""
    prompts = ["One fish", "Two fish"]
    outs = {}
    for spec in (None, "ngram"):
        eng = GPTEngine(GPTConfig(
            model_dir=full_model_dir, dtype="float32", max_tokens=5,
            speculative=spec,
        ))
        eng.prepare()
        outs[spec] = [o.token_ids for o in eng.generate_sync(prompts)]
    assert outs[None] == outs["ngram"]
