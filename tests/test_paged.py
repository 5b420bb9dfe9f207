"""Paged KV + continuous batching tests: kernel parity with the dense
oracle, allocator behavior, and scheduler output equivalence with the
dense decode path (the reference has neither feature — README TODOs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.fixtures import build_tiny_model_dir
from tinygpt_tpu.engine.kv_cache import create_kv_cache
from tinygpt_tpu.engine.paged_kv import BlockAllocator, blocks_needed
from tinygpt_tpu.engine.scheduler import (
    ContinuousBatcher,
    Request,
    SchedulerConfig,
)
from tinygpt_tpu.hf.config import load_model_config
from tinygpt_tpu.hf.safetensors_io import load_safetensors_dir
from tinygpt_tpu.models import causal_lm, get_model
from tinygpt_tpu.ops.paged_attention import (
    paged_decode_tpu,
    paged_decode_xla,
)
from tinygpt_tpu.ops.sampling import SamplerConfig


def test_block_allocator():
    a = BlockAllocator(8)  # block 0 reserved
    assert a.n_free == 7
    got = a.alloc(3)
    assert len(got) == 3 and 0 not in got
    assert a.alloc(5) is None  # only 4 left
    a.release(got)
    assert a.n_free == 7
    assert blocks_needed(0, 16) == 1
    assert blocks_needed(17, 16) == 2


def test_paged_kernel_vs_xla_oracle():
    rng = np.random.default_rng(0)
    n_blocks, Nk, bs, D, B, MB, G = 16, 2, 16, 64, 3, 4, 2
    Nq = Nk * G
    k_pool = (rng.standard_normal((n_blocks, Nk, bs, D)) * 0.3).astype(np.float32)
    v_pool = (rng.standard_normal((n_blocks, Nk, bs, D)) * 0.3).astype(np.float32)
    k_pool[0] = 0.0
    v_pool[0] = 0.0
    q = (rng.standard_normal((B, Nq, D)) * 0.3).astype(np.float32)
    tables = np.array([[1, 2, 3, 0],
                       [4, 5, 0, 0],
                       [6, 0, 0, 0]], np.int32)
    lengths = np.array([41, 20, 9], np.int32)
    starts = np.array([0, 3, 1], np.int32)
    args = (jnp.asarray(q), jnp.asarray(k_pool), jnp.asarray(v_pool),
            jnp.asarray(tables), jnp.asarray(lengths), jnp.asarray(starts))
    ref = paged_decode_xla(*args, scale=D ** -0.5)
    got = paged_decode_tpu(*args, scale=D ** -0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_paged_frozen_kernel_vs_xla_oracle():
    """paged_decode_frozen_tpu (stacked pools + in-flight merge,
    interpret mode) vs the XLA gather oracle, mid-quantum."""
    from tinygpt_tpu.ops.paged_attention import (
        paged_decode_frozen_tpu,
        paged_decode_frozen_xla,
    )

    rng = np.random.default_rng(3)
    L, n_blocks, Nk, bs, D, B, MB, G, N = 3, 16, 2, 16, 64, 3, 4, 2, 8
    Nq = Nk * G
    kp = (rng.standard_normal((L, n_blocks, Nk, bs, D)) * 0.3).astype(np.float32)
    vp = (rng.standard_normal((L, n_blocks, Nk, bs, D)) * 0.3).astype(np.float32)
    kp[:, 0] = 0.0
    vp[:, 0] = 0.0
    ki = (rng.standard_normal((B, Nk, N, D)) * 0.3).astype(np.float32)
    vi = (rng.standard_normal((B, Nk, N, D)) * 0.3).astype(np.float32)
    q = (rng.standard_normal((B, Nq, D)) * 0.3).astype(np.float32)
    tables = np.array([[1, 2, 3, 0], [4, 5, 0, 0], [6, 0, 0, 0]], np.int32)
    lengths0 = np.array([41, 20, 9], np.int32)
    starts = np.array([0, 3, 1], np.int32)
    step = 2
    for l in range(L):
        args = (jnp.asarray(q), jnp.asarray(kp), jnp.asarray(vp),
                jnp.asarray(tables), jnp.asarray(lengths0),
                jnp.asarray(starts), jnp.asarray(ki), jnp.asarray(vi),
                jnp.asarray(l, jnp.int32), jnp.asarray(step, jnp.int32))
        ref = paged_decode_frozen_xla(
            args[0], jnp.asarray(kp[l]), jnp.asarray(vp[l]), *args[3:8],
            args[9], scale=D ** -0.5)
        got = paged_decode_frozen_tpu(*args, scale=D ** -0.5,
                                      interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"layer {l}")


def test_paged_frozen_kernel_fp8_vs_xla_oracle():
    """The frozen paged kernel on fp8 (e4m3) pools — the raw-byte int8
    load + VPU expand path (attention_kernels._e4m3_expand_f32) — vs the
    XLA gather oracle reading the same fp8 pools through convert."""
    from tinygpt_tpu.ops.paged_attention import (
        paged_decode_frozen_tpu,
        paged_decode_frozen_xla,
    )

    rng = np.random.default_rng(5)
    L, n_blocks, Nk, bs, D, B, MB, G, N = 2, 16, 2, 16, 64, 3, 4, 2, 8
    Nq = Nk * G
    kp = (rng.standard_normal((L, n_blocks, Nk, bs, D)) * 0.3).astype(np.float32)
    vp = (rng.standard_normal((L, n_blocks, Nk, bs, D)) * 0.3).astype(np.float32)
    kp[..., :8] *= 0.01  # exercise the e4m3 subnormal range
    kp[:, 0] = 0.0
    vp[:, 0] = 0.0
    kp8 = jnp.asarray(kp).astype(jnp.float8_e4m3fn)
    vp8 = jnp.asarray(vp).astype(jnp.float8_e4m3fn)
    ki = (rng.standard_normal((B, Nk, N, D)) * 0.3).astype(np.float32)
    vi = (rng.standard_normal((B, Nk, N, D)) * 0.3).astype(np.float32)
    q = (rng.standard_normal((B, Nq, D)) * 0.3).astype(np.float32)
    tables = np.array([[1, 2, 3, 0], [4, 5, 0, 0], [6, 0, 0, 0]], np.int32)
    lengths0 = np.array([41, 20, 9], np.int32)
    starts = np.array([0, 3, 1], np.int32)
    step = 2
    for l in range(L):
        args = (jnp.asarray(q), kp8, vp8,
                jnp.asarray(tables), jnp.asarray(lengths0),
                jnp.asarray(starts), jnp.asarray(ki), jnp.asarray(vi),
                jnp.asarray(l, jnp.int32), jnp.asarray(step, jnp.int32))
        ref = paged_decode_frozen_xla(
            args[0], kp8[l], vp8[l], *args[3:8],
            args[9], scale=D ** -0.5)
        got = paged_decode_frozen_tpu(*args, scale=D ** -0.5,
                                      interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"layer {l}")


def test_paged_spec_kernel_vs_xla_oracle():
    """paged_decode_spec_tpu (S verify queries, prior-valid + own-round
    causal in-flight masks, interpret mode) vs the XLA gather oracle."""
    from tinygpt_tpu.ops.paged_attention import (
        paged_decode_spec_tpu,
        paged_decode_spec_xla,
    )

    rng = np.random.default_rng(7)
    L, n_blocks, Nk, bs, D, B, MB, G, S, N = 2, 16, 2, 16, 64, 3, 4, 2, 3, 9
    Nq = Nk * G
    kp = (rng.standard_normal((L, n_blocks, Nk, bs, D)) * 0.3).astype(np.float32)
    vp = (rng.standard_normal((L, n_blocks, Nk, bs, D)) * 0.3).astype(np.float32)
    kp[:, 0] = 0.0
    vp[:, 0] = 0.0
    ki = (rng.standard_normal((B, Nk, N, D)) * 0.3).astype(np.float32)
    vi = (rng.standard_normal((B, Nk, N, D)) * 0.3).astype(np.float32)
    q = (rng.standard_normal((B, S, Nq, D)) * 0.3).astype(np.float32)
    tables = np.array([[1, 2, 3, 0], [4, 5, 0, 0], [6, 0, 0, 0]], np.int32)
    lengths0 = np.array([41, 20, 9], np.int32)
    starts = np.array([0, 3, 1], np.int32)
    # round 1 of S-slot rounds: prior accepted slots vary per row
    valid = np.zeros((B, N), bool)
    valid[0, :2] = True
    valid[1, :3] = True
    base = S  # own-round slots [S, 2S)
    for l in range(L):
        args = (jnp.asarray(q), jnp.asarray(kp), jnp.asarray(vp),
                jnp.asarray(tables), jnp.asarray(lengths0),
                jnp.asarray(starts), jnp.asarray(ki), jnp.asarray(vi),
                jnp.asarray(valid), jnp.asarray(l, jnp.int32),
                jnp.asarray(base, jnp.int32))
        ref = paged_decode_spec_xla(
            args[0], jnp.asarray(kp[l]), jnp.asarray(vp[l]), *args[3:9],
            args[10], scale=D ** -0.5)
        got = paged_decode_spec_tpu(*args, scale=D ** -0.5, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"layer {l}")


def test_paged_kernel_sliding_window():
    rng = np.random.default_rng(1)
    n_blocks, Nk, bs, D, B, MB = 8, 1, 16, 64, 1, 3
    k_pool = (rng.standard_normal((n_blocks, Nk, bs, D)) * 0.3).astype(np.float32)
    v_pool = (rng.standard_normal((n_blocks, Nk, bs, D)) * 0.3).astype(np.float32)
    q = (rng.standard_normal((B, Nk, D)) * 0.3).astype(np.float32)
    tables = np.array([[1, 2, 3]], np.int32)
    lengths = np.array([40], np.int32)
    starts = np.array([0], np.int32)
    args = (jnp.asarray(q), jnp.asarray(k_pool), jnp.asarray(v_pool),
            jnp.asarray(tables), jnp.asarray(lengths), jnp.asarray(starts))
    for w in (8, 24):
        ref = paged_decode_xla(*args, scale=D ** -0.5, sliding_window=w)
        got = paged_decode_tpu(*args, scale=D ** -0.5, sliding_window=w,
                               interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


@pytest.fixture(scope="module")
def llama(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_llama_paged")
    build_tiny_model_dir("llama", str(d), seed=21)
    cfg = load_model_config(str(d))
    model = get_model(cfg.model_type)
    params = model.load_params(cfg, load_safetensors_dir(str(d)),
                               dtype=jnp.float32)
    return cfg, model, params


@pytest.fixture(scope="module")
def mixtral(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_mixtral_paged")
    build_tiny_model_dir("mixtral", str(d), seed=23)
    cfg = load_model_config(str(d))
    model = get_model(cfg.model_type)
    params = model.load_params(cfg, load_safetensors_dir(str(d)),
                               dtype=jnp.float32)
    return cfg, model, params


def _dense_greedy(cfg, model, params, prompt_ids, n_new):
    """Oracle: dense-cache greedy decode."""
    S = len(prompt_ids)
    cache = create_kv_cache(cfg, 1, 128, dtype=jnp.float32)
    ids = jnp.asarray([prompt_ids], jnp.int32)
    pos = jnp.arange(S)[None, :]
    logits, cache = model.forward(params, cfg, ids, cache, pos,
                                  jnp.ones((1, S), jnp.bool_),
                                  last_only=True)
    out = []
    tok = int(jnp.argmax(logits[0, -1]))
    for t in range(n_new):
        out.append(tok)
        logits, cache = model.forward(
            params, cfg, jnp.asarray([[tok]], jnp.int32), cache,
            jnp.asarray([[S + t]]), jnp.ones((1, 1), jnp.bool_),
            last_only=True,
        )
        tok = int(jnp.argmax(logits[0, -1]))
    return out


def _dense_logits(cfg, model, params, token_ids):
    """Teacher-forced dense logits for the NEXT token after token_ids."""
    S = len(token_ids)
    cache = create_kv_cache(cfg, 1, 128, dtype=jnp.float32)
    logits, _ = model.forward(
        params, cfg, jnp.asarray([token_ids], jnp.int32), cache,
        jnp.arange(S)[None, :], jnp.ones((1, S), jnp.bool_), last_only=True,
    )
    return np.asarray(logits[0, -1])


@pytest.fixture(scope="module")
def gpt2(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_gpt2_paged")
    build_tiny_model_dir("gpt2", str(d), seed=22)
    cfg = load_model_config(str(d))
    model = get_model(cfg.model_type)
    params = model.load_params(cfg, load_safetensors_dir(str(d)),
                               dtype=jnp.float32)
    return cfg, model, params


@pytest.mark.parametrize("family", ["llama", "gpt2", "mixtral"])
def test_scheduler_matches_dense_greedy(family, request):
    """Every token the batched/paged path emits must be the dense model's
    greedy choice under teacher forcing (ties within float-reduction noise
    are accepted — XLA CPU reduction order is thread-timing dependent on
    near-tie logits of a tiny random model). Parametrized over llama AND
    gpt2: the reference serves GPT-2 through the same uniform engine
    (/root/reference/src/huggingface/ModelLoader.cpp:50-68), so gpt2 must
    ride the same frozen-quantum continuous-batching architecture here —
    and over mixtral, whose MoE MLP rides the same frozen quanta."""
    cfg, model, params = request.getfixturevalue(family)
    # both families must take the FAST path (frozen-pool quanta)
    assert hasattr(model, "decode_paged_steps")
    rng = np.random.default_rng(3)
    prompts = [list(rng.integers(2, cfg.vocab_size, n)) for n in (5, 9, 3)]
    n_new = 6

    batcher = ContinuousBatcher(
        model, cfg, params, eos_ids=set(),
        config=SchedulerConfig(
            batch_capacity=4, block_size=16, n_blocks=64,
            max_blocks_per_seq=8, prefill_bucket=16, dtype="float32",
        ),
    )
    for i, p in enumerate(prompts):
        batcher.add_request(Request(
            request_id=i, prompt_ids=[int(x) for x in p],
            max_new_tokens=n_new,
        ))
    got = {i: [] for i in range(len(prompts))}
    steps = 0
    while batcher.has_work and steps < 100:
        for ev in batcher.step():
            if ev.token_id is not None:
                got[ev.request_id].append(ev.token_id)
        steps += 1

    for i, p in enumerate(prompts):
        assert len(got[i]) == n_new
        context = [int(x) for x in p]
        for step_idx, tok in enumerate(got[i]):
            logits = _dense_logits(cfg, model, params, context)
            best = int(logits.argmax())
            assert tok == best or (
                logits[best] - logits[tok] < 1e-3
            ), (f"request {i} step {step_idx}: got {tok} "
                f"(logit {logits[tok]:.6f}) vs dense argmax {best} "
                f"(logit {logits[best]:.6f})")
            context.append(tok)


def test_scheduler_matches_dense_greedy_sliding_window(llama):
    """The frozen-pool decode quantum must honor sliding windows: a
    windowed config's scheduler stream must match dense greedy decode
    with the same window (prompts long enough that the window binds)."""
    import dataclasses

    cfg, model, params = llama
    cfg_w = dataclasses.replace(cfg, sliding_window=8)
    rng = np.random.default_rng(31)
    prompts = [list(int(x) for x in rng.integers(2, cfg.vocab_size, n))
               for n in (14, 21)]
    n_new = 6

    batcher = ContinuousBatcher(
        model, cfg_w, params, eos_ids=set(),
        config=SchedulerConfig(
            batch_capacity=2, block_size=16, n_blocks=64,
            max_blocks_per_seq=8, prefill_bucket=16, dtype="float32",
        ),
    )
    for i, p in enumerate(prompts):
        batcher.add_request(Request(request_id=i, prompt_ids=p,
                                    max_new_tokens=n_new))
    got = {i: [] for i in range(len(prompts))}
    _drain(batcher, got)
    for i, p in enumerate(prompts):
        assert len(got[i]) == n_new
        context = list(p)
        for step_idx, tok in enumerate(got[i]):
            logits = _dense_logits(cfg_w, model, params, context)
            best = int(logits.argmax())
            assert tok == best or logits[best] - logits[tok] < 1e-3, (
                f"request {i} step {step_idx}: {tok} vs {best}"
            )
            context.append(tok)


def test_scheduler_pipelined_matches_unpipelined(llama):
    """Quantum pipelining (issue k+1 before syncing k) only changes
    latency: the token streams must equal the unpipelined scheduler's,
    including under EOS finishes and mixed-length prompts."""
    cfg, model, params = llama
    rng = np.random.default_rng(47)
    prompts = [list(int(x) for x in rng.integers(2, cfg.vocab_size, n))
               for n in (5, 12, 3)]

    def run(pipeline):
        batcher = ContinuousBatcher(
            model, cfg, params, eos_ids={7},
            config=SchedulerConfig(
                batch_capacity=2, block_size=16, n_blocks=64,
                max_blocks_per_seq=8, prefill_bucket=16, dtype="float32",
                decode_quantum=3, pipeline_quanta=pipeline,
            ),
        )
        for i, p in enumerate(prompts):
            batcher.add_request(Request(request_id=i, prompt_ids=p,
                                        max_new_tokens=7))
        got = {}
        _drain(batcher, got)
        return got

    assert run(True) == run(False)


def test_scheduler_speculative_matches_dense_greedy(llama):
    """The speculative decode quantum (n-gram draft + verify in the
    scheduler) must emit exactly the dense model's greedy choices —
    speculative verification is exact for greedy; only near-tie
    reduction-order flips between the differently-compiled programs are
    tolerated. Prompts repeat a phrase so drafts actually get accepted."""
    cfg, model, params = llama
    rng = np.random.default_rng(41)
    phrase = [int(x) for x in rng.integers(2, cfg.vocab_size, 6)]
    prompts = [
        phrase * 3 + [int(x) for x in rng.integers(2, cfg.vocab_size, 2)],
        [int(x) for x in rng.integers(2, cfg.vocab_size, 9)],
    ]
    n_new = 8

    def run(spec):
        batcher = ContinuousBatcher(
            model, cfg, params, eos_ids=set(),
            config=SchedulerConfig(
                batch_capacity=2, block_size=16, n_blocks=64,
                max_blocks_per_seq=8, prefill_bucket=16, dtype="float32",
                decode_quantum=8, speculative=spec, spec_draft_len=3,
                spec_ngram=2,
            ),
        )
        for i, p in enumerate(prompts):
            batcher.add_request(Request(request_id=i, prompt_ids=p,
                                        max_new_tokens=n_new))
        got = {i: [] for i in range(len(prompts))}
        _drain(batcher, got)
        return got

    got = run("ngram")
    for i, p in enumerate(prompts):
        assert len(got[i]) == n_new, got
        context = list(p)
        for step_idx, tok in enumerate(got[i]):
            logits = _dense_logits(cfg, model, params, context)
            best = int(logits.argmax())
            assert tok == best or logits[best] - logits[tok] < 1e-3, (
                f"request {i} step {step_idx}: {tok} vs dense argmax {best}"
            )
            context.append(tok)
    # a sampling request must force the fallback quantum (no crash,
    # tokens still produced)
    batcher = ContinuousBatcher(
        model, cfg, params, eos_ids=set(),
        config=SchedulerConfig(
            batch_capacity=2, block_size=16, n_blocks=64,
            max_blocks_per_seq=8, prefill_bucket=16, dtype="float32",
            speculative="ngram",
        ),
    )
    batcher.add_request(Request(
        request_id=0, prompt_ids=prompts[0], max_new_tokens=4,
        sampler=SamplerConfig(temperature=0.8, top_k=5),
    ))
    got2 = {}
    _drain(batcher, got2)
    assert len(got2[0]) == 4


def test_scheduler_speculative_sliding_window(llama):
    """Speculative quanta on a sliding-window config must match dense
    greedy decode with the same window. The window (8) binds well within
    the prompt+generation length, and repeated phrases make drafts
    accept — exercising the slot-space window masks for frozen, prior-
    accepted in-flight, and own-round verify positions."""
    import dataclasses

    cfg, model, params = llama
    cfg_w = dataclasses.replace(cfg, sliding_window=8)
    rng = np.random.default_rng(53)
    phrase = [int(x) for x in rng.integers(2, cfg.vocab_size, 5)]
    prompts = [
        phrase * 4,  # window shorter than the repetition period
        [int(x) for x in rng.integers(2, cfg.vocab_size, 13)],
    ]
    n_new = 8

    batcher = ContinuousBatcher(
        model, cfg_w, params, eos_ids=set(),
        config=SchedulerConfig(
            batch_capacity=2, block_size=16, n_blocks=64,
            max_blocks_per_seq=8, prefill_bucket=16, dtype="float32",
            decode_quantum=8, speculative="ngram", spec_draft_len=3,
            spec_ngram=2,
        ),
    )
    assert batcher._spec_fn is not None  # the window gate is gone
    for i, p in enumerate(prompts):
        batcher.add_request(Request(request_id=i, prompt_ids=p,
                                    max_new_tokens=n_new))
    got = {i: [] for i in range(len(prompts))}
    _drain(batcher, got)
    for i, p in enumerate(prompts):
        assert len(got[i]) == n_new, got
        context = list(p)
        for step_idx, tok in enumerate(got[i]):
            logits = _dense_logits(cfg_w, model, params, context)
            best = int(logits.argmax())
            assert tok == best or logits[best] - logits[tok] < 1e-3, (
                f"request {i} step {step_idx}: {tok} vs dense argmax {best}"
            )
            context.append(tok)


def test_scheduler_eos_and_capacity(llama):
    cfg, model, params = llama
    rng = np.random.default_rng(4)
    batcher = ContinuousBatcher(
        model, cfg, params, eos_ids=set(),
        config=SchedulerConfig(
            batch_capacity=2, block_size=16, n_blocks=32,
            max_blocks_per_seq=4, prefill_bucket=16, dtype="float32",
        ),
    )
    # more requests than rows: they queue and all finish
    for i in range(4):
        batcher.add_request(Request(
            request_id=i,
            prompt_ids=[int(x) for x in rng.integers(2, cfg.vocab_size, 4)],
            max_new_tokens=3,
        ))
    finished = set()
    steps = 0
    while batcher.has_work and steps < 200:
        for ev in batcher.step():
            assert batcher.n_running <= 2
            if ev.finished:
                finished.add(ev.request_id)
        steps += 1
    assert finished == {0, 1, 2, 3}
    # all blocks returned
    assert batcher.allocator.n_free == 31


def test_scheduler_stop_token(llama):
    """EOS machinery: run once without stop ids to learn the paged path's
    own greedy stream, then stop on its 3rd token. (Pinning the stop token
    from the dense stream is flaky: dense and paged reductions may argmax
    differently on near-tie logits of a tiny random model.)"""
    cfg, model, params = llama
    rng = np.random.default_rng(5)
    prompt = [int(x) for x in rng.integers(2, cfg.vocab_size, 5)]

    def run(eos_ids):
        batcher = ContinuousBatcher(
            model, cfg, params, eos_ids=eos_ids,
            config=SchedulerConfig(
                batch_capacity=2, block_size=16, n_blocks=32,
                max_blocks_per_seq=4, prefill_bucket=16, dtype="float32",
            ),
        )
        batcher.add_request(Request(request_id=0, prompt_ids=prompt,
                                    max_new_tokens=6))
        toks, reason, steps = [], None, 0
        while batcher.has_work and steps < 50:
            for ev in batcher.step():
                if ev.token_id is not None:
                    toks.append(ev.token_id)
                if ev.finished:
                    reason = ev.finish_reason
            steps += 1
        return toks, reason

    free_run, free_reason = run(set())
    assert free_reason == "length" and len(free_run) == 6
    stop_tok = free_run[2]
    toks, reason = run({stop_tok})
    assert reason == "stop"
    assert toks == free_run[: free_run.index(stop_tok)]


def test_scheduler_quantum_invariance(llama):
    """decode_quantum only changes dispatch granularity: the q=1 and q=4
    token streams must agree except where a greedy near-tie legitimately
    flips between the two differently-compiled programs (CPU reduction
    order) — at the first mismatch both tokens must be within float noise
    of the dense argmax, after which divergence is expected."""
    cfg, model, params = llama
    rng = np.random.default_rng(11)
    prompts = [list(int(x) for x in rng.integers(2, cfg.vocab_size, n))
               for n in (4, 7)]

    def run(q):
        batcher = ContinuousBatcher(
            model, cfg, params, eos_ids=set(),
            config=SchedulerConfig(
                batch_capacity=2, block_size=16, n_blocks=64,
                max_blocks_per_seq=8, prefill_bucket=16, dtype="float32",
                decode_quantum=q,
            ),
        )
        for i, p in enumerate(prompts):
            batcher.add_request(Request(request_id=i, prompt_ids=p,
                                        max_new_tokens=6))
        got = {i: [] for i in range(len(prompts))}
        steps = 0
        while batcher.has_work and steps < 60:
            for ev in batcher.step():
                if ev.token_id is not None:
                    got[ev.request_id].append(ev.token_id)
            steps += 1
        return got

    r1, r4 = run(1), run(4)
    for rid in r1:
        a, b = r1[rid], r4[rid]
        if a == b:
            continue
        i = next(j for j in range(min(len(a), len(b))) if a[j] != b[j])
        context = prompts[rid] + a[:i]
        logits = _dense_logits(cfg, model, params, context)
        top = float(logits.max())
        assert top - logits[a[i]] < 1e-3 and top - logits[b[i]] < 1e-3, (
            f"request {rid} diverges at {i} without a near-tie: "
            f"{a[i]} vs {b[i]}"
        )


def test_scheduler_tp_sharded_matches_single(llama):
    """Continuous batching on a tp mesh (virtual 8-device CPU) must match
    the single-device scheduler's greedy streams, modulo legitimate
    near-tie flips between the differently-compiled programs (same
    tolerance as test_scheduler_quantum_invariance)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    cfg, model, params = llama
    rng = np.random.default_rng(29)
    prompts = [list(int(x) for x in rng.integers(2, cfg.vocab_size, n))
               for n in (4, 9, 18)]

    def run(mesh_shape):
        batcher = ContinuousBatcher(
            model, cfg, params, eos_ids=set(),
            config=SchedulerConfig(
                batch_capacity=3, block_size=16, n_blocks=64,
                max_blocks_per_seq=8, prefill_bucket=16, dtype="float32",
                mesh_shape=mesh_shape,
            ),
        )
        for i, p in enumerate(prompts):
            batcher.add_request(Request(request_id=i, prompt_ids=p,
                                        max_new_tokens=6))
        got = {i: [] for i in range(len(prompts))}
        _drain(batcher, got)
        return got

    single = run(None)
    sharded = run((1, 1, 4))
    for rid in single:
        a, b = single[rid], sharded[rid]
        assert len(a) == len(b) == 6
        if a == b:
            continue
        i = next(j for j in range(len(a)) if a[j] != b[j])
        context = prompts[rid] + a[:i]
        logits = _dense_logits(cfg, model, params, context)
        top = float(logits.max())
        assert top - logits[a[i]] < 1e-3 and top - logits[b[i]] < 1e-3, (
            f"request {rid} diverges at {i} without a near-tie: "
            f"{a[i]} vs {b[i]}"
        )


def test_scheduler_sp_tp_sharded_matches_single(llama):
    """Sequence-parallel admission: an sp2 x tp2 mesh shards the prefill
    sequence dim under GSPMD (decode quanta and pools stay
    sp-replicated); greedy streams must match the single-device
    scheduler, modulo near-tie flips. Long prompts + chunked prefill so
    the sp sharding actually spans chunks."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    cfg, model, params = llama
    rng = np.random.default_rng(61)
    prompts = [list(int(x) for x in rng.integers(2, cfg.vocab_size, n))
               for n in (35, 9, 50)]

    def run(mesh_shape, chunk=0):
        batcher = ContinuousBatcher(
            model, cfg, params, eos_ids=set(),
            config=SchedulerConfig(
                batch_capacity=3, block_size=16, n_blocks=64,
                max_blocks_per_seq=8, prefill_bucket=16, dtype="float32",
                mesh_shape=mesh_shape, prefill_chunk_tokens=chunk,
            ),
        )
        for i, p in enumerate(prompts):
            batcher.add_request(Request(request_id=i, prompt_ids=p,
                                        max_new_tokens=5))
        got = {i: [] for i in range(len(prompts))}
        _drain(batcher, got)
        return got

    def check(a_map, b_map):
        for rid in a_map:
            a, b = a_map[rid], b_map[rid]
            assert len(a) == len(b) == 5
            if a == b:
                continue
            i = next(j for j in range(len(a)) if a[j] != b[j])
            context = prompts[rid] + a[:i]
            logits = _dense_logits(cfg, model, params, context)
            top = float(logits.max())
            assert top - logits[a[i]] < 1e-3 and top - logits[b[i]] < 1e-3

    single = run(None)
    check(single, run((1, 2, 2)))
    check(single, run((1, 2, 2), chunk=16))  # sp x chunked prefill


def test_scheduler_dp_tp_sharded_matches_single(llama):
    """Row-parallel continuous batching: a dp2 x tp2 mesh (rows, pools
    and allocators partitioned over dp via shard_map; tp automatic) must
    match the single-device scheduler's greedy streams, modulo near-tie
    flips between the differently-compiled programs. More requests than
    capacity, so rows recycle across dp shards."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    cfg, model, params = llama
    rng = np.random.default_rng(37)
    prompts = [list(int(x) for x in rng.integers(2, cfg.vocab_size, n))
               for n in (4, 9, 18, 6, 21, 3)]

    def run(mesh_shape, chunk=0):
        batcher = ContinuousBatcher(
            model, cfg, params, eos_ids=set(),
            config=SchedulerConfig(
                batch_capacity=4, block_size=16, n_blocks=64,
                max_blocks_per_seq=8, prefill_bucket=16, dtype="float32",
                mesh_shape=mesh_shape, prefill_chunk_tokens=chunk,
            ),
        )
        for i, p in enumerate(prompts):
            batcher.add_request(Request(request_id=i, prompt_ids=p,
                                        max_new_tokens=6))
        got = {i: [] for i in range(len(prompts))}
        _drain(batcher, got)
        return got

    single = run(None)
    for sharded in (run((2, 1, 2)), run((2, 1, 2), chunk=16)):
        for rid in single:
            a, b = single[rid], sharded[rid]
            assert len(a) == len(b) == 6
            if a == b:
                continue
            i = next(j for j in range(len(a)) if a[j] != b[j])
            context = prompts[rid] + a[:i]
            logits = _dense_logits(cfg, model, params, context)
            top = float(logits.max())
            assert (top - logits[a[i]] < 1e-3
                    and top - logits[b[i]] < 1e-3), (
                f"request {rid} diverges at {i} without a near-tie: "
                f"{a[i]} vs {b[i]}"
            )


def test_scheduler_moe_sp_tp_sharded_matches_single(mixtral):
    """MoE serving on an sp2 x tp2 mesh: experts shard over sp (EP), so
    the scheduler must pick the dense admission formulation (routed
    ragged groups would all-gather the expert stacks under GSPMD) and
    still match the single-device greedy streams."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    cfg, model, params = mixtral
    rng = np.random.default_rng(83)
    prompts = [list(int(x) for x in rng.integers(2, cfg.vocab_size, n))
               for n in (34, 9, 21)]

    def run(mesh_shape):
        batcher = ContinuousBatcher(
            model, cfg, params, eos_ids=set(),
            config=SchedulerConfig(
                batch_capacity=3, block_size=16, n_blocks=64,
                max_blocks_per_seq=8, prefill_bucket=16, dtype="float32",
                mesh_shape=mesh_shape,
            ),
        )
        if mesh_shape is not None:
            assert batcher._moe_impl == "dense"
        for i, p in enumerate(prompts):
            batcher.add_request(Request(request_id=i, prompt_ids=p,
                                        max_new_tokens=5))
        got = {i: [] for i in range(len(prompts))}
        _drain(batcher, got)
        return got

    single = run(None)
    sharded = run((1, 2, 2))
    for rid in single:
        a, b = single[rid], sharded[rid]
        assert len(a) == len(b) == 5
        if a == b:
            continue
        i = next(j for j in range(len(a)) if a[j] != b[j])
        context = prompts[rid] + a[:i]
        logits = _dense_logits(cfg, model, params, context)
        top = float(logits.max())
        assert top - logits[a[i]] < 1e-3 and top - logits[b[i]] < 1e-3, (
            f"request {rid} diverges at {i} without a near-tie: "
            f"{a[i]} vs {b[i]}"
        )


def test_scheduler_dp_sp_tp_sharded_matches_single(llama):
    """Full 3-axis serving mesh: dp2 x sp2 x tp2 on the virtual 8-device
    mesh — rows/pools partition over dp (shard_map manual), the admission
    prefill's sequence dim shards over sp and params over tp (both GSPMD-
    automatic INSIDE the dp-manual region). Greedy streams must match the
    single-device scheduler, modulo near-tie flips. Long prompts + a
    chunked-prefill leg so the sp sharding spans chunks."""
    if len(jax.devices()) < 8:
        pytest.skip("needs >= 8 virtual devices")
    cfg, model, params = llama
    rng = np.random.default_rng(73)
    prompts = [list(int(x) for x in rng.integers(2, cfg.vocab_size, n))
               for n in (35, 9, 50, 18)]

    def run(mesh_shape, chunk=0):
        batcher = ContinuousBatcher(
            model, cfg, params, eos_ids=set(),
            config=SchedulerConfig(
                batch_capacity=4, block_size=16, n_blocks=64,
                max_blocks_per_seq=8, prefill_bucket=16, dtype="float32",
                mesh_shape=mesh_shape, prefill_chunk_tokens=chunk,
            ),
        )
        for i, p in enumerate(prompts):
            batcher.add_request(Request(request_id=i, prompt_ids=p,
                                        max_new_tokens=5))
        got = {i: [] for i in range(len(prompts))}
        _drain(batcher, got)
        return got

    single = run(None)
    for sharded in (run((2, 2, 2)), run((2, 2, 2), chunk=16)):
        for rid in single:
            a, b = single[rid], sharded[rid]
            assert len(a) == len(b) == 5
            if a == b:
                continue
            i = next(j for j in range(len(a)) if a[j] != b[j])
            context = prompts[rid] + a[:i]
            logits = _dense_logits(cfg, model, params, context)
            top = float(logits.max())
            assert (top - logits[a[i]] < 1e-3
                    and top - logits[b[i]] < 1e-3), (
                f"request {rid} diverges at {i} without a near-tie: "
                f"{a[i]} vs {b[i]}"
            )


def test_scheduler_dp_speculative_matches_dense_greedy(llama):
    """Speculative quanta under row-parallel serving: a dp2 x tp2 mesh
    (rows, draft contexts and pools sharded over dp) must emit exactly
    the dense model's greedy choices, modulo near-tie flips. Repetitive
    prompts make drafts accept on both shards."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    cfg, model, params = llama
    rng = np.random.default_rng(67)
    phrase = [int(x) for x in rng.integers(2, cfg.vocab_size, 5)]
    prompts = [
        phrase * 3,
        [int(x) for x in rng.integers(2, cfg.vocab_size, 8)],
        phrase * 2 + [int(x) for x in rng.integers(2, cfg.vocab_size, 3)],
        [int(x) for x in rng.integers(2, cfg.vocab_size, 12)],
    ]
    n_new = 7

    batcher = ContinuousBatcher(
        model, cfg, params, eos_ids=set(),
        config=SchedulerConfig(
            batch_capacity=4, block_size=16, n_blocks=64,
            max_blocks_per_seq=8, prefill_bucket=16, dtype="float32",
            decode_quantum=8, speculative="ngram", spec_draft_len=3,
            spec_ngram=2, mesh_shape=(2, 1, 2),
        ),
    )
    assert batcher._spec_fn is not None
    for i, p in enumerate(prompts):
        batcher.add_request(Request(request_id=i, prompt_ids=p,
                                    max_new_tokens=n_new))
    got = {i: [] for i in range(len(prompts))}
    _drain(batcher, got)
    for i, p in enumerate(prompts):
        assert len(got[i]) == n_new, got
        context = list(p)
        for step_idx, tok in enumerate(got[i]):
            logits = _dense_logits(cfg, model, params, context)
            best = int(logits.argmax())
            assert tok == best or logits[best] - logits[tok] < 1e-3, (
                f"request {i} step {step_idx}: {tok} vs dense argmax {best}"
            )
            context.append(tok)


def test_scheduler_dp_prefix_cache_shard_local(llama):
    """Prefix caching under dp: shared prefixes reuse blocks only within
    a shard; streams must still match the no-cache run exactly."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 virtual devices")
    cfg, model, params = llama
    rng = np.random.default_rng(41)
    system = [int(x) for x in rng.integers(2, cfg.vocab_size, 32)]
    prompts = [system + [int(x) for x in rng.integers(2, cfg.vocab_size, n)]
               for n in (5, 9, 7, 11)]

    def run(cache_on):
        batcher = ContinuousBatcher(
            model, cfg, params, eos_ids=set(),
            config=SchedulerConfig(
                batch_capacity=4, block_size=16, n_blocks=64,
                max_blocks_per_seq=8, prefill_bucket=16, dtype="float32",
                mesh_shape=(2, 1, 1), enable_prefix_cache=cache_on,
            ),
        )
        for i, p in enumerate(prompts):
            batcher.add_request(Request(request_id=i, prompt_ids=p,
                                        max_new_tokens=5))
        got = {i: [] for i in range(len(prompts))}
        _drain(batcher, got)
        return got

    a, b = run(True), run(False)
    assert a == b


def _drain(batcher, got=None):
    steps = 0
    while batcher.has_work and steps < 200:
        for ev in batcher.step():
            if got is not None and ev.token_id is not None:
                got.setdefault(ev.request_id, []).append(ev.token_id)
        steps += 1


def test_prefix_cache_reuse_and_correctness(llama):
    """Requests sharing a long system prefix must (a) produce the same
    tokens as with caching disabled and (b) actually reuse blocks."""
    cfg, model, params = llama
    params = dict(params)
    params["final_ln"] = params["final_ln"] * 4.0
    rng = np.random.default_rng(13)
    system = [int(x) for x in rng.integers(2, cfg.vocab_size, 40)]
    prompts = [system + [int(x) for x in rng.integers(2, cfg.vocab_size, n)]
               for n in (5, 9)]

    def run(enable):
        batcher = ContinuousBatcher(
            model, cfg, params, eos_ids=set(),
            config=SchedulerConfig(
                batch_capacity=2, block_size=16, n_blocks=64,
                max_blocks_per_seq=8, prefill_bucket=16, dtype="float32",
                enable_prefix_cache=enable,
            ),
        )
        for i, p in enumerate(prompts):
            batcher.add_request(Request(request_id=i, prompt_ids=p,
                                        max_new_tokens=5))
        got = {}
        _drain(batcher, got)
        return got, batcher

    got_off, _ = run(False)
    got_on, b = run(True)
    assert got_on == got_off
    # 40-token system prefix = 2 whole blocks of 16 shared by request 1;
    # idle-cached blocks survive release and the pool accounting balances
    assert b.allocator.n_idle_cached > 0
    assert b.allocator.n_free == 63  # everything free or reclaimable


def test_prefix_cache_persists_across_requests(llama):
    """A prefix stays reusable after its original request finished."""
    cfg, model, params = llama
    rng = np.random.default_rng(17)
    system = [int(x) for x in rng.integers(2, cfg.vocab_size, 32)]
    batcher = ContinuousBatcher(
        model, cfg, params, eos_ids=set(),
        config=SchedulerConfig(
            batch_capacity=1, block_size=16, n_blocks=32,
            max_blocks_per_seq=8, prefill_bucket=16, dtype="float32",
        ),
    )
    batcher.add_request(Request(request_id=0, prompt_ids=system + [7, 8],
                                max_new_tokens=3))
    _drain(batcher)
    n_cached = batcher.allocator.n_idle_cached
    assert n_cached > 0, "prefix blocks should be idle-cached after release"

    batcher.add_request(Request(request_id=1, prompt_ids=system + [9],
                                max_new_tokens=3))
    got = {}
    _drain(batcher, got)
    assert len(got[1]) == 3
    # the revived blocks were reused (still registered, back to idle)
    assert batcher.allocator.n_idle_cached >= n_cached


def test_prefix_cache_eviction_under_pressure(llama):
    """Idle cached blocks are reclaimed when the pool runs dry instead of
    failing admission."""
    cfg, model, params = llama
    rng = np.random.default_rng(19)
    batcher = ContinuousBatcher(
        model, cfg, params, eos_ids=set(),
        config=SchedulerConfig(
            batch_capacity=1, block_size=16, n_blocks=8,  # tiny pool
            max_blocks_per_seq=6, prefill_bucket=16, dtype="float32",
        ),
    )
    for i in range(3):  # distinct long prompts fill + recycle the pool
        p = [int(x) for x in rng.integers(2, cfg.vocab_size, 40)]
        batcher.add_request(Request(request_id=i, prompt_ids=p,
                                    max_new_tokens=2))
        got = {}
        _drain(batcher, got)
        assert len(got[i]) == 2, f"request {i} starved"
    # pool accounting balances after heavy recycling
    assert batcher.allocator.n_free == 7


def test_prefix_reuse_under_pool_pressure_no_aliasing(llama):
    """Regression: admission must PIN looked-up prefix blocks before
    alloc(). alloc's LRU reclaim could otherwise evict the just-found
    idle-cached prefix blocks and hand them back as the same request's
    private suffix blocks — one physical block twice in the block table,
    silently corrupting output."""
    cfg, model, params = llama
    rng = np.random.default_rng(23)
    prefix_a = [int(x) for x in rng.integers(2, cfg.vocab_size, 32)]
    prefix_b = [int(x) for x in rng.integers(2, cfg.vocab_size, 32)]
    tail = [int(x) for x in rng.integers(2, cfg.vocab_size, 8)]
    long_suffix = [int(x) for x in rng.integers(2, cfg.vocab_size, 62)]

    def make(enable):
        return ContinuousBatcher(
            model, cfg, params, eos_ids=set(),
            config=SchedulerConfig(
                batch_capacity=1, block_size=16, n_blocks=8,
                max_blocks_per_seq=8, prefill_bucket=16, dtype="float32",
                enable_prefix_cache=enable,
            ),
        )

    def run(batcher):
        got = {}
        # reqs 0/1 seed the idle-cached tier: A-blocks get OLDER LRU
        # ticks than B-blocks, so reclaim under pressure targets A first
        for i, p in enumerate([prefix_a + tail, prefix_b + tail]):
            batcher.add_request(Request(request_id=i, prompt_ids=p,
                                        max_new_tokens=2))
            _drain(batcher, got)
        # req 2 reuses prefix A while alloc needs an LRU reclaim
        batcher.add_request(Request(request_id=2,
                                    prompt_ids=prefix_a + long_suffix,
                                    max_new_tokens=2))
        for ev in batcher.step():  # admission step
            if ev.token_id is not None:
                got.setdefault(ev.request_id, []).append(ev.token_id)
        if batcher.running:
            (req2,) = batcher.running.values()
            assert len(set(req2.blocks)) == len(req2.blocks), (
                f"physical block aliased in block table: {req2.blocks}"
            )
        _drain(batcher, got)
        return got

    got_on = run(make(True))
    got_off = run(make(False))
    assert got_on == got_off


def test_pool_index_native_python_parity():
    """The C++ pool (csrc/kvpool.cpp) must match the Python reference
    block-for-block across a randomized alloc/share/release/prefix
    workload (same LIFO/LRU orders)."""
    from tinygpt_tpu.engine import native_pool

    lib = native_pool._load()
    if lib is None:
        pytest.skip("native pool unavailable")
    na = native_pool.NativePoolIndex(32, lib)
    py = native_pool.PythonPoolIndex(32)

    rng = np.random.default_rng(0)
    live = []  # (blocks, registered_hashes)
    for step in range(300):
        op = rng.integers(0, 4)
        if op == 0:  # alloc 1-4
            n = int(rng.integers(1, 5))
            a, b = na.alloc(n), py.alloc(n)
            assert a == b, f"step {step}: alloc {a} != {b}"
            if a is not None:
                live.append(list(a))
        elif op == 1 and live:  # register prefixes on a live alloc
            blocks = live[int(rng.integers(0, len(live)))]
            for blk in blocks[: int(rng.integers(1, len(blocks) + 1))]:
                h = int(rng.integers(0, 2**63))
                na.register_prefix(h, blk)
                py.register_prefix(h, blk)
                assert na.lookup_prefix(h) == py.lookup_prefix(h)
        elif op == 2 and live:  # share a live alloc
            blocks = live[int(rng.integers(0, len(live)))]
            na.share(blocks)
            py.share(blocks)
            live.append(list(blocks))
        elif op == 3 and live:  # release one reference
            blocks = live.pop(int(rng.integers(0, len(live))))
            keep = [b for b in blocks if py.is_registered(b)]
            assert keep == [b for b in blocks if na.is_registered(b)]
            na.release(blocks, keep_cached=keep)
            py.release(blocks, keep_cached=keep)
        assert na.n_free == py.n_free, f"step {step}"
        assert na.n_idle_cached == py.n_idle_cached, f"step {step}"
    # drain everything and verify full recovery
    while live:
        blocks = live.pop()
        keep = [b for b in blocks if py.is_registered(b)]
        na.release(blocks, keep_cached=keep)
        py.release(blocks, keep_cached=keep)
    assert na.n_free == py.n_free == 31


def test_chunked_prefill_matches_whole(llama):
    """Chunked admission must produce the same tokens as whole-prompt
    admission, and decode must interleave between chunks (a running
    request keeps generating while a long prompt admits)."""
    cfg, model, params = llama
    rng = np.random.default_rng(23)
    long_prompt = [int(x) for x in rng.integers(2, cfg.vocab_size, 70)]
    short_prompt = [int(x) for x in rng.integers(2, cfg.vocab_size, 5)]

    def run(chunk_tokens):
        batcher = ContinuousBatcher(
            model, cfg, params, eos_ids=set(),
            config=SchedulerConfig(
                batch_capacity=2, block_size=16, n_blocks=64,
                max_blocks_per_seq=8, prefill_bucket=16, dtype="float32",
                decode_quantum=1, prefill_chunk_tokens=chunk_tokens,
                enable_prefix_cache=False,
            ),
        )
        batcher.add_request(Request(request_id=0, prompt_ids=short_prompt,
                                    max_new_tokens=8))
        batcher.add_request(Request(request_id=1, prompt_ids=long_prompt,
                                    max_new_tokens=4))
        got = {0: [], 1: []}
        order = []
        steps = 0
        while batcher.has_work and steps < 100:
            for ev in batcher.step():
                if ev.token_id is not None:
                    got[ev.request_id].append(ev.token_id)
                    order.append(ev.request_id)
            steps += 1
        return got, order

    whole, _ = run(0)
    chunked, order = run(16)
    assert chunked == whole
    # interleaving: request 0 produced tokens before request 1's first
    # token (its 70-token prompt takes several 16-token chunks)
    first_1 = order.index(1)
    assert 0 in order[:first_1], (
        "short request starved during the long prompt's chunked admission"
    )


def test_chunked_prefill_with_prefix_cache(llama):
    """Chunked admission + prefix caching compose: the second request's
    shared prefix is reused and outputs match the uncached run."""
    cfg, model, params = llama
    rng = np.random.default_rng(29)
    system = [int(x) for x in rng.integers(2, cfg.vocab_size, 48)]
    prompts = [system + [int(x) for x in rng.integers(2, cfg.vocab_size, n)]
               for n in (4, 7)]

    def run(enable):
        batcher = ContinuousBatcher(
            model, cfg, params, eos_ids=set(),
            config=SchedulerConfig(
                batch_capacity=2, block_size=16, n_blocks=64,
                max_blocks_per_seq=8, prefill_bucket=16, dtype="float32",
                prefill_chunk_tokens=16, enable_prefix_cache=enable,
            ),
        )
        for i, p in enumerate(prompts):
            batcher.add_request(Request(request_id=i, prompt_ids=p,
                                        max_new_tokens=4))
        got = {}
        _drain(batcher, got)
        return got, batcher

    got_off, _ = run(False)
    got_on, b = run(True)
    assert got_on == got_off
    assert b.allocator.n_idle_cached > 0


def test_spec_rejection_sampling_preserves_distribution(llama):
    """Speculative rejection sampling must be distribution-preserving:
    with a deterministic n-gram draft, accepting draft d w.p. p(d) and
    emitting from the residual on reject makes the first emitted token
    an EXACT sample from the row's processed distribution p. Empirical
    check: run the spec quantum over many keys and compare the first
    token's frequencies to the dense model's masked softmax (top_k=4,
    temperature=1) by total-variation distance."""
    import jax.numpy as jnp

    from tinygpt_tpu.models import causal_lm
    from tinygpt_tpu.ops.sampling import masked_logits_batched

    cfg, model, params = llama
    rng = np.random.default_rng(91)
    phrase = [int(x) for x in rng.integers(2, cfg.vocab_size, 3)]
    prompt = phrase * 4  # repetitive: the n-gram draft actually fires

    batcher = ContinuousBatcher(
        model, cfg, params, eos_ids=set(),
        config=SchedulerConfig(
            batch_capacity=1, block_size=16, n_blocks=32,
            max_blocks_per_seq=8, prefill_bucket=16, dtype="float32",
            speculative="ngram", spec_draft_len=2, spec_ngram=2,
        ),
    )
    req = Request(request_id=0, prompt_ids=prompt, max_new_tokens=8,
                  sampler=SamplerConfig(temperature=1.0, top_k=4))
    batcher.add_request(req)
    assert batcher._try_admit(batcher.waiting.pop(0))
    tok0 = int(np.asarray(req._pending_token)[0])
    state = batcher.state

    C = 64
    ctx = np.zeros((1, C), np.int32)
    toks_ctx = prompt + [tok0]
    ctx[0, : len(toks_ctx)] = toks_ctx
    clen = np.asarray([len(toks_ctx)], np.int32)
    temps = np.asarray([1.0], np.float32)
    topks = np.asarray([4], np.int32)
    topps = np.asarray([1.0], np.float32)
    minps = np.asarray([0.0], np.float32)

    gamma, ngram = 2, 2
    import functools as ft

    @ft.partial(jax.jit, static_argnames=())
    def first_tokens(keys):
        def one(key):
            toks, counts, cur, _ = causal_lm.decode_paged_spec_steps(
                params, cfg, jnp.asarray([tok0], jnp.int32), state,
                jnp.asarray(ctx), jnp.asarray(clen), 1, gamma, ngram,
                sampler=(jnp.asarray(temps), jnp.asarray(topks),
                         jnp.asarray(topps), jnp.asarray(minps)),
                key=key,
            )
            return toks[0, 0, 0]

        return jax.lax.map(one, keys)

    K = 1536
    keys = jax.random.split(jax.random.PRNGKey(5), K)
    samples = np.asarray(first_tokens(keys))

    # target: dense logits at the same context, same masking
    logits = _dense_logits(cfg, model, params, toks_ctx)
    ml = masked_logits_batched(
        jnp.asarray(logits)[None, :], jnp.asarray(temps),
        jnp.asarray(topks), jnp.asarray(topps), jnp.asarray(minps))
    p = np.asarray(jax.nn.softmax(ml, axis=-1))[0]

    support = np.flatnonzero(p > 1e-9)
    assert len(support) <= 4
    assert np.isin(samples, support).all(), (
        "emitted a token outside the top-k support")
    emp = np.bincount(samples, minlength=cfg.vocab_size) / K
    tv = 0.5 * np.abs(emp - p).sum()
    # TV sampling noise at K=1536 over <=4 support points is ~0.02-0.03
    assert tv < 0.08, f"TV distance {tv:.3f} vs processed distribution"


def test_scheduler_spec_mixed_greedy_and_sampled(llama):
    """A batch mixing greedy and sampled rows rides ONE speculative
    quantum: the greedy row must still emit exactly the dense argmax
    chain (near-tie tolerant), the sampled row must emit tokens from the
    masked top-k support, and both must finish."""
    cfg, model, params = llama
    rng = np.random.default_rng(97)
    phrase = [int(x) for x in rng.integers(2, cfg.vocab_size, 4)]
    prompts = [phrase * 3, phrase * 2]
    n_new = 6

    batcher = ContinuousBatcher(
        model, cfg, params, eos_ids=set(),
        config=SchedulerConfig(
            batch_capacity=2, block_size=16, n_blocks=64,
            max_blocks_per_seq=8, prefill_bucket=16, dtype="float32",
            decode_quantum=6, speculative="ngram", spec_draft_len=2,
            spec_ngram=2,
        ),
    )
    assert batcher._spec_fn is not None
    batcher.add_request(Request(request_id=0, prompt_ids=prompts[0],
                                max_new_tokens=n_new))  # greedy
    batcher.add_request(Request(
        request_id=1, prompt_ids=prompts[1], max_new_tokens=n_new,
        sampler=SamplerConfig(temperature=1.0, top_k=3),
    ))
    got = {0: [], 1: []}
    _drain(batcher, got)
    assert len(got[0]) == n_new and len(got[1]) == n_new, got
    assert batcher.spec_verifies > 0
    assert batcher.spec_acceptance >= 0.0  # telemetry wired

    # greedy row: exact dense argmax chain modulo near-ties
    context = list(prompts[0])
    for step_idx, tok in enumerate(got[0]):
        logits = _dense_logits(cfg, model, params, context)
        best = int(logits.argmax())
        assert tok == best or logits[best] - logits[tok] < 1e-3, (
            f"greedy row step {step_idx}: {tok} vs {best}")
        context.append(tok)

    # sampled row: every token inside its own top-k support
    from tinygpt_tpu.ops.sampling import masked_logits_batched

    context = list(prompts[1])
    for tok in got[1]:
        logits = _dense_logits(cfg, model, params, context)
        ml = masked_logits_batched(
            jnp.asarray(logits)[None, :], jnp.asarray([1.0], np.float32),
            jnp.asarray([3], np.int32), jnp.asarray([1.0], np.float32),
            jnp.asarray([0.0], np.float32))
        p = np.asarray(jax.nn.softmax(ml, -1))[0]
        # near-tie tolerance at the top-k boundary: the kernel's kth
        # threshold may flip on float noise, widen by one rank
        order = np.argsort(logits)[::-1]
        allowed = set(np.flatnonzero(p > 1e-9)) | {int(order[3])}
        assert tok in allowed, (tok, sorted(allowed))
        context.append(tok)


def test_scheduler_dp_spec_mixed_sampled(llama):
    """Sampled + greedy rows speculating under ROW-PARALLEL serving
    (dp2 x tp2 shard_map): the shard index folds into the rejection
    key (independent uniforms per shard), greedy rows must still emit
    the dense argmax chain, sampled rows stay in their top-k support."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    cfg, model, params = llama
    rng = np.random.default_rng(101)
    phrase = [int(x) for x in rng.integers(2, cfg.vocab_size, 4)]
    n_new = 5

    batcher = ContinuousBatcher(
        model, cfg, params, eos_ids=set(),
        config=SchedulerConfig(
            batch_capacity=4, block_size=16, n_blocks=64,
            max_blocks_per_seq=8, prefill_bucket=16, dtype="float32",
            decode_quantum=6, speculative="ngram", spec_draft_len=2,
            spec_ngram=2, mesh_shape=(2, 1, 2),
        ),
    )
    assert batcher._spec_fn is not None
    greedy_ids, sampled_ids = (0, 2), (1, 3)
    for rid in greedy_ids:
        batcher.add_request(Request(request_id=rid,
                                    prompt_ids=phrase * (2 + rid),
                                    max_new_tokens=n_new))
    for rid in sampled_ids:
        batcher.add_request(Request(
            request_id=rid, prompt_ids=phrase * rid + phrase[:3],
            max_new_tokens=n_new,
            sampler=SamplerConfig(temperature=1.0, top_k=3),
        ))
    got = {}
    _drain(batcher, got)
    assert all(len(got[r]) == n_new for r in range(4)), got

    for rid in greedy_ids:
        context = phrase * (2 + rid)
        for step_idx, tok in enumerate(got[rid]):
            logits = _dense_logits(cfg, model, params, context)
            best = int(logits.argmax())
            assert tok == best or logits[best] - logits[tok] < 1e-3, (
                f"greedy row {rid} step {step_idx}: {tok} vs {best}")
            context.append(tok)

    for rid in sampled_ids:
        context = phrase * rid + phrase[:3]
        for tok in got[rid]:
            logits = _dense_logits(cfg, model, params, context)
            order = np.argsort(logits)[::-1]
            assert tok in set(int(t) for t in order[:4]), (
                rid, tok, [int(t) for t in order[:4]])
            context.append(tok)


def test_spec_auto_off_policy():
    """Acceptance-driven speculation auto-off: low measured acceptance
    over a window disables speculative quanta; a periodic probe
    re-enables them; healthy acceptance keeps them on (host-side policy
    logic only — no model needed)."""
    from tinygpt_tpu.engine.scheduler import ContinuousBatcher

    b = ContinuousBatcher.__new__(ContinuousBatcher)
    b.sc = SchedulerConfig(spec_window=8, spec_probe_every=3,
                           spec_min_acceptance=0.5)
    b._spec_fn = object()
    b.running = {0: object()}
    b._spec_disabled = False
    b._spec_win_emitted = 0
    b._spec_win_verifies = 0
    b._spec_low_windows = 0
    b._plain_since_probe = 0
    b._spec_probing = False
    # ONE zero-acceptance window is the cold start — still eligible
    # (a natural-text run measured overall acceptance 0.656 behind a
    # 0.22 opening window; one window must not disable)
    for _ in range(8):
        assert b._spec_eligible()
        b._spec_policy_update(1, 1)  # 1 emitted per verify = 0 drafts
    assert not b._spec_disabled
    # a SECOND consecutive low window -> auto-off
    for _ in range(8):
        assert b._spec_eligible()
        b._spec_policy_update(1, 1)
    assert b._spec_disabled
    # plain quanta until the probe re-enables on the Nth
    assert not b._spec_eligible()
    assert not b._spec_eligible()
    assert b._spec_eligible()  # probe
    assert not b._spec_disabled
    # healthy acceptance keeps speculation on
    for _ in range(8):
        b._spec_policy_update(2, 1)  # 1 accepted draft per verify
    assert not b._spec_disabled
    # ...and resets the consecutive-low-window counter: low, healthy,
    # low must NOT disable
    for _ in range(8):
        b._spec_policy_update(1, 1)
    assert not b._spec_disabled
    for _ in range(8):
        b._spec_policy_update(2, 1)
    for _ in range(8):
        b._spec_policy_update(1, 1)
    assert not b._spec_disabled
    # a RE-PROBE window that comes back low disables after ONE window
    # (draft context is warm — the cold-start excuse doesn't apply), so
    # a failed probe costs exactly one spec_window of verifies
    for _ in range(8):
        b._spec_policy_update(1, 1)
    assert b._spec_disabled
    assert not b._spec_eligible()
    assert not b._spec_eligible()
    assert b._spec_eligible()  # probe window opens
    for _ in range(8):
        b._spec_policy_update(1, 1)  # probe fails
    assert b._spec_disabled
