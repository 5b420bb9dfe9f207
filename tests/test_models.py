"""Model numerics tests: logit parity with HF transformers per family,
prefill/decode cache equivalence, left-padding invariance."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tests.fixtures import build_tiny_model_dir, hf_reference_logits
from tinygpt_tpu.engine.kv_cache import create_kv_cache
from tinygpt_tpu.hf.config import load_model_config
from tinygpt_tpu.hf.safetensors_io import load_safetensors_dir
from tinygpt_tpu.models import get_model

FAMILIES = ["gpt2", "llama", "llama_scaled", "qwen2", "qwen3", "mistral",
            "mixtral"]


@pytest.fixture(scope="module")
def model_dirs(tmp_path_factory):
    out = {}
    for fam in FAMILIES:
        d = tmp_path_factory.mktemp(f"tiny_{fam}")
        build_tiny_model_dir(fam, str(d), seed=hash(fam) % 2**31)
        out[fam] = str(d)
    return out


def _load(model_dirs, fam):
    d = model_dirs[fam]
    cfg = load_model_config(d)
    model = get_model(cfg.model_type)
    weights = load_safetensors_dir(d)
    params = model.load_params(cfg, weights, dtype=jnp.float32)
    return cfg, model, params


@pytest.mark.parametrize("fam", FAMILIES)
def test_logit_parity_prefill(model_dirs, fam):
    cfg, model, params = _load(model_dirs, fam)
    rng = np.random.default_rng(0)
    B, S = 2, 12
    ids = rng.integers(0, cfg.vocab_size, (B, S))
    ref = hf_reference_logits(model_dirs[fam], ids)

    cache = create_kv_cache(cfg, B, 32, dtype=jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    valid = jnp.ones((B, S), jnp.bool_)
    logits, _ = model.forward(
        params, cfg, jnp.asarray(ids), cache, positions, valid
    )
    got = np.asarray(logits)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("fam", ["llama", "gpt2", "qwen3"])
def test_decode_matches_prefill(model_dirs, fam):
    """Prefill S tokens, then decode one-by-one: the final logits must
    match a single full prefill of S+K tokens (cache correctness)."""
    cfg, model, params = _load(model_dirs, fam)
    rng = np.random.default_rng(1)
    B, S, K = 2, 6, 4
    ids = rng.integers(0, cfg.vocab_size, (B, S + K))

    # full prefill
    cache = create_kv_cache(cfg, B, 32, dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(S + K), (B, S + K))
    full_logits, _ = model.forward(
        params, cfg, jnp.asarray(ids), cache,
        pos, jnp.ones((B, S + K), jnp.bool_),
    )

    # prefill S then K single-token steps
    cache = create_kv_cache(cfg, B, 32, dtype=jnp.float32)
    logits, cache = model.forward(
        params, cfg, jnp.asarray(ids[:, :S]), cache,
        pos[:, :S], jnp.ones((B, S), jnp.bool_),
    )
    step_logits = []
    for t in range(S, S + K):
        logits, cache = model.forward(
            params, cfg, jnp.asarray(ids[:, t : t + 1]), cache,
            pos[:, t : t + 1], jnp.ones((B, 1), jnp.bool_),
        )
        step_logits.append(np.asarray(logits[:, 0]))

    for i, t in enumerate(range(S, S + K)):
        np.testing.assert_allclose(
            step_logits[i], np.asarray(full_logits[:, t]),
            rtol=1e-4, atol=1e-4,
        )


@pytest.mark.parametrize("fam", ["llama", "mistral", "qwen3", "mixtral"])
def test_decode_steps_matches_stepwise_forward(model_dirs, fam):
    """The frozen-cache chunked decode (decode_steps) must produce the
    same greedy tokens AND the same final cache contents as step-by-step
    forward() calls (mistral also exercises the sliding-window mask in
    sdpa_decode_frozen)."""
    from tinygpt_tpu.models import causal_lm

    cfg, model, params = _load(model_dirs, fam)
    rng = np.random.default_rng(4)
    B, S, N = 2, 6, 5
    ids = rng.integers(2, cfg.vocab_size, (B, S))
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))

    def prefill():
        cache = create_kv_cache(cfg, B, 32, dtype=jnp.float32)
        logits, cache = model.forward(
            params, cfg, jnp.asarray(ids), cache, pos,
            jnp.ones((B, S), jnp.bool_), last_only=True,
        )
        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        return tok, cache

    # reference: per-step forward
    tok, cache_ref = prefill()
    ref_toks = []
    for t in range(N):
        logits, cache_ref = model.forward(
            params, cfg, tok[:, None], cache_ref,
            jnp.full((B, 1), S + t, jnp.int32), jnp.ones((B, 1), jnp.bool_),
            last_only=True,
        )
        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        ref_toks.append(np.asarray(tok))

    # frozen-cache chunked decode
    tok0, cache = prefill()
    keys = jax.random.split(jax.random.PRNGKey(0), N)
    toks, cache = causal_lm.decode_steps(
        params, cfg, tok0, cache, jnp.full((B, 1), S, jnp.int32), keys,
        lambda lg, k: jnp.argmax(lg, -1).astype(jnp.int32),
    )
    np.testing.assert_array_equal(np.asarray(toks), np.stack(ref_toks))
    # cache contents identical where written
    np.testing.assert_allclose(
        np.asarray(cache.k[:, :, :, : S + N]),
        np.asarray(cache_ref.k[:, :, :, : S + N]), rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(cache.kv_pos[:, : S + N]),
        np.asarray(cache_ref.kv_pos[:, : S + N]),
    )
    assert int(cache.length) == S + N


def test_left_padding_invariance(model_dirs):
    """A left-padded row must produce the same last-token logits as the
    unpadded sequence — the correctness the reference punts on
    (GPTEngine.cpp:95 'TODO: support attention mask')."""
    cfg, model, params = _load(model_dirs, "llama")
    rng = np.random.default_rng(2)
    S, PAD = 8, 3
    seq = rng.integers(2, cfg.vocab_size, (1, S))

    cache = create_kv_cache(cfg, 1, 32, dtype=jnp.float32)
    pos = jnp.arange(S)[None, :]
    ref_logits, _ = model.forward(
        params, cfg, jnp.asarray(seq), cache, pos,
        jnp.ones((1, S), jnp.bool_),
    )

    padded = np.concatenate([np.zeros((1, PAD), np.int64), seq], axis=1)
    token_valid = np.concatenate(
        [np.zeros((1, PAD), bool), np.ones((1, S), bool)], axis=1
    )
    # logical positions: pads get 0, real tokens 0..S-1
    positions = np.concatenate(
        [np.zeros((1, PAD), np.int32), np.arange(S, dtype=np.int32)[None, :]],
        axis=1,
    )
    cache = create_kv_cache(cfg, 1, 32, dtype=jnp.float32)
    pad_logits, _ = model.forward(
        params, cfg, jnp.asarray(padded), cache,
        jnp.asarray(positions), jnp.asarray(token_valid),
    )
    np.testing.assert_allclose(
        np.asarray(pad_logits[:, -1]), np.asarray(ref_logits[:, -1]),
        rtol=1e-4, atol=1e-4,
    )


def test_last_only_logits(model_dirs):
    cfg, model, params = _load(model_dirs, "llama")
    rng = np.random.default_rng(3)
    ids = rng.integers(0, cfg.vocab_size, (2, 5))
    pos = jnp.broadcast_to(jnp.arange(5), (2, 5))
    valid = jnp.ones((2, 5), jnp.bool_)
    cache = create_kv_cache(cfg, 2, 16, dtype=jnp.float32)
    full, _ = model.forward(params, cfg, jnp.asarray(ids), cache, pos, valid)
    cache = create_kv_cache(cfg, 2, 16, dtype=jnp.float32)
    last, _ = model.forward(
        params, cfg, jnp.asarray(ids), cache, pos, valid, last_only=True
    )
    np.testing.assert_allclose(
        np.asarray(last[:, 0]), np.asarray(full[:, -1]), rtol=1e-6, atol=1e-6
    )


def test_sliding_window_masks_old_keys():
    """Sliding-window attention: keys further than `window` back must get
    zero weight (single attention op — at model level the receptive field
    is window × depth, so old tokens legitimately leak through layers).
    The reference parses sliding_window but never applies it
    (ModelMistral.h:23-40); we do."""
    from tinygpt_tpu.ops.attention import sdpa_with_cache

    rng = np.random.default_rng(4)
    B, T, N, D, W = 1, 10, 2, 8, 4
    k = rng.standard_normal((B, N, T, D)).astype(np.float32)
    v = rng.standard_normal((B, N, T, D)).astype(np.float32)
    q = rng.standard_normal((B, 1, N, D)).astype(np.float32)
    kv_pos = np.arange(T, dtype=np.int32)[None, :]
    valid = np.ones((B, T), bool)
    q_pos = np.full((B, 1), T - 1, np.int32)

    def run(kk, vv):
        return np.asarray(sdpa_with_cache(
            jnp.asarray(q), jnp.asarray(kk), jnp.asarray(vv),
            q_pos=jnp.asarray(q_pos), kv_pos=jnp.asarray(kv_pos),
            kv_valid=jnp.asarray(valid), sliding_window=W,
        ))

    base = run(k, v)
    k2, v2 = k.copy(), v.copy()
    # positions 0..T-1-W are outside the window of the last query
    k2[:, :, : T - W], v2[:, :, : T - W] = 123.0, -55.0
    np.testing.assert_allclose(base, run(k2, v2), rtol=1e-6, atol=1e-6)

    # and a key inside the window DOES matter
    v3 = v.copy()
    v3[:, :, T - 2] = 99.0
    assert np.abs(base - run(k, v3)).max() > 1e-3


def test_moe_routed_matches_dense(model_dirs):
    """moe_mlp's routed (ragged_dot grouped-matmul) formulation must
    match the dense-over-experts weighted sum, and forward() under
    moe_impl="routed" must match "dense" end-to-end. The routed path is
    the prefill default ("auto" at B*S >= 32)."""
    from tinygpt_tpu.models import causal_lm

    cfg, model, params = _load(model_dirs, "mixtral")
    rng = np.random.default_rng(11)

    # unit: the MoE MLP alone, odd token count (uneven expert groups)
    lp = {k: params["layers"][k][0]
          for k in ("router_w", "moe_gate_up_w", "moe_down_w")}
    h = jnp.asarray(rng.standard_normal((3, 7, cfg.hidden_size)),
                    jnp.float32)
    dense = causal_lm.moe_mlp(h, lp, cfg, impl="dense")
    routed = causal_lm.moe_mlp(h, lp, cfg, impl="routed")
    np.testing.assert_allclose(np.asarray(routed), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)

    # end-to-end: full forward, prefill-sized S so "auto" = routed
    B, S = 2, 16
    ids = jnp.asarray(rng.integers(2, cfg.vocab_size, (B, S)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    valid = jnp.ones((B, S), jnp.bool_)

    def run(impl):
        cache = create_kv_cache(cfg, B, 32, dtype=jnp.float32)
        logits, _ = model.forward(params, cfg, ids, cache, pos, valid,
                                  moe_impl=impl)
        return np.asarray(logits)

    np.testing.assert_allclose(run("routed"), run("dense"),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(run("auto"), run("routed"), rtol=0, atol=0)
