"""Quantization quality gate regression test.

Runs a reduced budget of benches/ppl_gate.py (train a tiny LM on real
text, then Δppl per precision on held-out tokens). Asserts RELATIVE
deltas, which are scale-robust for a small trained model; the
full-budget absolute-threshold verdicts (BASELINE.json: ≤0.1 INT8 /
≤0.5 INT4) are recorded in PPL_GATE.json from benches/ppl_gate.py.
"""

import pytest

jax = pytest.importorskip("jax")


def test_quantization_ppl_relative_gate(tmp_path):
    from benches.ppl_gate import build_corpus, measure, train_model

    train_text, eval_text = build_corpus(train_mb=0.8, eval_mb=0.3)
    d = str(tmp_path / "m")
    train_model(d, train_text, n_layer=2, n_embd=128, n_head=4,
                vocab=2048, seq_len=128, steps=250, batch=8,
                arch="llama", log=lambda *a: None)
    res = measure(d, eval_text, max_tokens=30_000, window=128, stride=64,
                  calib_text=train_text, log=lambda *a: None)
    base = res["ppl_f32"]
    assert res["eval_tokens"] >= 20_000
    # int8 must be ~lossless; int4 bounded; fp8-KV near-lossless. All
    # relative (tiny undertrained models sit at high absolute ppl where
    # the BASELINE absolute thresholds are not meaningful).
    assert abs(res["dppl_int8_g128"]) / base < 0.005, res
    assert abs(res["dppl_fp8kv"]) / base < 0.005, res
    # int4 gated at the SHIPPED default (g64); g128 is looser on record
    assert res["dppl_int4_g64"] / base < 0.01, res
    assert res["dppl_int4_g128"] / base < 0.02, res
    # AWQ legs exist on the llama-arch gate model and must not make the
    # same config meaningfully worse (they usually improve it; tiny
    # models leave little headroom, so gate on no-regression)
    assert res["dppl_int4_g128_awq"] / base < 0.02, res
    assert res["dppl_int4_g64_awq"] / base < 0.01, res
