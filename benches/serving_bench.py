"""Continuous-batching serving benchmark: TTFT and aggregate throughput.

Drives the ContinuousBatcher directly (no HTTP) with a synthetic arrival
pattern and reports per-request time-to-first-token percentiles plus
aggregate decode tokens/s — the serving metrics BASELINE.md targets and
the reference cannot measure (it serializes whole requests through one
worker, /root/reference/server/HttpServer.cpp:118-163).

Usage:
  python benches/serving_bench.py [--requests 16] [--prompt-len 64]
      [--max-new 64] [--capacity 8] [--quantum 4] [--layers N ...]
Model: Llama-3.2-1B-shaped random weights (bf16) by default; shrink with
--layers/--hidden for smoke runs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=16)
    ap.add_argument("--prompt-len", type=int, default=64)
    ap.add_argument("--max-new", type=int, default=64)
    ap.add_argument("--capacity", type=int, default=8)
    ap.add_argument("--quantum", type=int, default=8)
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--hidden", type=int, default=2048)
    ap.add_argument("--vocab", type=int, default=128256)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--kv-dtype", default="auto")
    ap.add_argument("--shared-prefix", type=int, default=0,
                    help="tokens of system prompt shared by all requests "
                         "(exercises prefix caching)")
    ap.add_argument("--no-prefix-cache", action="store_true")
    ap.add_argument("--prefill-chunk", type=int, default=0,
                    help="chunked prefill: max prompt tokens per step")
    ap.add_argument("--tp", type=int, default=0,
                    help="shard the batcher over a tp mesh of this size "
                         "(0 = single device)")
    ap.add_argument("--speculative", action="store_true",
                    help="n-gram speculative decode quanta")
    ap.add_argument("--repetitive", action="store_true",
                    help="prompts repeat a short phrase (the n-gram "
                         "speculative sweet spot: code/extraction-like)")
    ap.add_argument("--no-spec-auto", action="store_true",
                    help="disable the acceptance-driven speculation "
                         "auto-off policy (always speculate)")
    ap.add_argument("--model-dir", default=None,
                    help="drive a REAL model dir (e.g. the trained ppl-"
                         "gate model) instead of random weights — makes "
                         "speculation acceptance measurements meaningful")
    ap.add_argument("--natural", action="store_true",
                    help="prompts are real text (the offline Python-"
                         "source corpus, tokenized) instead of random ids")
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        # the env var alone is overridden by a sitecustomize on this
        # image; the config update wins (CLAUDE.md)
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from tinygpt_tpu.engine.scheduler import (
        ContinuousBatcher,
        Request,
        SchedulerConfig,
    )
    from tinygpt_tpu.hf.config import parse_model_config
    from tinygpt_tpu.models import causal_lm

    tokenizer = None
    if args.model_dir:
        from tinygpt_tpu.hf.loader import load_model_dir, resolve_dtype

        ctx = load_model_dir(args.model_dir,
                             dtype=resolve_dtype(args.dtype))
        cfg, params, tokenizer = ctx.model_config, ctx.params, ctx.tokenizer
    else:
        cfg = parse_model_config({
            "model_type": "llama", "vocab_size": args.vocab,
            "hidden_size": args.hidden, "num_hidden_layers": args.layers,
            "num_attention_heads": args.hidden // 64,
            "num_key_value_heads": max(1, args.hidden // 256),
            "intermediate_size": args.hidden * 4,
            "max_position_embeddings": 4096, "rope_theta": 500000.0,
            "rms_norm_eps": 1e-5, "tie_word_embeddings": True,
        })
        dtype = (jnp.bfloat16 if args.dtype in ("bfloat16", "bf16")
                 else jnp.float32)
        params = causal_lm.init_params(cfg, seed=0, dtype=dtype)
    natural_ids = None
    if args.natural:
        # real text: the same offline Python-source corpus the ppl gate
        # trains on, tokenized with the model's tokenizer (or mapped into
        # the vocab range for random-weight runs)
        from benches.ppl_gate import build_corpus

        _, eval_text = build_corpus(0.5, 2.0)
        if tokenizer is not None:
            natural_ids = tokenizer.encode(eval_text)
        else:
            natural_ids = [2 + (b % (cfg.vocab_size - 2))
                           for b in eval_text.encode()[:500_000]]
    attn = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    batcher = ContinuousBatcher(
        causal_lm, cfg, params, eos_ids=set(),
        config=SchedulerConfig(
            batch_capacity=args.capacity, block_size=64,
            n_blocks=max(256, args.capacity * 16),
            max_blocks_per_seq=32, prefill_bucket=64,
            dtype=args.dtype, kv_cache_dtype=args.kv_dtype,
            attn_impl=attn, decode_quantum=args.quantum,
            enable_prefix_cache=not args.no_prefix_cache,
            prefill_chunk_tokens=args.prefill_chunk,
            mesh_shape=(1, 1, args.tp) if args.tp else None,
            speculative="ngram" if args.speculative else None,
            spec_auto_off=not args.no_spec_auto,
        ),
    )

    rng = np.random.default_rng(0)
    shared = [int(x) for x in
              rng.integers(2, cfg.vocab_size, args.shared_prefix)]
    submit_t = {}
    first_tok_t = {}
    done_t = {}
    tokens_out = {i: 0 for i in range(args.requests)}

    # warmup: compile prefill + quantum for both the cold and the
    # prefix-cached admission shapes
    warm = [1] * (args.shared_prefix + args.prompt_len)
    for rid in (-1, -2):
        batcher.add_request(Request(request_id=rid, prompt_ids=list(warm),
                                    max_new_tokens=args.quantum + 1))
        while batcher.has_work:
            batcher.step()

    t_start = time.perf_counter()
    for i in range(args.requests):
        if args.repetitive:
            phrase = [int(x) for x in rng.integers(2, cfg.vocab_size, 7)]
            body = (phrase * (args.prompt_len // 7 + 1))[: args.prompt_len]
        elif natural_ids is not None:
            s = int(rng.integers(0, len(natural_ids) - args.prompt_len - 1))
            body = [int(x) for x in natural_ids[s : s + args.prompt_len]]
        else:
            body = [int(x) for x in
                    rng.integers(2, cfg.vocab_size, args.prompt_len)]
        batcher.add_request(Request(
            request_id=i,
            prompt_ids=shared + body,
            max_new_tokens=args.max_new,
        ))
        submit_t[i] = time.perf_counter()
    while batcher.has_work:
        for ev in batcher.step():
            now = time.perf_counter()
            rid = ev.request_id
            if rid < 0:
                continue
            if ev.token_id is not None:
                tokens_out[rid] += 1
                first_tok_t.setdefault(rid, now)
            if ev.finished:
                done_t[rid] = now
    t_end = time.perf_counter()

    ttft = np.array([first_tok_t[i] - submit_t[i]
                     for i in range(args.requests)])
    total_tokens = sum(tokens_out.values())
    wall = t_end - t_start
    result = {
        "metric": "serving_continuous_batching",
        "requests": args.requests,
        "shared_prefix": args.shared_prefix,
        "prefix_cache": not args.no_prefix_cache,
        "prefill_chunk": args.prefill_chunk,
        "prompt_len": args.prompt_len,
        "max_new": args.max_new,
        "capacity": args.capacity,
        "quantum": args.quantum,
        "speculative": bool(args.speculative),
        "repetitive": bool(args.repetitive),
        "natural": bool(args.natural),
        "model_dir": args.model_dir,
        "spec_acceptance": round(batcher.spec_acceptance, 3),
        "spec_auto_off_engaged": batcher._spec_disabled,
        "ttft_p50_s": round(float(np.percentile(ttft, 50)), 3),
        "ttft_p95_s": round(float(np.percentile(ttft, 95)), 3),
        "throughput_tok_s": round(total_tokens / wall, 1),
        "wall_s": round(wall, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
