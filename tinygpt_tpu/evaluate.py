"""Perplexity evaluation.

Quality gate for the quantization work (BASELINE.json: Δppl ≤ 0.1 for
INT8 / ≤ 0.5 for INT4 vs the BF16 baseline) — the reference has no
model-quality evaluation at all (SURVEY.md §6).

Sliding-window teacher forcing: the text is tokenized once, split into
windows of `window` tokens advanced by `stride`; within each window only
the last `stride` positions contribute NLL (the preceding tokens are
context), so every token is predicted with at least `window - stride`
tokens of history.
"""

from __future__ import annotations

import argparse
import math
import sys
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tinygpt_tpu.engine.kv_cache import create_kv_cache
from tinygpt_tpu.hf.config import ModelConfig
from tinygpt_tpu.utils.logging import get_logger

log = get_logger("evaluate")


def window_nll(
    model,
    cfg: ModelConfig,
    params,
    token_ids: Sequence[int],
    window: int = 512,
    stride: int = 256,
    attn_impl: str = "xla",
    kv_dtype=None,  # KV-cache storage dtype (fp8 quality gating);
                    # None = float32
) -> tuple:
    """Returns (total_nll, n_scored_tokens) over the token stream."""
    ids = np.asarray(token_ids, dtype=np.int32)
    n = len(ids)
    if n < 2:
        raise ValueError("need at least 2 tokens to score")
    window = min(window, cfg.context_size, n)
    stride = min(stride, window)

    @jax.jit
    def score(chunk, n_score):
        """NLL of the last `n_score` next-token predictions in `chunk`."""
        S = chunk.shape[0]
        cache = create_kv_cache(cfg, 1, window,
                                dtype=kv_dtype or jnp.float32)
        pos = jnp.arange(S)[None, :]
        logits, _ = model.forward(
            params, cfg, chunk[None, :], cache, pos,
            jnp.ones((1, S), jnp.bool_), attn_impl=attn_impl,
        )
        logp = jax.nn.log_softmax(logits[0, :-1].astype(jnp.float32), axis=-1)
        tgt = chunk[1:]
        tok_nll = -jnp.take_along_axis(logp, tgt[:, None], axis=-1)[:, 0]
        # score only the trailing n_score predictions
        idx = jnp.arange(S - 1)
        mask = idx >= (S - 1 - n_score)
        return jnp.sum(tok_nll * mask)

    total_nll = 0.0
    total_tokens = 0
    start = 0
    prev_end = 1  # first token can't be scored
    while prev_end < n:
        end = min(start + window, n)
        chunk = ids[start:end]
        n_score = end - prev_end
        if len(chunk) < window:
            # pad the tail window on the left with earlier context
            start = max(0, n - window)
            chunk = ids[start:n]
            n_score = n - prev_end
        total_nll += float(score(jnp.asarray(chunk), n_score))
        total_tokens += n_score
        prev_end = end
        start += stride
        if end >= n:
            break
    return total_nll, total_tokens


def perplexity(model, cfg, params, token_ids, window=512, stride=256,
               attn_impl: str = "xla", kv_dtype=None) -> float:
    nll, n = window_nll(model, cfg, params, token_ids, window, stride,
                        attn_impl, kv_dtype=kv_dtype)
    return math.exp(nll / max(n, 1))


def main(argv: Optional[list] = None) -> int:
    import tinygpt_tpu

    tinygpt_tpu.ensure_compile_cache()
    ap = argparse.ArgumentParser(
        prog="tinygpt_tpu.evaluate",
        description="perplexity over a text file",
    )
    ap.add_argument("--model", required=True)
    ap.add_argument("--text", required=True, help="UTF-8 text file")
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--window", type=int, default=512)
    ap.add_argument("--stride", type=int, default=256)
    ap.add_argument("--max-tokens", type=int, default=0,
                    help="truncate the eval stream (0 = all)")
    ap.add_argument("--quantization", default=None,
                    choices=["int8", "int4"])
    ap.add_argument("--quant-group-size", type=int, default=None,
                    help="default: 128")
    ap.add_argument("--awq", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="AWQ scaling before quantization (default: on "
                         "for int4 dense-MLP models; calibrates on the "
                         "eval file's leading train-side text is WRONG — "
                         "pass --awq-calib with held-out text)")
    ap.add_argument("--awq-calib", default=None, metavar="TEXT_FILE",
                    help="calibration text for --awq (default: built-in)")
    args = ap.parse_args(argv)

    from tinygpt_tpu.hf.loader import load_model_dir

    ctx = load_model_dir(args.model, dtype=args.dtype)
    params = ctx.params
    if args.quantization:
        from tinygpt_tpu.ops.quant import quantize_params

        from tinygpt_tpu.engine.engine import resolve_quant_group

        bits = {"int8": 8, "int4": 4}[args.quantization]
        group = resolve_quant_group(bits, args.quant_group_size,
                                    moe="moe_gate_up_w" in params["layers"])
        from tinygpt_tpu.ops.awq import awq_policy

        awq_on, awq_layout = awq_policy(args.awq, bits, params["layers"])
        if awq_on and args.awq and not awq_layout:
            log.warning("--awq requested but %s has no causal_lm "
                        "layer layout; plain quantization",
                        ctx.model_config.model_type)
        if awq_on and awq_layout:
            from tinygpt_tpu.ops.awq import (awq_quantize_params,
                                             default_calib_ids)

            calib = default_calib_ids(ctx.tokenizer, 2048,
                                      path=args.awq_calib)
            params = awq_quantize_params(params, ctx.model_config, calib,
                                         bits=bits, group_size=group)
        else:
            params = quantize_params(params, bits=bits, group_size=group)
    with open(args.text, "r", encoding="utf-8") as f:
        text = f.read()
    ids = ctx.tokenizer.encode(text)
    if args.max_tokens:
        ids = ids[: args.max_tokens]
    log.info("scoring %d tokens (window %d, stride %d)",
             len(ids), args.window, args.stride)
    attn_impl = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    ppl = perplexity(ctx.model, ctx.model_config, params, ids,
                     window=args.window, stride=args.stride,
                     attn_impl=attn_impl)
    print(f"perplexity: {ppl:.4f} over {len(ids)} tokens")
    return 0


if __name__ == "__main__":
    sys.exit(main())
