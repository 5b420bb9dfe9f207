"""Batch-inference CLI.

Capability parity with /root/reference/examples/inference/main.cpp:
--model/--dtype/--max-tokens/--temperature/--top-p flags, a fixed prompt
batch (overridable with --prompt), and token/s timing output.
"""

from __future__ import annotations

import argparse
import sys
import time

from tinygpt_tpu.engine.engine import GPTConfig, GPTEngine
from tinygpt_tpu.ops.sampling import SamplerConfig

DEFAULT_PROMPTS = [
    "The meaning of life is",
    "Once upon a time,",
    "In a shocking finding, scientists discovered",
    "The best way to learn programming is",
]


def main(argv=None) -> int:
    import os

    if os.environ.get("JAX_PLATFORMS"):
        # honor the env var even where a sitecustomize overrides it
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    # join a multi-host runtime when configured (JAX_COORDINATOR_ADDRESS
    # / JAX_NUM_PROCESSES / JAX_PROCESS_ID env); no-op single process
    from tinygpt_tpu.parallel import distributed

    distributed.initialize(
        num_processes=(int(os.environ["JAX_NUM_PROCESSES"])
                       if os.environ.get("JAX_NUM_PROCESSES") else None),
        process_id=(int(os.environ["JAX_PROCESS_ID"])
                    if os.environ.get("JAX_PROCESS_ID") else None),
    )
    ap = argparse.ArgumentParser(
        prog="tinygpt_tpu", description="batch inference example"
    )
    ap.add_argument("--model", required=True, help="HF model directory")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "float16", "bfloat16",
                             "fp32", "fp16", "bf16"])
    ap.add_argument("--max-tokens", type=int, default=32)
    ap.add_argument("--temperature", type=float, default=None)
    ap.add_argument("--top-p", type=float, default=None)
    ap.add_argument("--min-p", type=float, default=None)
    ap.add_argument("--top-k", type=int, default=None)
    ap.add_argument("--prompt", action="append", default=None,
                    help="prompt (repeatable); default: 4 fixed prompts")
    ap.add_argument("--stream", action="store_true",
                    help="stream the first prompt token-by-token")
    ap.add_argument("--quantization", default=None,
                    choices=["int8", "int4"],
                    help="weight-only quantization")
    ap.add_argument("--quant-group-size", type=int, default=None,
                    help="default: 128 (int4 passes the ppl gate via the AWQ default, not the group size)")
    ap.add_argument("--awq", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="AWQ activation-aware scaling before "
                         "quantization (default: on for int4; "
                         "--no-awq forces plain RTN)")
    ap.add_argument("--awq-calib", default=None, metavar="TEXT_FILE",
                    help="calibration text for --awq (default: built-in)")
    ap.add_argument("--mesh", default=None, metavar="DP,SP,TP",
                    help="shard over a device mesh, e.g. 1,1,8")
    ap.add_argument("--speculative", default=None, choices=["ngram"],
                    help="speculative decoding (batch-1; greedy exact, "
                         "sampled via exact rejection sampling)")
    args = ap.parse_args(argv)
    mesh_shape = (tuple(int(x) for x in args.mesh.split(","))
                  if args.mesh else None)

    engine = GPTEngine(GPTConfig(
        model_dir=args.model,
        dtype=args.dtype,
        max_tokens=args.max_tokens,
        sampler=SamplerConfig(
            temperature=args.temperature, top_p=args.top_p,
            min_p=args.min_p, top_k=args.top_k,
        ),
        quantization=args.quantization,
        quant_group_size=args.quant_group_size,
        awq=args.awq,
        awq_calib_path=args.awq_calib,
        mesh_shape=mesh_shape,
        speculative=args.speculative,
    ))
    t0 = time.perf_counter()
    engine.prepare()
    print(f"[load] {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    prompts = args.prompt or DEFAULT_PROMPTS

    if args.stream:
        print(f">>> {prompts[0]}", flush=True)
        t0 = time.perf_counter()
        out = engine.generate_async(
            prompts[0],
            lambda chunk, done: (print(chunk, end="", flush=True), True)[1],
        )
        dt = time.perf_counter() - t0
        print(f"\n[{len(out.token_ids)} tokens, "
              f"{len(out.token_ids) / dt:.2f} token/s]", file=sys.stderr)
        return 0

    # warmup compile so the timing matches the reference methodology
    t0 = time.perf_counter()
    outs = engine.generate_sync(prompts)
    dt = time.perf_counter() - t0
    total_tokens = sum(len(o.token_ids) for o in outs)
    for p, o in zip(prompts, outs):
        print(f">>> {p}\n{o.text}\n")
    print(
        f"[generate] {total_tokens} tokens in {dt * 1e3:.0f} ms "
        f"({total_tokens / dt:.2f} token/s)",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
