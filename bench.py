"""Headline benchmark: the BASELINE flagship metric — Mistral-7B-shape
INT4 decode tokens/sec/chip (batch 4, greedy, 32 steps over a 1024-slot
cache), measured on whatever accelerator jax.devices() provides (one TPU
v5e chip under the driver).

The reference publishes one throughput number: 83.90 token/s for a
batch-of-4, 32-new-token bf16 decode on an unspecified GPU
(/root/reference/README.md:113) — `vs_baseline` is against that. The
reference has no quantization at all (FP32/16/BF16 only), so this is the
honest "its own benchmark, heavier model, quantized" comparison the
BASELINE.json flagship config asks for.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_TOKENS_PER_S = 83.90  # reference README.md:113


def main() -> None:
    import tinygpt_tpu

    tinygpt_tpu.ensure_compile_cache()
    from benches.flagship_bench import run

    # group 64 = the shipped int4 default for dense-MLP models
    # (engine.resolve_quant_group): on the credible-scale gate model
    # (PPL_GATE.json, ppl ~30 where the absolute BASELINE bars apply)
    # g64+AWQ passes the ≤0.5 Δppl bar (+0.46) and g128+AWQ fails
    # (+0.81) — the headline is measured in the quality-gated config,
    # eating the ~3% extra scale bytes. AWQ only rescales weight VALUES
    # — layout, bytes and kernels are identical — so this random-weight
    # perf measurement is exactly the AWQ config's perf.
    try:
        res = run(batch=4, decode_steps=32, bits=4, group=64,
                  context=1024, serving=True)
    except Exception as e:  # noqa: BLE001 — emit a parseable record
        # the backend can be hard-down (axon UNAVAILABLE outages run for
        # hours, 2026-08-17); an explicit JSON error line beats a
        # traceback the driver can't parse
        print(json.dumps({
            "metric": "decode_tokens_per_sec_mistral7b_int4_b4",
            "value": 0, "unit": "tokens/s", "vs_baseline": 0,
            "error": f"{type(e).__name__}: {e}"[:300],
        }))
        raise SystemExit(1)
    res["vs_baseline"] = round(res["value"] / BASELINE_TOKENS_PER_S, 3)

    # BASELINE measurement config 4 (Qwen3-1.7B continuous-batched
    # serving; single-chip stand-in — v5e-8 is unavailable here), folded
    # into the same JSON line. Guarded by an alarm so a hang can never
    # cost the flagship record above.
    import signal

    def _bail(*_):
        raise TimeoutError("qwen3 leg timed out")

    signal.signal(signal.SIGALRM, _bail)
    signal.alarm(1500)  # first-ever compile of the shape can take ~15
    # min through the tunnel helper; the persistent compile cache makes
    # driver reruns start in seconds
    try:
        q = run(batch=4, decode_steps=32, bits=4, group=64,
                context=1024, serving=True, shape="qwen3_17b")
        for k in ("value", "ms_per_step", "eff_gb_s",
                  "serving_steady_tok_s", "serving_tok_s",
                  "serving_ttft_p50_s", "serving_ttft_p95_s"):
            if k in q:
                res[f"qwen3_17b_{'tok_s' if k == 'value' else k}"] = q[k]
    except Exception as e:  # noqa: BLE001 — qwen3 leg is best-effort
        res["qwen3_17b_error"] = f"{type(e).__name__}: {e}"[:200]
    finally:
        signal.alarm(0)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
