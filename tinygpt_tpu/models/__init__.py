"""Model registry: model_type → (load_params, init_params, forward).

Capability parity with the reference's model_type dispatch
(/root/reference/src/huggingface/ModelLoader.cpp:50-68). llama / qwen2 /
qwen3 / mistral share the generic CausalLM (they differ only by config
deltas); gpt2 is bespoke.
"""

from types import SimpleNamespace

from tinygpt_tpu.models import causal_lm, gpt2

_FAMILY = {
    "llama": causal_lm,
    "qwen2": causal_lm,
    "qwen3": causal_lm,
    "mistral": causal_lm,
    "mixtral": causal_lm,  # Mistral attention + MoE MLP (config delta)
    "gpt2": gpt2,
}


def get_model(model_type: str):
    mod = _FAMILY.get(model_type)
    if mod is None:
        raise ValueError(f"unsupported model_type {model_type!r}")
    ns = SimpleNamespace(
        load_params=mod.load_params,
        init_params=mod.init_params,
        forward=mod.forward,
        forward_paged=getattr(mod, "forward_paged", None),
    )
    # frozen-chunk decode entry points (hasattr-gated by engine/scheduler;
    # omitting them here silently routed real model dirs onto the slow
    # stepwise paths — caught by an end-to-end drive)
    for opt in ("decode_steps", "decode_paged_steps",
                "decode_paged_spec_steps"):
        fn = getattr(mod, opt, None)
        if fn is not None:
            setattr(ns, opt, fn)
    return ns


__all__ = ["get_model", "causal_lm", "gpt2"]
