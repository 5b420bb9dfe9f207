"""tinygpt_tpu — a TPU-native LLM inference framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
keith2018/TinyGPT (a C++17/CUDA inference engine): HuggingFace model-dir
loading (config.json / tokenizer.json / safetensors), GPT-2 / Llama-3 /
Qwen2.5 / Qwen3 / Mistral decoder-only transformers, sampling, an
OpenAI-compatible server — plus the reference's TODOs implemented natively:
paged KV-cache, continuous batching, INT8/INT4 weight-only quantization,
FP8 KV-cache, and mesh-sharded distributed inference.

Compute path: jax.numpy + Pallas TPU kernels under jit, static shapes,
functional state. Orchestration: Python engine + asyncio server.
"""

import os as _os

from tinygpt_tpu.version import __version__


_cache_decided = False


def ensure_compile_cache() -> None:
    """Persistent XLA compilation cache (opt out: TINYGPT_NO_COMPILE_CACHE).

    Decode/prefill programs compile in tens of seconds to minutes on TPU;
    the cache makes every process after the first start instantly for
    unchanged shapes.

    Called lazily from the heavy-compile entry points (engine/scheduler
    construction, bench, evaluate) — NOT at import: the decision keys on
    the RESOLVED backend, because env-var sniffing misses sessions that
    escape the tunneled TPU platform via
    jax.config.update("jax_platforms", "cpu") after import. CPU sessions
    must skip the cache: XLA:CPU persists AOT code keyed to the compiling
    machine's CPU features, and loading it elsewhere risks SIGILL; CPU
    compiles are cheap anyway."""
    global _cache_decided
    if _cache_decided:
        return
    _cache_decided = True
    if _os.environ.get("TINYGPT_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        if jax.default_backend() == "cpu":
            return
        cache_dir = _os.environ.get(
            "TINYGPT_COMPILE_CACHE",
            _os.path.join(
                _os.path.expanduser("~"), ".cache", "tinygpt_tpu", "xla"
            ),
        )
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:  # never break a session over a cache
        pass


__all__ = ["__version__", "ensure_compile_cache"]
