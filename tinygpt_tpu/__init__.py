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

from tinygpt_tpu.version import __version__

__all__ = ["__version__"]
