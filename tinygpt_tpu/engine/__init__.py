from tinygpt_tpu.engine.engine import (
    FinishReason,
    GPTConfig,
    GPTEngine,
    GPTOutput,
)
from tinygpt_tpu.engine.kv_cache import KVCache, create_kv_cache

__all__ = [
    "GPTEngine",
    "GPTConfig",
    "GPTOutput",
    "FinishReason",
    "KVCache",
    "create_kv_cache",
]
