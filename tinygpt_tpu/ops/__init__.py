from tinygpt_tpu.ops.norms import layer_norm, rms_norm
from tinygpt_tpu.ops.rope import apply_rope, compute_rope_freqs
from tinygpt_tpu.ops.attention import sdpa_with_cache

__all__ = [
    "rms_norm",
    "layer_norm",
    "apply_rope",
    "compute_rope_freqs",
    "sdpa_with_cache",
]
