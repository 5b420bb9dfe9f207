from tinygpt_tpu.hf.config import (
    GenerationConfig,
    ModelConfig,
    RopeScaling,
    load_generation_config,
    load_model_config,
)
from tinygpt_tpu.hf.safetensors_io import (
    load_safetensors,
    load_safetensors_dir,
    save_safetensors,
)

__all__ = [
    "ModelConfig",
    "GenerationConfig",
    "RopeScaling",
    "load_model_config",
    "load_generation_config",
    "load_safetensors",
    "load_safetensors_dir",
    "save_safetensors",
]
