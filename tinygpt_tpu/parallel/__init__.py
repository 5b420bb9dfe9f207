from tinygpt_tpu.parallel.sharding import (
    cache_pspecs,
    data_pspecs,
    make_mesh,
    param_pspecs,
    shard_params,
)

__all__ = [
    "make_mesh",
    "param_pspecs",
    "cache_pspecs",
    "data_pspecs",
    "shard_params",
]
