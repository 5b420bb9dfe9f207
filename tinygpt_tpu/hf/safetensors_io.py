"""Zero-copy safetensors reader/writer.

Capability parity with the reference's mmap loader
(/root/reference/src/util/SafeTensors.{h,cpp}): u64-length JSON header +
raw tensor data, single-file and sharded (`model.safetensors.index.json`
weight_map) loading, shape/dtype validation, strict/non-strict missing and
unexpected-key reporting, and a symmetric save.

TPU-first design: tensors are returned as numpy views over an np.memmap of
the file — nothing is copied on the host. The model loader feeds the views
to `jax.device_put` (optionally with a NamedSharding), so the only copy is
host-mmap → TPU HBM, matching the reference's mmap → cudaMemcpy path
(SafeTensors.cpp:213-215) without the intermediate host tensor.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Callable, Dict, Iterable, Optional, Tuple

import ml_dtypes
import numpy as np

from tinygpt_tpu.utils.logging import get_logger

log = get_logger("hf.safetensors")

# dtype table mirrors the reference's string set (SafeTensors.cpp:25-59)
# extended with the quantized/8-bit types the TPU engine needs.
_STR_TO_DTYPE = {
    "F64": np.dtype(np.float64),
    "F32": np.dtype(np.float32),
    "F16": np.dtype(np.float16),
    "BF16": np.dtype(ml_dtypes.bfloat16),
    "I64": np.dtype(np.int64),
    "I32": np.dtype(np.int32),
    "I16": np.dtype(np.int16),
    "I8": np.dtype(np.int8),
    "U8": np.dtype(np.uint8),
    "U16": np.dtype(np.uint16),
    "U32": np.dtype(np.uint32),
    "BOOL": np.dtype(np.bool_),
    "F8_E4M3": np.dtype(ml_dtypes.float8_e4m3fn),
    "F8_E5M2": np.dtype(ml_dtypes.float8_e5m2),
}
_DTYPE_TO_STR = {v: k for k, v in _STR_TO_DTYPE.items()}


class SafeTensorsError(ValueError):
    pass


def _read_header(path: str) -> Tuple[dict, int]:
    with open(path, "rb") as f:
        raw = f.read(8)
        if len(raw) != 8:
            raise SafeTensorsError(f"{path}: truncated header length")
        (header_len,) = struct.unpack("<Q", raw)
        if header_len > 100 * 1024 * 1024:
            raise SafeTensorsError(f"{path}: implausible header size {header_len}")
        header = json.loads(f.read(header_len))
    return header, 8 + header_len


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Load one .safetensors file as a dict of zero-copy numpy views.

    The returned arrays alias a read-only np.memmap; callers must copy (or
    device_put) before the mapping should be considered releasable.
    """
    header, data_offset = _read_header(path)
    header.pop("__metadata__", None)
    mm = np.memmap(path, dtype=np.uint8, mode="r")
    out: Dict[str, np.ndarray] = {}
    for name, info in header.items():
        dtype = _STR_TO_DTYPE.get(info["dtype"])
        if dtype is None:
            raise SafeTensorsError(f"{path}: unsupported dtype {info['dtype']!r}")
        shape = tuple(info["shape"])
        begin, end = info["data_offsets"]
        nbytes = int(np.prod(shape, dtype=np.int64)) * dtype.itemsize if shape else dtype.itemsize
        if end - begin != nbytes:
            raise SafeTensorsError(
                f"{path}: {name}: data_offsets span {end - begin} != "
                f"shape/dtype nbytes {nbytes}"
            )
        view = mm[data_offset + begin : data_offset + end].view(dtype)
        out[name] = view.reshape(shape)
    return out


def load_safetensors_dir(model_dir: str) -> Dict[str, np.ndarray]:
    """Load all weights from an HF model dir: either `model.safetensors` or
    the sharded `model.safetensors.index.json` (reference:
    SafeTensors.cpp:231-280). Arbitrary *.safetensors fallback included."""
    index_path = os.path.join(model_dir, "model.safetensors.index.json")
    single_path = os.path.join(model_dir, "model.safetensors")
    out: Dict[str, np.ndarray] = {}
    if os.path.exists(index_path):
        with open(index_path, "r", encoding="utf-8") as f:
            index = json.load(f)
        weight_map: Dict[str, str] = index["weight_map"]
        by_shard: Dict[str, list] = {}
        for key, shard in weight_map.items():
            by_shard.setdefault(shard, []).append(key)
        for shard, keys in sorted(by_shard.items()):
            tensors = load_safetensors(os.path.join(model_dir, shard))
            for k in keys:
                if k not in tensors:
                    raise SafeTensorsError(f"{shard}: index promises {k!r}, absent")
                out[k] = tensors[k]
        return out
    if os.path.exists(single_path):
        return load_safetensors(single_path)
    shards = sorted(
        f for f in os.listdir(model_dir) if f.endswith(".safetensors")
    )
    if not shards:
        raise FileNotFoundError(f"no .safetensors files in {model_dir}")
    for shard in shards:
        out.update(load_safetensors(os.path.join(model_dir, shard)))
    return out


def save_safetensors(
    path: str,
    tensors: Dict[str, np.ndarray],
    metadata: Optional[Dict[str, str]] = None,
) -> None:
    """Write a .safetensors file (reference: SafeTensors.cpp:61-122)."""
    header: Dict[str, dict] = {}
    if metadata:
        header["__metadata__"] = dict(metadata)
    offset = 0
    arrays = []
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        dt = _DTYPE_TO_STR.get(arr.dtype)
        if dt is None:
            raise SafeTensorsError(f"{name}: unsupported dtype {arr.dtype}")
        nbytes = arr.nbytes
        header[name] = {
            "dtype": dt,
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + nbytes],
        }
        arrays.append(arr)
        offset += nbytes
    hjson = json.dumps(header, separators=(",", ":")).encode("utf-8")
    # pad header to 8-byte alignment so tensor data is aligned
    pad = (-(8 + len(hjson))) % 8
    hjson += b" " * pad
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for arr in arrays:
            f.write(arr.tobytes())


def match_state(
    loaded: Dict[str, np.ndarray],
    expected: Dict[str, Tuple[tuple, Optional[np.dtype]]],
    strict: bool = False,
    consume: Optional[Callable[[str, np.ndarray], None]] = None,
) -> Tuple[list, list]:
    """Validate loaded tensors against an expected name→(shape, dtype) map,
    mirroring the reference's namedStates matching with strict/non-strict
    missing/unexpected-key warnings (SafeTensors.cpp:177-225).

    Returns (missing_keys, unexpected_keys); raises under strict=True.
    """
    missing = [k for k in expected if k not in loaded]
    unexpected = [k for k in loaded if k not in expected]
    for k, (shape, dtype) in expected.items():
        if k not in loaded:
            continue
        arr = loaded[k]
        if tuple(arr.shape) != tuple(shape):
            raise SafeTensorsError(
                f"{k}: shape mismatch, file {tuple(arr.shape)} vs model {tuple(shape)}"
            )
        if consume is not None:
            consume(k, arr)
    if missing:
        msg = f"missing keys: {missing[:8]}{'...' if len(missing) > 8 else ''}"
        if strict:
            raise SafeTensorsError(msg)
        log.warning(msg)
    if unexpected:
        msg = (
            f"unexpected keys: {unexpected[:8]}"
            f"{'...' if len(unexpected) > 8 else ''}"
        )
        if strict:
            raise SafeTensorsError(msg)
        log.warning(msg)
    return missing, unexpected
