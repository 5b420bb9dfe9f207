"""Structured logging for the framework.

Replaces the reference's printf-style LOGI/LOGW/LOGE macros
(TinyTorch Utils/Logger.h, used throughout /root/reference/src) with
stdlib logging configured once, plus a `repr_str` escape helper mirroring
the reference's util/StringUtils.h `repr`.
"""

from __future__ import annotations

import logging
import os
import sys

_CONFIGURED = False


def _configure() -> None:
    global _CONFIGURED
    if _CONFIGURED:
        return
    level = os.environ.get("TINYGPT_LOG_LEVEL", "INFO").upper()
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(
        logging.Formatter(
            "%(asctime)s.%(msecs)03d %(levelname).1s %(name)s: %(message)s",
            datefmt="%H:%M:%S",
        )
    )
    root = logging.getLogger("tinygpt_tpu")
    root.setLevel(level)
    root.addHandler(handler)
    root.propagate = False
    _CONFIGURED = True


def get_logger(name: str) -> logging.Logger:
    _configure()
    if not name.startswith("tinygpt_tpu"):
        name = f"tinygpt_tpu.{name}"
    return logging.getLogger(name)


def repr_str(s: str, max_len: int = 200) -> str:
    """Escape a string for log output (reference: src/util/StringUtils.h)."""
    r = repr(s)
    if len(r) > max_len:
        r = r[: max_len - 3] + "..."
    return r
