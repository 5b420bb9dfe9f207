"""Normalizers: unicode forms, Replace, Prepend, Strip, Lowercase, Sequence.

Capability parity with /root/reference/src/tokenizer/UnicodeNorm.{h,cpp}
(NFC/NFD/NFKC/NFKD via utf8proc) and the normalizer role of
Replace.{h,cpp}; Python's unicodedata provides the same tables.
"""

from __future__ import annotations

import unicodedata
from typing import List, Optional

import regex as re


class UnicodeNormalizer:
    def __init__(self, form: str):
        if form not in ("NFC", "NFD", "NFKC", "NFKD"):
            raise ValueError(f"bad unicode form {form!r}")
        self.form = form

    def normalize(self, text: str) -> str:
        return unicodedata.normalize(self.form, text)


class ReplaceNormalizer:
    """Replace by literal string or regex pattern (lazy-compiled, mirroring
    reference Replace.cpp:15-26)."""

    def __init__(self, content: str, pattern: Optional[str] = None,
                 literal: Optional[str] = None):
        self.content = content
        self._literal = literal
        self._pattern = pattern
        self._re = None

    def normalize(self, text: str) -> str:
        if self._literal is not None:
            return text.replace(self._literal, self.content)
        if self._re is None:
            self._re = re.compile(self._pattern)
        return self._re.sub(self.content, text)

    # the same component also acts as a decoder in HF pipelines
    def decode_chain(self, tokens: List[str]) -> List[str]:
        return [self.normalize(t) for t in tokens]


class PrependNormalizer:
    def __init__(self, prepend: str):
        self.prepend = prepend

    def normalize(self, text: str) -> str:
        return self.prepend + text if text else text


class StripNormalizer:
    def __init__(self, strip_left: bool = True, strip_right: bool = True):
        self.strip_left = strip_left
        self.strip_right = strip_right

    def normalize(self, text: str) -> str:
        if self.strip_left:
            text = text.lstrip()
        if self.strip_right:
            text = text.rstrip()
        return text


class LowercaseNormalizer:
    def normalize(self, text: str) -> str:
        return text.lower()


class NormalizerSequence:
    def __init__(self, normalizers: list):
        self.normalizers = normalizers

    def normalize(self, text: str) -> str:
        for n in self.normalizers:
            text = n.normalize(text)
        return text
