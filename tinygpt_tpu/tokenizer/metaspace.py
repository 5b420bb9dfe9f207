"""Metaspace pre-tokenizer + decoder (SentencePiece ▁ convention).

Capability parity with /root/reference/src/tokenizer/Metaspace.{h,cpp}:
space→replacement mapping, prepend schemes always/first/never, optional
splitting on the replacement, and the inverse decoder.
"""

from __future__ import annotations

from typing import List


class Metaspace:
    def __init__(self, replacement: str = "▁",
                 prepend_scheme: str = "always", split: bool = True):
        if prepend_scheme not in ("always", "first", "never"):
            raise ValueError(f"bad prepend_scheme {prepend_scheme!r}")
        self.replacement = replacement
        self.prepend_scheme = prepend_scheme
        self.split = split

    # -- pre-tokenizer -----------------------------------------------------

    def pre_tokenize(self, pieces: List[str], is_first: bool = True) -> List[str]:
        """`is_first` is True only when these pieces start at offset 0 of
        the original text — the "first" prepend scheme checks the original
        offset, so segments after a split-out special token never get the
        prepend (HF semantics)."""
        out: List[str] = []
        first = is_first
        for piece in pieces:
            text = piece.replace(" ", self.replacement)
            prepend = self.prepend_scheme == "always" or (
                self.prepend_scheme == "first" and first
            )
            if prepend and not text.startswith(self.replacement):
                text = self.replacement + text
            first = False
            if self.split:
                out.extend(self._split_on_replacement(text))
            elif text:
                out.append(text)
        return out

    def _split_on_replacement(self, text: str) -> List[str]:
        """Split keeping each ▁ attached to the following content
        (MergedWithNext semantics, matching HF Metaspace split=True)."""
        r = self.replacement
        out: List[str] = []
        cur = ""
        i = 0
        n = len(text)
        rl = len(r)
        while i < n:
            if text.startswith(r, i):
                if cur:
                    out.append(cur)
                cur = r
                i += rl
            else:
                cur += text[i]
                i += 1
        if cur:
            out.append(cur)
        return out

    # -- decoder -----------------------------------------------------------

    def decode_chain(self, tokens: List[str]) -> List[str]:
        out: List[str] = []
        for i, tok in enumerate(tokens):
            t = tok.replace(self.replacement, " ")
            if i == 0 and t.startswith(" ") and self.prepend_scheme != "never":
                t = t[1:]
            out.append(t)
        return out
