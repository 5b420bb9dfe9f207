"""Split pre-tokenizer with the HF delimiter behaviors.

Capability parity with /root/reference/src/tokenizer/Split.{h,cpp}:
REMOVED / ISOLATED / MERGED_WITH_PREVIOUS / MERGED_WITH_NEXT / CONTIGUOUS,
plus `invert` (treat matches themselves as the pieces).
"""

from __future__ import annotations

from typing import List

import regex as re

BEHAVIORS = (
    "Removed",
    "Isolated",
    "MergedWithPrevious",
    "MergedWithNext",
    "Contiguous",
)


class SplitPreTokenizer:
    def __init__(self, pattern: str, behavior: str = "Isolated",
                 invert: bool = False, is_literal: bool = False):
        if behavior not in BEHAVIORS:
            raise ValueError(f"unknown split behavior {behavior!r}")
        self.behavior = behavior
        self.invert = invert
        self.pattern_str = pattern
        self._re = re.compile(re.escape(pattern) if is_literal else pattern)

    def split_one(self, text: str) -> List[str]:
        if not text:
            return []
        if self.invert:
            # pieces are the matches themselves; gaps are dropped
            return [m.group() for m in self._re.finditer(text) if m.group()]
        spans = [(m.start(), m.end()) for m in self._re.finditer(text)
                 if m.end() > m.start()]
        if not spans:
            return [text]
        behavior = self.behavior
        if behavior == "Contiguous":
            merged = [spans[0]]
            for s, e in spans[1:]:
                if s == merged[-1][1]:
                    merged[-1] = (merged[-1][0], e)
                else:
                    merged.append((s, e))
            spans = merged

        pieces: List[str] = []
        pos = 0
        pending = ""  # delimiter awaiting its next gap (MergedWithNext)
        for s, e in spans:
            gap = text[pos:s]
            delim = text[s:e]
            pos = e
            if behavior == "Removed":
                if gap:
                    pieces.append(gap)
            elif behavior in ("Isolated", "Contiguous"):
                if gap:
                    pieces.append(gap)
                pieces.append(delim)
            elif behavior == "MergedWithPrevious":
                pieces.append(gap + delim)
            else:  # MergedWithNext
                piece = pending + gap
                if piece:
                    pieces.append(piece)
                pending = delim
        tail = text[pos:]
        if behavior == "MergedWithNext":
            if pending + tail:
                pieces.append(pending + tail)
        elif tail:
            pieces.append(tail)
        return pieces

    def pre_tokenize(self, pieces: List[str], is_first: bool = True) -> List[str]:
        out: List[str] = []
        for p in pieces:
            out.extend(self.split_one(p))
        return out
