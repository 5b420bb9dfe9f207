"""ByteLevel alphabet, pre-tokenizer and decoder.

Capability parity with /root/reference/src/tokenizer/ByteLevel.{h,cpp}:
the GPT-2 byte<->unicode bijection, regex pre-tokenization with
add_prefix_space, UTF-8-safe decode back to bytes, and the incomplete-tail
scan used by streaming decode.
"""

from __future__ import annotations

from typing import List, Optional

import regex as re

# GPT-2 split pattern (public constant from the byte-level BPE paper/impl).
GPT2_SPLIT_PATTERN = (
    r"""'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
)
_GPT2_RE = re.compile(GPT2_SPLIT_PATTERN)


def _build_byte_to_unicode() -> dict:
    """The GPT-2 bijection: printable bytes map to themselves, the rest to
    U+0100.. (reference: ByteLevel.cpp:25-77)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(0xA1, 0xAC + 1))
        + list(range(0xAE, 0xFF + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {b: chr(c) for b, c in zip(bs, cs)}


BYTE_TO_UNICODE = _build_byte_to_unicode()
UNICODE_TO_BYTE = {c: b for b, c in BYTE_TO_UNICODE.items()}


def bytes_to_unicode_str(data: bytes) -> str:
    """Map raw bytes to the byte-level unicode alphabet."""
    return "".join(BYTE_TO_UNICODE[b] for b in data)


def unicode_str_to_bytes(s: str) -> bytes:
    """Inverse map; characters outside the alphabet pass through UTF-8
    encoded (HF behavior for malformed vocab entries)."""
    out = bytearray()
    for ch in s:
        b = UNICODE_TO_BYTE.get(ch)
        if b is None:
            out.extend(ch.encode("utf-8"))
        else:
            out.append(b)
    return bytes(out)


class ByteLevelPreTokenizer:
    """`{"type": "ByteLevel", "add_prefix_space": ..., "use_regex": ...}`"""

    def __init__(self, add_prefix_space: bool = False, use_regex: bool = True):
        self.add_prefix_space = add_prefix_space
        self.use_regex = use_regex

    def pre_tokenize(self, pieces: List[str], is_first: bool = True) -> List[str]:
        out: List[str] = []
        for idx, piece in enumerate(pieces):
            if self.add_prefix_space and piece and not piece.startswith(" "):
                piece = " " + piece
            if self.use_regex:
                for m in _GPT2_RE.finditer(piece):
                    out.append(bytes_to_unicode_str(m.group().encode("utf-8")))
            else:
                if piece:
                    out.append(bytes_to_unicode_str(piece.encode("utf-8")))
        return out


class ByteLevelDecoder:
    """Decoder: join byte-level tokens and re-interpret as UTF-8 bytes.

    The byte join happens across the whole token chain — multi-byte UTF-8
    characters straddle token boundaries (reference: ByteLevel.cpp:79-109)."""

    def decode_chain(self, tokens: List[str]) -> List[str]:
        if not tokens:
            return []
        data = b"".join(unicode_str_to_bytes(t) for t in tokens)
        return [data.decode("utf-8", errors="replace")]

    def decode_bytes(self, tokens: List[str]) -> bytes:
        return b"".join(unicode_str_to_bytes(t) for t in tokens)


def incomplete_utf8_tail_len(data: bytes) -> int:
    """Number of trailing bytes forming an incomplete UTF-8 sequence
    (reference: ByteLevel.cpp:111-130 and server/ServerUtils.cpp:15-59).
    Returns 0 when the buffer ends on a complete character."""
    n = len(data)
    # scan back at most 3 bytes for a lead byte
    for back in range(1, min(4, n + 1)):
        b = data[n - back]
        if b & 0b1100_0000 == 0b1000_0000:  # continuation byte, keep scanning
            continue
        # lead byte: how many bytes should the sequence have?
        if b & 0b1000_0000 == 0:
            need = 1
        elif b & 0b1110_0000 == 0b1100_0000:
            need = 2
        elif b & 0b1111_0000 == 0b1110_0000:
            need = 3
        elif b & 0b1111_1000 == 0b1111_0000:
            need = 4
        else:  # invalid lead; treat as complete garbage
            return 0
        return back if back < need else 0
    return 0
