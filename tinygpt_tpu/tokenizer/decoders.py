"""Decoders: ByteFallback, Fuse, Strip, Sequence (+ ByteLevel in
byte_level.py, Replace in normalizers.py, Metaspace in metaspace.py).

Capability parity with /root/reference/src/tokenizer/
{ByteFallback,Fuse,Strip}.{h,cpp} and the decoder Sequence handling in
Base.cpp.
"""

from __future__ import annotations

from typing import List


class ByteFallbackDecoder:
    """Collect `<0xXX>` tokens into byte runs; invalid UTF-8 becomes one
    U+FFFD per byte (reference: ByteFallback.cpp:13-62)."""

    @staticmethod
    def _byte_of(token: str):
        if (
            len(token) == 6
            and token.startswith("<0x")
            and token.endswith(">")
        ):
            try:
                return int(token[3:5], 16)
            except ValueError:
                return None
        return None

    def decode_chain(self, tokens: List[str]) -> List[str]:
        out: List[str] = []
        run = bytearray()

        def flush():
            if not run:
                return
            try:
                out.append(run.decode("utf-8"))
            except UnicodeDecodeError:
                out.extend("�" for _ in run)
            run.clear()

        for tok in tokens:
            b = self._byte_of(tok)
            if b is not None:
                run.append(b)
            else:
                flush()
                out.append(tok)
        flush()
        return out


class FuseDecoder:
    """Concatenate all pieces into one (reference: Fuse.cpp)."""

    def decode_chain(self, tokens: List[str]) -> List[str]:
        return ["".join(tokens)] if tokens else []


class StripDecoder:
    """Strip up to `start`/`stop` copies of `content` from the first/last
    piece edges (reference: Strip.cpp)."""

    def __init__(self, content: str, start: int = 0, stop: int = 0):
        self.content = content
        self.start = start
        self.stop = stop

    def decode_chain(self, tokens: List[str]) -> List[str]:
        out: List[str] = []
        for i, tok in enumerate(tokens):
            t = tok
            if i == 0:
                for _ in range(self.start):
                    if t.startswith(self.content):
                        t = t[len(self.content):]
                    else:
                        break
            if i == len(tokens) - 1:
                for _ in range(self.stop):
                    if t.endswith(self.content):
                        t = t[: -len(self.content)]
                    else:
                        break
            out.append(t)
        return out


class DecoderSequence:
    def __init__(self, decoders: list):
        self.decoders = decoders

    def decode_chain(self, tokens: List[str]) -> List[str]:
        for d in self.decoders:
            tokens = d.decode_chain(tokens)
        return tokens
