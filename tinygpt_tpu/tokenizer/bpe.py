"""BPE model.

Capability parity with /root/reference/src/tokenizer/BPE.{h,cpp}:
rank-ordered merge loop, `ignore_merges` direct-vocab hit, `<0xXX>`
byte-fallback, unk handling with fuse_unk, and a bounded piece→ids cache.

The reference keeps two algorithms (array scan for short pieces, heap +
linked list for long ones, BPE.cpp:137-138). Here one heap + linked-list
implementation covers both; Python-level speed comes from the cache (words
repeat heavily) and, for bulk throughput, the optional C++ core in csrc/.
"""

from __future__ import annotations

import heapq
from typing import Dict, List, Optional, Tuple


class BPE:
    def __init__(
        self,
        vocab: Dict[str, int],
        merges: List[Tuple[str, str]],
        unk_token: Optional[str] = None,
        continuing_subword_prefix: str = "",
        end_of_word_suffix: str = "",
        fuse_unk: bool = False,
        byte_fallback: bool = False,
        ignore_merges: bool = False,
        cache_capacity: int = 128 * 1024,
        max_cached_piece_len: int = 64,
    ):
        self.vocab = vocab
        self.id_to_token = {i: t for t, i in vocab.items()}
        self.merge_ranks: Dict[Tuple[str, str], int] = {
            pair: rank for rank, pair in enumerate(merges)
        }
        self.unk_token = unk_token
        self.unk_id = vocab.get(unk_token) if unk_token else None
        self.continuing_subword_prefix = continuing_subword_prefix
        self.end_of_word_suffix = end_of_word_suffix
        self.fuse_unk = fuse_unk
        self.byte_fallback = byte_fallback
        self.ignore_merges = ignore_merges
        self._cache: Dict[str, Tuple[int, ...]] = {}
        self._cache_capacity = cache_capacity
        self._max_cached_piece_len = max_cached_piece_len

    # -- encoding ----------------------------------------------------------

    def tokenize(self, piece: str) -> List[int]:
        """BPE-encode one pre-tokenized piece into ids."""
        if not piece:
            return []
        if self.ignore_merges:
            direct = self.vocab.get(piece)
            if direct is not None:
                return [direct]
        cacheable = len(piece) <= self._max_cached_piece_len
        if cacheable:
            hit = self._cache.get(piece)
            if hit is not None:
                return list(hit)
        ids = self._encode_uncached(piece)
        if cacheable:
            if len(self._cache) >= self._cache_capacity:
                self._cache.clear()
            self._cache[piece] = tuple(ids)
        return ids

    def _initial_symbols(self, piece: str) -> List[str]:
        chars = list(piece)
        if self.continuing_subword_prefix:
            chars = [chars[0]] + [
                self.continuing_subword_prefix + c for c in chars[1:]
            ]
        if self.end_of_word_suffix and chars:
            chars[-1] = chars[-1] + self.end_of_word_suffix
        return chars

    def _encode_uncached(self, piece: str) -> List[int]:
        syms = self._initial_symbols(piece)
        n = len(syms)
        if n > 1:
            syms = self._merge(syms)
        return self._symbols_to_ids(syms)

    def _merge(self, syms: List[str]) -> List[str]:
        """Heap + doubly-linked-list merge: always apply the lowest-rank
        adjacent pair. Stale heap entries are skipped by revalidation."""
        ranks = self.merge_ranks
        n = len(syms)
        nxt = list(range(1, n)) + [-1]
        prv = [-1] + list(range(n - 1))
        alive = [True] * n
        heap: List[Tuple[int, int, str, str]] = []
        for i in range(n - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None:
                heap.append((r, i, syms[i], syms[i + 1]))
        heapq.heapify(heap)
        while heap:
            r, i, a, b = heapq.heappop(heap)
            if not alive[i] or syms[i] != a:
                continue
            j = nxt[i]
            if j == -1 or not alive[j] or syms[j] != b:
                continue
            # merge j into i
            syms[i] = a + b
            alive[j] = False
            nxt[i] = nxt[j]
            if nxt[j] != -1:
                prv[nxt[j]] = i
            p = prv[i]
            if p != -1:
                rr = ranks.get((syms[p], syms[i]))
                if rr is not None:
                    heapq.heappush(heap, (rr, p, syms[p], syms[i]))
            q = nxt[i]
            if q != -1:
                rr = ranks.get((syms[i], syms[q]))
                if rr is not None:
                    heapq.heappush(heap, (rr, i, syms[i], syms[q]))
        return [syms[i] for i in range(n) if alive[i]]

    def _symbols_to_ids(self, syms: List[str]) -> List[int]:
        ids: List[int] = []
        last_was_unk = False
        for s in syms:
            tid = self.vocab.get(s)
            if tid is not None:
                ids.append(tid)
                last_was_unk = False
                continue
            if self.byte_fallback:
                fallback = [
                    self.vocab.get(f"<0x{b:02X}>") for b in s.encode("utf-8")
                ]
                if all(f is not None for f in fallback):
                    ids.extend(fallback)
                    last_was_unk = False
                    continue
            if self.unk_id is not None:
                if not (self.fuse_unk and last_was_unk):
                    ids.append(self.unk_id)
                last_was_unk = True
            # no unk: drop the symbol (HF behavior)
        return ids

    # -- decoding ----------------------------------------------------------

    def token_str(self, token_id: int) -> Optional[str]:
        return self.id_to_token.get(token_id)
