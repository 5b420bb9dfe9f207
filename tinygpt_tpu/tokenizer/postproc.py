"""Post-processors: TemplateProcessing, ByteLevel (id-level no-op), Sequence.

Capability parity with /root/reference/src/tokenizer/
TemplateProcessing.{h,cpp}: the single-sequence template of SpecialToken /
Sequence elements (adds e.g. BOS). Pair templates are parsed and applied
too (the reference left pairs as a TODO, TemplateProcessing.cpp:41-42).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple


class TemplateProcessing:
    def __init__(
        self,
        single: List[dict],
        pair: Optional[List[dict]] = None,
        special_tokens: Optional[Dict[str, dict]] = None,
    ):
        self.single = single or []
        self.pair = pair or []
        self.special_tokens = special_tokens or {}

    def _emit(self, template: List[dict], a: List[int],
              b: Optional[List[int]], add_special_tokens: bool) -> List[int]:
        out: List[int] = []
        for el in template:
            if "SpecialToken" in el:
                if add_special_tokens:
                    name = el["SpecialToken"]["id"]
                    spec = self.special_tokens.get(name)
                    if spec is None:
                        raise ValueError(
                            f"template references unknown special token {name!r}"
                        )
                    out.extend(int(i) for i in spec["ids"])
            elif "Sequence" in el:
                seq_id = el["Sequence"].get("id", "A")
                out.extend(a if seq_id == "A" else (b or []))
        return out

    def process(self, ids: List[int], pair_ids: Optional[List[int]] = None,
                add_special_tokens: bool = True) -> List[int]:
        if pair_ids is not None and self.pair:
            return self._emit(self.pair, ids, pair_ids, add_special_tokens)
        return self._emit(self.single, ids, None, add_special_tokens)


class ByteLevelPostProcessor:
    """ByteLevel post-processor only adjusts offsets in HF; token ids pass
    through unchanged."""

    def process(self, ids: List[int], pair_ids=None,
                add_special_tokens: bool = True) -> List[int]:
        return list(ids) + (list(pair_ids) if pair_ids else [])


class PostProcessorSequence:
    def __init__(self, processors: list):
        self.processors = processors

    def process(self, ids: List[int], pair_ids=None,
                add_special_tokens: bool = True) -> List[int]:
        for p in self.processors:
            ids = p.process(ids, pair_ids, add_special_tokens)
            pair_ids = None  # consumed by the first processor that uses it
        return ids
