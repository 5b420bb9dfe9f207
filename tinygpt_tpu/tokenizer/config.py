"""tokenizer.json / tokenizer_config.json parsing and component factory.

Capability parity with /root/reference/src/huggingface/TokenizerConfig.{h,cpp}:
recursive Sequence support across normalizer / pre_tokenizer / model /
post_processor / decoder sections, merges accepted as "a b" strings or
[a, b] arrays, added_tokens, and tokenizer_config.json (bos/eos/pad token
objects, add_bos/add_eos, chat_template).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

from tinygpt_tpu.tokenizer.bpe import BPE
from tinygpt_tpu.tokenizer.byte_level import (
    ByteLevelDecoder,
    ByteLevelPreTokenizer,
)
from tinygpt_tpu.tokenizer.decoders import (
    ByteFallbackDecoder,
    DecoderSequence,
    FuseDecoder,
    StripDecoder,
)
from tinygpt_tpu.tokenizer.metaspace import Metaspace
from tinygpt_tpu.tokenizer.normalizers import (
    LowercaseNormalizer,
    NormalizerSequence,
    PrependNormalizer,
    ReplaceNormalizer,
    StripNormalizer,
    UnicodeNormalizer,
)
from tinygpt_tpu.tokenizer.postproc import (
    ByteLevelPostProcessor,
    PostProcessorSequence,
    TemplateProcessing,
)
from tinygpt_tpu.tokenizer.split import SplitPreTokenizer
from tinygpt_tpu.utils.logging import get_logger

log = get_logger("tokenizer.config")


@dataclass
class AddedToken:
    id: int
    content: str
    special: bool = False
    lstrip: bool = False
    rstrip: bool = False
    normalized: bool = False
    single_word: bool = False


@dataclass
class TokenizerConfig:
    """Everything parsed from a tokenizer dir."""

    normalizer: Any = None
    pre_tokenizer: Any = None
    model: Optional[BPE] = None
    post_processor: Any = None
    decoder: Any = None
    added_tokens: List[AddedToken] = field(default_factory=list)
    vocab: Dict[str, int] = field(default_factory=dict)

    # tokenizer_config.json
    add_bos_token: Optional[bool] = None
    add_eos_token: Optional[bool] = None
    bos_token: Optional[str] = None
    eos_token: Optional[str] = None
    pad_token: Optional[str] = None
    unk_token: Optional[str] = None
    chat_template: Optional[str] = None
    model_max_length: Optional[int] = None


def _pattern_of(obj: dict) -> Tuple[str, bool]:
    """HF pattern objects: {"String": lit} or {"Regex": pat}."""
    pat = obj.get("pattern", {})
    if "String" in pat:
        return pat["String"], True
    if "Regex" in pat:
        return pat["Regex"], False
    raise ValueError(f"unsupported pattern {pat!r}")


def create_normalizer(obj: Optional[dict]):
    if obj is None:
        return None
    t = obj.get("type")
    if t == "Sequence":
        return NormalizerSequence(
            [create_normalizer(o) for o in obj.get("normalizers", [])]
        )
    if t in ("NFC", "NFD", "NFKC", "NFKD"):
        return UnicodeNormalizer(t)
    if t == "Replace":
        pat, literal = _pattern_of(obj)
        return ReplaceNormalizer(
            content=obj.get("content", ""),
            pattern=None if literal else pat,
            literal=pat if literal else None,
        )
    if t == "Prepend":
        return PrependNormalizer(obj.get("prepend", ""))
    if t == "Strip":
        return StripNormalizer(
            strip_left=obj.get("strip_left", True),
            strip_right=obj.get("strip_right", True),
        )
    if t == "Lowercase":
        return LowercaseNormalizer()
    raise ValueError(f"unsupported normalizer type {t!r}")


def create_pre_tokenizer(obj: Optional[dict]):
    if obj is None:
        return None
    t = obj.get("type")
    if t == "Sequence":
        parts = [create_pre_tokenizer(o) for o in obj.get("pretokenizers", [])]

        class _Seq:
            def __init__(self, parts):
                self.parts = parts

            def pre_tokenize(self, pieces, is_first=True):
                for p in self.parts:
                    pieces = p.pre_tokenize(pieces, is_first=is_first)
                return pieces

        return _Seq(parts)
    if t == "ByteLevel":
        return ByteLevelPreTokenizer(
            add_prefix_space=obj.get("add_prefix_space", False),
            use_regex=obj.get("use_regex", True),
        )
    if t == "Split":
        pat, literal = _pattern_of(obj)
        return SplitPreTokenizer(
            pattern=pat,
            behavior=obj.get("behavior", "Isolated"),
            invert=obj.get("invert", False),
            is_literal=literal,
        )
    if t == "Metaspace":
        return Metaspace(
            replacement=obj.get("replacement", "▁"),
            prepend_scheme=obj.get(
                "prepend_scheme",
                "always" if obj.get("add_prefix_space", True) else "never",
            ),
            split=obj.get("split", True),
        )
    raise ValueError(f"unsupported pre_tokenizer type {t!r}")


def create_model(obj: dict) -> BPE:
    t = obj.get("type", "BPE")
    if t not in ("BPE", None):
        raise ValueError(f"unsupported tokenizer model type {t!r}")
    merges: List[Tuple[str, str]] = []
    for m in obj.get("merges", []):
        if isinstance(m, str):
            a, _, b = m.partition(" ")
            merges.append((a, b))
        else:
            merges.append((m[0], m[1]))
    return BPE(
        vocab=obj["vocab"],
        merges=merges,
        unk_token=obj.get("unk_token"),
        continuing_subword_prefix=obj.get("continuing_subword_prefix") or "",
        end_of_word_suffix=obj.get("end_of_word_suffix") or "",
        fuse_unk=bool(obj.get("fuse_unk", False)),
        byte_fallback=bool(obj.get("byte_fallback", False)),
        ignore_merges=bool(obj.get("ignore_merges", False)),
    )


def create_post_processor(obj: Optional[dict]):
    if obj is None:
        return None
    t = obj.get("type")
    if t == "Sequence":
        return PostProcessorSequence(
            [create_post_processor(o) for o in obj.get("processors", [])]
        )
    if t == "ByteLevel":
        return ByteLevelPostProcessor()
    if t == "TemplateProcessing":
        return TemplateProcessing(
            single=obj.get("single", []),
            pair=obj.get("pair", []),
            special_tokens=obj.get("special_tokens", {}),
        )
    raise ValueError(f"unsupported post_processor type {t!r}")


def create_decoder(obj: Optional[dict]):
    if obj is None:
        return None
    t = obj.get("type")
    if t == "Sequence":
        return DecoderSequence(
            [create_decoder(o) for o in obj.get("decoders", [])]
        )
    if t == "ByteLevel":
        return ByteLevelDecoder()
    if t == "ByteFallback":
        return ByteFallbackDecoder()
    if t == "Fuse":
        return FuseDecoder()
    if t == "Strip":
        return StripDecoder(
            content=obj.get("content", " "),
            start=int(obj.get("start", 0)),
            stop=int(obj.get("stop", 0)),
        )
    if t == "Replace":
        pat, literal = _pattern_of(obj)
        return ReplaceNormalizer(
            content=obj.get("content", ""),
            pattern=None if literal else pat,
            literal=pat if literal else None,
        )
    if t == "Metaspace":
        return Metaspace(
            replacement=obj.get("replacement", "▁"),
            prepend_scheme=obj.get(
                "prepend_scheme",
                "always" if obj.get("add_prefix_space", True) else "never",
            ),
            split=obj.get("split", True),
        )
    raise ValueError(f"unsupported decoder type {t!r}")


def _token_str(v: Any) -> Optional[str]:
    """tokenizer_config token entries are either strings or AddedToken
    objects with a `content` field."""
    if v is None:
        return None
    if isinstance(v, str):
        return v
    if isinstance(v, dict):
        return v.get("content")
    return None


def load_tokenizer_config(
    tokenizer_json_path: str,
    tokenizer_config_json_path: Optional[str] = None,
) -> TokenizerConfig:
    with open(tokenizer_json_path, "r", encoding="utf-8") as f:
        tj = json.load(f)

    cfg = TokenizerConfig(
        normalizer=create_normalizer(tj.get("normalizer")),
        pre_tokenizer=create_pre_tokenizer(tj.get("pre_tokenizer")),
        model=create_model(tj["model"]),
        post_processor=create_post_processor(tj.get("post_processor")),
        decoder=create_decoder(tj.get("decoder")),
        vocab=tj["model"]["vocab"],
    )
    for at in tj.get("added_tokens", []):
        cfg.added_tokens.append(
            AddedToken(
                id=int(at["id"]),
                content=at["content"],
                special=bool(at.get("special", False)),
                lstrip=bool(at.get("lstrip", False)),
                rstrip=bool(at.get("rstrip", False)),
                normalized=bool(at.get("normalized", False)),
                single_word=bool(at.get("single_word", False)),
            )
        )

    if tokenizer_config_json_path and os.path.exists(tokenizer_config_json_path):
        with open(tokenizer_config_json_path, "r", encoding="utf-8") as f:
            tc = json.load(f)
        cfg.add_bos_token = tc.get("add_bos_token")
        cfg.add_eos_token = tc.get("add_eos_token")
        cfg.bos_token = _token_str(tc.get("bos_token"))
        cfg.eos_token = _token_str(tc.get("eos_token"))
        cfg.pad_token = _token_str(tc.get("pad_token"))
        cfg.unk_token = _token_str(tc.get("unk_token"))
        cfg.chat_template = tc.get("chat_template")
        mml = tc.get("model_max_length")
        if isinstance(mml, (int, float)) and mml < 1e15:
            cfg.model_max_length = int(mml)
    return cfg
