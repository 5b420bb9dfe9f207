"""Tokenizer tests.

Mirrors the reference's test strategy (test/test_tokenizer.cpp): golden
token-id parity per model, round-trip decode equality, batch encode/decode,
split behaviors against literal expectations, byte-level config matrix,
long-text stress — with the HF `tokenizers` library as the golden oracle on
the same tokenizer.json files.
"""

import json
import random

import pytest

from tests.conftest import reference_asset
from tinygpt_tpu.tokenizer import Tokenizer
from tinygpt_tpu.tokenizer.byte_level import (
    ByteLevelPreTokenizer,
    bytes_to_unicode_str,
    incomplete_utf8_tail_len,
    unicode_str_to_bytes,
)
from tinygpt_tpu.tokenizer.split import SplitPreTokenizer

hf_tokenizers = pytest.importorskip("tokenizers")

CASES = [
    "Hello world!",
    " leading space and  double  spaces",
    "The quick brown fox jumps over the lazy dog. 1234567890",
    "naïve café — em–dash… 你好世界 🌍🚀 مرحبا بالعالم",
    "def f(x):\n    return x*2  # comment\n\ttabbed",
    "<|endoftext|> special <s> tokens </s> inline",
    "I'm can't won't it's we're you've they'll he'd",
    "ᚠᛇᚻ᛫ᛒᛦᚦ᛫ᚠᚱᚩᚠᚢᚱ",
    "",
    "    ",
    "a\nb\r\nc",
    "🇺🇸 flags 🇯🇵 and 👨‍👩‍👧‍👦 zwj families",
    "ṩ̣̇ combining",  # NFC-sensitive
]


def _load_pair(name):
    d = reference_asset(name)
    ours = Tokenizer.from_dir(d)
    golden = hf_tokenizers.Tokenizer.from_file(f"{d}/tokenizer.json")
    return ours, golden


@pytest.mark.parametrize("name", ["gpt2", "Mistral-7B-v0.3"])
def test_golden_parity_encode_decode(name):
    ours, golden = _load_pair(name)
    for text in CASES:
        ref = golden.encode(text).ids
        got = ours.encode(text)
        assert got == ref, f"{name}: encode mismatch on {text!r}"
        assert ours.decode(ref, skip_special_tokens=True) == golden.decode(ref)


@pytest.mark.parametrize("name", ["gpt2", "Mistral-7B-v0.3"])
def test_golden_parity_fuzz(name):
    ours, golden = _load_pair(name)
    rng = random.Random(1234)

    def rand_text(n):
        out = []
        for _ in range(n):
            r = rng.random()
            if r < 0.5:
                out.append(chr(rng.randint(32, 126)))
            elif r < 0.7:
                out.append(chr(rng.randint(0x4E00, 0x4FFF)))
            elif r < 0.85:
                out.append(rng.choice("🌍🚀😀é阿ü\t\n  "))
            else:
                out.append(rng.choice(["<|endoftext|>", "<s>", "</s>", " the"]))
        return "".join(out)

    for _ in range(200):
        text = rand_text(rng.randint(0, 80))
        ref = golden.encode(text).ids
        assert ours.encode(text) == ref, f"{name}: fuzz mismatch on {text!r}"
        assert ours.decode(ref, skip_special_tokens=True) == golden.decode(ref)


@pytest.mark.parametrize("name", ["gpt2", "Mistral-7B-v0.3"])
def test_streaming_decode_matches_full(name):
    ours, golden = _load_pair(name)
    text = "Hello 你好 🌍 world — émojis 🚀😀 and\nnewlines."
    ids = golden.encode(text).ids
    stream = ours.decode_stream(skip_special_tokens=True)
    chunks = [stream.step(i) for i in ids]
    chunks.append(stream.flush())
    assert "".join(chunks) == golden.decode(ids)
    # every prefix of the emitted stream must be valid text (no dangling
    # replacement chars mid-stream for valid input)
    acc = ""
    for c in chunks:
        acc += c
        assert "�" not in acc


def test_batch_encode_decode():
    ours, golden = _load_pair("gpt2")
    texts = CASES * 3
    enc = ours.encode_batch(texts, num_threads=4)
    assert enc == [golden.encode(t).ids for t in texts]
    dec = ours.decode_batch(enc, skip_special_tokens=True, num_threads=4)
    assert dec == [golden.decode(e) for e in enc]


def test_long_text_stress():
    """500KB of a repeated word must produce the exact repetition count
    (reference: test_tokenizer.cpp:250-262)."""
    ours, golden = _load_pair("gpt2")
    text = "hello " * (500_000 // 6)
    got = ours.encode(text)
    ref = golden.encode(text).ids
    assert got == ref


# -- split behaviors (reference: test_tokenizer.cpp:13-56) -----------------

def test_split_behaviors():
    text = "the-final--countdown"
    mk = lambda b: SplitPreTokenizer("-", behavior=b, is_literal=True)
    assert mk("Removed").split_one(text) == ["the", "final", "countdown"]
    assert mk("Isolated").split_one(text) == [
        "the", "-", "final", "-", "-", "countdown"]
    assert mk("MergedWithPrevious").split_one(text) == [
        "the-", "final-", "-", "countdown"]
    assert mk("MergedWithNext").split_one(text) == [
        "the", "-final", "-", "-countdown"]
    assert mk("Contiguous").split_one(text) == [
        "the", "-", "final", "--", "countdown"]


def test_split_edges():
    mk = lambda b: SplitPreTokenizer("-", behavior=b, is_literal=True)
    assert mk("Removed").split_one("-a-") == ["a"]
    assert mk("Isolated").split_one("-a-") == ["-", "a", "-"]
    assert mk("MergedWithNext").split_one("-a-") == ["-a", "-"]
    assert mk("MergedWithPrevious").split_one("-a-") == ["-", "a-"]
    assert mk("Removed").split_one("") == []
    assert mk("Removed").split_one("abc") == ["abc"]


def test_split_invert():
    sp = SplitPreTokenizer(r"\w+", behavior="Isolated", invert=True)
    assert sp.split_one("ab, cd! ef") == ["ab", "cd", "ef"]


# -- byte level (reference: test_tokenizer.cpp:58-80) ----------------------

def test_byte_level_table_bijection():
    for b in range(256):
        s = bytes_to_unicode_str(bytes([b]))
        assert unicode_str_to_bytes(s) == bytes([b])


def test_byte_level_matrix():
    for add_prefix in (False, True):
        for use_regex in (False, True):
            bl = ByteLevelPreTokenizer(add_prefix, use_regex)
            pieces = bl.pre_tokenize(["hello world"])
            joined = b"".join(unicode_str_to_bytes(p) for p in pieces)
            expect = b" hello world" if add_prefix else b"hello world"
            assert joined == expect
            if use_regex:
                assert len(pieces) == 2


def test_incomplete_utf8_tail():
    assert incomplete_utf8_tail_len(b"hello") == 0
    assert incomplete_utf8_tail_len("你好".encode()) == 0
    assert incomplete_utf8_tail_len("你好".encode()[:-1]) == 2
    assert incomplete_utf8_tail_len("你好".encode()[:-2]) == 1
    assert incomplete_utf8_tail_len(b"a\xf0\x9f") == 2  # half an emoji
    assert incomplete_utf8_tail_len(b"") == 0


# -- synthetic Llama-3-style pipeline --------------------------------------

LLAMA3_PATTERN = (
    r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}|"
    r" ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"
)


def _make_llama3_style_tokenizer(tmp_path):
    """Re-use the gpt2 vocab but with Llama-3's pipeline shape:
    Split(regex) → ByteLevel(use_regex=False), TemplateProcessing BOS."""
    src = reference_asset("gpt2")
    with open(f"{src}/tokenizer.json") as f:
        tj = json.load(f)
    tj["pre_tokenizer"] = {
        "type": "Sequence",
        "pretokenizers": [
            {"type": "Split", "pattern": {"Regex": LLAMA3_PATTERN},
             "behavior": "Isolated", "invert": False},
            {"type": "ByteLevel", "add_prefix_space": False,
             "use_regex": False, "trim_offsets": True},
        ],
    }
    tj["post_processor"] = {
        "type": "TemplateProcessing",
        "single": [{"SpecialToken": {"id": "<|endoftext|>", "type_id": 0}},
                   {"Sequence": {"id": "A", "type_id": 0}}],
        "pair": [],
        "special_tokens": {"<|endoftext|>": {
            "id": "<|endoftext|>", "ids": [50256], "tokens": ["<|endoftext|>"]}},
    }
    path = tmp_path / "tokenizer.json"
    with open(path, "w") as f:
        json.dump(tj, f)
    return str(path)


def test_llama3_style_pipeline_parity(tmp_path):
    path = _make_llama3_style_tokenizer(tmp_path)
    ours = Tokenizer.from_files(path)
    golden = hf_tokenizers.Tokenizer.from_file(path)
    for text in CASES:
        assert ours.encode(text) == golden.encode(text).ids, repr(text)
    # BOS came from the template
    ids = ours.encode("hi")
    assert ids[0] == 50256
    # and is suppressed with add_special_tokens=False
    assert ours.encode("hi", add_special_tokens=False)[0] != 50256


# -- synthetic Qwen2-style pipeline ----------------------------------------
#
# Qwen2/2.5/3 share the Llama-3 pipeline shape but split digits ONE at a
# time (\p{N}, not \p{N}{1,3}) — the native matcher kind 3
# (csrc/tokenizer.cpp match_piece_llama3 with max_digits=1). Reference
# pins Qwen2.5/Qwen3 golden ids (test/test_tokenizer.cpp:86-232); with no
# fetchable Qwen vocab offline, this synthesizes the pipeline over the
# real 50k gpt2 vocab, same as the Llama-3-style test above.

QWEN2_PATTERN = (
    r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}"
    r"| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"
)


def _make_qwen2_style_tokenizer(tmp_path):
    src = reference_asset("gpt2")
    with open(f"{src}/tokenizer.json") as f:
        tj = json.load(f)
    tj["pre_tokenizer"] = {
        "type": "Sequence",
        "pretokenizers": [
            {"type": "Split", "pattern": {"Regex": QWEN2_PATTERN},
             "behavior": "Isolated", "invert": False},
            {"type": "ByteLevel", "add_prefix_space": False,
             "use_regex": False, "trim_offsets": False},
        ],
    }
    path = tmp_path / "tokenizer.json"
    with open(path, "w") as f:
        json.dump(tj, f)
    return str(path)


def test_qwen2_style_pipeline_parity(tmp_path):
    """Full-vocab golden parity for the Qwen pipeline shape, through BOTH
    the native (kind 3) and pure-Python paths."""
    path = _make_qwen2_style_tokenizer(tmp_path)
    ours = Tokenizer.from_files(path)
    assert ours.native_encoder is not None, "qwen fast path inactive"
    py = Tokenizer.from_files(path)
    py._native_tried = True
    py._native = None
    golden = hf_tokenizers.Tokenizer.from_file(path)
    digit_cases = CASES + [
        "1234567890", "pi=3.14159", "v2.5-72B", "2024-07-01 12:34:56",
        " 42", "١٢٣ arabic digits ٤٥", "no1no22no333no4444",
    ]
    for text in digit_cases:
        want = golden.encode(text).ids
        assert ours.encode(text) == want, repr(text)
        assert py.encode(text) == want, repr(text)


def test_qwen2_style_pipeline_fuzz(tmp_path):
    path = _make_qwen2_style_tokenizer(tmp_path)
    ours = Tokenizer.from_files(path)
    assert ours.native_encoder is not None
    py = Tokenizer.from_files(path)
    py._native_tried = True
    py._native = None
    golden = hf_tokenizers.Tokenizer.from_file(path)
    rng = random.Random(99)

    def rand_text(n):
        out = []
        for _ in range(n):
            r = rng.random()
            if r < 0.35:
                out.append(chr(rng.randint(32, 126)))
            elif r < 0.55:
                out.append(rng.choice("0123456789١٢٣４５６"))
            elif r < 0.7:
                out.append(chr(rng.randint(0x4E00, 0x4FFF)))
            elif r < 0.85:
                out.append(rng.choice("🌍🚀😀é阿ü\t\r\n '"))
            else:
                out.append(rng.choice(["'s", "'T", "12", "1234", "  ",
                                       " the"]))
        return "".join(out)

    for _ in range(200):
        text = rand_text(rng.randint(0, 80))
        want = golden.encode(text).ids
        assert ours.encode(text) == want, repr(text)
        assert py.encode(text) == want, repr(text)


def test_added_token_roundtrip():
    ours, _ = _load_pair("Mistral-7B-v0.3")
    ids = ours.encode("[INST] hello [/INST]")
    # [INST] / [/INST] are added control tokens in Mistral v0.3
    assert ours.token_to_id("[INST]") in ids
    text = ours.decode(ids, skip_special_tokens=False)
    assert "[INST]" in text


def test_vocab_accessors():
    ours, _ = _load_pair("gpt2")
    assert ours.token_to_id("<|endoftext|>") == 50256
    assert ours.id_to_token(50256) == "<|endoftext|>"
    assert ours.eos_token_id == 50256 or ours.eos_token_id is None
    assert ours.vocab_size >= 50257
