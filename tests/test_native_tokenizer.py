"""Native (C++) tokenizer core tests: exact parity between the csrc/
fast path, the pure-Python pipeline, and HF `tokenizers` as the golden
oracle — across the GPT-2, Llama-3 and Qwen-2 split-pattern families,
single/batch/threaded entry points, and pathological inputs (the
reference's tokenizer tests live at test/test_tokenizer.cpp; its native
hot loops are BPE.cpp + Regex.cpp)."""

import logging
import os
import random

import pytest

from tests.conftest import reference_asset
from tinygpt_tpu.tokenizer import Tokenizer

hf_tokenizers = pytest.importorskip("tokenizers")

logging.disable(logging.INFO)

LLAMA3_PAT = (
    r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}"
    r"| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"
)
QWEN2_PAT = (
    r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}"
    r"| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"
)

CASES = [
    "Hello world! This is a test.",
    "don't STOP'LL 'Ve  y'all I'M DON'T they'd",
    "  leading spaces and   runs\n\nnewlines\r\n mixed \t tabs",
    "numbers 1234567890 and 12 3 4567",
    "unicode: naïve café 北京 مرحبا Привет 🙂🙃",
    "",
    " ",
    "a",
    "trailing spaces   ",
    "\n\n\n",
    "  \n  \n  x",
    "mixé—dash…ellipsis !!!\n",
    "!leading punct?mid.end!",
    "x" * 500,
    " " * 300 + "word",
    "\t\r\n \x0b\x0c mix",
    "café\n\nrésumé  \n!punct\r\n\r\n",
    "🇺🇸 flags 👨‍👩‍👧 zwj",
]

_CORPUS = [
    "Hello world! This is a test. " * 50,
    "The quick brown fox jumps over the lazy dog. 12345 67890. ",
    "naïve café résumé — emoji: 🙂🙃 done.",
    "    indented\n\n\nnewlines\t\ttabs   ",
    "don't can't won't it's we're they'll I'd you've I'M DON'T",
]


def _trained_dir(tmp_path, pattern=None, ignore_merges=False):
    """Train a tiny byte-level BPE with HF tokenizers and save its
    tokenizer.json — a real HF-format fixture built offline."""
    from tokenizers import Regex
    from tokenizers import Tokenizer as HFTok
    from tokenizers import decoders, models, pre_tokenizers, trainers

    hf = HFTok(models.BPE(ignore_merges=ignore_merges))
    if pattern is None:
        hf.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    else:
        hf.pre_tokenizer = pre_tokenizers.Sequence(
            [
                pre_tokenizers.Split(
                    pattern=Regex(pattern), behavior="isolated", invert=False
                ),
                pre_tokenizers.ByteLevel(
                    add_prefix_space=False, use_regex=False
                ),
            ]
        )
    hf.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=700,
        special_tokens=["<|end|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    hf.train_from_iterator(_CORPUS, trainer)
    d = tmp_path / "tok"
    d.mkdir(parents=True, exist_ok=True)
    hf.save(str(d / "tokenizer.json"))
    return str(d), hf


def _check_parity(d, hf, texts):
    tok = Tokenizer.from_dir(d)
    assert tok.native_encoder is not None, "native fast path not active"
    tok_py = Tokenizer.from_dir(d)
    tok_py._native_tried = True
    tok_py._native = None
    for t in texts:
        want = hf.encode(t).ids
        assert tok.encode(t, add_special_tokens=False) == want, repr(t)
        assert tok_py.encode(t, add_special_tokens=False) == want, repr(t)
    # batched + threaded path
    got = tok.encode_batch(texts, add_special_tokens=False, num_threads=4)
    assert got == [hf.encode(t).ids for t in texts]


@pytest.mark.parametrize(
    "pattern,ignore_merges",
    [(None, False), (LLAMA3_PAT, True), (QWEN2_PAT, False)],
    ids=["gpt2", "llama3", "qwen2"],
)
def test_native_parity_trained(tmp_path, pattern, ignore_merges):
    d, hf = _trained_dir(tmp_path, pattern, ignore_merges)
    _check_parity(d, hf, CASES)


@pytest.mark.parametrize(
    "pattern", [None, LLAMA3_PAT, QWEN2_PAT], ids=["gpt2", "llama3", "qwen2"]
)
def test_native_parity_fuzz(tmp_path, pattern):
    d, hf = _trained_dir(tmp_path, pattern)
    rng = random.Random(7)

    def rand_text(n):
        out = []
        for _ in range(n):
            r = rng.random()
            if r < 0.45:
                out.append(chr(rng.randint(32, 126)))
            elif r < 0.6:
                out.append(chr(rng.randint(0x4E00, 0x4FFF)))
            elif r < 0.75:
                out.append(rng.choice("🌍🚀😀é阿ü\t\r\n '"))
            elif r < 0.9:
                out.append(rng.choice(["'s", "'T", "12", "1234", "  "]))
            else:
                out.append(rng.choice(["<|end|>", " the", "\n\n"]))
        return "".join(out)

    texts = [rand_text(rng.randint(0, 80)) for _ in range(150)]
    _check_parity(d, hf, texts)


def test_native_gpt2_reference_asset():
    """The real GPT-2 tokenizer.json must take the native path and match
    HF tokenizers exactly (same oracle as test_tokenizer.py, but
    asserting the fast path is actually engaged)."""
    d = reference_asset("gpt2")
    ours = Tokenizer.from_dir(d)
    assert ours.native_encoder is not None
    golden = hf_tokenizers.Tokenizer.from_file(f"{d}/tokenizer.json")
    for t in CASES:
        assert ours.encode(t, add_special_tokens=False) == golden.encode(t).ids


MS_CASES = CASES + [
    "▁already marked",
    "<s>hello",
    "hello<unk>world",
    "mid <s> token",
    "byte fallback: \x01\x02 控制",
    "tab\tand  double  space",
]


def test_native_mistral_reference_asset():
    """The FLAGSHIP tokenizer (Mistral-7B-v0.3: Metaspace pre-tokenizer,
    byte-fallback BPE) must take the native path and match HF tokenizers
    exactly — round 1 left this family on the pure-Python fallback
    (csrc/tokenizer.cpp kind=4 now covers it)."""
    d = reference_asset("Mistral-7B-v0.3")
    ours = Tokenizer.from_dir(d)
    assert ours.native_encoder is not None, "metaspace fast path inactive"
    golden = hf_tokenizers.Tokenizer.from_file(f"{d}/tokenizer.json")
    for t in MS_CASES:
        got = ours.encode(t, add_special_tokens=False)
        want = golden.encode(t, add_special_tokens=False).ids
        assert got == want, repr(t)
    # python path must agree too
    py = Tokenizer.from_dir(d)
    py._native_tried = True
    py._native = None
    for t in MS_CASES:
        assert py.encode(t, add_special_tokens=False) == \
            golden.encode(t, add_special_tokens=False).ids, repr(t)
    # batched/threaded
    got = ours.encode_batch(MS_CASES, add_special_tokens=False,
                            num_threads=4)
    assert got == [golden.encode(t, add_special_tokens=False).ids
                   for t in MS_CASES]


def test_native_mistral_fuzz():
    """Fuzz the metaspace native path against HF tokenizers."""
    d = reference_asset("Mistral-7B-v0.3")
    ours = Tokenizer.from_dir(d)
    assert ours.native_encoder is not None
    golden = hf_tokenizers.Tokenizer.from_file(f"{d}/tokenizer.json")
    rng = random.Random(11)

    def rand_text(n):
        out = []
        for _ in range(n):
            r = rng.random()
            if r < 0.45:
                out.append(chr(rng.randint(32, 126)))
            elif r < 0.6:
                out.append(chr(rng.randint(0x4E00, 0x4FFF)))
            elif r < 0.72:
                out.append(rng.choice("🌍🚀😀é阿ü\t\r\n '▁"))
            elif r < 0.82:
                out.append(chr(rng.randint(1, 8)))  # control bytes
            else:
                out.append(rng.choice(["<s>", " the", "\n\n", "</s>"]))
        return "".join(out)

    texts = [rand_text(rng.randint(0, 60)) for _ in range(120)]
    for t in texts:
        got = ours.encode(t, add_special_tokens=False)
        want = golden.encode(t, add_special_tokens=False).ids
        assert got == want, repr(t)


def test_native_disabled_by_env(tmp_path, monkeypatch):
    """TINYGPT_NO_NATIVE must force the pure-Python path (checked via a
    fresh library-state snapshot, not the cached loader)."""
    from tinygpt_tpu.tokenizer import native

    d, hf = _trained_dir(tmp_path)
    monkeypatch.setenv("TINYGPT_NO_NATIVE", "1")
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_LIB_TRIED", False)
    tok = Tokenizer.from_dir(d)
    assert tok.native_encoder is None
    assert tok.encode(CASES[0], add_special_tokens=False) == hf.encode(
        CASES[0]
    ).ids
    # restore loader state for other tests
    monkeypatch.setattr(native, "_LIB_TRIED", False)


def test_native_interleaved_instances(tmp_path):
    """Two different vocabularies used alternately from one thread must
    not cross-pollinate the per-thread piece cache (regression: the C++
    cache is tagged by tokenizer generation)."""
    d1, hf1 = _trained_dir(tmp_path / "a")
    d2, hf2 = _trained_dir(tmp_path / "b", LLAMA3_PAT, True)
    t1 = Tokenizer.from_dir(d1)
    t2 = Tokenizer.from_dir(d2)
    for t in CASES[:8]:
        assert t1.encode(t, add_special_tokens=False) == hf1.encode(t).ids
        assert t2.encode(t, add_special_tokens=False) == hf2.encode(t).ids
        assert t1.encode(t, add_special_tokens=False) == hf1.encode(t).ids


def test_native_long_whitespace_run(tmp_path):
    """Huge single pieces exercise the heap BPE path."""
    d, hf = _trained_dir(tmp_path)
    text = " " * 20000 + "\n" * 5000
    tok = Tokenizer.from_dir(d)
    assert tok.native_encoder is not None
    assert tok.encode(text, add_special_tokens=False) == hf.encode(text).ids
