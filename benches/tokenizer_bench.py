"""Tokenizer encode-throughput benchmark.

Mirrors the reference's THREE-WAY methodology
(/root/reference/benches/tokenizer.py: tinygpt vs HF tokenizers vs
OpenAI tiktoken, with a correctness cross-check assert before timing)
without its network dependencies: instead of downloading XNLI, a
deterministic multilingual corpus is synthesized locally; instead of
tiktoken's network-fetched BPE file, a tiktoken Encoding is constructed
OFFLINE from the same local gpt2 tokenizer.json (byte-level vocab ranks
ARE the mergeable ranks), so all three engines tokenize identically.

Usage: python benches/tokenizer_bench.py [--model-dir DIR] [--mb 8]
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.disable(logging.INFO)

DEFAULT_ASSET = "/root/reference/assets/tokenizer/gpt2"  # read-only fixture

_SNIPPETS = [
    "The quick brown fox jumps over the lazy dog. ",
    "In a hole in the ground there lived a hobbit; not a nasty, dirty, wet hole. ",
    "def fib(n):\n    return n if n < 2 else fib(n-1) + fib(n-2)\n",
    "All human beings are born free and equal in dignity and rights. ",
    "Tous les êtres humains naissent libres et égaux en dignité et en droits. ",
    "人人生而自由，在尊严和权利上一律平等。",
    "يولد جميع الناس أحرارًا متساوين في الكرامة والحقوق. ",
    "Все люди рождаются свободными и равными в своем достоинстве и правах. ",
    "1234567890 3.14159 2.71828 -42 1e9 0xDEADBEEF ",
    "I'm sure they'll say it's a won't-fix, but we're optimistic you'd agree. ",
    "emoji soup: 🙂🚀🌍🎉🔥💡 and flags 🇺🇸🇯🇵🇫🇷 ",
    "   whitespace\truns\n\nand\r\nnewlines   ",
]


def make_corpus(target_mb: float, seed: int = 0):
    rng = random.Random(seed)
    texts, total = [], 0
    target = int(target_mb * 1e6)
    while total < target:
        n = rng.randint(3, 12)
        t = "".join(rng.choice(_SNIPPETS) for _ in range(n))
        texts.append(t)
        total += len(t.encode("utf-8"))
    return texts, total


def tiktoken_from_tokenizer_json(path: str):
    """Build a tiktoken Encoding OFFLINE from a byte-level BPE
    tokenizer.json: vocab tokens map through the ByteLevel unicode table
    back to raw bytes, and their ids are the mergeable ranks (gpt2's
    vocab is ordered by merge rank by construction). Returns None when
    the file is not a plain byte-level BPE (tiktoken can't express it)."""
    import json as _json

    import tiktoken

    from tinygpt_tpu.tokenizer.byte_level import unicode_str_to_bytes

    with open(path) as f:
        tj = _json.load(f)
    # older exports omit model.type; require merges+vocab (BPE shape)
    model = tj.get("model", {})
    if model.get("type") not in (None, "BPE") or "merges" not in model:
        return None
    pre = tj.get("pre_tokenizer") or {}
    if pre.get("type") != "ByteLevel":
        return None
    vocab = tj["model"]["vocab"]
    specials = {t["content"]: t["id"] for t in tj.get("added_tokens", [])}
    ranks = {}
    for token, tid in vocab.items():
        if token in specials:
            continue
        ranks[unicode_str_to_bytes(token)] = tid
    pat = (r"""'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+|"""
           r""" ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""")
    return tiktoken.Encoding(
        name="gpt2-local", pat_str=pat, mergeable_ranks=ranks,
        special_tokens=specials,
    )


def bench(fn, texts, repeats=3):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn(texts)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default=DEFAULT_ASSET)
    ap.add_argument("--mb", type=float, default=8.0)
    ap.add_argument("--threads", type=int, nargs="*",
                    default=[1, 2, 4, 8, 16])
    args = ap.parse_args()

    from tinygpt_tpu.tokenizer import Tokenizer

    tok = Tokenizer.from_dir(args.model_dir)
    tok_py = Tokenizer.from_dir(args.model_dir)
    tok_py._native_tried = True
    tok_py._native = None

    try:
        import tokenizers as hf_tokenizers

        hf = hf_tokenizers.Tokenizer.from_file(
            os.path.join(args.model_dir, "tokenizer.json")
        )
    except Exception:
        hf = None

    try:
        tk = tiktoken_from_tokenizer_json(
            os.path.join(args.model_dir, "tokenizer.json"))
    except Exception:
        tk = None

    texts, total_bytes = make_corpus(args.mb)
    mb = total_bytes / 1e6

    # correctness cross-check before timing: all engines must agree
    # (reference: benches/tokenizer.py:67-80 asserts tinygpt == HF ==
    # tiktoken on every text)
    sanity = "The quick brown fox! 你好 🌍 it's 1234"
    ours = tok.encode(sanity, add_special_tokens=False)
    assert ours == tok_py.encode(sanity, add_special_tokens=False)
    if hf is not None:
        assert ours == hf.encode(sanity, add_special_tokens=False).ids, \
            "sanity mismatch vs HF"
    if tk is not None:
        for t in [sanity] + texts[:50]:
            assert tok.encode(t, add_special_tokens=False) == \
                tk.encode(t), f"tiktoken cross-check mismatch on {t[:40]!r}"

    results = {}
    print(f"corpus: {len(texts)} texts, {mb:.1f} MB "
          f"(native={'on' if tok.native_encoder else 'OFF'})")
    for nt in args.threads:
        dt = bench(lambda ts: tok.encode_batch(ts, num_threads=nt), texts)
        results[f"tinygpt_native_t{nt}"] = mb / dt
        print(f"tinygpt-native  threads={nt:<3d} {mb / dt:8.1f} MB/s")
    dt = bench(lambda ts: tok_py.encode_batch(ts), texts, repeats=1)
    results["tinygpt_python_t1"] = mb / dt
    print(f"tinygpt-python  threads=1   {mb / dt:8.1f} MB/s")
    if hf is not None:
        dt = bench(lambda ts: hf.encode_batch_fast(ts), texts)
        results["hf_tokenizers_batch"] = mb / dt
        print(f"hf-tokenizers   batch       {mb / dt:8.1f} MB/s")
        dt = bench(lambda ts: [hf.encode(t) for t in ts], texts)
        results["hf_tokenizers_serial"] = mb / dt
        print(f"hf-tokenizers   serial      {mb / dt:8.1f} MB/s")
    if tk is not None:
        dt = bench(lambda ts: tk.encode_ordinary_batch(ts, num_threads=8),
                   texts)
        results["tiktoken_batch_t8"] = mb / dt
        print(f"tiktoken        threads=8   {mb / dt:8.1f} MB/s")
        dt = bench(lambda ts: [tk.encode_ordinary(t) for t in ts], texts)
        results["tiktoken_serial"] = mb / dt
        print(f"tiktoken        serial      {mb / dt:8.1f} MB/s")

    print(json.dumps({"metric": "tokenizer_encode_mb_s",
                      "results": {k: round(v, 1) for k, v in results.items()}}))


if __name__ == "__main__":
    main()
