"""Cross-engine benchmark harness — counterpart of tests/speed_test.py.

Times every available engine (word/fast-stream/linear/host oracle, plus
HuggingFace `tokenizers` if importable) on identical corpus+vocab and
prints a benchmark.md-style GitHub-markdown table with x-multipliers
against the fastest.  `--collect` writes each engine's ids to
result_<engine>.txt for conformance diffing (speed_test.py:28-32).

No network: corpora are the deterministic synthetic sets from
bench/corpus.py (the reference downloads Wikipedia dumps, which a
zero-egress environment cannot).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def time_engine(name: str, fn, iters: int = 3):
    best = None
    ids = None
    for _ in range(iters):
        t0 = time.time()
        ids = fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best, ids


def run(langs, size_mb, engines, collect=False, iters=3):
    from ..api import make_encoder
    from ..core import unicode as uni
    from ..core.vocab import parse_vocab
    from .corpus import make_corpus, make_vocab

    results: dict[str, dict[str, float]] = {}
    counts: dict[str, int] = {}
    for lang in langs:
        corpus = make_corpus(int(size_mb * 1e6), lang=lang)
        vocab_lines = make_vocab(corpus)
        vocab = parse_vocab(vocab_lines)
        cps = uni.decode_utf8(corpus).astype(np.int32)
        results[lang] = {}

        for engine in engines:
            try:
                enc = make_encoder(vocab, engine=engine)
            except Exception as e:  # engine unavailable in this env
                print(f"[{lang}] {engine}: unavailable ({e})", file=sys.stderr)
                continue

            def call(enc=enc):
                if hasattr(enc, "encode_bytes"):
                    return enc.encode_bytes(corpus)
                return enc.encode_codepoints(cps)

            call()  # warmup/compile
            dt, ids = time_engine(engine, call, iters)
            results[lang][engine] = dt
            counts[f"{lang}/{engine}"] = len(ids)
            if collect:
                with open(f"result_{engine}_{lang}.txt", "w") as f:
                    f.write(" ".join(str(int(i)) for i in ids))

        hf = _try_huggingface(corpus, vocab_lines)
        if hf is not None:
            results[lang]["huggingface"] = hf
        for name, mod in (
            ("tensorflow-text", "tensorflow_text"),
            ("torchtext", "torchtext"),
            ("keras-nlp", "keras_nlp"),
        ):
            # The reference times these (tests/speed_test.py:34-86); this
            # image does not ship them — record the absence explicitly
            # rather than silently skipping the row.
            try:
                __import__(mod)
                print(
                    f"[{lang}] {name}: importable but no timing adapter wired",
                    file=sys.stderr,
                )
            except ImportError:
                print(f"[{lang}] {name}: absent from environment", file=sys.stderr)

    return results, counts


def _try_huggingface(corpus: bytes, vocab_lines):
    try:
        from tokenizers import Tokenizer
        from tokenizers.models import WordPiece as HFWordPiece
        from tokenizers.pre_tokenizers import Whitespace
    except Exception:
        return None
    try:
        tok = Tokenizer(HFWordPiece({w: i for i, w in enumerate(vocab_lines)}, unk_token="[UNK]"))
        tok.pre_tokenizer = Whitespace()
        text = corpus.decode("utf-8", errors="ignore")
        t0 = time.time()
        tok.encode(text)
        return time.time() - t0
    except Exception:
        return None


def print_table(results, size_mb):
    engines = sorted({e for r in results.values() for e in r})
    langs = list(results)
    print(f"\n### {size_mb} MB corpus, seconds (xN vs best)\n")
    print("| Algorithm | " + " | ".join(langs) + " |")
    print("|" + "---|" * (len(langs) + 1))
    best = {l: min(results[l].values()) for l in langs if results[l]}
    for e in engines:
        row = [e]
        for l in langs:
            if e in results[l]:
                v = results[l][e]
                mult = v / best[l] if best[l] > 0 else 0
                row.append(f"{v:.2f} (x{mult:.1f})")
            else:
                row.append("—")
        print("| " + " | ".join(row) + " |")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--langs", nargs="+", default=["en", "ru", "ja", "zh"])
    ap.add_argument("--corpus-size", type=float, default=10.0, help="MB")
    ap.add_argument(
        "--engines", nargs="+", default=["fast", "fast-stream", "linear", "host"]
    )
    ap.add_argument("--collect", action="store_true")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args(argv)
    results, counts = run(
        args.langs, args.corpus_size, args.engines, args.collect, args.iters
    )
    print_table(results, args.corpus_size)
    for k, v in counts.items():
        print(f"ids {k}: {v}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
