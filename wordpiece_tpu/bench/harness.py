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

        # Competitor adapters (reference tests/speed_test.py:34-86), each
        # import-guarded: absent libraries print an explicit absence line
        # rather than silently skipping the row.
        for name, adapter in (
            ("huggingface", _try_huggingface),
            ("transformers", _try_transformers),
            ("tensorflow-text", _try_tensorflow_text),
            ("torchtext", _try_torchtext),
            ("keras-nlp", _try_keras_nlp),
        ):
            try:
                dt = adapter(corpus, vocab_lines)
            except Exception as e:  # pragma: no cover - foreign-lib failure
                print(f"[{lang}] {name}: failed ({e})", file=sys.stderr)
                continue
            if dt is None:
                print(f"[{lang}] {name}: absent from environment", file=sys.stderr)
            else:
                results[lang][name] = dt

    return results, counts


def _try_huggingface(corpus: bytes, vocab_lines):
    """HuggingFace `tokenizers` WordPiece (speed_test.py:58-65 analogue)."""
    try:
        from tokenizers import Tokenizer
        from tokenizers.models import WordPiece as HFWordPiece
        from tokenizers.pre_tokenizers import Whitespace
    except ImportError:
        return None
    tok = Tokenizer(HFWordPiece({w: i for i, w in enumerate(vocab_lines)}, unk_token="[UNK]"))
    tok.pre_tokenizer = Whitespace()
    text = corpus.decode("utf-8", errors="ignore")
    t0 = time.time()
    tok.encode(text)
    return time.time() - t0


def _vocab_file(vocab_lines) -> str:
    import tempfile

    f = tempfile.NamedTemporaryFile(
        "w", suffix=".txt", delete=False, encoding="utf-8"
    )
    f.write("\n".join(vocab_lines))
    f.close()
    return f.name


def _try_transformers(corpus: bytes, vocab_lines):
    """transformers BertTokenizerFast — the torch-ecosystem tokenizer this
    image actually ships (torchtext's BERTTokenizer is absent)."""
    try:
        from transformers import BertTokenizerFast
    except ImportError:
        return None
    tok = BertTokenizerFast(
        _vocab_file(vocab_lines), do_lower_case=False, tokenize_chinese_chars=True
    )
    text = corpus.decode("utf-8", errors="ignore")
    t0 = time.time()
    tok(text, add_special_tokens=False)
    return time.time() - t0


def _try_tensorflow_text(corpus: bytes, vocab_lines):
    """tensorflow_text BertTokenizer (speed_test.py:35-56 analogue)."""
    try:
        import tensorflow as tf
        from tensorflow_text import BertTokenizer
    except ImportError:
        return None
    table = tf.lookup.StaticVocabularyTable(
        tf.lookup.KeyValueTensorInitializer(
            keys=list(vocab_lines),
            key_dtype=tf.string,
            values=tf.range(len(vocab_lines), dtype=tf.int64),
            value_dtype=tf.int64,
        ),
        num_oov_buckets=1,
    )
    tok = BertTokenizer(table, token_out_type=tf.int64, lower_case=False)
    text = corpus.decode("utf-8", errors="ignore")
    t0 = time.time()
    tok.tokenize(text)
    return time.time() - t0


def _try_torchtext(corpus: bytes, vocab_lines):
    """torchtext BERTTokenizer (speed_test.py:68-75 analogue)."""
    try:
        from torchtext.transforms import BERTTokenizer
    except ImportError:
        return None
    tok = BERTTokenizer(_vocab_file(vocab_lines), do_lower_case=False)
    text = corpus.decode("utf-8", errors="ignore")
    t0 = time.time()
    tok(text)
    return time.time() - t0


def _try_keras_nlp(corpus: bytes, vocab_lines):
    """keras_nlp WordPieceTokenizer (speed_test.py:78-86 analogue)."""
    try:
        import keras_nlp
    except ImportError:
        return None
    tok = keras_nlp.tokenizers.WordPieceTokenizer(
        vocabulary=list(vocab_lines), lowercase=False
    )
    text = corpus.decode("utf-8", errors="ignore")
    t0 = time.time()
    tok.tokenize(text)
    return time.time() - t0


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
