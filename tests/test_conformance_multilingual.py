"""Scale conformance: every engine vs the native scalar oracle on
multilingual corpora (en/ru/ja/zh synthetic, UNK-heavy CJK), mirroring
the reference's conformance corpus strategy (BASELINE.json config 3).
"""

import numpy as np
import pytest

from wordpiece_tpu.bench.corpus import make_corpus, make_vocab
from wordpiece_tpu.core import unicode as uni
from wordpiece_tpu.core.vocab import parse_vocab
from wordpiece_tpu.runtime import loader

pytestmark = pytest.mark.skipif(not loader.available(), reason="native runtime required")

SIZE = 120_000  # bytes per language (CPU-test sized)


@pytest.fixture(scope="module")
def corpora():
    out = {}
    for lang in ("en", "ru", "ja", "zh"):
        corpus = make_corpus(SIZE, lang=lang)
        vocab = parse_vocab(make_vocab(corpus, vocab_size=8000))
        out[lang] = (corpus, vocab)
    return out


@pytest.mark.parametrize("lang", ["en", "ru", "ja", "zh"])
def test_word_engine_conformance(corpora, lang):
    from wordpiece_tpu.engine_word import WordEncoder

    corpus, vocab = corpora[lang]
    handle = loader.VocabHandle(vocab)
    want = handle.encode(uni.decode_utf8(corpus))
    got = WordEncoder(vocab).encode_bytes(corpus)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("lang", ["en", "zh"])
def test_stream_engine_conformance(corpora, lang):
    from wordpiece_tpu.engine import FastEncoder

    corpus, vocab = corpora[lang]
    handle = loader.VocabHandle(vocab)
    cps = uni.decode_utf8(corpus)
    want = handle.encode(cps)
    got = FastEncoder(vocab).encode_codepoints(cps.astype(np.int32))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("lang", ["en", "ru", "ja", "zh"])
def test_linear_engine_conformance(corpora, lang):
    from wordpiece_tpu.engine_linear import LinearEncoder

    corpus, vocab = corpora[lang]
    handle = loader.VocabHandle(vocab)
    cps = uni.decode_utf8(corpus)
    want = handle.encode(cps)
    enc = LinearEncoder(vocab)
    enc.MAX_TEXT_BATCH = 40_000  # exercise internal batching
    got = enc.encode_codepoints(cps.astype(np.int32))
    np.testing.assert_array_equal(got, want)


def test_bert_shaped_vocab_conformance(corpora):
    """The bert-base-cased-shaped bench vocab (bench/corpus.make_vocab_bert)
    against both device engines.  Regression: an early generator emitted
    duplicate lines (',' in both the punct and single-char blocks), which
    are out-of-contract and made linear bind a different id than the
    oracle."""
    from wordpiece_tpu.bench.corpus import make_vocab_bert
    from wordpiece_tpu.engine_linear import LinearEncoder
    from wordpiece_tpu.engine_word import WordEncoder

    corpus, _ = corpora["en"]
    lines = make_vocab_bert(corpus, vocab_size=8000)
    assert len(lines) == len(set(lines)), "duplicate vocab lines"
    vocab = parse_vocab(lines)
    cps = uni.decode_utf8(corpus)
    want = loader.VocabHandle(vocab).encode(cps)
    np.testing.assert_array_equal(WordEncoder(vocab).encode_bytes(corpus), want)
    np.testing.assert_array_equal(
        LinearEncoder(vocab).encode_codepoints(cps.astype(np.int32)), want
    )


def test_python_oracle_agrees_with_native(corpora):
    from wordpiece_tpu.core.oracle import encode_oracle

    corpus, vocab = corpora["en"]
    cps = uni.decode_utf8(corpus[:20000])
    assert encode_oracle(cps, vocab) == loader.VocabHandle(vocab).encode(cps).tolist()


def test_word_engine_random_bytes_fuzz():
    """Arbitrary byte soup (invalid UTF-8 included) must match the native
    scalar oracle exactly — exercises invalid-byte dropping inside units."""
    from wordpiece_tpu.engine_word import WordEncoder

    rng = np.random.default_rng(99)
    vocab = parse_vocab(
        ["[UNK]"] + [chr(c) for c in range(ord("a"), ord("z") + 1)]
        + ["##" + chr(c) for c in range(ord("a"), ord("z") + 1)]
        + ["th", "##he", "qu", "##ick", "中", "э", "##ю"]
    )
    enc = WordEncoder(vocab)
    handle = loader.VocabHandle(vocab)
    for _ in range(20):
        n = int(rng.integers(1, 4000))
        # Mix of ASCII text and random bytes.
        ascii_part = bytes(rng.choice(list(b"abc def gh ij "), size=n))
        noise = rng.integers(0, 256, size=n // 4, dtype=np.uint8).tobytes()
        data = ascii_part[: n // 2] + noise + ascii_part[n // 2 :]
        want = handle.encode(uni.decode_utf8(data))
        got = enc.encode_bytes(data)
        np.testing.assert_array_equal(got, want)
