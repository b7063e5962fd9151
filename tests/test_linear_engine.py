"""Differential tests: Linear (suffix-array) engine vs oracle and vs Fast.

Mirrors the reference's linear==fast differential guarantee
(tests/tests.cpp:90-97) plus SA/LCP unit checks.
"""

import numpy as np
import pytest

from wordpiece_tpu.core import unicode as uni
from wordpiece_tpu.core.oracle import encode_oracle
from wordpiece_tpu.core.vocab import parse_vocab
from wordpiece_tpu.engine_linear import LinearEncoder
from wordpiece_tpu.ops.suffix_array import lcp_clamped, suffix_array

UNK = -1


def ref_suffix_array(s):
    return np.array(sorted(range(len(s)), key=lambda i: s[i:]), dtype=np.int32)


def ref_lcp(s, sa):
    out = np.zeros(len(s), dtype=np.int32)
    for r in range(len(s) - 1):
        a, b = s[sa[r] :], s[sa[r + 1] :]
        k = 0
        while k < len(a) and k < len(b) and a[k] == b[k]:
            k += 1
        out[r] = k
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n", [1, 2, 7, 50, 257])
def test_suffix_array_and_lcp(seed, n):
    rng = np.random.default_rng(seed)
    s = rng.integers(1, 5, size=n).astype(np.int32)
    import jax.numpy as jnp

    sa, rank = suffix_array(jnp.asarray(s))
    want_sa = ref_suffix_array(s.tolist())
    np.testing.assert_array_equal(np.asarray(sa), want_sa)
    clamp = 9
    lcp = lcp_clamped(jnp.asarray(s), sa, clamp=clamp)
    np.testing.assert_array_equal(
        np.asarray(lcp), np.minimum(ref_lcp(s.tolist(), want_sa), clamp)
    )


def run_linear(text: str, vocab_lines):
    vocab = parse_vocab(vocab_lines)
    cps = uni.decode_utf8(text.encode())
    want = encode_oracle(cps, vocab)
    got = LinearEncoder(vocab).encode_codepoints(cps.astype(np.int32)).tolist()
    assert got == want, f"text={text!r} got={got[:40]} want={want[:40]}"
    return got


@pytest.mark.parametrize(
    "text,vocab,expected",
    [
        ("aaaa", ["aaaa", "aaa", "aa", "a"], [0]),
        ("abcdef", ["bcde", "ac", "def", "bc", "bcdef", "a"], [UNK]),
        ("abcdef", ["bcde", "ac", "def", "bc", "##bcdef", "a"], [5, 4]),
        ("   aaaa  ", ["aa", "##aa"], [0, 1]),
        ("aaaa", ["aa", "##a"], [0, 1, 1]),
        ("self-made", ["self", "made", "-", "##-", "##made"], [0, 2, 1]),
        ("abc a abc abd", ["a", "abd"], [UNK, 0, UNK, 1]),
        ("abcdef", ["a", "##bcdef", "ab", "##c", "##d", "##e", "##f"], [2, 3, 4, 5, 6]),
        ("привет мир", ["при", "##вет", "мир"], [0, 1, 2]),
        ("中ab", ["中ab", "中", "a", "##b", "ab"], [0]),
        ("-a", ["-a", "-", "a"], [1, 2]),
        ("abcdefghij zz", ["ab", "zz"], [UNK, 1]),
    ],
)
def test_linear_unit_vectors(text, vocab, expected):
    assert run_linear(text, vocab) == expected


def test_linear_random_split_stress():
    rng = np.random.default_rng(17)
    alphabet = np.array(list("abcdef"))
    for text_len in (10, 40, 90):
        for parts in (2, 5, 17):
            for positive in (True, False):
                s = "".join(rng.choice(alphabet, size=text_len))
                borders = {text_len}
                while len(borders) < min(parts, text_len):
                    borders.add(int(rng.integers(1, text_len)))
                vocab = set()
                start = 0
                for b in sorted(borders):
                    if start == 0:
                        vocab.add(s[start:b])
                    vocab.add("##" + s[start:b])
                    start = b
                vocab = sorted(vocab)
                if not positive and len(vocab) > 1:
                    vocab = vocab[1:]
                run_linear(s, vocab)


def test_linear_matches_fast_engine():
    from wordpiece_tpu.engine import FastEncoder

    rng = np.random.default_rng(3)
    words = ["".join(rng.choice(list("abcde"), size=int(rng.integers(1, 9)))) for _ in range(40)]
    text = " ".join(rng.choice(words) for _ in range(150))
    vocab_lines = sorted(
        {w[:3] for w in words} | {"##" + w[3:] for w in words if len(w) > 3} | set("abcde")
    )
    vocab = parse_vocab(vocab_lines)
    cps = uni.decode_utf8(text.encode()).astype(np.int32)
    fast = FastEncoder(vocab).encode_codepoints(cps).tolist()
    linear = LinearEncoder(vocab).encode_codepoints(cps).tolist()
    assert fast == linear


def test_linear_encode_bytes_deduped_matches_codepoint_path():
    """The deduped byte path (SA over unique units only) must equal the
    full-text codepoint path and the fast engine, id for id."""
    from wordpiece_tpu.bench.corpus import make_corpus, make_vocab
    from wordpiece_tpu.core import unicode as uni
    from wordpiece_tpu.engine_linear import LinearEncoder
    from wordpiece_tpu.core.vocab import parse_vocab as _pv
    from wordpiece_tpu.runtime import loader

    if not loader.available():
        pytest.skip("native runtime required")
    data = make_corpus(300_000)
    vocab = _pv(make_vocab(data, vocab_size=3000))
    enc = LinearEncoder(vocab)
    got = enc.encode_bytes(data)
    want = enc.encode_codepoints(np.asarray(uni.decode_utf8(data)))
    assert np.array_equal(got, want)
    oracle = loader.VocabHandle(vocab).encode(uni.decode_utf8(data))
    assert np.array_equal(got, oracle)


def test_linear_encode_bytes_multibatch_units():
    """Unit batching boundaries (MAX_TEXT_BATCH) must not change output."""
    from wordpiece_tpu.core import unicode as uni
    from wordpiece_tpu.engine_linear import LinearEncoder
    from wordpiece_tpu.core.vocab import parse_vocab as _pv
    from wordpiece_tpu.runtime import loader

    if not loader.available():
        pytest.skip("native runtime required")
    rng = np.random.default_rng(3)
    words = ["".join(rng.choice(list("abcde"), size=int(rng.integers(1, 11)))) for _ in range(300)]
    text = " ".join(rng.choice(words) for _ in range(2000)) + " 中文 mix-ed"
    vocab = _pv(sorted({w[:2] for w in words} | {"##" + c for c in "abcde"} | set("abcde")
                       | {"中", "文", "mix", "##ed", "-"}))
    enc = LinearEncoder(vocab)
    enc.MAX_TEXT_BATCH = 256  # force many unit batches
    got = enc.encode_bytes(text.encode())
    enc2 = LinearEncoder(vocab)
    want = enc2.encode_codepoints(np.asarray(uni.decode_utf8(text.encode())))
    assert np.array_equal(got, want)


def test_linear_compact_overflow_refetch():
    """A compact-output capacity overflow (count > cap) must transparently
    re-fetch via the full program with identical ids, and the cap ratio
    must adapt upward so later batches avoid double execution."""
    from wordpiece_tpu.core import unicode as uni
    from wordpiece_tpu.core.vocab import parse_vocab as _pv
    from wordpiece_tpu.engine_linear import LinearEncoder
    from wordpiece_tpu.runtime import loader

    if not loader.available():
        pytest.skip("native runtime required")
    from wordpiece_tpu.bench.corpus import make_corpus, make_vocab

    data = make_corpus(120_000)
    vocab = _pv(make_vocab(data, vocab_size=2000))
    enc = LinearEncoder(vocab)
    enc._cap_ratio = 0.0001  # force cap far below the real id count
    got = enc.encode_bytes(data)
    assert enc._cap_ratio > 0.01, "observed density must adapt the ratio"
    oracle = loader.VocabHandle(vocab).encode(uni.decode_utf8(data))
    assert np.array_equal(got, oracle)


def test_linear_streaming_multi_piece_batches():
    """Batches spanning multiple segmentation pieces (LINEAR_SEG_CHUNK)
    must join across pieces with a single separating space and keep
    uid-order attribution — the >=3 MB streaming path, forced small."""
    from wordpiece_tpu.core import unicode as uni
    from wordpiece_tpu.core.vocab import parse_vocab as _pv
    from wordpiece_tpu.engine_linear import LinearEncoder
    from wordpiece_tpu.runtime import loader

    if not loader.available():
        pytest.skip("native runtime required")
    from wordpiece_tpu.bench.corpus import make_corpus, make_vocab

    data = make_corpus(200_000)
    vocab = _pv(make_vocab(data, vocab_size=2000))
    enc = LinearEncoder(vocab)
    enc.LINEAR_SEG_CHUNK = 10_000  # ~20 pieces
    enc.LINEAR_BATCH_TARGET = 3_000  # many batches, most spanning pieces
    got = enc.encode_bytes(data)
    oracle = loader.VocabHandle(vocab).encode(uni.decode_utf8(data))
    assert np.array_equal(got, oracle)
