"""Differential tests: the JAX Fast engine vs the golden oracle.

Mirrors the reference's stress strategy (tests/tests.cpp:219-272):
random strings with randomly split covering vocabs, positive (full cover)
and negative (one entry removed to force UNK rollback), plus the unit
vectors and multilingual text.
"""

import numpy as np
import pytest

from wordpiece_tpu.core import unicode as uni
from wordpiece_tpu.core.oracle import encode_oracle
from wordpiece_tpu.core.vocab import parse_vocab
from wordpiece_tpu.engine import FastEncoder

UNK = -1


def run_both(text: str, vocab_lines):
    vocab = parse_vocab(vocab_lines)
    cps = uni.decode_utf8(text.encode("utf-8"))
    want = encode_oracle(cps, vocab)
    got = FastEncoder(vocab).encode_codepoints(cps.astype(np.int32)).tolist()
    assert got == want, f"text={text!r} vocab={vocab_lines[:20]} got={got[:50]} want={want[:50]}"
    return got


@pytest.mark.parametrize(
    "text,vocab,expected",
    [
        ("aaaa", ["aaaa", "aaa", "aa", "a"], [0]),
        ("abcdef", ["bcde", "ac", "def", "bc", "bcdef", "a"], [UNK]),
        ("abcdef", ["bcde", "ac", "def", "bc", "##bcdef", "a"], [5, 4]),
        ("   aaaa  ", ["aa", "##aa"], [0, 1]),
        ("   aaaa  ", ["aa"], [UNK]),
        ("aaaa", ["aa", "##a"], [0, 1, 1]),
        ("self-made", ["self", "made", "-", "##-", "##made"], [0, 2, 1]),
        ("abc a abc abd", ["a", "abd"], [UNK, 0, UNK, 1]),
        ("abcdef", ["a", "##bcdef", "ab", "##c", "##d", "##e", "##f"], [2, 3, 4, 5, 6]),
        ("привет мир", ["при", "##вет", "мир"], [0, 1, 2]),
        (
            "токенизация это круто",
            ["ток", "крут", "это", "##за", "##ени", "##о", "##ция", "ция"],
            [0, 4, 3, 6, 2, 1, 5],
        ),
        ("中文", ["中", "文"], [0, 1]),
        ("中ab", ["中ab", "中", "a", "##b", "ab"], [0]),
        ("-a", ["-a", "-", "a"], [1, 2]),
        ("abcdefghij zz", ["ab", "zz"], [UNK, 1]),
        ("", ["a"], []),
        ("   ", ["a"], [UNK]) if False else ("   ", ["a"], []),
        ("x", ["[UNK]", "x"], [1]),
    ],
)
def test_unit_vectors(text, vocab, expected):
    got = run_both(text, vocab)
    assert got == expected


def random_split_vocab(rng: np.random.Generator, s: str, parts: int) -> list[str]:
    """randomSplit (tests.cpp:111-135): vocab fully covering s."""
    borders = {len(s)}
    while len(borders) < parts:
        borders.add(int(rng.integers(1, len(s))))
    vocab = set()
    start = 0
    for b in sorted(borders):
        piece = s[start:b]
        if start == 0:
            vocab.add(piece)
        vocab.add("##" + piece)
        start = b
    return sorted(vocab)


@pytest.mark.parametrize(
    "positive",
    [pytest.param(True, marks=pytest.mark.slow), False],
)
def test_random_split_stress(positive):
    rng = np.random.default_rng(17)
    alphabet = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    for text_len in range(10, 120, 17):
        for parts in (2, 3, 7, min(text_len, 23)):
            for _ in range(3):
                s = "".join(rng.choice(alphabet, size=text_len))
                vocab = random_split_vocab(rng, s, parts)
                if not positive and len(vocab) > 1:
                    vocab = vocab[1:]
                run_both(s, vocab)


def test_random_with_spaces_and_punct():
    rng = np.random.default_rng(5)
    chars = list("ab cd-ef.g  h中,х▁")
    for _ in range(40):
        n = int(rng.integers(1, 200))
        s = "".join(rng.choice(chars) for _ in range(n))
        vocab_pieces = set()
        words = [w for w in s.replace("-", " ").replace(".", " ").replace(",", " ").split() if w]
        for w in words:
            for ln in (1, 2, 3):
                for st in range(0, max(1, len(w) - ln + 1), 2):
                    piece = w[st : st + ln]
                    if piece and "#" not in piece:
                        vocab_pieces.add(piece if st == 0 else "##" + piece)
        vocab = sorted(vocab_pieces) + ["-", ",", "."]
        # Model the reference: drop all-punct multi tokens implicitly handled.
        run_both(s, vocab)


def test_medium_scale_stress():
    rng = np.random.default_rng(23)
    words = ["".join(rng.choice(list("abcdefgh"), size=int(rng.integers(1, 12)))) for _ in range(500)]
    text = " ".join(rng.choice(words) for _ in range(4000))
    vocab = set()
    for w in words[: len(words) // 2]:
        vocab.add(w[:3] if len(w) > 3 else w)
        if len(w) > 3:
            vocab.add("##" + w[3:])
        for c in "abcdefgh":
            vocab.add(c)
            vocab.add("##" + c)
    run_both(text, sorted(vocab))
