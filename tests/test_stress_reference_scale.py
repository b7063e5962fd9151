"""Reference-scale differential stress (tests/tests.cpp:256-272 analogue).

The reference's big stress: randomString over a-z (10M chars, no spaces),
randomSplit into a ~30k-piece vocab that fully covers the string (each
piece bare at offset 0 and ##-prefixed), positive (complete vocab) and
negative (one entry erased) — asserting only linear == fast.  Here the
native scalar encoder is the oracle and BOTH device engines are diffed
against it, in two regimes:

 1. the exact reference shape — one giant space-free unit with
    multi-hundred-char vocab tokens (exercises the overflow/scalar unit
    routes and the long-token linear fallback);
 2. a spaced variant at the same scale — 10M chars, ~30k-token
    random-split vocab over Zipf-sampled words (exercises the device
    paths end to end: dedupe sessions across pipeline chunks, SA batch
    boundaries, UNK-heavy negative tails).

All tests are deterministic (fixed seeds, reference's mt19937(17) spirit).
Tiers: the 1-2M-char shapes run in the default suite (~1 min on the
2-vCPU CI host); the full 10M reference scale stays behind -m slow
(several minutes each).
"""

from __future__ import annotations

import numpy as np
import pytest

from wordpiece_tpu.core import unicode as uni
from wordpiece_tpu.core.vocab import parse_vocab
from wordpiece_tpu.runtime import loader

if not loader.available():  # pragma: no cover
    pytest.skip("native runtime required for oracle-scale stress", allow_module_level=True)


def _random_string(rng: np.random.Generator, n: int) -> str:
    return "".join(np.array(list("abcdefghijklmnopqrstuvwxyz"))[rng.integers(0, 26, size=n)])


def _random_split(s: str, rng: np.random.Generator, parts: int) -> list[str]:
    """The reference's randomSplit (tests/tests.cpp:111-135): cut at
    `parts` random borders; first piece also bare, every piece ##-form."""
    borders = {len(s)}
    while len(borders) < parts:
        borders.add(int(rng.integers(1, len(s))))
    vocab: set[str] = set()
    start = 0
    for b in sorted(borders):
        if start == 0:
            vocab.add(s[start:b])
        vocab.add("##" + s[start:b])
        start = b
    return sorted(vocab)


def _oracle_ids(vocab, data: bytes) -> np.ndarray:
    cps = loader.decode_utf8(data)
    return loader.VocabHandle(vocab).encode(cps)


def _diff(got: np.ndarray, want: np.ndarray, label: str) -> None:
    got = np.asarray(got)
    if got.shape[0] != want.shape[0]:
        raise AssertionError(
            f"{label}: count mismatch {got.shape[0]} vs {want.shape[0]}"
        )
    if not np.array_equal(got, want):
        i = int(np.argmax(got != want))
        raise AssertionError(
            f"{label}: first divergence at id #{i}: "
            f"got {got[max(0, i-5):i+5].tolist()} want {want[max(0, i-5):i+5].tolist()}"
        )


@pytest.mark.parametrize(
    "text_len,parts",
    [
        (300_000, 10_000),
        pytest.param(1_000_000, 30_000, marks=pytest.mark.slow),
        pytest.param(10_000_000, 30_000, marks=pytest.mark.slow),
    ],
)
def test_reference_shape_single_unit(text_len, parts):
    """Regime 1: the exact reference stress shape (one space-free unit)."""
    from wordpiece_tpu.api import make_encoder
    from wordpiece_tpu.engine_linear import LinearEncoder

    rng = np.random.default_rng(17)
    s = _random_string(rng, text_len)
    split = _random_split(s, rng, parts)
    for positive in (True, False):
        lines = split if positive else split[1:]
        vocab = parse_vocab(lines)
        data = s.encode()
        want = _oracle_ids(vocab, data)
        assert want.shape[0] > 0
        assert vocab.unk_token_id == -1  # no [UNK] line in split vocabs
        fast = make_encoder(vocab, engine="fast")
        _diff(fast.encode_bytes(data), want, f"fast single-unit {text_len} pos={positive}")
        lin = LinearEncoder(vocab)
        assert lin.max_len > lin.MAX_SLOT_LEN  # long-token fallback engages
        _diff(lin.encode_bytes(data), want, f"linear single-unit {text_len} pos={positive}")


def _spaced_corpus_and_vocab(rng: np.random.Generator, size_chars: int):
    """Zipf-sampled words of random a-z text; vocab = random split pieces
    of every distinct word (full coverage -> positive)."""
    n_words = 24_000
    lens = np.clip(rng.poisson(6.0, size=n_words) + 1, 1, 16)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    picks = rng.integers(0, 26, size=int(lens.sum()))
    joined = "".join(letters[picks])
    offs = np.concatenate([[0], np.cumsum(lens)])
    words = [joined[offs[i]: offs[i + 1]] for i in range(n_words)]
    # distinct only (random collisions possible at short lengths)
    words = sorted(set(words))
    ranks = np.arange(1, len(words) + 1)
    p = (1.0 / ranks) / (1.0 / ranks).sum()

    pieces: set[str] = set()
    for w in words:
        cuts = sorted(
            set(rng.integers(1, len(w), size=int(rng.integers(1, 4))).tolist())
            if len(w) > 1
            else []
        )
        start = 0
        for b in cuts + [len(w)]:
            piece = w[start:b]
            pieces.add(piece if start == 0 else "##" + piece)
            start = b

    chunks = []
    total = 0
    warr = np.array(words)
    while total < size_chars:
        draw = warr[rng.choice(len(words), size=4096, p=p)]
        line = " ".join(draw.tolist())
        chunks.append(line)
        total += len(line) + 1
    text = " ".join(chunks)[:size_chars]
    text = text.rstrip()  # no cut mid-word issues for coverage: trailing partial word
    # The trailing cut can create a word not covered by the vocab — that's
    # fine (it just UNKs); the oracle defines the expected output either way.
    return text, sorted(pieces)


@pytest.mark.parametrize(
    "size_chars",
    [
        1_000_000,
        pytest.param(2_000_000, marks=pytest.mark.slow),
        pytest.param(10_000_000, marks=pytest.mark.slow),
    ],
)
def test_spaced_device_paths(size_chars):
    """Regime 2: spaced text with a ~30k-token vocab; both device
    engines (pipelined word engine + SA batches) vs the oracle, positive
    and negative.  1M chars is the default-suite tier; 2M and 10M (the
    exact reference scale) are the slow tier."""
    from wordpiece_tpu.api import make_encoder
    from wordpiece_tpu.engine_linear import LinearEncoder

    rng = np.random.default_rng(17)
    text, vocab_lines = _spaced_corpus_and_vocab(rng, size_chars)
    assert len(vocab_lines) >= 25_000
    data = text.encode()
    for positive in (True, False):
        lines = list(vocab_lines)
        if not positive:
            # erase a frequently-used continuation piece -> UNK-heavy tail
            for i, ln in enumerate(lines):
                if ln.startswith("##") and len(ln) == 3:
                    del lines[i]
                    break
        vocab = parse_vocab(lines)
        want = _oracle_ids(vocab, data)
        fast = make_encoder(vocab, engine="fast")
        _diff(fast.encode_bytes(data), want, f"fast spaced {size_chars} pos={positive}")
        lin = LinearEncoder(vocab)
        assert lin.max_len <= lin.MAX_SLOT_LEN  # device path engages
        _diff(lin.encode_bytes(data), want, f"linear spaced {size_chars} pos={positive}")


@pytest.mark.parametrize(
    "text_lens",
    [
        (100_000, 500_000),
        pytest.param((1_000_000,), marks=pytest.mark.slow),
    ],
)
def test_reference_mid_scale_matrix(text_lens):
    """The reference's 100k-1M sweep (tests/tests.cpp:256-263) at its own
    parts count, positive + negative, fast engine vs oracle."""
    from wordpiece_tpu.api import make_encoder

    rng = np.random.default_rng(17)
    for text_len in text_lens:
        s = _random_string(rng, text_len)
        split = _random_split(s, rng, min(30_000, text_len // 10))
        for positive in (True, False):
            lines = split if positive else split[1:]
            vocab = parse_vocab(lines)
            data = s.encode()
            want = _oracle_ids(vocab, data)
            got = make_encoder(vocab, engine="fast").encode_bytes(data)
            _diff(got, want, f"fast mid {text_len} pos={positive}")
