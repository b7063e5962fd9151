"""Space-class (not just 0x20) chunk/shard splitting, and the compact
device-output overflow fallback.

A corpus whose only separators are newlines or U+2581 — plausible for
zh/ja line corpora — must still split into multiple pipeline chunks, two
native MT halves, and balanced multi-host shards (the reference snaps its
chunk boundaries at any space-class char too: is_space covers 9..13, 32
and U+2581, reference src/third_party/utf8.cpp:10-12).
"""

import numpy as np
import pytest

from wordpiece_tpu.core import unicode as uni
from wordpiece_tpu.core.vocab import parse_vocab
from wordpiece_tpu.runtime import loader

pytestmark = pytest.mark.skipif(
    not loader.available(), reason="native runtime required"
)


def _vocab():
    lines = (
        ["[PAD]", "[UNK]", "the", "quick", "brown", "fox", "jump", "##s",
         "over", "lazy", "dog", "an", "and", "a"]
        + [c for c in "abcdefghijklmnopqrstuvwxyz"]
        + ["##" + c for c in "abcdefghijklmnopqrstuvwxyz"]
    )
    return parse_vocab(lines)


# ---------------------------------------------------------------- helpers
def test_find_space_cut_basics():
    assert uni.find_space_cut(b"abc def") == 3
    assert uni.find_space_cut(b"abc\ndef") == 3
    assert uni.find_space_cut(b"abc\tdef") == 3
    assert uni.find_space_cut(b"abc\rdef") == 3
    assert uni.find_space_cut(b"abcdef") == -1
    assert uni.find_space_cut(b"abc def", 4) == -1
    # U+2581 LOWER ONE EIGHTH BLOCK is a space-class codepoint.
    data = "abc▁def".encode()
    assert uni.find_space_cut(data) == 3
    assert data[3:6] == b"\xe2\x96\x81"


def test_find_space_cut_never_mid_codepoint():
    # Continuation bytes (0x80-0xBF) can never match; starting the scan
    # mid-codepoint is safe.  0xE2 inside a longer char can't occur: 0xE2
    # is always a lead byte in valid UTF-8.
    data = "яяя\nяя".encode()  # 2-byte Cyrillic chars, newline separator
    cut = uni.find_space_cut(data)
    assert data[cut : cut + 1] == b"\n"
    # Scan started inside a codepoint still lands on the newline.
    assert uni.find_space_cut(data, 1) == cut


# ------------------------------------------------- word-engine pipelining
@pytest.mark.parametrize("sep", ["\n", "▁"])
def test_pipeline_chunks_on_newline_only_corpus(sep):
    from wordpiece_tpu.engine_word import WordEncoder

    vocab = _vocab()
    rng = np.random.default_rng(3)
    words = [
        "".join(rng.choice(list("abcdefgh"), size=int(rng.integers(1, 12))))
        for _ in range(4000)
    ]
    data = sep.join(words).encode()
    assert b" " not in data

    enc = WordEncoder(vocab)
    enc.PIPELINE_FIRST = 2000
    enc.PIPELINE_CHUNK = 5000
    calls = []
    orig = enc._prepare_chunk

    def counting(chunk, session, first=True):
        calls.append(len(chunk))
        return orig(chunk, session, first)

    enc._prepare_chunk = counting
    got = enc.encode_bytes(data)
    want = loader.VocabHandle(vocab).encode(loader.decode_utf8(data))
    assert np.array_equal(got, want)
    # The corpus must have split into MANY chunks, each near the target
    # size (0x20-only splitting would degrade to one giant chunk).
    assert len(calls) > 5
    assert max(calls) < 3 * enc.PIPELINE_CHUNK


def test_native_mt_split_on_newline_corpus():
    """wp_segment_dedupe_mt must find its middle split on a corpus with
    no 0x20 at all; 2-thread output must equal 1-thread output."""
    words = [f"w{i % 997}x{i % 89}" for i in range(200_000)]
    data = "\n".join(words).encode()
    assert len(data) > (1 << 20) and b" " not in data

    loader.set_n_threads(1)
    try:
        occ1, us1, ul1, ucp1 = loader.segment_dedupe(data)
    finally:
        loader.set_n_threads(2)
    try:
        occ2, us2, ul2, ucp2 = loader.segment_dedupe(data)
    finally:
        loader.set_n_threads(None)
    assert np.array_equal(occ1, occ2)
    assert np.array_equal(us1, us2)
    assert np.array_equal(ul1, ul2)
    assert np.array_equal(ucp1, ucp2)


def test_file_shard_bounds_newline_corpus(tmp_path):
    from wordpiece_tpu.parallel.multihost import file_shard_bounds

    words = [f"tok{i % 1331}" for i in range(30_000)]
    data = "\n".join(words).encode()
    assert b" " not in data
    p = tmp_path / "corpus.txt"
    p.write_bytes(data)

    n_procs = 4
    bounds = [file_shard_bounds(str(p), i, n_procs) for i in range(n_procs)]
    assert bounds[0][0] == 0 and bounds[-1][1] == len(data)
    for (s0, e0), (s1, e1) in zip(bounds, bounds[1:]):
        assert e0 == s1
    # Balanced: every shard within 2x of the even split (0x20-only
    # scanning would collapse all shards into the first).
    target = len(data) / n_procs
    for s, e in bounds:
        assert 0.5 * target < (e - s) < 2 * target
    # Interior boundaries land on a space-class cut.
    for s, _e in bounds[1:]:
        assert data[s] in (0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x20) or data[
            s : s + 3
        ] == b"\xe2\x96\x81"


# --------------------------------------- compact-output overflow fallback
def test_compact_overflow_falls_back_to_full_emit(monkeypatch):
    """Force total emitted ids > compact cap (engine_word.py cap formula:
    min 8192) with a char-level vocabulary so every ~15-char unit emits
    ~15 ids; the engine must take the _fetch_full second round trip and
    still match the oracle.  Runs the REAL pallas kernels in interpret
    mode on CPU (the production TPU path, minus Mosaic codegen)."""
    from wordpiece_tpu import engine_word
    from wordpiece_tpu.engine_word import WordEncoder

    # Char-level only: every multi-char unit emits one id per char.
    vocab = parse_vocab(
        ["[UNK]"]
        + [c for c in "abcdefghijklmnopqrstuvwxyz"]
        + ["##" + c for c in "abcdefghijklmnopqrstuvwxyz"]
    )
    rng = np.random.default_rng(11)
    words = {
        "".join(rng.choice(list("abcdefghijklmnopqrstuvwxyz"), size=15))
        for _ in range(1200)
    }
    data = " ".join(sorted(words)).encode()

    enc = WordEncoder(vocab)
    monkeypatch.setattr(enc, "_use_pallas", lambda: True)
    full_calls = []
    orig_full = enc._fetch_full

    def counting_full(*a, **k):
        full_calls.append(1)
        return orig_full(*a, **k)

    monkeypatch.setattr(enc, "_fetch_full", counting_full)
    got = enc.encode_bytes(data)
    want = loader.VocabHandle(vocab).encode(loader.decode_utf8(data))
    assert np.array_equal(got, want)
    assert full_calls, "compact cap did not overflow; fallback untested"
