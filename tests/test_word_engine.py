"""Differential tests for the word-centric (deduped-unit) fast engine.

Also proves the unit-independence decomposition itself: concatenating
per-unit oracle streams equals the whole-text oracle stream.
"""

import numpy as np
import pytest

from wordpiece_tpu.core import unicode as uni
from wordpiece_tpu.core.oracle import encode_oracle, encode_oracle_str
from wordpiece_tpu.core.vocab import parse_vocab
from wordpiece_tpu.engine_word import WordEncoder
from wordpiece_tpu.runtime import loader

pytestmark = pytest.mark.skipif(not loader.available(), reason="native runtime required")

UNK = -1


def run_both(text: str, vocab_lines):
    vocab = parse_vocab(vocab_lines)
    raw = text.encode("utf-8")
    want = encode_oracle_str(raw, vocab)
    got = WordEncoder(vocab).encode_bytes(raw).tolist()
    assert got == want, f"text={text!r} got={got[:40]} want={want[:40]}"
    return got


def test_unit_decomposition_matches_oracle():
    """concat(oracle(unit)) == oracle(text) for arbitrary mixed text."""
    rng = np.random.default_rng(7)
    chars = list("ab cde-f.g  h中文х▁ ,q")
    vocab = parse_vocab(
        ["a", "b", "c", "##a", "##b", "##c", "##d", "de", "-", ",", ".", "中", "文", "х", "q", "##q", "f", "g", "h"]
    )
    for _ in range(50):
        n = int(rng.integers(1, 120))
        s = "".join(rng.choice(chars) for _ in range(n))
        raw = s.encode()
        want = encode_oracle_str(raw, vocab)
        seg = loader.segment_dedupe(raw)
        occ, ustart, ulen, _ = seg
        got = []
        per_unit = {}
        for u in range(len(ustart)):
            unit = raw[ustart[u] : ustart[u] + ulen[u]]
            per_unit[u] = encode_oracle_str(unit, vocab)
        for u in occ:
            got.extend(per_unit[int(u)])
        assert got == want, f"text={s!r}"


@pytest.mark.parametrize(
    "text,vocab,expected",
    [
        ("aaaa", ["aaaa", "aaa", "aa", "a"], [0]),
        ("abcdef", ["bcde", "ac", "def", "bc", "##bcdef", "a"], [5, 4]),
        ("   aaaa  ", ["aa", "##aa"], [0, 1]),
        ("aaaa", ["aa", "##a"], [0, 1, 1]),
        ("self-made", ["self", "made", "-", "##-", "##made"], [0, 2, 1]),
        ("abc a abc abd", ["a", "abd"], [UNK, 0, UNK, 1]),
        ("abcdef", ["a", "##bcdef", "ab", "##c", "##d", "##e", "##f"], [2, 3, 4, 5, 6]),
        ("привет мир", ["при", "##вет", "мир"], [0, 1, 2]),
        ("中文", ["中", "文"], [0, 1]),
        ("中ab", ["中ab", "中", "a", "##b", "ab"], [0]),
        ("-a", ["-a", "-", "a"], [1, 2]),
        ("abcdefghij zz", ["ab", "zz"], [UNK, 1]),
        ("the the the", ["the"], [0, 0, 0]),
    ],
)
def test_word_engine_unit_vectors(text, vocab, expected):
    got = run_both(text, vocab)
    assert got == expected


def test_word_engine_long_unit_overflow():
    # A unit longer than the widest bucket exercises the scalar fallback.
    long_word = "ab" * 200
    run_both(long_word + " zz", ["ab", "##ab", "zz"])


def test_word_engine_random_stress():
    rng = np.random.default_rng(19)
    alphabet = np.array(list("abcdef"))
    for trial in range(25):
        words = [
            "".join(rng.choice(alphabet, size=int(rng.integers(1, 14))))
            for _ in range(30)
        ]
        text = " ".join(rng.choice(words) for _ in range(200))
        vocab = set()
        for w in words[:20]:
            vocab.add(w[:2])
            if len(w) > 2:
                vocab.add("##" + w[2:4])
            for c in "abcdef":
                vocab.add(c)
                if trial % 2:
                    vocab.add("##" + c)
        run_both(text, sorted(vocab))


def test_word_engine_multilingual():
    text = "привет 中文 mixed▁tokens, punct-uation! 漢字かな"
    vocab = [
        "[UNK]", "привет", "中", "文", "mixed", "tokens", "punct", "##uation",
        "-", ",", "!", "漢", "字", "かな", "か", "##な",
    ]
    run_both(text, vocab)


def test_word_engine_unk_rollback_in_units():
    run_both("abcdex abcde", ["ab", "##c", "##d", "##e", "abcde"])
    run_both("中xyq 中", ["中", "x", "##y"])


def test_dedupe_session_matches_oneshot():
    """Chunked session segmentation == one-shot: same occurrence strings,
    same global unique count, new units reported exactly once."""
    from wordpiece_tpu.bench.corpus import make_corpus

    data = make_corpus(2_500_000)
    occ_ref, us, ul, _ = loader.segment_dedupe(data)
    ref_units = [data[int(s) : int(s) + int(l)] for s, l in zip(us, ul)]

    sess = loader.DedupeSession()
    units: list[bytes] = []
    occs = []
    b = 0
    while b < len(data):
        e = min(len(data), b + 300_000)
        while e < len(data) and data[e] != 0x20:
            e += 1
        chunk = data[b:e]
        occ, ns, nl, _ = sess.segment(chunk)
        occs.append(occ)
        for s, l in zip(ns.tolist(), nl.tolist()):
            units.append(chunk[s : s + l])
        b = e
    occ_all = np.concatenate(occs)
    assert sess.n_total == len(units) == len(ref_units)
    assert occ_all.shape == occ_ref.shape
    got = [units[i] for i in occ_all.tolist()]
    want = [ref_units[i] for i in occ_ref.tolist()]
    assert got == want
    sess.close()


def test_word_engine_pipelined_multichunk_matches_oracle():
    """A corpus spanning several pipeline chunks (exercising the session,
    the worker-thread prepares, and the hybrid host-scalar path for small
    first-seen batches) must match the scalar oracle id-for-id."""
    from wordpiece_tpu.bench.corpus import make_corpus, make_vocab

    data = make_corpus(5_000_000)
    vocab = parse_vocab(make_vocab(data, vocab_size=8000))
    enc = WordEncoder(vocab)
    assert len(data) > enc.PIPELINE_CHUNK  # really multi-chunk
    got = enc.encode_bytes(data)
    want = loader.VocabHandle(vocab).encode(uni.decode_utf8(data))
    assert got.shape == want.shape
    assert np.array_equal(got, want)


def test_word_engine_hybrid_scalar_threshold_paths():
    """Force both dispatch policies on the same multi-chunk input."""
    from wordpiece_tpu.bench.corpus import make_corpus, make_vocab

    data = make_corpus(4_200_000)
    vocab = parse_vocab(make_vocab(data, vocab_size=4000))
    dev = WordEncoder(vocab)
    dev.SCALAR_MAX_NEW = 0  # device kernels for every chunk
    host = WordEncoder(vocab)
    host.SCALAR_MAX_NEW = 1 << 30  # host oracle for all chunks after the first
    a = dev.encode_bytes(data)
    b = host.encode_bytes(data)
    assert np.array_equal(a, b)


def test_word_engine_random_bytes_fuzz():
    """Arbitrary (often invalid-UTF-8) byte soup through the FULL session
    pipeline must match the scalar oracle — exercises invalid-byte
    dropping inside unit segmentation, the dedupe session, and stitching."""
    rng = np.random.default_rng(29)
    vocab = parse_vocab(
        ["[UNK]", "a", "b", "ab", "##a", "##b", "-", ".", "中", "х", "##х"]
        + [chr(c) for c in range(99, 122)]
    )
    enc = WordEncoder(vocab)
    handle = loader.VocabHandle(vocab)
    for trial in range(30):
        n = int(rng.integers(1, 4000))
        # Mix: pure random bytes, ASCII-heavy, and multi-byte-heavy.
        if trial % 3 == 0:
            data = bytes(rng.integers(0, 256, size=n, dtype=np.uint8))
        elif trial % 3 == 1:
            data = bytes(rng.integers(32, 127, size=n, dtype=np.uint8))
        else:
            data = ("х中a " * (n // 8)).encode() + bytes(rng.integers(128, 256, size=n % 8, dtype=np.uint8))
        got = enc.encode_bytes(data).tolist()
        want = handle.encode(uni.decode_utf8(data)).tolist()
        assert got == want, f"trial={trial} len={n}"


def test_word_engine_persistent_cache():
    """cache=True: repeated and novel content across calls stays exact."""
    from wordpiece_tpu.bench.corpus import make_corpus, make_vocab

    data = make_corpus(400_000)
    vocab = parse_vocab(make_vocab(data, vocab_size=3000))
    handle = loader.VocabHandle(vocab)
    enc = WordEncoder(vocab, cache=True)
    half = len(data) // 2
    while data[half] != 0x20:
        half += 1
    for chunk in (data[:half], data[:half], data[half:], data, b"zzznovel word"):
        got = enc.encode_bytes(chunk)
        want = handle.encode(uni.decode_utf8(chunk))
        assert np.array_equal(got, want)
    enc.reset_cache()
    got = enc.encode_bytes(data)
    assert np.array_equal(got, handle.encode(uni.decode_utf8(data)))


def test_word_engine_edge_inputs():
    """unk_id=-1 (no [UNK] in vocab), empty/whitespace-only input, and a
    ~1MB single unit (overflow scalar path) through the session pipeline."""
    vocab = parse_vocab(["a", "b", "ab"])
    assert vocab.unk_token_id == -1  # reference default, src/utils.hpp:30,33
    enc = WordEncoder(vocab)
    h = loader.VocabHandle(vocab)
    for text in (b"ab zz a", b"", b"   ", b"\n\t  ", b"zzz", b"ab" * 500000 + b" q"):
        got = enc.encode_bytes(text).tolist()
        want = h.encode(uni.decode_utf8(text)).tolist()
        assert got == want, text[:20]


def test_verify_emit_numpy_fallback(monkeypatch):
    """The numpy verify path (native verify_emit unavailable) must return
    the emit matrix unchanged on clean inputs — including the all-UNK /
    no-emissions corner (regression: an early `return` dropped a bucket)
    — and repair corrupted rows via the scalar oracle."""
    vocab = parse_vocab(["[UNK]", "ab", "##c", "x"])
    enc = WordEncoder(vocab)
    monkeypatch.setattr(loader, "verify_emit", lambda *a, **k: None)

    # Clean emissions pass through.
    mat = np.full((2, 7), 32, dtype=np.int32)
    mat[0, :3] = [ord("a"), ord("b"), ord("c")]
    mat[1, 0] = ord("x")
    emit = np.full((2, 7), -2, dtype=np.int32)
    emit[0, :2] = [1, 2]
    emit[1, 0] = 3
    out = enc._verify_emit(mat, emit)
    assert out is not None and (out == emit).all()

    # No emissions at all (every cell -2): still returns the matrix.
    empty = np.full((2, 7), -2, dtype=np.int32)
    out = enc._verify_emit(mat, empty)
    assert out is not None and (out == empty).all()

    # A corrupted token id (string mismatch) is repaired by the oracle.
    bad = emit.copy()
    bad[1, 0] = 1  # claims "ab" but the unit is "x"
    out = enc._verify_emit(mat, bad)
    assert out[1, 0] == 3 and (out[0] == emit[0]).all()

    # Out-of-range id likewise.
    oob = emit.copy()
    oob[0, 0] = 99
    out = enc._verify_emit(mat, oob)
    assert out[0, 0] == 1 and out[0, 1] == 2


def test_full_encode_with_numpy_verify(monkeypatch):
    """End-to-end encode with the native verifier disabled exercises the
    numpy verify branch across pipeline chunks."""
    monkeypatch.setattr(loader, "verify_emit", lambda *a, **k: None)
    run_both(
        "the quick brown fox zz9 jumps over the lazy dog " * 20,
        ["[UNK]", "the", "quick", "brown", "fox", "jump", "##s", "over",
         "lazy", "dog", "z", "##z", "##9"],
    )


def test_device_role_auto_matches_primary():
    """device_role="auto" is the same pipeline with a fetch deadline; on
    a healthy link it must emit identical ids to "primary"."""
    from wordpiece_tpu.bench.corpus import make_corpus, make_vocab
    from wordpiece_tpu.core.vocab import parse_vocab
    from wordpiece_tpu.engine_word import WordEncoder

    corpus = make_corpus(400_000)
    vocab = parse_vocab(make_vocab(corpus, vocab_size=3000))
    want = WordEncoder(vocab, device_role="primary").encode_bytes(corpus)
    enc = WordEncoder(vocab, device_role="auto")
    got = enc.encode_bytes(corpus)
    np.testing.assert_array_equal(got, want)
    assert enc.device_fallbacks == 0


def test_device_role_auto_rescues_stalled_fetch():
    """A device fetch that raises a device/link error (or never returns)
    must be rescued by the host oracle with identical output — an encode
    always completes.  Exercises the multi-chunk pipeline; only
    device-dispatching chunks hit the failing fetch, and after
    DEVICE_DEAD_AFTER consecutive rescues the link latches dead so later
    chunks skip dispatch entirely (bounded rescue count)."""
    import jax.errors

    from wordpiece_tpu.bench.corpus import make_corpus, make_vocab
    from wordpiece_tpu.core.vocab import parse_vocab
    from wordpiece_tpu.engine_word import WordEncoder
    from wordpiece_tpu.runtime import loader

    corpus = make_corpus(4_200_000)
    vocab = parse_vocab(make_vocab(corpus, vocab_size=4000))
    enc = WordEncoder(vocab, device_role="auto")

    def broken_fetch(handle):
        raise jax.errors.JaxRuntimeError(
            "simulated tunnel stall: INTERNAL backend error"
        )

    enc._fetch_buckets = broken_fetch
    got = enc.encode_bytes(corpus)
    want = loader.VocabHandle(vocab).encode(loader.decode_utf8(corpus))
    np.testing.assert_array_equal(got, want)
    assert 1 <= enc.device_fallbacks <= enc.DEVICE_DEAD_AFTER
    assert enc._device_dead or enc.device_fallbacks < enc.DEVICE_DEAD_AFTER
    assert "INTERNAL" in (enc.last_rescue_cause or "")


def test_device_role_auto_rescues_timeout():
    """A device fetch that BLOCKS past the deadline is rescued via
    TimeoutError (the round-4 axon failure mode: is_ready() never
    transitions, np.asarray hangs).  Uses a tiny instance deadline so
    the test is fast."""
    import time as _time

    from wordpiece_tpu.bench.corpus import make_corpus, make_vocab
    from wordpiece_tpu.core.vocab import parse_vocab
    from wordpiece_tpu.engine_word import WordEncoder
    from wordpiece_tpu.runtime import loader

    corpus = make_corpus(400_000)
    vocab = parse_vocab(make_vocab(corpus, vocab_size=3000))
    enc = WordEncoder(vocab, device_role="auto")
    enc.DEVICE_FETCH_TIMEOUT_S = 0.2
    enc.DEVICE_COMPILE_TIMEOUT_S = 0.2

    def hanging_fetch(handle):
        _time.sleep(30.0)

    enc._fetch_buckets = hanging_fetch
    got = enc.encode_bytes(corpus)
    want = loader.VocabHandle(vocab).encode(loader.decode_utf8(corpus))
    np.testing.assert_array_equal(got, want)
    assert enc.device_fallbacks >= 1
    assert "Timeout" in (enc.last_rescue_cause or "")


def test_device_role_auto_host_bug_propagates():
    """A host-side defect in the compact decode (e.g. IndexError) must
    NOT be silently rescued — only device/link error types are."""
    import pytest

    from wordpiece_tpu.bench.corpus import make_corpus, make_vocab
    from wordpiece_tpu.core.vocab import parse_vocab
    from wordpiece_tpu.engine_word import WordEncoder

    corpus = make_corpus(400_000)
    vocab = parse_vocab(make_vocab(corpus, vocab_size=3000))
    enc = WordEncoder(vocab, device_role="auto")

    def buggy_fetch(handle):
        raise IndexError("host-side decode bug")

    enc._fetch_buckets = buggy_fetch
    with pytest.raises(IndexError):
        enc.encode_bytes(corpus)
    assert enc.device_fallbacks == 0
