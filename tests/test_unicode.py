"""UTF-8 decode + character class conformance tests.

Checks the vectorized decoder against Python's strict codec on valid text
and against hand-derived expectations (matching reference utf8.cpp
semantics) on invalid byte streams.
"""

import numpy as np
import pytest

from wordpiece_tpu.core import unicode as uni


def ref_decode(data: bytes) -> list[int]:
    """Scalar transcription of the reference decode loop (utf8.cpp:130-147)."""
    out = []
    i = 0
    while i < len(data):
        cp, consumed = uni.decode_first(data[i:])
        if cp != uni.INVALID_UNICODE:
            out.append(cp)
        i += consumed
    return out


@pytest.mark.parametrize(
    "s",
    [
        "",
        "hello world",
        "привет мир",
        "日本語のテキスト",
        "中文文本",
        "emoji 🎉🎊 mixed",
        "a\tb\nc d",
        "▁word▁",
        "é combining",
    ],
)
def test_decode_valid(s):
    got = uni.decode_utf8(s.encode("utf-8"))
    expect = np.array([ord(c) for c in s], dtype=np.uint32)
    np.testing.assert_array_equal(got, expect)


@pytest.mark.parametrize(
    "data",
    [
        b"\x80",  # orphan continuation
        b"\xc0\x41",  # 2-byte lead, non-continuation follower
        b"\xc1\xbf",  # overlong 2-byte
        b"\xe0\x80\x80",  # overlong 3-byte
        b"\xed\xa0\x80",  # surrogate
        b"\xf4\x90\x80\x80",  # > U+10FFFF
        b"\xf0\x9f\x8e",  # truncated 4-byte
        b"a\x80\x80b",
        b"\xff\xfe",
        b"ok\xc3",  # truncated at end
        b"\xe2\x96\x81",  # U+2581 valid
        bytes(range(256)),
    ],
)
def test_decode_invalid_matches_scalar(data):
    got = uni.decode_utf8(data)
    expect = np.array(ref_decode(data), dtype=np.uint32)
    np.testing.assert_array_equal(got, expect)


def test_decode_random_bytes_match_scalar():
    rng = np.random.default_rng(17)
    for size in (1, 7, 64, 1024, 65537):
        data = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
        got = uni.decode_utf8(data)
        expect = np.array(ref_decode(data), dtype=np.uint32)
        np.testing.assert_array_equal(got, expect)


def test_decode_random_valid_unicode_roundtrip():
    rng = np.random.default_rng(3)
    cps = []
    while len(cps) < 2000:
        c = int(rng.integers(1, 0x110000))
        if 0xD800 <= c <= 0xDFFF:
            continue
        cps.append(c)
    s = "".join(chr(c) for c in cps)
    got = uni.decode_utf8(s.encode("utf-8"))
    np.testing.assert_array_equal(got, np.array(cps, dtype=np.uint32))
    assert uni.encode_utf8(got) == s.encode("utf-8")


def test_space_classes():
    assert uni.is_space(np.array([32, 9, 10, 11, 12, 13, 9601])).all()
    assert not uni.is_space(np.array([ord("a"), 160, 8239, 0x3000])).any()


def test_punct_classes():
    ok = [ord(c) for c in "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"]
    ok += [183, 171, 187, 8249, 8250, 8208, 8230, 8248]
    assert uni.is_punctuation(np.array(ok)).all()
    bad = [ord("a"), ord("0"), 32, 8251, 8207, 0x4E00]
    assert not uni.is_punctuation(np.array(bad)).any()


def test_chinese_classes():
    ok = [0x4E00, 0x9FFF, 0x3400, 0x20000, 0xF900, 0x2F800]
    assert uni.is_chinese(np.array(ok)).all()
    assert not uni.is_chinese(np.array([0x3040, ord("a"), 0xAC00])).any()  # kana/hangul excluded


def test_spacing_union():
    cps = np.array([32, ord("-"), 0x4E00, ord("a"), 0x30A2])
    np.testing.assert_array_equal(
        uni.is_spacing_char(cps), np.array([True, True, True, False, False])
    )


def test_starts_with_space():
    assert uni.starts_with_space(b" x")
    assert uni.starts_with_space("▁x".encode())
    assert not uni.starts_with_space(b"x ")
    assert not uni.starts_with_space(b"\x80 ")  # invalid first char is not a space
