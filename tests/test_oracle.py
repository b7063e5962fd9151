"""Oracle conformance: the unit vectors documented by the reference test
suite (tests/tests.cpp:137-217), re-expressed as behavioral facts.

These pin the canonical semantics: greedy MaxMatch (not shortest
sequence), whole-word UNK rollback, punctuation isolation, whitespace
trimming, suffix (##) continuation, and UTF-8 text.
"""

import numpy as np
import pytest

from wordpiece_tpu.core.oracle import encode_oracle_str
from wordpiece_tpu.core.vocab import parse_vocab

UNK = -1


def check(text, vocab_lines, expected):
    vocab = parse_vocab(vocab_lines)
    got = encode_oracle_str(text, vocab)
    assert got == expected, f"text={text!r} vocab={vocab_lines} got={got} want={expected}"


def test_simple():
    check("aaaa", ["aaaa", "aaa", "aa", "a"], [0])
    check("abcdef", ["bcde", "ac", "def", "bc", "bcdef", "a"], [UNK])
    check("abcdef", ["bcde", "ac", "def", "bc", "##bcdef", "a"], [5, 4])
    check("   aaaa  ", ["aa", "##aa"], [0, 1])
    check("   aaaa  ", ["aa"], [UNK])

    check("aaaa", ["aaaa"], [0])
    check("aaaa", ["##aaaa"], [UNK])
    check("aaaa", ["aaaa", "##aaaa", "##aaa", "##aa", "##a"], [0])
    check("aaaa", ["##aaa", "aaaa", "##aa", "##a"], [1])
    check("aaaa", ["aaa", "##aa", "##a", "##aaa"], [0, 2])
    check("aaaa", ["aa", "a", "##aa"], [0, 2])
    check("aaaa", ["aa", "a", "##aaa"], [UNK])
    check("aaaa", ["aa", "##a"], [0, 1, 1])

    check("abcdef", ["##def", "abc"], [1, 0])
    check("abcdef", ["##bcde", "##ac", "##def", "##bc", "##bcdef", "a", "##a"], [5, 4])
    check("abcdef", ["##bcdd", "##ac", "##def", "##bc", "##bcdff", "a"], [5, 3, 2])

    check(
        "djzhoyuhmcij",
        ["d", "##j", "##z", "##h", "##o", "##y", "##u", "##m", "##c", "##i", "##d"],
        [0, 1, 2, 3, 4, 5, 6, 3, 7, 8, 9, 1],
    )


def test_punctuation():
    check("self-made", ["self", "made", "-", "##-", "##made"], [0, 2, 1])
    check("self, made", ["self", "made", ",", "##,", "##made"], [0, 2, 1])
    check("self  , made", ["self", "made", ",", "##,", "##made"], [0, 2, 1])


def test_non_splitted():
    check("abc", ["a", "abd"], [UNK])
    check("abc a abc abd", ["a", "abd"], [UNK, 0, UNK, 1])
    check(
        "abcdef",
        ["bcde", "ac", "def", "bc", "bcdef", "##a", "##b", "##c", "##d"],
        [UNK],
    )


def test_max_match():
    # Greedy MaxMatch, not shortest-sequence (tests.cpp:178-206).
    check("abcdef", ["a", "##bcdef", "ab", "##c", "##d", "##e", "##f"], [2, 3, 4, 5, 6])
    check("abcdef abc abcd", ["abcd", "def", "abc"], [UNK, 2, 0])


def test_utf8():
    check("привет мир", ["привет", "мир"], [0, 1])
    check("привет мир", ["при", "##вет", "мир"], [0, 1, 2])
    check(
        "токенизация это круто",
        ["ток", "крут", "это", "##за", "##ция", "ция"],
        [UNK, 2, UNK],
    )
    check(
        "токенизация это круто",
        ["ток", "крут", "это", "##за", "##ени", "##о", "##ция", "ция"],
        [0, 4, 3, 6, 2, 1, 5],
    )


def test_special_tokens_never_match():
    # [UNK] is a special token: literal "[UNK]" text cannot match it;
    # '[' is punctuation so it becomes its own word.
    check("x", ["[UNK]", "y"], [0])
    vocab = parse_vocab(["[UNK]", "x"])
    assert vocab.unk_token_id == 0
    assert vocab.is_special[0]


def test_malformed_all_punct_token_excluded():
    # "--" is all-punctuation with len>1 => malformed, excluded from match.
    vocab = parse_vocab(["--", "-"])
    assert vocab.is_malformed[0]
    assert not vocab.is_malformed[1]
    check("--", ["--", "-"], [1, 1])


def test_chinese_chars_are_isolated_words():
    check("中文", ["中", "文"], [0, 1])
    check("中文", ["中文"], [UNK, UNK])  # each CJK char matched separately
    check("a中b", ["a", "b", "中"], [0, 2, 1])


def test_cjk_window_extension_quirk():
    # The probe window at a CJK char extends into following non-spacing
    # chars (src/fast.cpp:54-60 checks positions > begin only), so a vocab
    # token "中ab" CAN match starting at the CJK char.
    check("中ab", ["中ab", "中", "a", "##b", "ab"], [0])


def test_punctuation_window_is_one():
    # Punctuation probes only length 1: "-a" never matches at '-'.
    check("-a", ["-a", "-", "a"], [1, 2])


def test_unk_token_id_from_vocab():
    vocab_lines = ["a", "[UNK]", "b"]
    check("z", vocab_lines, [1])
    vocab = parse_vocab(vocab_lines)
    assert vocab.unk_token_id == 1


def test_empty_vocab_word_raises():
    with pytest.raises(ValueError):
        parse_vocab([""])
    with pytest.raises(ValueError):
        parse_vocab(["##"])


def test_long_word_unk_advance():
    # Word longer than max_len: fail advances by the probe window (capped
    # at max_len) then skips to the next word boundary.
    check("abcdefghij zz", ["ab", "zz"], [UNK, 1])


def test_suffix_table_at_continuation():
    # After a matched piece, continuations use the suffix table only.
    check("abc", ["abc", "a", "bc"], [0])
    check("abc", ["a", "bc"], [UNK])  # "bc" is prefix-form, not ##bc
    check("abc", ["a", "##bc"], [0, 1])
