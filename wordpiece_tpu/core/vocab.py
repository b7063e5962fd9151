"""Vocabulary model: parsing, token classification, packed device arrays.

Mirrors the reference's vocabulary semantics (src/utils.cpp:81-146):
 - one token per line; the id is the 0-based line index;
 - a token starting with "##" is a *suffix* (continuation) token and the
   "##" is stripped from its match string;
 - "[x...]" with total length > 2 is a *special* token;
 - a token is *malformed* if it contains invalid unicode or if it consists
   solely of punctuation/space codepoints and is longer than one codepoint;
 - the UNK id is the line index of the literal "[UNK]" line, else -1;
 - special and malformed tokens never participate in matching
   (src/fast.cpp:28-30, src/linear.cpp:179);
 - an empty match string raises (src/utils.cpp:100).

On top of the semantic model this module builds the *device index*: a
replicated open-addressing hash table over (token string, table kind) that
the TPU match kernels probe, plus a packed (vocab, max_len) codepoint
matrix used for exact match verification.  The hash is a pair of 32-bit
polynomial rolling hashes (mod 2^32); the host build proves there are no
intra-vocabulary key collisions (rebuilding with fresh multipliers if any),
so device probes can never produce a false miss; false hits against
non-vocab text are eliminated by the post-commit verification pass.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

from . import unicode as uni


@dataclasses.dataclass
class Vocabulary:
    """Host-side vocabulary model (analogue of WordPieceVocabulary)."""

    # Ragged token match strings as a list of uint32 arrays (stripped of ##).
    words: list[np.ndarray]
    is_prefix: np.ndarray  # bool[v]
    is_special: np.ndarray  # bool[v]
    is_malformed: np.ndarray  # bool[v]
    unk_token_id: int = -1

    @property
    def size(self) -> int:
        return len(self.words)

    @property
    def active(self) -> np.ndarray:
        """Tokens that participate in matching."""
        return ~(self.is_special | self.is_malformed)

    @property
    def max_len(self) -> int:
        """Longest active token, in codepoints (src/fast.cpp:26-31)."""
        lens = [w.shape[0] for w, a in zip(self.words, self.active) if a]
        return max(lens) if lens else 0


def parse_vocab(lines: Sequence[str | bytes]) -> Vocabulary:
    """Parse vocabulary lines (parseVocab, src/utils.cpp:108-121)."""
    words: list[np.ndarray] = []
    is_prefix = np.ones(len(lines), dtype=bool)
    is_special = np.zeros(len(lines), dtype=bool)
    is_malformed = np.zeros(len(lines), dtype=bool)
    unk_token_id = -1

    for i, line in enumerate(lines):
        raw = line.encode("utf-8") if isinstance(line, str) else bytes(line)
        if raw == b"[UNK]":
            unk_token_id = i
        word = uni.decode_utf8(raw).astype(np.uint32)
        malformed = _has_invalid_bytes(raw)
        if word.shape[0] >= 2 and word[0] == uni.SHARP_SIGN and word[1] == uni.SHARP_SIGN:
            is_prefix[i] = False
            word = word[2:]
        elif word.shape[0] > 2 and word[0] == ord("[") and word[-1] == ord("]"):
            is_special[i] = True
        if word.shape[0] == 0:
            raise ValueError("Vocab word is empty")
        all_punct = bool(np.all(uni.is_punctuation(word) | uni.is_space(word)))
        if malformed or (all_punct and word.shape[0] > 1):
            malformed = True
        is_malformed[i] = malformed
        words.append(word)

    return Vocabulary(
        words=words,
        is_prefix=is_prefix,
        is_special=is_special,
        is_malformed=is_malformed,
        unk_token_id=unk_token_id,
    )


def _has_invalid_bytes(raw: bytes) -> bool:
    """True if the line contains invalid UTF-8 (dropped by decode).

    The reference marks a token malformed when decode produced
    INVALID_UNICODE codepoints (src/utils.cpp:92-94); since our decoder
    drops them, detect by re-encoding length.
    """
    return len(uni.encode_utf8(uni.decode_utf8(raw))) != len(raw)


def read_vocab_file(path: str) -> Vocabulary:
    """readVocabFromFile (src/utils.cpp:123-137): one token per line."""
    with open(path, "rb") as f:
        data = f.read()
    # std::getline splits on '\n' and never yields a trailing empty line.
    lines = data.split(b"\n")
    if lines and lines[-1] == b"":
        lines.pop()
    return parse_vocab(lines)


# ---------------------------------------------------------------------------
# Device index: replicated open-addressing hash table + packed strings.
# ---------------------------------------------------------------------------

_DEFAULT_MULTIPLIERS = (0x01000193, 0x0085EBCA)  # odd 32-bit multipliers


@dataclasses.dataclass
class VocabIndex:
    """Replicated device-side match index (all arrays are host numpy;
    callers device_put them, replicated across the mesh)."""

    # Open-addressing table, linear probing. Empty slots have id == -1.
    table_k1: np.ndarray  # uint32[S]
    table_k2: np.ndarray  # uint32[S]
    table_meta: np.ndarray  # int32[S]: (len << 1) | is_prefix  for the slot
    table_id: np.ndarray  # int32[S]
    # Packed token strings for exact verification: int32[v, max_len], -1 pad.
    packed: np.ndarray
    packed_len: np.ndarray  # int32[v] (0 for inactive tokens)
    mult1: int
    mult2: int
    max_len: int
    max_probe: int  # longest probe chain (host-computed, exact bound)
    unk_token_id: int
    log2_size: int

    @property
    def size(self) -> int:
        return self.table_id.shape[0]


def _hash_pair(word: np.ndarray, m1: int, m2: int) -> tuple[int, int]:
    h1 = np.uint32(0)
    h2 = np.uint32(0)
    mm1 = np.uint32(m1)
    mm2 = np.uint32(m2)
    with np.errstate(over="ignore"):
        for c in word.astype(np.uint32):
            h1 = np.uint32(h1 * mm1 + c)
            h2 = np.uint32(h2 * mm2 + c)
    return int(h1), int(h2)


def build_index(vocab: Vocabulary, *, min_table_size: int = 1 << 10) -> VocabIndex:
    """Build the replicated probe table.

    Guarantees: no two active vocab entries share (k1, k2, len, kind); the
    probe chain bound `max_probe` is exact.  If a full 64-bit key collision
    between *distinct* strings occurs (astronomically unlikely), the build
    retries with fresh multipliers.
    """
    active_ids = np.nonzero(vocab.active)[0]
    n_active = active_ids.shape[0]
    size = max(min_table_size, 1)
    while size < 4 * max(n_active, 1):
        size *= 2
    log2_size = int(size).bit_length() - 1

    rng = np.random.default_rng(0)
    m1, m2 = _DEFAULT_MULTIPLIERS
    for _attempt in range(16):
        ok, built = _try_build(vocab, active_ids, size, m1, m2)
        if ok:
            k1, k2, meta, ids, max_probe = built
            break
        m1 = int(rng.integers(1, 1 << 32)) | 1
        m2 = int(rng.integers(1, 1 << 32)) | 1
    else:  # pragma: no cover - 16 collisions in a row is impossible
        raise RuntimeError("could not build a collision-free vocab index")

    max_len = vocab.max_len
    packed = np.full((vocab.size, max(max_len, 1)), -1, dtype=np.int32)
    packed_len = np.zeros(vocab.size, dtype=np.int32)
    for i in active_ids:
        w = vocab.words[i]
        packed[i, : w.shape[0]] = w.astype(np.int32)
        packed_len[i] = w.shape[0]

    return VocabIndex(
        table_k1=k1,
        table_k2=k2,
        table_meta=meta,
        table_id=ids,
        packed=packed,
        packed_len=packed_len,
        mult1=m1,
        mult2=m2,
        max_len=max_len,
        max_probe=max_probe,
        unk_token_id=vocab.unk_token_id,
        log2_size=log2_size,
    )


def _try_build(vocab, active_ids, size, m1, m2):
    mask = size - 1
    k1 = np.zeros(size, dtype=np.uint32)
    k2 = np.zeros(size, dtype=np.uint32)
    meta = np.full(size, -1, dtype=np.int32)
    ids = np.full(size, -1, dtype=np.int32)
    max_probe = 1
    seen: dict[tuple[int, int, int, int], int] = {}
    for i in active_ids:
        w = vocab.words[i]
        h1, h2 = _hash_pair(w, m1, m2)
        kind = int(vocab.is_prefix[i])
        key = (h1, h2, w.shape[0], kind)
        if key in seen:
            other = vocab.words[seen[key]]
            if other.shape[0] != w.shape[0] or not np.array_equal(other, w):
                return False, None  # true 64-bit collision: rehash
            # Duplicate string+kind: the reference's fast path overwrites,
            # last id wins (src/fast.cpp:33-35).
        seen[key] = i
        m = np.int32((w.shape[0] << 1) | kind)
        bucket = _bucket(h1, h2, kind, w.shape[0], mask)
        probes = 1
        while ids[bucket] >= 0:
            if (
                int(k1[bucket]) == h1
                and int(k2[bucket]) == h2
                and int(meta[bucket]) == int(m)
            ):
                break  # duplicate entry: overwrite below
            bucket = (bucket + 1) & mask
            probes += 1
        k1[bucket] = h1
        k2[bucket] = h2
        meta[bucket] = m
        ids[bucket] = i
        max_probe = max(max_probe, probes)
    return True, (k1, k2, meta, ids, max_probe)


def _bucket(h1: int, h2: int, kind: int, length: int, mask: int) -> int:
    log2 = (mask + 1).bit_length() - 1
    mixed = (h1 ^ ((h2 << 1) & 0xFFFFFFFF) ^ (length * 0x9E3779B1) ^ (kind * 0x85EBCA77)) & 0xFFFFFFFF
    # Fibonacci mixing to spread low-entropy hashes across buckets.
    return ((mixed * 0x9E3779B1) & 0xFFFFFFFF) >> (32 - log2)


def bucket_of(h1, h2, kind, length, mask: int, xp=np):
    """Array version of `_bucket` usable in numpy and jax.numpy."""
    h1 = h1.astype(xp.uint32)
    h2 = h2.astype(xp.uint32)
    mixed = h1 ^ (h2 << xp.uint32(1)) ^ (length.astype(xp.uint32) * xp.uint32(0x9E3779B1)) ^ (
        kind.astype(xp.uint32) * xp.uint32(0x85EBCA77)
    )
    log2 = int(mask + 1).bit_length() - 1
    return ((mixed * xp.uint32(0x9E3779B1)) >> xp.uint32(32 - log2)).astype(xp.int32) & xp.int32(
        mask
    )
