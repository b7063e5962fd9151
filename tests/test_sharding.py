"""Data-parallel sharding tests on the virtual 8-device CPU mesh.

Asserts the invariant the reference enforces with space-snapped chunks
(src/fast.cpp:101-138): the concatenation of per-shard id streams equals
the single-shard result, for any shard count.
"""

import jax
import numpy as np
import pytest

from wordpiece_tpu.core import unicode as uni
from wordpiece_tpu.core.oracle import encode_oracle
from wordpiece_tpu.core.vocab import parse_vocab
from wordpiece_tpu.parallel.sharding import (
    ShardedFastEncoder,
    make_mesh,
    shard_codepoints,
    split_whitespace_safe,
)


def test_split_whitespace_safe_boundaries():
    text = "aaa bbb ccc ddd eee fff ggg hhh"
    cps = uni.decode_utf8(text.encode()).astype(np.int32)
    space = np.asarray(uni.is_space(cps.astype(np.uint32)))
    starts, ends = split_whitespace_safe(cps, space, 4)
    assert starts[0] == 0 and ends[-1] == len(cps)
    for s, e in zip(starts[1:], ends[:-1]):
        assert s == e
    for e in ends[:-1]:
        if e < len(cps):
            assert space[e]  # boundary lands on a space


def test_split_long_spaceless_run():
    cps = uni.decode_utf8(b"x" * 100).astype(np.int32)
    space = np.asarray(uni.is_space(cps.astype(np.uint32)))
    starts, ends = split_whitespace_safe(cps, space, 4)
    # No space anywhere: first chunk takes everything.
    assert ends[0] == 100 and all(s == e for s, e in zip(starts[1:], ends[1:]))


@pytest.mark.parametrize("n_shards", [1, 2, 5, 8])
def test_sharded_equals_oracle(n_shards):
    rng = np.random.default_rng(11)
    words = ["".join(rng.choice(list("abcdef"), size=int(rng.integers(1, 9)))) for _ in range(80)]
    text = " ".join(rng.choice(words) for _ in range(600))
    vocab_lines = sorted(
        {w[:2] for w in words} | {"##" + w[2:] for w in words if len(w) > 2} | {"##" + c for c in "abcdef"} | set("abcdef")
    )
    vocab = parse_vocab(vocab_lines)
    cps = uni.decode_utf8(text.encode()).astype(np.int32)

    mesh = make_mesh(n_shards, devices=jax.devices()[:n_shards])
    enc = ShardedFastEncoder(vocab, mesh=mesh)
    got = enc.encode_codepoints(cps).tolist()
    want = encode_oracle(cps, vocab)
    assert got == want


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


def test_sharded_word_encoder_matches_oracle():
    from wordpiece_tpu.parallel.word_sharding import ShardedWordEncoder
    from wordpiece_tpu.runtime import loader
    from wordpiece_tpu.core.oracle import encode_oracle_str

    if not loader.available():
        pytest.skip("native runtime required")
    rng = np.random.default_rng(4)
    words = ["".join(rng.choice(list("abcdefg"), size=int(rng.integers(1, 10)))) for _ in range(60)]
    text = " ".join(rng.choice(words) for _ in range(500)) + " 中文 mix-ed"
    vocab_lines = sorted(
        {w[:2] for w in words} | {"##" + w[2:] for w in words if len(w) > 2}
        | {"##" + c for c in "abcdefg"} | set("abcdefg") | {"中", "文", "mix", "##ed", "-"}
    )
    vocab = parse_vocab(vocab_lines)
    enc = ShardedWordEncoder(vocab)
    got = enc.encode_bytes(text.encode()).tolist()
    want = encode_oracle_str(text, vocab)
    assert got == want


def test_sharded_word_encoder_2d_matches_oracle():
    """Word engine on a (data=4, vocab=2) mesh: table rows partitioned
    across the vocab axis, partial matches pmax-combined."""
    from jax.sharding import Mesh
    from wordpiece_tpu.parallel.word_sharding import ShardedWordEncoder
    from wordpiece_tpu.runtime import loader
    from wordpiece_tpu.core.oracle import encode_oracle_str

    if not loader.available():
        pytest.skip("native runtime required")
    rng = np.random.default_rng(11)
    words = ["".join(rng.choice(list("abcdefgh"), size=int(rng.integers(1, 12)))) for _ in range(90)]
    text = " ".join(rng.choice(words) for _ in range(700)) + " 中文 mix-ed punct,"
    vocab_lines = sorted(
        {w[:3] for w in words} | {"##" + w[3:] for w in words if len(w) > 3}
        | {"##" + c for c in "abcdefgh"} | set("abcdefgh")
        | {"中", "文", "mix", "##ed", "-", ","}
    )
    vocab = parse_vocab(vocab_lines)
    mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("data", "vocab"))
    enc = ShardedWordEncoder(vocab, mesh=mesh)
    got = enc.encode_bytes(text.encode()).tolist()
    want = encode_oracle_str(text, vocab)
    assert got == want


def test_shard_word_tables_partition_exact():
    """Every active token appears in exactly one vocab partition slot."""
    from wordpiece_tpu.core.length_tables import build_length_tables
    from wordpiece_tpu.parallel.word_sharding import shard_word_tables

    vocab = parse_vocab(["[UNK]", "a", "ab", "abc", "##a", "##ab", "b", "##b", "cd", "##cd", "x"])
    tables = build_length_tables(vocab)
    for n_vocab in (2, 3, 4):
        k1p, k2p, tidp, offs = shard_word_tables(tables, n_vocab)
        assert k1p.shape[0] % n_vocab == 0
        ids = tidp[tidp >= 0]
        ref_ids = tables.tid[tables.tid >= 0]
        assert sorted(ids.tolist()) == sorted(ref_ids.tolist())
        assert offs[-1] * n_vocab == k1p.shape[0]
