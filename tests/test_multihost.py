"""Multi-host execution path (parallel/multihost.py), run degenerately:
one process, 8 virtual CPU devices — the identical code path
(make_array_from_process_local_data, addressable-shard readback,
process-local assembly) that spans hosts on a pod slice.
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
        ["[PAD]", "[UNK]", "the", "quick", "brown", "fox", "jump", "##s", "##ed",
         "over", "lazy", "dog", "-", ",", ".", "qu", "##ick", "an", "and", "a"]
        + [c for c in "abcdefghijklmnopqrstuvwxyz"]
        + ["##" + c for c in "abcdefghijklmnopqrstuvwxyz"]
    )
    return parse_vocab(lines)


def _corpus(n_repeat=400) -> bytes:
    return ("the quick brown fox jumps over the lazy dog and a zebra-dog, " * n_repeat).encode()


def test_file_shard_bounds_partition(tmp_path):
    from wordpiece_tpu.parallel.multihost import file_shard_bounds

    data = _corpus(50)
    p = tmp_path / "corpus.txt"
    p.write_bytes(data)
    for n_procs in (1, 2, 3, 5, 8):
        bounds = [file_shard_bounds(str(p), i, n_procs) for i in range(n_procs)]
        # partition: contiguous, covering, non-overlapping
        assert bounds[0][0] == 0 and bounds[-1][1] == len(data)
        for (s0, e0), (s1, e1) in zip(bounds, bounds[1:]):
            assert e0 == s1
        # every interior boundary lands ON a space (snapped at-or-after)
        for s, _e in bounds[1:]:
            assert data[s : s + 1] == b" "


def test_file_shard_bounds_spaceless_tail(tmp_path):
    from wordpiece_tpu.parallel.multihost import file_shard_bounds

    data = b"abc" + b"x" * 10_000  # no spaces at all
    p = tmp_path / "corpus.txt"
    p.write_bytes(data)
    bounds = [file_shard_bounds(str(p), i, 4) for i in range(4)]
    # later shards collapse to empty; coverage is preserved
    assert bounds[0] == (0, len(data))
    assert all(s == e == len(data) for s, e in bounds[1:])


def test_multihost_encoder_matches_oracle():
    from wordpiece_tpu.parallel.multihost import MultiHostWordEncoder

    vocab = _vocab()
    data = _corpus()
    enc = MultiHostWordEncoder(vocab)
    local_ids, total = enc.encode_local_bytes(data)
    want = loader.VocabHandle(vocab).encode(loader.decode_utf8(data))
    assert np.array_equal(local_ids, want)
    assert total == want.shape[0] == enc.last_global_total


def test_multihost_shards_concat_to_whole(tmp_path):
    """Simulated 4-process run (same interpreter): encoding each process's
    file shard and concatenating in process order equals the whole-corpus
    single-process encode — the process-local assembly invariant."""
    from wordpiece_tpu.parallel.multihost import (
        MultiHostWordEncoder,
        file_shard_bounds,
    )

    vocab = _vocab()
    data = _corpus()
    p = tmp_path / "corpus.txt"
    p.write_bytes(data)

    whole = loader.VocabHandle(vocab).encode(loader.decode_utf8(data))
    parts = []
    enc = MultiHostWordEncoder(vocab)
    for pid in range(4):
        s, e = file_shard_bounds(str(p), pid, 4)
        ids, _total = enc.encode_local_bytes(data[s:e])
        parts.append(ids)
    got = np.concatenate(parts)
    assert np.array_equal(got, whole)


def test_multihost_uneven_and_multibucket():
    """Uneven shard content: long space-free runs + units spanning every
    width bucket, so some buckets are empty on the device step and row
    padding differs per bucket."""
    from wordpiece_tpu.parallel.multihost import MultiHostWordEncoder

    vocab = _vocab()
    rng = np.random.default_rng(7)
    words = []
    for _ in range(500):
        n = int(rng.choice([1, 3, 7, 15, 40, 120]))
        words.append("".join(rng.choice(list("abcdefg"), size=n)))
    data = (" ".join(words) + " " + "q" * 300).encode()  # overflow unit too
    enc = MultiHostWordEncoder(vocab)
    ids, total = enc.encode_local_bytes(data)
    want = loader.VocabHandle(vocab).encode(loader.decode_utf8(data))
    assert np.array_equal(ids, want)
    assert total == want.shape[0]


def test_initialize_distributed_single_process_noop():
    from wordpiece_tpu.parallel.multihost import initialize_distributed

    initialize_distributed()  # no coordinator, 1 process: must not raise
    initialize_distributed(num_processes=1)
