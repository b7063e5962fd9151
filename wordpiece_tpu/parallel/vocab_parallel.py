"""Vocabulary-parallel matching: shard the probe table across a mesh axis.

Expert-parallel layout for the vocabulary index: active tokens are
partitioned across the ``vocab`` mesh axis, each device probes only its
partition's open-addressing table, and the partial per-position matches
combine with a pmax over (len, then id).  Two partitions can never match
the same (position, length, kind) with different tokens — a token string
lives in exactly one partition — so the combine is exact.

This axis composes with the ``data`` axis into a 2D (data, vocab) mesh:
corpus shards ride the data axis, the vocabulary index is sharded over
the vocab axis, and only the tiny (len, id) partial-match arrays cross
the ICI.  Useful when the vocabulary is too large to replicate in VMEM.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from ..core.vocab import Vocabulary, VocabIndex, build_index
from ..ops import match_fast


@dataclasses.dataclass
class ShardedVocabIndex:
    tables: np.ndarray  # int32[V, S, 5]
    mult1: int
    mult2: int
    max_len: int
    max_probe: int
    unk_token_id: int
    log2_size: int
    n_parts: int


def build_index_sharded(vocab: Vocabulary, n_parts: int) -> ShardedVocabIndex:
    """Partition active tokens round-robin by id; one sub-table per part."""
    def sub_vocab(p: int) -> Vocabulary:
        # Mask out tokens not in this partition by marking malformed.
        return Vocabulary(
            flat=vocab.flat,
            offsets=vocab.offsets,
            is_prefix=vocab.is_prefix,
            is_special=vocab.is_special,
            is_malformed=vocab.is_malformed | (np.arange(vocab.size) % n_parts != p),
            unk_token_id=vocab.unk_token_id,
        )

    parts: list[VocabIndex] = [build_index(sub_vocab(p)) for p in range(n_parts)]
    # Uniform static shape across parts: pad to the largest table.
    size = max(ix.size for ix in parts)
    log2 = int(size).bit_length() - 1
    rebuilt = [
        ix if ix.size == size else build_index(sub_vocab(p), min_table_size=size)
        for p, ix in enumerate(parts)
    ]
    m1 = rebuilt[0].mult1
    m2 = rebuilt[0].mult2
    if any(ix.mult1 != m1 or ix.mult2 != m2 for ix in rebuilt):  # pragma: no cover
        raise RuntimeError("vocab partitions disagree on hash multipliers")
    tables = np.stack([np.asarray(match_fast.pack_table(ix)) for ix in rebuilt])
    return ShardedVocabIndex(
        tables=tables,
        mult1=m1,
        mult2=m2,
        max_len=max(ix.max_len for ix in rebuilt),
        max_probe=max(ix.max_probe for ix in rebuilt),
        unk_token_id=vocab.unk_token_id,
        log2_size=log2,
        n_parts=n_parts,
    )


def combine_partial_matches(best_id, best_len, axis_name: str):
    """pmax-combine per-partition matches over the vocab axis."""
    max_len = jax.lax.pmax(best_len, axis_name)
    my = jnp.where(best_len == max_len, best_id, -1)
    return jax.lax.pmax(my, axis_name), max_len
