"""Data-parallel corpus sharding over a device mesh.

TPU-native replacement for the reference's thread-pool chunk fan-out
(src/fast.cpp:101-138): the corpus codepoint stream is split host-side at
whitespace-safe boundaries (chunk ends extended to the next space, the
invariant at src/fast.cpp:113-115 that guarantees no token crosses a
boundary), laid out as a [n_shards, shard_cap] array sharded along the
``data`` mesh axis, and encoded with one `shard_map`-ped program.  The
reference's summed sizes + memcpy concatenation (src/fast.cpp:125-137)
become a psum of per-shard counts plus a ragged host/device assembly of
the per-shard id streams.

A second optional mesh axis ``vocab`` shards the probe *table* (useful for
very large vocabularies): every device probes its table partition and the
partial matches combine with a max over (len, id) — an expert-parallel
layout for the vocabulary index.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core import unicode as uni
from ..ops import commit as commit_ops
from ..ops import match_fast
from ..ops import text_features


def make_mesh(n_data: int | None = None, devices=None) -> Mesh:
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices) if n_data is None else n_data
    return Mesh(np.asarray(devices[:n]).reshape(n), ("data",))


def split_whitespace_safe(cps: np.ndarray, space_mask: np.ndarray, n_shards: int):
    """Split a codepoint stream into n_shards chunks ending at spaces.

    Returns (starts, ends) arrays; chunks may be empty if the text has
    long space-free runs.  Matches the reference chunking: each boundary
    is advanced until it lands on a space (src/fast.cpp:113-115).
    """
    n = cps.shape[0]
    base = n // n_shards + (1 if n % n_shards else 0)
    starts, ends = [], []
    begin = 0
    for _ in range(n_shards):
        if begin >= n:
            starts.append(n)
            ends.append(n)
            continue
        end = min(n, begin + base)
        while end < n and not space_mask[end]:
            end += 1
        starts.append(begin)
        ends.append(end)
        begin = end
    return np.asarray(starts), np.asarray(ends)


def shard_codepoints(cps: np.ndarray, n_shards: int, pad_multiple: int = 128):
    """Host-side sharding: returns (cp_shards [D, cap], lengths [D])."""
    space_mask = np.asarray(uni.is_space(cps.astype(np.uint32)))
    starts, ends = split_whitespace_safe(cps, space_mask, n_shards)
    lens = ends - starts
    cap = int(max(int(lens.max()), 1))
    cap = ((cap + pad_multiple - 1) // pad_multiple) * pad_multiple
    out = np.zeros((n_shards, cap), dtype=np.int32)
    for d in range(n_shards):
        out[d, : lens[d]] = cps[starts[d] : ends[d]]
    return out, lens.astype(np.int32)


def _encode_block(cp_pad, n_valid, table, *, max_len, max_probe, log2_size, mult1, mult2, unk_id):
    n = cp_pad.shape[0] - max_len
    feats = text_features.compute_features(cp_pad[:n], n_valid, max_len)
    best_id, best_len = match_fast.match_positions(
        cp_pad,
        feats.window,
        feats.wp,
        table,
        max_len=max_len,
        max_probe=max_probe,
        log2_size=log2_size,
        mult1=mult1,
        mult2=mult2,
    )
    return commit_ops.commit(best_id, best_len, feats, n_valid, unk_id=unk_id)


@partial(
    jax.jit,
    static_argnames=("max_len", "max_probe", "log2_size", "mult1", "mult2", "unk_id", "mesh"),
)
def encode_data_parallel(
    cp_shards: jax.Array,  # int32[D, cap + max_len] (already tail-padded)
    lengths: jax.Array,  # int32[D]
    table: jax.Array,  # int32[S, 5] replicated
    *,
    mesh: Mesh,
    max_len: int,
    max_probe: int,
    log2_size: int,
    mult1: int,
    mult2: int,
    unk_id: int,
):
    """Sharded encode: returns (ids [D, cap], counts [D], total int32).

    Per-shard token counts are reduced with psum over the data axis (the
    collective analogue of the reference's summed sizes at
    src/fast.cpp:127-130).
    """

    def per_shard(cp_blk, len_blk, table):
        ids, count = _encode_block(
            cp_blk[0],
            len_blk[0],
            table,
            max_len=max_len,
            max_probe=max_probe,
            log2_size=log2_size,
            mult1=mult1,
            mult2=mult2,
            unk_id=unk_id,
        )
        total = jax.lax.psum(count, "data")
        return ids[None], count[None], total[None]

    ids, counts, totals = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P("data", None), P("data"), P()),
        out_specs=(P("data", None), P("data"), P("data")),
        check_vma=False,
    )(cp_shards, lengths, table)
    return ids, counts, totals[0]


@partial(
    jax.jit,
    static_argnames=("max_len", "max_probe", "log2_size", "mult1", "mult2", "unk_id", "mesh"),
)
def encode_2d_parallel(
    cp_shards: jax.Array,  # int32[D, cap + max_len]
    lengths: jax.Array,  # int32[D]
    tables: jax.Array,  # int32[V, S, 5] sharded over the vocab axis
    *,
    mesh: Mesh,
    max_len: int,
    max_probe: int,
    log2_size: int,
    mult1: int,
    mult2: int,
    unk_id: int,
):
    """2D (data, vocab) mesh: corpus data-parallel, probe table
    vocab-parallel (see parallel/vocab_parallel.py).  Matching runs per
    (data, vocab) tile; partial matches combine with pmax over ``vocab``;
    commit is replicated along the vocab axis."""
    from . import vocab_parallel

    def per_tile(cp_blk, len_blk, table_blk):
        cp_pad = cp_blk[0]
        n_valid = len_blk[0]
        n = cp_pad.shape[0] - max_len
        feats = text_features.compute_features(cp_pad[:n], n_valid, max_len)
        best_id, best_len = match_fast.match_positions(
            cp_pad,
            feats.window,
            feats.wp,
            table_blk[0],
            max_len=max_len,
            max_probe=max_probe,
            log2_size=log2_size,
            mult1=mult1,
            mult2=mult2,
        )
        best_id, best_len = vocab_parallel.combine_partial_matches(best_id, best_len, "vocab")
        ids, count = commit_ops.commit(best_id, best_len, feats, n_valid, unk_id=unk_id)
        total = jax.lax.psum(count, "data")
        return ids[None], count[None], total[None]

    ids, counts, totals = jax.shard_map(
        per_tile,
        mesh=mesh,
        in_specs=(P("data", None), P("data"), P("vocab", None, None)),
        out_specs=(P("data", None), P("data"), P("data")),
        check_vma=False,
    )(cp_shards, lengths, tables)
    return ids, counts, totals[0]


def assemble_ids(ids: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Ragged host-side concatenation of per-shard id streams."""
    return np.concatenate([ids[d, : int(c)] for d, c in enumerate(counts)]) if len(counts) else np.zeros(0, np.int32)


class ShardedFastEncoder:
    """Data-parallel encoder over a mesh (host-facing)."""

    def __init__(self, vocab, mesh: Mesh | None = None, index=None):
        from ..core.vocab import build_index

        self.vocab = vocab
        self.mesh = mesh if mesh is not None else make_mesh()
        self.index = index if index is not None else build_index(vocab)
        self.table = match_fast.pack_table(self.index)
        self._statics = dict(
            max_len=int(self.index.max_len),
            max_probe=int(self.index.max_probe),
            log2_size=int(self.index.log2_size),
            mult1=int(self.index.mult1),
            mult2=int(self.index.mult2),
            unk_id=int(self.index.unk_token_id),
        )

    def encode_codepoints(self, cps: np.ndarray) -> np.ndarray:
        cps = np.asarray(cps, dtype=np.int32)
        if cps.shape[0] == 0:
            return np.zeros(0, dtype=np.int32)
        n_dev = self.mesh.devices.size
        shards, lens = shard_codepoints(cps, n_dev)
        max_len = self._statics["max_len"]
        cap = shards.shape[1]
        cp_pad = np.zeros((n_dev, cap + max_len), dtype=np.int32)
        cp_pad[:, :cap] = shards
        ids, counts, total = encode_data_parallel(
            jnp.asarray(cp_pad), jnp.asarray(lens), self.table, mesh=self.mesh, **self._statics
        )
        del total
        return assemble_ids(np.asarray(ids), np.asarray(counts))
