"""Data-parallel word engine: shard unit rows over the ``data`` mesh axis.

The word kernel is embarrassingly parallel over packed rows, so the
sharded step is simply: each packed bucket matrix is sharded along its
row dimension across the data axis, the length tables are replicated,
and every device runs the same crossbar kernel on its row slice.  A psum
over per-device emission counts gives the global token count (the
collective analogue of the reference's summed sizes,
src/fast.cpp:127-130).

Optional ``vocab`` axis (expert-parallel tables): the candidate rows of
the length tables are partitioned across devices; each partition probes
only its rows, and partial (id, len) matches combine with pmax — exact,
because a token lives in exactly one partition.  The walk/commit phase
then runs replicated along the vocab axis.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


@partial(
    jax.jit,
    static_argnames=(
        "strides", "max_len", "rows_off", "mult1", "mult2", "lane_salts", "unk_id",
        "block_rows", "mesh", "interpret",
    ),
)
def word_encode_data_parallel(
    cps: tuple,  # tuple of int32[U_b, 128+max_len]; U_b divisible by mesh data size
    tab_k1: jax.Array,
    tab_k2: jax.Array,
    tab_id: jax.Array,
    *,
    mesh: Mesh,
    strides: tuple,
    max_len: int,
    rows_off: tuple,
    mult1: int,
    mult2: int,
    lane_salts: tuple,
    unk_id: int,
    block_rows: int = 256,
    interpret: bool = False,
):
    """Returns (emit_cat int32[sum U_b, 128], total_tokens int32)."""
    from ..ops.word_kernel_pallas import word_match_commit_multi

    def per_shard(cp_tuple, k1, k2, tid):
        out_cat = word_match_commit_multi(
            cp_tuple,
            k1,
            k2,
            tid,
            strides=strides,
            max_len=max_len,
            rows_off=rows_off,
            mult1=mult1,
            mult2=mult2,
            lane_salts=lane_salts,
            unk_id=unk_id,
            block_rows=block_rows,
            interpret=interpret,
        )
        # Split back per bucket so shard_map reassembles each bucket's
        # rows independently (a concatenated output would interleave
        # shard slices across buckets).
        outs = []
        row = 0
        for cp_b in cp_tuple:
            nrows = cp_b.shape[0]
            outs.append(out_cat[row : row + nrows])
            row += nrows
        count = jnp.sum(out_cat != -2).astype(jnp.int32)
        total = jax.lax.psum(count, "data")
        return tuple(outs), total[None]

    emits, totals = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(tuple(P("data", None) for _ in cps), P(), P(), P()),
        out_specs=(tuple(P("data", None) for _ in cps), P("data")),
        check_vma=False,
    )(cps, tab_k1, tab_k2, tab_id)
    return jnp.concatenate(emits, axis=0), totals[0]


def shard_word_tables(tables, n_vocab: int):
    """Partition the per-length candidate rows across the vocab axis.

    Each length l's B_l rows pad to a multiple of n_vocab (empty slots:
    id == -1, never hit) and split contiguously; the returned arrays
    stack shard-major so shard_map's P("vocab") blocks are exactly one
    partition.  rows_off_shard is uniform across shards (required: it is
    a static arg of the traced program).
    """
    k1, k2, tid = tables.k1, tables.k2, tables.tid
    offs = tables.rows_off
    rows_off_shard = [0, 0]
    blocks = [[] for _ in range(n_vocab)]
    for l in range(1, tables.max_len + 1):
        lo, hi = int(offs[l]), int(offs[l + 1])
        b = hi - lo
        bp = -(-b // n_vocab) if b else 0
        rows_off_shard.append(rows_off_shard[-1] + bp)
        if bp == 0:
            continue
        for v in range(n_vocab):
            bk1 = np.zeros((bp, 128), np.int32)
            bk2 = np.zeros((bp, 128), np.int32)
            bid = np.full((bp, 128), -1, np.int32)
            s = lo + v * bp
            e = min(hi, s + bp)
            if s < hi:
                bk1[: e - s] = k1[s:e]
                bk2[: e - s] = k2[s:e]
                bid[: e - s] = tid[s:e]
            blocks[v].append((bk1, bk2, bid))
    if rows_off_shard[-1] == 0:
        # No active tokens: 1 empty row per shard keeps shapes valid; all
        # per-length counts stay 0 so the rows are never probed.
        k1p = np.zeros((n_vocab, 128), np.int32)
        k2p = np.zeros((n_vocab, 128), np.int32)
        tidp = np.full((n_vocab, 128), -1, np.int32)
    else:
        k1p = np.concatenate([b[0] for blks in blocks for b in blks], axis=0)
        k2p = np.concatenate([b[1] for blks in blocks for b in blks], axis=0)
        tidp = np.concatenate([b[2] for blks in blocks for b in blks], axis=0)
    return k1p, k2p, tidp, tuple(rows_off_shard)


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "widths", "max_len", "rows_off", "mult1", "mult2", "lane_salts", "unk_id",
    ),
)
def word_encode_2d_parallel(
    mats: tuple,  # tuple of int32[U_b, W_b + max_len]; U_b divisible by n_data
    tab_k1: jax.Array,  # int32[n_vocab * R_shard, 128]
    tab_k2: jax.Array,
    tab_id: jax.Array,
    *,
    mesh: Mesh,
    widths: tuple,
    max_len: int,
    rows_off: tuple,  # per-SHARD rows_off (uniform)
    mult1: int,
    mult2: int,
    lane_salts: tuple,
    unk_id: int,
):
    """2D word engine: unit rows data-parallel, candidate rows of the
    length tables vocab(expert)-parallel.  Each (data, vocab) tile probes
    its table partition; partial (id, len) matches combine with pmax over
    ``vocab`` (exact — a token lives in one partition); the walk/commit
    runs replicated along vocab.  Returns per-bucket emit matrices."""
    from ..ops.word_kernel import word_commit, word_match
    from . import vocab_parallel

    def per_tile(mat_tuple, k1s, k2s, tids):
        outs = []
        for mat_b, w in zip(mat_tuple, widths):
            bid, blen = word_match(
                mat_b,
                k1s,
                k2s,
                tids,
                width=w,
                max_len=max_len,
                rows_off=rows_off,
                mult1=mult1,
                mult2=mult2,
                lane_salts=lane_salts,
            )
            bid, blen = vocab_parallel.combine_partial_matches(bid, blen, "vocab")
            outs.append(
                word_commit(mat_b, bid, blen, width=w, max_len=max_len, unk_id=unk_id)
            )
        return tuple(outs)

    return jax.shard_map(
        per_tile,
        mesh=mesh,
        in_specs=(
            tuple(P("data", None) for _ in mats),
            P("vocab", None),
            P("vocab", None),
            P("vocab", None),
        ),
        out_specs=tuple(P("data", None) for _ in mats),
        check_vma=False,
    )(mats, tab_k1, tab_k2, tab_id)


class ShardedWordEncoder:
    """Multi-chip word engine (host-facing).

    Wraps WordEncoder's host pipeline, replacing the single-chip device
    call with the shard_map'd one; rows are padded to a multiple of
    (block_rows * n_devices) so every device gets whole blocks.  With a
    2D ("data", "vocab") mesh the length tables are additionally
    partitioned across the vocab axis (word_encode_2d_parallel).
    """

    def __init__(self, vocab, mesh: Mesh | None = None):
        from ..engine_word import WordEncoder

        self._inner = WordEncoder(vocab)
        if mesh is None:
            devs = jax.devices()
            mesh = Mesh(np.asarray(devs).reshape(len(devs)), ("data",))
        self.mesh = mesh
        self.vocab = vocab
        n_data = int(self.mesh.shape["data"])

        inner = self._inner
        if "vocab" in mesh.axis_names:
            self._init_2d(n_data, int(mesh.shape["vocab"]))
            return

        def run_all(mats):
            from ..engine_word import BLOCK_ROWS, STRIDES, pack_groups, unpack_emit

            max_len = inner._statics["max_len"]
            packed, strides, nonempty = [], [], []
            for b, mat in enumerate(mats):
                if mat.shape[0] == 0:
                    continue
                pk = pack_groups(mat, STRIDES[b], max_len)
                rows = pk.shape[0]
                mult = BLOCK_ROWS * n_data
                target = ((rows + mult - 1) // mult) * mult
                if target != rows:
                    pad = np.full((target - rows, pk.shape[1]), 32, dtype=np.int32)
                    pk = np.concatenate([pk, pad], axis=0)
                packed.append(jnp.asarray(pk))
                strides.append(STRIDES[b])
                nonempty.append(b)
            if not packed:
                return [None] * len(mats)
            emit_cat, _total = word_encode_data_parallel(
                tuple(packed),
                inner._tab_k1,
                inner._tab_k2,
                inner._tab_id,
                mesh=self.mesh,
                strides=tuple(strides),
                block_rows=BLOCK_ROWS,
                interpret=jax.default_backend() == "cpu",
                **inner._statics,
            )
            out_cat = np.asarray(emit_cat)
            emits = [None] * len(mats)
            row = 0
            for b, pk in zip(nonempty, packed):
                nrows = pk.shape[0]
                emits[b] = unpack_emit(out_cat[row : row + nrows], STRIDES[b], mats[b].shape[0])
                row += nrows
            return emits

        self._inner._run_all_buckets = run_all  # type: ignore[method-assign]

    def _init_2d(self, n_data: int, n_vocab: int) -> None:
        from ..engine_word import WIDTHS

        inner = self._inner
        tables = inner.tables
        k1p, k2p, tidp, rows_off_shard = shard_word_tables(tables, n_vocab)
        k1p, k2p, tidp = jnp.asarray(k1p), jnp.asarray(k2p), jnp.asarray(tidp)
        max_len = inner._statics["max_len"]

        def run_all(mats):
            padded, widths, nonempty = [], [], []
            for b, mat in enumerate(mats):
                if mat.shape[0] == 0:
                    continue
                u = mat.shape[0]
                rows = -(-u // n_data) * n_data
                pk = np.full((rows, WIDTHS[b] + max_len), 32, dtype=np.int32)
                pk[:u, : WIDTHS[b]] = mat
                padded.append(jnp.asarray(pk))
                widths.append(WIDTHS[b])
                nonempty.append(b)
            if not padded:
                return [None] * len(mats)
            outs = word_encode_2d_parallel(
                tuple(padded),
                k1p,
                k2p,
                tidp,
                mesh=self.mesh,
                widths=tuple(widths),
                max_len=max_len,
                rows_off=rows_off_shard,
                mult1=inner._statics["mult1"],
                mult2=inner._statics["mult2"],
                lane_salts=inner._statics["lane_salts"],
                unk_id=inner._statics["unk_id"],
            )
            emits = [None] * len(mats)
            for b, out in zip(nonempty, outs):
                emits[b] = np.asarray(out)[: mats[b].shape[0]]
            return emits

        self._inner._run_all_buckets = run_all  # type: ignore[method-assign]

    def encode_bytes(self, data: bytes) -> np.ndarray:
        return self._inner.encode_bytes(data)
