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


class ShardedWordEncoder:
    """Multi-chip word engine (host-facing).

    Wraps WordEncoder's host pipeline, replacing the single-chip device
    call with the shard_map'd one; rows are padded to a multiple of
    (block_rows * n_devices) so every device gets whole blocks.
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

    def encode_bytes(self, data: bytes) -> np.ndarray:
        return self._inner.encode_bytes(data)
