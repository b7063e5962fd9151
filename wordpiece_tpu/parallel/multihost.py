"""Multi-host (multi-process) execution path.

The reference is single-process shared-memory (SURVEY.md §2 end: its only
"collectives" are summed sizes + memcpy concat, src/fast.cpp:125-137).
The TPU-native design makes cross-host data parallelism first-class:

 - process group formation via ``jax.distributed.initialize``
   (``initialize_distributed``);
 - each process owns a whitespace-safe byte shard of the corpus
   (``file_shard_bounds`` — the multi-host analogue of the reference's
   space-snapped chunking, src/fast.cpp:113-115), segments and dedupes it
   locally with the native runtime;
 - local unit rows enter a GLOBAL device array via
   ``jax.make_array_from_process_local_data`` over a mesh spanning every
   process's devices; one shard_map'd word-kernel program runs on all
   chips (ICI within a slice, DCN across hosts);
 - each process reads back only its **addressable** output shards and
   assembles its local id stream (process-local assembly — the id stream
   for shard p never leaves host p);
 - the global token count reduces with psum over the ``data`` axis.

Degenerate single-process operation (1 process, N local devices) runs the
identical code path and is what the test suite and the driver dry-run
exercise; on a real pod slice the same program spans hosts.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Form the process group (jax.distributed).  No-op when already
    initialized or when running single-process with no coordinator.

    Must run BEFORE anything initializes the JAX backend (jax.devices(),
    jax.process_count(), any computation): jax.distributed.initialize
    refuses to run after backend init, so this probes the distributed
    client state directly instead of calling jax.process_count()."""
    if coordinator_address is None and num_processes in (None, 1):
        return  # single process: nothing to form
    try:
        from jax._src import distributed as _dist

        if _dist.global_state.client is not None:
            return  # already initialized by the launcher
    except Exception:  # pragma: no cover - private-API drift
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def file_shard_bounds(path: str, process_id: int, num_processes: int) -> tuple[int, int]:
    """[start, end) byte range of `path` owned by `process_id`.

    Boundaries are the first space-class cut point at-or-after i*size/n
    (scanning a bounded window; core.unicode.find_space_cut — ASCII
    whitespace or U+2581, so newline-only corpora shard too), so no unit
    crosses a shard edge and every process computes identical bounds
    reading only ~1 MB — no coordination.
    """
    from ..core.unicode import find_space_cut

    size = os.path.getsize(path)
    base = -(-size // num_processes)

    def bound(i: int) -> int:
        if i <= 0:
            return 0
        target = min(size, i * base)
        if target >= size:
            return size
        with open(path, "rb") as f:
            f.seek(target)
            window = f.read(1 << 20)
        off = find_space_cut(window)
        return target + off if off >= 0 else size

    return bound(process_id), bound(process_id + 1)


def process_mesh(devices=None) -> Mesh:
    """1D ``data`` mesh over every device of every process."""
    devices = list(jax.devices()) if devices is None else list(devices)
    return Mesh(np.asarray(devices).reshape(len(devices)), ("data",))


def _allgather_max(value: int) -> int:
    """Max of a host int across processes (1-process: identity)."""
    if jax.process_count() == 1:
        return int(value)
    from jax.experimental import multihost_utils

    vals = multihost_utils.process_allgather(np.asarray([value], np.int64))
    return int(np.max(vals))


def _allgather_sum(value: int) -> int:
    if jax.process_count() == 1:
        return int(value)
    from jax.experimental import multihost_utils

    vals = multihost_utils.process_allgather(np.asarray([value], np.int64))
    return int(np.sum(vals))


from functools import partial


@partial(
    jax.jit,
    static_argnames=(
        "strides", "max_len", "rows_off", "mult1", "mult2", "lane_salts", "unk_id",
        "block_rows", "mesh", "interpret",
    ),
)
def _word_buckets_global(
    cps: tuple,  # tuple of GLOBAL int32[R_b, 128+max_len], sharded P("data")
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
    """Per-bucket emit matrices, each keeping the P("data") row sharding
    (word_sharding.word_encode_data_parallel concatenates its outputs,
    which destroys the shard layout a process needs for local readback)."""
    from ..ops.word_kernel_pallas import word_match_commit_multi
    from jax.sharding import PartitionSpec as P

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
        outs = []
        row = 0
        for cp_b in cp_tuple:
            nrows = cp_b.shape[0]
            outs.append(out_cat[row : row + nrows])
            row += nrows
        return tuple(outs)

    return jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(tuple(P("data", None) for _ in cps), P(), P(), P()),
        out_specs=tuple(P("data", None) for _ in cps),
        check_vma=False,
    )(cps, tab_k1, tab_k2, tab_id)


class MultiHostWordEncoder:
    """Process-aware word engine: identical host pipeline to WordEncoder,
    with the device step running over a global (multi-process) mesh and
    every process keeping only its own rows' results."""

    def __init__(self, vocab, mesh: Mesh | None = None):
        from ..engine_word import WordEncoder

        self.mesh = mesh if mesh is not None else process_mesh()
        if "data" not in self.mesh.axis_names:
            raise ValueError("multihost mesh needs a 'data' axis")
        self.vocab = vocab
        self._inner = WordEncoder(vocab)
        self._inner._run_all_buckets = self._run_all_buckets_global  # type: ignore[method-assign]
        # Multi-process runs are SPMD: every process must enter the global
        # device program (and its allgather padding collectives) the same
        # number of times.  Lockstep forces a dispatch per chunk even for
        # chunks with zero/few new units, and encode_local_bytes agrees on
        # an identical chunk count across processes below.
        self._inner.lockstep_dispatch = jax.process_count() > 1
        self.last_global_total: int | None = None

    # -- device step over the global mesh -----------------------------------
    def _run_all_buckets_global(self, mats):
        from ..engine_word import BLOCK_ROWS, STRIDES, pack_groups, unpack_emit

        inner = self._inner
        n_data = int(self.mesh.shape["data"])
        n_procs = jax.process_count()
        n_local = max(1, n_data // n_procs)
        max_len = inner._statics["max_len"]

        packed_local, strides, nonempty, rows_global = [], [], [], []
        for b, mat in enumerate(mats):
            # Every process must enter the global program with the same
            # shapes even when its shard contributes no rows to a bucket.
            pk = (
                pack_groups(mat, STRIDES[b], max_len)
                if mat.shape[0]
                else np.full((0, 128 + max_len), 32, dtype=np.int32)
            )
            mult = BLOCK_ROWS * n_local
            target_local = max(mult, -(-pk.shape[0] // mult) * mult)
            target_local = _allgather_max(target_local)
            if pk.shape[0] < target_local:
                pad = np.full(
                    (target_local - pk.shape[0], 128 + max_len), 32, dtype=np.int32
                )
                pk = np.concatenate([pk, pad], axis=0)
            packed_local.append(pk)
            strides.append(STRIDES[b])
            nonempty.append(b)
            rows_global.append(target_local * n_procs)

        sharding = NamedSharding(self.mesh, P("data", None))
        global_in = tuple(
            jax.make_array_from_process_local_data(
                sharding, pk, (rows, pk.shape[1])
            )
            for pk, rows in zip(packed_local, rows_global)
        )
        outs = _word_buckets_global(
            global_in,
            inner._tab_k1,
            inner._tab_k2,
            inner._tab_id,
            mesh=self.mesh,
            strides=tuple(strides),
            block_rows=BLOCK_ROWS,
            interpret=jax.default_backend() == "cpu",
            **inner._statics,
        )

        # Process-local readback: each per-bucket output keeps the
        # P("data") row sharding, so this process's addressable shards
        # are exactly its own rows (in device order along the axis).
        emits = [None] * len(mats)
        for b, out, pk in zip(nonempty, outs, packed_local):
            n_units = mats[b].shape[0]
            if n_units == 0:
                continue
            shards = sorted(
                out.addressable_shards, key=lambda s: s.index[0].start or 0
            )
            local_rows = np.concatenate([np.asarray(s.data) for s in shards], axis=0)
            assert local_rows.shape[0] == pk.shape[0]
            emits[b] = unpack_emit(local_rows, STRIDES[b], n_units)
        return emits

    # -- public API ----------------------------------------------------------
    def encode_local_bytes(self, data: bytes) -> tuple[np.ndarray, int]:
        """Encode THIS PROCESS's corpus shard.  Returns (local_ids,
        global_total_ids); the concatenation of local_ids in process
        order equals the single-process encode of the whole corpus.

        Collective contract: all processes must call this together (the
        device step and the shape-agreement allgathers are collectives).
        Chunk counts are agreed via allgather-max so uneven shard sizes
        can never desynchronize the pipeline (lockstep_dispatch)."""
        if jax.process_count() > 1:
            n_chunks = _allgather_max(
                max(1, -(-len(data) // self._inner.PIPELINE_CHUNK))
            )
            local = self._inner.encode_bytes(data, n_chunks=n_chunks)
        else:
            local = self._inner.encode_bytes(data)
        total = _allgather_sum(int(local.shape[0]))
        self.last_global_total = total
        return local, total

    def encode_file(self, path: str) -> tuple[np.ndarray, int]:
        """Encode this process's whitespace-safe shard of `path`."""
        start, end = file_shard_bounds(path, jax.process_index(), jax.process_count())
        with open(path, "rb") as f:
            f.seek(start)
            data = f.read(end - start)
        return self.encode_local_bytes(data)
