"""Pallas TPU specialization of the word match+commit kernel.

Layout: units are packed into 128-lane rows in groups of ``stride`` lanes
(stride ∈ {8, 16, 32, 128} divides 128).  A unit occupies lanes
[g*stride, g*stride + W) with W = stride - 1; lane g*stride + W is the
sentinel column (holds a space).  Every data-dependent access is either

 - a full 128-lane crossbar (`jnp.take_along_axis(…, axis=1)`, Mosaic's
   tpu.DynamicGatherOp, ~10G elem/s measured on v5e), or
 - a static lane shift masked at group boundaries,

so the kernel never touches HBM with a gather/scatter.  The vocabulary's
lane-bucketed length tables (core/length_tables.py) are VMEM-resident;
each candidate row costs three crossbars (k1, k2, id) for all 128
positions of a row at once.

The walk (greedy advance) runs per group: each group's current position
is replicated across its lanes, advanced by one crossbar per step, with
`stride` steps bounding the chain (every step advances >= 1 position).

Grid: one program per block of BR rows; everything else is data-parallel
across rows, so the same kernel scales to any number of units.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.length_tables import KIND_MIX, LEN_MIX
from . import text_features as tf

LANES = 128
BIG = 10_000  # plain int: jnp constants cannot be captured by pallas kernels


def _widen_pad(cp: jax.Array, max_len: int) -> jax.Array:
    """Accept the narrow H2D layout (uint16[rows, 128], no pad columns —
    see engine_word.pack_groups(narrow=True)) and rebuild the kernels'
    full int32[rows, 128 + max_len] layout ON DEVICE (pad value 32).
    int32 inputs pass through (already full layout)."""
    if cp.dtype == jnp.int32:
        return cp
    pad = jnp.full((cp.shape[0], max_len), 32, jnp.int32)
    return jnp.concatenate([cp.astype(jnp.int32), pad], axis=1)


def _masked_suffix_min(v, local, stride):
    """Suffix min along lanes, not crossing group boundaries.

    Lane shifts are circular rolls (Mosaic-native) with the wrapped /
    cross-group lanes masked to BIG; (local + k < stride) implies the
    roll did not wrap, since groups are stride-aligned.
    """
    k = 1
    while k < stride:
        shifted = pltpu.roll(v, LANES - k, 1)  # circular left-shift by k
        ok = (local + k) < stride
        v = jnp.minimum(v, jnp.where(ok, shifted, v.dtype.type(BIG)))
        k *= 2
    return v


def _kernel(cp_ref, k1_ref, k2_ref, id_ref, out_ref, *, stride, max_len, rows_off,
            mult1, mult2, lane_salts, unk_id):
    br = out_ref.shape[0]
    W = stride - 1
    cpb = cp_ref[:]  # (BR, 128 + max_len)
    cpw = cpb[:, :LANES]

    lane = jax.lax.broadcasted_iota(jnp.int32, (br, LANES), 1)
    local = lane & (stride - 1)
    gbase = lane - local
    sentinel = local == W  # holds a space by construction

    space = tf.is_space_j(cpw)
    punct = tf.is_punct_j(cpw)
    spacing = space | punct | tf.is_chinese_j(cpw)

    # prev-lane spacing via circular roll; lane-0 wrap garbage is masked
    # by the (local == 0) term, which forces wp at every unit start.
    prev_spacing = pltpu.roll(spacing.astype(jnp.int32), 1, 1) > 0
    wp = spacing | prev_spacing | (local == 0)

    # Probe window: distance to first spacing char strictly after local j,
    # clamped to the group (the sentinel space always binds).
    spc_pos = jnp.where(spacing, local, jnp.int32(BIG))
    nsp_at = _masked_suffix_min(spc_pos, local, stride)
    nsp_after = jnp.where((local + 1) < stride, pltpu.roll(nsp_at, LANES - 1, 1), jnp.int32(BIG))
    window = jnp.minimum(jnp.int32(min(max_len, W)), nsp_after - local)
    window = jnp.minimum(window, jnp.int32(W) - local)
    window = jnp.where(punct, jnp.int32(1), window)
    window = jnp.maximum(window, jnp.int32(1))

    # ---- probe ----------------------------------------------------------
    m1 = jnp.uint32(mult1)
    m2 = jnp.uint32(mult2)
    kind = wp.astype(jnp.uint32)
    h1 = jnp.zeros((br, LANES), jnp.uint32)
    h2 = jnp.zeros((br, LANES), jnp.uint32)
    best_id = jnp.full((br, LANES), -1, jnp.int32)
    best_len = jnp.zeros((br, LANES), jnp.int32)

    for l in range(1, min(max_len, W) + 1):
        c = cpb[:, l - 1 : l - 1 + LANES].astype(jnp.uint32)
        h1 = h1 * m1 + c
        h2 = h2 * m2 + c
        b_l = rows_off[l + 1] - rows_off[l]
        if b_l == 0:
            continue
        lu = jnp.uint32(l)
        salt = jnp.uint32(lane_salts[l] | 1)
        key1 = h1.astype(jnp.int32)
        key2 = (h2 ^ (jnp.uint32(LEN_MIX) * lu) ^ (jnp.uint32(KIND_MIX) * kind)).astype(jnp.int32)
        plane = (
            ((h1 ^ (h2 << jnp.uint32(1)) ^ (lu * jnp.uint32(LEN_MIX)) ^ (kind * jnp.uint32(KIND_MIX))) * salt)
            >> jnp.uint32(32 - 7)
        ).astype(jnp.int32)
        ok_l = l <= window

        def probe(k, carry, l=l, key1=key1, key2=key2, plane=plane, ok_l=ok_l):
            best_id, best_len = carry
            r = rows_off[l] + k
            row1 = jnp.broadcast_to(k1_ref[pl.ds(r, 1), :], (br, LANES))
            row2 = jnp.broadcast_to(k2_ref[pl.ds(r, 1), :], (br, LANES))
            rowi = jnp.broadcast_to(id_ref[pl.ds(r, 1), :], (br, LANES))
            cand1 = jnp.take_along_axis(row1, plane, axis=1)
            cand2 = jnp.take_along_axis(row2, plane, axis=1)
            candi = jnp.take_along_axis(rowi, plane, axis=1)
            hit = (cand1 == key1) & (cand2 == key2) & (candi >= 0) & ok_l
            return (
                jnp.where(hit, candi, best_id),
                jnp.where(hit, jnp.int32(l), best_len),
            )

        best_id, best_len = jax.lax.fori_loop(0, b_l, probe, (best_id, best_len))

    # ---- walk + rollback ------------------------------------------------
    matched = best_len > 0

    ss_at = _masked_suffix_min(jnp.where(~space, local, jnp.int32(BIG)), local, stride)
    ss_at = jnp.minimum(ss_at, jnp.int32(W))  # clamp: all-space tail -> sentinel
    wp_at = _masked_suffix_min(jnp.where(wp, local, jnp.int32(BIG)), local, stride)
    wp_at = jnp.minimum(wp_at, jnp.int32(W))

    def xbar(vals, idx_local):
        return jnp.take_along_axis(vals, gbase + jnp.minimum(idx_local, jnp.int32(W)), axis=1)

    land = jnp.minimum(local + best_len, jnp.int32(W))
    failj = jnp.minimum(local + window, jnp.int32(W))
    step = jnp.where(matched, xbar(ss_at, land), xbar(ss_at, xbar(wp_at, failj)))
    # Sentinel lanes self-loop so the walk parks there.
    jump = jnp.where(sentinel, jnp.int32(W), step)

    # Unrolled walk: Mosaic cannot relayout fori_loop carries produced by
    # dynamic gathers (replicated-vs-varying sublane layouts), so the
    # stride-step loop is unrolled; each step is 3 vector ops.
    p = local * 0  # each unit starts at local position 0
    visited_i = local * 0
    for _ in range(stride):
        visited_i = jnp.maximum(visited_i, (local == p).astype(jnp.int32))
        p = xbar(jump, p)
    visited = (visited_i > 0) & ~sentinel

    seg_start = visited & wp
    fail_here = visited & ~matched
    next_fail = _masked_suffix_min(jnp.where(fail_here, local, jnp.int32(BIG)), local, stride)
    seg_pos = jnp.where(seg_start, local, jnp.int32(BIG))
    nseg = _masked_suffix_min(seg_pos, local, stride)
    next_seg_after = jnp.where((local + 1) < stride, pltpu.roll(nseg, LANES - 1, 1), jnp.int32(BIG))
    killed = visited & (next_fail < next_seg_after)

    emit = visited & ((matched & ~killed) | (seg_start & killed))
    # Empty (all-space pad) units must emit nothing: a real unit never
    # starts with a space, so suppress groups whose first char is one.
    start_space = jnp.take_along_axis(space.astype(jnp.int32), gbase, axis=1) > 0
    emit = emit & ~start_space
    emit_val = jnp.where(killed, jnp.int32(unk_id), best_id)
    out_ref[:] = jnp.where(emit, emit_val, jnp.int32(-2))


@partial(
    jax.jit,
    static_argnames=(
        "stride", "max_len", "rows_off", "mult1", "mult2", "lane_salts", "unk_id", "block_rows",
    ),
)
def word_match_commit_pallas(
    cp: jax.Array,  # int32[U_rows, 128 + max_len], packed groups, pad 32
    tab_k1: jax.Array,  # int32[R, 128]
    tab_k2: jax.Array,
    tab_id: jax.Array,
    *,
    stride: int,
    max_len: int,
    rows_off: tuple[int, ...],
    mult1: int,
    mult2: int,
    lane_salts: tuple,
    unk_id: int,
    block_rows: int = 256,
) -> jax.Array:
    cp = _widen_pad(cp, max_len)
    u_rows = cp.shape[0]
    assert u_rows % block_rows == 0, (u_rows, block_rows)
    kernel = partial(
        _kernel,
        stride=stride,
        max_len=max_len,
        rows_off=rows_off,
        mult1=mult1,
        mult2=mult2,
        lane_salts=lane_salts,
        unk_id=unk_id,
    )
    grid = (u_rows // block_rows,)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((u_rows, LANES), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, cp.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(cp, tab_k1, tab_k2, tab_id)


@partial(
    jax.jit,
    static_argnames=(
        "strides", "max_len", "rows_off", "mult1", "mult2", "lane_salts", "unk_id", "block_rows",
        "interpret",
    ),
)
def word_match_commit_multi(
    cps: tuple,  # tuple of int32[U_b, 128 + max_len] packed matrices
    tab_k1: jax.Array,
    tab_k2: jax.Array,
    tab_id: jax.Array,
    *,
    strides: tuple,
    max_len: int,
    rows_off: tuple,
    mult1: int,
    mult2: int,
    lane_salts: tuple,
    unk_id: int,
    block_rows: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """All width buckets in one device program and ONE output array
    (row-concatenated): a single round trip and a single d2h transfer
    per corpus batch."""
    outs = []
    for cp, stride in zip(cps, strides):
        cp = _widen_pad(cp, max_len)
        u_rows = cp.shape[0]
        kernel = partial(
            _kernel,
            stride=stride,
            max_len=max_len,
            rows_off=rows_off,
            mult1=mult1,
            mult2=mult2,
            lane_salts=lane_salts,
            unk_id=unk_id,
        )
        outs.append(
            pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((u_rows, LANES), jnp.int32),
                grid=(u_rows // block_rows,),
                in_specs=[
                    pl.BlockSpec(
                        (block_rows, cp.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM
                    ),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
                interpret=interpret,
            )(cp, tab_k1, tab_k2, tab_id)
        )
    # One concatenated output => a single device->host transfer.
    return jnp.concatenate(outs, axis=0)


@partial(
    jax.jit,
    static_argnames=(
        "strides", "max_len", "rows_off", "mult1", "mult2", "lane_salts", "unk_id", "block_rows",
        "cap", "interpret",
    ),
)
def word_match_commit_compact(
    cps: tuple,  # tuple of int32[U_b, 128 + max_len] packed matrices
    tab_k1: jax.Array,
    tab_k2: jax.Array,
    tab_id: jax.Array,
    *,
    strides: tuple,
    max_len: int,
    rows_off: tuple,
    mult1: int,
    mult2: int,
    lane_salts: tuple,
    unk_id: int,
    cap: int,
    block_rows: int = 256,
    interpret: bool = False,
):
    """Match+commit for all buckets, then compact the sparse emit matrix
    on device so the d2h transfer is ~#ids instead of #lanes (the axon
    tunnel is latency- and bandwidth-poor: ~27ms + ~60MB/s).

    Returns ONE int32[1 + rows_total + cap] vector (a single D2H transfer
    — the tunnel's latency makes per-array fetches additive):
      out[0] = total emitted ids;
      out[1 : 1+rows_total] = per-packed-row id counts;
      out[1+rows_total :] = compacted ids, (token_id + 2) * 128 + lane,
      in row-major (row, lane) order.
    If total > cap the caller must fall back to the full-emit program.
    """
    emit = word_match_commit_multi(
        cps,
        tab_k1,
        tab_k2,
        tab_id,
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
    lane = jax.lax.broadcasted_iota(jnp.int32, emit.shape, 1)
    mask = emit != -2
    counts = mask.sum(axis=1, dtype=jnp.int32)
    packed = (emit + 2) * 128 + lane
    n = emit.shape[0] * emit.shape[1]
    flat_mask = mask.reshape(n)
    pos = jnp.where(flat_mask, jax.lax.broadcasted_iota(jnp.int32, (n,), 0), jnp.int32(2**30))
    _, vals = jax.lax.sort_key_val(pos, packed.reshape(n))
    total = counts.sum(dtype=jnp.int32)
    return jnp.concatenate([total[None], counts, vals[:cap]])
