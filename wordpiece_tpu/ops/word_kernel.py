"""Word-centric match+commit kernel: rows are independent units.

The flagship fast path.  The host runtime (runtime/native) segments the
corpus into independently-tokenizable units (see engine_word.py for the
proof sketch), dedupes them, and packs unique units into (U, W) codepoint
matrices padded with spaces.  This kernel tokenizes every row in
parallel with ONLY row-local operations:

 - char classes / probe windows: elementwise + log-width suffix scans;
 - longest-match probing: per-length lane-bucketed broadcast-compare
   (one 128-lane crossbar per candidate row, Σ_l B_l ≈ vocab/128 steps);
 - the greedy walk: a W-step vectorized chain walk per row (the walk is
   row-local because units are independent);
 - whole-word UNK rollback: suffix-scan segment kill, no scatter.

No HBM gathers or scatters anywhere — the reference's hash-probe inner
loop (src/fast.cpp:53-96) becomes pure vector compute, which is the only
thing that runs at speed-of-light on a TPU for this workload.

This module is written in plain jax.numpy so it runs identically on CPU
(tests) and TPU; a Pallas specialization can reuse the same structure.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.length_tables import KIND_MIX, LEN_MIX
from . import text_features as tf


def _suffix_min(v: jax.Array) -> jax.Array:
    """Row-local suffix minimum along axis 1 (log-width doubling)."""
    w = v.shape[1]
    fill = v.dtype.type(jnp.iinfo(v.dtype).max) if jnp.issubdtype(v.dtype, jnp.integer) else None
    k = 1
    while k < w:
        shifted = jnp.concatenate(
            [v[:, k:], jnp.full((v.shape[0], k), jnp.iinfo(v.dtype).max, v.dtype)], axis=1
        )
        v = jnp.minimum(v, shifted)
        k *= 2
    del fill
    return v


def _features(cp: jax.Array, width: int, max_len: int):
    """Row-local features shared by match and commit: (pos, space, punct,
    wp word-prefix mask, probe window)."""
    U = cp.shape[0]
    W = width
    cp_w = cp[:, :W]
    pos = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None, :], (U, W))

    space = tf.is_space_j(cp_w)
    punct = tf.is_punct_j(cp_w)
    spacing = space | punct | tf.is_chinese_j(cp_w)

    prev_spacing = jnp.concatenate([jnp.ones((U, 1), bool), spacing[:, :-1]], axis=1)
    wp = spacing | prev_spacing  # col 0 is always a word prefix (unit start)

    # Probe window (src/fast.cpp:53-60): distance to the first spacing
    # char strictly after j; pads are spaces so the unit end binds.
    spc_pos = jnp.where(spacing, pos, jnp.int32(W))
    nsp_at = _suffix_min(spc_pos)
    nsp_after = jnp.concatenate([nsp_at[:, 1:], jnp.full((U, 1), W, jnp.int32)], axis=1)
    window = jnp.minimum(jnp.int32(max_len), nsp_after - pos)
    window = jnp.minimum(window, jnp.int32(W) - pos)
    window = jnp.where(punct, jnp.int32(1), window)
    window = jnp.maximum(window, jnp.int32(1))
    return pos, space, punct, wp, window


def word_match(
    cp: jax.Array,  # int32[U, width + max_len], padded with 32 (space)
    tab_k1: jax.Array,  # int32[R, 128]
    tab_k2: jax.Array,  # int32[R, 128]
    tab_id: jax.Array,  # int32[R, 128]
    *,
    width: int,
    max_len: int,
    rows_off: tuple[int, ...],
    mult1: int,
    mult2: int,
    lane_salts: tuple,
):
    """Longest-match probe phase: (best_id, best_len) int32[U, width].
    Probing only a subset of each length's candidate rows (a vocab-axis
    partition) yields a PARTIAL result, combinable with pmax — a token
    lives in exactly one (length, row, lane) slot."""
    U = cp.shape[0]
    W = width
    pos, space, punct, wp, window = _features(cp, width, max_len)
    del pos, space, punct

    # ---- longest-match probing -------------------------------------------
    m1 = jnp.uint32(mult1)
    m2 = jnp.uint32(mult2)
    kind = wp.astype(jnp.uint32)
    h1 = jnp.zeros((U, W), jnp.uint32)
    h2 = jnp.zeros((U, W), jnp.uint32)
    best_id = jnp.full((U, W), -1, jnp.int32)
    best_len = jnp.zeros((U, W), jnp.int32)

    for l in range(1, max_len + 1):
        c = cp[:, l - 1 : l - 1 + W].astype(jnp.uint32)
        h1 = h1 * m1 + c
        h2 = h2 * m2 + c
        b_l = rows_off[l + 1] - rows_off[l]
        if b_l == 0:
            continue
        lu = jnp.uint32(l)
        salt = jnp.uint32(lane_salts[l] | 1)
        key2 = (h2 ^ (jnp.uint32(LEN_MIX) * lu) ^ (jnp.uint32(KIND_MIX) * kind)).astype(
            jnp.int32
        )
        key1 = h1.astype(jnp.int32)
        lane = (
            (
                (h1 ^ (h2 << jnp.uint32(1)) ^ (lu * jnp.uint32(LEN_MIX)) ^ (kind * jnp.uint32(KIND_MIX)))
                * salt
            )
            >> jnp.uint32(32 - 7)
        ).astype(jnp.int32)
        ok_l = l <= window

        def probe(k, carry, l=l, key1=key1, key2=key2, lane=lane, ok_l=ok_l):
            best_id, best_len = carry
            r = rows_off[l] + k
            row1 = jax.lax.dynamic_slice(tab_k1, (r, 0), (1, 128))
            row2 = jax.lax.dynamic_slice(tab_k2, (r, 0), (1, 128))
            rowi = jax.lax.dynamic_slice(tab_id, (r, 0), (1, 128))
            cand1 = jnp.take_along_axis(jnp.broadcast_to(row1, (U, 128)), lane, axis=1)
            cand2 = jnp.take_along_axis(jnp.broadcast_to(row2, (U, 128)), lane, axis=1)
            candi = jnp.take_along_axis(jnp.broadcast_to(rowi, (U, 128)), lane, axis=1)
            hit = (cand1 == key1) & (cand2 == key2) & (candi >= 0) & ok_l
            best_id = jnp.where(hit, candi, best_id)
            best_len = jnp.where(hit, jnp.int32(l), best_len)
            return best_id, best_len

        best_id, best_len = jax.lax.fori_loop(0, b_l, probe, (best_id, best_len))
    return best_id, best_len


def word_commit(
    cp: jax.Array,
    best_id: jax.Array,
    best_len: jax.Array,
    *,
    width: int,
    max_len: int,
    unk_id: int,
) -> jax.Array:
    """Greedy walk + whole-word UNK rollback over the match results."""
    U = cp.shape[0]
    W = width
    pos, space, punct, wp, window = _features(cp, width, max_len)
    del punct

    matched = best_len > 0

    # Next-position helpers with sentinel column W.
    ss_at = _suffix_min(jnp.where(~space, pos, jnp.int32(W)))
    ss_ext = jnp.concatenate([ss_at, jnp.full((U, 1), W, jnp.int32)], axis=1)
    wp_at = _suffix_min(jnp.where(wp, pos, jnp.int32(W)))
    wp_ext = jnp.concatenate([wp_at, jnp.full((U, 1), W, jnp.int32)], axis=1)

    land = jnp.minimum(pos + best_len, jnp.int32(W))
    failj = jnp.minimum(pos + window, jnp.int32(W))
    step_match = jnp.take_along_axis(ss_ext, land, axis=1)
    step_fail = jnp.take_along_axis(
        ss_ext, jnp.take_along_axis(wp_ext, failj, axis=1), axis=1
    )
    step = jnp.where(matched, step_match, step_fail)
    jump = jnp.concatenate([step, jnp.full((U, 1), W, jnp.int32)], axis=1)  # (U, W+1)

    pos_ext = jnp.broadcast_to(jnp.arange(W + 1, dtype=jnp.int32)[None, :], (U, W + 1))

    def walk(_, carry):
        p, visited = carry
        visited = visited | (pos_ext == p)
        p = jnp.take_along_axis(jump, p, axis=1)
        return p, visited

    p0 = jnp.zeros((U, 1), jnp.int32)
    # The walk advances >= 1 per step, so <= W+1 steps reach the sentinel.
    _, visited_ext = jax.lax.fori_loop(
        0, W + 1, walk, (p0, jnp.zeros((U, W + 1), bool))
    )
    visited = visited_ext[:, :W]

    # Segment kill: a visited fail position kills every emission back to
    # its segment start (last visited word-prefix position), which then
    # emits a single UNK.  fail-in-my-segment <=> the next visited fail at
    # or after me comes before the next segment start after me.
    seg_start = visited & wp
    fail_here = visited & ~matched
    next_fail = _suffix_min(jnp.where(fail_here, pos, jnp.int32(W + 1)))
    seg_pos = jnp.where(seg_start, pos, jnp.int32(W + 1))
    next_seg_after = jnp.concatenate(
        [_suffix_min(seg_pos)[:, 1:], jnp.full((U, 1), W + 1, jnp.int32)], axis=1
    )
    # Strict <: a fail that IS the next segment start belongs to that later
    # segment and must not kill this one.
    killed = visited & (next_fail < next_seg_after)

    emit = visited & ((matched & ~killed) | (seg_start & killed))
    # Empty (all-space pad) rows emit nothing (real units never start
    # with a space).
    emit = emit & ~space[:, :1]
    emit_val = jnp.where(killed, jnp.int32(unk_id), best_id)
    return jnp.where(emit, emit_val, jnp.int32(-2))


@partial(
    jax.jit,
    static_argnames=("width", "max_len", "rows_off", "mult1", "mult2", "lane_salts", "unk_id"),
)
def word_match_commit(
    cp: jax.Array,  # int32[U, width + max_len], padded with 32 (space)
    tab_k1: jax.Array,  # int32[R, 128]
    tab_k2: jax.Array,  # int32[R, 128]
    tab_id: jax.Array,  # int32[R, 128]
    *,
    width: int,
    max_len: int,
    rows_off: tuple[int, ...],
    mult1: int,
    mult2: int,
    lane_salts: tuple,
    unk_id: int,
) -> jax.Array:
    """Returns emit int32[U, width]: token id per emitting position, -2
    where nothing is emitted."""
    best_id, best_len = word_match(
        cp,
        tab_k1,
        tab_k2,
        tab_id,
        width=width,
        max_len=max_len,
        rows_off=rows_off,
        mult1=mult1,
        mult2=mult2,
        lane_salts=lane_salts,
    )
    return word_commit(
        cp, best_id, best_len, width=width, max_len=max_len, unk_id=unk_id
    )
