"""Greedy commit: turn per-position matches into the emitted id stream.

The reference's worker loop (src/fast.cpp:43-99) walks positions
sequentially: match -> advance by the match length; fail -> whole-word UNK
rollback and skip to the next word boundary.  The walk is *memoryless*
forward (the next position depends only on the current position), so the
whole chunk is the orbit of a deterministic step function

    F(i) = ss[i + len_i]                    if position i matched
    F(i) = ss[wnext[min(i + window_i, n)]]  if position i failed

(`ss` skips spaces, `wnext` skips to the next word-prefix position; both
have sentinel n).  The rollback is segment-local: tokens are discarded
back to the last visited word-prefix position (tokens_since_prefix in the
reference), and a failing position always terminates its segment.

This module computes, fully in parallel:
 1. visited = orbit of F from the first non-space position, via pointer
    doubling (log2(n) gather/scatter rounds);
 2. segments = runs of visited positions between visited word-prefix
    positions; a segment containing a failed position emits a single UNK
    at its start and suppresses its other emissions;
 3. the compacted id stream (capacity n + count), via cumsum + scatter.

No sequential host code; identical output to the oracle by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def commit(
    best_id: jax.Array,  # int32[n], -1 where no match
    best_len: jax.Array,  # int32[n], 0 where no match
    feats,  # TextFeatures
    n_valid: jax.Array,
    *,
    unk_id: int,
) -> tuple[jax.Array, jax.Array]:
    """Returns (ids int32[n] padded with -2 beyond count, count int32)."""
    ids, _positions, count = commit_with_positions(
        best_id, best_len, feats, n_valid, unk_id=unk_id
    )
    return ids, count


def commit_with_positions(
    best_id: jax.Array,  # int32[n], -1 where no match
    best_len: jax.Array,  # int32[n], 0 where no match
    feats,  # TextFeatures
    n_valid: jax.Array,
    *,
    unk_id: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """commit() plus the emitting POSITION of each compacted id (used to
    attribute ids back to deduped units; positions are non-decreasing by
    construction of the compaction order).  Returns (ids, positions,
    count)."""
    n = best_id.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    nn = jnp.int32(n)

    matched = best_len > 0
    land = jnp.minimum(pos + best_len, nn)
    fail_j = jnp.minimum(pos + feats.window, nn)
    # On failure: advance past the probe window, skip to the next
    # word-prefix position, then skip spaces (src/fast.cpp:84-95).
    step = jnp.where(matched, feats.ss[land], feats.ss[feats.wnext[fail_j]])

    # Seeds: every unit start.  A "unit" is a maximal space-free run; the
    # walk provably visits every unit start (it only ever crosses into a
    # later unit at that unit's first non-space position), so seeding all
    # of them is exact and shrinks the pointer-doubling depth from
    # log2(n) to log2(longest within-unit chain).
    prev_space = jnp.concatenate([jnp.array([True]), feats.space[:-1]])
    visited = ~feats.space & prev_space & (pos < nn)

    jump = step  # int32[n], values in [0, n]

    def cond_fn(carry):
        visited, jump, changed = carry
        return changed

    def round_fn(carry):
        visited, jump, _ = carry
        scat = (
            jnp.zeros((n + 1,), dtype=jnp.int32)
            .at[jnp.where(visited, jump, nn)]
            .max(visited.astype(jnp.int32))
        )
        new_visited = visited | (scat[:n] > 0)
        changed = jnp.any(new_visited != visited)
        jump_ext = jnp.concatenate([jump, jnp.array([n], dtype=jnp.int32)])
        jump = jump_ext[jump]
        return new_visited, jump, changed

    visited, jump, _ = jax.lax.while_loop(
        cond_fn, round_fn, (visited, jump, jnp.bool_(True))
    )

    # Segments: visited word-prefix positions start segments.
    seg_start = visited & feats.wp
    seg_id = jnp.cumsum(seg_start.astype(jnp.int32))  # inclusive; >=1 on visited
    failed_here = visited & ~matched
    seg_killed_tab = (
        jnp.zeros((n + 2,), dtype=jnp.int32)
        .at[jnp.where(failed_here, seg_id, nn + 1)]
        .max(failed_here.astype(jnp.int32))
    )
    killed = seg_killed_tab[seg_id] > 0

    emit = visited & ((matched & ~killed) | (seg_start & killed))
    emit_val = jnp.where(killed, jnp.int32(unk_id), best_id)

    out_idx = jnp.cumsum(emit.astype(jnp.int32)) - 1
    count = jnp.where(emit.any(), out_idx[-1] + 1, 0)
    scatter_to = jnp.where(emit, out_idx, nn)
    ids = (
        jnp.full((n,), -2, dtype=jnp.int32).at[scatter_to].set(emit_val, mode="drop")
    )
    positions = (
        jnp.full((n,), -1, dtype=jnp.int32).at[scatter_to].set(pos, mode="drop")
    )
    return ids, positions, count
