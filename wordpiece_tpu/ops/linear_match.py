"""Linear-engine matching: surviving-token-slot scans over SA order.

The reference's get_closest (src/linear.cpp:161-213) walks the suffix
array with a monotone stack: a vocab token (pushed at its suffix's SA
position) survives while the running LCP minimum stays >= its length;
the stack top at each position is the longest vocab token that prefixes
that suffix.  Since surviving tokens are nested prefixes of the current
suffix, the stack is at most max_len deep and is representable as a
fixed array of slots indexed BY LENGTH — and each length's slot has a
closed form over running maxima (see surviving_slots), so the whole
sequential stack walk becomes two batched cummax passes and a gather.

Four scans (left/right x prefix/suffix kind) as in the reference; the
union of the four slot sets gives, per SA position, ALL vocab tokens
matching there, so the engine can apply the probe-window cap exactly and
reproduce the Fast engine's (canonical) semantics even for vocab tokens
containing interior spacing characters — a case where the reference's
linear algorithm would silently diverge from its fast one (no window
check in match_word_piece, src/linear.cpp:221-274; the divergence is
untested upstream because the stress vocabs are a-z only).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("max_len",))
def surviving_slots(
    lcp_edge: jax.Array,  # int32[n]: LCP between position p-1 and p (p=0 -> big)
    push_len: jax.Array,  # int32[n]: token length pushed at p (0 = none)
    push_id: jax.Array,  # int32[n]
    *,
    max_len: int,
) -> jax.Array:
    """Inclusive monotone-stack scan; returns slots int32[n, max_len].

    slots[p, l-1] = id of the token of length l pushed at the LATEST
    position q <= p that still survives at p.  Survival means every edge
    strictly after q up to p has LCP >= l (the stack-filter condition);
    equivalently q >= lastkill_l[p], where lastkill_l[p] is the latest
    position r <= p whose entering edge has lcp_edge[r] < l (the edge at
    r sits BEFORE r's own push, so a push at r survives its own edge).

    This closed form replaces the associative slot scan: per length it is
    two running maxima and a gather — XLA's cummax lowers to a tiny
    program, where associative_scan over [n, max_len] slot state
    generated an HLO graph that took minutes to compile on TPU at
    n ~ 4e5 (the run cost is also lower: 2 cummax passes vs log2(n)
    combine levels over the full slot matrix).
    """
    n = lcp_edge.shape[0]
    M = max_len
    pos = jnp.arange(n, dtype=jnp.int32)
    lens = jnp.arange(1, M + 1, dtype=jnp.int32)

    # lastpush[l-1, p]: latest q <= p with push_len[q] == l (-1 if none).
    ppos = jnp.where(push_len[None, :] == lens[:, None], pos[None, :], -1)
    lastpush = jax.lax.cummax(ppos, axis=1)
    # lastkill[l-1, p]: latest r <= p with lcp_edge[r] < l (0 if none;
    # a kill at r=0 is vacuous — no pushes precede position 0).
    kpos = jnp.where(lcp_edge[None, :] < lens[:, None], pos[None, :], 0)
    lastkill = jax.lax.cummax(kpos, axis=1)

    alive = (lastpush >= 0) & (lastpush >= lastkill)
    ids = push_id[jnp.maximum(lastpush, 0)]
    return jnp.where(alive, ids, -1).T


@partial(jax.jit, static_argnames=("max_len",))
def match_from_sa(
    rank: jax.Array,  # int32[n_s]: SA rank of every S position
    lcp: jax.Array,  # int32[n_s]: lcp[r] between sa[r], sa[r+1]
    who_len: jax.Array,  # int32[n_s]: at SA rank r, eligible token len (0 none)
    who_id: jax.Array,  # int32[n_s]
    who_kind: jax.Array,  # int32[n_s]: 1 prefix, 0 suffix (-1 none)
    text_len: int | jax.Array,
    window: jax.Array,  # int32[n_text]
    wp: jax.Array,  # bool[n_text]
    *,
    max_len: int,
) -> tuple[jax.Array, jax.Array]:
    """Returns (best_id, best_len) per text position (canonical window-capped
    longest match), computed from the suffix array."""
    n_s = rank.shape[0]
    n_text = window.shape[0]
    big = jnp.int32(1 << 30)

    # Edges: left-sweep edge entering rank r is lcp[r-1] (big at r=0);
    # right-sweep (descending r) edge entering r is lcp[r] (big at n-1).
    lcp_left = jnp.concatenate([jnp.full((1,), big, jnp.int32), lcp[:-1]])
    lcp_rev = jnp.flip(lcp).at[0].set(big)  # reversed-coordinate edges
    slots_acc = []
    for kind in (1, 0):
        push = who_kind == kind
        plen = jnp.where(push, who_len, 0)
        pid = jnp.where(push, who_id, -1)
        left = surviving_slots(lcp_left, plen, pid, max_len=max_len)
        right_rev = surviving_slots(
            lcp_rev, jnp.flip(plen), jnp.flip(pid), max_len=max_len
        )
        right = jnp.flip(right_rev, axis=0)
        slots_acc.append((left, right))

    # Per text position: union of its kind's left/right slots, capped.
    # Positions beyond the true text (space padding) read clamped garbage
    # ranks; the commit phase never visits them.
    pos = jnp.arange(n_text, dtype=jnp.int32)
    r_text = rank[jnp.minimum(pos, jnp.int32(n_s - 1))]  # SA rank per text suffix
    lens = jnp.arange(1, max_len + 1, dtype=jnp.int32)

    def best_of(slots_pair):
        left, right = slots_pair
        sl = left[r_text]
        sr = right[r_text]
        merged = jnp.where(sr >= 0, sr, sl)
        ok = (merged >= 0) & (lens[None, :] <= window[:, None])
        # Longest valid length.
        best_l = jnp.max(jnp.where(ok, lens[None, :], 0), axis=1)
        take = (lens[None, :] == best_l[:, None]) & ok
        best_i = jnp.max(jnp.where(take, merged, -1), axis=1)
        return best_i, best_l

    id_p, len_p = best_of(slots_acc[0])
    id_s, len_s = best_of(slots_acc[1])
    best_id = jnp.where(wp, id_p, id_s)
    best_len = jnp.where(wp, len_p, len_s)
    return best_id, best_len
