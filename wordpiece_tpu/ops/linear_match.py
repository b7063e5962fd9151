"""Linear-engine matching: surviving-token-slot scans over SA order.

The reference's get_closest (src/linear.cpp:161-213) walks the suffix
array with a monotone stack: a vocab token (pushed at its suffix's SA
position) survives while the running LCP minimum stays >= its length;
the stack top at each position is the longest vocab token that prefixes
that suffix.  Since surviving tokens are nested prefixes of the current
suffix, the stack is at most max_len deep and is representable as a
fixed array of slots indexed BY LENGTH — and each length's slot has a
closed form over running maxima (see surviving_push), so the whole
sequential stack walk becomes two batched cummax passes.

Four scans (left/right x prefix/suffix kind) as in the reference; the
union of the four slot sets gives, per SA position, ALL vocab tokens
matching there, so the engine can apply the probe-window cap exactly and
reproduce the Fast engine's (canonical) semantics even for vocab tokens
containing interior spacing characters — a case where the reference's
linear algorithm would silently diverge from its fast one (no window
check in match_word_piece, src/linear.cpp:221-274; the divergence is
untested upstream because the stress vocabs are a-z only).

TPU shape notes (why slots carry PUSH POSITIONS, not token ids): the
natural formulation gathers push_id[lastpush] over the full [n, max_len]
slot matrix — ~10M elementwise gathers per batch, the slowest op class
on TPU.  Positions ARE the cummax values (no indexing), so the id gather
can wait until after per-text-position length selection: one gather per
text position per (kind, side), ~40x less gather volume.  The kill scan
depends only on the LCP edges, so it is computed once per direction and
shared by both kinds.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def surviving_push(
    lcp_edge: jax.Array,  # int32[n]: LCP between position p-1 and p (p=0 -> big)
    push_len: jax.Array,  # int32[n]: token length pushed at p (0 = none)
    lastkill: jax.Array,  # int32[max_len, n]: latest r <= p with lcp_edge[r] < l
    *,
    max_len: int,
) -> jax.Array:
    """Inclusive monotone-stack scan; returns push positions
    int32[max_len, n] (-1 where no surviving push).

    out[l-1, p] = the LATEST position q <= p that pushed a token of
    length l and still survives at p.  Survival means every edge strictly
    after q up to p has LCP >= l (the stack-filter condition);
    equivalently q >= lastkill_l[p], where lastkill_l[p] is the latest
    position r <= p whose entering edge has lcp_edge[r] < l (the edge at
    r sits BEFORE r's own push, so a push at r survives its own edge).

    This closed form replaces the associative slot scan: per length it is
    one running maximum against a shared kill table — XLA's cummax
    lowers to a tiny program, where associative_scan over [n, max_len]
    slot state generated an HLO graph that took minutes to compile on
    TPU at n ~ 4e5 (the run cost is also lower: cummax passes vs
    log2(n) combine levels over the full slot matrix).
    """
    n = lcp_edge.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    lens = jnp.arange(1, max_len + 1, dtype=jnp.int32)

    # lastpush[l-1, p]: latest q <= p with push_len[q] == l (-1 if none).
    ppos = jnp.where(push_len[None, :] == lens[:, None], pos[None, :], -1)
    lastpush = jax.lax.cummax(ppos, axis=1)
    alive = (lastpush >= 0) & (lastpush >= lastkill)
    return jnp.where(alive, lastpush, -1)


def _lastkill(lcp_edge: jax.Array, *, max_len: int) -> jax.Array:
    """int32[max_len, n]: latest r <= p with lcp_edge[r] < l (0 if none;
    a kill at r=0 is vacuous — no pushes precede position 0).  Depends
    only on the edges: shared by both kinds of one direction."""
    n = lcp_edge.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    lens = jnp.arange(1, max_len + 1, dtype=jnp.int32)
    kpos = jnp.where(lcp_edge[None, :] < lens[:, None], pos[None, :], 0)
    return jax.lax.cummax(kpos, axis=1)


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
    kill_left = _lastkill(lcp_left, max_len=max_len)
    kill_rev = _lastkill(lcp_rev, max_len=max_len)

    pos = jnp.arange(n_text, dtype=jnp.int32)
    r_text = rank[jnp.minimum(pos, jnp.int32(n_s - 1))]  # SA rank per text suffix
    lens = jnp.arange(1, max_len + 1, dtype=jnp.int32)
    last = jnp.int32(n_s - 1)

    def best_of(kind):
        push = who_kind == kind
        plen = jnp.where(push, who_len, 0)
        # Push positions surviving at each rank, [max_len, n_s]; the
        # right sweep runs in reversed coordinates and converts back.
        left_q = surviving_push(lcp_left, plen, kill_left, max_len=max_len)
        right_qr = surviving_push(
            lcp_rev, jnp.flip(plen), kill_rev, max_len=max_len
        )
        # Per text position: its rank's slots, [n_text, max_len].
        sl = left_q[:, r_text].T
        sr_r = right_qr[:, last - r_text].T
        sr = jnp.where(sr_r >= 0, last - sr_r, -1)  # reversed -> true rank
        merged_q = jnp.where(sr >= 0, sr, sl)
        ok = (merged_q >= 0) & (lens[None, :] <= window[:, None])
        best_l = jnp.max(jnp.where(ok, lens[None, :], 0), axis=1)
        take = (lens[None, :] == best_l[:, None]) & ok
        best_q = jnp.max(jnp.where(take, merged_q, -1), axis=1)
        # ONE id gather per text position, after selection.
        best_i = jnp.where(
            best_q >= 0, who_id[jnp.maximum(best_q, 0)], -1
        )
        return best_i, best_l

    id_p, len_p = best_of(1)
    id_s, len_s = best_of(0)
    best_id = jnp.where(wp, id_p, id_s)
    best_len = jnp.where(wp, len_p, len_s)
    return best_id, best_len
