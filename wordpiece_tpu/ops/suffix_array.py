"""Suffix array + clamped LCP, TPU-idiomatic.

The reference builds its suffix array with SA-IS (libsais, recursion +
induced sorting — scatter-heavy and hostile to XLA; SURVEY.md §7 ranks it
the hardest part).  The TPU-native route is prefix doubling: O(log n)
rounds of multi-key sort, which maps onto XLA's sort primitive, with a
while_loop that exits as soon as all ranks are distinct (real text
separates in far fewer than log2(n) rounds thanks to the unique
separator layout of S).

LCP: the monotone-stack sweeps only ever compare LCP values against
token lengths <= max_len, so LCP clamped at max_len is sufficient
(min(lcp, max_len) is what the stack condition observes).  That turns
the LCP array into max_len vectorized character comparisons — no Kasai
sequential pass, no rank-level storage.  The reference itself trades
LCP asymptotics for practical speed (src/linear.cpp:143).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _ceil_log2(n: int) -> int:
    return max(1, (n - 1).bit_length())


@jax.jit
def suffix_array(s: jax.Array):
    """Prefix-doubling SA with early exit.

    Args: s int32[n] (values >= 0).
    Returns (sa int32[n], rank int32[n]).
    """
    n = s.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)

    # Initial ranks over the first TWO symbols (one 2-key sort replaces
    # the single-symbol sort plus the shift=1 doubling round).
    s2 = jnp.concatenate([s[1:], jnp.full((1,), -1, s.dtype)])
    _, _, order0 = jax.lax.sort((s, s2, idx), num_keys=2, is_stable=True)
    v1 = s[order0]
    v2 = s2[order0]
    new_group = jnp.concatenate(
        [
            jnp.zeros(1, jnp.int32),
            ((v1[1:] != v1[:-1]) | (v2[1:] != v2[:-1])).astype(jnp.int32),
        ]
    )
    ranks0 = jnp.cumsum(new_group).astype(jnp.int32)
    rank = jnp.zeros(n, jnp.int32).at[order0].set(ranks0)

    def cond(carry):
        rank, shift, done = carry
        return (~done) & (shift < n)

    def body(carry):
        rank, shift, _ = carry
        rank2 = jnp.where(idx + shift < n, rank[jnp.minimum(idx + shift, n - 1)], -1)
        _, _, order = jax.lax.sort((rank, rank2, idx), num_keys=2, is_stable=True)
        r1 = rank[order]
        r2 = rank2[order]
        new_group = jnp.concatenate(
            [
                jnp.zeros(1, jnp.int32),
                ((r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])).astype(jnp.int32),
            ]
        )
        ranks_sorted = jnp.cumsum(new_group).astype(jnp.int32)
        new_rank = jnp.zeros(n, jnp.int32).at[order].set(ranks_sorted)
        done = ranks_sorted[-1] == jnp.int32(n - 1)  # all distinct
        return new_rank, shift * 2, done

    done0 = jnp.bool_(n <= 1) | (ranks0[-1] == jnp.int32(n - 1))
    rank, _, _ = jax.lax.while_loop(cond, body, (rank, jnp.int32(2), done0))
    sa = jnp.zeros(n, jnp.int32).at[rank].set(idx)
    return sa, rank


@partial(jax.jit, static_argnames=("bits", "per", "nk", "clamp"))
def kgram_rank_lcp(s: jax.Array, *, bits: int, per: int, nk: int, clamp: int):
    """Clamped suffix ordering in ONE sort: suffixes sorted by their first
    nk*per >= clamp symbols (packed `per` symbols of `bits` bits into each
    int32 key), ties broken by index.  Returns (sa, rank, lcp) with lcp
    clamped at `clamp`, computed key-locally (no gathers).

    Why this replaces a true suffix array (and the reference's SA-IS,
    src/linear.cpp:121-137): the monotone-stack sweeps (ops/linear_match.py)
    observe LCP only through comparisons against token lengths <= max_len =
    clamp, and clamped LCP is an ultrametric whose adjacent-min telescoping
    property holds in ANY total order consistent with first-clamp-symbol
    lexicographic order.  Tie order beyond clamp symbols therefore cannot
    change which tokens survive at which positions.  One fixed multi-key
    sort replaces the O(log n) data-dependent doubling rounds — the
    TPU-shaped formulation (static trip counts, a single fused program).

    Requirements on `s`: values in [0, 2^bits - 2] for real symbols; the
    caller's pad value must be exactly 2^bits - 1 (reads past the end use
    the same value).  bits * per must be <= 30 (keys stay positive int32).

    The multi-key order is realized as LSD radix passes — nk iterations
    of ONE compiled 2-operand stable sort inside a fori_loop — because
    XLA:TPU sort compile time grows steeply with operand count (measured
    on v5e at n=393216: 6-operand sort 123s to compile, this loop 15s,
    identical output; run time is sub-ms either way).
    """
    n = s.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    pad_sym = jnp.int32((1 << bits) - 1)
    s_ext = jnp.concatenate([s, jnp.full((nk * per,), pad_sym, s.dtype)])
    keys = []
    for j in range(nk):
        k = jnp.zeros(n, jnp.int32)
        for t in range(per):
            off = j * per + t
            k = (k << bits) | s_ext[off : off + n]
        keys.append(k)
    keys = jnp.stack(keys)  # [nk, n]

    def body(j, perm):
        d = keys[nk - 1 - j][perm]
        _, perm = jax.lax.sort((d, perm), num_keys=1, is_stable=True)
        return perm

    # Initial perm = idx (ascending) + stable passes over keys
    # nk-1 .. 0 == lexicographic by (k_0, ..., k_{nk-1}, idx).
    sa = jax.lax.fori_loop(0, nk, body, idx)
    rank = jnp.zeros(n, jnp.int32).at[sa].set(idx)

    # lcp[r] between sorted suffixes r and r+1, from the keys alone:
    # symbol t of key j is bits-wide at shift bits*(per-1-t).
    mask = jnp.int32((1 << bits) - 1)
    alive = jnp.ones(n, dtype=bool)
    lcp = jnp.zeros(n, jnp.int32)
    counted = 0
    for j in range(nk):
        if counted >= clamp:
            break
        kj = keys[j][sa]
        nxt = jnp.concatenate([kj[1:], kj[-1:]])
        for t in range(per):
            if counted >= clamp:
                break
            shift = bits * (per - 1 - t)
            eq = ((kj >> shift) & mask) == ((nxt >> shift) & mask)
            alive = alive & eq
            lcp = lcp + alive
            counted += 1
    lcp = jnp.where(idx < n - 1, lcp, 0)
    return sa, rank, lcp


def kgram_plan(sigma: int, max_len: int) -> tuple[int, int, int] | None:
    """(bits, per, nk) for kgram_rank_lcp given alphabet size `sigma`
    (dense values 0..sigma-1; pad = 2^bits - 1 must exceed sigma - 1) and
    clamp = max_len; None when the key count would be unreasonable (huge
    alphabet x huge max token length — callers fall back to doubling)."""
    bits = max(1, int(sigma).bit_length())
    per = max(1, min(30 // bits, max_len))
    nk = -(-max_len // per)
    if nk > 24:
        return None
    return bits, per, nk


@partial(jax.jit, static_argnames=("clamp",))
def lcp_clamped(s: jax.Array, sa: jax.Array, *, clamp: int) -> jax.Array:
    """lcp[r] = min(clamp, LCP(suffix sa[r], suffix sa[r+1])); last 0.

    Direct comparison: `clamp` vectorized rounds, each comparing the
    next character of every adjacent suffix pair.
    """
    n = sa.shape[0]
    a = sa
    b = jnp.concatenate([sa[1:], jnp.full((1,), n - 1, jnp.int32)])
    alive = jnp.arange(n) < n - 1
    lcp = jnp.zeros(n, jnp.int32)
    for j in range(clamp):
        ok = alive & (a + j < n) & (b + j < n)
        ca = s[jnp.minimum(a + j, n - 1)]
        cb = s[jnp.minimum(b + j, n - 1)]
        ok = ok & (ca == cb)
        lcp = lcp + ok.astype(jnp.int32)
        alive = ok
    return lcp
