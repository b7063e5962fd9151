"""General suffix array + clamped LCP (the linear engine's FALLBACK path).

The reference builds its suffix array with SA-IS (libsais, recursion +
induced sorting — scatter-heavy and hostile to XLA; SURVEY.md §7 ranks it
the hardest part).  The TPU-native route here is prefix doubling:
O(log n) rounds of multi-key sort, which maps onto XLA's sort primitive,
with a while_loop that exits as soon as all ranks are distinct (real
text separates in far fewer than log2(n) rounds).

The PRODUCTION linear path does not need a true suffix array at all: its
sweeps observe LCP only clamped at max_len, so a single nk-pass radix
sort over packed k-gram keys suffices — that specialized sort lives
fused inside engine_linear._linear_batch_device.  This module's general
(unclamped) construction remains for vocabularies whose alphabet x token
length degenerates the packed keys (engine_linear._encode_batch_doubling).

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
