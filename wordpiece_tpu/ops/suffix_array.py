"""Suffix array + LCP, TPU-idiomatic (prefix doubling over XLA sorts).

The reference builds its suffix array with SA-IS (libsais, recursion +
induced sorting — scatter-heavy and hostile to XLA; SURVEY.md §7 ranks it
the hardest part).  The TPU-native route is prefix doubling: O(log n)
rounds of multi-key sort, which maps onto XLA's sort primitive.  The LCP
array then comes from binary lifting over the saved per-round rank
arrays (compare suffix pairs rank-by-rank, descending powers of two) —
fully parallel, no sequential Kasai pass.

Complexity O(n log n) vs the reference's O(n), but every step is a sort
or an elementwise pass, which is what the hardware actually runs fast;
the reference itself notes its LCP choice trades asymptotics for speed
(src/linear.cpp:143).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _ceil_log2(n: int) -> int:
    return max(1, (n - 1).bit_length())


@partial(jax.jit, static_argnames=("n_levels",))
def suffix_array_ranks(s: jax.Array, n_levels: int):
    """Prefix-doubling SA.

    Args: s int32[n] (values >= 0).  n_levels >= ceil_log2(n).
    Returns (sa int32[n], rank int32[n], levels int32[n_levels, n])
    where levels[k][i] is suffix i's rank after comparing 2^k chars.
    """
    n = s.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)

    # Initial ranks: dense ranks of single characters.
    order0 = jnp.argsort(s, stable=True).astype(jnp.int32)
    sorted_vals = s[order0]
    new_group = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), (sorted_vals[1:] != sorted_vals[:-1]).astype(jnp.int32)]
    )
    rank_sorted = jnp.cumsum(new_group)
    rank = jnp.zeros(n, jnp.int32).at[order0].set(rank_sorted.astype(jnp.int32))

    levels = jnp.zeros((n_levels, n), dtype=jnp.int32)
    levels = levels.at[0].set(rank)

    def round_fn(k, carry):
        rank, levels = carry
        shift = jnp.int32(1) << k
        rank2 = jnp.where(idx + shift < n, rank[jnp.minimum(idx + shift, n - 1)], -1)
        # Sort by (rank, rank2); then dense re-rank.
        _, _, order = jax.lax.sort(
            (rank, rank2, idx), num_keys=2, is_stable=True
        )
        r1 = rank[order]
        r2 = rank2[order]
        new_group = jnp.concatenate(
            [
                jnp.zeros(1, jnp.int32),
                ((r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])).astype(jnp.int32),
            ]
        )
        new_rank_sorted = jnp.cumsum(new_group)
        new_rank = jnp.zeros(n, jnp.int32).at[order].set(new_rank_sorted.astype(jnp.int32))
        levels = levels.at[k + 1].set(new_rank)
        return new_rank, levels

    # Rounds 0..n_levels-2 fill levels 1..n_levels-1.
    rank, levels = jax.lax.fori_loop(0, n_levels - 1, round_fn, (rank, levels))

    sa = jnp.zeros(n, jnp.int32).at[rank].set(idx)
    return sa, rank, levels


@partial(jax.jit, static_argnames=("n_levels",))
def lcp_from_levels(sa: jax.Array, levels: jax.Array, n_levels: int) -> jax.Array:
    """lcp[r] = LCP(suffix sa[r], suffix sa[r+1]), last entry 0.

    Binary lifting: walk descending powers of two; equal rank at level k
    means the first 2^k chars agree, so advance both suffixes by 2^k.
    """
    n = sa.shape[0]
    a = sa
    b = jnp.concatenate([sa[1:], jnp.full((1,), n - 1, jnp.int32)])
    valid_pair = jnp.arange(n) < n - 1

    def body(i, carry):
        a, b, lcp = carry
        k = n_levels - 1 - i
        step = jnp.int32(1) << k
        ra = levels[k][jnp.minimum(a, n - 1)]
        rb = levels[k][jnp.minimum(b, n - 1)]
        ok = (a < n) & (b < n) & (ra == rb) & (step <= n)
        a = jnp.where(ok, a + step, a)
        b = jnp.where(ok, b + step, b)
        lcp = jnp.where(ok, lcp + step, lcp)
        return a, b, lcp

    _, _, lcp = jax.lax.fori_loop(
        0, n_levels, body, (a, b, jnp.zeros(n, jnp.int32))
    )
    return jnp.where(valid_pair, lcp, 0)
