"""Per-position longest-match via rolling-hash table probes (Fast engine).

TPU-native reformulation of the reference's inner probe loop
(src/fast.cpp:53-96).  Instead of a per-word sequential scan with a
pop_back rolling hash, every text position probes all lengths 1..max_len
in a vectorized length loop:

  for l in 1..max_len:
      h_l[i] = h_{l-1}[i] * P + cp[i + l - 1]     (two 32-bit hashes)
      probe the replicated open-addressing table with (h1, h2, l, kind[i])
      accept if hit and l <= window[i]; longest l wins.

All positions are independent, so the work is pure SIMD: O(n * max_len)
hash updates and table gathers, no data-dependent control flow.  The table
layout is built host-side in core/vocab.py (no intra-vocab collisions,
exact probe-chain bound), and each slot also stores the token's first
codepoint, which the probe compares as an extra guard.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TABLE_K1, TABLE_K2, TABLE_META, TABLE_ID, TABLE_FIRST = range(5)


def pack_table(index) -> jnp.ndarray:
    """VocabIndex -> single int32[S, 5] device table."""
    import numpy as np

    first = np.where(
        index.table_id >= 0,
        index.packed[np.maximum(index.table_id, 0), 0],
        -1,
    ).astype(np.int32)
    return jnp.asarray(
        np.stack(
            [
                index.table_k1.view(np.int32),
                index.table_k2.view(np.int32),
                index.table_meta,
                index.table_id,
                first,
            ],
            axis=1,
        )
    )


def _bucket_j(h1, h2, kind, length, log2_size: int):
    mixed = (
        h1
        ^ (h2 << jnp.uint32(1))
        ^ (length.astype(jnp.uint32) * jnp.uint32(0x9E3779B1))
        ^ (kind.astype(jnp.uint32) * jnp.uint32(0x85EBCA77))
    )
    return ((mixed * jnp.uint32(0x9E3779B1)) >> jnp.uint32(32 - log2_size)).astype(jnp.int32)


def match_positions(
    cp_pad: jax.Array,  # int32[n + max_len] codepoints, zero pad
    window: jax.Array,  # int32[n]
    wp: jax.Array,  # bool[n] word-prefix flag => probe kind
    table: jax.Array,  # int32[S, 5]
    *,
    max_len: int,
    max_probe: int,
    log2_size: int,
    mult1: int,
    mult2: int,
) -> tuple[jax.Array, jax.Array]:
    """Returns (best_id int32[n], best_len int32[n]); best_len==0 => no match."""
    n = window.shape[0]
    mask = jnp.int32((1 << log2_size) - 1)
    kind = wp.astype(jnp.uint32)
    m1 = jnp.uint32(mult1)
    m2 = jnp.uint32(mult2)

    def body(l, carry):
        h1, h2, best_id, best_len = carry
        c = jax.lax.dynamic_slice(cp_pad, (l - 1,), (n,)).astype(jnp.uint32)
        h1 = h1 * m1 + c
        h2 = h2 * m2 + c
        bucket = _bucket_j(h1, h2, kind, l, log2_size)
        meta_want = ((l.astype(jnp.int32) << 1) | kind.astype(jnp.int32))
        first_want = cp_pad[:n]
        found = jnp.full((n,), -1, dtype=jnp.int32)
        for p in range(max_probe):
            slot = (bucket + p) & mask
            rows = table[slot]  # int32[n, 5]
            hit = (
                (rows[:, TABLE_K1] == h1.astype(jnp.int32))
                & (rows[:, TABLE_K2] == h2.astype(jnp.int32))
                & (rows[:, TABLE_META] == meta_want)
                & (rows[:, TABLE_FIRST] == first_want)
            )
            found = jnp.where(hit & (found < 0), rows[:, TABLE_ID], found)
        ok = (found >= 0) & (l <= window)
        best_id = jnp.where(ok, found, best_id)
        best_len = jnp.where(ok, l, best_len)
        return h1, h2, best_id, best_len

    h1 = jnp.zeros((n,), dtype=jnp.uint32)
    h2 = jnp.zeros((n,), dtype=jnp.uint32)
    best_id = jnp.full((n,), -1, dtype=jnp.int32)
    best_len = jnp.zeros((n,), dtype=jnp.int32)
    h1, h2, best_id, best_len = jax.lax.fori_loop(
        1, max_len + 1, body, (h1, h2, best_id, best_len)
    )
    return best_id, best_len
