"""Device-side (jax.numpy) character classes and per-position text features.

The TPU analogue of the reference's character classifiers plus the
position-wise quantities that drive matching:

 - ``space/punct/spacing`` flags (utf8.cpp:10-29 semantics);
 - ``wp``: is_word_prefix[i] = (i==0) | spacing[i] | spacing[i-1]
   (src/fast.cpp:38-41);
 - ``window``: the probe window at i = the reference's ``word_len`` scan
   result (src/fast.cpp:53-60): 1 for punctuation, else
   min(max_len, n_valid - i, distance to the next spacing char after i);
 - next-position helpers ``ss`` (skip spaces) and ``wnext`` (next word
   prefix), both length n+1 with sentinel n, used by the commit step.

Everything is branch-free array code; padding positions (i >= n_valid)
are treated as spaces so they are skipped and never emit.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..core import unicode as uni


@lru_cache(maxsize=1)
def _ascii_tables():
    space = np.zeros(256, dtype=bool)
    for c in (9, 10, 11, 12, 13, 32):
        space[c] = True
    punct = np.zeros(256, dtype=bool)
    for c in (
        list(range(33, 48)) + list(range(58, 65)) + list(range(91, 97)) + list(range(123, 127))
    ):
        punct[c] = True
    # numpy constants: safe to embed in any trace (no tracer leaks).
    return space, punct


def is_space_j(cp: jax.Array) -> jax.Array:
    # Arithmetic only — table gathers are slow on TPU.
    return (cp == 32) | ((cp >= 9) & (cp <= 13)) | (cp == uni.SPACE_TOKEN)


def is_punct_j(cp: jax.Array) -> jax.Array:
    ascii_punct = (
        ((cp >= 33) & (cp <= 47))
        | ((cp >= 58) & (cp <= 64))
        | ((cp >= 91) & (cp <= 96))
        | ((cp >= 123) & (cp <= 126))
    )
    extra = (cp == 183) | (cp == 171) | (cp == 187) | (cp == 8249) | (cp == 8250)
    dash = (cp >= 8208) & (cp <= 8248)
    return ascii_punct | extra | dash


def is_chinese_j(cp: jax.Array) -> jax.Array:
    out = jnp.zeros(cp.shape, dtype=bool)
    for lo, hi in uni._CHINESE_RANGES:
        out = out | ((cp >= lo) & (cp <= hi))
    return out


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TextFeatures:
    space: jax.Array  # bool[n], pad => True
    punct: jax.Array  # bool[n]
    spacing: jax.Array  # bool[n], pad => True
    wp: jax.Array  # bool[n] is_word_prefix
    window: jax.Array  # int32[n] probe window (>=1)
    ss: jax.Array  # int32[n+1] next non-space index at-or-after (sentinel n)
    wnext: jax.Array  # int32[n+1] next word-prefix index at-or-after (sentinel n)


def _next_at_or_after(flag: jax.Array, n: int) -> jax.Array:
    """int32[n+1]: for each i, min{j >= i : flag[j]} else n (sentinel)."""
    pos = jnp.arange(n, dtype=jnp.int32)
    vals = jnp.where(flag, pos, jnp.int32(n))
    rev = jnp.flip(vals)
    nxt = jnp.flip(jax.lax.cummin(rev))
    return jnp.concatenate([nxt, jnp.array([n], dtype=jnp.int32)])


def compute_features(cp: jax.Array, n_valid: jax.Array, max_len: int) -> TextFeatures:
    """cp: int32[n] codepoints (garbage beyond n_valid); n_valid scalar."""
    n = cp.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    pad = pos >= n_valid

    space = is_space_j(cp) | pad
    punct = is_punct_j(cp) & ~pad
    spacing = (space | punct | is_chinese_j(cp)) | pad

    prev_spacing = jnp.concatenate([jnp.array([False]), spacing[:-1]])
    wp = (pos == 0) | spacing | prev_spacing

    # Distance to the next spacing char strictly after i: the word_len scan
    # checks text[i+k] for k >= 1 (src/fast.cpp:56-59).
    nsp = _next_at_or_after(spacing, n)  # at-or-after
    next_spacing_after = nsp[1:]  # index of first spacing char > i - 1 ... see below
    # nsp has length n+1; nsp[i+1] is the first spacing index >= i+1, i.e. > i.
    dist = next_spacing_after - pos  # >= 1 when spacing[i] is False... careful at i itself

    window = jnp.minimum(jnp.int32(max_len), n_valid.astype(jnp.int32) - pos)
    window = jnp.minimum(window, dist)
    window = jnp.where(punct, jnp.int32(1), window)
    window = jnp.maximum(window, jnp.int32(1))

    ss = _next_at_or_after(~space, n)
    wnext = _next_at_or_after(wp, n)
    return TextFeatures(
        space=space, punct=punct, spacing=spacing, wp=wp, window=window, ss=ss, wnext=wnext
    )
