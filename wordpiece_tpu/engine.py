"""Single-chip encode engine: orchestration + jit cache.

Pipeline (all on device, one fused jit program):
  codepoints -> text features -> per-position longest match -> greedy
  commit -> compacted ids.

The public host API (encode/decode/encode_external) lives in api.py; this
module owns the padded static-shape convention: inputs are padded to a
bucket size (powers of two between 2^7 and 2^22, then multiples of 2^22)
so arbitrary corpus sizes reuse a handful of compiled programs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .core.vocab import Vocabulary, VocabIndex, build_index
from .ops import commit as commit_ops
from .ops import match_fast
from .ops import text_features


def bucket_size(n: int) -> int:
    """Static padded size for a length-n input."""
    if n <= 128:
        return 128
    cap = 1 << 22
    if n <= cap:
        return 1 << (n - 1).bit_length()
    return ((n + cap - 1) // cap) * cap


@partial(
    jax.jit,
    static_argnames=("max_len", "max_probe", "log2_size", "mult1", "mult2", "unk_id"),
)
def encode_padded(
    cp_pad: jax.Array,  # int32[n + max_len]
    n_valid: jax.Array,  # int32 scalar
    table: jax.Array,  # int32[S, 5]
    *,
    max_len: int,
    max_probe: int,
    log2_size: int,
    mult1: int,
    mult2: int,
    unk_id: int,
) -> tuple[jax.Array, jax.Array]:
    """Returns (ids int32[n] padded with -2, count int32)."""
    n = cp_pad.shape[0] - max_len
    cp = cp_pad[:n]
    feats = text_features.compute_features(cp, n_valid, max_len)
    best_id, best_len = match_fast.match_positions(
        cp_pad,
        feats.window,
        feats.wp,
        table,
        max_len=max_len,
        max_probe=max_probe,
        log2_size=log2_size,
        mult1=mult1,
        mult2=mult2,
    )
    return commit_ops.commit(best_id, best_len, feats, n_valid, unk_id=unk_id)


class FastEncoder:
    """Replicated-vocab encoder; host-facing, device-computing."""

    def __init__(self, vocab: Vocabulary, index: VocabIndex | None = None):
        self.vocab = vocab
        self.index = index if index is not None else build_index(vocab)
        self.table = match_fast.pack_table(self.index)
        self._statics = dict(
            max_len=int(self.index.max_len),
            max_probe=int(self.index.max_probe),
            log2_size=int(self.index.log2_size),
            mult1=int(self.index.mult1),
            mult2=int(self.index.mult2),
            unk_id=int(self.index.unk_token_id),
        )

    def encode_codepoints(self, cps: np.ndarray) -> np.ndarray:
        """Encode a host codepoint array; returns int32 id array."""
        cps = np.asarray(cps, dtype=np.int32)
        n = cps.shape[0]
        if n == 0:
            return np.zeros(0, dtype=np.int32)
        max_len = self._statics["max_len"]
        pad_n = bucket_size(n)
        cp_pad = np.zeros(pad_n + max_len, dtype=np.int32)
        cp_pad[:n] = cps
        ids, count = encode_padded(
            jnp.asarray(cp_pad), jnp.int32(n), self.table, **self._statics
        )
        count = int(count)
        return np.asarray(ids[:count])
