"""Linear (suffix-array) encoder — the reference's second algorithm,
re-architected for TPU (SURVEY.md §7 step 5).

Pipeline (mirrors src/linear.cpp:72-319 semantically):
  1. S = text · 1 · tok_1 · 1 · … · tok_k · 1  (separator 1, layout at
     src/linear.cpp:87-101);
  2. suffix array of S by prefix doubling (XLA sorts, early exit);
  3. LCP of SA-adjacent suffixes, clamped at max_len (direct compare —
     exact for the sweeps, which never distinguish LCPs above max_len);
  4. who[]: SA ranks of each vocab token's suffix (src/linear.cpp:153-160);
  5. four surviving-slot scans (left/right x prefix/suffix kind) — the
     associative-scan reformulation of the monotone stack
     (src/linear.cpp:161-213), yielding ALL tokens matching each text
     suffix;
  6. window-capped longest-match selection + the shared greedy commit
     (ops/commit.py), identical to the Fast engine's output.

Note on parity: output ids equal the Fast engine (and the reference's
differential guarantee, tests/tests.cpp:90-97) including the probe-window
cap — see ops/linear_match.py for the upstream edge case this fixes.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .core.vocab import Vocabulary
from .ops import commit as commit_ops
from .ops import text_features
from .ops.linear_match import match_from_sa
from .ops.suffix_array import lcp_clamped, suffix_array


class LinearEncoder:
    """Suffix-array WordPiece encoder (host-facing, device-computing)."""

    def __init__(self, vocab: Vocabulary):
        self.vocab = vocab
        self.max_len = max(vocab.max_len, 1)
        # Vocab part of S and token start offsets (within the vocab part).
        lens = vocab.lengths.astype(np.int64)
        self._tok_lens = lens
        parts = []
        starts = np.zeros(vocab.size, dtype=np.int64)
        pos = 0
        for i in range(vocab.size):
            starts[i] = pos
            parts.append(vocab.word(i).astype(np.int32))
            parts.append(np.array([1], dtype=np.int32))
            pos += lens[i] + 1
        self._vocab_tail = (
            np.concatenate(parts) if parts else np.zeros(0, np.int32)
        )
        self._tok_starts = starts
        self._eligible = vocab.active
        self._kind = np.where(
            self._eligible, vocab.is_prefix.astype(np.int32), -1
        )

    # Max |S| per internal SA batch.  The reference also batches its
    # linear algorithm (memory_limit/20 "because of SAIS",
    # src/linear.cpp:349); here the bound keeps the XLA sort size (and
    # its compile time/memory, which scale with n) in check.  Batches
    # split at spaces, so the id stream is exactly the concatenation.
    MAX_S = 1 << 18

    @property
    def MAX_TEXT_BATCH(self) -> int:
        if getattr(self, "_max_text_batch", None) is not None:
            return self._max_text_batch
        return max(1 << 15, self.MAX_S - int(self._vocab_tail.shape[0]) - 64)

    @MAX_TEXT_BATCH.setter
    def MAX_TEXT_BATCH(self, v: int) -> None:
        self._max_text_batch = v

    def encode_bytes(self, data: bytes) -> np.ndarray:
        """Deduped byte path: the unit-independence decomposition (see
        engine_word.py for the proof sketch; it depends only on the
        output semantics, which linear shares with fast byte-for-byte —
        the reference asserts this, tests/tests.cpp:90-97) lets the
        O(n log n) suffix-array pipeline run over the UNIQUE units only.
        Zipf corpora shrink the sort input by 1-2 orders of magnitude;
        the id stream is recovered with the native expand."""
        from .runtime import loader

        if not loader.available():  # pragma: no cover - native always in CI
            from .core import unicode as uni

            return self.encode_codepoints(np.asarray(uni.decode_utf8(data)))
        if len(data) == 0:
            return np.zeros(0, dtype=np.int32)
        occ, ustart, ulen, ucplen = loader.segment_dedupe(data)
        nu = ustart.shape[0]
        if nu == 0:
            return np.zeros(0, dtype=np.int32)

        # Join unique units with single spaces; batch so each joined
        # batch fits MAX_TEXT_BATCH.  Unit u's codepoints occupy
        # [cstart[u], cstart[u] + ucplen[u]) of its batch.
        counts_u = np.zeros(nu, dtype=np.int64)
        offsets = np.zeros(nu + 1, dtype=np.int64)
        flats: list[np.ndarray] = []
        u = 0
        while u < nu:
            # Greedy batch of units.
            total = 0
            v = u
            while v < nu and (total + int(ucplen[v]) + 1 <= self.MAX_TEXT_BATCH or v == u):
                total += int(ucplen[v]) + 1
                v += 1
            joined = b" ".join(
                data[int(ustart[k]) : int(ustart[k]) + int(ulen[k])] for k in range(u, v)
            )
            from .core import unicode as uni

            cps = np.asarray(uni.decode_utf8(joined), dtype=np.int32)
            cstart = np.zeros(v - u + 1, dtype=np.int64)
            np.cumsum(ucplen[u:v].astype(np.int64) + 1, out=cstart[1:])
            ids, positions = self._encode_batch_pos(cps)
            # Attribute each emitted id to its unit (positions ascend).
            unit_of = np.searchsorted(cstart, positions, side="right") - 1
            counts_u[u:v] = np.bincount(unit_of, minlength=v - u)
            flats.append(ids)
            u = v
        np.cumsum(counts_u, out=offsets[1:])
        tok_flat = np.concatenate(flats) if flats else np.zeros(0, np.int32)
        out = loader.expand(occ, tok_flat, offsets)
        return out if out is not None else np.zeros(0, np.int32)

    def _encode_batch_pos(self, cps: np.ndarray):
        """One SA batch returning (ids, positions) as numpy."""
        ids, positions, count = self._encode_batch(cps, with_positions=True)
        count = int(count)
        return np.asarray(ids[:count]), np.asarray(positions[:count])

    def encode_codepoints(self, cps: np.ndarray) -> np.ndarray:
        cps = np.asarray(cps, dtype=np.int32)
        n = int(cps.shape[0])
        if n == 0:
            return np.zeros(0, dtype=np.int32)
        if n > self.MAX_TEXT_BATCH:
            from .core import unicode as uni

            space = np.asarray(uni.is_space(cps.astype(np.uint32)))
            outs = []
            begin = 0
            while begin < n:
                end = min(n, begin + self.MAX_TEXT_BATCH)
                while end < n and not space[end]:
                    end += 1
                outs.append(self._encode_batch(cps[begin:end]))
                begin = end
            return np.concatenate(outs) if outs else np.zeros(0, np.int32)
        return self._encode_batch(cps)

    def _encode_batch(self, cps: np.ndarray, with_positions: bool = False):
        n = int(cps.shape[0])

        # S = text · 1 · vocab_tail  (src/linear.cpp:87-101), padded to a
        # power of two with strictly increasing sentinels above the
        # alphabet: pad suffixes sort among themselves, never share a
        # prefix with anything (distinct values), and push no tokens, so
        # results for text positions are unchanged while compiled shapes
        # are reused across corpus sizes (XLA sort compile time scales
        # with n, so shape bucketing is essential).
        s_core = np.concatenate([cps, np.array([1], dtype=np.int32), self._vocab_tail])
        n_core = s_core.shape[0]
        if n_core > 1_000_000_000:
            raise ValueError("64-bit suffix arrays not supported")
        # Shape buckets {2^k, 3·2^(k-1)}: sort cost scales ~n log n, so the
        # extra half-step bucket saves up to 25% device work vs pure pow2
        # at the price of one more compiled variant (cache persists).
        p2 = max(128, 1 << (n_core - 1).bit_length())
        n_s = 3 * (p2 // 4) if n_core <= 3 * (p2 // 4) else p2
        pad_base = int(max(int(s_core.max()), 0x110000)) + 1
        s_host = np.concatenate(
            [s_core, pad_base + np.arange(n_s - n_core, dtype=np.int32)]
        ).astype(np.int32)

        s_dev = jnp.asarray(s_host)
        sa, rank = suffix_array(s_dev)
        # Clamped LCP suffices: the sweeps compare it only against token
        # lengths <= max_len (see ops/suffix_array.py).
        lcp = lcp_clamped(s_dev, sa, clamp=self.max_len)

        # who arrays indexed by SA rank.
        rank_np = np.asarray(rank)
        who_len = np.zeros(n_s, dtype=np.int32)
        who_id = np.full(n_s, -1, dtype=np.int32)
        who_kind = np.full(n_s, -1, dtype=np.int32)
        tok_pos = (n + 1 + self._tok_starts).astype(np.int64)
        tok_rank = rank_np[tok_pos]
        sel = self._eligible
        who_len[tok_rank[sel]] = self._tok_lens[sel]
        who_id[tok_rank[sel]] = np.arange(self.vocab.size, dtype=np.int32)[sel]
        who_kind[tok_rank[sel]] = self._kind[sel]

        # Text padded to a power of two as well (pad = space: skipped by
        # the walk, emits nothing) so features/match/commit shapes bucket.
        n_text_pad = max(128, 1 << (n - 1).bit_length())
        cps_pad = np.full(n_text_pad, 32, dtype=np.int32)
        cps_pad[:n] = cps
        feats = text_features.compute_features(
            jnp.asarray(cps_pad), jnp.int32(n), self.max_len
        )
        best_id, best_len = match_from_sa(
            rank,
            lcp,
            jnp.asarray(who_len),
            jnp.asarray(who_id),
            jnp.asarray(who_kind),
            n,
            feats.window,
            feats.wp,
            max_len=self.max_len,
        )
        if with_positions:
            return commit_ops.commit_with_positions(
                best_id, best_len, feats, jnp.int32(n), unk_id=int(self.vocab.unk_token_id)
            )
        ids, count = commit_ops.commit(
            best_id, best_len, feats, jnp.int32(n), unk_id=int(self.vocab.unk_token_id)
        )
        count = int(count)
        return np.asarray(ids[:count])
