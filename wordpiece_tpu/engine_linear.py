"""Linear (suffix-array) encoder — the reference's second algorithm,
re-architected for TPU (SURVEY.md §7 step 5).

Pipeline (mirrors src/linear.cpp:72-319 semantically):
  1. S = text · sep · tok_1 · sep · … · tok_k · sep  (layout at
     src/linear.cpp:87-101; here sep sorts below every codepoint, which
     removes the reference's latent sep/codepoint-1 collision);
  2. suffix ORDER of S clamped at max_len: one multi-key sort over the
     first max_len symbols packed into int32 keys (ops/suffix_array.py
     kgram_rank_lcp — replaces both libsais SA-IS and round-1's prefix
     doubling; the sweeps in step 4 only ever observe LCP clamped at
     max_len, so this order is provably sufficient);
  3. LCP of adjacent suffixes, clamped at max_len, read off the sorted
     keys (no gathers);
  4. four surviving-slot scans (left/right x prefix/suffix kind) — the
     associative-scan reformulation of the monotone stack
     (src/linear.cpp:161-213), yielding ALL tokens matching each text
     suffix;
  5. window-capped longest-match selection + the shared greedy commit
     (ops/commit.py), identical to the Fast engine's output.

Steps 2-5 (plus the who-table scatter and text features) compile into ONE
jit program per shape bucket: a batch costs a single host->device dispatch
and a single device->host fetch — critical behind a remote-tunnel device.

Note on parity: output ids equal the Fast engine (and the reference's
differential guarantee, tests/tests.cpp:90-97) including the probe-window
cap — see ops/linear_match.py for the upstream edge case this fixes.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .core.vocab import Vocabulary
from .ops import commit as commit_ops
from .ops import text_features
from .ops.linear_match import match_from_sa
from .ops.suffix_array import kgram_plan, kgram_rank_lcp, lcp_clamped, suffix_array


@partial(
    jax.jit,
    static_argnames=("bits", "per", "nk", "max_len", "unk_id"),
)
def _linear_batch_device(
    s_dense: jax.Array,  # int32[n_s] dense symbols; pad = 2^bits - 1
    cps_pad: jax.Array,  # int32[n_text_pad] raw codepoints, pad 32
    n_text: jax.Array,  # int32 scalar: true text length
    tok_starts: jax.Array,  # int32[V_e] token offsets within the vocab tail
    tok_len: jax.Array,  # int32[V_e]
    tok_id: jax.Array,  # int32[V_e]
    tok_kind: jax.Array,  # int32[V_e]: 1 prefix, 0 suffix
    *,
    bits: int,
    per: int,
    nk: int,
    max_len: int,
    unk_id: int,
):
    """The whole linear batch as one device program: clamped suffix sort +
    LCP + who-table scatter + 4 sweeps + match + greedy commit."""
    n_s = s_dense.shape[0]
    _sa, rank, lcp = kgram_rank_lcp(s_dense, bits=bits, per=per, nk=nk, clamp=max_len)

    # who arrays indexed by SA rank (src/linear.cpp:153-160), built by
    # device scatter — ranks are a permutation, so no collisions.
    tok_rank = rank[jnp.minimum(n_text + 1 + tok_starts, jnp.int32(n_s - 1))]
    who_len = jnp.zeros(n_s, jnp.int32).at[tok_rank].set(tok_len)
    who_id = jnp.full(n_s, -1, jnp.int32).at[tok_rank].set(tok_id)
    who_kind = jnp.full(n_s, -1, jnp.int32).at[tok_rank].set(tok_kind)

    feats = text_features.compute_features(cps_pad, n_text, max_len)
    best_id, best_len = match_from_sa(
        rank,
        lcp,
        who_len,
        who_id,
        who_kind,
        n_text,
        feats.window,
        feats.wp,
        max_len=max_len,
    )
    return commit_ops.commit_with_positions(
        best_id, best_len, feats, n_text, unk_id=unk_id
    )


def _bucket(n: int, floor: int = 128) -> int:
    """Shape buckets {2^k, 3·2^(k-1)}: device cost scales with n, so the
    extra half-step bucket saves up to 25% work vs pure pow2 at the price
    of one more compiled variant (cache persists)."""
    p2 = max(floor, 1 << (n - 1).bit_length())
    return 3 * (p2 // 4) if n <= 3 * (p2 // 4) else p2


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
            parts.append(np.array([-1], dtype=np.int32))  # separator (remapped)
            pos += lens[i] + 1
        self._vocab_tail = (
            np.concatenate(parts) if parts else np.zeros(0, np.int32)
        )
        self._tok_starts = starts
        self._eligible = vocab.active
        self._kind = np.where(
            self._eligible, vocab.is_prefix.astype(np.int32), -1
        )
        # Device-resident eligible-token tables for the fused batch.
        sel = np.asarray(self._eligible, dtype=bool)
        self._d_tok_starts = jnp.asarray(starts[sel].astype(np.int32))
        self._d_tok_len = jnp.asarray(lens[sel].astype(np.int32))
        self._d_tok_id = jnp.asarray(np.arange(vocab.size, dtype=np.int32)[sel])
        self._d_tok_kind = jnp.asarray(self._kind[sel].astype(np.int32))
        # Sorted distinct symbols of the vocab tail (text symbols union in
        # per batch); separator -1 sorts below every codepoint and is
        # always present (even for an empty vocab: S ends with one sep).
        self._vocab_alpha = np.union1d(
            self._vocab_tail, np.array([-1], dtype=np.int32)
        ).astype(np.int32)
        self.stats = None  # optional utils.profiling.StageStats
        self._executor = None  # lazy 1-thread pool for pipelined prepares

    def _stage(self, name, nbytes=0):
        import contextlib

        st = self.stats
        return st.stage(name, nbytes) if st is not None else contextlib.nullcontext()

    # Max |S| per internal SA batch.  The reference also batches its
    # linear algorithm (memory_limit/20 "because of SAIS",
    # src/linear.cpp:349); here the bound keeps the XLA sort size (and
    # its compile time/memory, which scale with n) in check.  Batches
    # split at spaces, so the id stream is exactly the concatenation.
    MAX_S = 1 << 20

    # The surviving-slot sweeps materialize [n_s, max_len] state, so a
    # vocabulary with very long tokens (the reference's 10M-char stress
    # splits produce multi-thousand-char tokens, tests/tests.cpp:264-272)
    # would blow device memory.  Such vocabs route to the native scalar
    # encoder over deduped units — identical output semantics, host path
    # (mirrors the Fast engine's overflow-unit fallback).
    MAX_SLOT_LEN = 96

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
        with self._stage("host_segment_dedupe", len(data)):
            occ, ustart, ulen, ucplen = loader.segment_dedupe(data)
        nu = ustart.shape[0]
        if nu == 0:
            return np.zeros(0, dtype=np.int32)
        if self.max_len > self.MAX_SLOT_LEN:
            return self._encode_units_scalar(data, occ, ustart, ulen, ucplen)

        # Join unique units with single spaces (natively, one pass);
        # batch so each joined batch fits MAX_TEXT_BATCH.  Unit u+k of a
        # batch occupies [csum[u+k]-csum[u], ...+ucplen[u+k]).  Batch
        # bounds come from one searchsorted over the cplen prefix sums.
        csum = np.zeros(nu + 1, dtype=np.int64)
        np.cumsum(ucplen.astype(np.int64) + 1, out=csum[1:])
        bounds = [0]
        u = 0
        while u < nu:
            v = int(
                np.searchsorted(csum, csum[u] + self.MAX_TEXT_BATCH, side="right")
            ) - 1
            v = min(max(v, u + 1), nu)
            bounds.append(v)
            u = v

        # Pipeline: a worker thread joins + dense-remaps + dispatches
        # batch k+1 while the main thread fetches batch k (jax dispatch
        # is async; ctypes releases the GIL) — the same windowed overlap
        # as the word engine's chunk pipeline (engine_word.encode_bytes).
        counts_u = np.zeros(nu, dtype=np.int64)
        offsets = np.zeros(nu + 1, dtype=np.int64)
        flats: list[np.ndarray] = []

        def finish(state) -> None:
            u, v, handle = state
            with self._stage("device_fetch"):
                ids, positions = self._fetch_batch(handle)
            # Attribute each emitted id to its unit (positions ascend).
            cstart = csum[u : v + 1] - csum[u]
            unit_of = np.searchsorted(cstart, positions, side="right") - 1
            counts_u[u:v] = np.bincount(unit_of, minlength=v - u)
            flats.append(ids)

        if self._executor is None:
            from concurrent.futures import ThreadPoolExecutor

            self._executor = ThreadPoolExecutor(max_workers=1)
        from collections import deque

        window: deque = deque()
        try:
            for u, v in zip(bounds[:-1], bounds[1:]):
                window.append(
                    self._executor.submit(
                        self._prepare_batch, data, ustart, ulen, csum, u, v
                    )
                )
                if len(window) >= self.PIPELINE_WINDOW:
                    finish(window.popleft().result())
            while window:
                finish(window.popleft().result())
        finally:
            for f in window:
                try:
                    f.result()
                except Exception:
                    pass
        np.cumsum(counts_u, out=offsets[1:])
        tok_flat = np.concatenate(flats) if flats else np.zeros(0, np.int32)
        with self._stage("host_expand"):
            out = loader.expand(occ, tok_flat, offsets)
        return out if out is not None else np.zeros(0, np.int32)

    PIPELINE_WINDOW = 3  # max batches in flight (bounds host + HBM use)

    def _prepare_batch(self, data, ustart, ulen, csum, u: int, v: int):
        """Host join + device dispatch for units [u, v) (worker thread)."""
        from .runtime import loader

        cap = int(csum[v] - csum[u] - 1)
        with self._stage("host_join"):
            cps = loader.join_units_cps(data, ustart, ulen, u, v, cap)
        with self._stage("device_dispatch"):
            handle = self._dispatch_batch(cps)
        return (u, v, handle)

    def _dispatch_batch(self, cps: np.ndarray):
        """Async device dispatch of one batch; pair with _fetch_batch."""
        out = self._encode_batch(cps, with_positions=True)
        if isinstance(out, tuple) and len(out) == 3:
            ids, positions, count = out
            try:
                count.copy_to_host_async()
            except AttributeError:  # pragma: no cover - numpy fallback
                pass
            return (ids, positions, count)
        return out  # pragma: no cover - defensive

    def _fetch_batch(self, handle):
        ids, positions, count = handle
        count = int(count)
        return (
            np.asarray(ids[:count]),
            np.asarray(positions[:count]),
        )

    def _encode_units_scalar(self, data, occ, ustart, ulen, ucplen) -> np.ndarray:
        """Long-token vocab fallback: native scalar encode of each unique
        unit, expanded to the occurrence stream (see MAX_SLOT_LEN)."""
        from .runtime import loader

        if not hasattr(self, "_scalar"):
            self._scalar = loader.VocabHandle(self.vocab)
        flat, counts = self._scalar.encode_units(
            data, ustart, ulen, int(ucplen.sum())
        )
        offsets = np.zeros(counts.shape[0] + 1, dtype=np.int64)
        np.cumsum(counts.astype(np.int64), out=offsets[1:])
        out = loader.expand(occ, flat, offsets)
        return out if out is not None else np.zeros(0, np.int32)

    def encode_codepoints(self, cps: np.ndarray) -> np.ndarray:
        cps = np.asarray(cps, dtype=np.int32)
        n = int(cps.shape[0])
        if n == 0:
            return np.zeros(0, dtype=np.int32)
        if self.max_len > self.MAX_SLOT_LEN:
            from .runtime import loader

            if loader.available():
                from .core import unicode as uni

                return self.encode_bytes(
                    bytes(uni.encode_utf8(cps.astype(np.uint32)))
                )
            # Without the native runtime, small inputs still work through
            # the device path (tests); big ones are better off failing
            # loudly than silently allocating n_s * max_len slots.
            if n * self.max_len > 1 << 26:
                raise ValueError(
                    "vocabulary max token length "
                    f"{self.max_len} needs the native runtime for inputs "
                    "this large (surviving-slot state would exceed memory)"
                )
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

        # S = text · sep · vocab_tail  (src/linear.cpp:87-101), densely
        # remapped to [0, sigma) so max_len symbols pack into a few int32
        # sort keys; pad = 2^bits - 1 (> every dense symbol: pad suffixes
        # sort last, push no tokens, and the commit phase never visits
        # them).  Shapes bucket so compiled programs are reused across
        # corpus sizes.
        s_core = np.concatenate(
            [cps, np.array([-1], dtype=np.int32), self._vocab_tail]
        )
        n_core = s_core.shape[0]
        if n_core > 1_000_000_000:
            raise ValueError("64-bit suffix arrays not supported")
        # Dense alphabet: vocab symbols are pre-sorted; union with the
        # batch's text symbols.
        alpha = np.union1d(np.unique(cps), self._vocab_alpha)
        plan = kgram_plan(int(alpha.shape[0]), self.max_len)
        if plan is None:  # pragma: no cover - huge alphabet x huge token
            return self._encode_batch_doubling(cps, with_positions)
        bits, per, nk = plan
        s_dense = np.searchsorted(alpha, s_core).astype(np.int32)
        n_s = _bucket(n_core)
        pad_sym = (1 << bits) - 1
        s_host = np.full(n_s, pad_sym, dtype=np.int32)
        s_host[:n_core] = s_dense

        # Text padded as well (pad = space: skipped by the walk, emits
        # nothing) so features/match/commit shapes bucket.
        n_text_pad = _bucket(n)
        cps_pad = np.full(n_text_pad, 32, dtype=np.int32)
        cps_pad[:n] = cps

        ids, positions, count = _linear_batch_device(
            jnp.asarray(s_host),
            jnp.asarray(cps_pad),
            jnp.int32(n),
            self._d_tok_starts,
            self._d_tok_len,
            self._d_tok_id,
            self._d_tok_kind,
            bits=bits,
            per=per,
            nk=nk,
            max_len=self.max_len,
            unk_id=int(self.vocab.unk_token_id),
        )
        if with_positions:
            return ids, positions, count
        count = int(count)
        return np.asarray(ids[:count])

    def _encode_batch_doubling(self, cps: np.ndarray, with_positions: bool = False):
        """Fallback batch using the prefix-doubling SA (kept for alphabets
        x token lengths where the packed k-gram keys would degenerate)."""
        n = int(cps.shape[0])
        s_core = np.concatenate(
            [cps, np.array([-1], dtype=np.int32), self._vocab_tail]
        )
        n_core = s_core.shape[0]
        n_s = _bucket(n_core)
        pad_base = int(max(int(s_core.max()), 0x110000)) + 1
        s_host = np.concatenate(
            [s_core, pad_base + np.arange(n_s - n_core, dtype=np.int32)]
        ).astype(np.int32)

        s_dev = jnp.asarray(s_host)
        sa, rank = suffix_array(s_dev)
        lcp = lcp_clamped(s_dev, sa, clamp=self.max_len)

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

        n_text_pad = _bucket(n)
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
