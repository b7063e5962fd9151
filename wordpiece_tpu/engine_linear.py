"""Linear (suffix-array) encoder — the reference's second algorithm,
re-architected for TPU (SURVEY.md §7 step 5).

The reference builds S = text · sep · tok_1 · sep · … · tok_k · sep and
suffix-sorts ALL of it (src/linear.cpp:87-101), even though only the k
token START positions ever enter its who-tables (src/linear.cpp:153-160)
— the tokens' non-start suffixes are dead weight in the sort and the
sweeps (~6x the token count for a bert-shaped vocab).  The TPU design
drops them: each vocab token is ONE sort element whose key is its own
symbols, precomputed per vocabulary.

Pipeline per batch (one fused jit program — a single host->device
dispatch and device->host fetch, critical behind a remote-tunnel device):
  1. text suffixes' first-max_len symbols packed into nk int32 keys
     (dense per-VOCAB alphabet; text symbols foreign to the vocabulary
     collapse into one FOREIGN code — see correctness note below);
  2. text keys ++ precomputed token keys sorted together (nk stable
     radix passes over nx + V elements — vs nx + 6V + pad upstream);
  3. LCP of adjacent elements, clamped at max_len, read off the keys;
  4. who-tables by GATHER from the sorted element ids (the token id
     space is contiguous — no scatter);
  5. four surviving-slot scans (left/right x prefix/suffix kind) — the
     closed-form reformulation of the monotone stack
     (src/linear.cpp:161-213), yielding ALL tokens matching each text
     suffix;
  6. window-capped longest-match selection + the shared greedy commit
     (ops/commit.py), identical to the Fast engine's output.

Correctness of the two non-reference liberties, both resting on the
ultrametric property of clamped LCP (lcp(a,c) = min over the adjacent
lcps between a and c in ANY lexicographically consistent order):
 - dropping non-start token suffixes removes elements from the sorted
   order; adjacent-min telescoping over the remaining elements still
   yields the exact pairwise clamped LCPs between survivors;
 - collapsing foreign text symbols to one code can inflate LCP only
   between two TEXT suffixes (tokens contain no foreign symbol, so
   token<->suffix comparisons mismatch exactly where the true symbols
   do); the sweeps observe token<->suffix LCPs as path minima, which the
   ultrametric pins to the exact pairwise value regardless of inflated
   text<->text edges in between.

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
from .ops.suffix_array import lcp_clamped, suffix_array


def _linear_batch_core(
    x_dense: jax.Array,  # int[np_] dense text symbols; pad = 2^bits - 1
    cps_pad: jax.Array,  # int[np_] raw codepoints, pad 32
    n_text: jax.Array,  # int32 scalar: true text length
    tok_keys: jax.Array,  # int32[nk, V_pad] precomputed token sort keys
    tok_len: jax.Array,  # int32[V_pad] (0 on pad rows)
    tok_id: jax.Array,  # int32[V_pad] (-1 on pad rows)
    tok_kind: jax.Array,  # int32[V_pad]: 1 prefix, 0 suffix, -1 pad
    *,
    bits: int,
    per: int,
    nk: int,
    max_len: int,
    unk_id: int,
):
    """The whole linear batch as one device program: packed text keys ++
    token keys -> nk stable radix passes -> key-local clamped LCP ->
    who-tables by gather -> 4 sweeps -> match -> greedy commit.

    Element ids: 0..np_-1 are text suffixes (id == text position),
    np_..np_+V_pad-1 are vocab tokens.  Ties between a token and an
    identical text suffix order text-first (stable sort by element id);
    either order is sound — the left/right sweep union covers both.

    x_dense/cps_pad may arrive narrowed (uint16) — the tunnel's ~25 MB/s
    makes H2D bytes a critical-path item; widen on device.
    """
    x_dense = x_dense.astype(jnp.int32)
    cps_pad = cps_pad.astype(jnp.int32)
    np_ = x_dense.shape[0]
    nv = tok_len.shape[0]
    nm = np_ + nv
    pad_sym = jnp.int32((1 << bits) - 1)

    # Text suffix keys: symbol t of key j is bits-wide at shift
    # bits*(per-1-t); reads past the end see pad_sym.
    x_ext = jnp.concatenate([x_dense, jnp.full((nk * per,), pad_sym, x_dense.dtype)])
    keys = []
    for j in range(nk):
        k = jnp.zeros(np_, jnp.int32)
        for t in range(per):
            off = j * per + t
            k = (k << bits) | x_ext[off : off + np_]
        keys.append(jnp.concatenate([k, tok_keys[j]]))
    keys = jnp.stack(keys)  # [nk, nm]

    idx = jnp.arange(nm, dtype=jnp.int32)

    def body(j, perm):
        d = keys[nk - 1 - j][perm]
        _, perm = jax.lax.sort((d, perm), num_keys=1, is_stable=True)
        return perm

    # LSD radix: nk iterations of ONE compiled 2-operand stable sort
    # (XLA:TPU sort compile time grows steeply with operand count).
    sa = jax.lax.fori_loop(0, nk, body, idx)
    rank = jnp.zeros(nm, jnp.int32).at[sa].set(idx)

    # Clamped LCP between sorted neighbours, read off the keys.
    mask = jnp.int32((1 << bits) - 1)
    alive = jnp.ones(nm, dtype=bool)
    lcp = jnp.zeros(nm, jnp.int32)
    counted = 0
    for j in range(nk):
        if counted >= max_len:
            break
        kj = keys[j][sa]
        nxt = jnp.concatenate([kj[1:], kj[-1:]])
        for t in range(per):
            if counted >= max_len:
                break
            shift = bits * (per - 1 - t)
            eq = ((kj >> shift) & mask) == ((nxt >> shift) & mask)
            alive = alive & eq
            lcp = lcp + alive
            counted += 1
    lcp = jnp.where(idx < nm - 1, lcp, 0)

    # who arrays by GATHER: sorted element sa[r] >= np_ is token sa[r]-np_.
    is_tok = sa >= np_
    tj = jnp.clip(sa - np_, 0, nv - 1)
    who_len = jnp.where(is_tok, tok_len[tj], 0)
    who_id = jnp.where(is_tok, tok_id[tj], -1)
    who_kind = jnp.where(is_tok, tok_kind[tj], -1)

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


@partial(jax.jit, static_argnames=("bits", "per", "nk", "max_len", "unk_id"))
def _linear_batch_device(*args, **kwargs):
    """Full-output variant: (ids[np_], positions[np_], count)."""
    return _linear_batch_core(*args, **kwargs)


@partial(
    jax.jit, static_argnames=("bits", "per", "nk", "max_len", "unk_id", "cap")
)
def _linear_batch_compact(*args, cap: int, **kwargs):
    """Compact-output variant: ONE int32[1 + 2*cap] array — [count,
    ids[:cap], positions[:cap]] — so a batch costs ONE D2H transfer
    instead of three sequential tunnel round trips (count scalar, ids,
    positions).  count > cap (capacity overflow) is detected on host and
    re-fetched via the full variant (the word engine's proven pattern,
    engine_word._fetch_buckets)."""
    ids, positions, count = _linear_batch_core(*args, **kwargs)
    return jnp.concatenate(
        [jnp.reshape(count, (1,)).astype(jnp.int32), ids[:cap], positions[:cap]]
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
        self._merge = self._build_merge_tables()
        self.stats = None  # optional utils.profiling.StageStats
        self._executor = None  # lazy 1-thread pool for pipelined prepares

    def _build_merge_tables(self):
        """Per-vocabulary constants of the fused batch program: the dense
        alphabet LUT and the packed per-token sort keys.

        Dense codes: 0 = token pad (sorts below every symbol, playing the
        reference's separator role, src/linear.cpp:87-101), 1..sigma =
        the distinct symbols of eligible tokens, sigma+1 = FOREIGN (every
        text symbol outside the vocab alphabet — sound per the module
        docstring), 2^bits - 1 = text pad (sorts above everything).
        Returns None when the key count would degenerate (huge alphabet x
        huge max token length) — callers fall back to prefix doubling."""
        vocab = self.vocab
        sel = np.asarray(self._eligible, dtype=bool)
        tok_ids = np.arange(vocab.size, dtype=np.int32)[sel]
        max_len = self.max_len
        syms = (
            np.unique(np.concatenate([vocab.word(int(i)) for i in tok_ids]))
            if tok_ids.size
            else np.zeros(0, np.uint32)
        ).astype(np.int64)
        sigma = int(syms.shape[0])
        foreign = sigma + 1
        bits = max(1, int(sigma + 2).bit_length())  # pad_sym > foreign
        per = max(1, min(30 // bits, max_len))
        nk = -(-max_len // per)
        if nk > 24:
            return None
        lut = np.full(0x110001, foreign, dtype=np.int32)
        lut[syms] = 1 + np.arange(sigma, dtype=np.int32)
        nv = int(tok_ids.size)
        nv_pad = max(128, -(-nv // 128) * 128)
        symmat = np.zeros((nv_pad, max_len), dtype=np.int32)  # 0 = token pad
        for r, i in enumerate(tok_ids):
            w = vocab.word(int(i))
            symmat[r, : w.shape[0]] = lut[w.astype(np.int64)]
        keys = np.zeros((nk, nv_pad), dtype=np.int32)
        for j in range(nk):
            k = np.zeros(nv_pad, dtype=np.int32)
            for t in range(per):
                sym = (
                    symmat[:, j * per + t]
                    if j * per + t < max_len
                    else np.zeros(nv_pad, np.int32)
                )
                k = (k << bits) | sym
            keys[j] = k
        # Pad token rows: every key all-pad (sorts last, pushes nothing).
        pad_key = np.int32((1 << min(bits * per, 31)) - 1)
        keys[:, nv:] = pad_key
        t_len = np.zeros(nv_pad, dtype=np.int32)
        t_len[:nv] = self._tok_lens[sel].astype(np.int32)
        t_id = np.full(nv_pad, -1, dtype=np.int32)
        t_id[:nv] = tok_ids
        t_kind = np.full(nv_pad, -1, dtype=np.int32)
        t_kind[:nv] = self._kind[sel].astype(np.int32)
        return {
            "lut": lut,
            "bits": bits,
            "per": per,
            "nk": nk,
            "nv_pad": nv_pad,
            "tok_keys": jnp.asarray(keys),
            "tok_len": jnp.asarray(t_len),
            "tok_id": jnp.asarray(t_id),
            "tok_kind": jnp.asarray(t_kind),
        }

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
        if self._merge is not None:
            # Sorted elements per batch = text positions + one per token.
            return max(1 << 15, self.MAX_S - int(self._merge["nv_pad"]))
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
        the id stream is recovered with the native expand.

        The corpus segments in LINEAR_SEG_CHUNK pieces on a worker
        thread (a cross-chunk DedupeSession keeps occurrence ids global)
        while the main thread assembles each chunk's first-seen units
        into device batches and fetches completed ones — segmentation,
        H2D, device compute, and D2H all overlap, the same windowed
        pipeline as the word engine's (engine_word.encode_bytes)."""
        from .runtime import loader

        if not loader.available():  # pragma: no cover - native always in CI
            from .core import unicode as uni

            return self.encode_codepoints(np.asarray(uni.decode_utf8(data)))
        if len(data) == 0:
            return np.zeros(0, dtype=np.int32)
        if self.max_len > self.MAX_SLOT_LEN:
            with self._stage("host_segment_dedupe", len(data)):
                occ, ustart, ulen, ucplen = loader.segment_dedupe(data)
            if ustart.shape[0] == 0:
                return np.zeros(0, dtype=np.int32)
            return self._encode_units_scalar(data, occ, ustart, ulen, ucplen)

        from collections import deque

        from .core.unicode import find_space_cut

        n = len(data)
        chunks = []
        begin = 0
        while begin < n:
            end = min(n, begin + self.LINEAR_SEG_CHUNK)
            if end < n:
                cut = find_space_cut(data, end)
                end = cut if cut >= 0 else n
            chunks.append(data[begin:end])
            begin = end

        if self._executor is None:
            from concurrent.futures import ThreadPoolExecutor

            self._executor = ThreadPoolExecutor(max_workers=1)

        session = loader.DedupeSession()
        occ_parts: list[np.ndarray] = []
        # Pending first-seen units, per segmented piece:
        # [chunk_bytes, nstart, nlen, ncplen, csum(cplen+1), used_ptr].
        pieces: list[list] = []
        pend_cps = 0  # total (cplen + 1) of unconsumed units
        batch_counts: list[np.ndarray] = []  # uid-consecutive batch order
        flats: list[np.ndarray] = []
        window: deque = deque()  # (handle, cstart int64[batch_units + 1])

        # Device batches target LINEAR_BATCH_TARGET codepoints, well below
        # the MAX_TEXT_BATCH capacity cap: 2-4 smaller batches in flight
        # pipeline H2D, device compute and D2H across each other (and
        # start overlapping segmentation earlier), which measured 64 ->
        # 85-87 MB/s on the 10 MB en corpus vs one full-size batch.  The
        # cost — re-sorting the ~29k token keys per batch — is covered
        # several times over by the overlap.
        target = min(self.LINEAR_BATCH_TARGET, self.MAX_TEXT_BATCH)

        def dispatch_one() -> None:
            """Assemble <= target codepoints of pending units (earliest
            uids first — across pieces) into one device batch."""
            nonlocal pend_cps
            budget = target
            parts: list[np.ndarray] = []
            ucls: list[np.ndarray] = []
            got = 0
            for p in pieces:
                pb, ns, nl, ncl, cs, used = p
                nu_p = ns.shape[0]
                if used >= nu_p or got >= budget:
                    continue
                u1 = int(
                    np.searchsorted(cs, cs[used] + (budget - got), side="right")
                ) - 1
                u1 = min(max(u1, used + 1), nu_p)
                cap = int(cs[u1] - cs[used] - 1)
                with self._stage("host_join"):
                    parts.append(
                        loader.join_units_cps(pb, ns, nl, used, u1, cap)
                    )
                ucls.append(ncl[used:u1].astype(np.int64))
                got += int(cs[u1] - cs[used])
                p[5] = u1
                if got >= budget:
                    break
            pend_cps -= got
            if not parts:
                return
            if len(parts) == 1:
                cps = parts[0]
            else:  # single space between pieces (units never touch)
                sep = np.full(1, 32, dtype=parts[0].dtype)
                joined: list[np.ndarray] = []
                for i, part in enumerate(parts):
                    if i:
                        joined.append(sep)
                    joined.append(part)
                cps = np.concatenate(joined)
            ucl_b = np.concatenate(ucls)
            cstart = np.zeros(ucl_b.shape[0] + 1, dtype=np.int64)
            np.cumsum(ucl_b + 1, out=cstart[1:])
            with self._stage("device_dispatch"):
                handle = self._dispatch_batch(cps)
            window.append((handle, cstart))
            if len(window) > self.PIPELINE_WINDOW:
                finish_one()

        def finish_one() -> None:
            handle, cstart = window.popleft()
            with self._stage("device_fetch"):
                ids, positions = self._fetch_batch(handle)
            # Attribute each emitted id to its unit (positions ascend).
            unit_of = np.searchsorted(cstart[:-1], positions, side="right") - 1
            batch_counts.append(
                np.bincount(unit_of, minlength=cstart.shape[0] - 1).astype(
                    np.int64
                )
            )
            flats.append(np.asarray(ids, dtype=np.int32))

        def seg_chunk(chunk: bytes):
            with self._stage("host_segment_dedupe", len(chunk)):
                return session.segment(chunk)

        try:
            seg_futs = [self._executor.submit(seg_chunk, c) for c in chunks]
            for fut, chunk in zip(seg_futs, chunks):
                occ_k, ns, nl, ncl = fut.result()
                if occ_k.shape[0]:
                    occ_parts.append(occ_k)
                if ns.shape[0]:
                    cs = np.zeros(ns.shape[0] + 1, dtype=np.int64)
                    np.cumsum(ncl.astype(np.int64) + 1, out=cs[1:])
                    pieces.append([chunk, ns, nl, ncl, cs, 0])
                    pend_cps += int(cs[-1])
                while pend_cps >= target:
                    dispatch_one()
            while pend_cps > 0:
                dispatch_one()
            while window:
                finish_one()
        finally:
            session.close()

        if not occ_parts:
            return np.zeros(0, dtype=np.int32)
        occ = (
            occ_parts[0] if len(occ_parts) == 1 else np.concatenate(occ_parts)
        )
        counts_u = (
            np.concatenate(batch_counts) if batch_counts else np.zeros(0, np.int64)
        )
        offsets = np.zeros(counts_u.shape[0] + 1, dtype=np.int64)
        np.cumsum(counts_u, out=offsets[1:])
        tok_flat = np.concatenate(flats) if flats else np.zeros(0, np.int32)
        with self._stage("host_expand"):
            out = loader.expand(occ, tok_flat, offsets)
        return out if out is not None else np.zeros(0, np.int32)

    PIPELINE_WINDOW = 3  # max batches in flight (bounds host + HBM use)
    LINEAR_SEG_CHUNK = 3_000_000  # segmentation piece size (bytes)
    LINEAR_BATCH_TARGET = 65536  # cps per device batch (see encode_bytes)

    # Compact-output capacity as a fraction of batch codepoints.  Emitted
    # ids never exceed the batch's codepoint count (every id consumes at
    # least one codepoint; a rolled-back word emits ONE UNK), so the cap
    # never needs to exceed n.  The ratio adapts upward per encoder when
    # a corpus emits denser id streams (CJK singles), trading a few extra
    # D2H bytes for avoiding the double-execution overflow path.  The
    # initial value sits just above en/ru unique-batch density (~0.26);
    # denser corpora overflow once on their first batch and adapt.
    _cap_ratio = 0.32

    def _out_cap(self, n: int) -> int:
        want = int(n * self._cap_ratio) + 4096
        return min(_bucket(max(8192, want)), _bucket(n))

    def _dispatch_batch(self, cps: np.ndarray):
        """Async device dispatch of one batch; pair with _fetch_batch."""
        handle = self._encode_batch(cps, as_handle=True)
        if handle[0] == "compact":
            try:
                handle[1].copy_to_host_async()
            except AttributeError:  # pragma: no cover - numpy fallback
                pass
        return handle

    def _fetch_batch(self, handle):
        """-> (ids np.int32[count], positions np.int32[count])."""
        tag = handle[0]
        if tag == "full":  # doubling fallback: device triple
            _, ids, positions, count = handle
            count = int(count)
            return (np.asarray(ids)[:count], np.asarray(positions)[:count])
        _, fused, cap, (x_host, cps_host, n) = handle
        f = np.asarray(fused)  # ONE D2H transfer
        count = int(f[0])
        # Adapt the cap ratio toward the observed density (+15% headroom).
        if n:
            ratio = min(1.0, count / n * 1.15)
            if ratio > self._cap_ratio:
                self._cap_ratio = ratio
        if count <= cap:
            return (f[1 : 1 + count], f[1 + cap : 1 + cap + count])
        # Capacity overflow (id stream denser than cap): re-run the full
        # program and fetch everything (rare; ratio has adapted).
        m = self._merge
        ids, positions, _cnt = _linear_batch_device(
            jnp.asarray(x_host),
            jnp.asarray(cps_host),
            jnp.int32(n),
            m["tok_keys"],
            m["tok_len"],
            m["tok_id"],
            m["tok_kind"],
            bits=m["bits"],
            per=m["per"],
            nk=m["nk"],
            max_len=self.max_len,
            unk_id=int(self.vocab.unk_token_id),
        )
        return (np.asarray(ids)[:count], np.asarray(positions)[:count])

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

    def _encode_batch(self, cps: np.ndarray, as_handle: bool = False):
        """One text batch.  as_handle=True returns an async handle for
        _fetch_batch (the pipelined path); otherwise returns the batch's
        ids as a host array."""
        n = int(cps.shape[0])
        m = self._merge
        if m is None:  # pragma: no cover - huge alphabet x huge token
            out = self._encode_batch_doubling(cps, with_positions=as_handle)
            if as_handle:
                return ("full",) + tuple(out)
            return out

        # Dense text symbols via the per-vocab LUT (one gather on host —
        # no per-batch alphabet union/searchsorted); pad = 2^bits - 1
        # (sorts last, pushes no tokens, the commit never visits it).
        # Raw codepoints pad as spaces (skipped by the walk).  One shared
        # pad length buckets both arrays so programs are reused across
        # corpus sizes.  Both ship uint16 when values fit (pad included)
        # — H2D bytes over the tunnel halve; the device widens.
        np_ = _bucket(n)
        pad_sym = (1 << m["bits"]) - 1
        xdt = np.uint16 if pad_sym <= 0xFFFF else np.int32
        x_dense = np.full(np_, pad_sym, dtype=xdt)
        x_dense[:n] = m["lut"][np.clip(cps, 0, 0x110000)]
        cdt = np.uint16 if (n == 0 or int(cps.max()) <= 0xFFFF) else np.int32
        cps_pad = np.full(np_, 32, dtype=cdt)
        cps_pad[:n] = cps
        cap = self._out_cap(n)

        fused = _linear_batch_compact(
            jnp.asarray(x_dense),
            jnp.asarray(cps_pad),
            jnp.int32(n),
            m["tok_keys"],
            m["tok_len"],
            m["tok_id"],
            m["tok_kind"],
            bits=m["bits"],
            per=m["per"],
            nk=m["nk"],
            max_len=self.max_len,
            unk_id=int(self.vocab.unk_token_id),
            cap=cap,
        )
        handle = ("compact", fused, cap, (x_dense, cps_pad, n))
        if as_handle:
            return handle
        ids, _positions = self._fetch_batch(handle)
        return np.asarray(ids)

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
