"""Word-centric Fast encoder: dedupe units on host, tokenize on device.

Why units are independent (semantics proven against the reference worker
loop, src/fast.cpp:43-99):
 - no match can cross a spacing char: the probe window at i stops at the
   first spacing char after i (src/fast.cpp:54-60);
 - punctuation probes a window of 1, so a cut after punctuation is safe;
 - a CJK char's window extends into the following non-spacing run, so a
   CJK char is glued to that run (and only cut before it is safe);
 - the walk enters a later unit only at that unit's first position, which
   is always a word-prefix position (text start, a spacing char itself,
   or preceded by one);
 - the UNK rollback never crosses a word-prefix position.

Hence tokenization is a pure function of unit content, units can be
deduped (Zipf: typically 5-20x fewer unique units than occurrences), and
the per-occurrence id stream is the concatenation of per-unit streams.

Pipeline:
 host C++ : segment + dedupe + pack unique units into width buckets
 device   : word_match_commit per bucket (row-local vector ops only)
 host C++ : expand unique token lists back to the occurrence stream
 fallback : units longer than the widest bucket (rare) use the native
            scalar encoder — identical semantics, host-verified in tests.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .core.length_tables import LengthTables, build_length_tables
from .core.vocab import Vocabulary
from .ops.word_kernel import word_match_commit
from .runtime import loader

# Group strides (lanes per unit; must divide 128).  A unit of width
# W = stride - 1 codepoints occupies its group's first W lanes; the last
# lane is the sentinel column.  Finer buckets mean short units skip the
# candidate rows of long token lengths entirely.
STRIDES = (8, 16, 32, 128)
WIDTHS = tuple(s - 1 for s in STRIDES)
BLOCK_ROWS = 256


def _round_rows(n: int, multiple: int = BLOCK_ROWS) -> int:
    n = max(multiple, ((n + multiple - 1) // multiple) * multiple)
    # Round to a power of two to bound the number of compiled variants.
    return 1 << (n - 1).bit_length()


def pack_groups(mat: np.ndarray, stride: int, max_len: int) -> np.ndarray:
    """(U, W) unit matrix -> (rows, 128 + max_len) group-packed, pad 32."""
    u, w = mat.shape
    assert w == stride - 1
    n_groups = 128 // stride
    rows = _round_rows(-(-u // n_groups))
    units = np.full((rows * n_groups, stride), 32, dtype=np.int32)
    units[:u, :w] = mat
    packed = units.reshape(rows, 128)
    out = np.full((rows, 128 + max_len), 32, dtype=np.int32)
    out[:, :128] = packed
    return out


def unpack_emit(emit: np.ndarray, stride: int, n_units: int) -> np.ndarray:
    """(rows, 128) kernel output -> (n_units, stride - 1) emissions."""
    rows = emit.shape[0]
    n_groups = 128 // stride
    units = emit.reshape(rows * n_groups, stride)
    return units[:n_units, : stride - 1]


class WordEncoder:
    """Deduped unit encoder (the production fast path)."""

    def __init__(
        self,
        vocab: Vocabulary,
        tables: LengthTables | None = None,
        *,
        verify: bool = True,
    ):
        """verify=True (default) cross-checks every emitted token's string
        against the vocabulary on host (cheap: only unique units) and
        re-encodes any mismatching unit with the native scalar oracle.
        This catches any hash collision that surfaces as an emitted
        token; the residual risk (a collision at a never-emitted position
        perturbing only UNK placement) stays at ~2^-64 per probe."""
        if not loader.available():
            raise RuntimeError("word engine requires the native host runtime")
        self.vocab = vocab
        self.verify = verify
        self._padded_vocab = None  # lazy (packed strings for verification)
        self.tables = tables if tables is not None else build_length_tables(vocab)
        self._tab_k1 = jnp.asarray(self.tables.k1)
        self._tab_k2 = jnp.asarray(self.tables.k2)
        self._tab_id = jnp.asarray(self.tables.tid)
        self._scalar = loader.VocabHandle(vocab)
        self.stats = None  # optional utils.profiling.StageStats
        self._statics = dict(
            max_len=int(self.tables.max_len),
            rows_off=tuple(self.tables.rows_off),
            mult1=int(self.tables.mult1),
            mult2=int(self.tables.mult2),
            lane_salts=tuple(self.tables.lane_salts),
            unk_id=int(self.tables.unk_token_id),
        )

    # -- device step -------------------------------------------------------
    def _use_pallas(self) -> bool:
        import jax

        return jax.default_backend() not in ("cpu",)

    def _dispatch_buckets(self, mats: list[np.ndarray]):
        """Start the device program for all non-empty buckets (async under
        jax dispatch); returns an opaque handle for _fetch_buckets."""
        if not self._use_pallas():
            emits = [
                self._run_bucket(m, WIDTHS[b]) if m.shape[0] else None
                for b, m in enumerate(mats)
            ]
            return ("sync", emits)
        from .ops.word_kernel_pallas import word_match_commit_compact

        max_len = self._statics["max_len"]
        packed = []
        strides = []
        nonempty = []
        n_units_total = 0
        for b, mat in enumerate(mats):
            if mat.shape[0] == 0:
                continue
            nonempty.append(b)
            strides.append(STRIDES[b])
            packed.append(jnp.asarray(pack_groups(mat, STRIDES[b], max_len)))
            n_units_total += mat.shape[0]
        if not packed:
            return ("sync", [None] * len(mats))
        # Compact-output capacity: ~1.2 ids/unit is typical; 2x + slack
        # covers heavy-subword corpora, with a full-emit fallback beyond.
        cap = 1 << max(13, (2 * n_units_total + 1024 - 1).bit_length())
        out_dev = word_match_commit_compact(
            tuple(packed),
            self._tab_k1,
            self._tab_k2,
            self._tab_id,
            strides=tuple(strides),
            block_rows=BLOCK_ROWS,
            cap=cap,
            **self._statics,
        )
        for leaf in out_dev:
            try:
                leaf.copy_to_host_async()  # overlap D2H with later host work
            except AttributeError:
                pass
        rows = [pk.shape[0] for pk in packed]
        sizes = [mats[b].shape[0] for b in nonempty]
        return ("async", out_dev, nonempty, rows, sizes, len(mats), cap, packed, strides)

    def _fetch_buckets(self, handle) -> list[np.ndarray]:
        if handle[0] == "sync":
            return handle[1]
        _, out_dev, nonempty, rows, sizes, n_mats, cap, packed, strides = handle
        total = int(out_dev[2])
        if total > cap:  # pragma: no cover - needs >2 ids/unit on average
            return self._fetch_full(packed, strides, nonempty, rows, sizes, n_mats)
        compact = np.asarray(out_dev[0])[:total]
        counts = np.asarray(out_dev[1]).astype(np.int64)
        tid = (compact >> 7) - 2
        lane = compact & 127
        row_of_id = np.repeat(np.arange(counts.shape[0], dtype=np.int64), counts)
        cum = np.zeros(counts.shape[0] + 1, dtype=np.int64)
        np.cumsum(counts, out=cum[1:])
        emits: list[np.ndarray | None] = [None] * n_mats
        row0 = 0
        for b, nrows, n_units in zip(nonempty, rows, sizes):
            stride = STRIDES[b]
            n_groups = 128 // stride
            lo, hi = cum[row0], cum[row0 + nrows]
            r_loc = row_of_id[lo:hi] - row0
            ln = lane[lo:hi]
            unit = r_loc * n_groups + ln // stride
            pos = ln % stride
            emit = np.full((nrows * n_groups, stride - 1), -2, dtype=np.int32)
            emit[unit, pos] = tid[lo:hi]
            emits[b] = emit[:n_units]
            row0 += nrows
        return emits

    def _fetch_full(self, packed, strides, nonempty, rows, sizes, n_mats):
        """Fallback when the compact capacity overflows: fetch the full
        emit matrix (2nd round trip; needs >2 emitted ids per unit)."""
        from .ops.word_kernel_pallas import word_match_commit_multi

        out_dev = word_match_commit_multi(
            tuple(packed),
            self._tab_k1,
            self._tab_k2,
            self._tab_id,
            strides=tuple(strides),
            block_rows=BLOCK_ROWS,
            **self._statics,
        )
        out_cat = np.asarray(out_dev)
        emits: list[np.ndarray | None] = [None] * n_mats
        row = 0
        for b, nrows, n_units in zip(nonempty, rows, sizes):
            emits[b] = unpack_emit(out_cat[row : row + nrows], STRIDES[b], n_units)
            row += nrows
        return emits

    def _run_all_buckets(self, mats: list[np.ndarray]) -> list[np.ndarray]:
        """Run every non-empty bucket in ONE device program (single
        host<->device round trip); returns per-bucket emit matrices."""
        return self._fetch_buckets(self._dispatch_buckets(mats))

    def _run_bucket(self, mat: np.ndarray, width: int) -> np.ndarray:
        """mat: int32[U, width] (pad 32).  Returns emit int32[U, width]."""
        u = mat.shape[0]
        max_len = self._statics["max_len"]
        if self._use_pallas():
            from .ops.word_kernel_pallas import word_match_commit_pallas

            stride = width + 1
            packed = pack_groups(mat, stride, max_len)
            emit = word_match_commit_pallas(
                jnp.asarray(packed),
                self._tab_k1,
                self._tab_k2,
                self._tab_id,
                stride=stride,
                block_rows=BLOCK_ROWS,
                **self._statics,
            )
            return unpack_emit(np.asarray(emit), stride, u)
        rows = _round_rows(u)
        padded = np.full((rows, width + max_len), 32, dtype=np.int32)
        padded[:u, :width] = mat
        emit = word_match_commit(
            jnp.asarray(padded),
            self._tab_k1,
            self._tab_k2,
            self._tab_id,
            width=width,
            **self._statics,
        )
        return np.asarray(emit[:u])

    def _verify_emit(self, mat: np.ndarray, emit: np.ndarray) -> np.ndarray:
        """Check every emitted non-UNK token's string against the vocab;
        returns `emit` (or a repaired copy) with mismatching units
        re-encoded by the scalar oracle."""
        bad = loader.verify_emit(mat, emit, self.vocab, self._statics["unk_id"])
        if bad is not None:
            if bad.size:  # pragma: no cover - requires a hash collision
                emit = emit.copy()
                for r in bad.tolist():
                    row = mat[r]
                    cps = row[row != 32].astype(np.uint32)
                    ids = self._scalar.encode(cps)
                    emit[r, :] = -2
                    emit[r, : ids.shape[0]] = ids
            return emit
        if self._padded_vocab is None:
            self._padded_vocab = self.vocab.padded(width=max(self.vocab.max_len, 1))
        padded, plens = self._padded_vocab
        unk = self._statics["unk_id"]
        rr, jj = np.nonzero(emit != -2)
        if rr.size == 0:
            return
        tid = emit[rr, jj]
        chk = tid != unk
        rr_c, jj_c, tid_c = rr[chk], jj[chk], tid[chk]
        bad_rows: set[int] = set()
        oob = (tid_c < 0) | (tid_c >= self.vocab.size)
        if oob.any():
            bad_rows.update(rr_c[oob].tolist())
            keep = ~oob
            rr_c, jj_c, tid_c = rr_c[keep], jj_c[keep], tid_c[keep]
        if rr_c.size:
            lens = plens[tid_c].astype(np.int64)
            W = mat.shape[1]
            for k in range(padded.shape[1]):
                act = k < lens
                if not act.any():
                    break
                col = np.minimum(jj_c + k, W - 1)
                got = mat[rr_c, col]
                want = padded[tid_c, k]
                mism = act & ((got != want) | (jj_c + k >= W))
                if mism.any():
                    bad_rows.update(rr_c[mism].tolist())
        if bad_rows:  # pragma: no cover - requires a hash collision
            emit = emit.copy()
            for r in bad_rows:
                row = mat[r]
                cps = row[row != 32].astype(np.uint32)
                ids = self._scalar.encode(cps)
                emit[r, :] = -2
                emit[r, : ids.shape[0]] = ids
        return emit

    # Pipelined chunking: host segmentation/stitching of later chunks
    # overlaps the async-dispatched device programs (and their async D2H
    # copies) of earlier chunks.  Measured on this 2-core host the
    # orchestration CPU cost of extra chunks outweighs the hidden device
    # latency below ~32MB, so small corpora run as ONE chunk; chunking
    # kicks in for large corpora (bounding peak host memory) where the
    # per-chunk overhead amortizes.
    PIPELINE_CHUNK = 32_000_000
    PIPELINE_MIN = 40_000_000  # below this a single chunk is faster
    PIPELINE_WINDOW = 4  # max chunks in flight (bounds host memory)

    def encode_bytes(self, data: bytes) -> np.ndarray:
        if len(data) <= self.PIPELINE_MIN:
            return self._encode_chunk(data)
        # Split at ASCII-space boundaries (units never span spaces).
        chunks = []
        begin = 0
        n = len(data)
        while begin < n:
            end = min(n, begin + self.PIPELINE_CHUNK)
            while end < n and data[end] != 0x20:
                end += 1
            chunks.append(data[begin:end])
            begin = end
        outs = []
        from collections import deque

        window: deque = deque()
        for chunk in chunks:
            window.append((chunk, self._prepare_chunk(chunk)))
            if len(window) >= self.PIPELINE_WINDOW:
                outs.append(self._finish_chunk(*window.popleft()))
        while window:
            outs.append(self._finish_chunk(*window.popleft()))
        outs = [o for o in outs if o.size]
        return np.concatenate(outs) if outs else np.zeros(0, np.int32)

    # -- host orchestration ------------------------------------------------
    def _encode_chunk(self, data: bytes) -> np.ndarray:
        import contextlib

        st = self.stats
        def stage(name, nbytes=0):
            return st.stage(name, nbytes) if st is not None else contextlib.nullcontext()

        if len(data) == 0:
            return np.zeros(0, dtype=np.int32)
        return self._finish_chunk(data, self._prepare_chunk(data))

    def _prepare_chunk(self, data: bytes):
        """Host phases + async device dispatch for one chunk."""
        import contextlib

        st = self.stats
        def stage(name, nbytes=0):
            return st.stage(name, nbytes) if st is not None else contextlib.nullcontext()

        if len(data) == 0:
            return None
        with stage("host_segment_dedupe", len(data)):
            occ, ustart, ulen, ucplen = loader.segment_dedupe(data)
        if ustart.shape[0] == 0:
            return None
        with stage("host_bucket_fill"):
            mats, bucket_of, row_of = loader.bucket_fill(
                data, ustart, ulen, ucplen, list(WIDTHS)
            )
        with stage("device_dispatch"):
            handle = self._dispatch_buckets(mats)
        return (occ, ustart, ulen, mats, bucket_of, row_of, handle)

    def _finish_chunk(self, data: bytes, state) -> np.ndarray:
        """Fetch device results for one chunk, verify, stitch, expand."""
        import contextlib

        st = self.stats
        def stage(name, nbytes=0):
            return st.stage(name, nbytes) if st is not None else contextlib.nullcontext()

        if state is None:
            return np.zeros(0, dtype=np.int32)
        occ, ustart, ulen, mats, bucket_of, row_of, handle = state
        nu = ustart.shape[0]

        # Per-unique token lists, flattened per bucket then stitched.
        n_buckets = len(WIDTHS)
        with stage("device_fetch", len(data)):
            emits = self._fetch_buckets(handle)
        if self.verify:
            with stage("host_verify"):
                for b, mat in enumerate(mats):
                    if mat.shape[0]:
                        emits[b] = self._verify_emit(mat, emits[b])
        flats: list[np.ndarray] = []
        bucket_row_offsets: list[np.ndarray] = []  # per bucket: int64[U_b+1]
        for b, mat in enumerate(mats):
            if mat.shape[0] == 0:
                flats.append(np.zeros(0, np.int32))
                bucket_row_offsets.append(np.zeros(1, np.int64))
                continue
            emit = emits[b]
            mask = emit != -2
            counts = mask.sum(axis=1).astype(np.int64)
            offs = np.zeros(mat.shape[0] + 1, dtype=np.int64)
            np.cumsum(counts, out=offs[1:])
            flats.append(emit[mask].astype(np.int32))
            bucket_row_offsets.append(offs)

        # Overflow units (> widest bucket): native scalar fallback.
        overflow_ids: dict[int, np.ndarray] = {}
        overflow_sel = np.nonzero(bucket_of == n_buckets)[0]
        for u in overflow_sel:
            cps = loader.decode_utf8(
                data[ustart[u] : ustart[u] + ulen[u]]
            )
            overflow_ids[int(u)] = self._scalar.encode(cps)

        # Stitch per-unique (offset, count) into one flat array.
        base = np.zeros(n_buckets + 1, dtype=np.int64)
        for b in range(n_buckets):
            base[b + 1] = base[b] + flats[b].shape[0]
        over_flat = (
            np.concatenate([overflow_ids[int(u)] for u in overflow_sel])
            if overflow_sel.size
            else np.zeros(0, np.int32)
        )
        tok_flat = np.concatenate(flats + [over_flat]) if nu else np.zeros(0, np.int32)

        offsets = np.zeros(nu + 1, dtype=np.int64)
        counts_u = np.zeros(nu, dtype=np.int64)
        starts_u = np.zeros(nu, dtype=np.int64)
        for b in range(n_buckets):
            sel = bucket_of == b
            if not sel.any():
                continue
            rows = row_of[sel]
            offs = bucket_row_offsets[b]
            starts_u[sel] = base[b] + offs[rows]
            counts_u[sel] = offs[rows + 1] - offs[rows]
        if overflow_sel.size:
            over_base = base[n_buckets]
            pos = over_base
            for u in overflow_sel:
                c = overflow_ids[int(u)].shape[0]
                starts_u[u] = pos
                counts_u[u] = c
                pos += c

        # Re-pack flat so unique u's ids live at offsets[u]:offsets[u+1].
        np.cumsum(counts_u, out=offsets[1:])
        total = int(offsets[-1])
        order_flat = np.empty(total, dtype=np.int32)
        if total:
            # Vectorized ragged-range gather (no Python loop): a delta
            # array that is 1 inside each run and jumps at run starts.
            nz = counts_u > 0
            su = starts_u[nz]
            ln = counts_u[nz]
            first_pos = np.concatenate([[0], np.cumsum(ln)[:-1]])
            d = np.ones(total, dtype=np.int64)
            d[first_pos[0]] = su[0]
            if su.shape[0] > 1:
                d[first_pos[1:]] = su[1:] - (su[:-1] + ln[:-1]) + 1
            order_flat[:] = tok_flat[np.cumsum(d)]

        with stage("host_expand"):
            out = loader.expand(occ, order_flat, offsets)
        return out if out is not None else np.zeros(0, np.int32)

    def encode_codepoints(self, cps: np.ndarray) -> np.ndarray:
        """Compatibility entry: re-encode cps to UTF-8 bytes first."""
        from .core import unicode as uni

        return self.encode_bytes(uni.encode_utf8(np.asarray(cps, dtype=np.uint32)))
