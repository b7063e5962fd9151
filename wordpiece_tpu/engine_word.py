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

import threading

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
    # {2^k, 3*2^(k-1)} shape buckets (one extra compiled variant per
    # octave, persistent-cached) shave up to 25% of pad rows vs pure
    # pow2 — pad rows cost real H2D bytes and kernel time.
    p2 = 1 << (n - 1).bit_length()
    q = 3 * (p2 // 4)
    return q if (n <= q and q % multiple == 0) else p2


def pack_groups(
    mat: np.ndarray, stride: int, max_len: int, *, narrow: bool = False
) -> np.ndarray:
    """(U, W) unit matrix -> group-packed rows, pad 32.

    narrow=False: int32[rows, 128 + max_len] (the kernels' full layout).
    narrow=True with BMP-only codepoints: uint16[rows, 128] — the device
    widens and appends the pad block (word_kernel_pallas._widen_pad), so
    H2D ships 2 bytes/lane and no pad columns (the axon tunnel's ~20MB/s
    makes the first chunk's H2D a critical-path item).  Latin-1-only
    buckets (all of ASCII text) narrow further to uint8 — 1 byte/lane.
    Falls back to the full int32 layout when any codepoint exceeds
    uint16.
    """
    u, w = mat.shape
    assert w == stride - 1
    n_groups = 128 // stride
    rows = _round_rows(-(-u // n_groups))
    units = np.full((rows * n_groups, stride), 32, dtype=np.int32)
    units[:u, :w] = mat
    packed = units.reshape(rows, 128)
    mx = 32 if u == 0 else int(mat.max())
    if narrow and mx <= 0xFFFF:
        return packed.astype(np.uint8 if mx <= 0xFF else np.uint16)
    out = np.full((rows, 128 + max_len), 32, dtype=np.int32)
    out[:, :128] = packed
    return out


def unpack_emit(emit: np.ndarray, stride: int, n_units: int) -> np.ndarray:
    """(rows, 128) kernel output -> (n_units, stride - 1) emissions."""
    rows = emit.shape[0]
    n_groups = 128 // stride
    units = emit.reshape(rows * n_groups, stride)
    return units[:n_units, : stride - 1]


def _fetch_under_deadline(fn, timeout_s: float):
    """Run fn() — a BLOCKING device fetch — on a fresh daemon thread and
    wait up to timeout_s.  Returns (True, value) on success, (False,
    None) on deadline; an exception raised by fn propagates to the
    caller.

    Why a thread and not is_ready() polling: measured on the axon tunnel
    backend, an array's is_ready() NEVER transitions to True until a
    blocking fetch materialises the value (11 s of polling returned
    False while np.asarray then delivered the result immediately), so
    readiness polling is not a usable signal there.  A cross-thread
    blocking np.asarray was measured to work fine (no deadlock).  On
    timeout the worker stays blocked on the wedged fetch — it is a
    daemon thread, so it can never block interpreter exit, and each
    fetch gets a fresh thread so later fetches never queue behind a
    wedged one."""
    box: dict = {}
    done = threading.Event()

    def run():
        try:
            box["value"] = fn()
        except BaseException as e:
            box["exc"] = e
        finally:
            done.set()

    t = threading.Thread(target=run, daemon=True, name="wp-device-fetch")
    t.start()
    if not done.wait(timeout_s):
        return False, None
    if "exc" in box:
        raise box["exc"]
    return True, box["value"]


def _device_error_types() -> tuple:
    """Exception types that indicate a device/link failure (rescued in
    auto mode) as opposed to a host-side bug (which must propagate:
    IndexError/ValueError/... from the compact decode stay loud).
    jax.errors.JaxRuntimeError is the alias for XlaRuntimeError in this
    jax — it covers the INTERNAL backend errors a wedged axon tunnel
    throws."""
    errs: list[type] = [TimeoutError]
    try:
        from jax.errors import JaxRuntimeError

        errs.append(JaxRuntimeError)
    except ImportError:
        pass
    return tuple(errs)


_DEVICE_ERRORS = _device_error_types()


class _TokenStore:
    """Growable (flat ids, offsets) holding every unique unit's token list
    for one encode session; uid u's ids live at flat[offs[u]:offs[u+1]].
    Keeps >= 2 readable slots past the used region (wp_expand over-reads
    2 ids per occurrence by design)."""

    def __init__(self):
        self.flat = np.zeros(1 << 15, dtype=np.int32)
        self.n = 0
        self.offs = np.zeros((1 << 14) + 1, dtype=np.int64)
        self.nu = 0

    def append(self, run_flat: np.ndarray, counts: np.ndarray) -> None:
        """Append k new units' runs (run_flat in uid order; counts int64[k])."""
        k = counts.shape[0]
        m = run_flat.shape[0]
        if self.n + m + 2 > self.flat.shape[0]:
            cap = max(self.n + m + 2, 2 * self.flat.shape[0])
            nf = np.zeros(cap, dtype=np.int32)
            nf[: self.n] = self.flat[: self.n]
            self.flat = nf
        if self.nu + k + 1 > self.offs.shape[0]:
            cap = max(self.nu + k + 1, 2 * self.offs.shape[0])
            no = np.zeros(cap, dtype=np.int64)
            no[: self.nu + 1] = self.offs[: self.nu + 1]
            self.offs = no
        self.flat[self.n : self.n + m] = run_flat
        seg = self.offs[self.nu + 1 : self.nu + 1 + k]
        np.cumsum(counts, out=seg)
        seg += self.n
        self.n += m
        self.nu += k


class WordEncoder:
    """Deduped unit encoder (the production fast path)."""

    # Program shapes whose device program has been fetched (or at least
    # dispatched) by THIS process: used to pick the fetch deadline.  Under
    # the axon backend compilation happens lazily at fetch time, so the
    # first fetch of a new shape may legitimately take minutes (remote
    # compile) and must get DEVICE_COMPILE_TIMEOUT_S, not the warm one.
    # Class-level on purpose: compiled executables are per-process, not
    # per-encoder.
    _seen_shapes: set = set()

    def __init__(
        self,
        vocab: Vocabulary,
        tables: LengthTables | None = None,
        *,
        verify: bool = True,
        cache: bool = False,
        device_role: str = "primary",
    ):
        """cache=True keeps the dedupe session and per-unit token lists
        ALIVE ACROSS encode calls (a vocabulary-lifetime unit cache):
        repeated vocabulary — log streams, epochs over a corpus — skips
        segmentation's device work entirely on later calls.  Memory grows
        with the number of distinct units ever seen (~bytes of unique
        text); call reset_cache() to drop it.

        verify=True (default) cross-checks every emitted token's string
        against the vocabulary on host (cheap: only unique units) and
        re-encodes any mismatching unit with the native scalar oracle.
        This catches any hash collision that surfaces as an emitted
        token; the residual risk (a collision at a never-emitted position
        perturbing only UNK placement) stays at ~2^-64 per probe.

        device_role:
          - "primary" (default): a device fetch blocks until the result
            arrives, however long that takes.
          - "auto" (chosen by make_encoder for the production path):
            identical pipeline and identical ids, but the blocking fetch
            runs on a daemon worker thread under a deadline
            (DEVICE_COMPILE_TIMEOUT_S for the encoder's first fetch and
            for any fetch whose program shape this process has not run
            yet — axon compiles lazily at fetch time, so those may
            include a 30-200 s remote compile; DEVICE_FETCH_TIMEOUT_S
            for warm shapes after).  A fetch that misses its
            deadline, or raises a device/link error (the axon tunnel has
            stalled for minutes and thrown INTERNAL backend errors
            mid-run), is RESCUED by encoding that chunk's units with the
            native host oracle, so an encode always completes.  After
            DEVICE_DEAD_AFTER consecutive rescues the link is latched
            dead and later chunks skip device dispatch entirely (host
            oracle path), so a wedged tunnel costs a bounded number of
            timeouts, not one per chunk.  Rescues are counted in
            self.device_fallbacks; the latest cause string is kept in
            self.last_rescue_cause.  NOTE: is_ready() polling is NOT
            used — on the axon backend is_ready() never transitions
            until a blocking fetch materialises the array (measured),
            which is exactly the failure that collapsed round 4's bench.
        An always-race variant (host computes, device cross-checks) was
        measured 38% SLOWER on CJK corpora on a 2-vCPU host — the spare
        "free" overlap the race needs does not exist there — so rescue
        is strictly an exception path, not a compute policy."""
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
        self.cache = cache
        if device_role not in ("primary", "auto"):
            raise ValueError(f"unknown device_role {device_role!r}")
        self.device_role = device_role
        self.device_fallbacks = 0  # rescued (timed-out / errored) fetches
        self.last_rescue_cause: str | None = None
        self._consec_rescues = 0
        self._device_dead = False  # latched after DEVICE_DEAD_AFTER rescues
        self._device_fetch_ok = False  # first successful fetch seen
        self._cache_state = None  # (DedupeSession, _TokenStore) when cache
        self._executor = None  # lazy 1-thread pool for pipelined prepares
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

    def _interpret(self) -> bool:
        """Pallas interpret mode: required when the compact/multi kernels
        run on the CPU backend (tests force _use_pallas there)."""
        import jax

        return jax.default_backend() == "cpu"

    def _dispatch_buckets(self, mats: list[np.ndarray]):
        """Start the device program for all non-empty buckets (async under
        jax dispatch); returns an opaque handle for _fetch_buckets."""
        override = self.__dict__.get("_run_all_buckets")
        if override is not None:  # e.g. ShardedWordEncoder's mesh step
            return ("sync", override(mats))
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
            packed.append(
                jnp.asarray(pack_groups(mat, STRIDES[b], max_len, narrow=True))
            )
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
            interpret=self._interpret(),
            **self._statics,
        )
        try:
            out_dev.copy_to_host_async()  # overlap D2H with later host work
        except AttributeError:
            pass
        rows = [pk.shape[0] for pk in packed]
        sizes = [mats[b].shape[0] for b in nonempty]
        # Compile-vs-warm deadline hint: under the axon backend the
        # compile happens lazily at FETCH time, so a fetch whose program
        # shape (row counts x strides x dtypes x cap) has not been run by
        # this process yet may legitimately take minutes — it must get
        # the compile deadline, not the warm-fetch one.
        shape_key = (
            tuple(rows),
            tuple(strides),
            tuple(str(pk.dtype) for pk in packed),
            cap,
        )
        fresh = shape_key not in WordEncoder._seen_shapes
        WordEncoder._seen_shapes.add(shape_key)
        return (
            "async", out_dev, nonempty, rows, sizes, len(mats), cap, packed,
            strides, fresh,
        )

    def _fetch_buckets(self, handle):
        if handle[0] == "sync":
            return handle[1]
        _, out_dev, nonempty, rows, sizes, n_mats, cap, packed, strides, _fresh = handle
        fused = np.asarray(out_dev)  # ONE D2H transfer
        total = int(fused[0])
        if total > cap:  # >2 ids/unit on average (UNK-heavy / char vocabs)
            # Launches a SECOND device program; in auto mode this whole
            # call (including this path) runs inside the deadline thread,
            # so a tunnel wedge here is still rescued, never a hang.
            return self._fetch_full(packed, strides, nonempty, rows, sizes, n_mats)
        rows_total = sum(rows)
        compact = fused[1 + rows_total : 1 + rows_total + total]
        counts = fused[1 : 1 + rows_total].astype(np.int64)
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
            interpret=self._interpret(),
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
            packed = pack_groups(mat, stride, max_len, narrow=True)
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
            return emit
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

    # Pipelined chunking over a persistent dedupe session: occurrence ids
    # are GLOBAL across chunks (native session table, arena-backed), so
    # each chunk dispatches only its first-seen units to the device —
    # chunking costs no dedupe loss.  Chunk k+1's host segmentation runs
    # on a worker thread (ctypes releases the GIL) while the main thread
    # fetches/stitches/expands chunk k; device programs and D2H copies of
    # in-window chunks proceed asynchronously throughout.
    PIPELINE_CHUNK = 3_000_000
    # Small first chunk: the opening device batch (the corpus's unique-set
    # bulk) dispatches earlier and carries less H2D, so its fetch returns
    # while the worker is still segmenting the body.
    PIPELINE_FIRST = 1_000_000
    PIPELINE_WINDOW = 4  # max chunks in flight (bounds host memory)

    # Lockstep mode (multi-process SPMD): when True, EVERY chunk enters
    # the device program — even chunks with zero or few new units that
    # the single-process path would skip or encode on the host scalar.
    # A multi-process device step is a collective: all processes must
    # enter it the same number of times, or the pod deadlocks.  Set by
    # MultiHostWordEncoder together with an agreed (allgather-max'd)
    # n_chunks so chunk counts match across processes.
    lockstep_dispatch = False

    def reset_cache(self) -> None:
        """Drop the persistent unit cache (cache=True encoders)."""
        if self._cache_state is not None:
            self._cache_state[0].close()
            self._cache_state = None

    def _stage(self, name, nbytes=0):
        import contextlib

        st = self.stats
        return st.stage(name, nbytes) if st is not None else contextlib.nullcontext()

    def encode_bytes(self, data: bytes, *, n_chunks: int | None = None) -> np.ndarray:
        """Encode a byte corpus.  `n_chunks` forces the pipeline to split
        into EXACTLY that many chunks (trailing chunks may be empty) —
        the multi-process lockstep contract (see lockstep_dispatch)."""
        if len(data) == 0 and not (self.lockstep_dispatch and n_chunks):
            return np.zeros(0, dtype=np.int32)
        if self.cache:
            # Persistent vocabulary session: the unit table and token
            # lists survive across calls, so repeated vocabulary (log
            # streams, epochs over a corpus) skips the device entirely.
            if self._cache_state is None:
                self._cache_state = (loader.DedupeSession(), _TokenStore())
            session, store = self._cache_state
            first = store.nu == 0
        else:
            session = loader.DedupeSession()
            store = _TokenStore()
            first = True
        try:
            if (n_chunks is None or n_chunks <= 1) and len(data) <= self.PIPELINE_CHUNK:
                return self._finish_chunk(
                    data, self._prepare_chunk(data, session, first), store
                )
            # Split at space-class boundaries (units never span spaces;
            # any space-class codepoint qualifies — newline- or
            # U+2581-separated corpora must pipeline too).
            from .core.unicode import find_space_cut

            chunks = []
            begin = 0
            n = len(data)
            if n_chunks is not None:
                # Exactly n_chunks chunks (lockstep); tail may be empty.
                target = max(1, -(-n // n_chunks))
                for ci in range(n_chunks):
                    if ci == n_chunks - 1:
                        end = n
                    else:
                        end = min(n, begin + target)
                        if end < n:
                            cut = find_space_cut(data, end)
                            end = cut if cut >= 0 else n
                    chunks.append(data[begin:end])
                    begin = end
            else:
                while begin < n:
                    step = self.PIPELINE_FIRST if begin == 0 else self.PIPELINE_CHUNK
                    end = min(n, begin + step)
                    if end < n:
                        cut = find_space_cut(data, end)
                        end = cut if cut >= 0 else n
                    chunks.append(data[begin:end])
                    begin = end
            if self._executor is None:
                from concurrent.futures import ThreadPoolExecutor

                self._executor = ThreadPoolExecutor(max_workers=1)
            from collections import deque

            outs = []
            window: deque = deque()
            try:
                for ci, chunk in enumerate(chunks):
                    window.append(
                        (
                            chunk,
                            self._executor.submit(
                                self._prepare_chunk, chunk, session, first and ci == 0
                            ),
                        )
                    )
                    if len(window) >= self.PIPELINE_WINDOW:
                        c, f = window.popleft()
                        outs.append(self._finish_chunk(c, f.result(), store))
                while window:
                    c, f = window.popleft()
                    outs.append(self._finish_chunk(c, f.result(), store))
            finally:
                # Drain in-flight prepares before the session dies.
                for _, f in window:
                    try:
                        f.result()
                    except Exception:
                        pass
            outs = [o for o in outs if o.size]
            return np.concatenate(outs) if outs else np.zeros(0, np.int32)
        finally:
            if not self.cache:
                session.close()

    # Small first-seen batches encode on the native host oracle instead of
    # paying a device round trip (the tunnel's ~24ms latency + kernel +
    # D2H is a ~40ms stall; the host scalar path does 16k units in ~7ms).
    # Applied only after the session's first device dispatch so
    # single-chunk encodes (and the kernel test suite) always exercise the
    # device kernels; in the pipeline this is the Zipf tail.  16384 (vs
    # the old 4096) matters for ru/ja/zh: their chunk-2 new-unit counts
    # (5.6-6.8k on the 10MB bench corpora) were just over 4096 and paid a
    # second device round trip that en (3.9k) skipped.
    SCALAR_MAX_NEW = 16384

    # Units of <= this many codepoints are encoded by the native scalar
    # oracle even in device-dispatching chunks.  A 1-2 cp unit's MaxMatch
    # is one or two host hash probes — shipping it through the tunnel
    # buys nothing and CJK corpora are DOMINATED by such units (every
    # kana/kanji glued singleton).  Routing them host-side shrinks the
    # first chunk's H2D payload and kernel grid to the multi-char units
    # (en-like words) the crossbar kernel is actually good at: measured
    # ja first-chunk fetch fell ~35% and zh's device rows fell ~10x on
    # the 10 MB bench corpora.  Disabled in lockstep mode (the split is
    # data-dependent; collective entry counts must not be).
    SCALAR_SMALL_CPLEN = 2

    # device_role="auto": give up on a device fetch after this long and
    # rescue the chunk on the host oracle.  Generous vs the ~50 ms a
    # healthy warm fetch takes (and vs most mid-run shape compiles with
    # a warm persistent cache); small vs the minutes a wedged tunnel
    # costs.  The encoder's FIRST fetch instead gets
    # DEVICE_COMPILE_TIMEOUT_S: it may include a 30-200 s cold compile
    # through the axon remote compiler, which must not read as a stall.
    DEVICE_FETCH_TIMEOUT_S = 30.0
    DEVICE_COMPILE_TIMEOUT_S = 600.0
    # Consecutive rescues after which the device link is latched dead
    # and later chunks skip dispatch (bounded cost for a wedged tunnel).
    DEVICE_DEAD_AFTER = 2

    # -- host orchestration ------------------------------------------------
    def _prepare_chunk(
        self, data: bytes, session: loader.DedupeSession, first: bool = True
    ):
        """Host phases + async device dispatch for one chunk.  Returns
        (occ global uids, new_start, new_len, mats, bucket_of, row_of,
        device handle); the last five are None when the chunk introduces
        no new units.  handle ("scalar", flat, counts) marks host-encoded
        batches (already in uid order, no device fetch)."""
        with self._stage("host_segment_dedupe", len(data)):
            occ, nstart, nlen, ncplen = session.segment(data)
        if nstart.shape[0] == 0 and not self.lockstep_dispatch:
            return (occ, None, None, None, None, None, None, None)
        if self._device_dead and not self.lockstep_dispatch:
            # Link latched dead (DEVICE_DEAD_AFTER consecutive rescues):
            # stay on the host oracle, don't pay another timeout.
            with self._stage("host_scalar_units"):
                flat, counts = self._scalar.encode_units(
                    data, nstart, nlen, int(ncplen.sum())
                )
            return (occ, nstart, nlen, None, None, None, ("scalar", flat, counts), None)
        if (
            not first
            and not self.lockstep_dispatch
            and nstart.shape[0] <= self.SCALAR_MAX_NEW
        ):
            with self._stage("host_scalar_units"):
                flat, counts = self._scalar.encode_units(
                    data, nstart, nlen, int(ncplen.sum())
                )
            return (occ, nstart, nlen, None, None, None, ("scalar", flat, counts), None)
        # Split tiny units (see SCALAR_SMALL_CPLEN) off to the host
        # oracle; the device program sees only the multi-char units.
        small = None
        big_idx = None
        if not self.lockstep_dispatch:
            sel = ncplen <= self.SCALAR_SMALL_CPLEN
            if sel.any():
                small_idx = np.nonzero(sel)[0]
                with self._stage("host_scalar_units"):
                    sflat, scounts = self._scalar.encode_units(
                        data,
                        nstart[small_idx],
                        nlen[small_idx],
                        int(ncplen[small_idx].sum()),
                    )
                small = (small_idx, sflat, scounts.astype(np.int64))
                big_idx = np.nonzero(~sel)[0]
        with self._stage("host_bucket_fill"):
            if big_idx is None:
                mats, bucket_of, row_of = loader.bucket_fill(
                    data, nstart, nlen, ncplen, list(WIDTHS)
                )
            else:
                mats, b_of, r_of = loader.bucket_fill(
                    data,
                    nstart[big_idx],
                    nlen[big_idx],
                    ncplen[big_idx],
                    list(WIDTHS),
                )
                # Full-length maps: -1 marks a scalar-routed (small) unit.
                bucket_of = np.full(nstart.shape[0], -1, dtype=np.int32)
                row_of = np.zeros(nstart.shape[0], dtype=np.int32)
                bucket_of[big_idx] = b_of
                row_of[big_idx] = r_of
        with self._stage("device_dispatch"):
            handle = self._dispatch_buckets(mats)
        return (occ, nstart, nlen, mats, bucket_of, row_of, handle, small)

    def _finish_chunk(self, data: bytes, state, store: _TokenStore) -> np.ndarray:
        """Fetch device results for one chunk's NEW units, verify, stitch
        them into the session store, then expand the chunk's occurrence
        stream from the store."""
        occ, nstart, nlen, mats, bucket_of, row_of, handle, small = state
        if nstart is not None:
            if isinstance(handle, tuple) and handle[0] == "scalar":  # host batch
                _, flat, counts = handle
                store.append(flat, counts.astype(np.int64))
            else:
                self._stitch_new_units(
                    data, nstart, nlen, mats, bucket_of, row_of, handle, store,
                    small=small,
                )
        if occ.shape[0] == 0:
            return np.zeros(0, dtype=np.int32)
        with self._stage("host_expand"):
            out = loader.expand(
                occ, store.flat, store.offs[: store.nu + 1], slack=True
            )
        return out if out is not None else np.zeros(0, np.int32)

    def _stitch_new_units(
        self, data, nstart, nlen, mats, bucket_of, row_of, handle, store,
        small=None,
    ) -> None:
        """`small`: optional (small_idx, flat, counts) of units encoded by
        the host oracle (bucket_of == -1 at those uids)."""
        with self._stage("device_fetch", len(data)):
            if self.device_role == "auto":
                # A fetch whose program shape has not been run by this
                # process yet may include a lazy remote compile (axon
                # compiles at fetch time): give it the compile deadline.
                fresh = handle[0] == "async" and handle[-1]
                timeout = (
                    self.DEVICE_FETCH_TIMEOUT_S
                    if self._device_fetch_ok and not fresh
                    else self.DEVICE_COMPILE_TIMEOUT_S
                )
                try:
                    ok, emits = _fetch_under_deadline(
                        lambda: self._fetch_buckets(handle), timeout
                    )
                    if not ok:
                        raise TimeoutError(
                            f"device fetch not ready within {timeout:.0f}s"
                        )
                    self._device_fetch_ok = True
                    self._consec_rescues = 0
                except _DEVICE_ERRORS as e:
                    # Stalled or errored device LINK (host-side bugs are
                    # not in _DEVICE_ERRORS and propagate): rescue the
                    # chunk on the host oracle (identical ids by
                    # construction).
                    self.device_fallbacks += 1
                    self.last_rescue_cause = repr(e)
                    self._consec_rescues += 1
                    if self._consec_rescues >= self.DEVICE_DEAD_AFTER:
                        self._device_dead = True
                    with self._stage("host_scalar_units"):
                        flat, counts = self._scalar.encode_units(
                            data, nstart, nlen, int(nlen.sum())
                        )
                    store.append(flat, counts.astype(np.int64))
                    return
            else:
                emits = self._fetch_buckets(handle)
        if self.verify:
            with self._stage("host_verify"):
                for b, mat in enumerate(mats):
                    if mat.shape[0]:
                        emits[b] = self._verify_emit(mat, emits[b])
        order_flat, counts_u = self._emits_to_uid_flat(
            data, nstart, nlen, mats, bucket_of, row_of, emits, small
        )
        store.append(order_flat, counts_u)

    def _emits_to_uid_flat(
        self, data, nstart, nlen, mats, bucket_of, row_of, emits, small=None
    ):
        """Per-bucket emit matrices -> (order_flat, counts_u): every new
        unit's token ids concatenated in uid order."""
        n_new = nstart.shape[0]
        n_buckets = len(WIDTHS)
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
            cps = loader.decode_utf8(data[nstart[u] : nstart[u] + nlen[u]])
            overflow_ids[int(u)] = self._scalar.encode(cps)

        # Stitch per-new-unit (offset, count) into one flat array in uid
        # order, then append to the session store.
        base = np.zeros(n_buckets + 1, dtype=np.int64)
        for b in range(n_buckets):
            base[b + 1] = base[b] + flats[b].shape[0]
        over_flat = (
            np.concatenate([overflow_ids[int(u)] for u in overflow_sel])
            if overflow_sel.size
            else np.zeros(0, np.int32)
        )
        small_flat = small[1] if small is not None else np.zeros(0, np.int32)
        tok_flat = np.concatenate(flats + [over_flat, small_flat])

        counts_u = np.zeros(n_new, dtype=np.int64)
        starts_u = np.zeros(n_new, dtype=np.int64)
        for b in range(n_buckets):
            sel = bucket_of == b
            if not sel.any():
                continue
            rows = row_of[sel]
            offs = bucket_row_offsets[b]
            starts_u[sel] = base[b] + offs[rows]
            counts_u[sel] = offs[rows + 1] - offs[rows]
        if overflow_sel.size:
            pos = base[n_buckets]
            for u in overflow_sel:
                c = overflow_ids[int(u)].shape[0]
                starts_u[u] = pos
                counts_u[u] = c
                pos += c
        if small is not None:
            small_idx, _, scounts = small
            soffs = np.zeros(scounts.shape[0] + 1, dtype=np.int64)
            np.cumsum(scounts, out=soffs[1:])
            sbase = base[n_buckets] + over_flat.shape[0]
            starts_u[small_idx] = sbase + soffs[:-1]
            counts_u[small_idx] = scounts

        total = int(counts_u.sum())
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
        return order_flat, counts_u

    def encode_codepoints(self, cps: np.ndarray) -> np.ndarray:
        """Compatibility entry: re-encode cps to UTF-8 bytes first."""
        from .core import unicode as uni

        return self.encode_bytes(uni.encode_utf8(np.asarray(cps, dtype=np.uint32)))
