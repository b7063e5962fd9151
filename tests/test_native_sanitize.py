"""Native-runtime hardening: forced-scalar A/B and ASan+UBSan runs.

Mirrors the reference's opt-in sanitizer build (-DCMAKE_USE_SANITIZERS,
reference CMakeLists.txt:39-45).  The native library does raw pointer
arithmetic, deliberate over-reads (wp_expand) and thread_local scratch
reuse — exactly the code sanitizers exist for.
"""

import ctypes
import os
import subprocess
import sys

import numpy as np
import pytest

from wordpiece_tpu.runtime import loader

pytestmark = pytest.mark.skipif(not loader.available(), reason="native runtime required")

NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "wordpiece_tpu",
    "runtime",
    "native",
)


def _build(target: str, so_name: str):
    so = os.path.join(NATIVE_DIR, so_name)
    if not os.path.exists(so):
        r = subprocess.run(
            ["make", "-C", NATIVE_DIR, "-s", target], capture_output=True, timeout=300
        )
        if r.returncode != 0:
            pytest.skip(f"cannot build {target}: {r.stderr.decode()[:200]}")
    return so


def _random_mixed_bytes(rng, n: int) -> bytes:
    """ASCII words + punctuation + spaces + multi-byte UTF-8, adversarial
    for the 64-byte-block class-mask builder."""
    parts = []
    total = 0
    words = [b"alpha", b"x", b"beta9", b"-", b".", b",,", b"\xd0\xbf\xd1\x80",
             b"\xe4\xb8\xad\xe6\x96\x87", b"\xe2\x96\x81tok", b"mixed\xc3\xa9"]
    while total < n:
        w = words[int(rng.integers(0, len(words)))]
        sep = b" " * int(rng.integers(0, 3))
        parts.append(w)
        parts.append(sep)
        total += len(w) + len(sep)
    return b"".join(parts)[:n]


def test_scalar_vs_vector_class_masks():
    """The AVX-512 class-mask path and the scalar one must segment
    byte-for-byte identically (WP_FORCE_SCALAR build as oracle)."""
    so = _build("scalar", "libwordpiece_host_scalar.so")
    lib = ctypes.CDLL(so)
    lib.wp_segment_dedupe.restype = ctypes.c_int64
    lib.wp_segment_dedupe.argtypes = [ctypes.c_void_p] * 7

    rng = np.random.default_rng(42)
    # Sizes straddling the 64-byte vector block and the scalar tail.
    for size in (0, 1, 63, 64, 65, 127, 128, 129, 1000, 4096, 1 << 17):
        data = _random_mixed_bytes(rng, size)
        # Vector (default) build via the loader.
        got = loader.segment_dedupe(data)
        # Scalar build, raw call.
        cap = max(len(data), 1)
        buf = np.frombuffer(data, dtype=np.uint8) if data else np.zeros(1, np.uint8)
        occ = np.empty(cap, np.int32)
        ustart = np.empty(cap, np.int64)
        ulen = np.empty(cap, np.int32)
        ucplen = np.empty(cap, np.int32)
        n_uniq = ctypes.c_int64(0)
        n_occ = lib.wp_segment_dedupe(
            buf.ctypes.data_as(ctypes.c_void_p),
            len(data),
            occ.ctypes.data_as(ctypes.c_void_p),
            ustart.ctypes.data_as(ctypes.c_void_p),
            ulen.ctypes.data_as(ctypes.c_void_p),
            ucplen.ctypes.data_as(ctypes.c_void_p),
            ctypes.byref(n_uniq),
        )
        nu = n_uniq.value
        assert n_occ == got[0].shape[0], f"size={size}"
        np.testing.assert_array_equal(occ[:n_occ], got[0])
        np.testing.assert_array_equal(ustart[:nu], got[1])
        np.testing.assert_array_equal(ulen[:nu], got[2])
        np.testing.assert_array_equal(ucplen[:nu], got[3])


_SAN_DRIVER = r"""
import os
import numpy as np
from wordpiece_tpu.runtime import loader
from wordpiece_tpu.core.vocab import parse_vocab

assert loader.available(), "sanitizer .so failed to load"
rng = np.random.default_rng(3)
words = ["alpha", "x", "beta9", "-", ".", "пр", "中文", "mixed", "zq"]
corpus = " ".join(words[int(rng.integers(0, len(words)))] for _ in range(200_000)).encode()
vocab = parse_vocab(["[UNK]", "alpha", "x", "beta", "##9", "-", ".", "п",
                     "##р", "中", "文", "mixed", "z", "##q"])

# One-shot and mt segmentation.
occ, us, ul, ucp = loader.segment_dedupe(corpus)
# Session across chunks (arena growth, table rehash).
s = loader.DedupeSession()
outs = []
begin = 0
while begin < len(corpus):
    end = min(len(corpus), begin + 300_000)
    while end < len(corpus) and corpus[end] != 0x20:
        end += 1
    outs.append(s.segment(corpus[begin:end]))
    begin = end
s.close()
# Scalar encode + unit encode + expand + verify round trip.
h = loader.VocabHandle(vocab)
ids = h.encode(loader.decode_utf8(corpus[:100_000]))
k = min(500, us.shape[0])
flat, counts = h.encode_units(corpus, us[:k], ul[:k], int(ucp[:k].sum()))
offs = np.zeros(k + 1, np.int64)
np.cumsum(counts.astype(np.int64), out=offs[1:])
exp = loader.expand(occ[occ < k], flat, offs)
mats, b_of, r_of = loader.bucket_fill(corpus, us, ul, ucp, [7, 15, 31, 127])
for b, m in enumerate(mats):
    if m.shape[0]:
        emit = np.full(m.shape, -2, np.int32)
        emit[:, 0] = 0
        loader.verify_emit(m, emit, vocab, 0)
ends = loader.split_whitespace(loader.decode_utf8(corpus), 8)
print("SAN_DRIVER_OK", len(ids), int(exp.shape[0]), list(ends[:2]))
"""


@pytest.mark.slow
def test_sanitizer_run():
    """Run the native-touching paths under ASan+UBSan in a subprocess
    (LD_PRELOAD of libasan into a stock python)."""
    _build("sanitize", "libwordpiece_host_san.so")
    asan = subprocess.run(
        ["g++", "-print-file-name=libasan.so"], capture_output=True, text=True
    ).stdout.strip()
    if not asan or not os.path.exists(asan):
        pytest.skip("libasan not found")
    env = dict(os.environ)
    env.update(
        WORDPIECE_TPU_NATIVE_SO="libwordpiece_host_san.so",
        LD_PRELOAD=asan,
        # Python itself leaks by design; we want memory errors, not leaks.
        ASAN_OPTIONS="detect_leaks=0,abort_on_error=1",
        JAX_PLATFORMS="cpu",
    )
    r = subprocess.run(
        [sys.executable, "-c", _SAN_DRIVER],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, f"sanitizer run failed:\n{r.stdout[-2000:]}\n{r.stderr[-4000:]}"
    assert "SAN_DRIVER_OK" in r.stdout
    assert "AddressSanitizer" not in r.stderr
    assert "runtime error" not in r.stderr  # UBSan
