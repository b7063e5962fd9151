"""Golden conformance against the REAL reference C++ binaries.

tests/golden/*.npz hold token-id streams produced by the reference's own
`runner` binary (built from the unmodified sources at /root/reference via
tests/golden/build_reference.sh; its `tests` binary passes 29,986 checks
under that build).  Each golden run asserted reference fast == linear
(the reference's differential guarantee, reference tests/tests.cpp:90-97)
before being stored.  Here every engine of THIS framework — and the
native scalar oracle everything else diffs against — must reproduce those
streams byte-for-byte on the regenerated corpora.

Regenerate goldens with: python tests/golden/make_golden.py
"""

import glob
import hashlib
import os

import numpy as np
import pytest

from wordpiece_tpu.bench.corpus import make_corpus, make_vocab
from wordpiece_tpu.core import unicode as uni
from wordpiece_tpu.core.vocab import parse_vocab
from wordpiece_tpu.runtime import loader

pytestmark = pytest.mark.skipif(not loader.available(), reason="native runtime required")

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
GOLDEN_FILES = sorted(glob.glob(os.path.join(GOLDEN_DIR, "golden_*.npz")))
assert GOLDEN_FILES, "no golden files committed under tests/golden/"


def _sha(b: bytes) -> str:
    return hashlib.sha256(b).hexdigest()


_cache: dict = {}


def _load(path):
    """(corpus, vocab, golden_ids), with input-fingerprint verification."""
    if path not in _cache:
        z = np.load(path)
        lang = str(z["lang"])
        corpus = make_corpus(int(z["corpus_bytes"]), lang=lang)
        vocab_lines = make_vocab(corpus, vocab_size=int(z["vocab_size"]))
        vocab_txt = "\n".join(vocab_lines).encode("utf-8")
        assert _sha(corpus) == str(z["corpus_sha"]), (
            f"{os.path.basename(path)}: regenerated corpus diverges from the "
            "one the reference binaries encoded — regenerate the goldens")
        assert _sha(vocab_txt) == str(z["vocab_sha"]), (
            f"{os.path.basename(path)}: regenerated vocab diverges — "
            "regenerate the goldens")
        _cache[path] = (corpus, parse_vocab(vocab_lines), z["ids"].astype(np.int32))
    return _cache[path]


@pytest.mark.parametrize("path", GOLDEN_FILES, ids=os.path.basename)
def test_native_oracle_matches_reference(path):
    """The native scalar oracle — the root of this repo's differential
    test tree — against the real C++ binaries."""
    corpus, vocab, want = _load(path)
    got = loader.VocabHandle(vocab).encode(uni.decode_utf8(corpus))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("path", GOLDEN_FILES, ids=os.path.basename)
def test_word_engine_matches_reference(path):
    """The flagship fast engine (dedupe session + device kernels)."""
    from wordpiece_tpu.engine_word import WordEncoder

    corpus, vocab, want = _load(path)
    got = WordEncoder(vocab).encode_bytes(corpus)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize(
    "path",
    [p for p in GOLDEN_FILES if "_v8000" in p],
    ids=os.path.basename,
)
def test_linear_engine_matches_reference(path):
    """The linear (suffix-ordering) engine; v8000 configs keep the
    device-program shapes CPU-test sized."""
    from wordpiece_tpu.engine_linear import LinearEncoder

    corpus, vocab, want = _load(path)
    enc = LinearEncoder(vocab)
    got = enc.encode_codepoints(uni.decode_utf8(corpus).astype(np.int32))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize(
    "path",
    [p for p in GOLDEN_FILES if "en_v8000" in p or "zh_v8000" in p],
    ids=os.path.basename,
)
def test_stream_engine_matches_reference(path):
    """The pure-XLA stream engine."""
    from wordpiece_tpu.engine import FastEncoder

    corpus, vocab, want = _load(path)
    cps = uni.decode_utf8(corpus).astype(np.int32)
    got = FastEncoder(vocab).encode_codepoints(cps)
    np.testing.assert_array_equal(got, want)
