#!/usr/bin/env python
"""Generate golden id files from the REAL reference C++ binaries.

Builds (if needed) the unmodified reference sources via
build_reference.sh, runs its `runner` in both `fast` and `linear` modes
on the deterministic bench corpora (1 MB per language, two vocab sizes),
asserts fast == linear (the reference's own differential guarantee,
reference tests/tests.cpp:90-97), and stores the ids + input fingerprints
as golden_<lang>_v<size>.npz for tests/test_golden_reference.py.

Usage: python tests/golden/make_golden.py [--refbuild DIR]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import subprocess
import sys
import tempfile

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)

CORPUS_BYTES = 1_000_000
# (lang, vocab_size): en/zh get a second, smaller vocab for diversity.
CONFIGS = [
    ("en", 30000), ("en", 8000),
    ("ru", 30000),
    ("ja", 30000),
    ("zh", 30000), ("zh", 8000),
]


def sha(b: bytes) -> str:
    return hashlib.sha256(b).hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--refbuild", default="/tmp/refbuild")
    args = ap.parse_args()

    runner = os.path.join(args.refbuild, "runner")
    if not os.path.exists(runner):
        subprocess.run(
            [os.path.join(HERE, "build_reference.sh"), args.refbuild], check=True
        )

    from wordpiece_tpu.bench.corpus import make_corpus, make_vocab

    for lang, vsize in CONFIGS:
        corpus = make_corpus(CORPUS_BYTES, lang=lang)
        vocab_lines = make_vocab(corpus, vocab_size=vsize)
        vocab_txt = "\n".join(vocab_lines).encode("utf-8")
        with tempfile.TemporaryDirectory() as td:
            cpath = os.path.join(td, "c.txt")
            vpath = os.path.join(td, "v.txt")
            with open(cpath, "wb") as f:
                f.write(corpus)
            with open(vpath, "wb") as f:
                f.write(vocab_txt)
            ids = {}
            for mode in ("fast", "linear"):
                out = os.path.join(td, f"ids_{mode}.txt")
                r = subprocess.run(
                    [runner, mode, cpath, vpath, "2", out],
                    capture_output=True, check=True, timeout=600,
                )
                with open(out) as f:
                    ids[mode] = np.array(f.read().split(), dtype=np.int32)
                print(f"{lang}/v{vsize} {mode}: {ids[mode].shape[0]} ids "
                      f"({r.stdout.decode().strip()})")
        assert np.array_equal(ids["fast"], ids["linear"]), (
            f"reference fast != linear on {lang}/v{vsize}")
        np.savez_compressed(
            os.path.join(HERE, f"golden_{lang}_v{vsize}.npz"),
            ids=ids["fast"],
            corpus_sha=sha(corpus),
            vocab_sha=sha(vocab_txt),
            corpus_bytes=CORPUS_BYTES,
            lang=lang,
            vocab_size=vsize,
        )
    print("golden files written to", HERE)
    return 0


if __name__ == "__main__":
    sys.exit(main())
