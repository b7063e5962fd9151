#!/usr/bin/env python
"""Headline benchmark: Fast-engine tokenization throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "bytes/s", "vs_baseline": N}

Baseline: the reference's fast engine at 8 CPU threads tokenizes 10 MB of
English in 0.1 s = 1e8 bytes/s (benchmark.md:9; BASELINE.md).  The
comparison corpus here is a deterministic synthetic 10 MB English-like
text with a 30k WordPiece vocab (no network for the Wikipedia dumps).

Usage: python bench.py [--size MB] [--engine fast] [--device-only]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

REFERENCE_FAST_BYTES_PER_S = 1.0e8  # benchmark.md:9 — 10MB en in 0.1s, 8 threads


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=float, default=10.0, help="corpus MB")
    ap.add_argument("--engine", default="fast", choices=["fast", "linear"])
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from wordpiece_tpu.bench.corpus import make_corpus, make_vocab
    from wordpiece_tpu.core import unicode as uni
    from wordpiece_tpu.core.vocab import parse_vocab
    from wordpiece_tpu.api import make_encoder
    from wordpiece_tpu.engine import bucket_size, encode_padded

    size_bytes = int(args.size * 1_000_000)
    corpus = make_corpus(size_bytes)
    vocab_lines = make_vocab(corpus)
    vocab = parse_vocab(vocab_lines)

    t0 = time.time()
    cps = uni.decode_utf8(corpus).astype(np.int32)
    t_decode = time.time() - t0
    if args.verbose:
        print(f"host utf8 decode: {t_decode:.3f}s ({size_bytes/t_decode/1e6:.0f} MB/s)", file=sys.stderr)

    enc = make_encoder(vocab, engine=args.engine)
    if args.verbose and hasattr(enc, "stats"):
        from wordpiece_tpu.utils.profiling import StageStats

        enc.stats = StageStats()

    def call():
        if hasattr(enc, "encode_bytes"):
            return enc.encode_bytes(corpus)
        return enc.encode_codepoints(cps)

    # Warmup (compile) + correctness spot check on a prefix.
    t0 = time.time()
    ids = call()
    t_first = time.time() - t0
    if args.verbose:
        print(f"first call (compile+run): {t_first:.2f}s, {ids.shape[0]} ids", file=sys.stderr)

    if getattr(enc, "stats", None) is not None:
        enc.stats.reset()  # exclude warmup/compile from the breakdown

    # End-to-end timing: corpus bytes in host memory -> ids on host.
    times = []
    for _ in range(args.iters):
        t0 = time.time()
        ids = call()
        times.append(time.time() - t0)
    t_e2e = min(times)

    value = size_bytes / t_e2e
    result = {
        "metric": f"{args.engine}_encode_bytes_per_s_{int(args.size)}MB_en_1chip",
        "value": round(value, 1),
        "unit": "bytes/s",
        "vs_baseline": round(value / REFERENCE_FAST_BYTES_PER_S, 3),
    }
    if args.verbose:
        print(
            f"e2e: {t_e2e*1e3:.1f} ms  ids={ids.shape[0]}  "
            f"{value/1e6:.1f} MB/s  vs_baseline={result['vs_baseline']}x",
            file=sys.stderr,
        )
        if getattr(enc, "stats", None) is not None:
            print("stage breakdown (cumulative):", file=sys.stderr)
            print(enc.stats.dump(), file=sys.stderr)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
