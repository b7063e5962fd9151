#!/usr/bin/env python
"""Device-kernel-only microbenchmark (the MFU/speed-of-light proxy).

Times `word_match_commit_compact` (the fast engine's Pallas program) on a
device-RESIDENT unique-unit set, excluding host segmentation and the
host<->device tunnel:

 - inputs are device_put once, outside the timed region;
 - the program is run N times back-to-back, each run's input perturbed
   by a dependency on the previous run's output scalar (so runs cannot
   be elided or reordered), with ONE tiny fetch at the end;
 - per-run device time = (t_N - t_1) / (N - 1): the single-run tunnel
   round-trip latency cancels out.

Reports device bytes/s over the corpus bytes the unit set represents
(the fair e2e-comparable denominator) and over the packed lanes the
kernel actually touches (the kernel-utilization view).

Usage: python bench/kernel_bench.py [--size MB] [--runs N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=float, default=10.0)
    ap.add_argument("--runs", type=int, default=11)
    ap.add_argument("--lang", default="en")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from wordpiece_tpu.bench.corpus import make_corpus, make_vocab
    from wordpiece_tpu.core.vocab import parse_vocab
    from wordpiece_tpu.engine_word import STRIDES, WIDTHS, WordEncoder, pack_groups
    from wordpiece_tpu.ops.word_kernel_pallas import word_match_commit_compact
    from wordpiece_tpu.runtime import loader

    size_bytes = int(args.size * 1_000_000)
    corpus = make_corpus(size_bytes, lang=args.lang)
    vocab = parse_vocab(make_vocab(corpus))
    enc = WordEncoder(vocab)

    # The corpus's full unique-unit set (what one encode ships overall).
    occ, us, ul, ucl = loader.segment_dedupe(corpus)
    mats, bucket_of, row_of = loader.bucket_fill(corpus, us, ul, ucl, list(WIDTHS))
    max_len = enc._statics["max_len"]

    packed, strides = [], []
    lanes_total = 0
    n_units = 0
    for b, mat in enumerate(mats):
        if mat.shape[0] == 0:
            continue
        pk = pack_groups(mat, STRIDES[b], max_len, narrow=True)
        packed.append(jax.device_put(jnp.asarray(pk)))
        strides.append(STRIDES[b])
        lanes_total += pk.shape[0] * 128
        n_units += mat.shape[0]
    cap = 1 << max(13, (2 * n_units + 1023).bit_length())

    def run_chain(n_runs: int) -> float:
        """Time n_runs dependent kernel executions ending in ONE fetch."""
        t0 = time.perf_counter()
        carry = jnp.int32(0)
        for _ in range(n_runs):
            # Perturb one pad lane by carry%1 (always 0, but XLA cannot
            # know): forces each run to depend on the previous output.
            bump = carry % 2  # 0 in practice; data dependency regardless
            ins = tuple(
                p.at[0, 0].add(bump.astype(p.dtype)) for p in packed
            )
            out = word_match_commit_compact(
                ins,
                enc._tab_k1,
                enc._tab_k2,
                enc._tab_id,
                strides=tuple(strides),
                block_rows=256,
                cap=cap,
                interpret=False,
                **enc._statics,
            )
            carry = out[0] * 0
        _ = int(carry)  # one tunnel round trip
        return time.perf_counter() - t0

    run_chain(1)  # compile
    t1 = min(run_chain(1) for _ in range(3))
    tn = run_chain(args.runs)
    per_run = (tn - t1) / (args.runs - 1)
    roundtrip = t1 - per_run

    results = [
        {
            "metric": f"fast_kernel_device_bytes_per_s_{int(args.size)}MB_{args.lang}",
            "value": round(size_bytes / per_run, 1),
            "unit": "bytes/s (corpus-equivalent, device program only)",
            "per_run_ms": round(per_run * 1e3, 3),
            "units": int(n_units),
            "packed_lanes": int(lanes_total),
            "lane_bytes_per_s": round(lanes_total * 4 / per_run, 1),
            "tunnel_roundtrip_ms": round(roundtrip * 1e3, 1),
        }
    ]
    for r in results:
        print(json.dumps(r))
    return 0


if __name__ == "__main__":
    sys.exit(main())
