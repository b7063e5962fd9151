#!/usr/bin/env python
"""Headline benchmark: tokenization throughput on one chip.

Prints one JSON line per metric; the PRIMARY metric (fast engine, 10 MB
English) is always the LAST line:
  {"metric": ..., "value": N, "unit": "bytes/s", "vs_baseline": N}

Baselines are the reference's published numbers (benchmark.md:9-14;
BASELINE.md): fast tokenizes 10 MB in 0.1 s en/ja/zh and 0.2 s ru at 8
CPU threads; linear takes 0.8 s for 10 MB en.  The comparison corpus is
a deterministic synthetic text per language with a bert-base-cased-shaped
28,996-entry WordPiece vocab (no network for the Wikipedia dumps or the
real vocab.txt; --vocab synthetic selects the pre-r04 30k generator).

Before timing, every engine's output on a ~100 KB prefix is diffed
against the native scalar oracle — a garbage id stream fails the bench
instead of printing a throughput number.

Usage: python bench.py [--size MB] [--engine fast|linear]
                       [--iters N] [--no-secondary] [--verbose]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

# Reference seconds per 10 MB (benchmark.md:9-14) -> bytes/s baselines.
BASELINES = {
    ("fast", "en"): 1.0e8,
    ("fast", "ru"): 0.5e8,
    ("fast", "ja"): 1.0e8,
    ("fast", "zh"): 1.0e8,
    ("linear", "en"): 1.25e7,
    ("linear", "ru"): 2.0e7,
    ("linear", "ja"): 3.33e7,
    ("linear", "zh"): 2.5e7,
}


def _check_vs_oracle(enc, vocab, corpus: bytes, verbose: bool) -> None:
    """Diff the engine's ids on a ~100 KB space-aligned prefix against the
    native scalar oracle; raises on the first divergence."""
    from wordpiece_tpu.runtime import loader

    if not loader.available():  # pragma: no cover
        return
    end = min(len(corpus), 100_000)
    while end < len(corpus) and corpus[end] != 0x20:
        end += 1
    prefix = corpus[:end]
    got = np.asarray(enc.encode_bytes(prefix))
    cps = loader.decode_utf8(prefix)
    want = loader.VocabHandle(vocab).encode(cps)
    if got.shape[0] != want.shape[0] or not np.array_equal(got, want):
        bad = int(np.argmax(got[: want.shape[0]] != want[: got.shape[0]])) if min(
            got.shape[0], want.shape[0]
        ) else 0
        raise AssertionError(
            f"bench correctness check failed: engine ids diverge from the "
            f"native oracle on a {end}-byte prefix "
            f"(counts {got.shape[0]} vs {want.shape[0]}, first diff near #{bad})"
        )
    if verbose:
        print(
            f"correctness: {got.shape[0]} prefix ids match the native oracle",
            file=sys.stderr,
        )


def run_one(
    engine: str, lang: str, size_mb: float, iters: int, verbose: bool,
    vocab_kind: str = "bert",
) -> dict:
    from wordpiece_tpu.api import make_encoder
    from wordpiece_tpu.bench.corpus import make_corpus, make_vocab, make_vocab_bert
    from wordpiece_tpu.core.vocab import parse_vocab

    size_bytes = int(size_mb * 1_000_000)
    corpus = make_corpus(size_bytes, lang=lang)
    # Default workload vocab: bert-base-cased-shaped 28,996 entries (the
    # reference benches the real bert-base-cased, README.md:47);
    # --vocab synthetic keeps the pre-r04 30k generator for continuity.
    vocab_lines = (
        make_vocab_bert(corpus) if vocab_kind == "bert" else make_vocab(corpus)
    )
    vocab = parse_vocab(vocab_lines)
    enc = make_encoder(vocab, engine=engine)
    if verbose and hasattr(enc, "stats"):
        from wordpiece_tpu.utils.profiling import StageStats

        enc.stats = StageStats()

    _check_vs_oracle(enc, vocab, corpus, verbose)

    # Warmup (compile).
    t0 = time.time()
    ids = enc.encode_bytes(corpus)
    t_first = time.time() - t0
    if verbose:
        print(
            f"[{engine}/{lang}] first call (compile+run): {t_first:.2f}s, "
            f"{ids.shape[0]} ids",
            file=sys.stderr,
        )
    if getattr(enc, "stats", None) is not None:
        enc.stats.reset()  # exclude warmup/compile from the breakdown

    times = []
    for _ in range(iters):
        t0 = time.time()
        ids = enc.encode_bytes(corpus)
        times.append(time.time() - t0)
    t_e2e = min(times)
    value = size_bytes / t_e2e
    base = BASELINES.get((engine, lang), BASELINES[("fast", "en")])
    result = {
        "metric": f"{engine}_encode_bytes_per_s_{int(size_mb)}MB_{lang}_1chip",
        "value": round(value, 1),
        "unit": "bytes/s",
        "vs_baseline": round(value / base, 3),
    }
    # Device-path provenance: a run whose chunks were rescued by the host
    # oracle prints a correct-looking number at host-oracle speed.  That
    # must NEVER pass silently (round 4 shipped a 120x regression this
    # way): any rescue anywhere in this run — oracle check, warmup, or
    # timed iterations — marks the metric degraded.
    fallbacks = int(getattr(enc, "device_fallbacks", 0))
    if fallbacks or hasattr(enc, "device_fallbacks"):
        result["device_fallbacks"] = fallbacks
    if fallbacks:
        result["degraded"] = True
        print(
            f"# DEGRADED: [{engine}/{lang}] {fallbacks} device fetch(es) "
            f"rescued by the host oracle "
            f"(last cause: {getattr(enc, 'last_rescue_cause', None)}); "
            f"the throughput above does NOT measure the device path",
            file=sys.stderr,
        )
    if verbose:
        print(
            f"[{engine}/{lang}] e2e: {t_e2e*1e3:.1f} ms  ids={ids.shape[0]}  "
            f"{value/1e6:.1f} MB/s  vs_baseline={result['vs_baseline']}x",
            file=sys.stderr,
        )
        if getattr(enc, "stats", None) is not None:
            print("stage breakdown (cumulative):", file=sys.stderr)
            print(enc.stats.dump(), file=sys.stderr)
    return result


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=float, default=10.0, help="corpus MB")
    ap.add_argument("--engine", default="fast", choices=["fast", "linear"])
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument(
        "--no-secondary",
        action="store_true",
        help="skip the secondary metrics (linear + ru/ja/zh)",
    )
    ap.add_argument(
        "--budget", type=float, default=420.0,
        help="soft wall-clock budget (s) for the secondary metrics",
    )
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument(
        "--vocab", default="bert", choices=["bert", "synthetic"],
        help="workload vocab: bert-base-cased-shaped 29k (default) or the "
        "pre-r04 synthetic 30k",
    )
    args = ap.parse_args()

    # Persistent compile cache: wordpiece_tpu/__init__.py configures the
    # machine-keyed cache (JAX_COMPILATION_CACHE_DIR or
    # ~/.cache/wordpiece_tpu_xla) at import; setting a different dir here
    # would just be overridden by that import inside run_one, so the
    # package default is the single source of truth — the driver re-runs
    # this across rounds and identical programs skip compilation.
    import wordpiece_tpu  # noqa: F401  (configures the compile cache)

    t_start = time.time()
    results = []
    # PRIMARY FIRST: it must run on a fresh process (no allocator or
    # device-state wear from earlier runs — BENCH_r03's primary ran last,
    # after four secondary benches, and regressed 19% vs r02 where the
    # secondaries were budget-skipped).  It is still PRINTED last (the
    # driver parses the last line).
    primary = run_one(args.engine, "en", args.size, args.iters, args.verbose, args.vocab)
    # Secondary metrics: best-effort — a failure prints a diagnostic but
    # does not sink the primary metric.
    if not args.no_secondary:
        # Cheapest first: the fast/<lang> runs reuse the fast engine's
        # compiled programs and finish in seconds; linear compiles a
        # fresh SA program per shape and can eat most of the budget — it
        # must not starve the multilingual rows (BENCH_r02 lost them that
        # way).
        secondary = [
            ("fast", "ru"), ("fast", "ja"), ("fast", "zh"),
            ("linear", "en"), ("linear", "ru"), ("linear", "ja"), ("linear", "zh"),
        ]
        for engine, lang in secondary:
            if engine == args.engine and lang == "en":
                continue
            if time.time() - t_start > args.budget:
                print(
                    f"# secondary budget exhausted; skipping {engine}/{lang}",
                    file=sys.stderr,
                )
                continue
            try:
                # min-of-3: a single multi-second tunnel stall inside one
                # timed iteration must not cap the row (observed: a
                # stall spanning both of a 2-iteration run's encodes
                # printed 0.27x for a healthy engine).
                results.append(run_one(engine, lang, args.size, max(3, args.iters // 2), args.verbose, args.vocab))
            except Exception as e:  # pragma: no cover - diagnostics only
                print(f"# secondary {engine}/{lang} failed: {e}", file=sys.stderr)

    results.append(primary)
    for r in results:
        print(json.dumps(r))
    if primary.get("degraded"):
        print(
            "# BENCH FAILED: primary metric is degraded (device path was "
            "rescued by the host oracle)",
            file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
