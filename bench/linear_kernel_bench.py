#!/usr/bin/env python
"""Linear-engine device microbenchmark: where the batch program's time goes.

Builds the exact device inputs the production LinearEncoder ships for one
batch of the bench corpus's unique-unit set, then times, as separate jit
programs with dependent chaining (the bench/kernel_bench.py pattern —
device-resident inputs, one fetch at the end, single-run latency cancels):

  sort_only    — key build + nk stable radix passes over nm elements
  sort_lcp     — sorts + rank scatter + key-local clamped LCP
  sweeps_match — who-gather + features + 4 surviving-slot sweeps + match
  commit       — pointer-doubling greedy commit + compaction
  full_batch   — the production _linear_batch_device (everything fused)

The full program is the real per-batch device cost; the sub-stage rows
attribute it.  Usage: python bench/linear_kernel_bench.py [--size MB]
[--lang en] [--runs N]
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
    ap.add_argument("--runs", type=int, default=9)
    ap.add_argument("--lang", default="en")
    ap.add_argument(
        "--vocab", default="bert", choices=["bert", "synthetic"],
    )
    args = ap.parse_args()

    from functools import partial

    import jax
    import jax.numpy as jnp

    from wordpiece_tpu.bench.corpus import make_corpus, make_vocab, make_vocab_bert
    from wordpiece_tpu.core.vocab import parse_vocab
    from wordpiece_tpu.engine_linear import LinearEncoder, _bucket, _linear_batch_device
    from wordpiece_tpu.ops import commit as commit_ops
    from wordpiece_tpu.ops import text_features
    from wordpiece_tpu.ops.linear_match import match_from_sa
    from wordpiece_tpu.runtime import loader

    size_bytes = int(args.size * 1_000_000)
    corpus = make_corpus(size_bytes, lang=args.lang)
    vocab_lines = (
        make_vocab_bert(corpus) if args.vocab == "bert" else make_vocab(corpus)
    )
    vocab = parse_vocab(vocab_lines)
    enc = LinearEncoder(vocab)
    m = enc._merge
    assert m is not None, "merge tables unavailable for this vocab"
    bits, per, nk = m["bits"], m["per"], m["nk"]
    max_len = enc.max_len
    unk_id = int(vocab.unk_token_id)

    # First batch of the production path: join the unique units.
    occ, us, ul, ucl = loader.segment_dedupe(corpus)
    nu = us.shape[0]
    csum = np.zeros(nu + 1, dtype=np.int64)
    np.cumsum(ucl.astype(np.int64) + 1, out=csum[1:])
    batch_cps = min(enc.LINEAR_BATCH_TARGET, enc.MAX_TEXT_BATCH)
    v = int(np.searchsorted(csum, csum[0] + batch_cps, side="right")) - 1
    v = min(max(v, 1), nu)
    cap = int(csum[v] - csum[0] - 1)
    cps = loader.join_units_cps(corpus, us, ul, 0, v, cap)
    n = int(cps.shape[0])

    # Replicate _encode_batch's host prep exactly.
    np_ = _bucket(n)
    pad_sym = (1 << bits) - 1
    x_host = np.full(np_, pad_sym, dtype=np.int32)
    x_host[:n] = m["lut"][np.clip(cps, 0, 0x110000)]
    cps_pad_np = np.full(np_, 32, dtype=np.int32)
    cps_pad_np[:n] = cps

    x_dev = jax.device_put(jnp.asarray(x_host))
    cps_dev = jax.device_put(jnp.asarray(cps_pad_np))
    n_dev = jnp.int32(n)
    nv = int(m["tok_len"].shape[0])
    nm = np_ + nv

    meta = {
        "n_units_batch": int(v),
        "n_units_total": int(nu),
        "joined_cps": n,
        "np_": int(np_),
        "nv_pad": nv,
        "nm": nm,
        "bits": bits, "per": per, "nk": nk, "max_len": int(max_len),
        "batches_per_encode": int(np.ceil(nu / max(v, 1))),
    }
    print(json.dumps({"meta": meta}), flush=True)

    # --- stage programs (mirror _linear_batch_device's internals) -------
    def build_keys(x_dense, tok_keys):
        x_ext = jnp.concatenate(
            [x_dense, jnp.full((nk * per,), pad_sym, x_dense.dtype)]
        )
        keys = []
        for j in range(nk):
            k = jnp.zeros(np_, jnp.int32)
            for t in range(per):
                off = j * per + t
                k = (k << bits) | x_ext[off : off + np_]
            keys.append(jnp.concatenate([k, tok_keys[j]]))
        return jnp.stack(keys)

    def radix(keys):
        idx = jnp.arange(nm, dtype=jnp.int32)

        def body(j, perm):
            d = keys[nk - 1 - j][perm]
            _, perm = jax.lax.sort((d, perm), num_keys=1, is_stable=True)
            return perm

        return jax.lax.fori_loop(0, nk, body, idx)

    def key_lcp(keys, sa):
        idx = jnp.arange(nm, dtype=jnp.int32)
        maskv = jnp.int32((1 << bits) - 1)
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
                eq = ((kj >> shift) & maskv) == ((nxt >> shift) & maskv)
                alive = alive & eq
                lcp = lcp + alive
                counted += 1
        return jnp.where(idx < nm - 1, lcp, 0)

    @jax.jit
    def sort_only(x_dense, tok_keys):
        return radix(build_keys(x_dense, tok_keys))

    @jax.jit
    def sort_lcp(x_dense, tok_keys):
        keys = build_keys(x_dense, tok_keys)
        sa = radix(keys)
        rank = jnp.zeros(nm, jnp.int32).at[sa].set(jnp.arange(nm, dtype=jnp.int32))
        return sa, rank, key_lcp(keys, sa)

    import sys as _sys
    print("precompute: sort_lcp...", file=_sys.stderr, flush=True)
    sa0, rank0, lcp0 = sort_lcp(x_dev, m["tok_keys"])
    sa0 = jax.device_put(sa0)
    rank0 = jax.device_put(rank0)
    lcp0 = jax.device_put(lcp0)

    @jax.jit
    def sweeps_match(sa, rank, lcp, cps_pad, n_text, tok_len, tok_id, tok_kind):
        is_tok = sa >= np_
        tj = jnp.clip(sa - np_, 0, nv - 1)
        who_len = jnp.where(is_tok, tok_len[tj], 0)
        who_id = jnp.where(is_tok, tok_id[tj], -1)
        who_kind = jnp.where(is_tok, tok_kind[tj], -1)
        feats = text_features.compute_features(cps_pad, n_text, max_len)
        return match_from_sa(
            rank, lcp, who_len, who_id, who_kind, n_text,
            feats.window, feats.wp, max_len=max_len,
        )

    print("precompute: sweeps_match...", file=_sys.stderr, flush=True)
    best_id0, best_len0 = sweeps_match(
        sa0, rank0, lcp0, cps_dev, n_dev,
        m["tok_len"], m["tok_id"], m["tok_kind"],
    )
    best_id0 = jax.device_put(best_id0)
    best_len0 = jax.device_put(best_len0)

    @jax.jit
    def commit_only(best_id, best_len, cps_pad, n_text):
        feats = text_features.compute_features(cps_pad, n_text, max_len)
        return commit_ops.commit_with_positions(
            best_id, best_len, feats, n_text, unk_id=unk_id
        )

    def chain(fn, n_runs):
        """Dependent-chain timing: each run's input perturbed by the
        previous output; ONE fetch at the end."""
        t0 = time.perf_counter()
        carry = jnp.int32(0)
        for _ in range(n_runs):
            carry = fn(carry)
        _ = int(carry)
        return time.perf_counter() - t0

    def time_stage(name, fn):
        print(f"stage {name}: compiling...", file=_sys.stderr, flush=True)
        chain(fn, 1)  # compile
        t1 = min(chain(fn, 1) for _ in range(3))
        tn = chain(fn, args.runs)
        per_run = (tn - t1) / (args.runs - 1)
        row = {
            "stage": name,
            "per_run_ms": round(per_run * 1e3, 3),
            "per_encode_ms": round(per_run * 1e3 * meta["batches_per_encode"], 3),
        }
        print(json.dumps(row), flush=True)
        return per_run

    time_stage(
        "sort_only",
        lambda c: sort_only(x_dev.at[0].add(c % 2), m["tok_keys"])[0] * 0,
    )
    time_stage(
        "sort_lcp",
        lambda c: sort_lcp(x_dev.at[0].add(c % 2), m["tok_keys"])[2][0] * 0,
    )
    time_stage(
        "sweeps_match",
        lambda c: sweeps_match(
            sa0.at[0].add(c % 2 * 0), rank0, lcp0, cps_dev, n_dev,
            m["tok_len"], m["tok_id"], m["tok_kind"],
        )[1][0]
        * 0,
    )
    time_stage(
        "commit",
        lambda c: commit_only(
            best_id0.at[0].add(c % 2 * 0), best_len0, cps_dev, n_dev
        )[2]
        * 0,
    )
    time_stage(
        "full_batch",
        lambda c: _linear_batch_device(
            x_dev.at[0].add(c % 2), cps_dev, n_dev,
            m["tok_keys"], m["tok_len"], m["tok_id"], m["tok_kind"],
            bits=bits, per=per, nk=nk, max_len=max_len, unk_id=unk_id,
        )[2]
        * 0,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
