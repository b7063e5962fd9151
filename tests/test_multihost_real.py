"""REAL multi-process multihost execution: two OS processes, a localhost
jax.distributed coordinator, 4 virtual CPU devices per process (8-device
global mesh spanning "hosts").

SURVEY.md §4 prescribes multi-host logic tested without a pod via JAX
multi-process simulation; the degenerate 1-process tests in
test_multihost.py cover the host pipeline, and THIS file covers the
branches only a real process group executes: jax.distributed.initialize,
multihost_utils.process_allgather agreement, cross-process
make_array_from_process_local_data, addressable-shard readback, and the
lockstep chunk alignment for uneven shards.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from wordpiece_tpu.runtime import loader

pytestmark = pytest.mark.skipif(
    not loader.available(), reason="native runtime required"
)

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _vocab_lines():
    return (
        ["[PAD]", "[UNK]", "the", "quick", "brown", "fox", "jump", "##s",
         "over", "lazy", "dog", "an", "and", "a", "-", ",", "."]
        + [c for c in "abcdefghijklmnopqrstuvwxyz"]
        + ["##" + c for c in "abcdefghijklmnopqrstuvwxyz"]
    )


@pytest.mark.slow  # ~80 s: spawns two real jax.distributed processes.
# The virtual-mesh multihost coverage (test_multihost.py) stays in the
# default tier; this real 2-process run is the slow-tier capstone.
def test_two_process_multihost(tmp_path):
    rng = np.random.default_rng(23)
    words = [
        "".join(rng.choice(list("abcdefghij"), size=int(rng.integers(1, 10))))
        for _ in range(12_000)
    ]
    corpus = (" ".join(words) + " the quick brown fox jumps over the lazy dog").encode()
    corpus_path = tmp_path / "corpus.txt"
    corpus_path.write_bytes(corpus)
    vocab_path = tmp_path / "vocab.txt"
    vocab_path.write_text("\n".join(_vocab_lines()))

    # Uneven scenario shards: process 0 gets ~150 KB (several tiny
    # pipeline chunks), process 1 a few words (one chunk, mostly
    # already-seen units) — chunk counts differ until lockstep aligns.
    big = (" ".join(words[:9000])).encode()
    tiny = b"the quick dog and a fox"
    uneven_paths = [str(tmp_path / "u0.txt"), str(tmp_path / "u1.txt")]
    open(uneven_paths[0], "wb").write(big)
    open(uneven_paths[1], "wb").write(tiny)

    port = _free_port()
    out_base = str(tmp_path / "out")
    n_procs = 2
    procs = []
    for pid in range(n_procs):
        cfg = {
            "coord": f"127.0.0.1:{port}",
            "n_procs": n_procs,
            "pid": pid,
            "corpus": str(corpus_path),
            "vocab": str(vocab_path),
            "out": out_base,
            "small_chunk": 40_000,
            "uneven": uneven_paths,
        }
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["JAX_PLATFORMS"] = "cpu"
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(
            subprocess.Popen(
                [sys.executable, _WORKER, json.dumps(cfg)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
        )
    outs = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process worker timed out (collective deadlock?)")
        outs.append((p.returncode, stdout, stderr))
    for rc, stdout, stderr in outs:
        assert rc == 0, f"worker failed rc={rc}\n{stderr.decode()[-4000:]}"

    metas = []
    for pid in range(n_procs):
        with open(out_base + f".meta{pid}.json") as f:
            metas.append(json.load(f))
    for pid, m in enumerate(metas):
        assert m["process_count"] == 2
        assert m["process_index"] == pid
        assert m["n_local_devices"] == 4
        assert m["n_global_devices"] == 8
        assert m["backend"] == "cpu"

    # Scenario 1: concatenated per-process id streams == whole-corpus
    # oracle; psum'd global total agrees on every process.
    from wordpiece_tpu.core.vocab import parse_vocab

    vocab = parse_vocab(_vocab_lines())
    want = loader.VocabHandle(vocab).encode(loader.decode_utf8(corpus))
    got = np.concatenate(
        [np.load(out_base + f".ids{pid}.npy") for pid in range(n_procs)]
    )
    assert np.array_equal(got, want), "2-process shard concat diverges from oracle"
    assert metas[0]["total"] == metas[1]["total"] == want.shape[0]

    # Scenario 2 (uneven lockstep): same invariant on the uneven shards.
    full2 = open(uneven_paths[0], "rb").read() + b" " + open(uneven_paths[1], "rb").read()
    want2 = loader.VocabHandle(vocab).encode(loader.decode_utf8(full2))
    got2 = np.concatenate(
        [np.load(out_base + f".ids2_{pid}.npy") for pid in range(n_procs)]
    )
    assert np.array_equal(got2, want2), "uneven lockstep concat diverges from oracle"
    assert metas[0]["total2"] == metas[1]["total2"] == want2.shape[0]
