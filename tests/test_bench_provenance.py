"""The benchmark must be unable to report a host-rescued run silently.

Round 4 shipped a 120x regression with rc=0 because every device fetch
timed out, the host oracle rescued each chunk (correct ids), and bench.py
never looked at device_fallbacks.  These tests pin the fix: a broken
device fetch yields a LOUD result — "degraded": true, nonzero
device_fallbacks, and main() returning nonzero for a degraded primary.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_run_one_marks_degraded_on_broken_fetch(monkeypatch):
    import jax.errors

    import bench
    from wordpiece_tpu.engine_word import WordEncoder

    def broken_fetch(self, handle):
        raise jax.errors.JaxRuntimeError("simulated tunnel stall")

    monkeypatch.setattr(WordEncoder, "_fetch_buckets", broken_fetch)
    result = bench.run_one("fast", "en", 0.3, iters=1, verbose=False)
    assert result["degraded"] is True
    assert result["device_fallbacks"] >= 1
    assert result["value"] > 0  # throughput still recorded, just flagged


def test_run_one_healthy_reports_zero_fallbacks():
    import bench

    result = bench.run_one("fast", "en", 0.3, iters=1, verbose=False)
    assert result.get("degraded") is not True
    assert result.get("device_fallbacks", 0) == 0


def test_main_fails_on_degraded_primary(monkeypatch):
    import jax.errors

    import bench
    from wordpiece_tpu.engine_word import WordEncoder

    def broken_fetch(self, handle):
        raise jax.errors.JaxRuntimeError("simulated tunnel stall")

    monkeypatch.setattr(WordEncoder, "_fetch_buckets", broken_fetch)
    monkeypatch.setattr(
        sys, "argv", ["bench.py", "--size", "0.3", "--iters", "1", "--no-secondary"]
    )
    assert bench.main() != 0
