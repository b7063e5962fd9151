"""Test harness config: run JAX on a virtual 8-device CPU mesh.

Must set XLA flags before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment pins JAX_PLATFORMS=axon (remote TPU tunnel); tests must
# run on the virtual 8-device CPU mesh regardless.
jax.config.update("jax_platforms", "cpu")

# Persistent XLA:CPU compile cache for the TEST tier only.  The package
# deliberately leaves the cache off on the CPU backend (wordpiece_tpu/
# __init__.py: XLA:CPU stamps tuning pseudo-features into AOT entries and
# warns about a machine-feature mismatch on every load) — but the test
# suite's XLA:CPU compiles (sort programs, 8-device mesh programs) cost
# minutes per run, so here the trade flips: enable the cache in a
# machine-keyed directory (utils/cache_key.py guards the cross-machine
# SIGILL hazard) and silence the known-noisy mismatch warning.
if not os.environ.get("WORDPIECE_TPU_NO_COMPILE_CACHE"):
    import logging

    from wordpiece_tpu.utils.cache_key import cache_dir as _mk_cache_dir

    _cpu_cache = _mk_cache_dir(
        os.path.join(
            os.path.expanduser("~"), ".cache", "wordpiece_tpu_xla_cpu_tests"
        )
    )
    jax.config.update("jax_compilation_cache_dir", _cpu_cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    class _DropFeatureMismatch(logging.Filter):
        def filter(self, record):  # pragma: no cover - log plumbing
            return "machine feature" not in record.getMessage()

    logging.getLogger("jax._src.compilation_cache").addFilter(
        _DropFeatureMismatch()
    )
    logging.getLogger("jax._src.compiler").addFilter(_DropFeatureMismatch())

import numpy as np
import pytest

from wordpiece_tpu.core import unicode as uni
from wordpiece_tpu.core.vocab import parse_vocab


@pytest.fixture
def bert_like_vocab():
    """A small, deterministic vocab with prefix/suffix/special/punct tokens."""
    lines = [
        "[PAD]",
        "[UNK]",
        "the",
        "##e",
        "##he",
        "t",
        "th",
        "quick",
        "##ick",
        "qu",
        "-",
        ",",
        ".",
        "a",
        "##a",
        "##n",
        "an",
        "and",
    ]
    return parse_vocab(lines)


def rand_text(rng, n, alphabet="abcdefghijklmnopqrstuvwxyz"):
    return "".join(rng.choice(list(alphabet)) for _ in range(n))
