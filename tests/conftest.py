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
