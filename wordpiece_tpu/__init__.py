"""wordpiece_tpu: a TPU-native WordPiece tokenization framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
reference C++ library (gleb-kov/wordpiece): the two fastest known
WordPiece encoding algorithms (Fast rolling-hash MaxMatch and Linear
suffix-array), exact reference semantics, data-parallel scaling over
device meshes, out-of-core streaming, decode, CLI and benchmark harness.

Public surface:
    wordpiece_tpu.fast.encode(text, vocab)
    wordpiece_tpu.fast.decode(vocab, ids)
    wordpiece_tpu.fast.encode_external(text_file, vocab_file, out, limit)
    wordpiece_tpu.linear.encode(...)
    wordpiece_tpu.Vocabulary / parse_vocab / read_vocab_file
"""

import os as _os

# Persistent XLA compilation cache: kernel compiles through the remote
# TPU compiler take tens of seconds; cache them across processes.  The
# directory is keyed per machine (utils/cache_key.py) so XLA:CPU AOT
# results compiled on one machine type are never loaded on another
# (mismatched machine types can SIGILL).
# NOT enabled on the CPU backend: XLA:CPU stamps tuning pseudo-features
# (+prefer-no-scatter/-gather) into every AOT entry and then warns about
# a machine-feature mismatch on EVERY load — even same-machine ones —
# and a stale entry is a real SIGILL hazard.  CPU compiles are fast;
# only the remote-TPU compiler needs the cache.
# Opt out with WORDPIECE_TPU_NO_COMPILE_CACHE=1.
# The cache is enabled only when JAX_PLATFORMS EXPLICITLY names a
# non-CPU platform: an unset JAX_PLATFORMS silently resolves to the CPU
# backend on CPU-only hosts, which would re-enable the exact AOT hazard
# above.  Probing jax.default_backend() here would initialise the
# backend at import time (seconds through the tunnel), so an explicit
# env var is the gate; TPU deployments set JAX_PLATFORMS.
_plat = _os.environ.get("JAX_PLATFORMS", "")
if (
    not _os.environ.get("WORDPIECE_TPU_NO_COMPILE_CACHE")
    and _plat
    and "cpu" not in _plat
):
    try:
        import jax as _jax

        from .utils.cache_key import cache_dir as _mk_cache_dir

        _cache_dir = _mk_cache_dir(
            _os.environ.get(
                "JAX_COMPILATION_CACHE_DIR",
                _os.path.join(_os.path.expanduser("~"), ".cache", "wordpiece_tpu_xla"),
            )
        )
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from .api import fast, linear, make_encoder, write_ids_file
from .core.vocab import Vocabulary, parse_vocab, read_vocab_file

__all__ = [
    "fast",
    "linear",
    "make_encoder",
    "write_ids_file",
    "Vocabulary",
    "parse_vocab",
    "read_vocab_file",
]

__version__ = "0.1.0"
