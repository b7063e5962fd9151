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
