"""Public API: the TPU-native counterpart of the reference's word_piece.hpp.

Reference surface (src/word_piece.hpp:1-38):
  word_piece::fast::encode(text, vocab) / encode(text_file, vocab_file)
  word_piece::fast::decode(vocab_file, ids)
  word_piece::fast::encodeExternal(text_file, vocab_file, out_file, limit)
  word_piece::linear::{encode, encodeExternal}

Here both engines share one encode path; `fast` uses the rolling-hash
match kernel and `linear` the suffix-array match kernel.  Output id
streams are identical (the reference asserts this too, tests.cpp:90-97).

Encoder instances cache the compiled program and the replicated vocab
index; the module-level helpers mirror the reference's one-shot calls.
"""

from __future__ import annotations

import os
from typing import Iterable, Sequence

import numpy as np

from .core import unicode as uni
from .core.oracle import encode_oracle
from .core.vocab import Vocabulary, parse_vocab, read_vocab_file
from .engine import FastEncoder

# Bounded LRU of module-namespace encoders.  Entries hold the encoder
# (which holds the vocab — so id(vocab) keys stay valid while cached);
# evicting the LRU entry releases packed tables and native handles, so
# long sessions over many vocabularies don't accumulate them.
from collections import OrderedDict

_ENCODER_CACHE: OrderedDict[tuple, object] = OrderedDict()
_ENCODER_CACHE_MAX = 8


def _as_vocab(vocab: Sequence[str] | Vocabulary | str) -> Vocabulary:
    if isinstance(vocab, Vocabulary):
        return vocab
    if isinstance(vocab, str):
        return read_vocab_file(vocab)
    return parse_vocab(list(vocab))


def _text_codepoints(text: str | bytes) -> np.ndarray:
    raw = text.encode("utf-8") if isinstance(text, str) else bytes(text)
    return uni.decode_utf8(raw).astype(np.int32)


def _read_text(text_file: str) -> bytes:
    with open(text_file, "rb") as f:
        return f.read()


def _vocab_fingerprint(v: Vocabulary) -> int:
    """Cheap content fingerprint of a vocabulary (resume guard)."""
    import zlib

    fp = zlib.crc32(np.ascontiguousarray(v.flat, np.uint32).tobytes())
    return zlib.crc32(np.ascontiguousarray(v.offsets, np.int64).tobytes(), fp)


def _file_fingerprint(path: str) -> int:
    """Cheap corpus fingerprint: crc32 of the first and last 64KB."""
    import zlib

    fp = 0
    with open(path, "rb") as tf:
        fp = zlib.crc32(tf.read(1 << 16), fp)
        sz = os.path.getsize(path)
        if sz > (1 << 16):
            tf.seek(max(0, sz - (1 << 16)))
            fp = zlib.crc32(tf.read(1 << 16), fp)
    return fp


def write_ids_file(path: str, ids: Iterable[int]) -> None:
    """writeToFile (src/utils.cpp:30-35): ids as 'id ' text."""
    with open(path, "w") as f:
        for i in ids:
            f.write(f"{int(i)} ")


class _EngineNamespace:
    """Shared implementation for the fast/linear namespaces."""

    def __init__(self, engine_name: str):
        self._engine_name = engine_name

    def _encoder(self, vocab: Vocabulary):
        key = (self._engine_name, id(vocab))
        enc = _ENCODER_CACHE.get(key)
        if enc is None:
            enc = make_encoder(vocab, engine=self._engine_name)
            _ENCODER_CACHE[key] = enc
            while len(_ENCODER_CACHE) > _ENCODER_CACHE_MAX:
                _ENCODER_CACHE.popitem(last=False)
        else:
            _ENCODER_CACHE.move_to_end(key)
        return enc

    def encode(self, text: str | bytes, vocab: Sequence[str] | Vocabulary | str) -> list[int]:
        """encode(text, vocab) / encode(text_file, vocab_file).

        WARNING — data-dependent dispatch: mirroring the reference's two
        overloads (word_piece.hpp:12,14) in one Python entry point, a
        `str` that names an EXISTING file is read as a file; any other
        input is encoded literally.  A literal text that happens to
        collide with a file path would silently encode the file — use
        ``encode_text`` / ``encode_file`` to pin the interpretation.
        """
        if isinstance(text, str) and os.path.exists(text):
            return self.encode_file(text, vocab)
        return self.encode_text(text, vocab)

    def encode_text(self, text: str | bytes, vocab: Sequence[str] | Vocabulary | str) -> list[int]:
        """Encode `text` literally (never interpreted as a path)."""
        raw = text.encode("utf-8") if isinstance(text, str) else bytes(text)
        return self._encode_raw(raw, vocab)

    def encode_file(self, text_file: str, vocab: Sequence[str] | Vocabulary | str) -> list[int]:
        """Encode the contents of `text_file` (must exist)."""
        return self._encode_raw(_read_text(text_file), vocab)

    def _encode_raw(self, raw: bytes, vocab: Sequence[str] | Vocabulary | str) -> list[int]:
        v = _as_vocab(vocab)
        enc = self._encoder(v)
        if hasattr(enc, "encode_bytes"):
            return enc.encode_bytes(raw).tolist()
        return enc.encode_codepoints(uni.decode_utf8(raw).astype(np.int32)).tolist()

    def encode_external(
        self,
        text_file: str,
        vocab_file: str | Vocabulary,
        out_file: str,
        memory_limit: int,
        *,
        resume: bool = False,
    ) -> None:
        """Out-of-core batch loop (src/fast.cpp:189-220, linear /20 variant).

        Batches are extended so that each ends on a space character,
        guaranteeing no token crosses a batch boundary
        (starts_with_space check, src/fast.cpp:205-207).  The corpus is
        mmap'd (like the reference's boost mapped_file) so peak memory is
        one batch, not the file.

        Beyond the reference: batch-granular CHECKPOINT/RESUME.  After
        every completed batch a sidecar ``out_file + ".state"`` records
        (input offset, output bytes); ``resume=True`` truncates a
        partially-written batch and continues from the last checkpoint.
        The state file is removed on successful completion.
        """
        import json
        import mmap
        import os

        v = _as_vocab(vocab_file)
        enc = self._encoder(v)

        # Cheap content fingerprints guarding resume: a changed vocab (or
        # an edited same-size corpus) must refuse to append ids after a
        # prefix produced under different inputs.
        vocab_fp = _vocab_fingerprint(v)
        text_fp = _file_fingerprint(text_file)
        # Reference budgets: /2 for fast (src/fast.cpp:195), /20 for
        # linear "because of SAIS" (src/linear.cpp:349).
        divisor = 20 if self._engine_name == "linear" else 2
        max_batch = max(memory_limit // divisor, 1)
        size = os.path.getsize(text_file)
        state_path = out_file + ".state"

        begin = 0
        out_mode = "w"
        if resume and os.path.exists(state_path) and os.path.exists(out_file):
            try:
                with open(state_path) as f:
                    st = json.load(f)
            except (OSError, ValueError):
                st = None
            if (
                st
                and st.get("text_size") == size
                and st.get("memory_limit") == memory_limit
                and st.get("engine") == self._engine_name
                and st.get("vocab_fp") == vocab_fp
                and st.get("text_fp") == text_fp
            ):
                begin = int(st["offset"])
                with open(out_file, "r+") as fout:
                    fout.truncate(int(st["out_bytes"]))
                out_mode = "a"

        if size == 0:
            open(out_file, out_mode).close()
            if os.path.exists(state_path):
                os.remove(state_path)
            return

        with open(text_file, "rb") as f, mmap.mmap(
            f.fileno(), 0, access=mmap.ACCESS_READ
        ) as data, open(out_file, out_mode) as fout:
            out_bytes = fout.tell() if out_mode == "a" else 0
            while begin < size:
                remaining = size - begin
                if remaining > max_batch:
                    batch = max_batch
                    while batch < remaining and not uni.starts_with_space(
                        data[begin + batch - 1 : begin + batch + 3]
                    ):
                        batch += 1
                else:
                    batch = remaining
                piece = data[begin : begin + batch]
                if hasattr(enc, "encode_bytes"):
                    ids = enc.encode_bytes(piece)
                else:
                    ids = enc.encode_codepoints(uni.decode_utf8(piece).astype(np.int32))
                text = "".join(f"{i} " for i in ids.tolist())
                fout.write(text)
                fout.flush()
                out_bytes += len(text)
                begin += batch
                with open(state_path, "w") as sf:
                    json.dump(
                        {
                            "text_size": size,
                            "memory_limit": memory_limit,
                            "engine": self._engine_name,
                            "offset": begin,
                            "out_bytes": out_bytes,
                            "vocab_fp": vocab_fp,
                            "text_fp": text_fp,
                        },
                        sf,
                    )
        os.remove(state_path)

    def decode(self, vocab_file: str | Vocabulary, ids: Sequence[int]) -> list[str]:
        """ids -> token strings (src/fast.cpp:165-187).

        Suffix tokens are re-prefixed with "##"; out-of-range and
        malformed ids are skipped with a warning (the reference's
        bounds check has an off-by-one, `> size` at src/fast.cpp:171,
        which we correct to `>=`).
        """
        import sys

        v = _as_vocab(vocab_file)
        out: list[str] = []
        for i in ids:
            i = int(i)
            if i < 0 or i >= v.size:
                print(f"no token {i}", file=sys.stderr)
                continue
            if v.is_malformed[i]:
                print("trying to access malformed token", file=sys.stderr)
                continue
            s = uni.encode_utf8(v.word(i)).decode("utf-8", errors="replace")
            out.append(s if v.is_prefix[i] else "##" + s)
        return out


def make_encoder(vocab: Vocabulary, engine: str = "fast", *, cache: bool = False):
    """cache=True (fast engine only) keeps a vocabulary-lifetime unit
    cache across encode calls — see WordEncoder.  Requesting a cache on
    an engine that cannot honor it is an error, not a silent downgrade."""
    if cache and engine != "fast":
        raise ValueError(f"cache=True is only supported by engine='fast', not {engine!r}")
    if engine == "fast":
        # Production fast path: deduped-unit word engine (needs the
        # native host runtime); falls back to the streaming device path.
        from .runtime import loader

        if loader.available():
            from .engine_word import WordEncoder

            # Production policy "auto": the device path is primary, but
            # each blocking fetch runs under a deadline on a worker
            # thread; a fetch that times out or raises a device/link
            # error is RESCUED by the host oracle (identical ids), and
            # after repeated rescues the link is latched dead so later
            # chunks skip dispatch.  Rescue is strictly an exception
            # path, never a compute policy — see WordEncoder.__init__'s
            # docstring for the full policy and its measurements.
            return WordEncoder(vocab, cache=cache, device_role="auto")
        if cache:
            raise RuntimeError(
                "cache=True requires the native host runtime (WordEncoder); "
                "it is unavailable and the FastEncoder fallback has no unit cache"
            )
        return FastEncoder(vocab)
    if engine == "fast-stream":
        return FastEncoder(vocab)
    if engine == "host":
        from .runtime import loader as _loader

        class _HostEncoder:
            def __init__(self, v):
                self.vocab = v
                self._h = _loader.VocabHandle(v)

            def encode_codepoints(self, cps):
                return self._h.encode(cps)

        return _HostEncoder(vocab)
    if engine == "linear":
        from .engine_linear import LinearEncoder

        return LinearEncoder(vocab)
    if engine == "oracle":
        class _OracleEncoder:
            def __init__(self, v):
                self.vocab = v

            def encode_codepoints(self, cps):
                return np.asarray(encode_oracle(cps, self.vocab), dtype=np.int32)

        return _OracleEncoder(vocab)
    raise ValueError(f"unknown engine: {engine}")


fast = _EngineNamespace("fast")
linear = _EngineNamespace("linear")
