"""Public API surface tests: encode/decode/external/CLI parity.

Covers the reference surface (src/word_piece.hpp): in-memory encode,
file encode, encodeExternal batch streaming (boundary snapping), decode
with ## re-prefixing, and the CLI runner modes.
"""

import os

import numpy as np
import pytest

import wordpiece_tpu as wp
from wordpiece_tpu.core.oracle import encode_oracle_str
from wordpiece_tpu.core.vocab import parse_vocab


@pytest.fixture
def tmp_corpus(tmp_path):
    text = ("the quick brown fox jumps over the lazy dog " * 50).strip()
    tf = tmp_path / "corpus.txt"
    tf.write_text(text)
    vf = tmp_path / "vocab.txt"
    vf.write_text(
        "\n".join(
            ["[UNK]", "the", "quick", "brown", "fox", "jump", "##s", "over", "lazy", "dog"]
        )
    )
    return str(tf), str(vf), text


def test_encode_in_memory():
    ids = wp.fast.encode("the dog", ["[UNK]", "the", "dog"])
    assert ids == [1, 2]


def test_encode_from_files(tmp_corpus):
    tf, vf, text = tmp_corpus
    ids = wp.fast.encode(tf, vf)
    vocab = parse_vocab(open(vf).read().splitlines())
    assert ids == encode_oracle_str(text, vocab)


def test_linear_matches_fast_api(tmp_corpus):
    tf, vf, _ = tmp_corpus
    assert wp.linear.encode(tf, vf) == wp.fast.encode(tf, vf)


def test_encode_external_matches_in_memory(tmp_path, tmp_corpus):
    tf, vf, text = tmp_corpus
    out = str(tmp_path / "ids.txt")
    # Tiny budget to force many batches (boundary snapping must keep the
    # id stream identical, src/fast.cpp:203-211).
    wp.fast.encode_external(tf, vf, out, memory_limit=64)
    got = [int(x) for x in open(out).read().split()]
    assert got == wp.fast.encode(tf, vf)


def test_decode_roundtrip():
    vocab_lines = ["[UNK]", "the", "##re", "fox", "-"]
    vocab = parse_vocab(vocab_lines)
    toks = wp.fast.decode(vocab, [1, 2, 3, 4])
    assert toks == ["the", "##re", "fox", "-"]
    # Out-of-range / negative ids are skipped with a warning.
    assert wp.fast.decode(vocab, [-1, 99, 1]) == ["the"]


def test_write_ids_file(tmp_path):
    out = str(tmp_path / "w.txt")
    wp.write_ids_file(out, [1, 2, -1])
    assert open(out).read() == "1 2 -1 "


def test_cli_fast(tmp_corpus, tmp_path, capsys):
    from wordpiece_tpu.cli import main

    tf, vf, text = tmp_corpus
    out = str(tmp_path / "cli.txt")
    main(["fast", tf, vf, "--out-file", out])
    cap = capsys.readouterr()
    assert "Total ids" in cap.out
    ids = [int(x) for x in open(out).read().split()]
    assert ids == wp.fast.encode(tf, vf)


def test_cli_external(tmp_corpus, tmp_path):
    from wordpiece_tpu.cli import main

    tf, vf, _ = tmp_corpus
    out = str(tmp_path / "ext.txt")
    main(["fast-external", tf, vf, "--out-file", out, "--memory-limit-mb", "50"])
    ids = [int(x) for x in open(out).read().split()]
    assert ids == wp.fast.encode(tf, vf)


def test_cli_memory_floor(tmp_corpus):
    from wordpiece_tpu.cli import main

    tf, vf, _ = tmp_corpus
    with pytest.raises(SystemExit):
        main(["fast-external", tf, vf, "--out-file", "/tmp/x", "--memory-limit-mb", "10"])


def test_engines_agree_on_multilingual():
    text = "токенизация это круто 中文 mixed-case"
    vocab = ["[UNK]", "ток", "##ени", "##за", "##ция", "это", "крут", "##о",
             "中", "文", "mixed", "case", "-", "##case"]
    fast_ids = wp.fast.encode(text, vocab)
    linear_ids = wp.linear.encode(text, vocab)
    v = parse_vocab(vocab)
    want = encode_oracle_str(text, v)
    assert fast_ids == want
    assert linear_ids == want


def test_encode_external_checkpoint_resume(tmp_path):
    """Kill mid-run -> resume from the last completed batch, identical
    output to an uninterrupted run (incl. truncating a partial batch)."""
    import json

    from wordpiece_tpu import api
    from wordpiece_tpu.bench.corpus import make_corpus, make_vocab

    data = make_corpus(400_000)
    tf = tmp_path / "c.txt"
    vf = tmp_path / "v.txt"
    tf.write_bytes(data)
    vf.write_text("\n".join(make_vocab(data, vocab_size=2000)))
    ref_out = tmp_path / "ref.txt"
    api.fast.encode_external(str(tf), str(vf), str(ref_out), 50_000_000)
    assert not (tmp_path / "ref.txt.state").exists()  # removed on success

    # Batches of ~100KB (memory_limit/2): simulate a crash after batch 2
    # by writing its state, appending GARBAGE (a partial batch 3), then
    # resuming.
    out = tmp_path / "out.txt"
    api.fast.encode_external(str(tf), str(vf), str(out), 200_000)
    full = out.read_text()
    # Re-run to capture the state after two batches: run once more but
    # stop early by replaying the loop manually -- simplest faithful way:
    # take the final run, cut the output at an arbitrary point, and write
    # a matching state checkpoint for a 2-batch prefix.
    api.fast.encode_external(str(tf), str(vf), str(out), 200_000)
    # Find batch boundaries the same way the encoder does.
    max_batch = 200_000 // 2
    begin = 0
    for _ in range(2):
        batch = max_batch
        while batch < len(data) - begin and not data[begin + batch - 1 : begin + batch].isspace():
            batch += 1
        begin += batch
    prefix_ids = api.fast.encode(data[:begin], "\n".join(make_vocab(data, vocab_size=2000)).splitlines())
    prefix_text = "".join(f"{i} " for i in list(prefix_ids))
    out.write_text(prefix_text + "999999 12345 ")  # partial batch garbage
    vocab = parse_vocab(make_vocab(data, vocab_size=2000))
    state = {
        "text_size": len(data),
        "memory_limit": 200_000,
        "engine": "fast",
        "offset": begin,
        "out_bytes": len(prefix_text),
        "vocab_fp": api._vocab_fingerprint(vocab),
        "text_fp": api._file_fingerprint(str(tf)),
    }
    (tmp_path / "out.txt.state").write_text(json.dumps(state))
    api.fast.encode_external(str(tf), str(vf), str(out), 200_000, resume=True)
    assert out.read_text() == full == ref_out.read_text()
    assert not (tmp_path / "out.txt.state").exists()

    # A resume with a DIFFERENT vocabulary must refuse the checkpoint and
    # restart from scratch (never append ids inconsistent with the prefix).
    out.write_text(prefix_text + "999999 ")
    state["vocab_fp"] = state["vocab_fp"] ^ 1
    (tmp_path / "out.txt.state").write_text(json.dumps(state))
    api.fast.encode_external(str(tf), str(vf), str(out), 200_000, resume=True)
    assert out.read_text() == full  # fresh run, garbage gone


def test_encoder_cache_is_bounded():
    from wordpiece_tpu import api

    api._ENCODER_CACHE.clear()
    for k in range(api._ENCODER_CACHE_MAX + 3):
        wp.fast.encode("a b", ["[UNK]", "a", "b", f"tok{k}"])
    assert len(api._ENCODER_CACHE) <= api._ENCODER_CACHE_MAX


def test_make_encoder_cache_requires_fast():
    from wordpiece_tpu import api

    v = parse_vocab(["[UNK]", "a"])
    with pytest.raises(ValueError):
        api.make_encoder(v, engine="linear", cache=True)


def test_n_threads_plumbing(monkeypatch):
    from wordpiece_tpu.runtime import loader

    monkeypatch.setenv("WORDPIECE_TPU_THREADS", "7")
    assert loader.n_threads() == 7
    loader.set_n_threads(3)
    assert loader.n_threads() == 3
    loader.set_n_threads(None)
    assert loader.n_threads() == 7
    monkeypatch.delenv("WORDPIECE_TPU_THREADS")
    assert loader.n_threads() >= 1
