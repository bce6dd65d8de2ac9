"""Native C++ WordPiece parity + speed sanity vs the Python implementation."""

import os
import time

import numpy as np
import pytest

from bpx.data.tokenization import WordPieceTokenizer, build_tokenizer
from bpx.data.vocab import Vocab

VOCAB_WORDS = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
               "the", "cat", "sat", "on", "mat", "un", "##aff", "##able",
               "##s", "##ing", "movie", "plot", "drama", ",", ".", "!",
               "a", "b", "c"]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(VOCAB_WORDS))
    return str(p)


def test_crlf_vocab_reads_identically(tmp_path):
    """A vocab.txt with Windows line endings must index the same in the
    Python loader as in the native one (which strips \r)."""
    p = tmp_path / "vocab_crlf.txt"
    p.write_bytes("\r\n".join(VOCAB_WORDS).encode())
    v = Vocab.from_bert_vocab_file(str(p))
    assert v.itos[:5] == VOCAB_WORDS[:5]
    assert v.stoi["[UNK]"] == 1 and v.stoi["the"] == 5


def test_native_builds_and_matches_python(vocab_file):
    tokenizer, vocab = build_tokenizer(vocab_file)
    from bpx.data.native import NativeWordPieceTokenizer
    if not isinstance(tokenizer, NativeWordPieceTokenizer):
        pytest.skip("native toolchain unavailable")
    py = WordPieceTokenizer(Vocab.from_bert_vocab_file(vocab_file))
    texts = [
        "The cats sat on the mat.",
        "unaffable movies, drama plots!",
        "THE CAT!!! sat... unaffables",
        "zzz unknown wordzz",
        "a b c " * 50,
        "",
        # control chars are DELETED (joining neighbours), except \t\n\r
        # which separate — both paths must agree byte-for-byte
        "the\x01cat sat",        # \x01 deleted: "thecat" -> [UNK]
        "the\tcat\nsat\rmat",
        "the\x0bcat\x0csat",    # \v/\f are control (deleted), not space
    ]
    for text in texts:
        for max_len in [4, 16, 128]:
            assert tokenizer.encode(text, max_len) == py.encode(text, max_len), \
                (text, max_len)


def test_native_falls_back_on_unicode(vocab_file):
    tokenizer, _ = build_tokenizer(vocab_file)
    py = WordPieceTokenizer(Vocab.from_bert_vocab_file(vocab_file))
    text = "the cat saß on the mät"   # non-ASCII
    assert tokenizer.encode(text, 32) == py.encode(text, 32)


def test_native_is_faster(vocab_file):
    tokenizer, _ = build_tokenizer(vocab_file)
    from bpx.data.native import NativeWordPieceTokenizer
    if not isinstance(tokenizer, NativeWordPieceTokenizer):
        pytest.skip("native toolchain unavailable")
    py = tokenizer.fallback
    text = "the cat sat on the mat unaffable drama movie plot . " * 40

    def bench(enc, n=30):
        t0 = time.perf_counter()
        for _ in range(n):
            enc.encode(text, 512)
        return time.perf_counter() - t0

    t_native = bench(tokenizer)
    t_py = bench(py)
    # the C path should win comfortably; keep the bound loose for CI noise
    assert t_native < t_py, (t_native, t_py)
