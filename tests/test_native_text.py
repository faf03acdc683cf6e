"""Native (C) WordPiece tokenizer vs the Python implementation.

native/wordpiece.c handles the ASCII fast path; it must be BIT-IDENTICAL to
data/tokenizer.py on that domain (the Python path itself is HF-parity-tested
in test_data.py). Non-ASCII input must fall back to Python, never mis-encode.
"""

import random
import string

import pytest

from d2r_tpu.data.native_text import (
    load_native_vocab,
    native_available,
    native_encode,
)
from d2r_tpu.data.tokenizer import BertTokenizer

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native tokenizer lib not buildable")


def _write_vocab(tmp_path, extra=()):
    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "the", "quick", "brown", "fox", "##es", "jump", "##ing",
             "over", "lazy", "dog", ",", "!", ".", "un", "##aff", "##able",
             "a", "##a", "##b", "ab", "b", "c", "##c", "hello", "world",
             "12", "##3", "1", "##2", "#", "##", "###"] + list(extra)
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(words) + "\n")
    return str(p)


def _python_ids(tok, text, max_ids):
    return tok.convert_tokens_to_ids(tok.tokenize(text))[:max_ids]


class TestNativeAgreement:
    CASES = [
        "The quick brown Foxes jumping over the lazy dog!",
        "unaffable hello, world.",
        "",
        "   ",
        "!!!...,,",
        "ab",
        "aab abab abc",
        "a" * 99,
        "a" * 100,
        "a" * 101,          # > max_chars_per_word -> [UNK]
        "123 12 3",
        "#hash ## ###tags",
        "tab\tand\nnewline\rsplits",
        "ctrl\x01chars\x7fdropped",
        "xyzzy unknown-word",
        "MiXeD CaSe LOWERCASING",
    ]

    def test_cases_match_python(self, tmp_path):
        path = _write_vocab(tmp_path)
        tok = BertTokenizer.from_vocab_file(path)
        h = load_native_vocab(path)
        assert h is not None
        for text in self.CASES:
            for max_ids in (62, 3, 1, 0):
                got = native_encode(h, text, max_ids)
                assert got is not None, text
                assert got == _python_ids(tok, text, max_ids), \
                    (text, max_ids)

    def test_fuzz_random_ascii(self, tmp_path):
        path = _write_vocab(tmp_path)
        tok = BertTokenizer.from_vocab_file(path)
        h = load_native_vocab(path)
        rng = random.Random(0)
        alphabet = string.ascii_letters + string.digits + \
            string.punctuation + " \t\n"
        for _ in range(300):
            n = rng.randrange(0, 60)
            text = "".join(rng.choice(alphabet) for _ in range(n))
            got = native_encode(h, text, 62)
            assert got == _python_ids(tok, text, 62), repr(text)

    def test_non_ascii_falls_back_to_python(self, tmp_path):
        path = _write_vocab(tmp_path)
        tok = BertTokenizer.from_vocab_file(path)
        h = load_native_vocab(path)
        for text in ["café au lait", "日本語", "naïve", "emoji 🐕", "nul\x00byte"]:
            assert native_encode(h, text, 62) is None
            # the public entry still answers, via Python
            assert tok.encode_ids(text, 62) == _python_ids(tok, text, 62)

    def test_duplicate_vocab_lines_keep_last_id(self, tmp_path):
        p = tmp_path / "vocab.txt"
        p.write_text("[UNK]\nfoo\nfoo\nbar\n")
        tok = BertTokenizer.from_vocab_file(str(p))
        h = load_native_vocab(str(p))
        assert native_encode(h, "foo bar", 8) == \
            _python_ids(tok, "foo bar", 8) == [2, 3]

    def test_encode_ids_equals_legacy_sequence(self, tmp_path):
        """The BertTokenizer.encode_ids contract (used by encode_text) must
        equal tokenize -> truncate -> convert for both code paths."""
        path = _write_vocab(tmp_path)
        tok = BertTokenizer.from_vocab_file(path)
        text = "the quick unaffable foxes jumping over the lazy dog !"
        for max_ids in (62, 5, 2):
            tokens = tok.tokenize(text)[:max_ids]
            assert tok.encode_ids(text, max_ids) == \
                tok.convert_tokens_to_ids(tokens)
