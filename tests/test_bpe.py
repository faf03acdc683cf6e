"""Byte-level BPE tokenizer tests (d2r_tpu/data/bpe.py).

Agreement with HF's slow ``RobertaTokenizer`` is pinned on the same local
asset pair (vocab.json + merges.txt) over deterministic fuzz text — ASCII
words/punctuation/numbers/whitespace plus non-ASCII bytes — so the
from-scratch BPE loop, the GPT-2 pre-tokenizer, and the byte->unicode map
all match the production semantics RoBERTa checkpoints were trained with
(BASELINE config 4; the reference itself is WordPiece-only,
ref: processor/dataset.py:20).
"""

import json
import random

import pytest

from d2r_tpu.data.bpe import RobertaBPETokenizer, bytes_to_unicode
from d2r_tpu.data.tokenizer import load_tokenizer

SPECIALS = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3, "<mask>": 4}
MERGES = [
    ("Ġ", "t"), ("h", "e"), ("Ġt", "he"), ("l", "l"), ("Ġ", "a"),
    ("i", "n"), ("Ġa", "nd"), ("n", "d"), ("e", "r"), ("Ġ", "w"),
    ("o", "r"), ("Ġw", "or"), ("1", "2"), ("12", "3"), ("'", "s"),
    ("!", "!"), (".", "."), ("Ġ", "Ġ"),
]


def _write_assets(tmp_path):
    """A coherent tiny BPE vocab: all 256 byte symbols + every merge
    product + specials, ids dense."""
    vocab = dict(SPECIALS)
    for ch in bytes_to_unicode().values():
        vocab.setdefault(ch, len(vocab))
    for a, b in MERGES:
        vocab.setdefault(a + b, len(vocab))
    (tmp_path / "vocab.json").write_text(json.dumps(vocab), encoding="utf-8")
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in MERGES) + "\n",
        encoding="utf-8")
    return tmp_path


def _fuzz_texts(n=200, seed=7):
    rng = random.Random(seed)
    words = ["the", "and", "world", "hello", "a", "in", "tender", "123",
             "12345", "it's", "don't", "!!", "...", "wOrLd", "Ťhé", "héllo",
             "éé", "\U0001f600"]
    texts = []
    for _ in range(n):
        k = rng.randint(1, 8)
        sep = rng.choice([" ", "  ", " \t "])
        texts.append(sep.join(rng.choice(words) for _ in range(k))
                     + rng.choice(["", " ", "!", " .."]))
    # targeted edge cases
    texts += ["", " ", "   ", "\n\nthe", "the", " the", "a'sb", "123the",
              "the123 and!!world", "\t", "it's 123... the  end"]
    return texts


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    return _write_assets(tmp_path_factory.mktemp("bpe"))


@pytest.fixture(scope="module")
def ours(assets):
    tok = RobertaBPETokenizer.from_pretrained_dir(str(assets))
    assert tok is not None
    return tok


def test_specials(ours):
    assert (ours.cls_token_id, ours.pad_token_id,
            ours.sep_token_id, ours.unk_token_id) == (0, 1, 2, 3)


def test_basic_merges(ours):
    # "Ġthe" assembles via Ġ+t, h+e, Ġt+he
    assert ours.tokenize(" the") == ["Ġthe"]
    assert ours.tokenize("the and") == ["t", "he", "Ġand"]


def test_encode_ids_truncates(ours):
    ids = ours.encode_ids("the and the and the", 3)
    assert len(ids) == 3
    assert ids == ours.convert_tokens_to_ids(
        ours.tokenize("the and the and the"))[:3]


def test_load_tokenizer_resolves_bpe(assets):
    tok = load_tokenizer(str(assets), allow_hash_fallback=False)
    assert isinstance(tok, RobertaBPETokenizer)


def test_agreement_with_hf_slow_tokenizer(assets, ours):
    transformers = pytest.importorskip("transformers")
    hf = transformers.RobertaTokenizer(
        vocab_file=str(assets / "vocab.json"),
        merges_file=str(assets / "merges.txt"))
    mismatches = []
    for text in _fuzz_texts():
        theirs_tok = hf.tokenize(text)
        ours_tok = ours.tokenize(text)
        if theirs_tok != ours_tok:
            mismatches.append((text, theirs_tok, ours_tok))
            continue
        theirs_ids = hf(text, add_special_tokens=False)["input_ids"]
        ours_ids = ours.convert_tokens_to_ids(ours_tok)
        if theirs_ids != ours_ids:
            mismatches.append((text, theirs_ids, ours_ids))
    assert not mismatches, mismatches[:5]


def test_encode_text_pads_with_tokenizer_pad_id(ours):
    """RoBERTa's <pad> is 1, not 0 — zero-padding would embed the <s> row
    at every pad slot, which the Router's pad-mean-pooling quirk would feed
    into the routing gates (silent parity drift)."""
    import numpy as np

    from d2r_tpu.data.dataset import encode_text

    ids, mask, _ = encode_text(ours, "the and", 8)
    assert ids[0] == ours.cls_token_id
    assert (mask == 0).any()
    assert (ids[mask == 0] == ours.pad_token_id).all()
    assert np.asarray(ids).dtype == np.int32
