"""Cross-check our WordPiece tokenizer against HuggingFace's
BertTokenizer over the same local vocab file — the reference tokenizes
with HF bert-base-uncased (reference
modeling/language_backbone/transformers.py:20-28)."""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

from cvpr22_cross_modal_pseudo_labeling_tpu.models.language.tokenizer import (
    WordPieceTokenizer,
)

VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "a", "an", "the", "cat", "dog", "zebra", "giraffe",
    "un", "##believ", "##able", "##s", "##ing", "run", "runn",
    "jump", "##ed", "over", "lazy", "quick", "brown", "fox",
    ",", ".", "!", "?", "'", "-",
]


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    vf = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    vf.write_text("\n".join(VOCAB) + "\n")
    ours = WordPieceTokenizer(vocab_file=str(vf))
    hf = transformers.BertTokenizer(
        vocab_file=str(vf), do_lower_case=True
    )
    return ours, hf


TEXTS = [
    "the quick brown fox jumped over the lazy dog",
    "An unbelievable cat!",
    "zebra, giraffe... and a DOG?",
    "running runs",
    "completely-unknown words here",
    "",
    "  the   cat  ",
]


def test_tokenize_matches_hf(pair):
    ours, hf = pair
    for text in TEXTS:
        assert ours.tokenize(text) == hf.tokenize(text), text


def test_encode_matches_hf(pair):
    ours, hf = pair
    for text in TEXTS:
        enc = ours.encode(text, max_length=12)
        ref = hf(
            text,
            max_length=12,
            padding="max_length",
            truncation=True,
            return_special_tokens_mask=True,
            return_tensors="np",
        )
        np.testing.assert_array_equal(
            enc["input_ids"], ref["input_ids"][0], err_msg=text
        )
        np.testing.assert_array_equal(
            enc["attention_mask"], ref["attention_mask"][0], err_msg=text
        )
        np.testing.assert_array_equal(
            enc["special_tokens_mask"],
            ref["special_tokens_mask"][0],
            err_msg=text,
        )
