from cvpr22_cross_modal_pseudo_labeling_tpu.data.collate import (
    HashingTokenizer,
)
from cvpr22_cross_modal_pseudo_labeling_tpu.models.language.tokenizer import (
    WordPieceTokenizer,
    make_test_vocab,
)


def make_tokenizer():
    vocab = make_test_vocab(
        ["the", "dog", "play", "##ing", "##s", "in", "park", "un",
         "##happy"]
    )
    return WordPieceTokenizer(vocab=vocab)


def test_wordpiece_greedy_longest_match():
    tok = make_tokenizer()
    assert tok.tokenize("playing") == ["play", "##ing"]
    assert tok.tokenize("dogs") == ["dog", "##s"]
    assert tok.tokenize("unhappy") == ["un", "##happy"]
    # unknown word -> [UNK]
    assert tok.tokenize("zebra") == ["[UNK]"]


def test_wordpiece_punctuation_and_case():
    tok = make_tokenizer()
    assert tok.tokenize("The dog, playing!") == [
        "the", "dog", "[UNK]", "play", "##ing", "[UNK]",
    ]


def test_encode_shapes_and_masks():
    tok = make_tokenizer()
    enc = tok.encode("the dog playing", max_length=8)
    assert enc["input_ids"].shape == (8,)
    # [CLS] the dog play ##ing [SEP] -> 6 real tokens
    assert enc["attention_mask"].sum() == 6
    # specials: CLS, SEP and padding slots
    assert enc["special_tokens_mask"][0] == 1
    assert enc["special_tokens_mask"][1] == 0
    assert enc["special_tokens_mask"][5] == 1

    batch = tok.encode_batch(["dog", "the park"], max_length=6)
    assert batch["input_ids"].shape == (2, 6)


def test_encode_truncates():
    tok = make_tokenizer()
    enc = tok.encode("the dog playing in the park", max_length=5)
    assert enc["attention_mask"].sum() == 5  # CLS + 3 tokens + SEP


def test_hashing_tokenizer_deterministic():
    t = HashingTokenizer(1000)
    a = t.encode("a dog", 8)
    b = t.encode("a dog", 8)
    assert (a["input_ids"] == b["input_ids"]).all()
    assert a["input_ids"][1] >= 5  # non-special range
