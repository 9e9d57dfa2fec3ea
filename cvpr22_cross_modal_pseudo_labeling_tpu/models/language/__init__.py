from .bert import (
    BertEncoder,
    BertModel,
    WordEmbeddingBackbone,
    apply_mlm_masking,
)
from .tokenizer import WordPieceTokenizer, make_test_vocab


def build_language_backbone(cfg):
    """Registry-dispatch language-backbone builder (the working MMSS
    spec from the reference's obs/backbone.py:11-29 — the live tree
    lost this entry point, SURVEY.md 2.10 item 1).

    Types: "BERT-Base" -> full encoder BertModel; "WordEmbedding" ->
    embedding-table-only backbone.
    """
    t = cfg.MODEL.LANGUAGE_BACKBONE.TYPE
    bc = cfg.MODEL.MMSS_HEAD.TRANSFORMER.BERT_CONFIG
    if t == "BERT-Base":
        return BertModel(
            vocab_size=bc.vocab_size,
            hidden_size=bc.hidden_size,
            num_layers=12,
            num_heads=12,
            intermediate_size=3072,
        )
    if t == "WordEmbedding":
        return WordEmbeddingBackbone(
            vocab_size=bc.vocab_size, hidden_size=bc.hidden_size
        )
    raise ValueError(f"Unknown LANGUAGE_BACKBONE.TYPE {t}")
