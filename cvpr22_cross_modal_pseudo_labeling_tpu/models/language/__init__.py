from .bert import (
    BertEncoder,
    BertModel,
    WordEmbeddingBackbone,
    apply_mlm_masking,
)
from .tokenizer import WordPieceTokenizer, make_test_vocab
