from climb_tpu.data.tokenization import WordPieceTokenizer, HashTokenizer, load_tokenizer
from climb_tpu.data.image_pipeline import vilt_resize_dims, process_image
from climb_tpu.data.loader import DataLoader

__all__ = [
    "WordPieceTokenizer",
    "HashTokenizer",
    "load_tokenizer",
    "vilt_resize_dims",
    "process_image",
    "DataLoader",
]
