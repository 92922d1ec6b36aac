from .codecs import varint_decode, varint_encode, delta_encode, delta_decode
from .tokenizer import TOKEN_PATTERN, tokenize_series

__all__ = [
    "TOKEN_PATTERN",
    "delta_decode",
    "delta_encode",
    "tokenize_series",
    "varint_decode",
    "varint_encode",
]
