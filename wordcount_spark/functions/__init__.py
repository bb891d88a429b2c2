from wordcount_spark.functions.text import (
    ASCII_LOWER,
    ASCII_UPPER,
    ascii_lower,
    normalize_word,
    tokenize,
)

__all__ = ["ASCII_LOWER", "ASCII_UPPER", "ascii_lower", "normalize_word", "tokenize"]
