"""Scalar function surface (SURVEY §2.8) — Arrow-vectorized pandas UDFs where
Python is genuinely needed, built-in Spark SQL functions otherwise."""

from .metrics import (  # noqa: F401
    base64_encoded_length,
    hex_encoded_length,
    metric_column,
    relative_english_entropy,
    shannon_entropy,
    url_length,
)
