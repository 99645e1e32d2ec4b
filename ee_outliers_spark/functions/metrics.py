"""Metric scalar functions of the metrics analyzer (SURVEY §2.8 X1-X7;
/root/reference/app/analyzers/metrics.py:368-485 dispatches on
``metric`` ∈ {length, numerical_value, entropy, base64_encoded_length,
hex_encoded_length, url_length, relative_english_entropy}).

``length`` and ``numerical_value`` stay JVM-side (whole-stage codegen);
the rest are Arrow-vectorized pandas UDFs over numpy — never per-row Python
API calls. All are pure functions, so they parallelize trivially at 10^12
rows (narrow map, no shuffle).
"""

from __future__ import annotations

import base64 as _b64
import math
import re

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

# --- shannon entropy (ref X3: app/helpers/utils.py:113-127) ------------------


def _shannon_one(s: str | None) -> float | None:
    if s is None:
        return None
    if not s:
        return 0.0
    b = np.frombuffer(s.encode("utf-8", errors="replace"), dtype=np.uint8)
    counts = np.bincount(b, minlength=256).astype(np.float64)
    p = counts[counts > 0] / b.size
    return float(-(p * np.log2(p)).sum())


@F.pandas_udf(DoubleType())
def shannon_entropy(s: pd.Series) -> pd.Series:
    return s.map(_shannon_one)


# --- relative english entropy (ref X4: metrics.py:393-411, utils.py:90-110) --
# KL divergence of the value's character distribution vs English letter
# frequencies; characters outside the reference distribution are skipped.

_ENGLISH_FREQ = {
    "a": 0.08167, "b": 0.01492, "c": 0.02782, "d": 0.04253, "e": 0.12702,
    "f": 0.02228, "g": 0.02015, "h": 0.06094, "i": 0.06966, "j": 0.00153,
    "k": 0.00772, "l": 0.04025, "m": 0.02406, "n": 0.06749, "o": 0.07507,
    "p": 0.01929, "q": 0.00095, "r": 0.05987, "s": 0.06327, "t": 0.09056,
    "u": 0.02758, "v": 0.00978, "w": 0.02360, "x": 0.00150, "y": 0.01974,
    "z": 0.00074,
}
_ENG_KEYS = np.frombuffer("".join(_ENGLISH_FREQ).encode(), dtype=np.uint8)
_ENG_VALS = np.zeros(256)
_ENG_VALS[_ENG_KEYS] = np.array(list(_ENGLISH_FREQ.values()))


def _rel_entropy_one(s: str | None) -> float | None:
    if not s:
        return None
    b = np.frombuffer(s.lower().encode("utf-8", errors="replace"), dtype=np.uint8)
    b = b[_ENG_VALS[b] > 0]
    if b.size == 0:
        return None
    counts = np.bincount(b, minlength=256).astype(np.float64)
    mask = counts > 0
    p = counts[mask] / b.size
    q = _ENG_VALS[mask]
    return float((p * np.log2(p / q)).sum())


@F.pandas_udf(DoubleType())
def relative_english_entropy(s: pd.Series) -> pd.Series:
    return s.map(_rel_entropy_one)


# --- hex / base64 / url extraction lengths (ref X5/X6/X7) --------------------

_HEX_SPLIT = re.compile(r"[^a-fA-F0-9+]")
_B64_SPLIT = re.compile(r"[^A-Za-z0-9+/=]")
_URL_SPLIT = re.compile(r"[\s'\"]+")
_URL_RE = re.compile(
    r"^(?:http|ftp)s?://"
    r"[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?"
    r"(?:\.[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?)+"
    r"(?::\d+)?(?:/\S*)?$"
)


def _hex_len_one(s: str | None) -> float | None:
    """Longest hex-parseable word of length >10 (ref metrics.py:416-433,
    utils.py:280-291: words >10 chars that int(x,16)-parse)."""
    if s is None:
        return None
    best = 0
    for w in _HEX_SPLIT.split(s):
        if len(w) > 10 and len(w) > best:
            try:
                int(w, 16)
                best = len(w)
            except ValueError:
                pass
    return float(best) if best else None


def _b64_len_one(s: str | None) -> float | None:
    """Length of the longest strictly-decodable base64 word whose decoded
    ascii payload is ≥5 chars (ref metrics.py:440-459, utils.py:265-277)."""
    if s is None:
        return None
    best = 0
    for w in _B64_SPLIT.split(s):
        if len(w) < 8 or len(w) % 4:
            continue
        try:
            dec = _b64.b64decode(w, validate=True)
            txt = dec.decode("ascii")
        except Exception:
            continue
        if len(txt) >= 5 and len(txt) > best:
            best = len(txt)
    return float(best) if best else None


def _url_len_one(s: str | None) -> float | None:
    """Total length of URL-shaped words (ref metrics.py:466-485,
    utils.py:294-305: split on whitespace/quotes, validate per word)."""
    if s is None:
        return None
    total = 0
    found = False
    for w in _URL_SPLIT.split(s):
        if w and _URL_RE.match(w):
            total += len(w)
            found = True
    return float(total) if found else None


def _hex_word_one(s: str | None) -> str | None:
    """The longest hex-parseable word itself (ref T3: metrics.py:427-438
    records the decoded words sorted by length as observations)."""
    if s is None:
        return None
    best = None
    for w in _HEX_SPLIT.split(s):
        if len(w) > 10 and (best is None or len(w) > len(best)):
            try:
                int(w, 16)
                best = w
            except ValueError:
                pass
    return best


def _b64_word_one(s: str | None) -> str | None:
    """The longest decoded base64 payload (ref metrics.py:446-457)."""
    if s is None:
        return None
    best = None
    for w in _B64_SPLIT.split(s):
        if len(w) < 8 or len(w) % 4:
            continue
        try:
            txt = _b64.b64decode(w, validate=True).decode("ascii")
        except Exception:
            continue
        if len(txt) >= 5 and (best is None or len(txt) > len(best)):
            best = txt
    return best


def _url_words_one(s: str | None) -> str | None:
    """Comma-joined URL-shaped words (ref metrics.py:473-481)."""
    if s is None:
        return None
    found = [w for w in _URL_SPLIT.split(s) if w and _URL_RE.match(w)]
    return ",".join(found) if found else None


@F.pandas_udf(StringType())
def hex_decoded_word(s: pd.Series) -> pd.Series:
    return s.map(_hex_word_one)


@F.pandas_udf(StringType())
def base64_decoded_word(s: pd.Series) -> pd.Series:
    return s.map(_b64_word_one)


@F.pandas_udf(StringType())
def url_words(s: pd.Series) -> pd.Series:
    return s.map(_url_words_one)


#: per-metric observation payload (ref T3/A10): the matched/decoded words
#: recorded alongside the numeric metric
OBSERVATIONS = {
    "hex_encoded_length": hex_decoded_word,
    "base64_encoded_length": base64_decoded_word,
    "url_length": url_words,
}


def observation_column(metric: str, col):
    c = F.col(col) if isinstance(col, str) else col
    fn = OBSERVATIONS.get(metric)
    return fn(c) if fn is not None else F.lit(None).cast("string")


@F.pandas_udf(DoubleType())
def hex_encoded_length(s: pd.Series) -> pd.Series:
    return s.map(_hex_len_one)


@F.pandas_udf(DoubleType())
def base64_encoded_length(s: pd.Series) -> pd.Series:
    return s.map(_b64_len_one)


@F.pandas_udf(DoubleType())
def url_length(s: pd.Series) -> pd.Series:
    return s.map(_url_len_one)


# --- dispatcher (ref metrics.py:355-485 calculate_metric) ---------------------

METRICS = {
    "length": lambda c: F.length(c).cast("double"),
    # try_cast: null on parse failure (ref metrics.py:372-377 float() w/
    # exception swallow) — plain cast throws under Spark 4 ANSI mode
    "numerical_value": lambda c: c.try_cast("double"),
    "entropy": shannon_entropy,
    "relative_english_entropy": relative_english_entropy,
    "hex_encoded_length": hex_encoded_length,
    "base64_encoded_length": base64_encoded_length,
    "url_length": url_length,
}


def metric_column(metric: str, col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    try:
        return METRICS[metric](c)
    except KeyError:
        raise ValueError(f"unknown metric {metric!r}; choose from {sorted(METRICS)}")
