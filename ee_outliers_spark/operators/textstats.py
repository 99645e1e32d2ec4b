"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All JVM-side column expressions (whole-stage codegen) so they hold up at
10^12 rows as narrow maps — no UDFs, no shuffle. Each has an exact DuckDB
SQL twin in entrypoints.py for the correctness gate.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..tokenizer import tokens_col, tokens_sql

# small per-language stopword profiles (deterministic heuristic langid)
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "on"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "du", "pas"],
    "es": ["el", "la", "los", "las", "es", "una", "por", "con", "para", "del"],
}


def token_count_col(text_col: str) -> Column:
    return F.size(tokens_col(text_col)).cast("long")


def token_count_sql(expr: str) -> str:
    return f"CAST(len({tokens_sql(expr)}) AS BIGINT)"


#: BPE-ish pre-tokenizer (the GPT-2 pattern family simplified to an
#: RE2/Java-regex-common subset: contraction suffixes, letter runs, digit
#: runs, punctuation runs, whitespace runs — each with an optional leading
#: space, the way byte-level BPE splits before merging). Counting these
#: pieces approximates LLM token counts far better than whitespace words.
BPE_SPLIT_RE = (
    r"'(?:s|t|d|m|ll|ve|re)"
    r"| ?[A-Za-z]+"
    r"| ?[0-9]+"
    r"| ?[^A-Za-z0-9\s]+"
    r"|\s+"
)


def bpe_token_count_col(text_col: str) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_SPLIT_RE), 0)).cast("long")


def bpe_token_count_sql(expr: str) -> str:
    pat = BPE_SPLIT_RE.replace("'", "''")
    return f"CAST(len(regexp_extract_all({expr}, '{pat}', 0)) AS BIGINT)"


def lang_scores_col(text_col: str) -> dict[str, Column]:
    toks = tokens_col(text_col)
    out = {}
    for lang, words in LANG_PROFILES.items():
        wl = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(wl, t)))
    return out


def langid_col(text_col: str) -> Column:
    """Predicted language = profile with the most stopword hits; ties and
    zero-hit texts → 'und' (undetermined). Deterministic tie-break: langs
    compared in sorted key order, strict > to win."""
    scores = lang_scores_col(text_col)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in sorted(scores):
        s = scores[lang]
        cond = s > best_score
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, s).otherwise(best_score)
    return best_lang


def langid_sql(expr: str) -> str:
    toks = tokens_sql(expr)
    parts = []
    for lang in sorted(LANG_PROFILES):
        words = ", ".join(f"'{w}'" for w in LANG_PROFILES[lang])
        parts.append(
            f"len(list_filter({toks}, t -> list_contains([{words}], t))) AS s_{lang}"
        )
    score_sel = ", ".join(parts)
    # same fold as langid_col: sorted order, strict >
    langs = sorted(LANG_PROFILES)
    expr_lang, expr_score = "'und'", "0"
    for lang in langs:
        expr_lang = f"CASE WHEN s_{lang} > ({expr_score}) THEN '{lang}' ELSE ({expr_lang}) END"
        expr_score = f"CASE WHEN s_{lang} > ({expr_score}) THEN s_{lang} ELSE ({expr_score}) END"
    return score_sel, expr_lang


def quality_score_col(text_col: str) -> Column:
    """Deterministic quality score in [0,1]: mix of
    - length factor: min(n_tokens/100, 1)
    - alpha ratio: alphanumeric chars / total chars
    - stopword presence: min(en-stopword hits / 5, 1)
    - mean token length sanity: 1 if 3<=mean<=12 else 0.5
    Weights 0.3/0.3/0.2/0.2. (Heuristic in the spirit of C4/Gopher rules.)"""
    toks = tokens_col(text_col)
    n = F.size(toks).cast("double")
    text = F.coalesce(F.col(text_col), F.lit(""))
    total_chars = F.length(text).cast("double")
    alnum_chars = F.length(F.regexp_replace(F.lower(text), "[^a-z0-9]", "")).cast("double")
    alpha_ratio = F.when(total_chars > 0, alnum_chars / total_chars).otherwise(F.lit(0.0))
    len_factor = F.least(n / F.lit(100.0), F.lit(1.0))
    wl = F.array(*[F.lit(w) for w in LANG_PROFILES["en"]])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(wl, t))).cast("double")
    stop_factor = F.least(stop_hits / F.lit(5.0), F.lit(1.0))
    mean_len = F.when(n > 0, (alnum_chars / n)).otherwise(F.lit(0.0))
    len_sane = F.when((mean_len >= 3.0) & (mean_len <= 12.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return (
        0.3 * len_factor + 0.3 * alpha_ratio + 0.2 * stop_factor + 0.2 * len_sane
    )


def quality_score_sql(expr: str) -> str:
    toks = tokens_sql(expr)
    words = ", ".join(f"'{w}'" for w in LANG_PROFILES["en"])
    return f"""(
  0.3 * least(CAST(len({toks}) AS DOUBLE) / 100.0, 1.0)
+ 0.3 * (CASE WHEN length(coalesce({expr}, '')) > 0
         THEN CAST(length(regexp_replace(lower(coalesce({expr}, '')), '[^a-z0-9]', '', 'g')) AS DOUBLE)
              / CAST(length(coalesce({expr}, '')) AS DOUBLE)
         ELSE 0.0 END)
+ 0.2 * least(CAST(len(list_filter({toks}, t -> list_contains([{words}], t))) AS DOUBLE) / 5.0, 1.0)
+ 0.2 * (CASE WHEN len({toks}) > 0
              AND CAST(length(regexp_replace(lower(coalesce({expr}, '')), '[^a-z0-9]', '', 'g')) AS DOUBLE)
                  / CAST(len({toks}) AS DOUBLE) BETWEEN 3.0 AND 12.0
         THEN 1.0 ELSE 0.5 END)
)"""


def fingerprint_col(text_col: str) -> Column:
    """Normalized document fingerprint: md5 over the space-joined token
    stream — whitespace/case/punctuation-insensitive content identity."""
    return F.md5(F.concat_ws(" ", tokens_col(text_col)))


def fingerprint_sql(expr: str) -> str:
    return f"md5(array_to_string({tokens_sql(expr)}, ' '))"


def text_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One-pass profile: (id, n_tokens, lang_pred, quality, fingerprint)."""
    return df.select(
        F.col(id_col),
        token_count_col(text_col).alias("n_tokens"),
        langid_col(text_col).alias("lang_pred"),
        quality_score_col(text_col).alias("quality"),
        fingerprint_col(text_col).alias("fingerprint"),
    )


def repetition_profile(df: DataFrame, id_col: str, text_col: str
                       ) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    'Scaling Language Models' §A1.1 repetition filters — the published
    quality rules LLM pipelines apply before training), token-level:

      dup_token_pm  — (tokens − distinct tokens) / tokens
      dup_bigram_pm — (bigram occurrences − distinct bigrams) / occurrences
      top_bigram_pm — occurrences of the most frequent bigram / occurrences

    all reported PER-MILLE as integers via integer floor division, so the
    DuckDB twin hashes identically (float ratios round differently across
    engines at exact boundaries). One Arrow-batched pass per doc — per-doc
    metrics are embarrassingly parallel: the 100 TB plan is a narrow map
    with column pruning, zero shuffle. (A pandas UDF, not array HOFs:
    lambda HOFs re-evaluate the tokenizer per element — see
    dedup.shingles_from_tokens.)"""

    @F.pandas_udf(
        "struct<dup_token_pm: long, dup_bigram_pm: long, top_bigram_pm: long>")
    def rep(texts: pd.Series) -> pd.DataFrame:
        import re
        from collections import Counter

        dt, db, tb = [], [], []
        for s in texts:
            toks = [] if s is None else re.findall("[a-z0-9]+", s.lower())
            n = len(toks)
            dt.append(0 if n == 0 else (1000 * (n - len(set(toks)))) // n)
            bgs = list(zip(toks, toks[1:]))
            occ = len(bgs)
            if occ == 0:
                db.append(0)
                tb.append(0)
            else:
                c = Counter(bgs)
                db.append((1000 * (occ - len(c))) // occ)
                tb.append((1000 * max(c.values())) // occ)
        return pd.DataFrame({
            "dup_token_pm": pd.Series(dt, dtype="int64"),
            "dup_bigram_pm": pd.Series(db, dtype="int64"),
            "top_bigram_pm": pd.Series(tb, dtype="int64"),
        })

    r = df.select(F.col(id_col), rep(F.col(text_col)).alias("_r"))
    return r.select(
        id_col,
        F.col("_r.dup_token_pm").alias("dup_token_pm"),
        F.col("_r.dup_bigram_pm").alias("dup_bigram_pm"),
        F.col("_r.top_bigram_pm").alias("top_bigram_pm"),
    )
