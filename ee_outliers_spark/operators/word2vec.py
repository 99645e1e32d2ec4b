"""word2vec analyzer — conditional-probability ("prob") model
(SURVEY A11/A12/A13/W3; /root/reference/app/analyzers/word2vec.py and
app/analyzers/ml_models/word2vec.py with use_prob_model=1):

- vocabulary per aggregator: words ranked by occurrence count, truncated to
  ``max_voc_size``; words under ``min_voc_occurrence`` map to UNKNOWN
  (ml_models/word2vec.py:105-141, ref A11);
- skip-gram pairs: context = words within ±``window`` positions
  (ml_models/word2vec.py:173-197, ref W3);
- model: P(ctx|center) = count(center,ctx) / count(center)
  (ml_models/word2vec.py:211-259, ref A12);
- scoring: per (text, center-occurrence) word score = arithmetic mean of its
  context probabilities; per-text score = geometric mean of word scores
  (exp of mean log — word2vec.py:523-604,952-959, ref A13);
- outliers: texts whose score crosses a decision frontier (low).

Everything is DataFrame-native: two groupBy counts + a join + a division is
the whole model (ref A12's Spark mapping). The token-position self-join is
|text|×window-bounded. The NN variant (torch skip-gram) is intentionally the
counting model here — the reference's own tests exercise prob-model parity.

Scale: counts shuffle on (aggregator, word[, ctx]) with map-side combine;
vocabulary truncation is a window rank over the (small) per-agg vocab.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tokenizer import tokens_col
from .frontier import flag_outliers
from .terms import aggregator_col

UNKNOWN = "<unk>"


def tokens_positions(
    df: DataFrame, groups: list[str], text_id: str, text_col: str
) -> DataFrame:
    """(aggregator, text_id, pos, word) — posexplode of the token array."""
    base = df.dropna(subset=[*groups, text_col]).select(
        aggregator_col(groups).alias("aggregator"),
        F.col(text_id).alias("text_id"),
        F.posexplode(tokens_col(text_col)).alias("pos", "word"),
    )
    return base


def vocabulary(
    toks: DataFrame, max_voc_size: int = 6000, min_voc_occurrence: int = 1
) -> DataFrame:
    """(aggregator, word, voc_word): voc_word = word if kept else UNKNOWN.
    Rank by count desc then word asc (deterministic truncation)."""
    counts = toks.groupBy("aggregator", "word").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("aggregator").orderBy(F.desc("cnt"), F.asc("word"))
    ranked = counts.withColumn("rk", F.row_number().over(w))
    return ranked.select(
        "aggregator",
        "word",
        F.when(
            (F.col("rk") <= max_voc_size) & (F.col("cnt") >= min_voc_occurrence),
            F.col("word"),
        ).otherwise(F.lit(UNKNOWN)).alias("voc_word"),
    )


def skipgram_pairs(toks_voc: DataFrame, window: int) -> DataFrame:
    """(aggregator, text_id, center_pos, center, ctx) via bounded self-join
    on token positions."""
    a = toks_voc.select(
        "aggregator", "text_id",
        F.col("pos").alias("i"), F.col("voc_word").alias("center"),
    )
    b = toks_voc.select(
        "aggregator", "text_id",
        F.col("pos").alias("j"), F.col("voc_word").alias("ctx"),
    )
    return a.join(b, ["aggregator", "text_id"]).where(
        (F.abs(F.col("i") - F.col("j")) <= window) & (F.col("i") != F.col("j"))
    )


def prob_model(pairs: DataFrame) -> DataFrame:
    """(aggregator, center, ctx, p) with p = cnt(center,ctx)/cnt(center) over
    all skip-gram occurrences in the aggregator (ref A12)."""
    pair_cnt = pairs.groupBy("aggregator", "center", "ctx").agg(
        F.count("*").alias("cnt_pair")
    )
    center_cnt = pairs.groupBy("aggregator", "center").agg(
        F.count("*").alias("cnt_center")
    )
    return pair_cnt.join(center_cnt, ["aggregator", "center"]).select(
        "aggregator", "center", "ctx",
        (F.col("cnt_pair") / F.col("cnt_center")).alias("p"),
    )


def text_scores(
    df: DataFrame,
    groups: list[str],
    text_id: str,
    text_col: str,
    window: int = 2,
    max_voc_size: int = 6000,
    min_voc_occurrence: int = 1,
) -> DataFrame:
    """(aggregator, text_id, score): geometric mean over word-occurrence
    scores, each the arithmetic mean of its context probabilities."""
    toks = tokens_positions(df, groups, text_id, text_col)
    voc = vocabulary(toks, max_voc_size, min_voc_occurrence)
    toks_voc = toks.join(voc, ["aggregator", "word"]).select(
        "aggregator", "text_id", "pos", "voc_word"
    )
    pairs = skipgram_pairs(toks_voc, window)
    model = prob_model(pairs)
    scored_pairs = pairs.join(model, ["aggregator", "center", "ctx"])
    word_scores = scored_pairs.groupBy("aggregator", "text_id", "i").agg(
        F.avg("p").alias("word_score")
    )
    return word_scores.groupBy("aggregator", "text_id").agg(
        F.exp(F.avg(F.log("word_score"))).alias("score")
    )


def word2vec_outliers(
    df: DataFrame,
    groups: list[str],
    text_id: str,
    text_col: str,
    trigger_method: str = "stdev",
    trigger_sensitivity: float = 1.0,
    trigger_on: str = "low",
    window: int = 2,
    max_voc_size: int = 6000,
    min_voc_occurrence: int = 1,
) -> DataFrame:
    scores = text_scores(
        df, groups, text_id, text_col, window, max_voc_size, min_voc_occurrence
    )
    flagged = flag_outliers(
        scores, ["aggregator"], "score",
        trigger_method, trigger_sensitivity, trigger_on,
    )
    return flagged.where("is_outlier")
