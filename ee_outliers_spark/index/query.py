"""BM25 top-k query execution.

Replaces Elasticsearch query_string scoring (ref F2/T-BM25, SURVEY §2.2/§2.6;
/root/reference/app/helpers/es.py:238-250 ships the query to ES — here the
whole scoring pipeline is Spark).

Two executors, rank-identical to each other and to the pure-Python oracle:

1. ``bm25_topk_df`` — declarative DataFrame plan over naive (term, doc_id, tf)
   postings: pushdown filter on term IN (...), broadcast term-stats join,
   hash-agg per doc, TakeOrderedAndProject for the global top-k. Catalyst
   picks partial aggregation and the limit-pushdown automatically.

2. ``bm25_topk_wand`` — block-max WAND (Broder et al.; Ding & Suel block-max)
   over compressed SPIMI segments: segments are doc-disjoint, so each task
   runs an independent DAAT WAND over its segment's postings with a local
   top-k heap; global answer = union of per-segment candidates → top-k. The
   block-max metadata lets a segment skip whole 128-posting blocks whose
   upper-bound score can't beat the local heap threshold.

Scale: query-term pushdown prunes the parquet scan to |q| rows per segment;
per-segment WAND never materializes a full posting list on the driver;
the final top-k is a tree reduction (orderBy+limit ⇒ TakeOrdered).
"""

from __future__ import annotations

import heapq
import math
import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tokenizer import tokenize_py, tokens_col
from .build import (
    B, K1, IndexPaths, block_upper_bound, live_seg_ids, load_stats,
    read_live_segments, routed_segment_groupby,
)
from .codec import decode_position_stream, varbyte_decode

TOPK_SCHEMA = "doc_id long, score double"


def _idf(n_docs: int, df_: int) -> float:
    return math.log(1.0 + (n_docs - df_ + 0.5) / (df_ + 0.5))


def _termstats_lookup(paths: IndexPaths, terms: list[str]) -> dict[str, int]:
    """{term: df} for an explicit small term list, read DIRECTLY from the
    termstats parquet with pyarrow on the driver (row-group statistics
    pruning + an IN filter). Dictionary-metadata lookups are |q| rows out
    of a vocabulary-sized table; launching a Spark job for them cost one
    full scheduling round trip (~0.15-0.3 s) on EVERY top-k/phrase query —
    the same stats.json/local-read pattern load_stats already uses. Pattern
    predicates (wildcard/regexp/fuzzy expansion) still go through the
    distributed scan — only exact term lists take this path."""
    import glob

    import pyarrow.parquet as pq

    out: dict[str, int] = {}
    flt = [("term", "in", list(terms))]
    for f in glob.glob(os.path.join(paths.termstats, "*.parquet")):
        t = pq.read_table(f, columns=["term", "df"], filters=flt)
        for term, d in zip(t.column("term").to_pylist(),
                           t.column("df").to_pylist()):
            out[term] = int(d)
    return out


def _term_field(term: str) -> str | None:
    """Field name of a dictionary entry (`title:batch` → `title`), None for
    a main-text term. Tokens are [a-z0-9]+, so ':' is unambiguous."""
    i = term.find(":")
    return term[:i] if i > 0 else None


def _field_norms(stats: dict) -> dict[str, tuple[int, float]]:
    """field → (docCount, avgdl) from stats.json's ``field_stats`` (written
    by refresh_stats from the per-field sidecar totals). Empty for indexes
    without analyzed fields — callers fall back to the main-text norm, which
    also keeps pre-field_stats indexes readable."""
    return {
        f: (int(v["n_docs"]), float(v["avgdl"]) or 1.0)
        for f, v in (stats.get("field_stats") or {}).items()
    }


def _term_norm(term: str, fnorms: dict, n_docs: int, avgdl: float
               ) -> tuple[int, float]:
    """(docCount for idf, avgdl for the length norm) of one dictionary term:
    the field's own stats for `field:token` entries (Lucene per-field
    norms), the corpus stats for main-text terms."""
    fld = _term_field(term)
    if fld is not None and fld in fnorms:
        return fnorms[fld]
    return n_docs, avgdl


# --------------------------------------------------------------------------
# DataFrame path (naive postings)
# --------------------------------------------------------------------------

def bm25_score_df(
    postings: DataFrame,
    doclen: DataFrame,
    n_docs: int,
    avgdl: float,
    terms: list[str],
    mode: str = "or",
) -> DataFrame:
    """Per-doc BM25 scores for a bag of query terms → (doc_id, score).

    mode='and' keeps only docs containing every distinct query term
    (conjunctive filter context, ref F1 es.py:664-710).
    """
    terms = list(dict.fromkeys(terms))
    p = postings.where(F.col("term").isin(terms))  # pushed to the scan
    # df per term — vocabulary-sized, broadcast
    tstats = p.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    idf = F.log(
        F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    # broadcast the doclen side when the corpus provably fits (n_docs is a
    # parameter): the postings stream then reaches its doc_id aggregation
    # through ONE exchange instead of a sort-merge shuffle of both sides
    # (guide §3.1). Large corpora keep the shuffle join — doclen is
    # corpus-sized and must never become an unbounded broadcast.
    dl = F.broadcast(doclen) if n_docs <= 500_000 else doclen
    scored = (
        p.join(F.broadcast(tstats), "term")
        .join(dl, "doc_id")
        .select(
            "doc_id",
            "term",
            (
                idf
                * (F.col("tf") * (K1 + 1.0))
                / (
                    F.col("tf")
                    + K1 * (1.0 - B + B * F.col("dl") / F.lit(float(avgdl)))
                )
            ).alias("contrib"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum("contrib").alias("score"),
        F.count("*").cast("long").alias("n_terms"),
    )
    if mode == "and":
        agg = agg.where(F.col("n_terms") == len(terms))
    return agg.select("doc_id", "score")


def bm25_topk_df(
    postings: DataFrame,
    doclen: DataFrame,
    n_docs: int,
    avgdl: float,
    terms: list[str],
    k: int,
    mode: str = "or",
) -> DataFrame:
    return (
        bm25_score_df(postings, doclen, n_docs, avgdl, terms, mode)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def phrase_topk_df(
    df: DataFrame,
    doc_col: str,
    text_col: str,
    doclen: DataFrame,
    n_docs: int,
    avgdl: float,
    phrase: str,
    k: int,
) -> DataFrame:
    """Phrase query: tf = token-position phrase frequency (Lucene PhraseQuery
    semantics, occurrences may overlap); df = docs containing the phrase;
    scored BM25. The scan stays JVM-side — array HOFs (split/filter/sequence)
    inside whole-stage codegen, no Python UDF."""
    toks = tokenize_py(phrase)
    m = len(toks)
    # tokens materialize JVM-side (codegen split/filter); the positional
    # phrase count is a vectorized Arrow UDF over the token arrays — array
    # HOF lambdas evaluate interpreted per element in Spark and were ~20x
    # slower here, and embedding the tokenizer expr in the lambda re-ran the
    # split per element_at (O(tokens²)/row)
    phrase_arr = np.asarray(toks, dtype=object)

    @F.pandas_udf("long")
    def _phrase_tf(tok_arrays: pd.Series) -> pd.Series:
        def cnt(lst):
            if lst is None or len(lst) < m:
                return 0
            a = np.asarray(lst, dtype=object)
            mask = a[: len(a) - m + 1] == phrase_arr[0]
            for j in range(1, m):
                mask = mask & (a[j : len(a) - m + 1 + j] == phrase_arr[j])
            return int(mask.sum())
        return tok_arrays.map(cnt)

    # eager localCheckpoint (not cache): the hits feed both the df count
    # and the score join; a cache() with no unpersist() accumulates pinned
    # partitions across long-lived sessions (the leak pattern fixed in the
    # indexed path at _text_scores) — checkpoint materializes once and the
    # blocks are GC-managed with the session
    hits = (
        df.select(F.col(doc_col).alias("doc_id"),
                  tokens_col(F.col(text_col)).alias("_toks"))
        .select("doc_id", _phrase_tf("_toks").alias("tf"))
        .where(F.col("tf") > 0)
        .localCheckpoint(eager=True)
    )
    dfp = hits.agg(F.count("*")).collect()[0][0]
    if dfp == 0:
        return hits.select("doc_id", F.lit(0.0).alias("score")).limit(0)
    idf = _idf(n_docs, int(dfp))
    scored = hits.join(doclen, "doc_id").select(
        "doc_id",
        (
            F.lit(idf)
            * (F.col("tf") * (K1 + 1.0))
            / (F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / F.lit(float(avgdl))))
        ).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def _sloppy_tf(plists: dict, phrase_terms: list[str], doc: int,
               slop: int) -> int:
    """Sloppy-phrase frequency for one doc: the number of window starts v
    (v ∈ adjusted positions, adjusted = position - phrase offset) such that
    every phrase offset can claim a DISTINCT doc position within
    [v, v+slop]. At slop=0 this is exactly the exact-phrase tf. Matches the
    range formulation compiled by the regex backends (queryparser
    slop_regex), extended to any phrase length."""
    adj: list[np.ndarray] = []
    for j, t in enumerate(phrase_terms):
        docs, flat, bounds = plists[t]
        i = int(np.searchsorted(docs, doc))
        lo = int(bounds[i - 1]) if i > 0 else 0
        p = flat[lo:int(bounds[i])] - j
        if p.size == 0:
            return 0
        adj.append(p)
    cand = np.unique(np.concatenate(adj))
    ok = np.ones(cand.size, dtype=bool)
    for a in adj:
        # label j covers v iff some element of a lies in [v, v+slop]
        idx = np.searchsorted(a, cand, side="left")
        has = idx < a.size
        has[has] &= a[idx[has]] <= cand[has] + slop
        ok &= has
    cand = cand[ok]
    # repeated phrase terms: the same doc position must not serve two
    # offsets — greedy interval assignment per term (sorted offsets take
    # the smallest unused position in their window)
    from collections import Counter
    counts = Counter(phrase_terms)
    if all(c == 1 for c in counts.values()):
        return int(cand.size)
    offsets: dict[str, list[int]] = {}
    for j, t in enumerate(phrase_terms):
        offsets.setdefault(t, []).append(j)
    tf = 0
    for v in cand.tolist():
        good = True
        for t, offs in offsets.items():
            if len(offs) == 1:
                continue
            docs, flat, bounds = plists[t]
            i = int(np.searchsorted(docs, doc))
            lo = int(bounds[i - 1]) if i > 0 else 0
            pos = flat[lo:int(bounds[i])]
            used = -1
            for o in offs:  # offsets ascending; windows shift right with o
                w = pos[(pos >= max(v + o, used + 1)) & (pos <= v + slop + o)]
                if w.size == 0:
                    good = False
                    break
                used = int(w[0])
            if not good:
                break
        if good:
            tf += 1
    return tf


def _ragged_gather(flat: np.ndarray, bounds: np.ndarray,
                   docs_t: np.ndarray, cand: np.ndarray
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Concatenated position slices of ``cand`` docs (values) plus the
    per-element candidate INDEX (0..len(cand)-1) — one vectorized gather,
    no per-doc loop."""
    idx = np.searchsorted(docs_t, cand)
    hi = bounds[idx]
    lo = np.where(idx > 0, bounds[idx - 1], 0)
    counts = (hi - lo).astype(np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    shift = np.repeat(lo - np.concatenate(
        ([0], np.cumsum(counts)[:-1])), counts)
    vals = flat[np.arange(total, dtype=np.int64) + shift]
    owner = np.repeat(np.arange(len(cand), dtype=np.int64), counts)
    return vals.astype(np.int64), owner


def _lazy_plists(raw: dict, distinct: list[str],
                 cand: np.ndarray | None = None):
    """(inter, plists) for one phrase within one segment, decoding positions
    ONLY for docs in the conjunction (optionally further restricted to
    ``cand``). ``raw``: term → (docs, tfs, pos_blob, block_pos_ends|None).
    With block_pos_ends present (current index format), decode cost is
    O(touched 128-posting blocks) via gather_candidate_positions — the
    phrase path stops paying O(total positions) per segment (the one
    corpus-linear term the round-5 scale probe measured). Old indexes
    (bpe None) fall back to full decode. plists[t] = (inter, vals,
    bounds) is shaped for _phrase_seg_match, whose own inter/gather over
    it is an identity pass."""
    from .codec import gather_candidate_positions

    inter = raw[distinct[0]][0]
    for t in distinct[1:]:
        inter = np.intersect1d(inter, raw[t][0], assume_unique=True)
    if cand is not None:
        inter = np.intersect1d(inter, cand, assume_unique=True)
    if inter.size == 0:
        return inter, None
    plists: dict[str, tuple] = {}
    for t in distinct:
        docs, tfs, pblob, bpe = raw[t]
        if bpe is None:
            flat, bounds = decode_position_stream(pblob, tfs)
            vals, _ = _ragged_gather(flat, bounds, docs, inter)
        else:
            vals, _ = gather_candidate_positions(pblob, tfs, bpe, docs, inter)
        cnt = tfs[np.searchsorted(docs, inter)]
        plists[t] = (inter, vals, np.cumsum(cnt))
    return inter, plists


def _phrase_seg_match(plists: dict, distinct: list[str],
                      phrase_terms: list[str], slop: int
                      ) -> tuple[np.ndarray, np.ndarray]:
    """(docs, tfs) of the phrase within ONE segment, from decoded positional
    lists (term → (docs, flat_positions, bounds)). Shared by the scoring
    path (_phrase_hits) and the postings-only boolean evaluator
    (filter.matching_ids) — segments are doc-disjoint so per-segment
    results union to the global answer.

    Vectorized across ALL candidate docs at once: per-term adjusted
    positions are gathered into one array per term with each position
    offset by candidate_index × OFFSET (OFFSET > any in-doc position +
    slop, so values from different docs can never satisfy a window or an
    equality together). Exact phrases then reduce to an m-way sorted-array
    intersection; sloppy phrases to a vectorized window-coverage check over
    the union of starts; sloppy phrases with REPEATED terms add a
    vectorized greedy distinct-position assignment (loop over phrase
    offsets, never over docs). No per-doc Python loop remains on any
    branch."""
    inter = plists[distinct[0]][0]
    for t in distinct[1:]:
        inter = np.intersect1d(inter, plists[t][0], assume_unique=True)
    if inter.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)

    if slop > 0 and len(distinct) != len(phrase_terms):
        # Repeated terms under slop: one doc position must not serve two
        # offsets of the same term. Exact semantics = per-term greedy
        # interval assignment (equal-width windows shifted right with the
        # offset → greedy smallest-available is optimal; _sloppy_tf is the
        # per-doc differential reference). Vectorized across EVERY
        # candidate start at once in the same block-offset coordinates as
        # the exact path — the loops below run over phrase OFFSETS (a tiny
        # constant), never over docs (round-4 verdict: this branch was the
        # last per-doc Python loop in a query path).
        max_pos = max(int(plists[t][1].max()) if plists[t][1].size else 0
                      for t in distinct)
        m = len(phrase_terms)
        off = np.int64(max_pos + slop + m + 2)
        pos_blk: dict[str, np.ndarray] = {}
        for t in distinct:
            docs_t, flat, bounds = plists[t]
            vals, owner = _ragged_gather(flat, bounds, docs_t, inter)
            # +m keeps start-adjusted values non-negative; sorted + unique
            # as-built (positions ascend within a doc, owner blocks ascend)
            pos_blk[t] = vals + m + owner * off
        adj = [pos_blk[t] - j for j, t in enumerate(phrase_terms)]
        starts = np.unique(np.concatenate(adj))
        ok = np.ones(starts.size, dtype=bool)
        for a in adj:
            # necessary condition: every offset's window holds ≥1 position
            # (off > max_pos + slop + m ⇒ windows never cross doc blocks)
            i = np.searchsorted(a, starts, side="left")
            has = i < a.size
            has[has] &= a[i[has]] <= starts[has] + slop
            ok &= has
        offsets: dict[str, list[int]] = {}
        for j, t in enumerate(phrase_terms):
            offsets.setdefault(t, []).append(j)
        for t, offs in offsets.items():
            if len(offs) == 1:
                continue
            # greedy: ascending offsets each claim the smallest doc
            # position ≥ max(start+offset, previous claim + 1) inside
            # their window — all starts advanced in lockstep
            a = pos_blk[t]
            lower = np.full(starts.size, np.iinfo(np.int64).min,
                            dtype=np.int64)
            feas = np.ones(starts.size, dtype=bool)
            for o in offs:
                lower = np.maximum(lower, starts + o)
                i = np.searchsorted(a, lower, side="left")
                has = i < a.size
                claimed = np.where(
                    has, a[np.minimum(i, a.size - 1)], np.int64(2**62))
                feas &= has & (claimed <= starts + slop + o)
                lower = claimed + 1
            ok &= feas
        starts = starts[ok]
        if starts.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        uniq, tfs = np.unique(starts // off, return_counts=True)
        return inter[uniq], tfs.astype(np.int64)

    max_pos = max(int(plists[t][1].max()) if plists[t][1].size else 0
                  for t in distinct)
    off = np.int64(max_pos + slop + len(phrase_terms) + 2)

    adj: list[np.ndarray] = []
    for j, t in enumerate(phrase_terms):
        docs_t, flat, bounds = plists[t]
        vals, owner = _ragged_gather(flat, bounds, docs_t, inter)
        # positions ascend within a doc and owner blocks ascend, so each
        # adjusted array is globally sorted and unique as-built (repeated
        # phrase terms get DIFFERENT j-shifts of the same list — still
        # valid: an exact-phrase start needs the term at j distinct doc
        # positions, which distinct j-shifts encode). The constant
        # +len(phrase_terms) shift keeps adjusted values NON-NEGATIVE
        # (pos - j can reach -j), so `// off` attributes every value to its
        # own doc block — relations are invariant under a constant shift.
        adj.append(vals - j + len(phrase_terms) + owner * off)
    if slop == 0:
        cand = adj[0]
        for a in adj[1:]:
            if cand.size == 0:
                break
            cand = np.intersect1d(cand, a, assume_unique=True)
        if cand.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        owner_idx = cand // off
    else:
        starts = np.unique(np.concatenate(adj))
        ok = np.ones(starts.size, dtype=bool)
        for a in adj:
            i = np.searchsorted(a, starts, side="left")
            has = i < a.size
            has[has] &= a[i[has]] <= starts[has] + slop
            # off > max_pos + slop ⇒ a window can never reach into the
            # next candidate's block, so same-doc is implied
            ok &= has
        starts = starts[ok]
        if starts.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        owner_idx = starts // off
    uniq, tfs = np.unique(owner_idx, return_counts=True)
    return inter[uniq], tfs.astype(np.int64)


def _phrase_hits(spark: SparkSession, paths: IndexPaths,
                 phrase: str | list[str], slop: int = 0) -> DataFrame | None:
    """(doc_id, tf, dl) for every doc containing the phrase (optionally with
    ``slop``, Lucene sloppy-phrase semantics — see ``_sloppy_tf``), off the
    index. None when the phrase trivially matches nothing (empty after
    tokenize, or contains a zero-df term). Single-token 'phrases' degrade to
    a plain posting-list read (no positions needed). A list argument is
    taken as ALREADY-analyzed dictionary terms (the per-field path passes
    `field:token`-qualified terms)."""
    toks = list(phrase) if isinstance(phrase, list) else tokenize_py(phrase)
    m = len(toks)
    if m == 0:
        return None
    stats = load_stats(paths)
    if m == 1:
        return posting_tfs_df(spark, paths, toks).select("doc_id", "tf", "dl")
    if not stats.get("positions"):
        raise ValueError(
            "phrase queries need a positional index "
            "(build_segments(..., positions=True))")
    distinct = list(dict.fromkeys(toks))

    present = len(_termstats_lookup(paths, distinct))
    if present < len(distinct):
        # a phrase containing a zero-df term matches nothing anywhere
        return None

    # per-field phrases (qualified tokens share one `field:` prefix) are
    # normalized by the FIELD's doc length — fetch that norm sidecar too
    fld = _term_field(toks[0])
    side_term = (fld + ":") if fld is not None else None
    side_pred = F.col("term").isNull()
    if side_term is not None:
        side_pred = side_pred | (F.col("term") == side_term)
    seg_cols = ["seg_id", "term", "doc_blob", "tf_blob", "pos_blob"]
    live = read_live_segments(spark, paths)
    has_bpe = "block_pos_ends" in live.columns
    if has_bpe:
        seg_cols.append("block_pos_ends")
    segs = live.where(
        F.col("term").isin(distinct) | side_pred
    ).select(*seg_cols)

    phrase_terms = list(toks)  # ordered, with duplicates

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                              "tf": pd.Series(dtype="int64"),
                              "dl": pd.Series(dtype="int64")})
        dl_rows = pdf[pdf["term"].isna()]
        if side_term is not None:
            frows = pdf[pdf["term"] == side_term]
            if not frows.empty:
                dl_rows = frows  # field norm sidecar wins when present
            pdf = pdf[pdf["term"] != side_term]
        term_rows = pdf[pdf["term"].notna()]
        if dl_rows.empty or len(term_rows) < len(distinct):
            return empty  # conjunction: every distinct term must occur here
        dl_docs = np.cumsum(
            varbyte_decode(bytes(dl_rows["doc_blob"].iloc[0]))).astype(np.int64)
        dl_vals = varbyte_decode(bytes(dl_rows["tf_blob"].iloc[0])).astype(np.int64)
        raw: dict[str, tuple] = {}
        bpes = (term_rows["block_pos_ends"] if has_bpe
                else [None] * len(term_rows))
        for term, dblob, tblob, pblob, bpe in zip(
                term_rows["term"], term_rows["doc_blob"],
                term_rows["tf_blob"], term_rows["pos_blob"], bpes):
            docs = np.cumsum(varbyte_decode(bytes(dblob))).astype(np.int64)
            tfs = varbyte_decode(bytes(tblob)).astype(np.int64)
            raw[term] = (docs, tfs, bytes(pblob),
                         None if bpe is None else np.asarray(bpe, np.int64))
        inter, plists = _lazy_plists(raw, distinct)
        if plists is None:
            return empty
        d, tfs_arr = _phrase_seg_match(plists, distinct, phrase_terms, slop)
        if d.size == 0:
            return empty
        return pd.DataFrame({
            "doc_id": d,
            "tf": tfs_arr,
            "dl": dl_vals[np.searchsorted(dl_docs, d)],
        })

    return routed_segment_groupby(segs, live_seg_ids(stats)).applyInPandas(
        run, schema="doc_id long, tf long, dl long")


def phrase_topk_wand(
    spark: SparkSession,
    paths: IndexPaths,
    phrase: str,
    k: int,
) -> DataFrame:
    """Index-backed phrase top-k: tf = positional phrase frequency computed by
    intersecting the per-term position lists stored in the segments (Lucene
    PhraseQuery over .prx), BM25-scored with the phrase's own df/idf.

    This is the scale fix for the one query shape that used to re-tokenize
    the whole corpus per query (``phrase_topk_df``): the plan here reads ONLY
    segments.parquet rows for the phrase's distinct terms (term IN (...)
    pushed to the scan) plus the doclen sidecars — at 10^12 docs a phrase
    query touches |q| posting lists per segment, never the documents table.
    Requires an index built with ``positions=True`` (single-token phrases
    work on any index)."""
    hits = _phrase_hits(spark, paths, phrase)
    if hits is None:
        return spark.createDataFrame([], TOPK_SCHEMA)
    stats = load_stats(paths)
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]
    # one materialization (eager localCheckpoint — lineage truncated, blocks
    # GC'd with the query's DataFrames), one tiny count over it, literal idf:
    # a broadcast-join of the count would recompute the positional
    # intersection (measured 4x slower at 600k), a bare cache would pin
    # partitions until eviction
    hits = hits.localCheckpoint(eager=True)
    dfp = hits.count()
    if dfp == 0:
        return spark.createDataFrame([], TOPK_SCHEMA)
    idf = _idf(n_docs, int(dfp))
    scored = hits.select(
        "doc_id",
        (
            F.lit(idf) * (F.col("tf") * (K1 + 1.0))
            / (F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / F.lit(float(avgdl))))
        ).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def posting_tfs_df(spark: SparkSession, paths: IndexPaths,
                   terms: list[str] | None = None,
                   term_pred: Column | None = None) -> DataFrame:
    """(term, doc_id, tf, dl) decoded from the compressed segments for the
    requested terms only — the term IN (...) filter (or an arbitrary
    ``term_pred`` Column over the dictionary's term strings, e.g. a wildcard
    rlike or a levenshtein bound — Lucene MultiTermQuery expansion as a
    distributed dictionary scan, never a driver-side term list) reaches the
    parquet scan, so only matching dictionary rows per segment are read
    regardless of corpus size. The doc length rides along from the segment's
    co-located sidecar row (searchsorted gather inside the same task), so
    scoring needs NO shuffle join against a corpus-wide doclen table."""
    if term_pred is None:
        term_pred = F.col("term").isin(terms or [])
    # "field:" norm sidecars ride along (one tiny row per field per segment)
    # so `field:token` entries get the FIELD's doc length, not the text's
    segs = read_live_segments(spark, paths).where(
        term_pred | F.col("term").isNull()
        | (F.col("term").isNotNull() & F.col("term").endswith(":"))
    ).select("seg_id", "term", "doc_blob", "tf_blob")

    def decode(key, pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "term": pd.Series(dtype="object"),
            "doc_id": pd.Series(dtype="int64"),
            "tf": pd.Series(dtype="int64"),
            "dl": pd.Series(dtype="int64"),
        })
        dl_rows = pdf[pdf["term"].isna()]
        notna = pdf[pdf["term"].notna()]
        fmask = notna["term"].str.endswith(":")
        sidecars = {}
        for fterm, grp in notna[fmask].groupby("term"):
            sidecars[fterm] = (
                np.cumsum(varbyte_decode(
                    bytes(grp["doc_blob"].iloc[0]))).astype(np.int64),
                varbyte_decode(bytes(grp["tf_blob"].iloc[0])).astype(np.int64))
        term_rows = notna[~fmask]
        if dl_rows.empty or term_rows.empty:
            return empty
        sidecars[None] = (
            np.cumsum(varbyte_decode(
                bytes(dl_rows["doc_blob"].iloc[0]))).astype(np.int64),
            varbyte_decode(bytes(dl_rows["tf_blob"].iloc[0])).astype(np.int64))
        ts, ds, fs, dls = [], [], [], []
        for term, dblob, tblob in zip(term_rows["term"], term_rows["doc_blob"],
                                      term_rows["tf_blob"]):
            docs = np.cumsum(varbyte_decode(bytes(dblob))).astype(np.int64)
            ts.append(np.full(len(docs), term, dtype=object))
            ds.append(docs)
            fs.append(varbyte_decode(bytes(tblob)).astype(np.int64))
            fld = _term_field(term)
            sd, sv = sidecars.get(
                (fld + ":") if fld is not None else None, sidecars[None])
            dls.append(sv[np.searchsorted(sd, docs)])
        return pd.DataFrame({
            "term": np.concatenate(ts),
            "doc_id": np.concatenate(ds),
            "tf": np.concatenate(fs),
            "dl": np.concatenate(dls),
        })

    return routed_segment_groupby(
        segs, live_seg_ids(load_stats(paths))).applyInPandas(
        decode, schema="term string, doc_id long, tf long, dl long")


def phrase_matches_df(spark: SparkSession, paths: IndexPaths,
                      phrase: str, slop: int = 0) -> DataFrame:
    """(doc_id, tf, dl) for EVERY doc containing the phrase (positional
    intersection per segment — the unbounded-k inner kernel of
    ``phrase_topk_wand``; ``slop`` > 0 = Lucene sloppy phrase), for callers
    that need full match sets rather than a top-k (e.g. mixed query_string
    scoring)."""
    hits = _phrase_hits(spark, paths, phrase, slop)
    return (spark.createDataFrame([], "doc_id long, tf long, dl long")
            if hits is None else hits)


def wildcard_term_pred(pattern: str) -> Column | None:
    """Dictionary predicate for a wildcard atom (term matches pattern), or
    None when the pattern can never match a token. Pure-prefix patterns
    (`foo*`) compile to startsWith so the parquet dictionary scan gets a
    StringStartsWith pushdown; general patterns anchor-match via rlike."""
    import re as _re

    from ..queryparser import wildcard_token_body

    body = wildcard_token_body(pattern)
    if body is None:
        return None
    p = pattern.lower()
    if _re.fullmatch(r"[a-z0-9]+\*", p):
        # field-qualified dictionary entries ("title:batch") and per-field
        # norm sidecars ("title:") share the dictionary; a main-text prefix
        # pattern must never match them (tokens are [a-z0-9]+, no ':')
        return (F.col("term").startswith(p[:-1])
                & ~F.col("term").contains(":"))
    return F.col("term").rlike(f"^({body})$")


def regexp_term_pred(pattern: str) -> Column:
    """Dictionary predicate for a `/regexp/` atom: the (validated, common
    Java/RE2/Python dialect) pattern fullmatches a dictionary term —
    Lucene RegexpQuery's automaton intersection as a distributed
    dictionary scan."""
    from ..queryparser import regexp_token_body

    # '.' / negated classes in the dialect can match ':' — exclude the
    # field-qualified dictionary namespace (a token never contains ':')
    return (F.col("term").rlike(f"^(?:{regexp_token_body(pattern)})$")
            & ~F.col("term").contains(":"))


def fuzzy_term_pred(token: str, max_edits: int) -> Column:
    """Dictionary predicate for a fuzzy atom: classic Levenshtein bound,
    with a cheap length-band prefilter so the JVM edit-distance only runs
    on plausible dictionary rows."""
    t = token.lower()
    return (
        F.length("term").between(len(t) - max_edits, len(t) + max_edits)
        & ~F.col("term").contains(":")  # never expand into field namespace
        & (F.levenshtein(F.col("term"), F.lit(t)) <= max_edits)
    )


def querystring_topk(
    spark: SparkSession,
    paths: IndexPaths,
    query_string: str,
    k: int,
) -> DataFrame:
    """Top-k BM25 over a full ES query_string with MIXED positive clauses —
    bare terms AND quoted phrases scored together (ES's flagship surface,
    ref F2 /root/reference/app/helpers/es.py:238-250; quoted phrases
    throughout documentation/CONFIG_OUTLIERS.md examples), entirely off the
    index: term contributions from the posting lists, phrase contributions
    from the positional blobs, summed per doc (SHOULD semantics — a doc
    matching any positive clause scores), global top-k via TakeOrdered.
    Negated/field clauses are filter-only in ES scoring and are not part of
    this scorer — compose with ``indexed_filter`` for those.

    Wildcard (`fo?bar*`) and fuzzy (`term~1`) atoms use Lucene's
    scoring_boolean rewrite: the atom expands against the term dictionary
    (a distributed termstats/segments scan with the pattern predicate — no
    driver-side term list) and every expanded term contributes its own
    BM25 clause. Sloppy phrases (`"a b"~2`) score with the sloppy tf."""
    from ..queryparser import parse_query_string

    node = parse_query_string(query_string)
    node = _resolve_analyzed_for(paths, node)
    scores = _text_scores(spark, paths, node)
    if scores is None:
        return spark.createDataFrame([], TOPK_SCHEMA)
    return scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def _text_scores(spark: SparkSession, paths: IndexPaths,
                 node) -> DataFrame | None:
    """(doc_id, score) = summed BM25 contributions of the AST's positive
    text atoms (terms / wildcards / fuzzies / phrases), entirely off the
    index. None when the query has no scorable atoms."""
    from ..queryparser import collect_query_atoms

    atoms = collect_query_atoms(node)
    stats = load_stats(paths)
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]
    fnorms = _field_norms(stats)

    def bm25(tf_col, idf_col, avgdl_col):
        return (
            idf_col * (tf_col * (K1 + 1.0))
            / (tf_col + K1 * (1.0 - B + B * F.col("dl") / avgdl_col))
        )

    # per-term norm columns: `field:token` dictionary entries score with the
    # field's docCount (idf) and avgdl (norm) — Lucene per-field similarity;
    # main-text terms keep the corpus stats (fnorms empty → constants)
    if fnorms:
        n_map = F.create_map(*[F.lit(x) for f_, (nn, aa) in fnorms.items()
                               for x in (f_, float(nn))])
        a_map = F.create_map(*[F.lit(x) for f_, (nn, aa) in fnorms.items()
                               for x in (f_, float(aa))])
        fld_col = F.when(F.col("term").contains(":"),
                         F.substring_index(F.col("term"), ":", 1))
        n_col = F.coalesce(n_map[fld_col], F.lit(float(n_docs)))
        a_col = F.coalesce(a_map[fld_col], F.lit(float(avgdl)))
    else:
        n_col = F.lit(float(n_docs))
        a_col = F.lit(float(avgdl))

    contribs: list[DataFrame] = []
    # ONE fused dictionary scan for every term-shaped atom (literal terms,
    # wildcards, fuzzies): the combined predicate rides the segment parquet
    # scan once, and each dictionary term carries the SUM of the boosts of
    # the atoms it satisfies — exact under score summation (a term matched
    # by both a literal and a pattern contributes both clauses), and N
    # atoms cost one scan + one shuffle instead of N of each.
    legs: list[tuple[Column, Column]] = []  # (term predicate, weight)
    if atoms["terms"]:
        boosts = dict(atoms["terms"])
        terms = list(boosts)
        w_map = F.create_map(
            *[F.lit(x) for t in terms for x in (t, float(boosts[t]))])
        legs.append((F.col("term").isin(terms), w_map[F.col("term")]))
    for w, b in atoms["wildcards"]:
        pred = wildcard_term_pred(w)
        if pred is not None:
            legs.append((pred, F.lit(float(b))))
    for p, b in atoms.get("regexps", []):
        legs.append((regexp_term_pred(p), F.lit(float(b))))
    for t, n, b in atoms["fuzzies"]:
        legs.append((fuzzy_term_pred(t, n), F.lit(float(b))))
    if legs:
        combined = legs[0][0]
        for pred, _ in legs[1:]:
            combined = combined | pred
        weight = None
        for pred, wcol in legs:
            part = F.when(pred, wcol).otherwise(F.lit(0.0))
            weight = part if weight is None else weight + part
        exp_stats = (
            spark.read.parquet(paths.termstats).where(combined)
            .select("term", F.col("df").cast("double").alias("__df"),
                    weight.alias("__w"), n_col.alias("__n"),
                    a_col.alias("__avgdl"))
        )
        post = posting_tfs_df(spark, paths, term_pred=combined)
        idf_col = F.log(
            1.0 + (F.col("__n") - F.col("__df") + 0.5)
            / (F.col("__df") + 0.5)) * F.col("__w")
        contribs.append(
            post.join(F.broadcast(exp_stats), "term").select(
                "doc_id",
                bm25(F.col("tf"), idf_col,
                     F.col("__avgdl")).alias("contrib")))
    # phrase atoms: df (docs containing the phrase) is needed for idf. A
    # driver-side count per phrase costs one synchronized job each (P+1
    # jobs for P phrases), and a broadcast-join of the count recomputes the
    # positional intersection (measured 4x slower at 600k). Instead ALL
    # phrase hits union into one tagged frame materialized ONCE by an eager
    # localCheckpoint (truncates lineage; blocks are freed when the query's
    # DataFrames are GC'd — nothing pinned in the cache manager), then one
    # tiny collect yields every phrase's df and the contribution uses
    # literal idfs over the checkpointed rows: 2 jobs and 1x compute for
    # any number of phrases.
    ph_parts = []
    ph_boosts: dict[int, float] = {}
    ph_norm: dict[int, tuple[int, float]] = {}
    for i, (p, slop, boost) in enumerate(atoms["phrases"]):
        h = _phrase_hits(spark, paths, p, slop)
        if h is not None:
            ph_parts.append(h.select(
                "doc_id", "tf", "dl", F.lit(i).alias("__pk")))
            ph_boosts[i] = float(boost)
            # per-field phrases (qualified tokens) use the field's norms
            ph_norm[i] = _term_norm(p[0], fnorms, n_docs, avgdl)
    if ph_parts:
        tagged = ph_parts[0]
        for x in ph_parts[1:]:
            tagged = tagged.unionByName(x)
        tagged = tagged.localCheckpoint(eager=True)
        dfs = {int(r["__pk"]): int(r["n"]) for r in
               tagged.groupBy("__pk").agg(F.count("*").alias("n")).collect()}
        idf_map = F.create_map(*[
            F.lit(v) for i, n in dfs.items()
            for v in (i, _idf(ph_norm[i][0], n) * ph_boosts[i])])
        avgdl_map = F.create_map(*[
            F.lit(v) for i in dfs
            for v in (i, float(ph_norm[i][1]))])
        contribs.append(tagged.select(
            "doc_id",
            bm25(F.col("tf"), idf_map[F.col("__pk")],
                 avgdl_map[F.col("__pk")]).alias("contrib")))
    if not contribs:
        return None
    allc = contribs[0]
    for c in contribs[1:]:
        allc = allc.unionByName(c)
    return allc.groupBy("doc_id").agg(F.sum("contrib").alias("score"))


def search_topk(
    spark: SparkSession,
    paths: IndexPaths,
    docs: DataFrame,
    doc_col: str,
    text_col: str,
    query_string: str,
    k: int,
    columns: list[str],
) -> DataFrame:
    """The complete ES query execution in one call (the shape every
    reference use-case file issues — es_query_filter mixes scored text
    clauses with field/negated clauses, app/helpers/es.py:238-270):

    - ELIGIBILITY: the full boolean matches (index-backed ``indexed_filter``
      — posting semi-joins, positional phrases, dictionary patterns; no
      corpus-text regex),
    - SCORE: the sum of the positive text atoms' BM25 contributions off the
      index (``_text_scores``). Field/negated clauses gate but score 0,
      like ES filter context; eligible docs with no scorable text atom rank
      by doc_id at score 0.

    Returns (doc_id, score) top-k. Both legs read posting lists; the score
    join is doc_id-keyed and candidate-sized, never corpus-sized. A
    text-only boolean skips the docs table entirely (``matching_ids`` —
    the ES behavior: a query with no field clauses never reads _source)."""
    from ..index.filter import indexed_filter, matching_ids, text_only

    node = __parse(query_string)
    node = _resolve_analyzed_for(paths, node)
    if text_only(node, bool(load_stats(paths).get("positions"))):
        # matching_ids resolves against the INDEXED universe (incl. NOT /
        # match-all); semi-join against the caller's docs so a filtered
        # subset never yields hits outside it — Catalyst prunes the docs
        # scan to the id column, the same guarantee indexed_filter gives
        eligible = matching_ids(spark, paths, node).join(
            docs.select(F.col(doc_col).cast("long").alias("doc_id")),
            "doc_id", "left_semi")
    else:
        eligible = indexed_filter(
            spark, paths, docs, doc_col, text_col, node, columns,
        ).select(F.col(doc_col).cast("long").alias("doc_id"))
    scores = _text_scores(spark, paths, node)
    if scores is None:
        out = eligible.withColumn("score", F.lit(0.0))
    else:
        out = eligible.join(scores, "doc_id", "left").select(
            "doc_id", F.coalesce(F.col("score"), F.lit(0.0)).alias("score"))
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def __parse(query_string: str):
    from ..queryparser import parse_query_string
    return parse_query_string(query_string)


def _resolve_analyzed_for(paths: IndexPaths, node):
    """Mapping consultation (ES-style): rewrite field atoms on fields the
    index declares analyzed into index-backed FieldText atoms."""
    from ..queryparser import resolve_analyzed
    return resolve_analyzed(node, load_stats(paths).get("analyzed_fields"))


# --------------------------------------------------------------------------
# block-max WAND path (compressed segments)
# --------------------------------------------------------------------------

def doclen_df(spark: SparkSession, paths: IndexPaths) -> DataFrame:
    """(doc_id, dl) decoded from the per-segment doclen sidecar rows — the
    corpus text is never re-tokenized once an index exists."""
    segs = read_live_segments(spark, paths).where(
        F.col("term").isNull()
    ).select("doc_blob", "tf_blob")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for dblob, tblob in zip(pdf["doc_blob"], pdf["tf_blob"]):
                docs = np.cumsum(varbyte_decode(bytes(dblob))).astype(np.int64)
                dls = varbyte_decode(bytes(tblob)).astype(np.int64)
                yield pd.DataFrame({"doc_id": docs, "dl": dls})

    return segs.mapInPandas(decode, schema="doc_id long, dl long")


class _TermCursor:
    """Lazy block-decoding posting cursor.

    The compressed blobs are kept as bytes; one vectorized pass over the
    continuation bits yields per-value byte boundaries WITHOUT decoding, and
    a 128-posting block is decoded (delta-cumsum re-based on the previous
    block's last docID) only when the cursor actually lands in it. Seeks go
    through ``block_last_doc`` — skipped blocks are never decompressed and
    their doc-length gathers never happen (Ding & Suel's block-max WAND
    skip benefit applied to decompression, not just score bounds)."""

    __slots__ = ("doc_blob", "tf_blob", "doc_ends", "tf_ends", "n",
                 "dl_docs", "dl_vals", "idf", "avgdl", "pos",
                 "block_last", "block_max", "max_score",
                 "blk", "blk_docs", "blk_tfs", "blk_dls")

    def __init__(self, doc_blob, tf_blob, dl_docs, dl_vals, idf,
                 block_last, block_max, avgdl=None):
        self.doc_blob = doc_blob
        self.tf_blob = tf_blob
        db = np.frombuffer(doc_blob, dtype=np.uint8)
        tb = np.frombuffer(tf_blob, dtype=np.uint8)
        self.doc_ends = np.flatnonzero((db & 0x80) == 0)
        self.tf_ends = np.flatnonzero((tb & 0x80) == 0)
        self.n = len(self.doc_ends)
        self.dl_docs = dl_docs
        self.dl_vals = dl_vals
        self.idf = idf
        self.avgdl = avgdl  # the term's OWN norm (per-field for field:token)
        self.pos = 0
        self.block_last = np.asarray(block_last, dtype=np.int64)
        self.block_max = block_max  # idf-scaled block upper bounds
        self.max_score = float(block_max.max()) if len(block_max) else 0.0
        self.blk = -1

    def _load(self, b: int) -> None:
        lo, hi = 128 * b, min(128 * (b + 1), self.n)
        dlo = 0 if lo == 0 else int(self.doc_ends[lo - 1]) + 1
        dhi = int(self.doc_ends[hi - 1]) + 1
        gaps = varbyte_decode(self.doc_blob[dlo:dhi]).astype(np.int64)
        base = int(self.block_last[b - 1]) if b > 0 else 0
        self.blk_docs = np.cumsum(gaps) + base
        tlo = 0 if lo == 0 else int(self.tf_ends[lo - 1]) + 1
        thi = int(self.tf_ends[hi - 1]) + 1
        self.blk_tfs = varbyte_decode(self.tf_blob[tlo:thi]).astype(np.int64)
        self.blk_dls = self.dl_vals[np.searchsorted(self.dl_docs, self.blk_docs)]
        self.blk = b

    def _ensure(self):
        b = self.pos // 128
        if b != self.blk:
            self._load(b)
        return b

    def cur_doc(self):
        if self.pos >= self.n:
            return None
        b = self._ensure()
        return int(self.blk_docs[self.pos - 128 * b])

    def seek(self, target):
        """Jump to the first posting with doc ≥ target: block skip via
        block_last_doc, then searchsorted inside the single decoded block."""
        if self.pos >= self.n:
            return
        nb = int(np.searchsorted(self.block_last, target, side="left"))
        nb = max(nb, self.pos // 128)
        if nb >= len(self.block_last):
            self.pos = self.n
            return
        if nb != self.blk:
            self._load(nb)
        i = int(np.searchsorted(self.blk_docs, target, side="left"))
        self.pos = max(self.pos, 128 * nb + i)

    def block_ub(self):
        """Upper-bound score of the block containing the current posting."""
        b = self.pos // 128
        return self.block_max[min(b, len(self.block_max) - 1)]

    def score_cur(self, avgdl):
        av = self.avgdl if self.avgdl is not None else avgdl
        b = self._ensure()
        i = self.pos - 128 * b
        tf = float(self.blk_tfs[i])
        dl = float(self.blk_dls[i])
        return self.idf * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / av))


def _topk_merge(cur_s: np.ndarray, cur_d: np.ndarray,
                s: np.ndarray, d: np.ndarray, k: int):
    """Merge candidate (score, doc) arrays into a running top-k kept as two
    numpy arrays ordered (score desc, doc asc)."""
    cs = np.concatenate([cur_s, s])
    cd = np.concatenate([cur_d, d])
    order = np.lexsort((cd, -cs))[:k]
    return cs[order], cd[order]


def _single_term_segment(c: _TermCursor, k: int, avgdl: float
                         ) -> list[tuple[int, float]]:
    """Single-cursor top-k, vectorized per 128-block with block-max pruning:
    blocks are visited in DESCENDING upper-bound order and the scan stops as
    soon as a block's bound cannot beat the running threshold — the same
    skip guarantee as WAND, but each surviving block is scored in one numpy
    pass instead of one interpreted Python iteration per posting (the round-2
    head-query regression was exactly this loop)."""
    nblk = len(c.block_max)
    av = c.avgdl if c.avgdl is not None else avgdl
    cur_s = np.empty(0, np.float64)
    cur_d = np.empty(0, np.int64)
    theta = -np.inf
    for b in np.argsort(-np.asarray(c.block_max), kind="stable"):
        if len(cur_s) == k and c.block_max[b] < theta:
            break  # sorted desc: nothing later can beat the heap either
        c._load(int(b))
        scores = c.idf * _impact_np(c.blk_tfs, c.blk_dls, av)
        cur_s, cur_d = _topk_merge(cur_s, cur_d, scores, c.blk_docs, k)
        if len(cur_s) == k:
            theta = cur_s[-1]
    return list(zip(cur_d.tolist(), cur_s.tolist()))


def _impact_np(tf: np.ndarray, dl: np.ndarray, avgdl: float) -> np.ndarray:
    tf = tf.astype(np.float64)
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl.astype(np.float64) / avgdl))


def _gather_tfs(c: _TermCursor, cand: np.ndarray) -> np.ndarray:
    """tf for each candidate docID (0 = absent), decoding ONLY the blocks a
    candidate lands in (block_last_doc skip pointers, vectorized): the
    classic conjunction pattern — iterate the smallest list, skip-probe the
    big ones — so a head-term list is never fully decompressed."""
    out = np.zeros(len(cand), dtype=np.int64)
    nb = np.searchsorted(c.block_last, cand, side="left")
    inside = nb < len(c.block_last)
    for b in np.unique(nb[inside]):
        sel = np.flatnonzero(nb == b)
        c._load(int(b))
        idx = np.searchsorted(c.blk_docs, cand[sel])
        ok = idx < len(c.blk_docs)
        ok[ok] &= c.blk_docs[idx[ok]] == cand[sel][ok]
        out[sel[ok]] = c.blk_tfs[idx[ok]]
    return out


def _and_segment(cursors: list[_TermCursor], k: int, avgdl: float
                 ) -> list[tuple[int, float]]:
    """Conjunctive top-k, vectorized: decode the SMALLEST posting list in
    full, skip-probe every other list for those candidates only (block-level
    decode via _gather_tfs), then score the surviving intersection in one
    numpy pass. Conjunction selectivity means candidates ≤ min(df) — the
    rare term bounds the work, the head term is probed, never scanned."""
    base = min(cursors, key=lambda c: c.n)
    cand = np.cumsum(varbyte_decode(base.doc_blob)).astype(np.int64)
    tfs = {id(base): varbyte_decode(base.tf_blob).astype(np.int64)}
    for c in cursors:
        if c is base:
            continue
        t = _gather_tfs(c, cand)
        keep = t > 0
        cand = cand[keep]
        for key in tfs:
            tfs[key] = tfs[key][keep]
        tfs[id(c)] = t[keep]
        if cand.size == 0:
            return []
    # per-cursor doc lengths: a field:token cursor normalizes by the FIELD's
    # lengths (its own dl sidecar); cursors sharing a sidecar share gathers
    dl_cache: dict[int, np.ndarray] = {}

    def dls_for(c):
        got = dl_cache.get(id(c.dl_docs))
        if got is None:
            got = c.dl_vals[np.searchsorted(c.dl_docs, cand)]
            dl_cache[id(c.dl_docs)] = got
        return got

    score = np.zeros(len(cand), dtype=np.float64)
    for c in cursors:
        av = c.avgdl if c.avgdl is not None else avgdl
        score += c.idf * _impact_np(tfs[id(c)], dls_for(c), av)
    order = np.lexsort((cand, -score))[:k]
    return list(zip(cand[order].tolist(), score[order].tolist()))


def _or_segment(cursors: list[_TermCursor], k: int, avgdl: float
                ) -> list[tuple[int, float]]:
    """Vectorized block-max WAND for multi-term disjunctions.

    The doc space is partitioned into chunks on the densest cursor's
    128-posting block grid; each chunk's upper bound is Σ over cursors of the
    max block-max overlapping it (every block contributes to every chunk it
    overlaps, so the bound is safe). Chunks are visited in DESCENDING bound
    order — θ rises as fast as possible — and processing stops at the first
    chunk whose bound is strictly below θ: the same skip guarantee as the
    document-at-a-time WAND loop (kept as the differential reference in
    ``_wand_segment``), but each surviving chunk is scored in one numpy pass
    (gather → impact → unique-accumulate → top-k merge) instead of one
    interpreted Python iteration per pivot. At 600k docs this turned the
    4-term disjunction from seconds of pure-Python pivot walking into
    milliseconds of numpy.

    Decompression is LAZY per 128-block: a chunk decodes only the blocks
    that overlap it (via each cursor's block_last_doc directory — block
    boundaries need no decoding), and once θ kills the remaining chunks
    their blocks are never decompressed. A head-term list in a skipped
    region costs nothing — the round-3 eager whole-list decode is gone."""
    # per-cursor decoded-block cache: blk → (doc ids, idf-scaled impacts);
    # _load allocates fresh arrays per call, so cached refs stay valid
    caches: list[dict[int, tuple[np.ndarray, np.ndarray]]] = [
        {} for _ in cursors]

    def chunk_postings(ci: int, lo: int, hi: int):
        """(docs, impacts) of cursor ci within [lo, hi], decoding only the
        overlapping blocks."""
        c = cursors[ci]
        bl = c.block_last
        if len(bl) == 0 or lo > int(bl[-1]):
            return None
        b0 = int(np.searchsorted(bl, lo, side="left"))
        b1 = min(int(np.searchsorted(bl, hi, side="left")), len(bl) - 1)
        pd_, ps_ = [], []
        for b in range(b0, b1 + 1):
            got = caches[ci].get(b)
            if got is None:
                c._load(b)
                av = c.avgdl if c.avgdl is not None else avgdl
                got = (c.blk_docs,
                       c.idf * _impact_np(c.blk_tfs, c.blk_dls, av))
                caches[ci][b] = got
            docs, imp = got
            a = int(np.searchsorted(docs, lo, side="left"))
            e = int(np.searchsorted(docs, hi, side="right"))
            if a < e:
                pd_.append(docs[a:e])
                ps_.append(imp[a:e])
        if not pd_:
            return None
        return np.concatenate(pd_), np.concatenate(ps_)

    dense = max(cursors, key=lambda c: c.n)
    grid = np.asarray(dense.block_last, dtype=np.int64)
    # block_last_doc covers the final partial block, so each cursor's last
    # doc is its block_last[-1] — no decode needed for the grid bound
    max_doc = max(int(c.block_last[-1]) for c in cursors
                  if len(c.block_last))
    if len(grid) == 0 or grid[-1] < max_doc:
        grid = np.append(grid, max_doc)
    m = len(grid)

    tot_ub = np.zeros(m, dtype=np.float64)
    for c in cursors:
        bl = np.asarray(c.block_last, dtype=np.int64)
        if len(bl) == 0:
            continue
        first_doc = np.concatenate(([0], bl[:-1] + 1))
        j_start = np.searchsorted(grid, first_doc, side="left")
        j_end = np.searchsorted(grid, bl, side="left")
        cub = np.zeros(m, dtype=np.float64)
        idx = np.concatenate(
            [np.arange(s, e + 1) for s, e in zip(j_start, j_end)])
        vals = np.repeat(np.asarray(c.block_max, dtype=np.float64),
                         j_end - j_start + 1)
        np.maximum.at(cub, idx, vals)
        tot_ub += cub

    cur_s = np.empty(0, np.float64)
    cur_d = np.empty(0, np.int64)
    theta = -np.inf
    for j in np.argsort(-tot_ub, kind="stable"):
        if len(cur_s) == k and tot_ub[j] < theta:
            break  # descending bounds: every later chunk is below θ too
        lo = int(grid[j - 1]) + 1 if j > 0 else 0
        hi = int(grid[j])
        parts_d, parts_s = [], []
        for ci in range(len(cursors)):
            got = chunk_postings(ci, lo, hi)
            if got is not None:
                parts_d.append(got[0])
                parts_s.append(got[1])
        if not parts_d:
            continue
        d = np.concatenate(parts_d)
        s = np.concatenate(parts_s)
        ud, inv = np.unique(d, return_inverse=True)
        us = np.zeros(len(ud), dtype=np.float64)
        np.add.at(us, inv, s)
        cur_s, cur_d = _topk_merge(cur_s, cur_d, us, ud, k)
        if len(cur_s) == k:
            theta = cur_s[-1]
    return list(zip(cur_d.tolist(), cur_s.tolist()))


def _wand_segment(
    cursors: list[_TermCursor], k: int, avgdl: float, mode: str
) -> list[tuple[int, float]]:
    """Document-at-a-time WAND with block-max refinement over one segment.
    Kept as the differential reference for the vectorized paths
    (``_single_term_segment`` / ``_and_segment`` / ``_or_segment``) — the
    per-pivot Python loop is exact but interpreter-bound on big segments."""
    heap: list[tuple[float, int]] = []  # (score, -doc) min-heap of size k
    theta = 0.0
    n_req = len(cursors) if mode == "and" else 1
    live = [c for c in cursors if c.cur_doc() is not None]
    while len(live) >= n_req:
        live.sort(key=lambda c: c.cur_doc())
        # find pivot: smallest prefix whose Σ max_score ≥ θ (and ≥ n_req terms)
        acc = 0.0
        pivot_i = None
        for i, c in enumerate(live):
            acc += c.max_score
            if i + 1 >= n_req and acc >= theta:
                pivot_i = i
                break
        if pivot_i is None:
            break
        pivot_doc = live[pivot_i].cur_doc()
        if mode == "and":
            pivot_doc = live[-1].cur_doc()  # conjunction: align on max
            pivot_i = len(live) - 1
        if all(live[i].cur_doc() == pivot_doc for i in range(pivot_i + 1)):
            # extend the pivot over ties: cursors beyond pivot_i whose current
            # doc IS pivot_doc contribute to the real score, so they must be
            # inside the block-max upper bound too (PISA block_max_wand does
            # the same) — otherwise ub underestimates and full docs get
            # skipped once the heap is full
            while (pivot_i + 1 < len(live)
                   and live[pivot_i + 1].cur_doc() == pivot_doc):
                pivot_i += 1
            # block-max check: refine the upper bound with block maxima
            ub = sum(c.block_ub() for c in live[: pivot_i + 1])
            full_eval = ub >= theta or len(heap) < k
            if full_eval:
                score = 0.0
                matched = 0
                for c in live:
                    if c.cur_doc() == pivot_doc:
                        score += c.score_cur(avgdl)
                        matched += 1
                if matched >= n_req:
                    # rank order: score desc, doc asc → heap key (score, -doc)
                    item = (score, -int(pivot_doc))
                    if len(heap) < k:
                        heapq.heappush(heap, item)
                    elif item > heap[0]:
                        heapq.heapreplace(heap, item)
                    if len(heap) == k:
                        theta = heap[0][0]
            for c in live:
                if c.cur_doc() == pivot_doc:
                    c.pos += 1
        else:
            # advance all pre-pivot cursors to the pivot doc (skip via blocks)
            for c in live[:pivot_i]:
                c.seek(pivot_doc)
        live = [c for c in live if c.cur_doc() is not None]
        if mode == "and" and len(live) < len(cursors):
            break
    out = [(-d, s) for s, d in heap]
    out.sort(key=lambda x: (-x[1], x[0]))
    return out


def bm25_topk_wand(
    spark: SparkSession,
    paths: IndexPaths,
    terms: list[str],
    k: int,
    mode: str = "or",
) -> DataFrame:
    """Block-max WAND over SPIMI segments → global top-k DataFrame."""
    terms = list(dict.fromkeys(terms))
    stats = load_stats(paths)
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]
    fnorms = _field_norms(stats)

    tstats = _termstats_lookup(paths, terms)
    # field:token entries take the FIELD's docCount/avgdl (per-field norms)
    idfs = {t: _idf(_term_norm(t, fnorms, n_docs, avgdl)[0], d)
            for t, d in tstats.items()}
    if not idfs or (mode == "and" and len(idfs) < len(terms)):
        # conjunction with a zero-df term matches nothing (oracle semantics)
        return spark.createDataFrame([], TOPK_SCHEMA)

    side_terms = sorted({
        fld + ":" for fld in (_term_field(t) for t in terms)
        if fld is not None and fld in fnorms})

    # single scan: query-term rows + the doclen sidecar row, co-located per
    # segment — the filter pushes to parquet (term IN (...) OR term IS NULL)
    # column pruning matters: pos_blob (when the index is positional) is the
    # largest column in the segment table and WAND never touches it — the
    # select keeps it out of the parquet scan entirely
    segs = read_live_segments(spark, paths).where(
        F.col("term").isin(terms + side_terms) | F.col("term").isNull()
    ).select("seg_id", "term", "doc_blob", "tf_blob",
             "block_last_doc", "block_max_tf", "block_min_dl")

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                              "score": pd.Series(dtype="float64")})
        dl_rows = pdf[pdf["term"].isna()]
        notna = pdf[pdf["term"].notna()]
        side = {}
        for ft in side_terms:
            grp = notna[notna["term"] == ft]
            if not grp.empty:
                side[ft] = (
                    np.cumsum(varbyte_decode(
                        bytes(grp["doc_blob"].iloc[0]))).astype(np.int64),
                    varbyte_decode(
                        bytes(grp["tf_blob"].iloc[0])).astype(np.int64))
        term_rows = (notna[~notna["term"].isin(side_terms)]
                     if side_terms else notna)
        if dl_rows.empty or term_rows.empty:
            return empty
        dl_docs = np.cumsum(
            varbyte_decode(bytes(dl_rows["doc_blob"].iloc[0]))).astype(np.int64)
        dl_vals = varbyte_decode(bytes(dl_rows["tf_blob"].iloc[0])).astype(np.int64)
        cursors = []
        for _, row in term_rows.iterrows():
            idf = idfs[row["term"]]
            c_docs, c_vals = dl_docs, dl_vals
            fld = _term_field(row["term"])
            if fld is not None and (fld + ":") in side:
                c_docs, c_vals = side[fld + ":"]
            _, c_av = _term_norm(row["term"], fnorms, n_docs, avgdl)
            # block upper bounds from avgdl-independent (max_tf, min_dl) —
            # min_dl of field:token rows is the FIELD's min dl (build-side)
            bmax = block_upper_bound(
                row["block_max_tf"], row["block_min_dl"], c_av
            ) * idf
            cursors.append(_TermCursor(
                bytes(row["doc_blob"]), bytes(row["tf_blob"]),
                c_docs, c_vals, idf, row["block_last_doc"], bmax,
                avgdl=c_av,
            ))
        if mode == "and" and len(cursors) < len(idfs):
            return empty
        # dispatch by query shape (all three exact, rank-identical):
        #  - 1 term        → vectorized block-ordered top-k (block-max kept)
        #  - conjunction   → vectorized smallest-list intersection with
        #                    block-skip probes into the longer lists
        #  - disjunction   → document-at-a-time block-max WAND
        if len(cursors) == 1:
            res = _single_term_segment(cursors[0], k, avgdl)
        elif mode == "and":
            res = _and_segment(cursors, k, avgdl)
        else:
            res = _or_segment(cursors, k, avgdl)
        return pd.DataFrame(res, columns=["doc_id", "score"])

    local = routed_segment_groupby(segs, live_seg_ids(stats)).applyInPandas(
        run, schema=TOPK_SCHEMA)
    return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
