"""Pure-Python reference implementation (oracle) of the query engine.

Mirrors the reference's in-memory engine-stub test pattern
(/root/reference/app/tests/unit_tests/test_stubs/test_stub_es.py:29-158):
a tiny, obviously-correct single-process implementation of tokenization,
BM25 scoring and boolean query evaluation that the distributed Spark engine
must match rank-identically (scores to 1e-6, ranks exactly).

BM25 parameters are Lucene's defaults — the scoring ES applies to
query_string matches (ref F2, SURVEY §2.2): k1=1.2, b=0.75,
idf = ln(1 + (N - df + 0.5)/(df + 0.5)).
"""

from __future__ import annotations

import math
from collections import Counter

from .tokenizer import tokenize_py

K1 = 1.2
B = 0.75


def bm25_idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_tf_part(tf: float, dl: float, avgdl: float) -> float:
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))


class OracleIndex:
    """In-memory inverted index over {doc_key: text}."""

    def __init__(self, docs: dict) -> None:
        self.docs = docs
        self.toks = {k: tokenize_py(v) for k, v in docs.items()}
        self.dl = {k: len(t) for k, t in self.toks.items()}
        self.n = len(docs)
        self.avgdl = (sum(self.dl.values()) / self.n) if self.n else 0.0
        self.tf: dict = {}  # term -> {doc: tf}
        for k, toks in self.toks.items():
            for term, c in Counter(toks).items():
                self.tf.setdefault(term, {})[k] = c

    def df(self, term: str) -> int:
        return len(self.tf.get(term, {}))

    def score_terms(self, terms: list[str], doc: str | int) -> float:
        """Sum of per-term BM25 contributions for one doc (0 if no term hits)."""
        s = 0.0
        for t in terms:
            posting = self.tf.get(t, {})
            if doc in posting:
                s += bm25_idf(self.n, self.df(t)) * bm25_tf_part(
                    posting[doc], self.dl[doc], self.avgdl
                )
        return s

    def topk(self, terms: list[str], k: int, mode: str = "or") -> list[tuple]:
        """[(doc, score)] ranked score desc, doc asc. mode='and' requires all
        terms present (conjunctive filter context, ref F1)."""
        terms = list(dict.fromkeys(terms))  # dedupe, keep order
        cands: set = set()
        for t in terms:
            cands |= set(self.tf.get(t, {}))
        if mode == "and":
            for t in terms:
                cands &= set(self.tf.get(t, {}))
        scored = [(d, self.score_terms(terms, d)) for d in cands]
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]

    def phrase_topk(self, phrase_tokens: list[str], k: int) -> list[tuple]:
        """Phrase scored with token-position phrase frequency as tf (Lucene
        PhraseQuery semantics: occurrences may overlap, e.g. 'batch batch'
        occurs twice in 'batch batch batch')."""
        m = len(phrase_tokens)
        hits = {}
        for doc, toks in self.toks.items():
            n = sum(
                1
                for i in range(len(toks) - m + 1)
                if toks[i : i + m] == phrase_tokens
            )
            if n:
                hits[doc] = n
        if not hits:
            return []
        dfp = len(hits)
        scored = [
            (
                d,
                bm25_idf(self.n, dfp) * bm25_tf_part(tf, self.dl[d], self.avgdl),
            )
            for d, tf in hits.items()
        ]
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]
