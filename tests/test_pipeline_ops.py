"""Training-data-pipeline operators vs pure-Python oracles:
minhash-LSH recall against exact Jaccard, simhash fingerprints, LSH-ANN
recall against brute-force cosine."""

import hashlib
import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from ee_outliers_spark.operators.dedup import (
    minhash_lsh_pairs, ngram_jaccard_pairs, simhash, _simhash_tokens,
)
from ee_outliers_spark.operators.similarity import cosine_topk, lsh_topk
from ee_outliers_spark.tokenizer import tokenize_py


def _grams(text, k=3):
    t = tokenize_py(text)
    return {" ".join(t[i:i + k]) for i in range(len(t) - k + 1)}


def _jaccard(a, b):
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


@pytest.fixture(scope="module")
def near_dup_docs(spark):
    base = ("the quick brown fox jumps over the lazy dog while the cat "
            "watches from the window and the bird sings a morning song")
    rows = [(0, base)]
    words = base.split()
    # near dups: drop/replace one word
    for i in range(1, 6):
        w = list(words)
        w[i * 3] = "changed%d" % i
        rows.append((i, " ".join(w)))
    # unrelated docs
    for i in range(6, 20):
        rows.append((i, " ".join("tok%d_%d" % (i, j) for j in range(30))))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_jaccard_exact(spark, near_dup_docs):
    got = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            near_dup_docs, "doc_id", "text", k=3, threshold=0.3,
            max_shingle_df=None,
        ).collect()
    }
    docs = {r["doc_id"]: r["text"] for r in near_dup_docs.collect()}
    want = {}
    for a, b in itertools.combinations(sorted(docs), 2):
        j = _jaccard(_grams(docs[a]), _grams(docs[b]))
        if j >= 0.3:
            want[(a, b)] = j
    assert set(got) == set(want)
    for pair in want:
        assert abs(got[pair] - want[pair]) < 1e-12


def test_minhash_lsh_recall(spark, near_dup_docs):
    got = {
        (r["id1"], r["id2"])
        for r in minhash_lsh_pairs(
            near_dup_docs, "doc_id", "text",
            k=3, num_perm=64, bands=16, threshold=0.4,
        ).collect()
    }
    docs = {r["doc_id"]: r["text"] for r in near_dup_docs.collect()}
    strong = {
        (a, b)
        for a, b in itertools.combinations(sorted(docs), 2)
        if _jaccard(_grams(docs[a]), _grams(docs[b])) >= 0.6
    }
    # all strong true pairs recalled; no wildly-false positives (est>=0.4 but true<0.1)
    assert strong <= got
    for a, b in got:
        assert _jaccard(_grams(docs[a]), _grams(docs[b])) >= 0.1


def test_simhash_matches_python_oracle(spark, near_dup_docs):
    got = {r["doc_id"]: r["simhash"] for r in
           simhash(near_dup_docs, "doc_id", "text").collect()}
    for r in near_dup_docs.collect():
        assert got[r["doc_id"]] == _simhash_tokens(tokenize_py(r["text"]))


def test_simhash_near_for_near_dups(spark, near_dup_docs):
    got = {r["doc_id"]: r["simhash"] for r in
           simhash(near_dup_docs, "doc_id", "text").collect()}
    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(got[0], got[1]) <= 12      # near dup -> close
    assert ham(got[0], got[10]) >= 20     # unrelated -> far


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_lsh_ann_recall(spark, emb):
    rows = emb.collect()
    q = [float(x) for x in rows[0]["embedding"]]
    brute = [r["vec_id"] for r in
             cosine_topk(emb, "vec_id", "embedding", q, 10).collect()]
    approx = [r["vec_id"] for r in
              lsh_topk(emb, "vec_id", "embedding", q, 10).collect()]
    # recall@10 of the approximate path (defaults give ~0.9 here)
    recall = len(set(brute) & set(approx)) / 10
    assert recall >= 0.5, (brute, approx)
    # the query vector itself must always be rank 1 in both
    assert brute[0] == rows[0]["vec_id"] == approx[0]
