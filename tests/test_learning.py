"""Streaming-ML trio (features / train / classify): numpy duel for
the GD trainer, IG sanity properties, and plan shape (model
broadcasts; the corpus never shuffles in a scoring pass)."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from lucene_solr_spark.analyzer import tokenize_one
from lucene_solr_spark.operators import learning
from lucene_solr_spark.operators.learning import (
    FEATURE_TERMS,
    ITERS,
    LR,
    _gd_weights,
    _labeled,
    q_classify_stream,
    q_features_igain,
    q_train_logit,
)
from lucene_solr_spark.transcripts import transcripts_from_documents


def _np_gd(X: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Independent full-batch GD reference (same pinned contract)."""
    w = np.zeros(X.shape[1])
    for _ in range(ITERS):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        w = w + LR * ((y - p)[:, None] * X).mean(axis=0)
    return w


def test_train_logit_duels_numpy(spark, sf_dir):
    t = transcripts_from_documents(spark, sf_dir).collect()
    X, y = [], []
    for r in t:
        toks = tokenize_one(r.text)
        X.append([1.0] + [float(toks.count(f)) for f in FEATURE_TERMS])
        y.append(1.0 if r.role == "assistant" else 0.0)
    expect = _np_gd(np.array(X), np.array(y))
    got = {r.dim: r.weight for r in q_train_logit(spark, sf_dir).collect()}
    assert sorted(got) == list(range(len(FEATURE_TERMS) + 1))
    for j, w in enumerate(expect):
        assert abs(got[j] - round(w, 4)) <= 1e-4, (j, got[j], w)


def test_train_reduces_log_loss(spark, sf_dir):
    """The trained model must beat the w=0 model on its own corpus
    (full-batch GD on a convex loss cannot do worse)."""
    t = transcripts_from_documents(spark, sf_dir).collect()
    X, y = [], []
    for r in t:
        toks = tokenize_one(r.text)
        X.append([1.0] + [float(toks.count(f)) for f in FEATURE_TERMS])
        y.append(1.0 if r.role == "assistant" else 0.0)
    X, y = np.array(X), np.array(y)
    w = _np_gd(X, y)

    def loss(w):
        p = np.clip(1.0 / (1.0 + np.exp(-(X @ w))), 1e-12, 1 - 1e-12)
        return float(-(y * np.log(p) + (1 - y) * np.log(1 - p)).mean())

    assert loss(w) <= loss(np.zeros_like(w)) + 1e-12


def test_igain_formula_and_bounds(spark, sf_dir):
    """IG per term matches a direct entropy computation and sits in
    [0, H(Y)]."""
    t = transcripts_from_documents(spark, sf_dir).collect()
    n = len(t)
    p = sum(1 for r in t if r.role == "assistant")

    def h2(q):
        if q <= 0 or q >= 1:
            return 0.0
        return -(q * math.log2(q) + (1 - q) * math.log2(1 - q))

    hy = h2(p / n)
    rows = q_features_igain(spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        docs_with = [x for x in t if r.term in set(tokenize_one(x.text))]
        df = len(docs_with)
        dfp = sum(1 for x in docs_with if x.role == "assistant")
        assert (df, dfp) == (r.df, r.df_pos), r.term
        ig = (
            hy
            - (df / n) * h2(dfp / df)
            - ((n - df) / n) * h2((p - dfp) / (n - df) if n > df else 0.0)
        )
        assert abs(r.ig - round(ig, 4)) <= 1e-4, (r.term, r.ig, ig)
        assert -1e-9 <= r.ig <= hy + 1e-9


def test_classify_scores_with_published_weights(spark, sf_dir):
    """Classification must use the 4dp-PUBLISHED weights (the train
    artifact), and rank on the 4dp probability."""
    w = {r.dim: r.weight for r in q_train_logit(spark, sf_dir).collect()}
    rows = q_classify_stream(spark, sf_dir).collect()
    assert len(rows) == 10
    t = {
        (r.conv_id, r.turn_idx): r
        for r in transcripts_from_documents(spark, sf_dir).collect()
    }
    probs = [r.prob for r in rows]
    assert probs == sorted(probs, reverse=True)
    for r in rows:
        src = t[(r.conv_id, r.turn_idx)]
        toks = tokenize_one(src.text)
        z = w[0] + sum(
            w[j + 1] * toks.count(f) for j, f in enumerate(FEATURE_TERMS)
        )
        assert abs(r.prob - round(1.0 / (1.0 + math.exp(-z)), 4)) <= 1e-4
        assert r.label == (1.0 if src.role == "assistant" else 0.0)


def test_gd_model_broadcasts_and_corpus_never_shuffles(spark, sf_dir):
    """Plan shape: every per-doc pass joins the 1-row weight frame via
    BROADCAST (never a shuffled join of the corpus against the model),
    and the gradient reduction is a partial-aggregating groupBy."""
    feats = _labeled(spark, sf_dir)
    w = _gd_weights(feats)
    plan = w._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan, plan[:2000]
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    # gradient reduction: partial_avg before the dim exchange
    assert "partial_avg" in plan or "partial_average" in plan, plan[:3000]


def test_learning_ops_registered():
    from lucene_solr_spark import registry

    for name, _fn, oracle in learning.OPS:
        assert name in registry.QUERIES
        assert registry.ORACLES.get(name) == oracle
        assert oracle is not None
