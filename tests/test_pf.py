"""edismax pf (phrase-boost) duels — the pinned PhraseQuery-scoring
contract (model.pf_phrases) across all four spellings:

    segment index (scorer._phrase_freqs bonus)
 == brute Catalyst (bm25_df._phrase_count_col bonus)
 == DuckDB oracle  (oracle._phrase_count_sql CTE)
 == numpy reference (this file)

plus the two contract discriminators: pf never changes the match set,
and a second phrase occurrence raises the bonus sub-linearly (tf
saturation), never linearly.

ref: solr/core/src/java/org/apache/solr/search/ExtendedDismaxQParser.java
(pf), lucene/core/src/java/org/apache/lucene/search/PhraseQuery.java
(freq-scored phrase weight).
"""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import numpy as np
import pytest

from lucene_solr_spark.analyzer import tokenize_one
from lucene_solr_spark.index.build import build_index
from lucene_solr_spark.query import bm25_df
from lucene_solr_spark.query.executor import IndexSearcher
from lucene_solr_spark.query.model import B, K1, BooleanSpec
from lucene_solr_spark.query.oracle import bm25_oracle_sql
from lucene_solr_spark.transcripts import transcripts_from_documents

SEEDS = list(range(8))
ROUND = 4


@pytest.fixture(scope="module")
def env(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pfidx"))
    t = transcripts_from_documents(spark, sf_dir)
    build_index(spark, t, root, num_parts=4, lineage_source=sf_dir)
    s = IndexSearcher(spark, root)
    pdf = t.toPandas()
    pdf["toks"] = [tokenize_one(x) for x in pdf["text"]]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    return s, t, pdf, con


def _phrase_count(toks: list[str], phrase: tuple[str, ...]) -> int:
    n = len(phrase)
    return sum(
        1 for i in range(len(toks) - n + 1)
        if tuple(toks[i : i + n]) == phrase
    )


def brute_pf_topk(pdf, spec: BooleanSpec, k: int):
    """numpy/pandas reference of the pinned contract: base BM25 over
    the SHOULD disjunction + pf_boost × Σidf(ph) × sat(phrase tf)."""
    n_docs = len(pdf)
    avgdl = sum(len(t) for t in pdf["toks"]) / n_docs
    df = Counter()
    for toks in pdf["toks"]:
        for t in set(toks):
            df[t] += 1

    def idf(t):
        return math.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))

    rows = []
    for r in pdf.itertuples():
        toks = r.toks
        dl = len(toks)
        tf = Counter(toks)
        norm = K1 * (1 - B + B * dl / avgdl)
        score = sum(
            idf(t) * (tf[t] * (K1 + 1)) / (tf[t] + norm)
            for t in spec.should
            if tf[t] > 0
        )
        if not any(tf[t] > 0 for t in spec.should):
            continue
        for ph in spec.pf_phrases:
            cnt = _phrase_count(toks, ph)
            if cnt:
                isum = sum(idf(t) for t in ph)
                score += (
                    spec.pf_boost * isum * (cnt * (K1 + 1)) / (cnt + norm)
                )
        rows.append((r.conv_id, int(r.turn_idx), round(score, ROUND)))
    rows.sort(key=lambda x: (-x[2], x[0], x[1]))
    return rows[:k]


def rand_pf(rng: np.random.Generator, pdf):
    """An n-gram actually present in some doc → guaranteed pf hits."""
    n = int(rng.integers(2, 4))
    for _ in range(50):
        row = pdf.iloc[int(rng.integers(0, len(pdf)))]
        toks = row["toks"]
        if len(toks) < n:
            continue
        start = int(rng.integers(0, len(toks) - n + 1))
        ph = tuple(toks[start : start + n])
        if len(set(ph)) == len(ph):  # distinct terms: cleaner duel
            return ph
    return ("merge", "data")


@pytest.mark.parametrize("seed", SEEDS)
def test_pf_duel(env, seed):
    s, t, pdf, con = env
    rng = np.random.default_rng(seed)
    ph = rand_pf(rng, pdf)
    boost = float(rng.choice([0.5, 1.0, 2.0, 3.5]))
    spec = BooleanSpec(
        should=ph, min_should_match=1,
        pf_phrases=(ph,), pf_boost=boost, k=25,
    )

    want = brute_pf_topk(pdf, spec, spec.k)
    assert any(
        _phrase_count(r.toks, ph) > 0 for r in pdf.itertuples()
    ), ph  # construction guarantees phrase hits

    got_idx = [
        (r.conv_id, int(r.turn_idx), float(r.score))
        for r in s.search(spec, round_to=ROUND).collect()
    ]
    assert got_idx == want, (ph, boost)

    got_df = [
        (r.conv_id, int(r.turn_idx), float(r.score))
        for r in bm25_df.search(t, spec, round_to=ROUND).collect()
    ]
    assert got_df == want, (ph, boost)

    got_duck = [
        (r[0], int(r[1]), float(r[2]))
        for r in con.execute(bm25_oracle_sql(spec)).fetchall()
    ]
    assert got_duck == want, (ph, boost)


def test_pf_does_not_change_match_set(env):
    s, t, pdf, con = env
    base = BooleanSpec(should=("merge", "data"), min_should_match=1, k=10**6)
    pf = BooleanSpec(
        should=("merge", "data"), min_should_match=1,
        pf_phrases=(("merge", "data"),), pf_boost=2.0, k=10**6,
    )
    keys_base = {
        (r.conv_id, r.turn_idx) for r in s.score_hits(base).collect()
    }
    keys_pf = {(r.conv_id, r.turn_idx) for r in s.score_hits(pf).collect()}
    assert keys_base == keys_pf


def test_pf_saturates_with_freq():
    """The isolated pf bonus (score at boost=1 minus score at boost=0)
    grows with phrase freq but sub-linearly (BM25 tf saturation), and
    is zero for a doc with the terms but no adjacency."""
    import pandas as pd

    ph = ("a", "b")
    mini = pd.DataFrame(
        {
            "conv_id": ["c1", "c2", "c3"],
            "turn_idx": [0, 0, 0],
            "toks": [
                ["a", "b", "x", "y", "z", "w"],
                ["a", "b", "a", "b", "z", "w"],
                ["a", "x", "b", "y", "z", "w"],  # terms, no phrase
            ],
        }
    )

    def scores(boost):
        spec = BooleanSpec(
            should=ph, min_should_match=1,
            pf_phrases=(ph,), pf_boost=boost, k=10,
        )
        return {c: sc for c, _i, sc in brute_pf_topk(mini, spec, 10)}

    s1, s0 = scores(1.0), scores(0.0)
    bonus = {c: round(s1[c] - s0[c], ROUND) for c in s0}
    assert bonus["c3"] == 0.0
    assert bonus["c2"] > bonus["c1"] > 0.0
    assert bonus["c2"] < 2 * bonus["c1"]  # saturation, not linear


def test_pf_shingles_duel(env):
    """Multi-phrase pf (edismax pf+pf2): whole-query phrase + bigram
    shingles all contribute independent bonuses — 4-way agreement."""
    from lucene_solr_spark.query.parser import edismax

    s, t, pdf, con = env
    spec = edismax(
        "table merge strategy", mm=1, pf=True, pf2=True,
        pf_boost=1.5, k=25,
    )
    assert len(spec.pf_phrases) == 3  # whole query + 2 bigrams

    want = brute_pf_topk(pdf, spec, spec.k)
    got_idx = [
        (r.conv_id, int(r.turn_idx), float(r.score))
        for r in s.search(spec, round_to=ROUND).collect()
    ]
    assert got_idx == want
    got_df = [
        (r.conv_id, int(r.turn_idx), float(r.score))
        for r in bm25_df.search(t, spec, round_to=ROUND).collect()
    ]
    assert got_df == want
    got_duck = [
        (r[0], int(r[1]), float(r[2]))
        for r in con.execute(bm25_oracle_sql(spec)).fetchall()
    ]
    assert got_duck == want
