"""Randomized facet dueling (fork's sparse-vs-stock regression suite
generalized): random query domains × facet fields — the index facet
path (sparse counting + two-phase refine) must equal the plain
Catalyst GROUP BY control on every seed."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analyzer import tokens_col
from lucene_solr_spark.index.build import build_index
from lucene_solr_spark.query.executor import IndexSearcher
from lucene_solr_spark.query.model import BooleanSpec
from lucene_solr_spark.transcripts import transcripts_from_documents

SEEDS = list(range(12))
FIELDS = ["role", "tool", "ftok"]


@pytest.fixture(scope="module")
def env(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fduel"))
    t = transcripts_from_documents(spark, sf_dir)
    build_index(spark, t, root, num_parts=4, lineage_source=sf_dir)
    s = IndexSearcher(spark, root)
    vocab = (
        s.postings().groupBy("term").agg(F.sum("df").alias("df"))
        .orderBy(F.desc("df"), "term").toPandas().term.tolist()
    )
    return s, t, vocab


def _field_col(field):
    if field == "ftok":
        return F.element_at(F.col("toks"), 1)
    return F.col(field)


@pytest.mark.parametrize("seed", SEEDS)
def test_random_facet_duel(env, seed):
    s, t, vocab = env
    rng = np.random.default_rng(seed)
    field = FIELDS[int(rng.integers(0, len(FIELDS)))]
    limit = int(rng.integers(3, 25))
    n_terms = int(rng.integers(1, 3))
    terms = tuple(vocab[i] for i in rng.integers(0, max(1, len(vocab) // 3), n_terms))
    spec = BooleanSpec(must=tuple(dict.fromkeys(terms)))

    got = s.facet(field, spec=spec, limit=limit).toPandas()

    domain = t.withColumn("toks", tokens_col("text"))
    for term in spec.must:
        domain = domain.filter(F.array_contains("toks", term))
    want = (
        domain.withColumn("facet_value", _field_col(field))
        .filter(F.col("facet_value").isNotNull())
        .groupBy("facet_value")
        .count()
        .withColumnRenamed("count", "cnt")
        .orderBy(F.desc("cnt"), F.asc("facet_value"))
        .limit(limit)
        .toPandas()
    )
    assert list(zip(got.facet_value, got.cnt)) == list(
        zip(want.facet_value, want.cnt)
    ), (seed, field, spec)
