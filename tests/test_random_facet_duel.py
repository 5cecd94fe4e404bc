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


# --- relatedness() duel (r4): index SKG path vs Catalyst control -----

@pytest.mark.parametrize("seed", SEEDS[:8])
def test_random_relatedness_duel(env, seed):
    """Random foreground domains × facet fields: the per-segment fg/bg
    sparse pass + pinned z-formula must equal a plain two-GROUP-BY
    Catalyst control on every seed (counts exact, scores to 1e-9
    before the 4dp round)."""
    from lucene_solr_spark.query.facets import facet_relatedness

    s, t, vocab = env
    rng = np.random.default_rng(1000 + seed)
    field = FIELDS[int(rng.integers(0, len(FIELDS)))]
    limit = int(rng.integers(5, 20))
    term = vocab[int(rng.integers(0, max(1, len(vocab) // 2)))]
    fg_spec = BooleanSpec(must=(term,))

    got = facet_relatedness(s, field, fg_spec=fg_spec, limit=limit).toPandas()

    docs = t.withColumn("toks", tokens_col("text")).withColumn(
        "facet_value", _field_col(field)
    )
    bg_size = float(docs.count())
    bg = (
        docs.filter(F.col("facet_value").isNotNull())
        .groupBy("facet_value").agg(F.count("*").alias("bg_count"))
    )
    fg = (
        docs.filter(
            F.col("facet_value").isNotNull()
            & F.array_contains("toks", term)
        )
        .groupBy("facet_value").agg(F.count("*").alias("fg_count"))
    )
    joined = bg.join(fg, "facet_value", "left").fillna(0, ["fg_count"])
    fg_pop = F.col("fg_count") / F.lit(bg_size)
    bg_pop = F.col("bg_count") / F.lit(bg_size)
    rel = F.when(
        F.col("fg_count") + F.col("bg_count") == 0, F.lit(0.0)
    ).otherwise((fg_pop - bg_pop) / F.sqrt(fg_pop + bg_pop))
    want = (
        joined.select(
            "facet_value", "fg_count", "bg_count",
            F.round(rel, 4).alias("relatedness"),
        )
        .orderBy(F.desc("relatedness"), F.asc("facet_value"))
        .limit(limit)
        .toPandas()
    )
    assert list(zip(got.facet_value, got.fg_count, got.bg_count)) == list(
        zip(want.facet_value, want.fg_count, want.bg_count)
    ), (field, term)
    assert np.allclose(
        got.relatedness.to_numpy(), want.relatedness.to_numpy()
    ), (field, term)


# --- dictionary-side narrowing duel (matches/contains/prefix) --------

@pytest.mark.parametrize("seed", SEEDS[:8])
def test_random_facet_narrowing_duel(env, seed):
    """Random (domain × field × narrowing) triples: the dictionary-
    side bucket filters (prefix / contains / whole-value matches) must
    equal a Catalyst GROUP-BY control applying the same predicate to
    the raw values — on every seed, through the refine path."""
    import re as _re

    s, t, vocab = env
    rng = np.random.default_rng(2000 + seed)
    field = FIELDS[int(rng.integers(0, len(FIELDS)))]
    limit = int(rng.integers(3, 15))
    term = vocab[int(rng.integers(0, max(1, len(vocab) // 3)))]
    spec = BooleanSpec(must=(term,))
    frag = "abcdefghijklmnopqrstuvwxyz"[int(rng.integers(0, 26))]
    mode = ("prefix", "contains", "matches")[int(rng.integers(0, 3))]

    kw = {}
    if mode == "prefix":
        kw["prefix"] = frag
        pred = lambda c: c.startswith(frag)  # noqa: E731
    elif mode == "contains":
        kw["contains"] = frag
        pred = lambda c: c.contains(frag)  # noqa: E731
    else:
        pat = f"[a-z_0-9]*{frag}[a-z_0-9]*"
        kw["matches"] = pat
        full = f"^(?:{pat})$"
        pred = lambda c: c.rlike(full)  # noqa: E731
        assert _re.fullmatch(pat, f"x{frag}y")  # sanity on the family

    got = s.facet(field, spec=spec, limit=limit,
                  method="refine", **kw).toPandas()

    domain = t.withColumn("toks", tokens_col("text")).filter(
        F.array_contains("toks", term)
    )
    want = (
        domain.withColumn("facet_value", _field_col(field))
        .filter(F.col("facet_value").isNotNull())
        .filter(pred(F.col("facet_value")))
        .groupBy("facet_value")
        .count()
        .withColumnRenamed("count", "cnt")
        .orderBy(F.desc("cnt"), F.asc("facet_value"))
        .limit(limit)
        .toPandas()
    )
    assert list(zip(got.facet_value, got.cnt)) == list(
        zip(want.facet_value, want.cnt)
    ), (seed, field, mode, frag, term)
