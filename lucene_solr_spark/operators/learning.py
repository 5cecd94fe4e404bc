"""Streaming-expression ML ops — Solr's text-analytics training trio.

The reference ships distributed ML *inside* the engine as streaming
expressions: ``features(...)`` (information-gain term selection),
``train(...)`` (logistic regression over text features, iterative
gradient descent fanned out across shards), and ``classify(...)``
(model application to a document stream).  Re-expressed Spark-first:

- the label, the feature vector, and every gradient step are narrow
  Catalyst passes over the corpus (no Python in the loop);
- the model (a handful of doubles) lives in a ONE-ROW DataFrame that
  broadcasts into each pass — the corpus never shuffles;
- each gradient update shuffles only ``(dim, partial-sum)`` rows with
  map-side combine — the same narrow-update shape as the k-means
  trainer in :mod:`textpipe` (its cross-engine float precedent
  applies here too).

Pinned contracts (cross-engine determinism):

- label ``y = 1.0 iff role == 'assistant'`` (exact, derived from the
  transcripts arithmetic);
- feature vector ``x = [1.0 (intercept), tf(dup), tf(key), tf(merge),
  tf(scan)]`` — term frequencies are exact integers, the pinned term
  list plays the role the ``features()``→``train()`` hand-off plays in
  the reference (the k-means trainer pins its seeds the same way);
- batch gradient descent, weights init 0, LR=0.5, ITERS=3 full-batch
  rounds: ``w += LR * mean((y - sigmoid(w.x)) * x)``;
- published weights round to 4dp; classification scores with the
  4dp-published weights (so the scoring input is exactly
  reproducible) and ranks on the 4dp-rounded probability.

ref: solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/
FeaturesSelectionStream.java, TextLogitStream.java, ClassifyStream.java;
solr/core/src/java/org/apache/solr/search/IGainTermsQParserPlugin.java.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lucene_solr_spark.analyzer import tokens_col
from lucene_solr_spark.transcripts import TRANSCRIPTS_ORACLE_CTE, transcripts_from_documents

OPS: list[tuple] = []


def op(name: str, oracle: str | None):
    def deco(fn):
        OPS.append((name, fn, oracle))
        return fn

    return deco


DOCS_CTE = (
    f"WITH {TRANSCRIPTS_ORACLE_CTE},\n"
    "docs AS (SELECT *, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks\n"
    "         FROM transcripts)"
)

#: Pinned logistic-regression hyperparameters (see module docstring).
FEATURE_TERMS = ("dup", "key", "merge", "scan")
LR = 0.5
ITERS = 3
_NDIM = len(FEATURE_TERMS) + 1  # + intercept


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return transcripts_from_documents(spark, sf_dir).withColumn(
        "toks", tokens_col("text")
    )


def _labeled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(conv_id, turn_idx, y, xs): pinned label + feature vector."""
    tf_cols = [
        F.expr(f"cast(size(filter(toks, t -> t = '{t}')) as double)")
        for t in FEATURE_TERMS
    ]
    return _docs(spark, sf_dir).select(
        "conv_id",
        "turn_idx",
        F.when(F.col("role") == "assistant", F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("y"),
        F.array(F.lit(1.0), *tf_cols).alias("xs"),
    )


_LAB_CTE = f"""{DOCS_CTE},
lab AS (
  SELECT conv_id, turn_idx,
         CASE WHEN role = 'assistant' THEN 1.0 ELSE 0.0 END AS y,
         [1.0,
          CAST(len(list_filter(toks, t -> t = 'dup')) AS DOUBLE),
          CAST(len(list_filter(toks, t -> t = 'key')) AS DOUBLE),
          CAST(len(list_filter(toks, t -> t = 'merge')) AS DOUBLE),
          CAST(len(list_filter(toks, t -> t = 'scan')) AS DOUBLE)] AS xs
  FROM docs)"""


def _h2(p: str) -> str:
    """SQL for the binary entropy of probability expression `p` in
    log2, with the 0*log2(0) := 0 convention."""
    return (
        f"(CASE WHEN ({p}) <= 0 OR ({p}) >= 1 THEN 0.0 "
        f"ELSE -(({p}) * log2({p}) + (1 - ({p})) * log2(1 - ({p}))) END)"
    )


# ---------------------------------------------------------------------------
# features(...) — information-gain term selection
# ---------------------------------------------------------------------------


@op(
    "q_features_igain",
    f"""{DOCS_CTE},
lab AS (SELECT conv_id, turn_idx,
               CASE WHEN role = 'assistant' THEN 1 ELSE 0 END AS y, toks
        FROM docs),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS n, CAST(sum(y) AS DOUBLE) AS p
        FROM lab),
tdf AS (SELECT term, CAST(count(*) AS DOUBLE) AS df,
               CAST(sum(y) AS DOUBLE) AS dfp
        FROM (SELECT DISTINCT conv_id, turn_idx, y, unnest(toks) AS term
              FROM lab)
        GROUP BY term),
ig AS (SELECT term, df, dfp,
              {_h2('p / n')}
              - (df / n) * {_h2('dfp / df')}
              - ((n - df) / n) * {_h2('(p - dfp) / (n - df)')} AS gain
       FROM tdf, tot)
SELECT term, round(gain, 4) AS ig,
       CAST(df AS BIGINT) AS df, CAST(dfp AS BIGINT) AS df_pos
FROM ig
ORDER BY round(gain, 4) DESC, term
LIMIT 10""",
)
def q_features_igain(spark, sf_dir):
    """FeaturesSelectionStream / IGainTermsQParser: rank every term in
    the corpus by the information gain its presence gives about the
    pinned binary label; return the top 10 (the feature-selection
    stage a `train()` pipeline would consume). Scale shape: one
    distinct-(doc,term) explode -> (term, df, df_pos) partial-combined
    groupBy; the global (N, P) scalars ride a broadcast 1-row frame.
    The rank key is the 4dp-ROUNDED gain (term asc tiebreak) so the
    ordering is exact cross-engine while counts stay integers."""
    return igain_frame(spark, sf_dir, num_terms=10)


def igain_frame(spark, sf_dir, num_terms: int = 10):
    """The features() engine with a caller-chosen numTerms (the
    /stream front door forwards the param; `q_features_igain` pins 10
    for its oracle)."""
    lab = _docs(spark, sf_dir).select(
        "conv_id",
        "turn_idx",
        F.when(F.col("role") == "assistant", F.lit(1)).otherwise(F.lit(0)).alias("y"),
        "toks",
    )
    tot = lab.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("y").cast("double").alias("p"),
    )
    tdf = (
        lab.select("conv_id", "turn_idx", "y", F.explode(F.array_distinct("toks")).alias("term"))
        .groupBy("term")
        .agg(
            F.count("*").cast("double").alias("df"),
            F.sum("y").cast("double").alias("dfp"),
        )
    )

    def h2(p):
        return F.when((p <= 0) | (p >= 1), F.lit(0.0)).otherwise(
            -(p * F.log2(p) + (1 - p) * F.log2(1 - p))
        )

    c = F.col
    ig = tdf.join(F.broadcast(tot)).withColumn(
        "gain",
        h2(c("p") / c("n"))
        - (c("df") / c("n")) * h2(c("dfp") / c("df"))
        - ((c("n") - c("df")) / c("n"))
        * h2((c("p") - c("dfp")) / (c("n") - c("df"))),
    )
    return (
        ig.select(
            "term",
            F.round("gain", 4).alias("ig"),
            c("df").cast("long").alias("df"),
            c("dfp").cast("long").alias("df_pos"),
        )
        .orderBy(F.desc("ig"), "term")
        .limit(num_terms)
    )


# ---------------------------------------------------------------------------
# train(...) — logistic regression, full-batch gradient descent
# ---------------------------------------------------------------------------


def _dot(xs: str, ws: str):
    return F.aggregate(
        F.zip_with(xs, ws, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _sigmoid(z):
    return 1.0 / (1.0 + F.exp(-z))


def _gd_weights(feats: DataFrame) -> DataFrame:
    """ITERS rounds of full-batch GD; returns a 1-row frame (ws array).

    Per round: the weight row BROADCASTS into a narrow per-doc pass
    (err = y - sigmoid(w.x), all JVM-side), the gradient reduction
    shuffles only (dim, partial-sum) rows (posexplode + map-side
    combine — never per-class vector collects), and the update is a
    zip_with on the 1-row frame. Mirrors TextLogitStream's
    per-iteration shard fan-out/reduce."""
    spark = feats.sparkSession
    w = spark.range(1).select(
        F.array(*[F.lit(0.0)] * _NDIM).alias("ws")
    )
    for _ in range(ITERS):
        err = feats.join(F.broadcast(w)).select(
            (F.col("y") - _sigmoid(_dot("xs", "ws"))).alias("err"), "xs"
        )
        grad = (
            err.select(F.posexplode("xs").alias("dim", "x"), "err")
            .groupBy("dim")
            .agg(F.avg(F.col("err") * F.col("x")).alias("g"))
            .groupBy()
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(dim, g)))," " s -> s.g)"
                ).alias("gs")
            )
        )
        w = w.join(F.broadcast(grad)).select(
            F.zip_with("ws", "gs", lambda o, g: o + F.lit(LR) * g).alias("ws")
        )
    return w


def _logit_iter_ctes() -> str:
    """Chained DuckDB CTEs replaying the ITERS GD rounds (w0 = 0)."""
    parts = ["w0 AS (SELECT [0.0, 0.0, 0.0, 0.0, 0.0] AS ws)"]
    for i in range(ITERS):
        parts.append(
            f"""w{i + 1} AS (
  SELECT list(wj ORDER BY j) AS ws FROM (
    SELECT u.j,
           any_value(w{i}.ws[u.j])
           + {LR} * avg((lab.y - 1.0 / (1.0 + exp(-list_dot_product(lab.xs, w{i}.ws))))
                        * lab.xs[u.j]) AS wj
    FROM lab, w{i}, UNNEST(range(1, {_NDIM + 1})) AS u(j)
    GROUP BY u.j))"""
        )
    return ",\n".join(parts)


@op(
    "q_train_logit",
    f"""{_LAB_CTE},
{_logit_iter_ctes()}
SELECT CAST(u.j - 1 AS INTEGER) AS dim, round(w{ITERS}.ws[u.j], 4) AS weight
FROM w{ITERS}, UNNEST(range(1, {_NDIM + 1})) AS u(j)
ORDER BY dim""",
)
def q_train_logit(spark, sf_dir):
    """TextLogitStream: train a logistic-regression model over the
    pinned text features with ITERS full-batch GD rounds and publish
    the weight vector (dim 0 = intercept). See module docstring for
    the pinned hyperparameters and `_gd_weights` for the scale shape
    (model broadcasts, corpus never shuffles, gradient reduces as
    narrow (dim, partial) rows)."""
    return train_frame(spark, sf_dir)


def train_frame(spark, sf_dir):
    """The train() engine (pinned trio hyperparameters) — shared by
    the battery op and the /stream front door."""
    w = _gd_weights(_labeled(spark, sf_dir))
    return (
        w.select(F.posexplode("ws").alias("dim", "weight"))
        .select(F.col("dim").cast("int").alias("dim"), F.round("weight", 4).alias("weight"))
        .orderBy("dim")
    )


# ---------------------------------------------------------------------------
# classify(...) — model application to the document stream
# ---------------------------------------------------------------------------


@op(
    "q_classify_stream",
    f"""{_LAB_CTE},
{_logit_iter_ctes()},
model AS (SELECT list(round(w, 4) ORDER BY j) AS ws FROM (
  SELECT u.j AS j, w{ITERS}.ws[u.j] AS w
  FROM w{ITERS}, UNNEST(range(1, {_NDIM + 1})) AS u(j))),
scored AS (
  SELECT conv_id, turn_idx,
         round(1.0 / (1.0 + exp(-list_dot_product(xs, ws))), 4) AS prob, y
  FROM lab, model)
SELECT conv_id, turn_idx, prob, CAST(y AS DOUBLE) AS label
FROM scored
ORDER BY prob DESC, conv_id, turn_idx
LIMIT 10""",
)
def q_classify_stream(spark, sf_dir):
    """ClassifyStream: score every document with the trained model
    (the 4dp-PUBLISHED weights, so the scoring input is exactly the
    artifact `q_train_logit` emits) and return the top 10 by
    probability. The model is one broadcast row; scoring is a single
    narrow JVM pass; the top-k is a TakeOrdered, never a global
    sort."""
    return classify_frame(spark, sf_dir, top=10)


def classify_frame(spark, sf_dir, top: int = 10):
    """The classify() engine with a caller-chosen top-k (the /stream
    front door forwards the param; `q_classify_stream` pins 10)."""
    feats = _labeled(spark, sf_dir)
    model = _gd_weights(feats).select(
        F.transform("ws", lambda v: F.round(v, 4)).alias("ws")
    )
    return (
        feats.join(F.broadcast(model))
        .select(
            "conv_id",
            "turn_idx",
            F.round(_sigmoid(_dot("xs", "ws")), 4).alias("prob"),
            F.col("y").alias("label"),
        )
        .orderBy(F.desc("prob"), "conv_id", "turn_idx")
        .limit(top)
    )


# ---------------------------------------------------------------------------
# Lucene classification module: SimpleNaiveBayesClassifier.
# ref: lucene/classification/src/java/org/apache/lucene/classification/
# SimpleNaiveBayesClassifier.java (class priors from doc counts, add-one
# smoothed token likelihoods from per-class term statistics, argmax of
# the log-space score). The reference pulls its statistics from index
# postings per classify() call; here the SAME statistics come from two
# narrow map-side-partial aggregations over the corpus and the scorer
# is one inverted equi-join — no per-document query loop.
#
# Pinned contract (cross-engine determinism):
# - classes = the role values; the training corpus is the full table
#   (self-classification, the q_quality_lm_perplexity self-LM precedent);
# - prior(c)  = ln(docs(c) / N);
# - lik(t|c)  = ln((cnt(t,c) + 1) / (tok(c) + V)) with cnt = total
#   occurrences of t in class c, tok(c) = Σ cnt, V = corpus distinct
#   terms (add-one smoothing);
# - score(d,c) = prior(c) + Σ_t tf(t,d)·lik(t|c)
#              = prior(c) − dl(d)·ln(tok(c)+V) + Σ_{t∈d} tf·ln(cnt+1)
#   — the decomposition means UNSEEN (t,c) pairs contribute exactly
#   their smoothing mass through the dl term and the join only ever
#   touches EXISTING (t,c) rows (ln(0+1)=0): no dense class×vocab grid;
# - predicted = argmax on the 4dp-ROUNDED score, tie → class asc
#   (the q_kmeans_train max_by precedent).
# ---------------------------------------------------------------------------


@op(
    "q_classify_naive_bayes",
    f"""{DOCS_CTE},
tok AS (
  SELECT conv_id, turn_idx, role, unnest(toks) AS term FROM docs),
cls_term AS (
  SELECT role AS c, term, count(*) AS ctc FROM tok GROUP BY 1, 2),
cls_tot AS (SELECT c, sum(ctc) AS tokc FROM cls_term GROUP BY 1),
v AS (SELECT count(DISTINCT term) AS vocab FROM tok),
n AS (SELECT count(*) AS nn FROM docs),
pri AS (SELECT role AS c, count(*) AS dc FROM docs GROUP BY 1),
doc_tf AS (
  SELECT conv_id, turn_idx, term, count(*) AS tf FROM tok GROUP BY 1, 2, 3),
dl AS (SELECT conv_id, turn_idx, role, len(toks) AS dl FROM docs),
contrib AS (
  SELECT d.conv_id, d.turn_idx, ct.c,
         sum(d.tf * ln(ct.ctc + 1)) AS s
  FROM doc_tf d JOIN cls_term ct USING (term) GROUP BY 1, 2, 3),
grid AS (
  SELECT dl.conv_id, dl.turn_idx, dl.role, p.c,
         round(ln(CAST(p.dc AS DOUBLE) / n.nn)
               - dl.dl * ln(t.tokc + v.vocab)
               + coalesce(co.s, 0), 4) AS s4
  FROM dl
  CROSS JOIN pri p CROSS JOIN n CROSS JOIN v
  JOIN cls_tot t ON t.c = p.c
  LEFT JOIN contrib co
    ON co.conv_id = dl.conv_id AND co.turn_idx = dl.turn_idx
   AND co.c = p.c),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY conv_id, turn_idx ORDER BY s4 DESC, c) AS rn
  FROM grid)
SELECT conv_id, turn_idx, role, c AS predicted, s4 AS score,
       c = role AS correct
FROM ranked WHERE rn = 1
ORDER BY conv_id, turn_idx LIMIT 40""",
)
def q_classify_naive_bayes(spark, sf_dir):
    """SimpleNaiveBayesClassifier over the role classes: class stats
    are two narrow partial aggregations ((class, term) counts and
    class totals), scoring joins the per-doc tf frame to the per-class
    term counts on TERM (inverted join — rows only for terms the class
    HAS seen; smoothing mass for unseen terms folds into the closed
    dl·ln(tok(c)+V) term), and the argmax is a partial-aggregating
    min_by. The corpus text never shuffles; the two driver scalars
    (N, |V|) are bounded single-value jobs."""
    t = transcripts_from_documents(spark, sf_dir).withColumn(
        "toks", tokens_col("text"))
    tok = t.select(
        "conv_id", "turn_idx", "role", F.explode("toks").alias("term"))
    cls_term = tok.groupBy(F.col("role").alias("c"), "term").agg(
        F.count(F.lit(1)).alias("ctc"))
    cls_tot = cls_term.groupBy("c").agg(F.sum("ctc").alias("tokc"))
    vocab = tok.select("term").distinct().count()
    n = t.count()
    classes = (
        t.groupBy(F.col("role").alias("c"))
        .agg(F.count(F.lit(1)).alias("dc"))
        .join(cls_tot, "c")
        .select(
            "c",
            F.log(F.col("dc").cast("double") / F.lit(float(n)))
            .alias("prior"),
            F.log(F.col("tokc") + F.lit(vocab)).alias("den"),
        )
    )
    doc_tf = tok.groupBy("conv_id", "turn_idx", "term").agg(
        F.count(F.lit(1)).alias("tf"))
    contrib = (
        doc_tf.join(cls_term, "term")
        .groupBy("conv_id", "turn_idx", "c")
        .agg(F.sum(F.col("tf") * F.log(F.col("ctc") + 1)).alias("s"))
    )
    dl = t.select("conv_id", "turn_idx", "role",
                  F.size("toks").alias("dl"))
    grid = (
        dl.crossJoin(F.broadcast(classes))
        .join(contrib, ["conv_id", "turn_idx", "c"], "left")
        .withColumn(
            "s4",
            F.round(
                F.col("prior") - F.col("dl") * F.col("den")
                + F.coalesce(F.col("s"), F.lit(0.0)),
                4,
            ),
        )
    )
    best = grid.groupBy("conv_id", "turn_idx", "role").agg(
        F.min_by(
            F.struct(F.col("c"), F.col("s4")),
            F.struct((-F.col("s4")).alias("ns"), F.col("c")),
        ).alias("b")
    )
    return (
        best.select(
            "conv_id", "turn_idx", "role",
            F.col("b.c").alias("predicted"),
            F.col("b.s4").alias("score"),
            (F.col("b.c") == F.col("role")).alias("correct"),
        )
        .orderBy("conv_id", "turn_idx")
        .limit(40)
    )
