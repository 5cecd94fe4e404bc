"""SQL-CHECK operator battery — the Solr/Lucene query surface beyond
the CORE index path, each op as an idiomatic Catalyst plan with a
DuckDB oracle twin (SURVEY §2 rows marked SQL-CHECK).

Every query is deterministic: all LIMITs follow a total-order sort
(explicit tiebreaks), floats are rounded to 4dp on both sides, and
timestamps are serialized to strings (cross-engine dtype parity).

Reference citations are on each op (`# ref:` lines) — file paths into
the public tokee/lucene-solr tree (see SURVEY §0 citation caveat).
"""

from __future__ import annotations

import math
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lucene_solr_spark.analyzer import tokens_col
from lucene_solr_spark.transcripts import TRANSCRIPTS_ORACLE_CTE, transcripts_from_documents

QueryFn = Callable[[SparkSession, str], DataFrame]

#: DuckDB prelude: transcripts + tokenized docs CTEs.
DOCS_CTE = (
    f"WITH {TRANSCRIPTS_ORACLE_CTE},\n"
    "docs AS (SELECT *, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks\n"
    "         FROM transcripts)"
)

OPS: list[tuple[str, QueryFn, str | None]] = []


def op(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        OPS.append((name, fn, oracle))
        return fn

    return deco


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return transcripts_from_documents(spark, sf_dir).withColumn(
        "toks", tokens_col("text")
    )


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# ===========================================================================
# P: projections / predicates
# ===========================================================================

# ref: solr/core/src/java/org/apache/solr/search/SolrReturnFields.java (fl=)
@op(
    "q_fl_projection",
    f"""{DOCS_CTE}
SELECT conv_id AS id, turn_idx AS turn, len(toks) AS text_len,
       upper(role) AS role_uc
FROM docs WHERE turn_idx = 0""",
)
def q_fl_projection(spark, sf_dir):
    return _docs(spark, sf_dir).filter(F.col("turn_idx") == 0).select(
        F.col("conv_id").alias("id"),
        F.col("turn_idx").alias("turn"),
        F.size("toks").cast("long").alias("text_len"),
        F.upper("role").alias("role_uc"),
    )


# ref: lucene/core/src/java/org/apache/lucene/search/PrefixQuery.java,
# MultiTermQuery.java#RewriteMethod (term-dict scan → Boolean expansion)
@op(
    "q_prefix_query",
    f"""{DOCS_CTE}
SELECT conv_id, turn_idx FROM docs
WHERE len(list_filter(toks, t -> t LIKE 'mer%')) > 0""",
)
def q_prefix_query(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.filter(
        F.exists("toks", lambda t: t.startswith("mer"))
    ).select("conv_id", "turn_idx")


# ref: lucene/core/src/java/org/apache/lucene/search/WildcardQuery.java,
# util/automaton/RegExp.java
@op(
    "q_wildcard_query",
    f"""{DOCS_CTE}
SELECT conv_id, turn_idx FROM docs
WHERE len(list_filter(toks, t -> regexp_full_match(t, 's.an'))) > 0""",
)
def q_wildcard_query(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.filter(
        F.exists("toks", lambda t: t.rlike("^s.an$"))
    ).select("conv_id", "turn_idx")


# ref: lucene/core/src/java/org/apache/lucene/search/FuzzyQuery.java,
# util/automaton/LevenshteinAutomata.java (dict scan, ed<=1)
@op(
    "q_fuzzy_query",
    f"""{DOCS_CTE}
SELECT term, count(*) AS df FROM (
  SELECT DISTINCT conv_id, turn_idx, unnest(toks) AS term FROM docs)
WHERE levenshtein(term, 'merge') <= 1
GROUP BY term ORDER BY df DESC, term""",
)
def q_fuzzy_query(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return (
        d.select("conv_id", "turn_idx", F.explode("toks").alias("term"))
        .distinct()
        # banded: length prune + thresholded levenshtein (see
        # IndexSearcher.fuzzy_predicate — same shape, dict-local here)
        .filter((F.abs(F.length("term") - F.lit(5)) <= 1)
                & (F.levenshtein("term", F.lit("merge"), 1) >= 0))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), "term")
    )


# ref: lucene/core/src/java/org/apache/lucene/search/TermRangeQuery.java
@op(
    "q_term_range",
    f"""{DOCS_CTE}
SELECT term, count(*) AS df FROM (
  SELECT DISTINCT conv_id, turn_idx, unnest(toks) AS term FROM docs)
WHERE term >= 'window' AND term < 'wip'
GROUP BY term ORDER BY term""",
)
def q_term_range(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return (
        d.select("conv_id", "turn_idx", F.explode("toks").alias("term"))
        .distinct()
        .filter((F.col("term") >= "window") & (F.col("term") < "wip"))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .orderBy("term")
    )


# ref: lucene/core/src/java/org/apache/lucene/search/PointRangeQuery.java,
# util/bkd/BKDReader.java#intersect → Parquet row-group pruning
@op(
    "q_point_range",
    """SELECT event_type, count(*) AS cnt, round(sum(value), 2) AS total
FROM events
WHERE value BETWEEN 100 AND 200
  AND ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
GROUP BY event_type ORDER BY event_type""",
)
def q_point_range(spark, sf_dir):
    e = _events(spark, sf_dir)
    return (
        e.filter(
            F.col("value").between(100, 200)
            & (F.col("ts") >= "2024-01-10")
            & (F.col("ts") < "2024-01-20")
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .orderBy("event_type")
    )


# ref: lucene/core/src/java/org/apache/lucene/search/DisjunctionMaxQuery.java
# (edismax core: max over per-field scores + tiebreak)
@op(
    "q_dismax",
    f"""{DOCS_CTE},
scored AS (
  SELECT conv_id, turn_idx,
    CAST(len(list_filter(toks, t -> t = 'merge')) AS DOUBLE) AS s_text,
    CASE WHEN tool = 'tool_7' THEN 2.0 ELSE 0.0 END AS s_tool
  FROM docs)
SELECT conv_id, turn_idx,
       round(greatest(s_text, s_tool)
             + 0.1 * (s_text + s_tool - greatest(s_text, s_tool)), 4) AS score
FROM scored
WHERE s_text > 0 OR s_tool > 0
ORDER BY score DESC, conv_id, turn_idx LIMIT 25""",
)
def q_dismax(spark, sf_dir):
    d = _docs(spark, sf_dir)
    s_text = F.size(F.filter("toks", lambda t: t == "merge")).cast("double")
    s_tool = F.when(F.col("tool") == "tool_7", 2.0).otherwise(0.0)
    scored = d.select(
        "conv_id", "turn_idx",
        s_text.alias("s_text"), s_tool.alias("s_tool"),
    )
    score = F.round(
        F.greatest("s_text", "s_tool")
        + 0.1 * (F.col("s_text") + F.col("s_tool") - F.greatest("s_text", "s_tool")),
        4,
    )
    return (
        scored.filter((F.col("s_text") > 0) | (F.col("s_tool") > 0))
        .select("conv_id", "turn_idx", score.alias("score"))
        .orderBy(F.desc("score"), "conv_id", "turn_idx")
        .limit(25)
    )


# ===========================================================================
# S: export / sorted stream
# ===========================================================================

# ref: solr/core/src/java/org/apache/solr/handler/export/ExportWriter.java
@op(
    "q_export_sorted",
    f"""{DOCS_CTE}
SELECT conv_id, turn_idx, role, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
FROM docs WHERE role = 'user'""",
)
def q_export_sorted(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return (
        d.filter(F.col("role") == "user")
        .select(
            "conv_id", "turn_idx", "role",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        )
        .sortWithinPartitions("ts_s", "conv_id", "turn_idx")
    )


# ===========================================================================
# J: joins
# ===========================================================================

# ref: solr/core/src/java/org/apache/solr/search/JoinQParserPlugin.java
# ({!join from=f to=t} = semi-join on foreign key)
@op(
    "q_join_semi",
    """SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
ORDER BY c_custkey""",
)
def q_join_semi(spark, sf_dir):
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    inner = o.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return (
        c.join(inner.distinct(), "c_custkey", "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# ref: solr/core/src/java/org/apache/solr/search/join/ScoreJoinQParserPlugin.java,
# lucene/join/src/java/org/apache/lucene/search/join/JoinUtil.java (score=max)
@op(
    "q_join_score",
    """SELECT c.c_custkey, c.c_name, round(mx.score, 2) AS score
FROM customer c
JOIN (SELECT o_custkey, max(o_totalprice) AS score FROM orders GROUP BY o_custkey) mx
  ON c.c_custkey = mx.o_custkey
ORDER BY round(mx.score, 2) DESC, c.c_custkey LIMIT 20""",
)
def q_join_score(spark, sf_dir):
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    mx = o.groupBy("o_custkey").agg(F.max("o_totalprice").alias("score"))
    return (
        c.join(mx, c.c_custkey == mx.o_custkey)
        .select("c_custkey", "c_name", F.round("score", 2).alias("score"))
        .orderBy(F.desc("score"), "c_custkey")
        .limit(20)
    )


# ref: lucene/join/src/java/org/apache/lucene/search/join/JoinUtil.java,
# ScoreMode.java — the full score-mode family (Max/Min/Total/Avg) in
# ONE partial-aggregating shuffle: all four are algebraic, so the
# map-side combine computes (max, min, sum, count) partials and the
# to-side join is a plain equi-join on the aggregated frame (None
# would be the semi-join q_join_semi already covers).
@op(
    "q_join_score_modes",
    """SELECT c.c_custkey,
       round(a.s_max, 2) AS s_max, round(a.s_min, 2) AS s_min,
       round(a.s_total, 2) AS s_total, round(a.s_avg, 2) AS s_avg
FROM customer c
JOIN (SELECT o_custkey, max(o_totalprice) AS s_max,
             min(o_totalprice) AS s_min, sum(o_totalprice) AS s_total,
             avg(o_totalprice) AS s_avg
      FROM orders GROUP BY o_custkey) a
  ON c.c_custkey = a.o_custkey
ORDER BY round(a.s_total, 2) DESC, c.c_custkey LIMIT 20""",
)
def q_join_score_modes(spark, sf_dir):
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    agg = o.groupBy("o_custkey").agg(
        F.max("o_totalprice").alias("s_max"),
        F.min("o_totalprice").alias("s_min"),
        F.sum("o_totalprice").alias("s_total"),
        F.avg("o_totalprice").alias("s_avg"),
    )
    return (
        c.join(agg, c.c_custkey == agg.o_custkey)
        .select(
            "c_custkey",
            F.round("s_max", 2).alias("s_max"),
            F.round("s_min", 2).alias("s_min"),
            F.round("s_total", 2).alias("s_total"),
            F.round("s_avg", 2).alias("s_avg"),
        )
        .orderBy(F.desc("s_total"), "c_custkey")
        .limit(20)
    )


# ref: lucene/join/src/java/org/apache/lucene/search/join/ToParentBlockJoinQuery.java
# — our conversation↔turn block model (SURVEY §1.2): parents ranked by
# aggregated child hits (ScoreMode.Total ≡ sum, Max ≡ max)
@op(
    "q_block_join_parent",
    f"""{DOCS_CTE}
SELECT conv_id, count(*) AS n_hits,
       CAST(sum(len(list_filter(toks, t -> t = 'merge'))) AS BIGINT) AS total_tf
FROM docs
WHERE list_contains(toks, 'merge')
GROUP BY conv_id
ORDER BY n_hits DESC, total_tf DESC, conv_id LIMIT 30""",
)
def q_block_join_parent(spark, sf_dir):
    d = _docs(spark, sf_dir)
    hits = d.filter(F.array_contains("toks", "merge"))
    return (
        hits.groupBy("conv_id")
        .agg(
            F.count("*").alias("n_hits"),
            F.sum(F.size(F.filter("toks", lambda t: t == "merge")))
            .cast("long").alias("total_tf"),
        )
        .orderBy(F.desc("n_hits"), F.desc("total_tf"), "conv_id")
        .limit(30)
    )


# ref: lucene/join/src/java/org/apache/lucene/search/join/ToChildBlockJoinQuery.java
@op(
    "q_block_join_child",
    f"""{DOCS_CTE}
SELECT conv_id, turn_idx, role FROM docs
WHERE conv_id IN (SELECT DISTINCT conv_id FROM docs WHERE tool = 'tool_7')
ORDER BY conv_id, turn_idx""",
)
def q_block_join_child(spark, sf_dir):
    d = _docs(spark, sf_dir)
    parents = d.filter(F.col("tool") == "tool_7").select("conv_id").distinct()
    return (
        d.join(parents, "conv_id", "left_semi")
        .select("conv_id", "turn_idx", "role")
        .orderBy("conv_id", "turn_idx")
    )


# ref: solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/HashJoinStream.java
# (build side in memory ≡ broadcast hash join)
@op(
    "q_hash_join",
    """SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment""",
)
def q_hash_join(spark, sf_dir):
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


# ref: io/stream/InnerJoinStream.java (merge join of sorted streams ≡ SMJ)
@op(
    "q_merge_join",
    """SELECT o_orderpriority, count(*) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= DATE '1995-01-01'
GROUP BY o_orderpriority ORDER BY o_orderpriority""",
)
def q_merge_join(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        li.filter(F.col("l_shipdate") >= "1995-01-01")
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


# ===========================================================================
# A: aggregations / facet family (SQL-CHECK rows; A1-A3 live in facets.py)
# ===========================================================================

# ref: solr/core/src/java/org/apache/solr/request/SimpleFacets.java#getFacetQueryCount
@op(
    "q_facet_query",
    f"""{DOCS_CTE}
SELECT
  CAST(sum(CASE WHEN list_contains(toks, 'merge') THEN 1 ELSE 0 END) AS BIGINT) AS fq_merge,
  CAST(sum(CASE WHEN list_contains(toks, 'table') AND role = 'user' THEN 1 ELSE 0 END) AS BIGINT) AS fq_table_user,
  CAST(sum(CASE WHEN tool IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS fq_missing_tool
FROM docs""",
)
def q_facet_query(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.agg(
        F.sum(F.array_contains("toks", "merge").cast("long")).alias("fq_merge"),
        F.sum(
            (F.array_contains("toks", "table") & (F.col("role") == "user")).cast("long")
        ).alias("fq_table_user"),
        F.sum(F.col("tool").isNull().cast("long")).alias("fq_missing_tool"),
    )


# ref: solr/core/src/java/org/apache/solr/handler/component/RangeFacetProcessor.java
@op(
    "q_range_facet",
    """SELECT CAST(floor(value / 50) AS INTEGER) AS bucket, count(*) AS cnt
FROM events GROUP BY 1 ORDER BY bucket""",
)
def q_range_facet(spark, sf_dir):
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.floor(F.col("value") / 50).cast("int").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
        .orderBy("bucket")
    )


# ref: solr/core/src/java/org/apache/solr/request/IntervalFacets.java
# (arbitrary, overlapping intervals — one pass)
@op(
    "q_interval_facet",
    """SELECT
  CAST(sum(CASE WHEN value >= 0 AND value < 100 THEN 1 ELSE 0 END) AS BIGINT) AS i_low,
  CAST(sum(CASE WHEN value >= 50 AND value < 200 THEN 1 ELSE 0 END) AS BIGINT) AS i_mid,
  CAST(sum(CASE WHEN value >= 100 THEN 1 ELSE 0 END) AS BIGINT) AS i_high
FROM events""",
)
def q_interval_facet(spark, sf_dir):
    e = _events(spark, sf_dir)
    return e.agg(
        F.sum(((F.col("value") >= 0) & (F.col("value") < 100)).cast("long")).alias("i_low"),
        F.sum(((F.col("value") >= 50) & (F.col("value") < 200)).cast("long")).alias("i_mid"),
        F.sum((F.col("value") >= 100).cast("long")).alias("i_high"),
    )


# ref: solr/core/src/java/org/apache/solr/handler/component/PivotFacetProcessor.java
@op(
    "q_pivot_facet",
    """SELECT event_type, hod, cnt FROM (
  SELECT event_type, CAST(extract(hour FROM ts) AS INTEGER) AS hod, count(*) AS cnt,
         row_number() OVER (PARTITION BY event_type ORDER BY count(*) DESC,
                            CAST(extract(hour FROM ts) AS INTEGER)) AS rk
  FROM events GROUP BY 1, 2)
WHERE rk <= 3 ORDER BY event_type, cnt DESC, hod""",
)
def q_pivot_facet(spark, sf_dir):
    e = _events(spark, sf_dir)
    counts = e.groupBy(
        "event_type", F.hour("ts").alias("hod")
    ).agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("event_type").orderBy(F.desc("cnt"), F.asc("hod"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("event_type", "hod", "cnt")
        .orderBy("event_type", F.desc("cnt"), "hod")
    )


# ref: solr/core/src/java/org/apache/solr/handler/component/
# PivotFacetProcessor.java (stats decoration: facet.pivot={!stats=tag}a,b
# attaches the tagged stats.field computations to EVERY pivot leaf —
# counts alone become count+metrics per (a,b) bucket). Here the leaf
# metrics are sum(value)/avg(value) per (event_type, hod) pivot cell.
@op(
    "q_pivot_stats",
    """SELECT event_type, hod, cnt, sv, av FROM (
  SELECT event_type, CAST(extract(hour FROM ts) AS INTEGER) AS hod,
         count(*) AS cnt,
         round(sum(value), 2) AS sv, round(avg(value), 4) AS av,
         row_number() OVER (PARTITION BY event_type ORDER BY count(*) DESC,
                            CAST(extract(hour FROM ts) AS INTEGER)) AS rk
  FROM events GROUP BY 1, 2)
WHERE rk <= 3 ORDER BY event_type, cnt DESC, hod""",
)
def q_pivot_stats(spark, sf_dir):
    e = _events(spark, sf_dir)
    counts = e.groupBy("event_type", F.hour("ts").alias("hod")).agg(
        F.count("*").alias("cnt"),
        F.round(F.sum("value"), 2).alias("sv"),
        F.round(F.avg("value"), 4).alias("av"),
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("cnt"), F.asc("hod"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("event_type", "hod", "cnt", "sv", "av")
        .orderBy("event_type", F.desc("cnt"), "hod")
    )


# ref: lucene/suggest/src/java/org/apache/lucene/search/suggest/document/
# ContextQuery.java (ContextSuggestField: completions filtered AND
# weighted within a context) — the suggestion dictionary is built from
# the assistant-role turns ONLY: terms living solely in other contexts
# cannot be suggested, and weights are the IN-CONTEXT collection
# frequencies (≠ whole-corpus cf — the discriminator vs q_idx_suggest).
@op(
    "q_suggest_context",
    f"""{DOCS_CTE},
ctx AS (
  SELECT unnest(toks) AS term FROM docs WHERE role = 'assistant'),
dict AS (SELECT term, CAST(count(*) AS BIGINT) AS weight
         FROM ctx GROUP BY term),
pre(prefix) AS (VALUES ('me'), ('sc'), ('qu')),
ranked AS (
  SELECT pre.prefix, d.term AS suggestion, d.weight,
         row_number() OVER (PARTITION BY pre.prefix
           ORDER BY d.weight DESC, d.term) AS rn
  FROM pre JOIN dict d ON d.term LIKE pre.prefix || '%')
SELECT prefix, suggestion, weight FROM ranked WHERE rn <= 5
ORDER BY prefix, weight DESC, suggestion""",
)
def q_suggest_context(spark, sf_dir):
    d = _docs(spark, sf_dir)
    dicts = (
        d.filter(F.col("role") == "assistant")
        .select(F.explode("toks").alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("weight"))
    )
    pre = spark.createDataFrame([("me",), ("sc",), ("qu",)], "prefix string")
    w = Window.partitionBy("prefix").orderBy(F.desc("weight"), "term")
    return (
        dicts.join(F.broadcast(pre), F.col("term").startswith(F.col("prefix")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("prefix", F.col("term").alias("suggestion"), "weight")
        .orderBy("prefix", F.desc("weight"), "suggestion")
    )


# ref: solr/core/src/java/org/apache/solr/search/facet/ — SumAgg, AvgAgg,
# MinMaxAgg, StddevAgg, UniqueAgg, PercentileAgg (JSON Facet API metrics)
@op(
    "q_json_facet_aggs",
    """SELECT event_type,
  count(*) AS cnt,
  round(sum(value), 2) AS s,
  round(avg(value), 4) AS a,
  round(min(value), 2) AS mn,
  round(max(value), 2) AS mx,
  round(stddev_samp(value), 4) AS sd,
  round(var_samp(value), 4) AS var,
  round(sum(value * value), 2) AS sumsq,
  CAST(count(value) AS BIGINT) AS countvals,
  count(DISTINCT user_id) AS uniq,
  round(quantile_cont(value, 0.5), 4) AS p50
FROM events GROUP BY event_type ORDER BY event_type""",
)
def q_json_facet_aggs(spark, sf_dir):
    e = _events(spark, sf_dir)
    return (
        e.groupBy("event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("value"), 2).alias("s"),
            F.round(F.avg("value"), 4).alias("a"),
            F.round(F.min("value"), 2).alias("mn"),
            F.round(F.max("value"), 2).alias("mx"),
            F.round(F.stddev_samp("value"), 4).alias("sd"),
            F.round(F.var_samp("value"), 4).alias("var"),
            F.round(F.sum(F.col("value") * F.col("value")), 2).alias("sumsq"),
            F.count("value").alias("countvals"),
            F.countDistinct("user_id").alias("uniq"),
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        )
        .orderBy("event_type")
    )


# ref: solr/core/src/java/org/apache/solr/search/facet/FacetField.java
# (allBuckets / numBuckets / missing special buckets of the JSON Facet
# API terms facet — reported alongside the limited bucket list)
@op(
    "q_json_facet_allbuckets",
    f"""{DOCS_CTE},
top AS (
  SELECT tool AS bucket, count(*) AS cnt FROM docs
  WHERE tool IS NOT NULL
  GROUP BY 1 ORDER BY cnt DESC, bucket LIMIT 5
),
spec AS (
  SELECT CAST(sum(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS all_cnt,
         CAST(sum(CASE WHEN tool IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS miss_cnt,
         CAST(count(DISTINCT tool) AS BIGINT) AS nb
  FROM docs
)
SELECT bucket, cnt FROM top
UNION ALL SELECT '_allBuckets', all_cnt FROM spec
UNION ALL SELECT '_missing', miss_cnt FROM spec
UNION ALL SELECT '_numBuckets', nb FROM spec
ORDER BY bucket""",
)
def q_json_facet_allbuckets(spark, sf_dir):
    d = _docs(spark, sf_dir)
    top = (
        d.filter(F.col("tool").isNotNull())
        .groupBy(F.col("tool").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("bucket"))
        .limit(5)
    )
    # one pass over the domain for all three special buckets, then
    # pivot the single row into (bucket, cnt) rows — no extra scans
    spec = d.agg(
        F.sum(F.col("tool").isNotNull().cast("long")).alias("_allBuckets"),
        F.sum(F.col("tool").isNull().cast("long")).alias("_missing"),
        F.countDistinct("tool").alias("_numBuckets"),
    ).select(
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(n) for n in ("_allBuckets", "_missing", "_numBuckets")]),
                F.array("_allBuckets", "_missing", "_numBuckets"),
            )
        ).alias("bucket", "cnt")
    )
    return top.unionByName(spec).orderBy("bucket")


# ref: solr/core/src/java/org/apache/solr/request/SimpleFacets.java
# getGroupedCounts (group.facet=true: each GROUP counts once per bucket,
# not each doc — the grouped-result analog of field faceting)
@op(
    "q_grouped_facet",
    f"""{DOCS_CTE}
SELECT role, CAST(count(DISTINCT conv_id) AS BIGINT) AS gcnt
FROM docs WHERE list_contains(toks, 'merge')
GROUP BY role ORDER BY gcnt DESC, role""",
)
def q_grouped_facet(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return (
        d.filter(F.array_contains("toks", "merge"))
        .groupBy("role")
        .agg(F.countDistinct("conv_id").alias("gcnt"))
        .orderBy(F.desc("gcnt"), "role")
    )


# ref: solr/core/src/java/org/apache/solr/handler/component/StatsComponent.java,
# StatsValuesFactory.java (global field stats incl. missing)
@op(
    "q_stats_component",
    f"""{DOCS_CTE}
SELECT count(*) AS cnt,
  CAST(sum(CASE WHEN tool IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS missing,
  CAST(min(len(toks)) AS BIGINT) AS min_len,
  CAST(max(len(toks)) AS BIGINT) AS max_len,
  round(avg(len(toks)), 4) AS mean_len,
  round(stddev_samp(len(toks)), 4) AS sd_len,
  CAST(sum(len(toks) * len(toks)) AS BIGINT) AS sumsq
FROM docs""",
)
def q_stats_component(spark, sf_dir):
    d = _docs(spark, sf_dir).withColumn("dl", F.size("toks"))
    return d.agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("tool").isNull().cast("long")).alias("missing"),
        F.min("dl").cast("long").alias("min_len"),
        F.max("dl").cast("long").alias("max_len"),
        F.round(F.avg("dl"), 4).alias("mean_len"),
        F.round(F.stddev_samp("dl"), 4).alias("sd_len"),
        F.sum(F.col("dl") * F.col("dl")).cast("long").alias("sumsq"),
    )


# ref: solr/core/src/java/org/apache/solr/handler/component/
# StatsValuesFactory.java (percentiles param) + search/facet/UniqueAgg.java
# (JSON facet `unique`). Percentiles here are EXACT (Spark `percentile`
# and DuckDB `quantile_cont` share the (n-1)*p interpolation rule);
# Solr's t-digest/HLL approximations are the scale path and stay
# approximate-only (no oracle possible) — at 100 TB swap in
# percentile_approx / approx_count_distinct, same plan shape.
@op(
    "q_stats_percentiles",
    f"""{DOCS_CTE}
SELECT role,
  round(quantile_cont(len(toks), 0.25), 4) AS p25,
  round(quantile_cont(len(toks), 0.50), 4) AS p50,
  round(quantile_cont(len(toks), 0.90), 4) AS p90,
  count(DISTINCT tool) AS n_tools
FROM docs GROUP BY role ORDER BY role""",
)
def q_stats_percentiles(spark, sf_dir):
    d = _docs(spark, sf_dir).withColumn("dl", F.size("toks").cast("double"))
    return (
        d.groupBy("role")
        .agg(
            F.round(F.expr("percentile(dl, 0.25)"), 4).alias("p25"),
            F.round(F.expr("percentile(dl, 0.50)"), 4).alias("p50"),
            F.round(F.expr("percentile(dl, 0.90)"), 4).alias("p90"),
            F.countDistinct("tool").alias("n_tools"),
        )
        .orderBy("role")
    )


# ref: solr/core/src/java/org/apache/solr/search/facet/HLLAgg.java +
# solr/core/src/java/org/apache/solr/util/hll/HLL.java (unique via
# HyperLogLog) and search/facet/PercentileAgg.java (t-digest): the
# reference keeps approximate aggregates precisely because exact
# distinct/percentile is unaffordable at high cardinality. Spark's
# built-in analogs are approx_count_distinct (HLL++) and
# percentile_approx (quantile sketch) — same plan shape as the exact
# aggs (partial per partition, merge, no extra shuffle), sketch-sized
# state instead of per-value state. The oracle verifies the EXACT
# aggregates computed in the same job plus the tolerance booleans
# (the sketches themselves are engine-specific, not SQL-expressible).
@op(
    "q_json_facet_approx",
    """SELECT event_type,
  count(DISTINCT user_id) AS uniq_exact,
  true AS hll_ok,
  true AS tdigest_ok
FROM events GROUP BY event_type ORDER BY event_type""",
)
def q_json_facet_approx(spark, sf_dir):
    """At-scale variants of the A8/A9 metrics (VERDICT r2 item 4):
    HLL++ unique (rsd 0.05 → |err| bounded by 4σ) and sketch p50
    (accuracy 10000 → returned element within 1% of the group's value
    range from the interpolated exact median)."""
    rsd = 0.05
    e = _events(spark, sf_dir)
    agg = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("uniq_exact"),
        F.approx_count_distinct("user_id", rsd).alias("uniq_hll"),
        F.expr("percentile(value, 0.5)").alias("p50_exact"),
        F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias("p50_td"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    return agg.select(
        "event_type",
        "uniq_exact",
        (
            F.abs(F.col("uniq_hll") - F.col("uniq_exact"))
            <= F.greatest(F.lit(4.0), 4 * rsd * F.col("uniq_exact"))
        ).alias("hll_ok"),
        (
            F.abs(F.col("p50_td") - F.col("p50_exact"))
            <= (F.col("mx") - F.col("mn")) * 0.01
        ).alias("tdigest_ok"),
    ).orderBy("event_type")


# ref: lucene/grouping/src/java/org/apache/lucene/search/grouping/
# FirstPassGroupingCollector.java + TopGroupsCollector.java; Solr Grouping.java
@op(
    "q_grouping",
    f"""{DOCS_CTE},
scored AS (
  SELECT conv_id, turn_idx,
         CAST(len(list_filter(toks, t -> t = 'data')) AS BIGINT) AS score
  FROM docs WHERE list_contains(toks, 'data')),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id
             ORDER BY score DESC, turn_idx) AS rk,
         max(score) OVER (PARTITION BY conv_id) AS gscore
  FROM scored),
topg AS (
  SELECT conv_id FROM (
    SELECT conv_id, max(score) AS gscore FROM scored GROUP BY conv_id
    ORDER BY gscore DESC, conv_id LIMIT 5))
SELECT r.conv_id, r.turn_idx, r.score, r.rk
FROM ranked r JOIN topg USING (conv_id)
WHERE r.rk <= 2
ORDER BY r.gscore DESC, r.conv_id, r.rk""",
)
def q_grouping(spark, sf_dir):
    d = _docs(spark, sf_dir)
    scored = d.filter(F.array_contains("toks", "data")).select(
        "conv_id", "turn_idx",
        F.size(F.filter("toks", lambda t: t == "data")).cast("long").alias("score"),
    )
    wg = Window.partitionBy("conv_id")
    ranked = scored.withColumn(
        "rk",
        F.row_number().over(wg.orderBy(F.desc("score"), F.asc("turn_idx"))),
    ).withColumn("gscore", F.max("score").over(wg))
    topg = (
        scored.groupBy("conv_id")
        .agg(F.max("score").alias("gscore"))
        .orderBy(F.desc("gscore"), "conv_id")
        .limit(5)
        .select("conv_id")
    )
    return (
        ranked.join(topg, "conv_id", "left_semi")
        .filter(F.col("rk") <= 2)
        .select("conv_id", "turn_idx", "score", F.col("rk").cast("long").alias("rk"))
    )


# ref: solr/core/src/java/org/apache/solr/search/Grouping.java
# (group.ngroups=true / matches: the grouped-response header carries
# the TOTAL distinct group count and total hit count alongside the
# top groups). Spark-first: the header scalars come from ONE partial
# aggregation broadcast-joined onto the top-group rows — never a
# driver-side collect.
@op(
    "q_grouping_ngroups",
    f"""{DOCS_CTE},
scored AS (
  SELECT conv_id,
         CAST(len(list_filter(toks, t -> t = 'data')) AS BIGINT) AS score
  FROM docs WHERE list_contains(toks, 'data')),
groups AS (
  SELECT conv_id, max(score) AS gscore, count(*) AS group_size
  FROM scored GROUP BY conv_id),
hdr AS (
  SELECT count(*) AS ngroups,
         CAST(sum(group_size) AS BIGINT) AS matches FROM groups)
SELECT g.conv_id, g.gscore, g.group_size, h.ngroups, h.matches
FROM groups g CROSS JOIN hdr h
ORDER BY g.gscore DESC, g.conv_id LIMIT 5""",
)
def q_grouping_ngroups(spark, sf_dir):
    d = _docs(spark, sf_dir)
    scored = d.filter(F.array_contains("toks", "data")).select(
        "conv_id",
        F.size(F.filter("toks", lambda t: t == "data")).cast("long").alias("score"),
    )
    groups = scored.groupBy("conv_id").agg(
        F.max("score").alias("gscore"), F.count("*").alias("group_size")
    )
    hdr = groups.agg(
        F.count("*").alias("ngroups"),
        F.sum("group_size").cast("long").alias("matches"),
    )
    return (
        groups.crossJoin(F.broadcast(hdr))
        .orderBy(F.desc("gscore"), "conv_id")
        .limit(5)
    )


# ref: solr/core/src/java/org/apache/solr/search/Grouping.java
# (groupSort vs withinGroupSort: `sort` ranks GROUPS by their top doc,
# `group.sort` orders the docs INSIDE each group independently). Here
# groups rank by gscore=max(score) desc but each group's doclist is the
# first 2 turns by turn_idx asc — a doc that heads its group under
# `sort` may not appear at all under `group.sort` (the discriminator vs
# q_grouping, whose within-group order is score desc). Spark-first: the
# within-group rank is ONE key-partitioned window (WindowGroupLimit
# pushes the rk<=2 cut into the shuffle); group selection is the same
# bounded partial-agg top-5 as q_grouping.
@op(
    "q_grouping_sort",
    f"""{DOCS_CTE},
scored AS (
  SELECT conv_id, turn_idx,
         CAST(len(list_filter(toks, t -> t = 'data')) AS BIGINT) AS score
  FROM docs WHERE list_contains(toks, 'data')),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id
             ORDER BY turn_idx) AS rk
  FROM scored),
topg AS (
  SELECT conv_id FROM (
    SELECT conv_id, max(score) AS gscore FROM scored GROUP BY conv_id
    ORDER BY gscore DESC, conv_id LIMIT 5))
SELECT r.conv_id, r.turn_idx, r.score, r.rk
FROM ranked r JOIN topg USING (conv_id)
WHERE r.rk <= 2""",
)
def q_grouping_sort(spark, sf_dir):
    d = _docs(spark, sf_dir)
    scored = d.filter(F.array_contains("toks", "data")).select(
        "conv_id", "turn_idx",
        F.size(F.filter("toks", lambda t: t == "data")).cast("long").alias("score"),
    )
    ranked = scored.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("conv_id").orderBy(F.asc("turn_idx"))
        ),
    )
    topg = (
        scored.groupBy("conv_id")
        .agg(F.max("score").alias("gscore"))
        .orderBy(F.desc("gscore"), "conv_id")
        .limit(5)
        .select("conv_id")
    )
    return (
        ranked.join(topg, "conv_id", "left_semi")
        .filter(F.col("rk") <= 2)
        .select("conv_id", "turn_idx", "score", F.col("rk").cast("long").alias("rk"))
    )


# ref: solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/
#      FetchStream.java (fetch(collection, stream, on=key, fl=fields,
#      batchSize=N): enrich stream tuples with fields looked up from a
#      collection by key)
@op(
    "q_fetch_stream",
    f"""{DOCS_CTE},
stream AS (
  SELECT conv_id, turn_idx,
         CAST(len(list_filter(toks, t -> t = 'merge')) AS BIGINT) AS score
  FROM docs WHERE list_contains(toks, 'merge')
  ORDER BY score DESC, conv_id, turn_idx LIMIT 20)
SELECT s.conv_id, s.turn_idx, s.score, d.role, d.tool,
       CAST(len(d.toks) AS BIGINT) AS text_len
FROM stream s JOIN docs d USING (conv_id, turn_idx)
ORDER BY s.score DESC, s.conv_id, s.turn_idx""",
)
def q_fetch_stream(spark, sf_dir):
    """FetchStream (J8): a bounded tuple stream enriched with fields
    fetched from a collection by key. The stream side is k rows by
    contract (Solr fetches in batchSize batches), so it BROADCASTS
    and the lookup collection streams past it unshuffled — the plan
    test pins the broadcast. fl= fields: role, tool, text length."""
    d = _docs(spark, sf_dir)
    stream = (
        d.filter(F.array_contains("toks", "merge"))
        .select(
            "conv_id", "turn_idx",
            F.size(F.filter("toks", lambda t: t == "merge"))
            .cast("long").alias("score"),
        )
        .orderBy(F.desc("score"), "conv_id", "turn_idx")
        .limit(20)
    )
    fetched = F.broadcast(stream).join(
        d.select(
            "conv_id", "turn_idx", "role", "tool",
            F.size("toks").cast("long").alias("text_len"),
        ),
        ["conv_id", "turn_idx"],
    )
    return fetched.select(
        "conv_id", "turn_idx", "score", "role", "tool", "text_len"
    ).orderBy(F.desc("score"), "conv_id", "turn_idx")


# ref: solr/core/src/java/org/apache/solr/search/Grouping.java
#      (Command subclass CommandQuery: group.query=... — one doclist
#      per query, overlap allowed, each independently ranked)
@op(
    "q_grouping_query",
    f"""{DOCS_CTE},
scored AS (
  SELECT conv_id, turn_idx, role, toks,
         CAST(len(list_filter(toks, t -> t = 'data')) AS BIGINT) AS score
  FROM docs WHERE list_contains(toks, 'data')),
g AS (
  SELECT 'role_assistant' AS group_key, conv_id, turn_idx, score
  FROM scored WHERE role = 'assistant'
  UNION ALL
  SELECT 'with_merge', conv_id, turn_idx, score
  FROM scored WHERE list_contains(toks, 'merge'))
SELECT group_key, conv_id, turn_idx, score, CAST(rk AS BIGINT) AS rk
FROM (SELECT *, row_number() OVER (PARTITION BY group_key
        ORDER BY score DESC, conv_id, turn_idx) AS rk FROM g)
WHERE rk <= 2 ORDER BY group_key, rk""",
)
def q_grouping_query(spark, sf_dir):
    """group.query: groups are defined by QUERIES, not field values —
    each group query carves its own doclist out of the main result
    set and ranks it independently (docs may appear in several
    groups). One explode over a constant group array + one window by
    group key — the main domain is scored ONCE, never re-queried per
    group."""
    d = _docs(spark, sf_dir)
    scored = d.filter(F.array_contains("toks", "data")).select(
        "conv_id", "turn_idx", "role", "toks",
        F.size(F.filter("toks", lambda t: t == "data")).cast("long").alias("score"),
    )
    groups = F.array(
        F.struct(
            F.lit("role_assistant").alias("g"),
            (F.col("role") == "assistant").alias("m"),
        ),
        F.struct(
            F.lit("with_merge").alias("g"),
            F.array_contains("toks", "merge").alias("m"),
        ),
    )
    w = Window.partitionBy("group_key").orderBy(
        F.desc("score"), "conv_id", "turn_idx"
    )
    return (
        scored.withColumn("gs", F.explode(groups))
        .filter(F.col("gs.m"))
        .select(
            F.col("gs.g").alias("group_key"), "conv_id", "turn_idx", "score"
        )
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 2)
        .orderBy("group_key", "rk")
    )


# ref: solr/core/src/java/org/apache/solr/search/Grouping.java
#      (Command subclass CommandFunc: group.func=... — groups keyed by
#      a ValueSource evaluated per doc)
@op(
    "q_grouping_func",
    f"""{DOCS_CTE},
scored AS (
  SELECT conv_id, turn_idx, len(toks) // 32 AS bucket,
         CAST(len(list_filter(toks, t -> t = 'data')) AS BIGINT) AS score
  FROM docs WHERE list_contains(toks, 'data')),
topg AS (
  SELECT bucket, max(score) AS gscore FROM scored
  GROUP BY bucket ORDER BY gscore DESC, bucket LIMIT 4)
SELECT CAST(s.bucket AS BIGINT) AS bucket, conv_id, turn_idx, score,
       CAST(rk AS BIGINT) AS rk
FROM (SELECT *, row_number() OVER (PARTITION BY bucket
        ORDER BY score DESC, conv_id, turn_idx) AS rk FROM scored) s
JOIN topg USING (bucket)
WHERE rk <= 2 ORDER BY bucket, rk""",
)
def q_grouping_func(spark, sf_dir):
    """group.func: groups keyed by a function of the doc (here the
    doc-length bucket floor(len/32), a ValueSource analog). Same
    two-pass shape as field grouping — group heads pick the top
    groups, a key-partitioned window ranks within each; the function
    is computed once in the scan projection."""
    d = _docs(spark, sf_dir)
    scored = d.filter(F.array_contains("toks", "data")).select(
        "conv_id", "turn_idx",
        F.floor(F.size("toks") / 32).cast("long").alias("bucket"),
        F.size(F.filter("toks", lambda t: t == "data")).cast("long").alias("score"),
    )
    topg = (
        scored.groupBy("bucket")
        .agg(F.max("score").alias("gscore"))
        .orderBy(F.desc("gscore"), "bucket")
        .limit(4)
        .select("bucket")
    )
    w = Window.partitionBy("bucket").orderBy(
        F.desc("score"), "conv_id", "turn_idx"
    )
    return (
        scored.join(F.broadcast(topg), "bucket", "left_semi")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 2)
        .select("bucket", "conv_id", "turn_idx", "score", "rk")
        .orderBy("bucket", "rk")
    )


# ref: solr/core/src/java/org/apache/solr/search/CollapsingQParserPlugin.java
@op(
    "q_collapse",
    f"""{DOCS_CTE},
scored AS (
  SELECT conv_id, turn_idx,
         CAST(len(list_filter(toks, t -> t = 'data')) AS BIGINT) AS score
  FROM docs WHERE list_contains(toks, 'data'))
SELECT conv_id, turn_idx, score FROM (
  SELECT *, row_number() OVER (PARTITION BY conv_id
            ORDER BY score DESC, turn_idx) AS rk FROM scored)
WHERE rk = 1 ORDER BY conv_id""",
)
def q_collapse(spark, sf_dir):
    d = _docs(spark, sf_dir)
    scored = d.filter(F.array_contains("toks", "data")).select(
        "conv_id", "turn_idx",
        F.size(F.filter("toks", lambda t: t == "data")).cast("long").alias("score"),
    )
    w = Window.partitionBy("conv_id").orderBy(F.desc("score"), F.asc("turn_idx"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("conv_id", "turn_idx", "score")
        .orderBy("conv_id")
    )


# ref: solr/core/src/java/org/apache/solr/handler/component/ExpandComponent.java
@op(
    "q_expand",
    f"""{DOCS_CTE},
scored AS (
  SELECT conv_id, turn_idx,
         CAST(len(list_filter(toks, t -> t = 'data')) AS BIGINT) AS score
  FROM docs WHERE list_contains(toks, 'data'))
SELECT conv_id, turn_idx, score, rk FROM (
  SELECT *, row_number() OVER (PARTITION BY conv_id
            ORDER BY score DESC, turn_idx) AS rk FROM scored)
WHERE rk BETWEEN 2 AND 3 ORDER BY conv_id, rk""",
)
def q_expand(spark, sf_dir):
    d = _docs(spark, sf_dir)
    scored = d.filter(F.array_contains("toks", "data")).select(
        "conv_id", "turn_idx",
        F.size(F.filter("toks", lambda t: t == "data")).cast("long").alias("score"),
    )
    w = Window.partitionBy("conv_id").orderBy(F.desc("score"), F.asc("turn_idx"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk").between(2, 3))
        .select("conv_id", "turn_idx", "score", F.col("rk").cast("long").alias("rk"))
        .orderBy("conv_id", "rk")
    )


# ref: solr/core/src/java/org/apache/solr/search/CollapsingQParserPlugin.java
# (nullPolicy: NULL_IGNORE drops null-key docs, NULL_EXPAND lets every
# null-key doc through as its own group, NULL_COLLAPSE makes one null
# group). Here nullPolicy=expand on the NULLABLE tool field: non-null
# tool groups collapse to their score head, the ~20% null-tool docs all
# survive individually — the discriminator vs nullPolicy=collapse
# (which would keep exactly ONE null-tool doc).
@op(
    "q_collapse_null_expand",
    f"""{DOCS_CTE},
scored AS (
  SELECT conv_id, turn_idx, tool,
         CAST(len(list_filter(toks, t -> t = 'data')) AS BIGINT) AS score
  FROM docs WHERE list_contains(toks, 'data')),
heads AS (
  SELECT conv_id, turn_idx, tool, score FROM (
    SELECT *, row_number() OVER (PARTITION BY tool
              ORDER BY score DESC, conv_id, turn_idx) AS rk
    FROM scored WHERE tool IS NOT NULL)
  WHERE rk = 1),
nulls AS (
  SELECT conv_id, turn_idx, tool, score FROM scored WHERE tool IS NULL)
SELECT * FROM heads UNION ALL SELECT * FROM nulls
ORDER BY conv_id, turn_idx""",
)
def q_collapse_null_expand(spark, sf_dir):
    d = _docs(spark, sf_dir)
    scored = d.filter(F.array_contains("toks", "data")).select(
        "conv_id", "turn_idx", "tool",
        F.size(F.filter("toks", lambda t: t == "data")).cast("long").alias("score"),
    )
    w = Window.partitionBy("tool").orderBy(
        F.desc("score"), "conv_id", "turn_idx"
    )
    heads = (
        scored.filter(F.col("tool").isNotNull())
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    nulls = scored.filter(F.col("tool").isNull())
    return heads.unionByName(nulls).orderBy("conv_id", "turn_idx")


# ref: solr/core/src/java/org/apache/solr/handler/component/ExpandComponent.java
# (expand.sort + expand.rows: the expanded section re-sorts each
# collapsed group's REMAINING docs by its own sort — independent of the
# main sort that chose the head — and truncates to expand.rows). Here
# heads stay score-ranked but the expansion returns each group's first
# 2 leftover docs by turn_idx ASC: a doc ranked 4th by score can appear
# (early turn) while the 2nd-by-score doc does not — the discriminator
# vs q_expand (score-ordered expansion).
@op(
    "q_expand_sort",
    f"""{DOCS_CTE},
scored AS (
  SELECT conv_id, turn_idx,
         CAST(len(list_filter(toks, t -> t = 'data')) AS BIGINT) AS score
  FROM docs WHERE list_contains(toks, 'data')),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id
            ORDER BY score DESC, turn_idx) AS rk FROM scored),
exp AS (
  SELECT conv_id, turn_idx, score, row_number() OVER (
    PARTITION BY conv_id ORDER BY turn_idx) AS er
  FROM ranked WHERE rk > 1)
SELECT conv_id, turn_idx, score, er FROM exp
WHERE er <= 2 ORDER BY conv_id, er""",
)
def q_expand_sort(spark, sf_dir):
    d = _docs(spark, sf_dir)
    scored = d.filter(F.array_contains("toks", "data")).select(
        "conv_id", "turn_idx",
        F.size(F.filter("toks", lambda t: t == "data")).cast("long").alias("score"),
    )
    wmain = Window.partitionBy("conv_id").orderBy(F.desc("score"), "turn_idx")
    wexp = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        scored.withColumn("rk", F.row_number().over(wmain))
        .filter(F.col("rk") > 1)
        .withColumn("er", F.row_number().over(wexp).cast("long"))
        .filter(F.col("er") <= 2)
        .select("conv_id", "turn_idx", "score", "er")
        .orderBy("conv_id", "er")
    )


# ref: solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/RollupStream.java
@op(
    "q_rollup_stream",
    """SELECT event_type, count(*) AS cnt, round(sum(value), 2) AS s,
       round(avg(value), 4) AS a, round(min(value), 2) AS mn,
       round(max(value), 2) AS mx
FROM events GROUP BY event_type ORDER BY event_type""",
)
def q_rollup_stream(spark, sf_dir):
    e = _events(spark, sf_dir)
    return (
        e.groupBy("event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("value"), 2).alias("s"),
            F.round(F.avg("value"), 4).alias("a"),
            F.round(F.min("value"), 2).alias("mn"),
            F.round(F.max("value"), 2).alias("mx"),
        )
        .orderBy("event_type")
    )


# ref: solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/
# HavingStream.java (boolean evaluator over a wrapped rollup: and/gt/lt)
@op(
    "q_having_stream",
    """SELECT user_id, count(*) AS cnt, round(avg(value), 4) AS a
FROM events GROUP BY user_id
HAVING count(*) >= 70 AND avg(value) > 0
ORDER BY user_id""",
)
def q_having_stream(spark, sf_dir):
    e = _events(spark, sf_dir)
    return (
        e.groupBy("user_id")
        .agg(F.count("*").alias("cnt"), F.round(F.avg("value"), 4).alias("a"))
        .filter((F.col("cnt") >= 70) & (F.col("a") > 0))
        .orderBy("user_id")
    )


# ref: io/stream/ReducerStream.java (group a sorted stream by key, fold
# each group with a GroupOperation — here: the first-5-by-time event
# sequence per user). Spelled WITHOUT a window: collect_list + one
# expression-side sort_array/slice, so the shuffle is the groupBy only
# and group size never creates a single-partition sort.
@op(
    "q_reduce_stream",
    """SELECT user_id, CAST(count(*) AS BIGINT) AS cnt,
       array_to_string((list(event_type ORDER BY ts, event_id))[1:5], ',')
         AS first_events
FROM events GROUP BY user_id ORDER BY user_id""",
)
def q_reduce_stream(spark, sf_dir):
    e = _events(spark, sf_dir)
    return (
        e.groupBy("user_id")
        .agg(
            F.count("*").alias("cnt"),
            F.expr(
                "concat_ws(',', slice(transform("
                "sort_array(collect_list(struct(ts, event_id, event_type))), "
                "s -> s.event_type), 1, 5))"
            ).alias("first_events"),
        )
        .orderBy("user_id")
    )


# ref: io/stream/TimeseriesStream.java (fixed time buckets ≡ tumbling window)
@op(
    "q_timeseries",
    """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       count(*) AS cnt, round(sum(value), 2) AS total
FROM events GROUP BY 1 ORDER BY day""",
)
def q_timeseries(spark, sf_dir):
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
            "cnt", "total",
        )
        .orderBy("day")
    )


# ref: io/stream/SignificantTermsStream.java (fg/bg over-representation)
@op(
    "q_significant_terms",
    f"""{DOCS_CTE},
per_doc AS (SELECT DISTINCT conv_id, turn_idx, role, unnest(toks) AS term FROM docs),
bg AS (SELECT term, count(*) AS bg_df FROM per_doc GROUP BY term),
fg AS (SELECT term, count(*) AS fg_df FROM per_doc WHERE role = 'assistant' GROUP BY term)
SELECT fg.term, fg_df, bg_df,
       round(CAST(fg_df AS DOUBLE) * fg_df / bg_df, 4) AS score
FROM fg JOIN bg USING (term)
WHERE fg_df >= 5
ORDER BY score DESC, fg.term LIMIT 20""",
)
def q_significant_terms(spark, sf_dir):
    d = _docs(spark, sf_dir)
    per_doc = d.select(
        "conv_id", "turn_idx", "role", F.explode("toks").alias("term")
    ).distinct()
    bg = per_doc.groupBy("term").agg(F.count("*").alias("bg_df"))
    fg = (
        per_doc.filter(F.col("role") == "assistant")
        .groupBy("term")
        .agg(F.count("*").alias("fg_df"))
    )
    return (
        fg.join(bg, "term")
        .filter(F.col("fg_df") >= 5)
        .select(
            "term", "fg_df", "bg_df",
            F.round(
                F.col("fg_df").cast("double") * F.col("fg_df") / F.col("bg_df"), 4
            ).alias("score"),
        )
        .orderBy(F.desc("score"), "term")
        .limit(20)
    )


# ref: solr/core/src/java/org/apache/solr/handler/component/TermsComponent.java
@op(
    "q_terms_component",
    f"""{DOCS_CTE}
SELECT term, count(*) AS df FROM (
  SELECT DISTINCT conv_id, turn_idx, unnest(toks) AS term FROM docs)
WHERE term LIKE 'sl%'
GROUP BY term ORDER BY df DESC, term LIMIT 20""",
)
def q_terms_component(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return (
        d.select("conv_id", "turn_idx", F.explode("toks").alias("term"))
        .distinct()
        .filter(F.col("term").startswith("sl"))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), "term")
        .limit(20)
    )


# ===========================================================================
# W: sorts / paging / rerank / analytic windows
# ===========================================================================

# ref: lucene/core/src/java/org/apache/lucene/search/Sort.java, SortField.java
# (multi-key docvalues sort, missing last)
@op(
    "q_sort_fields",
    f"""{DOCS_CTE}
SELECT conv_id, turn_idx, tool FROM docs
ORDER BY tool ASC NULLS LAST, conv_id DESC, turn_idx LIMIT 50""",
)
def q_sort_fields(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return (
        d.select("conv_id", "turn_idx", "tool")
        .orderBy(F.col("tool").asc_nulls_last(), F.desc("conv_id"), "turn_idx")
        .limit(50)
    )


# ref: solr/core/src/java/org/apache/solr/search/CursorMark.java (keyset paging)
@op(
    "q_cursor_mark",
    f"""{DOCS_CTE}
SELECT conv_id, turn_idx FROM docs
WHERE (conv_id, turn_idx) > ('conv00000010', 3)
ORDER BY conv_id, turn_idx LIMIT 20""",
)
def q_cursor_mark(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return (
        d.filter(
            F.struct("conv_id", "turn_idx")
            > F.struct(F.lit("conv00000010"), F.lit(3))
        )
        .select("conv_id", "turn_idx")
        .orderBy("conv_id", "turn_idx")
        .limit(20)
    )


# ref: solr/core/src/java/org/apache/solr/search/ReRankQParserPlugin.java
# (re-score phase-1 top-N with a second query)
@op(
    "q_rerank",
    f"""{DOCS_CTE},
p1 AS (
  SELECT conv_id, turn_idx,
         CAST(len(list_filter(toks, t -> t = 'data')) AS BIGINT) AS s1,
         CAST(len(list_filter(toks, t -> t = 'fast')) AS BIGINT) AS s2
  FROM docs WHERE list_contains(toks, 'data')
  ORDER BY s1 DESC, conv_id, turn_idx LIMIT 50)
SELECT conv_id, turn_idx, s1 + 2 * s2 AS score
FROM p1 ORDER BY score DESC, conv_id, turn_idx LIMIT 10""",
)
def q_rerank(spark, sf_dir):
    d = _docs(spark, sf_dir)
    p1 = (
        d.filter(F.array_contains("toks", "data"))
        .select(
            "conv_id", "turn_idx",
            F.size(F.filter("toks", lambda t: t == "data")).cast("long").alias("s1"),
            F.size(F.filter("toks", lambda t: t == "fast")).cast("long").alias("s2"),
        )
        .orderBy(F.desc("s1"), "conv_id", "turn_idx")
        .limit(50)
    )
    return (
        p1.select(
            "conv_id", "turn_idx", (F.col("s1") + 2 * F.col("s2")).alias("score")
        )
        .orderBy(F.desc("score"), "conv_id", "turn_idx")
        .limit(10)
    )


# ref: io/stream/UniqueStream.java (dedup on sorted stream)
@op(
    "q_unique_stream",
    f"""{DOCS_CTE}
SELECT DISTINCT role, tool FROM docs WHERE tool IS NOT NULL
ORDER BY role, tool""",
)
def q_unique_stream(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return (
        d.filter(F.col("tool").isNotNull())
        .select("role", "tool")
        .dropDuplicates()
        .orderBy("role", "tool")
    )


# ref: io/stream/CartesianProductStream.java (one outgoing tuple per
# element of a multivalued field, original fields copied — the
# streaming-expression explode). Spark-first: posexplode IS the
# operator; the narrow domain is selected before the explode so only
# matching rows widen.
@op(
    "q_cartesian_stream",
    f"""{DOCS_CTE},
dom AS (
  SELECT conv_id, turn_idx, toks FROM docs
  WHERE list_contains(toks, 'vector') AND role = 'system')
SELECT conv_id, turn_idx,
       CAST(generate_subscripts(toks, 1) - 1 AS BIGINT) AS pos,
       unnest(toks) AS tok
FROM dom
ORDER BY conv_id, turn_idx, pos""",
)
def q_cartesian_stream(spark, sf_dir):
    d = _docs(spark, sf_dir)
    dom = d.filter(
        F.array_contains("toks", "vector") & (F.col("role") == "system")
    ).select("conv_id", "turn_idx", "toks")
    return (
        dom.select(
            "conv_id", "turn_idx",
            F.posexplode("toks").alias("pos", "tok"),
        )
        .withColumn("pos", F.col("pos").cast("long"))
        .orderBy("conv_id", "turn_idx", "pos")
    )


# ref: SURVEY §2.5 last row — general analytic windows (lag/running agg),
# exceeding the reference's specialized forms
@op(
    "q_window_analytics",
    """SELECT day, event_type, cnt,
       CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running,
       CAST(lag(cnt) OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS prev
FROM (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
         count(*) AS cnt
  FROM events GROUP BY 1, 2)
ORDER BY event_type, day""",
)
def q_window_analytics(spark, sf_dir):
    e = _events(spark, sf_dir)
    daily = e.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        "event_type",
    ).agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("day")
    return daily.select(
        "day", "event_type", "cnt",
        F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long").alias("running"),
        F.lag("cnt").over(w).cast("long").alias("prev"),
    ).orderBy("event_type", "day")


# ===========================================================================
# T: set operations
# ===========================================================================

# ref: io/stream/MergeStream.java (k-way union of sorted streams)
@op(
    "q_set_union",
    f"""{DOCS_CTE}
SELECT conv_id, turn_idx FROM docs WHERE list_contains(toks, 'merge')
UNION
SELECT conv_id, turn_idx FROM docs WHERE tool = 'tool_7'
ORDER BY conv_id, turn_idx""",
)
def q_set_union(spark, sf_dir):
    d = _docs(spark, sf_dir)
    a = d.filter(F.array_contains("toks", "merge")).select("conv_id", "turn_idx")
    b = d.filter(F.col("tool") == "tool_7").select("conv_id", "turn_idx")
    return a.unionByName(b).distinct().orderBy("conv_id", "turn_idx")


# ref: io/stream/IntersectStream.java, solr DocSet intersection (T1/T3)
@op(
    "q_set_intersect",
    f"""{DOCS_CTE}
SELECT conv_id, turn_idx FROM docs WHERE list_contains(toks, 'merge')
INTERSECT
SELECT conv_id, turn_idx FROM docs WHERE list_contains(toks, 'table')
ORDER BY conv_id, turn_idx""",
)
def q_set_intersect(spark, sf_dir):
    d = _docs(spark, sf_dir)
    a = d.filter(F.array_contains("toks", "merge")).select("conv_id", "turn_idx")
    b = d.filter(F.array_contains("toks", "table")).select("conv_id", "turn_idx")
    return a.intersect(b).orderBy("conv_id", "turn_idx")


# ref: io/stream/ComplementStream.java (andNot)
@op(
    "q_set_complement",
    f"""{DOCS_CTE}
SELECT conv_id, turn_idx FROM docs WHERE list_contains(toks, 'merge')
EXCEPT
SELECT conv_id, turn_idx FROM docs WHERE list_contains(toks, 'stream')
ORDER BY conv_id, turn_idx""",
)
def q_set_complement(spark, sf_dir):
    d = _docs(spark, sf_dir)
    a = d.filter(F.array_contains("toks", "merge")).select("conv_id", "turn_idx")
    b = d.filter(F.array_contains("toks", "stream")).select("conv_id", "turn_idx")
    return a.exceptAll(b).distinct().orderBy("conv_id", "turn_idx")


# ===========================================================================
# F: scalar function queries (ValueSourceParser surface)
# ===========================================================================

# ref: solr/core/src/java/org/apache/solr/search/ValueSourceParser.java
# (math family: sqrt/ln/abs/recip/scale-style expressions)
@op(
    "q_function_math",
    f"""{DOCS_CTE}
SELECT conv_id, turn_idx,
  round(sqrt(len(toks)) + ln(1 + turn_idx) + abs(len(toks) - 50) / 10.0
        + 1000.0 / (1.0 * len(toks) + 10), 4) AS fval
FROM docs WHERE turn_idx < 2
ORDER BY fval DESC, conv_id, turn_idx LIMIT 40""",
)
def q_function_math(spark, sf_dir):
    d = _docs(spark, sf_dir).withColumn("dl", F.size("toks"))
    fval = F.round(
        F.sqrt("dl")
        + F.log(1 + F.col("turn_idx"))
        + F.abs(F.col("dl") - 50) / 10.0
        + 1000.0 / (1.0 * F.col("dl") + 10),
        4,
    )
    return (
        d.filter(F.col("turn_idx") < 2)
        .select("conv_id", "turn_idx", fval.alias("fval"))
        .orderBy(F.desc("fval"), "conv_id", "turn_idx")
        .limit(40)
    )


# ref: solr/core/src/java/org/apache/solr/search/ValueSourceParser.java
#      ("scale" → ScaleFloatFunction: min-max normalize against GLOBAL
#      field stats; "map" → RangeMapFloatFunction; "linear" →
#      LinearFloatFunction)
@op(
    "q_function_scale_map",
    f"""{DOCS_CTE},
stats AS (SELECT min(len(toks)) AS mn, max(len(toks)) AS mx FROM docs)
SELECT conv_id, turn_idx,
  round((len(toks) - mn) / CAST(mx - mn AS DOUBLE), 4) AS scaled,
  CASE WHEN len(toks) BETWEEN 0 AND 20 THEN -1.0
       ELSE CAST(len(toks) AS DOUBLE) END AS mapped,
  round(2.0 * len(toks) + 7.0, 1) AS lin
FROM docs, stats WHERE turn_idx = 0
ORDER BY conv_id, turn_idx""",
)
def q_function_scale_map(spark, sf_dir):
    """scale(dl, 0, 1) / map(dl, 0, 20, -1) / linear(dl, 2, 7): scale
    needs the GLOBAL min/max — one tiny broadcast aggregate, exactly
    ScaleFloatFunction's createWeight pre-pass; map and linear stay
    row-local Catalyst expressions."""
    d = _docs(spark, sf_dir).withColumn("dl", F.size("toks"))
    stats = d.agg(
        F.min("dl").alias("mn"), F.max("dl").alias("mx")
    )
    return (
        d.filter(F.col("turn_idx") == 0)
        .crossJoin(F.broadcast(stats))
        .select(
            "conv_id", "turn_idx",
            F.round(
                (F.col("dl") - F.col("mn"))
                / (F.col("mx") - F.col("mn")).cast("double"), 4
            ).alias("scaled"),
            F.when(F.col("dl").between(0, 20), F.lit(-1.0))
            .otherwise(F.col("dl").cast("double")).alias("mapped"),
            F.round(2.0 * F.col("dl") + 7.0, 1).alias("lin"),
        )
        .orderBy("conv_id", "turn_idx")
    )


# ref: solr/core/src/java/org/apache/solr/search/function/distance/
# HaversineFunction.java (geodist) + lucene/core .../document/LatLonPoint
# .java#newDistanceQuery (distance filter with a bounding-box prune).
# Deterministic synthetic store location per conversation (no lat/lon in
# the corpus): lat = (n*37 mod 160) - 80 + .5, lon = (n*91 mod 360) -
# 180 + .5 — both engines derive it identically. The Spark side applies
# the Lucene-style conservative bbox BEFORE the haversine (cheap prune
# that at scale pushes to the scan; the exact predicate then dedupes
# the boundary), the oracle applies only the exact predicate — equal
# results prove the prune is sound.
_GEO_R = 6371.0087714  # Lucene GeoUtils.EARTH_MEAN_RADIUS, km
_GEO_PT = (12.5, 42.5)
_GEO_D = 6000.0


@op(
    "q_geo_dist",
    f"""{DOCS_CTE},
locs AS (
  SELECT DISTINCT conv_id,
    (CAST(substr(conv_id, 5) AS BIGINT) * 37 % 160) - 80 + 0.5 AS lat,
    (CAST(substr(conv_id, 5) AS BIGINT) * 91 % 360) - 180 + 0.5 AS lon
  FROM docs),
dists AS (
  SELECT conv_id, lat, lon,
    2 * {_GEO_R} * asin(sqrt(
      pow(sin(radians(lat - {_GEO_PT[0]}) / 2), 2)
      + cos(radians({_GEO_PT[0]})) * cos(radians(lat))
        * pow(sin(radians(lon - {_GEO_PT[1]}) / 2), 2))) AS dist
  FROM locs)
SELECT conv_id, round(dist, 4) AS dist_km
FROM dists WHERE dist <= {_GEO_D}
ORDER BY round(dist, 4), conv_id""",
)
def q_geo_dist(spark, sf_dir):
    d = _docs(spark, sf_dir)
    n = F.substring("conv_id", 5, 8).cast("long")
    locs = d.select(
        "conv_id",
        ((n * 37 % 160) - 80 + 0.5).alias("lat"),
        ((n * 91 % 360) - 180 + 0.5).alias("lon"),
    ).distinct()
    lat0, lon0 = _GEO_PT
    # conservative bbox prune (> true radius; exact filter follows)
    lat_pad = _GEO_D / 110.0
    boxed = locs.filter(
        (F.abs(F.col("lat") - lat0) <= lat_pad)
        & (
            (F.abs(F.col("lon") - lon0)
             <= _GEO_D / (110.0 * F.greatest(F.cos(F.radians("lat")), F.lit(0.02))))
            | (F.abs(F.col("lon") - lon0) >= 360 - _GEO_D
               / (110.0 * F.greatest(F.cos(F.radians("lat")), F.lit(0.02))))
        )
    )
    dist = (
        2 * _GEO_R
        * F.asin(F.sqrt(
            F.pow(F.sin(F.radians(F.col("lat") - lat0) / 2), 2)
            + F.cos(F.radians(F.lit(lat0))) * F.cos(F.radians("lat"))
            * F.pow(F.sin(F.radians(F.col("lon") - lon0) / 2), 2)
        ))
    )
    return (
        boxed.withColumn("dist", dist)
        .filter(F.col("dist") <= _GEO_D)
        .select("conv_id", F.round("dist", 4).alias("dist_km"))
        .orderBy("dist_km", "conv_id")
    )


# ref: solr/core/src/java/org/apache/solr/handler/component/
# SpatialHeatmapFacets.java + lucene/spatial-extras/.../prefix/
# HeatmapFacetCounter.java (facet.heatmap: counts per grid cell of a
# bbox at a chosen grid level; rows index from the box TOP down, cols
# from the left). Spark-first: cell assignment is scan-side integer
# arithmetic, the count is ONE partial-aggregating groupBy over a
# KEY SPACE BOUNDED BY THE GRID (≤ rows×cols cells regardless of
# corpus size), and the bbox restriction is a pushable range filter —
# at 100 TB the shuffle carries at most one row per cell per task.
# Sparse cells (count 0) are omitted (Solr emits null rows; the
# nonzero cell set plus the fixed grid reconstructs them).
@op(
    "q_facet_heatmap",
    f"""{DOCS_CTE},
dom AS (
  SELECT DISTINCT conv_id FROM docs WHERE list_contains(toks, 'scan')),
locs AS (
  SELECT DISTINCT conv_id,
    (CAST(substr(conv_id, 5) AS BIGINT) * 37 % 160) - 80 + 0.5 AS lat,
    (CAST(substr(conv_id, 5) AS BIGINT) * 91 % 360) - 180 + 0.5 AS lon
  FROM docs),
cells AS (
  SELECT CAST(floor((40 - lat) / 10) AS BIGINT) AS grid_row,
         CAST(floor((lon + 90) / 10) AS BIGINT) AS grid_col
  FROM locs JOIN dom USING (conv_id)
  WHERE lat BETWEEN -40 AND 40 AND lon BETWEEN -90 AND 90)
SELECT grid_row, grid_col, count(*) AS cnt
FROM cells GROUP BY grid_row, grid_col
ORDER BY grid_row, grid_col""",
)
def q_facet_heatmap(spark, sf_dir):
    d = _docs(spark, sf_dir)
    dom = (
        d.filter(F.array_contains("toks", "scan"))
        .select("conv_id")
        .distinct()
    )
    n = F.substring("conv_id", 5, 8).cast("long")
    locs = d.select(
        "conv_id",
        ((n * 37 % 160) - 80 + 0.5).alias("lat"),
        ((n * 91 % 360) - 180 + 0.5).alias("lon"),
    ).distinct()
    # heatmap bbox [-90,90]x[-40,40], 10-degree cells: row 0 = top
    return (
        locs.join(dom, "conv_id", "left_semi")
        .filter(F.col("lat").between(-40, 40) & F.col("lon").between(-90, 90))
        .select(
            F.floor((40 - F.col("lat")) / 10).alias("grid_row"),
            F.floor((F.col("lon") + 90) / 10).alias("grid_col"),
        )
        .groupBy("grid_row", "grid_col")
        .agg(F.count("*").alias("cnt"))
        .orderBy("grid_row", "grid_col")
    )


# ref: solr/core/src/java/org/apache/solr/search/SpatialFilterQParser
# Plugin.java ({!geofilt} exact d-km circle and {!bbox} the circle's
# enclosing lat/lon box) + lucene/core/.../document/LatLonPoint.java
# (newDistanceQuery / newBoxQuery) + spatial4j GeoCircle#getBoundingBox
# (the box formula: dLat = d/R; dLon = asin(sin(d/R)/cos(lat0)) —
# wider than dLat away from the equator, the circle's true lon extent).
# Spark-first: both are constant-score FILTERS (the match set is the
# contract, like Solr's default score=none); the box is pure range
# arithmetic on scan columns (pushable at 100 TB), geofilt adds the
# exact haversine AFTER the same conservative prune as q_geo_dist.
_SPATIAL_QPARSER_RE = re.compile(
    r"^\{!(geofilt|bbox)\s+pt=(-?\d+(?:\.\d+)?),(-?\d+(?:\.\d+)?)"
    r"\s+sfield=(\w+)\s+d=(\d+(?:\.\d+)?)\}$"
)


def parse_spatial_qparser(qs: str) -> tuple[str, float, float, float]:
    """Parse {!geofilt|bbox pt=LAT,LON sfield=loc d=KM} local params.

    Front-door validation like SpatialFilterQParser's 400s: the only
    spatial pseudo-field here is ``loc`` (the deterministic derived
    location), d must be positive, |lat| <= 90.
    """
    m = _SPATIAL_QPARSER_RE.match(qs.strip())
    if not m:
        raise ValueError(f"not a spatial filter query: {qs!r}")
    kind, lat, lon, sfield, d = (
        m.group(1), float(m.group(2)), float(m.group(3)),
        m.group(4), float(m.group(5)),
    )
    if sfield != "loc":
        raise ValueError(f"undefined spatial field: {sfield!r}")
    if not d > 0:
        raise ValueError(f"d must be > 0: {d}")
    if abs(lat) > 90:
        raise ValueError(f"bad latitude: {lat}")
    return kind, lat, lon, d


def _conv_locs(d: DataFrame) -> DataFrame:
    """The corpus' deterministic per-conversation location."""
    n = F.substring("conv_id", 5, 8).cast("long")
    return d.select(
        "conv_id",
        ((n * 37 % 160) - 80 + 0.5).alias("lat"),
        ((n * 91 % 360) - 180 + 0.5).alias("lon"),
    ).distinct()


_LOCS_CTE = """locs AS (
  SELECT DISTINCT conv_id,
    (CAST(substr(conv_id, 5) AS BIGINT) * 37 % 160) - 80 + 0.5 AS lat,
    (CAST(substr(conv_id, 5) AS BIGINT) * 91 % 360) - 180 + 0.5 AS lon
  FROM docs)"""

_GF_PT = (-20.5, -150.5)
_GF_D = 4000.0
# The {!bbox} box around _GF_PT with radius _GF_D (degrees), computed
# ONCE in Python and embedded verbatim in both engines — identical
# float constants by construction.
_BB_DLAT = math.degrees(_GF_D / _GEO_R)
_BB_DLON = math.degrees(
    math.asin(min(1.0, math.sin(_GF_D / _GEO_R)
                   / math.cos(math.radians(_GF_PT[0]))))
)


def _box_pred_sql() -> str:
    lat0, lon0 = _GF_PT
    lo, hi = lon0 - _BB_DLON, lon0 + _BB_DLON
    lat_band = f"lat BETWEEN {lat0 - _BB_DLAT!r} AND {lat0 + _BB_DLAT!r}"
    if lo < -180:  # box wraps the antimeridian: two disjoint lon bands
        return (f"({lat_band} AND (lon <= {hi!r} OR lon >= {lo + 360!r}))")
    if hi > 180:
        return (f"({lat_band} AND (lon >= {lo!r} OR lon <= {hi - 360!r}))")
    return f"({lat_band} AND lon BETWEEN {lo!r} AND {hi!r})"


def _box_pred_col():
    lat0, lon0 = _GF_PT
    lo, hi = lon0 - _BB_DLON, lon0 + _BB_DLON
    lat_band = F.col("lat").between(lat0 - _BB_DLAT, lat0 + _BB_DLAT)
    if lo < -180:
        return lat_band & ((F.col("lon") <= hi) | (F.col("lon") >= lo + 360))
    if hi > 180:
        return lat_band & ((F.col("lon") >= lo) | (F.col("lon") <= hi - 360))
    return lat_band & F.col("lon").between(lo, hi)


@op(
    "q_geofilt_qparser",
    f"""{DOCS_CTE},
{_LOCS_CTE},
dists AS (
  SELECT conv_id,
    2 * {_GEO_R} * asin(sqrt(
      pow(sin(radians(lat - {_GF_PT[0]!r}) / 2), 2)
      + cos(radians({_GF_PT[0]!r})) * cos(radians(lat))
        * pow(sin(radians(lon - {_GF_PT[1]!r}) / 2), 2))) AS dist
  FROM locs)
SELECT conv_id FROM dists WHERE dist <= {_GF_D!r}
ORDER BY conv_id""",
)
def q_geofilt_qparser(spark, sf_dir):
    kind, lat0, lon0, dkm = parse_spatial_qparser(
        f"{{!geofilt pt={_GF_PT[0]},{_GF_PT[1]} sfield=loc d={_GF_D}}}"
    )
    assert kind == "geofilt"
    locs = _conv_locs(_docs(spark, sf_dir))
    # conservative prune first (same shape as q_geo_dist), exact after
    lat_pad = dkm / 110.0
    lon_pad = dkm / (110.0 * F.greatest(F.cos(F.radians("lat")), F.lit(0.02)))
    boxed = locs.filter(
        (F.abs(F.col("lat") - lat0) <= lat_pad)
        & ((F.abs(F.col("lon") - lon0) <= lon_pad)
           | (F.abs(F.col("lon") - lon0) >= 360 - lon_pad))
    )
    dist = (
        2 * _GEO_R
        * F.asin(F.sqrt(
            F.pow(F.sin(F.radians(F.col("lat") - lat0) / 2), 2)
            + F.cos(F.radians(F.lit(lat0))) * F.cos(F.radians("lat"))
            * F.pow(F.sin(F.radians(F.col("lon") - lon0) / 2), 2)
        ))
    )
    return (
        boxed.filter(dist <= dkm).select("conv_id").orderBy("conv_id")
    )


@op(
    "q_bbox_qparser",
    f"""{DOCS_CTE},
{_LOCS_CTE}
SELECT conv_id FROM locs WHERE {_box_pred_sql()}
ORDER BY conv_id""",
)
def q_bbox_qparser(spark, sf_dir):
    kind, lat0, lon0, dkm = parse_spatial_qparser(
        f"{{!bbox pt={_GF_PT[0]},{_GF_PT[1]} sfield=loc d={_GF_D}}}"
    )
    assert kind == "bbox"
    locs = _conv_locs(_docs(spark, sf_dir))
    return (
        locs.filter(_box_pred_col()).select("conv_id").orderBy("conv_id")
    )


# ref: solr/core/src/java/org/apache/solr/schema/CurrencyFieldType.java
# (currency(field, CUR) conversion + asymmetric range queries via a
# provider rate table). Spark-first: the rate table is a broadcast
# dimension; the conversion is arithmetic on the scan, so the range
# predicate pushes into the same plan shape as any numeric fq.
@op(
    "q_currency_range",
    """WITH rates(cur, usd_per) AS (VALUES ('USD', 1.0), ('EUR', 1.1), ('JPY', 0.007)),
priced AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         CASE CAST(o_orderkey % 3 AS INTEGER)
           WHEN 0 THEN 'USD' WHEN 1 THEN 'EUR' ELSE 'JPY' END AS cur
  FROM orders)
SELECT p.o_orderkey, p.cur,
       round(p.o_totalprice * r.usd_per, 2) AS usd
FROM priced p JOIN rates r ON p.cur = r.cur
WHERE p.o_totalprice * r.usd_per BETWEEN 400000 AND 420000
ORDER BY usd DESC, p.o_orderkey LIMIT 25""",
)
def q_currency_range(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rates = spark.createDataFrame(
        [("USD", 1.0), ("EUR", 1.1), ("JPY", 0.007)], "cur string, usd_per double"
    )
    priced = o.withColumn(
        "cur",
        F.element_at(
            F.array(F.lit("USD"), F.lit("EUR"), F.lit("JPY")),
            (F.col("o_orderkey") % 3).cast("int") + 1,
        ),
    )
    usd = F.col("o_totalprice") * F.col("usd_per")
    return (
        priced.join(F.broadcast(rates), "cur")
        .filter(usd.between(400000, 420000))
        .select(
            "o_orderkey", "cur", F.round(usd, 2).alias("usd"),
        )
        .orderBy(F.desc("usd"), "o_orderkey")
        .limit(25)
    )


# ref: solr/core/src/java/org/apache/solr/handler/component/
#      SpatialHeatmapFacets.java (facet.heatmap: counts_ints2D — a 2D
#      grid of doc counts over the query domain at a gridLevel-chosen
#      cell size). Spark-first: the grid cell is two integer
#      divisions, the heatmap ONE groupBy over narrow rows — cells
#      with no docs are simply absent (the dense counts_ints2D padding
#      is a response-writer concern, not an engine one).
@op(
    "q_facet_heatmap",
    f"""{DOCS_CTE},
locs AS (
  SELECT DISTINCT conv_id,
    (CAST(substr(conv_id, 5) AS BIGINT) * 37 % 160) - 80 + 0.5 AS lat,
    (CAST(substr(conv_id, 5) AS BIGINT) * 91 % 360) - 180 + 0.5 AS lon
  FROM docs),
dom AS (
  SELECT d.conv_id, l.lat, l.lon FROM docs d
  JOIN locs l ON d.conv_id = l.conv_id
  WHERE list_contains(d.toks, 'merge'))
SELECT CAST(floor((lon + 180) / 20) AS INTEGER) AS gridx,
       CAST(floor((lat + 80) / 20) AS INTEGER) AS gridy,
       count(*) AS cnt
FROM dom
GROUP BY 1, 2 ORDER BY gridy, gridx""",
)
def q_facet_heatmap(spark, sf_dir):
    d = _docs(spark, sf_dir)
    n = F.substring("conv_id", 5, 8).cast("long")
    # the location is a derived docvalue of conv_id — computed inline
    # on the domain rows, so the heatmap is ONE narrow groupBy (no
    # location join to shuffle at corpus scale)
    dom = d.filter(F.array_contains("toks", "merge")).select(
        ((n * 37 % 160) - 80 + 0.5).alias("lat"),
        ((n * 91 % 360) - 180 + 0.5).alias("lon"),
    )
    return (
        dom.select(
            F.floor((F.col("lon") + 180) / 20).cast("int").alias("gridx"),
            F.floor((F.col("lat") + 80) / 20).cast("int").alias("gridy"),
        )
        .groupBy("gridx", "gridy")
        .agg(F.count("*").alias("cnt"))
        .orderBy("gridy", "gridx")
    )


# ref: ValueSourceParser strdist/concat + io/eval Upper/Lower/Trim evaluators
@op(
    "q_function_string",
    f"""{DOCS_CTE}
SELECT DISTINCT role,
  concat(upper(role), '_', CAST(length(role) AS VARCHAR)) AS tag,
  levenshtein(role, 'user') AS dist_user
FROM docs ORDER BY role""",
)
def q_function_string(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return (
        d.select(
            "role",
            F.concat(
                F.upper("role"), F.lit("_"), F.length("role").cast("string")
            ).alias("tag"),
            F.levenshtein("role", F.lit("user")).cast("long").alias("dist_user"),
        )
        .distinct()
        .orderBy("role")
    )


# ref: solr/core/src/java/org/apache/solr/util/DateMathParser.java
# (NOW/DAY-7DAYS style arithmetic) + ms() diff
@op(
    "q_function_date",
    """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, count(*) AS cnt
FROM events
WHERE ts >= TIMESTAMP '2024-01-22' - INTERVAL 7 DAY
  AND ts < TIMESTAMP '2024-01-22'
GROUP BY 1 ORDER BY day""",
)
def q_function_date(spark, sf_dir):
    e = _events(spark, sf_dir)
    return (
        e.filter(
            (F.col("ts") >= F.expr("timestamp'2024-01-22' - interval 7 days"))
            & (F.col("ts") < "2024-01-22")
        )
        .groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"))
        .agg(F.count("*").alias("cnt"))
        .orderBy("day")
    )


# ref: SURVEY §2.8 last row — sliding window (no reference equivalent;
# nearest is TimeseriesStream fixed buckets). F.window with slide.
@op(
    "q_sliding_window",
    """SELECT strftime(w_start, '%Y-%m-%d %H:%M') AS w, count(*) AS cnt,
       round(sum(value), 2) AS total
FROM (
  SELECT to_timestamp(floor(epoch(ts) / 43200) * 43200)
           - INTERVAL (o * 12) HOUR AS w_start, value
  FROM events, UNNEST([0, 1]) AS u(o))
GROUP BY 1 ORDER BY w""",
)
def q_sliding_window(spark, sf_dir):
    """24h windows sliding every 12h: each event lands in exactly two
    windows; the DuckDB twin materializes the same two windows per
    event arithmetically."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "24 hours", "12 hours").alias("win"))
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm").alias("w"),
            "cnt", "total",
        )
        .orderBy("w")
    )


# ref: SURVEY §2.8 last row — session window (gap-based); DuckDB twin
# via the classic gaps-and-islands lag/cumsum construction.
@op(
    "q_session_window",
    """WITH o AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events WHERE user_id < 50),
s AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts) AS sess
  FROM o)
SELECT user_id, count(DISTINCT sess) AS n_sessions, count(*) AS n_events
FROM s GROUP BY user_id ORDER BY user_id""",
)
def q_session_window(spark, sf_dir):
    """30-min-gap sessionization per user (session_window analog; the
    Spark side uses the same lag/cumsum plan so both engines express
    identical session identity — F.session_window gives the same
    counts in streaming contexts)."""
    e = _events(spark, sf_dir).filter(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy("ts")
    o = e.select(
        "user_id", "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            | ((F.col("ts") - F.lag("ts").over(w)) > F.expr("interval 30 minutes")),
            1,
        ).otherwise(0).alias("new_sess"),
    )
    s = o.withColumn("sess", F.sum("new_sess").over(w))
    return (
        s.groupBy("user_id")
        .agg(
            F.countDistinct("sess").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )


# ref: solr/core/src/java/org/apache/solr/update/processor/
# DistributedUpdateProcessor.java#versionAdd (N3) — last-writer-wins
# versioned upsert as a batch op: keep the max-ts row per key.
@op(
    "q_versioned_upsert",
    f"""{DOCS_CTE},
updates AS (
  SELECT conv_id, turn_idx, role, ts FROM docs
  UNION ALL
  SELECT conv_id, turn_idx, 'edited' AS role, ts + INTERVAL 1 DAY AS ts
  FROM docs WHERE turn_idx = 0)
SELECT conv_id, turn_idx, role FROM (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
            ORDER BY ts DESC, role) AS rn FROM updates)
WHERE rn = 1 ORDER BY conv_id, turn_idx""",
)
def q_versioned_upsert(spark, sf_dir):
    d = _docs(spark, sf_dir).select("conv_id", "turn_idx", "role", "ts")
    edited = d.filter(F.col("turn_idx") == 0).select(
        "conv_id", "turn_idx",
        F.lit("edited").alias("role"),
        F.expr("ts + interval 1 day").alias("ts"),
    )
    updates = d.unionByName(edited)
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(
        F.desc("ts"), F.asc("role")
    )
    return (
        updates.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("conv_id", "turn_idx", "role")
        .orderBy("conv_id", "turn_idx")
    )


# ref: SURVEY §2.7 Array/Map/JSON row — events.props JSON transport
@op(
    "q_json_extract",
    """SELECT CAST(regexp_extract(props, '[0-9]+', 0) AS INTEGER) % 10 AS kmod,
       count(*) AS cnt
FROM events GROUP BY 1 ORDER BY kmod""",
)
def q_json_extract(spark, sf_dir):
    e = _events(spark, sf_dir)
    return (
        e.groupBy(
            (F.regexp_extract("props", "[0-9]+", 0).cast("int") % 10).alias("kmod")
        )
        .agg(F.count("*").alias("cnt"))
        .orderBy("kmod")
    )


# ===========================================================================
# Highlighting (the term-vectors consumer SURVEY §1.1 promises)
# ===========================================================================

# ref: lucene/highlighter/src/java/org/apache/lucene/search/highlight/
#      Highlighter.java + QueryTermScorer — term-vector-based snippet
#      marking, re-expressed over the tokens column: every query-term
#      occurrence is wrapped in <em> tags, rebuilt with the analyzer's
#      token stream (the UnifiedHighlighter token-level approach; no
#      regex on raw text, so marking agrees with the pinned analyzer).
@op(
    "q_highlight",
    f"""{DOCS_CTE}
SELECT conv_id, turn_idx,
  array_to_string(list_transform(toks, t ->
    CASE WHEN t IN ('table', 'scan') THEN '<em>' || t || '</em>'
         ELSE t END), ' ') AS snippet,
  CAST(len(list_filter(toks, t -> t IN ('table', 'scan'))) AS BIGINT)
    AS n_marks
FROM docs
WHERE list_contains(toks, 'table') AND list_contains(toks, 'scan')
ORDER BY conv_id, turn_idx""",
)
def q_highlight(spark, sf_dir):
    d = _docs(spark, sf_dir)
    terms = ("table", "scan")
    is_hit = lambda t: t.isin(*terms)  # noqa: E731
    mark = F.transform(
        "toks",
        lambda t: F.when(
            is_hit(t), F.concat(F.lit("<em>"), t, F.lit("</em>"))
        ).otherwise(t),
    )
    return (
        d.filter(
            F.array_contains("toks", terms[0])
            & F.array_contains("toks", terms[1])
        )
        .select(
            "conv_id",
            "turn_idx",
            F.array_join(mark, " ").alias("snippet"),
            F.size(F.filter("toks", is_hit)).cast("long").alias("n_marks"),
        )
        .orderBy("conv_id", "turn_idx")
    )


# ref: solr/core/src/java/org/apache/solr/search/FunctionRangeQuery.java
#      + FunctionQParser ({!frange l=.. u=..}func) — a filter over a
#      computed ValueSource; the function here is Solr's recip(x,m,a,b)
#      = a/(m*x+b) over the doc length, the classic boost-by-recency /
#      length shape.
@op(
    "q_frange",
    f"""{DOCS_CTE}
SELECT conv_id, turn_idx,
       round(100.0 / (1.0 * len(toks) + 50.0), 4) AS fval
FROM docs
WHERE 100.0 / (1.0 * len(toks) + 50.0) BETWEEN 0.5 AND 0.9
ORDER BY conv_id, turn_idx""",
)
def q_frange(spark, sf_dir):
    d = _docs(spark, sf_dir)
    fval = 100.0 / (1.0 * F.size("toks") + 50.0)
    return (
        d.withColumn("fv", fval)
        .filter(F.col("fv").between(0.5, 0.9))
        .select("conv_id", "turn_idx", F.round("fv", 4).alias("fval"))
        .orderBy("conv_id", "turn_idx")
    )


# ===========================================================================
# S2/S3 ingest loaders — CSV/JSON bulk ingest round-trips the corpus
# through the wire format and proves byte fidelity against the
# parquet original (the /update/csv + /update/json handlers)
# ===========================================================================

_INGEST_DIRS: dict[tuple[str, str], str] = {}

_DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"

#: fidelity digest: any loader corruption (quoting, escaping, type
#: coercion) shifts at least one of these aggregates
_INGEST_ORACLE = """
SELECT count(*) AS n,
       CAST(sum(doc_id) AS BIGINT) AS idsum,
       CAST(sum(strlen(text)) AS BIGINT) AS chars,
       CAST(count(DISTINCT source) AS BIGINT) AS nsrc,
       CAST(sum(n_chars) AS BIGINT) AS n_chars_sum
FROM documents
""".strip()


def _ingest_digest(df: DataFrame) -> DataFrame:
    return df.agg(
        F.count("*").alias("n"),
        F.sum("doc_id").cast("long").alias("idsum"),
        F.sum(F.length("text")).cast("long").alias("chars"),
        F.countDistinct("source").cast("long").alias("nsrc"),
        F.sum("n_chars").cast("long").alias("n_chars_sum"),
    )


def _ingest_roundtrip(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    # ref: solr/core/src/java/org/apache/solr/handler/loader/CSVLoader.java,
    #      JsonLoader.java — bulk ingest endpoints re-expressed as
    #      spark.read.csv/json with an explicit schema (IndexSchema
    #      analog; no schemaless guessing on the hot path)
    import os
    import tempfile

    key = (sf_dir, fmt)
    path = _INGEST_DIRS.get(key)
    if path is None or not os.path.isdir(path):
        path = tempfile.mkdtemp(prefix=f"lss_ingest_{fmt}_")
        src = spark.read.parquet(f"{sf_dir}/documents.parquet")
        w = src.coalesce(4).write.mode("overwrite")
        if fmt == "csv":
            w.option("header", True).option("escape", '"').csv(path)
        else:
            w.json(path)
        _INGEST_DIRS[key] = path
    if fmt == "csv":
        loaded = (
            spark.read.schema(_DOCS_SCHEMA)
            .option("header", True).option("escape", '"')
            .csv(path)
        )
    else:
        loaded = spark.read.schema(_DOCS_SCHEMA).json(path)
    return _ingest_digest(loaded)


@op("q_ingest_csv", _INGEST_ORACLE)
def q_ingest_csv(spark, sf_dir):
    return _ingest_roundtrip(spark, sf_dir, "csv")


@op("q_ingest_json", _INGEST_ORACLE)
def q_ingest_json(spark, sf_dir):
    return _ingest_roundtrip(spark, sf_dir, "json")


# ---------------------------------------------------------------------------
# ClusteringComponent (search-result clustering) — Carrot2 analog with a
# deterministic labeling rule: each hit in the query domain is assigned
# to its RAREST non-query term (min corpus df, ties lexicographic — the
# max-idf token, i.e. the most distinctive label), clusters reported by
# size. ref: solr/contrib/clustering/src/java/org/apache/solr/handler/
# clustering/ClusteringComponent.java (result-list clustering contract;
# the Carrot2 algorithms themselves are replaced by a pinned
# deterministic rule so the oracle can replicate it exactly).
# ---------------------------------------------------------------------------

@op(
    "q_result_clustering",
    f"""{DOCS_CTE},
hits AS (SELECT conv_id, turn_idx, toks FROM docs
         WHERE list_contains(toks, 'merge')),
dfreq AS (
  SELECT term, count(*) AS df FROM (
    SELECT DISTINCT conv_id, turn_idx, unnest(toks) AS term FROM docs)
  GROUP BY term),
cand AS (
  SELECT h.conv_id, h.turn_idx, t.term, d.df,
         row_number() OVER (PARTITION BY h.conv_id, h.turn_idx
                            ORDER BY d.df, t.term) AS rn
  FROM hits h, UNNEST(list_distinct(h.toks)) AS t(term)
  JOIN dfreq d ON d.term = t.term
  WHERE t.term <> 'merge')
SELECT term AS label, CAST(count(*) AS BIGINT) AS n_docs
FROM cand WHERE rn = 1
GROUP BY term ORDER BY n_docs DESC, label""",
)
def q_result_clustering(spark, sf_dir):
    """Cluster the result list of q='merge': label = the doc's rarest
    non-query term (min global df, tie lexicographic = max idf). One
    df aggregation over the corpus (shared with what an index build
    already computes), one explode bounded by the HIT list's tokens,
    one min-struct per hit — no all-pairs similarity, no iteration;
    at 100 TB the explode is proportional to the result set, not the
    corpus."""
    d = _docs(spark, sf_dir)
    dfreq = (
        d.select(
            "conv_id", "turn_idx",
            F.explode(F.array_distinct("toks")).alias("term"),
        )
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    hits = d.filter(F.array_contains("toks", "merge"))
    cand = (
        hits.select(
            "conv_id", "turn_idx",
            F.explode(F.array_distinct("toks")).alias("term"),
        )
        .filter(F.col("term") != "merge")
        .join(dfreq, "term")
    )
    lab = cand.groupBy("conv_id", "turn_idx").agg(
        F.min(F.struct("df", "term")).alias("m")
    )
    return (
        lab.groupBy(F.col("m.term").alias("label"))
        .agg(F.count("*").cast("long").alias("n_docs"))
        .orderBy(F.desc("n_docs"), "label")
    )


# --- STC result clustering (real Carrot2 semantics, r5) -------------
# Carrot2's second engine, STCClusteringAlgorithm (Zamir & Etzioni
# 1998 "Web Document Clustering: A Feasibility Demonstration"), is
# deterministic — unlike Lingo's SVD — so it oracle-checks row-level.
# Pinned contract:
#   base clusters = contiguous phrases (n = 1..3 over the analyzer
#     stream, distinct per hit doc) present in >= 2 hits and <= 80%
#     of hits, excluding phrases whose EVERY word is a stop word or
#     the query term (the "too general to label" gate);
#   base score = df × w(n), w = {1: 0.5, 2: 2.0, 3: 3.0} (the STC
#     single-word penalty / phrase-length reward);
#   top K = 15 base clusters by (score desc, phrase asc);
#   merge: the classic STC binary 0.5 rule — clusters A, B connect
#     iff |A∩B| > 0.5·|A| AND |A∩B| > 0.5·|B|; final clusters are
#     connected components (component id = lexicographically smallest
#     member phrase, both engines);
#   label = the component's (score desc, phrase asc)-best phrase;
#   size = |union of member base clusters' docs|.
# Scale shape: the phrase explode is bounded by the RESULT SET (not
# the corpus), the merge graph by K² = 225 pairs, and the only
# driver-side work is the K-row transitive closure — the same
# bounded-collect budget as facet limits.
# ref: Carrot2 STCClusteringAlgorithm (carrot2-core), wired in Solr
#      via solr/contrib/clustering/.../CarrotClusteringEngine.java
_STC_K = 15
_STC_W = {1: 0.5, 2: 2.0, 3: 3.0}


def _stc_grams_col():
    """1/2/3-gram phrases over ``toks`` as one array column (empty
    sub-arrays when the doc is shorter than n — sequence() would
    descend on a negative stop, so each n is guarded)."""
    g1 = "transform(toks, t -> t)"
    g2 = ("CASE WHEN size(toks) >= 2 THEN transform("
          "sequence(0, size(toks) - 2),"
          " i -> concat_ws(' ', toks[i], toks[i+1])) "
          "ELSE array() END")
    g3 = ("CASE WHEN size(toks) >= 3 THEN transform("
          "sequence(0, size(toks) - 3),"
          " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) "
          "ELSE array() END")
    return F.expr(f"concat({g1}, {g2}, {g3})")


def _stc_components(rows) -> dict[str, str]:
    """Transitive closure over the <= K collected merge edges:
    phrase -> component id (= min member phrase). Driver-side by
    design — the graph is K nodes, never corpus-sized."""
    comp = {p: p for p in rows}
    edges = rows  # {phrase: set(neighbors)}
    changed = True
    while changed:
        changed = False
        for p, nbrs in edges.items():
            for q in nbrs:
                lo = min(comp[p], comp[q])
                for r in (p, q):
                    if comp[r] != lo:
                        comp[r] = lo
                        changed = True
    return comp


@op(
    "q_result_clustering_stc",
    f"""{DOCS_CTE.replace("WITH ", "WITH RECURSIVE ", 1)},
hits AS (SELECT conv_id, turn_idx, toks FROM docs
         WHERE list_contains(toks, 'merge')),
nh AS (SELECT count(*) AS c FROM hits),
g1 AS (SELECT conv_id, turn_idx, toks[i] AS phrase, 1 AS n
       FROM hits, unnest(range(1, len(toks) + 1)) u(i)),
g2 AS (SELECT conv_id, turn_idx,
              toks[i] || ' ' || toks[i+1] AS phrase, 2 AS n
       FROM hits, unnest(range(1, len(toks))) u(i)),
g3 AS (SELECT conv_id, turn_idx,
              toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS phrase,
              3 AS n
       FROM hits, unnest(range(1, len(toks) - 1)) u(i)),
grams AS (
  SELECT DISTINCT conv_id, turn_idx, phrase, n FROM (
    SELECT * FROM g1 UNION ALL SELECT * FROM g2 UNION ALL
    SELECT * FROM g3)
  WHERE len(list_filter(string_split(phrase, ' '),
        w -> w NOT IN ({{stops}}, 'merge'))) > 0),
base AS (
  SELECT phrase, any_value(n) AS n, count(*) AS bdf,
         count(*) * CASE any_value(n) WHEN 1 THEN 0.5
                    WHEN 2 THEN 2.0 ELSE 3.0 END AS score
  FROM grams GROUP BY phrase
  HAVING count(*) >= 2
     AND count(*) <= floor(0.8 * (SELECT c FROM nh))),
topk AS (
  SELECT *, row_number() OVER (ORDER BY score DESC, phrase) AS rn
  FROM base QUALIFY rn <= {_STC_K}),
memb AS (
  SELECT g.phrase, g.conv_id, g.turn_idx, t.bdf, t.score
  FROM grams g JOIN topk t ON g.phrase = t.phrase),
pair AS (
  SELECT a.phrase AS pa, b.phrase AS pb, count(*) AS ov
  FROM memb a JOIN memb b
    ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
   AND a.phrase < b.phrase
  GROUP BY a.phrase, b.phrase),
edge AS (
  SELECT p.pa, p.pb FROM pair p
  JOIN topk ta ON ta.phrase = p.pa JOIN topk tb ON tb.phrase = p.pb
  WHERE p.ov > 0.5 * ta.bdf AND p.ov > 0.5 * tb.bdf),
edge2 AS (SELECT pa AS u, pb AS v FROM edge
          UNION SELECT pb, pa FROM edge),
reach(node, lbl) AS (
  SELECT phrase, phrase FROM topk
  UNION
  SELECT e.u, r.lbl FROM edge2 e JOIN reach r ON r.node = e.v),
comp AS (SELECT node AS phrase, min(lbl) AS cid FROM reach GROUP BY node),
lab AS (
  SELECT c.cid, t.phrase AS label,
         row_number() OVER (PARTITION BY c.cid
                            ORDER BY t.score DESC, t.phrase) AS lrn
  FROM comp c JOIN topk t ON t.phrase = c.phrase),
sz AS (
  SELECT c.cid,
         count(DISTINCT m.conv_id || '#' || CAST(m.turn_idx AS VARCHAR))
           AS n_docs,
         count(DISTINCT c.phrase) AS n_phrases
  FROM comp c JOIN memb m ON m.phrase = c.phrase GROUP BY c.cid)
SELECT l.label, CAST(s.n_docs AS BIGINT) AS n_docs,
       CAST(s.n_phrases AS BIGINT) AS n_phrases
FROM lab l JOIN sz s ON s.cid = l.cid
WHERE l.lrn = 1
ORDER BY n_docs DESC, label""".replace(
        "{stops}",
        ", ".join(
            f"'{w}'"
            for w in sorted(
                __import__(
                    "lucene_solr_spark.analyzer", fromlist=["x"]
                ).ENGLISH_STOP_WORDS
            )
        ),
    ),
)
def q_result_clustering_stc(spark, sf_dir):
    """STC result clustering for q='merge' (see the contract block
    above). All heavy passes are result-set-bounded; only the
    K-node merge closure runs on the driver."""
    from lucene_solr_spark.analyzer import ENGLISH_STOP_WORDS

    d = _docs(spark, sf_dir)
    hits = d.filter(F.array_contains("toks", "merge"))
    n_hits = hits.count()
    stop_gate = set(ENGLISH_STOP_WORDS) | {"merge"}
    # the gram frame feeds four passes (base dfs, membership, the
    # pair join's two sides, the final size agg) — persisted once,
    # freed after the bounded result materializes (facet discipline)
    grams = (
        hits.select(
            "conv_id", "turn_idx",
            F.explode(_stc_grams_col()).alias("phrase"),
        )
        .distinct()
        .filter(
            F.exists(
                F.split("phrase", " "),
                lambda w: ~w.isin(*sorted(stop_gate)),
            )
        )
        .persist()
    )
    base = (
        grams.groupBy("phrase")
        .agg(F.count("*").alias("bdf"))
        .filter(
            (F.col("bdf") >= 2)
            & (F.col("bdf") <= F.floor(F.lit(0.8 * n_hits)))
        )
        .withColumn(
            "n", F.size(F.split("phrase", " "))
        )
        .withColumn(
            "score",
            F.col("bdf") * F.when(F.col("n") == 1, 0.5)
            .when(F.col("n") == 2, 2.0).otherwise(3.0),
        )
    )
    topk = base.orderBy(F.desc("score"), "phrase").limit(_STC_K)
    top_rows = {r.phrase: (int(r.bdf), float(r.score))
                for r in topk.collect()}  # K rows — bounded
    top_df = spark.createDataFrame(
        [(p,) for p in top_rows], "phrase string"
    )
    memb = grams.join(F.broadcast(top_df), "phrase")
    pa = memb.select(F.col("phrase").alias("pa"), "conv_id", "turn_idx")
    pb = memb.select(F.col("phrase").alias("pb"), "conv_id", "turn_idx")
    pairs = (
        pa.join(pb, ["conv_id", "turn_idx"])
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count("*").alias("ov"))
        .collect()  # <= K^2 rows — bounded
    )
    nbrs: dict[str, set[str]] = {p: set() for p in top_rows}
    for r in pairs:
        if (r.ov > 0.5 * top_rows[r.pa][0]
                and r.ov > 0.5 * top_rows[r.pb][0]):
            nbrs[r.pa].add(r.pb)
            nbrs[r.pb].add(r.pa)
    comp = _stc_components(nbrs)
    label = {}
    for p, (bdf, score) in top_rows.items():
        cid = comp[p]
        cur = label.get(cid)
        if cur is None or (-score, p) < (-cur[1], cur[0]):
            label[cid] = (p, score)
    cmap = spark.createDataFrame(
        [(p, comp[p], label[comp[p]][0]) for p in top_rows],
        "phrase string, cid string, label string",
    )
    out = (
        memb.join(F.broadcast(cmap), "phrase")
        .groupBy("cid", "label")
        .agg(
            F.countDistinct("conv_id", "turn_idx").alias("n_docs"),
            F.countDistinct("phrase").cast("long").alias("n_phrases"),
        )
        .select("label", "n_docs", "n_phrases")
        .orderBy(F.desc("n_docs"), "label")
    )
    rows = out.collect()  # <= K clusters — bounded
    grams.unpersist()
    return spark.createDataFrame(rows, out.schema)


# ref: solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/
#      RandomStream.java (pseudo-random sample of a query's results)
@op(
    "q_random_stream",
    f"""{DOCS_CTE}
SELECT conv_id, turn_idx,
       md5(conv_id || '#' || CAST(turn_idx AS VARCHAR) || '#seed42') AS rkey
FROM docs WHERE list_contains(toks, 'data')
ORDER BY rkey LIMIT 20""",
)
def q_random_stream(spark, sf_dir):
    """RandomStream: a deterministic pseudo-random sample of 20 docs
    from the q='data' domain. Solr seeds a RNG per request; here the
    "random" order is a salted md5 over the doc key — reproducible on
    any cluster size (the hash is the seed, same trick as the
    stratified sampler) and rank-stable for the oracle. The sort's
    TakeOrdered is a per-partition heap of 20, never a full sort."""
    d = _docs(spark, sf_dir)
    return (
        d.filter(F.array_contains("toks", "data"))
        .select(
            "conv_id", "turn_idx",
            F.md5(F.concat_ws(
                "#", F.col("conv_id"), F.col("turn_idx"), F.lit("seed42")
            )).alias("rkey"),
        )
        .orderBy("rkey")
        .limit(20)
    )


# ref: solr/core/src/java/org/apache/solr/handler/component/
#      StatsComponent.java over a function query (stats.field={!func ...},
#      StatsValuesFactory#createStatsValues on a ValueSource)
@op(
    "q_stats_function",
    f"""{DOCS_CTE}
SELECT CAST(count(*) AS BIGINT) AS cnt,
       CAST(min(2 * turn_idx + len(toks)) AS BIGINT) AS vmin,
       CAST(max(2 * turn_idx + len(toks)) AS BIGINT) AS vmax,
       CAST(sum(2 * turn_idx + len(toks)) AS BIGINT) AS vsum,
       round(avg(2 * turn_idx + len(toks)), 4) AS vmean,
       round(stddev_samp(2 * turn_idx + len(toks)), 4) AS vstddev
FROM docs WHERE list_contains(toks, 'merge')""",
)
def q_stats_function(spark, sf_dir):
    """StatsComponent over a FUNCTION QUERY: stats.field={!func
    sum(product(2,turn_idx),doc_len)} — the stats engine runs on a
    computed ValueSource, not a stored field. One partial-aggregating
    pass over the q='merge' domain; every metric is algebraic, so the
    map-side combine does the heavy lifting at scale."""
    d = _docs(spark, sf_dir)
    v = (2 * F.col("turn_idx") + F.size("toks")).alias("v")
    return (
        d.filter(F.array_contains("toks", "merge"))
        .select(v)
        .agg(
            F.count("*").cast("long").alias("cnt"),
            F.min("v").cast("long").alias("vmin"),
            F.max("v").cast("long").alias("vmax"),
            F.sum("v").cast("long").alias("vsum"),
            F.round(F.avg("v"), 4).alias("vmean"),
            F.round(F.stddev("v"), 4).alias("vstddev"),
        )
    )


# ref: solr/core/src/java/org/apache/solr/schema/EnumFieldType.java
# (enumsConfig: symbolic values sort by CONFIGURED ordinal, not
# lexicographically — 'system' < 'user' < 'assistant' < 'tool' here)
_ROLE_ENUM = {"system": 0, "user": 1, "assistant": 2, "tool": 3}


@op(
    "q_enum_sort",
    f"""{DOCS_CTE},
sev AS (
  SELECT conv_id, turn_idx, role,
         CASE role WHEN 'system' THEN 0 WHEN 'user' THEN 1
                   WHEN 'assistant' THEN 2 ELSE 3 END AS severity
  FROM docs WHERE list_contains(toks, 'merge'))
SELECT conv_id, turn_idx, role, CAST(severity AS BIGINT) AS severity
FROM sev
ORDER BY severity DESC, conv_id, turn_idx LIMIT 15""",
)
def q_enum_sort(spark, sf_dir):
    """EnumFieldType: the role field as an ORDERED enum — sorting uses
    the configured ordinal (system < user < assistant < tool), not the
    string's lexicographic order ('assistant' would wrongly sort first
    alphabetically — the discriminator). The mapping is a pinned
    literal CASE on both sides; top-15 by severity desc with the
    pinned tiebreak."""
    sev = F.when(F.col("role") == "system", 0)
    for r_, o_ in list(_ROLE_ENUM.items())[1:]:
        sev = sev.when(F.col("role") == r_, o_)
    d = _docs(spark, sf_dir)
    return (
        d.filter(F.array_contains("toks", "merge"))
        .select("conv_id", "turn_idx", "role",
                sev.cast("long").alias("severity"))
        .orderBy(F.desc("severity"), "conv_id", "turn_idx")
        .limit(15)
    )


# ===========================================================================
# Math streaming expressions (let/col/corr/regress/hist) — Solr's
# data-science surface: parallel numeric arrays pulled out of a search
# and fed to statistical evaluators. Re-expressed as algebraic Spark
# aggregates (one partial-combined pass, never a driver-side array).
# ref: solr/solrj/src/java/org/apache/solr/client/solrj/io/eval/
#      CorrelationEvaluator.java, RegressionEvaluator.java,
#      CovarianceEvaluator.java, HistogramEvaluator.java
# ===========================================================================


@op(
    "q_math_stream_regress",
    """WITH pairs AS (
  SELECT value AS y,
         CAST(regexp_extract(props, '[0-9]+', 0) AS DOUBLE) AS x
  FROM events)
SELECT count(*) AS n,
       round(corr(y, x), 4) AS r,
       round(covar_samp(y, x), 4) AS cov,
       round(regr_slope(y, x), 4) AS slope,
       round(regr_intercept(y, x), 4) AS intercept
FROM pairs""",
)
def q_math_stream_regress(spark, sf_dir):
    """corr()/cov()/regress() evaluators: Pearson correlation, sample
    covariance, and the OLS fit of event value against the numeric
    JSON prop — all algebraic aggregates (sum/sumsq/sumxy partials),
    so the whole evaluation is one map-side-combined pass with a
    1-row result, identical at any parallelism."""
    e = _events(spark, sf_dir)
    pairs = e.select(
        F.col("value").alias("y"),
        F.regexp_extract("props", "[0-9]+", 0).cast("double").alias("x"),
    )
    return pairs.agg(
        F.count("*").alias("n"),
        F.round(F.corr("y", "x"), 4).alias("r"),
        F.round(F.covar_samp("y", "x"), 4).alias("cov"),
        F.round(F.expr("regr_slope(y, x)"), 4).alias("slope"),
        F.round(F.expr("regr_intercept(y, x)"), 4).alias("intercept"),
    )


@op(
    "q_math_stream_hist",
    """WITH ext AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
binned AS (
  SELECT CAST(least(floor((value - lo) * 8.0 / (hi - lo)), 7) AS BIGINT)
         AS bin
  FROM events, ext)
SELECT bin, count(*) AS cnt FROM binned GROUP BY bin ORDER BY bin""",
)
def q_math_stream_hist(spark, sf_dir):
    """hist() evaluator: equal-width 8-bin histogram of event values.
    The (min, max) extent is a 1-row broadcast pre-pass; binning is
    the pinned expression floor((v - lo) * 8.0 / (hi - lo)) clipped
    to bin 7 — basic IEEE ops only (no libm), so bin edges are
    bit-identical cross-engine. Scale: two narrow passes over the
    fact table, counts partial-combined."""
    e = _events(spark, sf_dir)
    ext = e.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    return (
        e.join(F.broadcast(ext))
        .select(
            F.least(
                F.floor((F.col("value") - F.col("lo")) * 8.0 / (F.col("hi") - F.col("lo"))),
                F.lit(7),
            )
            .cast("long")
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count("*").alias("cnt"))
        .orderBy("bin")
    )


# ===========================================================================
# SynonymQuery — query-time synonym scoring with BLENDED term stats:
# the terms score as ONE pseudo-term (tf = Σ tf(t), docFreq = max
# df(t)), which is what keeps a multi-variant word from out-scoring a
# single-variant one just by firing multiple idf contributions. The
# discriminator vs a SHOULD-OR of TermQuerys: OR sums per-term
# idf×saturation; SynonymQuery saturates the SUMMED tf once under one
# idf.
# ref: lucene/core/src/java/org/apache/lucene/search/SynonymQuery.java
#      (docFreq = max, totalTermFreq = sum across the synonym set)
# ===========================================================================

_SYN_TERMS = ("row", "line")


@op(
    "q_synonym_query",
    f"""WITH {TRANSCRIPTS_ORACLE_CTE},
docs AS (SELECT conv_id, turn_idx,
                regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
         FROM transcripts),
docs2 AS (SELECT *, len(toks) AS doc_len FROM docs),
stats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(doc_len) AS DOUBLE) / count(*) AS avgdl,
         greatest(
           sum(CASE WHEN list_contains(toks, 'row') THEN 1 ELSE 0 END),
           sum(CASE WHEN list_contains(toks, 'line') THEN 1 ELSE 0 END)
         ) AS df_blend
  FROM docs2),
tf AS (
  SELECT conv_id, turn_idx, doc_len,
         len(list_filter(toks, t -> t IN ('row', 'line'))) AS tf
  FROM docs2),
scored AS (
  SELECT conv_id, turn_idx,
         round(
           ln(1.0 + (stats.n_docs - stats.df_blend + 0.5)
                    / (stats.df_blend + 0.5))
           * (tf.tf * (1.2 + 1))
           / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.doc_len / stats.avgdl)),
           4) AS score
  FROM tf, stats WHERE tf.tf > 0)
SELECT conv_id, turn_idx, score FROM scored
ORDER BY score DESC, conv_id, turn_idx LIMIT 12""",
)
def q_synonym_query(spark, sf_dir):
    """SynonymQuery('row', 'line') under the pinned BM25: one blended
    pseudo-term (see section comment). Stats are a 1-row broadcast
    (n_docs, avgdl, max-df); per-doc tf is a narrow JVM filter-count;
    the top-k is a TakeOrdered. The 4dp round is the rank key."""
    from lucene_solr_spark.query.model import B, K1

    d = _docs(spark, sf_dir).withColumn(
        "doc_len", F.size("toks").cast("double")
    )
    in_list = ", ".join(f"'{t}'" for t in _SYN_TERMS)
    stats = d.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("doc_len") / F.count("*")).alias("avgdl"),
        F.greatest(
            *[
                F.sum(F.array_contains("toks", t).cast("int")).cast("double")
                for t in _SYN_TERMS
            ]
        ).alias("df_blend"),
    )
    tf = d.select(
        "conv_id",
        "turn_idx",
        "doc_len",
        F.expr(f"cast(size(filter(toks, t -> t IN ({in_list}))) as double)").alias("tf"),
    ).filter(F.col("tf") > 0)
    c = F.col
    return (
        tf.join(F.broadcast(stats))
        .select(
            "conv_id",
            "turn_idx",
            F.round(
                F.log(
                    1.0
                    + (c("n_docs") - c("df_blend") + 0.5) / (c("df_blend") + 0.5)
                )
                * (c("tf") * (K1 + 1))
                / (c("tf") + K1 * (1 - B + B * c("doc_len") / c("avgdl"))),
                4,
            ).alias("score"),
        )
        .orderBy(F.desc("score"), "conv_id", "turn_idx")
        .limit(12)
    )


# ===========================================================================
# FreeTextSuggester — "what word comes next": an n-gram language model
# over the corpus token stream serving next-word completion for a
# context word. Pinned contract: bigram counts, top-5 next words per
# context by (count desc, word asc).
# ref: lucene/suggest/src/java/org/apache/lucene/search/suggest/
#      analyzing/FreeTextSuggester.java (n=2 shape)
# ===========================================================================

_FREETEXT_CTX = ("table", "merge", "slow")


@op(
    "q_suggest_freetext",
    f"""WITH {TRANSCRIPTS_ORACLE_CTE},
docs AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
         FROM transcripts),
bigrams AS (
  SELECT toks[i] AS ctx, toks[i+1] AS nxt
  FROM docs, UNNEST(range(1, len(toks))) AS u(i)
  WHERE len(toks) >= 2),
cnt AS (
  SELECT ctx, nxt, CAST(count(*) AS BIGINT) AS weight
  FROM bigrams WHERE ctx IN {_FREETEXT_CTX}
  GROUP BY ctx, nxt),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY ctx ORDER BY weight DESC, nxt) AS rn
  FROM cnt)
SELECT ctx, nxt, weight FROM ranked WHERE rn <= 5
ORDER BY ctx, weight DESC, nxt""",
)
def q_suggest_freetext(spark, sf_dir):
    """FreeTextSuggester lookup for three context words: the corpus
    bigram LM (one explode + partial-combined count, filtered to the
    broadcast-small context set BEFORE the shuffle — only the probed
    contexts' rows move), top-5 next words each."""
    d = _docs(spark, sf_dir)
    bigrams = d.filter(F.size("toks") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(toks) - 2),"
                " i -> struct(toks[i] AS ctx, toks[i+1] AS nxt))"
            )
        ).alias("bg")
    ).select("bg.ctx", "bg.nxt")
    cnt = (
        bigrams.filter(F.col("ctx").isin(list(_FREETEXT_CTX)))
        .groupBy("ctx", "nxt")
        .agg(F.count("*").cast("long").alias("weight"))
    )
    w = Window.partitionBy("ctx").orderBy(F.desc("weight"), "nxt")
    return (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .drop("rn")
        .orderBy("ctx", F.desc("weight"), "nxt")
    )



# ===========================================================================
# Similarity families beyond the pinned BM25 (the Lucene Similarity
# extension surface, demonstrated as ALTERNATE scoring plans over the
# same corpus — the serving index keeps its rank-identity BM25).
# ===========================================================================

# ref: lucene/core/src/java/org/apache/lucene/search/similarities/
# LMDirichletSimilarity.java — Bayesian smoothing with Dirichlet priors
# (Zhai & Lafferty 2001): per-term contribution
#   max(0, ln(1 + tf / (mu * p(t|C))) + ln(mu / (dl + mu))), mu = 2000,
# p(t|C) = cf(t) / |C| tokens; negative contributions clamp to 0 (the
# class's documented behavior). OR semantics over the query terms, rank
# on the 4dp round.
@op(
    "q_lm_dirichlet",
    f"""{DOCS_CTE},
d AS (
  SELECT conv_id, turn_idx, len(toks) AS dl,
         len(list_filter(toks, t -> t = 'merge')) AS tf1,
         len(list_filter(toks, t -> t = 'data')) AS tf2
  FROM docs),
st AS (
  SELECT CAST(sum(dl) AS DOUBLE) AS ctot,
         CAST(sum(tf1) AS DOUBLE) AS cf1,
         CAST(sum(tf2) AS DOUBLE) AS cf2
  FROM d)
SELECT conv_id, turn_idx,
       round(
         greatest(0, CASE WHEN tf1 > 0 THEN
           ln(1 + tf1 / (2000.0 * (cf1 / ctot))) + ln(2000.0 / (dl + 2000.0))
           ELSE 0 END)
         + greatest(0, CASE WHEN tf2 > 0 THEN
           ln(1 + tf2 / (2000.0 * (cf2 / ctot))) + ln(2000.0 / (dl + 2000.0))
           ELSE 0 END), 4) AS score
FROM d CROSS JOIN st
WHERE tf1 > 0 OR tf2 > 0
ORDER BY score DESC, conv_id, turn_idx
LIMIT 20""",
)
def q_lm_dirichlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LMDirichlet scoring as one narrow Catalyst pass: per-doc term
    freqs from the token array, collection stats from ONE
    partial-aggregating job broadcast back (the corpus never
    shuffles), top-k a TakeOrdered."""
    d = _docs(spark, sf_dir).select(
        "conv_id", "turn_idx",
        F.size("toks").alias("dl"),
        F.size(F.filter("toks", lambda t: t == F.lit("merge")))
        .alias("tf1"),
        F.size(F.filter("toks", lambda t: t == F.lit("data")))
        .alias("tf2"),
    )
    st = d.agg(
        F.sum("dl").cast("double").alias("ctot"),
        F.sum("tf1").cast("double").alias("cf1"),
        F.sum("tf2").cast("double").alias("cf2"),
    )
    mu = F.lit(2000.0)

    def term(tf, cf):
        raw = (
            F.log(F.lit(1.0) + F.col(tf) / (mu * (F.col(cf) / F.col("ctot"))))
            + F.log(mu / (F.col("dl") + mu))
        )
        return F.greatest(
            F.lit(0.0), F.when(F.col(tf) > 0, raw).otherwise(F.lit(0.0)))

    return (
        d.crossJoin(F.broadcast(st))
        .filter((F.col("tf1") > 0) | (F.col("tf2") > 0))
        .select(
            "conv_id", "turn_idx",
            F.round(term("tf1", "cf1") + term("tf2", "cf2"), 4)
            .alias("score"),
        )
        .orderBy(F.desc("score"), "conv_id", "turn_idx")
        .limit(20)
    )


# ref: lucene/core/src/java/org/apache/lucene/search/similarities/
# ClassicSimilarity.java (the pre-BM25 default TFIDFSimilarity):
# per-term sqrt(tf) * idf^2 * lengthNorm with idf = 1 + ln(N/(df+1)),
# lengthNorm = 1/sqrt(dl); coord and queryNorm are gone (Lucene 6+).
@op(
    "q_classic_tfidf",
    f"""{DOCS_CTE},
d AS (
  SELECT conv_id, turn_idx, len(toks) AS dl,
         len(list_filter(toks, t -> t = 'merge')) AS tf1,
         len(list_filter(toks, t -> t = 'data')) AS tf2
  FROM docs),
st AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
         CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
  FROM d)
SELECT conv_id, turn_idx,
       round((sqrt(CAST(tf1 AS DOUBLE)) * pow(1 + ln(n / (df1 + 1)), 2)
              + sqrt(CAST(tf2 AS DOUBLE)) * pow(1 + ln(n / (df2 + 1)), 2))
             / sqrt(CAST(dl AS DOUBLE)), 4) AS score
FROM d CROSS JOIN st
WHERE (tf1 > 0 OR tf2 > 0) AND dl > 0
ORDER BY score DESC, conv_id, turn_idx
LIMIT 20""",
)
def q_classic_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClassicSimilarity (TF-IDF) scoring, same one-pass shape as
    q_lm_dirichlet: stats broadcast, narrow scoring, TakeOrdered."""
    d = _docs(spark, sf_dir).select(
        "conv_id", "turn_idx",
        F.size("toks").alias("dl"),
        F.size(F.filter("toks", lambda t: t == F.lit("merge")))
        .alias("tf1"),
        F.size(F.filter("toks", lambda t: t == F.lit("data")))
        .alias("tf2"),
    )
    st = d.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum((F.col("tf1") > 0).cast("int")).cast("double").alias("df1"),
        F.sum((F.col("tf2") > 0).cast("int")).cast("double").alias("df2"),
    )

    def idf2(df):
        return F.pow(
            F.lit(1.0) + F.log(F.col("n") / (F.col(df) + 1)), F.lit(2.0))

    return (
        d.crossJoin(F.broadcast(st))
        .filter(((F.col("tf1") > 0) | (F.col("tf2") > 0))
                & (F.col("dl") > 0))
        .select(
            "conv_id", "turn_idx",
            F.round(
                (F.sqrt(F.col("tf1").cast("double")) * idf2("df1")
                 + F.sqrt(F.col("tf2").cast("double")) * idf2("df2"))
                / F.sqrt(F.col("dl").cast("double")),
                4,
            ).alias("score"),
        )
        .orderBy(F.desc("score"), "conv_id", "turn_idx")
        .limit(20)
    )


# ref: lucene/suggest/src/java/org/apache/lucene/search/suggest/
# analyzing/FreeTextSuggester.java — the BACKOFF dimension of the
# n-gram LM suggester (q_suggest_freetext above covers the pure
# bigram lookup): when the typed context has fewer continuations
# than requested, the suggester backs off to the unigram model with
# the class's stupid-backoff constant ALPHA = 0.4.
#
# Pinned contract: bigram score = cnt(prev, w) / Σ_w cnt(prev, w);
# backoff score = 0.4 * cnt(w) / total tokens; the ranked UNION ranks
# on the 4dp score alone (token asc tiebreak) — the probability blend
# the reference's long-weight encoding preserves.
def suggest_freetext(
    spark: SparkSession, sf_dir: str, prev: str, n: int = 10
) -> DataFrame:
    """Next-token suggestions after ``prev``: the bigram pass is one
    explode+groupBy over adjacent token pairs (narrow rows, map-side
    combine); when fewer than ``n`` continuations exist the unigram
    backoff fills the list (0.4-damped, suggested tokens excluded via
    an anti-join). Both model tables are corpus aggregates — nothing
    per-query but two bounded jobs."""
    d = _docs(spark, sf_dir)
    pairs = d.select(
        F.explode(
            F.transform(
                F.slice("toks", 1, F.size("toks") - 1),
                lambda t, i: F.struct(
                    t.alias("prev"),
                    F.element_at(F.col("toks"), i + 2).alias("token"),
                ),
            )
        ).alias("p")
    ).select("p.prev", "p.token")
    cont = (
        pairs.filter(F.col("prev") == prev)
        .groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = cont.agg(F.sum("cnt").alias("t"))
    big = (
        cont.crossJoin(F.broadcast(tot))
        .select(
            "token",
            F.round(F.col("cnt").cast("double") / F.col("t"), 4)
            .alias("score"),
            F.lit("bigram").alias("model"),
        )
    )
    if big.limit(n).count() >= n:
        return big.orderBy(F.desc("score"), "token").limit(n)
    uni = d.select(F.explode("toks").alias("token")).groupBy("token").agg(
        F.count(F.lit(1)).alias("cnt"))
    utot = uni.agg(F.sum("cnt").alias("t"))
    back = (
        uni.join(big.select("token"), "token", "left_anti")
        .crossJoin(F.broadcast(utot))
        .select(
            "token",
            F.round(
                F.lit(0.4) * F.col("cnt").cast("double") / F.col("t"), 4
            ).alias("score"),
            F.lit("backoff").alias("model"),
        )
    )
    return (
        big.unionByName(back)
        .orderBy(F.desc("score"), "token")
        .limit(n)
    )


@op(
    "q_suggest_freetext_backoff",
    f"""{DOCS_CTE},
pairs AS (
  SELECT unnest([{{'prev': toks[i], 'token': toks[i+1]}}
                 for i in range(1, len(toks))]) AS p
  FROM docs),
cont AS (
  SELECT p.token AS token, count(*) AS cnt
  FROM pairs WHERE p.prev = 'data' GROUP BY 1),
tot AS (SELECT sum(cnt) AS t FROM cont)
SELECT token, round(CAST(cnt AS DOUBLE) / t, 4) AS score,
       'bigram' AS model
FROM cont CROSS JOIN tot
ORDER BY score DESC, token LIMIT 10""",
)
def q_suggest_freetext_backoff(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Probability-normalized continuations of 'data' (a dense prev —
    the oracle exercises the bigram scores; the 0.4-damped unigram
    backoff fires for sparse prevs, pinned in pytest)."""
    return suggest_freetext(spark, sf_dir, "data", 10)
