"""/stream handler (streaming-expression front door) contract tests.

Pins: the expression grammar (nesting, quoting, named params, 400-style
raises), each decorator's equality against the directly-constructed
DataFrame pipeline, the carried-sort semantics of unique(), daemon's
re-execution + checkpoint advance, and the plan shapes (hashJoin
broadcasts, unique stays a WindowGroupLimit row_number, parallel
repartitions on the keys).

ref: solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/expr/
     StreamExpressionParser.java + io/stream/*Stream.java
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from lucene_solr_spark.streams import (
    StreamCompiler,
    parse_stream_expr,
    stream_handler,
    unquote,
)


def _rows(df):
    return [tuple(r) for r in df.collect()]


def _physical(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


# -- grammar -----------------------------------------------------------------


def test_parser_nesting_and_params():
    e = parse_stream_expr(
        'top(n=5, unique(search(events, q="a:b", sort="a asc"), '
        'over="a"), sort="a asc, b desc")'
    )
    assert e.name == "top"
    assert set(e.params) == {"n", "sort"}
    assert len(e.args) == 1
    inner = parse_stream_expr(e.args[0])
    assert inner.name == "unique"
    assert unquote(inner.params["over"]) == "a"
    src = parse_stream_expr(inner.args[0])
    assert src.name == "search" and unquote(src.params["q"]) == "a:b"


def test_parser_quoted_commas_and_escapes():
    e = parse_stream_expr('search(events, q="a:\\"x,y\\"", sort="a asc")')
    assert unquote(e.params["q"]) == 'a:"x,y"'
    assert e.args == ["events"]


def test_parser_metric_args_stay_positional():
    e = parse_stream_expr("rollup(search(events), over=\"k\", count(*), sum(v))")
    assert [a for a in e.args if a.startswith("count")] == ["count(*)"]
    assert e.params == {"over": '"k"'}


@pytest.mark.parametrize(
    "bad",
    ["top(n=5", "top n=5)", 'search(events, q="unterminated)', "42", ""],
)
def test_parser_malformed_raises(bad):
    with pytest.raises(ValueError):
        parse_stream_expr(bad)


def test_unknown_function_raises(spark, sf_dir):
    with pytest.raises(ValueError, match="unknown stream function"):
        stream_handler(spark, sf_dir, 'frobnicate(search(events, q="*:*"))')


def test_daemon_only_top_level(spark, sf_dir):
    with pytest.raises(ValueError, match="top level"):
        stream_handler(
            spark, sf_dir,
            'top(n=1, daemon(search(events, q="*:*"), id="x"), sort="ts asc")',
        )


def test_table_query_subset_raises(spark, sf_dir):
    # scoring syntax on a docvalues-only collection = Solr 400
    with pytest.raises(ValueError, match="non-index collections"):
        stream_handler(
            spark, sf_dir,
            'search(events, q="hello world", sort="ts asc")',
        ).collect()
    with pytest.raises(ValueError, match="undefined field"):
        stream_handler(
            spark, sf_dir, 'search(events, q="nope:1", sort="ts asc")'
        ).collect()
    with pytest.raises(ValueError, match="unknown collection"):
        stream_handler(spark, sf_dir, 'search(nosuch, q="*:*")').collect()


# -- decorator equality vs direct pipelines ----------------------------------


def test_rollup_equality(spark, sf_dir):
    got = stream_handler(
        spark, sf_dir,
        'rollup(search(events, q="*:*", fl="user_id,value", '
        'sort="user_id asc"), over="user_id", count(*), sum(value))',
    )
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = (
        e.groupBy("user_id")
        .agg(F.count("*").alias("count(*)"),
             F.round(F.sum("value"), 4).alias("sum(value)"))
        .orderBy("user_id")
    )
    assert _rows(got) == _rows(want)


def test_unique_is_first_per_key_in_stream_order(spark, sf_dir):
    got = stream_handler(
        spark, sf_dir,
        'sort(unique(search(events, q="*:*", fl="user_id,ts,event_id", '
        'sort="user_id asc, ts asc, event_id asc"), over="user_id"), '
        'by="user_id asc")',
    )
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    want = (
        e.select("user_id", "ts", "event_id")
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1").drop("rn").orderBy("user_id")
    )
    assert _rows(got) == _rows(want)


def test_unique_requires_carried_sort(spark, sf_dir):
    with pytest.raises(ValueError, match="sorted incoming stream"):
        stream_handler(
            spark, sf_dir,
            'unique(search(events, q="*:*", fl="user_id"), over="user_id")',
        )


def test_set_ops_equality(spark, sf_dir):
    comp = stream_handler(
        spark, sf_dir,
        'complement(search(events, q="*:*", fl="event_id,user_id", '
        'sort="event_id asc"), search(events, q="event_type:click", '
        'fl="event_id", sort="event_id asc"), on="event_id")',
    )
    inter = stream_handler(
        spark, sf_dir,
        'intersect(search(events, q="*:*", fl="event_id,user_id", '
        'sort="event_id asc"), search(events, q="event_type:click", '
        'fl="event_id", sort="event_id asc"), on="event_id")',
    )
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = e.filter("event_type = 'click'").select("event_id")
    base = e.select("event_id", "user_id")
    assert _rows(comp) == _rows(
        base.join(clicks, "event_id", "left_anti").orderBy("event_id"))
    assert _rows(inter) == _rows(
        base.join(clicks, "event_id", "left_semi").orderBy("event_id"))
    assert comp.count() + inter.count() == e.count()


def test_merge_union_keeps_sort(spark, sf_dir):
    got = stream_handler(
        spark, sf_dir,
        'merge(search(events, q="event_type:click", fl="event_id,ts", '
        'sort="event_id asc"), search(events, q="event_type:view", '
        'fl="event_id,ts", sort="event_id asc"), on="event_id asc")',
    )
    rows = [r.event_id for r in got.collect()]
    assert rows == sorted(rows)
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert len(rows) == e.filter("event_type in ('click','view')").count()


def test_select_evaluator_and_rename(spark, sf_dir):
    got = stream_handler(
        spark, sf_dir,
        'select(search(events, q="*:*", sort="event_id asc"), '
        "event_id as id, add(value, 1.5) as vplus, mult(value, 2) as v2)",
    )
    assert got.columns == ["id", "vplus", "v2"]
    r = got.orderBy("id").first()
    e = spark.read.parquet(f"{sf_dir}/events.parquet").orderBy("event_id").first()
    assert r.id == e.event_id
    assert abs(r.vplus - (e.value + 1.5)) < 1e-9
    assert abs(r.v2 - e.value * 2) < 1e-9


def test_cartesian_product_explodes(spark, sf_dir):
    got = stream_handler(
        spark, sf_dir,
        'cartesianProduct(search(embeddings, q="label:1", '
        'fl="vec_id,embedding", sort="vec_id asc"), embedding)',
    )
    d = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter("label = 1")
    want = d.select("vec_id", F.explode("embedding").alias("embedding"))
    assert got.count() == want.count()


def test_stats_single_tuple(spark, sf_dir):
    got = stream_handler(
        spark, sf_dir,
        'stats(events, q="event_type:click", count(*), min(value), max(value))',
    )
    e = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        "event_type = 'click'")
    r = got.first()
    assert r["count(*)"] == e.count()
    assert got.count() == 1


# -- transcripts routing ------------------------------------------------------


def test_search_transcripts_is_index_bm25(spark, sf_dir):
    from lucene_solr_spark.query.model import BooleanSpec
    from lucene_solr_spark.query.oracle import ROUND
    from lucene_solr_spark.registry import cached_searcher

    s = cached_searcher(spark, sf_dir)
    got = stream_handler(
        spark, sf_dir,
        'search(transcripts, q="sort window", sort="score desc", rows=7)',
        searcher=s,
    )
    want = s.search(BooleanSpec(must=("sort", "window"), k=7), round_to=ROUND)
    assert _rows(got) == _rows(want)


def test_search_transcripts_field_sort_raises(spark, sf_dir):
    from lucene_solr_spark.registry import cached_searcher

    with pytest.raises(ValueError, match="relevance order"):
        stream_handler(
            spark, sf_dir,
            'search(transcripts, q="merge", sort="ts asc")',
            searcher=cached_searcher(spark, sf_dir),
        )


# -- daemon / topic ------------------------------------------------------------


def test_daemon_reruns_and_checkpoint_advances(spark, sf_dir, tmp_path):
    d = stream_handler(
        spark, sf_dir,
        'daemon(topic(transcripts, q="text:merge", id="t1"), '
        'id="t1", runInterval=1)',
        state_dir=str(tmp_path),
    )
    first = d.run_once()
    n1 = first.count()
    assert n1 > 0
    # static source: the second run starts past the persisted
    # checkpoint and must deliver nothing new (no re-delivery)
    assert d.run_once().count() == 0
    assert d.iterations_run == 2


def test_daemon_requires_id(spark, sf_dir):
    with pytest.raises(ValueError, match="id="):
        stream_handler(
            spark, sf_dir,
            'daemon(topic(transcripts, q="text:merge", id="t2"))',
        )


# -- plan shapes ---------------------------------------------------------------


def test_hashjoin_broadcasts_hashed_side(spark, sf_dir):
    got = stream_handler(
        spark, sf_dir,
        'hashJoin(search(orders, q="*:*", fl="o_orderkey,o_custkey", '
        'sort="o_orderkey asc"), '
        'hashed=search(customer, q="*:*", fl="c_custkey,c_mktsegment", '
        'sort="c_custkey asc"), on="o_custkey=c_custkey")',
    )
    plan = _physical(got)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_unique_stays_window_group_limit(spark, sf_dir):
    got = stream_handler(
        spark, sf_dir,
        'unique(search(events, q="*:*", fl="user_id,ts,event_id", '
        'sort="user_id asc, ts asc, event_id asc"), over="user_id")',
    )
    plan = _physical(got)
    # the rn<=1 filter must push as a group-limit under the window
    # (bounded shuffle — the engine's pinned kNN/collapse shape)
    assert "WindowGroupLimit" in plan


def test_parallel_repartitions_not_reorders(spark, sf_dir):
    base = 'search(events, q="*:*", fl="user_id,event_id", sort="event_id asc")'
    got = stream_handler(
        spark, sf_dir,
        f'parallel({base}, workers=3, partitionKeys="user_id")',
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(user_id" in plan
    direct = stream_handler(spark, sf_dir, base)
    assert sorted(_rows(got)) == sorted(_rows(direct))


def test_fetch_enriches_by_broadcast(spark, sf_dir):
    got = stream_handler(
        spark, sf_dir,
        'fetch(customer, search(orders, q="*:*", '
        'fl="o_orderkey,o_custkey", sort="o_orderkey asc"), '
        'on="o_custkey=c_custkey", fl="c_mktsegment")',
    )
    assert set(got.columns) == {"o_orderkey", "o_custkey", "c_mktsegment"}
    plan = _physical(got)
    assert "BroadcastHashJoin" in plan


# -- engine-backed sources: significantTerms / knnSearch -----------------------


def test_significant_terms_stream_equals_engine(spark, sf_dir):
    from lucene_solr_spark.query.model import BooleanSpec
    from lucene_solr_spark.registry import cached_searcher

    s = cached_searcher(spark, sf_dir)
    got = stream_handler(
        spark, sf_dir,
        'significantTerms(transcripts, q="merge", minDocFreq=3, limit=10)',
        searcher=s,
    )
    want = s.significant_terms(BooleanSpec(must=("merge",)), min_fg=3,
                               limit=10)
    assert _rows(got) == _rows(want)


def test_knn_search_stream_equals_mlt(spark, sf_dir):
    from lucene_solr_spark.registry import cached_searcher
    from lucene_solr_spark.transcripts import transcripts_from_documents

    s = cached_searcher(spark, sf_dir)
    got = stream_handler(
        spark, sf_dir,
        'knnSearch(transcripts, id="conv00000003#2", qf=text, k=6, '
        "maxTerms=5)",
        searcher=s,
    )
    src = (
        transcripts_from_documents(spark, sf_dir)
        .filter("conv_id = 'conv00000003' AND turn_idx = 2").first()
    )
    want = s.more_like_this("conv00000003", 2, src.text, max_terms=5,
                            k=6, round_to=4)
    assert _rows(got) == _rows(want)
    # the source doc never appears among its own neighbors
    assert ("conv00000003", 2) not in {
        (r.conv_id, r.turn_idx) for r in got.collect()}


def test_knn_search_stream_raises(spark, sf_dir):
    from lucene_solr_spark.registry import cached_searcher

    s = cached_searcher(spark, sf_dir)
    with pytest.raises(ValueError, match="id="):
        stream_handler(spark, sf_dir,
                       'knnSearch(transcripts, qf=text, k=5)', searcher=s)
    with pytest.raises(ValueError, match="not found"):
        stream_handler(
            spark, sf_dir,
            'knnSearch(transcripts, id="convFFFFFFFF#0", qf=text, k=5)',
            searcher=s,
        )
    with pytest.raises(ValueError, match="qf=text"):
        stream_handler(
            spark, sf_dir,
            'knnSearch(transcripts, id="conv00000003#2", qf=title, k=5)',
            searcher=s,
        )


# -- timeseries / random sources ------------------------------------------------


def test_timeseries_equals_direct_groupby(spark, sf_dir):
    got = stream_handler(
        spark, sf_dir,
        'timeseries(events, q="event_type:click", field=ts, '
        'start="2024-01-01T00:00:00Z", end="2024-01-08T00:00:00Z", '
        'gap="+1DAY", count(*))',
    )
    import os
    e = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).filter(
        (F.col("event_type") == "click")
        & (F.col("ts") >= "2024-01-01") & (F.col("ts") < "2024-01-08")
    )
    want = (
        e.groupBy(F.date_format(F.date_trunc("day", "ts"),
                                "yyyy-MM-dd HH:mm").alias("ts"))
        .agg(F.count("*").alias("count(*)"))
        .orderBy("ts")
    )
    assert _rows(got.select("ts", "`count(*)`")) == _rows(want)


def test_timeseries_raises(spark, sf_dir):
    with pytest.raises(ValueError, match="fixed-width"):
        stream_handler(spark, sf_dir,
                       'timeseries(events, field=ts, start="2024-01-01T00:00:00Z",'
                       ' end="2024-02-01T00:00:00Z", gap="+1MONTH", count(*))')
    with pytest.raises(ValueError, match="wants gap="):
        stream_handler(spark, sf_dir,
                       'timeseries(events, field=ts, start="2024-01-01T00:00:00Z",'
                       ' end="2024-01-08T00:00:00Z", count(*))')
    with pytest.raises(ValueError, match="undefined field"):
        stream_handler(spark, sf_dir,
                       'timeseries(events, field=nope, start="2024-01-01T00:00:00Z",'
                       ' end="2024-01-08T00:00:00Z", gap="+1DAY", count(*))')


def test_random_deterministic_and_bounded(spark, sf_dir):
    from lucene_solr_spark.registry import cached_searcher

    s = cached_searcher(spark, sf_dir)
    a = stream_handler(spark, sf_dir,
                       'random(transcripts, q="data", rows=10, seed="x")',
                       searcher=s)
    b = stream_handler(spark, sf_dir,
                       'random(transcripts, q="data", rows=10, seed="x")',
                       searcher=s)
    c = stream_handler(spark, sf_dir,
                       'random(transcripts, q="data", rows=10, seed="y")',
                       searcher=s)
    ra, rb, rc = _rows(a), _rows(b), _rows(c)
    assert ra == rb            # the hash IS the seed: reproducible
    assert len(ra) == 10
    keys = {(r[0], r[1]) for r in ra}
    assert keys != {(r[0], r[1]) for r in rc}  # a new seed reshuffles
    # every sampled doc is in the q domain
    from lucene_solr_spark.query.model import BooleanSpec
    dom = {(r.conv_id, r.turn_idx)
           for r in s.docset(BooleanSpec(must=("data",))).collect()}
    assert keys <= dom


# -- nodes / scoreNodes / shortestPath -------------------------------------------


def test_nodes_equals_manual_gather(spark, sf_dir):
    import os
    got = stream_handler(
        spark, sf_dir,
        'nodes(events, search(events, q="event_type:signup", '
        'fl="user_id,event_id", sort="event_id asc", rows=30), '
        'walk="user_id->user_id", gather="event_type")',
    )
    e = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    seeds = (e.filter(F.col("event_type") == "signup")
             .orderBy("event_id").limit(30)
             .select("user_id").distinct())
    want = (e.join(seeds, "user_id")
            .groupBy(F.col("event_type").alias("node"))
            .agg(F.count("*").cast("long").alias("cnt"))
            .orderBy("node"))
    assert _rows(got) == _rows(want)


def test_nodes_and_score_nodes_raise(spark, sf_dir):
    with pytest.raises(ValueError, match='walk="from->to"'):
        stream_handler(spark, sf_dir,
                       'nodes(events, search(events, q="*:*", sort="event_id asc",'
                       ' rows=5), walk="user_id", gather="event_type")')
    with pytest.raises(ValueError, match="undefined field"):
        stream_handler(spark, sf_dir,
                       'nodes(events, search(events, q="*:*", sort="event_id asc",'
                       ' rows=5), walk="user_id->nope", gather="event_type")')
    with pytest.raises(ValueError, match="nodes"):
        stream_handler(spark, sf_dir,
                       'scoreNodes(search(events, q="*:*", sort="event_id asc",'
                       ' rows=5))')


def test_score_nodes_formula(spark, sf_dir):
    import math
    import os
    got = stream_handler(
        spark, sf_dir,
        'scoreNodes(nodes(events, search(events, q="event_type:signup", '
        'fl="user_id,event_id", sort="event_id asc", rows=30), '
        'walk="user_id->user_id", gather="event_type"))',
    )
    e = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    n = e.count()
    dfreq = {r.event_type: r.c for r in
             e.groupBy("event_type").agg(F.count("*").alias("c")).collect()}
    for r in got.collect():
        want = round(r.cnt * math.log((n + 1) / (dfreq[r.node] + 1)), 4)
        assert abs(r.nodeScore - want) < 1e-9


def test_shortest_path_stream_equals_engine(spark, sf_dir):
    from lucene_solr_spark.operators.graph import shortest_paths
    from lucene_solr_spark.transcripts import transcripts_from_documents

    got = stream_handler(
        spark, sf_dir,
        'shortestPath(transcripts, from="0", to="11", '
        'edge="parent_n=n", maxDepth=4)',
    )
    convs = (transcripts_from_documents(spark, sf_dir)
             .select(F.substring("conv_id", 5, 8).cast("long").alias("n"))
             .distinct())
    edges = (convs.select(F.col("n").alias("dst"))
             .withColumn("src", F.expr("dst div 4"))
             .filter(F.col("src") != F.col("dst")).select("src", "dst"))
    want = shortest_paths(edges, 0, 11, max_depth=4).select(
        F.array_join(F.transform("path", lambda x: x.cast("string")),
                     "/").alias("path_s"), "hops").orderBy("path_s")
    assert _rows(got) == _rows(want)
    with pytest.raises(ValueError, match="undefined graph fields"):
        stream_handler(spark, sf_dir,
                       'shortestPath(transcripts, from="0", to="11", '
                       'edge="a=b", maxDepth=4)')


# -- update / commit destination collections ------------------------------------


def test_update_stream_dest_roundtrip(spark, sf_dir):
    from lucene_solr_spark.query.model import BooleanSpec
    from lucene_solr_spark.registry import cached_searcher

    s = cached_searcher(spark, sf_dir)
    comp = StreamCompiler(spark, sf_dir, searcher=s)
    out, _ = comp.compile(
        'commit(d1, update(d1, topic(transcripts, q="text:merge", id="t1")))')
    row = out.collect()[0]
    assert row.destination == "d1"
    dom = s.docset(BooleanSpec(must=("merge",)))
    assert row.totalIndexed == dom.count()
    # the destination serves search() with SUBSET-ONLY BM25 stats:
    # same query, different stats => different scores than the corpus
    got = comp.compile('search(d1, q="data", rows=5)')[0]
    corpus = s.search(BooleanSpec(must=("data",), k=5), round_to=4)
    grows, crows = _rows(got), _rows(corpus)
    assert grows and grows != crows
    # every destination hit is inside the streamed subset
    keys = {(r[0], r[1]) for r in grows}
    assert keys <= {(r.conv_id, r.turn_idx) for r in dom.collect()}


def test_update_commit_raises(spark, sf_dir):
    from lucene_solr_spark.registry import cached_searcher

    s = cached_searcher(spark, sf_dir)
    comp = StreamCompiler(spark, sf_dir, searcher=s)
    with pytest.raises(ValueError, match="does not match"):
        comp.compile(
            'commit(WRONG, update(d2, topic(transcripts, q="text:merge",'
            ' id="t2")))')
    with pytest.raises(ValueError, match="destination"):
        comp.compile('update(transcripts, topic(transcripts, '
                     'q="text:merge", id="t3"))')
    with pytest.raises(ValueError, match="one update"):
        comp.compile('commit(d3, topic(transcripts, q="text:merge", id="t4"))')


# -- let() math expressions ----------------------------------------------------


def test_let_math_contracts(spark, sf_dir):
    """Math evaluators bind only inside let(), reference only bound
    variables, and the result compiles to aggregations (no driver
    arrays): describe/corr plans contain one partial agg and never a
    CartesianProduct; bindings evaluate in order."""
    from lucene_solr_spark.streams import stream_handler

    # chained bindings, last one wins
    df = stream_handler(
        spark, sf_dir,
        'let(a=search(events, q="*:*"), x=col(a, value), '
        'd=describe(x), c=corr(col(a, value), col(a, value)))')
    row = df.collect()[0]
    assert row.corr == 1.0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    for bad, msg in [
        ('describe(col(a, value))', "only valid inside let"),
        ('let(a=search(events, q="*:*"), h=hist(col(a, value), 0))',
         "bins >= 1"),
        ('let(c=describe(col(a, value)))', "bound stream"),
        ('let(a=search(events, q="*:*"), '
         's=regress(col(a, value), value))', "col"),
    ]:
        with pytest.raises(ValueError, match=msg):
            stream_handler(spark, sf_dir, bad)


def test_let_hist_covers_all_rows(spark, sf_dir):
    """hist() bins partition the value range: counts sum to the
    stream size, every bin row is present (empty ones at cnt=0), and
    the max value lands in the LAST bin (the close-on-max pin)."""
    from lucene_solr_spark.streams import stream_handler

    rows = stream_handler(
        spark, sf_dir,
        'let(a=search(events, q="*:*"), h=hist(col(a, value), 7))'
    ).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n = ev.count()
    assert [r.bin for r in rows] == list(range(7))
    assert sum(r.cnt for r in rows) == n
    mx = ev.agg(F.max("value")).collect()[0][0]
    assert rows[-1].lo <= round(mx, 4) <= rows[-1].hi
    assert rows[-1].cnt >= 1


def test_ml_stream_expressions(spark, sf_dir):
    """features()/train()/classify() stream expressions route to the
    pinned learning engines: train() equals the battery trainer
    row-for-row, features() forwards numTerms, and the pinned-contract
    guards raise on any attempt to train/label a different model."""
    from lucene_solr_spark.operators.learning import q_train_logit
    from lucene_solr_spark.streams import stream_handler

    via = stream_handler(
        spark, sf_dir, "train(transcripts, maxIterations=3)"
    ).collect()
    direct = q_train_logit(spark, sf_dir).collect()
    assert [(r.dim, r.weight) for r in via] == [
        (r.dim, r.weight) for r in direct
    ]
    feats = stream_handler(
        spark, sf_dir,
        'features(transcripts, outcome="role:assistant", numTerms=3)',
    ).collect()
    assert len(feats) == 3
    assert feats[0].ig >= feats[1].ig >= feats[2].ig
    top = stream_handler(spark, sf_dir, "classify(transcripts, top=4)")
    probs = [r.prob for r in top.collect()]
    assert len(probs) == 4 and probs == sorted(probs, reverse=True)
    for bad, msg in [
        ('features(transcripts, outcome="tool:bash")', "pinned binary"),
        ("train(transcripts, maxIterations=7)", "pinned to maxIterations"),
        ("classify(transcripts, top=0)", "top must be"),
        ('features(events, outcome="role:assistant")', "transcripts"),
    ]:
        with pytest.raises(ValueError, match=msg):
            stream_handler(spark, sf_dir, bad)


def test_reduce_stream_group_operation(spark, sf_dir):
    """reduce()+group(): per-key top-n tuple lists in group-sort
    order; the window keeps the WindowGroupLimit pre-reduction shape;
    malformed operations raise."""
    from lucene_solr_spark.streams import stream_handler

    df = stream_handler(
        spark, sf_dir,
        'reduce(search(events, q="*:*", fl="user_id,event_id,event_type", '
        'sort="user_id asc"), by="user_id", '
        'group(sort="event_id asc", n="2"))',
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    rows = df.collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    brute = {}
    for r in sorted(ev.select("user_id", "event_id", "event_type").collect(),
                    key=lambda r: (r.user_id, r.event_id)):
        brute.setdefault(r.user_id, []).append((r.event_id, r.event_type))
    assert [r.user_id for r in rows] == sorted(brute)
    for r in rows:
        expect = brute[r.user_id][:2]
        assert [(g.event_id, g.event_type) for g in r.group] == expect
    for bad, msg in [
        ('reduce(search(events, q="*:*"), by="user_id")',
         "one stream and one"),
        ('reduce(search(events, q="*:*"), '
         'group(sort="event_id asc", n="0"))', "n must be"),
        ('reduce(search(events, q="*:*"), '
         'group(sort="event_id asc"))', "needs by="),
        ('reduce(search(events, q="*:*", fl="user_id"), by="user_id", '
         'group(sort="user_id asc"))', "non-key column"),
        ('reduce(search(events, q="*:*"), by="nope", '
         'group(sort="event_id asc"))', "not in stream"),
        ('reduce(search(events, q="*:*"), by="user_id", '
         'group(n="2"))', "needs sort="),
    ]:
        with pytest.raises(ValueError, match=msg):
            stream_handler(spark, sf_dir, bad)
