"""/stream handler: Solr streaming-expression front door.

Parses streaming-expression strings (``top(n=5, unique(search(...),
over="conv_id"), sort="conv_id asc")``) and compiles each decorator to
the engine's Catalyst shapes — the same idea as Solr's
StreamExpressionParser + StreamFactory, except the compile target is a
lazy DataFrame plan instead of a pull-based TupleStream tree, so
Catalyst fuses the whole expression into one distributed job (Solr
evaluates the tree tuple-at-a-time on one node unless wrapped in
``parallel()``).

Sort propagation: Solr stream decorators like ``unique`` and ``merge``
rely on the INCOMING stream's sort order. DataFrames carry no order
between operators, so the compiler threads the declared sort
(``search(..., sort=...)`` / ``sort(by=...)`` / ``top(sort=...)``)
alongside the frame and order-sensitive decorators consume it —
``unique(over=f)`` becomes a row_number window partitioned by ``f``
ordered by the carried sort (the WindowGroupLimit shape, never a
global sort), exactly "first tuple per key in stream order".

Collections: ``transcripts`` routes through the inverted-index
searcher (relevance search, sort="score desc"); any other name reads
``{sf_dir}/{name}.parquet`` with a MatchAll / field:value / range
query subset (non-index collections have docvalues only — scoring
syntax raises like Solr's 400 on an unindexed field).

Scale notes: every decorator maps to the obvious narrow/partial-agg
plan — rollup/facet/stats are one partial-aggregating groupBy,
hashJoin broadcasts the hashed side, fetch broadcasts the bounded
tuple batch, unique/top are WindowGroupLimit / TakeOrdered, and
daemon re-executes a bounded incremental pull per run. Nothing
collects the corpus.

ref: solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/
     expr/StreamExpressionParser.java (the grammar),
     StreamFactory.java (name → stream construction), and the
     io/stream/*Stream.java family each compiler mirrors.
"""

from __future__ import annotations

import os
import re
import tempfile
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_.]*$")

#: decorators the compiler knows; anything else raises (Solr: "Invalid
#: stream expression — unknown function").
STREAM_FUNCS = frozenset(
    "search select top unique sort rollup having innerJoin leftOuterJoin "
    "hashJoin fetch facet stats merge complement intersect "
    "cartesianProduct parallel topic daemon significantTerms knnSearch "
    "timeseries random nodes scoreNodes shortestPath update commit "
    "features train classify reduce "
    "let col describe corr regress hist".split()
)
#: math-expression functions — valid only as let() bindings (they
#: reference let variables)
_MATH_FUNCS = frozenset("col describe corr regress hist".split())
_METRIC_FUNCS = frozenset("count sum avg min max".split())


@dataclass
class StreamExpr:
    name: str
    args: list = field(default_factory=list)      # raw positional strings
    params: dict = field(default_factory=dict)    # name -> raw value string


def _split_top(s: str) -> list[str]:
    """Split on top-level commas, respecting quotes and parentheses."""
    out, depth, buf, i, q = [], 0, [], 0, False
    while i < len(s):
        c = s[i]
        if q:
            buf.append(c)
            if c == "\\" and i + 1 < len(s):
                buf.append(s[i + 1])
                i += 1
            elif c == '"':
                q = False
        elif c == '"':
            q = True
            buf.append(c)
        elif c == "(":
            depth += 1
            buf.append(c)
        elif c == ")":
            depth -= 1
            if depth < 0:
                raise ValueError(f"unbalanced ')' in stream expression: {s!r}")
            buf.append(c)
        elif c == "," and depth == 0:
            out.append("".join(buf).strip())
            buf = []
        else:
            buf.append(c)
        i += 1
    if q or depth != 0:
        raise ValueError(f"unbalanced quote/paren in stream expression: {s!r}")
    tail = "".join(buf).strip()
    if tail or out:
        out.append(tail)
    return out


def unquote(v: str) -> str:
    v = v.strip()
    if len(v) >= 2 and v[0] == '"' and v[-1] == '"':
        return v[1:-1].replace('\\"', '"')
    return v


def parse_stream_expr(s: str) -> StreamExpr:
    """``name(arg, arg, k=v, ...)`` → StreamExpr with raw arg strings.

    Nested expressions stay raw; each compiler re-parses the args it
    knows are sub-expressions (StreamFactory does the same two-level
    dance with StreamExpressionNamedParameter vs sub-expressions).
    """
    s = s.strip()
    lp = s.find("(")
    if lp < 0 or not s.endswith(")"):
        raise ValueError(f"not a stream expression: {s!r}")
    name = s[:lp].strip()
    if not _IDENT.match(name):
        raise ValueError(f"bad stream function name: {name!r}")
    expr = StreamExpr(name)
    body = s[lp + 1 : -1].strip()
    if not body:
        return expr
    for raw in _split_top(body):
        m = re.match(r"^([A-Za-z_][A-Za-z0-9_.]*)\s*=\s*(.+)$", raw, re.S)
        # 'k=v' is a named param unless the rhs starts a comparison-free
        # bare '=' inside an expression (never the case at top level)
        if m and "(" not in m.group(1):
            expr.params[m.group(1)] = m.group(2).strip()
        else:
            expr.args.append(raw)
    return expr


def _is_expr(raw: str) -> bool:
    raw = raw.strip()
    lp = raw.find("(")
    return lp > 0 and raw.endswith(")") and _IDENT.match(raw[:lp]) is not None


def _sort_keys(spec: str) -> list[tuple[str, bool]]:
    """'a asc, b desc' → [(a, True), (b, False)]."""
    keys = []
    for part in unquote(spec).split(","):
        toks = part.split()
        if not toks:
            continue
        if len(toks) == 1:
            keys.append((toks[0], True))
        elif len(toks) == 2 and toks[1].lower() in ("asc", "desc"):
            keys.append((toks[0], toks[1].lower() == "asc"))
        else:
            raise ValueError(f"bad sort clause: {part!r}")
    if not keys:
        raise ValueError(f"empty sort spec: {spec!r}")
    return keys


def _order_cols(keys: list[tuple[str, bool]]):
    return [F.col(c).asc() if asc else F.col(c).desc() for c, asc in keys]


def _lit_or_col(tok: str):
    tok = tok.strip()
    if re.match(r"^-?\d+$", tok):
        return F.lit(int(tok))
    if re.match(r"^-?\d*\.\d+$", tok):
        return F.lit(float(tok))
    if tok.startswith('"'):
        return F.lit(unquote(tok))
    return F.col(tok)


class DaemonStream:
    """daemon(...) wrapper: re-executes the inner expression per run.

    Solr's DaemonStream re-opens its inner stream every ``runInterval``
    forever; here each ``run_once()`` is one bounded re-execution (the
    scheduler is the caller's — cron, Structured Streaming trigger, or
    a test loop). Wrapping a ``topic(...)`` gives the canonical Solr
    pattern: each run delivers only documents newer than the persisted
    checkpoint. ref: io/stream/DaemonStream.java (run loop around
    stream.open/read/close).
    """

    def __init__(self, compiler: "StreamCompiler", inner: StreamExpr,
                 daemon_id: str, run_interval: int):
        self.compiler = compiler
        self.inner = inner
        self.daemon_id = daemon_id
        self.run_interval = run_interval
        self.iterations_run = 0

    def run_once(self) -> DataFrame:
        df, _ = self.compiler.compile(self.inner)
        self.iterations_run += 1
        return df


class StreamCompiler:
    def __init__(self, spark: SparkSession, sf_dir: str, searcher=None,
                 state_dir: str | None = None):
        self.spark = spark
        self.sf_dir = sf_dir
        self.searcher = searcher
        self.state_dir = state_dir or tempfile.mkdtemp(prefix="lss_stream_")
        #: destination collections created by update() this session:
        #: name -> index root (search() routes these through their
        #: own IndexSearcher, like Solr's freshly-updated collection)
        self.dest_roots: dict[str, str] = {}

    # -- source helpers ------------------------------------------------
    def _table(self, name: str) -> DataFrame:
        path = os.path.join(self.sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            raise ValueError(f"unknown collection: {name!r}")
        return self.spark.read.parquet(path)

    def _table_filter(self, df: DataFrame, qstr: str) -> DataFrame:
        """MatchAll / field:value / field:[lo TO hi] conjunctions over a
        docvalues-only collection. Anything scoring raises (unindexed)."""
        qstr = unquote(qstr).strip()
        if qstr in ("", "*:*"):
            return df
        for clause in re.split(r"\s+AND\s+", qstr):
            clause = clause.strip()
            if not clause:
                continue
            m = re.match(r"^(\w+):\[([^\s]+) TO ([^\]]+)\]$", clause)
            if m is None:
                m2 = re.match(r"^(\w+):([\w.-]+)$", clause)
                if m2 is None:
                    raise ValueError(
                        f"non-index collections accept only *:*, field:value"
                        f" and field:[lo TO hi] — got {clause!r}")
                f, v = m2.group(1), m2.group(2)
                if f not in df.columns:
                    raise ValueError(f"undefined field {f!r}")
                df = df.filter(F.col(f) == F.lit(v).cast(df.schema[f].dataType))
            else:
                f, lo, hi = m.group(1), m.group(2), m.group(3)
                if f not in df.columns:
                    raise ValueError(f"undefined field {f!r}")
                dt = df.schema[f].dataType
                if lo != "*":
                    df = df.filter(F.col(f) >= F.lit(lo).cast(dt))
                if hi != "*":
                    df = df.filter(F.col(f) <= F.lit(hi).cast(dt))
        return df

    # -- the compile dispatch -------------------------------------------
    def compile(self, expr: StreamExpr | str):
        """expr → (DataFrame, carried sort keys)."""
        if isinstance(expr, str):
            expr = parse_stream_expr(expr)
        if expr.name not in STREAM_FUNCS:
            raise ValueError(f"unknown stream function: {expr.name!r}")
        if expr.name == "daemon":
            raise ValueError("daemon() is only valid at the top level")
        if expr.name in _MATH_FUNCS:
            raise ValueError(
                f"{expr.name}() is only valid inside let() bindings")
        return getattr(self, f"_c_{expr.name}")(expr)

    def _sub(self, raw: str):
        return self.compile(parse_stream_expr(raw))

    def _inner(self, expr: StreamExpr, want: int = 1):
        subs = [a for a in expr.args if _is_expr(a)]
        if len(subs) != want:
            raise ValueError(
                f"{expr.name}() wants {want} stream argument(s), got {len(subs)}")
        return [self._sub(a) for a in subs]

    # -- sources ---------------------------------------------------------
    def _c_search(self, expr: StreamExpr):
        if not expr.args:
            raise ValueError("search() needs a collection")
        coll = unquote(expr.args[0])
        q = expr.params.get("q", "*:*")
        fl = expr.params.get("fl")
        sort = expr.params.get("sort")
        rows = expr.params.get("rows")
        if coll == "transcripts" or coll in self.dest_roots:
            if coll in self.dest_roots:
                from lucene_solr_spark.query.executor import IndexSearcher
                searcher = IndexSearcher(self.spark, self.dest_roots[coll])
            elif self.searcher is None:
                raise ValueError("no searcher bound for the transcripts collection")
            else:
                searcher = self.searcher
            if sort is not None and unquote(sort) != "score desc":
                raise ValueError(f"search({coll}) serves relevance order"
                                 " (sort=\"score desc\")")
            from lucene_solr_spark.query.oracle import ROUND
            from lucene_solr_spark.query.parser import parse
            k = int(unquote(rows)) if rows is not None else 10
            spec = parse(unquote(q), k=k, default_op="AND")
            df = searcher.search(spec, round_to=ROUND)
            keys = [("score", False), ("conv_id", True), ("turn_idx", True)]
        else:
            df = self._table_filter(self._table(coll), q)
            keys = _sort_keys(sort) if sort is not None else []
            if keys:
                df = df.orderBy(*_order_cols(keys))
            if rows is not None:
                if not keys:
                    raise ValueError("rows= needs a sort (deterministic page)")
                df = df.limit(int(unquote(rows)))
        if fl is not None:
            df = df.select(*[c.strip() for c in unquote(fl).split(",")])
        return df, keys

    def _c_topic(self, expr: StreamExpr):
        from lucene_solr_spark.streaming.topic import TopicStream
        if not expr.args or unquote(expr.args[0]) != "transcripts":
            raise ValueError("topic() serves the transcripts collection")
        q = unquote(expr.params.get("q", ""))
        m = re.match(r"^text:([a-z0-9]+)$", q)
        if m is None:
            raise ValueError("topic() wants q=\"text:<term>\"")
        tid = unquote(expr.params.get("id", "topic"))
        ckpt = os.path.join(self.state_dir, f"{tid}.json")
        t = TopicStream(self.spark, self.sf_dir, ckpt, m.group(1))
        return t.pull(), [("ts_s", True), ("conv_id", True), ("turn_idx", True)]

    def _c_significantTerms(self, expr: StreamExpr):  # noqa: N802
        """significantTerms(transcripts, q=, minDocFreq=, limit=) —
        the SignificantTermsStream source: terms over-represented in
        the q= hit set vs the corpus, served by the index engine's
        seg-driver fan-out (per-segment DocSet ∩ postings counting).
        ref: io/stream/SignificantTermsStream.java"""
        if not expr.args or unquote(expr.args[0]) != "transcripts":
            raise ValueError(
                "significantTerms() serves the transcripts collection")
        if self.searcher is None:
            raise ValueError(
                "no searcher bound for the transcripts collection")
        from lucene_solr_spark.query.parser import parse

        spec = parse(unquote(expr.params.get("q", "")), default_op="AND")
        limit = int(unquote(expr.params.get("limit", "20")))
        min_df = int(unquote(expr.params.get("minDocFreq", "5")))
        df = self.searcher.significant_terms(spec, min_fg=min_df, limit=limit)
        return df, [("score", False), ("term", True)]

    def _c_knnSearch(self, expr: StreamExpr):  # noqa: N802
        """knnSearch(transcripts, id="conv#turn", qf=text, k=,
        maxTerms=) — the MLT-based nearest-document stream: the source
        doc's stored text probes driver-side (one pushed-filter row,
        the realtime-get Solr's CloudMLTQParser performs), then the
        engine's MoreLikeThis serves the neighbors.
        ref: io/stream/KnnStream.java (CloudMLTQParser)"""
        if not expr.args or unquote(expr.args[0]) != "transcripts":
            raise ValueError("knnSearch() serves the transcripts collection")
        if self.searcher is None:
            raise ValueError(
                "no searcher bound for the transcripts collection")
        if unquote(expr.params.get("qf", "text")) != "text":
            raise ValueError("knnSearch() supports qf=text")
        doc_id = unquote(expr.params.get("id", ""))
        m = re.match(r"^(\w+)#(\d+)$", doc_id)
        if m is None:
            raise ValueError("knnSearch() wants id=\"<conv_id>#<turn_idx>\"")
        conv, turn = m.group(1), int(m.group(2))
        from lucene_solr_spark.transcripts import transcripts_from_documents

        src = (
            transcripts_from_documents(self.spark, self.sf_dir)
            .filter((F.col("conv_id") == conv) & (F.col("turn_idx") == turn))
            .select("text").first()
        )
        if src is None:
            raise ValueError(f"knnSearch() source doc not found: {doc_id!r}")
        k = int(unquote(expr.params.get("k", "10")))
        max_terms = int(unquote(expr.params.get("maxTerms", "5")))
        df = self.searcher.more_like_this(
            conv, turn, src.text, max_terms=max_terms, k=k, round_to=4,
        )
        return df, [("score", False), ("conv_id", True), ("turn_idx", True)]

    def _c_reduce(self, expr: StreamExpr):
        """reduce(<stream>, by="f1,f2", group(sort="...", n=N)) —
        ReducerStream + GroupOperation: one output tuple per distinct
        `by` key carrying `group` = the group's top-N inner tuples
        under the group sort (every non-key column, in sort order).

        Physical: row_number over a by-partitioned window with the
        bare rn<=N filter DIRECTLY above it (WindowGroupLimit Partial
        pre-reduces map tasks to N rows per group before the key
        exchange), then ONE partial-aggregating collect of the ≤N
        surviving structs per group — the stream never collects a
        whole group, unlike the reference's in-memory GroupOperation
        buffer. Output ordered by the `by` keys.

        ref: solr/solrj/src/java/org/apache/solr/client/solrj/io/
        stream/ReducerStream.java, ops/GroupOperation.java"""
        subs = [a for a in expr.args if _is_expr(a)]
        group_ops = [a for a in subs
                     if parse_stream_expr(a).name == "group"]
        stream_args = [a for a in subs if a not in group_ops]
        if len(group_ops) != 1 or len(stream_args) != 1:
            raise ValueError("reduce() takes one stream and one "
                             "group(sort=, n=) operation")
        inner_df, _ = self._sub(stream_args[0])
        gop = parse_stream_expr(group_ops[0])
        unknown = set(gop.params) - {"sort", "n"}
        if unknown:
            raise ValueError(f"unknown group() params: {sorted(unknown)}")
        if "sort" not in gop.params:
            raise ValueError("group() needs sort=")
        n = int(unquote(gop.params.get("n", "10")))
        if n < 1:
            raise ValueError(f"group() n must be >= 1: {n}")
        by_raw = unquote(expr.params.get("by", ""))
        by = [b.strip() for b in by_raw.split(",") if b.strip()]
        if not by:
            raise ValueError("reduce() needs by=")
        missing = [b for b in by if b not in inner_df.columns]
        if missing:
            raise ValueError(f"reduce() by fields not in stream: {missing}")
        keys = _sort_keys(unquote(gop.params["sort"]))
        for fld, _asc in keys:
            if fld not in inner_df.columns:
                raise ValueError(f"group() sort field not in stream: {fld!r}")
        inner_cols = [c for c in inner_df.columns if c not in by]
        if not inner_cols:
            raise ValueError("reduce() needs at least one non-key column")
        w = Window.partitionBy(*by).orderBy(*_order_cols(keys))
        top = (
            inner_df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= n)
        )
        # rn leads the struct so array_sort restores the group order;
        # the transform strips it from the published tuples
        struct_cols = ", ".join(f"`{c}`" for c in inner_cols)
        rebuilt = ", ".join(f"s.`{c}` AS `{c}`" for c in inner_cols)
        grouped = top.groupBy(*by).agg(
            F.expr(
                f"transform(array_sort(collect_list(struct(rn, "
                f"{struct_cols}))), s -> struct({rebuilt}))"
            ).alias("group")
        ).orderBy(*by)
        return grouped, [(b, True) for b in by]

    def _c_features(self, expr: StreamExpr):
        """features(transcripts, outcome="role:assistant", numTerms=)
        — FeaturesSelectionStream: rank corpus terms by information
        gain about the outcome label; emits (term, ig, df, df_pos) in
        4dp-gain rank order. The label is the engine's PINNED
        role:assistant contract, so any other outcome field raises
        like the reference rejecting a non-indexed outcome field.
        ref: io/stream/FeaturesSelectionStream.java,
        solr/core/.../search/IGainTermsQParserPlugin.java"""
        if not expr.args or unquote(expr.args[0]) != "transcripts":
            raise ValueError("features() serves the transcripts collection")
        outcome = unquote(expr.params.get("outcome", "role:assistant"))
        if outcome != "role:assistant":
            raise ValueError(
                "features() outcome is the engine's pinned binary "
                f"label role:assistant, got {outcome!r}")
        n = int(unquote(expr.params.get("numTerms", "10")))
        if n < 1:
            raise ValueError(f"features() numTerms must be >= 1: {n}")
        from lucene_solr_spark.operators.learning import igain_frame

        df = igain_frame(self.spark, self.sf_dir, num_terms=n)
        return df, [("ig", False), ("term", True)]

    def _c_train(self, expr: StreamExpr):
        """train(transcripts, maxIterations=3) — TextLogitStream: the
        full-batch GD trainer over the pinned text features; emits the
        published (dim, weight) rows (4dp, dim 0 = intercept). The
        hyperparameter trio is PINNED (w0=0, LR=0.5, ITERS=3), so a
        different maxIterations raises rather than silently training a
        different model than the published contract.
        ref: io/stream/TextLogitStream.java"""
        if not expr.args or unquote(expr.args[0]) != "transcripts":
            raise ValueError("train() serves the transcripts collection")
        from lucene_solr_spark.operators.learning import ITERS, train_frame

        iters = int(unquote(expr.params.get("maxIterations", str(ITERS))))
        if iters != ITERS:
            raise ValueError(
                f"train() is pinned to maxIterations={ITERS} (the "
                "published-weights contract)")
        return train_frame(self.spark, self.sf_dir), [("dim", True)]

    def _c_classify(self, expr: StreamExpr):
        """classify(transcripts, top=10) — ClassifyStream: score every
        document with the trained model's 4dp-PUBLISHED weights and
        emit the top-k by probability (prob desc, doc-key tiebreak).
        The model application is one broadcast row over a narrow JVM
        pass; top-k plans as TakeOrdered.
        ref: io/stream/ClassifyStream.java"""
        if not expr.args or unquote(expr.args[0]) != "transcripts":
            raise ValueError("classify() serves the transcripts collection")
        top = int(unquote(expr.params.get("top", "10")))
        if top < 1:
            raise ValueError(f"classify() top must be >= 1: {top}")
        from lucene_solr_spark.operators.learning import classify_frame

        df = classify_frame(self.spark, self.sf_dir, top=top)
        return df, [
            ("prob", False), ("conv_id", True), ("turn_idx", True),
        ]

    def _c_timeseries(self, expr: StreamExpr):
        """timeseries(coll, q=, field=, start=, end=, gap=, metrics...)
        — TimeseriesStream: fixed-width time buckets from start by gap
        over [start, end), one partial-aggregating groupBy on the
        epoch-floored bucket key (empty buckets elided — the engine's
        pinned non-empty range contract). The gap string rides the
        same DateMathParser as range facets; month/year gaps are not
        fixed-width and raise. ref: io/stream/TimeseriesStream.java"""
        import datetime as _dt

        from lucene_solr_spark.query import datemath

        if not expr.args or _is_expr(expr.args[0]):
            raise ValueError("timeseries() wants a collection first")
        coll = unquote(expr.args[0])
        df = self._table_filter(self._table(coll),
                                expr.params.get("q", "*:*"))
        for p in ("field", "start", "end", "gap"):
            if p not in expr.params:
                raise ValueError(f"timeseries() wants {p}=")
        fld = unquote(expr.params["field"])
        if fld not in df.columns:
            raise ValueError(f"undefined field {fld!r}")
        gap = unquote(expr.params["gap"])
        if re.search(r"MONTH|YEAR", gap):
            raise ValueError("timeseries() gaps must be fixed-width "
                             "(+NSECONDS/+NMINUTES/+NHOURS/+NDAYS)")
        start = _dt.datetime.fromisoformat(
            unquote(expr.params["start"]).replace("Z", ""))
        end = _dt.datetime.fromisoformat(
            unquote(expr.params["end"]).replace("Z", ""))
        gap_s = int((datemath.parse("NOW" + gap, start) - start)
                    .total_seconds())
        if gap_s <= 0:
            raise ValueError(f"gap must move forward: {gap!r}")
        df = df.filter((F.col(fld) >= F.lit(start)) & (F.col(fld) < F.lit(end)))
        aggs = self._metrics(expr, df)
        s_lit = start.strftime("%Y-%m-%d %H:%M:%S")
        k = F.floor(
            (F.unix_timestamp(fld) - F.unix_timestamp(F.lit(s_lit))) / gap_s
        ).cast("int")
        out = (
            df.groupBy(k.alias("__k")).agg(*aggs)
            .withColumn(fld, F.date_format(
                F.expr(f"timestampadd(SECOND, __k * {gap_s}, "
                       f"timestamp'{s_lit}')"),
                "yyyy-MM-dd HH:mm"))
            .drop("__k")
            .orderBy(fld)
        )
        return out, [(fld, True)]

    def _c_random(self, expr: StreamExpr):
        """random(coll, q=, rows=, seed=) — RandomStream: a
        deterministic pseudo-random sample of the q= domain. The
        "random" order is a salted md5 over the doc key (transcripts:
        conv#turn; docvalues tables: the whole tuple) — the hash IS
        the seed, reproducible at any parallelism, and the final sort
        is a TakeOrdered heap of rows, never a full sort.
        ref: io/stream/RandomStream.java"""
        if not expr.args or _is_expr(expr.args[0]):
            raise ValueError("random() wants a collection first")
        coll = unquote(expr.args[0])
        rows = int(unquote(expr.params.get("rows", "10")))
        if rows < 1:
            raise ValueError(f"rows must be >= 1: {rows}")
        seed = unquote(expr.params.get("seed", "0"))
        q = expr.params.get("q", "*:*")
        if coll == "transcripts":
            if self.searcher is None:
                raise ValueError(
                    "no searcher bound for the transcripts collection")
            from lucene_solr_spark.query.parser import parse
            df = self.searcher.docset(parse(unquote(q), default_op="AND"))
            key = F.concat_ws("#", F.col("conv_id"),
                              F.col("turn_idx"), F.lit(seed))
        else:
            df = self._table_filter(self._table(coll), q)
            key = F.concat_ws("#", F.to_json(F.struct(*df.columns)),
                              F.lit(seed))
        df = df.withColumn("rkey", F.md5(key)).orderBy("rkey").limit(rows)
        return df, [("rkey", True)]

    def _c_nodes(self, expr: StreamExpr):
        """nodes(coll, inner, walk="from->to", gather="f") — one
        GatherNodesStream hop: the incoming tuples' from-field values
        seed an equi-join against the collection's to-field, and the
        gathered field's values come back as (node, count(*)). The
        seed set is deduplicated before the join (unique traversal)
        and the output is bounded by the gather field's cardinality.
        ref: solr/solrj/.../io/graph/GatherNodesStream.java"""
        if not expr.args or _is_expr(expr.args[0]):
            raise ValueError("nodes() wants a collection first")
        coll = unquote(expr.args[0])
        (inner, _) = self._inner(expr)[0]
        m = re.match(r"^(\w+)->(\w+)$",
                     unquote(expr.params.get("walk", "")))
        if m is None:
            raise ValueError('nodes() wants walk="from->to"')
        src_f, dst_f = m.group(1), m.group(2)
        gather = unquote(expr.params.get("gather", ""))
        if not gather:
            raise ValueError("nodes() wants gather=")
        tbl = self._table(coll)
        for f, where in ((dst_f, tbl), (gather, tbl), (src_f, inner)):
            if f not in where.columns:
                raise ValueError(f"undefined field {f!r}")
        seeds = inner.select(F.col(src_f).alias("__seed")).distinct()
        out = (
            tbl.join(seeds, tbl[dst_f] == seeds["__seed"])
            .filter(F.col(gather).isNotNull())
            .groupBy(F.col(gather).alias("node"))
            .agg(F.count("*").cast("long").alias("count(*)"))
            .orderBy("node")
        )
        return out, [("node", True)]

    def _c_scoreNodes(self, expr: StreamExpr):  # noqa: N802
        """scoreNodes(nodes(...)) — ScoreNodesStream: each gathered
        node's count weighted by its rarity in the whole collection,
        score = cnt * ln((N + 1) / (df + 1)) on the pinned 4dp rank
        key (the TermsComponent numDocs/docFreq probe Solr issues).
        The collection and term field flow from the inner nodes()
        expression like Solr's node metadata. N broadcasts as a 1-row
        frame; df is one partial-combined groupBy bounded by node
        cardinality. ref: io/stream/ScoreNodesStream.java"""
        subs = [a for a in expr.args if _is_expr(a)]
        if len(subs) != 1:
            raise ValueError("scoreNodes() wants one stream argument")
        inner_expr = parse_stream_expr(subs[0])
        if inner_expr.name != "nodes":
            raise ValueError("scoreNodes() wants a nodes() stream "
                             "(node metadata carries collection+field)")
        (df, _) = self._sub(subs[0])
        coll = unquote(inner_expr.args[0])
        fld = unquote(inner_expr.params.get("gather", ""))
        tbl = self._table(coll)
        tot = tbl.agg(F.count("*").cast("double").alias("__n"))
        dfreq = (
            tbl.filter(F.col(fld).isNotNull())
            .groupBy(F.col(fld).alias("node"))
            .agg(F.count("*").cast("long").alias("df"))
        )
        out = (
            df.join(dfreq, "node")
            .join(F.broadcast(tot))
            .select(
                "node", F.col("count(*)").alias("cnt"), "df",
                F.round(F.col("count(*)")
                        * F.log((F.col("__n") + 1) / (F.col("df") + 1)),
                        4).alias("nodeScore"),
            )
            .orderBy(F.desc("nodeScore"), "node")
        )
        return out, [("nodeScore", False), ("node", True)]

    def _c_shortestPath(self, expr: StreamExpr):  # noqa: N802
        """shortestPath(transcripts, from=, to=, edge="parent_n=n",
        maxDepth=) — ShortestPathStream over the transcripts corpus's
        pinned conversation graph (parent_n = n // 4 → n, the same
        edge relation {!graph} serves); from/to address conversation
        numbers. Level-synchronous BFS + backward walk, each phase a
        bounded loop of checkpointed joins (operators/graph.py).
        ref: solr/solrj/.../io/graph/ShortestPathStream.java"""
        if not expr.args or unquote(expr.args[0]) != "transcripts":
            raise ValueError(
                "shortestPath() serves the transcripts collection")
        edge = unquote(expr.params.get("edge", ""))
        if edge != "parent_n=n":
            raise ValueError(
                f"undefined graph fields: edge={edge!r} "
                "(the conversation graph is parent_n=n)")
        for p in ("from", "to"):
            if p not in expr.params:
                raise ValueError(f"shortestPath() wants {p}=")
        src = int(unquote(expr.params["from"]))
        dst = int(unquote(expr.params["to"]))
        depth = int(unquote(expr.params.get("maxDepth", "10")))
        if depth < 1:
            raise ValueError(f"maxDepth must be >= 1: {depth}")
        from lucene_solr_spark.operators.graph import shortest_paths
        from lucene_solr_spark.transcripts import transcripts_from_documents

        convs = (
            transcripts_from_documents(self.spark, self.sf_dir)
            .select(F.substring("conv_id", 5, 8).cast("long").alias("n"))
            .distinct()
        )
        edges = (
            convs.select(F.col("n").alias("dst"))
            .withColumn("src", F.expr("dst div 4"))
            .filter(F.col("src") != F.col("dst"))
            .select("src", "dst")
        )
        sp = shortest_paths(edges, src, dst, max_depth=depth)
        out = sp.select(
            F.array_join(
                F.transform("path", lambda x: x.cast("string")), "/"
            ).alias("path_s"),
            "hops",
        ).orderBy("path_s")
        return out, [("path_s", True)]

    def _c_update(self, expr: StreamExpr):
        """update(dest, inner) — UpdateStream: the inner expression's
        tuple stream indexed into a DESTINATION collection. Tuples
        carry the unique key (conv_id, turn_idx); stored fields
        hydrate by one key join (what Solr's tuples carry inline) and
        the stream feeds the distributed index writer directly — no
        driver materialization, the commit is the writer's atomic
        snapshot. The destination becomes searchable via search(dest)
        in the same request; its BM25 stats come only from the
        streamed subset. batchSize= is accepted and ignored (the
        writer is partition-parallel, there is no per-batch RPC).
        ref: io/stream/UpdateStream.java"""
        if not expr.args or _is_expr(expr.args[0]):
            raise ValueError("update() wants a destination collection first")
        dest = unquote(expr.args[0])
        if not re.match(r"^\w+$", dest) or dest == "transcripts":
            raise ValueError(f"bad destination collection: {dest!r}")
        int(unquote(expr.params.get("batchSize", "250")))
        (df, _) = self._inner(expr)[0]
        if not {"conv_id", "turn_idx"} <= set(df.columns):
            raise ValueError(
                "update() tuples must carry conv_id and turn_idx")
        from lucene_solr_spark.index.build import build_index
        from lucene_solr_spark.transcripts import transcripts_from_documents

        stream = transcripts_from_documents(self.spark, self.sf_dir).join(
            df.select("conv_id", "turn_idx").distinct(),
            ["conv_id", "turn_idx"],
        )
        root = os.path.join(self.state_dir, f"dest_{dest}")
        manifest = build_index(
            self.spark, stream, root, num_parts=4,
            lineage_source=f"{self.sf_dir}#stream_update_{dest}",
        )
        self.dest_roots[dest] = root
        out = self.spark.createDataFrame(
            [(dest, int(manifest.n_docs))],
            "destination string, totalIndexed long",
        )
        return out, []

    def _c_commit(self, expr: StreamExpr):
        """commit(dest, update(...)) — CommitStream: wraps an update
        stream and acknowledges the destination's commit. The engine's
        writer already commits atomically (nothing is real until
        snapshot-N.json), so commit() verifies the wrapped update
        targeted the named collection and passes the summary through —
        a request that names the wrong collection raises like Solr's
        400. ref: io/stream/CommitStream.java"""
        if not expr.args or _is_expr(expr.args[0]):
            raise ValueError("commit() wants a collection first")
        dest = unquote(expr.args[0])
        subs = [a for a in expr.args if _is_expr(a)]
        if len(subs) != 1 or parse_stream_expr(subs[0]).name != "update":
            raise ValueError("commit() wants one update() stream")
        (df, keys) = self._sub(subs[0])
        if dest not in self.dest_roots:
            raise ValueError(
                f"commit() collection {dest!r} does not match the "
                f"update destination(s): {sorted(self.dest_roots)}")
        return df, keys

    # -- tuple decorators --------------------------------------------------
    def _c_select(self, expr: StreamExpr):
        (df, keys) = self._inner(expr)[0]
        cols = []
        for raw in expr.args:
            if _is_expr(raw):
                continue
            raw = unquote(raw)
            m = re.match(r"^(.*?)\s+as\s+(\w+)$", raw, re.I | re.S)
            src, alias = (m.group(1).strip(), m.group(2)) if m else (raw, None)
            if _is_expr(src):
                e = parse_stream_expr(src)
                if e.name not in ("add", "sub", "mult", "div"):
                    raise ValueError(f"unknown select evaluator: {e.name!r}")
                ops = [_lit_or_col(a) for a in e.args]
                if len(ops) < 2:
                    raise ValueError(f"{e.name}() wants >=2 operands")
                c = ops[0]
                for o in ops[1:]:
                    c = {"add": c.__add__, "sub": c.__sub__,
                         "mult": c.__mul__, "div": c.__truediv__}[e.name](o)
                if alias is None:
                    raise ValueError("evaluator projections need 'as alias'")
                cols.append(c.alias(alias))
            else:
                cols.append(F.col(src).alias(alias) if alias else F.col(src))
        if not cols:
            raise ValueError("select() needs at least one projection")
        df = df.select(*cols)
        keys = [k for k in keys if k[0] in df.columns]
        return df, keys

    def _c_top(self, expr: StreamExpr):
        (df, _) = self._inner(expr)[0]
        if "n" not in expr.params or "sort" not in expr.params:
            raise ValueError("top() wants n= and sort=")
        keys = _sort_keys(expr.params["sort"])
        n = int(unquote(expr.params["n"]))
        return df.orderBy(*_order_cols(keys)).limit(n), keys

    def _c_sort(self, expr: StreamExpr):
        (df, _) = self._inner(expr)[0]
        if "by" not in expr.params:
            raise ValueError("sort() wants by=")
        keys = _sort_keys(expr.params["by"])
        return df.orderBy(*_order_cols(keys)), keys

    def _c_unique(self, expr: StreamExpr):
        (df, keys) = self._inner(expr)[0]
        if "over" not in expr.params:
            raise ValueError("unique() wants over=")
        if not keys:
            raise ValueError("unique() needs a sorted incoming stream")
        over = [c.strip() for c in unquote(expr.params["over"]).split(",")]
        w = Window.partitionBy(*over).orderBy(*_order_cols(keys))
        df = (df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= 1).drop("__rn"))
        return df, keys

    def _c_rollup(self, expr: StreamExpr):
        sub = [a for a in expr.args if _is_expr(a) and
               parse_stream_expr(a).name in STREAM_FUNCS]
        if len(sub) != 1:
            raise ValueError("rollup() wants exactly one stream argument")
        (df, _) = self._sub(sub[0])
        if "over" not in expr.params:
            raise ValueError("rollup() wants over=")
        over = [c.strip() for c in unquote(expr.params["over"]).split(",")]
        aggs = self._metrics(expr, df)
        out = df.groupBy(*over).agg(*aggs).orderBy(*over)
        return out, [(c, True) for c in over]

    def _metrics(self, expr: StreamExpr, df: DataFrame):
        """count(*)/sum(c)/avg(c)/min(c)/max(c) positional args →
        aggregate columns named Solr-style ('sum(value)'). sum/avg
        round to 4dp (the engine's pinned cross-engine float rule)."""
        aggs = []
        for raw in expr.args:
            if not _is_expr(raw):
                continue
            e = parse_stream_expr(raw)
            if e.name in STREAM_FUNCS:
                continue
            if e.name not in _METRIC_FUNCS:
                raise ValueError(f"unknown metric: {e.name!r}")
            arg = e.args[0].strip() if e.args else "*"
            name = f"{e.name}({arg})"
            if e.name == "count":
                aggs.append(F.count("*").alias(name) if arg == "*"
                            else F.count(arg).alias(name))
            elif e.name == "sum":
                aggs.append(F.round(F.sum(arg), 4).alias(name))
            elif e.name == "avg":
                aggs.append(F.round(F.avg(arg), 4).alias(name))
            elif e.name == "min":
                aggs.append(F.min(arg).alias(name))
            else:
                aggs.append(F.max(arg).alias(name))
        if not aggs:
            raise ValueError(f"{expr.name}() wants at least one metric")
        return aggs

    def _c_having(self, expr: StreamExpr):
        sub = [a for a in expr.args if _is_expr(a) and
               parse_stream_expr(a).name in STREAM_FUNCS]
        conds = [a for a in expr.args if _is_expr(a) and
                 parse_stream_expr(a).name not in STREAM_FUNCS]
        if len(sub) != 1 or len(conds) != 1:
            raise ValueError("having() wants one stream and one boolean evaluator")
        (df, keys) = self._sub(sub[0])
        return df.filter(self._bool_eval(parse_stream_expr(conds[0]))), keys

    def _bool_eval(self, e: StreamExpr):
        """and/or/not/gt/lt/eq/gteq/lteq evaluator tree → Column.
        ref: io/eval/*Evaluator.java."""
        if e.name in ("and", "or"):
            subs = [self._bool_eval(parse_stream_expr(a)) for a in e.args]
            if len(subs) < 2:
                raise ValueError(f"{e.name}() wants >=2 operands")
            c = subs[0]
            for s in subs[1:]:
                c = (c & s) if e.name == "and" else (c | s)
            return c
        if e.name == "not":
            (a,) = e.args
            return ~self._bool_eval(parse_stream_expr(a))
        if e.name in ("gt", "lt", "eq", "gteq", "lteq"):
            if len(e.args) != 2:
                raise ValueError(f"{e.name}() wants 2 operands")
            l, r = (self._operand(a) for a in e.args)
            return {"gt": l.__gt__, "lt": l.__lt__, "eq": l.__eq__,
                    "gteq": l.__ge__, "lteq": l.__le__}[e.name](r)
        raise ValueError(f"unknown boolean evaluator: {e.name!r}")

    def _operand(self, raw: str):
        raw = raw.strip()
        if _is_expr(raw):
            e = parse_stream_expr(raw)
            if e.name not in _METRIC_FUNCS:
                raise ValueError(f"bad operand: {raw!r}")
            arg = e.args[0].strip() if e.args else "*"
            return F.col(f"`{e.name}({arg})`")
        return _lit_or_col(raw)

    # -- joins / set ops ---------------------------------------------------
    def _on_pairs(self, expr: StreamExpr) -> list[tuple[str, str]]:
        if "on" not in expr.params:
            raise ValueError(f"{expr.name}() wants on=")
        pairs = []
        for part in unquote(expr.params["on"]).split(","):
            part = part.strip()
            if "=" in part:
                l, r = (x.strip() for x in part.split("=", 1))
            else:
                l = r = part
            pairs.append((l, r))
        return pairs

    def _join(self, expr: StreamExpr, how: str, broadcast_right: bool = False):
        if broadcast_right:
            if "hashed" not in expr.params:
                raise ValueError("hashJoin() wants hashed=<stream>")
            (left, lk) = self._inner(expr)[0]
            (right, _) = self._sub(expr.params["hashed"])
        else:
            (left, lk), (right, _) = self._inner(expr, want=2)
        pairs = self._on_pairs(expr)
        cond = None
        for l, r in pairs:
            c = left[l] == right[r]
            cond = c if cond is None else (cond & c)
        r_side = F.broadcast(right) if broadcast_right else right
        out = left.join(r_side, cond, how)
        # equal-named key columns collapse to one (Solr emits one field)
        for l, r in pairs:
            if l == r:
                out = out.drop(right[r])
        keys = [(l, True) for l, _ in pairs]
        return out.orderBy(*_order_cols(keys)), keys

    def _c_innerJoin(self, expr: StreamExpr):  # noqa: N802
        return self._join(expr, "inner")

    def _c_leftOuterJoin(self, expr: StreamExpr):  # noqa: N802
        return self._join(expr, "left")

    def _c_hashJoin(self, expr: StreamExpr):  # noqa: N802
        return self._join(expr, "inner", broadcast_right=True)

    def _c_fetch(self, expr: StreamExpr):
        if not expr.args or _is_expr(expr.args[0]):
            raise ValueError("fetch() wants a collection first")
        coll = unquote(expr.args[0])
        (df, keys) = self._inner(expr)[0]
        if "on" not in expr.params or "fl" not in expr.params:
            raise ValueError("fetch() wants on= and fl=")
        l, r = (self._on_pairs(expr)[0])
        fl = [c.strip() for c in unquote(expr.params["fl"]).split(",")]
        side = self._table(coll).select(r, *[c for c in fl if c != r])
        out = df.join(F.broadcast(side), df[l] == side[r], "left")
        # only the requested fl fields survive (FetchStream contract)
        out = out.drop(side[r])
        return out, keys

    def _c_facet(self, expr: StreamExpr):
        if not expr.args or _is_expr(expr.args[0]):
            raise ValueError("facet() wants a collection first")
        df = self._table_filter(self._table(unquote(expr.args[0])),
                                expr.params.get("q", "*:*"))
        if "buckets" not in expr.params:
            raise ValueError("facet() wants buckets=")
        buckets = [c.strip() for c in unquote(expr.params["buckets"]).split(",")]
        aggs = self._metrics(expr, df)
        out = df.groupBy(*buckets).agg(*aggs)
        sorts = expr.params.get("bucketSorts", '"count(*) desc"')
        keys = _sort_keys(sorts) + [(b, True) for b in buckets]
        out = out.orderBy(*[F.col(f"`{c}`").asc() if asc else
                            F.col(f"`{c}`").desc() for c, asc in keys])
        limit = int(unquote(expr.params.get("bucketSizeLimit", "10")))
        return out.limit(limit), keys

    def _c_stats(self, expr: StreamExpr):
        if not expr.args or _is_expr(expr.args[0]):
            raise ValueError("stats() wants a collection first")
        df = self._table_filter(self._table(unquote(expr.args[0])),
                                expr.params.get("q", "*:*"))
        return df.agg(*self._metrics(expr, df)), []

    def _c_merge(self, expr: StreamExpr):
        (a, _), (b, _) = self._inner(expr, want=2)
        keys = _sort_keys(expr.params.get("on", ""))
        return a.unionByName(b).orderBy(*_order_cols(keys)), keys

    def _set_op(self, expr: StreamExpr, how: str):
        (a, _), (b, _) = self._inner(expr, want=2)
        on = [c.strip() for c in unquote(expr.params.get("on", "")).split(",")]
        if on == [""]:
            raise ValueError(f"{expr.name}() wants on=")
        keys = [(c, True) for c in on]
        out = a.join(b.select(*on).dropDuplicates(on), on=on, how=how)
        return out.orderBy(*_order_cols(keys)), keys

    def _c_complement(self, expr: StreamExpr):
        return self._set_op(expr, "left_anti")

    def _c_intersect(self, expr: StreamExpr):
        return self._set_op(expr, "left_semi")

    def _c_cartesianProduct(self, expr: StreamExpr):  # noqa: N802
        sub = [a for a in expr.args if _is_expr(a)]
        flat = [a for a in expr.args if not _is_expr(a)]
        if len(sub) != 1 or len(flat) != 1:
            raise ValueError("cartesianProduct() wants a stream and a field")
        (df, keys) = self._sub(sub[0])
        col = unquote(flat[0])
        return df.withColumn(col, F.explode(col)), keys

    def _c_let(self, expr: StreamExpr):
        """Solr 7 streaming MATH EXPRESSIONS: ``let(a=<stream>,
        b=col(a, f), c=describe(b), ...)``. Bindings evaluate in
        order, later ones may reference earlier ones; the let()
        result is the LAST binding.

        Architectural stance vs the reference: Solr's Let/ColumnEvaluator
        materialize arrays in coordinator memory and run the math
        single-threaded; here col() is a symbolic (stream, column)
        reference and every math function COMPILES TO ONE SPARK
        AGGREGATION over the bound stream — the array never leaves
        the cluster, so describe()/corr()/regress()/hist() still work
        when the bound stream is corpus-sized.
        ref: solr/solrj/src/java/org/apache/solr/client/solrj/io/
        stream/LetStream.java, eval/ColumnEvaluator.java,
        DescribeEvaluator.java, CorrelationEvaluator.java,
        RegressionEvaluator.java, HistogramEvaluator.java."""
        if expr.args:
            raise ValueError("let() wants only name=expression bindings")
        if not expr.params:
            raise ValueError("let() wants at least one binding")
        self._lets: dict = {}
        last = None
        for name, raw in expr.params.items():
            if not _is_expr(raw):
                raise ValueError(
                    f"let binding {name!r} must be an expression")
            tree = parse_stream_expr(raw)
            if tree.name in _MATH_FUNCS:
                val = self._math(tree)
            else:
                val = ("stream", *self.compile(tree))
            self._lets[name] = val
            last = val
        if last[0] == "colref":
            raise ValueError("let() cannot end on a bare col() binding "
                             "— finish with a stream or math result")
        return last[1], last[2]

    def _colref(self, raw: str, fn: str):
        raw = raw.strip()
        if _is_expr(raw):
            sub = parse_stream_expr(raw)
            if sub.name != "col":
                raise ValueError(f"{fn}() wants col() references")
            return self._math(sub)
        v = getattr(self, "_lets", {}).get(raw)
        if v is None or v[0] != "colref":
            raise ValueError(
                f"{fn}() wants a col() binding, got {raw!r}")
        return v

    def _math(self, tree: StreamExpr):
        from pyspark.sql import types as T

        fn = tree.name
        if fn == "col":
            if len(tree.args) != 2 or tree.params:
                raise ValueError("col() wants (variable, field)")
            var, fld = tree.args[0].strip(), unquote(tree.args[1].strip())
            src = getattr(self, "_lets", {}).get(var)
            if src is None or src[0] != "stream":
                raise ValueError(
                    f"col() wants a bound stream variable, got {var!r}")
            df = src[1]
            if fld not in df.columns:
                raise ValueError(f"col(): unknown field {fld!r}")
            if not isinstance(df.schema[fld].dataType, (
                    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                    T.FloatType, T.DoubleType, T.DecimalType)):
                raise ValueError(f"col() wants a numeric field: {fld!r}")
            return ("colref", df, fld)
        if fn == "describe":
            if len(tree.args) != 1 or tree.params:
                raise ValueError("describe() wants one col()")
            _, df, f = self._colref(tree.args[0], fn)
            c = F.col(f)
            out = df.agg(
                F.count(c).cast("long").alias("n"),
                F.round(F.min(c), 4).alias("min"),
                F.round(F.max(c), 4).alias("max"),
                F.round(F.sum(c), 4).alias("sum"),
                F.round(F.avg(c), 4).alias("mean"),
                F.round(F.stddev_samp(c), 4).alias("stddev"),
                F.round(F.var_samp(c), 4).alias("var"),
            )
            return ("stream", out, [])
        if fn == "corr":
            if len(tree.args) != 2 or tree.params:
                raise ValueError("corr() wants two col()s")
            _, d1, f1 = self._colref(tree.args[0], fn)
            _, d2, f2 = self._colref(tree.args[1], fn)
            if d1 is not d2:
                raise ValueError("corr() wants two columns of ONE "
                                 "bound stream (row-aligned arrays)")
            out = d1.agg(F.round(F.corr(f1, f2), 4).alias("corr"))
            return ("stream", out, [])
        if fn == "regress":
            if len(tree.args) != 2 or tree.params:
                raise ValueError("regress() wants col(x), col(y)")
            _, d1, fx = self._colref(tree.args[0], fn)
            _, d2, fy = self._colref(tree.args[1], fn)
            if d1 is not d2:
                raise ValueError("regress() wants two columns of ONE "
                                 "bound stream (row-aligned arrays)")
            # ordinary least squares from algebraic moments — one
            # partial-aggregating pass (slope = cov/var, intercept =
            # ȳ − slope·x̄, R = Pearson), 4dp like every published float
            m = d1.agg(
                F.covar_samp(fx, fy).alias("cv"),
                F.var_samp(fx).alias("vx"),
                F.avg(fx).alias("ax"),
                F.avg(fy).alias("ay"),
                F.corr(fx, fy).alias("r"),
            )
            out = m.select(
                F.round(F.col("cv") / F.col("vx"), 4).alias("slope"),
                F.round(
                    F.col("ay") - F.col("cv") / F.col("vx") * F.col("ax"),
                    4).alias("intercept"),
                F.round(F.col("r"), 4).alias("r"),
            )
            return ("stream", out, [])
        if fn == "hist":
            if len(tree.args) != 2 or tree.params:
                raise ValueError("hist() wants (col(), bins)")
            _, df, f = self._colref(tree.args[0], fn)
            bins = int(unquote(tree.args[1].strip()))
            if bins < 1:
                raise ValueError("hist() wants bins >= 1")
            # two-phase like the perplexity terciles: one scalar
            # min/max agg broadcast back, then one narrow groupBy —
            # the column never sorts globally
            row = df.agg(F.min(f).alias("lo"), F.max(f).alias("hi")
                         ).collect()[0]
            if row.lo is None:
                raise ValueError("hist() over an empty stream")
            lo, hi = float(row.lo), float(row.hi)
            width = (hi - lo) / bins if hi > lo else 1.0
            c = F.col(f).cast("double")
            bucket = F.least(
                F.floor((c - F.lit(lo)) / F.lit(width)),
                F.lit(bins - 1),
            ).cast("long")
            cnts = df.groupBy(bucket.alias("bin")).agg(
                F.count(F.lit(1)).cast("long").alias("cnt"))
            grid = self.spark.range(bins).select(
                F.col("id").cast("long").alias("bin"))
            out = (
                grid.join(cnts, "bin", "left")
                .select(
                    "bin",
                    F.round(F.lit(lo) + F.col("bin") * F.lit(width), 4)
                    .alias("lo"),
                    F.round(F.lit(lo) + (F.col("bin") + 1) * F.lit(width),
                            4).alias("hi"),
                    F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt"),
                )
                .orderBy("bin")
            )
            return ("stream", out, [("bin", True)])
        raise AssertionError(fn)

    def _c_parallel(self, expr: StreamExpr):
        """parallel(workers=N, partitionKeys=f, inner): Solr ships the
        inner expression to N workers hash-partitioned on the keys; on
        Spark the plan is already distributed, so this compiles to an
        explicit repartition on the keys — the co-location contract the
        decorator exists for — and the inner result is unchanged."""
        (df, keys) = self._inner(expr)[0]
        if "partitionKeys" not in expr.params:
            raise ValueError("parallel() wants partitionKeys=")
        pk = [c.strip() for c in unquote(expr.params["partitionKeys"]).split(",")]
        workers = int(unquote(expr.params.get("workers", "0")))
        df = df.repartition(workers, *pk) if workers > 0 else df.repartition(*pk)
        return df, keys


def stream_handler(spark: SparkSession, sf_dir: str, expr: str,
                   searcher=None, state_dir: str | None = None):
    """The /stream front door: expression string → DataFrame, or a
    DaemonStream handle when the top-level decorator is daemon()."""
    tree = parse_stream_expr(expr)
    comp = StreamCompiler(spark, sf_dir, searcher=searcher, state_dir=state_dir)
    if tree.name == "daemon":
        subs = [a for a in tree.args if _is_expr(a)]
        if len(subs) != 1:
            raise ValueError("daemon() wants exactly one inner stream")
        if "id" not in tree.params:
            raise ValueError("daemon() wants id=")
        return DaemonStream(comp, parse_stream_expr(subs[0]),
                            unquote(tree.params["id"]),
                            int(unquote(tree.params.get("runInterval", "1"))))
    df, _ = comp.compile(tree)
    return df
