"""Graph traversal (SURVEY §2.3 J5) — Solr's GraphQuery / gatherNodes
re-expressed as a distributed BFS of iterative frontier joins.

ref: solr/core/src/java/org/apache/solr/search/join/GraphQuery.java
     (from/to field traversal, maxDepth, returnRoot) and
     solr/solrj/src/java/org/apache/solr/client/solrj/io/graph/
     GatherNodesStream.java (streaming-expression breadth-first gather).

Semantics (pinned): breadth-first from a root node set over a directed
edge relation; a node's recorded ``depth`` is the FIRST (minimum) depth
at which it is reached; traversal stops at ``max_depth`` hops or when a
frontier comes back empty. Roots are depth 0 and are never re-emitted
(Solr's returnRoot=true shape).

Scale notes (100 TB): each hop is one shuffle join of ``edges`` against
the current frontier plus one left-anti join against the visited set —
no collect, no cartesian. Lineage is truncated every hop with
``localCheckpoint`` (iterative plans otherwise grow O(depth) and
re-plan from scratch each hop); the empty-frontier early exit bounds
work by the true graph diameter, not ``max_depth``. Skewed hub nodes
cost what any hash join costs — AQE skew-split applies; the visited
anti-join stays key-only (one long column) so its shuffle is minimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lucene_solr_spark.transcripts import TRANSCRIPTS_ORACLE_CTE, transcripts_from_documents

OPS: list = []


def op(name: str, oracle: str | None):
    def deco(fn):
        OPS.append((name, fn, oracle))
        return fn

    return deco


def bfs(
    edges: DataFrame,
    roots: DataFrame,
    max_depth: int,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
) -> DataFrame:
    """Breadth-first reachability: (id, depth) for every node reached
    from ``roots`` within ``max_depth`` directed hops along ``edges``.

    ``roots`` must be distinct on ``id_col``; ``depth`` is the minimum
    hop count (roots get 0). Runs eagerly hop by hop (localCheckpoint
    per hop) and early-exits on an empty frontier, so callers get back
    a small checkpointed result, not a deep iterative lineage.
    """
    visited = roots.select(F.col(id_col)).withColumn(
        "depth", F.lit(0).cast("long")
    ).localCheckpoint()
    frontier = visited.select(id_col)
    for depth in range(1, max_depth + 1):
        nxt = (
            edges.join(frontier.withColumnRenamed(id_col, src), src)
            .select(F.col(dst).alias(id_col))
            .distinct()
            .join(visited.select(id_col), id_col, "left_anti")
            .withColumn("depth", F.lit(depth).cast("long"))
            .localCheckpoint()
        )
        if not nxt.take(1):
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt.select(id_col)
    return visited


def shortest_paths(
    edges: DataFrame,
    source: int,
    target: int,
    max_depth: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """ALL shortest paths source→target within ``max_depth`` hops —
    Solr's shortestPath() streaming expression.

    ref: solr/solrj/src/java/org/apache/solr/client/solrj/io/graph/
         ShortestPathStream.java (level-synchronous BFS recording the
         parent edges per level, then a backward walk emitting every
         min-length path — identical two-phase shape here, each phase
         a bounded loop of joins).

    Returns one row per shortest path: (path: array<long>, hops: long).
    Empty when the target is unreachable within ``max_depth``. A
    shortest path never revisits a node, so min-depth levels are
    sufficient (no cycle bookkeeping needed beyond the visited set).
    """
    spark = edges.sparkSession
    visited = spark.createDataFrame([(source, 0)], f"{dst} long, depth int")
    frontier = visited.select(dst)
    level_edges: list[DataFrame] = []
    found_at = 0 if source == target else None
    depth = 0
    while found_at is None and depth < max_depth:
        depth += 1
        step = (
            edges.join(frontier.withColumnRenamed(dst, src), src)
            .join(visited.select(dst), dst, "left_anti")
            .localCheckpoint()
        )
        nxt = step.select(dst).distinct()
        if not nxt.take(1):
            return spark.createDataFrame([], "path array<long>, hops long")
        level_edges.append(step)
        visited = visited.unionByName(
            nxt.withColumn("depth", F.lit(depth))
        ).localCheckpoint()
        frontier = nxt
        if nxt.filter(F.col(dst) == target).take(1):
            found_at = depth
    if found_at is None:
        return spark.createDataFrame([], "path array<long>, hops long")

    # backward walk: prepend parents level by level
    paths = spark.createDataFrame([(target,)], f"{dst} long").withColumn(
        "path", F.array(F.col(dst))
    )
    for d in range(found_at, 0, -1):
        paths = (
            level_edges[d - 1]
            .join(paths, dst)
            .select(
                F.col(src).alias(dst),
                F.concat(F.array(F.col(src)), F.col("path")).alias("path"),
            )
            .localCheckpoint()
        )
    return (
        paths.filter(F.col(dst) == source)
        .select("path", F.lit(found_at).cast("long").alias("hops"))
    )


def connected_components(
    edges: DataFrame, u: str = "u", v: str = "v", max_iter: int = 25
) -> DataFrame:
    """Undirected connected components: (node, comp) where ``comp`` is
    the minimum node id reachable from ``node`` — the clustering stage
    a dedup pipeline runs over its near-dup pair set (Solr's analog is
    the SignatureUpdateProcessor's dedup grouping; pairwise similarity
    output alone can't answer "which docs form one duplicate group").

    Algorithm: hash-to-min label propagation — each round every node
    adopts min(own label, neighbors' labels). One shuffle join + one
    key-only groupBy per round, lineage truncated per round with
    ``localCheckpoint``; converges in O(component diameter) rounds and
    early-exits on a fixed point. Near-dup clusters are stars/cliques
    around a source document (diameter ≤ ~3 by construction), so the
    round count stays tiny at any corpus size; only (node, comp) long
    pairs ever shuffle. For adversarial long-path graphs the
    large-star/small-star O(log n) variant would replace the inner
    step — same join machinery, not needed for dedup workloads.
    Raises after ``max_iter`` rounds rather than returning a partial
    (wrong) clustering.
    """
    sym = (
        edges.select(F.col(u).alias("n"), F.col(v).alias("m"))
        .unionByName(edges.select(F.col(v).alias("n"), F.col(u).alias("m")))
        .distinct()
        .persist()
    )
    comp = (
        sym.select(F.col("n").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    for it in range(max_iter):
        nbr = (
            sym.join(comp.withColumnRenamed("node", "m"), "m")
            .groupBy(F.col("n").alias("node"))
            .agg(F.min("comp").alias("nc"))
        )
        nxt = (
            comp.join(nbr, "node", "left")
            .select(
                "node",
                F.least("comp", F.coalesce("nc", F.col("comp"))).alias("comp"),
            )
            .localCheckpoint()
        )
        if it == 0 and max_iter > 1:
            # round 1 always changes something when any edge exists
            # (the edge's larger endpoint adopts the smaller label) —
            # skip the convergence job
            comp = nxt
            continue
        changed = (
            nxt.withColumnRenamed("comp", "c2")
            .join(comp, "node")
            .filter(F.col("c2") != F.col("comp"))
            .take(1)
        )
        comp = nxt
        if not changed:
            sym.unpersist()
            return comp
    sym.unpersist()
    raise RuntimeError(f"connected_components: no fixed point in {max_iter} rounds")


# The transcripts corpus carries an implicit conversation tree:
# parent(conv n) = conv (n div 4) — derivable identically in DuckDB,
# which is what makes J5 fully oracle-checkable (WITH RECURSIVE).
# Roots = conversations where tool_3 was invoked; 2-hop descendants.
@op(
    "q_graph_traversal",
    f"""WITH RECURSIVE {TRANSCRIPTS_ORACLE_CTE},
convs AS (
  SELECT conv_id, CAST(substr(conv_id, 5) AS BIGINT) AS n,
         count(*) AS n_turns
  FROM transcripts GROUP BY conv_id
),
roots AS (
  SELECT DISTINCT CAST(substr(conv_id, 5) AS BIGINT) AS n
  FROM transcripts WHERE tool = 'tool_3'
),
r(n, depth) AS (
  SELECT n, 0 FROM roots
  UNION
  SELECT c.n, r.depth + 1
  FROM r JOIN convs c ON c.n // 4 = r.n AND c.n <> r.n
  WHERE r.depth < 2
),
reach AS (SELECT n, min(depth) AS depth FROM r GROUP BY n)
SELECT c.conv_id, CAST(reach.depth AS BIGINT) AS depth,
       CAST(c.n_turns AS BIGINT) AS n_turns
FROM reach JOIN convs c USING (n)
ORDER BY depth, conv_id""",
)
def q_graph_traversal(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transcripts_from_documents(spark, sf_dir)
    convs = (
        t.groupBy("conv_id")
        .agg(F.count("*").alias("n_turns"))
        .withColumn("n", F.substring("conv_id", 5, 8).cast("long"))
    )
    return _traverse(spark, t, convs)


def _traverse(spark, t, convs, tool: str = "tool_3", max_depth: int = 2):
    # Directed edge relation parent -> child, built once from the node
    # set (no self-loop at the root node 0).
    edges = (
        convs.select(F.col("n").alias("dst"))
        .withColumn("src", F.expr("dst div 4"))
        .filter(F.col("src") != F.col("dst"))
    )
    roots = (
        t.filter(F.col("tool") == tool)
        .select(F.col("conv_id"))
        .distinct()
        .select(F.substring("conv_id", 5, 8).cast("long").alias("id"))
    )
    reach = bfs(edges, roots, max_depth=max_depth)
    return (
        reach.withColumnRenamed("id", "n")
        .join(convs, "n")
        .select("conv_id", "depth", F.col("n_turns").cast("long").alias("n_turns"))
        .orderBy("depth", "conv_id")
    )


# --- {!graph} qparser front door -------------------------------------
# ref: solr/core/src/java/org/apache/solr/search/join/
#      GraphQueryParser.java (from/to local params name the edge
#      relation's key fields, maxDepth bounds the hop count,
#      returnRoot keeps/drops the depth-0 seed set; the trailing query
#      selects the roots). Like Solr, unknown fields and malformed
#      params are rejected with an error, never silently defaulted.

import re as _re

_GRAPH_QP = _re.compile(
    r"^\{!graph\s+from=(\w+)\s+to=(\w+)"
    r"(?:\s+maxDepth=(-?\d+))?(?:\s+returnRoot=(\w+))?\}"
    r"tool:(\w+)$"
)


def parse_graph_qparser(qs: str) -> tuple[int, bool, str]:
    """{!graph from=parent_n to=n maxDepth=N returnRoot=bool}tool:X →
    (max_depth, return_root, tool). The conv graph's edge relation is
    (parent_n = n // 4) → n, so from/to are pinned to those two field
    names — any other pair is a schema error (Solr: undefined field)."""
    m = _GRAPH_QP.match(qs.strip())
    if not m:
        raise ValueError(f"not a {{!graph}} query: {qs!r}")
    frm, to, depth_s, root_s, tool = m.groups()
    if (frm, to) != ("parent_n", "n"):
        raise ValueError(f"undefined graph fields: from={frm} to={to}")
    depth = int(depth_s) if depth_s is not None else 10
    if depth < 1:
        raise ValueError(f"maxDepth must be >= 1: {depth}")
    if root_s is not None and root_s not in ("true", "false"):
        raise ValueError(f"returnRoot must be true|false: {root_s!r}")
    return depth, root_s != "false", tool


@op(
    "q_graph_qparser",
    f"""WITH RECURSIVE {TRANSCRIPTS_ORACLE_CTE},
convs AS (
  SELECT conv_id, CAST(substr(conv_id, 5) AS BIGINT) AS n,
         count(*) AS n_turns
  FROM transcripts GROUP BY conv_id
),
roots AS (
  SELECT DISTINCT CAST(substr(conv_id, 5) AS BIGINT) AS n
  FROM transcripts WHERE tool = 'tool_5'
),
r(n, depth) AS (
  SELECT n, 0 FROM roots
  UNION
  SELECT c.n, r.depth + 1
  FROM r JOIN convs c ON c.n // 4 = r.n AND c.n <> r.n
  WHERE r.depth < 3
),
reach AS (SELECT n, min(depth) AS depth FROM r GROUP BY n)
SELECT c.conv_id, CAST(reach.depth AS BIGINT) AS depth,
       CAST(c.n_turns AS BIGINT) AS n_turns
FROM reach JOIN convs c USING (n)
WHERE reach.depth > 0
ORDER BY depth, conv_id""",
)
def q_graph_qparser(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphQuery behind the reference's local-params syntax:
    maxDepth=3 (one hop deeper than q_graph_traversal) and
    returnRoot=false (depth-0 seeds dropped) attest that the parsed
    params actually steer the traversal."""
    depth, return_root, tool = parse_graph_qparser(
        "{!graph from=parent_n to=n maxDepth=3 returnRoot=false}tool:tool_5"
    )
    t = transcripts_from_documents(spark, sf_dir)
    convs = (
        t.groupBy("conv_id")
        .agg(F.count("*").alias("n_turns"))
        .withColumn("n", F.substring("conv_id", 5, 8).cast("long"))
    )
    out = _traverse(spark, t, convs, tool=tool, max_depth=depth)
    if not return_root:
        out = out.filter(F.col("depth") > 0)
    return out.orderBy("depth", "conv_id")


# shortestPath() over the conv graph: tree edges (parent n//4 → n)
# plus back-shortcuts (n → n-3 for n % 7 == 0) so the graph is not a
# pure tree; all min-hop paths conv0 → conv46 within 5 hops.
@op(
    "q_shortest_path",
    f"""WITH RECURSIVE {TRANSCRIPTS_ORACLE_CTE},
convs AS (
  SELECT DISTINCT CAST(substr(conv_id, 5) AS BIGINT) AS n FROM transcripts),
edges AS (
  SELECT n // 4 AS src, n AS dst FROM convs WHERE n // 4 <> n
  UNION ALL
  SELECT n AS src, n - 3 AS dst FROM convs WHERE n % 7 = 0 AND n >= 3),
r(n, depth, path) AS (
  SELECT CAST(0 AS BIGINT) AS n, 0 AS depth, [CAST(0 AS BIGINT)] AS path
  UNION ALL
  SELECT e.dst, r.depth + 1, list_append(r.path, e.dst)
  FROM r JOIN edges e ON e.src = r.n
  WHERE r.depth < 5 AND NOT list_contains(r.path, e.dst)),
tgt AS (SELECT * FROM r WHERE n = 46),
best AS (SELECT min(depth) AS d FROM tgt)
SELECT array_to_string(path, '/') AS path_s, CAST(depth AS BIGINT) AS hops
FROM tgt, best WHERE depth = best.d
ORDER BY path_s""",
)
def q_shortest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transcripts_from_documents(spark, sf_dir)
    convs = t.select(
        F.substring("conv_id", 5, 8).cast("long").alias("n")
    ).distinct()
    tree = (
        convs.select(F.col("n").alias("dst"))
        .withColumn("src", F.expr("dst div 4"))
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
    )
    shortcuts = (
        convs.filter((F.col("n") % 7 == 0) & (F.col("n") >= 3))
        .select(F.col("n").alias("src"), (F.col("n") - 3).alias("dst"))
    )
    sp = shortest_paths(tree.unionByName(shortcuts), 0, 46, max_depth=5)
    return sp.select(
        F.array_join(F.transform("path", lambda x: x.cast("string")), "/").alias(
            "path_s"
        ),
        "hops",
    ).orderBy("path_s")


# scoreNodes() — tf-idf relevance for gathered nodes: a gatherNodes
# pass emits each node with the COUNT of hits that gathered it; the
# scorer then weights that count by the node's rarity in the whole
# collection. Pinned formula: score = cnt * ln((N + 1) / (df + 1))
# (N = corpus docs, df = docs carrying the node anywhere). Scale
# shape: the gather is one partial-combined groupBy of the seed hits;
# df is one partial-combined groupBy of the corpus; the 1-row N
# scalar broadcasts — node cardinality (37 tools here, domains/
# entities at 100 TB) bounds every post-gather frame.
@op(
    "q_graph_score_nodes",
    f"""WITH {TRANSCRIPTS_ORACLE_CTE},
tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM transcripts),
gathered AS (
  SELECT tool AS node, CAST(count(*) AS BIGINT) AS cnt
  FROM transcripts WHERE role = 'user' AND tool IS NOT NULL
  GROUP BY tool),
dfreq AS (
  SELECT tool AS node, CAST(count(*) AS BIGINT) AS df
  FROM transcripts WHERE tool IS NOT NULL GROUP BY tool)
SELECT g.node, g.cnt, d.df,
       round(g.cnt * ln((tot.n + 1) / (d.df + 1)), 4) AS score
FROM gathered g JOIN dfreq d USING (node), tot
ORDER BY round(g.cnt * ln((tot.n + 1) / (d.df + 1)), 4) DESC, g.node
LIMIT 10""",
)
def q_graph_score_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ScoreNodesStream over a one-hop gatherNodes: seed docs
    (role='user') gather their `tool` nodes with counts; each node is
    scored cnt * ln((N+1)/(df+1)) so rare-but-concentrated tools
    outrank ubiquitous ones. Rank key is the 4dp round (node asc
    tiebreak).

    ref: solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/
         ScoreNodesStream.java (nodeScore = count * idf from the
         TermsComponent numDocs/docFreq probe) over
         GatherNodesStream.java"""
    t = transcripts_from_documents(spark, sf_dir)
    tot = t.agg(F.count("*").cast("double").alias("n"))
    gathered = (
        t.filter((F.col("role") == "user") & F.col("tool").isNotNull())
        .groupBy(F.col("tool").alias("node"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    dfreq = (
        t.filter(F.col("tool").isNotNull())
        .groupBy(F.col("tool").alias("node"))
        .agg(F.count("*").cast("long").alias("df"))
    )
    return (
        gathered.join(dfreq, "node")
        .join(F.broadcast(tot))
        .select(
            "node",
            "cnt",
            "df",
            F.round(
                F.col("cnt") * F.log((F.col("n") + 1) / (F.col("df") + 1)), 4
            ).alias("score"),
        )
        .orderBy(F.desc("score"), "node")
        .limit(10)
    )
