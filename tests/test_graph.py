"""J5 graph traversal: distributed BFS vs a driver-side brute BFS,
early-exit behaviour, and plan hygiene.

ref: solr/core/src/java/org/apache/solr/search/join/GraphQuery.java
"""

from __future__ import annotations

from collections import deque

from pyspark.sql import functions as F

from lucene_solr_spark.operators.graph import bfs, q_graph_traversal


def _brute_bfs(edges: list[tuple[int, int]], roots: set[int], max_depth: int):
    adj: dict[int, list[int]] = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    depth = {r: 0 for r in roots}
    q = deque(roots)
    while q:
        u = q.popleft()
        if depth[u] >= max_depth:
            continue
        for v in adj.get(u, ()):
            if v not in depth:
                depth[v] = depth[u] + 1
                q.append(v)
    return depth


def _run_bfs(spark, edges, roots, max_depth):
    e = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        e = e.filter(F.lit(False))
    r = spark.createDataFrame([(x,) for x in roots], "id long")
    got = bfs(e, r, max_depth=max_depth)
    return {row["id"]: row["depth"] for row in got.collect()}


def test_bfs_matches_brute_on_random_graphs(spark):
    import random

    for seed in range(6):
        rng = random.Random(seed)
        n = 40
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(20, 90))
        ]
        edges = [(s, d) for s, d in edges if s != d]
        roots = set(rng.sample(range(n), rng.randrange(1, 4)))
        for max_depth in (0, 1, 3):
            want = _brute_bfs(edges, roots, max_depth)
            got = _run_bfs(spark, edges, roots, max_depth)
            assert got == want, (seed, max_depth)


def test_bfs_early_exit_beyond_diameter(spark):
    # Chain 0->1->2; max_depth 50 must terminate (empty-frontier exit)
    # and still record min depths.
    got = _run_bfs(spark, [(0, 1), (1, 2)], {0}, 50)
    assert got == {0: 0, 1: 1, 2: 2}


def test_bfs_min_depth_on_diamond(spark):
    # 0->1->3 and 0->3: node 3 must be depth 1, not 2.
    got = _run_bfs(spark, [(0, 1), (1, 3), (0, 3)], {0}, 5)
    assert got == {0: 0, 1: 1, 3: 1}


def test_bfs_cycle_terminates(spark):
    got = _run_bfs(spark, [(0, 1), (1, 0)], {0}, 10)
    assert got == {0: 0, 1: 1}


def test_graph_traversal_plan_no_cartesian(spark, sf_dir):
    df = q_graph_traversal(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    # depths bounded by max_depth=2 and roots present at depth 0
    rows = df.collect()
    depths = {r["depth"] for r in rows}
    assert depths <= {0, 1, 2} and 0 in depths


def _brute_shortest_paths(edges, source, target, max_depth):
    """All min-hop simple paths source→target (BFS levels + DFS back)."""
    from collections import deque

    adj: dict[int, list[int]] = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    depth = {source: 0}
    q = deque([source])
    while q:
        u = q.popleft()
        if depth[u] >= max_depth:
            continue
        for v in adj.get(u, ()):
            if v not in depth:
                depth[v] = depth[u] + 1
                q.append(v)
    if target not in depth:
        return set()
    want = depth[target]

    out: set[tuple[int, ...]] = set()

    def walk(node, path):
        if len(path) - 1 > want:
            return
        if node == target and len(path) - 1 == want:
            out.add(tuple(path))
            return
        for v in adj.get(node, ()):
            if depth.get(v) == len(path):  # stay on BFS levels
                walk(v, path + [v])

    walk(source, [source])
    return out


def _run_sp(spark, edges, source, target, max_depth):
    from lucene_solr_spark.operators.graph import shortest_paths

    e = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        e = e.filter(F.lit(False))
    got = shortest_paths(e, source, target, max_depth)
    return {tuple(r["path"]) for r in got.collect()}


def test_shortest_paths_diamond_returns_both(spark):
    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (0, 3)]
    # direct edge 0->3 is the unique 1-hop shortest path
    assert _run_sp(spark, edges, 0, 3, 5) == {(0, 3)}
    # without it, BOTH 2-hop paths come back
    edges2 = [(0, 1), (0, 2), (1, 3), (2, 3)]
    assert _run_sp(spark, edges2, 0, 3, 5) == {(0, 1, 3), (0, 2, 3)}


def test_shortest_paths_unreachable_and_self(spark):
    assert _run_sp(spark, [(0, 1)], 0, 9, 4) == set()
    assert _run_sp(spark, [(0, 1)], 0, 0, 4) == {(0,)}
    # reachable but beyond max_depth → empty
    assert _run_sp(spark, [(0, 1), (1, 2), (2, 3)], 0, 3, 2) == set()


def test_shortest_paths_matches_brute_on_random_graphs(spark):
    import random

    for seed in range(5):
        rng = random.Random(100 + seed)
        n = 25
        edges = list(
            {
                (rng.randrange(n), rng.randrange(n))
                for _ in range(rng.randrange(30, 70))
            }
        )
        edges = [(s, d) for s, d in edges if s != d]
        target = rng.randrange(1, n)
        want = _brute_shortest_paths(edges, 0, target, 4)
        got = _run_sp(spark, edges, 0, target, 4)
        assert got == want, (seed, target)


# ---------------------------------------------------------------------------
# connected components (dedup clustering stage)
# ---------------------------------------------------------------------------


def _brute_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _run_cc(spark, edges, **kw):
    from lucene_solr_spark.operators.graph import connected_components

    e = spark.createDataFrame(edges, "u long, v long")
    got = connected_components(e, **kw)
    return {row["node"]: row["comp"] for row in got.collect()}


def test_components_match_union_find_on_random_graphs(spark):
    import random

    for seed in range(6):
        rng = random.Random(200 + seed)
        n = 50
        edges = list(
            {
                tuple(sorted((rng.randrange(n), rng.randrange(n))))
                for _ in range(rng.randrange(10, 60))
            }
        )
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        assert _run_cc(spark, edges) == _brute_components(edges), seed


def test_components_path_graph_converges(spark):
    # worst-case diameter for min-propagation: a single path 0-1-...-9
    edges = [(i, i + 1) for i in range(9)]
    got = _run_cc(spark, edges)
    assert got == {i: 0 for i in range(10)}


def test_components_max_iter_raises(spark):
    import pytest

    edges = [(i, i + 1) for i in range(9)]
    with pytest.raises(RuntimeError, match="no fixed point"):
        _run_cc(spark, edges, max_iter=2)
