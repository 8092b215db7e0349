"""BFS distances and shortest-path reconstruction on a hand-built graph."""

from graphdb_neo4j_spark.graph import PropertyGraph, empty_edges
from graphdb_neo4j_spark.operators.paths import bfs_distances, shortest_path


def _line_graph(spark):
    # 1-2-3-4-5 chain plus an offshoot 2-6; stored canonically src<dst
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (2, 6)],
        "src long, dst long",
    ).selectExpr("src", "dst", "'T' as type", "cast(null as array<string>) as common")
    nodes = spark.createDataFrame([(i,) for i in range(1, 7)], "id long")
    return PropertyGraph(nodes=nodes, edges=edges)


def test_bfs_distances_chain(spark):
    g = _line_graph(spark)
    got = {r.id: r.dist for r in bfs_distances(g.edges_undirected(), 1, 3).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 6: 2, 4: 3}


def test_bfs_depth_bound(spark):
    g = _line_graph(spark)
    got = {r.id: r.dist for r in bfs_distances(g.edges_undirected(), 1, 1).collect()}
    assert got == {1: 0, 2: 1}


def test_bfs_undirected_matching(spark):
    # edges stored as (1,2) etc.; BFS from 5 must walk them reversed
    g = _line_graph(spark)
    got = {r.id: r.dist for r in bfs_distances(g.edges_undirected(), 5, 2).collect()}
    assert got == {5: 0, 4: 1, 3: 2}


def test_shortest_path_chain(spark):
    g = _line_graph(spark)
    assert shortest_path(g.edges_undirected(), 1, 4, max_depth=4) == [1, 2, 3, 4]
    assert shortest_path(g.edges_undirected(), 1, 6, max_depth=4) == [1, 2, 6]
    assert shortest_path(g.edges_undirected(), 1, 5, max_depth=2) is None
    assert shortest_path(g.edges_undirected(), 3, 3, max_depth=2) == [3]


def test_empty_edges_bfs(spark):
    got = {r.id: r.dist for r in bfs_distances(
        PropertyGraph(nodes=None, edges=empty_edges(spark)).edges_undirected(), 9, 3
    ).collect()}
    assert got == {9: 0}
