"""Whole-graph analytics: degree stats vs hand-count, PageRank vs
closed-form solutions on known graphs + global invariants."""

import pytest

from pyspark.sql import functions as F

from graphdb_neo4j_spark.operators import graphalgo


def _nodes(spark, n):
    return spark.createDataFrame([(i,) for i in range(n)], "id long")


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_pagerank_cycle_is_uniform(spark):
    """On a cycle every node is symmetric → rank = 1 for all, any
    iteration count."""
    n = 5
    ranks = graphalgo.pagerank(
        _nodes(spark, n),
        _edges(spark, [(i, (i + 1) % n) for i in range(n)]),
        iterations=7,
    ).collect()
    for r in ranks:
        assert r["rank"] == pytest.approx(1.0, abs=1e-9)


def test_pagerank_star_closed_form(spark):
    """Undirected star K_{1,k}: the fixpoint is
    center = (1-d) + d·k·(leaf/1)·(1/1)... solved:
      leaf   = (1-d) + d·(center/k)
      center = (1-d) + d·k·leaf  [leaves have degree 1]
    → center = ((1-d)(1+dk)) / (1-d²), leaf from back-substitution."""
    d = graphalgo.DAMPING
    k = 4
    center_expected = (1 - d) * (1 + d * k) / (1 - d * d)
    leaf_expected = (1 - d) + d * center_expected / k
    ranks = {
        r["id"]: r["rank"]
        for r in graphalgo.pagerank(
            _nodes(spark, k + 1),
            _edges(spark, [(0, i) for i in range(1, k + 1)]),
            iterations=60,
        ).collect()
    }
    # convergence is geometric at rate d per round: after 60 rounds the
    # residual is O(d^60) ≈ 6e-5 of the initial gap
    assert ranks[0] == pytest.approx(center_expected, abs=5e-4)
    for i in range(1, k + 1):
        assert ranks[i] == pytest.approx(leaf_expected, abs=5e-4)


def test_pagerank_mass_conservation(spark):
    """Σrank = N when the graph has no isolated nodes (undirected ⇒ no
    dangling mass)."""
    n = 6
    edges = [(i, j) for i in range(n) for j in range(i + 1, n) if (i + j) % 2]
    total = (
        graphalgo.pagerank(_nodes(spark, n), _edges(spark, edges), iterations=20)
        .agg(F.sum("rank"))
        .collect()[0][0]
    )
    assert total == pytest.approx(n, rel=1e-9)


def test_pagerank_isolated_node_gets_teleport_floor(spark):
    ranks = {
        r["id"]: r["rank"]
        for r in graphalgo.pagerank(
            _nodes(spark, 3), _edges(spark, [(0, 1)]), iterations=10
        ).collect()
    }
    assert ranks[2] == pytest.approx(1 - graphalgo.DAMPING, abs=1e-9)


def test_factored_pagerank_equals_edge_walk(spark, sf_dir):
    """The inclusion–exclusion clique factoring must reproduce the
    edge-materializing PageRank EXACTLY (same fixpoint, same damping,
    same iteration count) — any discrepancy means the algebra is wrong."""
    gen = {
        r["id"]: r["rank"] for r in graphalgo.q_pagerank(spark, sf_dir).collect()
    }
    fac = {
        r["id"]: r["rank"]
        for r in graphalgo.q_pagerank_factored(spark, sf_dir).collect()
    }
    assert set(gen) == set(fac)
    for i in gen:
        assert fac[i] == pytest.approx(gen[i], abs=2e-6), i


def test_factored_ppr_equals_edge_walk(spark, sf_dir):
    """The seeded inclusion–exclusion factoring must reproduce the
    edge-materializing personalized PageRank EXACTLY on the same
    SAME_COLLEGE ∪ SAME_BOARD graph."""
    from graphdb_neo4j_spark.operators.edges import derive_attribute_edges
    from graphdb_neo4j_spark.sources.tpch import customer_nodes

    nodes = customer_nodes(spark, sf_dir)
    edges = derive_attribute_edges(nodes, "college", "SAME_COLLEGE").unionByName(
        derive_attribute_edges(nodes, "board", "SAME_BOARD")
    ).select("src", "dst")
    walk = {
        r["id"]: r["rank"]
        for r in graphalgo.pagerank_personalized(
            nodes, edges, [graphalgo.PPR_SEED_ID], iterations=5
        ).collect()
    }
    fac = {
        r["id"]: r["rank"]
        for r in graphalgo.pagerank_ppr_clique_factored(
            nodes, [graphalgo.PPR_SEED_ID], iterations=5
        ).collect()
    }
    assert set(walk) == set(fac)
    for i in walk:
        assert fac[i] == pytest.approx(walk[i], abs=1e-12), i


def test_factored_lpa_equals_edge_walk(spark, sf_dir):
    """The per-pair top-2 factored LPA must reproduce the
    edge-materializing synchronous LPA EXACTLY — labels are discrete, so
    agreement is equality, not approximation (any divergence means the
    self-correction algebra or the tie-break is wrong)."""
    from graphdb_neo4j_spark.operators.edges import derive_attribute_edges
    from graphdb_neo4j_spark.sources.tpch import customer_nodes

    nodes = customer_nodes(spark, sf_dir)
    edges = derive_attribute_edges(nodes, "college", "SAME_COLLEGE").unionByName(
        derive_attribute_edges(nodes, "board", "SAME_BOARD")
    ).select("src", "dst")
    walk = {
        r["id"]: r["label"]
        for r in graphalgo.label_propagation(nodes, edges, iterations=4).collect()
    }
    fac = {
        r["id"]: r["label"]
        for r in graphalgo.label_propagation_clique_factored(
            nodes, iterations=4
        ).collect()
    }
    assert walk == fac


def test_degree_stats_against_materialized_edges(spark, sf_dir):
    """The no-pair-materialization degrees must equal degrees counted on
    the actually-materialized edge table."""
    from graphdb_neo4j_spark.operators.edges import derive_all_edges

    edges = derive_all_edges(spark, sf_dir).select("src", "dst", "type")
    both = edges.select(F.col("src").alias("id"), "type").unionByName(
        edges.select(F.col("dst").alias("id"), "type")
    )
    truth = {
        (r["id"], r["type"]): r["n"]
        for r in both.groupBy("id", "type").agg(F.count("*").alias("n")).collect()
    }
    got = graphalgo.q_degree_stats(spark, sf_dir).collect()
    assert got
    for row in got:
        for etype in ("SAME_COLLEGE", "SAME_BOARD", "SAME_STREAM", "NEARBY",
                      "SHARES_INTEREST"):
            assert row[etype.lower() + "_deg"] == truth.get(
                (row["id"], etype), 0
            ), f"id={row['id']} type={etype}"


def test_node_similarity_matches_bruteforce(spark, sf_dir):
    """Top-k Jaccard neighbors vs a driver-side brute force over the
    interest sets (small fixture)."""
    from graphdb_neo4j_spark.sources.tpch import customer_interest_pairs

    got = {
        (r["id"], r["nbr"]): (round(r["jaccard"], 6), r["rank"])
        for r in graphalgo.q_node_similarity(spark, sf_dir).collect()
    }
    sets: dict[int, set] = {}
    for r in customer_interest_pairs(spark, sf_dir).collect():
        sets.setdefault(r["id"], set()).add(r["interest"])
    want = {}
    for a, sa in sets.items():
        sims = []
        for b, sb in sets.items():
            if a == b:
                continue
            inter = len(sa & sb)
            if not inter:
                continue
            j = inter / (len(sa) + len(sb) - inter)
            if j >= graphalgo.NODE_SIM_CUTOFF:
                sims.append((-j, b))
        sims.sort()
        for rank, (negj, b) in enumerate(sims[: graphalgo.NODE_SIM_TOPK], 1):
            want[(a, b)] = (round(-negj, 6), rank)
    assert got == want
    assert len(want) > 0  # fixture must exercise the cutoff/top-k path


def test_node_similarity_scores_are_symmetric(spark, sf_dir):
    """Jaccard is symmetric: whenever both directions of a pair survive
    their nodes' top-k, the scores agree."""
    rows = graphalgo.q_node_similarity(spark, sf_dir).collect()
    score = {(r["id"], r["nbr"]): r["jaccard"] for r in rows}
    for (a, b), j in score.items():
        if (b, a) in score:
            assert score[(b, a)] == j


def test_graph_components_matches_union_find(spark, sf_dir):
    """Factored bipartite WCC vs a driver-side union-find over the same
    incidence (node ~ attribute value / interest token)."""
    from graphdb_neo4j_spark.graph import ATTRIBUTE_EDGE_TYPES
    from graphdb_neo4j_spark.sources.tpch import (
        customer_interest_pairs,
        customer_nodes,
    )

    got = {
        r["id"]: (r["component"], r["component_size"])
        for r in graphalgo.q_graph_components(spark, sf_dir).collect()
    }

    nodes = customer_nodes(spark, sf_dir).collect()
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    ids = [n["id"] for n in nodes]
    for n in nodes:
        for attr in ATTRIBUTE_EDGE_TYPES.values():
            v = n[attr]
            if v:
                union(n["id"], f"{attr}:{v}")
    for r in customer_interest_pairs(spark, sf_dir).collect():
        union(r["id"], f"i:{r['interest']}")

    comp_min: dict = {}
    for i in ids:
        root = find(i)
        comp_min[root] = min(comp_min.get(root, i), i)
    members: dict = {}
    for i in ids:
        members.setdefault(comp_min[find(i)], []).append(i)
    want = {
        i: (comp_min[find(i)], len(members[comp_min[find(i)]])) for i in ids
    }
    assert got == want
    assert len(got) == len(ids)


# --- personalized PageRank -----------------------------------------------------


def test_ppr_mass_conservation_and_localization(spark):
    """On a path 0-1-2-3-4 seeded at 0: Σrank = 1 every round (no
    isolated nodes ⇒ the damped walk conserves probability mass) and the
    mass concentrates near the seed. NOTE: strict per-hop decay is NOT an
    invariant — the path is bipartite (even/odd oscillation at finite
    iteration counts) and node 1's degree-2 in-flow beats the seed's
    degree-1 at the fixpoint — so the assertion is on neighborhood mass,
    not per-node order."""
    n = 5
    ranks = {
        r["id"]: r["rank"]
        for r in graphalgo.pagerank_personalized(
            _nodes(spark, n),
            _edges(spark, [(i, i + 1) for i in range(n - 1)]),
            seed_ids=[0],
            iterations=6,
        ).collect()
    }
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)
    near = ranks[0] + ranks[1] + ranks[2]
    far = ranks[3] + ranks[4]
    assert near > 5 * far
    assert min(ranks[0], ranks[1]) > max(ranks[3], ranks[4])


def test_ppr_matches_dense_reference(spark):
    """Exact agreement with a dense numpy-free Python reference on a
    small irregular graph (triangle + tail), any seed."""
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
    n, d, iters, seeds = 5, graphalgo.DAMPING, 7, [2, 4]
    adj = {i: [] for i in range(n)}
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    e = [1.0 / len(seeds) if i in seeds else 0.0 for i in range(n)]
    r = e[:]
    for _ in range(iters):
        contrib = [0.0] * n
        for u in range(n):
            for v in adj[u]:
                contrib[v] += r[u] / len(adj[u])
        r = [(1 - d) * e[i] + d * contrib[i] for i in range(n)]
    got = {
        row["id"]: row["rank"]
        for row in graphalgo.pagerank_personalized(
            _nodes(spark, n), _edges(spark, edges), seed_ids=seeds, iterations=iters
        ).collect()
    }
    for i in range(n):
        assert got[i] == pytest.approx(r[i], abs=1e-12)


def test_ppr_isolated_nonseed_is_zero(spark):
    """A node with no edges and no seed mass can never acquire rank; an
    isolated SEED retains exactly the teleport share each round."""
    ranks = {
        r["id"]: r["rank"]
        for r in graphalgo.pagerank_personalized(
            _nodes(spark, 4),
            _edges(spark, [(0, 1)]),
            seed_ids=[2],
            iterations=5,
        ).collect()
    }
    assert ranks[3] == 0.0
    assert ranks[0] == 0.0 and ranks[1] == 0.0
    assert ranks[2] == pytest.approx(1.0 - graphalgo.DAMPING, abs=1e-12)


# --- label propagation -----------------------------------------------------------


def _lpa_reference(n, edges, iterations):
    """Pure-Python synchronous LPA with the same (count desc, label asc)
    tie-break — the spec the Spark loop must match."""
    adj = {i: [] for i in range(n)}
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    labels = list(range(n))
    for _ in range(iterations):
        nxt = labels[:]
        for i in range(n):
            if not adj[i]:
                continue
            counts: dict = {}
            for j in adj[i]:
                counts[labels[j]] = counts.get(labels[j], 0) + 1
            nxt[i] = min(counts, key=lambda l: (-counts[l], l))
        labels = nxt
    return labels


def test_lpa_two_cliques_with_bridge(spark):
    """Two triangles {0,1,2} and {3,4,5} joined by one bridge edge 2-3:
    after convergence each triangle is one community and the bridge does
    not merge them. (Label VALUES are dynamics-dependent — the bridge
    leaks label 2 rightward before the left triangle settles on 0 — so
    the assertion is on the partition, not on which label won.)"""
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    labels = {
        r["id"]: r["label"]
        for r in graphalgo.label_propagation(
            _nodes(spark, 6), _edges(spark, edges), iterations=6
        ).collect()
    }
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4] == labels[5]
    assert labels[0] != labels[3]


def test_lpa_tiebreak_is_min_label(spark):
    """A node whose neighbor labels split evenly adopts the SMALLEST —
    star center with leaves 1..4 (all distinct labels, count 1 each)."""
    edges = [(0, i) for i in range(1, 5)]
    labels = {
        r["id"]: r["label"]
        for r in graphalgo.label_propagation(
            _nodes(spark, 5), _edges(spark, edges), iterations=1
        ).collect()
    }
    assert labels[0] == 1  # min over {1,2,3,4}
    for i in range(1, 5):
        assert labels[i] == 0  # every leaf's only neighbor is the center


def test_lpa_matches_python_reference(spark):
    """Exact agreement with the pure-Python synchronous spec on an
    irregular graph (two uneven communities + an isolated node), at a
    truncating iteration count (3 — mid-oscillation states must match
    too, not just fixpoints)."""
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3), (6, 3)]
    n, iters = 8, 3  # node 7 is isolated
    want = _lpa_reference(n, edges, iters)
    got = {
        r["id"]: r["label"]
        for r in graphalgo.label_propagation(
            _nodes(spark, n), _edges(spark, edges), iterations=iters
        ).collect()
    }
    assert got == {i: want[i] for i in range(n)}
    assert got[7] == 7  # isolated keeps its own label


def test_factored_forms_handle_null_and_empty_attrs(spark):
    """NULL/'' attributes form no clique edges (derive_attribute_edges and
    every oracle filter them out). The factored forms must agree with the
    edge walk on a node set containing NULL colleges, '' boards, and one
    node that is NULL/'' in BOTH (fully isolated) — previously the group
    equi-joins dropped NULL-attr nodes and treated '' as a real clique."""
    from graphdb_neo4j_spark.operators.edges import derive_attribute_edges

    rows = [
        (1, "mit", "cbse"),
        (2, "mit", None),
        (3, None, "cbse"),
        (4, "", "icse"),
        (5, "mit", "icse"),
        (6, None, ""),  # isolated: no edges at all
        (7, "", ""),  # isolated: '' is not a clique
    ]
    nodes = spark.createDataFrame(rows, "id long, college string, board string")
    edges = derive_attribute_edges(nodes, "college", "SAME_COLLEGE").unionByName(
        derive_attribute_edges(nodes, "board", "SAME_BOARD")
    ).select("src", "dst")

    walk_pr = {
        r["id"]: r["rank"]
        for r in graphalgo.pagerank(nodes, edges, iterations=5).collect()
    }
    fac_pr = {
        r["id"]: r["rank"]
        for r in graphalgo.pagerank_clique_factored(nodes, iterations=5).collect()
    }
    assert set(walk_pr) == set(fac_pr)
    for i in walk_pr:
        assert fac_pr[i] == pytest.approx(walk_pr[i], abs=1e-12), i

    walk_ppr = {
        r["id"]: r["rank"]
        for r in graphalgo.pagerank_personalized(
            nodes, edges, [1], iterations=5
        ).collect()
    }
    fac_ppr = {
        r["id"]: r["rank"]
        for r in graphalgo.pagerank_ppr_clique_factored(
            nodes, [1], iterations=5
        ).collect()
    }
    assert set(walk_ppr) == set(fac_ppr)
    for i in walk_ppr:
        assert fac_ppr[i] == pytest.approx(walk_ppr[i], abs=1e-12), i

    walk_lpa = {
        r["id"]: r["label"]
        for r in graphalgo.label_propagation(nodes, edges, iterations=4).collect()
    }
    fac_lpa = {
        r["id"]: r["label"]
        for r in graphalgo.label_propagation_clique_factored(
            nodes, iterations=4
        ).collect()
    }
    assert walk_lpa == fac_lpa
    assert fac_lpa[6] == 6 and fac_lpa[7] == 7  # isolated keep their own label


# --- min_label_components degenerate incidences (r9 fused-round-1 pins) -------


def _components(spark, ids, inc_rows, max_iterations=20):
    node_ids = spark.createDataFrame([(i,) for i in ids], "id long")
    inc = spark.createDataFrame(
        inc_rows or [], "id long, gk string"
    )
    return {
        r["id"]: (r["component"], r["component_size"])
        for r in graphalgo.min_label_components(
            node_ids, inc, max_iterations
        ).collect()
    }


def test_components_all_singleton_groups(spark):
    """Every group has ONE member, so round 1 is already a fixpoint — the
    exact path the r9 fused first round short-circuits (no changed-count
    in round 1; round 2 must detect the no-op and stop). Every node stays
    its own component."""
    ids = [10, 20, 30]
    inc = [(10, "c:a"), (20, "c:b"), (30, "c:c")]
    assert _components(spark, ids, inc) == {
        10: (10, 1),
        20: (20, 1),
        30: (30, 1),
    }


def test_components_empty_incidence(spark):
    """No incidence rows at all (every attribute NULL): the left join in
    the fused round backfills every node with its own label."""
    assert _components(spark, [1, 2, 3], []) == {
        1: (1, 1),
        2: (2, 1),
        3: (3, 1),
    }


def test_components_two_groups_and_isolate(spark):
    """Two disjoint components linked through different group keys plus an
    isolated node; a chain (1-2 via g1, 2-3 via g2) needs label
    propagation BEYOND the fused first round to reach node 3."""
    ids = [1, 2, 3, 7, 8, 9]
    inc = [
        (1, "g1"), (2, "g1"),   # 1-2
        (2, "g2"), (3, "g2"),   # 2-3 → {1,2,3}
        (7, "g3"), (8, "g3"),   # {7,8}
        # 9 isolated
    ]
    assert _components(spark, ids, inc) == {
        1: (1, 3),
        2: (1, 3),
        3: (1, 3),
        7: (7, 2),
        8: (7, 2),
        9: (9, 1),
    }


def test_components_long_chain_converges(spark):
    """A 12-node path graph (worst diameter for min-label propagation):
    the label must walk the whole chain through repeated rounds — pins
    that the early-stop never fires before the true fixpoint."""
    n = 12
    ids = list(range(1, n + 1))
    inc = []
    for i in range(1, n):
        inc += [(i, f"e{i}"), (i + 1, f"e{i}")]
    got = _components(spark, ids, inc)
    assert got == {i: (1, n) for i in ids}
