"""Property-based tests (SURVEY §5.2 test 3): engine == oracle and
partition-invariance on seeded random graphs.

Spark runs are expensive (~seconds per graph), so instead of live
hypothesis shrinking we use hypothesis' deterministic RandomState-free
generation to pre-draw a fixed, seeded set of graphs and parametrize
over them — same coverage class, bounded runtime, zero flakiness.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from linkgraph import fixtures as FX
from linkgraph.algorithms import (
    connected_components,
    label_propagation,
    pagerank,
    triangle_counts,
)


def _gnp(n: int, p: float, seed: int, directed: bool = True):
    rng = random.Random(seed)
    edges = [
        (u, v)
        for u in range(n)
        for v in range(n)
        if u != v and rng.random() < p
    ]
    if not directed:
        und = {(min(u, v), max(u, v)) for u, v in edges}
        edges = [e for uv in und for e in (uv, (uv[1], uv[0]))]
    return edges


def _powerlaw(n: int, seed: int):
    """Configuration-model-ish: vertex v gets ~ n/(v+1) out-edges (skewed head)."""
    rng = random.Random(seed)
    edges = set()
    for v in range(n):
        deg = max(1, n // (v + 1) // 2)
        for _ in range(deg):
            t = rng.randrange(n)
            if t != v:
                edges.add((v, t))
    return sorted(edges)


CASES = [
    ("gnp_sparse", _gnp(40, 0.05, seed=1)),
    ("gnp_dense", _gnp(25, 0.25, seed=2)),
    ("gnp_undirected", _gnp(30, 0.12, seed=3, directed=False)),
    ("powerlaw", _powerlaw(50, seed=4)),
    # ids must be contiguous: the numpy oracle's N is max_id+1 while the
    # engine's N is the actual vertex count
    ("two_cliques", [(u, v) for u in range(6) for v in range(6) if u != v]
     + [(u + 6, v + 6) for u in range(5) for v in range(5) if u != v]),
]


@pytest.mark.parametrize("name,edges", CASES, ids=[c[0] for c in CASES])
def test_pagerank_matches_numpy_oracle(spark, graph_builder, name, edges):
    n = max(max(u, v) for u, v in edges) + 1
    verts = sorted({u for u, _ in edges} | {v for _, v in edges})
    g = graph_builder(edges)
    want, _ = FX.pagerank_numpy(edges, n, tol=1e-9, max_iter=200)
    state, info = pagerank(g, tol=1e-9, max_supersteps=200)
    got = {r["id"]: r["rank"] for r in state.collect()}
    for v in verts:
        assert abs(got[v] - want[v]) < 1e-6, (name, v)


@pytest.mark.parametrize("name,edges", CASES[:3], ids=[c[0] for c in CASES[:3]])
def test_components_and_triangles_match_oracle(spark, graph_builder, name, edges):
    n = max(max(u, v) for u, v in edges) + 1
    verts = sorted({u for u, _ in edges} | {v for _, v in edges})
    g = graph_builder(edges)
    want_cc = FX.components_python(edges, n)
    state, _ = connected_components(g)
    got = {r["id"]: r["comp"] for r in state.collect()}
    for v in verts:
        assert got[v] == want_cc[v]
    want_tri = FX.triangles_python(edges, n)
    per_vertex, total, _ = triangle_counts(g)
    got_tri = {r["id"]: r["triangles"] for r in per_vertex.collect()}
    for v in verts:
        assert got_tri[v] == want_tri[v]
    assert total * 3 == sum(got_tri.values())


def test_partition_invariance(spark, graph_builder):
    """Identical results for P ∈ {1, 3, 8} — the classic distributed bug."""
    edges = _powerlaw(40, seed=7)
    n = max(max(u, v) for u, v in edges) + 1
    verts = sorted({u for u, _ in edges} | {v for _, v in edges})
    results = {}
    labels = {}
    for p in (1, 3, 8):
        spark.conf.set("spark.sql.shuffle.partitions", str(p))
        try:
            g = graph_builder(edges)
            state, _ = pagerank(g, tol=1e-9, max_supersteps=200)
            results[p] = {r["id"]: r["rank"] for r in state.collect()}
            lp, _ = label_propagation(g, max_iter=6, early_stop=False)
            labels[p] = {r["id"]: r["label"] for r in lp.collect()}
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "8")
    for v in verts:
        assert abs(results[1][v] - results[3][v]) < 1e-9
        assert abs(results[1][v] - results[8][v]) < 1e-9
        assert labels[1][v] == labels[3][v] == labels[8][v]


def test_lpa_matches_pure_python_oracle(spark, graph_builder):
    edges = _gnp(30, 0.1, seed=9, directed=False)
    n = max(max(u, v) for u, v in edges) + 1
    verts = sorted({u for u, _ in edges} | {v for _, v in edges})
    g = graph_builder(edges)
    want = FX.lpa_python(edges, n, max_iter=8)
    state, _ = label_propagation(g, max_iter=8, early_stop=False)
    got = {r["id"]: r["label"] for r in state.collect()}
    for v in verts:
        assert got[v] == want[v]


def test_cc_matches_networkx_hypothesis(spark, graph_builder):
    """Property: for arbitrary small directed edge lists, min-label CC
    over the symmetrized graph equals networkx's undirected components
    (hypothesis-generated, fixed seed via derandomize for CI stability)."""
    import networkx as nx
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from linkgraph.algorithms import connected_components

    @settings(
        max_examples=6,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.lists(
            st.tuples(st.integers(0, 19), st.integers(0, 19)),
            min_size=1,
            max_size=40,
        ).filter(lambda es: any(u != v for u, v in es))
    )
    def run(edges):
        g = graph_builder(edges)
        state, _ = connected_components(g)
        got = {r["id"]: r["comp"] for r in state.collect()}
        G = nx.Graph()
        G.add_edges_from((u, v) for u, v in edges if u != v)
        want = {}
        for comp in nx.connected_components(G):
            m = min(comp)
            for v in comp:
                want[v] = m
        assert got == want

    run()


def test_cc_idempotent_and_deterministic(spark, graph_builder):
    """SURVEY §5.2(3c): re-running CC on the same graph reproduces the
    labels exactly, and one further superstep over the converged state
    changes nothing (a fixpoint is stable)."""
    edges = _powerlaw(40, seed=11)
    g = graph_builder(edges)
    a, info_a = connected_components(g)
    b, info_b = connected_components(g)
    la = {r["id"]: r["comp"] for r in a.collect()}
    lb = {r["id"]: r["comp"] for r in b.collect()}
    assert la == lb
    assert info_a.converged and info_b.converged
    # the last recorded superstep has zero active vertices (fixpoint)
    assert info_a.log[-1].active == 0
