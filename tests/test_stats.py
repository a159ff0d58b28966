"""Graph summary statistics vs networkx (independent oracle)."""

from __future__ import annotations

import math
import random

import networkx as nx
import pytest

from linkgraph.algorithms import degree_assortativity, modularity
from tests.conftest import make_graph

KARATE_LIKE = [
    (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
    (3, 4), (4, 5), (5, 6), (6, 7), (7, 8), (8, 9),
    (9, 4), (5, 8), (2, 9),
]


def _nx_graph(edges):
    g = nx.Graph()
    g.add_edges_from(edges)
    return g


def test_assortativity_matches_networkx_golden(spark):
    g = make_graph(spark, KARATE_LIKE)
    row = degree_assortativity(g).collect()[0]
    expected = nx.degree_assortativity_coefficient(_nx_graph(KARATE_LIKE))
    assert row["pairs"] == 2 * len(set(map(tuple, map(sorted, KARATE_LIKE))))
    assert math.isclose(row["assortativity"], expected, rel_tol=1e-9)


def test_assortativity_matches_networkx_random(spark):
    rng = random.Random(7)
    edges = {tuple(sorted(rng.sample(range(60), 2))) for _ in range(250)}
    g = make_graph(spark, sorted(edges))
    row = degree_assortativity(g).collect()[0]
    expected = nx.degree_assortativity_coefficient(_nx_graph(edges))
    assert math.isclose(row["assortativity"], expected, rel_tol=1e-9)


def test_assortativity_direction_invariant(spark):
    # the statistic is over the symmetrized graph, so flipping edge
    # direction must not change it
    fwd = make_graph(spark, KARATE_LIKE)
    rev = make_graph(spark, [(d, s) for s, d in KARATE_LIKE])
    a = degree_assortativity(fwd).collect()[0]["assortativity"]
    b = degree_assortativity(rev).collect()[0]["assortativity"]
    assert math.isclose(a, b, rel_tol=1e-12)


@pytest.mark.parametrize("n_comms", [1, 2, 4])
def test_modularity_matches_networkx(spark, n_comms):
    rng = random.Random(n_comms)
    edges = {tuple(sorted(rng.sample(range(40), 2))) for _ in range(120)}
    g = make_graph(spark, sorted(edges))
    nodes = sorted({v for e in edges for v in e})
    assign = {v: v % n_comms for v in nodes}
    labels = spark.createDataFrame(
        [(int(v), int(c)) for v, c in assign.items()], "id long, label long"
    )
    row = modularity(g, labels).collect()[0]
    comms = [
        {v for v in nodes if assign[v] == c} for c in range(n_comms)
    ]
    expected = nx.algorithms.community.modularity(
        _nx_graph(edges), [c for c in comms if c]
    )
    assert row["m"] == len(edges)
    assert row["communities"] == n_comms
    assert math.isclose(row["modularity"], expected, rel_tol=1e-9)


def test_modularity_single_community_is_zero(spark):
    # one community holding every vertex: Q = 1 - 1 = 0 exactly
    g = make_graph(spark, KARATE_LIKE)
    nodes = sorted({v for e in KARATE_LIKE for v in e})
    labels = spark.createDataFrame(
        [(int(v), 0) for v in nodes], "id long, label long"
    )
    row = modularity(g, labels).collect()[0]
    assert row["modularity"] == pytest.approx(0.0, abs=1e-15)


def test_modularity_unlabelled_vertices_are_singletons(spark):
    # dropping a vertex from `labels` must equal labelling it with a
    # fresh singleton community id
    g = make_graph(spark, KARATE_LIKE)
    nodes = sorted({v for e in KARATE_LIKE for v in e})
    full = spark.createDataFrame(
        [(int(v), int(v % 2) if v != 9 else 99) for v in nodes],
        "id long, label long",
    )
    partial = spark.createDataFrame(
        [(int(v), int(v % 2)) for v in nodes if v != 9],
        "id long, label long",
    )
    qa = modularity(g, full).collect()[0]["modularity"]
    qb = modularity(g, partial).collect()[0]["modularity"]
    assert math.isclose(qa, qb, rel_tol=1e-12)
