"""Landmark BFS distances / centrality vs networkx BFS (exact)."""

from __future__ import annotations

import math
import random

import networkx as nx
import pytest

from linkgraph.algorithms import (
    landmark_centrality,
    landmark_distances,
    pick_landmarks,
)
from tests.conftest import make_graph


def _nx(edges):
    g = nx.Graph()
    g.add_edges_from(edges)
    return g


def _expected_landmarks(edges, L):
    g = _nx(edges)
    return [
        v for v, _ in sorted(g.degree, key=lambda t: (-t[1], t[0]))[:L]
    ]


def _random(seed, n=40, m=90):
    rng = random.Random(seed)
    return sorted({tuple(sorted(rng.sample(range(n), 2))) for _ in range(m)})


def test_pick_landmarks_degree_then_id(spark):
    edges = [(0, 1), (0, 2), (0, 3), (4, 1), (4, 2), (4, 3), (5, 6)]
    g = make_graph(spark, edges)
    got = [r["lm"] for r in pick_landmarks(g, 3).collect()]
    assert sorted(got) == sorted(_expected_landmarks(edges, 3))


@pytest.mark.parametrize("seed", [3, 8])
def test_landmark_distances_match_networkx_bfs(spark, seed):
    edges = _random(seed)
    g = make_graph(spark, edges)
    L = 4
    dist, info = landmark_distances(g, num_landmarks=L, max_hops=32)
    assert info.converged
    nxg = _nx(edges)
    lms = _expected_landmarks(edges, L)
    expected = {
        (lm, v, d)
        for lm in lms
        for v, d in nx.single_source_shortest_path_length(nxg, lm).items()
    }
    assert {(r["lm"], r["v"], r["d"]) for r in dist.collect()} == expected


def test_landmark_centrality_matches_python(spark):
    edges = _random(5)
    g = make_graph(spark, edges)
    L = 4
    out, _ = landmark_centrality(g, num_landmarks=L)
    nxg = _nx(edges)
    lms = _expected_landmarks(edges, L)
    rows = {r["id"]: r for r in out.collect()}
    assert set(rows) == set(nxg.nodes)
    for v in nxg.nodes:
        ds = [
            d
            for lm in lms
            for (u, d) in [(v, nx.shortest_path_length(nxg, lm, v))]
            if d > 0
        ]
        r = rows[v]
        assert r["reached"] == len(ds)
        assert r["sum_dist"] == sum(ds)
        assert math.isclose(r["harmonic"], sum(1.0 / d for d in ds), rel_tol=1e-12)
        expect_clo = (len(ds) / sum(ds)) if ds else 0.0
        assert math.isclose(r["closeness"], expect_clo, rel_tol=1e-12)


def test_landmark_centrality_disconnected_scores_zero(spark):
    # landmarks live in the big component; the far pair scores 0
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (2, 3), (50, 51)]
    g = make_graph(spark, edges)
    out, _ = landmark_centrality(g, num_landmarks=2)
    rows = {r["id"]: r for r in out.collect()}
    assert rows[50]["reached"] == 0 and rows[50]["closeness"] == 0.0
    assert rows[51]["harmonic"] == 0.0


def test_landmark_max_hops_truncates(spark):
    chain = [(i, i + 1) for i in range(10)]
    g = make_graph(spark, chain)
    dist, info = landmark_distances(g, num_landmarks=1, max_hops=3)
    assert not info.converged
    assert max(r["d"] for r in dist.collect()) == 3
