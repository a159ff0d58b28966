"""k-truss peeling vs networkx (independent oracle)."""

from __future__ import annotations

import random

import networkx as nx
import pytest

from linkgraph.algorithms import ktruss
from tests.conftest import make_graph


def _edges(g):
    return {tuple(sorted(e)) for e in g.edges()}


def _random(seed, n=30, m=110):
    rng = random.Random(seed)
    return sorted({tuple(sorted(rng.sample(range(n), 2))) for _ in range(m)})


@pytest.mark.parametrize("seed", [1, 2])
@pytest.mark.parametrize("k", [3, 4, 5])
def test_ktruss_matches_networkx(spark, seed, k):
    edges = _random(seed)
    g = make_graph(spark, edges)
    got, info = ktruss(g, k)
    assert info.converged
    nxg = nx.Graph()
    nxg.add_edges_from(edges)
    expected = _edges(nx.k_truss(nxg, k))
    assert {(r["u"], r["v"]) for r in got.collect()} == expected


def test_ktruss_k2_is_whole_graph_and_validation(spark):
    edges = _random(9, n=15, m=40)
    g = make_graph(spark, edges)
    got, info = ktruss(g, 2)
    assert info.converged and info.supersteps == 0
    assert {(r["u"], r["v"]) for r in got.collect()} == set(edges)
    with pytest.raises(ValueError):
        ktruss(g, 1)


def test_ktruss_clique_survives_chain_peels(spark):
    # K5 (a 5-truss) plus a pendant chain: for k=3 the chain must peel
    # away over cascading rounds while the clique survives intact
    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    chain = [(4, 10), (10, 11), (11, 12)]
    g = make_graph(spark, clique + chain)
    got, info = ktruss(g, 3)
    assert {(r["u"], r["v"]) for r in got.collect()} == set(clique)
    got5, _ = ktruss(g, 5)
    assert {(r["u"], r["v"]) for r in got5.collect()} == set(clique)
    got6, _ = ktruss(g, 6)
    assert got6.count() == 0


def test_ktruss_max_rounds_caps_peeling(spark):
    # triangle strip: chords (i, i+2) and the two end path edges carry
    # support 1, interior path edges support 2 — for k=4 round 1 peels
    # the support-1 edges, starving the interior path edges, which
    # peel in round 2. Capping at one round must return the
    # intermediate (still-unconverged) state.
    n = 8
    strip = [(i, i + 1) for i in range(n)] + [(i, i + 2) for i in range(n - 1)]
    g = make_graph(spark, strip)
    full, info_full = ktruss(g, 4)
    capped, info_capped = ktruss(g, 4, max_rounds=1)
    assert info_full.converged and full.count() == 0
    assert not info_capped.converged
    assert {(r["u"], r["v"]) for r in capped.collect()} == {
        (i, i + 1) for i in range(1, n - 1)
    }
