"""Double-sweep diameter bounds vs networkx."""

from __future__ import annotations

import random

import networkx as nx
import pytest

from linkgraph.algorithms import double_sweep_diameter
from tests.conftest import make_graph


def test_double_sweep_path_graph_exact(spark):
    edges = [(i, i + 1) for i in range(10)]
    g = make_graph(spark, edges)
    out, info = double_sweep_diameter(g)
    r = out.collect()[0]
    # pinned start: max degree (2), min id -> vertex 1; farthest: 10
    assert r["start"] == 1 and r["far_vertex"] == 10 and r["ecc_start"] == 9
    assert r["diameter_lower"] == 10  # exact on trees
    assert r["diameter_upper"] == 20
    assert info.converged


@pytest.mark.parametrize("seed", [1, 5, 9])
def test_double_sweep_bounds_random(spark, seed):
    rng = random.Random(seed)
    edges = sorted({tuple(sorted(rng.sample(range(30), 2))) for _ in range(45)})
    nxg = nx.Graph()
    nxg.add_edges_from(edges)
    g = make_graph(spark, edges)
    out, _ = double_sweep_diameter(g)
    r = out.collect()[0]
    comp = nx.node_connected_component(nxg, r["start"])
    true_diam = nx.diameter(nxg.subgraph(comp))
    assert r["diameter_lower"] <= true_diam <= r["diameter_upper"]
    # the far vertex really is at ecc(start) from the start
    assert r["ecc_start"] == nx.eccentricity(nxg.subgraph(comp), r["start"])
