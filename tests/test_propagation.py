"""Feature propagation vs an exact numpy replay."""

from __future__ import annotations

import math
import random

import pytest

from linkgraph.algorithms import propagate_features
from tests.conftest import make_graph


def _replay(edges, feats, hops, alpha, nodes=None):
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    all_nodes = set(adj) | set(nodes or [])
    x = {v: float(feats.get(v, 0.0)) for v in all_nodes}
    for _ in range(hops):
        nxt = {}
        for v in all_nodes:
            ns = adj.get(v, ())
            if ns:
                m = sum(x[u] for u in ns) / len(ns)
                nxt[v] = (1 - alpha) * x[v] + alpha * m
            else:
                nxt[v] = x[v]
        x = nxt
    return x


@pytest.mark.parametrize("hops,alpha", [(0, 0.5), (1, 1.0), (3, 0.3)])
def test_propagation_matches_replay(spark, hops, alpha):
    rng = random.Random(7)
    edges = sorted({tuple(sorted(rng.sample(range(25), 2))) for _ in range(50)})
    feats = {v: rng.randint(0, 10) for e in edges for v in e}
    g = make_graph(spark, edges)
    fdf = spark.createDataFrame(
        [(v, float(f)) for v, f in feats.items()], "id long, x double"
    )
    out = propagate_features(g, fdf, hops=hops, alpha=alpha)
    got = {r["id"]: r["x"] for r in out.collect()}
    expected = _replay(edges, feats, hops, alpha)
    assert set(got) == set(expected)
    for v in expected:
        assert math.isclose(got[v], expected[v], rel_tol=1e-12)


def test_propagation_isolated_and_missing_features(spark):
    g = make_graph(spark, [(0, 1), (1, 2)], extra_vertices=[9])
    fdf = spark.createDataFrame([(0, 6.0), (1, 0.0), (9, 4.0)], "id long, x double")
    out = propagate_features(g, fdf, hops=2, alpha=1.0)
    got = {r["id"]: r["x"] for r in out.collect()}
    # vertex 2 missing from features -> starts at 0; vertex 9 isolated
    expected = _replay([(0, 1), (1, 2)], {0: 6.0, 1: 0.0, 9: 4.0},
                       2, 1.0, nodes=[9])
    assert got.keys() == expected.keys()
    for v in expected:
        assert math.isclose(got[v], expected[v], rel_tol=1e-12)
    assert got[9] == 4.0


def test_propagation_validation(spark):
    g = make_graph(spark, [(0, 1)])
    fdf = g.vertices.selectExpr("id", "1.0 as x")
    with pytest.raises(ValueError):
        propagate_features(g, fdf, hops=-1)
    with pytest.raises(ValueError):
        propagate_features(g, fdf, alpha=1.5)
