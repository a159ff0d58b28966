"""Link prediction and Jones–Plassmann coloring: pure-python replay
oracles + defining properties.

Link prediction is checked against an exact pure-python computation of
the three indices (common neighbors, Jaccard, Adamic–Adar) on random
graphs, including the `max_center_degree` cap semantics. Coloring is
checked by an exact md5-priority round replay plus the two defining
properties (properness, color(v) ≤ deg(v)) on every case graph.
"""

from __future__ import annotations

import hashlib
import math
import random

import pytest

from linkgraph.algorithms import greedy_coloring, link_prediction


def _gnp_und(n, p, seed):
    rng = random.Random(seed)
    und = {
        (u, v)
        for u in range(n)
        for v in range(u + 1, n)
        if rng.random() < p
    }
    return sorted(und)


def _linkpred_python(und_edges, max_center_degree=None, min_common=1):
    nbrs = {}
    for u, v in und_edges:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    deg = {v: len(ns) for v, ns in nbrs.items()}
    adj = set(und_edges)
    out = {}
    verts = sorted(nbrs)
    for i, u in enumerate(verts):
        for v in verts[i + 1:]:
            if (u, v) in adj:
                continue
            shared = [
                w
                for w in nbrs[u] & nbrs[v]
                if max_center_degree is None or deg[w] <= max_center_degree
            ]
            if len(shared) < min_common:
                continue
            common = len(shared)
            jac = common / (deg[u] + deg[v] - common)
            aa = sum(1.0 / math.log(deg[w]) for w in shared)
            out[(u, v)] = (common, jac, aa)
    return out


def _coloring_python(und_edges, verts):
    nbrs = {v: set() for v in verts}
    for u, v in und_edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    color = {v: -1 for v in verts}
    r = 0
    while any(c == -1 for c in color.values()):
        r += 1
        p = {
            v: int(hashlib.md5(f"{v}:{r}".encode()).hexdigest()[:15], 16)
            for v, c in color.items()
            if c == -1
        }
        winners = [
            v
            for v in p
            if all(
                (p[v], v) < (p[u], u) for u in nbrs[v] if color[u] == -1
            )
        ]
        for v in winners:
            used = {color[u] for u in nbrs[v] if color[u] >= 0}
            c = 0
            while c in used:
                c += 1
            color[v] = c
        assert r < 200
    return color


LP_CASES = [
    ("gnp_sparse", _gnp_und(30, 0.12, seed=31), None),
    ("gnp_mid", _gnp_und(25, 0.25, seed=32), None),
    ("capped_hub", [(0, v) for v in range(1, 15)]
     + [(1, 2), (3, 4), (2, 5), (4, 5), (5, 6)], 6),
]


@pytest.mark.parametrize(
    "name,edges,cap", LP_CASES, ids=[c[0] for c in LP_CASES]
)
def test_link_prediction_matches_python(spark, graph_builder, name, edges, cap):
    g = graph_builder(edges)
    got = {
        (r["src"], r["dst"]): (r["common"], r["jaccard"], r["adamic_adar"])
        for r in link_prediction(g, max_center_degree=cap).collect()
    }
    want = _linkpred_python(edges, max_center_degree=cap)
    assert set(got) == set(want), name
    for pair in want:
        assert got[pair][0] == want[pair][0], (name, pair)
        assert abs(got[pair][1] - want[pair][1]) < 1e-12, (name, pair)
        assert abs(got[pair][2] - want[pair][2]) < 1e-12, (name, pair)


def test_link_prediction_excludes_adjacent_and_thresholds(spark, graph_builder):
    edges = _gnp_und(25, 0.2, seed=33)
    g = graph_builder(edges)
    adj = set(edges)
    rows = link_prediction(g, min_common=2).collect()
    assert rows, "threshold test needs a non-empty result"
    for r in rows:
        assert (r["src"], r["dst"]) not in adj
        assert r["src"] < r["dst"]
        assert r["common"] >= 2


COLOR_CASES = [
    ("gnp_sparse", _gnp_und(40, 0.06, seed=41)),
    ("gnp_mid", _gnp_und(30, 0.15, seed=42)),
    ("clique_plus_path", [(u, v) for u in range(8) for v in range(u + 1, 8)]
     + [(8 + i, 9 + i) for i in range(10)]),
]


@pytest.mark.parametrize(
    "name,edges", COLOR_CASES, ids=[c[0] for c in COLOR_CASES]
)
def test_coloring_matches_python_replay_and_properties(
    spark, graph_builder, name, edges
):
    verts = sorted({u for u, _ in edges} | {v for _, v in edges})
    g = graph_builder(edges)
    state, info = greedy_coloring(g)
    assert info.converged
    got = {r["id"]: r["color"] for r in state.collect()}
    # exact replay: same md5 priorities → same colors
    want = _coloring_python(edges, verts)
    for v in verts:
        assert got[v] == want[v], (name, v)
    # defining properties, asserted independently of the replay
    nbrs = {v: set() for v in verts}
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    for u, v in edges:
        assert got[u] != got[v], (name, u, v)  # proper
    for v in verts:
        assert 0 <= got[v] <= len(nbrs[v]), (name, v)  # greedy bound
