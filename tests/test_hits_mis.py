"""HITS and Luby-MIS: numpy/pure-python replay oracles + properties.

HITS is checked two ways: (1) an exact numpy replay of the pinned
iteration (init a=0 h=1, L2 normalization per phase) for a fixed K,
and (2) a converged run against networkx's `nx.hits` after re-basing
both to L1 normalization (the eigenvector direction is
normalization-invariant). MIS is checked by an exact pure-python
replay of the md5-priority rounds plus the two defining properties
(independence, maximality) on every case graph.
"""

from __future__ import annotations

import hashlib
import random

import numpy as np
import pytest

from linkgraph.algorithms import hits, maximal_independent_set


def _gnp(n, p, seed, directed=True):
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


def _hits_numpy(edges, n, k):
    a = np.zeros(n)
    h = np.ones(n)
    src = np.array([u for u, _ in edges])
    dst = np.array([v for _, v in edges])
    for _ in range(k):
        a = np.bincount(dst, weights=h[src], minlength=n)
        na = np.sqrt((a * a).sum())
        a = a / na if na > 0 else a * 0.0
        h = np.bincount(src, weights=a[dst], minlength=n)
        nh = np.sqrt((h * h).sum())
        h = h / nh if nh > 0 else h * 0.0
    return a, h


def _mis_python(edges, n):
    und = {(u, v) for u, v in edges} | {(v, u) for u, v in edges}
    nbrs = {v: set() for v in range(n)}
    for u, v in und:
        nbrs[u].add(v)
    st = {v: 0 for v in nbrs}
    r = 0
    while any(s == 0 for s in st.values()):
        r += 1
        p = {
            v: int(hashlib.md5(f"{v}:{r}".encode()).hexdigest()[:15], 16)
            for v, s in st.items()
            if s == 0
        }
        winners = [
            v
            for v in p
            if all(
                (p[v], v) < (p[u], u)
                for u in nbrs[v]
                if st[u] == 0
            )
        ]
        for v in winners:
            st[v] = 1
            for u in nbrs[v]:
                if st[u] == 0:
                    st[u] = 2
        assert r < 100
    return st


HITS_CASES = [
    ("gnp_sparse", _gnp(40, 0.06, seed=11)),
    ("gnp_dense", _gnp(25, 0.25, seed=12)),
    ("bipartite", [(u, 100 + v) for u in range(20) for v in range(8)
                   if (u * 7 + v) % 3 != 0]),
]


@pytest.mark.parametrize(
    "name,edges", HITS_CASES, ids=[c[0] for c in HITS_CASES]
)
def test_hits_matches_numpy_replay(spark, graph_builder, name, edges):
    n = max(max(u, v) for u, v in edges) + 1
    verts = sorted({u for u, _ in edges} | {v for _, v in edges})
    g = graph_builder(edges)
    want_a, want_h = _hits_numpy(edges, n, k=6)
    state, info = hits(g, tol=0.0, max_supersteps=6)
    got = {r["id"]: (r["a"], r["h"]) for r in state.collect()}
    assert info.supersteps == 6
    for v in verts:
        assert abs(got[v][0] - want_a[v]) < 1e-9, (name, v)
        assert abs(got[v][1] - want_h[v]) < 1e-9, (name, v)


def test_hits_converges_to_numpy_fixpoint(spark, graph_builder):
    # nx.hits needs scipy (absent here); the numpy replay iterated to
    # its own fixpoint is the same principal-eigenvector check. The
    # engine halts on its L1-delta tolerance, so this also exercises
    # the halt path (unlike the fixed-K replay tests above).
    edges = _gnp(30, 0.12, seed=13)
    n = max(max(u, v) for u, v in edges) + 1
    g = graph_builder(edges)
    state, info = hits(g, tol=1e-12, max_supersteps=200)
    assert info.converged and info.supersteps < 200
    want_a, want_h = _hits_numpy(edges, n, k=500)
    for r in state.collect():
        assert abs(r["a"] - want_a[r["id"]]) < 1e-8
        assert abs(r["h"] - want_h[r["id"]]) < 1e-8


MIS_CASES = [
    ("gnp_sparse", _gnp(40, 0.05, seed=21)),
    ("gnp_mid", _gnp(30, 0.15, seed=22)),
    ("clique_plus_path", [(u, v) for u in range(8) for v in range(8) if u < v]
     + [(8 + i, 9 + i) for i in range(10)]),
]


@pytest.mark.parametrize(
    "name,edges", MIS_CASES, ids=[c[0] for c in MIS_CASES]
)
def test_mis_matches_python_replay_and_properties(
    spark, graph_builder, name, edges
):
    n = max(max(u, v) for u, v in edges) + 1
    verts = {u for u, _ in edges} | {v for _, v in edges}
    g = graph_builder(edges)
    state, info = maximal_independent_set(g)
    assert info.converged
    got = {r["id"]: r["st"] for r in state.collect()}
    # exact replay: same md5 priorities → same membership
    want = _mis_python(edges, n)
    for v in verts:
        assert got[v] == want[v], (name, v)
    # defining properties, asserted independently of the replay
    und = {(u, v) for u, v in edges} | {(v, u) for u, v in edges}
    mis = {v for v, s in got.items() if s == 1}
    assert all(s in (1, 2) for s in got.values())  # all decided
    for u, v in und:
        assert not (u in mis and v in mis), (name, u, v)  # independent
    for v, s in got.items():  # maximal: every excluded vertex has an
        if s == 2:  # MIS neighbor
            assert any(u in mis for x, u in und if x == v), (name, v)
