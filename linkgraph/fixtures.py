"""Deterministic test fixtures (FIXTURES.md §1–§3).

Everything here is a pure function of its arguments (seeded by
construction, no wall-clock, no RNG state leakage) so tests and the
bench harness regenerate identical data every run.

- `gen_corpus(R, F)` — the source-code corpus table
  (repo, path, commit, lang, content) with *planted* import edges and
  the exports manifest, plus recorded per-row sha256 for the A2
  invariant check (BASELINE.json input_hint).
- golden graphs G1/G1b/G2/G3 (FIXTURES.md §3) as edge lists.
- NumPy / pure-Python oracles for PageRank and sync LPA (the pinned
  tie-break, SURVEY §A.3) used by property tests.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pandas as pd

LANGS = ["python", "js", "go"]
EXT = {"python": "py", "js": "js", "go": "go"}


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def repo_name(i: int) -> str:
    return f"org{i:04d}/repo{i:04d}"


def planted_targets(i: int, R: int) -> list[int]:
    """Ground-truth dependency targets of repo i (FIXTURES.md §1)."""
    deg = (R // 10) if (i % 97 == 0) else (1 + (i % 4))
    return sorted({(i * 7 + k) % R for k in range(1, deg + 1)} - {i})


def _import_lines(
    lang: str, targets: list[int], line_tabs: tuple | None = None
) -> list[str]:
    # branch once per call, not once per line (hub repos have ~R/10
    # targets, so this loop dominates generation); identical strings.
    # line_tabs (gen_corpus's precomputed per-target fragments) replaces
    # the {j:04d} formatting with a list index where the line depends
    # only on the target (and parity) — the js lines still interpolate
    # the running n.
    if line_tabs is not None:
        py_even, py_odd, js_lib, go_line = line_tabs
        if lang == "python":
            return [
                py_even[j] if n % 2 == 0 else py_odd[j]
                for n, j in enumerate(targets)
            ]
        if lang == "js":
            return [
                f'const x{n} = require("{js_lib[j]}")' if n % 2 == 0
                else f'import x{n} from "{js_lib[j]}"'
                for n, j in enumerate(targets)
            ]
        return [go_line[j] for j in targets]
    if lang == "python":
        return [
            f"import repo{j:04d}_pkg" if n % 2 == 0 else f"from repo{j:04d}_pkg import x"
            for n, j in enumerate(targets)
        ]
    if lang == "js":
        return [
            f'const x{n} = require("repo{j:04d}-lib")' if n % 2 == 0
            else f'import x{n} from "repo{j:04d}-lib"'
            for n, j in enumerate(targets)
        ]
    return [f'import "example.com/org{j:04d}/repo{j:04d}"' for j in targets]


def _filler(repo: str, path: str, lang: str) -> list[str]:
    h = _sha(repo + path)
    marker = "//" if lang in ("js", "go") else "#"
    return [f"{marker} {h[k : k + 16]}" for k in range(0, 48, 16)]


def make_content(
    repo: str,
    path: str,
    lang: str,
    targets: list[int],
    line_tabs: tuple | None = None,
) -> str:
    head = _filler(repo, path, lang)
    body = _import_lines(lang, targets, line_tabs)
    tail = {
        "python": ["def f():", "    return 1"],
        "js": ["function f() { return 1; }"],
        "go": ["func f() int { return 1 }"],
    }[lang]
    return "\n".join(head + body + tail) + "\n"


@dataclass
class Corpus:
    files: pd.DataFrame      # repo, path, commit, lang, content
    exports: pd.DataFrame    # module, repo
    edges: pd.DataFrame      # src_repo, dst_repo (planted ground truth)
    row_sha256: pd.DataFrame  # repo, path, sha256 (generator-recorded)


def gen_corpus(R: int = 30, F: int = 5) -> Corpus:
    # r6 perf (two passes over this function this round; output is
    # byte-identical both times, checked by frame-level sha256):
    # - one precomputed name table instead of ~|E| repo_name() f-string
    #   calls (the planted hub repos make |E| ≈ R²/970, so name
    #   formatting dominated generation)
    # - per-target import-line fragments precomputed once per repo
    #   index instead of formatted once per (file, target) line
    # - edges tracked as (i, j) INDEX pairs (unique by construction:
    #   targets is a set per i) and ordered by each name's rank in the
    #   sorted name table — identical to sorting the string tuples,
    #   because names are unique and tuple order compares names first
    names = [repo_name(i) for i in range(R)]
    py_even = [f"import repo{j:04d}_pkg" for j in range(R)]
    py_odd = [f"from repo{j:04d}_pkg import x" for j in range(R)]
    js_lib = [f"repo{j:04d}-lib" for j in range(R)]
    go_line = [f'import "example.com/org{j:04d}/repo{j:04d}"' for j in range(R)]
    line_tabs = (py_even, py_odd, js_lib, go_line)
    rows, shas = [], []
    edge_pairs: list[tuple[int, int]] = []
    for i in range(R):
        repo = names[i]
        targets = planted_targets(i, R)
        edge_pairs.extend((i, j) for j in targets)
        for j in range(F):
            lang = LANGS[(i + j) % 3]
            path = f"src/f{j:03d}.{EXT[lang]}"
            content = make_content(repo, path, lang, targets, line_tabs)
            rows.append(
                (repo, path, _sha(f"{repo}@{j}")[:40], lang, content)
            )
            shas.append((repo, path, _sha(content)))
    exports = []
    for j in range(R):
        exports.append((f"repo{j:04d}_pkg", names[j]))
        exports.append((js_lib[j], names[j]))
        exports.append((f"example.com/org{j:04d}/repo{j:04d}", names[j]))
    rank = [0] * R
    for r, idx in enumerate(sorted(range(R), key=names.__getitem__)):
        rank[idx] = r
    edge_pairs.sort(key=lambda e: (rank[e[0]], rank[e[1]]))
    return Corpus(
        files=pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"]),
        exports=pd.DataFrame(exports, columns=["module", "repo"]),
        edges=pd.DataFrame(
            [(names[i], names[j]) for i, j in edge_pairs],
            columns=["src_repo", "dst_repo"],
        ),
        row_sha256=pd.DataFrame(shas, columns=["repo", "path", "sha256"]),
    )


# ---------------------------------------------------------------- golden graphs

G1_EDGES = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)]
G1_PR = [0.37252685, 0.19582391, 0.39414924, 0.0375]

G1B_EDGES = [(0, 1), (0, 2), (1, 2), (2, 0)]  # vertex 3 dangling (add via vertex set)
G1B_PR_DROP = [0.29084228, 0.16110797, 0.29804975, 0.0375]
G1B_PR_REDIST = [0.36932353, 0.20458155, 0.37847587, 0.04761905]

G2_EDGES = [(0, 1), (1, 2), (0, 2), (3, 4)]  # undirected intent
G2_COMPONENTS = {0: 0, 1: 0, 2: 0, 3: 3, 4: 3}
G2_TRIANGLES = {0: 1, 1: 1, 2: 1, 3: 0, 4: 0}


def g3_star_edges(spokes: int = 1000) -> list[tuple[int, int]]:
    """G3 skew star: hub 0 — 1..spokes, plus 3-cycle 1-2-3 (undirected intent)."""
    e = [(0, k) for k in range(1, spokes + 1)]
    e += [(1, 2), (2, 3), (1, 3)]
    return e


# ---------------------------------------------------------------- oracles


def pagerank_numpy(
    edges: list[tuple[int, int]],
    n: int,
    d: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    dangling: str = "drop",
) -> tuple[np.ndarray, int]:
    """Dense power iteration under the pinned semantics (SURVEY §A.2)."""
    out = np.zeros(n)
    for s, _ in edges:
        out[s] += 1
    r = np.full(n, 1.0 / n)
    for it in range(max_iter):
        new = np.full(n, (1 - d) / n)
        for s, t in edges:
            new[t] += d * r[s] / out[s]
        if dangling == "redistribute":
            new += d * r[out == 0].sum() / n
        delta = float(np.abs(new - r).sum())
        r = new
        if delta < tol:
            return r, it + 1
    return r, max_iter


def lpa_python(
    undirected_edges: list[tuple[int, int]], n: int, max_iter: int = 10
) -> dict[int, int]:
    """Sync LPA oracle with the pinned tie-break (most frequent neighbor
    label; ties → smallest label; no-neighbor vertices keep their label)."""
    nbrs: dict[int, set[int]] = {v: set() for v in range(n)}
    for u, v in undirected_edges:
        if u != v:
            nbrs[u].add(v)
            nbrs[v].add(u)
    labels = {v: v for v in range(n)}
    for _ in range(max_iter):
        new = {}
        for v in range(n):
            if not nbrs[v]:
                new[v] = labels[v]
                continue
            counts: dict[int, int] = {}
            for u in nbrs[v]:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        if new == labels:
            break
        labels = new
    return labels


def components_python(
    undirected_edges: list[tuple[int, int]], n: int
) -> dict[int, int]:
    """Min-label connected components oracle (union-find)."""
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in undirected_edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    comp_min: dict[int, int] = {}
    for v in range(n):
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    return {v: comp_min[find(v)] for v in range(n)}


def triangles_python(
    undirected_edges: list[tuple[int, int]], n: int
) -> dict[int, int]:
    nbrs: dict[int, set[int]] = {v: set() for v in range(n)}
    for u, v in undirected_edges:
        if u != v:
            nbrs[u].add(v)
            nbrs[v].add(u)
    return {
        v: sum(len(nbrs[v] & nbrs[u]) for u in nbrs[v]) // 2 for v in range(n)
    }
