"""Independent oracles (numpy + networkx) for the parity suite.

Two oracles stand in for the absent igraph binary (SURVEY.md §5.3):
a 30-line numpy dense power iteration at tol 1e-12 implementing the
published update rule, cross-checked against networkx 3.6.1 (same
Brin/Page spec) in the tests themselves.
"""

from __future__ import annotations

import numpy as np


def pagerank_numpy(n, edges, damping=0.85, tol=1e-12, max_iter=10_000):
    """Exact-ish power iteration: r' = (1-d)/n + d*(pull + dangling/n)."""
    src = np.array([e[0] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges], dtype=np.int64)
    out_deg = np.bincount(src, minlength=n).astype(np.float64)
    dangling_mask = out_deg == 0
    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        contrib = np.zeros(n)
        np.add.at(contrib, dst, r[src] / out_deg[src])
        dangling = r[dangling_mask].sum()
        r2 = (1.0 - damping) / n + damping * (contrib + dangling / n)
        if np.max(np.abs(r2 - r)) < tol:
            return r2
        r = r2
    return r


def pagerank_exact(n, edges, damping=0.85):
    """Independent second oracle: solve the linear system
    (I - d*(P^T + 1·dangling^T/n)) r = (1-d)/n exactly — no iteration,
    so it cross-checks the power-iteration oracle by a different
    method (networkx's pagerank needs scipy, absent in the sandbox;
    this is the same Brin/Page fixpoint solved directly)."""
    src = np.array([e[0] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges], dtype=np.int64)
    out_deg = np.bincount(src, minlength=n).astype(np.float64)
    P_T = np.zeros((n, n))
    for s, t in edges:
        P_T[t, s] += 1.0 / out_deg[s]
    dangling = (out_deg == 0).astype(np.float64)
    A = np.eye(n) - damping * (P_T + np.outer(np.ones(n), dangling) / n)
    return np.linalg.solve(A, np.full(n, (1.0 - damping) / n))


def components_networkx(n, edges):
    """Dense igraph-style labels: component of the smallest vertex id
    gets 0, next smallest unlabeled gets 1, ..."""
    import networkx as nx

    g = nx.Graph()
    g.add_nodes_from(range(n))
    g.add_edges_from(edges)
    comp_min = {}
    for comp in nx.connected_components(g):
        m = min(comp)
        for v in comp:
            comp_min[v] = m
    mins_sorted = sorted(set(comp_min.values()))
    rank = {m: i for i, m in enumerate(mins_sorted)}
    return {v: rank[m] for v, m in comp_min.items()}


def triangles_networkx(n, edges):
    import networkx as nx

    g = nx.Graph()
    g.add_nodes_from(range(n))
    g.add_edges_from(e for e in edges if e[0] != e[1])
    per_vertex = nx.triangles(g)
    return per_vertex, sum(per_vertex.values()) // 3


# ---------------------------------------------------------------------------
# fixture graphs (FIXTURES.md F2)
# ---------------------------------------------------------------------------


def karate_edges():
    import networkx as nx

    return [(int(a), int(b)) for a, b in nx.karate_club_graph().edges()]


def ring_edges(n=10):
    return [(i, (i + 1) % n) for i in range(n)]


def star_edges(n_leaves=10):
    # leaves point at the hub AND hub points at leaves (so no dangling)
    return [(i, 0) for i in range(1, n_leaves + 1)] + [
        (0, i) for i in range(1, n_leaves + 1)
    ]


def two_cliques_bridge():
    """K5 (0-4) + K5 (5-9) + bridge 4-5."""
    e = []
    for base in (0, 5):
        for i in range(base, base + 5):
            for j in range(i + 1, base + 5):
                e.append((i, j))
    e.append((4, 5))
    return e


def dangling_chain():
    """0->1->2->3 (3 is a sink) plus 4->2; vertex 3 dangling."""
    return [(0, 1), (1, 2), (2, 3), (4, 2)]


def er_edges(n, p, seed):
    rng = np.random.RandomState(seed)
    mask = rng.rand(n, n) < p
    return [(i, j) for i in range(n) for j in range(n) if i != j and mask[i, j]]


def ring_of_cliques(k, size):
    """k cliques of `size` vertices joined in a ring by single
    bridges — the standard multi-level community fixture (level 0
    finds the cliques, level 1+ works on the ring of super-vertices).
    """
    e = []
    for c in range(k):
        base = c * size
        for i in range(base, base + size):
            for j in range(i + 1, base + size):
                e.append((i, j))
    for c in range(k):
        e.append((c * size, ((c + 1) % k) * size + 1))
    return e
