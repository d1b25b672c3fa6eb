"""Single-node numpy/pure-Python oracles for the link-graph algorithm suite.

These define the semantics the Spark jobs must match (north rule:
PageRank allclose(1e-6), CC / LPA / triangles exact).
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np


def pagerank_oracle(edges, damping=0.85, tol=1e-7, max_iters=100):
    """Power iteration with dangling-mass redistribution.

    edges: iterable of (src, dst); parallel edges are deduplicated.
    Returns (dict node -> rank, n_iters).
    """
    edges = sorted(set((int(s), int(d)) for s, d in edges))
    nodes = sorted({n for e in edges for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    src_i = np.array([idx[s] for s, _ in edges], dtype=np.int64)
    dst_i = np.array([idx[d] for _, d in edges], dtype=np.int64)
    for s in src_i:
        out_deg[s] += 1
    r = np.full(n, 1.0 / n)
    iters = 0
    for _ in range(max_iters):
        iters += 1
        contrib = np.zeros(n)
        w = np.where(out_deg[src_i] > 0, r[src_i] / out_deg[src_i], 0.0)
        np.add.at(contrib, dst_i, w)
        dangling = r[out_deg == 0].sum()
        r_new = (1 - damping) / n + damping * (contrib + dangling / n)
        delta = np.abs(r_new - r).max()
        r = r_new
        if delta < tol:
            break
    return {nodes[i]: float(r[i]) for i in range(n)}, iters


def connected_components_oracle(edges):
    """Union-find; label = min node id in component.  Undirected."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for s, d in edges:
        union(int(s), int(d))
    return {n: find(n) for n in list(parent)}


def label_propagation_oracle(edges, max_iters=20):
    """Synchronous LPA, undirected, labels init = node id.

    Each round every node takes the most frequent neighbor label; ties break
    to the smallest label; isolated nodes keep their label.  Stops when no
    label changes or after max_iters.  Returns (labels dict, n_iters).
    """
    adj = defaultdict(set)
    for s, d in edges:
        s, d = int(s), int(d)
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    nodes = sorted(adj)
    labels = {n: n for n in nodes}
    iters = 0
    for _ in range(max_iters):
        iters += 1
        new = {}
        changed = False
        for v in nodes:
            counts = Counter(labels[u] for u in adj[v])
            if counts:
                best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            else:
                best = labels[v]
            new[v] = best
            changed |= best != labels[v]
        labels = new
        if not changed:
            break
    return labels, iters


def triangle_count_oracle(edges):
    """Global triangle count over the simple undirected graph (self-loops and
    parallel edges dropped)."""
    und = {tuple(sorted((int(s), int(d)))) for s, d in edges if int(s) != int(d)}
    adj = defaultdict(set)
    for u, v in und:
        adj[u].add(v)
        adj[v].add(u)
    count = 0
    for u, v in und:
        count += len(adj[u] & adj[v])
    return count // 3
