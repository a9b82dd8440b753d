"""Pure-Python/numpy reference implementations for the graph operators
(SURVEY.md §5: "graph-algorithm oracles"). Deliberately independent of
Spark — dense/dict-based, small-scale only."""

from __future__ import annotations

from collections import defaultdict

import numpy as np


def pagerank_oracle(
    edges: list[tuple[str, str, float]],
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    weighted: bool = True,
    personalization: list[str] | None = None,
) -> dict[str, float]:
    """Power iteration with weighted transitions + dangling-mass
    redistribution to the teleport vector — the exact semantics of
    operators/pagerank.py (uniform teleport, or personalized over a
    source set)."""
    verts = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    if n == 0:
        return {}
    out_w = np.zeros(n)
    for s, _, w in edges:
        out_w[idx[s]] += w if weighted else 1.0
    p = np.full(n, 1.0 / n)
    if personalization:
        p = np.zeros(n)
        for v in personalization:
            if v in idx:
                p[idx[v]] = 1.0 / len(personalization)
    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        contrib = np.zeros(n)
        for s, d, w in edges:
            ww = w if weighted else 1.0
            contrib[idx[d]] += r[idx[s]] * ww / out_w[idx[s]]
        dangling = r[out_w == 0].sum()
        new = p * ((1 - damping) + damping * dangling) + damping * contrib
        delta = np.abs(new - r).max()
        r = new
        if delta < tol:
            break
    return {v: float(r[idx[v]]) for v in verts}


def components_oracle(edges: list[tuple[str, str, float]]) -> dict[str, str]:
    """Weakly-connected components; label = min conv_id of the component."""
    verts = {s for s, _, _ in edges} | {d for _, d, _ in edges}
    parent = {v: v for v in verts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d, _ in edges:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    # compress to min id per component
    comp_members = defaultdict(list)
    for v in verts:
        comp_members[find(v)].append(v)
    return {v: min(members) for members in comp_members.values() for v in members}


def lpa_oracle(
    edges: list[tuple[str, str, float]], n_iter: int = 5
) -> dict[str, str]:
    """Deterministic synchronous LPA: undirected weighted neighbor tally,
    argmax weight, tie-break min label — mirrors operators/lpa.py."""
    verts = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    w = defaultdict(float)
    for s, d, wt in edges:
        if s != d:
            w[(s, d)] += wt
            w[(d, s)] += wt
    neighbors = defaultdict(set)
    for (u, v) in w:
        neighbors[u].add(v)
    labels = {v: v for v in verts}
    for _ in range(n_iter):
        new = {}
        for v in verts:
            if not neighbors[v]:
                new[v] = labels[v]
                continue
            tally = defaultdict(float)
            for u in neighbors[v]:
                tally[labels[u]] += w[(u, v)]
            best = max(tally.items(), key=lambda kv: (kv[1], [-ord(c) for c in kv[0]]))
            # tie-break min label: re-derive explicitly
            mx = max(tally.values())
            new[v] = min(l for l, t in tally.items() if t == mx)
        labels = new
    return labels


def triangles_oracle(edges: list[tuple[str, str, float]]) -> int:
    """trace(A³)/6 over the undirected simple graph."""
    verts = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    a = np.zeros((n, n), dtype=np.int64)
    for s, d, _ in edges:
        if s != d:
            a[idx[s], idx[d]] = 1
            a[idx[d], idx[s]] = 1
    return int(np.trace(a @ a @ a) // 6)


def scc_oracle(edges: list[tuple[str, str, float]]) -> dict[str, str]:
    """Iterative Tarjan SCC; label = min conv_id of the component."""
    verts = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    adj = defaultdict(list)
    for s, d, _ in edges:
        if s != d:
            adj[s].append(d)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    out = {}
    counter = [0]

    def strongconnect(root):
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            nbrs = adj.get(v, [])
            for i in range(pi, len(nbrs)):
                w = nbrs[i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                lbl = min(comp)
                for w in comp:
                    out[w] = lbl
            work.pop()
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])

    for v in verts:
        if v not in index:
            strongconnect(v)
    return out


def hits_oracle(
    edges: list[tuple[str, str, float]], n_iter: int = 10
) -> dict[str, tuple[float, float]]:
    """Kleinberg HITS, weighted, L1-normalized per half-step (matches
    operators/hits.py): returns {vertex: (hub, authority)}."""
    import numpy as np

    w: dict[tuple[str, str], float] = {}
    for u, v, x in edges:
        if u != v:
            w[(u, v)] = w.get((u, v), 0.0) + x
    verts = sorted({u for u, _ in w} | {v for _, v in w})
    if not verts:
        return {}
    idx = {v: i for i, v in enumerate(verts)}
    m = np.zeros((len(verts), len(verts)))
    for (u, v), x in w.items():
        m[idx[u], idx[v]] = x
    h = np.ones(len(verts))
    a = np.zeros(len(verts))
    for _ in range(n_iter):
        a = m.T @ h
        s = a.sum()
        a = a / s if s else np.zeros_like(a)
        h = m @ a
        s = h.sum()
        h = h / s if s else np.zeros_like(h)
    return {v: (float(h[idx[v]]), float(a[idx[v]])) for v in verts}
