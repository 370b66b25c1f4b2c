"""Orbital-ordering and DAG-topology utilities for Graph-MPS-RNN.

Reference: utils/graph/ (Fiedler-vector ordering from the exchange
matrix `fielder.py:47`, greedy max-weight path `greedy.py:4-52`,
graphml ingestion + register helpers `nxutils.py`).

The exchange matrix K_ij = ⟨ij|ji⟩ (spatial) measures orbital
entanglement; orderings that keep strongly-coupled orbitals adjacent
reduce the bond dimension the MPS-RNN needs.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "exchange_matrix",
    "fiedler_order",
    "greedy_order",
    "load_graphml",
    "dag_from_order",
]


def exchange_matrix(h2e_compressed: np.ndarray, sorb: int) -> np.ndarray:
    """Spatial-orbital exchange weights |K_ij| from spin integrals.

    K_ij = |<(2i)(2j)||(2j)(2i)>| summed over spin channels.
    """
    from pynqs_tpu.ops.integrals import h2e_element

    norb = sorb // 2
    K = np.zeros((norb, norb))
    idx = np.arange(norb)
    for si in (0, 1):
        for sj in (0, 1):
            p = 2 * idx[:, None] + si
            q = 2 * idx[None, :] + sj
            K += np.abs(h2e_element(h2e_compressed, p, q, q, p))
    np.fill_diagonal(K, 0.0)
    return K


def fiedler_order(weights: np.ndarray) -> list[int]:
    """Order spatial orbitals by the Fiedler vector of the weighted
    graph Laplacian (second-smallest eigenvector) — the reference's
    default ordering heuristic (fielder.py:47)."""
    w = np.abs(weights)
    lap = np.diag(w.sum(1)) - w
    evals, evecs = np.linalg.eigh(lap)
    fiedler = evecs[:, 1]
    return list(np.argsort(fiedler))


def greedy_order(weights: np.ndarray, start: int | None = None) -> list[int]:
    """Greedy max-weight path ordering (greedy.py:4-52)."""
    w = np.abs(weights).copy()
    n = w.shape[0]
    if start is None:
        start = int(np.unravel_index(np.argmax(w), w.shape)[0])
    order = [start]
    used = {start}
    while len(order) < n:
        last = order[-1]
        cand = [(w[last, j], j) for j in range(n) if j not in used]
        _, j = max(cand)
        order.append(j)
        used.add(j)
    return order


def load_graphml(path: str):
    """Read a networkx DiGraph .graphml (reference Fe2S2 example
    format) into a (order, preds) pair for GraphMPSRNN.

    Node ids must be integer spatial-orbital indices; the visiting
    order is a topological sort (document order preserved when valid).
    """
    import networkx as nx

    g = nx.read_graphml(path)
    nodes = [int(n) for n in g.nodes]
    relabel = {n: int(n) for n in g.nodes}
    g = nx.relabel_nodes(g, relabel)
    order = list(nx.topological_sort(g))
    edges = [(int(u), int(v)) for u, v in g.edges]
    from pynqs_tpu.models.graph_mps_rnn import graph_from_edges

    return graph_from_edges(len(nodes), edges, order)


def dag_from_order(
    order: list[int], weights: np.ndarray | None = None, max_preds: int = 2
):
    """Chain DAG along `order`, plus up to (max_preds-1) extra
    max-weight predecessor edges per site (reference nxutils
    construction capped by register count)."""
    n = len(order)
    pos = {s: t for t, s in enumerate(order)}
    edges = [(order[t - 1], order[t]) for t in range(1, n)]
    if weights is not None and max_preds > 1:
        w = np.abs(weights)
        for t in range(2, n):
            v = order[t]
            cands = sorted(
                ((w[u, v], u) for u in order[: t - 1]), reverse=True
            )
            added = 0
            for _, u in cands:
                if added >= max_preds - 1:
                    break
                if (u, v) not in edges:
                    edges.append((u, v))
                    added += 1
    from pynqs_tpu.models.graph_mps_rnn import graph_from_edges

    return graph_from_edges(n, edges, order)
