"""Pure-numpy HNSW — Hierarchical Navigable Small World graphs.

Implements the algorithm of Malkov & Yashunin (arXiv:1603.09320) with
no native dependency, completing Voyager parity (Voyager is Spotify's
HNSW library; scio-extra voyager/syntax/SCollectionSyntax.scala:47-215
``asVoyagerSideInput`` → per-element lookup) without the hnswlib
import gate similarity.cosine_topk_hnsw used to carry.

Design notes, Spark-first:

- The index is a SIDE INPUT by contract, exactly like scio's Annoy and
  Voyager side inputs: built once from a bounded corpus collect,
  broadcast to every executor, probed per Arrow batch. Corpus-scale
  similarity belongs to the LSH/IVF paths, which never collect.
- Vectors are pre-normalized by contract ⇒ cosine similarity = dot
  product; all "distances" here are similarities (bigger is better).
- Build is insertion-order deterministic for a fixed seed (level draws
  come from a seeded RandomState), so a broadcast index is
  reproducible from the same collected rows.
- ``_repair_connectivity`` guarantees every node is reachable from the
  entry point at layer 0 (hnswlib keeps the graph connected via its
  pruning heuristic + keepPrunedConnections; we repair explicitly).
  Consequence: a beam search with ``ef >= n`` visits EVERY node, so
  the exhaustive regime is provably exact — that is what lets the
  ann_hnsw contract query be value-oracled against exact top-k SQL
  while still exercising the real graph walk (the same
  exact-regime-for-the-oracle pattern as q_ann_ivf's
  n_probe = n_clusters).
- Per-expansion neighbor similarities are computed as one numpy GEMV
  (``mat[neigh] @ q``), so the Python loop runs per *visited node*,
  not per edge. Build throughput is ~10-20k vectors/s at dim 64 on
  one core — fine for side-input-sized corpora (the guard caps it),
  not for corpus-scale indexing (use IVF's persisted index there).

Tests: tests/test_hnsw.py — recall >= 0.9 at ef=64 vs brute force on a
2000x64 corpus, exhaustive-regime == exact equivalence, connectivity
repair on adversarially clustered data, determinism.
"""

from __future__ import annotations

import heapq

import numpy as np


class HnswIndex:
    """Frozen HNSW graph: ``adj[level][node] -> list[int] neighbors``,
    plus the entry point and its level. Picklable (plain python + the
    corpus matrix), hence broadcastable."""

    __slots__ = ("mat", "adj", "entry", "top", "m", "_reach")

    def __init__(self, mat, adj, entry, top, m):
        self.mat = mat
        self.adj = adj
        self.entry = entry
        self.top = top
        self.m = m
        self._reach = None

    @property
    def n(self) -> int:
        return self.mat.shape[0]

    def reachable(self) -> np.ndarray:
        """Row indices reachable from the entry at layer 0 (cached).
        After _repair_connectivity this is every row; computed rather
        than assumed so the exhaustive-search shortcut stays honest."""
        if self._reach is None:
            seen = {self.entry}
            stack = [self.entry]
            while stack:
                c = stack.pop()
                for v in self.adj[0].get(c, ()):
                    if v not in seen:
                        seen.add(v)
                        stack.append(v)
            self._reach = np.fromiter(seen, np.int64, len(seen))
            self._reach.sort()
        return self._reach


def _search_layer(mat, adj_l, q, eps, ef):
    """Beam search within one layer, similarities not distances.
    ``eps``: entry node list. Returns [(sim, node)] sorted desc, len<=ef."""
    sims = mat[eps] @ q
    visited = set(eps)
    cand = [(-float(s), e) for s, e in zip(sims, eps)]  # max-heap via neg
    heapq.heapify(cand)
    res = [(float(s), e) for s, e in zip(sims, eps)]  # min-heap on sim
    heapq.heapify(res)
    while len(res) > ef:
        heapq.heappop(res)
    while cand:
        negs, c = heapq.heappop(cand)
        if -negs < res[0][0] and len(res) >= ef:
            break
        neigh = [v for v in adj_l.get(c, ()) if v not in visited]
        if not neigh:
            continue
        visited.update(neigh)
        ns = mat[neigh] @ q
        for s, v in zip(ns, neigh):
            s = float(s)
            if len(res) < ef or s > res[0][0]:
                heapq.heappush(cand, (-s, v))
                heapq.heappush(res, (s, v))
                if len(res) > ef:
                    heapq.heappop(res)
    # score DESC, row id ASC on ties — matches the exhaustive GEMM
    # shortcut (np.lexsort) and the search_hnsw contract, so both
    # regimes rank exact-score ties identically.
    return sorted(res, key=lambda t: (-t[0], t[1]))


def _repair_connectivity(mat, adj0, entry):
    """Make every node reachable from ``entry`` at layer 0: BFS, then
    bridge each unreached component to its exact nearest reached node
    (bidirectional edge, never pruned — one extra edge per component)."""
    n = mat.shape[0]
    reached = np.zeros(n, bool)

    def bfs(start):
        stack = [start]
        reached[start] = True
        while stack:
            c = stack.pop()
            for v in adj0.get(c, ()):
                if not reached[v]:
                    reached[v] = True
                    stack.append(v)

    bfs(entry)
    while not reached.all():
        u = int(np.flatnonzero(~reached)[0])
        pool = np.flatnonzero(reached)
        best = int(pool[np.argmax(mat[pool] @ mat[u])])
        adj0.setdefault(u, []).append(best)
        adj0.setdefault(best, []).append(u)
        bfs(u)


def build_hnsw(
    mat: np.ndarray,
    m: int = 16,
    ef_construction: int = 200,
    seed: int = 13,
) -> HnswIndex:
    """Build the layered graph over ``mat`` (n, dim), rows pre-normalized.
    Levels ~ floor(-ln(U) / ln(m)); layer 0 allows 2m neighbors, upper
    layers m (the paper's Mmax0/Mmax). Neighbor selection is simple
    top-M by similarity (the paper's SELECT-SIMPLE; the diversity
    heuristic matters for strongly clustered data, which the
    connectivity repair covers here)."""
    mat = np.ascontiguousarray(mat, np.float64)
    n = mat.shape[0]
    if n == 0:
        raise ValueError("HNSW: empty corpus")
    rng = np.random.RandomState(seed)
    levels = (-np.log(rng.uniform(1e-12, 1.0, n)) / np.log(m)).astype(np.int64)
    entry, top = 0, int(levels[0])
    adj: list[dict[int, list[int]]] = [{0: []} for _ in range(top + 1)]
    for i in range(1, n):
        li = int(levels[i])
        q = mat[i]
        eps = [entry]
        for lc in range(top, li, -1):
            eps = [_search_layer(mat, adj[lc], q, eps, 1)[0][1]]
        for lc in range(min(li, top), -1, -1):
            found = _search_layer(mat, adj[lc], q, eps, ef_construction)
            mmax = 2 * m if lc == 0 else m
            neigh = [v for _, v in found[:m]]
            adj[lc][i] = list(neigh)
            for v in neigh:
                lst = adj[lc].setdefault(v, [])
                lst.append(i)
                if len(lst) > mmax:
                    keep = np.argsort(-(mat[lst] @ mat[v]), kind="stable")
                    adj[lc][v] = [lst[j] for j in keep[:mmax]]
            eps = [v for _, v in found]
        if li > top:
            adj.extend({i: []} for _ in range(li - top))
            entry, top = i, li
    _repair_connectivity(mat, adj[0], entry)
    return HnswIndex(mat, adj, entry, top, m)


def search_hnsw(index: HnswIndex, q: np.ndarray, k: int, ef: int = 64):
    """Top-k rows of the index for query ``q``: greedy descent through
    the upper layers, then an ef-beam at layer 0. Returns [(sim, row)]
    sorted desc (ties by row asc).

    ``ef >= index.n``: the beam never prunes (|res| < ef until every
    reachable node is in it), so the result is provably exact top-k
    over the layer-0 reachable set — computed here as one GEMM over
    ``index.reachable()`` instead of a per-query Python walk (identical
    output, ~50x faster; the walk itself is what the ef < n regime and
    its recall tests exercise)."""
    q = np.asarray(q, np.float64)
    if ef >= index.n:
        reach = index.reachable()
        sims = index.mat[reach] @ q
        order = np.lexsort((reach, -sims))[:k]
        return [(float(sims[j]), int(reach[j])) for j in order]
    eps = [index.entry]
    for lc in range(index.top, 0, -1):
        eps = [_search_layer(index.mat, index.adj[lc], q, eps, 1)[0][1]]
    res = _search_layer(index.mat, index.adj[0], q, eps, max(ef, k))
    return res[:k]
