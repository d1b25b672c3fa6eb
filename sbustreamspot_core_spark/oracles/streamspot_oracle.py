"""Single-node pure-Python StreamSpot oracle.

A faithful re-derivation (NOT a copy) of the reference's semantics, used only
as the expected-value side of pytest assertions.  Each function cites the
reference behavior it re-derives:

- shingle construction: OkBFT with K=1 (graph.cpp:80-133)
- chunking: graph.cpp:432-438
- hashmulti: hash.cpp:20-26 (via functions.hashing.hashmulti)
- sketch/projection: streamhash.cpp:22-41
- similarity: streamhash.cpp:17-20
- centroids: cluster.cpp:76-101
- distances / assignment / anomaly + incremental centroid updates:
  cluster.cpp:103-298
- LSH banding / isolation / shared-bucket BFS clusters:
  cluster.cpp:23-74, main.cpp:672-738
"""

from __future__ import annotations

import math
from collections import Counter, OrderedDict, deque

import numpy as np

from ..config import ANOMALY, UNSEEN, StreamSpotParams
from ..functions.hashing import get_string_chunks, hashmulti
from ..rng import allocate_random_bits

PI = 3.1415926535897  # param.h:22


def build_graph(edges):
    """gid-keyed adjacency: (src_id, src_type) -> ordered [(dst_id, dst_type, e_type)].

    Arrival order preserved (graph.cpp:24-37); OrderedDict mirrors the
    insertion-order iteration the sketch path relies on.
    """
    g = OrderedDict()
    for (src_id, src_type, dst_id, dst_type, e_type) in edges:
        g.setdefault((src_id, src_type), []).append((dst_id, dst_type, e_type))
    return g


def shingle_for_source(src_type: str, out_edges) -> str:
    """K=1 OkBFT shingle: ' ' + src_type + sum(e_type + dst_type) in arrival
    order (graph.cpp:96-117 with d==K cutoff at one hop)."""
    parts = [" ", src_type]
    for (_dst_id, dst_type, e_type) in out_edges:
        parts.append(e_type)
        parts.append(dst_type)
    return "".join(parts)


def shingle_vector(graph, chunk_length: int) -> Counter:
    """Per-graph bag of chunk strings (graph.cpp:80-133)."""
    sv: Counter = Counter()
    for (src_id, src_type), out_edges in graph.items():
        sh = shingle_for_source(src_type, out_edges)
        for chunk in get_string_chunks(sh, chunk_length):
            sv[chunk] += 1
    return sv


def construct_sketch(sv: Counter, H: np.ndarray):
    """(sketch bits, projection) from a shingle vector (streamhash.cpp:22-41)."""
    L = H.shape[0]
    projection = [0] * L
    for chunk, count in sv.items():
        for i in range(L):
            projection[i] += count * hashmulti(chunk, H[i])
    bits = [1 if p >= 0 else 0 for p in projection]
    return bits, projection


def similarity(bits1, bits2) -> float:
    """Fraction of equal bits (streamhash.cpp:17-20)."""
    L = len(bits1)
    return sum(1 for a, b in zip(bits1, bits2) if a == b) / L


def distance(sim: float) -> float:
    """Angular distance 1 - cos(pi * (1 - sim)) (cluster.cpp:124-126)."""
    return 1.0 - math.cos(PI * (1.0 - sim))


def centroid_sketches(projections: dict, clusters: list[list[int]]):
    """Mean member projection per cluster + sign sketch (cluster.cpp:76-101)."""
    sketches, cent_projs = [], []
    for members in clusters:
        L = len(next(iter(projections.values())))
        acc = [0.0] * L
        for gid in members:
            for l in range(L):
                acc[l] += projections[gid][l]
        acc = [v / len(members) for v in acc]
        cent_projs.append(acc)
        sketches.append([1 if v >= 0 else 0 for v in acc])
    return sketches, cent_projs


def lsh_bands(bits, B: int, R: int) -> list[int]:
    """Band i value: bits[R*i + j] contributes 2**j (cluster.cpp:29-34)."""
    return [
        sum(bits[R * i + j] << j for j in range(R))
        for i in range(B)
    ]


def lsh_clusters(sketch_bits: dict, B: int, R: int) -> list[set]:
    """Connected components of the shared-LSH-bucket relation
    (main.cpp:672-721: BFS over get_shared_bucket_graphs)."""
    tables: list[dict] = [dict() for _ in range(B)]
    for gid, bits in sketch_bits.items():
        for i, band in enumerate(lsh_bands(bits, B, R)):
            tables[i].setdefault(band, set()).add(gid)
    remaining = set(sketch_bits)
    out = []
    while remaining:
        start = min(remaining)
        comp, q = set(), deque([start])
        while q:
            g = q.popleft()
            if g in comp:
                continue
            comp.add(g)
            for i, band in enumerate(lsh_bands(sketch_bits[g], B, R)):
                for h in tables[i].get(band, ()):
                    if h not in comp:
                        q.append(h)
        out.append(comp)
        remaining -= comp
    return out


def is_isolated(bits, tables_bits: dict, B: int, R: int) -> bool:
    """Anomalous iff no band bucket is occupied (cluster.cpp:44-57)."""
    occupied = [set() for _ in range(B)]
    for _gid, obits in tables_bits.items():
        for i, band in enumerate(lsh_bands(obits, B, R)):
            occupied[i].add(band)
    return all(
        band not in occupied[i]
        for i, band in enumerate(lsh_bands(bits, B, R))
    )


class SequentialStreamSpot:
    """Per-edge sequential simulator of the reference's streaming loop
    (main.cpp:322-431 + cluster.cpp:103-298), including incremental centroid
    drift and the count-based edge cache.  Ground truth for streaming tests.
    """

    def __init__(self, params: StreamSpotParams, bootstrap_clusters, cluster_thresholds,
                 global_threshold, train_edges_by_gid):
        self.p = params
        self.H = allocate_random_bits(params.L, params.chunk_length, params.seed)
        self.graphs: dict = {}
        self.projections: dict = {}
        self.sketches: dict = {}
        self.clusters = [list(c) for c in bootstrap_clusters]
        self.cluster_thresholds = list(cluster_thresholds)
        self.global_threshold = global_threshold
        self.cluster_sizes = [len(c) for c in self.clusters]
        self.cluster_map: dict = {}
        self.anomaly_scores: dict = {}
        self.cache: deque = deque()

        for c, members in enumerate(self.clusters):
            for gid in members:
                self.cluster_map[gid] = c

        # bootstrap: bulk graphs + sketches + centroids (main.cpp:237-283)
        for gid, edges in train_edges_by_gid.items():
            self.graphs[gid] = build_graph(edges)
        for gid in sorted(train_edges_by_gid):
            sv = shingle_vector(self.graphs[gid], params.chunk_length)
            bits, proj = construct_sketch(sv, self.H)
            self.sketches[gid], self.projections[gid] = bits, proj
        self.centroid_sketches, self.centroid_projections = centroid_sketches(
            self.projections, self.clusters)
        for gid in sorted(train_edges_by_gid):
            c = self.cluster_map[gid]
            self.anomaly_scores[gid] = distance(
                similarity(self.sketches[gid], self.centroid_sketches[c]))

    def _recompute_sketch(self, gid):
        sv = shingle_vector(self.graphs[gid], self.p.chunk_length)
        bits, proj = construct_sketch(sv, self.H)
        old = self.projections.get(gid, [0] * self.p.L)
        delta = [n - o for n, o in zip(proj, old)]
        self.sketches[gid], self.projections[gid] = bits, proj
        return delta

    def process_edge(self, edge, gid):
        """One streamed test edge.  The reference updates the sketch via the
        incremental chunk-delta path (graph.cpp:262-430); a bulk recompute of
        the touched graph yields the identical projection (the invariant the
        reference itself asserts in DEBUG builds, graph.cpp:346-363), so the
        oracle recomputes."""
        p = self.p
        if p.max_num_edges is not None and len(self.cache) == p.max_num_edges:
            old_gid, old_edge = self.cache.popleft()
            self._remove_edge(old_edge, old_gid)
            if old_gid in self.graphs:
                self._recompute_sketch(old_gid)  # empty graph -> zero projection
        self.cache.append((gid, edge))
        g = self.graphs.setdefault(gid, OrderedDict())
        src_id, src_type, dst_id, dst_type, e_type = edge
        g.setdefault((src_id, src_type), []).append((dst_id, dst_type, e_type))
        delta = self._recompute_sketch(gid)
        self._update_clusters(gid, delta)

    def _remove_edge(self, edge, gid):
        """graph.cpp:39-78 semantics: remove one matching instance."""
        src_id, src_type, dst_id, dst_type, e_type = edge
        g = self.graphs[gid]
        lst = g[(src_id, src_type)]
        if len(lst) == 1:
            del g[(src_id, src_type)]
        else:
            lst.remove((dst_id, dst_type, e_type))

    def _update_clusters(self, gid, projection_delta):
        """cluster.cpp:103-298 re-derivation."""
        p = self.p
        nclusters = len(self.cluster_sizes)
        dists = [
            distance(similarity(self.sketches[gid], self.centroid_sketches[c]))
            for c in range(nclusters)
        ]
        min_distance, nearest = 5.0, -1
        for c, d in enumerate(dists):
            if d < min_distance:
                min_distance, nearest = d, c
        self.anomaly_scores[gid] = min_distance
        current = self.cluster_map.get(gid, UNSEEN)

        graph_projection = self.projections[gid]

        def remove_from(cluster):
            old_size = self.cluster_sizes[cluster]
            self.cluster_sizes[cluster] -= 1
            cp = self.centroid_projections[cluster]
            for l in range(p.L):
                cp[l] = (cp[l] * old_size -
                         (graph_projection[l] - projection_delta[l])) / (old_size - 1)
            self.centroid_sketches[cluster] = [1 if v >= 0 else 0 for v in cp]

        if min_distance > min(self.global_threshold, self.cluster_thresholds[nearest]):
            self.cluster_map[gid] = ANOMALY
            if current not in (UNSEEN, ANOMALY):
                remove_from(current)
                if current == nearest:
                    self.anomaly_scores[gid] = distance(similarity(
                        self.sketches[gid], self.centroid_sketches[current]))
        else:
            if current != nearest:
                self.cluster_map[gid] = nearest
                if current not in (UNSEEN, ANOMALY):
                    remove_from(current)
                old_size = self.cluster_sizes[nearest]
                self.cluster_sizes[nearest] += 1
                cp = self.centroid_projections[nearest]
                for l in range(p.L):
                    cp[l] = (cp[l] * old_size + graph_projection[l]) / (old_size + 1)
                self.centroid_sketches[nearest] = [1 if v >= 0 else 0 for v in cp]
                self.anomaly_scores[gid] = distance(similarity(
                    self.sketches[gid], self.centroid_sketches[nearest]))
            else:
                size = self.cluster_sizes[current]
                cp = self.centroid_projections[current]
                for l in range(p.L):
                    cp[l] += projection_delta[l] / size
                self.centroid_sketches[current] = [1 if v >= 0 else 0 for v in cp]
                self.anomaly_scores[gid] = distance(similarity(
                    self.sketches[gid], self.centroid_sketches[current]))
