"""Link-graph algorithm suite vs single-node oracles.

North-rule criteria: PageRank per-vertex allclose(1e-6); CC / LPA / triangles
exact; resumable checkpoints; deterministic across parallelism.
"""

import numpy as np
import pytest

from sbustreamspot_core_spark.config import GraphParams
from sbustreamspot_core_spark.graph.components import connected_components
from sbustreamspot_core_spark.graph.labelprop import label_propagation
from sbustreamspot_core_spark.graph.pagerank import pagerank
from sbustreamspot_core_spark.graph.triangles import (
    triangle_count,
    triangle_count_per_vertex,
)
from sbustreamspot_core_spark.oracles.graph_oracle import (
    connected_components_oracle,
    label_propagation_oracle,
    pagerank_oracle,
    triangle_count_oracle,
)

# Fixed-iteration configs keep test wall-time sane: with tol=0 both the Spark
# job and the oracle run exactly max_iters supersteps and must agree to float
# error (far below the 1e-6 target).  The convergence path is exercised with
# damping=0.5, which reaches tol=1e-7 in ~25 supersteps.
PARAMS = GraphParams(num_partitions=8, checkpoint_interval=3,
                     max_iters=15, tol=0.0)
FAST_CONVERGE = GraphParams(num_partitions=8, checkpoint_interval=5,
                            damping=0.5, tol=1e-7, max_iters=60)


def synthetic_edges(n_nodes=200, n_edges=800, seed=7, hub=True):
    """Deterministic power-law-ish digraph with a mega-hub and a dangling tail."""
    rng = np.random.default_rng(seed)
    src = rng.zipf(1.6, size=n_edges) % n_nodes
    dst = rng.integers(0, n_nodes, size=n_edges)
    edges = list({(int(s), int(d)) for s, d in zip(src, dst) if s != d})
    if hub:
        # every 5th node links to the hub (node 0) -> in-degree skew
        edges += [(i, 0) for i in range(5, n_nodes, 5)]
    # a dangling chain (nodes with no out-edges) + an isolated 2-clique
    edges += [(n_nodes, n_nodes + 1), (n_nodes + 2, n_nodes + 3)]
    return sorted(set(edges))


@pytest.fixture(scope="module")
def edges(spark):
    e = synthetic_edges()
    df = spark.createDataFrame(e, "src long, dst long").repartition(8).cache()
    return e, df


def test_pagerank_allclose_vs_oracle(spark, edges):
    e, df = edges
    expect, _ = pagerank_oracle(e, damping=0.85, tol=0.0,
                                max_iters=PARAMS.max_iters)
    res = pagerank(spark, df, PARAMS)
    got = {r.id: r.rank for r in res.ranks.collect()}
    assert res.supersteps == PARAMS.max_iters
    assert set(got) == set(expect)
    for node, r in expect.items():
        assert got[node] == pytest.approx(r, abs=1e-6), node
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_convergence(spark, edges):
    e, df = edges
    expect, oracle_iters = pagerank_oracle(e, damping=0.5, tol=1e-7,
                                           max_iters=60)
    res = pagerank(spark, df, FAST_CONVERGE)
    got = {r.id: r.rank for r in res.ranks.collect()}
    assert res.converged
    assert abs(res.supersteps - oracle_iters) <= 1
    for node, r in expect.items():
        assert got[node] == pytest.approx(r, abs=1e-6), node


def test_pagerank_checkpoint_resume(spark, edges, tmp_ckpt):
    e, df = edges
    full = pagerank(spark, df, PARAMS, checkpoint_dir=tmp_ckpt, resume=False)
    expect = {r.id: r.rank for r in full.ranks.collect()}

    # simulate a crash: delete every checkpoint after the first complete one,
    # then resume — final ranks must be identical
    import os
    import shutil
    steps = sorted(
        int(d.split("=")[1]) for d in os.listdir(tmp_ckpt) if d.startswith("superstep="))
    assert len(steps) >= 2
    for k in steps[1:]:
        shutil.rmtree(os.path.join(tmp_ckpt, f"superstep={k}"))
    resumed = pagerank(spark, df, PARAMS, checkpoint_dir=tmp_ckpt, resume=True)
    got = {r.id: r.rank for r in resumed.ranks.collect()}
    for node, r in expect.items():
        assert got[node] == pytest.approx(r, abs=1e-9), node


def test_connected_components_exact(spark, edges):
    e, df = edges
    expect = connected_components_oracle(e)
    res = connected_components(spark, df, params=PARAMS)
    got = {r.id: r.component for r in res.components.collect()}
    assert res.converged
    assert got == expect
    # the isolated 2-cliques really are separate components
    assert got[202] == got[203] and got[202] != got[0]


def test_connected_components_with_isolated_nodes(spark):
    edges_df = spark.createDataFrame([(1, 2)], "src long, dst long")
    nodes_df = spark.createDataFrame([(1,), (2,), (99,)], "id long")
    res = connected_components(spark, edges_df, nodes=nodes_df, params=PARAMS)
    got = {r.id: r.component for r in res.components.collect()}
    assert got == {1: 1, 2: 1, 99: 99}


def test_small_graph_fast_path_identical(spark, edges):
    """The size-gated driver union-find emits exactly the distributed
    Hash-Min labels — including isolated nodes from ``nodes`` — and takes
    zero supersteps."""
    e, df = edges
    fast = GraphParams(num_partitions=8, checkpoint_interval=3,
                       small_graph_threshold=1_000_000)
    res = connected_components(spark, df, params=fast)
    assert res.supersteps == 0 and res.converged
    assert res.metrics[0]["mode"] == "driver_union_find"
    got = {r.id: r.component for r in res.components.collect()}
    assert got == connected_components_oracle(e)

    nodes_df = spark.createDataFrame([(1,), (2,), (99,)], "id long")
    edges_df = spark.createDataFrame([(1, 2)], "src long, dst long")
    res2 = connected_components(spark, edges_df, nodes=nodes_df, params=fast)
    assert {r.id: r.component for r in res2.components.collect()} == \
        {1: 1, 2: 1, 99: 99}
    # above the threshold the distributed path still runs
    tiny = GraphParams(num_partitions=8, checkpoint_interval=3,
                       small_graph_threshold=1)
    res3 = connected_components(spark, df, params=tiny)
    assert res3.supersteps > 0
    assert {r.id: r.component for r in res3.components.collect()} == \
        connected_components_oracle(e)


def test_label_propagation_exact(spark, edges):
    e, df = edges
    expect, _ = label_propagation_oracle(e, max_iters=PARAMS.lpa_max_iters)
    res = label_propagation(spark, df, params=PARAMS)
    got = {r.id: r.label for r in res.labels.collect()}
    assert got == expect


def test_triangle_count_exact(spark, edges):
    e, df = edges
    assert triangle_count(spark, df, PARAMS) == triangle_count_oracle(e)


def test_triangle_count_small_known(spark):
    # K4 has 4 triangles; plus a disjoint path with none
    e = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (10, 11), (11, 12)]
    df = spark.createDataFrame(e, "src long, dst long")
    assert triangle_count(spark, df, PARAMS) == 4
    per_v = {r.id: r.triangles for r in
             triangle_count_per_vertex(spark, df, PARAMS).collect()}
    assert per_v == {0: 3, 1: 3, 2: 3, 3: 3}


def test_determinism_across_partitionings(spark, edges):
    e, df = edges
    p2 = GraphParams(num_partitions=2, checkpoint_interval=4,
                     max_iters=8, tol=0.0)
    p8 = GraphParams(num_partitions=8, checkpoint_interval=4,
                     max_iters=8, tol=0.0)
    cc2 = {r.id: r.component for r in
           connected_components(spark, df, params=p2).components.collect()}
    cc8 = {r.id: r.component for r in
           connected_components(spark, df, params=p8).components.collect()}
    assert cc2 == cc8
    lp2 = {r.id: r.label for r in
           label_propagation(spark, df, params=p2).labels.collect()}
    lp8 = {r.id: r.label for r in
           label_propagation(spark, df, params=p8).labels.collect()}
    assert lp2 == lp8
    pr2 = {r.id: r.rank for r in pagerank(spark, df, p2).ranks.collect()}
    pr8 = {r.id: r.rank for r in pagerank(spark, df, p8).ranks.collect()}
    for node in pr2:
        assert pr2[node] == pytest.approx(pr8[node], abs=1e-9)
