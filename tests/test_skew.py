"""Skew harness: salted aggregation equivalence, heavy-vertex split,
degree diagnostics — plus property tests over seeded random graphs."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sbustreamspot_core_spark.config import GraphParams
from sbustreamspot_core_spark.graph.components import connected_components
from sbustreamspot_core_spark.graph.skew import (
    degree_histogram,
    degree_table,
    heavy_vertices,
    salted_collect,
    salted_sum,
    split_by_degree,
)
from sbustreamspot_core_spark.graph.triangles import triangle_count
from sbustreamspot_core_spark.oracles.graph_oracle import (
    connected_components_oracle,
    triangle_count_oracle,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # hot key 0 gets 5000 rows; 100 cold keys get 10 each
    rows = [(0, i, float(i % 7)) for i in range(5000)]
    rows += [(k, i, float(i)) for k in range(1, 101) for i in range(10)]
    return spark.createDataFrame(rows, "k long, v long, x double").repartition(8)


def test_salted_sum_equals_plain_sum(spark, skewed):
    plain = {r.k: r.x for r in
             skewed.groupBy("k").agg(F.sum("x").alias("x")).collect()}
    salted = {r.k: r.x for r in salted_sum(skewed, ["k"], "x").collect()}
    assert set(plain) == set(salted)
    for k in plain:
        assert salted[k] == pytest.approx(plain[k], rel=1e-12)


def test_salted_collect_equals_sorted_plain(spark, skewed):
    plain = {r.k: sorted(r.vs) for r in
             skewed.groupBy("k").agg(F.collect_list("v").alias("vs")).collect()}
    salted = {r.k: r.v for r in salted_collect(skewed, ["k"], "v").collect()}
    assert salted == plain


def test_degree_split_and_histogram(spark):
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 200)] + [(1, 2), (2, 3), (3, 4)],
        "src long, dst long")
    heavy = {r.id: r.deg for r in heavy_vertices(edges, 50, "in").collect()}
    assert heavy == {0: 199}
    light, hot = split_by_degree(edges, 50, key="dst")
    assert hot.count() == 199 and light.count() == 3
    assert light.unionByName(hot).count() == edges.count()
    hist = {r.log2_bucket: r.n_vertices
            for r in degree_histogram(edges, "in").collect()}
    assert hist[7] == 1  # the hub: floor(log2(199)) == 7


@pytest.mark.parametrize("seed", [11, 29, 47])
def test_cc_property_random_graphs(spark, seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(50, 150))
    m = int(rng.integers(n, 4 * n))
    e = sorted({(int(a), int(b)) for a, b in
                zip(rng.integers(0, n, m), rng.integers(0, n, m)) if a != b})
    df = spark.createDataFrame(e, "src long, dst long")
    params = GraphParams(num_partitions=4, max_iters=60, checkpoint_interval=6)
    got = {r.id: r.component for r in
           connected_components(spark, df, params=params).components.collect()}
    assert got == connected_components_oracle(e)
    assert triangle_count(spark, df, params) == triangle_count_oracle(e)


def test_split_by_degree_accepts_cached_degrees(spark):
    """Passing an existing degree table must produce the identical split
    (the amortization path: iterative consumers reuse the degree table
    they already built instead of paying a second edge scan)."""
    edges = spark.createDataFrame(
        [(i, 0) for i in range(50)] + [(i, i + 1) for i in range(20)],
        "src long, dst long")
    l1, h1 = split_by_degree(edges, 10, key="dst")
    deg = degree_table(edges, "in").cache()
    l2, h2 = split_by_degree(edges, 10, key="dst", degrees=deg)
    key = lambda df: {(r.src, r.dst) for r in df.collect()}
    assert key(l1) == key(l2) and key(h1) == key(h2)
    assert key(h2) == {(i, 0) for i in range(50)}
    # heavy_vertices agrees through the same seam
    hv = heavy_vertices(edges, 10, "in", degrees=deg)
    assert {r.id for r in hv.collect()} == {0}
    deg.unpersist()
