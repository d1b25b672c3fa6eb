"""Connected components via Hash-Min label propagation (north rule G1/G5).

Semantics: undirected components; each vertex's final label is the minimum
vertex id in its component (exact-match vs the union-find oracle).  This is
the DataFrame rewrite of the reference's BFS over LSH shared-bucket neighbors
(main.cpp:672-721).

Scale notes:
- messages = labels joined to the symmetrized edge table; min-aggregation is
  a partial+final hash agg, so high-degree hubs combine map-side.
- min is an order-insensitive combiner => results are partition-invariant
  (exact match across parallelism levels).
- convergence without a join: hash-min labels are non-increasing, so the
  label sum strictly decreases until fixpoint; equal sum <=> converged.
- supersteps ~ graph diameter; web graphs have small effective diameter.
  Parquet checkpoints every few supersteps truncate the plan and give resume.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import GraphParams
from .superstep import SuperstepDriver, iterative_conf


@dataclass
class ComponentsResult:
    components: DataFrame       # (id long, component long)
    supersteps: int
    converged: bool
    metrics: list[dict]


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected edge table: both directions, no self-loops, distinct."""
    fwd = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    rev = edges.select(F.col("dst").alias("a"), F.col("src").alias("b"))
    return fwd.unionByName(rev).filter("a != b").distinct()


def connected_components(spark: SparkSession, edges: DataFrame,
                         nodes: DataFrame | None = None,
                         params: GraphParams = GraphParams(),
                         checkpoint_dir: str | None = None,
                         resume: bool = True) -> ComponentsResult:
    """edges: (src long, dst long); nodes: optional (id long) to include
    isolated vertices (they become singleton components)."""
    sym = symmetrize(edges).repartition(params.num_partitions, "a").cache()
    node_ids = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
    )
    if nodes is not None:
        node_ids = node_ids.unionByName(nodes.select("id"))
    labels0 = (
        node_ids.distinct()
        .select("id", F.col("id").alias("label"))
        .repartition(params.num_partitions, "id")
    ).cache()

    prev_sum = {"value": None}

    def step(state: DataFrame, k: int):
        msgs = (
            state.join(sym.hint("shuffle_hash"), state["id"] == sym["a"])
            .select(F.col("b").alias("id"), "label")
        )
        new_state = (
            state.select("id", "label").unionByName(msgs)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
        ).cache()
        s = new_state.agg(F.sum("label").alias("s"),
                          F.count("*").alias("n")).collect()[0]
        converged = prev_sum["value"] is not None and s.s == prev_sum["value"]
        prev_sum["value"] = s.s
        return new_state, {"label_sum": s.s, "nodes": s.n, "converged": converged}

    driver = SuperstepDriver(spark, checkpoint_dir, params.checkpoint_interval)
    with iterative_conf(spark):
        result = driver.run(labels0, step, params.max_iters, resume)
    sym.unpersist()
    labels0.unpersist()
    return ComponentsResult(
        result.state.select("id", F.col("label").alias("component")),
        result.supersteps, result.converged, result.metrics)


def components_fn(spark: SparkSession, params: GraphParams = GraphParams()):
    """Adapter matching ``operators.lsh.lsh_clusters``'s injectable signature."""
    def fn(edges: DataFrame, nodes: DataFrame) -> DataFrame:
        return connected_components(spark, edges, nodes, params).components
    return fn
