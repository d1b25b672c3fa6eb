"""PageRank as an iterative DataFrame job (north rule G4).

Semantics (matched by ``oracles.graph_oracle.pagerank_oracle`` to 1e-6):
power iteration with damping ``d`` and dangling-mass redistribution:

    r'(v) = (1-d)/N + d * (sum_{u->v} r(u)/outdeg(u) + dangling/N)

Scale design (100 TB / 10^12-edge mindset, tested at local scale):
- Adjacency is built ONCE into CSR-style blocks: (src, deg, targets[]) rows,
  with heavy out-degree vertices split into blocks of ``csr_block_size``
  targets (out-degree skew cap: one mega-hub's fan-out is spread over many
  rows/partitions instead of one giant task).
- Per superstep there is exactly ONE shuffle: explode contributions and
  groupBy(dst).  The rank join against the adjacency reuses the hash
  partitioning of both sides (both are hash-partitioned on the vertex key
  with the same partition count), and the contribution aggregation is a
  partial+final hash agg, so in-degree skew (mega-hub *inbound* links) is
  absorbed by map-side combine before the shuffle.
- Dangling mass and the convergence delta are computed in the SAME single
  action per superstep (one driver barrier), with the dangling sum for
  superstep k+1 taken from superstep k's output.
- Lineage-plan blowup is cut by the SuperstepDriver's parquet checkpoints,
  which double as the resume point.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import GraphParams
from .superstep import SuperstepDriver, SuperstepResult, iterative_conf


@dataclass
class PageRankResult:
    ranks: DataFrame            # (id long, rank double)
    supersteps: int
    converged: bool
    metrics: list[dict]


def build_links(edges: DataFrame, params: GraphParams) -> DataFrame:
    """CSR-blocked adjacency: (src, deg, targets array<long>) with ~
    ``csr_block_size`` targets per block; ``deg`` is the full out-degree.

    Blocking happens BEFORE the list aggregation: heavy sources (out-degree >
    block size — a tiny, broadcastable set even on power-law web graphs) get a
    block id hashed from the target, so no single aggregation buffer ever
    holds more than ~one block of targets and a 10^8-out-degree mega-hub is
    spread across many groups/partitions instead of one giant task buffer.
    Light sources skip the join entirely (one block, deg = size(targets)).
    """
    bs = params.csr_block_size
    e = edges.select("src", "dst")
    if not params.edges_distinct:
        e = e.distinct()
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    heavy = deg.filter(F.col("deg") > bs)          # O(#hubs) rows: broadcast
    e2 = e.join(F.broadcast(heavy), "src", "left")
    nblk = F.coalesce(F.ceil(F.col("deg") / bs).cast("int"), F.lit(1))
    blocked = (
        e2.withColumn("blk", F.pmod(F.xxhash64("dst"), nblk))
        .groupBy("src", "blk")
        .agg(F.collect_list("dst").alias("targets"),
             F.first("deg").alias("heavy_deg"))
    )
    return (
        blocked.select(
            "src",
            F.coalesce("heavy_deg", F.size("targets").cast("long")).alias("deg"),
            "targets")
        .repartition(params.num_partitions, "src")
    )


def init_ranks(edges: DataFrame, params: GraphParams) -> tuple[DataFrame, int]:
    """(id, rank, deg) for every vertex; deg = out-degree (0 => dangling)."""
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    e = edges.select("src", "dst")
    if not params.edges_distinct:
        e = e.distinct()
    degs = e.groupBy(
        F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    n = nodes.count()
    ranks = (
        nodes.join(degs, "id", "left")
        .select("id", F.lit(1.0 / n).alias("rank"),
                F.coalesce("deg", F.lit(0)).alias("deg"))
        .repartition(params.num_partitions, "id")
    )
    return ranks, n


def pagerank(spark: SparkSession, edges: DataFrame,
             params: GraphParams = GraphParams(),
             checkpoint_dir: str | None = None,
             resume: bool = True,
             lineage_table: str | None = None) -> PageRankResult:
    """edges: (src long, dst long).  Returns per-vertex ranks summing to 1.

    ``edges`` is scanned several times during init (adjacency build, vertex
    set, out-degrees); pass a cached/materialized DataFrame when it is a
    derived plan (e.g. the href-extraction pipeline) — an uncached UDF
    plan re-executes per scan (measured 3.4x slower on the 200k-page web
    demo)."""
    links = build_links(edges, params).cache()
    ranks0, n = init_ranks(edges, params)
    ranks0 = ranks0.cache()   # early supersteps reference the state 2-3x;
    # without this the distinct/join init pipeline is re-derived each time
    d = params.damping

    # state schema: (id, rank, deg); dangling sum for the NEXT superstep is
    # carried on the driver, seeded from the initial state.
    dangling_holder = {"value": None}

    def seed_dangling(state: DataFrame) -> float:
        return state.filter("deg = 0").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0))).collect()[0][0]

    def step(state: DataFrame, k: int):
        if dangling_holder["value"] is None:
            dangling_holder["value"] = seed_dangling(state)
        dangling = dangling_holder["value"]
        targets_only = links.select("src", "targets")  # deg already in state
        # shuffle_hash hints: both joins are co-partitioned on the vertex
        # key, so a hash join per partition needs no exchange and no sort
        contribs = (
            state.filter("deg > 0")
            .join(targets_only.hint("shuffle_hash"),
                  state["id"] == targets_only["src"])
            .select(F.explode("targets").alias("id"),
                    (F.col("rank") / F.col("deg")).alias("w"))
            .groupBy("id")
            .agg(F.sum("w").alias("contrib"))
        )
        new_state = (
            state.join(contribs.hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                (F.lit((1.0 - d) / n)
                 + d * (F.coalesce("contrib", F.lit(0.0)) + F.lit(dangling / n))
                 ).alias("rank"),
                "deg",
                F.col("rank").alias("prev_rank"),
            )
        ).cache()
        stats = new_state.agg(
            F.max(F.abs(F.col("rank") - F.col("prev_rank"))).alias("delta"),
            F.sum(F.when(F.col("deg") == 0, F.col("rank"))
                  .otherwise(F.lit(0.0))).alias("dangling"),
            F.sum("rank").alias("total"),
        ).collect()[0]
        dangling_holder["value"] = stats.dangling
        metrics = {
            "delta": stats.delta,
            "total_rank": stats.total,
            "converged": stats.delta < params.tol,
        }
        # keep prev_rank in the state (dropping would derive a new uncached
        # plan and break the driver's unpersist bookkeeping)
        return new_state, metrics

    driver = SuperstepDriver(spark, checkpoint_dir, params.checkpoint_interval,
                             lineage_table=lineage_table)
    if resume and checkpoint_dir and driver.last_complete_superstep() is not None:
        dangling_holder["value"] = None  # recomputed from the checkpointed state
    with iterative_conf(spark):
        result: SuperstepResult = driver.run(ranks0, step, params.max_iters, resume)
    links.unpersist()
    ranks0.unpersist()
    return PageRankResult(
        result.state.select("id", "rank"),
        result.supersteps, result.converged, result.metrics)
