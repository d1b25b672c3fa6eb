"""LSH banding operators: candidate pairs, isolation test, LSH clusters.

Reference semantics:
- banding: cluster.cpp:23-42 (band i = sketch bits [R*i, R*i+R)).
- shared-bucket neighbors: cluster.cpp:59-74.
- isolation (anomaly) test: no band bucket occupied (cluster.cpp:44-57,
  main.cpp:723-738).
- LSH clusters: BFS connected components over the shared-bucket relation
  (main.cpp:672-721) -> Hash-Min CC on the candidate-pair graph here.

Spark shape: the all-pairs O(n^2) similarity scan is replaced by a self-equi-
join of the exploded (gid, band_idx, band_val) table — the *logical* rewrite
the reference's hash tables implement in memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def candidate_pairs(bands: DataFrame,
                    max_bucket_size: int | None = None,
                    distinct: bool = True) -> DataFrame:
    """Distinct (gid_a < gid_b) pairs sharing any (band_idx, band_val) bucket.

    Default max_bucket_size=None: this is the reference-parity relation
    (cluster.cpp:59-74) — the pipeline feeds it as the similarity prune
    (main.cpp:584-605), so every shared-bucket pair must appear, exactly as
    the reference's hash tables produce.  Pass a cap only for consumers
    where the star-reduced subset is provably sufficient: buckets above the
    cap then emit only (min-gid hub, member) pairs, which keeps connected
    components identical (``lsh_clusters`` passes the cap explicitly) but
    is NOT the full pair relation; see
    ``operators.dedup.banded_self_join_pairs``."""
    from .dedup import banded_self_join_pairs
    return banded_self_join_pairs(bands, ["band_idx", "band_val"],
                                  id_col="gid", max_bucket_size=max_bucket_size,
                                  out_a="gid_a", out_b="gid_b",
                                  distinct=distinct)


def isolated_gids(query_bands: DataFrame, table_bands: DataFrame) -> DataFrame:
    """gids from ``query_bands`` whose every band misses every bucket built
    from ``table_bands`` (left_anti per band; isolated iff zero hits)."""
    buckets = table_bands.select("band_idx", "band_val").distinct()
    hits = (
        query_bands.join(buckets, ["band_idx", "band_val"], "left_semi")
        .select("gid").distinct()
    )
    return query_bands.select("gid").distinct().join(hits, "gid", "left_anti")


def isolated_vs_others(bands: DataFrame,
                       extra_key_cols: tuple = ()) -> DataFrame:
    """gids sharing NO bucket with any *other* gid (cluster.cpp:44-57 applied
    with each graph queried against tables built from all other graphs).
    A gid is isolated iff every one of its buckets holds only itself.

    ``extra_key_cols`` scopes the bucket key AND the output grain (e.g.
    ``("win_start",)`` for the event-time streaming pipeline, where
    isolation is judged within each window independently)."""
    keys = [*extra_key_cols, "band_idx", "band_val"]
    grain = [*extra_key_cols, "gid"]
    bucket_sizes = bands.groupBy(*keys).agg(
        F.countDistinct("gid").alias("n_gids"))
    shared_hits = (
        bands.join(bucket_sizes.filter("n_gids > 1"), keys, "left_semi")
        .select(*grain).distinct()
    )
    return bands.select(*grain).distinct().join(shared_hits, grain, "left_anti")


def lsh_clusters(bands: DataFrame, components_fn) -> DataFrame:
    """(gid, lsh_cluster) — connected components over shared-bucket pairs.

    ``components_fn(edges_df, nodes_df) -> (id, component)`` is the Hash-Min
    CC job from ``graph.components`` (kept injectable to avoid an import
    cycle).  Singleton graphs keep their own gid as cluster id, matching the
    BFS in main.cpp:672-721 which emits them as singleton clusters.

    CC only consumes pair CONNECTIVITY, so the hot-bucket star reduction is
    safe here (cluster-exact) — the cap is passed explicitly.

    The derived pair graph is CACHED before the iterative job: CC's init
    scans its edge input several times (symmetrize + vertex-set union), and
    re-executing the bucket self-join per scan dominated the web-pipeline
    wall time (the same measured cache-the-derived-input lesson as
    graph/pagerank.py).  CC runs eagerly, so the cache is dropped before
    returning; recompute-on-eviction is deterministic either way.
    """
    # NOTE on distinct: CC's symmetrize de-duplicates anyway, but a pair
    # recurs once per shared band — near-identical gids share ~every band,
    # so skipping the dedup here (distinct=False) would multiply the rows
    # fed to symmetrize by up to the band count; the early distinct wins.
    pairs = candidate_pairs(bands, max_bucket_size=10_000)
    edges = pairs.select(F.col("gid_a").alias("src"),
                         F.col("gid_b").alias("dst")).cache()
    nodes = bands.select(F.col("gid").alias("id")).distinct()
    comp = components_fn(edges, nodes)
    edges.unpersist()
    return comp.select(F.col("id").alias("gid"), F.col("component").alias("lsh_cluster"))
