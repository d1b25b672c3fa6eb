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
    components identical but is NOT the full pair relation; see
    ``operators.dedup.banded_self_join_pairs``.  Pure-connectivity
    consumers should use ``bucket_star_edges`` instead (``lsh_clusters``
    does) — O(rows) with no hot-key broadcast at all."""
    from .dedup import banded_self_join_pairs
    return banded_self_join_pairs(bands, ["band_idx", "band_val"],
                                  id_col="gid", max_bucket_size=max_bucket_size,
                                  out_a="gid_a", out_b="gid_b",
                                  distinct=distinct)


def bucket_star_edges(bands: DataFrame,
                      bucket_cols: list | None = None,
                      id_col: str = "gid") -> DataFrame:
    """(src, dst) star edges per bucket: every member linked to its
    bucket's min id — the connectivity-exact O(rows) pair graph for CC.

    The full co-bucket pair relation is quadratic per bucket (B
    near-identical members -> B^2/2 pairs through ONE task, since a
    same-key self-join cannot be split), but connected components only
    need each bucket to be CONNECTED, not complete — a star to the
    bucket minimum yields provably identical components.  One partial+
    final min-aggregation plus one co-partitioned join (both sides hash
    on the bucket key, no broadcast of any bucket list), so the pair
    graph is O(band rows) at any corpus size or duplication level —
    unlike the capped self-join, whose hot-key broadcast assumes hot
    buckets are rare.  This is also Hash-Min's own first superstep
    collapsed into the graph construction."""
    cols = bucket_cols or ["band_idx", "band_val"]
    hub = bands.groupBy(*cols).agg(F.min(id_col).alias("src"))
    return (bands.join(hub, cols)
            .filter(F.col(id_col) != F.col("src"))
            .select("src", F.col(id_col).alias("dst"))
            .distinct())


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
    isolation is judged within each window independently).

    Round-7 shape (guide §2.4): isolated(gid) <=> the LARGEST bucket the
    gid occupies holds only itself, so one bucket-size aggregation, one
    join of the sizes back onto the band table (AQE broadcasts the size
    table when it is small, shuffles when not) and one max-per-gid
    aggregation replace the former semi-join + two distincts + anti-join
    chain (5 exchanges -> 2-3, and no anti-join pass)."""
    keys = [*extra_key_cols, "band_idx", "band_val"]
    grain = [*extra_key_cols, "gid"]
    bucket_sizes = bands.groupBy(*keys).agg(
        F.countDistinct("gid").alias("n_gids"))
    return (
        bands.join(bucket_sizes, keys)
        .groupBy(*grain).agg(F.max("n_gids").alias("_mx"))
        .filter("_mx = 1")
        .select(*grain)
    )


def lsh_clusters(bands: DataFrame, components_fn) -> DataFrame:
    """(gid, lsh_cluster) — connected components over shared-bucket pairs.

    ``components_fn(edges_df, nodes_df) -> (id, component)`` is the Hash-Min
    CC job from ``graph.components`` (kept injectable to avoid an import
    cycle).  Singleton graphs keep their own gid as cluster id, matching the
    BFS in main.cpp:672-721 which emits them as singleton clusters.

    CC only consumes pair CONNECTIVITY, so the pair graph is the per-bucket
    STAR relation (``bucket_star_edges``): components identical to the full
    co-bucket self-join's, but O(band rows) instead of quadratic in bucket
    size — a corpus of B near-identical gids feeds CC ~B edges, not B^2/2
    (measured 79,800 -> ~400 on the 400-host web bench, where every host
    shares every bucket).

    The derived pair graph is CACHED before the iterative job: CC's init
    scans its edge input several times (symmetrize + vertex-set union), and
    re-executing the bucket join per scan dominated the web-pipeline
    wall time (the same measured cache-the-derived-input lesson as
    graph/pagerank.py).  CC runs eagerly, so the cache is dropped before
    returning; recompute-on-eviction is deterministic either way.
    """
    edges = bucket_star_edges(bands).cache()
    nodes = bands.select(F.col("gid").alias("id")).distinct()
    comp = components_fn(edges, nodes)
    edges.unpersist()
    return comp.select(F.col("id").alias("gid"), F.col("component").alias("lsh_cluster"))
