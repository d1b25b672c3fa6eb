"""Exactly-once incremental dedup between SnapTables (Iceberg pattern).

The third flavor of near-duplicate detection in this repo, for the
batch-scheduled shape a warehouse actually runs (reference parallel: the
train-then-stream split of io.cpp:100-110 / main.cpp:322-431, lifted to
table scale):

- ``operators/dedup.py`` — one-shot full-corpus pass;
- ``streaming/dedup_stream.py`` — Structured Streaming micro-batches,
  exactly-once via per-epoch sink overwrite;
- **this module** — a scheduled job that consumes a *table* of documents
  incrementally: each :func:`table_dedup_step` call processes exactly the
  rows appended to the source SnapTable since the last call, joins them
  against the persisted signature index, and appends candidates — with
  the consumption cursor stored transactionally in the sinks' own
  snapshot summaries.  This is the standard Apache-Iceberg incremental
  consumption pattern (store the last-consumed source snapshot id in the
  sink table's snapshot properties; recover by comparing them), built on
  ``sources/snaptable.py`` so it runs with no Iceberg jar and no
  streaming engine.

Exactly-once protocol (every arrow is one atomic SnapTable commit)::

    source ──incremental(cursor)──> new docs
                │ build bands (new docs only — the corpus is never touched)
                │ candidates = new-new self-join  ∪  new × index bucket join
                ▼
    [1] index.append(bands,      summary={src_from, src_to})
    [2] candidates.append(pairs, summary={src_from, src_to})

The cursor is ``summary["src_to"]`` of each sink's current snapshot.  A
crash between [1] and [2] leaves the index cursor ahead of the candidates
cursor; the next step detects the gap and recomputes the missing pairs:
the batch is re-read from the SOURCE range recorded in the cursor
(signatures are deterministic given the seed), the pre-batch index is the
current index minus the batch's own ids, and [2] is re-committed.
Recovery deliberately does NOT depend on the index table's parent chain —
maintenance (``compact()``'s replace snapshot, ``vacuum()`` expiring old
snapshots) may run between the crash and the recovery and rewrite that
chain; the source range + anti-join derivation is invariant to it.  The
SnapTable read pins a concrete file manifest (a lazy plan can never
observe a concurrent append), and every commit is an atomic metadata
swap, so each source row contributes to the candidate log exactly once
regardless of where a crash lands.  Concurrent runs are safe too: each
step pins its commits to the metadata versions its cursors were read
from, so of two overlapping invocations exactly one lands and the other
raises ``CommitConflict`` (retry = a fresh step that sees the winner's
cursor).  The source must retain consumed
snapshots until their step completes (don't vacuum the source below the
last consumed range; a violated retention fails loudly in time travel,
never silently).

Scale notes: the incremental scan lists only the new files (no source
re-scan); the index side of the bucket join is a columnar scan of
``bands`` small rows/doc — at warehouse scale write the index bucketed by
(band_idx, band_key) so that join is co-located; hot buckets on either leg
take the star-reduction cap (``operators/dedup.py:banded_self_join_pairs``
contract).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators.dedup import (
    banded_self_join_pairs,
    build_dedup_index,
    incremental_lsh_candidates,
)
from ..sources.snaptable import SnapTable, is_snaptable

_BUCKET_COLS = ["band_idx", "band_key"]


def _open_or_create(path: str) -> SnapTable:
    return SnapTable(path) if is_snaptable(path) else SnapTable.create(path)


def _cursor(table: SnapTable, version: int | None = None,
            key: str = "src_to"):
    """(snapshot_entry, summary[key]) of the table's most recent snapshot
    that CARRIES a consumption cursor (a ``key`` entry in its summary);
    (None, None) for an empty table.  ``key`` is the cursor field:
    ``src_to`` for the scheduled table-to-table surface, ``epoch`` for
    the Structured-Streaming surface (dedup_stream.SnapTableDedupStream).

    Reads ONE metadata version (``version``, default current) so the
    snapshot pointer and the snapshot log can't straddle a concurrent
    commit.  Walks parent pointers past snapshots without the key in
    their summary — maintenance commits (e.g. ``compact()``'s replace
    snapshot) interleave freely with dedup steps without resetting the
    cursor."""
    meta = table.metadata(version)
    sid = meta["current_snapshot_id"]
    snaps = {s["snapshot_id"]: s for s in meta["snapshots"]}
    while sid is not None:
        snap = snaps[sid]
        if key in snap["summary"]:
            return snap, snap["summary"][key]
        sid = snap["parent_id"]
    return None, None


def _recover(spark: SparkSession, source: SnapTable, index: SnapTable,
             candidates: SnapTable, idx_snap: dict, cand_base: int, *,
             num_hashes: int, n: int, bands: int, seed: int,
             id_col: str, text_col: str,
             max_bucket_size: int | None) -> dict:
    """Re-commit the candidates for the index's latest consumed batch
    (commit [1] landed, commit [2] did not).

    The batch is rebuilt from the SOURCE range in the cursor summary —
    signatures are deterministic — and the pre-batch index is the current
    index with the batch's own ids anti-joined out.  Recovery must NOT
    walk the index's parent chain: maintenance interleaving with the
    crash window rewrites it (a ``compact()`` replace snapshot inherits
    the cursor but holds the whole corpus, and ``vacuum()`` may null the
    crashed append's parent), which would make a chain-based recovery
    silently commit zero or duplicate pairs."""
    src_from = idx_snap["summary"].get("src_from")
    src_to = idx_snap["summary"]["src_to"]
    if src_from is None:
        new_docs = source.read(spark, snapshot_id=src_to)
    else:
        new_docs = source.incremental(spark, from_snapshot_id=src_from,
                                      to_snapshot_id=src_to)
    new_bands = build_dedup_index(new_docs, num_hashes=num_hashes, n=n,
                                  bands=bands, seed=seed, id_col=id_col,
                                  text_col=text_col).cache()
    pairs = None
    try:
        if src_from is None:
            pairs = banded_self_join_pairs(new_bands, _BUCKET_COLS,
                                           max_bucket_size=max_bucket_size)
        else:
            new_ids = new_bands.select("id").distinct()
            prior = index.read(spark).join(new_ids, "id", "left_anti")
            pairs = incremental_lsh_candidates(
                prior, new_bands, max_bucket_size=max_bucket_size)
        pairs = pairs.cache()
        n_pairs = pairs.count()
        summary = {"src_from": src_from, "src_to": src_to,
                   "pairs": n_pairs, "recovered": True}
        candidates.append(pairs, summary=summary, base=cand_base)
    finally:
        # CommitConflict (a concurrent runner won) is an expected exit:
        # without the finally, each lost race would pin two cached
        # DataFrames in executor storage for the session's lifetime
        new_bands.unpersist()
        if pairs is not None:
            pairs.unpersist()
    return {"status": "recovered", **summary}


def table_dedup_step(spark: SparkSession, source_path: str, index_path: str,
                     candidates_path: str, *, num_hashes: int = 64,
                     n: int = 5, bands: int = 16, seed: int = 23,
                     id_col: str = "doc_id", text_col: str = "text",
                     max_bucket_size: int | None = None) -> dict:
    """Process every source append since the last call; see module doc.

    Returns a summary dict: ``status`` is ``up_to_date`` (nothing new),
    ``recovered`` (a crashed step's candidates were re-committed — call
    again to consume any new source rows), or ``ok`` with the consumed
    snapshot range and counts.  Doc ids must be globally unique across the
    source's lifetime (the incremental-candidates contract).
    """
    source = SnapTable(source_path)
    index = _open_or_create(index_path)
    candidates = _open_or_create(candidates_path)

    # pin every commit below to the metadata versions the cursors were
    # READ from: two overlapping step invocations both observe the same
    # cursor, but only the first's append lands — the second raises
    # CommitConflict instead of silently double-appending the batch's
    # bands and pairs (SnapTable rebases to current_version() otherwise)
    idx_base = index.current_version()
    cand_base = candidates.current_version()
    idx_snap, idx_to = _cursor(index, idx_base)
    _, cand_to = _cursor(candidates, cand_base)
    if idx_snap is not None and idx_to != cand_to:
        return _recover(spark, source, index, candidates, idx_snap,
                        cand_base,
                        num_hashes=num_hashes, n=n, bands=bands, seed=seed,
                        id_col=id_col, text_col=text_col,
                        max_bucket_size=max_bucket_size)

    src_to = source.current_snapshot_id()
    if src_to == idx_to or src_to is None:
        return {"status": "up_to_date", "src_to": src_to}

    if idx_to is None:
        new_docs = source.read(spark, snapshot_id=src_to)
    else:
        new_docs = source.incremental(spark, from_snapshot_id=idx_to,
                                      to_snapshot_id=src_to)
    new_bands = build_dedup_index(new_docs, num_hashes=num_hashes, n=n,
                                  bands=bands, seed=seed, id_col=id_col,
                                  text_col=text_col).cache()
    pairs = None
    try:
        if idx_snap is None:
            pairs = banded_self_join_pairs(new_bands, _BUCKET_COLS,
                                           max_bucket_size=max_bucket_size)
        else:
            pairs = incremental_lsh_candidates(
                index.read(spark), new_bands,
                max_bucket_size=max_bucket_size)
        pairs = pairs.cache()
        n_pairs = pairs.count()              # materialize before commit [1]
        n_band_rows = new_bands.count()

        summary = {"src_from": idx_to, "src_to": src_to}
        index.append(new_bands,
                     summary={**summary, "band_rows": n_band_rows},
                     base=idx_base)
        candidates.append(pairs, summary={**summary, "pairs": n_pairs},
                          base=cand_base)
    finally:
        # expected exits include CommitConflict from an overlapping run —
        # the caches must not outlive the step either way
        new_bands.unpersist()
        if pairs is not None:
            pairs.unpersist()
    return {"status": "ok", **summary, "pairs": n_pairs,
            "band_rows": n_band_rows, "new_docs": n_band_rows // bands}
