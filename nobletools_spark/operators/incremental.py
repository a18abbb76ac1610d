"""Incremental KG maintenance: re-annotate only changed documents.

At 10^12-document scale the matcher stage dominates pipeline cost, and a
daily corpus snapshot touches a tiny fraction of rows. The reference
re-processes whatever directory it is pointed at (NobleCoder batch mode,
coder/NobleCoder.java process-all loop); this module is the
beyond-reference piece a production KG needs: maintain the mention table
across snapshots by fingerprinting document CONTENT and re-running the
expensive annotate stage only where content actually changed.

Semantics (the contract every test pins):

    incremental_mentions(new_docs, old_fp, old_mentions, annotate_fn)
        ==  annotate_fn(new_docs)          (as a row multiset)

- *new* docs (id absent from ``old_fp``) and *changed* docs (fingerprint
  differs) go through ``annotate_fn``;
- *unchanged* docs carry their ``old_mentions`` rows forward untouched —
  the matcher never sees them;
- *deleted* docs (id absent from ``new_docs``) contribute nothing — their
  old mentions drop out via the inner carry-forward join.

Fingerprints cover the FULL ordered span sequence (kind, text,
media_ref, offset) — the north-rule per-row invariant — via a canonical
JSON rendering, so a span edit, reorder, kind flip, or media swap all
change the fingerprint. JSON (not a raw struct hash) because Spark's
hash expressions skip NULL fields, which would let
(text=NULL, media_ref='x') collide with (text='x', media_ref=NULL).

Scale shape: everything here is metadata-priced. ``old_fp`` is
(doc_id, 8-byte fp); the tag join shuffles the new corpus once on
doc_id (co-located and shuffle-free if both snapshot tables are
bucketed by doc_id, the recommended layout); the carry-forward join
shuffles the old mention table once against the skinny unchanged-id
set. Both are a rounding error next to re-running the matcher over
10^12 unchanged documents. ``h64`` keeps fingerprints replayable by
the DuckDB oracle; swap ``hash_fn=F.xxhash64``-style builders on a real
cluster (same plan shape, ~3x cheaper).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, functions as F

from nobletools_spark.functions.hashing import h64

__all__ = [
    "fingerprint_col",
    "doc_fingerprints",
    "incremental_mentions",
    "incremental_update",
    "incremental_cooccurrence",
    "increment_stats",
    "snapshot_diff",
]

def _netstring(c: Column) -> Column:
    """Length-prefixed rendering (``<len>:<bytes>``): self-delimiting,
    so concatenated parts cannot alias each other no matter what bytes
    the values contain — the injection-proof alternative to a reserved
    separator character. NULL renders as the bare marker ``N`` (no
    length prefix, so it cannot collide with any netstring)."""
    return F.coalesce(
        F.concat(F.length(c).cast("string"), F.lit(":"), c), F.lit("N"))


def fingerprint_col(df: DataFrame, id_col: str = "doc_id",
                    content_cols: tuple[str, ...] | None = None,
                    hash_fn: Callable[[Column], Column] = h64) -> Column:
    """Content-fingerprint COLUMN over ``df``'s content columns (default:
    every column except ``id_col``, in schema order — deterministic).

    Complex columns render through ``to_json`` (canonical field order,
    NULL fields dropped BY NAME so they cannot alias a neighboring
    field); atomic columns cast to string. Every part — column name and
    value alike — is length-prefixed (netstring), so no value bytes can
    imitate a boundary and two different row contents cannot render to
    the same string. The result is a pure function of content —
    independent of partitioning, row order, and engine."""
    if content_cols is None:
        content_cols = tuple(c for c in df.columns if c != id_col)
    if not content_cols:
        raise ValueError("fingerprint_col: no content columns")
    parts = []
    for c in content_cols:
        dt = df.schema[c].dataType.typeName()
        rendered = (F.to_json(F.col(c)) if dt in ("struct", "array", "map")
                    else F.col(c).cast("string"))
        parts.append(_netstring(F.lit(c)))
        parts.append(_netstring(rendered))
    return hash_fn(F.concat(*parts))


def doc_fingerprints(docs: DataFrame, id_col: str = "doc_id",
                     content_cols: tuple[str, ...] | None = None,
                     hash_fn: Callable[[Column], Column] = h64) -> DataFrame:
    """(doc_id, fp) snapshot-state table — persist this next to the
    mention table after every run; it is the prior state
    ``incremental_mentions`` consumes on the next snapshot."""
    return docs.select(
        F.col(id_col).alias(id_col),
        fingerprint_col(docs, id_col, content_cols, hash_fn).alias("fp"))


def _tagged(new_docs: DataFrame, old_fp: DataFrame, id_col: str,
            content_cols: tuple[str, ...] | None,
            hash_fn: Callable[[Column], Column]) -> DataFrame:
    """new_docs + ``_is_changed`` (new-or-content-differs) via ONE left
    join against the skinny (doc_id, fp) state table."""
    fp = fingerprint_col(new_docs, id_col, content_cols, hash_fn)
    old = old_fp.select(F.col(id_col), F.col("fp").alias("_old_fp"))
    return (new_docs.withColumn("_fp", fp)
            .join(old, id_col, "left")
            .withColumn("_is_changed",
                        F.col("_old_fp").isNull()
                        | (F.col("_fp") != F.col("_old_fp"))))


def incremental_update(new_docs: DataFrame, old_fp: DataFrame,
                       old_mentions: DataFrame,
                       annotate_fn: Callable[[DataFrame], DataFrame],
                       id_col: str = "doc_id",
                       content_cols: tuple[str, ...] | None = None,
                       hash_fn: Callable[[Column], Column] = h64) \
        -> tuple[DataFrame, DataFrame, DataFrame]:
    """The incremental annotate stage plus its row deltas:
    ``(mentions, removed, added)`` where ``mentions`` is the maintained
    table (≡ a full re-annotate, see module doc), ``removed`` is the
    OLD rows that left it (changed docs' stale rows + deleted docs'
    rows) and ``added`` is the fresh rows that entered it (changed +
    new docs). The deltas feed downstream delta aggregation
    (``incremental_cooccurrence``) — they are increment-sized, not
    corpus-sized. ``annotate_fn`` maps a docs frame to mention rows
    with ``old_mentions``'s schema; it only ever receives the
    changed/new subset."""
    tagged = _tagged(new_docs, old_fp, id_col, content_cols, hash_fn)
    changed = (tagged.filter("_is_changed")
               .drop("_fp", "_old_fp", "_is_changed"))
    unchanged_ids = tagged.filter(~F.col("_is_changed")).select(id_col)
    fresh = annotate_fn(changed)
    # inner join: changed docs were dropped from unchanged_ids (their
    # stale rows are replaced by `fresh`), deleted docs are simply
    # absent — no tombstone bookkeeping needed
    carried = old_mentions.join(unchanged_ids, id_col)
    removed = old_mentions.join(unchanged_ids, id_col, "left_anti")
    return (fresh.unionByName(carried.select(*fresh.columns)),
            removed, fresh)


def incremental_mentions(new_docs: DataFrame, old_fp: DataFrame,
                         old_mentions: DataFrame,
                         annotate_fn: Callable[[DataFrame], DataFrame],
                         id_col: str = "doc_id",
                         content_cols: tuple[str, ...] | None = None,
                         hash_fn: Callable[[Column], Column] = h64) \
        -> DataFrame:
    """``incremental_update`` without the deltas (see above)."""
    return incremental_update(new_docs, old_fp, old_mentions,
                              annotate_fn, id_col, content_cols,
                              hash_fn)[0]


def incremental_cooccurrence(old_cooc: DataFrame, removed: DataFrame,
                             added: DataFrame,
                             salt_buckets: int = 0) -> DataFrame:
    """Delta-maintain the co-occurrence triple table
    (operators/triples.cooccurrence_triples output). ``n_docs`` is a
    sum over documents, so it is linearly decomposable:

        new = old − pairs(removed docs' old mentions)
                  + pairs(added docs' new mentions)

    A changed doc appears in BOTH deltas; pairs it kept cancel exactly
    (−1 + 1), pairs it lost/gained adjust by one. Pairs whose count
    reaches 0 drop out. At 10^12 documents this replaces the
    corpus-wide pair aggregation with one over (concept-pair table +
    increment-sized deltas) — the classic incremental-view-maintenance
    shape for distributive aggregates. Equivalence to the full
    recompute is oracle-checked (kg_incremental_cooc) and test-pinned.

    ``removed``/``added`` must be the FULL old/new mention rows of
    departing/arriving docs (``incremental_update``'s deltas): per-doc
    pair sets are derived here, so partial rows would under-count."""
    from nobletools_spark.operators.triples import cooccurrence_triples

    # cache=False: this runs once per snapshot in a long-lived driver —
    # session-lifetime cache entries would accumulate per increment,
    # and the delta frames are increment-sized (usually parquet-backed)
    neg = (cooccurrence_triples(removed, salt_buckets, cache=False)
           .withColumn("n_docs", -F.col("n_docs")))
    pos = cooccurrence_triples(added, salt_buckets, cache=False)
    return (old_cooc.unionByName(neg).unionByName(pos)
            .groupBy("subj", "pred", "obj")
            .agg(F.sum("n_docs").cast("long").alias("n_docs"))
            .filter(F.col("n_docs") > 0))


def increment_stats(new_docs: DataFrame, old_fp: DataFrame,
                    id_col: str = "doc_id",
                    content_cols: tuple[str, ...] | None = None,
                    hash_fn: Callable[[Column], Column] = h64) -> DataFrame:
    """One-row (n_new, n_changed, n_unchanged, n_deleted) audit frame —
    the lineage/metrics companion: log it per snapshot so an
    unexpectedly large n_changed (a fingerprint bug, an upstream
    re-encode) is caught before it burns a full-corpus matcher run."""
    tagged = _tagged(new_docs, old_fp, id_col, content_cols, hash_fn)
    # coalesce: SUM over zero rows is NULL — an all-deleted snapshot
    # must report 0s, not NULLs that defeat downstream `> limit` alarms
    counts = tagged.agg(
        F.coalesce(F.sum(F.when(F.col("_old_fp").isNull(), 1)
                         .otherwise(0)), F.lit(0))
        .cast("long").alias("n_new"),
        F.coalesce(F.sum(F.when(F.col("_old_fp").isNotNull()
                                & F.col("_is_changed"), 1)
                         .otherwise(0)), F.lit(0))
        .cast("long").alias("n_changed"),
        F.coalesce(F.sum(F.when(~F.col("_is_changed"), 1).otherwise(0)),
                   F.lit(0)).cast("long").alias("n_unchanged"))
    deleted = (old_fp.select(id_col)
               .join(new_docs.select(id_col), id_col, "left_anti")
               .agg(F.count("*").cast("long").alias("n_deleted")))
    return counts.crossJoin(deleted)  # two 1-row frames


def snapshot_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Set difference between two snapshots of the same relation (e.g.
    two mention-triple tables): rows only in ``new`` tagged
    ``op='added'``, rows only in ``old`` tagged ``op='removed'``.
    EXCEPT-DISTINCT semantics (null-safe row equality, duplicates
    collapse) — exactly SQL ``EXCEPT``, so the DuckDB oracle is the
    literal same query. Each side is one hash-partitioned set-difference
    shuffle over skinny triple rows; there is no cheaper shape for an
    unordered diff."""
    added = new.subtract(old).withColumn("op", F.lit("added"))
    removed = old.subtract(new).withColumn("op", F.lit("removed"))
    return added.unionByName(removed)
