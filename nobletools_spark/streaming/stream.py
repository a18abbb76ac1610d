"""Structured Streaming front-end for the annotate stage.

The reference is strictly batch (files in a directory,
ui/NobleCoderTool.java:1420-1478) — this is the Spark-native upgrade: the
matcher stage is a stateless map-only transformation, so the SAME
``annotate`` plan runs under ``readStream`` unchanged (no watermarks or
state needed; document-local state lives inside one UDF call). Use for
incremental corpus ingest: new parquet/Iceberg files → mentions appended
to the sink, exactly-once via checkpointLocation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nobletools_spark.model import MatchConfig
from nobletools_spark.operators.matcher import annotate
from nobletools_spark.sources.fixtures import SPANS_DDL


def read_document_stream(spark: SparkSession, input_path: str,
                         schema: str = SPANS_DDL) -> DataFrame:
    """File-source stream of interleaved documents (new files appearing
    under input_path are picked up per micro-batch)."""
    return (spark.readStream.schema(schema)
            .parquet(input_path))


def annotate_stream(docs_stream: DataFrame, index,
                    cfg: MatchConfig = MatchConfig(), context=None,
                    negex: bool = False) -> DataFrame:
    """Streaming mentions DataFrame — identical transformation as batch
    annotate (mapInPandas is stream-capable), with the SAME optional
    NegEx fallback so batch→streaming swaps keep their modifiers;
    caller attaches writeStream."""
    return annotate(docs_stream, index, cfg, min_parallelism=1,
                    context=context, negex=negex)


def start_mentions_sink(mentions_stream: DataFrame, out_path: str,
                        checkpoint_path: str, trigger_available_now: bool = True):
    """Append-mode parquet sink with checkpointing (exactly-once per
    micro-batch). ``trigger_available_now`` drains what exists and stops —
    the batch-backfill pattern; omit for a continuous 24/7 ingest."""
    w = (mentions_stream.writeStream
         .format("parquet")
         .option("path", out_path)
         .option("checkpointLocation", checkpoint_path)
         .outputMode("append"))
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def streaming_exact_dedup(docs_stream: DataFrame,
                          ts_col: str = "ingest_ts",
                          watermark: str = "10 minutes",
                          by: str = "content") -> DataFrame:
    """Streaming exact-dedup on ingest: drop re-arriving duplicate
    documents within the watermark horizon — ``dropDuplicates`` over the
    content signature keyed with an event-time watermark so the
    signature state store is BOUNDED (without the watermark the state
    grows with the corpus forever; at 100 TB/day that is the difference
    between a working stream and an OOM). Exact batch counterpart:
    ``operators.dedup.exact_dedup``.

    ``by``: 'content' (raw text md5) or 'bag' (sorted distinct token
    set). Late duplicates beyond the watermark are passed through —
    downstream batch dedup (dedup_clusters) is the safety net, the
    standard lambda-ish split for ingest pipelines."""
    from pyspark.sql import functions as F

    # interleaved (doc_id, spans) streams gain a text column via the
    # SAME flatten expression as flatten_documents — added in place so
    # the event-time column survives (a projection or self-join would
    # drop it / be an illegal stream-stream join)
    if "text" not in docs_stream.columns and "spans" in docs_stream.columns:
        from nobletools_spark.plans.pipeline import flatten_text_col

        docs_stream = docs_stream.withColumn("text", flatten_text_col())
    # the ONE signature definition, shared with batch exact_dedup —
    # a drifted copy here would silently break the batch↔streaming
    # duplicate-group contract
    from nobletools_spark.operators.dedup import exact_sig

    sig = exact_sig(by)
    # dropDuplicatesWithinWatermark: plain dropDuplicates only evicts
    # state when the event-time column is part of the key — with a
    # signature-only key the store would grow with the corpus forever
    return (docs_stream
            .withColumn("_sig", sig)
            .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["_sig"])
            .drop("_sig"))


def read_upsert_state(spark: SparkSession, state_dir: str):
    """Current (doc_fp, mentions) state of a ``start_incremental_maintenance``
    stream, or None before the first committed batch. Reads the version
    the ``_CURRENT`` pointer names — a reader never sees a half-written
    version (the pointer is renamed into place only after both tables
    are fully written)."""
    import os

    ptr = os.path.join(state_dir, "_CURRENT")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        v = f.read().strip()
    base = os.path.join(state_dir, f"v{v}")
    return (spark.read.parquet(os.path.join(base, "doc_fp")),
            spark.read.parquet(os.path.join(base, "mentions")))


def start_incremental_maintenance(docs_stream: DataFrame, state_dir: str,
                                  annotate_fn, checkpoint_path: str,
                                  id_col: str = "doc_id",
                                  trigger_available_now: bool = True):
    """Streaming front-end for incremental KG maintenance
    (operators/incremental.py): each micro-batch is a document UPSERT
    increment — new or re-ingested docs — and the maintained state
    (content fingerprints + mention table) advances per batch with the
    matcher running ONLY on docs whose span-sequence fingerprint
    actually changed. Re-delivered identical docs (at-least-once
    upstream, crash replays of an uncommitted batch) cost one skinny
    join, not a matcher pass, so the maintenance is effectively
    idempotent. The invariant (test-pinned): after any batch, the state
    mention table ≡ ``annotate_fn`` over the latest version of every
    doc ever ingested. Deletions do not stream (an absent doc is
    indistinguishable from a quiet one); handle them in a batch
    compaction with ``incremental_update``.

    State layout: ``state_dir/v{batch_id}/{doc_fp,mentions}`` parquet +
    a ``_CURRENT`` pointer file renamed into place atomically (POSIX
    rename) only after both tables commit — a crash mid-batch leaves
    the pointer at the previous version and Structured Streaming
    replays the batch from the checkpoint. The OTHER crash window —
    after the pointer rename but before the streaming checkpoint
    commits — replays a batch whose state is already current; the
    pointer guard at the top of the batch fn detects it (pointer ≥
    batch_id) and no-ops, because re-processing would overwrite the
    very version the new plans lazily read (an unrecoverable
    read/overwrite wedge). Corollary: ``state_dir`` and
    ``checkpoint_path`` must live and die together — a fresh checkpoint
    restarts batch ids at 0 and the guard would skip real work against
    an old state dir. Old versions are retained (time-travel /
    debugging); prune them like any snapshot dir. On a real cluster
    swap the versioned-parquet + pointer scheme for an Iceberg MERGE
    INTO — same per-batch plan, table-format commits.

    A batch carrying several rows for one doc_id must pre-resolve to
    the latest (this function keeps an arbitrary one per id —
    micro-batch file sources have no intra-batch order)."""
    import os

    from pyspark.sql import functions as F

    from nobletools_spark.operators.incremental import doc_fingerprints

    def _process(batch, batch_id):
        spark = batch.sparkSession
        ptr = os.path.join(state_dir, "_CURRENT")
        if os.path.exists(ptr):
            with open(ptr) as f:
                committed = int(f.read().strip())
            if committed >= batch_id:
                # crash replay of a batch whose state already committed
                # (pointer renamed, checkpoint didn't) — see docstring
                return
        # persist the deduped batch for the micro-batch's lifetime: the
        # two write actions below would otherwise re-read the source and
        # re-run the dropDuplicates shuffle once each, and bfp's
        # fingerprint projection would recompute inside the same/changed
        # anti-joins — doubled I/O on the hot maintenance path
        batch = batch.dropDuplicates([id_col]).persist()
        bfp = doc_fingerprints(batch, id_col)
        state = read_upsert_state(spark, state_dir)
        if state is None:
            fresh = annotate_fn(batch)
            new_fp, new_m = bfp, fresh
        else:
            old_fp, old_m = state
            same = (bfp.join(old_fp.withColumnRenamed("fp", "_old_fp"),
                             id_col)
                    .filter(F.col("fp") == F.col("_old_fp"))
                    .select(id_col))
            changed = batch.join(same, id_col, "left_anti")
            fresh = annotate_fn(changed)
            changed_ids = changed.select(id_col)
            kept_m = old_m.join(changed_ids, id_col, "left_anti")
            new_m = kept_m.select(*fresh.columns).unionByName(fresh)
            new_fp = (old_fp.join(bfp.select(id_col), id_col, "left_anti")
                      .unionByName(bfp))
        base = os.path.join(state_dir, f"v{batch_id}")
        new_fp.write.mode("overwrite").parquet(
            os.path.join(base, "doc_fp"))
        new_m.write.mode("overwrite").parquet(
            os.path.join(base, "mentions"))
        tmp = os.path.join(state_dir, f"_CURRENT.tmp{batch_id}")
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, os.path.join(state_dir, "_CURRENT"))
        batch.unpersist()  # per-batch scope — never session-lifetime

    os.makedirs(state_dir, exist_ok=True)
    w = (docs_stream.writeStream
         .foreachBatch(_process)
         .option("checkpointLocation", checkpoint_path))
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
