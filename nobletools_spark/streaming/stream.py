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
