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
                    cfg: MatchConfig = MatchConfig(), context=None) -> DataFrame:
    """Streaming mentions DataFrame — identical transformation as batch
    annotate (mapInPandas is stream-capable); caller attaches writeStream."""
    return annotate(docs_stream, index, cfg, min_parallelism=1,
                    context=context)


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
