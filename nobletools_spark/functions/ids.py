"""doc_id projection shared by the corpus-prep operators."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T


def doc_id_col(docs: DataFrame) -> Column:
    """Numeric ids normalize to long (the driver oracle compares
    BIGINT); non-numeric ids (e.g. the interleaved fixtures' 'd17')
    pass through unchanged — a blind cast('long') would silently turn
    every string id into NULL and corrupt all downstream keys."""
    t = docs.schema["doc_id"].dataType
    c = F.col("doc_id")
    return (c.cast("long") if isinstance(t, T.NumericType)
            else c).alias("doc_id")
