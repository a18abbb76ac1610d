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


def ws_tokens_col() -> Column:
    """THE whitespace tokenization of the corpus-prep operators —
    split on single spaces with NULL text coalesced to '' (so an
    empty/NULL doc is one '' token). Every operator that counts or
    windows tokens AND every DuckDB oracle replays this contract
    byte-for-byte; change it here and nowhere else."""
    return F.split(F.coalesce(F.col("text"), F.lit("")), " ")


def tok_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, toks) staging shared by the dedup/textstats operators."""
    return docs.select(doc_id_col(docs), ws_tokens_col().alias("toks"))
