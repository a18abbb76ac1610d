"""doc_id projection shared by the corpus-prep operators."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T


_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def doc_id_col(docs: DataFrame) -> Column:
    """Integral ids normalize to long (the driver oracle compares
    BIGINT); everything else — strings (the interleaved fixtures'
    'd17'), decimals, doubles — passes through unchanged. Casting is
    restricted to the WIDENING integral cases because a lossy cast
    corrupts keys silently: string→long and decimal(20,0)-above-2^63
    →long both yield NULL (merging distinct documents under one NULL
    key), and double→long truncates."""
    t = docs.schema["doc_id"].dataType
    c = F.col("doc_id")
    return (c.cast("long") if isinstance(t, _INTEGRAL)
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
