"""The annotate operator: documents → mentions, as a map-only Spark stage.

Spark shape (SURVEY.md §3.1): the terminology index is a broadcast
variable; ``mapInPandas`` consumes Arrow batches of (doc_id, spans) rows,
splits text spans into sentences, runs the per-sentence matcher and the
document-local acronym pass (whole document per row ⇒ doc-local state
never crosses a partition boundary), and emits mention rows. Zero
shuffle: at 10^12-document scale this stage scales linearly with input
partitions. Media spans are never touched.

Reference flow parity: NobleCoder.process(Document)
(coder/NobleCoder.java:321-395) = sentence split → terminology.process →
AcronymDetector.process per sentence.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import functions as F

from nobletools_spark.model import MatchConfig, TerminologyIndex
from nobletools_spark.operators import match_core

MENTIONS_DDL = (
    "doc_id string, sent_offset int, cui string, matched_term string, "
    "term_norm string, score double, start int, end int, "
    "annotations array<struct<text:string, offset:int>>, "
    "modifiers map<string,string>"
)


def _span_fields(span) -> tuple[str, Optional[str], Optional[str], int]:
    """Tolerate Arrow struct → dict or Row tuples."""
    if isinstance(span, dict):
        return (span.get("kind"), span.get("text"), span.get("media_ref"),
                span.get("offset") or 0)
    return (span[0], span[1], span[2], span[3] or 0)


def parse_and_match(doc_id: str, spans, idx: TerminologyIndex,
                    cfg: MatchConfig, context=None,
                    process_filter: int | None = None,
                    negex: bool = False):
    """One document through the full pipeline, keeping STRUCTURE: returns
    (matched_sentences, all_sentences, sections) where matched_sentences
    is the [(text, offset, mentions)] list the mention rows derive from,
    all_sentences is every sentence [(text, offset, type, filtered)]
    including the filtered ones (section headers, worksheets, blanks —
    the extraction kernel needs them for Section.getSentences range
    counting), and sections is the parsed section list. Pure function —
    shared by process_document and the extraction kernel so both paths
    stay pinned to the same docproc + matcher semantics."""
    from nobletools_spark.functions import docproc
    from nobletools_spark.functions.textkit import filter_deid_tags

    pf = docproc.DEFAULT_PROCESS_FILTER if process_filter is None else process_filter
    sentences: list[tuple[str, int, list[match_core.Mention]]] = []
    all_sentences: list[tuple[str, int, str, bool]] = []
    sections = []
    if spans is None:
        spans = ()
    for span in spans:
        kind, text, _media, offset = _span_fields(span)
        if kind != "text" or not text:
            continue  # media spans carried through untouched
        parsed = docproc.process_document_text(text, offset)
        sections.extend(parsed.sections)
        for sent_text, sent_off, sent_type in parsed.sentences:
            filtered = bool(docproc.filter_sentence(sent_text.strip(),
                                                    sent_type, pf))
            all_sentences.append((sent_text, sent_off, sent_type, filtered))
            if filtered:
                continue
            if pf & docproc.FILTER_DEID:
                sent_text = filter_deid_tags(sent_text)
            mentions = match_core.match_sentence(sent_text, idx, cfg)
            sentences.append((sent_text, sent_off, mentions))
    # document-local acronym pass (tools/AcronymDetector.java:118-196)
    match_core.acronym_pass(sentences)
    if context is not None:
        from nobletools_spark.operators.context import apply_context
        for sent_text, _off, mentions in sentences:
            apply_context(sent_text, mentions, context)
    elif negex:
        # the lighter NegEx fallback (tools/NegEx.java; the reference
        # wires ConText by default, NegEx on request)
        from nobletools_spark.operators.negex import negex as negex_fn
        for sent_text, _off, mentions in sentences:
            negex_fn(sent_text, mentions)
    return sentences, all_sentences, sections


def process_document(doc_id: str, spans, idx: TerminologyIndex,
                     cfg: MatchConfig, context=None,
                     process_filter: int | None = None,
                     negex: bool = False) -> list[tuple]:
    """Annotate one document; returns mention rows (pure function — reused
    by the pytest oracle harness and the Spark UDF). ``context`` is an
    optional ContextIndex: modifier assignment runs per sentence after
    the acronym pass (NobleCoder.process order, coder/NobleCoder.java:
    379-389: terminology → acronyms → ConText).

    Each text span goes through the document-structure pipeline
    (DocumentProcessor: sectioning, prose/line classification, worksheet
    detection) and the sentence filters + DeID scrub
    (NobleCoder.filterSentence :415-435, filterText :443-447)."""
    sentences, _all, _secs = parse_and_match(doc_id, spans, idx, cfg,
                                             context, process_filter, negex)
    rows = []
    for _text, sent_off, mentions in sentences:
        for m in mentions:
            anns = [{"text": w, "offset": sent_off + o} for w, o in m.annotations]
            rows.append((
                doc_id, sent_off, m.cui, m.matched_term, m.term_norm,
                float(m.score), sent_off + m.start, sent_off + m.end, anns,
                dict(m.modifiers),
            ))
    return rows


def annotate(docs_df, index, cfg: MatchConfig = MatchConfig(),
             min_parallelism: int | None = None, context=None,
             negex: bool = False):
    """documents (doc_id, spans) → mentions DataFrame.

    ``index`` may be a TerminologyIndex or an existing Broadcast of one.
    ``context`` (optional ContextIndex) enables ConText modifier
    assignment inside the same map-only stage — the ``modifiers`` column
    is empty maps otherwise.

    Parallelism guard: the matcher is CPU-bound per document, so a
    too-coarse input layout (one small parquet file = one partition)
    would serialize the whole stage. If the input has fewer partitions
    than ``min_parallelism`` (default: the cluster's default
    parallelism), round-robin repartition first — a tiny shuffle of
    (doc_id, spans) rows that unlocks full fan-out. At 100 TB the input
    already has thousands of partitions and this is a no-op.
    """
    from nobletools_spark.session import ship_package

    spark = docs_df.sparkSession
    ship_package(spark)
    want = (min_parallelism if min_parallelism is not None
            else spark.sparkContext.defaultParallelism)
    # .rdd is illegal on a streaming DataFrame; micro-batch parallelism
    # is governed by the source's file splitting instead
    if (want > 1 and not docs_df.isStreaming
            and docs_df.rdd.getNumPartitions() < want):
        docs_df = docs_df.repartition(want)
    if isinstance(index, TerminologyIndex):
        bc = spark.sparkContext.broadcast(index)
    else:
        bc = index
    ctx_bc = (spark.sparkContext.broadcast(context)
              if context is not None and not hasattr(context, "value")
              else context)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = bc.value
        ctx = ctx_bc.value if ctx_bc is not None else None
        cols = ["doc_id", "sent_offset", "cui", "matched_term", "term_norm",
                "score", "start", "end", "annotations", "modifiers"]
        for pdf in batches:
            out: list[tuple] = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                out.extend(process_document(doc_id, spans, idx, cfg, ctx,
                                            negex=negex))
            yield pd.DataFrame(out, columns=cols)

    # contract: doc_id is a string (the interleaved-table schema).
    # Numeric-id corpora are accepted via a zero-cost codegen cast —
    # without it the int64 surfaces as an Arrow schema error deep
    # inside a task instead of just working
    return (docs_df.select(F.col("doc_id").cast("string").alias("doc_id"),
                           "spans")
            .mapInPandas(fn, MENTIONS_DDL))


def annotate_multi(docs_df, indexes, cfg: MatchConfig = MatchConfig(),
                   **kw):
    """CompositTerminology analog (terminology/CompositTerminology.java:
    115-160): annotate against several terminologies and concatenate the
    mention streams — in Spark, a unionByName of map-only stages over
    the same scan (Catalyst shares the cached input)."""
    out = None
    for idx in indexes:
        m = annotate(docs_df, idx, cfg, **kw)
        out = m if out is None else out.unionByName(m)
    return out


def span_invariant_violations(docs_in, docs_out) -> int:
    """Per-row invariant (BASELINE.json input_hint): span-sequence equality
    on (kind, text, media_ref, order) between pipeline input and output.
    Returns the number of violating doc_ids (0 = invariant holds)."""
    from pyspark.sql import functions as F

    def key(df, name):
        proj = F.transform(
            "spans",
            lambda s: F.struct(s["kind"].alias("kind"), s["text"].alias("text"),
                               s["media_ref"].alias("media_ref")))
        # presence marker: a NULL spans CELL on both sides is a match
        # (the pipeline passes NULL spans through untouched); only a
        # doc MISSING from one side of the full join is a violation
        return df.select("doc_id", proj.alias(name),
                         F.lit(1).alias(f"_{name}p"))

    joined = key(docs_in, "a").join(key(docs_out, "b"), "doc_id", "full")
    return joined.filter(
        F.col("_ap").isNull() | F.col("_bp").isNull()
        | ~F.col("a").eqNullSafe(F.col("b"))
    ).count()
