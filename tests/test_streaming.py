"""Structured Streaming annotate: file-source micro-batches produce the
same mentions as the batch path, exactly-once via checkpoint."""

import pytest

from nobletools_spark.model import MatchConfig
from nobletools_spark.operators.matcher import annotate, annotate_multi
from nobletools_spark.sources.fixtures import (
    builtin_index,
    pytest_index,
    synthetic_corpus_df,
)
from nobletools_spark.streaming.stream import (
    annotate_stream,
    read_document_stream,
    start_mentions_sink,
)


def _key(rows):
    return sorted((r.doc_id, r.sent_offset, r.cui, r.start, r.end)
                  for r in rows)


def test_stream_matches_batch(spark, tmp_path):
    docs = synthetic_corpus_df(spark, 40, seed=11)
    in_path = str(tmp_path / "in")
    out_path = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    docs.write.parquet(in_path)

    idx = pytest_index()
    batch = annotate(docs, idx, MatchConfig()).collect()

    stream = annotate_stream(read_document_stream(spark, in_path), idx)
    assert stream.isStreaming
    q = start_mentions_sink(stream, out_path, ck)
    q.awaitTermination(120)
    got = spark.read.parquet(out_path).collect()
    assert _key(got) == _key(batch)

    # restart with same checkpoint: no new files → no duplicates
    q2 = start_mentions_sink(
        annotate_stream(read_document_stream(spark, in_path), idx),
        out_path, ck)
    q2.awaitTermination(120)
    again = spark.read.parquet(out_path).collect()
    assert _key(again) == _key(batch)


def test_stream_incremental_files(spark, tmp_path):
    in_path = str(tmp_path / "in2")
    out_path = str(tmp_path / "out2")
    ck = str(tmp_path / "ck2")
    d1 = synthetic_corpus_df(spark, 20, seed=1)
    d1.write.parquet(in_path)
    idx = pytest_index()
    start_mentions_sink(
        annotate_stream(read_document_stream(spark, in_path), idx),
        out_path, ck).awaitTermination(120)
    n1 = spark.read.parquet(out_path).count()
    # new files arrive → only the delta is processed
    from pyspark.sql import functions as F
    d2 = synthetic_corpus_df(spark, 20, seed=2)
    d2.withColumn("doc_id", F.concat("doc_id", F.lit("x"))) \
      .write.mode("append").parquet(in_path)
    start_mentions_sink(
        annotate_stream(read_document_stream(spark, in_path), idx),
        out_path, ck).awaitTermination(120)
    n2 = spark.read.parquet(out_path).count()
    assert n2 > n1


def test_annotate_multi_union(spark):
    docs = spark.createDataFrame(
        [("d1", [("text", "Melanoma near a table scan.", None, 0)])],
        "doc_id string, spans array<struct<kind:string, text:string, "
        "media_ref:string, offset:int>>")
    m = annotate_multi(docs, [pytest_index(), builtin_index()], MatchConfig())
    got = {r.cui for r in m.collect()}
    assert "C013" in got   # pytest terminology
    assert "C105" in got   # builtin terminology

def test_watermarked_event_rollup(spark, tmp_path):
    """Streaming tumbling-window counts with a watermark: in append
    mode only windows the watermark has passed emit; every emitted row
    must agree with the batch rollup."""
    from pyspark.sql import functions as F
    from nobletools_spark.operators.events import daily_rollup, streaming_rollup

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    in_path = str(tmp_path / "ev")
    events.write.parquet(in_path)
    stream = spark.readStream.schema(events.schema).parquet(in_path)
    out = streaming_rollup(stream)
    assert out.isStreaming
    q = (out.writeStream.format("memory").queryName("ev_rollup")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.window_start, r.event_type): r.n_events
           for r in spark.sql("select * from ev_rollup").collect()}
    assert got  # closed windows emitted
    batch = {(r.day, r.event_type): r.n_events
             for r in daily_rollup(events).collect()}
    for k, v in got.items():
        assert batch[k] == v
    # the open tail window (not yet passed by the watermark) is withheld
    assert len(got) < len(batch)


def test_ivf_topk(spark):
    """IVF ANN: every returned neighbor pair is bucket-consistent and
    ranks are dense from 1; high-cosine pairs inside a cell are found."""
    from nobletools_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = ivf_topk(emb, n_cells=4, k=3).collect()
    assert rows
    by_q = {}
    for r in rows:
        by_q.setdefault(r.vec_id, []).append(r.rank)
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3


def test_ivf_topk_n_probe_finds_adjacent_cell_neighbor(spark):
    """A boundary vector whose true nearest-by-cosine neighbor sits in
    the ADJACENT k-means cell: lost with n_probe=1 (cell-local probe),
    found and ranked first with n_probe=2 — the r01 bug was n_probe
    being accepted but ignored."""
    from nobletools_spark.operators.similarity import ivf_topk

    # Euclidean clusters: ids 0-2 near (1,0), ids 10-12 near (10,11).
    # id 5 = (4,3): Euclidean-assigned to the (1,0) cell, but its
    # direction (37°) is far closer to the (10,11) cluster (~48°) than
    # to the x-axis cluster by cosine.
    rows = [(0, [1.0, 0.0]), (1, [1.0, 0.1]), (2, [1.0, 0.2]),
            (10, [10.0, 10.0]), (11, [10.0, 11.0]), (12, [10.0, 12.0]),
            (5, [4.0, 3.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    near = {r.rank: r.neighbor_id
            for r in ivf_topk(emb, n_cells=2, k=3, n_probe=1).collect()
            if r.vec_id == 5}
    assert set(near.values()) <= {0, 1, 2}          # cell-local only
    # n_probe<1 clamps to 1 (cell-local), never a silent empty result
    near0 = {r.rank: r.neighbor_id
             for r in ivf_topk(emb, n_cells=2, k=3, n_probe=0).collect()
             if r.vec_id == 5}
    assert near0 == near
    near2 = {r.rank: r.neighbor_id
             for r in ivf_topk(emb, n_cells=2, k=3, n_probe=2).collect()
             if r.vec_id == 5}
    assert near2[1] in {10, 11, 12}                 # true neighbor found
    # non-boundary vectors keep dense ranks (no duplicate candidates)
    all_rows = ivf_topk(emb, n_cells=2, k=3, n_probe=2).collect()
    by_q = {}
    for r in all_rows:
        by_q.setdefault(r.vec_id, []).append(r.rank)
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_ivf_topk_skewed_cell_cap(spark):
    """A hot k-means cell holding ~90% of the corpus must be dropped
    from BOTH join sides when it exceeds max_cell — the r2 verdict's
    last uncapped-self-join finding: without the cap one cell is an
    O(n²) straggler task at corpus scale."""
    from nobletools_spark.operators.similarity import ivf_topk

    # 90 near-identical vectors (one hot cell) + 8 spread vectors
    rows = [(i, [10.0 + 0.001 * i, 10.0]) for i in range(90)]
    rows += [(100 + j, [float(-5 - j), float(3 * j - 10)]) for j in range(8)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    uncapped = ivf_topk(emb, n_cells=4, k=2, n_probe=1, max_cell=10_000).collect()
    assert any(r.vec_id < 90 for r in uncapped)      # hot cell present
    capped = ivf_topk(emb, n_cells=4, k=2, n_probe=2, max_cell=50).collect()
    ids = {r.vec_id for r in capped} | {r.neighbor_id for r in capped}
    assert not ids & set(range(90))                  # hot cell fully dropped
    assert capped                                    # small cells survive
    for r in capped:                                 # no hot-cell candidates
        assert r.neighbor_id >= 100 and r.vec_id >= 100


def test_lsh_topk_bucket_cap_drops_boilerplate_bucket(spark):
    """max_bucket drops oversized (boilerplate) buckets from both sides
    of the self-join; vectors in small buckets keep identical results."""
    from nobletools_spark.operators.similarity import hyperplanes, lsh_topk

    planes = hyperplanes(4, 4, seed=7)
    # 12 identical vectors -> one giant bucket; 3 distinct-direction
    # vectors land elsewhere
    rows = [(i, [1.0, 1.0, 1.0, 1.0]) for i in range(12)]
    rows += [(100, [-1.0, -2.0, -1.0, -3.0]), (101, [-1.0, -2.0, -1.1, -3.0]),
             (102, [-1.0, -2.1, -1.0, -3.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    uncapped = {(r.vec_id, r.neighbor_id, r.rank)
                for r in lsh_topk(emb, planes, k=2, max_bucket=0).collect()}
    capped = {(r.vec_id, r.neighbor_id, r.rank)
              for r in lsh_topk(emb, planes, k=2, max_bucket=4).collect()}
    assert not any(q < 100 for q, *_ in capped)      # giant bucket dropped
    assert capped == {t for t in uncapped if t[0] >= 100}  # others intact
    assert capped                                    # small bucket survives


def test_embedding_dup_pairs_bucket_cap(spark):
    from nobletools_spark.operators.dedup import embedding_dup_pairs
    from nobletools_spark.operators.similarity import hyperplanes

    planes = hyperplanes(4, 4, seed=7)
    rows = [(i, [1.0, 1.0, 1.0, 1.0]) for i in range(12)]
    rows += [(100, [-1.0, -2.0, -1.0, -3.0]), (101, [-1.0, -2.0, -1.1, -3.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    capped = embedding_dup_pairs(emb, threshold=0.9, group_col=None,
                                 planes=planes, max_bucket=4).collect()
    ids = {r.vec_a for r in capped} | {r.vec_b for r in capped}
    assert ids == {100, 101}                         # big bucket dropped


def test_stateful_streaming_sessionize(spark, tmp_path):
    """applyInPandasWithState sessionization: emitted (closed) sessions
    must be exactly a prefix subset of the batch sessionization — same
    boundaries, counts, and durations."""
    from nobletools_spark.operators.events import sessionize, streaming_sessionize

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .limit(400).cache()
    in_path = str(tmp_path / "sess_in")
    events.coalesce(1).write.parquet(in_path)
    stream = spark.readStream.schema(events.schema).parquet(in_path)
    # state-store instances = shuffle partitions: keep the test cheap
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        q = (streaming_sessionize(stream, gap_minutes=30)
             .writeStream.format("memory").queryName("sess_out")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(180)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    got = {(r.user_id, r.session_start, r.session_end, r.n_events,
            r.duration_us)
           for r in spark.sql("select * from sess_out").collect()}
    assert got
    batch = {(r.user_id, r.session_start, r.session_end, r.n_events,
              r.duration_us)
             for r in sessionize(events, gap_minutes=30).collect()}
    assert got <= batch
    # everything except the per-user open tail session is emitted
    assert len(got) >= len(batch) - events.select("user_id").distinct().count()


def test_embedding_dup_lsh_buckets(spark):
    """LSH-bucketed embedding dedup (scale path) finds a superset-agreeing
    set: every reported pair also passes the brute-force cosine check."""
    from nobletools_spark.operators.dedup import embedding_dup_pairs
    from nobletools_spark.operators.similarity import hyperplanes

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    planes = hyperplanes(4, 64, seed=7)
    lsh_pairs = embedding_dup_pairs(emb, threshold=0.3, group_col=None,
                                    planes=planes).collect()
    assert lsh_pairs
    for r in lsh_pairs:
        assert r.cos >= 0.3 and r.vec_a < r.vec_b


def test_streaming_exact_dedup(spark, tmp_path):
    """Duplicate documents arriving in the stream are dropped once the
    first copy is seen (state bounded by the watermark); distinct
    documents all pass."""
    from pyspark.sql import functions as F

    from nobletools_spark.streaming.stream import streaming_exact_dedup

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma", "2024-01-01 10:00:00"),
         (2, "alpha beta gamma", "2024-01-01 10:01:00"),   # dup of 1
         (3, "delta epsilon", "2024-01-01 10:02:00"),
         (4, "gamma beta alpha", "2024-01-01 10:03:00")],  # bag-dup of 1
        "doc_id long, text string, ingest_ts string") \
        .withColumn("ingest_ts", F.col("ingest_ts").cast("timestamp"))
    in_path = str(tmp_path / "sdd_in")
    docs.coalesce(1).write.parquet(in_path)
    stream = spark.readStream.schema(docs.schema).parquet(in_path)
    q = (streaming_exact_dedup(stream, by="bag")
         .writeStream.format("memory").queryName("sdd_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.doc_id for r in spark.sql("select * from sdd_out").collect()}
    assert 3 in got                       # distinct passes
    assert len(got & {1, 2, 4}) == 1      # one survivor per dup group


def test_streaming_template_extraction(spark, tmp_path):
    """extract_items is stream-capable (stream-static broadcast joins,
    no stateful agg on the no-components path): streaming ItemInstance
    rows must equal the batch run over the same files."""
    from nobletools_spark.operators.templates import TEMPLATES_DDL, extract_items
    from nobletools_spark.sources.fixtures import (
        PYTEST_ISA_EDGES,
        pytest_index,
        rich_corpus_df,
    )
    from nobletools_spark.streaming.stream import annotate_stream

    docs = rich_corpus_df(spark, 20, seed=7)
    in_path = str(tmp_path / "ste_in")
    docs.coalesce(1).write.parquet(in_path)
    edges = spark.createDataFrame(list(PYTEST_ISA_EDGES),
                                  "cui string, parent string")
    templates = spark.createDataFrame(
        [("t1", "neoplasm", "C014", None, "boolean")], TEMPLATES_DDL)
    idx = pytest_index()

    stream = spark.readStream.schema(docs.schema).parquet(in_path)
    items = extract_items(annotate_stream(stream, idx), edges, templates)
    q = (items.writeStream.format("memory").queryName("ste_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.doc_id, r.cui, r.start, r.absent)
           for r in spark.sql("select * from ste_out").collect()}
    from nobletools_spark.operators.matcher import annotate

    batch = extract_items(annotate(docs, idx), edges, templates)
    want = {(r.doc_id, r.cui, r.start, r.absent) for r in batch.collect()}
    assert got == want and got


def test_streaming_training_data_ops(spark, tmp_path):
    """The stateless training-data operators (filter_decisions,
    chunk_documents, classifier_score) run unchanged on a streaming
    source and match their batch outputs exactly — corpus prep works as
    a continuous ingestion pipeline, not just a batch job."""
    from pyspark.sql import functions as F
    from nobletools_spark.operators.textstats import (
        chunk_documents,
        classifier_score,
        filter_decisions,
    )

    docs = spark.range(30).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("the quick brown fox plus filler "),
                 F.expr("repeat('tok ', CAST(id % 40 AS INT))"))
        .alias("text"))
    in_path = str(tmp_path / "docs")
    docs.write.parquet(in_path)

    batch_filter = {tuple(r) for r in filter_decisions(docs).collect()}
    batch_chunks = {tuple(r) for r in
                    chunk_documents(docs, 16, 4).collect()}
    batch_clf = {tuple(r) for r in
                 classifier_score(docs, n_buckets=64).collect()}

    stream = spark.readStream.schema("doc_id long, text string") \
        .parquet(in_path)
    for name, op, want in (
            ("filter", filter_decisions, batch_filter),
            ("chunks", lambda d: chunk_documents(d, 16, 4),
             batch_chunks),
            ("clf", lambda d: classifier_score(d, n_buckets=64),
             batch_clf)):
        out = str(tmp_path / f"out_{name}")
        ck = str(tmp_path / f"ck_{name}")
        q = (op(stream).writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = {tuple(r) for r in spark.read.parquet(out).collect()}
        assert got == want and got, name


def test_sessionize_string_user_ids_stay_separate(spark):
    """Batch sessionize partitions by the RAW user id: string ids must
    each get their own timeline (a lossy long cast would merge every
    non-numeric id into one NULL partition and fuse their sessions)."""
    import datetime as dt

    from nobletools_spark.operators.events import sessionize

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [(1, t0, "alice"), (2, t0 + dt.timedelta(minutes=5), "bob"),
            (3, t0 + dt.timedelta(minutes=10), "alice"),
            (4, t0 + dt.timedelta(minutes=90), "alice")]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id string")
    got = {(r.user_id, r.session_idx): r.n_events
           for r in sessionize(events, gap_minutes=30).collect()}
    assert got == {("alice", 1): 2, ("alice", 2): 1, ("bob", 1): 1}


def test_streaming_incremental_maintenance(spark, tmp_path):
    """Upsert stream through start_incremental_maintenance: after every
    micro-batch the state mention table equals a full re-annotate of
    the latest version of every doc, and the matcher only ever sees
    fingerprint-changed docs (re-delivered identical docs are join-skipped)."""
    from nobletools_spark.sources.fixtures import SPANS_DDL
    from nobletools_spark.streaming.stream import (
        read_upsert_state,
        start_incremental_maintenance,
    )

    idx = pytest_index()
    seen_counts = []

    def annotate_fn(docs):
        seen_counts.append(docs.count())
        return annotate(docs, idx, MatchConfig(), min_parallelism=1)

    def span(t):
        return [("text", t, None, 0)]

    in_path = str(tmp_path / "in")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")

    def run_batch(rows, name):
        spark.createDataFrame(rows, SPANS_DDL).coalesce(1) \
            .write.parquet(f"{in_path}/{name}")
        q = start_incremental_maintenance(
            read_document_stream(spark, f"{in_path}/*"), state,
            annotate_fn, ck)
        q.awaitTermination(120)

    def state_key():
        _, m = read_upsert_state(spark, state)
        return _key(m.collect())

    def want_key(rows):
        docs = spark.createDataFrame(rows, SPANS_DDL)
        return _key(annotate(docs, idx, MatchConfig(),
                             min_parallelism=1).collect())

    # batch 1: initial corpus
    b1 = [("d1", span("deep margin is clear")),
          ("d2", span("nasal septum noted")),
          ("d3", span("fish was positive"))]
    run_batch(b1, "b1")
    assert state_key() == want_key(b1)
    assert seen_counts[-1] == 3

    # batch 2: d2 changed, d4 new, d1 re-delivered UNCHANGED
    b2 = [("d1", span("deep margin is clear")),
          ("d2", span("septum of the nose deviates")),
          ("d4", span("DCIS with deep margins"))]
    run_batch(b2, "b2")
    latest = [b1[0], b2[1], b1[2], b2[2]]
    assert state_key() == want_key(latest)
    assert seen_counts[-1] == 2  # d1 skipped: identical fingerprint

    # batch 3: d4 changed again
    b3 = [("d4", span("no fish seen"))]
    run_batch(b3, "b3")
    latest = [b1[0], b2[1], b1[2], b3[0]]
    assert state_key() == want_key(latest)
    assert seen_counts[-1] == 1


def test_streaming_incremental_replay_guard(spark, tmp_path):
    """Crash window between the _CURRENT pointer rename and the
    streaming checkpoint commit: the replayed batch (same batch_id,
    state already current) must no-op — re-processing would overwrite
    the version its own plans read. Simulated with a fresh checkpoint
    (batch ids restart at 0 = the committed pointer)."""
    from nobletools_spark.sources.fixtures import SPANS_DDL
    from nobletools_spark.streaming.stream import (
        read_upsert_state,
        start_incremental_maintenance,
    )

    idx = pytest_index()
    calls = []

    def annotate_fn(docs):
        calls.append(docs.count())
        return annotate(docs, idx, MatchConfig(), min_parallelism=1)

    in_path = str(tmp_path / "in")
    state = str(tmp_path / "state")
    rows = [("d1", [("text", "deep margin is clear", None, 0)])]
    spark.createDataFrame(rows, SPANS_DDL).coalesce(1) \
        .write.parquet(f"{in_path}/b1")

    q = start_incremental_maintenance(
        read_document_stream(spark, f"{in_path}/*"), state,
        annotate_fn, str(tmp_path / "ck1"))
    q.awaitTermination(120)
    assert calls == [1]
    _, m = read_upsert_state(spark, state)
    before = _key(m.collect())

    # replay: fresh checkpoint re-delivers the same files as batch 0,
    # the pointer already says 0 — guard must skip without annotating
    q2 = start_incremental_maintenance(
        read_document_stream(spark, f"{in_path}/*"), state,
        annotate_fn, str(tmp_path / "ck2"))
    q2.awaitTermination(120)
    assert calls == [1]  # annotate_fn never re-ran
    _, m2 = read_upsert_state(spark, state)
    assert _key(m2.collect()) == before
