"""Incremental KG maintenance (operators/incremental.py): the
incremental-equals-full contract, carry-forward isolation (the matcher
never sees unchanged docs), deletion semantics, fingerprint sensitivity
to every span field incl. ORDER (the north-rule invariant), and
snapshot_diff set semantics."""

import pytest
from pyspark.sql import functions as F

from nobletools_spark.model import MatchConfig
from nobletools_spark.operators.incremental import (
    doc_fingerprints,
    fingerprint_col,
    increment_stats,
    incremental_mentions,
    snapshot_diff,
)
from nobletools_spark.operators.matcher import annotate
from nobletools_spark.sources.fixtures import SPANS_DDL, builtin_index

CFG = MatchConfig()


def _docs(spark, rows):
    """rows: [(doc_id, [(kind, text, media_ref, offset), ...])]"""
    data = [(d, [{"kind": k, "text": t, "media_ref": m, "offset": o}
                 for (k, t, m, o) in spans]) for d, spans in rows]
    return spark.createDataFrame(data, SPANS_DDL)


OLD_ROWS = [
    ("d1", [("text", "spark runs a hash join fast", None, 0)]),
    ("d2", [("text", "the customer holds a vector", None, 0)]),
    ("d3", [("text", "sort merge beats table scan", None, 0),
            ("media", None, "media://d3", 28)]),
    ("d4", [("text", "window group by key", None, 0)]),
]
# d1 unchanged; d2 text edited; d3 deleted; d5 new
NEW_ROWS = [
    OLD_ROWS[0],
    ("d2", [("text", "the customer holds a spark vector", None, 0)]),
    OLD_ROWS[3],
    ("d5", [("text", "stream batch over a table scan", None, 0)]),
]


def _mention_sets(df):
    return {(r.doc_id, r.cui, r.start, r.end)
            for r in df.select("doc_id", "cui", "start", "end").collect()}


def test_incremental_equals_full(spark):
    old_docs, new_docs = _docs(spark, OLD_ROWS), _docs(spark, NEW_ROWS)
    fn = lambda d: annotate(d, builtin_index(), CFG)  # noqa: E731
    inc = incremental_mentions(new_docs, doc_fingerprints(old_docs),
                               fn(old_docs), fn)
    assert _mention_sets(inc) == _mention_sets(fn(new_docs))
    # deleted doc contributes nothing
    assert not [r for r in inc.collect() if r.doc_id == "d3"]


def test_matcher_never_sees_unchanged_docs(spark):
    old_docs, new_docs = _docs(spark, OLD_ROWS), _docs(spark, NEW_ROWS)
    base = annotate(_docs(spark, OLD_ROWS), builtin_index(), CFG)
    seen = []

    def fn(d):
        seen.append({r.doc_id for r in d.select("doc_id").collect()})
        return annotate(d, builtin_index(), CFG)

    inc = incremental_mentions(new_docs, doc_fingerprints(old_docs),
                               base, fn)
    inc.count()
    assert seen and seen[0] == {"d2", "d5"}  # changed + new only
    # carried rows for the unchanged doc are the OLD rows verbatim
    cols = ["doc_id", "cui", "matched_term", "score", "start", "end"]
    old_d1 = {tuple(r) for r in
              base.filter("doc_id = 'd1'").select(*cols).collect()}
    new_d1 = {tuple(r) for r in
              inc.filter("doc_id = 'd1'").select(*cols).collect()}
    assert old_d1 == new_d1 and old_d1


def test_increment_stats(spark):
    old_docs, new_docs = _docs(spark, OLD_ROWS), _docs(spark, NEW_ROWS)
    row = increment_stats(new_docs, doc_fingerprints(old_docs)).collect()[0]
    assert (row.n_new, row.n_changed, row.n_unchanged, row.n_deleted) \
        == (1, 1, 2, 1)


@pytest.mark.parametrize("mutate", [
    lambda s: s[::-1],                                     # span ORDER
    lambda s: [(("media",) + sp[1:]) if i == 0 else sp     # kind flip
               for i, sp in enumerate(s)],
    lambda s: [(sp[0], "edited", sp[2], sp[3]) if i == 0 else sp
               for i, sp in enumerate(s)],                 # text edit
    lambda s: [(sp[0], sp[1], "media://other", sp[3]) if i == 0 else sp
               for i, sp in enumerate(s)],                 # media swap
    lambda s: [(sp[0], sp[1], sp[2], sp[3] + 1) if i == 0 else sp
               for i, sp in enumerate(s)],                 # offset shift
    lambda s: s[:1],                                       # span dropped
])
def test_fingerprint_sensitive_to_span_fields(spark, mutate):
    spans = [("text", "a", None, 0), ("media", None, "media://x", 2)]
    a = _docs(spark, [("d", spans)])
    b = _docs(spark, [("d", mutate(spans))])
    fa = doc_fingerprints(a).collect()[0].fp
    fb = doc_fingerprints(b).collect()[0].fp
    assert fa != fb
    # and identical content → identical fingerprint
    assert fa == doc_fingerprints(_docs(spark, [("d", spans)])).collect()[0].fp


def test_fingerprint_null_vs_text_no_alias(spark):
    """(text=NULL, media_ref='x') must not collide with
    (text='x', media_ref=NULL) — the struct-hash null-skip trap the
    JSON rendering exists to avoid."""
    a = _docs(spark, [("d", [("media", None, "x", 0)])])
    b = _docs(spark, [("d", [("media", "x", None, 0)])])
    assert (doc_fingerprints(a).collect()[0].fp
            != doc_fingerprints(b).collect()[0].fp)


def test_fingerprint_atomic_columns_and_errors(spark):
    df = spark.createDataFrame([("d1", "t", 3), ("d2", None, 3)],
                               "doc_id string, text string, n int")
    fps = {r.doc_id: r.fp for r in doc_fingerprints(df).collect()}
    assert fps["d1"] != fps["d2"]
    with pytest.raises(ValueError):
        fingerprint_col(df.select("doc_id"))


def test_snapshot_diff_sets(spark):
    old = spark.createDataFrame(
        [(1, "p", "a"), (1, "p", "b"), (2, "p", "a"), (2, "p", "a")],
        "doc_id int, pred string, obj string")
    new = spark.createDataFrame(
        [(1, "p", "b"), (1, "p", "c"), (2, "p", "a")],
        "doc_id int, pred string, obj string")
    got = {(r.op, r.doc_id, r.obj) for r in snapshot_diff(old, new).collect()}
    assert got == {("added", 1, "c"), ("removed", 1, "a")}
    # no change → empty diff (duplicates collapse, EXCEPT DISTINCT)
    assert snapshot_diff(old, old).count() == 0


def test_no_op_snapshot_runs_matcher_on_nothing(spark):
    old_docs = _docs(spark, OLD_ROWS)
    fn_calls = []

    def fn(d):
        fn_calls.append(d.count())
        return annotate(d, builtin_index(), CFG)

    base = annotate(old_docs, builtin_index(), CFG)
    inc = incremental_mentions(old_docs, doc_fingerprints(old_docs),
                               base, fn)
    assert _mention_sets(inc) == _mention_sets(base)
    assert fn_calls == [0]


def test_fingerprint_injection_proof_across_columns(spark):
    """Netstring rendering: value bytes that imitate part boundaries
    must not let two different rows collide (the reserved-separator
    trap the length prefixes exist to avoid)."""
    ddl = "doc_id string, a string, b string"
    x = spark.createDataFrame([("d", "x", "y:b:q")], ddl)
    y = spark.createDataFrame([("d", "x:b:y", "q")], ddl)
    fx = doc_fingerprints(x).collect()[0].fp
    fy = doc_fingerprints(y).collect()[0].fp
    assert fx != fy
    # a literal 'N' value must not collide with NULL either
    n1 = spark.createDataFrame([("d", "N", "z")], ddl)
    n2 = spark.createDataFrame([("d", None, "z")], ddl)
    assert (doc_fingerprints(n1).collect()[0].fp
            != doc_fingerprints(n2).collect()[0].fp)


def test_increment_stats_empty_snapshot_reports_zeroes(spark):
    old_docs = _docs(spark, OLD_ROWS)
    empty = _docs(spark, [])
    row = increment_stats(empty, doc_fingerprints(old_docs)).collect()[0]
    assert (row.n_new, row.n_changed, row.n_unchanged, row.n_deleted) \
        == (0, 0, 0, len(OLD_ROWS))


def test_incremental_update_deltas(spark):
    old_docs, new_docs = _docs(spark, OLD_ROWS), _docs(spark, NEW_ROWS)
    from nobletools_spark.operators.incremental import incremental_update

    fn = lambda d: annotate(d, builtin_index(), CFG)  # noqa: E731
    base = fn(old_docs)
    mentions, removed, added = incremental_update(
        new_docs, doc_fingerprints(old_docs), base, fn)
    # removed = changed docs' stale rows + deleted docs' rows
    assert {r.doc_id for r in removed.select("doc_id").collect()} \
        == {"d2", "d3"}
    # added = changed + new docs' fresh rows
    assert {r.doc_id for r in added.select("doc_id").collect()} \
        == {"d2", "d5"}
    # maintained table == old - removed + added (as mention sets)
    assert _mention_sets(mentions) \
        == (_mention_sets(base) - _mention_sets(removed)) \
        | _mention_sets(added)


def test_incremental_cooccurrence_equals_full(spark):
    from nobletools_spark.operators.incremental import (
        incremental_cooccurrence,
        incremental_update,
    )
    from nobletools_spark.operators.triples import cooccurrence_triples

    fn = lambda d: annotate(d, builtin_index(), CFG)  # noqa: E731
    for salt in (0, 4):
        old_docs, new_docs = _docs(spark, OLD_ROWS), _docs(spark, NEW_ROWS)
        base = fn(old_docs).localCheckpoint(eager=True)
        _, removed, added = incremental_update(
            new_docs, doc_fingerprints(old_docs), base, fn)
        got = incremental_cooccurrence(
            cooccurrence_triples(base, salt), removed, added, salt)
        want = cooccurrence_triples(fn(new_docs), salt)
        as_set = lambda df: {tuple(r) for r in df.collect()}  # noqa: E731
        assert as_set(got) == as_set(want)


def test_incremental_cooccurrence_drops_zero_pairs(spark):
    """A pair whose every supporting doc departs must vanish, and a
    changed doc that KEEPS a pair must leave its count untouched."""
    from nobletools_spark.operators.incremental import (
        incremental_cooccurrence,
    )
    from nobletools_spark.operators.triples import cooccurrence_triples

    ddl = "doc_id string, cui string"
    old_m = spark.createDataFrame(
        [("a", "C1"), ("a", "C2"),          # doc a: pair C1-C2
         ("b", "C1"), ("b", "C2"),          # doc b: pair C1-C2
         ("c", "C2"), ("c", "C3")], ddl)    # doc c: pair C2-C3
    # doc c deleted; doc b re-annotated but keeps the same pair
    removed = spark.createDataFrame(
        [("c", "C2"), ("c", "C3"), ("b", "C1"), ("b", "C2")], ddl)
    added = spark.createDataFrame([("b", "C1"), ("b", "C2")], ddl)
    got = {(r.subj, r.obj): r.n_docs
           for r in incremental_cooccurrence(
               cooccurrence_triples(old_m), removed, added).collect()}
    assert got == {("C1", "C2"): 2}
