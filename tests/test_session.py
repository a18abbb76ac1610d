"""local_table: driver-literal dimension tables must evaluate as JVM
LocalRelations (LocalTableScan — no pickled-Python-RDD scan), with a
correct fallback for rows Arrow can't convert."""

from pyspark.sql import types as T

from nobletools_spark.session import local_table


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_local_table_is_local_relation(spark):
    df = local_table(spark, [("a", 1), ("b", None)], "k string, v long")
    assert "LocalTableScan" in _physical(df)
    assert "ExistingRDD" not in _physical(df)
    assert [(r.k, r.v) for r in df.collect()] == [("a", 1), ("b", None)]


def test_local_table_arrays_and_structtype(spark):
    df = local_table(spark, [("c1", ["s1", "s2"]), ("c2", [])],
                     "cui string, syn array<string>")
    assert "LocalTableScan" in _physical(df)
    assert {tuple(r.syn) for r in df.collect()} == {("s1", "s2"), ()}
    schema = T.StructType([T.StructField("s", T.StringType()),
                           T.StructField("n", T.IntegerType())])
    df2 = local_table(spark, [("x", 7)], schema)
    assert "LocalTableScan" in _physical(df2)
    assert df2.schema == schema


def test_local_table_nullable_bigints_exact(spark):
    """A nullable long column must keep values > 2^53 exact — pandas
    from_records would coerce to float64 and silently corrupt 60-bit
    hash keys."""
    big = 2**60 + 1
    df = local_table(spark, [(big,), (None,), (3,)], "v long")
    assert "LocalTableScan" in _physical(df)
    assert [r.v for r in df.collect()] == [big, None, 3]


def test_local_table_empty_rows(spark):
    df = local_table(spark, [], "k string, v long")
    assert df.count() == 0
    assert df.schema.simpleString() == "struct<k:string,v:bigint>"
    assert "ExistingRDD" not in _physical(df)


def test_local_table_struct_dicts_and_tuple_fallback(spark):
    ddl = "doc string, spans array<struct<kind:string, off:int>>"
    # dict cells take the Arrow LocalRelation path
    df = local_table(spark, [("d1", [{"kind": "text", "off": 0}])], ddl)
    assert "LocalTableScan" in _physical(df)
    assert df.collect()[0].spans[0].kind == "text"
    # tuple cells can't convert via Arrow — the fallback must still
    # produce the same rows (as an ExistingRDD scan)
    df2 = local_table(spark, [("d1", [("text", 0)])], ddl)
    assert df2.collect()[0].spans[0].kind == "text"


def test_local_table_auto_broadcasts(spark):
    """Known LocalRelation sizes let the planner broadcast a tiny dim
    without an explicit hint — the property the tiny-join plans rely
    on."""
    dim = local_table(spark, [("a", 1), ("b", 2)], "k string, v long")
    fact = spark.range(100).selectExpr(
        "cast(id % 2 as string) as kk", "id")
    plan = _physical(fact.join(dim, fact.kk == dim.k))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_package_zip_rebuilds_when_source_changes(tmp_path, monkeypatch):
    """The shipped-package zip is keyed by source content (sizes +
    mtimes), never the pid: a stale zip would make executors run old
    code while the driver plans with new code."""
    import os

    from nobletools_spark.session import package_zip_path

    p1 = package_zip_path()
    assert os.path.exists(p1)
    # same source state → same cached path (idempotent)
    assert package_zip_path() == p1
    # touching a source file (mtime bump) must change the key
    import nobletools_spark

    src = os.path.abspath(nobletools_spark.__file__)
    st = os.stat(src)
    try:
        os.utime(src, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
        p2 = package_zip_path()
        assert p2 != p1
        assert os.path.exists(p2)
    finally:
        os.utime(src, ns=(st.st_atime_ns, st.st_mtime_ns))


def test_get_spark_wildcard_and_none_cores_normalize():
    """cores=None must not build master 'local[None]'."""
    from unittest import mock

    from nobletools_spark import session as S

    seen = {}

    class _B:
        def master(self, m):
            seen["master"] = m
            raise RuntimeError("stop here")

    with mock.patch.object(S, "ship_package"):
        import pyspark.sql as ps

        with mock.patch.object(ps.SparkSession, "builder", _B()):
            for cores in (None, "*"):
                try:
                    S.get_spark(cores=cores)
                except RuntimeError:
                    pass
                assert seen["master"] == "local[*]"
