"""Contract tests for the catalog-gated Iceberg branch in ``tables``.

The sandbox has no Iceberg jar, and Spark's built-in session catalog
is V1-only (probed: ``writeTo(...).create()`` works, ``append()`` /
``createOrReplace()`` raise UNSUPPORTED_FEATURE.TABLE_OPERATION), so
the write branch cannot EXECUTE end-to-end locally. These tests pin it
two ways instead, so it cannot silently rot:

1. a recording double for ``DataFrame.writeTo`` asserts the exact
   DataFrameWriterV2 call sequence (identifier, ``partitionedBy``
   columns, ``createOrReplace`` vs ``append``) the branch emits;
2. the read branch and identifier construction run for REAL against a
   V2-created table in ``spark_catalog``.
"""

import pytest

from pignlproc_spark import tables


class _RecordingWriter:
    def __init__(self, log):
        self.log = log

    def partitionedBy(self, *cols):
        self.log.append(("partitionedBy", tuple(str(c) for c in cols)))
        return self

    def append(self):
        self.log.append(("append",))

    def createOrReplace(self):
        self.log.append(("createOrReplace",))


@pytest.fixture
def iceberg_conf(spark):
    spark.conf.set(tables.CATALOG_CONF, "ice")
    yield
    spark.conf.unset(tables.CATALOG_CONF)


def test_write_table_iceberg_call_sequence(spark, monkeypatch, iceberg_conf):
    log = []

    def fake_write_to(self, ident):
        log.append(("writeTo", ident))
        return _RecordingWriter(log)

    df = spark.createDataFrame([(1, "p0")], "id long, part string")
    # patch the concrete class (Spark 4's classic DataFrame overrides
    # the pyspark.sql.DataFrame base), so the branch hits the recorder
    monkeypatch.setattr(type(df), "writeTo", fake_write_to)

    ident = tables.write_table(df, "graph_triples", partition_by=["part"])
    assert ident == "ice.graph_triples"
    assert log == [
        ("writeTo", "ice.graph_triples"),
        ("partitionedBy", ("Column<'part'>",)),
        ("createOrReplace",),
    ]

    log.clear()
    tables.write_table(df, "graph_triples", mode="append")
    assert log == [("writeTo", "ice.graph_triples"), ("append",)]

    log.clear()
    tables.write_table(df, "graph_triples")  # no partitioning → no partitionedBy
    assert log == [("writeTo", "ice.graph_triples"), ("createOrReplace",)]


def test_write_table_without_catalog_is_parquet(spark, tmp_path):
    # conf unset → the parquet branch, returning a path not an identifier
    df = spark.createDataFrame([(1, "p0"), (2, "p1")], "id long, part string")
    out = tables.write_table(df, "plain_t", partition_by=["part"], root=str(tmp_path))
    assert out == str(tmp_path / "plain_t")
    back = spark.read.parquet(out)
    assert back.count() == 2 and set(back.columns) == {"id", "part"}


def test_read_table_catalog_dispatch(spark):
    # the READ branch executes for real: V2 create() into spark_catalog,
    # then read_table must resolve "<cat>.<name>" through the conf
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    spark.sql("DROP TABLE IF EXISTS spark_catalog.default.cat_read_t")
    df.writeTo("spark_catalog.default.cat_read_t").using("parquet").create()
    spark.conf.set(tables.CATALOG_CONF, "spark_catalog.default")
    try:
        assert tables.read_table(spark, "cat_read_t").count() == 2
    finally:
        spark.conf.unset(tables.CATALOG_CONF)
        spark.sql("DROP TABLE IF EXISTS spark_catalog.default.cat_read_t")
