"""Iceberg runtime contract — executable on arrival (r5 verdict #7).

The sandbox has no iceberg-spark-runtime jar and no network, so the
IcebergIO path (sources/io.py:82) has never executed here. This module
makes that gap self-healing: it auto-skips while the jar is absent,
but the moment one appears (dropped into pyspark's jars dir, a
well-known location, or pointed at by $REDEYE_ICEBERG_JAR) the full
TableIO contract — overwrite/append/overwrite_partitions/read/delete,
resolve_io dispatch, and a SQL MERGE through the Iceberg extensions —
runs with zero new code.

Reference parity: redeye's sinks are stdout JSON (src/bin/redeye.rs:86);
the Iceberg sink is the BASELINE.json north_rule's deployment target
("fan-out sinks ... over Iceberg tables"), so this is the gate that
flips the last partial component to done on a real cluster.
"""

from __future__ import annotations

import glob
import os

import pytest


def _find_iceberg_jar() -> str | None:
    cand = os.environ.get("REDEYE_ICEBERG_JAR")
    if cand and os.path.exists(cand):
        return cand
    import pyspark

    patterns = [
        os.path.join(os.path.dirname(pyspark.__file__), "jars",
                     "iceberg-spark-runtime*.jar"),
        "/opt/spark/jars/iceberg-spark-runtime*.jar",
        "/usr/local/lib/iceberg/iceberg-spark-runtime*.jar",
        "/root/jars/iceberg-spark-runtime*.jar",
    ]
    for pat in patterns:
        hits = sorted(glob.glob(pat))
        if hits:
            return hits[-1]
    return None


JAR = _find_iceberg_jar()

pytestmark = pytest.mark.skipif(
    JAR is None,
    reason="iceberg-spark-runtime jar not present; this module "
           "self-activates when the runtime arrives "
           "(set $REDEYE_ICEBERG_JAR or drop the jar into pyspark/jars)",
)

CATALOG = "ice"


@pytest.fixture(scope="module")
def ice_spark(tmp_path_factory):
    from pyspark.sql import SparkSession

    # Catalog/jar confs only apply at JVM launch: a leftover session
    # from another module would silently lack them.
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()

    from redeye_spark.session import get_spark

    wh = str(tmp_path_factory.mktemp("iceberg_wh"))
    spark = get_spark(
        "iceberg-contract",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.jars": JAR,
            f"spark.sql.catalog.{CATALOG}":
                "org.apache.iceberg.spark.SparkCatalog",
            f"spark.sql.catalog.{CATALOG}.type": "hadoop",
            f"spark.sql.catalog.{CATALOG}.warehouse": wh,
            "spark.sql.extensions":
                "org.apache.iceberg.spark.extensions."
                "IcebergSparkSessionExtensions",
        },
    )
    yield spark
    spark.stop()


def test_resolve_io_dispatches_to_iceberg(ice_spark, tmp_path):
    from redeye_spark.sources.io import IcebergIO, iceberg_available, resolve_io

    assert iceberg_available(ice_spark, CATALOG)
    io = resolve_io(ice_spark, str(tmp_path), catalog=CATALOG)
    assert isinstance(io, IcebergIO)


def test_tableio_contract_roundtrip(ice_spark):
    from redeye_spark.sources.io import IcebergIO

    io = IcebergIO(CATALOG, namespace="contract")
    ice_spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {CATALOG}.contract")
    df = ice_spark.createDataFrame(
        [(1, "a", "s1"), (2, "b", "s1"), (3, "c", "s2")],
        "id long, v string, sink string",
    )
    io.write(df, "t", mode="overwrite", partition_by=["sink"])
    got = io.read(ice_spark, "t")
    assert sorted(r["id"] for r in got.collect()) == [1, 2, 3]

    io.write(
        ice_spark.createDataFrame([(4, "d", "s2")], df.schema), "t",
        mode="append",
    )
    assert io.read(ice_spark, "t").count() == 4

    # overwrite_partitions replaces only the touched partition
    io.write(
        ice_spark.createDataFrame([(9, "z", "s2")], df.schema), "t",
        mode="overwrite_partitions",
    )
    left = {r["id"] for r in io.read(ice_spark, "t").collect()}
    assert left == {1, 2, 9}

    io.delete(ice_spark, "t")
    with pytest.raises(Exception):
        io.read(ice_spark, "t").collect()


def test_merge_upsert_through_iceberg(ice_spark):
    """MERGE INTO — the maintenance upsert the parquet path emulates
    (plans/maintenance.py) runs natively on Iceberg."""
    ice_spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {CATALOG}.contract")
    t = f"{CATALOG}.contract.m"
    ice_spark.sql(f"DROP TABLE IF EXISTS {t}")
    ice_spark.sql(f"CREATE TABLE {t} (id BIGINT, v STRING) USING iceberg")
    ice_spark.sql(f"INSERT INTO {t} VALUES (1, 'old'), (2, 'keep')")
    ice_spark.createDataFrame(
        [(1, "new"), (3, "ins")], "id long, v string"
    ).createOrReplaceTempView("updates")
    ice_spark.sql(
        f"""MERGE INTO {t} tgt USING updates src ON tgt.id = src.id
            WHEN MATCHED THEN UPDATE SET tgt.v = src.v
            WHEN NOT MATCHED THEN INSERT *"""
    )
    got = {(r["id"], r["v"]) for r in ice_spark.sql(f"SELECT * FROM {t}").collect()}
    assert got == {(1, "new"), (2, "keep"), (3, "ins")}
    ice_spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_pipeline_reads_tokenized_iceberg_input(ice_spark):
    """End-to-end: the north-rule input shape (doc_id, tokens, n_tok,
    source) stored AS an Iceberg table feeds the parse pipeline."""
    from redeye_spark.functions.logparse import FORMAT_COMBINED
    from redeye_spark.operators.parse_op import parse_sequences
    from redeye_spark.sources.datagen import write_input_table
    from redeye_spark.sources.io import IcebergIO

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        write_input_table(d, 200, fmt="combined", seed=7, chunk=100)
        raw = ice_spark.read.parquet(d)
        io = IcebergIO(CATALOG, namespace="contract")
        ice_spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {CATALOG}.contract")
        io.write(raw, "raw_seq", mode="overwrite")
        parsed = parse_sequences(io.read(ice_spark, "raw_seq"), fmt=FORMAT_COMBINED)
        n = parsed.filter("error_kind IS NULL").count()
        assert n > 0
        io.delete(ice_spark, "raw_seq")
