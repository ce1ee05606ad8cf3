"""Table IO: Iceberg when a catalog is configured, Parquet dirs otherwise.

The north rule targets Iceberg tables; this sandbox ships no Iceberg
runtime jar, so the writer interface is swappable: `resolve_io` returns
an Iceberg-backed implementation when `spark.sql.catalog.<name>` is
configured (cluster deployments pass
--packages org.apache.iceberg:iceberg-spark-runtime-*), else Parquet
directories with an identical logical layout (table name -> path).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class TableIO:
    def read(self, spark: SparkSession, table: str, schema=None) -> DataFrame:
        raise NotImplementedError

    def write(self, df: DataFrame, table: str, mode: str = "overwrite", partition_by: list[str] | None = None,
              options: dict | None = None) -> None:
        raise NotImplementedError

    def location(self, table: str) -> str:
        raise NotImplementedError

    def delete(self, spark: SparkSession, table: str) -> None:
        raise NotImplementedError


class ParquetIO(TableIO):
    """Columnar-directory tables under a base dir (sandbox default:
    Parquet). The format is a class attribute so variants (OrcIO) share
    the mode-dispatch policy instead of copying it — and so consumers
    that inspect on-disk files (plans/maintenance.py compaction) can ask
    for the right data-file extension."""

    _fmt = "parquet"
    data_ext = ".parquet"

    def __init__(self, base_dir: str):
        self.base_dir = base_dir

    def location(self, table: str) -> str:
        return os.path.join(self.base_dir, table)

    def read(self, spark: SparkSession, table: str, schema=None) -> DataFrame:
        # an explicit schema (data columns; partition columns may be
        # included or left for discovery) skips the footer-sampling
        # schema-inference job a bare load pays per read
        r = spark.read.format(self._fmt)
        if schema is not None:
            r = r.schema(schema)
        return r.load(self.location(table))

    def write(self, df: DataFrame, table: str, mode: str = "overwrite", partition_by: list[str] | None = None,
              options: dict | None = None) -> None:
        # 'overwrite_partitions' = replace only the partitions present in
        # df (dynamic partition overwrite) — the idempotent commit unit
        # for checkpoint resume. Plain 'overwrite' pins static mode so a
        # full overwrite can never leave stale partitions behind.
        if mode == "overwrite_partitions":
            w = df.write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        elif mode == "overwrite":
            w = df.write.mode("overwrite").option("partitionOverwriteMode", "static")
        else:
            w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        # writer-tuning pass-through (e.g. per-column parquet dictionary
        # control); format-foreign keys are ignored by the writer
        for k, v in (options or {}).items():
            w = w.option(k, v)
        w.format(self._fmt).save(self.location(table))

    def delete(self, spark: SparkSession, table: str) -> None:
        import shutil

        shutil.rmtree(self.location(table), ignore_errors=True)


class OrcIO(ParquetIO):
    """ORC-directory tables — the other columnar format Spark ships
    built-in (no extra jars), same TableIO contract. Useful when the
    surrounding lake is Hive/ORC; Parquet remains the default (the
    testdata, bench corpus, and checkpoint paths all assume it)."""

    _fmt = "orc"
    data_ext = ".orc"


class IcebergIO(TableIO):
    """Iceberg catalog tables (requires the iceberg-spark-runtime jar)."""

    def __init__(self, catalog: str, namespace: str = "redeye"):
        self.catalog = catalog
        self.namespace = namespace

    def location(self, table: str) -> str:
        return f"{self.catalog}.{self.namespace}.{table}"

    def read(self, spark: SparkSession, table: str, schema=None) -> DataFrame:
        # schema is accepted for interface parity and ignored: the
        # catalog owns an Iceberg table's schema
        return spark.read.format("iceberg").load(self.location(table))

    def write(self, df: DataFrame, table: str, mode: str = "overwrite", partition_by: list[str] | None = None,
              options: dict | None = None) -> None:
        writer = df.writeTo(self.location(table))
        for k, v in (options or {}).items():
            writer = writer.option(k, v)
        if partition_by:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "overwrite":
            writer.createOrReplace()
        elif mode == "append":
            writer.append()
        elif mode == "overwrite_partitions":
            writer.overwritePartitions()
        else:
            raise ValueError(f"unsupported mode for iceberg: {mode}")

    def delete(self, spark: SparkSession, table: str) -> None:
        spark.sql(f"DROP TABLE IF EXISTS {self.location(table)}")


def iceberg_available(spark: SparkSession, catalog: str) -> bool:
    try:
        impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
    except Exception:
        impl = None
    if not impl:
        return False
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def resolve_io(spark: SparkSession, base_dir: str, catalog: str = "iceberg") -> TableIO:
    if iceberg_available(spark, catalog):
        return IcebergIO(catalog)
    return ParquetIO(base_dir)
