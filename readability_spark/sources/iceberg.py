"""Iceberg source/sink wiring (SURVEY.md §1.4 / §7.1-M3).

The north rule targets an Iceberg table of Common-Crawl-style pages. Spark
speaks Iceberg through the runtime jar (`iceberg-spark-runtime-<spark>_<scala>`)
plus catalog configuration — this module owns that configuration so
`job.py --input iceberg:<table>` works on any cluster that ships the jar:

    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
        --conf spark.sql.catalog.local=org.apache.iceberg.spark.SparkCatalog \
        ... (or pass --iceberg-warehouse and let job.py set these)

This sandbox has no Iceberg jar and no network, so the integration test
(tests/test_iceberg.py) skips unless the classes are present; everything
here is exercised for config-shape either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CATALOG = "local"


def iceberg_conf(warehouse_dir: str, catalog: str = CATALOG) -> dict:
    """Session conf for a filesystem (hadoop) Iceberg catalog — the zero-
    dependency catalog that works on a bare cluster; swap type=hadoop for
    a REST/Glue/Hive catalog in managed deployments."""
    return {
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse_dir,
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
    }


def apply_iceberg_conf(builder, warehouse_dir: str, catalog: str = CATALOG):
    """Apply :func:`iceberg_conf` onto a SparkSession.Builder."""
    for k, v in iceberg_conf(warehouse_dir, catalog).items():
        builder = builder.config(k, v)
    return builder


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg runtime classes are on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def qualify(table: str, catalog: str = CATALOG) -> str:
    """'db.tbl' → 'local.db.tbl' unless already catalog-qualified."""
    return table if table.count(".") >= 2 else f"{catalog}.{table}"


def read_pages(spark: SparkSession, table: str) -> DataFrame:
    """Read the Common-Crawl-shaped page table from an Iceberg catalog.
    Iceberg scans support the same pushdown/pruning contract as parquet
    (PushedFilters on html_len, partition pruning on bucket columns) plus
    snapshot isolation — the resume manifest protocol is unchanged."""
    return spark.read.format("iceberg").load(qualify(table))


def write_result(df: DataFrame, table: str) -> None:
    """Write extraction output to an Iceberg table, idempotently.

    First write creates the table partitioned by ``bucket`` (same layout
    contract as the parquet path, so bucket-filtered resume reads prune).
    Subsequent writes use ``overwritePartitions`` — the Iceberg analogue of
    dynamic partition overwrite — so a resumed/rerun bucket atomically
    REPLACES its previous rows instead of appending duplicates.
    """
    from pyspark.sql import functions as F

    t = qualify(table)
    if not df.sparkSession.catalog.tableExists(t):
        writer = df.writeTo(t)
        if "bucket" in df.columns:
            writer = writer.partitionedBy(F.col("bucket"))
        writer.create()
    else:
        df.writeTo(t).overwritePartitions()
