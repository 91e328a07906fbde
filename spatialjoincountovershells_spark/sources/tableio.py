"""Table I/O with Iceberg-first semantics and a parquet stand-in.

The BASELINE north_rule asks for Iceberg tables (checkpointed
per-partition lineage, resumable restarts).  This container ships no
iceberg-spark-runtime jar and has no network to fetch one, so the
Iceberg path cannot execute here — that waiver is documented in README
and BENCH/BASELINE.md.  What this module guarantees instead:

* `iceberg_available(spark)` probes the session JVM for Iceberg's
  SparkCatalog class (the class the runtime jar provides);
* `write_table` / `read_table` route through DataFrameWriterV2
  (`df.writeTo(ident).using("iceberg")` / `spark.table(ident)`) when
  the runtime is present, and degrade to parquet directories at the
  same `location` string otherwise.

Swap-in on a real cluster is configuration, not code:

    spark.jars.packages=org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>
    spark.sql.catalog.sjcs=org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.sjcs.type=hadoop
    spark.sql.catalog.sjcs.warehouse=<path>

after which every pipeline location like "sjcs.db.particles" resolves
through Iceberg with snapshot isolation, and the parquet stand-in's
_SJCS_DONE marker is subsumed by Iceberg's own snapshot commit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the session's JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def resolve_format(spark: SparkSession, fmt: str | None = None) -> str:
    if fmt in ("iceberg", "parquet"):
        return fmt
    return "iceberg" if iceberg_available(spark) else "parquet"


def write_table(
    df: DataFrame, location: str, mode: str = "overwrite", fmt: str | None = None
) -> str:
    """Write df to `location` (catalog identifier under Iceberg, directory
    path under the parquet stand-in).  Returns the format used."""
    fmt = resolve_format(df.sparkSession, fmt)
    if fmt == "iceberg":
        w = df.writeTo(location).using("iceberg")
        if mode == "overwrite":
            w.createOrReplace()
        else:
            w.append()
    else:
        df.write.mode(mode).parquet(location)
    return fmt


def read_table(spark: SparkSession, location: str, fmt: str | None = None) -> DataFrame:
    fmt = resolve_format(spark, fmt)
    if fmt == "iceberg":
        return spark.table(location)
    return spark.read.parquet(location)
