"""Structured-Streaming ingestion: cell-occupancy maintenance job."""

import time

from pyspark.sql import functions as F

from spatialjoincountovershells_spark.operators.cells import with_cell
from spatialjoincountovershells_spark.functions.phash import decode_phash
from spatialjoincountovershells_spark.streaming.stream_cells import (
    stream_cell_occupancy,
)


def _await_rows(spark, query, table, want, timeout_s=60):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        n = spark.sql(f"SELECT coalesce(sum(n), 0) AS s FROM {table}").collect()[0].s
        if n is not None and n >= want:
            return int(n)
        query.processAllAvailable()
    return int(n or 0)


def test_stream_cell_occupancy_matches_batch(spark):
    """Rate-source rows -> per-cell counts must equal the batch result
    over the same synthetic phash values."""
    n_rows, nc = 500, 8
    # deterministic phash derived from the rate value
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "1000")
        .load()
        .where(F.col("value") < n_rows)
        .withColumn("phash", F.xxhash64("value").bitwiseAND(F.lit((1 << 48) - 1)))
    )
    agg = stream_cell_occupancy(stream.select("phash"), ncells=nc)
    q = (
        agg.writeStream.format("memory")
        .queryName("occ")
        .outputMode("complete")
        .start()
    )
    try:
        total = _await_rows(spark, q, "occ", n_rows)
        assert total == n_rows
        got = {
            r.cell_id: r.n
            for r in spark.sql("SELECT cell_id, n FROM occ").collect()
        }
    finally:
        q.stop()
    batch = (
        spark.range(n_rows)
        .withColumn("phash", F.xxhash64("id").bitwiseAND(F.lit((1 << 48) - 1)))
        .select("phash")
    )
    want = {
        r.cell_id: r.n
        for r in with_cell(decode_phash(batch), nc)
        .groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
