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


def test_stream_shell_counts_matches_batch(spark):
    """Streaming micro-batches play the reference's per-file loop: the
    complete-mode sink must equal the batch shell_count over the same
    particles (SURVEY §3.1 accumulation semantics)."""
    import numpy as np

    from spatialjoincountovershells_spark import shell_count
    from spatialjoincountovershells_spark.streaming.stream_cells import (
        stream_shell_counts,
    )

    n_parts, n_halos = 400, 20
    edges = np.logspace(np.log2(30.0), np.log2(200.0), 4, base=2.0).astype(np.float32)

    def coords(df, key):
        for i, c in enumerate("xyz"):
            df = df.withColumn(
                c,
                ((F.col(key) * F.lit([2654435761, 2246822519, 3266489917][i]))
                 % F.lit(64000) / F.lit(64.0)).cast("float"),
            )
        return df
    halos = coords(
        spark.range(n_halos).withColumnRenamed("id", "halo_id"), "halo_id"
    ).select("halo_id", "x", "y", "z")
    stream = coords(
        spark.readStream.format("rate").option("rowsPerSecond", "2000").load()
        .where(F.col("value") < n_parts),
        "value",
    ).select("x", "y", "z")
    agg = stream_shell_counts(stream, halos, edges)
    q = (
        agg.writeStream.format("memory").queryName("shells")
        .outputMode("complete").start()
    )
    try:
        deadline = time.time() + 60
        want_df = coords(spark.range(n_parts), "id").select("x", "y", "z")
        want = {
            (r.halo_id, r.shell_idx): r.cnt
            for r in shell_count(halos, want_df, edges).collect()
        }
        got = {}
        while time.time() < deadline:
            q.processAllAvailable()
            got = {
                (r.halo_id, r.shell_idx): r.cnt
                for r in spark.sql("SELECT * FROM shells").collect()
            }
            if got == want:
                break
    finally:
        q.stop()
    assert got == want and len(want) > 0
