"""Streaming geodetic operators: live tile map + great-circle shell
counts of arriving lat/lon rows vs their batch twins."""

import time

import numpy as np
from pyspark.sql import functions as F

from spatialjoincountovershells_spark.operators.geo import (
    geo_shell_count,
    geo_tile_stats,
    with_key_latlon,
)
from spatialjoincountovershells_spark.streaming.stream_cells import (
    stream_geo_shell_counts,
    stream_geo_tile_counts,
)


def _await_total(spark, query, table, col, want, timeout_s=90):
    deadline = time.time() + timeout_s
    n = 0
    while time.time() < deadline:
        n = spark.sql(
            f"SELECT coalesce(sum({col}), 0) AS s FROM {table}"
        ).collect()[0].s
        if n is not None and n >= want:
            return int(n)
        query.processAllAvailable()
    return int(n or 0)


def test_stream_geo_tile_counts_matches_batch(spark):
    n_rows, level = 400, 4
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "1000")
        .load()
        .where((F.col("value") >= 1) & (F.col("value") <= n_rows))
        .withColumnRenamed("value", "k")
    )
    agg = stream_geo_tile_counts(with_key_latlon(stream, "k"), level=level)
    q = (
        agg.writeStream.format("memory").queryName("geo_tiles_s")
        .outputMode("complete").start()
    )
    try:
        total = _await_total(spark, q, "geo_tiles_s", "n", n_rows)
        assert total == n_rows
        got = {
            r.tile_id: r.n
            for r in spark.sql("SELECT tile_id, n FROM geo_tiles_s").collect()
        }
    finally:
        q.stop()
    batch = with_key_latlon(
        spark.range(1, n_rows + 1).withColumnRenamed("id", "k"), "k")
    want = {
        r.tile_id: r.n
        for r in geo_tile_stats(batch, level=level).collect()
    }
    assert got == want


def test_stream_geo_shell_counts_matches_batch(spark, tmp_path):
    """File-source stream of lat/lon rows vs a static 10-site table:
    the complete-mode sink must equal the batch geo_shell_count."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n_rows, edges_km = 600, [100.0, 400.0, 1500.0]
    keys = np.arange(1, n_rows + 1, dtype=np.int64)
    from spatialjoincountovershells_spark.operators.geo import latlon_np
    lat, lon = latlon_np(keys)
    src = tmp_path / "rows"
    src.mkdir()
    pq.write_table(pa.table({"lat": lat, "lon": lon}), src / "b1.parquet")

    sites = with_key_latlon(
        spark.range(1, 11).withColumnRenamed("id", "site_id"), "site_id")

    stream = spark.readStream.schema("lat double, lon double").parquet(
        str(src))
    agg = stream_geo_shell_counts(stream, sites, edges_km)
    q = (
        agg.writeStream.format("memory").queryName("geo_shells_s")
        .outputMode("complete").start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.site_id, r.shell_idx): r.cnt
            for r in spark.sql(
                "SELECT site_id, shell_idx, cnt FROM geo_shells_s"
            ).collect()
        }
    finally:
        q.stop()
    rows = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lat, lon)],
        "lat double, lon double",
    )
    want = {
        (r.probe_id, r.shell_idx): r.cnt
        for r in geo_shell_count(
            sites.withColumnRenamed("site_id", "probe_id"), rows, edges_km,
            id_col="probe_id",
        ).collect()
    }
    assert got == want
    assert sum(got.values()) > 0


def test_stream_geo_tile_counts_epoch_append_sink(spark, tmp_path):
    """End-to-end soak (VERDICT r3 #8): stream_geo_tile_counts composed
    with the epoch-append tableio sink — two availableNow drains over a
    watched directory (file 2 arrives between runs, same checkpoint),
    current totals read back as max-per-epoch must equal the batch
    tile rollup over BOTH files."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spatialjoincountovershells_spark.operators.geo import (
        geo_tile_expr,
        latlon_np,
    )
    from spatialjoincountovershells_spark.sources.tableio import (
        read_table,
        write_table,
    )

    level, n = 3, 600
    keys = np.arange(1, n + 1, dtype=np.int64)
    lat, lon = latlon_np(keys)
    src = tmp_path / "incoming"
    src.mkdir()
    half = n // 2
    pq.write_table(
        pa.table({"lat": lat[:half], "lon": lon[:half]}), src / "g1.parquet")

    out = str(tmp_path / "tile_totals")
    ckpt = str(tmp_path / "ckpt_geo")

    def drain():
        schema = spark.read.parquet(str(src)).schema
        stream = spark.readStream.schema(schema).parquet(str(src))
        counts = stream_geo_tile_counts(stream, level=level)

        def sink(batch_df, epoch_id):
            write_table(
                batch_df.withColumn("epoch_id", F.lit(int(epoch_id))),
                out, mode="append",
            )

        q = (
            counts.writeStream.foreachBatch(sink)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    pq.write_table(
        pa.table({"lat": lat[half:], "lon": lon[half:]}), src / "g2.parquet")
    drain()

    # complete-mode epochs are full snapshots: current totals = the rows
    # of the LATEST epoch that saw each tile
    t = read_table(spark, out)
    latest = t.groupBy("tile_id").agg(F.max_by("n", "epoch_id").alias("n"))
    got = {(r.tile_id, r.n) for r in latest.collect()}
    batch = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lat, lon)], "lat double, lon double"
    ).withColumn("tile_id", geo_tile_expr(F.col("lat"), F.col("lon"), level))
    want = {
        (r.tile_id, r.n)
        for r in batch.groupBy("tile_id").agg(
            F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want and len(got) > 0


def test_stream_trajectory_matches_batch(spark):
    """Stateful streaming trajectory totals == the batch operator over
    the same pings: per-user group state chains hops across
    micro-batches; update-mode rows are monotone so the per-user max of
    each (all-nondecreasing) column is the final state."""
    from spatialjoincountovershells_spark.operators.geo import (
        key_latlon_exprs,
        trajectory_stats,
    )
    from spatialjoincountovershells_spark.streaming.stream_cells import (
        stream_trajectory_stats,
    )

    n_rows, n_users = 400, 7

    def shape(df, key):
        lat, lon = key_latlon_exprs(F.col(key))
        return df.select(
            (F.col(key) % n_users).alias("user_id"),
            F.col(key).alias("ts"),
            F.col(key).alias("event_id"),
            lat.alias("lat"), lon.alias("lon"),
        )

    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "150")  # ~3s of rows: >= 2 micro-batches
        .load()
        .where(F.col("value") < n_rows)
    )
    out = stream_trajectory_stats(shape(stream, "value"))
    q = (
        out.writeStream.format("memory")
        .queryName("traj")
        .outputMode("update")
        .start()
    )
    try:
        deadline = time.time() + 90
        total = 0
        while time.time() < deadline and total < n_rows:
            q.processAllAvailable()
            total = spark.sql(
                "SELECT coalesce(sum(mx), 0) AS s FROM (SELECT "
                "max(n_pings) AS mx FROM traj GROUP BY user_id)"
            ).collect()[0].s or 0
        assert total == n_rows
        got = {
            r.user_id: (r.n_pings, r.path_len, r.max_hop, r.n_moves,
                        r.n_stays)
            for r in spark.sql(
                "SELECT user_id, max(n_pings) AS n_pings, "
                "max(path_len) AS path_len, max(max_hop) AS max_hop, "
                "max(n_moves) AS n_moves, max(n_stays) AS n_stays "
                "FROM traj GROUP BY user_id"
            ).collect()
        }
        # at least two non-empty micro-batches, so state really chained
        n_batches = sum(
            1 for p in q.recentProgress if p["numInputRows"] > 0)
    finally:
        q.stop()
    assert n_batches >= 2, "trajectory state never chained across batches"
    want = {
        r.user_id: (r.n_pings, r.path_len, r.max_hop, r.n_moves, r.n_stays)
        for r in trajectory_stats(shape(spark.range(n_rows), "id")).collect()
    }
    assert got == want
    assert len(want) == n_users
