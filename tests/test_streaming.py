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


def test_stream_shell_counts_stateful_accumulates_across_batches(spark, tmp_path):
    """applyInPandasWithState running totals: two deterministic file-source
    micro-batches; after batch 1 the update-mode sink holds exactly the
    batch-1 counts, after batch 2 the latest row per key equals the batch
    shell_count over BOTH files — the reference's per-file accumulation
    loop (src/astr_rcount/main.c running totals) as explicit group state."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import FloatType, StructField, StructType

    from spatialjoincountovershells_spark import shell_count
    from spatialjoincountovershells_spark.streaming.stream_cells import (
        stream_shell_counts_stateful,
    )

    n_parts, n_halos = 400, 20
    edges = np.logspace(np.log2(30.0), np.log2(200.0), 4, base=2.0).astype(np.float32)

    def pos(ids):
        mults = (2654435761, 2246822519, 3266489917)
        return {
            c: ((ids * m) % 64000 / 64.0).astype(np.float32)
            for c, m in zip("xyz", mults)
        }

    halos = spark.createDataFrame(
        [
            (int(i), *(float(pos(np.array([i + 7919]))[c][0]) for c in "xyz"))
            for i in range(n_halos)
        ],
        "halo_id long, x float, y float, z float",
    )
    src = tmp_path / "parts"
    src.mkdir()
    ids = np.arange(n_parts, dtype=np.int64)
    halves = [ids[: n_parts // 2], ids[n_parts // 2:]]
    pq.write_table(pa.table(pos(halves[0])), src / "b1.parquet")

    schema = StructType([StructField(c, FloatType()) for c in "xyz"])
    stream = spark.readStream.schema(schema).parquet(str(src))
    agg = stream_shell_counts_stateful(stream, halos, edges)
    q = (
        agg.writeStream.format("memory").queryName("shells_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )

    def batch_counts(id_arr):
        df = spark.createDataFrame(
            [tuple(map(float, r)) for r in np.column_stack(
                [pos(id_arr)[c] for c in "xyz"])],
            "x float, y float, z float",
        )
        return {
            (r.halo_id, r.shell_idx): r.cnt
            for r in shell_count(halos, df, edges).collect()
        }

    try:
        q.processAllAvailable()
        got1 = {
            (r.halo_id, r.shell_idx): r.cnt
            for r in spark.sql("SELECT * FROM shells_state").collect()
        }
        assert got1 == batch_counts(halves[0]) and len(got1) > 0

        pq.write_table(pa.table(pos(halves[1])), src / "b2.parquet")
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT halo_id, shell_idx, max(cnt) AS cnt FROM shells_state "
            "GROUP BY halo_id, shell_idx"
        ).collect()
        got = {(r.halo_id, r.shell_idx): r.cnt for r in rows}
    finally:
        q.stop()
    want = batch_counts(ids)
    assert got == want
    # the totals really did grow across batches (state carried over)
    assert any(got[k] > got1[k] for k in got1)


def test_stream_shell_counts_stateful_resumes_from_checkpoint(spark, tmp_path):
    """North-rule resumability: STOP the stateful query after batch 1,
    restart a NEW query from the same checkpoint, feed batch 2 — the
    recovered group state must keep accumulating (final totals equal the
    batch shell_count over both files, not just file 2)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import FloatType, StructField, StructType

    from spatialjoincountovershells_spark import shell_count
    from spatialjoincountovershells_spark.streaming.stream_cells import (
        stream_shell_counts_stateful,
    )

    n_parts, n_halos = 300, 12
    edges = np.logspace(np.log2(30.0), np.log2(200.0), 4, base=2.0).astype(np.float32)

    def pos(ids):
        mults = (2654435761, 2246822519, 3266489917)
        return {
            c: ((ids * m) % 64000 / 64.0).astype(np.float32)
            for c, m in zip("xyz", mults)
        }

    halos = spark.createDataFrame(
        [
            (int(i), *(float(pos(np.array([i + 104729]))[c][0]) for c in "xyz"))
            for i in range(n_halos)
        ],
        "halo_id long, x float, y float, z float",
    )
    src = tmp_path / "parts"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    ids = np.arange(n_parts, dtype=np.int64)
    schema = StructType([StructField(c, FloatType()) for c in "xyz"])

    def start(rows):
        # the memory sink cannot recover from a checkpoint; foreachBatch can
        stream = spark.readStream.schema(schema).parquet(str(src))
        return (
            stream_shell_counts_stateful(stream, halos, edges)
            .writeStream.foreachBatch(
                lambda df, _eid: rows.extend(df.collect())
            )
            .outputMode("update").option("checkpointLocation", ckpt)
            .start()
        )

    pq.write_table(pa.table(pos(ids[:150])), src / "b1.parquet")
    rows1 = []
    q1 = start(rows1)
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()
    assert rows1  # batch 1 was processed and its offsets checkpointed

    pq.write_table(pa.table(pos(ids[150:])), src / "b2.parquet")
    rows2 = []
    q2 = start(rows2)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    got = {}
    for r in rows2:  # latest emission per key wins (counts are monotone)
        got[(r.halo_id, r.shell_idx)] = max(
            r.cnt, got.get((r.halo_id, r.shell_idx), 0)
        )
    pdf = spark.createDataFrame(
        [tuple(map(float, r)) for r in np.column_stack(
            [pos(ids)[c] for c in "xyz"])],
        "x float, y float, z float",
    )
    want = {
        (r.halo_id, r.shell_idx): r.cnt
        for r in shell_count(halos, pdf, edges).collect()
    }
    pdf2 = spark.createDataFrame(
        [tuple(map(float, r)) for r in np.column_stack(
            [pos(ids[150:])[c] for c in "xyz"])],
        "x float, y float, z float",
    )
    want2 = {
        (r.halo_id, r.shell_idx): r.cnt
        for r in shell_count(halos, pdf2, edges).collect()
    }
    # resume_b only ever SAW file 2 (the memory sink holds batch-2
    # updates only, so keys untouched by file 2 don't reappear): every
    # re-emitted total must be the TWO-file total, and at least one must
    # exceed its file-2-only count — both require the batch-1 state to
    # have been recovered from the checkpoint
    assert got and all(want[k] == v for k, v in got.items())
    assert any(v > want2.get(k, 0) for k, v in got.items())


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


def test_stream_job_available_now_incremental(spark, tmp_path):
    """jobs/sjcs_stream_job.py end-to-end: drain file 1 with
    --available-now, add file 2, rerun with the same checkpoint — the
    second run must process ONLY the new file and the totals view must
    equal the batch shell_count over both files."""
    import importlib.util
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spatialjoincountovershells_spark import shell_count

    spec = importlib.util.spec_from_file_location(
        "sjcs_stream_job",
        os.path.join(os.path.dirname(__file__), "..", "jobs", "sjcs_stream_job.py"),
    )
    job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(job)

    n_parts, n_halos = 300, 12
    edges_spec = "30:200:4"

    def pos(ids):
        mults = (2654435761, 2246822519, 3266489917)
        return {
            c: ((ids * m) % 64000 / 64.0).astype(np.float32)
            for c, m in zip("xyz", mults)
        }

    halos = spark.createDataFrame(
        [
            (int(i), *(float(pos(np.array([i + 15485863]))[c][0]) for c in "xyz"))
            for i in range(n_halos)
        ],
        "halo_id long, x float, y float, z float",
    )
    halo_file = str(tmp_path / "halos")
    halos.write.parquet(halo_file)
    src = tmp_path / "incoming"
    src.mkdir()
    ids = np.arange(n_parts, dtype=np.int64)
    pq.write_table(pa.table(pos(ids[:150])), src / "b1.parquet")

    class Args:
        particle_dir = str(src)
        halo_file_ = halo_file
        radius = edges_spec
        output = str(tmp_path / "totals")
        checkpoint = str(tmp_path / "ckpt")
        stateful = True
        available_now = True
        box = 1000.0
        dtype = "float32"

    Args.halo_file = Args.halo_file_
    out1 = job.run_stream_job(spark, Args)
    assert out1["drained"] and out1["total_keys"] > 0

    pq.write_table(pa.table(pos(ids[150:])), src / "b2.parquet")
    out2 = job.run_stream_job(spark, Args)
    assert out2["drained"]

    got = {
        (r.halo_id, r.shell_idx): r.cnt
        for r in job.read_totals(spark, Args.output).collect()
    }
    pdf = spark.createDataFrame(
        [tuple(map(float, r)) for r in np.column_stack(
            [pos(ids)[c] for c in "xyz"])],
        "x float, y float, z float",
    )
    edges = job.parse_radius(edges_spec)
    want = {
        (r.halo_id, r.shell_idx): r.cnt
        for r in shell_count(halos, pdf, edges).collect()
    }
    assert got == want and len(got) > 0


def test_stream_near_dup_matches_batch_join(spark):
    """Arriving docs flagged against a static corpus: the streaming
    stream-static band join must emit exactly the rows the same join
    produces in batch (identical per-row bucket exprs on both sides —
    exact replays collide in all 8 bands, unrelated text in none)."""
    from spatialjoincountovershells_spark.operators.dedup import (
        minhash_band_buckets,
    )
    from spatialjoincountovershells_spark.streaming.stream_dedup import (
        stream_near_dup,
    )

    corpus_texts = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "how vexingly quick daft zebras jump",
    ]
    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus_texts)], "doc_id long, text string"
    )
    corpus_buckets = minhash_band_buckets(corpus)
    stream_texts = [
        corpus_texts[1],
        "a completely unrelated sequence of words xyzzy plugh",
        corpus_texts[0],
    ]
    arr = F.array(*[F.lit(t) for t in stream_texts])
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "100")
        .load()
        .where(F.col("value") < len(stream_texts))
        .select(
            (F.col("value") + 1000).alias("doc_id"),
            F.element_at(arr, F.col("value").cast("int") + 1).alias("text"),
        )
    )
    out = stream_near_dup(stream, corpus_buckets)
    batch_docs = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(stream_texts)],
        "doc_id long, text string",
    )
    want = {
        (r.doc_id, r.corpus_doc_id, r.band)
        for r in stream_near_dup(batch_docs, corpus_buckets).collect()
    }
    assert want  # the replayed docs must collide (exact dup -> all bands)
    q = (
        out.writeStream.format("memory")
        .queryName("ndup")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 60
        got = set()
        while time.time() < deadline and len(got) < len(want):
            q.processAllAvailable()
            got = {
                (r.doc_id, r.corpus_doc_id, r.band)
                for r in spark.sql(
                    "SELECT doc_id, corpus_doc_id, band FROM ndup"
                ).collect()
            }
    finally:
        q.stop()
    assert got == want
