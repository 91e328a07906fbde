"""SparkSession factory with scale-aware defaults.

Local mode is the test harness; the same config block is what we'd pass
to spark-submit on a real cluster (AQE + skew-join on, Arrow on).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "sjcs_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "48g",
    extra: dict[str, str] | None = None,
) -> SparkSession:
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    # make this package importable by Python UDF workers regardless of the
    # driver's cwd — the local-mode analog of `spark-submit --py-files`
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{pkg_root}{os.pathsep}{pp}" if pp else pkg_root
    if shuffle_partitions is None:
        # match parallelism, not the 200 default
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = 32 if n == "*" else max(8, int(n))
    b = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bigger Arrow batches amortize per-batch Python/IPC overhead in
        # the mapInPandas kernels (bcast shell count, image ops); 64k rows
        # of (id, 3 coords) is ~2 MB — well within executor memory
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # CPU-saturating Arrow kernels (bcast shell count) can starve the
        # executor<->driver heartbeat thread on small pinned-core runs;
        # generous timeouts are the standard setting for PandasUDF-heavy
        # jobs and change nothing else
        .config("spark.executor.heartbeatInterval", "60s")
        .config("spark.network.timeout", "900s")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if spark.sparkContext.getCheckpointDir() is None:
        # reliable-checkpoint home for iterative operators (knn).
        # SJCS_CHECKPOINT_DIR (a durable shared path — HDFS/S3) is
        # honored everywhere; the tempdir fallback applies ONLY in
        # local mode — on a multi-node cluster a driver-local tempdir
        # would make every executor checkpoint to its own disk
        # (unrecoverable), so there knn falls back to localCheckpoint
        # unless the env var names a shared path.
        ckpt = os.environ.get("SJCS_CHECKPOINT_DIR")
        if ckpt is None and spark.sparkContext.master.startswith("local"):
            import tempfile

            ckpt = tempfile.mkdtemp(prefix="sjcs-ckpt-")
        if ckpt is not None:
            spark.sparkContext.setCheckpointDir(ckpt)
    return spark
