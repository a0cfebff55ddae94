"""SparkSession factory with scale-oriented defaults.

The reference hand-rolls bounded-memory pipelining (generator chains,
Queue(2) backpressure, memmap spill — dedupe/core.py:276-293); on Spark
all of that is the engine's job, so the session factory only sets the
knobs Catalyst/AQE can't guess:

- AQE on (runtime coalesce + skew-join splitting: the reference's
  anti-skew guards, canopy_index.py:20-38 / clustering.py:63-98, map to
  ``skewJoin.enabled`` plus our explicit block-size cap).
- Arrow enabled with a bounded batch size (= the reference's 20k-pair
  scoring chunk, dedupe/core.py:279).
- shuffle partitions sized for the local harness; on a real cluster this
  is set per-job from input size (see plans/pipeline.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def scratch_dir() -> str:
    """Scratch root for checkpoints/shuffle in the sandbox.

    Prefers tmpfs (/dev/shm): a single box's disk is a serial resource
    that caps scaling no matter the core count, whereas the real
    deployment writes checkpoints to object storage and shuffle to
    per-executor local disks — both of which scale with the executor
    count. tmpfs is the sandbox stand-in with the same scaling shape.
    Override with $SPARK_GRAFT_SCRATCH.
    """
    env = os.environ.get("SPARK_GRAFT_SCRATCH")
    if env:
        return env
    if os.path.isdir("/dev/shm"):
        return "/dev/shm/nycfd-scratch"
    import tempfile

    return tempfile.gettempdir()


def _resolve_master(master: str | None, environ) -> str | None:
    """Master to pass to the builder, or None to leave it alone.

    Under spark-submit the python driver attaches to an already-running
    JVM gateway whose spark.master came from the submit command
    (PythonRunner exports PYSPARK_GATEWAY_PORT); an explicit .master()
    there would OVERRIDE the submitted cluster topology with local[*].
    Only default the master when this process owns session creation."""
    if master is not None:
        return master
    if "PYSPARK_GATEWAY_PORT" in environ:
        return None
    return f"local[{environ.get('SPARK_GRAFT_CPUS', '*')}]"


def get_spark(
    app_name: str = "nycfd-spark",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for the ER pipeline.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` in the sandbox; on
    a real cluster it is left to spark-submit.
    """
    master = _resolve_master(master, os.environ)
    b = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Sandbox-scale split sizing: checkpointed stages are a few MB
        # here, and the 128m/64m defaults would collapse scans and
        # post-shuffle stages to 1-2 partitions — serializing every
        # downstream stage no matter how many cores local[N] has. On a
        # real cluster the inputs dwarf these thresholds and the
        # defaults (128m files / 64m advisory) are correct; override via
        # env for cluster runs.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PART_BYTES", "4m"),
        )
        .config("spark.sql.files.openCostInBytes", "262144")
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_BYTES", "4m"),
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Checkpoint bytes are the pipeline's contended resource — tmpfs
        # bandwidth here, object-store throughput/cost at cluster scale.
        # zstd trades (parallel, scalable) CPU for ~2x fewer bytes than
        # snappy on web text: measured a/b at 1M pages in BASELINE.md.
        .config(
            "spark.sql.parquet.compression.codec",
            os.environ.get("SPARK_GRAFT_PARQUET_CODEC", "zstd"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # ~ the reference's 20,000-pair scoring chunk (dedupe/core.py:279)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.local.dir", os.path.join(scratch_dir(), "spark-local"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if master is not None:
        b = b.master(master)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
