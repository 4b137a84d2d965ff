"""SparkSession factory tuned for the engine.

Defaults target local[N] testing but every knob is the one you would set on
a real multi-executor cluster: AQE on (runtime coalescing + skew-join
splitting), Arrow on (vectorized pandas UDF exchange), explicit shuffle
partition count, UTC session timezone (determinism).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def package_zip() -> str:
    """Zip this package for shipping to executors (spark-submit --py-files
    analogue, usable from a plain python process).

    The zip filename is keyed on a content hash of every .py source, so an
    edited package can never ship a stale zip from a previous process to
    the workers (a plain existence check would: /tmp persists across
    processes, and workers would then silently run old pandas-UDF code
    while the driver runs new code)."""
    import hashlib

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    sources = []
    for root, _dirs, files in os.walk(pkg_dir):
        for fn in files:
            if fn.endswith(".py"):
                full = os.path.join(root, fn)
                sources.append(
                    (os.path.join(pkg_name, os.path.relpath(full, pkg_dir)), full)
                )
    sources.sort()
    h = hashlib.sha1()
    for rel, full in sources:
        h.update(rel.encode())
        with open(full, "rb") as f:
            h.update(f.read())
    out = os.path.join(
        tempfile.gettempdir(), f"{pkg_name}-{h.hexdigest()[:12]}.zip"
    )
    if not os.path.exists(out):
        tmp = out + f".tmp{os.getpid()}"
        with zipfile.ZipFile(tmp, "w") as z:
            for rel, full in sources:
                z.write(full, rel)
        os.replace(tmp, out)  # atomic: concurrent processes can't torn-read
    return out


def get_spark(
    app_name: str = "rabbit-index-ingest-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` controls local parallelism (``local[cores]``); None → all.
    ``master`` overrides entirely — e.g. ``local-cluster[4,4,8192]`` spawns
    4 real executor JVMs × 4 cores (the sandbox stand-in for a
    multi-executor cluster; used by bench.py --scaling for the N-vs-4N
    evidence). On a real cluster you would drop ``.master`` and submit
    with ``spark-submit --py-files engine.zip`` (see cli.py).
    """
    cores_s = str(cores) if cores else os.environ.get("SPARK_GRAFT_CPUS", "*")
    shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cores_s}]")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # pandas-UDF stages are fed whole Arrow batches; the 10k default
        # makes the streaming pack stage pay per-batch overhead (carry
        # concat + numpy dispatch) ~7× more often than needed. 64k rows of
        # occurrence tuples ≈ a few MB per batch — safely inside task memory.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # Disable the per-batch BYTE-size cap (Int.MaxValue sentinel). With
        # a finite cap, Spark's Arrow writer re-measures the in-progress
        # batch per appended row (root.getBufferSize → struct-vector child
        # traversal + allocation): jstack-profiled at ~60% of ALL executor
        # CPU in the posting-pack stage; removing it took the stage from
        # 110 s to 52 s on 8 cores (and from 730 to 284 JVM CPU-seconds).
        # Our batches are bounded by maxRecordsPerBatch (65536 rows of
        # narrow tuples ≈ a few MB); on a pipeline with genuinely huge rows
        # (e.g. raw media blobs) re-set a finite value per stage instead.
        .config("spark.sql.execution.arrow.maxBytesPerBatch", "2147483647b")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # zstd for shuffle/broadcast/spill IO and for every parquet the
        # engine writes. The build is memory-/IO-bandwidth-bound at fixed
        # box size (the N→4N scaling measurement runs on tmpfs precisely
        # because disk BW doesn't scale with cores) — zstd spends CPU,
        # which DOES scale with cores, to move fewer bytes, which don't:
        # it buys scaling efficiency AND smaller segments. Spark's zstd
        # default level 1 ≈ lz4 speed at a visibly better ratio; override
        # per-session via extra_conf if a CPU-starved profile ever needs
        # lz4 back.
        .config("spark.io.compression.codec", "zstd")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.checkpoint.compress", "true")
        # local mode: driver heap IS the executor heap. Size it so each of
        # N concurrent tasks gets a real execution-memory share —
        # 8g/32 tasks ≈ 150MB/task spills and GC-thrashes (measured: a
        # 210k-turn build ran 5× slower at local[32] than local[8] on an
        # 8g heap). On a real cluster this is spark.executor.memory.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # Ship the engine to Python workers — the in-process equivalent of
    # `spark-submit --py-files engine.zip` (SURVEY.md §7 M7). Without this,
    # pandas-UDF closures referencing the package fail to unpickle on
    # workers launched from outside the repo directory.
    spark.sparkContext.addPyFile(package_zip())
    return spark
