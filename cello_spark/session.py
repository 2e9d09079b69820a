"""SparkSession factory tuned for this engine.

Local mode is the test harness; the configs are chosen so the same
code runs unchanged on a multi-executor cluster (AQE, adaptive skew
join, Arrow batching). Parallelism and shuffle partitioning are
parameterized so the bench can run the identical job at local[8] and
local[32] to evidence scaling efficiency.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

# Arrow batch size: bounds executor-Python memory for the matmul /
# reconciliation UDFs. 10k rows x (n_features=64 doubles + spans)
# stays well under 100 MB per batch.
ARROW_MAX_RECORDS = 10_000

# One BLAS thread per task slot: each Spark task already owns a core,
# so letting OpenBLAS/MKL spawn its own pool oversubscribes the box
# (measured 1.7x slowdown on the linking matmul at local[32]).
_BLAS_ENV = {
    "OPENBLAS_NUM_THREADS": "1",
    "OMP_NUM_THREADS": "1",
    "MKL_NUM_THREADS": "1",
    "NUMEXPR_NUM_THREADS": "1",
    # glibc malloc: numpy batch temporaries (Arrow batches are ~5 MB,
    # score/reconcile intermediates similar) sit far above the default
    # 128 KB mmap threshold, so every batch mmap/munmaps its arrays and
    # re-faults the pages — kernel-side cost that grows with worker
    # count. Pinning the thresholds keeps freed blocks on the arena
    # free-list instead (≤128 MB resident per worker, bounded).
    "MALLOC_MMAP_THRESHOLD_": "134217728",
    "MALLOC_TRIM_THRESHOLD_": "134217728",
    # pyarrow's DEFAULT pool is jemalloc, which returns freed batch
    # buffers to the kernel on a decay timer (madvise) — per-batch
    # page-return + re-fault churn whose TLB-shootdown IPIs cost more
    # the more cores are running. Route Arrow through the system
    # (glibc) allocator so the thresholds above govern it too, and
    # disable jemalloc decay for any component that still uses it.
    # (Measured on the linked stage at local[32]: ~15% less JVM+sys
    # CPU; no effect at local[8] — i.e. this is pure scaling tax.)
    "ARROW_DEFAULT_MEMORY_POOL": "system",
    "MALLOC_CONF": "dirty_decay_ms:-1,muzzy_decay_ms:-1",
}


def get_spark(
    app_name: str = "cello_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``cores`` defaults to $SPARK_GRAFT_CPUS or all local cores. On a
    real cluster the master/executor settings come from spark-submit
    and the ``local[...]`` master here is simply not used.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        # ~2x cores locally; on a cluster this would be tuned to
        # ~2-3x total executor cores (or left to AQE coalescing).
        shuffle_partitions = max(2 * cores, 16)

    # local mode: python workers fork under this process tree and
    # inherit its environment, so set the pins before the JVM starts
    for k, v in _BLAS_ENV.items():
        os.environ.setdefault(k, v)

    # 24g covers every workload in this repo (broadcast dims are
    # dict-sized; stage data streams through executors); a smaller
    # fixed heap keeps the AlwaysPreTouch startup tax low.
    driver_mem = os.environ.get("SPARK_DRIVER_MEM", "24g")

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        # smaller scan splits than the 128m default: local test inputs
        # are ~100MB-2GB, and a handful of oversized splits would both
        # serialize the scan and force ensure_min_partitions into a
        # full repartition shuffle. On a real cluster spark-submit
        # overrides this back to 128m+ (100 TB → plenty of splits).
        .config("spark.sql.files.maxPartitionBytes", "16m")
        # match openCost to the bin capacity so each small file gets
        # its own scan partition instead of being bin-packed 3-to-1:
        # local inputs are many ~1-6 MB files, and packing them down
        # to < task-slot partitions forced ensure_min_partitions into
        # a full text shuffle at high core counts ONLY (measured on
        # the 1M-doc bench: the mentions stage burned 2.75x the
        # core-seconds at local[32] vs local[8] because only the
        # 32-core run paid the repartition). Per-file splits give both
        # levels the identical no-shuffle plan — which is what a real
        # cluster sees, where the scan always has >> slots splits.
        .config("spark.sql.files.openCostInBytes", "16m")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_MAX_RECORDS),
        )
        .config("spark.driver.memory", driver_mem)
        # -Xms=-Xmx + AlwaysPreTouch: commit and touch the whole heap
        # at JVM start. Without it the heap grows lazily and every
        # fresh page costs a guest page fault + hypervisor EPT fault
        # while ALL allocating task threads contend on the mmap lock —
        # on this virtualized box that serialized the string-heavy
        # codegen stages at high parallelism (measured, synthetic
        # string-allocation job at local[32]: 21.6s lazy-growth vs
        # 5.8s pre-touched; real mentions stage: 79.7s vs 28.8s). The
        # earlier round's ParallelGCThreads=8 pin treated the symptom
        # (GC thrash amid fault storms); with a pre-touched fixed-size
        # heap, G1/ZGC/sized-ParallelGC all land within noise of each
        # other, so keep the JDK default G1. Pre-touch cost is a
        # one-time session startup tax, exactly what a long-lived
        # cluster executor amortizes.
        .config(
            "spark.driver.extraJavaOptions",
            f"-XX:+UseG1GC -XX:+AlwaysPreTouch -Xms{driver_mem}",
        )
        .config(
            "spark.executor.extraJavaOptions",
            "-XX:+UseG1GC -XX:+AlwaysPreTouch",
        )
        .config("spark.ui.enabled", "false")
        # worker reuse amortizes the ~1-2s numpy/pandas import per
        # Python worker across the pipeline's mapInPandas stages
        .config("spark.python.worker.reuse", "true")
        # deterministic float semantics for oracle comparison
        .config("spark.sql.legacy.allowUntypedScalaUDF", "false")
    )
    # cluster mode: the same pins must reach executor-side workers
    for k, v in _BLAS_ENV.items():
        builder = builder.config(f"spark.executorEnv.{k}", v)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ship_package(spark)
    return spark


def warm_python_workers(spark, waves: int = 2) -> float:
    """Pre-fork the Python worker pool: run a trivial mapInPandas over
    `waves x defaultParallelism` partitions so every task slot's worker
    is forked and has paid its pandas/numpy/Arrow import BEFORE any
    latency-sensitive stage runs. With spark.python.worker.reuse=true
    (set in get_spark) the warmed pool persists for the session.

    Measured on this box (local[32]): the first mapInPandas stage of a
    session pays ~10-15s of concurrent worker spin-up; after this
    warm-up the same stage runs in ~1-2s. On a long-lived cluster the
    pool outlives jobs and this is a no-op tax paid once per executor
    — the standard bring-up pattern for latency-sensitive Python
    stages. Returns the wall seconds spent."""
    import time as _time

    def _ident(batches):
        yield from batches

    n = waves * spark.sparkContext.defaultParallelism
    t0 = _time.monotonic()
    spark.range(2 * n).repartition(n).mapInPandas(_ident, "id long").count()
    return _time.monotonic() - t0


def build_pyfiles_zip(dest: str | None = None) -> str:
    """Zip the `cello_spark` package for `spark-submit --py-files` (or
    addPyFile). Returns the zip path."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = dest or os.path.join(
        tempfile.gettempdir(), f"cello_spark_pyfiles_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for fn in files:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.join(
                    "cello_spark", os.path.relpath(full, pkg_dir)
                )
                zf.write(full, rel)
    return zpath


def ship_package(spark: SparkSession) -> None:
    """Make `cello_spark` importable inside executor Python workers —
    the spark-submit --py-files pattern, done programmatically so any
    driver script (even one launched outside the repo) works. Zips the
    package once per session and addPyFile()s it; harmless no-op when
    already shipped."""
    sc = spark.sparkContext
    if sc._jsc is None:  # stopped session
        return
    marker = "_cello_spark_shipped"
    if getattr(sc, marker, False):
        return
    sc.addPyFile(build_pyfiles_zip())
    setattr(sc, marker, True)


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
