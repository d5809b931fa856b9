"""SparkSession factory with scale-oriented defaults.

Local testing runs on local[N]; the same config block is what we'd pass to
spark-submit on a real cluster (AQE, skew-join handling, Arrow UDF batches).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32
# Arrow batch size for pandas UDFs: large enough to amortize Python call
# overhead for the HTML/chunking UDFs, small enough to bound per-batch memory
# when html columns are wide (a 100 KB-page batch of 512 rows ≈ 50 MB —
# bigger batches drove the JVM into GCLocker retries with 32 workers).
ARROW_BATCH_SIZE = 512


def get_spark(
    app_name: str = "louis-crawler-legacy-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    master: str | None = None,
    executor_memory: str = "4g",
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cpus``: int N → master local[N]; "*" → local[*]; None → env
    SPARK_GRAFT_CPUS or local[*].
    ``master``: explicit master override (e.g. ``local-cluster[4,2,4096]``
    for real multi-executor JVMs, or a cluster URL for spark-submit runs);
    wins over ``cpus``. Multi-executor masters need the package shipped —
    see ``ship_package`` (the spark-submit --py-files twin).
    """
    if master is None:
        if cpus is None:
            cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_SIZE)
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.executor.memory", executor_memory)
        # multi-executor: don't stall short stages waiting for cache-block
        # locality — the crawl round runs many small state jobs whose tasks
        # would otherwise each wait the default 3 s for their preferred
        # executor; remote reads of the small state blocks are cheaper
        .config("spark.locality.wait", "0s")
        # FAIR scheduling, three pools: the crawl engine's output appends /
        # checkpoint writes run as background jobs overlapping the next
        # round — under FIFO they are submitted EARLIER than the next
        # round's critical-path jobs and therefore hold strict priority for
        # task slots at a saturated local[32]; the weighted "background"
        # pool (1 vs default's 4) makes them yield instead. State MERGES
        # get their own equal-weight "state" pool: the round loop never
        # blocks on a merge (non-blocking views), so a merge stuck behind
        # the appends in the low-share FIFO background pool starves for
        # whole rounds at a saturated cluster — measured 10-50 s for a
        # 32-task union — and every uncovered round adds a delta the
        # critical path recomputes (O(lag) per round). Merges are tiny
        # (union of one round's additions, blob aggregate); at equal
        # weight they land within the next round's fetch. (CrawlEngine
        # tags its worker threads with spark.scheduler.pool.)
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.scheduler.allocation.file", _fair_allocation_file())
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    if master.startswith("local-cluster") or "://" in master:
        ship_package(spark)
    return spark


_FAIR_XML: str | None = None


def _fair_allocation_file() -> str:
    """Write the three-pool FAIR allocation (default / background /
    state) once per process (Spark only accepts a file path for pool
    definitions)."""
    global _FAIR_XML
    if _FAIR_XML is None:
        import atexit
        import shutil
        import tempfile

        tmpdir = tempfile.mkdtemp(prefix="fairsched_")
        atexit.register(shutil.rmtree, tmpdir, ignore_errors=True)
        path = os.path.join(tmpdir, "fairscheduler.xml")
        with open(path, "w") as f:
            f.write(
                '<?xml version="1.0"?>\n<allocations>\n'
                '  <pool name="default">\n'
                "    <schedulingMode>FIFO</schedulingMode>\n"
                "    <weight>4</weight>\n    <minShare>0</minShare>\n"
                "  </pool>\n"
                '  <pool name="background">\n'
                "    <schedulingMode>FIFO</schedulingMode>\n"
                "    <weight>1</weight>\n    <minShare>0</minShare>\n"
                "  </pool>\n"
                '  <pool name="state">\n'
                "    <schedulingMode>FIFO</schedulingMode>\n"
                "    <weight>4</weight>\n    <minShare>0</minShare>\n"
                "  </pool>\n"
                "</allocations>\n"
            )
        _FAIR_XML = path
    return _FAIR_XML


_PYFILES_ZIP: str | None = None


def ship_package(spark: SparkSession) -> None:
    """Ship louis_crawler_legacy_spark to the executors as a zip — the
    programmatic twin of ``spark-submit --py-files`` (scripts/run_crawl.py):
    executor-side Python workers unpickle our mapInPandas/applyInPandas
    functions by module reference, so multi-executor masters must be able
    to import the package without the driver's filesystem. The zip is built
    once per process (cached) and its temp dir is cleaned at exit."""
    global _PYFILES_ZIP
    if _PYFILES_ZIP is None:
        import atexit
        import shutil
        import tempfile
        import zipfile

        pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        tmpdir = tempfile.mkdtemp(prefix="pyfiles_")
        atexit.register(shutil.rmtree, tmpdir, ignore_errors=True)
        zpath = os.path.join(tmpdir, "louis_crawler_legacy_spark.zip")
        with zipfile.ZipFile(zpath, "w") as z:
            for root, _, files in os.walk(
                os.path.join(pkg_root, "louis_crawler_legacy_spark")
            ):
                for f in files:
                    if f.endswith(".py"):
                        p = os.path.join(root, f)
                        z.write(p, os.path.relpath(p, pkg_root))
        _PYFILES_ZIP = zpath
    spark.sparkContext.addPyFile(_PYFILES_ZIP)
