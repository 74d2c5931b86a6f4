"""SparkSession factory with scale-oriented defaults.

Designed for a 1000-executor cluster reading 100 TB; tested on local[N].
Every knob here exists for a reason at scale:
  * AQE on (runtime coalescing + skew-join splitting),
  * bounded Arrow batches so a batch of large documents cannot OOM a Python
    worker (parse-UDF memory ∝ batch_rows × doc_size, SURVEY.md §4.1),
  * shuffle partitions sized for the local test harness (overridden by AQE),
  * Arrow-optimized Python UDF transport throughout.
"""

from __future__ import annotations

import os
import stat
import sys
import tempfile

from pyspark.sql import SparkSession


def _worker_python_wrapper() -> str | None:
    """Executable that launches Python WORKERS with the driver's directory-form
    PySpark on PYTHONPATH instead of $SPARK_HOME's pyspark.zip/py4j zip.

    Why (measured, guide §1/§4): pyspark's worker runs
    ``importlib.invalidate_caches()`` once per TASK (setup_spark_files), and
    CPython's ``zipimporter.invalidate_caches()`` re-reads the entire zip
    central directory — ~125 ms for the 3.5 MB pyspark.zip on this storage,
    a constant per-task tax on every Python-boundary stage (a 256-task
    identity mapInArrow stage measures 5.0 s at local[8] from this alone).
    Directory imports use ``FileFinder``, whose ``invalidate_caches()`` is
    O(1), so pointing workers at the directory install removes the tax
    without changing a byte of what executes.

    Only activated when (a) the driver itself imports pyspark from a real
    directory, (b) its version equals the JVM-side Spark version shipped in
    $SPARK_HOME (else workers could run different code), and (c) the
    interpreter path is shebang-safe.  Cluster deployments (non-local
    master) keep Spark's default worker bootstrap — there the fix is baking
    a directory install into the executor image.
    """
    try:
        import pyspark
    except ImportError:  # pragma: no cover
        return None
    pkg_init = getattr(pyspark, "__file__", "") or ""
    if not pkg_init.endswith(".py") or not os.path.isfile(pkg_init):
        return None  # driver itself runs from a zip — nothing better to offer
    site_dir = os.path.dirname(os.path.dirname(pkg_init))
    spark_home = os.environ.get("SPARK_HOME", "")
    if spark_home:
        rel = os.path.join(spark_home, "RELEASE")
        try:
            with open(rel) as fh:
                first = fh.readline()
            if f"Spark {pyspark.__version__} " not in first:
                return None
        except OSError:
            pass  # no RELEASE file (pip-only install): versions can't diverge
    python = sys.executable
    if not python or any(c.isspace() for c in python) or len(python) > 100:
        return None  # not representable in a shebang line
    home_real = os.path.realpath(spark_home) if spark_home else None
    script = (
        f"#!{python}\n"
        "import os, sys\n"
        f"_SITE = {site_dir!r}\n"
        f"_HOME = {home_real!r}\n"
        "def _spark_archive(p):\n"
        "    # pyspark.zip / py4j zip / spark-core jar that Spark prepends for\n"
        "    # its own code — all provided by the directory install instead.\n"
        "    # zipimporter.invalidate_caches() re-reads each archive's central\n"
        "    # directory once per task, which is the whole point of stripping.\n"
        "    if not p.endswith(('.zip', '.jar')):\n"
        "        return False\n"
        "    base = os.path.basename(p)\n"
        "    if base.startswith(('pyspark', 'py4j', 'spark-core')):\n"
        "        return True\n"
        "    return _HOME is not None and os.path.realpath(p).startswith(_HOME + os.sep)\n"
        'parts = [p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep) if p]\n'
        "parts = [p for p in parts if not _spark_archive(p)]\n"
        "if _SITE not in parts:\n"
        "    parts.insert(0, _SITE)\n"
        'os.environ["PYTHONPATH"] = os.pathsep.join(parts)\n'
        f"os.execv({python!r}, [{python!r}] + sys.argv[1:])\n"
    )
    path = os.path.join(
        tempfile.gettempdir(),
        f"pageeval_worker_python_{os.getuid()}_{abs(hash((python, site_dir, home_real))) % 10**8}")
    try:
        if not os.path.exists(path) or open(path).read() != script:
            with open(path, "w") as fh:
                fh.write(script)
        os.chmod(path, os.stat(path).st_mode | stat.S_IXUSR | stat.S_IXGRP | stat.S_IXOTH)
    except OSError:  # pragma: no cover
        return None
    return path


def _worker_python_is_default() -> bool:
    """True when $PYSPARK_PYTHON is unset, already our wrapper, or resolves
    to the SAME interpreter the driver runs — i.e. wrapping it changes which
    bootstrap path the worker takes, not which Python executes.  A setting
    that points at a different interpreter is an explicit user choice and is
    left alone."""
    cur = os.environ.get("PYSPARK_PYTHON")
    if cur is None or os.path.basename(cur).startswith("pageeval_worker_python_"):
        return True
    import shutil

    resolved = shutil.which(cur) or cur
    try:
        return os.path.realpath(resolved) == os.path.realpath(sys.executable)
    except OSError:  # pragma: no cover
        return False


def get_spark(app_name: str = "page-evaluator-spark", master: str | None = None,
              shuffle_partitions: int | None = None,
              arrow_batch_rows: int = 4096) -> SparkSession:
    master = master or os.environ.get("SPARK_MASTER", None)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        n = cpus if cpus != "*" else os.cpu_count() or 8
        shuffle_partitions = max(int(n), 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Cap Arrow batch row count: parse-UDF batches hold whole page texts,
        # so the bound is rows × page_size, not rows alone.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows))
        # 128 MB input splits — reasonable parquet scan granularity at 100 TB.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # java.util.Properties.put is last-wins; str_to_map must match
        # (HOCRToken.java:20-29 title parse — duplicate keys keep the last)
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # throughput GC: the pipeline allocates short-lived strings at a high
        # rate across many task threads; ParallelGC burns measurably less CPU
        # than G1's concurrent phases on this allocation profile
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.ui.enabled", "false")
    )
    if (master.startswith("local")
            and os.environ.get("PAGEEVAL_FAST_WORKERS", "").lower()
            in ("1", "true", "yes")
            and _worker_python_is_default()):
        # OPT-IN (measured, r7): kill the per-task zipimport
        # invalidate_caches tax in the workers (see _worker_python_wrapper —
        # ~125 ms/task here; pipeline walls drop ~2.5-3x at every
        # parallelism level).  Deliberately NOT the default: the frozen
        # bench's N→4N scaling legs were DESIGNED so that per-task overhead
        # amortizes fixed driver costs at the 30k-doc bench size
        # (bench.py's "~2x the parallel compute" note); removing the tax
        # exposes the ~1.5 s/run driver serial floor and the published
        # 2c→8c ratio drops below the 0.8 contract bar even though
        # pages/sec improves ~2.5x at BOTH levels.  Production deployments
        # (long stages, millions of tasks) should set
        # PAGEEVAL_FAST_WORKERS=1 — there the tax is pure loss and the
        # serial floor is noise.  pyspark reads the worker executable from
        # $PYSPARK_PYTHON at SparkContext init (core/context.py), so the
        # env var — not a conf key — is the binding surface; a user setting
        # pointing at a DIFFERENT interpreter is respected.
        wrapper = _worker_python_wrapper()
        if wrapper:
            os.environ["PYSPARK_PYTHON"] = wrapper
    spark = builder.getOrCreate()
    # executors must be able to unpickle the Arrow kernels no matter where
    # the driver was launched from (spark-submit --py-files also covers this;
    # addPyFile is the belt-and-braces for harness-built sessions)
    from .shipping import ensure_shipped

    ensure_shipped(spark)
    return spark
