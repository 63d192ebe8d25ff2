"""SparkSession factory tuned for the KG-construction workload.

Design notes (100 TB scale):

- AQE on (coalesce post-shuffle partitions, skew-join splitting) —
  hub entities in web corpora are Zipfian, so skewed joins are the
  norm, not the exception (SURVEY.md §4, BASELINE.json:6).
- Arrow on — every custom function in this engine is a vectorized
  pandas UDF (BASELINE.json:15 forbids per-row Python).
- ``spark.sql.shuffle.partitions`` defaults to the local core count
  here; on a real cluster set it to ~2–3× total cores via
  ``spark-submit --conf`` (the engine also repartitions explicitly on
  hashed subject URIs before wide stages — see operators/triples.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_session(
    app_name: str = "pignlproc-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with engine defaults.

    ``cpus`` controls local parallelism (``local[cpus]``); on a real
    cluster pass ``master=None`` semantics by pre-creating the session
    via spark-submit — this factory only fills in missing confs.
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        # CPU-bound pandas-UDF parse needs fine scan splits: the 128m
        # default gives one straggler-prone task per smallish file
        # (SURVEY.md §4 PARALLEL). 1m is right for local corpora; on a
        # real cluster size this so tasks run 0.5–5 min (32–128m).
        .config("spark.sql.files.maxPartitionBytes", "1m")
        # local mode: the driver JVM IS the executor — undersizing it
        # turns cache pressure into a GC storm that burns 10× CPU on
        # wide stages (measured); size like an executor, not a driver
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=UTC")
        .config("spark.executor.extraJavaOptions", "-Duser.timezone=UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_session() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
