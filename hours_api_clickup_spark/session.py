"""SparkSession factory with scale-aware defaults.

The reference runs single-threaded Python on 1 vCPU (Cloud Run,
``/root/reference/cloudbuild.yaml:30-31``); we target a multi-executor
cluster. Defaults here are tuned so the same code runs on ``local[N]``
for tests and on a 1000-executor cluster unchanged:

- AQE on: runtime shuffle-partition coalescing, skew-join splitting and
  dynamic broadcast decisions replace any hand-tuned partition counts.
- Session timezone pinned to UTC: the reference stores UTC timestamps and
  derives Europe/Oslo civil dates explicitly
  (``fetch_clickup_data.py:815-825``); nothing may depend on host tz.
- Arrow enabled: all pandas interchange (and any pandas UDF) is
  Arrow-batched, never row-at-a-time pickling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "hours-api-clickup-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    when no cluster master is configured — on a real cluster the
    deployment sets ``--master`` and this default is ignored because an
    active session already exists.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    n_shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # NOT set by default: spark.sql.adaptive.coalescePartitions.
        # initialPartitionNum. Measured trade (r10 curation soak, 1M
        # docs): 512 initial partitions halved the Gopher gate's gram
        # aggregation (415s → 226s — fixed 32-partition shuffles cross
        # the spill threshold as volume grows), but added ~0.1-0.3s of
        # task overhead to EVERY sub-second query at bench scale.
        # Volume-proportional sizing is therefore done per-operator
        # where the input size is known (pipelines.build_corpus); a
        # deployment can force it globally via SPARK_INITIAL_PARTITIONS.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if os.environ.get("SPARK_INITIAL_PARTITIONS"):
        builder = builder.config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            os.environ["SPARK_INITIAL_PARTITIONS"],
        )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
