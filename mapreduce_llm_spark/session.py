"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]`` but every setting here is chosen to
also be the right default on a large cluster: AQE handles runtime
re-planning (partition coalescing, skew-join splitting), Arrow speeds
the pandas-UDF path, and the session timezone is pinned to UTC so
timestamp semantics match the DuckDB oracle and are deterministic
across cluster timezones.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mapreduce_llm_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``shuffle_partitions`` defaults to the local core count — on a real
    cluster you'd size it to ~2-3× total executor cores; AQE coalesces
    small post-shuffle partitions either way, so erring high is safe.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/mapreduce_llm_spark/warehouse"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    # ad-hoc conf overrides for A/B experiments and cluster tuning,
    # e.g. SPARK_GRAFT_CONF="spark.sql.join.preferSortMergeJoin=false;k=v"
    # — applied last so they win over the defaults above
    extra = os.environ.get("SPARK_GRAFT_CONF", "")
    for kv in filter(None, (s.strip() for s in extra.split(";"))):
        k, _, v = kv.partition("=")
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    if extra:
        # advisor round 14: getOrCreate returns any pre-existing
        # session and silently ignores builder configs — an A/B in a
        # warm process would measure defaults while believing the
        # override applied. Verify each override took; warn loudly
        # when it did not (static confs cannot be set post-creation).
        import sys as _sys

        for kv in filter(None, (s.strip() for s in extra.split(";"))):
            k, _, v = kv.partition("=")
            try:
                actual = spark.conf.get(k, None)
            except Exception:
                actual = None
            if actual != v:
                print(
                    f"WARNING: SPARK_GRAFT_CONF override {k}={v} NOT "
                    f"active (session pre-existed; actual={actual})",
                    file=_sys.stderr,
                )
    spark.sparkContext.setLogLevel("WARN")
    return spark
