"""SparkSession factory tuned for the engine.

Scale notes (100 TB / 1000-executor target):
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting
  and dynamic join-strategy switching replace hand-tuned partition
  counts when the real cluster sees real data volumes.
- ``spark.sql.shuffle.partitions`` here is a local-mode default; on a
  real cluster it should be ~2-3x total cores and AQE coalesces down.
- Arrow enabled so the few Pandas-UDF paths (multimodal decode) get
  columnar batch transfer instead of per-row pickling.
- Session timezone pinned to UTC: the reference stores DATETIME2 "UTC"
  naive timestamps; pinning makes hour/date extractions deterministic
  and oracle-comparable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DEFAULT_SHUFFLE_PARTITIONS = "32"

CHECKPOINT_MODE_CONF = "spark.graft.checkpoint.mode"


def pin(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize a frame and truncate its lineage.

    Every iterative operator (connected components, Lloyd iterations,
    BPE merge rounds, the ranged-boundary frames in operators/ranks.py)
    pins intermediate frames so lineage stays O(1) across rounds and a
    repartitionByRange sample is taken exactly once.  This helper is
    the single seam that picks HOW:

    - ``local`` (default): ``localCheckpoint`` — executor-local blocks,
      no distributed-FS round-trip.  Right for local[n] and for
      clusters where executor loss mid-query is acceptable (the job
      restarts).
    - ``reliable``: ``checkpoint`` to ``spark.checkpoint.dir`` — the
      1000-executor posture, where an executor loss must not kill a
      multi-hour iterative job.  The directory comes from the session
      conf (``spark.checkpoint.dir``) if the SparkContext has none set.

    Mode is read per call from session conf ``spark.graft.checkpoint.mode``
    so the same plan code serves both deployments unchanged.
    """
    spark = df.sparkSession
    mode = "local"
    try:
        mode = spark.conf.get(CHECKPOINT_MODE_CONF, "local")
    except Exception:
        pass
    if mode == "reliable":
        sc = spark.sparkContext
        if sc.getCheckpointDir() is None:
            ckdir = None
            try:
                ckdir = spark.conf.get("spark.checkpoint.dir", None)
            except Exception:
                pass
            if ckdir is None:
                raise ValueError(
                    f"{CHECKPOINT_MODE_CONF}=reliable requires "
                    "spark.checkpoint.dir (or SparkContext.setCheckpointDir)")
            sc.setCheckpointDir(ckdir)
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def _ensure_pythonpath() -> None:
    """Make this package importable in freshly spawned Python workers.

    Pandas-UDF bodies and Python data source classes
    (streaming/txn_source.py) are pickled BY REFERENCE — the worker
    process re-imports them by module name, so the repo root must be
    on the worker's import path.  Workers inherit the driver's
    PYTHONPATH env var (local mode spawns them from the same
    environment); running from the repo root happens to work via the
    daemon's cwd entry, but any other driver cwd would fail the
    import.  Must run BEFORE the JVM/daemon starts — mutating
    os.environ later never reaches already-spawned workers."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            root + (os.pathsep + pp if pp else ""))


def get_spark(app_name: str = "azure-nyctaxi-lambda-elt-spark") -> SparkSession:
    """Build (or fetch) a local SparkSession with engine defaults."""
    _ensure_pythonpath()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", DEFAULT_SHUFFLE_PARTITIONS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # bucketed-table support (co-located joins): keep the embedded
        # metastore + warehouse out of the repo working tree
        .config("spark.sql.warehouse.dir", "/tmp/spark_graft_warehouse")
        .config("spark.driver.extraJavaOptions",
                "-Dderby.system.home=/tmp/spark_graft_derby")
        # reliable-checkpoint GC (pin() in 'reliable' mode): without
        # this, every iterative round's checkpoint persists on the
        # checkpoint FS forever — a multi-hour CC/PageRank/BPE job
        # would leak one table-sized copy per round.  Core-cleaner
        # conf: must be set at context build, not via spark.conf.set
        .config("spark.cleaner.referenceTracking.cleanCheckpoints",
                "true")
    )
    return builder.getOrCreate()


def apply_engine_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally supplied
    session (the driver owns the session in `__spark_entry__`).

    Only touches keys that are safe to set after session start.

    shuffle.partitions is pinned too: the iterative float-summing
    operators (k-means centroid means feeding the unrolled-Lloyd
    oracles) accumulate doubles in partition order, so a session with
    a different partition count could drift a centroid by an ulp and
    flip an argmin — every green driver row was produced at 32, keep
    it that way regardless of the owning session's default.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.shuffle.partitions",
                   DEFAULT_SHUFFLE_PARTITIONS)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    return spark
