"""SparkSession helpers: package shipping + a tuned local session factory."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def ship_package(spark: SparkSession) -> None:
    """Make ``lucene_spark`` importable on executor Python workers.

    Programmatic equivalent of ``spark-submit --py-files lucene_spark.zip``
    (the north-rule deployment shape): zip the package once per SparkContext
    and ``addPyFile`` it, so closures referencing the package unpickle on
    workers regardless of the driver's working directory.
    """
    sc = spark.sparkContext
    if getattr(sc, "_lucene_spark_shipped", False):
        return
    if not os.path.isdir(os.path.join(_REPO_DIR, "lucene_spark")):
        # already running from a --py-files zip: spark-submit ships it
        sc._lucene_spark_shipped = True
        return
    d = tempfile.mkdtemp(prefix="lucene_spark_pkg_")
    zip_path = shutil.make_archive(
        os.path.join(d, "lucene_spark_pkg"),
        "zip",
        root_dir=_REPO_DIR,
        base_dir="lucene_spark",
    )
    sc.addPyFile(zip_path)
    sc._lucene_spark_shipped = True


def get_spark(
    app_name: str = "lucene_spark",
    cores: int | str = "*",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Local-mode session tuned per the scale notes in SURVEY.md §7."""
    n = os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = n if cores == "*" else int(cores)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)
    return spark
