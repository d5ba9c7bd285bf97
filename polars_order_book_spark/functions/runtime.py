"""Runtime-configuration probes that degrade gracefully off stock Spark.

``spark.sql.shuffle.partitions`` is numeric on stock Spark but can be the
string ``"auto"`` on managed runtimes (Databricks auto-optimized shuffle),
and operators that parse it with a bare ``int(...)`` crash there. Central
helper so every caller shares one fallback rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def shuffle_partitions(
    spark: SparkSession,
    fallback_df: "DataFrame | None" = None,
    default: int = 200,
) -> int:
    """Best-effort integer shuffle-partition count.

    Order: the conf value if it parses as a positive int; else the fallback
    DataFrame's current partition count (a reasonable stand-in for "how wide
    is this stage"); else ``default`` (Spark's own stock default is 200).
    """
    raw = spark.conf.get("spark.sql.shuffle.partitions", str(default))
    try:
        n = int(raw)
        if n > 0:
            return n
    except (TypeError, ValueError):
        pass
    if fallback_df is not None:
        try:
            n = fallback_df.rdd.getNumPartitions()
            if n > 0:
                return n
        except Exception:
            pass
    return default
