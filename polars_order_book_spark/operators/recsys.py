"""Item-item co-occurrence similarity — the collaborative-filtering primitive.

A curation/recommendation pipeline over interaction logs needs "items that
co-occur with item X across users" long before it needs a trained model:
co-occurrence counts drive related-item retrieval, data-mixing diagnostics
("which domains share an audience"), and negative-sampling tables. The
classic failure mode at scale is the per-user self-join: one power user with
50k distinct items contributes 1.25e9 pairs and a single straggler task.

This module implements the standard industrial countermeasure — cap each
user's item list to their top-``per_user_cap`` items BEFORE pairing — so the
pair-generation cost is a hard O(n_users · cap²) regardless of skew, while
item popularity counts stay EXACT (computed from the uncapped interaction
set). Amazon's item-to-item paper (Linden et al. 2003, IEEE Internet
Computing) and every production follow-up applies exactly this truncation.

Determinism contract: the cap keeps each user's items by (interaction count
desc, item asc) — never "whichever ``cap`` rows a partition produced first".
Similarity outputs are single-division / sqrt doubles over exact longs;
IEEE-754 requires correctly-rounded ``/`` and ``sqrt``, so the values are
bit-identical on any engine (no libm transcendentals anywhere).

Scale shape (100 TB of events):
* distinct(user, item): one shuffle on (user, item), map-side partial.
* per-user cap: window over the per-user item counts — partitioned by user,
  bounded state (the window input is post-distinct counts, already ≪ raw).
* pair generation: self-equi-join ON user of the ≤cap-row lists — per-task
  work is bounded by cap², never all-pairs.
* pair counting: groupBy(item_a, item_b), map-side partial; output is
  item-dimension-sized, not event-sized.
* popularity join: per-item user counts are item-dimension-sized → broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def item_cooccurrence(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    item_col: str = "item",
    per_user_cap: int = 64,
    min_pair_count: int = 2,
) -> DataFrame:
    """Item-item co-occurrence with exact popularity-normalized similarity.

    Returns one row per unordered item pair (``item_a < item_b``) that at
    least ``min_pair_count`` users share:
    ``(item_a, item_b, n_ab, n_a, n_b, cosine, jaccard)`` where

    * ``n_ab`` — users whose CAPPED lists contain both items,
    * ``n_a``/``n_b`` — exact distinct-user popularity of each item over the
      UNCAPPED interactions (true popularity; the cap only bounds pairing),
    * ``cosine``  = n_ab / sqrt(n_a · n_b)   (sqrt is IEEE-exact),
    * ``jaccard`` = n_ab / (n_a + n_b - n_ab).

    ``per_user_cap`` keeps each user's top items by (distinct-interaction
    count desc, item asc); ``None`` disables the cap (all-pairs per user —
    only for bounded fan-out inputs, and the reason it is not the default).
    """
    if per_user_cap is not None and per_user_cap < 2:
        raise ValueError(f"per_user_cap must be >= 2 (or None), got {per_user_cap}")
    u, it = F.col(user_col), F.col(item_col)
    interactions = (
        df.where(u.isNotNull() & it.isNotNull())
        .groupBy(u.alias("user"), it.alias("item"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    popularity = interactions.groupBy("item").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    lists = interactions
    if per_user_cap is not None:
        w = Window.partitionBy("user").orderBy(
            F.col("n_inter").desc(), F.col("item").asc()
        )
        lists = (
            interactions.withColumn("__r", F.row_number().over(w))
            .where(F.col("__r") <= per_user_cap)
            .drop("__r")
        )
    a = lists.select(F.col("user"), F.col("item").alias("item_a"))
    b = lists.select(F.col("user"), F.col("item").alias("item_b"))
    pairs = (
        a.join(b, on="user")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_pair_count)
    )
    pop_a = popularity.select(
        F.col("item").alias("item_a"), F.col("n_users").alias("n_a")
    )
    pop_b = popularity.select(
        F.col("item").alias("item_b"), F.col("n_users").alias("n_b")
    )
    nab = F.col("n_ab").cast("double")
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    return (
        pairs.join(F.broadcast(pop_a), on="item_a")
        .join(F.broadcast(pop_b), on="item_b")
        .select(
            "item_a",
            "item_b",
            "n_ab",
            "n_a",
            "n_b",
            (nab / F.sqrt(na * nb)).alias("cosine"),
            (nab / (na + nb - nab)).alias("jaccard"),
        )
    )


def top_similar_items(
    cooc: DataFrame,
    *,
    k: int = 10,
    metric: str = "cosine",
) -> DataFrame:
    """Per-item top-``k`` neighbor list from an :func:`item_cooccurrence`
    result: symmetrize the unordered pairs (each edge serves both
    endpoints — the pair table is materialized once) and keep each source
    item's best ``k`` by (metric desc, neighbor asc).

    Scale: the input is already item²-bounded (post min_pair_count); the
    window partitions by item — no global sort.
    """
    if metric not in ("cosine", "jaccard"):
        raise ValueError(f"metric must be cosine|jaccard, got {metric!r}")
    sym = cooc.select(
        F.col("item_a").alias("item"), F.col("item_b").alias("neighbor"), metric
    ).unionByName(
        cooc.select(
            F.col("item_b").alias("item"), F.col("item_a").alias("neighbor"), metric
        )
    )
    w = Window.partitionBy("item").orderBy(
        F.col(metric).desc(), F.col("neighbor").asc()
    )
    return (
        sym.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("item", "neighbor", F.col("rank").cast("long").alias("rank"), metric)
    )
