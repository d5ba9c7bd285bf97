"""Deterministic sampling for training-data pipelines.

`df.sample()` is seed-and-partitioning dependent — rerunning after a
repartition (or on another engine) yields a different subset, which breaks
reproducible dataset curation. These samplers decide membership from a
PORTABLE hash of the row's own key (functions.hashing.hash64: md5-derived,
bit-identical in DuckDB), so the sample is a pure function of the data:
stable across runs, partitionings, engines, and — for the per-row-membership
rate samplers — appends (a row's membership never changes as the dataset
grows, the property curation pipelines rely on for incremental reprocessing).
Operators whose output depends on OTHER rows (the packers, stratified/
weighted quotas) are deterministic but not append-stable; each docstring
states its own contract.

Scale shape: a map-only filter — no shuffle, no state; pushes through any
downstream plan like an ordinary predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from polars_order_book_spark.functions.hashing import hash64

_BUCKETS = 1_000_000  # ppm resolution


def hash_sample_col(key: Column, rate: float, salt: str = "") -> Column:
    """Boolean membership column: True for ~rate of distinct keys."""
    if not (0.0 <= rate <= 1.0):
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    keyed = F.concat(key.cast("string"), F.lit(salt))
    return F.pmod(hash64(keyed), F.lit(_BUCKETS)) < int(round(rate * _BUCKETS))


def hash_sample(
    df: DataFrame,
    key_col: str,
    rate: float,
    *,
    salt: str = "",
) -> DataFrame:
    """Keep ~``rate`` of rows, decided by hash(key||salt) — deterministic and
    engine-portable. ``salt`` yields independent samples from the same keys
    (e.g. train/validation splits: disjoint salts, disjoint randomness)."""
    return df.where(hash_sample_col(F.col(key_col), rate, salt))


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: "list[float]",
    *,
    salt: str = "",
) -> "list[DataFrame]":
    """Disjoint deterministic splits (e.g. [0.9, 0.05, 0.05] train/val/test):
    bucket = hash(key||salt) mod 1e6 falls into consecutive weight ranges, so
    every key lands in exactly one split, stably."""
    if any(w < 0 for w in weights) or abs(sum(weights) - 1.0) > 1e-9:
        raise ValueError("weights must be non-negative and sum to 1")
    keyed = F.concat(F.col(key_col).cast("string"), F.lit(salt))
    bucket = F.pmod(hash64(keyed), F.lit(_BUCKETS))
    out = []
    lo = 0.0
    for w in weights:
        hi = lo + w
        out.append(
            df.where(
                (bucket >= int(round(lo * _BUCKETS))) & (bucket < int(round(hi * _BUCKETS)))
            )
        )
        lo = hi
    return out


def _hash_ordered_layout(df, by, text_col, id_col, shards):
    """Shared layout base for budget_pack / pack_sequences: per (group,
    hash shard), documents carry their token count and running token total
    in portable-hash order. ONE definition — both packers' determinism
    contract depends on this exact ordering and shard rule, so it must not
    drift between them. Returns the frame with columns
    (doc_id, <by>, n_tokens, __h, pack_shard, __cum)."""
    from pyspark.sql import Window as W

    from polars_order_book_spark.operators.text import token_count

    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(by),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        hash64(F.col(id_col)).alias("__h"),
    ).withColumn("pack_shard", F.pmod(F.col("__h"), F.lit(shards)).cast("long"))
    win = (
        W.partitionBy(by, "pack_shard")
        .orderBy("__h", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return base.withColumn("__cum", F.sum("n_tokens").over(win))


def budget_pack(
    df: DataFrame,
    budget_tokens: int,
    *,
    by: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    shards: int = 1,
) -> DataFrame:
    """Token-budget selection: keep documents per ``by`` group, in
    deterministic hash order, until the group's token budget is exhausted —
    how a pretraining mixture is actually drawn ("2B tokens of source X").
    A document is kept while the budget is not yet full when it arrives
    (``cum_tokens - n_tokens < budget``), so each group keeps at least one
    document and may overshoot by less than one document's tokens.

    Hash order (portable hash64 of the id) makes the selection an unbiased,
    engine-reproducible sample of each source. Unlike ``hash_sample`` it is
    NOT append-stable (r8 self-review): an appended doc whose id hashes
    earlier enters the stream before existing docs, shifting the running
    total and possibly evicting a previously-kept doc at the budget
    boundary. Re-draw the pack after appends; use ``hash_sample`` where
    append-stable membership matters.

    Scale: the running sum needs one ordered window per group, and a single
    group's window is one task. ``shards > 1`` splits every group into hash
    shards with ``budget // shards`` tokens each — same total quota, bounded
    per-task work — the same salting answer the skewed joins use. Output:
    (doc_id, <by>, pack_shard, n_tokens, cum_tokens) for kept rows, with
    ``cum_tokens`` the running total within the (group, shard).
    """
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be > 0, got {budget_tokens}")
    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")
    shard_budget = budget_tokens // shards
    if shard_budget <= 0:
        raise ValueError("budget_tokens // shards must be > 0")

    cum = _hash_ordered_layout(df, by, text_col, id_col, shards).withColumnRenamed(
        "__cum", "cum_tokens"
    )
    return cum.where(F.col("cum_tokens") - F.col("n_tokens") < shard_budget).select(
        "doc_id", by, "pack_shard", "n_tokens", "cum_tokens"
    )


def domain_mix_sample(
    df: DataFrame,
    weights: "dict[str, float]",
    *,
    domain_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic downsample to target domain proportions — mixture
    re-weighting, the other half of dataset curation next to quota draws
    (:func:`budget_pack` answers "N tokens of X"; this answers "30% books,
    50% web, 20% code").

    No upsampling: the output is the LARGEST subset achieving the target
    shares. With per-domain counts n_d and weights w_d, the feasible total is
    T = min_d(n_d / w_d); each domain keeps rate r_d = w_d·T / n_d (the
    binding domain keeps everything, others downsample). Membership is the
    portable hash64 threshold — stable across runs, partitionings, engines,
    and appends, like every sampler here. Domains absent from ``weights``
    are dropped. Conversely a WEIGHTED domain absent from the data is
    ignored (T is computed over present domains only) — the strict reading
    would force an empty result (cap 0); callers needing that guarantee
    should validate domain presence first (``profile_table`` gives the
    counts in one pass).

    Scale shape: one tiny groupBy(domain) count, the scalar T attached by a
    1-row broadcast cross join (scalar-normalizer shape), per-domain rates
    broadcast back to the fact side as an equi-join, then a map-side hash
    filter. No fact-table shuffle anywhere. All arithmetic is IEEE float64
    (division + multiply + floor), bit-identical in the DuckDB oracle.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be strictly positive")
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {sum(weights.values())}")
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(d, float(w)) for d, w in sorted(weights.items())],
        f"{domain_col} string, __w double",
    )
    counts = df.groupBy(domain_col).agg(
        F.count(F.lit(1)).cast("double").alias("__n")
    )
    caps = counts.join(F.broadcast(wdf), on=domain_col).withColumn(
        "__cap", F.col("__n") / F.col("__w")
    )
    t = caps.agg(F.min("__cap").alias("__t"))
    rates = caps.crossJoin(F.broadcast(t)).select(
        domain_col,
        F.least(
            F.lit(1.0), F.col("__w") * F.col("__t") / F.col("__n")
        ).alias("__r"),
    )
    keyed = F.concat(F.col(key_col).cast("string"), F.lit(salt))
    bucket = F.pmod(hash64(keyed), F.lit(_BUCKETS))
    # Explicit isin: the rates join already restricts to weighted domains,
    # but a literal IN predicate pushes into the parquet scan (row-group
    # pruning / PushedFilters) — the join alone does not.
    return (
        df.where(F.col(domain_col).isin(*weights))
        .join(F.broadcast(rates), on=domain_col)
        # +1e-6 epsilon before floor: the binding domain's exact rate 1.0
        # can compute as 0.9999999999999999 (w*T/n in float), and a bare
        # floor would then exclude the top hash bucket — dropping ~1 ppm of
        # binding-domain rows and violating the keep-everything contract.
        # The nudge absorbs ~1e-10 float error; a true threshold within
        # 1e-6 of an integer would need r accurate to 1e-12 to matter.
        .where(bucket < F.floor(F.col("__r") * _BUCKETS + F.lit(1e-6)).cast("long"))
        .drop("__r")
    )


def pack_sequences(
    df: DataFrame,
    seq_len_tokens: int,
    *,
    by: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    shards: int = 1,
) -> DataFrame:
    """Assign every document to a fixed-token-length training sequence — the
    concat-and-chunk step of a pretraining pipeline (:func:`budget_pack`
    SELECTS a quota; this PACKS everything into seq_len-token bins).

    Documents are laid out per (group, shard) in portable hash order; each
    doc's start offset is the running token total before it, and its bin is
    ``start div seq_len``. The layout is a pure function of the DATASET —
    partition-invariant and engine-reproducible — but NOT append-stable
    (r8 self-review): an appended doc whose id hashes earlier than existing
    docs shifts every later cumulative total, moving those docs' (bin,
    offset). Re-pack after appends (cheap: one window pass); use
    ``hash_sample`` when append-stable membership is the requirement. Docs
    longer than ``seq_len_tokens`` simply span bins (start-offset contract;
    the splitter downstream slices them).

    Scale: one ordered window per (group, shard) — identical shape and
    bounds to :func:`budget_pack`; ``shards`` caps per-task window work.
    Output: (doc_id, <by>, pack_shard, n_tokens, seq_index, start_offset)
    where start_offset is within the bin.
    """
    if seq_len_tokens <= 0:
        raise ValueError(f"seq_len_tokens must be > 0, got {seq_len_tokens}")
    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")
    cum = _hash_ordered_layout(df, by, text_col, id_col, shards)
    start = F.col("__cum") - F.col("n_tokens")
    # integer div, not float: cumulative token counts near 2^53 would round
    # a double quotient across a bin boundary (same guard as the nanos path)
    return cum.select(
        "doc_id",
        by,
        "pack_shard",
        "n_tokens",
        F.expr(f"(__cum - n_tokens) div {int(seq_len_tokens)}").alias("seq_index"),
        F.pmod(start, F.lit(seq_len_tokens)).alias("start_offset"),
    )


def stratified_sample(
    df: DataFrame,
    n_per_stratum: int,
    *,
    strata: "list[str]",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows from every stratum (fewer when the
    stratum is smaller), chosen in portable hash order — the exact-count
    counterpart to :func:`hash_sample`'s rate sampling. Balanced eval sets
    ("5 docs per (lang, source)") need exact counts; a rate can't give them.

    Membership = row_number over (stratum, ordered by hash64(id||salt), id)
    <= n: a pure function of the data, stable across runs, partitionings,
    and engines. Unlike the rate samplers it is NOT append-stable — a new row
    hashing into the top-n evicts the old rank-n row; freeze the output when
    append-stability matters.

    Scale shape: one shuffle on the strata key; each stratum ranks in one
    task. For very large strata, pre-thin with a PREFIX threshold on the
    same ordering hash — ``hash64(concat(id, salt)) < tau`` — before ranking:
    a prefix of the order can never change the top-n as long as >= n rows
    per stratum survive (NOT ``hash_sample``, whose mod-bucket membership is
    not an order prefix and would evict top-ranked rows).
    """
    if n_per_stratum <= 0:
        raise ValueError(f"n_per_stratum must be > 0, got {n_per_stratum}")
    if not strata:
        raise ValueError("strata must be non-empty")
    from pyspark.sql import Window as W

    keyed = F.concat(F.col(id_col).cast("string"), F.lit(salt))
    win = W.partitionBy(*strata).orderBy(hash64(keyed), F.col(id_col))
    return (
        df.withColumn("sample_rank", F.row_number().over(win).cast("long"))
        .where(F.col("sample_rank") <= n_per_stratum)
    )


def temperature_mix_sample(
    df: DataFrame,
    total_target: int,
    *,
    by: str = "source",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    salt: str = "",
    max_domains: int = 100_000,
) -> DataFrame:
    """Temperature-rebalanced mixture draw: sample ``total_target`` rows with
    per-domain quotas ∝ n_domain^alpha — the standard multilingual/
    multi-domain rebalancing (alpha<1 upweights small domains relative to
    their raw share; alpha=1 is proportional). Returns
    (id_col, <by>, sample_rank, quota) for kept rows, selected per domain in
    portable hash order (engine-reproducible, like :func:`stratified_sample`).

    Exactness: domain weights are quantized to integer micros
    (floor(n^alpha · 1e6 + 0.5)) and quotas computed with EXACT integer
    arithmetic — floor(total_target · m_d / Σm) — driver-side over the
    domain-count table (bounded by ``max_domains``, fail-fast past it: the
    same bounded-collect contract as the BPE trainer). The default
    alpha=0.5 uses sqrt, which IEEE requires correctly rounded, so the
    micros match bit-for-bit across engines; other alphas go through pow
    (libm — last-ulp divergence possible at quota BOUNDARIES, documented).
    Floor quotas can undershoot ``total_target`` by < #domains rows; no
    largest-remainder correction is applied (deterministic and simple beats
    one extra row). Null domains are excluded (documented, like the other
    keyed samplers).

    Scale: one domains-sized aggregate (collected under the cap), quotas
    broadcast back, one per-domain ranking window (a stratum ranks in one
    task — pre-thin giant domains with the prefix-threshold trick in
    :func:`stratified_sample`'s docstring).
    """
    if total_target <= 0:
        raise ValueError(f"total_target must be > 0, got {total_target}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    counts_df = (
        df.where(F.col(by).isNotNull()).groupBy(by).agg(F.count(F.lit(1)).alias("__n"))
    )
    if counts_df.limit(max_domains + 1).count() > max_domains:
        raise ValueError(
            f"distinct {by!r} count exceeds max_domains={max_domains}; "
            "temperature quotas need the domain table driver-side — raise "
            "the cap or pre-bucket the domain column"
        )
    import math

    rows = counts_df.collect()
    weights = {
        r[0]: math.floor((math.sqrt(r[1]) if alpha == 0.5 else r[1] ** alpha)
                         * 1_000_000.0 + 0.5)
        for r in rows
    }
    m_total = sum(weights.values())
    quotas = [
        (d, (total_target * m) // m_total) for d, m in weights.items()
    ]
    from pyspark.sql.types import LongType, StructField, StructType

    q_schema = StructType(
        [
            StructField(by, df.schema[by].dataType, True),
            StructField("quota", LongType(), False),
        ]
    )
    q_df = df.sparkSession.createDataFrame(quotas, q_schema)

    from pyspark.sql import Window as W

    keyed = F.concat(F.col(id_col).cast("string"), F.lit(salt))
    win = W.partitionBy(by).orderBy(hash64(keyed), F.col(id_col))
    return (
        df.where(F.col(by).isNotNull())
        .withColumn("sample_rank", F.row_number().over(win).cast("long"))
        .join(F.broadcast(q_df), on=by)
        .where(F.col("sample_rank") <= F.col("quota"))
        .select(id_col, by, "sample_rank", "quota")
    )


def category_index(
    df: DataFrame,
    col: str,
    *,
    out_col: str | None = None,
) -> DataFrame:
    """Deterministic dense integer ids for a BOUNDED-cardinality categorical
    column (lang, source, label vocabularies) — the feature-encoding step
    before training. Ids are assigned by sorted value order (nulls excluded,
    id starts at 0), so the mapping is a pure function of the distinct value
    set: stable across runs, partitionings, and engines, and append-stable
    as long as appends don't introduce values that sort before existing ones
    (use a frozen dictionary table for that regime).

    Scale contract: the dictionary is built from ``distinct()`` of ONE
    column — dimension-sized by assumption — ranked in a single-partition
    window (fine for a dictionary; NOT for fact-sized data) and broadcast
    back as an equi-join. The fact table never shuffles.
    """
    from pyspark.sql import Window as W

    out = out_col or f"{col}_id"
    dictionary = (
        df.select(col)
        .where(F.col(col).isNotNull())
        .distinct()
        .withColumn(
            out,
            (F.row_number().over(W.orderBy(F.col(col))) - 1).cast("long"),
        )
    )
    return df.join(F.broadcast(dictionary), on=col, how="left")


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    *,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement of exactly
    min(k, n) rows: Efraimidis-Spirakis A-ES with the uniform draw replaced
    by the portable hash (u = (hash64(key||salt)+1) / (2^60+1) ∈ (0,1)),
    rank key = u^(1/w). P(row selected) is proportional-to-weight without
    replacement — the sampling step of quality-weighted data curation
    (upweight high-quality sources, never duplicate a document).

    Same determinism contract as ``hash_sample``: a pure function of the
    key set, independent of partitioning, run, or engine; ``salt`` yields
    independent samples. Rows with weight <= 0 or null are excluded (zero
    mass). Ties are impossible up to hash collisions; ``key_col`` breaks
    even those.

    Scale shape: map-only scoring + global top-k — Catalyst turns
    orderBy+limit into per-partition TakeOrderedAndProject, so only k rows
    per partition reach the driver-side merge; nothing fact-sized moves.
    """
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    keyed = F.concat(F.col(key_col).cast("string"), F.lit(salt))
    u = (hash64(keyed) + F.lit(1)).cast("double") / F.lit(float(2**60 + 1))
    rank_key = F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double"))
    return (
        df.where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("sample_key", rank_key)
        .orderBy(F.col("sample_key").desc(), F.col(key_col))
        .limit(k)
        .drop("sample_key")
    )


def split_assign(
    df: DataFrame,
    key_col: str,
    weights: "list[float]",
    names: "list[str] | None" = None,
    *,
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Label every row with its deterministic split (e.g. train/val/test) in
    ONE pass — the labeling twin of :func:`hash_split` (which returns one
    DataFrame per split and so scans the input once per split). Both use the
    identical bucket rule — hash(key||salt) mod 1e6 against consecutive
    weight ranges — so ``split_assign(df, k, w)[out_col] == s`` exactly
    matches membership in ``hash_split(df, k, w)[i]``; the shared-boundary
    contract is pinned by tests.

    Why it matters for curation: the split is a pure function of the row's
    own key — stable under repartitioning, appends, and engine changes — so
    a 100 TB corpus can be re-sharded or incrementally extended without any
    document ever migrating between train and eval (the leakage failure mode
    of ``randomSplit``). Map-only projection: no shuffle, no state.
    """
    if names is None:
        names = [f"split_{i}" for i in range(len(weights))]
    if len(names) != len(weights):
        raise ValueError(
            f"names ({len(names)}) and weights ({len(weights)}) must align"
        )
    if any(w < 0 for w in weights) or abs(sum(weights) - 1.0) > 1e-9:
        raise ValueError("weights must be non-negative and sum to 1")
    keyed = F.concat(F.col(key_col).cast("string"), F.lit(salt))
    bucket = F.pmod(hash64(keyed), F.lit(_BUCKETS))
    expr = None
    lo = 0.0
    for name, w in zip(names, weights):
        hi = lo + w
        cond = (bucket >= int(round(lo * _BUCKETS))) & (bucket < int(round(hi * _BUCKETS)))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        lo = hi
    # rounding of the last hi can leave bucket == _BUCKETS - eps uncovered
    # only if sum(weights) < 1, which the guard above rejects; otherwise has
    # full coverage, but keep a loud null rather than a silent misfile.
    return df.withColumn(out_col, expr)


def curriculum_order(
    df: DataFrame,
    metric_col: str,
    id_col: str = "doc_id",
    *,
    n_bins: int = 10,
) -> DataFrame:
    """Deterministic curriculum interleave: rank documents into ``n_bins``
    quality bins by ``metric_col`` (ntile over (metric, id) — fully ordered,
    so bin edges are reproducible), shuffle WITHIN each bin by the portable
    hash of the id, and emit a global ``order_key`` that round-robins one
    document per bin — the standard curriculum/difficulty-mixing layout
    (each consecutive n_bins-sized window of the training stream touches
    every quality decile once, while intra-bin order stays hash-random and
    engine-reproducible).

    Consuming rows ordered by ``order_key`` IS the curriculum; writers can
    range-partition on it so shard k holds the k-th slice of the schedule.

    Scale shape: two total-order windows (ntile, then per-bin row_number).
    A global ntile is a single-direction sort — at 100 TB swap it for a
    sampled-quantile binning (approx_percentile cutpoints broadcast as a
    CASE) and keep the same downstream layout; the per-bin window shards
    across n_bins keys. The driver corpus sorts in one task either way.
    """
    from pyspark.sql import Window

    if n_bins <= 0:
        raise ValueError(f"n_bins must be > 0, got {n_bins}")
    ranked = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(metric_col).alias("metric"),
    ).withColumn(
        "bin",
        F.ntile(n_bins).over(Window.orderBy("metric", "doc_id")) - 1,
    )
    w = Window.partitionBy("bin").orderBy(
        hash64(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        ranked.withColumn("pos_in_bin", F.row_number().over(w) - 1)
        .select(
            "doc_id",
            "metric",
            F.col("bin").cast("int").alias("bin"),
            F.col("pos_in_bin").cast("long").alias("pos_in_bin"),
            (F.col("pos_in_bin") * n_bins + F.col("bin")).cast("long").alias("order_key"),
        )
    )


def reservoir_per_key(
    df: DataFrame,
    keys: "list[str]",
    k: int,
    *,
    id_col: str = "event_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic per-key reservoir: exactly min(k, |group|) rows per key
    group, chosen uniformly by portable hash rank — the distributed stand-in
    for sequential reservoir sampling (Vitter's Algorithm R needs a serial
    scan; ranking by hash(id||salt) gives the same "uniform k of n" draw in
    one shuffle and is REPRODUCIBLE, which the classic algorithm is not).

    Rank order is (hash64(id||salt) asc, id asc) — the id tiebreak makes the
    selection total even under hash collisions. ``salt`` yields independent
    redraws from the same data. Output keeps all input columns plus
    ``sample_rank`` (1-based).

    Scale shape: one hash-exchange on ``keys`` + an in-partition top-k window
    — no global sort, no driver state. Per-key state is O(k). Skewed key
    groups cost one partition's sort of their own rows, the same bound as
    any per-key window; for pathological single-key inputs use the two-phase
    variant (hash-prefilter with rate ≈ 2k/n, then exact window) — at that
    point n is known anyway.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    rank_key = hash64(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(*keys).orderBy(rank_key.asc(), F.col(id_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .where(F.col("sample_rank") <= k)
    )


def negative_samples(
    interactions: DataFrame,
    *,
    user_col: str = "user_id",
    item_col: str = "item",
    k: int = 5,
    candidate_pool: int = 50,
    salt: str = "",
) -> DataFrame:
    """Deterministic negative sampling for implicit-feedback training: per
    user, ``k`` items drawn from the ``candidate_pool`` most popular items
    that the user never interacted with — the standard "popularity-biased
    negatives" a ranker/recsys trainer pairs with observed positives
    (uniform negatives are trivially easy; sampling from the popular head is
    the BPR/word2vec-frequency-table practice).

    Returns ``(user, item, sample_rank)``, rank 1-based in hash order. The
    draw is by portable-hash rank over (user, item, salt) — reproducible
    across runs/engines, independent redraws via ``salt`` (the repo-wide
    convention, see :func:`reservoir_per_key`). A user who interacted with
    every pooled item yields fewer than k rows (never a non-negative).

    Scale shape — the trap this operator exists to avoid is the
    users × catalog cross join:
    1. popularity: one groupBy(item) over interactions, map-side partial;
       top ``candidate_pool`` via TakeOrderedAndProject (count desc, item
       asc — total order).
    2. users × pool expansion: crossJoin(broadcast(pool)) — a BOUNDED
       constant fan-out (×pool per user), map-side, never catalog-sized.
    3. exclusion: left_anti join against the user's own interactions,
       co-partitioned on (user, item).
    4. per-user top-k window over ≤pool rows — O(pool log pool) per user.
    At 100 TB everything is linear in |users| with constant factor ``pool``.
    """
    if k < 1 or candidate_pool < k:
        raise ValueError(
            f"need candidate_pool >= k >= 1, got k={k}, pool={candidate_pool}"
        )
    from pyspark.sql import Window

    inter = (
        interactions.where(
            F.col(user_col).isNotNull() & F.col(item_col).isNotNull()
        )
        .select(F.col(user_col).alias("user"), F.col(item_col).alias("item"))
        .distinct()
    )
    pool = (
        inter.groupBy("item")
        .agg(F.count(F.lit(1)).alias("_n"))
        .orderBy(F.col("_n").desc(), F.col("item").asc())
        .limit(candidate_pool)
        .select("item")
    )
    users = inter.select("user").distinct()
    # bounded fan-out: |users| × candidate_pool rows, pool broadcast (1-row-
    # scale relation; whitelisted BNLJ pattern)
    cand = users.crossJoin(F.broadcast(pool))
    neg = cand.join(inter, ["user", "item"], "left_anti")
    rank_key = hash64(
        F.concat(
            F.col("user").cast("string"),
            F.lit(":"),
            F.col("item").cast("string"),
            F.lit(salt),
        )
    )
    w = Window.partitionBy("user").orderBy(rank_key.asc(), F.col("item").asc())
    return (
        neg.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .where(F.col("sample_rank") <= k)
    )
