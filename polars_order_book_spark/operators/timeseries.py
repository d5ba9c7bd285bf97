"""Time-series regularization and windowed activity metrics: gap-fill a
per-key integer grid with linear interpolation, trailing sliding-window
distinct counts, and exponential time-decay scores.

The reference's world is event streams sorted by timestamp (reference
``README.md:182``); the downstream consumer of any such stream eventually
needs it on a REGULAR grid (bars, daily features, model inputs). This
operator densifies a sparse (key, grid_index) relation to every index in
each key's observed [min, max] range and fills holes by linear
interpolation between the nearest observed neighbors.

Exactness discipline: callers pass values that are exact (integers or
decimal-cast); the interpolation weight ``(i - prev_i) / (next_i - prev_i)``
is a ratio of BIGINTs and the fill is one fused double expression — the
same expression text on any engine yields bit-identical IEEE results, so
the operator is oracle-hashable (no libm calls anywhere).

Scale shape (three shuffles, all on the key):
1. per-key min/max agg (output = keys-sized);
2. ``sequence() + explode`` grid generation — map-side, grid-sized output,
   then a left join observed-onto-grid co-partitioned on (key, idx);
3. ONE window pass per direction (prev via unbounded-preceding, next via
   unbounded-following) — Spark evaluates both frames in a single sort per
   key, no per-gap iteration, no driver loop. Dense keys with huge ranges
   are the caller's contract: the grid is |range| rows per key, same as any
   resample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_linear(
    observed: DataFrame,
    *,
    by: "list[str]",
    idx_col: str = "idx",
    value_col: str = "value",
) -> DataFrame:
    """Densify ``observed`` (one row per (by, idx), idx integer) to every
    idx in each key's [min(idx), max(idx)] and linearly interpolate nulls.

    Returns ``by + [idx_col, value_col, "is_observed"]``. The grid spans
    each key's [min, max] index OVER NON-NULL OBSERVATIONS — null-valued
    input rows count as holes (interpolated if interior) and never extend
    the range, so leading/trailing extrapolation points cannot occur and
    every emitted hole really is bracketed by observations. A key with no
    non-null value at all yields no rows.
    """
    keys = list(by)
    if not keys:
        raise ValueError("gap_fill_linear requires at least one key column")

    bounds = (
        observed.where(F.col(value_col).isNotNull())
        .groupBy(*keys)
        .agg(F.min(idx_col).alias("_lo"), F.max(idx_col).alias("_hi"))
    )
    grid = bounds.select(
        *keys, F.explode(F.sequence("_lo", "_hi")).alias(idx_col)
    )
    dense = grid.join(
        observed.select(*keys, idx_col, F.col(value_col).alias("_v")),
        [*keys, idx_col],
        "left",
    )

    w_prev = (
        Window.partitionBy(*keys)
        .orderBy(idx_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(*keys)
        .orderBy(idx_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_idx = F.when(F.col("_v").isNotNull(), F.col(idx_col))
    pv = F.last("_v", ignorenulls=True).over(w_prev)
    pi = F.last(obs_idx, ignorenulls=True).over(w_prev)
    nv = F.first("_v", ignorenulls=True).over(w_next)
    ni = F.first(obs_idx, ignorenulls=True).over(w_next)

    frac = (F.col(idx_col) - pi).cast("double") / (ni - pi).cast("double")
    interp = pv.cast("double") + (nv.cast("double") - pv.cast("double")) * frac
    filled = (
        F.when(F.col("_v").isNotNull(), F.col("_v").cast("double"))
        .when(pv.isNotNull() & nv.isNotNull(), interp)
        .when(pv.isNotNull(), pv.cast("double"))
        .otherwise(nv.cast("double"))
    )
    return dense.select(
        *keys,
        idx_col,
        filled.alias(value_col),
        F.col("_v").isNotNull().alias("is_observed"),
    )


def sliding_window_distinct(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window_buckets: int = 24,
    bucket: str = "hour",
) -> DataFrame:
    """Trailing sliding-window distinct-key counts per bucket — "active users
    over the last 24 hours, reported hourly", the canonical engagement
    metric. Returns one row per window END bucket that any in-window event
    feeds: ``(window_end, n_active, n_events)``.

    Spark's window functions cannot express COUNT(DISTINCT) over a RANGE
    frame, and a per-bucket self-join over the trailing range rescans the
    fact table ``window_buckets`` times. The scale-correct shape is the
    bounded fan-out expansion: each event contributes to exactly
    ``window_buckets`` window-end buckets via ``sequence() + explode``
    (map-side, ×W row growth with W a small constant), then ONE shuffle on
    the window-end bucket with a distinct-key agg. At 100 TB the cost is
    W × |events| map output — linear, skew-free (bucket keys are time,
    load-balanced by definition), and no rescan.

    ``n_active`` counts distinct ``key_col`` over events in
    ``(window_end - W, window_end]``; ``n_events`` counts rows. Windows
    whose end bucket lies after the last observed event (the trailing W-1
    partial windows) are emitted — they are real trailing-window values as
    of those future report times, and dropping them would need a global max
    (a 1-row broadcast this operator deliberately avoids).
    """
    if window_buckets < 1:
        raise ValueError(f"window_buckets must be >= 1, got {window_buckets}")
    b = F.date_trunc(bucket, F.col(ts_col))
    expanded = df.where(
        F.col(ts_col).isNotNull() & F.col(key_col).isNotNull()
    ).select(
        F.col(key_col).alias("_k"),
        F.explode(
            F.sequence(
                b,
                b + F.expr(f"INTERVAL {window_buckets - 1} {bucket}"),
                F.expr(f"INTERVAL 1 {bucket}"),
            )
        ).alias("window_end"),
    )
    return expanded.groupBy("window_end").agg(
        F.countDistinct("_k").alias("n_active"),
        F.count(F.lit(1)).alias("n_events"),
    )


def time_decay_score(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    halflife_buckets: int = 1,
    bucket: str = "day",
    max_age_buckets: int = 40,
) -> DataFrame:
    """Per-key exponentially time-decayed value score — the recency
    weighting every engagement/quality ranking uses: an event ``age``
    buckets before the key's LATEST event contributes
    ``value · 2^(-age / halflife_buckets)``.

    Returns ``(key, decayed_value, n_events, last_bucket)`` with one row per
    key. Events older than ``max_age_buckets`` (weight < 2^-40 by default)
    are truncated to zero — documented cutoff, not silent FP underflow.

    Exactness discipline (the repo-wide oracle convention): the weighted sum
    runs ENTIRELY in integer arithmetic — value is scaled to micros
    (BIGINT), the weight ``2^(max_age - age)`` is an exact integer power of
    two, and the accumulator is DECIMAL(38,0), so the fold is associative
    and engine-order-independent. One final cast + one IEEE division by the
    constant ``2^max_age · 1e6`` produce the double — bit-identical on any
    engine with correctly-rounded casts (Spark, DuckDB, and IEEE-754 all
    guarantee this). No libm ``exp``/``pow`` with non-integer args anywhere.

    Scale: one groupBy on the key for the per-key max bucket (keys-sized
    output), one co-partitioned join back on the same key (single shuffle
    reused), one final groupBy on the key — map-side partials throughout.
    Decay anchored to each key's OWN latest event avoids a global-max
    broadcast and keeps dormant keys comparable by recency shape.
    """
    if halflife_buckets < 1:
        raise ValueError(f"halflife_buckets must be >= 1, got {halflife_buckets}")
    if not 0 < max_age_buckets <= 60:
        raise ValueError(
            f"max_age_buckets must be in (0, 60] to keep 2^max_age exact in "
            f"the decimal accumulator, got {max_age_buckets}"
        )
    bucket_idx = (
        F.unix_timestamp(F.date_trunc(bucket, F.col(ts_col)))
    ).alias("_b")
    base = df.where(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull()).select(
        F.col(key_col).alias("_k"),
        bucket_idx,
        F.round(F.col(value_col).cast("double") * 1e6).cast("long").alias("_vmicros"),
    )
    bucket_secs = {"hour": 3600, "day": 86400, "week": 604800}[bucket]
    latest = base.groupBy("_k").agg(F.max("_b").alias("_bmax"))
    aged = base.join(latest, "_k").withColumn(
        "_age",
        ((F.col("_bmax") - F.col("_b")) / F.lit(bucket_secs)).cast("long"),
    )
    # age is halflife-scaled with integer floor division: weight exponent
    # max_age - floor(age / halflife) stays an exact integer power of two.
    exponent = F.lit(max_age_buckets) - F.floor(
        F.col("_age") / F.lit(halflife_buckets)
    ).cast("long")
    scaled = F.when(
        exponent > 0,
        F.col("_vmicros").cast("decimal(38,0)")
        * F.pow(F.lit(2.0), exponent.cast("double")).cast("decimal(38,0)"),
    ).otherwise(F.lit(0).cast("decimal(38,0)"))
    divisor = float(2**max_age_buckets) * 1e6
    return (
        aged.groupBy(F.col("_k").alias(key_col))
        .agg(
            F.sum(scaled).alias("_ssum"),
            F.count(F.lit(1)).alias("n_events"),
            F.max("_bmax").alias("_lb"),
        )
        .select(
            key_col,
            (F.col("_ssum").cast("double") / F.lit(divisor)).alias("decayed_value"),
            "n_events",
            F.col("_lb").alias("last_bucket"),
        )
    )


def attribute_runs(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Gaps-and-islands: collapse each key's timeline into maximal runs of a
    constant attribute value — the SCD-Type-2 history build (validity
    intervals of "the user's current state") and the classic sessionless
    sequence summary. One row per run:
    ``(key, run_id, attr, valid_from, valid_to, n_rows)`` with ``run_id``
    1-based per key in time order.

    The island id is the standard two-window derivation: a change flag
    (``attr != lag(attr)``) followed by its running sum — both over the SAME
    (key) partition and (ts, tiebreak) order, so Spark evaluates them in one
    sort. ``tiebreak_col`` makes the order total (equal timestamps would
    otherwise make run boundaries nondeterministic across engines).

    Scale: one hash exchange on the key + one in-partition sort + one
    groupBy(key, run) with map-side partials. Output is runs-sized. Skewed
    keys cost their own partition's sort — the floor for any per-key
    ordered pass.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    # Null-safe change flag (r8 self-review): `attr != lag(attr)` is NULL
    # when either side is NULL, and sum() SKIPS it — a NULL attr after a
    # non-null one silently merged into the previous run (extending the
    # SCD-2 validity interval across the NULL period) while consecutive
    # NULLs each started a new run. eqNullSafe is the diff_snapshots
    # convention; row_number()==1 starts the first run explicitly because
    # NULL <=> lag-of-first-row(NULL) would otherwise read as "unchanged".
    changed = (
        (F.row_number().over(w) == 1)
        | ~F.col(attr_col).eqNullSafe(F.lag(attr_col).over(w))
    ).cast("long")
    runs = df.where(
        F.col(key_col).isNotNull() & F.col(ts_col).isNotNull()
    ).withColumn(
        "run_id",
        F.sum(changed).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    # attr is constant within a (key, run_id) group by construction, so
    # min() is "the" value — no order-dependent first()
    return runs.groupBy(key_col, "run_id").agg(
        F.min(attr_col).alias(attr_col),
        F.min(ts_col).alias("valid_from"),
        F.max(ts_col).alias("valid_to"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def out_of_order_stats(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    arrival_col: str = "event_id",
) -> DataFrame:
    """Per-key out-of-order audit: how late do events arrive relative to the
    running maximum event time in ARRIVAL order (``arrival_col``, e.g. a
    log offset or monotone ingest id)? This is the measurement that sizes
    streaming watermarks: ``withWatermark(ts, X)`` silently drops exactly
    the rows this query counts at lateness > X, so run the audit BEFORE
    picking X, not after the drops happen.

    Returns one row per key:
    ``(key, n_events, n_late, max_lateness_us, frac_late)`` where a row is
    late iff its ts is strictly below the running max of PRIOR rows' ts, and
    lateness is that deficit in microseconds. The only float is the final
    fraction (one exact IEEE division of BIGINTs).

    Scale: one hash exchange on the key + in-partition sort + one window
    pass (running max over preceding rows) + one groupBy — the same
    single-sort shape as any per-key ordered audit; keys-sized output.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(arrival_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.max(F.unix_micros(F.col(ts_col))).over(w)
    lateness = F.when(
        prev_max.isNotNull() & (prev_max > F.unix_micros(F.col(ts_col))),
        prev_max - F.unix_micros(F.col(ts_col)),
    ).otherwise(F.lit(0))
    marked = df.where(
        F.col(key_col).isNotNull() & F.col(ts_col).isNotNull()
    ).withColumn("_late_us", lateness)
    return marked.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("_late_us") > 0).cast("long")).alias("n_late"),
        F.max("_late_us").alias("max_lateness_us"),
        (
            F.sum((F.col("_late_us") > 0).cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("frac_late"),
    )


def debounce(
    df: DataFrame,
    *,
    keys: "list[str]",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    interval_seconds: int = 600,
) -> DataFrame:
    """Bucket debounce: keep at most ONE row per key group per aligned
    ``interval_seconds`` bucket — the earliest by (ts, tiebreak) — and count
    what it suppressed. The stream-hygiene pass that collapses repeated
    telemetry (retry storms, duplicate clicks) before aggregation.

    Deliberately the ALIGNED-bucket variant, not greedy debounce: greedy
    ("suppress anything within N of the last KEPT event") is a sequential
    state machine whose output depends on unbounded look-back — fine in a
    single-node stream, hostile to distributed replay. Aligned buckets give
    the same ≤1-per-interval guarantee, are a pure function of the row (so
    backfill and streaming agree), and need no state. Returns the kept rows'
    identifying columns plus ``n_suppressed`` (rows it absorbed).

    Scale: one hash exchange on (keys, bucket) + per-group min — map-side
    partial aggregation, no window sort needed.
    """
    if interval_seconds < 1:
        raise ValueError(f"interval_seconds must be >= 1, got {interval_seconds}")
    bucket = F.floor(
        F.unix_timestamp(F.col(ts_col)) / F.lit(interval_seconds)
    ).alias("_bkt")
    base = df.where(F.col(ts_col).isNotNull()).select(
        *keys, F.col(ts_col), F.col(tiebreak_col), bucket
    )
    pick = F.struct(F.col(ts_col), F.col(tiebreak_col))
    return base.groupBy(*keys, "_bkt").agg(
        F.min_by(tiebreak_col, pick).alias(tiebreak_col),
        F.min(ts_col).alias(ts_col),
        (F.count(F.lit(1)) - 1).alias("n_suppressed"),
    ).drop("_bkt")


def theil_sen_trend(
    df: DataFrame,
    keys: "list[str]",
    x_col: str,
    y_col: str,
    *,
    id_col: str = "event_id",
    max_points: int = 24,
    salt: str = "",
) -> DataFrame:
    """Per-key Theil-Sen robust trend: slope = lower median of all pairwise
    slopes ``(y_j - y_i) / (x_j - x_i)``, intercept = lower median of
    ``y - slope * x`` — the 29%-breakdown-point robust alternative to the
    OLS trend (events_ols_trend), immune to the outliers MAD flags.

    Exactness discipline: slopes and residuals are single IEEE divisions /
    fused multiply-subtract of identical operands, so both engines produce
    bit-identical doubles; the LOWER median (rank ``(m+1) DIV 2`` by
    row_number) selects the exact k-th smallest VALUE, well-defined under
    duplicates — no float averaging of middle elements, the repo's exact
    quantile convention.

    Scale shape: Theil-Sen is inherently quadratic per key, so points are
    first capped at ``max_points`` per key by the portable deterministic
    reservoir (:func:`..sampling.reservoir_per_key` hash-rank — the
    item-cooccurrence "cap before pairing" convention), bounding per-key
    pair work at max_points²/2 no matter how hot the key. The pair join is
    a key-partitioned self-join of the CAPPED relation (lazily
    localCheckpoint-ed: it feeds both join sides plus the intercept pass).
    Pairs with equal x carry no slope information and are excluded; keys
    with fewer than 2 distinct-x points yield no output row (documented, 
    mirrored by oracles).

    Returns ``keys + (n_points, n_pairs, slope, intercept)``.
    """
    from polars_order_book_spark.operators.sampling import reservoir_per_key

    if max_points < 2:
        raise ValueError(f"max_points must be >= 2, got {max_points}")
    pts = (
        reservoir_per_key(
            df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull()),
            keys, max_points, id_col=id_col, salt=salt,
        )
        .select(
            *keys,
            F.col(id_col).alias("__id"),
            F.col(x_col).cast("double").alias("__x"),
            F.col(y_col).cast("double").alias("__y"),
        )
        .localCheckpoint(eager=False)
    )
    a = pts.select(*keys, F.col("__id").alias("__ia"),
                   F.col("__x").alias("__xa"), F.col("__y").alias("__ya"))
    b = pts.select(*keys, F.col("__id").alias("__ib"),
                   F.col("__x").alias("__xb"), F.col("__y").alias("__yb"))
    pairs = (
        a.join(b, on=keys)
        .where((F.col("__ia") < F.col("__ib")) & (F.col("__xa") != F.col("__xb")))
        .select(
            *keys,
            ((F.col("__yb") - F.col("__ya")) / (F.col("__xb") - F.col("__xa"))).alias("__slope"),
        )
    )
    w_rank = Window.partitionBy(*keys).orderBy("__slope")
    w_all = Window.partitionBy(*keys)
    slope = (
        pairs.withColumn("__rn", F.row_number().over(w_rank))
        .withColumn("__m", F.count(F.lit(1)).over(w_all))
        .where(F.expr("__rn = (__m + 1) DIV 2"))
        .select(*keys, F.col("__slope").alias("slope"), F.col("__m").alias("n_pairs"))
    )
    resid = pts.join(slope, on=keys).select(
        *keys, "slope", "n_pairs",
        (F.col("__y") - F.col("slope") * F.col("__x")).alias("__resid"),
    )
    w_rrank = Window.partitionBy(*keys).orderBy("__resid")
    return (
        resid.withColumn("__rn", F.row_number().over(w_rrank))
        .withColumn("__n", F.count(F.lit(1)).over(w_all))
        .where(F.expr("__rn = (__n + 1) DIV 2"))
        .select(*keys, F.col("__n").alias("n_points"), "n_pairs", "slope",
                F.col("__resid").alias("intercept"))
    )


def lag_autocorrelation(
    df: DataFrame,
    keys: "list[str]",
    order_cols: "list[str]",
    value_col: str,
    lags: "list[int]",
    *,
    quantize: int = 1000,
) -> DataFrame:
    """Per-key lag-k autocorrelation: the Pearson correlation of the pairs
    ``(v_i, v_{i+k})`` in ``order_cols`` order, for each k in ``lags`` —
    the seasonality/momentum diagnostic run before choosing window features
    (a lag whose ACF ~ 0 adds no signal; ACF ~ 1 means yesterday predicts
    today).

    Exactness discipline: values are floor-quantized to ``quantize`` units
    (floor, never CAST — Spark's double→long cast truncates where DuckDB's
    rounds), every sum/cross-product runs in DECIMAL(38,0) exactly, and the
    correlation is three final IEEE ops (two casts' products, sqrt, divide)
    of identical operands — so both engines emit bit-identical doubles.
    Pairwise-Pearson definition (not the global-mean autocovariance): each
    lag's statistic uses exactly its own m = n_key - k pairs, which keeps
    the whole chain integer-exact. Constant series (zero variance on either
    leg) are emitted with NULL acf rather than a divide-by-zero.

    Scale shape: one window pass per lag over the key partition (lead(v, k)
    — no self-join), then a rollup-sized aggregation; shuffles scale with
    keys, not time. NULL/NaN values and NULL keys are excluded up front
    (binned/ordered-family convention).
    """
    if not lags or any(k < 1 for k in lags):
        raise ValueError(f"lags must be >= 1, got {lags}")
    if len(set(lags)) != len(lags):
        # duplicate lags would alias two lead() columns identically and die
        # later with an ambiguous-column error; fail with a named cause
        raise ValueError(f"lags must be distinct, got {lags}")
    v = F.col(value_col).cast("double")
    base = df.where(
        v.isNotNull() & ~F.isnan(v)
        & F.expr(" AND ".join(f"`{k}` IS NOT NULL" for k in keys))
    ).select(
        *keys, *order_cols,
        F.floor(v * F.lit(float(quantize))).cast("long").alias("__q"),
    )
    # ALL lags in ONE window pass: every lead() shares the same partition
    # and ordering, so Spark evaluates them in a single sort — one scan,
    # one exchange, one sort, however many lags. The per-lag formulation
    # (one select + union per lag) re-scanned and re-sorted the input per
    # lag (measured: 6 scans / 3 sorts for lags [1,2,3] in PLANS.md).
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    leads = base.select(
        *keys,
        F.col("__q").alias("__x"),
        *[F.lead("__q", k).over(w).alias(f"__y{k}") for k in lags],
    )
    stacked = leads.select(
        *keys,
        "__x",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(k).cast("long").alias("lag"),
                    F.col(f"__y{k}").alias("y"),
                )
                for k in lags
            ])
        ).alias("__p"),
    ).select(
        *keys,
        F.col("__p.lag").alias("lag"),
        "__x",
        F.col("__p.y").alias("__y"),
    ).where(F.col("__y").isNotNull())
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = stacked.groupBy(*keys, "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(dec(F.col("__x"))).alias("__sx"),
        F.sum(dec(F.col("__y"))).alias("__sy"),
        F.sum(dec(F.col("__x")) * dec(F.col("__y"))).alias("__sxy"),
        F.sum(dec(F.col("__x")) * dec(F.col("__x"))).alias("__sxx"),
        F.sum(dec(F.col("__y")) * dec(F.col("__y"))).alias("__syy"),
    )
    m = dec(F.col("n_pairs"))
    num = (m * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast("double")
    varx = (m * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast("double")
    vary = (m * F.col("__syy") - F.col("__sy") * F.col("__sy")).cast("double")
    return agg.select(
        *keys,
        "lag",
        "n_pairs",
        F.when((varx > 0) & (vary > 0), num / F.sqrt(varx * vary)).alias("acf"),
    )


def series_cross_correlation(
    series: DataFrame,
    key_col: str,
    idx_col: str,
    val_col: str,
    lags: "list[int]",
) -> DataFrame:
    """Cross-correlation between every ordered pair of keyed integer series:
    for keys (a, b) and lag k, the Pearson correlation of
    ``(a[i], b[i + k])`` over the common integer index grid — the lead-lag
    diagnostic ("do views today predict purchases in two days?") behind
    feature-lag selection, run on ROLLUP-SIZED series (daily counts), never
    on raw events.

    Callers pass an already-aggregated (key, idx, value) relation with
    integer values; every key is densified over the GLOBAL [min, max] index
    range (grid completion — correlation over one shared clock, not over
    coincidentally-present rows), so a key active only in a short window is
    zero-padded across the whole grid; that padding is part of n_pairs and
    of the correlation it computes. Same exactness discipline as
    :func:`lag_autocorrelation`: all sums/cross-products in DECIMAL(38,0),
    three final IEEE ops, zero-variance legs emit NULL.

    Scale shape: the series relation is (keys × index-range)-sized — a
    model, not a fact table. The lag join is an equi-join on the shifted
    index; everything downstream is a rollup-sized aggregation. Building
    the input series from raw facts is the caller's one big aggregation.
    """
    if not lags or any(k < 0 for k in lags):
        raise ValueError(f"lags must be >= 0, got {lags}")
    bounds = series.agg(
        F.min(idx_col).alias("__lo"), F.max(idx_col).alias("__hi")
    )
    keys_rel = series.select(F.col(key_col).alias("__k")).distinct()
    grid = keys_rel.crossJoin(F.broadcast(bounds)).select(
        "__k", F.explode(F.sequence("__lo", "__hi")).alias("__i")
    )
    dense = grid.join(
        series.select(
            F.col(key_col).alias("__k"),
            F.col(idx_col).alias("__i"),
            F.col(val_col).cast("long").alias("__v"),
        ),
        ["__k", "__i"],
        "left",
    ).select("__k", "__i", F.coalesce(F.col("__v"), F.lit(0)).alias("__v"))
    dense = dense.localCheckpoint(eager=False)  # feeds every lag's both sides

    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    a = dense.select(F.col("__k").alias("key_a"), F.col("__i").alias("__i"),
                     F.col("__v").alias("__x"))
    outs = []
    for k in lags:
        b = dense.select(F.col("__k").alias("key_b"),
                         (F.col("__i") - F.lit(k)).alias("__i"),
                         F.col("__v").alias("__y"))
        pairs = a.join(b, "__i")
        agg = pairs.groupBy("key_a", "key_b").agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(dec(F.col("__x"))).alias("__sx"),
            F.sum(dec(F.col("__y"))).alias("__sy"),
            F.sum(dec(F.col("__x")) * dec(F.col("__y"))).alias("__sxy"),
            F.sum(dec(F.col("__x")) * dec(F.col("__x"))).alias("__sxx"),
            F.sum(dec(F.col("__y")) * dec(F.col("__y"))).alias("__syy"),
        )
        m = dec(F.col("n_pairs"))
        num = (m * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast("double")
        varx = (m * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast("double")
        vary = (m * F.col("__syy") - F.col("__sy") * F.col("__sy")).cast("double")
        outs.append(agg.select(
            "key_a", "key_b", F.lit(k).cast("long").alias("lag"), "n_pairs",
            F.when((varx > 0) & (vary > 0), num / F.sqrt(varx * vary)).alias("ccf"),
        ))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
