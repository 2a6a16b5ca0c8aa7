"""Sessionization & event-time windows (batch formulations).

Absent from the reference (it is batch-only, SURVEY §2.9 I6); this is part of
the beyond-reference streaming surface expressed so the same semantics run in
batch (oracle-checkable) and in Structured Streaming
(:mod:`etl_cascalog_spark.streaming`).

Scale: both operators are one shuffle on the grouping key; sessionization
sorts within the key partition (window lag + running sum — the classic
gaps-and-islands plan, which AQE handles for skewed users via skew-join-style
partition splitting on the shuffle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tumbling_window(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Tumbling event-time window aggregation (batch twin of
    ``groupBy(F.window(ts, duration))``). Emits ``window_start``/
    ``window_end`` as plain timestamps."""
    w = F.window(F.col(ts_col), duration)
    out = df.groupBy(w, *[F.col(c) for c in group_cols]).agg(*aggs)
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[c for c in out.columns if c != "window"],
    )


def sliding_window(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_cols: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Sliding (hopping) event-time window aggregation — each event lands in
    ``duration/slide`` overlapping windows (``F.window(ts, duration, slide)``
    explodes map-side, so the only shuffle is the grouped aggregation, same
    as tumbling). Streaming twin: identical expression under readStream
    with a watermark."""
    w = F.window(F.col(ts_col), duration, slide)
    out = df.groupBy(w, *[F.col(c) for c in group_cols]).agg(*aggs)
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[c for c in out.columns if c != "window"],
    )


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when the gap to
    the previous event of the same key exceeds ``gap``.

    Returns the input plus ``session_id`` (1-based per key). The streaming
    twin is ``F.session_window`` (streaming/windows.py) — identical session
    boundaries; here session_end is ``max(ts)`` not ``max(ts)+gap``.
    """
    keys = [F.col(c) for c in key_cols]
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col))
    gap_expr = F.expr(f"INTERVAL {gap}")
    prev = F.lag(F.col(ts_col)).over(w)
    is_new = (prev.isNull() | (F.col(ts_col) > prev + gap_expr)).cast("int")
    return df.withColumn("__new", is_new).withColumn(
        "session_id",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("__new")


def session_stats(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """Per-session rollup: start/end/event count. One extra grouped pass over
    :func:`sessionize` (same shuffle key → no extra exchange after AQE
    reuses the partitioning)."""
    s = sessionize(df, key_cols, ts_col, gap)
    return s.groupBy(*[F.col(c) for c in key_cols], F.col("session_id")).agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
    )


def train_test_slices(
    events: DataFrame,
    cutoffs: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    value_col: str | None = None,
    train_days: int = 7,
    test_days: int = 3,
) -> DataFrame:
    """Per-(key, cutoff) train/test window slicing — the reference's
    ``take-train-dts`` periodic train-window generation
    (mlvar/d_bolome_user_order_stat.clj:52-70; REPL prototype
    common/test.clj:21-39) as one declarative pass.

    ``cutoffs`` is a one-column DataFrame of cutoff dates (a date spine —
    X3). Each event joins the broadcast spine and lands in every window it
    falls into (≤ (train+test)/spacing windows, the sliding-window
    explosion factor); ONE grouped pass computes train features and test
    labels per (key, cutoff). Keys with an empty train AND empty test
    window for a cutoff are dropped.

    Scale: spine is broadcast (tiny); the only shuffle is the grouped
    aggregation on (keys, cutoff) — same shape as a sliding-window agg.
    """
    cutoff_col = cutoffs.columns[0]
    e = events.crossJoin(F.broadcast(cutoffs.select(F.col(cutoff_col).alias("cutoff"))))
    ts = F.col(ts_col)
    c_ts = F.col("cutoff").cast("timestamp")
    in_train = (ts >= F.date_sub(F.col("cutoff"), train_days).cast("timestamp")) & (ts < c_ts)
    in_test = (ts >= c_ts) & (ts < F.date_add(F.col("cutoff"), test_days).cast("timestamp"))
    aggs = [
        F.count(F.when(in_train, 1)).alias("n_train"),
        F.count(F.when(in_test, 1)).alias("n_test"),
    ]
    if value_col is not None:
        aggs.insert(
            1,
            F.sum(F.when(in_train, F.col(value_col))).alias("train_value"),
        )
    return (
        e.where(in_train | in_test)
        .groupBy(*[F.col(k) for k in key_cols], F.col("cutoff"))
        .agg(*aggs)
    )


def take_train_dts(
    n: int,
    back_step: int,
    dm_range: tuple[str, str],
    dw_range: tuple[str, str],
    intervals: Sequence[int],
) -> dict:
    """``take-train-dts`` (mlvar/d_bolome_user_order_stat.clj:52-70) —
    plan-time (driver-side, config-sized) generation of the shifted
    train/test window specs:

    For each train base date (his-max-dt stepping back ``back_step`` days
    while ≥ dw-min): a label window y rebased to the data-mart span ending
    at that date, and per requested lookback ``interval`` an x feature
    window [x-max − interval, x-max], where x-max is y-end shifted by the
    his-max→dm-end gap. Training specs = first ``n`` (or while every
    interval fits above dw-min); test = the spec at dm-end.

    Returns ``{"train": [spec…], "test": [spec…]}`` with spec =
    ``{"y": (y_start, y_end), "xs": {interval: (x_start, x_end)}}``.
    """
    from datetime import date, timedelta

    def parse(s: str) -> date:
        return date.fromisoformat(s)

    def fmt(d: date) -> str:
        return d.isoformat()

    dm_start, dm_end = parse(dm_range[0]), parse(dm_range[1])
    dw_min, dw_max = parse(dw_range[0]), parse(dw_range[1])
    his_max = min(dw_max, dm_start - timedelta(days=1))
    dm_span = (dm_end - dm_start).days
    x_gap = (dm_end - his_max).days

    def cal_dts(dt: date) -> dict | None:
        y_end = dt
        y_start = y_end - timedelta(days=dm_span)
        x_max = y_end - timedelta(days=x_gap)
        xs = {}
        for itv in sorted(intervals):
            x_start = x_max - timedelta(days=itv)
            if x_start < dw_min:
                break  # take-while: larger intervals won't fit either
            xs[itv] = (fmt(x_start), fmt(x_max))
        if not xs:
            return None
        return {"y": (fmt(y_start), fmt(y_end)), "xs": xs}

    train = []
    base = his_max
    while base >= dw_min:
        spec = cal_dts(base)
        if spec is None:
            break
        train.append(spec)
        base -= timedelta(days=back_step)
    if n < len(train):
        train = train[:n]
    else:
        train = [s for s in train if len(s["xs"]) == len(intervals)]
    test_spec = cal_dts(dm_end)
    return {"train": train, "test": [test_spec] if test_spec else []}


def shift_cut_features(
    items: DataFrame,
    windows: dict,
    user_col: str,
    dt_col: str,
    product_col: str,
    order_col: str,
    metric_cols: Sequence[str],
    product_ids: Sequence = (),
) -> DataFrame:
    """``shift-cut-trgx`` (mlvar/d_bolome_user_order_stat_new2017-03-10.clj
    :97-135) over the LONG tree format: per (user, window, interval)
    feature aggregation of the per-user order tree, shifted/truncated to
    each train/test window.

    The reference walked each user's nested EDN tree per window spec on
    one thread (``tree-nodes`` with ``[:range …]``/``"*"`` filters). Here
    ``items`` is the tree's item-level long format (user, dt, product,
    order, metrics…); the window specs (config-sized, from
    :func:`take_train_dts`) broadcast-join the items and ONE grouped pass
    computes, per (user, kind, window, interval):

    - ``y_flag``    — any activity in the label window y (the reference's
      ``y?`` evaluates ``(true? <map>)`` which is constant-false — a
      quirk/bug; we implement the evident intent);
    - ``order_cnt`` — distinct orders in the x feature window
      (``tree-nodes … :CHILDREN "*" :CHILDREN "*"`` count);
    - per-metric sums over item DATA (``"true"``/``"false"`` strings count
      as 1/0, matching the condp coercion at :110);
    - the same sums restricted to each id in ``product_ids``
      (``:CHILDREN product-id`` at :115), as ``<metric>_p<id>`` columns.

    Scale: windows are plan-time config → broadcast; the single shuffle is
    the grouped aggregation on (user, window keys) — partial aggregation
    combines map-side exactly like any sliding-window feature build.
    """
    spark = items.sparkSession
    w_rows = []
    for kind in ("train", "test"):
        for w_idx, spec in enumerate(windows.get(kind, [])):
            y_start, y_end = spec["y"]
            for itv, (x_start, x_end) in spec["xs"].items():
                w_rows.append((kind, w_idx, y_start, y_end, int(itv), x_start, x_end))
    wdf = spark.createDataFrame(
        w_rows,
        "kind string, window_idx int, y_start string, y_end string,"
        " x_interval int, x_start string, x_end string",
    )
    dt = F.col(dt_col).cast("string")
    joined = items.crossJoin(F.broadcast(wdf)).where(
        ((dt >= F.col("x_start")) & (dt <= F.col("x_end")))
        | ((dt >= F.col("y_start")) & (dt <= F.col("y_end")))
    )
    in_x = (dt >= F.col("x_start")) & (dt <= F.col("x_end"))
    in_y = (dt >= F.col("y_start")) & (dt <= F.col("y_end"))

    def as_num(c: str):
        # decimal-exact so sums are order-independent (oracle hash parity);
        # "true"/"false" strings count 1/0 per the reference's condp at :110
        col = F.col(c)
        return (
            F.when(col.cast("string") == "true", F.lit(1))
            .when(col.cast("string") == "false", F.lit(0))
            .otherwise(col)
            .cast("decimal(18,2)")
        )

    aggs = [
        F.max(F.when(in_y, 1).otherwise(0)).alias("y_flag"),
        F.count_distinct(
            F.when(in_x, F.struct(dt, F.col(product_col), F.col(order_col)))
        ).alias("order_cnt"),
    ]
    for m in metric_cols:
        aggs.append(F.sum(F.when(in_x, as_num(m))).alias(m))
    for pid in product_ids:
        for m in metric_cols:
            aggs.append(
                F.sum(
                    F.when(in_x & (F.col(product_col) == pid), as_num(m))
                ).alias(f"{m}_p{pid}")
            )
    return joined.groupBy(
        F.col(user_col),
        F.col("kind"),
        F.col("window_idx"),
        F.col("x_interval"),
    ).agg(*aggs)


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "",
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic train/val/test assignment by content hash (beyond-
    reference; the standard leakage-safe split for training-data pipelines).

    Adds a ``split`` column: bucket = first 8 hex chars of
    ``md5(str(id) || salt)`` as an integer mod ``buckets``; labels are
    assigned by cumulative weight thresholds in ``weights`` insertion
    order. Properties that sampling-based splits lack:

    - **stable**: a document keeps its split across reruns, engines, and
      corpus growth (no RNG, no row ordering dependence);
    - **portable**: plain md5 — any engine reproduces the exact
      assignment (the DuckDB oracle does);
    - **leakage-safe**: keying on a *content* id (or near-dup cluster id
      from the dedup tiers) keeps duplicates on one side of the split;
    - ``salt`` versions the split without touching the data.

    100 TB posture: pure map-side expression, no shuffle, no RNG state.
    """
    total = sum(weights.values())
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 8), 16, 10)
        .cast("long")
        % buckets
    )
    expr = None
    acc = 0.0
    *head, (last_name, _last_w) = list(weights.items())
    for name, w in head:
        acc += w / total * buckets
        cond = bucket < F.lit(int(round(acc)))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(last_name) if expr is None else expr.otherwise(last_name)
    return df.withColumn("split", expr)


def funnel_conversion(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Ordered funnel: a user converts step *i* when an event of type
    ``steps[i]`` occurs strictly AFTER their step *i−1* conversion time
    (first-touch semantics: earliest qualifying event per step).

    Output: one row per step — ``step`` (1-based), ``step_name``,
    ``users`` converting through it, and ``conv_rate`` vs the previous
    step (1.0 for the first).

    100 TB posture — ONE shuffle of the event table: every per-step time
    is an unbounded ``min(when(...))`` window over the same
    ``partitionBy(user)`` spec, so Catalyst plans a single Exchange and
    chains the (dependent) WindowExecs on that one partitioning with no
    re-shuffle and no sort (unbounded frame). The naive SQL formulation
    (one self-join per step, as the oracle does) shuffles the event table
    |steps| times. The final |steps|-row presentation is an ``explode``
    over ONE aggregate row — a per-step ``union`` would recompute the
    whole window+agg subtree per branch (measured: 3 scans, 6 exchanges).
    """
    w = Window.partitionBy(user_col)
    # only funnel-step events matter: the IN filter reaches the parquet scan
    out = events.select(user_col, ts_col, type_col).where(
        F.col(type_col).isin(list(steps))
    )
    prev: Column | None = None
    tcols = []
    for i, s in enumerate(steps):
        cond = F.col(type_col) == s
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        t = f"__t{i}"
        out = out.withColumn(t, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = t
        tcols.append(t)
    per_user = out.groupBy(user_col).agg(
        *[F.max(t).alias(t) for t in tcols]
    )
    counts = per_user.agg(
        *[F.count(t).alias(f"__c{i}") for i, t in enumerate(tcols)]
    )
    structs = []
    for i, s in enumerate(steps):
        users = F.col(f"__c{i}")
        if i == 0:
            rate = F.lit(1.0)
        else:
            rate = F.round(users / F.col(f"__c{i - 1}"), 6)
        structs.append(
            F.struct(
                F.lit(i + 1).cast("int").alias("step"),
                F.lit(s).alias("step_name"),
                users.cast("long").alias("users"),
                rate.cast("double").alias("conv_rate"),
            )
        )
    return counts.select(F.explode(F.array(*structs)).alias("__r")).select("__r.*")


def mix_corpus(
    df: DataFrame,
    source_col: str,
    id_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    salt: str = "",
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic corpus mixing (beyond-reference; the training-data
    recipe step): downsample each source to its target ``rates`` fraction
    by content-hash threshold — the same md5-bucket primitive as
    :func:`hash_split`, so the sample is stable across reruns/engines and
    a document's fate never depends on row ordering or RNG state.

    Upsampling (rate > 1) is epoch-repetition, a separate explode-based
    concern; rates here are keep-fractions in [0, 1]. Pure map-side
    filter: at 100 TB this prunes at the scan (no shuffle, no sample()
    nondeterminism across retried tasks — a real failure mode: Spark
    ``sample`` re-draws on task retry, silently changing the corpus).
    """
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % buckets
    )
    thr = None
    for s, r in rates.items():
        cond = F.col(source_col) == s
        t = F.lit(int(round(r * buckets)))
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    thr = F.lit(int(round(default_rate * buckets))) if thr is None else thr.otherwise(
        int(round(default_rate * buckets))
    )
    return df.where(bucket < thr)


def repeat_epochs(
    df: DataFrame,
    id_col: str,
    rate: float,
    salt: str = "epoch",
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic upsampling to a fractional epoch ``rate`` (e.g. 2.5 →
    every row twice, a stable hash-chosen half a third time), emitting an
    ``epoch`` column (1-based) so downstream shuffles can spread the
    copies. The integer part is an ``explode(sequence(...))`` — map-side
    row generation, no join; the fractional part reuses the md5-bucket
    threshold (same guarantees as :func:`mix_corpus`: rerun/engine/
    retry-stable, no RNG). Rates < 1 belong to :func:`mix_corpus`.
    """
    if rate < 1.0:
        raise ValueError("repeat_epochs needs rate >= 1; use mix_corpus to downsample")
    whole = int(rate)
    frac = rate - whole
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % buckets
    )
    n_copies = F.lit(whole) + (bucket < F.lit(int(round(frac * buckets)))).cast("int")
    return df.withColumn(
        "epoch", F.explode(F.sequence(F.lit(1), n_copies))
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "s1",
    buckets: int = 1_000_000,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its md5 bucket
    falls under its stratum's rate threshold. The corpus-rebalancing
    primitive (downsample over-represented languages/sources to target
    shares) with :func:`hash_split`'s guarantees — stable across reruns
    and engines, no RNG, no row-order dependence; ``salt`` versions the
    sample.

    ``rates`` maps stratum value → keep fraction in [0, 1]; unlisted
    strata fall back to ``default_rate``. The rate map is a plan-time
    constant folded into a CASE chain (J5 broadcast pattern — at real
    scale, a broadcast-joined rates dim works identically).

    100 TB posture: pure map-side filter (one md5 + one comparison per
    row), no shuffle, arbitrarily skew-proof.
    """
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % buckets
    )
    thresh = None
    for value, rate in rates.items():
        cut = F.lit(int(round(rate * buckets)))
        cond = F.col(strata_col) == F.lit(value)
        thresh = F.when(cond, cut) if thresh is None else thresh.when(cond, cut)
    thresh = (
        F.lit(int(round(default_rate * buckets)))
        if thresh is None
        else thresh.otherwise(F.lit(int(round(default_rate * buckets))))
    )
    return df.where(bucket < thresh)


def recency_weighted_sample(
    df: DataFrame,
    id_col: str,
    ts_col: str,
    as_of: str,
    half_life_days: float = 365.0,
    floor_rate: float = 0.05,
    salt: str = "r1",
    buckets: int = 1_000_000,
):
    """Freshness-weighted corpus sampling: keep probability decays with
    document age — ``rate = max(floor, 0.5 ** (age_days / half_life))`` —
    so recent data is upweighted without dropping the long tail entirely
    (the standard recency bias applied when mixing crawl snapshots).

    Deterministic md5 coin (same discipline as :func:`stratified_sample`:
    stable across reruns/engines, no RNG, no row-order dependence; ``salt``
    versions the sample). Age is whole days before ``as_of``; future rows
    clamp to age 0. Returns the kept rows plus their ``keep_rate``.

    100 TB posture: pure map-side — one datediff, one pow, one md5 per
    row; no shuffle, skew-proof. The decay curve is plan-time arithmetic,
    so Catalyst constant-folds everything but the per-row hash/compare.
    """
    age = F.greatest(F.datediff(F.lit(as_of), F.col(ts_col)), F.lit(0))
    rate = F.greatest(
        F.lit(floor_rate),
        F.pow(F.lit(0.5), age.cast("double") / F.lit(half_life_days)),
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % buckets
    )
    return df.withColumn("keep_rate", F.round(rate, 6)).where(
        bucket < F.round(rate * buckets).cast("long")
    )


def weighted_sample_topn(
    df: DataFrame,
    id_col: str,
    weight: Column,
    n: int,
    salt: str = "w1",
):
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    key = u^(1/w) with u a deterministic md5 uniform per row; the top-``n``
    keys are an exact weighted sample — the primitive for "downsample this
    corpus to a token budget, long/high-quality docs preferred".

    Inclusion probabilities follow the weights exactly (the A-ES theorem);
    determinism comes from the md5 coin (same discipline as
    :func:`stratified_sample` — reruns and engines agree, ``salt``
    versions the draw). Returns the sampled rows plus ``sample_key``.

    100 TB posture: map-side key computation + ``TakeOrderedAndProject``
    (per-partition top-n, driver merge of n rows) — no global sort, no
    shuffle of the corpus. Weights ≤ 0 are excluded (A-ES domain).
    """
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 12
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(1 << 48))
    )
    key = F.pow(u, F.lit(1.0) / weight.cast("double"))
    return (
        df.where(weight > 0)
        .withColumn("sample_key", key)
        .orderBy(F.col("sample_key").desc(), F.col(id_col))
        .limit(n)
    )
