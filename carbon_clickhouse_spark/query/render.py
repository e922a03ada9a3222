"""Graphite render-style series transforms.

The reference's companion stack (graphite-web / carbonapi) applies
these per-series functions after the table read; users switching to
this engine keep their daily vocabulary: derivative, perSecond,
nonNegativeDerivative, movingAverage, summarize (= rollup with an
explicit function), scale/offset.

All are window expressions over ``(path, time)`` — one shuffle per
series partition, ordered evaluation, no UDFs. Counters wrap exactly
like Graphite: nonNegativeDerivative emits NULL on resets.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.rollup import RollupRule, rollup


def _w():
    return Window.partitionBy("path").orderBy("time")


def derivative(series: DataFrame) -> DataFrame:
    """value - previous value per series (first point -> NULL)."""
    return series.select(
        "path",
        "time",
        (F.col("value") - F.lag("value").over(_w())).alias("value"),
    )


def _nn_delta(max_value: float | None):
    """graphite-web 1.1's counter delta rule (functions.rst
    nonNegativeDerivative: 'By default, a null value is returned in
    place of negative datapoints. When maxValue is supplied, the
    missing value is computed as if the counter had wrapped at
    maxValue'): value > maxValue -> NULL (impossible reading),
    negative delta with maxValue -> maxValue + 1 + delta (the wrap),
    negative delta without -> NULL."""
    prev = F.lag("value").over(_w())
    d = F.col("value") - prev
    if max_value is None:
        return F.when(d >= 0, d)
    mv = F.lit(float(max_value))
    return (
        F.when(F.col("value") > mv, F.lit(None).cast("double"))
        .when(d >= 0, d)
        .when(prev <= mv, mv + F.lit(1.0) + d)
    )


def non_negative_derivative(
    series: DataFrame, max_value: float | None = None
) -> DataFrame:
    """Like derivative but counter resets (negative deltas) -> NULL;
    with ``max_value``, negative deltas are un-wrapped as
    ``maxValue + 1 + delta`` per the graphite-web 1.1 contract (see
    :func:`_nn_delta`)."""
    return series.select(
        "path", "time", _nn_delta(max_value).alias("value")
    )


def per_second(
    series: DataFrame, max_value: float | None = None
) -> DataFrame:
    """Rate: counter delta / delta time (the counter -> rate
    transform); ``max_value`` un-wraps counter wraps exactly as
    :func:`non_negative_derivative`."""
    dt = F.col("time") - F.lag("time").over(_w())
    rate = F.when(dt > 0, _nn_delta(max_value) / dt)
    return series.select("path", "time", rate.alias("value"))


def moving_average(
    series: DataFrame,
    points: int = 5,
    window_s: int | None = None,
    exclusive: bool = False,
    xff: float | None = None,
) -> DataFrame:
    """Moving average over the last ``points`` samples, or — when
    ``window_s`` is given (Graphite's quoted-interval form,
    ``movingAverage(s, '5min')``) — over the trailing time window.

    ``exclusive=True`` is graphite-web 1.1's documented contract
    ("the moving average of the *preceding* datapoints for each
    point": functions.rst movingAverage, and movingWindow's window
    ``series[i - windowPoints : i]``) — the CURRENT point is NOT in
    its own window, and an empty window yields NULL. The facade
    evaluates movingAverage this way with a preview fetch before the
    requested start (upstream's bootstrap). ``exclusive=False`` keeps
    the trailing-inclusive form for direct library use.

    Sums in DECIMAL over the frame (exact, engine-independent) and
    divides by the frame row count.
    """
    if window_s is not None:
        frame = (
            _w().rangeBetween(-window_s, -1)
            if exclusive
            else _w().rangeBetween(-(window_s - 1), 0)
        )
    else:
        frame = (
            _w().rowsBetween(-points, -1)
            if exclusive
            else _w().rowsBetween(-(points - 1), 0)
        )
    s = F.sum(F.col("value").cast("decimal(32,6)")).over(frame).cast("double")
    n = F.count("value").over(frame)
    ok = n > 0
    if xff is not None:
        # movingWindow xFilesFactor: a window whose non-null fraction
        # falls below xff emits None (explicit null rows count
        # against the budget; absent grid slots cannot)
        rows = F.count(F.lit(1)).over(frame)
        ok = ok & (n.cast("double") >= F.lit(float(xff)) * rows)
    return series.select(
        "path", "time", F.when(ok, s / n).alias("value")
    )


def summarize(
    series: DataFrame, interval_s: int, func: str = "sum", exact: bool = True
) -> DataFrame:
    """Graphite ``summarize(series, interval, func)`` == a one-rule
    rollup at fixed precision."""
    return rollup(
        series,
        (RollupRule("", func),),
        precision_s=interval_s,
        exact_decimal=exact,
        round_avg_to=4 if (exact and func == "avg") else None,
    )


def integral(series: DataFrame) -> DataFrame:
    """Running total per series (Graphite ``integral``). Accumulates
    in DECIMAL so the running values are exact."""
    w = _w().rowsBetween(Window.unboundedPreceding, 0)
    s = F.sum(F.col("value").cast("decimal(32,6)")).over(w).cast("double")
    return series.select("path", "time", s.alias("value"))


def group_by_node(
    series: DataFrame, node: int, func: str = "sum", exact: bool = True
) -> DataFrame:
    """Graphite ``groupByNode(node, func)``: collapse series whose
    paths share segment ``node`` — e.g. node=1 over
    ``ev.u1.click`` groups by ``u1`` across event types.

    Cross-series aggregation per timestamp; sums run in DECIMAL when
    ``exact`` (engine-stable)."""
    key = _node_item(F.split(F.col("path"), r"\."), node).alias("path")
    v = F.col("value").cast("decimal(32,6)") if exact else F.col("value")
    grouped = series.select(key, "time", v.alias("v")).groupBy("path", "time")
    if func == "sum":
        out = grouped.agg(F.sum("v").alias("value"))
    elif func == "min":
        out = grouped.agg(F.min("v").alias("value"))
    elif func == "max":
        out = grouped.agg(F.max("v").alias("value"))
    elif func == "avg":
        out = grouped.agg(
            (F.sum("v").cast("double") / F.count("v")).alias("value")
        )
        return out.select("path", "time", "value")
    else:
        raise ValueError(f"unsupported func {func}")
    return out.select("path", "time", F.col("value").cast("double").alias("value"))


def scale(series: DataFrame, factor: float) -> DataFrame:
    return series.select(
        "path", "time", (F.col("value") * F.lit(factor)).alias("value")
    )


def offset(series: DataFrame, amount: float) -> DataFrame:
    return series.select(
        "path", "time", (F.col("value") + F.lit(amount)).alias("value")
    )


def time_shift(series: DataFrame, seconds: int) -> DataFrame:
    """Graphite ``timeShift``: move every point by ``seconds`` (positive
    = into the past, matching timeShift(series, "+1h") semantics)."""
    return series.select(
        "path", (F.col("time") + F.lit(seconds)).alias("time"), "value"
    )


def absolute(series: DataFrame) -> DataFrame:
    return series.select("path", "time", F.abs("value").alias("value"))


def logarithm(series: DataFrame, base: float = 10.0) -> DataFrame:
    """Graphite ``logarithm``: log_base(value); non-positive -> NULL
    (Graphite draws a gap)."""
    v = F.when(F.col("value") > 0, F.log(float(base), "value"))
    return series.select("path", "time", v.alias("value"))


def invert(series: DataFrame) -> DataFrame:
    """Graphite ``invert``: 1/value; zero -> NULL."""
    v = F.when(F.col("value") != 0, F.lit(1.0) / F.col("value"))
    return series.select("path", "time", v.alias("value"))


def remove_above_value(series: DataFrame, n: float) -> DataFrame:
    """Graphite ``removeAboveValue``: points above n -> NULL."""
    v = F.when(F.col("value") <= n, F.col("value"))
    return series.select("path", "time", v.alias("value"))


def remove_below_value(series: DataFrame, n: float) -> DataFrame:
    v = F.when(F.col("value") >= n, F.col("value"))
    return series.select("path", "time", v.alias("value"))


def clamp(series: DataFrame, lo: float, hi: float) -> DataFrame:
    """minimum/maximum clamp (Graphite ``limit`` family analog)."""
    v = F.least(F.greatest(F.col("value"), F.lit(lo)), F.lit(hi))
    return series.select("path", "time", v.alias("value"))


def keep_last_value(series: DataFrame, limit: int | None = None) -> DataFrame:
    """Graphite ``keepLastValue``: forward-fill NULL gaps per series
    with the last non-NULL value; with ``limit`` a gap is filled
    ONLY when its TOTAL length is at most ``limit`` consecutive
    NULLs — all-or-nothing per gap, exactly graphite-web 1.1's
    ``consecutiveNones <= limit`` check at the gap's end (r12: the
    previous reading filled the first ``limit`` points of a LONGER
    gap too, which upstream never does).

    Two windows, no UDFs: last-non-null carry via
    ``last(ignorenulls)``, gap length via a run-id (count of
    non-nulls so far — one run = a real point plus its trailing NULL
    gap) and an unordered count over the run.
    """
    w = _w().rowsBetween(Window.unboundedPreceding, 0)
    carried = F.last("value", ignorenulls=True).over(w)
    if limit is None:
        return series.select("path", "time", carried.alias("value"))
    run_id = F.count("value").over(w)
    s = series.withColumn("_run", run_id)
    gap_len = (
        F.count(F.lit(1)).over(Window.partitionBy("path", "_run"))
        - F.lit(1)
    )
    filled = F.when(
        F.col("value").isNotNull(), F.col("value")
    ).when(gap_len <= limit, carried)
    return s.select("path", "time", filled.alias("value"))


def as_percent(series: DataFrame) -> DataFrame:
    """Graphite ``asPercent(series)`` with the implicit total: each
    point as a percentage of the sum across ALL series at that
    timestamp. DECIMAL total (exact, engine-stable), then a pure
    double op chain (decimal *division* scales differ across engines,
    so the division happens in IEEE doubles on both sides)."""
    tot = Window.partitionBy("time")
    v = F.col("value").cast("decimal(32,6)")
    total = F.sum(v).over(tot)
    pct = F.when(
        total != 0,
        v.cast("double") * 100 / total.cast("double"),
    )
    return series.select("path", "time", pct.alias("value"))


def highest(series: DataFrame, n: int, func: str = "max") -> DataFrame:
    """Graphite ``highestMax / highestCurrent / highestAverage``: keep
    the full series of the top ``n`` paths ranked by ``func`` over the
    window. Ties break on path (deterministic). The per-path stat is a
    partial-aggregating groupBy; the winner set is broadcast back —
    never a global sort of the points.
    """
    stat = _per_series_stat(series, func)
    # distributed top-k (TakeOrderedAndProject), NOT a global
    # single-partition window — survives millions of paths
    top = stat.orderBy(F.desc("stat"), F.asc("path")).limit(n).select("path")
    # winner set is <= n rows: broadcast semi-join, no shuffle of points
    from pyspark.sql.functions import broadcast

    return series.join(broadcast(top), "path", "left_semi")


def _per_series_stat(series: DataFrame, func: str) -> DataFrame:
    """(path, stat) for the series-selection family. Partial-
    aggregating groupBy — one narrow shuffle of per-path stats, never
    a sort of the points."""
    v = F.col("value").cast("decimal(32,6)")
    per_path = series.groupBy("path")
    if func == "max":
        return per_path.agg(F.max(v).cast("double").alias("stat"))
    if func == "min":
        return per_path.agg(F.min(v).cast("double").alias("stat"))
    if func == "avg":
        return per_path.agg(
            (F.sum(v).cast("double") / F.count("value")).alias("stat")
        )
    if func in ("current", "last"):
        # graphite safeLast: the last NON-NULL value (a null ordering
        # key drops the row from max_by, so trailing nulls — e.g.
        # from timeSlice — don't null the stat)
        nn_t = F.when(F.col("value").isNotNull(), F.col("time"))
        return per_path.agg(
            F.max_by(v, nn_t).cast("double").alias("stat")
        )
    if func in ("sum", "total"):
        return per_path.agg(F.sum(v).cast("double").alias("stat"))
    # the rest of graphite's aggFuncTable (usable wherever an
    # aggregation name is accepted: highest/lowest, sortBy, ...)
    if func == "median":
        return per_path.agg(
            F.expr("percentile(value, 0.5)").alias("stat")
        )
    if func == "stddev":
        return per_path.agg(F.stddev_pop("value").alias("stat"))
    if func == "count":
        return per_path.agg(F.count("value").cast("double").alias("stat"))
    if func in ("range", "rangeOf"):
        return per_path.agg(
            (F.max("value") - F.min("value")).alias("stat")
        )
    if func == "first":
        # safeFirst: the first NON-NULL value
        nn_t = F.when(F.col("value").isNotNull(), F.col("time"))
        return per_path.agg(
            F.min_by("value", nn_t).cast("double").alias("stat")
        )
    if func == "multiply":
        return per_path.agg(F.product("value").alias("stat"))
    raise ValueError(f"unsupported func {func}")


def filter_series(
    series: DataFrame, func: str, op: str, threshold: float
) -> DataFrame:
    """Graphite ``averageAbove/averageBelow/currentAbove/currentBelow/
    maximumAbove/maximumBelow/minimumAbove/minimumBelow`` family: keep
    the FULL series of every path whose ``func`` over the window
    compares ``op`` ('>' / '<' / '>=' / '<=') against ``threshold``.

    The qualifying path set is series-cardinality (tiny next to the
    points) — broadcast semi-join back, same shape as :func:`highest`.
    """
    # upstream consolidation-function names ('average', 'last', ...)
    # normalize through the same table sortBy uses (r12 — 'average'
    # previously raised)
    stat = _per_series_stat(series, _SORT_FUNCS.get(str(func), func))
    ops = {
        ">": F.col("stat") > threshold,
        ">=": F.col("stat") >= threshold,
        "<": F.col("stat") < threshold,
        "<=": F.col("stat") <= threshold,
        "=": F.col("stat") == threshold,
        "!=": F.col("stat") != threshold,
    }
    if op not in ops:
        raise ValueError(f"unsupported op {op}")
    winners = stat.filter(ops[op]).select("path")
    return series.join(F.broadcast(winners), "path", "left_semi")


def average_above(series: DataFrame, n: float) -> DataFrame:
    return filter_series(series, "avg", ">", n)


def average_below(series: DataFrame, n: float) -> DataFrame:
    return filter_series(series, "avg", "<", n)


def current_above(series: DataFrame, n: float) -> DataFrame:
    return filter_series(series, "current", ">", n)


def current_below(series: DataFrame, n: float) -> DataFrame:
    return filter_series(series, "current", "<", n)


def maximum_above(series: DataFrame, n: float) -> DataFrame:
    return filter_series(series, "max", ">", n)


def minimum_below(series: DataFrame, n: float) -> DataFrame:
    return filter_series(series, "min", "<", n)


def alias_sub(series: DataFrame, pattern: str, replacement: str) -> DataFrame:
    """Graphite ``aliasSub(series, search, replace)``: regex rename of
    the series name (Java regex; graphite-web uses Python re — the
    subset used for metric renames is identical)."""
    return series.withColumn(
        "path", F.regexp_replace("path", pattern, replacement)
    )


def offset_to_zero(series: DataFrame) -> DataFrame:
    """Graphite ``offsetToZero``: subtract each series' minimum so the
    series floor sits at zero. One window per path, no shuffle beyond
    the path partitioning."""
    from pyspark.sql import Window

    wp = Window.partitionBy("path")
    return series.withColumn(
        "value", F.col("value") - F.min("value").over(wp)
    )


def stdev(
    series: DataFrame, points: int = 5, window_tolerance: float = 0.1
) -> DataFrame:
    """Graphite ``stdev(series, points, windowTolerance=0.1)``:
    trailing population stddev over the last ``points`` samples; a
    window whose NULL fraction exceeds ``windowTolerance`` emits
    None instead (upstream skips the calculation when too much of
    the window is missing — explicit null rows, e.g. from upstream
    transforms, count against the budget; absent grid slots cannot,
    since the row window only sees materialized rows).

    Integer-exact moment sums (values scaled to 2-decimal ints), one
    double division, one sqrt — bit-identical across engines."""
    frame = _w().rowsBetween(-(points - 1), 0)
    x = F.round(F.col("value") * 100).cast("long")
    n = F.count("value").over(frame)
    rows = F.count(F.lit(1)).over(frame)
    sx = F.sum(x).over(frame)
    sxx = F.sum(x * x).over(frame)
    # var = (n*sxx - sx^2) / (n^2 * 10^4); exact integers until the cast
    num = (n * sxx - sx * sx).cast("double")
    den = (n * n * F.lit(10000)).cast("double")
    ok = (rows - n).cast("double") <= F.lit(float(window_tolerance)) * rows
    # n > 0 keeps the 0/0 division out of an all-null window even
    # under a permissive tolerance (ANSI would error, not NaN)
    return series.select(
        "path", "time", F.when(ok & (n > 0), F.sqrt(num / den)).alias("value")
    )


def ema_holt(
    series: DataFrame,
    window: int = 10,
    alpha: float = 0.1,
    beta: float = 0.0035,
    emit_from: int | None = None,
    ema_seed: str = "first",
) -> DataFrame:
    """THE sequential-recursion kernel behind both
    ``exponentialMovingAverage`` and the Holt linear forecast — one
    applyInPandas pass per series computes both columns, and the two
    public wrappers below project from it, so the update equations
    live in exactly one place.

    EMA: alpha_e = 2/(window+1), seeded with the first value; NULL/NaN
    inputs emit NULL and leave the state unchanged.
    Holt (non-seasonal holtWintersForecast core; graphite-web's
    holt_winters_analysis defaults): l_1 = x_1, b_1 = 0,
    forecast_1 = NULL; then forecast_t = l_{t-1} + b_{t-1},
    l_t = alpha*x_t + (1-alpha)*forecast_t,
    b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}.

    ``emit_from``/``ema_seed`` implement the graphite-web 1.1
    documented EMA contract (functions.rst exponentialMovingAverage:
    'The Constant is calculated as: constant = 2 / (windowSize + 1).
    The first period EMA uses a simple moving average of the
    preceding windowSize points'): rows with time < ``emit_from`` are
    the bootstrap — with ``ema_seed='sma'`` their simple average
    seeds the EMA (0 when the bootstrap is empty, upstream's safeAvg
    `or 0`), the first emitted point carries that seed, and bootstrap
    rows warm the Holt state without being emitted.

    SEEDED-MODE ALIGNMENT (r12, ADVICE r11): upstream's loop is
    ``for value in series[windowPoints:-1]`` appended AFTER the seed
    — the value at T-step folds into the output at T, the first
    requested point's value feeds the SECOND output, the final
    point's value never enters the recursion, a None input emits
    None and leaves the state untouched, and every emitted value is
    ``round(ema, 6)`` (state stays unrounded). functions.rst is
    ambiguous on the alignment; this matches the 1.1
    implementation, not the earlier same-step doc reading (the
    sparse-row caveat: upstream's dense list emits None for a
    missing step — a sparse store simply has no row to emit there).
    The defaults (emit everything, seed with the first value) keep
    the direct library behavior, same-step fold, unrounded.

    No closed window-function form stays numerically stable, so this
    is the textbook applyInPandas case: one shuffle on path, one
    sequential float64 recursion per Arrow group — scales with series
    count, length-independent state (three floats)."""
    import math

    import pandas as pd
    from pyspark.sql import types as T

    alpha_e = 2.0 / (window + 1)
    om_e = 1.0 - alpha_e
    oma, omb = 1.0 - alpha, 1.0 - beta
    schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("time", T.LongType()),
            T.StructField("ema", T.DoubleType()),
            T.StructField("forecast", T.DoubleType()),
        ]
    )

    def rec(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("time")
        emas, fcs = [], []
        e = None
        level = trend = None
        seeded = False
        if ema_seed == "sma" and emit_from is not None:
            boot = [
                v
                for t, v in zip(pdf["time"], pdf["value"])
                if t < emit_from
                and v is not None
                and not (isinstance(v, float) and math.isnan(v))
            ]
            e = (sum(boot) / len(boot)) if boot else 0.0
            seeded = True
        first_emit = True
        prev_v, prev_null = None, True
        for t, v in zip(pdf["time"], pdf["value"]):
            boot_row = emit_from is not None and t < emit_from
            null_v = v is None or (
                isinstance(v, float) and math.isnan(v)
            )
            if seeded:
                # upstream 1.1 alignment (r12): the first emitted
                # point IS the seed; every later point folds the
                # PREVIOUS emitted row's value (series[wp:-1] — the
                # final value never folds); None emits None, state
                # unchanged; emitted values round(., 6)
                if not boot_row:
                    if first_emit:
                        emas.append(round(e, 6))
                        first_emit = False
                    elif prev_null:
                        emas.append(None)
                    else:
                        e = alpha_e * prev_v + om_e * e
                        emas.append(round(e, 6))
                    prev_v, prev_null = v, null_v
                # boot rows: the SMA seed already summarizes them
            elif null_v:
                if not boot_row:
                    emas.append(None)
            else:
                e = v if e is None else alpha_e * v + om_e * e
                if not boot_row:
                    emas.append(e)
            if level is None:
                level, trend = v, 0.0
                if not boot_row:
                    fcs.append(None)
            else:
                s = level + trend
                if not boot_row:
                    fcs.append(s)
                if not null_v:
                    new_level = alpha * v + oma * s
                    trend = beta * (new_level - level) + omb * trend
                    level = new_level
        keep = (
            pdf[pdf["time"] >= emit_from]
            if emit_from is not None
            else pdf
        )
        return pd.DataFrame(
            {"path": keep["path"], "time": keep["time"], "ema": emas,
             "forecast": fcs}
        )

    return series.select("path", "time", "value").groupBy("path").applyInPandas(
        rec, schema
    )


def exponential_moving_average(series: DataFrame, window: int = 10) -> DataFrame:
    """Graphite ``exponentialMovingAverage(series, window)`` —
    projection of the shared :func:`ema_holt` kernel."""
    return ema_holt(series, window=window).select(
        "path", "time", F.col("ema").alias("value")
    )


def holt_forecast(
    series: DataFrame, alpha: float = 0.1, beta: float = 0.0035
) -> DataFrame:
    """Holt linear one-step-ahead forecast — projection of the shared
    :func:`ema_holt` kernel."""
    return ema_holt(series, alpha=alpha, beta=beta).select(
        "path", "time", "forecast"
    )


def holt_winters(
    series: DataFrame,
    season_s: int = 86400,
    alpha: float = 0.1,
    beta: float = 0.0035,
    gamma: float = 0.1,
) -> DataFrame:
    """Seasonal (additive) Holt-Winters per series — graphite-web's
    ``holtWintersAnalysis`` recurrences (render/functions.py, public):
    level/trend smoothing plus a seasonal term one season back, and a
    seasonally-indexed absolute deviation:

        intercept_t = a*(y_t - s_{t-L}) + (1-a)*(intercept + slope)
        slope_t     = b*(intercept_t - intercept) + (1-b)*slope
        seasonal_t  = g*(y_t - intercept_t) + (1-g)*s_{t-L}
        forecast_t  = intercept + slope + s_{t+1-L}   (one step ahead)
        deviation_t = g*|y_t - forecast_t| + (1-g)*d_{t-L}

    Season length L in points = season_s / step, with the step
    inferred per series (parquet series carry no whisper metadata).
    -> (path, time, value, forecast, deviation). Same applyInPandas
    shape as :func:`ema_holt`: one shuffle on path, O(L) state."""
    import math

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("time", T.LongType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("forecast", T.DoubleType()),
            T.StructField("deviation", T.DoubleType()),
        ]
    )

    def analyze(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("time")
        times = pdf["time"].to_list()
        diffs = sorted({b - a for a, b in zip(times, times[1:]) if b > a})
        step = diffs[0] if diffs else 60
        L = max(1, int(round(season_s / step)))
        seasonals: list = []
        deviations: list = []
        intercept = slope = None
        next_pred = None
        fcs, devs = [], []
        for i, y in enumerate(pdf["value"]):
            bad = y is None or (isinstance(y, float) and math.isnan(y))
            last_seasonal = seasonals[i - L] if i - L >= 0 else 0.0
            next_last_seasonal = (
                seasonals[i + 1 - L] if i + 1 - L >= 0 else 0.0
            )
            last_dev = deviations[i - L] if i - L >= 0 else 0.0
            if bad:
                seasonals.append(0.0)
                deviations.append(0.0)
                fcs.append(next_pred)
                devs.append(None)
                next_pred = None
                continue
            if intercept is None:
                prediction = y
                li, ls = y, 0.0
            else:
                prediction = next_pred if next_pred is not None else y
                li, ls = intercept, slope
            intercept = alpha * (y - last_seasonal) + (1 - alpha) * (
                li + ls
            )
            slope = beta * (intercept - li) + (1 - beta) * ls
            seasonal = gamma * (y - intercept) + (1 - gamma) * last_seasonal
            next_pred = intercept + slope + next_last_seasonal
            deviation = gamma * abs(y - prediction) + (1 - gamma) * last_dev
            seasonals.append(seasonal)
            deviations.append(deviation)
            fcs.append(prediction)
            devs.append(deviation)
        return pd.DataFrame(
            {
                "path": pdf["path"],
                "time": pdf["time"],
                "value": pdf["value"],
                "forecast": fcs,
                "deviation": devs,
            }
        )

    return (
        series.select("path", "time", "value")
        .groupBy("path")
        .applyInPandas(lambda p: analyze(p), schema)
    )


def holt_winters_forecast(series: DataFrame, season_s: int = 86400) -> DataFrame:
    """Graphite ``holtWintersForecast``: the one-step-ahead seasonal
    forecast series."""
    return holt_winters(series, season_s).select(
        F.concat(F.lit("holtWintersForecast("), "path", F.lit(")")).alias(
            "path"
        ),
        "time",
        F.col("forecast").alias("value"),
    )


def holt_winters_confidence_bands(
    series: DataFrame, delta: float = 3.0, season_s: int = 86400
) -> DataFrame:
    """Graphite ``holtWintersConfidenceBands``: forecast +/- delta *
    deviation, two labeled series per input series."""
    hw = holt_winters(series, season_s)
    up = F.col("forecast") + F.lit(float(delta)) * F.col("deviation")
    lo = F.col("forecast") - F.lit(float(delta)) * F.col("deviation")
    mk = lambda tag, v: F.struct(  # noqa: E731
        F.concat(F.lit(f"holtWintersConfidence{tag}("), F.col("path"),
                 F.lit(")")).alias("path"),
        v.alias("value"),
    )
    return (
        hw.select(
            "time",
            F.explode(F.array(mk("Upper", up), mk("Lower", lo))).alias("s"),
        )
        .select(F.col("s.path").alias("path"), "time", "s.value")
    )


def holt_winters_aberration(
    series: DataFrame, delta: float = 3.0, season_s: int = 86400
) -> DataFrame:
    """Graphite ``holtWintersAberration``: how far each actual value
    strays outside the confidence band (0 inside it)."""
    hw = holt_winters(series, season_s)
    up = F.col("forecast") + F.lit(float(delta)) * F.col("deviation")
    lo = F.col("forecast") - F.lit(float(delta)) * F.col("deviation")
    ab = (
        F.when(F.col("value") > up, F.col("value") - up)
        .when(F.col("value") < lo, F.col("value") - lo)
        .otherwise(F.lit(0.0))
    )
    return hw.select(
        F.concat(F.lit("holtWintersAberration("), "path", F.lit(")")).alias(
            "path"
        ),
        "time",
        ab.alias("value"),
    )


def combine_series(series: DataFrame, func: str = "sum") -> DataFrame:
    """Graphite ``sumSeries / averageSeries / maxSeries / minSeries``:
    collapse ALL input series into one series per timestamp, labeled
    ``<func>Series``. Exact-decimal sums; min/max are order-free."""
    v = F.col("value").cast("decimal(32,6)")
    g = series.groupBy("time")
    if func == "sum":
        out = g.agg(F.sum(v).cast("double").alias("value"))
    elif func == "avg":
        out = g.agg(
            (F.sum(v).cast("double") / F.count("value")).alias("value")
        )
    elif func == "max":
        out = g.agg(F.max(v).cast("double").alias("value"))
    elif func == "min":
        out = g.agg(F.min(v).cast("double").alias("value"))
    else:
        raise ValueError(f"unsupported func {func}")
    return out.select(F.lit(f"{func}Series").alias("path"), "time", "value")


def diff_series(minuend: DataFrame, subtrahend: DataFrame) -> DataFrame:
    """Graphite ``diffSeries(a, b)``: a - b per timestamp; a missing
    minuend point yields NULL, a missing subtrahend counts as 0
    (Graphite's safeDiff over non-None terms)."""
    a = minuend.select("time", F.col("value").alias("va"))
    b = subtrahend.select("time", F.col("value").alias("vb"))
    j = a.join(b, "time", "left")
    return j.select(
        F.lit("diffSeries").alias("path"),
        "time",
        (F.col("va") - F.coalesce(F.col("vb"), F.lit(0.0))).alias("value"),
    )


def divide_series(dividend: DataFrame, divisor: DataFrame) -> DataFrame:
    """Graphite ``divideSeries(a, b)``: a / b per timestamp; NULL when
    the divisor is 0 or missing."""
    a = dividend.select("time", F.col("value").alias("va"))
    b = divisor.select("time", F.col("value").alias("vb"))
    j = a.join(b, "time", "left")
    v = F.when(
        F.col("vb").isNotNull() & (F.col("vb") != 0), F.col("va") / F.col("vb")
    )
    return j.select(F.lit("divideSeries").alias("path"), "time", v.alias("value"))


def divide_series_lists(
    dividends: DataFrame, divisors: DataFrame
) -> DataFrame:
    """Graphite ``divideSeriesLists``: divide the i-th dividend series
    by the i-th divisor series, pairing by sorted path order (graphite
    pairs positionally and errors on length mismatch; sorted order is
    the deterministic analog). The pairing table is series-cardinality
    (the single-partition ranking window is over distinct paths only,
    never points) and broadcasts onto the dividend rows."""
    w = Window.orderBy("path")
    pa = (
        dividends.select("path").distinct()
        .select(F.col("path").alias("pa"), F.row_number().over(w).alias("pos"))
    )
    pb = (
        divisors.select("path").distinct()
        .select(F.col("path").alias("pb"), F.row_number().over(w).alias("pos"))
    )
    pairs = pa.join(pb, "pos").select("pa", "pb")
    a = dividends.join(
        F.broadcast(pairs), dividends["path"] == pairs["pa"]
    ).select("pa", "pb", "time", F.col("value").alias("va"))
    b = divisors.select(
        F.col("path").alias("pb"), "time", F.col("value").alias("vb")
    )
    j = a.join(b, ["pb", "time"], "left")
    v = F.when(
        F.col("vb").isNotNull() & (F.col("vb") != 0),
        F.col("va") / F.col("vb"),
    )
    label = F.concat(
        F.lit("divideSeries("), F.col("pa"), F.lit(","), F.col("pb"),
        F.lit(")"),
    )
    return j.select(label.alias("path"), "time", v.alias("value"))


def changed(series: DataFrame) -> DataFrame:
    """Graphite ``changed``: 1 where the value differs from the
    previous point of the same series, else 0 (first point -> 0)."""
    prev = F.lag("value").over(_w())
    v = F.when(
        prev.isNotNull() & (F.col("value") != prev), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    return series.select("path", "time", v.alias("value"))


def exclude(series: DataFrame, pattern: str) -> DataFrame:
    """Graphite ``exclude``: drop series whose path matches the regex."""
    return series.filter(~F.col("path").rlike(pattern))


def grep(series: DataFrame, pattern: str) -> DataFrame:
    """Graphite ``grep``: keep only series whose path matches."""
    return series.filter(F.col("path").rlike(pattern))


def _node_item(segs, n: int):
    """One 0-based path segment; negative indices count from the end
    (functions.rst aliasByNode: 'takes one or more node positions...
    negative numbers count backwards'). element_at is 1-based and
    handles the negative form natively."""
    n = int(n)
    return F.element_at(segs, n + 1 if n >= 0 else n)


def alias_by_node(series: DataFrame, *nodes: int) -> DataFrame:
    """Graphite ``aliasByNode``: rename each series to the selected
    dot-segments of its path (0-based; negatives from the end)."""
    segs = F.split(F.col("path"), r"\.")
    new_path = F.concat_ws(".", *[_node_item(segs, n) for n in nodes])
    return series.select(
        new_path.alias("path"), "time", "value"
    )


def _graphite_percentile(sorted_arr, n: float):
    """graphite-web 1.1 ``_getPercentile(points, n)`` with its
    default ``interpolate=False`` (r12): RANK-based, not Spark's
    interpolated ``percentile`` — ``fractionalRank = n/100 * (k+1)``,
    ``rank = int(fr) + ceil(frac)``, clamped into the sorted array
    (rank 0 -> first element, rank k+1 -> last). The whole render
    percentile family (nPercentile, percentileOfSeries,
    removeAbove/Below/BetweenPercentile, averageOutsidePercentile)
    routes through upstream's single helper, so this one expression
    keeps them all in lock-step. ``sorted_arr`` must be an ascending
    non-null array column; OOB-safe via 0-based ``get`` (empty array
    -> NULL, never an ANSI error)."""
    k = F.size(sorted_arr)
    fr = F.lit(float(n) / 100.0) * (k + F.lit(1)).cast("double")
    rank = F.floor(fr).cast("int")
    rank = rank + F.when(fr > rank.cast("double"), F.lit(1)).otherwise(
        F.lit(0)
    )
    idx = F.greatest(F.lit(1), F.least(rank, k))  # 1-based, clamped
    return F.get(sorted_arr, idx - F.lit(1))


def _graphite_percentile_interp(sorted_arr, n: float):
    """graphite-web 1.1 ``_getPercentile(points, n,
    interpolate=True)``: rank = int(fr) without the ceil bump, base =
    sorted[rank-1] (rank 0 -> first), then linear interpolation
    toward sorted[rank] by the fractional rank (skipped at the top
    edge, upstream's ``rank != len(sortedPoints)`` guard). NOTE this
    is upstream's own formula, not Spark's percentile() — the two
    disagree on interior points (type-6 vs type-7 quantiles)."""
    k = F.size(sorted_arr)
    fr = F.lit(float(n) / 100.0) * (k + F.lit(1)).cast("double")
    rank = F.floor(fr).cast("int")
    frac = fr - rank.cast("double")
    base = (
        F.when(rank <= 0, F.get(sorted_arr, 0))
        .when(rank - 1 >= k, F.get(sorted_arr, k - 1))
        .otherwise(F.get(sorted_arr, rank - 1))
    )
    nxt = F.get(sorted_arr, F.least(rank, k - 1))
    return F.when(
        (rank < k) & nxt.isNotNull(), base + frac * (nxt - base)
    ).otherwise(base)


def _sorted_values_over(partition_cols: Sequence[str]):
    """Ascending non-null value array per partition — the
    ``sorted(filter(None, points))`` graphite feeds _getPercentile.
    Window-scoped collect: bounded by the fetched render window per
    series / by series count per timestamp, same materialization the
    previous percentile() aggregate did internally."""
    w = Window.partitionBy(*partition_cols)
    return F.sort_array(F.collect_list("value").over(w))


def n_percentile(series: DataFrame, n: float) -> DataFrame:
    """Graphite ``nPercentile``: each series flattened to its n-th
    percentile — one row per (path, time) carrying the per-series
    constant. Uses upstream's rank-based :func:`_graphite_percentile`
    (r12; the interpolated form differed on even-count series)."""
    # aggregate-over-window: one shuffle on path, no broadcast (the
    # per-path stat table can be huge — millions of series)
    pv = _graphite_percentile(_sorted_values_over(["path"]), n)
    return series.select("path", "time", pv.alias("value"))


def linear_regression(series: DataFrame) -> DataFrame:
    """Graphite ``linearRegression``: per-series least-squares fit;
    returns one row per path with slope (per second) and intercept at
    the series' first timestamp.

    Times are re-based to min(time) per path so every moment sum stays
    integer-exact in BIGINT; the only floating ops are the final
    divisions (identical structure on the oracle side).
    """
    w = Window.partitionBy("path")
    t = (F.col("time") - F.min("time").over(w)).alias("t")
    y = F.round(F.col("value") * 100).cast("long").alias("y2")
    base = series.select("path", t, y)
    agg = base.groupBy("path").agg(
        F.count("*").alias("n"),
        F.sum("t").alias("st"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
        F.sum("y2").alias("sy"),
        F.sum(F.col("t") * F.col("y2")).alias("sty"),
    )
    num = (F.col("n") * F.col("sty") - F.col("st") * F.col("sy")).cast("double")
    den = (
        (F.col("n") * F.col("stt") - F.col("st") * F.col("st")) * 100
    ).cast("double")
    slope = F.when(den != 0, num / den)
    mean_y = F.col("sy").cast("double") / (F.col("n") * 100).cast("double")
    mean_t = F.col("st").cast("double") / F.col("n").cast("double")
    intercept = mean_y - slope * mean_t
    return agg.select(
        "path", slope.alias("slope"), intercept.alias("intercept")
    )


def transform_null(series: DataFrame, default: float = 0.0) -> DataFrame:
    """Graphite ``transformNull``: replace NULL values with a default."""
    return series.select(
        "path", "time", F.coalesce(F.col("value"), F.lit(default)).alias("value")
    )


def is_non_null(series: DataFrame) -> DataFrame:
    """Graphite ``isNonNull``: 1 where the point has a value, else 0."""
    v = F.when(F.col("value").isNotNull(), F.lit(1.0)).otherwise(F.lit(0.0))
    return series.select("path", "time", v.alias("value"))


def count_series(series: DataFrame) -> DataFrame:
    """Graphite ``countSeries``: number of series present per
    timestamp, as one output series."""
    return (
        series.groupBy("time")
        .agg(F.count("path").cast("double").alias("value"))
        .select(F.lit("countSeries").alias("path"), "time", "value")
    )


def range_of_series(series: DataFrame) -> DataFrame:
    """Graphite ``rangeOfSeries``: max - min across series per
    timestamp."""
    return (
        series.groupBy("time")
        .agg((F.max("value") - F.min("value")).alias("value"))
        .select(F.lit("rangeOfSeries").alias("path"), "time", "value")
    )


def multiply_series(series: DataFrame) -> DataFrame:
    """Graphite ``multiplySeries``: product across series per
    timestamp (native ``product`` aggregate — no log/exp detour, so
    zeros and negatives are exact)."""
    return (
        series.groupBy("time")
        .agg(F.product("value").alias("value"))
        .select(F.lit("multiplySeries").alias("path"), "time", "value")
    )


def delay(series: DataFrame, steps: int = 1) -> DataFrame:
    """Graphite ``delay``: shift each series' values ``steps`` points
    later (leading points -> NULL). Negative steps lead."""
    return series.select(
        "path", "time", F.lag("value", steps).over(_w()).alias("value")
    )


def time_slice(series: DataFrame, start: int, end: int) -> DataFrame:
    """Graphite ``timeSlice``: keep points with start <= time <= end."""
    return series.filter((F.col("time") >= start) & (F.col("time") <= end))


def moving(
    series: DataFrame,
    func: str = "median",
    points: int = 5,
    window_s: int | None = None,
    exclusive: bool = False,
    xff: float | None = None,
) -> DataFrame:
    """Graphite ``movingMedian / movingMin / movingMax / movingSum``:
    window of the last ``points`` values per series, or of the
    trailing ``window_s`` seconds for the quoted-interval form
    (``movingMedian(s, '5min')``). ``exclusive=True`` is the
    graphite-web 1.1 movingWindow contract (preceding points only,
    current point excluded — see :func:`moving_average`); the facade
    uses it with a preview fetch. ``movingAverage`` has its own
    entry point (kept for parity)."""
    if window_s is not None:
        w = (
            _w().rangeBetween(-window_s, -1)
            if exclusive
            else _w().rangeBetween(-(window_s - 1), 0)
        )
    else:
        w = (
            _w().rowsBetween(-points, -1)
            if exclusive
            else _w().rowsBetween(-(points - 1), 0)
        )
    if func == "median":
        v = F.expr("percentile(value, 0.5)").over(w)  # exact median
    elif func == "min":
        v = F.min("value").over(w)
    elif func == "max":
        v = F.max("value").over(w)
    elif func == "sum":
        v = F.sum("value").over(w)
    else:
        raise ValueError(f"unsupported func {func}")
    if xff is not None:
        n = F.count("value").over(w)
        rows = F.count(F.lit(1)).over(w)
        v = F.when(
            n.cast("double") >= F.lit(float(xff)) * rows, v
        )
    return series.select("path", "time", v.alias("value"))


def combine_with_wildcards(
    series: DataFrame, func: str = "sum", *positions: int
) -> DataFrame:
    """Graphite ``sumSeriesWithWildcards / averageSeriesWithWildcards``:
    aggregate series whose paths agree on every node EXCEPT the given
    positions (the wildcarded nodes are removed from the output name).
    Same single-shuffle shape as :func:`group_by_node`."""
    parts = F.split(F.col("path"), r"\.")
    kept = F.filter(parts, lambda _, i: ~i.isin(list(positions)))
    key = F.array_join(kept, ".")
    v = F.col("value").cast("decimal(32,6)")
    g = series.select(key.alias("path"), "time", F.col("value"), v.alias("dv")).groupBy(
        "path", "time"
    )
    if func == "sum":
        out = g.agg(F.sum("dv").cast("double").alias("value"))
    elif func == "avg":
        out = g.agg((F.sum("dv").cast("double") / F.count("value")).alias("value"))
    elif func == "max":
        out = g.agg(F.max("value").alias("value"))
    elif func == "min":
        out = g.agg(F.min("value").alias("value"))
    elif func == "multiply":
        # exact product via native aggregate on doubles (graphite
        # multiplies pointwise; decimal products overflow fast, so
        # this family stays IEEE like multiply_series)
        out = g.agg(F.product("value").alias("value"))
    else:
        raise ValueError(f"unsupported func {func}")
    return out


def integral_by_interval(series: DataFrame, interval_s: int) -> DataFrame:
    """Graphite ``integralByInterval``: running sum per series that
    resets at each interval boundary."""
    bucket = F.col("time") - (F.col("time") % interval_s)
    w = (
        Window.partitionBy("path", bucket.alias("b"))
        .orderBy("time")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return series.select(
        "path", "time", F.sum("value").over(w).alias("value")
    )


def sort_by_name(
    series: DataFrame, natural: bool = False, reverse: bool = False
) -> DataFrame:
    """Graphite ``sortByName(seriesList, natural=False,
    reverse=False)``: order output by series name (then time).
    ``natural`` is upstream's natural sort — digit runs compare
    numerically, so 'server2' precedes 'server10' (implemented by
    zero-padding each digit run to 12 places in the sort key);
    ``reverse`` flips the order. Ordering is presentation-level; the
    rows are unchanged."""
    if natural:
        parts = F.split(
            F.col("path"), r"(?<=\D)(?=\d)|(?<=\d)(?=\D)"
        )
        # digit runs become (3-digit length, digits) so arbitrary
        # magnitudes order numerically — a fixed-width lpad would
        # TRUNCATE runs past its width (the format_g lesson)
        key = F.array_join(
            F.transform(
                parts,
                lambda p: F.when(
                    p.rlike("^[0-9]+$"),
                    F.concat(F.lpad(F.length(p), 3, "0"), p),
                ).otherwise(p),
            ),
            "",
        )
    else:
        key = F.col("path")
    p = key.desc() if reverse else key.asc()
    return series.orderBy(p, F.col("time"))


def limit_series(series: DataFrame, n: int, func: str = "max") -> DataFrame:
    """Graphite ``limit`` (by stat, covers sortByMaxima+limit): keep
    the top-n series ranked by a per-series statistic — distributed
    top-k + broadcast semi-join, same scale shape as ``highest``."""
    return highest(series, n, func)


def linear_regression_series(series: DataFrame) -> DataFrame:
    """Graphite ``linearRegression`` as drawn: the per-series
    least-squares fitted line evaluated at every timestamp (the
    render-layer view of :func:`linear_regression`, which returns the
    slope/intercept table). Double moments over one per-path window —
    render output, not an oracle surface."""
    wp = Window.partitionBy("path")
    t = (F.col("time") - F.min("time").over(wp)).cast("double")
    y = F.col("value")
    n = F.count(y).over(wp).cast("double")
    st = F.sum(t).over(wp)
    stt = F.sum(t * t).over(wp)
    sy = F.sum(y).over(wp)
    sty = F.sum(t * y).over(wp)
    den = n * stt - st * st
    slope = F.when(den != 0, (n * sty - st * sy) / den).otherwise(F.lit(0.0))
    intercept = (sy - slope * st) / n
    return series.select(
        "path", "time", (slope * t + intercept).alias("value")
    )


def linear_regression_fit(series: DataFrame) -> DataFrame:
    """Per-path OLS coefficient table for
    ``linearRegression(series, startSourceAt, endSourceAt)`` — the
    fit runs over a SOURCE window and is then projected onto the
    request window, so the coefficients must come out as data:
    ``(path, anchor, slope, intercept)`` with t anchored at each
    path's earliest source point (same anchoring as
    :func:`linear_regression_series`). Series-cardinality output —
    broadcast-joinable back onto any fetch."""
    wp = Window.partitionBy("path")
    t = (F.col("time") - F.min("time").over(wp)).cast("double")
    y = F.col("value")
    n = F.count(y).over(wp).cast("double")
    st = F.sum(t).over(wp)
    stt = F.sum(t * t).over(wp)
    sy = F.sum(y).over(wp)
    sty = F.sum(t * y).over(wp)
    den = n * stt - st * st
    slope = F.when(den != 0, (n * sty - st * sy) / den).otherwise(
        F.lit(0.0)
    )
    intercept = (sy - slope * st) / n
    return series.select(
        "path",
        F.min("time").over(wp).alias("anchor"),
        slope.alias("slope"),
        intercept.alias("intercept"),
    ).distinct()


def average_outside_percentile(series: DataFrame, n: float) -> DataFrame:
    """Graphite ``averageOutsidePercentile``: keep the full series of
    paths whose average lies OUTSIDE the open (100-n, n) percentile
    band of all series averages — boundary averages are KEPT, matching
    graphite-web's ``not lo < avg < hi`` (n symmetrized above 50 like
    graphite-web). The stats table is series-cardinality — the band is
    two scalars, crossJoin-broadcast back."""
    n = max(float(n), 100.0 - float(n))
    stat = _per_series_stat(series, "avg")
    avgs = F.sort_array(F.collect_list("stat"))
    band = stat.agg(
        _graphite_percentile(avgs, 100.0 - n).alias("lo"),
        _graphite_percentile(avgs, n).alias("hi"),
    )
    winners = (
        stat.crossJoin(F.broadcast(band))
        .filter(
            (F.col("stat") <= F.col("lo")) | (F.col("stat") >= F.col("hi"))
        )
        .select("path")
    )
    return series.join(F.broadcast(winners), "path", "left_semi")


def remove_between_percentile(series: DataFrame, n: float) -> DataFrame:
    """Graphite ``removeBetweenPercentile``: keep series that have at
    least one point outside the OPEN per-timestamp (100-n, n)
    percentile band across series (boundary values count as outside,
    graphite's ``not lo < v < hi``). Band per timestamp via a
    time-partitioned window; the qualifying path set semi-joins
    back."""
    n = max(float(n), 100.0 - float(n))
    arr = _sorted_values_over(["time"])
    lo = _graphite_percentile(arr, 100.0 - n)
    hi = _graphite_percentile(arr, n)
    outside = series.select(
        "path",
        ((F.col("value") <= lo) | (F.col("value") >= hi)).alias("out"),
    )
    winners = (
        outside.groupBy("path")
        .agg(F.max("out").alias("any_out"))
        .filter(F.col("any_out"))
        .select("path")
    )
    return series.join(F.broadcast(winners), "path", "left_semi")


def cacti_style(series: DataFrame, units: str = "") -> DataFrame:
    """Graphite ``cactiStyle``: append " Current:<c> Max:<m> Min:<n>"
    to each series name (the Cacti legend convention). Stats via one
    per-path window; numbers formatted like graphite-web's %.2f."""
    wp = Window.partitionBy("path")
    cur = F.max_by("value", "time").over(wp)
    mx = F.max("value").over(wp)
    mn = F.min("value").over(wp)
    u = f" {units}" if units else ""
    fmt = lambda c: F.coalesce(  # noqa: E731
        F.format_string("%.2f", c), F.lit("nan")
    )
    label = F.concat(
        F.col("path"),
        F.lit(" Current:"), fmt(cur), F.lit(u),
        F.lit(" Max:"), fmt(mx), F.lit(u),
        F.lit(" Min:"), fmt(mn), F.lit(u),
    )
    return series.select(label.alias("path"), "time", "value")


def format_g(col) -> F.Column:
    """C/printf ``%g`` of a double as a string column, built from
    JVM-side expressions (Java's own ``%g`` never strips zeros or
    switches to plain notation, so ``format_string`` can't be used):
    6 significant digits, trailing zeros stripped, scientific
    ``e±XX`` when the decimal exponent is < -4 or >= 6. Graphite-web
    formats computed values into series names with ``%g``
    (``aggregateLine(%s, %g)``), so legend parity needs the exact
    C rendering ('4.2', '123456', '1.23457e+07', '0.0001',
    '1e-05')."""
    x = col.cast("double")
    av0 = F.abs(x)
    # range-normalize the extremes first: 10^(exp-5) underflows to 0
    # below ~1e-320 (ANSI divide-by-zero on subnormals) and the
    # significand division can overflow near DBL_MAX — shift by
    # 10^±300 into the safe band, then add the shift back into the
    # printed exponent
    exp_pre = F.floor(F.log10(av0)).cast("int")
    shift = (
        F.when(exp_pre < -290, F.lit(300))
        .when(exp_pre > 290, F.lit(-300))
        .otherwise(F.lit(0))
    )
    av = av0 * F.pow(F.lit(10.0), shift.cast("double"))
    exp0 = F.floor(F.log10(av)).cast("int")
    # 6-digit significand D in [100000, 1000000): round half-up at
    # the 6th significant digit, then carry a 1000000 overflow into
    # the exponent (999999.7 -> D=100000, exp 6 -> '1e+06')
    d_raw = F.round(av / F.pow(F.lit(10.0), (exp0 - 5).cast("double"))).cast(
        "long"
    )
    carry = d_raw >= 1000000
    digits = F.when(carry, F.lit(100000)).otherwise(d_raw)
    exp = F.when(carry, exp0 + 1).otherwise(exp0) - shift
    s_full = F.lpad(digits.cast("string"), 6, "0")
    s_trim = F.regexp_replace(s_full, "0+$", "")  # kept digits, >= 1
    # fixed notation, |v| >= 1 (exp 0..5): integer part is the first
    # exp+1 digits (zero-padded), fraction is the rest zero-stripped
    int_len = exp + 1
    int_part = F.rpad(F.substring(s_full, 1, 6), 6, "0").substr(
        F.lit(1), int_len
    )
    frac_part = F.when(
        F.length(s_trim) > int_len,
        F.concat(F.lit("."), s_trim.substr(int_len + 1, F.lit(6))),
    ).otherwise(F.lit(""))
    fixed_ge1 = F.concat(int_part, frac_part)
    # fixed notation, |v| < 1 (exp -4..-1): '0.' + leading zeros
    lead_zeros = F.substring(F.lit("000"), 1, -exp - 1)
    fixed_lt1 = F.concat(F.lit("0."), lead_zeros, s_trim)
    # scientific: 'M[.mmm]e±XX'
    mant = F.concat(
        s_trim.substr(1, 1),
        F.when(
            F.length(s_trim) > 1,
            F.concat(F.lit("."), s_trim.substr(2, 5)),
        ).otherwise(F.lit("")),
    )
    # at least 2 exponent digits, but never truncate 3-digit ones
    # (lpad cuts to its length: lpad('324', 2) would give '32')
    exp_digits = F.abs(exp).cast("string")
    exp_str = F.when(
        F.length(exp_digits) < 2, F.concat(F.lit("0"), exp_digits)
    ).otherwise(exp_digits)
    sci = F.concat(
        mant,
        F.lit("e"),
        F.when(exp < 0, F.lit("-")).otherwise(F.lit("+")),
        exp_str,
    )
    body = (
        F.when((exp >= 0) & (exp <= 5), fixed_ge1)
        .when((exp >= -4) & (exp < 0), fixed_lt1)
        .otherwise(sci)
    )
    return (
        F.when(x.isNull(), F.lit(None).cast("string"))
        .when(F.isnan(x), F.lit("nan"))
        .when(x == F.lit(float("inf")), F.lit("inf"))
        .when(x == F.lit(float("-inf")), F.lit("-inf"))
        .when((x == 0) & x.cast("string").startswith("-"), F.lit("-0"))
        .when(x == 0, F.lit("0"))
        .otherwise(
            F.concat(F.when(x < 0, F.lit("-")).otherwise(F.lit("")), body)
        )
    )


def aggregate_line(series: DataFrame, func: str = "avg") -> DataFrame:
    """Graphite ``aggregateLine``: a flat line per series at its
    ``func`` over the window. graphite-web 1.1 names the result with
    the computed VALUE, not the function — ``'aggregateLine(%s, %g)'
    % (series.name, value)`` (functions.py, 1.1.x), 'None' when the
    window is empty — so the legend shows the number the line sits
    at. One per-path window stat carried onto every timestamp."""
    wp = Window.partitionBy("path")
    v = F.col("value").cast("decimal(32,6)")
    if func in ("avg", "average"):
        stat = (F.sum(v).over(wp).cast("double") / F.count("value").over(wp))
    elif func == "max":
        stat = F.max("value").over(wp)
    elif func == "min":
        stat = F.min("value").over(wp)
    elif func in ("sum", "total"):
        stat = F.sum(v).over(wp).cast("double")
    elif func == "last":
        stat = F.max_by("value", "time").over(wp)
    else:
        raise ValueError(f"unsupported func {func!r}")
    stat = stat.cast("double")
    label = F.concat(
        F.lit("aggregateLine("),
        F.col("path"),
        F.lit(", "),
        F.coalesce(format_g(stat), F.lit("None")),
        F.lit(")"),
    )
    return series.select(label.alias("path"), "time", stat.alias("value"))


def weighted_average(
    avg_series: DataFrame, weight_series: DataFrame, *nodes: int
) -> DataFrame:
    """Graphite ``weightedAverage(seriesListAvg, seriesListWeight,
    *nodes)``: pair each average series with the weight series
    sharing the selected path nodes, then emit ONE series —
    sum over pairs of (avg * weight) / sum(weight) per timestamp
    (NULL when the weight sum is 0), named ``weightedAverage`` like
    graphite-web. Duplicate series on one key collapse to the
    lexically-largest path (graphite keys a dict per node-key; this
    makes the overwrite deterministic)."""
    segs = F.split(F.col("path"), r"\.")
    key = F.concat_ws(".", *[_node_item(segs, n) for n in nodes])

    def keyed(df, out):
        return (
            df.select(key.alias("k"), "time", "value", "path")
            .groupBy("k", "time")
            .agg(F.max_by("value", "path").alias(out))
        )

    j = keyed(avg_series, "va").join(keyed(weight_series, "vw"), ["k", "time"])
    out = j.groupBy("time").agg(
        F.sum(F.col("va") * F.col("vw")).alias("num"),
        F.sum("vw").alias("den"),
    )
    v = F.when(F.col("den") != 0, F.col("num") / F.col("den"))
    return out.select(
        F.lit("weightedAverage").alias("path"), "time", v.alias("value")
    )


def square_root(series: DataFrame) -> DataFrame:
    """Graphite ``squareRoot``: sqrt(value); negative -> NULL (gap)."""
    v = F.when(F.col("value") >= 0, F.sqrt("value"))
    return series.select("path", "time", v.alias("value"))


def pow_values(series: DataFrame, factor: float) -> DataFrame:
    """Graphite ``pow(series, factor)``: value ** factor. Non-integer
    exponents of negative values -> NULL (IEEE NaN mapped to a gap,
    what graphite-web draws)."""
    p = F.pow("value", F.lit(float(factor)))
    return series.select(
        "path", "time", F.when(~F.isnan(p), p).alias("value")
    )


def exp_values(series: DataFrame) -> DataFrame:
    """Graphite ``exp``: e ** value."""
    return series.select("path", "time", F.exp("value").alias("value"))


def sigmoid(series: DataFrame) -> DataFrame:
    """Graphite ``sigmoid``: 1 / (1 + exp(-value))."""
    v = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("value")))
    return series.select("path", "time", v.alias("value"))


def logit(series: DataFrame) -> DataFrame:
    """Graphite ``logit``: log(value / (1 - value)) — sigmoid's
    inverse. Values outside (0, 1) have no finite logit; graphite
    yields null there (log of a non-positive ratio), matched here
    with an explicit domain guard instead of ANSI-throwing ``log``."""
    ok = (F.col("value") > 0) & (F.col("value") < 1)
    v = F.when(ok, F.log(F.col("value") / (F.lit(1.0) - F.col("value"))))
    return series.select("path", "time", v.alias("value"))


def round_values(series: DataFrame, precision: int = 0) -> DataFrame:
    """Graphite ``round(series, precision)``: half-up rounding to
    ``precision`` decimal places (negative = tens, hundreds...)."""
    return series.select(
        "path", "time", F.round("value", int(precision)).alias("value")
    )


def min_max(series: DataFrame) -> DataFrame:
    """Graphite ``minMax``: normalize each series to [0, 1] by its own
    min/max over the window; a flat series maps to 0 (graphite's
    safeDiv on a zero range). One per-path window, no extra shuffle."""
    wp = Window.partitionBy("path")
    lo = F.min("value").over(wp)
    rng = F.max("value").over(wp) - lo
    v = F.when(rng != 0, (F.col("value") - lo) / rng).otherwise(
        F.when(F.col("value").isNotNull(), F.lit(0.0))
    )
    return series.select("path", "time", v.alias("value"))


def _step():
    """Per-point sampling step: time since the previous point of the
    same series; the first point borrows the step that follows it
    (graphite-web reads a fixed series.step from whisper metadata —
    parquet series carry no step, so it is derived per point)."""
    back = F.col("time") - F.lag("time").over(_w())
    fwd = F.lead("time").over(_w()) - F.col("time")
    return F.coalesce(back, fwd)


def scale_to_seconds(series: DataFrame, seconds: int) -> DataFrame:
    """Graphite ``scaleToSeconds(series, N)``: value * N / step —
    re-expresses a per-interval count as a per-N-seconds rate."""
    v = F.col("value") * F.lit(int(seconds)) / _step()
    return series.select("path", "time", v.alias("value"))


def hitcount(
    series: DataFrame, interval_s: int, anchor: int | None = None
) -> DataFrame:
    """Graphite ``hitcount(series, interval)``: sum of value * step
    per interval bucket — turns a rate back into a count of events per
    bucket (graphite-web's docs call this the function that is
    'unaffected by consolidation'). graphite-web anchors bucket
    boundaries at the request window's END (or at ``from`` with
    alignToFrom) — pass that time as ``anchor``; None = epoch grid."""
    if anchor is None:
        bucket = F.col("time") - (F.col("time") % F.lit(interval_s))
    else:
        bucket = F.col("time") - F.pmod(
            F.col("time") - F.lit(int(anchor)), F.lit(interval_s)
        )
    contrib = F.col("value") * _step()
    return (
        series.select("path", bucket.alias("time"), contrib.alias("c"))
        .groupBy("path", "time")
        .agg(F.sum("c").alias("value"))
    )


def smart_summarize(
    series: DataFrame, interval_s: int, func: str = "sum", origin: int = 0
) -> DataFrame:
    """Graphite ``smartSummarize``: like :func:`summarize` but buckets
    are aligned to the request's ``from`` time (``origin``) instead of
    the epoch grid."""
    shifted = series.select(
        "path", (F.col("time") - F.lit(origin)).alias("time"), "value"
    )
    out = summarize(shifted, interval_s, func)
    return out.select(
        "path", (F.col("time") + F.lit(origin)).alias("time"), "value"
    )


def lowest(series: DataFrame, n: int, func: str = "avg") -> DataFrame:
    """Graphite ``lowestAverage / lowestCurrent / lowestMax``: keep the
    full series of the bottom ``n`` paths ranked by ``func``. Same
    distributed top-k + broadcast semi-join shape as :func:`highest`;
    ``min`` ranks by the per-series minimum (lowestMin analog)."""
    stat = _per_series_stat(series, func)
    top = stat.orderBy(F.asc("stat"), F.asc("path")).limit(n).select("path")
    return series.join(F.broadcast(top), "path", "left_semi")


def maximum_below(series: DataFrame, n: float) -> DataFrame:
    return filter_series(series, "max", "<", n)


def minimum_above(series: DataFrame, n: float) -> DataFrame:
    return filter_series(series, "min", ">", n)


def sort_by_stat(
    series: DataFrame,
    func: str = "total",
    descending: bool = True,
    positive_max_only: bool = False,
) -> DataFrame:
    """Graphite ``sortByTotal / sortByMaxima / sortByMinima``:
    presentation ordering of whole series by a per-series statistic.
    The stat table is series-cardinality — broadcast back, then one
    output sort.

    ``positive_max_only`` is sortByMinima's extra filter —
    functions.rst: 'Sorts the list of metrics by the lowest
    value..., including only series that have a maximum value
    greater than 0' (r12: previously unfiltered). It is EXPLICIT,
    not inferred from func='min' ascending, because the generic
    ``sortBy(seriesList, 'min')`` must NOT filter."""
    stat = _per_series_stat(series, func)
    if positive_max_only:
        keep = (
            _per_series_stat(series, "max")
            .filter(F.col("stat") > 0)
            .select("path")
        )
        stat = stat.join(F.broadcast(keep), "path", "left_semi")
    joined = series.join(F.broadcast(stat), "path")
    key = F.col("stat").desc() if descending else F.col("stat").asc()
    return joined.orderBy(key, F.col("path"), F.col("time")).select(
        "path", "time", "value"
    )


def remove_above_percentile(series: DataFrame, n: float) -> DataFrame:
    """Graphite ``removeAbovePercentile``: per-series n-th percentile
    (upstream's rank-based :func:`_graphite_percentile`, r12); points
    above it -> NULL."""
    pv = _graphite_percentile(_sorted_values_over(["path"]), n)
    v = F.when(F.col("value") <= pv, F.col("value"))
    return series.select("path", "time", v.alias("value"))


def remove_below_percentile(series: DataFrame, n: float) -> DataFrame:
    pv = _graphite_percentile(_sorted_values_over(["path"]), n)
    v = F.when(F.col("value") >= pv, F.col("value"))
    return series.select("path", "time", v.alias("value"))


def percentile_of_series(
    series: DataFrame, n: float, interpolate: bool = False
) -> DataFrame:
    """Graphite ``percentileOfSeries(seriesList, n,
    interpolate=False)``: the n-th percentile ACROSS series per
    timestamp, as one output series — upstream's rank-based
    :func:`_graphite_percentile`, or its linear-interpolation form
    when the third arg is true (r12)."""
    arr = F.sort_array(F.collect_list("value"))
    pv = (
        _graphite_percentile_interp(arr, n)
        if interpolate
        else _graphite_percentile(arr, n)
    )
    return (
        series.groupBy("time")
        .agg(pv.alias("value"))
        .select(F.lit("percentileOfSeries").alias("path"), "time", "value")
    )


def stddev_series(series: DataFrame) -> DataFrame:
    """Graphite ``stddevSeries``: population stddev across series per
    timestamp."""
    return (
        series.groupBy("time")
        .agg(F.stddev_pop("value").alias("value"))
        .select(F.lit("stddevSeries").alias("path"), "time", "value")
    )


def substr_path(series: DataFrame, start: int = 0, stop: int = 0) -> DataFrame:
    """Graphite ``substr(series, start, stop)``: rename each series to
    the dot-segment slice [start, stop) of its path (stop=0 = to the
    end), graphite's 0-based node addressing."""
    start, stop = int(start), int(stop)
    segs = F.split(F.col("path"), r"\.")
    n = F.size(segs)
    lo = (n + F.lit(start)) if start < 0 else F.lit(start)
    if stop == 0:
        hi = n
    elif stop < 0:
        hi = n + F.lit(stop)
    else:
        hi = F.lit(stop)
    sliced = F.slice(segs, lo + 1, F.greatest(hi - lo, F.lit(0)))
    return series.select(
        F.array_join(sliced, ".").alias("path"), "time", "value"
    )


def alias_by_metric(series: DataFrame) -> DataFrame:
    """Graphite ``aliasByMetric``: rename to the last dot-segment."""
    seg = F.element_at(F.split(F.col("path"), r"\."), -1)
    return series.select(seg.alias("path"), "time", "value")


def unique(series: DataFrame) -> DataFrame:
    """Graphite ``unique``: drop duplicate series — here duplicate
    (path, time) rows after target unions; first value wins (rows are
    deterministic per series, so any-win is stable)."""
    return series.dropDuplicates(["path", "time"])


def interpolate(series: DataFrame, limit: int | None = None) -> DataFrame:
    """Graphite ``interpolate(series[, limit])``: linearly fill NULL
    gaps between two known points; gaps longer than ``limit`` points
    stay NULL, and leading/trailing NULLs are never filled.

    Window-only (no UDF): carry the previous known (value, time) with
    ``last(ignorenulls)`` over the preceding frame, the next known
    pair with ``first(ignorenulls)`` over the following frame, then
    one arithmetic fill per row."""
    w_prev = _w().rowsBetween(Window.unboundedPreceding, -1)
    w_next = _w().rowsBetween(1, Window.unboundedFollowing)
    known_t = F.when(F.col("value").isNotNull(), F.col("time"))
    pv = F.last("value", ignorenulls=True).over(w_prev)
    pt = F.last(known_t, ignorenulls=True).over(w_prev)
    nv = F.first("value", ignorenulls=True).over(w_next)
    nt = F.first(known_t, ignorenulls=True).over(w_next)
    fill = pv + (nv - pv) * (F.col("time") - pt) / (nt - pt)
    if limit is not None:
        # gap length = rows strictly between the bracketing known
        # points; same run-id trick as keep_last_value
        wrun = _w().rowsBetween(Window.unboundedPreceding, 0)
        run_id = F.count("value").over(wrun)
        s = series.withColumn("_run", run_id)
        gap_len = F.count("*").over(
            Window.partitionBy("path", "_run")
        ) - 1
        v = F.when(F.col("value").isNotNull(), F.col("value")).when(
            pv.isNotNull() & nv.isNotNull() & (gap_len <= limit), fill
        )
        return s.select("path", "time", v.alias("value"))
    v = F.when(F.col("value").isNotNull(), F.col("value")).when(
        pv.isNotNull() & nv.isNotNull(), fill
    )
    return series.select("path", "time", v.alias("value"))


#: graphite aggregate() vocabulary -> combine implementation
_AGG_FUNCS = ("sum", "avg", "max", "min", "median", "count", "range",
              "stddev", "multiply", "last")


def aggregate_series(
    series: DataFrame, func: str = "sum", xff: float | None = None
) -> DataFrame:
    """Graphite ``aggregate(seriesList, 'func', xFilesFactor=None)``
    — the modern generic form of the *Series combiners. Extends
    :func:`combine_series` with median / count / range / stddev /
    multiply / last / diff (elementwise across series per timestamp;
    'last' = the value of the lexically-last series present,
    deterministic). With ``xff``, a timestamp where fewer than that
    fraction of the list's series are present emits None (the
    upstream xFilesFactor contract); the series count is one
    broadcast scalar."""
    if xff is not None:
        out = aggregate_series(series, func)
        pres = series.groupBy("time").agg(
            F.count("value").alias("__n")
        )
        total = series.agg(F.countDistinct("path").alias("__t"))
        ok = F.col("__n").cast("double") >= (
            F.lit(float(xff)) * F.col("__t").cast("double")
        )
        return (
            out.join(pres, "time", "left")
            .crossJoin(F.broadcast(total))
            .select(
                "path", "time",
                F.when(ok, F.col("value")).alias("value"),
            )
        )
    name = {"average": "avg", "total": "sum", "rangeOf": "range",
            "prod": "multiply"}.get(func, func)
    if name in ("sum", "avg", "max", "min"):
        out = combine_series(series, name)
        return out.select(
            F.lit(f"{func}Series").alias("path"), "time", "value"
        )
    g = series.groupBy("time")
    if name == "median":
        out = g.agg(F.expr("percentile(value, 0.5)").alias("value"))
    elif name == "count":
        out = g.agg(F.count("value").cast("double").alias("value"))
    elif name == "range":
        out = g.agg((F.max("value") - F.min("value")).alias("value"))
    elif name == "stddev":
        out = g.agg(F.stddev_pop("value").alias("value"))
    elif name == "multiply":
        out = g.agg(F.product("value").alias("value"))
    elif name == "last":
        out = g.agg(F.max_by("value", "path").alias("value"))
    elif name == "diff":
        # graphite safeDiff: first present value (series order = path
        # order here, deterministic) minus the sum of the rest =
        # 2*first - total over non-null values
        nn_path = F.when(F.col("value").isNotNull(), F.col("path"))
        out = g.agg(
            (
                2 * F.min_by("value", nn_path).cast("double")
                - F.sum("value")
            ).alias("value")
        )
    else:
        raise ValueError(f"unsupported aggregate func {func!r}")
    return out.select(F.lit(f"{func}Series").alias("path"), "time", "value")


def group_by_nodes(
    series: DataFrame, func: str = "avg", *nodes: int
) -> DataFrame:
    """Graphite ``groupByNodes(seriesList, func, *nodes)``: aggregate
    series sharing the selected dot-segments (multi-node
    generalization of :func:`group_by_node`); same single-shuffle
    partial-aggregating groupBy."""
    segs = F.split(F.col("path"), r"\.")
    key = F.concat_ws(".", *[_node_item(segs, n) for n in nodes])
    return _group_agg(series, key, func)


def group_by_tags(series: DataFrame, func: str = "avg", *tags: str) -> DataFrame:
    """Graphite ``groupByTags(seriesList, func, *tags)``: aggregate
    series sharing the selected tag values, read from the canonical
    ``name?k=v&...`` path (``name`` selects the bare metric name)."""
    import re as _re

    name = F.split_part(F.col("path"), F.lit("?"), F.lit(1))
    qs = F.substring_index(F.col("path"), "?", -1)
    parts = [
        name if t in ("name", "__name__")
        else F.regexp_extract(qs, rf"(?:^|&){_re.escape(t)}=([^&]*)", 1)
        for t in tags
    ]
    return _group_agg(series, F.concat_ws(".", *parts), func)


def _group_agg(series: DataFrame, key, func: str) -> DataFrame:
    """Shared keyed cross-series aggregation for the groupBy* family:
    exact-decimal sums, double min/max, elementwise per timestamp."""
    name = {"average": "avg", "total": "sum"}.get(func, func)
    v = F.col("value").cast("decimal(32,6)")
    g = series.select(key.alias("path"), "time", F.col("value"), v.alias("dv")).groupBy(
        "path", "time"
    )
    if name == "sum":
        out = g.agg(F.sum("dv").cast("double").alias("value"))
    elif name == "avg":
        out = g.agg(
            (F.sum("dv").cast("double") / F.count("value")).alias("value")
        )
    elif name == "max":
        out = g.agg(F.max("value").alias("value"))
    elif name == "min":
        out = g.agg(F.min("value").alias("value"))
    elif name == "median":
        out = g.agg(F.expr("percentile(value, 0.5)").alias("value"))
    elif name == "count":
        out = g.agg(F.count("value").cast("double").alias("value"))
    else:
        raise ValueError(f"unsupported func {func!r}")
    return out.select("path", "time", "value")


def alias_by_tags(series: DataFrame, *tags: str) -> DataFrame:
    """Graphite ``aliasByTags``: rename each series to its tag values
    (joined by '.'), reading tags from the canonical
    ``name?k=v&...`` path. ``__name__`` selects the bare metric name.
    Pure column expressions."""
    import re

    name = F.split_part(F.col("path"), F.lit("?"), F.lit(1))
    qs = F.substring_index(F.col("path"), "?", -1)

    def tag_value(t: str):
        # graphite-web's doc example uses 'name' for the metric name
        # (aliasByTags(seriesByTag("name=cpu"), "server", "name"))
        if t in ("name", "__name__"):
            return name
        return F.regexp_extract(qs, rf"(?:^|&){re.escape(t)}=([^&]*)", 1)

    parts = [tag_value(t) for t in tags]
    label = F.concat_ws(".", *parts)
    return series.select(label.alias("path"), "time", "value")


def pow_series(series: DataFrame, order_col: str | None = None) -> DataFrame:
    """Graphite ``powSeries(*seriesLists)``: per timestamp, left-fold
    exponentiation over the values in ARGUMENT order — graphite folds
    in list order, so the facade tags each evaluated argument with
    its index and passes it as ``order_col`` (r12; within one glob
    argument, path order breaks ties — the fetch-order analog).
    Without ``order_col`` the fold runs in sorted-path order (the
    direct-library deterministic default). One groupBy(time) — the
    fold runs over the per-timestamp struct array, never a window."""
    head = [F.col(order_col)] if order_col else []
    vals = F.array_sort(
        F.collect_list(
            F.struct(*head, F.col("path"), F.col("value"))
        )
    )
    folded = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1)["value"].cast("double"),
        lambda acc, s: F.pow(acc, s["value"]),
    )
    return (
        series.groupBy("time")
        .agg(folded.alias("value"))
        .select(F.lit("powSeries").alias("path"), "time", "value")
    )


def remove_empty_series(
    series: DataFrame, xfiles_factor: float = 0.0
) -> DataFrame:
    """Graphite ``removeEmptySeries(seriesList[, xFilesFactor])``:
    drop series whose fraction of non-null points does not exceed the
    factor (factor 0 = drop only all-null series). The qualifying set
    is series-cardinality — broadcast semi-join, same shape as
    :func:`filter_series`."""
    xff = float(xfiles_factor)
    stat = series.groupBy("path").agg(
        (F.count("value") / F.count(F.lit(1))).alias("frac")
    )
    cond = (F.col("frac") > xff) if xff > 0 else (F.col("frac") > 0)
    winners = stat.filter(cond).select("path")
    return series.join(F.broadcast(winners), "path", "left_semi")


_LEGEND_STATS = {
    "avg": "avg", "average": "avg", "total": "sum", "sum": "sum",
    "min": "min", "max": "max", "last": "current", "current": "current",
}


def legend_value(series: DataFrame, *value_types: str) -> DataFrame:
    """Graphite ``legendValue(seriesList, *valueTypes)``: append
    ``(type: value)`` per requested statistic to each series name —
    the legend annotation graphite-web draws. Unknown types annotate
    as ``(type: None)``, matching graphite's safe_* fallbacks. Stats
    join back broadcast (series-cardinality)."""
    out = series
    for vt in value_types:
        key = _LEGEND_STATS.get(str(vt))
        if key is None:
            out = out.select(
                F.concat(
                    F.col("path"), F.lit(f" ({vt}: None)")
                ).alias("path"),
                "time", "value",
            )
            continue
        stat = _per_series_stat(out, key)
        out = (
            out.join(F.broadcast(stat), "path")
            .select(
                F.concat(
                    F.col("path"),
                    F.lit(f" ({vt}: "),
                    F.col("stat").cast("string"),
                    F.lit(")"),
                ).alias("path"),
                "time", "value",
            )
        )
    return out


_SORT_FUNCS = {
    "average": "avg", "avg": "avg", "total": "sum", "sum": "sum",
    "min": "min", "max": "max", "current": "current", "last": "current",
    "maximum": "max", "minimum": "min",
}


def sort_by(
    series: DataFrame, func: str = "average", reverse: bool = False
) -> DataFrame:
    """Graphite ``sortBy(seriesList, func='average', reverse=False)``:
    generic per-series-statistic ordering (ascending unless
    ``reverse``). Delegates to :func:`sort_by_stat`."""
    key = _SORT_FUNCS.get(str(func))
    if key is None:
        raise ValueError(f"unsupported sortBy func {func!r}")
    return sort_by_stat(series, key, descending=bool(reverse))


def aggregate_series_lists(
    a: DataFrame, b: DataFrame, func: str = "sum", label: str | None = None
) -> DataFrame:
    """Graphite ``aggregateSeriesLists(l1, l2, func)`` and its
    ``sumSeriesLists``/``diffSeriesLists``/``multiplySeriesLists``
    aliases: combine the i-th series of each list pointwise, pairing
    by sorted path order (graphite pairs positionally and errors on
    length mismatch). Same series-cardinality pairing + broadcast
    shape as :func:`divide_series_lists`."""
    name = {"average": "avg", "total": "sum"}.get(func, func)
    w = Window.orderBy("path")
    pa = (
        a.select("path").distinct()
        .select(F.col("path").alias("pa"), F.row_number().over(w).alias("pos"))
    )
    pb = (
        b.select("path").distinct()
        .select(F.col("path").alias("pb"), F.row_number().over(w).alias("pos"))
    )
    pairs = pa.join(pb, "pos").select("pa", "pb")
    left = a.join(F.broadcast(pairs), a["path"] == pairs["pa"]).select(
        "pa", "pb", "time", F.col("value").alias("va")
    )
    right = b.select(
        F.col("path").alias("pb"), "time", F.col("value").alias("vb")
    )
    j = left.join(right, ["pb", "time"], "left")
    va, vb = F.col("va"), F.col("vb")
    if name == "sum":
        v = va + F.coalesce(vb, F.lit(0.0))
    elif name == "diff":
        v = va - F.coalesce(vb, F.lit(0.0))
    elif name == "multiply":
        v = va * vb
    elif name == "avg":
        v = (va + vb) / 2
    elif name == "max":
        v = F.greatest(va, vb)
    elif name == "min":
        v = F.least(va, vb)
    elif name == "pow":
        v = F.pow(va, vb)
    else:
        raise ValueError(f"unsupported func {func!r}")
    fn_label = label or f"{func}Series"
    out_path = F.concat(
        F.lit(f"{fn_label}("), F.col("pa"), F.lit(","), F.col("pb"),
        F.lit(")"),
    )
    return j.select(out_path.alias("path"), "time", v.alias("value"))


def most_deviant(series: DataFrame, n: int) -> DataFrame:
    """Graphite ``mostDeviant(seriesList, n)``: keep the full series
    of the ``n`` paths with the highest population variance. Same
    distributed top-k + broadcast semi-join shape as :func:`highest`
    — the variance table is series-cardinality."""
    stat = series.groupBy("path").agg(
        F.coalesce(F.var_pop("value"), F.lit(0.0)).alias("stat")
    )
    top = stat.orderBy(F.desc("stat"), F.asc("path")).limit(int(n)).select(
        "path"
    )
    return series.join(F.broadcast(top), "path", "left_semi")
