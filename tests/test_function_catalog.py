"""Graphite-web 1.1 function-catalog completeness pin (r9 verdict
#6): the render facade claims the full graphite-web 1.1 vocabulary —
this test diffs the facade's registry (``_FUNCS`` + the evaluator's
explicit dispatch forms, exactly what ``/functions`` serves) against
the published function list, so a silently missing function becomes
a red test instead of a user report.

The pinned list is transcribed from the graphite-web 1.1.x
"Functions" documentation page (the public reference for
graphite.readthedocs.io / graphite-web/webapp/graphite/render/
functions.py's SeriesFunctions registry). Presentation-only
functions (color, lineWidth, ...) are part of the list — the facade
accepts them as data-identity so dashboards round-trip — hence the
NOT_APPLICABLE allowlist is currently EMPTY; it exists so a future
upstream addition with no headless meaning can be fenced explicitly
rather than silently dropped from the pin."""

from carbon_clickhouse_spark.query import api

#: graphite-web 1.1.x documented render-function vocabulary
GRAPHITE_WEB_1_1_FUNCTIONS = frozenset("""
absolute add aggregate aggregateLine aggregateSeriesLists
aggregateWithWildcards alias aliasByMetric aliasByNode aliasByTags
aliasQuery aliasSub alpha applyByNode areaBetween asPercent
averageAbove averageBelow averageOutsidePercentile averageSeries
averageSeriesWithWildcards cactiStyle changed color consolidateBy
constantLine countSeries cumulative currentAbove currentBelow dashed
delay derivative diffSeries diffSeriesLists divideSeries
divideSeriesLists drawAsInfinite events exclude exp
exponentialMovingAverage fallbackSeries filterSeries grep group
groupByNode groupByNodes groupByTags highest highestAverage
highestCurrent highestMax hitcount holtWintersAberration
holtWintersConfidenceArea holtWintersConfidenceBands
holtWintersForecast identity integral integralByInterval interpolate
invert isNonNull keepLastValue legendValue limit lineWidth
linearRegression logarithm logit lowest lowestAverage lowestCurrent
mapSeries maxSeries maximumAbove maximumBelow minMax minSeries
minimumAbove minimumBelow mostDeviant movingAverage movingMax
movingMedian movingMin movingSum movingWindow multiplySeries
multiplySeriesLists multiplySeriesWithWildcards nPercentile
nonNegativeDerivative offset offsetToZero percentileOfSeries
perSecond pow powSeries randomWalkFunction rangeOfSeries reduceSeries
removeAbovePercentile removeAboveValue removeBelowPercentile
removeBelowValue removeBetweenPercentile removeEmptySeries round
scale scaleToSeconds secondYAxis seriesByTag setXFilesFactor sigmoid
sinFunction smartSummarize sortBy sortByMaxima sortByMinima
sortByName sortByTotal squareRoot stacked stddevSeries stdev substr
sumSeries sumSeriesLists sumSeriesWithWildcards summarize threshold
timeFunction timeShift timeSlice timeStack transformNull unique
useSeriesAbove verticalLine weightedAverage xFilesFactor
""".split())

#: upstream names with no meaning in a headless data engine — none
#: today (presentation functions are accepted as identity instead)
NOT_APPLICABLE = frozenset()

#: facade names beyond the 1.1 documented list — each one is an
#: upstream short alias or a later-upstream addition, pinned exactly
#: so an accidental rename in the registry shows up here
KNOWN_EXTRAS = frozenset({
    "time",  # documented short alias of timeFunction
    "randomWalk",  # documented short alias of randomWalkFunction
    "roundFunction",  # upstream internal name for round()
    "clamp",  # graphite-web 1.1.8+ addition
    "lowestMax",  # sortBy-family sibling, later upstream addition
    "compressPeriodicGaps",  # graphite-web 1.1.8+ addition
})


def _facade_names() -> frozenset:
    return frozenset(set(api._FUNCS) | set(api._DISPATCH_FORMS))


def test_catalog_is_fully_covered():
    missing = GRAPHITE_WEB_1_1_FUNCTIONS - _facade_names() - NOT_APPLICABLE
    assert not missing, f"catalog functions not served: {sorted(missing)}"


def test_extras_are_pinned():
    extra = _facade_names() - GRAPHITE_WEB_1_1_FUNCTIONS
    assert extra == KNOWN_EXTRAS, (
        sorted(extra - KNOWN_EXTRAS),
        sorted(KNOWN_EXTRAS - extra),
    )


def test_function_index_serves_the_catalog():
    idx = api.function_index()
    assert GRAPHITE_WEB_1_1_FUNCTIONS - set(idx) == NOT_APPLICABLE == frozenset()
    assert len(idx) == len(_facade_names())


def test_catalog_count_sanity():
    # the 1.1 docs list ~143 functions; a pin mangled by a bad merge
    # (duplicated words collapse in a set) should fail loudly
    assert len(GRAPHITE_WEB_1_1_FUNCTIONS) == 143


def test_catalog_is_behavior_pinned():
    """r12: every catalog function appears in the SEMANTIC golden
    suite (tests/test_render_doc_goldens.py), not just the name
    registry — a future catalog addition without a doc-cited golden
    turns this red. A few functions are exercised through loops or
    f-strings rather than a literal call; they are allowlisted with
    the indirection that covers them."""
    import re

    src = open(
        "tests/test_render_doc_goldens.py", encoding="utf-8"
    ).read()
    #: covered via a loop or alias the regex can't see:
    #: highest* via the ("highestMax", ...) loop, the HW area leg
    #: via an f-string suffix, randomWalkFunction via its documented
    #: short alias randomWalk
    INDIRECT = {
        "highestAverage": 'for fn in ("highestMax"',
        "highestCurrent": 'for fn in ("highestMax"',
        "highestMax": 'for fn in ("highestMax"',
        "holtWintersConfidenceArea": "holtWintersConfidenceArea{kw}",
        "randomWalkFunction": "randomWalk('rw'",
    }
    missing = []
    for f in sorted(GRAPHITE_WEB_1_1_FUNCTIONS):
        if re.search(r"\b" + re.escape(f) + r"\(", src):
            continue
        probe = INDIRECT.get(f)
        if probe and probe in src:
            continue
        missing.append(f)
    assert not missing, f"catalog functions without a golden: {missing}"
