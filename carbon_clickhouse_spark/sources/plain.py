"""Plain Graphite line protocol -> points DataFrame (S1/S2 + P1-P4).

Parser parity with ``receiver/plain.go:53-96`` (PlainParseLine):

- split on the FIRST two spaces: ``<name> <value> <timestamp>``
- value: float; NaN or unparsable -> drop the line
- timestamp: float -> truncate to int seconds; the literal ``-1``
  means "receive time"; unparsable/NaN -> drop
- trailing ``\\r\\n`` stripped; empty lines skipped
- name: collapse double dots (P2), then Graphite tag canonicalize
  (P3/P4); canonicalization errors drop the line

Execution: everything except tag canonicalization is JVM-side column
expressions in one whole-stage-codegen span. The pandas UDF runs only
on lines that actually carry tags (``;`` present) or hit a template
config — at 100 TB the overwhelmingly common untagged case never leaves
the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.dates import ts_to_date
from ..functions.paths import normalize_double_dot
from ..functions.tags import TagConfig
from ..functions.tags_jvm import graphite_canonicalize_col, graphite_invalid_col
from ..functions.udfs import make_graphite_canonicalize_udf


def parse_plain_lines(
    lines: DataFrame,
    line_col: str = "line",
    now: Column | int | None = None,
    tag_config: TagConfig | None = None,
    zero_version: bool = True,
    dedup_names: bool = False,
) -> DataFrame:
    """Parse raw protocol lines into the canonical points schema.

    ``now`` is the receive time (defaults to current time); it fills
    ``-1`` timestamps and the ``version`` column (0 when
    ``zero_version``, mirroring the e2e configs' ``zero-timestamp``).

    ``dedup_names``: canonicalize DISTINCT metric names and join the
    mapping back instead of evaluating the canonicalize expression per
    line. Wins when names repeat heavily within the batch (bulk
    backfills, replays); per-line stays the default because a live
    micro-batch sees each series ~once and the join would only add a
    shuffle.
    """
    if now is None:
        now_col = F.unix_timestamp()
    elif isinstance(now, int):
        now_col = F.lit(now).cast("long")
    else:
        now_col = now.cast("long")

    # exact split on the first two spaces via split(limit=3): a third
    # space lands (with the remainder) in the ts field and fails the
    # float cast -> row dropped, same as the reference's byte-index
    # scan. One split pass measures ~30% faster than the equivalent
    # instr/substring chain at sf0.1 (this runs once per ingested
    # line). F.get is null on missing fields; a missing/empty field
    # fails its filter exactly like the empty substring did.
    arr = F.split(F.rtrim(F.col(line_col), F.lit("\r\n")), " ", 3)

    df = (
        lines.withColumn("__name_raw", F.get(arr, 0))
        .withColumn("__value_raw", F.get(arr, 1))
        .withColumn("__ts_raw", F.get(arr, 2))
        .filter(F.col("__name_raw").isNotNull() & (F.col("__name_raw") != ""))
        .withColumn("value", F.col("__value_raw").try_cast("double"))
        .filter(F.col("value").isNotNull() & ~F.isnan("value"))
        .withColumn("__tsd", F.col("__ts_raw").try_cast("double"))
        .filter(
            (F.col("__ts_raw") == "-1")
            | (F.col("__tsd").isNotNull() & ~F.isnan("__tsd"))
        )
        .withColumn(
            "time",
            F.when(F.col("__ts_raw") == "-1", now_col).otherwise(
                # try_cast: a finite-but-huge ts (1e20) would otherwise
                # throw CAST_OVERFLOW under ANSI mode and kill the whole
                # ingest job for one malformed line — drop the row,
                # like every other malformed field
                F.col("__tsd").try_cast("long")
            ),
        )
        .filter(F.col("time").isNotNull())
        .withColumn("__name_norm", normalize_double_dot(F.col("__name_raw")))
    )

    if tag_config is not None and tag_config.enabled:
        # templates may tag ANY name -> rows go through Python (P4).
        # asNondeterministic: the validity filter below references the
        # UDF column, and the optimizer's filter pushdown would
        # otherwise duplicate the (expensive, per-line) UDF — one
        # ArrowEvalPython below the filter plus one above (r12 plan
        # audit; optimization guide §4.4). Marking it non-deterministic
        # pins a single evaluation; rows are unchanged.
        canon = make_graphite_canonicalize_udf(tag_config).asNondeterministic()
        df = df.withColumn("path", canon(F.col("__name_norm")))
        df = df.filter(F.col("path").isNotNull() & (F.col("path") != ""))
    elif dedup_names:
        mapping = df.select("__name_norm").distinct().withColumn(
            "path", graphite_canonicalize_col(F.col("__name_norm"))
        )
        df = df.join(mapping, "__name_norm", "left")
        df = df.filter(F.col("path").isNotNull() & (F.col("path") != ""))
    else:
        # P3 runs fully JVM-side (tags_jvm parity expressions). Filter
        # FIRST on the cheap validity predicate so the (interpreted,
        # lambda-bearing) canonicalize expression is referenced exactly
        # once — filtering on its output inlines it into every
        # reference, tripling the per-line cost.
        df = df.filter(
            ~graphite_invalid_col(F.col("__name_norm"))
            & (F.col("__name_norm") != "")
        ).withColumn("path", graphite_canonicalize_col(F.col("__name_norm")))

    version = F.lit(0).cast("long") if zero_version else now_col
    return df.select(
        "path",
        "value",
        "time",
        ts_to_date("time").alias("date"),
        version.alias("version"),
    )
