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

    # exact split on the first two spaces (the reference finds byte
    # indexes, so a third space lands in the ts field and fails the
    # float cast -> row dropped, same as Go). rtrim beats a regex here
    # — this runs once per ingested line.
    line = F.rtrim(F.col(line_col), F.lit("\r\n"))

    df = (
        lines.withColumn("__line", line)
        .withColumn("__i1", F.instr(F.col("__line"), " "))
        .withColumn(
            "__name_raw", F.expr("substring(__line, 1, __i1 - 1)")
        )
        .withColumn("__rest", F.expr("substring(__line, __i1 + 1)"))
        .withColumn("__i2", F.instr(F.col("__rest"), " "))
        .withColumn("__value_raw", F.expr("substring(__rest, 1, __i2 - 1)"))
        .withColumn("__ts_raw", F.expr("substring(__rest, __i2 + 1)"))
        .filter((F.col("__i1") > 1) & (F.col("__i2") > 1))
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
                F.col("__tsd").cast("long")
            ),
        )
        .withColumn("__name_norm", normalize_double_dot(F.col("__name_raw")))
    )

    if tag_config is not None and tag_config.enabled:
        # templates may tag ANY name -> rows go through Python (P4)
        canon = make_graphite_canonicalize_udf(tag_config)
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
