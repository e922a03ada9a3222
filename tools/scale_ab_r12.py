"""Runnable record of OPTIMIZATION_r12.md's 10x/100x scale evidence:
old (pre-r12) query shapes vs the shipped shapes, interleaved in ONE
Spark session over key-shifted replicas of the sf0.1 tables, min of
steady runs — host drift cancels in the alternation.

Usage: python tools/scale_ab_r12.py [10|100]   (default 10)
Builds the replica tables under a temp dir, prints one ratio line per
shape, cleans up. The "old" shapes are reconstructed inline from the
same library operators the pre-r12 queries composed, so the comparison
is shape-vs-shape, not commit-vs-commit.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from carbon_clickhouse_spark.operators.ch_aggregates import (
        _ns_join,
        arg_extrema,
        avg_weighted,
        bounding_ratio,
        contingency_cells,
        group_uniq_array,
        quantile_exact_weighted,
        two_sample_base,
        two_sample_moment_aggs,
        two_sample_rank_finals,
        two_sample_t_finals,
        two_sample_value_cells,
    )
    from carbon_clickhouse_spark.operators.rollup import (
        Retention,
        RollupRule,
        rollup,
    )
    from carbon_clickhouse_spark.session import get_spark

    spark = get_spark(app_name=f"scale-ab-{mult}x")
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = tempfile.mkdtemp(prefix=f"ccs_scale_{mult}x_")
    try:
        reps = spark.range(mult).select(F.col("id").alias("__r"))
        ev = spark.read.parquet(f"{src}/events.parquet")
        ev.crossJoin(reps).select(
            (F.col("event_id") + F.col("__r") * 1_000_000_000).alias(
                "event_id"
            ),
            "ts", "user_id", "event_type", "value", "props",
        ).repartition(32).write.parquet(f"{sf}/events.parquet")
        li = spark.read.parquet(f"{src}/lineitem.parquet")
        li.crossJoin(reps).select(
            (F.col("l_orderkey") + F.col("__r") * 100_000_000).alias(
                "l_orderkey"
            ),
            *[c for c in li.columns if c != "l_orderkey"],
        ).repartition(32).write.parquet(f"{sf}/lineitem.parquet")
        o = spark.read.parquet(f"{src}/orders.parquet")
        o.crossJoin(reps).select(
            (F.col("o_orderkey") + F.col("__r") * 100_000_000).alias(
                "o_orderkey"
            ),
            *[c for c in o.columns if c != "o_orderkey"],
        ).repartition(16).write.parquet(f"{sf}/orders.parquet")
        spark.read.parquet(f"{src}/customer.parquet").write.parquet(
            f"{sf}/customer.parquet"
        )
        docs = spark.read.parquet(f"{src}/documents.parquet")
        # EVEN key shift so the replica keeps each doc's parity (the
        # incremental_dedup query splits new/ref corpora on doc_id%2)
        docs.crossJoin(reps).select(
            (F.col("doc_id") + F.col("__r") * 1_000_000).alias("doc_id"),
            *[c for c in docs.columns if c != "doc_id"],
        ).repartition(32).write.parquet(f"{sf}/documents.parquet")

        def old_two_sample(spark, sf_dir):
            ev = entry._t(spark, sf_dir, "events")
            base_in = ev.select(
                "event_type", "value", (F.col("user_id") % 2).alias("s")
            )
            gcols = ["event_type"]
            base = two_sample_base(base_in, gcols, "value", "s", 1000)
            mom = base.groupBy(*gcols).agg(*two_sample_moment_aggs())
            stats = mom.select(*gcols, *two_sample_t_finals())
            per_v = two_sample_value_cells(base, gcols)
            mw = two_sample_rank_finals(per_v, gcols)
            return _ns_join(stats, mw, gcols)

        def old_contingency(spark, sf_dir):
            ev = entry._t(spark, sf_dir, "events")
            base = ev.select(
                F.date_format("ts", "yyyy-MM-dd").alias("day"),
                "event_type",
                (F.col("user_id") % 8).alias("ub"),
            )
            gcols = ["day"]
            cells = contingency_cells(base, gcols, "event_type", "ub")
            w_r = Window.partitionBy(*gcols, "__x")
            w_c = Window.partitionBy(*gcols, "__y")
            w_g = Window.partitionBy(*gcols)
            with_m = cells.select(
                *gcols, "__x", "__y", "__o",
                F.sum("__o").over(w_r).alias("__rm"),
                F.sum("__o").over(w_c).alias("__cm"),
                F.sum("__o").over(w_g).alias("__n"),
            )
            e = (
                F.col("__rm").cast("decimal(38,0)") * F.col("__cm")
            ).cast("double") / F.col("__n").cast("double")
            ob = F.col("__o").cast("double")
            term = (ob - e) * (ob - e) / e - e
            per_cell = with_m.select(
                *gcols,
                F.struct(
                    F.col("__x").cast("string").alias("x"),
                    F.col("__y").cast("string").alias("y"),
                    term.alias("t"),
                ).alias("__cell"),
                F.col("__n"), "__x", "__y",
            )
            agg = per_cell.groupBy(*gcols).agg(
                F.aggregate(
                    F.array_sort(F.collect_list("__cell")),
                    F.lit(0.0),
                    lambda acc, s: acc + s["t"],
                ).alias("__tsum"),
                F.max("__n").alias("__nn"),
                F.count_distinct("__x").alias("__rx"),
                F.count_distinct("__y").alias("__ry"),
            )
            n = F.col("__nn").cast("double")
            chi2 = F.col("__tsum") + n
            return agg.select(*gcols, chi2.alias("chi_sq"))

        def old_breadth(spark, sf_dir):
            ev = entry._t(spark, sf_dir, "events")
            base = ev.select(
                "event_type", "value",
                ((F.col("event_id") % 7) + 1).alias("w"),
                "user_id", entry._sec(ev).alias("t"),
            )
            ext = arg_extrema(
                base, ["event_type"], "value", "user_id"
            ).select(
                "event_type",
                F.col("arg_min").alias("arg_min_user"),
                F.col("arg_max").alias("arg_max_user"),
            )
            avw = avg_weighted(base, ["event_type"], "value", "w")
            med = quantile_exact_weighted(
                base, ["event_type"], "value", "w", 0.5, out_col="wmedian"
            )
            uniq = group_uniq_array(
                base.withColumn("ub", F.col("user_id") % 10),
                ["event_type"], "ub", out_col="user_buckets",
            )
            br = bounding_ratio(base, ["event_type"], "t", "value")

            def nsj(a, b):
                bb = b.withColumnRenamed("event_type", "__r")
                return a.join(
                    bb, a["event_type"].eqNullSafe(bb["__r"]), "left"
                ).drop("__r")

            return nsj(nsj(nsj(nsj(ext, avw), med), uniq), br)

        def old_rollup(spark, sf_dir):
            pts = entry._events_points(spark, sf_dir)
            fn_rules = (
                RollupRule(r"\.click$", "sum"),
                RollupRule(r"\.error$", "max"),
                RollupRule(r"\.purchase$", "min"),
                RollupRule("", "avg"),
            )
            hourly = rollup(
                pts, fn_rules, precision_s=3600,
                exact_decimal=True, round_avg_to=4,
            )
            ret_rules = (
                RollupRule(
                    "", "avg",
                    (Retention(0, 3600), Retention(7 * 86400, 86400)),
                ),
            )
            retention = rollup(
                pts, ret_rules, now=1706745600,
                exact_decimal=True, round_avg_to=4,
            )
            lab = lambda tag, df: df.select(  # noqa: E731
                F.lit(tag).alias("rule_set"), "path", "time",
                F.round("value", 4).alias("value"),
            )
            return lab("hourly", hourly).unionByName(
                lab("retention", retention)
            )

        def old_top_rev(spark, sf_dir):
            cust = entry._t(spark, sf_dir, "customer")
            orders = entry._t(spark, sf_dir, "orders")
            li = entry._t(spark, sf_dir, "lineitem")
            rev = (
                F.col("l_extendedprice").cast("decimal(14,2)")
                * (
                    F.lit(1).cast("decimal(3,2)")
                    - F.col("l_discount").cast("decimal(3,2)")
                )
            ).cast("decimal(24,8)")
            li_rev = li.groupBy("l_orderkey").agg(
                F.sum(rev).cast("double").alias("revenue")
            )
            joined = (
                li_rev.join(orders, F.col("l_orderkey") == orders.o_orderkey)
                .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
                .select("o_orderkey", "o_orderdate", "c_name", "revenue")
            )
            return (
                joined.select(
                    "o_orderkey",
                    F.to_date("o_orderdate").alias("o_orderdate"),
                    "c_name",
                    F.round("revenue", 4).alias("revenue"),
                )
                .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
                .limit(10)
            )

        def old_incremental_dedup(spark, sf_dir):
            # the pre-batch-5 two-call form: minhash_buckets planned
            # (scan + shingle stage + sig-agg) once PER SIDE
            from carbon_clickhouse_spark.datapipe.dedup import (
                dedup_against_reference,
            )

            d = entry._fan(entry._t(spark, sf_dir, "documents"))
            return dedup_against_reference(
                d.filter(F.col("doc_id") % 2 == 1),
                d.filter(F.col("doc_id") % 2 == 0),
            )

        def old_find_metrics(spark, sf_dir):
            # the pre-batch-5 form: the index build re-planned per
            # union branch (the globs cannot prune it)
            from carbon_clickhouse_spark.operators.index import build_index
            from carbon_clickhouse_spark.query.finder import (
                find_metrics,
                find_metrics_reverse,
            )

            idx = build_index(entry._events_points(spark, sf_dir))
            direct = find_metrics(idx, "ev.u1*.click").select(
                F.lit("direct").alias("dir"), "path"
            )
            rev = find_metrics_reverse(idx, "*.*.click").select(
                F.lit("reverse").alias("dir"), "path"
            )
            return direct.unionByName(rev)

        pairs = [
            ("two_sample", old_two_sample, entry.q_two_sample_tests),
            ("contingency", old_contingency, entry.q_contingency_stats),
            ("ch_agg_breadth", old_breadth, entry.q_ch_agg_breadth),
            ("rollup_all", old_rollup, entry.q_rollup_all),
            ("top_revenue", old_top_rev, entry.q_top_revenue_orders),
            ("incr_dedup", old_incremental_dedup, entry.q_incremental_dedup),
            ("find_metrics", old_find_metrics, entry.q_find_metrics_all),
        ]
        only = set(sys.argv[2:])
        if only:
            pairs = [p for p in pairs if p[0] in only]
        spark.read.parquet(f"{sf}/events.parquet").count()  # warm
        for name, old, new in pairs:
            res = {"old": [], "new": []}
            for _ in range(5):
                for tag, fn in (("old", old), ("new", new)):
                    t0 = time.perf_counter()
                    fn(spark, sf).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    res[tag].append(round(time.perf_counter() - t0, 2))
            o = min(res["old"][1:])
            n2 = min(res["new"][1:])
            print(
                f"{name:16s} {mult}x: old {o:6.2f}s new {n2:6.2f}s "
                f"ratio {n2 / o:.2f}  old{res['old']} new{res['new']}",
                flush=True,
            )
    finally:
        shutil.rmtree(sf, ignore_errors=True)


if __name__ == "__main__":
    main()
