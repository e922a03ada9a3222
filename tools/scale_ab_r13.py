"""Round-13 scale A/B harness (VERDICT r12 items #3/#5/#8): old
(pre-optimization) query shapes vs the shipped shapes, interleaved in
ONE Spark session, min AND median over order-swapped rounds — host
drift cancels in the alternation. Result rows are asserted identical
between the two forms on the first round of every pair.

Usage: python tools/scale_ab_r13.py [mult] [pair ...]
  mult=1 runs directly on $SPARK_GRAFT_SF_DIR (default sf0.1), no
  replica build; mult>=2 builds key-shifted replica tables under a
  temp dir exactly like tools/scale_ab_r12.py.
Pairs: rollup_all minhash entropy ngram_jaccard ccnet_bands
       prometheus template (default: rollup_all minhash entropy)
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    only = set(sys.argv[2:]) or {"rollup_all", "minhash", "entropy"}

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from carbon_clickhouse_spark.operators.rollup import (
        Retention,
        RollupRule,
        rollup,
    )
    from carbon_clickhouse_spark.session import get_spark

    spark = get_spark(app_name=f"scale-ab-r13-{mult}x")
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tmp = None
    if mult == 1:
        sf = src
    else:
        tmp = tempfile.mkdtemp(prefix=f"ccs_scale13_{mult}x_")
        sf = tmp
        reps = spark.range(mult).select(F.col("id").alias("__r"))
        ev = spark.read.parquet(f"{src}/events.parquet")
        ev.crossJoin(reps).select(
            (F.col("event_id") + F.col("__r") * 1_000_000_000).alias(
                "event_id"
            ),
            "ts", "user_id", "event_type", "value", "props",
        ).repartition(32).write.parquet(f"{sf}/events.parquet")
        docs = spark.read.parquet(f"{src}/documents.parquet")
        # EVEN doc_id shift (parity-preserving, the r12 convention)
        docs.crossJoin(reps).select(
            (F.col("doc_id") + F.col("__r") * 1_000_000).alias("doc_id"),
            *[c for c in docs.columns if c != "doc_id"],
        ).repartition(32).write.parquet(f"{sf}/documents.parquet")

    try:
        # ---- old shapes, reconstructed from the same operators ----
        def old_rollup(spark, sf_dir):
            # pre-r12: union of two independent rollup() passes
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

        def old_minhash(spark, sf_dir):
            # pre-r12: self-join on the RAW bucket lineage (Spark
            # plans each side independently -> shingle stage + md5
            # signature groupBy run twice)
            from carbon_clickhouse_spark.datapipe.dedup import (
                minhash_buckets,
            )

            docs = entry._fan(entry._t(spark, sf_dir, "documents"))
            buckets = minhash_buckets(docs)
            a, b = buckets.alias("a"), buckets.alias("b")
            return (
                a.join(b, ["band", "bucket"])
                .filter(F.col("a.doc_id") < F.col("b.doc_id"))
                .select(
                    F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                )
                .distinct()
            )

        def old_entropy(spark, sf_dir):
            # pre-r13: per-group total as a partition window (sorts
            # the whole distinct-value cell table)
            from carbon_clickhouse_spark.operators.ch_aggregates import (
                entropy_cells,
            )

            ev = entry._t(spark, sf_dir, "events")
            base = ev.select(
                "event_type", (F.col("user_id") % 16).alias("ub")
            )
            gcols = ["event_type"]
            per_v = entropy_cells(base, gcols, "ub")
            w_g = Window.partitionBy(*gcols)
            n = F.sum("__c").over(w_g)
            p = F.col("__c").cast("double") / n.cast("double")
            term = (-(p * F.log2(p))).cast("decimal(28,12)")
            agg = (
                per_v.select(*gcols, term.alias("__t"))
                .groupBy(*gcols)
                .agg(F.sum("__t").alias("__h"))
            )
            out = agg.select(
                *gcols, F.col("__h").cast("double").alias("entropy")
            )
            return out.select(
                "event_type", F.round("entropy", 6).alias("entropy")
            )

        def old_ngram(spark, sf_dir):
            # pre-r12: rsh + doc_sets NOT materialized — the function
            # body of ngram_jaccard_pairs with the localCheckpoints
            # removed (each branch re-plans its inputs)
            from carbon_clickhouse_spark.datapipe.dedup import (
                exploded_shingles,
            )

            docs = entry._t(spark, sf_dir, "documents")
            threshold, max_shingle_df = 0.5, 10
            sh = exploded_shingles(docs, "text", "doc_id", 3)
            doc_sets = sh.groupBy("doc_id").agg(
                F.collect_list("shingle").alias("shs"),
                F.count("*").cast("long").alias("n_sh"),
            )
            rare = (
                sh.groupBy("shingle")
                .agg(F.count("*").alias("df_"))
                .filter(
                    (F.col("df_") >= 2)
                    & (F.col("df_") <= max_shingle_df)
                )
                .select("shingle")
            )
            rsh = sh.join(rare, "shingle")
            cand = (
                rsh.alias("x")
                .join(rsh.alias("y"), "shingle")
                .filter(F.col("x.doc_id") < F.col("y.doc_id"))
                .select(
                    F.col("x.doc_id").alias("doc_a"),
                    F.col("y.doc_id").alias("doc_b"),
                )
                .distinct()
            )
            sa = doc_sets.select(
                F.col("doc_id").alias("doc_a"),
                F.col("shs").alias("shs_a"),
                F.col("n_sh").alias("n_a"),
            )
            sb = doc_sets.select(
                F.col("doc_id").alias("doc_b"),
                F.col("shs").alias("shs_b"),
                F.col("n_sh").alias("n_b"),
            )
            return (
                cand.join(sa, "doc_a")
                .join(sb, "doc_b")
                .withColumn(
                    "n_inter",
                    F.size(
                        F.array_intersect("shs_a", "shs_b")
                    ).cast("long"),
                )
                .select(
                    "doc_a",
                    "doc_b",
                    F.round(
                        F.col("n_inter").cast("double")
                        / (
                            F.col("n_a")
                            + F.col("n_b")
                            - F.col("n_inter")
                        ),
                        4,
                    ).alias("jaccard"),
                )
                .filter(F.col("jaccard") >= threshold)
            )

        def old_ccnet(spark, sf_dir):
            # pre-r12: the (doc_id, log_ppl) score table NOT
            # materialized — perplexity_buckets' eager percentile pass
            # and the banded output each re-ran the LM pipeline
            from carbon_clickhouse_spark.datapipe.lm import (
                perplexity_buckets,
            )

            base = entry.q_lm_perplexity(spark, sf_dir)
            return perplexity_buckets(base, ppl_col="log_ppl").select(
                "doc_id", "log_ppl", "band"
            )

        class _DetWrap:
            """Stand-in whose asNondeterministic() hands back a fresh
            DETERMINISTIC udf — reconstructs the pre-r12 duplicated-UDF
            plans without touching the shipped call sites."""

            def __init__(self, det_udf):
                self._u = det_udf

            def asNondeterministic(self):
                return self._u

        def old_prometheus(spark, sf_dir):
            from pyspark.sql import types as T

            from carbon_clickhouse_spark.sources import (
                prometheus as prom,
            )

            # since r13 the shipped UDF is nondeterministic at its
            # definition and the call site applies it directly —
            # patch in a fresh DETERMINISTIC copy for the old form
            det = F.pandas_udf(
                prom.prometheus_canonicalize_udf.func, T.StringType()
            )
            saved = prom.prometheus_canonicalize_udf
            prom.prometheus_canonicalize_udf = det
            try:
                return entry.q_prometheus_ingest(spark, sf_dir)
            finally:
                prom.prometheus_canonicalize_udf = saved

        def old_template(spark, sf_dir):
            from carbon_clickhouse_spark.sources import plain as pl

            real = pl.make_graphite_canonicalize_udf
            pl.make_graphite_canonicalize_udf = lambda cfg: _DetWrap(
                real(cfg)
            )
            try:
                return entry.q_template_tagging(spark, sf_dir)
            finally:
                pl.make_graphite_canonicalize_udf = real

        pairs = []
        if "rollup_all" in only:
            pairs.append(("rollup_all", old_rollup, entry.q_rollup_all))
        if "ccnet_bands" in only:
            pairs.append(("ccnet_bands", old_ccnet, entry.q_ccnet_bands))
        if "prometheus" in only:
            pairs.append(
                ("prometheus", old_prometheus, entry.q_prometheus_ingest)
            )
        if "template" in only:
            pairs.append(
                ("template", old_template, entry.q_template_tagging)
            )
        if "minhash" in only:
            pairs.append(
                ("minhash", old_minhash, entry.q_minhash_lsh_pairs)
            )
        if "entropy" in only:
            pairs.append(("entropy", old_entropy, entry.q_entropy))
        if "ngram_jaccard" in only:
            pairs.append(
                ("ngram_jaccard", old_ngram, entry.q_ngram_jaccard)
            )

        spark.read.parquet(f"{sf}/events.parquet").count()  # warm
        rounds = int(os.environ.get("SPARK_GRAFT_AB_ROUNDS", "6"))
        for name, old, new in pairs:
            # equality pin: both forms produce the same rows
            o_rows = sorted(map(tuple, old(spark, sf).collect()))
            n_rows = sorted(map(tuple, new(spark, sf).collect()))
            assert o_rows == n_rows, f"{name}: old/new rows differ"
            res = {"old": [], "new": []}
            for r in range(rounds):
                order = (
                    (("old", old), ("new", new))
                    if r % 2 == 0
                    else (("new", new), ("old", old))
                )
                for tag, fn in order:
                    t0 = time.perf_counter()
                    fn(spark, sf).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    res[tag].append(round(time.perf_counter() - t0, 3))
            o_min, n_min = min(res["old"]), min(res["new"])
            o_med = statistics.median(res["old"])
            n_med = statistics.median(res["new"])
            print(
                f"{name:14s} {mult}x rows={len(n_rows)}: "
                f"old min {o_min:.3f}/med {o_med:.3f}  "
                f"new min {n_min:.3f}/med {n_med:.3f}  "
                f"ratio min {n_min / o_min:.2f}/med {n_med / o_med:.2f}",
                flush=True,
            )
            print(f"  old{res['old']} new{res['new']}", flush=True)
    finally:
        if tmp:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
