"""End-to-end corpus preparation: the composed pipeline a user runs.

Each stage exists as a tested primitive (``text.py``, ``dedup.py``,
``contamination.py``, ``pack.py``); this module chains them in the
published pretraining-data order — quality/language gates, exact
dedup, MinHash near-dedup, benchmark decontamination, PII scrub —
and keeps an audit trail of every dropped doc_id with the stage that
dropped it (the F5 dropped-sample discipline applied to documents).

Scale shape: one Arrow-free feature pass, then each dedup stage
shuffles only 16-byte fingerprints / short band keys; the corpus
text itself is shuffled at most once (the exact-dedup window). The
audit table holds (doc_id, stage) longs+shorts — negligible next to
the corpus.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window, functions as F

from .contamination import benchmark_ngram_contamination, pii_scrub
from .dedup import fingerprint, minhash_lsh_pairs
from .text import language_id, quality_features


@dataclass
class CorpusPrepConfig:
    min_tokens: int | None = 20
    min_stopword_ratio: float | None = None
    languages: tuple[str, ...] = field(default_factory=tuple)
    #: apply the Gopher document-quality rules (text.gopher_rules)
    #: as an additional gate; thresholds override the paper defaults
    gopher: bool = False
    gopher_thresholds: dict = field(default_factory=dict)
    #: reference corpus for CCNet-style LM-perplexity banding
    #: (None = skip); documents in bands NOT listed are dropped
    lm_reference: DataFrame | None = None
    lm_keep_bands: tuple[str, ...] = ("head", "middle")
    lm_vocab_size: int = 50_000
    lm_max_bigrams: int = 1_000_000
    exact_dedup: bool = True
    near_dedup: bool = True
    minhash_hashes: int = 8
    minhash_band: int = 2
    shingle_k: int = 3
    #: skew guard for the LSH bucket self-join: buckets larger than
    #: this take star-to-keeper edges instead of all pairs (survivor
    #: semantics preserved, fan-out bounded). The pipeline default is
    #: ON — real corpora have boilerplate buckets.
    max_bucket_size: int | None = 10_000
    #: eval/benchmark set for decontamination (None = skip)
    benchmark: DataFrame | None = None
    max_contamination: float = 0.1
    contamination_n: int = 3
    scrub_pii: bool = True
    #: cut corpus-repeated substrings (Lee et al. ExactSubstr pass)
    #: AFTER doc-level dedup — rewrites text in place. The default
    #: substr_w=1 marks every duplicated k-gram, so the cut covers
    #: duplicated runs exactly; raise w to trade cut completeness for
    #: a ~(w+1)/2x sparser fingerprint shuffle (see substr.py).
    substring_dedup: bool = False
    substr_k: int = 10
    substr_w: int = 1
    substr_unit: str = "token"


def prepare_corpus(
    docs: DataFrame,
    cfg: CorpusPrepConfig | None = None,
    persisted_pool: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Run the full preparation chain over ``docs`` (doc_id, text,
    ...). Returns ``(kept, audit)``: ``kept`` carries the original
    columns plus quality/language features and scrub counts; ``audit``
    is one ``(doc_id, stage)`` row per dropped document, stages in
    {'quality', 'language', 'gopher', 'exact_dup', 'near_dup',
    'contaminated', 'perplexity'} — plus 'substr_cut' rows marking
    documents whose text was REWRITTEN (not dropped) by the optional
    substring-dedup pass.

    ``kept`` and ``audit`` fork from shared intermediates; writing
    both without caching re-executes the expensive stages (feature
    regexes, the fingerprint window, the LSH join) once per output.
    Pass a list as ``persisted_pool`` to persist each fork point
    (MEMORY_AND_DISK) — the caller unpersists the pooled frames after
    both writes."""
    cfg = cfg or CorpusPrepConfig()
    spark = docs.sparkSession
    audits: list[DataFrame] = []

    def hold(df: DataFrame) -> DataFrame:
        """Persist a frame both output branches will re-read."""
        if persisted_pool is None:
            return df
        from pyspark import StorageLevel

        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        persisted_pool.append(df)
        return df

    def note(df: DataFrame, stage: str) -> None:
        audits.append(
            df.select("doc_id", F.lit(stage).alias("stage"))
        )

    cur = hold(language_id(quality_features(docs)))

    # --- quality / language gates (stateless column predicates) -----
    qual_bad = F.lit(False)
    if cfg.min_tokens is not None:
        qual_bad = qual_bad | (F.col("n_tokens") < cfg.min_tokens)
    if cfg.min_stopword_ratio is not None:
        qual_bad = qual_bad | (
            F.col("stopword_ratio") < cfg.min_stopword_ratio
        )
    note(cur.filter(qual_bad), "quality")
    cur = cur.filter(~qual_bad)
    if cfg.languages:
        lang_bad = ~F.col("lang_pred").isin(list(cfg.languages))
        note(cur.filter(lang_bad), "language")
        cur = cur.filter(~lang_bad)

    # --- Gopher rules: another stateless column gate -----------------
    if cfg.gopher:
        from .text import gopher_rules

        scored = gopher_rules(cur, **cfg.gopher_thresholds)
        note(scored.filter(~F.col("gopher_pass")), "gopher")
        cur = scored.filter(F.col("gopher_pass")).select(*cur.columns)

    # --- exact dedup: keep-first per normalized fingerprint ---------
    if cfg.exact_dedup:
        w = Window.partitionBy("__fp").orderBy("doc_id")
        cur = hold(
            cur.withColumn("__fp", fingerprint("text")).withColumn(
                "__rk", F.row_number().over(w)
            )
        )
        note(cur.filter(F.col("__rk") > 1), "exact_dup")
        cur = cur.filter(F.col("__rk") == 1).drop("__fp", "__rk")

    # --- near dedup: MinHash LSH candidate pairs, drop the higher id
    # of every pair (the repo-wide keep-first survivor rule) ---------
    if cfg.near_dedup:
        pairs = minhash_lsh_pairs(
            cur,
            num_hashes=cfg.minhash_hashes,
            band_size=cfg.minhash_band,
            k=cfg.shingle_k,
            max_bucket_size=cfg.max_bucket_size,
        )
        losers = hold(
            pairs.select(F.col("doc_b").alias("doc_id")).distinct()
        )
        note(cur.join(losers, "doc_id", "left_semi"), "near_dup")
        cur = cur.join(losers, "doc_id", "left_anti")

    # --- decontamination against the benchmark set ------------------
    if cfg.benchmark is not None:
        overlap = hold(
            benchmark_ngram_contamination(
                cur, cfg.benchmark, n=cfg.contamination_n
            ).select(
                "doc_id",
                (F.col("overlap") > cfg.max_contamination).alias("__bad"),
            )
        )
        cur = cur.join(overlap, "doc_id", "left")
        note(cur.filter(F.col("__bad")), "contaminated")
        cur = cur.filter(~F.coalesce(F.col("__bad"), F.lit(False))).drop(
            "__bad"
        )

    # --- CCNet-style LM-perplexity banding: runs AFTER dedup /
    # decontamination so the expensive per-token scoring joins see
    # the smallest surviving corpus; docs outside lm_keep_bands drop
    if cfg.lm_reference is not None:
        from .lm import perplexity_buckets, score_perplexity, train_bigram_lm

        lm = train_bigram_lm(
            cfg.lm_reference,
            vocab_size=cfg.lm_vocab_size,
            max_bigrams=cfg.lm_max_bigrams,
        )
        bands = hold(
            perplexity_buckets(score_perplexity(cur, lm)).select(
                "doc_id", "band"
            )
        )
        cur = cur.join(bands, "doc_id", "left")
        keep = F.col("band").isin(list(cfg.lm_keep_bands))
        # docs with zero tokens have no band row: keep them — the
        # token gate is the quality stage's job, not the LM's
        keep = keep | F.col("band").isNull()
        note(cur.filter(~keep), "perplexity")
        cur = cur.filter(keep).drop("band")

    # --- substring-level dedup: cut corpus-repeated passages that
    # survived doc-level dedup (boilerplate, licenses) — rewrites
    # text rather than dropping rows; modified docs audited as
    # 'substr_cut' (a rewrite marker, not a drop) --------------------
    if cfg.substring_dedup:
        from .substr import remove_duplicate_spans

        before = cur.select("doc_id", F.col("text").alias("__pre"))
        cur = hold(
            remove_duplicate_spans(
                cur, k=cfg.substr_k, w=cfg.substr_w, unit=cfg.substr_unit
            )
        )
        note(
            cur.join(before, "doc_id").filter(
                F.col("text") != F.col("__pre")
            ),
            "substr_cut",
        )

    # --- PII scrub: the prepared corpus ships the redacted text as
    # ``text`` (counts kept for the audit-minded) --------------------
    if cfg.scrub_pii:
        cur = (
            pii_scrub(cur)
            .withColumn("text", F.col("text_clean"))
            .drop("text_clean")
        )

    if audits:
        audit = audits[0]
        for a in audits[1:]:
            audit = audit.unionByName(a)
    else:
        audit = spark.createDataFrame([], "doc_id long, stage string")
    return cur, audit
