"""Exact substring-level deduplication (winnowing fingerprints).

Training corpora carry verbatim repeated passages (boilerplate,
licenses, templated pages) that document-level dedup misses because
the surrounding text differs. Lee et al., "Deduplicating Training
Data Makes Language Models Better" (ACL 2022) removes any substring
of >= 50 tokens that appears twice, using a corpus-wide suffix
array — a data structure with no distributed equivalent. This module
reaches the same class of duplicates with **winnowing** (Schleimer,
Wilkerson, Aiken, "Winnowing: Local Algorithms for Document
Fingerprinting", SIGMOD 2003): hash every k-gram, then in every
window of ``w`` consecutive k-gram hashes keep the minimum (ties →
rightmost). Winnowing guarantees that any substring of length
``>= w + k - 1`` shared by two locations yields at least one shared
fingerprint, while selecting only ~``2/(w+1)`` of all positions.

Scale shape (the 100 TB contract):

- k-gram hashing + window minima are **per-row array expressions**
  (``transform``/``slice``/``array_min`` over ``sequence``): zero
  shuffle, zero UDFs, whole-stage codegen. O(L*w) comparisons per
  document of length L, all JVM-side.
- Only the sparse fingerprints — ``(doc_id, pos, 32-hex md5)`` —
  ever reach a shuffle; document text never crosses the wire.
- Duplicate detection is one hash-count aggregation plus a semi-join
  on the 32-byte key (map-side partial agg; AQE handles skew from a
  corpus-dominating boilerplate hash).
- Span merging is a gaps-and-islands window over marked rows only
  (a small fraction of positions), partitioned by doc_id.

md5 hex is the hash family (engine-independent, DuckDB-checkable);
lexicographic min over md5 hex is a uniform minimum, per the same
argument as `dedup.py`'s MinHash family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def winnow_fingerprints(
    df: DataFrame,
    k: int = 20,
    w: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    unit: str = "char",
) -> DataFrame:
    """Selected winnowing fingerprints: one row per chosen k-gram,
    ``(doc_id, fp_pos, h)`` with ``h = md5`` of the k units starting
    at 0-based ``fp_pos``. Documents shorter than ``k + w - 1`` units
    produce no fingerprints (no full window exists).

    ``unit="char"`` grams over characters; ``unit="token"`` grams
    over whitespace tokens (Lee et al.'s granularity — positions and
    downstream spans are then token offsets). Tie-break inside a
    window is the rightmost minimal hash — the canonical winnowing
    rule — implemented as ``min`` over ``struct(h, -pos)`` so struct
    ordering does both comparisons.
    """
    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")
    if unit not in ("char", "token"):
        raise ValueError(f"unit must be 'char' or 'token', got {unit!r}")
    text = F.col(text_col)
    if unit == "token":
        toks = F.split(F.trim(text), r"\s+")
        n = F.size(toks)
        pmax = n - F.lit(k)
        gram = lambda i: F.md5(  # noqa: E731
            F.array_join(F.slice(toks, i + 1, F.lit(k)), " ")
        )
    else:
        n = F.length(text)
        pmax = n - F.lit(k)  # last 0-based k-gram start
        gram = lambda i: F.md5(text.substr(i + 1, F.lit(k)))  # noqa: E731
    grams = F.transform(
        F.sequence(F.lit(0), pmax),
        lambda i: F.struct(gram(i).alias("h"), (-i).alias("np")),
    )
    winners = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), pmax - F.lit(w - 1)),
            lambda j: F.array_min(F.slice(grams, j + 1, F.lit(w))),
        )
    )
    # sequence(0, negative) counts DOWN in Spark — guard short docs
    winners = F.when(n >= F.lit(k + w - 1), winners).otherwise(
        F.array().cast("array<struct<h:string,np:int>>")
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), F.explode(winners).alias("fp"))
        .select(
            "doc_id",
            (-F.col("fp.np")).cast("int").alias("fp_pos"),
            F.col("fp.h").alias("h"),
        )
    )


def _merge_islands(marked: DataFrame, k: int) -> DataFrame:
    """Merge per-doc fingerprint positions into maximal disjoint
    spans: each position covers ``[fp_pos, fp_pos + k)``; touching or
    overlapping covers coalesce (gaps-and-islands, one window pass)."""
    by_doc = Window.partitionBy("doc_id").orderBy("fp_pos")
    prev_end = F.max(F.col("fp_pos") + F.lit(k)).over(
        by_doc.rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = F.when(
        prev_end.isNull() | (F.col("fp_pos") > prev_end), 1
    ).otherwise(0)
    grouped = marked.select(
        "doc_id",
        "fp_pos",
        F.sum(brk).over(
            by_doc.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("g"),
    )
    return grouped.groupBy("doc_id", "g").agg(
        F.min("fp_pos").cast("int").alias("span_start"),
        (F.max("fp_pos") + F.lit(k)).cast("int").alias("span_end"),
    ).select("doc_id", "span_start", "span_end")


def duplicate_spans(
    df: DataFrame,
    k: int = 20,
    w: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    unit: str = "char",
) -> DataFrame:
    """Regions of text whose winnowing fingerprint occurs at least
    ``min_count`` times corpus-wide (within- and cross-document):
    ``(doc_id, span_start, span_end)``, 0-based half-open offsets in
    ``unit``\\ s (chars or tokens), overlapping covers merged per
    document.

    Any substring of length ``>= w + k - 1`` units duplicated
    anywhere in the corpus is guaranteed to surface at least one span
    (the winnowing guarantee); shorter repeats are caught best-effort.
    """
    fps = winnow_fingerprints(
        df, k=k, w=w, text_col=text_col, id_col=id_col, unit=unit
    )
    dup_h = (
        fps.groupBy("h")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .select("h")
    )
    marked = fps.join(dup_h, "h", "left_semi")
    return _merge_islands(marked, k)


def remove_duplicate_spans(
    df: DataFrame,
    k: int = 20,
    w: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    unit: str = "char",
) -> DataFrame:
    """Keep-first substring dedup, applied: for every duplicated
    fingerprint the first occurrence (min ``(doc_id, fp_pos)``)
    survives; every other covered region is cut from its document.
    Returns every input row with its original columns, ``text_col``
    rewritten — documents with nothing to cut come back verbatim,
    fully-duplicated documents come back shortened (possibly to '').

    The cut is a single ``aggregate`` over the doc's sorted disjoint
    spans (concat the keep-gaps, then the tail) — no UDF, text is
    touched only in this final per-row expression. With
    ``unit="token"`` the cut drops whole tokens and rejoins the
    survivors with single spaces (surrounding whitespace is not
    preserved — the tokenization already normalized it).

    Completeness: every cut region is genuinely duplicated (a
    fingerprint match is a k-gram content match), but with ``w > 1``
    the cut covers only the winnowing-selected portions of a
    duplicated run — remnants up to ``~(w-1) + k - 1`` units survive
    at its edges. ``w = 1`` selects EVERY k-gram, so merged spans
    cover each duplicated run of ``>= k`` units exactly — Lee et
    al.'s ExactSubstr cut — at the cost of ~``(w+1)/2``× more
    fingerprint rows in the shuffle. Detection-only callers
    (``duplicate_spans``) usually want ``w > 1``; removal quality
    wants ``w = 1``.
    """
    fps = winnow_fingerprints(
        df, k=k, w=w, text_col=text_col, id_col=id_col, unit=unit
    )
    by_h = Window.partitionBy("h")
    first = F.min(F.struct("doc_id", "fp_pos")).over(by_h)
    cnt = F.count("*").over(by_h)
    losers = (
        fps.withColumn("cnt", cnt)
        .withColumn("first", first)
        .filter(
            (F.col("cnt") >= 2)
            & ~(
                (F.col("doc_id") == F.col("first.doc_id"))
                & (F.col("fp_pos") == F.col("first.fp_pos"))
            )
        )
        .select("doc_id", "fp_pos")
    )
    spans = _merge_islands(losers, k)
    per_doc = spans.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_list(F.struct("span_start", "span_end"))
        ).alias("spans")
    ).withColumnRenamed("doc_id", "__span_doc_id")
    text = F.col(text_col)
    if unit == "token":
        toks = F.split(F.trim(text), r"\s+")
        kept = F.aggregate(
            F.col("spans"),
            F.struct(
                F.lit(0).alias("last"),
                F.array().cast("array<string>").alias("acc"),
            ),
            lambda acc, s: F.struct(
                s["span_end"].alias("last"),
                F.concat(
                    acc["acc"],
                    F.slice(toks, acc["last"] + 1, s["span_start"] - acc["last"]),
                ).alias("acc"),
            ),
            lambda acc: F.concat(
                acc["acc"],
                F.slice(toks, acc["last"] + 1, F.size(toks) - acc["last"]),
            ),
        )
        cut = F.array_join(kept, " ")
    else:
        cut = F.aggregate(
            F.col("spans"),
            F.struct(F.lit(0).alias("last"), F.lit("").alias("acc")),
            lambda acc, s: F.struct(
                s["span_end"].alias("last"),
                F.concat(
                    acc["acc"],
                    text.substr(acc["last"] + 1, s["span_start"] - acc["last"]),
                ).alias("acc"),
            ),
            lambda acc: F.concat(
                acc["acc"],
                text.substr(acc["last"] + 1, F.length(text) - acc["last"]),
            ),
        )
    joined = df.join(
        per_doc, F.col(id_col) == F.col("__span_doc_id"), "left"
    )
    new_text = F.when(F.col("spans").isNull(), text).otherwise(cut)
    return joined.select(
        *[
            new_text.alias(c) if c == text_col else F.col(c)
            for c in df.columns
        ]
    )
