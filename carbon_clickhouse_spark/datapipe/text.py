"""Text-analysis operators for large-scale training-data pipelines.

All hot paths are built-in column expressions (JVM, codegen) so they
scale to 100 TB of documents: tokenization via regex split, counts via
array ops, fingerprints via built-in hashes. No Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

#: tiny per-language stopword anchors for the n-gram/stopword heuristic
LANG_STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is"],
    "es": ["el", "la", "de", "que", "y", "en", "los"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit"],
    "fr": ["le", "la", "les", "de", "et", "est", "dans"],
}

TOKEN_SPLIT_RE = r"\s+"
#: BPE-ish word/punct splitter: words, numbers, or single punctuation.
#: Whitespace is an EXPLICIT ASCII class, not ``\s``: Java's ``\s`` is
#: ASCII-only while Python re's is Unicode-aware, so the shorthand made
#: JVM-side training and Python-side ``bpe_encode`` split NBSP-bearing
#: text differently. The explicit class is identical in Java, RE2
#: (DuckDB oracle), and Python.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]"


def tokens(text: Column | str) -> Column:
    """Whitespace tokens (empty strings filtered)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.trim(col), TOKEN_SPLIT_RE), lambda t: t != "")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def bpe_token_count(text: Column | str) -> Column:
    """Sub-word-ish token count via the BPE-like regex."""
    col = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_RE), 0))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality scoring features: length, token stats,
    punctuation/digit/stopword ratios. All exact-integer counts plus
    ratios rounded to 4 decimals (cross-engine stable)."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    n_char = F.length(t)
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), 0))
    n_digit = F.size(F.regexp_extract_all(t, F.lit(r"[0-9]"), 0))
    n_stop = F.size(
        F.filter(toks, lambda x: F.lower(x).isin(LANG_STOPWORDS["en"]))
    )
    mean_tok_len = F.when(n_tok > 0, F.round(
        (F.aggregate(toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
         .cast("double") / n_tok), 4)).otherwise(F.lit(0.0))
    return df.select(
        "*",
        n_char.alias("n_char"),
        n_tok.cast("long").alias("n_tokens"),
        n_punct.cast("long").alias("n_punct"),
        n_digit.cast("long").alias("n_digit"),
        n_stop.cast("long").alias("n_stopwords"),
        mean_tok_len.alias("mean_token_len"),
        F.when(n_tok > 0, F.round(n_stop.cast("double") / n_tok, 4))
        .otherwise(F.lit(0.0))
        .alias("stopword_ratio"),
    )


def readability_features(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Flesch reading ease + Flesch-Kincaid grade per document (the
    classic readability quality signals — Flesch 1948 / Kincaid 1975
    constants): sentences = runs of ``[.!?]``, words = whitespace
    tokens, syllables = vowel-GROUP count per word ([aeiouy]+, floor
    1 — the standard heuristic). All counts are exact integers from
    regexp/array ops (JVM codegen, zero shuffle, zero UDF); the two
    scores are fixed IEEE trees over them, rounded to 4 like every
    text ratio here. Appends ``n_sentences, n_syllables,
    flesch_reading_ease, fk_grade`` (word counts ride
    :func:`quality_features`); empty documents score NULL rather
    than dividing by zero."""
    t = F.col(text_col)
    toks = tokens(t)
    n_words = F.size(toks).cast("double")
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(t, F.lit(r"[.!?]+"), 0)),
        F.lit(1),
    ).cast("double")
    syl = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, w: acc
        + F.greatest(
            F.size(
                F.regexp_extract_all(
                    F.lower(w), F.lit(r"[aeiouy]+"), 0
                )
            ),
            F.lit(1),
        ).cast("long"),
    )
    wps = n_words / n_sent
    spw = syl.cast("double") / n_words
    fre = (
        F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    )
    fk = (
        F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)
    )
    nonempty = F.size(toks) > 0
    return df.select(
        "*",
        F.when(nonempty, n_sent.cast("long")).alias("n_sentences"),
        F.when(nonempty, syl).alias("n_syllables"),
        F.when(nonempty, F.round(fre, 4)).alias("flesch_reading_ease"),
        F.when(nonempty, F.round(fk, 4)).alias("fk_grade"),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-anchor language ID heuristic: score = distinct anchor
    hits per language; highest score wins, ties broken by language
    code, zero hits -> 'und'."""
    t = F.col(text_col)
    toks = F.transform(tokens(t), lambda x: F.lower(x))
    scores = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in LANG_STOPWORDS.items()
    }
    # fold to (best_score, best_lang); iterate langs sorted so ties
    # resolve deterministically to the smallest code
    best_score, best_lang = F.lit(-1), F.lit("und")
    for lang in sorted(scores):
        s = scores[lang]
        cond = s > best_score
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, s).otherwise(best_score)
    best_lang = F.when(best_score <= 0, F.lit("und")).otherwise(best_lang)
    return df.select("*", best_lang.alias("lang_pred"))


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality signals per document:
    (doc_id, n_tokens, n_distinct, distinct_ratio, top_token_frac,
    top_bigram_frac, mean_token_len).

    High top-token / top-bigram fractions and low distinct ratios mark
    boilerplate and degenerate repetition (Rae et al., Gopher, §A1.1
    repetition filters; line-level signals don't apply — corpus text
    is single-line).

    Scale shape: the counting is per-document local, so it runs as ONE
    Arrow-batched map pass with ZERO shuffles — strictly better than
    explode + two groupBys, which would shuffle every token. Python
    emits only exact integer counts; the ratio divisions + rounding
    stay in codegen (Python's round() is banker's, which disagrees
    with both engines' HALF_UP on grid midpoints).
    """
    import collections

    import pandas as pd
    from pyspark.sql import types as T

    counts_schema = T.StructType(
        [
            T.StructField("doc_id", df.schema[id_col].dataType),
            T.StructField("n_tokens", T.LongType()),
            T.StructField("n_distinct", T.LongType()),
            T.StructField("top_token_cnt", T.LongType()),
            T.StructField("n_bigrams", T.LongType()),
            T.StructField("top_bigram_cnt", T.LongType()),
            T.StructField("sum_token_len", T.LongType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = (text or "").split()
                tc = collections.Counter(toks)
                bigrams = collections.Counter(
                    f"{a} {b}" for a, b in zip(toks, toks[1:])
                )
                rows.append(
                    (
                        doc_id,
                        len(toks),
                        len(tc),
                        max(tc.values()) if tc else 0,
                        max(len(toks) - 1, 0),
                        max(bigrams.values()) if bigrams else 0,
                        sum(len(t) for t in toks),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in counts_schema])

    counts = df.select(id_col, text_col).mapInPandas(run, counts_schema)
    n = F.col("n_tokens")
    nb = F.col("n_bigrams")
    return counts.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.when(n > 0, F.round(F.col("n_distinct").cast("double") / n, 4)).alias(
            "distinct_ratio"
        ),
        F.when(n > 0, F.round(F.col("top_token_cnt").cast("double") / n, 4)).alias(
            "top_token_frac"
        ),
        F.when(
            nb > 0, F.round(F.col("top_bigram_cnt").cast("double") / nb, 4)
        ).alias("top_bigram_frac"),
        F.when(n > 0, F.round(F.col("sum_token_len").cast("double") / n, 4)).alias(
            "mean_token_len"
        ),
    )


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase
    text. md5 (not xxhash) so external engines can reproduce it."""
    col = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "))


def rolling_fingerprints(
    df: DataFrame, text_col: str = "text", window: int = 16
) -> DataFrame:
    """Rolling window-hash fingerprints (one md5 per `window` tokens)
    for fuzzy containment checks — exploded (doc_id, pos, window_hash).
    """
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    starts = F.when(
        n >= window, F.sequence(F.lit(1), n - window + 1, F.lit(window))
    ).otherwise(F.array(F.lit(1)))
    windows = F.transform(
        starts, lambda s: F.md5(F.concat_ws(" ", F.slice(toks, s, window)))
    )
    return df.select(
        "doc_id", F.posexplode(windows).alias("pos", "window_hash")
    )


def split_paragraphs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, para_idx, paragraph): blank-line-separated paragraphs,
    whitespace-normalized for hashing stability. Pure column
    expressions (posexplode over a split), no Python."""
    paras = F.split(F.col(text_col), r"\n\s*\n")
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(paras).alias("para_idx", "paragraph"),
        )
        .withColumn("paragraph", F.trim(F.regexp_replace("paragraph", r"\s+", " ")))
        .filter(F.col("paragraph") != "")
    )


def duplicate_paragraphs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", min_count: int = 2
) -> DataFrame:
    """Corpus-wide exact paragraph dedup (the C4/RefinedWeb paragraph
    pass at document-set scale): (para_hash, n_docs, n_occurrences,
    survivor_doc, survivor_idx) for every paragraph appearing
    ``min_count``+ times. One groupBy on the md5 — scale-safe, the
    shuffle key is 32 bytes regardless of paragraph length; the
    survivor (first occurrence in (doc_id, para_idx) order) is what a
    keep-first rewrite retains."""
    paras = split_paragraphs(df, text_col, id_col)
    h = F.md5(F.col("paragraph"))
    return (
        paras.select("doc_id", "para_idx", h.alias("para_hash"))
        .groupBy("para_hash")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
            F.min(F.struct("doc_id", "para_idx")).alias("__first"),
        )
        .filter(F.col("n_occurrences") >= min_count)
        .select(
            "para_hash",
            "n_docs",
            "n_occurrences",
            F.col("__first.doc_id").alias("survivor_doc"),
            F.col("__first.para_idx").alias("survivor_idx"),
        )
    )


def remove_duplicate_paragraphs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep-first paragraph dedup applied: every non-survivor copy of
    a corpus-duplicated paragraph is dropped, documents are
    reassembled in paragraph order. Exactly two shuffles and zero
    joins: a row_number window keyed on the 32-byte md5 picks the
    survivor copy (strictly cheaper than the groupBy-min + join-back
    formulation — full paragraph text crosses the wire once, not
    twice), then one groupBy(doc_id) reassembles.

    Every input doc_id stays in the output: posexplode of a split
    always yields >= 1 row per document, and the conditional
    collect_list ignores non-survivor/empty paragraphs, so a document
    whose every paragraph was a non-survivor duplicate (or was empty
    to begin with) comes back with ``text = ''`` rather than
    vanishing — the corpus row set is preserved for downstream
    joins."""
    split = F.split(F.col(text_col), r"\n\s*\n")
    paras = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(split).alias("para_idx", "paragraph"),
        )
        .withColumn(
            "paragraph", F.trim(F.regexp_replace("paragraph", r"\s+", " "))
        )
        .withColumn("para_hash", F.md5(F.col("paragraph")))
    )
    w = Window.partitionBy("para_hash").orderBy("doc_id", "para_idx")
    ranked = paras.withColumn("__rk", F.row_number().over(w))
    keep = (F.col("__rk") == 1) & (F.col("paragraph") != "")
    return ranked.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(keep, F.struct("para_idx", "paragraph"))
                    )
                ),
                lambda s: s["paragraph"],
            ),
            "\n\n",
        ).alias(text_col)
    )


def remove_duplicate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    min_chars: int = 1,
) -> DataFrame:
    """Corpus-wide exact LINE dedup with keep-first rewrite (the
    RefinedWeb line-dedup pass): a line whose whitespace-trimmed form
    appears in ``min_docs``+ distinct documents is dropped everywhere
    except its first occurrence (lexicographic ``(doc_id, line_idx)``),
    and documents are reassembled in line order. Lines shorter than
    ``min_chars`` after trimming (blank lines by default) are exempt —
    they are document structure, not boilerplate.

    Distinct from :func:`remove_duplicate_paragraphs` in granularity
    (single ``\\n`` lines vs blank-line paragraphs) and in having a
    cross-document threshold: a line must recur in ``min_docs``
    DIFFERENT documents to be boilerplate; intra-document repeats
    alone don't trigger removal.

    Scale shape — exactly two shuffles, zero joins: one Exchange on
    the 32-byte line hash feeds three window functions over the same
    partitioning+sort (dense_rank-over-doc_id's max is the distinct
    document count, so no countDistinct groupBy + join-back is
    needed; line text crosses the wire once), then one groupBy(doc_id)
    reassembles. Per-hash fan-in is bounded by the occurrence count
    of a single unique line — the same skew class as the groupBy
    formulation, without its second text shuffle.

    Every input doc_id survives: a split yields >= 1 row per document
    and the conditional collect_list tolerates empty results, so a
    fully-boilerplate document returns with ``text = ''``.
    """
    lines = df.select(
        F.col(id_col).alias("doc_id"),
        # NULL text must not drop the document (posexplode of NULL
        # emits no row): treat it as the empty document
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n", -1)
        ).alias("line_idx", "line"),
    ).withColumn("__tl", F.trim(F.col("line")))
    # exempt rows get a per-row UNIQUE partition key, not NULL: window
    # partitionBy groups all NULLs together, which would funnel every
    # blank line in the corpus into one task. Singleton partitions
    # shuffle but never skew, and trivially rank as non-duplicates.
    elig = F.length("__tl") >= min_chars
    h = F.when(elig, F.md5(F.col("__tl"))).otherwise(
        F.concat_ws(":", F.lit("u"), F.col("doc_id"), F.col("line_idx"))
    )
    lines = lines.withColumn("__elig", elig).withColumn("__h", h)
    part = Window.partitionBy("__h")
    by_doc = part.orderBy("doc_id")
    by_pos = part.orderBy("doc_id", "line_idx")
    ranked = (
        lines.withColumn("__dr", F.dense_rank().over(by_doc))
        .withColumn("__nd", F.max("__dr").over(part))
        .withColumn("__rn", F.row_number().over(by_pos))
    )
    keep = (
        ~F.col("__elig")
        | (F.col("__nd") < min_docs)
        | (F.col("__rn") == 1)
    )
    return ranked.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(keep, F.struct("line_idx", "line"))
                    )
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias(text_col)
    )


def clean_text(text: Column | str) -> Column:
    """Standard corpus text hygiene as pure column ops: zero-width
    characters and BOMs vanish, unicode spaces (NBSP, en/em/thin,
    ideographic...) become ASCII space, C0/C1 control characters
    (except tab and newline) are stripped, and runs of spaces/tabs
    collapse. Compose with :func:`nfc_normalize` when codepoint
    composition also matters."""
    c = F.col(text) if isinstance(text, str) else text
    c = F.regexp_replace(
        c, "[\u200b\u200c\u200d\u2060\ufeff]", ""
    )
    c = F.regexp_replace(
        c,
        "[\u00a0\u1680\u2000-\u200a\u202f\u205f\u3000]",
        " ",
    )
    c = F.regexp_replace(
        c, "[\x00-\x08\x0b-\x1f\x7f\x85]", ""
    )
    c = F.regexp_replace(c, "[ \t]{2,}", " ")
    return c


def nfc_normalize(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Unicode NFC normalization of a text column — one Arrow
    mapInPandas pass (composition tables aren't expressible as JVM
    regexes); all other columns pass through."""
    import unicodedata

    def fix(batches):
        for pdf in batches:
            pdf[text_col] = pdf[text_col].map(
                lambda s: unicodedata.normalize("NFC", s)
                if isinstance(s, str)
                else s
            )
            yield pdf

    return df.mapInPandas(fix, df.schema)


def train_valid_split(
    df: DataFrame, valid_pct: float = 1.0, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic holdout assignment: adds ``split`` =
    'valid' for ~valid_pct% of rows keyed on an md5 bucket of the id
    (RNG-free, stable under repartitioning and re-runs — the property
    a reproducible 100 TB corpus build needs), else 'train'."""
    bucket = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10
    ).cast("long") % 10000
    return df.withColumn(
        "split",
        F.when(bucket < int(valid_pct * 100), F.lit("valid")).otherwise(
            F.lit("train")
        ),
    )


def extract_domain(url: Column | str) -> Column:
    """Registrable host of a URL column (lowercased, port stripped) —
    the key for domain-level quality filters and blocklists."""
    c = F.col(url) if isinstance(url, str) else url
    host = F.parse_url(c, F.lit("HOST"))
    return F.lower(F.regexp_replace(host, r":\d+$", ""))


def filter_blocked_domains(
    df: DataFrame, blocked: list[str], url_col: str = "url",
    include_subdomains: bool = True,
) -> DataFrame:
    """Drop rows whose URL's domain (or any parent domain) is on the
    blocklist. The blocklist rides as a literal/broadcast — no
    shuffle of the data side."""
    dom = extract_domain(url_col)
    blocked_norm = [b.lower().lstrip(".") for b in blocked]
    cond = dom.isin(blocked_norm)
    if include_subdomains:
        for b in blocked_norm:
            cond = cond | dom.endswith("." + b)
    return df.filter(~cond)


#: query parameters stripped by URL canonicalization: analytics /
#: click-tracking noise that never changes the fetched content
#: (utm_* is a prefix match, the rest exact keys)
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|ref|mc_cid|mc_eid)="


def canonical_url(url: Column | str) -> Column:
    """Canonical form of an absolute URL — the key for first-pass
    crawl deduplication (the same page crawled as
    ``HTTP://WWW.Example.com:80/a/?utm_source=x&b=1#frag`` and
    ``http://example.com/a?b=1`` must collide):

    - scheme and host lowercase; a ``www.`` host prefix drops
    - the port drops when it is the scheme default (http:80 /
      https:443), stays otherwise
    - the fragment drops (never sent to the server)
    - tracking query params drop (:data:`TRACKING_PARAM_RE`);
      survivors sort bytewise so param order never splits a page
    - trailing path slashes drop (root path becomes empty)

    Pure column expressions (regexp + array higher-order functions,
    whole-stage codegen) — no UDF, no shuffle; every rule is
    replayed verbatim by the DuckDB oracle."""
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(
        F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1)
    )
    hostport = F.regexp_extract(
        u, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1
    )
    host = F.regexp_replace(
        F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1)),
        r"^www\.",
        "",
    )
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    path = F.regexp_replace(
        F.regexp_extract(
            u, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1
        ),
        r"/+$",
        "",
    )
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    params = F.sort_array(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qs = F.array_join(params, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(
            F.lit("")
        ),
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """First-seen URL deduplication over :func:`canonical_url`: per
    canonical form the LOWEST ``id_col`` survives (``keep`` true,
    ``dup_of`` NULL); every other crawl of the same page points at
    it. One shuffle on the canonical key (a window over it — the
    same single-Exchange shape as the exact-dedup family); rows with
    a NULL url pass through as their own keepers (nothing to
    collide on)."""
    canon = canonical_url(url_col)
    w = Window.partitionBy(canon).orderBy(F.col(id_col).asc())
    first_id = F.first(id_col).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rn = F.row_number().over(w)
    return df.select(
        F.col(id_col),
        F.col(url_col),
        canon.alias("canonical_url"),
        (F.col(url_col).isNull() | (rn == 1)).alias("keep"),
        F.when(
            F.col(url_col).isNotNull() & (rn > 1), first_id
        ).alias("dup_of"),
    )


#: Gopher quality-rule defaults (Rae et al. 2021, Table A1 — public
#: paper): documents outside these bounds are flagged low-quality
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher's published document-quality rules as one column-only
    pass: adds per-rule booleans, a ``gopher_reasons`` array naming
    each failed rule, and ``gopher_pass``. Zero shuffles, zero UDFs —
    every signal is a regexp/array expression over the text column,
    so the filter runs at scan speed and pushes into the same stage
    as the parquet read at 100 TB."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    mean_len = F.when(
        n_tok > 0,
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
        ).cast("double")
        / n_tok,
    ).otherwise(F.lit(0.0))
    # Gopher counts '#' and '...' occurrences against the word count
    n_symbols = F.size(
        F.regexp_extract_all(t, F.lit(r"#|\.\.\."), 0)
    )
    lines = F.filter(F.split(t, "\n"), lambda l: F.trim(l) != "")
    n_lines = F.size(lines)
    bullet_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(
                lines,
                lambda l: F.trim(l).rlike(r"^(•|‣|◦|-|\*)\s"),
            )
        ).cast("double")
        / n_lines,
    ).otherwise(F.lit(0.0))
    ellipsis_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(
                lines,
                lambda l: F.rtrim(l).rlike(r"(\.\.\.|…)$"),
            )
        ).cast("double")
        / n_lines,
    ).otherwise(F.lit(0.0))
    alpha_frac = F.when(
        n_tok > 0,
        F.size(F.filter(toks, lambda x: x.rlike(r"\p{L}"))).cast("double")
        / n_tok,
    ).otherwise(F.lit(0.0))
    stop_hits = F.size(
        F.array_intersect(
            F.transform(toks, lambda x: F.lower(x)),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    )

    checks = {
        "word_count": (n_tok >= min_words) & (n_tok <= max_words),
        "mean_word_len": (mean_len >= min_mean_word_len)
        & (mean_len <= max_mean_word_len),
        "symbol_ratio": F.when(
            n_tok > 0, n_symbols.cast("double") / n_tok
        ).otherwise(F.lit(1.0))
        <= max_symbol_word_ratio,
        "bullet_lines": bullet_frac <= max_bullet_line_frac,
        "ellipsis_lines": ellipsis_frac <= max_ellipsis_line_frac,
        "alpha_words": alpha_frac >= min_alpha_word_frac,
        "stopwords": stop_hits >= min_stop_hits,
    }
    reasons = F.filter(
        F.array(
            *[
                F.when(~cond, F.lit(name))
                for name, cond in checks.items()
            ]
        ),
        lambda x: x.isNotNull(),
    )
    out = df
    for name, cond in checks.items():
        out = out.withColumn(f"gopher_{name}", cond)
    return out.withColumn("gopher_reasons", reasons).withColumn(
        "gopher_pass", F.size(reasons) == 0
    )


def filter_gopher(df: DataFrame, text_col: str = "text", **thresholds) -> DataFrame:
    """Keep only documents passing every Gopher rule (the columns the
    scoring pass added are dropped — this is the pipeline-stage
    form)."""
    scored = gopher_rules(df, text_col, **thresholds)
    return scored.filter(F.col("gopher_pass")).select(*df.columns)
