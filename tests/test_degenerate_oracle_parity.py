"""Degenerate-shape oracle parity (the r8 ADVICE #1 class, closed
PROACTIVELY across the registry): the driver's gate only ever sees
the generated fixtures, so a Spark-side guard whose DuckDB oracle
lacks the mirror (or vice versa) stays invisible until a fixture
change breaks the gate. This suite runs 77 of the registered
queries AND their oracles over HAND-BUILT degenerate tables —

* events: size-1 / zero-variance / single-sample-class /
  single-timestamp / single-x-class groups (statistics + the whole
  graphite four-table family over lines synthesized from them);
* documents: NULL / empty / whitespace / accented / pure-repetition
  texts (the text family — this sweep CAUGHT the und-vs-fr
  NULL-text language oracle gap);
* embeddings: zero-magnitude / duplicate / near-duplicate vectors
  (the ANN family — this sweep CAUGHT the zero-vector ANSI
  divide-by-zero crash);
* TPC-H: zero quantities, a 100% discount, orders with no
  lineitems, customers with no orders

— and requires identical rows/columns/values (nan == nan), exactly
like the driver compare. Any future guard added on one side fails
here until the other side mirrors it, independent of what the
driver's fixtures contain."""

import datetime
import math
import os

import duckdb
import pandas as pd
import pytest

QUERIES = [
    "stat_moments",
    "two_sample_tests",
    "contingency_stats",
    "ch_agg_breadth",
    "rank_corr",
    "theils_u",
    "exp_smoothing",
    "linear_regression",
    "entropy",
    "categorical_iv",
    "anova",
    "mean_z_test",
    "corr_matrix",
    "decayed_family",
    "bit_ops",
    "variance_family",
    "moments_samp",
    "array_agg_family",
    # the pre-r9 events-table aggregates, locked in after the same
    # probe found zero latent divergences on these shapes
    "value_quantiles",
    "value_histogram",
    "quantile_sketch",
    "top_event_types",
    "uniq_up_to",
    "moving_window_arrays",
    "interval_metrics",
    "histogram_adaptive",
    "histogram_adaptive_sketch",
    "lttb_downsample",
    "delta_sum",
    "retention_flags",
    "sum_map_daily",
    "sessionization",
    "window_funnel_strict",
    "sequence_match_bounds",
    # the graphite four-table/query family over the same degenerate
    # events (lines synthesized from them) — locked in after the r9
    # probe found zero divergences
    "points_ingest",
    "points_reverse",
    "index_table",
    "tagged_table",
    "tree_series",
    "series_dedup",
    "rollup_all",
    "read_series",
    "find_metrics_all",
    "find_tagged_all",
    "render_recursive",
    "asof_align",
    "window_funnel",
    "retention",
    "sequence_count",
    "drop_rules",
    "ignored_patterns",
    "template_tagging",
    "grouping_sets",
    "sequence_match",
    "sequence_next_node",
]


def _degenerate_events(
    null_group: bool = False, null_user: bool = False
) -> pd.DataFrame:
    t0 = datetime.datetime(2024, 1, 10, 12, 0, 0)
    rows = []

    def add(et, n, value=None, user=None, same_ts=False, vstep=0.0):
        for i in range(n):
            rows.append(
                {
                    "event_id": len(rows) + 1,
                    "ts": t0 if same_ts else t0 + datetime.timedelta(
                        seconds=60 * len(rows)
                    ),
                    "user_id": user if user is not None else len(rows),
                    "event_type": et,
                    "value": (
                        value if value is not None else 10.0 + i * 1.7
                    )
                    + i * vstep,
                    "props": "{}",
                }
            )

    add("solo", 1)                       # n = 1: every sample stat nan
    add("const", 10, value=7.25)         # zero variance
    add("oneclass", 8, user=2)           # user%2 == 0 only: n1 = 0
    add("onetime", 5, same_ts=True)      # zero x-range for t-based ops
    add("onetype_user", 6, user=4)       # single y class for contingency
    add("normal", 30, vstep=0.3)         # sanity: a regular group
    pdf = pd.DataFrame(rows)
    # a NULL event_id row (r9 advice): operators deriving y from
    # event_id (rank_corr, variance_family, corr_matrix, ...) must
    # drop the pair on BOTH engines, or the oracle sees one row more
    pdf.loc[len(pdf)] = {
        "event_id": None,
        "ts": pd.Timestamp(t0 + datetime.timedelta(seconds=30)),
        "user_id": 9,
        "event_type": "normal",
        "value": 55.5,
        "props": "{}",
    }
    if null_group:
        # a NULL-GROUP-KEY cohort (r11 ADVICE): ClickHouse and DuckDB
        # GROUP BY both keep NULL keys as their own group, so every
        # grouped operator must too — the decayed family's pre-r11
        # name-equality join-back silently dropped this group and
        # would have failed exactly this sweep. Kept OUT of the base
        # table: the graphite four-table queries build metric paths
        # from event_type, where Spark's concat propagates NULL but
        # DuckDB's skips it — a fixture-plumbing artifact (a NULL
        # event type never reaches a real plain line), not the
        # grouped-aggregate contract this cohort pins.
        for j, v in enumerate((3.0, 5.5, -2.25)):
            pdf.loc[len(pdf)] = {
                "event_id": 900 + j,
                "ts": pd.Timestamp(
                    t0 + datetime.timedelta(seconds=7 + 60 * j)
                ),
                "user_id": 11,
                "event_type": None,
                "value": v,
                "props": "{}",
            }
    if null_user:
        # a NULL-USER cohort (r11): user_id is the group key of the
        # whole event-analytics family; CH GROUP BY keeps a NULL user
        # as one group, so the funnels/sequence folds must treat the
        # NULL run as ONE group (NaN != NaN started a fresh run per
        # row pre-r11) and the recursive-walk oracles must join it
        # null-safely. The cohort completes a full
        # signup -> click -> purchase chain so levels/counts are
        # non-trivial.
        for j, et in enumerate(("signup", "view", "click", "purchase")):
            pdf.loc[len(pdf)] = {
                "event_id": 950 + j,
                "ts": pd.Timestamp(
                    t0 + datetime.timedelta(seconds=13 + 45 * j)
                ),
                "user_id": None,
                "event_type": et,
                "value": 1.0 + j,
                "props": "{}",
            }
    pdf["event_id"] = pdf["event_id"].astype("Int64")
    pdf["user_id"] = pdf["user_id"].astype(
        "Int64" if null_user else "int64"
    )
    # force a MICROSECOND timestamp column (matching the driver
    # fixtures): pandas' default ns precision lands in Spark 4 as a
    # plain long and breaks date_format
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    return pdf


#: grouped-aggregate queries additionally swept over the NULL-group-
#: key events variant (every one groups by event_type, so the NULL
#: cohort must come out as its own group on BOTH engines)
NULL_KEY_QUERIES = [
    "stat_moments",
    "two_sample_tests",
    "contingency_stats",
    "ch_agg_breadth",
    "rank_corr",
    "theils_u",
    "exp_smoothing",
    "linear_regression",
    "entropy",
    "categorical_iv",
    "anova",
    "mean_z_test",
    "corr_matrix",
    "decayed_family",
    "bit_ops",
    "variance_family",
    "moments_samp",
    "array_agg_family",
    "value_quantiles",
    "top_event_types",
    "quantile_sketch",
    "histogram_adaptive",
    "sum_map_daily",
    "grouping_sets",
    "uniq_up_to",
    "value_histogram",
    "histogram_adaptive_sketch",
    "moving_window_arrays",
    "lttb_downsample",
    "delta_sum",
]


@pytest.fixture(scope="module")
def degen_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("degen")
    pdf = _degenerate_events()
    pdf.to_parquet(os.path.join(d, "events.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def degen_null_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("degen_null")
    pdf = _degenerate_events(null_group=True)
    pdf.to_parquet(os.path.join(d, "events.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def degen_user_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("degen_user")
    pdf = _degenerate_events(null_user=True)
    pdf.to_parquet(os.path.join(d, "events.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def degen_duck(degen_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{degen_dir}/events.parquet')"
    )
    yield con
    con.close()


@pytest.fixture(scope="module")
def degen_user_duck(degen_user_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{degen_user_dir}/events.parquet')"
    )
    yield con
    con.close()


@pytest.fixture(scope="module")
def degen_null_duck(degen_null_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{degen_null_dir}/events.parquet')"
    )
    yield con
    con.close()


def _normalize(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda x: str(x) if x is not None else None
            )
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _values_match(a, b):
    if list(a.columns) != list(b.columns) or len(a) != len(b):
        return False
    for c in a.columns:
        for x, y in zip(a[c].tolist(), b[c].tolist()):
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                if x != y:
                    return False
            elif str(x) != str(y):
                return False
    return True


def _check_parity(name, spark, sf_dir, duck, label=""):
    import __spark_entry__ as entry

    qs = {**entry.queries(), **entry.extra_queries()}
    os_ = {**entry.oracle_sql(), **entry.extra_oracle_sql()}
    sdf = _normalize(qs[name](spark, sf_dir).toPandas())
    odf = _normalize(duck.execute(os_[name]).fetchdf())
    assert len(sdf) == len(odf), (name, label, len(sdf), len(odf))
    assert list(sdf.columns) == list(odf.columns), (name, label)
    assert _values_match(sdf, odf), (
        f"{name}: degenerate-shape mismatch {label}"
    )


@pytest.mark.parametrize("name", QUERIES)
def test_degenerate_parity(name, spark, degen_dir, degen_duck):
    _check_parity(name, spark, degen_dir, degen_duck)


#: user-grouped event-analytics queries swept over the NULL-user
#: events variant
NULL_USER_QUERIES = [
    "window_funnel",
    "window_funnel_strict",
    "window_funnel_strict_order",
    "window_funnel_strict_dedup",
    "window_funnel_strict_once",
    "retention",
    "retention_flags",
    "sequence_match",
    "sequence_match_bounds",
    "sequence_count",
    "sequence_next_node",
    "sessionization",
]


@pytest.mark.parametrize("name", NULL_USER_QUERIES)
def test_null_user_parity(name, spark, degen_user_dir, degen_user_duck):
    """r11: a NULL user_id is one group across the event-analytics
    family on both engines — the funnels' and sequence matchers'
    Arrow folds must not split the NULL run, and the recursive-walk
    oracles must not drop it at their equality joins."""
    _check_parity(name, spark, degen_user_dir, degen_user_duck, "(null user)")


@pytest.mark.parametrize("name", NULL_KEY_QUERIES)
def test_null_group_key_parity(name, spark, degen_null_dir, degen_null_duck):
    """r11: the NULL-group-key cohort must come out as its own group
    with identical values on both engines — the class of bug the
    decayed family's pre-r11 join-back had."""
    _check_parity(name, spark, degen_null_dir, degen_null_duck, "(null keys)")


# ---- documents-table text family -----------------------------------

DOC_QUERIES = [
    "text_features",  # caught the und-vs-fr NULL-text oracle gap (r9)
    "token_counts",
    "readability",
    "repetition_signals",
    "line_dedup",
    "paragraph_dedup",
    "dedup_exact",
    "chunk_docs",
    "tfidf_top_terms",
    "domain_filter",
    "lm_perplexity",
    "substr_dup_spans",
]


def _degenerate_documents() -> pd.DataFrame:
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(1, 11)),
            "text": [
                None,                           # NULL text
                "",                             # empty
                "   ",                          # whitespace only
                "a",                            # single char
                "word",                         # single token
                "the the the the the",          # pure repetition
                "x.y!z?",                       # punctuation soup
                "café naïve résumé",  # accents
                "line1\nline1\nline1",          # duplicate lines
                "The quick brown fox jumps over the lazy dog. " * 3,
            ],
            "lang": ["en"] * 10,
            "source": ["src1", "src2"] * 5,
        }
    )
    pdf["n_chars"] = pdf["text"].map(
        lambda t: len(t) if t is not None else 0
    )
    return pdf


@pytest.fixture(scope="module")
def degen_docs_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("degen_docs")
    _degenerate_documents().to_parquet(
        os.path.join(d, "documents.parquet")
    )
    return str(d)


@pytest.fixture(scope="module")
def degen_docs_duck(degen_docs_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{degen_docs_dir}/documents.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_degenerate_documents_parity(
    name, spark, degen_docs_dir, degen_docs_duck
):
    import __spark_entry__ as entry

    qs = {**entry.queries(), **entry.extra_queries()}
    os_ = {**entry.oracle_sql(), **entry.extra_oracle_sql()}
    sdf = _normalize(qs[name](spark, degen_docs_dir).toPandas())
    odf = _normalize(degen_docs_duck.execute(os_[name]).fetchdf())
    assert len(sdf) == len(odf), (name, len(sdf), len(odf))
    assert list(sdf.columns) == list(odf.columns), name
    assert _values_match(sdf, odf), f"{name}: degenerate-shape mismatch"


# ---- embeddings-table ANN family -----------------------------------

EMB_QUERIES = [
    # the first four ANSI-crashed on a zero-magnitude vector before
    # the r9 _drop_zero_vectors guard (cosine undefined -> skip)
    "ann_topk",
    "ann_ivf",
    "ann_lsh_pairs",
    "knn_label_noise",
    "cosine_pairs",
    "embedding_covariance",
    "embedding_outliers",
    "embedding_stats",
    "cluster_curation",
]


def _degenerate_embeddings() -> pd.DataFrame:
    import random

    import numpy as np

    rng = random.Random(5)
    d = 64
    v1 = [round(rng.uniform(-0.3, 0.3), 4) for _ in range(d)]
    rows = [
        (0, [0.0] * d, 0),            # zero vector: no direction
        (1, v1, 1),
        (2, list(v1), 1),             # exact duplicate
        (3, [x + 0.0001 for x in v1], 0),  # near-duplicate
    ]
    for i in range(4, 20):
        rows.append(
            (
                i,
                [round(rng.uniform(-0.3, 0.3), 4) for _ in range(d)],
                i % 3,
            )
        )
    return pd.DataFrame(
        {
            "vec_id": [r[0] for r in rows],
            "embedding": [
                np.array(r[1], dtype=np.float32) for r in rows
            ],
            "label": [r[2] for r in rows],
        }
    )


@pytest.fixture(scope="module")
def degen_emb_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("degen_emb")
    _degenerate_embeddings().to_parquet(
        os.path.join(d, "embeddings.parquet")
    )
    return str(d)


@pytest.fixture(scope="module")
def degen_emb_duck(degen_emb_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{degen_emb_dir}/embeddings.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", EMB_QUERIES)
def test_degenerate_embeddings_parity(
    name, spark, degen_emb_dir, degen_emb_duck, monkeypatch
):
    import __spark_entry__ as entry

    # the ivf oracle trains its quantizer from the oracle-side parquet
    # (shared model state, like a hyperparameter) — point it at the
    # SAME degenerate table the Spark side reads
    monkeypatch.setenv("SPARK_GRAFT_ORACLE_SF_DIR", degen_emb_dir)
    qs = {**entry.queries(), **entry.extra_queries()}
    os_ = {**entry.oracle_sql(), **entry.extra_oracle_sql()}
    if name not in os_:
        pytest.skip(f"{name}: rows-only oracle in this environment")
    sdf = _normalize(qs[name](spark, degen_emb_dir).toPandas())
    odf = _normalize(degen_emb_duck.execute(os_[name]).fetchdf())
    assert len(sdf) == len(odf), (name, len(sdf), len(odf))
    assert list(sdf.columns) == list(odf.columns), name
    assert _values_match(sdf, odf), f"{name}: degenerate-shape mismatch"


# ---- TPC-H business family -----------------------------------------


def _degenerate_tpch(d: str) -> None:
    """Zero quantities/prices, a 100% discount, an order with no
    lineitems, a customer with no orders, a negative balance — the
    join/aggregate edges standard SQL fixtures never contain."""
    D = datetime.date
    pd.DataFrame(
        [
            (1, 1, 1, 1, 0.0, 0.0, 0.0, 0.0, "A", "F", D(1994, 1, 1)),
            (1, 2, 1, 2, 5.0, 100.0, 1.0, 0.1, "A", "F", D(1994, 2, 1)),
            (2, 1, 1, 1, 3.0, 50.0, 0.05, 0.0, "N", "O", D(1995, 6, 1)),
            (3, 1, 1, 1, 7.0, 70.0, 0.0, 0.08, "R", "F", D(1993, 12, 31)),
        ],
        columns=(
            "l_orderkey l_partkey l_suppkey l_linenumber l_quantity "
            "l_extendedprice l_discount l_tax l_returnflag "
            "l_linestatus l_shipdate"
        ).split(),
    ).to_parquet(os.path.join(d, "lineitem.parquet"))
    pd.DataFrame(
        [
            (1, 10, "F", 100.0, D(1994, 1, 1), "1-URGENT"),
            (2, 10, "O", 50.0, D(1995, 5, 1), "2-HIGH"),
            (3, 11, "F", 70.0, D(1993, 12, 1), "3-MEDIUM"),
            (4, 12, "F", 999.0, D(1994, 3, 1), "1-URGENT"),
        ],
        columns=(
            "o_orderkey o_custkey o_orderstatus o_totalprice "
            "o_orderdate o_orderpriority"
        ).split(),
    ).to_parquet(os.path.join(d, "orders.parquet"))
    pd.DataFrame(
        [
            (10, "Customer#10", 1, 0.0, "BUILDING"),
            (11, "Customer#11", 2, -5.5, "AUTOMOBILE"),
            (12, "Customer#12", 1, 10.0, "BUILDING"),
            (13, "Customer#13", 3, 1.0, "MACHINERY"),
        ],
        columns="c_custkey c_name c_nationkey c_acctbal c_mktsegment".split(),
    ).to_parquet(os.path.join(d, "customer.parquet"))


@pytest.fixture(scope="module")
def degen_tpch_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("degen_tpch"))
    _degenerate_tpch(d)
    return d


@pytest.fixture(scope="module")
def degen_tpch_duck(degen_tpch_dir):
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{degen_tpch_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", ["tpch_q1", "top_revenue_orders"])
def test_degenerate_tpch_parity(
    name, spark, degen_tpch_dir, degen_tpch_duck
):
    import __spark_entry__ as entry

    qs = {**entry.queries(), **entry.extra_queries()}
    os_ = {**entry.oracle_sql(), **entry.extra_oracle_sql()}
    sdf = _normalize(qs[name](spark, degen_tpch_dir).toPandas())
    odf = _normalize(degen_tpch_duck.execute(os_[name]).fetchdf())
    assert len(sdf) == len(odf), (name, len(sdf), len(odf))
    assert list(sdf.columns) == list(odf.columns), name
    assert _values_match(sdf, odf), f"{name}: degenerate-shape mismatch"
