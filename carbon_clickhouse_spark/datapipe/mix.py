"""Deterministic multi-source corpus mixing: give each source a target
weight in the training mixture and materialize the mixed corpus,
upsampling (full repeats + a fractional slice) or downsampling as the
weight demands — the mixture-construction step of DoReMi-style recipes
(Xie et al. 2023, arXiv:2305.10429: the weights themselves come from a
proxy run or DSIR; this operator APPLIES a weight vector at corpus
scale).

Everything is hash-deterministic, never ``rand()``:

- the sampling unit is ``hash_bucket(doc_id)`` (md5-derived, engine
  portable) so a 60% slice of a source is the same 60% on any
  cluster, any partitioning, any rerun;
- upsampled copies carry an ``epoch`` column stamped into the copy
  (epoch 0 = the full corpus, epoch k = the k-th repeat), and the
  companion ``pack.deterministic_shuffle`` keyed on (doc_id, epoch)
  spreads repeats through the training order instead of clumping
  them;
- token accounting is one aggregation over ``tok_col``; the target
  is proportional allocation over the summed weights.

Scale shape: one groupBy(source) count, then per-source unions of
filtered scans — no joins, no shuffle beyond the final optional
shuffle/pack stage. At 100 TB each union leg is an independent
column-pruned scan; Spark unions are plan-level (no materialization).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from .pack import hash_bucket

#: sampling granularity: weight rates resolve to 1/10000ths
_BUCKETS = 10_000


def source_token_counts(
    df: DataFrame, tok_col: str = "n_tokens", source_col: str = "source"
) -> dict[str, int]:
    """Available tokens per source (one aggregation)."""
    rows = (
        df.groupBy(source_col)
        .agg(F.sum(F.col(tok_col).cast("long")).alias("t"))
        .collect()
    )
    return {r[source_col]: int(r["t"] or 0) for r in rows}


def temperature_weights(
    available: dict[str, int], alpha: float = 0.3
) -> dict[str, float]:
    """Temperature/alpha-sampling weights from raw source sizes: the
    standard multilingual rebalancing (exponentiate-and-renormalize,
    ``p_i ~ n_i^alpha``, as popularized by multilingual BERT and
    XLM-R, Conneau et al. 2020 §3). ``alpha=1`` reproduces natural
    proportions; ``alpha -> 0`` approaches uniform, upweighting
    low-resource sources. Feed the result straight to
    :func:`mixture_plan` / :func:`mix_sources` — with ``alpha < 1``
    the plan upsamples small sources (rates > 1, epoch repeats) and
    downsamples large ones, which is exactly the intended effect.

    Pure driver-side arithmetic over the bounded per-source count
    dict; deterministic by construction."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError("alpha must be in [0, 1]")
    pos = {s: n for s, n in available.items() if n > 0}
    if not pos:
        raise ValueError("no source has any tokens")
    raw = {s: float(n) ** alpha for s, n in pos.items()}
    z = sum(raw.values())
    out = {s: raw[s] / z for s in sorted(pos)}
    out.update({s: 0.0 for s in available if s not in pos})
    return out


def mixture_plan(
    available: dict[str, int],
    weights: dict[str, float],
    total_tokens: int | None = None,
) -> dict[str, float]:
    """Per-source sampling RATE (tokens wanted / tokens available).

    ``total_tokens`` None sizes the mixture to the LARGEST total that
    needs no upsampling (every rate <= 1): the binding source is the
    one whose weight share exhausts first. Rates above 1 mean
    repeats: 2.5 = two full copies + a 50% slice.
    """
    unknown = set(weights) - set(available)
    if unknown:
        # loud, not fatal: a typo'd --mix key and a configured source
        # that yielded zero rows this run (fully filtered upstream)
        # are indistinguishable here — the tolerant semantics for the
        # latter must survive (an empty source contributes nothing),
        # so the former gets a warning an operator can act on
        import logging

        logging.getLogger(__name__).warning(
            "mixture weights name sources absent from the data "
            "(typo, or a source filtered to zero rows?): %s "
            "(available: %s) — they contribute nothing",
            ", ".join(sorted(unknown)),
            # a NULL source (real data, never nameable in weights)
            # must not break the sort
            ", ".join(sorted(str(s) for s in available)) or "none",
        )
    w = {s: weights.get(s, 0.0) for s in available}
    wsum = sum(w.values())
    if wsum <= 0:
        raise ValueError("at least one source needs a positive weight")
    if total_tokens is None:
        binding = [
            int(available[s] * wsum / w[s])
            for s in available
            if w[s] > 0 and available[s] > 0
        ]
        if not binding:
            raise ValueError(
                "no weighted source has any tokens to sample"
            )
        # a weighted-but-empty source can't bind the total (it would
        # zero the whole mixture); it simply contributes nothing
        total_tokens = min(binding)
    return {
        s: (w[s] / wsum * total_tokens / available[s])
        if w[s] > 0 and available[s] > 0
        else 0.0
        for s in available
    }


def mix_sources(
    df: DataFrame,
    weights: dict[str, float],
    total_tokens: int | None = None,
    tok_col: str = "n_tokens",
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Materialize the weighted mixture: rows from each source at its
    planned rate, with an ``epoch`` column distinguishing repeats.

    Documents, not tokens, are the sampling unit (standard practice —
    token-exact trimming happens downstream in ``pack``); the
    realized token share converges to the plan by the law of large
    numbers over md5 buckets. Sources with zero weight drop. An EMPTY
    corpus yields an empty mixture (the tolerant extension of 'an
    empty source contributes nothing' to every source — r11
    empty-input probe; previously a misleading ValueError)."""
    available = source_token_counts(df, tok_col, source_col)
    if not available:
        return df.withColumn("epoch", F.lit(0)).limit(0)
    rates = mixture_plan(available, weights, total_tokens)

    # per-source hash in [0, _BUCKETS): fraction f keeps buckets
    # < f*_BUCKETS; the seed and epoch shift the bucketing so repeat
    # slices and reruns are deterministic but epoch-decorrelated
    def bucket(epoch: int):
        return hash_bucket(
            F.concat_ws(
                "\x1f",
                F.col(id_col).cast("string"),
                F.lit(str(seed)),
                F.lit(str(epoch)),
            ),
            _BUCKETS,
        )

    legs = []
    # None-safe sort: a NULL source group gets rate 0.0 (it can never
    # be named in weights) and is skipped below, but it must not crash
    # the ordering (r11 probe)
    for s, rate in sorted(
        rates.items(), key=lambda kv: (kv[0] is None, kv[0] or "")
    ):
        if rate <= 0:
            continue
        src = df.filter(F.col(source_col) == s)
        full, frac = int(math.floor(rate)), rate - math.floor(rate)
        for e in range(full):
            legs.append(src.withColumn("epoch", F.lit(e)))
        if frac > 1e-9:
            # half-UP cutoff (floor(x+0.5)), not Python's banker's
            # round: engine-reproducible — SQL round() on positives is
            # half-up, so an external engine keeps the same buckets
            # even when frac*_BUCKETS lands exactly on .5
            legs.append(
                src.filter(
                    bucket(full) < int(math.floor(frac * _BUCKETS + 0.5))
                ).withColumn("epoch", F.lit(full))
            )
    if not legs:
        raise ValueError("mixture is empty: no source had a positive rate")
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out
