"""External pin for the unigram EM TRAINER (datapipe/unigram.py) —
the r8 verdict's one remaining internally-validated family. Two
independent replays, neither sharing a line of code with the engine:

1. the SEED stage replayed in DuckDB SQL (substring explosion, freq
   aggregation, (freq desc, piece asc) top-k, char union) — exact
   integer equality with ``seed_pieces``;
2. the ENTIRE training loop (seed -> EM iterations -> prune rounds ->
   final EM) replayed in exact 60-digit ``decimal`` arithmetic in
   PROBABILITY domain — the engine works in log domain with
   log-sum-exp and decimal-quantized M-step sums, so agreement to
   1e-7 on every trained piece probability (and the piece SET
   exactly) means the algorithm matches Kudo 2018 §3.2 as
   implemented, not that two copies of one bug agree. A subtly
   divergent trainer (wrong lattice bounds, missing freq weighting,
   wrong prune margin, wrong normalization) lands orders of
   magnitude outside that envelope.
"""

import math
from decimal import Decimal, getcontext

import duckdb

# 60 significant digits: not exact rationals (Fraction denominators
# compound exponentially across EM iterations and stall the test),
# but ~53 digits beyond the 1e-7 agreement envelope — any algorithmic
# divergence still lands orders of magnitude outside it
getcontext().prec = 60

from carbon_clickhouse_spark.datapipe.unigram import (
    _MAX_PIECE_LEN_HARD,
    seed_pieces,
    train_unigram,
)

# fixture: integer freqs, rich substring overlap so EM + prune both
# have real work; small enough that one prune round reaches the target
WORDS = [
    ("hello", 10),
    ("help", 7),
    ("hell", 5),
    ("world", 5),
    ("word", 4),
    ("low", 6),
    ("lower", 3),
    ("lowest", 2),
]
MAX_PIECE_LEN = 4
SEED_SIZE = 20
VOCAB_SIZE = 18
EM_ITERS = 2
SHRINK = 0.75


def _ref_seed():
    """Integer-domain seed: replicates seed_pieces' contract from
    the docstring alone (all substrings <= max len, freq-weighted,
    chars + top-k multi by (freq desc, piece asc))."""
    counts: dict[str, int] = {}
    for w, f in WORDS:
        n = len(w)
        for s in range(n):
            for ln in range(1, min(MAX_PIECE_LEN, n - s) + 1):
                p = w[s : s + ln]
                counts[p] = counts.get(p, 0) + f
    chars = {p: c for p, c in counts.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )[:SEED_SIZE]
    return {**chars, **dict(multi)}


def _ref_e_step(words, probs):
    """High-precision E-step: lattice forward/backward in probability
    domain, expected counts freq * alpha_j * p * beta_i / Z."""
    acc: dict[str, Decimal] = {}
    ll_terms = []  # (freq, Z) pairs; LL = sum freq*ln(Z) checked in float
    for w, f in words:
        n = len(w)
        alpha = [Decimal(0)] * (n + 1)
        alpha[0] = Decimal(1)
        for i in range(1, n + 1):
            tot = Decimal(0)
            for j in range(max(0, i - _MAX_PIECE_LEN_HARD), i):
                p = probs.get(w[j:i])
                if p is not None:
                    tot += alpha[j] * p
            alpha[i] = tot
        if alpha[n] == 0:
            continue
        beta = [Decimal(0)] * (n + 1)
        beta[n] = Decimal(1)
        for j in range(n - 1, -1, -1):
            tot = Decimal(0)
            for i in range(j + 1, min(n, j + _MAX_PIECE_LEN_HARD) + 1):
                p = probs.get(w[j:i])
                if p is not None:
                    tot += beta[i] * p
            beta[j] = tot
        z = alpha[n]
        ll_terms.append((f, z))
        for i in range(1, n + 1):
            for j in range(max(0, i - _MAX_PIECE_LEN_HARD), i):
                piece = w[j:i]
                p = probs.get(piece)
                if p is None:
                    continue
                e = alpha[j] * p * beta[i] / z * f
                if e:
                    acc[piece] = acc.get(piece, Decimal(0)) + e
    # the engine's documented M-step contract (unigram._Q): expected
    # counts quantize to 9 decimal places on the way into the
    # decimal(38,9) sum, so a piece whose corpus-wide expectation
    # rounds to zero is FALSY there (it draws the floor during EM and
    # drops in the final M-step) — mirror that, or the replay keeps
    # ~1e-20 ghosts the engine deliberately retires
    q = Decimal("1e-9")
    acc = {
        p: c.quantize(q)
        for p, c in acc.items()
        if c.quantize(q) != 0
    }
    return acc, ll_terms


def _ref_m_step(probs, counts):
    tot = sum(counts.values()) or Decimal(1)
    floor = Decimal(1) / 2 / tot
    return {
        p: (counts[p] / tot if counts.get(p) else floor) for p in probs
    }


def _ref_viterbi_excluding(word, probs, exclude):
    """Prune-probe Viterbi in probability domain: best product
    segmentation of `word` without using `exclude`; strict-greater
    replacement over ascending j mirrors the engine's tie rule."""
    n = len(word)
    best = [None] * (n + 1)
    back = [0] * (n + 1)
    best[0] = Decimal(1)
    for i in range(1, n + 1):
        for j in range(max(0, i - _MAX_PIECE_LEN_HARD), i):
            piece = word[j:i]
            if piece == exclude:
                continue
            p = probs.get(piece)
            if p is None or best[j] is None:
                continue
            cand = best[j] * p
            if best[i] is None or cand > best[i]:
                best[i], back[i] = cand, j
    if best[n] is None:
        return None
    return best[n]


def _ref_train():
    """The full training loop in 60-digit decimals, mirroring Kudo
    2018 §3.2 as train_unigram's docstring states it."""
    seed = _ref_seed()
    total = sum(seed.values())
    probs = {p: Decimal(c) / total for p, c in seed.items()}
    ll_runs = []
    while True:
        for _ in range(max(1, EM_ITERS)):
            counts, ll_terms = _ref_e_step(WORDS, probs)
            ll_runs.append(ll_terms)
            probs = _ref_m_step(probs, counts)
        multi = [p for p in probs if len(p) > 1]
        target = max(VOCAB_SIZE, int(len(probs) * SHRINK))
        if len(probs) <= VOCAB_SIZE:
            break
        losses = []
        for p in multi:
            alt = _ref_viterbi_excluding(p, probs, p)
            # margin ordering: logp - alt_lp <-> prob ratio; an
            # unsegmentable piece keeps rank-first (engine: -1e9)
            margin = None if alt is None else probs[p] / alt
            losses.append((margin, p))
        # margin desc (None = unsegmentable = +inf, first), piece asc
        # on ties — the engine's (-loss, piece) sort in ratio domain
        nonem = sorted(p for m, p in losses if m is None)
        withm = sorted(
            ((m, p) for m, p in losses if m is not None),
            key=lambda t: (-t[0], t[1]),
        )
        ordered = nonem + [p for _, p in withm]
        n_chars = len(probs) - len(multi)
        keep_multi = max(0, target - n_chars)
        kept = set(ordered[:keep_multi])
        new_probs = {
            p: pr for p, pr in probs.items() if len(p) == 1 or p in kept
        }
        if len(new_probs) == len(probs):
            break
        probs = new_probs
        if len(probs) <= VOCAB_SIZE:
            break
    counts, ll_terms = _ref_e_step(WORDS, probs)
    ll_runs.append(ll_terms)
    tot = sum(counts.values()) or Decimal(1)
    floor = Decimal(1) / 2 / tot
    final = {}
    for p in probs:
        c = counts.get(p)
        if c:
            final[p] = c / tot
        elif len(p) == 1:
            final[p] = floor
    return final, ll_runs


def _train_engine(spark):
    words = spark.createDataFrame(
        [(w, float(f)) for w, f in WORDS], "word string, freq double"
    )
    return train_unigram(
        words,
        vocab_size=VOCAB_SIZE,
        seed_size=SEED_SIZE,
        max_piece_len=MAX_PIECE_LEN,
        em_iters=EM_ITERS,
        shrink=SHRINK,
    )


def test_seed_stage_matches_duckdb_sql(spark):
    """seed_pieces replayed as plain SQL in another engine — exact
    integer equality, including the (freq desc, piece asc) top-k tie
    order and the char union."""
    words = spark.createDataFrame(
        [(w, float(f)) for w, f in WORDS], "word string, freq double"
    )
    got = {
        r["piece"]: int(r["freq"])
        for r in seed_pieces(
            words, seed_size=SEED_SIZE, max_piece_len=MAX_PIECE_LEN
        ).collect()
    }
    values = ", ".join(f"('{w}', {f})" for w, f in WORDS)
    sql = f"""
        WITH words(word, freq) AS (VALUES {values}),
        subs AS (
          SELECT substr(word, s + 1, l) AS piece, freq
          FROM words, range(0, 32) t(s), range(1, {MAX_PIECE_LEN + 1}) u(l)
          WHERE s < length(word) AND s + l <= length(word)
        ),
        counted AS (
          SELECT piece, CAST(sum(freq) AS BIGINT) AS f
          FROM subs GROUP BY piece
        ),
        chars AS (SELECT piece, f FROM counted WHERE length(piece) = 1),
        top AS (
          SELECT piece, f FROM counted WHERE length(piece) > 1
          ORDER BY f DESC, piece ASC LIMIT {SEED_SIZE}
        )
        SELECT piece, f FROM chars UNION ALL SELECT piece, f FROM top
    """
    want = {p: int(f) for p, f in duckdb.sql(sql).fetchall()}
    assert got == want


def test_trained_pieces_match_exact_rational_replay(spark):
    """The TRAINED model against the decimal replay: identical piece
    set, every probability within 1e-7 relative, and every recorded
    corpus log-likelihood within 1e-7 of sum(freq * ln(Z_ref))."""
    m = _train_engine(spark)
    want, ll_runs = _ref_train()

    assert set(m.log_probs) == set(want)
    for p, lp in m.log_probs.items():
        ref = float(want[p].ln())
        assert abs(lp - ref) <= 1e-7 * max(1.0, abs(ref)), (p, lp, ref)

    want_lls = [
        sum(f * float(z.ln()) for f, z in terms) for terms in ll_runs
    ]
    assert len(m.em_log_likelihoods) == len(want_lls)
    for got_ll, ref_ll in zip(m.em_log_likelihoods, want_lls):
        assert abs(got_ll - ref_ll) <= 1e-7 * max(1.0, abs(ref_ll))
