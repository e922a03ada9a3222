"""Property-based BPE invariants: any unicode corpus trains without
error and every encode — training words or not — concatenates back to
exactly its pre-token stream. Driver-side (``encode_word``) so
hypothesis can shrink without paying a Spark job per example; the
distributed ``bpe_encode`` path shares the same function and is
covered by test_bpe."""

import re

from hypothesis import given, settings, strategies as st

from carbon_clickhouse_spark.datapipe import bpe
from carbon_clickhouse_spark.datapipe.text import BPE_TOKEN_RE

TOKEN_RE = re.compile(BPE_TOKEN_RE)

# words over a small alphabet force heavy pair sharing (the
# interesting merge interactions); the unicode block checks alphabet
# handling beyond ASCII
WORD = st.text("abcdeλд0", min_size=1, max_size=12)


def _train(words_freqs):
    """Driver-side trainer over a literal word table (no Spark):
    mirrors train_bpe's loop via its public helpers."""
    # reuse the real trainer through a local DataFrame-free path:
    # build the same structures train_bpe builds after collect()
    import carbon_clickhouse_spark.datapipe.bpe as m

    freqs = dict(words_freqs)
    word_syms = {w: list(w) + [m.WORD_END] for w in freqs}
    alphabet = sorted({s for syms in word_syms.values() for s in syms})
    vocab = {s: i for i, s in enumerate(alphabet)}
    counts = m._pair_counts(word_syms, freqs)
    merges = []
    while len(vocab) < len(alphabet) + 50 and counts:
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < 1:
            break
        merges.append(best)
        vocab.setdefault(best[0] + best[1], len(vocab))
        for w, syms in list(word_syms.items()):
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            word_syms[w] = out
        counts = m._pair_counts(word_syms, freqs)
    return merges, vocab, word_syms


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(WORD, st.integers(1, 9)), min_size=1, max_size=12
    )
)
def test_incremental_trainer_matches_full_recount(pairs):
    """train_bpe's incremental pair maintenance must equal the naive
    recount-everything trainer, merge for merge."""
    freqs: dict[str, int] = {}
    for w, f in pairs:
        freqs[w] = freqs.get(w, 0) + f
    ref_merges, _, ref_syms = _train(freqs.items())

    # run the real incremental loop on the same table via a stub of
    # the collect step
    import carbon_clickhouse_spark.datapipe.bpe as m

    class FakeDF:
        def collect(self_inner):
            return [{"word": w, "freq": f} for w, f in freqs.items()]

    orig = m.word_frequencies
    m.word_frequencies = lambda *a, **k: FakeDF()
    try:
        model = m.train_bpe(None, vocab_size=10**9)
    finally:
        m.word_frequencies = orig
    # full run to exhaustion on both sides: identical merge sequences
    assert model.merges[: len(ref_merges)] == ref_merges

    # and encode round-trips every training word
    ranks = model.ranks
    for w in freqs:
        assert "".join(m.encode_word(w, ranks)) == w + m.WORD_END


@settings(max_examples=60, deadline=None)
@given(st.text(min_size=0, max_size=200))
def test_encode_round_trips_arbitrary_text(text):
    """encode over a fixed tokenizer reconstructs the pre-token stream
    for ANY input text, including symbols never seen in training."""
    model_words = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    import carbon_clickhouse_spark.datapipe.bpe as m

    class FakeDF:
        def collect(self_inner):
            return [{"word": w, "freq": f} for w, f in model_words.items()]

    orig = m.word_frequencies
    m.word_frequencies = lambda *a, **k: FakeDF()
    try:
        model = m.train_bpe(None, vocab_size=40)
    finally:
        m.word_frequencies = orig
    ranks = model.ranks
    toks = []
    for w in TOKEN_RE.findall(text):
        toks.extend(m.encode_word(w, ranks))
    joined = "".join(toks).replace(m.WORD_END, "")
    assert joined == "".join(TOKEN_RE.findall(text))
