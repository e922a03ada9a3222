"""pack_token_ids: exact concat-and-cut semantics, boundary docs,
partial-tail handling, layout independence, and composition with the
learned BPE encoder."""

import pytest
from pyspark.sql import functions as F

from carbon_clickhouse_spark.datapipe import bpe
from carbon_clickhouse_spark.datapipe.pack import pack_token_ids


def _pandas(df):
    return {
        (r["shard"], r["seq_id"]): list(r["token_ids"])
        for r in df.collect()
    }


def _reference_pack(docs, seq_len, eos):
    """Driver-side oracle: literal concat then cut."""
    stream = []
    for _, ids in sorted(docs):
        stream.extend(ids + [eos])
    return [
        stream[i : i + seq_len]
        for i in range(0, len(stream) - seq_len + 1, seq_len)
    ]


def test_exact_cut_matches_reference(spark):
    docs = [("d1", [1, 2, 3]), ("d2", [4]), ("d3", [5, 6, 7, 8, 9])]
    df = spark.createDataFrame(
        [(i, "s", ids) for i, ids in docs],
        "doc_id string, source string, bpe_ids array<int>",
    )
    got = _pandas(pack_token_ids(df, seq_len=4, eos_id=0))
    want = _reference_pack(docs, 4, 0)
    assert [got[("s", i)] for i in range(len(want))] == want
    # every complete sequence is exactly seq_len
    assert all(len(v) == 4 for v in got.values())


def test_doc_spanning_many_sequences(spark):
    # one long doc crosses 3 sequence boundaries
    long = list(range(1, 11))  # 10 ids + eos = 11 tokens
    df = spark.createDataFrame(
        [("a", "s", long), ("b", "s", [99])],
        "doc_id string, source string, bpe_ids array<int>",
    )
    got = _pandas(pack_token_ids(df, seq_len=3, eos_id=0))
    want = _reference_pack([("a", long), ("b", [99])], 3, 0)
    assert [got[("s", i)] for i in range(len(want))] == want


def test_partial_tail(spark):
    df = spark.createDataFrame(
        [("a", "s", [1, 2])],
        "doc_id string, source string, bpe_ids array<int>",
    )
    assert _pandas(pack_token_ids(df, seq_len=4, eos_id=0)) == {}
    kept = _pandas(pack_token_ids(df, seq_len=4, eos_id=0, keep_partial=True))
    assert kept == {("s", 0): [1, 2, 0]}


def test_shards_are_independent(spark):
    df = spark.createDataFrame(
        [("a", "s1", [1, 2, 3]), ("b", "s2", [4, 5, 6])],
        "doc_id string, source string, bpe_ids array<int>",
    )
    got = _pandas(pack_token_ids(df, seq_len=4, eos_id=0))
    assert got == {("s1", 0): [1, 2, 3, 0], ("s2", 0): [4, 5, 6, 0]}


def test_layout_independent(spark):
    rows = [(f"d{i:03d}", "s", [i, i + 1, i + 2]) for i in range(40)]
    df = spark.createDataFrame(
        rows, "doc_id string, source string, bpe_ids array<int>"
    )
    a = _pandas(pack_token_ids(df, seq_len=7, eos_id=-9))
    b = _pandas(pack_token_ids(df.repartition(11), seq_len=7, eos_id=-9))
    assert a == b and len(a) == (40 * 4) // 7


def test_null_ids_pack_as_bare_separator(spark):
    df = spark.createDataFrame(
        [("a", "s", [1, 2, 3]), ("b", "s", None), ("c", "s", [4, 5])],
        "doc_id string, source string, bpe_ids array<int>",
    )
    got = _pandas(pack_token_ids(df, seq_len=4, eos_id=0))
    # stream: 1 2 3 0 | 0 4 5 0  (null doc contributes just its eos)
    assert got == {("s", 0): [1, 2, 3, 0], ("s", 1): [0, 4, 5, 0]}


def test_rejects_bad_seq_len(spark):
    df = spark.createDataFrame(
        [("a", "s", [1])], "doc_id string, source string, bpe_ids array<int>"
    )
    with pytest.raises(ValueError):
        pack_token_ids(df, seq_len=0, eos_id=0)


def test_composes_with_bpe_encode(spark):
    corpus = spark.createDataFrame(
        [(f"d{i}", "web", "low lower newest widest") for i in range(6)],
        "doc_id string, source string, text string",
    )
    model = bpe.train_bpe(corpus, vocab_size=40)
    enc = bpe.bpe_encode(corpus, model)
    eos = len(model.vocab)  # reserved id just past the vocab
    packed = pack_token_ids(enc, seq_len=8, eos_id=eos)
    rows = packed.collect()
    assert rows and all(len(r["token_ids"]) == 8 for r in rows)
    # total packed tokens == floor(total stream / seq_len) * seq_len
    total = enc.select(F.sum(F.size("bpe_ids") + 1)).first()[0]
    assert len(rows) == total // 8
    # the packed output IS the literal concat-and-cut of the encoded
    # docs in doc_id order: rebuild the stream driver-side and compare
    stream = []
    for r in sorted(enc.collect(), key=lambda r: r["doc_id"]):
        stream.extend(list(r["bpe_ids"]) + [eos])
    want = [stream[i : i + 8] for i in range(0, (total // 8) * 8, 8)]
    got = [
        list(r["token_ids"])
        for r in sorted(rows, key=lambda r: r["seq_id"])
    ]
    assert got == want
