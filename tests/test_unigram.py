"""Unigram-LM tokenizer tests: exact-rational Viterbi semantics, coverage,
EM shrink schedule, layout invariance, encode round-trip and unk fallback."""

import pytest
from pyspark.sql import functions as F

from ztdf_spark import unigram
from ztdf_spark.unigram import UNK, _segment_or_unk, _viterbi

DOCS_DDL = "doc_id long, text string"


def test_viterbi_prefers_probable_pieces():
    # "abc": pieces ab(6)·c(2) vs a(2)·bc(6) vs a(2)·b(2)·c(2); total=18
    counts = {"a": 2, "b": 2, "c": 2, "ab": 6, "bc": 6}
    total = sum(counts.values())
    # ab·c = 12 = a·bc — exact tie at k=2 → the ascending-i first-win rule
    # keeps the SMALLEST split position (longest last piece): ("a","bc")
    assert _viterbi("abc", counts, total, 6) == ["a", "bc"]
    counts["ab"] = 7  # ab·c = 14 > a·bc = 12 — now ("ab","c") wins strictly
    total = sum(counts.values())
    assert _viterbi("abc", counts, total, 6) == ["ab", "c"]


def test_viterbi_exact_tie_and_strict_wins():
    # "aa" with explicit totals: score("aa") = c_aa/t, score("a","a") = c_a²/t²
    # t=8, c_a=4, c_aa=2: 2/8 == 16/64 — an EXACT rational tie; the
    # single-piece path (k=1, first in ascending-i order) must hold
    assert _viterbi("aa", {"a": 4, "aa": 2}, 8, 6) == ["aa"]
    # t=6, c_a=4, c_aa=2: 2/6 < 16/36 — the split now wins STRICTLY
    assert _viterbi("aa", {"a": 4, "aa": 2}, 6, 6) == ["a", "a"]
    # t=6, c_a=2, c_aa=4: 4/6 > 4/36 — the single piece wins strictly
    assert _viterbi("aa", {"a": 2, "aa": 4}, 6, 6) == ["aa"]


def test_unk_fallback_per_uncovered_char():
    counts = {"a": 3, "b": 3, "ab": 5}
    total = 11
    assert _segment_or_unk("axb", counts, total, 6) == ["a", UNK, "b"]
    assert _segment_or_unk("xy", counts, total, 6) == [UNK, UNK]
    assert _segment_or_unk("ab", counts, total, 6) == ["ab"]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    # repetitive morphology: 'walking walked walker talking talked ...'
    stems = ["walk", "talk", "jump", "look"]
    sufs = ["ing", "ed", "er", "s"]
    i = 0
    for _rep in range(5):
        for s in stems:
            for u in sufs:
                rows.append((i, f"{s}{u} {s} the a"))
                i += 1
    return spark.createDataFrame(rows, DOCS_DDL)


def test_train_coverage_and_size(spark, corpus):
    vocab = unigram.unigram_train(corpus, vocab_size=24, seed_size=64, max_piece_len=4)
    pieces = {p for p, _ in vocab}
    # every character of the sample corpus is covered
    chars = set("".join(p for p, _ in vocab if len(p) == 1))
    for ch in "walktingjumpedlookser the":
        if ch != " ":
            assert ch in chars
    # morphological units should surface as multi-char pieces
    assert any(len(p) > 1 for p in pieces)
    # counts positive, order is (cnt desc, piece asc)
    cs = [(c, p) for p, c in vocab]
    assert all(c > 0 for c, _ in cs)
    assert cs == sorted(cs, key=lambda t: (-t[0], t[1]))


def test_train_is_layout_invariant(spark, corpus):
    kw = dict(vocab_size=24, seed_size=64, max_piece_len=4)
    v1 = unigram.unigram_train(corpus.coalesce(1), **kw)
    v2 = unigram.unigram_train(corpus.repartition(13), **kw)
    assert v1 == v2


def test_encode_roundtrip_and_unk(spark, corpus):
    vocab = unigram.unigram_train(corpus, vocab_size=24, seed_size=64, max_piece_len=4)
    test = spark.createDataFrame(
        [(1000, "walking looked"), (1001, "walk@ed")], DOCS_DDL
    )
    got = {r["doc_id"]: r["pieces"] for r in unigram.unigram_encode(
        test, vocab, max_piece_len=4).collect()}
    # concatenating pieces reproduces each covered word exactly
    assert "".join(got[1000]) == "walkinglooked"
    # '@' was never in the corpus → exactly one unk, surrounding runs kept
    assert got[1001].count(UNK) == 1
    assert "".join(p for p in got[1001] if p != UNK) == "walked"


def test_vocab_df_shape(spark, corpus):
    df = unigram.unigram_vocab_df(corpus, vocab_size=24, seed_size=64, max_piece_len=4)
    rows = df.collect()
    assert [r["rank"] for r in rows] == list(range(len(rows)))
    assert df.columns == ["rank", "piece", "cnt"]


def test_unigram_driver_and_distributed_paths_identical(spark):
    """The size-gated driver fast path must reproduce the distributed
    hard-EM loop bit-for-bit (same seed order, Viterbi, usage sums)."""
    import numpy as np

    from ztdf_spark import unigram

    rng = np.random.default_rng(5)
    stems = ["walking", "talked", "jumper", "looks", "the", "a", "of"]
    texts = [" ".join(rng.choice(stems, size=rng.integers(2, 8))) for _ in range(70)]
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    base = spark.conf.get("spark.ztdf.unigramDriverMaxWords", "4096")
    try:
        spark.conf.set("spark.ztdf.unigramDriverMaxWords", "4096")
        fast = unigram.unigram_train(docs, 48)
        spark.conf.set("spark.ztdf.unigramDriverMaxWords", "0")
        slow = unigram.unigram_train(docs, 48)
    finally:
        spark.conf.set("spark.ztdf.unigramDriverMaxWords", base)
    assert fast == slow and len(fast) >= 20
