"""WordPiece tokenizer tests: likelihood merge rule (exact rationals),
continuation-symbol convention, MaxMatch encode with whole-word [UNK],
layout invariance, and agreement with a hand-computed training run."""

import pytest
from pyspark.sql import functions as F

from ztdf_spark import wordpiece
from ztdf_spark.wordpiece import UNK, _merge_token, maxmatch

DOCS_DDL = "doc_id long, text string"


def test_merge_token_continuation_convention():
    assert _merge_token("a", "##b") == "ab"
    assert _merge_token("##a", "##b") == "##ab"
    assert _merge_token("a", "b") == "ab"  # degenerate (never produced)


def test_maxmatch_longest_first_and_unk():
    vocab = {"u", "##n", "un", "##able", "##a", "able", "##ble", "b"}
    # longest-first: "un" beats "u"; then "##able" beats "##a"
    assert maxmatch("unable", vocab, 6) == ["un", "##able"]
    # word-initial piece must be bare: "able" itself starts with 'a'∉vocab
    # bare? 'able' IS in vocab → single token
    assert maxmatch("able", vocab, 6) == ["able"]
    # unmatchable position → whole word is [UNK], not partial output
    assert maxmatch("unqble", vocab, 6) == [UNK]
    assert maxmatch("xyz", vocab, 6) == [UNK]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    stems = ["walk", "talk", "jump", "look"]
    sufs = ["ing", "ed", "er", "s"]
    i = 0
    for _rep in range(5):
        for s in stems:
            for u in sufs:
                rows.append((i, f"{s}{u} {s} the a"))
                i += 1
    return spark.createDataFrame(rows, DOCS_DDL)


def test_train_alphabet_then_likelihood_merges(spark, corpus):
    vocab = wordpiece.wordpiece_train(corpus, vocab_size=48)
    # alphabet prefix: every bare/## character symbol of the corpus,
    # sorted ascending, before any multi-char merge token
    chars = sorted(set("walktingjumpedlookser the".replace(" ", "")))
    n_alpha = 0
    for p in vocab:
        body = p[2:] if p.startswith("##") else p
        if len(body) == 1:
            n_alpha += 1
        else:
            break
    alpha = vocab[:n_alpha]
    assert alpha == sorted(alpha)
    assert set(c for c in chars) <= {p[2:] if p.startswith("##") else p for p in alpha}
    # merges exist and each is a fusion of earlier material
    assert len(vocab) > n_alpha
    assert len(vocab) <= 48
    assert all(len(p[2:] if p.startswith("##") else p) > 1 for p in vocab[n_alpha:])


def test_train_matches_independent_fraction_trainer(spark, corpus):
    """End-to-end agreement with a from-scratch Counter+Fraction trainer
    (the check_oracles.py mechanism, restated locally on the fixture)."""
    from collections import Counter
    from fractions import Fraction

    rows = corpus.select("text").collect()
    wf = Counter()
    for r in rows:
        for w in str(r["text"]).lower().split(" "):
            if w:
                wf[w] += 1
    syms = {w: [w[0]] + ["##" + c for c in w[1:]] for w in wf}
    vocab = sorted({s for w in wf for s in syms[w]})
    have = set(vocab)
    while len(vocab) < 48:
        pc, sc = Counter(), Counter()
        for w, f in wf.items():
            s = syms[w]
            for sym in s:
                sc[sym] += f
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        best = None
        for (l, r), c in pc.items():
            if c < 2:
                continue
            score = Fraction(c, sc[l] * sc[r])
            if best is None or score > best[0] or (
                score == best[0] and (l, r) < best[1]
            ):
                best = (score, (l, r))
        if best is None:
            break
        l, r = best[1]
        token = l + (r[2:] if r.startswith("##") else r)
        if token not in have:
            vocab.append(token)
            have.add(token)
        for w in syms:
            out = []
            for s in syms[w]:
                if out and out[-1] == l and s == r:
                    out[-1] = token
                else:
                    out.append(s)
            syms[w] = out

    assert wordpiece.wordpiece_train(corpus, vocab_size=48) == vocab


def test_train_is_layout_invariant(spark, corpus):
    v1 = wordpiece.wordpiece_train(corpus.coalesce(1), vocab_size=40)
    v2 = wordpiece.wordpiece_train(corpus.repartition(13), vocab_size=40)
    assert v1 == v2


def test_encode_counts_and_unk(spark, corpus):
    vocab = wordpiece.wordpiece_train(corpus, vocab_size=48)
    docs = spark.createDataFrame(
        [(0, "walking walked"), (1, "walking zzz&zzz")], DOCS_DDL
    )
    out = {r["doc_id"]: r for r in wordpiece.wordpiece_encode(docs, vocab).collect()}
    vset = set(vocab)
    max_len = max(len(p) for p in vocab)
    exp0 = maxmatch("walking", vset, max_len) + maxmatch("walked", vset, max_len)
    assert out[0]["n_tokens"] == len(exp0)
    assert out[0]["n_unk"] == 0
    # '&' is outside the corpus alphabet → that word is one [UNK]
    assert out[1]["n_unk"] == 1
    assert out[1]["n_tokens"] == len(maxmatch("walking", vset, max_len)) + 1


def test_encode_is_deterministic_across_layouts(spark, corpus):
    vocab = wordpiece.wordpiece_train(corpus, vocab_size=48)
    a = wordpiece.wordpiece_encode(corpus.coalesce(1), vocab).orderBy("doc_id").collect()
    b = wordpiece.wordpiece_encode(corpus.repartition(7), vocab).orderBy("doc_id").collect()
    assert a == b


def test_wordpiece_driver_and_distributed_paths_identical(spark, corpus):
    """The size-gated driver fast path must reproduce the distributed
    likelihood-merge loop bit-for-bit (exact rational argmax, same ties)."""
    from ztdf_spark import wordpiece

    base = spark.conf.get("spark.ztdf.trainDriverMaxWords", "200000")
    try:
        spark.conf.set("spark.ztdf.trainDriverMaxWords", "200000")
        fast = wordpiece.wordpiece_train(corpus, 48)
        spark.conf.set("spark.ztdf.trainDriverMaxWords", "0")
        slow = wordpiece.wordpiece_train(corpus, 48)
    finally:
        spark.conf.set("spark.ztdf.trainDriverMaxWords", base)
    assert fast == slow and len(fast) == 48
