"""BPE trainer/encoder (ztdf_spark/bpeops.py): the Sennrich toy corpus
with hand-checkable merges, an independent collections.Counter oracle
over a random corpus, layout invariance, and early stopping."""

import hashlib
from collections import Counter

import numpy as np

from ztdf_spark import bpeops


def _py_train(texts, n_merges):
    """Independent reference trainer: Counter-based, same total order
    (count desc, pair asc)."""
    wf = Counter()
    for t in texts:
        for w in str(t).lower().split(" "):
            if w:
                wf[w] += 1
    syms = {w: list(w) + [bpeops.EOW] for w in wf}
    merges = []
    for rank in range(n_merges):
        pc = Counter()
        for w, f in wf.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        if cnt < 2:
            break
        merges.append((rank, left, right, left + right))
        for w in syms:
            out = []
            for s in syms[w]:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            syms[w] = out
    return merges


def test_bpe_sennrich_toy_corpus(spark):
    """The paper's worked example: 'es' -> 'est' -> 'est</w>' lead the
    merge list, and the UNSEEN word 'lowest' tokenizes as low + est</w>
    (the subword-generalization property BPE exists for)."""
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    merges = bpeops.bpe_train(docs, n_merges=6)
    assert [(m[1], m[2]) for m in merges[:3]] == [("e", "s"), ("es", "t"), ("est", "</w>")]
    assert bpeops.apply_merges("lowest", merges) == ["low", "est</w>"]


def test_bpe_train_matches_independent_oracle_and_layout_invariant(spark):
    rng = np.random.default_rng(5)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 12)))
        for _ in range(60)
    ]
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    merges = bpeops.bpe_train(docs, n_merges=12)
    assert merges == _py_train(texts, 12)
    # identical vocab under a different partition layout
    again = bpeops.bpe_train(docs.repartition(13), n_merges=12)
    assert again == merges


def test_bpe_encode_counts_and_digest(spark):
    texts = ["low lower low", "newest widest", ""]
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    merges = bpeops.bpe_train(docs, n_merges=8)
    got = {r["doc_id"]: r for r in bpeops.bpe_encode(docs, merges).collect()}
    for i, t in enumerate(texts):
        toks = []
        for w in t.lower().split(" "):
            if w:
                toks.extend(bpeops.apply_merges(w, merges))
        assert got[i]["n_tokens"] == len(toks)
        assert got[i]["tokens_md5"] == hashlib.md5(" ".join(toks).encode()).hexdigest()


def test_bpe_early_stop_when_no_repeating_pairs(spark):
    docs = spark.createDataFrame([(0, "ab cd")], "doc_id long, text string")
    merges = bpeops.bpe_train(docs, n_merges=10)
    assert merges == []  # every pair occurs once -> nothing to learn


def test_bpe_driver_and_distributed_paths_identical(spark):
    """The size-gated driver fast path must reproduce the distributed
    merge loop bit-for-bit (same integer counts, same total order)."""
    import numpy as np

    rng = np.random.default_rng(11)
    vocab = ["low", "lower", "newest", "widest", "new", "est", "wid", "er"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(2, 9))) for _ in range(80)]
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    base = spark.conf.get("spark.ztdf.trainDriverMaxWords", "200000")
    try:
        spark.conf.set("spark.ztdf.trainDriverMaxWords", "200000")
        fast = bpeops.bpe_train(docs, n_merges=10)
        spark.conf.set("spark.ztdf.trainDriverMaxWords", "0")
        slow = bpeops.bpe_train(docs, n_merges=10)
    finally:
        spark.conf.set("spark.ztdf.trainDriverMaxWords", base)
    assert fast == slow and len(fast) == 10
