"""Text pipeline tests: dedup (exact / jaccard / minhash / simhash),
lang-id, quality, token counting — small fixtures with known answers."""

import pytest
from pyspark.sql import functions as F

from ztdf_spark import textops

DOCS_DDL = "doc_id long, text string, lang string, source string, n_chars long"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en", "web", 44),
        (1, "the quick brown fox jumps over the lazy dog", "en", "web", 44),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat", "en", "web", 44),  # near dup of 0
        (3, "el perro y el gato de la casa que ladra", "es", "web", 40),
        (4, "completely different words entirely unrelated content here now", "en", "web", 63),
        (5, "a b! c2 d,e", "en", "web", 11),
    ]
    return spark.createDataFrame(rows, DOCS_DDL)


def test_exact_dup_groups(docs):
    groups = textops.exact_dup_groups(docs).collect()
    assert len(groups) == 1
    assert groups[0]["n_docs"] == 2 and groups[0]["keeper"] == 0


def test_fingerprint_is_md5_lower(docs):
    import hashlib

    fp = {r["doc_id"]: r["fp"] for r in textops.doc_fingerprints(docs).collect()}
    assert fp[0] == hashlib.md5(b"the quick brown fox jumps over the lazy dog").hexdigest()
    assert fp[0] == fp[1] != fp[2]


def test_shingles(docs):
    sh = textops.shingles(docs.filter("doc_id=5"), k=3).collect()
    assert {r["shingle"] for r in sh} == {"a b! c2", "b! c2 d,e"}


def test_jaccard_pairs_near_dup(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r for r in textops.jaccard_pairs(docs, min_jac_q=100).collect()}
    assert pairs[(0, 1)]["jac_q"] == 1000  # identical
    assert (0, 2) in pairs and 400 <= pairs[(0, 2)]["jac_q"] < 1000  # near dup
    assert not any({a, b} & {4} for a, b in pairs)  # unrelated doc never pairs


def test_minhash_lsh_finds_dups_and_is_deterministic(docs):
    pairs = textops.minhash_lsh_pairs(docs, min_est_q=500)
    got = {(r["doc_a"], r["doc_b"]): r["est_jac_q"] for r in pairs.collect()}
    assert got[(0, 1)] == 1000  # exact dup: identical signatures
    assert (0, 2) in got  # near dup lands in a shared band bucket
    got2 = {(r["doc_a"], r["doc_b"]): r["est_jac_q"] for r in textops.minhash_lsh_pairs(docs, min_est_q=500).collect()}
    assert got == got2


def test_simhash_near_dup_small_hamming(docs):
    sh = {r["doc_id"]: r["simhash"] for r in textops.simhash64(docs).collect()}
    assert sh[0] == sh[1]
    ham = bin(sh[0] ^ sh[2]).count("1")
    ham_far = bin(sh[0] ^ sh[4]).count("1")
    assert ham < ham_far


def test_lang_id_heuristic(docs):
    pred = {r["doc_id"]: r["pred_lang"] for r in textops.lang_id(docs).collect()}
    assert pred[0] == "en"
    assert pred[3] == "es"
    assert pred[5] == "en"  # 'a' is an en stopword here


def test_quality_scores(docs):
    q = {r["doc_id"]: r for r in textops.quality_scores(docs).collect()}
    assert q[0]["n_words"] == 9
    assert q[0]["punct_ratio_q"] == 0
    assert q[5]["punct_ratio_q"] > 0
    assert q[0]["stop_ratio_q"] == 222  # floor(1000*2/9)


def test_token_counts(docs):
    t = {r["doc_id"]: r for r in textops.token_counts(docs).collect()}
    assert t[0]["n_tok_ws"] == 9 and t[0]["n_tok_re"] == 9
    # "a b! c2 d,e" → ws: 4; regex: a,b,!,c,2,d,',',e = 8
    assert t[5]["n_tok_ws"] == 4 and t[5]["n_tok_re"] == 8


def test_corpus_filter_composite(spark):
    rows = [
        (1, "the cat and the dog of the house and a bird to see"),      # en, clean -> keep
        (2, "the cat and the dog of the house and a bird to see"),      # exact dup of 1 -> dropped
        (3, "el gato y la casa de la playa que el sol y la luna"),      # es -> dropped
        (4, "the!!! cat??? and### the$$$ dog%%% of*** the a to!!!"),    # punct-heavy -> dropped
        (5, "a b"),                                                     # too short -> dropped
        (6, "we walked to the park and sat by a tree of the garden"),   # en -> keep
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"] for r in textops.corpus_filter(docs).collect()}
    assert got == {1, 6}


def test_decontaminate_flags_overlapping_docs(spark, docs):
    bench = spark.createDataFrame(
        [(100, "the lazy dog sat still"), (101, "la casa que ladra fuerte")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in textops.decontaminate(docs, bench, k=3).collect()}
    # docs 0/1 share "the lazy dog"; doc 3 shares "la casa que" + "casa que ladra";
    # docs 2/4/5 share no 3-gram with the benchmark
    assert set(got) == {0, 1, 3}
    assert got[0]["n_hits"] == 1 and got[0]["first_hit"] == "the lazy dog"
    assert got[3]["n_hits"] == 2 and got[3]["first_hit"] == "casa que ladra"
    # n_hits counts DISTINCT shingles: a doc repeating a benchmark shingle
    # twice still counts it once (map-side array_distinct)
    rep = spark.createDataFrame(
        [(7, "the lazy dog and the lazy dog again")], "doc_id long, text string"
    )
    (r7,) = textops.decontaminate(rep, bench, k=3).collect()
    assert r7["n_hits"] == 1
    # the benchmark-shingle join side is broadcast: the corpus never shuffles
    plan = textops.decontaminate(docs, bench, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_mixture_sample_deterministic_and_rate_accurate(spark):
    import hashlib

    n = 4000
    rows = [(i, "en" if i % 2 == 0 else "zh") for i in range(n)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    rates = {"en": 0.75, "zh": 0.1}
    got = sorted(r["doc_id"] for r in textops.mixture_sample(docs, rates).collect())
    # independent python oracle: exact same md5-threshold rule
    def keep(i, rate):
        h = hashlib.md5(f"mix{i}".encode()).hexdigest()[:8]
        return h < textops._rate_threshold(rate)

    want = sorted(i for i, lang in rows if keep(i, rates[lang]))
    assert got == want
    # achieved rates are close to target (md5 is uniform; 2000 draws/domain)
    n_en = sum(1 for i in got if i % 2 == 0)
    n_zh = len(got) - n_en
    assert abs(n_en / (n / 2) - 0.75) < 0.04
    assert abs(n_zh / (n / 2) - 0.10) < 0.03
    # determinism across re-runs and partitioning layouts
    again = sorted(
        r["doc_id"] for r in textops.mixture_sample(docs.repartition(13), rates).collect()
    )
    assert again == got
    # edge rates: 1.0 keeps everything, default 0.0 drops unlisted domains
    all_en = textops.mixture_sample(docs.filter("lang='en'"), {"en": 1.0}).count()
    assert all_en == n / 2
    assert textops.mixture_sample(docs, {"en": 1.0}).filter("lang='zh'").count() == 0


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent.setdefault(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_connected_components_vs_union_find(spark):
    import random

    random.seed(31)
    cases = [
        [(i, i + 1) for i in range(60)],  # 61-node chain: diameter >> rounds
        [(0, i) for i in range(1, 25)] + [(900, 901), (901, 902)],  # star + path
        sorted({(random.randrange(150), random.randrange(150)) for _ in range(250)}),
    ]
    for edges in cases:
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r["node"]: r["component"] for r in textops.connected_components(df).collect()}
        assert got == _uf_components(edges)
    # empty graph
    empty = spark.createDataFrame([], "src long, dst long")
    assert textops.connected_components(empty).count() == 0


def test_dedup_clusters_transitive_keeper(spark):
    # a ~ b and b ~ c but a !~ c: one cluster {a,b,c}, keeper = min id.
    # b bridges a and c (shares >=30% 3-grams with each).
    rows = [
        (10, "alpha beta gamma delta epsilon zeta"),
        (11, "alpha beta gamma delta epsilon eta"),   # near-dup of 10
        (12, "gamma delta epsilon eta theta iota"),    # near-dup of 11 only
        (13, "totally different words entirely here now"),
        (14, "totally different words entirely here now"),  # exact dup of 13
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["cluster_id"], r["is_keeper"])
           for r in textops.dedup_clusters(docs, min_jac_q=300).collect()}
    assert got[10] == (10, True) and got[11] == (10, False) and got[12] == (10, False)
    assert got[13] == (13, True) and got[14] == (13, False)


def test_dedup_canonicalize_quality_keeper(spark):
    """Keeper = longest n_chars per cluster (tie → smallest id); singletons
    keep themselves; every input doc appears exactly once."""
    rows = [
        (10, "alpha beta gamma delta epsilon zeta"),
        (11, "alpha beta gamma delta epsilon eta longer tail here"),  # near-dup of 10, LONGER
        (12, "gamma delta epsilon eta theta iota"),  # bridges via 11
        (13, "totally different words entirely here now"),
        (14, "totally different words entirely here now"),  # exact dup, same length → min id wins
        (15, "a lone unrelated document about nothing shared"),
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["keeper_id"], r["is_keeper"])
        for r in textops.dedup_canonicalize(docs, min_jac_q=200).collect()
    }
    assert len(got) == 6
    # cluster {10,11,12}: 11 is longest → keeper despite not being min id
    assert got[10] == (10, 11, False)
    assert got[11] == (10, 11, True)
    assert got[12] == (10, 11, False)
    # equal lengths tie-break to the smaller id
    assert got[13] == (13, 13, True) and got[14] == (13, 13, False)
    # singleton keeps itself
    assert got[15] == (15, 15, True)


def test_line_dedup_boilerplate_removal(spark):
    """Chunks repeated across >max_df docs are dropped everywhere; order of
    surviving chunks is preserved; a doc losing every line keeps md5('')."""
    import hashlib

    wpl = 3
    boiler = "all rights reserved"  # one 3-word line shared by ALL docs
    rows = [
        (1, f"{boiler} unique one text here extra pad"),
        (2, f"{boiler} other words follow now and then"),
        (3, f"different head part {boiler} tail bit xx"),
        (4, boiler),  # boilerplate-only doc → zero kept lines
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r["doc_id"]: r.asDict() for r in textops.line_dedup(docs, words_per_line=wpl, max_df=2).collect()}

    # independent python oracle
    chunks = {
        i: [" ".join(t.split(" ")[j : j + wpl]) for j in range(0, len(t.split(" ")), wpl)]
        for i, t in rows
    }
    df = {}
    for i, cs in chunks.items():
        for c in set(cs):
            df[c] = df.get(c, 0) + 1
    for i, cs in chunks.items():
        kept = [c for c in cs if df[c] <= 2]
        assert got[i]["n_lines"] == len(cs) and got[i]["n_kept"] == len(kept)
        assert got[i]["kept_md5"] == hashlib.md5("\n".join(kept).encode()).hexdigest()
    assert got[4]["n_kept"] == 0  # the boilerplate-only doc survives as empty


def test_line_dedup_newline_delimiter(spark):
    """The real-corpus chunker: lines are literal '\\n' splits. A header
    line shared by all docs is dropped everywhere; per-doc unique lines
    survive in order; digests match an independent python oracle."""
    import hashlib

    rows = [
        (1, "COPYRIGHT HEADER\nalpha beta\ngamma delta"),
        (2, "COPYRIGHT HEADER\nepsilon zeta\ngamma delta"),
        (3, "COPYRIGHT HEADER\nunique line here"),
        (4, "COPYRIGHT HEADER"),  # header-only doc → zero kept lines
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in textops.line_dedup(docs, max_df=2, delimiter="\n").collect()
    }
    lines = {i: t.split("\n") for i, t in rows}
    df = {}
    for i, ls in lines.items():
        for l in set(ls):
            df[l] = df.get(l, 0) + 1
    for i, ls in lines.items():
        kept = [l for l in ls if df[l] <= 2]
        assert got[i]["n_lines"] == len(ls) and got[i]["n_kept"] == len(kept)
        assert got[i]["kept_md5"] == hashlib.md5("\n".join(kept).encode()).hexdigest()
    assert got[4]["n_kept"] == 0  # header df=4 > max_df → dropped
    assert got[1]["n_kept"] == 2 and got[2]["n_kept"] == 2  # 'gamma delta' df=2 kept


def test_corpus_split_deterministic_and_frozen(spark):
    """Exactly one label per doc, md5-exact against an independent python
    oracle, and FROZEN: a subset corpus assigns the same labels (adding
    data never reshuffles existing splits)."""
    import hashlib

    docs = spark.createDataFrame(
        [(i, f"text {i}", "en", "web", 10) for i in range(500)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r["doc_id"]: r["split"] for r in textops.corpus_split(docs).collect()}
    assert len(got) == 500

    def expect(i):
        h = hashlib.md5(f"split{i}".encode()).hexdigest()[:8]
        return "train" if h < "e6666666" else ("val" if h < "f3333333" else "test")

    assert got == {i: expect(i) for i in range(500)}
    # all three splits non-empty at n=500 with 90/5/5
    assert {"train", "val", "test"} == set(got.values())
    # frozen under growth: the first 100 docs alone get identical labels
    sub = {r["doc_id"]: r["split"] for r in textops.corpus_split(docs.limit(100)).collect()}
    assert all(got[i] == s for i, s in sub.items())
    # custom fractions: remainder goes to the LAST split
    two = {r["doc_id"]: r["split"]
           for r in textops.corpus_split(docs, {"a": 0.5, "b": 0.5}).collect()}
    assert set(two.values()) == {"a", "b"}


def test_vocab_top_terms_exact_counts_and_ties(spark):
    docs = spark.createDataFrame(
        [
            (1, "x x y z", "en", "web", 7),
            (2, "x y y", "en", "web", 5),
            (3, "z q", "en", "web", 3),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = textops.vocab_top_terms(docs, top_n=3).collect()
    # tf: x=3, y=3, z=2, q=1; tie x/y broken by term asc; top-3 cuts q
    assert [(r["term"], r["tf"], r["df"]) for r in rows] == [
        ("x", 3, 2),
        ("y", 3, 2),
        ("z", 2, 2),
    ]


def test_corpus_shuffle_deterministic_order(spark):
    """(shard, pos) is a pure function of (id, salt): exact against an
    independent python oracle, re-run identical, positions contiguous from
    1 within each shard."""
    import hashlib

    docs = spark.createDataFrame(
        [(i, f"t {i}", "en", "web", 5) for i in range(300)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r["doc_id"]: (r["shard"], r["pos"]) for r in textops.corpus_shuffle(docs, 4).collect()}
    assert len(got) == 300

    hs = {i: hashlib.md5(f"shuffle{i}".encode()).hexdigest()[:8] for i in range(300)}
    bounds = ["40000000", "80000000", "c0000000"]
    exp_shard = {i: sum(h >= b for b in bounds) for i, h in hs.items()}
    for s in range(4):
        ids = sorted((hs[i], i) for i in range(300) if exp_shard[i] == s)
        for pos, (_, i) in enumerate(ids, start=1):
            assert got[i] == (s, pos)
    # stable across re-computation
    again = {r["doc_id"]: (r["shard"], r["pos"]) for r in textops.corpus_shuffle(docs, 4).collect()}
    assert again == got


def test_pii_scrub_counts_and_text(spark):
    """Known-answer PII redaction: counts per category and the exact
    scrubbed text (via pii_scrub_text), including multi-match, no-match,
    end-of-string boundaries, and the 3-2-4 SSN vs 3-3-4 phone
    disjointness."""
    rows = [
        (0, "mail a@b.io and c.d+x@e-f.org today"),
        (1, "ssn 123-45-6789 phone 555-123-4567 both"),
        (2, "nothing personal here"),
        (3, "ip 10.0.255.1"),
        (4, "trailing z9@q.co"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in textops.pii_scrub(docs).collect()}
    assert (got[0]["n_email"], got[0]["n_ssn"], got[0]["n_phone"], got[0]["n_ipv4"]) == (2, 0, 0, 0)
    assert (got[1]["n_email"], got[1]["n_ssn"], got[1]["n_phone"], got[1]["n_ipv4"]) == (0, 1, 1, 0)
    assert (got[2]["n_email"], got[2]["n_ssn"], got[2]["n_phone"], got[2]["n_ipv4"]) == (0, 0, 0, 0)
    assert (got[3]["n_email"], got[3]["n_ssn"], got[3]["n_phone"], got[3]["n_ipv4"]) == (0, 0, 0, 1)
    assert (got[4]["n_email"], got[4]["n_ssn"], got[4]["n_phone"], got[4]["n_ipv4"]) == (1, 0, 0, 0)
    scrubbed = {
        r["doc_id"]: r["s"]
        for r in docs.select(
            "doc_id", textops.pii_scrub_text(F.col("text")).alias("s")
        ).collect()
    }
    assert scrubbed[0] == "mail <EMAIL> and <EMAIL> today"
    assert scrubbed[1] == "ssn <SSN> phone <PHONE> both"
    assert scrubbed[2] == "nothing personal here"
    assert scrubbed[3] == "ip <IP>"
    assert scrubbed[4] == "trailing <EMAIL>"


def test_ngram_repetition_known_answers(spark):
    """Hand-computed Gopher repetition metrics: alternating doc, constant
    doc, and a doc too short for 5-grams (NULL dup metric, present row)."""
    rows = [
        (0, "a b a b a b"),   # 2g: {'a b':3,'b a':2} tot 5; 5g: 2 distinct
        (1, "x x x x x x"),   # 2g: 'x x'*5; 5g: 'x x x x x'*2 (dup)
        (2, "p q r"),         # 2g: 2 distinct; <5 words -> dup5 NULL
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in textops.ngram_repetition(docs).collect()}
    assert got[0] == {"doc_id": 0, "n_2grams": 5, "top2_q": 600, "dup5_q": 0}
    assert got[1] == {"doc_id": 1, "n_2grams": 5, "top2_q": 1000, "dup5_q": 1000}
    assert got[2] == {"doc_id": 2, "n_2grams": 2, "top2_q": 500, "dup5_q": None}


def test_corpus_lm_score_hand_computed(spark):
    """Bigram stupid-backoff scoring, every path hand-computed: train docs
    (even ids) 'a b a b' and 'b b' give C1={a:2,b:4}, T=6, C2={(a,b):2,
    (b,a):1,(b,b):1}; flog2: 1->0, 2->1, 4->2, 6->2.  Seen-bigram, backoff
    (unseen bigram, seen w2) and unseen-w2 paths all asserted."""
    rows = [
        (0, "a b a b"),  # train: (a,b)=0, (b,a)=-2, (a,b)=0
        (1, "a b c"),    # held out: (a,b) seen=0; (b,c) unseen w2 = -2-4
        (2, "b b"),      # train: (b,b): fl(1)-fl(4) = -2
        (3, "c a"),      # held out: (c,a) backoff via w2=a: fl(2)-fl(6)-2
        (4, "solo"),     # no bigrams -> absent
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in textops.corpus_lm_score(docs).collect()}
    assert set(got) == {0, 1, 2, 3}
    assert got[0] == {"doc_id": 0, "n_bigrams": 3, "score_q": -2, "avg_q": -667}
    assert got[1] == {"doc_id": 1, "n_bigrams": 2, "score_q": -6, "avg_q": -3000}
    assert got[2] == {"doc_id": 2, "n_bigrams": 1, "score_q": -2, "avg_q": -2000}
    assert got[3] == {"doc_id": 3, "n_bigrams": 1, "score_q": -3, "avg_q": -3000}


def test_chunk_overlap_windows_and_tail(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10))), (2, "solo"), (3, "")],
        "doc_id long, text string",
    )
    out = textops.chunk_overlap(docs, window=4, stride=3).toPandas()
    d1 = out[out.doc_id == 1].sort_values("chunk_idx")
    # starts 0,3,6,9 over 10 words: windows of 4,4,4 and a 1-word tail
    assert list(d1.chunk_idx) == [0, 1, 2, 3]
    assert list(d1.n_words) == [4, 4, 4, 1]
    assert list(d1.chunk_text) == [
        "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9", "w9",
    ]
    # overlap property: consecutive chunks share window-stride words
    for a, b in zip(d1.chunk_text, d1.chunk_text[1:]):
        assert a.split()[-1] == b.split()[0]
    assert list(out[out.doc_id == 2].chunk_text) == ["solo"]
    # empty text still yields one (empty-word) chunk — split('') == ['']
    assert list(out[out.doc_id == 3].n_words) == [1]


def test_chunk_overlap_exact_multiple_no_phantom_tail(spark):
    docs = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    out = textops.chunk_overlap(docs, window=3, stride=3).toPandas()
    # 6 words, starts 0,3 — no start at 6 (nothing new to cover)
    assert list(out.sort_values("chunk_idx").chunk_text) == ["a b c", "d e f"]


def test_chunk_overlap_validates_params(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        textops.chunk_overlap(docs, window=2, stride=3)
    with pytest.raises(ValueError):
        textops.chunk_overlap(docs, window=2, stride=0)


def test_dsir_expands_seed_to_lookalikes(spark):
    """Two vocabularies: 40 'code' docs, 260 'prose' docs. Seeding DSIR
    with 10 code docs must rank the OTHER 30 code docs above every prose
    doc (the paper's property: importance weights transfer from the seed
    to distribution-mates the seed never saw)."""
    import numpy as np

    rng = np.random.default_rng(13)
    code_vocab = [f"fn{i}" for i in range(30)] + ["def", "return", "loop"]
    prose_vocab = [f"word{i}" for i in range(30)] + ["the", "and", "said"]
    rows = []
    for d in range(300):
        vocab = code_vocab if d < 40 else prose_vocab
        n = int(rng.integers(40, 120))
        rows.append((d, " ".join(rng.choice(vocab, size=n))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = docs.filter("doc_id < 10")  # 10 seed code docs
    out = textops.dsir_weights(docs, target).toPandas().set_index("doc_id").sort_index()
    held_out_code = out.loc[10:39, "wq_per_ktok"]
    prose = out.loc[40:, "wq_per_ktok"]
    assert held_out_code.min() > prose.max()
    # the default threshold separates them in this construction
    assert out.loc[10:39, "keep"].all() and not out.loc[40:, "keep"].any()


def test_dsir_layout_invariant(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 3} common") for i in range(60)],
        "doc_id long, text string",
    )
    target = docs.filter("doc_id % 5 = 0")
    a = textops.dsir_weights(docs.repartition(1), target).toPandas()
    b = textops.dsir_weights(docs.repartition(9, "doc_id"), target.repartition(3), ).toPandas()
    key = ["doc_id", "n_tok", "weight_q", "wq_per_ktok", "keep"]
    assert sorted(map(tuple, a[key].to_numpy().tolist())) == sorted(map(tuple, b[key].to_numpy().tolist()))


def test_substring_dedup_planted_spans(spark):
    """A 6-gram planted in two docs (and once as a self-repeat) is removed
    at EVERY occurrence; unique text survives verbatim. Checked against an
    independent brute-force python oracle."""
    phrase = "alpha beta gamma delta epsilon zeta"  # 6 words
    rows = [
        (1, f"one two {phrase} three four five six seven"),
        (2, f"{phrase} completely different tail words here now"),
        (3, f"self repeat {phrase} middle bit {phrase} end"),
        (4, "nothing shared in this document at all whatsoever"),
        (5, "short doc"),  # shorter than k → no grams, untouched
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r["doc_id"]: r.asDict() for r in textops.substring_dedup(docs, k=6).collect()}

    # brute-force oracle: count every 6-gram, cover positions of dup grams
    k = 6
    grams: dict[tuple, int] = {}
    words = {i: t.split(" ") for i, t in rows}
    for i, w in words.items():
        for j in range(len(w) - k + 1):
            g = tuple(w[j : j + k])
            grams[g] = grams.get(g, 0) + 1
    for i, w in words.items():
        cov = set()
        for j in range(len(w) - k + 1):
            if grams[tuple(w[j : j + k])] >= 2:
                cov.update(range(j, j + k))
        kept = [x for p, x in enumerate(w) if p not in cov]
        assert got[i]["n_words"] == len(w)
        assert got[i]["n_removed"] == len(cov)
        assert got[i]["kept_text"] == " ".join(kept)
    # sanity on the planted structure: docs 1-3 lost the phrase, 4-5 intact
    assert got[4]["n_removed"] == 0 and got[4]["kept_text"] == rows[3][1]
    assert got[5]["n_removed"] == 0
    for i in (1, 2, 3):
        assert "alpha" not in got[i]["kept_text"]
    # doc 3's SELF-repeat counts as duplication even if no other doc had it
    assert got[3]["n_removed"] >= 12


def test_bm25_integer_scores_hand_computed(spark):
    """BM25 scores reproduce the documented all-BIGINT formula exactly;
    ranking orders by (score desc, doc_id asc); docs without any query
    term never appear."""
    rows = [
        (1, "hash join hash join hash"),          # tf(hash)=3 tf(join)=2, dl=5
        (2, "hash probe build side output row"),  # tf(hash)=1, dl=6
        (3, "join order join order join order"),  # tf(join)=3, dl=6
        (4, "no relevant terms at all here"),     # dl=6, no query terms
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = [r.asDict() for r in textops.bm25_topk(docs, [(7, "hash join")], top_k=3)
           .orderBy("rank").collect()]

    # independent integer oracle
    n_docs, total = 4, 5 + 6 + 6 + 6
    ad = 1000 * total // n_docs
    df = {"hash": 2, "join": 2}
    tfs = {1: {"hash": 3, "join": 2}, 2: {"hash": 1}, 3: {"join": 3}}
    dls = {1: 5, 2: 6, 3: 6}
    exp = {}
    for d, tmap in tfs.items():
        s = 0
        for t, tf in tmap.items():
            tfnorm = 1_000_000 * 44 * tf * ad // (20 * tf * ad + 6 * ad + 18000 * dls[d])
            s += tfnorm * (2 * (n_docs - df[t]) + 1) // (2 * df[t] + 1)
        exp[d] = s
    order = sorted(exp, key=lambda d: (-exp[d], d))
    assert [r["doc_id"] for r in got] == order
    assert [r["score"] for r in got] == [exp[d] for d in order]
    assert all(r["query_id"] == 7 for r in got)
    assert 4 not in {r["doc_id"] for r in got}


def test_bm25_tf_saturation_and_rare_term_weight(spark):
    """Doubling tf raises the score sublinearly (saturation), and a rarer
    term outweighs a common one at equal tf — the two BM25 invariants the
    integer construction must preserve."""
    rows = [
        (1, "cat " * 1 + "x " * 9),
        (2, "cat " * 2 + "x " * 8),
        (3, "cat " * 4 + "x " * 6),
        (4, "dog y z z z z z z z z"),
    ] + [(10 + i, "cat filler filler filler filler") for i in range(6)]
    docs = spark.createDataFrame(
        [(i, t.strip(), "en", "web", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = {x["doc_id"]: x["score"]
         for x in textops.bm25_topk(docs, [(0, "cat"), (1, "dog")], top_k=20).collect()
         if x["query_id"] == 0}
    gain1, gain2 = r[2] - r[1], r[3] - r[2]
    assert r[1] < r[2] < r[3] and gain2 < 2 * gain1  # saturating growth
    d = {x["doc_id"]: x["score"]
         for x in textops.bm25_topk(docs, [(1, "dog")], top_k=20).collect()}
    assert d[4] > r[1]  # df(dog)=1 << df(cat)=9 → far heavier per-term weight


# ---------------------------------------------------------------------------
# Bloom-prefiltered decontamination
# ---------------------------------------------------------------------------


def test_decontaminate_bloom_equals_exact(spark, docs):
    bench = spark.createDataFrame(
        [(100, "the lazy dog sat still"), (101, "la casa que ladra fuerte")],
        "doc_id long, text string",
    )
    exact = sorted(map(tuple, textops.decontaminate(docs, bench, k=3).collect()))
    bloom = sorted(map(tuple, textops.decontaminate_bloom(docs, bench, k=3).collect()))
    assert bloom == exact and len(exact) == 3


def test_decontaminate_bloom_exact_even_at_high_fpr(spark, docs):
    """1 bit/item + 1 hash = a nearly-useless filter that passes lots of
    false positives — the exact-confirm join must still remove every one."""
    bench = spark.createDataFrame(
        [(100, "the lazy dog sat still"), (101, "la casa que ladra fuerte")],
        "doc_id long, text string",
    )
    exact = sorted(map(tuple, textops.decontaminate(docs, bench, k=3).collect()))
    bloom = sorted(map(tuple, textops.decontaminate_bloom(
        docs, bench, k=3, bits_per_item=1, n_hashes=1).collect()))
    assert bloom == exact


def test_decontaminate_bloom_probe_is_mapside_catalyst(spark, docs):
    """The bit-test filter runs below any exchange/join on the corpus side
    (map-side kill) and the whole probe is JVM-side — no Python workers."""
    bench = spark.createDataFrame([(100, "the lazy dog sat still")],
                                  "doc_id long, text string")
    plan = (textops.decontaminate_bloom(docs, bench, k=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "xxhash64" in plan and "shiftright" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ------------------------------------------------------------- temperature


def test_temperature_sample_flattens_head_domains(spark):
    from ztdf_spark.textops import temperature_sample

    # one head domain (900 docs) vs two tails (90, 9): T=2 keeps counts
    # proportional to sqrt(n) -> 30 : 9.48 : 3 -- the head/tail keep-RATE
    # ratio collapses from 100x to ~10x
    rows = [(i, "head" if i < 900 else ("mid" if i < 990 else "tail"))
            for i in range(999)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = temperature_sample(
        df, temperature_log2=1, target_num=1, target_den=2,
        domain_col="source",
    ).groupBy("source").count().collect()
    got = {r["source"]: r["count"] for r in kept}
    import math
    n = {"head": 900, "mid": 90, "tail": 9}
    total, sw = 999, sum(math.isqrt(v) for v in n.values())
    for s, c in got.items():
        exp_rate = min(1.0, (total / 2) * math.isqrt(n[s]) / sw / n[s])
        # md5 draw is uniform: expected rate within generous binomial slack
        assert abs(c / n[s] - exp_rate) < 0.2, (s, c, exp_rate)
    # tail keep-rate must exceed head keep-rate (the whole point)
    assert got["tail"] / 9 > got["head"] / 900


def test_temperature_sample_exact_thresholds_and_layout(spark):
    from ztdf_spark.textops import temperature_sample

    rows = [(i, f"s{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kw = dict(temperature_log2=1, target_num=1, target_den=3, domain_col="source")
    a = sorted(r["doc_id"] for r in temperature_sample(df.coalesce(1), **kw).collect())
    b = sorted(r["doc_id"] for r in temperature_sample(df.repartition(7), **kw).collect())
    assert a == b
    # independent recompute of the exact integer rule
    import hashlib
    import math
    from collections import Counter

    cnt = Counter(f"s{i % 3}" for i in range(300))
    total, sw = 300, sum(math.isqrt(v) for v in cnt.values())
    thr = {d: min(1 << 32, (1 * total * math.isqrt(cnt[d]) * (1 << 32))
                  // (3 * sw * cnt[d])) for d in cnt}
    exp = sorted(i for i in range(300)
                 if int(hashlib.md5(f"temp-{i}".encode()).hexdigest()[:8], 16)
                 < thr[f"s{i % 3}"])
    assert a == exp


def test_temperature_sample_t1_is_plain_subsample(spark):
    from ztdf_spark.textops import temperature_sample

    # temperature_log2=0 -> T=1 -> w=n -> every domain gets the same rate
    rows = [(i, f"s{i % 2}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = temperature_sample(df, temperature_log2=0, target_num=1,
                              target_den=2, domain_col="source")
    import hashlib
    exp = [i for i in range(200)
           if int(hashlib.md5(f"temp-{i}".encode()).hexdigest()[:8], 16) < (1 << 31)]
    assert sorted(r["doc_id"] for r in kept.collect()) == exp


def test_cc_driver_and_distributed_paths_identical(spark):
    """The size-gated driver union-find must reproduce the distributed
    large-star/small-star labels exactly (component = min node id)."""
    import random

    random.seed(77)
    edges = sorted({(random.randrange(300), random.randrange(300)) for _ in range(500)})
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    base = spark.conf.get("spark.ztdf.ccDriverMaxEdges", "1000000")
    try:
        spark.conf.set("spark.ztdf.ccDriverMaxEdges", "1000000")
        fast = {(r["node"], r["component"]) for r in textops.connected_components(df).collect()}
        spark.conf.set("spark.ztdf.ccDriverMaxEdges", "0")
        slow = {(r["node"], r["component"]) for r in textops.connected_components(df).collect()}
    finally:
        spark.conf.set("spark.ztdf.ccDriverMaxEdges", base)
    assert fast == slow and len(fast) > 0
