"""dedup_clusters (connected components) + corpus_clean composition.

The pair operators (minhash_lsh_pairs / simhash_pairs / phash_near_dup)
emit candidate EDGES; turning edges into a dedup decision requires
connected components (transitive variants A~B~C must collapse to one
cluster) and a survivor rule.  These tests pin the label-propagation
loop against planted graphs and a driver-side union-find, and the
composed corpus_clean pipeline against hand-computed survivors.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spatialjoincountovershells_spark.operators.corpus import corpus_clean
from spatialjoincountovershells_spark.operators.dedup import dedup_clusters


def _pairs_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "doc_a long, doc_b long"
    )


def _clusters(spark, pairs, **kw):
    out = dedup_clusters(_pairs_df(spark, pairs), **kw).collect()
    return {r["doc_id"]: r["cluster_id"] for r in out}


def test_dedup_clusters_path_graph(spark):
    # a 40-node chain has diameter 39 — the min label must cross the
    # whole path (multiple propagation+jump rounds, not just one)
    chain = [(i, i + 1) for i in range(1, 40)]
    got = _clusters(spark, chain + [(100, 101)])
    assert got == {**{i: 1 for i in range(1, 41)}, 100: 100, 101: 100}


def test_dedup_clusters_merges_cliques_on_shared_node(spark):
    # two LSH cliques overlapping in one doc are ONE cluster
    got = _clusters(spark, [(2, 3), (2, 4), (3, 4), (4, 8), (4, 9), (8, 9)])
    assert set(got.values()) == {2}


def test_dedup_clusters_empty_pairs(spark):
    df = dedup_clusters(_pairs_df(spark, []))
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["doc_id", "cluster_id"]


def test_dedup_clusters_raises_past_max_iter(spark):
    # pointer jumping certifies distance ~2^rounds; a 600-link chain
    # cannot converge in 2 rounds, so the loop must raise, not return
    # a half-converged labeling
    chain = [(i, i + 1) for i in range(1, 600)]
    with pytest.raises(RuntimeError, match="not converged"):
        _clusters(spark, chain, max_iter=2)


def test_dedup_clusters_matches_union_find(spark):
    rng = np.random.RandomState(7)
    n = 120
    edges = {tuple(sorted(p)) for p in rng.randint(0, n, size=(150, 2)) if p[0] != p[1]}
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    touched = sorted({x for e in edges for x in e})
    want = {}
    for x in touched:
        root = find(x)
        want[x] = min(y for y in touched if find(y) == root)
    assert _clusters(spark, sorted(edges)) == want


def test_corpus_clean_planted_survivors(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),     # en, survives
            (2, "the cat sat on the mat"),     # exact dup of 1 -> dropped
            (3, "le chat noir dort ici bien"),  # fr, survives
            (4, "the " + "x" * 200),            # en but quality ~9 -> dropped
            (5, "the dog sat on the log"),      # en, near-dup rep -> survives
            (6, "the dog sat on the fog"),      # near-dup of 5 -> dropped
            (7, "palabras sin marcadores conocidos aqui"),  # und -> dropped
            (8, "the " + "y" * 200),            # low-quality near-dup of 9
            (9, "the owl sat on the bough"),    # eligible rep -> SURVIVES:
            #    the cluster's min id (8) fails quality, so the rep is
            #    the min ELIGIBLE member — one spammy near-copy must not
            #    delete the good page
            (10, None),                         # null text -> quality 0 -> dropped
        ],
        "doc_id long, text string",
    )
    out = corpus_clean(docs, pairs=_pairs_df(spark, [(5, 6), (8, 9)]))
    rows = {r["doc_id"]: (r["lang_pred"], r["quality_1000"]) for r in out.collect()}
    assert set(rows) == {1, 3, 5, 9}
    assert rows[1][0] == "en" and rows[3][0] == "fr"
    assert all(q >= 175 for _, q in rows.values())


def test_corpus_clean_keep_langs_and_qmin_knobs(spark):
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "le chat noir dort ici bien")],
        "doc_id long, text string",
    )
    only_fr = corpus_clean(docs, keep_langs=("fr",), pairs=_pairs_df(spark, []))
    assert [r["doc_id"] for r in only_fr.collect()] == [2]
    none = corpus_clean(docs, q_min=1000, pairs=_pairs_df(spark, []))
    assert none.count() == 0


def test_corpus_clean_stats_funnel(spark):
    """Independent per-gate drop counts on the planted corpus: one low
    quality, one wrong lang, one exact dup, one near dup, 3 survivors —
    and n_survivors equals count(corpus_clean) with the same knobs."""
    from spatialjoincountovershells_spark.operators.corpus import (
        corpus_clean_stats,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat sat on the mat"),
            (3, "le chat noir dort ici bien"),
            (4, "the " + "x" * 200),
            (5, "the dog sat on the log"),
            (6, "the dog sat on the fog"),
            (7, "palabras sin marcadores conocidos aqui"),
            (8, "the " + "y" * 200),
            (9, "the owl sat on the bough"),
            (10, None),
        ],
        "doc_id long, text string",
    )
    pairs = _pairs_df(spark, [(5, 6), (8, 9)])
    row = corpus_clean_stats(docs, pairs=pairs).collect()[0]
    assert row.asDict() == {
        "n_docs": 10,
        # gates count INDEPENDENTLY: doc 7 fails quality (128 < 175)
        # AND language; the NULL-text doc 10 gates as empty text
        # (quality 0, lang 'und') instead of vanishing from the funnel
        "n_low_quality": 4,   # docs 4, 7, 8, 10
        "n_wrong_lang": 2,    # docs 7 and 10 (und)
        "n_exact_dup": 1,     # doc 2 (non-min copy)
        "n_near_dup": 2,      # doc 6 (non-rep) and 8 (rep is 9, the
                              # min ELIGIBLE member of its cluster)
        "n_survivors": 4,     # docs 1, 3, 5, 9
    }
    assert row.n_survivors == corpus_clean(docs, pairs=pairs).count()


def test_chunk_documents_edges(spark):
    """Window/stride arithmetic pinned: full windows, short tail, text
    shorter than one chunk, empty text -> one empty chunk."""
    from spatialjoincountovershells_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [(1, "abcdefghij"), (2, ""), (3, "abc"), (4, "abcd")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.chunk_idx): (r.chunk_text, r.n_chars)
        for r in chunk_documents(docs, chunk_chars=4, overlap=1).collect()
    }
    assert got == {
        (1, 0): ("abcd", 4), (1, 1): ("defg", 4), (1, 2): ("ghij", 4),
        (2, 0): ("", 0),
        (3, 0): ("abc", 3),
        (4, 0): ("abcd", 4),
    }
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_chars=4, overlap=4)


def test_stratified_sample_deterministic_and_partition_independent(spark):
    """The keep set is a pure function of doc_id: identical across two
    runs AND across a repartition; observed rates track the requested
    parts-per-million."""
    from spatialjoincountovershells_spark.operators.corpus import stratified_sample

    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "the word here").otherwise("mot sans marqueur").alias("text"),
    )
    rates = {"en": 500_000}
    a = {r.doc_id for r in stratified_sample(docs, rates, 250_000).collect()}
    b = {r.doc_id for r in stratified_sample(docs.repartition(13), rates, 250_000).collect()}
    assert a == b and a
    n_en = sum(1 for i in a if i % 2 == 0)
    n_other = len(a) - n_en
    assert abs(n_en / 1000 - 0.5) < 0.06      # en rate 50%
    assert abs(n_other / 1000 - 0.25) < 0.06  # default rate 25%


def test_corpus_clean_idempotent(spark):
    """Cleaning the survivors drops nothing: band keys are per-doc, so
    the survivor set's pair graph is a subset of the original graph
    restricted to survivors — every survivor is its own cluster rep
    there, and the quality/lang/exact gates are doc-local."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    first = corpus_clean(docs)
    ids1 = {r.doc_id for r in first.collect()}
    surv_docs = docs.join(first.select("doc_id"), "doc_id").select("doc_id", "text")
    ids2 = {r.doc_id for r in corpus_clean(surv_docs).collect()}
    assert ids1 == ids2 and ids1


def test_dedup_clusters_string_ids(spark):
    """Non-integral ids keep their own type and min ordering — never a
    silent lossy cast (which would null the ids and return empty)."""
    pairs = spark.createDataFrame(
        [("b", "c"), ("a", "b")], "doc_a string, doc_b string"
    )
    out = {r.doc_id: r.cluster_id for r in dedup_clusters(pairs).collect()}
    assert out == {"a": "a", "b": "a", "c": "a"}
    with pytest.raises(TypeError, match="id columns"):
        dedup_clusters(
            spark.createDataFrame([(1, "x")], "doc_a long, doc_b string")
        )


def test_minhash_lsh_excludes_null_and_trivial_docs(spark):
    """NULL-text and sub-shingle docs are excluded from LSH: a corpus
    with many of them must produce NO degenerate-bucket pairs, while a
    genuine duplicate pair is still found."""
    from spatialjoincountovershells_spark.operators.dedup import minhash_lsh_pairs

    long_text = "the quick brown fox jumps over the lazy dog again"
    rows = [(1, long_text), (2, long_text)]
    rows += [(100 + i, None) for i in range(20)]
    rows += [(200 + i, "ab") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_a, r.doc_b) for r in minhash_lsh_pairs(docs).collect()}
    assert got == {(1, 2)}


def test_corpus_clean_composes_with_crossmodal_pairs(spark):
    """The captioned-image corpus clean is a composition the public API
    already expresses: corpus_clean(images, text_col='caption',
    pairs=<crossmodal 'both' pairs>).  True duplicates (near-dup in
    BOTH modalities) collapse to their min-id representative; an
    image-only near-dup (re-captioned repost) is NOT dropped by this
    policy — exactly the per-category cleaning crossmodal_dup_pairs
    exists to enable."""
    import numpy as np

    from spatialjoincountovershells_spark.operators.corpus import corpus_clean
    from spatialjoincountovershells_spark.operators.images import (
        crossmodal_dup_pairs,
    )
    from spatialjoincountovershells_spark.sources.synth import splitmix64

    n = 40
    ids = np.arange(n, dtype=np.uint64)
    cap = [
        f"cap {splitmix64(i ^ np.uint64(31))} {splitmix64(i ^ np.uint64(32))}"
        f" {splitmix64(i ^ np.uint64(33))}"
        for i in ids
    ]
    ph = splitmix64(ids ^ np.uint64(34)).astype(np.int64) & ((1 << 48) - 1)
    rows = [(int(i), int(ph[i]), cap[i]) for i in range(n)]
    # v1: near-dup caption (one char appended -> not an exact-md5 dup)
    # + 1-bit phash flip -> crossmodal 'both' -> must collapse
    both_ids = list(range(0, n, 10))
    rows += [
        (i + 1000, int(ph[i] ^ (1 << (i % 16))), cap[i] + "x") for i in both_ids
    ]
    # v2: 1-bit phash flip but an unrelated caption -> 'image_only'
    # -> must SURVIVE this caption-centric policy
    img_only_ids = [5]
    rows += [
        (
            i + 2000,
            int(ph[i] ^ (1 << (i % 16))),
            f"alt {splitmix64(np.uint64(i) ^ np.uint64(35))} padded out longer",
        )
        for i in img_only_ids
    ]
    df = spark.createDataFrame(rows, "image_id long, phash long, caption string")

    cm = crossmodal_dup_pairs(df)
    kinds = {
        (r.image_a, r.image_b): r.match_kind for r in cm.collect()
    }
    for i in both_ids:
        assert kinds[(i, i + 1000)] == "both"
    assert kinds[(5, 2005)] == "image_only"

    pairs = cm.where(cm.match_kind == "both").select(
        cm.image_a.alias("doc_a"), cm.image_b.alias("doc_b")
    )
    survivors = {
        r.image_id
        for r in corpus_clean(
            df, text_col="caption", id_col="image_id",
            q_min=0, keep_langs=("und",), pairs=pairs,
        ).collect()
    }
    # every base row survives; each 'both' variant collapses onto its
    # min-id base; the image-only repost survives
    assert set(range(n)) <= survivors
    assert not survivors & {i + 1000 for i in both_ids}
    assert 2005 in survivors


def _py_shingles(s: str, n: int = 8) -> set:
    """Python mirror of texthash.shingle_array_sql: one possibly-short
    shingle for sub-n texts, else every n-char window."""
    return {s[i : i + n] for i in range(max(len(s) - n + 1, 1))}


def test_decontaminate_planted(spark):
    """Overlap counts vs a hand-computed distinct-shingle intersection,
    benchmark-side duplication ignored, zero-hit docs still emitted."""
    from spatialjoincountovershells_spark.operators.corpus import decontaminate

    bench_texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",  # exact dup: no effect
        "pack my box with five dozen liquor jugs",
    ]
    train_texts = {
        1: "the quick brown fox jumps over the lazy dog",  # full copy
        2: "prefix then the quick brown fox escapes",       # partial overlap
        3: "0123456789 !@#$%^&*() zzzz qqqq",               # disjoint
        4: "abc",                                           # sub-shingle doc
    }
    bench = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(bench_texts)],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        sorted(train_texts.items()), "doc_id long, text string"
    )
    bsh = set().union(*(_py_shingles(t) for t in bench_texts))
    want = {i: len(_py_shingles(t) & bsh) for i, t in train_texts.items()}

    got = {
        r.doc_id: (r.n_hit_shingles, r.contaminated)
        for r in decontaminate(train, bench, min_overlap=5).collect()
    }
    assert set(got) == set(train_texts)  # zero-hit docs present too
    for i, n_hit in want.items():
        assert got[i] == (n_hit, int(n_hit >= 5)), (i, got[i], n_hit)
    assert want[1] > 5 and want[3] == 0 and want[4] == 0


def test_repetition_stats_planted(spark):
    """Hand-computed word/bigram duplication fractions, incl. the
    single-word (no bigram), empty-text, and double-space contracts."""
    from spatialjoincountovershells_spark.operators.text import repetition_stats

    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "x y z"), (3, "w"), (4, ""), (5, "a  b")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (
            r.n_words, r.n_distinct_words,
            r.dup_word_frac_q, r.top_word_frac_q, r.top_bigram_frac_q,
        )
        for r in repetition_stats(docs).collect()
    }
    assert got == {
        # "a a a b": words a*3 b*1; bigrams "a a"*2 "a b"*1
        1: (4, 2, 750, 750, 666),
        # all distinct; bigrams "x y" "y z"
        2: (3, 3, 0, 333, 500),
        # one word, no bigrams
        3: (1, 1, 0, 1000, 0),
        # empty text -> one empty word (token contract)
        4: (1, 1, 0, 1000, 0),
        # "a  b" -> ["a", "", "b"]; bigrams "a " and " b" (distinct)
        5: (3, 3, 0, 333, 500),
    }


def test_pack_sequences_planted(spark):
    """Pin the concat-and-chunk placement contract on crafted docs:
    exclusive prefix offsets in id order, seq boundary every 5 tokens,
    straddling docs span multiple sequences, 0-token docs sit at a
    point (1 span), and the placement is independent of both input
    partitioning and bucket size (range_size 2 vs 1000)."""
    from spatialjoincountovershells_spark.operators.corpus import pack_sequences

    rows = [
        (0, "a b c"),          # 3 tokens @ 0   -> seq 0 pos 0, 1 span
        (1, "d e f g"),        # 4 tokens @ 3   -> spans seqs 0-1
        (2, ""),               # 0 tokens @ 7   -> point, 1 span
        (3, "h i j k l m"),    # 6 tokens @ 7   -> spans seqs 1-2
        (4, "n"),              # 1 token  @ 13  -> seq 2 pos 3
    ]
    docs = spark.createDataFrame(rows, schema="doc_id long, text string")
    want = {
        0: (3, 0, 0, 0, 1),
        1: (4, 3, 0, 3, 2),
        2: (0, 7, 1, 2, 1),
        3: (6, 7, 1, 2, 2),
        4: (1, 13, 2, 3, 1),
    }
    for df in (docs, docs.repartition(7)):
        for rng in (2, 1000):
            got = {
                r.doc_id: (r.n_tokens, r.tok_offset, r.seq_id, r.seq_pos,
                           r.n_seq_spans)
                for r in pack_sequences(df, seq_tokens=5,
                                        range_size=rng).collect()
            }
            assert got == want, (rng,)


# ---------------------------------------------------------------- bm25

def test_bm25_matches_brute_force(spark):
    """bm25_scores vs a pure-python mirror of the integer contract,
    on docs crafted to exercise tf saturation, doc-length damping and
    df weighting; plus ranking sanity (rarer term outranks common one
    at equal tf/dl)."""
    import re

    from spatialjoincountovershells_spark.operators.text import bm25_scores

    docs = [
        (0, "spark spark spark join join"),          # high tf on 'spark'
        (1, "spark join " + "pad " * 50),            # long doc, damped
        (2, "vector join"),                          # rare term 'vector'
        (3, "spark join"),                           # common terms only
        (4, "no query words at all " + "pad " * 10),
        (5, ""),                                     # empty doc
        (6, "SPARK, Spark; sPaRk!"),                 # case/punct folding
    ]
    terms = ["spark", "vector"]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_hit"], r["score_q"])
        for r in bm25_scores(df, terms).collect()
    }

    tok = {i: [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t] for i, s in docs}
    n_docs = len(docs)
    a = (16 * sum(len(t) for t in tok.values())) // n_docs
    dfreq = {
        q: sum(1 for t in tok.values() if q in t) for q in terms
    }
    want = {}
    for i, t in tok.items():
        score, hits = 0, 0
        for q in terms:
            tf = t.count(q)
            if not tf:
                continue
            hits += 1
            idf = ((2 * n_docs - 2 * dfreq[q] + 1) * 1024) // (2 * dfreq[q] + 1)
            tfp = (22 * tf * a * 1024) // (10 * tf * a + 3 * a + 144 * len(t))
            score += idf * tfp
        if hits:
            want[i] = (hits, score)
    assert got == want
    assert 4 not in got and 5 not in got
    # rare 'vector' (df=1) must outrank common 'spark' (df=4) at tf=1
    # and comparable dl: doc 2 over doc 3
    assert got[2][1] > got[3][1]
    # tf saturation still monotone: 3x 'spark' (doc 0) > 1x (doc 3)
    assert got[0][1] > got[3][1]
    # case/punctuation folding: doc 6 = 3x 'spark' like doc 0's tf
    assert got[6][0] == 1


def test_dup_spans_planted(spark):
    """dup_spans vs a python brute force on planted duplication.
    Pinned: within-doc repetition counts toward min_count; spans
    merge iff start gap <= k (gap == k+1 stays split); coverage is
    exact (max(u) - min(u) + k); short docs report zeros; clean docs
    report zeros; a duplicated k-gram shared ACROSS docs seeds both."""
    from spatialjoincountovershells_spark.operators.dedup import dup_spans

    k = 8
    shared = "ABCDEFGH"          # exactly k chars, planted in docs 1+2
    docs = [
        (1, "xx" + shared + "qqqqqqqqqq"),            # seed at u=3
        (2, "yyyyy" + shared + "zz" + shared),        # seeds at 6 and 16
        (3, "unique-text-no-repeats-at-all-here"),    # clean
        (4, "short"),                                 # len < k -> zeros
        (5, "PPPPPPPPPPPPPPPP"),                      # self-repeating run
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def brute():
        from collections import Counter

        grams = Counter()
        pos = {}
        for d, t in docs:
            us = []
            for u in range(1, len(t) - k + 2):
                g = t[u - 1 : u - 1 + k]
                grams[g] += 1
                us.append((u, g))
            pos[d] = us
        out = {}
        for d, _ in docs:
            seeds = [u for u, g in pos.get(d, []) if grams[g] >= 2]
            spans = []
            for u in seeds:
                if spans and u - spans[-1][1] <= k:
                    spans[-1][1] = u
                else:
                    spans.append([u, u])
            lens = [e - s + k for s, e in spans]
            out[d] = (len(lens), sum(lens), max(lens, default=0))
        return out

    got = {
        r.doc_id: (r.n_dup_spans, r.dup_chars, r.max_span_chars)
        for r in dup_spans(df, k=k).collect()
    }
    assert got == brute()
    # pinned plants: doc 5's run of 16 P's has 9 seeds all merging to
    # ONE span covering the whole 16 chars
    assert got[5] == (1, 16, 16)
    assert got[3] == (0, 0, 0) and got[4] == (0, 0, 0)
    assert got[1][0] == 1 and got[2][0] == 2


def test_dup_spans_gap_boundary(spark):
    """Two seeds exactly k apart merge; k+1 apart split."""
    from spatialjoincountovershells_spark.operators.dedup import dup_spans

    k = 4
    g1, g2 = "AAAA", "BBBB"
    # doc 10: g1 at u=1, g2 at u=1+k=5      -> one span of 2k chars
    # doc 11: g1 at u=1, g2 at u=k+2=6      -> two spans
    docs = [
        (10, g1 + g2),
        (11, g1 + "x" + g2),
        (12, g1 + g2),   # duplicates both grams so they seed
        (13, g1 + "y" + g2),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_dup_spans, r.dup_chars, r.max_span_chars)
        for r in dup_spans(df, k=k).collect()
    }
    assert got[10] == (1, 8, 8)
    assert got[11] == (2, 8, 4)


def test_token_topk_planted(spark):
    """token_topk vs a python Counter.  Pinned: [a-z0-9]+ run
    tokenization of lower(text); rank orders by count desc then token
    asc (deterministic ties); per-group independence; n_docs counts
    distinct docs, not occurrences."""
    from collections import Counter

    from spatialjoincountovershells_spark.operators.text import token_topk

    docs = [
        (1, "en", "the cat the dog THE bird"),
        (2, "en", "cat and dog and cat"),
        (3, "fr", "le chat le chien"),
        (4, "fr", "aaa bbb aaa bbb"),          # tie between aaa and bbb
    ]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    got = [
        (r.lang, r.rank, r.token, r.n_occurrences, r.n_docs)
        for r in token_topk(df, k=3, by="lang")
        .orderBy("lang", "rank")
        .collect()
    ]
    import re

    occ, dc = Counter(), Counter()
    for d, lg, t in docs:
        toks = [x for x in re.split("[^a-z0-9]+", t.lower()) if x]
        for tok in toks:
            occ[(lg, tok)] += 1
        for tok in set(toks):
            dc[(lg, tok)] += 1
    want = []
    for lg in ("en", "fr"):
        items = sorted(
            ((tok, n) for (g, tok), n in occ.items() if g == lg),
            key=lambda x: (-x[1], x[0]),
        )[:3]
        want += [
            (lg, i + 1, tok, n, dc[(lg, tok)])
            for i, (tok, n) in enumerate(items)
        ]
    assert got == want
    # pinned: 'cat' and 'the' both count 3 (case-folded); the tie
    # resolves lexicographically so en rank1 = cat (across 2 docs)
    assert got[0] == ("en", 1, "cat", 3, 2)
    assert got[1] == ("en", 2, "the", 3, 1)
    fr = [g for g in got if g[0] == "fr"]
    assert (fr[0][2], fr[1][2]) == ("aaa", "bbb") or fr[0][2] == "le"


def test_split_assign_properties(spark):
    """split_assign: fracs validated; assignment is a pure function of
    the key (partition-independent); group_col keeps every row of a
    group in one split; empirical proportions near the requested ones."""
    from collections import Counter

    import pytest as _pytest

    from spatialjoincountovershells_spark.operators.corpus import split_assign

    rows = [(i, f"src{i % 37}") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    fr = {"train": 800000, "val": 100000, "test": 100000}

    with _pytest.raises(ValueError):
        split_assign(df, {"train": 999999})

    a = {r.doc_id: r.split for r in split_assign(df, fr).collect()}
    b = {
        r.doc_id: r.split
        for r in split_assign(df.repartition(13), fr).collect()
    }
    assert a == b and len(a) == 4000
    n = Counter(a.values())
    assert 0.7 < n["train"] / 4000 < 0.9
    assert n["train"] + n["val"] + n["test"] == 4000

    g = split_assign(df, fr, group_col="source").collect()
    by_src = {}
    for r, (i, src) in zip(sorted(g, key=lambda r: r.doc_id), rows):
        by_src.setdefault(src, set()).add(r.split)
    assert all(len(s) == 1 for s in by_src.values())
    # and the 37 groups spread over >1 split
    assert len({next(iter(s)) for s in by_src.values()}) >= 2


def test_pagerank_vs_bruteforce(spark):
    """pagerank vs a python replay of the exact integer recurrence on
    a planted graph (star + triangle + isolated pair).  Pinned: hub
    outranks leaves; symmetric nodes tie exactly; partition count
    does not change any value (integer sums commute)."""
    from spatialjoincountovershells_spark.operators.graph import pagerank

    pairs = [(1, 2), (1, 3), (1, 4), (1, 5),        # star around 1
             (10, 11), (11, 12), (10, 12),          # triangle
             (20, 21)]                              # pair
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")

    def brute(iters=3, damping=850):
        from collections import defaultdict

        edges = defaultdict(list)
        for a, b in pairs:
            edges[a].append(b)
            edges[b].append(a)
        deg = {u: len(vs) for u, vs in edges.items()}
        r = {u: 1_000_000 for u in edges}
        for _ in range(iters):
            inc = defaultdict(int)
            for u, vs in edges.items():
                for v in vs:
                    inc[v] += r[u] // deg[u]
            r = {
                v: (1000 - damping) * 1000 + (damping * inc[v]) // 1000
                for v in edges
            }
        return r

    got = {r.doc_id: r.pr_q for r in pagerank(df, iters=3).collect()}
    assert got == brute()
    got2 = {
        r.doc_id: r.pr_q
        for r in pagerank(df.repartition(7), iters=3).collect()
    }
    assert got2 == got
    assert got[1] > got[2] and got[2] == got[3] == got[4] == got[5]
    assert got[10] == got[11] == got[12]
    assert got[20] == got[21]
