"""Chunking / vocabulary / PII-scrub tests with hand-computed answers."""

import pytest
from pyspark.sql import functions as F

from pyspark_datacol_diff_spark.operators.corpus import (
    chunk_tokens,
    pii_counts,
    scrub_pii,
    token_counts,
    top_vocab,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),       # 10 tokens
            (2, "x y z"),                     # shorter than one chunk
            (3, ""),                          # empty
        ],
        ["doc_id", "text"],
    )


def test_chunk_windows_and_overlap(spark, docs):
    out = {
        (r["doc_id"], r["chunk_no"]): (r["n_tokens"], r["chunk_text"])
        for r in chunk_tokens(docs, "doc_id", "text", chunk_size=4, overlap=1).collect()
    }
    # doc 1: starts 1,4,7,10 (step 3) over 10 tokens
    assert out[(1, 0)] == (4, "a b c d")
    assert out[(1, 1)] == (4, "d e f g")
    assert out[(1, 2)] == (4, "g h i j")
    assert out[(1, 3)] == (1, "j")  # short tail window
    assert out[(2, 0)] == (3, "x y z")
    assert (3, 0) in out  # empty text still emits one chunk
    assert len(out) == 6


def test_chunk_rejects_bad_overlap(spark, docs):
    with pytest.raises(ValueError):
        chunk_tokens(docs, "doc_id", "text", chunk_size=4, overlap=4)


def test_chunk_is_zero_shuffle(spark, docs):
    plan = chunk_tokens(docs, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_token_counts_and_top_vocab(spark):
    df = spark.createDataFrame(
        [("b a a",), ("A c b",)], ["text"]
    )
    counts = {r["token"]: r["cnt"] for r in token_counts(df, "text").collect()}
    assert counts == {"a": 3, "b": 2, "c": 1}
    top = [(r["token"], r["cnt"]) for r in top_vocab(df, "text", 2).collect()]
    assert top == [("a", 3), ("b", 2)]
    # tie-break is token asc: b and c tied at 1 without lowercasing
    nolower = {r["token"]: r["cnt"] for r in token_counts(df, "text", lowercase=False).collect()}
    assert nolower == {"a": 2, "A": 1, "b": 2, "c": 1}


def test_scrub_pii_and_counts(spark):
    df = spark.createDataFrame(
        [
            ("mail me at jo.doe+x@test-site.org or visit "
             "https://ex.com/a?b=c#d call +1 555-0100 100 ok",),
            ("clean text with no pii 42",),
        ],
        ["text"],
    )
    got = df.select(
        scrub_pii("text").alias("s"), pii_counts("text").alias("c")
    ).collect()
    dirty, clean = got[0], got[1]
    assert "<EMAIL>" in dirty["s"] and "<URL>" in dirty["s"] and "<PHONE>" in dirty["s"]
    assert "jo.doe" not in dirty["s"] and "ex.com" not in dirty["s"]
    assert dirty["c"]["n_emails"] == 1
    assert dirty["c"]["n_urls"] == 1
    assert dirty["c"]["n_phones"] == 1
    assert clean["s"] == "clean text with no pii 42"
    assert (clean["c"]["n_urls"], clean["c"]["n_emails"], clean["c"]["n_phones"]) == (0, 0, 0)


def test_chunk_reconstruction_property(spark):
    """Dropping each non-first chunk's overlap prefix and concatenating
    must reproduce the original token stream exactly (gap-free,
    duplication-free coverage) — for any text and any size/overlap."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=15, deadline=None)
    @given(
        n_tokens=st.integers(min_value=0, max_value=50),
        chunk_size=st.integers(min_value=2, max_value=12),
        overlap=st.integers(min_value=0, max_value=6),
    )
    def check(n_tokens, chunk_size, overlap):
        if overlap >= chunk_size:
            overlap = chunk_size - 1
        toks = [f"t{i}" for i in range(n_tokens)]
        df = spark.createDataFrame([(1, " ".join(toks))], ["doc_id", "text"])
        rows = sorted(
            chunk_tokens(
                df, "doc_id", "text", chunk_size=chunk_size, overlap=overlap
            ).collect(),
            key=lambda r: r["chunk_no"],
        )
        rebuilt = []
        for r in rows:
            piece = r["chunk_text"].split(" ") if r["chunk_text"] else [""]
            rebuilt.extend(piece if r["chunk_no"] == 0 else piece[overlap:])
        original = toks if toks else [""]  # empty text -> one empty token
        assert rebuilt == original

    check()


def test_contamination_counts_hand_computed(spark):
    from pyspark_datacol_diff_spark.operators.corpus import contamination_counts

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            # shares "alpha beta gamma" and "beta gamma delta" (2 grams)
            (1, "zz alpha beta gamma delta yy"),
            # shares exactly one 3-gram
            (2, "alpha beta gamma nothing else here"),
            # clean
            (3, "totally different words throughout this doc"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["n_contaminated"]
        for r in contamination_counts(corpus, bench, "doc_id", "text", n=3).collect()
    }
    assert out == {1: 2, 2: 1}


def test_contamination_broadcasts_bench(spark):
    from pyspark_datacol_diff_spark import plans as P
    from pyspark_datacol_diff_spark.operators.corpus import contamination_counts

    bench = spark.createDataFrame([(9, "a b c d")], ["doc_id", "text"])
    corpus = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    df = contamination_counts(corpus, bench, "doc_id", "text")
    # benchmark grams broadcast: no shuffle on the corpus side before the
    # join; the only exchange is the final per-doc count aggregation.
    P.assert_join_strategy(df, broadcast_hash=1, sort_merge=0)


def test_pack_sequences_matches_reference_model(spark):
    """pack_sequences vs a pure-Python replay of the contract: md5-hash
    order per bucket, cut every target_tokens."""
    import hashlib

    from pyspark_datacol_diff_spark.operators.corpus import pack_sequences

    rows = [(i, " ".join(["w"] * (3 + i % 7))) for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["bucket"], r["pack_no"], r["pack_offset"])
        for r in pack_sequences(
            df, "doc_id", "text", target_tokens=10, num_buckets=4
        ).collect()
    }

    def h(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)

    expect = {}
    for b in range(4):
        stream = sorted((i for i, _ in rows if h(i) % 4 == b), key=lambda i: (h(i), i))
        before = 0
        for i in stream:
            nt = 3 + i % 7
            expect[i] = (nt, b, before // 10, before % 10)
            before += nt
    assert got == expect


def test_pack_sequences_single_shuffle(spark):
    from pyspark_datacol_diff_spark import plans as P
    from pyspark_datacol_diff_spark.operators.corpus import pack_sequences

    df = spark.createDataFrame([(1, "a b"), (2, "c")], ["doc_id", "text"])
    # one hash-partition on bucket feeds both window functions; nothing else
    P.assert_max_shuffles(pack_sequences(df, "doc_id", "text"), 1)


def test_tfidf_ratio_ranks_hand_computed(spark):
    from pyspark_datacol_diff_spark.operators.corpus import tfidf_top_terms

    df = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry durian"),
        ],
        ["doc_id", "text"],
    )
    out = {
        (r["doc_id"], r["rnk"]): (r["token"], r["tf"], r["df_docs"])
        for r in tfidf_top_terms(df, "doc_id", "text", k=2, log_idf=False).collect()
    }
    # doc 1: apple 2/1=2.0 > banana 1/2=0.5
    assert out[(1, 1)] == ("apple", 2, 1)
    assert out[(1, 2)] == ("banana", 1, 2)
    # doc 3: cherry 3/2=1.5 > durian 1/1=1.0
    assert out[(3, 1)] == ("cherry", 3, 2)
    assert out[(3, 2)] == ("durian", 1, 1)
    # doc 2: banana 0.5 == cherry 0.5 -> tie breaks token asc
    assert out[(2, 1)][0] == "banana" and out[(2, 2)][0] == "cherry"


def test_tfidf_log_idf_downweights_common_terms(spark):
    from pyspark_datacol_diff_spark.operators.corpus import tfidf_top_terms

    df = spark.createDataFrame(
        [(1, "the the the rare"), (2, "the x"), (3, "the y")],
        ["doc_id", "text"],
    )
    top1 = {
        r["doc_id"]: r["token"]
        for r in tfidf_top_terms(df, "doc_id", "text", k=1).collect()
    }
    # 'the' appears in all docs: idf ln(4/4)=0 kills it even at tf=3
    assert top1[1] == "rare"


def test_tfidf_min_df_drops_rare_terms(spark):
    from pyspark_datacol_diff_spark.operators.corpus import tfidf_top_terms

    df = spark.createDataFrame(
        [(1, "solo shared"), (2, "shared other")], ["doc_id", "text"]
    )
    toks = {
        r["token"]
        for r in tfidf_top_terms(df, "doc_id", "text", k=5, min_df=2).collect()
    }
    assert toks == {"shared"}


def test_span_dedup_hand_computed(spark):
    from pyspark_datacol_diff_spark.operators.corpus import span_dedup_stats

    # span size 2: doc1 = [ab][cd], doc2 = [ab][ab], doc3 = [cd]
    d = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b a b"), (3, "c d")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["n_spans"], r["n_kept"], r["n_dup"])
        for r in span_dedup_stats(d, "doc_id", "text", span_tokens=2).collect()
    }
    # survivor of "a b" is (1,0); of "c d" is (1,1); doc2 loses both of
    # its "a b" spans; doc3 loses its "c d" to doc1
    assert out[1] == (2, 2, 0)
    assert out[2] == (2, 0, 2)
    assert out[3] == (1, 0, 1)


def test_span_dedup_survivor_is_lexicographic_min(spark):
    from pyspark_datacol_diff_spark.operators.corpus import span_dedup_stats

    # same span appears at (5,0) and (2,1): survivor is doc 2 (smaller
    # doc_id wins even though its span_no is larger)
    d = spark.createDataFrame(
        [(5, "x y"), (2, "p q x y")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: (r["n_kept"], r["n_dup"])
        for r in span_dedup_stats(d, "doc_id", "text", span_tokens=2).collect()
    }
    assert out[2] == (2, 0)
    assert out[5] == (0, 1)


def test_bm25_ranking_and_diagnostics(spark):
    from pyspark_datacol_diff_spark.operators.corpus import bm25_top_docs

    d = spark.createDataFrame(
        [
            (1, "spark spark spark filler filler"),  # heavy on one term
            (2, "spark join other words here"),      # two distinct terms
            (3, "nothing relevant at all whatsoever"),
            (4, "join"),                             # short doc boost
        ],
        ["doc_id", "text"],
    )
    rows = bm25_top_docs(d, "doc_id", "text", ["spark", "join"], k=10).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert 3 not in by_id  # no matching term -> never emitted
    assert by_id[2]["n_terms"] == 2 and by_id[2]["sum_tf"] == 2
    assert by_id[1]["n_terms"] == 1 and by_id[1]["sum_tf"] == 3
    # ranks are 1..n and unique
    assert sorted(r["rnk"] for r in rows) == [1, 2, 3]
    # two-term match beats single-term tf-saturated match (tf saturates
    # at k1+1 while a second term adds a whole idf block)
    assert by_id[2]["rnk"] < by_id[1]["rnk"]


def test_bm25_rejects_bad_terms(spark):
    from pyspark_datacol_diff_spark.operators.corpus import bm25_top_docs

    d = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        bm25_top_docs(d, "doc_id", "text", [])
    with pytest.raises(ValueError):
        bm25_top_docs(d, "doc_id", "text", ["a", "a"])


def test_token_rarity_hand_computed(spark):
    from pyspark_datacol_diff_spark.operators.corpus import token_rarity_stats

    d = spark.createDataFrame(
        [
            (1, "the cat sat"),          # the:2(gc) cat:2 sat:1
            (2, "the cat ran ran"),      # the:2 cat:2 ran:2(doc-local)
            (3, ""),                     # zero tokens -> absent
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in token_rarity_stats(d, "doc_id", "text").collect()}
    assert set(got) == {1, 2}
    # corpus counts: the=2, cat=2, sat=1, ran=2
    r1 = got[1]
    assert (r1["n_tokens"], r1["freq_mass"], r1["min_tok_count"], r1["n_hapax"]) == (
        3, 2 + 2 + 1, 1, 1,
    )
    r2 = got[2]
    # freq_mass: the 1*2 + cat 1*2 + ran 2*2 = 8; no hapax
    assert (r2["n_tokens"], r2["freq_mass"], r2["min_tok_count"], r2["n_hapax"]) == (
        4, 8, 2, 0,
    )


def test_ngram_counts_hand_computed(spark):
    from pyspark_datacol_diff_spark.operators.corpus import ngram_counts

    df = spark.createDataFrame(
        [("the cat sat on the cat",), ("the cat",), ("solo",), ("",)],
        "text string",
    )
    got = {r["gram"]: r["cnt"] for r in ngram_counts(df, "text").collect()}
    # doc1 bigrams: the cat, cat sat, sat on, on the, the cat
    # doc2: the cat; doc3/doc4: fewer than 2 tokens -> nothing
    assert got == {"the cat": 3, "cat sat": 1, "sat on": 1, "on the": 1}


def test_ngram_counts_min_count_and_trigram(spark):
    from pyspark_datacol_diff_spark.operators.corpus import ngram_counts

    df = spark.createDataFrame(
        [("a b c a b c",), ("a b c",)], "text string"
    )
    got = {
        r["gram"]: r["cnt"]
        for r in ngram_counts(df, "text", n=3, min_count=2).collect()
    }
    # trigrams doc1: "a b c","b c a","c a b","a b c"; doc2: "a b c"
    assert got == {"a b c": 3}


def test_ngram_counts_short_docs_and_validation(spark):
    import pytest

    from pyspark_datacol_diff_spark.operators.corpus import ngram_counts

    df = spark.createDataFrame([("one",), ("  ",)], "text string")
    assert ngram_counts(df, "text", n=2).count() == 0
    with pytest.raises(ValueError, match="n must"):
        ngram_counts(df, "text", n=0)
    with pytest.raises(ValueError, match="min_count"):
        ngram_counts(df, "text", min_count=0)


def test_ngram_counts_zero_shuffle_before_agg(spark):
    """Gram materialization must be scan-stage-local: exactly one
    exchange in the whole plan (the gram hash agg)."""
    from pyspark_datacol_diff_spark.operators.corpus import ngram_counts

    df = spark.createDataFrame([("a b c",)], "text string")
    plan = (
        ngram_counts(df, "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") <= 2  # one shuffle, possibly AQE-read twice


def test_oov_stats_hand_computed(spark):
    from pyspark_datacol_diff_spark.operators.corpus import oov_stats

    df = spark.createDataFrame(
        [("a", "the cat sat"), ("a", "dog dog"), ("b", "the the unknown")],
        "src string, text string",
    )
    vocab = ["the", "cat"]
    got = {
        r["src"]: (r["n_tokens"], r["n_oov"])
        for r in oov_stats(df, "text", vocab, keys=["src"]).collect()
    }
    # a: 5 tokens, oov = sat + dog + dog = 3; b: 3 tokens, oov = unknown = 1
    assert got == {"a": (5, 3), "b": (3, 1)}


def test_oov_stats_global_and_validation(spark):
    import pytest

    from pyspark_datacol_diff_spark.operators.corpus import oov_stats

    df = spark.createDataFrame([("x y",), ("",)], "text string")
    r = oov_stats(df, "text", ["x"]).collect()[0]
    assert (r["n_tokens"], r["n_oov"]) == (2, 1)
    with pytest.raises(ValueError, match="non-empty"):
        oov_stats(df, "text", [])


def test_oov_stats_zero_shuffle_probe(spark):
    """The vocab probe must not explode or join: one exchange total
    (the final aggregate)."""
    from pyspark_datacol_diff_spark.operators.corpus import oov_stats

    df = spark.createDataFrame([("a b",)], "text string")
    plan = (
        oov_stats(df, "text", ["a"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "Generate" not in plan


def test_oov_stats_null_text_counts_zero(spark):
    from pyspark_datacol_diff_spark.operators.corpus import oov_stats

    df = spark.createDataFrame([("a", None), ("a", "x y")], "src string, text string")
    r = {row["src"]: (row["n_tokens"], row["n_oov"])
         for row in oov_stats(df, "text", ["x"], keys=["src"]).collect()}
    assert r == {"a": (2, 1)}


# --- property: ngram_counts equals brute-force on arbitrary text ---

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.text(alphabet="ab c\t", max_size=30), min_size=1, max_size=8
    ),
    n=st.integers(min_value=1, max_value=3),
)
def test_property_ngram_counts_match_brute_force(spark, docs, n):
    from collections import Counter

    from pyspark_datacol_diff_spark.operators.corpus import ngram_counts

    df = spark.createDataFrame([(d,) for d in docs], "text string")
    got = {
        r["gram"]: r["cnt"] for r in ngram_counts(df, "text", n=n).collect()
    }
    want = Counter()
    for d in docs:
        toks = [t for t in d.lower().split() if t]
        for i in range(len(toks) - n + 1):
            want[" ".join(toks[i : i + n])] += 1
    assert got == dict(want)


def test_distinctive_terms_hand_computed(spark):
    from pyspark_datacol_diff_spark.operators.corpus import distinctive_terms

    # "zz" only in a (ratio 1.0); "the" everywhere (ratio 0.5 each)
    df = spark.createDataFrame(
        [("a", "the zz zz"), ("a", "the zz"), ("b", "the the yy yy yy")],
        "src string, text string",
    )
    got = [
        (r["group"], r["rank"], r["token"], r["cnt_g"], r["cnt_all"])
        for r in distinctive_terms(df, "src", "text", 2, min_count=2)
        .orderBy("group", "rank")
        .collect()
    ]
    # a: zz 3/3=1.0, the 2/4=0.5 ; b: yy 3/3=1.0, the 2/4=0.5
    assert got == [
        ("a", 1, "zz", 3, 3), ("a", 2, "the", 2, 4),
        ("b", 1, "yy", 3, 3), ("b", 2, "the", 2, 4),
    ]


def test_distinctive_terms_validation(spark):
    from pyspark_datacol_diff_spark.operators.corpus import distinctive_terms

    df = spark.createDataFrame([("a", "x")], "src string, text string")
    with pytest.raises(ValueError, match="k must"):
        distinctive_terms(df, "src", "text", 0)
    with pytest.raises(ValueError, match="min_count"):
        distinctive_terms(df, "src", "text", 1, min_count=0)


def test_shingle_overlap_hand_computed(spark):
    from pyspark_datacol_diff_spark.operators.corpus import shingle_overlap

    df = spark.createDataFrame(
        [
            ("a", "one two three four"),   # shingles: 1-2-3, 2-3-4
            ("b", "one two three"),        # shingles: 1-2-3
            ("c", "five six seven"),       # disjoint
        ],
        "src string, text string",
    )
    rows = shingle_overlap(df, "src", "text", n=3).collect()
    got = {
        (r["group_a"], r["group_b"]): (r["n_shared"], r["n_a"], r["n_b"])
        for r in rows
    }
    # only (a, b) share; c appears in no pair (zero shared)
    assert got == {("a", "b"): (1, 2, 1)}


def test_shingle_overlap_releases_cache(spark):
    from pyspark_datacol_diff_spark.operators.corpus import shingle_overlap

    df = spark.createDataFrame([("a", "x y z"), ("b", "x y z")], "src string, text string")
    jsc = spark.sparkContext._jsc.sc()

    def n_cached():
        return jsc.getPersistentRDDs().size()

    # each call legitimately registers ONE eager localCheckpoint RDD
    # (the group-pair-grain result); a leaked posting-list persist
    # would add a SECOND registration per call. Assert growth <= 1 per
    # call — robust to unrelated cached frames from earlier tests in
    # the shared session.
    shingle_overlap(df, "src", "text", n=3).collect()
    base = n_cached()
    calls = 3
    for _ in range(calls):
        shingle_overlap(df, "src", "text", n=3).collect()
    assert n_cached() - base <= calls


class TestTypeTokenRatio:
    """Round-7: per-group lexical diversity as exact integers."""

    def test_hand_computed(self, spark):
        from pyspark_datacol_diff_spark.operators.corpus import (
            type_token_ratio,
        )

        df = spark.createDataFrame(
            [
                ("a", "x x x y"),          # 2 types / 4 tokens
                ("a", "y z"),              # +1 type (z), +2 tokens
                ("b", "Q q"),              # lowercased: 1 type / 2 tokens
            ],
            "source string, text string",
        )
        got = {
            r["source"]: (r["n_types"], r["n_tokens"], r["ttr_ppm"])
            for r in type_token_ratio(df, "text", ["source"]).collect()
        }
        assert got["a"] == (3, 6, 500_000)
        assert got["b"] == (1, 2, 500_000)
