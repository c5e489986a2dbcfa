"""Text-analysis operator tests with hand-computed expectations."""

from pyspark_datacol_diff_spark.operators import text as TX


def one(spark, text, expr):
    df = spark.createDataFrame([(text,)], ["text"])
    return df.select(expr.alias("v")).collect()[0]["v"]


def test_token_count(spark):
    assert one(spark, "a b  c", TX.token_count("text")) == 3
    assert one(spark, "  padded  out  ", TX.token_count("text")) == 2


def test_bpe_ish_token_count(spark):
    assert one(spark, "hello, world!", TX.bpe_ish_token_count("text")) == 4


def test_punct_count(spark):
    assert one(spark, "a, b. c! d", TX.punct_count("text")) == 3
    assert one(spark, "no punct here", TX.punct_count("text")) == 0


def test_stopword_hits_and_english(spark):
    t = "the cat sat on a mat and looked for food"
    assert one(spark, t, TX.stopword_hits("text")) == 4  # the, a, and, for
    assert one(spark, t, TX.is_english_like("text")) == 1
    assert one(spark, "xyzzy plugh quux", TX.is_english_like("text")) == 0


def test_quality_score_range(spark):
    good = "The quick brown fox jumps over the lazy dog, then rests for a while."
    assert one(spark, good, TX.quality_score("text")) == 1.0
    assert one(spark, "x", TX.quality_score("text")) <= 0.2


def test_doc_fingerprint_normalizes(spark):
    a = one(spark, "Hello   World", TX.doc_fingerprint("text"))
    b = one(spark, "  hello world ", TX.doc_fingerprint("text"))
    c = one(spark, "hello worlds", TX.doc_fingerprint("text"))
    assert a == b and a != c


def test_rolling_hash_matches_hand_fold(spark):
    import hashlib

    text = "alpha beta gamma"
    mod, base = 2147483647, 1000003
    fp = 0
    for tok in text.split():
        h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % mod
        fp = (fp * base + h) % mod
    assert one(spark, text, TX.rolling_hash_fingerprint("text")) == fp


def test_rolling_hash_is_order_sensitive(spark):
    a = one(spark, "alpha beta", TX.rolling_hash_fingerprint("text"))
    b = one(spark, "beta alpha", TX.rolling_hash_fingerprint("text"))
    assert a != b


def test_lang_id_basic(spark):
    cases = {
        "the cat and the dog went to the market": "en",
        "le chat est dans la maison et les enfants": "fr",
        "der hund und die katze ist nicht mit": "de",
        "el perro y los gatos es un animal por que si": "es",
        "这是一个中文句子": "zh",
        "zzz qqq xxx": "und",
    }
    for text, want in cases.items():
        assert one(spark, text, TX.lang_id("text")) == want, text


def test_lang_id_tie_breaks_sorted(spark):
    # one de marker ("und") vs one fr marker ("la") -> tie -> sorted-first
    assert one(spark, "und la", TX.lang_id("text")) == "de"


def test_lang_id_cjk_dominates(spark):
    # CJK presence outweighs latin stopword hits
    assert one(spark, "the quick 汉字 fox", TX.lang_id("text")) == "zh"


def test_cjk_char_count(spark):
    assert one(spark, "ab汉字c", TX.cjk_char_count("text")) == 2
    assert one(spark, "plain ascii", TX.cjk_char_count("text")) == 0


def test_repetition_signals(spark):
    # "a b a b b" -> tokens 5, distinct 3 (a,b... wait: a,b -> 2)
    t = "a b a b b"
    assert one(spark, t, TX.token_count("text")) == 5
    assert one(spark, t, TX.distinct_token_count("text")) == 2
    # bigrams: "a b", "b a", "a b", "b b" (multiset, 4 entries)
    grams = one(spark, t, TX.word_bigrams("text"))
    assert grams == ["a b", "b a", "a b", "b b"]
    # one immediate stutter: position 4 ("b b")
    assert one(spark, t, TX.consec_repeat_count("text")) == 1


def test_repetition_edge_cases(spark):
    assert one(spark, "solo", TX.word_bigrams("text")) == []
    assert one(spark, "solo", TX.consec_repeat_count("text")) == 0
    assert one(spark, "x x x x", TX.consec_repeat_count("text")) == 3
    assert one(spark, "x x x x", TX.distinct_token_count("text")) == 1
