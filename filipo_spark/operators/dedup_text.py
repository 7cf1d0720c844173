"""Document deduplication operators: exact, n-gram Jaccard, MinHash+LSH,
SimHash — the dedup family a training-data pipeline needs at 100 TB.

Scale shapes:
* **exact**: one hash aggregation on the md5 fingerprint — map-side
  combinable, no pairwise work.
* **n-gram Jaccard**: inverted-index join (explode shingles → self-join
  on shingle → per-pair intersection counts).  The stop-shingle cap
  (``max_doc_freq``) removes boilerplate shingles before the join — the
  quadratic blowup guard; at 100 TB also band by shingle prefix.
* **MinHash**: k independent min-hashes computed in ONE aggregation pass
  (k agg expressions over the exploded shingles, no k-fold explode);
  hash = md5(seed‖shingle), engine-portable so the DuckDB oracle can
  reproduce signatures bit-for-bit.
* **LSH**: band signatures → bucket self-join → candidate pairs; only
  candidates get exact-Jaccard verification.  Pairwise work collapses
  from O(n²) to O(Σ bucket²).
* **SimHash**: 64 sign-vote aggregations over token hashes (one pass),
  near-dup candidates by equal 16-bit chunk (Hamming ≤ 3 → at least one
  of 4 chunks equal, pigeonhole).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from filipo_spark.functions.text import fingerprint_md5, norm_text, shingles, tokens_ws


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One representative (min id) per normalized-text fingerprint."""
    return (
        df.select(F.col(id_col), fingerprint_md5(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def _shingle_long(df: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc"), F.explode(shingles(F.col(text_col), k)).alias("sh")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.6,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Near-dup pairs (a < b) with word-k-shingle Jaccard ≥ threshold."""
    sh = _shingle_long(df, text_col, id_col, k)
    if max_doc_freq:
        rare = (
            sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df_"))
            .where(F.col("df_") <= max_doc_freq)
            .select("sh")
        )
        sh = sh.join(rare, on="sh")
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, on="doc_a")
        .join(sb, on="doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_hashes: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """k min-hashes per doc: mh_i = min(md5(i ‖ '|' ‖ shingle)) — one
    aggregation pass, engine-portable (md5 in Spark == DuckDB)."""
    sh = _shingle_long(df, text_col, id_col, shingle_k)
    aggs = [
        F.min(F.md5(F.concat(F.lit(str(i)), F.lit("|"), F.col("sh")))).alias(f"mh{i}")
        for i in range(k_hashes)
    ]
    return sh.groupBy("doc").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
    verify_threshold: float | None = 0.6,
) -> DataFrame:
    """LSH candidate pairs: equal band-signature in ≥1 band; optionally
    verified with exact shingle Jaccard (two-stage, the scale path)."""
    assert k_hashes % bands == 0
    rows = k_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, k_hashes, shingle_k)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws("|", *[F.col(f"mh{b * rows + r}") for r in range(rows)])).alias(
                "bsig"
            ),
        )
        for b in range(bands)
    ]
    banded = sig.select("doc", F.explode(F.array(*band_structs)).alias("bs")).select(
        "doc", "bs.band", "bs.bsig"
    )
    x, y = banded.alias("x"), banded.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bsig") == F.col("y.bsig"))
            & (F.col("x.doc") < F.col("y.doc")),
        )
        .select(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"))
        .distinct()
    )
    if verify_threshold is None:
        return cand
    exact = ngram_jaccard_pairs(df, text_col, id_col, shingle_k, verify_threshold)
    return cand.join(exact, on=["doc_a", "doc_b"]).select("doc_a", "doc_b", "jaccard")


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over whitespace tokens (xxhash64 bit votes)."""
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(tokens_ws(norm_text(F.col(text_col))))).alias("t"),
    ).withColumn("h", F.xxhash64("t"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    agg = toks.groupBy("doc").agg(*votes)
    sig = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseOR(term)
    return agg.select("doc", sig.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Near-dup candidates: pigeonhole on 4×16-bit chunks (Hamming ≤ 3 ⇒
    ≥1 chunk equal), then exact Hamming filter via bit_count(xor)."""
    sig = simhash(df, text_col, id_col)
    chunks = [
        F.struct(
            F.lit(c).alias("chunk"),
            F.shiftright(F.col("simhash"), c * 16).bitwiseAND(F.lit(0xFFFF)).alias("cv"),
        )
        for c in range(4)
    ]
    long_ = sig.select(
        "doc", "simhash", F.explode(F.array(*chunks)).alias("ch")
    ).select("doc", "simhash", "ch.chunk", "ch.cv")
    x, y = long_.alias("x"), long_.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.chunk") == F.col("y.chunk"))
            & (F.col("x.cv") == F.col("y.cv"))
            & (F.col("x.doc") < F.col("y.doc")),
        )
        .select(
            F.col("x.doc").alias("doc_a"),
            F.col("y.doc").alias("doc_b"),
            F.col("x.simhash").alias("sa"),
            F.col("y.simhash").alias("sb"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
