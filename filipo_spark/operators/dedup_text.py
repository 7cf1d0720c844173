"""Document deduplication operators: exact, n-gram Jaccard, MinHash+LSH,
SimHash — the dedup family a training-data pipeline needs at 100 TB.

Scale shapes:
* **exact**: one hash aggregation on the md5 fingerprint — map-side
  combinable, no pairwise work.
* **n-gram Jaccard**: inverted-index join (explode shingles → self-join
  on shingle → per-pair intersection counts).  The stop-shingle cap
  (``max_doc_freq``) removes boilerplate shingles before the join — the
  quadratic blowup guard — and is ON by default (``"auto"`` = a
  corpus-fraction cap): one boilerplate shingle shared by f docs costs
  O(f²) join rows, so an uncapped join is a scale landmine.
* **MinHash**: k independent min-hashes computed in ONE aggregation pass
  (k agg expressions over the exploded shingles, no k-fold explode);
  hash = md5(seed‖shingle), engine-portable so the DuckDB oracle can
  reproduce signatures bit-for-bit.
* **LSH**: band signatures → bucket self-join → candidate pairs; exact
  Jaccard is computed on the CANDIDATES ONLY (join candidates back to
  their shingle sets) — pairwise work collapses from O(n²) to
  O(Σ bucket²) + O(|candidates| · shingles/doc).
* **SimHash**: per-bit sign-vote aggregations over token hashes (one
  pass).  Near-dup candidate generation chunks the signature into
  ``max_hamming + 1`` pieces: a pair within Hamming distance h differs
  in at most h chunks, so at least one chunk is equal (pigeonhole) —
  candidate recall is complete and the output is semantically exact
  (ALL pairs with hamming ≤ max_hamming), which is what makes the
  operator oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from filipo_spark.functions.text import (
    char_gram_hashes,
    fingerprint_md5,
    norm_text,
    shingles,
    tokens_ws,
)

# number of signature bits per hash backend: xxhash64 is the fast JVM
# path; md5 uses 15 hex chars → 60 bits, reproducible in DuckDB via
# strpos('0123456789abcdef', chr) - 1 (engine-portable, oracle-checkable)
SIMHASH_BITS = {"xx64": 64, "md5": 60}


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


def _auto_doc_freq_cap(df: DataFrame) -> int:
    """Default stop-shingle cap: 1% of the corpus, floored at 100 docs.
    Boilerplate shared by more docs than this is dropped before the
    inverted-index self-join (its contribution to Jaccard is near-zero
    anyway; its contribution to join size is quadratic)."""
    return max(100, int(0.01 * df.count()))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.6,
    max_doc_freq: int | str | None = "auto",
) -> DataFrame:
    """Near-dup pairs (a < b) with word-k-shingle Jaccard ≥ threshold.

    ``max_doc_freq``: stop-shingle guard — shingles present in more than
    this many docs are excluded from BOTH the join and the per-doc sizes
    (Jaccard over retained shingles).  ``"auto"`` (default) caps at
    max(100, 1% of docs); pass ``None`` to disable (unsafe at scale).
    """
    if max_doc_freq == "auto":
        max_doc_freq = _auto_doc_freq_cap(df)
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
    return _jaccard_from_inter(inter, sizes, threshold)


def _jaccard_from_inter(inter: DataFrame, sizes: DataFrame, threshold: float) -> DataFrame:
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
    verified with exact shingle Jaccard computed on the candidates ONLY
    (the whole point of LSH — never an all-pairs join over the corpus)."""
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
    # candidates-only verification: join each candidate pair to its two
    # shingle sets, count shared shingles per pair.  Work is
    # O(|candidates| × shingles/doc), independent of corpus size.
    sh = _shingle_long(df, text_col, id_col, shingle_k)
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    sa = sh.select(F.col("doc").alias("doc_a"), "sh")
    sb = sh.select(F.col("doc").alias("doc_b"), "sh")
    inter = (
        cand.join(sa, on="doc_a")
        .join(sb, on=["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return _jaccard_from_inter(inter, sizes, verify_threshold)


def winnowing_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (the rolling-hash family): hash
    every char k-gram (md5 — engine-portable), keep the minimum hash of
    each sliding w-window, dedupe → (doc, fp) rows.  Local edits perturb
    only nearby windows, so overlapping documents share fingerprints —
    the classic plagiarism/near-dup signature.

    Shape: one explode + ONE per-doc sliding-window min (rows between
    current and w-1 following) — linear in text length.  (A pure
    array-expression formulation re-evaluates the gram array per window
    under Catalyst lambda inlining: O(n²) hashing — measured 100×
    slower.  The window form is also the distributable one: partitions
    are per-document.)"""
    grams = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(char_gram_hashes(F.col(text_col), k)).alias("pos", "h"),
    )
    win = Window.partitionBy("doc").orderBy("pos").rowsBetween(0, w - 1)
    counts = Window.partitionBy("doc")
    return (
        grams.select(
            "doc", "pos", F.min("h").over(win).alias("fp"),
            F.count(F.lit(1)).over(counts).alias("_n"),
        )
        # windows exist at positions 0 .. n-w (or just 0 for short docs)
        .where((F.col("pos") <= F.col("_n") - w) | (F.col("pos") == 0))
        .select("doc", "fp")
        .distinct()
    )


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", hash_fn: str = "xx64"
) -> DataFrame:
    """SimHash over whitespace tokens: per-bit sign votes in one pass.

    ``hash_fn="xx64"``: 64-bit xxhash64 token hashes (fast JVM path).
    ``hash_fn="md5"``: 60 bits from 15 hex chars of md5(token) —
    engine-portable, bit-identical in DuckDB (the oracle path).
    """
    n_bits = SIMHASH_BITS[hash_fn]
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(tokens_ws(norm_text(F.col(text_col))))).alias("t"),
    )
    if hash_fn == "xx64":
        toks = toks.withColumn("h", F.xxhash64("t"))

        def bit(i: int) -> Column:
            return F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1))
    else:
        toks = toks.withColumn("h", F.md5("t"))
        for j in range(n_bits // 4):
            # hex digit j (0-based from the left), portable: DuckDB is
            # strpos('0123456789abcdef', substr(h, j+1, 1)) - 1
            toks = toks.withColumn(
                f"_d{j}", F.conv(F.substring("h", j + 1, 1), 16, 10).cast("int")
            )

        def bit(i: int) -> Column:
            return F.shiftright(F.col(f"_d{i // 4}"), i % 4).bitwiseAND(F.lit(1))

    votes = [
        F.sum(F.when(bit(i) == 1, 1).otherwise(-1)).alias(f"b{i}") for i in range(n_bits)
    ]
    agg = toks.groupBy("doc").agg(*votes)
    sig = None
    for i in range(n_bits):
        b = F.when(F.col(f"b{i}") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        term = F.shiftleft(b, i)
        sig = term if sig is None else sig.bitwiseOR(term)
    return agg.select("doc", sig.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    hash_fn: str = "xx64",
) -> DataFrame:
    """ALL pairs within Hamming distance ``max_hamming`` of each other.

    Candidate generation chunks the signature into ``max_hamming + 1``
    pieces (pigeonhole: ≤ h differing bits cannot touch all h+1 chunks,
    so near pairs share ≥ 1 chunk) — recall-complete for any
    ``max_hamming``, then exact via ``bit_count(xor)``.  Chunking is a
    pure optimization with no semantic effect on the output.
    """
    n_bits = SIMHASH_BITS[hash_fn]
    assert 0 <= max_hamming < n_bits
    sig = simhash(df, text_col, id_col, hash_fn)
    n_chunks = max_hamming + 1
    bounds = [
        (c * n_bits // n_chunks, (c + 1) * n_bits // n_chunks) for c in range(n_chunks)
    ]
    def _chunk_val(lo: int, hi: int) -> Column:
        col = F.shiftright(F.col("simhash"), lo)
        if hi - lo < 64:  # a full-width chunk (max_hamming=0) needs no mask,
            # and (1<<64)-1 would overflow the long literal
            col = col.bitwiseAND(F.lit((1 << (hi - lo)) - 1))
        return col

    chunks = [
        F.struct(F.lit(c).alias("chunk"), _chunk_val(lo, hi).alias("cv"))
        for c, (lo, hi) in enumerate(bounds)
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
