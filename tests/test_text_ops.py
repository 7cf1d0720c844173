"""Training-data operators: dedup family, similarity search, text analysis.
DuckDB oracles where SQL can express the op; structural/recall asserts
otherwise."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from filipo_spark.functions.text import (
    fingerprint_md5,
    lang_id,
    quality_score,
    token_count_bpe,
    token_count_ws,
)
from filipo_spark.operators.dedup_text import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)
from filipo_spark.operators.similarity_join import ann_ivf_topk, cosine_topk

from tests.conftest import df_rows

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    base = spark.read.parquet(f"{SF}/documents.parquet")
    # inject exact + near duplicates deterministically
    dup = base.where("doc_id < 5").select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    near = base.where("doc_id >= 5 and doc_id < 10").select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra")).alias("text"),
        "lang", "source", "n_chars",
    )
    return base.unionByName(dup).unionByName(near).cache()


@pytest.fixture(scope="module")
def ddb_docs(docs, ddb):
    ddb.register("docs", docs.toPandas())
    return ddb


def test_exact_dedup(docs, ddb_docs):
    got = df_rows(exact_dedup(docs))
    want = ddb_docs.sql(
        """SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) fp,
                  min(doc_id) keep_id, count(*) n_dups
           FROM docs GROUP BY 1"""
    ).fetchall()
    assert got == sorted(tuple(r) for r in want)
    dups = [r for r in got if r[2] > 1]
    assert len(dups) >= 5  # injected exact dups collapse


def test_ngram_jaccard_pairs(docs, ddb_docs):
    got = df_rows(ngram_jaccard_pairs(docs, threshold=0.5))
    # oracle mirrors the default 'auto' stop-shingle cap: max(100, 1% docs)
    want = ddb_docs.sql(
        """
WITH sh AS (
  SELECT doc_id AS doc, unnest(list_distinct([
    array_to_string(toks[i:i+2], ' ')
    FOR i IN range(1, CASE WHEN len(toks) >= 3 THEN len(toks) - 1 ELSE 2 END)
  ])) AS s
  FROM (SELECT doc_id, regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), '\\s+') toks FROM docs)
),
cap AS (SELECT greatest(100, CAST(floor(0.01 * count(*)) AS BIGINT)) v FROM docs),
shf AS (SELECT sh.* FROM sh
        WHERE s IN (SELECT s FROM sh GROUP BY s HAVING count(*) <= (SELECT v FROM cap))),
sizes AS (SELECT doc, count(*) n FROM shf GROUP BY doc),
inter AS (
  SELECT a.doc da, b.doc db, count(*) i
  FROM shf a JOIN shf b ON a.s = b.s AND a.doc < b.doc
  GROUP BY 1, 2)
SELECT da AS doc_a, db AS doc_b,
       round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 4) AS jaccard
FROM inter JOIN sizes sa ON sa.doc = da JOIN sizes sb ON sb.doc = db
WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5
"""
    ).fetchall()
    assert got == sorted(tuple(r) for r in want)
    # near-dups found: every injected pair (d, d+20000) present
    pairs = {(a, b) for a, b, _ in got}
    assert all((d, d + 20000) in pairs for d in range(5, 10))


def test_ngram_boilerplate_guard(spark):
    """Adversarial corpus: 300 docs sharing one boilerplate sentence.
    Uncapped, the inverted-index self-join explodes quadratically
    (~300²/2 pairs from the boilerplate shingles alone); the default
    'auto' cap drops those shingles and the join stays bounded."""
    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("terms of service apply to use of this site entry "),
            F.col("id").cast("string"), F.lit(" unique trailing words here"),
        ).alias("text"),
    )
    capped = ngram_jaccard_pairs(docs, threshold=0.3)
    uncapped = ngram_jaccard_pairs(docs, threshold=0.3, max_doc_freq=None)
    n_capped, n_uncapped = capped.count(), uncapped.count()
    # boilerplate-only overlap never reaches the capped output
    assert n_capped == 0
    # uncapped would report every boilerplate pair: the quadratic blowup
    assert n_uncapped == 300 * 299 / 2


def test_minhash_signatures_match_duckdb(docs, ddb_docs):
    got = df_rows(minhash_signatures(docs, k_hashes=4))
    want = ddb_docs.sql(
        """
WITH sh AS (
  SELECT doc_id AS doc, unnest(list_distinct([
    array_to_string(toks[i:i+2], ' ')
    FOR i IN range(1, CASE WHEN len(toks) >= 3 THEN len(toks) - 1 ELSE 2 END)
  ])) AS s
  FROM (SELECT doc_id, regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), '\\s+') toks FROM docs)
)
SELECT doc, min(md5('0|' || s)) mh0, min(md5('1|' || s)) mh1,
       min(md5('2|' || s)) mh2, min(md5('3|' || s)) mh3
FROM sh GROUP BY doc"""
    ).fetchall()
    assert got == sorted(tuple(r) for r in want)


def test_minhash_lsh_finds_dups(docs):
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs, k_hashes=8, bands=4, verify_threshold=0.5).collect()
    }
    # exact dups always collide in every band
    assert all((d, d + 10000) in pairs for d in range(5))
    # LSH candidates are a subset of exact-verified pairs by construction
    # (verify stage is uncapped — candidates-only exact Jaccard)
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.5, max_doc_freq=None).collect()
    }
    assert pairs <= exact


def test_simhash_near_pairs(docs):
    sig = simhash(docs)
    assert sig.count() == docs.count()
    pairs = {
        (r["doc_a"], r["doc_b"]) for r in simhash_near_pairs(docs, max_hamming=6).collect()
    }
    assert all((d, d + 10000) in pairs for d in range(5))  # exact dups: hamming 0


def test_simhash_chunking_is_recall_complete(docs):
    """Chunk count derives from max_hamming (h+1 chunks, pigeonhole), so
    the chunked candidate path returns exactly the brute-force relation
    {pairs: hamming <= h} — for h both below and above the old fixed-4
    layout's guarantee of 3."""
    for h, fn in [(0, "xx64"), (3, "xx64"), (8, "md5")]:
        sig = simhash(docs, hash_fn=fn)
        a, b = sig.alias("a"), sig.alias("b")
        brute = (
            a.join(b, F.col("a.doc") < F.col("b.doc"))
            .select(
                F.col("a.doc").alias("doc_a"),
                F.col("b.doc").alias("doc_b"),
                F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
            )
            .where(F.col("hamming") <= h)
        )
        got = df_rows(simhash_near_pairs(docs, max_hamming=h, hash_fn=fn))
        assert got == df_rows(brute), f"hash_fn={fn} h={h}"


def test_cosine_topk_vs_duckdb(spark, ddb):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.where("vec_id < 5")
    got = df_rows(cosine_topk(emb, queries, k=3))
    ddb.register("emb", emb.toPandas())
    want = ddb.sql(
        """
WITH scored AS (
  SELECT q.vec_id query_id, c.vec_id neighbor_id,
         round(CAST(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS DOUBLE), 4) score
  FROM emb q JOIN emb c ON q.vec_id < 5 AND q.vec_id <> c.vec_id),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY score DESC, neighbor_id) rank
  FROM scored)
SELECT query_id, neighbor_id, score, rank FROM ranked WHERE rank <= 3"""
    ).fetchall()
    assert got == sorted(tuple(r) for r in want)


def test_ann_ivf_recall(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.where("vec_id < 20")
    brute = cosine_topk(emb, queries, k=5)
    approx = ann_ivf_topk(emb, queries, k=5, n_centroids=8, n_probes=4)
    b = {(r["query_id"], r["neighbor_id"]) for r in brute.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(a & b) / len(b)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_common_prefix_len(spark):
    from filipo_spark.functions.text import common_prefix_len

    df = spark.createDataFrame(
        [("abc.def", "abc.xyz"), ("same", "same"), ("", "abc"),
         ("a", "b"), (None, "x")],
        "a string, b string",
    )
    got = {
        (r["a"], r["b"]): r["n"]
        for r in df.select(
            "a", "b", common_prefix_len(F.col("a"), F.col("b")).alias("n")
        ).collect()
    }
    assert got == {
        ("abc.def", "abc.xyz"): 4,
        ("same", "same"): 4,
        ("", "abc"): 0,
        ("a", "b"): 0,
        (None, "x"): None,
    }


def test_embedding_near_dups_subset_and_recall(spark):
    """Bucketed near-dup pairs are exact-cosine-verified candidates:
    always a subset of the brute-force relation, with usable recall."""
    from filipo_spark.operators.similarity_join import cosine, embedding_near_dups

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    brute = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .where(F.round(cosine(F.col("va"), F.col("vb")), 4) >= 0.42)
        .collect()
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups(emb, threshold=0.42, n_centroids=8, n_probes=2).collect()
    }
    assert got <= brute
    assert brute and len(got) / len(brute) >= 0.3, (len(got), len(brute))


def test_text_functions_vs_duckdb(docs, ddb_docs):
    got = df_rows(
        docs.select(
            "doc_id",
            token_count_ws(F.col("text")).alias("n_ws"),
            token_count_bpe(F.col("text")).alias("n_bpe"),
            quality_score(F.col("text")).alias("quality"),
            lang_id(F.col("text")).alias("lang_guess"),
            fingerprint_md5(F.col("text")).alias("fp"),
        )
    )
    want = ddb_docs.sql(
        r"""
WITH t AS (
  SELECT doc_id, text,
         regexp_split_to_array(trim(text), '\s+') toks,
         regexp_split_to_array(lower(trim(text)), '\s+') ltoks,
         length(text) n
  FROM docs),
f AS (
  SELECT doc_id,
    CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(toks) END n_ws,
    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) n_bpe,
    least(CAST(n AS DOUBLE)/500, 1.0) len_score,
    CASE WHEN len(toks) > 0 THEN
      CAST(len(list_filter(ltoks, x -> list_contains(['the','and','of','to','a','in','is','it','that','for'], x))) AS DOUBLE) / len(toks)
      ELSE 0.0 END sw,
    CASE WHEN n > 0 THEN CAST(length(regexp_replace(text, '[^.,;:!?''"()\[\]-]', '', 'g')) AS DOUBLE)/n ELSE 0.0 END pr,
    len(list_intersect(list_distinct(ltoks), ['the','and','of','to','a','in','is','it','that','for'])) v_en,
    len(list_intersect(list_distinct(ltoks), ['el','la','de','que','y','en','un','por','con','los'])) v_es,
    len(list_intersect(list_distinct(ltoks), ['der','die','und','das','ist','von','mit','den','ein','zu'])) v_de,
    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) fp
  FROM t)
SELECT doc_id, n_ws, n_bpe,
  floor(greatest(0.0, len_score*0.4 + least(sw*5,1.0)*0.5 - least(pr*2,1.0)*0.2 + 0.3) * 10000) / 10000 quality,
  CASE WHEN greatest(v_en, v_es, v_de) = 0 THEN 'und'
       WHEN v_en >= v_es AND v_en >= v_de THEN 'en'
       WHEN v_es >= v_de THEN 'es' ELSE 'de' END lang_guess,
  fp
FROM f"""
    ).fetchall()
    assert got == sorted(tuple(r) for r in want)
