"""Persisted MinHash-LSH index: incremental near-dup candidates for a new
batch must equal the full batch recompute's pairs that involve a new doc."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.operators.dedup import (
    append_to_lsh_index,
    build_lsh_index,
    incremental_lsh_pairs,
    minhash_lsh_pairs,
)

SF = "/root/testdata/sf0.01"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


def pairs_set(df):
    return {(r["doc_a"], r["doc_b"], r["n_match"]) for r in df.collect()}


def test_incremental_equals_batch_restricted_to_new(spark, tmp_path):
    docs = _docs(spark)
    corpus = docs.where("doc_id < 400")
    new = docs.where("doc_id >= 400")
    idx = str(tmp_path / "lsh_index")
    build_lsh_index(corpus, idx)

    got = pairs_set(incremental_lsh_pairs(spark, idx, new))

    full = pairs_set(minhash_lsh_pairs(docs))
    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    want = {p for p in full if p[0] in new_ids or p[1] in new_ids}
    assert got == want and len(got) > 0


def test_index_append_round(spark, tmp_path):
    """Day-2 flow: append day-1's new docs to the index, then day-2 probes
    see candidates against BOTH the original corpus and day-1 docs."""
    docs = _docs(spark)
    corpus = docs.where("doc_id < 300")
    day1 = docs.where("doc_id >= 300 and doc_id < 400")
    day2 = docs.where("doc_id >= 400")
    idx = str(tmp_path / "lsh_index")
    build_lsh_index(corpus, idx)
    append_to_lsh_index(day1, idx)

    got = pairs_set(incremental_lsh_pairs(spark, idx, day2))
    full = pairs_set(minhash_lsh_pairs(docs))
    d2 = {r["doc_id"] for r in day2.select("doc_id").collect()}
    want = {p for p in full if p[0] in d2 or p[1] in d2}
    assert got == want and len(got) > 0


def test_simhash_neardup_complete_within_pigeonhole_bound(spark):
    """4 byte-bands guarantee a collision for hamming <= 3 (pigeonhole:
    3 flipped bits can touch at most 3 of 4 bytes) — so at max_hamming=3
    the banded join must find EXACTLY the brute-force pair set."""
    from kafka_connect_tablestore_spark.operators.dedup import (
        simhash,
        simhash_neardup_pairs,
    )

    docs = _docs(spark).where("doc_id < 200")
    got = pairs_set(
        simhash_neardup_pairs(docs, max_hamming=3).withColumnRenamed(
            "hamming", "n_match"
        )
    )
    sig = simhash(docs)
    a, b = sig.alias("a"), sig.alias("b")
    brute = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("n_match"),
        )
        .where(F.col("n_match") <= 3)
    )
    assert got == pairs_set(brute) and len(got) > 0


def test_stratified_sample_deterministic_and_partition_stable(spark):
    """The hash-gate sample must be identical under any partitioning (the
    property sampleBy lacks) and approximate the requested per-group rates."""
    from kafka_connect_tablestore_spark.functions.text import stratified_sample

    docs = _docs(spark).withColumn(
        "lang", F.element_at(F.array(F.lit("en"), F.lit("de")), (F.col("doc_id") % 2 + 1).cast("int"))
    )
    rates = {"en": 0.5, "de": 0.2}
    s1 = {r["doc_id"] for r in stratified_sample(docs, "lang", rates, "doc_id").collect()}
    s2 = {
        r["doc_id"]
        for r in stratified_sample(docs.repartition(13), "lang", rates, "doc_id").collect()
    }
    assert s1 == s2 and len(s1) > 0
    n_en = docs.where("lang = 'en'").count()
    got_en = len({d for d in s1 if d % 2 == 0})
    assert abs(got_en / n_en - 0.5) < 0.15


def test_word_entropy_known_values(spark):
    from kafka_connect_tablestore_spark.functions.text import doc_word_entropy

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),          # one word -> entropy 0
            (2, "alpha beta gamma delta"),        # uniform over 4 -> 2.0 bits
            (3, "aa aa bb bb"),                   # uniform over 2 -> 1.0 bit
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["word_entropy"], r["n_words"]) for r in doc_word_entropy(df).collect()}
    assert got[1] == (0.0, 4)
    assert got[2] == (2.0, 4)
    assert got[3] == (1.0, 4)
