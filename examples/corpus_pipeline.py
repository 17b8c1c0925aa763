"""Production-shaped corpus-preparation job.

    python scripts/package.py engine.zip
    spark-submit --py-files engine.zip examples/corpus_pipeline.py \
        --docs /data/documents --out /data/corpus --shards 64

The end-to-end shape of a training-data build over the engine's operator
family, in dependency order:

  1. exact dedup            (operators/dedup.py::dedup_exact)
  2. near-dup dedup         (MinHash-LSH candidates → Jaccard verify →
                             connected components, keep cluster minima)
  3. benchmark decontam     (operators/decontam.py::benchmark_overlap)
  4. quality gates          (tokens / alpha ratio / repetition)
  5. PII redaction          (operators/corpus.py::redact_pii)
  6. mixture sampling       (operators/corpus.py::mixture_sample)
  7. sequence packing       (operators/corpus.py::pack_sequences)
  8. deterministic shuffle  (operators/corpus.py::global_shuffle over BIN
                             keys — whole packed bins move, so sequence
                             geometry survives the permutation)
  9. write one parquet file per shard; each bin's rows are contiguous and
     start_offset-ordered, so a trainer streams fixed-length sequences
     straight off the file

Each step is a pure DataFrame transformation, so Catalyst fuses the gates
into single stages and the only shuffles are the ones the operators
document.  Every decision is hash-deterministic: re-running the job on the
same input produces byte-identical shards.
"""

from __future__ import annotations

import argparse
import os
import sys

# running from a checkout (spark-submit --py-files provides the package
# on a cluster; this covers `python examples/corpus_pipeline.py` locally)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--docs", required=True, help="parquet dir of (doc_id, text, lang, ...)")
    p.add_argument("--out", required=True)
    p.add_argument("--benchmark", help="parquet dir of held-out eval docs (optional)")
    p.add_argument("--shards", type=int, default=16)
    p.add_argument("--budget", type=int, default=2048, help="tokens per packed sequence")
    p.add_argument("--min-tokens", type=int, default=10)
    p.add_argument("--max-dup-word-frac", type=float, default=0.9)
    p.add_argument("--mixture", default="", help="lang=pct comma list, e.g. en=60,de=25,fr=15")
    args = p.parse_args()

    from kafka_connect_tablestore_spark.functions.text import token_count
    from kafka_connect_tablestore_spark.operators.clustering import dedup_neardup
    from kafka_connect_tablestore_spark.operators.corpus import (
        EMAIL_RE,
        IPV4_RE,
        LONGNUM_RE,
        global_shuffle,
        mixture_sample,
        pack_sequences,
    )
    from kafka_connect_tablestore_spark.operators.decontam import benchmark_overlap
    from kafka_connect_tablestore_spark.operators.dedup import dedup_exact

    spark = SparkSession.builder.appName("corpus-pipeline").getOrCreate()
    docs = spark.read.parquet(args.docs)

    # 1-2: survivors of exact dedup, then near-dup clustering (keep minima)
    keep = dedup_exact(docs).select(F.col("keep_id").alias("doc_id"))
    docs = docs.join(keep, "doc_id")
    keep_nd = (
        dedup_neardup(docs).where(F.col("is_survivor")).select("doc_id")
    )
    docs = docs.join(keep_nd, "doc_id")

    # 3: strike benchmark-contaminated docs
    if args.benchmark:
        bench = spark.read.parquet(args.benchmark)
        clean = benchmark_overlap(docs, bench).where(~F.col("contaminated"))
        docs = docs.join(clean.select("doc_id"), "doc_id")

    # 4: quality gates — pure per-row expressions applied INLINE (no
    # join-back: re-joining per-row metrics would shuffle the whole corpus
    # twice for values the scan can compute in place)
    from kafka_connect_tablestore_spark.functions.text import words as _words

    w = _words("text")
    n = F.size(w)
    dup_word_frac = F.lit(1.0) - F.size(F.array_distinct(w)) / n
    docs = docs.where(
        (token_count("text") >= args.min_tokens)
        & (dup_word_frac <= args.max_dup_word_frac)
    )

    # 5: redact PII in place — same inline principle
    docs = docs.withColumn(
        "text",
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col("text"), EMAIL_RE, "<EMAIL>"),
                IPV4_RE,
                "<IP>",
            ),
            LONGNUM_RE,
            "<NUM>",
        ),
    )

    # 6: optional mixture targeting
    if args.mixture:
        pct = {
            kv.split("=")[0]: int(kv.split("=")[1])
            for kv in args.mixture.split(",")
        }
        docs = docs.join(mixture_sample(docs, "lang", pct).select("doc_id"), "doc_id")

    # 7-8: pack into token budgets, then shuffle BINS (not docs): packing
    # geometry assumes a group's docs concatenate in id order, so the
    # training-order permutation must move whole bins — a bin's rows land
    # on one shard contiguously, ordered by start_offset, and a trainer
    # streams fixed-length sequences straight off the file
    packed = pack_sequences(docs, budget=args.budget, n_groups=args.shards)
    packed = packed.withColumn(
        "bin_key",
        F.col("pack_group").cast("long") * F.lit(1_000_000_000)
        + F.col("bin_id"),
    )
    bins = packed.select("bin_key").distinct()
    order = global_shuffle(bins, id_col="bin_key", n_shards=args.shards)
    out = (
        docs.join(packed, "doc_id")
        .join(order, "bin_key")
        .repartition(args.shards, "shard")
        .sortWithinPartitions("shard", "pos", "start_offset")
    )

    # 9: one file per shard; bins contiguous, sequences reconstructable
    out.write.mode("overwrite").partitionBy("shard").parquet(args.out)
    n = spark.read.parquet(args.out).count()
    print(f"corpus written: {n} docs in {args.shards} shards at {args.out}")


if __name__ == "__main__":
    main()
