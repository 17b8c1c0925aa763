"""Production-shaped corpus-preparation job.

    python scripts/package.py engine.zip
    spark-submit --py-files engine.zip examples/corpus_pipeline.py \
        --docs /data/documents --out /data/corpus --shards 64

The end-to-end shape of a training-data build over the engine's operator
family, in dependency order:

  0. C4 line cleaning       (operators/corpus.py::c4_clean, optional —
                             text-mutating, so it runs before anything
                             measures the text)
  0b. cross-corpus dedup    (operators/dedup.py::cross_dedup_exact /
                             ::cross_neardup, optional — strike docs already
                             shipped in an earlier crawl BEFORE any
                             within-corpus work: most of a fresh crawl
                             re-fetches the previous one, so this gate
                             shrinks every downstream stage)
  1. exact dedup            (operators/dedup.py::dedup_exact)
  2. near-dup dedup         (MinHash-LSH candidates → Jaccard verify →
                             connected components, keep cluster minima)
  2b. span-dup gate         (operators/dedup.py::dup_span_coverage, optional
                             — drop docs mostly made of cross-doc duplicated
                             n-word runs the doc-level passes can't see)
  3. benchmark decontam     (operators/decontam.py::benchmark_overlap)
  3a. semantic decontam     (operators/decontam.py::semantic_decontaminate,
                             optional — embedding-cosine strike against a
                             benchmark embedding set)
  3b. boilerplate strip     (operators/corpus.py::strip_boilerplate, optional
                             — frequent-span removal BEFORE the gates
                             measure the text)
  4. quality gates          (tokens / alpha ratio / repetition; optional
                             Gopher rules and the linear classifier head —
                             functions/text.py::quality_classifier_score)
  4b. per-domain caps       (operators/corpus.py::cap_per_domain, optional —
                             source diversity before the mixture math)
  5. PII redaction          (operators/corpus.py::redact_pii)
  5c. language inference    (functions/text.py::ngram_lang_id, optional —
                             for corpora arriving without a lang column)
  6. mixture sampling       (operators/corpus.py::mixture_sample — explicit
                             percents; or ::temperature_sample for
                             data-derived XLM-R temperature rates)
  7. sequence packing       (operators/corpus.py::pack_sequences)
  8. deterministic shuffle  (operators/corpus.py::global_shuffle over PACK
                             GROUP keys — whole concatenation streams move,
                             so sequence geometry survives the permutation;
                             single bins are not self-contained because a
                             boundary-spanning doc lives in its start bin)
  9. write one parquet file per shard; each group's rows are contiguous in
     packing order, so a trainer streams fixed-length sequences straight
     off the file, splitting every `budget` tokens

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
    p.add_argument("--max-span-dup", type=float, default=1.0,
                   help="drop docs whose cross-doc duplicated-span coverage "
                        "(ExactSubstr measure) exceeds this fraction "
                        "(1.0 = gate off)")
    p.add_argument("--span-n", type=int, default=20,
                   help="window width in words for the span-dup gate")
    p.add_argument("--mixture", default="", help="lang=pct comma list, e.g. en=60,de=25,fr=15")
    p.add_argument("--temperature", type=float, default=None,
                   help="temperature alpha for data-derived language rates "
                        "(XLM-R style; ignored when --mixture is given)")
    p.add_argument("--domain-cap", type=int, default=0, help="max docs per registrable domain (0 = uncapped)")
    p.add_argument("--gopher", action="store_true",
                   help="apply the Gopher/MassiveText composite quality rules")
    p.add_argument("--boilerplate-df", type=int, default=0,
                   help="strip chunks seen in >= N distinct docs (0 = off)")
    p.add_argument("--boilerplate-chunk-words", type=int, default=16)
    p.add_argument("--dsir-target", default="",
                   help="parquet dir of target-domain docs: keep docs whose "
                        "DSIR log importance weight clears --dsir-min-lw")
    p.add_argument("--dsir-min-lw", type=float, default=0.0)
    p.add_argument("--report", action="store_true",
                   help="print + write the per-source scorecard of the "
                        "shipped corpus")
    p.add_argument("--c4", action="store_true",
                   help="apply C4 line-level cleaning first (terminal-"
                        "punctuation / min-words / javascript line rules; "
                        "lorem-ipsum and brace page rules)")
    p.add_argument("--classifier-min", type=float, default=None,
                   help="keep docs whose linear quality-classifier score "
                        "clears this threshold (FineWeb-Edu/DCLM stage "
                        "shape, stand-in weights)")
    p.add_argument("--infer-lang", action="store_true",
                   help="derive the lang column via char-trigram language "
                        "ID (for corpora without one)")
    p.add_argument("--prior-docs",
                   help="parquet dir of an earlier crawl/corpus: drop new "
                        "docs whose content already ships there (exact "
                        "fingerprint), before any within-corpus dedup")
    p.add_argument("--bloom-bits", type=int, default=1 << 22,
                   help="Bloom bitset size for the cross-corpus exact strike "
                        "(0 = plain fingerprint join without the Bloom gate)")
    p.add_argument("--prior-jaccard", type=float, default=0.0,
                   help="additionally drop near-dups of prior docs at this "
                        "exact n-gram Jaccard (0 = exact-only)")
    p.add_argument("--emb", help="parquet dir of (doc_id, embedding) for "
                                 "the corpus (enables semantic decontam)")
    p.add_argument("--bench-emb", help="parquet dir of (doc_id, embedding) "
                                       "for the benchmark set")
    p.add_argument("--semantic-tau", type=float, default=0.9)
    args = p.parse_args()

    from kafka_connect_tablestore_spark.functions.text import token_count
    from kafka_connect_tablestore_spark.operators.clustering import dedup_neardup
    from kafka_connect_tablestore_spark.operators.corpus import (
        EMAIL_RE,
        IPV4_RE,
        LONGNUM_RE,
        cap_per_domain,
        global_shuffle,
        mixture_sample,
        pack_sequences,
    )
    from kafka_connect_tablestore_spark.operators.decontam import benchmark_overlap
    from kafka_connect_tablestore_spark.operators.dedup import dedup_exact

    spark = SparkSession.builder.appName("corpus-pipeline").getOrCreate()
    docs = spark.read.parquet(args.docs)

    # 0: optional C4 line-level cleaning — text-MUTATING and page-dropping,
    # so it runs FIRST: dedup fingerprints, quality gates, and packing all
    # measure the cleaned text.  Map-only; the page verdict and the
    # reassembled text come out of the same scan.
    if args.c4:
        from kafka_connect_tablestore_spark.operators.corpus import c4_clean

        docs = (
            c4_clean(docs)
            .where("keep")
            .withColumn("text", F.col("clean_text"))
            .drop("n_lines", "n_kept", "has_lorem", "has_brace",
                  "clean_text", "keep")
        )

    # 0b: optional cross-corpus dedup — the crawl-over-crawl gate runs
    # before ANY within-corpus work (RefinedWeb order): a fresh crawl
    # mostly re-fetches the previous one, so striking prior content here
    # shrinks every downstream stage.  Exact strike is one fingerprint
    # join; the optional near-dup strike adds the bipartite LSH + verify.
    if args.prior_docs:
        from kafka_connect_tablestore_spark.operators.dedup import (
            bloom_dedup,
            cross_dedup_exact,
            cross_neardup,
        )

        prior = spark.read.parquet(args.prior_docs)
        if args.bloom_bits > 0:
            # Bloom-gated strike (verdict-identical to the plain join): the
            # prior corpus reduces once to a broadcast bitset, and only the
            # flagged sliver enters the exact confirmation join — at crawl
            # scale the prior fingerprint set never ships to the new side.
            hit = bloom_dedup(
                docs, prior, m_bits=args.bloom_bits, k=4, verify=True
            ).where("in_prior")
        else:
            hit = cross_dedup_exact(docs, prior).where("in_prior")
        docs = docs.join(hit.select("doc_id"), "doc_id", "left_anti")
        if args.prior_jaccard > 0:
            nd = cross_neardup(
                docs, prior, threshold=args.prior_jaccard
            ).where("is_dup")
            docs = docs.join(nd.select("doc_id"), "doc_id", "left_anti")

    # 1-2: survivors of exact dedup, then near-dup clustering (keep minima)
    keep = dedup_exact(docs).select(F.col("keep_id").alias("doc_id"))
    docs = docs.join(keep, "doc_id")
    keep_nd = (
        dedup_neardup(docs).where(F.col("is_survivor")).select("doc_id")
    )
    docs = docs.join(keep_nd, "doc_id")

    # 2b: optional span-level dedup gate — the ExactSubstr measure (Lee et
    # al. 2022): docs whose cross-doc duplicated-window coverage exceeds
    # the threshold are mostly re-shipped content the doc-level passes
    # above can't see (partial mirrors, quote farms).  Runs AFTER doc-level
    # dedup so whole-doc twins are already gone and the df aggregate is
    # smaller; one window-hash shuffle + a doc-key verdict join.
    if args.max_span_dup < 1.0:
        from kafka_connect_tablestore_spark.operators.dedup import (
            dup_span_coverage,
        )

        spanny = (
            dup_span_coverage(docs, n=args.span_n, min_df=2)
            .where(F.col("dup_coverage") > args.max_span_dup)
            .select("doc_id")
        )
        docs = docs.join(spanny, "doc_id", "left_anti")

    # 3: strike benchmark-contaminated docs
    if args.benchmark:
        bench = spark.read.parquet(args.benchmark)
        clean = benchmark_overlap(docs, bench).where(~F.col("contaminated"))
        docs = docs.join(clean.select("doc_id"), "doc_id")

    # 3a: optional semantic decontamination — strike docs whose embedding
    # sits within cosine tau of any benchmark embedding (paraphrased eval
    # leakage the k-gram check misses).  The benchmark rides in a literal,
    # so scoring is a map-only pass; only the verdict join touches keys.
    if args.emb and args.bench_emb:
        from kafka_connect_tablestore_spark.operators.decontam import (
            semantic_decontaminate,
        )

        flagged = semantic_decontaminate(
            spark.read.parquet(args.emb),
            spark.read.parquet(args.bench_emb),
            id_col="doc_id",
            tau=args.semantic_tau,
        ).where("contaminated")
        docs = docs.join(flagged.select("doc_id"), "doc_id", "left_anti")

    # 3b: optional boilerplate-span removal — text-MUTATING, so it runs
    # before the quality gates measure the text they will gate on.  One
    # chunk-key shuffle + one doc-key reassembly; the join swaps the text
    # column for the reassembled survivor spans.
    if args.boilerplate_df > 0:
        from kafka_connect_tablestore_spark.operators.corpus import (
            strip_boilerplate,
        )

        cleaned = strip_boilerplate(
            docs,
            chunk_words=args.boilerplate_chunk_words,
            min_df=args.boilerplate_df,
            emit_text=True,
        ).select("doc_id", "clean_text")
        docs = (
            docs.join(cleaned, "doc_id")
            .withColumn("text", F.col("clean_text"))
            .drop("clean_text")
        )

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

    # 4a: optional Gopher composite rules — keep_all_cols=True gates
    # INLINE (same no-join-back principle as the gates above; the signal
    # columns are dropped once the verdict is applied)
    if args.gopher:
        from kafka_connect_tablestore_spark.functions.text import (
            gopher_quality,
        )

        sig_cols = [
            "n_words", "mean_word_len", "symbol_word_ratio",
            "bullet_line_frac", "ellipsis_line_frac", "alpha_word_frac",
            "stop_hits", "keep",
        ]
        docs = (
            gopher_quality(docs, keep_all_cols=True)
            .where("keep")
            .drop(*sig_cols)
        )

    # 4aa: optional classifier gate — the model-scoring stage; the linear
    # head rides on the same map-only scan as the rule gates, so stacking
    # it costs no extra pass (join-back on doc_id keeps the original
    # columns without carrying the signal vector forward)
    if args.classifier_min is not None:
        from kafka_connect_tablestore_spark.functions.text import (
            quality_classifier_score,
        )

        scored = quality_classifier_score(
            docs, threshold=args.classifier_min
        ).where("keep")
        docs = docs.join(scored.select("doc_id"), "doc_id")

    # 4b: optional per-domain caps — source diversity before mixture math
    # (a runaway domain would otherwise dominate its language's quota)
    if args.domain_cap > 0:
        kept = cap_per_domain(docs, args.domain_cap).where(F.col("kept"))
        docs = docs.join(kept.select("doc_id"), "doc_id")

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

    # 5b: optional DSIR importance gate — score against a target-domain
    # sample, keep docs clearing the threshold.  Scoring is map-only (the
    # bucket-ratio map is a constant-folded literal), so this adds zero
    # shuffles to the corpus.
    if args.dsir_target:
        from kafka_connect_tablestore_spark.operators.corpus import (
            dsir_logweights,
        )

        tgt = spark.read.parquet(args.dsir_target)
        lw = dsir_logweights(docs, tgt).where(
            F.col("dsir_logweight") >= args.dsir_min_lw
        )
        docs = docs.join(lw.select("doc_id"), "doc_id")

    # 5c: optional language inference — corpora without a lang column get
    # one from the char-trigram profile vote (map-only), feeding the
    # mixture / temperature stages below
    if args.infer_lang:
        from kafka_connect_tablestore_spark.functions.text import (
            ngram_lang_id,
        )

        inferred = ngram_lang_id(docs).select(
            "doc_id", F.col("lang").alias("_lang_inferred")
        )
        docs = (
            docs.join(inferred, "doc_id")
            .withColumn("lang", F.col("_lang_inferred"))
            .drop("_lang_inferred")
        )

    # 6: optional mixture targeting — explicit percents (mixture_sample)
    # or temperature-derived rates (temperature_sample); both are one tiny
    # group aggregate broadcast back + a map-only hash gate.
    if args.mixture:
        pct = {
            kv.split("=")[0]: int(kv.split("=")[1])
            for kv in args.mixture.split(",")
        }
        docs = docs.join(mixture_sample(docs, "lang", pct).select("doc_id"), "doc_id")
    elif args.temperature is not None:
        from kafka_connect_tablestore_spark.operators.corpus import (
            temperature_sample,
        )

        docs = docs.join(
            temperature_sample(docs, "lang", alpha=args.temperature).select(
                "doc_id"
            ),
            "doc_id",
        )

    # 7-8: pack into token budgets, then shuffle whole PACK GROUPS (not
    # bins, and not docs): a doc's row lives only in its START bin, so a
    # doc spanning a bin boundary leaves bin N+1's head tokens inside a
    # row assigned to bin N — individual bins are NOT self-contained
    # sequences.  The pack GROUP is: concatenating a group's docs in id
    # order reproduces its full token stream, every boundary included.
    # Shuffling at group granularity therefore keeps the reconstruction
    # guarantee — a group's rows land on one shard contiguously in
    # packing order, and a trainer streams fixed-length sequences
    # straight off the file, splitting every `budget` tokens.
    packed = pack_sequences(docs, budget=args.budget, n_groups=args.shards)
    groups = packed.select("pack_group").distinct()
    order = global_shuffle(groups, id_col="pack_group", n_shards=args.shards)
    out = (
        docs.join(packed, "doc_id")
        .join(order, "pack_group")
        .repartition(args.shards, "shard")
        # (bin_id, start_offset) is monotone in doc id within a group
        # (window cumsum), so this sort IS packing order; doc_id breaks
        # the tie a zero-token doc shares with its successor
        .sortWithinPartitions("shard", "pos", "bin_id", "start_offset", "doc_id")
    )

    # 9: one file per shard; groups contiguous, sequences reconstructable
    out.write.mode("overwrite").partitionBy("shard").parquet(args.out)
    try:
        n = spark.read.parquet(args.out).count()
    except Exception:
        # every page gated out -> the write leaves no part files and the
        # read-back can't infer a schema; report the empty corpus instead
        # of crashing after an otherwise-successful run
        n = 0
    print(f"corpus written: {n} docs in {args.shards} shards at {args.out}")
    if n == 0:
        print("warning: zero docs survived the gates; nothing to report")
        return

    # 10: per-source scorecard of what actually shipped — volume, token
    # supply, residual exact-dup rate (should be ~0 after step 1), mean
    # alpha ratio.  One owner aggregate + one |sources|-row rollup; the
    # curation report a mixture re-tune starts from.
    if args.report:
        from kafka_connect_tablestore_spark.operators.corpus import (
            source_scorecard,
        )

        src_col = "source" if "source" in docs.columns else "lang"
        shipped = spark.read.parquet(args.out)
        card = source_scorecard(shipped, source_col=src_col)
        card.orderBy(F.desc("total_tokens")).show(50, truncate=False)
        card.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(args.out + "_scorecard")
        )
        # the distribution table next to the means: per-group token-length
        # quantiles of the shipped corpus (approx t-digest path — the
        # one-pass form a production profile run ships; exact=True is the
        # oracle-gated twin)
        from kafka_connect_tablestore_spark.functions.text import (
            length_quantiles,
        )

        q = length_quantiles(
            shipped.select(F.col(src_col), token_count("text").alias("n_tokens")),
            ("n_tokens",), by=src_col, exact=False,
        )
        q.orderBy(src_col).show(50, truncate=False)


if __name__ == "__main__":
    main()
