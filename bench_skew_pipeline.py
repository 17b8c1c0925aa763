"""Skew evidence for the pipeline WINDOW operators (round-5 directive 5).

`bench_skew.py` covers the LWW/ingest fold; this script stresses the three
remaining window-using pipeline operators with pathological key
distributions and records hot-vs-uniform wall-times:

- ``tfidf_topk``      — per-doc top-k window + word-key vocabulary join.
  Hot shape: one document holding ~500k DISTINCT words (its whole
  (doc, word) row set lands in one window task) plus one stop-word
  present in every document (hot word key through the docfreq join).
- ``pack_sequences``  — per-pack_group cumulative window.  The group key
  is ``hash64(id) % n_groups`` (uniform by construction), so the stress
  is an adversarial INPUT layout: all rows pre-sorted by id in a single
  input partition — the shuffle must still spread groups evenly.
- ``cap_per_domain``  — salted two-phase per-domain top-k.  Hot shape:
  ONE registrable domain holds ~90% of all documents.  The pre-round-5
  single-window formulation is measured alongside as the contrast
  (that is the strategy whose collapse the fix removes).

Each cell is best-of-2 against a `noop` sink.  Appends a table to
BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import build_spark  # noqa: E402


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _best(fn, trials: int = 2) -> float:
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 2)


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    n_docs = int(os.environ.get("SPARK_GRAFT_SKEW_DOCS", "200000"))
    spark = build_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    from kafka_connect_tablestore_spark.functions.text import tfidf_topk
    from kafka_connect_tablestore_spark.operators.corpus import (
        URL_RE,
        cap_per_domain,
        hash64,
        pack_sequences,
        registrable_domain,
    )

    results: dict[str, float] = {}

    # ---- tfidf_topk ------------------------------------------------------
    def synth_words(n_distinct_expr, vocab, doc_id, tag):
        # JVM-side text synthesis: n words drawn from `vocab` hash-derived
        # tokens, deterministic in (doc_id, position).
        return F.array_join(
            F.transform(
                F.sequence(F.lit(1), n_distinct_expr),
                lambda i: F.concat(
                    F.lit("w"),
                    F.pmod(F.xxhash64(doc_id * 1000003 + i, F.lit(tag)), F.lit(vocab)),
                ),
            ),
            " ",
        )

    ids = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    uni_docs = ids.select(
        "doc_id", synth_words(F.lit(40), 2_000_000, F.col("doc_id"), "u").alias("text")
    ).localCheckpoint(eager=True)
    hot_docs = ids.select(
        "doc_id",
        F.concat(
            F.lit("the "),  # stop-word in EVERY doc: hot word key
            synth_words(
                # one giant doc: ~500k distinct words through one window task
                F.when(F.col("doc_id") == 0, 500_000).otherwise(F.lit(40)),
                2_000_000,
                F.col("doc_id"),
                "h",
            ),
        ).alias("text"),
    ).localCheckpoint(eager=True)
    results["tfidf_uniform_secs"] = _best(lambda: _noop(tfidf_topk(uni_docs)))
    results["tfidf_hot_secs"] = _best(lambda: _noop(tfidf_topk(hot_docs)))

    # ---- pack_sequences --------------------------------------------------
    pack_n = n_docs * 10
    texts = spark.range(pack_n).withColumnRenamed("id", "doc_id").select(
        "doc_id",
        synth_words(
            (F.pmod(F.col("doc_id"), F.lit(20)) + 1).cast("int"), 1000,
            F.col("doc_id"), "p",
        ).alias("text"),
    )
    uniform_layout = texts.repartition(32).localCheckpoint(eager=True)
    # adversarial: the whole corpus arrives pre-sorted by id in ONE input
    # partition (a single unsplittable file) — the group-key shuffle must
    # still spread the window work.
    hot_layout = texts.orderBy("doc_id").coalesce(1).localCheckpoint(eager=True)
    results["pack_uniform_secs"] = _best(
        lambda: _noop(pack_sequences(uniform_layout, n_groups=32))
    )
    results["pack_hot_layout_secs"] = _best(
        lambda: _noop(pack_sequences(hot_layout, n_groups=32))
    )

    # ---- cap_per_domain --------------------------------------------------
    cap_n = n_docs * 10
    did = F.col("doc_id")
    base = spark.range(cap_n).withColumnRenamed("id", "doc_id")
    uni_cap = base.select(
        "doc_id",
        F.concat(
            F.lit("see https://site"),
            F.pmod(did, F.lit(20000)).cast("string"),
            F.lit(".com/p/"),
            did.cast("string"),
        ).alias("text"),
    ).localCheckpoint(eager=True)
    hot_cap = base.select(
        "doc_id",
        F.concat(
            F.lit("see https://"),
            F.when(F.pmod(did, 10) < 9, F.lit("onehost.com")).otherwise(
                F.concat(
                    F.lit("site"), F.pmod(did, F.lit(20000)).cast("string"),
                    F.lit(".com"),
                )
            ),
            F.lit("/p/"),
            did.cast("string"),
        ).alias("text"),
    ).localCheckpoint(eager=True)

    def cap_single_window(df, max_docs):
        # the pre-round-5 formulation: ONE row_number per domain — the
        # strategy whose hot-domain collapse the salted two-phase removes
        host = F.regexp_extract(F.col("text"), URL_RE, 1)
        b = df.select(
            "doc_id",
            F.when(host != "", registrable_domain(host)).alias("domain"),
            hash64(F.col("doc_id").cast("string"), "domcap").alias("_h"),
        )
        w = Window.partitionBy("domain").orderBy("_h", "doc_id")
        with_dom = b.where(F.col("domain").isNotNull()).select(
            "doc_id", "domain",
            (F.row_number().over(w) <= max_docs).alias("kept"),
        )
        no_dom = b.where(F.col("domain").isNull()).select(
            "doc_id", "domain", F.lit(True).alias("kept")
        )
        return with_dom.unionByName(no_dom)

    results["cap_salted_uniform_secs"] = _best(
        lambda: _noop(cap_per_domain(uni_cap, max_docs=100))
    )
    results["cap_salted_hot_secs"] = _best(
        lambda: _noop(cap_per_domain(hot_cap, max_docs=100))
    )
    results["cap_window_hot_secs"] = _best(
        lambda: _noop(cap_single_window(hot_cap, max_docs=100))
    )

    # ---- dup_span_coverage -----------------------------------------------
    # The fourth window user: the interval-union lag sweep partitions by
    # doc.  Hot shape: ONE document holding ~300k words drawn from a tiny
    # vocabulary (so virtually every window is cross-doc duplicated and
    # ALL ~300k of its positions flow through its single per-doc window
    # task) among many 40-word docs from the same vocabulary.  The bound
    # is the document's own length — the same argument as tfidf's per-doc
    # rank — so hot must degrade by at most the serial sweep of one doc.
    from kafka_connect_tablestore_spark.operators.dedup import (
        dup_span_coverage,
    )

    span_n = n_docs
    sids = spark.range(span_n).withColumnRenamed("id", "doc_id")
    uni_span = sids.select(
        "doc_id",
        synth_words(F.lit(40), 500, F.col("doc_id"), "s").alias("text"),
    ).localCheckpoint(eager=True)
    hot_span = sids.select(
        "doc_id",
        synth_words(
            F.when(F.col("doc_id") == 0, 300_000).otherwise(F.lit(40)),
            500,
            F.col("doc_id"),
            "s",
        ).alias("text"),
    ).localCheckpoint(eager=True)
    results["span_uniform_secs"] = _best(
        lambda: _noop(dup_span_coverage(uni_span, n=5, min_df=2))
    )
    results["span_hot_secs"] = _best(
        lambda: _noop(dup_span_coverage(hot_span, n=5, min_df=2))
    )

    # ---- ngram_novelty ----------------------------------------------------
    # The joinless rollup claim: novelty needs no per-gram join back, so a
    # boilerplate gram shared by EVERY document (the key that would funnel
    # all its owners through one join task in the naive plan) only flows
    # through the map-side-combined min/first-seen aggregate.  Hot shape:
    # the same 5-word header prepended to every doc (5 corpus-wide hot
    # grams across doc boundaries) vs fully distinct texts.
    from kafka_connect_tablestore_spark.operators.dedup import ngram_novelty

    nov_ids = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    uni_nov = nov_ids.select(
        "doc_id",
        synth_words(F.lit(40), 2_000_000, F.col("doc_id"), "n").alias("text"),
    ).localCheckpoint(eager=True)
    hot_nov = nov_ids.select(
        "doc_id",
        F.concat(
            F.lit("shared header words one two three "),
            synth_words(F.lit(40), 2_000_000, F.col("doc_id"), "n"),
        ).alias("text"),
    ).localCheckpoint(eager=True)
    results["novelty_uniform_secs"] = _best(lambda: _noop(ngram_novelty(uni_nov)))
    results["novelty_hot_secs"] = _best(lambda: _noop(ngram_novelty(hot_nov)))

    out = {
        "metric": "pipeline window-operator skew resilience (best-of-2)",
        "n_docs_tfidf": n_docs,
        "n_docs_pack": pack_n,
        "n_docs_cap": cap_n,
        **results,
    }
    print(json.dumps(out))

    repo = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(repo, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            "\n## Skew resilience — pipeline window operators (round 5)\n\n"
            f"Hot-key stress for the three window-using pipeline operators "
            f"(best-of-2, noop sink, local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]):\n\n"
            "| operator | uniform | hot | hot shape |\n|---|---|---|---|\n"
            f"| tfidf_topk ({n_docs:,} docs) | {results['tfidf_uniform_secs']} s "
            f"| {results['tfidf_hot_secs']} s | one doc with 500k distinct words "
            f"+ a stop-word in every doc |\n"
            f"| pack_sequences ({pack_n:,} docs) | {results['pack_uniform_secs']} s "
            f"| {results['pack_hot_layout_secs']} s | whole corpus pre-sorted in "
            f"ONE input partition |\n"
            f"| cap_per_domain salted ({cap_n:,} docs) | "
            f"{results['cap_salted_uniform_secs']} s | {results['cap_salted_hot_secs']} s "
            f"| one domain holds 90% of docs |\n"
            f"| cap_per_domain single-window (pre-r5 contrast) | — | "
            f"{results['cap_window_hot_secs']} s | same hot input, unsalted "
            f"row_number |\n"
            f"| dup_span_coverage ({span_n:,} docs) | "
            f"{results['span_uniform_secs']} s | {results['span_hot_secs']} s "
            f"| one doc holds 300k words, tiny vocab (every window "
            f"duplicated) |\n\n"
            "tfidf's hot doc costs one window task of 500k rows (bounded by the "
            "doc's vocabulary, not the corpus); pack's group key is a hash of "
            "the id, so even a single-partition sorted input spreads across all "
            "32 group streams after one shuffle; the salted cap bounds "
            "per-domain window volume at n_salts x max_docs rows however hot "
            "the domain, while the unsalted contrast funnels the hot domain's "
            "full row set through one task; dup_span's sweep is per-doc, so "
            "its hot cost is the serial lag scan of the one giant doc's own "
            "positions — bounded by document length, never corpus size.\n"
        )


if __name__ == "__main__":
    main()
