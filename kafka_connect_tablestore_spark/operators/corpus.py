"""Corpus-assembly operators for large-scale training-data pipelines:
PII redaction, sequence packing, mixture sampling, span-level exact dedup,
and deterministic global shuffle.

These are the steps BETWEEN cleaning/dedup and the trainer: redact what must
never be trained on, decide the source mixture, deduplicate repeated spans
inside surviving documents, pack documents into fixed-token-budget bins, and
shuffle the result reproducibly.  Everything is a pure Catalyst expression
or a key-local window — no Python in the data path, no global sort, and no
driver-side collection beyond config-bounded summaries (the DSIR bucket
distributions, ≤ ``n_buckets`` rows) — so each op is a map stage or a
single key-local shuffle at any scale.

All hash math is the shared md5-hex→int64 family (``functions.text.hash64``)
so every operator has a bit-identical DuckDB oracle, and every sampling /
shuffling decision is a pure per-row function of (id, seed) — stable under
repartitioning, re-execution, and engine choice (unlike ``df.sample`` /
``rand()``, which are seeded per partition).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import hash64, words

#: Redaction patterns — the common Java-regex / RE2 subset so the Spark and
#: DuckDB engines replace the exact same spans.  Order matters: emails are
#: struck before IPs and digit runs so an address is never half-eaten.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}(\.\d{1,3}){3}\b"
LONGNUM_RE = r"\d{9,}"


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Strike emails, IPv4 addresses, and long digit runs (card/account
    numbers) from ``text_col``, emitting per-category hit counts and the
    redacted text.

    The privacy gate every web-scale corpus needs before training.  Pure
    per-row ``regexp_replace`` / ``regexp_extract_all`` expressions — fused
    into the scan by codegen, map-only at 100 TB.  Patterns are restricted
    to the Java-regex ∩ RE2 subset so the DuckDB oracle replaces identical
    spans (``regexp_replace(..., 'g')``).
    """
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0)))
    step1 = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    n_ips = F.size(F.regexp_extract_all(step1, F.lit(IPV4_RE), F.lit(0)))
    step2 = F.regexp_replace(step1, IPV4_RE, "<IP>")
    n_nums = F.size(F.regexp_extract_all(step2, F.lit(LONGNUM_RE), F.lit(0)))
    step3 = F.regexp_replace(step2, LONGNUM_RE, "<NUM>")
    return df.select(
        F.col(id_col),
        n_emails.cast("long").alias("n_emails"),
        n_ips.cast("long").alias("n_ips"),
        n_nums.cast("long").alias("n_longnums"),
        step3.alias("redacted"),
    )


def _default_parallelism(df: DataFrame) -> int:
    """Cluster-derived default for per-group/per-shard operators: one sorted
    stream per core.  ``defaultParallelism`` tracks total executor cores on
    a real cluster (and local[N]'s N), so the per-task window workload
    shrinks as the cluster grows instead of being pinned at a toy constant
    — at 100 TB a fixed n_groups=8 would put ~12 TB through each window
    task."""
    return max(1, df.sparkSession.sparkContext.defaultParallelism)


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 256,
    n_groups: int | None = None,
) -> DataFrame:
    """Concatenate-and-chunk sequence packing: assign each document a
    (pack_group, bin, start_offset) so that concatenating a group's docs in
    order and splitting every ``budget`` tokens yields the trainer's
    fixed-length sequences.

    ``pack_group = hash64(id) % n_groups`` spreads the corpus over
    independent packing streams; within a group, a running token total
    (window cumsum ordered by id — key-local shuffle, no global sort)
    places each doc at ``start = cum - n_tokens``, in
    ``bin = start / budget``.  All-integer math, so the DuckDB oracle is
    bit-identical.  At 100 TB: ``n_groups`` defaults to the session's
    ``defaultParallelism`` (one sorted stream per core), and the window is
    the only shuffle.  Pass ``n_groups`` explicitly when the grouping must
    be reproducible across differently-sized clusters (the oracle queries
    do) — the derived default trades that for scale-proportional
    parallelism.
    """
    if n_groups is None:
        n_groups = _default_parallelism(df)
    if budget <= 0 or n_groups <= 0:
        raise ValueError("budget and n_groups must be positive")
    idc = F.col(id_col)
    base = df.select(
        idc,
        F.pmod(hash64(idc.cast("string"), "pack"), F.lit(n_groups))
        .cast("int")
        .alias("pack_group"),
        # null text must pack as a zero-token doc, not propagate null
        # through the cumsum: a null n_tokens nulls bin_id/start_offset
        # and the doc silently vanishes from the packed layout while its
        # neighbors' offsets show no gap
        F.coalesce(F.size(words(text_col)), F.lit(0))
        .cast("long")
        .alias("n_tokens"),
    )
    w = (
        Window.partitionBy("pack_group")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    start = cum - F.col("n_tokens")
    return base.select(
        id_col,
        "pack_group",
        "n_tokens",
        F.floor(start / budget).cast("long").alias("bin_id"),
        F.pmod(start, F.lit(budget)).cast("long").alias("start_offset"),
    )


def mixture_sample(
    df: DataFrame,
    group_col: str,
    target_pct: dict[str, int],
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic data-mixture sampling: downsample groups so the output
    approaches the target composition ``target_pct`` (integer percents).

    Where ``stratified_sample`` applies caller-given rates, this op derives
    them FROM the data: the largest total ``T`` such that every group can
    supply its share is ``min_g floor(count_g * 100 / pct_g)``; group g then
    keeps ``k_g = floor(pct_g * T / 100)`` rows via the exact integer gate
    ``(hash64(id) % 1_000_000) * count_g < k_g * 1_000_000`` — uniform,
    reproducible under any partitioning, and identical in DuckDB (pure
    BIGINT arithmetic, no float rates).  Groups absent from ``target_pct``
    are dropped.

    Scale shape: one map-side-combined count per group (output is
    group-cardinality-sized, tiny), a one-row min() reduction, a broadcast
    join of the per-group quotas back onto the corpus, then a map-only
    filter — the corpus itself never shuffles.
    """
    if not target_pct or any(p <= 0 for p in target_pct.values()):
        raise ValueError("target_pct must map groups to positive percents")
    g = F.col(group_col)
    # counts over ALL targeted groups, absent ones at 0: a group the data
    # cannot supply forces T = 0 (empty output, per the documented "every
    # group can supply its share") instead of silently renormalizing the
    # mixture over whichever groups happen to exist — e.g. a typo'd group
    # key must not yield a full-volume single-group "mixture".
    targets = df.sparkSession.createDataFrame(
        [(k,) for k in sorted(target_pct)], f"{group_col} string"
    )
    counts = targets.join(
        df.where(g.isin(*target_pct.keys()))
        .groupBy(group_col)
        .agg(F.count("*").alias("grp_n")),
        group_col,
        "left",
    ).select(group_col, F.coalesce("grp_n", F.lit(0)).alias("grp_n"))
    pct = F.create_map(
        *[F.lit(x) for kv in sorted(target_pct.items()) for x in kv]
    )
    quotas = counts.select(
        group_col,
        "grp_n",
        pct[g].cast("long").alias("grp_pct"),
    ).select(
        group_col,
        "grp_n",
        "grp_pct",
        F.floor(F.col("grp_n") * 100 / F.col("grp_pct")).alias("grp_t"),
    )
    t_total = quotas.agg(F.min("grp_t").alias("t_total"))
    plan = quotas.crossJoin(F.broadcast(t_total)).select(
        group_col,
        "grp_n",
        F.floor(F.col("grp_pct") * F.col("t_total") / 100).alias("grp_k"),
    )
    gate = F.pmod(hash64(F.col(id_col).cast("string"), "mix"), F.lit(1_000_000))
    return (
        df.join(F.broadcast(plan), group_col)
        .where(gate * F.col("grp_n") < F.col("grp_k") * F.lit(1_000_000))
        .select(id_col, group_col)
    )


def mixture_plan(
    df: DataFrame,
    weights: dict[str, float],
    budget_tokens: int,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Token-budget data-recipe planner: given target mixture ``weights``
    and a total training ``budget_tokens``, emit per-source token supply,
    target share, target token count, and the implied EPOCH count
    ``target/supply`` — the LLaMA-style recipe table where high-value small
    sources repeat (epochs > 1) and bulk sources are subsampled
    (epochs < 1).  The planning complement of the samplers: where
    ``mixture_sample``/``temperature_sample`` decide which rows survive,
    this op tells the operator what the budget implies BEFORE anything is
    dropped — the number a human signs off on.

    One group-cardinality aggregate (map-side combined token sums); all
    arithmetic on exact BIGINT supplies (shares = weight/Σweights computed
    driver-side into literals).  Groups absent from ``weights`` get weight
    0 (reported, target 0); weighted groups absent from the data raise —
    a recipe demanding tokens a corpus cannot supply at any epoch count is
    a config error, not a row to silently omit."""
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("weights must map groups to non-negative numbers")
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive, got {budget_tokens}")
    from ..functions.text import token_count

    wsum = float(sum(weights.values()))
    totals = df.groupBy(group_col).agg(
        F.sum(token_count(text_col)).cast("long").alias("n_tokens")
    )
    present = {r[0] for r in totals.select(group_col).collect()}
    missing = sorted(set(weights) - present)
    if missing:
        raise ValueError(f"weighted groups absent from the data: {missing}")
    share = F.lit(0.0)
    for g, w in sorted(weights.items()):
        share = F.when(F.col(group_col) == g, F.lit(w / wsum)).otherwise(share)
    return totals.select(
        group_col,
        "n_tokens",
        F.round(share, 6).alias("target_share"),
        F.floor(share * F.lit(float(budget_tokens))).cast("long").alias(
            "target_tokens"
        ),
        F.round(
            share * F.lit(float(budget_tokens)) / F.col("n_tokens"), 4
        ).alias("epochs"),
    )


def temperature_rates(
    df: DataFrame,
    group_col: str = "lang",
    alpha: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Temperature-based mixture rates (the multilingual-LM sampler of
    mBERT / XLM-R, arXiv:1901.07291 §3.1): with group token shares
    ``p_g = n_g / N``, the target distribution is ``q_g ∝ p_g^alpha`` —
    ``alpha`` < 1 flattens the mixture toward rare groups.  A filter can
    only DOWN-sample, so the realized keep rate normalizes the largest
    relative boost to 1: ``rate_g = (min_g n_g / n_g)^(1-alpha)`` — the
    smallest group keeps everything, dominant groups are thinned by
    exactly the temperature-implied factor.

    CROSS-ENGINE DETERMINISM: the rate is a power of a ratio of exact
    BIGINT token totals.  At the default ``alpha = 0.5`` it is
    ``sqrt(min_n / n_g)`` — IEEE-754 requires division and sqrt to be
    correctly rounded, so Spark and DuckDB produce bit-identical rates;
    other alphas go through libm ``pow`` (agreeing to ≥ 15 significant
    digits, guarded by the gate's fixed-point rounding).

    Scale shape (mirrors :func:`mixture_sample`): one map-side-combined
    token-sum per group (output is group-cardinality-sized), a one-row
    ``min`` reduction broadcast back — the corpus itself never shuffles.
    Emits ``(group, n_tokens, share, keep_rate)``."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    from ..functions.text import token_count

    totals = df.groupBy(group_col).agg(
        F.sum(token_count(text_col)).cast("long").alias("n_tokens")
    )
    floor_ = totals.agg(
        F.min("n_tokens").alias("_min_n"),
        F.sum("n_tokens").alias("_sum_n"),
    )
    return totals.crossJoin(F.broadcast(floor_)).select(
        group_col,
        "n_tokens",
        F.round(F.col("n_tokens") / F.col("_sum_n"), 6).alias("share"),
        F.round(_boost(F.col("_min_n") / F.col("n_tokens"), alpha), 6).alias(
            "keep_rate"
        ),
    )


def _boost(ratio, alpha: float):
    """(min_n/n_g)^(1-alpha) — via ``sqrt`` at the default alpha=0.5, which
    IEEE-754 requires to be correctly rounded (bit-identical across
    engines), falling back to libm ``pow`` for other alphas."""
    return F.sqrt(ratio) if alpha == 0.5 else F.pow(ratio, F.lit(1.0 - alpha))


def temperature_sample(
    df: DataFrame,
    group_col: str = "lang",
    alpha: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply :func:`temperature_rates` as a deterministic per-row hash gate:
    keep a row iff ``hash64(id, 'temp') % 1_000_000 <
    floor(rate_g · 1_000_000 + 0.5)``.  Like ``stratified_sample`` the gate
    is a pure per-row expression — stable under repartitioning, identical
    in the DuckDB twin — but the rates come FROM the data via the
    temperature rule instead of the caller.  One broadcast join of the
    group-cardinality rate table, then a map-only filter; zero corpus
    shuffles."""
    rates = temperature_rates(df, group_col, alpha, text_col)
    # the gate uses the UN-rounded rate: recompute from the exact integer
    # token totals carried on the rate row (round-6 display column stays
    # display-only, same policy as the jaccard/containment verifies)
    floor_n = rates.agg(F.min("n_tokens").alias("_min_n"))
    plan = (
        rates.crossJoin(F.broadcast(floor_n))
        .select(
            group_col,
            F.floor(
                _boost(F.col("_min_n") / F.col("n_tokens"), alpha)
                * F.lit(1_000_000)
                + F.lit(0.5)
            ).cast("long").alias("_gate"),
        )
    )
    h = F.pmod(hash64(F.col(id_col).cast("string"), "temp"), F.lit(1_000_000))
    return (
        df.join(F.broadcast(plan), group_col)
        .where(h < F.col("_gate"))
        .select(id_col, group_col)
    )



def _reassembled_text(keep_cond) -> Column:
    """Concatenation of a doc's chunks whose ``keep_cond`` holds, in
    position order — the ONE reassembly convention (separator, sort key)
    shared by :func:`chunk_dedup`, :func:`strip_boilerplate`, and
    :func:`incremental_chunk_dedup`.  Their outputs' equality is a tested
    invariant (batch vs incremental), so the convention must not fork."""
    return F.concat_ws(
        " ",
        F.transform(
            F.array_sort(
                F.collect_list(F.when(keep_cond, F.struct("pos", "chunk")))
            ),
            lambda s: s["chunk"],
        ),
    )


def chunk_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 16,
) -> DataFrame:
    """Span-level exact dedup: split each document into fixed
    ``chunk_words``-word chunks, keep each distinct chunk only at its first
    occurrence (ordered by (id, position)), and reassemble the surviving
    text — the intra-corpus repeated-passage (boilerplate / licence header /
    template) remover that document-level dedup cannot express.

    Relational shape: chunk (map) → posexplode → first-occurrence
    window over the chunk fingerprint (ONE shuffle, on the chunk key —
    never all-pairs) → per-doc reassembly (shuffle on the doc key).
    Emits per-doc chunk totals, survivors, and the md5 of the reassembled
    text; docs whose chunks were all seen elsewhere survive with
    ``n_kept = 0`` and the empty-text hash.
    """
    if chunk_words <= 0:
        raise ValueError("chunk_words must be positive")
    rows = _chunk_rows(df, text_col, id_col, chunk_words)
    first = Window.partitionBy("chunk_md5").orderBy(id_col, "pos")
    marked = rows.withColumn("kept", F.row_number().over(first) == 1)
    agg = marked.groupBy(id_col).agg(
        F.count("chunk").cast("long").alias("n_chunks"),
        F.sum(F.when(F.col("kept"), 1).otherwise(0)).cast("long").alias("n_kept"),
        F.md5(_reassembled_text(F.col("kept"))).alias("clean_md5"),
    )
    # docs whose text produced no chunks (null text) re-enter with zeros
    return df.select(F.col(id_col)).join(agg, id_col, "left").select(
        id_col,
        F.coalesce("n_chunks", F.lit(0)).alias("n_chunks"),
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("clean_md5", F.md5(F.lit(""))).alias("clean_md5"),
    )


def strip_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 16,
    min_df: int = 2,
    emit_text: bool = False,
) -> DataFrame:
    """Frequent-span (boilerplate) removal, CCNet-style: any chunk that
    appears in ``min_df`` or more DISTINCT documents is removed from EVERY
    document — including its first occurrence.  The complement of
    :func:`chunk_dedup`: dedup keeps one copy of a repeated passage;
    boilerplate removal says a span repeated across enough documents
    (cookie banner, licence header, nav template) is noise everywhere and
    keeps zero copies.

    Relational shape: chunk (map, via the shared :func:`_chunk_rows`
    boundary truth) → distinct-doc frequency per chunk fingerprint (ONE
    map-side-combined shuffle on the chunk key) → the over-threshold
    fingerprint set joins back against the chunk rows (AQE picks broadcast
    when the boilerplate set is small — by construction it holds only
    chunks crossing ``min_df``, a tiny fraction of distinct chunks at web
    scale) → per-doc reassembly (one shuffle on the doc key).  Never
    all-pairs, no window.

    Emits per-doc chunk totals, removed-chunk counts, and the md5 of the
    reassembled text (``emit_text=True`` adds the reassembled text itself
    as ``clean_text`` — the pipeline-consumable form; the md5 stays the
    compact cross-engine comparison key).  Chunk-less docs (null/empty
    text) re-enter with zeros and the empty-text hash, mirroring
    :func:`chunk_dedup`.
    """
    if chunk_words <= 0:
        raise ValueError("chunk_words must be positive")
    if min_df < 1:
        raise ValueError("min_df must be >= 1")
    rows = _chunk_rows(df, text_col, id_col, chunk_words)
    boiler = (
        rows.groupBy("chunk_md5")
        .agg(F.countDistinct(id_col).alias("_df"))
        .where(F.col("_df") >= min_df)
        .select("chunk_md5", F.lit(True).alias("_boiler"))
    )
    marked = rows.join(boiler, "chunk_md5", "left")
    clean_text = _reassembled_text(F.col("_boiler").isNull())
    aggs = [
        F.count("chunk").cast("long").alias("n_chunks"),
        F.sum(F.when(F.col("_boiler"), 1).otherwise(0))
        .cast("long")
        .alias("n_removed"),
        F.md5(clean_text).alias("clean_md5"),
    ]
    if emit_text:
        aggs.append(clean_text.alias("clean_text"))
    agg = marked.groupBy(id_col).agg(*aggs)
    out_cols = [
        F.col(id_col),
        F.coalesce("n_chunks", F.lit(0)).alias("n_chunks"),
        F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
        F.coalesce("clean_md5", F.md5(F.lit(""))).alias("clean_md5"),
    ]
    if emit_text:
        out_cols.append(F.coalesce("clean_text", F.lit("")).alias("clean_text"))
    return df.select(F.col(id_col)).join(agg, id_col, "left").select(*out_cols)


def global_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int | None = None,
    seed: str = "shuf",
) -> DataFrame:
    """Deterministic global shuffle for training-order assignment: place
    every row at a reproducible (shard, position) drawn from
    ``hash64(id, seed)``.  Re-running on re-partitioned or re-ordered
    input yields the same permutation; under incremental GROWTH the shard
    assignment of surviving rows is stable, but positions are stable only
    for a fixed input set (a new row hashing before an existing one shifts
    the later positions within its shard — exactly what
    ``test_global_shuffle_stable_and_incremental`` asserts).

    ``shard = key % n_shards`` then position by ``row_number`` ordered by
    the key within the shard: shards sort independently (one key-local
    shuffle, no global sort).  ``n_shards`` defaults to the session's
    ``defaultParallelism`` so each shard is one core-sized sorted stream /
    trainer input file at any cluster size; pass it explicitly when shard
    layout must be reproducible across clusters (the oracle queries do).
    """
    if n_shards is None:
        n_shards = _default_parallelism(df)
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    key = hash64(F.col(id_col).cast("string"), seed)
    base = df.select(
        F.col(id_col),
        key.alias("_key"),
        F.pmod(key, F.lit(n_shards)).cast("int").alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("_key", id_col)
    return base.select(
        id_col,
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )


# --------------------------------------------------- persisted chunk index
#
# The production shape of span-level dedup at 100 TB: the corpus's
# first-occurrence chunk fingerprints are computed ONCE and persisted as a
# bucketed parquet index; each day's new batch probes the index instead of
# re-chunking the corpus (the same incremental pattern as the persisted
# MinHash-LSH index in operators/dedup.py).

def _chunk_rows(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_words: int,
    n_buckets: int | None = None,
) -> DataFrame:
    """(id, pos, chunk, chunk_md5[, bucket]) rows — the single source of
    chunk-boundary truth for both :func:`chunk_dedup` and the persisted
    index (they must agree or incremental results diverge from the batch
    operator).  Outer explode so the optimizer never infers a scan-level
    filter that re-inlines the chunk expression tree (see
    operators/decontam.py for the mechanism)."""
    idc = F.col(id_col)
    w = words(text_col)
    base = df.select(idc, w.alias("_w")).select(
        idc,
        # words('') is [''] (split of the empty string), so size>0 alone
        # would emit one phantom empty chunk per blank doc — which would
        # then mark every blank doc a duplicate of the first, poison the
        # boilerplate table with md5(''), and persist into the chunk index
        F.when(
            (F.size("_w") > 0) & (F.element_at("_w", 1) != F.lit("")),
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.ceil(F.size("_w") / chunk_words).cast("int"),
                ),
                lambda i: F.concat_ws(
                    " ", F.slice("_w", (i - 1) * chunk_words + 1, chunk_words)
                ),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("chunks"),
    )
    md5c = F.md5("chunk")
    cols = [idc, F.col("pos"), F.col("chunk"), md5c.alias("chunk_md5")]
    if n_buckets is not None:
        cols.append(
            F.pmod(
                F.conv(F.substring(md5c, 1, 15), 16, 10).cast("long"),
                F.lit(n_buckets),
            )
            .cast("int")
            .alias("bucket")
        )
    return (
        base.select(idc, F.posexplode_outer("chunks").alias("pos", "chunk"))
        .where(F.col("chunk").isNotNull())
        .select(*cols)
    )


def build_chunk_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 16,
    n_buckets: int = 64,
) -> None:
    """Materialize the corpus's first-occurrence chunk fingerprints as a
    parquet index ``partitionBy(bucket)`` — one row per DISTINCT chunk,
    carrying the (id, pos) that owns it."""
    from .index_maint import ensure_index_params

    ensure_index_params(
        path,
        {"chunk_words": chunk_words, "n_buckets": n_buckets},
        overwrite=True,
    )
    rows = _chunk_rows(df, text_col, id_col, chunk_words, n_buckets)
    first = Window.partitionBy("chunk_md5").orderBy(id_col, "pos")
    (
        rows.withColumn("_rn", F.row_number().over(first))
        .where(F.col("_rn") == 1)
        .select("chunk_md5", id_col, "pos", "bucket")
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def incremental_chunk_dedup(
    spark,
    index_path: str,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 16,
    n_buckets: int = 64,
) -> tuple[DataFrame, DataFrame]:
    """Dedupe a NEW batch's chunks against the persisted corpus index plus
    within-batch first occurrences, without touching the corpus text.

    Precondition: batch ids must sort AFTER every indexed id (the natural
    shape of append-only daily ingest with monotone ids).  Under that
    ordering the result is exactly the rows ``chunk_dedup(corpus ∪ new)``
    would emit for the new docs.  With interleaved ids the semantics are
    INDEX-PRECEDENCE instead: a chunk already in the index keeps its
    indexed owner even when a new doc's id sorts before it (the batch
    operator would flip first-occurrence to the new doc) — the two paths
    deliberately diverge there, and the equality tests use monotone ids.

    Returns ``(per_doc, kept_rows)``: ``per_doc`` has chunk_dedup's schema
    for every new doc; ``kept_rows`` are the surviving chunk fingerprints,
    ready for :func:`append_to_chunk_index` once the batch commits.

    Scale shape: the batch's hit-set is found by streaming ONLY the index
    buckets the batch's fingerprints can land in (partition-pruned IN
    filter, the same bounded driver collect the IVF probe uses) with the
    small batch side broadcast; both remaining joins broadcast the
    batch-sized side.  The corpus is never read."""
    new_rows = _chunk_rows(
        new_docs, text_col, id_col, chunk_words, n_buckets
    ).localCheckpoint(eager=False)
    probe_buckets = [
        r[0] for r in new_rows.select("bucket").distinct().collect()
    ]
    idx = spark.read.parquet(index_path)
    if probe_buckets:
        idx = idx.where(F.col("bucket").isin(probe_buckets))
    # self-exclusion: index chunk rows owned by a batch id never testify
    # against the batch — a crash-replay re-probing after its own append
    # landed would otherwise mark every first-occurrence chunk indexed
    # and commit n_kept=0 / clean_md5=md5('') for the whole batch.
    idx = idx.join(
        F.broadcast(new_docs.select(F.col(id_col)).distinct()),
        id_col,
        "left_anti",
    )
    hits = (
        idx.join(
            F.broadcast(new_rows.select("chunk_md5").distinct()), "chunk_md5"
        )
        .select("chunk_md5")
        .distinct()
        .withColumn("_indexed", F.lit(True))
    )
    first = Window.partitionBy("chunk_md5").orderBy(id_col, "pos")
    # lazy-checkpoint the shared probe result: per_doc and kept_rows are
    # both views of it, and a caller acting on each (write per_doc, then
    # append kept) would otherwise re-run the pruned index scan + joins +
    # window a second time — the checkpoint materializes once at the first
    # action and the second view reuses it (the new_rows pattern above)
    marked = (
        new_rows.withColumn("_rn", F.row_number().over(first))
        .join(F.broadcast(hits), "chunk_md5", "left")
        .withColumn(
            "kept",
            (F.col("_rn") == 1) & F.col("_indexed").isNull(),
        )
        .localCheckpoint(eager=False)
    )
    all_ids = new_docs.select(F.col(id_col))
    per_doc = (
        marked.groupBy(id_col)
        .agg(
            F.count("chunk").cast("long").alias("n_chunks"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.md5(_reassembled_text(F.col("kept"))).alias("clean_md5"),
        )
        .join(all_ids, id_col, "right")
        .select(
            id_col,
            F.coalesce("n_chunks", F.lit(0)).alias("n_chunks"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("clean_md5", F.md5(F.lit(""))).alias("clean_md5"),
        )
    )
    kept_rows = marked.where(F.col("kept")).select(
        "chunk_md5", id_col, "pos", "bucket"
    )
    return per_doc, kept_rows


def append_to_chunk_index(kept_rows: DataFrame, path: str) -> None:
    """Append a committed batch's surviving chunk fingerprints to the index
    — ids must be disjoint from the indexed corpus."""
    (
        kept_rows.repartition("bucket")
        .write.mode("append")
        .partitionBy("bucket")
        .parquet(path)
    )


#: URL pattern — Java-regex ∩ RE2 subset; host captured for domain work.
URL_RE = r"https?://([A-Za-z0-9.-]+)(/[^\s]*)?"

#: Embedded two-label public suffixes (the common ccTLD second-level
#: registries from the Mozilla Public Suffix List — publicsuffix.org).
#: A host whose last two labels are one of these registers at the THIRD
#: label (``shop.example.co.uk`` → ``example.co.uk``); anything else
#: registers at the second (``sub.example.com`` → ``example.com``).
#: Deliberately a small curated subset: the full PSL (~10k rules incl.
#: wildcards/exceptions) would ship as a broadcast table the same way —
#: this covers the registries that actually dominate web-crawl URL volume.
PUBLIC_SUFFIXES_2LABEL: tuple[str, ...] = (
    "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk", "org.uk",
    "plc.uk", "sch.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au", "asn.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp", "gr.jp",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "geek.nz",
    "co.za", "org.za", "net.za", "gov.za", "ac.za", "web.za",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "ind.in", "ac.in",
    "gov.in", "edu.in", "res.in",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr", "pe.kr",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "web.tr",
    "co.il", "net.il", "org.il", "gov.il", "ac.il", "muni.il",
    "co.id", "net.id", "or.id", "web.id", "ac.id", "go.id", "sch.id",
    "com.my", "net.my", "org.my", "edu.my", "gov.my",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg",
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa",
    "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl",
    "co.th", "in.th", "or.th", "ac.th", "go.th", "net.th",
)


def registrable_domain(host_col):
    """Registrable-domain expression over a host column: PSL-aware last-two
    vs last-three label split.  The suffix set ships as ONE array literal
    (``array_contains`` — constant-folded, no join, no Python); hosts with
    a single label pass through unchanged.

    The host is lowercased first: DNS names are case-insensitive and the
    URL regex admits ``A-Z``, so without this an ``EXAMPLE.CO.UK`` host
    would miss the lowercase PSL table and register as ``CO.UK`` —
    merging every uppercase ccTLD host into one bogus domain.

    Two host shapes are normalized before the label split (both admitted
    by the URL regex and abused in the wild to evade naive filters):
    trailing-dot FQDNs (``evil.example.com.`` is the same DNS name as
    ``evil.example.com`` — without stripping, the empty final label makes
    ``last2 = 'com.'`` and a blocklisted domain sails through), and
    all-numeric IPv4-style hosts, which have no registrable-domain
    structure at all and register WHOLE (splitting them at the last two
    octets would merge unrelated IP-hosted sites into one pseudo-domain
    and make IP blocklist entries unmatchable)."""
    host = host_col if not isinstance(host_col, str) else F.col(host_col)
    host = F.regexp_replace(F.lower(host), r"\.+$", "")
    parts = F.split(host, r"\.")
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    suffixes = F.lit(list(PUBLIC_SUFFIXES_2LABEL))
    return (
        F.when(host.rlike(r"^\d+(\.\d+)*$"), host)
        .when(
            (F.size(parts) >= 3) & F.array_contains(suffixes, last2),
            F.concat_ws(".", F.element_at(parts, -3), last2),
        )
        .when(F.size(parts) >= 2, last2)
        .otherwise(host)
    )


def cap_per_domain(
    df: DataFrame,
    max_docs: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_salts: int | None = None,
) -> DataFrame:
    """Per-registrable-domain document cap — the source-diversity guard
    every web-scale pipeline applies after :func:`url_domain_stats` shows
    a few domains dominating the crawl: keep at most ``max_docs``
    documents per domain, selected by the deterministic hash order
    ``hash64(id, 'domcap')`` (uniform within the domain, reproducible
    under any partitioning — NOT first-crawled order, which over-selects
    whatever the crawler visited early).

    A document's domain is the registrable domain of its FIRST embedded
    URL (the canonical source attribution); documents with no URL carry no
    source and pass uncapped.  Emits ``(id_col, domain, kept)`` for every
    input document — callers filter on ``kept`` and join survivors back.

    Shape — salted two-phase exact top-k, so a hot domain can never
    serialize into one window task (at web scale a single host can hold
    10^8+ docs; a plain ``Window.partitionBy(domain)`` would funnel all of
    them through one ``row_number``):

    1. *Salted pre-rank*: rank within ``(domain, salt)`` where
       ``salt = pmod(_h, n_salts)``.  A row in its domain's global
       top-``max_docs`` by ``(_h, id)`` has fewer than ``max_docs``
       predecessors overall, hence fewer than ``max_docs`` in its own salt
       bucket, so its bucket-local rank is ≤ ``max_docs`` — phase 1 keeps
       an exact superset of every domain's true top set and definitively
       rejects the rest (bucket rank > ``max_docs`` ⇒ ≥ ``max_docs``
       global predecessors ⇒ ``kept = false``).
    2. *Exact rank on the bounded survivor set*: ≤ ``n_salts × max_docs``
       rows per domain regardless of domain size, so the per-domain window
       task is bounded by configuration, not by the crawl's skew.

    The result is bit-identical to the single-window formulation for every
    ``n_salts`` (the oracle twin keeps the one-window SQL).  The URL-less
    branch never enters either window — "no URL" can be a large fraction
    of the corpus, and ranking it would recreate the hot-key problem on
    the NULL domain.
    """
    if max_docs <= 0:
        raise ValueError("max_docs must be positive")
    if n_salts is None:
        # one salt stream per core, bounded so phase 2 stays small:
        # per-domain phase-2 volume is n_salts * max_docs
        n_salts = min(64, max(8, _default_parallelism(df)))
    host = F.regexp_extract(F.col(text_col), URL_RE, 1)
    base = df.select(
        F.col(id_col),
        F.when(host != "", registrable_domain(host)).alias("domain"),
        hash64(F.col(id_col).cast("string"), "domcap").alias("_h"),
    )
    w1 = Window.partitionBy("domain", "_salt").orderBy("_h", id_col)
    pre = (
        base.where(F.col("domain").isNotNull())
        .withColumn("_salt", F.pmod(F.col("_h"), F.lit(n_salts)))
        .withColumn("_r1", F.row_number().over(w1))
    )
    rejected = pre.where(F.col("_r1") > max_docs).select(
        id_col, "domain", F.lit(False).alias("kept")
    )
    w2 = Window.partitionBy("domain").orderBy("_h", id_col)
    finalists = pre.where(F.col("_r1") <= max_docs).select(
        id_col,
        "domain",
        (F.row_number().over(w2) <= max_docs).alias("kept"),
    )
    no_dom = base.where(F.col("domain").isNull()).select(
        id_col, "domain", F.lit(True).alias("kept")
    )
    return finalists.unionByName(rejected).unionByName(no_dom)


def url_domain_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-registrable-domain document counts over the URLs embedded in a
    corpus — the input to domain-level filtering (blocklists, per-domain
    caps, source diversity stats) every web-scale pipeline applies.

    Extracts every URL host, normalizes to the registrable domain via
    :func:`registrable_domain` (embedded public-suffix subset, so
    ``a.co.uk`` and ``b.co.uk`` are DISTINCT domains while
    ``x.example.com`` and ``y.example.com`` merge), and counts DISTINCT
    documents per domain.  Shape: map-only extract + outer explode + one
    map-side-combined groupBy on the domain key.
    """
    hosts = F.regexp_extract_all(F.col(text_col), F.lit(URL_RE), F.lit(1))
    exploded = df.select(
        F.col(id_col), F.explode_outer(hosts).alias("host")
    ).where(F.col("host").isNotNull())
    return (
        exploded.select(registrable_domain("host").alias("domain"), F.col(id_col))
        .distinct()
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


#: Query parameters that never change page content — the analytics /
#: click-tracking junk every crawl pipeline strips before URL-level dedup
#: (the utm_* family is Google Analytics' public convention; the click ids
#: are the public ad-platform parameters).  One alternation regex so both
#: engines filter with a single anchored match per parameter.
#: bare ``ref`` is deliberately NOT stripped: unlike the pure trackers
#: here, it selects content on real sites (a GitLab/GitHub ``?ref=<branch>``
#: raw-file view serves different bytes per value), and canonical_url's
#: contract is "never change page content" — a stray referral ``ref`` costs
#: one duplicate doc that dedup catches anyway, the cheaper failure mode.
TRACKING_PARAM_RE = (
    r"^(utm_[a-z]+|gclid|fbclid|msclkid|mc_eid|igshid|ref_src)="
)


def canonical_url(url_col) -> Column:
    """Canonical form of an absolute ``http(s)`` URL, as one pure Catalyst
    expression — the normalization every URL-keyed stage (frontier dedup,
    per-URL joins, revisit detection) applies first, since crawls observe
    the same page under fragment/tracking/case/port variants.

    Rules (each chosen to be content-preserving and 1:1 expressible in
    ANSI-ish SQL for the DuckDB twin):

    * scheme and host lowercased (both case-insensitive per RFC 3986);
    * fragment dropped (never sent to the server);
    * default port stripped (``:80`` for http, ``:443`` for https);
    * empty path → ``/`` (``http://a.com`` ≡ ``http://a.com/``);
    * tracking query parameters removed (:data:`TRACKING_PARAM_RE`);
    * surviving query parameters SORTED bytewise (order never reaches the
      application layer as meaning; sorting makes ``?a=1&b=2`` ≡
      ``?b=2&a=1``);
    * a now-empty query string drops its ``?``.

    Map-only, no Python, codegen-fused; NULL in → NULL out.
    """
    u = F.col(url_col) if isinstance(url_col, str) else url_col
    u = F.regexp_replace(u, r"#.*$", "")  # fragment
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(u, r"^[^:/?]+://([^/?]+)", 1))
    host = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.substring(hostport, 1, F.length(hostport) - 3),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.substring(hostport, 1, F.length(hostport) - 4),
    ).otherwise(hostport)
    path = F.regexp_extract(u, r"^[^:/?]+://[^/?]+(/[^?]*)?", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(u, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    canon_q = F.concat_ws("&", F.array_sort(params))
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(canon_q != "", F.concat(F.lit("?"), canon_q)).otherwise(
            F.lit("")
        ),
    )
    return F.when(u.isNull() | (scheme == "") | (host == ""), None).otherwise(
        rebuilt
    )


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """URL-level exact dedup after canonicalization: one row per canonical
    URL with the smallest observing id (deterministic first-occurrence
    winner — the same min-id convention as ``dedup_exact``) and the
    variant count (a revisit/tracking-noise signal worth keeping: a URL
    seen under 40 tracking variants is ad-landing-page shaped).

    Rows whose URL fails to parse (no scheme/host) are dropped — they
    cannot collide.  Shape: map-only canonicalization fused into the scan,
    then ONE map-side-combined groupBy on the canonical key; at web scale
    the canonical key is near-unique so the combine step keeps the shuffle
    proportional to distinct URLs, not observations.
    """
    canon = df.select(
        canonical_url(url_col).alias("canon_url"), F.col(id_col)
    ).where(F.col("canon_url").isNotNull())
    return canon.groupBy("canon_url").agg(
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).alias("n_variants"),
    )


# ----------------------------------------------------- importance sampling
#
# DSIR (Data Selection with Importance Resampling, Xie et al. 2023,
# arXiv:2302.03169): score every raw document by how target-domain-like its
# hashed n-gram distribution is, so a web-scale corpus can be resampled
# toward a small high-quality target set without training a classifier.


def dsir_logweights(
    df: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    alpha: float = 1.0,
    seed: str = "dsir",
) -> DataFrame:
    """Per-document DSIR log importance weight
    ``sum_tokens log(p_target(bucket) / p_raw(bucket))`` over hashed
    unigram buckets, with Laplace smoothing ``alpha`` on both
    distributions.  High scores = target-domain-like; resample the raw
    corpus proportionally to ``exp(logweight)`` (or top-k by score).

    100-TB shape: the two bucket distributions are each ONE
    map-side-combined aggregate that outputs at most ``n_buckets`` rows
    (tokens collapse to buckets inside the map stage via explode →
    partial count), collected to the driver (bounded by config, like the
    PSL table and the k-means trainer samples), folded into a
    ``n_buckets``-entry map LITERAL of per-bucket log ratios, and
    constant-folded into a purely map-only scoring pass — the raw corpus
    is never shuffled and never joined.  Scoring is
    ``aggregate(transform(words, w -> map[bucket(w)]))``, all JVM
    expressions inside whole-stage codegen.

    Determinism: buckets come from the shared md5 ``hash64`` family, so
    the score is a pure function of (text, seed, the two corpora) —
    bit-stable under repartitioning and engine choice (the DuckDB twin
    recomputes the same smoothed ratios in SQL).
    """
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    if alpha <= 0:
        raise ValueError("alpha must be positive (Laplace smoothing)")

    def bucket_counts(frame: DataFrame) -> tuple[dict[int, int], int]:
        rows = (
            frame.select(
                F.explode(words(text_col)).alias("_w")
            )
            .select(
                F.pmod(hash64(F.col("_w"), seed), F.lit(n_buckets))
                .cast("int")
                .alias("_b")
            )
            .groupBy("_b")
            .agg(F.count(F.lit(1)).alias("_n"))
            .collect()
        )
        counts = {r["_b"]: r["_n"] for r in rows}
        return counts, sum(counts.values())

    t_counts, t_total = bucket_counts(target)
    r_counts, r_total = bucket_counts(df)
    t_denom = math.log(t_total + alpha * n_buckets)
    r_denom = math.log(r_total + alpha * n_buckets)
    entries: list = []
    for b in range(n_buckets):
        lw = (
            math.log(t_counts.get(b, 0) + alpha)
            - t_denom
            - math.log(r_counts.get(b, 0) + alpha)
            + r_denom
        )
        entries.extend([F.lit(b), F.lit(lw)])
    logw_map = F.create_map(*entries)

    w = words(text_col)
    score = F.aggregate(
        F.transform(
            w,
            lambda t: F.element_at(
                logw_map, F.pmod(hash64(t, seed), F.lit(n_buckets)).cast("int")
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return df.select(
        F.col(id_col),
        F.coalesce(F.size(w), F.lit(0)).cast("long").alias("n_tokens"),
        F.round(F.coalesce(score, F.lit(0.0)), 4).alias("dsir_logweight"),
    )


def source_scorecard(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Per-source corpus health report — the one-page table a data curator
    reads before deciding mixture weights: document and token volume, mean
    length, exact-duplicate rate (docs whose normalized-content fingerprint
    already belongs to an earlier doc), and mean alphanumeric ratio.

    Shape at scale: one fingerprint-key aggregate finds each content's
    min-id owner (map-side combined — duplicate groups pre-reduce in place),
    joined back on the fingerprint (AQE broadcasts the owner table when it
    fits; at web scale it stays a key-co-shuffled join), then ONE source-key
    rollup whose output is |sources| rows.  No window anywhere — a
    mega-source can't serialize through a single task.
    """
    from kafka_connect_tablestore_spark.functions.text import (
        alpha_ratio,
        doc_fingerprint,
        token_count,
    )

    per_doc = df.select(
        F.col(id_col),
        F.col(source_col),
        token_count(text_col).cast("long").alias("_tokens"),
        alpha_ratio(text_col).alias("_alpha"),
        # null-safe fingerprint: a null _fp would never match itself in
        # the owner join (inner join on a null key), silently dropping
        # every null-text doc from its source's n_docs/dup_rate — treat
        # null text as empty content instead, so the row always survives
        doc_fingerprint(F.coalesce(F.col(text_col), F.lit(""))).alias("_fp"),
    )
    owners = per_doc.groupBy("_fp").agg(F.min(id_col).alias("_owner"))
    return (
        per_doc.join(owners, "_fp")
        .groupBy(source_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_tokens").cast("long").alias("total_tokens"),
            F.round(F.avg("_tokens"), 4).alias("mean_tokens"),
            F.round(
                F.avg((F.col(id_col) != F.col("_owner")).cast("double")), 4
            ).alias("dup_rate"),
            F.round(F.avg("_alpha"), 4).alias("mean_alpha_ratio"),
        )
    )


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_words: int = 5,
    min_lines: int = 3,
) -> DataFrame:
    """C4-style line-level page cleaning (Raffel et al. 2020 §2.2 — the
    rule set behind the C4 corpus, reused by most public web pipelines
    since):

    - a LINE is retained iff it ends in a terminal punctuation mark
      (``. ! ? "``), holds at least ``min_line_words`` words, and does not
      contain the word ``javascript`` (case-insensitive);
    - a PAGE is dropped iff it retains fewer than ``min_lines`` lines, or
      contains ``lorem ipsum`` (placeholder text), or contains ``{`` (code
      rendered into prose).

    Emits per-page signals (total/kept line counts, the page-level flags),
    the composite ``keep`` verdict, and the reassembled ``clean_text``
    (retained lines joined by newlines) — filtering stays a ``.where``
    away, as with ``gopher_quality``.

    Shape at scale: pure per-row Catalyst expressions over the line array
    (split / filter / array_join) — map-only, fused into the scan, no
    shuffle, no Python.  The line array is projected once per row before
    the lambdas reference it."""
    lead = [F.col(c) for c in df.columns if c != text_col]
    d = df.select(
        *lead,
        F.col(text_col).alias("_t"),
        F.split(F.col(text_col), r"\n").alias("_lines"),
    )
    t, lines = F.col("_t"), F.col("_lines")
    is_kept = lambda l: (  # noqa: E731
        F.rtrim(l).rlike(r'[.!?"]$')
        & (F.size(F.split(F.trim(l), r"\s+")) >= min_line_words)
        & ~F.lower(l).contains("javascript")
    )
    kept = F.filter(lines, is_kept)
    d = d.select(
        *lead,
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        F.lower(t).contains("lorem ipsum").alias("has_lorem"),
        t.contains("{").alias("has_brace"),
        F.array_join(kept, "\n").alias("clean_text"),
    )
    keep = (
        (F.col("n_kept") >= min_lines)
        & ~F.col("has_lorem")
        & ~F.col("has_brace")
    )
    return d.withColumn("keep", keep)


def chunk_documents(
    df: DataFrame,
    max_words: int = 256,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split LONG documents into overlapping context windows — the stage
    between cleaning and :func:`pack_sequences`: packing concatenates
    SHORT docs up to the budget, this splits docs LONGER than the budget
    into ``max_words``-word chunks starting every ``stride`` words (the
    sliding-window truncation HF tokenizers call ``return_overflowing_
    tokens`` + ``stride``; overlap = ``max_words - stride`` words carries
    context across boundaries).

    Window rule: starts ``0, stride, 2·stride, …`` while the PREVIOUS
    chunk did not already reach the end of the doc — so a tail start whose
    window would be fully contained in its predecessor is never emitted
    (no zero-new-content chunks), and every document emits at least one
    chunk.  Output: ``(id, chunk_id, start_word, n_words, chunk_text)``.

    Shape at scale: map-only — one split, one bounded ``sequence`` explode
    per row, no shuffle, no window; chunk count per doc is
    ``1 + ceil((len-max)/stride)``."""
    stride = max_words if stride is None else stride
    if max_words < 1:
        raise ValueError(f"max_words must be >= 1, got {max_words}")
    if not 1 <= stride <= max_words:
        raise ValueError(
            f"stride must be in [1, max_words={max_words}], got {stride}"
        )
    base = df.select(F.col(id_col), words(text_col).alias("_w")).withColumn(
        "_n", F.size("_w")
    )
    last_i = F.when(
        F.col("_n") > max_words,
        F.floor((F.col("_n") - max_words + stride - 1) / stride).cast("int"),
    ).otherwise(F.lit(0))
    return (
        base.select(
            F.col(id_col),
            "_w",
            "_n",
            F.explode(F.sequence(F.lit(0), last_i)).alias("chunk_id"),
        )
        .select(
            F.col(id_col),
            "chunk_id",
            (F.col("chunk_id") * stride).alias("start_word"),
            F.least(
                F.lit(max_words), F.col("_n") - F.col("chunk_id") * stride
            ).alias("n_words"),
            F.concat_ws(
                " ",
                F.slice(
                    F.col("_w"),
                    F.col("chunk_id") * stride + 1,
                    F.lit(max_words),
                ),
            ).alias("chunk_text"),
        )
    )


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: str = "split",
) -> DataFrame:
    """Deterministic train/validation/test assignment: add a ``split``
    column mapping each row to one named split with probability
    proportional to its weight, decided purely by
    ``hash64(id, seed) % 10000`` against cumulative thresholds.

    This is the reproducible alternative to ``df.randomSplit`` every
    training pipeline eventually needs: ``randomSplit`` seeds its RNG per
    partition, so the SAME document lands in DIFFERENT splits when the
    corpus is repartitioned, appended to, or re-read with different file
    splits — silently leaking held-out docs into train between pipeline
    runs.  The hash gate is a pure per-row function of ``(id, seed)``:
    stable under repartitioning, incremental appends (a new batch's docs
    join their splits without reshuffling old ones), and engine choice
    (the DuckDB twin runs the identical md5 arithmetic).

    ``weights`` must be positive and sum to 1 (±1e-6).  Thresholds are
    assigned over the hash range in SORTED label order so the mapping is a
    function of the weights dict alone, not its insertion order; the last
    label absorbs rounding remainders so every row is assigned.

    Shape at scale: one constant-folded CASE expression fused into the
    scan — map-only, no shuffle, no Python, no sampling pass."""
    return df.withColumn("split", split_assign(F.col(id_col), weights, seed))


def split_assign(id_expr: Column, weights: dict[str, float], seed: str = "split") -> Column:
    """The pure column expression behind :func:`hash_split`: the split
    label as a function of an id expression alone.  Exposed separately so
    downstream audits (:func:`split_leakage`) can recompute a row's split
    from its id WITHOUT joining back to the assigned frame — the split is
    a deterministic function, so no shuffle is ever needed to look it up."""
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w <= 0 for w in weights.values()):
        raise ValueError(f"weights must be positive, got {weights}")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-6:
        raise ValueError(f"weights must sum to 1, got {total}")
    labels = sorted(weights)
    h = hash64(id_expr.cast("string"), seed) % 10000
    expr = None
    cum = 0.0
    prev = 0
    for name in labels[:-1]:
        cum += weights[name]
        thresh = int(round(cum * 10000))
        if thresh <= prev:
            # the 1/10000 hash grid cannot represent this weight: the
            # label's band rounds to zero width and it would silently
            # receive NO rows — fail loudly instead (a pipeline relying
            # on a tiny held-out split must widen it past 1e-4)
            raise ValueError(
                f"weight {weights[name]} for split {name!r} rounds to an "
                "empty band on the 1/10000 hash grid; use weights >= 1e-4"
            )
        prev = thresh
        cond = h < F.lit(thresh)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    if prev >= 10000:
        # the LAST (sorted-order) label absorbs [prev, 10000); an earlier
        # label's rounding must not swallow its whole band
        raise ValueError(
            f"weight {weights[labels[-1]]} for split {labels[-1]!r} rounds "
            "to an empty band on the 1/10000 hash grid; use weights >= 1e-4"
        )
    return (
        expr.otherwise(F.lit(labels[-1]))
        if expr is not None
        else F.lit(labels[-1])
    )


def split_leakage(
    df: DataFrame,
    weights: dict[str, float],
    text_col: str = "text",
    id_col: str = "doc_id",
    min_match: int = 6,
    seed: str = "split",
    n_hashes: int = 8,
    bands: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """Cross-split contamination audit: near-duplicate document pairs that
    straddle a :func:`hash_split` boundary — the classic "the test set
    leaks into train via near-dups" check that a deterministic split does
    NOT prevent (the hash assigns near-identical docs independently, so a
    boilerplate pair lands train/test with probability 2·w_train·w_test).
    Run it after splitting and either drop one side of each leaked pair or
    move it; a held-out set with train-side near-dups overstates eval.

    Emits ``(doc_a, doc_b, n_match, split_a, split_b)`` for every LSH
    candidate pair with ``n_match >= min_match`` matching minhashes whose
    two sides fall in DIFFERENT splits.

    Shape at scale: the pair generation is :func:`~.dedup.minhash_lsh_pairs`
    (banded bucket join, ``max_bucket``-cappable) and the split lookup is
    :func:`split_assign` recomputed inline on each pair side — a pure
    expression of the id, so the audit adds ZERO joins and ZERO shuffles
    beyond the LSH join itself.  Never join back to the assigned frame for
    this; two id-keyed joins against the full corpus would double the
    query's shuffle volume for a value the id already encodes."""
    from .dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(
        df, text_col, id_col, n_hashes, bands, max_bucket=max_bucket
    ).where(F.col("n_match") >= F.lit(min_match))
    split_a = split_assign(F.col("doc_a"), weights, seed)
    split_b = split_assign(F.col("doc_b"), weights, seed)
    return (
        pairs.withColumn("split_a", split_a)
        .withColumn("split_b", split_b)
        .where(F.col("split_a") != F.col("split_b"))
    )


def filter_blocked_domains(
    df: DataFrame,
    blocked: DataFrame | list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Domain-blocklist verdict — the C4/CCNet "bad-word/bad-domain list"
    gate applied at the source level: a document is blocked iff ANY URL
    embedded in it resolves (via :func:`registrable_domain`, the embedded
    public-suffix table) to a registrable domain on the blocklist.
    Emits ``(id_col, blocked)`` for EVERY input document — callers filter
    on ``~blocked`` and join survivors back, the same verdict-frame
    convention as :func:`cap_per_domain`.

    ``blocked`` is a one-column DataFrame (``domain`` string) or a plain
    list; entries are lowercased and matched exactly against the
    registrable domain (so listing ``example.com`` blocks every subdomain
    — the standard blocklist contract — while ``a.co.uk`` blocks only
    that registrant under the ccTLD suffix).

    Shape at scale: real blocklists run 10^5-10^6 domains — far past the
    constant-folding comfort zone but tiny beside the corpus — so the
    list becomes a broadcast-hash LEFT SEMI join against the distinct
    (doc, domain) pairs: the corpus is never shuffled, URL-less documents
    never enter the join, and the verdict rejoin aggregates blocked ids
    map-side before touching the doc frame."""
    spark = df.sparkSession
    if not isinstance(blocked, DataFrame):
        blocked = spark.createDataFrame(
            [(d,) for d in blocked], "domain string"
        )
    blocked = blocked.select(F.lower(F.col("domain")).alias("domain")).distinct()
    hosts = F.regexp_extract_all(F.col(text_col), F.lit(URL_RE), F.lit(1))
    doc_domains = (
        df.select(F.col(id_col), F.explode(hosts).alias("host"))
        .select(F.col(id_col), registrable_domain("host").alias("domain"))
        .distinct()
    )
    blocked_ids = (
        doc_domains.join(F.broadcast(blocked), "domain", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("blocked", F.lit(True))
    )
    return df.select(id_col).join(blocked_ids, id_col, "left").select(
        F.col(id_col), F.coalesce(F.col("blocked"), F.lit(False)).alias("blocked")
    )
