"""Near-duplicate clustering: connected components over candidate pairs.

Training pipelines dedup by keeping ONE document per near-dup *cluster*, not
per pair — pairs (a,b), (b,c) must collapse {a,b,c} to a single survivor.
Connected components is the canonical "operator Spark lacks", implemented
here as the classic iterative min-label propagation (HashToMin-style):

    label(v) ← min(label(v), min over neighbors u of label(u))

repeated to fixpoint.  Iterations are driver-side (an iterative algorithm —
exempt from the SQL-oracle contract); each step is one join + one
aggregation, and near-dup clusters have tiny diameters (dup chains), so the
loop converges in a handful of rounds even at 10^10 docs.  Labels are
localCheckpoint'ed per round — materialize AND truncate lineage, since each
round references the previous labels twice and the logical plan would
otherwise double per round — and the fixpoint check rides the label
aggregation (no extra pass).  Non-convergence within ``max_iter`` raises
(``strict``) instead of returning silently under-merged clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ConvergenceError(RuntimeError):
    """min-label propagation hit ``max_iter`` before reaching fixpoint —
    the returned labels would silently under-merge long chains."""


def connected_components(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 20,
    strict: bool = True,
) -> DataFrame:
    """Return ``(id_col, cluster_id)`` where cluster_id = min member id.

    ``ids``: one row per vertex; ``pairs``: undirected edges (any orientation).
    Raises :class:`ConvergenceError` when the fixpoint is not reached within
    ``max_iter`` rounds (``strict=False`` downgrades to returning the
    partial labels — only safe when the caller bounds component diameter).
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .cache()
    )
    labels = ids.select(F.col(id_col).alias("src"), F.col(id_col).alias("cluster_id"))
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, "src")
            .groupBy(F.col("dst").alias("src"))
            .agg(F.min("cluster_id").alias("nmin"))
        )
        new_labels = labels.join(neighbor_min, "src", "left").select(
            "src",
            F.least(F.col("cluster_id"), F.coalesce(F.col("nmin"), F.col("cluster_id"))).alias("cluster_id"),
            (F.col("nmin").isNotNull() & (F.col("nmin") < F.col("cluster_id"))).alias("_changed"),
        )
        # Each round references `labels` TWICE (join probe + neighbor agg), so
        # the logical plan would DOUBLE per round — caching alone does not
        # truncate lineage and round ~15 would OOM the driver on plan analysis
        # alone.  localCheckpoint materializes AND truncates: constant plan
        # size per round, which is what an iterative graph algorithm needs.
        # The checkpoint is LAZY and the convergence count is the
        # materializing action: one job per round does filter+count WHILE
        # persisting every partition (the eager form spent a second job on
        # the probe).  A pointer-halving shortcut (label(label(v))) was
        # measured here and REVERTED: near-dup components are shallow (the
        # sf bench converges in 2 rounds), so the extra |V| self-join per
        # round cost ~0.3 s and saved none.
        new_labels = new_labels.localCheckpoint(eager=False)
        changed = new_labels.where("_changed").count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged and strict:
        raise ConvergenceError(
            f"connected_components did not converge within max_iter={max_iter} "
            "(component diameter exceeds the round budget; raise max_iter)"
        )
    return labels.select(F.col("src").alias(id_col), "cluster_id")


def dedup_neardup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.7,
    n_hashes: int = 8,
    bands: int = 4,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Cluster-level near-dup dedup: LSH candidates → exact-Jaccard verify →
    connected components → keep min id per cluster.

    ``candidates``: optional precomputed LSH pair frame, forwarded to
    ``ngram_jaccard_pairs`` so a pipeline that already ran candidate
    generation doesn't pay the signature stage twice.

    Output: ``(doc_id, cluster_id, is_survivor)`` for every input doc."""
    from kafka_connect_tablestore_spark.operators.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(
        df, text_col, id_col, n_hashes=n_hashes, bands=bands,
        threshold=jaccard_threshold, candidates=candidates,
    ).select("doc_a", "doc_b")
    comp = connected_components(df.select(id_col), pairs, id_col)
    survivors = comp.groupBy("cluster_id").agg(F.min(id_col).alias("_keep"))
    return (
        comp.join(survivors, "cluster_id")
        .select(
            id_col,
            "cluster_id",
            (F.col(id_col) == F.col("_keep")).alias("is_survivor"),
        )
    )


def canonical_docs(
    df: DataFrame,
    quality_col,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.7,
    n_hashes: int = 8,
    bands: int = 4,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Quality-aware near-dup dedup: cluster near-duplicates (LSH →
    exact-Jaccard verify → connected components, the :func:`dedup_neardup`
    pipeline) and keep the HIGHEST-quality member of each cluster instead
    of the blind min-id survivor — when a page exists in five scraped
    variants, production pipelines keep the cleanest variant, not the one
    with the smallest id.

    ``quality_col``: any deterministic per-row quality expression over
    ``df`` (alpha ratio, Gopher composite, LM perplexity negated...).  It is
    rounded to 4 decimals BEFORE comparison so the argmax is stable across
    engines and float-summation orders; ties break to the smallest id.

    Relational shape: the clustering stages are unchanged (bucketed
    candidate generation, never all-pairs); the selection adds ONE
    aggregation on the cluster key — ``max(struct(quality, -id))`` is a
    partial-aggregable argmax, so a pathological giant cluster pre-reduces
    map-side instead of funneling through a ranking window — plus the
    survivor join back.  Output: ``(doc_id, cluster_id, quality,
    is_canonical)`` for every input doc.
    """
    comp = dedup_neardup(
        df, text_col, id_col,
        jaccard_threshold=jaccard_threshold, n_hashes=n_hashes, bands=bands,
        candidates=candidates,
    ).select(id_col, "cluster_id")
    scored = df.select(
        F.col(id_col), F.round(quality_col, 4).alias("quality")
    )
    # member feeds both the per-cluster argmax and the final join — lazy
    # checkpoint so the clustering-output joins compute once, not twice
    member = comp.join(scored, id_col).localCheckpoint(eager=False)
    best = member.groupBy("cluster_id").agg(
        F.max(
            F.struct(F.col("quality"), (-F.col(id_col)).alias("neg_id"))
        ).alias("_b")
    )
    return (
        member.join(best, "cluster_id")
        .select(
            id_col,
            "cluster_id",
            "quality",
            (F.col(id_col) == -F.col("_b.neg_id")).alias("is_canonical"),
        )
    )


def propagate_scores(
    edges: DataFrame,
    seeds: DataFrame,
    n_iter: int = 3,
    alpha: float = 0.5,
    src_col: str = "query_id",
    dst_col: str = "neighbor_id",
    id_col: str = "id",
    score_col: str = "score",
) -> DataFrame:
    """Personalized-PageRank-style score diffusion over a document graph
    (typically :func:`~kafka_connect_tablestore_spark.operators.similarity.
    knn_graph`): a small trusted/rated seed set spreads quality signal to
    its graph neighborhood — the curation move behind "rank the crawl by
    similarity to curated data" pipelines.

        s_0(v)     = b(v)                      (seed score, 0 elsewhere)
        s_{t+1}(v) = α·b(v) + (1−α)·Σ_{u→v} s_t(u)/outdeg(u)

    run a FIXED ``n_iter`` rounds (a diffusion feature extractor, not a
    convergence solver — the unrolled form is what the SQL twin mirrors).

    Shape at scale: the node frame is |V| rows of (id, score); each round
    is one |E| join on the source id plus one aggregation shuffled on the
    destination — never any N² structure.  The weighted edge frame is
    ``localCheckpoint``'ed ONCE up front — the edge input is typically an
    expensive plan (a k-NN graph build) and every round references it, so
    without materialization each round would RE-EXECUTE that build;
    per-round score frames are checkpointed exactly like
    :func:`connected_components`, so the plan stays constant-size as
    rounds accumulate.
    """
    if n_iter < 0:
        raise ValueError("n_iter must be >= 0")
    # all three up-front checkpoints are LAZY: localCheckpoint swaps the
    # plan to a LogicalRDD immediately (so the expensive edge build — often
    # a full k-NN graph — appears ONCE, not once per reference), while
    # materialization piggybacks on the caller's first action instead of
    # paying three blocking driver jobs here.
    e = edges.select(
        F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst")
    ).localCheckpoint(eager=False)
    deg = e.groupBy("_src").agg(F.count(F.lit(1)).alias("_deg"))
    ew = (
        e.join(deg, "_src")
        .select("_src", "_dst", (F.lit(1.0) / F.col("_deg")).alias("_w"))
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("_src").alias(id_col))
        .union(e.select(F.col("_dst").alias(id_col)))
        .union(seeds.select(F.col(id_col)))
        .distinct()
    )
    base = (
        nodes.join(
            seeds.select(id_col, F.col(score_col).alias("_seed")), id_col, "left"
        )
        .select(id_col, F.coalesce("_seed", F.lit(0.0)).alias("_b"))
        .localCheckpoint(eager=False)
    )
    s = base.select(id_col, F.col("_b").alias("_s"))
    for _ in range(n_iter):
        contrib = (
            ew.join(s.select(F.col(id_col).alias("_src"), "_s"), "_src")
            .groupBy("_dst")
            .agg(F.sum(F.col("_s") * F.col("_w")).alias("_c"))
        )
        s = (
            base.join(contrib.select(F.col("_dst").alias(id_col), "_c"), id_col, "left")
            .select(
                id_col,
                (
                    F.lit(alpha) * F.col("_b")
                    + F.lit(1.0 - alpha) * F.coalesce("_c", F.lit(0.0))
                ).alias("_s"),
            )
            # lazy: truncates lineage at first evaluation without paying a
            # blocking driver job per round — unlike connected_components
            # there is no per-round driver decision to synchronize on
            .localCheckpoint(eager=False)
        )
    return s.select(id_col, F.round("_s", 4).alias(score_col))
