"""Text-analysis functions for large-scale training-data pipelines:
tokenization, shingling, quality scoring, language ID, fingerprinting.

All pure Catalyst expressions (JVM-side, codegen'd — no Python in the hot
path), with canonical formulas chosen to be expressible 1:1 in ANSI SQL so
every operator has a DuckDB oracle:

- words(text)       = split(trim(lower(text)), '\\s+')
- shingle_k(text)   = k-grams of words joined by single spaces
- h(s, seed)        = int64(md5(seed || '|' || s)[0:15] as hex)  — the shared
                      deterministic hash family across engines
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny stopword lists per language for the n-gram/stopword language-ID
#: heuristic (deterministic, dependency-free)
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "value", "table", "row"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "nicht", "ein", "zu"),
    "fr": ("le", "la", "les", "de", "et", "est", "un", "une", "dans", "pour"),
}


def words(col: Column | str) -> Column:
    """Lowercased whitespace tokens, EMPTY-SAFE: blank/whitespace-only text
    yields ``[]``.  Spark's ``split('')`` is ``['']`` — one phantom empty
    token that counted every empty doc as a 1-token doc, made
    ``token_histogram``'s empty-doc bucket unreachable, and fed a ``''``
    token into the unigram corpus model.  The DuckDB twin macro ``W``
    mirrors the filter.  Null text stays null (``size`` → null-aware
    consumers unchanged)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.trim(F.lower(c)), r"\s+"), lambda x: x != F.lit("")
    )


def hash64(col: Column, seed: str) -> Column:
    """Shared Spark/DuckDB 60-bit hash: md5 hex prefix as int64.
    DuckDB twin: ``('0x' || substr(md5('<seed>|' || s), 1, 15))::bigint``."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(seed + "|"), col)), 1, 15), 16, 10
    ).cast("long")


def shingles_from_words(w: Column, k: int = 3) -> Column:
    """k-word shingles (1-based) from a *materialized* word-array column,
    empty array when fewer than k words.
    DuckDB twin: ``list_transform(generate_series(1, len(w)-k+1), i -> ...)``
    (generate_series is naturally empty when len < k; Spark's sequence would
    run descending, hence the explicit guard).

    Take a pre-projected column, not an inline ``words(text)`` expression:
    the lambda references the array k+1 times per element, and Catalyst
    re-evaluates inline subexpressions inside higher-order functions — an
    inline split would run once per shingle instead of once per row."""
    idx = F.sequence(F.lit(1), F.size(w) - (k - 1))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(w, i + j) for j in range(k)]
    )
    return F.when(F.size(w) >= k, F.transform(idx, gram)).otherwise(
        F.array().cast("array<string>")
    )


def shingles(col: Column | str, k: int = 3) -> Column:
    """Convenience composition — prefer the two-stage
    ``select(words(...)) → shingles_from_words`` in hot paths (see above)."""
    return shingles_from_words(words(col), k)


def token_count(col: Column | str) -> Column:
    """Whitespace token count (a BPE-ish subword estimate is chars/4;
    both emitted by the text-quality operator)."""
    return F.size(words(col))


#: GPT-2-style pre-tokenizer segmentation, restricted to constructs both
#: Java regex (Spark) and RE2 (DuckDB) support identically — no lookahead
#: (RE2 lacks it), leftmost-FIRST alternation (both engines use Perl
#: semantics): contraction suffix, space-prefixed letter run, space-prefixed
#: digit run, space-prefixed punctuation run, residual whitespace.
BPE_PRETOKEN_RE = r"'\p{L}+| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}']+|\s+"


def bpe_token_count(col: Column | str) -> Column:
    """Subword-count estimate via a GPT-2-style pre-tokenizer: segment the
    lowercased text with :data:`BPE_PRETOKEN_RE`, then charge each
    non-whitespace piece ``ceil(len(piece)/4)`` subwords (the ~4-chars-per-
    merged-token ratio of byte-level BPE on natural text).  Deterministic,
    pure-Catalyst (one ``regexp_extract_all`` + array fold, codegen'd), and
    exactly mirrored by the DuckDB twin — unlike a real learned BPE it needs
    no merges table, which is the point: the TOKEN BUDGET planner needs a
    cheap corpus-wide estimate long before a tokenizer is shipped to every
    executor.  All-integer arithmetic (``(len+3) div 4``) so the estimate is
    engine-portable bit-for-bit."""
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.regexp_extract_all(
        F.lower(F.coalesce(c, F.lit(""))), F.lit(BPE_PRETOKEN_RE), F.lit(0)
    )
    # single-arg lambda REQUIRED: F.trim passed bare binds transform's
    # (element, index) two-arg overload, making the index a trim-char set
    trimmed = F.filter(
        F.transform(pieces, lambda p: F.trim(p)), lambda p: p != F.lit("")
    )
    return F.aggregate(
        trimmed,
        F.lit(0).cast("long"),
        lambda acc, p: acc + F.floor((F.length(p) + F.lit(3)) / F.lit(4)).cast("long"),
    )


def top_ngrams(df, text_col: str = "text", id_col: str = "doc_id",
               k: int = 3, topk: int = 20):
    """Corpus-wide most-frequent word k-grams — the DISCOVERY tool that
    feeds :func:`~..operators.corpus.strip_boilerplate`'s ``min_df`` choice
    and spam/template triage: emits each n-gram's distinct-document count
    and total occurrence count, top-``topk`` by document frequency.

    Relational shape: n-grams are built MAP-SIDE from the word array (no
    positional self-join), then TWO staged aggregations — per-(ngram, doc)
    counts first (map-side combined; deliberately NOT ``count_distinct``,
    whose Expand rewrite doubles every exploded row), then the per-ngram
    rollup where ``count(*)`` IS the exact distinct-doc count because stage
    one's key made (ngram, doc) unique.  The top-k is a ``TakeOrdered`` —
    no global sort materializes the vocabulary-sized intermediate.  Ties
    broken by n-gram text for cross-engine determinism."""
    from pyspark.sql import functions as F

    # two-stage projection: materialize the word array BEFORE the shingle
    # lambda references it (see shingles_from_words — an inline words(text)
    # re-runs the split once per shingle instead of once per row)
    grams = df.select(F.col(id_col), words(text_col).alias("_w")).select(
        F.col(id_col),
        F.explode(shingles_from_words(F.col("_w"), k)).alias("ngram"),
    )
    per_doc = grams.groupBy("ngram", id_col).agg(
        F.count(F.lit(1)).alias("_n")
    )
    return (
        per_doc.groupBy("ngram")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_n").cast("long").alias("n_occurrences"),
        )
        .orderBy(F.desc("n_docs"), F.desc("n_occurrences"), F.asc("ngram"))
        .limit(topk)
    )


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    w = words(col)
    sw = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
    hits = F.size(F.filter(w, lambda x: F.array_contains(sw, x)))
    return hits.cast("double") / F.greatest(F.size(w), F.lit(1)).cast("double")


def alpha_ratio(col: Column | str) -> Column:
    """Fraction of alphanumeric characters (quality signal)."""
    c = F.col(col) if isinstance(col, str) else col
    alnum = F.length(F.regexp_replace(c, r"[^a-zA-Z0-9]", ""))
    return alnum.cast("double") / F.greatest(F.length(c), F.lit(1)).cast("double")


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Stopword-hit count per language — argmax is the language-ID."""
    w = words(col)
    out = {}
    for lang, sws in STOPWORDS.items():
        sw = F.array(*[F.lit(s) for s in sws])
        out[lang] = F.size(F.filter(w, lambda x: F.array_contains(sw, x)))
    return out


def doc_fingerprint(col: Column | str) -> Column:
    """Whitespace-normalized content fingerprint (md5 of canonical form) —
    the document-level analogue of the per-row sha256 invariant."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.trim(F.lower(c)), r"\s+", " "))


def stratified_sample(df, group_col: str, rates: dict[str, float], id_col: str):
    """Deterministic per-group sampling: keep a row iff
    ``hash64(id, 'samp') % 10000 < rate[group] * 10000``.

    The reproducible data-mixing primitive a training corpus needs (e.g.
    per-language quotas): unlike ``sampleBy`` (RNG seeded per partition —
    resampling changes with partitioning), the hash gate is a pure per-row
    expression, stable under repartitioning, engine-portable (DuckDB twin:
    same md5 arithmetic), and map-only at any scale.  Groups absent from
    ``rates`` are dropped (rate 0)."""
    from pyspark.sql import functions as F

    expr = None
    for g, r in sorted(rates.items()):
        cond = F.col(group_col) == g
        thresh = F.lit(int(round(r * 10000)))
        expr = F.when(cond, thresh) if expr is None else expr.when(cond, thresh)
    gate = expr.otherwise(F.lit(0)) if expr is not None else F.lit(0)
    h = hash64(F.col(id_col).cast("string"), "samp") % 10000
    return df.where(h < gate)


def repetition_scores(df, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document repetition signals (the Gopher/MassiveText-style
    repetitious-content filters): duplicate-word fraction and duplicate
    2-gram fraction — template/boilerplate/spam pages score high, natural
    prose low.

    Pure per-row expressions (distinct-count over the word / 2-gram arrays)
    — map-only at any scale, fused into the scan by codegen.  Rounded to 4
    decimals for cross-engine comparison."""
    from pyspark.sql import functions as F

    df = df.select(F.col(id_col), words(text_col).alias("_w"))
    w = F.col("_w")
    n = F.size(w)
    dup_word = F.lit(1.0) - F.size(F.array_distinct(w)) / n
    g2 = shingles_from_words(w, 2)
    dup_2gram = F.when(
        n >= 2, F.lit(1.0) - F.size(F.array_distinct(g2)) / F.size(g2)
    ).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_words"),
        F.round(dup_word, 4).alias("dup_word_frac"),
        F.round(dup_2gram, 4).alias("dup_2gram_frac"),
    )


def tfidf_topk(df, text_col: str = "text", id_col: str = "doc_id", k: int = 3):
    """Top-k characteristic terms per document by TF-IDF
    (``tf × ln(N / df)``) — the keyword/topic-extraction primitive for
    corpus exploration and cluster labeling.

    Relational shape: explode → per-(doc, word) counts (shuffle 1, map-side
    combined) → document frequency per word (shuffle 2 — output is
    vocabulary-sized) → join the vocabulary back onto the term counts on
    the word key → per-doc top-k window (shuffle 3, on the doc key).  The
    vocabulary join is deliberately UNhinted: a web-scale corpus's distinct
    token set (typos, URLs, code identifiers) can exceed broadcast limits,
    and AQE broadcasts automatically whenever it does fit — same policy as
    ``unigram_perplexity``.  N is the corpus cardinality — one count-star
    job, the same bounded driver scalar the IVF trainer uses.  Ties broken
    by word for determinism; scores rounded to 4 decimals."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    n_docs = df.count()
    wc = (
        df.select(F.col(id_col), F.explode(words(text_col)).alias("word"))
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    docfreq = wc.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    scored = wc.join(docfreq, "word").select(
        F.col(id_col),
        "word",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 4
        ).alias("tfidf"),
    )
    win = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("word"))
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select(id_col, "rank", "word", "tfidf")
    )


def doc_word_entropy(df, text_col: str = "text", id_col: str = "doc_id"):
    """Shannon entropy (bits) of each document's word distribution — the
    low-entropy filter that drops boilerplate/template/spam pages from a
    training corpus (repeated-phrase pages score near 0, natural prose
    scores ~log2(vocab)).

    Relational form: explode → per-(doc, word) counts → per-doc
    ``-Σ p·log2 p``.  Two key-local shuffles on ``id_col``; both aggregate
    map-side first, so the wide explode never crosses the wire unreduced.
    Rounded to 4 decimals for cross-engine comparison."""
    from pyspark.sql import functions as F

    wc = (
        df.select(F.col(id_col), F.explode(words(text_col)).alias("_w"))
        .groupBy(id_col, "_w")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    return (
        wc.groupBy(id_col)
        .agg(
            F.round(
                F.log2(F.sum("_n"))
                - F.sum(F.col("_n") * F.log2("_n")) / F.sum("_n"),
                4,
            ).alias("word_entropy"),
            F.sum("_n").cast("long").alias("n_words"),
        )
    )


#: The Gopher (Rae et al. 2021, MassiveText §A.1.1) required-word list:
#: a document must contain at least ``min_stop_hits`` of these to pass.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
    keep_all_cols: bool = False,
):
    """The Gopher/MassiveText composite quality-filter rules (Rae et al.
    2021, §A.1.1 — the document-level heuristics most open LLM corpora
    since have reused): word-count bounds, mean-word-length window,
    symbol-to-word ratio (``#`` and ``...``), bullet-started and
    ellipsis-ended line fractions, alphabetic-word fraction, and a
    required-stopword floor.

    Emits every signal plus the composite ``keep`` verdict rather than
    filtering in place — at corpus scale the signals feed threshold tuning
    and per-source quality dashboards before anyone commits to a cut, and
    ``.where("keep")`` recovers the filter.  Pure per-row Catalyst
    expressions over the word/line arrays — map-only at any scale, fused
    into the scan by codegen, no shuffle, no Python.  Ratios rounded to 4
    decimals for cross-engine comparison.

    ``keep_all_cols=True`` carries every input column through alongside
    the signals, so a pipeline can gate INLINE
    (``gopher_quality(docs, keep_all_cols=True).where("keep")``) instead
    of joining the verdict back on the id — the join-back would shuffle
    the whole corpus for values the scan computes in place.
    """
    from pyspark.sql import functions as F

    lead = [F.col(c) for c in df.columns] if keep_all_cols else [F.col(id_col)]
    d = df.select(
        *lead,
        words(text_col).alias("_w"),
        F.split(F.col(text_col), r"\n").alias("_lines"),
        F.col(text_col).alias("_t"),
    )
    w, lines, t = F.col("_w"), F.col("_lines"), F.col("_t")
    n = F.size(w)
    n1 = F.greatest(n, F.lit(1)).cast("double")
    nl = F.greatest(F.size(lines), F.lit(1)).cast("double")
    mean_wlen = F.aggregate(
        w, F.lit(0.0), lambda acc, x: acc + F.length(x)
    ) / n1
    # '#' count + '...' occurrence count, per word (Gopher's symbol ratio)
    n_hash = F.length(t) - F.length(F.regexp_replace(t, r"#", ""))
    n_ellipsis = (
        F.length(t) - F.length(F.regexp_replace(t, r"\.\.\.", ""))
    ) / F.lit(3)
    symbol_ratio = (n_hash + n_ellipsis) / n1
    bullet_frac = (
        F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"^[-*•]")))
        / nl
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda l: F.rtrim(l).rlike(r"\.\.\.$"))) / nl
    )
    alpha_frac = F.size(F.filter(w, lambda x: x.rlike("[a-z]"))) / n1
    stop_hits = sum(
        (
            F.when(F.array_contains(w, F.lit(s)), 1).otherwise(0)
            for s in GOPHER_STOPWORDS
        ),
        F.lit(0),
    )
    sig = d.select(
        *([F.col(c) for c in df.columns] if keep_all_cols else [F.col(id_col)]),
        n.cast("long").alias("n_words"),
        F.round(mean_wlen, 4).alias("mean_word_len"),
        F.round(symbol_ratio, 4).alias("symbol_word_ratio"),
        F.round(bullet_frac, 4).alias("bullet_line_frac"),
        F.round(ellipsis_frac, 4).alias("ellipsis_line_frac"),
        F.round(alpha_frac, 4).alias("alpha_word_frac"),
        stop_hits.cast("long").alias("stop_hits"),
    )
    keep = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("symbol_word_ratio") <= max_symbol_word_ratio)
        & (F.col("bullet_line_frac") <= max_bullet_line_frac)
        & (F.col("ellipsis_line_frac") <= max_ellipsis_line_frac)
        & (F.col("alpha_word_frac") >= min_alpha_word_frac)
        & (F.col("stop_hits") >= min_stop_hits)
    )
    return sig.withColumn("keep", keep)


def unigram_perplexity(df, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document perplexity under the corpus's own unigram language
    model — the CCNet-style LM quality filter: pages whose word
    distribution diverges from the corpus (gibberish, foreign-language
    fragments, token soup) score high; typical prose scores near the
    corpus-wide perplexity.  (CCNet uses a 5-gram KenLM trained on
    Wikipedia; the unigram-over-self form keeps the engine dependency-free
    while preserving the relational shape a bigger LM would use — swap the
    model table, keep the plan.)

    ``ppl(d) = exp(-(1/|d|) Σ_w ln(count(w)/N))`` with N = total corpus
    tokens.  Relational shape: explode → per-(doc, word) counts (shuffle
    1, map-side combined) → corpus word counts (shuffle 2 — output is
    vocabulary-sized) → join the model back onto the term counts on the
    word key → per-doc aggregation (shuffle 3, on the doc key).  The model
    table is joined, not broadcast by force: at 100 TB the vocabulary can
    exceed broadcast limits, and AQE picks broadcast automatically when it
    fits.  Every input word is in-vocabulary by construction (the model IS
    the corpus), so no smoothing term is needed; docs with no words are
    omitted (no distribution to score).  Rounded to 4 decimals."""
    from pyspark.sql import functions as F

    wc = (
        df.select(F.col(id_col), F.explode(words(text_col)).alias("word"))
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    model = wc.groupBy("word").agg(F.sum("tf").alias("cf"))
    total = model.agg(F.sum("cf").alias("n_total"))
    scored = wc.join(model, "word").crossJoin(F.broadcast(total))
    return (
        scored.groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_words"),
            F.round(
                F.exp(
                    -F.sum(
                        F.col("tf")
                        * F.log(F.col("cf") / F.col("n_total"))
                    )
                    / F.sum("tf")
                ),
                4,
            ).alias("unigram_ppl"),
        )
    )


def perplexity_buckets(
    df,
    n_buckets: int = 3,
    sample_size: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """CCNet's head/middle/tail split: bucket documents by LM perplexity
    quantiles (bucket 1 = lowest perplexity = most fluent).  CCNet keeps
    the head, LM-filters the middle, and drops the tail; the bucket column
    is the routing key for that policy.

    SCALE SHAPE — deliberately NOT ``ntile``: a global ntile window has no
    partition key, so Spark would funnel the whole corpus through ONE task.
    Instead the thresholds come from a bounded hash-ranked sample (the IVF
    trainer's pattern: ``sample_size`` rows by ``hash64(id)``, one
    TakeOrdered + driver collect), the b-th threshold is the sorted
    sample's exact ``ceil(b·n/n_buckets)``-th element (discrete quantile,
    no interpolation — engine-portable), and bucket assignment is a pure
    map-only expression ``1 + Σ_b [ppl > t_b]`` over the constant-folded
    thresholds.  Comparisons use the 4-decimal-rounded perplexity, so the
    cross-engine float story is the same as ``unigram_perplexity``'s.

    The perplexity plan is evaluated twice (once for the sample, once for
    the output) — the trainer-precedent trade: a bounded recompute beats
    caching a corpus-sized intermediate."""
    import math as _math

    from pyspark.sql import functions as F

    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    # lazy checkpoint: the threshold sample's TakeOrdered collect below is
    # the materializing action, so the 3-shuffle perplexity plan runs ONCE
    # and the bucket-assignment query reads the cached rows instead of
    # re-executing it end to end
    ppl = unigram_perplexity(df, text_col, id_col).localCheckpoint(eager=False)
    sample = [
        r["unigram_ppl"]
        for r in ppl.select(
            F.col(id_col), F.col("unigram_ppl"),
            hash64(F.col(id_col).cast("string"), "pplq").alias("_h"),
        )
        .orderBy("_h", id_col)
        .limit(sample_size)
        .collect()
    ]
    s = sorted(sample)
    n = len(s)
    if n == 0:
        # empty corpus: no thresholds to learn — emit the empty frame with
        # the contracted schema instead of indexing into an empty sample
        return ppl.select(
            id_col, "n_words", "unigram_ppl",
            F.lit(None).cast("int").alias("ppl_bucket"),
        ).limit(0)
    thresholds = [
        s[min(n - 1, _math.ceil(b * n / n_buckets) - 1)]
        for b in range(1, n_buckets)
    ]
    bucket = F.lit(1)
    for t in thresholds:
        bucket = bucket + F.when(F.col("unigram_ppl") > F.lit(t), 1).otherwise(0)
    return ppl.select(
        id_col, "n_words", "unigram_ppl",
        bucket.cast("int").alias("ppl_bucket"),
    )


def bigram_perplexity(
    df, text_col: str = "text", id_col: str = "doc_id", lam: float = 0.75
):
    """Per-document perplexity under the corpus's own *interpolated bigram*
    language model — one fidelity step up from :func:`unigram_perplexity`
    toward CCNet's 5-gram KenLM filter, still dependency-free and fully
    relational:

    ``P(w_i | w_{i-1}) = lam * c(w_{i-1} w_i)/c(w_{i-1} .) + (1-lam) * c(w_i)/N``

    scored over every bigram transition (positions 2..n), so a doc that
    reuses the corpus's common word PAIRS scores low while token soup with
    plausible unigrams but improbable transitions scores high — exactly the
    failure mode a unigram LM cannot see.  The unigram interpolation term
    makes every transition in-vocabulary (both words exist in the corpus by
    construction), so no additional smoothing floor is needed.

    Relational shape: bigrams are built MAP-SIDE from the word array
    (``slice`` + index ``transform`` — no positional self-join, no extra
    shuffle) → per-(doc, w1, w2) counts (shuffle 1, map-side combined) →
    corpus bigram model (shuffle 2, vocabulary²-bounded but web corpora are
    Zipfian so the distinct-bigram table is far smaller) → context totals
    c(w1·) as a rollup of the model (shuffle 3, vocabulary-sized) → model
    joins back onto the per-doc term counts on the bigram/word keys (AQE
    broadcasts when the model fits; joined, not forced, because at 100 TB
    the bigram vocabulary can exceed broadcast limits) → per-doc aggregation
    (final shuffle on the doc key).  Docs with fewer than two words have no
    transitions and are omitted.  Rounded to 4 decimals.
    """
    from pyspark.sql import functions as F

    # materialize the word array ONCE per row (the minhash_signatures
    # precedent): an inline words() inside the transform lambda re-runs
    # trim/lower/split once per BIGRAM — O(n²) character work per doc
    toks = df.select(F.col(id_col), words(text_col).alias("_w"))
    wa = F.col("_w")
    tok = toks.select(F.col(id_col), F.explode(wa).alias("word"))
    uni = tok.groupBy(F.col("word").alias("w2")).agg(
        F.count(F.lit(1)).alias("cu")
    )
    total = tok.agg(F.count(F.lit(1)).alias("n_total"))
    # map-side bigram construction: pair w[i-1] with w[i] without a join
    bigrams = F.transform(
        F.slice(wa, 2, F.greatest(F.size(wa) - 1, F.lit(0))),
        lambda cur, i: F.struct(
            F.element_at(wa, i + F.lit(1)).alias("w1"),
            cur.alias("w2"),
        ),
    )
    bg = toks.select(F.col(id_col), F.explode(bigrams).alias("p")).select(
        F.col(id_col), F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    dtf = bg.groupBy(id_col, "w1", "w2").agg(F.count(F.lit(1)).alias("tf"))
    model = dtf.groupBy("w1", "w2").agg(F.sum("tf").alias("cb"))
    ctx = model.groupBy("w1").agg(F.sum("cb").alias("c1"))
    p = lam * (F.col("cb") / F.col("c1")) + (1.0 - lam) * (
        F.col("cu") / F.col("n_total")
    )
    scored = (
        dtf.join(model, ["w1", "w2"])
        .join(ctx, "w1")
        .join(uni, "w2")
        .crossJoin(F.broadcast(total))
    )
    return scored.groupBy(id_col).agg(
        F.sum("tf").cast("long").alias("n_bigrams"),
        F.round(
            F.exp(-F.sum(F.col("tf") * F.log(p)) / F.sum("tf")), 4
        ).alias("bigram_ppl"),
    )


#: Unicode script ranges as regex character classes with LITERAL endpoint
#: characters (built via chr() so the identical pattern string feeds both
#: Java regex and RE2 — no escape-syntax divergence).  Declaration order is
#: the dominance tie-break, first wins.
SCRIPT_PATTERNS: tuple[tuple[str, str], ...] = (
    ("latin", "[A-Za-z]"),
    ("cyrillic", f"[{chr(0x0400)}-{chr(0x04FF)}]"),
    ("cjk", f"[{chr(0x4E00)}-{chr(0x9FFF)}]"),
    ("arabic", f"[{chr(0x0600)}-{chr(0x06FF)}]"),
)


def script_profile(df, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document writing-system profile: letter counts per Unicode
    script block, the dominant script, and its share of counted letters —
    the first routing signal of a multilingual crawl pipeline (script
    gates which language-ID / tokenizer family even applies, and catches
    mixed-script spam).

    Dominant = the first script in :data:`SCRIPT_PATTERNS` order whose
    count ties the maximum (deterministic, engine-portable); documents with
    no counted letters get ``none`` / ratio 0.

    Shape at scale: map-only — four ``regexp_count`` expressions per row
    inside whole-stage codegen, no shuffle, no UDF."""
    c = F.col(text_col)
    counts = {
        name: F.regexp_count(F.coalesce(c, F.lit("")), F.lit(pat))
        for name, pat in SCRIPT_PATTERNS
    }
    total = None
    for col in counts.values():
        total = col if total is None else total + col
    dominant = F.lit("none")
    names = [n for n, _ in SCRIPT_PATTERNS]
    for i in range(len(names) - 1, -1, -1):
        name = names[i]
        is_max = None
        for other in names:
            if other == name:
                continue
            cond = counts[name] >= counts[other]
            is_max = cond if is_max is None else (is_max & cond)
        dominant = F.when((total > 0) & is_max, F.lit(name)).otherwise(dominant)
    dom_count = None
    for name in names:
        expr = F.when(dominant == name, counts[name])
        dom_count = expr if dom_count is None else F.coalesce(dom_count, expr)
    ratio = F.when(total > 0, F.round(dom_count / total, 4)).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        *[counts[n].cast("long").alias(f"n_{n}") for n in names],
        dominant.alias("dominant_script"),
        ratio.alias("script_ratio"),
    )


def token_histogram(df, text_col: str = "text", id_col: str = "doc_id"):
    """Corpus-level power-of-two histogram of per-document token counts —
    the distribution that sizes sequence packing, batch shaping, and
    truncation budgets before any training run.  Bucket ``b`` holds
    documents with ``2^b ≤ tokens < 2^(b+1)`` (bucket −1: empty docs).

    Shape at scale: one map-only bucket assignment, one bucket-keyed
    aggregation with map-side combine (output is ~64 rows max at any corpus
    size), and a 1-row broadcast total for the share column."""
    n = token_count(text_col)
    b = (
        # null-TEXT docs have a null token count (size(null array) is null
        # under ANSI): they are empty docs, not a phantom NULL bucket
        F.when(n.isNull() | (n <= 0), F.lit(-1))
        .otherwise(F.floor(F.log2(n.cast("double"))).cast("int"))
        .alias("bucket")
    )
    g = df.select(b).groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    tot = g.agg(F.sum("n_docs").cast("double").alias("_total"))
    return g.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.when(F.col("bucket") < 0, F.lit(0).cast("long"))
        .otherwise(F.expr("shiftleft(cast(1 as bigint), bucket)"))
        .alias("lo"),
        F.when(F.col("bucket") < 0, F.lit(0).cast("long"))
        .otherwise(F.expr("shiftleft(cast(1 as bigint), bucket + 1)") - 1)
        .alias("hi"),
        "n_docs",
        F.round(F.col("n_docs") / F.col("_total"), 6).alias("share"),
    )


#: distinctive character trigrams per language for the char-n-gram
#: language-ID profile (the fastText/langid-style signal, reduced to a
#: deterministic dependency-free profile table).  Order matters: ties in the
#: hit counts resolve first-wins in this dict's iteration order.
CHAR_TRIGRAM_PROFILES = {
    "en": (
        "the", " th", "he ", "ing", "ng ", " an", "nd ", " of",
        "of ", "ed ", " to", "to ",
    ),
    "de": (
        "der", "ein", "ich", "sch", "und", "die", "cht", "ung",
        "ber", "gen", " ge", "en ",
    ),
    "fr": (
        "les", " le", "ent", "que", " qu", "ion", " la", "ais",
        "eur", "des", " et", "ous",
    ),
}


def ngram_lang_id(df, text_col: str = "text", id_col: str = "doc_id"):
    """Character-trigram language identification — the n-gram-profile
    upgrade over the whole-word stopword heuristic (``lang_scores``): robust
    to missing function words, partial words, and concatenated boilerplate,
    because every 3-char window of the document votes.

    Per doc: lowercase once, enumerate all character trigrams, count hits
    against each language's literal profile (``CHAR_TRIGRAM_PROFILES``),
    argmax with deterministic first-wins ties in profile order; docs with
    zero hits across all profiles report ``lang='und'``.  ``confidence`` is
    the winner's share of all profile hits (rounded to 4 decimals).

    Shape at scale: pure per-row Catalyst expressions over the trigram
    array — map-only, fused into the scan, no shuffle, no Python.  The
    lowered text and the trigram array are projected once per row (HOF
    lambdas re-evaluate inline subexpressions per element — the
    ``shingles_from_words`` lesson)."""
    d = df.select(
        F.col(id_col), F.lower(F.col(text_col)).alias("_t")
    )
    t = F.col("_t")
    n = F.length(t)
    tri = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(1), n - 2), lambda i: F.substr(t, i, F.lit(3))
        ),
    ).otherwise(F.array().cast("array<string>"))
    d = d.select(F.col(id_col), tri.alias("_g"))
    g = F.col("_g")
    langs = list(CHAR_TRIGRAM_PROFILES)
    hit_cols = []
    for lang in langs:
        prof = F.array(*[F.lit(p) for p in CHAR_TRIGRAM_PROFILES[lang]])
        hit_cols.append(
            F.size(F.filter(g, lambda x: F.array_contains(prof, x)))
            .cast("long")
            .alias(f"{lang}_hits")
        )
    d = d.select(F.col(id_col), *hit_cols)
    total = sum((F.col(f"{l}_hits") for l in langs[1:]), F.col(f"{langs[0]}_hits"))
    best = F.greatest(*[F.col(f"{l}_hits") for l in langs])
    # first-wins argmax: the CASE order IS the tie rule (en before de
    # before fr), mirrored verbatim in the DuckDB twin
    lang_expr = F.when(total == 0, F.lit("und"))
    for l in langs:
        lang_expr = lang_expr.when(F.col(f"{l}_hits") == best, F.lit(l))
    return d.select(
        F.col(id_col),
        *[F.col(f"{l}_hits") for l in langs],
        lang_expr.alias("lang"),
        F.round(
            best.cast("double")
            / F.greatest(total, F.lit(1)).cast("double"),
            4,
        ).alias("confidence"),
    )


#: literal weights for the linear quality-classifier stage.  Stand-in for a
#: trained model's coefficients (the FineWeb-Edu / DCLM-style classifier
#: stage runs exactly this shape: per-doc features -> linear head -> keep
#: threshold); deterministic so the stage has a bit-identical SQL twin.
QUALITY_CLASSIFIER_WEIGHTS = {
    "bias": -3.0,
    "log_n_words": 0.25,
    "mean_word_len": 0.35,
    "symbol_word_ratio": -4.0,
    "bullet_line_frac": -1.5,
    "ellipsis_line_frac": -1.0,
    "alpha_word_frac": 2.0,
    "stop_hits": 0.15,
}


def quality_classifier_score(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    threshold: float = 0.5,
):
    """Model-based quality scoring — the classifier stage of a modern
    pretraining pipeline (FineWeb-Edu, DCLM: a small trained model scores
    every document; the corpus keeps the high-scoring tail).  The trained
    model is stood in by a deterministic linear head over the Gopher
    signal vector: ``score = sigmoid(bias + w · x)`` with
    ``x = (ln(1+n_words), mean_word_len, symbol_word_ratio,
    bullet_line_frac, ellipsis_line_frac, alpha_word_frac, stop_hits)``.
    Swap ``weights`` for real coefficients to productionize; the plan shape
    is identical.

    Emits the score and the ``keep`` verdict alongside every underlying
    signal (threshold tuning before the cut, as with ``gopher_quality``).
    Signals are the ROUNDED gopher outputs, so the logit consumes
    cross-engine-stable inputs; the score is rounded to 6 decimals.

    Shape at scale: map-only end to end — ``gopher_quality`` is pure
    per-row expressions and the head adds arithmetic only; fused into the
    scan, no shuffle, no Python, no model server in the hot path."""
    w = dict(QUALITY_CLASSIFIER_WEIGHTS)
    if weights:
        w.update(weights)
    sig = gopher_quality(df, text_col, id_col).drop("keep")
    logit = F.lit(float(w["bias"]))
    feats = {
        "log_n_words": F.log(F.lit(1.0) + F.col("n_words").cast("double")),
        "mean_word_len": F.col("mean_word_len"),
        "symbol_word_ratio": F.col("symbol_word_ratio"),
        "bullet_line_frac": F.col("bullet_line_frac"),
        "ellipsis_line_frac": F.col("ellipsis_line_frac"),
        "alpha_word_frac": F.col("alpha_word_frac"),
        "stop_hits": F.col("stop_hits").cast("double"),
    }
    for name, col in feats.items():
        logit = logit + F.lit(float(w[name])) * col
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
    return sig.select(
        "*",
        F.round(score, 6).alias("score"),
    ).withColumn("keep", F.col("score") >= F.lit(float(threshold)))


def gopher_repetition(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
):
    """The COMPLETE Gopher/MassiveText repetitious-text table (Rae et al.
    2021 §A.1.1, Table A1) — ``repetition_scores`` covers only the
    duplicate-word/2-gram fractions; this adds the line- and
    character-level family the paper actually filters on:

    - ``dup_line_frac``       — fraction of lines that repeat an earlier
                                line (occurrences after the first);
    - ``dup_line_char_frac``  — characters inside those repeated line
                                occurrences / ``length(text)``;
    - ``top_{n}gram_char_frac`` (n in ``top_ns``) — characters covered by
      the single most frequent word n-gram (count × gram length over the
      canonical single-spaced text), ties broken by gram length then by
      gram text descending;
    - ``dup_{n}gram_char_frac`` (n in ``dup_ns``) — characters covered by
      ALL n-grams occurring more than once (every occurrence counted).

    Char coverages count overlapping occurrences separately (the cheap
    deterministic reading of the paper's definition; interval-union
    coverage would need per-position bookkeeping) and are capped at 1.0,
    with the n-gram denominators measured on the canonical word-joined
    text.  All ratios rounded to 4 decimals.

    Shape at scale: line metrics are pure per-row array expressions
    (map-only).  N-gram metrics build every (n, gram) pair map-side in one
    flattened explode, aggregate once on the (doc, n, gram) key (map-side
    combine collapses each doc's repeats before the wire), then once on
    the doc key (conditional per-n aggregates — no pivot shuffle), and
    join back to the per-doc frame on the id.  Two key-local aggregations
    plus one id join — no window, so a pathological doc can't serialize a
    task beyond its own gram set."""
    from pyspark.sql import functions as F

    base = df.select(
        F.col(id_col),
        words(text_col).alias("_w"),
        F.split(F.col(text_col), r"\n").alias("_lines"),
        F.length(F.col(text_col)).alias("_tc"),
    )
    lines, tc = F.col("_lines"), F.col("_tc")
    nl = F.size(lines)
    n_dist = F.size(F.array_distinct(lines))
    line_chars = F.aggregate(
        lines, F.lit(0), lambda a, x: a + F.length(x)
    )
    dist_chars = F.aggregate(
        F.array_distinct(lines), F.lit(0), lambda a, x: a + F.length(x)
    )
    per_doc = base.select(
        F.col(id_col),
        F.col("_w"),
        F.round(
            (nl - n_dist).cast("double")
            / F.greatest(nl, F.lit(1)).cast("double"),
            4,
        ).alias("dup_line_frac"),
        F.round(
            (line_chars - dist_chars).cast("double")
            / F.greatest(tc, F.lit(1)).cast("double"),
            4,
        ).alias("dup_line_char_frac"),
        # canonical single-spaced length: the n-gram denominators
        F.length(F.array_join(F.col("_w"), " ")).alias("_cc"),
    )
    all_ns = sorted(set(top_ns) | set(dup_ns))

    def _tag(n: int):
        # a DEFAULT-ARG closure (lambda g, n=n) would arrive at pyspark as
        # a TWO-argument HOF lambda, and transform() feeds the second
        # parameter the element INDEX — silently replacing the gram size
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram"))

    gram_arrays = [
        F.transform(shingles_from_words(F.col("_w"), n), _tag(n))
        for n in all_ns
    ]
    grams = per_doc.select(
        F.col(id_col),
        F.explode(F.flatten(F.array(*gram_arrays))).alias("_g"),
    ).select(
        F.col(id_col),
        F.col("_g.n").alias("_n"),
        F.col("_g.gram").alias("_gram"),
    )
    counts = grams.groupBy(id_col, "_n", "_gram").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    glen = F.length(F.col("_gram"))
    aggs = []
    for n in sorted(top_ns):
        aggs.append(
            F.max(
                F.when(
                    F.col("_n") == n,
                    F.struct(
                        F.col("_cnt").alias("c"),
                        glen.alias("l"),
                        F.col("_gram").alias("g"),
                    ),
                )
            ).alias(f"_top{n}")
        )
    for n in sorted(dup_ns):
        aggs.append(
            F.sum(
                F.when(
                    (F.col("_n") == n) & (F.col("_cnt") > 1),
                    F.col("_cnt") * glen,
                ).otherwise(F.lit(0))
            ).alias(f"_dup{n}")
        )
    per_n = counts.groupBy(id_col).agg(*aggs)
    cc = F.greatest(F.col("_cc"), F.lit(1)).cast("double")
    out_cols = [
        F.col(id_col),
        F.col("dup_line_frac"),
        F.col("dup_line_char_frac"),
    ]
    for n in sorted(top_ns):
        t = F.col(f"_top{n}")
        cover = t.getField("c") * t.getField("l")
        # coalesce INSIDE least: least() skips nulls, so a doc with no
        # n-grams (null cover) would otherwise surface least(null, 1) = 1
        out_cols.append(
            F.round(
                F.least(
                    F.coalesce(cover.cast("double"), F.lit(0.0)) / cc,
                    F.lit(1.0),
                ),
                4,
            ).alias(f"top_{n}gram_char_frac")
        )
    for n in sorted(dup_ns):
        out_cols.append(
            F.round(
                F.least(
                    F.coalesce(F.col(f"_dup{n}").cast("double"), F.lit(0.0))
                    / cc,
                    F.lit(1.0),
                ),
                4,
            ).alias(f"dup_{n}gram_char_frac")
        )
    return per_doc.join(per_n, id_col, "left").select(*out_cols)


def bpe_pair_counts(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    topk: int = 20,
):
    """Adjacent-character-pair frequency table over pre-tokenized pieces —
    the statistic byte-pair encoding's FIRST merge maximizes (Sennrich et
    al. 2016): BPE training repeatedly merges the most frequent adjacent
    symbol pair, and round one's candidates are exactly these character
    bigrams.  Corpus-side this is the "train the tokenizer on the corpus
    you just cleaned" pipeline step; it also feeds vocabulary-coverage
    sanity checks (a top pair full of mojibake bytes flags an encoding
    problem upstream).

    Segmentation reuses :data:`BPE_PRETOKEN_RE` (the GPT-2-style
    pre-tokenizer, Java-regex ∩ RE2 subset) with pieces trimmed and
    empties dropped — the same piece stream :func:`bpe_token_count`
    charges, so the two stages describe one tokenizer.  Pairs never cross
    a piece boundary, matching real BPE training.  Emits each pair's total
    occurrence count and distinct-document count, top-``topk`` by
    occurrence count; ties break by document count then pair text for
    cross-engine determinism.

    Shape at scale: pairs are built MAP-SIDE from the piece array (no
    positional self-join), then the :func:`top_ngrams` two-stage shape —
    per-(pair, doc) counts first (map-side combined), then the per-pair
    rollup where ``count(*)`` IS the distinct-doc count; top-k is a
    ``TakeOrdered``, no global sort.  A hot pair ("th", "e ") appears in
    every partition, which is exactly what the two-stage partial
    aggregation absorbs."""
    c = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    pieces = F.regexp_extract_all(c, F.lit(BPE_PRETOKEN_RE), F.lit(0))
    # single-arg lambdas required (see bpe_token_count); the length >= 2
    # guard keeps Spark's sequence() from running DESCENDING on 1-char
    # pieces (sequence(1, 0) = [1, 0], unlike DuckDB's empty
    # generate_series — the shingles_from_words lesson)
    trimmed = F.filter(
        F.transform(pieces, lambda p: F.trim(p)),
        lambda p: F.length(p) >= 2,
    )
    pair_lists = F.transform(
        trimmed,
        lambda p: F.transform(
            F.sequence(F.lit(1), F.length(p) - 1),
            lambda i: F.substr(p, i, F.lit(2)),
        ),
    )
    # two-stage projection: materialize the piece array before the pair
    # lambdas reference it (HOF inline-subexpression re-evaluation)
    grams = (
        df.select(F.col(id_col), pair_lists.alias("_pl"))
        .select(F.col(id_col), F.explode(F.flatten(F.col("_pl"))).alias("pair"))
    )
    per_doc = grams.groupBy("pair", id_col).agg(F.count(F.lit(1)).alias("_n"))
    return (
        per_doc.groupBy("pair")
        .agg(
            F.sum("_n").cast("long").alias("n_occurrences"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )
        .orderBy(
            F.desc("n_occurrences"), F.desc("n_docs"), F.asc("pair")
        )
        .limit(topk)
    )


#: symbol separator inside the BPE trainer's fold accumulator — U+0001, a
#: control char that never survives whitespace tokenization of real text;
#: vocab words containing it are excluded (both engines) so a symbol can
#: never contain the separator and the boundary test stays exact.
BPE_SEP = "\x01"


def train_bpe_merges(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 5,
):
    """Byte-pair-encoding merge training (Sennrich et al. 2016) — learn the
    first ``n_merges`` merge rules from the corpus itself, the "train the
    tokenizer ON the cluster" step that precedes any token-budget planning.
    Output: one row per learned merge, ``(rank, pair, new_token, freq)`` —
    the space-joined symbol pair, the merged token it creates, and the
    weighted frequency that won it the round.

    Scale shape — the whole point: the corpus is reduced ONCE to the
    vocabulary table ``(word, count, symbols)`` (one word-key shuffle with
    map-side combine; Zipf makes the vocab orders of magnitude smaller
    than the corpus — the classic BPE-trainer optimization from Sennrich's
    reference implementation).  Every merge round then touches ONLY the
    vocab-sized frame: pair counts are one map-side explode + aggregation,
    the winning pair is a 1-row frame cross-joined back (broadcast), and
    the merge application is a per-row fold — the corpus text is never
    re-read.  Rounds are a driver-side loop (``connected_components``
    precedent) with per-round ``localCheckpoint`` keeping the plan
    constant-size; unlike most iterative operators the round structure IS
    SQL-expressible, so the registry query carries a fully-unrolled DuckDB
    twin (chained CTEs, one per round — the ``pipe_graph_rank`` pattern).

    Merge application is greedy left-to-right within each word (the BPE
    contract): the fold walks the symbol list once, appending ``b`` to the
    accumulator's last symbol when that symbol is exactly ``a`` and the
    next symbol is ``b`` — [a,a,a] under merge (a,a) becomes [aa,a], and a
    last symbol 'xa' never false-matches because the boundary test anchors
    on the separator.  Ties break to the lexicographically smallest pair
    for cross-engine determinism.  Rounds after pair exhaustion emit no
    row (the result may hold fewer than ``n_merges`` merges).

    Honest bound: the merge LOOP is inherently sequential (each round
    depends on the last winner), so this operator targets the first
    N ≤ a few hundred merges — boilerplate/mojibake triage, vocab-growth
    analysis, seeding.  A full 32k-merge production train would run 3
    Spark jobs per round; the right production split is exactly what this
    shape enables: the corpus-scale step (the vocabulary reduction) runs
    distributed here, and the vocab table — GB-sized at any corpus scale —
    exports to a single-node trainer for the long merge loop.
    """
    merges, _ = _train_bpe(df, text_col, n_merges)
    return merges


def _train_bpe(df, text_col: str, n_merges: int):
    """Shared trainer loop: returns ``(merges, vocab)`` where ``vocab`` is
    the ``(word, cnt, syms)`` frame with ALL learned merges applied — the
    per-word segmentation table :func:`bpe_segment` joins back on."""
    sep = F.lit(BPE_SEP)
    spark = df.sparkSession
    # all checkpoints in the loop are LAZY: each round's winning-pair
    # collect is the materializing action for the previous round's vocab,
    # so a round costs ONE Spark job (the eager form paid three — best
    # checkpoint, isEmpty probe, vocab checkpoint — plus a broadcast build
    # for the crossJoin the literal pair now replaces).
    vocab = (
        df.select(F.explode(words(text_col)).alias("word"))
        .where((F.col("word") != "") & ~F.col("word").contains(BPE_SEP))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(
            "word",
            "cnt",
            F.transform(
                F.sequence(F.lit(1), F.length("word")),
                lambda i: F.substr(F.col("word"), i, F.lit(1)),
            ).alias("syms"),
        )
        .localCheckpoint(eager=False)
    )
    collected: list[tuple] = []
    for r in range(1, n_merges + 1):
        sy = F.col("syms")
        pair_list = F.when(
            F.size(sy) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(sy) - 1),
                lambda i: F.concat(
                    F.element_at(sy, i), F.lit(" "), F.element_at(sy, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        rows = (
            vocab.select("cnt", F.explode(pair_list).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("cnt").cast("long").alias("freq"))
            .orderBy(F.desc("freq"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not rows:
            # every word is fully merged before n_merges rounds: no pairs
            # remain.  Stop — folding a nonexistent pair would be a no-op
            # but the round would still pay a full pass.
            break
        pair_s, freq = rows[0]["pair"], rows[0]["freq"]
        collected.append((r, pair_s, pair_s.replace(" ", ""), freq))
        # symbols never contain spaces (words() splits on whitespace), so
        # the pair splits unambiguously; literal a/b let the fold constant-
        # fold instead of re-splitting a joined column per row
        a_s, b_s = pair_s.split(" ", 1)
        a, b = F.lit(a_s), F.lit(b_s)
        folded = F.aggregate(
            F.slice(sy, 2, F.greatest(F.size(sy) - 1, F.lit(0))),
            F.element_at(sy, 1),
            lambda acc, s: F.when(
                (s == b) & ((acc == a) | acc.endswith(F.concat(sep, a))),
                F.concat(acc, s),
            ).otherwise(F.concat(acc, sep, s)),
        )
        vocab = (
            vocab.select("word", "cnt", F.split(folded, BPE_SEP).alias("syms"))
            .localCheckpoint(eager=False)
        )
    merges = (
        spark.createDataFrame(
            collected, "rank int, pair string, new_token string, freq long"
        )
        if collected
        else None
    )
    return merges, vocab


def bpe_segment(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 5,
):
    """Corpus-wide subword counting under a corpus-TRAINED tokenizer —
    the apply half of :func:`train_bpe_merges`, upgrading
    :func:`bpe_token_count`'s chars/4 estimate to the real segment count
    the learned merges produce.  Output: ``(id, n_words, n_subwords)``
    per document (empty/filtered-out docs report 0/0).

    Shape at scale — segment the VOCABULARY, not the corpus: each
    distinct word is segmented exactly once inside the trainer's
    vocab-sized merge loop (Zipf: a 100 TB corpus holds billions of word
    OCCURRENCES but a vastly smaller distinct-word table), then the
    corpus pays one map-side word explode + a word-key join against the
    per-word subword counts (AQE broadcasts the vocab side when it fits)
    + one doc-key rollup with map-side combine.  Re-segmenting every
    occurrence per row would instead pay O(word_len × n_merges)
    expression depth per token — the classic move, same reason the
    trainer itself iterates on the vocab table."""
    _, vocab = _train_bpe(df, text_col, n_merges)
    seg = vocab.select(
        "word", F.size("syms").cast("long").alias("_nsub")
    )
    occ = df.select(
        F.col(id_col),
        F.explode_outer(
            F.filter(
                words(text_col),
                lambda w: (w != F.lit("")) & ~w.contains(BPE_SEP),
            )
        ).alias("word"),
    )
    return (
        occ.join(seg, "word", "left")
        .groupBy(id_col)
        .agg(
            F.count("word").cast("long").alias("n_words"),
            F.coalesce(F.sum("_nsub"), F.lit(0)).cast("long").alias("n_subwords"),
        )
    )


def length_quantiles(
    df,
    value_cols: tuple[str, ...] = ("n_chars",),
    by: str = "lang",
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    exact: bool = True,
):
    """Per-group size/length quantile profile — the distribution table a
    curator reads before setting min/max-length filters (mean alone, as in
    ``source_scorecard``, hides the tail that the Gopher length gates cut).

    ``exact=True`` computes the true linear-interpolated quantile
    (``percentile`` — a sort-based exact aggregate, and the form the DuckDB
    ``quantile_cont`` oracle reproduces bit-for-bit after rounding).
    ``exact=False`` switches every column to ``percentile_approx`` — the
    one-pass, mergeable t-digest sketch that is the 100-TB path: partial
    sketches combine map-side, so no per-group sort ever materializes.
    Same schema either way; the exact form is the correctness gate, the
    approx form is what a production profile run ships.

    Shape at scale: ONE group-key aggregate, output |groups| rows.
    """
    aggs = [F.count(F.lit(1)).cast("long").alias("n_docs")]
    for c in value_cols:
        for p in probs:
            name = f"{c}_p{int(round(p * 100)):02d}"
            q = (
                F.percentile(F.col(c), F.lit(float(p)))
                if exact
                else F.percentile_approx(F.col(c), F.lit(float(p)))
            )
            aggs.append(F.round(q.cast("double"), 4).alias(name))
    return df.groupBy(by).agg(*aggs)


def vocab_growth(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoints: tuple[int, ...] = (100, 200, 300, 400, 500),
):
    """Heaps-law vocabulary-growth profile: for each checkpoint c, the doc
    count, whitespace-token count, and DISTINCT-word vocabulary size of the
    corpus prefix ``id <= c`` — the curve whose flattening says "new data
    has stopped adding new language" (sub-linear vocab growth, Heaps 1978),
    read next to :func:`ngram_novelty`'s per-doc view of the same question.

    Shape at scale: NOT a running distinct (which would serialize through
    one state): one word-key aggregate finds each word's first-seen doc id
    (map-side combined min), one doc-key projection counts tokens, and each
    joins the tiny checkpoint list by broadcast inequality — the only
    per-row work is against |checkpoints| constants, and the final rollup
    is |checkpoints| rows.
    """
    spark = df.sparkSession
    cps = spark.createDataFrame([(int(c),) for c in checkpoints], "cp long")
    w = df.select(
        F.col(id_col).alias("_id"), F.explode(words(text_col)).alias("_w")
    ).where(F.col("_w") != "")
    first_seen = w.groupBy("_w").agg(F.min("_id").alias("_fs"))
    vocab = (
        first_seen.join(F.broadcast(cps), F.col("_fs") <= F.col("cp"))
        .groupBy("cp")
        .agg(F.count(F.lit(1)).cast("long").alias("vocab_size"))
    )
    toks = (
        df.select(
            F.col(id_col).alias("_id"),
            token_count(text_col).cast("long").alias("_tok"),
        )
        .join(F.broadcast(cps), F.col("_id") <= F.col("cp"))
        .groupBy("cp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_tok").cast("long").alias("n_tokens"),
        )
    )
    # root the rollup at the checkpoint GRID, not the doc-side join: a
    # checkpoint below the smallest doc id must report a 0/0/0 row, not
    # silently vanish from the curve
    return (
        cps.join(toks, "cp", "left")
        .join(vocab, "cp", "left")
        .select(
            "cp",
            F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("vocab_size", F.lit(0)).cast("long").alias("vocab_size"),
        )
    )
