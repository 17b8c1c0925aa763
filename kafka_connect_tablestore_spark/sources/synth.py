"""Deterministic synthetic CDC change-log generator (fixture F1).

Mirrors the *record shape* the reference consumes — a Kafka ``SinkRecord``
envelope (topic, partition, offset, timestamp; used at
``utils/RowChangeTransformer.java:95-125``) plus the graft payload
``(repo, path, commit, lang, content)`` with an ``op`` column standing in for
the PUT/UPDATE/DELETE row-change decision inputs
(``RowChangeTransformer.java:201-256``).

Scale-first design: the generator is a pure column-expression plan over
``spark.range(n)`` — no driver-side materialization, no Python in the loop —
so the same code that makes 10^4 rows for pytest makes 10^10 rows on a
cluster.  Every value is a deterministic function of ``(seed, id)`` via
``xxhash64``/``md5``, so any two runs (and any two cluster sizes) produce the
same multiset of events.

Invariants the downstream engine relies on (same implicit assumptions as the
reference's hash-PK bucketed sequential writer, ``TableStoreSinkWriter.java:120-129``):

- ``offset`` strictly increasing within each ``partition`` (offset := id, and a
  key's partition is a hash of the key, so per-partition offsets are a strictly
  increasing subsequence of ids);
- ``commit_ts`` strictly monotone in ``id`` ⇒ monotone per key;
- each key lives in exactly one partition;
- hot-repo skew: repo ids drawn from a power-law so a few repos dominate
  (exercises salted two-phase LWW).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_TS_MS = 1_700_000_000_000

CHANGELOG_COLUMNS = (
    "topic", "partition", "offset", "commit_ts", "op",
    "repo", "path", "commit", "lang", "content",
)

LANGS = ("py", "java", "go", "rs", "c", "ts")


def _u(col, seed: int, lo: int = 0, hi: int = 1_000_000):
    """Deterministic uniform integer in [lo, hi) derived from (col, seed)."""
    return (F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(hi - lo)) + F.lit(lo))


def synth_changelog(
    spark: SparkSession,
    n_events: int,
    *,
    seed: int = 42,
    n_repos: int = 200,
    paths_per_repo: int = 50,
    n_partitions: int = 8,
    skew: float = 3.0,
    p_update: float = 0.30,
    p_delete: float = 0.08,
    p_null_lang: float = 0.40,
    p_null_content: float = 0.30,
    p_malformed: float = 0.0,
    topic: str = "repos",
    slices: int | None = None,
) -> DataFrame:
    """Return a deterministic change-log DataFrame of ``n_events`` rows.

    ``skew`` > 1 concentrates events on low repo ids (power-law): repo id =
    floor(n_repos * u^skew) for u ~ U[0,1), so repo 0 is the hot key.
    ``p_malformed`` injects null-PK events (errant in record-value PK mode,
    mirroring the null-key error at ``RowChangeTransformer.java:140-142``).
    """
    df = spark.range(0, n_events, numPartitions=slices)
    i = F.col("id")

    # --- key choice (power-law skewed repo, uniform path within repo) -----
    u_repo = _u(i, seed + 1).cast("double") / F.lit(1_000_000.0)
    repo_id = F.floor(F.pow(u_repo, F.lit(float(skew))) * F.lit(n_repos)).cast("long")
    path_id = _u(i, seed + 2, 0, paths_per_repo)
    repo = F.concat(F.lit("repo_"), F.format_string("%04d", repo_id))
    path = F.concat(F.lit("src/f"), path_id.cast("string"), F.lit(".py"))

    # --- op mix ------------------------------------------------------------
    u_op = _u(i, seed + 3).cast("double") / F.lit(1_000_000.0)
    op = (
        F.when(u_op < F.lit(p_delete), F.lit("DELETE"))
        .when(u_op < F.lit(p_delete + p_update), F.lit("UPDATE"))
        .otherwise(F.lit("PUT"))
    )

    # --- payload -----------------------------------------------------------
    commit = F.md5(F.concat(F.lit(f"c{seed}-"), i.cast("string")))
    lang = F.element_at(
        F.array(*[F.lit(x) for x in LANGS]), (_u(i, seed + 4, 0, len(LANGS)) + 1).cast("int")
    )
    content = F.concat(
        F.lit("content:"), repo, F.lit("/"), path, F.lit("@"),
        F.repeat(F.substring(commit, 1, 16), 8),
    )
    u_nl = _u(i, seed + 5).cast("double") / F.lit(1_000_000.0)
    u_nc = _u(i, seed + 6).cast("double") / F.lit(1_000_000.0)
    is_update = op == F.lit("UPDATE")
    is_delete = op == F.lit("DELETE")
    # UPDATE rows may carry partial payloads (null = absent column in
    # delete.mode=none, or column-delete marker otherwise); ensure at least
    # one of (lang, content) is present so the row isn't the all-null error
    # case unless we want it to be. DELETE rows are tombstones: null payload
    # (RowChangeTransformer.java:174-191).
    lang_out = (
        F.when(is_delete, F.lit(None).cast("string"))
        .when(is_update & (u_nl < F.lit(p_null_lang)), F.lit(None).cast("string"))
        .otherwise(lang)
    )
    content_out = (
        F.when(is_delete, F.lit(None).cast("string"))
        .when(is_update & (u_nl >= F.lit(p_null_lang)) & (u_nc < F.lit(p_null_content)),
              F.lit(None).cast("string"))
        .otherwise(content)
    )
    commit_out = F.when(is_delete, F.lit(None).cast("string")).otherwise(commit)

    # --- malformed events (null PK field) -----------------------------------
    if p_malformed > 0:
        u_bad = _u(i, seed + 7).cast("double") / F.lit(1_000_000.0)
        repo = F.when(u_bad < F.lit(p_malformed), F.lit(None).cast("string")).otherwise(repo)

    # --- envelope -----------------------------------------------------------
    partition = F.pmod(F.xxhash64(repo, path, F.lit(seed)), F.lit(n_partitions)).cast("int")
    out = df.select(
        F.lit(topic).alias("topic"),
        F.coalesce(partition, F.lit(0)).alias("partition"),
        i.alias("offset"),
        (F.lit(BASE_TS_MS) + i * F.lit(1000) + _u(i, seed + 8, 0, 999)).alias("commit_ts"),
        op.alias("op"),
        repo.alias("repo"),
        path.alias("path"),
        commit_out.alias("commit"),
        lang_out.alias("lang"),
        content_out.alias("content"),
    )
    return out


def changelog_from_events(spark_df: DataFrame, *, n_partitions: int = 8) -> DataFrame:
    """Derive a change log from the driver's ``events`` test table.

    Deterministic mapping used by ``__spark_entry__.queries()`` so the DuckDB
    oracle can express the identical derivation in ANSI SQL.  Keys are
    ``(repo, path)`` from ``user_id``/``event_id``; the op comes from
    ``event_type``.
    """
    e = spark_df
    return e.select(
        F.lit("repos").alias("topic"),
        F.pmod(F.col("user_id"), F.lit(n_partitions)).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        # tz-free millis: parquet timestamps load as TIMESTAMP_NTZ in Spark 4
        # and must match DuckDB's epoch_ms regardless of session timezone;
        # the explicit cast keeps this correct even if the driver session
        # disables NTZ inference
        F.expr(
            "timestampdiff(MILLISECOND, timestamp_ntz'1970-01-01 00:00:00', "
            "cast(ts as timestamp_ntz))"
        ).alias("commit_ts"),
        F.when(F.col("event_type") == "error", F.lit("DELETE"))
        .when(F.col("event_type").isin("view", "click"), F.lit("UPDATE"))
        .otherwise(F.lit("PUT"))
        .alias("op"),
        F.concat(F.lit("repo_"), F.pmod(F.col("user_id"), F.lit(40)).cast("string")).alias("repo"),
        F.concat(F.lit("src/f"), F.pmod(F.col("event_id"), F.lit(25)).cast("string"), F.lit(".py")).alias("path"),
        F.when(F.col("event_type") == "error", F.lit(None).cast("string"))
        .otherwise(F.md5(F.col("event_id").cast("string")))
        .alias("commit"),
        F.when(F.col("event_type") == "error", F.lit(None).cast("string"))
        .when(F.col("event_type") == "view", F.lit(None).cast("string"))
        .otherwise(F.element_at(F.array(F.lit("py"), F.lit("java"), F.lit("go")),
                                (F.pmod(F.col("user_id"), F.lit(3)) + 1).cast("int")))
        .alias("lang"),
        F.when(F.col("event_type") == "error", F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("content-"), F.col("props")))
        .alias("content"),
    )


#: The same derivation as :func:`changelog_from_events`, as a DuckDB SQL view
#: body over the pre-registered ``events`` view (used by oracle_sql()).
CHANGELOG_FROM_EVENTS_SQL = """
SELECT
  'repos' AS topic,
  CAST(user_id % 8 AS INT) AS "partition",
  event_id AS "offset",
  epoch_ms(ts) AS commit_ts,
  CASE WHEN event_type = 'error' THEN 'DELETE'
       WHEN event_type IN ('view','click') THEN 'UPDATE'
       ELSE 'PUT' END AS op,
  'repo_' || CAST(user_id % 40 AS VARCHAR) AS repo,
  'src/f' || CAST(event_id % 25 AS VARCHAR) || '.py' AS path,
  CASE WHEN event_type = 'error' THEN NULL ELSE md5(CAST(event_id AS VARCHAR)) END AS "commit",
  CASE WHEN event_type = 'error' THEN NULL
       WHEN event_type = 'view' THEN NULL
       ELSE ['py','java','go'][CAST(user_id % 3 AS INT) + 1] END AS lang,
  CASE WHEN event_type = 'error' THEN NULL
       ELSE 'content-' || props END AS content
FROM events
"""
