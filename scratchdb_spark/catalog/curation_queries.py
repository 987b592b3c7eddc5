"""Corpus-curation queries: decontamination, repetition/quality gates, token budgets, packing, cross-corpus dedup, PMI/entropy, BM25.

Split from the single-module query catalog (registration order is
preserved by scratchdb_spark/queries.py's import sequence — the
driver's correctness-window rotation tie-breaks on registry order).
Shared infrastructure (QuerySpec/register/_sql/_fixture_oracle and
the DuckDB token/shingle oracle macros) lives in catalog/core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql.window import Window  # noqa: F401

from ..operators.asof import asof_join  # noqa: F401
from ..tables import epoch_us, register_testdata, table  # noqa: F401
from .core import (  # noqa: F401
    _DUCK_SHINGLES,
    _DUCK_TOKENS,
    _fixture_oracle,
    _sql,
    register,
)

# ---------------------------------------------------------------------------
# Corpus-curation extensions (operators/curation.py): decontamination,
# repetition filter, quality gate, mixture budgeting
# ---------------------------------------------------------------------------

#: DuckDB distinct word 4-grams (mirrors dedup.token_shingles at n=4)
_DUCK_SHINGLES4 = """
  list_distinct([array_to_string(list_slice(w, i, i + 3), ' ')
                 FOR i IN generate_series(1, greatest(len(w) - 3, 1))])
""".strip()


@register(
    "curate_decontaminate",
    f"""
    WITH g AS (
      SELECT doc_id, {_DUCK_SHINGLES4} AS sh
      FROM (SELECT doc_id, {_DUCK_TOKENS} AS w FROM documents)
    ),
    ev AS (SELECT DISTINCT s
           FROM (SELECT unnest(sh) AS s FROM g WHERE doc_id < 10)),
    tr AS (SELECT doc_id, unnest(sh) AS s FROM g WHERE doc_id >= 10)
    SELECT tr.doc_id AS doc_id,
           CAST(count(DISTINCT tr.s) AS BIGINT) AS n_eval_ngram_hits
    FROM tr JOIN ev ON tr.s = ev.s
    GROUP BY tr.doc_id
    """,
    doc="Benchmark decontamination: training docs (doc_id >= 10) "
        "sharing any word 4-gram with the eval set (doc_id < 10). "
        "Eval shingle set broadcasts (eval suites are tiny); corpus "
        "side stays linear — one equi-join + one regroup at any scale.",
)
def curate_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import decontaminate

    docs = table(spark, sf_dir, "documents")
    return decontaminate(
        docs.filter(F.col("doc_id") >= 10),
        docs.filter(F.col("doc_id") < 10),
        n=4,
    )


@register(
    "curate_bloom_decontaminate",
    _fixture_oracle(
        "curate_bloom_decontaminate", ["doc_id", "n_bloom_hits"]
    ),
    doc="Bloom-filter decontamination (constant-memory twin of "
        "curate_decontaminate, same eval/train split): eval 4-gram "
        "shingles fold into per-partition bloom bitmaps (OR-merged — "
        "associative, so partition-invariant) and the 512 KB filter "
        "broadcasts into a vectorized probe kernel — no join, no "
        "shuffle on either side; the cheapest decontamination shape "
        "at 100 TB. Deterministic output (fixture oracle); exact twin "
        "curate_decontaminate gives the SQL-checkable lower bound.",
)
def curate_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import bloom_decontaminate

    docs = table(spark, sf_dir, "documents")
    return bloom_decontaminate(
        docs.filter(F.col("doc_id") >= 10),
        docs.filter(F.col("doc_id") < 10),
        n=4,
    )


@register(
    "curate_repetition_stats",
    f"""
    WITH t AS (SELECT doc_id, unnest(w) AS term
               FROM (SELECT doc_id, {_DUCK_TOKENS} AS w FROM documents)),
    c AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term)
    SELECT doc_id,
           CAST(sum(tf) AS BIGINT) AS n_words,
           CAST(count(*) AS BIGINT) AS n_distinct_words,
           round(1 - count(*) / CAST(sum(tf) AS DOUBLE), 4)
             AS dup_word_ratio,
           round(max(tf) / CAST(sum(tf) AS DOUBLE), 4) AS top_word_ratio
    FROM c GROUP BY doc_id
    """,
    doc="Gopher-style repetition signals: duplicate-word fraction and "
        "most-frequent-word share per document. Explode + two-level "
        "agg keyed on (doc, term) then doc — linear, skew-free.",
)
def curate_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import repetition_stats

    return repetition_stats(table(spark, sf_dir, "documents"))


@register(
    "curate_quality_gate",
    f"""
    WITH s AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm,
             {_DUCK_TOKENS} AS w
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             len(w) AS n_tokens,
             (length(norm) - (len(w) - 1)) / CAST(len(w) AS DOUBLE)
               AS mean_len,
             length(regexp_replace(norm, '[^a-z]', '', 'g'))
               / CAST(length(norm) AS DOUBLE) AS alpha_ratio,
             len(list_filter(w, x -> list_contains(
               ['a','and','das','dans','de','der','des','die','el','en',
                'es','est','et','ein','in','is','it','la','le','les','of',
                'pour','que','the','to','un','und','une','von','y','zu',
                'ist'], x)))
               / CAST(len(w) AS DOUBLE) AS stop_ratio
      FROM s
    ),
    r AS (
      SELECT doc_id, n_tokens,
             concat_ws(',',
               CASE WHEN NOT (n_tokens BETWEEN 5 AND 5000)
                    THEN 'word_count' END,
               CASE WHEN NOT (mean_len BETWEEN 2.0 AND 12.0)
                    THEN 'mean_word_len' END,
               CASE WHEN alpha_ratio < 0.6 THEN 'alpha_ratio' END,
               CASE WHEN stop_ratio < 0.01 THEN 'stopword_ratio' END
             ) AS reject_reasons
      FROM m
    )
    SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
           (reject_reasons = '') AS keep, reject_reasons
    FROM r
    """,
    doc="Composite quality gate (Gopher-rule shapes): word-count "
        "bounds, mean word length, alphabetic ratio, stopword "
        "presence; reject_reasons lists failed rules in fixed order. "
        "Pure row-local projection — scales as a scan.",
)
def curate_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import quality_gate

    return quality_gate(table(spark, sf_dir, "documents"))


@register(
    "curate_domain_token_budget",
    f"""
    WITH per AS (
      SELECT source AS domain, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(w)) AS BIGINT) AS ws_tokens
      FROM (SELECT source, {_DUCK_TOKENS} AS w FROM documents)
      GROUP BY source
    )
    SELECT domain, n_docs, ws_tokens,
           round(ws_tokens / CAST(sum(ws_tokens) OVER () AS DOUBLE), 6)
             AS token_share,
           round(sum(ws_tokens) OVER (ORDER BY ws_tokens DESC, domain)
                 / CAST(sum(ws_tokens) OVER () AS DOUBLE), 6)
             AS cum_token_share
    FROM per
    """,
    doc="Mixture budgeting: per-domain doc/token totals with global "
        "and cumulative token shares ordered by mass — the sampling-"
        "weights report for training-mixture design. Narrow agg + "
        "window over domain totals only.",
)
def curate_domain_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import domain_token_budget

    return domain_token_budget(table(spark, sf_dir, "documents"))


@register(
    "dedup_cross_corpus_near_dups",
    f"""
    WITH g AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS sh
      FROM (SELECT doc_id, {_DUCK_TOKENS} AS w FROM documents)
    )
    SELECT n.doc_id AS new_id, c.doc_id AS corpus_id,
           round(len(list_intersect(n.sh, c.sh))
                 / CAST(len(list_distinct(list_concat(n.sh, c.sh))) AS DOUBLE),
                 4) AS jaccard_sim
    FROM g n JOIN g c ON n.doc_id >= 250 AND c.doc_id < 250
    WHERE len(list_intersect(n.sh, c.sh))
          >= 0.8 * len(list_distinct(list_concat(n.sh, c.sh)))
    """,
    doc="Incremental dedup: near-dups of a NEW batch (doc_id >= 250) "
        "against the EXISTING corpus (doc_id < 250) — the dedupe-the-"
        "incoming-crawl pattern. Minhash band keys computed per side, "
        "new x corpus band equi-join (candidates scale with the new "
        "batch, not the corpus), exact-jaccard verify. Oracle is the "
        "exact cross-side quadratic jaccard; LSH capture probability "
        "at j=0.8 with 16x4 banding is ~0.9998 and verify removes "
        "false positives.",
)
def dedup_cross_corpus_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import cross_corpus_near_dups

    docs = table(spark, sf_dir, "documents")
    return cross_corpus_near_dups(
        docs.filter(F.col("doc_id") >= 250),
        docs.filter(F.col("doc_id") < 250),
        threshold=0.8,
    )


@register(
    "ann_kmeans_centroids",
    _fixture_oracle(
        "ann_kmeans_centroids",
        ["centroid_id", "dim", "c_val", "n_assigned"],
    ),
    doc="Deterministic spherical k-means (Lloyd, k=8, 3 iterations) "
        "for IVF centroid training: smallest-id init, 6dp-rounded "
        "cosine assignment, DECIMAL-summed updates (exact and "
        "associative, so centroids are bit-identical under ANY "
        "partitioning — verified). Oracle is a determinism-checked "
        "golden snapshot; output is one scalar row per centroid "
        "component.",
)
def ann_kmeans_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import kmeans_fit

    return kmeans_fit(table(spark, sf_dir, "embeddings"), k=8, iters=3)


@register(
    "curate_pack_sequences",
    f"""
    WITH t AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                  % 16 AS BIGINT) AS shard,
             len({_DUCK_TOKENS.replace('text', 'text')}) AS n_tok
      FROM documents
    ),
    b AS (
      SELECT shard, doc_id, n_tok,
             CAST(floor(coalesce(sum(n_tok) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) / 512) AS BIGINT) AS bin_id
      FROM t
    )
    SELECT shard, bin_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           array_to_string(list_sort(list(doc_id)), ',') AS doc_ids
    FROM b GROUP BY shard, bin_id
    """,
    doc="Greedy contiguous sequence packing (512-token bins) within "
        "md5 shards — training-batch prep. Per-shard windows keep the "
        "cumulative-sum parallel at corpus scale (a global order would "
        "be a one-task window at 100 TB).",
)
def curate_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import pack_sequences

    return pack_sequences(
        table(spark, sf_dir, "documents"), max_tokens=512
    )


@register(
    "stream_windowed_event_counts",
    """
    SELECT CAST(epoch_us(time_bucket(INTERVAL '6 hours', ts)) AS BIGINT)
             AS window_start_us,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Batch-parity check for the streaming event-time operator: "
        "streaming/ingest_stream.windowed_event_counts runs the SAME "
        "code on a batch frame (tumbling 6h windows + agg), so the "
        "streaming transformation's semantics get an exact SQL oracle "
        "row. Window start is emitted as integer epoch-us (timestamp "
        "codecs differ across engines; integers hash identically).",
)
def stream_windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.ingest_stream import windowed_event_counts

    ev = table(spark, sf_dir, "events")
    out = windowed_event_counts(ev, "6 hours", "1 hour")
    return out.select(
        epoch_us(out, "window_start").alias("window_start_us"),
        "event_type",
        "n",
        "total_value",
    )


@register(
    "stream_session_window_counts",
    """
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL '30 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    numbered AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_no
      FROM flagged
    )
    SELECT CAST(epoch_us(min(ts)) AS BIGINT) AS session_start_us,
           CAST(epoch_us(max(ts) + INTERVAL '30 minutes') AS BIGINT)
             AS session_end_us,
           user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS session_value
    FROM numbered
    GROUP BY user_id, session_no
    """,
    doc="Batch-parity check for Spark's native session_window: "
        "streaming/ingest_stream.session_window_counts (same code path "
        "streaming uses) vs an explicit lag/cumsum session "
        "reconstruction in SQL. session_window's end = last event + "
        "gap; an event arriving EXACTLY gap after the previous one "
        "starts a new session (windows [ts, ts+gap) merge only on "
        "strict overlap), so the oracle marks new sessions on "
        "gap >= 30min, pinning the boundary. Timestamps emitted as "
        "integer epoch-us.",
)
def stream_session_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.ingest_stream import session_window_counts

    ev = table(spark, sf_dir, "events")
    out = session_window_counts(ev, "30 minutes", "2 hours")
    return out.select(
        epoch_us(out, "session_start").alias("session_start_us"),
        epoch_us(out, "session_end").alias("session_end_us"),
        "user_id",
        "n_events",
        "session_value",
    )


@register(
    "stream_hopping_window_counts",
    """
    SELECT CAST(epoch_us(time_bucket(INTERVAL '2 hours', ts)
                         - k.k * INTERVAL '2 hours') AS BIGINT)
             AS window_start_us,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value
    FROM events, range(0, 3) k(k)
    GROUP BY 1, 2
    """,
    doc="Batch-parity check for hopping (sliding) event-time windows: "
        "streaming/ingest_stream.hopping_window_counts (window 6h, "
        "hop 2h — each event in exactly 3 overlapping windows, all "
        "epoch-aligned to the hop). The oracle expands the window "
        "membership explicitly: cross-join each event with k in 0..2 "
        "and subtract k hops from its 2h time bucket. Window starts "
        "emitted as integer epoch-us.",
)
def stream_hopping_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.ingest_stream import hopping_window_counts

    ev = table(spark, sf_dir, "events")
    out = hopping_window_counts(ev, "6 hours", "2 hours")
    return out.select(
        epoch_us(out, "window_start").alias("window_start_us"),
        "event_type",
        "n",
        "total_value",
    )


@register(
    "stream_interval_join_clicks",
    """
    SELECT p_user AS user_id, CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(round(sum(p_value) * 100) AS BIGINT) AS purchase_value_e2
    FROM (SELECT user_id AS c_user, ts AS c_ts
            FROM events WHERE event_type = 'click') c
    JOIN (SELECT user_id AS p_user, ts AS p_ts, value AS p_value
            FROM events WHERE event_type = 'purchase') p
      ON c_user = p_user
     AND p_ts >= c_ts
     AND p_ts < c_ts + INTERVAL '30 minutes'
    GROUP BY 1
    """,
    doc="Batch-parity check for the stream-stream interval join "
        "(streaming/ingest_stream.interval_join): click->purchase "
        "pairs within 30 min through the SAME watermark+time-bound "
        "join Spark uses for two live streams (the time bound is what "
        "lets streaming expire join state). Distinct from "
        "range_join_click_purchase, which is the bucketed BATCH scale "
        "path for this query class; here the oracle pins the "
        "streaming operator's batch-mode semantics.",
)
def stream_interval_join_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.ingest_stream import interval_join

    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    j = interval_join(
        clicks, purchases, ("c_user", "p_user"), "c_ts", "p_ts",
        "30 minutes",
    )
    return j.groupBy(F.col("p_user").alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.sum("p_value") * 100)
        .cast("long")
        .alias("purchase_value_e2"),
    )


@register(
    "setop_except_all_mktsegments",
    """
    SELECT c_mktsegment AS seg FROM customer WHERE c_nationkey < 13
    EXCEPT ALL
    SELECT c_mktsegment FROM customer WHERE c_nationkey >= 13
    """,
    doc="EXCEPT ALL (bag semantics): keeps a row once per surplus "
        "multiplicity on the left — distinct operator from set EXCEPT "
        "(setop_except_nationkeys), which would return nothing here "
        "since every segment appears on both sides.",
)
def setop_except_all_mktsegments(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    lo = c.filter(F.col("c_nationkey") < 13).select(
        F.col("c_mktsegment").alias("seg")
    )
    hi = c.filter(F.col("c_nationkey") >= 13).select(
        F.col("c_mktsegment").alias("seg")
    )
    return lo.exceptAll(hi)


@register(
    "setop_intersect_all_mktsegments",
    """
    SELECT c_mktsegment AS seg FROM customer WHERE c_nationkey < 13
    INTERSECT ALL
    SELECT c_mktsegment FROM customer WHERE c_nationkey >= 13
    """,
    doc="INTERSECT ALL (bag semantics): keeps min(left, right) copies "
        "of each row — distinct from set INTERSECT's 0/1.",
)
def setop_intersect_all_mktsegments(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    lo = c.filter(F.col("c_nationkey") < 13).select(
        F.col("c_mktsegment").alias("seg")
    )
    hi = c.filter(F.col("c_nationkey") >= 13).select(
        F.col("c_mktsegment").alias("seg")
    )
    return lo.intersectAll(hi)


@register(
    "unpivot_part_metrics",
    """
    SELECT p_partkey, 'retailprice' AS metric,
           CAST(p_retailprice AS DOUBLE) AS value
    FROM part WHERE p_partkey <= 200
    UNION ALL
    SELECT p_partkey, 'size', CAST(p_size AS DOUBLE) FROM part
    WHERE p_partkey <= 200
    """,
    doc="UNPIVOT (wide -> long, the inverse of the pivot category): "
        "DataFrame.unpivot melts metric columns into (metric, value) "
        "rows; oracle is the portable UNION ALL formulation.",
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= 200)
        .select(
            "p_partkey",
            F.col("p_retailprice").alias("retailprice"),
            F.col("p_size").cast("double").alias("size"),
        )
    )
    return p.unpivot(
        ids=["p_partkey"],
        values=["retailprice", "size"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@register(
    "lateral_top_customers_per_nation",
    """
    SELECT n.n_name, t.c_name, t.bal
    FROM nation n,
    LATERAL (SELECT c_name, round(c_acctbal, 2) AS bal
             FROM customer c
             WHERE c.c_nationkey = n.n_nationkey
             ORDER BY c_acctbal DESC, c_name LIMIT 2) t
    """,
    doc="Correlated LATERAL subquery (top-2 customers per nation by "
        "balance) through the SQL pass-through surface — the "
        "table-valued correlation shape; Catalyst rewrites it to a "
        "ranked join (same plan class as the window formulation).",
)
def lateral_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
        SELECT n.n_name, t.c_name, t.bal
        FROM nation n,
        LATERAL (SELECT c_name, round(c_acctbal, 2) AS bal
                 FROM customer c
                 WHERE c.c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_name LIMIT 2) t
        """,
    )


@register(
    "ann_filtered_cosine_topk",
    """
    WITH corpus AS (
      SELECT e.vec_id AS neighbor_id, CAST(e.embedding AS DOUBLE[]) AS cv
      FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
      WHERE contains(lower(d.text), 'data')
    ),
    q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
          FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT query_id, neighbor_id,
             round(list_cosine_similarity(qv, cv), 6) AS cos_sim
      FROM q JOIN corpus ON query_id <> neighbor_id),
    ranked AS (
      SELECT query_id, neighbor_id, cos_sim,
             CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, cos_sim, rank
    FROM ranked WHERE rank <= 5
    """,
    doc="Filtered vector search (hybrid retrieval): the candidate "
        "corpus is pre-filtered by a keyword predicate on the joined "
        "documents table, then scored exactly — predicate pushdown + "
        "equi-join shrink the corpus BEFORE any vector math, the shape "
        "that matters when the filter is selective at scale.",
)
def ann_filtered_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import brute_force_topk

    emb = table(spark, sf_dir, "embeddings")
    docs = table(spark, sf_dir, "documents")
    corpus = emb.join(
        docs.filter(F.lower(F.col("text")).contains("data")).select(
            F.col("doc_id").alias("vec_id")
        ),
        "vec_id",
    )
    return brute_force_topk(corpus, emb.filter(F.col("vec_id") < 5), k=5)


@register(
    "rollup_incremental_daily",
    """
    SELECT CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) AS day_us,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value,
           round(min(value), 4) AS min_value,
           round(max(value), 4) AS max_value,
           CAST(round(round(sum(value), 2) * 100) AS BIGINT) * 100
             // count(*) AS avg_value_e4
    FROM events
    GROUP BY 1, 2
    """,
    doc="Continuous-aggregate pattern (operators/incremental.py): the "
        "events table is ingested as TWO batches (event_id parity), "
        "each appending per-(day, type) PARTIAL rows to a managed "
        "rollup table; the read merges partials (counts/sums add, "
        "min/max fold, avg derives). Oracle aggregates the raw events "
        "directly — merged partials must equal the one-shot answer. "
        "At 100 TB the rollup read touches partial rows only; a late "
        "batch is one more partial append, never a rewrite.",
    bench=False,  # times temp-warehouse setup, not query execution
)
def rollup_incremental_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..operators.incremental import append_rollup_partials, read_rollup
    from ..tables import Warehouse

    ev = table(spark, sf_dir, "events")
    wh = Warehouse(spark, tempfile.mkdtemp(prefix="rollup_inc_"))
    append_rollup_partials(
        wh, "db", "agg", ev.filter(F.col("event_id") % 2 == 0)
    )
    append_rollup_partials(
        wh, "db", "agg", ev.filter(F.col("event_id") % 2 == 1)
    )
    out = read_rollup(wh, "db", "agg")
    return out.select(
        epoch_us(out, "bucket_day").alias("day_us"),
        "event_type", "n", "total_value", "min_value", "max_value",
        "avg_value_e4",
    )


@register(
    "agg_percentile_disc",
    """
    SELECT event_type,
           round(quantile_disc(value, 0.5), 4) AS p50_disc,
           round(quantile_disc(value, 0.9), 4) AS p90_disc
    FROM events GROUP BY event_type
    """,
    doc="Discrete percentiles (an actually-occurring value, no "
        "interpolation) — distinct semantics from the continuous "
        "percentile in agg_exact_percentiles / "
        "count_distinct_exact_median.",
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)"), 4).alias("p50_disc"),
        F.round(F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY value)"), 4).alias("p90_disc"),
    )


@register(
    "agg_grouping_id_rollup",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
                AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    doc="grouping()/grouping_id exposure: distinguishes real NULL keys "
        "from rollup subtotal rows — the metadata column BI tools key "
        "on when consuming ROLLUP output.",
)
def agg_grouping_id_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "gid",
            "n",
        )
    )


@register(
    "ts_gapfill_daily_spend",
    """
    WITH daily AS (
      SELECT user_id AS k, date_trunc('day', ts) AS day,
             count(*) AS n_events,
             CAST(round(sum(value) * 100) AS BIGINT) AS value_e2
      FROM events WHERE user_id < 50 GROUP BY 1, 2
    ),
    span AS (SELECT k, min(day) AS lo, max(day) AS hi FROM daily GROUP BY k),
    spine AS (SELECT k, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
              FROM span),
    j AS (SELECT s.k, s.day, d.n_events, d.value_e2
          FROM spine s LEFT JOIN daily d ON s.k = d.k AND s.day = d.day)
    SELECT k AS user_id, strftime(day, '%Y-%m-%d') AS day,
           coalesce(n_events, CAST(0 AS BIGINT)) AS n_events,
           last_value(value_e2 IGNORE NULLS) OVER (
             PARTITION BY k ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS filled_value_e2,
           value_e2 IS NULL AS is_gap
    FROM j
    """,
    doc="Calendar gap-fill + forward fill (time_bucket_gapfill/locf "
        "shape): per-user daily spine via sequence()+explode, left "
        "join actuals, last(ignorenulls) carry — the densify primitive "
        "for gridded training series (operators/resample.py).",
)
def ts_gapfill_daily_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.resample import gapfill_daily_forward

    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    return gapfill_daily_forward(ev)


@register(
    "text_bm25_topk",
    f"""
    WITH w AS (SELECT doc_id, {_DUCK_TOKENS} AS w FROM documents),
    toks AS (SELECT doc_id, unnest(w) AS term FROM w),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           WHERE term <> '' GROUP BY 1, 2),
    dl AS (SELECT doc_id, len(w) AS dl FROM w),
    stats AS (SELECT count(*) AS n_docs,
                     CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
    qtf AS (SELECT * FROM tf WHERE term IN ('spark', 'window', 'join')),
    qdf AS (SELECT term, count(DISTINCT doc_id) AS df FROM qtf
            GROUP BY term),
    scored AS (
      SELECT t.doc_id,
             CAST(round(ln(1 + (s.n_docs - q.df + 0.5) / (q.df + 0.5))
                        * t.tf * (1.2 + 1)
                        / (t.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / s.avgdl))
                        * 1000000) AS BIGINT) AS w_e6
      FROM qtf t JOIN qdf q USING (term) JOIN dl d USING (doc_id)
      CROSS JOIN stats s)
    SELECT doc_id, CAST(sum(w_e6) AS BIGINT) AS bm25_e6,
           count(*) AS n_matched_terms
    FROM scored GROUP BY doc_id
    ORDER BY bm25_e6 DESC, doc_id LIMIT 20
    """,
    doc="Okapi BM25 top-20 retrieval for a fixed term bag "
        "(operators/text.py::bm25_topk): tf/df/dl aggs + broadcast "
        "scalars + TakeOrdered; avgdl derives from an exact integer "
        "sum so both engines divide identical operands.",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import bm25_topk

    return bm25_topk(
        table(spark, sf_dir, "documents"), ["spark", "window", "join"]
    )


@register(
    "text_unigram_logprob",
    f"""
    WITH pos AS (
      SELECT doc_id, tok
      FROM (SELECT doc_id, unnest({_DUCK_TOKENS}) AS tok FROM documents)
      WHERE tok <> ''),
    counts AS (SELECT tok, count(*) AS c FROM pos GROUP BY tok),
    totals AS (SELECT CAST(sum(c) AS BIGINT) AS corpus_tokens,
                      count(*) AS vocab FROM counts)
    SELECT doc_id, count(*) AS n_tokens,
           round(avg(ln((c + 1)
                        / CAST(corpus_tokens + vocab AS DOUBLE))), 6)
             AS avg_logprob
    FROM pos JOIN counts USING (tok) CROSS JOIN totals
    GROUP BY doc_id
    """,
    doc="Per-doc mean token log-prob under the corpus's add-one "
        "unigram model (operators/text.py::unigram_logprob) — the "
        "CCNet-style perplexity proxy for OOD/gibberish flagging; one "
        "token-keyed shuffle each way, Zipf skew noted.",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import unigram_logprob

    return unigram_logprob(table(spark, sf_dir, "documents"))


@register(
    "dedup_prefix_filter_pairs",
    f"""
    WITH g AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS sh
      FROM (SELECT doc_id, {_DUCK_TOKENS} AS w FROM documents)
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.sh, b.sh))
                 / CAST(len(list_distinct(list_concat(a.sh, b.sh)))
                        AS DOUBLE), 4) AS jaccard_sim
    FROM g a JOIN g b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh))
          >= 0.8 * len(list_distinct(list_concat(a.sh, b.sh)))
    """,
    doc="EXACT set-similarity join via prefix filtering "
        "(operators/dedup.py::prefix_filter_pairs, PPJoin-family): "
        "rare-first prefixes -> equi-join candidates -> length filter "
        "-> exact verify. Unlike minhash (w.h.p.), this EQUALS the "
        "quadratic oracle deterministically while staying "
        "equi-join-shaped at scale.",
)
def dedup_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import prefix_filter_pairs

    return prefix_filter_pairs(
        table(spark, sf_dir, "documents"), threshold=0.8
    )


@register(
    "dedup_ngram_span_coverage",
    f"""
    WITH w AS (SELECT doc_id, {_DUCK_TOKENS} AS w FROM documents),
    grams AS (
      SELECT doc_id, array_to_string(list_slice(w, i, i + 4), ' ') AS g
      FROM (SELECT doc_id, w,
                   unnest(generate_series(1, greatest(len(w) - 4, 1)))
                     AS i
            FROM w)
    ),
    gd AS (SELECT g, count(DISTINCT doc_id) AS nd FROM grams GROUP BY g)
    SELECT doc_id, count(*) AS n_grams,
           CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS dup_grams,
           round(CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 / CAST(count(*) AS DOUBLE), 4) AS dup_fraction
    FROM grams JOIN gd USING (g)
    GROUP BY doc_id
    """,
    doc="Per-doc duplicated-text fraction at 5-gram granularity "
        "(operators/dedup.py::ngram_span_coverage) — the audit stage "
        "of exact-substring dedup (Lee et al. 2022 at gram "
        "granularity): positional grams, per-gram doc counts, join "
        "back, per-doc fraction. Linear in gram positions.",
)
def dedup_ngram_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import ngram_span_coverage

    return ngram_span_coverage(table(spark, sf_dir, "documents"))


@register(
    "split_balance_classes",
    """
    SELECT doc_id, lang
    FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents)
    WHERE rn <= 60
    """,
    doc="Class-balanced downsampling (operators/split.py::"
        "balance_classes): cap each lang at 60 docs by content-"
        "addressed md5 order — deterministic and engine-portable, "
        "unlike ORDER BY rand(); over-represented classes clip, small "
        "ones pass whole.",
)
def split_balance_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.split import balance_classes

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    return balance_classes(docs, "lang", "doc_id", cap=60)


@register(
    "emb_label_centroids",
    """
    SELECT label, CAST(dim - 1 AS INTEGER) AS dim,
           CAST(sum(CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT)
             AS sum_e6,
           count(*) AS n_vecs,
           round(CAST(sum(CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT)
                 / count(*) / 1000000.0, 6) AS centroid
    FROM (SELECT label, unnest(embedding) AS x,
                 generate_subscripts(embedding, 1) AS dim
          FROM embeddings)
    GROUP BY label, dim
    """,
    doc="Per-label mean embedding / class prototypes "
        "(operators/similarity.py::label_centroids): float components "
        "snapped to integer micro-units and summed as BIGINT, so the "
        "centroid is invariant under partitioning and engines — the "
        "exact-sufficient-statistics discipline applied to vectors.",
)
def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import label_centroids

    return label_centroids(table(spark, sf_dir, "embeddings"))


@register(
    "text_bigram_pmi",
    f"""
    WITH w AS (SELECT {_DUCK_TOKENS} AS w FROM documents),
    uni AS (SELECT tok, count(*) AS c
            FROM (SELECT unnest(w) AS tok FROM w)
            WHERE tok <> '' GROUP BY tok),
    ntok AS (SELECT CAST(sum(c) AS BIGINT) AS n_tok FROM uni),
    big AS (SELECT bg, count(*) AS c_xy FROM (
              SELECT array_to_string(list_slice(w, i, i + 1), ' ') AS bg
              FROM (SELECT w,
                           unnest(generate_series(
                             1, greatest(len(w) - 1, 1))) AS i
                    FROM w))
            WHERE contains(bg, ' ') GROUP BY bg
            HAVING count(*) >= 5),
    nbig AS (SELECT CAST(sum(greatest(len(w) - 1, 0)) AS BIGINT) AS n_big
             FROM w)
    SELECT bg AS bigram, c_xy, ux.c AS c_x, uy.c AS c_y,
           round(ln(CAST(c_xy AS DOUBLE) * n_tok * n_tok
                    / (CAST(n_big AS DOUBLE) * ux.c * uy.c)), 6) AS pmi
    FROM big
    JOIN uni ux ON string_split(bg, ' ')[1] = ux.tok
    JOIN uni uy ON string_split(bg, ' ')[2] = uy.tok
    CROSS JOIN ntok CROSS JOIN nbig
    ORDER BY pmi DESC, bigram LIMIT 20
    """,
    doc="Top-20 collocations by PMI over positional bigrams "
        "(operators/text.py::bigram_pmi, Church & Hanks): all ln "
        "operands are exact integers widened to double in the same "
        "association order in both engines.",
)
def text_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import bigram_pmi

    return bigram_pmi(table(spark, sf_dir, "documents"), min_count=5)


@register(
    "text_token_entropy",
    f"""
    WITH tf AS (SELECT doc_id, term, count(*) AS tf
                FROM (SELECT doc_id, unnest({_DUCK_TOKENS}) AS term
                      FROM documents)
                WHERE term <> '' GROUP BY 1, 2),
    per AS (SELECT doc_id, tf,
                   CAST(round(tf * ln(tf) * 1000000) AS BIGINT)
                     AS clnc_e6
            FROM tf)
    SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
           count(*) AS n_distinct,
           CAST(sum(clnc_e6) AS BIGINT) AS sum_clnc_e6,
           round(ln(sum(tf)) - sum(clnc_e6) / 1000000.0 / sum(tf), 6)
             AS entropy
    FROM per GROUP BY doc_id
    """,
    doc="Per-doc Shannon token entropy (operators/text.py::"
        "token_entropy): c*ln(c) snapped to integer micro-units per "
        "TERM then integer-summed, so aggregation order can't flip a "
        "rounding boundary — low entropy flags repetitive docs.",
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import token_entropy

    return token_entropy(table(spark, sf_dir, "documents"))


@register(
    "anomaly_daily_value",
    """
    WITH daily AS (
      SELECT event_type AS grp, date_trunc('day', ts) AS day,
             CAST(round(sum(value) * 100) AS BIGINT) AS total_e2
      FROM events GROUP BY 1, 2),
    stats AS (SELECT grp, count(*) AS n_days,
                     CAST(sum(total_e2) AS BIGINT) AS s1,
                     CAST(sum(total_e2 * total_e2) AS BIGINT) AS s2
              FROM daily GROUP BY grp)
    SELECT grp AS event_type, strftime(day, '%Y-%m-%d') AS day,
           total_e2, n_days,
           round((total_e2 - s1 / n_days)
                 / sqrt((s2 - s1 * s1 / n_days) / n_days), 4) AS z
    FROM daily JOIN stats USING (grp)
    WHERE abs((total_e2 - s1 / n_days)
              / sqrt((s2 - s1 * s1 / n_days) / n_days)) >= 2.0
    """,
    doc="Daily z-score anomaly detection per event_type "
        "(operators/monitor.py::daily_zscore_anomalies): mean/var/z "
        "derive as pure double functions of exact BIGINT sufficient "
        "statistics (n, sum, sumsq) — partition- and engine-"
        "invariant; two keyed aggs, no window.",
)
def anomaly_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.monitor import daily_zscore_anomalies

    return daily_zscore_anomalies(table(spark, sf_dir, "events"))



@register(
    "ts_gapfill_linear_spend",
    """
    WITH daily AS (
      SELECT user_id AS k, date_trunc('day', ts) AS day,
             CAST(round(sum(value) * 100) AS BIGINT) AS value_e2
      FROM events WHERE user_id < 50 GROUP BY 1, 2
    ),
    span AS (SELECT k, min(day) AS lo, max(day) AS hi FROM daily GROUP BY k),
    spine AS (SELECT k, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
              FROM span),
    j AS (SELECT s.k, s.day, d.value_e2
          FROM spine s LEFT JOIN daily d ON s.k = d.k AND s.day = d.day),
    w AS (
      SELECT k, day, value_e2,
        last_value(value_e2 IGNORE NULLS) OVER (PARTITION BY k ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
        last_value(CASE WHEN value_e2 IS NOT NULL THEN day END IGNORE NULLS)
          OVER (PARTITION BY k ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_d,
        first_value(value_e2 IGNORE NULLS) OVER (PARTITION BY k ORDER BY day
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
        first_value(CASE WHEN value_e2 IS NOT NULL THEN day END IGNORE NULLS)
          OVER (PARTITION BY k ORDER BY day
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_d
      FROM j)
    SELECT k AS user_id, strftime(day, '%Y-%m-%d') AS day,
           CASE WHEN value_e2 IS NOT NULL THEN value_e2
                ELSE prev_v + CAST(round((next_v - prev_v)
                     * date_diff('day', prev_d, day)
                     / date_diff('day', prev_d, next_d)) AS BIGINT) END
             AS interp_value_e2,
           value_e2 IS NULL AS is_gap
    FROM w
    """,
    doc="Calendar gap-fill with LINEAR interpolation "
        "(operators/resample.py::gapfill_daily_linear) — the "
        "time_bucket_gapfill+interpolate twin of the locf query: two "
        "per-key windows carry the last/next known (value, day) pair "
        "and interior gaps interpolate over exact scaled-integer "
        "endpoints (one float division of exact ints, bit-identical "
        "cross-engine).",
)
def ts_gapfill_linear_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.resample import gapfill_daily_linear

    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    return gapfill_daily_linear(ev)


@register(
    "stream_outer_interval_join",
    """
    SELECT c_user AS user_id,
           CAST(count(*) AS BIGINT) AS n_clicks,
           CAST(count(p_ts) AS BIGINT) AS n_converted,
           CAST(count(*) - count(p_ts) AS BIGINT) AS n_unmatched
    FROM (SELECT user_id AS c_user, ts AS c_ts
            FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT user_id AS p_user, ts AS p_ts
                 FROM events WHERE event_type = 'purchase') p
      ON c_user = p_user
     AND p_ts >= c_ts
     AND p_ts < c_ts + INTERVAL '5 minutes'
    GROUP BY 1
    """,
    doc="LEFT OUTER stream-stream interval join "
        "(streaming/ingest_stream.interval_join(how='left_outer'), "
        "new r8): clicks with their within-5-min purchase OR a NULL "
        "right side — the 'which impressions did NOT convert' query "
        "that an inner join cannot answer. In streaming mode Spark "
        "can only emit an unmatched left row once the watermark "
        "proves no in-window match can still arrive (watermark + "
        "gap), which is exactly why outer stream joins REQUIRE the "
        "watermarks and explicit time bound the operator always "
        "sets; state stays bounded the same way as the inner form. "
        "Batch mode runs the identical plan eagerly -> exact SQL "
        "oracle; a click matching multiple purchases multiplies "
        "rows in BOTH engines (join semantics, pinned by "
        "n_clicks >= the distinct click count).",
)
def stream_outer_interval_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..streaming.ingest_stream import interval_join

    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    j = interval_join(
        clicks, purchases, ("c_user", "p_user"), "c_ts", "p_ts",
        "5 minutes", how="left_outer",
    )
    return j.groupBy(F.col("c_user").alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.count("p_ts").alias("n_converted"),
        (F.count(F.lit(1)) - F.count("p_ts")).alias("n_unmatched"),
    )


@register(
    "curate_mixture_sample",
    f"""
    WITH tok AS (
      SELECT source AS domain, doc_id,
             CAST(len({_DUCK_TOKENS}) AS BIGINT) AS n_tok,
             CAST((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                   ::UBIGINT % 1000000) AS BIGINT) AS bucket
      FROM documents
      WHERE source IN ('src0', 'src1', 'src2', 'src3')),
    shares(domain, share_e6) AS (VALUES
      ('src0', 350000), ('src1', 300000),
      ('src2', 150000), ('src3', 200000)),
    tot AS (SELECT domain, sum(n_tok) AS t FROM tok GROUP BY domain),
    b AS (SELECT min(t * 1000000 // share_e6) AS budget
          FROM tot JOIN shares USING (domain)),
    thr AS (SELECT domain,
                   share_e6 * budget // 1000000 AS target_tokens,
                   (share_e6 * budget // 1000000) * 1000000 // t
                     AS thresh
            FROM tot JOIN shares USING (domain) CROSS JOIN b)
    SELECT domain, CAST(count(*) AS BIGINT) AS n_docs_kept,
           CAST(sum(n_tok) AS BIGINT) AS tokens_kept,
           CAST(min(target_tokens) AS BIGINT) AS target_tokens
    FROM tok JOIN thr USING (domain)
    WHERE bucket < thresh
    GROUP BY domain
    """,
    doc="Training-mixture SAMPLER (operators/curation.py::"
        "mixture_sample, new r9 — the materialization half of "
        "curate_domain_token_budget's weights report): target token "
        "shares per domain -> the largest feasible total budget "
        "(min over domains of tokens/share, the binding-domain rule) "
        "-> per-domain deterministic md5-bucket keep thresholds. ALL "
        "derived quantities are exact BIGINT arithmetic (shares "
        "snapped to 1e-6 units, no float division), so the kept set "
        "is bit-reproducible across engines/runs/layouts and the "
        "oracle recomputes it from scratch in SQL. Plan: one narrow "
        "per-domain agg (bounded collect = domain cardinality) + a "
        "pure-map codegen filter — linear at 100 TB.",
)
def curate_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import mixture_sample

    kept = mixture_sample(
        table(spark, sf_dir, "documents"),
        {"src0": 0.35, "src1": 0.3, "src2": 0.15, "src3": 0.2},
    )
    return kept.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_tok").alias("tokens_kept"),
        F.min("target_tokens").alias("target_tokens"),
    )


@register(
    "split_balance_classes_skewed",
    """
    SELECT doc_id, label
    FROM (
      SELECT doc_id, label,
             row_number() OVER (
               PARTITION BY label
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM (SELECT doc_id,
                   CASE WHEN doc_id % 10 < 7 THEN 'web' ELSE lang END
                     AS label
            FROM documents))
    WHERE rn <= 40
    """,
    doc="Class-balanced downsampling under a DOMINANT label (new r10 "
        "— the configuration the r9 verdict flagged as the salted "
        "two-phase fix's target): ~70% of docs collapse to one "
        "'web' label, the rest keep their language. balance_classes "
        "caps each label at 40 by content-addressed md5 order "
        "through per-(label, salt) windows, so the dominant label "
        "sorts in 256 bounded tasks, never one; output is "
        "bit-identical to the naive per-label rank (the oracle IS "
        "that naive rank). Plan shape pytest-pinned "
        "(test_balance_classes_plan_windows_partition_on_label_salt).",
)
def split_balance_classes_skewed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.split import balance_classes

    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 10 < 7, F.lit("web"))
        .otherwise(F.col("lang"))
        .alias("label"),
    )
    return balance_classes(docs, "label", "doc_id", cap=40)


@register(
    "dedup_span_rewrite",
    f"""
    WITH w AS (SELECT doc_id, {_DUCK_TOKENS} AS w FROM documents),
    occ AS (
      SELECT doc_id, CAST((i - 1) / 8 AS BIGINT) AS pos,
             array_to_string(list_slice(w, i, i + 7), ' ') AS c
      FROM (SELECT doc_id, w,
                   unnest(generate_series(1, greatest(len(w), 1), 8))
                     AS i
            FROM w)),
    k AS (
      SELECT *, row_number() OVER (
               PARTITION BY c ORDER BY doc_id, pos) AS rn
      FROM occ),
    reb AS (
      SELECT doc_id, string_agg(c, ' ' ORDER BY pos) AS clean_text,
             CAST(count(*) AS BIGINT) AS kept_chunks
      FROM k WHERE rn = 1 GROUP BY doc_id),
    tot AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks
      FROM occ GROUP BY doc_id)
    SELECT t.doc_id,
           coalesce(r.clean_text, '') AS clean_text,
           t.n_chunks,
           CAST(coalesce(r.kept_chunks, 0) AS BIGINT) AS kept_chunks
    FROM tot t LEFT JOIN reb r USING (doc_id)
    """,
    doc="Exact-substring dedup, REMOVAL stage at 8-token-chunk "
        "granularity (operators/dedup.py::span_dedup_rewrite; Lee et "
        "al. 2022's suffix-array span cuts approximated at chunk "
        "grain — dedup_ngram_span_coverage is the matching AUDIT "
        "stage): every document rewritten with all but the "
        "corpus-first occurrence of each chunk removed, fully-"
        "duplicated docs collapsing to ''. Keys on the chunk STRING "
        "(not a 64-bit hash) because the op deletes text — a "
        "collision would destroy novel content. Explode -> one "
        "min(struct) shuffle -> winners equi-join -> per-doc "
        "rebuild; no windows, linear in chunks; the oracle replays "
        "the identical first-occurrence rule as a row_number "
        "window.",
)
def dedup_span_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import span_dedup_rewrite

    return span_dedup_rewrite(table(spark, sf_dir, "documents"))


@register(
    "ann_ivf_filtered_topk",
    """
    WITH cent AS (
      SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings WHERE vec_id < 16),
    corpus AS (
      SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings),
    assign AS (
      SELECT neighbor_id, cid FROM (
        SELECT corpus.neighbor_id, cent.cid,
               row_number() OVER (
                 PARTITION BY corpus.neighbor_id
                 ORDER BY round(list_cosine_similarity(v, cv), 6) DESC, cid
               ) AS rn
        FROM corpus CROSS JOIN cent) a
      WHERE rn = 1),
    q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 10),
    probe AS (
      SELECT query_id, cid FROM (
        SELECT q.query_id, cent.cid,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY round(list_cosine_similarity(qv, cv), 6) DESC, cid
               ) AS rn
        FROM q CROSS JOIN cent) p
      WHERE rn <= 8),
    allowed AS (
      SELECT doc_id AS neighbor_id FROM documents
      WHERE contains(lower(text), 'data')),
    scored AS (
      SELECT probe.query_id, assign.neighbor_id,
             round(list_cosine_similarity(qv, v), 6) AS cos_sim
      FROM probe
      JOIN assign USING (cid)
      JOIN allowed ON allowed.neighbor_id = assign.neighbor_id
      JOIN q ON q.query_id = probe.query_id
      JOIN corpus ON corpus.neighbor_id = assign.neighbor_id
      WHERE probe.query_id <> assign.neighbor_id),
    ranked AS (
      SELECT query_id, neighbor_id, cos_sim,
             CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, cos_sim, rank
    FROM ranked WHERE rank <= 5
    """,
    doc="FILTERED IVF vector search with index reuse (similarity.py::"
        "ivf_topk(allowed_ids=...) — FAISS IDSelector / Milvus "
        "filtered-search post-filter design, public): the IVF "
        "assignment is the one index built over the FULL corpus; a "
        "keyword predicate on the joined documents table restricts "
        "candidates via a semi-join AFTER the probe join, so the "
        "selective filter makes the query cheaper instead of forcing "
        "an index rebuild (what ann_filtered_cosine_topk's exact "
        "brute-force does). nprobe doubled to 8 vs the unfiltered "
        "ann_ivf_topk — the documented post-filter recall trade: "
        "probed cells must still hold >= k allowed members.",
)
def ann_ivf_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_topk

    emb = table(spark, sf_dir, "embeddings")
    docs = table(spark, sf_dir, "documents")
    allowed = docs.filter(
        F.lower(F.col("text")).contains("data")
    ).select("doc_id")
    return ivf_topk(
        emb,
        emb.filter(F.col("vec_id") < 10),
        k=5,
        n_centroids=16,
        nprobe=8,
        allowed_ids=allowed,
    )


@register(
    "curate_full_pipeline",
    f"""
    WITH s AS (
      SELECT doc_id, text,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm,
             {_DUCK_TOKENS} AS w
      FROM documents
    ),
    m AS (
      SELECT doc_id, text, w,
             len(w) AS n_tokens,
             (length(norm) - (len(w) - 1)) / CAST(len(w) AS DOUBLE)
               AS mean_len,
             length(regexp_replace(norm, '[^a-z]', '', 'g'))
               / CAST(length(norm) AS DOUBLE) AS alpha_ratio,
             len(list_filter(w, x -> list_contains(
               ['a','and','das','dans','de','der','des','die','el','en',
                'es','est','et','ein','in','is','it','la','le','les','of',
                'pour','que','the','to','un','und','une','von','y','zu',
                'ist'], x)))
               / CAST(len(w) AS DOUBLE) AS stop_ratio
      FROM s
    ),
    kept AS (
      SELECT doc_id, text, w FROM m
      WHERE n_tokens BETWEEN 5 AND 5000
        AND mean_len BETWEEN 2.0 AND 12.0
        AND alpha_ratio >= 0.6 AND stop_ratio >= 0.01
    ),
    dd AS (
      SELECT doc_id, text, w FROM (
        SELECT *, row_number() OVER (
                 PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM kept) WHERE rn = 1
    ),
    occ AS (
      SELECT doc_id,
             CAST((i - 1) / 8 AS BIGINT) AS pos,
             array_to_string(list_slice(w, i, i + 7), ' ') AS c
      FROM (SELECT doc_id, w,
                   unnest(generate_series(1, greatest(len(w), 1), 8))
                     AS i
            FROM dd)),
    k AS (
      SELECT *, row_number() OVER (
               PARTITION BY c ORDER BY doc_id, pos) AS rn
      FROM occ),
    reb AS (
      SELECT doc_id, string_agg(c, ' ' ORDER BY pos) AS clean_text
      FROM k WHERE rn = 1 GROUP BY doc_id)
    SELECT '1_raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(w)) AS BIGINT) AS n_tokens FROM s
    UNION ALL
    SELECT '2_quality', CAST(count(*) AS BIGINT),
           CAST(sum(len(w)) AS BIGINT) FROM kept
    UNION ALL
    SELECT '3_exact_dedup', CAST(count(*) AS BIGINT),
           CAST(sum(len(w)) AS BIGINT) FROM dd
    UNION ALL
    SELECT '4_span_rewrite', CAST(count(*) AS BIGINT),
           CAST(sum(len(string_split(clean_text, ' '))) AS BIGINT)
    FROM reb
    """,
    doc="The COMPOSED preprocessing recipe — the operators chained "
        "the way a training-data pipeline actually runs them, as ONE "
        "DataFrame program: Gopher quality gate "
        "(operators/curation.py::quality_gate) -> exact dedup "
        "(min-id keeper per md5) -> exact-substring span rewrite "
        "(operators/dedup.py::span_dedup_rewrite, docs reduced to "
        "'' dropped), with per-stage (n_docs, n_tokens) funnel "
        "rows out. Every stage reuses an operator whose standalone "
        "query is independently oracle-green; the oracle here chains "
        "their validated SQL twins, so a drift in ANY stage's "
        "composition breaks the hash. Plan: gate is a projection, "
        "dedup one md5 groupBy + semi-join, rewrite one "
        "min(struct) shuffle + winners join — all keyed, no "
        "windows, linear end to end.",
)
def curate_full_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import quality_gate
    from ..operators.dedup import normalize_text, span_dedup_rewrite

    docs = table(spark, sf_dir, "documents")
    gate = quality_gate(docs)
    kept = docs.join(
        gate.filter(F.col("keep")).select("doc_id"), "doc_id"
    )
    dd = kept.join(
        kept.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id"),
        "doc_id",
        "semi",
    )
    rw = span_dedup_rewrite(dd).filter(F.col("kept_chunks") > 0)

    def summ(stage: str, df: DataFrame, col: str) -> DataFrame:
        toks = F.size(F.split(normalize_text(F.col(col)), " "))
        return df.agg(
            F.lit(stage).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(toks).cast("long").alias("n_tokens"),
        )

    return (
        summ("1_raw", docs, "text")
        .unionAll(summ("2_quality", kept, "text"))
        .unionAll(summ("3_exact_dedup", dd, "text"))
        .unionAll(summ("4_span_rewrite", rw, "clean_text"))
    )
