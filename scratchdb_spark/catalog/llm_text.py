"""LLM-pipeline extensions: dedup, embedding similarity/ANN, text analysis, multimodal plumbing, splits and sampling.

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
# LLM-pipeline extensions: dedup / similarity / text analysis / multimodal
# (beyond reference parity — SURVEY.md §7 milestone 5)
# ---------------------------------------------------------------------------




@register(
    "dedup_exact_documents",
    """
    SELECT md5(text) AS text_hash, min(doc_id) AS keep_id,
           count(*) AS n_dups
    FROM documents GROUP BY md5(text)
    """,
    doc="Exact dedup: hash-groupBy, deterministic keeper (min id).",
)
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import exact_dedup

    return exact_dedup(table(spark, sf_dir, "documents"))


@register(
    "dedup_minhash_near_pairs",
    f"""
    WITH g AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS sh
      FROM (SELECT doc_id, {_DUCK_TOKENS} AS w FROM documents)
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.sh, b.sh))
                 / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE),
                 4) AS jaccard_sim
    FROM g a JOIN g b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh))
          >= 0.8 * len(list_distinct(list_concat(a.sh, b.sh)))
    """,
    doc="MinHash+LSH near-dup pairs (jaccard >= 0.8 on 3-gram shingles); "
        "oracle is the exact quadratic jaccard — LSH capture probability "
        "at j=0.8 with 16 bands x 4 rows is ~0.9998, and the verify stage "
        "removes false positives, so outputs match w.h.p.",
)
def dedup_minhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        table(spark, sf_dir, "documents"), threshold=0.8
    )


@register(
    "dedup_simhash_clusters",
    _fixture_oracle(
        "dedup_simhash_clusters",
        ["simhash", "cluster_id", "n_docs", "doc_ids"],
    ),
    doc="SimHash fingerprint clusters (identical 64-bit fingerprints). "
        "xxhash64 is not reproducible in DuckDB, so the oracle is a "
        "determinism-checked golden snapshot (fixed seed, hash-only "
        "pipeline). doc_ids is emitted sorted and comma-joined so the "
        "hash-compare sees a scalar, not an engine-specific array "
        "encoding.",
)
def dedup_simhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import simhash_clusters

    return simhash_clusters(table(spark, sf_dir, "documents")).withColumn(
        "doc_ids", F.array_join("doc_ids", ",")
    )


@register(
    "dedup_simhash_near_pairs",
    _fixture_oracle(
        "dedup_simhash_near_pairs", ["id_a", "id_b", "hamming"]
    ),
    doc="SimHash near-dup pairs within hamming<=3 via 4-band pigeonhole "
        "blocking (complete, not probabilistic): any pair differing in "
        "<4 bits agrees exactly on one 16-bit band, so candidates come "
        "from an equi-join, never a cross product.",
)
def dedup_simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import simhash_near_pairs

    return simhash_near_pairs(table(spark, sf_dir, "documents"))


@register(
    "text_ngram_jaccard_pairs",
    f"""
    WITH g AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS sh
      FROM (SELECT doc_id, {_DUCK_TOKENS} AS w
            FROM documents WHERE doc_id < 100)
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.sh, b.sh))
                 / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE),
                 4) AS jaccard_sim
    FROM g a JOIN g b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh))
          >= 0.2 * len(list_distinct(list_concat(a.sh, b.sh)))
    """,
    doc="Exact pairwise n-gram jaccard on a bounded slice.",
)
def text_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import ngram_jaccard_pairs

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return ngram_jaccard_pairs(docs, threshold=0.2)


@register(
    "ann_cosine_topk",
    """
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 10),
         c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
               FROM embeddings),
         scored AS (
           SELECT query_id, neighbor_id,
                  round(list_cosine_similarity(qv, cv), 6) AS cos_sim
           FROM q JOIN c ON query_id <> neighbor_id),
         ranked AS (
           SELECT query_id, neighbor_id, cos_sim,
                  CAST(row_number() OVER (
                    PARTITION BY query_id
                    ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS rank
           FROM scored)
    SELECT query_id, neighbor_id, cos_sim, rank
    FROM ranked WHERE rank <= 5
    """,
    doc="Brute-force cosine top-k (exact ANN baseline): query side "
        "broadcast, one streaming pass over the corpus.",
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import brute_force_topk

    emb = table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    return brute_force_topk(emb, queries_df, k=5)


@register(
    "ann_lsh_topk",
    _fixture_oracle(
        "ann_lsh_topk", ["query_id", "neighbor_id", "cos_sim", "rank"]
    ),
    doc="Random-hyperplane LSH ANN: bucket-join candidates then exact "
        "cosine — the linear-cost scale path for 100 TB corpora. "
        "Hyperplanes are seeded deterministically, so the oracle is a "
        "determinism-checked golden snapshot of the Spark output.",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import lsh_topk

    emb = table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    return lsh_topk(emb, queries_df, k=5)


@register(
    "ann_ivf_topk",
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
      WHERE rn <= 4),
    scored AS (
      SELECT probe.query_id, assign.neighbor_id,
             round(list_cosine_similarity(qv, v), 6) AS cos_sim
      FROM probe
      JOIN assign USING (cid)
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
    doc="IVF ANN (operators/similarity.py::ivf_topk): corpus assigned "
        "to nearest of 16 deterministic centroids, queries probe their "
        "4 nearest lists, exact cosine on list members only. Fully "
        "SQL-expressible (deterministic centroids), so unlike LSH this "
        "approximate index gets a hash-checked oracle.",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_topk

    emb = table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    return ivf_topk(emb, queries_df, k=5, n_centroids=16, nprobe=4)


@register(
    "emb_quantize_sq8",
    """
    WITH dims AS (
      SELECT unnest(generate_series(1, len(embedding))) - 1 AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings),
    rng AS (
      SELECT dim, min(x) AS vmin, max(x) AS vmax FROM dims GROUP BY dim),
    coded AS (
      SELECT dims.dim, rng.vmin, rng.vmax,
             round((x - vmin) / (vmax - vmin) * 255) AS code,
             abs(x - (vmin + round((x - vmin) / (vmax - vmin) * 255)
                             * (vmax - vmin) / 255)) AS err
      FROM dims JOIN rng USING (dim))
    SELECT CAST(dim AS INTEGER) AS dim,
           round(min(vmin), 6) AS vmin,
           round(max(vmax), 6) AS vmax,
           count(DISTINCT code) AS n_codes,
           CAST(round(avg(err) * 1e6) AS BIGINT) AS mean_err_e6
    FROM coded GROUP BY dim
    """,
    doc="Int8 scalar-quantization audit (operators/similarity.py::"
        "scalar_quantize_stats): per-dim min/max training, code "
        "assignment, reconstruction error — the storage-compression "
        "path for 100 TB embedding corpora, hash-checked against the "
        "same arithmetic in SQL.",
)
def emb_quantize_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import scalar_quantize_stats

    return scalar_quantize_stats(table(spark, sf_dir, "embeddings"))


@register(
    "emb_near_dup_pairs",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6)
             AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[])), 6)
          >= 0.4
    """,
    doc="Embedding near-duplicate pairs above a cosine threshold.",
)
def emb_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import cosine_pairs_above

    return cosine_pairs_above(table(spark, sf_dir, "embeddings"), 0.4)


@register(
    "emb_semdedup_prune",
    """
    WITH cent AS (
      SELECT vec_id AS ccid, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings ORDER BY vec_id LIMIT 16),
    corpus AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    assign AS (
      SELECT vec_id, ccid AS cid FROM (
        SELECT corpus.vec_id, cent.ccid,
               row_number() OVER (
                 PARTITION BY corpus.vec_id
                 ORDER BY round(list_cosine_similarity(v, cv), 6) DESC,
                          ccid
               ) AS rn
        FROM corpus CROSS JOIN cent) a
      WHERE rn = 1),
    dropped AS (
      SELECT DISTINCT b.vec_id
      FROM assign a
      JOIN assign b ON a.cid = b.cid AND a.vec_id < b.vec_id
      JOIN corpus ca ON ca.vec_id = a.vec_id
      JOIN corpus cb ON cb.vec_id = b.vec_id
      WHERE round(list_cosine_similarity(ca.v, cb.v), 6) >= 0.4)
    SELECT assign.vec_id, assign.cid,
           dropped.vec_id IS NULL AS kept
    FROM assign LEFT JOIN dropped ON assign.vec_id = dropped.vec_id
    """,
    doc="SemDedup semantic dedup (operators/similarity.py::"
        "semdedup_prune, Abbas et al. 2023): coarse-cluster the "
        "embeddings, drop within-cell cosine near-dups keeping the "
        "smallest id. The linear scale path whose guarded quadratic "
        "oracle is emb_near_dup_pairs; deterministic cells make it "
        "hash-checkable end to end.",
)
def emb_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import semdedup_prune

    return semdedup_prune(table(spark, sf_dir, "embeddings"), tau=0.4,
                          n_cells=16)


@register(
    "text_langid",
    """
    WITH t AS (SELECT doc_id, {toks} AS w FROM documents),
    h AS (
      SELECT doc_id,
        len(list_filter(w, x -> x IN ('der','die','das','und','ist','von','ein','zu'))) AS de_hits,
        len(list_filter(w, x -> x IN ('the','a','and','of','to','in','is','it')))       AS en_hits,
        len(list_filter(w, x -> x IN ('el','la','de','que','y','en','un','es')))        AS es_hits,
        len(list_filter(w, x -> x IN ('le','les','des','et','une','est','dans','pour'))) AS fr_hits
      FROM t)
    SELECT doc_id, de_hits, en_hits, es_hits, fr_hits,
           CASE WHEN greatest(de_hits, en_hits, es_hits, fr_hits) = 0 THEN 'und'
                WHEN de_hits = greatest(de_hits, en_hits, es_hits, fr_hits) THEN 'de'
                WHEN en_hits = greatest(de_hits, en_hits, es_hits, fr_hits) THEN 'en'
                WHEN es_hits = greatest(de_hits, en_hits, es_hits, fr_hits) THEN 'es'
                ELSE 'fr' END AS predicted_lang
    FROM h
    """.format(toks=_DUCK_TOKENS),
    doc="Stopword-ratio language ID (deterministic tie-break ladder).",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import lang_id

    return lang_id(table(spark, sf_dir, "documents"))


@register(
    "text_quality",
    """
    WITH t AS (
      SELECT doc_id,
             length(text) AS n_chars,
             len({toks}) AS n_tokens,
             length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
               / CAST(length(text) AS DOUBLE) AS punct_ratio,
             length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
               / CAST(length(text) AS DOUBLE) AS alpha_ratio,
             len(list_filter({toks},
                 x -> x IN ('the','a','and','of','to','in','is','it')))
               / CAST(len({toks}) AS DOUBLE) AS stop_ratio
      FROM documents)
    SELECT doc_id, n_chars, n_tokens,
           round(punct_ratio, 4) AS punct_ratio,
           round(alpha_ratio, 4) AS alpha_ratio,
           round(stop_ratio, 4) AS stop_ratio,
           round(least(1.0, n_tokens / 50.0) * (1 - punct_ratio) * alpha_ratio
                 * (0.5 + least(0.5, stop_ratio * 2)) + 1e-9, 4) AS quality
    FROM t
    """.format(toks=_DUCK_TOKENS),
    doc="Quality features + composite score (epsilon-stabilized "
        "rounding on the composite: its exact value can sit on a 4dp "
        "half-way point where cross-engine ulp differences round "
        "apart — see operators/text.py quality_score).",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import quality_score

    return quality_score(table(spark, sf_dir, "documents"))


@register(
    "text_token_stats",
    """
    SELECT doc_id,
           len(regexp_split_to_array(trim(text), '\\s+')) AS ws_tokens,
           len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))
             AS bpe_tokens,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_tokens
    FROM documents
    """,
    doc="Token counting: whitespace, BPE-ish regex, chars/4 estimate.",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import token_stats

    return token_stats(table(spark, sf_dir, "documents"))


@register(
    "text_fingerprint",
    """
    WITH t AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm,
             {toks} AS w
      FROM documents)
    SELECT doc_id,
           md5(norm) AS md5_fp,
           CAST(list_sum(list_transform(generate_series(1, len(w)),
                i -> i * (length(w[i]) * 131 + ascii(w[i])))) AS BIGINT)
             AS poly_fp
    FROM t
    """.format(toks=_DUCK_TOKENS),
    doc="Document fingerprints: md5 of normalized text + positional "
        "polynomial hash.",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import fingerprint

    return fingerprint(table(spark, sf_dir, "documents"))


@register(
    "multimodal_payload_meta",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           md5(text) AS checksum
    FROM documents
    """,
    doc="Multimodal binary column plumbing: payload + typed metadata "
        "(real PPM/BMP decode in multimodal_decode_image; compressed "
        "formats need libs this container lacks).",
)
def multimodal_payload_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import attach_payload

    docs = attach_payload(table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.checksum").alias("checksum"),
    )


@register(
    "multimodal_frame_sample",
    """
    WITH p AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS n,
             greatest(1, octet_length(encode(text)) // 4) AS step
      FROM documents),
    f AS (
      SELECT doc_id,
             CAST(i AS INTEGER) AS frame_idx,
             substring(hx, CAST(i * step * 2 + 1 AS BIGINT),
                       CAST(step * 2 AS BIGINT)) AS frame_hex
      FROM p CROSS JOIN generate_series(0, 3) AS g(i)
      WHERE n > 0 AND i < least(4, n))
    SELECT doc_id, frame_idx, frame_hex FROM f
    """,
    doc="Video-frame-sampling shape (operators/multimodal.py::"
        "sample_frames): one payload row fans out to n evenly spaced "
        "byte slices via mapInPandas; frames compared hex-encoded "
        "(DuckDB has no blob substring) so the binary round-trip is "
        "hash-checked cross-engine.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import attach_payload, sample_frames

    docs = attach_payload(table(spark, sf_dir, "documents"))
    return sample_frames(docs, n_frames=4).select(
        "doc_id", "frame_idx", F.hex("frame").alias("frame_hex")
    )


@register(
    "multimodal_fake_features",
    _fixture_oracle("multimodal_fake_features", ["doc_id", "dim", "f0"]),
    doc="Arrow-batched mapInPandas feature extraction over binary "
        "payloads (deterministic stub kernel; real decode not "
        "installed). Oracle is a golden snapshot — the kernel is a "
        "pure function of the payload bytes.",
)
def multimodal_fake_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import attach_payload, extract_features

    docs = attach_payload(table(spark, sf_dir, "documents"))
    feats = extract_features(docs)
    return feats.select(
        "doc_id",
        F.size("features").alias("dim"),
        F.round(F.element_at("features", 1), 6).alias("f0"),
    )


@register(
    "multimodal_decode_image",
    """
    WITH d AS (
      SELECT doc_id,
             CAST(4 + doc_id % 5 AS INTEGER) AS width,
             CAST(3 + doc_id % 4 AS INTEGER) AS height,
             CASE WHEN doc_id % 2 = 0 THEN 'ppm' ELSE 'bmp' END AS fmt
      FROM documents)
    SELECT d.doc_id, d.fmt, d.width, d.height,
      CAST(sum((d.doc_id*31 + y.y*17 + x.x*7) % 256) AS BIGINT) AS sum_r,
      CAST(sum((d.doc_id*31 + y.y*17 + x.x*7 + 11) % 256) AS BIGINT)
        AS sum_g,
      CAST(sum((d.doc_id*31 + y.y*17 + x.x*7 + 22) % 256) AS BIGINT)
        AS sum_b,
      CAST((d.doc_id*31) % 256 * 65536 + (d.doc_id*31 + 11) % 256 * 256
           + (d.doc_id*31 + 22) % 256 AS BIGINT) AS topleft_rgb
    FROM d
    CROSS JOIN generate_series(0, 5) y(y)
    CROSS JOIN generate_series(0, 7) x(x)
    WHERE y.y < d.height AND x.x < d.width
    GROUP BY ALL
    """,
    doc="REAL image decode end-to-end (r12 — the repo's last stub "
        "closed): per document a deterministic test card is rendered "
        "whose pixel (x, y) channel c is (doc_id*31 + y*17 + x*7 + "
        "c*11) % 256, encoded as binary P6 PPM (even doc_ids) or "
        "24-bit bottom-up BGR BMP with 4-byte row padding (odd), then "
        "PARSED BACK by operators/multimodal.py::decode_image (pure "
        "numpy, Arrow-batched mapInPandas). The oracle computes the "
        "per-channel pixel sums and the packed top-left pixel "
        "ANALYTICALLY from the formula — the encode -> decode binary "
        "round-trip (headers, strides, padding, BGR/bottom-up "
        "unflip) is hash-checked without the oracle touching a single "
        "byte. Exact BIGINT outputs; no float boundary anywhere.",
)
def multimodal_decode_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import widen
    from ..operators.multimodal import decode_image, synth_image_payload

    docs = widen(table(spark, sf_dir, "documents").select("doc_id"))
    return decode_image(synth_image_payload(docs))


@register(
    "split_train_val_test",
    """
    SELECT split, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM (
      SELECT CASE WHEN bucket < 90 THEN 'train'
                  WHEN bucket < 95 THEN 'val'
                  ELSE 'test' END AS split,
             n_chars
      FROM (SELECT (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                    % 100) AS bucket,
                   n_chars
            FROM documents) b
    ) s
    GROUP BY split
    """,
    doc="Content-addressed train/val/test split (operators/split.py): "
        "md5-bucket assignment is reproducible across engines, runs and "
        "cluster layouts, unlike randomSplit; oracle recomputes the "
        "same md5 buckets in SQL.",
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.split import hash_split

    docs = table(spark, sf_dir, "documents")
    out = hash_split(
        docs, "doc_id", {"train": 0.90, "val": 0.05, "test": 0.05}
    )
    return out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@register(
    "stratified_sample_events",
    """
    WITH b AS (
      SELECT event_type, value,
             (('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::UBIGINT
              % 10000) AS bucket
      FROM events)
    SELECT event_type, count(*) AS n_kept,
           CAST(round(sum(value) * 100) AS BIGINT) AS value_e2
    FROM b
    WHERE (event_type = 'click'    AND bucket < 2000)
       OR (event_type = 'purchase' AND bucket < 5000)
       OR (event_type NOT IN ('click', 'purchase') AND bucket < 500)
    GROUP BY event_type
    """,
    doc="Deterministic stratified sampling (operators/split.py::"
        "stratified_sample): keep-decision is md5(event_id) mod grid — "
        "reproducible across engines/runs/layouts unlike sampleBy; "
        "oracle recomputes the identical buckets in SQL.",
)
def stratified_sample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.split import stratified_sample

    ev = table(spark, sf_dir, "events")
    kept = stratified_sample(
        ev,
        key_col="event_id",
        strata_col="event_type",
        fractions={"click": 0.20, "purchase": 0.50},
        default_fraction=0.05,
    )
    return kept.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.round(F.sum("value") * 100).cast("long").alias("value_e2"),
    )


@register(
    "text_clean_redact",
    r"""
    SELECT doc_id,
           trim(regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                   '<EMAIL>', 'g'),
                 'https?://[^\s]+', '<URL>', 'g'),
               '[0-9][0-9 ()+.-]{6,}[0-9]', '<NUMBER>', 'g'),
             '\s+', ' ', 'g')) AS clean_text,
           len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
             AS n_emails,
           len(regexp_extract_all(text, 'https?://[^\s]+')) AS n_urls,
           len(regexp_extract_all(text, '[0-9][0-9 ()+.-]{6,}[0-9]'))
             AS n_number_runs
    FROM documents
    """,
    doc="Corpus cleaning + PII-ish redaction (operators/text.py::"
        "clean_and_redact): email/URL/digit-run placeholders + "
        "whitespace normalization, with per-doc audit counts; patterns "
        "restricted to Java-regex/RE2-shared syntax so the oracle runs "
        "the identical expressions.",
)
def text_clean_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import clean_and_redact

    return clean_and_redact(table(spark, sf_dir, "documents"))


@register(
    "text_tfidf_top_terms",
    """
    WITH tok AS (
      SELECT doc_id, unnest({toks}) AS term FROM documents),
    tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM tok WHERE term <> '' GROUP BY doc_id, term),
    dfreq AS (
      SELECT term, count(DISTINCT doc_id) AS doc_freq FROM tf GROUP BY term),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, dfreq.doc_freq,
             round(tf.tf * (ln((n.n_docs + 1.0) / (dfreq.doc_freq + 1.0))
                            + 1.0), 6) AS tfidf
      FROM tf JOIN dfreq USING (term) CROSS JOIN n),
    ranked AS (
      SELECT *, CAST(row_number() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, term) AS INTEGER)
             AS rnk
      FROM scored)
    SELECT doc_id, term, tf, doc_freq, tfidf, rnk
    FROM ranked WHERE rnk <= 3
    """.format(toks=_DUCK_TOKENS),
    doc="TF-IDF top-3 characteristic terms per document "
        "(operators/text.py::tfidf_top_terms, scikit-style smoothed "
        "idf); scores rounded to 6dp before ranking so the order is "
        "engine-independent.",
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import tfidf_top_terms

    return tfidf_top_terms(table(spark, sf_dir, "documents"), k=3)


@register(
    "range_join_click_purchase",
    """
    SELECT p.user_id, count(*) AS n_pairs,
           CAST(round(sum(p.value) * 100) AS BIGINT) AS purchase_value_e2
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND epoch_us(p.ts) - epoch_us(c.ts) >= 0
     AND epoch_us(p.ts) - epoch_us(c.ts) < 900 * 1000000
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    GROUP BY p.user_id
    """,
    doc="Bucketed time-range join (operators/rangejoin.py): click->"
        "purchase pairs within 15 min, equi-joined on quantized time "
        "buckets instead of a nested-loop cross product; oracle is the "
        "naive non-equi join in integer microseconds.",
)
def range_join_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rangejoin import range_join_seconds

    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("user_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    pairs = range_join_seconds(
        clicks,
        purchases,
        left_ts="c_ts",
        right_ts="p_ts",
        window_seconds=900,
        extra_cond=F.col("c_user") == F.col("user_id"),
    )
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.sum("p_value") * 100).cast("long").alias(
            "purchase_value_e2"
        ),
    )




@register(
    "sample_weighted_per_source",
    """
    SELECT source, doc_id, n_chars AS weight
    FROM (
      SELECT source, doc_id, n_chars,
             row_number() OVER (
               PARTITION BY source
               ORDER BY round(ln(CAST((doc_id * 2654435761) % 2147483647
                                      + 1 AS DOUBLE) / 2147483648.0)
                              / CAST(greatest(n_chars, 1) AS DOUBLE), 12)
                           DESC,
                        doc_id ASC
             ) AS rnk
      FROM documents
    )
    WHERE rnk <= 10
    """,
    doc="PER-GROUP weighted sampling without replacement (the "
        "stratified form of sample_weighted_topk): the same "
        "deterministic Efraimidis-Spirakis key — Knuth-hash u, "
        "ln(u)/w rounded to 12dp so libm ulps can't flip cutoffs — "
        "ranked by a per-source window instead of a global top-k. "
        "The per-domain corpus subsample that keeps every mixture "
        "component represented. One shuffle on source; no global "
        "sort; reproducible run-to-run and engine-to-engine.",
)
def sample_weighted_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    u = (
        (F.col("doc_id") * F.lit(2654435761)) % F.lit(2147483647) + 1
    ).cast("double") / F.lit(2147483648.0)
    key = F.round(
        F.log(u) / F.greatest(F.col("n_chars"), F.lit(1)).cast("double"), 12
    )
    w = Window.partitionBy("source").orderBy(
        F.desc(key), F.asc("doc_id")
    )
    return (
        docs.select(
            "source", "doc_id", F.col("n_chars").alias("weight"),
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 10)
        .select("source", "doc_id", "weight")
    )


@register(
    "emb_pca_project",
    _fixture_oracle(
        "emb_pca_project", ["vec_id", "pc1", "pc2", "pc3", "pc4"]
    ),
    doc="Distributed PCA (operators/pca.py, new r8 — the FAISS "
        "PCAMatrix training split, public design): ONE pass "
        "accumulates exact scaled-integer (sum_x, sum_xx^T) partials "
        "(at most partitions x d^2 tiny rows shuffle — never the "
        "corpus), the d x d eigensolve runs on the driver (KBs for "
        "any embedding width), and projection is a second map-only "
        "pass with ZERO shuffle. Integer accumulation makes the "
        "covariance bit-identical under ANY partitioning (pytest "
        "pins fit invariance + a numpy oracle); eigenvector sign is "
        "fixed deterministically -> golden-fixture oracle. The "
        "dim-reduction step before ANN indexing/clustering in a "
        "training-data pipeline at 100 TB.",
)
def emb_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pca import pca_fit, pca_project

    emb = table(spark, sf_dir, "embeddings")
    mean, comps, _evr = pca_fit(emb, 4)
    return pca_project(emb, mean, comps)


@register(
    "text_phrase_search",
    f"""
    WITH w AS (SELECT doc_id, {_DUCK_TOKENS} AS ws FROM documents),
    tok AS (SELECT doc_id, ws[i] AS tok, i AS pos
            FROM w, LATERAL (SELECT unnest(
                     generate_series(1, len(ws))) AS i)),
    m AS (SELECT a.doc_id FROM tok a
          JOIN tok b ON a.doc_id = b.doc_id
                    AND b.pos = a.pos + 1 AND b.tok = 'hash'
          WHERE a.tok = 'table')
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
    FROM m GROUP BY doc_id
    """,
    doc="Exact phrase search ('table hash') over a POSITIONAL "
        "inverted index (operators/text.py::positional_postings / "
        "phrase_search, new r8 — the Lucene/ClickHouse inverted-"
        "index shape, public design): one posting row per token "
        "occurrence, phrase adjacency answered by equi-joins on "
        "(doc_id, pos - offset) whose build sides are ONLY the "
        "phrase tokens' posting lists — text is never rescanned and "
        "no position window materializes. At 100 TB the posting "
        "table persists range-clustered on tok so term lookups "
        "manifest-prune to the token's file range (complement of "
        "the token-bloom BASE-table skipping in "
        "warehouse_token_search, which cannot verify adjacency — "
        "blooms prune files by token PRESENCE; phrase semantics "
        "need positions).",
)
def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import phrase_search, positional_postings

    docs = table(spark, sf_dir, "documents")
    postings = positional_postings(docs)
    return phrase_search(postings, ["table", "hash"])


@register(
    "warehouse_postings_phrase_prune",
    f"""
    WITH w AS (SELECT doc_id, {_DUCK_TOKENS} AS ws FROM documents),
    tok AS (SELECT doc_id, ws[i] AS tok, i AS pos
            FROM w, LATERAL (SELECT unnest(
                     generate_series(1, len(ws))) AS i)),
    m AS (SELECT a.doc_id FROM tok a
          JOIN tok b ON a.doc_id = b.doc_id
                    AND b.pos = a.pos + 1 AND b.tok = 'hash'
          WHERE a.tok = 'table')
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits,
           true AS term_reads_pruned
    FROM m GROUP BY doc_id
    """,
    doc="The PERSISTED form of text_phrase_search (new r8): the "
        "positional posting table lives as a snapshot table "
        "range-clustered on tok (repartitionByRange + "
        "stat_cols=['tok'] zone maps), so each phrase token's "
        "posting list is fetched with read_snapshot(prune=(tok, "
        "term, term)) — planning ONLY the files whose token range "
        "holds that term, verified in-query from the actual plan "
        "(term_reads_pruned pins files_planned < files_total for "
        "BOTH terms). Phrase hits over the pruned reads hash-match "
        "the full-scan oracle. At 100 TB this is the inverted-index "
        "serving path: term lookup cost ~ the term's posting range, "
        "not the corpus.",
    bench=False,  # times temp-warehouse setup, not a scan
)
def warehouse_postings_phrase_prune(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from .. import snapshots as snap
    from ..operators.text import phrase_search, positional_postings
    from ..tables import Warehouse

    wh = Warehouse(spark, tempfile.mkdtemp(prefix="wh_post_"))
    docs = table(spark, sf_dir, "documents")
    postings = positional_postings(docs).withColumn(
        # positions are bounded far below 2^20 by document length
        "__row_id",
        F.col("doc_id") * (1 << 20) + F.col("pos"),
    )
    snap.append_versioned(
        wh, "db", "postings",
        postings.repartitionByRange(6, "tok"),
        stat_cols=["tok"],
    )
    total = len(snap.read_snapshot(wh, "db", "postings").inputFiles())
    per_term = []
    for term in ("table", "hash"):
        pr = snap.read_snapshot(
            wh, "db", "postings", prune=("tok", term, term)
        )
        per_term.append(pr)
    pruned_ok = all(
        len(pr.inputFiles()) < total for pr in per_term
    )
    both = per_term[0].unionByName(per_term[1]).select(
        "tok", "doc_id", "pos"
    )
    return phrase_search(both, ["table", "hash"]).select(
        "doc_id",
        "n_hits",
        F.lit(bool(pruned_ok)).alias("term_reads_pruned"),
    )


@register(
    "ann_mmr_rerank",
    _fixture_oracle(
        "ann_mmr_rerank",
        ["query_id", "neighbor_id", "mmr_score", "rank"],
    ),
    doc="MMR diversification re-rank (operators/similarity.py::"
        "mmr_rerank, new r8 — Carbonell & Goldstein SIGIR 1998): "
        "top-30 exact-cosine candidates per query greedily re-ranked "
        "to 10 by lam*relevance - (1-lam)*max-sim-to-selected "
        "(lam=0.7) — the standard fix for near-duplicate result "
        "lists that a dedup'd training corpus still produces at "
        "retrieval time. Selection is per-query over a pool x pool "
        "similarity matrix (KBs) via one applyInPandas — parallel "
        "across queries, never corpus-quadratic; deterministic "
        "rounding + tie rules -> golden-fixture oracle. Diversity "
        "effect is pinned by pytest (selected-set pairwise max-sim "
        "strictly below the un-reranked top-k's).",
)
def ann_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import mmr_rerank

    emb = table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    return mmr_rerank(emb, queries_df, k=10, pool=30, lam=0.7)


@register(
    "split_epoch_shuffle",
    """
    WITH s AS (
      SELECT doc_id, source,
             md5('3:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
      FROM documents
    )
    SELECT doc_id, source, shuffle_key,
           CAST(row_number() OVER (ORDER BY shuffle_key, doc_id)
                AS BIGINT) AS shuffle_rank
    FROM s
    """,
    doc="Deterministic epoch-seeded global shuffle "
        "(operators/split.py::epoch_shuffle, new r8; scale-safe rank "
        "r9): training-data ordering as md5(epoch:id) — a "
        "reproducible permutation per epoch, identical across "
        "engines/partitionings/worker counts (the reproducibility "
        "torch-style RNG shuffles lose when the worker count "
        "changes); hash-checked rank-for-rank against DuckDB. The "
        "rank is the two-pass prefix-bucket construction (per-bucket "
        "counts -> cumulative offsets -> PARTITIONED window + "
        "offset), bit-identical to a global sort with no "
        "SinglePartition exchange anywhere (pytest-pinned plan) — "
        "256-way parallel at the default, 16^k-way via prefix_chars.",
)
def split_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.split import epoch_shuffle

    docs = table(spark, sf_dir, "documents").select("doc_id", "source")
    return epoch_shuffle(docs, epoch=3)


@register(
    "text_pii_scrub",
    """
    WITH aug AS (
      SELECT doc_id,
             text || ' contact u' || doc_id || '@ex'
                  || (doc_id % 7) || '.org'
             || CASE WHEN doc_id % 3 = 0
                     THEN ' ssn 123-45-' || (1000 + doc_id % 9000)
                     ELSE '' END
             || CASE WHEN doc_id % 5 = 0
                     THEN ' card 4111 1111 1111 1111' ELSE '' END
             || CASE WHEN doc_id % 4 = 0
                     THEN ' call 415-555-' || (1000 + doc_id % 9000)
                     ELSE '' END
             || CASE WHEN doc_id % 6 = 0
                     THEN ' from 10.0.' || (doc_id % 256) || '.7'
                     ELSE '' END AS t
      FROM documents),
    s1 AS (SELECT doc_id,
             CAST(len(regexp_extract_all(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
               AS BIGINT) AS n_email,
             regexp_replace(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
               '<EMAIL>', 'g') AS t
           FROM aug),
    s2 AS (SELECT doc_id, n_email,
             CAST(len(regexp_extract_all(t, '\\b\\d{3}-\\d{2}-\\d{4}\\b'))
               AS BIGINT) AS n_ssn,
             regexp_replace(t, '\\b\\d{3}-\\d{2}-\\d{4}\\b',
               '<SSN>', 'g') AS t
           FROM s1),
    s3 AS (SELECT doc_id, n_email, n_ssn,
             CAST(len(regexp_extract_all(t,
               '\\b\\d{4}[- ]\\d{4}[- ]\\d{4}[- ]\\d{4}\\b'))
               AS BIGINT) AS n_card,
             regexp_replace(t,
               '\\b\\d{4}[- ]\\d{4}[- ]\\d{4}[- ]\\d{4}\\b',
               '<CARD>', 'g') AS t
           FROM s2),
    s4 AS (SELECT doc_id, n_email, n_ssn, n_card,
             CAST(len(regexp_extract_all(t,
               '\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b')) AS BIGINT)
               AS n_phone,
             regexp_replace(t, '\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b',
               '<PHONE>', 'g') AS t
           FROM s3),
    s5 AS (SELECT doc_id, n_email, n_ssn, n_card, n_phone,
             CAST(len(regexp_extract_all(t,
               '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))
               AS BIGINT) AS n_ipv4,
             regexp_replace(t,
               '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
               '<IP>', 'g') AS t
           FROM s4)
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_email) AS BIGINT) AS emails,
           CAST(sum(n_ssn) AS BIGINT) AS ssns,
           CAST(sum(n_card) AS BIGINT) AS cards,
           CAST(sum(n_phone) AS BIGINT) AS phones,
           CAST(sum(n_ipv4) AS BIGINT) AS ipv4s,
           CAST(sum(n_email + n_ssn + n_card + n_phone + n_ipv4)
                AS BIGINT) AS pii_total,
           CAST(sum(len(t)) AS BIGINT) AS redacted_chars
    FROM s5
    """,
    doc="Rule-based PII scrubbing (operators/text.py::pii_scrub, new "
        "r9): emails / SSN-shaped / card-shaped / phone-shaped / IPv4 "
        "spans replaced with typed placeholder tokens, counted per "
        "category BEFORE each replacement, rules applied in fixed "
        "most-specific-first order (a card never half-eaten as two "
        "phones) — the standard pre-training scrub whose counts feed "
        "the corpus datasheet. Pure regexp_count/regexp_replace "
        "inside codegen (no UDF, a pure map at 100 TB); patterns "
        "avoid lookaround/backrefs so java.util.regex and RE2 agree, "
        "and the oracle replays the identical rule chain stage by "
        "stage. PII is INJECTED deterministically from doc_id (the "
        "synthetic corpus has none) — both engines build the same "
        "augmented text, so counts and redacted-length check exactly.",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import pii_scrub

    d = F.col("doc_id")

    def opt(cond, *parts):
        return F.when(cond, F.concat(*parts)).otherwise(F.lit(""))

    aug = F.concat(
        F.col("text"),
        F.lit(" contact u"), d.cast("string"),
        F.lit("@ex"), (d % 7).cast("string"), F.lit(".org"),
        opt(d % 3 == 0, F.lit(" ssn 123-45-"),
            (d % 9000 + 1000).cast("string")),
        opt(d % 5 == 0, F.lit(" card 4111 1111 1111 1111")),
        opt(d % 4 == 0, F.lit(" call 415-555-"),
            (d % 9000 + 1000).cast("string")),
        opt(d % 6 == 0, F.lit(" from 10.0."),
            (d % 256).cast("string"), F.lit(".7")),
    )
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", aug.alias("text")
    )
    out = pii_scrub(docs)
    return out.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_email").alias("emails"),
        F.sum("n_ssn").alias("ssns"),
        F.sum("n_card").alias("cards"),
        F.sum("n_phone").alias("phones"),
        F.sum("n_ipv4").alias("ipv4s"),
        F.sum("pii_total").alias("pii_total"),
        F.sum(F.length("redacted")).alias("redacted_chars"),
    )


@register(
    "warehouse_dedup_index_incremental",
    f"""
    WITH probe AS (
      SELECT doc_id + 100000 AS pid, text FROM documents
      WHERE doc_id < 10
      UNION ALL
      SELECT doc_id + 200000 AS pid,
             array_to_string(list_reverse(string_split(text, ' ')), ' ')
      FROM documents WHERE doc_id >= 10 AND doc_id < 15),
    gp AS (
      SELECT pid, {_DUCK_SHINGLES} AS sh
      FROM (SELECT pid, {_DUCK_TOKENS} AS w
            FROM (SELECT pid, text FROM probe) _p)),
    gc AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS sh
      FROM (SELECT doc_id, {_DUCK_TOKENS} AS w FROM documents)),
    pairs AS (
      SELECT gp.pid, gc.doc_id,
             round(len(list_intersect(gp.sh, gc.sh))
                   / CAST(len(list_distinct(list_concat(gp.sh, gc.sh)))
                          AS DOUBLE), 4) AS j
      FROM gp JOIN gc ON TRUE
      WHERE len(list_intersect(gp.sh, gc.sh))
            >= 0.8 * len(list_distinct(list_concat(gp.sh, gc.sh))))
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(*) FILTER (j = 1.0) AS BIGINT) AS n_exact,
           CAST(count(DISTINCT pid) AS BIGINT) AS n_probes_matched,
           true AS refresh_equals_rebuild
    FROM pairs
    """,
    doc="Persistent minhash-LSH dedup index "
        "(operators/dedup_index.py, new r9 — the dedup-family "
        "counterpart of the IVFADC index): the banded signatures live "
        "as their own snapshot table (one row per (doc, band), "
        "range-clustered on band_hash with zone maps so a probe "
        "batch's hashes FILE-SKIP before scanning), new batches "
        "near-dup-check against the corpus via one (band, band_hash) "
        "equi-join + exact-jaccard verify over candidates only — "
        "batch-and-candidate-sized work, never a corpus re-minhash. "
        "No trained state: band rows are a pure function of text "
        "(fixed splitmix salts), so a CDC refresh is delete+recompute "
        "for exactly the changed ids and IN-QUERY the refreshed index "
        "is compared row-for-row against a fresh rebuild (the "
        "returned boolean). Oracle = the exact quadratic jaccard "
        "between probe and corpus (the same capture-probability "
        "argument as dedup_minhash_near_pairs: ~0.9998 at j=0.8, "
        "verify removes all false positives).",
    bench=False,  # times temp-warehouse setup, not a scan
)
def warehouse_dedup_index_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from .. import snapshots as snap
    from ..operators import dedup_index as di
    from ..tables import Warehouse

    wh = Warehouse(spark, tempfile.mkdtemp(prefix="wh_lsh_"))
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    snap.append_versioned(wh, "db", "docs", docs)
    di.build_dedup_index(wh, "db", "docs", "docs_lsh")

    probe = docs.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    ).unionByName(
        docs.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 15))
        .select(
            (F.col("doc_id") + 200000).alias("doc_id"),
            F.array_join(
                F.reverse(F.split(F.col("text"), " ")), " "
            ).alias("text"),
        )
    )
    pairs = di.query_dedup_index(
        wh, "db", "docs_lsh", probe, threshold=0.8
    ).persist()
    agg = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum((F.col("jaccard_sim") == 1.0).cast("long")).alias(
            "n_exact"
        ),
        F.countDistinct("probe_id").alias("n_probes_matched"),
    ).collect()[0]
    # r14: everything below recomputes from snapshots, so the pair
    # cache has served its one consumer — release it (guide §5)
    pairs.unpersist()

    # churn + refresh == rebuild (the pure-function-of-text invariant)
    snap.append_versioned(wh, "db", "docs", probe)
    di.refresh_dedup_index(wh, "db", "docs_lsh")
    di.build_dedup_index(wh, "db", "docs", "docs_lsh_rb")
    refreshed = snap.read_snapshot(wh, "db", "docs_lsh")
    rebuilt = snap.read_snapshot(wh, "db", "docs_lsh_rb")
    same = (
        refreshed.exceptAll(rebuilt).limit(1).count() == 0
        and rebuilt.exceptAll(refreshed).limit(1).count() == 0
    )
    return spark.createDataFrame(
        [
            (
                agg["n_pairs"],
                agg["n_exact"] or 0,
                agg["n_probes_matched"],
                same,
            )
        ],
        "n_pairs long, n_exact long, n_probes_matched long, "
        "refresh_equals_rebuild boolean",
    )


@register(
    "warehouse_dedup_gated_append",
    f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 300),
    batch AS (
      SELECT doc_id + 900000 AS pid, text FROM documents
      WHERE doc_id < 5
      UNION ALL
      SELECT doc_id + 910000,
             array_to_string(list_reverse(string_split(text, ' ')), ' ')
      FROM documents WHERE doc_id >= 5 AND doc_id < 10
      UNION ALL SELECT 920000,
        'zz unique synthetic alpha beta gamma delta epsilon zeta'
      UNION ALL SELECT 920001,
        'zz unique synthetic alpha beta gamma delta epsilon zeta'
      UNION ALL SELECT 930000,
        'totally fresh document text nothing like the corpus at all'),
    bsh AS (
      SELECT pid, {_DUCK_SHINGLES} AS sh
      FROM (SELECT pid, {_DUCK_TOKENS} AS w
            FROM (SELECT pid, text FROM batch) _b)),
    csh AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS sh
      FROM (SELECT doc_id, {_DUCK_TOKENS} AS w FROM corpus)),
    drop_in AS (
      SELECT DISTINCT b2.pid FROM bsh b1 JOIN bsh b2
        ON b1.pid < b2.pid
       AND len(list_intersect(b1.sh, b2.sh))
           >= 0.8 * len(list_distinct(list_concat(b1.sh, b2.sh)))),
    kept1 AS (SELECT * FROM bsh WHERE pid NOT IN (SELECT pid FROM drop_in)),
    drop_corpus AS (
      SELECT DISTINCT k.pid FROM kept1 k JOIN csh c
        ON len(list_intersect(k.sh, c.sh))
           >= 0.8 * len(list_distinct(list_concat(k.sh, c.sh))))
    SELECT CAST((SELECT count(*) FROM batch) AS BIGINT) AS n_batch,
           CAST((SELECT count(*) FROM drop_in) AS BIGINT)
             AS n_dropped_in_batch,
           CAST((SELECT count(*) FROM drop_corpus) AS BIGINT)
             AS n_dropped_vs_corpus,
           CAST((SELECT count(*) FROM batch)
                - (SELECT count(*) FROM drop_in)
                - (SELECT count(*) FROM drop_corpus) AS BIGINT)
             AS n_appended,
           CAST(300 + (SELECT count(*) FROM batch)
                - (SELECT count(*) FROM drop_in)
                - (SELECT count(*) FROM drop_corpus) AS BIGINT)
             AS corpus_rows_after,
           true AS refresh_equals_rebuild
    """,
    doc="Dedup-GATED ingest (operators/dedup_index.py::append_deduped, "
        "new r10 — the per-batch operation a training-data pipeline "
        "actually runs): a batch of 13 docs (5 exact copies of corpus "
        "docs, 5 reversed-text negatives, an identical within-batch "
        "pair, 1 fresh doc) is gated against a 300-doc indexed corpus "
        "in one call — drop-if-dups-any-smaller within the batch, "
        "then LSH-probe + exact-verify against the index, append only "
        "survivors to the SOURCE table, CDC-refresh the index. Oracle "
        "= the exact quadratic jaccard of both gate stages (the "
        "standard ~0.9998-capture + verify argument). The returned "
        "boolean pins that the post-append refreshed index equals a "
        "fresh rebuild row-for-row; corpus_rows_after pins that "
        "exactly the survivors landed.",
    bench=False,  # times temp-warehouse setup, not a scan
)
def warehouse_dedup_gated_append(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from .. import snapshots as snap
    from ..operators import dedup_index as di
    from ..tables import Warehouse

    wh = Warehouse(spark, tempfile.mkdtemp(prefix="wh_gate_"))
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") < 300)
    snap.append_versioned(wh, "db", "docs", corpus)
    di.build_dedup_index(wh, "db", "docs", "docs_lsh")

    batch = (
        docs.filter(F.col("doc_id") < 5)
        .select((F.col("doc_id") + 900000).alias("doc_id"), "text")
        .unionByName(
            docs.filter((F.col("doc_id") >= 5) & (F.col("doc_id") < 10))
            .select(
                (F.col("doc_id") + 910000).alias("doc_id"),
                F.array_join(
                    F.reverse(F.split(F.col("text"), " ")), " "
                ).alias("text"),
            )
        )
        .unionByName(
            spark.createDataFrame(
                [
                    (920000, "zz unique synthetic alpha beta gamma "
                             "delta epsilon zeta"),
                    (920001, "zz unique synthetic alpha beta gamma "
                             "delta epsilon zeta"),
                    (930000, "totally fresh document text nothing "
                             "like the corpus at all"),
                ],
                "doc_id long, text string",
            )
        )
    )
    stats = di.append_deduped(wh, "db", "docs_lsh", batch)
    after = snap.read_snapshot(wh, "db", "docs").count()
    di.build_dedup_index(wh, "db", "docs", "docs_lsh_rb")
    refreshed = snap.read_snapshot(wh, "db", "docs_lsh")
    rebuilt = snap.read_snapshot(wh, "db", "docs_lsh_rb")
    same = (
        refreshed.exceptAll(rebuilt).limit(1).count() == 0
        and rebuilt.exceptAll(refreshed).limit(1).count() == 0
    )
    return spark.createDataFrame(
        [
            (
                stats["n_batch"],
                stats["n_dropped_in_batch"],
                stats["n_dropped_vs_corpus"],
                stats["n_appended"],
                after,
                same,
            )
        ],
        "n_batch long, n_dropped_in_batch long, "
        "n_dropped_vs_corpus long, n_appended long, "
        "corpus_rows_after long, refresh_equals_rebuild boolean",
    )


@register(
    "warehouse_dedup_probe_above_cap",
    f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 300),
    probe AS (
      SELECT doc_id + 900000 AS pid, text FROM documents),
    psh AS (
      SELECT pid, {_DUCK_SHINGLES} AS sh
      FROM (SELECT pid, {_DUCK_TOKENS} AS w
            FROM (SELECT pid, text FROM probe) _p)),
    csh AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS sh
      FROM (SELECT doc_id, {_DUCK_TOKENS} AS w FROM corpus)),
    pairs AS (
      SELECT p.pid, c.doc_id,
             len(list_intersect(p.sh, c.sh)) AS i,
             len(list_distinct(list_concat(p.sh, c.sh))) AS u
      FROM psh p JOIN csh c
        ON len(list_intersect(p.sh, c.sh))
           >= 0.8 * len(list_distinct(list_concat(p.sh, c.sh))))
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT pid) AS BIGINT) AS n_matched_probes,
           CAST(count(DISTINCT doc_id) AS BIGINT)
             AS n_matched_corpus,
           CAST(sum(CASE WHEN i = u THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact_copies,
           true AS above_cap,
           true AS planned_le_hashes
    FROM pairs
    """,
    doc="ABOVE-CAP index probe (new r13 — the surface query of the "
        "r12 verdict's only weak item): the ENTIRE 500-doc documents "
        "table probes a 300-doc indexed corpus in one "
        "query_dedup_index call, carrying ~8000 distinct band hashes "
        "— double the historical _PRUNE_MAX_HASHES=4096 cap whose "
        "fallback used to read the WHOLE index per batch. Since r13 "
        "the probe prunes at any size (snapshots._EqValues normalizes "
        "the IN-list once; per-file checks are O(|dict|+log h)), "
        "pinned here two ways: above_cap returns the Spark-side "
        "count-check that the probe really exceeds 4096 hashes, and "
        "planned_le_hashes that the manifest pass planned <= "
        "distinct-hash-count files (the saturation contract; "
        "tests/test_plans.py pins the same bound at 64-file "
        "granularity where pruning visibly skips). Pair counts are "
        "oracle-checked against the exact quadratic jaccard "
        "(standard ~0.9998-capture + exact-verify argument; LSH is "
        "deterministic, so fixture capture is driver-proven, not "
        "probabilistic).",
    bench=False,  # times temp-warehouse setup, not a scan
)
def warehouse_dedup_probe_above_cap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from .. import snapshots as snap
    from ..operators import dedup_index as di
    from ..tables import Warehouse

    wh = Warehouse(spark, tempfile.mkdtemp(prefix="wh_probecap_"))
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") < 300)
    snap.append_versioned(wh, "db", "docs", corpus)
    di.build_dedup_index(wh, "db", "docs", "docs_lsh")

    probe = docs.select(
        (F.col("doc_id") + 900000).alias("doc_id"), "text"
    )
    meta = di._load_dedup_meta(wh, "db", "docs_lsh")
    hashes = [
        r["band_hash"]
        for r in di._band_rows(
            probe, "text", "doc_id", meta["n"],
            meta["num_hashes"], meta["bands"],
        )
        .select("band_hash")
        .distinct()
        .collect()
    ]
    v = snap.versions(wh, "db", "docs_lsh")[-1]
    m = snap._manifest(wh, "db", "docs_lsh", v)
    planned = snap._plan_files(
        wh, "db", "docs_lsh", m, None, ("band_hash", hashes)
    )
    pairs = di.query_dedup_index(
        wh, "db", "docs_lsh", probe, probe_text_col="text"
    )
    agg = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.countDistinct("probe_id").cast("long").alias(
            "n_matched_probes"
        ),
        F.countDistinct("corpus_id").cast("long").alias(
            "n_matched_corpus"
        ),
        F.sum(
            (F.col("jaccard_sim") == 1.0).cast("long")
        ).cast("long").alias("n_exact_copies"),
    ).collect()[0]
    return spark.createDataFrame(
        [
            (
                agg["n_pairs"],
                agg["n_matched_probes"],
                agg["n_matched_corpus"],
                agg["n_exact_copies"],
                len(hashes) > di._PRUNE_MAX_HASHES,
                len(planned) <= len(hashes),
            )
        ],
        "n_pairs long, n_matched_probes long, n_matched_corpus long, "
        "n_exact_copies long, above_cap boolean, "
        "planned_le_hashes boolean",
    )


_S1 = "qq synthetic pair alpha beta gamma delta"
_S2 = "rr fresh tail seed epsilon zeta eta theta"
_S3 = "ss fresh lone iota kappa lambda mu nu"
_S4 = "tt second fresh xi omicron pi rho sigma"
_S5 = "uu second lone tau upsilon phi chi psi"


@register(
    "warehouse_dedup_deferred_gate",
    f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 300),
    b1 AS (
      SELECT doc_id + 900000 AS pid, text FROM documents
      WHERE doc_id < 5
      UNION ALL SELECT 910000, '{_S1}'
      UNION ALL SELECT 910001, '{_S1}'
      UNION ALL SELECT 920000, '{_S2}'
      UNION ALL SELECT 920001, '{_S3}'),
    b1sh AS (
      SELECT pid, {_DUCK_SHINGLES} AS sh
      FROM (SELECT pid, {_DUCK_TOKENS} AS w
            FROM (SELECT pid, text FROM b1) _a)),
    csh AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS sh
      FROM (SELECT doc_id, {_DUCK_TOKENS} AS w FROM corpus)),
    b1_in AS (
      SELECT DISTINCT p2.pid FROM b1sh p1 JOIN b1sh p2
        ON p1.pid < p2.pid
       AND len(list_intersect(p1.sh, p2.sh))
           >= 0.8 * len(list_distinct(list_concat(p1.sh, p2.sh)))),
    b1_k1 AS (
      SELECT * FROM b1sh WHERE pid NOT IN (SELECT pid FROM b1_in)),
    b1_corp AS (
      SELECT DISTINCT k.pid FROM b1_k1 k JOIN csh c
        ON len(list_intersect(k.sh, c.sh))
           >= 0.8 * len(list_distinct(list_concat(k.sh, c.sh)))),
    b1_kept AS (
      SELECT * FROM b1_k1 WHERE pid NOT IN (SELECT pid FROM b1_corp)),
    b2 AS (
      SELECT 930000 AS pid, '{_S2}' AS text
      UNION ALL
      SELECT 930001, (SELECT text FROM documents WHERE doc_id = 7)
      UNION ALL SELECT 940000, '{_S4}'
      UNION ALL SELECT 940001, '{_S5}'),
    b2sh AS (
      SELECT pid, {_DUCK_SHINGLES} AS sh
      FROM (SELECT pid, {_DUCK_TOKENS} AS w
            FROM (SELECT pid, text FROM b2) _b)),
    c2 AS (
      SELECT doc_id AS cid, sh FROM csh
      UNION ALL SELECT pid, sh FROM b1_kept),
    b2_in AS (
      SELECT DISTINCT p2.pid FROM b2sh p1 JOIN b2sh p2
        ON p1.pid < p2.pid
       AND len(list_intersect(p1.sh, p2.sh))
           >= 0.8 * len(list_distinct(list_concat(p1.sh, p2.sh)))),
    b2_k1 AS (
      SELECT * FROM b2sh WHERE pid NOT IN (SELECT pid FROM b2_in)),
    b2_corp AS (
      SELECT DISTINCT k.pid FROM b2_k1 k JOIN c2 c
        ON len(list_intersect(k.sh, c.sh))
           >= 0.8 * len(list_distinct(list_concat(k.sh, c.sh))))
    SELECT
      CAST((SELECT count(*) FROM b1) AS BIGINT) AS n_b1,
      CAST((SELECT count(*) FROM b1_in) AS BIGINT) AS b1_drop_in,
      CAST((SELECT count(*) FROM b1_corp) AS BIGINT) AS b1_drop_corpus,
      CAST((SELECT count(*) FROM b1_kept) AS BIGINT) AS b1_appended,
      CAST((SELECT count(*) FROM b2) AS BIGINT) AS n_b2,
      CAST((SELECT count(*) FROM b2_in) AS BIGINT) AS b2_drop_in,
      CAST((SELECT count(*) FROM b2_corp) AS BIGINT) AS b2_drop_corpus,
      CAST((SELECT count(*) FROM b2) - (SELECT count(*) FROM b2_in)
           - (SELECT count(*) FROM b2_corp) AS BIGINT) AS b2_appended,
      CAST((SELECT count(*) FROM b1_kept) AS BIGINT) AS n_tail_b2,
      CAST(300 + (SELECT count(*) FROM b1_kept)
           + (SELECT count(*) FROM b2) - (SELECT count(*) FROM b2_in)
           - (SELECT count(*) FROM b2_corp) AS BIGINT)
        AS corpus_rows_after,
      true AS index_frozen_during_gates,
      true AS refresh_equals_rebuild
    """,
    doc="DEFERRED-refresh dedup gate (new r14 — the sub-15 s cadence "
        "surface): two batches gate with refresh='defer', so each "
        "batch pays probe + ONE source-append commit and the index "
        "commits nothing; exactness holds because the gate also "
        "probes the un-indexed source TAIL (batch 2's copy of a "
        "batch-1 survivor is caught by the tail probe, its corpus "
        "copy by the index probe — both pinned in the oracle's "
        "two-stage exact-jaccard replay where batch 2's corpus is "
        "corpus ∪ batch-1 survivors). index_frozen_during_gates "
        "pins Spark-side that the two gate calls created ZERO index "
        "versions; after one explicit refresh the index equals a "
        "fresh rebuild row-for-row (refresh_equals_rebuild). "
        "Capture is deterministic: every planted dup is an exact "
        "copy (jaccard 1.0, identical band hashes).",
    bench=False,  # times temp-warehouse setup, not a scan
)
def warehouse_dedup_deferred_gate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from .. import snapshots as snap
    from ..operators import dedup_index as di
    from ..tables import Warehouse

    wh = Warehouse(spark, tempfile.mkdtemp(prefix="wh_defer_"))
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") < 300)
    snap.append_versioned(wh, "db", "docs", corpus)
    di.build_dedup_index(wh, "db", "docs", "docs_lsh")
    idx_vs0 = len(snap.versions(wh, "db", "docs_lsh"))

    b1 = docs.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 900000).alias("doc_id"), "text"
    ).unionByName(
        spark.createDataFrame(
            [(910000, _S1), (910001, _S1), (920000, _S2),
             (920001, _S3)],
            "doc_id long, text string",
        )
    )
    s1 = di.append_deduped(wh, "db", "docs_lsh", b1, refresh="defer")

    doc7 = docs.filter(F.col("doc_id") == 7).collect()[0]["text"]
    b2 = spark.createDataFrame(
        [(930000, _S2), (930001, doc7), (940000, _S4),
         (940001, _S5)],
        "doc_id long, text string",
    )
    s2 = di.append_deduped(wh, "db", "docs_lsh", b2, refresh="defer")
    frozen = len(snap.versions(wh, "db", "docs_lsh")) == idx_vs0

    di.refresh_dedup_index(wh, "db", "docs_lsh")
    di.build_dedup_index(wh, "db", "docs", "docs_lsh_rb")
    refreshed = snap.read_snapshot(wh, "db", "docs_lsh")
    rebuilt = snap.read_snapshot(wh, "db", "docs_lsh_rb")
    same = (
        refreshed.exceptAll(rebuilt).limit(1).count() == 0
        and rebuilt.exceptAll(refreshed).limit(1).count() == 0
    )
    after = snap.read_snapshot(wh, "db", "docs").count()
    return spark.createDataFrame(
        [
            (
                s1["n_batch"], s1["n_dropped_in_batch"],
                s1["n_dropped_vs_corpus"], s1["n_appended"],
                s2["n_batch"], s2["n_dropped_in_batch"],
                s2["n_dropped_vs_corpus"], s2["n_appended"],
                s2["n_tail"], after, frozen, same,
            )
        ],
        "n_b1 long, b1_drop_in long, b1_drop_corpus long, "
        "b1_appended long, n_b2 long, b2_drop_in long, "
        "b2_drop_corpus long, b2_appended long, n_tail_b2 long, "
        "corpus_rows_after long, index_frozen_during_gates boolean, "
        "refresh_equals_rebuild boolean",
    )
