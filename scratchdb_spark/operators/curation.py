"""Corpus-curation operators for training-data pipelines: benchmark
decontamination, repetition filtering, composite quality gating, and
domain mixture budgeting.

Like :mod:`text`, everything is JVM column expressions (split /
array lambdas / regexp) inside whole-stage codegen — no Python UDFs —
and every operator has an ANSI-SQL-expressible definition so the
DuckDB oracle verifies values exactly. These extend the reference's
surface (its query pass-through has no curation ops); the designs
follow the publicly documented pipeline stages of large-corpus
curation (n-gram eval-set decontamination, Gopher-style repetition
and quality rules, mixture token budgets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text, token_shingles
from .text import STOPWORDS, _hits, _tokens


def decontaminate(
    train_df: DataFrame,
    eval_df: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any word
    ``n``-gram with the eval set.

    Plan shape: the eval side collapses to a DISTINCT shingle set
    (tiny — eval suites are KBs to MBs) and broadcasts into an
    equi-join against the exploded training shingles; one shuffle for
    the per-doc regroup. Linear in corpus size at any scale — the
    eval set, not the corpus, bounds the join's small side.

    Shingles are hashed to longs (``hashed_shingles``): grams join and
    count identically under hashing (collisions ~2^-64) while the
    corpus-side explode shuffles 8 bytes per gram instead of gram text
    and skips string materialization (measured ~2.5x on this stage;
    6.5 s -> see PERF.md). ``widen`` spreads the CPU-bound shingling
    of a narrow scan across the cluster.

    Output: (doc_id, n_eval_ngram_hits) for contaminated docs only.
    """
    from .dedup import hashed_shingles, widen

    ev = (
        eval_df.select(
            F.explode(hashed_shingles(F.col(text_col), n)).alias("s")
        )
        .distinct()
    )
    tr = widen(train_df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("doc_id"),
        F.explode(hashed_shingles(F.col(text_col), n)).alias("s"),
    )
    return (
        tr.join(F.broadcast(ev), "s")
        .groupBy("doc_id")
        .agg(F.countDistinct("s").alias("n_eval_ngram_hits"))
    )


def _bloom_positions(h, mul, add, num_bits: int):
    """(n,) uint64 hashes -> (n, k) bit positions: k salted splitmix
    multiply-add permutations + xor-shift finalizer, masked to the
    power-of-two table size."""
    import numpy as np

    x = h[:, None] * mul[None, :] + add[None, :]
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    return x & np.uint64(num_bits - 1)


def build_bloom_bitmap(df, extract_hashes, num_bits: int, mul, add):
    """Per-partition bloom bitmaps merged by a TWO-LEVEL OR-fold — the
    shared build half of every bloom operator here (decontamination,
    runtime_filter join pruning). ``extract_hashes(pdf)`` returns the
    partition batch's int64 hash values (or None). Bitwise OR is
    associative and commutative, so the merged filter is bit-identical
    under any partitioning; no shuffle touches the build-side DATA.

    Merge topology: P per-partition bitmaps reduce executor-side in
    ~sqrt(P) groups (one small shuffle of P bitmap rows), and only the
    group results collect — the driver receives <= sqrt(P) bitmaps
    instead of P. At 512 KB per bitmap a 10k-partition build would
    otherwise push ~5 GB through the driver; the tree fold caps it at
    ~50 MB, and a deeper tree is never needed because sqrt(P) stays
    tiny for any realistic P. Returns the (num_bits/64,) uint64 word
    array."""
    import math

    import numpy as np
    import pandas as pd

    if num_bits & (num_bits - 1):
        raise ValueError("num_bits must be a power of two")
    words = num_bits // 64

    def build(batches):
        bits = np.zeros(words, dtype=np.uint64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            h = extract_hashes(pdf)
            if h is None or len(h) == 0:
                continue
            pos = _bloom_positions(
                h.astype(np.uint64), mul, add, num_bits
            ).ravel()
            np.bitwise_or.at(
                bits, pos >> np.uint64(6),
                np.uint64(1) << (pos & np.uint64(63)),
            )
        yield pd.DataFrame({"bm": [bits.tobytes()]})

    def merge(batches):
        acc = np.zeros(words, dtype=np.uint64)
        for pdf in batches:
            for b in pdf["bm"]:
                acc |= np.frombuffer(b, dtype=np.uint64)
        yield pd.DataFrame({"bm": [acc.tobytes()]})

    partials = df.mapInPandas(build, "bm binary")
    n_parts = df.rdd.getNumPartitions()
    groups = max(1, math.isqrt(n_parts))
    if groups > 1:
        partials = partials.repartition(groups).mapInPandas(
            merge, "bm binary"
        )
    final = np.zeros(words, dtype=np.uint64)
    for r in partials.collect():
        final |= np.frombuffer(r["bm"], dtype=np.uint64)
    return final


def bloom_decontaminate(
    train_df: DataFrame,
    eval_df: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_bits: int = 1 << 22,
    num_hashes: int = 4,
) -> DataFrame:
    """Bloom-filter benchmark decontamination — the constant-memory,
    join-free twin of :func:`decontaminate`.

    Build: one narrow pass over the eval side computes a PER-PARTITION
    bloom bitmap of its hashed ``n``-gram shingles inside a vectorized
    mapInPandas kernel (np.bitwise_or.at scatter); the per-partition
    bitmaps (``num_bits/8`` bytes each) collect to the driver and OR
    together — bitwise OR is associative and commutative, so the final
    filter is bit-identical under ANY partitioning. No shuffle at all
    on the build.

    Probe: the final bitmap broadcasts (512 KB at the default 2^22
    bits — CONSTANT regardless of eval-set cardinality, unlike the
    exact broadcast join whose small side grows with the eval suite)
    into a second kernel that tests each training doc's shingles with
    k vectorized lookups and counts hits per doc. No shuffle on the
    corpus side either — output rows emerge directly from the scan.

    At 100 TB this is the cheapest decontamination shape there is: two
    narrow scans and a half-megabyte broadcast. The price is a
    deterministic false-positive rate ((k*n_eval/m)^k, ~1e-9 per probe
    at defaults); flagged docs are a tiny superset of the exact join's
    — rerun just the flagged docs through :func:`decontaminate` when
    exactness matters.

    Output: (doc_id, n_bloom_hits) for flagged docs only; shingle
    arrays are pre-distinct so hit counts share the exact twin's
    count-distinct semantics.
    """
    import numpy as np
    import pandas as pd

    from .dedup import _splitmix_salts, hashed_shingles, widen

    if num_bits & (num_bits - 1):
        raise ValueError("num_bits must be a power of two")
    words = num_bits // 64
    mul, add = _splitmix_salts(num_hashes, seed=0xB100F)

    ev = eval_df.select(hashed_shingles(F.col(text_col), n).alias("sh"))

    def shingle_hashes(pdf):
        arrs = [np.asarray(x, dtype=np.int64) for x in pdf["sh"]]
        arrs = [a for a in arrs if len(a)]
        return np.concatenate(arrs) if arrs else None

    final = build_bloom_bitmap(ev, shingle_hashes, num_bits, mul, add)

    bc = train_df.sparkSession.sparkContext.broadcast(final.tobytes())

    def probe(batches):
        bits = np.frombuffer(bc.value, dtype=np.uint64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            arrs = [np.asarray(x, dtype=np.int64) for x in pdf["sh"]]
            lens = np.array([len(a) for a in arrs], dtype=np.int64)
            if lens.sum() == 0:
                continue
            h = np.concatenate([a for a in arrs if len(a)]).astype(np.uint64)
            pos = _bloom_positions(h, mul, add, num_bits)
            hit = np.ones(len(h), dtype=bool)
            for j in range(num_hashes):
                pj = pos[:, j]
                hit &= (
                    (bits[(pj >> np.uint64(6)).astype(np.int64)]
                     >> (pj & np.uint64(63))) & np.uint64(1)
                ).astype(bool)
            row_idx = np.repeat(
                np.arange(len(arrs))[lens > 0], lens[lens > 0]
            )
            n_hits = np.bincount(
                row_idx, weights=hit, minlength=len(arrs)
            ).astype(np.int64)
            keep = n_hits > 0
            if keep.any():
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"].values[keep],
                        "n_bloom_hits": n_hits[keep],
                    }
                )

    tr = widen(train_df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("doc_id"),
        hashed_shingles(F.col(text_col), n).alias("sh"),
    )
    return tr.mapInPandas(probe, "doc_id long, n_bloom_hits long")


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals per document: duplicate-word
    fraction and most-frequent-word share.

    One explode + one two-level aggregation (term counts roll up to
    doc stats); both shuffles key on high-cardinality (doc, term) /
    doc, so the plan holds at corpus scale.
    """
    counts = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(_tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    total = F.sum("tf")
    distinct = F.count(F.lit(1))
    return counts.groupBy("doc_id").agg(
        total.alias("n_words"),
        distinct.alias("n_distinct_words"),
        F.round(1 - distinct / total.cast("double"), 4).alias(
            "dup_word_ratio"
        ),
        F.round(F.max("tf") / total.cast("double"), 4).alias(
            "top_word_ratio"
        ),
    )


#: fixed rule order — reject_reasons concatenates in this order
_GATE_RULES = ("word_count", "mean_word_len", "alpha_ratio", "stopword_ratio")


def quality_gate(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Composite keep/reject gate from deterministic text statistics
    (word-count bounds, mean word length, alphabetic ratio, stopword
    presence — the Gopher-rule shapes). Pure row-local column
    expressions: scales as a projection.

    Output: (doc_id, n_tokens, keep, reject_reasons) where
    reject_reasons is a comma-joined list in fixed rule order (empty
    when keep).
    """
    norm = normalize_text(F.col(text_col))
    tokens = _tokens(F.col(text_col))
    n_tokens = F.size(tokens)
    # chars excluding the single spaces between tokens
    mean_len = (F.length(norm) - (n_tokens - 1)) / n_tokens.cast("double")
    alpha_ratio = (
        F.length(F.regexp_replace(norm, "[^a-z]", ""))
        / F.length(norm).cast("double")
    )
    all_stops = sorted({w for ws in STOPWORDS.values() for w in ws})
    stop_ratio = _hits(tokens, all_stops) / n_tokens.cast("double")

    fails = {
        "word_count": ~n_tokens.between(5, 5000),
        "mean_word_len": ~mean_len.between(2.0, 12.0),
        "alpha_ratio": alpha_ratio < 0.6,
        "stopword_ratio": stop_ratio < 0.01,
    }
    reasons = F.concat_ws(
        ",",
        *[
            F.when(fails[r], F.lit(r)).otherwise(F.lit(None))
            for r in _GATE_RULES
        ],
    )
    keep = reasons == ""
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_tokens.alias("n_tokens"),
        keep.alias("keep"),
        reasons.alias("reject_reasons"),
    )


def domain_token_budget(
    df: DataFrame, text_col: str = "text", domain_col: str = "source"
) -> DataFrame:
    """Mixture budgeting: per-domain document and (whitespace) token
    totals with global and cumulative shares, ordered by token mass —
    the report that drives sampling weights for a training mixture.

    One narrow agg (per domain) for the totals; the cumulative share
    then rides the prefix-bucket running sum (operators/
    prefix_sum.py, r11 — was a partitionless window over the domain
    frame, which is DATA-SIZED on a web corpus: millions of
    registrable domains, the exact single-task class the r9-r11
    fixes eliminated). Order is (tokens desc, domain) via a negated
    order column + tiebreak; the grand total falls out of the same
    driver fold (the sum() OVER () window is gone too). Corpus scan
    stays linear.
    """
    from .prefix_sum import bucketed_running_sum

    per = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(_tokens(F.col(text_col)))).alias("ws_tokens"),
    ).withColumn("__ord", -F.col("ws_tokens").cast("long"))
    ranked, total = bucketed_running_sum(
        per, "__ord", "ws_tokens", "__cum",
        tiebreak_cols=("domain",),
    )
    den = F.lit(total).cast("double")
    return ranked.select(
        "domain",
        "n_docs",
        "ws_tokens",
        F.round(F.col("ws_tokens") / den, 6).alias("token_share"),
        F.round(F.col("__cum") / den, 6).alias("cum_token_share"),
    )


def mixture_sample(
    df: DataFrame,
    shares: dict[str, float],
    text_col: str = "text",
    domain_col: str = "source",
    id_col: str = "doc_id",
    grid: int = 1_000_000,
) -> DataFrame:
    """Materialize a target training MIXTURE by deterministic
    hash-sampling (the sampler half of domain_token_budget's report):
    given target token shares per domain, compute the LARGEST total
    token budget every listed domain can serve (B = min over domains
    of tokens_d / share_d — the binding-domain rule every mixture
    recipe reduces to), then keep each domain's documents whose
    md5-bucket falls under floor(target_d / tokens_d * grid).

    Exactness contract: shares are snapped to 1e-6 units and ALL
    derived quantities (budget, per-domain targets, keep thresholds)
    are pure BIGINT arithmetic over the exact whitespace-token totals
    — no float division anywhere, so Spark and the SQL oracle agree
    bit-for-bit, and the kept set is reproducible across engines,
    runs, and cluster layouts (the same content-addressed property
    as operators/split.py). Headroom: token totals up to ~9e12 fit
    the BIGINT intermediate (T * 1e6).

    Plan shape at 100 TB: one narrow agg for per-domain totals (few
    rows collected — domain cardinality), then a pure-map filter
    (md5 + literal-threshold CASE, whole-stage codegen). Output: the
    kept documents as (domain, doc_id, n_tok, target_tokens).
    Sampling is per-document, so achieved tokens track targets to
    within one document's tokens per domain.
    """
    from .split import hash_bucket

    share_e6 = {d: int(round(s * 1e6)) for d, s in shares.items()}
    if any(v <= 0 for v in share_e6.values()):
        raise ValueError(f"non-positive share in {shares}")
    if sum(share_e6.values()) > 1_000_000:
        raise ValueError(f"shares sum to > 1: {shares}")
    toks = df.filter(
        F.col(domain_col).isin(*share_e6.keys())
    ).select(
        F.col(domain_col).alias("domain"),
        F.col(id_col).alias("doc_id"),
        F.size(_tokens(F.col(text_col))).cast("long").alias("n_tok"),
        hash_bucket(F.col(id_col), grid).alias("__b"),
    )
    totals = {
        r["domain"]: r["t"]
        for r in toks.groupBy("domain")
        .agg(F.sum("n_tok").alias("t"))
        .collect()
    }
    missing = sorted(set(share_e6) - set(totals))
    if missing:
        raise ValueError(
            f"mixture domains absent from the corpus: {missing}"
        )
    budget = min(
        totals[d] * 1_000_000 // share_e6[d] for d in share_e6
    )
    target = {d: share_e6[d] * budget // 1_000_000 for d in share_e6}
    thresh = {d: target[d] * grid // totals[d] for d in share_e6}
    thr_expr = None
    for d in sorted(share_e6):
        cond = (F.col("domain") == d) & (F.col("__b") < thresh[d])
        thr_expr = cond if thr_expr is None else thr_expr | cond
    tgt_map = F.create_map(
        *[F.lit(x) for d in sorted(share_e6) for x in (d, target[d])]
    )
    return (
        toks.filter(thr_expr)
        .withColumn(
            "target_tokens", F.element_at(tgt_map, F.col("domain"))
        )
        .drop("__b")
    )


def pack_sequences(
    df: DataFrame,
    max_tokens: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 16,
) -> DataFrame:
    """Contiguous greedy sequence packing for training-batch prep:
    documents are sharded deterministically (md5 bucket of id — same
    content-addressed assignment as operators/split.py), ordered by id
    within their shard, and filled into bins by cumulative token
    count: ``bin = floor(tokens_before / max_tokens)``, so every bin
    except a shard's last holds ~max_tokens whitespace tokens.

    Packing is per-shard by design — a single global order would be a
    one-task window at 100 TB, while sharded packing is embarrassingly
    parallel (the window partitions by shard) and is how real
    pipelines pack (each worker packs its own shard). Deterministic
    for any partitioning: the order within a shard is the id order.

    Output: (shard, bin_id, n_docs, n_tokens, doc_ids csv) — one row
    per packed sequence.
    """
    from .split import hash_bucket
    from pyspark.sql.window import Window as W

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        hash_bucket(F.col(id_col), n_shards).alias("shard"),
        F.size(_tokens(F.col(text_col))).alias("n_tok"),
    )
    w = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    binned = toks.withColumn(
        "bin_id",
        F.floor(
            F.coalesce(F.sum("n_tok").over(w), F.lit(0))
            / F.lit(max_tokens)
        ),
    )
    return binned.groupBy("shard", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("doc_id")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("doc_ids"),
    )
