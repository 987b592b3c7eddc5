"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, fingerprinting.

Everything is JVM column expressions (split / filter lambdas / regexp)
— no Python UDFs — so the operators run inside whole-stage codegen and
scale linearly with a parquet scan. Each has an ANSI-SQL-expressible
definition so the DuckDB oracle can verify values exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import normalize_text

#: tiny public stopword lists (enough for a deterministic heuristic)
STOPWORDS = {
    "de": ["der", "die", "das", "und", "ist", "von", "ein", "zu"],
    "en": ["the", "a", "and", "of", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "les", "des", "et", "une", "est", "dans", "pour"],
}


def _tokens(col):
    return F.split(normalize_text(col), " ")


def _hits(tokens, words: list[str]):
    return F.size(F.filter(tokens, lambda x: x.isin(*words)))


def lang_id(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Stopword-ratio language ID. Ties break alphabetically; zero hits
    -> 'und'. (The deterministic CASE ladder mirrors the SQL oracle.)"""
    toks = _tokens(F.col(text_col))
    hits = {lang: _hits(toks, ws) for lang, ws in STOPWORDS.items()}
    mx = F.greatest(*hits.values())
    pred = F.when(mx == 0, "und")
    for lang in sorted(STOPWORDS):  # alphabetical tie-break
        pred = pred.when(hits[lang] == mx, lang)
    return df.select(
        F.col(id_col),
        *[hits[lang].alias(f"{lang}_hits") for lang in sorted(STOPWORDS)],
        pred.alias("predicted_lang"),
    )


def quality_score(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features + composite score in [0, 1]:
    length signal * (1 - punctuation ratio) * alpha ratio, damped by
    stopword presence."""
    text = F.col(text_col)
    toks = _tokens(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    punct = F.length(F.regexp_replace(text, r"[a-zA-Z0-9\s]", ""))
    alpha = F.length(F.regexp_replace(text, r"[^a-zA-Z]", ""))
    stop_hits = _hits(toks, STOPWORDS["en"])
    punct_ratio = punct.cast("double") / n_chars
    alpha_ratio = alpha.cast("double") / n_chars
    stop_ratio = stop_hits.cast("double") / n_tokens
    length_signal = F.least(F.lit(1.0), n_tokens.cast("double") / 50)
    score = length_signal * (1 - punct_ratio) * alpha_ratio * (
        F.lit(0.5) + F.least(F.lit(0.5), stop_ratio * 2)
    )
    # Epsilon-stabilized rounding: the composite is a multi-op float
    # product, and its true value can land EXACTLY on a 4dp half-way
    # point (observed at sf0.1: 0.2 * 0.8125 * 0.7 = 0.11375), where
    # engines' last-ulp association differences round to different
    # sides. +1e-9 (>> ulp, << any non-boundary gap) makes every
    # exact boundary round up identically everywhere; the oracle
    # applies the same epsilon. Single-division ratio columns don't
    # need it — one IEEE op is bit-identical across engines.
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(score + F.lit(1e-9), 4).alias("quality"),
    )


def token_stats(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Token counts: whitespace tokens, BPE-ish regex tokens
    ([a-z]+ | digits | single punct), and the chars/4 estimate."""
    text = F.col(text_col)
    ws_tokens = F.size(F.split(F.trim(text), r"\s+"))
    bpe_ish = F.size(
        F.regexp_extract_all(
            F.lower(text), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), F.lit(0)
        )
    )
    est = F.ceil(F.length(text) / 4).cast("bigint")
    return df.select(
        F.col(id_col),
        ws_tokens.alias("ws_tokens"),
        bpe_ish.alias("bpe_tokens"),
        est.alias("est_tokens"),
    )


def fingerprint(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Two document fingerprints:

    - md5_fp: md5 of the normalized text (engine-portable)
    - poly_fp: order-sensitive positional hash
      sum over tokens of position * (131*len(token) + ascii(first char))
      — cheap, SQL-expressible, detects token reordering that md5 of a
      sorted token set would miss.
    """
    text = normalize_text(F.col(text_col))
    toks = F.split(text, " ")
    codes = F.zip_with(
        toks,
        F.sequence(F.lit(1), F.size(toks)),
        lambda t, i: i.cast("long")
        * (F.length(t).cast("long") * 131 + F.ascii(t)),
    )
    poly = F.aggregate(codes, F.lit(0).cast("long"), lambda a, x: a + x)
    return df.select(
        F.col(id_col),
        F.md5(text).alias("md5_fp"),
        poly.alias("poly_fp"),
    )


def term_frequencies(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(doc_id, term, tf) — one row per distinct term per document."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(_tokens(F.col(text_col))).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf_top_terms(df: DataFrame, k: int = 3, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Top-k characteristic terms per document by smoothed tf-idf
    (idf = ln((N+1)/(df+1)) + 1, scikit-style smoothing).

    Plan shape: one shuffle for (doc, term) tf, one for per-term df,
    a broadcast of the tiny scalar N, a shuffle join tf<->df on term,
    and the rank window on doc — every stage linear in tokens and
    partitioned on a key. The score is rounded to 6 decimals before
    ranking so the (score DESC, term ASC) order is engine-independent.
    """
    tf = term_frequencies(df, text_col, id_col)
    dfreq = tf.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    n_docs = df.select(
        F.countDistinct(F.col(id_col)).alias("n_docs")
    )
    scored = (
        tf.join(dfreq, "term")
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            F.col("df").alias("doc_freq"),
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("n_docs") + 1) / (F.col("df") + 1))
                    + F.lit(1.0)
                ),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


#: dialect-portable patterns (valid in both Java regex and RE2, so the
#: DuckDB oracle can apply the IDENTICAL expressions)
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
URL_RE = "https?://[^\\s]+"
DIGIT_RUN_RE = "[0-9][0-9 ()+.-]{6,}[0-9]"


def clean_and_redact(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Training-corpus text prep: normalize whitespace and redact
    PII-ish spans (emails, URLs, long digit runs) with typed
    placeholders; emit per-doc redaction counts for pipeline audit.

    Pure narrow column expressions (regexp_replace / regexp_count)
    inside codegen — linear, no shuffle, safe at any scale. Patterns
    are restricted to syntax shared by Java regex and RE2 so the same
    strings drive the DuckDB oracle.
    """
    t = F.col(text_col)
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(t, EMAIL_RE, "<EMAIL>"),
                    URL_RE,
                    "<URL>",
                ),
                DIGIT_RUN_RE,
                "<NUMBER>",
            ),
            "\\s+",
            " ",
        )
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        cleaned.alias("clean_text"),
        F.regexp_count(t, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(t, F.lit(URL_RE)).alias("n_urls"),
        F.regexp_count(t, F.lit(DIGIT_RUN_RE)).alias("n_number_runs"),
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 retrieval: top-k documents for a bag of query terms
    (public ranking function; Robertson & Zaragoza 2009).

    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    Plan shape: (doc, term, tf) agg (one shuffle) -> filter to the
    query's terms BEFORE any join (the selective predicate collapses
    the frame to |query| * df rows) -> per-term df agg over the full
    tf frame -> broadcast the tiny (N, avgdl) scalars and the
    |query|-row df table -> per-doc score sum -> global top-k
    (TakeOrdered, no full sort). Every stage is linear in tokens; at
    100 TB the only term-keyed shuffle carries (term, df) partials.
    """
    tf = term_frequencies(df, text_col, id_col)
    dl = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.size(_tokens(F.col(text_col))).alias("dl"),
        )
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    terms = [t.lower() for t in query_terms]
    qtf = tf.filter(F.col("term").isin(terms))
    qdf = qtf.groupBy("term").agg(
        F.count_distinct("doc_id").alias("df")
    )
    scored = (
        qtf.join(F.broadcast(qdf), "term")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                1
                + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * F.col("tf")
            * (k1 + 1)
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        # per-term score -> integer micro-units BEFORE the sum: summing
        # 6dp-rounded doubles puts every total exactly on a rounding
        # boundary, where engine addition order flips the last digit;
        # integer sums are order-independent
        .withColumn("w_e6", F.round(F.col("w") * 1e6).cast("long"))
        .groupBy("doc_id")
        .agg(
            F.sum("w_e6").alias("bm25_e6"),
            F.count(F.lit(1)).alias("n_matched_terms"),
        )
    )
    return (
        scored.orderBy(F.desc("bm25_e6"), F.asc("doc_id")).limit(k)
    )


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document mean token log-probability under the corpus's own
    add-one-smoothed unigram model — the cheap perplexity proxy
    pipelines use to flag out-of-distribution / gibberish documents
    before a real LM scores them (CCNet-style; Wenzek et al. 2020).

    p(w) = (c(w) + 1) / (C + V); score(d) = mean_i ln p(w_i) over the
    doc's token POSITIONS (repeats count each time).

    Plan shape: positional token explode -> global (token, count) agg
    (one shuffle, partial combine) -> broadcast tiny (C, V) scalars ->
    token-keyed join back -> per-doc avg (one shuffle). Linear in
    tokens; the token join key is Zipf-skewed, which AQE skew-split
    handles (the per-token payload is one long, so even 'the' is
    bytes-cheap).
    """
    pos = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_tokens(F.col(text_col))).alias("tok"),
    ).filter(F.col("tok") != "")
    counts = pos.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.agg(
        F.sum("c").alias("corpus_tokens"),
        F.count(F.lit(1)).alias("vocab"),
    )
    return (
        pos.join(counts, "tok")
        .join(F.broadcast(totals))
        .withColumn(
            "lp",
            F.log(
                (F.col("c") + 1)
                / (F.col("corpus_tokens") + F.col("vocab"))
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("lp"), 6).alias("avg_logprob"),
        )
    )


def bigram_pmi(
    df: DataFrame,
    min_count: int = 5,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k collocations by pointwise mutual information over
    positional bigrams (Church & Hanks 1990 — public measure).

    pmi(x,y) = ln( c_xy * N_tok^2 / (N_big * c_x * c_y) ) with all
    operands exact integers, so the double result is engine-identical
    (the repo-wide determinism discipline: keep floats out until one
    final pure function of exact ints).

    Plan shape: token explode -> unigram agg (1 shuffle); bigram
    explode -> bigram agg (1 shuffle); two broadcast-joined unigram
    lookups (the unigram table is only broadcast-sized for bounded
    vocabularies — swap to shuffle joins at 100 TB, same plan class);
    TakeOrdered top-k. Linear in token positions.
    """
    toks = _tokens(F.col(text_col))
    uni = (
        df.select(F.explode(toks).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_tok = uni.agg(F.sum("c").alias("n_tok"))
    # bigram pairs via posexplode + lead() — an HOF slice/concat chain
    # evaluates interpreted outside codegen and measured ~3x slower
    # (PERF.md span-coverage lesson); the window's shuffle key (doc id)
    # also feeds nothing else, so the plan stays two aggs + one window
    from .dedup import widen

    pos = widen(
        df.select(F.col(id_col).alias("id"), F.col(text_col))
    ).select("id", F.posexplode(toks).alias("p", "tok"))
    wdoc = Window.partitionBy("id").orderBy("p")
    pairs = pos.select(
        F.col("tok").alias("x"),
        F.lead("tok", 1).over(wdoc).alias("y"),
    ).filter(F.col("y").isNotNull())
    bigrams = (
        pairs.groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .filter(F.col("c_xy") >= min_count)
        .withColumn("bg", F.concat_ws(" ", "x", "y"))
    )
    n_big = (
        df.select(
            F.greatest(F.size(toks) - 1, F.lit(0)).alias("nb")
        ).agg(F.sum("nb").alias("n_big"))
    )
    scored = (
        bigrams
        .join(F.broadcast(uni.withColumnRenamed("tok", "x")
                          .withColumnRenamed("c", "c_x")), "x")
        .join(F.broadcast(uni.withColumnRenamed("tok", "y")
                          .withColumnRenamed("c", "c_y")), "y")
        .join(F.broadcast(n_tok))
        .join(F.broadcast(n_big))
        .select(
            F.col("bg").alias("bigram"),
            "c_xy", "c_x", "c_y",
            # cast the FIRST factor of each product to double so both
            # engines run the identical double multiply chain (pure
            # long chains would overflow at corpus scale; the double
            # rounding is IEEE-identical given exact int operands)
            F.round(
                F.log(
                    F.col("c_xy").cast("double")
                    * F.col("n_tok")
                    * F.col("n_tok")
                    / (
                        F.col("n_big").cast("double")
                        * F.col("c_x")
                        * F.col("c_y")
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), F.asc("bigram")).limit(k)


def token_entropy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document Shannon entropy of the token distribution (nats) —
    low entropy flags repetitive/boilerplate docs (the signal behind
    Gopher's repetition rules, as a single scalar).

    H = ln(n) - (sum_i c_i ln c_i) / n. The inner sum is carried as
    integer micro-units (c ln c snapped per TERM, then integer-summed)
    so the per-doc aggregation order can't flip a rounding boundary;
    the final expression is a pure function of (n, sum_e6) exact ints.

    Plan: (doc, term) tf agg (1 shuffle) -> per-doc agg (1 shuffle,
    same key prefix). Linear.
    """
    tf = term_frequencies(df, text_col, id_col)
    per_term = tf.select(
        "doc_id",
        "tf",
        F.round(F.col("tf") * F.log("tf") * 1e6)
        .cast("long")
        .alias("clnc_e6"),
    )
    return (
        per_term.groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum("clnc_e6").alias("sum_clnc_e6"),
        )
        .withColumn(
            "entropy",
            F.round(
                F.log("n_tokens")
                - F.col("sum_clnc_e6") / 1e6 / F.col("n_tokens"),
                6,
            ),
        )
    )


def positional_postings(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Positional inverted-index postings: one row per token
    OCCURRENCE — (tok string, doc_id, pos int, 0-based). The posting
    table is the classic full-text secondary index (Lucene/CH
    inverted index, public design): at 100 TB it persists as a
    snapshot table range-clustered on `tok`, so a term lookup
    manifest-prunes to the files holding that token range (the
    complementary structure to the token-bloom per-file skipping in
    snapshots.bloom_cols, which prunes the BASE table). Built with
    one posexplode over the shared normalize_text tokenization —
    all JVM expressions."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(_tokens(F.col(text_col))).alias("pos", "tok"),
    ).select("tok", "doc_id", "pos")


def phrase_search(
    postings: DataFrame, phrase: list[str]
) -> DataFrame:
    """Exact phrase search over positional postings: (doc_id,
    n_hits) for documents containing the token sequence contiguously,
    with the number of occurrences.

    Plan shape: one equi-join per phrase token on (doc_id, pos -
    offset) — each join's build side is ONLY that token's posting
    list (rare-token postings make the probe tiny; Catalyst orders
    the ANDed join keys into a single hash join per step). Nothing
    ever scans text again, and no position window is materialized —
    the adjacency predicate is the join key itself."""
    if not phrase:
        raise ValueError("phrase must have >= 1 token")
    anchor = postings.filter(F.col("tok") == phrase[0]).select(
        "doc_id", F.col("pos").alias("p0")
    )
    cur = anchor
    for i, t in enumerate(phrase[1:], start=1):
        nxt = postings.filter(F.col("tok") == t).select(
            F.col("doc_id").alias("d_i"),
            (F.col("pos") - i).alias("p_i"),
        )
        cur = cur.join(
            nxt,
            (F.col("doc_id") == F.col("d_i"))
            & (F.col("p0") == F.col("p_i")),
        ).select("doc_id", "p0")
    return cur.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_hits")
    )


#: PII patterns, applied IN ORDER (most-specific first: an email's
#: digits must not be half-eaten by the phone rule; a 16-digit card
#: must outrank the 3-3-4 phone shape). Conservative syntax shared by
#: java.util.regex (Spark) and RE2 (DuckDB): no lookaround, no
#: backrefs — the cross-engine-exactness requirement.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("card", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "<CARD>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Rule-based PII redaction for training corpora: replace every
    email / SSN-shaped / card-shaped / phone-shaped / IPv4 span with a
    typed placeholder token and count what was redacted per category
    — the standard pre-training scrub pass (placeholder tokens keep
    sequence structure for the tokenizer; counts feed the corpus
    datasheet).

    Order matters and is fixed (PII_RULES): specific shapes outrank
    general ones so a card number is never half-eaten as two phone
    numbers; counts are measured BEFORE that category's replacement,
    on the text as left by the previous rules. Everything is
    regexp_count/regexp_replace — JVM expressions inside codegen, no
    UDFs, a pure map at 100 TB — and the patterns avoid lookaround/
    backreferences so java.util.regex and RE2 agree (the DuckDB
    oracle replays the same rule chain).

    Output: (id, redacted text, one count column per category,
    pii_total).
    """
    cols = [F.col(id_col)]
    cur = F.col(text_col)
    counts = []
    for name, pat, repl in PII_RULES:
        counts.append(
            F.regexp_count(cur, F.lit(pat)).cast("long").alias(
                f"n_{name}"
            )
        )
        cur = F.regexp_replace(cur, pat, repl)
    out = df.select(*cols, cur.alias("redacted"), *counts)
    total_expr = None
    for name, _p, _r in PII_RULES:
        t = F.col(f"n_{name}")
        total_expr = t if total_expr is None else total_expr + t
    return out.withColumn("pii_total", total_expr)
