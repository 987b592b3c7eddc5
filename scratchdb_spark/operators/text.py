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
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(score, 4).alias("quality"),
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
