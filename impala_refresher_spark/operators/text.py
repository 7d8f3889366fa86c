"""Text-analysis operators for LLM-data pipelines (SURVEY.md §2C L5,
L6, L8 + the training-data extensions: language-ID, quality scoring,
token counting, document fingerprinting).

Everything here is pure built-in-function DataFrame code — no Python
in the hot path. The shapes that matter at 100 TB:

- tokenize/explode multiplies rows: project to (doc_id, token) BEFORE
  exploding so the expansion is two narrow columns, and aggregate
  immediately after (map-side partial agg collapses the blowup).
- The lexicon join broadcasts (lexicons are KBs).
- TF-IDF is two hash aggregates + one broadcast of the (tiny) df table
  per token — no per-document state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from impala_refresher_spark.registry import query
from impala_refresher_spark.sources.tables import fan_out, load_table

# Shared stopword list (tiny, matches the synthetic vocabulary).
STOPWORDS = ["the", "a", "of", "and", "to", "in"]

_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"


# ---------------------------------------------------------------------------
# L5 — tokenize / stopword removal / n-grams / TF-IDF
# ---------------------------------------------------------------------------

@query(
    "text_tokenize",
    f"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           CAST(len(list_filter(string_split(text, ' '),
                                t -> NOT list_contains({_STOP_SQL}, t))) AS INTEGER)
             AS n_content_tokens
    FROM documents
    """,
)
def text_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: tokenization + stopword removal, fully inside codegen
    (split + higher-order filter — no UDF, no explode)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop = F.array(*[F.lit(w) for w in STOPWORDS])
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(toks, lambda t: ~F.array_contains(stop, t))).alias(
            "n_content_tokens"
        ),
    )


@query(
    "text_bigrams",
    """
    SELECT bigram, COUNT(*) AS n
    FROM (
      SELECT unnest(list_transform(list_zip(toks[1:-2], toks[2:-1]),
                                   p -> p[1] || ' ' || p[2])) AS bigram
      FROM (SELECT string_split(text, ' ') AS toks FROM documents)
    )
    GROUP BY bigram
    HAVING COUNT(*) >= 5
    """,
)
def text_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5 n-grams: bigram counts via zip_with over shifted slices —
    the array never leaves the JVM; only (bigram, count) shuffles."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    toks = F.split("text", " ")
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 5)
    )


@query(
    "text_tfidf",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token
    ),
    df AS (
      SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY token
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.token,
           CAST(tf.tf AS BIGINT) AS tf,
           ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 4) AS tfidf
    FROM tf JOIN df USING (token) CROSS JOIN n
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5 TF-IDF, pure DataFrame: two aggregates + a broadcast join on
    the document-frequency table (vocabulary is tiny next to the
    corpus at any scale; broadcast it, never shuffle the corpus)."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    # n_docs stays plan-side: a broadcast 1-row aggregate crossJoin
    # (same shape as above_avg_orders) instead of a driver-side
    # d.count(), which would be an extra serial Spark job and a
    # planning barrier before the real query.
    n = d.agg(F.count("*").cast("double").alias("n_docs"))
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = toks.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    return (
        tf.join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4).alias("tfidf"),
        )
    )


# ---------------------------------------------------------------------------
# L6 — lexicon sentiment/keyword scoring (EDBT-2016 style)
# ---------------------------------------------------------------------------

_LEXICON = [
    ("fast", 2.0),
    ("small", 1.0),
    ("fresh", 1.0),
    ("new", 1.0),
    ("slow", -2.0),
    ("old", -1.0),
    ("dup", -1.0),
    ("error", -2.0),
]

_LEXICON_SQL = (
    "(VALUES "
    + ", ".join(f"('{w}', CAST({s} AS DOUBLE))" for w, s in _LEXICON)
    + ") lex(word, score)"
)


@query(
    "text_lexicon_score",
    f"""
    SELECT t.doc_id,
           ROUND(SUM(lex.score), 2) AS sentiment,
           CAST(COUNT(*) AS BIGINT) AS n_scored
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents) t
    JOIN {_LEXICON_SQL} ON t.token = lex.word
    GROUP BY t.doc_id
    """,
)
def text_lexicon_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6: explode tokens, broadcast-join the lexicon, sum scores per
    doc. The lexicon side is always broadcast — it is KBs."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    lex = F.broadcast(
        d.sparkSession.createDataFrame(_LEXICON, ["word", "score"])
    )
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    return (
        toks.join(lex, toks.token == lex.word)
        .groupBy("doc_id")
        .agg(F.round(F.sum("score"), 2).alias("sentiment"), F.count("*").alias("n_scored"))
    )


# ---------------------------------------------------------------------------
# L8 — language/source histogram + quality filters
# ---------------------------------------------------------------------------

@query(
    "lang_source_histogram",
    """
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(AVG(n_chars), 2) AS avg_chars
    FROM documents
    GROUP BY lang, source
    """,
)
def lang_source_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
    )


@query(
    "quality_filter",
    """
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE n_chars BETWEEN 100 AND 400
      AND lang IN ('en', 'es', 'de', 'fr')
      AND len(string_split(text, ' ')) >= 10
    """,
)
def quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L8: the standard pre-training quality gate — length bounds,
    language whitelist, minimum token count. All pushdown-eligible
    except the token count (computed post-scan, still codegen)."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(
        F.col("n_chars").between(100, 400)
        & F.col("lang").isin("en", "es", "de", "fr")
        & (F.size(F.split("text", " ")) >= 10)
    ).select("doc_id", "lang", "n_chars")


@query(
    "quality_score",
    f"""
    SELECT doc_id,
           0.4 * least(n_chars / 300.0, 1.0)
           + 0.3 * (1.0 - CAST(len(list_filter(string_split(text, ' '),
                                t -> list_contains({_STOP_SQL}, t))) AS DOUBLE)
                          / len(string_split(text, ' ')))
           + 0.3 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                          / len(string_split(text, ' '))) AS quality
    FROM documents
    """,
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: weighted blend of length, stopword ratio, and
    type-token ratio — the classic heuristic document-quality score,
    computed entirely in codegen.

    Left unrounded: the blend produces decimal-terminating values
    (n/750 etc.) that land exactly on ROUND boundaries where engines
    disagree; the unrounded doubles are bitwise-identical because both
    engines evaluate the same IEEE expression tree."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop = F.array(*[F.lit(w) for w in STOPWORDS])
    n_tok = F.size(toks).cast("double")
    stop_ratio = F.size(F.filter(toks, lambda t: F.array_contains(stop, t))) / n_tok
    ttr = F.size(F.array_distinct(toks)).cast("double") / n_tok
    length_score = F.least(F.col("n_chars") / 300.0, F.lit(1.0))
    return d.select(
        "doc_id",
        (0.4 * length_score + 0.3 * (1.0 - stop_ratio) + 0.3 * ttr).alias("quality"),
    )


# ---------------------------------------------------------------------------
# Language-ID (n-gram/marker heuristic)
# ---------------------------------------------------------------------------

_LANG_MARKERS = {
    "en": ["the", "and", "of", "fast", "key"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
}


def _marker_sql(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


@query(
    "lang_id_heuristic",
    f"""
    SELECT doc_id,
           CASE
             WHEN s_en >= s_es AND s_en >= s_de AND s_en > 0 THEN 'en'
             WHEN s_es >= s_de AND s_es > 0 THEN 'es'
             WHEN s_de > 0 THEN 'de'
             ELSE 'unknown'
           END AS lang_pred
    FROM (
      SELECT doc_id,
             len(list_filter(toks, t -> list_contains({_marker_sql(_LANG_MARKERS["en"])}, t))) AS s_en,
             len(list_filter(toks, t -> list_contains({_marker_sql(_LANG_MARKERS["es"])}, t))) AS s_es,
             len(list_filter(toks, t -> list_contains({_marker_sql(_LANG_MARKERS["de"])}, t))) AS s_de
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    )
    """,
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID via marker-word counting with a deterministic
    priority order (en > es > de on ties). A real deployment swaps the
    marker lists for char-n-gram profiles; the plan shape — per-row
    array math, zero shuffles — is identical."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")

    def score(words: list[str]):
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    s_en, s_es, s_de = (score(_LANG_MARKERS[l]) for l in ("en", "es", "de"))
    return d.select(
        "doc_id",
        F.when((s_en >= s_es) & (s_en >= s_de) & (s_en > 0), "en")
        .when((s_es >= s_de) & (s_es > 0), "es")
        .when(s_de > 0, "de")
        .otherwise("unknown")
        .alias("lang_pred"),
    )


# ---------------------------------------------------------------------------
# Token counting (BPE-ish regex) + document fingerprint (rolling hash)
# ---------------------------------------------------------------------------

@query(
    "token_count_regex",
    """
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER)
             AS n_bpe_ish,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws
    FROM documents
    """,
)
def token_count_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace and a BPE-ish regex over
    letter-runs / digit-runs / punctuation — the standard cheap proxy
    for tokenizer cost used in corpus budgeting."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.expr("size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))").alias(
            "n_bpe_ish"
        ),
        F.size(F.split("text", " ")).alias("n_ws"),
    )


@query(
    "doc_fingerprint",
    """
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
                          list_transform(string_split(text, ' '),
                                         t -> CAST(ascii(t) * 131 + length(t) AS BIGINT))),
             (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: polynomial rolling hash over the token
    stream (order-sensitive, unlike a bag-of-words hash). Uses an
    engine-neutral hash so the oracle can replicate it; a production
    pipeline would use xxhash64(text) — same plan, different mixer."""
    d = load_table(spark, sf_dir, "documents")
    tok_hash = F.transform(
        F.split("text", " "),
        lambda t: (F.ascii(t) * 131 + F.length(t)).cast("long"),
    )
    return d.select(
        "doc_id",
        F.aggregate(
            tok_hash,
            F.lit(0).cast("long"),
            lambda acc, x: (acc * 31 + x) % 1000000007,
        ).alias("fingerprint"),
    )


# ---------------------------------------------------------------------------
# PII / denylist redaction — regex scrub over the corpus
# ---------------------------------------------------------------------------

# One alternation, applied identically in Spark (Java regex) and the
# DuckDB oracle (RE2): emails, URLs, long digit runs (ID/phone-like),
# plus a denylist of terms (the entity-scrub path; the fixture corpus
# contains denylist hits, so the differential is non-degenerate).
_PII_PATTERN = (
    r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    r"|https?://\S+"
    r"|\b\d{4,}\b"
    r"|\bcustomer\b|\bsupplier\b"
)


@query(
    "text_redact_pii",
    f"""
    SELECT doc_id,
           regexp_replace(text, '{_PII_PATTERN}', '[REDACTED]', 'g') AS clean_text,
           CAST(len(regexp_extract_all(text, '{_PII_PATTERN}')) AS INTEGER) AS n_redactions
    FROM documents
    WHERE len(regexp_extract_all(text, '{_PII_PATTERN}')) > 0
    """,
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII / denylist scrub: replace emails, URLs, long digit runs and
    denylisted terms with a redaction token, reporting per-doc hit
    counts — the compliance pass every training corpus goes through.

    Pure codegen: regexp_replace + regexp_count on the scan, filter on
    the count — fully parallel, no shuffle at all (the 100 TB shape:
    a map-only job). Patterns live in one shared alternation so Spark
    and the oracle scrub byte-identically."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    return (
        d.select(
            "doc_id",
            F.regexp_replace("text", _PII_PATTERN, "[REDACTED]").alias("clean_text"),
            F.regexp_count("text", F.lit(_PII_PATTERN)).cast("int").alias("n_redactions"),
        )
        .filter(F.col("n_redactions") > 0)
    )


# ---------------------------------------------------------------------------
# Corpus heavy hitters — global top-k frequent tokens
# ---------------------------------------------------------------------------

@query(
    "text_top_tokens",
    """
    SELECT token, n FROM (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      GROUP BY token
    )
    ORDER BY n DESC, token
    LIMIT 50
    """,
)
def text_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global heavy hitters: top-50 tokens by corpus frequency with a
    deterministic tie-break (count desc, token asc).

    Scale shape: explode → map-side partial count collapses the token
    blowup before the shuffle, and orderBy+limit compiles to
    TakeOrderedAndProject — each partition keeps only its own top 50,
    so the driver merges k*partitions rows, never the full vocabulary."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Character-entropy quality signal
# ---------------------------------------------------------------------------

@query(
    "quality_char_entropy",
    """
    WITH c AS (SELECT doc_id, string_split(text, '') AS chars FROM documents)
    SELECT doc_id,
           ROUND(list_sum(list_transform(list_distinct(chars), ch ->
             - (CAST(len(list_filter(chars, x -> x = ch)) AS DOUBLE) / len(chars))
               * log2(CAST(len(list_filter(chars, x -> x = ch)) AS DOUBLE) / len(chars))
           )), 2) AS char_entropy
    FROM c
    """,
)
def quality_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the per-document character distribution — a
    cheap perplexity proxy: boilerplate/repeated-char spam scores low,
    natural prose sits near the language's typical 4-4.5 bits.

    Entirely higher-order-function codegen (split → distinct →
    per-char filter counts → -Σ p·log2 p): no explode, no shuffle, no
    Python — a pure narrow map over documents, embarrassingly parallel
    at any scale."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    chars = F.split("text", "")
    n = F.size(chars)
    ent = F.aggregate(
        F.array_distinct(chars),
        F.lit(0.0),
        lambda acc, ch: acc
        - (F.size(F.filter(chars, lambda x: x == ch)) / n)
        * F.log2(F.size(F.filter(chars, lambda x: x == ch)) / n),
    )
    return d.select("doc_id", F.round(ent, 2).alias("char_entropy"))


# ---------------------------------------------------------------------------
# Corpus trigram LM — conditional-probability quality scoring
# ---------------------------------------------------------------------------

@query(
    "quality_lm_trigram",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    tri AS (
      SELECT doc_id,
             unnest(list_transform(list_zip(t[1:-3], t[2:-2], t[3:-1]),
                                   p -> p[1] || ' ' || p[2] || ' ' || p[3])) AS tg
      FROM toks
    ),
    bi AS (
      SELECT doc_id,
             unnest(list_transform(list_zip(t[1:-2], t[2:-1]),
                                   p -> p[1] || ' ' || p[2])) AS bg
      FROM toks
    ),
    tri_c AS (SELECT tg, CAST(COUNT(*) AS BIGINT) AS c3 FROM tri GROUP BY tg),
    bi_c AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS c2 FROM bi GROUP BY bg),
    scored AS (
      SELECT t.doc_id,
             -log2(CAST(tc.c3 AS DOUBLE) / bc.c2) AS nll
      FROM tri t
      JOIN tri_c tc ON t.tg = tc.tg
      JOIN bi_c bc ON bc.bg = substr(t.tg, 1, length(t.tg) - strpos(reverse(t.tg), ' '))
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_trigrams,
           ROUND(AVG(nll), 2) AS avg_nll
    FROM scored
    GROUP BY doc_id
    """,
)
def quality_lm_trigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained trigram LM score: P(w3 | w1 w2) estimated from
    the corpus's own trigram/bigram counts; each document scores its
    average negative log2 conditional probability (pseudo-perplexity).
    Low = boilerplate repeated across the corpus; high = tokens in
    contexts the corpus has barely seen — both tails are what quality
    filters cut.

    Scale shape: two hash aggregates over exploded n-grams (map-side
    partial combine collapses the blowup), then one join per n-gram
    order to attach counts — all shuffles carry (hash, count) pairs,
    never documents. At 100 TB the count tables are Zipf-shaped; a df
    cutoff on rare n-grams (OOV floor) bounds them like _MAX_DF does
    for shingles."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    t = F.split("text", " ")
    n = F.size(t)
    cw = lambda x, y: F.concat_ws(" ", x, y)
    # greatest(0, n-2): a doc shorter than 3 tokens has NO trigrams —
    # slice() must get length 0, not a negative (Spark ERRORS on
    # negative lengths where DuckDB's t[1:-3] quietly yields []; found
    # by the hypothesis differential on 1-token docs, unreachable on
    # the 44+-token fixture)
    tri_len = F.greatest(F.lit(0), n - 2)
    tri_arr = F.zip_with(
        F.slice(t, 1, tri_len),
        F.zip_with(F.slice(t, 2, tri_len), F.slice(t, 3, tri_len), cw),
        cw,
    )
    bi_arr = F.zip_with(F.slice(t, 1, n - 1), F.slice(t, 2, n - 1), cw)
    tri = d.select("doc_id", F.explode(tri_arr).alias("tg"))
    bi = d.select("doc_id", F.explode(bi_arr).alias("bg"))
    tri_c = tri.groupBy("tg").agg(F.count("*").alias("c3"))
    bi_c = bi.groupBy("bg").agg(F.count("*").alias("c2"))
    # context = the trigram minus its last token
    ctx = F.expr("substr(tg, 1, length(tg) - instr(reverse(tg), ' '))")
    scored = (
        tri.join(tri_c, "tg")
        .withColumn("bg", ctx)
        .join(bi_c, "bg")
        .select("doc_id", (-F.log2(F.col("c3").cast("double") / F.col("c2"))).alias("nll"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_trigrams"), F.round(F.avg("nll"), 2).alias("avg_nll")
    )


# ---------------------------------------------------------------------------
# Keyword-in-context (KWIC) — concordance extraction
# ---------------------------------------------------------------------------

@query(
    "text_keyword_in_context",
    """
    SELECT doc_id,
           CAST(pos - 1 AS INTEGER) AS pos,
           COALESCE(array_to_string(toks[greatest(1, pos - 2):pos - 1], ' '), '') AS left_ctx,
           COALESCE(array_to_string(toks[pos + 1:least(len(toks), pos + 2)], ' '), '') AS right_ctx
    FROM (
      SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS pos
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    )
    WHERE toks[pos] = 'customer'
    """,
)
def text_keyword_in_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KWIC concordance: every occurrence of a keyword with ±2 tokens
    of context — the corpus-inspection tool behind lexicography,
    red-teaming sweeps, and prompt-leak audits.

    Map-only: positions come from posexplode of the token array,
    context from slices of the SAME array (no joins, no shuffle);
    the keyword filter collapses the explode blowup immediately, and
    at scale the keyword predicate pushes into a bloom/inverted-index
    pre-filter when one exists."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    toks = F.split("text", " ")
    ex = d.select("doc_id", toks.alias("toks"), F.posexplode(toks).alias("pos", "tok"))
    # pos is 0-based; slice() is 1-based
    p1 = F.col("pos") + 1
    left = F.concat_ws(
        " ", F.slice("toks", F.greatest(F.lit(1), p1 - 2), F.least(F.lit(2), p1 - 1))
    )
    right_len = F.greatest(F.lit(0), F.least(F.lit(2), F.size("toks") - p1))
    right = F.concat_ws(" ", F.slice("toks", p1 + 1, right_len))
    return (
        ex.filter(F.col("tok") == "customer")
        .select("doc_id", F.col("pos").cast("int").alias("pos"),
                left.alias("left_ctx"), right.alias("right_ctx"))
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition/quality rule battery (Rae et al. 2021, §A1.1)
# ---------------------------------------------------------------------------

# Shared between `quality_gopher_rules` and the corpus pipelines: the
# SQL feature CTEs and the pass predicate, plus their exact Python
# mirrors below — ONE definition of the rules, reused verbatim so the
# battery and every pipeline that gates on it stay in lockstep.
GOPHER_FEAT_SQL_CTES = f"""t AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), feat AS (
      SELECT doc_id,
             CAST(list_sum(list_transform(w, x -> len(x))) AS DOUBLE)
               / CAST(len(w) AS DOUBLE) AS mean_word_len,
             1.0 - CAST(len(list_distinct(w)) AS DOUBLE)
               / CAST(len(w) AS DOUBLE) AS dup_word_frac,
             CAST(len(list_filter(w, t2 -> list_contains({_STOP_SQL}, t2))) AS DOUBLE)
               / CAST(len(w) AS DOUBLE) AS stopword_frac,
             CASE WHEN len(w) < 2 THEN CAST(0.0 AS DOUBLE) ELSE
               CAST(list_max(list_transform(
                      list_distinct(list_transform(range(1, len(w)),
                                    i -> w[i] || ' ' || w[i + 1])),
                      x -> len(list_filter(list_transform(range(1, len(w)),
                                           i -> w[i] || ' ' || w[i + 1]),
                                           y -> y = x)))) AS DOUBLE)
                 / CAST(len(w) - 1 AS DOUBLE)
             END AS top_bigram_frac
      FROM t
    )"""

GOPHER_PASS_SQL = """(mean_word_len >= 3.0 AND mean_word_len <= 10.0
            AND dup_word_frac <= 0.80
            AND stopword_frac >= 0.01
            AND top_bigram_frac <= 0.20)"""


def gopher_features(d: DataFrame) -> DataFrame:
    """(doc_id, mean_word_len, dup_word_frac, stopword_frac,
    top_bigram_frac) — the map-only Gopher feature battery over a
    documents-shaped frame; Python mirror of GOPHER_FEAT_SQL_CTES."""
    w = F.split("text", " ")
    n = F.size(w)
    nd = n.cast("double")
    stop = F.array(*[F.lit(x) for x in STOPWORDS])
    mean_word_len = (
        F.aggregate(w, F.lit(0), lambda a, x: a + F.length(x)).cast("double") / nd
    )
    dup_word_frac = 1.0 - F.size(F.array_distinct(w)).cast("double") / nd
    stopword_frac = (
        F.size(F.filter(w, lambda t: F.array_contains(stop, t))).cast("double") / nd
    )
    # Word bigrams as a pure array expression (1-based element_at on
    # both engines); per-doc mode count via distinct→count-each→max.
    bg = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat_ws(" ", F.element_at(w, i), F.element_at(w, i + 1)),
    )
    top_bigram_frac = F.when(n < 2, F.lit(0.0)).otherwise(
        F.array_max(
            F.transform(
                F.array_distinct(bg),
                lambda x: F.size(F.filter(bg, lambda y: y == x)),
            )
        ).cast("double")
        / (n - 1).cast("double")
    )
    return d.select(
        "doc_id",
        mean_word_len.alias("mean_word_len"),
        dup_word_frac.alias("dup_word_frac"),
        stopword_frac.alias("stopword_frac"),
        top_bigram_frac.alias("top_bigram_frac"),
    )


def gopher_pass_col():
    """Boolean pass predicate over gopher_features' columns; Python
    mirror of GOPHER_PASS_SQL."""
    return (
        (F.col("mean_word_len") >= 3.0)
        & (F.col("mean_word_len") <= 10.0)
        & (F.col("dup_word_frac") <= 0.80)
        & (F.col("stopword_frac") >= 0.01)
        & (F.col("top_bigram_frac") <= 0.20)
    )


@query(
    "quality_gopher_rules",
    f"""
    WITH {GOPHER_FEAT_SQL_CTES}
    SELECT doc_id, mean_word_len, dup_word_frac, stopword_frac, top_bigram_frac,
           {GOPHER_PASS_SQL} AS passes_gopher
    FROM feat
    """,
)
def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality rule battery: mean word length band,
    duplicate-word fraction, stopword floor, and top-bigram
    concentration (the "fraction of characters in the most common
    n-gram" family of repetition rules), folded into one pass/fail
    flag. The line-based Gopher rules are vacuous on this fixture
    (single-line docs); the repetition family is the load-bearing
    subset for word-soup spam anyway.

    100 TB shape: every feature — including the per-document bigram
    mode — is a higher-order-function fold over the token array, so
    the whole battery is MAP-ONLY codegen: no explode, no shuffle, no
    Python. The alternative explode→groupBy(doc_id, bigram)→max plan
    shuffles one row per token occurrence (≈corpus size); this plan
    shuffles nothing and scales linearly with input bytes. The per-doc
    O(distinct·n) mode loop is bounded by document length, not corpus
    size. Both engines evaluate the identical IEEE expression tree, so
    the unrounded doubles (and the threshold flags derived from them)
    match bitwise."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    return gopher_features(d).select("*", gopher_pass_col().alias("passes_gopher"))


# ---------------------------------------------------------------------------
# BM25 retrieval scoring (Robertson/Sparck Jones; the ranking function
# behind Lucene/Elasticsearch defaults)
# ---------------------------------------------------------------------------

_BM25_TERMS = ["customer", "table", "fast"]
_BM25_K1 = 1.2
_BM25_B = 0.75

_BM25_IN = "(" + ", ".join(f"'{t}'" for t in _BM25_TERMS) + ")"

# Module constant so `retrieval_rrf_fusion` can embed the SAME lexical
# scorer as a subquery — one BM25 definition, two oracles.
_BM25_SQL = f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS avgdl
      FROM documents
    ),
    tf AS (
      SELECT doc_id, token, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM toks WHERE token IN {_BM25_IN} GROUP BY 1, 2
    ),
    df AS (
      SELECT token, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
      FROM toks WHERE token IN {_BM25_IN} GROUP BY 1
    ),
    scored AS (
      SELECT tf.doc_id, tf.token,
             ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
             * (tf * {_BM25_K1 + 1.0})
             / (tf + {_BM25_K1} * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE) / avgdl)))
             AS s
      FROM tf JOIN df USING (token) JOIN dl USING (doc_id) CROSS JOIN stats
    )
    SELECT doc_id,
           COALESCE(SUM(CASE WHEN token = 'customer' THEN s END), 0.0)
           + COALESCE(SUM(CASE WHEN token = 'table' THEN s END), 0.0)
           + COALESCE(SUM(CASE WHEN token = 'fast' THEN s END), 0.0) AS bm25
    FROM scored GROUP BY doc_id
    """


@query("text_bm25_score", _BM25_SQL)
def text_bm25_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25(k1=1.2, b=0.75) of a fixed 3-term query against every
    document — the lexical-retrieval scorer that pairs with the dense
    cosine path (similarity.py) for hybrid corpus search.

    Same scale skeleton as `text_tfidf`: the term filter lands BEFORE
    the tf aggregate so the explode collapses to query-term hits only;
    df and the (n_docs, avgdl) pair are broadcast-sized statistics
    (one row / |vocab∩query| rows); doc length joins map-side. The
    per-document total is written as fixed-order conditional sums —
    one per query term — not SUM over an arbitrary-order group, so
    both engines add the three doubles in the same order and the
    unrounded scores match bitwise."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    w = F.split("text", " ")
    stats = d.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum(F.size(w)).cast("double") / F.count("*").cast("double")).alias("avgdl"),
    )
    dl = d.select("doc_id", F.size(w).alias("dl"))
    toks = d.select("doc_id", F.explode(w).alias("token")).filter(
        F.col("token").isin(_BM25_TERMS)
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").cast("double").alias("tf"))
    df = toks.groupBy("token").agg(F.countDistinct("doc_id").cast("double").alias("df"))
    s = (
        F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
        * (F.col("tf") * (_BM25_K1 + 1.0))
        / (
            F.col("tf")
            + _BM25_K1 * (0.25 + 0.75 * (F.col("dl").cast("double") / F.col("avgdl")))
        )
    )
    scored = (
        tf.join(F.broadcast(df), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "token", s.alias("s"))
    )
    def term_sum(t: str):
        return F.coalesce(
            F.sum(F.when(F.col("token") == t, F.col("s"))), F.lit(0.0)
        )
    return scored.groupBy("doc_id").agg(
        (
            term_sum("customer") + term_sum("table") + term_sum("fast")
        ).alias("bm25")
    )


def gopher_gate_ids(d: DataFrame) -> DataFrame:
    """doc_ids passing the Gopher rules, via the AGGREGATE plan — the
    form to use when the rules are a FILTER, not a report.

    Why a second plan for the same rules: Catalyst pushes filter
    predicates through projections and duplicates them into the scan's
    DataFilters, re-evaluating each conjunct's full expression — and
    the bigram-mode higher-order fold is CodegenFallback, so the
    pushed predicate runs interpreted per conjunct per row (measured
    365× slower than the same expressions in a projection: 0.4 s →
    147 s at sf0.1). Aggregates are pushdown barriers: here every
    feature is computed exactly once in two explode→partial-agg
    passes (tokens, bigrams) joined on doc_id, the cheap conjuncts
    still push to the scan, and the expensive ones filter ABOVE the
    aggregate. Integer sufficient statistics (char totals, distinct
    and stopword counts, bigram mode) divide to the identical doubles
    the map-only battery produces, so the two plans agree bitwise on
    every threshold."""
    w = F.split("text", " ")
    n = F.size(w)
    stop = F.array(*[F.lit(x) for x in STOPWORDS])
    # Shuffle-byte discipline: every per-token fact the aggregates
    # need (length, stop membership, distinct identity) is projected
    # to fixed-width ints BEFORE the exchange — the token/bigram
    # STRINGS never shuffle. Distinct identity rides as xxhash64; a
    # within-doc 64-bit collision (the only kind that could perturb a
    # count) needs two distinct tokens of ONE document colliding —
    # ~n²/2^65, negligible at any document length.
    tok = d.select("doc_id", n.alias("n"), F.explode(w).alias("token")).select(
        "doc_id",
        "n",
        F.length("token").alias("len"),
        F.xxhash64("token").alias("th"),
        F.array_contains(stop, F.col("token")).cast("int").alias("is_stop"),
    )
    tokf = tok.groupBy("doc_id").agg(
        F.first("n").alias("n"),
        F.sum("len").alias("chars"),
        F.count_distinct("th").alias("n_distinct"),
        F.sum("is_stop").alias("n_stop"),
    )
    bg = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat_ws(" ", F.element_at(w, i), F.element_at(w, i + 1)),
    )
    b = d.select(
        "doc_id",
        F.explode(
            F.when(n < 2, F.array().cast("array<string>")).otherwise(bg)
        ).alias("bigram"),
    ).select("doc_id", F.xxhash64("bigram").alias("bh"))
    b2 = (
        b.groupBy("doc_id", "bh")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"), F.sum("c").alias("n_bg"))
    )
    nd = F.col("n").cast("double")
    mean_word_len = F.col("chars").cast("double") / nd
    dup_word_frac = 1.0 - F.col("n_distinct").cast("double") / nd
    stopword_frac = F.col("n_stop").cast("double") / nd
    top_bigram_frac = F.coalesce(
        F.col("top_c").cast("double") / F.col("n_bg").cast("double"), F.lit(0.0)
    )
    return (
        tokf.join(b2, "doc_id", "left")
        .filter(
            (mean_word_len >= 3.0)
            & (mean_word_len <= 10.0)
            & (dup_word_frac <= 0.80)
            & (stopword_frac >= 0.01)
            & (top_bigram_frac <= 0.20)
        )
        .select("doc_id")
    )


# ---------------------------------------------------------------------------
# Sliding-window document chunking (the RAG / embedding-prep splitter)
# ---------------------------------------------------------------------------

_CHUNK_W = 64  # tokens per chunk
_CHUNK_S = 48  # stride (overlap = W - S = 16 tokens)


@query(
    "text_chunk_sliding",
    f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    m AS (
      SELECT doc_id, toks,
             CAST(1 + ceil(greatest(len(toks) - {_CHUNK_W}, 0) / {_CHUNK_S}.0)
                  AS INT) AS n_chunks
      FROM t
    )
    SELECT doc_id,
           CAST(UNNEST(range(n_chunks)) AS INT) AS chunk_id,
           UNNEST(list_transform(range(n_chunks),
             k -> CAST(len(toks[k * {_CHUNK_S} + 1 : k * {_CHUNK_S} + {_CHUNK_W}])
                       AS INT))) AS n_tokens,
           UNNEST(list_transform(range(n_chunks),
             k -> array_to_string(toks[k * {_CHUNK_S} + 1 : k * {_CHUNK_S} + {_CHUNK_W}],
                                  ' '))) AS chunk_text
    FROM m
    """,
)
def text_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: split each document into overlapping
    {W}-token windows at stride {S} — the preprocessing step that feeds
    an embedding model for RAG / dense retrieval (every doc yields >= 1
    chunk; the last chunk may run short; a doc of <= {W} tokens is one
    chunk). Chunk count = 1 + ceil(max(0, n - W) / S), so windows cover
    every token and consecutive chunks share W - S tokens of context.

    Map-only: token split, chunk count, and per-chunk slices all run
    inside codegen on the scan projection; the explode (Generate)
    multiplies rows by chunks-per-doc — bounded by document length,
    never corpus size — and moves nothing (no shuffle, no Python).
    At 100 TB this is the shape that matters: chunking is a pure map
    stage that pipelines into the (stubbed) embedding UDF without a
    repartition. The oracle zips three same-level UNNESTs (id, length,
    text), which DuckDB aligns positionally — exactly posexplode over
    the same slices; slicing clamps at the array end on both engines."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    toks = F.split("text", " ")
    n_chunks = (
        F.lit(1)
        + F.ceil(F.greatest(F.size(toks) - _CHUNK_W, F.lit(0)) / F.lit(float(_CHUNK_S)))
    ).cast("int")
    base = d.select("doc_id", toks.alias("toks"), n_chunks.alias("n_chunks"))
    chunk = F.slice(F.col("toks"), F.col("chunk_id") * _CHUNK_S + 1, _CHUNK_W)
    return (
        base.select(
            "doc_id",
            "toks",
            F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_id"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.size(chunk).cast("int").alias("n_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )


text_chunk_sliding.__doc__ = text_chunk_sliding.__doc__.replace(
    "{W}", str(_CHUNK_W)
).replace("{S}", str(_CHUNK_S))


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of BM25 (sparse) + cosine (dense)
# ---------------------------------------------------------------------------

_RRF_K = 60     # the standard RRF damping constant (Cormack et al. 2009)
_RRF_TOPN = 50  # candidates kept from each ranker before fusion


def _rrf_oracle() -> str:
    """Generated DuckDB twin of `retrieval_rrf_fusion`. Portable
    because both rankers are already cross-engine exact: BM25 scores
    match bitwise (`_BM25_SQL`'s fixed-order conditional sums) and the
    cosine fold is the shared L->R list_reduce; both rankings use a
    TOTAL order (score DESC, doc_id) so row_number agrees on ties, and
    the fused score is a fixed two-term sum of exact-operand divisions
    (1.0 / (rank + 60)) — correctly-rounded IEEE on both engines, so
    the output is deliberately UNROUNDED."""
    from impala_refresher_spark.operators.similarity import _sql_cosine

    return f"""
    WITH bm AS ({_BM25_SQL}),
    lex AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS INT)
               AS lex_rank
      FROM bm QUALIFY lex_rank <= {_RRF_TOPN}
    ),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    dn AS (
      SELECT vec_id AS doc_id, {_sql_cosine("embedding", "qv")} AS sim
      FROM embeddings, q WHERE vec_id <> 0
    ),
    dense AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, doc_id) AS INT)
               AS dense_rank
      FROM dn QUALIFY dense_rank <= {_RRF_TOPN}
    )
    SELECT doc_id, lex_rank, dense_rank,
           COALESCE(1.0 / (lex_rank + {_RRF_K}), 0.0)
           + COALESCE(1.0 / (dense_rank + {_RRF_K}), 0.0) AS rrf_score
    FROM lex FULL JOIN dense USING (doc_id)
    """


@query("retrieval_rrf_fusion", _rrf_oracle())
def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by reciprocal-rank fusion (Cormack et al. 2009,
    the standard hybrid-search combiner): the top-50 BM25 (sparse) and
    top-50 cosine (dense, vs the vec_id-0 query vector) candidate lists
    merge on doc_id with score = sum over rankers of 1/(60 + rank); a
    doc missing from one list contributes 0 from it. This is the
    serving-side composition of `text_bm25_score` (lexical) and the
    `cosine_topk` shape (dense) — rank-based, so the two scorers'
    incomparable scales never need calibration.

    Scale shape: each ranker cuts to its 50-row candidate list with
    `orderBy().limit()` — TakeOrderedAndProject, a per-partition top-k
    heap merged at the driver (the `cosine_topk` shape), NEVER a
    corpus-sized single-partition sort — so the only global windows
    (the rank assignments) run over exactly 50 rows, and the full-outer
    fusion join is candidate-sized regardless of corpus size. Ranks use
    a total order (score DESC, doc_id) so the cut and the ties are
    deterministic cross-engine; the fused score is a fixed-order sum of
    two exact divisions and is deliberately unrounded (bit-identical
    IEEE)."""
    from pyspark.sql.window import Window

    from impala_refresher_spark.operators.similarity import cosine

    def _top_ranked(df: DataFrame, score, rank_name: str) -> DataFrame:
        cand = df.orderBy(score.desc(), "doc_id").limit(_RRF_TOPN)
        return cand.select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(score.desc(), "doc_id"))
            .alias(rank_name),
        )

    bm = text_bm25_score(spark, sf_dir)
    lex = _top_ranked(bm, F.col("bm25"), "lex_rank")
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    dn = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine(F.col("embedding"), F.col("qv")).alias("sim"),
        )
    )
    dense = _top_ranked(dn, F.col("sim"), "dense_rank")
    rrf = F.coalesce(F.lit(1.0) / (F.col("lex_rank") + _RRF_K), F.lit(0.0)) + F.coalesce(
        F.lit(1.0) / (F.col("dense_rank") + _RRF_K), F.lit(0.0)
    )
    return lex.join(dense, "doc_id", "full").select(
        "doc_id", "lex_rank", "dense_rank", rrf.alias("rrf_score")
    )
