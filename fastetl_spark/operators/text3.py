"""Text tier 3: document chunking, PII scrubbing, repetition detection —
the remaining preprocessing stages of a pretraining-corpus pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastetl_spark.checkpointing import materialize
from fastetl_spark.io.readers import ensure_parallelism, read_table
from fastetl_spark.registry import query

# --- document chunking ---------------------------------------------------

_CHUNK_SIZE = 100  # chars
_CHUNK_OVERLAP = 20

_CHUNK_SQL = f"""
WITH chunks AS (
  SELECT doc_id,
         unnest(generate_series(1, greatest(LENGTH(text) - {_CHUNK_OVERLAP}, 1),
                                {_CHUNK_SIZE - _CHUNK_OVERLAP})) AS chunk_start,
         text
  FROM documents
)
SELECT doc_id, chunk_start,
       SUBSTR(text, chunk_start, {_CHUNK_SIZE}) AS chunk_text,
       LENGTH(SUBSTR(text, chunk_start, {_CHUNK_SIZE})) AS chunk_len
FROM chunks
"""


@query("doc_chunking", _CHUNK_SQL)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size chunks with absolute char offsets (stride =
    size - overlap) — the context-window slicing step before tokenizing;
    offsets survive so chunks can be traced back to source spans."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    stride = _CHUNK_SIZE - _CHUNK_OVERLAP
    starts = F.sequence(
        F.lit(1), F.greatest(F.length("text") - _CHUNK_OVERLAP, F.lit(1)), F.lit(stride)
    )
    t = d.select("doc_id", "text", F.explode_outer(starts).alias("chunk_start")).filter(
        F.col("chunk_start").isNotNull()
    )
    chunk = F.substring(F.col("text"), F.col("chunk_start"), _CHUNK_SIZE)
    return t.select(
        "doc_id", "chunk_start", chunk.alias("chunk_text"), F.length(chunk).alias("chunk_len")
    )


# --- PII scrubbing -------------------------------------------------------

_EMAIL_RE = "[a-z0-9._]+@[a-z0-9.]+\\.[a-z]+"
_PHONE_RE = "\\+?[0-9]{2} ?\\([0-9]{2}\\) ?[0-9]{4,5}-[0-9]{4}"

_PII_SQL = f"""
WITH seeded AS (
  SELECT doc_id,
         CONCAT(text, ' contato: user', CAST(doc_id AS VARCHAR),
                '@example.com tel +55 (61) 9999-', LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0'))
           AS text_with_pii
  FROM documents
)
SELECT doc_id,
       regexp_replace(regexp_replace(text_with_pii, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                      '{_PHONE_RE}', '<PHONE>', 'g') AS text_scrubbed,
       len(regexp_extract_all(text_with_pii, '{_EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(text_with_pii, '{_PHONE_RE}')) AS n_phones
FROM seeded
"""


@query("pii_scrub", _PII_SQL)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: emails/phone numbers replaced with placeholder
    tokens + per-doc hit counts (PII is seeded deterministically since
    the fixture corpus is synthetic; the scrub expressions are the real
    operator)."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    seeded = F.concat(
        F.col("text"),
        F.lit(" contato: user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com tel +55 (61) 9999-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    t = d.select("doc_id", seeded.alias("text_with_pii"))
    scrub = F.regexp_replace(
        F.regexp_replace(F.col("text_with_pii"), _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    return t.select(
        "doc_id",
        scrub.alias("text_scrubbed"),
        F.size(F.regexp_extract_all("text_with_pii", F.lit(_EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all("text_with_pii", F.lit(_PHONE_RE), 0)).alias("n_phones"),
    )


# --- repetition detection ------------------------------------------------

_REP_SQL = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
)
SELECT doc_id,
       len(list_filter(generate_series(1, len(tokens) - 1),
                       i -> tokens[i] = tokens[i+1])) AS n_immediate_repeats,
       len(tokens) - len(list_distinct(tokens)) AS n_duplicate_tokens,
       len(list_filter(generate_series(1, len(tokens) - 1),
                       i -> tokens[i] = tokens[i+1])) * 1.0
         / greatest(len(tokens) - 1, 1) AS repeat_ratio
FROM t
"""


@query("repetition_stats", _REP_SQL)
def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degenerate-text detector: immediate token repeats and duplicate
    mass — cheap filters against looping generations / boilerplate."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    t = d.select("doc_id", F.split("text", " ").alias("tokens"))
    toks = F.col("tokens")
    rep = F.size(
        F.filter(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.element_at(toks, i) == F.element_at(toks, i + 1),
        )
    )
    return t.select(
        "doc_id",
        rep.alias("n_immediate_repeats"),
        (F.size(toks) - F.size(F.array_distinct(toks))).alias("n_duplicate_tokens"),
        (rep * 1.0 / F.greatest(F.size(toks) - 1, F.lit(1))).alias("repeat_ratio"),
    )


# --- Gopher-style quality filter (rule composite) ------------------------

# Published heuristic bounds (Gopher / MassiveText, Rae et al. 2021):
# word-count window, mean-word-length window, alphabetic-word fraction,
# symbol-to-word ratio, minimum stopword evidence. Thresholds are module
# constants so a pipeline can tune them; the flag columns expose each
# rule's verdict so rejected docs are explainable.
_G_MIN_WORDS, _G_MAX_WORDS = 50, 100_000
_G_MIN_MWL, _G_MAX_MWL = 3.0, 10.0
_G_MIN_ALPHA_FRAC = 0.80
_G_MAX_HASH_RATIO = 0.10
_G_MIN_STOP_HITS = 2
_G_STOPWORDS = ("the", "and", "of", "to", "in", "is", "a")

_GOPHER_SQL = f"""
WITH feat AS (
  SELECT doc_id,
         len(tokens) AS n_words,
         list_aggregate(list_transform(tokens, t -> len(t)), 'sum')
           * 1.0 / NULLIF(len(tokens), 0) AS mean_word_len,
         len(list_filter(tokens, t -> regexp_matches(t, '[A-Za-z]')))
           * 1.0 / NULLIF(len(tokens), 0) AS alpha_word_frac,
         (LENGTH(text) - LENGTH(replace(text, '#', '')))
           * 1.0 / NULLIF(len(tokens), 0) AS hash_word_ratio,
         len(list_filter(tokens, t -> t IN {_G_STOPWORDS})) AS stop_hits
  FROM (SELECT doc_id, text, string_split(text, ' ') AS tokens FROM documents) t
)
SELECT doc_id, n_words, mean_word_len, alpha_word_frac, hash_word_ratio, stop_hits,
       (n_words BETWEEN {_G_MIN_WORDS} AND {_G_MAX_WORDS}) AS ok_words,
       (mean_word_len BETWEEN {_G_MIN_MWL} AND {_G_MAX_MWL}) AS ok_mwl,
       (alpha_word_frac >= {_G_MIN_ALPHA_FRAC}) AS ok_alpha,
       (hash_word_ratio <= {_G_MAX_HASH_RATIO}) AS ok_symbols,
       (stop_hits >= {_G_MIN_STOP_HITS}) AS ok_stopwords,
       ((n_words BETWEEN {_G_MIN_WORDS} AND {_G_MAX_WORDS})
        AND (mean_word_len BETWEEN {_G_MIN_MWL} AND {_G_MAX_MWL})
        AND (alpha_word_frac >= {_G_MIN_ALPHA_FRAC})
        AND (hash_word_ratio <= {_G_MAX_HASH_RATIO})
        AND (stop_hits >= {_G_MIN_STOP_HITS})) AS keep
FROM feat
"""


@query("gopher_quality_filter", _GOPHER_SQL)
def gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-composite document filter in the Gopher/MassiveText style:
    per-rule flags + final keep, all native expressions (token features
    are materialized columns — higher-order lambdas re-evaluate inline
    subtrees per element)."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    t = d.select("doc_id", "text", F.split("text", " ").alias("tokens"))
    n_words = F.size("tokens")
    feat = t.select(
        "doc_id",
        n_words.alias("n_words"),
        (
            F.aggregate(F.transform("tokens", F.length), F.lit(0), lambda a, x: a + x)
            * 1.0 / F.nullif(n_words, F.lit(0))
        ).alias("mean_word_len"),
        (
            F.size(F.filter("tokens", lambda x: x.rlike("[A-Za-z]")))
            * 1.0 / F.nullif(n_words, F.lit(0))
        ).alias("alpha_word_frac"),
        (
            (F.length("text") - F.length(F.replace(F.col("text"), F.lit("#"), F.lit(""))))
            * 1.0 / F.nullif(n_words, F.lit(0))
        ).alias("hash_word_ratio"),
        F.size(
            F.filter("tokens", lambda x: x.isin(*_G_STOPWORDS))
        ).alias("stop_hits"),
    )
    ok_words = F.col("n_words").between(_G_MIN_WORDS, _G_MAX_WORDS)
    ok_mwl = F.col("mean_word_len").between(_G_MIN_MWL, _G_MAX_MWL)
    ok_alpha = F.col("alpha_word_frac") >= _G_MIN_ALPHA_FRAC
    ok_symbols = F.col("hash_word_ratio") <= _G_MAX_HASH_RATIO
    ok_stop = F.col("stop_hits") >= _G_MIN_STOP_HITS
    return feat.select(
        "*",
        ok_words.alias("ok_words"),
        ok_mwl.alias("ok_mwl"),
        ok_alpha.alias("ok_alpha"),
        ok_symbols.alias("ok_symbols"),
        ok_stop.alias("ok_stopwords"),
        (ok_words & ok_mwl & ok_alpha & ok_symbols & ok_stop).alias("keep"),
    )


# --- token rarity (IDF-style) scoring ------------------------------------

_RARITY_SQL = """
WITH ex AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), dfreq AS (
  SELECT token, COUNT(DISTINCT doc_id) AS df FROM ex GROUP BY token
)
SELECT e.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CAST(CAST(1.0 AS DOUBLE) / d.df AS DECIMAL(18,12)))
            AS DOUBLE) AS rarity_score
FROM ex e JOIN dfreq d ON d.token = e.token
GROUP BY e.doc_id
"""


@query("token_rarity_score", _RARITY_SQL)
def token_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDF-style document scoring: each token occurrence contributes the
    inverse of its document frequency, so rare-vocabulary documents score
    high — the TF-IDF signal without the transcendental (log), which
    keeps the score bit-identical across engines AND partitionings: the
    per-token double 1/df is cast to exact DECIMAL before the sum (no
    float accumulation order). Two shuffles: token df (partial-agg
    count-distinct) and the per-doc sum; the df table joins on the
    exploded tokens — Zipf-skewed, handled by AQE skew-join at scale."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    ex = d.select(
        "doc_id", F.explode_outer(F.split("text", " ")).alias("token")
    ).filter(F.col("token").isNotNull())
    dfreq = ex.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    contrib = (F.lit(1.0) / F.col("df")).cast("decimal(18,12)")
    return (
        ex.join(dfreq, "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(contrib).cast("double").alias("rarity_score"),
        )
    )


# --- TF-IDF-style distinctive terms (integer-rank form) ------------------

_DISTINCT_TERMS_K = 3

# rank by (tf DESC, df ASC, term ASC): the same ordering TF-IDF induces
# for a fixed doc (tf up, idf monotonically down in df) but computed on
# integers only — no log/float, so the oracle is exact and the ranking
# has a total order (term tiebreak), deterministic across engines.
_DISTINCT_TERMS_SQL = f"""
WITH ex AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM ex WHERE term != '' GROUP BY doc_id, term
), df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
), ranked AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rank
  FROM tf JOIN df USING (term)
)
SELECT doc_id, term, tf, df, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {_DISTINCT_TERMS_K}
"""


@query("doc_distinctive_terms", _DISTINCT_TERMS_SQL)
def doc_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_DISTINCT_TERMS_K} distinctive terms per document — keyword
    extraction for corpus exploration/labeling. TF-IDF's ordering on
    integer (tf, df) pairs, no floats: frequent-in-doc wins, common-in-
    corpus loses, term string breaks ties.

    Scale shape: the tf aggregate shuffles once on (doc_id, term); the
    df aggregate reduces tf (already per-term) map-side; the df table
    is vocabulary-sized, so AQE broadcasts it back onto tf; the top-k
    window shuffles by doc_id only. No corpus self-joins."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    from fastetl_spark.checkpointing import materialize

    ex = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    # tf feeds BOTH the df aggregate and the join: materialize it so the
    # corpus is tokenized once, not once per consumer
    tf = ex.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")).transform(
        materialize
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("term")
    )
    return (
        tf.join(df, on="term")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _DISTINCT_TERMS_K)
        .select("doc_id", "term", "tf", "df", "rank")
    )


# --- HTML -> text extraction (web-corpus ingestion) ----------------------


def html_to_text(html):
    """Plain-text extraction from an HTML column, entirely as native
    regexp expressions (JVM-side, RE2-compatible patterns so the DuckDB
    oracle can run the SAME regexes): drop script/style blocks whole,
    turn every remaining tag into a space, decode the common entities,
    collapse whitespace. The web-pipeline ingestion step that precedes
    every text-quality/dedup operator when the corpus arrives as HTML.
    (Real-world extraction adds DOM heuristics — this is the scalable
    regex tier, not a DOM parser.)"""
    out = F.regexp_replace(html, r"(?s)<script\b.*?</script>", " ")
    out = F.regexp_replace(out, r"(?s)<style\b.*?</style>", " ")
    out = F.regexp_replace(out, r"<[^>]+>", " ")
    for ent, ch in [
        ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", "\""), ("&#39;", "'"), ("&copy;", "©"),
        ("&nbsp;", " "),
    ]:
        out = F.regexp_replace(out, ent, ch)
    return F.trim(F.regexp_replace(out, r"\s+", " "))


_HTML_EXTRACT_SQL = r"""
WITH pages AS (
  SELECT doc_id,
         '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
         || '</title><script>var x = 1 &amp;&amp; 2;</script>'
         || '<style>.nav { color: red; }</style></head>'
         || '<body><nav>Home | About</nav><p>' || text
         || '</p><footer>&copy; 2024 Example &amp; Co.</footer></body></html>'
           AS html
  FROM documents
), s1 AS (
  SELECT doc_id, regexp_replace(html, '(?s)<script\b.*?</script>', ' ', 'g') AS t FROM pages
), s2 AS (
  SELECT doc_id, regexp_replace(t, '(?s)<style\b.*?</style>', ' ', 'g') AS t FROM s1
), s3 AS (
  SELECT doc_id, regexp_replace(t, '<[^>]+>', ' ', 'g') AS t FROM s2
), s4 AS (
  SELECT doc_id,
         replace(replace(replace(replace(replace(replace(replace(t,
           '&amp;', '&'), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
           '&#39;', ''''), '&copy;', chr(169)), '&nbsp;', ' ') AS t
  FROM s3
)
SELECT doc_id, trim(regexp_replace(t, '\s+', ' ', 'g')) AS extracted
FROM s4
"""


@query("html_text_extract", _HTML_EXTRACT_SQL)
def html_text_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """html_to_text under the gate: each document is wrapped in a
    deterministic HTML shell (title + script + style + nav/footer
    boilerplate with entities — the fixture has no real HTML, so the
    wrapping IS the fixture, like video_frame_sample's durations), then
    extracted back to plain text. The DuckDB oracle runs the same
    regex/entity chain, so tag-stripping, block-removal and entity
    decoding are all hash-verified."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</title><script>var x = 1 &amp;&amp; 2;</script>"),
        F.lit("<style>.nav { color: red; }</style></head>"),
        F.lit("<body><nav>Home | About</nav><p>"),
        F.col("text"),
        F.lit("</p><footer>&copy; 2024 Example &amp; Co.</footer></body></html>"),
    )
    return d.select("doc_id", html_to_text(html).alias("extracted"))


# --- URL hygiene: normalize, domain extraction, per-domain caps ----------

_DOMAIN_CAP = 120  # max docs kept per domain in the gated query


def url_normalize(url):
    """Canonical URL for dedup/grouping: lowercase the scheme+host,
    drop the fragment, strip tracking parameters (utm_*, fbclid,
    gclid), and drop a trailing '?' left behind — regex-only
    (RE2-compatible), shared verbatim with the DuckDB oracle."""
    out = F.regexp_replace(url, r"#.*$", "")
    # tracking params after the first parameter: drop them with their '&'
    out = F.regexp_replace(out, r"&(utm_[a-z]+|fbclid|gclid)=[^&#]*", "")
    # tracking param in first position: drop it, promoting the next param
    out = F.regexp_replace(out, r"\?(utm_[a-z]+|fbclid|gclid)=[^&#]*&?", "?")
    out = F.regexp_replace(out, r"[?&]+$", "")
    # lowercase scheme://host only (path/query stay case-sensitive)
    host = F.lower(F.regexp_extract(out, r"^(https?://[^/]+)", 1))
    rest = F.regexp_replace(out, r"^https?://[^/]+", "")
    return F.concat(host, rest)


def url_domain(url):
    """Registered domain-ish key: the host with a leading 'www.'
    stripped (true eTLD+1 needs the public-suffix list — out of scope;
    the cap/grouping mechanics are identical)."""
    host = F.lower(F.regexp_extract(url, r"https?://([^/]+)", 1))
    return F.regexp_replace(host, r"^www\.", "")


_URL_CAPS_SQL = f"""
WITH pages AS (
  SELECT doc_id,
         'https://WWW.' || upper(source) || '.example.com/docs/'
         || CAST(doc_id AS VARCHAR)
         || CASE WHEN doc_id % 2 = 0
              THEN '?utm_source=feed&ref=' || CAST(doc_id % 7 AS VARCHAR)
              ELSE '?ref=' || CAST(doc_id % 7 AS VARCHAR)
                   || '&utm_medium=mail&gclid=g' || CAST(doc_id % 3 AS VARCHAR)
            END
         || '#sec' AS url
  FROM documents
), s1 AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           url, '#.*$', '', 'g'),
           '&(utm_[a-z]+|fbclid|gclid)=[^&#]*', '', 'g'),
           '\\?(utm_[a-z]+|fbclid|gclid)=[^&#]*&?', '?', 'g'),
           '[?&]+$', '', 'g') AS u
  FROM pages
), norm AS (
  SELECT doc_id,
         lower(regexp_extract(u, '^(https?://[^/]+)', 1))
         || u[len(regexp_extract(u, '^(https?://[^/]+)', 1))+1:] AS norm_url
  FROM s1
), dom AS (
  SELECT doc_id, norm_url,
         regexp_replace(regexp_extract(norm_url, 'https?://([^/]+)', 1),
                        '^www\\.', '') AS domain
  FROM norm
), ranked AS (
  SELECT doc_id, norm_url, domain,
         row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY domain) AS domain_docs
  FROM dom
)
SELECT doc_id, norm_url, domain, CAST(domain_docs AS BIGINT) AS domain_docs,
       rn <= {_DOMAIN_CAP} AS kept
FROM ranked
"""


@query("url_domain_caps", _URL_CAPS_SQL)
def url_domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL hygiene under the gate: deterministic synthetic URLs (the
    fixture has none — the construction IS the fixture, as in
    html_text_extract), normalized (fragment + tracking params gone,
    host lowercased), grouped by www-stripped domain, and capped at
    {_DOMAIN_CAP} docs per domain by deterministic doc_id order — the
    per-domain quota every web-crawl curation pass applies so one host
    cannot dominate the corpus. Oracle re-derives normalization,
    domain, counts and the keep flag."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    qs = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(F.lit("?utm_source=feed&ref="), (F.col("doc_id") % 7).cast("string")),
    ).otherwise(
        F.concat(
            F.lit("?ref="),
            (F.col("doc_id") % 7).cast("string"),
            F.lit("&utm_medium=mail&gclid=g"),
            (F.col("doc_id") % 3).cast("string"),
        )
    )
    url = F.concat(
        F.lit("https://WWW."),
        F.upper(F.col("source")),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        qs,
        F.lit("#sec"),
    )
    from pyspark.sql.window import Window

    pages = d.select("doc_id", url_normalize(url).alias("norm_url"))
    pages = pages.withColumn("domain", url_domain(F.col("norm_url")))
    w = Window.partitionBy("domain").orderBy("doc_id")
    wc = Window.partitionBy("domain")
    return (
        pages.withColumn("rn", F.row_number().over(w))
        .withColumn("domain_docs", F.count(F.lit(1)).over(wc))
        .select(
            "doc_id",
            "norm_url",
            "domain",
            "domain_docs",
            (F.col("rn") <= _DOMAIN_CAP).alias("kept"),
        )
    )


# --- unigram surprisal (perplexity-proxy quality score) ------------------

_SURPRISAL_SQL = """
WITH tok AS (
  SELECT doc_id, pos, term FROM (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS term,
           generate_subscripts(string_split(text, ' '), 1) AS pos
    FROM documents) t
  WHERE term != ''
), counts AS (
  SELECT term, COUNT(*) AS cnt FROM tok GROUP BY term
), tot AS (
  SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM counts
), j AS (
  SELECT t.doc_id, t.pos, ln(CAST(c.cnt AS DOUBLE)) AS lnc
  FROM tok t JOIN counts c USING (term)
), agg AS (
  SELECT doc_id, COUNT(*) AS n_tokens,
         list_sum(list(lnc ORDER BY pos)) AS sum_lnc
  FROM j GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       ROUND(ln((SELECT total FROM tot)) - sum_lnc / n_tokens, 6)
         AS avg_surprisal_nats
FROM agg
"""


@query("unigram_surprisal", _SURPRISAL_SQL)
def unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality score from the corpus's OWN unigram
    model: avg per-token surprisal ln(total) - mean(ln(count)) — high
    = rare-token-heavy (gibberish or niche), low = stopword soup. The
    KenLM-filter pattern with the n-gram LM replaced by the exact
    corpus unigram table, so it runs as two aggregations and a join at
    any scale. Oracle-exact despite the floats: per-token ln() values
    are folded in POSITION order on both engines (array_sort fold here,
    list(... ORDER BY pos) there), so the only cross-engine residue is
    the last ulp of ln(), absorbed by round-6 (the char_entropy
    technique)."""
    from pyspark.sql.functions import broadcast as _bc

    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    tok = (
        d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "term"))
        .filter(F.col("term") != "")
        .transform(materialize)  # feeds counts AND the join: tokenize once
    )
    counts = tok.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").cast("double").alias("total"))
    j = tok.join(counts, "term").select(
        "doc_id", "pos", F.log(F.col("cnt").cast("double")).alias("lnc")
    )
    agg = j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("pos", "lnc"))),
            F.lit(0.0),
            lambda a, s: a + s["lnc"],
        ).alias("sum_lnc"),
    )
    return agg.crossJoin(_bc(total)).select(
        "doc_id",
        "n_tokens",
        F.round(
            F.log(F.col("total")) - F.col("sum_lnc") / F.col("n_tokens"), 6
        ).alias("avg_surprisal_nats"),
    )


# --- link extraction (link-graph ingestion) -------------------------------

_LINKS_SQL = """
WITH pages AS (
  SELECT doc_id,
         '<p>' || text || '</p>'
         || '<a href="https://' || source || '.example.com/docs/'
         || CAST((doc_id + 1) % 1000 AS VARCHAR) || '">next</a>'
         || '<a href="https://' || source || '.example.com/docs/'
         || CAST(doc_id % 20 AS VARCHAR) || '">hub</a>'
         || $a$<a href='https://partner.org/ref?id=$a$
         || CAST(doc_id % 97 AS VARCHAR) || $a$'>partner</a>$a$ AS html,
         source
  FROM documents
), links AS (
  SELECT doc_id, source,
         unnest(regexp_extract_all(html, $re$<a[^>]*href=["']([^"']+)["']$re$, 1)) AS href,
         generate_subscripts(regexp_extract_all(html, $re$<a[^>]*href=["']([^"']+)["']$re$, 1), 1) AS ord1
  FROM pages
)
SELECT doc_id, CAST(ord1 - 1 AS INT) AS ord, href,
       regexp_extract(href, 'https?://([^/]+)', 1) AS link_domain,
       regexp_extract(href, 'https?://([^/]+)', 1)
         = source || '.example.com' AS is_internal
FROM links
"""


@query("html_link_extract", _LINKS_SQL)
def html_link_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor extraction under the gate — the step that turns a crawled
    page into link-graph edges (feeding CC/PageRank-style analyses and
    per-domain outlink policies). regexp_extract_all pulls every href
    (single- or double-quoted), posexplode keeps the in-page order, and
    each edge is tagged with its target domain and whether it stays on
    the page's own host. Deterministic synthetic anchors wrap the
    fixture docs (which have no HTML), as in html_text_extract."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    html = F.concat(
        F.lit("<p>"), F.col("text"), F.lit("</p>"),
        F.lit('<a href="https://'), F.col("source"),
        F.lit(".example.com/docs/"),
        ((F.col("doc_id") + 1) % 1000).cast("string"),
        F.lit('">next</a>'),
        # the hub anchor: doc_id % 20 shares the page's source class, so
        # it RESOLVES against the corpus — it is what gives the
        # downstream link graph (graph.resolved_link_edges) real edges
        # with hub-skewed in-degrees
        F.lit('<a href="https://'), F.col("source"),
        F.lit(".example.com/docs/"),
        (F.col("doc_id") % 20).cast("string"),
        F.lit('">hub</a>'),
        F.lit("<a href='https://partner.org/ref?id="),
        (F.col("doc_id") % 97).cast("string"),
        F.lit("'>partner</a>"),
    )
    pattern = """<a[^>]*href=["']([^"']+)["']"""
    links = d.select(
        "doc_id",
        "source",
        F.posexplode(F.regexp_extract_all(html, F.lit(pattern), F.lit(1))).alias(
            "ord", "href"
        ),
    )
    domain = F.regexp_extract(F.col("href"), r"https?://([^/]+)", 1)
    return links.select(
        "doc_id",
        "ord",
        "href",
        domain.alias("link_domain"),
        (domain == F.concat(F.col("source"), F.lit(".example.com"))).alias(
            "is_internal"
        ),
    )


# --- bigram conditional surprisal (2-gram LM score) -----------------------

_BIGRAM_SURPRISAL_SQL = """
WITH tok AS (
  SELECT doc_id, pos, term FROM (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS term,
           generate_subscripts(string_split(text, ' '), 1) AS pos
    FROM documents) t
  WHERE term != ''
), big AS (
  SELECT doc_id, pos, term,
         LAG(term) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM tok
), pairs AS (
  SELECT doc_id, pos, prev || ' ' || term AS bigram, prev
  FROM big WHERE prev IS NOT NULL
), bcnt AS (
  SELECT bigram, COUNT(*) AS bc FROM pairs GROUP BY bigram
), ucnt AS (
  SELECT term, COUNT(*) AS uc FROM tok GROUP BY term
), j AS (
  SELECT p.doc_id, p.pos,
         ln(CAST(u.uc AS DOUBLE)) - ln(CAST(b.bc AS DOUBLE)) AS nats
  FROM pairs p
  JOIN bcnt b USING (bigram)
  JOIN ucnt u ON u.term = p.prev
), agg AS (
  SELECT doc_id, COUNT(*) AS n_bigrams,
         list_sum(list(nats ORDER BY pos)) AS sum_nats
  FROM j GROUP BY doc_id
)
SELECT doc_id, n_bigrams,
       ROUND(sum_nats / n_bigrams, 6) AS avg_cond_surprisal_nats
FROM agg
"""


@query("bigram_surprisal", _BIGRAM_SURPRISAL_SQL)
def bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-gram conditional surprisal: mean over positions of
    -ln(count(w_{i-1} w_i) / count(w_{i-1})) — the corpus's own backoff-
    free bigram LM, sharpening unigram_surprisal with word-order
    signal (shuffled text scores high here even when its unigram mix is
    normal). Same exactness recipe: counts are exact integers, the
    per-position ln() differences fold in POSITION order on both
    engines, round-6 absorbs the last ulp of ln()."""
    from pyspark.sql.window import Window

    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    tok = (
        d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "term"))
        .filter(F.col("term") != "")
        .transform(materialize)  # feeds unigram counts, bigram pairs, join
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    pairs = (
        tok.withColumn("prev", F.lag("term").over(w))
        .filter(F.col("prev").isNotNull())
        .select(
            "doc_id",
            "pos",
            F.concat_ws(" ", "prev", "term").alias("bigram"),
            "prev",
        )
        .transform(materialize)  # feeds bigram counts AND the join
    )
    bcnt = pairs.groupBy("bigram").agg(F.count(F.lit(1)).alias("bc"))
    ucnt = tok.groupBy("term").agg(F.count(F.lit(1)).alias("uc"))
    j = (
        pairs.join(bcnt, "bigram")
        .join(ucnt, pairs.prev == ucnt.term)
        .select(
            "doc_id",
            "pos",
            (
                F.log(F.col("uc").cast("double"))
                - F.log(F.col("bc").cast("double"))
            ).alias("nats"),
        )
    )
    agg = j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("pos", "nats"))),
            F.lit(0.0),
            lambda a, s: a + s["nats"],
        ).alias("sum_nats"),
    )
    return agg.select(
        "doc_id",
        "n_bigrams",
        F.round(F.col("sum_nats") / F.col("n_bigrams"), 6).alias(
            "avg_cond_surprisal_nats"
        ),
    )
