"""Corpus curation operators — the selection/cleanup stages that sit
between dedup and training-set export in an LLM data pipeline:

- cluster-canonical selection: after near-dup clustering, keep the BEST
  document per cluster (quality argmax), not the min-id one;
- token-budget head: quality-ordered prefix of the corpus under a global
  token budget, computed with a two-phase distributed cumulative sum
  (no single-partition global window — the usual scale trap);
- boilerplate flagging: documents dominated by corpus-frequent shingles;
- corpus-level bigram stats (top-k collocations).

No counterpart in the reference (its dedup is PK-only,
patchwork.py:380-412); these extend SURVEY §2's LLM-data north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fastetl_spark.checkpointing import materialize
from fastetl_spark.io.readers import ensure_parallelism, read_table
from fastetl_spark.operators.dedup import (
    _COMPONENTS_CTES_SQL,
    resolve_doc_components,
    word_shingles,
)
from fastetl_spark.registry import query

_STOPWORDS = ("the", "and", "of", "to", "in", "is", "a")

# --- cluster-canonical selection by quality ------------------------------

_BEST_SQL = f"""
WITH RECURSIVE {_COMPONENTS_CTES_SQL},
feat AS (
  SELECT doc_id, len(tokens) AS n_words,
         len(list_filter(tokens, t -> t IN {_STOPWORDS})) AS stop_hits
  FROM (SELECT doc_id, string_split(text, ' ') AS tokens FROM documents) t
)
SELECT c.doc_id, c.component, f.n_words, f.stop_hits,
       ROW_NUMBER() OVER (
         PARTITION BY c.component
         ORDER BY f.stop_hits DESC, f.n_words DESC, c.doc_id
       ) = 1 AS is_canonical
FROM comp c JOIN feat f ON f.doc_id = c.doc_id
"""


@query("cluster_canonical_best_quality", _BEST_SQL)
def cluster_canonical_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical selection AFTER clustering: each near-dup component keeps
    its highest-quality member (stopword evidence, then length, doc_id as
    the total-order tie-break) — what a real pipeline does instead of
    "keep lowest id". The rank window partitions by component, so no
    global sort; quality features are integers end-to-end
    (deterministic across engines)."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    comp = resolve_doc_components(d)
    toks = d.select("doc_id", F.split("text", " ").alias("tokens"))
    feat = toks.select(
        "doc_id",
        F.size("tokens").alias("n_words"),
        F.size(F.filter("tokens", lambda x: x.isin(*_STOPWORDS))).alias("stop_hits"),
    )
    w = Window.partitionBy("component").orderBy(
        F.desc("stop_hits"), F.desc("n_words"), F.asc("doc_id")
    )
    return (
        comp.join(feat, "doc_id")
        .select(
            "doc_id", "component", "n_words", "stop_hits",
            (F.row_number().over(w) == 1).alias("is_canonical"),
        )
    )


# --- token-budget head selection -----------------------------------------

_TOKEN_BUDGET = 20_000  # words
_BUDGET_PARTITIONS = 8

_BUDGET_SQL = f"""
WITH feat AS (
  SELECT doc_id, len(tokens) AS n_words,
         len(list_filter(tokens, t -> t IN {_STOPWORDS})) AS stop_hits
  FROM (SELECT doc_id, string_split(text, ' ') AS tokens FROM documents) t
), ranked AS (
  SELECT doc_id, stop_hits, n_words,
         CAST(SUM(n_words) OVER (ORDER BY stop_hits DESC, doc_id) AS BIGINT)
           AS cum_words
  FROM feat
)
SELECT doc_id, stop_hits, n_words, cum_words
FROM ranked WHERE cum_words <= {_TOKEN_BUDGET}
"""


@query("token_budget_head", _BUDGET_SQL)
def token_budget_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ordered corpus prefix under a global token budget ("take
    the best documents until N tokens") — the subset-selection step of a
    data-mixing pipeline.

    The running sum is a TWO-PHASE distributed cumulative sum, not a
    global-order window (which Catalyst executes on a single partition —
    the classic scale trap): range-repartition on the priority key, local
    cumsum per partition, then per-partition totals (one tiny row per
    partition) prefix-summed on the driver and joined back as offsets.
    Shuffle volume is one range exchange of (id, two ints); the global
    window would funnel the whole corpus through one task."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    toks = d.select("doc_id", F.split("text", " ").alias("tokens"))
    feat = toks.select(
        "doc_id",
        F.size("tokens").alias("n_words"),
        F.size(F.filter("tokens", lambda x: x.isin(*_STOPWORDS))).alias("stop_hits"),
    )
    ranged = feat.repartitionByRange(
        _BUDGET_PARTITIONS, F.desc("stop_hits"), F.asc("doc_id")
    ).withColumn("pid", F.spark_partition_id())
    local_w = (
        Window.partitionBy("pid")
        .orderBy(F.desc("stop_hits"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("local_cum", F.sum("n_words").over(local_w)).transform(materialize)
    totals = {
        r["pid"]: r["t"]
        for r in local.groupBy("pid").agg(F.sum("n_words").alias("t")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(totals):
        offsets.append((pid, acc))
        acc += totals[pid]
    off_df = spark.createDataFrame(offsets, "pid int, offset long")
    return (
        local.join(F.broadcast(off_df), "pid")
        .select(
            "doc_id", "stop_hits", "n_words",
            (F.col("local_cum") + F.col("offset")).alias("cum_words"),
        )
        .filter(F.col("cum_words") <= _TOKEN_BUDGET)
    )


# --- boilerplate shingle flagging ----------------------------------------

_BP_DF_MIN = 20  # shingle is "boilerplate" if it appears in >= this many docs
_BP_FRAC = 0.5  # doc is flagged if more than this fraction of its shingles are

_BOILERPLATE_SQL = f"""
WITH shingled AS (
  SELECT doc_id,
         CASE WHEN len(tokens) >= 3
              THEN list_distinct(list_transform(
                     generate_series(1, len(tokens) - 2),
                     i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2])))
              ELSE [] END AS shingles
  FROM (SELECT doc_id, string_split(text, ' ') AS tokens FROM documents) t
), exploded AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM shingled
), freq AS (
  SELECT shingle FROM exploded GROUP BY shingle
  HAVING COUNT(*) >= {_BP_DF_MIN}
), per_doc AS (
  SELECT e.doc_id, COUNT(*) AS n_frequent
  FROM exploded e JOIN freq f ON e.shingle = f.shingle
  GROUP BY e.doc_id
)
SELECT s.doc_id, len(s.shingles) AS n_shingles,
       COALESCE(p.n_frequent, 0) AS n_frequent,
       COALESCE(p.n_frequent, 0) * 1.0 / NULLIF(len(s.shingles), 0)
         AS boilerplate_frac,
       COALESCE(p.n_frequent, 0) * 1.0 / NULLIF(len(s.shingles), 0)
         > {_BP_FRAC} AS flagged
FROM shingled s LEFT JOIN per_doc p ON p.doc_id = s.doc_id
"""


@query("boilerplate_ngram_flags", _BOILERPLATE_SQL)
def boilerplate_ngram_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detector: fraction of a document's shingles that are
    corpus-frequent (document frequency >= {_BP_DF_MIN}); high-fraction
    docs are template/boilerplate pages. Shares the shingle-explode shape
    with ngram-Jaccard dedup — one explode feeds a groupBy(shingle)
    document-frequency count; only (shingle, doc_id) pairs shuffle, never
    text bodies. At 100 TB the df table is Zipf-shaped and tiny after the
    HAVING cut, so the flag join broadcasts."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    toks = d.select("doc_id", F.split("text", " ").alias("tokens"))
    sh = toks.select(
        "doc_id", word_shingles(F.col("tokens"), 3).alias("shingles")
    ).transform(materialize)
    ex = sh.select(
        "doc_id", F.explode_outer("shingles").alias("shingle")
    ).filter(F.col("shingle").isNotNull())
    freq = (
        ex.groupBy("shingle").agg(F.count("*").alias("df"))
        .filter(F.col("df") >= _BP_DF_MIN)
        .select("shingle")
    )
    per_doc = (
        ex.join(F.broadcast(freq), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_frequent"))
    )
    n_freq = F.coalesce(F.col("n_frequent"), F.lit(0))
    frac = n_freq * 1.0 / F.nullif(F.size("shingles"), F.lit(0))
    return (
        sh.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.size("shingles").alias("n_shingles"),
            n_freq.alias("n_frequent"),
            frac.alias("boilerplate_frac"),
            (frac > _BP_FRAC).alias("flagged"),
        )
    )


# --- corpus bigram top-k -------------------------------------------------

_BIGRAM_K = 50

_BIGRAM_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
), bigrams AS (
  SELECT unnest(list_transform(
           generate_series(1, len(tokens) - 1),
           i -> concat_ws(' ', tokens[i], tokens[i+1]))) AS bigram
  FROM t WHERE len(tokens) >= 2
)
SELECT bigram, COUNT(*) AS n
FROM bigrams GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT {_BIGRAM_K}
"""


@query("bigram_topk", _BIGRAM_SQL)
def bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-{_BIGRAM_K} bigram collocations — the vocabulary/
    collocation profiling step of corpus analysis. One explode + one
    groupBy(bigram) with map-side partial aggregation; the top-k is a
    TakeOrderedAndProject (per-partition heaps + driver merge of k rows),
    not a global sort. Tie-break on the bigram string makes the cutoff
    deterministic."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    toks = d.select(F.split("text", " ").alias("tokens")).filter(F.size("tokens") >= 2)
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("tokens") - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(F.col("tokens"), i), F.element_at(F.col("tokens"), i + 1)
        ),
    )
    return (
        toks.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(_BIGRAM_K)
    )


# --- cross-document exact substring spans --------------------------------

_SUB_WIN = 64  # chars per window
_SUB_STRIDE = 32  # window stride

_SUBSTR_SQL = f"""
WITH wins AS (
  SELECT doc_id,
         unnest(generate_series(1, LENGTH(text) - {_SUB_WIN} + 1, {_SUB_STRIDE}))
           AS pos,
         text
  FROM documents
  WHERE LENGTH(text) >= {_SUB_WIN}
), hashed AS (
  SELECT doc_id, pos, md5(SUBSTR(text, pos, {_SUB_WIN})) AS h FROM wins
)
SELECT a.doc_id AS doc_a, a.pos AS pos_a, b.doc_id AS doc_b, b.pos AS pos_b
FROM hashed a JOIN hashed b
  ON a.h = b.h AND (a.doc_id < b.doc_id OR (a.doc_id = b.doc_id AND a.pos < b.pos))
"""


@query("substring_dup_spans", _SUBSTR_SQL)
def substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring duplication (the Lee-et-al "Deduplicating Training
    Data" signal, char-window variant): strided fixed-length windows are
    fingerprinted and matched across (and within) documents, yielding
    copied-span evidence with positions — the operator behind
    "remove verbatim-copied passages". Only (hash, doc_id, pos) tuples
    shuffle — never text. The equi-join on the window hash is the
    candidate generator; at 100 TB add the same document-frequency cap
    as ngram_jaccard_pairs for stopword-like boilerplate windows."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    wins = (
        d.filter(F.length("text") >= _SUB_WIN)
        .select(
            "doc_id",
            "text",
            F.explode_outer(
                F.sequence(
                    F.lit(1), F.length("text") - _SUB_WIN + 1, F.lit(_SUB_STRIDE)
                )
            ).alias("pos"),
        )
        .filter(F.col("pos").isNotNull())
    )
    hashed = wins.select(
        "doc_id", "pos", F.md5(F.substring(F.col("text"), F.col("pos"), _SUB_WIN)).alias("h")
    ).transform(materialize)
    a, b = hashed.alias("a"), hashed.alias("b")
    return a.join(
        b,
        (F.col("a.h") == F.col("b.h"))
        & (
            (F.col("a.doc_id") < F.col("b.doc_id"))
            | ((F.col("a.doc_id") == F.col("b.doc_id")) & (F.col("a.pos") < F.col("b.pos")))
        ),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("a.pos").alias("pos_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("b.pos").alias("pos_b"),
    )


# --- corpus-wide MAXIMAL repeated spans (suffix-array-style) -------------

_MSPAN_K = 8  # tokens per rolling window (the >=k repeated-span bound)

_MSPAN_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
), wins AS (
  SELECT doc_id,
         unnest(generate_series(1, len(tokens) - {_MSPAN_K} + 1)) AS pos,
         tokens
  FROM t WHERE len(tokens) >= {_MSPAN_K}
), hashed AS (
  SELECT doc_id, pos,
         md5(array_to_string(tokens[pos:pos + {_MSPAN_K - 1}], ' ')) AS h
  FROM wins
), dup AS (
  SELECT h FROM hashed GROUP BY h HAVING COUNT(*) >= 2
), hits AS (
  SELECT doc_id, pos FROM hashed WHERE h IN (SELECT h FROM dup)
), flagged AS (
  SELECT doc_id, pos,
         CASE WHEN pos > COALESCE(MAX(pos + {_MSPAN_K - 1}) OVER (
                  PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
              THEN 1 ELSE 0 END AS new_island
  FROM hits
), islands AS (
  SELECT doc_id, pos,
         SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM flagged
)
SELECT doc_id,
       CAST(MIN(pos) AS BIGINT) AS start_tok,
       CAST(MAX(pos) + {_MSPAN_K - 1} AS BIGINT) AS end_tok,
       CAST(MAX(pos) + {_MSPAN_K} - MIN(pos) AS BIGINT) AS span_len,
       CAST(COUNT(*) AS BIGINT) AS n_windows
FROM islands GROUP BY doc_id, grp
"""


def maximal_dup_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = _MSPAN_K,
) -> DataFrame:
    """Maximal repeated token spans across the corpus — the Spark-native
    shape of suffix-array training-data dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): any
    >=k-token sequence occurring at two or more positions corpus-wide
    (other documents OR elsewhere in the same one) marks its token
    interval as duplicated; overlapping/contiguous marked intervals
    merge into maximal spans per document, the exact regions a
    span-level cleaner would excise.

    Pipeline: tokenize -> k-token rolling windows with positions ->
    128-bit content fingerprint per window -> corpus-wide occurrence
    count (>=2 = repeated) -> gaps-and-islands merge (a window opens a
    new span iff its start exceeds the running max covered end + 1).

    Scale shape: only (fingerprint, doc_id, pos) tuples ever shuffle —
    never text; the occurrence count is ONE map-side-combined groupBy on
    the 16-byte fingerprint, the hit filter a semi-join on the same key,
    and the islands pass is per-document windowing (partition = doc).
    Never all-pairs: work is linear in total windows, exactly the
    suffix-array property re-expressed relationally. At 100 TB swap md5
    for xxhash64 (8 bytes) plus an equality-verify on collision groups,
    and add the ngram_jaccard-style document-frequency cap so
    boilerplate windows (licenses, headers) cannot form hot fingerprint
    keys; both keep the result set identical."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.split(F.col(text_col), " ").alias("tokens")
    ).filter(F.size("tokens") >= k)
    win_structs = F.transform(
        F.sequence(F.lit(1), F.size("tokens") - (k - 1)),
        lambda i: F.struct(
            i.alias("pos"),
            F.md5(F.concat_ws(" ", F.slice(F.col("tokens"), i, k))).alias("h"),
        ),
    )
    wins = (
        toks.select("doc_id", F.explode(win_structs).alias("w"))
        .select("doc_id", F.col("w.pos").alias("pos"), F.col("w.h").alias("h"))
        .transform(materialize)
    )
    dup = wins.groupBy("h").agg(F.count(F.lit(1)).alias("occ")).filter(
        F.col("occ") >= 2
    )
    hits = wins.join(dup.select("h"), "h", "left_semi").select("doc_id", "pos")
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = hits.withColumn(
        "new_island",
        F.when(
            F.col("pos")
            > F.coalesce(F.max(F.col("pos") + (k - 1)).over(w_prev), F.lit(-1)) + 1,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    islands = flagged.withColumn("grp", F.sum("new_island").over(w_run))
    return (
        islands.groupBy("doc_id", "grp")
        .agg(
            F.min("pos").cast("bigint").alias("start_tok"),
            (F.max("pos") + (k - 1)).cast("bigint").alias("end_tok"),
            (F.max("pos") + k - F.min("pos")).cast("bigint").alias("span_len"),
            F.count(F.lit(1)).cast("bigint").alias("n_windows"),
        )
        .select("doc_id", "start_tok", "end_tok", "span_len", "n_windows")
    )


@query("substring_dup_maximal_spans", _MSPAN_SQL)
def substring_dup_maximal_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suffix-array-style span dedup under the exact gate: every
    >={_MSPAN_K}-token repeated sequence, merged to maximal per-document
    spans with integer boundaries — see maximal_dup_spans for the
    linear-work scale argument. Complements substring_dup_spans (strided
    char-window pair EVIDENCE) with the span-removal form the published
    LLM-data technique actually applies."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    return maximal_dup_spans(d)


# --- within-document repeated-span removal -------------------------------

_SPAN_W = 8  # words per span

_INTRADOC_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
), chunked AS (
  SELECT doc_id,
         list_transform(
           generate_series(0, greatest(len(tokens) - 1, 0) // {_SPAN_W}),
           i -> array_to_string(list_slice(tokens, i * {_SPAN_W} + 1, (i + 1) * {_SPAN_W}), ' ')
         ) AS chunks
  FROM t
), marked AS (
  SELECT doc_id, chunks,
         list_filter(generate_series(1, len(chunks)),
                     i -> list_position(chunks, chunks[i]) = i) AS keep_idx
  FROM chunked
)
SELECT doc_id,
       len(chunks) AS n_spans,
       len(chunks) - len(keep_idx) AS n_removed,
       array_to_string(list_transform(keep_idx, i -> chunks[i]), ' ')
         AS cleaned_text
FROM marked
"""


@query("dedup_intra_doc_spans", _INTRADOC_SQL)
def dedup_intra_doc_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition removal: the text is cut into
    fixed-width word spans and only each span's FIRST occurrence
    survives, reassembled in order — the intra-document half of
    boilerplate cleanup (substring_dup_spans covers the cross-document
    half). Entirely per-row array expressions: a narrow map over the
    scan, no shuffle at any scale."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    t = d.select("doc_id", F.split("text", " ").alias("tokens"))
    chunks = F.transform(
        F.sequence(
            F.lit(0), F.floor(F.greatest(F.size("tokens") - 1, F.lit(0)) / _SPAN_W).cast("int")
        ),
        lambda i: F.array_join(F.slice(F.col("tokens"), i * _SPAN_W + 1, _SPAN_W), " "),
    )
    c = t.select("doc_id", chunks.alias("chunks"))
    keep_idx = F.filter(
        F.sequence(F.lit(1), F.size("chunks")),
        lambda i: F.array_position(F.col("chunks"), F.element_at(F.col("chunks"), i)) == i.cast("long"),
    )
    m = c.select("doc_id", "chunks", keep_idx.alias("keep_idx"))
    return m.select(
        "doc_id",
        F.size("chunks").alias("n_spans"),
        (F.size("chunks") - F.size("keep_idx")).alias("n_removed"),
        F.array_join(
            F.transform("keep_idx", lambda i: F.element_at(F.col("chunks"), i)), " "
        ).alias("cleaned_text"),
    )


# --- benchmark decontamination (n-gram overlap vs an eval set) ------------

# The decontamination pass every serious training pipeline runs before
# export (GPT-3 appendix C / Dolma: drop training docs sharing long
# n-grams with evaluation benchmarks). The eval set here is a held-out
# slice of the corpus itself (doc_id % _DECON_MOD == 0) so the gate is
# self-contained; the production core takes ANY eval frame.
_DECON_N = 8  # n-gram length: long enough that overlap means leakage
_DECON_MOD = 97
_DECON_THRESH = 1  # >=1 shared 8-gram flags the doc

_DECON_SQL = f"""
WITH ev AS (
  SELECT DISTINCT unnest(g) AS gram FROM (
    SELECT list_transform(
             generate_series(1, greatest(len(string_split(text, ' ')) - {_DECON_N - 1}, 0)),
             i -> array_to_string(string_split(text, ' ')[i : i + {_DECON_N - 1}], ' ')
           ) AS g
    FROM documents WHERE doc_id % {_DECON_MOD} = 0
  )
), tr AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           generate_series(1, greatest(len(string_split(text, ' ')) - {_DECON_N - 1}, 0)),
           i -> array_to_string(string_split(text, ' ')[i : i + {_DECON_N - 1}], ' ')
         ))) AS gram
  FROM documents WHERE doc_id % {_DECON_MOD} <> 0
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_grams FROM tr GROUP BY 1
), hits AS (
  SELECT t.doc_id, COUNT(*) AS n_hits
  FROM tr t JOIN ev e ON e.gram = t.gram
  GROUP BY 1
)
SELECT s.doc_id, s.n_grams::BIGINT AS n_grams,
       COALESCE(h.n_hits, 0)::BIGINT AS n_hits,
       COALESCE(h.n_hits, 0) >= {_DECON_THRESH} AS contaminated
FROM sizes s LEFT JOIN hits h ON h.doc_id = s.doc_id
"""


def ngram_contamination(
    train: DataFrame,
    eval_set: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = _DECON_N,
    threshold: int = _DECON_THRESH,
) -> DataFrame:
    """Benchmark decontamination: per training doc, how many of its
    DISTINCT n-word-grams also occur anywhere in the eval set, plus the
    contaminated flag (n_hits >= threshold). Returns (doc_id, n_grams,
    n_hits, contaminated) for every training doc with >= 1 gram
    (shorter docs cannot leak an n-gram and are excluded, matching the
    sizes-driven oracle).

    Scale shape: eval grams are DISTINCT'd once (eval sets are
    benchmark-sized — orders below the corpus), the overlap is one
    equi-join keyed by the gram string, and both sides are generator
    fan-outs (no corpus^2 anything). At 100 TB swap the gram string for
    xxhash64(gram) to shrink the shuffle key — same plan shape.

    r14: n_grams and n_hits come from ONE pass over the exploded
    training grams — a LEFT join against the distinct eval-gram set
    followed by a single per-doc aggregation (count(*) = grams,
    count(eval-side marker) = hits, since count skips the NULLs a
    left-join miss leaves) — where the r13 form exploded the training
    side twice (a sizes groupBy and a separate inner-join + groupBy)
    and stitched the two aggregates back with a third join. Same
    integers by construction (ev is distinct, so the left join cannot
    duplicate a training gram); hash-gated at every SF."""
    toks = F.split(F.col(text_col), " ")
    ev = (
        eval_set.select(
            F.explode(word_shingles(toks, n=n)).alias("gram")
        )
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    tr = train.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(toks, n=n)).alias("gram"),
    )
    return (
        tr.join(ev, "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("__hit").alias("n_hits"),
        )
        .select(
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("n_hits").cast("long").alias("n_hits"),
            (F.col("n_hits") >= threshold).alias("contaminated"),
        )
    )


@query("benchmark_ngram_contamination", _DECON_SQL)
def benchmark_ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination report of the corpus against its own held-out
    eval slice (doc_id % {_DECON_MOD} == 0): distinct {_DECON_N}-gram
    overlap counts per training doc, exact integers under the hash
    gate — the pre-export leakage check (GPT-3 appx C / Dolma)."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    return ngram_contamination(
        d.filter(F.col("doc_id") % _DECON_MOD != 0),
        d.filter(F.col("doc_id") % _DECON_MOD == 0),
    )
