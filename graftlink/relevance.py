"""TF-IDF term extraction and BM25 document ranking.

Training-pipeline / search layer over the documents table: per-doc
top-k characteristic terms (TF-IDF — corpus analytics, topic
labeling, near-dup triage) and query-conditioned document ranking
(BM25, Robertson-Sparck Jones idf) — the two relevance primitives a
corpus-curation stack reaches for after dedup/quality.

Scale shape:
- tokenization is one codegen'd `split(lower(text))` + explode; the
  (doc, term) tf table is ONE partial-agg groupBy (combines map-side;
  hub terms like stopwords are just big counter cells, never wide
  rows).
- document frequency is a second partial-agg groupBy on term; idf is
  a broadcast-sized table (vocabulary << corpus) joined broadcast.
- top-k per doc avoids Window: groupBy(doc) collects the BOUNDED
  per-doc term list (<= doc length, the line-dedup discipline),
  sort_array + slice in one JVM expression.
- BM25 per-doc scoring sums the per-query-term contributions with an
  ORDERED fold (sort_array over the <=|q| matched terms) so the
  double is bit-identical to the DuckDB twin's `sum(... ORDER BY
  term)` — the harmonic-centrality lesson: unordered double sums
  diverge cross-engine at the 6-dp hash.
- the final top-N is orderBy(score desc, doc_id).limit(N) —
  TakeOrderedAndProject, no global sort.

Conventions (mirrored exactly in the DuckDB twins):
- tokens: lower-cased maximal [a-z0-9]+ runs.
- tf-idf: tf * (ln((N + 1) / (df + 1)) + 1)  (smooth idf, sklearn's
  convention), N = corpus doc count.
- BM25: idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5));
  score = sum_t idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)),
  k1 = 1.2, b = 0.75 defaults.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_RE = "[^a-z0-9]+"


def _tokens(docs: DataFrame, doc_id: str, text: str) -> DataFrame:
    """DF[doc_id, term] — one row per token OCCURRENCE."""
    return (
        docs.select(
            F.col(doc_id).alias("doc_id"),
            F.explode(F.split(F.lower(F.col(text)), TOKEN_RE)).alias("term"),
        )
        .where(F.col("term") != "")
    )


def term_frequencies(
    docs: DataFrame, doc_id: str = "doc_id", text: str = "text"
) -> DataFrame:
    """DF[doc_id, term, tf] — raw counts, one partial-agg groupBy."""
    return _tokens(docs, doc_id, text).groupBy("doc_id", "term").agg(
        F.count("*").alias("tf")
    )


def doc_frequencies(
    docs: DataFrame, doc_id: str = "doc_id", text: str = "text"
) -> DataFrame:
    """DF[term, df] — number of docs containing each term."""
    return (
        _tokens(docs, doc_id, text)
        .select("doc_id", "term")
        .distinct()
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )


def tfidf_topk(
    docs: DataFrame,
    k: int = 3,
    doc_id: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """DF[doc_id, term, tfidf] — each doc's k highest-TF-IDF terms
    (ties broken by term asc, fully deterministic). Smooth-idf
    convention; see module docstring for the no-Window top-k shape."""
    tf = term_frequencies(docs, doc_id, text)
    n = docs.count()
    idf = doc_frequencies(docs, doc_id, text).select(
        "term",
        (F.log((F.lit(float(n + 1))) / (F.col("df") + 1)) + 1.0).alias("idf"),
    )
    scored = tf.join(F.broadcast(idf), "term").select(
        "doc_id", "term", (F.col("tf") * F.col("idf")).alias("tfidf")
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_list(
                        F.struct((-F.col("tfidf")).alias("_n"), "term", "tfidf")
                    )
                ),
                1,
                k,
            ).alias("top")
        )
        .select("doc_id", F.explode("top").alias("t"))
        .select("doc_id", F.col("t.term").alias("term"),
                F.round(F.col("t.tfidf"), 6).alias("tfidf"))
    )


def bm25_rank(
    docs: DataFrame,
    query: str,
    top: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    doc_id: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """DF[doc_id, score] — the `top` highest-BM25 docs for `query`
    (ties broken by doc_id asc). The per-doc sum over matched query
    terms is an ORDERED JVM fold (sorted by term), bit-identical to
    the twin's ordered SQL sum."""
    q_terms = sorted(
        {t for t in __import__("re").split(TOKEN_RE, query.lower()) if t}
    )
    if not q_terms:
        raise ValueError("query has no tokens")
    spark = docs.sparkSession
    tf = term_frequencies(docs, doc_id, text)
    n = docs.count()
    dl = _tokens(docs, doc_id, text).groupBy("doc_id").agg(
        F.count("*").alias("dl")
    )
    avgdl = dl.agg(F.avg("dl")).collect()[0][0]
    qdf = spark.createDataFrame([(t,) for t in q_terms], "term string")
    idf = (
        doc_frequencies(docs, doc_id, text)
        .join(F.broadcast(qdf), "term", "left_semi")
        .select(
            "term",
            F.log(
                1.0 + (F.lit(float(n)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ).alias("idf"),
        )
    )
    contrib = (
        tf.join(F.broadcast(idf), "term")
        .join(dl.hint("shuffle_hash"), "doc_id")
        .select(
            "doc_id",
            "term",
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (1.0 - b + F.lit(b) * F.col("dl") / F.lit(float(avgdl)))
                )
            ).alias("c"),
        )
    )
    score = (
        contrib.groupBy("doc_id")
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("term", "c"))),
                F.lit(0.0),
                lambda acc, x: acc + x["c"],
            ).alias("score")
        )
        .select("doc_id", F.round("score", 6).alias("score"))
    )
    return score.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(top)


# ---------------------------------------------------------------------------
# DuckDB twins
# ---------------------------------------------------------------------------

_TOK = """
        tok AS (
            SELECT doc_id, t AS term
            FROM {src}, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS u(t)
            WHERE t <> ''
        ),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        dfreq AS (
            SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1
        ),
        n AS (SELECT count(*) AS n FROM ({src}))
"""


def tfidf_topk_sql(source_sql: str, k: int = 3) -> str:
    tok = _TOK.format(src=f"({source_sql})")
    return f"""
        WITH
        {tok},
        scored AS (
            SELECT tf.doc_id, tf.term,
                   tf.tf * (ln(((SELECT n FROM n) + 1.0) / (dfreq.df + 1)) + 1.0)
                       AS tfidf
            FROM tf JOIN dfreq USING (term)
        ),
        ranked AS (
            SELECT doc_id, term, tfidf,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY tfidf DESC, term ASC
                   ) AS rn
            FROM scored
        )
        SELECT doc_id, term, round(tfidf, 6) AS tfidf
        FROM ranked WHERE rn <= {k}
    """


def bm25_rank_sql(
    source_sql: str,
    query: str,
    top: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    import re as _re

    q_terms = sorted({t for t in _re.split(TOKEN_RE, query.lower()) if t})
    qlist = ", ".join(f"('{t}')" for t in q_terms)
    tok = _TOK.format(src=f"({source_sql})")
    return f"""
        WITH
        {tok},
        q(term) AS (VALUES {qlist}),
        dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
        avgdl AS (SELECT avg(dl) AS avgdl FROM dl),
        idf AS (
            SELECT dfreq.term,
                   ln(1.0 + ((SELECT n FROM n) - dfreq.df + 0.5)
                          / (dfreq.df + 0.5)) AS idf
            FROM dfreq JOIN q USING (term)
        ),
        contrib AS (
            SELECT tf.doc_id, tf.term,
                   idf.idf * (tf.tf * ({k1} + 1.0))
                   / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl
                         / (SELECT avgdl FROM avgdl))) AS c
            FROM tf JOIN idf USING (term) JOIN dl USING (doc_id)
        )
        SELECT doc_id, round(sum(c ORDER BY term), 6) AS score
        FROM contrib GROUP BY doc_id
        ORDER BY score DESC, doc_id ASC LIMIT {top}
    """


def unigram_logprob(
    docs: DataFrame, doc_id: str = "doc_id", text: str = "text"
) -> DataFrame:
    """DF[id, n_tokens, logprob_per_token] — per-doc mean token
    log-likelihood under the corpus's OWN add-one-smoothed unigram
    model: p(t) = (c_t + 1) / (T + V) with c_t the corpus occurrence
    count, T total occurrences, V vocabulary size. The standard
    self-contained perplexity-proxy quality filter (the CCNet recipe
    with the external KenLM swapped for the corpus self-model —
    gibberish and boilerplate both sit in the tails of the score).

    Scale shape: the model is two partial-agg groupBys (term counts,
    then two scalars); per-token log-probs live in a broadcast-sized
    vocabulary table; the per-doc sum folds tf * ln p(t) ORDERED by
    term (BM25's cross-engine fp discipline). Tokenless docs surface
    with n_tokens=0 and score 0.0 via the final left join."""
    tf = term_frequencies(docs, doc_id, text)
    cnt = tf.groupBy("term").agg(F.sum("tf").alias("c"))
    tot = cnt.agg(
        F.sum("c").cast("double").alias("t"), F.count("*").cast("double").alias("v")
    ).collect()[0]
    t_plus_v = float(tot["t"]) + float(tot["v"])
    lp = cnt.select(
        "term", F.log((F.col("c") + 1.0) / F.lit(t_plus_v)).alias("lp")
    )
    contrib = tf.join(F.broadcast(lp), "term").select(
        "doc_id", "term", (F.col("tf") * F.col("lp")).alias("c"), "tf"
    )
    per_doc = contrib.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("term", "c"))),
            F.lit(0.0),
            lambda acc, x: acc + x["c"],
        ).alias("_s"),
    )
    return (
        docs.select(F.col(doc_id).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            F.col("doc_id").alias("id"),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.round(
                F.coalesce(F.col("_s") / F.col("n_tokens"), F.lit(0.0)), 6
            ).alias("logprob_per_token"),
        )
    )


def unigram_logprob_sql(source_sql: str) -> str:
    tok = _TOK.format(src=f"({source_sql})")
    return f"""
        WITH
        {tok},
        cnt AS (SELECT term, sum(tf) AS c FROM tf GROUP BY term),
        tot AS (
            SELECT CAST(sum(c) AS DOUBLE) AS t,
                   CAST(count(*) AS DOUBLE) AS v
            FROM cnt
        ),
        lp AS (
            SELECT term,
                   ln((c + 1.0) / ((SELECT t FROM tot) + (SELECT v FROM tot)))
                       AS lp
            FROM cnt
        ),
        contrib AS (
            SELECT tf.doc_id, tf.term, tf.tf * lp.lp AS c, tf.tf
            FROM tf JOIN lp USING (term)
        ),
        per_doc AS (
            SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
                   sum(c ORDER BY term) AS s
            FROM contrib GROUP BY doc_id
        )
        SELECT d.doc_id AS id,
               coalesce(p.n_tokens, 0) AS n_tokens,
               round(coalesce(p.s / p.n_tokens, 0.0), 6) AS logprob_per_token
        FROM ({source_sql}) d LEFT JOIN per_doc p USING (doc_id)
    """


def nb_quality(
    docs: DataFrame,
    label_col: str = "label",
    doc_id: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """DF[id, n_tokens, nb_score, predicted] — multinomial Naive
    Bayes log-likelihood-ratio quality score, trained on the corpus's
    own boolean `label_col` and applied to every document.

    This is the learned-quality-filter seam of the published corpus
    recipes (GPT-3/CCNet train a linear classifier with curated
    positives; the fasttext model there is a bag-of-ngrams linear
    scorer — multinomial NB is its closed-form, deterministic
    stand-in, trainable with two aggregations and no optimizer):

        llr(t) = ln((c_pos(t)+1)/(T_pos+V)) - ln((c_neg(t)+1)/(T_neg+V))
        score(d) = ln(n_pos/n_neg) + sum_t tf_d(t) * llr(t)

    add-one smoothing over the JOINT vocabulary; both classes must be
    non-empty. The per-doc sum folds ORDERED by term (the BM25/unigram
    fp discipline) and the score is rounded to 6dp, so results
    value-hash-match the DuckDB twin.

    Scale shape: training is two partial-agg groupBys over (class,
    term) + two scalars; the llr table is vocabulary-sized and
    broadcasts; scoring is one tf join + one per-doc fold. Nothing
    iterative, nothing driver-side except the two scalars.
    """
    lab = docs.select(
        F.col(doc_id).alias("doc_id"), F.col(label_col).cast("boolean").alias("_y")
    )
    n_pos, n_neg = (
        lab.agg(
            F.sum(F.col("_y").cast("long")),
            F.sum((~F.col("_y")).cast("long")),
        ).collect()[0]
    )
    if not n_pos or not n_neg:
        raise ValueError("nb_quality needs both classes non-empty")
    tf = term_frequencies(docs, doc_id, text)
    ctf = tf.join(lab, "doc_id").groupBy("term").agg(
        F.sum(F.when(F.col("_y"), F.col("tf")).otherwise(0)).alias("cp"),
        F.sum(F.when(~F.col("_y"), F.col("tf")).otherwise(0)).alias("cn"),
    )
    tot = ctf.agg(
        F.sum("cp").cast("double").alias("tp"),
        F.sum("cn").cast("double").alias("tn"),
        F.count("*").cast("double").alias("v"),
    ).collect()[0]
    dp, dn = float(tot["tp"]) + float(tot["v"]), float(tot["tn"]) + float(tot["v"])
    llr = ctf.select(
        "term",
        (
            F.log((F.col("cp") + 1.0) / F.lit(dp))
            - F.log((F.col("cn") + 1.0) / F.lit(dn))
        ).alias("llr"),
    )
    import math as _math

    prior = _math.log(float(n_pos) / float(n_neg))
    contrib = tf.join(F.broadcast(llr), "term").select(
        "doc_id", "term", (F.col("tf") * F.col("llr")).alias("c"), "tf"
    )
    per_doc = contrib.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("term", "c"))),
            F.lit(0.0),
            lambda acc, x: acc + x["c"],
        ).alias("_s"),
    )
    score = F.round(F.coalesce(F.col("_s"), F.lit(0.0)) + F.lit(prior), 6)
    return (
        docs.select(F.col(doc_id).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            F.col("doc_id").alias("id"),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            score.alias("nb_score"),
            (score > 0).alias("predicted"),
        )
    )


def nb_quality_sql(source_sql: str, label_expr: str = "label") -> str:
    """DuckDB twin — identical smoothing, prior, and ordered fold."""
    tok = _TOK.format(src=f"({source_sql})")
    return f"""
        WITH
        {tok},
        lab AS (
            SELECT doc_id, CAST({label_expr} AS BOOLEAN) AS y
            FROM ({source_sql})
        ),
        np AS (
            SELECT CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS DOUBLE) AS p,
                   CAST(sum(CASE WHEN y THEN 0 ELSE 1 END) AS DOUBLE) AS n
            FROM lab
        ),
        ctf AS (
            SELECT tf.term,
                   sum(CASE WHEN l.y THEN tf.tf ELSE 0 END) AS cp,
                   sum(CASE WHEN l.y THEN 0 ELSE tf.tf END) AS cn
            FROM tf JOIN lab l ON l.doc_id = tf.doc_id
            GROUP BY tf.term
        ),
        tot AS (
            SELECT CAST(sum(cp) AS DOUBLE) + CAST(count(*) AS DOUBLE) AS dp,
                   CAST(sum(cn) AS DOUBLE) + CAST(count(*) AS DOUBLE) AS dn
            FROM ctf
        ),
        llr AS (
            SELECT term,
                   ln((cp + 1.0) / (SELECT dp FROM tot))
                   - ln((cn + 1.0) / (SELECT dn FROM tot)) AS llr
            FROM ctf
        ),
        per AS (
            SELECT tf.doc_id,
                   CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
                   sum(tf.tf * l.llr ORDER BY tf.term) AS s
            FROM tf JOIN llr l ON l.term = tf.term
            GROUP BY tf.doc_id
        )
        SELECT d.doc_id AS id,
               coalesce(p.n_tokens, 0) AS n_tokens,
               round(coalesce(p.s, 0.0)
                     + ln((SELECT p FROM np) / (SELECT n FROM np)), 6)
                 AS nb_score,
               round(coalesce(p.s, 0.0)
                     + ln((SELECT p FROM np) / (SELECT n FROM np)), 6) > 0
                 AS predicted
        FROM ({source_sql}) d
        LEFT JOIN per p ON p.doc_id = d.doc_id
    """
