"""Text/token operator keys (SURVEY.md §2.4, §2.8, §2.9) + text-analysis
pipeline ops (language-ID, quality score, token counting, fingerprinting).

Token streams come from the deterministic tokenizer spec (lowercase,
[a-z0-9]+ runs, ordinal positions) — JVM split/posexplode here (codegen hot
path); the pandas-UDF chain is exercised by the `tokenize` key and the
engine build. Oracles share TOKS_CTE so both engines see identical tokens.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tesserae_ng_spark.operators import register
from tesserae_ng_spark.operators.common import TOKS_CTE, t, terms_df, tokens_df

# Frequent terms at sf0.01 (vocab is ~31 terms): used as fixed oracle params.
TERM_A = "join"
TERM_B = "hash"
PHRASE = ("table", "hash")  # frequent adjacent bigram
BM25_QUERY = ["join", "hash", "scan"]


# ---------------------------------------------------------------------------
# tokenize (the pandas-UDF chain itself, checked against SQL tokenization)
# ---------------------------------------------------------------------------
@register(
    "tokenize",
    f"WITH {TOKS_CTE} SELECT doc_id, term, pos FROM toks",
)
def tokenize_key(spark, sf):
    from tesserae_ng_spark.functions.analysis import tokenize_udf

    docs = t(spark, sf, "documents")
    return (
        docs.select("doc_id", F.explode(tokenize_udf(F.col("text"))).alias("tk"))
        .select("doc_id", "tk.term", F.col("tk.pos").cast("long").alias("pos"))
    )


@register("stem", None)  # Porter is not SQL-expressible → rows-only check
def stem_key(spark, sf):
    from tesserae_ng_spark.functions.analysis import analyze_udf

    docs = t(spark, sf, "documents")
    return (
        docs.select(F.explode(analyze_udf(F.col("text"), F.col("lang"))).alias("tk"))
        .select(F.col("tk.term").alias("term"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# §2.4 term aggregations
# ---------------------------------------------------------------------------
@register(
    "doc_freq_agg",
    f"""WITH {TOKS_CTE}
       SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
       FROM toks GROUP BY term""",
)
def doc_freq_agg(spark, sf):
    return (
        tokens_df(spark, sf)
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
    )


@register("approx_df_agg", None)  # approximate → engines differ → rows-only
def approx_df_agg(spark, sf):
    # heavy-hitter detection input for skew salting (SURVEY.md §2.11):
    # cheap approx df per term at 100 TB (one pass, no exact distinct).
    return (
        tokens_df(spark, sf)
        .groupBy("term")
        .agg(F.approx_count_distinct("doc_id", 0.05).alias("approx_df"))
    )


@register(
    "collect_positions",
    f"""WITH {TOKS_CTE},
       posting AS (
         SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf,
                string_agg(pos, ',' ORDER BY pos) AS positions
         FROM toks GROUP BY term, doc_id)
       SELECT term, doc_id, tf, positions,
              CAST(floor((row_number() OVER (PARTITION BY term ORDER BY doc_id) - 1) / 128)
                   AS BIGINT) AS block_id
       FROM posting""",
)
def collect_positions(spark, sf):
    # The postings-build preview in one pass, consolidating three §2 keys
    # under the 50-key driver cap (SURVEY.md §2 key map):
    #   collect_positions — positions array per (term, doc), crossed to the
    #     oracle as a sorted CSV string (array hashing is engine-specific)
    #   term_freq_agg     — tf per (term, doc); partial (map-side) + final
    #     agg planned automatically by Spark
    #   block_assign      — 128-docs/block blocking within term, docID order
    w = W.partitionBy("term").orderBy("doc_id")
    return (
        tokens_df(spark, sf)
        .groupBy("term", "doc_id")
        .agg(
            F.count("*").alias("tf"),
            F.array_join(F.array_sort(F.collect_list("pos")), ",").alias("positions"),
        )
        .withColumn(
            "block_id", F.floor((F.row_number().over(w) - 1) / 128).cast("long")
        )
    )


@register(
    "stopword_filter",
    f"""WITH {TOKS_CTE},
       stop AS (SELECT term FROM toks GROUP BY term
                ORDER BY count(*) DESC, term ASC LIMIT 5)
       SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM toks
       WHERE term NOT IN (SELECT term FROM stop)
       GROUP BY term""",
)
def stopword_filter(spark, sf):
    # data-driven stop list (top-N by cf) + anti-join — the reference's
    # stopword-count parameter re-expressed (SURVEY.md §2.8).
    toks = tokens_df(spark, sf)
    stop = (
        toks.groupBy("term")
        .agg(F.count("*").alias("cf"))
        .orderBy(F.col("cf").desc(), F.col("term").asc())
        .limit(5)
        .select("term")
    )
    return (
        toks.join(F.broadcast(stop), "term", "left_anti")
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
    )


# ---------------------------------------------------------------------------
# §2.9 phrase / proximity / Tesserae pair scoring (SQL-checkable variants,
# unstemmed; the stemmed engine path is pytest-verified)
# ---------------------------------------------------------------------------
def positional_self_join(spark, sf):
    # §2.3 positional_self_join — the mechanism inside phrase_match (its
    # driver key); exported standalone for tests.
    toks = tokens_df(spark, sf)
    a = toks.filter(F.col("term") == PHRASE[0]).alias("a")
    b = toks.filter(F.col("term") == PHRASE[1]).alias("b")
    return a.join(
        b,
        (F.col("a.doc_id") == F.col("b.doc_id"))
        & (F.col("b.pos") == F.col("a.pos") + 1),
    ).select(F.col("a.doc_id").alias("doc_id"), F.col("a.pos").alias("pos"))


@register(
    "phrase_match",
    f"""WITH {TOKS_CTE}
       SELECT a.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS n_matches
       FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
       WHERE a.term = '{PHRASE[0]}' AND b.term = '{PHRASE[1]}'
       GROUP BY a.doc_id""",
)
def phrase_match(spark, sf):
    return (
        positional_self_join(spark, sf)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_matches"))
    )


@register(
    "proximity_match",
    f"""WITH {TOKS_CTE}
       SELECT a.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS n_pairs
       FROM toks a JOIN toks b
         ON a.doc_id = b.doc_id AND abs(a.pos - b.pos) <= 5
       WHERE a.term = '{TERM_A}' AND b.term = '{TERM_B}'
       GROUP BY a.doc_id""",
)
def proximity_match(spark, sf):
    toks = tokens_df(spark, sf)
    a = toks.filter(F.col("term") == TERM_A).alias("a")
    b = toks.filter(F.col("term") == TERM_B).alias("b")
    return (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.abs(F.col("a.pos") - F.col("b.pos")) <= 5),
        )
        .groupBy(F.col("a.doc_id").alias("doc_id"))
        .agg(F.count("*").alias("n_pairs"))
    )


@register(
    "tesserae_pair_score",
    f"""WITH {TOKS_CTE},
       fa AS (SELECT doc_id, pos FROM toks WHERE term = '{TERM_A}'),
       fb AS (SELECT doc_id, pos FROM toks WHERE term = '{TERM_B}'),
       tfa AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS tf_a FROM fa GROUP BY doc_id),
       tfb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS tf_b FROM fb GROUP BY doc_id),
       dist AS (SELECT fa.doc_id, min(abs(fa.pos - fb.pos)) AS d
                FROM fa JOIN fb ON fa.doc_id = fb.doc_id GROUP BY fa.doc_id)
       SELECT dist.doc_id AS doc_id,
              ROUND(ln((1.0 / tf_a + 1.0 / tf_b) / greatest(d, 1)), 6) AS score
       FROM dist JOIN tfa ON dist.doc_id = tfa.doc_id
                 JOIN tfb ON dist.doc_id = tfb.doc_id""",
)
def tesserae_pair_score(spark, sf):
    # Tesserae two-text comparison re-expressed (SURVEY.md §2.9 / §3.3):
    # docs sharing both terms, score = ln((1/f_A + 1/f_B) / d) with d = min
    # token distance between occurrences (≥1).
    toks = tokens_df(spark, sf)
    fa = toks.filter(F.col("term") == TERM_A).select("doc_id", "pos")
    fb = toks.filter(F.col("term") == TERM_B).select(
        "doc_id", F.col("pos").alias("pos_b")
    )
    tfa = fa.groupBy("doc_id").agg(F.count("*").alias("tf_a"))
    tfb = fb.groupBy("doc_id").agg(F.count("*").alias("tf_b"))
    dist = (
        fa.join(fb, "doc_id")
        .groupBy("doc_id")
        .agg(F.min(F.abs(F.col("pos") - F.col("pos_b"))).alias("d"))
    )
    return dist.join(tfa, "doc_id").join(tfb, "doc_id").select(
        "doc_id",
        F.round(
            F.log(
                (1.0 / F.col("tf_a") + 1.0 / F.col("tf_b"))
                / F.greatest(F.col("d"), F.lit(1))
            ),
            6,
        ).alias("score"),
    )


# ---------------------------------------------------------------------------
# BM25 (full arithmetic, SQL-checkable; flagship `bm25_exhaustive`)
# ---------------------------------------------------------------------------
_BM25_TERMS = "', '".join(BM25_QUERY)


def _shared_bm25_aggs(spark, sf):
    """(td, dl, stats) for the BM25 plans, all derived from ONE
    (doc_id, term) aggregate so the token explode runs once (the identical
    td exchange is AQE-reused across the branches; r7, guide §2.4).

    Integer-exact equivalences to the per-subtree originals:
    tf = count per (doc_id, term); dl = Σ tf per doc (= token count);
    n_docs = |dl rows| (= countDistinct doc_id); total tokens = Σ dl
    (= count(*) over tokens); avg_dl = their double quotient."""
    td = (
        terms_df(spark, sf)
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dl = td.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("dl") / F.count("*")).alias("avg_dl"),
    )
    return td, dl, stats

@register(
    "math_scores",
    f"""WITH {TOKS_CTE},
       n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs,
                    CAST(count(*) AS DOUBLE) / count(DISTINCT doc_id) AS avg_dl
             FROM toks),
       dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
       tf AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf FROM toks
              WHERE term IN ('{_BM25_TERMS}') GROUP BY term, doc_id),
       df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term)
       SELECT tf.term AS term, tf.doc_id AS doc_id,
              ROUND(ln(1 + (n.n_docs - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / n.avg_dl)),
                    6) AS partial_score
       FROM tf JOIN df ON tf.term = df.term
               JOIN dl ON tf.doc_id = dl.doc_id
               CROSS JOIN n""",
)
def math_scores(spark, sf):
    from tesserae_ng_spark.query.bm25_oracle import idf_expr, tf_norm_expr

    # shared (doc_id, term) aggregate (r7, guide §2.4): stats/dl/tf all
    # derive from ONE td exchange (AQE reuses the identical subplan), so
    # the scan + explode run once instead of once per subtree. Values are
    # integer-exact equal: dl = Σ tf per doc, n_docs = |dl|, total tokens
    # = Σ dl. Hash-verified vs the DuckDB oracle (tools/check_oracle.py).
    td, dl, stats = _shared_bm25_aggs(spark, sf)
    tf = td.filter(F.col("term").isin(BM25_QUERY)).select(
        "term", "doc_id", "tf"
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    return (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            "doc_id",
            F.round(
                idf_expr(F.col("n_docs"), F.col("df"))
                * tf_norm_expr(F.col("tf"), F.col("dl"), F.col("avg_dl")),
                6,
            ).alias("partial_score"),
        )
    )


@register(
    "bm25_exhaustive",
    f"""WITH {TOKS_CTE},
       n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs,
                    CAST(count(*) AS DOUBLE) / count(DISTINCT doc_id) AS avg_dl
             FROM toks),
       dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
       tf AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf FROM toks
              WHERE term IN ('{_BM25_TERMS}') GROUP BY term, doc_id),
       df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
       scores AS (
         SELECT tf.doc_id AS doc_id,
                sum(ln(1 + (n.n_docs - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / n.avg_dl))) AS score
         FROM tf JOIN df ON tf.term = df.term
                 JOIN dl ON tf.doc_id = dl.doc_id
                 CROSS JOIN n
         GROUP BY tf.doc_id)
       SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank,
              doc_id, ROUND(score, 6) AS score
       FROM scores
       ORDER BY rank LIMIT 20""",
)
def bm25_exhaustive(spark, sf):
    # Flagship: exhaustive BM25 top-20 as one declarative plan. The summed
    # per-term partials match DuckDB bit-wise closely enough that ROUND(.,6)
    # hashes identically; ranks are fully deterministic via the tie-break.
    # Shared (doc_id, term) aggregate (r7): see math_scores — one reused
    # exchange feeds stats/dl/tf instead of three scan+explode subtrees.
    td, dl, stats = _shared_bm25_aggs(spark, sf)
    tf = td.filter(F.col("term").isin(BM25_QUERY)).select(
        "term", "doc_id", "tf"
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    from tesserae_ng_spark.query.bm25_oracle import idf_expr, tf_norm_expr

    scores = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                idf_expr(F.col("n_docs"), F.col("df"))
                * tf_norm_expr(F.col("tf"), F.col("dl"), F.col("avg_dl"))
            ).alias("partial"),
        )
        .groupBy("doc_id")
        .agg(F.sum("partial").alias("score"))
    )
    # top-k via orderBy+limit → TakeOrderedAndProject (per-partition bounded
    # heap + driver merge), NOT a global row_number window: at 100 TB an
    # unpartitioned WindowExec moves every scored doc to one reducer. Rank is
    # derived on the already-bounded k rows (constant partition key is fine —
    # the window input is ≤ k rows by construction).
    top = scores.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(20)
    w = W.partitionBy(F.lit(0)).orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "doc_id", F.round("score", 6).alias("score"))
    )


# ---------------------------------------------------------------------------
# Training-data text analysis (token counting, quality, lang-ID, fingerprint)
# ---------------------------------------------------------------------------
@register(
    "quality_score",
    f"""WITH {TOKS_CTE},
       tok AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                      avg(length(term)) AS avg_len,
                      CAST(count(DISTINCT term) AS BIGINT) AS n_distinct
               FROM toks GROUP BY doc_id)
       SELECT d.doc_id AS doc_id, tok.n_tokens AS n_tokens,
              tok.n_distinct AS n_distinct,
              ROUND(least(tok.n_tokens / 100.0, 1.0) * 0.4
                    + (CAST(tok.n_distinct AS DOUBLE) / tok.n_tokens) * 0.4
                    + least(tok.avg_len / 10.0, 1.0) * 0.2, 6) AS quality
       FROM documents d JOIN tok ON d.doc_id = tok.doc_id""",
)
def quality_score(spark, sf):
    # heuristic document-quality score for training-data filtering:
    # length signal + lexical diversity + avg token length, all JVM-side.
    # Consolidates three §2 keys under the 50-key driver cap: the exposed
    # n_tokens column IS doclen_agg's dl and (with n_distinct) token_count's
    # output — same grouping, same token stream, one hash-checked pass.
    tok = (
        tokens_df(spark, sf)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.avg(F.length("term")).alias("avg_len"),
            F.countDistinct("term").alias("n_distinct"),
        )
    )
    d = t(spark, sf, "documents").select("doc_id")
    return d.join(tok, "doc_id").select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.round(
            F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * 0.4
            + (F.col("n_distinct").cast("double") / F.col("n_tokens")) * 0.4
            + F.least(F.col("avg_len") / 10.0, F.lit(1.0)) * 0.2,
            6,
        ).alias("quality"),
    )


# Rank-ordered frequent character bigrams per language (public linguistic
# frequency tables — e.g. Norvig's English n-gram counts and standard
# language-ID literature, Cavnar & Trenkle 1994's rank-profile method).
# Rank r contributes weight 1/(r+1); the classifier is the cosine-free
# rank-overlap score of Cavnar-Trenkle, truncated to 20 bigrams/lang.
LANG_BIGRAM_PROFILES = {
    "en": ["th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
           "ti", "es", "or", "te", "of", "ed", "is", "it", "al", "ar"],
    "es": ["de", "en", "el", "la", "os", "es", "ar", "ue", "ra", "re",
           "er", "as", "on", "st", "ad", "al", "or", "ta", "co", "ci"],
    "fr": ["es", "le", "de", "en", "re", "nt", "on", "er", "te", "el",
           "an", "se", "et", "la", "ai", "it", "me", "ou", "em", "ie"],
    "de": ["en", "er", "ch", "de", "ei", "ie", "in", "te", "nd", "ge",
           "st", "ne", "be", "es", "un", "re", "an", "he", "au", "ng"],
}


_LANGS = sorted(LANG_BIGRAM_PROFILES)
_LUT = None  # (65536 × n_langs weight LUT, any-profile bool mask), lazy


def _weight_lut():
    """Packed-bigram lookup tables, built once per process: ``cid`` maps
    (b0<<8)|b1 over utf-8 bytes → compact profile-bigram id (-1 = not in
    any profile, the overwhelmingly common case); ``Wc`` is the compact
    (n_profile_bigrams × n_langs) Cavnar-Trenkle weight matrix, weight
    1/(rank+1)."""
    global _LUT
    if _LUT is None:
        import numpy as np

        grams = sorted(
            {bg for prof in LANG_BIGRAM_PROFILES.values() for bg in prof}
        )
        cid = np.full(65536, -1, dtype=np.int32)
        for i, bg in enumerate(grams):
            cid[(ord(bg[0]) << 8) | ord(bg[1])] = i
        Wc = np.zeros((len(grams), len(_LANGS)), dtype=np.float64)
        for li, lang in enumerate(_LANGS):
            for r, bg in enumerate(LANG_BIGRAM_PROFILES[lang]):
                Wc[grams.index(bg), li] += 1.0 / (r + 1)
        _LUT = (cid, Wc)
    return _LUT


def batch_lang_id(texts: pd.Series) -> pd.Series:
    """Vectorized rank-profile language ID for a whole Arrow batch — zero
    Python below batch granularity (VERDICT r2: the old path looped per
    unique bigram per doc).

    One pass: all docs' lowercased utf-8 bytes concatenate (NUL×2-joined —
    profile bigrams are alphabetic, so separator-spanning grams map to no
    profile id and drop out), bigrams pack to uint16, a 65536-entry
    compact-id LUT + one bincount over (doc, profile-bigram) keys + one
    (docs × bigrams)·(bigrams × langs) matmul produce every doc's
    per-lang score simultaneously — no sort, no per-doc work.
    Deterministic; ties, no-profile-hit, and <2-char docs → 'und'.
    """
    import numpy as np

    cid, Wc = _weight_lut()
    ncomp = Wc.shape[0]
    n = len(texts)
    if n == 0:
        return pd.Series([], index=texts.index, dtype=object)
    bufs = [
        s.encode("utf-8", "ignore") for s in texts.fillna("").str.lower()
    ]
    lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=n)
    flat = np.frombuffer(b"\x00\x00".join(bufs), dtype=np.uint8)
    acc = np.zeros((n, len(_LANGS)), dtype=np.float64)
    if flat.size >= 2:
        grams = (flat[:-1].astype(np.uint16) << 8) | flat[1:]
        ids = cid[grams]
        gi = np.nonzero(ids >= 0)[0]  # profile grams only (~80 distinct)
        if gi.size:
            starts = np.cumsum(lens + 2) - (lens + 2)
            doc_of = np.searchsorted(starts, gi, side="right") - 1
            counts = np.bincount(
                doc_of * ncomp + ids[gi], minlength=n * ncomp
            ).reshape(n, ncomp)
            acc = counts.astype(np.float64) @ Wc
    mx = acc.max(axis=1)
    tie = (acc == mx[:, None]).sum(axis=1) > 1
    out = np.array(_LANGS, dtype=object)[acc.argmax(axis=1)]
    out[(mx <= 0.0) | tie | (lens < 2)] = "und"
    return pd.Series(out, index=texts.index)


@register("lang_id", None)  # heuristic n-gram classifier → rows-only check
def lang_id(spark, sf):
    # Cavnar-Trenkle-style rank-profile language ID (pandas UDF, Arrow-
    # batched): per-doc weighted bigram overlap against public frequency
    # profiles for en/es/fr/de. Deterministic; accuracy is pinned against
    # the corpus's lang labels in tests/test_analysis.py.
    @F.pandas_udf(T.StringType())
    def _guess(text: pd.Series) -> pd.Series:
        return batch_lang_id(text)

    return t(spark, sf, "documents").select(
        "doc_id", _guess(F.col("text")).alias("pred_lang")
    )


@register(
    "doc_fingerprint",
    """SELECT doc_id, md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp
       FROM documents""",
)
def doc_fingerprint(spark, sf):
    # content fingerprint: md5 over whitespace-normalized lowercased text.
    return t(spark, sf, "documents").select(
        "doc_id",
        F.md5(F.regexp_replace(F.lower("text"), r"\s+", " ")).alias("fp"),
    )
