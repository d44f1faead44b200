"""Corpus-analytics operators — SURVEY.md §2.25 (#337–#341, #350,
#357, #363, #366–#367).

Round-6 waves: the remaining classic corpus/LM analytics a
training-data pipeline runs between dedup and shard publish —

- exact duplicated-SUBSTRING detection (#337): the character-level
  dedup signal (fixed-width gram sites shared across the corpus,
  merged into per-doc covered extents) that catches boilerplate and
  templated spans exact-content dedup (#69) and MinHash (#70) both
  miss;
- ROUGE-N overlap evaluation (#338): clipped n-gram precision/recall/
  F1 between candidate/reference text pairs — the summarization-eval
  sibling of BLEU (#288);
- Dunning G² keyness (#341): log-likelihood-ratio over/under-use of
  terms in a focus subcorpus vs the rest — the statistically sound
  replacement for raw-frequency "top words of source X";
- Good–Turing frequency smoothing (#339): count-of-counts r* and the
  unseen-mass estimate N1/N that underlie every classical LM smoother;
- TextRank keyword extraction (#340): PageRank over the word
  co-occurrence graph, exact-iterated with the #153 decimal-sum /
  ROUND(12) discipline so all iterations stay bit-identical.

Parity disciplines: token streams come from the house ``split(text,
' ')`` tokenizer; every count is BIGINT; every double reduction sums
through DECIMAL (order-independent) and quantizes at 1e-9; gram
equality is on the raw gram string on BOTH engines (no cross-engine
hash needed — at 100 TB the Spark side would shuffle a 128-bit
fingerprint instead, the injective-encoding discipline of
functions/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zmaxion_spark.catalog import load_table
from zmaxion_spark.queries.registry import query


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# ---------------------------------------------------------------------------
# #337 substring_dedup — exact duplicated-substring extents
# ---------------------------------------------------------------------------

_SSD_K = 32  # gram width in characters


@query(
    "q_substring_dedup",
    oracle=f"""
        WITH d AS (SELECT doc_id, lang, text, LENGTH(text) AS n
                   FROM documents),
        g AS (SELECT doc_id, lang, UNNEST(range(1, n - {_SSD_K - 2})) AS p,
                     text
              FROM d WHERE n >= {_SSD_K}),
        sites AS (SELECT doc_id, lang, p,
                         substr(text, CAST(p AS INT), {_SSD_K}) AS gram
                  FROM g),
        dup AS (SELECT doc_id, lang, p
                FROM (SELECT doc_id, lang, p,
                             COUNT(*) OVER (PARTITION BY gram) AS c
                      FROM sites)
                WHERE c >= 2),
        cov AS (SELECT doc_id, lang,
                       LEAST({_SSD_K},
                             COALESCE(LEAD(p) OVER (PARTITION BY doc_id
                                                    ORDER BY p) - p,
                                      {_SSD_K})) AS covered
                FROM dup),
        perdoc AS (SELECT doc_id, lang,
                          CAST(SUM(covered) AS BIGINT) AS dup_chars
                   FROM cov GROUP BY doc_id, lang),
        tot AS (SELECT lang, COUNT(*) AS n_docs,
                       CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars
                FROM documents GROUP BY lang)
        SELECT t.lang,
               t.n_docs,
               CAST(COUNT(p.doc_id) AS BIGINT) AS docs_affected,
               CAST(COALESCE(SUM(p.dup_chars), 0) AS BIGINT) AS dup_chars,
               t.total_chars,
               ROUND(CAST(COALESCE(SUM(p.dup_chars), 0) AS DOUBLE)
                     / t.total_chars, 9) AS dup_ratio
        FROM tot t LEFT JOIN perdoc p ON p.lang = t.lang
        GROUP BY t.lang, t.n_docs, t.total_chars
        ORDER BY t.lang
    """,
    operators=(14, 23, 31, 337),
    doc=f"Exact duplicated-substring detection (#337), the "
    "character-level dedup signal of Lee et al.'s 'Deduplicating "
    "Training Data Makes Language Models Better' (ICML 2022, public): "
    f"every {_SSD_K}-char gram site that occurs >= 2 times anywhere in "
    "the corpus marks its span duplicated; per-doc spans merge into "
    "covered extents (all grams are equal width, so positions sort "
    "ascending with their ends — covered chars are sum(min(K, "
    "next_p - p)) + K, one LEAD window, no interval algebra), rolled "
    "up to a per-lang census with the duplicated-char ratio. This "
    "catches templated boilerplate that document-hash dedup (#69) and "
    "MinHash (#70) miss because the surrounding text differs. Parity: "
    "gram equality is on the raw substring on both engines; counts "
    "BIGINT; one ROUND(9) ratio. Scale: the gram stream is ~K bytes/"
    "char of text — at 100 TB shuffle a 128-bit fingerprint of the "
    "gram instead (injective-encoding discipline, functions/dedup.py) "
    "and salt the within-gram count with a two-level aggregation; the "
    "extent merge partitions by doc_id and never sees a global sort.",
    bench=False,
)
def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = _SSD_K
    d = _docs(spark, sf_dir).select(
        "doc_id", "lang", "text", F.length("text").alias("n")
    )
    sites = (
        d.filter(F.col("n") >= k)
        .select(
            "doc_id",
            "lang",
            F.explode(F.sequence(F.lit(1), F.col("n") - (k - 1))).alias("p"),
            "text",
        )
        .select(
            "doc_id", "lang", "p", F.expr(f"substring(text, p, {k})").alias("gram")
        )
    )
    dup = (
        sites.withColumn(
            "c", F.count(F.lit(1)).over(Window.partitionBy("gram"))
        )
        .filter(F.col("c") >= 2)
        .select("doc_id", "lang", "p")
    )
    w_doc = Window.partitionBy("doc_id").orderBy("p")
    perdoc = (
        dup.withColumn(
            "covered",
            F.least(
                F.lit(k), F.coalesce(F.lead("p").over(w_doc) - F.col("p"), F.lit(k))
            ),
        )
        .groupBy("doc_id", "lang")
        .agg(F.sum("covered").cast("bigint").alias("dup_chars"))
    )
    tot = _docs(spark, sf_dir).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
    )
    return (
        tot.join(perdoc, "lang", "left")
        .groupBy("lang", "n_docs", "total_chars")
        .agg(
            F.count("doc_id").cast("bigint").alias("docs_affected"),
            F.coalesce(F.sum("dup_chars"), F.lit(0))
            .cast("bigint")
            .alias("dup_chars"),
        )
        .select(
            "lang",
            "n_docs",
            "docs_affected",
            "dup_chars",
            "total_chars",
            F.round(
                F.col("dup_chars").cast("double") / F.col("total_chars"), 9
            ).alias("dup_ratio"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# #338 rouge_n — clipped n-gram overlap P/R/F between doc pairs
# ---------------------------------------------------------------------------

_ROUGE_PAIR_SQL = """
        pairs AS (
            SELECT lang, doc_id AS cand_id, text AS cand,
                   LEAD(doc_id) OVER (PARTITION BY lang ORDER BY doc_id)
                       AS ref_id,
                   LEAD(text) OVER (PARTITION BY lang ORDER BY doc_id)
                       AS ref
            FROM documents
        ),
        p2 AS (SELECT * FROM pairs WHERE ref_id IS NOT NULL)
"""


def _rouge_gram_sql(side: str, n: int) -> str:
    """Gram counts for one side (cand/ref) at level n, as SQL."""
    if n == 1:
        gram = f"UNNEST(STRING_SPLIT({side}, ' '))"
        return f"""(
            SELECT cand_id, {gram} AS gram FROM p2
        )"""
    return f"""(
        SELECT cand_id,
               UNNEST(list_transform(
                   range(1, LEN(STRING_SPLIT({side}, ' '))),
                   i -> STRING_SPLIT({side}, ' ')[i] || ' '
                        || STRING_SPLIT({side}, ' ')[i + 1])) AS gram
        FROM p2
    )"""


def _rouge_level_sql(n: int) -> str:
    return f"""
        SELECT cg.cand_id, {n} AS n,
               CAST(SUM(LEAST(cg.c, rg.c)) AS BIGINT) AS overlap,
               ANY_VALUE(ct.tot) AS cand_tot,
               ANY_VALUE(rt.tot) AS ref_tot
        FROM (SELECT cand_id, gram, COUNT(*) AS c
              FROM {_rouge_gram_sql("cand", n)} GROUP BY 1, 2) cg
        JOIN (SELECT cand_id, gram, COUNT(*) AS c
              FROM {_rouge_gram_sql("ref", n)} GROUP BY 1, 2) rg
          ON rg.cand_id = cg.cand_id AND rg.gram = cg.gram
        JOIN (SELECT cand_id, COUNT(*) AS tot
              FROM {_rouge_gram_sql("cand", n)} GROUP BY 1) ct
          ON ct.cand_id = cg.cand_id
        JOIN (SELECT cand_id, COUNT(*) AS tot
              FROM {_rouge_gram_sql("ref", n)} GROUP BY 1) rt
          ON rt.cand_id = cg.cand_id
        GROUP BY cg.cand_id
    """


@query(
    "q_rouge_n",
    oracle=f"""
        WITH {_ROUGE_PAIR_SQL},
        tots AS (
            SELECT cand_id, 1 AS n,
                   LEN(STRING_SPLIT(cand, ' ')) AS cand_tot,
                   LEN(STRING_SPLIT(ref, ' ')) AS ref_tot
            FROM p2
            UNION ALL
            SELECT cand_id, 2,
                   LEN(STRING_SPLIT(cand, ' ')) - 1,
                   LEN(STRING_SPLIT(ref, ' ')) - 1
            FROM p2
        ),
        ov AS (
            SELECT cand_id, n, overlap FROM ({_rouge_level_sql(1)})
            UNION ALL
            SELECT cand_id, n, overlap FROM ({_rouge_level_sql(2)})
        ),
        scored AS (
            SELECT t.cand_id, t.n,
                   COALESCE(o.overlap, 0) AS overlap,
                   t.cand_tot, t.ref_tot,
                   CAST(COALESCE(o.overlap, 0) AS DOUBLE) / t.cand_tot AS p,
                   CAST(COALESCE(o.overlap, 0) AS DOUBLE) / t.ref_tot AS r
            FROM tots t LEFT JOIN ov o ON o.cand_id = t.cand_id AND o.n = t.n
            WHERE t.cand_tot >= 1 AND t.ref_tot >= 1
        ),
        f AS (
            SELECT cand_id, n, p, r,
                   CASE WHEN p + r = 0 THEN CAST(0 AS DOUBLE)
                        ELSE 2 * p * r / (p + r) END AS f1
            FROM scored
        ),
        pj AS (SELECT s.cand_id, s.n, s.p, s.r, s.f1, pr.lang
               FROM f s JOIN p2 pr ON pr.cand_id = s.cand_id)
        SELECT lang, n, CAST(COUNT(*) AS BIGINT) AS n_pairs,
               ROUND(CAST(SUM(CAST(p AS DECIMAL(38,18))) AS DOUBLE)
                     / COUNT(*), 9) AS avg_p,
               ROUND(CAST(SUM(CAST(r AS DECIMAL(38,18))) AS DOUBLE)
                     / COUNT(*), 9) AS avg_r,
               ROUND(CAST(SUM(CAST(f1 AS DECIMAL(38,18))) AS DOUBLE)
                     / COUNT(*), 9) AS avg_f1
        FROM pj
        GROUP BY lang, n
        ORDER BY lang, n
    """,
    operators=(23, 31, 44, 338),
    doc="ROUGE-1/ROUGE-2 (#338): clipped n-gram overlap precision / "
    "recall / F1 between candidate/reference text pairs (each doc "
    "paired with the next doc_id in its lang — the deterministic "
    "pairing fixture; production passes real summary/reference "
    "pairs), averaged per (lang, n). Overlap is the textbook clipped "
    "count sum(min(count_cand(g), count_ref(g))); per-level totals "
    "derive from token counts, so a pair with an empty side at level "
    "n drops out identically on both engines. Parity: counts BIGINT, "
    "P/R/F identical IEEE trees, averages sum through DECIMAL(38,18) "
    "with one ROUND(9). Scale: gram counts partial-aggregate before "
    "the per-pair join; nothing holds more than one pair's vocabulary "
    "at a time and pairs parallelize perfectly.",
    bench=False,
)
def q_rouge_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy("doc_id")
    pairs = (
        d.select(
            "lang",
            F.col("doc_id").alias("cand_id"),
            F.col("text").alias("cand"),
            F.lead("doc_id").over(w).alias("ref_id"),
            F.lead("text").over(w).alias("ref"),
        )
        .filter(F.col("ref_id").isNotNull())
        .localCheckpoint(eager=True)  # both gram levels and totals reuse it
    )

    def grams(side: str, n: int):
        toks = F.split(side, " ")
        if n == 1:
            g = toks
        else:
            g = F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.concat(
                    F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
                ),
            )
        return pairs.select("cand_id", F.explode(g).alias("gram"))

    def level(n: int):
        cg = grams("cand", n).groupBy("cand_id", "gram").agg(
            F.count(F.lit(1)).alias("c1")
        )
        rg = grams("ref", n).groupBy("cand_id", "gram").agg(
            F.count(F.lit(1)).alias("c2")
        )
        ov = (
            cg.join(rg, ["cand_id", "gram"])
            .groupBy("cand_id")
            .agg(
                F.sum(F.least("c1", "c2")).cast("bigint").alias("overlap")
            )
        )
        toks_c = F.size(F.split("cand", " "))
        toks_r = F.size(F.split("ref", " "))
        cand_tot = toks_c if n == 1 else toks_c - 1
        ref_tot = toks_r if n == 1 else toks_r - 1
        return (
            pairs.select(
                "lang",
                "cand_id",
                F.lit(n).alias("n"),
                cand_tot.cast("bigint").alias("cand_tot"),
                ref_tot.cast("bigint").alias("ref_tot"),
            )
            .filter((F.col("cand_tot") >= 1) & (F.col("ref_tot") >= 1))
            .join(ov, "cand_id", "left")
            .withColumn("overlap", F.coalesce("overlap", F.lit(0)))
        )

    scored = level(1).unionByName(level(2)).select(
        "lang",
        "n",
        (F.col("overlap").cast("double") / F.col("cand_tot")).alias("p"),
        (F.col("overlap").cast("double") / F.col("ref_tot")).alias("r"),
    )
    f1 = F.when(F.col("p") + F.col("r") == 0, F.lit(0.0)).otherwise(
        2 * F.col("p") * F.col("r") / (F.col("p") + F.col("r"))
    )
    dec = "decimal(38,18)"
    return (
        scored.withColumn("f1", f1)
        .groupBy("lang", "n")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.round(
                F.sum(F.col("p").cast(dec)).cast("double") / F.count(F.lit(1)), 9
            ).alias("avg_p"),
            F.round(
                F.sum(F.col("r").cast(dec)).cast("double") / F.count(F.lit(1)), 9
            ).alias("avg_r"),
            F.round(
                F.sum(F.col("f1").cast(dec)).cast("double") / F.count(F.lit(1)), 9
            ).alias("avg_f1"),
        )
        .orderBy("lang", "n")
    )


# ---------------------------------------------------------------------------
# #339 good_turing — count-of-counts smoothing table
# ---------------------------------------------------------------------------

_GT_MAX_R = 10


@query(
    "q_good_turing",
    oracle=f"""
        WITH freq AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS r
            FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS term
                  FROM documents)
            GROUP BY term
        ),
        coc AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS n_r
                FROM freq GROUP BY r),
        tot AS (SELECT CAST(SUM(r * n_r) AS BIGINT) AS n_tokens FROM coc)
        SELECT c.r,
               c.n_r,
               CAST(COALESCE(c1.n_r, 0) AS BIGINT) AS n_r1,
               ROUND((c.r + 1) * CAST(COALESCE(c1.n_r, 0) AS DOUBLE)
                     / c.n_r, 9) AS r_star,
               ROUND((c.r + 1) * CAST(COALESCE(c1.n_r, 0) AS DOUBLE)
                     / c.n_r / t.n_tokens, 9) AS p_gt
        FROM coc c
        LEFT JOIN coc c1 ON c1.r = c.r + 1
        CROSS JOIN tot t
        ORDER BY c.r
        LIMIT {_GT_MAX_R}
    """,
    operators=(23, 24, 339),
    doc=f"Good–Turing frequency smoothing (#339): the count-of-counts "
    "table N_r over unigram frequencies, the adjusted count "
    "r* = (r+1)·N_(r+1)/N_r, and the smoothed probability r*/N for "
    f"the {_GT_MAX_R} smallest observed frequencies (an absolute "
    "r-cutoff can return an empty table once a bounded-vocab corpus "
    "saturates — the smallest-r window is where GT is meaningful at "
    "every scale) — the estimator beneath Katz backoff and "
    "classical LM smoothing, and (as N_1/N, the r=1 row's mass) the "
    "standard estimate of how much probability a corpus owes to "
    "UNSEEN events — the coverage dual of vocab_coverage (#266). "
    "Two groupBys (term → r, r → N_r), one self-join on r+1 (LEAD "
    "would be wrong across gaps in the r domain), one broadcast "
    "1-row total; everything integer until two ROUND(9) doubles. "
    "Scale: the second groupBy sees |vocab| rows, the join sees "
    "|distinct r| — both tiny at any corpus size.",
    bench=False,
)
def q_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    freq = (
        _docs(spark, sf_dir)
        .select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("r"))
    )
    coc = freq.groupBy("r").agg(F.count(F.lit(1)).cast("bigint").alias("n_r"))
    tot = coc.agg(
        F.sum(F.col("r") * F.col("n_r")).cast("bigint").alias("n_tokens")
    )
    c1 = coc.select((F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r1"))
    return (
        coc.join(c1, "r", "left")
        .withColumn("n_r1", F.coalesce("n_r1", F.lit(0)).cast("bigint"))
        .crossJoin(F.broadcast(tot))
        .select(
            "r",
            "n_r",
            "n_r1",
            F.round(
                (F.col("r") + 1) * F.col("n_r1").cast("double") / F.col("n_r"), 9
            ).alias("r_star"),
            F.round(
                (F.col("r") + 1)
                * F.col("n_r1").cast("double")
                / F.col("n_r")
                / F.col("n_tokens"),
                9,
            ).alias("p_gt"),
        )
        .orderBy("r")
        .limit(_GT_MAX_R)
    )


# ---------------------------------------------------------------------------
# #341 g2_keyness — Dunning log-likelihood keyness, focus vs rest
# ---------------------------------------------------------------------------

_G2_FOCUS_SOURCE = "src0"
_G2_TOPK = 20


@query(
    "q_g2_keyness",
    oracle=f"""
        WITH tok AS (
            SELECT UNNEST(STRING_SPLIT(text, ' ')) AS term,
                   CASE WHEN source = '{_G2_FOCUS_SOURCE}' THEN 1 ELSE 0 END
                       AS in_focus
            FROM documents
        ),
        per AS (
            SELECT term,
                   CAST(SUM(in_focus) AS BIGINT) AS a,
                   CAST(SUM(1 - in_focus) AS BIGINT) AS b
            FROM tok GROUP BY term
        ),
        tot AS (
            SELECT CAST(SUM(a) AS BIGINT) AS big_a,
                   CAST(SUM(b) AS BIGINT) AS big_b
            FROM per
        ),
        g2 AS (
            SELECT p.term, p.a, p.b,
                   2 * ((CASE WHEN p.a > 0 THEN
                             p.a * LN(CAST(p.a AS DOUBLE)
                                      / (CAST(t.big_a AS DOUBLE) * (p.a + p.b)
                                         / (t.big_a + t.big_b)))
                         ELSE CAST(0 AS DOUBLE) END)
                        + (CASE WHEN p.b > 0 THEN
                               p.b * LN(CAST(p.b AS DOUBLE)
                                        / (CAST(t.big_b AS DOUBLE) * (p.a + p.b)
                                           / (t.big_a + t.big_b)))
                           ELSE CAST(0 AS DOUBLE) END)) AS g2_raw,
                   CASE WHEN CAST(p.a AS DOUBLE) * t.big_b
                             > CAST(p.b AS DOUBLE) * t.big_a
                        THEN 'over' ELSE 'under' END AS direction
            FROM per p CROSS JOIN tot t
        )
        SELECT term, a AS n_focus, b AS n_rest,
               ROUND(g2_raw, 9) AS g2, direction
        FROM g2
        ORDER BY ROUND(g2_raw, 9) DESC, term
        LIMIT {_G2_TOPK}
    """,
    operators=(23, 33, 341),
    doc=f"Dunning log-likelihood keyness (#341, 'Accurate Methods for "
    "the Statistics of Surprise and Coincidence', CL 1993 — public): "
    f"G² = 2·Σ O·ln(O/E) over the 2×2 term table (focus subcorpus "
    f"source='{_G2_FOCUS_SOURCE}' vs the rest), the statistically "
    "sound 'what words characterize this source' ranking that raw "
    "frequency and PMI (#151) both get wrong on small counts; "
    f"top-{_G2_TOPK} by (ROUND(g2,9) DESC, term) with an over/under-"
    "use direction flag from the cross-multiplied rate comparison "
    "(exact integers — no division). Parity: one conditional-sum "
    "groupBy per term, one broadcast 1-row total, identical IEEE "
    "ln-trees, ROUND(9) before the ORDER so the rank tie-break is on "
    "the quantized value on both engines. Scale: map-side-combined "
    "token counts; the ranked set is |vocab|.",
    bench=False,
)
def q_g2_keyness(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = _docs(spark, sf_dir).select(
        F.explode(F.split("text", " ")).alias("term"),
        F.when(F.col("source") == _G2_FOCUS_SOURCE, 1).otherwise(0).alias(
            "in_focus"
        ),
    )
    per = tok.groupBy("term").agg(
        F.sum("in_focus").cast("bigint").alias("a"),
        F.sum(F.lit(1) - F.col("in_focus")).cast("bigint").alias("b"),
    )
    tot = per.agg(
        F.sum("a").cast("bigint").alias("big_a"),
        F.sum("b").cast("bigint").alias("big_b"),
    )
    ab = F.col("a") + F.col("b")
    n = F.col("big_a") + F.col("big_b")
    e1 = F.col("big_a").cast("double") * ab / n
    e2 = F.col("big_b").cast("double") * ab / n
    term_a = F.when(
        F.col("a") > 0, F.col("a") * F.log(F.col("a").cast("double") / e1)
    ).otherwise(F.lit(0.0))
    term_b = F.when(
        F.col("b") > 0, F.col("b") * F.log(F.col("b").cast("double") / e2)
    ).otherwise(F.lit(0.0))
    g2 = per.crossJoin(F.broadcast(tot)).select(
        "term",
        F.col("a").alias("n_focus"),
        F.col("b").alias("n_rest"),
        F.round(2 * (term_a + term_b), 9).alias("g2"),
        F.when(
            F.col("a").cast("double") * F.col("big_b")
            > F.col("b").cast("double") * F.col("big_a"),
            F.lit("over"),
        )
        .otherwise(F.lit("under"))
        .alias("direction"),
    )
    return g2.orderBy(F.desc("g2"), "term").limit(_G2_TOPK)


# ---------------------------------------------------------------------------
# #340 textrank_keywords — PageRank over the word co-occurrence graph
# ---------------------------------------------------------------------------

_TR_ITERS = 5
_TR_TOPK = 10
_TR_DEC = "decimal(38,18)"

_SQL_TR_STEP = """
        {next} AS (
            SELECT nd.node,
                   ROUND(CAST(0.15 AS DOUBLE) / n.n
                         + CAST(0.85 AS DOUBLE)
                           * COALESCE(c.s, CAST(0 AS DOUBLE)),
                         12) AS rank
            FROM nodes nd
            CROSS JOIN n
            LEFT JOIN (
                SELECT es.dst,
                       CAST(SUM(CAST(r.rank * (CAST(es.w AS DOUBLE) / o.w_out)
                                     AS DECIMAL(38,18))) AS DOUBLE) AS s
                FROM es
                JOIN {prev} r ON r.node = es.src
                JOIN outw o ON o.src = es.src
                GROUP BY es.dst
            ) c ON c.dst = nd.node
        )
"""


def _tr_oracle() -> str:
    steps = ",".join(
        _SQL_TR_STEP.format(prev=f"r{i}", next=f"r{i + 1}")
        for i in range(_TR_ITERS)
    )
    return f"""
        WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks,
                          LEN(STRING_SPLIT(text, ' ')) AS nt
                   FROM documents WHERE LEN(STRING_SPLIT(text, ' ')) >= 2),
        adj AS (SELECT LEAST(toks[i], toks[i + 1]) AS u,
                       GREATEST(toks[i], toks[i + 1]) AS v
                FROM t, UNNEST(generate_series(1, nt - 1)) AS g(i)
                WHERE toks[i] <> toks[i + 1]),
        e AS (SELECT u, v, CAST(COUNT(*) AS BIGINT) AS w
              FROM adj GROUP BY u, v),
        es AS (SELECT u AS src, v AS dst, w FROM e
               UNION ALL SELECT v, u, w FROM e),
        nodes AS (SELECT DISTINCT src AS node FROM es),
        n AS (SELECT COUNT(*) AS n FROM nodes),
        outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS w_out
                 FROM es GROUP BY src),
        r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / n.n AS rank
               FROM nodes CROSS JOIN n),
        {steps}
        SELECT node AS term, ROUND(rank, 9) AS rank
        FROM r{_TR_ITERS}
        ORDER BY ROUND(rank, 9) DESC, node
        LIMIT {_TR_TOPK}
    """


@query(
    "q_textrank_keywords",
    oracle=_tr_oracle(),
    operators=(23, 31, 44, 153, 340),
    doc=f"TextRank keyword extraction (#340, Mihalcea & Tarau, EMNLP "
    "2004 — public): PageRank over the word co-occurrence graph "
    "(adjacent-token pairs, canonically ordered, self-loops dropped, "
    f"co-occurrence counts as weights), {_TR_ITERS} exact iterations "
    f"at d=0.85, top-{_TR_TOPK} terms — unsupervised keywords that "
    "beat raw frequency because a word's importance flows from its "
    "neighbors'. Reuses the #153 exact-iteration discipline wholesale: "
    "per-edge contributions rank·(w/w_out) are identical IEEE trees, "
    "per-node sums go through DECIMAL(38,18), every iteration "
    "quantizes to ROUND(12) so the rank vector stays bit-identical "
    "through all iterations; the oracle unrolls them as chained CTEs. "
    "Scale: adjacency pairs build ROW-LOCALLY from the token array "
    "(no position self-join); the graph aggregates to O(vocab²) "
    "edges before any iteration; each step is one join + one "
    "groupBy(dst), and the edge list is localCheckpointed once.",
    bench=False,
)
def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = F.split("text", " ")
    base = d.select(toks.alias("toks"), F.size(toks).alias("nt")).filter(
        F.col("nt") >= 2
    )
    pair_structs = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.col("nt") - 1),
            lambda i: F.struct(
                F.least(
                    F.element_at(F.col("toks"), i),
                    F.element_at(F.col("toks"), i + 1),
                ).alias("u"),
                F.greatest(
                    F.element_at(F.col("toks"), i),
                    F.element_at(F.col("toks"), i + 1),
                ).alias("v"),
            ),
        ),
        lambda s: s["u"] != s["v"],
    )
    e = (
        base.select(F.explode(pair_structs).alias("pr"))
        .select(F.col("pr.u").alias("u"), F.col("pr.v").alias("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    es = (
        e.select(F.col("u").alias("src"), F.col("v").alias("dst"), "w")
        .unionAll(e.select(F.col("v").alias("src"), F.col("u").alias("dst"), "w"))
        .localCheckpoint()  # loop invariant: every iteration joins it
    )
    nodes = es.select(F.col("src").alias("node")).distinct().localCheckpoint()
    n = nodes.agg(F.count(F.lit(1)).alias("n"))
    outw = (
        es.groupBy("src").agg(F.sum("w").cast("bigint").alias("w_out"))
        .localCheckpoint()
    )
    r = nodes.crossJoin(F.broadcast(n)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    for _ in range(_TR_ITERS):
        contrib = (
            es.join(r.withColumnRenamed("node", "src"), "src")
            .join(outw, "src")
            .select(
                "dst",
                (
                    F.col("rank") * (F.col("w").cast("double") / F.col("w_out"))
                ).alias("contrib"),
            )
            .groupBy("dst")
            .agg(F.sum(F.col("contrib").cast(_TR_DEC)).cast("double").alias("s"))
        )
        r = (
            nodes.crossJoin(F.broadcast(n))
            .join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                F.round(
                    F.lit(0.15).cast("double") / F.col("n")
                    + F.lit(0.85).cast("double")
                    * F.coalesce(F.col("s"), F.lit(0.0).cast("double")),
                    12,
                ).alias("rank"),
            )
        )
    return (
        r.select(F.col("node").alias("term"), F.round("rank", 9).alias("rank"))
        .orderBy(F.desc("rank"), "term")
        .limit(_TR_TOPK)
    )


# ---------------------------------------------------------------------------
# #350 naive_bayes — multinomial NB lang classifier, train/eval
# ---------------------------------------------------------------------------


@query(
    "q_naive_bayes",
    oracle="""
        WITH train AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
        test AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
        langs AS (
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM train GROUP BY lang
        ),
        nd AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n FROM langs),
        ttok AS (
            SELECT lang, UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM train
        ),
        tc AS (
            SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c
            FROM ttok GROUP BY lang, tok
        ),
        tl AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS t_l FROM tc
               GROUP BY lang),
        vocab AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM ttok),
        stok AS (
            SELECT doc_id, lang AS true_lang,
                   UNNEST(STRING_SPLIT(text, ' ')) AS tok
            FROM test
        ),
        terms AS (
            SELECT s.doc_id, s.true_lang, l.lang,
                   LN((COALESCE(tc.c, 0) + 1)
                      / CAST(tl.t_l + vocab.v AS DOUBLE)) AS term
            FROM stok s
            CROSS JOIN langs l
            LEFT JOIN tc ON tc.lang = l.lang AND tc.tok = s.tok
            JOIN tl ON tl.lang = l.lang
            CROSS JOIN vocab
        ),
        scores AS (
            SELECT t.doc_id, t.true_lang, t.lang,
                   ROUND(LN(CAST(l.n_docs AS DOUBLE) / nd.n)
                         + CAST(SUM(CAST(t.term AS DECIMAL(38,18)))
                                AS DOUBLE), 9) AS score
            FROM terms t
            JOIN langs l ON l.lang = t.lang
            CROSS JOIN nd
            GROUP BY t.doc_id, t.true_lang, t.lang, l.n_docs, nd.n
        ),
        pred AS (
            SELECT doc_id, true_lang, lang AS pred_lang,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY score DESC, lang) AS rn
            FROM scores
        )
        SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
        FROM pred WHERE rn = 1
        GROUP BY true_lang, pred_lang
        ORDER BY true_lang, pred_lang
    """,
    operators=(13, 23, 33, 66, 350),
    doc="Multinomial naive Bayes (#350), trained and evaluated "
    "entirely in the engine: Laplace-smoothed token likelihoods "
    "P(tok|lang) = (c+1)/(T_lang+V) and doc-count priors fit on the "
    "deterministic 80% train split (doc_id % 5 != 0), argmax "
    "log-posterior scoring on the held-out 20%, graded as the "
    "confusion matrix — the classical-ML upgrade over the heuristic "
    "lang-ID rule (#66) and the generative sibling of the logistic "
    "quality classifier (#222). Parity: every ln() term is an "
    "identical IEEE tree over exact integers; per-(doc,lang) sums go "
    "through DECIMAL(38,18); scores quantize at ROUND(9) before the "
    "argmax window with a lang tie-break. Scale: the (tok, lang) "
    "probability table is vocab-sized — broadcast it; scoring is one "
    "map-side join over the token stream + one groupBy(doc, lang); "
    "the 5x lang fan-out is the |classes| factor every NB scorer "
    "pays.",
    bench=False,
)
def q_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    train = d.filter(F.col("doc_id") % 5 != 0)
    test = d.filter(F.col("doc_id") % 5 == 0)
    langs = train.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    nd = langs.agg(F.sum("n_docs").cast("bigint").alias("n"))
    ttok = train.select("lang", F.explode(F.split("text", " ")).alias("tok"))
    tc = ttok.groupBy("lang", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tl = tc.groupBy("lang").agg(F.sum("c").cast("bigint").alias("t_l"))
    vocab = ttok.agg(F.countDistinct("tok").cast("bigint").alias("v"))
    stok = test.select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        F.explode(F.split("text", " ")).alias("tok"),
    )
    probs = (
        tc.join(tl, "lang")
        .crossJoin(F.broadcast(vocab))
        .select(
            "lang",
            "tok",
            F.log(
                (F.col("c") + 1)
                / (F.col("t_l") + F.col("v")).cast("double")
            ).alias("term"),
        )
    )
    # unseen-token fallback per lang: ln(1 / (T_l + V))
    fallback = (
        tl.crossJoin(F.broadcast(vocab))
        .select(
            "lang",
            F.log(
                F.lit(1) / (F.col("t_l") + F.col("v")).cast("double")
            ).alias("fb"),
        )
    )
    terms = (
        stok.crossJoin(F.broadcast(langs.select("lang", "n_docs")))
        .join(F.broadcast(probs), ["lang", "tok"], "left")
        .join(F.broadcast(fallback), "lang")
        .select(
            "doc_id",
            "true_lang",
            "lang",
            "n_docs",
            F.coalesce("term", "fb").alias("term"),
        )
    )
    scores = (
        terms.crossJoin(F.broadcast(nd))
        .groupBy("doc_id", "true_lang", "lang", "n_docs", "n")
        .agg(
            F.round(
                F.log(F.col("n_docs").cast("double") / F.col("n"))
                + F.sum(F.col("term").cast("decimal(38,18)")).cast("double"),
                9,
            ).alias("score")
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "lang")
    pred = scores.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return (
        pred.groupBy("true_lang", F.col("lang").alias("pred_lang"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("true_lang", "pred_lang")
    )


# ---------------------------------------------------------------------------
# #357 readability — Flesch reading ease via vowel-run syllables
# ---------------------------------------------------------------------------


@query(
    "q_readability",
    oracle="""
        WITH per AS (
            SELECT doc_id, lang,
                   CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS words,
                   CAST(LENGTH(REGEXP_REPLACE(text, '[aeiou]+', '@', 'g'))
                        - LENGTH(REGEXP_REPLACE(text, '[aeiou]+', '', 'g'))
                        AS BIGINT) AS syllables
            FROM documents
        ),
        scored AS (
            SELECT lang, words, syllables,
                   206.835 - 1.015 * CAST(words AS DOUBLE)
                   - 84.6 * (CAST(syllables AS DOUBLE) / words) AS fre
            FROM per WHERE words > 0
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               ROUND(CAST(SUM(CAST(words AS DECIMAL(38,6))) AS DOUBLE)
                     / COUNT(*), 9) AS avg_words,
               ROUND(CAST(SUM(CAST(CAST(syllables AS DOUBLE) / words
                                   AS DECIMAL(38,18))) AS DOUBLE)
                     / COUNT(*), 9) AS avg_syll_per_word,
               ROUND(CAST(SUM(CAST(fre AS DECIMAL(38,9))) AS DOUBLE)
                     / COUNT(*), 9) AS avg_fre
        FROM scored
        GROUP BY lang
        ORDER BY lang
    """,
    operators=(23, 41, 66, 357),
    doc="Flesch reading ease (#357): the classic readability score "
    "206.835 - 1.015·(words/sentences) - 84.6·(syllables/words) per "
    "doc (each fixture doc is one sentence — no terminal punctuation "
    "in the corpus, documented), averaged per lang — the quality "
    "signal CommonCrawl pipelines gate on beside Gopher rules (#174) "
    "and perplexity (#303), cheap enough to run inline at ingest. "
    "Syllables are approximated as VOWEL RUNS, counted row-locally "
    "as length(collapse-runs-to-one-char) - length(strip-runs) — two "
    "regexp_replace calls, no explode (Spark replaces globally by "
    "default; the oracle passes the 'g' flag for the identical "
    "semantics). Parity: counts integer; the two ratio averages sum "
    "through DECIMAL(38,18)/(38,9). Scale: pure row-local projection "
    "+ one groupBy(lang).",
    bench=False,
)
def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = _docs(spark, sf_dir).select(
        "lang",
        F.size(F.split("text", " ")).cast("bigint").alias("words"),
        (
            F.length(F.regexp_replace("text", "[aeiou]+", "@"))
            - F.length(F.regexp_replace("text", "[aeiou]+", ""))
        )
        .cast("bigint")
        .alias("syllables"),
    ).filter(F.col("words") > 0)
    fre = (
        F.lit(206.835)
        - F.lit(1.015) * F.col("words").cast("double")
        - F.lit(84.6) * (F.col("syllables").cast("double") / F.col("words"))
    )
    return (
        per.withColumn("fre", fre)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(
                F.sum(F.col("words").cast("decimal(38,6)")).cast("double")
                / F.count(F.lit(1)),
                9,
            ).alias("avg_words"),
            F.round(
                F.sum(
                    (F.col("syllables").cast("double") / F.col("words")).cast(
                        "decimal(38,18)"
                    )
                ).cast("double")
                / F.count(F.lit(1)),
                9,
            ).alias("avg_syll_per_word"),
            F.round(
                F.sum(F.col("fre").cast("decimal(38,9)")).cast("double")
                / F.count(F.lit(1)),
                9,
            ).alias("avg_fre"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# #363 conditional_entropy — bigram entropy rate per lang
# ---------------------------------------------------------------------------


@query(
    "q_conditional_entropy",
    oracle="""
        WITH t AS (
            SELECT lang, STRING_SPLIT(text, ' ') AS toks,
                   LEN(STRING_SPLIT(text, ' ')) AS n
            FROM documents WHERE LEN(STRING_SPLIT(text, ' ')) >= 2
        ),
        bg AS (
            SELECT lang, toks[i] AS x, toks[i + 1] AS y
            FROM t, UNNEST(GENERATE_SERIES(1, n - 1)) AS g(i)
        ),
        cxy AS (SELECT lang, x, y, CAST(COUNT(*) AS BIGINT) AS c
                FROM bg GROUP BY lang, x, y),
        cx AS (SELECT lang, x, CAST(SUM(c) AS BIGINT) AS cx
               FROM cxy GROUP BY lang, x),
        nn AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n FROM cxy
               GROUP BY lang),
        hc AS (
            SELECT c.lang,
                   CAST(SUM(CAST(-(CAST(c.c AS DOUBLE) / nn.n)
                                 * LN(CAST(c.c AS DOUBLE) / x.cx)
                                 AS DECIMAL(38,18))) AS DOUBLE) AS h_cond
            FROM cxy c
            JOIN cx x ON x.lang = c.lang AND x.x = c.x
            JOIN nn ON nn.lang = c.lang
            GROUP BY c.lang
        ),
        hu AS (
            SELECT x.lang,
                   CAST(SUM(CAST(-(CAST(x.cx AS DOUBLE) / nn.n)
                                 * LN(CAST(x.cx AS DOUBLE) / nn.n)
                                 AS DECIMAL(38,18))) AS DOUBLE) AS h_uni
            FROM cx x JOIN nn ON nn.lang = x.lang
            GROUP BY x.lang
        )
        SELECT h.lang, nn.n AS n_bigrams,
               ROUND(u.h_uni, 9) AS h_unigram,
               ROUND(h.h_cond, 9) AS h_conditional,
               ROUND(u.h_uni - h.h_cond, 9) AS info_gain_bits_nat
        FROM hc h
        JOIN hu u ON u.lang = h.lang
        JOIN nn ON nn.lang = h.lang
        ORDER BY h.lang
    """,
    operators=(23, 44, 276, 363),
    doc="Bigram conditional entropy (#363) per lang: H(next|prev) = "
    "-sum p(x,y)·ln p(y|x) over adjacent-token pairs, beside the "
    "unigram entropy H(X) and their difference (the mutual "
    "information of adjacent tokens) — the ENTROPY RATE estimate "
    "that separates repetitive/templated text (low H(next|prev), "
    "high predictability) from diverse prose, the "
    "information-theoretic twin of the perplexity gate (#303) and "
    "the sequential completion of column-pair MI (#276). Bigrams "
    "build row-locally from the token array; all counts BIGINT; "
    "every ln term is an identical IEEE tree summed through "
    "DECIMAL(38,18) with ROUND(9). Scale: the census is "
    "|lang x bigram vocab| cells, map-side combined; nothing touches "
    "row-level data after the first groupBy.",
    bench=False,
)
def q_conditional_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = F.split("text", " ")
    base = d.select("lang", toks.alias("toks"), F.size(toks).alias("n")).filter(
        F.col("n") >= 2
    )
    bg = base.select(
        "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.col("n") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("toks"), i).alias("x"),
                    F.element_at(F.col("toks"), i + 1).alias("y"),
                ),
            )
        ).alias("p"),
    ).select("lang", F.col("p.x").alias("x"), F.col("p.y").alias("y"))
    cxy = bg.groupBy("lang", "x", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    cx = cxy.groupBy("lang", "x").agg(F.sum("c").cast("bigint").alias("cx"))
    nn = cxy.groupBy("lang").agg(F.sum("c").cast("bigint").alias("n"))
    dec = "decimal(38,18)"
    hc = (
        cxy.join(cx, ["lang", "x"])
        .join(nn, "lang")
        .groupBy("lang")
        .agg(
            F.sum(
                (
                    -(F.col("c").cast("double") / F.col("n"))
                    * F.log(F.col("c").cast("double") / F.col("cx"))
                ).cast(dec)
            )
            .cast("double")
            .alias("h_cond")
        )
    )
    hu = (
        cx.join(nn, "lang")
        .groupBy("lang")
        .agg(
            F.sum(
                (
                    -(F.col("cx").cast("double") / F.col("n"))
                    * F.log(F.col("cx").cast("double") / F.col("n"))
                ).cast(dec)
            )
            .cast("double")
            .alias("h_uni")
        )
    )
    return (
        hc.join(hu, "lang")
        .join(nn, "lang")
        .select(
            "lang",
            F.col("n").alias("n_bigrams"),
            F.round("h_uni", 9).alias("h_unigram"),
            F.round("h_cond", 9).alias("h_conditional"),
            F.round(F.col("h_uni") - F.col("h_cond"), 9).alias(
                "info_gain_bits_nat"
            ),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# #366 learning_curve — classifier accuracy vs train-set size
# ---------------------------------------------------------------------------

_LC_FRACTIONS = (2, 4, 8)  # doc_id % 10 in [1..k] => 20/40/80% train


def _lc_sql_one(k: int) -> str:
    return f"""
        SELECT {k} AS train_tenths, n_train, n_test, n_correct,
               ROUND(CAST(n_correct AS DOUBLE) / n_test, 9) AS accuracy
        FROM (
            WITH train AS (SELECT * FROM documents
                           WHERE doc_id % 10 BETWEEN 1 AND {k}),
            test AS (SELECT * FROM documents WHERE doc_id % 10 = 0),
            langs AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
                      FROM train GROUP BY lang),
            nd AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n FROM langs),
            ttok AS (SELECT lang, UNNEST(STRING_SPLIT(text, ' ')) AS tok
                     FROM train),
            tc AS (SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c
                   FROM ttok GROUP BY lang, tok),
            tl AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS t_l FROM tc
                   GROUP BY lang),
            vocab AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
                      FROM ttok),
            stok AS (SELECT doc_id, lang AS true_lang,
                            UNNEST(STRING_SPLIT(text, ' ')) AS tok
                     FROM test),
            terms AS (
                SELECT s.doc_id, s.true_lang, l.lang,
                       LN((COALESCE(tc.c, 0) + 1)
                          / CAST(tl.t_l + vocab.v AS DOUBLE)) AS term
                FROM stok s
                CROSS JOIN langs l
                LEFT JOIN tc ON tc.lang = l.lang AND tc.tok = s.tok
                JOIN tl ON tl.lang = l.lang
                CROSS JOIN vocab
            ),
            scores AS (
                SELECT t.doc_id, t.true_lang, t.lang,
                       ROUND(LN(CAST(l.n_docs AS DOUBLE) / nd.n)
                             + CAST(SUM(CAST(t.term AS DECIMAL(38,18)))
                                    AS DOUBLE), 9) AS score
                FROM terms t
                JOIN langs l ON l.lang = t.lang
                CROSS JOIN nd
                GROUP BY t.doc_id, t.true_lang, t.lang, l.n_docs, nd.n
            ),
            pred AS (
                SELECT doc_id, true_lang, lang AS pred_lang,
                       ROW_NUMBER() OVER (PARTITION BY doc_id
                                          ORDER BY score DESC, lang) AS rn
                FROM scores
            )
            SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM train) AS n_train,
                   CAST(COUNT(*) AS BIGINT) AS n_test,
                   CAST(SUM(CASE WHEN true_lang = pred_lang THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_correct
            FROM pred WHERE rn = 1
        )
    """


@query(
    "q_learning_curve",
    oracle=" UNION ALL ".join(_lc_sql_one(k) for k in _LC_FRACTIONS)
    + " ORDER BY train_tenths",
    operators=(13, 23, 350, 366),
    doc="Learning curve (#366): the naive-Bayes lang classifier "
    "(#350) retrained at 20/40/80% train fractions (deterministic "
    "doc_id decile splits, FIXED holdout decile so the points are "
    "comparable), graded as accuracy per fraction — the "
    "data-scaling diagnostic that tells a pipeline whether MORE DATA "
    "or a better model is the next dollar (the flat-curve/steep-"
    "curve read every scaling-law study starts from, evaluated here "
    "entirely in-engine). Parity: three independent NB fits under "
    "the #350 discipline (exact counts, decimal ln-sums, ROUND(9) "
    "argmax); the curve unions three 1-row summaries. Scale: each "
    "fraction is one pass over its token stream with a broadcast "
    "prob table — the fractions could even share the test-token "
    "scan; fitting at f<1 costs LESS than the full fit by "
    "construction.",
    bench=False,
)
def q_learning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    test = d.filter(F.col("doc_id") % 10 == 0)
    out = None
    for k in _LC_FRACTIONS:
        train = d.filter(
            (F.col("doc_id") % 10 >= 1) & (F.col("doc_id") % 10 <= k)
        )
        langs = train.groupBy("lang").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs")
        )
        nd = langs.agg(F.sum("n_docs").cast("bigint").alias("n"))
        ttok = train.select(
            "lang", F.explode(F.split("text", " ")).alias("tok")
        )
        tc = ttok.groupBy("lang", "tok").agg(
            F.count(F.lit(1)).cast("bigint").alias("c")
        )
        tl = tc.groupBy("lang").agg(F.sum("c").cast("bigint").alias("t_l"))
        vocab = ttok.agg(F.countDistinct("tok").cast("bigint").alias("v"))
        stok = test.select(
            "doc_id",
            F.col("lang").alias("true_lang"),
            F.explode(F.split("text", " ")).alias("tok"),
        )
        probs = (
            tc.join(tl, "lang")
            .crossJoin(F.broadcast(vocab))
            .select(
                "lang",
                "tok",
                F.log(
                    (F.col("c") + 1)
                    / (F.col("t_l") + F.col("v")).cast("double")
                ).alias("term"),
            )
        )
        fallback = (
            tl.crossJoin(F.broadcast(vocab))
            .select(
                "lang",
                F.log(
                    F.lit(1) / (F.col("t_l") + F.col("v")).cast("double")
                ).alias("fb"),
            )
        )
        terms = (
            stok.crossJoin(F.broadcast(langs.select("lang", "n_docs")))
            .join(F.broadcast(probs), ["lang", "tok"], "left")
            .join(F.broadcast(fallback), "lang")
            .select(
                "doc_id",
                "true_lang",
                "lang",
                "n_docs",
                F.coalesce("term", "fb").alias("term"),
            )
        )
        scores = (
            terms.crossJoin(F.broadcast(nd))
            .groupBy("doc_id", "true_lang", "lang", "n_docs", "n")
            .agg(
                F.round(
                    F.log(F.col("n_docs").cast("double") / F.col("n"))
                    + F.sum(F.col("term").cast("decimal(38,18)")).cast(
                        "double"
                    ),
                    9,
                ).alias("score")
            )
        )
        w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "lang")
        pred = scores.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") == 1
        )
        n_train = train.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_train")
        )
        row = (
            pred.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_test"),
                F.sum(
                    F.when(F.col("true_lang") == F.col("lang"), 1)
                    .otherwise(0)
                )
                .cast("bigint")
                .alias("n_correct"),
            )
            .crossJoin(F.broadcast(n_train))
            .select(
                F.lit(k).alias("train_tenths"),
                "n_train",
                "n_test",
                "n_correct",
                F.round(
                    F.col("n_correct").cast("double") / F.col("n_test"), 9
                ).alias("accuracy"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("train_tenths")


# ---------------------------------------------------------------------------
# #367 mcnemar_test — paired comparison of two in-engine classifiers
# ---------------------------------------------------------------------------

_MN_LANGID_SQL = """
            SELECT doc_id, lang,
                   CASE WHEN GREATEST(s_de, s_en, s_es, s_fr, s_zh) = 0
                        THEN 'und'
                        WHEN s_de = GREATEST(s_de, s_en, s_es, s_fr, s_zh)
                        THEN 'de'
                        WHEN s_en = GREATEST(s_de, s_en, s_es, s_fr, s_zh)
                        THEN 'en'
                        WHEN s_es = GREATEST(s_de, s_en, s_es, s_fr, s_zh)
                        THEN 'es'
                        WHEN s_fr = GREATEST(s_de, s_en, s_es, s_fr, s_zh)
                        THEN 'fr'
                        ELSE 'zh' END AS pred_lang
            FROM (
                SELECT doc_id, lang,
                       LEN(LIST_INTERSECT(toks, ['der','die','und','ist','nicht','das','ein','mit'])) AS s_de,
                       LEN(LIST_INTERSECT(toks, ['the','and','is','of','to','a','in','that'])) AS s_en,
                       LEN(LIST_INTERSECT(toks, ['el','la','los','que','de','y','un','en'])) AS s_es,
                       LEN(LIST_INTERSECT(toks, ['le','la','les','et','est','un','une','dans'])) AS s_fr,
                       LEN(LIST_INTERSECT(toks, ['的','是','了','在','我','有','和','不'])) AS s_zh
                FROM (SELECT doc_id, lang, STRING_SPLIT(text, ' ') AS toks
                      FROM documents WHERE doc_id % 5 = 0)
            )
"""

_MN_NB_SQL = """
            WITH train AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
            test AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
            langs AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
                      FROM train GROUP BY lang),
            nd AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n FROM langs),
            ttok AS (SELECT lang, UNNEST(STRING_SPLIT(text, ' ')) AS tok
                     FROM train),
            tc AS (SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c
                   FROM ttok GROUP BY lang, tok),
            tl AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS t_l FROM tc
                   GROUP BY lang),
            vocab AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
                      FROM ttok),
            stok AS (SELECT doc_id, lang AS true_lang,
                            UNNEST(STRING_SPLIT(text, ' ')) AS tok
                     FROM test),
            terms AS (
                SELECT s.doc_id, s.true_lang, l.lang,
                       LN((COALESCE(tc.c, 0) + 1)
                          / CAST(tl.t_l + vocab.v AS DOUBLE)) AS term
                FROM stok s
                CROSS JOIN langs l
                LEFT JOIN tc ON tc.lang = l.lang AND tc.tok = s.tok
                JOIN tl ON tl.lang = l.lang
                CROSS JOIN vocab
            ),
            scores AS (
                SELECT t.doc_id, t.true_lang, t.lang,
                       ROUND(LN(CAST(l.n_docs AS DOUBLE) / nd.n)
                             + CAST(SUM(CAST(t.term AS DECIMAL(38,18)))
                                    AS DOUBLE), 9) AS score
                FROM terms t
                JOIN langs l ON l.lang = t.lang
                CROSS JOIN nd
                GROUP BY t.doc_id, t.true_lang, t.lang, l.n_docs, nd.n
            )
            SELECT doc_id, true_lang, lang AS nb_pred
            FROM (SELECT doc_id, true_lang, lang,
                         ROW_NUMBER() OVER (PARTITION BY doc_id
                                            ORDER BY score DESC, lang) AS rn
                  FROM scores)
            WHERE rn = 1
"""


@query(
    "q_mcnemar_test",
    oracle=f"""
        WITH heur AS ({_MN_LANGID_SQL}),
        nb AS ({_MN_NB_SQL}),
        paired AS (
            SELECT CAST(h.pred_lang = h.lang AS INT) AS heur_right,
                   CAST(n.nb_pred = n.true_lang AS INT) AS nb_right
            FROM heur h JOIN nb n ON n.doc_id = h.doc_id
        ),
        cellc AS (
            SELECT CAST(SUM(heur_right * nb_right) AS BIGINT) AS both_right,
                   CAST(SUM((1 - heur_right) * (1 - nb_right)) AS BIGINT)
                       AS both_wrong,
                   CAST(SUM(heur_right * (1 - nb_right)) AS BIGINT) AS b,
                   CAST(SUM((1 - heur_right) * nb_right) AS BIGINT) AS c
            FROM paired
        )
        SELECT both_right, both_wrong, b AS heur_only, c AS nb_only,
               ROUND(CASE WHEN b + c = 0 THEN 0
                          ELSE GREATEST(ABS(CAST(b AS DOUBLE) - c) - 1, 0)
                               * GREATEST(ABS(CAST(b AS DOUBLE) - c) - 1, 0)
                               / (b + c) END, 9) AS chi2_cc,
               CAST(CASE WHEN b + c = 0 THEN 0
                         ELSE GREATEST(ABS(CAST(b AS DOUBLE) - c) - 1, 0)
                              * GREATEST(ABS(CAST(b AS DOUBLE) - c) - 1, 0)
                              / (b + c) END > 3.841458820694124 AS INT)
                   AS significant
        FROM cellc
    """,
    operators=(13, 24, 350, 367),
    doc="McNemar's test (#367): the PAIRED model comparison between "
    "two classifiers this engine itself trains — the heuristic "
    "function-word lang-ID (#66) vs multinomial naive Bayes (#350) — "
    "on the same holdout docs: only the DISCORDANT pairs matter "
    "(docs exactly one model gets right), chi-square with continuity "
    "correction (|b-c|-1)^2/(b+c) against the df=1 5% critical "
    "value. This is how model swaps should be gated: two accuracies "
    "compared marginally ignore pairing and overstate significance. "
    "Both prediction pipelines are the graded ones from #66/#350 "
    "verbatim; all cells exact BIGINTs; one ROUND(9). Scale: two "
    "scoring passes + one doc-keyed join; the test itself is a "
    "1-row census.",
    bench=False,
)
def q_mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from zmaxion_spark.functions import text as T

    d = _docs(spark, sf_dir)
    test = d.filter(F.col("doc_id") % 5 == 0)
    heur = test.select(
        "doc_id",
        (T.lang_id(F.split("text", " ")) == F.col("lang"))
        .cast("int")
        .alias("heur_right"),
    )
    # Rebuild the NB per-doc predictions (the confusion-matrix query
    # aggregates them away); identical pipeline to #350.
    train = d.filter(F.col("doc_id") % 5 != 0)
    langs = train.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    nd = langs.agg(F.sum("n_docs").cast("bigint").alias("n"))
    ttok = train.select("lang", F.explode(F.split("text", " ")).alias("tok"))
    tc = ttok.groupBy("lang", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tl = tc.groupBy("lang").agg(F.sum("c").cast("bigint").alias("t_l"))
    vocab = ttok.agg(F.countDistinct("tok").cast("bigint").alias("v"))
    stok = test.select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        F.explode(F.split("text", " ")).alias("tok"),
    )
    probs = (
        tc.join(tl, "lang")
        .crossJoin(F.broadcast(vocab))
        .select(
            "lang",
            "tok",
            F.log(
                (F.col("c") + 1) / (F.col("t_l") + F.col("v")).cast("double")
            ).alias("term"),
        )
    )
    fallback = tl.crossJoin(F.broadcast(vocab)).select(
        "lang",
        F.log(F.lit(1) / (F.col("t_l") + F.col("v")).cast("double")).alias(
            "fb"
        ),
    )
    terms = (
        stok.crossJoin(F.broadcast(langs.select("lang", "n_docs")))
        .join(F.broadcast(probs), ["lang", "tok"], "left")
        .join(F.broadcast(fallback), "lang")
        .select(
            "doc_id",
            "true_lang",
            "lang",
            "n_docs",
            F.coalesce("term", "fb").alias("term"),
        )
    )
    scores = (
        terms.crossJoin(F.broadcast(nd))
        .groupBy("doc_id", "true_lang", "lang", "n_docs", "n")
        .agg(
            F.round(
                F.log(F.col("n_docs").cast("double") / F.col("n"))
                + F.sum(F.col("term").cast("decimal(38,18)")).cast("double"),
                9,
            ).alias("score")
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "lang")
    nb_pred = (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            (F.col("lang") == F.col("true_lang")).cast("int").alias("nb_right"),
        )
    )
    paired = heur.join(nb_pred, "doc_id")
    cells = paired.agg(
        F.sum(F.col("heur_right") * F.col("nb_right"))
        .cast("bigint")
        .alias("both_right"),
        F.sum((1 - F.col("heur_right")) * (1 - F.col("nb_right")))
        .cast("bigint")
        .alias("both_wrong"),
        F.sum(F.col("heur_right") * (1 - F.col("nb_right")))
        .cast("bigint")
        .alias("heur_only"),
        F.sum((1 - F.col("heur_right")) * F.col("nb_right"))
        .cast("bigint")
        .alias("nb_only"),
    )
    b, c = F.col("heur_only"), F.col("nb_only")
    # Edwards' correction clamps |b-c|-1 at zero: when b == c > 0 the
    # statistic is exactly 0, not 1/(b+c).
    corr = F.greatest(F.abs(b.cast("double") - c) - 1, F.lit(0.0))
    chi = F.when(b + c == 0, F.lit(0.0)).otherwise(corr * corr / (b + c))
    return cells.select(
        "both_right",
        "both_wrong",
        "heur_only",
        "nb_only",
        F.round(chi, 9).alias("chi2_cc"),
        (chi > 3.841458820694124).cast("int").alias("significant"),
    )
