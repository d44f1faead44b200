"""Text-retrieval operators (SURVEY §2.15, #149–#151).

The search-engine layer over the `documents` corpus: inverted-index
posting statistics, BM25 relevance scoring for a fixed query, and
windowed token co-occurrence with PMI association scores (the
classic pre-embedding distributional-semantics pass).

Float discipline: integer statistics stay integer end-to-end;
transcendental scores (BM25, PMI) are computed as the identical IEEE
expression tree over identical operands on both engines and ROUNDed
to 9 decimals — the ln() last-ulp absorption proven by q_tf_idf in
round 1.

Scale themes at 100 TB:
- posting statistics partial-aggregate before their one vocab-keyed
  shuffle; vocabulary-sized sides broadcast back onto tf tables;
- query-term scoring filters the exploded token stream BEFORE any
  aggregation, so the scan prunes to matching terms immediately;
- co-occurrence pairs are built ROW-LOCALLY with array higher-order
  functions (no position self-join, no array duplication across an
  exchange) — the only shuffle carries (pair, count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zmaxion_spark.catalog import load_table
from zmaxion_spark.queries.registry import query


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# ---------------------------------------------------------------------------
# #149 inverted_index — posting-list statistics per term
# ---------------------------------------------------------------------------


@query(
    "q_inverted_index",
    oracle="""
        WITH tok AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term
                     FROM documents),
        tf AS (SELECT term, doc_id, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        st AS (SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf,
                      MAX(tf) AS max_tf
               FROM tf GROUP BY term),
        top AS (SELECT tf.term, MIN(tf.doc_id) AS top_doc
                FROM tf JOIN st USING (term)
                WHERE tf.tf = st.max_tf GROUP BY tf.term)
        SELECT term, df, total_tf, max_tf, top_doc
        FROM st JOIN top USING (term)
    """,
    operators=(23, 41, 149),
    doc="Inverted-index posting statistics (#149): per term, the "
    "document frequency, corpus term frequency, peak within-doc "
    "frequency, and the argmax document (lowest doc_id among ties — "
    "a deterministic tiebreak, required for cross-engine identity). "
    "Two partial-aggregated groupBys (doc-term, then term); the "
    "vocab-sized stats broadcast back onto the tf table for the "
    "argmax filter. At 100 TB this is the build side of a search "
    "index: postings partition by term hash, and no stage ever holds "
    "more than (term, doc, count) triples.",
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = _docs(spark, sf_dir).select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = tok.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    st = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("total_tf"),
        F.max("tf").alias("max_tf"),
    )
    top = (
        tf.join(F.broadcast(st.select("term", "max_tf")), "term")
        .filter(F.col("tf") == F.col("max_tf"))
        .groupBy("term")
        .agg(F.min("doc_id").alias("top_doc"))
    )
    return st.join(top, "term").select(
        "term", "df", "total_tf", "max_tf", "top_doc"
    )


# ---------------------------------------------------------------------------
# #150 bm25_scoring — fixed-query relevance over the corpus
# ---------------------------------------------------------------------------

_BM25_TERMS = ("scan", "join", "vector", "stream")
_BM25_K1 = 1.2
_BM25_B = 0.75


@query(
    "q_bm25_scoring",
    oracle=f"""
        WITH tok AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term
                     FROM documents),
        dl AS (SELECT doc_id, LEN(STRING_SPLIT(text, ' ')) AS dl FROM documents),
        gl AS (SELECT COUNT(*) AS n_docs,
                      CAST(SUM(CAST(LEN(STRING_SPLIT(text, ' ')) AS DECIMAL(38,6)))
                           AS DOUBLE) / COUNT(*) AS avgdl
               FROM documents),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
               WHERE term IN {tuple(_BM25_TERMS)!r} GROUP BY 1, 2),
        dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term)
        SELECT tf.doc_id,
               COUNT(*) AS n_matched,
               ROUND(CAST(SUM(CAST(
                   LN(1 + (n_docs - df + 0.5) / (df + 0.5))
                   * (tf * ({_BM25_K1} + 1))
                   / (tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl / avgdl))
               AS DECIMAL(38,6))) AS DOUBLE), 9) AS bm25
        FROM tf
        JOIN dfq USING (term)
        JOIN dl ON dl.doc_id = tf.doc_id
        CROSS JOIN gl
        GROUP BY tf.doc_id
    """,
    operators=(24, 43, 150),
    doc="BM25 relevance scoring (#150) for a fixed 4-term query: "
    "idf(t)·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) summed over matched "
    "terms. The exploded token stream filters to query terms BEFORE "
    "the tf aggregation, so the heavy scan prunes immediately "
    "(predicate pushdown would reach a posting-list store directly at "
    "scale); df and the global avgdl ride broadcast joins (vocab- and "
    "1-row-sized). Per-term scores are identical IEEE trees on both "
    "engines, summed through decimal(38,6) for order independence, "
    "and ROUND(9) absorbs ln()'s last ulp.",
)
def q_bm25_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round 12: spread(d) before the tokenize/explode chain was A/B'd
    # and REJECTED — old min 1.30 s vs new 1.93 s (old won every
    # cycle; q_rrf_fusion, which composes this, read the same). The
    # shuffle moves the full text payload, which costs more than the
    # post-spread parallelism buys (OPTIMIZATION_r12.md).
    d = _docs(spark, sf_dir)
    toks = F.split("text", " ")
    tok = d.select("doc_id", F.explode(toks).alias("term")).filter(
        F.col("term").isin(*_BM25_TERMS)
    )
    dl = d.select("doc_id", F.size(toks).alias("dl"))
    gl = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.size(toks).cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avgdl"),
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        1
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + _BM25_K1 * (
        1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")
    )
    per_term = idf * (F.col("tf") * (_BM25_K1 + 1)) / denom
    return (
        tf.join(F.broadcast(dfq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(gl))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.round(
                F.sum(per_term.cast("decimal(38,6)")).cast("double"), 9
            ).alias("bm25"),
        )
    )


# ---------------------------------------------------------------------------
# #151 cooccurrence_pmi — windowed token pairs + PMI
# ---------------------------------------------------------------------------

_PMI_WINDOW = 2
_PMI_MIN_PAIR = 5


@query(
    "q_cooccurrence_pmi",
    oracle=f"""
        WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks,
                          LEN(STRING_SPLIT(text, ' ')) AS n
                   FROM documents WHERE LEN(STRING_SPLIT(text, ' ')) >= 2),
        pos AS (SELECT doc_id, toks, n, UNNEST(generate_series(1, n - 1)) AS i
                FROM t),
        pr AS (SELECT LEAST(toks[i], toks[j]) AS w_a,
                      GREATEST(toks[i], toks[j]) AS w_b
               FROM pos,
                    UNNEST(generate_series(i + 1, LEAST(i + {_PMI_WINDOW}, n)))
                        AS g(j)),
        uni AS (SELECT term, COUNT(*) AS n_term
                FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS term
                      FROM documents)
                GROUP BY term),
        tot AS (SELECT (SELECT COUNT(*) FROM pr) AS n_pairs,
                       (SELECT CAST(SUM(n_term) AS BIGINT) FROM uni) AS n_uni),
        pc AS (SELECT w_a, w_b, COUNT(*) AS n_ab FROM pr GROUP BY 1, 2)
        SELECT w_a, w_b, n_ab, ua.n_term AS n_a, ub.n_term AS n_b,
               ROUND(LN((CAST(n_ab AS DOUBLE) / n_pairs)
                        / ((CAST(ua.n_term AS DOUBLE) / n_uni)
                           * (CAST(ub.n_term AS DOUBLE) / n_uni))), 9) AS pmi
        FROM pc
        JOIN uni ua ON ua.term = w_a
        JOIN uni ub ON ub.term = w_b
        CROSS JOIN tot
        WHERE n_ab >= {_PMI_MIN_PAIR}
    """,
    operators=(23, 44, 151),
    doc=f"Windowed co-occurrence + PMI (#151): token pairs within a "
    f"±{_PMI_WINDOW} window (canonically ordered), pair counts, and "
    "pointwise mutual information ln(p(a,b)/(p(a)p(b))) — the "
    "distributional-association pass that precedes any embedding "
    "training. Pairs are built ROW-LOCALLY with nested array "
    "higher-order lambdas (no position self-join, no token array "
    "crossing an exchange); the only shuffles carry (pair, count) and "
    "(term, count). Unigram totals and the pair denominator ride "
    "broadcast 1-row aggregates. PMI is an identical IEEE tree on "
    "both engines with ROUND(9) absorbing ln()'s last ulp.",
)
def q_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = F.split("text", " ")
    base = d.select(F.col("doc_id"), toks.alias("toks"), F.size(toks).alias("n")).filter(
        F.col("n") >= 2
    )
    pair_structs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.col("n") - 1),
            lambda i: F.transform(
                F.sequence(i + 1, F.least(i + _PMI_WINDOW, F.col("n"))),
                lambda j: F.struct(
                    F.least(
                        F.element_at(F.col("toks"), i),
                        F.element_at(F.col("toks"), j),
                    ).alias("w_a"),
                    F.greatest(
                        F.element_at(F.col("toks"), i),
                        F.element_at(F.col("toks"), j),
                    ).alias("w_b"),
                ),
            ),
        )
    )
    pr = base.select(F.explode(pair_structs).alias("p")).select("p.w_a", "p.w_b")
    uni = (
        d.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_term"))
    )
    tot = pr.agg(F.count(F.lit(1)).alias("n_pairs")).crossJoin(
        uni.agg(F.sum("n_term").alias("n_uni"))
    )
    pc = (
        pr.groupBy("w_a", "w_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= _PMI_MIN_PAIR)
    )
    ua = F.broadcast(uni.select(F.col("term").alias("w_a"), F.col("n_term").alias("n_a")))
    ub = F.broadcast(uni.select(F.col("term").alias("w_b"), F.col("n_term").alias("n_b")))
    pmi = F.round(
        F.log(
            (F.col("n_ab").cast("double") / F.col("n_pairs"))
            / (
                (F.col("n_a").cast("double") / F.col("n_uni"))
                * (F.col("n_b").cast("double") / F.col("n_uni"))
            )
        ),
        9,
    )
    return (
        pc.join(ua, "w_a")
        .join(ub, "w_b")
        .crossJoin(F.broadcast(tot))
        .select("w_a", "w_b", "n_ab", "n_a", "n_b", pmi.alias("pmi"))
    )


# ---------------------------------------------------------------------------
# #195 positional phrase search
# ---------------------------------------------------------------------------

_PHRASE = ("table", "scan")


@query(
    "q_phrase_search",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id,
                   UNNEST(STRING_SPLIT(text, ' ')) AS term,
                   UNNEST(RANGE(1, LEN(STRING_SPLIT(text, ' ')) + 1)) AS pos
            FROM documents
        ),
        t0 AS (SELECT doc_id, pos FROM tok WHERE term = '{_PHRASE[0]}'),
        t1 AS (SELECT doc_id, pos FROM tok WHERE term = '{_PHRASE[1]}')
        SELECT t0.doc_id, COUNT(*) AS n_hits
        FROM t0 JOIN t1 ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
        GROUP BY t0.doc_id
    """,
    operators=(149, 195),
    doc=f"Positional phrase search (#195): the query side of the "
    f"inverted index — find every document containing the exact "
    f"phrase '{' '.join(_PHRASE)}' by intersecting POSITIONAL "
    "postings: term A's positions self-join term B's at offset +1, "
    "equi-keyed on (doc_id, position). This is how phrase and "
    "proximity queries run against a 100 TB index: per-term posting "
    "lists are already partitioned by term, the adjacency check is an "
    "equi-join (never a string re-scan of the corpus), and k-word "
    "phrases chain k-1 such joins with each step shrinking the "
    "candidate set.",
)
def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = _docs(spark, sf_dir).select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "term")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")
    t0 = tok.filter(F.col("term") == _PHRASE[0]).select("doc_id", "pos")
    t1 = tok.filter(F.col("term") == _PHRASE[1]).select(
        "doc_id", (F.col("pos") - 1).alias("pos")
    )
    return (
        t0.join(t1, ["doc_id", "pos"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


# ---------------------------------------------------------------------------
# #207 MMR diversified re-ranking
# ---------------------------------------------------------------------------

_MMR_LAM = 0.7
_MMR_K = 5
_MMR_CAND = 12


def _mmr_oracle() -> str:
    """Greedy MMR as K chained CTEs (argmax per query per step via
    QUALIFY) — generated, since each step references all prior picks."""
    from zmaxion_spark.queries.llm import _sql_cosine

    steps = []
    for t in range(2, _MMR_K + 1):
        prev = " UNION ALL ".join(
            f"SELECT qid, vec_id FROM s{i}" for i in range(1, t)
        )
        steps.append(f"""
        prev{t} AS ({prev}),
        s{t} AS (
            SELECT qid, vec_id, rel, {t} AS mmr_rank, score FROM (
                SELECT c.qid, c.vec_id, c.rel,
                       {_MMR_LAM!r} * c.rel - {1 - _MMR_LAM!r} * MAX(p.sim) AS score
                FROM cand c
                JOIN p ON p.qid = c.qid AND p.i = c.vec_id
                JOIN prev{t} s ON s.qid = p.qid AND s.vec_id = p.j
                WHERE NOT EXISTS (SELECT 1 FROM prev{t} x
                                  WHERE x.qid = c.qid AND x.vec_id = c.vec_id)
                GROUP BY c.qid, c.vec_id, c.rel
            ) QUALIFY ROW_NUMBER() OVER (PARTITION BY qid
                                         ORDER BY score DESC, vec_id) = 1
        )""")
    picks = " UNION ALL ".join(
        f"SELECT qid, vec_id, mmr_rank, score FROM s{i}"
        for i in range(1, _MMR_K + 1)
    )
    return f"""
        WITH q AS (SELECT vec_id AS qid, embedding AS qv
                   FROM embeddings WHERE vec_id < 3),
        scored AS (
            SELECT q.qid, e.vec_id, e.embedding,
                   {_sql_cosine('q.qv', 'e.embedding')} AS rel
            FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid
        ),
        cand AS (
            SELECT qid, vec_id, embedding, rel,
                   ROW_NUMBER() OVER (PARTITION BY qid
                                      ORDER BY rel DESC, vec_id) AS rn
            FROM scored QUALIFY rn <= {_MMR_CAND}
        ),
        p AS (
            SELECT a.qid, a.vec_id AS i, b.vec_id AS j,
                   {_sql_cosine('a.embedding', 'b.embedding')} AS sim
            FROM cand a JOIN cand b
              ON a.qid = b.qid AND a.vec_id <> b.vec_id
        ),
        s1 AS (
            SELECT qid, vec_id, rel, 1 AS mmr_rank,
                   {_MMR_LAM!r} * rel AS score
            FROM cand
            QUALIFY ROW_NUMBER() OVER (PARTITION BY qid
                                       ORDER BY {_MMR_LAM!r} * rel DESC,
                                                vec_id) = 1
        ),{",".join(steps)}
        SELECT qid, vec_id, CAST(mmr_rank AS INT) AS mmr_rank,
               ROUND(score, 9) AS mmr_score
        FROM ({picks})
    """


@query(
    "q_mmr_rerank",
    oracle=_mmr_oracle(),
    operators=(33, 72, 207),
    doc=f"MMR diversified re-ranking (#207): per query, the top-"
    f"{_MMR_CAND} cosine candidates are greedily re-ranked by maximal "
    f"marginal relevance (lambda={_MMR_LAM}) — each of the {_MMR_K} "
    "steps picks the candidate maximizing lam*relevance - "
    "(1-lam)*max-similarity-to-already-picked, the standard redundancy "
    "killer for RAG retrieval. Parity is HASH-EXACT, not heuristic: "
    "relevance and candidate-candidate similarities use the repo's "
    "left-fold cosine (bit-identical to DuckDB list_reduce), and the "
    "greedy argmax chain is unrolled into K deterministic dataframe "
    "steps here / K chained CTEs in the oracle, ties broken by vec_id. "
    "Scale shape: queries broadcast against the corpus scan for "
    "candidates (or LSH-pruned via #73), then all per-step work is "
    "bounded by k*candidates rows per query — the quadratic term "
    "never touches the corpus.",
)
def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from zmaxion_spark.functions.similarity import cosine

    lam, com = F.lit(_MMR_LAM), F.lit(1 - _MMR_LAM)
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            "embedding",
            cosine(F.col("qv"), F.col("embedding")).alias("rel"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("rel").desc(), "vec_id")
    # Materialize candidates ONCE (eager localCheckpoint): the greedy
    # loop references `cand` 3x per step — without truncation each step
    # would recompute the corpus-wide cosine scan.
    # cand/p/out are bounded at EVERY scale (3 fixed query ids ×
    # _MMR_CAND candidates → ≤36/≤396/≤15 rows), so coalesce(1) before
    # each checkpoint collapses the 32 near-empty post-shuffle
    # partitions the 5-step greedy loop was scheduling per iteration
    # (44 tiny stages measured).
    cand = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _MMR_CAND)
        .select("qid", "vec_id", "embedding", "rel")
        .coalesce(1)
        .localCheckpoint()
    )
    a = cand.select(
        F.col("qid").alias("pqid"),
        F.col("vec_id").alias("i"),
        F.col("embedding").alias("va"),
    )
    b = cand.select(
        F.col("qid").alias("pqid"),
        F.col("vec_id").alias("j"),
        F.col("embedding").alias("vb"),
    )
    p = (
        a.join(b, ["pqid"])
        .filter(F.col("i") != F.col("j"))
        .select("pqid", "i", "j", cosine(F.col("va"), F.col("vb")).alias("sim"))
        .coalesce(1)
        .localCheckpoint()
    )
    wpick = Window.partitionBy("qid").orderBy(F.col("score").desc(), "vec_id")
    s1 = (
        cand.withColumn("score", lam * F.col("rel"))
        .withColumn("pick", F.row_number().over(wpick))
        .filter(F.col("pick") == 1)
        .select("qid", "vec_id", F.lit(1).cast("int").alias("mmr_rank"), "score")
    )
    out = s1
    for t in range(2, _MMR_K + 1):
        prev = out.select("qid", "vec_id")
        maxsim = (
            p.join(
                prev.select(
                    F.col("qid").alias("pqid"), F.col("vec_id").alias("j")
                ),
                ["pqid", "j"],
            )
            .groupBy("pqid", "i")
            .agg(F.max("sim").alias("max_sim"))
        )
        pick = (
            cand.join(prev, ["qid", "vec_id"], "left_anti")
            .join(
                maxsim,
                (F.col("qid") == F.col("pqid")) & (F.col("vec_id") == F.col("i")),
            )
            .withColumn("score", lam * F.col("rel") - com * F.col("max_sim"))
            .withColumn("pick", F.row_number().over(wpick))
            .filter(F.col("pick") == 1)
            .select(
                "qid", "vec_id", F.lit(t).cast("int").alias("mmr_rank"), "score"
            )
        )
        # Checkpoint the accumulator: pick_t's plan embeds out_{t-1},
        # so an unbroken lineage replays every earlier argmax per step.
        out = out.unionByName(pick).coalesce(1).localCheckpoint()
    return out.select(
        "qid", "vec_id", "mmr_rank", F.round("score", 9).alias("mmr_score")
    )


# ---------------------------------------------------------------------------
# #209 reciprocal-rank fusion of a lexical and a semantic ranker
# ---------------------------------------------------------------------------

_RRF_C = 60
_RRF_TOPN = 20


def _rrf_oracle() -> str:
    from zmaxion_spark.queries.llm import _sql_cosine

    return f"""
        WITH tok AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term
                     FROM documents),
        dl AS (SELECT doc_id, LEN(STRING_SPLIT(text, ' ')) AS dl FROM documents),
        gl AS (SELECT COUNT(*) AS n_docs,
                      CAST(SUM(CAST(LEN(STRING_SPLIT(text, ' ')) AS DECIMAL(38,6)))
                           AS DOUBLE) / COUNT(*) AS avgdl
               FROM documents),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
               WHERE term IN {tuple(_BM25_TERMS)!r} GROUP BY 1, 2),
        dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        bm25 AS (
            SELECT tf.doc_id,
                   ROUND(CAST(SUM(CAST(
                       LN(1 + (n_docs - df + 0.5) / (df + 0.5))
                       * (tf * ({_BM25_K1} + 1))
                       / (tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl / avgdl))
                   AS DECIMAL(38,6))) AS DOUBLE), 9) AS bm25
            FROM tf
            JOIN dfq USING (term)
            JOIN dl ON dl.doc_id = tf.doc_id
            CROSS JOIN gl
            GROUP BY tf.doc_id
        ),
        lex AS (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r_lex
            FROM bm25 WHERE doc_id < 500
        ),
        qv AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 0),
        sem AS (
            SELECT e.vec_id AS doc_id,
                   ROW_NUMBER() OVER (
                       ORDER BY {_sql_cosine('e.embedding', 'qv.v')} DESC,
                                e.vec_id) AS r_sem
            FROM embeddings e CROSS JOIN qv
        ),
        fused AS (
            SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
                   lex.r_lex, sem.r_sem,
                   COALESCE(CAST(1 AS DOUBLE) / ({_RRF_C} + lex.r_lex), 0)
                   + COALESCE(CAST(1 AS DOUBLE) / ({_RRF_C} + sem.r_sem), 0)
                       AS rrf_score
            FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
        )
        SELECT doc_id, r_lex, r_sem,
               ROUND(rrf_score, 9) AS rrf_score,
               CAST(ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id) AS BIGINT)
                   AS rrf_rank
        FROM fused
        QUALIFY rrf_rank <= {_RRF_TOPN}
    """


@query(
    "q_rrf_fusion",
    oracle=_rrf_oracle(),
    operators=(150, 209),
    doc=f"Reciprocal-rank fusion (#209): a lexical ranking (BM25 over "
    "the fixed query terms) and a semantic ranking (cosine to a query "
    "embedding) are fused by summing 1/(60+rank) per ranker — the "
    "standard hybrid-search combiner, robust to incomparable score "
    "scales. Docs ranked by only one ranker contribute one term (full "
    f"outer join, missing rank -> 0); top-{_RRF_TOPN} fused docs "
    "returned with both source ranks graded. Scale shape: each ranker "
    "is its own pruned pipeline (posting-list filter / broadcast query "
    "vector), the fusion joins two rank-sized (not corpus-sized) "
    "relations, and adding a third ranker adds a term, not a rescan.",
)
def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from zmaxion_spark.functions.similarity import cosine

    bm25 = q_bm25_scoring(spark, sf_dir).select("doc_id", "bm25")
    lex = (
        bm25.filter(F.col("doc_id") < 500)
        .withColumn(
            "r_lex",
            F.row_number().over(Window.orderBy(F.col("bm25").desc(), "doc_id")),
        )
        .select("doc_id", "r_lex")
    )
    e = load_table(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("v"))
    sem = (
        e.crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine(F.col("embedding"), F.col("v")).alias("cos"),
        )
        .withColumn(
            "r_sem",
            F.row_number().over(Window.orderBy(F.col("cos").desc(), "doc_id")),
        )
        .select("doc_id", "r_sem")
    )
    one = F.lit(1).cast("double")
    fused = (
        lex.join(sem, "doc_id", "full_outer")
        .select(
            "doc_id",
            "r_lex",
            "r_sem",
            (
                F.coalesce(one / (_RRF_C + F.col("r_lex")), F.lit(0.0))
                + F.coalesce(one / (_RRF_C + F.col("r_sem")), F.lit(0.0))
            ).alias("rrf_score"),
        )
    )
    return (
        fused.withColumn(
            "rrf_rank",
            F.row_number()
            .over(Window.orderBy(F.col("rrf_score").desc(), "doc_id"))
            .cast("bigint"),
        )
        .filter(F.col("rrf_rank") <= _RRF_TOPN)
        .select(
            "doc_id", "r_lex", "r_sem",
            F.round("rrf_score", 9).alias("rrf_score"), "rrf_rank",
        )
    )


# ---------------------------------------------------------------------------
# #265 rank_metrics — NDCG@k + MRR grading the retrieval ranking
# ---------------------------------------------------------------------------

_RM_K = 10
_RM_TERMS = ("scan", "join", "vector", "stream")

_RM_ORACLE = f"""
    WITH tok AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term
                 FROM documents),
    dl AS (SELECT doc_id, LEN(STRING_SPLIT(text, ' ')) AS dl FROM documents),
    gl AS (SELECT COUNT(*) AS n_docs,
                  CAST(SUM(CAST(LEN(STRING_SPLIT(text, ' ')) AS DECIMAL(38,6)))
                       AS DOUBLE) / COUNT(*) AS avgdl
           FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
           WHERE term IN {tuple(_RM_TERMS)!r} GROUP BY 1, 2),
    dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    scored AS (
        SELECT tf.term, tf.doc_id,
               LEAST(tf.tf, 3) AS rel,
               ROUND(CAST(CAST(
                   LN(1 + (n_docs - df + 0.5) / (df + 0.5))
                   * (tf * ({_BM25_K1} + 1))
                   / (tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl / avgdl))
               AS DECIMAL(38,9)) AS DOUBLE), 9) AS s
        FROM tf JOIN dfq USING (term) JOIN dl ON dl.doc_id = tf.doc_id
        CROSS JOIN gl
    ),
    ranked AS (
        SELECT term, doc_id, rel, s,
               ROW_NUMBER() OVER (PARTITION BY term
                                  ORDER BY s DESC, doc_id) AS rnk,
               ROW_NUMBER() OVER (PARTITION BY term
                                  ORDER BY rel DESC, doc_id) AS ideal_rnk
        FROM scored
    ),
    dcg AS (
        SELECT term,
               CAST(SUM(CASE WHEN rnk <= {_RM_K} THEN CAST(
                   (POW(2, rel) - 1) / LOG2(rnk + 1) AS DECIMAL(38,6))
                   ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) AS dcg,
               CAST(SUM(CASE WHEN ideal_rnk <= {_RM_K} THEN CAST(
                   (POW(2, rel) - 1) / LOG2(ideal_rnk + 1) AS DECIMAL(38,6))
                   ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) AS idcg,
               MIN(CASE WHEN rel >= 2 THEN rnk END) AS first_rel,
               CAST(COUNT(*) AS BIGINT) AS n_results
        FROM ranked GROUP BY term
    )
    SELECT term, n_results,
           ROUND(dcg / idcg, 9) AS ndcg_at_k,
           ROUND(COALESCE(CAST(1 AS DOUBLE) / first_rel, 0.0), 9) AS mrr
    FROM dcg
"""


@query(
    "q_rank_metrics",
    oracle=_RM_ORACLE,
    operators=(150, 265),
    doc=f"Retrieval ranking quality (#265): NDCG@{_RM_K} and MRR per "
    "single-term query over the per-term BM25 ranking, with graded "
    "relevance labels derived deterministically from the data "
    "(rel = min(tf, 3) — the standard capped-gain convention). "
    "DCG = sum (2^rel - 1)/log2(rank+1) over the system ranking, "
    "IDCG from the ideal (rel desc) ordering, MRR = 1/rank of the "
    "first rel >= 2 hit. System ranks order by the ROUND(9)-quantized "
    "score (identical double on both engines) with doc_id tiebreak, "
    "so ranks are cross-engine deterministic; DCG terms are identical "
    "IEEE values summed through DECIMAL(38,6). The eval-side twin of "
    "the BM25 scorer (#150): a retrieval stack is not done until its "
    "ranking is GRADED, and this makes the grade itself a "
    "driver-checked quantity. Scale: per-query state is the top-k "
    "frontier; everything reduces by (term) after a rank window over "
    "candidate postings only.",
)
def q_rank_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = _docs(spark, sf_dir)
    toks = F.split("text", " ")
    tok = d.select("doc_id", F.explode(toks).alias("term")).filter(
        F.col("term").isin(*_RM_TERMS)
    )
    dl = d.select("doc_id", F.size(toks).alias("dl"))
    gl = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.size(toks).cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avgdl"),
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        1
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + _BM25_K1 * (
        1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")
    )
    score = F.round(
        (idf * (F.col("tf") * (_BM25_K1 + 1)) / denom)
        .cast("decimal(38,9)")
        .cast("double"),
        9,
    )
    scored = (
        tf.join(F.broadcast(dfq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(gl))
        .select(
            "term",
            "doc_id",
            F.least(F.col("tf"), F.lit(3)).alias("rel"),
            score.alias("s"),
        )
    )
    w_sys = Window.partitionBy("term").orderBy(F.col("s").desc(), "doc_id")
    w_ideal = Window.partitionBy("term").orderBy(F.col("rel").desc(), "doc_id")
    ranked = scored.select(
        "term",
        "rel",
        F.row_number().over(w_sys).alias("rnk"),
        F.row_number().over(w_ideal).alias("ideal_rnk"),
    )
    gain = F.pow(F.lit(2.0), F.col("rel")) - 1
    zero = F.lit(0).cast("decimal(38,6)")
    agg = ranked.groupBy("term").agg(
        F.sum(
            F.when(
                F.col("rnk") <= _RM_K,
                (gain / F.log2(F.col("rnk") + 1)).cast("decimal(38,6)"),
            ).otherwise(zero)
        )
        .cast("double")
        .alias("dcg"),
        F.sum(
            F.when(
                F.col("ideal_rnk") <= _RM_K,
                (gain / F.log2(F.col("ideal_rnk") + 1)).cast("decimal(38,6)"),
            ).otherwise(zero)
        )
        .cast("double")
        .alias("idcg"),
        F.min(F.when(F.col("rel") >= 2, F.col("rnk"))).alias("first_rel"),
        F.count(F.lit(1)).alias("n_results"),
    )
    return agg.select(
        "term",
        "n_results",
        F.round(F.col("dcg") / F.col("idcg"), 9).alias("ndcg_at_k"),
        F.round(
            F.coalesce(F.lit(1.0) / F.col("first_rel"), F.lit(0.0)), 9
        ).alias("mrr"),
    )


# ---------------------------------------------------------------------------
# #332 RM3 pseudo-relevance-feedback query expansion
# ---------------------------------------------------------------------------

_RM3_K_DOCS = 10
_RM3_K_TERMS = 10
_RM3_LAMBDA = "0.5"  # original-query mix weight (string-decimal literal)


@query(
    "q_rm3_expansion",
    oracle=f"""
        WITH tok AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term
                     FROM documents),
        dl AS (SELECT doc_id, LEN(STRING_SPLIT(text, ' ')) AS dl FROM documents),
        gl AS (SELECT COUNT(*) AS n_docs,
                      CAST(SUM(CAST(LEN(STRING_SPLIT(text, ' ')) AS DECIMAL(38,6)))
                           AS DOUBLE) / COUNT(*) AS avgdl
               FROM documents),
        tfq AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
                WHERE term IN {tuple(_BM25_TERMS)!r} GROUP BY 1, 2),
        dfq AS (SELECT term, COUNT(*) AS df FROM tfq GROUP BY term),
        scored AS (
            SELECT tfq.doc_id,
                   ROUND(CAST(SUM(CAST(
                       LN(1 + (n_docs - df + 0.5) / (df + 0.5))
                       * (tf * ({_BM25_K1} + 1))
                       / (tf + {_BM25_K1} * (1 - {_BM25_B}
                          + {_BM25_B} * dl / avgdl))
                   AS DECIMAL(38,6))) AS DOUBLE), 9) AS bm25
            FROM tfq
            JOIN dfq USING (term)
            JOIN dl ON dl.doc_id = tfq.doc_id
            CROSS JOIN gl
            GROUP BY tfq.doc_id
        ),
        topd AS (
            SELECT doc_id, bm25 FROM (
                SELECT doc_id, bm25,
                       ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rn
                FROM scored
            ) WHERE rn <= {_RM3_K_DOCS}
        ),
        wsum AS (
            SELECT CAST(SUM(CAST(bm25 AS DECIMAL(38,9))) AS DOUBLE) AS s
            FROM topd
        ),
        rm1 AS (
            SELECT t.term,
                   CAST(SUM(CAST(
                       (CAST(c.n AS DOUBLE) / dl.dl) * (topd.bm25 / wsum.s)
                   AS DECIMAL(38,18))) AS DOUBLE) AS p_rm1
            FROM topd
            JOIN (SELECT doc_id, term, COUNT(*) AS n FROM tok GROUP BY 1, 2) c
                 ON c.doc_id = topd.doc_id
            JOIN dl ON dl.doc_id = topd.doc_id
            JOIN (SELECT DISTINCT term FROM tok) t ON t.term = c.term
            CROSS JOIN wsum
            GROUP BY t.term
        ),
        mixed AS (
            SELECT term,
                   ROUND(CAST(CAST(CAST({_RM3_LAMBDA} AS DOUBLE)
                         * (CASE WHEN term IN {tuple(_BM25_TERMS)!r}
                                 THEN CAST(1 AS DOUBLE)
                                      / {len(_BM25_TERMS)}
                                 ELSE CAST(0 AS DOUBLE) END)
                         + (1 - CAST({_RM3_LAMBDA} AS DOUBLE)) * p_rm1
                         AS DECIMAL(38,18)) AS DOUBLE), 9) AS p_rm3
            FROM rm1
        )
        SELECT term, p_rm3 FROM (
            SELECT term, p_rm3,
                   ROW_NUMBER() OVER (ORDER BY p_rm3 DESC, term) AS rn
            FROM mixed
        ) WHERE rn <= {_RM3_K_TERMS}
        ORDER BY rn
    """,
    operators=(30, 150, 332),
    doc="RM3 pseudo-relevance-feedback expansion (#332), the classic "
    "IR query rewriter over the BM25 machinery (#150): score the "
    f"corpus for the seed query {_BM25_TERMS!r}, take the top "
    f"{_RM3_K_DOCS} docs as pseudo-relevant, build the relevance "
    "model P(t|RM1) = sum_d P(t|d) * w_d with document weights "
    "w_d = bm25_d / sum(bm25) and P(t|d) = tf/dl, then interpolate "
    f"with the uniform original-query model at lambda={_RM3_LAMBDA} "
    f"and emit the top {_RM3_K_TERMS} expansion terms. Parity: "
    "ROUNDED bm25 scores rank the doc cutoff (both engines rank "
    "identical 9-decimal values, ties by doc_id); the per-(term,doc) "
    "contributions are products of exact-integer divisions summed "
    "through DECIMAL(38,18) (tiny-magnitude discipline); the final "
    "mix rides ROUND(9) with term tiebreaks. Scale: only top-k docs' "
    "tokens enter the RM1 rollup (k rows joined against the token "
    "stream — a broadcast semi-join), the weight sum is a 1-row "
    "broadcast, and term ranking is a vocabulary-sized top-k.",
)
def q_rm3_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = _docs(spark, sf_dir)
    toks = F.split("text", " ")
    tok = d.select("doc_id", F.explode(toks).alias("term"))
    dl = d.select("doc_id", F.size(toks).alias("dl"))
    gl = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.size(toks).cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avgdl"),
    )
    tfq = (
        tok.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfq = tfq.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        1
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + _BM25_K1 * (
        1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")
    )
    per_term = idf * (F.col("tf") * (_BM25_K1 + 1)) / denom
    scored = (
        tfq.join(F.broadcast(dfq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(gl))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(per_term.cast("decimal(38,6)")).cast("double"), 9
            ).alias("bm25")
        )
    )
    topd = (
        scored.withColumn(
            "rn", F.row_number().over(Window.orderBy(F.desc("bm25"), "doc_id"))
        )
        .filter(F.col("rn") <= _RM3_K_DOCS)
        .select("doc_id", "bm25")
        .localCheckpoint(eager=True)
    )
    wsum = topd.agg(
        F.sum(F.col("bm25").cast("decimal(38,9)")).cast("double").alias("s")
    )
    counts = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("n"))
    rm1 = (
        F.broadcast(topd)
        .join(counts, "doc_id")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(wsum))
        .groupBy("term")
        .agg(
            F.sum(
                (
                    (F.col("n").cast("double") / F.col("dl"))
                    * (F.col("bm25") / F.col("s"))
                ).cast("decimal(38,18)")
            )
            .cast("double")
            .alias("p_rm1")
        )
    )
    lam = F.lit(float(_RM3_LAMBDA))
    p_q = F.when(
        F.col("term").isin(*_BM25_TERMS),
        F.lit(1.0) / F.lit(len(_BM25_TERMS)),
    ).otherwise(F.lit(0.0))
    mixed = rm1.select(
        "term",
        F.round(
            (lam * p_q + (1 - lam) * F.col("p_rm1"))
            .cast("decimal(38,18)")
            .cast("double"),
            9,
        ).alias("p_rm3"),
    )
    return (
        mixed.withColumn(
            "rn", F.row_number().over(Window.orderBy(F.desc("p_rm3"), "term"))
        )
        .filter(F.col("rn") <= _RM3_K_TERMS)
        .select("term", "p_rm3")
        .orderBy(F.desc("p_rm3"), "term")
    )
