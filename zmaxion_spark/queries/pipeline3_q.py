"""Round-3 training-data pipeline operators (SURVEY §2.14, #125–#132).

The corpus-engineering passes between "cleaned documents" and
"training shards" that rounds 1–2 did not yet cover: overlapping
context-window chunking, importance-weighted sampling, shard
manifests, a *distributed* deterministic global shuffle (no global
sort), integer-exact token histograms, domain-mix rebalancing,
percentile length gating, and incremental cross-corpus dedup.

All Spark-side plans are pure DataFrame algebra (codegen'd
expressions, HOF lambdas, windows) — no Python in any hot path — and
every query is oracle-paired through the md5 hash-parity and
integer-arithmetic disciplines proven in rounds 1–2 (doubles only
ever come from a SINGLE division of identical integer operands, so
both engines produce bit-identical values).

Scale notes inline per query; the common themes at 100 TB:
- determinism from content/id hashes, never runtime RNG, so reruns,
  engines and executors agree (resumable, auditable pipelines);
- shuffles only on narrow keys (8-byte hash words, shard ids) —
  document text never travels through an exchange unless it is the
  payload being written;
- global coordination only through broadcast 1-row / O(buckets)
  aggregates, never a driver-side collect of data rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from zmaxion_spark.catalog import load_table
from zmaxion_spark.queries.pipeline_q import _SQL_HASH_WORD, hash_bucket
from zmaxion_spark.queries.registry import query


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# ---------------------------------------------------------------------------
# #125 doc_chunking — overlapping context-window chunks
# ---------------------------------------------------------------------------

_CHUNK = 64
_STRIDE = 48


@query(
    "q_doc_chunking",
    oracle=f"""
        WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w,
                          LEN(STRING_SPLIT(text, ' ')) AS n
                   FROM documents),
        s AS (SELECT doc_id, n, w,
                     UNNEST(generate_series(0, CAST(n - 1 AS BIGINT), {_STRIDE}))
                         AS start
              FROM t)
        SELECT doc_id,
               CAST(start // {_STRIDE} AS BIGINT) AS chunk_idx,
               CAST(start AS BIGINT) AS start,
               CAST(LEN(list_slice(w, start + 1, LEAST(start + {_CHUNK}, n)))
                    AS BIGINT) AS chunk_len,
               MD5(ARRAY_TO_STRING(
                   list_slice(w, start + 1, LEAST(start + {_CHUNK}, n)), ' '))
                   AS chunk_md5
        FROM s
    """,
    operators=(44, 125),
    doc="Overlapping context-window chunking: each document becomes "
    f"ceil(n/{_STRIDE}) chunks of ≤{_CHUNK} tokens with {_CHUNK - _STRIDE}-token "
    "overlap (sequence → posexplode → slice), the pass that turns "
    "variable-length documents into training-window candidates. "
    "Row-local (explode fans out, no shuffle); chunk identity is the "
    "md5 of the chunk text so downstream dedup can run per-chunk. At "
    "100 TB this is a map-only stage — output partitioning inherits "
    "the scan.",
)
def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    base = d.select(
        "doc_id",
        F.split("text", " ").alias("w"),
        F.size(F.split("text", " ")).alias("n"),
    )
    starts = F.sequence(F.lit(0), F.col("n") - 1, F.lit(_STRIDE))
    exploded = base.select(
        "doc_id", "n", "w", F.explode(starts).alias("start")
    )
    chunk = F.slice(F.col("w"), F.col("start") + 1, _CHUNK)
    return exploded.select(
        "doc_id",
        F.expr(f"start div {_STRIDE}").cast("bigint").alias("chunk_idx"),
        F.col("start").cast("bigint").alias("start"),
        F.size(chunk).cast("bigint").alias("chunk_len"),
        F.md5(F.array_join(chunk, " ").cast("binary")).alias("chunk_md5"),
    )


# ---------------------------------------------------------------------------
# #126 sample_weighted — importance sampling by quality weight
# ---------------------------------------------------------------------------


@query(
    "q_weighted_sample",
    oracle=f"""
        WITH g AS (SELECT MAX(n_chars) AS mx FROM documents)
        SELECT doc_id, lang, n_chars,
               CAST({_SQL_HASH_WORD.format(col='doc_id')} AS DOUBLE)
                   / 4294967296.0 AS u,
               CAST(n_chars AS DOUBLE) / mx AS keep_p
        FROM documents, g
        WHERE CAST({_SQL_HASH_WORD.format(col='doc_id')} AS DOUBLE)
                  / 4294967296.0
              < CAST(n_chars AS DOUBLE) / mx
    """,
    operators=(24, 47, 126),
    doc="Importance-weighted sampling: accept document i with "
    "probability w_i = n_chars_i / max(n_chars) using the md5-uniform "
    "u_i = hash(doc_id)/2^32 — the deterministic twin of Bernoulli "
    "sampling, stable across runs/engines (u and w are each ONE IEEE "
    "division of identical integers, so parity is bit-exact). The "
    "global max is a broadcast 1-row aggregate; the filter itself is "
    "row-local — zero data shuffles at any scale. Swap w_i for any "
    "quality score column and this is the corpus resampling pass.",
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    mx = d.agg(F.max("n_chars").alias("mx"))
    word = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8),
        16,
        10,
    ).cast("long")
    u = word.cast("double") / F.lit(4294967296.0)
    keep_p = F.col("n_chars").cast("double") / F.col("mx")
    return (
        d.join(F.broadcast(mx))
        .select("doc_id", "lang", "n_chars", u.alias("u"), keep_p.alias("keep_p"))
        .filter(F.col("u") < F.col("keep_p"))
    )


# ---------------------------------------------------------------------------
# #127 shard_manifest — per-shard audit of the written corpus
# ---------------------------------------------------------------------------


@query(
    "q_shard_manifest",
    oracle=f"""
        WITH s AS (SELECT {_SQL_HASH_WORD.format(col='doc_id')} % 16 AS shard,
                          doc_id, lang, n_chars
                   FROM documents)
        SELECT shard,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
               MIN(doc_id) AS min_doc,
               MAX(doc_id) AS max_doc
        FROM s GROUP BY shard
    """,
    operators=(23, 25, 127),
    doc="Shard manifest: assign every document to one of 16 hash "
    "shards and emit the audit row a shard writer would record (doc "
    "count, char volume, language spread, id range). One groupBy on "
    "the 8-byte shard key — the manifest for a 100 TB corpus is 16–64k "
    "rows regardless of input size, and validates resumable writes "
    "(recompute manifest, diff against recorded).",
)
def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return (
        d.select(
            hash_bucket(F.col("doc_id"), 16).alias("shard"),
            "doc_id",
            "lang",
            "n_chars",
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


# ---------------------------------------------------------------------------
# #128 global_shuffle — deterministic permutation WITHOUT a global sort
# ---------------------------------------------------------------------------

_GS_BUCKETS = 32


@query(
    "q_global_shuffle",
    oracle=f"""
        WITH t AS (SELECT doc_id, MD5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
        b AS (SELECT doc_id, h,
                     CAST(('0x' || SUBSTR(h, 1, 8)) AS BIGINT) % {_GS_BUCKETS} AS bkt
              FROM t)
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (ORDER BY bkt, h, doc_id) AS BIGINT) AS pos,
               CAST((ROW_NUMBER() OVER (ORDER BY bkt, h, doc_id) - 1) % 8
                    AS BIGINT) AS shard
        FROM b
    """,
    operators=(30, 31, 128),
    doc="Deterministic global shuffle (the pre-training example-order "
    "pass) computed WITHOUT a global sort: rank within each of "
    f"{_GS_BUCKETS} hash buckets (distributed window), then add the "
    "broadcast prefix-sum of bucket sizes — position = bucket_offset + "
    "rank. The oracle's single ROW_NUMBER() OVER (ORDER BY bkt, h) "
    "proves the two-phase construction equals the logical total order. "
    "At 100 TB: one shuffle on the bucket key, an O(buckets) side "
    "table, no single-partition stage — this is how you materialize a "
    "reproducible epoch permutation at scale.",
)
def q_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    h = F.md5(F.col("doc_id").cast("string").cast("binary"))
    bkt = (
        F.conv(F.substring(F.col("h"), 1, 8), 16, 10).cast("long") % _GS_BUCKETS
    )
    t = d.select("doc_id", h.alias("h")).withColumn("bkt", bkt)
    rn = F.row_number().over(
        Window.partitionBy("bkt").orderBy("h", "doc_id")
    )
    ranked = t.withColumn("rn", rn)
    # O(buckets) side table: bucket sizes -> exclusive prefix sum.
    # The window below runs over <= _GS_BUCKETS rows, not data rows.
    sizes = t.groupBy("bkt").agg(F.count(F.lit(1)).alias("sz"))
    off = (
        F.sum("sz").over(
            Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
        )
    )
    offsets = sizes.select("bkt", F.coalesce(off, F.lit(0)).alias("offset"))
    pos = (F.col("offset") + F.col("rn")).cast("bigint")
    return (
        ranked.join(F.broadcast(offsets), "bkt")
        .select(
            "doc_id",
            pos.alias("pos"),
            ((pos - 1) % 8).cast("bigint").alias("shard"),
        )
    )


# ---------------------------------------------------------------------------
# #129 token_histogram — integer-exact log2 length buckets
# ---------------------------------------------------------------------------


@query(
    "q_token_histogram",
    oracle="""
        WITH t AS (SELECT lang, LEN(STRING_SPLIT(text, ' ')) AS n
                   FROM documents)
        SELECT lang,
               CAST(LENGTH(bin(CAST(n AS BIGINT))) AS BIGINT) AS log2_bucket,
               COUNT(*) AS n_docs,
               CAST(SUM(n) AS BIGINT) AS total_tokens,
               MIN(n) AS min_tokens,
               MAX(n) AS max_tokens
        FROM t GROUP BY 1, 2
    """,
    operators=(23, 43, 129),
    doc="Token-count histogram on log2 buckets per language — the "
    "length-distribution profile a tokenizer/packing stage reads. The "
    "log2 bucket is computed as the BIT LENGTH of the integer count "
    "(length of its binary string) — pure integer arithmetic, immune "
    "to the libm log() last-ulp divergence that would break hash "
    "parity at bucket boundaries. One groupBy on (lang, bucket): "
    "output is O(langs × 64) rows at any corpus size.",
)
def q_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    n = F.size(F.split("text", " "))
    bucket = F.length(F.conv(n.cast("string"), 10, 2)).cast("bigint")
    return (
        d.select("lang", n.alias("n"), bucket.alias("log2_bucket"))
        .groupBy("lang", "log2_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").cast("bigint").alias("total_tokens"),
            F.min("n").alias("min_tokens"),
            F.max("n").alias("max_tokens"),
        )
        .select(
            "lang", "log2_bucket", "n_docs", "total_tokens",
            F.col("min_tokens").cast("bigint"),
            F.col("max_tokens").cast("bigint"),
        )
    )


# ---------------------------------------------------------------------------
# #130 domain_mix — rebalance source proportions toward a target mix
# ---------------------------------------------------------------------------


@query(
    "q_domain_mix",
    oracle="""
        WITH c AS (SELECT source, COUNT(*) AS cnt FROM documents GROUP BY source),
        g AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total,
                     CAST(COUNT(*) AS BIGINT) AS ns
              FROM c)
        SELECT source, cnt,
               CAST(total // ns AS BIGINT) AS target,
               CAST(LEAST(cnt, total // ns) AS DOUBLE) / cnt AS keep_rate,
               CAST(LEAST(cnt, total // ns) AS BIGINT) AS expected_kept
        FROM c, g
    """,
    operators=(23, 24, 130),
    doc="Domain-mix rebalancing: compute each source's share, the "
    "uniform per-source target, and the down-sampling rate that "
    "equalizes the mix (the data-mixture pass before shard writing — "
    "swap the uniform target for any weights table). Two tiny "
    "aggregates + a broadcast cross join of a 1-row global; keep_rate "
    "is one division of identical integers → bit-exact parity. At "
    "100 TB the per-source stats are O(sources) rows; the actual "
    "resample then composes with q_weighted_sample's hash filter.",
)
def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    c = d.groupBy("source").agg(F.count(F.lit(1)).alias("cnt"))
    g = c.agg(
        F.sum("cnt").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("ns"),
    )
    target = F.expr("total div ns").cast("bigint")
    kept = F.least(F.col("cnt"), target)
    return c.join(F.broadcast(g)).select(
        "source",
        "cnt",
        target.alias("target"),
        (kept.cast("double") / F.col("cnt")).alias("keep_rate"),
        kept.cast("bigint").alias("expected_kept"),
    )


# ---------------------------------------------------------------------------
# #131 length_percentile_gate — drop the length-distribution tails
# ---------------------------------------------------------------------------


@query(
    "q_length_percentile_filter",
    oracle="""
        WITH r AS (SELECT doc_id, lang, n_chars,
                          ROW_NUMBER() OVER (PARTITION BY lang
                                             ORDER BY n_chars, doc_id) AS rn,
                          COUNT(*) OVER (PARTITION BY lang) AS cnt
                   FROM documents)
        SELECT doc_id, lang, n_chars
        FROM r
        WHERE rn * 100 > cnt * 5 AND rn * 100 <= cnt * 95
    """,
    operators=(30, 31, 131),
    doc="Percentile length gate: keep each language's documents "
    "between the exact P5 and P95 of n_chars — the outlier filter "
    "(truncated/garbage short docs, concatenation-artifact long docs) "
    "every corpus build runs. Rank thresholds are pure integer "
    "arithmetic (rn*100 vs cnt*5) — no interpolated-percentile float "
    "drift. One window shuffle on lang; at 100 TB partition by "
    "(lang, source) and the same integer rule holds per cell.",
)
def q_length_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    wc = Window.partitionBy("lang")
    r = d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("cnt"),
    )
    return r.filter(
        (F.col("rn") * 100 > F.col("cnt") * 5)
        & (F.col("rn") * 100 <= F.col("cnt") * 95)
    ).select("doc_id", "lang", "n_chars")


# ---------------------------------------------------------------------------
# #132 dedup_incremental — new batch vs existing corpus
# ---------------------------------------------------------------------------


@query(
    "q_dedup_incremental",
    oracle=f"""
        WITH fp AS (SELECT doc_id, MD5(text) AS fp,
                           {_SQL_HASH_WORD.format(col='doc_id')} % 5 AS grp
                    FROM documents)
        SELECT i.doc_id, i.fp
        FROM fp i
        WHERE i.grp = 0
          AND NOT EXISTS (SELECT 1 FROM fp c
                          WHERE c.grp <> 0 AND c.fp = i.fp)
    """,
    operators=(15, 69, 132),
    doc="Incremental cross-corpus dedup: an incoming batch (hash-split "
    "1/5 of documents) is anti-joined by content fingerprint against "
    "the existing corpus (the other 4/5) — the daily-ingest pass that "
    "admits only genuinely new content. Shuffles carry only (id, "
    "32-hex fingerprint), never text; the anti join is the same "
    "LeftAnti the planner bloom-filters at scale, and when the "
    "incoming batch is small it broadcasts.",
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    fp = d.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("fp"),
        (hash_bucket(F.col("doc_id"), 5)).alias("grp"),
    )
    incoming = fp.filter(F.col("grp") == 0).select("doc_id", "fp")
    corpus = fp.filter(F.col("grp") != 0).select("fp").distinct()
    return incoming.join(corpus, "fp", "left_anti").select("doc_id", "fp")


# ---------------------------------------------------------------------------
# #243 temperature-scaled mixture sampling (the multilingual recipe)
# ---------------------------------------------------------------------------

_TMIX_ALPHA = 0.3
_TMIX_TOTAL = 2000


@query(
    "q_temperature_mix",
    oracle=f"""
        WITH g AS (
            SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
        ),
        w AS (
            SELECT lang, n_docs,
                   CAST(POWER(n_docs, {_TMIX_ALPHA}) AS DECIMAL(38,9)) AS wq
            FROM g
        ),
        t AS (SELECT CAST(SUM(wq) AS DECIMAL(38,9)) AS denom FROM w),
        mix AS (
            SELECT lang, n_docs,
                   CAST(wq AS DOUBLE) / CAST(denom AS DOUBLE) AS p
            FROM w CROSS JOIN t
        ),
        tgt AS (
            SELECT lang, n_docs, p,
                   LEAST(CAST(FLOOR(p * {_TMIX_TOTAL}) AS BIGINT), n_docs)
                       AS target_n
            FROM mix
        ),
        ranked AS (
            SELECT d.lang,
                   ROW_NUMBER() OVER (
                       PARTITION BY d.lang
                       ORDER BY MD5('tmix:' || CAST(d.doc_id AS VARCHAR)),
                                d.doc_id) AS rn
            FROM documents d
        ),
        sampled AS (
            SELECT r.lang, COUNT(*) AS sampled_n
            FROM ranked r JOIN tgt ON tgt.lang = r.lang
            WHERE r.rn <= tgt.target_n
            GROUP BY r.lang
        )
        SELECT tgt.lang, tgt.n_docs,
               ROUND(tgt.p, 9) AS mix_weight,
               tgt.target_n,
               COALESCE(sampled.sampled_n, 0) AS sampled_n
        FROM tgt LEFT JOIN sampled ON sampled.lang = tgt.lang
    """,
    operators=(80, 243),
    doc=f"Temperature-scaled mixture sampling (#243): per-language "
    f"sampling weights p_i ∝ n_i^{_TMIX_ALPHA} (the mT5/XLM-R recipe "
    "that up-weights low-resource languages relative to proportional "
    "sampling), deterministic md5-ranked selection to the per-group "
    "targets, realized counts graded beside the weights. Parity "
    "detail: POWER() results quantize through DECIMAL(38,9) BEFORE "
    "the exact decimal normalization sum, so a last-ulp pow() "
    "difference can never flip a FLOOR at a target boundary. Scale "
    "shape: weights come from one |langs|-row aggregate; selection "
    "is a per-group rank window over a hash — at 100 TB swap the "
    "window for a hash-threshold filter (q_weighted_sample) and keep "
    "identical targets.",
)
def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    g = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    w = g.select(
        "lang",
        "n_docs",
        F.pow("n_docs", _TMIX_ALPHA).cast("decimal(38,9)").alias("wq"),
    )
    t = w.groupBy().agg(F.sum("wq").cast("decimal(38,9)").alias("denom"))
    mix = w.crossJoin(F.broadcast(t)).select(
        "lang",
        "n_docs",
        (F.col("wq").cast("double") / F.col("denom").cast("double")).alias("p"),
    )
    tgt = mix.select(
        "lang",
        "n_docs",
        "p",
        F.least(
            F.floor(F.col("p") * _TMIX_TOTAL).cast("bigint"), F.col("n_docs")
        ).alias("target_n"),
    )
    ranked = d.select(
        "lang",
        F.row_number()
        .over(
            Window.partitionBy("lang").orderBy(
                F.md5(
                    F.concat(F.lit("tmix:"), F.col("doc_id").cast("string")).cast(
                        "binary"
                    )
                ),
                "doc_id",
            )
        )
        .alias("rn"),
    )
    sampled = (
        ranked.join(F.broadcast(tgt.select("lang", "target_n")), "lang")
        .filter(F.col("rn") <= F.col("target_n"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("sampled_n"))
    )
    return (
        tgt.join(sampled, "lang", "left_outer")
        .select(
            "lang",
            "n_docs",
            F.round("p", 9).alias("mix_weight"),
            "target_n",
            F.coalesce(F.col("sampled_n"), F.lit(0)).alias("sampled_n"),
        )
    )


# ---------------------------------------------------------------------------
# #301 weighted reservoir sampling (Efraimidis-Spirakis A-ES)
# ---------------------------------------------------------------------------

_AES_K = 5


@query(
    "q_weighted_reservoir",
    oracle=f"""
        WITH u AS (
            SELECT doc_id, lang, n_chars,
                   CAST(CAST(('0x' || SUBSTR(MD5('aes:' ||
                       CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT)
                       AS DOUBLE) / 4503599627370496 AS uni
            FROM documents WHERE n_chars > 0
        ),
        keyed AS (
            SELECT doc_id, lang, n_chars,
                   ROUND(LN(uni) / n_chars, 9) AS es_key
            FROM u
        )
        SELECT lang, CAST(rnk AS BIGINT) AS rnk, doc_id,
               CAST(n_chars AS BIGINT) AS weight, es_key
        FROM (
            SELECT lang, doc_id, n_chars, es_key,
                   ROW_NUMBER() OVER (PARTITION BY lang
                       ORDER BY es_key DESC, doc_id) AS rnk
            FROM keyed
        ) WHERE rnk <= {_AES_K}
    """,
    operators=(30, 43, 126, 301),
    doc=f"Weighted reservoir sampling WITHOUT replacement (#301), the "
    "Efraimidis-Spirakis A-ES scheme: each item draws key u^(1/w) "
    f"(equivalently ln(u)/w, monotone) and the top-{_AES_K} keys per "
    "language ARE a weight-proportional sample without replacement — "
    "the distributed-sampling classic, because top-k by key is a "
    "MERGEABLE operation (each partition keeps its k best, merges "
    "keep the k best of those) where sequential reservoir algorithms "
    "are not. Contrast: #126 importance-weights rows, #80/#243 "
    "balance groups — neither draws an exact-size weighted sample. "
    "u is the md5-uniform (reproducible from doc_id alone); ln(u)/w "
    "is an identical IEEE tree both engines, and the rank orders by "
    "the ROUND(9) key (the libm-drift discipline — a last-ulp ln "
    "difference cannot flip selection) with doc_id ties. Scale: "
    "row-local keys + per-group top-k, map-side combinable; no "
    "global sort, no state.",
)
def q_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = _docs(spark, sf_dir).filter(F.col("n_chars") > 0)
    uni = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit("aes:"), F.col("doc_id").cast("string"))
                    .cast("binary")
                ),
                1,
                13,
            ),
            16,
            10,
        )
        .cast("long")
        .cast("double")
        / F.lit(4503599627370496.0)
    )
    keyed = d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.round(F.log(uni) / F.col("n_chars"), 9).alias("es_key"),
    )
    w = Window.partitionBy("lang").orderBy(F.desc("es_key"), "doc_id")
    return (
        keyed.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _AES_K)
        .select(
            "lang",
            F.col("rnk").cast("bigint").alias("rnk"),
            "doc_id",
            F.col("n_chars").cast("bigint").alias("weight"),
            "es_key",
        )
    )


# ---------------------------------------------------------------------------
# #306 greedy coverage maximization (source selection for curation)
# ---------------------------------------------------------------------------

_GC_K = 5


def _gc_oracle() -> str:
    """Unrolled greedy set cover: per round, the source with the most
    still-uncovered bigrams (ties to the lexicographically first
    source) joins the pick list and its bigrams join the covered set."""
    parts = ["""
        WITH t AS (
            SELECT source, STRING_SPLIT(text, ' ') AS toks FROM documents
        ),
        st AS MATERIALIZED (
            SELECT DISTINCT source, toks[i] || ' ' || toks[i + 1] AS bg
            FROM t, UNNEST(GENERATE_SERIES(1, LEN(toks) - 1)) AS g(i)
        ),
        p0 AS MATERIALIZED (SELECT CAST(NULL AS VARCHAR) AS source WHERE 1 = 0),
        c0 AS MATERIALIZED (SELECT CAST(NULL AS VARCHAR) AS bg WHERE 1 = 0)"""]
    for r in range(1, _GC_K + 1):
        parts.append(f""",
        g{r} AS MATERIALIZED (
            SELECT st.source, COUNT(*) AS gain FROM st
            WHERE st.source NOT IN (SELECT source FROM p{r - 1}
                                    WHERE source IS NOT NULL)
              AND st.bg NOT IN (SELECT bg FROM c{r - 1} WHERE bg IS NOT NULL)
            GROUP BY st.source
        ),
        pick{r} AS MATERIALIZED (
            SELECT {r} AS round, source, gain
            FROM g{r} ORDER BY gain DESC, source LIMIT 1
        ),
        p{r} AS MATERIALIZED (
            SELECT source FROM p{r - 1} WHERE source IS NOT NULL
            UNION ALL SELECT source FROM pick{r}
        ),
        c{r} AS MATERIALIZED (
            SELECT bg FROM c{r - 1} WHERE bg IS NOT NULL
            UNION SELECT st.bg FROM st JOIN pick{r} USING (source)
        )""")
    sel = " UNION ALL ".join(
        f"SELECT round, source, CAST(gain AS BIGINT) AS gain,"
        f" (SELECT CAST(COUNT(*) AS BIGINT) FROM c{r}) AS covered"
        f" FROM pick{r}"
        for r in range(1, _GC_K + 1)
    )
    return "".join(parts) + f" SELECT * FROM ({sel}) ORDER BY round"


@query(
    "q_greedy_coverage",
    oracle=_gc_oracle(),
    operators=(15, 23, 306),
    doc=f"Greedy coverage maximization (#306), the submodular source-"
    f"selection pass of data curation: {_GC_K} unrolled rounds each "
    "pick the source adding the most still-uncovered bigram contexts "
    "(ties to the first source name) — the classic (1−1/e)-approximate "
    "set cover, and the principled answer to 'which K crawls/dumps do "
    "I ingest FIRST for diversity' that per-source quality scores "
    "can't give (two high-quality near-identical sources add half the "
    "value). Emits per-round pick, marginal gain, and cumulative "
    "coverage — the diminishing-returns curve IS the deliverable. "
    "Integers end-to-end. Scale: the (source, bigram) incidence "
    "distinct-collapses first (the only data-sized pass); each round "
    "is an anti-join + count per source, picked via TakeOrdered; "
    "driver state is one row per round, the IVF-centroid discipline.",
    bench=False,
)
def q_greedy_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _docs(spark, sf_dir).select(
        "source", F.split("text", " ").alias("toks")
    )
    n = F.size("toks")
    pairs = F.zip_with(
        F.slice(F.col("toks"), 1, n - 1),
        F.slice(F.col("toks"), 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    st = (
        t.select("source", F.explode(pairs).alias("bg"))
        .distinct()
        .localCheckpoint(eager=True)  # consumed once per greedy round
    )
    picked: list = []
    covered = None  # DataFrame of covered bigrams
    out_rows = []
    for rnd in range(1, _GC_K + 1):
        remaining = st.filter(~F.col("source").isin(picked)) if picked else st
        if covered is not None:
            remaining = remaining.join(covered, "bg", "left_anti")
        gains = remaining.groupBy("source").agg(
            F.count(F.lit(1)).alias("gain")
        )
        top = gains.orderBy(F.desc("gain"), "source").limit(1).collect()
        if not top:
            # universe saturated: every remaining source adds nothing,
            # so the oracle's gain>0 pick CTE is empty too — stop.
            break
        pick = top[0]
        picked.append(pick.source)
        new_cov = st.filter(F.col("source") == pick.source).select("bg")
        covered = (
            new_cov if covered is None else covered.unionAll(new_cov)
        ).distinct().localCheckpoint(eager=True)
        out_rows.append((rnd, pick.source, int(pick.gain), covered.count()))
    return spark.createDataFrame(
        out_rows, "round int, source string, gain bigint, covered bigint"
    )
