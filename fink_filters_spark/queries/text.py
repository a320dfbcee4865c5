"""Text-analysis + multimodal queries over ``documents``
(functions/text.py, operators/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.text import (
    FP_BASE,
    FP_MOD,
    LANG_STOPWORDS,
    char_fingerprint,
)
from ..tables import load_table
from . import QuerySpec, e6

TOKS = lambda: F.split(F.lower(F.trim(F.col("text"))), r"\s+")  # noqa: E731


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + length stats (whitespace tokenizer)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = TOKS()
    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t).cast("long")
    )
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_calc"),
        F.size(toks).cast("long").alias("n_tokens"),
        # hash-stability: exact integer ppm (DESIGN.md "integer micro-units")
        _idiv(sum_len * 1000000, F.size(toks).cast("long")).alias(
            "mean_word_len_ppm"
        ),
    )


TEXT_STATS_SQL = """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_calc,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       (CAST(list_sum(list_transform(toks, t -> CAST(length(t) AS BIGINT))) AS BIGINT) * 1000000)
             // CAST(len(toks) AS BIGINT) AS mean_word_len_ppm
FROM (SELECT doc_id, text, string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents)
"""


def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language-ID heuristic; deterministic precedence en>fr>es>de."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.array_distinct(TOKS())
    hits = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in LANG_STOPWORDS.items()
    }
    pred = (
        F.when(
            (hits["en"] > 0)
            & (hits["en"] >= hits["fr"]) & (hits["en"] >= hits["es"]) & (hits["en"] >= hits["de"]),
            "en",
        )
        .when((hits["fr"] > 0) & (hits["fr"] >= hits["es"]) & (hits["fr"] >= hits["de"]), "fr")
        .when((hits["es"] > 0) & (hits["es"] >= hits["de"]), "es")
        .when(hits["de"] > 0, "de")
        .otherwise("und")
    )
    return docs.select(
        "doc_id", pred.alias("pred_lang"), (pred == F.col("lang")).alias("is_match")
    )


def _lang_sql() -> str:
    hit = {
        lang: f"len(list_intersect(words, {words!r}))"
        for lang, words in LANG_STOPWORDS.items()
    }
    return f"""
SELECT doc_id,
  CASE WHEN {hit['en']} > 0 AND {hit['en']} >= {hit['fr']} AND {hit['en']} >= {hit['es']} AND {hit['en']} >= {hit['de']} THEN 'en'
       WHEN {hit['fr']} > 0 AND {hit['fr']} >= {hit['es']} AND {hit['fr']} >= {hit['de']} THEN 'fr'
       WHEN {hit['es']} > 0 AND {hit['es']} >= {hit['de']} THEN 'es'
       WHEN {hit['de']} > 0 THEN 'de'
       ELSE 'und' END AS pred_lang,
  (CASE WHEN {hit['en']} > 0 AND {hit['en']} >= {hit['fr']} AND {hit['en']} >= {hit['es']} AND {hit['en']} >= {hit['de']} THEN 'en'
       WHEN {hit['fr']} > 0 AND {hit['fr']} >= {hit['es']} AND {hit['fr']} >= {hit['de']} THEN 'fr'
       WHEN {hit['es']} > 0 AND {hit['es']} >= {hit['de']} THEN 'es'
       WHEN {hit['de']} > 0 THEN 'de'
       ELSE 'und' END) = lang AS is_match
FROM (SELECT doc_id, lang, list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS words FROM documents)
"""


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial document fingerprint (functions.text.char_fingerprint)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", char_fingerprint("text").alias("fingerprint"))


TEXT_FP_SQL = f"""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
                      list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
         (a, b) -> (a * {FP_BASE} + b) % {FP_MOD}
       ) AS fingerprint
FROM documents
"""


QUALITY_THRESHOLD_PPM = 350000


def _idiv(a, b):
    """Exact integer floor-division for non-negative BIGINT Columns:
    subtracting ``a % b`` makes the numerator an exact multiple of ``b``,
    so the double division is exact for magnitudes < 2^53 (hash-stability:
    DESIGN.md "integer micro-units" — no engine-dependent rounding).

    A zero divisor yields 0, not an ANSI DIVIDE_BY_ZERO abort: the one
    zero-able divisor on this surface is length(text) == 0 for an empty
    document (split() guarantees n_tok >= 1), where "no characters" means
    a zero punctuation penalty, not a dead query. ONLY an exact zero is
    remapped — a NULL divisor (NULL text) must keep propagating NULL so
    the quality score stays NULL like the oracle's, not a fabricated
    500000 (round-7 review finding). CASE WHEN guarantees the division
    isn't evaluated on the zero branch; under ANSI, % and / with a NULL
    operand return NULL without raising."""
    q = ((a - a % b) / b).cast("long")
    return F.when(b == 0, F.lit(0).cast("long")).otherwise(q)


def quality_expr():
    """The composite quality score Column in exact integer parts-per-million
    (stopword ratio * 0.5 + punctuation penalty * 0.3 + length credit * 0.2,
    fixed weights) over a frame with ``text`` — the ONE Spark-side
    definition, shared by the quality query and the curation funnel so the
    score cannot drift between them. Pure integer arithmetic end to end, so
    the value is bit-identical in any engine."""
    toks = TOKS()
    all_stop = sorted({w for ws in LANG_STOPWORDS.values() for w in ws})
    n_tok = F.size(toks).cast("long")
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*all_stop))).cast("long")
    n_chars = F.length("text").cast("long")
    n_punct = (
        F.length("text") - F.length(F.regexp_replace("text", r"[^\w\s]", ""))
    ).cast("long")
    return (
        _idiv(stop_hits * 500000, n_tok)
        + F.lit(300000).cast("long")
        - _idiv(n_punct * 300000, n_chars)
        + F.least(F.lit(200000).cast("long"), n_tok * 2000)
    )


def quality_sql_expr() -> str:
    """DuckDB mirror of ``quality_expr`` as an expression string over a
    source providing ``text`` and ``toks`` (integer ppm; ``//`` truncates
    toward zero on non-negative ints exactly like the Spark-side _idiv)."""
    all_stop = sorted({w for ws in LANG_STOPWORDS.values() for w in ws})
    return (
        f"((CAST(len(list_filter(toks, t -> list_contains({all_stop!r}, t))) AS BIGINT) * 500000) // CAST(len(toks) AS BIGINT)\n"
        "             + 300000 - (CASE WHEN length(text) > 0 THEN (CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS BIGINT) * 300000) // CAST(length(text) AS BIGINT) ELSE 0 END)\n"
        "             + least(200000, CAST(len(toks) AS BIGINT) * 2000))"
    )


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score: stopword ratio + punctuation penalty + length
    credit (weights fixed; deterministic double tree)."""
    docs = load_table(spark, sf_dir, "documents")
    quality = quality_expr()
    return docs.select(
        "doc_id",
        quality.alias("quality_ppm"),
        (quality >= QUALITY_THRESHOLD_PPM).alias("is_good"),
    )


def _quality_sql() -> str:
    qe = quality_sql_expr()
    return f"""
SELECT doc_id,
       {qe} AS quality_ppm,
       {qe} >= {QUALITY_THRESHOLD_PPM} AS is_good
FROM (SELECT doc_id, text, string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents)
"""


# Gopher-inspired repetition gates (Rae et al. 2021 App. A1.1 thresholds the
# top-n-gram / duplicate-n-gram CHARACTER fractions around 0.2-0.3; these are
# the token-fraction analogues under the engine-wide tokenizer). Gopher
# applies a minimum word count ALONGSIDE the fraction thresholds — without
# the floor, every <=3-token document has top_tok_ppm >= 333334 and would be
# unconditionally "repetitive" (round-7 review finding).
REP_TOP_TOK_MAX_PPM = 300_000
REP_DUP_BIGRAM_MAX_PPM = 200_000
REP_MIN_TOKENS = 5


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition quality signals (the Gopher repetition
    filter family): multiplicity of the most frequent token and the
    duplicate-bigram fraction, as exact integer ppm, plus the combined
    repetitive verdict. Complements the corpus-wide dedup family: this is
    the per-document "does the text repeat ITSELF" gate every curation
    funnel applies before any cross-document work.

    Scale: all signals are row-local array folds inside codegen
    (functions/text.repetition_stats) — a 100 TB sweep runs at scan
    speed, zero shuffle, and the plan lint pins it that way.

    NULL-key alignment (round-7 audit class): NULL-text rows are
    filtered EXPLICITLY on both sides — the oracle's unnest would drop
    them while a Spark per-row select keeps them, the same dormant
    asymmetry shape the retention pair had. The verdict fires only at
    n_tok >= REP_MIN_TOKENS (Gopher's min-word-count companion rule);
    short documents are reported, not flagged."""
    from ..functions.text import repetition_stats

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    s = repetition_stats("text")
    top_ppm = _idiv(s["top_tok_cnt"] * 1_000_000, s["n_tok"])
    dup_ppm = _idiv(s["dup_bigrams"] * 1_000_000, s["n_bigrams"])
    return docs.select(
        "doc_id",
        s["n_tok"].alias("n_tok"),
        top_ppm.alias("top_tok_ppm"),
        s["n_bigrams"].alias("n_bigrams"),
        dup_ppm.alias("dup_bigram_ppm"),
        (
            (s["n_tok"] >= REP_MIN_TOKENS)
            & (
                (top_ppm > REP_TOP_TOK_MAX_PPM)
                | (dup_ppm > REP_DUP_BIGRAM_MAX_PPM)
            )
        ).alias("is_repetitive"),
    )


TEXT_REPETITION_SQL = f"""
WITH tk AS (
  SELECT doc_id, unnest(toks) AS tok
  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
        FROM documents WHERE text IS NOT NULL)
),
tc AS (SELECT doc_id, tok, count(*) AS c FROM tk GROUP BY doc_id, tok),
per AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
         CAST(max(c) AS BIGINT) AS top_cnt
  FROM tc GROUP BY doc_id
),
bg AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(toks) - 1),
                        i -> toks[i] || chr(31) || toks[i + 1]) AS grams
  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
        FROM documents WHERE text IS NOT NULL)
),
bstat AS (
  SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_bigrams,
         CAST(len(grams) - len(list_distinct(grams)) AS BIGINT) AS dup_bg
  FROM bg
)
SELECT p.doc_id, p.n_tok,
       (p.top_cnt * 1000000) // p.n_tok AS top_tok_ppm,
       b.n_bigrams,
       CASE WHEN b.n_bigrams > 0
            THEN (b.dup_bg * 1000000) // b.n_bigrams ELSE 0 END
           AS dup_bigram_ppm,
       (p.n_tok >= {REP_MIN_TOKENS}
        AND ((p.top_cnt * 1000000) // p.n_tok > {REP_TOP_TOK_MAX_PPM}
             OR CASE WHEN b.n_bigrams > 0
                     THEN (b.dup_bg * 1000000) // b.n_bigrams ELSE 0 END
                > {REP_DUP_BIGRAM_MAX_PPM})) AS is_repetitive
FROM per p JOIN bstat b ON p.doc_id = b.doc_id
"""


def q_mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: text -> opaque binary column -> native byte-level
    metadata (operators/multimodal.binary_meta; the reference's cutout
    ``stampData: binary`` precedent)."""
    from ..operators.multimodal import binary_meta

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "payload", F.encode(F.col("text"), "UTF-8")
    )
    return binary_meta(docs, "payload").select(
        "doc_id", F.col("media_bytes").alias("n_bytes"), F.col("media_md5").alias("digest")
    )


MM_META_SQL = """
SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, md5(text) AS digest
FROM documents
"""


_AVRO_DOC_SCHEMA = (
    '{"type":"record","name":"doc","fields":['
    '{"name":"doc_id","type":"long"},'
    '{"name":"lang","type":["null","string"]},'
    '{"name":"text","type":"string"}]}'
)


def q_mm_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro wire-format round trip, ORACLE-CHECKED: every documents row is
    encoded executor-side into a real one-record Avro OBJECT CONTAINER
    FILE (the production ZTF Kafka message framing — writer schema
    embedded, ``sources/avro_codec``) and decoded back through
    ``kafka_decode(value_format="avro")``; the comparison value hashes the
    decoded text (md5) so the round trip is pinned byte-exact while the
    output stays narrow. The oracle is the identity projection — any
    encode/decode drift (varint, union framing, container blocks, the
    Avro->Spark type map) breaks the hash match.

    Scale: both directions are Arrow-batched mapInPandas kernels; payload
    bytes stay on the executors (the same plan position a production
    ``from_avro``/``to_avro`` pair occupies)."""
    from ..sources import kafka_decode
    from ..sources.avro_codec import encode_container, parse_schema

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    parsed = parse_schema(_AVRO_DOC_SCHEMA)

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "value": [
                        encode_container(
                            [{"doc_id": int(i), "lang": lg, "text": tx}], parsed
                        )
                        for i, lg, tx in zip(
                            pdf["doc_id"], pdf["lang"], pdf["text"]
                        )
                    ]
                }
            )

    wire = docs.mapInPandas(enc, "value binary")
    decoded = kafka_decode(wire, value_format="avro", avro_schema=_AVRO_DOC_SCHEMA)
    return decoded.select(
        F.col("alert.doc_id").alias("doc_id"),
        F.col("alert.lang").alias("lang"),
        F.md5(F.encode(F.col("alert.text"), "UTF-8")).alias("digest"),
    )


MM_AVRO_SQL = "SELECT doc_id, lang, md5(text) AS digest FROM documents"


_AVRO_LOGICAL_SCHEMA = (
    '{"type":"record","name":"diaSource","fields":['
    '{"name":"doc_id","type":"long"},'
    '{"name":"midPointTai","type":{"type":"long","logicalType":"timestamp-micros"}},'
    '{"name":"obsDate","type":{"type":"int","logicalType":"date"}},'
    '{"name":"psFlux","type":{"type":"bytes","logicalType":"decimal",'
    '"precision":18,"scale":4}}]}'
)


def q_mm_avro_logical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro LOGICAL-TYPE round trip, ORACLE-CHECKED (round-9 verdict
    "What's missing" #1: real Rubin/ZTF schemas annotate with
    timestamp-micros / date / decimal): per documents row, deterministic
    timestamp/date/decimal values derived from doc_id are encoded
    executor-side into container files under an annotated Rubin-shaped
    schema, decoded back through ``kafka_decode(value_format="avro")``
    into properly TYPED Spark columns (TimestampType / DateType /
    DecimalType via ``avro_to_spark_type``), then projected to exact
    integers (unix micros, epoch days, scaled units) the DuckDB oracle
    recomputes directly. Any drift in the logical conversions — epoch
    arithmetic, two's-complement unscaled decimals, the type map — breaks
    the hash match.

    Scale: same plan position as mm_avro_roundtrip (two Arrow-batched
    mapInPandas kernels, payload bytes stay on the executors)."""
    import datetime as _pydt
    from decimal import Decimal as _Dec

    from ..sources import kafka_decode
    from ..sources.avro_codec import encode_container, parse_schema

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    parsed = parse_schema(_AVRO_LOGICAL_SCHEMA)
    utc = _pydt.timezone.utc
    epoch = _pydt.datetime(1970, 1, 1, tzinfo=utc)
    epoch_day = _pydt.date(1970, 1, 1)

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            vals = []
            for i in pdf["doc_id"]:
                i = int(i)
                vals.append(
                    encode_container(
                        [{
                            "doc_id": i,
                            "midPointTai": epoch + _pydt.timedelta(
                                microseconds=i * 1_000_003 + 123_456
                            ),
                            "obsDate": epoch_day + _pydt.timedelta(days=i % 20_000),
                            "psFlux": _Dec(i * 7919) / 10_000,
                        }],
                        parsed,
                    )
                )
            yield pd.DataFrame({"value": vals})

    wire = docs.mapInPandas(enc, "value binary")
    decoded = kafka_decode(
        wire, value_format="avro", avro_schema=_AVRO_LOGICAL_SCHEMA
    )
    return decoded.select(
        F.col("alert.doc_id").alias("doc_id"),
        F.unix_micros("alert.midPointTai").alias("ts_us"),
        F.datediff("alert.obsDate", F.lit("1970-01-01")).cast("long").alias("day_n"),
        (F.col("alert.psFlux") * 10_000).cast("long").alias("flux_e4"),
    )


MM_AVRO_LOGICAL_SQL = """
SELECT doc_id,
       CAST(doc_id * 1000003 + 123456 AS BIGINT) AS ts_us,
       CAST(doc_id % 20000 AS BIGINT) AS day_n,
       CAST(doc_id * 7919 AS BIGINT) AS flux_e4
FROM documents
"""


def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus TF-IDF: top-3 terms per document by tf * ln(N/df).

    The full large-scale text pipeline in one plan: explode terms ->
    per-(doc,term) counts (tf) -> per-term document frequency (df, broadcast
    back) -> score -> ranking window. Ranking compares ROUNDED scores so the
    cross-engine ordering is deterministic (ln() may differ by 1 ulp);
    term is the tiebreak.

    Scale: both aggs shuffle on term/(doc,term) with map-side partials; df
    (vocabulary-sized) broadcasts; the window partitions by doc_id. N (the
    corpus size) rides in the SAME plan as a broadcast single-row cross
    join — no separate count() job on the driver.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    terms = docs.select(
        "doc_id", F.explode(TOKS()).alias("term")
    ).filter(F.length("term") > 0)
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score_e6",
            e6(
                F.col("tf").cast("double")
                * F.log(F.col("__n") / F.col("df_t").cast("double")),
                None,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_e6"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "df_t", "score_e6", "rn")
    )


TFIDF_SQL = """
WITH terms AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM terms WHERE length(term) > 0
  GROUP BY doc_id, term
),
df_t AS (SELECT term, count(*) AS df_t FROM tf GROUP BY term),
scored AS (
  SELECT doc_id, tf.term, tf, df_t,
         CAST(round(CAST(tf AS DOUBLE) *
               ln(CAST((SELECT count(*) FROM documents) AS DOUBLE) / CAST(df_t AS DOUBLE)) * 1e6) AS BIGINT)
           AS score_e6
  FROM tf JOIN df_t ON tf.term = df_t.term
)
SELECT doc_id, term, tf, df_t, score_e6,
       CAST(rn AS INTEGER) AS rn
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score_e6 DESC, term ASC) AS rn
  FROM scored
)
WHERE rn <= 3
"""


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization (the pre-dedup cleanup pass): lowercase,
    strip non-alphanumerics, collapse runs of whitespace, trim. Pure
    codegen-native string expressions — one scan, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    return docs.select(
        "doc_id",
        F.length(norm).alias("norm_len"),
        F.when(norm == "", F.lit(0))
        .otherwise(F.size(F.split(norm, " ")))
        .cast("long")
        .alias("n_words"),
        (norm != F.lower(F.col("text"))).alias("changed"),
    )


TEXT_NORMALIZE_SQL = """
SELECT doc_id,
       CAST(length(norm) AS BIGINT) AS norm_len,
       CAST(CASE WHEN norm = '' THEN 0
                 ELSE len(string_split(norm, ' ')) END AS BIGINT) AS n_words,
       norm != lower(text) AS changed
FROM (
  SELECT doc_id, text,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                             ' +', ' ', 'g')) AS norm
  FROM documents
)
"""


SPARSE_COS_TAU = 0.85
SPARSE_COS_MAX_ID = 1000


def q_text_sparse_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-of-words TF-IDF cosine pairs (word-REORDERING-robust, the
    complement of shingle Jaccard) over an ABSOLUTE-bounded working set
    (doc_id < 1000). The bound — not ``max_df_frac`` — caps the
    posting join here because the synthetic corpus has a ~31-word
    vocabulary where every term is in >half the docs (a stopword by df),
    so all-pairs similarity is inherently quadratic in the slice: a
    corpus-fraction slice measured 56x wall-clock at 10x replication in
    STRESS, the absolute bound stays flat. On a real corpus the
    operator's df-fraction pruning is the scale lever
    (see ``sparse_cosine_pairs``)."""
    from ..operators.dedup import sparse_cosine_pairs

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < SPARSE_COS_MAX_ID
    )
    return sparse_cosine_pairs(docs, "doc_id", "text", tau=SPARSE_COS_TAU).select(
        "id_a", "id_b", e6("cosine", "cosine_e6")
    )


def _sparse_cosine_sql() -> str:
    from .dedup import _hash_sql

    return f"""
WITH toks AS (
  SELECT doc_id, {_hash_sql('w')} AS w
  FROM (
    SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
    FROM documents
    WHERE text IS NOT NULL AND doc_id < {SPARSE_COS_MAX_ID}
  )
),
tf AS (SELECT doc_id, w, count(*) AS tf FROM toks GROUP BY doc_id, w),
dfreq AS (SELECT w, count(*) AS dfr FROM tf GROUP BY w),
n AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
wt AS (
  SELECT tf.doc_id, tf.w,
         tf.tf * CAST(round(ln(CAST(n.n AS DOUBLE) / dfr) * 1000) AS BIGINT) AS wgt
  FROM tf JOIN dfreq ON tf.w = dfreq.w CROSS JOIN n
),
nrm AS (SELECT doc_id, sum(wgt * wgt) AS nn FROM wt GROUP BY doc_id),
dot AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(a.wgt * b.wgt) AS d
  FROM wt a JOIN wt b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b, CAST(round(c * 1e6) AS BIGINT) AS cosine_e6 FROM (
  SELECT id_a, id_b,
         CASE WHEN na.nn > 0 AND nb.nn > 0 THEN
           CAST(d AS DOUBLE) / sqrt(CAST(na.nn AS DOUBLE)) / sqrt(CAST(nb.nn AS DOUBLE))
         END AS c
  FROM dot JOIN nrm na ON na.doc_id = dot.id_a JOIN nrm nb ON nb.doc_id = dot.id_b
) WHERE c >= {SPARSE_COS_TAU}
"""


BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("spark", "merge", "window")  # the retrieval query terms
BM25_TOPK = 20


def q_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (Robertson/Sparck Jones; the classic lexical
    ranking TF-IDF cosine lacks): top-{BM25_TOPK} documents for a fixed
    query, scored sum_t idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))
    with idf = ln(1 + (N-df+0.5)/(df+0.5)), k1={BM25_K1}, b={BM25_B}.

    Determinism: per-doc tf for each query term is PIVOTED into fixed
    columns by conditional aggregation, so the 3-term score is ONE fixed
    arithmetic expression (no float sum whose order can differ between
    engines); ranking compares the rounded score with doc_id tiebreak.

    Scale: one explode -> one (doc) aggregation for lengths+pivoted tf;
    corpus stats (N, avgdl, per-term df) reduce to a single row broadcast
    back via cross join — the whole query is two shuffles and a top-k,
    no per-term join against a vocabulary table.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(TOKS()).alias("term")).filter(
        F.length("term") > 0
    )
    per_doc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum(F.when(F.col("term") == q, 1).otherwise(0)).alias(f"tf{i}")
            for i, q in enumerate(BM25_QUERY)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.avg("dl").alias("__avgdl"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0))
            .cast("double")
            .alias(f"__df{i}")
            for i in range(len(BM25_QUERY))
        ],
    )
    norm = F.lit(BM25_K1) * (
        F.lit(1 - BM25_B)
        + F.lit(BM25_B) * F.col("dl").cast("double") / F.col("__avgdl")
    )
    contribs = [
        F.log(
            F.lit(1.0)
            + (F.col("__n") - F.col(f"__df{i}") + F.lit(0.5))
            / (F.col(f"__df{i}") + F.lit(0.5))
        )
        * (F.col(f"tf{i}").cast("double") * F.lit(BM25_K1 + 1.0))
        / (F.col(f"tf{i}").cast("double") + norm)
        for i in range(len(BM25_QUERY))
    ]
    from functools import reduce as _reduce
    from operator import add as _add

    score = e6(_reduce(_add, contribs), None)
    scored = (
        per_doc.crossJoin(F.broadcast(stats))
        .withColumn("score_e6", score)
        .filter(F.col("score_e6") > 0)
    )
    # top-k via orderBy+limit (TakeOrderedAndProject — per-partition heaps,
    # no global-sort shuffle); the rank window then runs on <= TOPK rows
    top = scored.orderBy(F.desc("score_e6"), F.asc("doc_id")).limit(BM25_TOPK)
    w = Window.orderBy(F.desc("score_e6"), F.asc("doc_id"))
    return top.select(
        "doc_id",
        "dl",
        "score_e6",
        F.row_number().over(w).cast("long").alias("rank"),
    )


def _bm25_sql() -> str:
    nq = len(BM25_QUERY)
    tfs = ", ".join(
        f"sum(CASE WHEN term = '{q}' THEN 1 ELSE 0 END) AS tf{i}"
        for i, q in enumerate(BM25_QUERY)
    )
    dfs = ", ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df{i}"
        for i in range(nq)
    )
    contribs = " + ".join(
        f"ln(1.0 + (n - df{i} + 0.5) / (df{i} + 0.5))"
        f" * (CAST(tf{i} AS DOUBLE) * {BM25_K1 + 1.0})"
        f" / (CAST(tf{i} AS DOUBLE) + {BM25_K1} * ({1 - BM25_B} + {BM25_B} * CAST(dl AS DOUBLE) / avgdl))"
        for i in range(nq)
    )
    return f"""
WITH terms AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
  FROM documents
),
per_doc AS (
  SELECT doc_id, count(*) AS dl, {tfs}
  FROM terms WHERE length(term) > 0 GROUP BY doc_id
),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl, {dfs} FROM per_doc
),
scored AS (
  SELECT doc_id, dl, CAST(round(({contribs}) * 1e6) AS BIGINT) AS score_e6
  FROM per_doc CROSS JOIN stats
)
SELECT doc_id, dl, score_e6, CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (ORDER BY score_e6 DESC, doc_id ASC) AS rank
  FROM scored WHERE score_e6 > 0
)
WHERE rank <= {BM25_TOPK}
"""


SPECS = [
    QuerySpec("text_stats", q_text_stats, TEXT_STATS_SQL, "token/length stats"),
    QuerySpec("text_normalize", q_text_normalize, TEXT_NORMALIZE_SQL,
              "lowercase/strip/collapse normalization (codegen-native)"),
    QuerySpec("text_tfidf", q_text_tfidf, TFIDF_SQL,
              "TF-IDF top-terms: explode -> tf -> df broadcast -> rank"),
    QuerySpec("text_lang_id", q_text_lang_id, _lang_sql(), "stopword lang-ID heuristic"),
    QuerySpec("text_fingerprint", q_text_fingerprint, TEXT_FP_SQL, "rolling-hash fingerprint"),
    QuerySpec("text_quality", q_text_quality, _quality_sql(), "composite quality score"),
    QuerySpec("mm_binary_meta", q_mm_binary_meta, MM_META_SQL, "binary column metadata"),
    QuerySpec(
        "mm_avro_roundtrip",
        q_mm_avro_roundtrip,
        MM_AVRO_SQL,
        "Avro container encode -> kafka_decode(avro) round trip vs identity oracle",
    ),
    QuerySpec(
        "mm_avro_logical",
        q_mm_avro_logical,
        MM_AVRO_LOGICAL_SQL,
        "Avro logical types (timestamp-micros/date/decimal) round trip into typed columns",
    ),
    QuerySpec("text_sparse_cosine", q_text_sparse_cosine, _sparse_cosine_sql(),
              "sparse TF-IDF cosine similarity join (bag-of-words pairs)"),
    QuerySpec("text_bm25", q_text_bm25, _bm25_sql(),
              "BM25 ranked retrieval: pivoted tf + single-row corpus stats"),
    QuerySpec("text_repetition_gates", q_text_repetition, TEXT_REPETITION_SQL,
              "Gopher-style within-doc repetition signals (row-local, no shuffle)"),
]
