"""Training-data pipeline operators, batch 2: paragraph dedup, repetition
quality signals, PII redaction, benchmark contamination, domain stats/caps.

Same discipline as plans/llmdata.py: every metric is a dual-dialect SQL
template (Spark = JVM codegen / higher-order array functions, DuckDB = the
oracle), inputs come from the driver's documents table, and anything the
synthetic corpus lacks (URLs, PII strings) is synthesized deterministically
inside the query — identically in both dialects — so the operator machinery
itself is what gets verified.

Scale notes are per-operator; the common theme: everything is
explode → hash-partitioned aggregation or equi-join, never all-pairs, and
per-doc work is linear in doc length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.contamination import BENCH_GRAM_N, bench_grams_cte as _bench_grams_cte
from ..functions.text import shingles_sql, words_sql
from ..sources.tables import load_table, maybe_rebalance
from .registry import register

# ---------------------------------------------------------------------------
# paragraph-level exact dedup (C4/RefinedWeb-style boilerplate removal)

_CHUNK = 10  # words per pseudo-paragraph (synthetic docs have no newlines)


def _paras_sql(dialect: str, w: str | None = None) -> str:
    """Doc → array of word-chunks standing in for paragraphs. Real corpora
    split on newlines; the synthetic docs are single-line word soup, so
    fixed 10-word chunks play the paragraph role — the dedup machinery
    (explode → corpus-wide hash count → join back) is identical.

    ``w`` may name a pre-staged words column: the template references the
    words array several times, and inlining the split() at every occurrence
    re-tokenizes per reference (measured ~5-10x on the 8-gram templates)."""
    w = w or words_sql(dialect)
    if dialect == "spark":
        return (
            f"CASE WHEN size({w}) = 0 THEN array() ELSE "
            f"transform(sequence(1, cast(ceil(size({w}) / {_CHUNK}.0) AS int)), "
            f"i -> concat_ws(' ', slice({w}, (i - 1) * {_CHUNK} + 1, {_CHUNK}))) END"
        )
    return (
        f"CASE WHEN len({w}) = 0 THEN [] ELSE "
        f"list_transform(range(1, cast(ceil(len({w}) / {_CHUNK}.0) AS int) + 1), "
        f"i -> array_to_string({w}[(i - 1) * {_CHUNK} + 1 : (i - 1) * {_CHUNK} + {_CHUNK}], ' ')) END"
    )


_PARA_ORACLE = f"""
WITH paras AS (
    SELECT doc_id, unnest({_paras_sql('duckdb')}) AS para
    FROM documents
),
hashed AS (SELECT doc_id, md5(para) AS ph FROM paras),
corpus AS (
    SELECT ph, count(DISTINCT doc_id) AS n_docs FROM hashed GROUP BY ph
)
SELECT h.doc_id,
       count(*) AS n_paras,
       cast(sum(CASE WHEN c.n_docs > 1 THEN 1 ELSE 0 END) AS bigint) AS n_dup_paras
FROM hashed h JOIN corpus c ON h.ph = c.ph
GROUP BY h.doc_id
"""


@register("paragraph_dedup", oracle=_PARA_ORACLE)
def paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide duplicated-paragraph detection: explode paragraphs, hash,
    count distinct docs per hash (one shuffle on the 16-byte hash — the
    standard boilerplate-removal recipe; at 100 TB the hash table is a tiny
    fraction of the text), join back, count per doc. Docs keep their
    paragraph multiplicity; 'duplicated' means the paragraph appears in
    more than one document."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(words_sql("spark")).alias("w")
    )
    paras = docs.select(
        "doc_id", F.explode(F.expr(_paras_sql("spark", "w"))).alias("para")
    ).select("doc_id", F.md5("para").alias("ph"))
    corpus = paras.groupBy("ph").agg(F.countDistinct("doc_id").alias("n_docs"))
    return (
        paras.join(corpus, "ph")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_paras"),
            F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0)).alias("n_dup_paras"),
        )
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition signals (quality filtering)


_GOPHER_ORACLE = f"""
WITH words AS (
    SELECT doc_id, unnest({words_sql('duckdb')}) AS w FROM documents
),
wc AS (SELECT doc_id, w, count(*) AS n FROM words GROUP BY doc_id, w),
per_doc AS (
    SELECT doc_id,
           cast(sum(n) AS bigint) AS n_words,
           cast(count(*) AS bigint) AS n_distinct,
           cast(max(n) AS bigint) AS top_n
    FROM wc GROUP BY doc_id
),
bigrams AS (
    SELECT doc_id, unnest({shingles_sql('duckdb', words_sql('duckdb'), 2)}) AS g,
           len({words_sql('duckdb')}) AS nw
    FROM documents
),
bg AS (
    SELECT doc_id, cast(count(*) AS bigint) AS n_distinct_bigrams,
           cast(max(nw) - 1 AS bigint) AS n_bigrams
    FROM bigrams GROUP BY doc_id
)
SELECT p.doc_id,
       p.n_words,
       1.0 - p.n_distinct / p.n_words AS word_rep_ratio,
       p.top_n / cast(p.n_words AS double) AS top_word_frac,
       1.0 - b.n_distinct_bigrams / cast(b.n_bigrams AS double)
           AS dup_bigram_frac
FROM per_doc p JOIN bg b ON p.doc_id = b.doc_id
WHERE p.n_words >= 2
"""


@register("gopher_quality_signals", oracle=_GOPHER_ORACLE)
def gopher_quality_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals (the Gopher/MassiveText rules):
    duplicate-word ratio, most-frequent-word fraction, duplicated-bigram
    fraction. Computed distributed — explode → (doc, token) partial
    aggregation — never a per-doc O(len²) array scan, so a 100k-word doc
    costs the same per token as a 100-word one. The max-frequency stat is
    a count, not an argmax, so tie-breaking can't diverge between engines."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(words_sql("spark")).alias("warr")
    )
    words = docs.select("doc_id", F.explode("warr").alias("w"))
    wc = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("n"))
    per_doc = wc.groupBy("doc_id").agg(
        F.sum("n").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("n").alias("top_n"),
    )
    bigrams = docs.select(
        "doc_id",
        F.explode(F.expr(shingles_sql("spark", "warr", 2))).alias("g"),
        (F.size(F.col("warr")) - 1).alias("n_bigrams"),
    )
    bg = bigrams.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_distinct_bigrams"),
        F.max("n_bigrams").cast("bigint").alias("n_bigrams"),
    )
    return (
        per_doc.join(bg, "doc_id")
        .filter(F.col("n_words") >= 2)
        .select(
            "doc_id",
            "n_words",
            # raw doubles, not round(): identical IEEE quotients in both
            # engines; SQL round() tie-breaks half-way values differently
            (1.0 - F.col("n_distinct") / F.col("n_words")).alias("word_rep_ratio"),
            (F.col("top_n") / F.col("n_words").cast("double")).alias("top_word_frac"),
            (
                1.0 - F.col("n_distinct_bigrams") / F.col("n_bigrams").cast("double")
            ).alias("dup_bigram_frac"),
        )
    )


# ---------------------------------------------------------------------------
# PII detection + redaction (regex, counted and hash-verified)


def _pii_text_sql(dialect: str) -> str:
    """Deterministically plant PII in a subset of docs (same in both
    dialects): the corpus itself is PII-free word soup, so the operator
    plants what it must find — the detection/redaction machinery is what
    the oracle verifies."""
    i = "cast(doc_id AS int)"
    email = (
        f"CASE WHEN {i} % 3 = 0 THEN concat(' contact user', doc_id, "
        f"'@example.com now') ELSE '' END"
    )
    phone = (
        f"CASE WHEN {i} % 4 = 0 THEN concat(' call +1-555-', "
        f"cast(100 + {i} % 900 AS string), '-', cast(1000 + {i} % 9000 AS string)) "
        f"ELSE '' END"
    )
    ip = (
        f"CASE WHEN {i} % 5 = 0 THEN concat(' from 10.0.', "
        f"cast({i} % 256 AS string), '.', cast(1 + {i} % 200 AS string)) "
        f"ELSE '' END"
    )
    if dialect != "spark":
        email = email.replace(" AS string", " AS varchar")
        phone = phone.replace(" AS string", " AS varchar")
        ip = ip.replace(" AS string", " AS varchar")
    return f"concat(text, {email}, {phone}, {ip})"


_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}"
_PHONE_RE = "[+][0-9]{1,2}-[0-9]{3}-[0-9]{3,4}-[0-9]{3,4}"
_IP_RE = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"


def _pii_oracle() -> str:
    s = _pii_text_sql("duckdb")
    red = (
        f"regexp_replace(regexp_replace(regexp_replace({s}, "
        f"'{_EMAIL_RE}', '[EMAIL]', 'g'), "
        f"'{_PHONE_RE}', '[PHONE]', 'g'), "
        f"'{_IP_RE}', '[IP]', 'g')"
    )
    return f"""
SELECT doc_id,
       cast(len(regexp_extract_all({s}, '{_EMAIL_RE}')) AS bigint) AS n_emails,
       cast(len(regexp_extract_all({s}, '{_PHONE_RE}')) AS bigint) AS n_phones,
       cast(len(regexp_extract_all({s}, '{_IP_RE}')) AS bigint) AS n_ips,
       md5({red}) AS redacted_hash
FROM documents
"""


@register("pii_redact", oracle=_pii_oracle())
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing as a single codegen projection: count and redact
    emails / phone numbers / IPv4s with conservative RE2-compatible
    patterns (no lookaround — portable across Java regex, RE2, and the
    oracle). The redacted text is md5-verified against the oracle, proving
    byte-identical redaction, not just matching counts. Pure per-row work:
    no shuffle at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    s = _pii_text_sql("spark")
    red = (
        f"regexp_replace(regexp_replace(regexp_replace({s}, "
        f"'{_EMAIL_RE}', '[EMAIL]'), "
        f"'{_PHONE_RE}', '[PHONE]'), "
        f"'{_IP_RE}', '[IP]')"
    )
    return docs.select(
        "doc_id",
        F.expr(f"size(regexp_extract_all({s}, '{_EMAIL_RE}', 0))")
        .cast("bigint")
        .alias("n_emails"),
        F.expr(f"size(regexp_extract_all({s}, '{_PHONE_RE}', 0))")
        .cast("bigint")
        .alias("n_phones"),
        F.expr(f"size(regexp_extract_all({s}, '{_IP_RE}', 0))")
        .cast("bigint")
        .alias("n_ips"),
        F.expr(f"md5({red})").alias("redacted_hash"),
    )


# ---------------------------------------------------------------------------
# benchmark contamination check (n-gram overlap against an eval set)

_GRAM_N = BENCH_GRAM_N


_CONTAM_ORACLE = f"""
WITH bench AS ({_bench_grams_cte('duckdb')}),
doc_grams AS (
    SELECT doc_id, unnest({shingles_sql('duckdb', words_sql('duckdb'), _GRAM_N)}) AS g
    FROM documents
),
scored AS (
    SELECT d.doc_id,
           count(*) AS n_grams,
           cast(sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS bigint) AS n_hits
    FROM doc_grams d LEFT JOIN bench b ON d.g = b.g
    GROUP BY d.doc_id
)
SELECT doc_id, n_grams, n_hits,
       n_hits / cast(n_grams AS double) AS overlap_frac,
       n_hits * 10 > n_grams AS contaminated
FROM scored
"""


@register("contamination_check", oracle=_CONTAM_ORACLE)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination screen: distinct 8-gram overlap between
    each document and the benchmark set, flagged above 10%. The benchmark
    gram set is an equi-join side (broadcastable — eval suites are MBs
    against TBs of corpus), so the screen is one broadcast hash join plus
    a per-doc aggregation; candidate work never exceeds grams × 1.

    The corpus side repartitions before the 8-gram explode: the local
    test parquet is a single row group (one scan task), and the explode
    is the CPU-heavy step — without the rebalance the whole shingling
    runs on one core (measured 2x slower at sf0.1). On a cluster the
    file layout provides scan splits and the exchange is one cheap
    round-robin ahead of the dominant per-row work."""
    docs = maybe_rebalance(
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.expr(words_sql("spark")).alias("warr"))
    )
    grams = docs.select(
        "doc_id",
        F.explode(F.expr(shingles_sql("spark", "warr", _GRAM_N))).alias("g"),
    )
    bench = (
        grams.filter(F.expr("cast(doc_id AS int) % 97 = 0"))
        .select("g")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    scored = (
        grams.join(F.broadcast(bench), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hits"),
        )
    )
    return scored.select(
        "doc_id",
        "n_grams",
        "n_hits",
        (F.col("n_hits") / F.col("n_grams").cast("double")).alias("overlap_frac"),
        (F.col("n_hits") * 10 > F.col("n_grams")).alias("contaminated"),
    )


# ---------------------------------------------------------------------------
# URL/domain extraction + per-domain caps (domain balancing)


def _url_sql(dialect: str) -> str:
    """Deterministic synthetic URL per doc (the corpus has no URL column)."""
    i = "cast(doc_id AS int)"
    cast_s = "AS string" if dialect == "spark" else "AS varchar"
    return (
        f"concat('https://d', cast({i} % 37 {cast_s}), "
        f"CASE WHEN {i} % 2 = 0 THEN '.example.com' ELSE '.example.org' END, "
        f"'/p', cast({i} % 11 {cast_s}), '/', lang)"
    )


_DOMAIN_RE = "https?://([^/]+)/"
_DOMAIN_CAP = 5


def _domain_oracle() -> str:
    url = _url_sql("duckdb")
    return f"""
WITH urls AS (
    SELECT doc_id, lang, regexp_extract({url}, '{_DOMAIN_RE}', 1) AS domain
    FROM documents
),
ranked AS (
    SELECT doc_id, lang, domain,
           row_number() OVER (PARTITION BY domain
                              ORDER BY md5(cast(doc_id AS varchar))) AS rk
    FROM urls
)
SELECT domain,
       count(*) AS n_docs,
       count(DISTINCT lang) AS n_langs,
       cast(sum(CASE WHEN rk <= {_DOMAIN_CAP} THEN 1 ELSE 0 END) AS bigint)
           AS n_kept
FROM ranked
GROUP BY domain
"""


@register("url_domain_stats", oracle=_domain_oracle())
def url_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level corpus shaping: extract the registered domain from each
    URL, aggregate per-domain stats, and apply a deterministic per-domain
    document cap (row_number over md5 order — rerun-stable, unlike rand())
    — the standard recipe for keeping one domain from dominating a crawl.
    One shuffle on domain; the cap is a window, not a collect."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    urls = docs.select(
        "doc_id",
        "lang",
        F.regexp_extract(F.expr(_url_sql("spark")), _DOMAIN_RE, 1).alias("domain"),
    )
    w = Window.partitionBy("domain").orderBy(F.md5(F.col("doc_id").cast("string")))
    ranked = urls.withColumn("rk", F.row_number().over(w))
    return ranked.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum(F.when(F.col("rk") <= _DOMAIN_CAP, 1).otherwise(0)).alias("n_kept"),
    )


# ---------------------------------------------------------------------------
# corpus vocabulary: global top-K terms (tokenizer vocab seed)

_VOCAB_K = 50

_VOCAB_ORACLE = f"""
WITH words AS (
    SELECT doc_id, unnest({words_sql('duckdb')}) AS w FROM documents
),
counts AS (
    SELECT w, count(*) AS n, count(DISTINCT doc_id) AS n_docs
    FROM words GROUP BY w
)
SELECT w, n, n_docs,
       row_number() OVER (ORDER BY n DESC, w) AS rank
FROM counts
ORDER BY n DESC, w
LIMIT {_VOCAB_K}
"""


@register("vocab_top_terms", oracle=_VOCAB_ORACLE)
def vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-K corpus terms with document frequency — the vocabulary
    seed of a tokenizer build. Two-level aggregation (map-side partial
    count per word, then the global top-K as a distributed TakeOrdered:
    each partition ships only its local top K). The tie-break is total
    (count desc, then word), so the cut is deterministic in any engine —
    a bare LIMIT over ties would not be."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(words_sql("spark")).alias("warr")
    )
    words = docs.select("doc_id", F.explode("warr").alias("w"))
    counts = words.groupBy("w").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    top = counts.orderBy(F.col("n").desc(), "w").limit(_VOCAB_K)
    w = Window.orderBy(F.col("n").desc(), "w")
    return top.withColumn("rank", F.row_number().over(w))


# ---------------------------------------------------------------------------
# multimodal frame-sampling plan, oracle-checked end to end

_FRAME_STEP = 64
_FRAME_MAX = 8


_FRAME_ORACLE = f"""
WITH media AS (
    SELECT doc_id,
           CASE cast(doc_id % 3 AS int) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
           octet_length(encode(text)) AS byte_len,
           md5(text) AS content_hash
    FROM documents
)
SELECT doc_id, media_type, cast(byte_len AS bigint) AS byte_len, content_hash,
       cast(CASE WHEN byte_len <= 0 THEN 0
                 ELSE least(byte_len - 1, {(_FRAME_MAX - 1) * _FRAME_STEP})
                      // {_FRAME_STEP} + 1 END AS bigint) AS n_frames,
       cast(CASE WHEN byte_len <= 0 THEN NULL
                 ELSE (least(byte_len - 1, {(_FRAME_MAX - 1) * _FRAME_STEP})
                       // {_FRAME_STEP}) * {_FRAME_STEP} END AS bigint)
           AS last_offset
FROM media
"""


@register("media_frame_plan", oracle=_FRAME_ORACLE)
def media_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal sampling plumbing end to end: documents wrapped as opaque
    binary media (operators/multimodal.py to_media_frame), the frame-offset
    plan computed as pure column expressions, and the metadata (byte_len,
    content hash) oracle-verified. The decode itself stays a stubbed
    mapInPandas (no codecs in the runtime) — this proves everything around
    it: schema, deterministic offsets, empty-payload guard."""
    from ..operators.multimodal import frame_sample_plan, to_media_frame

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    media = to_media_frame(docs)
    fs = frame_sample_plan(
        media, _FRAME_STEP, _FRAME_MAX, keep_cols=["byte_len", "content_hash"]
    )
    return fs.select(
        "doc_id",
        "media_type",
        F.col("byte_len").cast("bigint"),
        "content_hash",
        F.size("frame_offsets").cast("bigint").alias("n_frames"),
        F.expr("try_element_at(frame_offsets, -1)").cast("bigint").alias("last_offset"),
    )


# ---------------------------------------------------------------------------
# sequence packing: concat-and-chunk docs into fixed token bins

_BIN_TOKENS = 256


_PACKING_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, source, len({words_sql('duckdb')}) AS n_tokens
    FROM documents
),
packed AS (
    SELECT doc_id, source, n_tokens,
           cast(coalesce(sum(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS bigint) AS start_offset
    FROM toks
)
SELECT doc_id, source, cast(n_tokens AS bigint) AS n_tokens, start_offset,
       start_offset // {_BIN_TOKENS} AS start_bin,
       CASE WHEN n_tokens = 0 THEN start_offset // {_BIN_TOKENS}
            ELSE (start_offset + n_tokens - 1) // {_BIN_TOKENS} END AS end_bin
FROM packed
"""


@register("sequence_packing", oracle=_PACKING_ORACLE)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining sequence packing, concat-and-chunk style: within each
    source stream, documents are laid end-to-end in deterministic doc_id
    order and cut into fixed {bin}-token bins (docs may span bins — the
    standard packing used for LLM pretraining batches). The layout is one
    window prefix-sum per source partition: fully distributed, one shuffle
    on source, no sequential driver loop — and every doc learns its
    start/end bin so a downstream writer can route chunks."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(F.expr(words_sql("spark"))).alias("n_tokens")
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = docs.withColumn(
        "start_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint")
    )
    return packed.select(
        "doc_id",
        "source",
        F.col("n_tokens").cast("bigint"),
        "start_offset",
        F.floor(F.col("start_offset") / _BIN_TOKENS).alias("start_bin"),
        F.when(
            F.col("n_tokens") == 0, F.floor(F.col("start_offset") / _BIN_TOKENS)
        )
        .otherwise(
            F.floor((F.col("start_offset") + F.col("n_tokens") - 1) / _BIN_TOKENS)
        )
        .alias("end_bin"),
    )
