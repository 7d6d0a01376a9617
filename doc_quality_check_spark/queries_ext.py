"""Extended driver-contract query surface: text analysis, deduplication,
similarity search, classification, fan-out, grouped repair.

Same conventions as queries.py (identical aliases both sides, rounded floats,
deterministic tie-breaks). The MinHash/SimHash oracles are generated
programmatically from the SAME constants the Spark operators use
(operators/dedup.py MINHASH_COEFFS / MINHASH_PRIME), with the shared
hash H(s) = first-8-hex-of-md5(s) as bigint:
  Spark:  CAST(conv(substr(md5(s),1,8),16,10) AS BIGINT)
  DuckDB: ('0x'||substr(md5(s),1,8))::BIGINT
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from doc_quality_check_spark.functions.classify import (
    argmax_type,
    classification_confidence,
    frequency_boost,
    margin_classify,
    type_scores,
)
from doc_quality_check_spark.functions.text import (
    ARTIFACT_PATTERNS,
    CLEANING_CHAIN,
    artifact_flags,
    artifact_types,
    clean_text,
    extract_kv_int,
    fingerprint,
    language_argmax,
    language_scores,
    marker_count,
    quality_features,
    quality_score,
    token_count,
    FINGERPRINT_BASE,
    FINGERPRINT_MOD,
)
from doc_quality_check_spark.operators.dedup import (
    MINHASH_COEFFS,
    MINHASH_PRIME,
    SIMHASH_BITS,
    exact_duplicates,
    jaccard_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash,
    simhash_pairs,
)
from doc_quality_check_spark.operators.repair import pair_repair
from doc_quality_check_spark.operators.segmentation import chunk_fanout
from doc_quality_check_spark.operators.similarity import (
    cosine_neardup_pairs,
    cosine_topk,
    sign_lsh_topk,
)


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# shared SQL fragments
# ---------------------------------------------------------------------------

_H_SQL = "('0x'||substr(md5({col}),1,8))::BIGINT"

_SHINGLES_CTE = """
toks AS (
  SELECT doc_id, generate_subscripts(ts, 1) AS i, unnest(ts) AS tok
  FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)
),
sh AS (
  SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS sh
  FROM toks a
  JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
  JOIN toks c ON c.doc_id = a.doc_id AND c.i = a.i + 2
)"""

_JACCARD_CTE = """
shh AS (
  SELECT doc_id, ('0x'||substr(md5(sh),1,15))::BIGINT AS sh FROM sh
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shh GROUP BY 1),
shared AS (
  SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS n_shared
  FROM shh x JOIN shh y ON x.sh = y.sh AND x.doc_id < y.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT id_a, id_b, n_shared * 1.0 / (sa.n_sh + sb.n_sh - n_shared) AS jaccard
  FROM shared
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
)"""


def _minhash_sig_sql() -> str:
    """sig CTE: doc_id, mh0..mh15 — identical to minhash_signatures()."""
    h = _H_SQL.format(col="sh")
    mins = ", ".join(
        f"min(({h} * {a} + {b}) % {MINHASH_PRIME}) AS mh{i}"
        for i, (a, b) in enumerate(MINHASH_COEFFS)
    )
    return f"sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id)"


def _simhash_sig_sql() -> str:
    """ssig CTE: doc_id, simhash — identical to simhash()."""
    h = _H_SQL.format(col="sh")
    votes = ", ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(SIMHASH_BITS)
    )
    val = " + ".join(
        f"(CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(SIMHASH_BITS)
    )
    return (
        f"hv AS (SELECT doc_id, {h} AS h FROM sh), "
        f"votes AS (SELECT doc_id, {votes} FROM hv GROUP BY doc_id), "
        f"ssig AS (SELECT doc_id, CAST({val} AS BIGINT) AS simhash FROM votes)"
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

def q_text_clean(spark, sf):
    """F11 cleaning chain on deliberately-dirtied input (null-safe,
    whitespace/?-run collapse), verified by output length + token count."""
    d = t(spark, sf, "documents")
    dirty = F.concat(F.col("text"), F.lit("   ?????? trailing   bits  "))
    cleaned = clean_text(dirty)
    return d.select(
        "doc_id",
        F.length(cleaned).alias("clean_len"),
        F.size(F.split(cleaned, " ")).alias("clean_tokens"),
    )


def _clean_sql_expr(inner: str) -> str:
    out = inner
    for pat, rep in CLEANING_CHAIN:
        out = f"regexp_replace({out}, '{pat}', '{rep}', 'g')"
    return f"trim({out})"


SQL_TEXT_CLEAN = f"""
SELECT doc_id,
       length({_clean_sql_expr("text || '   ?????? trailing   bits  '")}) AS clean_len,
       len(string_split({_clean_sql_expr("text || '   ?????? trailing   bits  '")}, ' ')) AS clean_tokens
FROM documents
"""


def q_artifact_typology(spark, sf):
    """F12/F14: inject a deterministic artifact per doc_id bucket, detect
    classes, scrub, report."""
    d = t(spark, sf, "documents")
    inject = (
        F.when(F.col("doc_id") % 4 == 0, F.lit(" see https://example.com/a?x=1"))
        .when(F.col("doc_id") % 4 == 1, F.lit(" at file:///tmp/x.bin"))
        .when(F.col("doc_id") % 4 == 2, F.lit(" on 12/31/2024 23:59"))
        .otherwise(F.lit(""))
    )
    d = d.withColumn("_dirty", F.concat(F.col("text"), inject))
    from doc_quality_check_spark.functions.text import scrub_artifacts

    return d.select(
        "doc_id",
        *[c for c in artifact_flags("_dirty")],
        artifact_types("_dirty").alias("artifact_types"),
        F.length(scrub_artifacts(F.col("_dirty"))).alias("scrubbed_len"),
    )


def _artifact_sql() -> str:
    inject = (
        "CASE WHEN doc_id % 4 = 0 THEN ' see https://example.com/a?x=1' "
        "WHEN doc_id % 4 = 1 THEN ' at file:///tmp/x.bin' "
        "WHEN doc_id % 4 = 2 THEN ' on 12/31/2024 23:59' ELSE '' END"
    )
    flags = ", ".join(
        f"regexp_matches(d2, '{pat}') AS has_{label}"
        for label, pat in ARTIFACT_PATTERNS.items()
    )
    typ_parts = ", ".join(
        f"CASE WHEN regexp_matches(d2, '{pat}') THEN '{label}' END"
        for label, pat in sorted(ARTIFACT_PATTERNS.items())
    )
    scrub = "d2"
    for pat in ARTIFACT_PATTERNS.values():
        scrub = f"regexp_replace({scrub}, '{pat}', ' ', 'g')"
    return f"""
WITH d AS (SELECT doc_id, text || {inject} AS d2 FROM documents)
SELECT doc_id, {flags},
       coalesce(array_to_string(list_filter([{typ_parts}], x -> x IS NOT NULL), ','), '') AS artifact_types,
       length({scrub}) AS scrubbed_len
FROM d
"""


LANG_CATALOGS = {
    "de": ["fast", "slow", "hash", "merge"],
    "en": ["the", "a", "row", "table", "value"],
    "es": ["data", "stream", "filter"],
    "fr": ["query", "scan", "sort"],
    "zh": ["spark", "window", "batch"],
}


def q_lang_id(spark, sf):
    """F15 language detection: catalog hit counts + argmax with sorted-first
    tie-break and 'unknown' fallback; compared against the labeled lang."""
    d = t(spark, sf, "documents")
    d = d.select("doc_id", "lang", *language_scores("text", LANG_CATALOGS))
    return d.select(
        "doc_id",
        "lang",
        *[F.col(f"score_{lg}") for lg in sorted(LANG_CATALOGS)],
        language_argmax(LANG_CATALOGS).alias("pred_lang"),
    )


def _lang_sql() -> str:
    toks = "list_distinct(string_split_regex(lower(text), '\\s+'))"
    scores = ", ".join(
        f"len(list_intersect({toks}, {kws!r})) AS score_{lg}".replace("'", "'")
        for lg, kws in sorted(LANG_CATALOGS.items())
        for kws in [[k.lower() for k in kws]]
    )
    langs = sorted(LANG_CATALOGS)
    pred_cases = []
    for i, lg in enumerate(langs):
        conds = [f"score_{lg} >= score_{other}" for other in langs[i + 1 :]]
        conds.append(f"score_{lg} > 0")
        pred_cases.append(f"WHEN {' AND '.join(conds)} THEN '{lg}'")
    pred = f"CASE {' '.join(pred_cases)} ELSE 'unknown' END"
    score_cols = ", ".join(f"score_{lg}" for lg in langs)
    return f"""
WITH s AS (SELECT doc_id, lang, {scores} FROM documents)
SELECT doc_id, lang, {score_cols}, {pred} AS pred_lang FROM s
"""


def q_token_quality(spark, sf):
    """F18 + quality scoring: raw features and the clamped composite score."""
    d = t(spark, sf, "documents")
    d = d.select("doc_id", *quality_features("text"))
    return d.select("doc_id", "n_tokens", "alpha_ratio", "punct_ratio",
                    "stopword_ratio", "mean_token_len",
                    quality_score().alias("quality"))


SQL_TOKEN_QUALITY = """
WITH f AS (
  SELECT doc_id,
         length(text) AS n_chars2,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
         round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0 / NULLIF(length(text), 0), 4) AS alpha_ratio,
         round(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0 / NULLIF(length(text), 0), 4) AS punct_ratio,
         round(len(list_filter(string_split_regex(trim(text), '\\s+'),
                               x -> list_contains(['the','a','and','of','to'], x))) * 1.0
               / NULLIF(CASE WHEN length(trim(text)) = 0 THEN 0
                             ELSE len(string_split_regex(trim(text), '\\s+')) END, 0), 4) AS stopword_ratio,
         round((length(text) - CASE WHEN length(trim(text)) = 0 THEN 0
                                    ELSE len(string_split_regex(trim(text), '\\s+')) END + 1) * 1.0
               / NULLIF(CASE WHEN length(trim(text)) = 0 THEN 0
                             ELSE len(string_split_regex(trim(text), '\\s+')) END, 0), 4) AS mean_token_len
  FROM documents
)
SELECT doc_id, n_tokens, alpha_ratio, punct_ratio, stopword_ratio, mean_token_len,
       round(least(100.0, greatest(0.0,
             least(n_tokens * 1.5, 40.0)
             + CASE WHEN alpha_ratio >= 0.7 THEN 25.0 ELSE 0.0 END
             + CASE WHEN stopword_ratio >= 0.02 AND stopword_ratio <= 0.3 THEN 20.0 ELSE 0.0 END
             + CASE WHEN n_tokens < 5 THEN -30.0 ELSE 0.0 END
             + CASE WHEN punct_ratio > 0.2 THEN -15.0 ELSE 0.0 END)), 4) AS quality
FROM f
"""


def q_fingerprint(spark, sf):
    """Order-sensitive polynomial token fingerprint per doc."""
    d = t(spark, sf, "documents")
    return d.select("doc_id", fingerprint("text").alias("fp"))


SQL_FINGERPRINT = f"""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split(text, ' '),
                          s -> {_H_SQL.format(col='s')})),
         (acc, x) -> (acc * {FINGERPRINT_BASE} + x) % {FINGERPRINT_MOD}) AS fp
FROM documents
"""


def q_marker_count(spark, sf):
    """F17 marker counting via length-difference (no regex in the loop)."""
    d = t(spark, sf, "documents")
    return d.select("doc_id", marker_count("text", "a").alias("n_marker"))


SQL_MARKER = """
SELECT doc_id,
       CAST(length(text) - length(replace(text, 'a', '')) AS INT) AS n_marker
FROM documents
"""


def q_kv_extract(spark, sf):
    """F16 key/value extraction from a semi-structured string column."""
    ev = t(spark, sf, "events")
    return ev.select("event_id", extract_kv_int("props", "k").alias("k_val"))


SQL_KV = """
SELECT event_id,
       TRY_CAST(regexp_extract(props, '"k":\\s*([0-9]+)', 1) AS INTEGER) AS k_val
FROM events
"""


def q_kv_pairs(spark, sf):
    """F16 FULL key/value extraction (reference extract_json_keys,
    utils/content_extraction.py:150-189): `Key: Value` then `Key - Value`
    per line, line_N fallback when nothing matches, duplicate keys last-win.
    Semi-structured input is synthesized deterministically from document
    columns so all three paths (colon, dash, fallback) and the duplicate-key
    rule are exercised; docs with doc_id % 7 == 0 keep their raw pattern-free
    text → fallback path."""
    from doc_quality_check_spark.functions.text import kv_entries

    d = t(spark, sf, "documents")
    # NULL-harden every synthesized piece: Spark concat_ws SKIPS null args
    # (shifting line numbers) while DuckDB '||' nullifies the whole string —
    # coalesce on BOTH engines keeps the two line layouts identical even if
    # the fixture ever grows NULL lang/source/text rows.
    lang = F.coalesce(F.col("lang"), F.lit(""))
    srcc = F.coalesce(F.col("source"), F.lit(""))
    src = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.coalesce(F.col("text"), F.lit(""))).otherwise(
            F.concat_ws(
                "\n",
                F.concat(F.lit("DocId: "), F.col("doc_id").cast("string")),
                F.concat(F.lit("Lang - "), lang),
                F.concat(F.lit("Source: "), srcc),
                F.concat(F.lit("Lang - "), F.upper(lang)),
                F.lit("   "),
            )
        ).alias("kvtext"),
    )
    e = src.select("doc_id", F.explode(kv_entries("kvtext")).alias("e"))
    return (
        e.groupBy("doc_id", F.col("e.key").alias("key"))
        .agg(F.max_by("e.value", "e.idx").alias("value"))
    )


SQL_KV_PAIRS = r"""
WITH src AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN coalesce(text, '')
              ELSE 'DocId: ' || CAST(doc_id AS VARCHAR) || chr(10) ||
                   'Lang - ' || coalesce(lang, '') || chr(10) ||
                   'Source: ' || coalesce(source, '') || chr(10) ||
                   'Lang - ' || upper(coalesce(lang, '')) || chr(10) || '   '
         END AS kvtext
  FROM documents
),
ln AS (
  SELECT doc_id, kvtext,
         unnest(string_split(kvtext, chr(10))) AS line,
         generate_subscripts(string_split(kvtext, chr(10)), 1) AS i
  FROM src
),
m AS (
  SELECT doc_id, i,
    CASE WHEN regexp_matches(line, '^\s*([^:]+):\s*(.+)$')
         THEN regexp_replace(regexp_extract(line, '^\s*([^:]+):\s*(.+)$', 1), '^\s+|\s+$', '', 'g')
         WHEN regexp_matches(line, '^\s*([^-\n]+)-\s*(.+)$')
         THEN regexp_replace(regexp_extract(line, '^\s*([^-\n]+)-\s*(.+)$', 1), '^\s+|\s+$', '', 'g')
    END AS key,
    CASE WHEN regexp_matches(line, '^\s*([^:]+):\s*(.+)$')
         THEN regexp_replace(regexp_extract(line, '^\s*([^:]+):\s*(.+)$', 2), '^\s+|\s+$', '', 'g')
         WHEN regexp_matches(line, '^\s*([^-\n]+)-\s*(.+)$')
         THEN regexp_replace(regexp_extract(line, '^\s*([^-\n]+)-\s*(.+)$', 2), '^\s+|\s+$', '', 'g')
    END AS value
  FROM ln
),
matched AS (SELECT * FROM m WHERE key IS NOT NULL),
fb AS (
  SELECT l.doc_id, l.i,
         'line_' || CAST(l.i AS VARCHAR) AS key,
         regexp_replace(l.line, '^\s+|\s+$', '', 'g') AS value
  FROM ln l
  WHERE regexp_replace(l.line, '^\s+|\s+$', '', 'g') <> ''
    AND regexp_replace(l.kvtext, '^\s+|\s+$', '', 'g') <> ''
    AND l.doc_id NOT IN (SELECT doc_id FROM matched)
),
allm AS (
  SELECT doc_id, i, key, value FROM matched
  UNION ALL SELECT doc_id, i, key, value FROM fb
)
SELECT doc_id, key, arg_max(value, i) AS value
FROM allm GROUP BY doc_id, key
"""


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------

def q_dedup_exact(spark, sf):
    d = t(spark, sf, "documents")
    return exact_duplicates(d, "doc_id", "text")


SQL_DEDUP_EXACT = """
SELECT md5(text) AS text_md5, count(*) AS n_docs, min(doc_id) AS first_id
FROM documents GROUP BY 1 HAVING count(*) > 1
"""


def q_dedup_jaccard(spark, sf):
    d = t(spark, sf, "documents")
    p = jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.6)
    return p.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


SQL_DEDUP_JACCARD = f"""
WITH {_SHINGLES_CTE}, {_JACCARD_CTE}
SELECT id_a, id_b, round(jaccard, 4) AS jaccard FROM jac WHERE jaccard >= 0.6
"""


def q_dedup_jaccard_prefix(spark, sf):
    """Same exact-Jaccard pair contract as dedup_jaccard, computed through
    the prefix-filtered index (operators/dedup.py jaccard_pairs_prefix —
    All-Pairs/PPJoin prefix + length filter, verify on candidates). Shares
    SQL_DEDUP_JACCARD: the driver hash-compares both forms against the SAME
    oracle, which is the no-false-negatives proof."""
    from doc_quality_check_spark.operators.dedup import jaccard_pairs_prefix

    d = t(spark, sf, "documents")
    p = jaccard_pairs_prefix(d, "doc_id", "text", n=3, threshold=0.6)
    return p.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


def q_dedup_clusters(spark, sf):
    """Transitive near-dup clusters: connected components over the Jaccard
    pair graph (iterative min-label propagation, operators/dedup.py).
    Output: (doc_id, component) with component = min doc_id reachable."""
    from doc_quality_check_spark.operators.dedup import connected_components

    d = t(spark, sf, "documents")
    pairs = jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.6)
    return connected_components(pairs).select(
        F.col("id").alias("doc_id"), F.col("comp").alias("component")
    )


def q_dedup_clusters_star(spark, sf):
    """Same clustering as dedup_clusters but via large-star/small-star
    contraction (algorithm='star', O(log n) rounds — the long-chain-safe
    variant). Shares the recursive-CTE oracle: both algorithms must produce
    the identical (doc_id, component) table."""
    from doc_quality_check_spark.operators.dedup import connected_components

    d = t(spark, sf, "documents")
    pairs = jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.6)
    return connected_components(pairs, algorithm="star").select(
        F.col("id").alias("doc_id"), F.col("comp").alias("component")
    )


def q_unigram_logprob(spark, sf):
    """Mean unigram log-probability per document under the corpus's own
    token distribution (operators/aggregates.py unigram_logprob_scores) —
    the J2 frequency-enrich physical shape applied to statistical quality
    scoring."""
    from doc_quality_check_spark.operators.aggregates import (
        unigram_logprob_scores,
    )

    d = t(spark, sf, "documents")
    return unigram_logprob_scores(d, "doc_id", "text")


SQL_UNIGRAM_LOGPROB = r"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
  FROM documents
),
toks2 AS (SELECT * FROM toks WHERE tok <> ''),
vocab AS (SELECT tok, count(*) AS cnt FROM toks2 GROUP BY tok),
tot AS (SELECT sum(cnt) AS n_total FROM vocab),
lp AS (SELECT tok, round(ln(cnt * 1.0 / n_total), 6) AS logp FROM vocab, tot)
SELECT doc_id, count(*) AS n_tokens,
       round(CAST(sum(CAST(logp AS DECIMAL(28,6))) AS DOUBLE) / count(*), 4)
         AS mean_logprob
FROM toks2 JOIN lp USING (tok)
GROUP BY doc_id
"""


def q_dedup_keep_best(spark, sf):
    """Cluster retention: one survivor per near-dup cluster, the longest
    text winning (ties → smallest doc_id); singletons survive as their own
    cluster (operators/dedup.py dedup_keep_best)."""
    from doc_quality_check_spark.operators.dedup import dedup_keep_best

    d = t(spark, sf, "documents").withColumn(
        "score", F.coalesce(F.length("text").cast("long"), F.lit(0))
    )
    pairs = jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.6)
    return dedup_keep_best(d, pairs, "doc_id", "score").select(
        "doc_id", "cluster", "score"
    )


def _dedup_keep_best_sql() -> str:
    return f"""
WITH RECURSIVE {_SHINGLES_CTE}, {_JACCARD_CTE},
pairs AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.6),
edges AS (
  SELECT id_a AS s, id_b AS t FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach AS (
  SELECT s AS id, t AS r FROM edges
  UNION
  SELECT reach.id, e.t FROM reach JOIN edges e ON reach.r = e.s
),
comp AS (SELECT id AS doc_id, least(id, min(r)) AS component
         FROM reach GROUP BY id),
scored AS (
  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS cluster,
         CAST(coalesce(length(d.text), 0) AS BIGINT) AS score
  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
)
SELECT doc_id, cluster, score
FROM (SELECT *, row_number() OVER (PARTITION BY cluster
                                   ORDER BY score DESC, doc_id ASC) AS rn
      FROM scored) x
WHERE rn = 1
"""


def _dedup_clusters_sql() -> str:
    # transitive closure via recursive CTE (fixture pair graph is tiny);
    # component = min reachable id, matching the Spark label propagation
    return f"""
WITH RECURSIVE {_SHINGLES_CTE}, {_JACCARD_CTE},
pairs AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.6),
edges AS (
  SELECT id_a AS s, id_b AS t FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach AS (
  SELECT s AS id, t AS r FROM edges
  UNION
  SELECT reach.id, e.t FROM reach JOIN edges e ON reach.r = e.s
)
SELECT id AS doc_id, least(id, min(r)) AS component
FROM reach GROUP BY id
"""


def q_pii_scrub(spark, sf):
    """PII detection + scrubbing (emails / phones / IPv4 → class
    placeholders) — the standard pre-training privacy pass. PII is
    synthesized deterministically onto the fixture text; the scrubbed text
    is compared via md5 so result rows stay small."""
    from doc_quality_check_spark.functions.text import pii_flags, scrub_pii

    d = t(spark, sf, "documents")
    txt = (
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.col("text"), F.lit(" contact user"),
                        F.col("doc_id").cast("string"), F.lit("@example.com now")))
        .when(F.col("doc_id") % 3 == 1,
              F.concat(F.col("text"),
                       F.lit(" call 555-123-4567 or ping 192.168.1.99 today")))
        .otherwise(F.col("text"))
    )
    src = d.select("doc_id", txt.alias("ptext"))
    return src.select(
        "doc_id",
        *pii_flags("ptext"),
        F.md5(scrub_pii("ptext")).alias("scrub_md5"),
    )


def _pii_sql() -> str:
    from doc_quality_check_spark.functions.text import PII_PATTERNS

    email, phone, ip = (PII_PATTERNS[k][0] for k in ("email", "phone", "ipv4"))
    # nest the scrub in PII_PATTERNS iteration order so the oracle can never
    # diverge from scrub_pii's chained-replace order
    scrub = "ptext"
    for pat, repl in PII_PATTERNS.values():
        scrub = f"regexp_replace({scrub}, '{pat}', '{repl}', 'g')"
    return f"""
WITH src AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
              WHEN doc_id % 3 = 1
              THEN text || ' call 555-123-4567 or ping 192.168.1.99 today'
              ELSE text END AS ptext
  FROM documents
)
SELECT doc_id,
       regexp_matches(ptext, '{email}') AS has_email,
       regexp_matches(ptext, '{phone}') AS has_phone,
       regexp_matches(ptext, '{ip}') AS has_ipv4,
       md5({scrub}) AS scrub_md5
FROM src
"""


def q_contamination(spark, sf):
    """Eval-set decontamination: corpus docs sharing >= 2 distinct 3-grams
    with any eval doc (eval set = doc_id % 10 == 0, deterministic). Eval
    shingles broadcast; the corpus never shuffles its text."""
    from doc_quality_check_spark.operators.dedup import contamination_flags

    d = t(spark, sf, "documents")
    ev = d.filter(F.col("doc_id") % 10 == 0)
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    return contamination_flags(corpus, ev, "doc_id", "text", n=3, min_shared=2)


def _contamination_sql() -> str:
    # same shingle universe (+60-bit hash) as the jaccard CTEs, split into
    # eval (doc_id % 10 = 0) and corpus halves
    return f"""
WITH {_SHINGLES_CTE},
shh AS (SELECT doc_id, ('0x'||substr(md5(sh),1,15))::BIGINT AS sh FROM sh),
ev AS (SELECT DISTINCT sh FROM shh WHERE doc_id % 10 = 0),
corp AS (SELECT DISTINCT doc_id, sh FROM shh WHERE doc_id % 10 != 0)
SELECT corp.doc_id AS doc_id, count(*) AS n_shared
FROM corp JOIN ev USING (sh)
GROUP BY corp.doc_id HAVING count(*) >= 2
"""


def q_repetition(spark, sf):
    """Gopher-style intra-document repetition ratio (1 - distinct/total
    3-grams) — boilerplate and looping text score high."""
    from doc_quality_check_spark.functions.text import repetition_ratio

    d = t(spark, sf, "documents")
    return d.select("doc_id", repetition_ratio("text", 3).alias("rep_ratio"))


# numbers CTE caps the oracle at 100k token positions (Spark is unbounded);
# a sentinel row makes the gate fail LOUDLY instead of silently diverging if
# the fixture ever grows a >100k-token document (same pattern as
# SQL_CHUNK_FANOUT).
SQL_REPETITION = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
g AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
  FROM toks, (SELECT range AS i FROM range(1, 100000)) n
  WHERE i + 2 <= len(t)
),
agg AS (
  SELECT doc_id, count(*) AS total, count(DISTINCT gram) AS dist
  FROM g GROUP BY doc_id
)
SELECT d.doc_id,
       round(coalesce(1.0 - CAST(a.dist AS DOUBLE) / a.total, 0.0), 4) AS rep_ratio
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
UNION ALL
SELECT doc_id, -1.0 FROM toks WHERE len(t) > 100001
"""


_SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}


def q_hash_split(spark, sf):
    """Deterministic train/val/test assignment: membership is a pure
    function of md5(id) — stable across runs/partitionings and reproduced
    bit-for-bit by the oracle (operators/sampling.py)."""
    from doc_quality_check_spark.operators.sampling import hash_split

    d = t(spark, sf, "documents")
    return hash_split(d, "doc_id", _SPLITS).select("doc_id", "split")


def _hash_unit_sql(key_expr: str, salt: str) -> str:
    return (
        f"(('0x' || substr(md5('{salt}' || CAST({key_expr} AS VARCHAR)), 1, 8))::BIGINT "
        f"% 1000000) / 1000000.0"
    )


SQL_STRATIFIED_SAMPLE = f"""
SELECT doc_id, lang FROM documents
WHERE {_hash_unit_sql('doc_id', 'strat')} <
      CASE WHEN lang = 'en' THEN 0.3 WHEN lang = 'de' THEN 1.0 ELSE 0.1 END
"""

# shared factor table for the query AND its oracle: the DuckDB side joins
# against a static copies range (table functions reject correlated bounds),
# so the range bound is DERIVED from these factors — a factor change can
# never silently truncate the oracle while the Spark side fans out further
_UPSAMPLE_FACTORS = {"en": 2.0, "de": 2.5}
# max copies per row = floor(max_fac) + 1 (the fractional extra copy)
_UPSAMPLE_BOUND = int(max(_UPSAMPLE_FACTORS.values())) + 1


def q_upsample_groups(spark, sf):
    """Deterministic per-group upsampling with replacement: 'en' docs repeat
    2x, 'de' ~2.5x (hash-selected fractional share), others once —
    (doc_id, lang, copy_id) rows (operators/sampling.py upsample_groups)."""
    from doc_quality_check_spark.operators.sampling import upsample_groups

    d = t(spark, sf, "documents").select("doc_id", "lang")
    return upsample_groups(d, "lang", _UPSAMPLE_FACTORS, id_col="doc_id")


SQL_UPSAMPLE_GROUPS = f"""
WITH f AS (
  SELECT doc_id, lang,
         CASE WHEN lang = 'en' THEN {_UPSAMPLE_FACTORS['en']}
              WHEN lang = 'de' THEN {_UPSAMPLE_FACTORS['de']}
              ELSE 1.0 END AS fac,
         {_hash_unit_sql('doc_id', 'upsample')} AS u
  FROM documents
),
n AS (
  SELECT doc_id, lang,
         CAST(floor(fac) + CASE WHEN u < fac - floor(fac) THEN 1 ELSE 0 END
              AS INT) AS n_copies
  FROM f
),
nums AS (SELECT unnest(range(0, {_UPSAMPLE_BOUND})) AS g)
SELECT doc_id, lang, g AS copy_id
FROM n JOIN nums ON nums.g < n.n_copies
"""




def q_pack_token_bins(spark, sf):
    """Deterministic sequence packing: (doc_id, pack_bucket, pack_bin) with
    consecutive hash-ordered documents binned at ~512-token boundaries
    within 8 hash buckets (operators/sampling.py pack_token_bins; integer
    arithmetic → bit-identical oracle)."""
    from doc_quality_check_spark.functions.text import token_count
    from doc_quality_check_spark.operators.sampling import pack_token_bins

    d = t(spark, sf, "documents").select(
        "doc_id", token_count("text").alias("n_tok")
    )
    return pack_token_bins(d, "doc_id", "n_tok", budget=512, n_buckets=8).select(
        "doc_id", "pack_bucket", "pack_bin"
    )


SQL_PACK_TOKEN_BINS = f"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tok,
         CAST(floor({_hash_unit_sql('doc_id', 'pack')} * 8) AS BIGINT) AS pack_bucket,
         {_hash_unit_sql('doc_id', 'pack_ord')} AS ord_u
  FROM documents
)
SELECT doc_id, pack_bucket,
       CAST(floor((sum(n_tok) OVER (PARTITION BY pack_bucket
                                    ORDER BY ord_u ASC, CAST(doc_id AS VARCHAR) ASC
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tok) / 512.0) AS BIGINT) AS pack_bin
FROM toks
"""

SQL_GROUP_CAPPED_SAMPLE = f"""
SELECT doc_id, lang
FROM (SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY {_hash_unit_sql('doc_id', 'cap')} ASC,
                                         CAST(doc_id AS VARCHAR) ASC) AS rn
      FROM documents) x
WHERE rn <= 20
"""


SQL_HASH_SPLIT = f"""
SELECT doc_id,
       CASE WHEN {_hash_unit_sql('doc_id', 'split')} < 0.8 THEN 'train'
            WHEN {_hash_unit_sql('doc_id', 'split')} < 0.9 THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


def q_stratified_sample(spark, sf):
    """Deterministic per-group sampling for corpus balancing: keep all of a
    rare language, a slice of the dominant one — membership is a pure
    function of md5(id), reproduced bit-for-bit by the oracle
    (operators/sampling.py stratified_hash_sample; no shuffle)."""
    from doc_quality_check_spark.operators.sampling import stratified_hash_sample

    d = t(spark, sf, "documents")
    return stratified_hash_sample(
        d, "doc_id", "lang", {"en": 0.3, "de": 1.0}, default_fraction=0.1
    ).select("doc_id", "lang")


def q_group_capped_sample(spark, sf):
    """Deterministic per-group cap (at most N rows per language, chosen by
    hash order, not arrival order): one window shuffle on the group key
    (operators/sampling.py group_capped_sample)."""
    from doc_quality_check_spark.operators.sampling import group_capped_sample

    d = t(spark, sf, "documents")
    return group_capped_sample(d, "doc_id", "lang", cap=20).select("doc_id", "lang")


def q_cluster_safe_split(spark, sf):
    """Leakage-safe split: near-dup clusters (Jaccard pair graph) hash by
    their connected-component representative, so no cluster straddles a
    train/test boundary."""
    from doc_quality_check_spark.operators.sampling import cluster_safe_split

    d = t(spark, sf, "documents")
    pairs = jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.6)
    return cluster_safe_split(d, "doc_id", pairs, _SPLITS).select("doc_id", "split")


def _cluster_split_sql() -> str:
    rep = "coalesce(c.component, d.doc_id)"
    u = _hash_unit_sql(rep, "split")
    return f"""
WITH RECURSIVE {_SHINGLES_CTE}, {_JACCARD_CTE},
pairs AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.6),
edges AS (
  SELECT id_a AS s, id_b AS t FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach AS (
  SELECT s AS id, t AS r FROM edges
  UNION
  SELECT reach.id, e.t FROM reach JOIN edges e ON reach.r = e.s
),
comp AS (SELECT id, least(id, min(r)) AS component FROM reach GROUP BY id)
SELECT d.doc_id,
       CASE WHEN {u} < 0.8 THEN 'train'
            WHEN {u} < 0.9 THEN 'val'
            ELSE 'test' END AS split
FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
"""


def q_minhash_signatures(spark, sf):
    d = t(spark, sf, "documents")
    return minhash_signatures(d, "doc_id", "text")


SQL_MINHASH_SIG = f"""
WITH {_SHINGLES_CTE}, {_minhash_sig_sql()}
SELECT * FROM sig
"""


def q_dedup_minhash_lsh(spark, sf):
    d = t(spark, sf, "documents")
    p = minhash_lsh_pairs(d, "doc_id", "text", n=3, bands=4, rows_per_band=4, threshold=0.6)
    return p.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


def _minhash_lsh_sql() -> str:
    band_conds = []
    for bi in range(4):
        cols = [f"mh{bi * 4 + ri}" for ri in range(4)]
        band_conds.append("(" + " AND ".join(f"a.{c} = b.{c}" for c in cols) + ")")
    return f"""
WITH {_SHINGLES_CTE}, {_minhash_sig_sql()},
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
  WHERE {' OR '.join(band_conds)}
),
{_JACCARD_CTE.lstrip()}
SELECT c.id_a, c.id_b, round(j.jaccard, 4) AS jaccard
FROM cand c JOIN jac j ON j.id_a = c.id_a AND j.id_b = c.id_b
WHERE j.jaccard >= 0.6
"""


def q_simhash_values(spark, sf):
    d = t(spark, sf, "documents")
    return simhash(d, "doc_id", "text")


SQL_SIMHASH_VALUES = f"""
WITH {_SHINGLES_CTE}, {_simhash_sig_sql()}
SELECT doc_id, simhash FROM ssig
"""


def q_dedup_simhash(spark, sf):
    d = t(spark, sf, "documents")
    return simhash_pairs(d, "doc_id", "text", max_hamming=3)


SQL_DEDUP_SIMHASH = f"""
WITH {_SHINGLES_CTE}, {_simhash_sig_sql()}
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM ssig a JOIN ssig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

_DIMS_CTE = """
dims AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM dims GROUP BY 1)"""


def q_cosine_topk(spark, sf):
    e = t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    return cosine_topk(e, q, k=10)


SQL_COSINE_TOPK = f"""
WITH {_DIMS_CTE},
dots AS (
  SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id, sum(q.x * d.x) AS dot
  FROM dims q JOIN dims d ON q.i = d.i AND d.vec_id <> q.vec_id
  WHERE q.vec_id < 5
  GROUP BY 1, 2
),
scored AS (
  SELECT query_id, neighbor_id, round(dot / (nq.nrm * nd.nrm), 6) AS cosine
  FROM dots
  JOIN norms nq ON nq.vec_id = query_id
  JOIN norms nd ON nd.vec_id = neighbor_id
)
SELECT query_id, neighbor_id, cosine, rn
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id ASC) AS rn
      FROM scored) x
WHERE rn <= 10
"""

# the seeded random-hyperplane bucket, as DuckDB SQL — the literal-coefficient
# twin of sign_bucket_expr (identical IEEE expression on both engines)
from doc_quality_check_spark.operators.similarity import sign_bucket_sql as _sb_sql

_BUCKET_SQL = _sb_sql("embedding", n_bits=8, dim=64)


def q_ann_sign_lsh(spark, sf):
    e = t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    return sign_lsh_topk(e, q, k=3, n_bits=8, dim=64)


SQL_ANN_SIGN_LSH = f"""
WITH {_DIMS_CTE},
bk AS (SELECT vec_id, {_BUCKET_SQL} AS bucket FROM embeddings),
dots AS (
  SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id, sum(q.x * d.x) AS dot
  FROM dims q
  JOIN bk bq ON bq.vec_id = q.vec_id
  JOIN bk bd ON bd.bucket = bq.bucket
  JOIN dims d ON d.vec_id = bd.vec_id AND d.i = q.i AND d.vec_id <> q.vec_id
  WHERE q.vec_id < 5
  GROUP BY 1, 2
),
scored AS (
  SELECT query_id, neighbor_id, round(dot / (nq.nrm * nd.nrm), 6) AS cosine
  FROM dots
  JOIN norms nq ON nq.vec_id = query_id
  JOIN norms nd ON nd.vec_id = neighbor_id
)
SELECT query_id, neighbor_id, cosine, rn
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id ASC) AS rn
      FROM scored) x
WHERE rn <= 3
"""


def q_bpe_tokens(spark, sf):
    """BPE-pretokenizer-style token counting (LLM data budgeting): letter
    runs, digit runs, and individual punctuation as separate tokens."""
    from doc_quality_check_spark.functions.text import bpe_ish_token_count

    d = t(spark, sf, "documents")
    return d.select("doc_id", bpe_ish_token_count("text").alias("n_bpe_tokens"))


SQL_BPE_TOKENS = """
SELECT doc_id,
       len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS n_bpe_tokens
FROM documents
"""


def q_ivf_topk(spark, sf):
    """IVF-flat ANN: deterministic codebook (vec_id < 8), corpus bucketed by
    nearest centroid, queries (vec_id 8-12) probe their 2 nearest lists and
    rank members by exact cosine."""
    from doc_quality_check_spark.operators.similarity import ivf_topk

    e = t(spark, sf, "embeddings")
    centroids = e.filter(F.col("vec_id") < 8)
    queries = e.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 13))
    return ivf_topk(e, queries, centroids, k=5, nprobe=2)


SQL_IVF_TOPK = f"""
WITH {_DIMS_CTE},
cd AS (SELECT * FROM dims WHERE vec_id < 8),
assign_cos AS (
  SELECT d.vec_id, c.vec_id AS centroid_id,
         round(sum(d.x * c.x) / (nd.nrm * nc.nrm), 6) AS cc
  FROM dims d
  JOIN cd c ON c.i = d.i
  JOIN norms nd ON nd.vec_id = d.vec_id
  JOIN norms nc ON nc.vec_id = c.vec_id
  GROUP BY d.vec_id, c.vec_id, nd.nrm, nc.nrm
),
assign AS (
  SELECT vec_id AS neighbor_id, centroid_id AS list_id
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cc DESC, centroid_id ASC) AS rn
        FROM assign_cos) x
  WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, centroid_id AS list_id
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cc DESC, centroid_id ASC) AS rn
        FROM assign_cos WHERE vec_id >= 8 AND vec_id < 13) x
  WHERE rn <= 2
),
cand AS (
  SELECT DISTINCT p.query_id, a.neighbor_id
  FROM probes p JOIN assign a ON a.list_id = p.list_id
  WHERE a.neighbor_id <> p.query_id
),
scored AS (
  SELECT c.query_id, c.neighbor_id,
         round(sum(q.x * n.x) / (nq.nrm * nn.nrm), 6) AS cosine
  FROM cand c
  JOIN dims q ON q.vec_id = c.query_id
  JOIN dims n ON n.vec_id = c.neighbor_id AND n.i = q.i
  JOIN norms nq ON nq.vec_id = c.query_id
  JOIN norms nn ON nn.vec_id = c.neighbor_id
  GROUP BY c.query_id, c.neighbor_id, nq.nrm, nn.nrm
)
SELECT query_id, neighbor_id, cosine, rn
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id ASC) AS rn
      FROM scored) x
WHERE rn <= 5
"""


def q_embedding_neardup(spark, sf):
    """Embedding-cosine near-dup pairs within sign buckets. Threshold 0.3 is
    calibrated to the synthetic embeddings (max pairwise cosine ≈ 0.51) so the
    result is non-trivial; production near-dup mining would use ≥0.9."""
    e = t(spark, sf, "embeddings")
    return cosine_neardup_pairs(e, threshold=0.3)


SQL_EMBEDDING_NEARDUP = f"""
WITH {_DIMS_CTE},
bk AS (SELECT vec_id, {_BUCKET_SQL} AS bucket FROM embeddings),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
),
dots AS (
  SELECT p.id_a, p.id_b, sum(da.x * db.x) AS dot
  FROM pairs p
  JOIN dims da ON da.vec_id = p.id_a
  JOIN dims db ON db.vec_id = p.id_b AND db.i = da.i
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(dot / (na.nrm * nb.nrm), 6) AS cosine
FROM dots
JOIN norms na ON na.vec_id = id_a
JOIN norms nb ON nb.vec_id = id_b
WHERE round(dot / (na.nrm * nb.nrm), 6) >= 0.3
"""


# ---------------------------------------------------------------------------
# Classification / scoring
# ---------------------------------------------------------------------------

TYPE_CATALOGS = {
    "analytics": {"primary": ["query", "scan", "filter", "sort"], "secondary": ["table", "row"]},
    "streaming": {"primary": ["stream", "window", "batch"], "secondary": ["data", "line"]},
}


def q_type_classification(spark, sf):
    """C2: weighted catalog scores + argmax with 'unknown' fallback."""
    d = t(spark, sf, "documents")
    d = d.select("doc_id", "text", *type_scores("text", TYPE_CATALOGS))
    return d.select(
        "doc_id", "score_analytics", "score_streaming",
        argmax_type(list(TYPE_CATALOGS)).alias("doc_type"),
    )


def _hits_sql(kws: list[str]) -> str:
    toks = "list_distinct(string_split_regex(lower(text), '\\s+'))"
    lit = "[" + ", ".join(f"'{k}'" for k in kws) + "]"
    return f"len(list_intersect({toks}, {lit}))"


def _type_sql() -> str:
    scores = []
    for typ, cats in TYPE_CATALOGS.items():
        s = f"{_hits_sql(cats['primary'])} * 2 + {_hits_sql(cats['secondary'])} * 1"
        scores.append(f"{s} AS score_{typ}")
    return f"""
WITH s AS (SELECT doc_id, {', '.join(scores)} FROM documents)
SELECT doc_id, score_analytics, score_streaming,
       CASE WHEN score_analytics >= score_streaming AND score_analytics > 0 THEN 'analytics'
            WHEN score_streaming > 0 THEN 'streaming'
            ELSE 'unknown' END AS doc_type
FROM s
"""


def q_margin_classification(spark, sf):
    """C3: >10%-margin rule with deterministic 'ambiguous' default."""
    d = t(spark, sf, "documents")
    d = d.select("doc_id", *type_scores("text", TYPE_CATALOGS))
    return d.select(
        "doc_id",
        margin_classify(
            F.col("score_analytics"), F.col("score_streaming"),
            "analytics", "streaming",
        ).alias("label"),
    )


def _margin_sql() -> str:
    scores = []
    for typ, cats in TYPE_CATALOGS.items():
        s = f"{_hits_sql(cats['primary'])} * 2 + {_hits_sql(cats['secondary'])} * 1"
        scores.append(f"{s} AS score_{typ}")
    return f"""
WITH s AS (SELECT doc_id, {', '.join(scores)} FROM documents)
SELECT doc_id,
       CASE WHEN score_analytics + score_streaming = 0 THEN 'ambiguous'
            WHEN abs(score_analytics - score_streaming) * 100.0
                 / greatest(greatest(score_analytics, score_streaming), 1) <= 10.0 THEN 'ambiguous'
            WHEN score_analytics > score_streaming THEN 'analytics'
            ELSE 'streaming' END AS label
FROM s
"""


def q_confidence_formula(spark, sf):
    """C4: clamped weighted confidence arithmetic."""
    d = t(spark, sf, "documents")
    d = d.select(
        "doc_id", "n_chars",
        token_count("text").alias("n_tokens"),
        *type_scores("text", TYPE_CATALOGS),
    )
    d = d.withColumn("metric", F.col("n_chars") / 10.0)
    conf = classification_confidence(
        "metric",
        has_type_kw=F.col("score_analytics") > 0,
        n_side_kw=F.col("score_streaming"),
        band_col="n_tokens",
        band_lo=30.0,
        band_hi=70.0,
        length_col="n_chars",
        min_length=100,
    )
    return d.select("doc_id", F.round(conf, 4).alias("confidence"))


def _confidence_sql() -> str:
    sa = f"{_hits_sql(TYPE_CATALOGS['analytics']['primary'])} * 2 + {_hits_sql(TYPE_CATALOGS['analytics']['secondary'])} * 1"
    ss = f"{_hits_sql(TYPE_CATALOGS['streaming']['primary'])} * 2 + {_hits_sql(TYPE_CATALOGS['streaming']['secondary'])} * 1"
    return f"""
WITH s AS (
  SELECT doc_id, n_chars,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
         {sa} AS score_analytics, {ss} AS score_streaming
  FROM documents
)
SELECT doc_id,
       round(least(100.0, greatest(0.0,
             n_chars / 10.0 * 0.3
             + CASE WHEN score_analytics > 0 THEN 30.0 ELSE 0.0 END
             + least(score_streaming * 25.0, 50.0)
             + CASE WHEN n_tokens >= 30.0 AND n_tokens <= 70.0 THEN 15.0
                    WHEN n_tokens < 30.0 THEN -20.0 ELSE -10.0 END
             + CASE WHEN n_chars >= 100 THEN 10.0 ELSE -30.0 END)), 4) AS confidence
FROM s
"""


def q_freq_boost(spark, sf):
    """C5/J2: cross-row label frequency → broadcast-back boost × quality
    factor, capped."""
    d = t(spark, sf, "documents")
    d = d.select(
        "doc_id", "lang",
        F.least(F.col("n_chars") / 5.0, F.lit(100.0)).alias("base_conf"),
        token_count("text").alias("n_tokens"),
    )
    out = frequency_boost(
        d, label_col="lang", conf_col="base_conf", quality_col="n_tokens",
        tiers=[(150, 15.0), (100, 10.0), (50, 5.0)],
    )
    return out.select("doc_id", "lang", "label_freq", "boost", "boosted_conf")


SQL_FREQ_BOOST = """
WITH d AS (
  SELECT doc_id, lang,
         least(n_chars / 5.0, 100.0) AS base_conf,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens
  FROM documents
),
f AS (SELECT lang, count(*) AS label_freq FROM d GROUP BY 1),
j AS (SELECT d.*, f.label_freq FROM d JOIN f USING (lang))
SELECT doc_id, lang, label_freq,
       round(CAST(CASE WHEN label_freq >= 150 THEN 15.0
                  WHEN label_freq >= 100 THEN 10.0
                  WHEN label_freq >= 50 THEN 5.0 ELSE 0.0 END
             * CASE WHEN n_tokens < 30 THEN 0.5
                    WHEN n_tokens < 50 THEN 0.75 ELSE 1.0 END AS DOUBLE), 4) AS boost,
       round(least(100.0, greatest(0.0,
             base_conf
             + CASE WHEN label_freq >= 150 THEN 15.0
                    WHEN label_freq >= 100 THEN 10.0
                    WHEN label_freq >= 50 THEN 5.0 ELSE 0.0 END
               * CASE WHEN n_tokens < 30 THEN 0.5
                      WHEN n_tokens < 50 THEN 0.75 ELSE 1.0 END)), 4) AS boosted_conf
FROM j
"""


_RECLASS_BACK = ["scan", "merge", "sort"]
_RECLASS_FRONT = ["table", "row", "window", "filter"]


def q_priority_reclass(spark, sf):
    """C7 priority reclassification with recorded detection_method
    (reference identity_detection.py:162-187): marker-count rule beats
    back-keyword rule beats front-keyword rule beats length tie-break; every
    row carries WHY it was classified. Marker/catalogs retargeted to the
    documents vocabulary ('agg' as the MRZ-marker analog)."""
    from doc_quality_check_spark.functions.classify import priority_reclassify

    d = t(spark, sf, "documents")
    s = priority_reclassify(
        "text", _RECLASS_BACK, _RECLASS_FRONT,
        marker="agg", marker_min=3, short_len=300,
    )
    return d.select("doc_id", s.alias("s")).select(
        "doc_id",
        F.col("s.label").alias("label"),
        F.col("s.detection_method").alias("detection_method"),
    )


def _reclass_sql() -> str:
    back = " + ".join(
        f"CASE WHEN lower(text) LIKE '%{k}%' THEN 1 ELSE 0 END" for k in _RECLASS_BACK
    )
    front = " + ".join(
        f"CASE WHEN lower(text) LIKE '%{k}%' THEN 1 ELSE 0 END" for k in _RECLASS_FRONT
    )
    return f"""
WITH a AS (
  SELECT doc_id,
         CAST((length(text) - length(replace(text, 'agg', ''))) / 3 AS INT) AS mrz_score,
         ({back}) AS back_score,
         ({front}) AS front_score,
         length(text) AS n
  FROM documents
)
SELECT doc_id,
  CASE WHEN mrz_score >= 3 THEN 'back'
       WHEN back_score > 0 AND back_score >= front_score THEN 'back'
       WHEN front_score > 0 AND front_score > back_score THEN 'front'
       WHEN front_score > 0 AND n < 300 THEN 'front'
       WHEN front_score > 0 THEN 'back'
       ELSE NULL END AS label,
  CASE WHEN mrz_score >= 3 THEN 'mrz_pattern'
       WHEN back_score > 0 AND back_score >= front_score THEN 'back_keywords'
       WHEN front_score > 0 AND front_score > back_score THEN 'front_keywords'
       WHEN front_score > 0 AND n < 300 THEN 'front_keywords_priority'
       WHEN front_score > 0 THEN 'back_keywords_priority'
       ELSE NULL END AS detection_method
FROM a
"""


def q_sessionize(spark, sf):
    """Gaps-and-islands sessionization: a new session starts when a user's
    inter-event gap exceeds 30 minutes; per-session stats. The W-series
    run-length pattern (row_number difference / cumulative flag sum) over
    event time."""
    from pyspark.sql import Window

    ev = t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    # microsecond-exact epoch on BOTH engines (a seconds cast truncates in
    # Spark but not in DuckDB's epoch()); ts is TIMESTAMP_NTZ → cast under
    # the session's UTC zone, matching DuckDB's naive-timestamp epoch_us
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    flagged = ev.withColumn(
        "new_sess", F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    )
    wsum = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id")) \
        .rowsBetween(Window.unboundedPreceding, 0)
    sess = flagged.withColumn("session_id", F.sum("new_sess").over(wsum))
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"),
        # exact fixed-point sum → order-insensitive across engines
        F.round(F.sum(F.col("value").cast("decimal(28,6)")).cast("double"), 4).alias("session_value"),
    )


SQL_SESSIONIZE = """
WITH g AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) > 1800000000
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
s AS (
  -- window sum over INT is HUGEINT in DuckDB (decimal128 over Arrow); Spark
  -- emits int64 — cast, as for every other integer sum (driver hash parity)
  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM g
)
SELECT user_id, session_id, count(*) AS n_events,
       min(event_id) AS first_event, max(event_id) AS last_event,
       round(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 4) AS session_value
FROM s GROUP BY user_id, session_id
"""


def q_iou_dedupe(spark, sf):
    """O2 greedy IoU overlap removal (rows-only driver check: the greedy
    largest-first loop is inherently sequential per group and has no
    single-pass SQL form — correctness is pinned by
    tests/test_segmentation.py::test_iou_dedupe_segments). Intervals are
    synthesized deterministically from the events table."""
    from doc_quality_check_spark.operators.segmentation import iou_dedupe_segments

    ev = t(spark, sf, "events")
    segs = ev.select(
        F.col("user_id").cast("string").alias("clip_id"),
        (F.col("value") * 10.0).alias("seg_start_ms"),
        (F.col("value") * 10.0 + ((F.col("event_id") % 5) + 1) * 20.0).alias("seg_end_ms"),
    )
    return iou_dedupe_segments(segs)


def q_audio_neardup(spark, sf):
    """Payload-level audio near-dup via spectral fingerprints + banded
    Hamming LSH (rows-only driver check: the PCM decode + FFT fingerprint
    has no SQL form — semantics pinned by tests/test_audio_dedup.py).
    Clips are synthesized deterministically EXECUTOR-side from the events
    table's user ids: content seed ``user_id % 30`` gives several 'takes'
    of the same recording per group, each with its own low-level noise
    keyed by user_id — the near-dup structure the fingerprint must
    recover. Candidates come from the pigeonhole block equi-join
    (operators/audio_dedup.py), never an all-pairs scan."""
    from doc_quality_check_spark.functions.audio import (
        encode_wav_pcm16,
        synth_speechlike_pcm,
    )
    from doc_quality_check_spark.operators.audio_dedup import audio_neardup_pairs

    # Two measured pathologies shape this plan (this VM, BASELINE.md):
    # 1. AQE coalesces the tiny distinct output to ONE partition, which
    #    would serialize the synth UDF into a single Python worker — spread
    #    the uid rows (longs, NOT a payload shuffle). 8 partitions, not 32:
    #    binary-column Arrow transfer degrades superlinearly past ~8
    #    concurrent writer threads in one JVM (9.1s @32p vs 3.4s @8p).
    # 2. CHAINED pandas UDFs in one stage (synth -> fingerprint, bytes
    #    crossing the JVM twice) run ~20x slower than the same work split
    #    across stages (28.5s vs 1.5s measured) — checkpoint the synthetic
    #    clips so the fingerprint stage starts from stored bytes, exactly
    #    like the real-data path (parquet scan -> ONE decode UDF).
    users = (
        t(spark, sf, "events")
        .select(F.col("user_id").cast("long").alias("uid"))
        .distinct()
        .repartition(8)
    )

    @F.pandas_udf("binary")
    def _synth(uids: pd.Series) -> pd.Series:
        return pd.Series([
            encode_wav_pcm16(
                synth_speechlike_pcm(
                    int(u) % 30, 8000, 500, noise=0.002, noise_seed=int(u)
                ),
                8000,
            )
            for u in uids
        ])

    clips = users.select(
        F.concat(F.lit("clip_"), F.col("uid")).alias("clip_id"),
        _synth("uid").alias("bytes"),
        F.lit("pcm_s16le").alias("codec"),
    ).localCheckpoint(eager=True)
    return audio_neardup_pairs(clips).orderBy("id_a", "id_b")


def q_image_decode_metrics(spark, sf):
    """Image-payload decode through the REAL codecs under the driver gate:
    every document row synthesizes a small image executor-side — the
    container rotates on doc_id % 4 through PNG, baseline JPEG,
    ARITHMETIC JPEG (SOF9, round 5), and LOSSLESS JPEG (SOF3, round 5) —
    dimensions derived from doc_id — then ONE image_metrics mapInPandas
    pass decodes them. The oracle recomputes (width, height, decode_ok)
    from the same doc_id formulas in SQL, so a codec regression (wrong
    dims, decode failure) in ANY of the four paths hash-fails the driver
    row; pixel-level semantics stay pinned by tests/test_media_png.py and
    test_media_jpeg.py. Same two measured plan rules as q_audio_neardup:
    spread the tiny id set before the binary-emitting UDF, and checkpoint
    between the synth and decode UDFs so bytes never chain through one
    stage (the 20x chained-binary-UDF pathology, BASELINE.md)."""
    import numpy as np

    from doc_quality_check_spark.functions.jpeg import (
        encode_jpeg_gray,
        encode_jpeg_gray_lossless,
    )
    from doc_quality_check_spark.functions.jpeg_arith import (
        encode_jpeg_gray_arith,
    )
    from doc_quality_check_spark.functions.media import (
        encode_png_gray,
        image_metrics,
    )

    docs = (
        t(spark, sf, "documents")
        .select(F.col("doc_id").cast("long").alias("doc_id"))
        .repartition(8)
    )

    @F.pandas_udf("binary")
    def _synth(ids: pd.Series) -> pd.Series:
        encoders = (
            encode_png_gray,
            lambda px: encode_jpeg_gray(px, quality=90),
            lambda px: encode_jpeg_gray_arith(px, quality=90),
            lambda px: encode_jpeg_gray_lossless(px, predictor=4),
        )
        out = []
        for i in ids:
            i = int(i)
            w, h = 8 + i % 13, 8 + i % 7
            yy, xx = np.mgrid[0:h, 0:w]
            px = ((xx * 3 + yy * 5 + i) % 256).astype(np.uint8)
            out.append(encoders[i % 4](px))
        return pd.Series(out)

    imgs = docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        _synth("doc_id").alias("bytes"),
    ).localCheckpoint(eager=True)
    return image_metrics(imgs).select(
        F.col("media_id").cast("long").alias("doc_id"),
        "width",
        "height",
        "decode_ok",
    ).orderBy("doc_id")


# the oracle re-derives the container-independent facts (dimensions from
# the doc_id formulas, decode success) — the SQL-expressible half of the
# invariant; decoded pixel values have no SQL form and are pytest-pinned
SQL_IMAGE_DECODE_METRICS = """
SELECT doc_id,
       CAST(8 + doc_id % 13 AS INTEGER) AS width,
       CAST(8 + doc_id % 7 AS INTEGER) AS height,
       TRUE AS decode_ok
FROM documents
ORDER BY doc_id
"""


def q_video_frame_metrics(spark, sf):
    """VIDEO-payload frame sampling through the REAL containers under the
    driver gate (round 5): every document row synthesizes a small video
    executor-side — MJPEG-in-AVI for even doc_ids (RIFF container + real
    JPEG frames), YUV4MPEG2 for odd — with flat per-frame luma derived
    from (doc_id, frame_idx), then ONE video_frame_sample mapInPandas
    pass samples at 1000 ms. The oracle recomputes the sampled fan-out
    (row count, frame_idx = 2*sample, t_ms, dimensions, decode_ok) from
    the same doc_id formulas in SQL; the decoded luma has no SQL form, so
    it rides a self-checking boolean (|luma_mean - expected| <= 1.0,
    flat JPEG frames reconstruct within DC-quantization rounding; Y4M is
    lossless) whose oracle is a TRUE literal — the percentiles_sketch
    pattern. Same plan rules as q_image_decode_metrics: spread ids
    before the binary-emitting UDF, checkpoint between synth and decode
    so bytes never chain through one stage."""
    import numpy as np

    from doc_quality_check_spark.functions.media import (
        encode_avi_mjpeg,
        encode_y4m,
        video_frame_sample,
    )

    docs = (
        t(spark, sf, "documents")
        .select(F.col("doc_id").cast("long").alias("doc_id"))
        .repartition(8)
    )

    @F.pandas_udf("binary")
    def _synth(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            w, h = 16 + 2 * (i % 5), 16 + 2 * (i % 3)
            frames = [
                np.full((h, w), (i * 7 + j * 40) % 200 + 20, dtype=np.uint8)
                for j in range(2 + i % 4)
            ]
            out.append(
                encode_avi_mjpeg(frames, fps=(2, 1), quality=90)
                if i % 2 == 0
                else encode_y4m(frames, fps=(2, 1))
            )
        return pd.Series(out)

    vids = docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        _synth("doc_id").alias("bytes"),
        F.lit(0).alias("dur_ms"),  # real containers carry their own timing
    ).localCheckpoint(eager=True)
    s = video_frame_sample(vids, every_ms=1000)
    i = F.col("media_id").cast("long")
    expected = (i * 7 + F.col("frame_idx") * 40) % 200 + 20
    return s.select(
        i.alias("doc_id"),
        "frame_idx",
        "t_ms",
        "width",
        "height",
        "decode_ok",
        (F.abs(F.col("luma_mean") - expected) <= 1.0).alias("ok_luma"),
    ).orderBy("doc_id", "frame_idx")


# the oracle re-derives the container-independent sampling fan-out from
# the doc_id formulas: nframes = 2 + id%4 at 2 fps -> 500 ms frames,
# sampled every 1000 ms -> nframes//2 rows (>=1), frame_idx = 2*sample;
# decoded luma rides the self-check boolean (TRUE literal)
SQL_VIDEO_FRAME_METRICS = """
WITH base AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         2 + CAST(doc_id AS BIGINT) % 4 AS nframes
  FROM documents
),
expanded AS (
  SELECT doc_id,
         CAST(2 * unnest(range(0, GREATEST(1, nframes // 2))) AS INTEGER)
           AS frame_idx
  FROM base
)
SELECT doc_id,
       frame_idx,
       CAST(frame_idx AS DOUBLE) * 500.0 AS t_ms,
       CAST(16 + 2 * (doc_id % 5) AS INTEGER) AS width,
       CAST(16 + 2 * (doc_id % 3) AS INTEGER) AS height,
       TRUE AS decode_ok,
       TRUE AS ok_luma
FROM expanded
ORDER BY doc_id, frame_idx
"""


def q_audio_decode_metrics(spark, sf):
    """AUDIO-codec-matrix decode under the driver gate (round 5): every
    document row synthesizes a clip executor-side, rotating doc_id % 6
    through PCM16 WAV, G.711 mu-law, A-law, IEEE float32, IMA ADPCM, and
    NATIVE FLAC (functions/flac.py) — sample rate and duration derived
    from doc_id — then one decode pass recovers (header_sr,
    decoded_dur_ms) and self-checks the decoded PCM's SNR against the
    regenerated source (>=30 dB for waveform codecs, >=12 dB for 4-bit
    ADPCM). The oracle recomputes sr/duration/decode_ok from the same
    formulas in SQL; the SNR booleans ride TRUE literals (the
    percentiles_sketch pattern). A regression in ANY audio decode path —
    including the round-5 format-tag dispatch — hash-fails this row."""
    import numpy as np

    from doc_quality_check_spark.functions.audio import (
        decode_payload,
        synth_clip_bytes,
        synth_pcm,
    )

    docs = (
        t(spark, sf, "documents")
        .select(F.col("doc_id").cast("long").alias("doc_id"))
        .repartition(8)
    )
    labels = ["pcm_s16le", "mulaw", "alaw", "pcm_f32le", "adpcm_ima_wav",
              "flac_native"]

    @F.pandas_udf(
        "doc_id long, header_sr int, decoded_dur_ms int, decode_ok boolean,"
        " ok_snr boolean"
    )
    def _decode(ids: pd.Series) -> pd.DataFrame:
        rows = []
        for i in ids:
            i = int(i)
            sr = 8000 << (i % 2)
            dur = 300 + (i % 5) * 50
            codec = labels[i % 6]
            buf = synth_clip_bytes(i, sr, dur, codec)
            got_sr, pcm = decode_payload(buf, codec)
            ref = synth_pcm(i, sr, dur)
            n = min(len(ref), len(pcm))
            err = np.mean((ref[:n].astype(np.float64)
                           - pcm[:n].astype(np.float64)) ** 2)
            snr = 10 * np.log10(
                np.mean(ref[:n].astype(np.float64) ** 2) / max(err, 1e-20)
            ) if n else -1.0
            bound = 12.0 if codec == "adpcm_ima_wav" else 30.0
            rows.append((
                i, got_sr, int(round(1000.0 * len(pcm) / got_sr)),
                len(pcm) > 0, bool(snr >= bound and len(pcm) == len(ref)),
            ))
        return pd.DataFrame(rows, columns=[
            "doc_id", "header_sr", "decoded_dur_ms", "decode_ok", "ok_snr",
        ])

    return docs.select(_decode("doc_id").alias("m")).select(
        "m.*"
    ).orderBy("doc_id")


SQL_AUDIO_DECODE_METRICS = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(8000 * (1 + doc_id % 2) AS INTEGER) AS header_sr,
       CAST(300 + (doc_id % 5) * 50 AS INTEGER) AS decoded_dur_ms,
       TRUE AS decode_ok,
       TRUE AS ok_snr
FROM documents
ORDER BY doc_id
"""


def q_column_corr(spark, sf):
    """Per-language Pearson correlation between declared n_chars and the
    measured whitespace word count (column-relationship profiling — the
    Deequ `correlation` analyzer shape). Exact-integer-sum closed formula
    (operators/aggregates.pearson_corr), so the float result is
    bit-reproducible in the DuckDB oracle: one grouped aggregate, single
    shuffle."""
    from doc_quality_check_spark.operators.aggregates import pearson_corr

    d = t(spark, sf, "documents").select(
        "lang",
        F.col("n_chars").alias("x"),
        F.size(F.split(F.col("text"), r"\s+")).cast("long").alias("y"),
    )
    return pearson_corr(d, "x", "y", group_cols=("lang",)).orderBy("lang")


# same exact-BIGINT-sums closed formula: both engines compute identical
# integers, divide once in DOUBLE, and round 6dp — no streaming corr()
# whose accumulation order differs per engine
SQL_COLUMN_CORR = """
WITH b AS (
  SELECT lang,
         n_chars AS x,
         CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS y
  FROM documents
  WHERE n_chars IS NOT NULL AND text IS NOT NULL
),
s AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM b GROUP BY lang
)
SELECT lang,
       CASE WHEN n >= 2
                 AND CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
                 AND CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0
            THEN round(
              (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
              / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                   * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
              6)
       END AS corr
FROM s
ORDER BY lang
"""


def q_heavy_hitters(spark, sf):
    """Exact token heavy hitters over documents (the exact baseline a
    count-min sketch approximates at scale)."""
    from doc_quality_check_spark.operators.aggregates import heavy_hitters

    d = t(spark, sf, "documents")
    toks = d.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"))
    return heavy_hitters(toks, "tok", min_count=100).withColumnRenamed("value", "tok")


SQL_HEAVY_HITTERS = """
SELECT tok AS tok, count(*) AS cnt
FROM (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS tok FROM documents)
GROUP BY tok HAVING count(*) >= 100
"""


def q_heavy_hitters_cms(spark, sf):
    """Approximate heavy hitters via a count-min sketch — the mergeable,
    bounded-state scale path the exact heavy_hitters baseline anchors.
    The DuckDB oracle rebuilds the identical sketch (shared md5-prefix hash
    family), so estimates match bit-for-bit."""
    from doc_quality_check_spark.operators.aggregates import count_min_estimates

    d = t(spark, sf, "documents")
    toks = d.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"))
    return (
        count_min_estimates(toks, "tok", width=1024, depth=4)
        .filter(F.col("est") >= 100)
        .withColumnRenamed("value", "tok")
    )


def _cms_sql() -> str:
    from doc_quality_check_spark.operators.aggregates import CMS_COEFFS, CMS_PRIME

    values = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(CMS_COEFFS))
    return f"""
WITH toks AS (
  SELECT unnest(string_split_regex(lower(text), '\\s+')) AS tok FROM documents
),
hashes AS (
  SELECT tok, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM toks
),
coeffs(i, a, b) AS (VALUES {values}),
coords AS (
  SELECT tok, i, CAST(((a * h + b) % {CMS_PRIME}) % 1024 AS INT) AS bucket
  FROM hashes, coeffs
),
sketch AS (SELECT i, bucket, count(*) AS cnt FROM coords GROUP BY i, bucket),
probes AS (SELECT DISTINCT tok, i, bucket FROM coords)
SELECT p.tok AS tok, min(s.cnt) AS est
FROM probes p JOIN sketch s ON p.i = s.i AND p.bucket = s.bucket
GROUP BY p.tok HAVING min(s.cnt) >= 100
"""


def q_self_drift(spark, sf):
    """A12 round trip: a snapshot drifted against itself is exactly zero PSI
    and zero KS (the runner's baseline-writer path)."""
    from doc_quality_check_spark.operators.aggregates import (
        drift_ks, drift_psi, snapshot_histograms,
    )

    ev = t(spark, sf, "events")
    snap = snapshot_histograms(ev, ["event_type"]).select("bucket", "count")
    psi = drift_psi(snap, snap).select(F.round("psi", 6).alias("psi"))
    ks = drift_ks(snap, snap).select(F.round("ks", 6).alias("ks"))
    return psi.crossJoin(ks)


SQL_SELF_DRIFT = """
SELECT CAST(0.0 AS DOUBLE) AS psi, CAST(0.0 AS DOUBLE) AS ks
"""


# ---------------------------------------------------------------------------
# Frame-spec windows (rowsBetween) — the engine's KS cumulative-sum machinery
# generalized to per-entity running stats
# ---------------------------------------------------------------------------

def q_asof_join(spark, sf):
    """Backward as-of join (operators/joins.py asof_join): every click
    event matched to the user's most recent error event at or before it.
    The right side is pre-aggregated to one row per (user_id, ts) via
    max/max_by(event_id) so the as-of is well-defined; DuckDB's native
    ASOF LEFT JOIN is the oracle."""
    from doc_quality_check_spark.operators.joins import asof_join

    ev = t(spark, sf, "events")
    l = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    r = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("err_event"),
            F.max_by("value", "event_id").alias("err_value"),
        )
    )
    out = asof_join(l, r, ["user_id"], "ts", ["err_event", "err_value"], suffix="")
    return out.select(
        "event_id",
        "user_id",
        F.round(F.col("value").cast("double"), 4).alias("click_value"),
        "err_event",
        F.round(F.col("err_value").cast("double"), 4).alias("err_value"),
    )


SQL_ASOF_JOIN = """
WITH l AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'
),
r AS (
  SELECT user_id, ts, max(event_id) AS err_event,
         arg_max(value, event_id) AS err_value
  FROM events WHERE event_type = 'error' GROUP BY user_id, ts
)
SELECT l.event_id, l.user_id,
       round(CAST(l.value AS DOUBLE), 4) AS click_value,
       r.err_event AS err_event,
       round(CAST(r.err_value AS DOUBLE), 4) AS err_value
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def q_running_total(spark, sf):
    """GLOBAL running sum via the distributed two-phase scan
    (operators/aggregates.py prefix_sum) — no single-partition window
    anywhere in the plan. Values go through exact micro-unit integers
    (2dp fixture values scaled 1e6) so the scan is associative and
    bit-identical to the oracle's sequential window regardless of
    partitioning."""
    from doc_quality_check_spark.operators.aggregates import prefix_sum

    ev = t(spark, sf, "events").select(
        "event_id", F.round(F.col("value") * 1e6).cast("long").alias("v_us")
    )
    out = prefix_sum(ev, ["event_id"], "v_us", out_col="cum_us")
    return out.select(
        "event_id",
        F.round(F.col("cum_us") / F.lit(1_000_000.0), 4).alias("running_value"),
    )


# window sum over BIGINT is HUGEINT in DuckDB -> CAST before the division
# (the sessionize lesson, applied at authoring time)
SQL_RUNNING_TOTAL = """
SELECT event_id,
       round(CAST(sum(CAST(round(value * 1000000) AS BIGINT))
                  OVER (ORDER BY event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) / 1000000.0, 4) AS running_value
FROM events
"""


def q_token_budget(spark, sf):
    """Greedy longest-first document selection under a global 60k-char
    budget (operators/sampling.py select_token_budget over the distributed
    prefix_sum scan). Oracle is the sequential window cumsum with an
    explicit ROWS frame."""
    from doc_quality_check_spark.operators.sampling import select_token_budget

    d = t(spark, sf, "documents").select("doc_id", "n_chars")
    out = select_token_budget(
        d, score_col="n_chars", token_col="n_chars", budget=60_000
    )
    return out.select("doc_id", "n_chars")


SQL_TOKEN_BUDGET = """
WITH c AS (
  SELECT doc_id, n_chars,
         sum(n_chars) OVER (ORDER BY n_chars DESC, doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM documents
)
SELECT doc_id, n_chars FROM c WHERE cum <= 60000
"""


def q_range_join(spark, sf):
    """Binned point-in-interval join (operators/joins.py range_join_points):
    clicks landing within 10 minutes after any error by the same user.
    Epoch-microsecond domain on both engines (Spark unix_micros == DuckDB
    epoch_us for naive timestamps); the oracle is the plain BETWEEN
    inequality join the binned form must reproduce exactly."""
    from doc_quality_check_spark.operators.joins import range_join_points

    ev = t(spark, sf, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    pts = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", us.alias("pt_us"), "value"
    )
    iv = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_event"),
        "user_id",
        us.alias("t0_us"),
        (us + F.lit(600 * 1_000_000)).alias("t1_us"),
    )
    out = range_join_points(
        pts, iv, ["user_id"], "pt_us", "t0_us", "t1_us",
        bin_us=600 * 1_000_000,
    )
    return out.select(
        "event_id",
        "err_event",
        "user_id",
        F.round(F.col("value").cast("double"), 4).alias("click_value"),
    )


SQL_RANGE_JOIN = """
WITH p AS (
  SELECT event_id, user_id, epoch_us(ts) AS pt_us, value
  FROM events WHERE event_type = 'click'
),
iv AS (
  SELECT event_id AS err_event, user_id,
         epoch_us(ts) AS t0_us, epoch_us(ts) + 600000000 AS t1_us
  FROM events WHERE event_type = 'error'
)
SELECT p.event_id, iv.err_event, p.user_id,
       round(CAST(p.value AS DOUBLE), 4) AS click_value
FROM p JOIN iv
  ON p.user_id = iv.user_id AND p.pt_us BETWEEN iv.t0_us AND iv.t1_us
"""


def q_moving_avg(spark, sf):
    """3-row trailing moving average per user (deterministic ts+id order)."""
    from pyspark.sql import Window

    ev = t(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(-2, 0)
    )
    return ev.select(
        "event_id", "user_id", F.round(F.avg("value").over(w), 4).alias("mov_avg")
    )


SQL_MOVING_AVG = """
SELECT event_id, user_id,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg
FROM events
"""


def q_cumulative_share(spark, sf):
    """Running share of a group's total — the KS-statistic CDF window shape
    (operators/aggregates.py drift_ks) exposed as a query."""
    from pyspark.sql import Window

    ev = t(spark, sf, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy("event_type")
    return ev.select(
        "event_id",
        "event_type",
        F.round(F.sum("value").over(w) / F.sum("value").over(tot), 6).alias("cum_share"),
    )


SQL_CUM_SHARE = """
SELECT event_id, event_type,
       round(sum(value) OVER (PARTITION BY event_type ORDER BY event_id ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             / sum(value) OVER (PARTITION BY event_type), 6) AS cum_share
FROM events
"""


KW_LIST = sorted(
    {k for cats in TYPE_CATALOGS.values() for ks in cats.values() for k in ks}
)


def q_keyword_freq(spark, sf):
    """A7 cross-row keyword frequency (identity_detection.py:261-327): which
    catalog keywords appear in how many docs, with the sorted member set —
    explode → filter → one groupBy with count + collect_set."""
    d = t(spark, sf, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.lower("text"), r"\s+"))).alias("kw"),
    ).filter(F.col("kw").isin(KW_LIST))
    return toks.groupBy("kw").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.array_join(
            F.sort_array(F.collect_set(F.col("doc_id").cast("string"))), ","
        ).alias("docs"),
    )


SQL_KEYWORD_FREQ = f"""
SELECT kw, count(DISTINCT doc_id) AS n_docs,
       array_to_string(list_sort(list(DISTINCT CAST(doc_id AS VARCHAR))), ',') AS docs
FROM (SELECT doc_id,
             unnest(list_distinct(string_split_regex(lower(text), '\\s+'))) AS kw
      FROM documents)
WHERE kw IN ({', '.join(f"'{k}'" for k in KW_LIST)})
GROUP BY kw
"""


# ---------------------------------------------------------------------------
# Fan-out + grouped repair
# ---------------------------------------------------------------------------

def q_chunk_fanout(spark, sf):
    """O1/S3: doc → fixed-size chunk rows (pure Catalyst fan-out)."""
    d = t(spark, sf, "documents")
    return chunk_fanout(d, "doc_id", "text", chunk_chars=100).select(
        "doc_id", "chunk_idx", "chunk_text", "chunk_len"
    )


# The numbers CTE caps the oracle's fan-out at 10000 chunks (1M chars/doc;
# DuckDB's generate_series cannot take a lateral data-derived bound). Any
# document beyond the cap emits a sentinel row instead of silently
# truncating, so the driver's hash compare fails LOUDLY if the fixture ever
# outgrows the bound (Spark's chunk_fanout is unbounded).
SQL_CHUNK_FANOUT = """
WITH nums AS (SELECT CAST(g AS INT) AS g FROM generate_series(0, 9999) t(g))
SELECT doc_id,
       g AS chunk_idx,
       substr(text, g * 100 + 1, 100) AS chunk_text,
       length(substr(text, g * 100 + 1, 100)) AS chunk_len
FROM documents JOIN nums
  ON g < greatest(CAST(ceil(length(text) / 100.0) AS INT), 1)
UNION ALL
SELECT doc_id, -1, 'ORACLE_CHUNK_BOUND_EXCEEDED', -1
FROM documents WHERE length(text) > 100 * 10000
"""


def q_pair_repair(spark, sf):
    """J3 grouped repair via applyInPandas: within doc_id//2 pairs, the much-
    shorter member adopts its partner's lang."""
    d = t(spark, sf, "documents")
    d = d.select(
        "doc_id",
        (F.col("doc_id") / 2).cast("long").alias("pair_key"),
        "lang",
        F.size(F.split("text", " ")).alias("n_toks"),
    )
    out = pair_repair(d, group_col="pair_key", label_col="lang",
                      weight_col="n_toks", id_col="doc_id")
    return out.select("doc_id", "pair_key", "lang", "repaired_label")


SQL_PAIR_REPAIR = """
WITH g AS (
  SELECT doc_id, doc_id // 2 AS pair_key, lang,
         len(string_split(text, ' ')) AS n_toks
  FROM documents
)
SELECT a.doc_id, a.pair_key, a.lang,
       CASE WHEN b.doc_id IS NOT NULL AND a.n_toks < 0.5 * b.n_toks
            THEN b.lang ELSE a.lang END AS repaired_label
FROM g a
LEFT JOIN g b ON b.pair_key = a.pair_key AND b.doc_id <> a.doc_id
"""


# ---------------------------------------------------------------------------
# Column profiling (completeness / stats over a mixed-null table)
# ---------------------------------------------------------------------------

def q_column_entropy(spark, sf):
    """Shannon entropy (bits) of the lang distribution per source — the
    categorical-column profiling signal: ~0 bits flags a degenerate or
    near-constant column, log2(k) flags uniform spread. One grouped count
    + one group window over the (source, lang) histogram — histogram-sized
    data only, same shuffle shape as drift_psi_by_group."""
    from pyspark.sql import Window

    d = t(spark, sf, "documents")
    cnt = d.groupBy("source", "lang").agg(F.count("*").alias("c"))
    p = F.try_divide(F.col("c"), F.sum("c").over(Window.partitionBy("source")))
    return (
        cnt.select("source", (-(p) * F.log2(p)).alias("term"))
        .groupBy("source")
        .agg(F.round(F.sum("term"), 4).alias("entropy"))
        .orderBy("source")
    )


SQL_COLUMN_ENTROPY = """
WITH cnt AS (SELECT source, lang, count(*) AS c FROM documents GROUP BY 1, 2),
t AS (SELECT source, c, sum(c) OVER (PARTITION BY source) AS tot FROM cnt)
SELECT source, round(sum(-(c * 1.0 / tot) * log2(c * 1.0 / tot)), 4) AS entropy
FROM t GROUP BY source ORDER BY source
"""


def q_completeness_profile(spark, sf):
    ev = t(spark, sf, "events")
    return ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.try_divide(F.count("props"), F.count(F.lit(1))), 6).alias("completeness_props"),
        F.round(F.try_divide(F.count("value"), F.count(F.lit(1))), 6).alias("completeness_value"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.min("value"), 4).alias("min_value"),
        F.round(F.max("value"), 4).alias("max_value"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )


SQL_COMPLETENESS_PROFILE = """
SELECT count(*) AS n_rows,
       round(count(props) * 1.0 / count(*), 6) AS completeness_props,
       round(count(value) * 1.0 / count(*), 6) AS completeness_value,
       count(DISTINCT user_id) AS n_users,
       round(min(value), 4) AS min_value,
       round(max(value), 4) AS max_value,
       round(avg(value), 4) AS avg_value
FROM events
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def q_boilerplate_lines(spark, sf):
    """Corpus boilerplate-line removal (operators/dedup.py
    remove_boilerplate_lines): line structure is synthesized
    deterministically from the single-line fixture text (8-token lines),
    then any line shared by more than 2 distinct documents is dropped from
    every document — the C4-style line-dedup cleaning step."""
    from doc_quality_check_spark.operators.dedup import remove_boilerplate_lines

    d = t(spark, sf, "documents")
    arr = F.split(F.trim(F.col("text")), " ")
    n_lines = F.ceil(F.size(arr) / F.lit(8.0)).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_lines - F.lit(1)),
        lambda i: F.array_join(F.slice(arr, i * F.lit(8) + F.lit(1), 8), " "),
    )
    d2 = d.select("doc_id", F.array_join(lines, "\n").alias("text"))
    out = remove_boilerplate_lines(d2, "doc_id", "text", max_line_df=2)
    return out.select("doc_id", "clean_text", "n_lines_removed")


SQL_BOILERPLATE_LINES = """
WITH a AS (
  SELECT doc_id, string_split(trim(text), ' ') AS arr FROM documents
),
ln AS (
  SELECT doc_id,
         list_transform(range(0, CAST(ceil(len(arr)/8.0) AS INT)),
                        i -> {'pos': i,
                              'line': array_to_string(list_slice(arr, i*8+1, i*8+8), ' ')})
           AS pl
  FROM a
),
x AS (SELECT doc_id, unnest(pl) AS u FROM ln),
y AS (SELECT doc_id, u.pos AS pos, u.line AS line FROM x),
hot AS (
  SELECT trim(line) AS norm FROM y WHERE trim(line) <> ''
  GROUP BY 1 HAVING count(DISTINCT doc_id) > 2
),
k AS (
  SELECT y.doc_id, y.pos, y.line, hot.norm
  FROM y LEFT JOIN hot ON trim(y.line) = hot.norm
)
SELECT doc_id,
       coalesce(string_agg(CASE WHEN norm IS NULL THEN line END, chr(10) ORDER BY pos), '')
         AS clean_text,
       count(norm) AS n_lines_removed
FROM k GROUP BY doc_id
"""


def q_bm25_search(spark, sf):
    """Okapi BM25 keyword retrieval (operators/similarity.py bm25_topk):
    top-15 documents for the query bag {spark, dup, vector} — 'dup' is rare
    in the corpus (high idf), the others common, so the ranking exercises
    both idf extremes. Per-term scores round to 6 decimals and sum as
    DECIMAL(28,6) (the repo's float-sum parity rule)."""
    from doc_quality_check_spark.operators.similarity import bm25_topk

    d = t(spark, sf, "documents")
    return bm25_topk(d, "doc_id", "text", ["spark", "dup", "vector"], k=15)


SQL_BM25_SEARCH = r"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok FROM documents
),
t2 AS (SELECT * FROM toks WHERE tok <> ''),
dl AS (SELECT doc_id, count(*) AS dl FROM t2 GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
qt AS (SELECT * FROM t2 WHERE tok IN ('spark', 'dup', 'vector')),
dfreq AS (SELECT tok, count(DISTINCT doc_id) AS df_t FROM qt GROUP BY tok),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM qt GROUP BY doc_id, tok),
s AS (
  SELECT tf.doc_id,
         round(ln(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))
               * (tf * (1.2 + 1.0)
                  / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))), 6) AS ts
  FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (tok), stats
)
SELECT doc_id, round(CAST(sum(CAST(ts AS DECIMAL(28,6))) AS DOUBLE), 4) AS bm25
FROM s GROUP BY doc_id
ORDER BY bm25 DESC, doc_id ASC LIMIT 15
"""


def q_skew_profile(spark, sf):
    """Key-distribution profile for shuffle planning (operators/
    aggregates.py skew_profile): the 20 heaviest events.user_id keys with
    corpus fraction and mean-relative skew factor (the salting fan-out a
    skewed join on that key needs)."""
    from doc_quality_check_spark.operators.aggregates import skew_profile

    ev = t(spark, sf, "events")
    return skew_profile(ev, "user_id", top_n=20)


SQL_SKEW_PROFILE = """
WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
st AS (SELECT sum(n) AS total, count(*) AS n_keys FROM c)
SELECT user_id, n,
       round(n / total, 6) AS frac,
       CAST(ceil(n * n_keys / total) AS BIGINT) AS skew_factor
FROM c, st
ORDER BY n DESC, user_id ASC NULLS LAST
LIMIT 20
"""


def q_snapshot_diff(spark, sf):
    """Row-level snapshot delta (operators/joins.py snapshot_diff): two
    deterministic versions of orders (old drops key%11==3 rows; new drops
    key%7==2 rows and bumps o_totalprice on key%5==0), diffed by key with
    NULL-safe column compare -> added/removed/changed rows only."""
    from doc_quality_check_spark.operators.joins import snapshot_diff

    o = t(spark, sf, "orders")
    old = o.filter(F.col("o_orderkey") % 11 != 3)
    new = o.filter(F.col("o_orderkey") % 7 != 2).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + F.lit(1.0)
        ).otherwise(F.col("o_totalprice")),
    )
    return snapshot_diff(
        old, new, ["o_orderkey"], ["o_totalprice", "o_orderstatus"]
    )


SQL_SNAPSHOT_DIFF = """
WITH old AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 11 <> 3
),
new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS o_totalprice,
         o_orderstatus
  FROM orders WHERE o_orderkey % 7 <> 2
),
j AS (
  SELECT coalesce(old.o_orderkey, new.o_orderkey) AS o_orderkey,
         CASE WHEN old.o_orderkey IS NULL THEN 'added'
              WHEN new.o_orderkey IS NULL THEN 'removed'
              WHEN old.o_totalprice IS DISTINCT FROM new.o_totalprice
                OR old.o_orderstatus IS DISTINCT FROM new.o_orderstatus
              THEN 'changed'
         END AS change_type
  FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
)
SELECT o_orderkey, change_type FROM j WHERE change_type IS NOT NULL
"""


def q_weighted_sample(spark, sf):
    """Deterministic weighted sampling without replacement (operators/
    sampling.py weighted_sample, Efraimidis-Spirakis A-ES): 40 documents
    drawn with inclusion probability proportional to n_chars, reproducible
    from the content hash on both engines."""
    from doc_quality_check_spark.operators.sampling import weighted_sample

    d = t(spark, sf, "documents").select("doc_id", "n_chars")
    return weighted_sample(d, "doc_id", "n_chars", k=40)


SQL_WEIGHTED_SAMPLE = f"""
SELECT doc_id, n_chars FROM documents
WHERE n_chars IS NOT NULL AND n_chars > 0
ORDER BY -ln({_hash_unit_sql('doc_id', 'wsample')} + 5e-7)
           / CAST(n_chars AS DOUBLE) ASC,
         CAST(doc_id AS VARCHAR) ASC
LIMIT 40
"""


def q_zscore_outliers(spark, sf):
    """Per-group z-score outlier rows (operators/aggregates.py
    group_zscore_outliers): events whose value sits more than 3 sample
    standard deviations from their event_type's mean — the row-level
    drill-down behind a drift alarm. Moments accumulate as DECIMAL(28,6)
    so mean/stddev are partition-order independent."""
    from doc_quality_check_spark.operators.aggregates import (
        group_zscore_outliers,
    )

    ev = t(spark, sf, "events")
    return group_zscore_outliers(
        ev, "event_type", "event_id", "value", z_threshold=3.0
    )


SQL_ZSCORE_OUTLIERS = """
WITH s AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(CAST(round(value, 6) AS DECIMAL(28,6))) AS DOUBLE) AS s1,
         CAST(sum(CAST(round(value * value, 6) AS DECIMAL(28,6))) AS DOUBLE) AS s2
  FROM events WHERE value IS NOT NULL GROUP BY event_type
  HAVING count(*) > 1
),
st AS (
  SELECT event_type, s1 / n AS m, sqrt((s2 - s1 * s1 / n) / (n - 1)) AS sd
  FROM s
)
SELECT e.event_type, e.event_id, round(value, 4) AS value,
       round((value - m) / sd, 4) AS z
FROM events e JOIN (SELECT * FROM st WHERE sd > 0) st2 USING (event_type)
WHERE value IS NOT NULL AND abs((value - m) / sd) > 3.0
"""


QUERIES_EXT: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "boilerplate_lines": q_boilerplate_lines,
    "weighted_sample": q_weighted_sample,
    "zscore_outliers": q_zscore_outliers,
    "bm25_search": q_bm25_search,
    "skew_profile": q_skew_profile,
    "snapshot_diff": q_snapshot_diff,
    "text_clean": q_text_clean,
    "artifact_typology": q_artifact_typology,
    "lang_id": q_lang_id,
    "token_quality": q_token_quality,
    "doc_fingerprint": q_fingerprint,
    "marker_count": q_marker_count,
    "kv_extract": q_kv_extract,
    "kv_pairs": q_kv_pairs,
    "dedup_exact": q_dedup_exact,
    "dedup_jaccard": q_dedup_jaccard,
    "dedup_jaccard_prefix": q_dedup_jaccard_prefix,
    "dedup_clusters": q_dedup_clusters,
    "dedup_clusters_star": q_dedup_clusters_star,
    "dedup_keep_best": q_dedup_keep_best,
    "unigram_logprob": q_unigram_logprob,
    "hash_split": q_hash_split,
    "stratified_sample": q_stratified_sample,
    "group_capped_sample": q_group_capped_sample,
    "pack_token_bins": q_pack_token_bins,
    "upsample_groups": q_upsample_groups,
    "cluster_safe_split": q_cluster_safe_split,
    "contamination": q_contamination,
    "repetition": q_repetition,
    "pii_scrub": q_pii_scrub,
    "minhash_signatures": q_minhash_signatures,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "simhash_values": q_simhash_values,
    "dedup_simhash": q_dedup_simhash,
    "cosine_topk": q_cosine_topk,
    "ann_sign_lsh": q_ann_sign_lsh,
    "embedding_neardup": q_embedding_neardup,
    "ivf_topk": q_ivf_topk,
    "bpe_tokens": q_bpe_tokens,
    "type_classification": q_type_classification,
    "margin_classification": q_margin_classification,
    "confidence_formula": q_confidence_formula,
    "freq_boost": q_freq_boost,
    "priority_reclass": q_priority_reclass,
    "sessionize": q_sessionize,
    "asof_join": q_asof_join,
    "range_join": q_range_join,
    "running_total": q_running_total,
    "token_budget": q_token_budget,
    "iou_dedupe": q_iou_dedupe,
    "audio_neardup": q_audio_neardup,
    "image_decode_metrics": q_image_decode_metrics,
    "video_frame_metrics": q_video_frame_metrics,
    "audio_decode_metrics": q_audio_decode_metrics,
    "column_corr": q_column_corr,
    "heavy_hitters": q_heavy_hitters,
    "heavy_hitters_cms": q_heavy_hitters_cms,
    "self_drift": q_self_drift,
    "moving_avg": q_moving_avg,
    "cumulative_share": q_cumulative_share,
    "keyword_freq": q_keyword_freq,
    "chunk_fanout": q_chunk_fanout,
    "pair_repair": q_pair_repair,
    "completeness_profile": q_completeness_profile,
    "column_entropy": q_column_entropy,
}

ORACLES_EXT: dict[str, str] = {
    "boilerplate_lines": SQL_BOILERPLATE_LINES,
    "weighted_sample": SQL_WEIGHTED_SAMPLE,
    "zscore_outliers": SQL_ZSCORE_OUTLIERS,
    "bm25_search": SQL_BM25_SEARCH,
    "skew_profile": SQL_SKEW_PROFILE,
    "snapshot_diff": SQL_SNAPSHOT_DIFF,
    "image_decode_metrics": SQL_IMAGE_DECODE_METRICS,
    "video_frame_metrics": SQL_VIDEO_FRAME_METRICS,
    "audio_decode_metrics": SQL_AUDIO_DECODE_METRICS,
    "column_corr": SQL_COLUMN_CORR,
    "text_clean": SQL_TEXT_CLEAN,
    "artifact_typology": _artifact_sql(),
    "lang_id": _lang_sql(),
    "token_quality": SQL_TOKEN_QUALITY,
    "doc_fingerprint": SQL_FINGERPRINT,
    "marker_count": SQL_MARKER,
    "kv_extract": SQL_KV,
    "kv_pairs": SQL_KV_PAIRS,
    "dedup_exact": SQL_DEDUP_EXACT,
    "dedup_jaccard": SQL_DEDUP_JACCARD,
    "dedup_jaccard_prefix": SQL_DEDUP_JACCARD,
    "dedup_clusters": _dedup_clusters_sql(),
    "dedup_clusters_star": _dedup_clusters_sql(),
    "dedup_keep_best": _dedup_keep_best_sql(),
    "unigram_logprob": SQL_UNIGRAM_LOGPROB,
    "hash_split": SQL_HASH_SPLIT,
    "stratified_sample": SQL_STRATIFIED_SAMPLE,
    "group_capped_sample": SQL_GROUP_CAPPED_SAMPLE,
    "pack_token_bins": SQL_PACK_TOKEN_BINS,
    "upsample_groups": SQL_UPSAMPLE_GROUPS,
    "cluster_safe_split": _cluster_split_sql(),
    "contamination": _contamination_sql(),
    "repetition": SQL_REPETITION,
    "pii_scrub": _pii_sql(),
    "minhash_signatures": SQL_MINHASH_SIG,
    "dedup_minhash_lsh": _minhash_lsh_sql(),
    "simhash_values": SQL_SIMHASH_VALUES,
    "dedup_simhash": SQL_DEDUP_SIMHASH,
    "cosine_topk": SQL_COSINE_TOPK,
    "ann_sign_lsh": SQL_ANN_SIGN_LSH,
    "embedding_neardup": SQL_EMBEDDING_NEARDUP,
    "ivf_topk": SQL_IVF_TOPK,
    "bpe_tokens": SQL_BPE_TOKENS,
    "type_classification": _type_sql(),
    "margin_classification": _margin_sql(),
    "confidence_formula": _confidence_sql(),
    "freq_boost": SQL_FREQ_BOOST,
    "priority_reclass": _reclass_sql(),
    "sessionize": SQL_SESSIONIZE,
    "asof_join": SQL_ASOF_JOIN,
    "range_join": SQL_RANGE_JOIN,
    "running_total": SQL_RUNNING_TOTAL,
    "token_budget": SQL_TOKEN_BUDGET,
    "heavy_hitters": SQL_HEAVY_HITTERS,
    "heavy_hitters_cms": _cms_sql(),
    "self_drift": SQL_SELF_DRIFT,
    "moving_avg": SQL_MOVING_AVG,
    "cumulative_share": SQL_CUM_SHARE,
    "keyword_freq": SQL_KEYWORD_FREQ,
    "chunk_fanout": SQL_CHUNK_FANOUT,
    "pair_repair": SQL_PAIR_REPAIR,
    "completeness_profile": SQL_COMPLETENESS_PROFILE,
    "column_entropy": SQL_COLUMN_ENTROPY,
}
