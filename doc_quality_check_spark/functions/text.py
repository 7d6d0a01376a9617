"""Text-analysis function surface: cleaning, artifact filtering, language ID,
token statistics, quality scoring, fingerprinting, key/value extraction.

Reference parity (SURVEY.md §2.3) — all pure Catalyst expressions
(whole-stage codegen, no Python in the hot path):

- F11 text cleaning chain (/root/reference/utils/text_cleaner.py:8-51):
  strip null/control chars, collapse `?`/`•` runs, collapse whitespace, trim.
- F12/F14 artifact scrubbing + typology (/root/reference/utils/
  text_filter.py:60-84, 154-191): regex library for file-paths / URLs /
  timestamps; which classes are present.
- F15 language detection (/root/reference/utils/document_processor.py:39-89):
  per-language keyword-catalog hit counts, argmax with default fallback.
- F16 key/value extraction (/root/reference/utils/content_extraction.py:150-189).
- F17 marker counting (MRZ `<` counting, /root/reference/modules/
  identity_detection.py:137-138,157).
- F18 text length / word count (identity_detection.py:500-501).
- plus the training-pipeline additions: token counting, quality scoring
  (length/punct/stopword ratios), polynomial document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# The cleaning chain — ordered (regex, replacement) pairs, applied in
# sequence exactly like the reference's chained re.sub calls
# (text_cleaner.py:13-42). Patterns kept to the RE2-compatible subset so the
# DuckDB oracle evaluates them identically.
CLEANING_CHAIN: list[tuple[str, str]] = [
    (r"\x00", ""),                  # null bytes
    (r"[\x01-\x08\x0b\x0c\x0e-\x1f]", ""),  # control chars (keep \t\n\r)
    (r"\?{4,}", " "),               # long ?-runs (OCR noise analog)
    (r"[ \t]+", " "),               # collapse spaces/tabs
    (r" ?\n ?", "\n"),              # trim around newlines
    (r"\n{3,}", "\n\n"),            # collapse blank-line runs
]

# Artifact class library (text_filter.py:18-57 analog) — label → pattern.
ARTIFACT_PATTERNS: dict[str, str] = {
    "url": r"https?://[^ ]+",
    "file_path": r"file:///[^ ]+",
    "timestamp": r"[0-9]{2}/[0-9]{2}/[0-9]{4} [0-9]{1,2}:[0-9]{2}",
}

FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_BASE = 131


def clean_text(col: str | Column) -> Column:
    """The F11 chain as nested regexp_replace — one codegen'd expression."""
    out = F.col(col) if isinstance(col, str) else col
    for pat, rep in CLEANING_CHAIN:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(out)


def _pattern_flags(col: str, patterns: dict[str, str]) -> list[Column]:
    """One boolean ``has_<label>`` column per pattern class — shared by the
    artifact (F12-F14) and PII passes."""
    return [
        F.col(col).rlike(pat).alias(f"has_{label}")
        for label, pat in patterns.items()
    ]


def _pattern_scrub(col: str | Column, pairs) -> Column:
    """Chained regexp_replace over (pattern, replacement) pairs, in order —
    one codegen'd expression; shared by the artifact and PII scrubs."""
    out = F.col(col) if isinstance(col, str) else col
    for pat, repl in pairs:
        out = F.regexp_replace(out, pat, repl)
    return out


def artifact_flags(col: str) -> list[Column]:
    """One boolean column per artifact class."""
    return _pattern_flags(col, ARTIFACT_PATTERNS)


def artifact_types(col: str) -> Column:
    """Sorted comma-joined list of artifact classes present (F14) — a scalar
    so result rows stay hashable by the oracle compare."""
    parts = [
        F.when(F.col(col).rlike(pat), F.lit(label))
        for label, pat in sorted(ARTIFACT_PATTERNS.items())
    ]
    return F.array_join(F.array_compact(F.array(*parts)), ",")


def scrub_artifacts(col: str | Column) -> Column:
    """F12: remove every artifact occurrence (chained regexp_replace)."""
    return _pattern_scrub(col, ((p, " ") for p in ARTIFACT_PATTERNS.values()))


def token_count(col: str) -> Column:
    """Whitespace token count; 0 for empty/null-ish strings."""
    return F.when(
        F.length(F.trim(F.col(col))) == 0, F.lit(0)
    ).otherwise(F.size(F.split(F.trim(F.col(col)), r"\s+"))).alias("n_tokens")


# escape-free character classes: Spark SQL string literals consume backslash
# escapes ('\s' -> 's') while DuckDB passes them through — a pattern with no
# backslashes evaluates identically when embedded in either engine's SQL
BPE_ISH_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def bpe_ish_token_count(col: str) -> Column:
    """Sub-word-style token count: alphabetic runs, digit runs, and each
    punctuation mark count separately (the BPE-pretokenizer shape used for
    LLM training-data budgeting), via one regexp_extract_all."""
    return F.size(F.expr(f"regexp_extract_all({col}, '{BPE_ISH_PATTERN}', 0)"))


def marker_count(col: str, marker: str) -> Column:
    """Occurrences of a literal marker char/substring (F17: `<` counting) via
    length difference — no regex engine in the loop."""
    return (
        (F.length(F.col(col)) - F.length(F.replace(F.col(col), F.lit(marker), F.lit(""))))
        / len(marker)
    ).cast("int")


def language_scores(col: str, catalogs: dict[str, list[str]]) -> list[Column]:
    """Per-language distinct-keyword hit counts over the token set (F15)."""
    toks = F.array_distinct(F.split(F.lower(F.col(col)), r"\s+"))
    return [
        F.size(F.array_intersect(toks, F.array(*[F.lit(k) for k in kws]))).alias(f"score_{lang}")
        for lang, kws in catalogs.items()
    ]


def language_argmax(catalogs: dict[str, list[str]], default: str = "unknown") -> Column:
    """Argmax over score_<lang> columns with deterministic tie-break (first
    catalog in sorted order wins) and default when all scores are 0."""
    langs = sorted(catalogs)
    best: Column = F.lit(default)
    best_score: Column = F.lit(0)
    # iterate reversed so earlier (sorted-first) languages win ties via >
    for lang in reversed(langs):
        s = F.col(f"score_{lang}")
        take = s >= best_score
        # strictly-greater for languages later in sort order is enforced by
        # processing order: later langs only displace on strict >
        best = F.when((s > 0) & take, F.lit(lang)).otherwise(best)
        best_score = F.when((s > 0) & take, s).otherwise(best_score)
    return best


def fingerprint(col: str) -> Column:
    """Order-sensitive polynomial document fingerprint over token hashes:
    h = fold(tokens, 0, (acc, t) -> (acc*BASE + H(t)) mod M). Equal token
    sequences → equal fingerprints; cheap 8-byte dedupe/bucketing key."""
    toks = f"split({col}, ' ')"
    h = "CAST(conv(substr(md5(t), 1, 8), 16, 10) AS BIGINT)"
    return F.expr(
        f"aggregate(transform({toks}, t -> {h}), CAST(0 AS BIGINT), "
        f"(acc, x) -> (acc * {FINGERPRINT_BASE} + x) % {FINGERPRINT_MOD})"
    )


def quality_features(col: str) -> list[Column]:
    """Quality-scoring raw features: char count, token count, alpha ratio,
    punct ratio, stopword ratio, mean token length."""
    c = F.col(col)
    n_chars = F.length(c)
    n_alpha = F.length(F.regexp_replace(c, r"[^a-zA-Z]", ""))
    n_punct = F.length(F.regexp_replace(c, r"[^.,;:!?]", ""))
    toks = F.split(F.trim(c), r"\s+")
    n_toks = token_count(col)
    stop = F.size(
        F.filter(toks, lambda t: t.isin("the", "a", "and", "of", "to"))
    )
    return [
        n_chars.alias("n_chars2"),
        n_toks.alias("n_tokens"),
        F.round(F.try_divide(n_alpha, n_chars), 4).alias("alpha_ratio"),
        F.round(F.try_divide(n_punct, n_chars), 4).alias("punct_ratio"),
        F.round(F.try_divide(stop, n_toks), 4).alias("stopword_ratio"),
        F.round(F.try_divide(n_chars - n_toks + 1, n_toks), 4).alias("mean_token_len"),
    ]


def quality_score() -> Column:
    """Composite quality score in [0,100] from the quality_features columns —
    the clamp-to-[0,100] arithmetic of the reference's confidence formula
    (/root/reference/modules/identity_detection.py:652-698: base + bonuses −
    penalties, clamped). Reads the feature columns by name."""
    base = F.least(F.col("n_tokens").cast("double") * 1.5, F.lit(40.0))
    alpha_bonus = F.when(F.col("alpha_ratio") >= 0.7, F.lit(25.0)).otherwise(F.lit(0.0))
    stop_bonus = F.when(
        (F.col("stopword_ratio") >= 0.02) & (F.col("stopword_ratio") <= 0.3), F.lit(20.0)
    ).otherwise(F.lit(0.0))
    len_penalty = F.when(F.col("n_tokens") < 5, F.lit(-30.0)).otherwise(F.lit(0.0))
    punct_penalty = F.when(F.col("punct_ratio") > 0.2, F.lit(-15.0)).otherwise(F.lit(0.0))
    raw = base + alpha_bonus + stop_bonus + len_penalty + punct_penalty
    return F.round(F.least(F.lit(100.0), F.greatest(F.lit(0.0), raw)), 4)


_KV_COLON = r"^\s*([^:]+):\s*(.+)$"
_KV_DASH = r"^\s*([^-\n]+)-\s*(.+)$"


def _pystrip(c: Column) -> Column:
    """Python ``str.strip()`` analog — trims ALL whitespace from both ends
    (F.trim removes spaces only)."""
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def kv_entries(col) -> Column:
    """F16: full key/value extraction from semi-structured text, pure
    Catalyst (no UDF). Per line, ``Key: Value`` is tried first, then
    ``Key - Value``; when NO line of the document matches either pattern,
    every non-empty line falls back to ``(line_<N>, stripped line)`` with N
    the 1-based original line number — the exact semantics of the
    reference's extract_json_keys (utils/content_extraction.py:150-189).

    Returns ``array<struct<idx:int, key:string, value:string>>``; ``idx``
    preserves line order so duplicate keys can resolve last-wins downstream.
    """
    c = F.col(col) if isinstance(col, str) else col
    lines = F.split(c, "\n")

    def _match(ln, i):
        ck = F.regexp_extract(ln, _KV_COLON, 1)
        dk = F.regexp_extract(ln, _KV_DASH, 1)
        key = (
            F.when(ck != "", _pystrip(ck))
            .when(dk != "", _pystrip(dk))
        )
        value = (
            F.when(ck != "", _pystrip(F.regexp_extract(ln, _KV_COLON, 2)))
            .when(dk != "", _pystrip(F.regexp_extract(ln, _KV_DASH, 2)))
        )
        return F.struct(
            (i + 1).cast("int").alias("idx"), key.alias("key"), value.alias("value")
        )

    matched = F.filter(
        F.transform(lines, _match), lambda e: e["key"].isNotNull()
    )
    fallback = F.filter(
        F.transform(lines, lambda ln, i: F.struct(
            (i + 1).cast("int").alias("idx"),
            F.concat(F.lit("line_"), (i + 1).cast("string")).alias("key"),
            _pystrip(ln).alias("value"),
        )),
        lambda e: e["value"] != "",
    )
    empty = F.array().cast("array<struct<idx:int,key:string,value:string>>")
    return (
        F.when(F.size(matched) > 0, matched)
        .when(_pystrip(c) != "", fallback)
        .otherwise(empty)
    )


def extract_kv_map(col) -> Column:
    """F16 map form: ``map<string,string>`` of the kv_entries, duplicate
    keys resolved LAST-wins (the reference's dict-assignment semantics)."""
    e = kv_entries(col)
    dedup = F.filter(
        e,
        lambda x: ~F.exists(
            e, lambda y: (y["key"] == x["key"]) & (y["idx"] > x["idx"])
        ),
    )
    return F.map_from_entries(
        F.transform(dedup, lambda x: F.struct(x["key"], x["value"]))
    )


def extract_kv_int(col: str, key: str) -> Column:
    """F16 analog: pull an integer value for ``key`` out of a semi-structured
    string column via one regexp_extract (no JSON parser dependency).
    No-match → empty string → null (never an ANSI cast error)."""
    ex = F.regexp_extract(F.col(col), f'"{key}":\\s*([0-9]+)', 1)
    return F.when(ex == "", F.lit(None)).otherwise(ex).cast("int")


def repetition_ratio(col: str, n: int = 3) -> Column:
    """Intra-document repetition: 1 − distinct/total word n-grams ∈ [0,1]
    (0 when the text has fewer than n tokens). The duplicate-n-gram quality
    filter from published LLM data-curation pipelines (Gopher-style
    repetition heuristics) — boilerplate and looping generations score high.
    Pure Catalyst: one split + one transform, no shuffle. Gram semantics are
    shared with the dedup/contamination shingle universe via
    operators.dedup.word_grams_expr (distinct=False keeps positional
    duplicates)."""
    from doc_quality_check_spark.operators.dedup import word_grams_expr

    grams = word_grams_expr(col, n, distinct=False)
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    return F.round(
        F.when(total > 0, 1.0 - F.try_divide(distinct, total)).otherwise(F.lit(0.0)),
        4,
    )


# PII patterns — RE2-compatible, bracket classes only (no backslash classes)
# so the DuckDB oracle embeds the IDENTICAL pattern string with no escape
# divergence between engines.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}", "[EMAIL]"),
    "phone": (r"[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}", "[PHONE]"),
    "ipv4": (r"([0-9]{1,3}[.]){3}[0-9]{1,3}", "[IP]"),
}


def pii_flags(col: str) -> list[Column]:
    """One boolean ``has_<class>`` column per PII class — the detection side
    of the standard pre-training PII pass."""
    return _pattern_flags(col, {k: pat for k, (pat, _) in PII_PATTERNS.items()})


def scrub_pii(col: str | Column) -> Column:
    """Replace every PII occurrence with its class placeholder
    ([EMAIL]/[PHONE]/[IP]) — PII_PATTERNS insertion order (emails first so
    an address is never half-eaten by the broader patterns); the DuckDB
    oracle nests its replaces in the SAME iteration order."""
    return _pattern_scrub(col, PII_PATTERNS.values())
