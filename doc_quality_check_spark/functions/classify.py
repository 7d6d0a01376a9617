"""Classification / scoring expression trees (SURVEY.md §2.9).

Reference parity — the identity-classification engine re-expressed as
Catalyst expressions over a keyword-catalog spec:

- C1 feature extraction (/root/reference/modules/identity_detection.py:486-524):
  per-row struct of metric + catalog-match features → plain columns here.
- C2 type classification (identity_detection.py:535-579): score per type =
  2×primary-catalog hits + 1×secondary hits + 3×feature flag; argmax;
  'unknown' when every score is 0.
- C3 margin rule (identity_detection.py:581-650): >10% score-margin decides,
  else deterministic default; conditional 1.5× multiplier when a quality
  metric sits in a mid-band (:597-615).
- C4 confidence formula (identity_detection.py:652-698): weighted base +
  keyword bonuses + banded bonus/penalty, clamped to [0,100]
  (least/greatest).
- C5 frequency boost (identity_detection.py:329-451): cross-row frequency
  aggregate broadcast-joined back, tiered boost × quality factor, capped.

All catalogs/weights are parameters (the reference's config.json discipline:
no hardcoded values, README.md:209-211).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def catalog_hits(text_col: str, keywords: list[str]) -> Column:
    """Distinct-token hit count against a keyword catalog (F19/J1 membership
    as an expression; large catalogs graduate to the broadcast-semi-join in
    operators/joins.py)."""
    toks = F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))
    return F.size(F.array_intersect(toks, F.array(*[F.lit(k.lower()) for k in keywords])))


def type_scores(
    text_col: str,
    catalogs: dict[str, dict[str, list[str]]],
    flag_col: str | None = None,
    primary_weight: int = 2,
    secondary_weight: int = 1,
    flag_weight: int = 3,
) -> list[Column]:
    """C2 scoring: per type, primary_weight×primary-hits +
    secondary_weight×secondary-hits + flag_weight×flag."""
    cols = []
    for typ, cats in catalogs.items():
        s = catalog_hits(text_col, cats.get("primary", [])) * primary_weight
        s = s + catalog_hits(text_col, cats.get("secondary", [])) * secondary_weight
        if flag_col is not None:
            s = s + F.when(F.col(flag_col), flag_weight).otherwise(0)
        cols.append(s.alias(f"score_{typ}"))
    return cols


def argmax_type(types: list[str], default: str = "unknown") -> Column:
    """Argmax over score_<type> columns; ties → first type in sorted order;
    all-zero → default (identity_detection.py:570-577 'unknown if 0')."""
    ordered = sorted(types)
    best: Column = F.lit(default)
    best_score: Column = F.lit(0)
    for t in reversed(ordered):
        s = F.col(f"score_{t}")
        take = (s > 0) & (s >= best_score)
        best = F.when(take, F.lit(t)).otherwise(best)
        best_score = F.when(take, s).otherwise(best_score)
    return best


def margin_classify(
    score_a: Column,
    score_b: Column,
    label_a: str,
    label_b: str,
    margin_pct: float = 10.0,
    default: str = "ambiguous",
) -> Column:
    """C3: the winner must lead by > margin_pct% of the larger score;
    otherwise the deterministic default."""
    margin = F.abs(score_a - score_b) / F.greatest(F.greatest(score_a, score_b), F.lit(1)) * 100
    return (
        F.when((score_a + score_b) == 0, F.lit(default))
        .when(margin <= F.lit(margin_pct), F.lit(default))
        .when(score_a > score_b, F.lit(label_a))
        .otherwise(F.lit(label_b))
    )


def clamp(col: Column, lo: float = 0.0, hi: float = 100.0) -> Column:
    """The reference's confidence clamp (identity_detection.py:696)."""
    return F.least(F.lit(hi), F.greatest(F.lit(lo), col))


def classification_confidence(
    metric_col: str,
    has_type_kw: Column,
    n_side_kw: Column,
    band_col: str,
    band_lo: float,
    band_hi: float,
    length_col: str,
    min_length: int,
) -> Column:
    """C4: 0.3×metric + 30 if type keyword + 25 per side keyword + in-band
    bonus (+15) / out-of-band penalty (−20/−10) + length bonus (+10) or
    penalty (−30), clamped [0,100] — the exact arithmetic shape of
    identity_detection.py:652-698."""
    base = F.col(metric_col) * 0.3
    kw_bonus = F.when(has_type_kw, F.lit(30.0)).otherwise(F.lit(0.0))
    side_bonus = F.least(n_side_kw.cast("double") * 25.0, F.lit(50.0))
    band = F.col(band_col)
    band_term = (
        F.when((band >= band_lo) & (band <= band_hi), F.lit(15.0))
        .when(band < band_lo, F.lit(-20.0))
        .otherwise(F.lit(-10.0))
    )
    len_term = F.when(F.col(length_col) >= min_length, F.lit(10.0)).otherwise(F.lit(-30.0))
    return clamp(base + kw_bonus + side_bonus + band_term + len_term)


def content_analysis(
    text_col: str,
    back_keywords: list[str],
    front_keywords: list[str],
    marker: str = "<",
    marker_min: int = 5,
) -> Column:
    """C6: the content-analysis feature struct of the reference's
    analyze_document_content (identity_detection.py:132-160): marker (MRZ)
    occurrence count, per-catalog substring-hit scores, and the has_* flags.
    Substring containment (not token match) mirrors ``kw in text_lower``."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    low = F.lower(c)
    mlen = len(marker)
    mrz_score = (
        (F.length(c) - F.length(F.replace(c, F.lit(marker), F.lit("")))) / mlen
    ).cast("int")

    def _score(keywords: list[str]) -> Column:
        s: Column = F.lit(0)
        for k in keywords:
            s = s + F.when(low.contains(k.lower()), 1).otherwise(0)
        return s

    back_score = _score(back_keywords)
    front_score = _score(front_keywords)
    return F.struct(
        (mrz_score >= marker_min).alias("has_mrz"),
        (back_score > 0).alias("has_back_keywords"),
        (front_score > 0).alias("has_front_keywords"),
        mrz_score.alias("mrz_score"),
        back_score.alias("back_score"),
        front_score.alias("front_score"),
    )


def priority_reclassify(
    text_col: str,
    back_keywords: list[str],
    front_keywords: list[str],
    marker: str = "<",
    marker_min: int = 5,
    short_len: int = 200,
    label_back: str = "back",
    label_front: str = "front",
) -> Column:
    """C7: the reference's ordered priority-rule chain with a recorded
    detection method (identity_detection.py:162-187): MRZ marker beats
    back-keywords beats front-keywords beats the text-length tie-break.
    Returns ``struct<label:string, detection_method:string>`` — both NULL
    when no rule fires (the reference leaves the classification unchanged),
    so callers can coalesce onto a prior label while auditing *why* each row
    was (re)classified."""
    a = content_analysis(text_col, back_keywords, front_keywords, marker, marker_min)
    c = F.coalesce(F.col(text_col), F.lit(""))
    short = F.length(c) < short_len
    label = (
        F.when(a["has_mrz"], F.lit(label_back))
        .when(a["has_back_keywords"] & (a["back_score"] >= a["front_score"]), F.lit(label_back))
        .when(a["has_front_keywords"] & (a["front_score"] > a["back_score"]), F.lit(label_front))
        .when(a["has_front_keywords"] & short, F.lit(label_front))
        .when(a["has_front_keywords"], F.lit(label_back))
        .otherwise(F.lit(None).cast("string"))
    )
    method = (
        F.when(a["has_mrz"], F.lit("mrz_pattern"))
        .when(a["has_back_keywords"] & (a["back_score"] >= a["front_score"]), F.lit("back_keywords"))
        .when(a["has_front_keywords"] & (a["front_score"] > a["back_score"]), F.lit("front_keywords"))
        .when(a["has_front_keywords"] & short, F.lit("front_keywords_priority"))
        .when(a["has_front_keywords"], F.lit("back_keywords_priority"))
        .otherwise(F.lit(None).cast("string"))
    )
    return F.struct(label.alias("label"), method.alias("detection_method"))


def frequency_boost(
    df: DataFrame,
    label_col: str,
    conf_col: str,
    quality_col: str,
    tiers: list[tuple[int, float]] = ((15, 15.0), (10, 10.0), (5, 5.0)),
) -> DataFrame:
    """C5/J2: aggregate per-label frequency across ALL rows, broadcast-join
    back, boost = tier(count) × quality_factor(quality), final confidence
    capped at 100. Adds columns label_freq, boost, boosted_conf."""
    freq = df.groupBy(label_col).agg(F.count("*").alias("label_freq"))
    out = df.join(F.broadcast(freq), label_col, "left")
    tier_expr: Column = F.lit(0.0)
    for threshold, bonus in sorted(tiers):  # ascending → highest tier wins last
        tier_expr = F.when(F.col("label_freq") >= threshold, F.lit(bonus)).otherwise(tier_expr)
    q = F.col(quality_col)
    quality_factor = (
        F.when(q < 30, F.lit(0.5)).when(q < 50, F.lit(0.75)).otherwise(F.lit(1.0))
    )
    out = out.withColumn("boost", F.round(tier_expr * quality_factor, 4))
    return out.withColumn(
        "boosted_conf", F.round(clamp(F.col(conf_col) + F.col("boost")), 4)
    )
