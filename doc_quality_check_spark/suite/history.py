"""Metric history + anomaly detection across runs.

Drift checks (operators/aggregates.py drift_psi/drift_ks) compare against a
single curated baseline SNAPSHOT; a continuously-validated table also wants
the TEMPORAL view: "is this run's pass rate / row count / quantile metric
an outlier against the trail of previous runs?" — the validation-engine
pattern popularized by Deequ's anomaly detection on metric repositories.

The metric repository already exists: every run's manifest
(suite/manifest.py) records per-(partition, constraint) n_rows,
n_violations, passed, and metric_value. This module reads that trail and
flags the newest run's metrics that sit outside k·stddev (or a relative
band) of the history — pure driver-side arithmetic over a handful of JSON
files; no Spark jobs (manifests are small by construction: one row per
partition × constraint).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from doc_quality_check_spark.suite.manifest import ManifestStore

GLOBAL_PART = "__global__"


def metric_history(
    store: ManifestStore,
    constraint_id: str,
    part_key: str = GLOBAL_PART,
    metric: str = "metric_value",
) -> list[tuple[int, float]]:
    """(run_id, value) trail for one (partition, constraint) metric, oldest
    first, skipping runs where the metric is absent/None (e.g. the
    constraint was added later — histories survive suite evolution)."""
    out: list[tuple[int, float]] = []
    for path in store._paths():
        import json

        with open(path) as f:
            m = json.load(f)
        checks = m.get("partitions", {}).get(part_key, {}).get("checks", {})
        v = checks.get(constraint_id, {}).get(metric)
        if v is not None:
            out.append((int(m["run_id"]), float(v)))
    return sorted(out)


@dataclass
class AnomalyVerdict:
    constraint_id: str
    part_key: str
    value: float          # latest run's metric
    mean: float           # history mean (excluding latest)
    stddev: float
    n_history: int
    is_anomaly: bool
    reason: str


def detect_anomaly(
    store: ManifestStore,
    constraint_id: str,
    part_key: str = GLOBAL_PART,
    metric: str = "metric_value",
    k: float = 3.0,
    min_history: int = 3,
    max_relative_change: float | None = None,
) -> AnomalyVerdict:
    """Flag the LATEST run's metric against the prior trail.

    Two detectors (either firing flags the verdict):
    - stddev band: |value - mean(history)| > k · stddev(history); a
      zero-variance history uses an absolute epsilon, so a constant metric
      that suddenly moves at all is flagged;
    - relative band (optional): |value/mean - 1| > max_relative_change.

    Fewer than ``min_history`` prior points → never an anomaly (the trail
    is still forming); callers gate alerting on n_history."""
    trail = metric_history(store, constraint_id, part_key, metric)
    if len(trail) < min_history + 1:
        v = trail[-1][1] if trail else float("nan")
        return AnomalyVerdict(constraint_id, part_key, v, float("nan"),
                              float("nan"), max(len(trail) - 1, 0), False,
                              "insufficient history")
    *prior, (_, value) = trail
    vals = [v for _, v in prior]
    mean = sum(vals) / len(vals)
    var = sum((v - mean) ** 2 for v in vals) / len(vals)
    std = math.sqrt(var)
    band = k * std if std > 0 else max(1e-9, abs(mean) * 1e-9)
    fired = abs(value - mean) > band
    reason = f"|{value} - mean {round(mean, 6)}| > {k}·σ ({round(std, 6)})" \
        if fired else "within stddev band"
    if not fired and max_relative_change is not None and mean != 0:
        rel = abs(value / mean - 1.0)
        if rel > max_relative_change:
            fired = True
            reason = f"relative change {round(rel, 4)} > {max_relative_change}"
    return AnomalyVerdict(constraint_id, part_key, value, mean, std,
                          len(prior), fired, reason)
