"""Single-pass data-quality audit — Deequ-style expectation checks.

A training-data (or analytics) pipeline gates every ingest batch on a
constraint report: null rates, value ranges, key uniqueness, set
membership, row count. The naive formulation runs one job per check;
this operator compiles ALL checks into ONE aggregation pass (every
constraint is an algebraic aggregate — the insight behind AWS Deequ's
analyzer batching), so a 100-constraint audit of a 100 TB batch costs
exactly one corpus scan with map-side partial aggregation and a
one-row result.

Check types (constructors below):

- ``not_null(col, max_null_frac)`` — null-rate ceiling;
- ``in_range(col, lo, hi)`` — min/max bounds on a numeric column;
- ``unique(col)`` — key uniqueness (count == approx-free exact
  count(distinct) — the one check that is NOT map-side-only; it adds
  the standard distinct expansion to the single pass);
- ``in_set(col, values)`` — categorical domain;
- ``matches(col, regex, min_frac)`` — format conformance floor;
- ``row_count(lo, hi)`` — batch-size sanity bounds.

Output: one row per check — ``(check STRING, column STRING, metric
DOUBLE, threshold DOUBLE, passed BOOLEAN)`` — plus
:func:`audit_passed` for the gate decision. Deterministic; no
sampling.

Reference analog: none (the reference trusts GDC); this serves the
pipeline-hygiene surface a production ingest needs (the reference's
low-count gene filter A1 is itself a domain-specific quality gate).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    name: str
    column: str
    #: aggregate expression producing the metric (a DOUBLE)
    metric: Column
    threshold: float
    #: metric comparator: True = pass when metric <= threshold,
    #: False = pass when metric >= threshold
    at_most: bool


def not_null(col: str, max_null_frac: float = 0.0) -> Check:
    return Check(
        "not_null",
        col,
        F.avg(F.col(col).isNull().cast("double")),
        float(max_null_frac),
        at_most=True,
    )


def in_range(col: str, lo: float, hi: float) -> tuple[Check, Check]:
    """Two checks: observed min >= lo and observed max <= hi (nulls
    ignored, as in SQL aggregates — combine with not_null to forbid)."""
    return (
        Check(
            "min_at_least", col,
            F.min(F.col(col)).cast("double"), float(lo), at_most=False,
        ),
        Check(
            "max_at_most", col,
            F.max(F.col(col)).cast("double"), float(hi), at_most=True,
        ),
    )


def unique(col: str) -> Check:
    """Duplicate fraction over NON-NULL keys = 1 - distinct/count(col);
    passes at 0. Nulls are not counted as duplicates — that failure
    mode belongs to ``not_null`` (pair the two), so the audit log names
    the actual defect instead of mislabeling nullability as key
    collision. ``try_divide`` keeps an all-null or EMPTY batch from
    throwing under ANSI: the metric goes NULL, which the fail-closed
    verdict logic turns into a failure."""
    dup_frac = F.lit(1.0) - F.try_divide(
        F.countDistinct(F.col(col)).cast("double"),
        F.count(F.col(col)).cast("double"),
    )
    return Check("unique", col, dup_frac, 0.0, at_most=True)


def in_set(col: str, values: Sequence[str], min_frac: float = 1.0) -> Check:
    # NULL counts as NON-member (coalesce): isin(NULL) is NULL and avg
    # would silently skip it — a domain check that ignores null rows
    # understates violations
    member = F.coalesce(
        F.col(col).isin(list(values)), F.lit(False)
    ).cast("double")
    return Check(
        "in_set", col, F.avg(member), float(min_frac), at_most=False
    )


def matches(col: str, pattern: str, min_frac: float = 1.0) -> Check:
    # NULL counts as non-conforming (same rationale as in_set)
    ok = F.coalesce(F.col(col).rlike(pattern), F.lit(False)).cast("double")
    return Check(
        "matches", col, F.avg(ok), float(min_frac), at_most=False
    )


def row_count(lo: int, hi: int | None = None) -> tuple[Check, ...]:
    checks = (
        Check(
            "row_count_at_least", "*",
            F.count(F.lit(1)).cast("double"), float(lo), at_most=False,
        ),
    )
    if hi is not None:
        checks += (
            Check(
                "row_count_at_most", "*",
                F.count(F.lit(1)).cast("double"), float(hi), at_most=True,
            ),
        )
    return checks


def _flatten(checks) -> list[Check]:
    out: list[Check] = []
    for c in checks:
        if isinstance(c, Check):
            out.append(c)
        else:
            out.extend(c)
    return out


def audit(df: DataFrame, checks) -> DataFrame:
    """Run every check in ONE aggregation job; returns one row per
    check: ``(check, column, metric, threshold, passed)``.

    All metrics are aggregate expressions over the same scan, so Spark
    executes a single (mostly map-side) pass however many checks are
    registered; only ``unique``'s count-distinct adds shuffle weight.
    Verdicts compare the RAW metric against the threshold — rounding
    happens only in the reported ``metric`` column, because rounding
    before comparison fails OPEN at scale (one null row in 4M rounds a
    2.5e-7 null fraction to 0.0 and passes a zero-tolerance check;
    at the batch sizes this module targets that is hundreds of
    thousands of silent violations).
    """
    flat = _flatten(checks)
    if not flat:
        raise ValueError("audit: no checks given")
    aggs = [c.metric.alias(f"_m{i}") for i, c in enumerate(flat)]
    row = df.agg(*aggs)
    # one-row frame -> one row per check via an inline struct explode;
    # stays a DataFrame (composable into gate queries / sinks)
    structs = F.array(
        *[
            F.struct(
                F.lit(c.name).alias("check"),
                F.lit(c.column).alias("column"),
                F.round(F.col(f"_m{i}"), 6).alias("metric"),
                F.lit(c.threshold).alias("threshold"),
                # NULL metric (all-null column, empty batch) must FAIL
                # the check, not vanish from the gate: a NULL
                # comparison would make audit_passed() silently
                # approve an empty ingest
                F.coalesce(
                    (
                        (F.col(f"_m{i}") <= F.lit(c.threshold))
                        if c.at_most
                        else (F.col(f"_m{i}") >= F.lit(c.threshold))
                    ),
                    F.lit(False),
                ).alias("passed"),
            )
            for i, c in enumerate(flat)
        ]
    )
    return row.select(F.explode(structs).alias("_c")).select(
        "_c.check", "_c.column", "_c.metric", "_c.threshold", "_c.passed"
    )


def audit_passed(report: DataFrame) -> bool:
    """Gate decision: True iff every check passed. (Eager — the report
    is check-count-sized.)"""
    return report.filter(~F.col("passed")).limit(1).count() == 0
