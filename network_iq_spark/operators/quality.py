"""Data-quality / contract operators (SURVEY.md §2.11, Q1-Q3).

The reference's ``_data_contract_summary`` (streamlit_app.py:39-105) walks
the frame once per check; here the whole contract is ONE multi-aggregate
pass — at 100 TB that is the difference between one scan and six.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Contract:
    """Declarative data contract (Q1/Q2)."""

    required: Sequence[str] = ()
    not_null: Sequence[str] = ()
    ranges: dict[str, tuple[float, float]] = field(default_factory=dict)


def contract_summary(df: DataFrame, contract: Contract) -> DataFrame:
    """Q1: single-pass contract report — row count, per-column null counts,
    out-of-range counts. Missing required columns are reported as -1 (the
    schema is static, so presence is a plan-time fact, not a scan)."""
    have = set(df.columns)
    aggs: list[Column] = [F.count("*").alias("row_count")]
    for c in contract.not_null:
        if c in have:
            aggs.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"nulls_{c}"))
        else:
            aggs.append(F.lit(-1).cast("bigint").alias(f"nulls_{c}"))
    for c, (lo, hi) in contract.ranges.items():
        if c in have:
            bad = F.col(c).isNotNull() & ((F.col(c) < lo) | (F.col(c) > hi))
            aggs.append(F.sum(bad.cast("bigint")).alias(f"bad_{c}"))
        else:
            aggs.append(F.lit(-1).cast("bigint").alias(f"bad_{c}"))
    missing = [c for c in contract.required if c not in have]
    return df.agg(*aggs).withColumn("missing_required", F.lit(len(missing)).cast("bigint"))


def contract_passed(summary_row: dict) -> bool:
    """Q2: pass ⇔ nothing missing, no nulls, nothing out of range
    (streamlit_app.py:98-105)."""
    return all(
        v == 0
        for k, v in summary_row.items()
        if k != "row_count" and isinstance(v, int)
    )


def validate_and_quarantine(
    df: DataFrame, rules: Sequence[tuple[str, Column]]
) -> tuple[DataFrame, DataFrame]:
    """Row-level contract enforcement with reasons: returns
    ``(valid, rejects)`` where rejects carry ``failed_rules`` — the sorted
    array of every rule the row violates (not just the first: operators
    triaging a bad feed need the full picture per row, and first-failure
    reporting makes counts depend on rule order).

    Each rule is ``(name, boolean Column)`` with True = pass; a NULL
    predicate result counts as a failure (unknown is not a pass). ONE
    projection computes all verdicts — both outputs share the scan, and at
    100 TB the quarantine side is the tiny branch that feeds a rejects
    sink while the valid side streams on. Complements Q1's aggregate
    summary (`contract_summary`) with the row-grain operational split.
    """
    flags = F.array(
        *[
            F.when(pred.isNull() | ~pred, F.lit(name))
            for name, pred in rules
        ]
    )
    tagged = df.withColumn(
        "failed_rules",
        F.array_sort(F.filter(flags, lambda x: x.isNotNull())),
    )
    valid = tagged.filter(F.size("failed_rules") == 0).drop("failed_rules")
    rejects = tagged.filter(F.size("failed_rules") > 0)
    return valid, rejects


def k_anonymity_report(
    df: DataFrame, quasi_cols: Sequence[str], k: int
) -> DataFrame:
    """Privacy tier (r11): k-anonymity audit over a quasi-identifier
    combination — the pre-release check a training-data pipeline runs
    before shipping user-derived tables: a row whose quasi-identifier
    combo is shared by fewer than ``k`` rows is re-identifiable by
    linkage. Output one row per combo: (quasi..., n, at_risk) with
    ``at_risk = n < k``; NULL quasi values group as their own combo
    (NULL is linkable too — suppressing a value and then ignoring it in
    the audit would hide exactly the rows suppression created).

    Scale shape: ONE hash aggregate on the quasi columns (map-side
    partials absorb the hot combos); output ∝ distinct combos, never
    rows. The decision is integer (count < k) — engine-exact."""
    return (
        df.groupBy(*[F.col(c) for c in quasi_cols])
        .agg(F.count("*").cast("bigint").alias("n"))
        .withColumn("at_risk", F.col("n") < k)
    )


def k_suppress(
    df: DataFrame, quasi_cols: Sequence[str], k: int
) -> DataFrame:
    """Row-level k-anonymity enforcement by SUPPRESSION: rows whose
    quasi-identifier combo has fewer than ``k`` members get every quasi
    column nulled (the minimal-distortion baseline; generalization
    hierarchies are a policy layer above). Non-quasi columns pass
    through untouched, so the frame stays joinable on its true keys.

    Plan: ONE window count over the quasi partition — no broadcast, no
    join. The under-k combo list is NOT small in the realistic privacy
    case (high-cardinality quasi combos put most of the table under k,
    so a broadcast of that list is O(rows) to the driver — the r11
    review caught exactly that hazard in the first formulation), and
    window partitioning groups NULL quasi values natively, which an
    equi-join needs null-safe gymnastics for. After suppression every
    surviving combo trivially satisfies k (the suppressed rows merge
    into the all-NULL combo, which is reported, not hidden, by
    :func:`k_anonymity_report`)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*[F.col(c) for c in quasi_cols])
    out = df.withColumn("__n__", F.count("*").over(w))
    for c in quasi_cols:
        out = out.withColumn(c, F.when(F.col("__n__") >= k, F.col(c)))
    return out.select(*df.columns)
