"""Declarative data-quality expectations over a DataFrame.

The training-data pipeline's admission gate: a rule set (name -> boolean
Column) is evaluated in ONE narrow pass that yields the valid rows, the
quarantined rows (with the names of every rule they break), and a
per-rule violation report.  Nothing here is a second scan: the rule
columns are ordinary expressions fused into whatever action consumes the
split, and the report is a single map-side-combinable aggregate.

Same contract as Delta Live Tables' ``expect``/``expect_or_drop`` but
engine-native and side-effect-free; the reference has no validation at
all (rows flow from SQL scan to SQS unchecked), so this is §2.G
extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["apply_expectations", "expectations_report"]


def _broken(rules: dict[str, Column]) -> Column:
    """Array of names of the rules a row violates (empty = clean)."""
    return F.array_compact(F.array(*[
        F.when(~F.coalesce(rule, F.lit(False)), F.lit(name))
        for name, rule in rules.items()]))


def apply_expectations(df: DataFrame,
                       rules: dict[str, Column]) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` into (valid, quarantine) by ``rules``.

    A row is valid iff EVERY rule passes; NULL rule results count as
    violations (a rule that cannot be evaluated has not passed — the
    conservative gate).  Quarantined rows carry ``_broken_rules``, the
    array of failed rule names, so triage can group by failure mode.
    Both frames share one scan's lineage; consuming both costs the scan
    twice unless the caller persists upstream.
    """
    if not rules:
        raise ValueError("rules must be a non-empty mapping")
    tagged = df.withColumn("_broken_rules", _broken(rules))
    valid = tagged.filter(F.size("_broken_rules") == 0) \
                  .drop("_broken_rules")
    quarantine = tagged.filter(F.size("_broken_rules") > 0)
    return valid, quarantine


def expectations_report(df: DataFrame,
                        rules: dict[str, Column]) -> DataFrame:
    """Per-rule violation counts + total rows, one aggregate pass.

    Output: rule, n_violations, n_rows (constant per row), violated_ppm
    (integer parts-per-million — exact integer division, so the number
    is bit-identical on every engine; float ratios round differently at
    half boundaries).  The unpivoted shape keeps one output row per
    rule so the report stays rule-count-sized regardless of data volume.
    """
    if not rules:
        raise ValueError("rules must be a non-empty mapping")
    aggs = [F.sum((~F.coalesce(rule, F.lit(False))).cast("long"))
             .alias(name) for name, rule in rules.items()]
    wide = df.agg(F.count(F.lit(1)).alias("_n"), *aggs)
    stacked = F.explode(F.array(*[
        F.struct(F.lit(name).alias("rule"),
                 F.col(name).alias("n_violations"))
        for name in rules])).alias("r")
    return (wide.select(F.col("_n"), stacked)
            .select(F.col("r.rule").alias("rule"),
                    F.col("r.n_violations").alias("n_violations"),
                    F.col("_n").alias("n_rows"),
                    F.expr("r.n_violations * 1000000 DIV _n")
                     .alias("violated_ppm")))
