"""Model-evaluation operators beyond AUC: calibration (reliability bins)
and inter-rater agreement (Cohen's kappa) — both in exact integer
arithmetic so every engine computes identical values (the strict-oracle
contract of ``analysis.py::rank_auc`` and ``quality_model.py``).

The reference engine (ghsnd/mopper, `src/operator/`) has no evaluation
algebra at all; these extend the quality-filtering stage the way a
production curation pipeline audits its classifier before trusting it at
100 TB: AUC says the model *ranks* well, calibration says its scores
*mean* something at each operating point, and kappa says two independent
raters (model vs heuristic, or two model versions) agree beyond chance.

Exactness discipline:

- Per-document mean scores are fixed-point integers computed with
  non-negative integer division only (shift-then-divide), because Spark's
  ``div`` truncates toward zero while DuckDB's ``//`` floors — they agree
  exactly on non-negative operands and silently diverge on negatives.
- Kappa is reported as an exact (numerator, denominator) BIGINT pair
  scaled by n² — never a float — so hash-exact comparison works and the
  consumer can do the one division at display time.

Scale shape: both operators are single combine-able aggregations over a
pre-scored corpus (map-side partial aggregation; the shuffle carries one
row per bin / one row total), so they cost one pass regardless of corpus
size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def calibration_bins(
    scored: DataFrame,
    *,
    score_col: str = "score_fp",
    count_col: str = "n_features",
    label_col: str = "label",
    n_bins: int = 10,
    weight_abs_max: int = 1000,
    scale: int = 1_000_000,
) -> DataFrame:
    """Reliability-diagram bins for a hashed-linear quality model
    (``quality_model.py::quality_scores``): bucket documents by their
    fixed-point mean feature weight and report, per bin, the document
    count, the positive-label count, and the exact sum of per-document
    mean scores — everything a reliability diagram / ECE computation
    needs, in exact BIGINTs.

    Per document (``count_col`` > 0 required — zero-feature docs carry no
    model opinion and are excluded, matching the AUC contract):

    - ``shifted = score_fp + weight_abs_max * n_features`` ≥ 0 (each
      feature weight is in [-weight_abs_max, weight_abs_max], so the sum
      is bounded below by -weight_abs_max·n);
    - ``mean_fp = (shifted * scale) div n_features`` ∈
      [0, 2·weight_abs_max·scale] — non-negative integer division, where
      truncation and floor coincide (see module docstring);
    - ``bin = (mean_fp * n_bins) div (2·weight_abs_max·scale + 1)`` —
      the +1 keeps the theoretical max inside bin ``n_bins - 1``.

    Returns ``(bin, n_docs, n_pos, sum_mean_fp)``; ``sum_mean_fp / n_docs
    / scale - weight_abs_max`` recovers the bin's mean raw score.
    """
    span = 2 * weight_abs_max * scale + 1
    mean_expr = (
        f"((({score_col} + {weight_abs_max} * {count_col}) * {scale})"
        f" div {count_col})"
    )
    base = scored.filter(F.col(count_col) > 0).select(
        F.expr(f"({mean_expr} * {n_bins}) div {span}").cast("long").alias("bin"),
        F.expr(mean_expr).cast("long").alias("mean_fp"),
        F.col(label_col).cast("long").alias("pos"),
    )
    return (
        base.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("pos").cast("long").alias("n_pos"),
            F.sum("mean_fp").cast("long").alias("sum_mean_fp"),
        )
    )


def cohens_kappa(
    df: DataFrame,
    rater_a: str,
    rater_b: str,
) -> DataFrame:
    """Cohen's kappa between two binary raters as ONE exact-integer row.

    With n items, observed agreement ``po = agree / n`` and chance
    agreement ``pe = (a1·b1 + a0·b0) / n²`` (a1 = rater A's positive
    count, …), kappa = (po − pe) / (1 − pe).  Multiplying through by n²
    keeps everything in BIGINTs:

    - ``kappa_num = n · agree − (a1·b1 + a0·b0)``
    - ``kappa_den = n² − (a1·b1 + a0·b0)``

    Returns ``(n, n11, n10, n01, n00, agree, pe_num, kappa_num,
    kappa_den)`` where ``n11`` counts both-positive, ``n10`` A-only, etc.
    ``kappa_den = 0`` (both raters constant) is the undefined case —
    emitted as-is for the caller to handle rather than masked.

    One combine-able aggregation; the shuffle carries a single row.
    """
    a = F.col(rater_a).cast("long")
    b = F.col(rater_b).cast("long")
    agg = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(a * b).cast("long").alias("n11"),
        F.sum(a * (1 - b)).cast("long").alias("n10"),
        F.sum((1 - a) * b).cast("long").alias("n01"),
        F.sum((1 - a) * (1 - b)).cast("long").alias("n00"),
    )
    pe_num = (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01")) + (
        F.col("n00") + F.col("n01")
    ) * (F.col("n00") + F.col("n10"))
    agree = F.col("n11") + F.col("n00")
    return agg.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        agree.cast("long").alias("agree"),
        pe_num.cast("long").alias("pe_num"),
        (F.col("n") * agree - pe_num).cast("long").alias("kappa_num"),
        (F.col("n") * F.col("n") - pe_num).cast("long").alias("kappa_den"),
    )


def classification_report(
    df: DataFrame,
    label_col: str,
    pred_col: str,
    *,
    scale: int = 10**6,
) -> DataFrame:
    """Per-class precision/recall/F1 from exact confusion counts — the
    thresholded companion to the threshold-free ``rank_auc`` and
    ``calibration_bins``: one row per class appearing in labels or
    predictions, ``(class, tp, fp, fn, precision_fp, recall_fp,
    f1_fp)``, all BIGINT (fixed-point ratios by integer div;
    ``f1 = 2tp / (2tp + fp + fn)`` needs no float ever).  Classes with
    zero denominator (never predicted / never true) report the ratio as
    0 — the scikit-learn ``zero_division=0`` convention.  Macro
    averages are one consumer aggregation over these rows; micro-F1
    equals accuracy on single-label data and falls out of the tp sums.

    Plan: one (label, pred) cell aggregate (class²-bounded, classes are
    enum-cardinality) + two class-level rollups joined back.
    """
    cells = (
        df.select(
            F.col(label_col).cast("string").alias("y"),
            F.col(pred_col).cast("string").alias("p"),
        )
        .groupBy("y", "p")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=False)
    )
    tp = (
        cells.filter(F.col("y") == F.col("p"))
        .select(F.col("y").alias("cls"), F.col("n").alias("tp"))
    )
    truth = cells.groupBy(F.col("y").alias("cls")).agg(
        F.sum("n").cast("long").alias("n_true")
    )
    pred = cells.groupBy(F.col("p").alias("cls")).agg(
        F.sum("n").cast("long").alias("n_pred")
    )
    base = (
        truth.join(pred, "cls", "full")
        .select(
            "cls",
            F.coalesce(F.col("n_true"), F.lit(0)).alias("n_true"),
            F.coalesce(F.col("n_pred"), F.lit(0)).alias("n_pred"),
        )
        .join(tp, "cls", "left")
        .select(
            "cls",
            F.coalesce(F.col("tp"), F.lit(0)).cast("long").alias("tp"),
            (F.col("n_pred") - F.coalesce(F.col("tp"), F.lit(0)))
            .cast("long")
            .alias("fp"),
            (F.col("n_true") - F.coalesce(F.col("tp"), F.lit(0)))
            .cast("long")
            .alias("fn"),
        )
    )
    s = int(scale)
    return base.select(
        "cls",
        "tp",
        "fp",
        "fn",
        F.when(F.col("tp") + F.col("fp") > 0,
               F.expr(f"(tp * {s}) div (tp + fp)"))
        .otherwise(0).cast("long").alias("precision_fp"),
        F.when(F.col("tp") + F.col("fn") > 0,
               F.expr(f"(tp * {s}) div (tp + fn)"))
        .otherwise(0).cast("long").alias("recall_fp"),
        F.when(2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
               F.expr(f"(2 * tp * {s}) div (2 * tp + fp + fn)"))
        .otherwise(0).cast("long").alias("f1_fp"),
    )
