"""Expect-score regression (SURVEY.md A8) — src/regression.py:85-122 of the
reference re-expressed: OLS of similarity score on log profile sizes,
standardized residuals, Gumbel-tail p-value, expect score.

The model is 3-coefficient (intercept + log(query size) + log(corpus
size)), so the fit needs only 9 moment sums — one Spark aggregation row —
and a closed-form Cramer's-rule solve (no matrix library, and the identical
arithmetic is reproducible by the SQL oracle). Scoring is then pure column
math over the full table: no collect of data rows, no UDF; scales to any
number of pairs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EULER_GAMMA = 0.57721566490153286


def _det3(a, b, c, d, e, f, g, h, i) -> float:
    """Determinant of [[a,b,c],[d,e,f],[g,h,i]]."""
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def fit_ols3(scores: DataFrame) -> tuple[float, float, float, float, int]:
    """OLS fit of score ~ 1 + x1 + x2 over (score, x1, x2) columns.

    Returns (b0, b1, b2, sigma, n): coefficients + residual standard error
    (n-3 dof). One aggregation job; Cramer's rule on the driver.
    """
    y, x1, x2 = F.col("score"), F.col("x1"), F.col("x2")
    m = scores.agg(
        F.count("*").alias("n"),
        F.sum(x1).alias("s1"), F.sum(x2).alias("s2"), F.sum(y).alias("sy"),
        F.sum(x1 * x1).alias("s11"), F.sum(x1 * x2).alias("s12"),
        F.sum(x2 * x2).alias("s22"),
        F.sum(x1 * y).alias("s1y"), F.sum(x2 * y).alias("s2y"),
        F.sum(y * y).alias("syy"),
    ).collect()[0]
    n, s1, s2, sy = m["n"], m["s1"], m["s2"], m["sy"]
    s11, s12, s22, s1y, s2y = m["s11"], m["s12"], m["s22"], m["s1y"], m["s2y"]
    if n is None or n == 0:
        raise ValueError("expect_scores: empty input")
    det = _det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    # Singular design (collinear regressors, e.g. all profiles the same
    # size) or too few points for a 3-coefficient fit: degrade to the
    # intercept-only model rather than dividing by ~zero — residuals then
    # measure deviation from the mean score, which is the right null model.
    scale = max(abs(n), abs(s11), abs(s22), 1.0) ** 3
    if n <= 3 or abs(det) < 1e-12 * scale:
        b0, b1, b2 = sy / n, 0.0, 0.0
        sse = m["syy"] - n * b0 * b0
        sigma = math.sqrt(max(sse, 0.0) / max(n - 1, 1)) or 1.0
        return b0, b1, b2, sigma, n
    b0 = _det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22) / det
    b1 = _det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22) / det
    b2 = _det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y) / det
    # SSE via moments (same arithmetic as the oracle): sum (y - yhat)^2
    sse = (
        m["syy"] + b0 * b0 * n + b1 * b1 * s11 + b2 * b2 * s22
        - 2 * b0 * sy - 2 * b1 * s1y - 2 * b2 * s2y
        + 2 * b0 * b1 * s1 + 2 * b0 * b2 * s2 + 2 * b1 * b2 * s12
    )
    sigma = math.sqrt(max(sse, 0.0) / (n - 3))
    return b0, b1, b2, sigma, n


def expect_scores(pair_scores: DataFrame) -> DataFrame:
    """(query, corpus, score, query_size, corpus_size) -> + (p_value, expect).

    Mirrors regression.py:101-108: standardized residual r, Gumbel p =
    1 - exp(-exp(-r*pi/sqrt(6) + gamma)), expect = p * corpus_size.
    """
    df = pair_scores.withColumn("x1", F.log("query_size")).withColumn(
        "x2", F.log("corpus_size")
    )
    b0, b1, b2, sigma, _ = fit_ols3(df)
    resid = F.col("score") - (
        F.lit(b0) + F.lit(b1) * F.col("x1") + F.lit(b2) * F.col("x2")
    )
    r = resid / F.lit(sigma)
    p = 1.0 - F.exp(-F.exp(-r * math.pi / math.sqrt(6.0) + EULER_GAMMA))
    return df.select(
        "query",
        "corpus",
        F.round(p, 6).alias("p_value"),
        F.round(p * F.col("corpus_size"), 6).alias("expect"),
    )
