"""Explicit skew handling for hub-entity joins (SURVEY.md §4.2, §7.5).

Root ontology classes (ANATOMICAL_ENTITY, QUALITY, root taxa — the hubs the
reference queries by name, PhenoscapeKB.scala:157-170) sit on the object
side of a large fraction of closure edges and extracted triples. AQE's
skew-join split handles moderate skew; for the known-pathological hub keys
we salt explicitly: the skewed probe side gets a random-but-deterministic
salt ``pmod(hash(row-identity), S)``, the small build side is exploded S
ways. The salt factor is chosen from an observed key histogram and recorded
in the stage manifest (plans/kb_build.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skew_histogram(df: DataFrame, key: str, top_n: int = 20) -> list[tuple[str, int]]:
    """Top-N heaviest keys; drives the salt-factor decision (manifested)."""
    rows = (
        df.groupBy(key).count().orderBy(F.desc("count")).limit(top_n).collect()
    )
    return [(r[key], r["count"]) for r in rows]


def choose_salt_factor(df: DataFrame, key: str, target_per_key: int = 500_000) -> int:
    hist = skew_histogram(df, key, top_n=1)
    if not hist:
        return 1
    heaviest = hist[0][1]
    return max(1, min(64, -(-heaviest // target_per_key)))


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    salt: int,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big probe side, explode the build side.

    Deterministic: the salt is a hash of the full probe row's key + a stable
    fingerprint column set, not a random number — re-runs produce identical
    partitioning (required for resume + golden-file comparison).
    """
    if how not in ("inner", "left", "leftouter", "left_outer", "leftsemi", "left_semi"):
        # right/full outer would duplicate unmatched build rows salt times
        # (the build side is exploded S ways)
        raise ValueError(f"salted_join does not support how={how!r}")
    if salt <= 1:
        return probe.join(build, probe[probe_key] == build[build_key], how)
    salted_probe = probe.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]), F.lit(salt))
    )
    salted_build = build.withColumn(
        "_salts", F.sequence(F.lit(0), F.lit(salt - 1))
    ).withColumn("_salt", F.explode("_salts")).drop("_salts").withColumn(
        "_salt", F.col("_salt").cast("long")
    )
    out = salted_probe.join(
        salted_build,
        (salted_probe[probe_key] == salted_build[build_key])
        & (salted_probe["_salt"] == salted_build["_salt"]),
        how,
    )
    return out.drop("_salt")
