"""Unit tests: expect-score regression (A8), annotation status (A7), TSV
sink (S10), satisfiability (C7), EQ grid generate-and-test (J11/J12)."""

from __future__ import annotations

import csv
import math
from pathlib import Path

import numpy as np
import pytest
from pyspark.sql import Row

from phenoscape_owl_tools_spark.operators import regression, report
from phenoscape_owl_tools_spark.operators.closure import (
    transitive_closure,
    unsatisfiable_classes,
)
from phenoscape_owl_tools_spark.operators.eq import eq_grid, surviving_subsumers


def test_expect_scores_matches_numpy_ols(spark):
    rows = [
        Row(query=f"q{i}", corpus=f"c{i}",
            score=0.1 * (i % 7) + 0.01 * i,
            query_size=2 + (i % 5), corpus_size=3 + (i % 4))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows)
    got = {(r["query"], r["corpus"]): (r["p_value"], r["expect"])
           for r in regression.expect_scores(df).collect()}

    y = np.array([r.score for r in rows])
    X = np.column_stack([
        np.ones(len(rows)),
        np.log([r.query_size for r in rows]),
        np.log([r.corpus_size for r in rows]),
    ])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ beta
    sigma = math.sqrt((resid @ resid) / (len(rows) - 3))
    r_std = resid / sigma
    p = 1.0 - np.exp(-np.exp(-r_std * math.pi / math.sqrt(6) + regression.EULER_GAMMA))
    for i, row in enumerate(rows):
        pv, ex = got[(row.query, row.corpus)]
        assert pv == pytest.approx(p[i], abs=1e-5)
        assert ex == pytest.approx(p[i] * row.corpus_size, abs=1e-4)


def test_annotation_status_buckets(spark):
    rows = [
        Row(doc_id="1", entity="E", quality="Q", related_entity="R"),
        Row(doc_id="2", entity="E", quality="Q", related_entity=None),
        Row(doc_id="3", entity="E", quality=None, related_entity=None),
        Row(doc_id="4", entity=None, quality="Q", related_entity=None),
        Row(doc_id="4", entity=None, quality=None, related_entity=None),
    ]
    got = {r["bucket"]: (r["n_annotations"], r["n_docs"])
           for r in report.annotation_status(spark.createDataFrame(rows)).collect()}
    assert got == {
        "full_eq_re": (1, 1), "eq": (1, 1), "entity_only": (1, 1),
        "quality_only": (1, 1), "empty": (1, 1),
    }


def test_tsv_report_sink_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([Row(a="x", b=1), Row(a="y", b=2)])
    out = tmp_path / "report"
    report.write_tsv_report(df, out)
    files = list(Path(out).glob("*.csv"))
    assert len(files) == 1
    with open(files[0]) as f:
        rows = list(csv.reader(f, delimiter="\t"))
    assert rows[0] == ["a", "b"]
    assert sorted(rows[1:]) == [["x", "1"], ["y", "2"]]


def test_unsatisfiable_classes(spark):
    edges = spark.createDataFrame(
        [("c", "a"), ("c", "b"), ("d", "c"), ("e", "a")], ["sub", "sup"]
    )
    cl = transitive_closure(edges)
    disjoints = spark.createDataFrame([("a", "b")], ["a", "b"])
    got = {r["cls"] for r in unsatisfiable_classes(cl, disjoints).collect()}
    # c (direct) and d (inherits both) are unsat; e sees only a
    assert got == {"c", "d"}


def test_eq_grid_generate_and_test(spark):
    entities = spark.createDataFrame([Row(iri="E1"), Row(iri="E2")])
    qualities = spark.createDataFrame([Row(iri="Q1"), Row(iri="Q2")])
    grid = eq_grid(entities, qualities)
    assert grid.count() == 4
    assert grid.select("phenotype_cls").distinct().count() == 4
    cooccur = spark.createDataFrame([Row(entity="E1", quality="Q2")])
    kept = surviving_subsumers(grid, cooccur).collect()
    assert len(kept) == 1
    assert (kept[0]["entity"], kept[0]["quality"]) == ("E1", "Q2")


def test_ntriples_rendering(spark, tmp_path):
    from phenoscape_owl_tools_spark.catalog import to_ntriples

    df = spark.createDataFrame(
        [("http://s/1", "http://p", "http://o/1"),
         ("http://s/1", "http://p", 'a "quoted" literal')],
        ["subj", "pred", "obj"],
    )
    lines = sorted(r["value"] for r in to_ntriples(df).collect())
    assert lines[0] == '<http://s/1> <http://p> "a \\"quoted\\" literal" .'
    assert lines[1] == "<http://s/1> <http://p> <http://o/1> ."
    out = tmp_path / "nt"
    to_ntriples(df).coalesce(1).write.mode("overwrite").text(str(out))
    content = [p.read_text() for p in out.glob("*.txt")][0]
    assert content.count(" .\n") == 2


def test_expect_scores_singular_design_degrades_gracefully(spark):
    # all profiles the same size: log sizes are constant => collinear with
    # the intercept; must fall back to the intercept-only model, not crash
    rows = [Row(query=f"q{i}", corpus=f"c{i}", score=float(i % 5),
                query_size=3, corpus_size=3) for i in range(10)]
    out = regression.expect_scores(spark.createDataFrame(rows)).collect()
    assert len(out) == 10
    assert all(0.0 <= r["p_value"] <= 1.0 for r in out)


def test_expect_scores_tiny_n(spark):
    rows = [Row(query="q", corpus="c", score=1.0, query_size=2, corpus_size=4)]
    out = regression.expect_scores(spark.createDataFrame(rows)).collect()
    assert len(out) == 1


def test_ntriples_control_char_escaping(spark):
    from phenoscape_owl_tools_spark.catalog import to_ntriples

    df = spark.createDataFrame(
        [("http://s", "http://p", "line1\nline2\tend")], ["subj", "pred", "obj"]
    )
    line = to_ntriples(df).collect()[0]["value"]
    assert "\n" not in line and "\t" not in line
    assert line == '<http://s> <http://p> "line1\\nline2\\tend" .'
