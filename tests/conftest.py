from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # tests: small local parallelism


@pytest.fixture(scope="session")
def spark():
    from phenoscape_owl_tools_spark.session import get_spark

    s = get_spark(app_name="pytest", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus(tmp_path_factory):
    from phenoscape_owl_tools_spark.fixtures import generate_corpus, write_corpus

    c = generate_corpus(seed=42, n_docs=150)
    out = tmp_path_factory.mktemp("fixtures")
    paths = write_corpus(c, out)
    return c, paths


SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"
