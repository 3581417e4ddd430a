from __future__ import annotations

import os
import shutil

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"

# Scratch space inside the repo (the container forbids writes elsewhere).
SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")


@pytest.fixture(scope="session")
def spark():
    from hadoop_word_score_spark.session import get_spark

    s = get_spark("pytest", master="local[8]")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    yield s


@pytest.fixture(scope="session")
def scratch_dir():
    os.makedirs(SCRATCH, exist_ok=True)
    yield SCRATCH
    shutil.rmtree(SCRATCH, ignore_errors=True)
