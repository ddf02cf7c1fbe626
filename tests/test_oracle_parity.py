"""Oracle-differential tests (SURVEY.md §5 strategy #1): every catalog
query's Spark result must match its DuckDB oracle exactly — the local
mirror of the driver's CORRECTNESS gate.

Runs at sf0.001 by default (fast inner loop); set
SPARK_GRAFT_ORACLE_SF=/root/testdata/sf0.01 to mirror the driver scale.
"""

import os

import pytest

from tcga_query_project_spark.catalog import BENCH_ONLY, REGISTRY
from tests.oracle_harness import compare, run_oracle

SF = os.environ.get(
    "SPARK_GRAFT_ORACLE_SF",
    os.path.join(os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), "sf0.001"),
)

# BENCH_ONLY entries don't get driver verification (48-slot cap) but go
# through the identical oracle comparison here, so their correctness
# story is the same — just locally enforced.
ALL_SPECS = {**BENCH_ONLY, **REGISTRY}
CASES = sorted(ALL_SPECS)


@pytest.mark.parametrize("name", CASES)
def test_query_matches_oracle(spark, name):
    spec = ALL_SPECS[name]
    sdf = spec.build(spark, SF)
    spark_pdf = sdf.toPandas()
    if spec.oracle is None:
        assert len(spark_pdf) >= 0  # rows-only check, mirrors the driver
        return
    oracle_pdf = run_oracle(spec.oracle, SF)
    problems = compare(spark_pdf, oracle_pdf)
    assert not problems, f"{name}: {problems[:5]}"
