"""Data-quality checks (functions/checks.py): NULL-predicate = violation,
single-pass row rules, duplicate accounting, plan shape."""

import pytest
from pyspark.sql import functions as F

from scio_spark.functions.checks import run_checks


@pytest.fixture(scope="module")
def table(spark):
    rows = [
        (1, 10.0, "a"),
        (2, -5.0, "b"),    # violates v >= 0
        (3, None, "c"),    # NULL v -> violates v >= 0 (conservative)
        (3, 7.0, "d"),     # duplicate id with row above
        (4, 2.0, None),
    ]
    return spark.createDataFrame(rows, "id int, v double, tag string").repartition(3)


def test_row_rules_and_uniqueness(table):
    out = {
        r.check: (r.kind, r.n_violations, r.n_rows, r.passed)
        for r in run_checks(
            table,
            row_rules={
                "v_nonneg": F.col("v") >= 0,
                "tag_present": F.col("tag").isNotNull(),
            },
            unique_keys=[["id"]],
        ).collect()
    }
    assert out["v_nonneg"] == ("row_rule", 2, 5, False)      # -5 and NULL
    assert out["tag_present"] == ("row_rule", 1, 5, False)
    assert out["unique(id)"] == ("uniqueness", 1, 5, False)  # one extra id=3


def test_all_green(table):
    out = run_checks(
        table.filter("id = 1"),
        row_rules={"v_pos": F.col("v") > 0},
        unique_keys=[["id"]],
    )
    assert all(r.passed for r in out.collect())


def test_single_pass_for_row_rules(table):
    """All row rules share ONE aggregate over ONE scan of the input."""
    df = run_checks(
        table,
        row_rules={f"r{i}": F.col("v") > i for i in range(6)},
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") == 1


def test_requires_some_check(table):
    with pytest.raises(ValueError):
        run_checks(table)


def test_rejects_non_identifier_names(table):
    for bad in ["has space", "q'uote", "semi;colon", "tick`name"]:
        with pytest.raises(ValueError):
            run_checks(table, row_rules={bad: F.col("v") > 0})


def test_empty_input_passes_cleanly(spark):
    """SUM over zero rows is NULL — an empty table must report 0
    violations and passed=True (not NULL) for row rules AND uniqueness."""
    empty = spark.createDataFrame([], "id int, v double")
    out = {
        r.check: (r.n_violations, r.n_rows, r.passed)
        for r in run_checks(
            empty,
            row_rules={"v_nonneg": F.col("v") >= 0},
            unique_keys=[["id"]],
        ).collect()
    }
    assert out["v_nonneg"] == (0, 0, True)
    assert out["unique(id)"] == (0, 0, True)
