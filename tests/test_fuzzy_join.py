"""Fuzzy-join tests (operators/fuzzy_join.py): exact parity with the
naive cross join is the contract — the q-gram filter may only prune,
never change the answer."""

import random
import string

import pytest
from pyspark.sql import functions as F

from scio_spark.operators.fuzzy_join import fuzzy_join


def naive(left, right, d):
    return (
        left.crossJoin(right)
        .withColumn("distance", F.levenshtein("l_text", "r_text"))
        .filter(F.col("distance") <= d)
        .select("l_id", "r_id", "distance")
    )


@pytest.fixture(scope="module")
def rand_names(spark):
    rng = random.Random(41)
    base = [
        "".join(rng.choice(string.ascii_lowercase) for _ in range(rng.randint(1, 14)))
        for _ in range(80)
    ]
    # inject guaranteed near-pairs: mutations of base strings
    def mutate(s):
        if not s:
            return s + "x"
        i = rng.randrange(len(s))
        op = rng.choice(["sub", "del", "ins"])
        if op == "sub":
            return s[:i] + rng.choice(string.ascii_lowercase) + s[i + 1 :]
        if op == "del":
            return s[:i] + s[i + 1 :]
        return s[:i] + rng.choice(string.ascii_lowercase) + s[i:]

    lrows = [(i, s) for i, s in enumerate(base)]
    rrows = [(1000 + i, mutate(s)) for i, s in enumerate(base)] + [
        (2000 + i, mutate(mutate(mutate(s)))) for i, s in enumerate(base)
    ]
    return (
        spark.createDataFrame(lrows, "l_id long, l_text string"),
        spark.createDataFrame(rrows, "r_id long, r_text string"),
    )


@pytest.mark.parametrize("d", [0, 1, 2, 3])
def test_parity_with_naive(rand_names, d):
    left, right = rand_names
    fast = sorted(map(tuple, fuzzy_join(left, right, d).collect()))
    slow = sorted(map(tuple, naive(left, right, d).collect()))
    assert fast == slow and len(fast) > 0


def test_short_strings_not_missed(spark):
    """Pairs below the q-gram applicability bound (both sides short) come
    from the direct stratum — e.g. 'ab' vs 'cd' at d=4 share no grams."""
    left = spark.createDataFrame([(1, "ab"), (2, "x")], "l_id long, l_text string")
    right = spark.createDataFrame([(10, "cd"), (11, "xy")], "r_id long, r_text string")
    got = sorted(map(tuple, fuzzy_join(left, right, 4).collect()))
    exp = sorted(map(tuple, naive(left, right, 4).collect()))
    assert got == exp
    assert (1, 10, 2) in got  # zero shared grams, distance 2


def test_exact_distance_values(spark):
    left = spark.createDataFrame([(1, "kitten")], "l_id long, l_text string")
    right = spark.createDataFrame([(2, "sitting")], "r_id long, r_text string")
    rows = fuzzy_join(left, right, 3).collect()
    assert [(r.l_id, r.r_id, r.distance) for r in rows] == [(1, 2, 3)]
    assert fuzzy_join(left, right, 2).count() == 0


def test_no_all_pairs_join_anywhere_in_plan(rand_names):
    """Both strata are equi-joins: grams for the long stratum, length
    bands (width d+1, probe bands {b-1,b,b+1}) for the short×short
    stratum — so with both strata non-trivial the plan contains NO
    all-pairs operator (no CartesianProduct, no BroadcastNestedLoopJoin;
    the r5-flagged forced-broadcast cross is gone)."""
    left, right = rand_names
    plan = (
        fuzzy_join(left, right, 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_max_gram_freq_caps_but_documents_loss(spark):
    rows_l = [(i, "aaaaaaaaaa") for i in range(20)]
    rows_r = [(100 + i, "aaaaaaaaab") for i in range(20)]
    left = spark.createDataFrame(rows_l, "l_id long, l_text string")
    right = spark.createDataFrame(rows_r, "r_id long, r_text string")
    full = fuzzy_join(left, right, 1).count()
    capped = fuzzy_join(left, right, 1, max_gram_freq=5).count()
    assert full == 400
    assert capped < full  # the documented trade
