"""Salted two-phase aggregation == unsalted aggregation (skew.py contract).

The north rule requires heavy-hitter vertices handled by salted
two-phase aggregation; these tests pin the algebraic-identity claim the
module docstring makes: for any commutative+associative merge, the
salted plan returns exactly the unsalted result, for every salt width.
Skewed fixture: one hub key receiving ~100× the median key's rows
(power-law in-degree in miniature).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from linkgraph.skew import heavy_hitters, salted_agg, salted_count_by_label


def _skewed_df(spark):
    # hub dst=0 gets 200 rows from distinct srcs; dsts 1..20 get 2 each
    rows = [(s, 0, s % 7) for s in range(200)]
    rows += [(1000 + d * 2 + i, d, (d + i) % 3) for d in range(1, 21) for i in range(2)]
    return spark.createDataFrame(rows, "src long, dst long, label long")


def _sorted(df):
    return [tuple(r) for r in df.collect()]


def test_salted_sum_matches_unsalted(spark):
    df = _skewed_df(spark).withColumn("x", (F.col("src") % 11).cast("double"))
    plain = df.groupBy("dst").agg(F.sum("x").alias("x"), F.count("*").alias("n"))
    for num_salts in (1, 4, 16):
        salted = salted_agg(
            df,
            "dst",
            [F.sum("x").alias("px"), F.count("*").alias("pn")],
            [F.sum("px").alias("x"), F.sum("pn").alias("n")],
            salt_on="src",
            num_salts=num_salts,
        )
        assert sorted(_sorted(salted)) == sorted(_sorted(plain))


def test_salted_min_max_matches_unsalted(spark):
    df = _skewed_df(spark)
    plain = df.groupBy("dst").agg(F.min("src").alias("lo"), F.max("src").alias("hi"))
    salted = salted_agg(
        df,
        "dst",
        [F.min("src").alias("plo"), F.max("src").alias("phi")],
        [F.min("plo").alias("lo"), F.max("phi").alias("hi")],
        salt_on="src",
        num_salts=8,
    )
    assert sorted(_sorted(salted)) == sorted(_sorted(plain))


def test_salted_count_by_label_matches_unsalted(spark):
    df = _skewed_df(spark)
    plain = df.groupBy("dst", "label").agg(F.count("*").alias("cnt"))
    salted = salted_count_by_label(df, "dst", "label", salt_on="src", num_salts=16)
    assert sorted(_sorted(salted)) == sorted(_sorted(plain))
    # the hub's label counts specifically (the skewed group)
    hub = {(r[1], r[2]) for r in _sorted(salted) if r[0] == 0}
    assert sum(c for _, c in hub) == 200


def test_salt_is_deterministic(spark):
    df = _skewed_df(spark)
    a = salted_count_by_label(df, "dst", "label", salt_on="src", num_salts=16)
    b = salted_count_by_label(df, "dst", "label", salt_on="src", num_salts=16)
    assert sorted(_sorted(a)) == sorted(_sorted(b))


def test_heavy_hitters_finds_only_the_hub(spark):
    df = _skewed_df(spark)
    hot = _sorted(heavy_hitters(df, "dst", threshold=100))
    assert hot == [(0, 200)]
    # threshold below the cold keys' freq returns everything
    assert len(_sorted(heavy_hitters(df, "dst", threshold=1))) == 21
