"""Physical-layout advisor (advisor.py): planted NDV/skew/null shapes
must hit each recommendation class."""

import pytest
from pyspark.sql import functions as F

from nadeefiler_spark.advisor import layout_advisor


def test_recommendation_classes(spark):
    n = 20000
    df = spark.range(n).select(
        (F.col("id") % 50).cast("string").alias("good_part"),   # 50 balanced values
        (F.col("id") % 3).cast("string").alias("too_few"),      # ndv < 8
        F.col("id").cast("string").alias("unique_key"),          # ndv > 10k
        F.when(F.col("id") % 10 == 0, F.col("id") % 100)
        .otherwise(0).cast("string").alias("skewed"),            # 90% one value
        F.when(F.col("id") % 5 == 0, F.lit(None))
        .otherwise(F.col("id") % 20).cast("string").alias("nully"),  # 20% null
    )
    got = {
        r["col"]: r
        for r in layout_advisor(
            df, ["good_part", "too_few", "unique_key", "skewed", "nully"]
        ).collect()
    }
    assert got["good_part"]["recommendation"] == "partition"
    assert got["good_part"]["ndv"] == 50
    assert got["too_few"]["recommendation"] == "reject"
    assert got["unique_key"]["recommendation"] == "bucket"
    assert got["skewed"]["recommendation"] == "reject"
    # "0" rows: the 90% otherwise-branch plus the id%100==0 rows (1%)
    assert got["skewed"]["top_frac"] == pytest.approx(0.91)
    assert got["nully"]["recommendation"] == "reject"
    assert got["nully"]["null_frac"] == pytest.approx(0.2)
    # NDV excludes NULL, matching count(distinct): residues 0/5/10/15
    # are exactly the id%5==0 rows, so only 16 non-null values exist
    assert got["nully"]["ndv"] == 16
    assert all(r["n"] == n for r in got.values())


def test_empty_cols_rejected(spark):
    with pytest.raises(ValueError):
        layout_advisor(spark.range(5), [])
