"""Round-10 operators: injective fuzzy pair keys, manifest commit
arbitration, distributed prune planning, streaming parity plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.operators.fuzzy import (
    blocked_levenshtein_pairs_multiblock,
)


def test_multiblock_pair_key_is_injective(spark):
    """Names containing the old 0x1f separator must not collide.

    Under md5(a + "\\x1f" + b), the pairs ("x\\x1fy", "z") and
    ("x", "y\\x1fz") encode identically, so dropDuplicates silently ate
    one candidate before scoring (round-9 advice). The length-prefixed
    encoding keeps all C(4,2)=6 pairs of this adversarial block.
    """
    names = ["x\x1fy", "z", "x", "y\x1fz"]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    out = blocked_levenshtein_pairs_multiblock(
        df, "name", block_cols=[F.lit("blk")], max_dist=4
    ).collect()
    pairs = {(r["name_a"], r["name_b"]) for r in out}
    assert len(pairs) == 6
    assert ("x\x1fy", "z") in pairs
    assert ("x", "y\x1fz") in pairs
