"""Blocked fuzzy string matching — edit-distance candidate pairs without the
all-pairs cross join.

Record linkage / entity resolution at corpus scale cannot evaluate
``levenshtein`` over N² pairs; the standard answer is *blocking*: derive a
cheap deterministic key (a token, a phonetic code, a length band) so only
rows sharing a block ever meet, then score inside blocks. The same inverted-
index discipline as the MinHash/LSH band join (``neardup.py``): candidate
generation is ALWAYS an equi-join.

A second scale lever used here: match the *dictionary*, not the fact table.
Distinct name strings are typically orders of magnitude fewer than rows
(2k parts share ~hundreds of names; 100 TB of order lines share millions of
customer name strings, not trillions) — so pairs are computed over the
deduplicated dictionary carrying per-name row counts, and callers fan the
verdicts back with a broadcast join if row-level linkage is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def blocked_levenshtein_pairs(
    df: DataFrame,
    name_col: str,
    block_col,
    max_dist: int = 4,
) -> DataFrame:
    """Candidate near-identical name pairs within edit distance
    ``max_dist``, blocked by ``block_col`` (a Column expression — e.g. the
    head noun of a product name, a soundex code, a normalized prefix).

    Output: one row per unordered pair — ``name_a`` < ``name_b``, ``dist``,
    and the per-name row counts ``n_a``/``n_b`` from the input.

    ``block_col`` must be a pure function of the NAME (a token, prefix,
    phonetic code, length band...). That is what makes the dictionary
    one row per name and each pair appear exactly once; a block key that
    depends on OTHER columns (a region, a category) fragments a name
    across blocks, so a pair sharing two blocks would be emitted once per
    block with per-block partial counts (round-8 review).

    Plan: dictionary build (one map-side-combined count on the name), then
    a self equi-join ON THE BLOCK KEY — the quadratic work is confined to
    each block, so skewed/huge blocks are the thing to watch (pick a block
    key with bounded fan-in; a degenerate constant block re-creates the
    cross join). ``levenshtein`` runs JVM-side inside codegen, and only
    after the free length-band guard ``abs(len_a - len_b) <= max_dist`` —
    a necessary condition for the distance bound that prunes pairs before
    the O(m·n) distance is computed.
    """
    dic = (
        df.select(F.col(name_col).alias("name"), block_col.alias("_blk"))
        .groupBy("name", "_blk")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # Materialize the dictionary once: a plain self-join re-derives the
    # aggregate on BOTH sides (no exchange reuse), i.e. the corpus-sized
    # scan+count would run twice. The dictionary is small by contract, so
    # a local checkpoint (lazy — computed at first action) trades a
    # dictionary-sized cache for halving the dominant stage.
    dic = dic.localCheckpoint(eager=False)
    a = dic.select(
        F.col("_blk"),
        F.col("name").alias("name_a"),
        F.col("n").alias("n_a"),
    )
    b = dic.select(
        F.col("_blk"),
        F.col("name").alias("name_b"),
        F.col("n").alias("n_b"),
    )
    pairs = (
        a.join(b, "_blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .filter(F.abs(F.length("name_a") - F.length("name_b")) <= max_dist)
    )
    return (
        pairs.withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= max_dist)
        .select("name_a", "name_b", "dist", "n_a", "n_b")
    )


def blocked_levenshtein_pairs_multiblock(
    df: DataFrame,
    name_col: str,
    block_cols: list,
    max_dist: int = 4,
) -> DataFrame:
    """OR-blocking (multi-pass blocking): a candidate pair is scored when
    the names share ANY of the ``block_cols`` keys — the form real record
    linkage uses (prefix OR phonetic code OR token), because any single
    blocker misses pairs that differ exactly in its key (round-9 advice).

    Same contract as :func:`blocked_levenshtein_pairs` — every
    ``block_cols`` entry must be a pure function of the name, and the
    output is one row per unordered pair regardless of how many blocks it
    shares. Empty/NULL block keys are dropped (an empty key would pool
    every non-matching name into one degenerate quadratic block).

    Plan: ONE dictionary build, explode into index-tagged block keys (the
    tag stops key collisions ACROSS blockers), self equi-join per key,
    then pair-level dedup BEFORE the edit distance — a pair sharing k
    blocks must cost one ``levenshtein``, not k. The dedup shuffles on a
    16-byte md5 pair key rather than the two name strings, keeping the
    exchange narrow.
    """
    bcols = [
        F.col(name_col).cast("string").alias("name"),
        *[
            bc.cast("string").alias(f"_b{i}")
            for i, bc in enumerate(block_cols)
        ],
    ]
    # blockers are pure functions of the name, so grouping by (name,
    # blocks) is still one dictionary row per name — and computes every
    # block key in the same pass as the count
    dic = (
        df.select(*bcols)
        .groupBy("name", *[f"_b{i}" for i in range(len(block_cols))])
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tagged = F.array(
        *[
            F.when(
                F.col(f"_b{i}").isNotNull() & (F.col(f"_b{i}") != ""),
                F.concat(F.lit(f"{i}:"), F.col(f"_b{i}")),
            )
            for i in range(len(block_cols))
        ]
    )
    keyed = (
        dic.select("name", "n", F.explode(tagged).alias("_blk"))
        .filter(F.col("_blk").isNotNull())
        # materialized once: the self-join would otherwise re-derive the
        # dictionary aggregate on both sides (no exchange reuse)
        .localCheckpoint(eager=False)
    )
    a = keyed.select(
        "_blk", F.col("name").alias("name_a"), F.col("n").alias("n_a")
    )
    b = keyed.select(
        "_blk", F.col("name").alias("name_b"), F.col("n").alias("n_b")
    )
    cand = (
        a.join(b, "_blk")
        .filter(F.col("name_a") < F.col("name_b"))
        # free length-band guard BEFORE the dedup shuffle — necessary
        # condition for the distance bound, prunes volume early
        .filter(F.abs(F.length("name_a") - F.length("name_b")) <= max_dist)
        .drop("_blk")
        # Injective pair encoding: a length prefix delimits name_a, so two
        # distinct pairs can never hash to the same key (a separator char
        # occurring IN a name could collide — round-9 advice). Still a
        # 16-byte key on the wire, not the two strings.
        .withColumn(
            "_pk",
            F.unhex(
                F.md5(
                    F.concat(
                        F.lpad(F.length("name_a").cast("string"), 8, "0"),
                        F.col("name_a"),
                        F.col("name_b"),
                    )
                )
            ),
        )
        .dropDuplicates(["_pk"])
        .drop("_pk")
    )
    return (
        cand.withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= max_dist)
        .select("name_a", "name_b", "dist", "n_a", "n_b")
    )
