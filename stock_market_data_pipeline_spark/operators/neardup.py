"""Near-duplicate detection for LLM-training corpora: MinHash+LSH, exact
n-gram Jaccard, SimHash (engine extension; no counterpart in the reference).

Design for 100 TB:

* All hashing is md5/bit arithmetic on JVM built-ins — no UDFs, no Python in
  the data path, and deterministic across engines (the DuckDB oracle
  reproduces signatures bit-for-bit).
* MinHash signatures form in ONE shuffle: explode distinct shingles, then a
  single groupBy(doc) with P ``min`` aggregates (map-side combine means the
  shuffle carries one partial signature per doc per mapper, not shingles).
* Candidate generation is the LSH band join — an equi-join on (band,
  band_hash), never an all-pairs product. Est-Jaccard verification happens
  only on candidates.
* The exact-Jaccard path bounds its inverted-index join with a document
  frequency cap (``max_doc_freq``): ultra-common shingles generate O(df²)
  candidate pairs and no near-dup signal — dropping them is both the
  standard trick and the scale guard (cf. stop-shingles in text dedup).

Default MinHash geometry: 12 permutations = 4 bands × 3 rows — the LSH
s-curve midpoint (1/4)^(1/3) ≈ 0.63 Jaccard, the usual near-dup zone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.operators.dedup import normalize_text
from stock_market_data_pipeline_spark.utils import round_det

NUM_PERM = 12
LSH_BANDS = 4
LSH_ROWS = 3  # NUM_PERM = LSH_BANDS * LSH_ROWS
SIMHASH_BITS = 16

# Kirsch-Mitzenmacher permutation family: g_p(s) = (h1(s) + p·h2(s)) mod M,
# h1/h2 = the two 56-bit halves of ONE md5(s) digest, M the largest prime
# below 2^56. Bounds: h1 + 11·h2 < 12·2^56 < 2^63, so every intermediate
# fits a signed 64-bit integer — Spark bigint and DuckDB BIGINT compute the
# identical value (DuckDB *errors* on BIGINT overflow rather than wrapping,
# so staying under 2^63 is correctness, not just portability).
MINHASH_PRIME = 72057594037927931  # 2^56 - 5


def shingle_df(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """(id, shingle) rows: distinct word k-grams of the normalized text.

    Documents with fewer than k tokens produce no rows (no valid shingle).
    """
    toks = F.split(normalize_text(text_col), " ")
    starts = F.sequence(F.lit(1), F.size(toks) - F.lit(k - 1))
    shingles = F.transform(starts, lambda i: F.array_join(F.slice(toks, i, k), " "))
    return (
        df.filter(F.size(toks) >= k)
        .select(F.col(id_col), F.explode(F.array_distinct(shingles)).alias("shingle"))
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = NUM_PERM,
    k: int = 3,
    widen: bool = True,
) -> DataFrame:
    """Per-doc MinHash signature: columns mh_0..mh_{P-1} (bigint).

    Each distinct shingle is md5-hashed ONCE; permutation p's value derives
    by integer mixing of the digest's two 56-bit halves
    (``(h1 + p·h2) mod MINHASH_PRIME`` — the Kirsch-Mitzenmacher double-hash
    family, whose min-wise analysis needs the prime modulus). That cuts the
    crypto-hash cost P× vs hashing per permutation while every engine still
    computes the identical signature (the DuckDB oracle reproduces it
    bit-for-bit: same md5, same hex slices, same 64-bit arithmetic).

    ``widen=True`` round-robins the documents across all cores BEFORE
    shingling: an under-split input (one parquet file → one scan split, or an
    AQE-coalesced join output) would otherwise tokenize/explode/hash on one
    core. Exchanging whole documents is cheaper than exchanging their
    exploded shingles (measured 4.5× on the warm path), and the groupBy
    below then ships only map-side-combined partial signatures — P bigints
    per doc per mapper. On a well-split 100 TB scan, pass ``widen=False`` to
    skip the exchange. (Deliberately a static flag, not a
    ``df.rdd.getNumPartitions()`` probe: under AQE, ``.rdd`` on a derived
    plan eagerly executes its query stages — measured +2 s re-running the
    whole upstream curation pipeline just to read the partition count.)
    """
    if widen:
        df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    sh = shingle_df(df, id_col, text_col, k)
    digest = F.md5(F.col("shingle"))
    h1 = F.conv(F.substring(digest, 1, 14), 16, 10).cast("bigint")
    h2 = F.conv(F.substring(digest, 15, 14), 16, 10).cast("bigint")
    hashed = sh.select(F.col(id_col), h1.alias("_h1"), h2.alias("_h2"))
    aggs = [
        F.min(
            (F.col("_h1") + F.lit(p) * F.col("_h2")) % F.lit(MINHASH_PRIME)
        ).alias(f"mh_{p}")
        for p in range(num_perm)
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = NUM_PERM,
    bands: int = LSH_BANDS,
    k: int = 3,
    widen: bool = True,
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding + estimated Jaccard.

    Output: (doc_a, doc_b, est_jaccard) for every distinct pair sharing at
    least one band; est_jaccard = matching signature components / P.
    """
    rows = num_perm // bands
    sig = minhash_signatures(df, id_col, text_col, num_perm, k, widen=widen)
    sig_arr = sig.select(
        F.col(id_col),
        F.array(*[F.col(f"mh_{p}") for p in range(num_perm)]).alias("sig"),
        F.array(
            *[
                F.md5(
                    F.concat_ws(
                        "|", *[F.col(f"mh_{b * rows + r}") for r in range(rows)]
                    )
                )
                for b in range(bands)
            ]
        ).alias("band_hashes"),
    )
    # Carry the signature arrays THROUGH the band join: the alternative
    # (join candidate pairs back to the signature relation twice, once per
    # side) re-evaluates the signature aggregate two more times and adds two
    # shuffled joins keyed on doc ids. The band rows are wider here — 12
    # bigints ≈ 100 bytes per (doc, band) row crossing the band exchange —
    # but the est-Jaccard is then a pure projection off the join output.
    band_rows = sig_arr.select(
        F.col(id_col),
        F.col("sig"),
        F.posexplode("band_hashes").alias("band", "band_hash"),
    )
    a, b = band_rows.alias("a"), band_rows.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()  # pairs sharing several bands collapse to one row
    )
    matches = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m)
    )
    return cand.select(
        "doc_a",
        "doc_b",
        round_det(matches / F.lit(float(num_perm)), 6).alias("est_jaccard"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int = 50,
) -> DataFrame:
    """Exact n-gram Jaccard over inverted-index candidates.

    Pairs sharing ≥1 shingle (after the document-frequency cap) are scored
    |A∩B| / (|A|+|B|−|A∩B|); pairs below ``threshold`` are dropped.
    ``max_doc_freq`` is the scale guard: a shingle present in df documents
    contributes df·(df−1)/2 candidate pairs.
    """
    sh = shingle_df(df, id_col, text_col, k)
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    keep = freq.filter((F.col("df") >= 2) & (F.col("df") <= max_doc_freq)).select("shingle")
    sh_kept = sh.join(keep, "shingle")
    a, b = sh_kept.alias("a"), sh_kept.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    na = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_shingles").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_shingles").alias("n_b"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            round_det(
                F.col("inter")
                / (F.col("n_a") + F.col("n_b") - F.col("inter")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _word_hash16(x: F.Column) -> F.Column:
    """Deterministic 16-bit token hash: first 4 hex chars of md5."""
    return F.conv(F.substring(F.md5(x), 1, 4), 16, 10).cast("int")


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """Per-doc SimHash over word tokens (with multiplicity).

    Bit b of the fingerprint is the sign of Σ_tokens (±1 by bit b of the
    token hash). Near-identical token multisets land within small Hamming
    distance. One narrow projection — no shuffle.
    """
    words = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
    # Hash each token ONCE, then exchange: the repartition is both the
    # parallelism fix (a single parquet file arrives as one input split —
    # per-row crypto hashing would otherwise run on one core) and an
    # optimizer barrier (CollapseProject would otherwise inline the md5
    # transform into all 16 bit-aggregates below, recomputing it 16×; lambda
    # expressions don't participate in subexpression elimination).
    hashed = df.select(
        F.col(id_col), F.transform(words, _word_hash16).alias("hs")
    ).repartition(df.sparkSession.sparkContext.defaultParallelism)

    def _vote(b: int):
        def merge(acc: F.Column, h: F.Column) -> F.Column:
            return acc + (F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1)

        return merge

    bit_votes = [F.aggregate(F.col("hs"), F.lit(0), _vote(b)) for b in range(bits)]
    sim = None
    for b, vote in enumerate(bit_votes):
        term = F.when(vote > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = term if sim is None else (sim + term)
    return hashed.select(F.col(id_col), sim.alias("simhash"))


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = SIMHASH_BITS,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash banding: docs sharing the high or low byte
    are candidates; pairs within ``max_hamming`` bits survive.

    The two-band equi-join replaces the OR-predicate self-join (which would
    nested-loop); it guarantees recall for Hamming ≤ 1 within a byte split
    and high recall for small distances, the standard SimHash bucketing.
    """
    s = simhash(df, id_col, text_col, bits)
    half = bits // 2
    bands = s.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.array(
                F.shiftright("simhash", half),
                F.col("simhash").bitwiseAND(F.lit((1 << half) - 1)),
            )
        ).alias("band", "band_val"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def neardup_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.75,
    max_iter: int = 25,
    widen: bool = True,
    reliable: bool = False,
) -> DataFrame:
    """Connected components over the MinHash-LSH near-dup graph: every doc
    labeled with the smallest doc id reachable through pairs with
    ``est_jaccard >= threshold`` (singletons label themselves).

    This is the operator that turns pairwise near-dup *detection* into
    near-dup *group* handling (keep one per cluster, audit clusters, etc.) —
    pairwise removal alone under-deletes transitive chains (a~b, b~c, a≁c).

    Algorithm: iterative min-label propagation — labels start as node ids;
    each round every node takes min(own label, neighbors' labels) until a
    fixpoint. Converges in O(graph diameter) rounds; near-dup clusters are
    short chains (diameter rarely exceeds a few hops), so this beats the
    O(log n)-but-heavier large-star/small-star alternating scheme in
    practice — and only the EDGE ENDPOINT nodes (a vanishing fraction of a
    100 TB corpus) enter the loop at all; non-candidate docs join back as
    self-labeled singletons in one final broadcast-ish left join.

    Driver-side per-iteration work is ONE scalar (the changed-label count);
    ``localCheckpoint`` truncates lineage each round so plan depth stays
    constant. Iterative fixpoint → genuinely non-single-SQL; the DuckDB
    oracle uses a recursive CTE (transitive closure), feasible because
    near-dup clusters are tiny — the Spark path never materializes closures.
    """
    pairs = minhash_lsh_pairs(
        df, id_col, text_col, widen=widen
    ).filter(F.col("est_jaccard") >= threshold)
    comp = connected_components(pairs, max_iter=max_iter, reliable=reliable)
    return df.select(F.col(id_col)).join(
        comp, df[id_col] == comp.node, "left"
    ).select(
        F.col(id_col),
        F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
    reliable: bool = False,
) -> DataFrame:
    """Min-label propagation over an undirected pair list → (node,
    cluster_id = min node id in the component). Only edge-endpoint nodes
    appear in the output (callers re-attach singletons with a left join).

    ``reliable`` picks the lineage-truncation strategy for the loop:

    - ``False`` (default): ``localCheckpoint`` — materializes to *executor*
      block storage. Fastest, but on a multi-node cluster a lost executor
      invalidates the truncated lineage mid-loop and kills the job (there is
      no upstream plan left to recompute from). Fine for short jobs and
      local mode.
    - ``True``: eager ``checkpoint()`` to the session's *reliable* checkpoint
      directory (HDFS/S3 on a real cluster — set it with
      ``spark.sparkContext.setCheckpointDir``). Each round costs an extra
      write+read of the label set (tiny: edge endpoints only), and the loop
      survives executor loss. Use for long-running runs at scale. If no
      checkpoint dir is configured, one is created under the JVM's temp dir
      so local callers don't have to bother — on a cluster you *must* point
      it at shared storage for the resilience to be real.

    See :func:`neardup_clusters` for the convergence/scale discussion.
    """
    if reliable:
        sc = pairs.sparkSession.sparkContext
        if sc._jsc.sc().getCheckpointDir().isEmpty():
            import tempfile

            sc.setCheckpointDir(
                tempfile.mkdtemp(prefix="spark-cc-checkpoint-")
            )

        def _truncate(df: DataFrame) -> DataFrame:
            return df.checkpoint(eager=True)

    else:

        def _truncate(df: DataFrame) -> DataFrame:
            return df.localCheckpoint()

    half = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    edges = _truncate(
        half.union(
            half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    )

    labels = _truncate(
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        # Carry the convergence flag THROUGH the checkpoint: the changed
        # probe then reads materialized partitions instead of re-running the
        # propagation join a second time per round (one job per iteration,
        # not two).
        stepped = _truncate(
            labels.join(nbr, labels.node == nbr.src, "left").select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("_changed"),
            )
        )
        changed = stepped.filter(F.col("_changed")).limit(1).count()
        labels = stepped.drop("_changed")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations "
            f"(pathological cluster diameter — raise max_iter)"
        )
    return labels.select("node", F.col("label").alias("cluster_id"))


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.6,
    max_doc_freq: int = 50,
) -> DataFrame:
    """Shingle-containment near-dup pairs: score |A∩B| / min(|A|, |B|) —
    the asymmetric companion to :func:`ngram_jaccard_pairs` that catches a
    SHORT document embedded in a much longer one (quote farms, boilerplate
    wrappers, doc-in-doc scrapes), where Jaccard ≈ |A|/|B| → 0 hides the
    copy entirely.

    Same inverted-index candidate generation and ``max_doc_freq`` pair-
    explosion guard as the Jaccard scorer: candidates come from a shingle
    equi-join (never all-pairs), the intersection count and both set sizes
    ride id-keyed aggregates, and text never crosses a shuffle.
    """
    sh = shingle_df(df, id_col, text_col, k)
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    keep = freq.filter(
        (F.col("df") >= 2) & (F.col("df") <= max_doc_freq)
    ).select("shingle")
    sh_kept = sh.join(keep, "shingle")
    a, b = sh_kept.alias("a"), sh_kept.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    na = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_shingles").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_shingles").alias("n_b"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "inter",
            "n_a",
            "n_b",
            round_det(
                F.col("inter") / F.least("n_a", "n_b").cast("double"), 6
            ).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )
