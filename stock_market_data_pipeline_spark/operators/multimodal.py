"""Multimodal columns: images/audio/video as opaque binary + typed metadata
(engine extension for LLM-training-data pipelines).

Model: a multimodal asset row is ``(asset_id, modality, content: binary,
meta: struct)``. Content stays opaque to the relational layer — filtering,
routing, dedup and joins use the metadata and content fingerprints; decoding
happens only inside Arrow-batched ``mapInPandas`` operators at the edge.

The heavy libraries (PIL/ffmpeg/torchaudio) are NOT in this container, so the
decode kernels are STUBS behind ``_HAS_*`` guards with a deterministic fake
path (clearly marked) — but everything Spark-side is real and tested: the
schema contract, the binary plumbing, the Arrow batch shapes, partition
behavior, and the UDF signatures. Swapping a real decoder in changes only
the body of ``_decode_image_batch``.

Scale notes: ``mapInPandas`` streams Arrow record batches — peak executor
memory is O(batch), not O(partition); cap raw asset size per batch via
``spark.sql.execution.arrow.maxRecordsPerBatch`` when assets are large.
Feature extraction keyed by content hash first (dedup before decode) is the
100 TB-scale move: never decode the same bytes twice.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

# Output schema of the image-feature extractor (mapInPandas contract).
IMAGE_FEATURES_SCHEMA = (
    "asset_id long, modality string, n_bytes long, "
    "width int, height int, mode string, decode_ok boolean"
)


def documents_as_assets(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Test-lake adapter: wrap document text bytes as binary 'image' assets.

    The lake ships no binary column; encoding text to UTF-8 bytes gives a
    real BinaryType column exercising the exact same plumbing (binary
    transport through Arrow, byte-length semantics) a real asset table has.
    """
    return docs.select(
        F.col(id_col).alias("asset_id"),
        F.lit("image").alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.col("source").alias("origin"), F.col("lang").alias("tag")
        ).alias("meta"),
    )


def _decode_image_batch(content: pd.Series) -> pd.DataFrame:
    """Decode kernel. Real path requires PIL (absent here → stub).

    STUB: deterministic fake geometry derived from byte length — keeps the
    full pipeline runnable/testable; replace the body with ``Image.open``
    when PIL is available.
    """
    n = content.str.len().astype("int64")
    if _HAS_PIL:  # pragma: no cover - library absent in this container
        raise NotImplementedError(
            "real decode path intentionally unimplemented in this build"
        )
    return pd.DataFrame(
        {
            "n_bytes": n,
            "width": (n % 640).astype("int32"),
            "height": (n % 480).astype("int32"),
            "mode": pd.Series(["RGB"] * len(n), dtype="object"),
            "decode_ok": n > 0,
        }
    )


def extract_image_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary content (mapInPandas).

    One pass, no shuffle; runs the decode kernel per Arrow batch on the
    executors.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _decode_image_batch(pdf["content"])
            out = pd.concat(
                [pdf[["asset_id", "modality"]].reset_index(drop=True), feats],
                axis=1,
            )
            yield out

    return assets.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def dedup_assets_by_content(assets: DataFrame) -> DataFrame:
    """Content-hash dedup BEFORE decode — the never-decode-twice rule.

    Output: one canonical asset per distinct content (min asset_id), with
    dup_count. md5 runs JVM-side on the binary column.
    """
    return (
        assets.select(
            F.md5(F.col("content")).alias("content_hash"), F.col("asset_id")
        )
        .groupBy("content_hash")
        .agg(
            F.min("asset_id").alias("canonical_asset_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


# (asset_id, frame_idx, frame_bytes, frame_ok) — frame-sampling contract.
FRAME_SAMPLE_SCHEMA = (
    "asset_id long, frame_idx int, frame_bytes binary, frame_ok boolean"
)


def sample_frames(
    assets: DataFrame,
    n_frames: int = 4,
    id_col: str = "asset_id",
) -> DataFrame:
    """Video frame sampling plumbing: each asset expands to ``n_frames``
    evenly-spaced (asset, frame_idx, frame_bytes) rows — the row-expansion
    contract every video-training pipeline needs before per-frame feature
    extraction.

    Decode is the stubbed kernel (no ffmpeg in this container): the fake
    "frame" is a deterministic byte slice at idx/n through the content, so
    batch shapes, binary transport, and expansion factors are all real.
    Swapping a real extractor changes only ``_extract``.

    Scale shape: ``mapInPandas`` row expansion — output rows = n_frames ×
    input rows, produced streaming per Arrow batch (no explode of
    pre-materialized frame arrays, so peak memory stays O(batch) even for
    megabyte frames); downstream repartitions by (asset, frame) only if a
    shuffle-bearing op follows.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, oks = [], [], [], []
            for aid, content in zip(pdf[id_col], pdf["content"]):
                data = bytes(content) if content is not None else b""
                for i in range(n_frames):
                    start = (len(data) * i) // n_frames
                    end = (len(data) * (i + 1)) // n_frames
                    ids.append(aid)
                    idxs.append(i)
                    frames.append(data[start:end])
                    oks.append(end > start)
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_bytes": pd.Series(frames, dtype="object"),
                    "frame_ok": pd.Series(oks, dtype="bool"),
                }
            )

    return assets.mapInPandas(_extract, schema=FRAME_SAMPLE_SCHEMA)


RESIZE_SCHEMA = (
    "asset_id long, n_bytes long, target_w int, target_h int, "
    "resized_bytes long, resize_ok boolean"
)


def resize_images(
    assets: DataFrame,
    target_w: int = 224,
    target_h: int = 224,
) -> DataFrame:
    """Image resize plumbing (stub kernel — no PIL): emits per-asset resize
    bookkeeping with a deterministic fake output size (capped proportional
    model). The real kernel replaces ``_resize`` with ``Image.resize`` +
    re-encode; everything else (Arrow batching, schema, QA columns) stands.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL content → length 0, resize_ok False — a bad row degrades,
            # it must never kill the batch (.str.len() yields NaN for nulls,
            # which a bare astype('int64') refuses).
            n = pdf["content"].str.len().fillna(0).astype("int64")
            est = (n * 3 // 4).clip(upper=target_w * target_h * 3)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].astype("int64"),
                    "n_bytes": n,
                    "target_w": pd.Series([target_w] * len(n), dtype="int32"),
                    "target_h": pd.Series([target_h] * len(n), dtype="int32"),
                    "resized_bytes": est,
                    "resize_ok": n > 0,
                }
            )

    return assets.mapInPandas(_resize, schema=RESIZE_SCHEMA)
