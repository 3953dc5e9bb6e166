"""Multimodal columns: images/audio/video as opaque binary + typed metadata
(engine extension for LLM-training-data pipelines).

Model: a multimodal asset row is ``(asset_id, modality, content: binary,
meta: struct)``. Content stays opaque to the relational layer — filtering,
routing, dedup and joins use the metadata and content fingerprints; decoding
happens only inside Arrow-batched ``mapInPandas`` operators at the edge.

The decode kernels are REAL: a pure-numpy 24-bit BMP codec (encode + decode
+ nearest-neighbor resize) — BMP is an uncompressed container whose spec
(BITMAPFILEHEADER/BITMAPINFOHEADER, bottom-up rows, 4-byte row padding,
BGR byte order) needs no external library, so feature extraction computes
statistics over ACTUAL decoded pixels end-to-end. Compressed formats
(JPEG/PNG/MP4) would slot into the same kernels via PIL/ffmpeg, which are
not in this container; the codec boundary is ``decode_image`` /
``encode_bmp`` and nothing above it would change.

Scale notes: ``mapInPandas`` streams Arrow record batches — peak executor
memory is O(batch), not O(partition); cap raw asset size per batch via
``spark.sql.execution.arrow.maxRecordsPerBatch`` when assets are large.
Feature extraction keyed by content hash first (dedup before decode) is the
100 TB-scale move: never decode the same bytes twice.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Output schema of the image-feature extractor (mapInPandas contract).
IMAGE_FEATURES_SCHEMA = (
    "asset_id long, modality string, n_bytes long, "
    "width int, height int, mode string, decode_ok boolean, "
    "mean_r double, mean_g double, mean_b double, "
    "top_left_r int, top_left_g int, top_left_b int"
)

_BMP_HEADER_BYTES = 54  # 14 (file header) + 40 (BITMAPINFOHEADER)


def bmp_row_stride(width: int) -> int:
    """Bytes per stored row of a 24bpp BMP: 3·width rounded up to 4."""
    return ((width * 3 + 3) // 4) * 4


def encode_bmp(rgb: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit uncompressed BMP.

    Writes the canonical layout: positive height → rows stored bottom-up,
    each row zero-padded to a 4-byte boundary, pixels in B,G,R byte order.
    """
    h, w, c = rgb.shape
    if c != 3:
        raise ValueError(f"encode_bmp wants (h, w, 3) RGB, got {rgb.shape}")
    stride = bmp_row_stride(w)
    size = _BMP_HEADER_BYTES + stride * h
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM", size, 0, 0, _BMP_HEADER_BYTES,
        40, w, h, 1, 24, 0, stride * h, 2835, 2835, 0, 0,
    )
    rows = np.zeros((h, stride), dtype=np.uint8)
    # RGB -> BGR, top-down -> bottom-up
    rows[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)
    return header + rows.tobytes()


def decode_image(data: bytes | None) -> np.ndarray | None:
    """Decode 24-bit uncompressed BMP bytes to an (h, w, 3) uint8 RGB array
    (top-down row order). Returns None for anything that is not a valid
    24bpp/uncompressed BMP — a bad asset degrades, it never throws.
    """
    if data is None or len(data) < _BMP_HEADER_BYTES or data[:2] != b"BM":
        return None
    try:
        pix_offset = struct.unpack_from("<I", data, 10)[0]
        hdr_size = struct.unpack_from("<I", data, 14)[0]
        w, h_raw = struct.unpack_from("<ii", data, 18)
        bpp = struct.unpack_from("<H", data, 28)[0]
        compression = struct.unpack_from("<I", data, 30)[0]
    except struct.error:
        return None
    if hdr_size < 40 or bpp != 24 or compression != 0 or w <= 0 or h_raw == 0:
        return None
    bottom_up = h_raw > 0
    h = abs(h_raw)
    stride = bmp_row_stride(w)
    if len(data) < pix_offset + stride * h:
        return None
    rows = np.frombuffer(
        data, dtype=np.uint8, count=stride * h, offset=pix_offset
    ).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return rgb[::-1] if bottom_up else rgb


def synthesize_bmp_assets(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Fixture-lake adapter: a deterministic 24-bit BMP per document row.

    Every geometric/color parameter is closed-form in the id, so a DuckDB
    oracle can predict the decoded statistics without decoding anything —
    which is exactly what makes the decode kernel oracle-gatable:

    - ``width  = 4 + id % 13`` (4..16 — exercises all 4-byte paddings),
      ``height = 3 + id % 7``
    - pixel(x, y) = (rb + x, gb + y, bb + x + y) with
      ``rb = id % 200, gb = 7·id % 200, bb = 13·id % 200``
      (max channel value 199 + 15 + 8 = 222 — never wraps mod 256, so
      channel means stay closed-form).

    The gradient is direction-sensitive: a decoder that forgets the
    bottom-up row order, swaps BGR, or mis-strides the padding produces
    wrong top-left pixels / channel means and fails the oracle hash.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, blobs = [], []
            for aid in pdf[id_col]:
                d = int(aid)
                w, h = 4 + d % 13, 3 + d % 7
                rb, gb, bb = d % 200, (7 * d) % 200, (13 * d) % 200
                x = np.arange(w, dtype=np.uint8)
                y = np.arange(h, dtype=np.uint8)[:, None]
                img = np.empty((h, w, 3), dtype=np.uint8)
                img[:, :, 0] = rb + x
                img[:, :, 1] = gb + y
                img[:, :, 2] = bb + x + y
                out_ids.append(d)
                blobs.append(encode_bmp(img))
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(out_ids, dtype="int64"),
                    "modality": pd.Series(
                        ["image"] * len(out_ids), dtype="object"
                    ),
                    "content": pd.Series(blobs, dtype="object"),
                }
            )

    return docs.select(id_col).mapInPandas(
        gen, schema="asset_id long, modality string, content binary"
    )


def documents_as_assets(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Test-lake adapter: wrap document text bytes as binary assets.

    The lake ships no binary column; encoding text to UTF-8 bytes gives a
    real BinaryType column exercising the binary plumbing (transport through
    Arrow, byte-length semantics, content hashing) without a decode step —
    used by the dedup/frame-sampling operators, which never decode.
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
    """Decode kernel: real BMP parse + per-image pixel statistics.

    Undecodable bytes → decode_ok False with NULL geometry/stats (the row
    degrades; the batch survives). Channel means carry the +1e-9 biased
    6 dp rounding from the engine determinism contract.
    """
    n_bytes, widths, heights, modes, oks = [], [], [], [], []
    means = {"r": [], "g": [], "b": []}
    top_left = {"r": [], "g": [], "b": []}
    for blob in content:
        data = bytes(blob) if blob is not None else None
        n_bytes.append(len(data) if data is not None else 0)
        rgb = decode_image(data)
        if rgb is None:
            widths.append(None)
            heights.append(None)
            modes.append(None)
            oks.append(False)
            for ch in ("r", "g", "b"):
                means[ch].append(None)
                top_left[ch].append(None)
            continue
        h, w, _ = rgb.shape
        widths.append(w)
        heights.append(h)
        modes.append("RGB")
        oks.append(True)
        ch_mean = rgb.reshape(-1, 3).mean(axis=0, dtype=np.float64)
        for i, ch in enumerate(("r", "g", "b")):
            means[ch].append(round(float(ch_mean[i]) + 1e-9, 6))
            top_left[ch].append(int(rgb[0, 0, i]))
    return pd.DataFrame(
        {
            "n_bytes": pd.Series(n_bytes, dtype="int64"),
            "width": pd.Series(widths, dtype="Int32"),
            "height": pd.Series(heights, dtype="Int32"),
            "mode": pd.Series(modes, dtype="object"),
            "decode_ok": pd.Series(oks, dtype="bool"),
            "mean_r": pd.Series(means["r"], dtype="float64"),
            "mean_g": pd.Series(means["g"], dtype="float64"),
            "mean_b": pd.Series(means["b"], dtype="float64"),
            "top_left_r": pd.Series(top_left["r"], dtype="Int32"),
            "top_left_g": pd.Series(top_left["g"], dtype="Int32"),
            "top_left_b": pd.Series(top_left["b"], dtype="Int32"),
        }
    )


def extract_image_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary content (mapInPandas).

    One pass, no shuffle; runs the real decode kernel per Arrow batch on
    the executors.
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

    The "frame" is a deterministic byte slice at idx/n through the content
    (a real container demuxer — ffmpeg, absent here — would replace only
    the slicing line); batch shapes, binary transport, and expansion
    factors are all real.

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
    "resized_bytes long, resize_ok boolean, "
    "mean_r double, mean_g double, mean_b double, "
    "top_left_r int, top_left_g int, top_left_b int"
)


def resize_images(
    assets: DataFrame,
    target_w: int = 224,
    target_h: int = 224,
) -> DataFrame:
    """Real image resize: decode BMP → nearest-neighbor resample → re-encode.

    Nearest-neighbor uses the canonical floor mapping
    ``src = floor(dst · src_dim / target_dim)`` (numpy fancy-indexing, one
    gather per axis — no Python pixel loop). Output carries the re-encoded
    byte size plus pixel statistics of the RESIZED image, so an oracle with
    a closed-form source image can verify the resample indexing itself, not
    just that bytes moved. Undecodable content → resize_ok False, NULLs.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_in, n_out, oks = [], [], []
            means = {"r": [], "g": [], "b": []}
            top_left = {"r": [], "g": [], "b": []}
            for blob in pdf["content"]:
                data = bytes(blob) if blob is not None else None
                n_in.append(len(data) if data is not None else 0)
                rgb = decode_image(data)
                if rgb is None:
                    n_out.append(None)
                    oks.append(False)
                    for ch in ("r", "g", "b"):
                        means[ch].append(None)
                        top_left[ch].append(None)
                    continue
                h, w, _ = rgb.shape
                ys = (np.arange(target_h) * h) // target_h
                xs = (np.arange(target_w) * w) // target_w
                resized = rgb[ys][:, xs]
                n_out.append(len(encode_bmp(resized)))
                oks.append(True)
                ch_mean = resized.reshape(-1, 3).mean(axis=0, dtype=np.float64)
                for i, ch in enumerate(("r", "g", "b")):
                    means[ch].append(round(float(ch_mean[i]) + 1e-9, 6))
                    top_left[ch].append(int(resized[0, 0, i]))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].astype("int64"),
                    "n_bytes": pd.Series(n_in, dtype="int64"),
                    "target_w": pd.Series([target_w] * len(n_in), dtype="int32"),
                    "target_h": pd.Series([target_h] * len(n_in), dtype="int32"),
                    "resized_bytes": pd.Series(n_out, dtype="Int64"),
                    "resize_ok": pd.Series(oks, dtype="bool"),
                    "mean_r": pd.Series(means["r"], dtype="float64"),
                    "mean_g": pd.Series(means["g"], dtype="float64"),
                    "mean_b": pd.Series(means["b"], dtype="float64"),
                    "top_left_r": pd.Series(top_left["r"], dtype="Int32"),
                    "top_left_g": pd.Series(top_left["g"], dtype="Int32"),
                    "top_left_b": pd.Series(top_left["b"], dtype="Int32"),
                }
            )

    return assets.mapInPandas(_resize, schema=RESIZE_SCHEMA)


# ---------------------------------------------------------------------------
# Audio modality: pure-numpy PCM WAV codec (RIFF header + int16 samples —
# public spec, same no-external-library pattern as the BMP codec above).
# Compressed audio (MP3/FLAC/Opus) would slot in via ffmpeg at the
# encode_wav/decode_audio boundary; nothing above it changes.
# ---------------------------------------------------------------------------

AUDIO_FEATURES_SCHEMA = (
    "asset_id long, n_bytes long, decode_ok boolean, "
    "sample_rate int, n_channels int, n_samples long, "
    "duration_s double, rms double, peak int, clipping_ratio double"
)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 PCM samples ((n,) mono or (n, channels)) as a RIFF/WAVE
    file: 44-byte canonical header (fmt chunk: PCM, 16-bit, little-endian)
    followed by interleaved frames."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n_frames, n_ch = s.shape
    data = s.tobytes()
    block_align = n_ch * 2
    header = struct.pack(
        "<4sI4s" "4sIHHIIHH" "4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, n_ch, sample_rate,
        sample_rate * block_align, block_align, 16,
        b"data", len(data),
    )
    return header + data


def decode_audio(data: bytes | None) -> tuple[np.ndarray, int] | None:
    """Decode 16-bit PCM RIFF/WAVE bytes to ((n_frames, n_channels) int16,
    sample_rate). Walks the chunk list (fmt may not be first; extra chunks
    like LIST are skipped, as the spec allows). Returns None for anything
    that is not 16-bit uncompressed PCM — a bad asset degrades, it never
    throws."""
    if data is None or len(data) < 44:
        return None
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos, end = 12, len(data)
    rate = n_ch = None
    raw = None
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > end:
            return None
        if cid == b"fmt ":
            if size < 16:
                return None
            fmt_code, n_ch, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", data, body
            )
            if fmt_code != 1 or bits != 16 or n_ch < 1:
                return None
        elif cid == b"data":
            raw = data[body : body + size]
        pos = body + size + (size & 1)  # chunks are word-aligned
    if rate is None or raw is None:
        return None
    frame_bytes = n_ch * 2
    n_frames = len(raw) // frame_bytes
    if n_frames == 0:
        return None
    samples = np.frombuffer(
        raw, dtype="<i2", count=n_frames * n_ch
    ).reshape(n_frames, n_ch)
    return samples, rate


def synthesize_wav_assets(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Fixture-lake adapter: a deterministic mono PCM clip per document row,
    pure integer arithmetic so a DuckDB oracle can recompute every decoded
    statistic exactly (the audio twin of ``synthesize_bmp_assets``):

    - ``n  = 800 + (id % 101) * 4`` samples, ``rate = 8000 + (id % 3) * 4000``
    - ``raw(i) = ((i * step + id) % 90001) - 45000`` with
      ``step = id % 23 + 2`` — a deterministic overdriven sawtooth whose
      range (±45000) exceeds int16, so ``clamp(raw, -32768, 32767)``
      produces REAL full-scale clipping for the clipping-ratio stat.

    Sums of squares stay inside int64 (≤ 1200 · 32768² ≈ 1.3e12), so RMS
    is bit-identical across engines before the shared 6 dp rounding.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, blobs = [], []
            for aid in pdf[id_col]:
                d = int(aid)
                n = 800 + (d % 101) * 4
                rate = 8000 + (d % 3) * 4000
                step = d % 23 + 2
                i = np.arange(n, dtype=np.int64)
                raw = (i * step + d) % 90001 - 45000
                s = np.clip(raw, -32768, 32767).astype(np.int16)
                out_ids.append(d)
                blobs.append(encode_wav(s, rate))
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(out_ids, dtype="int64"),
                    "modality": pd.Series(
                        ["audio"] * len(out_ids), dtype="object"
                    ),
                    "content": pd.Series(blobs, dtype="object"),
                }
            )

    return docs.select(id_col).mapInPandas(
        gen, schema="asset_id long, modality string, content binary"
    )


def extract_audio_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched audio feature extraction: real RIFF parse per batch on
    the executors — duration, RMS, peak, full-scale clipping ratio over the
    ACTUAL decoded samples. Undecodable bytes → decode_ok False with NULL
    stats. One pass, no shuffle; dedup by content hash first
    (``dedup_assets_by_content``) so identical clips never decode twice.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes, oks = [], []
            rates, chans, counts = [], [], []
            durs, rmss, peaks, clips = [], [], [], []
            for blob in pdf["content"]:
                data = bytes(blob) if blob is not None else None
                n_bytes.append(len(data) if data is not None else 0)
                decoded = decode_audio(data)
                if decoded is None:
                    oks.append(False)
                    for lst in (rates, chans, counts, durs, rmss, peaks, clips):
                        lst.append(None)
                    continue
                samples, rate = decoded
                n_frames, n_ch = samples.shape
                flat = samples.astype(np.int64).ravel()
                oks.append(True)
                rates.append(rate)
                chans.append(n_ch)
                counts.append(n_frames)
                durs.append(round(n_frames / rate + 1e-9, 6))
                rmss.append(
                    round(float(np.sqrt((flat * flat).sum() / flat.size)) + 1e-9, 6)
                )
                peaks.append(int(np.abs(flat).max()))
                n_clip = int(((flat == 32767) | (flat == -32768)).sum())
                clips.append(round(n_clip / flat.size + 1e-9, 6))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].astype("int64"),
                    "n_bytes": pd.Series(n_bytes, dtype="int64"),
                    "decode_ok": pd.Series(oks, dtype="bool"),
                    "sample_rate": pd.Series(rates, dtype="Int32"),
                    "n_channels": pd.Series(chans, dtype="Int32"),
                    "n_samples": pd.Series(counts, dtype="Int64"),
                    "duration_s": pd.Series(durs, dtype="float64"),
                    "rms": pd.Series(rmss, dtype="float64"),
                    "peak": pd.Series(peaks, dtype="Int32"),
                    "clipping_ratio": pd.Series(clips, dtype="float64"),
                }
            )

    return assets.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


AUDIO_WINDOWS_SCHEMA = (
    "asset_id long, win_idx int, n_in_win long, rms double, peak int"
)


def audio_window_features(
    assets: DataFrame, window_samples: int = 256
) -> DataFrame:
    """Windowed audio analytics: decode once, then emit one row per
    fixed-size sample window (frame) with per-window RMS and peak — the
    framing step in front of VAD / silence trimming / segment-level
    quality filters. The audio twin of video ``sample_frames``.

    Row expansion happens streaming per Arrow batch (like
    ``sample_frames``): output rows = ceil(n_samples / window) × clips,
    peak memory O(batch). Channels fold together per window (frame-level
    energy, the VAD convention). Undecodable clips emit nothing — route
    them via ``extract_audio_features.decode_ok`` instead.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, counts, rmss, peaks = [], [], [], [], []
            for aid, blob in zip(pdf["asset_id"], pdf["content"]):
                decoded = decode_audio(
                    bytes(blob) if blob is not None else None
                )
                if decoded is None:
                    continue
                samples, _rate = decoded
                flat = samples.astype(np.int64).ravel()
                per_win = window_samples * samples.shape[1]
                for w in range(0, (len(flat) + per_win - 1) // per_win):
                    seg = flat[w * per_win : (w + 1) * per_win]
                    ids.append(int(aid))
                    idxs.append(w)
                    counts.append(len(seg))
                    rmss.append(
                        round(
                            float(np.sqrt((seg * seg).sum() / len(seg)))
                            + 1e-9,
                            6,
                        )
                    )
                    peaks.append(int(np.abs(seg).max()))
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "win_idx": pd.Series(idxs, dtype="int32"),
                    "n_in_win": pd.Series(counts, dtype="int64"),
                    "rms": pd.Series(rmss, dtype="float64"),
                    "peak": pd.Series(peaks, dtype="Int32"),
                }
            )

    return assets.mapInPandas(run, schema=AUDIO_WINDOWS_SCHEMA)
