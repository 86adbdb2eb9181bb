"""Multimodal column plumbing (EXT; SURVEY.md §7 Phase 4).

Images/audio/video are opaque ``binary`` columns with typed metadata.
The Spark-side plumbing here is real and tested — schema, Arrow batch
shape, mapInPandas signature, partitioning — while the actual media
decode is STUBBED (this container ships no image/audio libraries): the
decoder derives deterministic fake dimensions from the payload bytes so
oracles can verify the pipeline end to end.  Swapping in PIL/ffmpeg is a
one-function change (``_decode_stub``), nothing in the plan changes.

Scale notes: binary payloads ride Arrow batches into Python only inside
mapInPandas (batched, zero-copy); metadata extraction that does NOT need
the bytes (length, content hash) stays JVM-side.  Partition sizing for
blob columns: keep spark.sql.files.maxPartitionBytes moderate so a
partition of blobs fits executor memory."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

DECODED_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def _decode_stub(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: dimensions derived from byte length.
    Replace with a real decoder (PIL / torchaudio / pyav) in production —
    the signature (bytes -> metadata tuple) is the extension point."""
    n = len(payload)
    width = 64 + (n % 577)
    height = 64 + (n % 311)
    n_frames = 1 + (n % 7)
    return width, height, n_frames


def attach_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stand-in media ingestion: the document text utf-8 encoded as the
    opaque blob (real pipelines read blob columns from parquet the same
    way)."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def decode_metadata(with_payload: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas decode: Arrow-batched binary in, typed metadata out.
    One Python crossing for the whole pipeline; everything before and
    after stays in the JVM."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [_decode_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "n_frames": [m[2] for m in meta],
                }
            )

    return with_payload.select(id_col, "payload").mapInPandas(
        _decode, schema=DECODED_META_SCHEMA
    )


def sample_frames(meta: DataFrame, every_nth: int = 2) -> DataFrame:
    """Frame sampling plan: one row per kept frame (frame_idx 0, n, 2n …)
    from decoded metadata.  The explode is JVM-side — Python was only
    needed for the decode itself; a real pipeline would then mapInPandas
    the kept (doc_id, frame_idx) list back through the decoder to pull
    pixel data."""
    return meta.select(
        "doc_id",
        "n_frames",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))
        ).alias("frame_idx"),
    )


def resize_metadata(meta: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning (stub): target dimensions preserving aspect ratio,
    clamped to max_side.  Pure column arithmetic — the actual pixel
    resample would live in the same mapInPandas as the decoder."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return meta.select(
        "doc_id",
        "width",
        "height",
        F.floor(F.col("width") * scale).cast("int").alias("target_w"),
        F.floor(F.col("height") * scale).cast("int").alias("target_h"),
    )


FEATURE_DIM = 16


def extract_features(with_payload: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Feature extraction stub with real plumbing: a 16-bucket normalized
    byte histogram per payload (the stand-in for an image/audio feature
    net), computed in the same Arrow-batched mapInPandas crossing as the
    decoder.  Returns (doc_id, features: array<double>)."""
    import numpy as np
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType
    from collections.abc import Iterator

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("features", ArrayType(DoubleType())),
        ]
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                b = np.frombuffer(p, dtype=np.uint8)
                hist = np.bincount(b % FEATURE_DIM, minlength=FEATURE_DIM).astype("float64")
                # no numpy rounding: np.round is half-to-even, Spark/DuckDB round
                # half-away — the query rounds JVM-side instead
                feats.append((hist / max(1.0, hist.sum())).tolist())
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "features": feats}
            )

    return with_payload.select(id_col, "payload").mapInPandas(_extract, schema=schema)


AUDIO_ENERGY_SCHEMA = "doc_id bigint, n_windows int, total_energy bigint, max_energy bigint"


def audio_window_energy(
    with_payload: DataFrame, frame_bytes: int = 16, id_col: str = "doc_id"
) -> DataFrame:
    """Audio-style framing: the opaque blob is cut into fixed
    ``frame_bytes`` windows (dropping the trailing partial frame, as a
    PCM framer would) and each window's energy = Σ byte² is computed
    vectorized in numpy — the mapInPandas shape real feature extraction
    (MFCC/spectrogram) uses, with the arithmetic kept deterministic so
    the DuckDB oracle can verify the Python path bit-for-bit.

    One Arrow crossing; per-doc aggregates come back tiny (4 ints/doc).
    """
    import numpy as np

    def _energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "n_windows": [], "total_energy": [], "max_energy": []}
            for did, payload in zip(pdf[id_col], pdf["payload"]):
                buf = np.frombuffer(payload, dtype=np.uint8)
                w = len(buf) // frame_bytes
                frames = buf[: w * frame_bytes].astype(np.int64).reshape(w, frame_bytes)
                energies = (frames * frames).sum(axis=1)
                out["doc_id"].append(did)
                out["n_windows"].append(w)
                out["total_energy"].append(int(energies.sum()) if w else 0)
                out["max_energy"].append(int(energies.max()) if w else 0)
            yield pd.DataFrame(out)

    return with_payload.select(id_col, "payload").mapInPandas(
        _energy, schema=AUDIO_ENERGY_SCHEMA
    )


BYTE_CLASS_SCHEMA = "doc_id bigint, n_bytes int, n_ws int, n_digit int, n_alpha int"


def byte_class_profile(with_payload: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-blob byte-class census over ``mapInArrow`` — the zero-copy
    Arrow RecordBatch surface (one step lower than mapInPandas: no
    pandas materialization, the numpy views alias the Arrow buffers).
    This is the crossing real byte-level feature extractors (magic-
    number sniffing, entropy coding stats, container demuxing) should
    use for opaque media columns: per-batch vectorized, nothing
    row-at-a-time, and no pandas object-boxing of the blobs.

    Counts whitespace / digit / alpha bytes so the DuckDB oracle can
    verify the Arrow path bit-for-bit on ASCII fixtures.
    """
    import numpy as np
    import pyarrow as pa

    def _census(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            payloads = batch.column(1)
            n_bytes, n_ws, n_digit, n_alpha = [], [], [], []
            for i in range(batch.num_rows):
                buf = np.frombuffer(payloads[i].as_py(), dtype=np.uint8)
                n_bytes.append(buf.size)
                n_ws.append(int(np.isin(buf, (9, 10, 13, 32)).sum()))
                n_digit.append(int(((buf >= 48) & (buf <= 57)).sum()))
                n_alpha.append(
                    int((((buf >= 65) & (buf <= 90)) | ((buf >= 97) & (buf <= 122))).sum())
                )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.int64()),
                    pa.array(n_bytes, type=pa.int32()),
                    pa.array(n_ws, type=pa.int32()),
                    pa.array(n_digit, type=pa.int32()),
                    pa.array(n_alpha, type=pa.int32()),
                ],
                names=["doc_id", "n_bytes", "n_ws", "n_digit", "n_alpha"],
            )

    return with_payload.select(id_col, "payload").mapInArrow(
        _census, schema=BYTE_CLASS_SCHEMA
    )


def build_fake_image(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize a deterministic fake image blob per document: a 12-byte
    header (magic 'IMG1' + big-endian u32 width/height derived from the
    text length — same formulas as the decode stub) followed by the
    UTF-8 text bytes as the fake pixel payload.  Entirely JVM built-ins
    (to_binary/hex/concat) — this is the writer half of the binary
    plumbing, no Python in the loop."""
    n = F.octet_length(F.encode(F.col(text_col), "UTF-8"))
    width = (F.lit(64) + n % 577).cast("bigint")
    height = (F.lit(64) + n % 311).cast("bigint")
    header = F.concat(
        F.to_binary(F.lit("494D4731"), F.lit("hex")),  # 'IMG1'
        F.to_binary(F.lpad(F.hex(width), 8, "0"), F.lit("hex")),
        F.to_binary(F.lpad(F.hex(height), 8, "0"), F.lit("hex")),
        F.encode(F.col(text_col), "UTF-8"),
    )
    return docs.withColumn("img", header)


def parse_image_header(with_img: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Reader half: recover magic / dimensions / payload size from the
    opaque binary column with substring-on-binary + hex + conv — the
    header-sniffing a 100 TB media lake does BEFORE deciding which blobs
    reach the (expensive, Python) decoder.  Stays in whole-stage
    codegen; only pre-filtered candidates ever cross into mapInPandas."""
    return with_img.select(
        id_col,
        F.decode(F.expr("substring(img, 1, 4)"), "UTF-8").alias("magic"),
        F.conv(F.hex(F.expr("substring(img, 5, 4)")), 16, 10).cast("int").alias("width"),
        F.conv(F.hex(F.expr("substring(img, 9, 4)")), 16, 10).cast("int").alias("height"),
        (F.length("img") - 12).cast("bigint").alias("payload_bytes"),
    )


SHOT_CUT_SCHEMA = "doc_id bigint, n_frames int, n_cuts int, mean_luma double"


def video_shot_cuts(
    with_payload: DataFrame,
    frame_bytes: int = 64,
    threshold: float = 8.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Video-style shot-boundary detection on the opaque blob: the payload
    is framed into fixed ``frame_bytes`` windows (trailing partial frame
    dropped), each frame's "luma" = mean byte value, and a cut is declared
    where consecutive frames differ by more than ``threshold`` — the
    mapInPandas shape a real scene-cut detector (histogram / SSIM diff)
    uses, with byte arithmetic kept integer-exact so the DuckDB oracle
    verifies the Python path bit-for-bit.

    One Arrow crossing; output is 4 scalars/doc.  At 100 TB the frame
    loop stays vectorized numpy inside the executor; nothing widens."""
    import numpy as np

    def _cuts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "n_frames": [], "n_cuts": [], "mean_luma": []}
            for did, payload in zip(pdf[id_col], pdf["payload"]):
                buf = np.frombuffer(payload, dtype=np.uint8)
                w = len(buf) // frame_bytes
                frames = buf[: w * frame_bytes].astype(np.int64).reshape(w, frame_bytes)
                sums = frames.sum(axis=1)
                luma = sums / float(frame_bytes)
                cuts = int((np.abs(np.diff(luma)) > threshold).sum()) if w > 1 else 0
                out["doc_id"].append(did)
                out["n_frames"].append(w)
                out["n_cuts"].append(cuts)
                out["mean_luma"].append(
                    float(sums.sum()) / (w * frame_bytes) if w else 0.0
                )
            yield pd.DataFrame(out)

    return with_payload.select(id_col, "payload").mapInPandas(
        _cuts, schema=SHOT_CUT_SCHEMA
    )


ZCR_SCHEMA = "doc_id bigint, n_windows int, total_crossings bigint, max_crossings int"


def audio_zero_crossing(
    with_payload: DataFrame,
    frame_bytes: int = 16,
    center: int = 80,
    id_col: str = "doc_id",
) -> DataFrame:
    """Zero-crossing-rate framing, the second classical audio feature
    next to window energy (audio_window_energy): the blob is cut into
    ``frame_bytes`` windows and each window counts sign changes of the
    byte stream around ``center`` (80 ≈ the middle of the printable
    range, so ASCII fixtures actually cross; a real PCM pipeline uses
    128).  Same one-crossing mapInPandas shape, numpy-vectorized,
    byte-exact for the DuckDB oracle."""
    import numpy as np

    def _zcr(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [],
                "n_windows": [],
                "total_crossings": [],
                "max_crossings": [],
            }
            for did, payload in zip(pdf[id_col], pdf["payload"]):
                buf = np.frombuffer(payload, dtype=np.uint8)
                w = len(buf) // frame_bytes
                frames = buf[: w * frame_bytes].reshape(w, frame_bytes)
                hi = (frames >= center).astype(np.int8)
                crossings = np.abs(np.diff(hi, axis=1)).sum(axis=1)
                out["doc_id"].append(did)
                out["n_windows"].append(w)
                out["total_crossings"].append(int(crossings.sum()) if w else 0)
                out["max_crossings"].append(int(crossings.max()) if w else 0)
            yield pd.DataFrame(out)

    return with_payload.select(id_col, "payload").mapInPandas(_zcr, schema=ZCR_SCHEMA)


# ---------------------------------------------------------------------------
# REAL container format: RIFF/WAVE (8-bit PCM) — writer is pure JVM
# expressions, decoder is an actual chunk-walking RIFF parser (needs only
# struct-level byte math, no media libraries), so this pair upgrades the
# multimodal story from "deterministic stub" to "real decode" for one
# genuine on-disk format.  Python's stdlib `wave` module reads the
# writer's output (pinned in tests/test_multimodal_wav.py).
# ---------------------------------------------------------------------------

WAV_SAMPLE_RATE = 8000

WAV_DECODE_SCHEMA = (
    "doc_id bigint, sample_rate int, n_channels int, bits_per_sample int, "
    "n_samples bigint, sum_sq_dev bigint"
)


def _u32le(x):
    """Little-endian u32 as binary, from JVM expressions: hex -> pad to 8
    nibbles -> byte-swap -> unhex."""
    h = F.lpad(F.hex(x.cast("bigint")), 8, "0")
    swapped = F.concat(
        F.substring(h, 7, 2), F.substring(h, 5, 2), F.substring(h, 3, 2), F.substring(h, 1, 2)
    )
    return F.to_binary(swapped, F.lit("hex"))


def _u16le(x):
    h = F.lpad(F.hex(x.cast("bigint")), 4, "0")
    return F.to_binary(F.concat(F.substring(h, 3, 2), F.substring(h, 1, 2)), F.lit("hex"))


def build_wav_pcm8(
    docs: DataFrame, text_col: str = "text", sample_rate: int = WAV_SAMPLE_RATE
) -> DataFrame:
    """Writer half, entirely JVM-side: a spec-compliant RIFF/WAVE file per
    document — 44-byte canonical header (PCM format chunk) + the utf-8
    text bytes as unsigned 8-bit samples.  Every little-endian field is
    built with hex/lpad/substring byte swaps; no Python in the loop."""
    data = F.encode(F.col(text_col), "UTF-8")
    dsz = F.octet_length(data)
    lit = lambda s: F.encode(F.lit(s), "UTF-8")  # noqa: E731
    wav = F.concat(
        lit("RIFF"), _u32le(dsz + 36), lit("WAVE"),
        lit("fmt "), _u32le(F.lit(16)),
        _u16le(F.lit(1)),                 # audio_format = 1 (PCM)
        _u16le(F.lit(1)),                 # channels
        _u32le(F.lit(sample_rate)),
        _u32le(F.lit(sample_rate)),       # byte_rate = rate * 1ch * 1B
        _u16le(F.lit(1)),                 # block_align
        _u16le(F.lit(8)),                 # bits_per_sample
        lit("data"), _u32le(dsz), data,
    )
    return docs.withColumn("wav", wav)


def decode_wav(with_wav: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Reader half, a REAL RIFF parser (not a stub): validates the RIFF/
    WAVE magics, walks the chunk list (honoring the odd-size pad byte the
    spec requires), pulls format fields out of `fmt ` and the sample
    bytes out of `data`, and computes integer sample statistics —
    byte-exact so the DuckDB oracle verifies the whole Python path.
    Unknown chunks are skipped exactly as a spec-conforming reader must
    (that is what makes this a parser rather than an offset table)."""
    import struct

    def _parse_one(b: bytes):
        if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
            return None
        riff_size = struct.unpack("<I", b[4:8])[0]
        end = min(len(b), 8 + riff_size)
        fmt = None
        data = None
        off = 12
        while off + 8 <= end:
            cid = b[off : off + 4]
            csz = struct.unpack("<I", b[off + 4 : off + 8])[0]
            body = b[off + 8 : off + 8 + csz]
            # declared sizes are untrusted: a truncated 'fmt ' chunk
            # (declared 16, fewer present) must reject the ROW, not
            # raise struct.error and abort the whole job
            if cid == b"fmt " and len(body) >= 16:
                fmt = struct.unpack("<HHIIHH", body[:16])
            elif cid == b"data":
                data = body
            off += 8 + csz + (csz & 1)  # chunks are word-aligned
        if fmt is None or data is None:
            return None
        audio_format, n_ch, rate, _byte_rate, _block, bits = fmt
        if audio_format != 1 or bits != 8:
            return None
        dev_sq = sum((s - 128) * (s - 128) for s in data)
        return rate, n_ch, bits, len(data), dev_sq

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "sample_rate": [], "n_channels": [],
                "bits_per_sample": [], "n_samples": [], "sum_sq_dev": [],
            }
            for did, blob in zip(pdf[id_col], pdf["wav"]):
                parsed = _parse_one(bytes(blob))
                if parsed is None:
                    continue
                rate, n_ch, bits, n_samples, dev_sq = parsed
                out["doc_id"].append(did)
                out["sample_rate"].append(rate)
                out["n_channels"].append(n_ch)
                out["bits_per_sample"].append(bits)
                out["n_samples"].append(n_samples)
                out["sum_sq_dev"].append(dev_sq)
            yield pd.DataFrame(out)

    return with_wav.select(id_col, "wav").mapInPandas(_decode, schema=WAV_DECODE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL container format #2: BMP (24-bit uncompressed, BITMAPINFOHEADER).
# Writer is pure JVM expressions; decoder is an actual header parser that
# honors the pixel-array OFFSET field (proven by a crafted file with a
# gap between header and pixels in tests/test_multimodal_wav.py).  Width
# is fixed at 16 px so the 48-byte row stride is already 4-byte aligned
# and the JVM writer needs no per-row padding.
# ---------------------------------------------------------------------------

BMP_WIDTH = 16
_BMP_ROW_BYTES = BMP_WIDTH * 3  # 48, already a multiple of 4

BMP_DECODE_SCHEMA = (
    "doc_id bigint, width int, height int, bits_per_pixel int, "
    "n_pixels bigint, sum_b bigint, sum_g bigint, sum_r bigint"
)


def _i32le(x):
    return _u32le(x)  # fixture dims are always positive


def build_bmp24(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Writer half, entirely JVM-side: a spec-compliant 24-bit BMP per
    document — 14-byte file header + 40-byte BITMAPINFOHEADER + the
    first height·48 utf-8 text bytes as the (bottom-up, BGR) pixel
    array.  height = ⌊bytes/48⌋; documents shorter than one row yield
    height 0 and a pixel-less (still valid) file."""
    data = F.encode(F.col(text_col), "UTF-8")
    height = (F.octet_length(data) / _BMP_ROW_BYTES).cast("int")
    px_bytes = height * _BMP_ROW_BYTES
    pixels = F.expr(f"substring(encode({text_col}, 'UTF-8'), 1, "
                    f"int(octet_length(encode({text_col}, 'UTF-8')) / {_BMP_ROW_BYTES}) * {_BMP_ROW_BYTES})")
    lit = lambda s: F.encode(F.lit(s), "UTF-8")  # noqa: E731
    bmp = F.concat(
        lit("BM"), _u32le(px_bytes + 54),  # file size
        _u16le(F.lit(0)), _u16le(F.lit(0)),  # reserved
        _u32le(F.lit(54)),                   # pixel-array offset
        _u32le(F.lit(40)),                   # BITMAPINFOHEADER size
        _i32le(F.lit(BMP_WIDTH)), _i32le(height),
        _u16le(F.lit(1)),                    # planes
        _u16le(F.lit(24)),                   # bits per pixel
        _u32le(F.lit(0)),                    # BI_RGB (uncompressed)
        _u32le(px_bytes),                    # image size
        _i32le(F.lit(2835)), _i32le(F.lit(2835)),  # 72 dpi
        _u32le(F.lit(0)), _u32le(F.lit(0)),  # palette colors
        pixels,
    )
    return docs.withColumn("bmp", bmp)


def decode_bmp(with_bmp: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Reader half, a REAL BMP parser: validates the 'BM' magic, reads the
    pixel-array offset from the FILE header (not assumed 54 — files with
    palettes or v4/v5 headers put pixels elsewhere), dimensions/bpp/
    compression from the info header, rejects non-BI_RGB or non-24bpp,
    and reduces the pixel array to per-channel integer sums with
    vectorized numpy — byte-exact for the DuckDB oracle."""
    import struct

    import numpy as np

    def _parse_one(b: bytes):
        if len(b) < 54 or b[0:2] != b"BM":
            return None
        px_off = struct.unpack("<I", b[10:14])[0]
        hdr_sz, width, height = struct.unpack("<Iii", b[14:26])
        planes, bpp = struct.unpack("<HH", b[26:30])
        compression = struct.unpack("<I", b[30:34])[0]
        if hdr_sz < 40 or planes != 1 or bpp != 24 or compression != 0:
            return None
        row = (width * 3 + 3) // 4 * 4
        n = abs(height) * row
        px = np.frombuffer(b[px_off : px_off + n], dtype=np.uint8)
        if px.size != n:
            return None
        px = px.reshape(abs(height), row)[:, : width * 3].reshape(-1, 3)
        sums = px.astype(np.int64).sum(axis=0) if px.size else np.zeros(3, np.int64)
        return width, abs(height), bpp, px.shape[0], int(sums[0]), int(sums[1]), int(sums[2])

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "width": [], "height": [], "bits_per_pixel": [],
                "n_pixels": [], "sum_b": [], "sum_g": [], "sum_r": [],
            }
            for did, blob in zip(pdf[id_col], pdf["bmp"]):
                parsed = _parse_one(bytes(blob))
                if parsed is None:
                    continue
                w, h, bpp, n_px, sb, sg, sr = parsed
                out["doc_id"].append(did)
                out["width"].append(w)
                out["height"].append(h)
                out["bits_per_pixel"].append(bpp)
                out["n_pixels"].append(n_px)
                out["sum_b"].append(sb)
                out["sum_g"].append(sg)
                out["sum_r"].append(sr)
            yield pd.DataFrame(out)

    return with_bmp.select(id_col, "bmp").mapInPandas(_decode, schema=BMP_DECODE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL container format #3: AVI (RIFF 'AVI ', uncompressed 24-bit DIB
# frames) — completes the audio(WAV)/image(BMP)/video(AVI) triad of
# genuinely-parsed on-disk formats.  Frames are 4x4 px x 24 bpp = 48
# bytes (12-byte rows, already 4-aligned), carried in '00db' chunks
# inside LIST('movi'); the header tree is LIST('hdrl'){avih,
# LIST('strl'){strh,strf}}.  The writer builds the whole nested-chunk
# byte stream with JVM expressions (per-frame headers interleaved via an
# aggregate fold over a binary array); the decoder is the same
# chunk-walking RIFF parser family as decode_wav, extended to recurse
# into LIST forms.
# ---------------------------------------------------------------------------

AVI_FRAME_W = 4
AVI_FRAME_H = 4
AVI_FRAME_BYTES = AVI_FRAME_W * AVI_FRAME_H * 3  # 48
AVI_US_PER_FRAME = 40_000  # 25 fps

AVI_DECODE_SCHEMA = (
    "doc_id bigint, width int, height int, us_per_frame int, "
    "n_frames_declared int, n_frames bigint, luma_sum bigint, n_cuts bigint"
)


def build_avi_dib(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Writer half, entirely JVM-side: a spec-shaped AVI per document —
    RIFF('AVI '){ LIST('hdrl'){ avih, LIST('strl'){ strh('vids'/'DIB '),
    strf(BITMAPINFOHEADER) } }, LIST('movi'){ '00db' frames } } with the
    document's text bytes cut into 48-byte uncompressed 4x4x24bpp
    frames.  The per-frame '00db' headers are interleaved with an
    aggregate fold over a transform-built array<binary> — no Python."""
    lit = lambda s: F.encode(F.lit(s), "UTF-8")  # noqa: E731
    data = F.encode(F.col(text_col), "UTF-8")
    n_frames = (F.octet_length(data) / AVI_FRAME_BYTES).cast("int")

    # --- fixed-size header chunks (sizes are compile-time constants) ---
    avih = F.concat(
        lit("avih"), _u32le(F.lit(56)),
        _u32le(F.lit(AVI_US_PER_FRAME)),            # dwMicroSecPerFrame
        _u32le(F.lit(AVI_FRAME_BYTES * 25)),        # dwMaxBytesPerSec
        _u32le(F.lit(0)), _u32le(F.lit(0)),         # padding, flags
        _u32le(n_frames),                           # dwTotalFrames
        _u32le(F.lit(0)), _u32le(F.lit(1)),         # initial frames, streams
        _u32le(F.lit(AVI_FRAME_BYTES)),             # suggested buffer
        _u32le(F.lit(AVI_FRAME_W)), _u32le(F.lit(AVI_FRAME_H)),
        _u32le(F.lit(0)), _u32le(F.lit(0)), _u32le(F.lit(0)), _u32le(F.lit(0)),
    )
    strh = F.concat(
        lit("strh"), _u32le(F.lit(56)),
        lit("vids"), lit("DIB "),
        _u32le(F.lit(0)),                           # flags
        _u16le(F.lit(0)), _u16le(F.lit(0)),         # priority, language
        _u32le(F.lit(0)),                           # initial frames
        _u32le(F.lit(1)), _u32le(F.lit(25)),        # scale, rate -> 25 fps
        _u32le(F.lit(0)),                           # start
        _u32le(n_frames),                           # length (frames)
        _u32le(F.lit(AVI_FRAME_BYTES)),             # suggested buffer
        _u32le(F.lit(0)),                           # quality
        _u32le(F.lit(0)),                           # sample size
        _u16le(F.lit(0)), _u16le(F.lit(0)),
        _u16le(F.lit(AVI_FRAME_W)), _u16le(F.lit(AVI_FRAME_H)),
    )
    strf = F.concat(
        lit("strf"), _u32le(F.lit(40)),
        _u32le(F.lit(40)),
        _u32le(F.lit(AVI_FRAME_W)), _u32le(F.lit(AVI_FRAME_H)),
        _u16le(F.lit(1)), _u16le(F.lit(24)),
        _u32le(F.lit(0)),                           # BI_RGB
        _u32le(F.lit(AVI_FRAME_BYTES)),
        _u32le(F.lit(2835)), _u32le(F.lit(2835)),
        _u32le(F.lit(0)), _u32le(F.lit(0)),
    )
    # LIST sizes: body = 4 (form) + chunks
    strl_body_sz = 4 + (8 + 56) + (8 + 40)  # 'strl' + strh chunk + strf chunk
    strl = F.concat(lit("LIST"), _u32le(F.lit(strl_body_sz)), lit("strl"), strh, strf)
    # hdrl body = 'hdrl' + avih chunk (8+56) + the WHOLE strl chunk
    # including its own 8-byte LIST header (8 + strl_body_sz) — counting
    # only the strl body under-declared every file by 8 bytes
    hdrl_body_sz = 4 + (8 + 56) + (8 + strl_body_sz)
    hdrl = F.concat(lit("LIST"), _u32le(F.lit(hdrl_body_sz)), lit("hdrl"), avih, strl)

    # --- movi: per-frame '00db' chunks via transform + fold ---
    # sequence(0, n-1) with n == 0 is sequence(0, -1) = [0, -1]
    # (descending!), which would fold two bogus chunks past the declared
    # RIFF/movi sizes for docs under one frame (48 bytes) — guard to an
    # empty binary so zero-frame files end exactly at their declared size.
    empty_bin = F.to_binary(F.lit(""), F.lit("hex"))
    frames_concat = F.when(
        n_frames > 0,
        F.aggregate(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1),
                lambda i: F.concat(
                    lit("00db"),
                    _u32le(F.lit(AVI_FRAME_BYTES)),
                    F.substring(data, F.lit(1) + i * AVI_FRAME_BYTES, F.lit(AVI_FRAME_BYTES)),
                ),
            ),
            empty_bin,
            lambda acc, x: F.concat(acc, x),
        ),
    ).otherwise(empty_bin)
    movi_sz = 4 + n_frames * (8 + AVI_FRAME_BYTES)
    movi = F.concat(lit("LIST"), _u32le(movi_sz), lit("movi"), frames_concat)

    # riff body = 'AVI ' + LIST hdrl chunk (8 + hdrl_body_sz) + LIST movi chunk (8 + movi_sz)
    riff_body_sz = F.lit(4 + 8 + hdrl_body_sz).cast("long") + (F.lit(8) + movi_sz)
    avi = F.concat(lit("RIFF"), _u32le(riff_body_sz), lit("AVI "), hdrl, movi)
    return docs.withColumn("avi", avi)


def decode_avi(with_avi: DataFrame, cut_threshold_sum: int = 384, id_col: str = "doc_id") -> DataFrame:
    """Reader half, a real recursive RIFF parser: validates RIFF/'AVI ',
    walks top-level chunks, recurses into LIST forms (hdrl -> avih for
    dimensions/fps/declared frame count; movi -> '00db'/'00dc' frame
    chunks), then computes integer frame statistics — per-frame byte
    sums, total luma, and shot cuts where consecutive frame sums differ
    by more than ``cut_threshold_sum`` (384 = 8 x 48 bytes, the integer
    spelling of "mean luma jumped by > 8").  Byte-exact for the DuckDB
    oracle; unknown chunks and odd-size padding are handled exactly like
    decode_wav."""
    import struct

    def _walk(b: bytes, off: int, end: int):
        """Yield (fourcc, body_start, body_size) for chunks in [off, end)."""
        while off + 8 <= end:
            cid = b[off : off + 4]
            csz = struct.unpack("<I", b[off + 4 : off + 8])[0]
            yield cid, off + 8, csz
            off += 8 + csz + (csz & 1)

    def _parse_one(b: bytes):
        if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"AVI ":
            return None
        end = min(len(b), 8 + struct.unpack("<I", b[4:8])[0])
        avih = None
        frames = []
        for cid, boff, bsz in _walk(b, 12, end):
            if cid != b"LIST":
                continue
            form = b[boff : boff + 4]
            # nested stop bound is clamped to the (already len-clamped)
            # outer end: a LIST whose declared size overruns the blob
            # must reject/stop cleanly, not struct.error past the buffer
            if form == b"hdrl":
                for cid2, boff2, bsz2 in _walk(b, boff + 4, min(boff + bsz, end)):
                    # declared size AND present bytes must both cover the
                    # header — a short declared size padded by the NEXT
                    # chunk's bytes must not parse as a valid avih
                    if (
                        cid2 == b"avih"
                        and bsz2 >= 40
                        and len(b[boff2 : boff2 + 40]) == 40
                    ):
                        avih = struct.unpack("<10I", b[boff2 : boff2 + 40])
            elif form == b"movi":
                for cid2, boff2, bsz2 in _walk(b, boff + 4, min(boff + bsz, end)):
                    if cid2 in (b"00db", b"00dc"):
                        frame = b[boff2 : boff2 + bsz2]
                        # present bytes must cover the declared size —
                        # an over-declared frame whose slice is silently
                        # truncated by the blob end must be SKIPPED (not
                        # accepted with partial luma/cut stats), mirroring
                        # the avih present-bytes rejection above
                        if len(frame) == bsz2:
                            frames.append(frame)
        if avih is None:
            return None
        us_per_frame, _mbps, _pad, _flags, declared, _init, _streams, _buf, w, h = avih
        sums = [sum(f) for f in frames]
        luma_sum = sum(sums)
        cuts = sum(
            1 for a, b2 in zip(sums, sums[1:]) if abs(a - b2) > cut_threshold_sum
        )
        return w, h, us_per_frame, declared, len(frames), luma_sum, cuts

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "width": [], "height": [], "us_per_frame": [],
                "n_frames_declared": [], "n_frames": [], "luma_sum": [], "n_cuts": [],
            }
            for did, blob in zip(pdf[id_col], pdf["avi"]):
                parsed = _parse_one(bytes(blob))
                if parsed is None:
                    continue
                w, h, uspf, declared, n_fr, luma, cuts = parsed
                out["doc_id"].append(did)
                out["width"].append(w)
                out["height"].append(h)
                out["us_per_frame"].append(uspf)
                out["n_frames_declared"].append(declared)
                out["n_frames"].append(n_fr)
                out["luma_sum"].append(luma)
                out["n_cuts"].append(cuts)
            yield pd.DataFrame(out)

    return with_avi.select(id_col, "avi").mapInPandas(_decode, schema=AVI_DECODE_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id bigint, src_width int, src_height int, out_width int, out_height int, "
    "out_n_pixels bigint, out_sum_b bigint, out_sum_g bigint, out_sum_r bigint, "
    "out_is_valid_bmp boolean"
)


def resize_bmp_nearest(
    with_bmp: DataFrame, factor: int = 2, id_col: str = "doc_id"
) -> DataFrame:
    """REAL pixel resize (upgrades resize_metadata's planning stub):
    decode the BMP, nearest-neighbor downsample by ``factor`` (numpy
    stride slicing ``px[::f, ::f]`` — rows/cols at indices 0, f, 2f…),
    re-encode a VALID smaller BMP, and re-decode it through the same
    parser as a self-check.  All three steps share one Arrow crossing.
    Output: source/target dims, target per-channel sums (byte-exact for
    the DuckDB oracle) and the re-decode validity flag."""
    import struct

    import numpy as np

    def _px_array(b: bytes):
        if len(b) < 54 or b[0:2] != b"BM":
            return None
        px_off = struct.unpack("<I", b[10:14])[0]
        hdr_sz, width, height = struct.unpack("<Iii", b[14:26])
        planes, bpp = struct.unpack("<HH", b[26:30])
        compression = struct.unpack("<I", b[30:34])[0]
        if hdr_sz < 40 or planes != 1 or bpp != 24 or compression != 0:
            return None
        row = (width * 3 + 3) // 4 * 4
        n = abs(height) * row
        px = np.frombuffer(b[px_off : px_off + n], dtype=np.uint8)
        if px.size != n:
            return None
        return width, abs(height), px.reshape(abs(height), row)[:, : width * 3].reshape(
            abs(height), width, 3
        )

    def _encode_bmp(px: "np.ndarray") -> bytes:
        h, w, _ = px.shape
        row = (w * 3 + 3) // 4 * 4
        rows = np.zeros((h, row), dtype=np.uint8)
        rows[:, : w * 3] = px.reshape(h, w * 3)
        data = rows.tobytes()
        hdr = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
        info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
        return hdr + info + data

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "src_width": [], "src_height": [], "out_width": [],
                "out_height": [], "out_n_pixels": [], "out_sum_b": [],
                "out_sum_g": [], "out_sum_r": [], "out_is_valid_bmp": [],
            }
            for did, blob in zip(pdf[id_col], pdf["bmp"]):
                parsed = _px_array(bytes(blob))
                if parsed is None:
                    continue
                w, h, px = parsed
                small = px[::factor, ::factor]
                oh, ow = small.shape[0], small.shape[1]
                rebuilt = _encode_bmp(small)
                reparsed = _px_array(rebuilt)
                valid = (
                    reparsed is not None
                    and reparsed[0] == ow
                    and reparsed[1] == oh
                    and np.array_equal(reparsed[2], small)
                )
                sums = (
                    small.reshape(-1, 3).astype(np.int64).sum(axis=0)
                    if small.size
                    else np.zeros(3, np.int64)
                )
                out["doc_id"].append(did)
                out["src_width"].append(w)
                out["src_height"].append(h)
                out["out_width"].append(ow)
                out["out_height"].append(oh)
                out["out_n_pixels"].append(oh * ow)
                out["out_sum_b"].append(int(sums[0]))
                out["out_sum_g"].append(int(sums[1]))
                out["out_sum_r"].append(int(sums[2]))
                out["out_is_valid_bmp"].append(bool(valid))
            yield pd.DataFrame(out)

    return with_bmp.select(id_col, "bmp").mapInPandas(_resize, schema=RESIZE_SCHEMA)


FRAME_SAMPLE_SCHEMA = (
    "doc_id bigint, src_frames bigint, kept_frames bigint, "
    "kept_luma_sum bigint, out_declared int, out_is_valid_avi boolean"
)


def demux_avi(b: bytes):
    """Parse an AVI blob into (avih 10-tuple, [frame bytes]); None when
    malformed.  Truncated avih chunks reject the blob (present-bytes
    check, not the declared size) rather than raising struct.error."""
    import struct

    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None
    end = min(len(b), 8 + struct.unpack("<I", b[4:8])[0])
    avih = None
    frames = []

    def walk(off, stop):
        while off + 8 <= stop:
            cid = b[off : off + 4]
            csz = struct.unpack("<I", b[off + 4 : off + 8])[0]
            yield cid, off + 8, csz
            off += 8 + csz + (csz & 1)

    for cid, boff, bsz in walk(12, end):
        if cid != b"LIST":
            continue
        form = b[boff : boff + 4]
        # clamp the nested stop: an over-declared LIST size must not walk
        # past the buffer (struct.error); a short-declared avih must not
        # borrow the next chunk's bytes and parse as a valid header
        if form == b"hdrl":
            for cid2, boff2, bsz2 in walk(boff + 4, min(boff + bsz, end)):
                if (
                    cid2 == b"avih"
                    and bsz2 >= 40
                    and len(b[boff2 : boff2 + 40]) == 40
                ):
                    avih = struct.unpack("<10I", b[boff2 : boff2 + 40])
        elif form == b"movi":
            for cid2, boff2, bsz2 in walk(boff + 4, min(boff + bsz, end)):
                if cid2 in (b"00db", b"00dc"):
                    frame = b[boff2 : boff2 + bsz2]
                    # skip frames whose present bytes fall short of the
                    # declared size (over-declared chunk truncated by the
                    # blob end) — mirrors the avih present-bytes check
                    if len(frame) == bsz2:
                        frames.append(frame)
    return (avih, frames) if avih is not None else None


def remux_avi(avih, frames) -> bytes:
    """Rebuild a spec-valid AVI from an avih 10-tuple and frame list.

    avih declares dwStreams=1, so the rebuilt hdrl must carry the
    matching LIST('strl'){strh,strf} — strh/strf are constants for the
    4x4x24bpp DIB stream except strh.dwLength, which is the NEW frame
    count (mirrors build_avi_dib's writer tree)."""
    import struct

    def chunk(cid, body):
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    hdr = list(avih)
    hdr[4] = len(frames)  # dwTotalFrames
    avih_b = struct.pack("<10I", *hdr) + b"\x00" * 16
    strh_b = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIII", 0, 0, 0, 0, 1, 25, 0, len(frames))
        + struct.pack("<III", AVI_FRAME_BYTES, 0, 0)
        + struct.pack("<4H", 0, 0, AVI_FRAME_W, AVI_FRAME_H)
    )
    strf_b = struct.pack(
        "<IiiHHIIiiII", 40, AVI_FRAME_W, AVI_FRAME_H, 1, 24, 0,
        AVI_FRAME_BYTES, 2835, 2835, 0, 0,
    )
    strl = chunk(b"LIST", b"strl" + chunk(b"strh", strh_b) + chunk(b"strf", strf_b))
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih_b) + strl)
    movi = chunk(b"LIST", b"movi" + b"".join(chunk(b"00db", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def sample_avi_frames(
    with_avi: DataFrame, every_nth: int = 2, id_col: str = "doc_id"
) -> DataFrame:
    """REAL frame sampling (upgrades sample_frames' metadata-only plan):
    demux the AVI, keep frames 0, n, 2n…, re-mux a VALID smaller AVI
    (headers rebuilt with the new frame count) and re-demux it as a
    self-check — one Arrow crossing for the whole demux→sample→mux
    path.  Output is integer-exact for the DuckDB oracle."""
    _demux, _mux = demux_avi, remux_avi

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "src_frames": [], "kept_frames": [],
                "kept_luma_sum": [], "out_declared": [], "out_is_valid_avi": [],
            }
            for did, blob in zip(pdf[id_col], pdf["avi"]):
                parsed = _demux(bytes(blob))
                if parsed is None:
                    continue
                avih, frames = parsed
                kept = frames[::every_nth]
                rebuilt = _mux(avih, kept)
                reparsed = _demux(rebuilt)
                valid = (
                    reparsed is not None
                    and reparsed[0][4] == len(kept)
                    and reparsed[1] == kept
                )
                out["doc_id"].append(did)
                out["src_frames"].append(len(frames))
                out["kept_frames"].append(len(kept))
                out["kept_luma_sum"].append(sum(sum(f) for f in kept))
                out["out_declared"].append(reparsed[0][4] if reparsed else -1)
                out["out_is_valid_avi"].append(bool(valid))
            yield pd.DataFrame(out)

    return with_avi.select(id_col, "avi").mapInPandas(_sample, schema=FRAME_SAMPLE_SCHEMA)
