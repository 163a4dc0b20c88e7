"""Multimodal column plumbing — training-data pipeline extension.

Images/audio/video travel as opaque ``binary`` columns with typed metadata
structs. The Spark-side machinery (schema, partition sizing, Arrow batch
shape, mapInPandas signatures) is real and tested, and so are the codecs
for the pure header+raster formats, parsed with numpy alone: images as
binary PPM (P6) and uncompressed 24-bpp BMP (`decode_image`), audio as
PCM-16 WAV via a RIFF chunk walk (`decode_audio`). Compressed formats
(JPEG/PNG/MP3/AAC) and video demux still need external libs (PIL/librosa/
av, not in this container) and plug into the same dispatch / mapInPandas
batch functions. ``fake_feature_batch`` remains as the codec-free
pipeline-shape probe.

Scale design: decode runs via ``mapInPandas`` so each Arrow batch holds a
bounded number of blobs (``spark.sql.execution.arrow.maxRecordsPerBatch``
should be lowered for large blobs); partition sizing by bytes, not rows, via
``spark.sql.files.maxPartitionBytes`` on the read side.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

#: Canonical multimodal record: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("meta_width", LongType()),
        StructField("meta_height", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("first_byte", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def encode_ppm(arr) -> bytes:
    """Encode an (H, W, 3) uint8 array as a binary PPM (P6) image —
    header ``P6\\n<w> <h>\\n255\\n`` + row-major RGB raster. PPM is pure
    header+raster, so encode/decode need only numpy (no imaging libs)."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) array, got shape {a.shape}")
    h, w = a.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def encode_bmp(arr) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as an uncompressed 24-bpp BMP
    (BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up rows padded to 4 bytes,
    BGR channel order — the classic Windows DIB layout)."""
    import struct

    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) array, got shape {a.shape}")
    h, w = a.shape[:2]
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    return header + rows.tobytes()


def decode_image(payload: bytes) -> "object":
    """Real, dependency-free image decode: binary PPM (P6) and uncompressed
    24-bpp BMP, parsed with numpy alone (both formats are pure
    header+raster). Returns an (H, W, 3) uint8 RGB array; raises
    ValueError on any other format — plug PIL/OpenCV into this dispatch
    for JPEG/PNG in a real deployment."""
    b = bytes(payload)
    if b[:2] == b"P6":
        return _decode_ppm(b)
    if b[:2] == b"BM":
        return _decode_bmp(b)
    raise ValueError(
        f"unsupported image format (magic {b[:2]!r}); "
        f"this build decodes PPM(P6) and BMP(24bpp)"
    )


def _decode_ppm(b: bytes) -> "object":
    """P6 parser: magic, then 3 ASCII integers (width, height, maxval)
    separated by whitespace with ``#`` comments allowed, one whitespace
    byte, then the RGB raster."""
    import numpy as np

    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(b) and b[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(b) and b[pos : pos + 1].isdigit():
            pos += 1
        if start == pos:
            raise ValueError("malformed PPM header")
        vals.append(int(b[start:pos]))
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError(f"only maxval=255 PPM supported, got {maxval}")
    pos += 1  # single whitespace after maxval
    raster = b[pos : pos + w * h * 3]
    if len(raster) != w * h * 3:
        raise ValueError(
            f"PPM raster truncated: need {w * h * 3} bytes, got {len(raster)}"
        )
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def _decode_bmp(b: bytes) -> "object":
    """BITMAPINFOHEADER 24-bpp uncompressed parser (bottom-up or top-down
    via negative height, row stride padded to 4 bytes, BGR -> RGB)."""
    import struct

    import numpy as np

    if len(b) < 54:
        raise ValueError("BMP truncated before headers")
    data_off = struct.unpack_from("<I", b, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", b, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", b, 26)
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"only uncompressed 24-bpp BMP supported "
            f"(hdr={hdr_size}, planes={planes}, bpp={bpp}, comp={compression})"
        )
    top_down = h < 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    raster = b[data_off : data_off + row_size * h]
    if len(raster) != row_size * h:
        raise ValueError("BMP raster truncated")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, row_size)
    rgb = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    return rgb if top_down else rgb[::-1]


def decode_feature_batch(pdf: "pd.DataFrame") -> "pd.DataFrame":
    """REAL decode + feature extraction per Arrow batch: parse each payload
    with decode_image and emit integer pixel statistics (exact under any
    partitioning) plus an md5 fingerprint of the decoded raster. This is
    the production shape — swap decode_image's dispatch for a JPEG/PNG
    codec and the rest of the pipeline is unchanged."""
    import hashlib

    import pandas as pd

    cols: dict[str, list] = {
        "media_id": [],
        "width": [],
        "height": [],
        "sum_r": [],
        "sum_g": [],
        "sum_b": [],
        "raster_md5": [],
    }
    for mid, payload in zip(pdf["media_id"], pdf["payload"]):
        arr = decode_image(bytes(payload))
        cols["media_id"].append(mid)
        cols["height"].append(arr.shape[0])
        cols["width"].append(arr.shape[1])
        s = arr.sum(axis=(0, 1), dtype="int64")
        cols["sum_r"].append(int(s[0]))
        cols["sum_g"].append(int(s[1]))
        cols["sum_b"].append(int(s[2]))
        cols["raster_md5"].append(hashlib.md5(arr.tobytes()).hexdigest())
    return pd.DataFrame(cols)


DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
        StructField("raster_md5", StringType()),
    ]
)


def decode_features(media: DataFrame) -> DataFrame:
    """mapInPandas real-decode pipeline over binary payloads (PPM/BMP)."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield decode_feature_batch(pdf)

    return media.select("media_id", "payload").mapInPandas(
        gen, DECODED_SCHEMA
    )


def fake_feature_batch(pdf: "pd.DataFrame") -> "pd.DataFrame":
    """Deterministic stand-in for decode+feature-extract: byte length, first
    byte, and a 4-dim 'feature' derived from byte statistics. Runs per Arrow
    batch — the exact shape a real decoder would use."""
    import pandas as pd

    payloads = pdf["payload"]
    byte_len = payloads.map(len)
    first = payloads.map(lambda b: int(b[0]) if len(b) else -1)
    feature = payloads.map(
        lambda b: [
            float(len(b)),
            float(b[0]) if len(b) else 0.0,
            float(b[-1]) if len(b) else 0.0,
            float(sum(b[:16]) % 256),
        ]
    )
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"],
            "byte_len": byte_len,
            "first_byte": first,
            "feature": feature,
        }
    )


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads. Arrow-batched:
    Python sees pandas DataFrames of whole batches, never row-at-a-time."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield fake_feature_batch(pdf)

    return media.select("media_id", "payload").mapInPandas(gen, FEATURE_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque payloads so the multimodal
    pipeline is exercisable against driver testdata (no image files exist)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.col("text").cast("binary").alias("payload"),
        F.length("text").cast("long").alias("meta_width"),
        F.lit(1).cast("long").alias("meta_height"),
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("meta_width", LongType()),
        StructField("meta_height", LongType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_payload", BinaryType()),
    ]
)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing via mapInPandas. A real deployment decodes and
    resamples inside the batch function (PIL/OpenCV — not in this container);
    the deterministic stand-in crops/zero-pads the payload to width*height
    bytes so batch shape, schema, and metadata propagation are testable."""

    target = width * height

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            resized = pdf["payload"].map(
                lambda b: bytes(b[:target]).ljust(target, b"\x00")
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": resized,
                    "meta_width": width,
                    "meta_height": height,
                }
            )

    return media.select("media_id", "payload").mapInPandas(gen, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, frame_size: int, stride: int) -> DataFrame:
    """Frame sampling: one output row per frame at offsets 0, stride, 2*stride
    … while offset < byte length (video frame-sample plumbing; the stand-in
    'frame' is the payload byte slice a real demuxer would decode).

    Fan-out happens inside the Arrow batch (pure pandas, no Python loop over
    Spark rows); at scale the input should be repartitioned by bytes so one
    task never holds too many decoded frames."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(b)
                for k, off in enumerate(range(0, max(len(b), 1), stride)):
                    ids.append(mid)
                    idxs.append(k)
                    frames.append(b[off : off + frame_size])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_payload": frames}
            )

    return media.select("media_id", "payload").mapInPandas(gen, FRAME_SCHEMA)


# ------------------------------------------------- audio codec (WAV/PCM)

def encode_wav(samples, sample_rate: int = 8000) -> bytes:
    """Encode int16 PCM samples as a mono WAV (RIFF) file — like PPM/BMP,
    WAV-PCM is pure header+raster and needs only numpy."""
    import struct

    import numpy as np

    s = np.asarray(samples, dtype="<i2")
    data = s.tobytes()
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                      sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def decode_audio(payload: bytes):
    """Real, dependency-free audio decode: mono/stereo PCM-16 WAV parsed
    with numpy (RIFF chunk walk; fmt then data). Returns
    (samples: int16 ndarray [n, channels], sample_rate). Raises ValueError
    on other formats — compressed codecs (MP3/AAC) plug into this
    dispatch with an external library, the Spark plumbing is unchanged."""
    import struct

    import numpy as np

    b = bytes(payload)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError(
            f"unsupported audio format (magic {b[:4]!r}); "
            f"this build decodes PCM-16 WAV"
        )
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = struct.unpack_from("<I", b, pos + 4)[0]
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise ValueError(
            f"only PCM-16 WAV supported (fmt={audio_fmt}, bits={bits})"
        )
    n = len(data) // (2 * channels)
    samples = np.frombuffer(
        data[: n * 2 * channels], dtype="<i2"
    ).reshape(n, channels)
    return samples, rate


AUDIO_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_samples", LongType()),
        StructField("sum_abs", LongType()),
        StructField("zero_cross", LongType()),
    ]
)


def audio_feature_batch(pdf: "pd.DataFrame") -> "pd.DataFrame":
    """REAL audio decode + integer feature extraction per Arrow batch:
    sample count, total absolute amplitude, and zero-crossing count
    (adjacent strict sign products < 0) — exact under any partitioning."""
    import numpy as np
    import pandas as pd

    cols: dict[str, list] = {k: [] for k in
                             ("media_id", "sample_rate", "n_samples",
                              "sum_abs", "zero_cross")}
    for mid, payload in zip(pdf["media_id"], pdf["payload"]):
        samples, rate = decode_audio(bytes(payload))
        mono = samples[:, 0].astype(np.int64)
        cols["media_id"].append(mid)
        cols["sample_rate"].append(rate)
        cols["n_samples"].append(len(mono))
        cols["sum_abs"].append(int(np.abs(mono).sum()))
        cols["zero_cross"].append(
            int(((mono[:-1] * mono[1:]) < 0).sum()) if len(mono) > 1 else 0
        )
    return pd.DataFrame(cols)


def audio_features(media: DataFrame) -> DataFrame:
    """mapInPandas real-decode audio pipeline over binary WAV payloads."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield audio_feature_batch(pdf)

    return media.select("media_id", "payload").mapInPandas(
        gen, AUDIO_SCHEMA
    )


# ------------------------------------------- video codec (Y4M/YUV4MPEG2)

def encode_y4m(frames, fps: int = 25) -> bytes:
    """Encode (N, H, W, 3) uint8 planar-component frames as YUV4MPEG2
    (C444): ASCII stream header, then ``FRAME\\n`` + 3 raw planes per
    frame — the pure header+raster video container (what ffmpeg's rawvideo
    pipeline speaks), encodable/decodable with numpy alone."""
    import numpy as np

    a = np.asarray(frames, dtype=np.uint8)
    if a.ndim != 4 or a.shape[3] != 3:
        raise ValueError(f"expected (N, H, W, 3) frames, got {a.shape}")
    n, h, w = a.shape[:3]
    out = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C444\n" % (w, h, fps)]
    for f in range(n):
        out.append(b"FRAME\n")
        for p in range(3):  # planar: all Y, all U, all V
            out.append(a[f, :, :, p].tobytes())
    return b"".join(out)


def decode_video(payload: bytes):
    """Real, dependency-free video demux+decode: YUV4MPEG2 C444 parsed
    with numpy (header tag walk, per-FRAME plane extraction). Returns
    (frames: uint8 ndarray [n, h, w, 3], fps). Raises ValueError on other
    containers — MP4/MKV demux plugs into this dispatch with PyAV."""
    import numpy as np

    b = bytes(payload)
    if not b.startswith(b"YUV4MPEG2"):
        raise ValueError(
            f"unsupported video format (magic {b[:9]!r}); "
            f"this build decodes YUV4MPEG2 (Y4M) C444"
        )
    nl = b.index(b"\n")
    w = h = fps = None
    colorspace = "C420"  # Y4M default when no C tag present
    for tag in b[10:nl].split(b" "):
        if tag[:1] == b"W":
            w = int(tag[1:])
        elif tag[:1] == b"H":
            h = int(tag[1:])
        elif tag[:1] == b"F":
            fps = int(tag[1:].split(b":")[0])
        elif tag[:1] == b"C":
            colorspace = tag.decode()
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    if colorspace != "C444":
        raise ValueError(f"only C444 Y4M supported, got {colorspace}")
    frame_bytes = 3 * w * h
    frames = []
    pos = nl + 1
    while pos < len(b):
        fnl = b.index(b"\n", pos)
        if b[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at byte {pos}")
        raw = b[fnl + 1 : fnl + 1 + frame_bytes]
        if len(raw) != frame_bytes:
            raise ValueError(
                f"Y4M frame truncated: need {frame_bytes}, got {len(raw)}"
            )
        planes = np.frombuffer(raw, dtype=np.uint8).reshape(3, h, w)
        frames.append(np.transpose(planes, (1, 2, 0)))
        pos = fnl + 1 + frame_bytes
    return np.stack(frames) if frames else np.zeros((0, h, w, 3), "uint8"), fps


VIDEO_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("sum_y", LongType()),
        StructField("sum_u", LongType()),
        StructField("sum_v", LongType()),
    ]
)


def video_frame_features(media: DataFrame) -> DataFrame:
    """mapInPandas real video demux: one output row per decoded frame with
    exact integer plane sums."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            cols: dict[str, list] = {
                k: []
                for k in ("media_id", "frame_idx", "width", "height",
                          "sum_y", "sum_u", "sum_v")
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames, _ = decode_video(bytes(payload))
                for i, fr in enumerate(frames):
                    s = fr.sum(axis=(0, 1), dtype="int64")
                    cols["media_id"].append(mid)
                    cols["frame_idx"].append(i)
                    cols["height"].append(fr.shape[0])
                    cols["width"].append(fr.shape[1])
                    cols["sum_y"].append(int(s[0]))
                    cols["sum_u"].append(int(s[1]))
                    cols["sum_v"].append(int(s[2]))
            yield pd.DataFrame(cols)

    return media.select("media_id", "payload").mapInPandas(
        gen, VIDEO_SCHEMA
    )


def resample_nearest(arr, width: int, height: int):
    """Nearest-neighbor resample of an (H, W, 3) array to (height, width)
    — the classic index mapping src_i = floor(dst_i * src / dst), exact
    integer arithmetic (reproducible in SQL, unlike interpolating
    kernels)."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    h, w = a.shape[:2]
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return a[rows][:, cols]


def resize_decoded_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """REAL image resize via mapInPandas: decode (PPM/BMP) -> nearest-
    neighbor resample -> re-encode as PPM. Unlike the byte-level
    `resize_images` stand-in, the output payloads are valid images of the
    target geometry."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "payload": [],
                   "meta_width": [], "meta_height": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = resample_nearest(
                    decode_image(bytes(payload)), width, height
                )
                out["media_id"].append(mid)
                out["payload"].append(encode_ppm(arr))
                out["meta_width"].append(width)
                out["meta_height"].append(height)
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(
        gen, RESIZED_SCHEMA
    )


# ----------------------------------------------------------- perceptual hash

PHASH_GRID = 8  # dHash block grid (images are 2*PHASH_GRID pixels square)


def dhash64(arr) -> int:
    """64-bit difference hash (dHash) of a decoded RGB image, exact-integer
    end to end so every engine agrees bit-for-bit: integer luma
    gray = (299 R + 587 G + 114 B) // 1000 per pixel, 2x2 block SUMS down
    to an 8x8 grid (block sums, not float means — same ordering, no
    rounding), then bit (r, c) = [ block(r,c) > block(r,(c+1) mod 8) ]
    (the classic horizontal-gradient dHash, closed cyclically so the grid
    stays 8x8 instead of needing a 9-column resample). Returns a SIGNED
    64-bit int (bit 63 is the sign bit, matching BIGINT semantics)."""
    import numpy as np

    g = PHASH_GRID
    a = np.asarray(arr, dtype=np.int64)
    gray = (299 * a[:, :, 0] + 587 * a[:, :, 1] + 114 * a[:, :, 2]) // 1000
    blocks = gray.reshape(g, 2, g, 2).sum(axis=(1, 3))
    bits = blocks > np.roll(blocks, -1, axis=1)
    h = 0
    for pos, bit in enumerate(bits.reshape(-1).tolist()):
        if bit:
            h |= 1 << pos
    return h - (1 << 64) if h >= (1 << 63) else h


def phash_media(media: DataFrame) -> DataFrame:
    """mapInPandas real-decode -> dHash pipeline: (media_id, payload) ->
    (media_id, phash). Arrow-batched; the decode is the same PPM/BMP
    dispatch as `decode_features`."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "phash": [
                        dhash64(decode_image(p)) for p in pdf["payload"]
                    ],
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        gen, "media_id long, phash long"
    )
