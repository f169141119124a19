"""Multimodal (image/audio/video) column support.

Design: media travel as opaque `binary` payload columns with typed
metadata structs alongside. Decode / feature-extraction / resize /
frame-sampling run as Arrow-batched pandas functions over
`mapInPandas` — per-partition batch iterators, so payload bytes never
round-trip through the driver and each task touches only its split.

Backends: `decode_backend='bmp'` is a REAL decode path — a pure-Python
24-bit BMP codec (`functions/bmp.py`), no codec library needed — used
for decode, resize (nearest-neighbor over numpy), and payload
generation. `decode_backend='fake'` derives deterministic metadata
from byte length alone (any payload, oracle-reproducible by
arithmetic). Other codecs (JPEG/PNG/ffmpeg) need libraries absent
from this container: `decode_backend='real'` raises
NotImplementedError at the decode call site, clearly marking where
PIL/opencv plugs in.

Scale notes: payloads are large → keep them OUT of shuffles (extract
metadata first, shuffle the small columns, re-join by key only if
needed); size `spark.sql.files.maxPartitionBytes` so one task's batch
of payloads fits executor memory; mapInPandas streams Arrow batches,
bounding peak memory at batch granularity.
"""

from __future__ import annotations

from collections.abc import Iterator

import os as _os
import struct

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _env_int(name: str, default: int) -> int:
    """Env-tunable positive int: non-numeric or < 1 values fall back to
    the default instead of reaching repartition()/comparisons with an
    opaque error (ADVICE r13)."""
    try:
        v = int(_os.environ.get(name, default))
    except (TypeError, ValueError):
        return default
    return v if v >= 1 else default

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("byte_len", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
    ]
)


def with_binary_payload(df: DataFrame, src_col: str, out: str = "payload") -> DataFrame:
    """Materialize a binary payload column (here: utf-8 bytes of a
    source column — stands in for image/audio bytes read from an
    object store)."""
    return df.withColumn(out, F.encode(F.col(src_col), "UTF-8"))


def with_bmp_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize a REAL image payload column: a valid 24-bit BMP per
    row, dimensions and pixels derived deterministically from the
    source column's utf-8 byte length (w = len % 31 + 1,
    h = len % 17 + 1, pixel[y,x,c] = (x + y + c + len) % 256) — so an
    arithmetic oracle can predict exact metadata while the decode side
    parses actual image bytes. Arrow-batched; payloads never touch the
    driver."""
    from redskins_rule_spark.functions.bmp import encode_bmp

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for text in pdf[src_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    # NULL text -> NULL payload (str(None) would fabricate
                    # an image from the 4 bytes of "None")
                    payloads.append(None)
                    continue
                blen = len(str(text).encode("utf-8"))
                w, h = blen % 31 + 1, blen % 17 + 1
                ys = np.arange(h)[:, None, None]
                xs = np.arange(w)[None, :, None]
                cs = np.arange(3)[None, None, :]
                px = ((xs + ys + cs + blen) % 256).astype(np.uint8)
                payloads.append(encode_bmp(px))
            yield pd.DataFrame({id_col: pdf[id_col].values, out: payloads})

    return df.select(id_col, src_col).mapInPandas(run, out_schema)


def _fake_decode(payload: pd.Series) -> pd.DataFrame:
    """Deterministic fake decode: metadata derived purely from byte
    length, so oracles can reproduce it. NULL payloads yield NULL
    metadata (matching `octet_length(NULL)` oracle semantics)."""
    blen = pd.array(
        [len(b) if b is not None else None for b in payload], dtype="Int64"
    )
    return pd.DataFrame(
        {
            "byte_len": blen,
            "width": pd.array(blen % 640 + 1, dtype="Int32"),
            "height": pd.array(blen % 480 + 1, dtype="Int32"),
            "channels": pd.array(
                [3 if b is not None else None for b in payload], dtype="Int32"
            ),
        }
    )


def decode_image_meta(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decode_backend: str = "fake",
) -> DataFrame:
    """Extract image metadata per payload via mapInPandas.

    Output: (id_col, byte_len, width, height, channels). Arrow batches
    stream through the decoder; payload bytes are dropped before any
    downstream shuffle.
    """
    out_schema = T.StructType(
        [df.schema[id_col]] + list(IMAGE_META_SCHEMA.fields)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_backend == "fake":
                meta = _fake_decode(pdf[payload_col])
            elif decode_backend == "bmp":
                from redskins_rule_spark.functions.bmp import decode_bmp_meta

                parsed = [
                    decode_bmp_meta(bytes(b)) if b is not None else (None,) * 3
                    for b in pdf[payload_col]
                ]
                meta = pd.DataFrame(
                    {
                        "byte_len": pd.array(
                            [len(b) if b is not None else None for b in pdf[payload_col]],
                            dtype="Int64",
                        ),
                        "width": pd.array([p[0] for p in parsed], dtype="Int32"),
                        "height": pd.array([p[1] for p in parsed], dtype="Int32"),
                        "channels": pd.array([p[2] for p in parsed], dtype="Int32"),
                    }
                )
            else:
                raise NotImplementedError(
                    "decode for codecs beyond BMP requires a codec library "
                    "(PIL/opencv) not present in this environment; plug it "
                    "in here (see decode_backend='bmp' for the shape)"
                )
            meta.insert(0, id_col, pdf[id_col].values)
            yield meta

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def resize_images(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    target: tuple[int, int] = (224, 224),
    decode_backend: str = "fake",
) -> DataFrame:
    """Resize: emits (id, payload, width, height). The fake backend
    passes bytes through and stamps the target dims; the 'bmp' backend
    REALLY decodes → nearest-neighbor-resizes → re-encodes inside the
    batch (numpy row ops, no per-pixel Python)."""
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField(payload_col, T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )
    tw, th = target

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_backend == "fake":
                payloads = pdf[payload_col].values
            elif decode_backend == "bmp":
                from redskins_rule_spark.functions.bmp import (
                    decode_bmp,
                    encode_bmp,
                    resize_nearest,
                )

                payloads = [
                    encode_bmp(resize_nearest(decode_bmp(bytes(b)), tw, th))
                    if b is not None
                    else None
                    for b in pdf[payload_col]
                ]
            elif decode_backend == "png":
                import numpy as np

                from redskins_rule_spark.functions.bmp import resize_nearest
                from redskins_rule_spark.functions.png import (
                    decode_png,
                    encode_png,
                )

                def _resize_png(b):
                    meta, pixels = decode_png(bytes(b))
                    px = (
                        np.frombuffer(pixels, dtype=np.uint8)
                        .reshape(meta.height, meta.width, meta.channels)
                    )
                    small = resize_nearest(px, tw, th)
                    return encode_png(small.tobytes(), tw, th)

                payloads = [
                    _resize_png(b) if b is not None else None
                    for b in pdf[payload_col]
                ]
            else:
                raise NotImplementedError(
                    "resize for codecs beyond BMP/PNG needs a codec library"
                )
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    payload_col: payloads,
                    "width": pd.array(
                        [tw if p is not None else None for p in payloads],
                        dtype="Int32",
                    ),
                    "height": pd.array(
                        [th if p is not None else None for p in payloads],
                        dtype="Int32",
                    ),
                }
            )
            yield out

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_n_bytes: int = 64,
    decode_backend: str = "fake",
) -> DataFrame:
    """Frame-sampling stub (video → frames). Fake backend emits one
    row per `every_n_bytes` chunk with a frame index — exercising the
    one-to-many mapInPandas shape real frame extraction has."""
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_bytes", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_backend != "fake":
                raise NotImplementedError(
                    "codec-level frame DECODE needs ffmpeg; container-level "
                    "sample extraction is real — see sample_mp4_frames "
                    "(ISO BMFF sample tables) and sample_gif_frames (LZW)"
                )
            ids, idxs, frames = [], [], []
            for _, row in pdf.iterrows():
                data = row[payload_col]
                if data is None:  # NULL payload -> zero frames
                    continue
                for i, off in enumerate(range(0, len(data), every_n_bytes)):
                    ids.append(row[id_col])
                    idxs.append(i)
                    frames.append(bytes(data[off : off + every_n_bytes]))
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": pd.array(idxs, dtype="int32"), "frame_bytes": frames}
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("byte_len", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def with_wav_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize a REAL audio payload column: a valid PCM16 mono WAV
    per row, derived deterministically from the source column's
    CHARACTER length (n_samples = clen % 97 + 8, sample_rate = 8000,
    samples[i] = ((clen + 31*i) % 65536) - 32768) — so an arithmetic
    oracle (SQL ``length(text)``, which counts characters) predicts
    exact metadata while the decode side parses actual RIFF bytes.
    Arrow-batched; payloads never touch the driver."""
    from redskins_rule_spark.functions.wav import encode_wav, synth_samples

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[src_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    payloads.append(None)
                    continue
                clen = len(str(text))
                n = clen % 97 + 8
                payloads.append(encode_wav(synth_samples(clen, n), 8000, 1))
            yield pd.DataFrame({id_col: pdf[id_col].values, out: payloads})

    return df.select(id_col, src_col).mapInPandas(run, out_schema)


def decode_audio_meta(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decode_backend: str = "wav",
) -> DataFrame:
    """Extract audio metadata per payload via mapInPandas.

    Output: (id_col, byte_len, sample_rate, n_channels, n_samples,
    duration_ms). `decode_backend='wav'` is a real parse of RIFF/PCM16
    bytes (functions/wav.py); `decode_backend='mp3'` is a real MPEG-1
    Layer III frame-header walk (functions/mp3.py — ID3v2 skip,
    bitrate/samplerate tables, spec frame-length formula; mono, 1152
    samples/frame). Codecs beyond those (flac/ogg/aac sample DECODE)
    need libraries absent from this container and raise
    NotImplementedError at the decode site.
    """
    out_schema = T.StructType(
        [df.schema[id_col]] + list(AUDIO_META_SCHEMA.fields)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from redskins_rule_spark.functions.wav import decode_wav

        for pdf in batches:
            if decode_backend == "mp3":
                from redskins_rule_spark.functions.mp3 import (
                    SAMPLES_PER_FRAME,
                    parse_mp3,
                )

                rows = []
                for b in pdf[payload_col]:
                    if b is None:
                        rows.append((None,) * 5)
                        continue
                    m = parse_mp3(bytes(b))
                    rows.append(
                        (len(b), m.sample_rate, 1,
                         m.n_frames * SAMPLES_PER_FRAME, m.duration_ms)
                    )
                meta_df = pd.DataFrame(
                    rows, columns=[f.name for f in AUDIO_META_SCHEMA.fields]
                )
                for col, dt in (
                    ("byte_len", "Int64"), ("sample_rate", "Int32"),
                    ("n_channels", "Int32"), ("n_samples", "Int64"),
                    ("duration_ms", "Int64"),
                ):
                    meta_df[col] = pd.array(meta_df[col], dtype=dt)
                meta_df.insert(0, id_col, pdf[id_col].values)
                yield meta_df
                continue
            if decode_backend != "wav":
                raise NotImplementedError(
                    "audio sample DECODE beyond PCM16 WAV requires a codec "
                    "library not present in this environment (mp3 FRAMING "
                    "has a real path: decode_backend='mp3'); plug it in here"
                )
            rows = []
            for b in pdf[payload_col]:
                if b is None:
                    rows.append((None,) * 5)
                    continue
                meta, _samples = decode_wav(bytes(b))
                rows.append(
                    (len(b), meta.sample_rate, meta.n_channels,
                     meta.n_samples, meta.duration_ms)
                )
            meta_df = pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_META_SCHEMA.fields]
            )
            for col, dt in (
                ("byte_len", "Int64"), ("sample_rate", "Int32"),
                ("n_channels", "Int32"), ("n_samples", "Int64"),
                ("duration_ms", "Int64"),
            ):
                meta_df[col] = pd.array(meta_df[col], dtype=dt)
            meta_df.insert(0, id_col, pdf[id_col].values)
            yield meta_df

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("byte_len", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("duration_cs", T.LongType()),
    ]
)


def with_gif_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize a REAL video payload column: a valid animated
    GIF89a per row (functions/gif.py), geometry and pixels derived
    deterministically from the source column's CHARACTER length
    (w = clen % 16 + 2, h = clen % 11 + 2, n_frames = clen % 5 + 1,
    delay 4 cs, frame f pixel (y,x) = (clen + 7f + 3y + x) % 256) — so
    an integer-arithmetic oracle (SQL ``length(text)``, character
    count) predicts metadata AND per-frame pixel sums while the decode
    side parses real LZW-coded frames."""
    from redskins_rule_spark.functions.gif import encode_gif, synth_frames

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[src_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    payloads.append(None)
                    continue
                clen = len(str(text))
                w, h, nf = clen % 16 + 2, clen % 11 + 2, clen % 5 + 1
                payloads.append(
                    encode_gif(synth_frames(clen, nf, w, h), w, h, delay_cs=4)
                )
            yield pd.DataFrame({id_col: pdf[id_col].values, out: payloads})

    return df.select(id_col, src_col).mapInPandas(run, out_schema)


def decode_video_meta(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decode_backend: str = "gif",
) -> DataFrame:
    """Video metadata per payload (frame count / dims / duration) via
    the cheap header-walk — no LZW decompression touched. Codecs
    beyond GIF need ffmpeg-class libraries and raise
    NotImplementedError at the decode site."""
    out_schema = T.StructType(
        [df.schema[id_col]] + list(VIDEO_META_SCHEMA.fields)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from redskins_rule_spark.functions.gif import decode_gif_meta

        for pdf in batches:
            if decode_backend != "gif":
                raise NotImplementedError(
                    "video decode beyond GIF needs a codec library (ffmpeg); "
                    "plug it in here (MP4 CONTAINER metadata has a real "
                    "path: decode_mp4_meta)"
                )
            rows = []
            for b in pdf[payload_col]:
                if b is None:
                    rows.append((None,) * 5)
                    continue
                m = decode_gif_meta(bytes(b))
                rows.append((len(b), m.width, m.height, m.n_frames, m.duration_cs))
            meta = pd.DataFrame(
                rows, columns=[f.name for f in VIDEO_META_SCHEMA.fields]
            )
            for col, dt in (
                ("byte_len", "Int64"), ("width", "Int32"), ("height", "Int32"),
                ("n_frames", "Int32"), ("duration_cs", "Int64"),
            ):
                meta[col] = pd.array(meta[col], dtype=dt)
            meta.insert(0, id_col, pdf[id_col].values)
            yield meta

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def sample_gif_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    stride: int = 2,
) -> DataFrame:
    """REAL frame sampling: LZW-decode every `stride`-th frame of each
    GIF payload and emit (frame_idx, pixel_sum) — the decode-then-
    featurize shape of a video ingestion pipeline, one-to-many over
    Arrow batches, frames never buffered whole-video-at-once beyond
    the single payload in hand."""
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("pixel_sum", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from redskins_rule_spark.functions.gif import decode_gif

        for pdf in batches:
            ids, idxs, sums = [], [], []
            for i_row in range(len(pdf)):
                b = pdf[payload_col].iloc[i_row]
                if b is None:
                    continue
                _, frames = decode_gif(bytes(b))
                for fi in range(0, len(frames), stride):
                    ids.append(pdf[id_col].iloc[i_row])
                    idxs.append(fi)
                    sums.append(sum(frames[fi]))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "pixel_sum": pd.array(sums, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


# --- video container (MP4 / ISO BMFF) -------------------------------------

MP4_META_SCHEMA = T.StructType(
    [
        T.StructField("byte_len", T.LongType()),
        T.StructField("major_brand", T.StringType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_tracks", T.IntegerType()),
        T.StructField("n_video_samples", T.IntegerType()),
        T.StructField("n_audio_samples", T.IntegerType()),
        T.StructField("mdat_bytes", T.LongType()),
    ]
)


def with_mp4_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize a REAL video-container payload column: a valid ISO
    BMFF MP4 per row (functions/mp4.py — ftyp/mdat/moov with full
    sample tables), derived deterministically from the source column's
    CHARACTER length via `synth_mp4` (video track always; audio track
    when clen % 3 == 0) — so integer arithmetic predicts container
    size, durations, and per-sample byte sums while the decode side
    runs a real box-walk parse."""
    from redskins_rule_spark.functions.mp4 import synth_mp4

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[src_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    payloads.append(None)
                    continue
                payloads.append(synth_mp4(len(str(text))))
            yield pd.DataFrame({id_col: pdf[id_col].values, out: payloads})

    return df.select(id_col, src_col).mapInPandas(run, out_schema)


def decode_mp4_meta(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Container metadata per MP4 payload via the box-walk parser —
    brand, movie duration, track/sample counts, mdat size. Header-and-
    table-only: no sample bytes are touched (the cheap path over
    billions of payloads; mdat is skipped by box size)."""
    out_schema = T.StructType([df.schema[id_col]] + list(MP4_META_SCHEMA.fields))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from redskins_rule_spark.functions.mp4 import parse_mp4

        for pdf in batches:
            rows = []
            for b in pdf[payload_col]:
                if b is None:
                    rows.append((None,) * 7)
                    continue
                m = parse_mp4(bytes(b))
                nv = sum(t.n_samples for t in m.tracks if t.handler == "vide")
                na = sum(t.n_samples for t in m.tracks if t.handler == "soun")
                rows.append(
                    (len(b), m.major_brand, m.duration_ms, len(m.tracks), nv, na, m.mdat_bytes)
                )
            meta = pd.DataFrame(
                rows, columns=[f.name for f in MP4_META_SCHEMA.fields]
            )
            for col, dt in (
                ("byte_len", "Int64"), ("duration_ms", "Int64"),
                ("n_tracks", "Int32"), ("n_video_samples", "Int32"),
                ("n_audio_samples", "Int32"), ("mdat_bytes", "Int64"),
            ):
                meta[col] = pd.array(meta[col], dtype=dt)
            meta.insert(0, id_col, pdf[id_col].values)
            yield meta

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def sample_mp4_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    handler: str = "vide",
    stride: int = 1,
) -> DataFrame:
    """REAL container-level frame sampling: resolve each MP4 payload's
    sample table (stsc/stsz/stco) and slice every `stride`-th sample
    of the `handler` track out of mdat, emitting (frame_idx,
    frame_len, frame_sum). This is the half of video frame-sampling a
    container format defines; DECODING the extracted access units
    (H.264/AAC/...) needs ffmpeg-class codecs and remains the
    documented seam (`sample_frames` backend='real'). One-to-many over
    Arrow batches; only one payload is resident at a time."""
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_len", T.IntegerType()),
            T.StructField("frame_sum", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from redskins_rule_spark.functions.mp4 import extract_samples, parse_mp4

        for pdf in batches:
            ids, idxs, lens, sums = [], [], [], []
            for i_row in range(len(pdf)):
                b = pdf[payload_col].iloc[i_row]
                if b is None:
                    continue
                data = bytes(b)
                meta = parse_mp4(data)
                for t in meta.tracks:
                    if t.handler != handler:
                        continue
                    for fi, sample in extract_samples(data, t, stride=stride):
                        ids.append(pdf[id_col].iloc[i_row])
                        idxs.append(fi)
                        lens.append(len(sample))
                        sums.append(sum(sample))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame_len": pd.array(lens, dtype="int32"),
                    "frame_sum": pd.array(sums, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


# --- compressed audio framing (MP3 / MPEG-1 Layer III) ---------------------

MP3_STATS_SCHEMA = T.StructType(
    [
        T.StructField("byte_len", T.LongType()),
        T.StructField("id3_bytes", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sum_kbps", T.LongType()),
        T.StructField("is_vbr", T.BooleanType()),
    ]
)


def with_mp3_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize a REAL compressed-audio payload column: a valid
    MPEG-1 Layer III frame stream per row (functions/mp3.py — ID3v2
    tag + spec-sized frames), derived deterministically from the
    source column's CHARACTER length via `synth_mp3` (CBR when
    clen % 4 == 0, VBR otherwise) — so integer arithmetic predicts
    stream size, frame count, duration, and bitrate stats while the
    decode side walks real sync words and length formulas."""
    from redskins_rule_spark.functions.mp3 import synth_mp3

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[src_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    payloads.append(None)
                    continue
                payloads.append(synth_mp3(len(str(text))))
            yield pd.DataFrame({id_col: pdf[id_col].values, out: payloads})

    return df.select(id_col, src_col).mapInPandas(run, out_schema)


def decode_mp3_stats(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Bitrate-level stream stats per MP3 payload: frame count, exact
    duration, summed per-frame bitrate (for exact-integer average
    computation downstream), and a VBR flag — the header-walk-only
    cheap path (no frame bodies touched)."""
    out_schema = T.StructType([df.schema[id_col]] + list(MP3_STATS_SCHEMA.fields))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from redskins_rule_spark.functions.mp3 import parse_mp3

        for pdf in batches:
            rows = []
            for b in pdf[payload_col]:
                if b is None:
                    rows.append((None,) * 7)
                    continue
                m = parse_mp3(bytes(b))
                rows.append(
                    (len(b), m.id3_bytes, m.n_frames, m.sample_rate,
                     m.duration_ms, sum(m.bitrates_kbps), m.is_vbr)
                )
            meta = pd.DataFrame(
                rows, columns=[f.name for f in MP3_STATS_SCHEMA.fields]
            )
            for col, dt in (
                ("byte_len", "Int64"), ("id3_bytes", "Int32"),
                ("n_frames", "Int32"), ("sample_rate", "Int32"),
                ("duration_ms", "Int64"), ("sum_kbps", "Int64"),
                ("is_vbr", "boolean"),
            ):
                meta[col] = pd.array(meta[col], dtype=dt)
            meta.insert(0, id_col, pdf[id_col].values)
            yield meta

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def sample_mp3_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    stride: int = 1,
) -> DataFrame:
    """REAL frame extraction: slice every `stride`-th Layer III frame
    body out of the stream by the spec length formula and emit
    (frame_idx, body_len, body_sum) — proving the walk reads payload
    bytes. Layer III DECODE of those bodies (huffman/IMDCT) stays the
    documented seam."""
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("body_len", T.IntegerType()),
            T.StructField("body_sum", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from redskins_rule_spark.functions.mp3 import extract_frames

        for pdf in batches:
            ids, idxs, lens, sums = [], [], [], []
            for i_row in range(len(pdf)):
                b = pdf[payload_col].iloc[i_row]
                if b is None:
                    continue
                for fi, body in extract_frames(bytes(b), stride=stride):
                    ids.append(pdf[id_col].iloc[i_row])
                    idxs.append(fi)
                    lens.append(len(body))
                    sums.append(sum(body))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "body_len": pd.array(lens, dtype="int32"),
                    "body_sum": pd.array(sums, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


# --- mixed-media front door: sniff + dispatch ------------------------------

MEDIA_FORMATS = ("bmp", "png", "gif", "jpeg", "wav", "mp3", "mp4", "aac")


def sniff_format(data: bytes) -> str:
    """Container identification by magic bytes — the first stage of a
    mixed-media ingestion front door. Returns one of MEDIA_FORMATS or
    'unknown'. Pure prefix checks; never throws."""
    if len(data) >= 8 and data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if len(data) >= 8 and data[4:8] == b"ftyp":
        return "mp4"
    if (
        len(data) >= 2
        and data[0] == 0xFF
        and (data[1] & 0xF0) == 0xF0
        and ((data[1] >> 1) & 3) == 0
    ):
        # 0xFFF sync with layer bits 00 = ADTS; MP3's Layer III sets
        # layer bits 01, so the two syncs never collide
        return "aac"
    if data[:3] == b"ID3" or (
        len(data) >= 2 and data[0] == 0xFF and (data[1] >> 5) == 0b111
    ):
        return "mp3"
    if data[:2] == b"BM":
        return "bmp"
    return "unknown"


MEDIA_STATS_SCHEMA = T.StructType(
    [
        T.StructField("fmt", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def sniff_media_stats(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """The mixed-corpus decode front door: sniff each payload's format
    by magic bytes, dispatch to the matching real codec, emit a
    unified metadata row — images report (width, height), audio/video
    report (n_frames, duration_ms), GIF reports all four. Unknown
    magic → fmt='unknown'; a payload whose own codec REJECTS it
    (truncation/corruption ValueError) → fmt='quarantined' — the
    per-row attribution contract every codec in functions/ shares is
    exactly what makes this dispatch safe (no exception class ever
    kills the task). Arrow-batched mapInPandas; one payload resident
    at a time."""
    out_schema = T.StructType([df.schema[id_col]] + list(MEDIA_STATS_SCHEMA.fields))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from redskins_rule_spark.functions.aac import parse_adts
        from redskins_rule_spark.functions.bmp import decode_bmp_meta
        from redskins_rule_spark.functions.gif import decode_gif_meta
        from redskins_rule_spark.functions.jpeg import decode_jpeg_dims
        from redskins_rule_spark.functions.mp3 import parse_mp3
        from redskins_rule_spark.functions.mp4 import parse_mp4
        from redskins_rule_spark.functions.png import decode_png
        from redskins_rule_spark.functions.wav import decode_wav

        def one(data: bytes):
            fmt = sniff_format(data)
            w = h = nf = dur = None
            try:
                if fmt == "bmp":
                    w, h, _depth = decode_bmp_meta(data)
                elif fmt == "png":
                    meta, _px = decode_png(data)
                    w, h = meta.width, meta.height
                elif fmt == "gif":
                    m = decode_gif_meta(data)
                    w, h, nf = m.width, m.height, m.n_frames
                    dur = m.duration_cs * 10
                elif fmt == "jpeg":
                    # profile chain gray -> color -> progressive
                    # (ADVICE r7): valid color/progressive JPEGs are
                    # real decodes here, not 'quarantined'
                    w, h = decode_jpeg_dims(data)
                elif fmt == "wav":
                    m, _samples = decode_wav(data)
                    nf, dur = m.n_samples, m.duration_ms
                elif fmt == "mp3":
                    m = parse_mp3(data)
                    nf, dur = m.n_frames, m.duration_ms
                elif fmt == "aac":
                    m = parse_adts(data)
                    nf, dur = m.n_frames, m.duration_ms
                elif fmt == "mp4":
                    m = parse_mp4(data)
                    nf = sum(
                        t.n_samples for t in m.tracks if t.handler == "vide"
                    )
                    dur = m.duration_ms
            except ValueError:
                return ("quarantined", None, None, None, None)
            return (fmt, w, h, nf, dur)

        for pdf in batches:
            rows = [
                ("missing", None, None, None, None)
                if b is None
                else one(bytes(b))
                for b in pdf[payload_col]
            ]
            meta = pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_STATS_SCHEMA.fields]
            )
            for col, dt in (
                ("width", "Int32"), ("height", "Int32"),
                ("n_frames", "Int64"), ("duration_ms", "Int64"),
            ):
                meta[col] = pd.array(meta[col], dtype=dt)
            meta.insert(0, id_col, pdf[id_col].values)
            yield meta

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def with_mixed_media_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """One column, nine payload classes by `id % 9` — every real codec
    family plus a truncated-MP4 (quarantine class) and a bad-magic
    blob (unknown class). Each class reuses its family's established
    deterministic generator, so the per-class oracles of
    q23b/q123/q98/q165/q84/q189/q187 predict this mixed column too."""
    import numpy as np

    from redskins_rule_spark.functions.bmp import encode_bmp
    from redskins_rule_spark.functions.gif import encode_gif, synth_frames
    from redskins_rule_spark.functions.jpeg import (
        encode_jpeg_gray,
        synth_dc_blocks,
    )
    from redskins_rule_spark.functions.mp3 import synth_mp3
    from redskins_rule_spark.functions.mp4 import synth_mp4
    from redskins_rule_spark.functions.png import encode_png, synth_pixels
    from redskins_rule_spark.functions.wav import encode_wav, synth_samples

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.BinaryType())]
    )

    def make(doc_id: int, text: str) -> bytes:
        clen = len(text)
        r = doc_id % 9
        if r == 0:
            blen = len(text.encode("utf-8"))
            w, h = blen % 31 + 1, blen % 17 + 1
            ys = np.arange(h)[:, None, None]
            xs = np.arange(w)[None, :, None]
            cs = np.arange(3)[None, None, :]
            return encode_bmp(((xs + ys + cs + blen) % 256).astype(np.uint8))
        if r == 1:
            w, h = clen % 13 + 1, clen % 7 + 1
            return encode_png(synth_pixels(clen, w, h), w, h)
        if r == 2:
            w, h, nf = clen % 16 + 2, clen % 11 + 2, clen % 5 + 1
            return encode_gif(synth_frames(clen, nf, w, h), w, h, delay_cs=4)
        if r == 3:
            wb, hb = clen % 4 + 1, clen % 3 + 1
            return encode_jpeg_gray(synth_dc_blocks(clen, wb, hb), wb, hb)
        if r == 4:
            return encode_wav(synth_samples(clen, clen % 97 + 8), 8000, 1)
        if r == 5:
            return synth_mp3(clen)
        if r == 6:
            return synth_mp4(clen)
        if r == 7:  # quarantine class: every mp4 prefix raises
            full = synth_mp4(clen)
            return full[: max(10, len(full) // 2)]
        return b"\x00\x00??" + text.encode("utf-8")  # unknown magic

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf[id_col], pdf[src_col]):
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    payloads.append(None)
                    continue
                payloads.append(make(int(doc_id), str(text)))
            yield pd.DataFrame({id_col: pdf[id_col].values, out: payloads})

    return df.select(id_col, src_col).mapInPandas(run, out_schema)


# --- image (PNG, DEFLATE-compressed) --------------------------------------


def with_png_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize a REAL compressed image payload column: a valid
    8-bit RGB PNG per row (functions/png.py — stdlib zlib DEFLATE),
    geometry and pixels derived deterministically from the source
    column's CHARACTER length (w = clen % 13 + 1, h = clen % 7 + 1,
    pixel (y,x,c) = (clen + 5y + 3x + c) % 256) so integer arithmetic
    predicts decoded dimensions AND pixel sums while the decode side
    runs a real inflate + unfilter. Arrow-batched; payload bytes never
    touch the driver. Note: the COMPRESSED byte length is not
    arithmetic-predictable (DEFLATE), so oracles check decoded values,
    not payload size."""
    from redskins_rule_spark.functions.png import encode_png, synth_pixels

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[src_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    payloads.append(None)
                    continue
                clen = len(str(text))
                w, h = clen % 13 + 1, clen % 7 + 1
                payloads.append(encode_png(synth_pixels(clen, w, h), w, h))
            yield pd.DataFrame({id_col: pdf[id_col].values, out: payloads})

    return df.select(id_col, src_col).mapInPandas(run, out_schema)


PNG_STATS_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("pixel_sum", T.LongType()),
    ]
)


def decode_png_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Full real PNG decode per payload (CRC check, zlib inflate,
    filter reversal) → (id, width, height, pixel_sum). NULL payloads
    yield NULL stats. Arrow-batched mapInPandas; the inflated pixel
    buffer lives only inside the batch."""
    from redskins_rule_spark.functions.png import decode_png

    out_schema = T.StructType(
        [df.schema[id_col]] + list(PNG_STATS_SCHEMA.fields)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, sums = [], [], []
            for b in pdf[payload_col]:
                if b is None:
                    ws.append(None); hs.append(None); sums.append(None)
                    continue
                meta, pixels = decode_png(bytes(b))
                ws.append(meta.width)
                hs.append(meta.height)
                sums.append(sum(pixels))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "pixel_sum": pd.array(sums, dtype="Int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def audio_frame_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame_len: int = 64,
) -> DataFrame:
    """Frame-level audio features over REAL decoded PCM16 — the
    feature-extraction stage of an audio training pipeline (energy /
    silence detection, VAD pre-filtering): per non-overlapping frame of
    `frame_len` samples emit sum of squares (RMS numerator), peak
    |amplitude|, and the within-frame zero-crossing count (sign rule:
    s >= 0 is positive). The final partial frame is kept.

    All features are INTEGERS so the cross-engine contract is exact —
    no float RMS rounding to negotiate. Arrow mapInPandas with numpy
    frame slicing; payload bytes never enter JVM row format. One
    output row per (payload, frame): explode happens Python-side so a
    60-minute file streams as frames, not one giant array row.
    """
    import numpy as np

    out_schema = T.StructType(
        [df.schema[id_col]]
        + [
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("n_in_frame", T.IntegerType()),
            T.StructField("sum_sq", T.LongType()),
            T.StructField("peak", T.IntegerType()),
            T.StructField("zero_crossings", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from redskins_rule_spark.functions.wav import decode_wav

        for pdf in batches:
            ids, fidx, nin, ssq, pk, zc = [], [], [], [], [], []
            for rid, b in zip(pdf[id_col], pdf[payload_col]):
                if b is None:
                    continue
                _meta, samples = decode_wav(bytes(b))
                s = np.asarray(samples, dtype=np.int64)
                for f in range(0, max(len(s), 1), frame_len):
                    fr = s[f : f + frame_len]
                    if len(fr) == 0:
                        continue
                    ids.append(rid)
                    fidx.append(f // frame_len)
                    nin.append(len(fr))
                    ssq.append(int(np.sum(fr * fr)))
                    pk.append(int(np.max(np.abs(fr))))
                    nonneg = fr >= 0
                    zc.append(int(np.sum(nonneg[1:] != nonneg[:-1])))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "frame_idx": fidx,
                    "n_in_frame": nin,
                    "sum_sq": ssq,
                    "peak": pk,
                    "zero_crossings": zc,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def image_patches(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    patch: int = 8,
    decode_backend: str = "bmp",
) -> DataFrame:
    """ViT-style patch extraction over REAL decoded pixels: tile each
    image into `patch`×`patch` blocks (partial edge tiles kept) and
    emit per-tile integer statistics — the patchify stage of a vision
    training pipeline, minus the learned projection. One output row
    per (image, tile); tiling happens Python-side on the numpy pixel
    array, so a 4k image streams as tiles, never as one giant row.

    Integer features (per-channel sums + total) keep the cross-engine
    contract exact. `decode_backend='bmp'` parses actual BMP bytes
    (functions/bmp.py); compressed formats route through their own
    decoders or raise at the decode site, same boundary as
    decode_image_meta.
    """
    import numpy as np

    out_schema = T.StructType(
        [df.schema[id_col]]
        + [
            T.StructField("patch_row", T.IntegerType()),
            T.StructField("patch_col", T.IntegerType()),
            T.StructField("tile_h", T.IntegerType()),
            T.StructField("tile_w", T.IntegerType()),
            T.StructField("sum_r", T.LongType()),
            T.StructField("sum_g", T.LongType()),
            T.StructField("sum_b", T.LongType()),
            T.StructField("pixel_sum", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from redskins_rule_spark.functions.bmp import decode_bmp
        from redskins_rule_spark.functions.png import decode_png

        for pdf in batches:
            out: dict[str, list] = {k.name: [] for k in out_schema.fields}
            for rid, b in zip(pdf[id_col], pdf[payload_col]):
                if b is None:
                    continue
                if decode_backend == "bmp":
                    px = decode_bmp(bytes(b)).astype(np.int64)  # (h, w, 3) RGB
                elif decode_backend == "png":
                    meta, pixels = decode_png(bytes(b))
                    px = (
                        np.frombuffer(pixels, dtype=np.uint8)
                        .reshape(meta.height, meta.width, meta.channels)
                        .astype(np.int64)
                    )
                else:
                    raise NotImplementedError(
                        "patch extraction beyond BMP/PNG needs the matching "
                        "decoder (JPEG etc. require external codecs)"
                    )
                h, w = px.shape[:2]
                for pr in range(0, (h + patch - 1) // patch):
                    for pc in range(0, (w + patch - 1) // patch):
                        tile = px[pr * patch:(pr + 1) * patch,
                                  pc * patch:(pc + 1) * patch]
                        sums = tile.sum(axis=(0, 1))
                        out[id_col].append(rid)
                        out["patch_row"].append(pr)
                        out["patch_col"].append(pc)
                        out["tile_h"].append(tile.shape[0])
                        out["tile_w"].append(tile.shape[1])
                        out["sum_r"].append(int(sums[0]))
                        out["sum_g"].append(int(sums[1]))
                        out["sum_b"].append(int(sums[2]))
                        out["pixel_sum"].append(int(sums.sum()))
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def frame_deltas(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Scene-change signal over video payloads: mean absolute pixel
    delta between consecutive frames (one row per transition:
    id, f = later frame index, mad). Keyframe selection is then a
    filter (mad > threshold) or `topk_per_group` over this output —
    the standard cheap shot-boundary detector before sampling frames
    for vision training.

    Real decode path (functions/gif.py LZW); Arrow `mapInPandas`
    streaming batches, payload bytes never enter JVM row format.
    NULL / single-frame payloads emit no rows.
    """
    from redskins_rule_spark.functions.gif import decode_gif

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("f", T.IntegerType()),
            T.StructField("mad", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, fs, mads = [], [], []
            for pid, data in zip(pdf[id_col], pdf[payload_col]):
                if data is None:
                    continue
                meta, frames = decode_gif(bytes(data))
                size = meta.width * meta.height
                prev = None
                for f, raw in enumerate(frames):
                    cur = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                    if prev is not None:
                        ids.append(pid)
                        fs.append(f)
                        mads.append(float(np.abs(cur - prev).sum()) / size)
                    prev = cur
            yield pd.DataFrame(
                {
                    id_col: pd.array(ids),
                    "f": pd.array(fs, dtype="int32"),
                    "mad": pd.array(mads, dtype="float64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def image_dhash(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id",
    decode_backend: str = "bmp",
) -> DataFrame:
    """Perceptual difference-hash of image payloads — the image-corpus
    near-dup primitive (visually-similar images land within small
    Hamming distance; exact byte hashing misses recompressed copies).

    Classic dHash: sample a 9×8 luminance grid (nearest-neighbor at
    sx = xt·w//9, sy = yt·h//8 — integer-exact, no resampling
    filter), emit one bit per horizontal gradient (right > left),
    64 bits packed as two 32-bit halves (dhash_hi, dhash_lo) so no
    value ever touches the bigint sign bit. Luminance is the plain
    channel SUM (integer-exact; weights would need fixed-point
    contracts for cross-engine hashing).

    Hamming pairing downstream reuses the SimHash machinery
    (dedup.hamming64 / pigeonhole blocking) on hi/lo halves. Real
    decode path; Arrow mapInPandas. NULL payloads emit NULL hashes.
    """
    if decode_backend != "bmp":
        raise NotImplementedError(
            "dhash: only the bmp backend is wired in this container"
        )
    from redskins_rule_spark.functions.bmp import decode_bmp

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("dhash_hi", T.LongType()),
            T.StructField("dhash_lo", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, his, los = [], [], []
            for pid, data in zip(pdf[id_col], pdf[payload_col]):
                ids.append(pid)
                if data is None:
                    his.append(None)
                    los.append(None)
                    continue
                px = decode_bmp(bytes(data)).astype(np.int64)
                h, w = px.shape[0], px.shape[1]
                gray = px.sum(axis=2)
                hi = lo = 0
                for yt in range(8):
                    sy = (yt * h) // 8
                    for xt in range(8):
                        g0 = int(gray[sy, (xt * w) // 9])
                        g1 = int(gray[sy, ((xt + 1) * w) // 9])
                        if g1 > g0:
                            k = yt * 8 + xt
                            if k < 32:
                                lo |= 1 << k
                            else:
                                hi |= 1 << (k - 32)
                his.append(hi)
                los.append(lo)
            yield pd.DataFrame(
                {
                    id_col: pd.array(ids),
                    "dhash_hi": pd.array(his, dtype="Int64"),
                    "dhash_lo": pd.array(los, dtype="Int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def with_jpeg_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize a REAL baseline-JPEG payload column (grayscale
    SOF0, functions/jpeg.py — Annex K tables, canonical Huffman,
    byte-stuffed entropy stream). Geometry and block DC values derive
    from the source column's CHARACTER length (wb = clen % 4 + 1,
    hb = clen % 3 + 1, block b quantized DC = ((clen + 7b) % 64) -
    32) so integer arithmetic predicts the DECODED dimensions and
    pixel sums while the decode side runs a real Huffman + IDCT
    pipeline. Blocks are DC-only BY CONSTRUCTION here (float cosines
    aren't SQL-portable); the decoder itself handles AC energy, which
    pytest pins against a direct IDCT reference. Arrow-batched;
    payload bytes never touch the driver."""
    from redskins_rule_spark.functions.jpeg import (
        encode_jpeg_gray,
        synth_dc_blocks,
    )

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[src_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    payloads.append(None)
                    continue
                clen = len(str(text))
                wb, hb = clen % 4 + 1, clen % 3 + 1
                payloads.append(
                    encode_jpeg_gray(synth_dc_blocks(clen, wb, hb), wb, hb)
                )
            yield pd.DataFrame({id_col: pdf[id_col].values, out: payloads})

    return df.select(id_col, src_col).mapInPandas(run, out_schema)


def decode_jpeg_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Full real baseline-JPEG decode per payload (marker walk with
    DQT/DHT read from the FILE, canonical Huffman decode, DC
    prediction, dequantize, dezigzag, 2D IDCT, level shift) →
    (id, width, height, pixel_sum). NULL payloads yield NULL stats.
    Arrow-batched mapInPandas; pixel buffers live only inside the
    batch."""
    from redskins_rule_spark.functions.jpeg import decode_jpeg_gray

    out_schema = T.StructType(
        [df.schema[id_col]] + list(PNG_STATS_SCHEMA.fields)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, sums = [], [], []
            for b in pdf[payload_col]:
                if b is None:
                    ws.append(None); hs.append(None); sums.append(None)
                    continue
                w, h, pixels = decode_jpeg_gray(bytes(b))
                ws.append(w)
                hs.append(h)
                sums.append(sum(pixels))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "pixel_sum": pd.array(sums, dtype="Int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def with_jpeg_progressive_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize a REAL progressive-JPEG payload column (grayscale
    SOF2, functions/jpeg.py — spectral selection + successive
    approximation over a four-scan script: DC first pass at Al=1, the
    full AC band at Al=1, then both refinements down to Al=0).
    Geometry and DCs derive from the source column's CHARACTER length
    (wb = clen % 5 + 1, hb = clen % 2 + 1, block b quantized DC =
    ((clen + 9b) % 64) - 32 — a different step than the baseline
    payload so the two differentials aren't byte-identical), keeping
    decoded pixels on the same 2*dc + 128 closed form a SQL oracle
    recomputes, while the decode side accumulates coefficients across
    all four scans. Arrow-batched; payloads never touch the driver."""
    from redskins_rule_spark.functions.jpeg import (
        encode_jpeg_gray_progressive,
        synth_dc_blocks,
    )

    scans = [(0, 0, 0, 1), (1, 63, 0, 1), (0, 0, 1, 0), (1, 63, 1, 0)]
    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[src_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    payloads.append(None)
                    continue
                clen = len(str(text))
                wb, hb = clen % 5 + 1, clen % 2 + 1
                payloads.append(
                    encode_jpeg_gray_progressive(
                        synth_dc_blocks(clen, wb, hb, step=9),
                        wb, hb, scans=scans,
                    )
                )
            yield pd.DataFrame({id_col: pdf[id_col].values, out: payloads})

    return df.select(id_col, src_col).mapInPandas(run, out_schema)


def decode_jpeg_progressive_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Full progressive (SOF2) JPEG decode per payload — the scan-by-
    scan coefficient accumulation (DC first/refine, AC band first
    passes with EOBn runs, AC refinement correction bits), validated
    approximation chain, then one dequantize + IDCT pass →
    (id, width, height, pixel_sum). A baseline (SOF0) payload raises
    here, exactly as SOF2 raises in the baseline decoder — the stats
    prove the progressive path end to end. NULL payloads yield NULL
    stats. Arrow-batched mapInPandas."""
    from redskins_rule_spark.functions.jpeg import decode_jpeg_progressive

    out_schema = T.StructType(
        [df.schema[id_col]] + list(PNG_STATS_SCHEMA.fields)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, sums = [], [], []
            for b in pdf[payload_col]:
                if b is None:
                    ws.append(None); hs.append(None); sums.append(None)
                    continue
                w, h, pixels = decode_jpeg_progressive(bytes(b))
                ws.append(w)
                hs.append(h)
                sums.append(sum(pixels))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "pixel_sum": pd.array(sums, dtype="Int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def with_jpeg_color_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize a REAL baseline 4:2:0 COLOR JPEG payload column
    (3-component YCbCr SOF0, functions/jpeg.py — Annex K luma+chroma
    tables, interleaved MCU scan, per-component DC prediction).
    Geometry and block DCs derive from the source column's CHARACTER
    length (w_mcus = clen % 3 + 1, h_mcus = clen % 2 + 1; DC formulas
    in synth_dc_blocks_color) so integer arithmetic predicts the
    DECODED dimensions and per-channel RGB sums while the decode side
    runs a real Huffman + IDCT + upsample + color-convert pipeline.
    Blocks are DC-only BY CONSTRUCTION here; AC energy is pinned
    against a direct IDCT reference in pytest. Arrow-batched; payload
    bytes never touch the driver."""
    from redskins_rule_spark.functions.jpeg import (
        encode_jpeg_color,
        synth_dc_blocks_color,
    )

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[src_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    payloads.append(None)
                    continue
                clen = len(str(text))
                wm, hm = clen % 3 + 1, clen % 2 + 1
                yb, cbb, crb = synth_dc_blocks_color(clen, wm, hm)
                payloads.append(encode_jpeg_color(yb, cbb, crb, wm, hm))
            yield pd.DataFrame({id_col: pdf[id_col].values, out: payloads})

    return df.select(id_col, src_col).mapInPandas(run, out_schema)


def decode_jpeg_color_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Full real 4:2:0 color JPEG decode per payload (marker walk with
    tables read from the FILE, interleaved-MCU Huffman decode with
    per-component DC prediction, dequantize + 2D IDCT, 2x2 chroma
    replication upsample, JFIF YCbCr->RGB with floor(x+0.5) rounding)
    → (id, width, height, r_sum, g_sum, b_sum). NULL payloads yield
    NULL stats. Arrow-batched mapInPandas; pixel buffers live only
    inside the batch."""
    import numpy as np

    from redskins_rule_spark.functions.jpeg import decode_jpeg_color

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("r_sum", T.LongType()),
            T.StructField("g_sum", T.LongType()),
            T.StructField("b_sum", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, rs, gs, bs = [], [], [], [], []
            for b in pdf[payload_col]:
                if b is None:
                    ws.append(None); hs.append(None)
                    rs.append(None); gs.append(None); bs.append(None)
                    continue
                w, h, rgb = decode_jpeg_color(bytes(b))
                arr = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3)
                ws.append(w)
                hs.append(h)
                rs.append(int(arr[:, 0].sum(dtype=np.int64)))
                gs.append(int(arr[:, 1].sum(dtype=np.int64)))
                bs.append(int(arr[:, 2].sum(dtype=np.int64)))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "r_sum": pd.array(rs, dtype="Int64"),
                    "g_sum": pd.array(gs, dtype="Int64"),
                    "b_sum": pd.array(bs, dtype="Int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def with_jpeg_progressive_color_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize a REAL progressive 4:2:0 COLOR JPEG payload column
    (3-component YCbCr SOF2, functions/jpeg.py — the VERDICT r7
    item 2 composition: interleaved-DC scans with per-component
    prediction, per-component AC band scans, successive approximation
    on both). Geometry derives from character length with the axes
    SWAPPED versus the baseline color payload (w_mcus = clen % 2 + 1,
    h_mcus = clen % 3 + 1) so the two color differentials predict
    different answers from different payload bytes while sharing the
    synth-block DC family (same `synth_dc_blocks_color` closed
    forms). Arrow-batched; payloads never touch the driver."""
    from redskins_rule_spark.functions.jpeg import (
        encode_jpeg_color_progressive,
        synth_dc_blocks_color,
    )

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[src_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    payloads.append(None)
                    continue
                clen = len(str(text))
                wm, hm = clen % 2 + 1, clen % 3 + 1
                yb, cbb, crb = synth_dc_blocks_color(clen, wm, hm)
                payloads.append(
                    encode_jpeg_color_progressive(yb, cbb, crb, wm, hm)
                )
            yield pd.DataFrame({id_col: pdf[id_col].values, out: payloads})

    return df.select(id_col, src_col).mapInPandas(run, out_schema)


def decode_jpeg_progressive_color_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Full progressive 4:2:0 color JPEG decode per payload — per-
    component coefficient accumulation across the scan script
    (interleaved DC walk, per-component AC bands, validated
    approximation chains), one dequantize + IDCT per component, 2x2
    chroma replication, JFIF YCbCr->RGB → (id, width, height, r_sum,
    g_sum, b_sum). A baseline (SOF0) payload raises here, exactly as
    SOF2 raises in the baseline decoders. NULL payloads yield NULL
    stats. Arrow-batched mapInPandas."""
    import numpy as np

    from redskins_rule_spark.functions.jpeg import (
        decode_jpeg_progressive_color,
    )

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("r_sum", T.LongType()),
            T.StructField("g_sum", T.LongType()),
            T.StructField("b_sum", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, rs, gs, bs = [], [], [], [], []
            for b in pdf[payload_col]:
                if b is None:
                    ws.append(None); hs.append(None)
                    rs.append(None); gs.append(None); bs.append(None)
                    continue
                w, h, rgb = decode_jpeg_progressive_color(bytes(b))
                arr = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3)
                ws.append(w)
                hs.append(h)
                rs.append(int(arr[:, 0].sum(dtype=np.int64)))
                gs.append(int(arr[:, 1].sum(dtype=np.int64)))
                bs.append(int(arr[:, 2].sum(dtype=np.int64)))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "r_sum": pd.array(rs, dtype="Int64"),
                    "g_sum": pd.array(gs, dtype="Int64"),
                    "b_sum": pd.array(bs, dtype="Int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def with_mp3_granule_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize a REAL granule-bearing MP3 payload column (mono
    MPEG-1 Layer III with real 17-byte side info and real scalefactor
    sections, scfsi copy semantics included; spectra are spec-valid
    digital silence — functions/mp3.py `synth_mp3_granules` closed
    forms). Arrow-batched; payloads never touch the driver."""
    from redskins_rule_spark.functions.mp3 import synth_mp3_granules

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[src_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    payloads.append(None)
                    continue
                payloads.append(synth_mp3_granules(len(str(text))))
            yield pd.DataFrame({id_col: pdf[id_col].values, out: payloads})

    return df.select(id_col, src_col).mapInPandas(run, out_schema)


def decode_mp3_sideinfo_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL Layer III entropy-structure decode per payload — the full
    side-info bit parse plus the scalefactor section of main_data
    (scfsi copies resolved to granule 0's decoded values) →
    (id, n_frames, gain_sum, part23_sum, sf_sum, spectral_bits_sum).
    Every output is an integer fold over REALLY DECODED bit fields,
    so a SQL oracle predicts them exactly; `spectral_bits_sum` counts
    the Huffman payload bits this engine does NOT decode (the
    documented seam — 0 for silence granules). NULL payloads yield
    NULL stats. Arrow-batched mapInPandas."""
    from redskins_rule_spark.functions.mp3 import parse_mp3_granules

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("n_frames", T.LongType()),
            T.StructField("gain_sum", T.LongType()),
            T.StructField("part23_sum", T.LongType()),
            T.StructField("sf_sum", T.LongType()),
            T.StructField("spectral_bits_sum", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[payload_col]:
                if b is None:
                    rows.append((None,) * 5)
                    continue
                infos = parse_mp3_granules(bytes(b))
                gain = p23 = sf = spec = 0
                for fi in infos:
                    for gr in fi.granules:
                        gain += gr.global_gain
                        p23 += gr.part2_3_length
                        sf += sum(gr.scalefactors)
                        spec += gr.spectral_bits
                rows.append((len(infos), gain, p23, sf, spec))
            cols = ["n_frames", "gain_sum", "part23_sum", "sf_sum",
                    "spectral_bits_sum"]
            meta = pd.DataFrame(rows, columns=cols)
            for c in cols:
                meta[c] = pd.array(meta[c], dtype="Int64")
            meta.insert(0, id_col, pdf[id_col].values)
            yield meta

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def with_mp4_avc_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize MP4 payloads whose video samples carry REAL H.264
    Annex B NAL streams (functions/avc.py): start codes, emulation
    prevention, NAL headers, a decodable SPS (geometry in
    Exp-Golomb), a decodable PPS head — slice BODIES opaque by
    design (`functions/mp4.py synth_mp4_avc` closed forms).
    Arrow-batched; payloads never touch the driver."""
    from redskins_rule_spark.functions.mp4 import synth_mp4_avc

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[src_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    payloads.append(None)
                    continue
                payloads.append(synth_mp4_avc(len(str(text))))
            yield pd.DataFrame({id_col: pdf[id_col].values, out: payloads})

    return df.select(id_col, src_col).mapInPandas(run, out_schema)


def decode_avc_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL container + NAL-structure + SPS-geometry decode per MP4
    payload: box walk → sample-table slice of every video sample out
    of mdat → Annex B NAL parse (start codes, emulation-prevention
    de-escape, header validation) → Exp-Golomb SPS decode for
    width/height/profile/level and PPS head for the CAVLC/CABAC
    selector → (id, width, height, profile, level, cabac, n_nals,
    n_idr). The video dimensions come from the STREAM's parameter
    set, not the container's tkhd — the number a real pipeline
    trusts. Slice-body entropy decode is the documented seam. NULL
    payloads yield NULL stats; corrupt ones raise ValueError (wrap in
    decode_stats_tolerant-style quarantine upstream when needed)."""
    from redskins_rule_spark.functions.avc import (
        parse_nal_stream,
        parse_pps_head,
        parse_sps,
    )
    from redskins_rule_spark.functions.mp4 import extract_samples, parse_mp4

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("profile", T.IntegerType()),
            T.StructField("level", T.IntegerType()),
            T.StructField("cabac", T.IntegerType()),
            T.StructField("n_nals", T.LongType()),
            T.StructField("n_idr", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[payload_col]:
                if b is None:
                    rows.append((None,) * 7)
                    continue
                data = bytes(b)
                meta = parse_mp4(data)
                sps = pps = None
                n_nals = n_idr = 0
                for track in meta.tracks:
                    if track.handler != "vide":
                        continue
                    for _i, sample in extract_samples(data, track):
                        for nal in parse_nal_stream(sample):
                            n_nals += 1
                            if nal.nal_type == 7:
                                sps = parse_sps(nal.rbsp)
                            elif nal.nal_type == 8:
                                pps = parse_pps_head(nal.rbsp)
                            elif nal.nal_type == 5:
                                n_idr += 1
                if sps is None or pps is None:
                    raise ValueError("avc: stream carries no SPS/PPS")
                rows.append(
                    (sps.width, sps.height, sps.profile_idc, sps.level_idc,
                     pps.entropy_coding_mode, n_nals, n_idr)
                )
            cols = ["width", "height", "profile", "level", "cabac",
                    "n_nals", "n_idr"]
            meta_df = pd.DataFrame(rows, columns=cols)
            for c in ("width", "height", "profile", "level", "cabac"):
                meta_df[c] = pd.array(meta_df[c], dtype="Int32")
            for c in ("n_nals", "n_idr"):
                meta_df[c] = pd.array(meta_df[c], dtype="Int64")
            meta_df.insert(0, id_col, pdf[id_col].values)
            yield meta_df

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def with_avc_ipcm_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize Annex B H.264 streams whose IDR slice is all-I_PCM
    macroblocks — REAL pixels behind the video seam
    (functions/avc.py `synth_avc_ipcm` closed forms). Arrow-batched;
    payloads never touch the driver."""
    from redskins_rule_spark.functions.avc import synth_avc_ipcm

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[src_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    payloads.append(None)
                    continue
                payloads.append(synth_avc_ipcm(len(str(text))))
            yield pd.DataFrame({id_col: pdf[id_col].values, out: payloads})

    return df.select(id_col, src_col).mapInPandas(run, out_schema)


def decode_avc_ipcm_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL pixel decode through the H.264 seam: Annex B NAL walk →
    Exp-Golomb SPS/PPS → IDR slice header → per-macroblock I_PCM raw
    samples reassembled into raster planes — then the cross-engine
    position-weighted fingerprint (Σ v[i]·(1 + i%64) mod 2^31−1, the
    char_fingerprint arithmetic) over each plane, vectorized with
    numpy. NULL payloads yield NULL stats; corrupt ones raise
    ValueError."""
    import numpy as np

    from redskins_rule_spark.functions.avc import decode_avc_ipcm

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_mbs", T.IntegerType()),
            T.StructField("qp", T.IntegerType()),
            T.StructField("y_fp", T.LongType()),
            T.StructField("cb_fp", T.LongType()),
            T.StructField("cr_fp", T.LongType()),
        ]
    )

    def fp(plane: bytes) -> int:
        v = np.frombuffer(plane, dtype=np.uint8).astype(np.int64)
        w = 1 + (np.arange(v.size, dtype=np.int64) % 64)
        return int((v * w).sum() % 2147483647)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[payload_col]:
                if b is None:
                    rows.append((None,) * 7)
                    continue
                f = decode_avc_ipcm(bytes(b))
                rows.append(
                    (f.width, f.height, f.n_mbs, f.qp,
                     fp(f.y), fp(f.cb), fp(f.cr))
                )
            cols = ["width", "height", "n_mbs", "qp", "y_fp", "cb_fp", "cr_fp"]
            meta_df = pd.DataFrame(rows, columns=cols)
            for c in ("width", "height", "n_mbs", "qp"):
                meta_df[c] = pd.array(meta_df[c], dtype="Int32")
            for c in ("y_fp", "cb_fp", "cr_fp"):
                meta_df[c] = pd.array(meta_df[c], dtype="Int64")
            meta_df.insert(0, id_col, pdf[id_col].values)
            yield meta_df

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def with_mp3_count1_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize MP3 streams whose granules carry REAL count1-region
    Huffman spectra (functions/mp3.py `synth_mp3_count1` closed
    forms — both Table B.7 count1 codebooks in every payload).
    Arrow-batched; payloads never touch the driver."""
    from redskins_rule_spark.functions.mp3 import synth_mp3_count1

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[src_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    payloads.append(None)
                    continue
                payloads.append(synth_mp3_count1(len(str(text))))
            yield pd.DataFrame({id_col: pdf[id_col].values, out: payloads})

    return df.select(id_col, src_col).mapInPandas(run, out_schema)


def decode_mp3_count1_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL spectral-value decode through the MP3 seam: frame walk →
    side info → scalefactors → count1 quadruple Huffman (Table B.7
    A/B + sign bits) — then integer aggregates over the decoded
    (v,w,x,y) values: total quadruple count, signed component sum,
    negative-component count, and a position-weighted fingerprint
    Σ (64i + 32g + q + 1)·(v + 2w + 3x + 4y) over frame i, granule g,
    quadruple q. NULL payloads yield NULL stats; corrupt ones raise
    ValueError."""
    from redskins_rule_spark.functions.mp3 import parse_mp3_granules

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("n_frames", T.LongType()),
            T.StructField("n_quads", T.LongType()),
            T.StructField("sum_vals", T.LongType()),
            T.StructField("n_neg", T.LongType()),
            T.StructField("fp", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[payload_col]:
                if b is None:
                    rows.append((None,) * 5)
                    continue
                frames = parse_mp3_granules(bytes(b), decode_count1=True)
                n_quads = sum_vals = n_neg = fp = 0
                for i, fr in enumerate(frames):
                    for g in (0, 1):
                        for q, quad in enumerate(fr.granules[g].count1):
                            n_quads += 1
                            sum_vals += sum(quad)
                            n_neg += sum(1 for v in quad if v < 0)
                            v, w, x, y = quad
                            fp += (64 * i + 32 * g + q + 1) * (
                                v + 2 * w + 3 * x + 4 * y
                            )
                rows.append((len(frames), n_quads, sum_vals, n_neg, fp))
            cols = ["n_frames", "n_quads", "sum_vals", "n_neg", "fp"]
            meta_df = pd.DataFrame(rows, columns=cols)
            for c in cols:
                meta_df[c] = pd.array(meta_df[c], dtype="Int64")
            meta_df.insert(0, id_col, pdf[id_col].values)
            yield meta_df

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def with_mp3_bigv_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize MP3 streams whose granules carry BOTH spectral
    regions — table-1 big-values pairs and count1 quadruples
    (functions/mp3.py `synth_mp3_bigv` closed forms). Arrow-batched;
    payloads never touch the driver."""
    from redskins_rule_spark.functions.mp3 import synth_mp3_bigv

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[src_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    payloads.append(None)
                    continue
                payloads.append(synth_mp3_bigv(len(str(text))))
            yield pd.DataFrame({id_col: pdf[id_col].values, out: payloads})

    return df.select(id_col, src_col).mapInPandas(run, out_schema)


def decode_mp3_bigv_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """FULL spectral decode of both regions through the MP3 seam:
    table-1 big-values pairs then count1 quadruples, with integer
    aggregates per doc — pair/quad counts, signed sums, and two
    position-weighted fingerprints (pairs: Σ (64i+32g+p+1)·(x+2y);
    quads: Σ (64i+32g+q+1)·(v+2w+3x+4y)). NULL payloads yield NULL
    stats; corrupt ones raise ValueError."""
    from redskins_rule_spark.functions.mp3 import parse_mp3_granules

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("n_frames", T.LongType()),
            T.StructField("n_pairs", T.LongType()),
            T.StructField("n_quads", T.LongType()),
            T.StructField("sum_pairs", T.LongType()),
            T.StructField("sum_quads", T.LongType()),
            T.StructField("pair_fp", T.LongType()),
            T.StructField("quad_fp", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[payload_col]:
                if b is None:
                    rows.append((None,) * 7)
                    continue
                frames = parse_mp3_granules(bytes(b), decode_count1=True)
                n_pairs = n_quads = sum_pairs = sum_quads = 0
                pair_fp = quad_fp = 0
                for i, fr in enumerate(frames):
                    for g in (0, 1):
                        gr = fr.granules[g]
                        for p, (x, y) in enumerate(gr.big_pairs):
                            n_pairs += 1
                            sum_pairs += x + y
                            pair_fp += (64 * i + 32 * g + p + 1) * (x + 2 * y)
                        for q, (v, w, x, y) in enumerate(gr.count1):
                            n_quads += 1
                            sum_quads += v + w + x + y
                            quad_fp += (64 * i + 32 * g + q + 1) * (
                                v + 2 * w + 3 * x + 4 * y
                            )
                rows.append(
                    (len(frames), n_pairs, n_quads, sum_pairs, sum_quads,
                     pair_fp, quad_fp)
                )
            cols = ["n_frames", "n_pairs", "n_quads", "sum_pairs",
                    "sum_quads", "pair_fp", "quad_fp"]
            meta_df = pd.DataFrame(rows, columns=cols)
            for c in cols:
                meta_df[c] = pd.array(meta_df[c], dtype="Int64")
            meta_df.insert(0, id_col, pdf[id_col].values)
            yield meta_df

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def with_png_interlaced_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize Adam7-INTERLACED PNG payloads whose seven passes
    cycle through all five scanline filters
    (functions/png.py `encode_png_interlaced`; pixels follow the
    `synth_pixels` closed form, so the oracle is layout-blind — the
    deinterlaced raster must equal the progressive one).
    Arrow-batched; payloads never touch the driver."""
    from redskins_rule_spark.functions.png import (
        encode_png_interlaced,
        synth_pixels,
    )

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[src_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    payloads.append(None)
                    continue
                clen = len(str(text))
                w, h = clen % 13 + 1, clen % 7 + 1
                filters = tuple((clen + p) % 5 for p in range(7))
                payloads.append(
                    encode_png_interlaced(
                        synth_pixels(clen, w, h), w, h, filters
                    )
                )
            yield pd.DataFrame({id_col: pdf[id_col].values, out: payloads})

    return df.select(id_col, src_col).mapInPandas(run, out_schema)


def decode_png_fp_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL PNG decode (progressive or Adam7) to the position-weighted
    raster fingerprint Σ v[i]·(1 + i%64) mod 2^31−1 — order-sensitive,
    so a wrong deinterlace scatter cannot pass. NULL payloads yield
    NULL stats; corrupt ones raise ValueError."""
    import numpy as np

    from redskins_rule_spark.functions.png import decode_png

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("interlace", T.IntegerType()),
            T.StructField("pixel_fp", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[payload_col]:
                if b is None:
                    rows.append((None,) * 4)
                    continue
                meta, px = decode_png(bytes(b))
                v = np.frombuffer(px, dtype=np.uint8).astype(np.int64)
                wts = 1 + (np.arange(v.size, dtype=np.int64) % 64)
                fp = int((v * wts).sum() % 2147483647)
                rows.append((meta.width, meta.height, meta.interlace, fp))
            cols = ["width", "height", "interlace", "pixel_fp"]
            meta_df = pd.DataFrame(rows, columns=cols)
            for c in cols[:3]:
                meta_df[c] = pd.array(meta_df[c], dtype="Int32")
            meta_df["pixel_fp"] = pd.array(meta_df["pixel_fp"], dtype="Int64")
            meta_df.insert(0, id_col, pdf[id_col].values)
            yield meta_df

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def with_gif_interlaced_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize INTERLACED GIF payloads (Appendix E four-pass row
    order, interlace flag set; same geometry/pixel closed forms as
    `with_gif_payload`, so the oracle is layout-blind).
    Arrow-batched; payloads never touch the driver."""
    from redskins_rule_spark.functions.gif import encode_gif, synth_frames

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[src_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    payloads.append(None)
                    continue
                clen = len(str(text))
                w, h, nf = clen % 16 + 2, clen % 11 + 2, clen % 5 + 1
                payloads.append(
                    encode_gif(
                        synth_frames(clen, nf, w, h), w, h, interlace=True
                    )
                )
            yield pd.DataFrame({id_col: pdf[id_col].values, out: payloads})

    return df.select(id_col, src_col).mapInPandas(run, out_schema)


def decode_gif_fp_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL GIF decode (progressive or interlaced) to the
    position-weighted fingerprint over ALL frames concatenated in
    frame order — order-sensitive, so a wrong deinterlace row
    permutation cannot pass. NULL payloads yield NULL stats; corrupt
    ones raise ValueError."""
    import numpy as np

    from redskins_rule_spark.functions.gif import decode_gif

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_frames", T.LongType()),
            T.StructField("pixel_fp", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[payload_col]:
                if b is None:
                    rows.append((None,) * 4)
                    continue
                meta, frames = decode_gif(bytes(b))
                px = b"".join(frames)
                v = np.frombuffer(px, dtype=np.uint8).astype(np.int64)
                wts = 1 + (np.arange(v.size, dtype=np.int64) % 64)
                fp = int((v * wts).sum() % 2147483647)
                rows.append((meta.width, meta.height, meta.n_frames, fp))
            cols = ["width", "height", "n_frames", "pixel_fp"]
            meta_df = pd.DataFrame(rows, columns=cols)
            for c in cols[:2]:
                meta_df[c] = pd.array(meta_df[c], dtype="Int32")
            for c in cols[2:]:
                meta_df[c] = pd.array(meta_df[c], dtype="Int64")
            meta_df.insert(0, id_col, pdf[id_col].values)
            yield meta_df

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def with_wav_ima_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize IMA-ADPCM WAV payloads (fmt tag 0x11, mono single
    block; functions/wav.py `synth_wav_ima` closed forms).
    Arrow-batched; payloads never touch the driver."""
    from redskins_rule_spark.functions.wav import synth_wav_ima

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[src_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    payloads.append(None)
                    continue
                payloads.append(synth_wav_ima(len(str(text))))
            yield pd.DataFrame({id_col: pdf[id_col].values, out: payloads})

    return df.select(id_col, src_col).mapInPandas(run, out_schema)


def decode_wav_ima_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL lossy-codec sample reconstruction through the audio seam:
    RIFF walk → fmt 0x11 → block header → nibble-by-nibble IMA
    predictor decode — then integer aggregates over the RECONSTRUCTED
    samples (last sample, signed sum, position-weighted fingerprint
    Σ (k+1)·s_k). NULL payloads yield NULL stats; corrupt ones raise
    ValueError."""
    from redskins_rule_spark.functions.wav import decode_wav_ima

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("sr", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("last_sample", T.LongType()),
            T.StructField("sample_sum", T.LongType()),
            T.StructField("sample_fp", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[payload_col]:
                if b is None:
                    rows.append((None,) * 5)
                    continue
                sr, samples = decode_wav_ima(bytes(b))
                fp = sum((k + 1) * s for k, s in enumerate(samples))
                rows.append(
                    (sr, len(samples), samples[-1], sum(samples), fp)
                )
            cols = ["sr", "n_samples", "last_sample", "sample_sum",
                    "sample_fp"]
            meta_df = pd.DataFrame(rows, columns=cols)
            meta_df["sr"] = pd.array(meta_df["sr"], dtype="Int32")
            for c in cols[1:]:
                meta_df[c] = pd.array(meta_df[c], dtype="Int64")
            meta_df.insert(0, id_col, pdf[id_col].values)
            yield meta_df

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def with_exif_jpeg_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize EXIF-bearing JPEGs — a real baseline image with an
    APP1 TIFF block (orientation/dims/timestamp, alternating byte
    order; functions/exif.py `synth_exif_jpeg` closed forms).
    Arrow-batched; payloads never touch the driver."""
    from redskins_rule_spark.functions.exif import synth_exif_jpeg

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[src_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    payloads.append(None)
                    continue
                payloads.append(synth_exif_jpeg(len(str(text))))
            yield pd.DataFrame({id_col: pdf[id_col].values, out: payloads})

    return df.select(id_col, src_col).mapInPandas(run, out_schema)


def decode_exif_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL EXIF extraction per JPEG payload: marker walk → APP1 →
    TIFF byte-order/magic → IFD0 entry walk (both endiannesses) —
    (id, orientation, exif_width, exif_height, datetime, big_endian,
    n_entries) PLUS the pixel-frame dims from the real SOF decode, so
    the declared-vs-actual consistency check a curation pipeline runs
    is on the path. NULL payloads yield NULL stats; corrupt ones
    raise ValueError."""
    from redskins_rule_spark.functions.exif import extract_app1, parse_exif
    from redskins_rule_spark.functions.jpeg import decode_jpeg_dims

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("orientation", T.IntegerType()),
            T.StructField("exif_width", T.IntegerType()),
            T.StructField("exif_height", T.IntegerType()),
            T.StructField("taken_at", T.StringType()),
            T.StructField("big_endian", T.BooleanType()),
            T.StructField("n_entries", T.IntegerType()),
            T.StructField("dims_match", T.BooleanType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[payload_col]:
                if b is None:
                    rows.append((None,) * 7)
                    continue
                data = bytes(b)
                body = extract_app1(data)
                if body is None:
                    raise ValueError("exif: JPEG carries no APP1 segment")
                ex = parse_exif(body)
                w, h = decode_jpeg_dims(data)
                rows.append(
                    (ex.orientation, ex.width, ex.height, ex.datetime,
                     ex.byte_order == "MM", ex.n_entries,
                     (ex.width, ex.height) == (w, h))
                )
            cols = ["orientation", "exif_width", "exif_height", "taken_at",
                    "big_endian", "n_entries", "dims_match"]
            meta_df = pd.DataFrame(rows, columns=cols)
            for c in ("orientation", "exif_width", "exif_height", "n_entries"):
                meta_df[c] = pd.array(meta_df[c], dtype="Int32")
            meta_df.insert(0, id_col, pdf[id_col].values)
            yield meta_df

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def with_bmp_rle8_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize BI_RLE8 (compressed, 8-bit palette) BMP payloads
    whose content mixes run-friendly and run-hostile rows so both RLE
    encodings (run pairs AND absolute chunks) occur in every payload
    (functions/bmp.py `synth_gray_rle` closed forms). Arrow-batched;
    payloads never touch the driver."""
    from redskins_rule_spark.functions.bmp import (
        encode_bmp_rle8,
        synth_gray_rle,
    )

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[src_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    payloads.append(None)
                    continue
                payloads.append(encode_bmp_rle8(synth_gray_rle(len(str(text)))))
            yield pd.DataFrame({id_col: pdf[id_col].values, out: payloads})

    return df.select(id_col, src_col).mapInPandas(run, out_schema)


def decode_bmp_rle8_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL compressed-BMP decode: header/palette walk → the RLE8
    escape machine (runs, absolute chunks, EOL/EOF) → bottom-up rows
    reassembled to display order → the position-weighted raster
    fingerprint. NULL payloads yield NULL stats; corrupt ones raise
    ValueError."""
    import numpy as np

    from redskins_rule_spark.functions.bmp import decode_bmp_rle8

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("pixel_fp", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[payload_col]:
                if b is None:
                    rows.append((None,) * 3)
                    continue
                img = decode_bmp_rle8(bytes(b))
                v = img.reshape(-1).astype(np.int64)
                wts = 1 + (np.arange(v.size, dtype=np.int64) % 64)
                fp = int((v * wts).sum() % 2147483647)
                rows.append((img.shape[1], img.shape[0], fp))
            cols = ["width", "height", "pixel_fp"]
            meta_df = pd.DataFrame(rows, columns=cols)
            for c in cols[:2]:
                meta_df[c] = pd.array(meta_df[c], dtype="Int32")
            meta_df["pixel_fp"] = pd.array(meta_df["pixel_fp"], dtype="Int64")
            meta_df.insert(0, id_col, pdf[id_col].values)
            yield meta_df

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def with_adts_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize a REAL ADTS/AAC payload column (functions/aac.py
    `synth_adts` closed forms — the standalone .aac stream shape a
    crawl encounters). Arrow-batched; payloads never touch the
    driver."""
    from redskins_rule_spark.functions.aac import synth_adts

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[src_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    payloads.append(None)
                    continue
                payloads.append(synth_adts(len(str(text))))
            yield pd.DataFrame({id_col: pdf[id_col].values, out: payloads})

    return df.select(id_col, src_col).mapInPandas(run, out_schema)


def decode_adts_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL ADTS frame walk per payload: every fixed+variable header
    field validated, payloads sliced by the declared 13-bit length →
    (id, n_frames, profile, sr, channels, duration_ms,
    payload_bytes). The raw AAC access units stay opaque (the
    documented spectral seam); payload_bytes proves the walk slices
    real bytes. NULL payloads yield NULL stats."""
    from redskins_rule_spark.functions.aac import parse_adts

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("n_frames", T.LongType()),
            T.StructField("profile", T.IntegerType()),
            T.StructField("sr", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("duration_ms", T.LongType()),
            T.StructField("payload_bytes", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[payload_col]:
                if b is None:
                    rows.append((None,) * 6)
                    continue
                m = parse_adts(bytes(b))
                rows.append(
                    (
                        m.n_frames,
                        m.frames[0].profile,
                        m.sample_rate,
                        m.frames[0].channels,
                        m.duration_ms,
                        sum(len(f.payload) for f in m.frames),
                    )
                )
            cols = ["n_frames", "profile", "sr", "channels",
                    "duration_ms", "payload_bytes"]
            meta = pd.DataFrame(rows, columns=cols)
            for c in ("profile", "sr", "channels"):
                meta[c] = pd.array(meta[c], dtype="Int32")
            for c in ("n_frames", "duration_ms", "payload_bytes"):
                meta[c] = pd.array(meta[c], dtype="Int64")
            meta.insert(0, id_col, pdf[id_col].values)
            yield meta

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def with_mp4_avcc_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize MP4 payloads in the REAL-WORLD AVC layout:
    parameter sets out-of-band in the stsd avc1 entry's avcC record,
    mdat samples as length-prefixed NAL units
    (`functions/mp4.py synth_mp4_avcc` closed forms). Arrow-batched;
    payloads never touch the driver."""
    from redskins_rule_spark.functions.mp4 import synth_mp4_avcc

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[src_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    payloads.append(None)
                    continue
                payloads.append(synth_mp4_avcc(len(str(text))))
            yield pd.DataFrame({id_col: pdf[id_col].values, out: payloads})

    return df.select(id_col, src_col).mapInPandas(run, out_schema)


def decode_avcc_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL out-of-band AVC config decode per MP4 payload: stsd walk
    → avcC record parse → Exp-Golomb SPS/PPS decode for geometry and
    the CAVLC/CABAC selector, then the LENGTH-PREFIXED NAL walk over
    every mdat video sample (the AVCC framing — no start codes) →
    (id, width, height, profile, level, cabac, length_size, n_nals,
    n_idr). Together with `decode_avc_stats` (Annex B, in-band
    parameter sets) both real-world AVC shapes decode; slice bodies
    remain the documented seam."""
    from redskins_rule_spark.functions.avc import (
        parse_avcc,
        parse_nal_stream_avcc,
        parse_nal_unit,
        parse_pps_head,
        parse_sps,
    )
    from redskins_rule_spark.functions.mp4 import extract_samples, parse_mp4

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("profile", T.IntegerType()),
            T.StructField("level", T.IntegerType()),
            T.StructField("cabac", T.IntegerType()),
            T.StructField("length_size", T.IntegerType()),
            T.StructField("n_nals", T.LongType()),
            T.StructField("n_idr", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[payload_col]:
                if b is None:
                    rows.append((None,) * 8)
                    continue
                data = bytes(b)
                meta = parse_mp4(data)
                track = next(
                    (t for t in meta.tracks if t.avcc is not None), None
                )
                if track is None:
                    raise ValueError("avc: no avc1 track with avcC config")
                cfg = parse_avcc(track.avcc)
                sps = parse_sps(parse_nal_unit(cfg.sps[0]).rbsp)
                pps = parse_pps_head(parse_nal_unit(cfg.pps[0]).rbsp)
                n_nals = n_idr = 0
                for _i, sample in extract_samples(data, track):
                    for nal in parse_nal_stream_avcc(sample, cfg.length_size):
                        n_nals += 1
                        n_idr += nal.nal_type == 5
                rows.append(
                    (sps.width, sps.height, cfg.profile_idc, cfg.level_idc,
                     pps.entropy_coding_mode, cfg.length_size, n_nals, n_idr)
                )
            cols = ["width", "height", "profile", "level", "cabac",
                    "length_size", "n_nals", "n_idr"]
            meta_df = pd.DataFrame(rows, columns=cols)
            for c in cols[:6]:
                meta_df[c] = pd.array(meta_df[c], dtype="Int32")
            for c in cols[6:]:
                meta_df[c] = pd.array(meta_df[c], dtype="Int64")
            meta_df.insert(0, id_col, pdf[id_col].values)
            yield meta_df

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def with_mp4_ipcm_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize MP4 payloads (avcC layout) whose IDR sample is a
    REAL all-I_PCM slice — decodable pixels inside a decodable
    container (functions/mp4.py `synth_mp4_ipcm` closed forms).
    Arrow-batched; payloads never touch the driver."""
    from redskins_rule_spark.functions.mp4 import synth_mp4_ipcm

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[src_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    payloads.append(None)
                    continue
                payloads.append(synth_mp4_ipcm(len(str(text))))
            yield pd.DataFrame({id_col: pdf[id_col].values, out: payloads})

    return df.select(id_col, src_col).mapInPandas(run, out_schema)


def decode_mp4_ipcm_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL pixels out of a REAL MP4: box walk → stsd avcC record →
    Exp-Golomb SPS/PPS from the out-of-band sets → length-prefixed
    NAL walk over the mdat video sample → all-I_PCM IDR slice decode
    to raster planes → the cross-engine position-weighted fingerprint
    per plane. The end-to-end video path a crawl pipeline runs, with
    only CAVLC/CABAC residual decode left behind the seam."""
    import numpy as np

    from redskins_rule_spark.functions.avc import (
        decode_ipcm_slice,
        parse_avcc,
        parse_nal_stream_avcc,
        parse_nal_unit,
        parse_pps,
        parse_sps,
    )
    from redskins_rule_spark.functions.mp4 import extract_samples, parse_mp4

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_mbs", T.IntegerType()),
            T.StructField("qp", T.IntegerType()),
            T.StructField("length_size", T.IntegerType()),
            T.StructField("y_fp", T.LongType()),
            T.StructField("cb_fp", T.LongType()),
            T.StructField("cr_fp", T.LongType()),
        ]
    )

    def fp(plane: bytes) -> int:
        v = np.frombuffer(plane, dtype=np.uint8).astype(np.int64)
        w = 1 + (np.arange(v.size, dtype=np.int64) % 64)
        return int((v * w).sum() % 2147483647)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[payload_col]:
                if b is None:
                    rows.append((None,) * 8)
                    continue
                data = bytes(b)
                meta = parse_mp4(data)
                track = next(
                    (t for t in meta.tracks if t.avcc is not None), None
                )
                if track is None:
                    raise ValueError("avc: no avc1 track with avcC config")
                cfg = parse_avcc(track.avcc)
                sps = parse_sps(parse_nal_unit(cfg.sps[0]).rbsp)
                pps = parse_pps(parse_nal_unit(cfg.pps[0]).rbsp)
                frame = None
                for _i, sample in extract_samples(data, track):
                    for nal in parse_nal_stream_avcc(sample, cfg.length_size):
                        if nal.nal_type == 5:
                            frame = decode_ipcm_slice(nal.rbsp, sps, pps)
                if frame is None:
                    raise ValueError("avc: mp4 carries no IDR I_PCM slice")
                rows.append(
                    (frame.width, frame.height, frame.n_mbs, frame.qp,
                     cfg.length_size, fp(frame.y), fp(frame.cb), fp(frame.cr))
                )
            cols = ["width", "height", "n_mbs", "qp", "length_size",
                    "y_fp", "cb_fp", "cr_fp"]
            meta_df = pd.DataFrame(rows, columns=cols)
            for c in cols[:5]:
                meta_df[c] = pd.array(meta_df[c], dtype="Int32")
            for c in cols[5:]:
                meta_df[c] = pd.array(meta_df[c], dtype="Int64")
            meta_df.insert(0, id_col, pdf[id_col].values)
            yield meta_df

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def with_adts_silent_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize ADTS streams whose payloads are REAL silent
    raw_data_blocks — zero-codebook SCEs, fully decodable structure
    (functions/aac.py `synth_adts_silent` closed forms).
    Arrow-batched; payloads never touch the driver."""
    from redskins_rule_spark.functions.aac import synth_adts_silent

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[src_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    payloads.append(None)
                    continue
                payloads.append(synth_adts_silent(len(str(text))))
            yield pd.DataFrame({id_col: pdf[id_col].values, out: payloads})

    return df.select(id_col, src_col).mapInPandas(run, out_schema)


def decode_aac_sce_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL raw_data_block decode through the AAC seam: ADTS frame
    walk → element walk (SCE/FIL/END) → ics_info → section runs with
    5-bit escapes — integer aggregates over the decoded SCEs: frame
    count, gain/max_sfb/section/shape sums, and the position-weighted
    tag fingerprint Σ (f+1)·instance_tag. NULL payloads yield NULL
    stats; corrupt ones raise ValueError."""
    from redskins_rule_spark.functions.aac import (
        parse_aac_silent_block,
        parse_adts,
    )

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("n_frames", T.LongType()),
            T.StructField("gain_sum", T.LongType()),
            T.StructField("sfb_sum", T.LongType()),
            T.StructField("n_sections", T.LongType()),
            T.StructField("shape_sum", T.LongType()),
            T.StructField("tag_fp", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[payload_col]:
                if b is None:
                    rows.append((None,) * 6)
                    continue
                meta = parse_adts(bytes(b))
                gain_sum = sfb_sum = n_sections = shape_sum = tag_fp = 0
                for f, fr in enumerate(meta.frames):
                    for sce in parse_aac_silent_block(fr.payload):
                        gain_sum += sce.global_gain
                        sfb_sum += sce.max_sfb
                        n_sections += len(sce.sections)
                        shape_sum += sce.window_shape
                        tag_fp += (f + 1) * sce.instance_tag
                rows.append(
                    (meta.n_frames, gain_sum, sfb_sum, n_sections,
                     shape_sum, tag_fp)
                )
            cols = ["n_frames", "gain_sum", "sfb_sum", "n_sections",
                    "shape_sum", "tag_fp"]
            meta_df = pd.DataFrame(rows, columns=cols)
            for c in cols:
                meta_df[c] = pd.array(meta_df[c], dtype="Int64")
            meta_df.insert(0, id_col, pdf[id_col].values)
            yield meta_df

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def with_mp4_aac_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize MP4 payloads in the real-world AAC layout: decoder
    config out-of-band in the stsd mp4a entry's esds descriptor chain
    (`functions/mp4.py synth_mp4_aac` closed forms). Arrow-batched."""
    from redskins_rule_spark.functions.mp4 import synth_mp4_aac

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[src_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    payloads.append(None)
                    continue
                payloads.append(synth_mp4_aac(len(str(text))))
            yield pd.DataFrame({id_col: pdf[id_col].values, out: payloads})

    return df.select(id_col, src_col).mapInPandas(run, out_schema)


def decode_mp4_aac_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL out-of-band AAC config decode per MP4 payload: stsd walk
    → esds descriptor chain (7-bit continuation lengths, tag
    validation, MPEG-4-Audio OTI check) → bit-packed
    AudioSpecificConfig → (id, aot, sr, channels, n_samples,
    sample_bytes). With q205's ADTS walk both real-world AAC
    transports decode; the raw access units remain the spectral
    seam. NULL payloads yield NULL stats."""
    from redskins_rule_spark.functions.aac import parse_esds
    from redskins_rule_spark.functions.mp4 import extract_samples, parse_mp4

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("aot", T.IntegerType()),
            T.StructField("sr", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("sample_bytes", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[payload_col]:
                if b is None:
                    rows.append((None,) * 5)
                    continue
                data = bytes(b)
                meta = parse_mp4(data)
                track = next(
                    (t for t in meta.tracks if t.esds is not None), None
                )
                if track is None:
                    raise ValueError("aac: no mp4a track with esds config")
                cfg = parse_esds(track.esds)
                total = sum(
                    len(s) for _i, s in extract_samples(data, track)
                )
                rows.append(
                    (cfg.audio_object_type, cfg.sample_rate, cfg.channels,
                     track.n_samples, total)
                )
            cols = ["aot", "sr", "channels", "n_samples", "sample_bytes"]
            meta_df = pd.DataFrame(rows, columns=cols)
            for c in cols[:3]:
                meta_df[c] = pd.array(meta_df[c], dtype="Int32")
            for c in cols[3:]:
                meta_df[c] = pd.array(meta_df[c], dtype="Int64")
            meta_df.insert(0, id_col, pdf[id_col].values)
            yield meta_df

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def with_tagged_mp3_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize MP3 payloads led by a REAL ID3v2.3 tag with
    closed-form text frames (`functions/mp3.py synth_mp3_tagged`).
    Arrow-batched; payloads never touch the driver."""
    from redskins_rule_spark.functions.mp3 import synth_mp3_tagged

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[src_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    payloads.append(None)
                    continue
                payloads.append(synth_mp3_tagged(len(str(text))))
            yield pd.DataFrame({id_col: pdf[id_col].values, out: payloads})

    return df.select(id_col, src_col).mapInPandas(run, out_schema)


def with_tagged24_mp3_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize MP3 streams led by REAL ID3v2.4 tags — syncsafe
    frame sizes (one frame always >= 128 bytes so the encoding
    genuinely differs from v2.3), UTF-8 text, and a verified footer
    on a third of the corpus (functions/mp3.py `synth_mp3_tagged24`
    closed forms). Arrow-batched; payloads never touch the driver."""
    from redskins_rule_spark.functions.mp3 import synth_mp3_tagged24

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[src_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    payloads.append(None)
                    continue
                payloads.append(synth_mp3_tagged24(len(str(text))))
            yield pd.DataFrame({id_col: pdf[id_col].values, out: payloads})

    return df.select(id_col, src_col).mapInPandas(run, out_schema)


def decode_id3v24_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL ID3v2.4 tag decode per payload (the version-dispatching
    walk: syncsafe frame sizes, verified footer) plus the audio
    framing layer → (id, title, album_len, track, has_footer,
    n_tag_frames, n_audio_frames). NULL payloads yield NULL stats."""
    from redskins_rule_spark.functions.mp3 import (
        parse_id3_frames,
        parse_mp3,
    )

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("title", T.StringType()),
            T.StructField("album_len", T.IntegerType()),
            T.StructField("track", T.StringType()),
            T.StructField("has_footer", T.BooleanType()),
            T.StructField("n_tag_frames", T.LongType()),
            T.StructField("n_audio_frames", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[payload_col]:
                if b is None:
                    rows.append((None,) * 6)
                    continue
                data = bytes(b)
                # keep the FULL frame list: ID3v2.4 permits repeated
                # frame IDs (multiple TXXX is common in the wild), so
                # n_tag_frames counts occurrences, not distinct IDs,
                # and text lookups pin the FIRST occurrence
                frame_list = parse_id3_frames(data)
                frames: dict[str, str | None] = {}
                for fname, fvalue in frame_list:
                    frames.setdefault(fname, fvalue)
                meta = parse_mp3(data)
                rows.append(
                    (
                        frames.get("TIT2"),
                        len(frames["TALB"]) if frames.get("TALB") else None,
                        frames.get("TRCK"),
                        bool(data[5] & 0x10),
                        len(frame_list),
                        meta.n_frames,
                    )
                )
            cols = ["title", "album_len", "track", "has_footer",
                    "n_tag_frames", "n_audio_frames"]
            meta_df = pd.DataFrame(rows, columns=cols)
            meta_df["album_len"] = pd.array(meta_df["album_len"], dtype="Int32")
            for c in ("n_tag_frames", "n_audio_frames"):
                meta_df[c] = pd.array(meta_df[c], dtype="Int64")
            meta_df.insert(0, id_col, pdf[id_col].values)
            yield meta_df

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def decode_id3_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL ID3v2.3 tag-body decode per payload — the metadata walk a
    real audio-crawl pipeline runs before anything touches samples:
    frame headers validated, text frames decoded (ISO-8859-1/UTF-8),
    plus the audio framing layer's frame count → (id, title, album,
    track, n_tag_frames, n_audio_frames). Missing frames surface as
    NULL. NULL payloads yield NULL stats."""
    from redskins_rule_spark.functions.mp3 import (
        parse_id3v23_frames,
        parse_mp3,
    )

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("title", T.StringType()),
            T.StructField("album", T.StringType()),
            T.StructField("track", T.StringType()),
            T.StructField("n_tag_frames", T.LongType()),
            T.StructField("n_audio_frames", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[payload_col]:
                if b is None:
                    rows.append((None,) * 5)
                    continue
                data = bytes(b)
                # same duplicate-ID contract as the v2.4 walk:
                # count occurrences, pin the FIRST text value
                frame_list = parse_id3v23_frames(data)
                frames: dict[str, str | None] = {}
                for fname, fvalue in frame_list:
                    frames.setdefault(fname, fvalue)
                m = parse_mp3(data)
                rows.append(
                    (
                        frames.get("TIT2"),
                        frames.get("TALB"),
                        frames.get("TRCK"),
                        len(frame_list),
                        m.n_frames,
                    )
                )
            cols = ["title", "album", "track", "n_tag_frames",
                    "n_audio_frames"]
            meta = pd.DataFrame(rows, columns=cols)
            for c in cols[:3]:
                meta[c] = pd.array(meta[c], dtype="string")
            for c in cols[3:]:
                meta[c] = pd.array(meta[c], dtype="Int64")
            meta.insert(0, id_col, pdf[id_col].values)
            yield meta

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def decode_stats_tolerant(
    df: DataFrame,
    codec: str,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quarantine-mode decode — the 100 TB face of the strict
    decoders: at scale ONE corrupt payload must not kill a
    billion-row decode job, and silently skipping it loses the
    evidence. Per row: decode succeeds → stats with decode_error
    NULL; decode raises ValueError (the shared codec corruption
    contract) → NULL stats with the error message, so bad rows are
    attributable, countable, and replayable after the producer fix —
    the binary-column analog of sources.read_json_tolerant.
    codec: 'png' | 'jpeg'. ValueError is the shared codec corruption
    contract; IndexError/struct.error are ALSO quarantined as
    defense in depth (adversarially truncated containers can reach a
    raw index/unpack before any validation fires — ADVICE r5), with
    the exception TYPE recorded in decode_error so a genuine decoder
    bug stays attributable in the quarantine output. Anything else
    (TypeError, MemoryError, ...) still propagates loudly."""
    if codec == "png":
        from redskins_rule_spark.functions.png import decode_png

        def one(b: bytes) -> tuple[int, int, int]:
            meta, pixels = decode_png(b)
            return meta.width, meta.height, sum(pixels)
    elif codec == "jpeg":
        from redskins_rule_spark.functions.jpeg import decode_jpeg_gray

        def one(b: bytes) -> tuple[int, int, int]:
            w, h, pixels = decode_jpeg_gray(b)
            return w, h, sum(pixels)
    else:
        raise ValueError(f"unknown codec {codec!r} (use 'png' or 'jpeg')")

    out_schema = T.StructType(
        [df.schema[id_col]]
        + list(PNG_STATS_SCHEMA.fields)
        + [T.StructField("decode_error", T.StringType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, sums, errs = [], [], [], []
            for b in pdf[payload_col]:
                if b is None:
                    ws.append(None); hs.append(None); sums.append(None)
                    errs.append(None)
                    continue
                try:
                    w, h, s = one(bytes(b))
                except (ValueError, IndexError, struct.error) as e:
                    ws.append(None); hs.append(None); sums.append(None)
                    errs.append(f"{type(e).__name__}: {e}"[:200])
                else:
                    ws.append(w); hs.append(h); sums.append(s)
                    errs.append(None)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "pixel_sum": pd.array(sums, dtype="Int64"),
                    "decode_error": pd.array(errs, dtype="string"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def with_avc_i16dc_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize Annex B H.264 streams mixing I_PCM and
    Intra_16x16 DC-only CAVLC macroblocks — the first REAL entropy
    decode behind the video seam (functions/avc.py
    `synth_avc_i16dc` closed forms). Arrow-batched; payloads never
    touch the driver."""
    from redskins_rule_spark.functions.avc import synth_avc_i16dc

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[src_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    payloads.append(None)
                    continue
                payloads.append(synth_avc_i16dc(len(str(text))))
            yield pd.DataFrame({id_col: pdf[id_col].values, out: payloads})

    return df.select(id_col, src_col).mapInPandas(run, out_schema)


def decode_avc_i16dc_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL CAVLC decode through the H.264 seam: Annex B NAL walk →
    SPS/PPS → IDR slice → per-macroblock dispatch (I_PCM raw samples
    / Intra_16x16 DC-only coeff_token FLC + §9.2.2.1 level
    arithmetic) → position-weighted integer fingerprints over the
    decoded DC coefficients (Σ (v+8)·(16p+k+1), exact) and the I_PCM
    luma samples (the q209 arithmetic). NULL payloads yield NULL
    stats; corrupt ones raise ValueError."""
    import numpy as np

    from redskins_rule_spark.functions.avc import decode_avc_i16dc

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("n_mbs", T.IntegerType()),
            T.StructField("n_cavlc", T.IntegerType()),
            T.StructField("qp", T.IntegerType()),
            T.StructField("dc_sum", T.LongType()),
            T.StructField("dc_fp", T.LongType()),
            T.StructField("y_fp", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[payload_col]:
                if b is None:
                    rows.append((None,) * 6)
                    continue
                f = decode_avc_i16dc(bytes(b))
                dc_sum = 0
                dc_fp = 0
                y_parts = []
                cav = 0
                for mb in f.mbs:
                    if mb.dc_levels is not None:
                        for k, v in enumerate(mb.dc_levels):
                            dc_sum += v
                            dc_fp += (v + 8) * (16 * cav + k + 1)
                        cav += 1
                    else:
                        y_parts.append(mb.pcm[0])
                y = np.frombuffer(b"".join(y_parts), dtype=np.uint8)
                wgt = 1 + (np.arange(y.size, dtype=np.int64) % 64)
                y_fp = int((y.astype(np.int64) * wgt).sum() % 2147483647)
                rows.append((f.n_mbs, cav, f.qp, dc_sum, dc_fp, y_fp))
            cols = ["n_mbs", "n_cavlc", "qp", "dc_sum", "dc_fp", "y_fp"]
            meta_df = pd.DataFrame(rows, columns=cols)
            for c in ("n_mbs", "n_cavlc", "qp"):
                meta_df[c] = pd.array(meta_df[c], dtype="Int32")
            for c in ("dc_sum", "dc_fp", "y_fp"):
                meta_df[c] = pd.array(meta_df[c], dtype="Int64")
            meta_df.insert(0, id_col, pdf[id_col].values)
            yield meta_df

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def with_mp3_reservoir_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize MP3 streams whose main_data USES THE BIT RESERVOIR
    (main_data_begin > 0, §2.4.1.7): granule payloads start inside
    EARLIER frames' areas and spill across frame boundaries, with
    ancillary filler in unclaimed gaps — the transport shape
    virtually every real-world MP3 has (functions/mp3.py
    `synth_mp3_reservoir`; granule CONTENT replays the q210 closed
    forms exactly). Arrow-batched; payloads never touch the driver."""
    from redskins_rule_spark.functions.mp3 import synth_mp3_reservoir

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[src_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    payloads.append(None)
                    continue
                payloads.append(synth_mp3_reservoir(len(str(text))))
            yield pd.DataFrame({id_col: pdf[id_col].values, out: payloads})

    return df.select(id_col, src_col).mapInPandas(run, out_schema)


def decode_mp3_reservoir_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL bit-reservoir decode through the MP3 seam: cross-frame
    main_data reassembly (main_data_begin back-pointers, ancillary
    skip, own-area-end enforcement) feeding the same scalefactor +
    count1 Huffman walk as q210 — then the identical integer
    aggregates over the decoded (v,w,x,y) values, which only come out
    right if the reassembly is bit-exact. NULL payloads yield NULL
    stats; corrupt ones raise ValueError."""
    from redskins_rule_spark.functions.mp3 import parse_mp3_reservoir

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("n_frames", T.LongType()),
            T.StructField("n_quads", T.LongType()),
            T.StructField("sum_vals", T.LongType()),
            T.StructField("n_neg", T.LongType()),
            T.StructField("fp", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[payload_col]:
                if b is None:
                    rows.append((None,) * 5)
                    continue
                frames = parse_mp3_reservoir(bytes(b), decode_count1=True)
                n_quads = sum_vals = n_neg = fp = 0
                for i, fr in enumerate(frames):
                    for g in (0, 1):
                        for q, quad in enumerate(fr.granules[g].count1):
                            n_quads += 1
                            sum_vals += sum(quad)
                            n_neg += sum(1 for v in quad if v < 0)
                            v, w, x, y = quad
                            fp += (64 * i + 32 * g + q + 1) * (
                                v + 2 * w + 3 * x + 4 * y
                            )
                rows.append((len(frames), n_quads, sum_vals, n_neg, fp))
            cols = ["n_frames", "n_quads", "sum_vals", "n_neg", "fp"]
            meta_df = pd.DataFrame(rows, columns=cols)
            for c in cols:
                meta_df[c] = pd.array(meta_df[c], dtype="Int64")
            meta_df.insert(0, id_col, pdf[id_col].values)
            yield meta_df

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def with_adts_short_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize ADTS streams of EIGHT_SHORT_SEQUENCE silent SCEs —
    the short-window grouped section layout (functions/aac.py
    `synth_adts_short` closed forms). Arrow-batched; payloads never
    touch the driver."""
    from redskins_rule_spark.functions.aac import synth_adts_short

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[src_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    payloads.append(None)
                    continue
                payloads.append(synth_adts_short(len(str(text))))
            yield pd.DataFrame({id_col: pdf[id_col].values, out: payloads})

    return df.select(id_col, src_col).mapInPandas(run, out_schema)


def decode_aac_short_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL short-window decode through the AAC seam: ADTS walk →
    element walk → EIGHT_SHORT_SEQUENCE ics_info (4-bit max_sfb +
    7-bit scale_factor_grouping) → per-window-group section runs with
    3-bit escapes — integer aggregates over the decoded SCEs
    including the derived window-group counts. NULL payloads yield
    NULL stats; corrupt ones raise ValueError."""
    from redskins_rule_spark.functions.aac import (
        parse_aac_silent_block,
        parse_adts,
    )

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("n_frames", T.LongType()),
            T.StructField("gain_sum", T.LongType()),
            T.StructField("sfb_sum", T.LongType()),
            T.StructField("n_sections", T.LongType()),
            T.StructField("groups_sum", T.LongType()),
            T.StructField("tag_fp", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[payload_col]:
                if b is None:
                    rows.append((None,) * 6)
                    continue
                meta = parse_adts(bytes(b))
                gain_sum = sfb_sum = n_sections = groups_sum = tag_fp = 0
                for f, fr in enumerate(meta.frames):
                    for sce in parse_aac_silent_block(fr.payload):
                        gain_sum += sce.global_gain
                        sfb_sum += sce.max_sfb
                        n_sections += len(sce.sections)
                        groups_sum += sce.n_groups
                        tag_fp += (f + 1) * sce.instance_tag
                rows.append(
                    (meta.n_frames, gain_sum, sfb_sum, n_sections,
                     groups_sum, tag_fp)
                )
            cols = ["n_frames", "gain_sum", "sfb_sum", "n_sections",
                    "groups_sum", "tag_fp"]
            meta_df = pd.DataFrame(rows, columns=cols)
            for c in cols:
                meta_df[c] = pd.array(meta_df[c], dtype="Int64")
            meta_df.insert(0, id_col, pdf[id_col].values)
            yield meta_df

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def with_flac_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize FLAC payloads (mono 16-bit fixed blocking;
    functions/flac.py `synth_flac` closed forms — 2-4 frames cycling
    FIXED orders 0-4 and VERBATIM, rice partition orders 0/1, and an
    amplified escape-partition face every 16th length). Arrow-batched;
    payloads never touch the driver."""
    from redskins_rule_spark.functions.flac import synth_flac

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[src_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    payloads.append(None)
                    continue
                payloads.append(synth_flac(len(str(text))))
            yield pd.DataFrame({id_col: pdf[id_col].values, out: payloads})

    return df.select(id_col, src_col).mapInPandas(run, out_schema)


def decode_flac_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL lossless-audio decode per FLAC payload: metadata walk →
    frame sync/CRC-8 → subframe decode (constant/verbatim/fixed
    predictors + rice residuals incl. raw-escape partitions) →
    CRC-16 → MD5-of-PCM losslessness proof. Emits integer aggregates
    over the RECONSTRUCTED samples (last, signed sum, Σ (k+1)·s_k),
    a subframe-type fingerprint Σ (f+1)·code_f (code = FIXED order,
    5 = VERBATIM), the rice-escape partition count, and md5_ok.
    NULL payloads yield NULL stats; corrupt ones raise ValueError."""
    from redskins_rule_spark.functions.flac import parse_flac

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("sr", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("n_frames", T.LongType()),
            T.StructField("last_sample", T.LongType()),
            T.StructField("sample_sum", T.LongType()),
            T.StructField("sample_fp", T.LongType()),
            T.StructField("order_fp", T.LongType()),
            T.StructField("n_escapes", T.LongType()),
            T.StructField("md5_ok", T.BooleanType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[payload_col]:
                if b is None:
                    rows.append((None,) * 9)
                    continue
                st = parse_flac(bytes(b))
                samples = [s for fr in st.frames for s in fr.samples]
                rows.append(
                    (
                        st.sample_rate,
                        st.total_samples,
                        len(st.frames),
                        samples[-1],
                        sum(samples),
                        sum((k + 1) * s for k, s in enumerate(samples)),
                        sum((f + 1) * fr.subframe_code
                            for f, fr in enumerate(st.frames)),
                        sum(fr.n_escapes for fr in st.frames),
                        st.md5_ok,
                    )
                )
            cols = ["sr", "n_samples", "n_frames", "last_sample",
                    "sample_sum", "sample_fp", "order_fp", "n_escapes",
                    "md5_ok"]
            meta_df = pd.DataFrame(rows, columns=cols)
            meta_df["sr"] = pd.array(meta_df["sr"], dtype="Int32")
            for c in cols[1:-1]:
                meta_df[c] = pd.array(meta_df[c], dtype="Int64")
            meta_df["md5_ok"] = pd.array(meta_df["md5_ok"],
                                         dtype="boolean")
            meta_df.insert(0, id_col, pdf[id_col].values)
            yield meta_df

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def with_flac_lpc_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize LPC-subframe FLAC payloads (verbatim-coded
    quantized coefficients, arithmetic-shift prediction;
    functions/flac.py `synth_flac_lpc` closed forms — orders 1-3,
    a shift-2 escape face every 16th length). Arrow-batched;
    payloads never touch the driver."""
    from redskins_rule_spark.functions.flac import synth_flac_lpc

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[src_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    payloads.append(None)
                    continue
                payloads.append(synth_flac_lpc(len(str(text))))
            yield pd.DataFrame({id_col: pdf[id_col].values, out: payloads})

    return df.select(id_col, src_col).mapInPandas(run, out_schema)


def with_flac_stereo_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize stereo FLAC payloads cycling all four channel
    assignments (independent, left/side, right/side, mid/side;
    functions/flac.py `synth_flac_stereo` closed forms).
    Arrow-batched; payloads never touch the driver."""
    from redskins_rule_spark.functions.flac import synth_flac_stereo

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[src_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    payloads.append(None)
                    continue
                payloads.append(synth_flac_stereo(len(str(text))))
            yield pd.DataFrame({id_col: pdf[id_col].values, out: payloads})

    return df.select(id_col, src_col).mapInPandas(run, out_schema)


def decode_flac_stereo_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL stereo FLAC decode per payload: the mono walk plus
    channel decorrelation inverses (left/side, right/side, mid/side
    parity recovery), side channels read at bps+1. Emits per-channel
    integer aggregates over the RECONSTRUCTED samples, a
    decorrelation-mode fingerprint Σ (f+1)·mode_idx and subframe
    fingerprint Σ (f+1)·(code0+code1) from the PARSED headers, and
    the two-channel MD5 losslessness proof."""
    from redskins_rule_spark.functions.flac import (
        STEREO_MODES,
        parse_flac_stereo,
    )

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("sr", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("n_frames", T.LongType()),
            T.StructField("left_sum", T.LongType()),
            T.StructField("right_sum", T.LongType()),
            T.StructField("left_fp", T.LongType()),
            T.StructField("right_fp", T.LongType()),
            T.StructField("mode_fp", T.LongType()),
            T.StructField("code_fp", T.LongType()),
            T.StructField("md5_ok", T.BooleanType()),
        ]
    )
    mode_idx = {m: i for i, m in enumerate(STEREO_MODES)}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[payload_col]:
                if b is None:
                    rows.append((None,) * 10)
                    continue
                st = parse_flac_stereo(bytes(b))
                left = [s for fr in st.frames for s in fr.left]
                right = [s for fr in st.frames for s in fr.right]
                rows.append(
                    (
                        st.sample_rate,
                        st.total_samples,
                        len(st.frames),
                        sum(left),
                        sum(right),
                        sum((k + 1) * s for k, s in enumerate(left)),
                        sum((k + 1) * s for k, s in enumerate(right)),
                        sum((f + 1) * mode_idx[fr.mode]
                            for f, fr in enumerate(st.frames)),
                        sum((f + 1) * (fr.codes[0] + fr.codes[1])
                            for f, fr in enumerate(st.frames)),
                        st.md5_ok,
                    )
                )
            cols = ["sr", "n_samples", "n_frames", "left_sum", "right_sum",
                    "left_fp", "right_fp", "mode_fp", "code_fp", "md5_ok"]
            meta_df = pd.DataFrame(rows, columns=cols)
            meta_df["sr"] = pd.array(meta_df["sr"], dtype="Int32")
            for c in cols[1:-1]:
                meta_df[c] = pd.array(meta_df[c], dtype="Int64")
            meta_df["md5_ok"] = pd.array(meta_df["md5_ok"],
                                         dtype="boolean")
            meta_df.insert(0, id_col, pdf[id_col].values)
            yield meta_df

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def with_tiff_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize baseline-TIFF payloads (functions/tiff.py
    `synth_tiff` closed forms): byte order, compression (none vs
    PackBits), and strip height cycle with content length, so both
    endiannesses, both compressions, and multi-strip layouts with a
    short final strip are all on every corpus-level decode path.
    Arrow-batched; payloads never touch the driver."""
    from redskins_rule_spark.functions.tiff import synth_tiff

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[src_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    payloads.append(None)
                    continue
                payloads.append(synth_tiff(len(str(text))))
            yield pd.DataFrame({id_col: pdf[id_col].values, out: payloads})

    return df.select(id_col, src_col).mapInPandas(run, out_schema)


def decode_tiff_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL baseline-TIFF decode: endianness-dispatched header + IFD
    walk (ascending-tag and strip-array validation) → per-strip
    PackBits/verbatim expansion with row-boundary enforcement → the
    position-weighted raster fingerprint. NULL payloads yield NULL
    stats; corrupt ones raise ValueError."""
    import numpy as np

    from redskins_rule_spark.functions.tiff import (
        COMP_PACKBITS,
        decode_tiff,
        decode_tiff_meta,
    )

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_strips", T.IntegerType()),
            T.StructField("big_endian", T.BooleanType()),
            T.StructField("compressed", T.BooleanType()),
            T.StructField("pixel_fp", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[payload_col]:
                if b is None:
                    rows.append((None,) * 6)
                    continue
                data = bytes(b)
                meta = decode_tiff_meta(data)
                img = decode_tiff(data)
                v = img.reshape(-1).astype(np.int64)
                wts = 1 + (np.arange(v.size, dtype=np.int64) % 97)
                fp = int((v * wts).sum() % 2147483647)
                rows.append(
                    (
                        meta["width"],
                        meta["height"],
                        len(meta["strip_offsets"]),
                        meta["big_endian"],
                        meta["compression"] == COMP_PACKBITS,
                        fp,
                    )
                )
            cols = [
                "width", "height", "n_strips",
                "big_endian", "compressed", "pixel_fp",
            ]
            meta_df = pd.DataFrame(rows, columns=cols)
            for c in ("width", "height", "n_strips"):
                meta_df[c] = pd.array(meta_df[c], dtype="Int32")
            for c in ("big_endian", "compressed"):
                meta_df[c] = pd.array(meta_df[c], dtype="boolean")
            meta_df["pixel_fp"] = pd.array(meta_df["pixel_fp"], dtype="Int64")
            meta_df.insert(0, id_col, pdf[id_col].values)
            yield meta_df

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def with_wav_g711_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize G.711 telephony WAV payloads (functions/wav.py
    `synth_wav_g711` closed forms): mu-law and A-law alternate per
    doc, full-range 16-bit source waves cover every companding
    segment of both laws. Arrow-batched; payloads never touch the
    driver."""
    from redskins_rule_spark.functions.wav import synth_wav_g711

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[src_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    payloads.append(None)
                    continue
                payloads.append(synth_wav_g711(len(str(text))))
            yield pd.DataFrame({id_col: pdf[id_col].values, out: payloads})

    return df.select(id_col, src_col).mapInPandas(run, out_schema)


def decode_wav_g711_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL G.711 expansion per payload: chunk walk → law dispatch on
    the fmt tag → segment/exponent/mantissa algebra reconstructing
    16-bit samples from 8-bit codes. Emits position-weighted
    fingerprints of BOTH the code stream and the reconstruction —
    the code fingerprint pins the container walk, the reconstruction
    fingerprint pins the expansion algebra. NULL payloads yield NULL
    stats; corrupt ones raise ValueError."""
    import numpy as np

    from redskins_rule_spark.functions.wav import decode_wav_g711

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("law", T.StringType()),
            T.StructField("sr", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("code_fp", T.LongType()),
            T.StructField("recon_sum", T.LongType()),
            T.StructField("recon_fp", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[payload_col]:
                if b is None:
                    rows.append((None,) * 6)
                    continue
                law, sr, codes, recon = decode_wav_g711(bytes(b))
                c = np.asarray(codes, dtype=np.int64)
                r = np.asarray(recon, dtype=np.int64)
                k = np.arange(c.size, dtype=np.int64) + 1
                rows.append(
                    (
                        law,
                        sr,
                        int(c.size),
                        int((k * c).sum()),
                        int(r.sum()),
                        int((k * r).sum()),
                    )
                )
            cols = ["law", "sr", "n_samples", "code_fp", "recon_sum", "recon_fp"]
            meta_df = pd.DataFrame(rows, columns=cols)
            meta_df["sr"] = pd.array(meta_df["sr"], dtype="Int32")
            for c_ in cols[2:]:
                meta_df[c_] = pd.array(meta_df[c_], dtype="Int64")
            meta_df.insert(0, id_col, pdf[id_col].values)
            yield meta_df

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def with_qoi_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize QOI payloads (functions/qoi.py `synth_qoi` closed
    forms): every payload cycles RGB-jump / run / DIFF / LUMA chunks
    with the jump deltas forced outside LUMA range, so all four
    emitted op kinds appear a closed-form number of times per doc.
    Arrow-batched; payloads never touch the driver."""
    from redskins_rule_spark.functions.qoi import synth_qoi

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[src_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    payloads.append(None)
                    continue
                payloads.append(synth_qoi(len(str(text))))
            yield pd.DataFrame({id_col: pdf[id_col].values, out: payloads})

    return df.select(id_col, src_col).mapInPandas(run, out_schema)


def decode_qoi_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL QOI decode: header walk → the six-op state machine
    (index table, wrapping diffs, runs) → per-op chunk tally and the
    position-weighted pixel fingerprint. The fingerprint pins the
    decoded VALUES (losslessness), the op tallies pin the encoder's
    chunk choices, and byte_len pins the whole layout. NULL payloads
    yield NULL stats; corrupt ones raise ValueError."""
    from redskins_rule_spark.functions.qoi import decode_qoi

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("width", T.IntegerType()),
            T.StructField("n_px", T.LongType()),
            T.StructField("byte_len", T.LongType()),
            T.StructField("n_rgb", T.LongType()),
            T.StructField("n_run_chunks", T.LongType()),
            T.StructField("n_diff", T.LongType()),
            T.StructField("n_luma", T.LongType()),
            T.StructField("n_index", T.LongType()),
            T.StructField("px_fp", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[payload_col]:
                if b is None:
                    rows.append((None,) * 9)
                    continue
                d = decode_qoi(bytes(b))
                fp = sum(
                    (k + 1) * (r * 65536 + g * 256 + bl)
                    for k, (r, g, bl, _a) in enumerate(d["pixels"])
                )
                c = d["op_counts"]
                rows.append(
                    (
                        d["width"],
                        len(d["pixels"]),
                        len(bytes(b)),
                        c["rgb"],
                        c["run"],
                        c["diff"],
                        c["luma"],
                        c["index"],
                        fp,
                    )
                )
            cols = [
                "width", "n_px", "byte_len", "n_rgb", "n_run_chunks",
                "n_diff", "n_luma", "n_index", "px_fp",
            ]
            meta_df = pd.DataFrame(rows, columns=cols)
            meta_df["width"] = pd.array(meta_df["width"], dtype="Int32")
            for c_ in cols[1:]:
                meta_df[c_] = pd.array(meta_df[c_], dtype="Int64")
            meta_df.insert(0, id_col, pdf[id_col].values)
            yield meta_df

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def _with_synth_payload(df, synth, src_col, id_col, out):
    """Shared Arrow-batched payload materializer: synth(len(text))
    per row, payloads never touch the driver."""
    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[src_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    payloads.append(None)
                    continue
                payloads.append(synth(len(str(text))))
            yield pd.DataFrame({id_col: pdf[id_col].values, out: payloads})

    return df.select(id_col, src_col).mapInPandas(run, out_schema)


def length_dict_stats(docs, src_col, id_col, stats_fn, id_mod=1, how="left"):
    """Per-doc media stats via the DISTINCT-LENGTH dictionary.

    Every synth in this module derives its payload from the character
    length (some: the utf-8 byte length) of ``src_col`` alone — plus,
    for the dispatching fronts, a small residue of the id — so every
    downstream decode stat is a pure function of that tuple. Instead
    of synthesizing + decoding once per document (O(rows)
    Python-boundary work), run ``stats_fn`` over ONE row per distinct
    (char_len, byte_len[, id % id_mod]) key — bounded by the corpus
    length distribution, independent of corpus size — and
    broadcast-join the stats back onto the id stream. Per-doc results
    are bit-identical because stats_fn is deterministic in the key.

    ``stats_fn(dict_docs)`` receives a frame whose ``id_col`` holds
    the PACKED KEY ``(char_len·2^32 + byte_len)·id_mod + id%id_mod``
    (long) and whose ``src_col`` is a synthetic string with exactly
    that character AND byte length, and must return stat rows keyed by
    ``id_col`` (one or many per input row) — i.e. the existing
    payload+decode operators, unchanged, with the key standing in for
    the doc id. Because the key is ≡ id (mod id_mod), operators that
    dispatch on ``id % id_mod`` (mixed-media's %9 class picker,
    quarantine's %7 corruption) see the original residue. Bounds:
    char_len < 2^31 and non-negative ids — far above any synthesized
    media here and checked by the packing staying positive.

    ``how``: the default left join yields one all-NULL stats row for a
    doc whose key joins nothing (NULL text) — the single-row decoders'
    exact contract. MULTI-row decoders (frame samplers, deltas) emit
    ZERO rows for an empty decode, so their callers must pass
    ``how="inner"`` or a zero-frame doc gains a phantom NULL row.

    CONTRACT — bounded dictionary: this fan-out is only sound when the
    distinct-key count is dictionary-sized (it is broadcast and decoded
    once per key). That boundedness is a property of THIS engine's
    declared data model — media payloads are synthesized from a
    bounded text-length distribution (FIXTURES.md: ~44..577 chars at
    every SF), giving ≤ ~530·id_mod keys regardless of corpus row
    count — NOT a property of arbitrary data. A guard enforces it at
    runtime: the dictionary is counted (single-partition window over
    the post-distinct keys, a few-hundred-row exchange, no extra
    action) and the query fails with a contract-naming error before
    any Python decode or broadcast if it exceeds
    ``SPARK_GRAFT_DICT_MAX_KEYS`` (default 1,000,000 — far above any
    valid corpus, far below the 512M-row broadcast hard cap).
    """
    key = (
        F.length(F.col(src_col)).cast("long") * F.lit(4294967296).cast("long")
        + F.octet_length(F.col(src_col)).cast("long")
    )
    if id_mod > 1:
        key = key * F.lit(id_mod).cast("long") + F.pmod(
            F.col(id_col).cast("long"), F.lit(id_mod).cast("long")
        )
    lens = docs.select(id_col, key.alias("__lkey"))
    packed = f"(`{id_col}` div {id_mod})" if id_mod > 1 else f"`{id_col}`"
    clen = F.expr(f"{packed} div 4294967296")
    blen = F.expr(f"{packed} % 4294967296")
    # rebuild a string with that exact (char, byte) length: k extra
    # bytes from 4-byte chars (3 extra each) plus one 2/3-byte char
    # for the remainder; all-ASCII corpora take the pure-'x' path
    extra = blen - clen
    n4 = (extra / 3).cast("long")  # exact: extra < 2^33 << 2^52
    rem = extra % 3
    synth_src = F.concat(
        F.repeat(F.lit("\U00010348"), n4.cast("int")),
        F.when(rem == 1, F.lit("é"))
        .when(rem == 2, F.lit("€"))
        .otherwise(F.lit("")),
        F.repeat(
            F.lit("x"),
            (clen - n4 - F.when(rem > 0, 1).otherwise(0)).cast("int"),
        ),
    )
    from pyspark.sql.window import Window

    max_keys = _env_int("SPARK_GRAFT_DICT_MAX_KEYS", 1_000_000)
    dict_docs = (
        lens.where(F.col("__lkey").isNotNull())
        .select(F.col("__lkey").alias(id_col))
        .distinct()
        # bounded-dictionary guard (see contract above): count the keys
        # in-plan (single-partition window — the dict is exchange-tiny
        # when the contract holds) and fail BEFORE the Python decode /
        # broadcast if the length distribution ever widens past it. The
        # filter consumes the window column, so neither can be pruned.
        .withColumn(
            "__dict_n", F.count(F.lit(1)).over(Window.partitionBy(F.lit(1)))
        )
        .where(
            F.assert_true(
                F.col("__dict_n") <= max_keys,
                F.concat(
                    F.lit(
                        "length_dict_stats: distinct-key dictionary has "
                    ),
                    F.col("__dict_n").cast("string"),
                    F.lit(
                        f" keys > SPARK_GRAFT_DICT_MAX_KEYS={max_keys}; "
                        "the bounded-length contract does not hold for "
                        "this input — decode per document instead"
                    ),
                ),
            ).isNull()
        )
        .drop("__dict_n")
        # the distinct's post-shuffle output is a few hundred tiny rows,
        # so AQE coalesces it to ONE partition and the Python
        # synth+decode below runs serially on one core. Round-robin the
        # bounded dictionary across a FIXED small task count — a
        # ~530-row exchange at ANY corpus scale (the dictionary is
        # bounded by the length distribution, not the corpus), and
        # per-key stats are deterministic so placement cannot change
        # results. NOT the session parallelism: the dictionary's total
        # Python work is a bounded few seconds, and each task pays a
        # Python-worker round-trip (measured: 32 tasks = 0.75 s/task
        # blocked warm, ~5 s cold; 16 tasks halve the churn and still
        # spread the decode — 9.3→2.1 s cold, 1.9→1.1 s warm at
        # sf0.1). Worker churn grows with task count at EVERY scale,
        # so the cap is scale-independent, env-tunable for clusters
        # whose worker spin-up is cheaper.
        .repartition(
            min(
                _env_int("SPARK_GRAFT_DICT_PARTS", 16),
                docs.sparkSession.sparkContext.defaultParallelism,
            )
        )
        .withColumn(src_col, synth_src)
    )
    stats = stats_fn(dict_docs)
    stat_cols = [c for c in stats.columns if c != id_col]
    stats = stats.withColumnRenamed(id_col, "__lkey")
    return lens.join(F.broadcast(stats), "__lkey", how).select(
        id_col, *stat_cols
    )


def with_flac_depths_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize bit-depth-cycling FLAC payloads (8/24/32-bit mono;
    functions/flac.py `synth_flac_depths` closed forms)."""
    from redskins_rule_spark.functions.flac import synth_flac_depths

    return _with_synth_payload(df, synth_flac_depths, src_col, id_col, out)


def with_flac_rice2_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize 24-bit FLAC payloads mixing rice (method 00) and
    rice2 (method 01, 5-bit parameters) frames (functions/flac.py
    `synth_flac_rice2` closed forms)."""
    from redskins_rule_spark.functions.flac import synth_flac_rice2

    return _with_synth_payload(df, synth_flac_rice2, src_col, id_col, out)


def with_flac_varblock_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize VARIABLE-BLOCKING FLAC payloads (16/24/32-sample
    frames, sample-number headers; functions/flac.py
    `synth_flac_varblock` closed forms)."""
    from redskins_rule_spark.functions.flac import synth_flac_varblock

    return _with_synth_payload(df, synth_flac_varblock, src_col, id_col, out)


def decode_flac_stats_ext(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """decode_flac_stats plus the round-12 breadth fingerprints: bps
    (STREAMINFO bit depth), bs_fp = Σ (f+1)·blocksize_f (pins the
    variable-blocking frame layout), and k_fp = Σ (f+1)·frame_k_fp
    where frame_k_fp = Σ (p+1)·k over non-escape rice partitions —
    the rice/rice2 parameter-choice fingerprint (rice2 k reaches
    15-30, impossible under 4-bit rice, so coding-method confusion is
    hash-caught cross-engine). Same MD5 losslessness proof."""
    from redskins_rule_spark.functions.flac import parse_flac

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("sr", T.IntegerType()),
            T.StructField("bps", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("n_frames", T.LongType()),
            T.StructField("last_sample", T.LongType()),
            T.StructField("sample_sum", T.LongType()),
            T.StructField("sample_fp", T.LongType()),
            T.StructField("order_fp", T.LongType()),
            T.StructField("bs_fp", T.LongType()),
            T.StructField("k_fp", T.LongType()),
            T.StructField("n_escapes", T.LongType()),
            T.StructField("md5_ok", T.BooleanType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[payload_col]:
                if b is None:
                    rows.append((None,) * 12)
                    continue
                st = parse_flac(bytes(b))
                samples = [s for fr in st.frames for s in fr.samples]
                rows.append(
                    (
                        st.sample_rate,
                        st.bits_per_sample,
                        st.total_samples,
                        len(st.frames),
                        samples[-1],
                        sum(samples),
                        sum((k + 1) * s for k, s in enumerate(samples)),
                        sum((f + 1) * fr.subframe_code
                            for f, fr in enumerate(st.frames)),
                        sum((f + 1) * fr.blocksize
                            for f, fr in enumerate(st.frames)),
                        sum((f + 1) * fr.k_fp
                            for f, fr in enumerate(st.frames)),
                        sum(fr.n_escapes for fr in st.frames),
                        st.md5_ok,
                    )
                )
            cols = ["sr", "bps", "n_samples", "n_frames", "last_sample",
                    "sample_sum", "sample_fp", "order_fp", "bs_fp",
                    "k_fp", "n_escapes", "md5_ok"]
            meta_df = pd.DataFrame(rows, columns=cols)
            meta_df["sr"] = pd.array(meta_df["sr"], dtype="Int32")
            meta_df["bps"] = pd.array(meta_df["bps"], dtype="Int32")
            for c in cols[2:-1]:
                meta_df[c] = pd.array(meta_df[c], dtype="Int64")
            meta_df["md5_ok"] = pd.array(meta_df["md5_ok"],
                                         dtype="boolean")
            meta_df.insert(0, id_col, pdf[id_col].values)
            yield meta_df

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def with_flac_stereo_ext_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize stereo FLAC payloads exercising the round-12
    breadth on the stereo walk — depth cycle (8/24-bit), variable
    blocking, mixed rice/rice2 frames, all four channel assignments
    (functions/flac.py `synth_flac_stereo_ext` closed forms)."""
    from redskins_rule_spark.functions.flac import synth_flac_stereo_ext

    return _with_synth_payload(df, synth_flac_stereo_ext, src_col, id_col,
                               out)


def decode_flac_stereo_stats_ext(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """decode_flac_stereo_stats plus the breadth fingerprints: bps
    (STREAMINFO depth — binds the sample-size codes and the MD5 byte
    packing at 1/3 bytes per sample per channel) and bs_fp =
    Σ (f+1)·blocksize (binds the variable-blocking frame layout and
    the cumulative sample-number headers). Entropy-method semantics
    (rice vs rice2) are bound by the mono q236 face over the SAME
    shared decoder; here a misread shows up as md5_ok=False."""
    from redskins_rule_spark.functions.flac import (
        STEREO_MODES,
        parse_flac_stereo,
    )

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("sr", T.IntegerType()),
            T.StructField("bps", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("n_frames", T.LongType()),
            T.StructField("left_sum", T.LongType()),
            T.StructField("right_sum", T.LongType()),
            T.StructField("left_fp", T.LongType()),
            T.StructField("right_fp", T.LongType()),
            T.StructField("mode_fp", T.LongType()),
            T.StructField("code_fp", T.LongType()),
            T.StructField("bs_fp", T.LongType()),
            T.StructField("md5_ok", T.BooleanType()),
        ]
    )
    mode_idx = {m: i for i, m in enumerate(STEREO_MODES)}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[payload_col]:
                if b is None:
                    rows.append((None,) * 12)
                    continue
                st = parse_flac_stereo(bytes(b))
                left = [s for fr in st.frames for s in fr.left]
                right = [s for fr in st.frames for s in fr.right]
                rows.append(
                    (
                        st.sample_rate,
                        st.bits_per_sample,
                        st.total_samples,
                        len(st.frames),
                        sum(left),
                        sum(right),
                        sum((k + 1) * s for k, s in enumerate(left)),
                        sum((k + 1) * s for k, s in enumerate(right)),
                        sum((f + 1) * mode_idx[fr.mode]
                            for f, fr in enumerate(st.frames)),
                        sum((f + 1) * (fr.codes[0] + fr.codes[1])
                            for f, fr in enumerate(st.frames)),
                        sum((f + 1) * fr.blocksize
                            for f, fr in enumerate(st.frames)),
                        st.md5_ok,
                    )
                )
            cols = ["sr", "bps", "n_samples", "n_frames", "left_sum",
                    "right_sum", "left_fp", "right_fp", "mode_fp",
                    "code_fp", "bs_fp", "md5_ok"]
            meta_df = pd.DataFrame(rows, columns=cols)
            meta_df["sr"] = pd.array(meta_df["sr"], dtype="Int32")
            meta_df["bps"] = pd.array(meta_df["bps"], dtype="Int32")
            for c in cols[2:-1]:
                meta_df[c] = pd.array(meta_df[c], dtype="Int64")
            meta_df["md5_ok"] = pd.array(meta_df["md5_ok"],
                                         dtype="boolean")
            meta_df.insert(0, id_col, pdf[id_col].values)
            yield meta_df

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def with_flac_multichannel_payload(
    df: DataFrame, src_col: str, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Materialize 3-8 channel FLAC payloads — independent coding,
    the ONLY layout the format defines above two channels — cycling
    depth (8/16/24), variable blocking, and rice/rice2 per frame
    (functions/flac.py `synth_flac_multichannel` closed forms)."""
    from redskins_rule_spark.functions.flac import synth_flac_multichannel

    return _with_synth_payload(df, synth_flac_multichannel, src_col, id_col,
                               out)


def decode_flac_multichannel_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Arrow-batched 3-8 channel FLAC decode → per-stream stats. Each
    payload decodes row-locally (embarrassingly parallel — the 100 TB
    posture of every media face here). Fingerprints bind EVERY
    channel of EVERY frame cross-engine:

      ch_sum  = Σ_c Σ_k s(c,k)
      ch_fp   = Σ_c Σ_k (c+1)·(k+1)·s(c,k)   (channel-order-sensitive)
      last_fp = Σ_c (c+1)·s(c, total-1)
      code_fp = Σ_f (f+1)·Σ_c (c+1)·code(f,c) (per-channel subframe
                headers — a skipped or reordered channel read breaks it)
      bs_fp   = Σ_f (f+1)·blocksize_f         (variable-frame layout)

    plus the MD5 losslessness proof over the channel-interleaved
    reconstruction at the stream depth."""
    from redskins_rule_spark.functions.flac import parse_flac_multichannel

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("sr", T.IntegerType()),
            T.StructField("nch", T.IntegerType()),
            T.StructField("bps", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("n_frames", T.LongType()),
            T.StructField("ch_sum", T.LongType()),
            T.StructField("ch_fp", T.LongType()),
            T.StructField("last_fp", T.LongType()),
            T.StructField("code_fp", T.LongType()),
            T.StructField("bs_fp", T.LongType()),
            T.StructField("md5_ok", T.BooleanType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[payload_col]:
                if b is None:
                    rows.append((None,) * 11)
                    continue
                st = parse_flac_multichannel(bytes(b))
                nch = st.n_channels
                chans = [
                    [s for fr in st.frames for s in fr.channels[c]]
                    for c in range(nch)
                ]
                rows.append(
                    (
                        st.sample_rate,
                        nch,
                        st.bits_per_sample,
                        st.total_samples,
                        len(st.frames),
                        sum(sum(ch) for ch in chans),
                        sum((c + 1) * (k + 1) * s
                            for c, ch in enumerate(chans)
                            for k, s in enumerate(ch)),
                        sum((c + 1) * ch[-1]
                            for c, ch in enumerate(chans)),
                        sum((f + 1) * sum((c + 1) * code
                                          for c, code in enumerate(fr.codes))
                            for f, fr in enumerate(st.frames)),
                        sum((f + 1) * fr.blocksize
                            for f, fr in enumerate(st.frames)),
                        st.md5_ok,
                    )
                )
            cols = ["sr", "nch", "bps", "n_samples", "n_frames", "ch_sum",
                    "ch_fp", "last_fp", "code_fp", "bs_fp", "md5_ok"]
            meta_df = pd.DataFrame(rows, columns=cols)
            for c in ("sr", "nch", "bps"):
                meta_df[c] = pd.array(meta_df[c], dtype="Int32")
            for c in cols[3:-1]:
                meta_df[c] = pd.array(meta_df[c], dtype="Int64")
            meta_df["md5_ok"] = pd.array(meta_df["md5_ok"], dtype="boolean")
            meta_df.insert(0, id_col, pdf[id_col].values)
            yield meta_df

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)
