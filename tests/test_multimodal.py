from __future__ import annotations

import pytest

from redskins_rule_spark.operators.multimodal import (
    decode_image_meta,
    resize_images,
    sample_frames,
    with_binary_payload,
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, "a" * 100), (2, "b" * 700)], "doc_id long, text string"
    )


def test_payload_and_fake_decode(spark):
    df = with_binary_payload(_docs(spark), "text")
    assert dict(df.dtypes)["payload"] == "binary"
    meta = {r.doc_id: r for r in decode_image_meta(df).collect()}
    assert meta[1].byte_len == 100 and meta[1].width == 101 and meta[1].height == 101
    assert meta[2].byte_len == 700 and meta[2].width == 61 and meta[2].height == 221
    assert meta[1].channels == 3


def test_real_backend_is_explicit_stub(spark):
    df = with_binary_payload(_docs(spark), "text")
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        decode_image_meta(df, decode_backend="real").collect()


def test_resize_stub_shapes(spark):
    df = with_binary_payload(_docs(spark), "text")
    out = resize_images(df, target=(224, 224)).collect()
    assert all(r.width == 224 and r.height == 224 for r in out)
    assert len(out) == 2


def test_sample_frames_one_to_many(spark):
    df = with_binary_payload(_docs(spark), "text")
    out = sample_frames(df, every_n_bytes=64).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[1]) == 2  # 100 bytes → 2 chunks of ≤64
    assert len(by_doc[2]) == 11  # 700 bytes → 11 chunks
    assert by_doc[1][0].frame_idx == 0 and len(by_doc[1][0].frame_bytes) == 64


def test_bmp_codec_roundtrip():
    import numpy as np

    from redskins_rule_spark.functions.bmp import (
        bmp_size,
        decode_bmp,
        decode_bmp_meta,
        encode_bmp,
    )

    rng = np.random.RandomState(7)
    for w, h in [(1, 1), (2, 3), (31, 17), (13, 5)]:
        px = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        data = encode_bmp(px)
        assert len(data) == bmp_size(w, h)
        assert decode_bmp_meta(data) == (w, h, 3)
        assert (decode_bmp(data) == px).all()


def test_bmp_resize_nearest_known_values():
    import numpy as np

    from redskins_rule_spark.functions.bmp import resize_nearest

    # 2x2 → 4x4 nearest-neighbor: each source pixel becomes a 2x2 block
    px = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    out = resize_nearest(px, 4, 4)
    assert out.shape == (4, 4, 3)
    assert (out[:2, :2] == px[0, 0]).all()
    assert (out[2:, 2:] == px[1, 1]).all()


def test_decode_image_meta_bmp_backend(spark):
    from redskins_rule_spark.functions.bmp import bmp_size
    from redskins_rule_spark.operators.multimodal import (
        decode_image_meta,
        with_bmp_payload,
    )

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "x" * 100)], "doc_id long, text string"
    )
    rows = {
        r.doc_id: r
        for r in decode_image_meta(
            with_bmp_payload(docs, "text", "doc_id"),
            "payload", "doc_id", decode_backend="bmp",
        ).collect()
    }
    for doc_id, blen in [(1, 11), (2, 100)]:
        w, h = blen % 31 + 1, blen % 17 + 1
        r = rows[doc_id]
        assert (r.width, r.height, r.channels) == (w, h, 3)
        assert r.byte_len == bmp_size(w, h)


def test_resize_images_bmp_backend(spark):
    from redskins_rule_spark.functions.bmp import decode_bmp
    from redskins_rule_spark.operators.multimodal import (
        resize_images,
        with_bmp_payload,
    )

    docs = spark.createDataFrame([(1, "some doc text")], "doc_id long, text string")
    out = resize_images(
        with_bmp_payload(docs, "text", "doc_id"),
        "payload", "doc_id", target=(8, 6), decode_backend="bmp",
    ).collect()[0]
    assert (out.width, out.height) == (8, 6)
    px = decode_bmp(bytes(out.payload))
    assert px.shape == (6, 8, 3)


def test_null_text_propagates_null_metadata(spark):
    from redskins_rule_spark.operators.multimodal import (
        decode_image_meta,
        with_binary_payload,
        with_bmp_payload,
    )

    docs = spark.createDataFrame(
        [(1, "hello"), (2, None)], "doc_id bigint, text string"
    )
    for payloads, backend in [
        (with_bmp_payload(docs, "text"), "bmp"),
        (with_binary_payload(docs, "text"), "fake"),
    ]:
        meta = {
            r["doc_id"]: (r["byte_len"], r["width"], r["height"], r["channels"])
            for r in decode_image_meta(payloads, decode_backend=backend).collect()
        }
        assert meta[2] == (None, None, None, None), backend
        assert all(v is not None for v in meta[1]), backend


def test_decode_bmp_honors_topdown_negative_height():
    import struct

    import numpy as np

    from redskins_rule_spark.functions.bmp import decode_bmp, encode_bmp

    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    data = bytearray(encode_bmp(px))
    # flip to top-down: negate biHeight and reorder the pixel rows
    w, h = 3, 2
    struct.pack_into("<i", data, 14 + 8, -h)
    rsz = (3 * w + 3) // 4 * 4
    rows = bytes(data[54:])
    data[54:] = rows[rsz:] + rows[:rsz]
    got = decode_bmp(bytes(data))
    assert np.array_equal(got, px)


def test_resize_and_frames_handle_null_payloads(spark):
    from redskins_rule_spark.operators.multimodal import (
        resize_images,
        sample_frames,
        with_bmp_payload,
    )

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, None)], "doc_id bigint, text string"
    )
    payloads = with_bmp_payload(docs, "text")
    resized = {
        r["doc_id"]: (r["payload"], r["width"], r["height"])
        for r in resize_images(
            payloads, target=(4, 4), decode_backend="bmp"
        ).collect()
    }
    assert resized[2] == (None, None, None)
    assert resized[1][0] is not None and resized[1][1:] == (4, 4)
    frames = sample_frames(payloads, every_n_bytes=64)
    assert frames.where("doc_id = 2").count() == 0
    assert frames.where("doc_id = 1").count() > 0


# --- audio (WAV) ---------------------------------------------------------

def test_wav_codec_roundtrip():
    from redskins_rule_spark.functions.wav import decode_wav, encode_wav, synth_samples

    s = synth_samples(157, 25)
    meta, back = decode_wav(encode_wav(s, 8000, 1))
    assert back == s
    assert (meta.sample_rate, meta.n_channels, meta.n_samples) == (8000, 1, 25)
    assert meta.duration_ms == 25 * 1000 // 8000
    # stereo frames interleave; frame count halves
    meta2, back2 = decode_wav(encode_wav(s[:24], 16000, 2))
    assert meta2.n_channels == 2 and meta2.n_samples == 12 and back2 == s[:24]


def test_wav_codec_rejects_garbage():
    from redskins_rule_spark.functions.wav import decode_wav

    with pytest.raises(ValueError):
        decode_wav(b"not a wav at all")
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x00\x00\x00\x00WAVE")  # no fmt/data chunks


def test_wav_payload_decode_spark(spark):
    from redskins_rule_spark.operators.multimodal import (
        decode_audio_meta,
        with_wav_payload,
    )

    df = with_wav_payload(_docs(spark), "text")
    assert dict(df.dtypes)["payload"] == "binary"
    meta = {r.doc_id: r for r in decode_audio_meta(df).collect()}
    # blen=100 -> n = 100 % 97 + 8 = 11; blen=700 -> n = 700 % 97 + 8 = 29
    assert meta[1].n_samples == 11 and meta[1].byte_len == 44 + 22
    assert meta[2].n_samples == 29 and meta[2].duration_ms == 29 * 1000 // 8000
    assert all(r.sample_rate == 8000 and r.n_channels == 1 for r in meta.values())


def test_wav_null_text_null_meta(spark):
    from redskins_rule_spark.operators.multimodal import (
        decode_audio_meta,
        with_wav_payload,
    )

    df = spark.createDataFrame(
        [(1, "abc"), (2, None)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in decode_audio_meta(with_wav_payload(df, "text")).collect()}
    assert out[2].byte_len is None and out[2].sample_rate is None
    assert out[1].n_samples == 3 % 97 + 8


def test_audio_non_wav_backend_is_explicit_stub(spark):
    from redskins_rule_spark.operators.multimodal import (
        decode_audio_meta,
        with_wav_payload,
    )

    df = with_wav_payload(_docs(spark), "text")
    # flac has no framing path: explicit stub
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        decode_audio_meta(df, decode_backend="flac").collect()
    # mp3 IS real since round 7 — on a WAV payload it is a real parse
    # failure (lost sync), not a stub
    with pytest.raises(Exception, match="sync|ValueError"):
        decode_audio_meta(df, decode_backend="mp3").collect()


# --- video (animated GIF) ------------------------------------------------

def test_gif_codec_roundtrip():
    from redskins_rule_spark.functions.gif import (
        decode_gif,
        decode_gif_meta,
        encode_gif,
        synth_frames,
    )

    frames = synth_frames(157, 3, 5, 4)
    b = encode_gif(frames, 5, 4, delay_cs=6)
    meta = decode_gif_meta(b)
    assert (meta.width, meta.height, meta.n_frames) == (5, 4, 3)
    assert meta.delays_cs == (6, 6, 6) and meta.duration_cs == 18
    _, decoded = decode_gif(b)
    assert decoded == frames
    # crosses the 255-byte sub-block and periodic-CLEAR boundaries
    big = synth_frames(9, 2, 40, 30)
    m2, d2 = decode_gif(encode_gif(big, 40, 30))
    assert d2 == big and m2.n_frames == 2


def test_gif_codec_rejects_garbage():
    from redskins_rule_spark.functions.gif import decode_gif_meta

    with pytest.raises(ValueError):
        decode_gif_meta(b"definitely not a gif")


def test_gif_payload_decode_spark(spark):
    from redskins_rule_spark.operators.multimodal import (
        decode_video_meta,
        with_gif_payload,
    )

    df = with_gif_payload(_docs(spark), "text")
    meta = {r.doc_id: r for r in decode_video_meta(df).collect()}
    # blen=100: w=100%16+2=6, h=100%11+2=3, nf=100%5+1=1
    assert (meta[1].width, meta[1].height, meta[1].n_frames) == (6, 3, 1)
    # blen=700: w=700%16+2=14, h=700%11+2=9, nf=700%5+1=1
    assert (meta[2].width, meta[2].height, meta[2].n_frames) == (14, 9, 1)
    assert all(r.duration_cs == r.n_frames * 4 for r in meta.values())


def test_gif_frame_sampling_matches_arithmetic(spark):
    from redskins_rule_spark.operators.multimodal import (
        sample_gif_frames,
        with_gif_payload,
    )

    df = spark.createDataFrame([(1, "x" * 123)], "doc_id long, text string")
    # blen=123: w=13, h=4, nf=4 -> sampled frames 0, 2
    out = {r.frame_idx: r.pixel_sum for r in sample_gif_frames(with_gif_payload(df, "text")).collect()}
    def psum(f, blen=123, w=13, h=4):
        return sum((blen + 7 * f + 3 * y + x) % 256 for y in range(h) for x in range(w))
    assert out == {0: psum(0), 2: psum(2)}


def test_video_non_gif_backend_is_explicit_stub(spark):
    from redskins_rule_spark.operators.multimodal import (
        decode_video_meta,
        with_gif_payload,
    )

    df = with_gif_payload(_docs(spark), "text")
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        decode_video_meta(df, decode_backend="mp4").collect()


# --- ADVICE round-3 contracts -------------------------------------------

def test_wav_gif_payload_use_character_length(spark):
    """The q84/q98/q99 oracles use SQL length(text) = CHARACTER count;
    the generators must agree on non-ASCII text (1 char, 2+ utf-8
    bytes per char here)."""
    from redskins_rule_spark.operators.multimodal import (
        decode_audio_meta,
        decode_video_meta,
        with_gif_payload,
        with_wav_payload,
    )

    df = spark.createDataFrame(
        [(1, "é" * 100)], "doc_id long, text string"  # 100 chars, 200 bytes
    )
    wav = decode_audio_meta(with_wav_payload(df, "text")).collect()[0]
    assert wav.n_samples == 100 % 97 + 8  # char length, not 200 % 97 + 8
    gif = decode_video_meta(with_gif_payload(df, "text")).collect()[0]
    assert (gif.width, gif.height, gif.n_frames) == (
        100 % 16 + 2, 100 % 11 + 2, 100 % 5 + 1
    )


def test_truncated_wav_raises_valueerror():
    from redskins_rule_spark.functions.wav import decode_wav, encode_wav, synth_samples

    full = encode_wav(synth_samples(7, 20), 8000, 1)
    # cut mid-fmt-chunk: the struct under-read must surface as ValueError
    for cut in (14, 20, 30):
        with pytest.raises(ValueError):
            decode_wav(full[:cut])


def test_truncated_gif_raises_valueerror():
    from redskins_rule_spark.functions.gif import (
        decode_gif,
        decode_gif_meta,
        encode_gif,
        synth_frames,
    )

    full = encode_gif(synth_frames(5, 2, 6, 4), 6, 4, delay_cs=3)
    for cut in (14, len(full) // 2, len(full) - 2):
        with pytest.raises(ValueError):
            decode_gif_meta(full[:cut])
        with pytest.raises(ValueError):
            decode_gif(full[:cut])


# --- image (PNG, real DEFLATE) -------------------------------------------

def test_png_codec_roundtrip():
    from redskins_rule_spark.functions.png import (
        decode_png,
        decode_png_meta,
        encode_png,
        synth_pixels,
    )

    px = synth_pixels(41, 9, 5)
    b = encode_png(px, 9, 5)
    meta = decode_png_meta(b)
    assert (meta.width, meta.height, meta.bit_depth, meta.color_type) == (9, 5, 8, 2)
    assert meta.channels == 3
    m2, back = decode_png(b)
    assert back == px and m2.width == 9


def test_png_decoder_reverses_all_filters():
    """Hand-build an IDAT using every filter type (Sub/Up/Average/
    Paeth) and check the decoder reconstructs the same pixels the
    filter-0 encoding carries — i.e. it reads OTHER encoders' files."""
    import struct
    import zlib

    from redskins_rule_spark.functions.png import (
        _chunk,
        _SIG,
        decode_png,
        synth_pixels,
    )

    w, h = 4, 5
    px = synth_pixels(7, w, h)
    stride = w * 3

    def row(y):
        return px[y * stride : (y + 1) * stride]

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    raw = bytearray()
    prev = bytes(stride)
    for y, f in enumerate([0, 1, 2, 3, 4]):
        line, cur = bytearray(), row(y)
        if f == 0:
            line += cur
        elif f == 1:  # Sub
            for i in range(stride):
                left = cur[i - 3] if i >= 3 else 0
                line.append((cur[i] - left) & 0xFF)
        elif f == 2:  # Up
            for i in range(stride):
                line.append((cur[i] - prev[i]) & 0xFF)
        elif f == 3:  # Average
            for i in range(stride):
                left = cur[i - 3] if i >= 3 else 0
                line.append((cur[i] - ((left + prev[i]) >> 1)) & 0xFF)
        else:  # Paeth
            for i in range(stride):
                left = cur[i - 3] if i >= 3 else 0
                ul = prev[i - 3] if i >= 3 else 0
                line.append((cur[i] - paeth(left, prev[i], ul)) & 0xFF)
        raw += bytes([f]) + bytes(line)
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    b = (_SIG + _chunk(b"IHDR", ihdr)
         + _chunk(b"IDAT", zlib.compress(bytes(raw)))
         + _chunk(b"IEND", b""))
    _, decoded = decode_png(b)
    assert decoded == px


def test_png_rejects_garbage_truncation_and_bad_crc():
    from redskins_rule_spark.functions.png import (
        decode_png,
        decode_png_meta,
        encode_png,
        synth_pixels,
    )

    full = encode_png(synth_pixels(3, 6, 4), 6, 4)
    with pytest.raises(ValueError):
        decode_png_meta(b"not a png")
    for cut in (10, 20, len(full) // 2, len(full) - 3):
        with pytest.raises(ValueError):
            decode_png(full[:cut])
    # flip one IDAT byte: CRC check must catch it
    corrupt = bytearray(full)
    corrupt[40] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(corrupt))


def test_png_payload_decode_spark(spark):
    from redskins_rule_spark.operators.multimodal import (
        decode_png_stats,
        with_png_payload,
    )

    df = spark.createDataFrame(
        [(1, "a" * 100), (2, None), (3, "é" * 30)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in decode_png_stats(with_png_payload(df, "text")).collect()}
    # clen=100: w=100%13+1=10, h=100%7+1=3
    assert (out[1].width, out[1].height) == (10, 3)
    assert out[1].pixel_sum == sum(
        (100 + 5 * y + 3 * x + c) % 256
        for y in range(3) for x in range(10) for c in range(3)
    )
    assert out[2].width is None and out[2].pixel_sum is None
    # non-ASCII: CHARACTER length (30), not utf-8 byte length (60)
    assert (out[3].width, out[3].height) == (30 % 13 + 1, 30 % 7 + 1)


def test_audio_frame_features_known_samples(spark):
    from redskins_rule_spark.functions.wav import encode_wav
    from redskins_rule_spark.operators.multimodal import audio_frame_features

    # 5 samples, frame_len=4 -> frames [4 samples, 1 sample]
    samples = [100, -200, 300, 0, -50]
    wav = encode_wav(samples, 8000, 1)
    df = spark.createDataFrame([(1, bytearray(wav))], "doc_id long, payload binary")
    rows = {r.frame_idx: r for r in
            audio_frame_features(df, frame_len=4).collect()}
    f0, f1 = rows[0], rows[1]
    assert f0.n_in_frame == 4
    assert f0.sum_sq == 100**2 + 200**2 + 300**2
    assert f0.peak == 300
    # signs: +,-,+,+ (0 counts as >=0): crossings at 0->1, 1->2 = 2
    assert f0.zero_crossings == 2
    assert (f1.n_in_frame, f1.sum_sq, f1.peak, f1.zero_crossings) == (1, 2500, 50, 0)


def test_audio_frame_features_null_payload_skipped(spark):
    from redskins_rule_spark.operators.multimodal import audio_frame_features

    df = spark.createDataFrame([(1, None)], "doc_id long, payload binary")
    assert audio_frame_features(df).count() == 0


def test_image_patches_hand_computed(spark):
    import numpy as np

    from redskins_rule_spark.functions.bmp import encode_bmp
    from redskins_rule_spark.operators.multimodal import image_patches

    # 3x3 image, patch=2 -> tiles (2x2, 2x1, 1x2, 1x1)
    px = np.arange(27, dtype=np.uint8).reshape(3, 3, 3)  # pixel[y,x,c]=9y+3x+c
    df = spark.createDataFrame(
        [(7, bytearray(encode_bmp(px)))], "doc_id long, payload binary"
    )
    got = {(r.patch_row, r.patch_col):
           (r.tile_h, r.tile_w, r.sum_r, r.sum_g, r.sum_b, r.pixel_sum)
           for r in image_patches(df, patch=2).collect()}
    arr = px.astype(int)

    def ref(pr, pc):
        t = arr[pr*2:(pr+1)*2, pc*2:(pc+1)*2]
        s = t.sum(axis=(0, 1))
        return (t.shape[0], t.shape[1], s[0], s[1], s[2], int(s.sum()))

    assert got == {(0, 0): ref(0, 0), (0, 1): ref(0, 1),
                   (1, 0): ref(1, 0), (1, 1): ref(1, 1)}


def test_image_patches_png_backend_matches_bmp(spark):
    import numpy as np

    from redskins_rule_spark.functions.bmp import encode_bmp
    from redskins_rule_spark.functions.png import encode_png
    from redskins_rule_spark.operators.multimodal import image_patches

    px = np.arange(5 * 6 * 3, dtype=np.uint8).reshape(5, 6, 3)
    bmp_df = spark.createDataFrame(
        [(1, bytearray(encode_bmp(px)))], "doc_id long, payload binary"
    )
    png_df = spark.createDataFrame(
        [(1, bytearray(encode_png(px.tobytes(), 6, 5)))],
        "doc_id long, payload binary",
    )
    via_bmp = {(r.patch_row, r.patch_col): (r.sum_r, r.sum_g, r.sum_b)
               for r in image_patches(bmp_df, patch=4).collect()}
    via_png = {(r.patch_row, r.patch_col): (r.sum_r, r.sum_g, r.sum_b)
               for r in image_patches(png_df, patch=4,
                                      decode_backend="png").collect()}
    assert via_bmp == via_png and len(via_bmp) == 4


def test_resize_images_png_roundtrip(spark):
    import numpy as np

    from redskins_rule_spark.functions.png import decode_png, encode_png
    from redskins_rule_spark.operators.multimodal import resize_images

    px = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    df = spark.createDataFrame(
        [(1, bytearray(encode_png(px.tobytes(), 6, 4)))],
        "doc_id long, payload binary",
    )
    row = resize_images(df, target=(3, 2), decode_backend="png").collect()[0]
    assert (row.width, row.height) == (3, 2)
    meta, pixels = decode_png(bytes(row.payload))
    assert (meta.width, meta.height) == (3, 2)
    got = np.frombuffer(pixels, dtype=np.uint8).reshape(2, 3, 3)
    # nearest-neighbor: output pixel (y,x) samples source (y*4//2? ...) —
    # just assert every output pixel exists somewhere in the source
    src = {tuple(p) for p in px.reshape(-1, 3)}
    assert all(tuple(p) in src for p in got.reshape(-1, 3))


def test_frame_deltas_known_synthetic_motion(spark):
    """synth_frames advances every pixel by +7 (mod 256) per frame, so
    each transition's mean abs delta is 7 + 242·(wrap fraction) —
    verified against a direct numpy fold over the decoded frames."""
    import numpy as np

    from redskins_rule_spark.functions.gif import (
        decode_gif,
        encode_gif,
        synth_frames,
    )
    from redskins_rule_spark.operators.multimodal import (
        frame_deltas,
        with_gif_payload,
    )

    docs = spark.createDataFrame(
        [(1, "x" * 300), (2, "y" * 7), (3, None), (4, "z")],
        "doc_id int, text string",
    )
    out = frame_deltas(with_gif_payload(docs, "text")).collect()
    got = {(r.doc_id, r.f): r.mad for r in out}
    for doc_id, text in [(1, "x" * 300), (2, "y" * 7), (4, "z")]:
        clen = len(text)
        w, h, nf = clen % 16 + 2, clen % 11 + 2, clen % 5 + 1
        payload = encode_gif(synth_frames(clen, nf, w, h), w, h, delay_cs=4)
        _, frames = decode_gif(payload)
        arrs = [np.frombuffer(b, dtype=np.uint8).astype(int) for b in frames]
        for f in range(1, nf):
            expect = float(np.abs(arrs[f] - arrs[f - 1]).sum()) / (w * h)
            assert got[(doc_id, f)] == expect, (doc_id, f)
        assert all(k[0] != doc_id or k[1] < nf for k in got)
    assert not any(k[0] == 3 for k in got)  # null payload emits nothing
    # single-frame docs emit nothing: clen=1 -> nf = 1 % 5 + 1 = 2 frames
    # (doc 4 HAS one transition); construct a true single-frame doc:
    clen5 = "q" * 4  # 4 % 5 + 1 = 5 frames -> 4 transitions
    single = spark.createDataFrame([(9, "s" * 9)], "doc_id int, text string")
    # 9 % 5 + 1 = 5 frames; just assert transition count matches nf-1
    n = frame_deltas(with_gif_payload(single, "text")).count()
    assert n == (9 % 5 + 1) - 1


def test_image_dhash_known_gradient_and_nulls(spark):
    """The synthetic BMP is a left-to-right +1 gradient, so every
    sampled gradient pair with distinct sample columns gives bit=1
    unless the right sample wraps past 255 — checked against a
    direct numpy dhash of the decoded pixels."""
    import numpy as np

    from redskins_rule_spark.functions.bmp import decode_bmp, encode_bmp
    from redskins_rule_spark.operators.multimodal import (
        image_dhash,
        with_bmp_payload,
    )

    docs = spark.createDataFrame(
        [(1, "a" * 40), (2, "b" * 300), (3, None)],
        "doc_id int, text string",
    )
    got = {r.doc_id: (r.dhash_hi, r.dhash_lo) for r in
           image_dhash(with_bmp_payload(docs, "text")).collect()}
    assert got[3] == (None, None)
    for doc_id, text in [(1, "a" * 40), (2, "b" * 300)]:
        bl = len(text.encode("utf-8"))
        w, h = bl % 31 + 1, bl % 17 + 1
        px = np.zeros((h, w, 3), dtype=np.uint8)
        for y in range(h):
            for x in range(w):
                for c in range(3):
                    px[y, x, c] = (x + y + c + bl) % 256
        gray = decode_bmp(encode_bmp(px)).astype(int).sum(axis=2)
        hi = lo = 0
        for yt in range(8):
            sy = (yt * h) // 8
            for xt in range(8):
                if gray[sy, ((xt + 1) * w) // 9] > gray[sy, (xt * w) // 9]:
                    k = yt * 8 + xt
                    if k < 32:
                        lo |= 1 << k
                    else:
                        hi |= 1 << (k - 32)
        assert got[doc_id] == (hi, lo), doc_id
    # near-dup property: same image content -> identical hash
    dup = spark.createDataFrame(
        [(10, "a" * 40), (11, "a" * 40)], "doc_id int, text string"
    )
    hs = {r.doc_id: (r.dhash_hi, r.dhash_lo) for r in
          image_dhash(with_bmp_payload(dup, "text")).collect()}
    assert hs[10] == hs[11]


def test_truncated_bmp_raises_valueerror():
    """BMP shares the corrupt-payload contract of wav/gif/png: any
    truncation — header or pixel section — surfaces as ValueError
    (numpy's short-buffer error IS a ValueError), never struct.error,
    so mapInPandas tasks fail with the documented exception type."""
    import numpy as np
    import pytest as _pytest

    from redskins_rule_spark.functions.bmp import decode_bmp, encode_bmp

    px = np.zeros((4, 5, 3), dtype=np.uint8)
    good = encode_bmp(px)
    assert decode_bmp(good).shape == (4, 5, 3)
    with _pytest.raises(ValueError):
        decode_bmp(good[:10])          # inside the header
    with _pytest.raises(ValueError):
        decode_bmp(good[:-7])          # inside the pixel rows
    with _pytest.raises(ValueError):
        decode_bmp(b"XX" + good[2:])   # wrong magic


# --- round-5: baseline JPEG codec ------------------------------------------


def test_jpeg_dc_only_roundtrip_exact():
    """DC-only blocks decode to EXACTLY 2*dc + 128 per pixel under
    the Annex K table (q[0] = 16): the arithmetic contract the q165
    oracle recomputes."""
    import numpy as np

    from redskins_rule_spark.functions.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
        synth_dc_blocks,
    )

    clen, wb, hb = 157, 3, 2
    data = encode_jpeg_gray(synth_dc_blocks(clen, wb, hb), wb, hb)
    w, h, px = decode_jpeg_gray(data)
    assert (w, h) == (24, 16)
    arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
    for b in range(wb * hb):
        dc = ((clen + 7 * b) % 64) - 32
        by, bx = divmod(b, wb)
        assert (arr[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
                == 2 * dc + 128).all()


def test_jpeg_ac_blocks_match_direct_idct():
    """Blocks WITH AC energy (runs, ZRL, EOB paths all exercised)
    decode to the same pixels as a direct dezigzag->dequant->float
    IDCT reference — the decoder is a real transform decoder, not a
    DC-only shortcut."""
    import numpy as np

    from redskins_rule_spark.functions.jpeg import (
        QUANT_LUMA,
        ZIGZAG,
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    rng = np.random.RandomState(11)
    blocks = []
    for _ in range(4):
        blk = [0] * 64
        blk[0] = int(rng.randint(-40, 40))
        for k in rng.choice(range(1, 64), size=6, replace=False):
            blk[int(k)] = int(rng.randint(-30, 30))
        blocks.append(blk)
    blocks.append([3] + [0] * 62 + [-7])  # 62-zero run: ZRL x3 path
    data = encode_jpeg_gray(blocks, 5, 1)
    w, h, px = decode_jpeg_gray(data)
    got = np.frombuffer(px, dtype=np.uint8).reshape(h, w)

    M = np.array(
        [[(np.sqrt(0.5) if u == 0 else 1.0) / 2.0
          * np.cos((2 * x + 1) * u * np.pi / 16.0)
          for x in range(8)] for u in range(8)]
    )
    qt = np.array(QUANT_LUMA, dtype=float).reshape(8, 8)
    prev = 0
    for b, blk in enumerate(blocks):
        coeff = np.zeros(64)
        for i in range(64):
            coeff[ZIGZAG[i]] = blk[i]
        ref = np.clip(
            np.floor(M.T @ (coeff.reshape(8, 8) * qt) @ M + 0.5) + 128,
            0, 255,
        )
        assert (got[:, b * 8:(b + 1) * 8] == ref).all(), b
        prev = blk[0]
    assert prev == 3  # layout sanity: last block was the ZRL one


def test_jpeg_rejects_corruption_and_out_of_profile():
    import pytest as _pytest

    from redskins_rule_spark.functions.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
        synth_dc_blocks,
    )

    good = encode_jpeg_gray(synth_dc_blocks(10, 2, 1), 2, 1)
    with _pytest.raises(ValueError):
        decode_jpeg_gray(b"\x00\x01" + good)  # no SOI
    with _pytest.raises(ValueError):
        decode_jpeg_gray(good[:40])  # truncated mid-segment
    with _pytest.raises(ValueError):
        decode_jpeg_gray(good[:-2])  # missing EOI
    # progressive SOF2 is out of profile, not garbage-decoded
    bad = bytearray(good)
    sof = bad.find(b"\xff\xc0")
    bad[sof + 1] = 0xC2
    with _pytest.raises(ValueError):
        decode_jpeg_gray(bytes(bad))


def test_jpeg_every_truncation_raises_valueerror():
    """ADVICE r5 (medium): EVERY prefix of a valid payload must raise
    ValueError — the shared corruption contract decode_stats_tolerant
    catches — never IndexError/struct.error. Before the bounds fixes,
    a prefix ending right after a 0xFF byte hit `data[pos + 1]` raw
    (4 such truncation points in this very payload), and a seglen-
    consistent short SOF0/SOS body hit struct.unpack / body[8]."""
    import pytest as _pytest

    from redskins_rule_spark.functions.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
        synth_dc_blocks,
    )

    good = encode_jpeg_gray(synth_dc_blocks(10, 2, 1), 2, 1)
    saw_ff_at_end = False
    for cut in range(2, len(good)):
        prefix = good[:cut]
        if prefix.endswith(b"\xff"):
            saw_ff_at_end = True
        with _pytest.raises(ValueError):
            decode_jpeg_gray(prefix)
    assert saw_ff_at_end  # the payload really exercises the ff-at-end case

    # seglen-consistent short bodies: rewrite SOF0's seglen so the body
    # passes the length check but is too short for the 9-byte frame spec
    sof = good.find(b"\xff\xc0")
    short_sof = good[: sof + 2] + b"\x00\x07" + good[sof + 4 : sof + 9]
    with _pytest.raises(ValueError):
        decode_jpeg_gray(short_sof + good[sof + 4 + 11 :])
    sos = good.find(b"\xff\xda")
    short_sos = good[:sos] + b"\xff\xda\x00\x03" + good[sos + 4 : sos + 5]
    with _pytest.raises(ValueError):
        decode_jpeg_gray(short_sos + good[sos + 8 :])


def test_tolerant_decode_quarantines_ff_truncation(spark):
    """The escape ADVICE r5 described end-to-end: a payload truncated
    right after a 0xFF must land in quarantine (decode_error set),
    not kill the job."""
    from redskins_rule_spark.functions.jpeg import (
        encode_jpeg_gray,
        synth_dc_blocks,
    )
    from redskins_rule_spark.operators.multimodal import decode_stats_tolerant

    good = encode_jpeg_gray(synth_dc_blocks(10, 2, 1), 2, 1)
    cut = next(
        c for c in range(2, len(good)) if good[:c].endswith(b"\xff")
    )
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(good[:cut]))],
        "doc_id long, payload binary",
    )
    out = {r.doc_id: r for r in decode_stats_tolerant(df, "jpeg").collect()}
    assert out[1].decode_error is None and out[1].pixel_sum is not None
    assert out[2].pixel_sum is None and out[2].decode_error is not None


def test_jpeg_payload_decode_spark(spark):
    from redskins_rule_spark.operators.multimodal import (
        decode_jpeg_stats,
        with_jpeg_payload,
    )

    df = spark.createDataFrame(
        [(1, "a" * 100), (2, None), (3, "é" * 30)], "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in decode_jpeg_stats(with_jpeg_payload(df, "text")).collect()
    }
    # clen=100: wb=100%4+1=1, hb=100%3+1=2 -> 8x16
    assert (out[1].width, out[1].height) == (8, 16)
    assert out[1].pixel_sum == sum(
        64 * (2 * (((100 + 7 * b) % 64) - 32) + 128) for b in range(2)
    )
    assert out[2].width is None and out[2].pixel_sum is None
    # non-ASCII: CHARACTER length (30), not utf-8 byte length (60)
    assert (out[3].width, out[3].height) == (8 * (30 % 4 + 1), 8 * (30 % 3 + 1))


def test_jpeg_property_random_blocks_roundtrip():
    """Hypothesis: ANY grid of quantized coefficient blocks (any mix
    of DC sign, AC runs, and zero blocks) encodes to a stream the
    decoder reproduces pixel-exactly against the direct IDCT
    reference — entropy layer and transform are inverses everywhere,
    not just on the synthetic payload family."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from redskins_rule_spark.functions.jpeg import (
        QUANT_LUMA,
        ZIGZAG,
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    M = np.array(
        [[(np.sqrt(0.5) if u == 0 else 1.0) / 2.0
          * np.cos((2 * x + 1) * u * np.pi / 16.0)
          for x in range(8)] for u in range(8)]
    )
    qt = np.array(QUANT_LUMA, dtype=float).reshape(8, 8)

    sparse_block = st.lists(
        st.tuples(st.integers(0, 63), st.integers(-255, 255)),
        min_size=0, max_size=10,
    )

    @settings(max_examples=40, deadline=None)
    @given(st.lists(sparse_block, min_size=1, max_size=6))
    def run(specs):
        blocks = []
        for spec in specs:
            blk = [0] * 64
            for k, v in spec:
                blk[k] = v
            blocks.append(blk)
        wb = len(blocks)
        data = encode_jpeg_gray(blocks, wb, 1)
        w, h, px = decode_jpeg_gray(data)
        assert (w, h) == (8 * wb, 8)
        got = np.frombuffer(px, dtype=np.uint8).reshape(8, 8 * wb)
        for b, blk in enumerate(blocks):
            coeff = np.zeros(64)
            for i in range(64):
                coeff[ZIGZAG[i]] = blk[i]
            ref = np.clip(
                np.floor(M.T @ (coeff.reshape(8, 8) * qt) @ M + 0.5) + 128,
                0, 255,
            )
            assert (got[:, b * 8:(b + 1) * 8] == ref).all()

    run()


def test_decode_stats_tolerant_quarantines_corrupt_payloads(spark):
    """One corrupt payload among good ones: strict decode would kill
    the job; tolerant decode yields NULL stats + the error message
    for THAT row only, for both codecs. NULL payloads stay NULL with
    no error."""
    from redskins_rule_spark.functions.jpeg import (
        encode_jpeg_gray,
        synth_dc_blocks,
    )
    from redskins_rule_spark.functions.png import encode_png, synth_pixels
    from redskins_rule_spark.operators.multimodal import (
        decode_stats_tolerant,
    )

    good_png = encode_png(synth_pixels(20, 4, 3), 4, 3)
    good_jpg = encode_jpeg_gray(synth_dc_blocks(20, 2, 1), 2, 1)
    for codec, good in (("png", good_png), ("jpeg", good_jpg)):
        df = spark.createDataFrame(
            [(1, bytearray(good)), (2, bytearray(good[:10])), (3, None)],
            "doc_id long, payload binary",
        )
        out = {
            r.doc_id: r
            for r in decode_stats_tolerant(df, codec).collect()
        }
        assert out[1].decode_error is None and out[1].pixel_sum is not None
        assert out[2].pixel_sum is None and out[2].decode_error, codec
        assert out[3].pixel_sum is None and out[3].decode_error is None


def test_jpeg_color_dc_only_roundtrip_exact():
    """4:2:0 color profile: DC-only payload decodes to EXACTLY the
    closed-form RGB the SQL oracle recomputes — Y = 2*dc + 128,
    chroma = 17*(dc/8) + 128 (synth DCs are multiples of 8 so the
    q0=17 chroma scale stays integer), then the JFIF matrix with
    floor(x+0.5) + clamp."""
    import numpy as np

    from redskins_rule_spark.functions.jpeg import (
        decode_jpeg_color,
        encode_jpeg_color,
        synth_dc_blocks_color,
    )

    clen, wm, hm = 23, 2, 3
    yb, cbb, crb = synth_dc_blocks_color(clen, wm, hm)
    w, h, rgb = decode_jpeg_color(encode_jpeg_color(yb, cbb, crb, wm, hm))
    assert (w, h) == (16 * wm, 16 * hm)
    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
    for m in range(wm * hm):
        my, mx = divmod(m, wm)
        cb = 17 * ((clen + 7 * m) % 5 - 2)
        cr = 17 * ((clen + 3 * m) % 5 - 2)
        for s in range(4):
            by, bx = divmod(s, 2)
            y = 2 * (((clen + 7 * (4 * m + s)) % 64) - 32) + 128
            exp = [
                min(255, max(0, int(np.floor(y + 1.402 * cr + 0.5)))),
                min(255, max(0, int(np.floor(
                    y - 0.344136 * cb - 0.714136 * cr + 0.5)))),
                min(255, max(0, int(np.floor(y + 1.772 * cb + 0.5)))),
            ]
            py, px = (my * 2 + by) * 8, (mx * 2 + bx) * 8
            blk = arr[py: py + 8, px: px + 8]
            for c in range(3):
                assert (blk[:, :, c] == exp[c]).all(), (m, s, c)


def test_jpeg_color_synth_chroma_dcs_vary_across_mcus():
    """ADVICE r6: both chroma DC sequences must VARY across the MCUs
    of one image. The original Cb term used multiplier 5 ≡ 0 (mod 5),
    so Cb was constant per image, every cross-MCU Cb DC-prediction
    diff was 0, and the chroma DC Huffman path went unexercised by
    the differential payload. Multipliers are now coprime to the
    modulus (Cb: 7, Cr: 3)."""
    from redskins_rule_spark.functions.jpeg import synth_dc_blocks_color

    for clen in (0, 9, 23, 100):
        _, cbb, crb = synth_dc_blocks_color(clen, 3, 2)
        assert len({b[0] for b in cbb}) > 1, clen
        assert len({b[0] for b in crb}) > 1, clen


def test_jpeg_color_ac_blocks_match_reference():
    """Color blocks WITH AC energy (all three components) decode to
    the same RGB as an independent reference built in plane space:
    dezigzag -> dequant -> float IDCT per block placed by LUMA/CHROMA
    GRID position (not by MCU walk — so the interleave order is
    validated too), 2x2 repeat upsample, JFIF convert."""
    import numpy as np

    from redskins_rule_spark.functions.jpeg import (
        QUANT_CHROMA,
        QUANT_LUMA,
        ZIGZAG,
        decode_jpeg_color,
        encode_jpeg_color,
    )

    M = np.array(
        [[(np.sqrt(0.5) if u == 0 else 1.0) / 2.0
          * np.cos((2 * x + 1) * u * np.pi / 16.0)
          for x in range(8)] for u in range(8)]
    )

    def idct_plane(blocks, grid_w, grid_h, qt):
        qv = np.array(qt, dtype=float).reshape(8, 8)
        plane = np.empty((8 * grid_h, 8 * grid_w))
        for b, blk in enumerate(blocks):
            coeff = np.zeros(64)
            for i in range(64):
                coeff[ZIGZAG[i]] = blk[i]
            px = np.clip(
                np.floor(M.T @ (coeff.reshape(8, 8) * qv) @ M + 0.5) + 128,
                0, 255,
            )
            gy, gx = divmod(b, grid_w)
            plane[gy * 8:(gy + 1) * 8, gx * 8:(gx + 1) * 8] = px
        return plane

    for seed in (3, 11, 29):
        rng = np.random.RandomState(seed)
        wm, hm = int(rng.randint(1, 4)), int(rng.randint(1, 3))

        def rand_blocks(n, dc_lo=-30, dc_hi=30):
            out = []
            for _ in range(n):
                blk = [0] * 64
                blk[0] = int(rng.randint(dc_lo, dc_hi))
                for k in rng.choice(range(1, 64), size=5, replace=False):
                    blk[int(k)] = int(rng.randint(-20, 20))
                out.append(blk)
            return out

        yb = rand_blocks(4 * wm * hm)
        cbb = rand_blocks(wm * hm, -10, 10)
        crb = rand_blocks(wm * hm, -10, 10)
        w, h, rgb = decode_jpeg_color(
            encode_jpeg_color(yb, cbb, crb, wm, hm)
        )
        got = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)

        yp = idct_plane(yb, 2 * wm, 2 * hm, QUANT_LUMA)
        cbp = idct_plane(cbb, wm, hm, QUANT_CHROMA)
        crp = idct_plane(crb, wm, hm, QUANT_CHROMA)
        cbu = np.repeat(np.repeat(cbp, 2, axis=0), 2, axis=1) - 128.0
        cru = np.repeat(np.repeat(crp, 2, axis=0), 2, axis=1) - 128.0
        ref = np.stack(
            [
                np.clip(np.floor((yp + 1.402 * cru) + 0.5), 0, 255),
                np.clip(np.floor(
                    (yp - 0.344136 * cbu - 0.714136 * cru) + 0.5), 0, 255),
                np.clip(np.floor((yp + 1.772 * cbu) + 0.5), 0, 255),
            ],
            axis=-1,
        ).astype(np.uint8)
        assert (got == ref).all(), seed


def test_jpeg_color_rejects_out_of_profile_and_truncation():
    """Color profile inherits the hardened corruption contract: every
    prefix raises ValueError (never IndexError/struct.error), the
    gray decoder rejects a color payload and vice versa, and non-
    4:2:0 sampling is out of profile."""
    import pytest as _pytest

    from redskins_rule_spark.functions.jpeg import (
        decode_jpeg_color,
        decode_jpeg_gray,
        encode_jpeg_color,
        encode_jpeg_gray,
        synth_dc_blocks,
        synth_dc_blocks_color,
    )

    yb, cbb, crb = synth_dc_blocks_color(9, 1, 1)
    color = encode_jpeg_color(yb, cbb, crb, 1, 1)
    gray = encode_jpeg_gray(synth_dc_blocks(9, 2, 2), 2, 2)

    for cut in range(2, len(color)):
        with _pytest.raises(ValueError):
            decode_jpeg_color(color[:cut])
    with _pytest.raises(ValueError):
        decode_jpeg_gray(color)  # 3 components out of gray profile
    with _pytest.raises(ValueError):
        decode_jpeg_color(gray)  # 1 component out of color profile
    # 4:4:4 (luma 1x1) header is parsed but out of the 4:2:0 profile
    bad = bytearray(color)
    sof = bad.find(b"\xff\xc0")
    assert bad[sof + 11] == 0x22  # Y sampling byte in our layout
    bad[sof + 11] = 0x11
    with _pytest.raises(ValueError):
        decode_jpeg_color(bytes(bad))


def test_jpeg_color_payload_decode_spark(spark):
    from pyspark.sql import functions as F

    from redskins_rule_spark.operators.multimodal import (
        decode_jpeg_color_stats,
        with_jpeg_color_payload,
    )

    df = spark.createDataFrame(
        [(1, "a" * 100), (2, None), (3, "x" * 31)],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in decode_jpeg_color_stats(
            with_jpeg_color_payload(df, "text")
        ).collect()
    }
    assert out[2].width is None and out[2].r_sum is None
    import numpy as np

    for doc_id, clen in ((1, 100), (3, 31)):
        wm, hm = clen % 3 + 1, clen % 2 + 1
        assert (out[doc_id].width, out[doc_id].height) == (16 * wm, 16 * hm)
        r_sum = g_sum = b_sum = 0
        for m in range(wm * hm):
            cb = 17 * ((clen + 7 * m) % 5 - 2)
            cr = 17 * ((clen + 3 * m) % 5 - 2)
            for s in range(4):
                y = 2 * (((clen + 7 * (4 * m + s)) % 64) - 32) + 128
                r_sum += 64 * min(255, max(0, int(
                    np.floor(y + 1.402 * cr + 0.5))))
                g_sum += 64 * min(255, max(0, int(np.floor(
                    y - 0.344136 * cb - 0.714136 * cr + 0.5))))
                b_sum += 64 * min(255, max(0, int(
                    np.floor(y + 1.772 * cb + 0.5))))
        assert (out[doc_id].r_sum, out[doc_id].g_sum, out[doc_id].b_sum) \
            == (r_sum, g_sum, b_sum), doc_id


def test_jpeg_byte_flip_fuzz_raises_only_valueerror():
    """The quarantine contract q182 depends on, fuzzed: ANY single-
    byte corruption of a valid gray or color payload must either
    still decode (harmless flip in entropy padding etc.) or raise
    ValueError — never IndexError/struct.error/anything else, which
    would escape decode_stats_tolerant's net and kill a distributed
    decode job. Deterministic LCG positions/values, both profiles."""
    from redskins_rule_spark.functions.jpeg import (
        decode_jpeg_color,
        decode_jpeg_gray,
        encode_jpeg_color,
        encode_jpeg_gray,
        synth_dc_blocks,
        synth_dc_blocks_color,
    )

    gray = encode_jpeg_gray(synth_dc_blocks(17, 3, 2), 3, 2)
    yb, cbb, crb = synth_dc_blocks_color(17, 2, 2)
    color = encode_jpeg_color(yb, cbb, crb, 2, 2)

    state = 12345
    for payload, decode in ((gray, decode_jpeg_gray),
                            (color, decode_jpeg_color)):
        for _ in range(400):
            state = (state * 1103515245 + 12345) % (1 << 31)
            pos = state % len(payload)
            state = (state * 1103515245 + 12345) % (1 << 31)
            val = state % 256
            bad = bytearray(payload)
            if bad[pos] == val:
                val = (val + 1) % 256
            bad[pos] = val
            try:
                decode(bytes(bad))
            except ValueError:
                pass  # the quarantine contract
            # any other exception type propagates and fails the test


# -- progressive (SOF2) JPEG -------------------------------------------------


def test_jpeg_progressive_equals_baseline_on_same_blocks():
    """The coefficient domain is shared, so a complete progressive
    scan script must reconstruct BIT-IDENTICAL pixels to the baseline
    profile on the same quantized blocks — AC energy, negative
    coefficients, and long zero runs included. Exercises DC
    first/refine, AC band first passes, and AC refinement with
    interleaved correction bits."""
    import random

    from redskins_rule_spark.functions.jpeg import (
        decode_jpeg_gray,
        decode_jpeg_progressive,
        encode_jpeg_gray,
        encode_jpeg_gray_progressive,
    )

    rng = random.Random(7)
    for trial in range(12):
        wb, hb = rng.randint(1, 4), rng.randint(1, 4)
        blocks = []
        for _ in range(wb * hb):
            blk = [0] * 64
            blk[0] = rng.randint(-60, 60)
            for k in range(1, 64):
                if rng.random() < rng.choice([0.05, 0.3, 0.7]):
                    blk[k] = rng.randint(-200, 200)
            blocks.append(blk)
        base = decode_jpeg_gray(encode_jpeg_gray(blocks, wb, hb))
        prog = decode_jpeg_progressive(
            encode_jpeg_gray_progressive(blocks, wb, hb)
        )
        assert base == prog, trial


def test_jpeg_progressive_custom_scripts():
    """Alternative scan scripts — spectral selection only, a deep DC
    approximation chain, split AC bands with per-band refinement —
    all reconstruct the baseline decode; invalid scripts (band
    re-sent, skipped approximation step, AC before DC, multi-step Al)
    raise ValueError."""
    import random

    import pytest as _pytest

    from redskins_rule_spark.functions.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
        encode_jpeg_gray_progressive,
        decode_jpeg_progressive,
    )

    rng = random.Random(11)
    blocks = []
    for _ in range(9):
        blk = [0] * 64
        blk[0] = rng.randint(-60, 60)
        for k in range(1, 64):
            if rng.random() < 0.4:
                blk[k] = rng.randint(-100, 100)
        blocks.append(blk)
    base = decode_jpeg_gray(encode_jpeg_gray(blocks, 3, 3))
    good_scripts = [
        [(0, 0, 0, 0), (1, 63, 0, 0)],
        [(0, 0, 0, 3), (0, 0, 3, 2), (0, 0, 2, 1), (0, 0, 1, 0),
         (1, 63, 0, 0)],
        [(0, 0, 0, 1), (1, 20, 0, 1), (21, 63, 0, 1), (0, 0, 1, 0),
         (1, 20, 1, 0), (21, 63, 1, 0)],
    ]
    for sc in good_scripts:
        got = decode_jpeg_progressive(
            encode_jpeg_gray_progressive(blocks, 3, 3, scans=sc)
        )
        assert got == base, sc

    bad_scripts = [
        [(1, 63, 0, 0)],                            # AC before DC
        [(0, 0, 0, 0), (1, 63, 0, 0), (1, 5, 0, 0)],  # band re-sent
        [(0, 0, 0, 2), (0, 0, 1, 0), (1, 63, 0, 0)],  # chain mismatch
        [(0, 0, 0, 2), (0, 0, 2, 0), (1, 63, 0, 0)],  # Al step of 2
        [(0, 5, 0, 0), (1, 63, 0, 0)],              # DC scan with Se>0
    ]
    for sc in bad_scripts:
        with _pytest.raises(ValueError):
            encode_jpeg_gray_progressive(blocks, 3, 3, scans=sc)


def test_jpeg_progressive_profile_gates():
    """Profile routing raises, never mis-decodes: the baseline decoder
    rejects SOF2 payloads, the progressive decoder rejects SOF0."""
    import pytest as _pytest

    from redskins_rule_spark.functions.jpeg import (
        decode_jpeg_gray,
        decode_jpeg_progressive,
        encode_jpeg_gray,
        encode_jpeg_gray_progressive,
        synth_dc_blocks,
    )

    blocks = synth_dc_blocks(10, 2, 1)
    prog = encode_jpeg_gray_progressive(blocks, 2, 1)
    base = encode_jpeg_gray(blocks, 2, 1)
    with _pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg_gray(prog)
    with _pytest.raises(ValueError, match="not a progressive"):
        decode_jpeg_progressive(base)


def test_jpeg_progressive_every_truncation_raises_valueerror():
    """The corruption contract extends to the progressive profile:
    EVERY prefix of a valid multi-scan payload raises ValueError —
    mid-segment, mid-scan-header, and mid-entropy truncations of all
    four scans included."""
    import pytest as _pytest

    from redskins_rule_spark.functions.jpeg import (
        decode_jpeg_progressive,
        encode_jpeg_gray_progressive,
        synth_dc_blocks,
    )

    good = encode_jpeg_gray_progressive(synth_dc_blocks(10, 2, 2), 2, 2)
    for cut in range(2, len(good)):
        with _pytest.raises(ValueError):
            decode_jpeg_progressive(good[:cut])


def _ac_color_blocks(wm: int, hm: int, seed: int):
    def mk(n, s0):
        out = []
        for b in range(n):
            blk = [0] * 64
            blk[0] = (s0 + 11 * b) % 50 - 25
            for k in range(1, 64, 5):
                blk[k] = ((b + 2) * k * s0) % 23 - 11
            out.append(blk)
        return out

    return mk(4 * wm * hm, seed), mk(wm * hm, seed + 2), mk(wm * hm, seed + 4)


def test_jpeg_restart_intervals_roundtrip_and_gates():
    """DRI/RSTn support for the baseline profiles — the real-world
    JPEG feature (most camera/encoder output uses restart markers):
    any interval decodes to the identical pixels as the unrestarted
    stream (DC prediction reset at every marker, RSTn modulo-8
    cycling past 8 restarts), and the marker contract is CHECKED —
    a wrong-sequence RSTn, a missing marker, and a stray RSTn in a
    DRI=0 stream all raise ValueError."""
    import pytest as _pytest

    from redskins_rule_spark.functions.jpeg import (
        decode_jpeg_color,
        decode_jpeg_gray,
        encode_jpeg_color,
        encode_jpeg_gray,
        synth_dc_blocks_color,
    )

    blocks = []
    for b in range(12):
        blk = [0] * 64
        blk[0] = (9 + 11 * b) % 50 - 25
        for k in range(1, 64, 3):
            blk[k] = ((b + 1) * k * 7) % 31 - 15
        blocks.append(blk)
    base = decode_jpeg_gray(encode_jpeg_gray(blocks, 4, 3))
    for ri in (1, 2, 3, 5, 12, 100):
        got = decode_jpeg_gray(
            encode_jpeg_gray(blocks, 4, 3, restart_interval=ri)
        )
        assert got == base, ri
    y, cb, cr = synth_dc_blocks_color(21, 3, 2)
    cbase = decode_jpeg_color(encode_jpeg_color(y, cb, cr, 3, 2))
    for ri in (1, 2, 4):
        got = decode_jpeg_color(
            encode_jpeg_color(y, cb, cr, 3, 2, restart_interval=ri)
        )
        assert got == cbase, ri

    # marker-sequence contract: swap the first two RST markers
    payload = bytearray(encode_jpeg_gray(blocks, 4, 3, restart_interval=2))
    p0 = payload.index(b"\xff\xd0")
    p1 = payload.index(b"\xff\xd1")
    payload[p0 + 1], payload[p1 + 1] = payload[p1 + 1], payload[p0 + 1]
    with _pytest.raises(ValueError, match="expected RST"):
        decode_jpeg_gray(bytes(payload))
    # stray RSTn with DRI=0 still raises (the pre-existing contract)
    plain = bytearray(encode_jpeg_gray(blocks, 4, 3))
    sos_end = plain.index(b"\xff\xda")
    plain[sos_end + 20] = 0xFF
    plain[sos_end + 21] = 0xD3
    with _pytest.raises(ValueError):
        decode_jpeg_gray(bytes(plain))
    # truncation contract extends to DRI payloads
    good = encode_jpeg_gray(blocks, 4, 3, restart_interval=3)
    for cut in range(2, len(good)):
        with _pytest.raises(ValueError):
            decode_jpeg_gray(good[:cut])


def test_jpeg_progressive_color_equals_baseline_color():
    """VERDICT r7 item 2: a complete progressive-color scan script
    reconstructs bit-identical RGB to the baseline color profile on
    the same quantized blocks — DC-only synth payloads AND blocks
    with real AC energy (the interleaved-DC + per-component-AC walk
    exercised end to end, refinements included)."""
    from redskins_rule_spark.functions.jpeg import (
        decode_jpeg_color,
        decode_jpeg_progressive_color,
        encode_jpeg_color,
        encode_jpeg_color_progressive,
        synth_dc_blocks_color,
    )

    for clen, wm, hm in [(10, 1, 1), (25, 2, 1), (33, 3, 2), (7, 2, 3)]:
        y, cb, cr = synth_dc_blocks_color(clen, wm, hm)
        base = decode_jpeg_color(encode_jpeg_color(y, cb, cr, wm, hm))
        prog = decode_jpeg_progressive_color(
            encode_jpeg_color_progressive(y, cb, cr, wm, hm)
        )
        assert prog == base, (clen, wm, hm)
    y, cb, cr = _ac_color_blocks(2, 2, 7)
    base = decode_jpeg_color(encode_jpeg_color(y, cb, cr, 2, 2))
    prog = decode_jpeg_progressive_color(
        encode_jpeg_color_progressive(y, cb, cr, 2, 2)
    )
    assert prog == base


def test_jpeg_progressive_color_script_and_profile_gates():
    """Scan-script validation for the color profile (interleave rules
    are the new surface: only DC scans may interleave, and DC scans
    here must interleave all three components) plus profile routing —
    the color progressive decoder rejects SOF0 and gray-SOF2
    payloads, and vice versa."""
    import pytest as _pytest

    from redskins_rule_spark.functions.jpeg import (
        decode_jpeg_color,
        decode_jpeg_progressive,
        decode_jpeg_progressive_color,
        encode_jpeg_color,
        encode_jpeg_color_progressive,
        encode_jpeg_gray_progressive,
        synth_dc_blocks,
        synth_dc_blocks_color,
    )

    y, cb, cr = synth_dc_blocks_color(9, 1, 1)
    bad_scripts = [
        [(0, 1, 63, 0, 0)],                          # AC before DC
        [(0, 0, 0, 0, 0), (None, 1, 63, 0, 0)],      # interleaved AC
        [(None, 0, 0, 0, 2), (None, 0, 0, 2, 0),
         (0, 1, 63, 0, 0)],                          # Al step of 2
        [(3, 1, 63, 0, 0)],                          # bad component
    ]
    for sc in bad_scripts:
        with _pytest.raises(ValueError):
            encode_jpeg_color_progressive(y, cb, cr, 1, 1, scans=sc)
    prog_color = encode_jpeg_color_progressive(y, cb, cr, 1, 1)
    prog_gray = encode_jpeg_gray_progressive(synth_dc_blocks(9, 2, 1), 2, 1)
    base_color = encode_jpeg_color(y, cb, cr, 1, 1)
    with _pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg_color(prog_color)
    with _pytest.raises(ValueError, match="not a progressive"):
        decode_jpeg_progressive_color(base_color)
    with _pytest.raises(ValueError, match="3 components"):
        decode_jpeg_progressive_color(prog_gray)
    with _pytest.raises(ValueError, match="1 component"):
        decode_jpeg_progressive(prog_color)


def test_jpeg_progressive_color_every_truncation_raises_valueerror():
    """The corruption contract extends to the progressive color
    profile: EVERY prefix of a valid multi-scan payload raises
    ValueError."""
    import pytest as _pytest

    from redskins_rule_spark.functions.jpeg import (
        decode_jpeg_progressive_color,
        encode_jpeg_color_progressive,
        synth_dc_blocks_color,
    )

    y, cb, cr = synth_dc_blocks_color(11, 2, 1)
    good = encode_jpeg_color_progressive(y, cb, cr, 2, 1)
    for cut in range(2, len(good)):
        with _pytest.raises(ValueError):
            decode_jpeg_progressive_color(good[:cut])


def test_jpeg_progressive_color_byte_flip_fuzz_raises_only_valueerror():
    """Any single-byte corruption of an AC-bearing progressive color
    payload either still decodes or raises ValueError — never
    IndexError/struct.error (the q182 quarantine net)."""
    from redskins_rule_spark.functions.jpeg import (
        decode_jpeg_progressive_color,
        encode_jpeg_color_progressive,
    )

    y, cb, cr = _ac_color_blocks(2, 1, 9)
    payload = encode_jpeg_color_progressive(y, cb, cr, 2, 1)
    state = 98765
    for _ in range(600):
        state = (state * 1103515245 + 12345) % (1 << 31)
        pos = state % len(payload)
        state = (state * 1103515245 + 12345) % (1 << 31)
        val = state % 256
        bad = bytearray(payload)
        if bad[pos] == val:
            val = (val + 1) % 256
        bad[pos] = val
        try:
            decode_jpeg_progressive_color(bytes(bad))
        except ValueError:
            pass  # the quarantine contract


def test_jpeg_progressive_byte_flip_fuzz_raises_only_valueerror():
    """q182's quarantine net must hold for progressive payloads too:
    any single-byte corruption either still decodes or raises
    ValueError — never IndexError/struct.error. Deterministic LCG
    positions/values over an AC-bearing payload (refinement paths in
    the fuzz reach the correction-bit machinery)."""
    from redskins_rule_spark.functions.jpeg import (
        decode_jpeg_progressive,
        encode_jpeg_gray_progressive,
    )

    blocks = []
    for b in range(6):
        blk = [0] * 64
        blk[0] = (11 * b) % 50 - 25
        for k in range(1, 64, 3):
            blk[k] = ((b + 1) * k * 7) % 31 - 15
        blocks.append(blk)
    payload = encode_jpeg_gray_progressive(blocks, 3, 2)

    state = 54321
    for _ in range(600):
        state = (state * 1103515245 + 12345) % (1 << 31)
        pos = state % len(payload)
        state = (state * 1103515245 + 12345) % (1 << 31)
        val = state % 256
        bad = bytearray(payload)
        if bad[pos] == val:
            val = (val + 1) % 256
        bad[pos] = val
        try:
            decode_jpeg_progressive(bytes(bad))
        except ValueError:
            pass  # the quarantine contract
        # any other exception type propagates and fails the test


def test_jpeg_progressive_payload_roundtrip_spark(spark):
    """The q186 faces end to end on a small frame: payloads are real
    SOF2 files, stats equal the closed form, NULL text yields NULL
    stats."""
    from pyspark.sql import functions as F

    from redskins_rule_spark.operators.multimodal import (
        decode_jpeg_progressive_stats,
        with_jpeg_progressive_payload,
    )

    df = spark.createDataFrame(
        [(1, "hello"), (2, "a much longer piece of text!"), (3, None)],
        "doc_id long, text string",
    )
    out = decode_jpeg_progressive_stats(
        with_jpeg_progressive_payload(df, "text", "doc_id"),
        "payload", "doc_id",
    ).orderBy("doc_id").collect()
    for row in out[:2]:
        clen = len("hello") if row.doc_id == 1 else 28
        wb, hb = clen % 5 + 1, clen % 2 + 1
        assert (row.width, row.height) == (8 * wb, 8 * hb)
        expect = sum(
            64 * (2 * (((clen + 9 * b) % 64) - 32) + 128)
            for b in range(wb * hb)
        )
        assert row.pixel_sum == expect
    assert out[2].width is None and out[2].pixel_sum is None


# --- MP4 (ISO BMFF) container codec ---------------------------------------


def test_mp4_roundtrip_and_size_ledger():
    """encode→parse round-trips every field, and the container byte
    length lands exactly on the closed-form box-size ledger the q187
    oracle recomputes (525 + 4·n_v + S_v [+ 373 + 4·n_a + S_a])."""
    from redskins_rule_spark.functions.mp4 import (
        extract_samples,
        parse_mp4,
        synth_mp4,
    )

    for clen in (0, 1, 2, 3, 6, 17, 100, 997):
        data = synth_mp4(clen)
        m = parse_mp4(data)
        nv = clen % 7 + 2
        sv = sum((clen + 3 * i) % 50 + 4 for i in range(nv))
        expected = 525 + 4 * nv + sv
        if clen % 3 == 0:
            na = clen % 11 + 3
            sa = sum((clen + 5 * i) % 17 + 1 for i in range(na))
            expected += 373 + 4 * na + sa
        assert len(data) == expected
        assert m.major_brand == "isom" and m.timescale == 1000
        vt = next(t for t in m.tracks if t.handler == "vide")
        assert vt.n_samples == nv and vt.duration == 40 * nv
        assert vt.time_to_sample == ((nv, 40),)
        # extraction returns the REAL mdat bytes, not table arithmetic
        for fi, s in extract_samples(data, vt):
            assert s == bytes([(clen + 7 * fi) % 251]) * ((clen + 3 * fi) % 50 + 4)


def test_mp4_stsc_run_map_semantics():
    """sample_locations expands multi-run stsc tables per ISO 14496-12
    §8.7: entry i covers chunks [first_i, first_{i+1}) — a table the
    single-chunk encoder never emits, so pin the resolver directly."""
    from redskins_rule_spark.functions.mp4 import Mp4Track, sample_locations

    # 3 chunks: chunk1 holds 2 samples, chunks 2-3 hold 1 each
    t = Mp4Track(
        track_id=1, handler="vide", timescale=1000, duration=160,
        sample_sizes=(5, 6, 7, 8),
        time_to_sample=((4, 40),),
        sample_to_chunk=((1, 2), (2, 1)),
        chunk_offsets=(100, 200, 300),
    )
    assert sample_locations(t) == [(100, 5), (105, 6), (200, 7), (300, 8)]
    # stsc mapping fewer/more samples than stsz declares is corrupt
    import pytest as _pytest

    bad = Mp4Track(
        track_id=1, handler="vide", timescale=1000, duration=120,
        sample_sizes=(5, 6, 7),
        time_to_sample=((3, 40),),
        sample_to_chunk=((1, 1),),
        chunk_offsets=(100,),
    )
    with _pytest.raises(ValueError, match="maps"):
        sample_locations(bad)
    # ADVICE r7: stsc chunk numbers are 1-based — first_chunk=0 must
    # raise, not wrap chunk_offsets[-1] into a silently wrong offset
    zero = Mp4Track(
        track_id=1, handler="vide", timescale=1000, duration=120,
        sample_sizes=(5, 6, 7),
        time_to_sample=((3, 40),),
        sample_to_chunk=((0, 3),),
        chunk_offsets=(100,),
    )
    with _pytest.raises(ValueError, match="below 1"):
        sample_locations(zero)


def test_mp4_largesize_and_size_zero_boxes():
    """The box walker handles the spec's two special size encodings:
    size==1 (64-bit largesize) and size==0 (extends to end)."""
    import struct

    from redskins_rule_spark.functions.mp4 import parse_mp4, synth_mp4

    data = synth_mp4(11)
    # rewrite moov (the last top-level box) as a size==0 box
    off = 0
    boxes = []
    while off < len(data):
        (sz,) = struct.unpack(">I", data[off : off + 4])
        boxes.append((off, sz, data[off + 4 : off + 8]))
        off += sz
    moov_off, moov_sz, fourcc = boxes[-1]
    assert fourcc == b"moov"
    zero = data[:moov_off] + struct.pack(">I", 0) + data[moov_off + 4 :]
    assert parse_mp4(zero).duration == parse_mp4(data).duration
    # rewrite ftyp with a largesize header (size==1 + 64-bit length)
    (ft_sz,) = struct.unpack(">I", data[0:4])
    large = (
        struct.pack(">I4sQ", 1, b"ftyp", ft_sz + 8)
        + data[8:ft_sz]
        + data[ft_sz:]
    )
    assert parse_mp4(large).major_brand == "isom"


def test_mp4_every_truncation_raises_valueerror():
    from redskins_rule_spark.functions.mp4 import parse_mp4, synth_mp4

    full = synth_mp4(23)
    for cut in range(len(full)):
        with pytest.raises(ValueError):
            parse_mp4(full[:cut])


def test_mp4_byte_flip_fuzz_raises_only_valueerror():
    """Shared corrupt-payload contract: any single-byte corruption
    either parses (tables may still be self-consistent) or raises
    ValueError — never IndexError/struct.error/hang — so tolerant
    quarantine decode composes over MP4 unchanged."""
    from redskins_rule_spark.functions.mp4 import (
        extract_samples,
        parse_mp4,
        synth_mp4,
    )

    full = bytearray(synth_mp4(23))
    for pos in range(len(full)):
        for flip in (0x01, 0xFF):
            data = bytes(
                full[:pos] + bytes([full[pos] ^ flip]) + full[pos + 1 :]
            )
            try:
                m = parse_mp4(data)
                for t in m.tracks:
                    extract_samples(data, t)
            except ValueError:
                pass


def test_mp4_payload_decode_spark(spark):
    from redskins_rule_spark.operators.multimodal import (
        decode_mp4_meta,
        sample_mp4_frames,
        with_mp4_payload,
    )

    df = spark.createDataFrame(
        [(1, "a" * 9), (2, "b" * 10), (3, None)], "doc_id long, text string"
    )
    mp4 = with_mp4_payload(df.where("text is not null"), "text", "doc_id")
    meta = {r.doc_id: r for r in decode_mp4_meta(mp4).collect()}
    # clen=9: audio present (9%3==0): nv=9%7+2=4, na=9%11+3=12
    assert meta[1].n_tracks == 2
    assert meta[1].n_video_samples == 4 and meta[1].n_audio_samples == 12
    assert meta[1].duration_ms == max(40 * 4, 23 * 12)
    # clen=10: video only, nv=5
    assert meta[2].n_tracks == 1 and meta[2].n_video_samples == 5
    assert meta[2].duration_ms == 200
    frames = sample_mp4_frames(mp4, stride=2).collect()
    got = {(r.doc_id, r.frame_idx): (r.frame_len, r.frame_sum) for r in frames}
    # doc 1 (clen=9): video frames 0 and 2 survive stride 2
    for clen, doc in ((9, 1), (10, 2)):
        nv = clen % 7 + 2
        for f in range(0, nv, 2):
            ln = (clen + 3 * f) % 50 + 4
            assert got[(doc, f)] == (ln, ln * ((clen + 7 * f) % 251))
    assert all(idx % 2 == 0 for (_, idx) in got)


def test_mp4_audio_track_extraction(spark):
    from redskins_rule_spark.operators.multimodal import (
        sample_mp4_frames,
        with_mp4_payload,
    )

    df = spark.createDataFrame([(1, "x" * 12)], "doc_id long, text string")
    rows = sample_mp4_frames(
        with_mp4_payload(df, "text", "doc_id"), handler="soun", stride=1
    ).collect()
    clen = 12
    assert len(rows) == clen % 11 + 3
    for r in rows:
        ln = (clen + 5 * r.frame_idx) % 17 + 1
        assert (r.frame_len, r.frame_sum) == (
            ln, ln * ((clen + 11 * r.frame_idx) % 251)
        )


# --- MP3 (MPEG-1 Layer III) framing codec ----------------------------------


def test_id3v23_frame_walk_and_gates():
    """The tag-body layer: text frames roundtrip, padding terminates
    the walk, v2.3's PLAIN frame sizes are honored, and every profile
    gate raises by name (v2.4, unsynchronisation, extended header,
    compressed frames, bad frame ids, overruns)."""
    import pytest as _pytest

    from redskins_rule_spark.functions.mp3 import (
        encode_id3v23,
        parse_id3v23_frames,
        parse_mp3,
        synth_mp3_tagged,
    )

    tag = encode_id3v23(
        [("TIT2", "Hello"), ("TALB", "World"), ("TXXX", "x=1")], padding=5
    )
    assert parse_id3v23_frames(tag + b"\xff\xfb") == [
        ("TIT2", "Hello"), ("TALB", "World"), ("TXXX", "x=1")
    ]
    assert parse_id3v23_frames(b"\xff\xfb\x90\x00") == []  # no tag
    # UTF-8 (encoding 3) decodes; UTF-16 (1) surfaces as None
    hand = bytearray(encode_id3v23([("TIT2", "ab")]))
    hand[20] = 3  # encoding byte inside the only frame
    assert parse_id3v23_frames(bytes(hand)) == [("TIT2", "ab")]
    hand[20] = 1
    assert parse_id3v23_frames(bytes(hand)) == [("TIT2", None)]

    v24 = bytearray(tag)
    v24[3] = 4
    with _pytest.raises(ValueError, match="v2.4"):
        parse_id3v23_frames(bytes(v24))
    unsync = bytearray(tag)
    unsync[5] = 0x80
    with _pytest.raises(ValueError, match="unsynchronisation"):
        parse_id3v23_frames(bytes(unsync))
    comp = bytearray(tag)
    comp[19] = 0x80  # first frame's format flags: compressed
    with _pytest.raises(ValueError, match="compressed"):
        parse_id3v23_frames(bytes(comp))
    badid = bytearray(tag)
    badid[10] = 0x20  # frame id byte -> space
    with _pytest.raises(ValueError, match="frame id"):
        parse_id3v23_frames(bytes(badid))
    overrun = bytearray(tag)
    overrun[14:18] = (10 ** 6).to_bytes(4, "big")  # frame size huge
    with _pytest.raises(ValueError, match="overruns"):
        parse_id3v23_frames(bytes(overrun))

    # composed synth: tag decodes AND the audio framing still walks
    data = synth_mp3_tagged(23)
    assert dict(parse_id3v23_frames(data))["TIT2"] == "t23"
    assert parse_mp3(data).n_frames == 23 % 5 + 2
    state = 31415
    for _ in range(400):
        state = (state * 1103515245 + 12345) % (1 << 31)
        pos = state % len(data)
        state = (state * 1103515245 + 12345) % (1 << 31)
        val = state % 256
        bad = bytearray(data)
        if bad[pos] == val:
            val = (val + 1) % 256
        bad[pos] = val
        try:
            parse_id3v23_frames(bytes(bad))
        except ValueError:
            pass  # the shared quarantine contract (never Unicode/Index)


def test_adts_roundtrip_truncation_and_gates():
    """The ADTS/AAC framing layer: header fields roundtrip exactly
    (CRC-present 9-byte headers included), frame-boundary truncation
    is a valid shorter stream and every other cut raises, profile
    gates raise by name, and a byte-flip fuzz raises only
    ValueError."""
    import pytest as _pytest

    from redskins_rule_spark.functions.aac import (
        SAMPLE_RATES_AAC,
        encode_adts,
        parse_adts,
        synth_adts,
    )

    for clen in (0, 7, 10, 23, 41):  # 10 exercises the CRC class
        m = parse_adts(synth_adts(clen))
        n = clen % 9 + 2
        assert m.n_frames == n
        f0 = m.frames[0]
        assert (f0.profile, f0.sr_idx, f0.channels) == (
            clen % 4, clen % 13, clen % 7 + 1
        )
        assert f0.crc_present == (clen % 5 == 0)
        hdr = 9 if f0.crc_present else 7
        for i, f in enumerate(m.frames):
            assert len(f.payload) == (clen + 5 * i) % 37 + 1
            assert f.frame_length == hdr + len(f.payload)
        assert m.duration_ms == n * 1024 * 1000 // SAMPLE_RATES_AAC[clen % 13]

    data = synth_adts(13)
    full = parse_adts(data)
    bounds, off = set(), 0
    for f in full.frames:
        off += f.frame_length
        bounds.add(off)
    for cut in range(1, len(data)):
        if cut in bounds:
            assert parse_adts(data[:cut]).n_frames < full.n_frames
        else:
            with _pytest.raises(ValueError):
                parse_adts(data[:cut])

    # profile gates by name
    with _pytest.raises(ValueError, match="reserved sampling"):
        encode_adts([(1, 13, 2, b"x")])
    with _pytest.raises(ValueError, match="mixed sampling"):
        encode_adts([(1, 3, 2, b"x"), (1, 4, 2, b"x")])
    mpeg2 = bytearray(synth_adts(7))
    mpeg2[1] |= 0x08  # ID=1 (MPEG-2)
    with _pytest.raises(ValueError, match="MPEG-2"):
        parse_adts(bytes(mpeg2))
    ch0 = bytearray(synth_adts(7))
    ch0[2] &= 0xFE
    ch0[3] &= 0x3F  # channel_configuration -> 0
    with _pytest.raises(ValueError, match="channel_configuration 0"):
        parse_adts(bytes(ch0))

    state = 86420
    payload = synth_adts(29)
    for _ in range(500):
        state = (state * 1103515245 + 12345) % (1 << 31)
        pos = state % len(payload)
        state = (state * 1103515245 + 12345) % (1 << 31)
        val = state % 256
        bad = bytearray(payload)
        if bad[pos] == val:
            val = (val + 1) % 256
        bad[pos] = val
        try:
            parse_adts(bytes(bad))
        except ValueError:
            pass  # the quarantine contract


def test_sniff_routes_adts_vs_mp3():
    """The two 0xFFF-sync families never collide: ADTS sets layer
    bits 00, MP3 Layer III sets 01 — and the front door decodes both
    to their own metadata."""
    from redskins_rule_spark.functions.aac import synth_adts
    from redskins_rule_spark.functions.mp3 import synth_mp3
    from redskins_rule_spark.operators.multimodal import sniff_format

    for clen in range(0, 30, 3):
        assert sniff_format(synth_adts(clen)) == "aac", clen
        assert sniff_format(synth_mp3(clen)) == "mp3", clen


def test_esds_audio_config_roundtrip_and_gates():
    """The out-of-band AAC config layer: AudioSpecificConfig bits and
    the esds descriptor chain roundtrip exactly, every truncation of
    the chain raises, profile gates raise by name, and the composed
    MP4 path (stsd → esds → config + sample slices) holds the
    corruption contract."""
    import pytest as _pytest

    from redskins_rule_spark.functions.aac import (
        SAMPLE_RATES_AAC,
        encode_audio_specific_config,
        encode_esds,
        parse_esds,
    )
    from redskins_rule_spark.functions.mp4 import (
        extract_samples,
        parse_mp4,
        synth_mp4_aac,
    )

    for aot, sr, ch in ((1, 0, 1), (2, 4, 2), (3, 12, 7), (4, 7, 5)):
        cfg = parse_esds(encode_esds(encode_audio_specific_config(aot, sr, ch)))
        assert (cfg.audio_object_type, cfg.sr_idx, cfg.channels) == (aot, sr, ch)
        assert cfg.sample_rate == SAMPLE_RATES_AAC[sr]
    body = encode_esds(encode_audio_specific_config(2, 4, 2))
    for cut in range(len(body)):
        with _pytest.raises(ValueError):
            parse_esds(body[:cut])
    with _pytest.raises(ValueError, match="GA profile"):
        encode_audio_specific_config(5, 4, 2)
    # wrong OTI: patch DecoderConfigDescriptor's objectTypeIndication
    bad = bytearray(body)
    oti_pos = bad.index(0x40, 4)
    bad[oti_pos] = 0x21  # H.264 OTI in an audio chain
    with _pytest.raises(ValueError, match="not MPEG-4 Audio"):
        parse_esds(bytes(bad))

    def full_decode(data: bytes):
        meta = parse_mp4(data)
        track = next(t for t in meta.tracks if t.esds is not None)
        cfg = parse_esds(track.esds)
        return cfg, [s for _i, s in extract_samples(data, track)]

    good = synth_mp4_aac(23)
    cfg, samples = full_decode(good)
    assert cfg.audio_object_type == 23 % 3 + 1 and len(samples) == 23 % 8 + 2
    for cut in range(len(good)):
        with _pytest.raises((ValueError, StopIteration)):
            full_decode(good[:cut])
    state = 11223
    for _ in range(400):
        state = (state * 1103515245 + 12345) % (1 << 31)
        pos = state % len(good)
        state = (state * 1103515245 + 12345) % (1 << 31)
        val = state % 256
        bad2 = bytearray(good)
        if bad2[pos] == val:
            val = (val + 1) % 256
        bad2[pos] = val
        try:
            full_decode(bytes(bad2))
        except (ValueError, StopIteration):
            pass  # quarantine contract


def test_avc_nal_sps_roundtrip_and_gates():
    """The H.264 structure layer: Annex B framing + emulation
    prevention roundtrip byte-exactly, SPS geometry decodes from
    Exp-Golomb (cropping arithmetic included), and every profile
    gate raises naming its boundary."""
    import pytest as _pytest

    from redskins_rule_spark.functions.avc import (
        _EgBits,
        _EgBitsOut,
        encode_nal_stream,
        encode_pps,
        encode_sps,
        escape_rbsp,
        parse_nal_stream,
        parse_pps_head,
        parse_sps,
        unescape_rbsp,
    )

    # Exp-Golomb self-inverse across the signed/unsigned maps
    w = _EgBitsOut()
    for v in (0, 1, 2, 7, 31, 255):
        w.ue(v)
    for v in (0, 1, -1, 5, -17):
        w.se(v)
    r = _EgBits(w.rbsp_trailing())
    assert [r.ue() for _ in range(6)] == [0, 1, 2, 7, 31, 255]
    assert [r.se() for _ in range(5)] == [0, 1, -1, 5, -17]

    # emulation prevention: every 00 00 0x pattern escapes and returns
    rbsp = b"\x10\x00\x00\x01\x00\x00\x00\x02\x00\x00\x03\x99\x00\x00"
    esc = escape_rbsp(rbsp)
    assert b"\x00\x00\x01" not in esc
    assert unescape_rbsp(esc) == rbsp
    with _pytest.raises(ValueError, match="emulation"):
        unescape_rbsp(b"\x00\x00\x01")  # unescaped start code inside

    sps = encode_sps(66, 30, 0, 3, 2, 0, 2, 0, 4, 2, 1)
    pps = encode_pps(0, 0, 1)
    stream = encode_nal_stream([(3, 7, sps), (3, 8, pps), (2, 1, b"\x9e\x42")])
    nals = parse_nal_stream(stream)
    assert [n.nal_type for n in nals] == [7, 8, 1]
    assert [n.ref_idc for n in nals] == [3, 3, 2]
    meta = parse_sps(nals[0].rbsp)
    assert (meta.width, meta.height) == (80, 48)
    assert (meta.profile_idc, meta.level_idc) == (66, 30)
    assert parse_pps_head(nals[1].rbsp).entropy_coding_mode == 1
    # full §7.3.2.2 parse: every field the encoder writes decodes
    from redskins_rule_spark.functions.avc import parse_pps

    full_pps = parse_pps(nals[1].rbsp)
    assert (full_pps.pic_init_qp, full_pps.deblocking_control,
            full_pps.weighted_pred) == (26, 1, 0)

    # 4:2:0 cropping arithmetic: hand-built SPS with cropping flag
    wo = _EgBitsOut()
    wo.u(66, 8); wo.u(0, 8); wo.u(30, 8)
    wo.ue(0); wo.ue(0); wo.ue(2)     # ids, frame_num, poc type 2
    wo.ue(1); wo.u(0, 1)             # refs, gaps
    wo.ue(4); wo.ue(2)               # 5x3 macroblocks
    wo.u(1, 1); wo.u(1, 1)           # frame_mbs_only, direct_8x8
    wo.u(1, 1)                       # frame_cropping_flag
    wo.ue(1); wo.ue(2); wo.ue(0); wo.ue(3)  # l/r/t/b crops
    wo.u(0, 1)                       # vui
    cropped = parse_sps(wo.rbsp_trailing())
    assert cropped.width == 5 * 16 - 2 * (1 + 2)
    assert cropped.height == 3 * 16 - 2 * (0 + 3)

    # profile gates raise by name
    with _pytest.raises(ValueError, match="high-profile"):
        parse_sps(bytes([100]) + encode_sps(66, 30, 0, 0, 2, 0, 0, 0, 0, 0, 0)[1:])
    inter = _EgBitsOut()
    inter.u(66, 8); inter.u(0, 8); inter.u(30, 8)
    inter.ue(0); inter.ue(0); inter.ue(2); inter.ue(0); inter.u(0, 1)
    inter.ue(0); inter.ue(0); inter.u(0, 1)  # frame_mbs_only = 0
    with _pytest.raises(ValueError, match="interlaced"):
        parse_sps(inter.rbsp_trailing())
    with _pytest.raises(ValueError, match="forbidden"):
        parse_nal_stream(b"\x00\x00\x01\xe7\x42")
    with _pytest.raises(ValueError, match="start code"):
        parse_nal_stream(b"\x42\x00\x00\x01\x67")


def test_avc_in_mp4_truncation_and_flip_fuzz():
    """Corruption contract for the composed path (container → sample
    slices → NAL parse → SPS): every payload truncation raises
    ValueError, and single-byte flips raise only ValueError."""
    import pytest as _pytest

    from redskins_rule_spark.functions.avc import (
        parse_nal_stream,
        parse_pps_head,
        parse_sps,
    )
    from redskins_rule_spark.functions.mp4 import (
        extract_samples,
        parse_mp4,
        synth_mp4_avc,
    )

    def full_decode(data: bytes):
        meta = parse_mp4(data)
        out = []
        for t in meta.tracks:
            for _i, s in extract_samples(data, t):
                for nal in parse_nal_stream(s):
                    if nal.nal_type == 7:
                        out.append(parse_sps(nal.rbsp))
                    elif nal.nal_type == 8:
                        out.append(parse_pps_head(nal.rbsp))
        return out

    good = synth_mp4_avc(19)
    assert full_decode(good)
    for cut in range(len(good)):
        with _pytest.raises(ValueError):
            full_decode(good[:cut])
    state = 13579
    for _ in range(500):
        state = (state * 1103515245 + 12345) % (1 << 31)
        pos = state % len(good)
        state = (state * 1103515245 + 12345) % (1 << 31)
        val = state % 256
        bad = bytearray(good)
        if bad[pos] == val:
            val = (val + 1) % 256
        bad[pos] = val
        try:
            full_decode(bytes(bad))
        except ValueError:
            pass  # the quarantine contract


def test_avcc_out_of_band_config_and_length_prefixed_samples():
    """The real-world AVC-in-MP4 layout: avcC record roundtrips
    (parameter sets out-of-band, profile/level mirrored from the
    embedded SPS), length-prefixed NAL walks are bounds-checked (a
    prefix overrun, zero length, or trailing garbage raises), and
    the composed payload passes the truncation + flip-fuzz
    contract."""
    import pytest as _pytest

    from redskins_rule_spark.functions.avc import (
        encode_avcc,
        encode_nal_stream_avcc,
        escape_rbsp,
        encode_pps,
        encode_sps,
        parse_avcc,
        parse_nal_stream_avcc,
        parse_nal_unit,
        parse_pps_head,
        parse_sps,
    )
    from redskins_rule_spark.functions.mp4 import (
        extract_samples,
        parse_mp4,
        synth_mp4_avcc,
    )

    sps = encode_sps(66, 21, 0, 0, 2, 0, 1, 0, 9, 5, 1)
    pps = encode_pps(0, 0, 0)
    sn = bytes([(3 << 5) | 7]) + escape_rbsp(sps)
    pn = bytes([(3 << 5) | 8]) + escape_rbsp(pps)
    rec = encode_avcc([sn], [pn], length_size=2)
    cfg = parse_avcc(rec)
    assert (cfg.profile_idc, cfg.level_idc, cfg.length_size) == (66, 21, 2)
    got = parse_sps(parse_nal_unit(cfg.sps[0]).rbsp)
    assert (got.width, got.height) == (160, 96)
    assert parse_pps_head(parse_nal_unit(cfg.pps[0]).rbsp).entropy_coding_mode == 0
    for cut in range(len(rec)):
        with _pytest.raises(ValueError):
            parse_avcc(rec[:cut])

    stream = encode_nal_stream_avcc([(3, 5, b"\x9e"), (2, 1, b"\x11\x22")], 2)
    assert [n.nal_type for n in parse_nal_stream_avcc(stream, 2)] == [5, 1]
    with _pytest.raises(ValueError, match="overruns|truncated"):
        parse_nal_stream_avcc(stream[:-1], 2)
    with _pytest.raises(ValueError, match="overruns|truncated"):
        parse_nal_stream_avcc(stream + b"\x00", 2)

    def full_decode(data: bytes):
        meta = parse_mp4(data)
        track = next(t for t in meta.tracks if t.avcc is not None)
        cfg = parse_avcc(track.avcc)
        out = [parse_sps(parse_nal_unit(cfg.sps[0]).rbsp)]
        for _i, s in extract_samples(data, track):
            out.extend(parse_nal_stream_avcc(s, cfg.length_size))
        return out

    good = synth_mp4_avcc(17)
    assert full_decode(good)
    for cut in range(len(good)):
        with _pytest.raises((ValueError, StopIteration)):
            full_decode(good[:cut])
    state = 97531
    for _ in range(400):
        state = (state * 1103515245 + 12345) % (1 << 31)
        pos = state % len(good)
        state = (state * 1103515245 + 12345) % (1 << 31)
        val = state % 256
        bad = bytearray(good)
        if bad[pos] == val:
            val = (val + 1) % 256
        bad[pos] = val
        try:
            full_decode(bytes(bad))
        except (ValueError, StopIteration):
            pass  # quarantine contract (StopIteration = avcC box gone)


def test_mp3_roundtrip_and_length_formula():
    from redskins_rule_spark.functions.mp3 import (
        BITRATE_KBPS,
        extract_frames,
        frame_length,
        parse_mp3,
        synth_mp3,
    )

    for clen in (0, 1, 4, 8, 9, 23, 100, 997):
        data = synth_mp3(clen)
        m = parse_mp3(data)
        n = clen % 13 + 2
        step = 0 if clen % 4 == 0 else 1
        bis = [(clen + step * i) % 14 + 1 for i in range(n)]
        assert m.n_frames == n and m.sample_rate == 32000
        assert m.duration_ms == 36 * n  # 1152 samples @ 32 kHz exactly
        assert m.id3_bytes == 10 + clen % 29
        assert m.bitrates_kbps == tuple(BITRATE_KBPS[b - 1] for b in bis)
        assert m.is_vbr == (clen % 4 != 0)
        assert len(data) == m.id3_bytes + sum(m.frame_lengths)
        for fi, body in extract_frames(data):
            exp = frame_length(bis[fi], 2, (clen + fi) % 2) - 4
            assert body == bytes([(clen + 13 * fi) % 251]) * exp


def test_mp3_truncation_contract_frame_boundaries_are_valid():
    """MP3 is a self-delimiting frame stream: a prefix ending exactly
    on a frame boundary IS a valid (shorter) stream — real decoders
    accept truncated files the same way. Every OTHER cut point must
    raise ValueError."""
    from redskins_rule_spark.functions.mp3 import parse_mp3, synth_mp3

    full = synth_mp3(23)
    m = parse_mp3(full)
    boundaries = set()
    off = m.id3_bytes
    for fl in m.frame_lengths:
        off += fl
        boundaries.add(off)  # includes len(full) itself
    for cut in range(len(full)):
        if cut in boundaries:
            short = parse_mp3(full[:cut])
            assert short.n_frames < m.n_frames
            assert short.frame_lengths == m.frame_lengths[: short.n_frames]
        else:
            with pytest.raises(ValueError):
                parse_mp3(full[:cut])


def test_mp3_profile_gates_and_bad_streams():
    import struct

    from redskins_rule_spark.functions.mp3 import parse_mp3, synth_mp3

    full = bytearray(synth_mp3(8))
    start = parse_mp3(bytes(full)).id3_bytes
    # flip version bits to MPEG-2 (10): profile gate names the profile
    (word,) = struct.unpack(">I", full[start : start + 4])
    mpeg2 = struct.pack(">I", (word & ~(0b11 << 19)) | (0b10 << 19))
    with pytest.raises(ValueError, match="MPEG-1 Layer III"):
        parse_mp3(bytes(full[:start]) + mpeg2 + bytes(full[start + 4 :]))
    # layer II
    layer2 = struct.pack(">I", (word & ~(0b11 << 17)) | (0b10 << 17))
    with pytest.raises(ValueError, match="Layer III"):
        parse_mp3(bytes(full[:start]) + layer2 + bytes(full[start + 4 :]))
    # garbage after the last frame loses sync
    with pytest.raises(ValueError, match="sync"):
        parse_mp3(bytes(full) + b"\x00\x00\x00\x00")
    # ID3 size bytes must be syncsafe
    bad_id3 = bytearray(full)
    bad_id3[6] |= 0x80
    with pytest.raises(ValueError, match="syncsafe"):
        parse_mp3(bytes(bad_id3))


def test_mp3_byte_flip_fuzz_raises_only_valueerror():
    from redskins_rule_spark.functions.mp3 import extract_frames, synth_mp3

    full = bytearray(synth_mp3(23))
    for pos in range(len(full)):
        for flip in (0x01, 0xFF):
            data = bytes(
                full[:pos] + bytes([full[pos] ^ flip]) + full[pos + 1 :]
            )
            try:
                extract_frames(data)
            except ValueError:
                pass


def test_mp3_granule_layer_roundtrip_and_gates():
    """The Layer III entropy-structure layer: side info + scalefactor
    fields roundtrip bit-exactly (scfsi copy semantics included — the
    copied group takes granule 0's DECODED values under granule 0's
    slens), and every profile gate raises naming its boundary."""
    import pytest as _pytest

    from redskins_rule_spark.functions.mp3 import (
        SLEN,
        encode_mp3_granules,
        parse_mp3_granules,
        synth_mp3_granules,
    )

    # scfsi copy across DIFFERENT scalefac_compress values: g0 slen
    # (4,2) vs g1 slen (0,0) — copied groups surface g0's wide values
    g0 = {
        "global_gain": 200, "scalefac_compress": 14, "preflag": 1,
        "scalefac_scale": 0, "count1table_select": 1,
        "scalefactors": [b % 16 for b in range(11)] + [b % 4 for b in range(10)],
    }
    g1 = dict(g0, scalefac_compress=0,
              scalefactors=[0] * 21)
    fr = {"scfsi": 0b1010, "g0": g0, "g1": dict(g1)}
    # copied groups (0 and 2) must carry g0's values
    fr["g1"]["scalefactors"] = list(fr["g1"]["scalefactors"])
    fr["g1"]["scalefactors"][0:6] = g0["scalefactors"][0:6]
    fr["g1"]["scalefactors"][11:16] = g0["scalefactors"][11:16]
    data = encode_mp3_granules([fr], 5, 2)
    (fi,) = parse_mp3_granules(data)
    assert fi.scfsi == 0b1010 and fi.main_data_begin == 0
    assert fi.granules[0].scalefactors == tuple(g0["scalefactors"])
    assert fi.granules[1].scalefactors == tuple(fr["g1"]["scalefactors"])
    assert SLEN[fi.granules[1].scalefac_compress] == (0, 0)
    assert all(g.spectral_bits == 0 for g in fi.granules)
    # a mismatched copied group is unrepresentable — encoder refuses
    bad = {"scfsi": 0b1000, "g0": g0, "g1": dict(g1, scalefactors=[7] * 21)}
    with _pytest.raises(ValueError, match="scfsi-copied"):
        encode_mp3_granules([bad], 5, 2)

    # profile gates on hand-corrupted side info
    good = synth_mp3_granules(10)
    from redskins_rule_spark.functions.mp3 import _id3_size

    body0 = _id3_size(good)  # first frame starts after the ID3 tag
    # main_data_begin occupies the first 9 bits after the 4-byte header
    reservoir = bytearray(good)
    reservoir[body0 + 4] = 0x80  # main_data_begin MSB set
    with _pytest.raises(ValueError, match="reservoir"):
        parse_mp3_granules(bytes(reservoir))

    # truncation contract mirrors the framing layer's format-faithful
    # shape: a cut ON a frame boundary is a valid shorter stream
    # (real decoders accept truncated files); every OTHER cut raises
    from redskins_rule_spark.functions.mp3 import parse_mp3

    m = parse_mp3(good)
    boundaries = set()
    off = m.id3_bytes
    for fl in m.frame_lengths:
        off += fl
        boundaries.add(off)
    n_full = len(parse_mp3_granules(good))
    for cut in range(1, len(good)):
        if cut in boundaries:
            assert len(parse_mp3_granules(good[:cut])) < n_full
        else:
            with _pytest.raises(ValueError):
                parse_mp3_granules(good[:cut])


def test_mp3_granule_byte_flip_fuzz_raises_only_valueerror():
    """Single-byte corruption of a granule-bearing payload either
    still parses or raises ValueError — never IndexError/struct.error
    (side-info bit fields are range-limited, so most flips still
    parse; part2_3_length and window-switching flips must hit the
    checked contracts, not crash)."""
    from redskins_rule_spark.functions.mp3 import (
        parse_mp3_granules,
        synth_mp3_granules,
    )

    payload = synth_mp3_granules(23)
    state = 24680
    for _ in range(600):
        state = (state * 1103515245 + 12345) % (1 << 31)
        pos = state % len(payload)
        state = (state * 1103515245 + 12345) % (1 << 31)
        val = state % 256
        bad = bytearray(payload)
        if bad[pos] == val:
            val = (val + 1) % 256
        bad[pos] = val
        try:
            parse_mp3_granules(bytes(bad))
        except ValueError:
            pass  # the quarantine contract


def test_mp3_payload_decode_spark(spark):
    from redskins_rule_spark.operators.multimodal import (
        decode_audio_meta,
        decode_mp3_stats,
        sample_mp3_frames,
        with_mp3_payload,
    )

    df = spark.createDataFrame(
        [(1, "a" * 8), (2, "b" * 9)], "doc_id long, text string"
    )
    mp3 = with_mp3_payload(df, "text", "doc_id")
    stats = {r.doc_id: r for r in decode_mp3_stats(mp3).collect()}
    # clen=8: CBR (8%4==0), n=8%13+2=10 frames, bitrate idx 8%14+1=9 → 128 kbps
    assert stats[1].n_frames == 10 and stats[1].is_vbr is False
    assert stats[1].sum_kbps == 10 * 128 and stats[1].duration_ms == 360
    # clen=9: VBR, n=11
    assert stats[2].n_frames == 11 and stats[2].is_vbr is True
    # the generic audio-meta face shares the parser (seam closed in place)
    meta = {r.doc_id: r for r in
            decode_audio_meta(mp3, decode_backend="mp3").collect()}
    assert meta[1].n_samples == 10 * 1152 and meta[1].sample_rate == 32000
    assert meta[1].n_channels == 1 and meta[1].duration_ms == 360
    # frame extraction: stride 3 keeps frames 0,3,6,9
    rows = [r for r in sample_mp3_frames(mp3, stride=3).collect() if r.doc_id == 1]
    assert sorted(r.frame_idx for r in rows) == [0, 3, 6, 9]
    from redskins_rule_spark.functions.mp3 import frame_length

    for r in rows:
        exp = frame_length((8 + 0) % 14 + 1, 2, (8 + r.frame_idx) % 2) - 4
        assert (r.body_len, r.body_sum) == (exp, exp * ((8 + 13 * r.frame_idx) % 251))


def test_mp4_faststart_layout_and_unknown_boxes():
    """Real-world files are often 'fast-start' (moov BEFORE mdat) and
    carry boxes we don't know (free/udta). The parser must be
    layout-independent — chunk offsets are absolute file offsets — and
    skip unknown boxes by size. Built by reordering the encoder's
    output and patching stco accordingly."""
    import struct

    from redskins_rule_spark.functions.mp4 import (
        extract_samples,
        parse_mp4,
        synth_mp4,
    )

    data = synth_mp4(10)  # video-only (10 % 3 != 0)
    # split top-level boxes
    boxes, off = [], 0
    while off < len(data):
        (sz,) = struct.unpack(">I", data[off : off + 4])
        boxes.append((data[off + 4 : off + 8], data[off : off + sz]))
        off += sz
    parts = dict(boxes)
    ftyp, mdat, moov = parts[b"ftyp"], parts[b"mdat"], parts[b"moov"]
    free = struct.pack(">I4s", 8 + 6, b"free") + b"PADPAD"
    # new layout: ftyp | free | moov | free | mdat
    # old mdat payload started at len(ftyp)+8; new start shifts by
    # 2*len(free)+len(moov)
    delta = 2 * len(free) + len(moov)
    moov2 = bytearray(moov)
    # patch every stco entry (single chunk, entry at a fixed pattern:
    # locate 'stco' and adjust the one offset that follows)
    i = moov2.find(b"stco")
    while i != -1:
        # fullbox verflags(4) + count(4) then offsets
        (cnt,) = struct.unpack(">I", moov2[i + 8 : i + 12])
        for j in range(cnt):
            p = i + 12 + 4 * j
            (v,) = struct.unpack(">I", moov2[p : p + 4])
            moov2[p : p + 4] = struct.pack(">I", v + delta)
        i = moov2.find(b"stco", i + 4)
    fast = ftyp + free + bytes(moov2) + free + mdat
    m_orig, m_fast = parse_mp4(data), parse_mp4(fast)
    assert m_fast.duration == m_orig.duration
    assert m_fast.mdat_bytes == m_orig.mdat_bytes
    vt_o = next(t for t in m_orig.tracks if t.handler == "vide")
    vt_f = next(t for t in m_fast.tracks if t.handler == "vide")
    assert vt_f.sample_sizes == vt_o.sample_sizes
    # the extracted sample BYTES are identical despite the move
    assert [s for _, s in extract_samples(fast, vt_f)] == [
        s for _, s in extract_samples(data, vt_o)
    ]


# --- mixed-media sniff + dispatch front door --------------------------------


def test_sniff_format_magic_bytes():
    from redskins_rule_spark.functions.gif import encode_gif, synth_frames
    from redskins_rule_spark.functions.mp3 import synth_mp3
    from redskins_rule_spark.functions.mp4 import synth_mp4
    from redskins_rule_spark.functions.png import encode_png, synth_pixels
    from redskins_rule_spark.functions.wav import encode_wav, synth_samples
    from redskins_rule_spark.operators.multimodal import sniff_format

    assert sniff_format(encode_png(synth_pixels(9, 2, 2), 2, 2)) == "png"
    assert sniff_format(encode_gif(synth_frames(9, 1, 2, 2), 2, 2)) == "gif"
    assert sniff_format(encode_wav(synth_samples(9, 4), 8000, 1)) == "wav"
    assert sniff_format(synth_mp3(9)) == "mp3"
    assert sniff_format(synth_mp3(8)) == "mp3"  # ID3-led
    assert sniff_format(synth_mp4(9)) == "mp4"
    assert sniff_format(b"BM\x00\x00") == "bmp"
    assert sniff_format(b"\xff\xd8\xff\xe0") == "jpeg"
    assert sniff_format(b"\x00\x00??junk") == "unknown"
    assert sniff_format(b"") == "unknown"
    # a bare MP3 frame header (no ID3) still sniffs via sync bits
    frame_led = synth_mp3(8)
    meta_start = 10 + 8 % 29
    assert sniff_format(frame_led[meta_start:]) == "mp3"


def test_media_front_door_dispatch_and_quarantine(spark):
    """Every class of the mixed column routes to its codec; the
    truncated-MP4 class quarantines instead of failing the task; the
    bad-magic class reports unknown."""
    from redskins_rule_spark.operators.multimodal import (
        sniff_media_stats,
        with_mixed_media_payload,
    )

    # doc_id == residue class for easy assertions; text len 10
    df = spark.createDataFrame(
        [(i, "abcdefghij") for i in range(9)], "doc_id long, text string"
    )
    mixed = with_mixed_media_payload(df, "text", "doc_id")
    got = {r.doc_id: r for r in sniff_media_stats(mixed).collect()}
    clen = blen = 10
    assert (got[0].fmt, got[0].width, got[0].height) == ("bmp", blen % 31 + 1, blen % 17 + 1)
    assert (got[1].fmt, got[1].width, got[1].height) == ("png", clen % 13 + 1, clen % 7 + 1)
    assert (got[2].fmt, got[2].n_frames, got[2].duration_ms) == ("gif", clen % 5 + 1, (clen % 5 + 1) * 40)
    assert (got[3].fmt, got[3].width, got[3].height) == ("jpeg", (clen % 4 + 1) * 8, (clen % 3 + 1) * 8)
    assert (got[4].fmt, got[4].n_frames) == ("wav", clen % 97 + 8)
    assert (got[5].fmt, got[5].n_frames) == ("mp3", clen % 13 + 2)
    assert (got[6].fmt, got[6].n_frames) == ("mp4", clen % 7 + 2)
    assert got[7].fmt == "quarantined" and got[7].width is None
    assert got[8].fmt == "unknown" and got[8].duration_ms is None


def test_sniff_dispatches_all_jpeg_profiles(spark):
    """ADVICE r7: the front door used to route every JPEG to the gray
    profile, misreporting valid color (SOF0 3-component) and
    progressive (SOF2) payloads — both real codecs here — as
    'quarantined'. The profile chain now decodes them; genuinely
    corrupt JPEG bytes still quarantine."""
    from redskins_rule_spark.functions.jpeg import (
        encode_jpeg_color,
        encode_jpeg_gray,
        encode_jpeg_gray_progressive,
        synth_dc_blocks,
        synth_dc_blocks_color,
    )
    from redskins_rule_spark.operators.multimodal import sniff_media_stats

    from redskins_rule_spark.functions.jpeg import (
        encode_jpeg_color_progressive,
    )

    gray = encode_jpeg_gray(synth_dc_blocks(5, 2, 1), 2, 1)
    y, cb, cr = synth_dc_blocks_color(5, 1, 1)
    color = encode_jpeg_color(y, cb, cr, 1, 1)
    prog = encode_jpeg_gray_progressive(synth_dc_blocks(5, 2, 1, step=9), 2, 1)
    progc = encode_jpeg_color_progressive(y, cb, cr, 1, 1)
    corrupt = gray[:-7]  # truncated entropy stream
    df = spark.createDataFrame(
        [(1, gray), (2, color), (3, prog), (4, corrupt), (5, progc)],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in sniff_media_stats(df).collect()}
    assert (got[1].fmt, got[1].width, got[1].height) == ("jpeg", 16, 8)
    assert (got[2].fmt, got[2].width, got[2].height) == ("jpeg", 16, 16)
    assert (got[3].fmt, got[3].width, got[3].height) == ("jpeg", 16, 8)
    assert got[4].fmt == "quarantined" and got[4].width is None
    assert (got[5].fmt, got[5].width, got[5].height) == ("jpeg", 16, 16)


def test_sniff_dispatches_adts(spark):
    """ADVICE r8 (high): the front door's 'aac' branch called
    parse_adts without importing it into sniff_media_stats.run — any
    ADTS payload died with NameError (which the ValueError quarantine
    does not catch) instead of decoding. Pin the branch end-to-end:
    a valid ADTS stream reports its frame count and duration; a
    mid-frame truncation quarantines."""
    from redskins_rule_spark.functions.aac import parse_adts, synth_adts
    from redskins_rule_spark.operators.multimodal import sniff_media_stats

    good = synth_adts(10)
    expect = parse_adts(good)
    df = spark.createDataFrame(
        [(1, good), (2, good[:-3])], "doc_id long, payload binary"
    )
    got = {r.doc_id: r for r in sniff_media_stats(df).collect()}
    assert (got[1].fmt, got[1].n_frames, got[1].duration_ms) == (
        "aac", expect.n_frames, expect.duration_ms
    )
    assert got[2].fmt == "quarantined" and got[2].n_frames is None


def test_avc_encoder_rejects_zero_terminated_rbsp():
    """ADVICE r8: an RBSP ending in 0x00 would round-trip through the
    Annex B stream with its last byte silently stripped (the parser's
    4-byte-start-code heuristic treats a 00 before the next start
    code as framing). Spec-valid RBSPs end nonzero
    (rbsp_trailing_bits); the encoder now enforces the guarantee."""
    import pytest

    from redskins_rule_spark.functions.avc import (
        encode_nal_stream,
        parse_nal_stream,
    )

    with pytest.raises(ValueError, match="rbsp_trailing_bits"):
        encode_nal_stream([(1, 7, b"\x42\x00")])
    # nonzero-terminated payloads of both start-code classes still
    # round-trip byte-exact
    nals = [(1, 7, b"\x42\x01\x80"), (0, 6, b"\x05\x01\x80")]
    got = parse_nal_stream(encode_nal_stream(nals))
    assert [(n.ref_idc, n.nal_type, n.rbsp) for n in got] == nals


def test_jpeg_dims_dispatches_on_sniffed_sof():
    """ADVICE r8: decode_jpeg_dims used to run a four-profile
    try-chain on every payload (up to four full pixel decodes in the
    sniffer hot path) and re-raise only the LAST profile's error on
    corrupt input. It now sniffs the SOF marker + component count and
    runs the one matching profile, so a corrupt payload surfaces ITS
    profile's diagnostic; marker-broken payloads still fall back to
    the chain."""
    import pytest

    from redskins_rule_spark.functions.jpeg import (
        _sniff_sof,
        decode_jpeg_color,
        decode_jpeg_dims,
        encode_jpeg_color,
        encode_jpeg_gray,
        encode_jpeg_gray_progressive,
        synth_dc_blocks,
        synth_dc_blocks_color,
    )

    gray = encode_jpeg_gray(synth_dc_blocks(5, 2, 1), 2, 1)
    y, cb, cr = synth_dc_blocks_color(5, 1, 1)
    color = encode_jpeg_color(y, cb, cr, 1, 1)
    prog = encode_jpeg_gray_progressive(synth_dc_blocks(5, 2, 1, step=9), 2, 1)
    assert _sniff_sof(gray) == (0xC0, 1)
    assert _sniff_sof(color) == (0xC0, 3)
    assert _sniff_sof(prog) == (0xC2, 1)
    assert decode_jpeg_dims(gray) == (16, 8)
    assert decode_jpeg_dims(color) == (16, 16)
    # corrupt COLOR payload raises the color decoder's own diagnostic
    with pytest.raises(ValueError) as exc:
        decode_jpeg_dims(color[:-5])
    with pytest.raises(ValueError) as direct:
        decode_jpeg_color(color[:-5])
    assert str(exc.value) == str(direct.value)
    # marker-level corruption (no SOF nameable) still raises
    assert _sniff_sof(b"\xff\xd8\xff\xd9") is None
    with pytest.raises(ValueError):
        decode_jpeg_dims(b"\xff\xd8\xff\xd9")


def test_jpeg_sniff_skips_fill_bytes():
    """ADVICE r9: T.81 B.1.1.2 allows fill bytes (repeated 0xFF)
    before any marker. The sniff walk used to classify the fill byte
    itself as a marker (and read a garbage segment length), dropping
    such payloads to the four-decoder fallback chain. It now skips
    fill bytes; the decoders themselves also accept the payload."""
    from redskins_rule_spark.functions.jpeg import (
        _sniff_sof,
        decode_jpeg_dims,
        decode_jpeg_gray,
        encode_jpeg_gray,
        synth_dc_blocks,
    )

    gray = encode_jpeg_gray(synth_dc_blocks(5, 2, 1), 2, 1)
    assert gray[:2] == b"\xff\xd8"
    # inject fill bytes before the first segment marker after SOI
    padded = gray[:2] + b"\xff\xff\xff" + gray[2:]
    assert _sniff_sof(padded) == (0xC0, 1)
    assert decode_jpeg_dims(padded) == (16, 8)
    # baseline decoder tolerates the same padding (marker-walk parity)
    w, h, _ = decode_jpeg_gray(gray)
    assert (w, h) == (16, 8)
    # fill bytes truncating at end-of-buffer: sniff returns None, no IndexError
    assert _sniff_sof(gray[:2] + b"\xff\xff") is None


# --- q209: I_PCM slice layer (real pixels through the H.264 seam) ---


def _ipcm_planes(mb_w, mb_h, seed=11):
    W, H = 16 * mb_w, 16 * mb_h
    y = bytes((7 * (i % W) + 13 * (i // W) + seed) % 255 + 1 for i in range(W * H))
    cb = bytes((5 * (i % (W // 2)) + 11 * (i // (W // 2)) + seed) % 255 + 1
               for i in range(W * H // 4))
    cr = bytes((3 * (i % (W // 2)) + 17 * (i // (W // 2)) + seed) % 255 + 1
               for i in range(W * H // 4))
    return y, cb, cr


def test_avc_ipcm_roundtrip_planes():
    from redskins_rule_spark.functions.avc import decode_avc_ipcm, encode_avc_ipcm

    for mb_w, mb_h in [(1, 1), (3, 2), (2, 1)]:
        y, cb, cr = _ipcm_planes(mb_w, mb_h)
        stream = encode_avc_ipcm(y, cb, cr, mb_w, mb_h, qp_delta=-2, idr_pic_id=5)
        f = decode_avc_ipcm(stream)
        assert (f.width, f.height) == (16 * mb_w, 16 * mb_h)
        assert (f.n_mbs, f.qp, f.idr_pic_id) == (mb_w * mb_h, 24, 5)
        assert f.y == y and f.cb == cb and f.cr == cr


def test_avc_ipcm_truncation_sweep_raises_valueerror():
    import pytest

    from redskins_rule_spark.functions.avc import decode_avc_ipcm, encode_avc_ipcm

    y, cb, cr = _ipcm_planes(2, 1)
    stream = encode_avc_ipcm(y, cb, cr, 2, 1)
    for cut in range(1, len(stream)):
        with pytest.raises(ValueError):
            decode_avc_ipcm(stream[:cut])


def test_avc_ipcm_rejects_forbidden_zero_sample():
    import pytest

    from redskins_rule_spark.functions.avc import encode_avc_ipcm

    y, cb, cr = _ipcm_planes(1, 1)
    with pytest.raises(ValueError, match="forbidden"):
        encode_avc_ipcm(b"\x00" + y[1:], cb, cr, 1, 1)


def test_avc_ipcm_names_entropy_seam_on_coded_macroblock():
    """A non-I_PCM mb_type means CAVLC residual decode — the seam must
    be raised BY NAME, not as a generic parse error."""
    import pytest

    from redskins_rule_spark.functions.avc import (
        _EgBitsOut,
        decode_ipcm_slice,
        encode_pps,
        encode_sps,
        parse_pps,
        parse_sps,
    )

    sps = parse_sps(encode_sps(66, 10, 0, 0, 0, 0, 1, 0, 0, 0, 1))
    pps = parse_pps(encode_pps(0, 0, 0))
    w = _EgBitsOut()
    w.ue(0); w.ue(7); w.ue(0)      # first_mb, slice_type I, pps_id
    w.u(0, 4); w.ue(0); w.u(0, 4)  # frame_num, idr_pic_id, poc_lsb
    w.u(0, 1); w.u(0, 1)           # dec_ref_pic_marking (IDR)
    w.se(0); w.ue(1)               # qp_delta, deblocking off
    w.ue(0)                        # mb_type 0 = I_4x4 — entropy-coded
    with pytest.raises(ValueError, match="entropy seam"):
        decode_ipcm_slice(w.rbsp_trailing(), sps, pps)


def test_avc_ipcm_rejects_cabac_pps():
    import pytest

    from redskins_rule_spark.functions.avc import (
        decode_ipcm_slice,
        encode_ipcm_slice,
        encode_pps,
        encode_sps,
        parse_pps,
        parse_sps,
    )

    y, cb, cr = _ipcm_planes(1, 1)
    rbsp = encode_ipcm_slice(y, cb, cr, 1, 1)
    sps = parse_sps(encode_sps(66, 10, 0, 0, 0, 0, 1, 0, 0, 0, 1))
    cabac_pps = parse_pps(encode_pps(0, 0, 1))
    with pytest.raises(ValueError, match="CABAC"):
        decode_ipcm_slice(rbsp, sps, cabac_pps)


def test_avc_ipcm_bitflip_never_misdecodes_silently_or_crashes():
    """Flip every byte of the header region (pre-PCM) — the decode
    must either raise ValueError or produce a frame; never
    IndexError/struct.error."""
    from redskins_rule_spark.functions.avc import decode_avc_ipcm, encode_avc_ipcm

    y, cb, cr = _ipcm_planes(1, 1)
    stream = bytearray(encode_avc_ipcm(y, cb, cr, 1, 1))
    for pos in range(min(60, len(stream))):
        mutated = bytearray(stream)
        mutated[pos] ^= 0x5A
        try:
            decode_avc_ipcm(bytes(mutated))
        except ValueError:
            pass


def test_avc_ipcm_synth_matches_closed_form():
    """synth_avc_ipcm's planes follow the documented closed form the
    q209 oracle replays."""
    from redskins_rule_spark.functions.avc import decode_avc_ipcm, synth_avc_ipcm

    for clen in (0, 1, 17, 64, 253):
        f = decode_avc_ipcm(synth_avc_ipcm(clen))
        mb_w, mb_h = clen % 3 + 1, clen % 2 + 1
        W = 16 * mb_w
        assert (f.width, f.height) == (W, 16 * mb_h)
        assert f.qp == 24 + clen % 5
        assert f.idr_pic_id == clen % 8
        assert f.y == bytes(
            (clen + 7 * (i % W) + 13 * (i // W)) % 255 + 1
            for i in range(W * 16 * mb_h)
        )


# --- q210: count1-region Huffman decode (Table B.7 A/B) ---


def test_mp3_count1_roundtrip_both_tables():
    from redskins_rule_spark.functions.mp3 import (
        encode_mp3_granules,
        parse_mp3_granules,
    )

    quads_a = [(1, 0, -1, 1), (0, 0, 0, 0), (-1, -1, 1, 0)]
    quads_b = [(0, 1, 0, -1), (1, 1, 1, 1)]
    fr = {"scfsi": 0}
    for g, (table, quads) in enumerate(((0, quads_a), (1, quads_b))):
        fr[f"g{g}"] = {
            "global_gain": 100 + g,
            "scalefac_compress": 13,  # slen (3,3): all 21 bands 3-bit
            "preflag": 0,
            "scalefac_scale": 0,
            "count1table_select": table,
            "scalefactors": [b % 8 for b in range(21)],
            "count1": quads,
        }
    data = encode_mp3_granules([fr], 5, 2)
    frames = parse_mp3_granules(data, decode_count1=True)
    assert list(frames[0].granules[0].count1) == quads_a
    assert list(frames[0].granules[1].count1) == quads_b
    # structure-only parse skips the spectra but reports their size
    skipped = parse_mp3_granules(data)
    assert skipped[0].granules[0].count1 is None
    assert skipped[0].granules[0].spectral_bits > 0


def test_mp3_count1_table_a_is_kraft_exact_prefix_code():
    from redskins_rule_spark.functions.mp3 import _COUNT1_A

    codes = {(ln, code) for ln, code in _COUNT1_A.values()}
    assert len(codes) == 16
    assert sum(2.0 ** -ln for ln, _ in codes) == 1.0
    for ln1, c1 in codes:
        for ln2, c2 in codes:
            if ln1 < ln2:
                assert (c2 >> (ln2 - ln1)) != c1, "prefix collision"


def test_mp3_count1_property_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from redskins_rule_spark.functions.mp3 import (
        encode_mp3_granules,
        parse_mp3_granules,
    )

    quad = st.tuples(*[st.sampled_from((-1, 0, 1))] * 4)

    @settings(max_examples=120, deadline=None)
    @given(st.lists(quad, max_size=8), st.lists(quad, max_size=8),
           st.integers(0, 1), st.integers(0, 1))
    def check(qa, qb, ta, tb):
        fr = {"scfsi": 0}
        for g, (t, qs) in enumerate(((ta, qa), (tb, qb))):
            fr[f"g{g}"] = {
                "global_gain": 0,
                "scalefac_compress": 0,
                "preflag": 0,
                "scalefac_scale": 0,
                "count1table_select": t,
                "scalefactors": [0] * 21,
                "count1": qs,
            }
        frames = parse_mp3_granules(
            encode_mp3_granules([fr], 10, 2), decode_count1=True
        )
        assert list(frames[0].granules[0].count1) == qa
        assert list(frames[0].granules[1].count1) == qb

    check()


def test_mp3_count1_big_values_raises_by_name():
    """A big_values > 0 granule cannot be spectrally decoded without
    the 32 pair tables — the seam must be raised by name."""
    import pytest

    from redskins_rule_spark.functions.mp3 import (
        parse_mp3_granules,
        synth_mp3_granules,
    )

    data = bytearray(synth_mp3_granules(3))
    # synth silence streams have big_values = 0; force it nonzero in
    # the first granule's side info (bits 18-26 of the frame body =
    # bytes 4.. of the stream after the 4-byte header; ID3 absent for
    # clen=3? clen%19=3 bytes of ID3 + 10 header) — instead flip via
    # the encoder: structure parse still works, count1 decode raises.
    frames = parse_mp3_granules(bytes(data), decode_count1=True)
    assert frames  # silence decodes fine (empty quad runs)

    from redskins_rule_spark.functions.mp3 import _Bits, extract_frames

    # locate the first frame body and set its granule-0 big_values
    idx, body = extract_frames(bytes(data))[0]
    pos = data.find(body)
    # big_values is bits [30, 39) of the body (9+5+4+12 = 30)
    b = bytearray(body)
    b[3] |= 0b00000010  # sets a bit inside the 9-bit big_values field
    mutated = bytes(data[:pos]) + bytes(b) + bytes(data[pos + len(body):])
    with pytest.raises(ValueError, match="big-values"):
        parse_mp3_granules(mutated, decode_count1=True)


def test_mp3_count1_truncation_raises_valueerror():
    import pytest

    from redskins_rule_spark.functions.mp3 import (
        parse_mp3_granules,
        synth_mp3_count1,
    )

    data = synth_mp3_count1(23)
    for cut in range(4, len(data), 11):
        try:
            parse_mp3_granules(data[:cut], decode_count1=True)
        except ValueError:
            pass


def test_mp3_count1_synth_matches_closed_form():
    from redskins_rule_spark.functions.mp3 import (
        parse_mp3_granules,
        synth_mp3_count1,
    )

    clen = 41
    frames = parse_mp3_granules(synth_mp3_count1(clen), decode_count1=True)
    assert len(frames) == clen % 5 + 2
    i, g = 1, 1
    gr = frames[i].granules[g]
    nq = (clen + i + g) % 5 + 1
    assert list(gr.count1) == [
        ((clen + 3 * q + i + g) % 3 - 1,
         (clen + 5 * q + 2 * i) % 3 - 1,
         (clen + 7 * q + 3 * i + g) % 3 - 1,
         (clen + 11 * q + 4 * i) % 3 - 1)
        for q in range(nq)
    ]


def test_mp4_ipcm_pixels_roundtrip_through_container():
    """q212: planes encoded into an MP4 (avcC layout, length-prefixed
    NAL) decode back bit-exact through the full container path."""
    from redskins_rule_spark.functions.avc import synth_ipcm_planes
    from redskins_rule_spark.functions.mp4 import synth_mp4_ipcm

    from redskins_rule_spark.functions.avc import (
        decode_ipcm_slice,
        parse_avcc,
        parse_nal_stream_avcc,
        parse_nal_unit,
        parse_pps,
        parse_sps,
    )
    from redskins_rule_spark.functions.mp4 import extract_samples, parse_mp4

    for clen in (0, 1, 17, 64):
        data = synth_mp4_ipcm(clen)
        y, cb, cr, mb_w, mb_h = synth_ipcm_planes(clen)
        meta = parse_mp4(data)
        track = next(t for t in meta.tracks if t.avcc is not None)
        cfg = parse_avcc(track.avcc)
        assert cfg.length_size == (2 if clen % 2 else 4)
        sps = parse_sps(parse_nal_unit(cfg.sps[0]).rbsp)
        pps = parse_pps(parse_nal_unit(cfg.pps[0]).rbsp)
        (_i, sample), = extract_samples(data, track)
        (nal,) = parse_nal_stream_avcc(sample, cfg.length_size)
        frame = decode_ipcm_slice(nal.rbsp, sps, pps)
        assert (frame.width, frame.height) == (16 * mb_w, 16 * mb_h)
        assert frame.qp == 24 + clen % 5
        assert frame.y == y and frame.cb == cb and frame.cr == cr


def test_mp4_ipcm_truncation_raises_valueerror():
    from redskins_rule_spark.functions.mp4 import synth_mp4_ipcm
    from redskins_rule_spark.operators.multimodal import decode_mp4_ipcm_stats  # noqa: F401

    from redskins_rule_spark.functions.avc import (
        parse_avcc,
        parse_nal_stream_avcc,
    )
    from redskins_rule_spark.functions.mp4 import extract_samples, parse_mp4

    data = synth_mp4_ipcm(9)
    for cut in range(8, len(data), 37):
        try:
            meta = parse_mp4(data[:cut])
            track = next(t for t in meta.tracks if t.avcc is not None)
            cfg = parse_avcc(track.avcc)
            for _i, sample in extract_samples(data[:cut], track):
                parse_nal_stream_avcc(sample, cfg.length_size)
        except (ValueError, StopIteration):
            pass


# --- q213: big-values pair table 1 ---


def test_mp3_bigv_roundtrip_with_count1():
    from redskins_rule_spark.functions.mp3 import (
        encode_mp3_granules,
        parse_mp3_granules,
    )

    pairs = [(1, -1), (0, 0), (-1, 0), (1, 1), (0, -1)]
    quads = [(1, 0, -1, 1)]
    fr = {"scfsi": 0}
    for g in (0, 1):
        fr[f"g{g}"] = {
            "global_gain": 9, "scalefac_compress": 13, "preflag": 0,
            "scalefac_scale": 0, "count1table_select": g,
            "scalefactors": [b % 8 for b in range(21)],
            "big_pairs": pairs if g == 0 else [],
            "count1": quads,
        }
    out = parse_mp3_granules(
        encode_mp3_granules([fr], 5, 2), decode_count1=True
    )
    g0, g1 = out[0].granules
    assert list(g0.big_pairs) == pairs and g0.big_values == 5
    assert g1.big_pairs == () and list(g1.count1) == quads


def test_mp3_bigv_table1_is_kraft_exact_prefix_code():
    from redskins_rule_spark.functions.mp3 import _BIGV_T1

    codes = {(ln, code) for ln, code in _BIGV_T1.values()}
    assert len(codes) == 4
    assert sum(2.0 ** -ln for ln, _ in codes) == 1.0
    for ln1, c1 in codes:
        for ln2, c2 in codes:
            if ln1 < ln2:
                assert (c2 >> (ln2 - ln1)) != c1, "prefix collision"


def test_mp3_bigv_other_tables_raise_by_name():
    """A stream selecting pair tables other than 1 cannot decode its
    big-values region — the tables-2-31 seam must be raised by name
    (structure-only parse of the same stream still succeeds)."""
    import pytest

    from redskins_rule_spark.functions.mp3 import (
        encode_mp3_granules,
        parse_mp3_granules,
    )

    fr = {"scfsi": 0}
    for g in (0, 1):
        fr[f"g{g}"] = {
            "global_gain": 1, "scalefac_compress": 0, "preflag": 0,
            "scalefac_scale": 0, "count1table_select": 0,
            "scalefactors": [0] * 21,
            "big_pairs": [(1, 0)],
        }
    data = bytearray(encode_mp3_granules([fr], 10, 2))
    # flip granule 0's table_select from (1,1,1) to another table by
    # toggling a bit: side info bits 18..58 are granule 0's fields;
    # table_select starts at bit 18+12+9+8+4+1 = 52 (3 x 5 bits)
    from redskins_rule_spark.functions.mp3 import extract_frames

    idx, body = extract_frames(bytes(data))[0]
    pos = bytes(data).find(body)
    b = bytearray(body)
    # table_select[0] bits 52..57: bit 52 is in byte 6, bit 4 (52//8=6, 52%8=4)
    b[6] ^= 0b00000100  # toggles a table_select bit -> no longer 1
    mutated = bytes(data[:pos]) + bytes(b) + bytes(data[pos + len(body):])
    assert parse_mp3_granules(mutated)  # structure layer unaffected
    with pytest.raises(ValueError, match="tables 2-31"):
        parse_mp3_granules(mutated, decode_count1=True)


def test_mp3_bigv_synth_matches_closed_form():
    from redskins_rule_spark.functions.mp3 import (
        parse_mp3_granules,
        synth_mp3_bigv,
    )

    clen = 29
    frames = parse_mp3_granules(synth_mp3_bigv(clen), decode_count1=True)
    assert len(frames) == clen % 4 + 2
    for i, fr in enumerate(frames):
        for g in (0, 1):
            gr = fr.granules[g]
            np_ = (clen + 2 * i + g) % 6 + 1
            nq = (clen + i + g) % 4
            assert list(gr.big_pairs) == [
                ((clen + 2 * p + i) % 3 - 1, (clen + 3 * p + g) % 3 - 1)
                for p in range(np_)
            ]
            assert len(gr.count1) == nq


# --- q214: silent-SCE raw_data_block layer ---


def test_aac_silent_sce_roundtrip_and_escape_runs():
    from redskins_rule_spark.functions.aac import (
        encode_aac_silent_block,
        parse_aac_silent_block,
    )

    # max_sfb 40 with one section exercises the 5-bit escape (31 + 9);
    # max_sfb 31 exactly exercises 31 + 0
    for max_sfb, ns in ((40, 1), (31, 1), (45, 3), (4, 4), (1, 1)):
        block = encode_aac_silent_block(
            [{"instance_tag": 5, "global_gain": 200, "window_shape": 1,
              "max_sfb": max_sfb, "n_sections": ns}]
        )
        (sce,) = parse_aac_silent_block(block)
        assert sce.max_sfb == max_sfb
        assert len(sce.sections) == ns
        assert sum(ln for _cb, ln in sce.sections) == max_sfb
        assert all(cb == 0 for cb, _ln in sce.sections)


def test_aac_silent_sce_multiple_elements_and_fil():
    from redskins_rule_spark.functions.aac import (
        _AacBitsOut,
        encode_aac_silent_block,
        parse_aac_silent_block,
    )

    two = encode_aac_silent_block(
        [{"instance_tag": t, "global_gain": 10 * t, "window_shape": 0,
          "max_sfb": 8, "n_sections": 2} for t in (1, 2)]
    )
    sces = parse_aac_silent_block(two)
    assert [s.instance_tag for s in sces] == [1, 2]
    # FIL element (count=2 fill bytes) before END is walked, not fatal
    w = _AacBitsOut()
    w.write(6, 3)   # ID_FIL
    w.write(2, 4)   # count
    w.write(0xAB, 8)
    w.write(0xCD, 8)
    w.write(7, 3)   # ID_END
    assert parse_aac_silent_block(w.pad_to_byte()) == []


def test_aac_nonzero_codebook_raises_by_name():
    import pytest

    from redskins_rule_spark.functions.aac import (
        _AacBitsOut,
        parse_aac_silent_block,
    )

    w = _AacBitsOut()
    w.write(0, 3)   # ID_SCE
    w.write(0, 4)   # tag
    w.write(0, 8)   # gain
    w.write(0, 1); w.write(0, 2); w.write(0, 1)  # ics: reserved/seq/shape
    w.write(4, 6)   # max_sfb
    w.write(0, 1)   # predictor
    w.write(11, 4)  # sect_cb = 11 (ESC book) — the codebook seam
    w.write(4, 5)   # sect_len
    with pytest.raises(ValueError, match="codebook seam"):
        parse_aac_silent_block(w.pad_to_byte())


def test_aac_short_window_now_decodes_not_raises():
    """Round 10 gated EIGHT_SHORT_SEQUENCE by name; round 11 closed
    that seam (q224) — a minimal truncated short-window element now
    fails on OVERRUN (real parse progress), not on the window shape."""
    import pytest

    from redskins_rule_spark.functions.aac import (
        _AacBitsOut,
        parse_aac_silent_block,
    )

    w = _AacBitsOut()
    w.write(0, 3); w.write(0, 4); w.write(0, 8)
    w.write(0, 1); w.write(2, 2)  # EIGHT_SHORT_SEQUENCE
    w.write(0, 1)
    with pytest.raises(ValueError, match="overruns"):
        parse_aac_silent_block(w.pad_to_byte())


def test_aac_silent_truncation_raises_valueerror():
    from redskins_rule_spark.functions.aac import (
        parse_aac_silent_block,
        parse_adts,
        synth_adts_silent,
    )

    data = synth_adts_silent(13)
    for cut in range(1, len(data)):
        try:
            meta = parse_adts(data[:cut])
            for fr in meta.frames:
                parse_aac_silent_block(fr.payload)
        except ValueError:
            pass


# --- q215: Adam7-interlaced PNG ---


def test_png_adam7_roundtrip_all_filters_and_empty_passes():
    from redskins_rule_spark.functions.png import (
        decode_png,
        encode_png_interlaced,
        synth_pixels,
    )

    for w, h in [(1, 1), (2, 3), (5, 5), (8, 8), (13, 7), (16, 9)]:
        px = synth_pixels(w * 31 + h, w, h)
        for filters in ((0,) * 7, (0, 1, 2, 3, 4, 1, 2), (4,) * 7):
            meta, got = decode_png(encode_png_interlaced(px, w, h, filters))
            assert meta.interlace == 1
            assert got == px, (w, h, filters)


def test_png_adam7_pass_geometry_covers_raster_exactly():
    """Every pixel is written by exactly one Adam7 pass."""
    from redskins_rule_spark.functions.png import _adam7_dims

    for w, h in [(1, 1), (3, 2), (8, 8), (13, 7), (17, 11)]:
        seen = set()
        for xs, ys, xst, yst, pw, ph in _adam7_dims(w, h):
            for py in range(ph):
                for px in range(pw):
                    pt = (xs + px * xst, ys + py * yst)
                    assert pt not in seen
                    seen.add(pt)
        assert len(seen) == w * h


def test_png_adam7_truncation_and_trailing_raise_valueerror():
    import zlib

    import pytest

    from redskins_rule_spark.functions.png import (
        decode_png,
        encode_png_interlaced,
        synth_pixels,
    )

    px = synth_pixels(9, 8, 8)
    data = encode_png_interlaced(px, 8, 8)
    # corrupt the IDAT stream -> ValueError, never zlib.error
    for cut in range(16, len(data), 23):
        try:
            decode_png(data[:cut])
        except ValueError:
            pass
    # a stream with EXTRA bytes after the last pass must be rejected:
    # rebuild the IDAT with two appended bytes
    from redskins_rule_spark.functions.png import _SIG, _chunk, _walk_chunks

    chunks = dict(_walk_chunks(data))
    raw = zlib.decompress(chunks[b"IDAT"]) + b"\x00\x00"
    bad = (
        _SIG
        + _chunk(b"IHDR", chunks[b"IHDR"])
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="trailing"):
        decode_png(bad)


# --- q216: interlaced GIF ---


def test_gif_interlace_roundtrip_and_flag():
    from redskins_rule_spark.functions.gif import (
        decode_gif,
        encode_gif,
        synth_frames,
    )

    for w, h in [(2, 2), (3, 9), (8, 8), (17, 12), (2, 16)]:
        frames = synth_frames(w * 31 + h, 3, w, h)
        meta, got = decode_gif(encode_gif(frames, w, h, interlace=True))
        assert got == frames, (w, h)
        # progressive payloads are byte-identical to before the change
        meta0, got0 = decode_gif(encode_gif(frames, w, h))
        assert got0 == frames


def test_gif_interlace_rows_partition_every_height():
    from redskins_rule_spark.functions.gif import _interlace_rows

    for h in range(1, 40):
        rows = _interlace_rows(h)
        assert sorted(rows) == list(range(h)), h


def test_gif_interlace_is_a_real_permutation_in_the_stream():
    """The stored row order must differ from raster order (else the
    flag is decorative): decode WITHOUT deinterlacing by clearing the
    flag byte and confirm the pixels come back scrambled."""
    from redskins_rule_spark.functions.gif import (
        decode_gif,
        encode_gif,
        synth_frames,
    )

    w, h = 4, 8
    frames = synth_frames(7, 1, w, h)
    data = bytearray(encode_gif(frames, w, h, interlace=True))
    # image descriptor: 0x2C + 9 bytes; flags byte is the 10th after it
    i = data.index(0x2C, 13 + 768)
    assert data[i + 9] == 0x40
    data[i + 9] = 0
    _meta, scrambled = decode_gif(bytes(data))
    assert scrambled != frames


# --- q217: IMA-ADPCM (real lossy-codec reconstruction) ---


def test_wav_ima_roundtrip_matches_reference_fold():
    from redskins_rule_spark.functions.wav import (
        decode_wav_ima,
        encode_wav_ima,
        ima_adpcm_step,
    )

    nibbles = [(7 + 3 * i) % 16 for i in range(32)]
    data = encode_wav_ima(nibbles, -100, 40, 8000)
    sr, samples = decode_wav_ima(data)
    pred, idx = -100, 40
    want = [pred]
    for n in nibbles:
        pred, idx = ima_adpcm_step(pred, idx, n)
        want.append(pred)
    assert (sr, samples) == (8000, want)


def test_wav_ima_predictor_clamps_at_int16_bounds():
    from redskins_rule_spark.functions.wav import ima_adpcm_step

    # max step, positive direction from near the ceiling -> clamp
    pred, idx = ima_adpcm_step(32000, 88, 0b0111)
    assert pred == 32767 and idx == 88  # index clamps at 88 too
    pred, idx = ima_adpcm_step(-32000, 88, 0b1111)
    assert pred == -32768
    # index clamps at 0 going down
    _p, idx0 = ima_adpcm_step(0, 0, 0)
    assert idx0 == 0


def test_wav_ima_rejects_pcm_and_truncation():
    import pytest

    from redskins_rule_spark.functions.wav import (
        decode_wav_ima,
        encode_wav,
        synth_wav_ima,
    )

    with pytest.raises(ValueError, match="IMA-ADPCM"):
        decode_wav_ima(encode_wav([0, 1, 2, 3], 8000))
    data = synth_wav_ima(23)
    for cut in range(1, len(data), 5):
        try:
            decode_wav_ima(data[:cut])
        except ValueError:
            pass
    # PCM decoder keeps rejecting IMA payloads by tag
    from redskins_rule_spark.functions.wav import decode_wav

    with pytest.raises(ValueError, match="tag=17"):
        decode_wav(data)


# --- q218: EXIF APP1 / TIFF IFD walk ---


def test_exif_roundtrip_both_endians():
    from redskins_rule_spark.functions.exif import (
        encode_exif,
        extract_app1,
        insert_app1,
        parse_exif,
    )
    from redskins_rule_spark.functions.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
        synth_dc_blocks,
    )

    jpeg = encode_jpeg_gray(synth_dc_blocks(5, 2, 1), 2, 1)
    for be in (False, True):
        body = encode_exif(6, 16, 8, "2024:03:01 10:20:30", big_endian=be)
        tagged = insert_app1(jpeg, body)
        ex = parse_exif(extract_app1(tagged))
        assert ex.byte_order == ("MM" if be else "II")
        assert (ex.orientation, ex.width, ex.height) == (6, 16, 8)
        assert ex.datetime == "2024:03:01 10:20:30"
        assert ex.n_entries == 4
        # the pixel decoder tolerates (skips) the APP1 segment
        assert decode_jpeg_gray(tagged)[:2] == (16, 8)


def test_exif_unknown_tags_and_types_are_counted_not_fatal():
    import struct

    from redskins_rule_spark.functions.exif import parse_exif

    # hand-build a little-endian TIFF with one RATIONAL (type 5) entry
    # and one Orientation entry
    e = "<"
    entries = [
        struct.pack(e + "HHI", 0x011A, 5, 1) + struct.pack(e + "I", 38),
        struct.pack(e + "HHI", 0x0112, 3, 1) + struct.pack(e + "H", 3) + b"\x00\x00",
    ]
    tiff = (
        b"II" + struct.pack(e + "H", 42) + struct.pack(e + "I", 8)
        + struct.pack(e + "H", 2) + b"".join(entries)
        + struct.pack(e + "I", 0) + struct.pack(e + "II", 72, 1)
    )
    ex = parse_exif(b"Exif\x00\x00" + tiff)
    assert ex.n_entries == 2 and ex.orientation == 3


def test_exif_corruption_raises_valueerror():
    import pytest

    from redskins_rule_spark.functions.exif import (
        extract_app1,
        parse_exif,
        synth_exif_jpeg,
    )

    data = synth_exif_jpeg(17)
    body = extract_app1(data)
    with pytest.raises(ValueError, match="byte-order"):
        parse_exif(body[:6] + b"XX" + body[8:])
    with pytest.raises(ValueError, match="magic"):
        parse_exif(body[:8] + b"\x00\x00" + body[10:])
    for cut in range(6, len(body), 7):
        try:
            parse_exif(body[:cut])
        except ValueError:
            pass
    # orientation out of 1..8 is rejected
    from redskins_rule_spark.functions.exif import encode_exif

    with pytest.raises(ValueError, match="orientation"):
        encode_exif(0, 8, 8, "x")


# --- q219: ID3v2.4 ---


def test_id3v24_roundtrip_footer_and_syncsafe_sizes():
    from redskins_rule_spark.functions.mp3 import (
        encode_id3v24,
        parse_id3_frames,
        parse_id3v23_frames,
        parse_mp3,
        synth_mp3_tagged24,
    )
    import pytest

    # a frame over 127 bytes: syncsafe size differs from plain BE
    long_val = "y" * 200
    tag = encode_id3v24([("TIT2", "hi"), ("TALB", long_val)], footer=True)
    assert parse_id3_frames(tag) == [("TIT2", "hi"), ("TALB", long_val)]
    # v2.3-only parser rejects by name
    with pytest.raises(ValueError, match="v2.4"):
        parse_id3v23_frames(tag)
    # footer + padding is spec-forbidden
    with pytest.raises(ValueError, match="padding"):
        encode_id3v24([("TIT2", "x")], padding=3, footer=True)
    # a corrupted footer mirror is detected
    bad = bytearray(tag)
    bad[-10] ^= 0xFF
    with pytest.raises(ValueError, match="footer"):
        parse_id3_frames(bytes(bad))
    # the audio walk skips header + body + footer
    data = synth_mp3_tagged24(6)  # clen 6: footer present (6 % 3 == 0)
    assert parse_mp3(data).n_frames == 6 % 5 + 2


def test_id3v24_parser_rejects_padding_with_footer():
    import pytest

    from redskins_rule_spark.functions.mp3 import (
        encode_id3v24,
        parse_id3_frames,
    )

    # hand-splice padding into a footered tag (the encoder refuses to
    # build one, so corrupt a legal tag): grow the declared body size
    # by 3 and insert 3 zero bytes between body and footer
    tag = bytearray(encode_id3v24([("TIT2", "x")], footer=True))
    body_end = len(tag) - 10
    n = ((tag[6] << 21) | (tag[7] << 14) | (tag[8] << 7) | tag[9]) + 3
    sync = bytes(
        [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
    )
    tag[6:10] = sync
    footer = bytearray(tag[body_end:])
    footer[6:10] = sync  # footer mirrors the (now padded) header
    bad = bytes(tag[:body_end]) + b"\x00\x00\x00" + bytes(footer)
    with pytest.raises(ValueError, match="padding"):
        parse_id3_frames(bad)


def test_id3v24_duplicate_frame_ids_counted_and_first_wins(spark):
    from redskins_rule_spark.functions.mp3 import encode_id3v24, encode_mp3
    from redskins_rule_spark.operators.multimodal import decode_id3v24_stats

    # v2.4 permits repeated frame IDs (e.g. multiple TXXX): the stats
    # op must count OCCURRENCES and pin the FIRST text value
    tag = encode_id3v24(
        [("TIT2", "first"), ("TXXX", "a"), ("TXXX", "b"), ("TIT2", "second")]
    )
    payload = tag + encode_mp3([(9, 0, 0, 0xAA)])
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id INT, payload BINARY")
    row = decode_id3v24_stats(df, "payload", "doc_id").collect()[0]
    assert row.n_tag_frames == 4
    assert row.title == "first"
    assert row.n_audio_frames == 1


def test_id3v24_utf8_text_decodes():
    from redskins_rule_spark.functions.mp3 import encode_id3v24, parse_id3_frames

    tag = encode_id3v24([("TIT2", "naïve — ünïcödé")])
    assert parse_id3_frames(tag) == [("TIT2", "naïve — ünïcödé")]


def test_id3v24_nonsyncsafe_frame_size_raises():
    import struct

    import pytest

    from redskins_rule_spark.functions.mp3 import parse_id3_frames

    # hand-build a v2.4 tag whose frame size byte has bit 7 set
    body = b"TIT2" + bytes([0, 0, 0x81, 0]) + b"\x00\x00" + b"\x03x"
    n = len(body)
    head = b"ID3" + bytes([4, 0, 0]) + bytes(
        [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
    )
    with pytest.raises(ValueError, match="syncsafe"):
        parse_id3_frames(head + body)


# --- q220: BI_RLE8 compressed BMP ---


def test_bmp_rle8_roundtrip_and_compression():
    import numpy as np

    from redskins_rule_spark.functions.bmp import (
        decode_bmp_rle8,
        encode_bmp_rle8,
        synth_gray_rle,
    )

    for clen in (0, 1, 17, 64, 150):
        img = synth_gray_rle(clen)
        assert np.array_equal(decode_bmp_rle8(encode_bmp_rle8(img)), img)
    # run-heavy content genuinely compresses
    flat = np.full((32, 64), 7, dtype=np.uint8)
    assert len(encode_bmp_rle8(flat)) < 54 + 1024 + 32 * 64 // 4


def test_bmp_rle8_delta_escape_skips_pixels():
    import numpy as np

    from redskins_rule_spark.functions.bmp import decode_bmp_rle8, encode_bmp_rle8

    base = encode_bmp_rle8(np.zeros((2, 4), dtype=np.uint8))
    hdr = base[: 54 + 1024]
    # bottom row: run (2,9); delta +1,+1; top row x=3: run (1,5)
    body = bytes((2, 9)) + b"\x00\x02\x01\x01" + bytes((1, 5)) + b"\x00\x00\x00\x01"
    img = decode_bmp_rle8(hdr + body)
    assert img.tolist() == [[0, 0, 0, 5], [9, 9, 0, 0]]


def test_bmp_rle8_corruption_raises_valueerror():
    import numpy as np

    import pytest

    from redskins_rule_spark.functions.bmp import (
        decode_bmp,
        decode_bmp_rle8,
        encode_bmp_rle8,
        synth_gray_rle,
    )

    data = encode_bmp_rle8(synth_gray_rle(23))
    for cut in range(2, len(data), 13):
        try:
            decode_bmp_rle8(data[:cut])
        except ValueError:
            pass
    # a run overrunning the row width is rejected
    hdr = encode_bmp_rle8(np.zeros((1, 4), dtype=np.uint8))[: 54 + 1024]
    with pytest.raises(ValueError, match="overruns"):
        decode_bmp_rle8(hdr + bytes((6, 1)) + b"\x00\x00\x00\x01")
    # trailing bytes after EOF are rejected
    with pytest.raises(ValueError, match="trailing"):
        decode_bmp_rle8(data + b"\x00")
    # the uncompressed decoder keeps rejecting RLE8 payloads
    with pytest.raises(ValueError, match="compression"):
        decode_bmp(data)


# --- q222: CAVLC residual decode (nC >= 8 FLC profile) ---


def _i16dc_mbs(levels_list):
    """One MB row alternating (I_PCM, i16dc) for each levels tuple."""
    y16 = bytes((i % 255) + 1 for i in range(256))
    c8 = bytes((i % 255) + 1 for i in range(64))
    mbs = []
    for lv in levels_list:
        mbs.append(("pcm", (y16, c8, c8)))
        mbs.append(("i16dc", lv))
    return mbs, 2 * len(levels_list), 1


def test_avc_cavlc_roundtrip_all_trailing_one_counts():
    """Every TrailingOnes count 0..3, both signs, and the adaptive
    suffixLength ladder survive encode -> decode bit-exactly."""
    from redskins_rule_spark.functions.avc import (
        decode_avc_i16dc,
        encode_avc_i16dc,
    )

    cases = [
        tuple([3, -2, 4, -3, 2, 2, -4, 3, 2, -2, 3, 4, -2, 2, 3, -2]),  # t1=0
        tuple([2] * 15 + [1]),                                          # t1=1
        tuple([-3] * 14 + [1, -1]),                                     # t1=2
        tuple([4, -4, 3, 2, -2, 2, 3, -3, 2, 2, -2, 3, 2, -1, 1, 1]),   # t1=3
        tuple([2] * 12 + [1, -1, 1, -1]),  # 4 trailing ones -> t1 capped at 3
        tuple([-13, 12, -11, 10, -9, 8, -7, 6, -5, 4, -3, 2, -2, 3, -4, 5]),
    ]
    for lv in cases:
        mbs, w, h = _i16dc_mbs([lv])
        f = decode_avc_i16dc(encode_avc_i16dc(mbs, w, h))
        assert f.mbs[1].dc_levels == lv, lv


def test_avc_cavlc_decoder_handles_escape_prefix_sizes():
    """level_prefix 14 (suffixLength 0), 15, and 16 take special
    suffix sizes (§9.2.2.1) the encoder never emits — hand-build the
    bitstream and check the decoded magnitudes."""
    from redskins_rule_spark.functions.avc import (
        _EgBits,
        _EgBitsOut,
        _read_cavlc_block16,
    )

    def decode_levels(write_levels):
        w = _EgBitsOut()
        write_levels(w)
        w.u(1, 1)  # stop bit so the buffer flushes
        if w._n:
            w.u(0, 8 - w._n)
        return _read_cavlc_block16(_EgBits(bytes(w.buf)), 16)

    # t1 = 3 starts suffixLength at 0: first level via prefix 14 ->
    # 4-bit suffix, levelCode = 14 + suffix
    def esc14(w):
        w.u(((16 - 1) << 2) | 3, 6)
        w.u(0b010, 3)              # signs: +1, -1, +1
        w.u(0, 14); w.u(1, 1); w.u(0b0000, 4)   # levelCode 14 -> level 8
        # suffixLength is now 2 (|8| > 3<<0 -> 1, then > 3<<1 -> 2)
        for _ in range(12):
            w.u(0, 1); w.u(1, 1); w.u(0b00, 2)  # levelCode 4 -> level 3
    lv = decode_levels(esc14)
    assert lv[15:12:-1] == (1, -1, 1) and lv[12] == 8
    assert all(v == 3 for v in lv[:12])

    # prefix 15 with suffixLength 0: 12-bit suffix, +15 adjustment
    def esc15(w):
        w.u(((16 - 1) << 2) | 3, 6)
        w.u(0b000, 3)
        w.u(0, 15); w.u(1, 1); w.u(1, 12)  # levelCode 15+1+15 = 31 -> -16
        for _ in range(12):
            w.u(0, 6); w.u(1, 1); w.u(0, 6)  # suffixLength jumped to 6
    lv = decode_levels(esc15)
    assert lv[12] == -16

    # prefix 16: levelCode += (1 << 13) - 4096 = 4096
    def esc16(w):
        w.u(((16 - 1) << 2) | 3, 6)
        w.u(0b000, 3)
        w.u(0, 16); w.u(1, 1); w.u(0, 13)  # code 15+0+15+4096 -> 2064
        for _ in range(12):
            w.u(0, 6); w.u(1, 1); w.u(0, 6)
    lv = decode_levels(esc16)
    assert lv[12] == 2064


def test_avc_cavlc_names_each_remaining_seam():
    import pytest

    from redskins_rule_spark.functions.avc import (
        decode_avc_i16dc,
        encode_avc_i16dc,
        encode_i16dc_slice,
        encode_nal_stream,
        encode_pps,
        encode_sps,
    )

    lv = tuple([2] * 16)
    # i16dc without an I_PCM neighbor -> nC < 8 VLC seam at encode
    with pytest.raises(ValueError, match="nC"):
        encode_i16dc_slice([("i16dc", lv)], 1, 1)
    # decoder: hand-build a slice whose first MB is i16dc (nC = 0)
    sps = encode_sps(66, 10, 0, 0, 0, 0, 1, 0, 1, 0, 1)
    pps = encode_pps(0, 0, 0)
    mbs, w, h = _i16dc_mbs([lv])
    good = encode_i16dc_slice(mbs, w, h)
    # swap macroblock order is not directly expressible; instead
    # check the partial-block seam: TotalCoeff < 16 raises by name
    from redskins_rule_spark.functions.avc import _EgBits, _read_cavlc_block16

    from redskins_rule_spark.functions.avc import _EgBitsOut

    wr = _EgBitsOut()
    wr.u(((4 - 1) << 2) | 0, 6)  # TotalCoeff 4
    wr.u(0, 2)
    with pytest.raises(ValueError, match="total_zeros"):
        _read_cavlc_block16(_EgBits(bytes(wr.buf)), 16)
    with pytest.raises(ValueError, match="nC"):
        _read_cavlc_block16(_EgBits(b"\x00\x00"), 0)
    # AC/chroma residual (cbp != 0) raises by name: mb_type 13 has
    # CodedBlockPatternLuma 15
    stream = bytearray(encode_avc_i16dc(mbs, w, h))
    assert decode_avc_i16dc(bytes(stream)).mbs[1].dc_levels == lv
    # CABAC PPS raises by name
    cab = encode_nal_stream(
        [(3, 7, sps), (3, 8, encode_pps(0, 0, 1)),
         (3, 5, good)]
    )
    with pytest.raises(ValueError, match="CABAC"):
        decode_avc_i16dc(cab)


def test_avc_cavlc_truncation_and_bitflip_sweeps():
    """Truncations raise ValueError; header-region bit flips either
    raise ValueError or decode to a frame — never IndexError."""
    from redskins_rule_spark.functions.avc import (
        decode_avc_i16dc,
        synth_avc_i16dc,
    )

    stream = synth_avc_i16dc(23)
    for cut in range(1, len(stream)):
        try:
            decode_avc_i16dc(stream[:cut])
        except ValueError:
            pass
    for pos in range(len(stream)):
        mutated = bytearray(stream)
        mutated[pos] ^= 0x5A
        try:
            decode_avc_i16dc(bytes(mutated))
        except ValueError:
            pass


def test_avc_cavlc_encoder_profile_gates():
    import pytest

    from redskins_rule_spark.functions.avc import _EgBitsOut, _write_cavlc_block16

    # a zero level is a partial block
    with pytest.raises(ValueError, match="nonzero"):
        _write_cavlc_block16(_EgBitsOut(), tuple([2] * 15 + [0]))
    # magnitudes needing prefix >= 14 are outside the encoder profile
    with pytest.raises(ValueError, match="escape"):
        _write_cavlc_block16(_EgBitsOut(), tuple([9999] + [2] * 15))


def test_avc_cavlc_hypothesis_roundtrip():
    """Random full blocks under the encoder profile roundtrip."""
    import random

    from redskins_rule_spark.functions.avc import (
        decode_avc_i16dc,
        encode_avc_i16dc,
    )

    rng = random.Random(222)
    for _ in range(60):
        t1 = rng.randint(0, 3)
        lv = []
        for k in range(16 - t1):
            lv.append(rng.choice([-1, 1]) * rng.randint(2, 7))
        for _k in range(t1):
            lv.append(rng.choice([-1, 1]))
        lv = tuple(lv)
        mbs, w, h = _i16dc_mbs([lv])
        f = decode_avc_i16dc(encode_avc_i16dc(mbs, w, h))
        assert f.mbs[1].dc_levels == lv


# --- q223: bit-reservoir main_data reassembly (§2.4.1.7) ---


def test_mp3_reservoir_content_equals_contiguous():
    """Same granule content through both transports: the reservoir
    stream must decode to byte-for-byte the q210 values, and the
    fixture must genuinely exercise nonzero main_data_begin."""
    from redskins_rule_spark.functions.mp3 import (
        parse_mp3_granules,
        parse_mp3_reservoir,
        synth_mp3_count1,
        synth_mp3_reservoir,
    )

    nonzero = 0
    for clen in (0, 1, 7, 23, 64, 99, 150, 251):
        res = parse_mp3_reservoir(synth_mp3_reservoir(clen),
                                  decode_count1=True)
        ref = parse_mp3_granules(synth_mp3_count1(clen), decode_count1=True)
        assert len(res) == len(ref)
        for a, b in zip(res, ref):
            assert a.scfsi == b.scfsi
            for ga, gb in zip(a.granules, b.granules):
                assert ga.count1 == gb.count1
                assert ga.scalefactors == gb.scalefactors
        nonzero += sum(1 for f in res if f.main_data_begin > 0)
    assert nonzero > 10  # the reservoir path is really taken
    # a contiguous stream is the begin == 0 special case
    assert parse_mp3_reservoir(synth_mp3_count1(23), decode_count1=True)


def test_mp3_reservoir_spill_across_frame_boundary():
    """Force main data to START in frame n-1's area and FINISH in
    frame n's — the exact cross-boundary case contiguity-assuming
    readers break on."""
    from redskins_rule_spark.functions.mp3 import (
        _count1_frame_dicts,
        encode_mp3_reservoir,
        parse_mp3_reservoir,
    )

    frames = _count1_frame_dicts(23)[:2]
    # frame 1 reaches back 30 bytes into frame 0's area
    stream = encode_mp3_reservoir(frames, 14, 2, [0, 30])
    out = parse_mp3_reservoir(stream, decode_count1=True)
    assert out[1].main_data_begin == 30
    assert out[1].granules[0].count1 == tuple(
        tuple(q) for q in frames[1]["g0"]["count1"]
    )


def test_mp3_reservoir_layout_gates():
    import pytest

    from redskins_rule_spark.functions.mp3 import (
        _count1_frame_dicts,
        encode_mp3_reservoir,
        parse_mp3_granules,
        parse_mp3_reservoir,
        synth_mp3_reservoir,
    )

    frames = _count1_frame_dicts(23)[:2]
    # encoder: begin reaching before the stream start
    with pytest.raises(ValueError, match="before the stream start"):
        encode_mp3_reservoir(frames, 14, 2, [1, 0])
    # encoder: overlap with the previous frame's main data — needs a
    # low bitrate so cap (123 bytes at 32 kbps) is inside the 9-bit
    # begin range
    with pytest.raises(ValueError, match="overlaps"):
        encode_mp3_reservoir(frames, 1, 2, [0, 123])
    # encoder: 9-bit range
    with pytest.raises(ValueError, match="9-bit"):
        encode_mp3_reservoir(frames, 14, 2, [0, 512])
    # the contiguous parser still raises on reservoir streams, now
    # pointing at the implementation instead of a seam
    with pytest.raises(ValueError, match="parse_mp3_reservoir"):
        parse_mp3_granules(synth_mp3_reservoir(23), decode_count1=True)
    # decoder: corrupt frame 1's begin field (first 9 bits after the
    # 4-byte header) to reach back past the start of the stream
    stream = bytearray(encode_mp3_reservoir(frames, 1, 2, [0, 30]))
    flen = 144 * 32 // 32
    stream[flen + 4] = 0xFF  # begin -> 511 > frame 1's 123-byte offset
    stream[flen + 5] |= 0x80
    with pytest.raises(ValueError, match="before the stream start"):
        parse_mp3_reservoir(bytes(stream), decode_count1=True)


def test_mp3_reservoir_truncation_and_bitflip_sweeps():
    from redskins_rule_spark.functions.mp3 import (
        parse_mp3_reservoir,
        synth_mp3_reservoir,
    )

    stream = synth_mp3_reservoir(47)
    for cut in range(1, min(len(stream), 400)):
        try:
            parse_mp3_reservoir(stream[:cut], decode_count1=True)
        except ValueError:
            pass
    for pos in range(0, len(stream), 7):
        mutated = bytearray(stream)
        mutated[pos] ^= 0x5A
        try:
            parse_mp3_reservoir(bytes(mutated), decode_count1=True)
        except ValueError:
            pass


# --- q224: AAC EIGHT_SHORT_SEQUENCE window grouping ---


def test_aac_short_window_grouping_roundtrip():
    """Every grouping pattern boundary: 0x7F (one group), 0x00
    (eight groups), alternating; 3-bit escape runs; long path
    untouched."""
    from redskins_rule_spark.functions.aac import (
        encode_aac_silent_block,
        parse_aac_silent_block,
    )

    for grouping, n_groups in ((0x7F, 1), (0x00, 8), (0b0101010, 5)):
        block = encode_aac_silent_block(
            [{"instance_tag": 3, "global_gain": 77, "window_shape": 1,
              "window_sequence": 2, "max_sfb": 13, "grouping": grouping,
              "n_sections": 1}]
        )
        (sce,) = parse_aac_silent_block(block)
        assert sce.window_sequence == 2
        assert sce.grouping == grouping
        assert sce.n_groups == n_groups
        # one 13-band zero run per group; 13 >= 7 exercises the 3-bit
        # escape (7 + 6)
        assert sce.sections == tuple([(0, 13)] * n_groups)


def test_aac_short_window_gates_and_sweeps():
    import pytest

    from redskins_rule_spark.functions.aac import (
        encode_aac_silent_block,
        parse_aac_silent_block,
        parse_adts,
        synth_adts_short,
    )

    # 4-bit max_sfb bound enforced at encode
    with pytest.raises(ValueError, match="4-bit"):
        encode_aac_silent_block(
            [{"instance_tag": 0, "global_gain": 0, "window_shape": 0,
              "window_sequence": 2, "max_sfb": 16, "grouping": 0,
              "n_sections": 1}]
        )
    # nonzero codebook in a short-window group still names the seam
    block = bytearray(encode_aac_silent_block(
        [{"instance_tag": 0, "global_gain": 0, "window_shape": 0,
          "window_sequence": 2, "max_sfb": 2, "grouping": 0x7F,
          "n_sections": 1}]
    ))
    # sect_cb is the 4 bits right after ics_info: flip one of them
    # via brute force — find a mutation that raises the codebook seam
    seam_hit = False
    for pos in range(len(block)):
        for bit in range(8):
            m = bytearray(block)
            m[pos] ^= 1 << bit
            try:
                parse_aac_silent_block(bytes(m))
            except ValueError as e:
                if "codebook seam" in str(e):
                    seam_hit = True
    assert seam_hit
    # truncation sweep on the full ADTS stream
    stream = synth_adts_short(61)
    for cut in range(1, len(stream)):
        try:
            parse_adts(stream[:cut])
        except ValueError:
            pass


# --- q225: FLAC (real lossless decode, zero carried spec tables) ---

def test_flac_roundtrip_every_subframe_type_and_partition_order():
    from redskins_rule_spark.functions.flac import (
        VERBATIM_CODE,
        encode_flac,
        parse_flac,
    )

    samples = [((31 * k * k + 5 * k) % 4096) - 2048 for k in range(32)]
    for code in [0, 1, 2, 3, 4, VERBATIM_CODE]:
        for po in ([0, 1] if code != VERBATIM_CODE else [0]):
            data = encode_flac(
                [{"samples": samples, "code": code, "po": po}],
                sample_rate=8000,
            )
            st = parse_flac(data)
            assert st.md5_ok
            assert st.frames[0].subframe_code == code
            assert list(st.frames[0].samples) == samples


def test_flac_md5_is_a_real_losslessness_proof():
    from redskins_rule_spark.functions.flac import encode_flac, parse_flac

    samples = list(range(-16, 16))
    data = bytearray(
        encode_flac([{"samples": samples, "code": 2, "po": 0}])
    )
    assert parse_flac(bytes(data)).md5_ok
    # corrupt one MD5 byte inside STREAMINFO (offset: 4 magic + 4
    # block header + 18 fixed fields) — decode still succeeds, but
    # the proof must FAIL rather than be assumed
    data[4 + 4 + 18] ^= 0xFF
    assert not parse_flac(bytes(data)).md5_ok


def test_flac_escape_partitions_and_short_last_frame():
    from redskins_rule_spark.functions.flac import parse_flac, synth_flac

    # clen % 16 == 0 amplifies frame 0: order-4 residual zigzags pass
    # 2^15 and the encoder must take the 0b1111 raw-escape path
    st = parse_flac(synth_flac(64))  # (64+0)%6 = 4 -> FIXED order 4
    assert st.frames[0].n_escapes >= 1
    assert st.md5_ok
    # short last frame: total = 33+clen%71; FIXED drops to order 0
    st2 = parse_flac(synth_flac(7))  # total 40 -> frames 32 + 8
    assert [fr.blocksize for fr in st2.frames] == [32, 8]
    assert st2.frames[-1].subframe_code == 0
    assert st2.md5_ok


def test_flac_crc_and_structure_gates():
    import pytest

    from redskins_rule_spark.functions.flac import (
        crc8,
        crc16,
        parse_flac,
        synth_flac,
    )

    # CRC spot values (RFC 9639 polys, init 0): crc8 of empty is 0,
    # and both are linear-feedback consistent with one-byte inputs
    assert crc8(b"") == 0 and crc16(b"") == 0
    assert crc8(bytes([0x01])) == 0x07
    assert crc16(bytes([0x01])) == 0x8005

    data = bytearray(synth_flac(11))
    # flip one bit inside the LAST frame's byte range: either the
    # frame CRC-16, the header CRC-8, subframe decode, or the MD5
    # proof must catch it — never a silent pass
    caught = 0
    for bit in range(8 * (len(data) - 20), 8 * len(data)):
        mutated = bytearray(data)
        mutated[bit // 8] ^= 1 << (7 - bit % 8)
        try:
            st = parse_flac(bytes(mutated))
            if not st.md5_ok:
                caught += 1
        except ValueError:
            caught += 1
    assert caught == 8 * 20  # every flip detected

    with pytest.raises(ValueError, match="fLaC"):
        parse_flac(b"OggS" + bytes(synth_flac(3))[4:])
    with pytest.raises(ValueError, match="truncated"):
        parse_flac(bytes(synth_flac(3))[:20])


def test_flac_reserved_subframe_type_raises_by_name():
    import pytest

    from redskins_rule_spark.functions import flac as flacmod

    # hand-poison the subframe type to a reserved value (000010 -
    # 000111): the decoder must name the defect, not misparse
    samples = [0] * 16
    data = bytearray(
        flacmod.encode_flac([{"samples": samples, "code": 0, "po": 0}])
    )
    st = flacmod.parse_flac(bytes(data))
    assert st.frames[0].subframe_code == 0
    # locate the subframe header byte: frame starts at 42; header is
    # 4 bytes fixed + 1 utf8 + 1 blocksize + 1 crc8 = 7 bytes
    sub_at = 42 + 7
    mutated = bytearray(data)
    mutated[sub_at] = (mutated[sub_at] & 0x01) | (0b0000010 << 1)
    with pytest.raises(ValueError, match="reserved subframe"):
        flacmod.parse_flac(bytes(mutated))


def test_flac_lpc_roundtrip_and_negative_shift_gate():
    import pytest

    from redskins_rule_spark.functions import flac as flacmod

    samples = [((13 * k * k + 3 * k) % 4096) - 2048 for k in range(64)]
    for order, shift in [(1, 5), (2, 10), (3, 12), (8, 14), (32, 15)]:
        coeffs = [((7 * j + 5) % 2048) - 1024 for j in range(order)]
        data = flacmod.encode_flac(
            [{"samples": samples, "code": 0, "po": 0,
              "lpc": {"order": order, "precision": 12, "shift": shift,
                      "coeffs": coeffs}}]
        )
        st = flacmod.parse_flac(data)
        assert st.frames[0].subframe_code == flacmod.LPC_CODE_BASE + order
        assert list(st.frames[0].samples) == samples
        assert st.md5_ok
    # the arithmetic-shift semantics pin: a negative prediction sum
    # must floor (Python >> is arithmetic), not truncate toward zero
    assert flacmod._lpc_predict([5], (-3,), 1) == -8  # -15 >> 1
    # encoder-side profile gates
    with pytest.raises(ValueError, match="precision"):
        flacmod.encode_flac(
            [{"samples": samples, "code": 0, "po": 0,
              "lpc": {"order": 1, "precision": 1, "shift": 0,
                      "coeffs": [0]}}]
        )
    with pytest.raises(ValueError, match="coefficient exceeds"):
        flacmod.encode_flac(
            [{"samples": samples, "code": 0, "po": 0,
              "lpc": {"order": 1, "precision": 4, "shift": 0,
                      "coeffs": [8]}}]
        )


def test_flac_lpc_synth_closed_forms_and_escape_face():
    from redskins_rule_spark.functions.flac import (
        parse_flac,
        synth_flac_lpc,
        synth_samples,
    )

    for clen in [1, 2, 16, 32, 33, 48, 71, 97, 160]:
        st = parse_flac(synth_flac_lpc(clen))
        total = 33 + clen % 71
        assert st.total_samples == total
        got = [s for fr in st.frames for s in fr.samples]
        assert got == synth_samples(clen, total)
        assert st.md5_ok
        nf = len(st.frames)
        for f, fr in enumerate(st.frames):
            if fr.blocksize == 32:
                assert fr.subframe_code == 8 + (clen + f) % 3 + 1
            elif fr.blocksize >= 2:
                assert fr.subframe_code == 9  # LPC order 1
            else:
                assert fr.subframe_code == 5  # VERBATIM
    # the shift-2 face forces raw-escape partitions through LPC
    st = parse_flac(synth_flac_lpc(16))
    assert st.frames[0].n_escapes >= 1


def test_flac_synth_closed_forms_match_oracle_formulas():
    from redskins_rule_spark.functions.flac import (
        parse_flac,
        synth_flac,
        synth_samples,
    )

    for clen in [1, 5, 16, 33, 47, 64, 71, 100, 160, 233]:
        st = parse_flac(synth_flac(clen))
        total = 33 + clen % 71
        assert st.total_samples == total
        assert len(st.frames) == (total + 31) // 32
        assert st.sample_rate == 8000 + 100 * (clen % 5)
        expect = synth_samples(clen, total)
        if clen % 16 == 0:
            for k in range(32):
                expect[k] *= 8
        got = [s for fr in st.frames for s in fr.samples]
        assert got == expect
        assert st.md5_ok
        # the oracle's frame-code replay
        nf = len(st.frames)
        for f, fr in enumerate(st.frames):
            code = (clen + f) % 6
            full = f < nf - 1 or total % 32 == 0
            if not full and code != 5:
                code = 0
            assert fr.subframe_code == code


def test_flac_stereo_all_modes_roundtrip_and_md5():
    from redskins_rule_spark.functions.flac import (
        STEREO_MODES,
        encode_flac_stereo,
        parse_flac_stereo,
    )

    left = [((13 * k * k + 3 * k) % 4096) - 2048 for k in range(32)]
    right = [((7 * k * k + 11 * k) % 4096) - 2048 for k in range(32)]
    for mode in STEREO_MODES:
        for code in [0, 2, 4]:
            data = encode_flac_stereo(
                [{"left": left, "right": right, "mode": mode,
                  "code": code, "po": 1}]
            )
            st = parse_flac_stereo(data)
            assert st.frames[0].mode == mode
            assert list(st.frames[0].left) == left
            assert list(st.frames[0].right) == right
            assert st.md5_ok


def test_flac_stereo_mid_side_parity_recovery():
    from redskins_rule_spark.functions.flac import (
        encode_flac_stereo,
        parse_flac_stereo,
    )

    # odd l+r sums: the floor-average mid drops a bit that ONLY the
    # side channel's parity can restore — every combination of signs
    # and parities
    pairs = [(3, 2), (-3, 2), (3, -2), (-3, -2), (0, 1), (1, 0),
             (-1, 0), (0, -1), (32767, -32768), (-32768, 32767)]
    left = [p[0] for p in pairs] * 2
    right = [p[1] for p in pairs] * 2
    data = encode_flac_stereo(
        [{"left": left, "right": right, "mode": "MS", "code": 0,
          "po": 0}]
    )
    st = parse_flac_stereo(data)
    assert list(st.frames[0].left) == left
    assert list(st.frames[0].right) == right
    assert st.md5_ok


def test_flac_stereo_side_channel_needs_extra_bit():
    from redskins_rule_spark.functions.flac import (
        encode_flac_stereo,
        parse_flac_stereo,
    )

    # side = l - r = 65535 overflows 16 bits; the bps+1 side width
    # must carry it in LS, RS, and MS
    left = [32767] * 8
    right = [-32768] * 8
    for mode in ("LS", "RS", "MS"):
        st = parse_flac_stereo(
            encode_flac_stereo(
                [{"left": left, "right": right, "mode": mode,
                  "code": 0, "po": 0}]
            )
        )
        assert list(st.frames[0].left) == left
        assert list(st.frames[0].right) == right
        assert st.md5_ok


def test_flac_stereo_synth_closed_forms():
    from redskins_rule_spark.functions.flac import (
        STEREO_MODES,
        parse_flac_stereo,
        synth_flac_stereo,
        synth_right,
        synth_samples,
    )

    for clen in [1, 4, 16, 33, 64, 71, 128, 200]:
        st = parse_flac_stereo(synth_flac_stereo(clen))
        total = 33 + clen % 71
        assert st.total_samples == total
        assert [s for fr in st.frames for s in fr.left] == \
            synth_samples(clen, total)
        assert [s for fr in st.frames for s in fr.right] == \
            synth_right(clen, total)
        assert st.md5_ok
        for f, fr in enumerate(st.frames):
            assert fr.mode == STEREO_MODES[(clen + f) % 4]


def test_flac_stereo_bitflip_sweep_always_detected():
    from redskins_rule_spark.functions.flac import (
        parse_flac_stereo,
        synth_flac_stereo,
    )

    data = bytearray(synth_flac_stereo(23))
    caught = 0
    n_bits = 8 * 24
    for bit in range(8 * (len(data) - 24), 8 * len(data)):
        mutated = bytearray(data)
        mutated[bit // 8] ^= 1 << (7 - bit % 8)
        try:
            st = parse_flac_stereo(bytes(mutated))
            if not st.md5_ok:
                caught += 1
        except ValueError:
            caught += 1
    assert caught == n_bits


# --- baseline TIFF (strips + PackBits, both byte orders) --------------------

import struct  # noqa: E402

import numpy as np  # noqa: E402

from redskins_rule_spark.functions.tiff import (  # noqa: E402
    COMP_NONE,
    COMP_PACKBITS,
    decode_tiff,
    decode_tiff_meta,
    encode_tiff,
    packbits_decode,
    packbits_encode_row,
    synth_gray_tiff,
    synth_tiff,
)


def test_tiff_roundtrip_both_endians_both_compressions():
    px = synth_gray_tiff(37)
    for be in (False, True):
        for comp in (COMP_NONE, COMP_PACKBITS):
            for rps in (1, 2, 3, 100):
                data = encode_tiff(
                    px, big_endian=be, compression=comp, rows_per_strip=rps
                )
                meta = decode_tiff_meta(data)
                assert meta["big_endian"] is be
                assert meta["compression"] == comp
                assert meta["rows_per_strip"] == rps
                exp_strips = (px.shape[0] + rps - 1) // rps
                assert len(meta["strip_offsets"]) == exp_strips
                assert np.array_equal(decode_tiff(data), px)


def test_tiff_packbits_exercises_both_packet_kinds():
    # row 0 of the synth content plateaus (run packets); row 1 steps
    # by 7 (literal packets) — assert the packet mix really happens
    px = synth_gray_tiff(50)
    run_row = packbits_encode_row(px[0].tobytes())
    lit_row = packbits_encode_row(px[1].tobytes())
    assert any(b > 128 for b in run_row)  # at least one run packet
    assert all(b <= 127 or b == 129 + 255 for b in lit_row[:1])
    assert lit_row[0] == px.shape[1] - 1  # one max-width literal packet
    # 128-cap on long runs and literals
    long_run = bytes([9] * 300)
    assert packbits_decode(packbits_encode_row(long_run), 300, 1) == long_run
    long_lit = bytes(range(256)) * 2  # no adjacent repeats within rows? has
    long_lit = bytes(i % 251 for i in range(300))
    assert packbits_decode(packbits_encode_row(long_lit), 300, 1) == long_lit


def test_tiff_packbits_row_boundary_rule_enforced():
    # a run packet spilling into the next row must be rejected even
    # though a naive expander would happily emit the bytes
    with pytest.raises(ValueError, match="row boundary"):
        packbits_decode(bytes([257 - 4, 5]), 3, 2)
    # literal packet crossing rows
    with pytest.raises(ValueError, match="row boundary"):
        packbits_decode(bytes([3]) + bytes(4), 3, 2)
    # data past the final row
    ok_row = packbits_encode_row(bytes([1, 2, 3]))
    with pytest.raises(ValueError, match="past final row"):
        packbits_decode(ok_row + ok_row, 3, 1)
    # 0x80 no-op is skipped
    assert packbits_decode(bytes([128]) + ok_row, 3, 1) == bytes([1, 2, 3])


def test_tiff_ifd_gates():
    data = synth_tiff(23)
    # bad byte order / magic
    with pytest.raises(ValueError, match="byte order"):
        decode_tiff_meta(b"XX" + data[2:])
    with pytest.raises(ValueError, match="magic"):
        decode_tiff_meta(data[:2] + b"\x00\x00" + data[4:])
    # truncation sweep: every prefix must raise, never mis-decode
    for cut in range(0, len(data) - 1, 7):
        with pytest.raises(ValueError):
            decode_tiff(data[:cut])


def test_tiff_ascending_tag_order_enforced():
    # hand-swap two IFD entries in a little-endian payload: the walk
    # must reject the directory rather than silently accept it
    px = synth_gray_tiff(3)
    data = bytearray(encode_tiff(px, big_endian=False))
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    e0 = ifd_off + 2
    first = bytes(data[e0 : e0 + 12])
    second = bytes(data[e0 + 12 : e0 + 24])
    data[e0 : e0 + 12] = second
    data[e0 + 12 : e0 + 24] = first
    with pytest.raises(ValueError, match="ascending"):
        decode_tiff_meta(bytes(data))


def test_tiff_stats_op_matches_closed_forms(spark):
    from redskins_rule_spark.operators.multimodal import (
        decode_tiff_stats,
        with_tiff_payload,
    )

    docs = spark.createDataFrame(
        [(1, "x" * 9), (2, "y" * 25), (3, None), (4, "z" * 40)],
        "doc_id int, text string",
    )
    payloads = with_tiff_payload(docs.where("text is not null"), "text")
    got = {r["doc_id"]: r for r in decode_tiff_stats(payloads).collect()}
    for doc_id, clen in ((1, 9), (2, 25), (4, 40)):
        px = synth_gray_tiff(clen)
        v = px.reshape(-1).astype(np.int64)
        wts = 1 + (np.arange(v.size, dtype=np.int64) % 97)
        r = got[doc_id]
        assert (r["width"], r["height"]) == (px.shape[1], px.shape[0])
        assert r["pixel_fp"] == int((v * wts).sum() % 2147483647)
        assert r["big_endian"] == (clen % 2 == 1)
        assert r["compressed"] == (clen % 3 != 0)
        rps = clen % 3 + 1
        assert r["n_strips"] == (px.shape[0] + rps - 1) // rps


# --- G.711 mu-law / A-law (WAV fmt 7 / 6) ------------------------------------

from redskins_rule_spark.functions.wav import (  # noqa: E402
    alaw2linear,
    decode_wav_g711,
    encode_wav_g711,
    linear2alaw,
    linear2ulaw,
    synth_g711_samples,
    synth_wav_g711,
    ulaw2linear,
)


def test_g711_encode_decode_identity_on_all_codes():
    # encode(decode(c)) == c for every 8-bit code — with the one true
    # exception mu-law carries: 0x7F is "negative zero", decoding to
    # 0, which re-encodes as +0 (0xFF). Real G.711 has two zero codes.
    for c in range(256):
        assert linear2alaw(alaw2linear(c)) == c
        if c == 0x7F:
            assert ulaw2linear(c) == 0
            assert linear2ulaw(0) == 0xFF
        else:
            assert linear2ulaw(ulaw2linear(c)) == c


def test_g711_error_bounds_are_the_textbook_values():
    worst_u = max(abs(s - ulaw2linear(linear2ulaw(s)))
                  for s in range(-32768, 32768, 17))
    worst_a = max(abs(s - alaw2linear(linear2alaw(s)))
                  for s in range(-32768, 32768, 17))
    assert worst_u <= 644 and worst_a <= 512
    # quantization must be monotone: decode values ordered by code
    # magnitude within each sign
    pos_u = [ulaw2linear(c) for c in range(0xFF, 0x7F, -1)]
    assert pos_u == sorted(pos_u)


def test_g711_wav_container_roundtrip_both_laws():
    for clen in (2, 7, 40, 99):
        law, sr, codes, recon = decode_wav_g711(synth_wav_g711(clen))
        src = synth_g711_samples(clen)
        assert law == ("ulaw" if clen % 2 == 0 else "alaw")
        assert sr == 8000 + 8000 * (clen % 2)
        enc = linear2ulaw if law == "ulaw" else linear2alaw
        dec = ulaw2linear if law == "ulaw" else alaw2linear
        assert codes == [enc(s) for s in src]
        assert recon == [dec(c) for c in codes]


def test_g711_container_gates():
    data = synth_wav_g711(10)
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav_g711(b"JUNK" + data[4:])
    # PCM16 WAV must be rejected by the G.711 decoder
    from redskins_rule_spark.functions.wav import encode_wav

    with pytest.raises(ValueError, match="fmt tag"):
        decode_wav_g711(encode_wav([0, 1, 2], 8000))
    with pytest.raises(ValueError, match="past EOF"):
        decode_wav_g711(data[: len(data) - 20])
    # header + complete fmt chunk, data chunk absent entirely
    with pytest.raises(ValueError, match="no data chunk"):
        decode_wav_g711(data[:36])


def test_g711_stats_op_matches_closed_forms(spark):
    from redskins_rule_spark.operators.multimodal import (
        decode_wav_g711_stats,
        with_wav_g711_payload,
    )

    docs = spark.createDataFrame(
        [(1, "x" * 10), (2, "y" * 33)], "doc_id int, text string"
    )
    payloads = with_wav_g711_payload(docs, "text")
    got = {r["doc_id"]: r for r in decode_wav_g711_stats(payloads).collect()}
    for doc_id, clen in ((1, 10), (2, 33)):
        src = synth_g711_samples(clen)
        law = "ulaw" if clen % 2 == 0 else "alaw"
        enc = linear2ulaw if law == "ulaw" else linear2alaw
        dec = ulaw2linear if law == "ulaw" else alaw2linear
        codes = [enc(s) for s in src]
        recon = [dec(c) for c in codes]
        r = got[doc_id]
        assert r["law"] == law and r["n_samples"] == len(src)
        assert r["code_fp"] == sum((k + 1) * c for k, c in enumerate(codes))
        assert r["recon_sum"] == sum(recon)
        assert r["recon_fp"] == sum((k + 1) * v for k, v in enumerate(recon))


# --- QOI ("Quite OK Image", 2021) --------------------------------------------

from redskins_rule_spark.functions.qoi import (  # noqa: E402
    decode_qoi,
    encode_qoi,
    synth_qoi,
    synth_qoi_pixels,
)


def test_qoi_synth_roundtrip_and_closed_form_layout():
    for clen in (1, 9, 25, 77, 128):
        px = synth_qoi_pixels(clen)
        data = synth_qoi(clen)
        d = decode_qoi(data)
        assert [p[:3] for p in d["pixels"]] == px
        nc = clen % 13 + 3
        c = d["op_counts"]
        assert (c["rgb"], c["run"], c["diff"], c["luma"]) == (nc,) * 4
        assert c["index"] == 0 and c["rgba"] == 0
        assert len(data) == 14 + 8 * nc + 8


def test_qoi_index_op_roundtrips():
    # revisit of a table-live pixel must encode as 1-byte INDEX and
    # decode back exactly
    pxs = [(10, 20, 30), (50, 60, 70), (10, 20, 30)]
    enc = encode_qoi(pxs, 3, 1, use_index=True)
    d = decode_qoi(enc)
    assert [p[:3] for p in d["pixels"]] == pxs
    assert d["op_counts"]["index"] == 1
    # the no-index encoder spends an RGB chunk on the same revisit
    enc2 = encode_qoi(pxs, 3, 1, use_index=False)
    assert len(enc2) > len(enc)
    assert [p[:3] for p in decode_qoi(enc2)["pixels"]] == pxs


def test_qoi_long_runs_split_at_62():
    pxs = [(5, 5, 5)] * 200
    d = decode_qoi(encode_qoi(pxs, 200, 1))
    assert [p[:3] for p in d["pixels"]] == pxs
    # 199 repeats after the first pixel: 62+62+62+13 -> 4 run chunks
    assert d["op_counts"]["run"] == 4


def test_qoi_wrapping_diffs():
    # channel wrap: 255 -> 0 is dr = +1 (mod 256), a DIFF not an RGB
    pxs = [(255, 255, 255), (0, 0, 0)]
    enc = encode_qoi(pxs, 2, 1)
    d = decode_qoi(enc)
    assert [p[:3] for p in d["pixels"]] == pxs
    assert d["op_counts"]["diff"] >= 1


def test_qoi_gates():
    data = synth_qoi(23)
    with pytest.raises(ValueError, match="not a QOI"):
        decode_qoi(b"XXXX" + data[4:])
    with pytest.raises(ValueError, match="end marker"):
        decode_qoi(data[:-1])
    # truncation sweep: any prefix must raise, never mis-decode
    for cut in range(14, len(data) - 1, 3):
        with pytest.raises(ValueError):
            decode_qoi(data[:cut])
    # declared-pixel overrun: claim a smaller image than the chunks emit
    px = synth_qoi_pixels(23)
    bad = bytearray(encode_qoi(px, len(px), 1, use_index=False))
    bad[4:8] = struct.pack(">I", len(px) - 1)
    with pytest.raises(ValueError, match="past declared pixels|overruns"):
        decode_qoi(bytes(bad))


def test_qoi_stats_op_matches_closed_forms(spark):
    from redskins_rule_spark.operators.multimodal import (
        decode_qoi_stats,
        with_qoi_payload,
    )

    docs = spark.createDataFrame(
        [(1, "x" * 9), (2, "y" * 31)], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: r
        for r in decode_qoi_stats(with_qoi_payload(docs, "text")).collect()
    }
    for doc_id, clen in ((1, 9), (2, 31)):
        px = synth_qoi_pixels(clen)
        fp = sum(
            (k + 1) * (r * 65536 + g * 256 + b)
            for k, (r, g, b) in enumerate(px)
        )
        row = got[doc_id]
        assert row["n_px"] == len(px) and row["px_fp"] == fp
        assert row["n_rgb"] == clen % 13 + 3 and row["n_index"] == 0


# --- FLAC round-12 breadth: depths, rice2, variable blocking ----------------

def test_flac_depths_roundtrip_and_md5_packing():
    from redskins_rule_spark.functions.flac import encode_flac, parse_flac

    for bps in (8, 16, 24, 32):
        amp = 1 << min(bps - 5, 23)  # keeps escape widths <= 31 bits
        samples = [((31 * k * k + 5 * k) * max(1, amp // 2048)
                    % (2 * amp)) - amp for k in range(32)]
        data = encode_flac([{"samples": samples, "code": 2, "po": 1}],
                           sample_rate=8000, bps=bps)
        st = parse_flac(data)
        assert st.bits_per_sample == bps
        assert st.md5_ok
        assert list(st.frames[0].samples) == samples
    # 12/20-bit: named refusal (MD5 packing ambiguity), both directions
    import pytest as _pytest
    for bad in (12, 20):
        with _pytest.raises(ValueError, match="byte-aligned"):
            encode_flac([{"samples": [0] * 32, "code": 0, "po": 0}],
                        bps=bad)
    with _pytest.raises(ValueError, match="8/12/16/20/24/32"):
        encode_flac([{"samples": [0] * 32, "code": 0, "po": 0}], bps=17)


def test_flac_depth_range_guard_and_ss_code_gate():
    import pytest as _pytest

    from redskins_rule_spark.functions.flac import encode_flac, parse_flac

    with _pytest.raises(ValueError, match="8-bit range"):
        encode_flac([{"samples": [200], "code": 0, "po": 0}], bps=8)
    # frame ss_code must agree with STREAMINFO: flip the STREAMINFO
    # depth (byte 12 carries channels/bps bits) and the decoder
    # must refuse rather than misread sample widths
    data = bytearray(
        encode_flac([{"samples": [50] * 32, "code": 1, "po": 0}], bps=8)
    )
    # STREAMINFO body starts at stream byte 8; its byte 12 ends with
    # the bps-1 high bit (bit 103). Flipping it turns 8-bit (00111)
    # into 24-bit (10111) — a VALID depth, so the decoder reaches the
    # per-frame consistency check instead of the depth gate
    data[8 + 12] ^= 0b00000001
    with _pytest.raises(ValueError, match="sample-size code disagrees"):
        parse_flac(bytes(data))


def test_flac_rice2_k_values_beyond_rice_range():
    from redskins_rule_spark.functions.flac import (
        parse_flac,
        synth_flac_rice2,
    )

    # rice2 frames carry k in 15..30 (impossible under 4-bit rice) and
    # never escape; rice frames escape instead. Scan a corpus window
    # and require both behaviors to occur.
    saw_big_k = saw_escape = False
    for clen in range(1, 120):
        st = parse_flac(synth_flac_rice2(clen))
        assert st.md5_ok, clen
        for f, fr in enumerate(st.frames):
            if (clen + f) % 3 == 0 and fr.k_fp >= 15:
                saw_big_k = True
            if (clen + f) % 3 != 0 and fr.n_escapes:
                saw_escape = True
    assert saw_big_k and saw_escape


def test_flac_rice2_explicit_roundtrip():
    from redskins_rule_spark.functions.flac import encode_flac, parse_flac

    samples = [((31 * k * k + 5 * k) * 256 % (1 << 20)) - (1 << 19)
               for k in range(32)]
    data = encode_flac(
        [{"samples": samples, "code": 3, "po": 1, "rice2": True}],
        sample_rate=8000, bps=24,
    )
    st = parse_flac(data)
    assert st.md5_ok
    assert list(st.frames[0].samples) == samples
    assert st.frames[0].n_escapes == 0
    assert st.frames[0].k_fp >= 15  # a parameter rice can't express


def test_flac_variable_blocking_roundtrip_and_sample_numbers():
    import pytest as _pytest

    from redskins_rule_spark.functions.flac import (
        encode_flac,
        parse_flac,
        synth_flac_varblock,
    )

    for clen in range(1, 120):
        st = parse_flac(synth_flac_varblock(clen))
        assert st.md5_ok, clen
        sizes = [fr.blocksize for fr in st.frames]
        want = []
        total, f, lo = 33 + clen % 71, 0, 0
        while lo < total:
            bs = 16 + 8 * ((clen + f) % 3)
            want.append(min(bs, total - lo))
            lo += bs
            f += 1
        assert sizes == want, clen
    # a variable stream whose second frame's sample number is wrong
    # must be refused: re-encode with frames swapped sizes mismatch
    data = encode_flac(
        [{"samples": [1] * 16, "code": 0, "po": 0},
         {"samples": [2] * 24, "code": 0, "po": 0}],
        variable=True,
    )
    st = parse_flac(data)
    assert [fr.blocksize for fr in st.frames] == [16, 24]
    # corrupting the second frame's coded sample number (byte after
    # its 4-byte header) must break the cumulative check before CRC
    # even matters — rebuild with a lying start via manual splice is
    # equivalent to flipping its UTF-8 number byte + fixing CRC8;
    # simpler: fixed-blocking parse of a variable stream must refuse
    mono_fixed = encode_flac([{"samples": [1] * 16, "code": 0, "po": 0}])
    assert parse_flac(mono_fixed).md5_ok
    mixed = bytearray(data)
    # flip the blocking-strategy bit of frame 2's header: byte offset
    # of second frame = len(header+frame1); find second sync by scan
    first_sync = mixed.index(b"\xff\xf9", 4)
    second_sync = mixed.index(b"\xff", first_sync + 2)
    while not (mixed[second_sync] == 0xFF
               and (mixed[second_sync + 1] & 0xFC) == 0xF8):
        second_sync = mixed.index(b"\xff", second_sync + 1)
    mixed[second_sync + 1] &= 0xFE  # variable -> fixed mid-stream
    with _pytest.raises(ValueError):
        parse_flac(bytes(mixed))


def test_flac_wide_blocksize_field():
    from redskins_rule_spark.functions.flac import encode_flac, parse_flac

    # >256-sample frames take the 16-bit blocksize-at-end code path
    samples = [((31 * k * k + 5 * k) % 4096) - 2048 for k in range(300)]
    data = encode_flac([{"samples": samples, "code": 2, "po": 0}],
                       variable=True)
    st = parse_flac(data)
    assert st.md5_ok and st.frames[0].blocksize == 300


def test_flac_escape_width_overflow_raises_by_name():
    import pytest as _pytest

    from redskins_rule_spark.functions.flac import encode_flac

    # order-1 residuals of alternating ±2^30 need 32-bit raw escape
    # words — past the 5-bit width field; the encoder must refuse by
    # name instead of silently clamping
    samples = [(1 << 30) * (1 if k % 2 == 0 else -1) for k in range(32)]
    with _pytest.raises(ValueError, match="more than 31 bits"):
        encode_flac([{"samples": samples, "code": 1, "po": 0}], bps=32)


def test_flac_stereo_ext_depths_varblock_rice2():
    from redskins_rule_spark.functions.flac import (
        parse_flac_stereo,
        synth_flac_stereo_ext,
    )

    saw8 = saw24 = saw_var_tail = False
    for clen in range(1, 150):
        st = parse_flac_stereo(synth_flac_stereo_ext(clen))
        assert st.md5_ok, clen
        if st.bits_per_sample == 8:
            saw8 = True
        if st.bits_per_sample == 24:
            saw24 = True
        sizes = [fr.blocksize for fr in st.frames]
        if len(set(sizes)) > 1:
            saw_var_tail = True
        assert sum(sizes) == st.total_samples
    assert saw8 and saw24 and saw_var_tail


def test_flac_stereo_ext_explicit_depth_and_rice2_roundtrip():
    from redskins_rule_spark.functions.flac import (
        encode_flac_stereo,
        parse_flac_stereo,
    )

    left = [((31 * k * k + 5 * k) * 256 % (1 << 20)) - (1 << 19)
            for k in range(24)]
    right = [((17 * k * k + 3 * k) * 256 % (1 << 20)) - (1 << 19)
             for k in range(24)]
    for mode in ("LR", "LS", "RS", "MS"):
        data = encode_flac_stereo(
            [{"left": left, "right": right, "mode": mode, "code": 2,
              "po": 1, "rice2": True},
             {"left": left[:10], "right": right[:10], "mode": mode,
              "code": 0, "po": 0}],
            bps=24, variable=True,
        )
        st = parse_flac_stereo(data)
        assert st.md5_ok, mode
        assert st.bits_per_sample == 24
        assert [fr.blocksize for fr in st.frames] == [24, 10]
        assert list(st.frames[0].left) == left
        assert list(st.frames[0].right) == right


def test_flac_stereo_ext_guards():
    import pytest as _pytest

    from redskins_rule_spark.functions.flac import (
        encode_flac_stereo,
        parse_flac_stereo,
    )

    with _pytest.raises(ValueError, match="byte-aligned"):
        encode_flac_stereo(
            [{"left": [0] * 8, "right": [0] * 8, "mode": "LR",
              "code": 0, "po": 0}], bps=12)
    # >2ch refusal stays: flip STREAMINFO channels field (3 bits
    # before bps; byte 12 bit 0x10 side) on a valid stereo stream
    data = bytearray(encode_flac_stereo(
        [{"left": [5] * 16, "right": [3] * 16, "mode": "LR",
          "code": 0, "po": 0}]))
    # STREAMINFO bits 100-102 are channels-1; within body byte 12
    # (bits 96-103) they sit at masks 0b1000/0b0100/0b0010. Flip bit
    # 101: channels-1 001 -> 011 (4 channels)
    data[8 + 12] ^= 0b00000100
    with _pytest.raises(ValueError, match="stereo"):
        parse_flac_stereo(bytes(data))


def test_flac_multichannel_roundtrip_all_counts_and_depths():
    from redskins_rule_spark.functions.flac import (
        parse_flac_multichannel,
        synth_flac_multichannel,
        synth_multi_sample,
        _depth_amp,
    )

    # clens chosen to hit every channel count 3-8 and every depth
    for clen in range(6, 24):
        st = parse_flac_multichannel(synth_flac_multichannel(clen))
        assert st.md5_ok, clen
        nch = 3 + clen % 6
        bps = (8, 16, 24)[clen % 3]
        assert st.n_channels == nch
        assert st.bits_per_sample == bps
        assert st.total_samples == 33 + clen % 71
        assert st.sample_rate == 8000 + 100 * (clen % 5)
        amp = _depth_amp(bps)
        m = max(1, (2 * amp) // 4096)
        for c in range(nch):
            got = [s for fr in st.frames for s in fr.channels[c]]
            want = [synth_multi_sample(clen, c, k, m, amp)
                    for k in range(st.total_samples)]
            assert got == want, (clen, c)


def test_flac_multichannel_explicit_encode_decode():
    from redskins_rule_spark.functions.flac import (
        encode_flac_multichannel,
        parse_flac_multichannel,
    )

    chans = [[(7 * c + 3 * k * k - 40) % 2001 - 1000 for k in range(48)]
             for c in range(5)]
    frames = [
        {"channels": [c[:32] for c in chans], "code": 3, "po": 1,
         "rice2": True},
        {"channels": [c[32:] for c in chans], "code": 2, "po": 0},
    ]
    st = parse_flac_multichannel(
        encode_flac_multichannel(frames, sample_rate=32000, bps=16)
    )
    assert st.md5_ok and st.n_channels == 5 and st.total_samples == 48
    assert [fr.codes for fr in st.frames] == [(3,) * 5, (2,) * 5]
    for c in range(5):
        assert [s for fr in st.frames for s in fr.channels[c]] == chans[c]


def test_flac_multichannel_guards():
    import pytest

    from redskins_rule_spark.functions.flac import (
        encode_flac_multichannel,
        parse_flac,
        parse_flac_multichannel,
        parse_flac_stereo,
        synth_flac,
        synth_flac_multichannel,
        synth_flac_stereo,
    )

    with pytest.raises(ValueError, match="3-8 channels"):
        encode_flac_multichannel(
            [{"channels": [[0] * 8, [0] * 8], "code": 0, "po": 0}]
        )
    with pytest.raises(ValueError, match="channel length mismatch"):
        encode_flac_multichannel(
            [{"channels": [[0] * 8, [0] * 8, [0] * 7], "code": 0, "po": 0}]
        )
    with pytest.raises(ValueError, match="12/20-bit"):
        encode_flac_multichannel(
            [{"channels": [[0] * 8] * 3, "code": 0, "po": 0}], bps=12
        )
    # walk routing: each parser names the right walk for other layouts
    with pytest.raises(ValueError, match="3-8 channel streams"):
        parse_flac_multichannel(synth_flac(10))
    with pytest.raises(ValueError, match="parse_flac_multichannel"):
        parse_flac(synth_flac_multichannel(10))
    with pytest.raises(ValueError, match="parse_flac_multichannel"):
        parse_flac_stereo(synth_flac_multichannel(10))
    with pytest.raises(ValueError, match="3-8 channel streams"):
        parse_flac_multichannel(synth_flac_stereo(10))


def test_flac_multichannel_crc_and_md5_detect_corruption():
    from redskins_rule_spark.functions.flac import (
        parse_flac_multichannel,
        synth_flac_multichannel,
    )
    import pytest

    data = bytearray(synth_flac_multichannel(9))
    # flip the last frame's trailing CRC-16 byte: mismatch, by name
    data[-1] ^= 0x10
    with pytest.raises(ValueError, match="CRC-16"):
        parse_flac_multichannel(bytes(data))
    # flip a bit in the STREAMINFO MD5: stream decodes, proof fails
    data = bytearray(synth_flac_multichannel(9))
    data[8 + 18] ^= 0x01
    assert parse_flac_multichannel(bytes(data)).md5_ok is False


def test_length_dict_guard_bounded_contract(spark, monkeypatch):
    """r14 item 10: length_dict_stats' bounded-dictionary contract is
    enforced in-plan — a cap below the true distinct-key count fails
    with the contract-naming error BEFORE decode/broadcast, a normal
    cap passes with identical results, and junk env values fall back."""
    import pandas as pd

    from redskins_rule_spark.operators.multimodal import length_dict_stats

    docs = spark.createDataFrame(
        [(i, "x" * (40 + i % 5)) for i in range(20)] + [(99, None)],
        "doc_id long, text string",
    )

    def stats_fn(d):
        # trivial per-key stat: the key's synthetic char length
        from pyspark.sql import functions as F
        return d.select("doc_id", F.length("text").alias("clen"))

    base = length_dict_stats(docs, "text", "doc_id", stats_fn)
    rows = {r.doc_id: r.clen for r in base.collect()}
    assert rows[0] == 40 and rows[4] == 44 and rows[99] is None

    # cap below the 5 distinct keys -> contract-naming failure
    monkeypatch.setenv("SPARK_GRAFT_DICT_MAX_KEYS", "3")
    with pytest.raises(Exception, match="SPARK_GRAFT_DICT_MAX_KEYS"):
        length_dict_stats(docs, "text", "doc_id", stats_fn).collect()

    # junk / non-positive values fall back to the default (no raise)
    for junk in ("banana", "0", "-7"):
        monkeypatch.setenv("SPARK_GRAFT_DICT_MAX_KEYS", junk)
        got = {
            r.doc_id: r.clen
            for r in length_dict_stats(docs, "text", "doc_id", stats_fn).collect()
        }
        assert got == rows
