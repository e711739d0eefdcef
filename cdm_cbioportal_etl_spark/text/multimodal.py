"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; the
Spark-side plumbing (schema, Arrow batch shape, ``mapInPandas`` signature,
partition sizing) is real and tested.

Decode kernels: formats decodable with numpy + the stdlib are REAL —
``ppm`` (P6 binary RGB raster), ``png`` (8-bit RGB: stdlib zlib inflate
+ numpy scanline unfiltering, all five PNG filter types), and ``wav``
(PCM16 via the stdlib ``wave`` module), each parsed in the Arrow batch.
Codecs that genuinely need external libraries (JPEG/MP3/H.264 —
PIL/ffmpeg are not in this container) stay STUBBED: ``decode_stub=True`` produces
deterministic fake features (so pipelines are testable end-to-end),
``decode_stub=False`` decodes the real formats and raises
``NotImplementedError`` at the exact point any other codec would plug
in.  ``synth_real_media`` generates genuine PPM/WAV payloads whose pixel
and sample values are CLOSED-FORM functions of the media id, so a SQL
oracle recomputes the decoded features exactly (catalog query
``multimodal_decode_features``) — the decode path is value-checked, not
just shape-checked.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.StructType([
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("duration_ms", T.IntegerType()),
            T.StructField("codec", T.StringType()),
        ])),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payload = seeded hash bytes)."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.unbase64(F.base64(F.sha2(F.concat(F.lit(seed), F.col("id")), 512).cast("binary"))).alias(
            "payload"
        ),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(1000).alias("duration_ms"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )


# ------------------------------------------------------------------- #
# Real codec kernels (numpy/stdlib only): PPM P6 images, PCM16 WAV
# ------------------------------------------------------------------- #
IMG_W = IMG_H = 16
N_SAMPLES = 1000
SAMPLE_RATE = 8000


def decode_ppm(payload: bytes):
    """P6 binary PPM → uint8 ndarray (h, w, 3).  Header = magic, width,
    height, maxval as whitespace-separated tokens, one whitespace, then
    the raw RGB raster."""
    import numpy as np

    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    tokens, i = [], 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment line
            i = payload.index(b"\n", i) + 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    return np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i).reshape(
        h, w, 3
    )


def encode_ppm(img) -> bytes:
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype("uint8").tobytes()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(img, cycle_filters: bool = True) -> bytes:
    """8-bit RGB PNG encoder (stdlib zlib, single IDAT).  With
    ``cycle_filters`` each scanline uses filter type ``row % 5`` so a
    round-trip exercises every PNG filter (None/Sub/Up/Average/Paeth),
    not just the trivial one."""
    import struct
    import zlib

    import numpy as np

    img = img.astype(np.uint8)
    h, w, ch = img.shape
    assert ch == 3, "RGB only"
    bpp = 3
    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.int16)
    for r in range(h):
        row = img[r].reshape(-1).astype(np.int16)
        ft = (r % 5) if cycle_filters else 0
        left = np.concatenate([np.zeros(bpp, np.int16), row[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int16), prev[:-bpp]])
        if ft == 0:
            filt = row
        elif ft == 1:
            filt = row - left
        elif ft == 2:
            filt = row - prev
        elif ft == 3:
            filt = row - (left + prev) // 2
        else:  # Paeth
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            filt = row - pred
        raw.append(ft)
        raw.extend((filt % 256).astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """8-bit RGB PNG → uint8 ndarray (h, w, 3).  Stdlib zlib inflate +
    numpy per-scanline unfiltering (all five PNG filter types; Sub is a
    strided cumsum, Up a vectorized add, Average/Paeth a short per-byte
    loop over the 3·w row).  Non-interlaced, color type 2, bit depth 8 —
    the subset the encoder above emits; anything else raises."""
    import struct
    import zlib

    import numpy as np

    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    i = len(_PNG_SIG)
    w = h = None
    idat = bytearray()
    while i < len(payload):
        (ln,) = struct.unpack(">I", payload[i : i + 4])
        tag = payload[i + 4 : i + 8]
        body = payload[i + 8 : i + 8 + ln]
        i += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(">IIBBBBB", body)
            if (depth, ctype, comp, filt, inter) != (8, 2, 0, 0, 0):
                raise NotImplementedError(
                    "only 8-bit non-interlaced RGB PNG decodes natively"
                )
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    bpp = 3
    stride = w * bpp
    data = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if len(data) != h * (stride + 1):
        raise ValueError("PNG raster length mismatch")
    data = data.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        ft = int(data[r, 0])
        raw = data[r, 1:].astype(np.int32)
        if ft == 0:
            recon = raw
        elif ft == 1:  # Sub: cumsum along each byte lane mod 256
            recon = raw.copy()
            for c in range(bpp):
                recon[c::bpp] = np.cumsum(raw[c::bpp]) % 256
        elif ft == 2:  # Up
            recon = (raw + prev) % 256
        else:  # Average (3) / Paeth (4): sequential left dependency
            recon = np.zeros(stride, dtype=np.int32)
            for j in range(stride):
                left = recon[j - bpp] if j >= bpp else 0
                up = prev[j]
                ul = prev[j - bpp] if j >= bpp else 0
                if ft == 3:
                    pred = (left + up) // 2
                else:
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                recon[j] = (raw[j] + pred) % 256
        out[r] = recon.astype(np.uint8)
        prev = recon
    return out.reshape(h, w, bpp)


def decode_wav_pcm16(payload: bytes):
    """PCM16 mono/stereo WAV → int16 sample ndarray (interleaved)."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as wv:
        if wv.getsampwidth() != 2:
            raise ValueError("only PCM16 supported")
        return np.frombuffer(wv.readframes(wv.getnframes()), dtype="<i2")


def encode_wav_pcm16(samples, rate: int = SAMPLE_RATE) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        wv.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def synth_real_media(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """REAL media payloads from an id frame: even ids → a P6 PPM image,
    odd ids → a PCM16 WAV clip.  Pixel/sample values are closed-form in
    the id (pixel(y,x,c) = (id·31 + x·3 + y·5 + c·17) mod 256;
    sample(i) = (id·13 + i·7) mod 4096 − 2048), so decoded features are
    recomputable by an engine-independent SQL oracle — this is synthetic
    CONTENT, not a stubbed DECODER."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        y, x, c = np.ogrid[0:IMG_H, 0:IMG_W, 0:3]
        i = np.arange(N_SAMPLES, dtype=np.int64)
        for pdf in batches:
            rows = []
            for mid in pdf[id_col].astype("int64"):
                mid = int(mid)
                if mid % 2 == 0:
                    img = ((mid * 31 + x * 3 + y * 5 + c * 17) % 256).astype(np.uint8)
                    rows.append(
                        (mid, "image", encode_ppm(img), (IMG_W, IMG_H, 0, "ppm"))
                    )
                else:
                    s = ((mid * 13 + i * 7) % 4096 - 2048).astype("<i2")
                    rows.append(
                        (
                            mid,
                            "audio",
                            encode_wav_pcm16(s),
                            (0, 0, N_SAMPLES * 1000 // SAMPLE_RATE, "wav"),
                        )
                    )
            yield pd.DataFrame(
                {
                    "media_id": [r[0] for r in rows],
                    "kind": [r[1] for r in rows],
                    "payload": [r[2] for r in rows],
                    "meta": [
                        {
                            "width": m[0],
                            "height": m[1],
                            "duration_ms": m[2],
                            "codec": m[3],
                        }
                        for m in (r[3] for r in rows)
                    ],
                }
            )

    return ids.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        _gen, MEDIA_SCHEMA
    )


def synth_png_media(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """REAL PNG payloads from an id frame — every id becomes a 16x16
    8-bit RGB PNG with closed-form content pixel(y,x,c) =
    (id·29 + x·7 + y·11 + c·13) mod 256, encoded with CYCLING scanline
    filters (row % 5) so decode exercises every PNG filter type.  Like
    ``synth_real_media``, this is synthetic CONTENT through a real
    CODEC: an engine-independent SQL oracle recomputes the decoded
    features from the same closed form."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        y, x, c = np.ogrid[0:IMG_H, 0:IMG_W, 0:3]
        for pdf in batches:
            mids = [int(m) for m in pdf[id_col].astype("int64")]
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "kind": ["image"] * len(mids),
                    "payload": [
                        encode_png(
                            ((mid * 29 + x * 7 + y * 11 + c * 13) % 256).astype(
                                np.uint8
                            )
                        )
                        for mid in mids
                    ],
                    "meta": [
                        {"width": IMG_W, "height": IMG_H,
                         "duration_ms": 0, "codec": "png"}
                        for _ in mids
                    ],
                }
            )

    return ids.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        _gen, MEDIA_SCHEMA
    )


def synth_jpeg_media(
    ids: DataFrame, id_col: str = "media_id", quality: int = 95
) -> DataFrame:
    """REAL baseline JPEG payloads — every id becomes a 16x16 RGB image
    of four 8x8 SOLID-COLOR blocks, block(by,bx) channel c =
    (id·37 + bx·19 + by·23 + c·41) mod 256, encoded 4:4:4 at quality 95
    by the pure-numpy encoder (text/jpeg.py).  Block-solid content makes
    every block DC-only, and at q>=95 the round-trip error per channel is
    provably < 0.5 → the DECODED pixels equal the closed form EXACTLY,
    so a lossy codec still gets a byte-exact SQL oracle."""
    from cdm_cbioportal_etl_spark.text.jpeg import encode_jpeg_baseline

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            mids = [int(m) for m in pdf[id_col].astype("int64")]
            payloads = []
            for mid in mids:
                img = np.zeros((IMG_H, IMG_W, 3), dtype=np.uint8)
                for by in range(IMG_H // 8):
                    for bx in range(IMG_W // 8):
                        for c in range(3):
                            img[
                                by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, c
                            ] = (mid * 37 + bx * 19 + by * 23 + c * 41) % 256
                payloads.append(encode_jpeg_baseline(img, quality))
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "kind": ["image"] * len(mids),
                    "payload": payloads,
                    "meta": [
                        {"width": IMG_W, "height": IMG_H,
                         "duration_ms": 0, "codec": "jpeg"}
                        for _ in mids
                    ],
                }
            )

    return ids.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        _gen, MEDIA_SCHEMA
    )


DECODE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("dim_x", T.IntegerType()),
        T.StructField("dim_y", T.IntegerType()),
        T.StructField("f1", T.DoubleType()),
        T.StructField("f2", T.DoubleType()),
        T.StructField("f3", T.DoubleType()),
    ]
)


def decode_features(media: DataFrame) -> DataFrame:
    """Decode REAL payloads and emit exact, oracle-checkable features:

    - image/ppm, image/png: dims + per-channel means (pixel sum / area)
    - audio/wav: sample count + mean / max / min sample value

    Unknown codecs raise — the honest plug point for PIL/ffmpeg-class
    decoders stays visible rather than silently passing through."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {k: [] for k in ("media_id", "kind", "dim_x", "dim_y", "f1", "f2", "f3")}
            for mid, kind, payload, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                codec = meta["codec"] if isinstance(meta, dict) else meta.codec
                if codec in ("ppm", "png", "jpeg"):
                    if codec == "jpeg":
                        from cdm_cbioportal_etl_spark.text.jpeg import (
                            decode_jpeg_baseline as dec,
                        )
                    else:
                        dec = decode_ppm if codec == "ppm" else decode_png
                    img = dec(bytes(payload)).astype(np.int64)
                    h, w, _ = img.shape
                    means = img.reshape(-1, 3).sum(axis=0) / float(h * w)
                    vals = (w, h, *(round(float(m), 6) for m in means))
                elif codec == "wav":
                    s = decode_wav_pcm16(bytes(payload)).astype(np.int64)
                    vals = (
                        len(s),
                        1,
                        round(float(s.sum() / len(s)), 6),
                        float(s.max()),
                        float(s.min()),
                    )
                else:
                    raise NotImplementedError(
                        f"codec {codec!r}: plug a real decoder (ffmpeg) in "
                        "here — ppm/png/baseline-jpeg/wav decode natively"
                    )
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["dim_x"].append(vals[0])
                out["dim_y"].append(vals[1])
                out["f1"].append(vals[2])
                out["f2"].append(vals[3])
                out["f3"].append(vals[4])
            yield pd.DataFrame(out)

    return media.mapInPandas(_decode, DECODE_FEATURES_SCHEMA)


def extract_features(
    media: DataFrame, feature_dim: int = 8, decode_stub: bool = True, batch_hint: int = 1024
) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow batches).

    The UDF receives an iterator of pandas batches — the shape a real
    image/audio decoder needs (vectorized I/O, bounded memory per batch).
    With ``decode_stub=False``, ppm/wav payloads are REALLY decoded
    (numpy kernels above) and the feature is decoded-value statistics
    padded/truncated to ``feature_dim``; other codecs raise at the plug
    point.  ``decode_stub=True`` keeps the byte-fold fake for pipelines
    testing plumbing only.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def _fold(arr: "np.ndarray") -> list[float]:
            arr = arr.astype(np.float32).ravel()
            pad = (-len(arr)) % feature_dim
            if pad:
                arr = np.concatenate([arr, np.zeros(pad, np.float32)])
            return arr.reshape(-1, feature_dim).mean(axis=0).tolist()

        for pdf in batches:
            feats = []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                if decode_stub:
                    raw = np.frombuffer(payload, dtype=np.uint8)
                    feats.append([v / 255.0 for v in _fold(raw)])
                    continue
                codec = meta["codec"] if isinstance(meta, dict) else meta.codec
                if codec == "ppm":
                    feats.append(_fold(decode_ppm(bytes(payload))))
                elif codec == "png":
                    feats.append(_fold(decode_png(bytes(payload))))
                elif codec == "jpeg":
                    from cdm_cbioportal_etl_spark.text.jpeg import (
                        decode_jpeg_baseline,
                    )

                    feats.append(_fold(decode_jpeg_baseline(bytes(payload))))
                elif codec == "wav":
                    feats.append(_fold(decode_wav_pcm16(bytes(payload))))
                else:
                    raise NotImplementedError(
                        f"codec {codec!r}: real decode requires codec libs "
                        "(ffmpeg for compressed audio/video, libjpeg for "
                        "progressive JPEG) not present in this container; "
                        "plug the decoder in here — ppm/png/baseline-jpeg/"
                        "wav decode natively"
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


PAYLOAD_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("payload_sha", T.StringType()),
        T.StructField("byte_sum", T.LongType()),
    ]
)


def payload_stats(
    media: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """Per-payload byte statistics via ``mapInPandas`` — the oracle-
    checkable half of the multimodal path: every byte of the binary
    column is touched in the Arrow batch (numpy sum + sha256), producing
    values an engine-independent oracle can recompute exactly (integer
    byte sum, hex digest, byte length).  This is the proof that the
    binary-column plumbing (Arrow transfer of ``binary``, batch
    iteration, vectorized per-payload work) is real; the codec-decode
    kernel in ``extract_features`` stays stubbed only because the codec
    libraries are absent."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "payload_sha": payloads.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "byte_sum": payloads.map(
                        lambda b: int(np.frombuffer(bytes(b), dtype=np.uint8).sum())
                        if len(b)
                        else 0
                    ).astype("int64"),
                }
            )

    return media.select(
        F.col(id_col).alias(id_col), F.col(payload_col).alias(payload_col)
    ).mapInPandas(_stats, PAYLOAD_STATS_SCHEMA)


def resize_image_nn(
    media: DataFrame, out_w: int, out_h: int
) -> DataFrame:
    """Nearest-neighbor image resize inside the Arrow batch: decode the
    PPM payload, index-map to the output grid (pure numpy fancy
    indexing — ``img[(np.arange(out_h)*h)//out_h][:, (np.arange(out_w)*w)//out_w]``),
    re-encode, and rewrite the meta dims.  Non-image rows pass through
    untouched, so the op composes with mixed-modality frames.  The
    PIL/ffmpeg plug point for compressed codecs is the same one
    ``decode_features`` documents."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads, metas = [], []
            for kind, payload, meta in zip(pdf["kind"], pdf["payload"], pdf["meta"]):
                codec = meta["codec"] if isinstance(meta, dict) else meta.codec
                if kind == "image" and codec == "ppm":
                    img = decode_ppm(bytes(payload))
                    h, w, _ = img.shape
                    ys = (np.arange(out_h) * h) // out_h
                    xs = (np.arange(out_w) * w) // out_w
                    out = img[ys][:, xs]
                    payloads.append(encode_ppm(out))
                    metas.append(
                        {"width": out_w, "height": out_h,
                         "duration_ms": 0, "codec": "ppm"}
                    )
                else:
                    payloads.append(payload)
                    metas.append(meta)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return media.mapInPandas(_resize, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_k: int) -> DataFrame:
    """Temporal decimation — keep every k-th sample/frame.  For PCM16
    WAV this is numpy stride slicing on the decoded sample array,
    re-encoded with the same rate (the video-codec frame-sampling analog
    rides the same plug point as the other compressed formats).
    Non-audio rows pass through untouched."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for kind, payload, meta in zip(pdf["kind"], pdf["payload"], pdf["meta"]):
                codec = meta["codec"] if isinstance(meta, dict) else meta.codec
                if kind == "audio" and codec == "wav":
                    s = decode_wav_pcm16(bytes(payload))[::every_k]
                    payloads.append(encode_wav_pcm16(s))
                    metas.append(
                        {"width": 0, "height": 0,
                         "duration_ms": len(s) * 1000 // SAMPLE_RATE,
                         "codec": "wav"}
                    )
                else:
                    payloads.append(payload)
                    metas.append(meta)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return media.mapInPandas(_sample, MEDIA_SCHEMA)
