"""Multimodal columns for training-data pipelines: images/audio/video as
opaque `binary` columns with typed metadata, processed via Arrow-batched
mapInPandas.

The Spark-side plumbing (schemas, batch iteration, partition parallelism,
metadata propagation) is real and tested. Decoding is tiered:
1. stdlib/numpy decoders, always available: 24-bit BMP, binary PPM, and
   8-bit non-interlaced PNG (zlib inflate + numpy unfilter) — decode_image
   / decode_png / nn_resize;
2. OPTIONAL-dependency adapters for compressed codecs, capability probed
   once per worker process, zero cost when absent: when Pillow is
   importable on the executors, decode_image_any decodes JPEG/WEBP/etc.;
   when soundfile is importable, decode_audio_any decodes FLAC/OGG/MP3
   on top of the always-available stdlib PCM WAV path; when PyAV is
   importable, decode_video_any samples frames from H.264/VP9/... in
   mp4/webm/mkv on top of the always-available stdlib YUV4MPEG2 (.y4m)
   path. Ship the deps to workers the standard ways — cluster image,
   `spark.submit.pyFiles`, conda/venv archives (DEPLOYMENT.md §codecs);
3. without the optional dep, compressed image payloads pass through
   unchanged, compressed audio yields NULL features, and compressed
   video yields a NULL-frame row (strict=True raises naming the missing
   dependency in all three).

Design notes for 100 TB:
- binary payloads ride in the same parquet row group as their metadata —
  column pruning means metadata-only queries never read the bytes;
- mapInPandas streams Arrow batches, so executor memory is bounded by
  `spark.sql.execution.arrow.maxRecordsPerBatch` x max payload, not by
  partition size;
- feature extraction decodes only DISTINCT payloads: corpus-wide
  content-hash dedup-before-decode (hash/count JVM-side, decode over the
  deduplicated set, hash-join back), the single biggest cost saver at
  scale on duplicated corpora.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("content_hash", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("features", ArrayType(DoubleType()), True),
    ]
)


def _fake_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: fixed-dim 'features' from
    byte statistics. Replace with a real model/codec in production."""
    if not payload:
        return [0.0] * dim
    step = max(1, len(payload) // dim)
    return [sum(payload[i : i + step]) / (255.0 * step) for i in range(0, step * dim, step)]


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes], list[float]] | None = None,
    batch_size_hint: int = 256,
    scope: str = "corpus",
) -> DataFrame:
    """Decode/feature-extract each payload via Arrow-batched mapInPandas,
    decoding each DISTINCT payload exactly once.

    scope="corpus" (default): corpus-wide dedup-before-decode. The content
    hash and byte count are pure Catalyst projections (F.md5 /
    octet_length — identical to hashlib.md5().hexdigest(), no Python
    crossing), payloads are reduced to one row per hash (hash-keyed
    aggregate: map-side partial dedup means only per-partition-unique
    payloads shuffle), ONLY those rows cross into Python for decode, and
    features join back on the hash (no forced broadcast — AQE broadcasts
    while the distinct set is small, sort-merges when it is not). On a
    corpus with duplication factor D, decode cost drops by D — the single
    biggest cost saver at scale.

    scope="batch": single zero-shuffle mapInPandas pass with an
    intra-Arrow-batch decode cache — identical output; decode count is
    once per distinct payload PER BATCH. Use when the decode is cheaper
    than a shuffle of the distinct payloads.

    decode_fn=None uses the deterministic fake (no media libs in this
    environment). Both scopes yield bit-identical frames; pinned by
    tests/test_sinks_streaming.py::test_corpus_scope_decodes_each_distinct_payload_once."""
    # bind the default decoder as a local lambda so the UDF closure pickles
    # by value — workers then don't need this package on their PYTHONPATH
    if decode_fn is None:
        dim = 8

        def decode_fn(payload: bytes) -> list[float]:
            if not payload:
                return [0.0] * dim
            step = max(1, len(payload) // dim)
            return [sum(payload[i : i + step]) / (255.0 * step) for i in range(0, step * dim, step)]

    fn = decode_fn

    if scope == "corpus":
        payload_bytes = F.coalesce(F.col("payload"), F.lit(b""))
        hashed = media.select(
            "media_id",
            F.md5(payload_bytes).alias("content_hash"),
            F.octet_length(payload_bytes).cast("long").alias("n_bytes"),
            "payload",
        )
        distinct = hashed.dropDuplicates(["content_hash"]).select("content_hash", "payload")

        decoded_schema = StructType(
            [
                StructField("content_hash", StringType(), False),
                StructField("features", ArrayType(DoubleType()), True),
            ]
        )

        def _decode(batches: Iterator) -> Iterator:
            import pandas as pd

            for pdf in batches:
                feats = [
                    fn(bytes(p) if p is not None else b"") for p in pdf["payload"]
                ]
                yield pd.DataFrame({"content_hash": pdf["content_hash"], "features": feats})

        decoded = distinct.mapInPandas(_decode, schema=decoded_schema)
        return hashed.select("media_id", "content_hash", "n_bytes").join(
            decoded, "content_hash"
        ).select("media_id", "content_hash", "n_bytes", "features")

    if scope != "batch":
        raise ValueError(f"unknown scope {scope!r}: expected 'corpus' or 'batch'")

    def _extract(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            cache: dict[str, list[float]] = {}
            ids, hashes, sizes, feats = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                h = hashlib.md5(b).hexdigest()
                if h not in cache:
                    cache[h] = fn(b)
                ids.append(mid)
                hashes.append(h)
                sizes.append(len(b))
                feats.append(cache[h])
            yield pd.DataFrame(
                {"media_id": ids, "content_hash": hashes, "n_bytes": sizes, "features": feats}
            )

    return media.select("media_id", "payload").mapInPandas(_extract, schema=FEATURES_SCHEMA)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png(payload: bytes):
    """Pure-stdlib PNG decode (zlib + numpy): 8-bit-depth, non-interlaced
    grayscale / gray+alpha / RGB / RGBA, all five scanline filters.
    Returns an HxWx3 uint8 RGB array (alpha dropped, gray replicated), or
    None for anything it cannot parse — palette images, 16-bit depth, and
    Adam7 interlacing are declined rather than mis-decoded. The unfilter
    pass is vectorized per row for filters None/Up and scalar along x for
    Sub/Average/Paeth (left-neighbor dependency is inherently sequential)
    — adequate for thumbnail-scale training payloads; swap a real codec
    in via extract_features(decode_fn=) when throughput matters."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != _PNG_SIG:
        return None
    try:
        pos, w = 8, None
        idat = []
        while pos + 8 <= len(payload):
            (ln,), typ = struct.unpack_from(">I", payload, pos), payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + ln]
            if len(data) < ln:
                return None
            if typ == b"IHDR":
                w, h, depth, ctype, comp, filt, ilace = struct.unpack(">IIBBBBB", data)
                if depth != 8 or ctype not in (0, 2, 4, 6) or comp or filt or ilace:
                    return None
                ch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
            elif typ == b"IDAT":
                idat.append(data)
            elif typ == b"IEND":
                break
            pos += 12 + ln  # length + type + data + crc
        if w is None or not idat or w == 0 or h == 0:
            return None
        raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
        stride = w * ch
        if raw.size < h * (stride + 1):
            return None
        rows = raw[: h * (stride + 1)].reshape(h, stride + 1)
        ftypes, data = rows[:, 0], rows[:, 1:].astype(np.int32)
        out = np.zeros_like(data)
        for y in range(h):
            f, cur = ftypes[y], data[y]
            prior = out[y - 1] if y else np.zeros(stride, dtype=np.int32)
            if f == 0:
                out[y] = cur
            elif f == 2:  # Up
                out[y] = (cur + prior) & 0xFF
            elif f in (1, 3, 4):  # Sub / Average / Paeth: left-dependent
                line = out[y]
                for x in range(stride):
                    a = line[x - ch] if x >= ch else 0
                    b = prior[x]
                    if f == 1:
                        v = cur[x] + a
                    elif f == 3:
                        v = cur[x] + ((a + b) >> 1)
                    else:
                        c = prior[x - ch] if x >= ch else 0
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                        v = cur[x] + pred
                    line[x] = v & 0xFF
            else:
                return None
        px = out.astype(np.uint8).reshape(h, w, ch)
        if ch >= 3:
            return np.ascontiguousarray(px[..., :3])  # drop alpha if present
        return np.repeat(px[..., :1], 3, axis=2)  # gray (+alpha) -> RGB
    except (ValueError, struct.error, zlib.error):
        return None


def encode_png(arr) -> bytes:
    """Minimal PNG encoder (filter-0 scanlines, zlib default level) for an
    HxWx3 uint8 RGB array — the test-side inverse of decode_png."""
    import struct
    import zlib

    import numpy as np

    h, w = arr.shape[:2]

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + np.ascontiguousarray(arr[y]).tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_image(payload: bytes):
    """Pure-numpy decode of codec-free image formats — 24-bit BI_RGB BMP,
    binary PPM (P6, maxval 255), and (via stdlib zlib) 8-bit
    non-interlaced PNG. Returns an HxWx3 uint8 RGB array, or None for
    anything else (JPEG etc. need a real codec). No external imaging
    libraries required."""
    import struct

    import numpy as np

    if payload[:8] == _PNG_SIG:
        return decode_png(payload)

    # A 100 TB corpus WILL contain malformed media: every parse failure must
    # yield None (so resize_images(strict=False) passes the payload through)
    # rather than raising and killing the stage.
    try:
        if payload[:2] == b"BM" and len(payload) >= 54:
            off, _hdr, w, h, _planes, bpp = struct.unpack_from("<IIiiHH", payload, 10)
            comp = struct.unpack_from("<I", payload, 30)[0]
            if bpp != 24 or comp != 0:
                return None
            flip = h > 0  # positive height = bottom-up row order
            h = abs(h)
            if w <= 0 or h == 0:  # hostile negative/zero width, zero height
                return None
            stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
            if len(payload) < off + stride * h:
                return None
            rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=off)
            arr = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[..., ::-1]  # BGR->RGB
            return arr[::-1] if flip else arr
        if payload[:2] == b"P6":
            # header: P6 <ws> width <ws> height <ws> maxval <single-ws> raster
            pos, fields = 2, []
            while len(fields) < 3 and pos < len(payload):
                while pos < len(payload) and payload[pos : pos + 1].isspace():
                    pos += 1
                if payload[pos : pos + 1] == b"#":  # comment to EOL
                    while pos < len(payload) and payload[pos] != 0x0A:
                        pos += 1
                    continue
                start = pos
                while pos < len(payload) and not payload[pos : pos + 1].isspace():
                    pos += 1
                fields.append(int(payload[start:pos]))  # non-numeric -> ValueError -> None
            if len(fields) < 3:  # truncated header
                return None
            pos += 1  # the single whitespace after maxval
            w, h, maxval = fields
            if maxval != 255 or w <= 0 or h <= 0 or len(payload) < pos + w * h * 3:
                return None
            return np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos).reshape(
                h, w, 3
            )
    except (ValueError, struct.error):
        return None
    return None


_PIL_PROBE: list = []  # [] = unprobed; [None] = absent; [module] = usable


def _optional_pil():
    """Per-worker-process capability probe for the optional Pillow
    dependency: one import attempt per Python worker (module state is
    per-process and workers are reused), so the absent case costs a
    single cached None check per payload, not an ImportError per row."""
    if not _PIL_PROBE:
        try:
            from PIL import Image  # noqa: PLC0415

            _PIL_PROBE.append(Image)
        except Exception:
            _PIL_PROBE.append(None)
    return _PIL_PROBE[0]


def decode_image_any(payload: bytes):
    """Tiered image decode: stdlib/numpy first (BMP/PPM/PNG —
    `decode_image`, always available), then the optional Pillow adapter
    for compressed codecs (JPEG/WEBP/...) when it is importable on this
    worker (`_optional_pil`). Returns an HxWx3 uint8 RGB array, or None
    when no available tier can decode the payload — malformed media in
    a 100 TB corpus must degrade, not kill the stage."""
    arr = decode_image(payload)
    if arr is not None:
        return arr
    Image = _optional_pil()
    if Image is None or not payload:
        return None
    import io

    import numpy as np

    try:
        with Image.open(io.BytesIO(payload)) as im:
            return np.asarray(im.convert("RGB"), dtype=np.uint8)
    except Exception:
        return None


def encode_ppm(arr) -> bytes:
    """Encode an HxWx3 uint8 RGB array as binary PPM (P6)."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def nn_resize(arr, width: int, height: int):
    """Nearest-neighbor resize via integer index maps — two gather ops."""
    import numpy as np

    h, w = arr.shape[:2]
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return arr[rows][:, cols]


def resize_images(media: DataFrame, width: int, height: int, strict: bool = False) -> DataFrame:
    """Image resize over Arrow batches. Decodes through the tiered
    adapter (`decode_image_any`): 24-bit BMP / binary PPM / 8-bit
    non-interlaced PNG always (stdlib+numpy), compressed codecs
    (JPEG/WEBP/...) when Pillow is importable on the executors
    (DEPLOYMENT.md §codecs) — decoded payloads are nearest-neighbor
    resized in numpy and re-encoded as PPM with width/height metadata
    updated. A payload NO available tier can decode passes through
    unchanged keeping its original metadata — or raises when
    ``strict=True``, naming the missing optional dependency.
    Dedup-before-decode applies per batch (identical payloads resize
    once)."""

    def _resize(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            cache: dict[bytes, tuple] = {}
            out = {c: [] for c in ("media_id", "kind", "mime", "width", "height", "duration_ms", "payload")}
            for row in pdf.itertuples(index=False):
                b = bytes(row.payload) if row.payload is not None else b""
                if b not in cache:
                    arr = decode_image_any(b) if b else None
                    if arr is not None:
                        resized = nn_resize(arr, width, height)
                        cache[b] = (encode_ppm(resized), "image/x-portable-pixmap", width, height)
                    elif strict:
                        have_pil = _optional_pil() is not None
                        raise NotImplementedError(
                            f"cannot decode payload (mime={row.mime!r}): "
                            + (
                                "payload is malformed or an unsupported codec "
                                "(Pillow is present on this worker)"
                                if have_pil
                                else "stdlib decoders cover BMP/PPM/PNG only; "
                                "install Pillow on the executors (DEPLOYMENT.md "
                                "§codecs) for JPEG/WEBP/..."
                            )
                            + "; pass strict=False to pass undecodable payloads through"
                        )
                    else:
                        cache[b] = (row.payload, row.mime, row.width, row.height)
                payload, mime, w, h = cache[b]
                out["media_id"].append(row.media_id)
                out["kind"].append(row.kind)
                out["mime"].append(mime)
                out["width"].append(w)
                out["height"].append(h)
                out["duration_ms"].append(row.duration_ms)
                out["payload"].append(payload)
            yield pd.DataFrame(out)

    cols = [f.name for f in MEDIA_SCHEMA.fields]
    return media.select(*cols).mapInPandas(_resize, schema=MEDIA_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_samples", LongType(), True),
        StructField("rms", DoubleType(), True),
        StructField("zero_crossing_rate", DoubleType(), True),
        StructField("spectral_centroid_hz", DoubleType(), True),
    ]
)


def decode_audio_wav(payload: bytes):
    """Pure-stdlib decode of PCM WAV payloads (the `wave` module + numpy):
    returns (mono float32 array in [-1, 1], sample_rate), or None for
    non-WAV / compressed audio. 8/16/32-bit PCM supported."""
    import io
    import wave

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            rate, width, nch = w.getframerate(), w.getsampwidth(), w.getnchannels()
            raw = w.readframes(w.getnframes())
    except wave.Error:
        return None
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        return None
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, rate


_SF_PROBE: list = []  # [] = unprobed; [None] = absent; [module] = usable


def _optional_soundfile():
    """Per-worker-process capability probe for the optional `soundfile`
    dependency (the audio mirror of `_optional_pil`): one import attempt
    per Python worker (module state is per-process and workers are
    reused), so the absent case costs a single cached None check per
    payload, not an ImportError per row."""
    if not _SF_PROBE:
        try:
            import soundfile  # noqa: PLC0415

            _SF_PROBE.append(soundfile)
        except Exception:
            _SF_PROBE.append(None)
    return _SF_PROBE[0]


def decode_audio_any(payload: bytes):
    """Tiered audio decode: stdlib PCM WAV first (`decode_audio_wav`,
    always available), then the optional soundfile adapter for
    compressed/container codecs (FLAC/OGG/MP3/...) when it is importable
    on this worker (`_optional_soundfile`; DEPLOYMENT.md §codecs).
    Returns (mono float32 array in [-1, 1], sample_rate), or None when
    no available tier can decode the payload — malformed media in a
    100 TB corpus must degrade, not kill the stage. The audio mirror of
    `decode_image_any`."""
    decoded = decode_audio_wav(payload)
    if decoded is not None:
        return decoded
    sf = _optional_soundfile()
    if sf is None or not payload:
        return None
    import io

    import numpy as np

    try:
        x, rate = sf.read(io.BytesIO(payload), dtype="float32", always_2d=True)
    except Exception:
        return None
    if x.size == 0:
        return None
    return np.ascontiguousarray(x.mean(axis=1, dtype=np.float32)), int(rate)


def audio_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Real signal features (RMS, zero-crossing rate, FFT spectral
    centroid), numpy over Arrow batches, no shuffle. Decodes through the
    tiered adapter (`decode_audio_any`): PCM WAV always (stdlib `wave`),
    compressed codecs (FLAC/OGG/MP3/...) when `soundfile` is importable
    on the executors (DEPLOYMENT.md §codecs). Undecodable payloads yield
    NULL features (their metadata row remains, so coverage accounting
    stays possible downstream) — or raise when ``strict=True``, naming
    the missing optional dependency (same contract as resize_images)."""

    def _extract(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {c: [] for c in ("media_id", "sample_rate", "n_samples", "rms",
                                   "zero_crossing_rate", "spectral_centroid_hz")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                decoded = decode_audio_any(b) if b else None
                if decoded is None or len(decoded[0]) == 0:
                    if strict and decoded is None:
                        have_sf = _optional_soundfile() is not None
                        raise NotImplementedError(
                            "cannot decode audio payload: "
                            + (
                                "payload is malformed or an unsupported codec "
                                "(soundfile is present on this worker)"
                                if have_sf
                                else "the stdlib decoder covers PCM WAV only; "
                                "install soundfile on the executors "
                                "(DEPLOYMENT.md §codecs) for FLAC/OGG/MP3/..."
                            )
                            + "; pass strict=False to emit NULL features instead"
                        )
                    vals = (None, None, None, None, None)
                else:
                    x, rate = decoded
                    mag = np.abs(np.fft.rfft(x))
                    freqs = np.fft.rfftfreq(len(x), d=1.0 / rate)
                    msum = float(mag.sum())
                    vals = (
                        rate,
                        len(x),
                        float(np.sqrt(np.mean(x * x))),
                        float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))),
                        float((freqs * mag).sum() / msum) if msum > 0 else 0.0,
                    )
                out["media_id"].append(mid)
                for k, v in zip(("sample_rate", "n_samples", "rms",
                                 "zero_crossing_rate", "spectral_centroid_hz"), vals):
                    out[k].append(v)
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(_extract, schema=AUDIO_FEATURES_SCHEMA)
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: emits one metadata row per sampled
    timestamp via an exploded sequence — pure Catalyst, no decode. The
    decoded-pixels form is `extract_frames` (tiered codec adapter, same
    contract as resize_images/audio_features)."""
    n_frames = (F.coalesce(F.col("duration_ms"), F.lit(0)) / every_ms).cast("int")
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ms",
            F.explode(F.sequence(F.lit(0), n_frames * every_ms, F.lit(every_ms))),
        )
        .select("media_id", "mime", "frame_ms")
    )


def decode_y4m_frames(payload: bytes, every_ms: int = 1000):
    """Pure-stdlib+numpy decode of uncompressed YUV4MPEG2 (.y4m) video —
    the video mirror of decode_image's BMP/PPM tier: a real public
    container (mjpegtools) with a text header and raw planar frames, so
    the always-available path exercises genuine pixel plumbing. Returns
    [(frame_ms, HxWx3 uint8 RGB)] sampled at every_ms boundaries (the
    FIRST frame at or after each k*every_ms), or None for non-Y4M /
    malformed payloads. C420* (2x2 subsampled, nearest upsample) and
    C444 colorspaces; BT.601 limited-range YCbCr -> RGB."""
    import numpy as np

    if not payload.startswith(b"YUV4MPEG2"):
        return None
    try:
        nl = payload.index(b"\n")
    except ValueError:
        return None
    w = h = 0
    fps_num, fps_den = 25, 1  # Y4M default when F is absent
    cspace = "420"
    for tok in payload[9:nl].split(b" "):
        if not tok:
            continue
        tag, val = chr(tok[0]), tok[1:]
        try:
            if tag == "W":
                w = int(val)
            elif tag == "H":
                h = int(val)
            elif tag == "F":
                num, den = val.split(b":")
                fps_num, fps_den = int(num), int(den)
            elif tag == "C":
                cspace = val.decode("ascii", "replace")
        except ValueError:
            return None
    if w <= 0 or h <= 0 or fps_num <= 0 or fps_den <= 0:
        return None
    if cspace.startswith("420"):
        uv_w, uv_h = (w + 1) // 2, (h + 1) // 2
    elif cspace.startswith("444"):
        uv_w, uv_h = w, h
    else:
        return None  # 422/mono/alpha variants: not in the stdlib tier
    y_sz, uv_sz = w * h, uv_w * uv_h

    def to_rgb(buf: bytes):
        y = np.frombuffer(buf, np.uint8, y_sz).reshape(h, w).astype(np.float32)
        u = np.frombuffer(buf, np.uint8, uv_sz, y_sz).reshape(uv_h, uv_w)
        v = np.frombuffer(buf, np.uint8, uv_sz, y_sz + uv_sz).reshape(uv_h, uv_w)
        if uv_w != w:  # nearest-neighbor chroma upsample
            u = u.repeat(2, 0)[:h].repeat(2, 1)[:, :w]
            v = v.repeat(2, 0)[:h].repeat(2, 1)[:, :w]
        u = u.astype(np.float32) - 128.0
        v = v.astype(np.float32) - 128.0
        c = 1.164 * (y - 16.0)
        rgb = np.stack(
            [c + 1.596 * v, c - 0.392 * u - 0.813 * v, c + 2.017 * u], axis=-1
        )
        return np.clip(rgb, 0.0, 255.0).astype(np.uint8)

    frames, pos, idx, next_ms = [], nl + 1, 0, 0
    while pos < len(payload):
        line_end = payload.find(b"\n", pos)
        if line_end < 0 or not payload.startswith(b"FRAME", pos):
            return None  # truncated / corrupt frame header
        data = line_end + 1
        if data + y_sz + 2 * uv_sz > len(payload):
            return None
        frame_ms = (idx * 1000 * fps_den) // fps_num
        if frame_ms >= next_ms:
            frames.append((int(frame_ms), to_rgb(payload[data:])))
            next_ms = (frame_ms // every_ms + 1) * every_ms
        pos = data + y_sz + 2 * uv_sz
        idx += 1
    return frames


_AV_PROBE: list = []  # [] = unprobed; [None] = absent; [module] = usable


def _optional_av():
    """Per-worker-process capability probe for the optional PyAV
    dependency (the video mirror of `_optional_pil` /
    `_optional_soundfile`): one import attempt per Python worker (module
    state is per-process and workers are reused), so the absent case
    costs a single cached None check per payload, not an ImportError per
    row."""
    if not _AV_PROBE:
        try:
            import av  # noqa: PLC0415

            _AV_PROBE.append(av)
        except Exception:
            _AV_PROBE.append(None)
    return _AV_PROBE[0]


def decode_video_any(payload: bytes, every_ms: int = 1000):
    """Tiered video frame decode: stdlib/numpy Y4M first
    (`decode_y4m_frames`, always available), then the optional PyAV
    adapter for compressed containers/codecs (H.264/VP9/AV1 in
    mp4/webm/mkv/...) when it is importable on this worker
    (`_optional_av`; DEPLOYMENT.md §codecs). Returns [(frame_ms, HxWx3
    uint8 RGB)] sampled at every_ms boundaries (the FIRST frame at or
    after each k*every_ms — identical rule in both tiers), or None when
    no available tier can decode the payload — malformed media in a
    100 TB corpus must degrade, not kill the stage."""
    frames = decode_y4m_frames(payload, every_ms)
    if frames is not None:
        return frames
    av = _optional_av()
    if av is None or not payload:
        return None
    import io

    import numpy as np

    try:
        out, next_ms = [], 0
        with av.open(io.BytesIO(payload)) as container:
            vstreams = [s for s in container.streams if s.type == "video"]
            if not vstreams:
                return None
            for frame in container.decode(vstreams[0]):
                t = frame.time  # seconds, from pts * time_base
                frame_ms = int(t * 1000) if t is not None else 0
                if frame_ms >= next_ms:
                    out.append(
                        (
                            frame_ms,
                            np.asarray(frame.to_rgb().to_ndarray(), dtype=np.uint8),
                        )
                    )
                    next_ms = (frame_ms // every_ms + 1) * every_ms
        return out or None
    except Exception:
        return None


FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_ms", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
    ]
)


def extract_frames(
    media: DataFrame, every_ms: int = 1000, strict: bool = False
) -> DataFrame:
    """Decoded video frame sampling over Arrow batches — the pixels form
    of `sample_frames`. Decodes through the tiered adapter
    (`decode_video_any`): uncompressed YUV4MPEG2 always (stdlib+numpy),
    compressed codecs (H.264/VP9/... in mp4/webm/mkv) when PyAV is
    importable on the executors (DEPLOYMENT.md §codecs). Emits one row
    per sampled frame with the pixels re-encoded as binary PPM (the same
    currency resize_images emits, so the two operators compose). A
    payload NO available tier can decode emits a single NULL-frame row
    (the media_id remains, so coverage accounting stays possible
    downstream) — or raises when ``strict=True``, naming the missing
    optional dependency. Dedup-before-decode applies per batch
    (identical payloads decode once). Scale shape: map-only, no shuffle;
    frame fan-out happens inside the Arrow batch."""

    def _frames(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            cache: dict[bytes, list] = {}
            out = {c: [] for c in (
                "media_id", "frame_ms", "width", "height", "mime", "payload"
            )}
            for row in pdf.itertuples(index=False):
                b = bytes(row.payload) if row.payload is not None else b""
                if b not in cache:
                    frames = decode_video_any(b, every_ms) if b else None
                    if frames is None and strict:
                        have_av = _optional_av() is not None
                        raise NotImplementedError(
                            f"cannot decode video payload (mime={row.mime!r}): "
                            + (
                                "payload is malformed or an unsupported codec "
                                "(PyAV is present on this worker)"
                                if have_av
                                else "the stdlib decoder covers uncompressed "
                                "YUV4MPEG2 (.y4m) only; install PyAV on the "
                                "executors (DEPLOYMENT.md §codecs) for "
                                "H.264/VP9/mp4/webm/..."
                            )
                            + "; pass strict=False to emit a NULL-frame row instead"
                        )
                    cache[b] = frames
                frames = cache[b]
                if not frames:
                    out["media_id"].append(row.media_id)
                    for k in ("frame_ms", "width", "height", "mime", "payload"):
                        out[k].append(None)
                    continue
                for frame_ms, arr in frames:
                    out["media_id"].append(row.media_id)
                    out["frame_ms"].append(frame_ms)
                    out["height"].append(arr.shape[0])
                    out["width"].append(arr.shape[1])
                    out["mime"].append("image/x-portable-pixmap")
                    out["payload"].append(encode_ppm(arr))
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "mime", "payload")
        .mapInPandas(_frames, schema=FRAMES_SCHEMA)
    )
