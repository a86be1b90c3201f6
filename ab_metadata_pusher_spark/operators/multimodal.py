"""Multimodal column plumbing (SURVEY.md §2.G north star).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so bytes stream executor-side in columnar batches and
never transit the driver.

The real decoders (PIL/librosa/av) are NOT in this container, so decode is
STUBBED: ``decode_features`` computes deterministic byte-level features and
raises ``NotImplementedError`` from the clearly-marked hook if a real codec
is requested.  Everything Spark-side — schema, partitioning, batch shape,
UDF signature — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["with_binary_payload", "decode_features", "DECODE_SCHEMA",
           "IMAGE_SCHEMA", "resize_payload", "sample_frames",
           "RESIZE_SCHEMA", "FRAME_SCHEMA", "with_wav_payload",
           "decode_audio_wave", "AUDIO_SCHEMA", "with_avi_payload",
           "decode_video_avi", "VIDEO_SCHEMA", "audio_fingerprint",
           "AUDIO_FP_SCHEMA", "image_phash", "PHASH_SCHEMA"]


def with_binary_payload(documents: DataFrame) -> DataFrame:
    """Wrap the documents fixture as a multimodal table: payload bytes
    (UTF-8 of text — the deterministic stand-in for image bytes) plus a
    typed metadata struct, the schema a real ingest would carry."""
    return documents.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length("text").alias("byte_len"),
            F.col("source").alias("origin"),
        ).alias("media_meta"),
    )


DECODE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("byte_len", T.IntegerType()),
    T.StructField("payload_md5", T.StringType()),
    T.StructField("first_byte", T.IntegerType()),
    T.StructField("byte_mean", T.DoubleType()),
])


IMAGE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mode", T.StringType()),
    T.StructField("img_format", T.StringType()),
    T.StructField("byte_len", T.IntegerType()),
])


def _decode_image_pil(multimodal: DataFrame) -> DataFrame:
    """Real image decode via Pillow (optional dependency): width/height/
    mode/format per payload, Arrow-batched.  Raises NotImplementedError
    at PLAN time when Pillow is absent, so callers fail fast on the
    driver instead of per-task on executors."""
    try:
        import PIL  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "codec 'pil' requires pillow (`pip install pillow`); this "
            "runtime does not have it — use codec='stub' for the "
            "deterministic byte-level features") from exc

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from PIL import Image

        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [], "mode": [],
                   "img_format": [], "byte_len": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                out["doc_id"].append(doc_id)
                out["byte_len"].append(len(b))
                try:
                    with Image.open(io.BytesIO(b)) as img:
                        out["width"].append(img.width)
                        out["height"].append(img.height)
                        out["mode"].append(img.mode)
                        out["img_format"].append(img.format or "")
                except Exception:  # undecodable payload -> sentinel row
                    out["width"].append(-1)
                    out["height"].append(-1)
                    out["mode"].append("")
                    out["img_format"].append("")
            pdf_out = pd.DataFrame(out)
            pdf_out["width"] = pdf_out["width"].astype("int32")
            pdf_out["height"] = pdf_out["height"].astype("int32")
            pdf_out["byte_len"] = pdf_out["byte_len"].astype("int32")
            yield pdf_out

    return (multimodal.select("doc_id", "payload")
            .mapInPandas(extract, IMAGE_SCHEMA))


def decode_features(multimodal: DataFrame, codec: str = "stub") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``codec="stub"`` computes deterministic byte statistics (the plumbing
    under test).  ``codec="pil"`` decodes real image metadata via Pillow
    when installed (NotImplementedError otherwise).  Audio has a real
    stdlib path with its own schema — ``decode_audio_wave``.  Video has
    two passes with their own schemas: ``decode_video_avi`` (stdlib
    container headers, always available) and ``decode_video_frames_av``
    (real frame pixels, PyAV-gated).
    """
    if codec == "pil":
        return _decode_image_pil(multimodal)
    if codec != "stub":
        # Audio is covered by decode_audio_wave (stdlib wave, its own
        # schema); video frames by decode_video_frames_av (PyAV-gated,
        # its own schema) with decode_video_avi as the always-available
        # stdlib container-header pass.
        raise NotImplementedError(
            f"codec {codec!r}: only 'stub' (always) and 'pil' (when "
            "pillow is installed) share this schema; WAV audio -> "
            "decode_audio_wave, video -> decode_video_frames_av (PyAV) "
            "/ decode_video_avi (stdlib headers)")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "byte_len": payloads.map(len).astype("int32"),
                "payload_md5": payloads.map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()),
                "first_byte": payloads.map(
                    lambda b: b[0] if len(b) else -1).astype("int32"),
                # half-up rounding (SQL round), not numpy's half-to-even:
                # sum/len hits exact .00005 boundaries
                "byte_mean": payloads.map(
                    lambda b: (int((sum(b) / len(b)) * 1e4 + 0.5) / 1e4
                               if len(b) else 0.0)),
            })

    return (multimodal.select("doc_id", "payload")
            .mapInPandas(extract, DECODE_SCHEMA))


_WAV_RATES = (8000, 16000, 44100)

_WAV_PAYLOAD_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
])

AUDIO_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("sampwidth", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("duration_us", T.LongType()),
    T.StructField("pcm_md5", T.StringType()),
])


def with_wav_payload(documents: DataFrame) -> DataFrame:
    """Wrap the documents fixture as an audio table: each row carries a
    REAL RIFF/WAVE payload synthesized deterministically from the row
    (sample rate / channel count / frame count are fixed functions of
    ``doc_id`` and ``length(text)``; PCM samples are a seeded integer
    sequence).  Encoding runs executor-side through stdlib ``wave`` in
    Arrow batches — the payloads are genuine WAV files, so the decode
    path downstream parses real headers, not a fake."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import struct
        import wave

        for pdf in batches:
            out = {"doc_id": [], "payload": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                doc_id = int(doc_id)
                rate = _WAV_RATES[doc_id % 3]
                channels = 1 + doc_id % 2
                n_frames = 50 + len(text or "") % 100
                n_samples = n_frames * channels
                pcm = struct.pack(
                    f"<{n_samples}h",
                    *[(doc_id * 7 + i) % 251 - 125 for i in range(n_samples)])
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(channels)
                    w.setsampwidth(2)
                    w.setframerate(rate)
                    w.writeframes(pcm)
                out["doc_id"].append(doc_id)
                out["payload"].append(buf.getvalue())
            yield pd.DataFrame(out)

    return (documents.select("doc_id", "text")
            .mapInPandas(synth, _WAV_PAYLOAD_SCHEMA))


def decode_audio_wave(multimodal: DataFrame) -> DataFrame:
    """REAL audio decode via stdlib ``wave`` (no optional dependency):
    parse each binary payload's RIFF/WAVE header and frames, emitting
    sample rate / channels / sample width / frame count / exact
    integer-microsecond duration / PCM digest.  Arrow-batched
    ``mapInPandas``, same executor-side shape as the image path;
    undecodable payloads produce a sentinel row (-1 dims) rather than
    failing the batch, matching ``_decode_image_pil``."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import io
        import wave

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "sample_rate", "channels",
                                   "sampwidth", "n_frames", "duration_us",
                                   "pcm_md5")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(int(doc_id))
                try:
                    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                        rate = w.getframerate()
                        nf = w.getnframes()
                        out["sample_rate"].append(rate)
                        out["channels"].append(w.getnchannels())
                        out["sampwidth"].append(w.getsampwidth())
                        out["n_frames"].append(nf)
                        # exact integer microseconds — no float boundary
                        out["duration_us"].append(nf * 1_000_000 // rate)
                        out["pcm_md5"].append(
                            hashlib.md5(w.readframes(nf)).hexdigest())
                except Exception:
                    out["sample_rate"].append(-1)
                    out["channels"].append(-1)
                    out["sampwidth"].append(-1)
                    out["n_frames"].append(-1)
                    out["duration_us"].append(-1)
                    out["pcm_md5"].append("")
            pdf_out = pd.DataFrame(out)
            for c in ("sample_rate", "channels", "sampwidth", "n_frames"):
                pdf_out[c] = pdf_out[c].astype("int32")
            yield pdf_out

    return (multimodal.select("doc_id", "payload")
            .mapInPandas(decode, AUDIO_SCHEMA))


AUDIO_FP_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_windows", T.IntegerType()),
    T.StructField("total_energy", T.LongType()),
    T.StructField("fp_bits", T.StringType()),
])


def audio_fingerprint(multimodal: DataFrame,
                      frames_per_window: int = 25) -> DataFrame:
    """Acoustic fingerprint for audio dedup (a Chromaprint-style energy
    fingerprint, reduced to its distributable core): decode each WAV
    payload, split the PCM stream into fixed ``frames_per_window``
    windows, and emit one bit per window — 1 when the window's absolute
    energy is at or above the track mean.  All-integer math
    (``energy * n_windows >= total_energy`` avoids the float mean), so
    the bit string is exactly reproducible on any engine.

    The 100 TB shape matches the other multimodal decoders: Arrow-batched
    ``mapInPandas``, per-row work linear in payload bytes, no shuffle —
    downstream dedup groups by the (short) fingerprint string exactly
    like exact text dedup groups by md5 (operators/dedup.py).
    Parity with the reference: the reference has no media path at all
    (SURVEY.md §2.G); this extends the decode_audio_wave surface."""

    def fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        import numpy as np

        for pdf in batches:
            out = {"doc_id": [], "n_windows": [], "total_energy": [],
                   "fp_bits": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(int(doc_id))
                try:
                    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                        ch = w.getnchannels()
                        nf = w.getnframes()
                        pcm = np.frombuffer(w.readframes(nf), dtype="<i2")
                except Exception:
                    out["n_windows"].append(-1)
                    out["total_energy"].append(-1)
                    out["fp_bits"].append("")
                    continue
                amp = np.abs(pcm.astype(np.int64))
                nw = -(-nf // frames_per_window)
                energies = [
                    int(amp[w0 * frames_per_window * ch:
                            min((w0 + 1) * frames_per_window, nf) * ch].sum())
                    for w0 in range(nw)]
                tot = sum(energies)
                out["n_windows"].append(nw)
                out["total_energy"].append(tot)
                out["fp_bits"].append(
                    "".join("1" if e * nw >= tot else "0" for e in energies))
            pdf_out = pd.DataFrame(out)
            pdf_out["n_windows"] = pdf_out["n_windows"].astype("int32")
            yield pdf_out

    return (multimodal.select("doc_id", "payload")
            .mapInPandas(fp, AUDIO_FP_SCHEMA))


VIDEO_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("total_frames", T.IntegerType()),
    T.StructField("us_per_frame", T.IntegerType()),
    T.StructField("duration_us", T.LongType()),
])

_AVI_RATES_US = (33333, 41708, 16667)  # ~30, ~23.976, ~60 fps


def _avi_bytes(us_per_frame: int, total_frames: int,
               width: int, height: int) -> bytes:
    """Minimal valid RIFF/AVI: LIST hdrl with a 56-byte avih chunk plus
    an empty LIST movi.  Stdlib struct only — the container format is
    just sized chunks."""
    import struct

    avih = struct.pack("<14I", us_per_frame, 0, 0, 0, total_frames, 0,
                       1, 0, width, height, 0, 0, 0, 0)
    hdrl = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
    movi = b"movi"
    body = (b"AVI " + b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
            + b"LIST" + struct.pack("<I", len(movi)) + movi)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def with_avi_payload(documents: DataFrame) -> DataFrame:
    """Wrap the documents fixture as a video table: each row carries a
    REAL RIFF/AVI container (header-only — empty movi list) whose
    dimensions/frame-rate/frame-count are fixed functions of the row.
    The WAV twin (``with_wav_payload``) for the video path."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "payload": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                doc_id = int(doc_id)
                out["doc_id"].append(doc_id)
                out["payload"].append(_avi_bytes(
                    _AVI_RATES_US[doc_id % 3],
                    24 + len(text or "") % 240,
                    320 + 16 * (doc_id % 4),
                    240 + 16 * (doc_id % 3)))
            yield pd.DataFrame(out)

    return (documents.select("doc_id", "text")
            .mapInPandas(synth, _WAV_PAYLOAD_SCHEMA))


def decode_video_avi(multimodal: DataFrame) -> DataFrame:
    """REAL video container decode, stdlib-only: walk the RIFF chunk
    tree, locate the ``avih`` main header, emit dimensions / frame rate
    / frame count / exact integer-microsecond duration.  Frame PIXEL
    decode needs a codec: ``decode_video_frames_av`` (PyAV-gated, fails
    fast at plan time where av is absent) — the same split a production
    pipeline uses (cheap header pass to filter/route, expensive codec
    pass only on survivors).  Malformed payloads yield sentinel rows
    (-1), matching the image/audio decoders."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        def parse(b: bytes):
            if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
                raise ValueError("not an AVI")
            pos = 12
            while pos + 8 <= len(b):
                tag = b[pos:pos + 4]
                size = struct.unpack_from("<I", b, pos + 4)[0]
                if tag == b"LIST":
                    if b[pos + 8:pos + 12] == b"hdrl":
                        pos += 12  # descend into the list body
                        continue
                    pos += 8 + size + (size & 1)
                    continue
                if tag == b"avih":
                    f = struct.unpack_from("<14I", b, pos + 8)
                    return f[0], f[4], f[8], f[9]
                pos += 8 + size + (size & 1)
            raise ValueError("no avih chunk")

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "width", "height",
                                   "total_frames", "us_per_frame",
                                   "duration_us")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(int(doc_id))
                try:
                    upf, nf, w, h = parse(bytes(payload))
                    out["width"].append(w)
                    out["height"].append(h)
                    out["total_frames"].append(nf)
                    out["us_per_frame"].append(upf)
                    out["duration_us"].append(nf * upf)
                except Exception:
                    for k in ("width", "height", "total_frames",
                              "us_per_frame", "duration_us"):
                        out[k].append(-1)
            pdf_out = pd.DataFrame(out)
            for c in ("width", "height", "total_frames", "us_per_frame"):
                pdf_out[c] = pdf_out[c].astype("int32")
            yield pdf_out

    return (multimodal.select("doc_id", "payload")
            .mapInPandas(decode, VIDEO_SCHEMA))


VIDEO_FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("frame_md5", T.StringType()),
    T.StructField("mean_luma", T.DoubleType()),
])


def decode_video_frames_av(multimodal: DataFrame,
                           every_nth: int = 10) -> DataFrame:
    """Real frame-PIXEL decode via PyAV (optional dependency) — the codec
    half of the video path (decode_video_avi covers the container-header
    half stdlib-only).  Every ``every_nth`` frame is decoded to grayscale
    and reduced to (dims, content hash, mean luma) — the cheap per-frame
    features a dedup/quality pass consumes.  Mirrors the Pillow gate:
    raises NotImplementedError at PLAN time when ``av`` is absent, so
    callers fail fast on the driver instead of per-task on executors;
    tests assert the implemented branch where av exists and the gate
    where it does not.  Malformed payloads yield a single sentinel row
    (frame_idx -1), matching the image/audio decoders."""
    try:
        import av  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "video frame decode requires PyAV (`pip install av`); this "
            "runtime does not have it — decode_video_avi provides the "
            "stdlib container-metadata pass") from exc

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import io

        import av as _av

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "frame_idx", "width",
                                   "height", "frame_md5", "mean_luma")}

            def emit(doc_id, idx, w, h, md5, luma):
                out["doc_id"].append(int(doc_id))
                out["frame_idx"].append(idx)
                out["width"].append(w)
                out["height"].append(h)
                out["frame_md5"].append(md5)
                out["mean_luma"].append(luma)

            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    with _av.open(io.BytesIO(bytes(payload))) as container:
                        for i, frame in enumerate(
                                container.decode(video=0)):
                            if i % every_nth:
                                continue
                            gray = frame.to_ndarray(format="gray")
                            emit(doc_id, i, frame.width, frame.height,
                                 hashlib.md5(gray.tobytes()).hexdigest(),
                                 float(gray.mean()))
                except Exception:  # undecodable payload -> sentinel row
                    emit(doc_id, -1, -1, -1, "", -1.0)
            pdf_out = pd.DataFrame(out)
            for c in ("frame_idx", "width", "height"):
                pdf_out[c] = pdf_out[c].astype("int32")
            yield pdf_out

    return (multimodal.select("doc_id", "payload")
            .mapInPandas(decode, VIDEO_FRAME_SCHEMA))


RESIZE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("resized_md5", T.StringType()),
    T.StructField("n_bytes", T.IntegerType()),
])


def resize_payload(multimodal: DataFrame, out_bytes: int = 32) -> DataFrame:
    """'Resize' stub: deterministic stride resample of each payload to a
    fixed byte budget (index i draws byte floor(i*len/out)) — the exact
    plumbing shape of image thumbnailing (big binary in, small binary
    out, 1:1 rows), minus the codec."""

    def resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = {"doc_id": [], "resized_md5": [], "n_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                resized = bytes(b[(i * len(b)) // out_bytes]
                                for i in range(out_bytes))
                out["doc_id"].append(doc_id)
                out["resized_md5"].append(hashlib.md5(resized).hexdigest())
                out["n_bytes"].append(len(resized))
            yield pd.DataFrame(out)

    return (multimodal.select("doc_id", "payload")
            .mapInPandas(resample, RESIZE_SCHEMA))


FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_md5", T.StringType()),
    T.StructField("frame_len", T.IntegerType()),
])


def sample_frames(multimodal: DataFrame, frame_bytes: int = 64,
                  every: int = 2) -> DataFrame:
    """Frame-sampling stub: treat the payload as fixed-size frames and
    emit every ``every``-th frame — the 1:N fan-out shape of video frame
    extraction (batch in, more rows out), minus the demuxer."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_md5": [],
                   "frame_len": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for idx in range(0, n_frames, every):
                    frame = b[idx * frame_bytes:(idx + 1) * frame_bytes]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_md5"].append(hashlib.md5(frame).hexdigest())
                    out["frame_len"].append(len(frame))
            yield pd.DataFrame(out)

    return (multimodal.select("doc_id", "payload")
            .mapInPandas(sample, FRAME_SCHEMA))


PHASH_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("phash", T.LongType()),
])


def image_phash(multimodal: DataFrame, cells: int = 64) -> DataFrame:
    """64-bit perceptual average-hash over binary payloads — the
    standard near-dup key for image corpora (aHash: downsample to a
    cell grid, bit = cell mean > global mean).

    The "decode" here is the engine's deterministic stand-in (payload
    bytes ARE the pixel stream, split into ``cells`` equal chunks —
    numpy vectorized per Arrow batch); swap the chunk-means line for
    ``PIL.Image.open(...).convert("L").resize((8, 8))`` pixels when a
    real codec is present and everything downstream (packing, the
    pigeonhole Hamming join in operators/dedup.py hamming_pairs) is
    unchanged.  Bit 63 packs via uint64 and reinterprets as signed, so
    the full 64-bit hash survives Spark's signed long.
    """
    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = np.zeros(len(pdf), dtype=np.uint64)
            for row, payload in enumerate(pdf["payload"]):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                if not len(arr):
                    continue
                means = np.array([c.mean() if len(c) else 0.0
                                  for c in np.array_split(arr, cells)])
                bits = means > arr.mean()
                h = np.uint64(0)
                for j, b in enumerate(bits):
                    if b:
                        h |= np.uint64(1) << np.uint64(j)
                out[row] = h
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "phash": out.astype(np.int64),
            })

    return (multimodal.select("doc_id", "payload")
            .mapInPandas(fold, PHASH_SCHEMA))
