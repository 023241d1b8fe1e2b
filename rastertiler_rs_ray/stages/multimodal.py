"""Multimodal (image/audio/video) column stages — real plumbing, stubbed codecs.

Media payloads are opaque ``binary`` columns with typed metadata
(``media_kind``, ``media_w``, ``media_h``, ...).  The Ray-side shape is
fully real and tested: actor pools via ``map_batches`` (decoder state
warmed once per actor, §2.3), ``batch_format="pyarrow"`` zero-copy
binary in/out, SMALL ``batch_size`` because payload rows are wide
(SURVEY §7.6.6), and output schemas fixed so downstream stages splice.

The codec layer is a RESOLUTION CHAIN (``resolve_image_decoder``):

1. Pillow, when importable (optional import — absent in this
   container, exercised by a skip-marked test) — any format;
2. the repo's own pure-Python PNG reader (``png.writer.decode_png``,
   filters 0-4) — a REAL decode path that runs here, fed by real PNG
   bytes;
3. under ``fake=True`` a deterministic fake that derives pixel content
   from a hash of the payload bytes (for plumbing tests over synthetic
   non-image payloads).

``MediaDecoder(fake=False)`` therefore performs genuine decodes in
every environment; registering another codec is one entry in the chain.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data


def _fake_pixels(payload: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic fake decode: counter-mode sha256 of the payload."""
    seed = np.frombuffer(hashlib.sha256(payload).digest()[:8], dtype=np.uint64)[0]
    n = w * h
    i = np.arange(n, dtype=np.uint64)
    v = i * np.uint64(0x9E3779B97F4A7C15) ^ seed
    v ^= v >> np.uint64(31)
    return (v & np.uint64(0xFF)).astype(np.uint8).reshape(h, w)


def _real_decode_unavailable(kind: str):
    raise NotImplementedError(
        f"real {kind} decoding requires a codec library (ffmpeg) not "
        "present in this environment — register one in the decoder chain"
    )


def _pillow_decoder():
    """Pillow-backed grayscale decode, or None if Pillow is absent."""
    try:
        import io

        from PIL import Image  # optional dependency
    except ImportError:
        return None

    def decode(payload: bytes) -> np.ndarray:
        with Image.open(io.BytesIO(payload)) as im:
            return np.asarray(im.convert("L"), dtype=np.uint8)

    return decode


def _builtin_png_decoder():
    """The repo's own pure-Python PNG reader (filters 0-4, gray/indexed
    8-bit) — a real decode path with no external dependency."""
    from ..png.writer import decode_png

    def decode(payload: bytes) -> np.ndarray:
        info = decode_png(payload)
        px = info["pixels"]
        if px.ndim == 3:  # RGB → luma (integer BT.601 approximation)
            px = (
                (77 * px[..., 0].astype(np.uint32)
                 + 150 * px[..., 1].astype(np.uint32)
                 + 29 * px[..., 2].astype(np.uint32)) >> 8
            ).astype(np.uint8)
        if info["bit_depth"] != 8:
            px = (px.astype(np.uint32) * 255 // ((1 << info["bit_depth"]) - 1)).astype(
                np.uint8
            )
        return np.ascontiguousarray(px, dtype=np.uint8)

    return decode


def _builtin_bmp_decoder():
    """Pure-Python BMP reader (png/bmp.py): BI_RGB 8-bit palettized and
    24-bit BGR → grayscale, same luma reduction as the PNG path."""
    from ..png.bmp import decode_bmp

    return decode_bmp


def resolve_image_decoder():
    """Format-sniffing real-codec chain, resolved once per actor
    (``__init__``): payload magic picks the builtin pure-Python PNG or
    BMP reader; anything else falls through to Pillow when importable.
    Adding a codec = one more (magic, decoder) row."""
    png = _builtin_png_decoder()
    bmp = _builtin_bmp_decoder()
    pillow = _pillow_decoder()

    def decode(payload: bytes) -> np.ndarray:
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            return png(payload)
        if payload[:2] == b"BM":
            return bmp(payload)
        if pillow is not None:
            return pillow(payload)
        raise ValueError(
            f"unrecognized image payload (magic {payload[:4]!r}) and no "
            "fallback codec (Pillow) available"
        )

    return decode


class MediaDecoder:
    """Actor-pool stage: binary payload → decoded grayscale pixel grid.

    Output adds ``pixels: fixed_size_list<uint8>[out_w*out_h]`` (decoded
    + nearest-neighbour resized) and ``media_hash: int64``.
    """

    def __init__(self, out_w: int = 32, out_h: int = 32, *, fake: bool = True,
                 payload_col: str = "payload"):
        self.out_w, self.out_h = int(out_w), int(out_h)
        self.fake = fake
        self.payload_col = payload_col
        # codec resolution happens once per actor, here
        self._real = None if fake else resolve_image_decoder()

    def _decode(self, payload: bytes, w: int, h: int) -> np.ndarray:
        if not self.fake:
            return self._real(payload)
        return _fake_pixels(payload, w, h)

    def _resize_nn(self, img: np.ndarray) -> np.ndarray:
        # nearest-neighbour center-of-target sampling — the same index
        # math as the raster read kernel (M17 semantics)
        h, w = img.shape
        ys = np.minimum(((np.arange(self.out_h) + 0.5) * h / self.out_h).astype(np.int64), h - 1)
        xs = np.minimum(((np.arange(self.out_w) + 0.5) * w / self.out_w).astype(np.int64), w - 1)
        return img[np.ix_(ys, xs)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        ws = batch.column("media_w").to_numpy(zero_copy_only=False)
        hs = batch.column("media_h").to_numpy(zero_copy_only=False)
        n = len(batch)
        out = np.empty((n, self.out_h * self.out_w), dtype=np.uint8)
        hashes = np.empty(n, dtype=np.int64)
        for i in range(n):  # per-payload decode is inherently per-row I/O
            img = self._resize_nn(self._decode(payloads[i] or b"", int(ws[i]), int(hs[i])))
            out[i] = img.reshape(-1)
            hashes[i] = np.int64(np.uint64(int.from_bytes(
                hashlib.sha256(payloads[i] or b"").digest()[:8], "big") & 0x7FFFFFFFFFFFFFFF))
        pix = pa.FixedSizeListArray.from_arrays(
            pa.array(out.reshape(-1), pa.uint8()), self.out_h * self.out_w
        )
        return (
            batch.append_column("pixels", pix)
            .append_column("media_hash", pa.array(hashes, pa.int64()))
        )


class MediaFeatureExtractor:
    """Actor-pool stage: decoded pixels → feature vector (mean/std/
    histogram moments).  Fully vectorized over the batch."""

    def __init__(self, side: int = 32, pixels_col: str = "pixels"):
        self.side = side
        self.pixels_col = pixels_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        px = np.asarray(batch.column(self.pixels_col).combine_chunks().flatten()).reshape(n, -1)
        feats = np.stack(
            [
                px.mean(axis=1),
                px.std(axis=1),
                np.percentile(px, 25, axis=1),
                np.percentile(px, 75, axis=1),
            ],
            axis=1,
        ).astype(np.float32)
        col = pa.FixedSizeListArray.from_arrays(pa.array(feats.reshape(-1), pa.float32()), 4)
        return batch.append_column("media_features", col)


class FrameSampler:
    """Actor-pool stage: video payload → K deterministically-sampled
    frames, each decoded + NN-resized like the image path.

    Frame selection uses the same center-of-target index math as the
    raster NN kernel over ``media_frames``: frame ``floor((k+0.5)·F/K)``.
    Output adds ``frame_idx: list<int32>`` and ``frames:
    fixed_size_list<uint8>[K·w·h]``.  Codec gated like MediaDecoder —
    the fake decode varies by (payload, frame index) so sampled frames
    differ deterministically.
    """

    def __init__(self, k: int = 4, out_w: int = 16, out_h: int = 16, *,
                 fake: bool = True, payload_col: str = "payload"):
        self.k, self.out_w, self.out_h = int(k), int(out_w), int(out_h)
        self.fake = fake
        self.payload_col = payload_col

    def _decode_frame(self, payload: bytes, idx: int, w: int, h: int) -> np.ndarray:
        if not self.fake:
            _real_decode_unavailable("video")
        return _fake_pixels(payload + idx.to_bytes(4, "big"), w, h)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        ws = batch.column("media_w").to_numpy(zero_copy_only=False)
        hs = batch.column("media_h").to_numpy(zero_copy_only=False)
        nframes = batch.column("media_frames").to_numpy(zero_copy_only=False)
        n = len(batch)
        fsz = self.out_w * self.out_h
        out = np.empty((n, self.k * fsz), dtype=np.uint8)
        picked: list[list[int]] = []
        ys = None
        for i in range(n):  # per-payload decode is inherently per-row I/O
            f = max(int(nframes[i]), 1)
            sel = np.minimum(
                ((np.arange(self.k) + 0.5) * f / self.k).astype(np.int64), f - 1
            )
            picked.append(sel.tolist())
            w, h = int(ws[i]), int(hs[i])
            ys = np.minimum(((np.arange(self.out_h) + 0.5) * h / self.out_h).astype(np.int64), h - 1)
            xs = np.minimum(((np.arange(self.out_w) + 0.5) * w / self.out_w).astype(np.int64), w - 1)
            for j, fr in enumerate(sel):
                img = self._decode_frame(payloads[i] or b"", int(fr), w, h)
                out[i, j * fsz:(j + 1) * fsz] = img[np.ix_(ys, xs)].reshape(-1)
        frames = pa.FixedSizeListArray.from_arrays(
            pa.array(out.reshape(-1), pa.uint8()), self.k * fsz
        )
        return (
            batch.append_column("frame_idx", pa.array(picked, pa.list_(pa.int32())))
            .append_column("frames", frames)
        )


def sample_frames(
    ds: ray.data.Dataset,
    *,
    k: int = 4,
    out_w: int = 16,
    out_h: int = 16,
    fake: bool = True,
    concurrency=(1, 2),
    batch_size: int = 32,  # video rows are the widest — smallest batches
) -> ray.data.Dataset:
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs=dict(k=k, out_w=out_w, out_h=out_h, fake=fake),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def decode_media(
    ds: ray.data.Dataset,
    *,
    out_w: int = 32,
    out_h: int = 32,
    fake: bool = True,
    concurrency=(1, 2),
    batch_size: int = 64,  # wide binary rows → small batches
) -> ray.data.Dataset:
    return ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs=dict(out_w=out_w, out_h=out_h, fake=fake),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def extract_media_features(
    ds: ray.data.Dataset, *, side: int = 32, concurrency=(1, 2), batch_size: int = 256
) -> ray.data.Dataset:
    return ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs=dict(side=side),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def synthesize_media_table(n: int, seed: int = 5) -> ray.data.Dataset:
    """Deterministic opaque-binary media table for tests/benches:
    (media_id, payload: binary, media_kind, media_w, media_h)."""

    def gen(batch: pa.Table) -> pa.Table:
        idx = batch.column("id").to_numpy()
        rng_w = 16 + (idx * 7 + seed) % 48
        rng_h = 16 + (idx * 13 + seed) % 48
        payloads = [
            hashlib.sha256(f"media-{seed}-{i}".encode()).digest() * 4 for i in idx.tolist()
        ]
        return pa.table(
            {
                "media_id": pa.array(idx, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
                "media_kind": pa.array(["image"] * len(idx), pa.string()),
                "media_w": pa.array(rng_w.astype(np.int32)),
                "media_h": pa.array(rng_h.astype(np.int32)),
                "media_frames": pa.array((8 + (idx * 11 + seed) % 120).astype(np.int32)),
            }
        )

    return ray.data.range(n).map_batches(gen, batch_format="pyarrow")


class AudioResampler:
    """Actor-pool stage: audio payload → decoded PCM resampled to
    ``target_sr``, plus rms / zero-crossing-rate features.

    Decode is gated like the image/video paths (fake: deterministic
    int16 PCM from a payload hash); the resample is a vectorized linear
    interpolation (np.interp) — the shape a real codec would slot into.
    Output adds ``samples: list<int16>`` (variable length: duration
    varies per row), ``out_sr: int32``, ``rms: float32``, ``zcr:
    float32``.
    """

    def __init__(self, target_sr: int = 8000, *, fake: bool = True,
                 payload_col: str = "payload"):
        self.target_sr = int(target_sr)
        self.fake = fake
        self.payload_col = payload_col

    def _decode(self, payload: bytes, n: int) -> np.ndarray:
        if not self.fake:
            _real_decode_unavailable("audio")
        seed = np.frombuffer(hashlib.sha256(payload).digest()[:8], dtype=np.uint64)[0]
        i = np.arange(max(n, 1), dtype=np.uint64)
        v = i * np.uint64(0x9E3779B97F4A7C15) ^ seed
        v ^= v >> np.uint64(31)
        return (v & np.uint64(0xFFFF)).astype(np.int64).astype(np.int16)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        srs = batch.column("media_sr").to_numpy(zero_copy_only=False)
        ns = batch.column("media_samples").to_numpy(zero_copy_only=False)
        out_samples: list[np.ndarray] = []
        rms = np.empty(len(batch), dtype=np.float32)
        zcr = np.empty(len(batch), dtype=np.float32)
        for i in range(len(batch)):  # per-payload decode is per-row I/O
            pcm = self._decode(payloads[i] or b"", int(ns[i])).astype(np.float64)
            # invalid rate metadata -> passthrough (a poisoned sr of 1 Hz
            # would otherwise inflate the row by target_sr x)
            sr = int(srs[i]) if int(srs[i]) > 0 else self.target_sr
            out_n = max(int(round(len(pcm) * self.target_sr / sr)), 1)
            t_src = np.arange(len(pcm)) / sr
            t_dst = np.arange(out_n) / self.target_sr
            res = np.interp(t_dst, t_src, pcm)
            out_samples.append(np.clip(res, -32768, 32767).astype(np.int16))
            rms[i] = np.sqrt(np.mean(res**2))
            sign = np.signbit(res - np.mean(res))
            zcr[i] = float(np.mean(sign[1:] != sign[:-1])) if out_n > 1 else 0.0
        return (
            batch.append_column(
                "samples", pa.array([s.tolist() for s in out_samples],
                                    pa.list_(pa.int16()))
            )
            .append_column("out_sr", pa.array(
                np.full(len(batch), self.target_sr, dtype=np.int32)))
            .append_column("rms", pa.array(rms))
            .append_column("zcr", pa.array(zcr))
        )


def resample_audio(
    ds: ray.data.Dataset,
    *,
    target_sr: int = 8000,
    fake: bool = True,
    concurrency=(1, 2),
    batch_size: int = 64,
) -> ray.data.Dataset:
    return ds.map_batches(
        AudioResampler,
        fn_constructor_kwargs=dict(target_sr=target_sr, fake=fake),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def synthesize_audio_table(n: int, seed: int = 9) -> ray.data.Dataset:
    """Deterministic opaque-binary audio table:
    (media_id, payload, media_kind, media_sr, media_samples)."""

    def gen(batch: pa.Table) -> pa.Table:
        idx = batch.column("id").to_numpy()
        srs = np.where((idx % 3) == 0, 16000, np.where((idx % 3) == 1, 22050, 8000))
        nsamp = 200 + (idx * 37 + seed) % 1800
        payloads = [
            hashlib.sha256(f"audio-{seed}-{i}".encode()).digest() * 2 for i in idx.tolist()
        ]
        return pa.table(
            {
                "media_id": pa.array(idx, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
                "media_kind": pa.array(["audio"] * len(idx), pa.string()),
                "media_sr": pa.array(srs.astype(np.int32)),
                "media_samples": pa.array(nsamp.astype(np.int32)),
            }
        )

    return ray.data.range(n).map_batches(gen, batch_format="pyarrow")


def fetch_media_payloads(
    ds: ray.data.Dataset,
    *,
    ref_col: str = "media_ref",
    seed: int = 5,
) -> ray.data.Dataset:
    """Resolve media refs to opaque payload bytes — the blob-store read.

    In production this stage is an actor pool doing ranged GETs against
    the object store the refs point at; in this environment (no network,
    no codecs) it synthesizes the SAME deterministic payload shape as
    ``synthesize_media_table`` from the ref string, so every downstream
    decode/feature stage exercises the real plumbing.  Appends
    (payload, media_kind, media_w, media_h)."""

    def fetch(batch: pa.Table) -> pa.Table:
        refs = batch.column(ref_col).to_pylist()
        payloads = [
            hashlib.sha256(f"media-{seed}-{r}".encode()).digest() * 4 for r in refs
        ]
        h = np.array(
            [int.from_bytes(hashlib.sha256(r.encode()).digest()[:4], "big") for r in refs],
            dtype=np.int64,
        )
        return (
            batch.append_column("payload", pa.array(payloads, pa.binary()))
            .append_column("media_kind", pa.array(["image"] * len(refs), pa.string()))
            .append_column("media_w", pa.array(16 + h % 48, pa.int64()))
            .append_column("media_h", pa.array(16 + (h // 48) % 48, pa.int64()))
        )

    return ds.map_batches(fetch, batch_format="pyarrow", batch_size=256)
