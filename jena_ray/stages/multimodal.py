"""Multimodal (image/audio/video) columns: opaque binary + typed metadata.

Schema convention (graft brief): media travels as an Arrow ``binary`` column
with sibling metadata columns, and every decode / feature-extract / resize /
frame-sample step is an actor-pool ``map_batches`` stage kept in
``batch_format="pyarrow"`` (binary columns don't survive pandas round-trips
cleanly — ray_guide pitfalls).

    media table: (media_id: int64, kind: string, payload: binary,
                  width: int32, height: int32, sample_rate: int32)

Real codecs (PIL / libav / soundfile) are NOT in this container, so the
decode step is pluggable: ``RawDecoder`` is a deterministic stand-in that
interprets the payload as a raw uint8 raster/waveform per the metadata (the
synthetic payloads from ``synth_media`` are exactly that); ``PillowDecoder``
raises NotImplementedError unless PIL is importable. The Ray-side plumbing —
schema, batch sizing, actor signatures, output layout — is real and tested.

Memory note: binary payloads are large; size ``batch_size`` small (32-128)
so batch x concurrency fits worker heaps, and keep blocks zero-copy Arrow.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("kind", pa.string()),  # "image" | "audio"
        pa.field("payload", pa.binary()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("sample_rate", pa.int32()),
    ]
)


def synth_media(n: int, *, seed: int = 7) -> pa.Table:
    """Deterministic synthetic media table: raw uint8 rasters (images) and
    waveforms (audio) derived from media_id — no RNG at run time."""
    ids, kinds, payloads, ws, hs, srs = [], [], [], [], [], []
    for i in range(n):
        ids.append(i)
        if i % 2 == 0:
            w, h = 16 + (i % 5) * 8, 16 + (i % 3) * 8
            raster = ((np.arange(w * h, dtype=np.int64) * (i + seed)) % 251).astype(np.uint8)
            kinds.append("image")
            payloads.append(raster.tobytes())
            ws.append(w)
            hs.append(h)
            srs.append(0)
        else:
            sr = 8000
            t = np.arange(sr // 4, dtype=np.int64)
            wave = (128 + 100 * np.sin(t * (i + seed) / 500.0)).astype(np.uint8)
            kinds.append("audio")
            payloads.append(wave.tobytes())
            ws.append(0)
            hs.append(0)
            srs.append(sr)
    return pa.table(
        {
            "media_id": pa.array(ids, type=pa.int64()),
            "kind": pa.array(kinds, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "width": pa.array(ws, type=pa.int32()),
            "height": pa.array(hs, type=pa.int32()),
            "sample_rate": pa.array(srs, type=pa.int32()),
        }
    )


def media_dataset(n: int = 64):
    import ray.data as rd

    return rd.from_arrow(synth_media(n))


class RawDecoder:
    """Deterministic stand-in decoder: payload → uint8 ndarray per metadata.
    Swap for a real codec-backed decoder in production (same signature)."""

    def decode(self, kind: str, payload: bytes, width: int, height: int) -> np.ndarray:
        arr = np.frombuffer(payload, dtype=np.uint8)
        if kind == "image":
            return arr.reshape(height, width)
        return arr  # audio: 1-D waveform


class PillowDecoder:
    """Real image decoder, gated behind the PIL import (not in this
    container — raises NotImplementedError at construction if absent)."""

    def __init__(self) -> None:
        try:
            from PIL import Image  # noqa: F401

            self._image = Image
        except ImportError as e:
            raise NotImplementedError(
                "PillowDecoder requires PIL, which is not installed in this "
                "environment; use RawDecoder for the deterministic stand-in"
            ) from e

    def decode(self, kind: str, payload: bytes, width: int, height: int) -> np.ndarray:
        import io

        return np.asarray(self._image.open(io.BytesIO(payload)))


class MediaFeatures:
    """Actor-pool stage: decode once per row, emit per-media features.
    Decoder state is constructed once per actor (model-load pattern)."""

    def __init__(self, decoder: str = "raw"):
        self.decoder = RawDecoder() if decoder == "raw" else PillowDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        kinds = batch.column("kind").to_pylist()
        ws = batch.column("width").to_pylist()
        hs = batch.column("height").to_pylist()
        means, stds, sizes, sums, sqs = [], [], [], [], []
        for kind, payload, w, h in zip(
            kinds, batch.column("payload").to_pylist(), ws, hs
        ):
            arr = self.decoder.decode(kind, payload, w, h)
            means.append(float(arr.mean()))
            stds.append(float(arr.std()))
            sizes.append(int(arr.size))
            # exact-integer features (sum, sum of squares): unlike float
            # mean/std these are bit-stable across engines, so the DuckDB
            # oracle can verify the decode plumbing value-exactly
            a64 = arr.astype(np.int64)
            sums.append(int(a64.sum()))
            sqs.append(int((a64 * a64).sum()))
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "kind": pa.array(kinds, type=pa.string()),
                "n_samples": pa.array(sizes, type=pa.int64()),
                "mean": pa.array(means, type=pa.float64()),
                "std": pa.array(stds, type=pa.float64()),
                "sum_pixels": pa.array(sums, type=pa.int64()),
                "sum_sq": pa.array(sqs, type=pa.int64()),
            }
        )


class ImageResize:
    """Actor-pool stage: nearest-neighbour resize of raw rasters to
    (target, target); audio rows pass through unchanged."""

    def __init__(self, target: int = 8):
        self.target = target
        self.decoder = RawDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_payload = []
        out_w, out_h = [], []
        for kind, payload, w, h in zip(
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("width").to_pylist(),
            batch.column("height").to_pylist(),
        ):
            if kind != "image":
                out_payload.append(payload)
                out_w.append(w)
                out_h.append(h)
                continue
            arr = self.decoder.decode(kind, payload, w, h)
            t = self.target
            yi = (np.arange(t) * h // t)[:, None]
            xi = (np.arange(t) * w // t)[None, :]
            out_payload.append(arr[yi, xi].astype(np.uint8).tobytes())
            out_w.append(t)
            out_h.append(t)
        cols = {name: batch.column(name) for name in batch.schema.names}
        cols["payload"] = pa.array(out_payload, type=pa.binary())
        cols["width"] = pa.array(out_w, type=pa.int32())
        cols["height"] = pa.array(out_h, type=pa.int32())
        return pa.table(cols)


class AudioFrameSample:
    """Actor-pool stage: sample fixed-length frames from audio waveforms —
    one output row per frame (video frame-sampling has the same shape)."""

    def __init__(self, frame_len: int = 512, hop: int = 2048):
        self.frame_len = frame_len
        self.hop = hop
        self.decoder = RawDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, offs = [], [], []
        for mid, kind, payload, w, h in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("width").to_pylist(),
            batch.column("height").to_pylist(),
        ):
            if kind != "audio":
                continue
            arr = self.decoder.decode(kind, payload, w, h)
            for off in range(0, max(1, len(arr) - self.frame_len + 1), self.hop):
                ids.append(mid)
                offs.append(off)
                frames.append(arr[off : off + self.frame_len].tobytes())
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_offset": pa.array(offs, type=pa.int64()),
                "frame": pa.array(frames, type=pa.binary()),
            }
        )


def media_features(ds, *, concurrency=(1, 4), batch_size: int = 64):
    return ds.map_batches(
        MediaFeatures,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
