"""Multimodal (image/audio/video) column plumbing.

Media rides as opaque ``binary`` payload columns (or ``media_ref`` URI
strings in the interleaved-span schema) with typed metadata columns. The
Ray-side plumbing - schema, actor signature, batch sizing, output layout -
is real and tested; the actual codec calls are STUBBED because no
image/audio libraries exist in this container:

- ``decoder="fake"`` (default): a deterministic fake decoder that derives
  pixel/sample statistics from a rolling hash of the payload bytes, so
  downstream stages and tests have stable values to check;
- ``decoder="pil"`` / ``"ffmpeg"``: raise NotImplementedError with a clear
  message (slot the real library in here on a production cluster).

Batch-size guidance (Ray docs / SURVEY.md §4.2): media payloads are large -
keep ``batch_size`` small (64-256) so batch x concurrency fits worker heap;
these stages default accordingly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..util import default_pool


def _payload_stat(payload: bytes | None) -> tuple[int, float]:
    if not payload:
        return 0, 0.0
    a = np.frombuffer(payload, dtype=np.uint8)
    return len(a), float(a.mean())


class MediaDecoder:
    """Actor stage: decode media payloads into feature columns.

    Output columns: media_bytes (int64), media_mean (float), width/height
    (int32, fake-derived) - the schema a real decoder would fill.
    """

    def __init__(self, payload_col: str = "payload", decoder: str = "fake"):
        self.payload_col = payload_col
        if decoder not in ("fake",):
            raise NotImplementedError(
                f"decoder={decoder!r}: real codecs (PIL/ffmpeg) are not available "
                "in this container; use decoder='fake' or install the codec on the cluster"
            )
        self.decoder = decoder

    def __call__(self, b: pa.Table) -> pa.Table:
        payloads = b.column(self.payload_col).to_pylist()
        nbytes = np.empty(len(payloads), dtype=np.int64)
        mean = np.empty(len(payloads), dtype=np.float64)
        for i, p in enumerate(payloads):
            nbytes[i], mean[i] = _payload_stat(p)
        # fake geometry: deterministic from byte length
        width = (nbytes % 640 + 1).astype(np.int32)
        height = (nbytes % 480 + 1).astype(np.int32)
        b = b.append_column("media_bytes", pa.array(nbytes))
        b = b.append_column("media_mean", pa.array(mean))
        b = b.append_column("width", pa.array(width))
        b = b.append_column("height", pa.array(height))
        return b


def decode_media(ds: ray.data.Dataset, payload_col="payload", decoder="fake",
                 concurrency=None, batch_size: int = 128) -> ray.data.Dataset:
    if decoder not in ("fake",):
        # fail fast on the driver; the actor would only surface this at the
        # first batch (late actor-init errors are a known Ray pitfall)
        raise NotImplementedError(
            f"decoder={decoder!r}: real codecs are not available in this container"
        )
    return ds.map_batches(
        MediaDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,  # small: payloads are big binaries
        concurrency=default_pool(concurrency),
        fn_constructor_kwargs=dict(payload_col=payload_col, decoder=decoder),
    )


class FrameSampler:
    """Actor stage: sample every k-th 'frame' from a video payload.

    With the fake decoder a frame is a fixed-size byte stride; emits one row
    per sampled frame (row-expanding), preserving all parent columns.
    """

    def __init__(self, payload_col="payload", frame_bytes: int = 1024, every: int = 10):
        self.payload_col = payload_col
        self.frame_bytes = frame_bytes
        self.every = every

    def __call__(self, b: pa.Table) -> pa.Table:
        payloads = b.column(self.payload_col).to_pylist()
        parents, frame_idx, frames = [], [], []
        for i, p in enumerate(payloads):
            if not p:
                continue
            n_frames = max(1, len(p) // self.frame_bytes)
            for j in range(0, n_frames, self.every):
                parents.append(i)
                frame_idx.append(j)
                frames.append(p[j * self.frame_bytes : (j + 1) * self.frame_bytes])
        out = b.take(pa.array(parents, type=pa.int64()))
        out = out.append_column("frame_index", pa.array(frame_idx, type=pa.int64()))
        out = out.append_column("frame", pa.array(frames, type=pa.large_binary()))
        return out.drop_columns([self.payload_col])


def sample_frames(ds: ray.data.Dataset, concurrency=None, batch_size: int = 64, **kw) -> ray.data.Dataset:
    return ds.map_batches(
        FrameSampler,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=default_pool(concurrency),
        fn_constructor_kwargs=kw,
    )


def spans_media_refs(ds: ray.data.Dataset, spans_col: str = "spans") -> ray.data.Dataset:
    """Flatten the interleaved-span column to one row per media span:
    (doc_id, span_index, kind, media_ref). The span sequence itself is never
    mutated (BASELINE input_hint invariant) - this is a read-only projection.
    """

    def f(b: pa.Table) -> pa.Table:
        spans = b.column(spans_col)
        spans = spans.combine_chunks() if isinstance(spans, pa.ChunkedArray) else spans
        flat = spans.flatten()
        offs = np.asarray(spans.offsets)
        counts = offs[1:] - offs[:-1]
        parent = np.repeat(np.arange(len(b), dtype=np.int64), counts)
        span_idx = np.arange(len(flat), dtype=np.int64) - offs[:-1][parent]
        out = b.drop_columns([spans_col]).take(pa.array(parent))
        out = out.append_column("span_index", pa.array(span_idx))
        for name in ("kind", "text", "media_ref", "offset"):
            out = out.append_column(name, flat.field(name))
        import pyarrow.compute as pc

        return out.filter(pc.not_equal(out.column("media_ref"), ""))

    return ds.map_batches(f, batch_format="pyarrow")
