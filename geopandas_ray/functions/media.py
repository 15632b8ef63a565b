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
        # vectorized off the Arrow binary layout (r3 VERDICT minor #6): byte
        # lengths from the offsets buffer, per-payload sums from one float64
        # cumsum over the flat values buffer - no to_pylist, no Python loop.
        # (A real codec stage would be per-row here; this keeps the PLUMBING
        # benchmark measuring plumbing.) Null/empty payloads -> (0, 0.0).
        col = b.column(self.payload_col)
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        # (large_)binary arrays expose no .offsets attribute - read the
        # offsets buffer directly, honoring a sliced array's offset
        odt = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
        off = np.frombuffer(arr.buffers()[1], dtype=odt)[
            arr.offset : arr.offset + len(arr) + 1
        ].astype(np.int64)
        buf = arr.buffers()[2]
        flat = np.frombuffer(buf, dtype=np.uint8) if buf is not None else np.zeros(0, np.uint8)
        nbytes = off[1:] - off[:-1]
        cs = np.zeros(len(flat) + 1, dtype=np.float64)
        np.cumsum(flat, dtype=np.float64, out=cs[1:])
        sums = cs[off[1:]] - cs[off[:-1]]
        if arr.null_count:
            # the Arrow spec allows a NULL slot to span a non-empty offset
            # range (undefined bytes) - mask them to the (0, 0.0) the row
            # loop produced, or garbage bytes leak into the stats
            import pyarrow.compute as pc

            null_mask = np.asarray(pc.is_null(arr))
            nbytes = np.where(null_mask, 0, nbytes)
            sums = np.where(null_mask, 0.0, sums)
        mean = np.divide(
            sums, nbytes, out=np.zeros(len(nbytes), dtype=np.float64), where=nbytes > 0
        )
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


class MediaResizer:
    """Actor stage: resize decoded media to a target (width, height).

    The real kernel is a codec call; in-container the 'fake' kernel is a
    genuine nearest-neighbor byte resample over the payload viewed as a
    width x height uint8 grid - deterministic and vectorized, so the
    plumbing (per-actor setup, small batch sizes for big payloads,
    payload-in/payload-out schema) is exercised for real."""

    def __init__(
        self,
        target_width: int,
        target_height: int,
        payload_col: str = "payload",
        width_col: str = "width",
        height_col: str = "height",
        kernel: str = "fake",
    ):
        if kernel not in ("fake",):
            raise NotImplementedError(
                f"kernel={kernel!r}: real image codecs are not available in this container"
            )
        self.tw = int(target_width)
        self.th = int(target_height)
        self.payload_col = payload_col
        self.width_col = width_col
        self.height_col = height_col

    def _resize_one(self, p: bytes | None, w: int, h: int) -> bytes | None:
        if not p or w <= 0 or h <= 0:
            return None
        a = np.frombuffer(p, dtype=np.uint8)
        n = w * h
        if len(a) < n:  # pad the fake pixel grid deterministically
            a = np.concatenate([a, np.zeros(n - len(a), dtype=np.uint8)])
        grid = a[:n].reshape(h, w)
        yi = (np.arange(self.th) * h) // self.th
        xi = (np.arange(self.tw) * w) // self.tw
        return grid[yi][:, xi].tobytes()

    def __call__(self, b: pa.Table) -> pa.Table:
        payloads = b.column(self.payload_col).to_pylist()
        ws = np.asarray(b.column(self.width_col), dtype=np.int64)
        hs = np.asarray(b.column(self.height_col), dtype=np.int64)
        out = [self._resize_one(p, int(w), int(h)) for p, w, h in zip(payloads, ws, hs)]
        i = b.column_names.index(self.payload_col)
        b = b.set_column(i, self.payload_col, pa.array(out, type=pa.large_binary()))
        b = b.set_column(
            b.column_names.index(self.width_col), self.width_col,
            pa.array(np.full(len(out), self.tw, dtype=np.int32)),
        )
        return b.set_column(
            b.column_names.index(self.height_col), self.height_col,
            pa.array(np.full(len(out), self.th, dtype=np.int32)),
        )


def resize_media(ds: ray.data.Dataset, target_width: int, target_height: int,
                 concurrency=None, batch_size: int = 64, **kw) -> ray.data.Dataset:
    return ds.map_batches(
        MediaResizer,
        batch_format="pyarrow",
        batch_size=batch_size,  # small: payloads are big binaries
        concurrency=default_pool(concurrency),
        fn_constructor_kwargs=dict(target_width=target_width, target_height=target_height, **kw),
    )


class MediaEmbedder:
    """Actor stage: media payload -> fixed-dim embedding (batched
    'inference'). The projection matrix loads ONCE per actor in __init__
    (the model-load slot); __call__ runs one batched matmul over the
    byte-histogram features - the exact shape a real vision encoder uses.
    Deterministic: seeded projection, L2-normalized output."""

    def __init__(self, dim: int = 64, payload_col: str = "payload",
                 out_col: str = "media_embedding", seed: int = 42):
        rng = np.random.RandomState(seed)
        self.proj = rng.normal(size=(256, dim)).astype(np.float64)  # 'model weights'
        self.dim = dim
        self.payload_col = payload_col
        self.out_col = out_col

    def __call__(self, b: pa.Table) -> pa.Table:
        payloads = b.column(self.payload_col).to_pylist()
        feats = np.zeros((len(payloads), 256), dtype=np.float64)
        for i, p in enumerate(payloads):
            if p:
                a = np.frombuffer(p, dtype=np.uint8)
                feats[i] = np.bincount(a, minlength=256) / len(a)
        emb = feats @ self.proj  # one batched 'forward pass'
        norms = np.linalg.norm(emb, axis=1)
        norms[norms == 0] = 1.0
        emb /= norms[:, None]
        return b.append_column(
            self.out_col,
            pa.FixedSizeListArray.from_arrays(pa.array(emb.ravel()), self.dim),
        )


def embed_media(ds: ray.data.Dataset, dim: int = 64, concurrency=None,
                batch_size: int = 64, **kw) -> ray.data.Dataset:
    return ds.map_batches(
        MediaEmbedder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=default_pool(concurrency),
        fn_constructor_kwargs=dict(dim=dim, **kw),
    )
