"""Geocoding as an actor-pool batch stage (reference
``tools/geocoding.py`` — ``geocode`` :22, ``reverse_geocode`` :82,
``_prepare_geocode_result`` :148). The reference drives geopy providers
over the network row by row with a throttle; this sandbox has no network,
so the Ray-native contract is a user-supplied **provider factory**: a
zero-arg picklable callable returning an object with

    geocode(s: str)        -> (address, (lat, lon)) | None
    reverse((lat, lon))    -> (address, (lat, lon)) | None

— the reference's internal result tuple shape (:139,:153). The factory
runs once per actor in ``__init__`` (connection/session/model setup, the
stateful-stage pattern); rows batch through ``__call__``. Real network
providers plug in on a cluster by wrapping geopy in the factory;
``table_provider`` below is the offline deterministic instance (broadcast
lookup dict — ``ray.put`` once, read per actor, never re-shipped per
batch).

Output mirrors the reference: the input dataset with an ``address``
string column and a point ``geometry`` built from (lon, lat); unresolved
rows get null address + null geometry (reference :159 None handling).

Pickling note: the factory must either live in a module importable on
every worker or be DEFINED IN A LOCAL SCOPE (cloudpickle then ships it by
value). A module-level def in a non-importable script pickles by
reference and the actor pool restarts forever instead of erroring.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..geom.wkb import points_to_wkb
from ..util import default_pool


def table_provider(mapping: dict[str, tuple[str, tuple[float, float]]]):
    """Deterministic offline provider factory from an address table.

    ``mapping``: query string -> (canonical_address, (lat, lon)). The dict
    is put in the object store ONCE here; every actor reads the shared
    copy (broadcast pattern — a closure over the raw dict would re-ship
    it with every task pickle).
    """
    ref = ray.put(mapping)
    inv = ray.put({v[1]: (v[0], v[1]) for v in mapping.values()})

    class _Table:
        def __init__(self):
            self.fwd = ray.get(ref)
            self.rev = ray.get(inv)
            # nearest-match index for reverse(): providers snap to the
            # closest known address
            pts = list(self.rev)
            self.latlon = np.array(pts, dtype=np.float64).reshape(-1, 2)
            self.keys = pts

        def geocode(self, s):
            return self.fwd.get(s)

        def reverse(self, latlon):
            if not self.keys:
                return None
            d = np.hypot(self.latlon[:, 0] - latlon[0], self.latlon[:, 1] - latlon[1])
            return self.rev[self.keys[int(np.argmin(d))]]

    return _Table


class _Geocode:
    def __init__(self, provider_factory, column: str, geometry: str):
        self.provider = provider_factory()  # once per actor
        self.column = column
        self.geometry = geometry

    def __call__(self, b: pa.Table) -> pa.Table:
        queries = b.column(self.column).to_pylist()
        addr: list[str | None] = []
        lon = np.full(len(queries), np.nan)
        lat = np.full(len(queries), np.nan)
        for i, q in enumerate(queries):
            r = None if q is None else self.provider.geocode(q)
            if r is None:
                addr.append(None)
                continue
            a, (la, lo) = r
            addr.append(a)
            lat[i], lon[i] = float(la), float(lo)
        wkb = points_to_wkb(lon, lat).to_pylist()
        geom = pa.array(
            [None if a is None else w for a, w in zip(addr, wkb)],
            type=pa.large_binary(),
        )
        b = b.append_column("address", pa.array(addr, type=pa.string()))
        if self.geometry in b.column_names:  # re-geocode: overwrite in place
            return b.set_column(b.column_names.index(self.geometry), self.geometry, geom)
        return b.append_column(self.geometry, geom)


class _ReverseGeocode:
    def __init__(self, provider_factory, geometry: str):
        self.provider = provider_factory()
        self.geometry = geometry

    def __call__(self, b: pa.Table) -> pa.Table:
        from ..geom.kernels import bounds
        from ..geom.wkb import from_wkb

        g = from_wkb(b.column(self.geometry))
        bb = bounds(g)
        valid = ~np.isnan(bb[:, 0])
        addr: list[str | None] = [None] * b.num_rows
        for i in np.flatnonzero(valid):
            # reference reverse_geocode queries (point.y, point.x) = (lat, lon)
            r = self.provider.reverse((bb[i, 1], bb[i, 0]))
            if r is not None:
                addr[i] = r[0]
        col = pa.array(addr, type=pa.string())
        if "address" in b.column_names:  # e.g. reverse after forward
            return b.set_column(b.column_names.index("address"), "address", col)
        return b.append_column("address", col)


def geocode(
    ds: ray.data.Dataset,
    provider_factory,
    column: str = "address_query",
    geometry: str = "geometry",
    concurrency=None,
    batch_size: int = 256,
) -> ray.data.Dataset:
    """Reference ``tools/geocoding.py:22``. Appends ``address`` +  a point
    ``geometry`` (lon, lat) per input row; unresolved rows are null. Small
    ``batch_size`` by default: per-row provider calls dominate, so batches
    bound latency/retry granularity, not throughput."""
    return ds.map_batches(
        _Geocode,
        fn_constructor_args=(provider_factory, column, geometry),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=default_pool(concurrency),
    )


def reverse_geocode(
    ds: ray.data.Dataset,
    provider_factory,
    geometry: str = "geometry",
    concurrency=None,
    batch_size: int = 256,
) -> ray.data.Dataset:
    """Reference ``tools/geocoding.py:82``: point geometry -> ``address``
    column (providers take (lat, lon); null/empty geometry -> null)."""
    return ds.map_batches(
        _ReverseGeocode,
        fn_constructor_args=(provider_factory, geometry),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=default_pool(concurrency),
    )
