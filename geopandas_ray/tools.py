"""``geopandas.tools`` parity — the reference's functional namespace
(``tools/__init__.py``: clip, geocode, reverse_geocode, overlay, sjoin,
sjoin_nearest, collect).

geocode / reverse_geocode are the Ray-native forms (``functions/geocoding``):
they take a Dataset / GeoDataset plus a zero-arg picklable provider FACTORY
(a live provider object can't ship to workers). ``geocode`` additionally
accepts a plain list of address strings like the reference and builds the
one-column input dataset for you. ``collect`` is WKB-in/WKB-out (no shapely
objects in this engine — geometry is WKB end to end)."""

from __future__ import annotations

from .frame import GeoDataset, clip, overlay, sjoin, sjoin_nearest  # noqa: F401
from .stages.ops2 import collect  # noqa: F401


def geocode(strings_or_ds, provider_factory, **kw):
    """Reference ``tools/geocoding.py:22``. Accepts a list/tuple of address
    strings (reference form), a ``ray.data.Dataset``, or a ``GeoDataset``;
    returns the input with ``address`` + point ``geometry`` appended."""
    import ray.data

    from .functions.geocoding import geocode as _geocode

    if isinstance(strings_or_ds, (list, tuple)):
        ds = ray.data.from_items(
            [{"address_query": s} for s in strings_or_ds]
        )
        return GeoDataset(_geocode(ds, provider_factory, **kw))
    if isinstance(strings_or_ds, GeoDataset):
        return strings_or_ds._wrap(
            _geocode(strings_or_ds.ds, provider_factory, **kw)
        )
    return _geocode(strings_or_ds, provider_factory, **kw)


def reverse_geocode(ds, provider_factory, **kw):
    """Reference ``tools/geocoding.py:82``: point geometry -> ``address``."""
    from .functions.geocoding import reverse_geocode as _reverse

    if isinstance(ds, GeoDataset):
        return ds._wrap(_reverse(ds.ds, provider_factory, geometry=ds.geometry, **kw))
    return _reverse(ds, provider_factory, **kw)


__all__ = [
    "collect",
    "geocode",
    "overlay",
    "reverse_geocode",
    "sjoin",
    "sjoin_nearest",
    "clip",
]
