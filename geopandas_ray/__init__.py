"""geopandas_ray - a Ray-Data-native spatial join + tiling engine.

A from-scratch engine with the query surface of GeoPandas 1.0.1 (reference
at /root/reference, studied for semantics only), re-expressed as
ray.data.Dataset pipelines: WKB geometry in Arrow large_binary columns,
vectorized NumPy kernels inside map_batches, actor pools for stateful
stages, hierarchical cell keys as the shuffle partitioning backbone.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy: keep `import geopandas_ray` cheap (no ray.data import at package
    # import time); GeoDataset pulls in the stage modules on first touch
    if name == "GeoDataset":
        from .frame import GeoDataset

        return GeoDataset
    if name == "concat":
        from .frame import concat

        return concat
    if name in ("points_from_xy",):
        from .frame import GeoDataset

        return GeoDataset.from_xy
    # reference __init__.py re-exports (read_file/read_parquet/... and the
    # tools/ functional forms live at package top level there too)
    if name in ("read_file", "read_parquet", "read_feather", "read_postgis"):
        from .frame import GeoDataset

        return getattr(GeoDataset, name)
    if name in ("sjoin", "sjoin_nearest", "overlay", "clip"):
        from . import frame

        return getattr(frame, name)
    if name == "list_layers":
        from .sources.info import list_layers

        return list_layers
    if name == "show_versions":
        from .testing import show_versions

        return show_versions
    if name == "GeoDataFrame":
        # the reference's frame class name, for one-line ports
        from .frame import GeoDataset

        return GeoDataset
    if name in ("GeometryArray", "GeometryDtype"):
        # pandas-interop edge (reference array.py); importing it registers
        # the 'geometry' extension dtype with pandas
        from . import array

        return getattr(array, name)
    if name == "options":
        from ._config import options

        return options
    if name in ("tools", "datasets"):
        import importlib

        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module 'geopandas_ray' has no attribute {name!r}")
