"""geopandas_ray - a Ray-Data-native spatial join + tiling engine.

A from-scratch engine with the query surface of GeoPandas 1.0.1 (reference
at /root/reference, studied for semantics only), re-expressed as
ray.data.Dataset pipelines: WKB geometry in Arrow large_binary columns,
vectorized NumPy kernels inside map_batches, actor pools for stateful
stages, hierarchical cell keys as the shuffle partitioning backbone.
"""

__version__ = "0.1.0"
