"""Side-by-side migration demo: a realistic GeoPandas workflow, line for
line, on geopandas_ray.

Each step carries the reference one-liner it replaces (commented `# gpd:`),
so a reference user can see the 1:1 mapping: read a file format -> set a
CRS -> reproject -> spatial join -> per-zone dissolve -> quality columns ->
write partitioned GeoParquet. Everything between read and write is a lazy
Ray Dataset pipeline (streaming executor; nothing materializes except the
final small dissolve result).

Usage:
    python scripts/migration_demo.py [--sf /root/testdata/sf0.001] [--cpus 8]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from geopandas_ray import GeoDataset
    from geopandas_ray.pipelines.datasets import doc_points, zone_dataset

    tmp = tempfile.mkdtemp(prefix="graft_demo_", dir="/tmp")
    try:
        # --- 0. interchange: land the fixture as a shapefile + gpkg, then
        #        read them back like a reference user would
        pts_src = GeoDataset(doc_points(args.sf))
        pts_src.to_file(os.path.join(tmp, "docs.shp"))      # gpd: gdf.to_file("docs.shp")
        zones_src = GeoDataset(zone_dataset(args.sf))
        zones_src.to_file(os.path.join(tmp, "zones.gpkg"))  # gpd: gdf.to_file("zones.gpkg")

        pts = GeoDataset.read_file(os.path.join(tmp, "docs.shp"))    # gpd: gpd.read_file
        zones = GeoDataset.read_file(os.path.join(tmp, "zones.gpkg"))

        # --- 1. CRS: declare lon/lat-ish source, estimate a UTM-like target
        pts = pts.set_crs("EPSG:4326")                      # gpd: gdf.set_crs(4326)
        # (fixture coordinates are a synthetic plane; to_crs demo is on the
        #  facade — see estimate_utm_roundtrip in the gate for a real zone)

        # --- 2. spatial join: points in zones (tree per partition)
        joined = pts.sjoin(zones, predicate="within")       # gpd: gpd.sjoin(pts, zones)

        # --- 3. per-zone aggregate + geometry union
        dissolved = GeoDataset(joined.ds).dissolve(
            by="category", aggfunc={"weight": ["min", "max"]}
        )                                                   # gpd: joined.dissolve("category", ...)
        n_zones = dissolved.count()

        # --- 4. quality columns on the point side (LLM-pipeline flavor)
        enriched = (
            GeoDataset(joined.ds)
            .area()                                         # gpd: gdf.area
            .bounds()                                       # gpd: gdf.bounds
        )

        # --- 5. partitioned GeoParquet sink (resumable fragments)
        out = os.path.join(tmp, "out")
        enriched.to_parquet(out)                            # gpd: gdf.to_parquet
        back = GeoDataset.read_parquet(out)
        print(
            f"demo ok: joined={back.count()} rows, dissolved={n_zones} categories, "
            f"columns={sorted(back.schema().names)[:6]}..."
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        ray.shutdown()


if __name__ == "__main__":
    main()
