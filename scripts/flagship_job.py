"""Resumable flagship job - the `ray job submit` entry point shape.

Runs the spatial-join + tiling pipeline per input fragment with the
manifest sink (state/manifest.py): a killed run resumes by skipping
fragments already recorded in the manifest (checkpoint anti-join).

Usage:
    python scripts/flagship_job.py [--sf /root/testdata/sf0.001] \
        [--out /tmp/flagship_out] [--cpus 8] [--resume]

(On a real cluster: `ray job submit -- python scripts/flagship_job.py ...`
with address from the cluster; here always local mode.)
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/flagship_out")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--res", type=int, default=5)
    ap.add_argument("--zoom", type=int, default=5)
    ap.add_argument(
        "--shard-rows",
        type=int,
        default=2_000_000,
        help="resume-unit size: inputs split into row-group shards of ~this many rows",
    )
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=args.cpus, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data

    import pyarrow as pa

    from geopandas_ray.pipelines.datasets import DOMAIN, _derive_points, zone_table
    from geopandas_ray.stages.sjoin import sjoin
    from geopandas_ray.stages.tiles import assign_tiles
    from geopandas_ray.state.manifest import run_resumable, shard_inputs

    zt = zone_table(args.sf)
    # coarse cell for output partitioning/lineage: tiles regrouped at
    # zoom-2 granularity (16 partitions at zoom 5) so the sink writes a
    # handful of directories per shard, not one per tile
    shift = max(args.zoom - 2, 0)
    nx_coarse = 1 << (args.zoom - shift)

    def add_cell(b: "pa.Table") -> "pa.Table":
        tx = b.column("tile_x").to_numpy()
        ty = b.column("tile_y").to_numpy()
        cell = (ty >> shift) * nx_coarse + (tx >> shift)
        return b.append_column("cell", pa.array(cell, type=pa.int64()))

    def pipeline(ds):
        pts = ds.map_batches(_derive_points, batch_format="pyarrow")
        joined = sjoin(pts, zt, how="inner", predicate="intersects", right_index="zone_key")
        tiled = assign_tiles(joined, args.zoom, domain=DOMAIN)
        return tiled.map_batches(add_cell, batch_format="pyarrow")

    inputs = shard_inputs(
        sorted(glob.glob(f"{args.sf}/documents.parquet")), target_rows=args.shard_rows
    )
    t0 = time.time()
    summary = run_resumable(inputs, args.out, pipeline, partition_by="cell")
    summary["wall_s"] = round(time.time() - t0, 2)
    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()
