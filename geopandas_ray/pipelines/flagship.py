"""Flagship pipeline: the north-rule job - spatial join + tiling.

read documents -> derive WKB points -> cell-index both sides (actor pool)
-> one groupby(cell) shuffle -> per-cell STR-tree join -> arithmetic tile
assignment -> (optionally) resumable fragment sink.

This is the SURVEY.md §4.3 physical plan; bench.py times it at sf0.1 and
two parallelism levels for the scaling-efficiency criterion.
"""

from __future__ import annotations

import ray.data

from ..stages.sjoin import sjoin, sjoin_shuffle
from ..stages.tiles import assign_tiles
from .datasets import DOMAIN, doc_points, zone_dataset, zone_table


def flagship(
    sf_dir: str,
    mode: str = "shuffle",
    res: int = 5,
    # 'auto' (sampled hot-cell salting) measured >= parity with salt=1 at 32
    # CPUs on sf0.1 (interleaved min 21.65 vs 23.66 s, wins 4/6 paired
    # draws, identical outputs) - the sampling pre-pass pays for itself;
    # see BASELINE.md round-5 A/B
    salt: int | str = "auto",
    z: int = 5,
    replicate: int = 1,
    batch_size: int = 8192,
    terminal: str = "full",
) -> ray.data.Dataset:
    """Returns the joined + tiled dataset (lazy).

    ``terminal``:
    - "full": every (doc, zone, tile) row is emitted (output-volume-bound:
      the 212x join fanout makes this an object-store bandwidth benchmark);
    - "tile_counts": per-batch partial (tile_id, zone count) aggregation
      FUSES into the join tasks, so the fanout rows never hit the object
      store and the pipeline is compute-bound - the scale-correct terminal
      for statistics jobs (pre-aggregate before the exchange, Ray guide).
    """
    pts = doc_points(sf_dir, columns=("doc_id", "source"), replicate=replicate)
    narrow = terminal == "tile_counts"
    if mode == "shuffle":
        zones = zone_dataset(sf_dir)
        joined = sjoin_shuffle(
            pts,
            zones,
            predicate="intersects",
            res=res,
            domain=DOMAIN,
            salt=salt,
            batch_size=batch_size,
            # statistics terminal needs only ids + geometry: prune the rest
            # before the shuffle so the 200x fanout re-materializes 3 narrow
            # columns, not 10
            left_columns=["doc_id"] if narrow else None,
            right_columns=["zone_key"] if narrow else None,
        )
    else:
        joined = sjoin(
            pts, zone_table(sf_dir), how="inner", predicate="intersects",
            right_index="zone_key", batch_size=batch_size,
        )
    tiled = assign_tiles(joined, z, domain=DOMAIN)
    if terminal == "full":
        return tiled
    import numpy as np
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def partial_counts(b: pa.Table) -> pa.Table:
        tid = np.asarray(b.column("tile_id"))
        uniq, counts = np.unique(tid, return_counts=True)
        return pa.table({"tile_id": pa.array(uniq), "n": pa.array(counts.astype(np.int64))})

    partials = tiled.map_batches(partial_counts, batch_format="pyarrow")
    return partials.groupby("tile_id").aggregate(Sum("n", alias_name="n"))
