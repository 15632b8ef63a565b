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
    salt: int = 1,
    z: int = 5,
    replicate: int = 1,
    batch_size: int = 8192,
) -> ray.data.Dataset:
    """Returns the joined + tiled dataset (lazy)."""
    pts = doc_points(sf_dir, columns=("doc_id", "source"), replicate=replicate)
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
        )
    else:
        joined = sjoin(
            pts, zone_table(sf_dir), how="inner", predicate="intersects",
            right_index="zone_key", batch_size=batch_size,
        )
    return assign_tiles(joined, z, domain=DOMAIN)
