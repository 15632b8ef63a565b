from .wkb import (  # noqa: F401
    Geoms,
    box_geoms,
    boxes_to_wkb,
    from_wkb,
    points_from_xy,
    points_to_wkb,
    to_wkb,
)
