"""``geopandas.datasets`` parity — the module exists but every dataset was
removed in GeoPandas 1.0 (reference ``datasets/__init__.py``): ``get_path``
raises with a pointer to the external packages that host the data now."""

from __future__ import annotations

__all__: list = []
available: list = []  # previously part of __all__
_prev_available = ["naturalearth_cities", "naturalearth_lowres", "nybb"]


def get_path(dataset: str) -> str:
    ne_message = "https://www.naturalearthdata.com/downloads/110m-cultural-vectors/."
    nybb_message = (
        "the geodatasets package.\n\nfrom geodatasets import get_path\n"
        "path_to_file = get_path('nybb')\n"
    )
    if dataset in _prev_available:
        raise AttributeError(
            "The geopandas.dataset has been deprecated and was removed in "
            f"GeoPandas 1.0. You can get the original '{dataset}' data from "
            f"{ne_message if 'natural' in dataset else nybb_message}"
        )
    raise AttributeError(
        "The geopandas.dataset has been deprecated and was removed in GeoPandas "
        "1.0. New sample datasets are now available in the geodatasets package "
        "(https://geodatasets.readthedocs.io/en/latest/)"
    )
