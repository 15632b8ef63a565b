"""Lightweight options machinery — reference ``_config.py`` parity.

The reference exposes ``geopandas.options`` with three options
(``display_precision``, ``io_engine``, ``use_pygeos``); attribute-style
access, validation on set, and a descriptive repr (reference
``_config.py:14-74``). Semantics here:

- ``display_precision``: consumed by :meth:`GeoDataset.to_wkt` when
  ``rounding_precision=None`` is passed (our frame repr is lazy — it never
  renders coordinates — so the WKT materialization is the display surface).
- ``io_engine``: accepted for compatibility ('pyogrio' / 'fiona' / None)
  but ignored — every format reader/writer here is native Ray Data.
- ``use_pygeos``: deprecated in the reference (removed in 1.1); setting it
  warns, exactly like the reference validator.
"""

from __future__ import annotations

import textwrap
import warnings
from collections import namedtuple

Option = namedtuple("Option", "key default_value doc validator callback")


class Options:
    """Attribute-style access to the configuration dict."""

    def __init__(self, options: dict):
        super().__setattr__("_options", options)
        super().__setattr__(
            "_config", {k: o.default_value for k, o in options.items()}
        )

    def __setattr__(self, key, value):
        if key not in self._config:
            raise AttributeError("You can only set the value of existing options")
        option = self._options[key]
        if option.validator:
            option.validator(value)
        self._config[key] = value
        if option.callback:
            option.callback(key, value)

    def __getattr__(self, key):
        try:
            return self._config[key]
        except KeyError:
            raise AttributeError("No such option") from None

    def __dir__(self):
        return list(self._config.keys())

    def __repr__(self):
        cls = self.__class__.__name__
        description = ""
        for key, option in self._options.items():
            description += (
                f"{key}: {self._config[key]!r} [default: {option.default_value!r}]\n"
            )
            doc_text = "\n".join(textwrap.wrap(option.doc or "No description available.", width=70))
            description += textwrap.indent(doc_text, prefix="    ") + "\n"
        space = "\n  "
        return f"{cls}({space}{description.replace(chr(10), space)})"


def _validate_display_precision(value):
    if value is not None and (not isinstance(value, int) or isinstance(value, bool) or value < 0):
        raise ValueError("Invalid value, needs to be a positive integer or None")


def _validate_io_engine(value):
    if value not in (None, "pyogrio", "fiona"):
        raise ValueError(f"Expected 'pyogrio' or 'fiona', got '{value}'")


def _warn_use_pygeos_deprecated(value):
    warnings.warn(
        "pygeos support was removed in 1.0. The option use_pygeos is deprecated "
        "and will be removed in GeoPandas 1.1.",
        FutureWarning,
        stacklevel=3,
    )


display_precision = Option(
    key="display_precision",
    default_value=None,
    doc=(
        "The precision (maximum number of decimals) of the coordinates in the "
        "WKT representation in the Series/DataFrame display. By default (None), "
        "it tries to infer and use 3 decimals for projected coordinates and 5 "
        "decimals for geographic coordinates."
    ),
    validator=_validate_display_precision,
    callback=None,
)

io_engine = Option(
    key="io_engine",
    default_value=None,
    doc=(
        "The default engine for ``read_file`` and ``to_file``. Options are "
        "'pyogrio' and 'fiona'. Accepted for compatibility; geopandas_ray "
        "readers/writers are native and ignore it."
    ),
    validator=_validate_io_engine,
    callback=None,
)

use_pygeos = Option(
    key="use_pygeos",
    default_value=False,
    doc=(
        "Deprecated option previously used to enable PyGEOS. It will be "
        "removed in GeoPandas 1.1."
    ),
    validator=_warn_use_pygeos_deprecated,
    callback=None,
)

options = Options(
    {
        "display_precision": display_precision,
        "use_pygeos": use_pygeos,
        "io_engine": io_engine,
    }
)
