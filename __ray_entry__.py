"""Driver contract for the graft builder (Ray Data target).

Thin shim over amharic_ecommerce_data_extractor_ray.entrypoints — see that module for the
query inventory and oracle documentation.  Ray is initialised by the driver
before importing this module; nothing here calls ray.init()/shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from amharic_ecommerce_data_extractor_ray import entrypoints as _ep


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; returns the triples Dataset."""
    return _ep.entry()


def queries() -> dict[str, Callable[[str], Any]]:
    return _ep.queries()


def oracle_sql() -> dict[str, str]:
    return _ep.oracle_sql()
