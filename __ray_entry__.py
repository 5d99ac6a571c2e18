"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01 and
compares it against the matching ``oracle_sql()[name]`` via DuckDB (row-count +
schema + order-insensitive value-hash → CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing here
(or in the library code it calls) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: synthetic image table →
    decode+validate → footprint → Hilbert cells → PIP join with event points →
    per-image counts."""
    from pygeoops_ray.pipelines.flagship import flagship

    return flagship("/root/testdata/sf0.001", n_images=1000)


def queries() -> dict[str, Callable[[str], Any]]:
    from pygeoops_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from pygeoops_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
