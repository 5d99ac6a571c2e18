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
    """Ordered so the driver's first-50 gate covers every operator family.

    Entries 1-50 are the per-family representatives plus 8 *suite* queries
    (each value-checking several member operators in one row — see
    pygeoops_ray/pipelines/suites.py); the tail repeats every suite member
    individually for full sweeps (tools/check_oracle.py) and bench.
    """
    from pygeoops_ray.pipelines.suites import FINAL_QUERIES

    return dict(FINAL_QUERIES)


def oracle_sql() -> dict[str, str]:
    from pygeoops_ray.pipelines.suites import FINAL_ORACLE_SQL

    return dict(FINAL_ORACLE_SQL)
