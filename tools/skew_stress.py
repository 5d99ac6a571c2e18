"""Skew stress: salted vs unsalted PIP join on a pathological hot-cell corpus.

Builds 200k rect footprints and N points with FRAC of them packed inside ONE
image's footprint (a single hot Hilbert cell — the "celebrity key" case every
all-to-all shuffle fears), then runs the cell-cogrouped PIP join with and
without hot-bucket salting and reports both walls plus the (identical) output
count. Evidence row for BASELINE.md.

Usage: python tools/skew_stress.py [n_points] [hot_frac]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.7

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR"
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from pygeoops_ray.pipelines.flagship import add_footprint, image_table_ds
    from pygeoops_ray.stages import spatial as sp
    from pygeoops_ray.table.images import footprint_of_ordinal

    # hot zone: image ordinal 0's footprint (one Hilbert cell neighborhood)
    minx, miny, maxx, maxy = (
        float(v[0]) if hasattr(v, "__len__") else float(v)
        for v in footprint_of_ordinal([0], [16], [16])
    )

    def pts(batch: pa.Table) -> pa.Table:
        i = batch["id"].to_numpy()
        # splitmix-ish deterministic jitter per ordinal
        z = (i.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(11)
        u1 = (z % np.uint64(1 << 20)).astype(np.float64) / float(1 << 20)
        u2 = ((z >> np.uint64(20)) % np.uint64(1 << 20)).astype(np.float64) / float(
            1 << 20
        )
        hot = (i % 1_000_000) < int(hot_frac * 1_000_000)
        # hot points inside the hot rect; cold points spread over the world
        px = np.where(hot, minx + u1 * (maxx - minx), u1 * 120_000.0)
        py = np.where(hot, miny + u2 * (maxy - miny), u2 * 120_000.0)
        return pa.Table.from_pydict(
            {
                "event_id": pa.array(i, pa.int64()),
                "px": pa.array(px, pa.float64()),
                "py": pa.array(py, pa.float64()),
            }
        )

    def rects():
        return image_table_ds(200_000, columns=["image_id", "w", "h"]).map_batches(
            add_footprint, batch_format="pyarrow"
        )

    def points():
        return rd.range(n_points).map_batches(pts, batch_format="pyarrow")

    rects().materialize()
    points().materialize()  # warm generators out of the timing

    results = {}
    for label, salt in (("unsalted", False), ("salted", True)):
        t0 = time.time()
        n = sp.pip_join_rects_points(
            rects(), points(), strategy="groupby", salt_hot=salt, salt_factor=16
        ).count()
        results[label] = (round(time.time() - t0, 2), n)
        print(f"{label}: {results[label][0]} s, {n} join rows", flush=True)

    assert results["salted"][1] == results["unsalted"][1], "outputs must match"
    import json

    print(
        json.dumps(
            {
                "metric": "skew_salting_pip_join",
                "n_points": n_points,
                "hot_frac": hot_frac,
                "unsalted_sec": results["unsalted"][0],
                "salted_sec": results["salted"][0],
                "join_rows": results["salted"][1],
                "speedup": round(results["unsalted"][0] / results["salted"][0], 2),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
