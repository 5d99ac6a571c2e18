"""Benchmark harness: headline spatial-join + tile-assignment throughput.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "images_per_sec": ..., "n_images": ...}

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS (default 32).
``--scaling`` runs the headline twice in fresh processes (8 vs 32 cpus) and
prints throughput at both plus scaling efficiency.
"""

from __future__ import annotations

import json
import os
import sys
import time


def run_bench() -> dict:
    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    import pyarrow.parquet as pq

    from pygeoops_ray.pipelines import queries as Q
    from pygeoops_ray.pipelines.flagship import flagship, image_table_ds, images_parquet_path

    n_part = pq.read_metadata(f"{sf_dir}/part.parquet").num_rows
    n_images = n_part * 10

    # materialize + warm the synthetic image table (untimed: generation and
    # OS page cache are not the workload)
    images_parquet_path(n_images)
    image_table_ds(n_images).count()

    # headline: full flagship chain (decode+validate → footprint → cells →
    # covering tiles → PIP join → per-image counts)
    t0 = time.time()
    res = flagship(sf_dir, n_images=n_images, decode=True, concurrency=max(2, num_cpus // 2))
    n_out = res.count()
    headline = time.time() - t0

    qtimes: dict[str, float] = {}
    bench_queries = [
        "tile_assignment",
        "pip_join",
        "clip_join",
        "knn",
        "dedup_events",
        "token_count",
        "ann_topk",
        "pricing_summary",
        "near_dup_pairs",
    ]
    for name in bench_queries:
        fn = Q.QUERIES[name]
        t0 = time.time()
        out = fn(sf_dir)
        # consume without materializing to the driver
        import ray.data as rd

        if isinstance(out, rd.Dataset):
            out.count()
        qtimes[name] = round(time.time() - t0, 3)

    sf = sf_dir.rstrip("/").split("/")[-1].replace("sf", "")
    result = {
        "metric": "spatial_join_tile_assignment_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "num_cpus": num_cpus,
        "n_images": n_images,
        "images_per_sec": round(n_images / headline, 1),
        "n_out": n_out,
    }
    ray.shutdown()
    return result


def run_scaling():
    import subprocess

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo = one(lo)
    r_hi = one(hi)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "cpus_lo": lo,
                "cpus_hi": hi,
                "sec_lo": t_lo,
                "sec_hi": t_hi,
                "images_per_sec_lo": r_lo["images_per_sec"],
                "images_per_sec_hi": r_hi["images_per_sec"],
                "scaling_efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
