"""Geometry-aware sources/sinks (pygeoops_ray.io): CSV-with-WKT, JSONL,
GeoParquet-tagged sink, and the WKT→WKB parse kernel."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pygeoops_ray import io as gio
from pygeoops_ray.geo import wkb, wkt


def test_wkt_to_wkb_batch_kernel():
    batch = pa.Table.from_pydict(
        {
            "id": [1, 2, 3],
            "wkt": [
                "POINT (3 4)",
                "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
                None,
            ],
        }
    )
    out = gio.wkt_to_wkb_batch(batch)
    assert out.column_names == ["id", "geometry", "minx", "miny", "maxx", "maxy"]
    g0 = wkb.loads(out["geometry"][0].as_py())
    assert g0.wkt == "POINT (3 4)"
    assert out["geometry"][2].as_py() is None
    assert out["minx"][1].as_py() == 0.0 and out["maxy"][1].as_py() == 2.0


@pytest.mark.usefixtures("ray_session")
def test_read_geo_csv_roundtrip(tmp_path):
    path = tmp_path / "geoms.csv"
    rows = []
    for k in range(25):
        x0, y0 = k % 5, k // 5
        rows.append(
            f'{k},"POLYGON (({x0} {y0}, {x0 + 1} {y0}, {x0 + 1} {y0 + 2}, '
            f'{x0} {y0 + 2}, {x0} {y0}))"'
        )
    path.write_text("id,wkt\n" + "\n".join(rows) + "\n")
    ds = gio.read_geo_csv(str(path))
    df = ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert len(df) == 25
    for k in range(25):
        g = wkb.loads(df["geometry"][k])
        assert g.area == pytest.approx(2.0)
        assert df["minx"][k] == k % 5 and df["maxy"][k] == k // 5 + 2


@pytest.mark.usefixtures("ray_session")
def test_read_jsonl(tmp_path):
    path = tmp_path / "docs.jsonl"
    path.write_text(
        "\n".join(json.dumps({"doc_id": i, "text": f"doc {i}"}) for i in range(10))
        + "\n"
    )
    df = gio.read_jsonl(str(path)).to_pandas()
    assert sorted(df["doc_id"]) == list(range(10))


@pytest.mark.usefixtures("ray_session")
def test_write_geoparquet_tags_metadata(tmp_path):
    import ray.data as rd

    geoms = [wkb.dumps(wkt.loads(f"POINT ({i} {i + 1})")) for i in range(8)]
    ds = rd.from_arrow(
        pa.Table.from_pydict({"id": list(range(8)), "geometry": geoms})
    )
    out = str(tmp_path / "geo_out")
    gio.write_geoparquet(ds, out, geometry_col="geometry")
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert files
    sch = pq.read_schema(os.path.join(out, files[0]))
    meta = json.loads(sch.metadata[b"geo"].decode())
    assert meta["primary_column"] == "geometry"
    assert meta["columns"]["geometry"]["encoding"] == "WKB"
    # data survives the tag+write
    back = pq.read_table(os.path.join(out, files[0]))
    got = {wkb.loads(b).coords[0, 0] for b in back["geometry"].to_pylist()}
    assert got == set(float(i) for i in range(8))
