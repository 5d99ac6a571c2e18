"""Round-3 fourth wave: watermark/late-data windows, sequence packing,
space-filling-curve layout scans, inverted index — brute-force checks
against pandas/numpy ground truth on the sf0.001 corpus."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"

US_H = 3_600_000_000


def _late_events_brute(events: pd.DataFrame) -> pd.DataFrame:
    """Row-at-a-time watermark replay — the semantics q_late_events must match."""
    eid = events["event_id"].to_numpy()
    tus = events["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    vc = np.floor(events["value"].to_numpy() * 100.0).astype(np.int64)
    arr = tus + (eid * 2654435761) % (2 * US_H) - US_H
    order = np.lexsort((eid, arr))
    run = -(1 << 62)
    late = np.zeros(len(eid), dtype=bool)
    for i in order:
        late[i] = tus[i] < run - US_H
        run = max(run, tus[i])
    wnd = tus // US_H * US_H
    df = pd.DataFrame(
        {"wnd_us": wnd, "late": late.astype(np.int64), "vc": np.where(late, 0, vc)}
    )
    g = df.groupby("wnd_us")
    return (
        pd.concat(
            [
                g.size().rename("n_events"),
                g["late"].sum().rename("n_late"),
                g["vc"].sum().rename("ontime_value_c"),
            ],
            axis=1,
        )
        .reset_index()
        .sort_values("wnd_us")
        .reset_index(drop=True)
    )


def test_late_events_matches_brute_force(ray_session):
    from pygeoops_ray.pipelines.q_relational import q_late_events

    got = (
        q_late_events(SF)
        .to_pandas()
        .sort_values("wnd_us")
        .reset_index(drop=True)[["wnd_us", "n_events", "n_late", "ontime_value_c"]]
    )
    want = _late_events_brute(pd.read_parquet(f"{SF}/events.parquet"))
    pd.testing.assert_frame_equal(
        got.astype(np.int64), want.astype(np.int64), check_dtype=False
    )
    # the stream must actually contain late data for the op to be meaningful
    assert want["n_late"].sum() > 0


def test_late_events_first_arrival_never_late(ray_session):
    """The globally-first arrival has no watermark: the -inf sentinel must not
    wrap under the - DELAY subtraction (the int64.min overflow class)."""
    from pygeoops_ray.pipelines.q_relational import q_late_events

    got = q_late_events(SF).to_pandas()
    events = pd.read_parquet(f"{SF}/events.parquet")
    eid = events["event_id"].to_numpy()
    tus = events["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    arr = tus + (eid * 2654435761) % (2 * US_H) - US_H
    first = np.lexsort((eid, arr))[0]
    wnd_first = int(tus[first] // US_H * US_H)
    row = got[got["wnd_us"] == wnd_first]
    # that window exists and did not count every event late
    assert len(row) == 1 and int(row["n_events"].iloc[0]) > int(row["n_late"].iloc[0])


def _seq_pack_brute(docs: pd.DataFrame, L: int = 256) -> pd.DataFrame:
    docs = docs.sort_values("doc_id")
    t = np.minimum(
        docs["text"].str.split(" ").str.len().to_numpy(np.int64), L
    )
    p, f = 0, 0
    packs, offs = [], []
    for ti in t:
        if f + ti > L:
            p += 1
            f = 0
        packs.append(p)
        offs.append(f)
        f += ti
    return pd.DataFrame(
        {"doc_id": docs["doc_id"].to_numpy(), "pack_id": packs, "pack_off": offs}
    )


def test_seq_pack_matches_sequential_greedy(ray_session):
    """The transfer-function-composed distributed scan must equal the plain
    sequential greedy replay doc by doc (sf0.001 spans 8 ranges, so the
    driver-side composition and per-range carry are genuinely exercised)."""
    from pygeoops_ray.pipelines.q_text import q_seq_pack

    got = (
        q_seq_pack(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = _seq_pack_brute(pd.read_parquet(f"{SF}/documents.parquet"))
    pd.testing.assert_frame_equal(
        got.astype(np.int64), want.astype(np.int64), check_dtype=False
    )
    # structural invariants: pack ids contiguous from 0; offsets within capacity
    assert got["pack_id"].min() == 0
    assert set(np.diff(np.unique(got["pack_id"]))) <= {1}
    assert (got["pack_off"] >= 0).all() and (got["pack_off"] < 256).all()
    assert got["pack_id"].max() > 0  # corpus genuinely spans many packs
