"""Audio/video multimodal stages: engine codecs, zero-decode frame slicing,
exact feature kernels. Ray plumbing is covered by the driver queries
(audio_features / audio_resample / video_frames, oracle-checked); these pin
the kernels without a Ray session.
"""

import numpy as np
import pyarrow as pa
import pytest

from pygeoops_ray.table import audio as A
from pygeoops_ray.table import images as I
from pygeoops_ray.table import video as V


class TestAudioCodec:
    @pytest.mark.parametrize("fmt", ["pa8", "paz1"])
    def test_roundtrip(self, fmt):
        s = A.synth_samples(7)
        data = A.encode_audio(s, 8000, fmt)
        out, rate = A.decode_audio(data)
        assert rate == 8000
        np.testing.assert_array_equal(out, s)

    def test_unknown_fmt_raises(self):
        with pytest.raises(ValueError):
            A.encode_audio(np.zeros(4, np.int8), 8000, "mp3")
        with pytest.raises(ValueError):
            A.decode_audio(b"XXxxxxxxxxxx")

    def test_synth_rule(self):
        # generator rule must stay SQL-reproducible: spot-check the formula
        i = 42
        s = A.synth_samples(i)
        n = 4000 + (i * 13) % 1000
        a = 1 + (i * 7919) % 17
        b = (i * 104729) % 256
        assert len(s) == n
        for t in (0, 1, 17, n - 1):
            assert s[t] == ((a * t + b) % 256) - 128

    def test_resample_nearest_exact(self):
        s = A.synth_samples(3)
        out = A.resample_nearest(s, 9000, 4000)
        n_out = -((-len(s) * 4000) // 9000)
        assert len(out) == n_out
        for k in (0, 1, n_out - 1):
            assert out[k] == s[(k * 9000) // 4000]

    def test_resample_identity(self):
        s = A.synth_samples(5)
        np.testing.assert_array_equal(A.resample_nearest(s, 8000, 8000), s)


class TestVideoContainer:
    def test_roundtrip_and_slice(self):
        v = 11
        nf, w, h = V.video_meta(v)
        data = V.synth_video(v)
        n, w2, h2, fps, offs, start = V.parse_header(data)
        assert (n, w2, h2) == (nf, w, h)
        # zero-decode slice of frame j equals an independent per-frame encode
        for j in (0, nf // 2, nf - 1):
            blob = V.frame_bytes(data, j)
            assert blob == I.encode_image(V.synth_frame(v, j, w, h), "qz1")
            pix = I.decode_image(blob)
            src = V.synth_frame(v, j, w, h)
            # qz1 requantization: d = p - p%4 + 2
            np.testing.assert_array_equal(
                pix, (src - src % 4 + 2).astype(np.uint8)
            )

    def test_bad_magic_and_range(self):
        with pytest.raises(ValueError):
            V.parse_header(b"nope" + b"\0" * 20)
        data = V.synth_video(1)
        n, *_ = V.parse_header(data)
        with pytest.raises(IndexError):
            V.frame_bytes(data, n)


class TestStagesNoRay:
    """Stages are plain callables over pa.Table — exercised without Ray."""

    def test_frame_sample_shape_and_zero_decode(self):
        from pygeoops_ray.stages.multimodal import FrameSampleStage

        batch = V.generate_videos_for_ordinals(np.array([0, 1, 2]))
        out = FrameSampleStage(every_n=5)(batch)
        assert out.column_names == ["video_id", "frame_idx", "bytes", "w", "h", "fmt"]
        # one row per sampled frame
        want = sum(len(range(0, V.video_meta(v)[0], 5)) for v in (0, 1, 2))
        assert out.num_rows == want
        assert set(out["fmt"].to_pylist()) == {"qz1"}
        # every emitted frame decodes to the generator's requantized pixels
        for vid, j, blob in zip(
            out["video_id"].to_pylist(),
            out["frame_idx"].to_pylist(),
            out["bytes"].to_pylist(),
        ):
            v = int(vid.split("_")[1])
            nf, w, h = V.video_meta(v)
            src = V.synth_frame(v, j, w, h)
            np.testing.assert_array_equal(
                I.decode_image(blob), (src - src % 4 + 2).astype(np.uint8)
            )

    def test_frame_sample_foreign_codec_stub(self):
        from pygeoops_ray.stages.multimodal import FrameSampleStage

        batch = pa.Table.from_pydict(
            {"video_id": ["x"], "bytes": [b"\x00"], "fmt": ["mp4"]}
        )
        with pytest.raises(NotImplementedError):
            FrameSampleStage(every_n=2)(batch)

    def test_audio_features_brute_force(self):
        from pygeoops_ray.stages.multimodal import AudioFeatureStage

        batch = A.generate_audio_for_ordinals(np.arange(6))
        out = AudioFeatureStage()(batch)
        for r in range(out.num_rows):
            i = int(out["clip_id"][r].as_py().split("_")[1])
            s = A.synth_samples(i).astype(np.int64)
            assert out["n_samples"][r].as_py() == len(s)
            assert out["sum_abs"][r].as_py() == int(np.abs(s).sum())
            assert out["energy"][r].as_py() == int((s * s).sum())
            assert out["max_abs"][r].as_py() == int(np.abs(s).max())
            assert out["zero_crossings"][r].as_py() == int((s[:-1] * s[1:] < 0).sum())

    def test_audio_resample_stage(self):
        from pygeoops_ray.stages.multimodal import AudioResampleStage

        batch = A.generate_audio_for_ordinals(np.arange(4))
        out = AudioResampleStage(rate_out=4000)(batch)
        assert set(out["rate"].to_pylist()) == {4000}
        for r in range(out.num_rows):
            i = int(out["clip_id"][r].as_py().split("_")[1])
            rate, _fmt = A.clip_meta(i)
            s = A.synth_samples(i)
            want = A.resample_nearest(s, rate, 4000)
            got, got_rate = A.decode_audio(out["bytes"][r].as_py())
            assert got_rate == 4000
            np.testing.assert_array_equal(got, want)


class TestImagePyramid:
    def test_pyramid_matches_naive_and_roundtrips(self):
        """pyramid_batch == per-block floor-mean reference at every level,
        incl. odd dims (trailing row/col dropped); bytes decode back to the
        level pixels."""
        from pygeoops_ray.stages.multimodal import pyramid_batch
        from pygeoops_ray.table.images import decode_image, encode_image

        rng = np.random.default_rng(7)
        rows = {"image_id": [], "bytes": [], "fmt": []}
        pix_by_id = {}
        for k, (h, w) in enumerate([(16, 16), (17, 19), (21, 16), (16, 63)]):
            pix = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            iid = f"img_{k:012d}"
            rows["image_id"].append(iid)
            rows["bytes"].append(encode_image(pix, "raw0"))
            rows["fmt"].append("raw0")
            pix_by_id[iid] = pix
        out = pyramid_batch(pa.table(rows)).to_pandas()
        assert len(out) == 8  # 2 levels x 4 images
        for iid, pix in pix_by_id.items():
            cur = pix
            for lvl in (1, 2):
                h2, w2 = cur.shape[0] // 2, cur.shape[1] // 2
                ref = np.empty((h2, w2, 3), dtype=np.uint8)
                for y in range(h2):
                    for x in range(w2):
                        for c in range(3):
                            blk = cur[2 * y : 2 * y + 2, 2 * x : 2 * x + 2, c]
                            ref[y, x, c] = int(blk.astype(int).sum()) // 4
                r = out[(out.image_id == iid) & (out.level == lvl)].iloc[0]
                assert (r.h, r.w) == (h2, w2)
                assert r.sum_rgb == int(ref.astype(np.int64).sum())
                assert r.sum_sq == int((ref.astype(np.int64) ** 2).sum())
                assert r.pyramid_ok == 1
                np.testing.assert_array_equal(decode_image(r["bytes"]), ref)
                cur = ref


class TestZonalStats:
    def test_partials_match_naive(self):
        """zonal_partial_batch == per-pixel zone assignment; boundary
        straddling in both axes."""
        from pygeoops_ray.stages.multimodal import zonal_partial_batch
        from pygeoops_ray.table.images import encode_image

        rng = np.random.default_rng(3)
        # origin 456: zone boundary at 500 falls inside a 64-wide image
        cases = [(456, 72, 64, 60), (0, 0, 16, 16), (190, 395, 20, 16)]
        rows = {"image_id": [], "bytes": [], "fmt": [], "minx": [], "miny": []}
        pix_all = []
        for k, (x0, y0, w, h) in enumerate(cases):
            pix = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            rows["image_id"].append(f"img_{k:012d}")
            rows["bytes"].append(encode_image(pix, "raw0"))
            rows["fmt"].append("raw0")
            rows["minx"].append(float(x0))
            rows["miny"].append(float(y0))
            pix_all.append((x0, y0, pix))
        out = zonal_partial_batch(pa.table(rows)).to_pandas()
        # naive: accumulate every pixel into its zone
        want: dict = {}
        for x0, y0, pix in pix_all:
            h, w, _ = pix.shape
            for y in range(h):
                for x in range(w):
                    key = ((x0 + x) // 100, (y0 + y) // 100)
                    g_, n_ = want.get(key, (0, 0))
                    want[key] = (g_ + int(pix[y, x].astype(int).sum()), n_ + 1)
        got: dict = {}
        for _, r in out.iterrows():
            key = (r.zone_x, r.zone_y)
            g_, n_ = got.get(key, (0, 0))
            got[key] = (g_ + r.sum_gray, n_ + r.n_px)
        assert got == want
        # first case straddles both axes → 4 partial rows for image 0
        assert (out.index < 4).sum() == 4


def test_clip_score_matches_float_cosine():
    """ClipScoreStage's exact integer keep decision vs a float cosine
    reference on 200 generated rows: every row whose cosine is not within
    1e-9 of the 0.05 threshold must agree; dot must equal the brute-force
    integer dot of the two towers."""
    import hashlib
    import struct

    import numpy as np

    from pygeoops_ray.stages.multimodal import ClipScoreStage, decode_any
    from pygeoops_ray.table.images import generate_images_table

    t = generate_images_table(200)
    out = ClipScoreStage()(t).to_pandas().set_index("i")
    for row in range(200):
        px = decode_any(t["bytes"][row].as_py(), t["fmt"][row].as_py())
        h, w, _ = px.shape
        ys = (np.arange(8) * h) // 8
        rows = np.add.reduceat(px.reshape(h, w * 3), ys, axis=0, dtype=np.int64).sum(
            axis=1
        )
        a = 8 * rows - int(rows.sum())
        b = np.zeros(8, np.int64)
        for tok in t["caption"][row].as_py().split(" "):
            h64 = struct.unpack("<Q", hashlib.md5(tok.encode()).digest()[8:16])[0]
            b += np.array([(h64 >> (8 * d)) & 255 for d in range(8)], np.int64) - 128
        dot = int(a @ b)
        assert out.loc[row, "dot"] == dot
        cos = dot / (np.linalg.norm(a.astype(float)) * np.linalg.norm(b.astype(float)))
        if abs(cos - 0.05) > 1e-9:
            assert bool(out.loc[row, "keep"]) == (cos >= 0.05), (row, cos)


def test_image_histogram_brute_force(ray_session):
    """Histogram equals a per-image numpy replay over the same decoded
    pixels; bins partition every image's pixel count (sum == w*h)."""
    import numpy as np
    import pandas as pd

    from pygeoops_ray.pipelines.q_media import q_image_histogram
    from pygeoops_ray.pipelines.common import _image_ds
    from pygeoops_ray.stages.multimodal import decode_any

    sf = "/root/testdata/sf0.001"
    got = (
        q_image_histogram(sf)
        .to_pandas()
        .sort_values(["i", "bin"])
        .reset_index(drop=True)
    )
    ds, n = _image_ds(sf)
    rows = ds.select_columns(["image_id", "bytes", "fmt", "w", "h"]).take_all()
    want_rows = []
    total_px = {}
    for r in rows:
        i = int(r["image_id"][4:])
        pix = decode_any(r["bytes"], r["fmt"])
        gray = pix.astype(np.int64).sum(axis=2)
        counts = np.bincount((gray // 96).ravel(), minlength=8)
        total_px[i] = gray.size
        for b in np.nonzero(counts)[0]:
            want_rows.append((i, int(b), int(counts[b])))
    want = (
        pd.DataFrame(want_rows, columns=["i", "bin", "n_px"])
        .sort_values(["i", "bin"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype(np.int64), want.astype(np.int64))
    per_img = got.groupby("i")["n_px"].sum()
    assert all(per_img[i] == total_px[i] for i in per_img.index)
