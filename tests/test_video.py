"""MP4 (MJPEG-in-BMFF) muxer tests — validates the container the
free-viewpoint video CLI writes (parity with ref model.py:190-207 mp4
output; no ffmpeg in this environment, so structure is checked directly).
"""

import struct

import numpy as np
import pytest

from vanerf_tpu.video import write_mjpeg_mp4, parse_boxes


def _find(boxes, btype):
    got = [b for b in boxes if b[0] == btype]
    assert got, f"missing box {btype}"
    return got[0]


def test_mp4_container_structure(tmp_path):
    rs = np.random.RandomState(0)
    frames = [rs.randint(0, 255, (32, 48, 3), np.uint8) for _ in range(5)]
    path = str(tmp_path / "out.mp4")
    write_mjpeg_mp4(path, frames, fps=10)
    data = open(path, "rb").read()

    top = parse_boxes(data)
    types = [t for t, _, _ in top]
    assert types == [b"ftyp", b"mdat", b"moov"]

    # every stco chunk offset lands on a JPEG SOI marker
    _, moov_s, moov_e = _find(top, b"moov")
    trak = _find(parse_boxes(data, moov_s, moov_e), b"trak")
    mdia = _find(parse_boxes(data, trak[1], trak[2]), b"mdia")
    minf = _find(parse_boxes(data, mdia[1], mdia[2]), b"minf")
    stbl = _find(parse_boxes(data, minf[1], minf[2]), b"stbl")
    sboxes = parse_boxes(data, stbl[1], stbl[2])

    _, stco_s, _ = _find(sboxes, b"stco")
    n = struct.unpack(">I", data[stco_s + 4:stco_s + 8])[0]
    assert n == 5
    offs = struct.unpack(f">{n}I", data[stco_s + 8:stco_s + 8 + 4 * n])
    for o in offs:
        assert data[o:o + 2] == b"\xff\xd8", "chunk is not a JPEG"

    # stsz sizes sum to the mdat payload
    _, stsz_s, _ = _find(sboxes, b"stsz")
    cnt = struct.unpack(">I", data[stsz_s + 8:stsz_s + 12])[0]
    sizes = struct.unpack(f">{cnt}I",
                          data[stsz_s + 12:stsz_s + 12 + 4 * cnt])
    _, mdat_s, mdat_e = _find(top, b"mdat")
    assert sum(sizes) == mdat_e - mdat_s
    # offsets + sizes tile the mdat payload exactly
    assert offs[0] == mdat_s
    for i in range(1, n):
        assert offs[i] == offs[i - 1] + sizes[i - 1]

    # sample description advertises mp4v/MJPEG at the right dimensions
    _, stsd_s, stsd_e = _find(sboxes, b"stsd")
    entry = parse_boxes(data, stsd_s + 8, stsd_e)
    assert entry[0][0] == b"mp4v"
    w, h = struct.unpack(">HH", data[entry[0][1] + 24:entry[0][1] + 28])
    assert (w, h) == (48, 32)
    assert b"esds" in data[entry[0][1]:entry[0][2]]

    # frames decode back from the container via PIL
    from PIL import Image
    import io
    im = Image.open(io.BytesIO(data[offs[2]:offs[2] + sizes[2]]))
    assert im.size == (48, 32)


def test_mp4_rejects_empty(tmp_path):
    with pytest.raises(ValueError):
        write_mjpeg_mp4(str(tmp_path / "e.mp4"), [])


@pytest.mark.slow
def test_render_dynamic_cli_writes_png_gif_mp4(tmp_path):
    """Drive render_dynamic.py's actual main path on the synthetic fixture
    (ref model.py:190-207 writes PNG frames + GIF + mp4)."""
    import json
    import os
    import sys

    from vanerf_tpu import config as vconfig

    cfg = vconfig.default_cfg()
    m = cfg["models"]["VANeRF"]
    m["train_out_h"] = m["train_out_w"] = 8
    m["geo_args"]["n_downsample"] = 2
    m["dr_kwargs"]["sample_per_ray_c"] = 8
    m["dr_kwargs"]["sample_per_ray_f"] = 8
    cfg["dataset"]["synthetic_cfg"] = {"H": 32, "W": 32, "subdiv": 1}
    cfg["video_cfg"] = {"n_frames": 2}
    cfg["out_dir"] = str(tmp_path / "out")
    cfg_path = tmp_path / "tiny.json"
    cfg_path.write_text(json.dumps(cfg))

    sys.path.insert(0, "/root/repo")
    try:
        import render_dynamic
        # --num_gpus 2 exercises the CLI mesh plan; a 32-pixel frame has a
        # single tile, so plan_tile_group degrades it to single-chip
        render_dynamic.main(["--config", str(cfg_path), "--synthetic_data",
                             "--num_gpus", "2",
                             "--out_dir", str(tmp_path / "out")])
    finally:
        sys.path.remove("/root/repo")
    vd = tmp_path / "out" / cfg["expname"] / "video_interhand"
    assert (vd / "000000.png").exists() and (vd / "000001.png").exists()
    assert (vd / "nvs.gif").exists()
    mp4 = vd / "nvs.mp4"
    assert mp4.exists()
    data = mp4.read_bytes()
    assert data[4:8] == b"ftyp"
    assert b"moov" in data and b"mp4v" in data
