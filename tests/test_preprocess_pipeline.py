"""End-to-end offline-preprocessor test: RAW InterHand2.6M layout ->
``dataset_process.py`` -> processed_dataset -> ``InterHandDataset`` ->
renderer-shaped batch.

The real raw dataset can't ship (zero egress), so this fixture reproduces
the raw annotation schema exactly (COCO ``*_data.json``, ``*_camera.json``
with mm campos/camrot/focal/princpt, ``*_MANO_NeuralAnnot.json``,
``*_joint_3d.json`` — ref ``data_process/dataset_process.py:117-150`` and
``src/dataset.py:380-426``) and drives the whole disk pipeline through it.
"""

import json
import os
import os.path as osp
import sys

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow       # 4 full 256^2 rasterizations on CPU

CAPTURE = "3"
FRAME = "5"
CAMS = ["410001", "410004", "410010", "410018"]
RAW_H = RAW_W = 256


@pytest.fixture(scope="module")
def raw_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ih_raw"))
    ann = osp.join(root, "InterHand2.6M", "annotations", "train")
    os.makedirs(ann)

    rs = np.random.RandomState(0)
    images, annots = [], []
    cameras = {CAPTURE: {"campos": {}, "camrot": {}, "focal": {},
                         "princpt": {}}}
    for i, cam in enumerate(CAMS):
        fname = (f"Capture{CAPTURE}/ROM0/cam{cam}/image{FRAME}.jpg")
        images.append({"id": 100 + i, "capture": int(CAPTURE),
                       "frame_idx": int(FRAME), "camera": cam,
                       "file_name": fname, "width": RAW_W,
                       "height": RAW_H})
        annots.append({"id": 200 + i, "image_id": 100 + i,
                       "hand_type": "interacting",
                       "hand_type_valid": 1})
        # cameras on a small ring near the origin looking +z;
        # hands sit at z ~ 1.1 m. campos is in MILLIMETRES in the raw
        # schema (dataset_process divides by 1000).
        cameras[CAPTURE]["campos"][cam] = [40.0 * i - 60.0, 10.0 * i, 0.0]
        cameras[CAPTURE]["camrot"][cam] = np.eye(3).tolist()
        cameras[CAPTURE]["focal"][cam] = [300.0, 300.0]
        cameras[CAPTURE]["princpt"][cam] = [RAW_W / 2, RAW_H / 2]
        # a raw image (any content; the pipeline masks it anyway)
        d = osp.join(root, "InterHand2.6M", "images", "train",
                     osp.dirname(fname))
        os.makedirs(d, exist_ok=True)
        img = (rs.rand(RAW_H, RAW_W, 3) * 200 + 30).astype(np.uint8)
        Image.fromarray(img).save(osp.join(root, "InterHand2.6M", "images",
                                           "train", fname))

    with open(osp.join(ann, "InterHand2.6M_train_data.json"), "w") as f:
        json.dump({"images": images, "annotations": annots}, f)
    with open(osp.join(ann, "InterHand2.6M_train_camera.json"), "w") as f:
        json.dump(cameras, f)
    manos = {CAPTURE: {FRAME: {
        hand: {"pose": np.zeros(48).tolist(),
               "shape": np.zeros(10).tolist(),
               "trans": [0.04 if hand == "right" else -0.04, 0.0, 1.1]}
        for hand in ("right", "left")}}}
    with open(osp.join(ann, "InterHand2.6M_train_MANO_NeuralAnnot.json"),
              "w") as f:
        json.dump(manos, f)
    joints = {CAPTURE: {FRAME: {
        "world_coord": (np.random.RandomState(1)
                        .normal(scale=40.0, size=(42, 3)) +
                        [0, 0, 1100]).tolist()}}}
    with open(osp.join(ann, "InterHand2.6M_train_joint_3d.json"),
              "w") as f:
        json.dump(joints, f)
    return root


def test_raw_to_processed_to_batch(raw_root):
    sys.path.insert(0, "/root/repo")
    try:
        from data_process import dataset_process
        dataset_process.main([
            "--data_root", raw_root,
            "--out", osp.join(raw_root, "processed_dataset"),
            "--split", "train",
            "--smplx_path", osp.join(raw_root, "nonexistent")])
    finally:
        sys.path.remove("/root/repo")

    base = osp.join(raw_root, "processed_dataset", "train")
    # all four camera views processed, one indexed frame (>=4 cams rule,
    # ref dataset_process.py:355-381)
    for cam in CAMS:
        rel = f"capture{CAPTURE}/cam{cam}/frame{FRAME}.jpg"
        for sub in ("image", "mask", "densepose"):
            assert osp.exists(osp.join(base, sub, rel)), (sub, rel)
        apath = osp.join(base, "annotation",
                         f"capture{CAPTURE}/cam{cam}/frame{FRAME}.pkl")
        assert osp.exists(apath)
    assert osp.exists(osp.join(base, "index", "0.pkl"))
    assert osp.exists(osp.join(base, "cam_list.pth"))

    # masks are non-trivial silhouettes of the two-hand mesh
    m = np.asarray(Image.open(osp.join(
        base, "mask", f"capture{CAPTURE}/cam{CAMS[0]}/frame{FRAME}.jpg")))
    frac = (m > 100).mean()
    assert 0.005 < frac < 0.9, frac

    # intrinsics were rewritten for the crop: principal point re-centred
    import pickle
    with open(osp.join(base, "annotation",
                       f"capture{CAPTURE}/cam{CAMS[0]}/"
                       f"frame{FRAME}.pkl"), "rb") as f:
        anno = pickle.load(f)
    K = np.asarray(anno["camera"]["in_K"])
    assert K.shape[0] >= 3 and K[0, 0] > 0

    # the training loader consumes the processed tree end-to-end
    from vanerf_tpu.data.interhand import InterHandDataset
    from vanerf_tpu.training.loop import collate_numpy

    ds = InterHandDataset(
        split="train", data_root=raw_root,
        smplx_path=osp.join(raw_root, "nonexistent"),
        max_len=1, num_input_view=1)
    item = ds[0]
    assert item is not None, "loader failed on preprocessor output"
    assert item["src_img"].shape == (1, 256, 256, 3)
    assert item["verts"].shape == (2 * 779, 3)
    batch = collate_numpy([item], faces=ds.faces)
    assert batch["tar_img"].shape == (1, 256, 256, 3)
    for k, v in item.items():
        if isinstance(v, np.ndarray) and v.dtype.kind == "f":
            assert np.isfinite(v).all(), k
