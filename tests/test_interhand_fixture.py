"""End-to-end test of the InterHand2.6M disk pipeline on a synthetic
on-disk fixture (the real dataset never ships in CI; MANO pkls fall back
to the deterministic synthetic model).

Covers: index/annotation pkl parsing, cam_list.pth (torch pickle), image/
mask/densepose loading + masking + target-mask erosion, MANO two-hand
forward + sealing, ray/near-far derivation, view selection, the 4x4
matrix assembly contract of ``_getitem`` (reference dataset.py:372-585),
and collate into a renderer-shaped batch.
"""

import json
import os
import os.path as osp
import pickle

import numpy as np
import pytest
from PIL import Image


CAPTURE = 0
FRAME = 17
CAMS = ["400002", "400004", "400009", "400012"]
H = W = 64


def _camera(i):
    rs = np.random.RandomState(100 + i)
    angle = i * np.pi / 6
    R = np.asarray([[np.cos(angle), 0, np.sin(angle)],
                    [0, 1, 0],
                    [-np.sin(angle), 0, np.cos(angle)]], np.float32)
    t = np.asarray([0.05 * i, 0.0, 1.0 + 0.02 * i], np.float32)
    K = np.asarray([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]],
                   np.float32)
    in_K = np.eye(4, dtype=np.float32)
    in_K[:3, :3] = K
    del rs
    # InterHand-style camrot/campos (mm): cam = R @ world + t
    #   == camrot @ (world - campos/1000)  =>  camrot=R, campos=-1000 R^T t
    campos = (-1000.0 * R.T @ t).astype(np.float32)
    return {"R": R, "t": t, "in_K": in_K, "camrot": R, "campos": campos}


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ih26m"))
    ann = osp.join(root, "InterHand2.6M/annotations/train")
    proc = osp.join(root, "processed_dataset/train")
    os.makedirs(ann)
    for sub in ("index", "annotation", "image", "mask", "densepose"):
        os.makedirs(osp.join(proc, sub))

    joints = {str(CAPTURE): {str(FRAME): {
        "world_coord": (np.random.RandomState(0)
                        .normal(scale=50.0, size=(42, 3))).tolist()}}}
    with open(osp.join(ann, "InterHand2.6M_train_joint_3d.json"), "w") as f:
        json.dump(joints, f)

    manos = {str(CAPTURE): {str(FRAME): {
        hand: {"pose": (np.zeros(48)).tolist(),
               "shape": (np.zeros(10)).tolist(),
               "trans": [0.03 if hand == "right" else -0.03, 0.0, 1.1]}
        for hand in ("right", "left")}}}
    with open(osp.join(ann, "InterHand2.6M_train_MANO_NeuralAnnot.json"),
              "w") as f:
        json.dump(manos, f)

    import torch
    cam_list = {FRAME: {CAPTURE: [(c, 0) for c in CAMS]}}
    torch.save(cam_list, osp.join(proc, "cam_list.pth"))

    with open(osp.join(proc, "index", "0.pkl"), "wb") as f:
        pickle.dump({"frame": FRAME, "capture": CAPTURE}, f)

    rs = np.random.RandomState(1)
    for i, cam in enumerate(CAMS):
        d = f"capture{CAPTURE}/cam{cam}"
        for sub in ("annotation", "image", "mask", "densepose"):
            os.makedirs(osp.join(proc, sub, d), exist_ok=True)
        with open(osp.join(proc, "annotation", d, f"frame{FRAME}.pkl"),
                  "wb") as f:
            pickle.dump({"camera": _camera(i)}, f)
        img = (rs.random((H, W, 3)) * 200 + 40).astype(np.uint8)
        mask = np.zeros((H, W), np.uint8)
        mask[16:48, 16:48] = 255
        rel = f"{d}/frame{FRAME}.jpg"
        Image.fromarray(img).save(osp.join(proc, "image", rel))
        Image.fromarray(mask).save(osp.join(proc, "mask", rel))
        Image.fromarray(img[..., ::-1]).save(osp.join(proc, "densepose", rel))
    return root


def test_interhand_getitem_end_to_end(fake_root):
    from vanerf_tpu.data.interhand import InterHandDataset

    ds = InterHandDataset(split="train", data_root=fake_root,
                          smplx_path=osp.join(fake_root, "nonexistent"),
                          max_len=1, num_input_view=1)
    assert ds.faces.shape[1] == 3 and ds.num_v == 779
    item = ds[0]
    assert item is not None, "fixture item failed to load"

    assert item["src_img"].shape == (1, H, W, 3)
    assert item["src_mask"].shape == (1, H, W, 1)
    assert item["src_krt"].shape == (1, 4, 4)
    assert item["tar_img"].shape == (H, W, 3)
    assert item["tar_k"].shape == (4, 4)
    assert item["verts"].shape == (2 * 779, 3)
    assert item["kpt3d"].shape == (42, 3)
    assert item["bounds"].shape == (2, 3)
    assert item["mask_at_box"].shape == (H, W)
    for k, v in item.items():
        if isinstance(v, np.ndarray) and v.dtype.kind == "f":
            assert np.isfinite(v).all(), k

    # masked pixels are zeroed; target mask eroded consistently
    tm = item["tar_mask"][..., 0]
    assert (item["tar_img"][tm == 0] == 0).all()
    # target K/Rt match the fixture camera annotation; krt = K @ Rt
    cam_i = CAMS.index(str(item["cam_ind"]))
    anno_cam = _camera(cam_i)
    np.testing.assert_allclose(item["tar_k"][:3, :3],
                               anno_cam["in_K"][:3, :3], rtol=1e-6)
    np.testing.assert_allclose(item["tar_rt"][:3, :3], anno_cam["R"],
                               rtol=1e-6)
    np.testing.assert_allclose(item["tar_rt"][:3, 3], anno_cam["t"],
                               rtol=1e-6)
    # source view: identify its fixture camera by extrinsics, then check
    # krt = K @ Rt exactly as assembled by _getitem (interhand.py:320)
    src_rt = item["src_extrin"][0]
    src_cams = [i for i in range(len(CAMS))
                if np.allclose(src_rt[:3, :3], _camera(i)["R"], atol=1e-6)]
    assert len(src_cams) == 1 and src_cams[0] != cam_i
    np.testing.assert_allclose(item["src_krt"][0],
                               _camera(src_cams[0])["in_K"] @ src_rt,
                               rtol=1e-5)
    # determinism: train items are seeded by index
    item2 = ds[0]
    np.testing.assert_array_equal(item["src_krt"], item2["src_krt"])
    np.testing.assert_array_equal(item["tar_img"], item2["tar_img"])


def test_interhand_collate_renders_shape(fake_root):
    from vanerf_tpu.data.interhand import InterHandDataset
    from vanerf_tpu.training.loop import collate_numpy

    ds = InterHandDataset(split="train", data_root=fake_root,
                          smplx_path=osp.join(fake_root, "nonexistent"),
                          max_len=1, num_input_view=1)
    batch = collate_numpy([ds[0]], faces=ds.faces)
    assert batch["src_img"].shape == (1, H, W, 3)
    assert batch["verts"].shape == (1, 2 * 779, 3)
    assert batch["faces"].shape[1] == 3
    assert batch["tar_k"].shape == (1, 4, 4)


def test_interhand_use_intag_preds(fake_root):
    """Estimated-mesh input mode (reference dataset.py:99-101,429-430,
    485-496): verts_preds pkl loading, joint regression via the 21-joint
    regressor, cam2world, sealing, pred-mesh bounds, kpt3d override.

    The reference's own branch crashes as written (undefined ``face`` at
    dataset.py:512) — the loader seals the predicted hands to the
    standard 1558-vert topology instead (documented deviation)."""
    from vanerf_tpu.data.interhand import InterHandDataset
    from vanerf_tpu.mano.layer import seal_verts_np

    proc = osp.join(fake_root, "processed_dataset/train")
    os.makedirs(osp.join(proc, "verts_preds"), exist_ok=True)
    rs = np.random.RandomState(7)

    # vendored-regressor stand-in: rows sum to 1 over 778 verts
    jr = np.abs(rs.random((21, 778)).astype(np.float32))
    jr /= jr.sum(1, keepdims=True)
    smplx = osp.join(fake_root, "smplx_intag")
    os.makedirs(osp.join(smplx, "mano"), exist_ok=True)
    np.save(osp.join(smplx, "mano", "J_regressor_mano_ih26m.npy"), jr)

    # camera-space "InTagHand prediction" for annotation id 0 (every
    # fixture view shares aid=0)
    vert_cam = rs.normal(scale=0.03, size=(1556, 3)).astype(np.float32)
    vert_cam[:, 2] += 1.1
    with open(osp.join(proc, "verts_preds", "0.pkl"), "wb") as f:
        pickle.dump(vert_cam, f)

    ds = InterHandDataset(split="train", data_root=fake_root,
                          smplx_path=smplx, max_len=1, num_input_view=1,
                          use_intag_preds=True)
    item = ds._getitem(0)      # surface errors (ds[0] is None-tolerant)

    assert item["verts"].shape == (2 * 779, 3)
    assert item["kpt3d"].shape == (42, 3)

    # independent recomputation from the target view's camera
    cam_i = CAMS.index(str(item["cam_ind"]))
    cam = _camera(cam_i)
    camrot = cam["camrot"].reshape(3, 3)
    campos = cam["campos"].reshape(3, 1) / 1000.0
    world = (np.linalg.inv(camrot) @ vert_cam.T + campos).T
    sr, _ = seal_verts_np(world[:778].astype(np.float32),
                          ds.mano["right"].faces, "right")
    sl, _ = seal_verts_np(world[778:].astype(np.float32),
                          ds.mano["left"].faces, "left")
    expected = np.concatenate([sr, sl], 0)
    np.testing.assert_allclose(item["verts"], expected, atol=1e-5)

    jworld = (np.linalg.inv(camrot)
              @ np.concatenate([jr @ vert_cam[:778],
                                jr @ vert_cam[778:]], 0).T + campos).T
    np.testing.assert_allclose(item["kpt3d"], jworld, atol=1e-5)

    # bounds from the PRED mesh, z-padded (dataset.py:131-138)
    np.testing.assert_allclose(
        item["bounds"],
        np.stack([expected.min(0) - [0, 0, 0.05],
                  expected.max(0) + [0, 0, 0.05]], 0), atol=1e-5)


def test_interhand_dataset_pickles_for_worker_pool(fake_root):
    """The forkserver sample-loader ships the dataset to workers by
    pickle; items must be identical across the roundtrip (dataset[i] is
    index-seeded and pure)."""
    import pickle
    from vanerf_tpu.data.interhand import InterHandDataset

    ds = InterHandDataset(split="train", data_root=fake_root,
                          smplx_path=osp.join(fake_root, "nonexistent"),
                          max_len=1, num_input_view=1)
    ds2 = pickle.loads(pickle.dumps(ds))
    a, b = ds[0], ds2[0]
    assert (a is None) == (b is None)
    if a is not None:
        for k in a:
            if np.ndim(a[k]) > 0:
                np.testing.assert_array_equal(np.asarray(a[k]),
                                              np.asarray(b[k]), err_msg=k)
