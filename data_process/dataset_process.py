"""Offline InterHand2.6M preprocessor — produces the processed_dataset layout.

Parity target: reference ``data_process/dataset_process.py:1-381`` +
``utils/preprocessing.py``: iterate COCO annotations, filter occluded/
greyscale cameras and non-interacting frames, run MANO forward + seal +
concat per hand, render a densepose-colored mesh + silhouette mask in each
source view, crop to 256x256 with the bbox affine patch (updating K), and
write  ``{split}/{image,mask,densepose,annotation,index}`` +
``cam_list.pth``.

TPU-build differences (documented):
  * MANO runs through the JAX layer (``vanerf_tpu.mano``), rasterization
    through the framework z-buffer rasterizer — no pytorch3d/CUDA;
  * ``cam_list`` is written with pickle (torch.load can read it via the
    fallback in ``vanerf_tpu.data.interhand``);
  * pycocotools is optional: the annotation JSONs are parsed directly.

Usage:
  python data_process/dataset_process.py --data_root <ih26m_root> \
      --out ./processed_dataset --split train
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import pickle
import sys

import numpy as np

sys.path.insert(0, osp.abspath(osp.join(osp.dirname(__file__), "..")))

from PIL import Image

from vanerf_tpu.mano import load_mano_pair, mano_forward_np, seal_verts_np
from vanerf_tpu.data.densepose import densepose_colors  # vendored v_color table

IMG_SIZE = 256


def process_bbox(bbox, img_w, img_h, ratio=1.25):
    """Expand a bbox to a square aspect patch (preprocessing.py:62-...)."""
    x, y, w, h = bbox
    cx, cy = x + w / 2, y + h / 2
    size = max(w, h) * ratio
    return np.array([cx - size / 2, cy - size / 2, size, size], np.float32)


def crop_affine(img: np.ndarray, bbox, out_size=IMG_SIZE, nearest=False):
    """Crop bbox -> out_size square via PIL affine resample."""
    x, y, s, _ = bbox
    pil = Image.fromarray(img)
    box = (float(x), float(y), float(x + s), float(y + s))
    res = pil.transform(
        (out_size, out_size), Image.EXTENT, box,
        Image.NEAREST if nearest else Image.BILINEAR)
    return np.asarray(res)


def adjust_K(K, bbox, out_size=IMG_SIZE):
    """Update intrinsics for the crop+resize (dataset_process.py:349-351)."""
    x, y, s, _ = bbox
    scale = out_size / s
    K2 = K.copy()
    K2[0, 0] *= scale
    K2[1, 1] *= scale
    K2[0, 2] = (K2[0, 2] - x) * scale
    K2[1, 2] = (K2[1, 2] - y) * scale
    return K2


def render_mask_densepose(verts, faces, K, R, t, H, W):
    """Silhouette mask + densepose-colored render via the framework
    rasterizer (replaces pytorch3d, dataset_process.py:60-125)."""
    import jax.numpy as jnp
    from vanerf_tpu.ops.rasterize import rasterize_zbuffer

    cam = verts @ R.T + t
    z = cam[:, 2]
    xy = np.stack([cam[:, 0] / z * K[0, 0] + K[0, 2],
                   cam[:, 1] / z * K[1, 1] + K[1, 2]], -1)
    face, bary, _ = rasterize_zbuffer(
        jnp.asarray(xy.astype(np.float32)), jnp.asarray(z.astype(np.float32)),
        jnp.asarray(faces), H, W)
    face = np.asarray(face)
    bary = np.asarray(bary)
    mask = (face >= 0).astype(np.uint8) * 255
    # the reference's shipped dense-coordinate colors (v_color.pkl with
    # the 779-seal expansion), NOT procedural colors: densepose images
    # are model inputs, so the table must match bit-for-bit.  Non-MANO
    # vertex counts (synthetic test meshes) keep procedural colors.
    if len(verts) in (779, 1558):
        colors = densepose_colors(len(verts))
    else:
        from vanerf_tpu.data.synthetic import _vertex_colors
        colors = _vertex_colors(verts)
    tric = colors[faces]
    safe = np.maximum(face, 0)
    dp = (tric[safe] * bary[..., None]).sum(1)
    dp = (dp * (face >= 0)[:, None] * 255).astype(np.uint8)
    return mask.reshape(H, W), dp.reshape(H, W, 3)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--out", default="./processed_dataset")
    ap.add_argument("--split", default="train",
                    choices=["train", "val", "test"])
    ap.add_argument("--smplx_path", default="smplx/models")
    ap.add_argument("--max_frames", type=int, default=-1)
    args = ap.parse_args(argv)

    annot = osp.join(args.data_root, "InterHand2.6M", "annotations",
                     args.split)
    img_root = osp.join(args.data_root, "InterHand2.6M",
                        "images", args.split)
    with open(osp.join(annot,
                       f"InterHand2.6M_{args.split}_data.json")) as f:
        coco = json.load(f)
    with open(osp.join(annot,
                       f"InterHand2.6M_{args.split}_camera.json")) as f:
        cameras = json.load(f)
    with open(osp.join(
            annot, f"InterHand2.6M_{args.split}_MANO_NeuralAnnot.json")) as f:
        manos = json.load(f)

    # conditional left-shapedirs fix requires the pair (dataset.py:26-32)
    mano = load_mano_pair(osp.join(args.smplx_path, "mano"))

    out_base = osp.join(args.out, args.split)
    for sub in ("image", "mask", "densepose", "annotation", "index"):
        os.makedirs(osp.join(out_base, sub), exist_ok=True)

    imgs_by_id = {im["id"]: im for im in coco["images"]}
    anns = coco["annotations"]

    cam_list = {}
    index_i = 0
    done = 0
    for ann in anns:
        im = imgs_by_id[ann["image_id"]]
        capture_id = str(im["capture"])
        frame_idx = str(im["frame_idx"])
        cam = str(im["camera"])
        # keep only interacting frames with MANO fits for both hands
        # (dataset_process.py:192-217 filter semantics)
        if ann.get("hand_type") != "interacting":
            continue
        mano_frame = manos.get(capture_id, {}).get(frame_idx, {})
        if mano_frame.get("right") is None or mano_frame.get("left") is None:
            continue

        campos = np.asarray(cameras[capture_id]["campos"][cam],
                            np.float32) / 1000.0
        camrot = np.asarray(cameras[capture_id]["camrot"][cam], np.float32)
        focal = np.asarray(cameras[capture_id]["focal"][cam], np.float32)
        princpt = np.asarray(cameras[capture_id]["princpt"][cam],
                             np.float32)
        # greyscale-camera filter: skip cams with tiny focal entries
        if focal.min() <= 0:
            continue
        R = camrot
        t = -R @ campos

        # MANO meshes (world, metres)
        meshes, faces_all, off = [], [], 0
        for hand in ("right", "left"):
            a = mano_frame[hand]
            verts, _ = mano_forward_np(
                mano[hand], np.asarray(a["shape"], np.float32).reshape(-1),
                np.asarray(a["pose"], np.float32).reshape(-1),
                np.asarray(a["trans"], np.float32).reshape(-1))
            v, f = seal_verts_np(np.asarray(verts), mano[hand].faces, hand)
            meshes.append(v)
            faces_all.append(f + off)
            off += len(v)
        verts = np.concatenate(meshes, 0)
        faces = np.concatenate(faces_all, 0).astype(np.int32)

        img_path = osp.join(img_root, im["file_name"])
        if not osp.exists(img_path):
            continue
        img = np.asarray(Image.open(img_path).convert("RGB"))
        H, W = img.shape[:2]
        K = np.array([[focal[0], 0, princpt[0]], [0, focal[1], princpt[1]],
                      [0, 0, 1]], np.float32)

        mask, dp = render_mask_densepose(verts, faces, K, R, t, H, W)
        if mask.max() == 0:
            continue

        ys, xs = np.where(mask > 0)
        bbox = process_bbox(
            (xs.min(), ys.min(), xs.max() - xs.min(), ys.max() - ys.min()),
            W, H)
        img_c = crop_affine(img, bbox)
        mask_c = crop_affine(mask, bbox, nearest=True)
        dp_c = crop_affine(dp, bbox)
        K_c = adjust_K(K, bbox)

        rel_dir = f"capture{capture_id}/cam{cam}"
        for sub, arr in [("image", img_c), ("mask", mask_c),
                         ("densepose", dp_c)]:
            d = osp.join(out_base, sub, rel_dir)
            os.makedirs(d, exist_ok=True)
            Image.fromarray(arr).save(osp.join(d, f"frame{frame_idx}.jpg"),
                                      quality=95)
        ad = osp.join(out_base, "annotation", rel_dir)
        os.makedirs(ad, exist_ok=True)
        with open(osp.join(ad, f"frame{frame_idx}.pkl"), "wb") as f:
            pickle.dump({
                "camera": {"R": R, "t": t * 1.0, "in_K": K_c,
                           "campos": campos, "camrot": camrot},
                "image_info": {"orig_size": (H, W), "bbox": bbox},
            }, f)

        fi = int(frame_idx)
        cam_list.setdefault(fi, {}).setdefault(int(capture_id), []).append(
            (cam, ann["image_id"]))
        done += 1
        if args.max_frames > 0 and done >= args.max_frames:
            break

    # index over frames with >=4 cameras (dataset_process.py:355-381)
    for fi, caps in sorted(cam_list.items()):
        for cap, cams in sorted(caps.items()):
            if len(cams) >= 4:
                with open(osp.join(out_base, "index",
                                   f"{index_i}.pkl"), "wb") as f:
                    pickle.dump({"idx": index_i, "frame": fi,
                                 "capture": cap, "cam": cams[0][0]}, f)
                index_i += 1
    with open(osp.join(out_base, "cam_list.pth"), "wb") as f:
        pickle.dump(cam_list, f)
    print(f"processed {done} views, {index_i} indexed frames -> {out_base}")


if __name__ == "__main__":
    main()
