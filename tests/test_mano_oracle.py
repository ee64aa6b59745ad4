"""Independent oracle for the MANO LBS math (VERDICT r3 Missing #3/#5).

The reference gets its MANO semantics from smplx (``src/dataset.py:26-32``);
``vanerf_tpu/mano/layer.py`` reimplements blend shapes + LBS.  Previous
tests only checked zero-pose / global-rotation invariants, which pass
regardless of posedirs / skinning wiring.  Here a from-scratch numpy oracle
implements the MANO formulation with a DIFFERENT decomposition:

  * rotations via ``scipy.spatial.transform.Rotation`` (not our Rodrigues),
  * global joint frames via explicit recursion over (R_glob, J_posed)
    pairs (not homogeneous 4x4 chain products with a post-hoc rest-joint
    correction),
  * skinning as sum_j w_vj (R_glob_j (v_posed - J_rest_j) + J_posed_j)
    (not a blended 4x4 transform applied to homogeneous vertices).

Any miswiring of shape blendshapes, posedirs layout, the (R-I) pose
feature, hands_mean composition, parent indexing, the rest-joint
correction, or the skinning-weight application makes these disagree.

Also covers the CONDITIONAL left-shapedirs fix (``src/dataset.py:29-32``):
flip only when the left pkl ships right-hand x-shapedirs (the official
buggy release), never double-flip a corrected pkl.
"""

import os
import pickle

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from vanerf_tpu.mano import load_mano_model, load_mano_pair, mano_forward
from vanerf_tpu.mano.layer import (ManoModel, N_FACES, N_JOINTS, N_VERTS,
                                   synthetic_mano_model)

MANO_PARENTS = np.array([0, 0, 1, 2, 0, 4, 5, 0, 7, 8, 0, 10, 11, 0, 13, 14],
                        np.int32)


def random_mano_model(seed: int, is_rhand: bool) -> ManoModel:
    """A fully randomized model exercising every LBS term (unlike
    ``synthetic_mano_model`` whose hands_mean is zero)."""
    rs = np.random.RandomState(seed)
    jreg = rs.rand(N_JOINTS, N_VERTS).astype(np.float32) ** 8
    jreg /= jreg.sum(1, keepdims=True)
    w = rs.rand(N_VERTS, N_JOINTS).astype(np.float32) ** 4
    w /= w.sum(1, keepdims=True)
    return ManoModel(
        v_template=(rs.randn(N_VERTS, 3) * 0.1).astype(np.float32),
        shapedirs=(rs.randn(N_VERTS, 3, 10) * 1e-2).astype(np.float32),
        posedirs=(rs.randn(N_VERTS, 3, 135) * 1e-3).astype(np.float32),
        J_regressor=jreg,
        weights=w,
        faces=np.zeros((N_FACES, 3), np.int32),
        parents=MANO_PARENTS.copy(),
        hands_mean=(rs.randn(45) * 0.2).astype(np.float32),
        is_rhand=is_rhand,
        synthetic=True,
    )


def oracle_mano_forward(model: ManoModel, betas, pose, trans,
                        flat_hand_mean=False):
    """From-scratch numpy MANO forward (see module docstring)."""
    betas = np.asarray(betas, np.float64)
    pose = np.asarray(pose, np.float64).copy()
    trans = np.asarray(trans, np.float64)
    if not flat_hand_mean:
        pose[3:] = pose[3:] + np.asarray(model.hands_mean, np.float64)

    v_shaped = model.v_template.astype(np.float64) + \
        np.tensordot(model.shapedirs.astype(np.float64), betas, axes=([2], [0]))
    j_rest = model.J_regressor.astype(np.float64) @ v_shaped     # (16, 3)

    rots = Rotation.from_rotvec(pose.reshape(N_JOINTS, 3)).as_matrix()
    pose_feat = (rots[1:] - np.eye(3)).reshape(-1)               # (135,)
    v_posed = v_shaped + np.tensordot(
        model.posedirs.astype(np.float64), pose_feat, axes=([2], [0]))

    r_glob = np.zeros((N_JOINTS, 3, 3))
    j_posed = np.zeros((N_JOINTS, 3))
    r_glob[0] = rots[0]
    j_posed[0] = j_rest[0]
    for j in range(1, N_JOINTS):
        p = int(model.parents[j])
        r_glob[j] = r_glob[p] @ rots[j]
        j_posed[j] = j_posed[p] + r_glob[p] @ (j_rest[j] - j_rest[p])

    # skinning: rotate each vertex about its joints' REST positions into
    # the joints' POSED frames, blended by the skinning weights
    w = model.weights.astype(np.float64)                         # (778, 16)
    local = v_posed[:, None, :] - j_rest[None, :, :]             # (778,16,3)
    rotated = np.einsum("jab,vjb->vja", r_glob, local) + j_posed[None]
    verts = np.einsum("vj,vja->va", w, rotated)
    return verts + trans, j_posed + trans


@pytest.mark.parametrize("seed,is_rhand,flat", [(0, True, False),
                                                (1, False, False),
                                                (2, True, True)])
def test_mano_forward_matches_independent_oracle(seed, is_rhand, flat):
    model = random_mano_model(100 + seed, is_rhand)
    rs = np.random.RandomState(seed)
    betas = rs.randn(10).astype(np.float32)
    pose = (rs.randn(48) * 0.5).astype(np.float32)   # NONZERO pose
    trans = (rs.randn(3) * 0.1).astype(np.float32)

    verts, joints = mano_forward(model, jnp.asarray(betas),
                                 jnp.asarray(pose), jnp.asarray(trans),
                                 flat_hand_mean=flat)
    o_verts, o_joints = oracle_mano_forward(model, betas, pose, trans,
                                            flat_hand_mean=flat)
    np.testing.assert_allclose(np.asarray(verts), o_verts, atol=5e-5)
    np.testing.assert_allclose(np.asarray(joints), o_joints, atol=5e-5)


def test_mano_forward_oracle_on_synthetic_model():
    # the fixture model used throughout the test-suite obeys the same math
    model = synthetic_mano_model(False)
    rs = np.random.RandomState(3)
    betas = rs.randn(10).astype(np.float32)
    pose = (rs.randn(48) * 0.8).astype(np.float32)
    trans = rs.randn(3).astype(np.float32)
    verts, joints = mano_forward(model, jnp.asarray(betas),
                                 jnp.asarray(pose), jnp.asarray(trans))
    o_verts, o_joints = oracle_mano_forward(model, betas, pose, trans)
    np.testing.assert_allclose(np.asarray(verts), o_verts, atol=5e-5)
    np.testing.assert_allclose(np.asarray(joints), o_joints, atol=5e-5)


def test_oracle_detects_miswiring():
    # sanity: the oracle is NOT vacuously equal under a wiring error
    model = random_mano_model(7, True)
    rs = np.random.RandomState(7)
    betas = rs.randn(10).astype(np.float32)
    pose = (rs.randn(48) * 0.5).astype(np.float32)
    trans = np.zeros(3, np.float32)
    broken = ManoModel(**{**model.__dict__,
                          "weights": np.roll(model.weights, 1, axis=1)})
    verts, _ = mano_forward(broken, jnp.asarray(betas), jnp.asarray(pose),
                            jnp.asarray(trans))
    o_verts, _ = oracle_mano_forward(model, betas, pose, trans)
    assert np.abs(np.asarray(verts) - o_verts).max() > 1e-3


# ---------------------------------------------------------------------------
# conditional left-shapedirs fix (ref src/dataset.py:29-32)
# ---------------------------------------------------------------------------

def _write_fake_pkl(path, model: ManoModel):
    kintree = np.stack([model.parents.astype(np.int64),
                        np.arange(N_JOINTS, dtype=np.int64)])
    kintree[0, 0] = 2 ** 32 - 1   # real pkls mark the root parent invalid
    data = {"v_template": model.v_template, "shapedirs": model.shapedirs,
            "posedirs": model.posedirs, "J_regressor": model.J_regressor,
            "weights": model.weights, "f": model.faces,
            "kintree_table": kintree, "hands_mean": model.hands_mean}
    with open(path, "wb") as f:
        pickle.dump(data, f)


def _fake_pair_dir(tmp_path, buggy: bool):
    right = random_mano_model(11, True)
    left = random_mano_model(12, False)
    if buggy:
        # official release: left ships the RIGHT hand's x-shapedirs
        left.shapedirs[:, 0, :] = right.shapedirs[:, 0, :]
    else:
        # corrected pkl: left x-shapedirs already negated
        left.shapedirs[:, 0, :] = -right.shapedirs[:, 0, :]
    d = tmp_path / ("buggy" if buggy else "fixed")
    d.mkdir(parents=True)
    _write_fake_pkl(str(d / "MANO_RIGHT.pkl"), right)
    _write_fake_pkl(str(d / "MANO_LEFT.pkl"), left)
    return str(d), right, left


def test_conditional_flip_applied_on_buggy_release(tmp_path):
    d, right, left_on_disk = _fake_pair_dir(tmp_path, buggy=True)
    pair = load_mano_pair(d)
    # x-shapedirs must be flipped relative to what the pkl shipped
    np.testing.assert_allclose(pair["left"].shapedirs[:, 0, :],
                               -left_on_disk.shapedirs[:, 0, :])
    np.testing.assert_allclose(pair["left"].shapedirs[:, 1:, :],
                               left_on_disk.shapedirs[:, 1:, :])
    np.testing.assert_allclose(pair["right"].shapedirs, right.shapedirs)
    # parents load correctly despite the invalid root marker
    np.testing.assert_array_equal(pair["left"].parents, MANO_PARENTS)


def test_conditional_flip_skipped_on_corrected_pkl(tmp_path):
    d, _right, left_on_disk = _fake_pair_dir(tmp_path, buggy=False)
    pair = load_mano_pair(d)
    # a corrected pkl must NOT be double-flipped
    np.testing.assert_allclose(pair["left"].shapedirs,
                               left_on_disk.shapedirs)


def test_single_left_load_is_pair_aware(tmp_path):
    d, _right, left_on_disk = _fake_pair_dir(tmp_path, buggy=False)
    m = load_mano_model(os.path.join(d, "MANO_LEFT.pkl"), False)
    np.testing.assert_allclose(m.shapedirs, left_on_disk.shapedirs)
    db, _r, left_buggy = _fake_pair_dir(tmp_path / "b", buggy=True)
    mb = load_mano_model(os.path.join(db, "MANO_LEFT.pkl"), False)
    np.testing.assert_allclose(mb.shapedirs[:, 0, :],
                               -left_buggy.shapedirs[:, 0, :])


def test_load_mano_pair_synthetic_fallback(tmp_path):
    pair = load_mano_pair(str(tmp_path / "nope"))
    assert pair["right"].synthetic and pair["left"].synthetic
    assert pair["right"].faces.shape == (N_FACES, 3)


def test_mano_forward_np_matches_jax_and_oracle():
    """The input-pipeline numpy fast path (mano_forward_np — one BLAS
    call chain instead of ~100 eager-JAX dispatches per item) is
    numerically identical to the JAX layer and the oracle."""
    from vanerf_tpu.mano import mano_forward_np
    for seed, is_rhand in ((4, True), (5, False)):
        model = random_mano_model(200 + seed, is_rhand)
        rs = np.random.RandomState(seed)
        betas = rs.randn(10).astype(np.float32)
        pose = (rs.randn(48) * 0.6).astype(np.float32)
        trans = (rs.randn(3) * 0.1).astype(np.float32)
        vj, jj = mano_forward(model, jnp.asarray(betas), jnp.asarray(pose),
                              jnp.asarray(trans))
        vn, jn = mano_forward_np(model, betas, pose, trans)
        np.testing.assert_allclose(np.asarray(vj), vn, atol=2e-6)
        np.testing.assert_allclose(np.asarray(jj), jn, atol=2e-6)
        ov, oj = oracle_mano_forward(model, betas, pose, trans)
        np.testing.assert_allclose(vn, ov, atol=5e-5)
        np.testing.assert_allclose(jn, oj, atol=5e-5)
