"""Shape-level tests for the VGG19 / LPIPS weight converters.

The real pretrained weights need egress (torchvision download / lpips
package), so these tests run the converters on synthetic tensors with the
exact torch shapes and prove the npz round-trips into the JAX consumers:
``losses.VGGLoss`` (ref perceptual loss, utils.py:889) and
``vanerf_tpu.lpips.LPIPS`` (ref evaluator metric, evaluator.py:11).
"""

import sys

import numpy as np
import pytest
import jax

sys.path.insert(0, "/root/repo/tools")

from convert_vgg import convert_vgg_sd, _TORCH_IDX_TO_NAME
from convert_lpips import pack_lpips, ALEX_CONV_SHAPES

# torchvision vgg19 `features` conv shapes at the indices the reference's
# 4-slice VGGLoss consumes (utils.py:888-903)
_VGG19_SHAPES = {0: (64, 3), 2: (64, 64), 5: (128, 64), 7: (128, 128),
                 10: (256, 128), 12: (256, 256), 14: (256, 256),
                 16: (256, 256), 19: (512, 256), 21: (512, 512)}


def synthetic_vgg_sd(rs):
    sd = {}
    for idx, (co, ci) in _VGG19_SHAPES.items():
        sd[f"features.{idx}.weight"] = rs.randn(co, ci, 3, 3).astype(
            np.float32) * 0.05
        sd[f"features.{idx}.bias"] = rs.randn(co).astype(np.float32) * 0.05
    return sd


def test_vgg_converter_roundtrips_into_vggloss(tmp_path, monkeypatch):
    rs = np.random.RandomState(0)
    out = convert_vgg_sd(synthetic_vgg_sd(rs))
    assert len(out) == 2 * len(_TORCH_IDX_TO_NAME)
    # HWIO layout
    assert out["conv1_1.kernel"].shape == (3, 3, 3, 64)
    # slice4 = features[12:21] ends at relu4_1; conv4_2 must NOT be
    # consumed (parity bug fixed in round 3)
    assert out["conv4_1.kernel"].shape == (3, 3, 256, 512)
    assert "conv4_2.kernel" not in out
    path = tmp_path / "vgg.npz"
    np.savez(path, **out)

    from vanerf_tpu.losses import VGGLoss
    monkeypatch.setenv("VANERF_VGG19_NPZ", str(path))
    vgg = VGGLoss(dummy_hw=32)
    assert vgg.pretrained
    # loaded params match the init template shapes exactly
    template = vgg.net.init(jax.random.PRNGKey(0),
                            np.zeros((1, 32, 32, 3), np.float32))
    t_shapes = jax.tree.map(lambda x: x.shape, template)
    l_shapes = jax.tree.map(lambda x: x.shape, vgg.params)
    assert t_shapes == l_shapes
    x = rs.rand(1, 32, 32, 3).astype(np.float32)
    y = rs.rand(1, 32, 32, 3).astype(np.float32)
    assert float(vgg(x, x)) == pytest.approx(0.0, abs=1e-6)
    assert np.isfinite(float(vgg(x, y))) and float(vgg(x, y)) > 0


def test_vgg_loss_falls_back_to_random_init(monkeypatch):
    from vanerf_tpu.losses import VGGLoss
    monkeypatch.delenv("VANERF_VGG19_NPZ", raising=False)
    vgg = VGGLoss(dummy_hw=16)
    assert not vgg.pretrained


def test_lpips_converter_roundtrips(tmp_path):
    rs = np.random.RandomState(1)
    convs = [(rs.randn(*s).astype(np.float32) * 0.05,
              rs.randn(s[0]).astype(np.float32) * 0.05)
             for s in ALEX_CONV_SHAPES]
    lins = [np.abs(rs.randn(1, s[0], 1, 1)).astype(np.float32)
            for s in ALEX_CONV_SHAPES]
    out = pack_lpips(convs, lins)
    assert len(out) == 15
    path = tmp_path / "lpips.npz"
    np.savez(path, **out)

    from vanerf_tpu.lpips import LPIPS
    fn = LPIPS(str(path))
    a = rs.rand(64, 64, 3).astype(np.float32)
    b = rs.rand(64, 64, 3).astype(np.float32)
    assert fn(a, a) == pytest.approx(0.0, abs=1e-6)
    d = fn(a, b)
    assert np.isfinite(d) and d > 0


def test_lpips_pack_rejects_wrong_shapes():
    rs = np.random.RandomState(2)
    convs = [(rs.randn(*s).astype(np.float32), rs.randn(s[0]))
             for s in ALEX_CONV_SHAPES]
    lins = [rs.randn(s[0]) for s in ALEX_CONV_SHAPES]
    bad = list(convs)
    bad[2] = (rs.randn(384, 192, 5, 5), rs.randn(384))   # wrong kernel
    with pytest.raises(AssertionError):
        pack_lpips(bad, lins)
