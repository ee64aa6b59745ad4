"""GAN-loss parity: framework vs torch replica vs reference semantics
(fast tier; pure loss functions).

The reference's discriminator gan head ends in Sigmoid
(``networks.py:564-569``) and the losses apply softplus ON those sigmoid
outputs (``networks.py:584-601``) — unusual, but it is the reference's
actual training dynamics.  Round 5's ``tools/audit_dynamics.py`` caught
the torch replica using a -log BCE form instead (~4x stronger GAN
gradients on the torch side of every earlier convergence A/B); this test
pins values AND input-gradients of both sides so the objective can never
silently diverge again.
"""

import sys

import numpy as np
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/tests")

from torch_ref_replica import (d_logistic_loss_t,  # noqa: E402
                               g_nonsaturating_loss_t)

from vanerf_tpu.models.discriminator import (bce_loss,  # noqa: E402
                                             d_logistic_loss,
                                             g_nonsaturating_loss)


def _preds():
    rng = np.random.default_rng(3)
    # sigmoid-range predictions, including near-saturated values
    real = rng.uniform(1e-4, 1 - 1e-4, (4, 1)).astype(np.float32)
    fake = rng.uniform(1e-4, 1 - 1e-4, (4, 1)).astype(np.float32)
    return real, fake


def test_d_logistic_loss_value_and_grad_parity():
    real, fake = _preds()

    vt_r = torch.from_numpy(real).requires_grad_(True)
    vt_f = torch.from_numpy(fake).requires_grad_(True)
    lt = d_logistic_loss_t(vt_r, vt_f)
    lt.backward()

    lj, (gr, gf) = jax.value_and_grad(
        lambda r, f: d_logistic_loss(r, f), argnums=(0, 1))(
        jnp.asarray(real), jnp.asarray(fake))

    np.testing.assert_allclose(float(lj), float(lt), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gr), vt_r.grad.numpy(),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(gf), vt_f.grad.numpy(),
                               rtol=1e-5, atol=1e-7)

    # reference semantics pin: softplus, NOT the -log BCE form
    ref = (np.log1p(np.exp(-real)).mean()
           + np.log1p(np.exp(fake)).mean())
    np.testing.assert_allclose(float(lj), ref, rtol=1e-5)


def test_g_nonsaturating_loss_value_and_grad_parity():
    _real, fake = _preds()

    vt = torch.from_numpy(fake).requires_grad_(True)
    lt = g_nonsaturating_loss_t(vt)
    lt.backward()

    lj, gj = jax.value_and_grad(g_nonsaturating_loss)(jnp.asarray(fake))

    np.testing.assert_allclose(float(lj), float(lt), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gj), vt.grad.numpy(),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(float(lj),
                               np.log1p(np.exp(-fake)).mean(), rtol=1e-5)


def test_bce_vis_loss_matches_torch():
    rng = np.random.default_rng(5)
    p = rng.uniform(1e-3, 1 - 1e-3, (2, 8, 8, 1)).astype(np.float32)
    t = (rng.random((2, 8, 8, 1)) > 0.5).astype(np.float32)
    lj = bce_loss(jnp.asarray(p), jnp.asarray(t)).mean()
    lt = torch.nn.functional.binary_cross_entropy(
        torch.from_numpy(p), torch.from_numpy(t))
    np.testing.assert_allclose(float(lj), float(lt), rtol=1e-5)
