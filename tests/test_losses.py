"""Loss parity vs torch implementations of the reference formulas."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from gkgnet_tpu.nn import losses as L


def torch_asymmetric_loss(pred, target, gamma_pos, gamma_neg, clip, eps=1e-8):
    pred = torch.from_numpy(pred)
    target = torch.from_numpy(target).type_as(pred)
    ps = pred.sigmoid()
    pt = (1 - ps + clip).clamp(max=1) * (1 - target) + ps * target
    w = (1 - pt).pow(gamma_pos * target + gamma_neg * (1 - target))
    return (-torch.log(pt.clamp(min=eps)) * w).mean().item()


def test_asymmetric_loss_matches_torch():
    rng = np.random.default_rng(0)
    pred = rng.standard_normal((6, 80)).astype(np.float32) * 3
    target = (rng.random((6, 80)) < 0.1).astype(np.float32)
    got = float(L.asymmetric_loss(jnp.asarray(pred), jnp.asarray(target),
                                  gamma_pos=0.0, gamma_neg=2.0, clip=0.05))
    want = torch_asymmetric_loss(pred, target, 0.0, 2.0, 0.05)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_label_smooth_multilabel_matches_torch():
    rng = np.random.default_rng(1)
    pred = rng.standard_normal((4, 80)).astype(np.float32)
    target = (rng.random((4, 80)) < 0.15).astype(np.float32)
    got = float(L.label_smooth_multilabel_loss(
        jnp.asarray(pred), jnp.asarray(target), 0.1, avg_factor=4))
    smoothed = np.where(target > 0, 0.9, 0.1).astype(np.float32)
    want = F.binary_cross_entropy_with_logits(
        torch.from_numpy(pred), torch.from_numpy(smoothed), reduction="sum"
    ).item() / 4
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_bce_with_logits_matches_torch():
    rng = np.random.default_rng(2)
    pred = rng.standard_normal((5, 7)).astype(np.float32) * 5
    target = rng.random((5, 7)).astype(np.float32)
    got = np.asarray(L.binary_cross_entropy_with_logits(
        jnp.asarray(pred), jnp.asarray(target)))
    want = F.binary_cross_entropy_with_logits(
        torch.from_numpy(pred), torch.from_numpy(target), reduction="none").numpy()
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-5)


def test_cross_entropy_matches_torch():
    rng = np.random.default_rng(3)
    pred = rng.standard_normal((6, 10)).astype(np.float32)
    label = rng.integers(0, 10, size=(6,))
    got = float(L.cross_entropy(jnp.asarray(pred), jnp.asarray(label)))
    want = F.cross_entropy(torch.from_numpy(pred), torch.from_numpy(label)).item()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_focal_loss_matches_torch_formula():
    rng = np.random.default_rng(4)
    pred = rng.standard_normal((3, 9)).astype(np.float32)
    target = (rng.random((3, 9)) < 0.3).astype(np.float32)
    got = float(L.focal_loss(jnp.asarray(pred), jnp.asarray(target),
                             gamma=2.0, alpha=0.25))
    pt_t = torch.from_numpy(pred)
    tg_t = torch.from_numpy(target)
    ps = pt_t.sigmoid()
    pt = (1 - ps) * tg_t + ps * (1 - tg_t)
    fw = (0.25 * tg_t + 0.75 * (1 - tg_t)) * pt.pow(2.0)
    want = (F.binary_cross_entropy_with_logits(pt_t, tg_t, reduction="none") * fw
            ).mean().item()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_weight_reduce_avg_factor():
    loss = jnp.ones((4, 5))
    assert float(L.weight_reduce_loss(loss, reduction="mean", avg_factor=8)) == 2.5
    assert float(L.weight_reduce_loss(loss, reduction="mean")) == 1.0
    assert float(L.weight_reduce_loss(loss, reduction="sum")) == 20.0


def test_center_loss_matches_torch_reference_formula():
    """center_loss vs the reference losses/center_loss.py math (dead in
    the reference's export surface; round-4 completeness)."""
    rng = np.random.default_rng(7)
    n, d, c = 6, 16, 10
    feats = rng.standard_normal((n, d)).astype(np.float32)
    centers = rng.standard_normal((c, d)).astype(np.float32)
    labels = rng.integers(0, c, n)
    got = float(L.center_loss(jnp.asarray(feats), jnp.asarray(labels),
                              jnp.asarray(centers)))
    x = torch.from_numpy(feats)
    ct = torch.from_numpy(centers)
    distmat = (x.pow(2).sum(1, keepdim=True).expand(n, c)
               + ct.pow(2).sum(1, keepdim=True).expand(c, n).t()
               - 2.0 * x @ ct.t())
    mask = torch.from_numpy(labels)[:, None].expand(n, c).eq(
        torch.arange(c).expand(n, c))
    want = float((distmat * mask.float()).clamp(1e-12, 1e12).sum() / n)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_triplet_loss_matches_torch_reference_formula():
    """triplet_loss (batch-hard) vs the reference losses/trilet_loss.py
    mining loop + MarginRankingLoss."""
    rng = np.random.default_rng(8)
    n, d = 8, 12
    feats = rng.standard_normal((n, d)).astype(np.float32)
    labels = rng.integers(0, 3, n)
    for distance in ("euclidean", "cosine"):
        got = float(L.triplet_loss(jnp.asarray(feats),
                                   jnp.asarray(labels), 0.3, distance))
        x = torch.from_numpy(feats)
        if distance == "euclidean":
            dist = (x.pow(2).sum(1, keepdim=True).expand(n, n)
                    + x.pow(2).sum(1, keepdim=True).expand(n, n).t()
                    - 2.0 * x @ x.t()).clamp(min=1e-12).sqrt()
        else:
            ln = x / x.norm(p=2, dim=1, keepdim=True)
            dist = -ln @ ln.t()
        t = torch.from_numpy(labels)
        mask = t.expand(n, n).eq(t.expand(n, n).t())
        ap = torch.stack([dist[i][mask[i]].max() for i in range(n)])
        an = torch.stack([dist[i][mask[i] == 0].min() for i in range(n)])
        want = float(torch.nn.MarginRankingLoss(margin=0.3)(
            an, ap, torch.ones(n)))
        np.testing.assert_allclose(got, want, rtol=1e-5,
                                   err_msg=distance)
