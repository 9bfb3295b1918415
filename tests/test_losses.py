"""Loss-function golden tests (oracles are naive numpy ports of the
reference formulas)."""

import numpy as np
import jax.numpy as jnp

from dcd_tpu.ops import losses

RNG = np.random.RandomState(1)


def test_focal_loss_matches_naive():
    pred = RNG.uniform(0.01, 0.99, size=(2, 3, 8, 8)).astype(np.float32)
    target = np.zeros_like(pred)
    target[0, 0, 2, 2] = 1.0
    target[1, 1, 4, 4] = 1.0
    target[0, 0, 2, 3] = 0.6  # gaussian tail
    loss, npos = losses.penalty_reduced_focal_loss(jnp.asarray(pred), jnp.asarray(target))
    # naive
    pos = (target == 1).astype(np.float64)
    neg = ((target < 1) & (target >= 0)).astype(np.float64)
    p = np.clip(pred.astype(np.float64), 1e-10, 1 - 1e-10)
    want = -(
        np.log(p) * (1 - p) ** 2 * pos
        + np.log(1 - p) * p**2 * (1 - target) ** 4 * neg
    ).sum()
    np.testing.assert_allclose(float(loss), want, rtol=1e-4)
    assert int(npos) == 2


def test_focal_ignore_region():
    pred = np.full((1, 1, 4, 4), 0.5, np.float32)
    target = np.full_like(pred, -1.0)  # all ignored
    loss, npos = losses.penalty_reduced_focal_loss(jnp.asarray(pred), jnp.asarray(target))
    assert float(loss) == 0.0 and int(npos) == 0


def test_giou_perfect_box_zero_loss():
    box = np.array([[5.0, 3.0, 7.0, 2.0]], np.float32)
    l, ious = losses.iou_loss(jnp.asarray(box), jnp.asarray(box), "giou")
    np.testing.assert_allclose(np.asarray(ious), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l), 0.0, atol=1e-5)


def test_giou_disjoint_penalty():
    pred = np.array([[1.0, 1.0, 1.0, 1.0]], np.float32)
    tgt = np.array([[10.0, 10.0, 10.0, 10.0]], np.float32)
    l, ious = losses.iou_loss(jnp.asarray(pred), jnp.asarray(tgt), "giou")
    assert float(l[0]) > 0.5


def test_depth_reweight():
    dep = np.array([1.0, 4.9, 5.0, 14.0, 80.0], np.float32)
    w = np.asarray(losses.depth_reweight(jnp.asarray(dep)))
    np.testing.assert_allclose(w[0], 0.01, rtol=1e-5)
    np.testing.assert_allclose(w[3], np.log10(10.0) + 0.1, rtol=1e-5)
    assert np.all(np.diff(w) >= -1e-6)  # monotone non-decreasing


def test_reg_weighted_l1():
    pred = RNG.randn(4, 63, 2).astype(np.float32)
    tgt = RNG.randn(4, 63, 2).astype(np.float32)
    dep = np.array([3.0, 10.0, 30.0, 60.0], np.float32)
    out = np.asarray(losses.reg_weighted_l1_loss(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(dep)))
    # guard the oracle's log10 argument on the dep<5 branch (selected away
    # by the where, but NumPy still evaluates it and warns)
    want = np.abs(pred - tgt).sum(-1) * np.where(
        dep < 5, dep * 0.01, np.log10(np.maximum(dep - 4, 1e-9)) + 0.1
    )[:, None]
    np.testing.assert_allclose(out, want, rtol=1e-4)


def test_multibin_loss_perfect_prediction_small():
    """A prediction matching the gt encoding should have near-minimal loss."""
    from dcd_tpu.data.target_encoder import encode_alpha_multibin

    num_bin = 4
    alphas = [-2.0, -0.5, 0.3, 1.4, 3.0]
    K = len(alphas)
    gt = np.stack([encode_alpha_multibin(a, num_bin) for a in alphas]).astype(np.float32)
    vec = np.zeros((K, num_bin * 4), np.float32)
    for k in range(K):
        for i in range(num_bin):
            vec[k, i * 2 + 1] = 20.0 if gt[k, i] == 1 else -20.0
            vec[k, i * 2] = -vec[k, i * 2 + 1]
            vec[k, num_bin * 2 + i * 2] = np.sin(gt[k, num_bin + i])
            vec[k, num_bin * 2 + i * 2 + 1] = np.cos(gt[k, num_bin + i])
    loss = losses.multibin_orientation_loss(jnp.asarray(vec), jnp.asarray(gt), num_bin=num_bin)
    assert float(loss) < 1e-3

    # a shuffled (wrong) prediction must be much worse
    bad = np.roll(vec, 2, axis=1)
    loss_bad = losses.multibin_orientation_loss(jnp.asarray(bad), jnp.asarray(gt), num_bin=num_bin)
    assert float(loss_bad) > float(loss) + 1.0
