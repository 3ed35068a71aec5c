import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.smoke

from pmf_tpu.losses import (
    focal_softmax_loss, FocalSoftmaxLoss, lovasz_softmax_loss, kl_div,
    perception_aware_loss, dice_loss, explog_dice_loss, multi_task_loss,
    init_multi_task_params, weighted_smooth_l1, smoothness_loss,
    grad_guide_loss,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as TF


# ---------------------------------------------------------------- focal
def _np_focal(probs, target, alpha, gamma, mask=None):
    pt = probs[np.arange(len(target)), target]
    logpt = np.log(np.clip(pt, 1e-6, None))
    loss = -((1 - pt) ** gamma) * logpt * alpha[target]
    if mask is None:
        return loss.mean()
    return (loss * mask).sum() / mask.sum()


def test_focal_matches_numpy():
    rng = np.random.default_rng(0)
    C, P = 6, 200
    logits = rng.normal(size=(P, C)).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    target = rng.integers(0, C, size=P)
    alpha = rng.random(C).astype(np.float32)
    mask = (rng.random(P) > 0.3).astype(np.float32)

    got = focal_softmax_loss(jnp.asarray(probs), jnp.asarray(target),
                             jnp.asarray(alpha), gamma=2.0,
                             mask=jnp.asarray(mask))
    np.testing.assert_allclose(float(got), _np_focal(probs, target, alpha, 2.0, mask),
                               rtol=1e-5)
    got2 = focal_softmax_loss(jnp.asarray(probs), jnp.asarray(target),
                              jnp.asarray(alpha), gamma=2.0)
    np.testing.assert_allclose(float(got2), _np_focal(probs, target, alpha, 2.0),
                               rtol=1e-5)


def test_focal_scalar_alpha_and_logits():
    # scalar alpha expands to [a, 1-a, ...] (ref focal_softmax.py:22-25)
    crit = FocalSoftmaxLoss(n_classes=4, gamma=1.0, alpha=0.8, from_logits=True)
    a = np.asarray(crit.alpha)
    np.testing.assert_allclose(a, [0.8, 0.2, 0.2, 0.2], rtol=1e-6)
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(50, 4)).astype(np.float32)
    target = rng.integers(0, 4, size=50)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    got = float(crit(jnp.asarray(logits), jnp.asarray(target)))
    want = _np_focal(probs, target, a, 1.0)
    np.testing.assert_allclose(got, want, rtol=1e-5)


# --------------------------------------------------------------- lovasz
def _np_lovasz_grad(gt_sorted):
    p = len(gt_sorted)
    gts = gt_sorted.sum()
    intersection = gts - np.cumsum(gt_sorted)
    union = gts + np.cumsum(1 - gt_sorted)
    jaccard = 1.0 - intersection / union
    if p > 1:
        jaccard[1:] = jaccard[1:] - jaccard[:-1]
    return jaccard


def _np_lovasz(probs, labels, ignore=None):
    """Independent numpy implementation of Berman's Lovász-softmax
    ('present' classes, ignored pixels removed)."""
    if ignore is not None:
        keep = labels != ignore
        probs, labels = probs[keep], labels[keep]
    C = probs.shape[1]
    losses = []
    for c in range(C):
        fg = (labels == c).astype(np.float64)
        if fg.sum() == 0:
            continue
        errors = np.abs(fg - probs[:, c])
        order = np.argsort(-errors, kind="stable")
        losses.append(np.dot(errors[order], _np_lovasz_grad(fg[order])))
    return np.mean(losses)


def test_lovasz_matches_numpy_reference():
    rng = np.random.default_rng(3)
    C, P = 5, 400
    logits = rng.normal(size=(P, C))
    probs = (np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)).astype(np.float32)
    labels = rng.integers(0, C, size=P)
    got = float(lovasz_softmax_loss(jnp.asarray(probs), jnp.asarray(labels), ignore=0))
    want = _np_lovasz(probs.astype(np.float64), labels, ignore=0)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_lovasz_absent_class_skipped():
    rng = np.random.default_rng(4)
    C, P = 6, 300
    logits = rng.normal(size=(P, C))
    probs = (np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)).astype(np.float32)
    labels = rng.integers(1, 4, size=P)  # classes 0,4,5 absent
    got = float(lovasz_softmax_loss(jnp.asarray(probs), jnp.asarray(labels), ignore=0))
    want = _np_lovasz(probs.astype(np.float64), labels, ignore=0)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_lovasz_perfect_prediction_is_zero():
    labels = np.array([1, 2, 1, 2])
    probs = np.eye(3, dtype=np.float32)[labels]
    got = float(lovasz_softmax_loss(jnp.asarray(probs), jnp.asarray(labels), ignore=0))
    assert abs(got) < 1e-6


# ------------------------------------------------------------------- kl
def test_kl_matches_torch():
    rng = np.random.default_rng(5)
    pred = rng.random((4, 8)).astype(np.float32) + 0.1
    pred /= pred.sum(-1, keepdims=True)
    tgt = rng.random((4, 8)).astype(np.float32)
    tgt /= tgt.sum(-1, keepdims=True)
    got = np.asarray(kl_div(jnp.log(jnp.asarray(pred)), jnp.asarray(tgt)))
    want = TF.kl_div(torch.from_numpy(np.log(pred)), torch.from_numpy(tgt),
                     reduction="none").numpy()
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-4)


# --------------------------------------------------- perception aware
def _np_perception(pcd, img, tau):
    logC = np.log(pcd.shape[-1])
    pcd_log = np.log(np.clip(pcd, 1e-8, None))
    img_log = np.log(np.clip(img, 1e-8, None))
    e_pcd = -(pcd * pcd_log).sum(-1) / logC
    e_img = -(img * img_log).sum(-1) / logC
    c_pcd, c_img = 1 - e_pcd, 1 - e_img
    imp = c_pcd - c_img
    pcd_w = (imp > 0) * np.abs(imp) * (c_pcd >= tau)
    img_w = (imp < 0) * np.abs(imp) * (c_img >= tau)

    def kl(logp, t):
        return np.where(t > 0, t * (np.log(t) - logp), 0.0)

    loss = (kl(pcd_log, img) * img_w[..., None]).mean() + \
           (kl(img_log, pcd) * pcd_w[..., None]).mean()
    return loss, pcd_w, img_w


def test_perception_aware_matches_numpy():
    rng = np.random.default_rng(6)
    shape = (2, 8, 8, 5)
    a = rng.random(shape).astype(np.float32) + 0.05
    a /= a.sum(-1, keepdims=True)
    b = rng.random(shape).astype(np.float32) + 0.05
    b /= b.sum(-1, keepdims=True)
    # sharpen a so some pixels exceed the confidence threshold
    a = a ** 8
    a /= a.sum(-1, keepdims=True)
    loss, pw, iw = perception_aware_loss(jnp.asarray(a), jnp.asarray(b), tau=0.3)
    want, pw_np, iw_np = _np_perception(a.astype(np.float64), b.astype(np.float64), 0.3)
    assert float(jnp.abs(jnp.asarray(pw)).sum()) > 0  # gate actually open
    np.testing.assert_allclose(float(loss), want, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pw), pw_np, rtol=1e-3, atol=1e-4)


# ----------------------------------------------------------------- dice
def test_dice_losses():
    rng = np.random.default_rng(7)
    C, P = 4, 120
    probs = rng.random((P, C)).astype(np.float32)
    probs /= probs.sum(-1, keepdims=True)
    target = rng.integers(0, C, size=P)
    mask = (rng.random(P) > 0.25).astype(np.float32)

    oh = np.eye(C)[target * mask.astype(int)]
    pm = probs * mask[:, None]
    want = ((2 * (pm * oh).sum(0) + 1e-6) / ((pm + oh).sum(0) + 1e-6)).mean()
    got = float(dice_loss(jnp.asarray(probs), jnp.asarray(target), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    got_el = float(explog_dice_loss(jnp.asarray(probs), jnp.asarray(target),
                                    jnp.asarray(mask)))
    np.testing.assert_allclose(got_el, (-np.log(max(want, 1e-6))) ** 0.3, rtol=1e-5)


# ----------------------------------------------------------- multi-task
def test_multi_task_loss():
    sigma = init_multi_task_params(3)
    np.testing.assert_allclose(np.asarray(sigma), np.ones(3) / 3)
    losses = [1.0, 2.0, 3.0]
    got = float(multi_task_loss(sigma, losses))
    s2 = (1 / 3) ** 2
    want = sum(l / (2 * s2) + np.log(s2 + 1) for l in losses)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # differentiable wrt sigma
    g = jax.grad(lambda s: multi_task_loss(s, losses))(sigma)
    assert np.all(np.isfinite(np.asarray(g)))


# ------------------------------------------------------------ smooth-l1
def test_weighted_smooth_l1_matches_torch():
    rng = np.random.default_rng(8)
    x = rng.normal(size=(10, 10)).astype(np.float32)
    t = rng.normal(size=(10, 10)).astype(np.float32)
    sigma = 3.0
    got = float(weighted_smooth_l1(jnp.asarray(x), jnp.asarray(t), sigma=sigma))
    want = TF.smooth_l1_loss(torch.from_numpy(x), torch.from_numpy(t),
                             beta=1.0 / sigma ** 2).item()
    np.testing.assert_allclose(got, want, rtol=1e-5)


# ----------------------------------------------------------- smoothness
def test_smoothness_loss_matches_torch():
    rng = np.random.default_rng(9)
    x = rng.normal(size=(2, 9, 9, 3)).astype(np.float32)
    got = float(smoothness_loss(jnp.asarray(x)))
    k = torch.tensor([[-0.125, -0.125, -0.125],
                      [-0.125, 1.0, -0.125],
                      [-0.125, -0.125, -0.125]])
    w = k[None, None].expand(3, 1, 3, 3)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = TF.conv2d(xt, w, groups=3, padding=1).abs().mean().item()
    np.testing.assert_allclose(got, want, rtol=1e-4)
    # grad-guide runs and is finite
    t = rng.normal(size=(2, 9, 9, 3)).astype(np.float32)
    gl = float(grad_guide_loss(jnp.asarray(x), jnp.asarray(t)))
    assert np.isfinite(gl)


def test_lovasz_gradient_matches_reference_semantics():
    """Our stop-gradient construction must equal the reference autograd:
    d loss/d p_c[i] = -sign(fg - p) * jaccard[rank] (Jaccard weights
    detached, lovasz_softmax.py:119)."""
    rng = np.random.default_rng(12)
    C, P = 5, 60
    logits = rng.normal(size=(P, C))
    probs = (np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)).astype(np.float32)
    labels = rng.integers(0, C, size=P)

    g = jax.grad(lambda p: lovasz_softmax_loss(p, jnp.asarray(labels),
                                               ignore=0))(jnp.asarray(probs))
    g = np.asarray(g)

    # independent numpy gradient with detached jaccard
    keep = labels != 0
    present = []
    grad_np = np.zeros_like(probs, dtype=np.float64)
    for c in range(C):
        fg = ((labels == c) & keep).astype(np.float64)
        if fg.sum() == 0:
            continue
        present.append(c)
        err = np.abs(fg - probs[:, c]) * keep
        order = np.argsort(-err, kind="stable")
        jac = _np_lovasz_grad(fg[order])
        w = np.empty(P)
        w[order] = jac
        # d err/d p = -sign(fg - p), masked
        grad_np[:, c] = -np.sign(fg - probs[:, c]) * keep * w
    grad_np /= len(present)
    np.testing.assert_allclose(g, grad_np, rtol=1e-3, atol=1e-5)


# ------------------------------------------------- point-domain lovasz
def test_lovasz_points_matches_full_image():
    """lovasz_softmax_loss_points on rasterizer winner points must equal
    the full-image loss (value AND gradient) — every non-ignored canvas
    pixel is exactly one winner point's pixel."""
    from pmf_tpu.losses import lovasz_softmax_loss_points
    from pmf_tpu.ops.scatter import (fill_canvas, point_winner_flags,
                                     zbuffer_scatter_packed)

    rng = np.random.default_rng(3)
    B, N, H, W, C = 2, 300, 16, 24, 5
    rows = jnp.asarray(rng.integers(-2, H + 2, (B, N)).astype(np.int32))
    cols = jnp.asarray(rng.integers(-2, W + 2, (B, N)).astype(np.int32))
    depth = jnp.asarray(rng.uniform(1, 50, (B, N)).astype(np.float32))
    keep = ((rows >= 0) & (rows < H) & (cols >= 0) & (cols < W)
            & jnp.asarray(rng.random((B, N)) > 0.1))
    labels = jnp.asarray(rng.integers(0, C, (B, N)).astype(np.int32))

    # rasterize the label canvas the way build_batch does
    def raster(r, c, d, k, lab):
        winner, mask = zbuffer_scatter_packed(r, c, d, k, H, W)
        canvas = fill_canvas(lab[:, None].astype(jnp.float32), r, c, k,
                             winner, mask)
        return canvas[..., 0].astype(jnp.int32)

    label_img = jax.vmap(raster)(rows, cols, depth, keep, labels)
    pix, won = jax.vmap(
        lambda r, c, d, k: point_winner_flags(r, c, d, k, H, W)
    )(rows, cols, depth, keep)

    logits = rng.normal(size=(B, H, W, C)).astype(np.float32)
    probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)

    full, g_full = jax.value_and_grad(
        lambda p: lovasz_softmax_loss(p, label_img, ignore=0))(probs)
    pts, g_pts = jax.value_and_grad(
        lambda p: lovasz_softmax_loss_points(p, label_img, pix, labels,
                                             won, ignore=0))(probs)
    np.testing.assert_allclose(np.asarray(full), np.asarray(pts),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_full), np.asarray(g_pts),
                               rtol=1e-4, atol=1e-6)

    # the fused two-stream version must equal two single-stream calls
    # (value AND gradient), for distinct per-stream predictions
    from pmf_tpu.losses import lovasz_softmax_loss_points_pair
    probs_b = jax.nn.softmax(jnp.asarray(
        rng.normal(size=(B, H, W, C)).astype(np.float32)), axis=-1)

    def pair_sum(pa, pb):
        la, lb = lovasz_softmax_loss_points_pair(pa, pb, label_img, pix,
                                                 labels, won, ignore=0)
        return la + 2.0 * lb

    (la, lb) = jax.jit(lovasz_softmax_loss_points_pair,
                       static_argnames="ignore")(
        probs, probs_b, label_img, pix, labels, won, ignore=0)
    single_b = lovasz_softmax_loss_points(probs_b, label_img, pix, labels,
                                          won, ignore=0)
    np.testing.assert_allclose(np.asarray(la), np.asarray(pts), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(lb), np.asarray(single_b),
                               rtol=1e-5, atol=1e-6)
    ga, gb = jax.grad(pair_sum, argnums=(0, 1))(probs, probs_b)
    gb_single = jax.grad(
        lambda p: lovasz_softmax_loss_points(p, label_img, pix, labels,
                                             won, ignore=0))(probs_b)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(g_pts),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gb), 2.0 * np.asarray(gb_single),
                               rtol=1e-4, atol=1e-6)


def test_build_batch_return_points_consistent():
    """The returned point info must reproduce the canvas labels: placing
    each winner's label at its pixel equals the label image."""
    from pmf_tpu.data import PVConfig, build_batch

    rng = np.random.default_rng(0)
    B, N = 2, 512
    H, W = 32, 48
    pts = np.zeros((B, N, 4), np.float32)
    pts[..., 0] = rng.uniform(2, 70, (B, N))
    pts[..., 1] = rng.uniform(-20, 20, (B, N))
    pts[..., 2] = rng.uniform(-2, 1, (B, N))
    pts[..., 3] = rng.uniform(0, 1, (B, N))
    labels = rng.integers(0, 20, (B, N)).astype(np.int32)
    valid = np.ones((B, N), bool)
    fx = 40.0
    proj = np.tile(np.array(
        [[fx, -fx, 0, W * fx / 2], [0, 0, -fx, H * fx / 2], [1, 0, 0, 0]],
        np.float32)[None], (B, 1, 1))
    image = rng.random((B, H, W, 3)).astype(np.float32)
    img_h = np.full((B,), H, np.int32)
    img_w = np.full((B,), W, np.int32)
    cfg = PVConfig(canvas_h=H, canvas_w=W, proj_h=H, proj_w=W,
                   n_points=N)

    f, m, l, (pix, plab, won) = build_batch(
        jax.random.PRNGKey(0), *map(jnp.asarray, (pts, labels, valid,
                                                  proj, image, img_h,
                                                  img_w)),
        cfg, False, return_points=True)
    l = np.asarray(l)
    pix, plab, won = map(np.asarray, (pix, plab, won))
    for b in range(B):
        placed = np.zeros((H * W,), np.int32)
        placed[pix[b][won[b]]] = plab[b][won[b]]
        np.testing.assert_array_equal(placed.reshape(H, W), l[b])
        # one winner per occupied pixel, none elsewhere
        assert len(np.unique(pix[b][won[b]])) == won[b].sum()
        assert won[b].sum() == np.asarray(m)[b].sum()
