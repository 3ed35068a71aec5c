import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.smoke

from pmf_tpu.ops import (
    perspective_project, yaw_crop_project, spherical_project,
    zbuffer_scatter, scatter_to_image, knn_postprocess, gaussian_kernel2d,
    upsample_bilinear, pixel_shuffle,
)


def _rand_cloud(rng, n=500):
    pts = rng.uniform(-40, 40, size=(n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-3, 2, size=n)
    return pts


def _kitti_like_proj():
    # plausible P2 @ Tr: camera looks along +x of lidar
    fx, fy, cx, cy = 720.0, 720.0, 610.0, 173.0
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    # lidar (x fwd, y left, z up) -> cam (x right, y down, z fwd)
    R = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0.0]])
    T = np.zeros((3, 4))
    T[:, :3] = R
    T[2, 3] = 0.08
    return (K @ T).astype(np.float32)


def test_perspective_project_matches_reference_math():
    rng = np.random.default_rng(0)
    pts = _rand_cloud(rng)
    P = _kitti_like_proj()
    H, W = 376, 1241

    rows, cols, keep = perspective_project(jnp.asarray(pts), jnp.asarray(P), H, W)
    rows, cols, keep = map(np.asarray, (rows, cols, keep))

    # independent numpy version of parser.py:209-227
    front = pts[:, 0] > 0.5
    hom = np.concatenate([pts, np.ones((len(pts), 1), np.float32)], axis=1)
    uvw = (P @ hom.T).T
    uv = uvw[:, :2] / uvw[:, 2:3]
    inside = (uv[:, 0] > 0) & (uv[:, 0] < W) & (uv[:, 1] > 0) & (uv[:, 1] < H)
    want_keep = front & inside
    np.testing.assert_array_equal(keep, want_keep)
    np.testing.assert_allclose(cols[keep], uv[want_keep, 0], rtol=1e-4)
    np.testing.assert_allclose(rows[keep], uv[want_keep, 1], rtol=1e-4)


def test_perspective_project_respects_valid_mask():
    rng = np.random.default_rng(1)
    pts = _rand_cloud(rng, 100)
    P = _kitti_like_proj()
    valid = np.zeros(100, dtype=bool)
    _, _, keep = perspective_project(jnp.asarray(pts), jnp.asarray(P), 376, 1241,
                                     jnp.asarray(valid))
    assert not np.asarray(keep).any()


def test_yaw_crop_project():
    rng = np.random.default_rng(2)
    pts = _rand_cloud(rng)
    P = _kitti_like_proj()
    rows, cols, keep = yaw_crop_project(jnp.asarray(pts), jnp.asarray(P))
    keep = np.asarray(keep)
    depth = np.linalg.norm(pts, axis=1)
    yaw = -np.arctan2(pts[:, 1], pts[:, 0])
    want = (depth > 0.5) & (yaw >= -np.pi / 4) & (yaw <= np.pi / 4)
    np.testing.assert_array_equal(keep, want)


def test_spherical_project_matches_reference_math():
    rng = np.random.default_rng(3)
    pts = _rand_cloud(rng)
    fov_up, fov_down, H, W = 3.0, -25.0, 64, 2048
    px, py, depth, _ = spherical_project(jnp.asarray(pts), fov_up, fov_down, H, W)
    px, py, depth = map(np.asarray, (px, py, depth))

    # independent numpy version of projection.py:31-58
    d = np.linalg.norm(pts, axis=1)
    yaw = -np.arctan2(pts[:, 1], pts[:, 0])
    pitch = np.arcsin(pts[:, 2] / d)
    fu, fd = fov_up / 180 * np.pi, fov_down / 180 * np.pi
    fv = abs(fu) + abs(fd)
    want_px = np.clip(np.floor((yaw + np.pi) / (2 * np.pi) * W), 0, W - 1)
    want_py = np.clip(np.floor((1 - (pitch + abs(fd)) / fv) * H), 0, H - 1)
    np.testing.assert_array_equal(px, want_px.astype(np.int32))
    np.testing.assert_array_equal(py, want_py.astype(np.int32))
    np.testing.assert_allclose(depth, d, rtol=1e-5)


def test_zbuffer_nearest_wins():
    # 3 points land on the same pixel; the nearest must win
    rows = jnp.asarray([2, 2, 2, 0])
    cols = jnp.asarray([3, 3, 3, 1])
    depth = jnp.asarray([10.0, 4.0, 7.0, 1.0])
    keep = jnp.asarray([True, True, True, True])
    winner, mask = zbuffer_scatter(rows, cols, depth, keep, 4, 5)
    winner, mask = np.asarray(winner), np.asarray(mask)
    assert winner[2, 3] == 1  # depth 4.0
    assert winner[0, 1] == 3
    assert mask.sum() == 2
    assert (winner[~mask] == -1).all()


def test_zbuffer_tie_breaks_by_index_and_ignores_invalid():
    rows = jnp.asarray([1, 1, 1])
    cols = jnp.asarray([1, 1, 1])
    depth = jnp.asarray([5.0, 5.0, 2.0])
    keep = jnp.asarray([True, True, False])  # nearest point is invalid
    winner, mask = zbuffer_scatter(rows, cols, depth, keep, 3, 3)
    assert np.asarray(winner)[1, 1] == 0  # tie at 5.0 → min index


def test_scatter_to_image_matches_reference_loader():
    """Emulate perspective_view_loader.py:99-117 on collision-free data."""
    rng = np.random.default_rng(4)
    H, W, N = 16, 24, 60
    # unique pixels → no collision ambiguity vs numpy assignment
    pix = rng.choice(H * W, size=N, replace=False)
    rows, cols = pix // W, pix % W
    feats = rng.normal(size=(N, 5)).astype(np.float32)
    depth = rng.uniform(1, 50, size=N).astype(np.float32)
    keep = rng.random(N) > 0.2

    winner, mask = zbuffer_scatter(jnp.asarray(rows), jnp.asarray(cols),
                                   jnp.asarray(depth), jnp.asarray(keep), H, W)
    img = np.asarray(scatter_to_image(jnp.asarray(feats), winner, mask))

    want = np.zeros((H, W, 5), np.float32)
    want[rows[keep], cols[keep]] = feats[keep]
    np.testing.assert_allclose(img, want, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(mask),
                                  want.any(-1) | (np.abs(want).sum(-1) == 0) &
                                  np.asarray(mask))


def test_gaussian_kernel_matches_torch_reference():
    torch = pytest.importorskip("torch")
    import math
    ks, sigma = 5, 1.0
    got = gaussian_kernel2d(ks, sigma)
    # independent dense computation
    x = np.arange(ks)
    xs, ys = np.meshgrid(x, x)
    k = np.exp(-((xs - 2) ** 2 + (ys - 2) ** 2) / (2 * sigma ** 2)) / (2 * math.pi * sigma ** 2)
    k /= k.sum()
    np.testing.assert_allclose(got, k, rtol=1e-5)
    assert abs(got.sum() - 1.0) < 1e-6


def test_knn_postprocess_against_torch_oracle():
    """Oracle: re-run the same algorithm with torch primitives (unfold,
    topk, scatter_add) on random data and compare votes."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as TF

    rng = np.random.default_rng(5)
    H, W, P, C = 32, 48, 300, 8
    knn, search, sigma, cutoff = 5, 5, 1.0, 1.0

    proj_range = np.full((H, W), -1.0, np.float32)
    occ = rng.random((H, W)) > 0.5
    proj_range[occ] = rng.uniform(2, 60, size=occ.sum())
    proj_argmax = rng.integers(0, C, size=(H, W)).astype(np.int64)
    px = rng.integers(0, W, size=P).astype(np.int32)
    py = rng.integers(0, H, size=P).astype(np.int32)
    unproj = rng.uniform(2, 60, size=P).astype(np.float32)

    got = np.asarray(knn_postprocess(
        jnp.asarray(proj_range), jnp.asarray(unproj), jnp.asarray(proj_argmax),
        jnp.asarray(px), jnp.asarray(py),
        knn=knn, search=search, sigma=sigma, cutoff=cutoff, nclasses=C))

    # ---- torch oracle (same algorithm, independent primitives) ----
    pr = torch.from_numpy(proj_range)
    pad = (search - 1) // 2
    unf = TF.unfold(pr[None, None], kernel_size=search, padding=pad)  # [1,S2,H*W]
    idx = torch.from_numpy((py * W + px).astype(np.int64))
    win = unf[:, :, idx]  # [1, S2, P]
    win[win < 0] = float("inf")
    center = (search * search - 1) // 2
    u = torch.from_numpy(unproj)
    win[:, center, :] = u
    k2 = (win - u).abs()
    g = torch.from_numpy(gaussian_kernel2d(search, sigma)).reshape(1, -1, 1)
    k2 = k2 * (1 - g)
    _, knn_idx = k2.topk(knn, dim=1, largest=False)
    unf_a = TF.unfold(torch.from_numpy(proj_argmax).float()[None, None],
                      kernel_size=search, padding=pad).long()[:, :, idx]
    knn_arg = torch.gather(unf_a, 1, knn_idx)
    knn_d = torch.gather(k2, 1, knn_idx)
    knn_arg[knn_d > cutoff] = C
    oh = torch.zeros((1, C + 1, P))
    oh.scatter_add_(1, knn_arg, torch.ones_like(knn_arg, dtype=torch.float))
    want = (oh[:, 1:-1].argmax(dim=1) + 1).numpy().ravel()

    assert (got == want).mean() > 0.99  # allow top-k tie-order divergence


def test_knn_on_confidence_truncation_semantics():
    """The reference KNN-refines the CONFIDENCE map before the nuScenes
    V2 merge by pushing it through the same voting KNN
    (tasks/epmf_eval_nuscenes/infer.py:155-161). Its unfold(...).long()
    truncates conf in [0,1) to class 0, the 1..C-1 vote argmax over an
    empty histogram is 0, and the output is identically 1 — i.e. with
    --knn the merge degrades to first-camera-wins. Our knn_postprocess
    must reproduce exactly that when handed a float map."""
    rng = np.random.default_rng(7)
    H, W, P, C = 16, 24, 100, 17
    proj_range = np.full((H, W), -1.0, np.float32)
    occ = rng.random((H, W)) > 0.4
    proj_range[occ] = rng.uniform(2, 60, size=int(occ.sum()))
    conf = rng.uniform(0.0, 0.999, size=(H, W)).astype(np.float32)
    px = rng.integers(0, W, size=P).astype(np.int32)
    py = rng.integers(0, H, size=P).astype(np.int32)
    unproj = rng.uniform(2, 60, size=P).astype(np.float32)

    out = np.asarray(knn_postprocess(
        jnp.asarray(proj_range), jnp.asarray(unproj), jnp.asarray(conf),
        jnp.asarray(px), jnp.asarray(py),
        knn=5, search=5, sigma=1.0, cutoff=1.0, nclasses=C))
    np.testing.assert_array_equal(out, np.ones((P,), np.int32))


def test_upsample_bilinear_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as TF
    rng = np.random.default_rng(6)
    x = rng.normal(size=(2, 7, 9, 3)).astype(np.float32)
    got = np.asarray(upsample_bilinear(jnp.asarray(x), scale=2))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = TF.interpolate(xt, scale_factor=2, mode="bilinear",
                          align_corners=False).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pixel_shuffle_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 5, 6, 8)).astype(np.float32)
    got = np.asarray(pixel_shuffle(jnp.asarray(x), r=2))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = torch.pixel_shuffle(xt, 2).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_zbuffer_packed_matches_exact():
    rng = np.random.default_rng(10)
    N, H, W = 2000, 32, 64
    rows = rng.integers(0, H, N)
    cols = rng.integers(0, W, N)
    # well-separated depths so quantization can't flip winners
    depth = rng.permutation(N).astype(np.float32) * 0.5 + 1.0
    keep = rng.random(N) > 0.1
    from pmf_tpu.ops import zbuffer_scatter_packed
    w1, m1 = zbuffer_scatter(jnp.asarray(rows), jnp.asarray(cols),
                             jnp.asarray(depth), jnp.asarray(keep), H, W)
    w2, m2 = zbuffer_scatter_packed(jnp.asarray(rows), jnp.asarray(cols),
                                    jnp.asarray(depth), jnp.asarray(keep), H, W)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))


def test_fill_canvas_matches_gather_path():
    rng = np.random.default_rng(11)
    N, H, W, F = 500, 16, 24, 6
    rows = rng.integers(0, H, N)
    cols = rng.integers(0, W, N)
    depth = rng.uniform(1, 50, N).astype(np.float32)
    keep = rng.random(N) > 0.2
    vals = rng.normal(size=(N, F)).astype(np.float32)
    from pmf_tpu.ops import fill_canvas, zbuffer_scatter_packed
    winner, mask = zbuffer_scatter_packed(
        jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(depth),
        jnp.asarray(keep), H, W)
    img = np.asarray(fill_canvas(jnp.asarray(vals), jnp.asarray(rows),
                                 jnp.asarray(cols), jnp.asarray(keep),
                                 winner, mask))
    ref = np.asarray(scatter_to_image(jnp.asarray(vals), winner, mask))
    np.testing.assert_allclose(img, ref, rtol=1e-6)


def test_rasterize_zbuffer_matches_scatter_path():
    """Sort-based rasterizer == scatter-min z-buffer + fill (bit-exact
    values, same winners, same tie-breaks), incl. W not a multiple of
    the 128 tile and an all-invalid scan."""
    from pmf_tpu.ops import fill_canvas, zbuffer_scatter_packed
    from pmf_tpu.ops.scatter import rasterize_zbuffer

    rng = np.random.default_rng(12)
    for N, H, W in [(4000, 48, 200), (1500, 16, 128), (800, 8, 30)]:
        rows = rng.integers(-3, H + 3, N)  # include out-of-range coords
        cols = rng.integers(-3, W + 3, N)
        depth = rng.uniform(1, 80, N).astype(np.float32)
        keep = (rng.random(N) > 0.2) & (rows >= 0) & (rows < H) & \
            (cols >= 0) & (cols < W)
        vals = rng.normal(size=(N, 6)).astype(np.float32)
        vals[:, 5] = rng.integers(0, 20, N)  # label-like channel

        winner, mask_ref = zbuffer_scatter_packed(
            jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(depth),
            jnp.asarray(keep), H, W)
        ref = np.asarray(fill_canvas(jnp.asarray(vals), jnp.asarray(rows),
                                     jnp.asarray(cols), jnp.asarray(keep),
                                     winner, mask_ref))
        canvas, mask = rasterize_zbuffer(
            jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(depth),
            jnp.asarray(keep), jnp.asarray(vals), H, W)
        np.testing.assert_array_equal(np.asarray(mask), np.asarray(mask_ref))
        np.testing.assert_array_equal(np.asarray(canvas), ref)

    # all-invalid scan → empty canvas
    canvas, mask = rasterize_zbuffer(
        jnp.zeros((64,), jnp.int32), jnp.zeros((64,), jnp.int32),
        jnp.ones((64,)), jnp.zeros((64,), bool),
        jnp.ones((64, 6)), 8, 130)
    assert not np.asarray(mask).any()
    assert (np.asarray(canvas) == 0).all()


def test_rasterize_zbuffer_batched_jit():
    import jax

    from pmf_tpu.ops.scatter import rasterize_zbuffer

    rng = np.random.default_rng(13)
    B, N, H, W = 3, 1000, 24, 150
    rows = jnp.asarray(rng.integers(0, H, (B, N)).astype(np.int32))
    cols = jnp.asarray(rng.integers(0, W, (B, N)).astype(np.int32))
    depth = jnp.asarray(rng.uniform(1, 60, (B, N)).astype(np.float32))
    keep = jnp.asarray(rng.random((B, N)) > 0.3)
    vals = jnp.asarray(rng.normal(size=(B, N, 4)).astype(np.float32))
    fn = jax.jit(jax.vmap(
        lambda r, c, d, k, v: rasterize_zbuffer(r, c, d, k, v, H, W)))
    canvas, mask = fn(rows, cols, depth, keep, vals)
    assert canvas.shape == (B, H, W, 4)
    assert mask.shape == (B, H, W)
    assert np.isfinite(np.asarray(canvas)).all()


def test_argmax_last_matches_jnp_with_ties():
    from pmf_tpu.ops import argmax_last
    rng = np.random.default_rng(7)
    # quantized values force plenty of exact ties
    x = (rng.integers(0, 5, (6, 17, 23)) / 4.0).astype(np.float32)
    got = np.asarray(argmax_last(jnp.asarray(x)))
    assert got.dtype == np.int32
    np.testing.assert_array_equal(got, np.argmax(x, -1))
    xb = jnp.asarray(x, jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(argmax_last(xb)),
                                  np.asarray(jnp.argmax(xb, -1)))
