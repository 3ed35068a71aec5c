import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pmf_tpu.data import (
    SemanticKitti, PVConfig, RangeConfig, build_batch,
    build_eval_sample_with_uproj, build_range_batch, HostLoader,
    kitti_sample_reader, pad_points, pad_image, project_to_canvas,
)
from pmf_tpu.data.loader import range_sample_reader

IMG_H, IMG_W = 60, 144


def make_synthetic_kitti(root, n_scans=3, n_points=800, seed=0):
    """Minimal on-disk KITTI-format dataset: seq 00 with velodyne/.bin,
    labels/.label, image_2/.png, calib.txt."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    seq = os.path.join(root, "00")
    for sub in ["velodyne", "labels", "image_2"]:
        os.makedirs(os.path.join(seq, sub), exist_ok=True)

    # simple pinhole: cam looks along +x, image WxH
    fx = fy = 80.0
    cx, cy = IMG_W / 2, IMG_H / 2
    K = np.array([[fx, 0, cx, 0], [0, fy, cy, 0], [0, 0, 1, 0.0]])
    R = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0.0]])
    Tr = np.eye(4)
    Tr[:3, :3] = R
    P2 = K[:, :3] @ np.eye(3, 4)
    with open(os.path.join(seq, "calib.txt"), "w") as f:
        f.write("P0: " + " ".join("0" for _ in range(12)) + "\n")
        f.write("P2: " + " ".join(str(v) for v in P2.reshape(-1)) + "\n")
        f.write("Tr: " + " ".join(str(v) for v in Tr[:3].reshape(-1)) + "\n")

    raw_classes = [10, 40, 48, 50, 70, 80]  # valid SemanticKITTI raw ids
    for i in range(n_scans):
        pts = np.zeros((n_points, 4), np.float32)
        pts[:, 0] = rng.uniform(2, 40, n_points)        # forward
        pts[:, 1] = rng.uniform(-8, 8, n_points)
        pts[:, 2] = rng.uniform(-2, 1, n_points)
        pts[:, 3] = rng.uniform(0, 1, n_points)
        pts.tofile(os.path.join(seq, "velodyne", f"{i:06d}.bin"))
        sem = rng.choice(raw_classes, n_points).astype(np.int32)
        inst = rng.integers(0, 5, n_points).astype(np.int32)
        (sem | (inst << 16)).astype(np.int32).tofile(
            os.path.join(seq, "labels", f"{i:06d}.label"))
        img = rng.integers(0, 255, (IMG_H, IMG_W, 3), dtype=np.uint8)
        Image.fromarray(img).save(os.path.join(seq, "image_2", f"{i:06d}.png"))
    return root


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    return make_synthetic_kitti(str(root))


@pytest.fixture(scope="module")
def pv_cfg():
    return PVConfig(canvas_h=64, canvas_w=160, proj_h=64, proj_w=160,
                    proj_ht=48, proj_wt=96, h_pad=2, w_pad=2,
                    n_points=1024)


def test_adapter_basics(kitti_root):
    ds = SemanticKitti(kitti_root, [0])
    assert len(ds) == 3
    pcd, sem, inst = ds.loadDataByIndex(0)
    assert pcd.shape[1] == 4
    assert sem.shape == (pcd.shape[0],)
    mapped = ds.labelMapping(sem)
    assert mapped.max() < 20 and mapped.min() >= 0
    # roundtrip through inverse LUT returns original raw ids
    back = ds.labelInvMapping(mapped)
    remapped = ds.labelMapping(back)
    np.testing.assert_array_equal(remapped, mapped)
    seq, frame = ds.parsePathInfoByIndex(0)
    assert seq == "00" and frame == "000000"
    assert ds.projection_matrix("00").shape == (3, 4)
    assert ds.cls_freq.shape == (20,)


def test_pv_eval_sample_geometry(kitti_root, pv_cfg):
    ds = SemanticKitti(kitti_root, [0])
    reader = kitti_sample_reader(ds, pv_cfg)
    s = reader(0)
    f, m, l, rows, cols, keep, depth = build_eval_sample_with_uproj(
        jnp.asarray(s["points"]), jnp.asarray(s["labels"]),
        jnp.asarray(s["valid"]), jnp.asarray(s["proj_matrix"]),
        jnp.asarray(s["image"]), s["img_h"], s["img_w"], pv_cfg)
    f, m, l = np.asarray(f), np.asarray(m), np.asarray(l)
    rows, cols, keep = np.asarray(rows), np.asarray(cols), np.asarray(keep)

    assert f.shape == (64, 160, 8)
    assert keep.sum() > 50  # plenty of points in view
    # winners' 2D label equals some kept point's mapped label at that pixel
    kr, kc = rows[keep], cols[keep]
    assert m[kr, kc].all(), "every kept point's pixel must be occupied"
    assert (l[kr, kc] > 0).mean() > 0.99
    # depth channel at a pixel equals min depth of points mapping there
    d = np.asarray(depth)
    pix = kr * 160 + kc
    for p in np.unique(pix)[:20]:
        dmin = d[keep][pix == p].min()
        np.testing.assert_allclose(
            f[p // 160, p % 160, 0] * pv_cfg.img_stds[0] + pv_cfg.img_mean[0],
            dmin, rtol=1e-3)
    # padded border is empty
    assert not m[:2].any() and not m[:, :2].any()


def test_pv_train_batch(kitti_root, pv_cfg):
    ds = SemanticKitti(kitti_root, [0])
    reader = kitti_sample_reader(ds, pv_cfg)
    loader = HostLoader(reader, len(ds), batch_size=2, shuffle=True,
                        drop_last=True, num_workers=2)
    batch = next(iter(loader))
    f, m, l = build_batch(
        jax.random.PRNGKey(0), jnp.asarray(batch["points"]),
        jnp.asarray(batch["labels"]), jnp.asarray(batch["valid"]),
        jnp.asarray(batch["proj_matrix"]), jnp.asarray(batch["image"]),
        jnp.asarray(batch["img_h"]), jnp.asarray(batch["img_w"]),
        pv_cfg, True)
    assert f.shape == (2, 48, 96, 8)
    assert m.shape == (2, 48, 96)
    assert l.shape == (2, 48, 96)
    assert bool(np.asarray(m).any())
    # lidar channels are zero wherever the mask is off
    f_np, m_np = np.asarray(f), np.asarray(m)
    assert np.abs(f_np[..., :5][~m_np]).max() == 0.0
    # RGB channels present where the (unflipped/unrotated) image lands
    assert f_np[..., 5:8].max() > 0.05


def test_pv_train_aug_determinism(kitti_root, pv_cfg):
    ds = SemanticKitti(kitti_root, [0])
    s = kitti_sample_reader(ds, pv_cfg)(0)
    args = (jnp.asarray(s["points"])[None], jnp.asarray(s["labels"])[None],
            jnp.asarray(s["valid"])[None], jnp.asarray(s["proj_matrix"])[None],
            jnp.asarray(s["image"])[None], jnp.asarray([s["img_h"]]),
            jnp.asarray([s["img_w"]]))
    f1, _, _ = build_batch(jax.random.PRNGKey(7), *args, pv_cfg, True)
    f2, _, _ = build_batch(jax.random.PRNGKey(7), *args, pv_cfg, True)
    f3, _, _ = build_batch(jax.random.PRNGKey(8), *args, pv_cfg, True)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    assert np.abs(np.asarray(f1) - np.asarray(f3)).max() > 0


def test_range_batch(kitti_root):
    cfg = RangeConfig(proj_h=16, proj_w=128, n_points=1024, pcd_aug=True)
    ds = SemanticKitti(kitti_root, [0], has_image=False)
    reader = range_sample_reader(ds, cfg)
    loader = HostLoader(reader, len(ds), batch_size=2, num_workers=2)
    batch = next(iter(loader))
    f, l, m = build_range_batch(
        jax.random.PRNGKey(0), jnp.asarray(batch["points"]),
        jnp.asarray(batch["labels"]), jnp.asarray(batch["valid"]), cfg, False)
    f, l, m = np.asarray(f), np.asarray(l), np.asarray(m)
    assert f.shape == (2, 16, 128, 5)
    assert m.any() and (l[m] > 0).mean() > 0.9
    assert np.abs(f[~m]).max() == 0.0  # normalized features masked


def test_host_loader_sharding(kitti_root, pv_cfg):
    ds = SemanticKitti(kitti_root, [0])
    reader = kitti_sample_reader(ds, pv_cfg)
    l0 = HostLoader(reader, len(ds), 1, process_index=0, process_count=2,
                    drop_last=False, num_workers=1)
    l1 = HostLoader(reader, len(ds), 1, process_index=1, process_count=2,
                    drop_last=False, num_workers=1)
    idx0 = [int(b["index"][0]) for b in l0]
    idx1 = [int(b["index"][0]) for b in l1]
    assert sorted(idx0 + idx1) == [0, 1, 2]
    assert not (set(idx0) & set(idx1))


def test_native_loader_matches_numpy(kitti_root):
    from pmf_tpu.data import native

    if not native.available():
        pytest.skip("native loader not built")
    ds = SemanticKitti(kitti_root, [0])
    n_max = 1024
    pts, labels, valid, n = native.read_scan(
        ds.pointcloud_files[0], ds.label_files[0], ds.class_map_lut, n_max)
    # numpy reference path
    pcd, sem, _ = ds.loadDataByIndex(0)
    mapped = ds.labelMapping(sem)
    from pmf_tpu.data import pad_points
    ref_pts, ref_lab, ref_val = pad_points(pcd, mapped, n_max)
    assert n == len(pcd)
    np.testing.assert_array_equal(pts, ref_pts)
    np.testing.assert_array_equal(labels, ref_lab)
    np.testing.assert_array_equal(valid, ref_val)

    # batch variant
    bp, bl, bv, counts = native.read_scan_batch(
        ds.pointcloud_files[:3], ds.label_files[:3], ds.class_map_lut, n_max)
    assert bp.shape == (3, n_max, 4)
    np.testing.assert_array_equal(bp[0], ref_pts)
    np.testing.assert_array_equal(counts, [800, 800, 800])


def test_native_png_decode_matches_pil(kitti_root):
    """native/loader.cpp decode_png vs PIL + pad_image: bit-exact float
    canvas and identical extents (covers Sub/Up/Average/Paeth filters —
    PIL's encoder picks per-row adaptive filters on photographic data)."""
    from pmf_tpu.data import native
    from pmf_tpu.data import pad_image

    if not native.png_available():
        pytest.skip("native loader not built with png support")
    ds = SemanticKitti(kitti_root, [0])
    ch, cw = 64, 160
    for i in range(2):
        img = ds.loadImage(i)
        ref, rh, rw = pad_image(img, ch, cw)
        got, gh, gw = native.decode_png(ds.image_files[i], ch, cw)
        assert (gh, gw) == (rh, rw)
        np.testing.assert_array_equal(got, ref)


def test_native_full_scan_reader(kitti_root):
    """read_scan_full (points+labels+PNG in one call) matches the
    composed readers, and kitti_sample_reader uses it transparently."""
    from pmf_tpu.data import native
    from pmf_tpu.data import pad_image, pad_points
    from pmf_tpu.data.loader import kitti_sample_reader

    if not native.png_available():
        pytest.skip("native loader not built with png support")
    ds = SemanticKitti(kitti_root, [0])
    cfg = PVConfig(canvas_h=64, canvas_w=160, proj_h=64, proj_w=160,
                   n_points=1024)
    pts, lab, val, canvas, ih, iw, n = native.read_scan_full(
        ds.pointcloud_files[0], ds.label_files[0], ds.image_files[0],
        ds.class_map_lut, cfg.n_points, cfg.canvas_h, cfg.canvas_w)
    pcd, sem, _ = ds.loadDataByIndex(0)
    ref_pts, ref_lab, ref_val = pad_points(pcd, ds.labelMapping(sem),
                                           cfg.n_points)
    ref_img, rih, riw = pad_image(ds.loadImage(0), cfg.canvas_h, cfg.canvas_w)
    np.testing.assert_array_equal(pts, ref_pts)
    np.testing.assert_array_equal(lab, ref_lab)
    np.testing.assert_array_equal(canvas, ref_img)
    assert (ih, iw) == (rih, riw)

    s = kitti_sample_reader(ds, cfg, use_native=True)(0)
    np.testing.assert_array_equal(s["image"], ref_img)
    np.testing.assert_array_equal(s["points"], ref_pts)


def test_native_png_rejects_corrupt_files(tmp_path):
    """Malformed PNGs return a clean error (negative rc → IOError), not
    UB/bad_alloc: truncated IHDR, zero/absurd dimensions, bad magic."""
    from pmf_tpu.data import native

    if not native.png_available():
        pytest.skip("native loader not built with png support")
    sig = bytes([137, 80, 78, 71, 13, 10, 26, 10])

    def chunk(typ, data):
        import struct, zlib as _z
        return (struct.pack(">I", len(data)) + typ + data +
                struct.pack(">I", _z.crc32(typ + data)))

    cases = {
        "badmagic.png": b"NOTAPNG0" + b"\x00" * 32,
        # IHDR declares len 0 at end of file (would read past the buffer)
        "truncihdr.png": sig + b"\x00\x00\x00\x00IHDR",
        # absurd dimensions (would bad_alloc without the sanity bound)
        "huge.png": sig + chunk(b"IHDR",
                                b"\xff\xff\xff\xff\xff\xff\xff\xff"
                                b"\x08\x02\x00\x00\x00"),
        "zerodim.png": sig + chunk(b"IHDR",
                                   b"\x00\x00\x00\x00\x00\x00\x00\x10"
                                   b"\x08\x02\x00\x00\x00"),
    }
    for name, blob in cases.items():
        p = tmp_path / name
        p.write_bytes(blob)
        with pytest.raises(IOError):
            native.decode_png(str(p), 16, 16)


def test_native_jpeg_decode_matches_pil(tmp_path):
    """native decode_image on JPEG (nuScenes CAM_* frames are JPEG) vs
    PIL + pad_image: same extents, near-identical pixels (IDCT
    implementations may differ by ±1/255 between libjpeg builds)."""
    from PIL import Image

    from pmf_tpu.data import native, pad_image

    if not native.image_available():
        pytest.skip("native loader not built with image support")
    rng = np.random.default_rng(3)
    # smooth-ish image so JPEG error stays small but filters engage
    base = rng.integers(0, 255, (12, 18, 3), dtype=np.uint8)
    img = np.asarray(Image.fromarray(base).resize((96, 48))).astype(np.uint8)
    p = tmp_path / "cam.jpg"
    Image.fromarray(img).save(p, quality=92)

    ch, cw = 64, 112
    ref, rh, rw = pad_image(np.asarray(Image.open(p)), ch, cw)
    got, gh, gw = native.decode_image(str(p), ch, cw)
    assert (gh, gw) == (rh, rw) == (48, 96)
    assert np.abs(got - ref).max() <= 2.0 / 255.0 + 1e-6
    assert np.mean(np.abs(got - ref)) < 0.5 / 255.0
    # padding stays zero
    assert np.all(got[48:] == 0) and np.all(got[:, 96:] == 0)

    with pytest.raises(IOError):
        native.decode_image(str(tmp_path / "missing.jpg"), 16, 16)
    bad = tmp_path / "trunc.jpg"
    bad.write_bytes(b"\xff\xd8\xff\xe0" + b"\x00" * 16)
    with pytest.raises(IOError):
        native.decode_image(str(bad), 16, 16)


def test_exotic_image_falls_back_per_file(kitti_root):
    """One exotic (palette) PNG must not demote the whole reader: the
    failing sample takes the PIL path, subsequent samples decode
    natively again (loader.py consecutive-failure policy)."""
    import shutil

    from PIL import Image

    from pmf_tpu.data import native
    from pmf_tpu.data.loader import kitti_sample_reader

    if not native.image_available():
        pytest.skip("native loader not built with image support")
    root = os.path.join(os.path.dirname(kitti_root), "kitti_exotic")
    if os.path.isdir(root):
        shutil.rmtree(root)
    shutil.copytree(kitti_root, root)
    img_path = os.path.join(root, "00", "image_2", "000001.png")
    Image.open(img_path).convert("P").save(img_path)  # palette PNG

    ds = SemanticKitti(root, [0])
    cfg = PVConfig(canvas_h=64, canvas_w=160, proj_h=64, proj_w=160,
                   n_points=1024)
    reader = kitti_sample_reader(ds, cfg, use_native=True)
    s0 = reader(0)   # native
    s1 = reader(1)   # exotic → per-file PIL fallback
    s2 = reader(2)   # native again

    plain = kitti_sample_reader(ds, cfg, use_native=False)
    for s, i in ((s0, 0), (s1, 1), (s2, 2)):
        ref = plain(i)
        np.testing.assert_array_equal(s["points"], ref["points"])
        np.testing.assert_allclose(s["image"], ref["image"], atol=1e-6)
    shutil.rmtree(root)
