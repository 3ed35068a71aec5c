import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from pmf_tpu.data.nuscenes import (
    Nuscenes, NuScenesLite, quaternion_rotation_matrix, CAMERAS,
    SEG_CLASS_TO_INDEX,
)


def test_quaternion_matches_scipy():
    from scipy.spatial.transform import Rotation as R

    rng = np.random.default_rng(0)
    for _ in range(5):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        got = quaternion_rotation_matrix(q)  # [w, x, y, z]
        want = R.from_quat([q[1], q[2], q[3], q[0]]).as_matrix()  # xyzw
        np.testing.assert_allclose(got, want, atol=1e-10)


def _make_mini_nuscenes(root, n_samples=2, n_points=400, seed=0):
    """Fabricate a nuScenes-format DB: JSON tables + .pcd.bin + lidarseg
    + camera JPEGs."""
    from PIL import Image
    from scipy.spatial.transform import Rotation as R

    rng = np.random.default_rng(seed)
    version = "v1.0-mini"
    tdir = os.path.join(root, version)
    os.makedirs(os.path.join(root, "samples", "LIDAR_TOP"), exist_ok=True)
    os.makedirs(os.path.join(root, "lidarseg", version), exist_ok=True)

    def rand_quat():
        v = rng.normal(size=4)
        q = v / np.linalg.norm(v)  # wxyz (any unit quat is a rotation)
        return [float(q[0]), float(q[1]), float(q[2]), float(q[3])]

    category = []
    raw_names = list({k: v for k, v in
                      [("noise", 0)] +
                      [(n, i + 1) for i, n in enumerate(
                          ["vehicle.car", "human.pedestrian.adult",
                           "flat.driveable_surface", "static.manmade",
                           "static.vegetation"])]}.items())
    for name, idx in raw_names:
        category.append({"token": f"cat{idx}", "name": name, "index": idx,
                         "description": ""})

    scene = [{"token": "scene0", "name": "scene-0001",
              "first_sample_token": "samp0"}]
    sample, sample_data, calibrated_sensor, ego_pose, lidarseg = [], [], [], [], []

    K = [[400.0, 0, 200.0], [0, 400.0, 112.0], [0, 0, 1.0]]
    for s in range(n_samples):
        data = {}
        # lidar
        lt = f"lidar{s}"
        lfile = f"samples/LIDAR_TOP/{s:06d}.pcd.bin"
        pts = np.zeros((n_points, 5), np.float32)
        pts[:, 0] = rng.uniform(-30, 30, n_points)
        pts[:, 1] = rng.uniform(-30, 30, n_points)
        pts[:, 2] = rng.uniform(-2, 1, n_points)
        pts[:, 3] = rng.uniform(0, 1, n_points)
        pts.tofile(os.path.join(root, lfile))
        labels = rng.integers(0, 6, n_points).astype(np.uint8)
        segfile = f"lidarseg/{version}/{lt}_lidarseg.bin"
        labels.tofile(os.path.join(root, segfile))
        lidarseg.append({"token": f"seg{s}", "sample_data_token": lt,
                         "filename": segfile})
        calibrated_sensor.append({
            "token": f"lcs{s}", "rotation": rand_quat(),
            "translation": [0.9, 0.0, 1.8], "camera_intrinsic": []})
        ego_pose.append({"token": f"lep{s}", "rotation": rand_quat(),
                         "translation": [float(s * 5), 0.0, 0.0]})
        sample_data.append({
            "token": lt, "sample_token": f"samp{s}", "filename": lfile,
            "calibrated_sensor_token": f"lcs{s}", "ego_pose_token": f"lep{s}",
            "is_key_frame": True, "sensor_modality": "lidar"})
        data["LIDAR_TOP"] = lt
        # cameras
        for ci, cam in enumerate(CAMERAS):
            ct = f"cam{s}_{ci}"
            cdir = os.path.join(root, "samples", cam)
            os.makedirs(cdir, exist_ok=True)
            cfile = f"samples/{cam}/{s:06d}.jpg"
            img = rng.integers(0, 255, (224, 400, 3), dtype=np.uint8)
            Image.fromarray(img).save(os.path.join(root, cfile))
            yaw = ci * np.pi / 3
            q = R.from_euler("z", yaw).as_quat()
            calibrated_sensor.append({
                "token": f"ccs{s}_{ci}",
                "rotation": [float(q[3]), float(q[0]), float(q[1]), float(q[2])],
                "translation": [1.5, 0.0, 1.5], "camera_intrinsic": K})
            ego_pose.append({"token": f"cep{s}_{ci}", "rotation": rand_quat(),
                             "translation": [float(s * 5) + 0.1, 0.0, 0.0]})
            sample_data.append({
                "token": ct, "sample_token": f"samp{s}", "filename": cfile,
                "calibrated_sensor_token": f"ccs{s}_{ci}",
                "ego_pose_token": f"cep{s}_{ci}",
                "is_key_frame": True, "sensor_modality": "camera"})
            data[cam] = ct
        sample.append({"token": f"samp{s}", "scene_token": "scene0",
                       "data": data})

    os.makedirs(tdir, exist_ok=True)
    for name, rows in [("category", category), ("sample", sample),
                       ("sample_data", sample_data),
                       ("calibrated_sensor", calibrated_sensor),
                       ("ego_pose", ego_pose), ("scene", scene),
                       ("lidarseg", lidarseg)]:
        with open(os.path.join(tdir, f"{name}.json"), "w") as f:
            json.dump(rows, f)
    return root


@pytest.fixture(scope="module")
def nusc_root(tmp_path_factory):
    return _make_mini_nuscenes(str(tmp_path_factory.mktemp("nusc")))


def test_adapter_tokens_and_labels(nusc_root):
    ds = Nuscenes(nusc_root, version="v1.0-mini", split="train")
    assert len(ds) == 2 * 6  # 2 keyframes × 6 cameras
    pcd, sem, _ = ds.loadDataByIndex(0)
    assert pcd.shape[1] == 4
    mapped = ds.labelMapping(sem)
    assert mapped.max() <= 16 and mapped.min() >= 0
    # raw class 1 = vehicle.car → 'car' = 4
    np.testing.assert_array_equal(np.unique(mapped[sem == 1]), [4])
    np.testing.assert_array_equal(np.unique(mapped[sem == 0]), [0])  # noise
    img = ds.loadImage(0)
    assert img.shape == (224, 400, 3)
    # 6 consecutive items share the lidar token (infer merge relies on it)
    toks = {ds.lidar_token(i) for i in range(6)}
    assert len(toks) == 1


def test_projection_matrix_against_manual_chain(nusc_root):
    """Verify K·(chain) equals applying the 4 transform steps point by
    point (the devkit way, dataset_nuscenes.py:230-263)."""
    ds = Nuscenes(nusc_root, version="v1.0-mini", split="train")
    P = ds.projection_matrix(1)
    rec = ds.token_list[1]
    nusc = ds.nusc
    lsd = nusc.get("sample_data", rec["lidar_token"])
    csd = nusc.get("sample_data", rec["cam_token"])

    rng = np.random.default_rng(1)
    pts = rng.uniform(-20, 20, (50, 3))

    def apply(rec_, p, inv=False):
        Rm = quaternion_rotation_matrix(rec_["rotation"])
        t = np.asarray(rec_["translation"])
        if inv:
            return (p - t) @ Rm
        return p @ Rm.T + t

    p = apply(nusc.get("calibrated_sensor", lsd["calibrated_sensor_token"]), pts)
    p = apply(nusc.get("ego_pose", lsd["ego_pose_token"]), p)
    p = apply(nusc.get("ego_pose", csd["ego_pose_token"]), p, inv=True)
    p = apply(nusc.get("calibrated_sensor", csd["calibrated_sensor_token"]),
              p, inv=True)
    K = np.asarray(nusc.get("calibrated_sensor",
                            csd["calibrated_sensor_token"])["camera_intrinsic"])
    want = p @ K.T  # [N, 3] unnormalized
    got = np.c_[pts, np.ones(50)] @ P.T
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_nuscenes_pipeline_end_to_end(nusc_root):
    import jax
    from pmf_tpu.data import PVConfig, build_batch, nuscenes_sample_reader, HostLoader

    ds = Nuscenes(nusc_root, version="v1.0-mini", split="train")
    cfg = PVConfig(canvas_h=224, canvas_w=400, proj_h=224, proj_w=400,
                   proj_ht=64, proj_wt=96, h_pad=2, w_pad=2, n_points=512,
                   projection="cam")
    reader = nuscenes_sample_reader(ds, cfg)
    loader = HostLoader(reader, len(ds), batch_size=2, num_workers=2)
    batch = next(iter(loader))
    f, m, l = build_batch(
        jax.random.PRNGKey(0), jnp.asarray(batch["points"]),
        jnp.asarray(batch["labels"]), jnp.asarray(batch["valid"]),
        jnp.asarray(batch["proj_matrix"]), jnp.asarray(batch["image"]),
        jnp.asarray(batch["img_h"]), jnp.asarray(batch["img_w"]), cfg, True)
    assert f.shape == (2, 64, 96, 8)
    assert np.isfinite(np.asarray(f)).all()


def test_val_split_empty_when_all_scenes_train(nusc_root):
    ds = Nuscenes(nusc_root, version="v1.0-mini", split="val",
                  train_scene_names=["scene-0001"])
    assert len(ds) == 0
    ds2 = Nuscenes(nusc_root, version="v1.0-mini", split="val",
                   train_scene_names=[])
    assert len(ds2) == 12


def test_embedded_val_split_constants():
    """The embedded official val split must be a clean 150-scene set,
    disjoint from the mini-train scenes that are not shared with val
    (scene-0553/0796/1094/1100 ARE officially in both mini_train and
    val — mini is carved out of trainval, not disjoint from it)."""
    from pmf_tpu.data.nuscenes import MINI_VAL, VAL_SCENES

    assert len(VAL_SCENES) == 150
    assert len(set(VAL_SCENES)) == 150
    assert all(n.startswith("scene-") and len(n) == 10 for n in VAL_SCENES)
    assert VAL_SCENES == sorted(VAL_SCENES)
    # mini_val is a subset of the official val split (devkit invariant)
    assert set(MINI_VAL) <= set(VAL_SCENES)


def test_trainval_split_derives_train_as_complement(nusc_root):
    """A DB advertising v1.0-trainval with non-official scene names keeps
    every scene in train (complement of an absent val list)."""
    tv = os.path.join(nusc_root, "v1.0-trainval")
    if not os.path.exists(tv):
        os.symlink(os.path.join(nusc_root, "v1.0-mini"), tv)
    ds = Nuscenes(nusc_root, version="v1.0-trainval", split="val")
    assert len(ds) == 0
    ds_train = Nuscenes(nusc_root, version="v1.0-trainval", split="train")
    assert len(ds_train) == 12


def test_nuscenes_v2_adapter_and_pipeline(nusc_root):
    import jax
    from pmf_tpu.data import NuscenesV2, nuscenes_v2_sample_reader
    from pmf_tpu.data.perspective_pipeline_v2 import V2Config, build_v2_batch

    ds = NuscenesV2(nusc_root, version="v1.0-mini", split="train")
    assert len(ds) == 12
    assert ds.cam_channel(0) == "CAM_FRONT"
    fl, fr = ds.fov(0)
    np.testing.assert_allclose([fl, fr], [-35 * np.pi / 180, 35 * np.pi / 180])
    assert ds.image_scale(3) == (1.0, 1.0)  # CAM_BACK
    assert ds.image_scale(0) == (0.5, 0.6)
    # non-CAM_BACK image is resized
    img = ds.loadImage(0)
    assert img.shape == (112, 240, 3)
    img_back = ds.loadImage(3)
    assert img_back.shape == (224, 400, 3)

    # camera transform: M maps lidar frame to camera frame consistently
    # with the composed projection of the base adapter
    M, K = ds.camera_transform(3)  # CAM_BACK → no rescale
    P_base = ds.projection_matrix(3)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-10, 10, (20, 3))
    cam = pts @ M[:3, :3].T + M[:3, 3]
    uv1 = cam @ K.T
    uv2 = np.c_[pts, np.ones(20)] @ P_base.T
    np.testing.assert_allclose(uv1, uv2, rtol=1e-4, atol=1e-4)

    cfg = V2Config(canvas_h=224, canvas_w=400, proj_h=64, proj_w=128,
                   proj_ht=64, proj_wt=128, n_points=512, cam_frame=True)
    reader = nuscenes_v2_sample_reader(ds, cfg)
    s0, s1 = reader(0), reader(1)
    batch = {k: np.stack([s0[k], s1[k]]) for k in s0}
    f, m, l = build_v2_batch(
        jax.random.PRNGKey(0), jnp.asarray(batch["points"]),
        jnp.asarray(batch["labels"]), jnp.asarray(batch["valid"]),
        jnp.asarray(batch["proj_matrix"]), jnp.asarray(batch["image"]),
        jnp.asarray(batch["img_h"]), jnp.asarray(batch["img_w"]),
        cfg, True, fovs=jnp.asarray(batch["fov"]))
    assert f.shape == (2, 64, 128, 8)
    assert np.isfinite(np.asarray(f)).all()
