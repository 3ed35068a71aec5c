"""Host-side loader throughput: can the host feed the device at the
bench rate (77+ scans/s eval / 20+ train)?

Generates KITTI-sized synthetic files (376×1241 RGB PNG + ~32k-point
FOV scans — the reference trains/evals on the FOV-distilled dataset),
then measures scans/sec of:
  * the PIL+numpy reader path (what the reference's DataLoader workers
    do, minus the projection which we run on device);
  * the native C++ path (read_scan_full: points+labels+PNG in one
    GIL-dropping call, native/loader.cpp);
  * both through HostLoader's thread pool at several worker counts.

Run: python scripts/bench_host_loader.py [n_scans]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# host-only benchmark: never let a stray jnp call reach for the TPU
# relay (a hung handshake would stall the whole measurement)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

IMG_H, IMG_W = 376, 1241
N_POINTS = 32768
BUCKET = 32768


def make_files(root, n_scans):
    from PIL import Image

    rng = np.random.default_rng(0)
    seq = os.path.join(root, "00")
    for sub in ["velodyne", "labels", "image_2"]:
        os.makedirs(os.path.join(seq, sub), exist_ok=True)
    fx = 720.0
    P2 = np.array([[fx, 0, IMG_W / 2, 0], [0, fx, IMG_H / 2, 0],
                   [0, 0, 1, 0.0]])
    with open(os.path.join(seq, "calib.txt"), "w") as f:
        f.write("P0: " + " ".join("0" for _ in range(12)) + "\n")
        f.write("P2: " + " ".join(str(v) for v in P2[:, :4].reshape(-1)) + "\n")
        f.write("Tr: " + " ".join(str(v) for v in np.eye(4)[:3].reshape(-1)) + "\n")
    # one photographic-ish image (smooth gradients + noise → realistic
    # PNG filter mix and compression ratio), reused byte-identically
    yy, xx = np.mgrid[0:IMG_H, 0:IMG_W]
    base = (96 + 64 * np.sin(yy / 37.0) + 48 * np.cos(xx / 53.0))
    img = np.stack([base, base * 0.9, base * 1.1], -1)
    img = np.clip(img + rng.normal(0, 12, img.shape), 0, 255).astype(np.uint8)
    img_path = os.path.join(seq, "image_2", "000000.png")
    Image.fromarray(img).save(img_path)
    pts = np.zeros((N_POINTS, 4), np.float32)
    pts[:, 0] = rng.uniform(2, 70, N_POINTS)
    pts[:, 1] = rng.uniform(-20, 20, N_POINTS)
    pts[:, 2] = rng.uniform(-2, 1, N_POINTS)
    pts[:, 3] = rng.uniform(0, 1, N_POINTS)
    pcd_path = os.path.join(seq, "velodyne", "000000.bin")
    pts.tofile(pcd_path)
    lab = rng.choice([10, 40, 48, 50, 70, 80], N_POINTS).astype(np.int32)
    lab_path = os.path.join(seq, "labels", "000000.label")
    lab.tofile(lab_path)
    for i in range(1, n_scans):
        for src, sub, ext in [(pcd_path, "velodyne", "bin"),
                              (lab_path, "labels", "label"),
                              (img_path, "image_2", "png")]:
            dst = os.path.join(seq, sub, f"{i:06d}.{ext}")
            if not os.path.exists(dst):
                os.link(src, dst)
    return root


def main():
    n_scans = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    root = "/tmp/host_loader_bench"
    make_files(root, n_scans)

    from pmf_tpu.data import PVConfig, SemanticKitti
    from pmf_tpu.data.loader import HostLoader, kitti_sample_reader
    from pmf_tpu.data import native

    cfg = PVConfig(canvas_h=384, canvas_w=1248, n_points=BUCKET)
    ds = SemanticKitti(root, [0])
    n_cores = os.cpu_count()
    print(f"host cores: {n_cores}; image {IMG_H}x{IMG_W}, "
          f"{N_POINTS} pts/scan, {n_scans} scans")

    def timed(tag, reader, workers):
        loader = HostLoader(reader, n_scans, batch_size=8, shuffle=False,
                            drop_last=False, num_workers=workers)
        # warm (page cache + pools)
        next(iter(loader))
        t0 = time.perf_counter()
        n = 0
        for batch in loader:
            n += int(batch["batch_valid"].sum())
        dt = time.perf_counter() - t0
        print(f"{tag:32s} workers={workers}  {n / dt:7.1f} scans/s "
              f"({dt / n * 1000:.1f} ms/scan)")
        return n / dt

    pil_reader = kitti_sample_reader(ds, cfg, use_native=False)
    native_reader = kitti_sample_reader(ds, cfg, use_native=True)

    r1 = timed("PIL+numpy (reference-style)", pil_reader, 1)
    timed("PIL+numpy (reference-style)", pil_reader, 8)
    if native.png_available():
        r2 = timed("native read_scan_full", native_reader, 1)
        best = timed("native read_scan_full", native_reader, 8)
        print(f"native speedup 1-thread: {r2 / r1:.2f}x; "
              f"per-core rate {r2:.1f} scans/s/core -> a {n_cores}-core "
              f"host sustains ~{r2 * max(n_cores - 2, 1):.0f} scans/s")
    else:
        print("native png loader not built (make -C native)")

    # ---- nuScenes-style JPEG camera frame decode (900x1600) ----------
    # the nuScenes train path decodes 6 camera JPEGs per keyframe; this
    # measures the per-image decode+canvas rate of PIL vs the native
    # libjpeg path (decode_image writes the /255 float canvas directly)
    from PIL import Image

    rng = np.random.default_rng(1)
    yy, xx = np.mgrid[0:900, 0:1600]
    base = (96 + 64 * np.sin(yy / 37.0) + 48 * np.cos(xx / 53.0))
    img = np.stack([base, base * 0.9, base * 1.1], -1)
    img = np.clip(img + rng.normal(0, 12, img.shape), 0, 255).astype(np.uint8)
    jpg = os.path.join(root, "cam.jpg")
    Image.fromarray(img).save(jpg, quality=90)

    from pmf_tpu.data.perspective_pipeline import pad_image

    n_img = min(n_scans, 48)

    t0 = time.perf_counter()
    for _ in range(n_img):
        pad_image(np.asarray(Image.open(jpg)), 900, 1600)
    pil_rate = n_img / (time.perf_counter() - t0)
    print(f"{'JPEG 900x1600 PIL+pad_image':32s} workers=1  "
          f"{pil_rate:7.1f} imgs/s ({1000 / pil_rate:.1f} ms/img)")
    if native.image_available():
        native.decode_image(jpg, 900, 1600)  # warm
        t0 = time.perf_counter()
        for _ in range(n_img):
            native.decode_image(jpg, 900, 1600)
        nat_rate = n_img / (time.perf_counter() - t0)
        print(f"{'JPEG 900x1600 native libjpeg':32s} workers=1  "
              f"{nat_rate:7.1f} imgs/s ({1000 / nat_rate:.1f} ms/img); "
              f"{nat_rate / pil_rate:.2f}x PIL; 6 cams/keyframe -> "
              f"~{nat_rate / 6:.1f} keyframes/s/core")


if __name__ == "__main__":
    main()
