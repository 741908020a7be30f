"""Dataset loaders + CLI example drivers on synthetic on-disk datasets.

Builds miniature EuRoC / TUM RGB-D / KITTI trees from rendered synthetic
frames, then runs the actual example mains (reference Examples/*.cc
equivalents) end-to-end through the System facade.
"""

import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from orbslam3_cpp_fork_tpu.datasets import euroc, kitti, synthetic, tum

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

YAML = """%YAML:1.0
File.version: "1.0"
Camera.type: "PinHole"
Camera1.fx: {fx}
Camera1.fy: {fy}
Camera1.cx: {cx}
Camera1.cy: {cy}
Camera.width: {w}
Camera.height: {h}
Camera.fps: 20.0
Camera.RGB: 1
ORBextractor.nFeatures: 600
{extra}
"""


@pytest.fixture(scope="module")
def rendered():
    scene = synthetic.make_scene(seed=3)
    Rs, ts = synthetic.smooth_trajectory(n_frames=14, step=0.12, yaw_rate=0.002)
    frames = synthetic.render_sequence(scene, Rs, ts)
    return scene, Rs, ts, frames


def _save_png(path, img):
    Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(path)


def test_euroc_loader_and_mono_cli(rendered, tmp_path):
    scene, Rs, ts, frames = rendered
    seq_dir = tmp_path / "MH88" / "mav0"
    cam0 = seq_dir / "cam0" / "data"
    cam0.mkdir(parents=True)
    stamps_ns = [int(1e9 * 0.05 * i) + 1403636579763555584 for i in range(len(frames))]
    for ns, f in zip(stamps_ns, frames):
        _save_png(str(cam0 / f"{ns}.png"), f)
    # IMU csv (unused by mono but exercises the parser).
    imu_dir = seq_dir / "imu0"
    imu_dir.mkdir(parents=True)
    with open(imu_dir / "data.csv", "w") as f:
        f.write("#timestamp,wx,wy,wz,ax,ay,az\n")
        for i in range(100):
            f.write(f"{stamps_ns[0] + i * 5_000_000},0,0,0,0,0,-9.81\n")

    seq = euroc.load_sequence(str(tmp_path), "MH88")
    assert len(seq.image_paths) == len(frames)
    assert seq.imu is not None and len(seq.imu.timestamps) == 100
    img = euroc.load_gray(seq.image_paths[0])
    assert img.shape == (scene.height, scene.width)
    acc, gyro, dts = euroc.imu_between(seq.imu, seq.timestamps[0], seq.timestamps[1])
    assert len(acc) == 10 and abs(dts.sum() - 0.05) < 1e-3

    yaml_path = tmp_path / "euroc.yaml"
    yaml_path.write_text(
        YAML.format(fx=scene.K[0, 0], fy=scene.K[1, 1], cx=scene.K[0, 2],
                    cy=scene.K[0, 2], w=scene.width, h=scene.height, extra="")
    )
    traj = tmp_path / "traj.txt"
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "mono_euroc.py"),
         str(yaml_path), str(tmp_path), "MH88", "--traj", str(traj),
         "--kf-traj", str(tmp_path / "kf.txt"), "--log-level", "WARNING"],
        capture_output=True, text=True, env=env, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert traj.exists()
    lines = traj.read_text().strip().splitlines()
    assert len(lines) > 8, lines


def test_tum_loader(rendered, tmp_path):
    scene, Rs, ts, frames = rendered
    base = tmp_path / "fr1_mini"
    (base / "rgb").mkdir(parents=True)
    (base / "depth").mkdir(parents=True)
    with open(base / "rgb.txt", "w") as frgb, open(base / "depth.txt", "w") as fd:
        frgb.write("# color images\n")
        fd.write("# depth images\n")
        for i, img in enumerate(frames[:6]):
            t = 0.05 * i
            _save_png(str(base / "rgb" / f"{t:.6f}.png"), img)
            d = synthetic.render_depth(scene, Rs[i], ts[i])
            Image.fromarray((d * 5000).astype(np.uint16)).save(
                str(base / "depth" / f"{t + 0.004:.6f}.png")
            )
            frgb.write(f"{t:.6f} rgb/{t:.6f}.png\n")
            fd.write(f"{t + 0.004:.6f} depth/{t + 0.004:.6f}.png\n")
    seq = tum.load_sequence(str(tmp_path), "fr1_mini")
    assert len(seq.rgb_paths) == 6
    d = tum.load_depth(seq.depth_paths[0])
    assert d.max() > 1.0  # meters, scene depth ~3-10m
    img = tum.load_gray(seq.rgb_paths[0])
    assert img.shape == (scene.height, scene.width)


def test_kitti_loader(rendered, tmp_path):
    scene, Rs, ts, frames = rendered
    base = tmp_path / "sequences" / "00"
    (base / "image_0").mkdir(parents=True)
    (base / "image_1").mkdir(parents=True)
    with open(base / "times.txt", "w") as f:
        for i, img in enumerate(frames[:5]):
            _save_png(str(base / "image_0" / f"{i:06d}.png"), img)
            _save_png(str(base / "image_1" / f"{i:06d}.png"), img)
            f.write(f"{0.1 * i:.6e}\n")
    seq = kitti.load_sequence(str(tmp_path), "00")
    assert len(seq.image_paths) == 5
    assert len(seq.image_paths_right) == 5
    assert abs(seq.timestamps[1] - 0.1) < 1e-9


def test_all_example_drivers_parse():
    """Every CLI driver module compiles and exposes main()
    (the reference ships one main per sensor x dataset; missing drivers
    are inventory gaps)."""
    import importlib.util

    ex = os.path.join(REPO, "examples")
    drivers = [f for f in os.listdir(ex) if f.endswith(".py")
               and f not in ("common.py", "evaluate_ate.py")]
    assert len(drivers) >= 13, drivers
    for f in drivers:
        spec = importlib.util.spec_from_file_location(f[:-3], os.path.join(ex, f))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        assert hasattr(mod, "main"), f
