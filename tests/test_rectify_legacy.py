"""Legacy LEFT./RIGHT. explicit rectification through System
(Examples_old stereo configs: the old examples built the remap tables
from LEFT.K/D/R/P themselves; System consumes them natively now)."""

import numpy as np
import pytest

from orbslam3_cpp_fork_tpu.runtime.system import System
from orbslam3_cpp_fork_tpu.runtime.tracker import Sensor
from orbslam3_cpp_fork_tpu.utils.settings import load_settings

from test_settings_io import LEGACY_YAML


def test_system_legacy_rectification(tmp_path):
    p = tmp_path / "legacy.yaml"
    p.write_text(LEGACY_YAML)
    s = load_settings(str(p))
    sysm = System(s, Sensor.STEREO)
    assert sysm._rect is not None
    assert sysm.tracker.cfg.bf == pytest.approx(47.90639384423901, rel=1e-6)
    # Rectified tracking intrinsics == the yaml's Camera.* (legacy files
    # store the LEFT.P intrinsics there).
    assert float(sysm.tracker.cfg.camera.fx) == pytest.approx(435.2047, rel=1e-5)
    # Smoke: one raw frame pair flows through remap + stereo tracking.
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (480, 752)).astype(np.float32)
    sysm.track_stereo(img, img, 0.0)
