"""System facade — the library's top-level entry point.

TPU re-design of the reference `System` class (src/System.cc:49-1530,
include/System.h:70-186): owns the Atlas, tracker, loop closer and
keyframe database; exposes per-frame Track* calls with input
pre-processing (RGB->gray, resize), mode switches (localization-only),
reset, shutdown with per-stage timing stats, trajectory export in
TUM/EuRoC/KITTI formats, and Atlas checkpoint/resume.

The reference's four OS threads become the synchronous stage pipeline
inside Tracker (tracking -> mapping -> loop closing run as async XLA
dispatches sharing the SoA map arrays); System stays a thin host shell.
"""

from __future__ import annotations

import logging
import time

import numpy as np

from ..utils import timers as timers_mod
from ..utils.settings import Settings, load_settings
from ..utils.trajectory import write_kitti, write_tum
from .tracker import ImuSettings, Sensor, Tracker, TrackerConfig, TrackState
from . import checkpoint

log = logging.getLogger("orbslam3_tpu.system")


class System:
    """System(settings, sensor) -> track_*(...) -> shutdown().

    `settings` is a Settings object or a path to a "File.version 1.0"
    YAML (the reference's per-dataset configs)."""

    def __init__(
        self,
        settings: Settings | str,
        sensor: Sensor,
        use_viewer: bool = False,
        load_atlas: str | None = None,
        async_mapping: bool = True,
        live_viewer: bool = False,
        live_viewer_port: int = 0,
    ):
        if isinstance(settings, str):
            settings = load_settings(settings)
        self.settings = settings
        self.sensor = sensor
        from ..ops.orb import OrbParams

        s = settings
        width = s.new_width or s.width
        height = s.new_height or s.height
        self._resize = (
            (height, width) if (s.new_width or s.new_height) else None
        )
        self._scale_x = width / s.width
        self._scale_y = height / s.height
        cam = s.camera
        if self._resize:
            cam = cam.scaled(self._scale_x, self._scale_y)
        # Unrectified pinhole stereo rig (raw EuRoC stereo): precompute
        # rectification maps and switch to the rectified linear
        # intrinsics, like Settings::precomputeRectificationMaps
        # (src/Settings.cc:458-530). Images are remapped per frame in
        # track_stereo (System::TrackStereo, src/System.cc:282-301).
        self._rect = None
        imu_Tbc = s.imu.Tbc if s.imu is not None else None
        if (
            s.left_rect is not None
            and s.right_rect is not None
            and sensor in (Sensor.STEREO, Sensor.IMU_STEREO)
        ):
            # Legacy explicit rectification: LEFT./RIGHT. K,D,R,P blocks
            # (Examples_old stereo configs; the old examples called
            # cv::initUndistortRectifyMap themselves). Camera.* already
            # holds the rectified intrinsics; Tbc is already expressed in
            # the rectified left camera.
            from ..utils.rectify import (
                StereoRectification, init_undistort_rectify_map,
            )

            S = np.diag([self._scale_x, self._scale_y, 1.0])
            lr, rr = s.left_rect, s.right_rect
            P1 = S @ np.asarray(lr["P"], np.float64)
            P2 = S @ np.asarray(rr["P"], np.float64)
            m1 = init_undistort_rectify_map(
                S @ np.asarray(lr["K"], np.float64), lr["D"],
                np.asarray(lr["R"], np.float64), P1[:3, :3], (height, width),
            )
            m2 = init_undistort_rectify_map(
                S @ np.asarray(rr["K"], np.float64), rr["D"],
                np.asarray(rr["R"], np.float64), P2[:3, :3], (height, width),
            )
            f_new = float(P1[0, 0])
            bf_legacy = (
                (s.bf or 0.0) * self._scale_x or -float(P2[0, 3])
            )
            self._rect = StereoRectification(
                R1=np.asarray(lr["R"], np.float64),
                R2=np.asarray(rr["R"], np.float64),
                K_new=P1[:3, :3], baseline=bf_legacy / f_new, bf=bf_legacy,
                map1_x=m1[0], map1_y=m1[1], map2_x=m2[0], map2_y=m2[1],
            )
        elif (
            s.camera2 is not None
            and s.camera_type == "PinHole"
            and sensor in (Sensor.STEREO, Sensor.IMU_STEREO)
        ):
            from ..ops.camera import Camera as _Camera
            from ..utils.rectify import stereo_rectify

            cam2 = s.camera2
            if self._resize:
                cam2 = cam2.scaled(self._scale_x, self._scale_y)

            def _K(c):
                return np.array(
                    [
                        [float(c.fx), 0.0, float(c.cx)],
                        [0.0, float(c.fy), float(c.cy)],
                        [0.0, 0.0, 1.0],
                    ]
                )

            rect = stereo_rectify(
                _K(cam), np.asarray(cam.dist, np.float64),
                _K(cam2), np.asarray(cam2.dist, np.float64),
                np.asarray(s.Tlr, np.float64), (height, width),
            )
            self._rect = rect
            cam = _Camera.pinhole(
                rect.K_new[0, 0], rect.K_new[1, 1],
                rect.K_new[0, 2], rect.K_new[1, 2],
            )
            # Rectification rotates camera 1 by R1: the body-from-camera
            # extrinsic must follow (Tbc = Tbc * T_r1_u1^-1,
            # src/Settings.cc:524-530).
            if imu_Tbc is not None:
                T_u1_r1 = np.eye(4)
                T_u1_r1[:3, :3] = np.asarray(rect.R1).T
                imu_Tbc = np.asarray(imu_Tbc, np.float64) @ T_u1_r1
        imu_cfg = None
        if sensor in (Sensor.IMU_MONOCULAR, Sensor.IMU_STEREO, Sensor.IMU_RGBD):
            if s.imu is None:
                raise ValueError("inertial sensor requires IMU settings")
            imu_cfg = ImuSettings(
                noise_gyro=s.imu.noise_gyro,
                noise_acc=s.imu.noise_acc,
                walk_gyro=s.imu.walk_gyro,
                walk_acc=s.imu.walk_acc,
                freq=s.imu.frequency,
                Tbc=np.asarray(imu_Tbc, np.float32),
            )
        bf = (s.bf or 0.0) * self._scale_x
        if self._rect is not None:
            bf = self._rect.bf
        # Unrectified fisheye rig (TUM-VI): Camera2 + Stereo.T_c1_c2
        # (left-from-right). The tracker wants T_rl (right-from-left =
        # inverse) and bf derived from the baseline (Settings.cc computes
        # b = |t_c1_c2|, bf = b * fx when no Camera.bf key).
        fisheye_kw = {}
        if (
            s.camera2 is not None
            and s.camera_type == "KannalaBrandt8"
            and sensor in (Sensor.STEREO, Sensor.IMU_STEREO)
        ):
            T12 = np.asarray(s.Tlr, np.float64)  # x_l = R12 x_r + t12
            R_rl = T12[:3, :3].T
            t_rl = -R_rl @ T12[:3, 3]
            cam2 = s.camera2
            if self._resize:
                cam2 = cam2.scaled(self._scale_x, self._scale_y)
            if not bf:
                bf = float(np.linalg.norm(T12[:3, 3])) * float(cam.K[0, 0])
            fisheye_kw = dict(
                camera2=cam2,
                R_rl=R_rl.astype(np.float32),
                t_rl=t_rl.astype(np.float32),
                lapping_l=tuple(s.lapping1 or (0.0, 1e9)),
                lapping_r=tuple(s.lapping2 or (0.0, 1e9)),
            )
        th_depth = 0.0
        if s.stereo_th_depth and bf:
            # mThDepth = bf * ThDepth / fx (src/Settings.cc & Tracking.cc).
            th_depth = bf * s.stereo_th_depth / float(cam.K[0, 0])
        cfg = TrackerConfig(
            camera=cam,
            width=width,
            height=height,
            sensor=sensor,
            orb=OrbParams(
                n_features=s.n_features,
                n_levels=s.n_levels,
                scale_factor=s.scale_factor,
                th_fast_high=float(s.ini_th_fast),
                th_fast_low=float(s.min_th_fast),
            ),
            bf=bf,
            th_depth=th_depth,
            depth_factor=(
                1.0 / s.depth_map_factor if s.depth_map_factor else 1.0
            ),
            imu=imu_cfg,
            kf_max_interval=int(round(s.fps)) if s.fps else 30,
            async_mapping=async_mapping,
            **fisheye_kw,
        )
        self.tracker = Tracker(cfg)
        # Rendering is offline (utils/viewer): snapshots + map exports
        # written under viewer_out/, the headless analog of the Pangolin
        # viewer thread (src/System.cc:259).
        self.use_viewer = use_viewer
        self.viewer = None
        if use_viewer:
            from ..utils.viewer import Viewer as _Viewer

            self.viewer = _Viewer("viewer_out", frame_every=30)
        # Live viewer: localhost HTTP analog of the Pangolin viewer
        # thread (src/System.cc:259; utils/live_viewer.py).
        self.live_viewer = None
        if live_viewer:
            from ..utils.live_viewer import LiveViewer

            self.live_viewer = LiveViewer(port=live_viewer_port)
            self.live_viewer.state_provider = self._live_state
        self.timers = timers_mod.StageTimers()
        self._shutdown = False
        if load_atlas or s.load_atlas:
            self._load_atlas(load_atlas or s.load_atlas)

    # ------------------------------------------------------------------
    # Per-frame entry points (System::TrackMonocular/Stereo/RGBD)
    # ------------------------------------------------------------------

    def _preprocess(self, img: np.ndarray) -> np.ndarray:
        if img.ndim == 3:  # RGB/BGR -> gray (cvtColor in Track*)
            img = img @ np.array([0.299, 0.587, 0.114], img.dtype)
        if self._resize is not None and img.shape != self._resize:
            import jax.numpy as jnp

            from ..ops.image import resize_bilinear

            img = np.asarray(
                resize_bilinear(jnp.asarray(img, jnp.float32), self._resize)
            )
        return np.ascontiguousarray(img, np.float32)

    def track_monocular(
        self, img: np.ndarray, timestamp: float, imu: np.ndarray | None = None
    ) -> np.ndarray | None:
        if self._shutdown:
            raise RuntimeError("System was shut down")
        t0 = time.perf_counter()
        img_p = self._preprocess(img)
        T = self.tracker.track(img_p, timestamp, imu=imu)
        self.timers.add("track_total", time.perf_counter() - t0)
        self._viewer_update(img_p)
        return T

    def _remap_pair(self, img_l: np.ndarray, img_r: np.ndarray):
        """On-device stereo rectification (the cv::remap calls of
        System::TrackStereo, src/System.cc:282-301)."""
        import jax
        import jax.numpy as jnp

        from ..ops.image import remap_bilinear

        if not hasattr(self, "_rect_maps"):
            r = self._rect
            self._rect_maps = tuple(
                jnp.asarray(m)
                for m in (r.map1_x, r.map1_y, r.map2_x, r.map2_y)
            )
            self._remap_jit = jax.jit(remap_bilinear)
        m1x, m1y, m2x, m2y = self._rect_maps
        out_l = self._remap_jit(jnp.asarray(img_l), m1x, m1y)
        out_r = self._remap_jit(jnp.asarray(img_r), m2x, m2y)
        return np.asarray(out_l), np.asarray(out_r)

    def track_stereo(
        self,
        img_left: np.ndarray,
        img_right: np.ndarray,
        timestamp: float,
        imu: np.ndarray | None = None,
    ) -> np.ndarray | None:
        if self._shutdown:
            raise RuntimeError("System was shut down")
        t0 = time.perf_counter()
        img_l = self._preprocess(img_left)
        img_r = self._preprocess(img_right)
        if self._rect is not None:
            img_l, img_r = self._remap_pair(img_l, img_r)
        T = self.tracker.track_stereo(
            img_l, img_r, timestamp, imu=imu,
        )
        self.timers.add("track_total", time.perf_counter() - t0)
        self._viewer_update(img_l)
        return T

    def track_rgbd(
        self,
        img: np.ndarray,
        depth: np.ndarray,
        timestamp: float,
        imu: np.ndarray | None = None,
    ) -> np.ndarray | None:
        if self._shutdown:
            raise RuntimeError("System was shut down")
        t0 = time.perf_counter()
        depth = np.asarray(depth, np.float32)
        if self._resize is not None and depth.shape != self._resize:
            import jax.numpy as jnp

            from ..ops.image import resize_bilinear

            depth = np.asarray(
                resize_bilinear(jnp.asarray(depth), self._resize)
            )
        T = self.tracker.track_rgbd(
            self._preprocess(img), depth, timestamp, imu=imu
        )
        self.timers.add("track_total", time.perf_counter() - t0)
        return T

    # ------------------------------------------------------------------
    # Mode switches / state (ActivateLocalizationMode, GetTrackingState)
    # ------------------------------------------------------------------

    def activate_localization_mode(self):
        """Camera-only tracking; mapping is paused
        (System::ActivateLocalizationMode, src/System.cc:540)."""
        self.tracker.flush_mapping()
        self.tracker.localization_only = True

    def deactivate_localization_mode(self):
        self.tracker.localization_only = False

    def get_tracking_state(self) -> TrackState:
        return self.tracker.state

    def change_dataset(self):
        """System::ChangeDataset (src/System.cc:1412): call between
        sequences of a multi-sequence run."""
        self.tracker.new_dataset()

    def reset(self):
        """System::Reset: drop everything and start over."""
        cfg = self.tracker.cfg
        if self.tracker.worker is not None:
            self.tracker.worker.stop()
        self.tracker = Tracker(cfg)

    def reset_active_map(self):
        self.tracker._spawn_or_reset_map()

    def is_lost(self) -> bool:
        return self.tracker.state in (TrackState.LOST, TrackState.RECENTLY_LOST)

    def is_shutdown(self) -> bool:
        """System::isShutDown (include/System.h:129)."""
        return self._shutdown

    def map_changed(self) -> bool:
        """System::MapChanged (include/System.h:119): true once per big
        map change (loop closure / global BA / IMU init rescale)."""
        idx = self.tracker.map.big_change_idx
        if idx > getattr(self, "_last_big_change", 0):
            self._last_big_change = idx
            return True
        return False

    def get_image_scale(self) -> float:
        """System::GetImageScale: resize factor applied to inputs."""
        return float(self._scale_x)

    def get_time_from_imu_init(self) -> float:
        """Seconds since the active map's IMU initialization
        (System::GetTimeFromIMUInit); 0.0 if not initialized."""
        tr = self.tracker
        m = tr.map
        if not tr.inertial or m.imu_stage < 1 or m.imu_t0 < 0:
            return 0.0
        if tr.last is None:
            return 0.0
        return float(tr.last.timestamp - m.imu_t0)

    def get_tracked_map_points(self) -> np.ndarray:
        """Landmark indices bound to the current frame's features, -1
        where unbound (System::GetTrackedMapPoints)."""
        f = self.tracker.last
        if f is None:
            return np.zeros(0, np.int32)
        return f.lm_idx.copy()

    def get_tracked_keypoints_un(self) -> np.ndarray:
        """Undistorted keypoints of the current frame (N,2)
        (System::GetTrackedKeyPointsUn)."""
        f = self.tracker.last
        if f is None:
            return np.zeros((0, 2), np.float32)
        return f.xy.copy()

    @property
    def atlas(self):
        return self.tracker.atlas

    # ------------------------------------------------------------------
    # Trajectory export (SaveTrajectoryTUM/EuRoC/KITTI, src/System.cc:628+)
    # ------------------------------------------------------------------

    def save_trajectory_tum(self, path: str):
        ts, Twc = self.tracker.export_trajectory()
        write_tum(path, ts, Twc)

    def save_keyframe_trajectory_tum(self, path: str):
        m = self.tracker.map
        ks = np.nonzero(m.kf_valid)[0]
        ks = ks[np.argsort(m.kf_timestamp[ks])]
        Twc = np.tile(np.eye(4), (len(ks), 1, 1))
        for i, k in enumerate(ks):
            Twc[i, :3, :3] = m.kf_R[k].T
            Twc[i, :3, 3] = -m.kf_R[k].T @ m.kf_t[k]
        write_tum(path, m.kf_timestamp[ks], Twc)

    def save_keyframe_trajectory_euroc(self, path: str):
        """System::SaveKeyFrameTrajectoryEuRoC (src/System.cc:1096):
        keyframe poses, body frame when inertial."""
        m = self.tracker.map
        ks = np.nonzero(m.kf_valid)[0]
        ks = ks[np.argsort(m.kf_timestamp[ks])]
        Twc = np.tile(np.eye(4), (len(ks), 1, 1))
        for i, k in enumerate(ks):
            Twc[i, :3, :3] = m.kf_R[k].T
            Twc[i, :3, 3] = -m.kf_R[k].T @ m.kf_t[k]
        if self.tracker.inertial:
            Tbc = np.eye(4, dtype=np.float64)
            Tbc[:3, :3] = self.tracker.Rbc
            Tbc[:3, 3] = self.tracker.tbc
            Twc = Twc @ np.linalg.inv(Tbc)[None]
        write_tum(path, m.kf_timestamp[ks], Twc)

    def save_trajectory_euroc(self, path: str):
        """EuRoC convention: body poses when inertial, camera otherwise,
        TUM line format (SaveTrajectoryEuRoC, src/System.cc:723)."""
        ts, Twc = self.tracker.export_trajectory()
        if self.tracker.inertial:
            Tbc = np.eye(4, dtype=np.float64)
            Tbc[:3, :3] = self.tracker.Rbc
            Tbc[:3, 3] = self.tracker.tbc
            Twc = Twc @ np.linalg.inv(Tbc)[None]
        write_tum(path, ts, Twc)

    def save_trajectory_kitti(self, path: str):
        ts, Twc = self.tracker.export_trajectory()
        write_kitti(path, Twc)

    # ------------------------------------------------------------------
    # Atlas persistence (SaveAtlas/LoadAtlas)
    # ------------------------------------------------------------------

    def save_atlas(self, path: str):
        self.tracker.flush_mapping()
        kfdb = self.tracker.kfdb
        extra = {
            "sensor": self.sensor.name,
            "kfdb_seed": kfdb._seed,
            "kfdb_n_words": kfdb.n_words,
        }
        checkpoint.save_atlas(self.tracker.atlas, path, extra=extra)
        log.info("atlas saved to %s", path)

    def _load_atlas(self, path: str):
        tr = self.tracker
        atlas, extra = checkpoint.load_atlas(path, imu_calib=tr.imu_calib)
        if extra.get("kfdb_seed") is not None and (
            extra["kfdb_seed"] != tr.kfdb._seed
            or extra["kfdb_n_words"] != tr.kfdb.n_words
        ):
            # The reference refuses an atlas bound to a different
            # vocabulary (MD5 check, src/System.cc:1532).
            raise ValueError("atlas was built with a different retrieval codebook")
        tr.atlas = atlas
        if tr.loop_closer is not None:
            tr.loop_closer.atlas = atlas
        # Rebuild the keyframe database from stored descriptors.
        tr.kfdb.clear()
        for m in atlas.maps:
            for k in np.nonzero(m.kf_valid)[0]:
                bits = np.unpackbits(
                    m.kf_desc[k].view(np.uint8), axis=-1, bitorder="little"
                ).astype(np.int8)
                tr.kfdb.add(
                    tr._gid(int(k), m.map_id), bits, m.kf_feat_valid[k]
                )
        # Resume tracking by relocalization against the loaded map.
        tr.state = TrackState.LOST
        tr.last = None
        tr.init_ref = None
        log.info(
            "atlas loaded from %s: %d maps, active map %d (%d KFs)",
            path, atlas.n_maps(), atlas.active.map_id,
            atlas.active.n_keyframes(),
        )

    # ------------------------------------------------------------------
    # Shutdown
    # ------------------------------------------------------------------

    def _viewer_update(self, img: np.ndarray):
        if self.viewer is None and self.live_viewer is None:
            return
        f = self.tracker.last
        if f is None:
            return
        if self.viewer is not None:
            self.viewer.update(
                img, f.xy, f.valid, f.lm_idx >= 0,
                state=self.tracker.state.name,
            )
        if self.live_viewer is not None:
            self.live_viewer.push_frame(
                img, f.xy, f.valid, f.lm_idx >= 0,
                self.tracker.state.name, f.frame_id,
            )

    def _live_state(self) -> dict:
        """Map snapshot for the live viewer (called on its HTTP thread;
        short lock hold, numpy copies only — FrameDrawer::Update/
        MapDrawer snapshot semantics)."""
        tr = self.tracker
        with tr.map_lock:
            m = tr.map
            kf = np.nonzero(m.kf_valid)[0]
            kf = kf[np.argsort(m.kf_timestamp[kf])]
            centers = -np.einsum("kji,kj->ki", m.kf_R[kf], m.kf_t[kf])
            pts = m.lm_pos[m.lm_valid].copy()
            n_loops = tr.loop_closer.n_loops_closed if tr.loop_closer else 0
        return {
            "points": pts, "traj": centers,
            "n_keyframes": len(kf), "n_landmarks": len(pts),
            "n_loops": int(n_loops),
        }

    def shutdown(self, save_atlas_path: str | None = None):
        """System::Shutdown: stop the mapping pipeline, optionally
        checkpoint, print timing stats (Tracking::PrintTimeStats analog;
        the thread-finish handshake of src/System.cc:576-621)."""
        if self.tracker.worker is not None:
            self.tracker.worker.stop()
            self.tracker.worker = None
        if self.live_viewer is not None:
            self.live_viewer.stop()
            self.live_viewer = None
        if self.viewer is not None:
            m = self.tracker.map
            # Camera centers: c = -R^T t per keyframe.
            kf = m.kf_valid
            centers = -np.einsum("kji,kj->ki", m.kf_R[kf], m.kf_t[kf])
            self.viewer.finalize(m.lm_pos, centers, point_mask=m.lm_valid)
        if save_atlas_path or self.settings.save_atlas:
            self.save_atlas(save_atlas_path or self.settings.save_atlas)
        stats = self.timers.summary()
        tr_stats = self.tracker.timers.summary()
        for name, s in {**stats, **tr_stats}.items():
            log.info(
                "%-16s mean %.2f ms  p95 %.2f ms  (%d calls)",
                name, s["mean_ms"], s["p95_ms"], s["count"],
            )
        self._shutdown = True
        return {**stats, **tr_stats}
