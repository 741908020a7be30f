"""Paced async run: per-segment ATE residuals after scale alignment."""
import time, numpy as np
from orbslam3_cpp_fork_tpu.datasets import synthetic
from orbslam3_cpp_fork_tpu.ops.camera import Camera
from orbslam3_cpp_fork_tpu.ops.orb import OrbParams
from orbslam3_cpp_fork_tpu.runtime.tracker import Tracker, TrackerConfig
from orbslam3_cpp_fork_tpu.utils.evaluation import ate_rmse, align_umeyama

H, W = 480, 752
n_frames = 300
scene = synthetic.make_ring_scene(seed=7, n_points=1200, size_range=(9, 15), width=W, height=H)
Rs, ts = synthetic.circle_trajectory(n_frames=n_frames, radius=2.5, total_angle=2.3 * np.pi)
frames = [synthetic.render_frame(scene, Rs[i], ts[i]) for i in range(n_frames)]
cam = Camera.pinhole(scene.K[0, 0], scene.K[1, 1], scene.K[0, 2], scene.K[1, 2])
cfg = TrackerConfig(camera=cam, width=W, height=H, orb=OrbParams(n_features=1000),
                    enable_loop_closing=True, async_mapping=True)

def run(paced):
    tr = Tracker(cfg)
    stamps = np.arange(n_frames) * 0.05
    t0 = time.perf_counter()
    for i in range(n_frames):
        if paced:
            dt = float(stamps[i]) - (time.perf_counter() - t0)
            if dt > 0: time.sleep(dt)
        tr.track(frames[i], float(stamps[i]))
    tr.flush_mapping()
    if tr.worker: tr.worker.stop()
    return tr, stamps

run(False)
tr, stamps = run(True)
ts_est, Twc = tr.export_trajectory()
res = ate_rmse(np.asarray(ts_est), Twc[:, :3, 3], stamps, ts)
print(f"paced: {len(ts_est)}/300, KFs={tr.map.n_keyframes()}, lost={tr.n_lost_events}, "
      f"maps={len(tr.atlas.maps)}, loops={tr.loop_closer.n_loops_closed}, "
      f"ATE={res.rmse_scaled:.4f} over {res.n_pairs}")
# Per-segment residuals using one global scale alignment
est_t = {round(float(t), 3): p for t, p in zip(ts_est, Twc[:, :3, 3])}
pairs = [(i, est_t[round(float(stamps[i]), 3)]) for i in range(n_frames)
         if round(float(stamps[i]), 3) in est_t]
idx = np.array([p[0] for p in pairs])
E = np.array([p[1] for p in pairs]); G = ts[idx]
s, R, t = align_umeyama(E, G, with_scale=True)
resid = np.linalg.norm((s * E @ R.T + t) - G, axis=1)
for lo in range(0, 300, 30):
    sel = (idx >= lo) & (idx < lo + 30)
    if sel.any():
        print(f"frames {lo:3d}-{lo+29:3d}: n={sel.sum():2d} resid med={np.median(resid[sel]):.3f} max={resid[sel].max():.3f}")

# Retrieval health probe: query late-KF signatures without exclusion;
# where do the physically-overlapping early KFs rank?
m = tr.map
kfdb = tr.kfdb
valid = np.nonzero(m.kf_valid)[0]
fids = m.kf_frame_id[valid]
late = valid[fids >= 262]  # past 2*pi: genuinely revisiting the start
early = set(int(x) for x in valid[fids <= 40])
print("late KFs:", [int(x) for x in late[:8]], "early:", sorted(early)[:10])
for k in late[:8]:
    bits = np.unpackbits(m.kf_desc[k].view(np.uint8), axis=-1,
                         bitorder="little").astype(np.int8)
    hist = kfdb.histogram(bits, m.kf_feat_valid[k])
    ids, sc = kfdb.query(hist, n_best=10, min_score=-1.0)
    ranked = [(int(i) % m.cfg.max_keyframes, round(float(s), 3)) for i, s in zip(ids, sc)]
    hit = [r for r, (i, s) in enumerate(ranked) if i in early]
    print(f"KF {int(k)} (frame {int(m.kf_frame_id[k])}): top10={ranked[:6]} early_rank={hit[:3]}")

# KF-pose ATE probe: are the CORRECTED keyframe poses good while the
# exported per-frame trajectory is not (export bug), or both drifted?
valid = np.nonzero(m.kf_valid)[0]
kf_fid = m.kf_frame_id[valid]
centers = -np.einsum("kji,kj->ki", m.kf_R[valid], m.kf_t[valid])
Gk = ts[np.clip(kf_fid, 0, n_frames - 1)]
s2, R2, t2 = align_umeyama(centers, Gk, with_scale=True)
res2 = np.linalg.norm((s2 * centers @ R2.T + t2) - Gk, axis=1)
print(f"KF-pose ATE: rmse={float(np.sqrt((res2**2).mean())):.4f} "
      f"med={np.median(res2):.4f} n={len(res2)}")

# Per-record anatomy: does exported-frame error correlate with the
# frame->refKF distance (stale-scale relative transforms)?
rec = {fid: (mid, k, R_cr, t_cr) for fid, t, mid, k, R_cr, t_cr in tr.trajectory}
errs = []
for j, i in enumerate(idx):
    if i in rec:
        mid, k, R_cr, t_cr = rec[i]
        gap = abs(int(i) - int(m.kf_frame_id[k])) if m.kf_valid[k] else -1
        errs.append((float(resid[j]), int(i), int(k), gap, float(np.linalg.norm(t_cr))))
errs.sort(reverse=True)
print("worst exported records: (resid, frame, refKF, frame-gap, |t_cr|)")
for e in errs[:12]:
    print("  %.3f f=%d k=%d gap=%d |t_cr|=%.3f" % e)
gaps = np.array([e[3] for e in errs]); rr = np.array([e[0] for e in errs])
print("corr(resid, gap) =", np.corrcoef(rr, gaps)[0, 1].round(3))
