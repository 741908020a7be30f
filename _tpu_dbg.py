import numpy as np
from orbslam3_cpp_fork_tpu.datasets import synthetic
from orbslam3_cpp_fork_tpu.ops.camera import Camera
from orbslam3_cpp_fork_tpu.ops.orb import OrbParams
from orbslam3_cpp_fork_tpu.runtime.tracker import Tracker, TrackerConfig
H,W=480,752
scene=synthetic.make_ring_scene(seed=7,n_points=1200,size_range=(9,15),width=W,height=H)
n=150
Rs,ts=synthetic.circle_trajectory(n_frames=n,radius=2.5,total_angle=2.3*np.pi)
frames=[synthetic.render_frame(scene,Rs[i],ts[i]) for i in range(n)]
cam=Camera.pinhole(scene.K[0,0],scene.K[1,1],scene.K[0,2],scene.K[1,2])
cfg=TrackerConfig(camera=cam,width=W,height=H,orb=OrbParams(n_features=1000),enable_loop_closing=True,async_mapping=True)
tr=Tracker(cfg)
orig_disp=Tracker._track_frame_pipelined
def disp(self,frame):
    restart=self._chain is None
    r=orig_disp(self,frame)
    print(f'disp f{frame.frame_id} restart={restart} pipe={len(self._pipe)}',flush=True)
    return r
orig_ret=Tracker._retire_oldest
def ret(self):
    f,out,ids=self._pipe[0]
    nin=int(np.asarray(out['n_inliers'])); ns1=int(np.asarray(out['n_stage1'])); ok=bool(np.asarray(out['ok']))
    print(f'  retire f{f.frame_id} n_in={nin} n_s1={ns1} ok={ok}',flush=True)
    return orig_ret(self)
Tracker._track_frame_pipelined=disp
Tracker._retire_oldest=ret
orig_fin=Tracker._finish_tracked_frame
def fin(self,frame,n_in):
    print(f'  finish f{frame.frame_id} n_in={n_in}',flush=True)
    return orig_fin(self,frame,n_in)
Tracker._finish_tracked_frame=fin
for i,img in enumerate(frames):
    tr.track(img,i*0.05)
tr.flush_mapping()
print('state',tr.state,'lost',tr.n_lost_events)
