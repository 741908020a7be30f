"""Monocular TUM-VI driver (reference Examples/Monocular/mono_tum_vi.cc):
512x512 Kannala-Brandt fisheye, vision only (scale is arbitrary —
evaluate with scaled ATE).

Usage: python examples/mono_tumvi.py TUM-VI.yaml /data/tumvi room1
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from examples.common import base_parser, finish, pace, setup_logging, viewer_kwargs
from orbslam3_cpp_fork_tpu.datasets import tumvi
from orbslam3_cpp_fork_tpu.runtime.system import System
from orbslam3_cpp_fork_tpu.runtime.tracker import Sensor


def main():
    args = base_parser(__doc__).parse_args()
    setup_logging(args.log_level)
    slam = System(args.settings, Sensor.MONOCULAR, load_atlas=args.load_atlas,
                  **viewer_kwargs(args))
    for si, seq_name in enumerate(args.sequence):
        if si:
            slam.change_dataset()
        seq = tumvi.load_sequence(args.dataset_root, seq_name, args.timestamps)
        wall = t_prev = None
        n = len(seq.image_paths) if args.max_frames is None else args.max_frames
        for i in range(n):
            t = float(seq.timestamps[i])
            img = tumvi.load_gray(seq.image_paths[i])
            if args.realtime:
                wall = pace(t_prev, t, wall)
            slam.track_monocular(img, t)
            t_prev = t
    finish(slam, args)


if __name__ == "__main__":
    main()
