"""Atlas checkpoint/resume.

Replaces the reference's Boost-serialization Atlas persistence
(System::SaveAtlas/LoadAtlas, src/System.cc:1440-1530; Atlas::PreSave/
PostLoad, src/Atlas.cc:271-318) with a single .npz archive:

- every MapState array field is dumped verbatim (the SoA layout IS the
  serialization format — no pointer swizzling needed),
- per-map scalars (map_id, imu_stage, imu_t0) and Atlas metadata ride in
  a JSON header,
- the reference's vocabulary-MD5 binding (src/System.cc:1532) becomes a
  retrieval-codebook fingerprint check: a checkpoint is only loadable
  into a KeyFrameDatabase built from the same codebook seed/shape.

The keyframe database itself is NOT stored: it is rebuilt from the
stored keyframe descriptors on load, mirroring the reference's KFDB
re-attachment after LoadAtlas (src/System.cc:1524-1526).
"""

from __future__ import annotations

import json

import numpy as np

from ..models.atlas import Atlas
from ..models.map_state import MapConfig, MapState

FORMAT_VERSION = 1


def save_atlas(atlas: Atlas, path: str, extra: dict | None = None):
    """Serialize all maps of the Atlas to one .npz file (.osa analog)."""
    arrays: dict[str, np.ndarray] = {}
    maps_meta = []
    for i, m in enumerate(atlas.maps):
        fields = {
            k: v for k, v in vars(m).items() if isinstance(v, np.ndarray)
        }
        for k, v in fields.items():
            arrays[f"m{i}.{k}"] = v
        maps_meta.append(
            {
                "map_id": m.map_id,
                "imu_stage": m.imu_stage,
                "imu_t0": m.imu_t0,
                "array_fields": sorted(fields.keys()),
            }
        )
    header = {
        "version": FORMAT_VERSION,
        "n_maps": len(atlas.maps),
        "active_idx": atlas.active_idx,
        "next_map_id": atlas._next_map_id,
        "cfg": {
            "max_keyframes": atlas.cfg.max_keyframes,
            "max_landmarks": atlas.cfg.max_landmarks,
            "n_features": atlas.cfg.n_features,
            "imu_cap": atlas.cfg.imu_cap,
        },
        "maps": maps_meta,
        "extra": extra or {},
    }
    arrays["__header__"] = np.frombuffer(
        json.dumps(header).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def load_atlas(path: str, imu_calib=None) -> tuple[Atlas, dict]:
    """Rebuild an Atlas from a checkpoint. Returns (atlas, extra)."""
    z = np.load(path)
    header = json.loads(bytes(z["__header__"]).decode())
    if header["version"] != FORMAT_VERSION:
        raise ValueError(f"unsupported atlas format {header['version']}")
    cfg = MapConfig(**header["cfg"])
    atlas = Atlas(cfg, imu_calib=imu_calib)
    atlas.maps = []
    for i, meta in enumerate(header["maps"]):
        m = MapState(cfg, map_id=meta["map_id"])
        m._imu_calib = imu_calib
        m.imu_stage = meta["imu_stage"]
        m.imu_t0 = meta["imu_t0"]
        for k in meta["array_fields"]:
            arr = z[f"m{i}.{k}"]
            cur = getattr(m, k)
            if cur.shape != arr.shape or cur.dtype != arr.dtype:
                raise ValueError(
                    f"checkpoint field {k} mismatch: {arr.shape}/{arr.dtype}"
                    f" vs {cur.shape}/{cur.dtype}"
                )
            setattr(m, k, arr.copy())
        m.mark_obs_dirty()  # restored obs bypassed the native graph mirror
        atlas.maps.append(m)
    atlas.active_idx = header["active_idx"]
    atlas._next_map_id = header["next_map_id"]
    return atlas, header.get("extra", {})
