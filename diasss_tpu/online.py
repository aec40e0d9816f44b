"""Online (incremental) SLAM — the iSAM2 *interface* equivalent.

The reference streams pings into iSAM2 and can read back the current estimate
after every update (optimizer.cpp:264-268).  Our batch solver reaches the same
fixed point offline; this module restores the *incremental interface*: frames
arrive one at a time, and after each arrival the full graph is re-solved
**warm-started** from the previous estimate — the LM typically needs only a few
iterations because only the new frame's poses are far from the optimum.

Static-shape strategy: pose capacity is pre-allocated per frame count; each
``add_frame`` re-runs the jitted solver at the new (P, K) shape.  For surveys
with equal-length lines every step reuses one compiled program per frame count
(shapes grow deterministically), and warm starting cuts LM iterations ~3-10x
versus cold solves.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import PipelineConfig
from .frame import Keyframe
from .geometry import se3
from .pairs import get_kps_pairs
from .pipeline import _overlap_pairs
from .solvers.lc import loop_closing_tfs
from .solvers.pose_graph import build_chain_graph, solve_pose_graph


@dataclasses.dataclass
class OnlineState:
    frames: List[Keyframe]
    poses: Optional[se3.Pose3]  # current estimate over all frames
    frame_slices: List[slice]
    n_lc: int


class OnlineSlam:
    """Incremental front-end over the batched solvers.

    Usage::

        slam = OnlineSlam(cfg)
        for line in survey.lines:
            est = slam.add_frame(build_keyframe(...))  # poses after this frame
    """

    def __init__(self, cfg: PipelineConfig = PipelineConfig()):
        self.cfg = cfg
        self.state = OnlineState(frames=[], poses=None, frame_slices=[], n_lc=0)

    def add_frame(self, frame: Keyframe) -> se3.Pose3:
        cfg = self.cfg
        st = self.state
        st.frames.append(frame)
        offsets = np.cumsum([0] + [int(f.dr_poses.shape[0]) for f in st.frames])
        st.frame_slices = [
            slice(int(offsets[k]), int(offsets[k + 1])) for k in range(len(st.frames))
        ]

        # pairs involving any frame (the LC mini-solves are cheap enough to
        # recompute only for pairs that involve the NEW frame)
        pair_ids = _overlap_pairs(st.frames, cfg.min_overlap)
        new_idx = len(st.frames) - 1
        new_pairs = [p for p in pair_ids if new_idx in p]

        lc_i: List[int] = []
        lc_j: List[int] = []
        lc_R: List[np.ndarray] = []
        lc_t: List[np.ndarray] = []
        lc_sig: List[np.ndarray] = []
        if not hasattr(self, "_accepted"):
            self._accepted = []  # [(gid_s, gid_t, R, t, sig)]  — grows per frame

        for (i, j) in new_pairs:
            kp = get_kps_pairs(
                st.frames[i].annos,
                st.frames[j].img_id,
                np.asarray(st.frames[i].altitudes),
                np.asarray(st.frames[i].ground_ranges),
                np.asarray(st.frames[j].altitudes),
                np.asarray(st.frames[j].ground_ranges),
                use_anno=cfg.pose_graph.use_anno,
                nadir_threshold=cfg.loop_closure.nadir_threshold,
            )
            if not kp.valid.any():
                continue
            res = loop_closing_tfs(
                jnp.asarray(kp.pairs),
                jnp.asarray(kp.valid),
                st.frames[i].dr_poses,
                st.frames[j].dr_poses,
                st.frames[i].geo,
                st.frames[j].geo,
                st.frames[i].altitudes,
                st.frames[j].altitudes,
                st.frames[j].ground_ranges,
                n_bins=st.frames[i].raw.shape[1],
                kp_cfg=cfg.kp_noise,
                cfg=cfg.loop_closure,
            )
            q = np.asarray(res.quality)
            var = np.asarray(res.variance6)
            Rm = np.asarray(res.rel_pose.R)
            tm = np.asarray(res.rel_pose.t)
            for k in range(len(q)):
                if not kp.valid[k] or not (q[k] > 0) or not np.all(np.isfinite(var[k])):
                    continue
                self._accepted.append(
                    (
                        int(offsets[i] + kp.pairs[k, 0]),
                        int(offsets[j] + kp.pairs[k, 3]),
                        Rm[k],
                        tm[k],
                        np.sqrt(np.maximum(var[k], 1e-12)),
                    )
                )

        dr_rows = [np.asarray(f.dr_poses) for f in st.frames]
        if self._accepted:
            lc_i = np.asarray([a[0] for a in self._accepted], np.int32)
            lc_j = np.asarray([a[1] for a in self._accepted], np.int32)
            lc_meas = se3.Pose3(
                jnp.asarray(np.stack([a[2] for a in self._accepted])),
                jnp.asarray(np.stack([a[3] for a in self._accepted])),
            )
            lc_sigmas = np.stack([a[4] for a in self._accepted]).astype(np.float32)
            lc_valid = np.ones(len(self._accepted), bool)
        else:
            lc_i = np.zeros(1, np.int32)
            lc_j = np.asarray([min(1, offsets[-1] - 1)], np.int32)
            lc_meas = se3.identity((1,), jnp.float32)
            lc_sigmas = np.ones((1, 6), np.float32)
            lc_valid = np.zeros(1, bool)

        graph = build_chain_graph(
            dr_rows, lc_i=lc_i, lc_j=lc_j, lc_meas=lc_meas,
            lc_sigmas=lc_sigmas, lc_valid=lc_valid,
            cfg=cfg.pose_graph, noise_key=None,
        )
        # warm start: previous estimate for the old poses, DR for the new frame
        if st.poses is not None:
            prev_P = st.poses.t.shape[0]
            R0 = graph.poses0.R.at[:prev_P].set(st.poses.R)
            t0 = graph.poses0.t.at[:prev_P].set(st.poses.t)
            graph = graph._replace(poses0=se3.Pose3(R0, t0))

        poses, info = solve_pose_graph(graph, cfg.pose_graph)
        st.poses = poses
        st.n_lc = int(lc_valid.sum())
        self._last_info = info
        return poses

    def frame_poses(self, f: int) -> se3.Pose3:
        return self.state.poses[self.state.frame_slices[f]]
