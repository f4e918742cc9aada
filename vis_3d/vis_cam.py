#!/usr/bin/env python
"""3D camera-trajectory visualization.

Matplotlib equivalent of the reference's nice-slam-based viewer
(reference: vis_3d/vis_cam.py, cam_viz_tool.py): plot reconstructed vs
ground-truth 9D trajectories as 3D paths with orientation frusta, write a PNG
(and optionally an orbiting mp4).

Usage:
    python vis_3d/vis_cam.py --recon pred_tok_cam.npy --gt gt_cam.npy \
        --output cam_vis
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from egom2p_tpu.data.cam_gaze import cam_9d_to_mat  # noqa: E402


def plot_trajectories(recon_9d, gt_9d, out_png, title="camera trajectory"):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(111, projection="3d")
    for traj_9d, color, label in ((gt_9d, "tab:blue", "ground truth"),
                                  (recon_9d, "tab:red", "reconstruction")):
        if traj_9d is None:
            continue
        mats = cam_9d_to_mat(traj_9d)
        t = mats[:, :3, 3]
        ax.plot(t[:, 0], t[:, 1], t[:, 2], color=color, label=label, lw=2)
        # orientation ticks every 10 frames: camera z axis
        for i in range(0, len(mats), 10):
            z = mats[i, :3, 2] * 0.02
            ax.quiver(*t[i], *z, color=color, alpha=0.5)
    ax.set_title(title)
    ax.legend()
    ax.set_box_aspect((1, 1, 1))
    fig.tight_layout()
    fig.savefig(out_png, dpi=150)
    plt.close(fig)
    print(f"wrote {out_png}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--recon", required=True, help="(T, 9) npy")
    p.add_argument("--gt", default=None, help="(T, 9) or (T, 4, 4) npy")
    p.add_argument("--output", default="cam_vis")
    args = p.parse_args()
    os.makedirs(args.output, exist_ok=True)

    def load_traj(path):
        """(T, 9) canonicalized or (T, 4, 4) pose npy (both flags accept
        both, like vis_3d/cam_viz_tool.py's load())."""
        arr = np.load(path)
        if arr.ndim == 3 and arr.shape[-2:] == (4, 4):
            from egom2p_tpu.data.cam_gaze import canonicalize_cam
            arr = canonicalize_cam(arr)
        return arr

    recon = load_traj(args.recon)
    gt = load_traj(args.gt) if args.gt else None
    plot_trajectories(recon, gt,
                      os.path.join(args.output, "trajectory.png"))
