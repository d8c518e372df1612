#!/usr/bin/env python
"""SfM entry point: keyframed trajectory from an image sequence
(BASELINE.json config 5).

Runs the LoFTR matcher over keyframe pairs of a ScanNet-style sequence
directory (color/*.jpg [+ depth/*.png] [+ pose/*.txt for GT ATE]), builds the
pose graph, runs Schur-complement bundle adjustment, reports the trajectory
and (if GT poses exist) ATE.

Usage:
  python sfm.py --scene-dir data/scannet/test/scene0707_00 \
      --intrinsic <K.npz-or-txt> --ckpt weights/indoor_ds.ckpt \
      [--keyframe-stride 10] [--max-frames 200] [--out traj.npz]
"""
from __future__ import annotations

import argparse
import glob
import json
import os


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scene-dir", required=True)
    p.add_argument("--intrinsic", required=True,
                   help="intrinsics: .npz (scene->K), .txt (ScanNet "
                        "intrinsic file), or 'fx,fy,cx,cy'")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--preset", default="indoor_ds")
    p.add_argument("--keyframe-stride", type=int, default=10)
    p.add_argument("--link-range", type=int, default=2)
    p.add_argument("--max-frames", type=int, default=0)
    p.add_argument("--ba-iters", type=int, default=15)
    p.add_argument("--ba-solver", default="dense", choices=["dense", "pcg"],
                   help="reduced-camera-system solver (pcg: matrix-free, "
                        "for large keyframe counts)")
    p.add_argument("--resize", type=int, nargs=2, default=(640, 480))
    p.add_argument("--no-depth", action="store_true")
    p.add_argument("--out", default=None)
    return p.parse_args()


def load_intrinsic(spec: str, scene: str):
    import numpy as np
    if spec.endswith(".npz"):
        d = dict(np.load(spec))
        return np.asarray(d.get(scene, list(d.values())[0]), np.float64)
    if spec.endswith(".txt"):
        K = np.loadtxt(spec, delimiter=" ")
        return K[:3, :3]
    fx, fy, cx, cy = map(float, spec.split(","))
    return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])


def main():
    args = parse_args()
    from loftr_tpu.utils.platform import honor_platform_env
    honor_platform_env()
    import cv2
    import numpy as np
    import jax
    import jax.numpy as jnp
    from loftr_tpu import LoFTR, MatchInput, get_config
    from loftr_tpu.data.io import read_scannet_depth, read_scannet_pose
    from loftr_tpu.sfm.ate import absolute_trajectory_error, camera_centers
    from loftr_tpu.sfm.pipeline import run_sfm

    scene = os.path.basename(args.scene_dir.rstrip("/"))
    color_files = sorted(
        glob.glob(os.path.join(args.scene_dir, "color", "*.jpg")),
        key=lambda f: int(os.path.splitext(os.path.basename(f))[0]))
    if args.max_frames:
        color_files = color_files[: args.max_frames]
    assert color_files, f"no frames in {args.scene_dir}/color"
    W, H = args.resize
    frames = [cv2.resize(cv2.imread(f, cv2.IMREAD_GRAYSCALE), (W, H))
              for f in color_files]
    stems = [os.path.splitext(os.path.basename(f))[0] for f in color_files]

    K = load_intrinsic(args.intrinsic, scene)
    # scale K to the resize (ScanNet color is 1296x968 or 640x480)
    probe = cv2.imread(color_files[0], cv2.IMREAD_GRAYSCALE)
    K = K.copy()
    K[0] *= W / probe.shape[1]
    K[1] *= H / probe.shape[0]

    depths = None
    if not args.no_depth and \
            os.path.isdir(os.path.join(args.scene_dir, "depth")):
        depths = []
        for stem in stems:
            p = os.path.join(args.scene_dir, "depth", f"{stem}.png")
            d = read_scannet_depth(p) if os.path.exists(p) else None
            if d is not None and d.shape != (H, W):
                d = cv2.resize(d, (W, H), interpolation=cv2.INTER_NEAREST)
            depths.append(d)

    cfg = get_config(args.preset, {"loftr": {
        "dtype": "bfloat16", "match_coarse": {"use_pallas": True}}})
    model = LoFTR(cfg.loftr)

    def to_input(a, b):
        g = lambda x: jnp.asarray(x, jnp.float32)[None, :, :, None] / 255.0
        return MatchInput(image0=g(a), image1=g(b))

    if args.ckpt:
        from loftr_tpu.utils.weights import load_torch_checkpoint
        variables = load_torch_checkpoint(args.ckpt)
    else:
        print("WARNING: random weights (no --ckpt); expect no matches")
        variables = model.init(jax.random.PRNGKey(0),
                               to_input(frames[0], frames[0]))
    fwd = jax.jit(lambda v, i: model.apply(v, i))

    def match_fn(a, b):
        out = fwd(variables, to_input(frames[a], frames[b]))
        v = np.asarray(out.valid)[0]
        return (np.asarray(out.mkpts0_f)[0][v],
                np.asarray(out.mkpts1_f)[0][v],
                np.asarray(out.coarse.i_ids)[0][v],
                np.asarray(out.coarse.j_ids)[0][v])

    out = run_sfm(len(frames), match_fn, K, depths=depths,
                  keyframe_stride=args.keyframe_stride,
                  link_range=args.link_range, ba_iters=args.ba_iters,
                  ba_solver=args.ba_solver)
    kfs = out["keyframes"]
    report = {"scene": scene, "n_frames": len(frames),
              "n_keyframes": len(kfs), "n_edges": len(out["edges"]),
              "ba_cost": out["ba_cost"]}

    pose_dir = os.path.join(args.scene_dir, "pose")
    if os.path.isdir(pose_dir):
        gt_R, gt_t, ok = [], [], []
        for k in kfs:
            p = os.path.join(pose_dir, f"{stems[k]}.txt")
            if os.path.exists(p):
                T = read_scannet_pose(p)  # world2cam
                gt_R.append(T[:3, :3])
                gt_t.append(T[:3, 3])
                ok.append(True)
            else:
                ok.append(False)
        if sum(ok) >= 3:
            sel = np.nonzero(ok)[0]
            est = camera_centers(out["R"][sel], out["t"][sel])
            gt = camera_centers(np.asarray(gt_R), np.asarray(gt_t))
            report["ate"] = absolute_trajectory_error(est, gt)
    print(json.dumps(report))
    if args.out:
        np.savez(args.out, keyframes=np.asarray(kfs), R=out["R"], t=out["t"])


if __name__ == "__main__":
    main()
