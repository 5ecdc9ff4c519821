"""Synthetic stereo sequence renderer for end-to-end tests.

Renders a textured plane (plus an optional second plane) via homographies with
a known camera trajectory — no dataset needed. Zero distortion; calibration
matches EuRoC-ish intrinsics.
"""

import numpy as np
import cv2

FX, FY, CX, CY = 458.0, 458.0, 376.0, 240.0
W, H = 752, 480
BASELINE = 0.11


def slam_params_dict():
    return {
        "Camera.model_left": "pinhole", "Camera.model_right": "pinhole",
        "Camera.left_nwidth": W, "Camera.left_nheight": H,
        "Camera.right_nwidth": W, "Camera.right_nheight": H,
        "Camera.fxl": FX, "Camera.fyl": FY, "Camera.cxl": CX, "Camera.cyl": CY,
        "Camera.k1l": 0.0, "Camera.k2l": 0.0, "Camera.p1l": 0.0, "Camera.p2l": 0.0,
        "Camera.fxr": FX, "Camera.fyr": FY, "Camera.cxr": CX, "Camera.cyr": CY,
        "Camera.k1r": 0.0, "Camera.k2r": 0.0, "Camera.p1r": 0.0, "Camera.p2r": 0.0,
        # T_left_right: right cam is +baseline along x in left frame
        "T_left_right": np.array([
            [1, 0, 0, BASELINE], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
            np.float64),
        "mono": 0, "stereo": 1, "slam_mode": 1, "buse_loop_closer": 0,
        "use_clahe": 0, "nmaxdist": 45, "dmaxquality": 0.001,
        "nklt_pyr_lvl": 3, "nklt_win_size": 9,
        "finit_parallax": 20.0, "nmin_covscore": 15,
        "fkf_filtering_ratio": 2.0,  # disable culling in the smoke test
        # background AOT compiles of the big solver families would steal the
        # CPU from the test itself (prewarm targets the tunneled TPU, where
        # compiles release the GIL and overlap tracking)
        "prewarm": 0,
    }


def make_texture(seed=0, size=3000):
    rng = np.random.default_rng(seed)
    tex = rng.uniform(0, 255, size=(size // 10, size // 10)).astype(np.float32)
    tex = cv2.resize(tex, (size, size), interpolation=cv2.INTER_CUBIC)
    # add fine detail so every scale has gradient
    fine = rng.uniform(-20, 20, size=(size // 3, size // 3)).astype(np.float32)
    tex += cv2.resize(fine, (size, size), interpolation=cv2.INTER_CUBIC)
    return np.clip(tex, 0, 255)


K_MAT = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], np.float64)


def render_plane(tex, T_cw, plane_z=8.0, plane_halfwidth=12.0):
    """Render the world plane z=plane_z (x, y in [-hw, hw]) through T_cw."""
    R = T_cw[:3, :3]
    t = T_cw[:3, 3]
    # world plane coords (x, y) -> pixel homography
    Hm = K_MAT @ np.stack([R[:, 0], R[:, 1], R[:, 2] * plane_z + t], axis=1)
    # texture coords: (x, y) in [-hw, hw] -> [0, size]
    size = tex.shape[0]
    S = np.array([
        [size / (2 * plane_halfwidth), 0, size / 2],
        [0, size / (2 * plane_halfwidth), size / 2],
        [0, 0, 1]], np.float64)
    H_tex2px = Hm @ np.linalg.inv(S)
    img = cv2.warpPerspective(
        tex, H_tex2px.astype(np.float64), (W, H),
        flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_REPLICATE)
    return img.astype(np.float32)


def make_trajectory(n_frames=60, step=0.04, yaw_rate=0.002):
    """Camera-to-world ground truth: translate along x, slight yaw."""
    poses_wc = []
    for i in range(n_frames):
        yaw = yaw_rate * i
        c, s = np.cos(yaw), np.sin(yaw)
        Rwc = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float64)
        twc = np.array([step * i, 0.002 * np.sin(i * 0.3), 0.001 * i], np.float64)
        T = np.eye(4)
        T[:3, :3] = Rwc
        T[:3, 3] = twc
        poses_wc.append(T)
    return poses_wc


def render_view(tex1, tex2, T_cw, plane_z=8.0, plane2_z=5.0, plane2_hw=2.5):
    """Two-plane world: a far wall (z=plane_z, infinite) plus a near square
    slab (z=plane2_z, |x|,|y| <= plane2_hw). Single-plane worlds trigger the
    classic planar-PnP two-fold pose ambiguity, which no real scene has."""
    img = render_plane(tex1, T_cw, plane_z)
    img2 = render_plane(tex2, T_cw, plane2_z, plane_halfwidth=8.0)
    # mask: pixels whose ray hits the near slab within its bounds
    R = T_cw[:3, :3]
    t = T_cw[:3, 3]
    Hm = K_MAT @ np.stack([R[:, 0], R[:, 1], R[:, 2] * plane2_z + t], axis=1)
    Hinv = np.linalg.inv(Hm)
    ys, xs = np.meshgrid(np.arange(H, dtype=np.float64),
                         np.arange(W, dtype=np.float64), indexing="ij")
    px_h = np.stack([xs, ys, np.ones_like(xs)], axis=-1)
    world = px_h @ Hinv.T
    wx = world[..., 0] / world[..., 2]
    wy = world[..., 1] / world[..., 2]
    # in front of the camera and inside the slab bounds
    Xc_z = R[2, 0] * wx + R[2, 1] * wy + R[2, 2] * plane2_z + t[2]
    mask = (np.abs(wx) <= plane2_hw) & (np.abs(wy) <= plane2_hw) & (Xc_z > 0)
    return np.where(mask, img2, img).astype(np.float32)


def render_sequence(n_frames=60, seed=0, plane_z=8.0, step=0.04, yaw_rate=0.002):
    """Returns (frames_left, frames_right, gt poses camera-to-world)."""
    tex = make_texture(seed)
    tex2 = make_texture(seed + 100)
    poses_wc = make_trajectory(n_frames, step, yaw_rate)
    T_rl = np.eye(4)
    T_rl[0, 3] = -BASELINE   # right-from-left: x_r = x_l - baseline
    out_l, out_r = [], []
    for T_wc in poses_wc:
        T_cw = np.linalg.inv(T_wc)
        out_l.append(render_view(tex, tex2, T_cw, plane_z))
        T_cw_r = T_rl @ T_cw
        out_r.append(render_view(tex, tex2, T_cw_r, plane_z))
    return out_l, out_r, poses_wc
