"""Literal cv2/NumPy transcription of the reference's per-pair flow analysis.

Test oracle only (never imported by library code): reimplements
FunscriptFlow.pyw:748-785, 843-907, 1200-1242 with the exact same numerics so
the device pipeline can be validated end-to-end without the reference app.
"""

import cv2
import numpy as np


def max_divergence(flow):
    div = np.gradient(flow[..., 0], axis=0) + np.gradient(flow[..., 1], axis=1)
    y, x = np.unravel_index(np.argmax(np.abs(div)), div.shape)
    return x, y, div[y, x]


def radial_motion_weighted(flow, center, is_cut, pov_mode=False):
    if is_cut:
        return 0.0
    h, w, _ = flow.shape
    y, x = np.indices((h, w))
    dx = x - center[0]
    dy = y - center[1]
    dot = flow[..., 0] * dx + flow[..., 1] * dy
    if pov_mode:
        return np.mean(dot)
    wdot = np.where(x > center[0], dot * (w - x) / w, dot * x / w)
    wdot = np.where(y > center[1], wdot * (h - y) / h, wdot * y / h)
    return np.mean(wdot)


def precompute_flow_info(p0, p1, pov_mode=False, cut_threshold=7):
    flow = cv2.calcOpticalFlowFarneback(p0, p1, None, 0.5, 3, 15, 3, 5, 1.2, 0)
    if pov_mode:
        mx = (p0.shape[1] // 2, p0.shape[0] - 1, 0)
    else:
        mx = max_divergence(flow)
    mag, _ = cv2.cartToPolar(flow[..., 0], flow[..., 1])
    mean_mag = np.mean(mag)
    return {
        "flow": flow,
        "pos_center": mx[0:2],
        "val_pos": mx[2],
        "cut": bool(mean_mag > cut_threshold),
        "mean_mag": mean_mag,
    }


def analyze_pairs(frames_gray, pov_mode=False, cut_threshold=7):
    """Full per-chunk analysis: flow info per pair, +/-6 center smoothing,
    weighted radial projection. frames_gray: list of [H, W] uint8."""
    pairs = list(zip(frames_gray[:-1], frames_gray[1:]))
    infos = [precompute_flow_info(p0, p1, pov_mode, cut_threshold) for p0, p1 in pairs]
    final_centers = []
    for j, info in enumerate(infos):
        center_list = [info["pos_center"]]
        for i in range(1, 7):
            if j - i >= 0:
                center_list.append(infos[j - i]["pos_center"])
            if j + i < len(infos):
                center_list.append(infos[j + i]["pos_center"])
        final_centers.append(np.mean(np.array(center_list), axis=0))
    dots = [
        radial_motion_weighted(info["flow"], final_centers[j], info["cut"], pov_mode)
        for j, info in enumerate(infos)
    ]
    return {
        "dots": np.array(dots),
        "cuts": np.array([i["cut"] for i in infos]),
        "centers": np.array(final_centers),
        "mean_mag": np.array([i["mean_mag"] for i in infos]),
        "val_pos": np.array([i["val_pos"] for i in infos]),
    }


def rgb_to_gray(rgb):
    return cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY)


def make_synthetic_frames(n, h=256, w=256, period=30, amp=0.06, seed=0, cuts=()):
    """Expanding/contracting textured pattern: known oscillation period.

    A zoom about the image center whose log-scale follows a sinusoid ->
    radial expansion/contraction the pipeline should recover. ``cuts`` lists
    frame indices where the texture is re-randomized (scene cut).
    """
    rng = np.random.default_rng(seed)
    tex = cv2.GaussianBlur((rng.random((h * 2, w * 2)) * 255).astype(np.float32), (0, 0), 3)
    frames = []
    for i in range(n):
        if i in cuts:
            tex = cv2.GaussianBlur(
                (rng.random((h * 2, w * 2)) * 255).astype(np.float32), (0, 0), 3
            )
        s = np.exp(amp * np.sin(2 * np.pi * i / period))
        M = cv2.getRotationMatrix2D((w, h), 0, s)
        img = cv2.warpAffine(tex, M, (w * 2, h * 2))[h // 2 : h // 2 + h, w // 2 : w // 2 + w]
        g = np.clip(img, 0, 255).astype(np.uint8)
        frames.append(np.stack([g, g, g], axis=-1))  # RGB
    return frames
