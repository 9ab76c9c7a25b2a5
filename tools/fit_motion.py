#!/usr/bin/env python3
"""FitMotion: ASCII-FBX animation curves -> Fourier motion-profile JSON.

Offline tool with the same pipeline and output schema as the reference
(reference: Tools/FitMotion/fit_motion.py):

  1. regex-parse the ASCII FBX connection graph (LimbNode models ->
     Lcl Translation/Rotation curve nodes -> d|X/Y/Z animation curves;
     KeyTime scale 46186158000)
  2. sample every curve on an fps grid
  3. with a skeleton JSON: re-run FK per sample (root XZ locked, unit-scale
     delta rebasing, pre-rotation + root-fix composition) to get foot
     trajectories; derive foot-contact weights from height + vertical
     velocity
  4. phase-estimation cascade: left-contact -> right-contact -> foot-height
     minima -> autocorrelation, accepting only near-full or half-cycle
     periods, with the half-cycle "stride" fix
  5. optional per-bone mirror / phase-offset overrides, moving-average
     smoothing
  6. DFT-style Fourier fit per axis, write the motionProfile JSON

Implementation is numpy-vectorized (curve sampling via np.interp, FK batched
over samples, fits as one basis matmul) and reuses the engine's skeleton
math rather than the reference's scalar loops.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from swift_game_engine_tpu.assets import nputil  # noqa: E402

TIME_SCALE = 46186158000.0


# ---------------------------------------------------------------------------
# FBX parsing


class Curve:
    __slots__ = ("times", "values", "default")

    def __init__(self, times, values, default=0.0):
        self.times = np.asarray(times, np.float64)
        self.values = np.asarray(values, np.float64)
        self.default = default

    def sample(self, t):
        """Piecewise-linear sample at times t (vectorized)."""
        if len(self.times) == 0 or len(self.times) != len(self.values):
            return np.full_like(np.asarray(t, np.float64), self.default)
        return np.interp(t, self.times, self.values)


def _floats(raw: str) -> np.ndarray:
    return np.array([float(p) for p in raw.replace("\n", "").split(",") if p.strip()])


def parse_fbx_curves(text: str):
    """Returns (bone_anims: {bone: {translation|rotation: {x|y|z: Curve}}},
    duration)."""
    models = {int(m.group(1)): m.group(2) for m in re.finditer(
        r'Model:\s+(\d+),\s+"Model::([^"]+)",\s+"LimbNode"', text)}
    node_binding = {}
    for m in re.finditer(r'C:\s+"OP",(\d+),(\d+),\s+"Lcl (Translation|Rotation)"', text):
        name = models.get(int(m.group(2)))
        if name is not None:
            node_binding[int(m.group(1))] = (name, m.group(3).lower())
    curve_binding = {}
    for m in re.finditer(r'C:\s+"OP",(\d+),(\d+),\s+"d\|([XYZ])"', text):
        curve_binding[int(m.group(1))] = (int(m.group(2)), m.group(3).lower())

    curve_re = re.compile(
        r'AnimationCurve:\s+(\d+),.*?KeyTime:\s*\*\d+\s*\{\s*a:\s*([^\}]*)\}\s*'
        r'KeyValueFloat:\s*\*\d+\s*\{\s*a:\s*([^\}]*)\}', re.S)
    curves = {}
    for m in curve_re.finditer(text):
        times = _floats(m.group(2)) / TIME_SCALE
        values = _floats(m.group(3))
        curves[int(m.group(1))] = Curve(times, values)

    bone_anims = {}
    max_time = 0.0
    for cid, (nid, axis) in curve_binding.items():
        curve = curves.get(cid)
        node = node_binding.get(nid)
        if curve is None or node is None:
            continue
        bone, channel = node
        if len(curve.times):
            max_time = max(max_time, float(curve.times[-1]))
        bone_anims.setdefault(bone, {"translation": {}, "rotation": {}})[channel][axis] = curve
    return bone_anims, max(max_time, 0.001)


_BINARY_MAGIC = b"Kaydara FBX Binary"


def parse_fbx_curves_binary(path):
    """Binary-FBX animation curves via tools/fbx.py (same contract as
    parse_fbx_curves). Walks Objects for Model(LimbNode)/AnimationCurve and
    Connections for the OP bindings the ASCII regexes match
    (reference: Tools/FitMotion/fit_motion.py:43-110 — ASCII-only there)."""
    from fbx import parse_fbx
    root = parse_fbx(str(path))
    objects = root.find("Objects")
    connections = root.find("Connections")
    if objects is None or connections is None:
        return {}, 0.001

    models, curves = {}, {}
    for n in objects.children:
        if n.name == "Model" and n.prop(2) == "LimbNode":
            # props[1] is "name\x00\x01Model" in binary files
            models[n.prop(0)] = str(n.prop(1)).split("\x00")[0]
        elif n.name == "AnimationCurve":
            kt, kv = n.find("KeyTime"), n.find("KeyValueFloat")
            if kt is not None and kv is not None:
                curves[n.prop(0)] = Curve(
                    np.asarray(kt.prop(0), np.float64) / TIME_SCALE,
                    np.asarray(kv.prop(0), np.float64))

    node_binding, curve_binding = {}, {}
    for c in connections.find_all("C"):
        if c.prop(0) != "OP" or len(c.props) < 4:
            continue
        src, dst, prop = c.prop(1), c.prop(2), str(c.prop(3))
        if prop in ("Lcl Translation", "Lcl Rotation") and dst in models:
            node_binding[src] = (models[dst], prop.split()[-1].lower())
        elif prop in ("d|X", "d|Y", "d|Z"):
            curve_binding[src] = (dst, prop[-1].lower())

    bone_anims = {}
    max_time = 0.0
    for cid, (nid, axis) in curve_binding.items():
        curve = curves.get(cid)
        node = node_binding.get(nid)
        if curve is None or node is None:
            continue
        bone, channel = node
        if len(curve.times):
            max_time = max(max_time, float(curve.times[-1]))
        bone_anims.setdefault(bone, {"translation": {}, "rotation": {}})[channel][axis] = curve
    return bone_anims, max(max_time, 0.001)


# ---------------------------------------------------------------------------
# FK + foot contacts


def load_skeleton_json(path: Path) -> dict:
    p = json.loads(Path(path).read_text())
    return dict(
        names=p["names"], parent=np.asarray(p["parent"], np.int64),
        translations=np.asarray(p["translations"], np.float64),
        pre_rotations=np.asarray(p.get("preRotationDegrees",
                                       p.get("pre_rotations", [])), np.float64),
        scale=float(p.get("unitScale", 1.0)),
        root_fix=np.asarray(p.get("root", {}).get("rotationFixDegrees",
                                                  [0.0, 0.0, 0.0]), np.float64))


def _sample_bone_locals(bone_anims, skeleton, t_samples, in_place=True):
    """Local transforms for every (sample, bone): (S, B, 4, 4)."""
    names = skeleton["names"]
    rest_raw = skeleton["translations"]
    pre = skeleton["pre_rotations"]
    scale = skeleton["scale"]
    s_count = len(t_samples)
    b = len(names)

    trans = np.empty((s_count, b, 3))
    rot_deg = np.zeros((s_count, b, 3))
    for i, name in enumerate(names):
        anim = bone_anims.get(name, {})
        tc = anim.get("translation", {})
        rc = anim.get("rotation", {})
        raw = np.stack([
            tc["x"].sample(t_samples) if "x" in tc else np.full(s_count, rest_raw[i, 0]),
            tc["y"].sample(t_samples) if "y" in tc else np.full(s_count, rest_raw[i, 1]),
            tc["z"].sample(t_samples) if "z" in tc else np.full(s_count, rest_raw[i, 2]),
        ], axis=-1)
        rest_scaled = np.zeros(3) if i == 0 else rest_raw[i] * scale
        t = rest_scaled + (raw - rest_raw[i]) * scale
        if i == 0 and in_place:
            t[:, 0] = rest_scaled[0]
            t[:, 2] = rest_scaled[2]
        trans[:, i] = t
        for k, ax in enumerate("xyz"):
            if ax in rc:
                rot_deg[:, i, k] = rc[ax].sample(t_samples)

    rot = nputil.rotation_xyz_degrees(rot_deg).astype(np.float64)       # (S,B,4,4)
    pre_m = nputil.rotation_xyz_degrees(pre).astype(np.float64)         # (B,4,4)
    local = np.einsum("bij,sbjk->sbik", pre_m, rot)
    root_fix = nputil.rotation_xyz_degrees(skeleton["root_fix"]).astype(np.float64)
    local[:, 0] = np.einsum("ij,sjk->sik", root_fix, local[:, 0])
    local[..., :3, 3] = trans   # T(t) @ R: rotation block unchanged
    return local


def _fk_batched(parent, local):
    """(S, B, 4, 4) local -> model; sequential over bones, batched samples."""
    model = np.empty_like(local)
    for i in range(local.shape[1]):
        p = int(parent[i])
        model[:, i] = local[:, i] if p < 0 else model[:, p] @ local[:, i]
    return model


def _contact_weights(ys: np.ndarray) -> np.ndarray:
    """Height+velocity contact weights (reference :315-344 semantics)."""
    n = len(ys)
    if n == 0:
        return ys
    sorted_y = np.sort(ys)
    y_min = sorted_y[max(0, int(n * 0.05) - 1)]
    y_max = sorted_y[min(n - 1, int(n * 0.95))]
    height_thresh = max(max(y_max - y_min, 1e-4) * 0.15, 0.01)
    vel = np.concatenate([[0.0], np.diff(ys) * n])
    vel_thresh = max(np.abs(vel).max() * 0.25 if n else 1e-4, 0.05)
    h = np.clip(1.0 - (ys - y_min) / height_thresh, 0.0, 1.0)
    v = np.clip(1.0 - np.abs(vel) / vel_thresh, 0.0, 1.0)
    return _smooth(h * v, 11)


def _smooth(values: np.ndarray, window: int) -> np.ndarray:
    """Edge-aware moving average (matches the reference's endpoint handling)."""
    if window <= 1 or len(values) <= 2:
        return values
    half = window // 2
    csum = np.concatenate([[0.0], np.cumsum(values)])
    idx = np.arange(len(values))
    start = np.maximum(0, idx - half)
    end = np.minimum(len(values), idx + half + 1)
    return (csum[end] - csum[start]) / (end - start)


def compute_foot_contacts(bone_anims, skeleton, t_samples):
    names = skeleton["names"]
    idx = {n: i for i, n in enumerate(names)}
    if "mixamorig:LeftFoot" not in idx or "mixamorig:RightFoot" not in idx:
        return None
    local = _sample_bone_locals(bone_anims, skeleton, t_samples)
    model = _fk_batched(skeleton["parent"], local)
    left_y = model[:, idx["mixamorig:LeftFoot"], 1, 3]
    right_y = model[:, idx["mixamorig:RightFoot"], 1, 3]
    return (_contact_weights(left_y), _contact_weights(right_y),
            np.asarray(left_y), np.asarray(right_y))


# ---------------------------------------------------------------------------
# Phase estimation cascade


def _phase_from_events(times, events):
    if len(events) < 2:
        return None, 0.0
    durations = np.diff(events)
    period = durations.mean()
    if len(events) >= 3:
        skip = events[2:] - events[:-2]
        if skip.mean() > period * 1.5:
            period = skip.mean()
    if period <= 0:
        return None, 0.0
    anchor = np.searchsorted(events, times, side="right") - 1
    anchor = np.clip(anchor, 0, len(events) - 1)
    phi = (times - events[anchor]) / period
    return phi - np.floor(phi), float(period)


def phase_from_contacts(times, weights, threshold=0.5):
    if weights is None or len(weights) == 0:
        return None, 0.0
    max_w = weights.max()
    if max_w <= 0:
        return None, 0.0
    if max_w < threshold:
        threshold = max_w * 0.6
    rising = (weights[:-1] < threshold) & (weights[1:] >= threshold)
    events = times[1:][rising]
    return _phase_from_events(times, events)


def detect_minima(times, values):
    if len(values) < 3:
        return np.zeros(0)
    v_min, v_max = values.min(), values.max()
    if v_max - v_min <= 1e-4:
        return np.zeros(0)
    threshold = v_min + (v_max - v_min) * 0.25
    is_min = (values[1:-1] <= values[:-2]) & (values[1:-1] <= values[2:]) & \
        (values[1:-1] <= threshold)
    cand = times[1:-1][is_min]
    min_spacing = (times[-1] - times[0]) / max(len(times), 1) * 10.0
    events = []
    last = -1e9
    for t in cand:
        if t - last >= min_spacing:
            events.append(t)
            last = t
    return np.asarray(events)


def phase_from_autocorr(times, values):
    n = len(values)
    if n < 4:
        return None, 0.0
    duration = times[-1] - times[0]
    if duration <= 0:
        return None, 0.0
    centered = values - values.mean()
    if (centered ** 2).sum() <= 1e-6:
        return None, 0.0
    dt = duration / n
    min_lag = max(2, int(0.2 / max(dt, 1e-6)))
    max_lag = min(n - 2, int(0.9 * n))
    if max_lag < min_lag:
        return None, 0.0
    full = np.correlate(centered, centered, mode="full")[n - 1:]
    lags = np.arange(min_lag, max_lag + 1)
    corr = full[lags]
    best = corr.max()
    preferred = lags[corr >= best * 0.9]
    best_lag = int(preferred.max()) if len(preferred) else int(lags[np.argmax(corr)])
    period = best_lag * dt
    if period <= 0:
        return None, 0.0
    phi = ((times - times[0]) % period) / period
    return phi, float(period)


# ---------------------------------------------------------------------------
# Fourier fit


def fit_fourier(phi: np.ndarray, values: np.ndarray, order: int) -> list:
    """DFT-style fit: [a0, a1, b1, ...] (reference :510-528)."""
    n = len(phi)
    if n == 0:
        return [0.0] * (1 + 2 * order)
    ks = np.arange(1, order + 1)
    ang = 2.0 * np.pi * np.outer(phi, ks)          # (N, K)
    cos_c = (values @ np.cos(ang)) * (2.0 / n)
    sin_c = (values @ np.sin(ang)) * (2.0 / n)
    out = [float(values.mean())]
    for k in range(order):
        out.append(float(cos_c[k]))
        out.append(float(sin_c[k]))
    return out


# ---------------------------------------------------------------------------
# Main pipeline


def fit(fbx_path, output_path, clip_name="Walking", fps=60, order=4,
        skeleton_json=None, smooth_window=1, overrides_path=None):
    with open(fbx_path, "rb") as f:
        head = f.read(len(_BINARY_MAGIC))
    if head == _BINARY_MAGIC:
        bone_anims, duration = parse_fbx_curves_binary(fbx_path)
    else:
        bone_anims, duration = parse_fbx_curves(Path(fbx_path).read_text())

    overrides = {}
    if overrides_path and Path(overrides_path).exists():
        payload = json.loads(Path(overrides_path).read_text())
        for item in payload.get("mirror", []):
            if item.get("target") and item.get("source"):
                overrides[item["target"]] = item

    sample_count = max(2, int(duration * fps))
    t_samples = np.arange(sample_count) / sample_count * duration
    phi = np.arange(sample_count) / sample_count
    phase_mode = "normalized_time"
    cycle = duration
    contacts = None

    if skeleton_json is not None:
        skeleton = load_skeleton_json(skeleton_json)
        res = compute_foot_contacts(bone_anims, skeleton, t_samples)
        if res is not None:
            cl, cr, ly, ry = res
            if smooth_window > 1:
                ly = _smooth(ly, smooth_window)
                ry = _smooth(ry, smooth_window)

            def accept(p, period):
                if p is None or period <= 0:
                    return False
                r = period / max(duration, 1e-6)
                return 0.9 <= r <= 1.1 or 0.45 <= r <= 0.55

            # cascade (reference :580-651)
            tried = [
                ("left_foot_contact", lambda: phase_from_contacts(t_samples, cl)),
                ("right_foot_contact", lambda: phase_from_contacts(t_samples, cr)),
                ("left_foot_min", lambda: _phase_from_events(
                    t_samples, detect_minima(t_samples, ly))),
                ("right_foot_min", lambda: _phase_from_events(
                    t_samples, detect_minima(t_samples, ry))),
                ("left_foot_auto", lambda: phase_from_autocorr(t_samples, ly)),
            ]
            for mode, fn in tried:
                p, period = fn()
                if accept(p, period):
                    phi, phase_mode, cycle = p, mode, period
                    # min-based periods shorter than 3/4 duration: prefer autocorr
                    if mode.endswith("_min") and cycle < duration * 0.75:
                        side = "left" if mode.startswith("left") else "right"
                        p2, period2 = phase_from_autocorr(
                            t_samples, ly if side == "left" else ry)
                        if accept(p2, period2):
                            phi, phase_mode, cycle = p2, f"{side}_foot_auto", period2
                    break
            contacts = (cl, cr)

            if cycle > 0 and 1.8 <= duration / cycle <= 2.2:
                cycle = duration
                phase_mode = f"{phase_mode}_stride"
                phi = (t_samples % cycle) / cycle

    bones_out = {}
    for bone in sorted(bone_anims.keys()):
        anim = bone_anims[bone]
        ov = overrides.get(bone)
        phase_offset = float(ov.get("phase_offset", 0.0)) if ov else 0.0
        entry = {}
        for channel in ("translation", "rotation"):
            out_axes = {}
            for axis in "xyz":
                curve = anim.get(channel, {}).get(axis)
                sign = 1.0
                if ov is not None and ov.get("source") in bone_anims:
                    curve = bone_anims[ov["source"]].get(channel, {}).get(axis)
                    sign = float(ov.get(channel, {}).get(axis, 1.0))
                if curve is None:
                    out_axes[axis] = None
                    continue
                ts = t_samples
                if duration > 0 and phase_offset:
                    ts = (t_samples + (phase_offset % 1.0) * duration) % duration
                values = curve.sample(ts)
                if smooth_window > 1:
                    values = _smooth(values, smooth_window)
                out_axes[axis] = fit_fourier(phi, values * sign, order)
            entry[channel] = out_axes
        bones_out[bone] = entry

    payload = {
        "version": 1,
        "name": clip_name,
        "duration": float(duration),
        "order": order,
        "sample_fps": fps,
        "phase": {"mode": phase_mode, "cycle_duration": float(cycle)},
        "units": {"rotation": "degrees", "translation": "fbx_local"},
        "bones": bones_out,
    }
    if contacts is not None:
        payload["contacts"] = {
            "left": fit_fourier(phi, contacts[0], order),
            "right": fit_fourier(phi, contacts[1], order),
            "threshold": 0.5,
        }
    Path(output_path).write_text(json.dumps(payload, indent=2, sort_keys=True))
    return payload


def main():
    ap = argparse.ArgumentParser(description="Fit FBX animation to Fourier motion profiles")
    ap.add_argument("--fbx", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--name", default="Walking")
    ap.add_argument("--fps", type=int, default=60)
    ap.add_argument("--order", type=int, default=4)
    ap.add_argument("--smooth-window", type=int, default=1)
    ap.add_argument("--skeleton-json", default=None)
    ap.add_argument("--override", default=None)
    args = ap.parse_args()
    fit(args.fbx, args.out, args.name, args.fps, args.order,
        args.skeleton_json, args.smooth_window, args.override)


if __name__ == "__main__":
    main()
