#!/usr/bin/env python3
"""Binary FBX -> ``*.static.json`` (same schema as the reference exporter).

reference: Tools/FbxToStaticMeshJson/export_static_mesh_json.py (Blender):
per-mesh entries with transforms, UV V-flip default, and collision hulls =
separate-by-loose-parts -> convex hull -> decimate to <= 24 faces, <= 2
hulls per part. This version reads binary FBX directly; hulls use
scipy.spatial.ConvexHull with vertex clustering for the face budget.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import fbx  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from swift_game_engine_tpu.assets import nputil  # noqa: E402

MAX_HULL_FACES = 24
MAX_HULLS_PER_PART = 2


def clean(name: str) -> str:
    return name.split("\x00")[0]


def model_matrix(m: "fbx.FbxModel") -> np.ndarray:
    """FBX local transform T * Rpre * R * S (XYZ Euler, degrees)."""
    r = nputil.rotation_xyz_degrees(m.lcl_rotation).astype(np.float64)
    pre = nputil.rotation_xyz_degrees(m.pre_rotation).astype(np.float64)
    s = np.diag([*m.lcl_scaling, 1.0])
    t = np.eye(4)
    t[:3, 3] = m.lcl_translation
    return t @ pre @ r @ s


def loose_parts(tris: np.ndarray, n_ctrl: int, ctrl_point: np.ndarray):
    """Union-find over shared control points -> list of triangle-index arrays."""
    parent = np.arange(n_ctrl)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    cp = ctrl_point[tris]          # (T,3) control points per corner
    for a, b, c in cp:
        ra, rb, rc = find(a), find(b), find(c)
        parent[rb] = ra
        parent[rc] = ra
    roots = np.array([find(c) for c in cp[:, 0]])
    parts = {}
    for ti, r in enumerate(roots):
        parts.setdefault(r, []).append(ti)
    return [np.asarray(v) for v in parts.values()]


def convex_hull_limited(points: np.ndarray, max_faces: int = MAX_HULL_FACES):
    """Convex hull decimated to the face budget via vertex clustering."""
    from scipy.spatial import ConvexHull
    from scipy.cluster.vq import kmeans2
    pts = np.unique(points.round(6), axis=0)
    if len(pts) < 4:
        return None
    try:
        hull = ConvexHull(pts)
    except Exception:
        return None
    hp = pts[hull.vertices]
    k = max_faces // 2 + 1  # Euler: faces ~= 2*verts - 4 for simplicial hulls
    while True:
        if len(hull.simplices) <= max_faces:
            break
        if len(hp) <= 4:
            break
        centroids, _ = kmeans2(hp, min(k, len(hp) - 1), minit="++", seed=0)
        try:
            hull = ConvexHull(centroids)
        except Exception:
            k += 2
            if k > len(hp):
                break
            continue
        hp = centroids[hull.vertices]
        k -= 1
    verts = hull.points[hull.vertices]
    remap = {v: i for i, v in enumerate(hull.vertices)}
    faces = np.array([[remap[a] for a in simplex] for simplex in hull.simplices])
    # orient faces outward (ConvexHull equations give outward normals)
    c = hull.points.mean(axis=0)
    for i, simplex in enumerate(hull.simplices):
        a, b, cc = hull.points[simplex]
        n = np.cross(b - a, cc - a)
        if np.dot(n, a - c) < 0:
            faces[i] = faces[i][[0, 2, 1]]
    return verts, faces


def export_static(fbx_path: str, out_path: str, flip_v: bool = True,
                  with_hulls: bool = True) -> dict:
    scene = fbx.extract_scene(fbx.parse_fbx(fbx_path))
    meshes_out = []
    for mid, model in scene.models.items():
        if model.kind != "Mesh":
            continue
        geo = fbx.geometry_of_model(scene, mid)
        if geo is None:
            continue
        tm = fbx.triangulate(geo, flip_v=flip_v)
        mat_ids = fbx.materials_of_model(scene, mid)
        mat_names = [clean(scene.materials[i].name) for i in mat_ids] or ["Default"]

        # submeshes: reorder triangles grouped by material slot
        tris = tm.indices.reshape(-1, 3)
        order = np.argsort(tm.tri_material, kind="stable")
        tris = tris[order]
        slots = tm.tri_material[order]
        submeshes = []
        indices = tris.reshape(-1)
        for slot in np.unique(slots):
            sel = np.nonzero(slots == slot)[0]
            submeshes.append({
                "start": int(sel[0] * 3),
                "count": int(len(sel) * 3),
                "material": mat_names[min(int(slot), len(mat_names) - 1)],
            })

        hulls = []
        if with_hulls:
            parts = loose_parts(tris, len(geo.control_points), tm.ctrl_point)
            parts.sort(key=len, reverse=True)
            for part in parts[:MAX_HULLS_PER_PART]:
                pts = tm.positions[np.unique(tris[part].reshape(-1))]
                hull = convex_hull_limited(pts)
                if hull is None:
                    continue
                hv, hf = hull
                hulls.append({
                    "positions": np.round(hv, 6).reshape(-1).tolist(),
                    "indices": hf.reshape(-1).tolist(),
                })

        meshes_out.append({
            "name": clean(model.name),
            "transform": np.round(model_matrix(model), 8).reshape(-1).tolist(),
            "mesh": {
                "positions": np.round(tm.positions, 6).reshape(-1).tolist(),
                "normals": np.round(tm.normals, 6).reshape(-1).tolist(),
                "uvs": np.round(tm.uvs, 6).reshape(-1).tolist(),
                "indices": indices.tolist(),
                "submeshes": submeshes,
            },
            "collisionHulls": hulls,
        })

    payload = {"version": 1, "meshes": meshes_out}
    with open(out_path, "w") as f:
        json.dump(payload, f)
    return payload


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--fbx", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--no-flip-v", action="store_true")
    ap.add_argument("--no-hulls", action="store_true")
    a = ap.parse_args()
    p = export_static(a.fbx, a.out, flip_v=not a.no_flip_v,
                      with_hulls=not a.no_hulls)
    for m in p["meshes"]:
        print(f"{m['name']}: {len(m['mesh']['positions'])//3} verts, "
              f"{len(m['mesh']['indices'])//3} tris, "
              f"{len(m['collisionHulls'])} hulls, "
              f"submeshes {[s['material'] for s in m['mesh']['submeshes']]}")
