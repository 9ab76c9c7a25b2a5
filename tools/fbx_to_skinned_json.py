#!/usr/bin/env python3
"""Binary FBX -> ``*.skinned.json`` (same schema as the reference exporter).

reference: Tools/FbxToSkinnedJson/export_skinned_json.py (Blender headless):
armature+mesh discovery, weld/merge + submesh split per material, 4-bone
weights, inverse bind matrices. This version reads the binary FBX directly
(tools/fbx.py) — no Blender needed.

Output schema (loaded by assets/skinned_mesh.py, bit-compatible with
Game/SkinnedMeshLoader.swift:191-220):
  {version, mesh{positions, normals, uvs, joints u16x4, weights f32x4,
   indices, submeshes[{start, count, material}]}, skin{bones[{name,
   inverseBindMatrix[16 row-major]}]}}
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import fbx  # noqa: E402


def clean(name: str) -> str:
    return name.split("\x00")[0]


def export_skinned(fbx_path: str, out_path: str, flip_v: bool = True) -> dict:
    scene = fbx.extract_scene(fbx.parse_fbx(fbx_path))

    positions, normals, uvs = [], [], []
    joints, weights, indices = [], [], []
    submeshes = []
    bones: list = []            # [(name, inv_bind 4x4)]
    bone_slot: dict = {}
    base_vertex = 0

    for gid, geo in scene.geometries.items():
        sid = fbx.skin_of_geometry(scene, gid)
        if sid is None:
            continue
        tm = fbx.triangulate(geo, flip_v=flip_v)
        n_ctrl = len(geo.control_points)

        # per-control-point accumulation of (bone, weight)
        ctrl_w = [[] for _ in range(n_ctrl)]
        for cid in fbx.clusters_of_skin(scene, sid):
            cl = scene.clusters[cid]
            mid = fbx.bone_of_cluster(scene, cid)
            if mid is None:
                continue
            name = clean(scene.models[mid].name)
            if name not in bone_slot:
                bone_slot[name] = len(bones)
                bones.append((name, cl.transform))
            slot = bone_slot[name]
            for i, w in zip(cl.indexes, cl.weights):
                if w > 0:
                    ctrl_w[int(i)].append((slot, float(w)))

        v = len(tm.positions)
        j4 = np.zeros((v, 4), np.int64)
        w4 = np.zeros((v, 4), np.float64)
        for vi in range(v):
            lst = sorted(ctrl_w[int(tm.ctrl_point[vi])],
                         key=lambda x: -x[1])[:4]
            s = sum(w for _, w in lst)
            for k, (slot, w) in enumerate(lst):
                j4[vi, k] = slot
                w4[vi, k] = w / s if s > 0 else 0.0

        # material name for this geometry (AllSame in Mixamo exports)
        model_mid = None
        for mid in scene.parents_of(gid):
            if mid in scene.models and scene.models[mid].kind == "Mesh":
                model_mid = mid
        mat_ids = fbx.materials_of_model(scene, model_mid) if model_mid else []
        mat_name = clean(scene.materials[mat_ids[0]].name) if mat_ids else "Default"

        start = len(indices) * 1
        tri = tm.indices.reshape(-1, 3) + base_vertex
        positions.append(tm.positions)
        normals.append(tm.normals)
        uvs.append(tm.uvs)
        joints.append(j4)
        weights.append(w4)
        indices.extend(tri.reshape(-1).tolist())
        submeshes.append({"start": start, "count": len(tri) * 3,
                          "material": mat_name})
        base_vertex += v

    if not positions:
        raise ValueError(f"no skinned meshes in {fbx_path}")

    payload = {
        "version": 1,
        "mesh": {
            "positions": np.round(np.concatenate(positions), 6).reshape(-1).tolist(),
            "normals": np.round(np.concatenate(normals), 6).reshape(-1).tolist(),
            "uvs": np.round(np.concatenate(uvs), 6).reshape(-1).tolist(),
            "joints": np.concatenate(joints).reshape(-1).tolist(),
            "weights": np.round(np.concatenate(weights), 6).reshape(-1).tolist(),
            "indices": indices,
            "submeshes": submeshes,
        },
        "skin": {
            "bones": [{"name": n,
                       "inverseBindMatrix": np.round(m, 8).reshape(-1).tolist()}
                      for n, m in bones],
        },
    }
    with open(out_path, "w") as f:
        json.dump(payload, f)
    return payload


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--fbx", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--no-flip-v", action="store_true")
    a = ap.parse_args()
    p = export_skinned(a.fbx, a.out, flip_v=not a.no_flip_v)
    v = len(p["mesh"]["positions"]) // 3
    print(f"wrote {a.out}: {v} verts, {len(p['mesh']['indices'])//3} tris, "
          f"{len(p['skin']['bones'])} bones, "
          f"{[s['material'] for s in p['mesh']['submeshes']]}")
