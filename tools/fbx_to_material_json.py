#!/usr/bin/env python3
"""Binary FBX -> ``*.materials.json`` (same schema as the reference exporter).

reference: Tools/FbxToMaterialJson/export_materials_json.py (Blender node
networks). Reading the FBX directly, material properties map from the
Phong/Lambert surface model:
  baseColorFactor   <- DiffuseColor
  emissiveFactor    <- EmissiveColor * EmissiveFactor
  metallicFactor    <- ReflectionFactor (if present, else 0)
  roughnessFactor   <- Blinn-Phong shininess -> roughness = sqrt(2/(s+2))
  alpha             <- 1 - TransparencyFactor
Texture connections (OP links into DiffuseColor/NormalMap/...) become the
*Texture path fields, with the glTF channel hints the reference emits.
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


_TEX_PROP_MAP = {
    "DiffuseColor": "baseColorTexture",
    "NormalMap": "normalTexture",
    "Bump": "normalTexture",
    "ShininessExponent": "metallicRoughnessTexture",
    "SpecularColor": "metallicRoughnessTexture",
    "EmissiveColor": "emissiveTexture",
    "AmbientOcclusion": "occlusionTexture",
}


def export_materials(fbx_path: str, out_path: str) -> dict:
    scene = fbx.extract_scene(fbx.parse_fbx(fbx_path))

    # texture id -> material property bindings
    tex_bindings = {}
    for child, parent, prop in scene.op_links:
        if child in scene.textures and parent in scene.materials:
            tex_bindings.setdefault(parent, {})[prop] = scene.textures[child]

    materials = []
    for mid, mat in scene.materials.items():
        p = mat.props

        def v3(key, default):
            val = p.get(key)
            if val is None:
                return list(default)
            if isinstance(val, (int, float)):
                return [float(val)] * 3
            return [float(x) for x in val[:3]]

        def f(key, default):
            val = p.get(key)
            if val is None:
                return float(default)
            if isinstance(val, (list, tuple)):
                val = val[0]
            return float(val)

        shininess = f("ShininessExponent", f("Shininess", 32.0))
        roughness = float(np.sqrt(2.0 / (max(shininess, 0.0) + 2.0)))
        emissive_f = f("EmissiveFactor", 1.0)
        entry = {
            "name": clean(mat.name),
            "baseColorFactor": v3("DiffuseColor", (1, 1, 1)),
            "metallicFactor": f("ReflectionFactor", 0.0),
            "roughnessFactor": roughness,
            "emissiveFactor": [c * emissive_f for c in v3("EmissiveColor", (0, 0, 0))],
            "occlusionStrength": 1.0,
            "alpha": 1.0 - f("TransparencyFactor", 0.0),
            "transmissionFactor": 0.0,
            "ior": 1.5,
            "unlit": False,
            "normalScale": 1.0,
        }
        for prop, path in tex_bindings.get(mid, {}).items():
            key = _TEX_PROP_MAP.get(prop)
            if key and key not in entry:
                entry[key] = os.path.basename(path.replace("\\", "/"))
        if "metallicRoughnessTexture" in entry:
            entry["metallicChannel"] = "B"
            entry["roughnessChannel"] = "G"
        if "occlusionTexture" in entry:
            entry["occlusionChannel"] = "R"
        materials.append(entry)

    payload = {"version": 1, "materials": materials}
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=2)
    return payload


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--fbx", required=True)
    ap.add_argument("--out", required=True)
    a = ap.parse_args()
    pl = export_materials(a.fbx, a.out)
    print(f"wrote {a.out}: {[m['name'] for m in pl['materials']]}")
