"""Procedural mesh API: validated vertex-stream descriptors.

Array-of-structs interleaved vertex buffers (reference:
Game/VertexLayouts.swift, Game/ProceduralMeshAPI.swift:19-181,
Game/ProceduralMeshBuilder.swift) become plain struct-of-arrays numpy — the
natural layout for TPU consumption. Tangents are computed on demand per
Game/MeshTangents.swift semantics (accumulated per-triangle UV-space tangent
frames, orthonormalized per vertex with handedness in w).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np


def _check(cond, msg):
    if not cond:
        raise ValueError(msg)


@dataclass(frozen=True)
class MeshDescriptor:
    """Static triangle mesh (reference ProceduralMeshDescriptor)."""

    positions: np.ndarray          # (V,3) f32
    indices: np.ndarray            # (I,) i32, triangles
    normals: Optional[np.ndarray] = None    # (V,3)
    uvs: Optional[np.ndarray] = None        # (V,2)
    tangents: Optional[np.ndarray] = None   # (V,4)
    name: str = "mesh"

    def __post_init__(self):
        v = len(self.positions)
        _check(v > 0, f"{self.name}: empty positions")
        _check(self.positions.shape == (v, 3), f"{self.name}: positions must be (V,3)")
        _check(len(self.indices) % 3 == 0, f"{self.name}: indices not a triangle list")
        _check(self.indices.min(initial=0) >= 0 and self.indices.max(initial=0) < v,
               f"{self.name}: index out of range")
        if self.normals is not None:
            _check(self.normals.shape == (v, 3), f"{self.name}: normals shape")
        if self.uvs is not None:
            _check(self.uvs.shape == (v, 2), f"{self.name}: uvs shape")
        if self.tangents is not None:
            _check(self.tangents.shape == (v, 4), f"{self.name}: tangents shape")

    @property
    def vertex_count(self) -> int:
        return len(self.positions)

    @property
    def triangle_count(self) -> int:
        return len(self.indices) // 3

    def bounds(self):
        return self.positions.min(axis=0), self.positions.max(axis=0)

    def with_tangents(self) -> "MeshDescriptor":
        if self.tangents is not None or self.uvs is None or self.normals is None:
            return self
        return MeshDescriptor(
            positions=self.positions, indices=self.indices, normals=self.normals,
            uvs=self.uvs, tangents=compute_tangents(self.positions, self.normals,
                                                    self.uvs, self.indices),
            name=self.name)


@dataclass(frozen=True)
class SkinnedMeshDescriptor:
    """Skinned triangle mesh (reference SkinnedMeshDescriptor)."""

    positions: np.ndarray      # (V,3)
    normals: np.ndarray        # (V,3)
    uvs: np.ndarray            # (V,2)
    joints: np.ndarray         # (V,4) i32
    weights: np.ndarray        # (V,4) f32
    indices: np.ndarray        # (I,) i32
    inv_bind_model: Optional[np.ndarray] = None  # (B,4,4) override
    tangents: Optional[np.ndarray] = None
    name: str = "skinned"

    def __post_init__(self):
        v = len(self.positions)
        _check(v > 0, f"{self.name}: empty positions")
        for arr, shape, nm in ((self.normals, (v, 3), "normals"),
                               (self.uvs, (v, 2), "uvs"),
                               (self.joints, (v, 4), "joints"),
                               (self.weights, (v, 4), "weights")):
            _check(arr.shape == shape, f"{self.name}: {nm} shape {arr.shape} != {shape}")
        _check(len(self.indices) % 3 == 0, f"{self.name}: indices not a triangle list")
        _check(self.indices.min(initial=0) >= 0 and self.indices.max(initial=0) < v,
               f"{self.name}: index out of range")

    @property
    def vertex_count(self) -> int:
        return len(self.positions)

    def with_tangents(self) -> "SkinnedMeshDescriptor":
        if self.tangents is not None:
            return self
        return SkinnedMeshDescriptor(
            positions=self.positions, normals=self.normals, uvs=self.uvs,
            joints=self.joints, weights=self.weights, indices=self.indices,
            inv_bind_model=self.inv_bind_model,
            tangents=compute_tangents(self.positions, self.normals, self.uvs,
                                      self.indices),
            name=self.name)


def compute_tangents(positions, normals, uvs, indices) -> np.ndarray:
    """Per-vertex tangents with handedness (reference: Game/MeshTangents.swift:11-82).

    Accumulates UV-gradient tangents/bitangents per triangle, then
    Gram-Schmidt orthonormalizes against the vertex normal; w = handedness.
    Vectorized with scatter-adds instead of the reference's per-index loop.
    """
    v = len(positions)
    tri = indices.reshape(-1, 3)
    p0, p1, p2 = (positions[tri[:, k]] for k in range(3))
    u0, u1, u2 = (uvs[tri[:, k]] for k in range(3))

    e1 = p1 - p0
    e2 = p2 - p0
    duv1 = u1 - u0
    duv2 = u2 - u0
    det = duv1[:, 0] * duv2[:, 1] - duv2[:, 0] * duv1[:, 1]
    inv = np.where(np.abs(det) < 1e-12, 0.0, 1.0 / np.where(det == 0, 1.0, det))[:, None]
    t = (e1 * duv2[:, 1:2] - e2 * duv1[:, 1:2]) * inv
    b = (e2 * duv1[:, 0:1] - e1 * duv2[:, 0:1]) * inv

    tan = np.zeros((v, 3), np.float64)
    bit = np.zeros((v, 3), np.float64)
    for k in range(3):
        np.add.at(tan, tri[:, k], t)
        np.add.at(bit, tri[:, k], b)

    n = normals.astype(np.float64)
    t_ortho = tan - n * (n * tan).sum(axis=1, keepdims=True)
    ln = np.linalg.norm(t_ortho, axis=1, keepdims=True)
    fallback = np.tile(np.array([1.0, 0, 0]), (v, 1))
    t_unit = np.where(ln > 1e-8, t_ortho / np.maximum(ln, 1e-20), fallback)
    handed = np.where((np.cross(n, t_unit) * bit).sum(axis=1) < 0.0, -1.0, 1.0)
    return np.concatenate([t_unit, handed[:, None]], axis=1).astype(np.float32)
