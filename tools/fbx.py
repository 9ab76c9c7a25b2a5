#!/usr/bin/env python3
"""Binary FBX reader + scene extraction (meshes, skins, materials, rigs).

The reference's offline exporters run Blender headless over FBX files
(reference: Tools/FbxToSkinnedJson, Tools/FbxToStaticMeshJson,
Tools/FbxToMaterialJson). This environment has no bpy, and the checked-in
sources are *binary* FBX — so this module reads the binary container
directly (node records with zlib-compressed typed arrays, format v7100+,
64-bit record headers from v7500) and exposes the same scene data the
Blender scripts consumed: geometry with per-polygon-vertex attributes,
skin clusters with bind matrices, the LimbNode hierarchy, and material
property networks.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field

import numpy as np

_MAGIC = b"Kaydara FBX Binary  \x00"

_SCALAR = {b"Y": ("<h", 2), b"C": ("<b", 1), b"I": ("<i", 4),
           b"F": ("<f", 4), b"D": ("<d", 8), b"L": ("<q", 8)}
_ARRAY = {b"f": np.float32, b"d": np.float64, b"l": np.int64,
          b"i": np.int32, b"b": np.uint8}


@dataclass
class Node:
    name: str
    props: list
    children: list = field(default_factory=list)

    def find(self, name: str):
        for c in self.children:
            if c.name == name:
                return c
        return None

    def find_all(self, name: str):
        return [c for c in self.children if c.name == name]

    def prop(self, i=0, default=None):
        return self.props[i] if i < len(self.props) else default


def _read_props(data, pos, count):
    out = []
    for _ in range(count):
        t = data[pos:pos + 1]
        pos += 1
        if t in _SCALAR:
            fmt, size = _SCALAR[t]
            out.append(struct.unpack_from(fmt, data, pos)[0])
            pos += size
        elif t in _ARRAY:
            n, enc, comp = struct.unpack_from("<III", data, pos)
            pos += 12
            dtype = _ARRAY[t]
            if enc == 1:
                raw = zlib.decompress(data[pos:pos + comp])
                pos += comp
            else:
                nbytes = n * dtype().itemsize
                raw = data[pos:pos + nbytes]
                pos += nbytes
            out.append(np.frombuffer(raw, dtype=dtype, count=n))
        elif t == b"S":
            n = struct.unpack_from("<I", data, pos)[0]
            pos += 4
            out.append(data[pos:pos + n].decode("utf-8", "replace"))
            pos += n
        elif t == b"R":
            n = struct.unpack_from("<I", data, pos)[0]
            pos += 4
            out.append(data[pos:pos + n])
            pos += n
        else:
            raise ValueError(f"unknown FBX property type {t!r} at {pos}")
    return out, pos


def _read_node(data, pos, wide):
    if wide:
        end, n_props, _plen = struct.unpack_from("<QQQ", data, pos)
        pos += 24
    else:
        end, n_props, _plen = struct.unpack_from("<III", data, pos)
        pos += 12
    name_len = data[pos]
    pos += 1
    if end == 0:  # null record
        return None, pos
    name = data[pos:pos + name_len].decode("ascii", "replace")
    pos += name_len
    props, pos = _read_props(data, pos, n_props)
    node = Node(name, props)
    while pos < end:
        child, pos = _read_node(data, pos, wide)
        if child is None:
            break
    # _read_node recursion above appended nothing; do it iteratively:
    return node, end


def _read_children(data, pos, end, wide):
    children = []
    sentinel = 25 if wide else 13
    while pos < end:
        if end - pos <= sentinel and data[pos:pos + sentinel] == b"\x00" * sentinel:
            pos += sentinel
            break
        child, pos = _parse_node(data, pos, wide)
        if child is None:
            break
        children.append(child)
    return children, pos


def _parse_node(data, pos, wide):
    if wide:
        end, n_props, _plen = struct.unpack_from("<QQQ", data, pos)
        pos += 24
    else:
        end, n_props, _plen = struct.unpack_from("<III", data, pos)
        pos += 12
    name_len = data[pos]
    pos += 1
    if end == 0 and n_props == 0 and name_len == 0:
        return None, pos
    name = data[pos:pos + name_len].decode("ascii", "replace")
    pos += name_len
    props, pos = _read_props(data, pos, n_props)
    node = Node(name, props)
    if pos < end:
        node.children, pos = _read_children(data, pos, end, wide)
    return node, end


def parse_fbx(path: str) -> Node:
    data = open(path, "rb").read()
    if not data.startswith(_MAGIC):
        raise ValueError("not a binary FBX file")
    version = struct.unpack_from("<I", data, 23)[0]
    wide = version >= 7500
    pos = 27
    root = Node("<root>", [])
    while pos < len(data):
        node, pos = _parse_node(data, pos, wide)
        if node is None:
            break
        root.children.append(node)
    root.props = [version]
    return root


# ---------------------------------------------------------------------------
# Scene extraction


def _props70(node: Node) -> dict:
    out = {}
    p70 = node.find("Properties70")
    if p70 is None:
        return out
    for p in p70.find_all("P"):
        key = p.prop(0)
        vals = p.props[4:]
        out[key] = vals[0] if len(vals) == 1 else list(vals)
    return out


@dataclass
class FbxGeometry:
    gid: int
    name: str
    control_points: np.ndarray     # (P,3) f64
    polygon_indices: np.ndarray    # raw PolygonVertexIndex
    normals: np.ndarray | None     # per mapping
    normal_mapping: str
    normal_ref: str
    normal_index: np.ndarray | None
    uv: np.ndarray | None          # (U,2)
    uv_index: np.ndarray | None
    uv_mapping: str
    uv_ref: str
    material_mapping: str
    material_indices: np.ndarray | None


@dataclass
class FbxModel:
    mid: int
    name: str
    kind: str
    lcl_translation: np.ndarray
    lcl_rotation: np.ndarray
    lcl_scaling: np.ndarray
    pre_rotation: np.ndarray


@dataclass
class FbxCluster:
    cid: int
    indexes: np.ndarray
    weights: np.ndarray
    transform: np.ndarray       # (4,4) standard column-vector convention
    transform_link: np.ndarray


@dataclass
class FbxMaterial:
    mid: int
    name: str
    props: dict


@dataclass
class FbxScene:
    geometries: dict
    models: dict
    clusters: dict
    skins: dict                    # skin id -> node
    materials: dict
    textures: dict                 # texture id -> filename
    # connections
    oo_parents: dict               # child id -> [parent ids]
    op_links: list                 # (child, parent, prop)

    def parents_of(self, cid):
        return self.oo_parents.get(cid, [])


def _mat_from_fbx16(vals) -> np.ndarray:
    """FBX row-vector-convention 16 doubles -> our column-vector matrix."""
    m = np.asarray(vals, np.float64).reshape(4, 4)
    return m.T.copy()


def extract_scene(root: Node) -> FbxScene:
    objects = None
    connections = None
    for c in root.children:
        if c.name == "Objects":
            objects = c
        elif c.name == "Connections":
            connections = c
    if objects is None:
        raise ValueError("FBX has no Objects node")

    geometries, models, clusters, skins, materials, textures = {}, {}, {}, {}, {}, {}
    for obj in objects.children:
        if obj.name == "Geometry" and obj.prop(2) == "Mesh":
            gid = obj.prop(0)
            verts = obj.find("Vertices")
            poly = obj.find("PolygonVertexIndex")
            if verts is None or poly is None:
                continue
            ln = obj.find("LayerElementNormal")
            luv = obj.find("LayerElementUV")
            lmat = obj.find("LayerElementMaterial")

            def g(layer, key):
                if layer is None:
                    return None
                n = layer.find(key)
                return n.prop(0) if n is not None else None

            geometries[gid] = FbxGeometry(
                gid=gid, name=str(obj.prop(1, "")).replace("Geometry::", ""),
                control_points=np.asarray(verts.prop(0), np.float64).reshape(-1, 3),
                polygon_indices=np.asarray(poly.prop(0), np.int64),
                normals=None if g(ln, "Normals") is None else
                np.asarray(g(ln, "Normals"), np.float64).reshape(-1, 3),
                normal_mapping=g(ln, "MappingInformationType") or "",
                normal_ref=g(ln, "ReferenceInformationType") or "Direct",
                normal_index=None if g(ln, "NormalsIndex") is None else
                np.asarray(g(ln, "NormalsIndex"), np.int64),
                uv=None if g(luv, "UV") is None else
                np.asarray(g(luv, "UV"), np.float64).reshape(-1, 2),
                uv_index=None if g(luv, "UVIndex") is None else
                np.asarray(g(luv, "UVIndex"), np.int64),
                uv_mapping=g(luv, "MappingInformationType") or "",
                uv_ref=g(luv, "ReferenceInformationType") or "Direct",
                material_mapping=g(lmat, "MappingInformationType") or "AllSame",
                material_indices=None if g(lmat, "Materials") is None else
                np.asarray(g(lmat, "Materials"), np.int64),
            )
        elif obj.name == "Model":
            mid = obj.prop(0)
            name = str(obj.prop(1, "")).replace("Model::", "")
            kind = str(obj.prop(2, ""))
            p = _props70(obj)

            def v3(key, default):
                val = p.get(key)
                if val is None:
                    return np.asarray(default, np.float64)
                return np.asarray(val[:3], np.float64)

            models[mid] = FbxModel(
                mid=mid, name=name, kind=kind,
                lcl_translation=v3("Lcl Translation", [0, 0, 0]),
                lcl_rotation=v3("Lcl Rotation", [0, 0, 0]),
                lcl_scaling=v3("Lcl Scaling", [1, 1, 1]),
                pre_rotation=v3("PreRotation", [0, 0, 0]))
        elif obj.name == "Deformer":
            kind = str(obj.prop(2, ""))
            did = obj.prop(0)
            if kind == "Cluster":
                idx = obj.find("Indexes")
                w = obj.find("Weights")
                tf = obj.find("Transform")
                tl = obj.find("TransformLink")
                clusters[did] = FbxCluster(
                    cid=did,
                    indexes=np.asarray(idx.prop(0), np.int64) if idx is not None else np.zeros(0, np.int64),
                    weights=np.asarray(w.prop(0), np.float64) if w is not None else np.zeros(0),
                    transform=_mat_from_fbx16(tf.prop(0)) if tf is not None else np.eye(4),
                    transform_link=_mat_from_fbx16(tl.prop(0)) if tl is not None else np.eye(4))
            elif kind == "Skin":
                skins[did] = obj
        elif obj.name == "Material":
            materials[obj.prop(0)] = FbxMaterial(
                mid=obj.prop(0),
                name=str(obj.prop(1, "")).replace("Material::", ""),
                props=_props70(obj))
        elif obj.name == "Texture":
            fn = obj.find("RelativeFilename") or obj.find("FileName")
            textures[obj.prop(0)] = str(fn.prop(0)) if fn is not None else ""

    oo_parents: dict = {}
    op_links = []
    if connections is not None:
        for c in connections.find_all("C"):
            kind = c.prop(0)
            if kind == "OO":
                oo_parents.setdefault(c.prop(1), []).append(c.prop(2))
            elif kind == "OP":
                op_links.append((c.prop(1), c.prop(2), c.prop(3)))

    return FbxScene(geometries=geometries, models=models, clusters=clusters,
                    skins=skins, materials=materials, textures=textures,
                    oo_parents=oo_parents, op_links=op_links)


# ---------------------------------------------------------------------------
# Triangulated, attribute-split mesh view


@dataclass
class TriMesh:
    positions: np.ndarray     # (V,3)
    normals: np.ndarray       # (V,3)
    uvs: np.ndarray           # (V,2)
    indices: np.ndarray       # (I,) triangles
    ctrl_point: np.ndarray    # (V,) source control point per split vertex
    tri_material: np.ndarray  # (T,) material slot per triangle


def triangulate(geo: FbxGeometry, flip_v: bool = True) -> TriMesh:
    """Fan-triangulate polygons; split vertices by (ctrl, normal, uv) tuple."""
    raw = geo.polygon_indices
    # decode polygons: negative value marks last corner (xor -1)
    corners = np.where(raw < 0, -raw - 1, raw)
    poly_end = raw < 0

    # per-corner attribute ids
    n_corners = len(raw)
    if geo.normals is not None:
        if geo.normal_mapping == "ByPolygonVertex":
            nid = (geo.normal_index if geo.normal_ref == "IndexToDirect"
                   and geo.normal_index is not None else np.arange(n_corners))
        elif geo.normal_mapping in ("ByVertice", "ByVertex", "ByControlPoint"):
            nid = corners
        else:
            nid = np.zeros(n_corners, np.int64)
    else:
        nid = np.zeros(n_corners, np.int64)
    if geo.uv is not None:
        if geo.uv_mapping == "ByPolygonVertex":
            uid = (geo.uv_index if geo.uv_ref == "IndexToDirect"
                   and geo.uv_index is not None else np.arange(n_corners))
        elif geo.uv_mapping in ("ByVertice", "ByVertex", "ByControlPoint"):
            uid = corners
        else:
            uid = np.zeros(n_corners, np.int64)
    else:
        uid = np.zeros(n_corners, np.int64)

    keys = np.stack([corners, nid, uid], axis=1)
    uniq, inverse = np.unique(keys, axis=0, return_inverse=True)

    positions = geo.control_points[uniq[:, 0]]
    if geo.normals is not None:
        normals = geo.normals[uniq[:, 1]]
    else:
        normals = np.tile([0.0, 1.0, 0.0], (len(uniq), 1))
    if geo.uv is not None:
        uvs = geo.uv[uniq[:, 2]].copy()
        if flip_v:
            uvs[:, 1] = 1.0 - uvs[:, 1]
    else:
        uvs = np.zeros((len(uniq), 2))

    # polygon ids per corner
    poly_id = np.concatenate([[0], np.cumsum(poly_end)[:-1]])

    # fan triangulation
    tris = []
    tri_poly = []
    start = 0
    for i in range(n_corners):
        if poly_end[i]:
            count = i - start + 1
            for k in range(1, count - 1):
                tris.append((inverse[start], inverse[start + k],
                             inverse[start + k + 1]))
                tri_poly.append(poly_id[start])
            start = i + 1
    tris = np.asarray(tris, np.int64).reshape(-1, 3)
    tri_poly = np.asarray(tri_poly, np.int64)

    if geo.material_indices is not None and geo.material_mapping == "ByPolygon":
        tri_material = geo.material_indices[tri_poly]
    else:
        tri_material = np.zeros(len(tris), np.int64)

    return TriMesh(positions=positions.astype(np.float64),
                   normals=normals.astype(np.float64),
                   uvs=uvs.astype(np.float64),
                   indices=tris.reshape(-1),
                   ctrl_point=uniq[:, 0],
                   tri_material=tri_material)


def geometry_of_model(scene: FbxScene, mid: int):
    for gid, g in scene.geometries.items():
        if mid in scene.parents_of(gid):
            return g
    return None


def materials_of_model(scene: FbxScene, mid: int):
    """Material ids connected to a model, in connection order."""
    out = []
    for cid, parents in scene.oo_parents.items():
        if mid in parents and cid in scene.materials:
            out.append(cid)
    return out


def skin_of_geometry(scene: FbxScene, gid: int):
    for sid in scene.skins:
        if gid in scene.parents_of(sid):
            return sid
    return None


def clusters_of_skin(scene: FbxScene, sid: int):
    return [cid for cid, c in scene.clusters.items()
            if sid in scene.parents_of(cid)]


def bone_of_cluster(scene: FbxScene, cid: int):
    """The LimbNode model connected INTO this cluster."""
    for mid, parents in scene.oo_parents.items():
        if cid in parents and mid in scene.models and \
                scene.models[mid].kind == "LimbNode":
            return mid
    return None
