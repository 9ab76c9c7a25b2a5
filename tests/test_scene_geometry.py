"""Scene geometry packing: vertex pool alignment with mixed static/skinned."""

import numpy as np
import jax.numpy as jnp

from swift_game_engine_tpu.assets import procedural_meshes as pm
from swift_game_engine_tpu.assets.materials import Material
from swift_game_engine_tpu.render.scene_geometry import (RenderGeometryBuilder,
                                                         flatten_frame)


def test_interleaved_static_skinned_alignment():
    b = RenderGeometryBuilder(texture_size=16)
    mat = Material(name="m")
    plane = pm.plane(10.0)          # 4 verts
    b.add_static_mesh(plane, mat, instance=0)

    # skinned quad between the two statics (insertion order != pool order)
    sk = pm.humanoid_skinned(radial_segments=3, height_segments=1)
    from swift_game_engine_tpu.assets.skinned_mesh import dense_weight_matrix
    dense = dense_weight_matrix(sk.joints, sk.weights, 8)
    b.add_skinned_mesh(sk.positions, sk.normals, sk.uvs, sk.indices, dense,
                       [mat], [(0, len(sk.indices))], instance=1, character=0)

    box = pm.box(2.0)               # 24 verts
    b.add_static_mesh(box, mat, instance=2)

    geo = b.build()
    n_static = 4 + 24
    assert geo.n_static_verts == n_static
    assert geo.uv.shape[0] == n_static + sk.vertex_count
    inst = np.asarray(geo.vert_instance)
    assert (inst[:4] == 0).all()
    assert (inst[4:28] == 2).all()
    assert (inst[28:] == 1).all()

    # flatten: statics land where their transforms put them
    tf = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    tf[0, :3, 3] = [100, 0, 0]
    tf[2, :3, 3] = [0, 0, 50]
    palettes = jnp.tile(jnp.eye(4), (1, 8, 1, 1))
    fg = flatten_frame(geo, jnp.asarray(tf), palettes)
    pos = np.asarray(fg.pos)
    assert abs(pos[:4, 0].mean() - 100.0) < 1e-4          # plane at x=100
    assert abs(pos[4:28, 2].mean() - 50.0) < 1e-4         # box at z=50
    # skinned verts (identity palette + identity instance) = bind positions
    np.testing.assert_allclose(pos[28:], sk.positions, atol=1e-4)
    # triangles reference valid verts and the right sections
    tri = np.asarray(geo.tri)
    assert tri.max() < len(pos)
    # box triangles hit box verts
    box_tris = tri[(tri >= 4).all(axis=1) & (tri < 28).all(axis=1)]
    assert len(box_tris) == box.triangle_count
