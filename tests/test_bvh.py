"""BVH build/refit/traversal correctness vs brute force."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swift_game_engine_tpu.render import bvh as B
from swift_game_engine_tpu.assets import procedural_meshes as pm

pytestmark = pytest.mark.fast


def random_soup(rng, n_tris=200, spread=10.0):
    base = rng.uniform(-spread, spread, (n_tris, 1, 3))
    tris = base + rng.uniform(-1.0, 1.0, (n_tris, 3, 3))
    return tris.astype(np.float32)


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(7)
    tris = random_soup(rng)
    v0, v1, v2 = tris[:, 0], tris[:, 1], tris[:, 2]
    tri_min = np.minimum(np.minimum(v0, v1), v2)
    tri_max = np.maximum(np.maximum(v0, v1), v2)
    topo = B.build_bvh(tri_min, tri_max)
    arrays = B.refit(topo, jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2))
    return tris, topo, arrays


def test_topology_invariants(scene):
    tris, topo, arrays = scene
    t = len(tris)
    # every triangle appears exactly once across leaves
    leaf_ids = np.asarray(arrays.slot_tri)
    ids = leaf_ids[leaf_ids >= 0]
    assert sorted(ids.tolist()) == list(range(t))
    # preorder: internal node's left child is node+1
    internal = np.nonzero(np.asarray(topo.tri_count) == 0)[0]
    np.testing.assert_array_equal(np.asarray(topo.left)[internal], internal + 1)


def test_refit_bounds_contain_triangles(scene):
    tris, topo, arrays = scene
    bmin = np.asarray(arrays.bmin)
    bmax = np.asarray(arrays.bmax)
    # root bounds contain everything
    np.testing.assert_array_less(bmin[0] - 1e-4, tris.reshape(-1, 3).min(axis=0) + 1e-3)
    assert (bmax[0] >= tris.reshape(-1, 3).max(axis=0) - 1e-4).all()


def brute_force(tris, origin, direction):
    from swift_game_engine_tpu.physics.primitives import ray_triangle
    hit, t = ray_triangle(jnp.asarray(origin), jnp.asarray(direction),
                          jnp.asarray(tris[:, 0]), jnp.asarray(tris[:, 1]),
                          jnp.asarray(tris[:, 2]))
    t = np.where(np.asarray(hit) & (np.asarray(t) > 1e-4), np.asarray(t), np.inf)
    i = int(np.argmin(t))
    return (t[i], i) if np.isfinite(t[i]) else (np.inf, -1)


def test_traversal_matches_brute_force(scene):
    tris, topo, arrays = scene
    rng = np.random.default_rng(3)
    trav = jax.jit(jax.vmap(lambda o, d: B.traverse(arrays, o, d, 1e6)))
    origins = rng.uniform(-15, 15, (64, 3)).astype(np.float32)
    # half aimed at random triangles
    targets = tris[rng.integers(len(tris), size=64)].mean(axis=1)
    dirs = targets - origins
    dirs[32:] = rng.standard_normal((32, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    t, tri, u, v, found = trav(jnp.asarray(origins), jnp.asarray(dirs))
    t = np.asarray(t); tri = np.asarray(tri); found = np.asarray(found)
    n_hits = 0
    for i in range(64):
        bt, btri = brute_force(tris, origins[i], dirs[i])
        if btri < 0:
            assert not found[i]
        else:
            n_hits += 1
            assert found[i]
            assert t[i] == pytest.approx(bt, abs=1e-3)
            # same triangle OR coplanar duplicate at the same t
            if tri[i] != btri:
                assert abs(t[i] - bt) < 1e-3
    assert n_hits >= 20


def test_refit_tracks_moving_geometry(scene):
    tris, topo, _ = scene
    moved = tris + np.array([5.0, 0.0, 0.0], np.float32)
    arrays = B.refit(topo, jnp.asarray(moved[:, 0]), jnp.asarray(moved[:, 1]),
                     jnp.asarray(moved[:, 2]))
    origin = np.array([0.0, 0.0, -50.0], np.float32)
    target = moved[0].mean(axis=0)
    d = target - origin
    d /= np.linalg.norm(d)
    t, tri, u, v, found = B.traverse(arrays, jnp.asarray(origin), jnp.asarray(d), 1e6)
    bt, btri = brute_force(moved, origin, d)
    assert bool(found) == (btri >= 0)
    if btri >= 0:
        assert float(t) == pytest.approx(bt, abs=1e-3)


def test_traversal_mesh(scene):
    # Real mesh: capsule; ray from outside must hit at analytic distance.
    cap = pm.capsule(1.0, 1.0, 24, 8)
    v0 = cap.positions[cap.indices.reshape(-1, 3)[:, 0]]
    v1 = cap.positions[cap.indices.reshape(-1, 3)[:, 1]]
    v2 = cap.positions[cap.indices.reshape(-1, 3)[:, 2]]
    topo = B.build_bvh(np.minimum(np.minimum(v0, v1), v2),
                       np.maximum(np.maximum(v0, v1), v2))
    arrays = B.refit(topo, jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2))
    t, tri, u, v, found = B.traverse(arrays, jnp.array([5.0, 0.0, 0.0]),
                                     jnp.array([-1.0, 0.0, 0.0]), 1e6)
    assert bool(found)
    assert float(t) == pytest.approx(4.0, abs=0.05)  # radius 1 capsule side
