"""Broadphase candidate lists (physics): gather_candidates correctness and
pipeline parity with the full-soup path.

Reference analog: the per-query BVH descent bounding narrowphase work
(CollisionQuery.swift:496-707); here a batched AABB prefilter gathered into
fixed-capacity nearest-first per-agent sub-soups (queries.gather_candidates).
"""

import numpy as np
import jax
import jax.numpy as jnp

from swift_game_engine_tpu.assets import procedural_meshes as pm
from swift_game_engine_tpu.physics.collision_world import (
    CollisionWorldBuilder, transform_soup)
from swift_game_engine_tpu.physics import character as C
from swift_game_engine_tpu.physics import queries as Q
import pytest

pytestmark = pytest.mark.fast

DT = 1.0 / 60.0
GRAVITY = jnp.array([0.0, -98.0, 0.0])


def _grid_soup(cells=12, size=60.0):
    """A finely tessellated ground: cells^2 quads -> 2*cells^2 triangles,
    enough rows that the candidate path engages at small caps."""
    b = CollisionWorldBuilder()
    xs = np.linspace(-size / 2, size / 2, cells + 1, dtype=np.float32)
    verts = []
    idx = []
    for j in range(cells + 1):
        for i in range(cells + 1):
            verts.append([xs[i], 0.0, xs[j]])
    for j in range(cells):
        for i in range(cells):
            a = j * (cells + 1) + i
            bq = a + 1
            c = a + cells + 1
            d = c + 1
            idx += [[a, c, bq], [bq, c, d]]
    b.add_mesh(np.asarray(verts, np.float32), np.asarray(idx, np.int64),
               entity=0)
    # a wall the walker runs into
    wall = pm.box(6.0)
    b.add_mesh(wall.positions, wall.indices, entity=1)
    local = b.build()
    tf = np.stack([np.eye(4, dtype=np.float32),
                   np.eye(4, dtype=np.float32)])
    tf[1][:3, 3] = [8.0, 3.0, 0.0]
    return transform_soup(local, jnp.asarray(tf))


def test_gather_candidates_complete():
    """Every valid triangle overlapping the query box appears in the list
    (when count <= cap), with its global id."""
    soup = _grid_soup()
    rng = np.random.default_rng(0)
    n = 6
    center = jnp.asarray(rng.uniform(-20, 20, (n, 3)).astype(np.float32))
    hh = jnp.full((n,), 1.0)
    r = jnp.full((n,), 1.5)
    reach = jnp.full((n,), 2.0)
    cap = 64
    sub, count = jax.jit(lambda: Q.gather_candidates(
        soup, center, hh, r, reach, cap))()
    tmin, tmax = soup.aabb
    tmin, tmax = np.asarray(tmin), np.asarray(tmax)
    c_np = np.asarray(center)
    for i in range(n):
        ext = np.array([1.5 + 2.0, 1.0 + 1.5 + 2.0, 1.5 + 2.0])
        qmin, qmax = c_np[i] - ext, c_np[i] + ext
        ref = np.where(np.all((qmin <= tmax) & (qmax >= tmin), axis=-1)
                       & np.asarray(soup.valid))[0]
        assert int(count[i]) == len(ref)
        assert len(ref) <= cap  # test geometry stays under cap
        got = set(np.asarray(sub.tri_id[i])[np.asarray(sub.valid[i])])
        assert got == set(ref.tolist())


def test_pipeline_parity_with_candidates():
    """Walker + faller over the tessellated ground: candidate-list path
    (cap < T) matches the full-soup path bit-for-bit over 90 substeps."""
    soup = _grid_soup()
    assert int(soup.v0.shape[0]) > 96
    pos0 = jnp.array([[0.0, 2.6, 0.0], [4.0, 9.0, 4.0]])
    vel0 = jnp.array([[6.0, 0.0, 0.0], [0.0, 0.0, 0.0]])

    def run(cap):
        pipe = C.CharacterPipeline(broadphase_cap=cap)
        n = pos0.shape[0]
        params = C.ControllerParams.default(n)
        platforms = C.PlatformSet.empty()
        state = C.ControllerState.initial(n)
        pos, vel = pos0, vel0

        @jax.jit
        def one(pos, vel, state):
            gs = state.grounded & state.grounded_near
            vel = jnp.where(gs[:, None], vel, vel + GRAVITY * DT)
            vel = vel.at[0, 0].set(6.0)  # keep walking toward the wall
            return pipe.step(soup, pos, vel, state, params, platforms, DT)

        for _ in range(90):
            pos, vel, state = one(pos, vel, state)
        return np.asarray(pos), np.asarray(vel), state

    p_full, v_full, st_full = run(0)
    p_cand, v_cand, st_cand = run(96)
    assert np.allclose(p_full, p_cand, atol=1e-5), (p_full, p_cand)
    assert np.allclose(v_full, v_cand, atol=1e-5)
    assert (np.asarray(st_full.ground_tri) ==
            np.asarray(st_cand.ground_tri)).all()
    assert (np.asarray(st_full.manifold_tri) ==
            np.asarray(st_cand.manifold_tri)).all()
    # both agents ended grounded on the grid
    assert bool(st_cand.grounded[0]) and bool(st_cand.grounded[1])
