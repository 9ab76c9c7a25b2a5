"""Capsule CCD / overlap / raycast query tests vs scalar oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from swift_game_engine_tpu.physics.collision_world import CollisionWorldBuilder, transform_soup
from swift_game_engine_tpu.physics import queries as Q
from swift_game_engine_tpu.assets import procedural_meshes as pm

import oracle_collision as O

pytestmark = pytest.mark.fast


def build_soup(meshes):
    """meshes: list of (MeshDescriptor, kwargs)."""
    b = CollisionWorldBuilder()
    for i, (mesh, kw) in enumerate(meshes):
        b.add_mesh(mesh.positions, mesh.indices, entity=i, **kw)
    local = b.build()
    transforms = jnp.tile(jnp.eye(4, dtype=jnp.float32), (len(meshes), 1, 1))
    return local, transform_soup(local, transforms)


@pytest.fixture(scope="module")
def scene():
    ground = pm.plane(40.0)
    box = pm.box(4.0)  # centered at origin; overlaps ground
    local, soup = build_soup([(ground, {}), (box, dict(mu_s=0.5, mu_k=0.3))])
    return local, soup, ground, box


def soup_tris(soup):
    v0 = np.asarray(soup.v0)
    v1 = np.asarray(soup.v1)
    v2 = np.asarray(soup.v2)
    valid = np.asarray(soup.valid)
    return [(v0[i], v1[i], v2[i]) for i in range(len(valid)) if valid[i]]


def test_cast_down_onto_plane(scene):
    _, soup, _, _ = scene
    r, hh = 1.5, 1.0
    start = np.array([10.0, 10.0, 10.0], np.float32)  # off the box, above ground
    delta = np.array([0.0, -20.0, 0.0], np.float32)
    hit = Q.capsule_cast(soup, start, delta, r, hh)
    assert bool(hit.hit)
    # capsule bottom reaches plane y=0 when center = hh + r
    expected_toi = 10.0 - (hh + r)
    assert float(hit.toi) == pytest.approx(expected_toi, abs=0.01)
    assert float(hit.normal[1]) == pytest.approx(1.0, abs=1e-3)
    assert float(hit.tri_normal[1]) == pytest.approx(1.0, abs=1e-3)


def test_cast_into_wall_blocking(scene):
    _, soup, _, _ = scene
    r, hh = 0.5, 0.5
    start = np.array([6.0, 1.0, 0.0], np.float32)
    delta = np.array([-8.0, 0.0, 0.0], np.float32)  # toward the box at x=2 face
    hit = Q.capsule_cast(soup, start, delta, r, hh, blocking=True)
    assert bool(hit.hit)
    assert float(hit.toi) == pytest.approx(6.0 - 2.0 - r, abs=0.01)
    assert float(hit.normal[0]) == pytest.approx(1.0, abs=1e-2)
    # material comes from the box mesh
    assert float(hit.mu_s) == pytest.approx(0.5)


def test_blocking_rejects_receding(scene):
    _, soup, _, _ = scene
    r, hh = 0.5, 0.5
    # Start inside contact with the wall, moving away: blocking cast must miss.
    start = np.array([2.0 + r + 0.01, 1.0, 0.0], np.float32)
    delta = np.array([3.0, 0.0, 0.0], np.float32)
    hit = Q.capsuleCast if False else Q.capsule_cast(soup, start, delta, r, hh, blocking=True)
    assert not bool(hit.hit)


def test_ground_cast_min_normal_filter(scene):
    _, soup, _, _ = scene
    r, hh = 0.5, 0.5
    # Horizontal cast at a wall with ground filter: wall normal.y=0 < 0.5 -> miss.
    # Start high enough that the capsule does not graze the ground plane.
    start = np.array([6.0, 1.2, 0.0], np.float32)
    delta = np.array([-8.0, 0.0, 0.0], np.float32)
    hit = Q.capsule_cast(soup, start, delta, r, hh, min_normal_y=0.5)
    assert not bool(hit.hit)


def test_cast_matches_oracle_random():
    rng = np.random.default_rng(42)
    tris = []
    b = CollisionWorldBuilder()
    pts = []
    for _ in range(30):
        base = rng.uniform(-5, 5, 3)
        v = base + rng.uniform(-2, 2, (3, 3))
        pts.append(v)
    positions = np.concatenate(pts).astype(np.float32)
    indices = np.arange(len(positions), dtype=np.int32)
    b.add_mesh(positions, indices, entity=0)
    local = b.build()
    soup = transform_soup(local, jnp.eye(4)[None])
    otris = soup_tris(soup)

    n_match = 0
    for i in range(12):
        start = rng.uniform(-8, 8, 3).astype(np.float32)
        if i % 2 == 0:
            # Aim at a random triangle centroid so a good fraction hit.
            target = otris[rng.integers(len(otris))]
            centroid = np.mean(target, axis=0)
            delta = ((centroid - start) * rng.uniform(1.0, 1.5)).astype(np.float32)
        else:
            delta = rng.uniform(-10, 10, 3).astype(np.float32)
        r = float(rng.uniform(0.2, 1.5))
        hh = float(rng.uniform(0.1, 1.5))
        got = Q.capsule_cast(soup, start, delta, r, hh)
        want = O.capsule_cast_soup(otris, start, delta, r, hh)
        if want is None:
            assert not bool(got.hit), (start, delta, r, hh)
        else:
            assert bool(got.hit)
            assert float(got.toi) == pytest.approx(want["toi"], abs=5e-3)
            n_match += 1
    assert n_match >= 4  # scene dense enough that several casts hit


def test_overlap_depth(scene):
    _, soup, _, _ = scene
    r, hh = 1.0, 0.5
    # Capsule centered just above ground plane, bottom penetrating by 0.3
    center = np.array([10.0, hh + r - 0.3, 10.0], np.float32)
    hits = Q.capsule_overlap_all(soup, center, r, hh)
    assert bool(hits.valid[0])
    assert float(hits.depth[0]) == pytest.approx(0.3, abs=1e-4)
    assert float(hits.normal[0][1]) == pytest.approx(1.0, abs=1e-4)
    # deepest-first ordering
    d = np.asarray(hits.depth)
    assert (np.diff(d) <= 1e-6).all()


def test_overlap_none(scene):
    _, soup, _, _ = scene
    hits = Q.capsule_overlap_all(soup, np.array([10.0, 5.0, 10.0], np.float32), 1.0, 0.5)
    assert not bool(hits.valid.any())


def test_raycast(scene):
    _, soup, _, _ = scene
    hit = Q.raycast(soup, np.array([1.0, 5.0, 1.0], np.float32),
                    np.array([0.0, -1.0, 0.0], np.float32), 100.0)
    assert bool(hit.hit)
    # box top at y=2 is hit before ground
    assert float(hit.distance) == pytest.approx(3.0, abs=1e-4)
    assert float(hit.normal[1]) == pytest.approx(1.0, abs=1e-5)


def test_layer_mask(scene):
    _, soup, _, _ = scene
    hit = Q.raycast(soup, np.array([1.0, 5.0, 1.0], np.float32),
                    np.array([0.0, -1.0, 0.0], np.float32), 100.0,
                    mask=jnp.uint32(0x2))
    assert not bool(hit.hit)  # both meshes on layer 1


def test_analytic_matches_conservative_advancement():
    """The analytic TOI must agree with the reference-schedule CA cast
    (256 iters + bisection) on dense random sweeps."""
    rng = np.random.default_rng(7)
    pts = []
    for _ in range(40):
        base = rng.uniform(-6, 6, 3)
        pts.append(base + rng.uniform(-2.5, 2.5, (3, 3)))
    positions = np.concatenate(pts).astype(np.float32)
    b = CollisionWorldBuilder()
    b.add_mesh(positions, np.arange(len(positions), dtype=np.int32), entity=0)
    soup = transform_soup(b.build(), jnp.eye(4)[None])

    n_hits = 0
    for i in range(60):
        start = rng.uniform(-9, 9, 3).astype(np.float32)
        if i % 2 == 0:
            t = pts[rng.integers(len(pts))]
            delta = ((t.mean(0) - start) * rng.uniform(0.9, 1.6)).astype(np.float32)
        else:
            delta = rng.uniform(-12, 12, 3).astype(np.float32)
        r = float(rng.uniform(0.15, 1.8))
        hh = float(rng.uniform(0.05, 1.8))
        g = Q.capsule_cast(soup, start, delta, r, hh)
        w = Q.capsule_cast_ca(soup, start, delta, r, hh, max_iters=256)
        assert bool(g.hit) == bool(w.hit), (i, float(g.toi), float(w.toi))
        if bool(g.hit):
            n_hits += 1
            assert float(g.toi) == pytest.approx(float(w.toi), abs=1e-3)
    assert n_hits >= 20
