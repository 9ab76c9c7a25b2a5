"""Grid separation == all-pairs separation (same pairs, same math).

The XZ-grid candidate path (physics.separation._grid_candidates) must find
exactly the pairs the dense matrix finds — the grid only changes candidate
GENERATION, not the pair math — so the Jacobi accumulations agree to
summation-order rounding.
"""

import numpy as np
import jax
import jax.numpy as jnp

from swift_game_engine_tpu.physics import separation as S
from swift_game_engine_tpu.physics.character import ControllerParams
import pytest

pytestmark = pytest.mark.fast


def _params(n, rng):
    p = ControllerParams.default(n)
    return p._replace(
        agent_radius=jnp.asarray(rng.uniform(0.4, 1.5, n).astype(np.float32)),
        half_height=jnp.asarray(rng.uniform(0.5, 1.2, n).astype(np.float32)),
        agent_mass_weight=jnp.asarray(rng.uniform(0.5, 4.0, n).astype(np.float32)),
        agent_solid=jnp.asarray(rng.random(n) > 0.1),
        active=jnp.asarray(rng.random(n) > 0.05),
    )


def _accum(position, velocity, params, use_grid):
    n = position.shape[0]
    solid = params.agent_solid & params.active
    inv_w = jnp.where(params.agent_mass_weight > 0,
                      1.0 / jnp.maximum(params.agent_mass_weight, 1e-20), 0.0)
    if use_grid:
        rows, ok = S._grid_candidate_rows(position, velocity, params,
                                          inv_w, solid, 0.2)
        pair_ok = ok & (rows[..., 10] != jnp.arange(n)[:, None]) & \
            solid[:, None] & (rows[..., 9] > 0.5)
        return S._pair_accumulate_rows(position, velocity, rows, pair_ok,
                                       params, inv_w, 0.2, 0.1)
    j_idx = jnp.broadcast_to(jnp.arange(n)[None, :], (n, n))
    pair_ok = solid[:, None] & solid[None, :] & ~jnp.eye(n, dtype=bool)
    return S._pair_accumulate(position, velocity, j_idx, pair_ok,
                              params, inv_w, 0.2, 0.1)


def test_grid_matches_all_pairs_dense_cluster():
    rng = np.random.default_rng(7)
    n = 48
    pos = rng.uniform(-6, 6, (n, 3)).astype(np.float32)   # heavy overlap
    pos[:, 1] = rng.uniform(-0.5, 0.5, n)
    vel = rng.normal(size=(n, 3)).astype(np.float32)
    params = _params(n, rng)
    dp_g, dv_g = _accum(jnp.asarray(pos), jnp.asarray(vel), params, True)
    dp_d, dv_d = _accum(jnp.asarray(pos), jnp.asarray(vel), params, False)
    np.testing.assert_allclose(np.asarray(dp_g), np.asarray(dp_d),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dv_g), np.asarray(dv_d),
                               rtol=1e-5, atol=1e-5)


def test_grid_matches_all_pairs_spread():
    rng = np.random.default_rng(8)
    n = 96
    pos = rng.uniform(-80, 80, (n, 3)).astype(np.float32)  # sparse crowd
    pos[:, 1] = 0.0
    vel = rng.normal(size=(n, 3)).astype(np.float32)
    params = _params(n, rng)
    dp_g, dv_g = _accum(jnp.asarray(pos), jnp.asarray(vel), params, True)
    dp_d, dv_d = _accum(jnp.asarray(pos), jnp.asarray(vel), params, False)
    np.testing.assert_allclose(np.asarray(dp_g), np.asarray(dp_d),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dv_g), np.asarray(dv_d),
                               rtol=1e-5, atol=1e-5)


def test_grid_handles_parked_agents():
    """Despawned agents parked at huge coordinates must not disturb live
    pairs (int32 key clamp) — they are masked out of solidity anyway."""
    rng = np.random.default_rng(9)
    n = 80
    pos = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    pos[:, 1] = 0.0
    pos[70:] = 1.0e9
    vel = np.zeros((n, 3), np.float32)
    params = _params(n, rng)
    params = params._replace(active=params.active.at[70:].set(False))
    dp_g, _ = _accum(jnp.asarray(pos), jnp.asarray(vel), params, True)
    dp_d, _ = _accum(jnp.asarray(pos), jnp.asarray(vel), params, False)
    np.testing.assert_allclose(np.asarray(dp_g), np.asarray(dp_d),
                               rtol=1e-5, atol=1e-5)
