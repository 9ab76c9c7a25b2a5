"""Render path regression tests (tiny resolution, CPU, pure-JAX traversal)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swift_game_engine_tpu.assets import procedural_meshes as pm
from swift_game_engine_tpu.assets.materials import Material
from swift_game_engine_tpu.render.scene_geometry import RenderGeometryBuilder, flatten_frame
from swift_game_engine_tpu.render import rt as RT
from swift_game_engine_tpu.render.raster import render_frame_raster
from swift_game_engine_tpu.render.ibl import IBL
from swift_game_engine_tpu.render.camera import Camera

W, H = 32, 24


@pytest.fixture(scope="module")
def scene():
    b = RenderGeometryBuilder(texture_size=16)
    b.add_static_mesh(pm.plane(40.0), Material(
        name="ground", base_color_factor=(0.5, 0.5, 0.5), roughness_factor=0.9),
        instance=0)
    b.add_static_mesh(pm.box(3.0), Material(
        name="red", base_color_factor=(0.8, 0.1, 0.1), roughness_factor=0.4),
        instance=1)
    b.add_static_mesh(pm.box(2.0), Material(
        name="glow", base_color_factor=(0, 0, 0), emissive_factor=(3.0, 0.2, 0.2),
        unlit=True), instance=2)
    geo = b.build()
    tf = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    tf[1, :3, 3] = [0, 1.5, 0]
    tf[2, :3, 3] = [5, 1.0, 0]
    fg = flatten_frame(geo, jnp.asarray(tf), jnp.zeros((1, 1, 4, 4)))
    cam = Camera()
    cam.position = np.array([0.0, 4.0, 10.0], np.float32)
    cam.target = np.array([0.0, 1.0, 0.0], np.float32)
    ivp = cam.inv_view_proj(W, H)
    return geo, fg, cam, ivp


def test_rt_frame(scene):
    geo, fg, cam, ivp = scene
    ibl = IBL.build()
    lights = RT.DirectionalLights.default_sun()
    img = np.asarray(jax.jit(lambda: RT.render_frame(
        geo, fg, ibl, lights, ivp, cam.position, W, H,
        max_layers=2, shadow_layers=1))())
    assert img.shape == (H, W, 3)
    assert np.isfinite(img).all()
    # sky in the top rows is the dark background
    np.testing.assert_allclose(img[0].mean(axis=0), [0.02, 0.02, 0.03], atol=0.02)
    # box in view center is predominantly red
    center = img[H // 2 - 2:H // 2 + 2, W // 2 - 2:W // 2 + 2].mean(axis=(0, 1))
    assert center[0] > center[1] * 1.5 and center[0] > center[2] * 1.5
    # ground at the bottom is lit gray (non-trivially bright)
    assert img[-2].mean() > 0.1


def test_raster_frame_matches_material_model(scene):
    geo, fg, cam, ivp = scene
    img = np.asarray(jax.jit(lambda: render_frame_raster(
        geo, fg, ivp, cam.position, W, H, max_layers=1))())
    assert img.shape == (H, W, 3)
    assert np.isfinite(img).all()
    center = img[H // 2 - 2:H // 2 + 2, W // 2 - 2:W // 2 + 2].mean(axis=(0, 1))
    assert center[0] > center[1] * 1.5  # red box
    # unlit emissive box on the right edge of view should be bright red
    right = img[:, int(W * 0.85):].reshape(-1, 3)
    assert right[:, 0].max() > 0.9
    # Material binding regression (materials must be indexed by the
    # MATERIAL id of the hit triangle, not its triangle id): the ground
    # plane spans triangle ids 0..1 but is all material 0 — every bottom-row
    # pixel must be neutral gray (r == g == b for the gray albedo under the
    # white wrap light), never the red box / glow materials.
    bottom = img[-3:].reshape(-1, 3)
    np.testing.assert_allclose(bottom[:, 0], bottom[:, 1], atol=1e-5)
    np.testing.assert_allclose(bottom[:, 1], bottom[:, 2], atol=1e-5)


def test_rt_emissive_unshaded(scene):
    geo, fg, cam, ivp = scene
    ibl = IBL.build()
    lights = RT.DirectionalLights.default_sun()
    img = np.asarray(jax.jit(lambda: RT.render_frame(
        geo, fg, ibl, lights, ivp, cam.position, W, H,
        max_layers=1, shadow_layers=1, enable_mirror=False,
        enable_refraction=False))())
    right = img[:, int(W * 0.8):].reshape(-1, 3)
    assert right[:, 0].max() > 1.5  # emissive 3.0 shows pre-tonemap


def test_rt_unlit_material_shades_flat(scene):
    """Material.unlit shades as albedo+emissive with no lighting (the raster
    fragment shader's unlit branch, ShadersRaster.metalinc:73-75) and casts
    the layer's alpha unchanged. The reference RT kernel shades everything,
    but the material model is authoritative for unlit-authored content (the
    collision-hull viz); see rt._UNLIT_FAST."""
    import os
    if os.environ.get("SGE_RT_UNLIT", "1") != "1":
        pytest.skip("unlit fast path disabled")
    b = RenderGeometryBuilder(texture_size=16)
    b.add_static_mesh(pm.plane(40.0), Material(
        name="ground", base_color_factor=(0.3, 0.3, 0.3), roughness_factor=0.9),
        instance=0)
    b.add_static_mesh(pm.box(3.0), Material(
        name="flat", base_color_factor=(0.2, 0.7, 0.2), unlit=True),
        instance=1)
    geo = b.build()
    tf = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    tf[1, :3, 3] = [0, 1.5, 0]
    fg = flatten_frame(geo, jnp.asarray(tf), jnp.zeros((1, 1, 4, 4)))
    cam = Camera()
    cam.position = np.array([0.0, 4.0, 10.0], np.float32)
    cam.target = np.array([0.0, 1.0, 0.0], np.float32)
    ivp = cam.inv_view_proj(W, H)
    ibl = IBL.build()
    lights = RT.DirectionalLights.default_sun()
    img = np.asarray(jax.jit(lambda: RT.render_frame(
        geo, fg, ibl, lights, ivp, cam.position, W, H,
        max_layers=1, shadow_layers=2))())
    # every visible box pixel is EXACTLY the albedo (pre-dither):
    # no shading gradient across faces, no shadowing, no specular
    center = img[H // 2 - 3:H // 2 + 3, W // 2 - 3:W // 2 + 3]
    np.testing.assert_allclose(center, np.broadcast_to([0.2, 0.7, 0.2],
                                                       center.shape),
                               atol=0.01)


def test_rt_textured_material():
    """Texture taps behind the runtime any-lane gate still sample correctly."""
    from swift_game_engine_tpu.assets.procedural_textures import checkerboard
    b = RenderGeometryBuilder(texture_size=32)
    mat = Material(name="check", base_color_factor=(1, 1, 1),
                   roughness_factor=0.9,
                   base_color_texture=checkerboard(32, 32, cell=4,
                                                   color_a=255, color_b=10))
    b.add_static_mesh(pm.plane(40.0), mat, instance=0)
    geo = b.build()
    tf = np.eye(4, dtype=np.float32)[None]
    fg = flatten_frame(geo, jnp.asarray(tf), jnp.zeros((1, 1, 4, 4)))
    cam = Camera()
    cam.position = np.array([0.0, 8.0, 8.0], np.float32)
    cam.target = np.array([0.0, 0.0, 0.0], np.float32)
    ivp = cam.inv_view_proj(W, H)
    ibl = IBL.build()
    lights = RT.DirectionalLights.default_sun()
    img = np.asarray(jax.jit(lambda: RT.render_frame(
        geo, fg, ibl, lights, ivp, cam.position, W, H,
        max_layers=1, shadow_layers=1))())
    assert np.isfinite(img).all()
    # the checker must be visible: bright and dark ground pixels coexist
    ground = img[H // 2:]  # lower half shows the plane
    lum = ground.mean(axis=-1)
    assert lum.max() > lum.min() * 3 + 0.05


def test_rt_mirror_reflection():
    """The deterministic mirror bounce (roughness<=0.08, metallic>=0.8)
    reflects scene content: a mirror wall facing a bright emissive box must
    show elevated red in the wall pixels vs the same wall with the box
    removed (reference: RayTracing.metalinc:382-542)."""
    def build(with_box):
        b = RenderGeometryBuilder(texture_size=16)
        b.add_static_mesh(pm.plane(40.0), Material(
            name="ground", base_color_factor=(0.2, 0.2, 0.2),
            roughness_factor=0.9), instance=0)
        # mirror wall at z=-4 facing +z
        b.add_static_mesh(pm.box(4.0), Material(
            name="mirror", base_color_factor=(1.0, 1.0, 1.0),
            metallic_factor=1.0, roughness_factor=0.02), instance=1)
        b.add_static_mesh(pm.box(1.5), Material(
            name="glow", base_color_factor=(0, 0, 0),
            emissive_factor=(8.0, 0.2, 0.2), unlit=True), instance=2)
        geo = b.build()
        tf = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
        tf[1, :3, 3] = [0, 2.0, -4.0]
        # the emissive box sits between camera and mirror, off to the side,
        # so its reflection lands on the wall
        tf[2, :3, 3] = [2.0, 2.0, 4.0] if with_box else [0.0, -100.0, 0.0]
        fg = flatten_frame(geo, jnp.asarray(tf), jnp.zeros((1, 1, 4, 4)))
        cam = Camera()
        cam.position = np.array([-1.0, 2.0, 8.0], np.float32)
        cam.target = np.array([0.0, 2.0, -4.0], np.float32)
        ivp = cam.inv_view_proj(W, H)
        ibl = IBL.build()
        lights = RT.DirectionalLights.default_sun()
        return np.asarray(jax.jit(lambda: RT.render_frame(
            geo, fg, ibl, lights, ivp, cam.position, W, H,
            max_layers=1, shadow_layers=0, enable_mirror=True,
            enable_refraction=False))())

    with_r = build(True)
    without_r = build(False)
    # wall occupies the view center; the reflected emissive shows as red
    center_with = with_r[4:H - 4, 4:W - 4, 0].max()
    center_without = without_r[4:H - 4, 4:W - 4, 0].max()
    assert center_with > center_without + 0.5, (center_with, center_without)


def test_rt_textured_normal_mapped():
    """Sparse-tap + chunked normal mapping path: a textured, normal-mapped
    material coexisting with factor materials must sample correctly (the
    ornate-mirror configuration)."""
    from swift_game_engine_tpu.assets.procedural_textures import (
        checkerboard, normal_map_from_height)
    b = RenderGeometryBuilder(texture_size=32)
    tex_mat = Material(
        name="texd", base_color_factor=(1, 1, 1), roughness_factor=0.8,
        base_color_texture=checkerboard(32, 32, cell=4, color_a=255, color_b=30),
        normal_texture=normal_map_from_height(32, 32, amplitude=2.0))
    b.add_static_mesh(pm.plane(20.0), tex_mat, instance=0)
    b.add_static_mesh(pm.box(2.0), Material(
        name="plain", base_color_factor=(0.2, 0.8, 0.2), roughness_factor=0.5),
        instance=1)
    geo = b.build()
    tf = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    tf[1, :3, 3] = [0, 1.0, -3.0]
    fg = flatten_frame(geo, jnp.asarray(tf), jnp.zeros((1, 1, 4, 4)))
    cam = Camera()
    cam.position = np.array([0.0, 6.0, 8.0], np.float32)
    cam.target = np.array([0.0, 0.0, 0.0], np.float32)
    ivp = cam.inv_view_proj(W, H)
    ibl = IBL.build()
    lights = RT.DirectionalLights.default_sun()
    img = np.asarray(jax.jit(lambda: RT.render_frame(
        geo, fg, ibl, lights, ivp, cam.position, W, H,
        max_layers=1, shadow_layers=1))())
    assert np.isfinite(img).all()
    ground = img[H // 2:]
    lum = ground.mean(axis=-1)
    # the checker must be visible despite most lanes being factor-material
    assert lum.max() > lum.min() * 3 + 0.05
    # the factor-material box still shades green
    center = img[:H // 2].reshape(-1, 3)
    assert center[:, 1].max() > 0.2
