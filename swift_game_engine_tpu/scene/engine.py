"""Engine: the host frame loop tying simulation to rendering.

Equivalent of Renderer.draw(in:) + DemoScene.update
(reference: Game/Renderer.swift:156-225, Game/DemoScene.swift:697-712):
dt clamp <= 0.1, time accumulation with <= 4 fixed substeps at 60 Hz,
input -> intents, substeps, chase camera, render extraction, then the
RT (or raster) frame + composite + FPS overlay.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ecs.world import chunk_local_to_world
from ..render.camera import Camera
from ..render.scene_geometry import flatten_frame
from ..render import rt as RT
from ..render.raster import render_frame_raster
from ..render.composite import composite_frame, FPSOverlay
from ..render.ibl import IBL
from .input import InputSystem, InputFrame

FIXED_DT = 1.0 / 60.0
MAX_SUBSTEPS = 4


def save_world_state(path: str, state, **scalars):
    """Checkpoint a WorldState pytree (+ host scalars) to one .npz."""
    flat, _ = jax.tree.flatten(state)
    np.savez(path, *[np.asarray(x) for x in flat], **scalars)


def load_world_state(path: str, like_state):
    """Restore a WorldState saved by save_world_state.

    ``like_state`` provides the pytree structure. Returns (state, npz_data)
    so callers can read back their scalars.
    """
    data = np.load(path)
    flat, treedef = jax.tree.flatten(like_state)
    arrays = [jnp.asarray(data[f"arr_{i}"]) for i in range(len(flat))]
    return jax.tree.unflatten(treedef, arrays), data


class Engine:
    def __init__(self, scene: dict, width=640, height=360, path="rt",
                 rt_resolution_scale=1.0, max_layers=3, shadow_layers=4):
        self.spec = scene["spec"]
        self.state = scene["state"]
        self.stepper = scene["stepper"]
        self.geometry = scene["geometry"]
        self.lights = scene["lights"]
        self.player = scene["player"]
        self.width = width
        self.height = height
        self.path = path
        self.rt_scale = max(rt_resolution_scale, 0.25)  # Renderer.swift:175
        self.camera = Camera()
        self.camera.position = np.array([0.0, 0.0, 8.0], np.float32)
        self.input = InputSystem()
        self.ibl = IBL.build()
        self.overlay = FPSOverlay()
        self.accumulator = 0.0
        self.time = 0.0
        self.tone_mapping_enabled = True
        self.tone_mapping_exposure = 1.0

        geo = self.geometry
        lights = self.lights
        ibl = self.ibl
        rw = max(int(width * self.rt_scale), 1)
        rh = max(int(height * self.rt_scale), 1)
        self.rt_size = (rw, rh)

        @jax.jit
        def _render_rt(transforms, palettes, ivp, cam_pos):
            fg = flatten_frame(geo, transforms, palettes)
            return RT.render_frame(geo, fg, ibl, lights, ivp, cam_pos, rw, rh,
                                   max_layers=max_layers,
                                   shadow_layers=shadow_layers)

        @jax.jit
        def _render_raster(transforms, palettes, ivp, cam_pos):
            fg = flatten_frame(geo, transforms, palettes)
            return render_frame_raster(geo, fg, ivp, cam_pos, rw, rh)

        comp = jax.jit(lambda img, exposure: composite_frame(img, exposure, True))

        # Frame passes through the render graph (prune + dependency sort —
        # the reference's RenderGraph semantics, Game/RenderGraph.swift:183-368).
        from ..render.graph import RenderGraph, RenderPass
        self.graph = RenderGraph()
        render_fn = _render_rt if path == "rt" else _render_raster

        def rt_pass(res):
            return {"rt_output": render_fn(res["transforms"], res["palettes"],
                                           res["ivp"], res["cam_pos"])}

        def composite_pass(res):
            img = res["rt_output"]
            if path == "rt" and self.tone_mapping_enabled:
                img = comp(img, res["exposure"])
            return {"view": img}

        self.graph.add_pass(RenderPass("rt", rt_pass,
                                       reads=("transforms", "palettes", "ivp",
                                              "cam_pos"),
                                       writes=("rt_output",)))
        self.graph.add_pass(RenderPass("composite", composite_pass,
                                       reads=("rt_output", "exposure"),
                                       target="view"))

    # ------------------------------------------------------------------

    def _player_intent(self, pad: InputFrame, dt: float):
        e = self.player
        st = self.state
        dodge_active = bool(st.dodge.active[e])
        mv = self.spec.movement
        intent = self.input.update(pad, dt, dodge_active,
                                   float(mv["walk_speed"][e]),
                                   float(mv["run_speed"][e]),
                                   float(mv["run_threshold"][e]))
        st = st._replace(
            intent_vel=st.intent_vel.at[e].set(jnp.asarray(intent["desired_velocity"])),
            intent_yaw=st.intent_yaw.at[e].set(intent["facing_yaw"]),
            intent_has_yaw=st.intent_has_yaw.at[e].set(intent["has_facing_yaw"]),
            intent_jump=st.intent_jump.at[e].set(
                bool(st.intent_jump[e]) or intent["jump_requested"]),
            intent_dodge=st.intent_dodge.at[e].set(
                bool(st.intent_dodge[e]) or intent["dodge_requested"]),
        )
        self.state = st

    def update(self, dt: float, pad: Optional[InputFrame] = None):
        """Simulation update: time, input, fixed substeps, chase camera."""
        dt = min(max(dt, 0.0), 0.1)  # Renderer.swift:161-163
        self.time += dt
        self._player_intent(pad or InputFrame(), dt)

        self.accumulator += dt
        steps = 0
        while self.accumulator >= FIXED_DT and steps < MAX_SUBSTEPS:
            self.state = self.stepper.substep(self.state, FIXED_DT)
            self.accumulator -= FIXED_DT
            steps += 1
        if steps == MAX_SUBSTEPS and self.accumulator >= FIXED_DT:
            self.accumulator = 0.0

        # chase camera from interpolated player world position
        alpha = min(max(self.accumulator / FIXED_DT, 0.0), 1.0)
        e = self.player
        prev = chunk_local_to_world(self.state.wp_prev_chunk[e],
                                    self.state.wp_prev_local[e])
        curr = chunk_local_to_world(self.state.wp_chunk[e],
                                    self.state.wp_local[e])
        p = np.asarray(prev + (curr - prev) * alpha)
        self.input.update_camera(self.camera, p)
        return alpha

    def render(self, alpha: float):
        """Render extraction + graph execution. Returns (H,W,3) float array."""
        cam_world = self.camera.world_position.astype(np.float32)
        transforms, palettes = self.stepper.extract(self.state, alpha, cam_world)
        ivp = self.camera.inv_view_proj(self.rt_size[0], self.rt_size[1])
        res = self.graph.execute(dict(
            transforms=transforms, palettes=palettes, ivp=ivp,
            cam_pos=jnp.asarray(self.camera.position),
            exposure=jnp.float32(self.tone_mapping_exposure)))
        return res["view"]

    # -- checkpoint / resume --------------------------------------------
    # The reference has no save-game (SURVEY §5); the pytree world state
    # makes it trivial here. One .npz holds the entire simulation.

    def save_state(self, path: str):
        save_world_state(path, self.state,
                         accumulator=self.accumulator, time=self.time)

    def load_state(self, path: str):
        self.state, data = load_world_state(path, self.state)
        self.accumulator = float(data["accumulator"])
        self.time = float(data["time"])

    def frame(self, dt: float, pad: Optional[InputFrame] = None,
              with_overlay: bool = True):
        """Full frame: update + render + FPS overlay. Returns uint8 (H,W,3)."""
        alpha = self.update(dt, pad)
        img = np.asarray(self.render(alpha))
        u8 = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
        if with_overlay:
            fps = self.overlay.update(dt)
            u8 = self.overlay.blit(u8, fps)
        return u8
