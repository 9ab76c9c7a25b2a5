"""Merged deferred shading: ONE shadow sweep + ONE bounce trace loop +
ONE light pass per frame (round 5).

The round-4 frame instantiated the shade/shadow machinery ~5x per frame:
the dense L1 shade (own shadow sweep ~17.6 ms), the batched L2+
continuation chunk loop (~48 ms incl. its own sweep + nested bounce
chunks), and the L1 mirror/refraction chunks (~17 ms, each tracing AND
shading AND sweeping inside the chunk body). STATUS r4's budget showed
the remaining frame cost was pass COUNT, not kernel speed.

Here every piece of machinery runs exactly once over a merged record
stream:

  1. record alphas + the transparency chain run as an elementwise
     precompute (a record's alpha needs no lighting), yielding the chain
     weights and the exact set of records that need shading
  2. ONE DENSE G-buffer pass over the (L*p) layer records (rt._gbuffer:
     shading normal incl. normal maps + sampled material). Dense, not
     chunk-compacted: TPU scatters are per-element slow, so compacting
     into chunks and scattering ~20 G-buffer fields back measured FAR
     worse than dense gathers over the majority-dead record stream
     (whose taps/normal-maps are live-masked — see rt._sparse_tap
     ``active``)
  3. bounce setup is dense vector math (reflect / refraction_setup);
     the mirror and refraction rays of ALL layers merge into one stream
     traced by ONE chunk-compacted trace loop (bounce segments that no
     scene material can produce are pruned statically)
  4. ONE dense G-buffer pass over the bounce hits
  5. ONE shadow sweep over every shadow origin in the frame (layer
     records ++ bounce hits) — rt._shadow_factor with sort=True: the
     live-first partition order packs live lanes into tight packets and
     parks the majority-dead tail into instantly-exiting packets, with a
     gather-based inverse (no wide scatters)
  6. ONE elementwise light pass (rt._light_records; split-sum IBL only
     for the layer records, exactly the with_ibl_spec split)
  7. bounce colors fold into their parents by the same Fresnel mixes as
     rt._mirror_pass/_refraction_pass — linear in the deferred colors
  8. the transparency chain composites with the precomputed weights

The per-record math is IDENTICAL to the sequential path (same _gbuffer,
same gates, same shadow record semantics, same fold algebra), so images
match the round-4 pipeline bit-for-bit modulo float reassociation.

reference: Game/RayTracing.metalinc:197-730 — the bounces re-shade hits
of the same material model (382-542 mirror, 544-713 refraction) under
the same single shadow-casting directional light (332-372), which is
what makes one merged sweep exact.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

from ..math3d import normalize
from .ibl import eval_env_sh
from .shading import (fresnel_schlick, fresnel_schlick3, reflect,
                      shadow_bias)
from . import rt as RT


def _tile(a, k):
    """(p, ...) -> (k*p, ...) repeat along a new leading axis, flattened."""
    return jnp.broadcast_to(a[None], (k,) + a.shape).reshape(
        (k * a.shape[0],) + a.shape[1:])


def shade_deferred(geo, fg, ibl, lights, cam_pos, ray_o, ray_d, recs,
                   shadow_layers: int, enable_mirror: bool,
                   enable_refraction: bool, usage,
                   shadow_rows=None, shadow_clusters=None):
    """Deferred frame shade over per-layer hit records -> (p, 3) colors.

    ``recs``: [(t, tri, u, v, found)] per layer, dense (p,) each, with
    CONCRETE u/v (the hybrid visibility records; rt._render_rays keeps
    the sequential path for record sources without barycentrics)."""
    p = ray_o.shape[0]
    L = len(recs)
    R = L * p
    cam = jnp.asarray(cam_pos, jnp.float32)
    if RT._PROF_NO_BOUNCE:
        enable_mirror = enable_refraction = False
    # STATIC bounce pruning: geo is concrete at trace time, so scenes with
    # no transmissive material (the DemoScene) never build the refraction
    # segment at all — its R dead lanes would otherwise ride every bounce
    # buffer and the merged shadow sweep. Same for the mirror gate.
    mats_np = geo.materials
    if enable_refraction and not bool(
            (np.asarray(mats_np.transmission) > 0.001).any()):
        enable_refraction = False
    if enable_mirror and not bool(
            ((np.asarray(mats_np.metallic) >= 0.8) &
             (np.asarray(mats_np.roughness) <= 0.08)).any()):
        enable_mirror = False

    # ---- 1. record alphas + transparency chain (elementwise) ----------
    t_s = jnp.stack([r[0] for r in recs]).reshape(-1)
    tri_s = jnp.stack([r[1] for r in recs]).reshape(-1)
    u_s = jnp.stack([r[2] for r in recs]).reshape(-1)
    v_s = jnp.stack([r[3] for r in recs]).reshape(-1)

    live = jnp.ones(p, bool)
    accum_a = jnp.zeros(p)
    contribs = []
    shade_m = []
    for li in range(L):
        t_l, tri_l, u_l, v_l, f_l = recs[li]
        a_l = RT._sample_alpha(geo, tri_l, u_l, v_l, usage, active=f_l)
        live = live & f_l & (accum_a < 0.99)
        c_l = jnp.where(live, a_l * (1.0 - accum_a), 0.0)
        contribs.append(c_l)
        shade_m.append(live)
        accum_a = accum_a + c_l
    shade_flat = jnp.concatenate(shade_m)
    accum_alpha = accum_a

    # ---- 2. DENSE layer-record G-buffer -------------------------------
    o_rec = _tile(ray_o, L)
    d_rec = _tile(ray_d, L)
    m_l, n_l, hp_l, bias_l = RT._gbuffer(
        geo, fg, o_rec, d_rec, t_s, jnp.where(shade_flat, tri_s, -1),
        u_s, v_s, shade_flat, usage)

    # ---- 3. bounce setup + ONE merged trace loop ----------------------
    have_bounce = enable_mirror or enable_refraction
    if enable_mirror:
        mirror_m = shade_flat & (m_l["roughness"] <= 0.08) & \
            (m_l["metallic"] >= 0.8)
        r_dir = normalize(reflect(d_rec, n_l))
        o_mir = hp_l + n_l * bias_l[..., None]
    if enable_refraction:
        t_dir, t_len, _eta = RT.refraction_setup(d_rec, n_l, m_l["ior"])
        t_dir_n = t_dir / jnp.maximum(t_len[..., None], 1e-20)
        refr_m = shade_flat & (m_l["transmission"] > 0.001) & (t_len > 0)
        o_ref = hp_l + t_dir * bias_l[..., None]

    if have_bounce:
        segs_o, segs_d, segs_m = [], [], []
        if enable_mirror:
            segs_o.append(o_mir)
            segs_d.append(r_dir)
            segs_m.append(mirror_m)
        if enable_refraction:
            segs_o.append(o_ref)
            segs_d.append(t_dir_n)
            segs_m.append(refr_m)
        o_b = jnp.concatenate(segs_o) if len(segs_o) > 1 else segs_o[0]
        d_b = jnp.concatenate(segs_d) if len(segs_d) > 1 else segs_d[0]
        mask_b = jnp.concatenate(segs_m) if len(segs_m) > 1 else segs_m[0]
        nb = o_b.shape[0]

        bt = jnp.ones(nb)
        btri = jnp.full(nb, -1, jnp.int32)
        bu = jnp.zeros(nb)
        bv = jnp.zeros(nb)
        bfound = jnp.zeros(nb, bool)

        def trace_body(idx, valid, carry):
            bt, btri, bu, bv, bfound = carry
            safe = jnp.minimum(idx, nb - 1)
            ob = jnp.where(valid[:, None], o_b[safe], 1.0e9)
            db = d_b[safe]
            t, tri, u, v, found = RT._trace_batch(fg.bvh, ob, db, valid)
            return (bt.at[idx].set(jnp.where(found, t, 1.0)),
                    btri.at[idx].set(tri), bu.at[idx].set(u),
                    bv.at[idx].set(v), bfound.at[idx].set(found & valid))

        bt, btri, bu, bv, bfound = RT._chunked(
            mask_b, trace_body, (bt, btri, bu, bv, bfound), cap=RT._CHUNK)

        # ---- 4. DENSE bounce-hit G-buffer -----------------------------
        m_b, n_b, hp_b, bias_b = RT._gbuffer(
            geo, fg, o_b, d_b, bt, jnp.where(bfound, btri, -1), bu, bv,
            bfound, usage)

    # ---- 5. ONE shadow sweep over every origin ------------------------
    gate_l, _, max_d0, _ = RT._light_gate(lights, 0, m_l, n_l, hp_l, cam,
                                          shade_flat)
    if have_bounce:
        gate_b, _, _, _ = RT._light_gate(lights, 0, m_b, n_b, hp_b, cam,
                                         bfound)
        hp_all = jnp.concatenate([hp_l, hp_b])
        n_all = jnp.concatenate([n_l, n_b])
        bias_all = jnp.concatenate([bias_l, bias_b])
        gate_all = jnp.concatenate([gate_l, gate_b])
    else:
        hp_all, n_all, bias_all, gate_all = hp_l, n_l, bias_l, gate_l
    if RT._PROF_SHADOW_OFF:   # timing-only attribution knob (WRONG output)
        shadow_all = jnp.ones(hp_all.shape[0])
    else:
        shadow_all = RT._shadow_factor(
            geo, fg, hp_all, n_all, lights.direction[0], max_d0, bias_all,
            gate_all, shadow_layers, usage, shadow_rows=shadow_rows,
            shadow_clusters=shadow_clusters, sort=True)

    # ---- 6. ONE light pass --------------------------------------------
    color_l = RT._light_records(ibl, lights, cam, d_rec, m_l, n_l, hp_l,
                                shade_flat, True, shadow0=shadow_all[:R])
    if have_bounce:
        color_b = RT._light_records(ibl, lights, cam, d_b, m_b, n_b, hp_b,
                                    bfound, False, shadow0=shadow_all[R:])

    # ---- 7. fold bounce colors into their parents ---------------------
    view = normalize(-d_rec)
    off = 0
    if enable_mirror:
        mfound = bfound[off:off + R]
        mcol = color_b[off:off + R]
        malpha = m_b["alpha"][off:off + R]
        off += R
        refl_a = jnp.where(mfound, malpha, 0.0)
        refl = jnp.where(mfound[..., None], mcol * refl_a[..., None], 0.0) \
            + RT.BG_COLOR * (1.0 - refl_a)[..., None]
        nov = jnp.clip(jnp.sum(n_l * view, axis=-1), 0.0, 1.0)
        met = m_l["metallic"]
        f0 = 0.04 * (1.0 - met[..., None]) + m_l["base"] * met[..., None]
        f = fresnel_schlick3(nov, f0)
        color_l = jnp.where(mirror_m[..., None],
                            color_l * (1.0 - f) + refl * f, color_l)
    if enable_refraction:
        ffound = bfound[off:off + R]
        fcol = color_b[off:off + R]
        falpha = m_b["alpha"][off:off + R]
        refr_a = jnp.where(ffound, falpha, 0.0)
        refr_bg = eval_env_sh(t_dir_n, ibl.sh0, ibl.sh1) * \
            RT.AMBIENT_INTENSITY
        refr = jnp.where(ffound[..., None], fcol * refr_a[..., None], 0.0) \
            + refr_bg * (1.0 - refr_a)[..., None]
        f_s = fresnel_schlick(jnp.clip(jnp.sum(n_l * view, axis=-1),
                                       0.0, 1.0), jnp.float32(0.04))[..., None]
        trans_color = refr * m_l["base"]
        mix = trans_color * (1.0 - f_s) + color_l * f_s
        color_l = jnp.where(refr_m[..., None],
                            color_l + (mix - color_l) *
                            m_l["transmission"][..., None], color_l)

    # ---- 8. transparency chain composite ------------------------------
    colors = color_l.reshape(L, p, 3)
    accum = jnp.zeros((p, 3))
    for li in range(L):
        accum = accum + colors[li] * contribs[li][..., None]
    return accum + RT.BG_COLOR * (1.0 - accum_alpha)[..., None]
