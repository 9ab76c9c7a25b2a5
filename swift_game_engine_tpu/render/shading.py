"""PBR shading math: GGX BRDF, Fresnel, tone mapping, dither, normal mapping.

Vectorized forms of the reference's shading functions
(reference: Game/RayTracing.metalinc:11-104, Game/ShadersRaster.metalinc:23-36).
All functions broadcast over leading ray/pixel dims.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..math3d import normalize, cross

PI = 3.14159265


def fresnel_schlick(cos_theta, f0):
    """Scalar-F0 Schlick (RayTracing.metalinc:21-23); shapes must broadcast."""
    return f0 + (1.0 - f0) * jnp.power(jnp.clip(1.0 - cos_theta, 0.0, 1.0), 5.0)


def fresnel_schlick3(cos_theta, f0):
    """Vector F0 variant: cos_theta (...,), f0 (...,3)."""
    p = jnp.power(jnp.clip(1.0 - cos_theta, 0.0, 1.0), 5.0)[..., None]
    return f0 + (1.0 - f0) * p


def ggx_d(noh, alpha):
    a2 = alpha * alpha
    denom = (noh * noh) * (a2 - 1.0) + 1.0
    return a2 / (PI * denom * denom)


def ggx_g1(nov, alpha):
    a2 = alpha * alpha
    denom = nov + jnp.sqrt(a2 + (1.0 - a2) * nov * nov)
    return 2.0 * nov / jnp.maximum(denom, 1e-4)


def eval_brdf(n, v, l, base, metallic, roughness):
    """Cook-Torrance GGX + Lambert diffuse (RayTracing.metalinc:42-59).

    base (...,3); metallic/roughness (...,). Returns (...,3); zero when
    NoL or NoV <= 0.
    """
    nol = jnp.clip(jnp.sum(n * l, axis=-1), 0.0, 1.0)
    nov = jnp.clip(jnp.sum(n * v, axis=-1), 0.0, 1.0)
    h = normalize(v + l)
    noh = jnp.clip(jnp.sum(n * h, axis=-1), 0.0, 1.0)
    voh = jnp.clip(jnp.sum(v * h, axis=-1), 0.0, 1.0)
    alpha = roughness * roughness
    diff = base * ((1.0 - metallic) / PI)[..., None]
    d = ggx_d(noh, alpha)
    g = ggx_g1(nov, alpha) * ggx_g1(nol, alpha)
    f0 = 0.04 * (1.0 - metallic[..., None]) + base * metallic[..., None]
    f = fresnel_schlick3(voh, f0)
    spec = f * ((d * g) / jnp.maximum(4.0 * nov * nol, 1e-4))[..., None]
    lit = (nol > 0.0) & (nov > 0.0)
    return jnp.where(lit[..., None], diff + spec, 0.0)


def shadow_bias(hit_distance):
    """RayTracing.metalinc:61-63."""
    return jnp.maximum(0.002, hit_distance * 0.002)


def tone_map_aces(x):
    """ShadersRaster.metalinc:23-30."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def hash12(p):
    """Screen-space hash dither (ShadersRaster.metalinc:32-36 /
    RayTracing.metalinc:15-19). p: (...,2)."""
    p3 = jnp.mod(jnp.stack([p[..., 0], p[..., 1], p[..., 0]], axis=-1) * 0.1031, 1.0)
    p3 = p3 + jnp.sum(p3 * (jnp.roll(p3, -1, axis=-1) + 33.33), axis=-1, keepdims=True)
    return jnp.mod((p3[..., 0] + p3[..., 1]) * p3[..., 2], 1.0)


def apply_normal_map(n_geom, n_shade, tangent, tangent_sign, n_tex, normal_scale, view):
    """Tangent-space normal perturbation with grazing-angle attenuation.

    reference: RayTracing.metalinc:283-316 / ShadersRaster.metalinc:76-88:
    scale soft-clamped above 4, xy scaled by smoothstep(0.05,0.5,NoV), z
    rebuilt; output flipped against the view direction by the caller.
    ``n_tex``: raw texture rgb in [0,1].
    """
    nov = jnp.clip(jnp.sum(n_geom * view, axis=-1), 0.0, 1.0)
    t = jnp.clip((nov - 0.05) / 0.45, 0.0, 1.0)
    graze = t * t * (3.0 - 2.0 * t)
    ns = jnp.asarray(normal_scale)
    ns = 4.0 + jnp.maximum(ns - 4.0, 0.0) * 0.25
    # Reference applies the clamp unconditionally (ns>=4 effective floor);
    # keep exact behavior.
    decoded = n_tex * 2.0 - 1.0
    xy = decoded[..., :2] * (ns * graze)[..., None]
    z = jnp.sqrt(jnp.maximum(1.0 - jnp.sum(xy * xy, axis=-1), 0.0))
    b = normalize(cross(n_shade, tangent)) * tangent_sign[..., None]
    return normalize(tangent * xy[..., 0:1] + b * xy[..., 1:2] +
                     n_shade * z[..., None])


def reflect(d, n):
    return d - 2.0 * jnp.sum(d * n, axis=-1, keepdims=True) * n


def refract(incident, n, eta):
    """Snell refraction; returns zero vector on total internal reflection
    (matches Metal's refract + the kernel's length(T) > 0 gate)."""
    cosi = -jnp.sum(incident * n, axis=-1)
    k = 1.0 - eta * eta * (1.0 - cosi * cosi)
    t = eta[..., None] * incident + (eta * cosi - jnp.sqrt(jnp.maximum(k, 0.0)))[..., None] * n
    return jnp.where((k >= 0.0)[..., None], t, 0.0)
