"""Fused persistent-bounce Pallas megakernel (spheres + modern BSDF).

One kernel launch executes an entire persistent-integrator pass for a block
of lanes: sphere intersection (MXU dots + lean epilogue), material gather
(one-hot MXU contraction), sky contribution, modern-BSDF scatter, work-item
advance, and thin-lens primary-ray regeneration — the full body of
``integrator.persistent.render_persistent`` except the per-pixel
accumulation (a small one-hot matmul done outside; see that module).

This is the TPU-native replacement for the reference's megakernel bounce
loop (/root/reference/taichi_pathtracer/10_final/__main__.py:58-103) fused
with its wavefront regeneration idea: rather than XLA-orchestrated separate
ops (whose intermediate wavefront tensors round-trip HBM and whose op
boundaries defeat fusion), every intermediate for a 512-lane block stays in
VMEM/registers.

Numerical notes:
- RNG is the same counter-based PCG construction as core/rng.py, carried on
  int32 (identical bits; Mosaic lacks uint32<->f32 casts). Sampling
  therefore consumes the *same* uniforms as the modular path.
- Mosaic has no acos; ``slerp`` uses the Abramowitz-Stegun 4-term
  polynomial (|err| <= 6.7e-5 — below the TPU's own sin/cos error).
  Radiance consequently differs from the modular path at ~1e-4 per bounce
  in direction space; images agree within Monte-Carlo noise
  (tests/test_megakernel.py).

State layout (row-major, lane = column):
  stf f32[16, N]: 0-2 ro, 3-5 rd, 6-8 throughput, 9 alive, 10-12 contrib
                  (output of the pass; input rows ignored), 13-15 unused
  sti i32[8, N]:  0 k (work-item counter), 1 bounce, 2-7 unused
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

RAY_BLOCK = int(os.environ.get("LPT_MEGA_RAY_BLOCK", "2048"))
SPHERE_CHUNK = int(os.environ.get("LPT_MEGA_SPHERE_CHUNK", "256"))

# stf rows
_RO, _RD, _THP = 0, 3, 6
_ALIVE = 9
_CONTRIB = 10
# sti rows
_K, _BOUNCE = 0, 1

# sphere table rows (same packing as ops/sphere_scan.py)
_NEGC0, _M2C0, _CCC, _FLAG = 0, 3, 6, 7
# attribute table rows
_AC, _AINVR, _AALB, _AROUGH, _AMETAL, _AIOR, _ATRANS = 0, 3, 4, 7, 8, 9, 10
ATTR_ROWS = 16

# scalar vector layout (f32[16])
_SPOS, _SDIR, _SWA, _SHA = 0, 3, 6, 9
_SVW, _SVH, _SHALFAP, _SFOCAL = 12, 13, 14, 15

import numpy as np

_GOLDEN = np.int32(-1640531527)           # 0x9E3779B9
_SEED_XOR = np.int32(0x6C078965)
_BOUNCE_MIX = np.int32(-1640531535)       # 2654435761 as int32
_PI = 3.14159265358979
_TWO_PI = 6.28318530717959
_INV_2_24 = float(1.0 / (1 << 24))


def _pcg(x):
    """PCG-RXS-M-XS on an int32 carrier — bit-identical to core.rng.pcg."""
    x = x * jnp.int32(747796405) + jnp.int32(-1403630843)
    shift = lax.shift_right_logical(x, jnp.int32(28)) + jnp.int32(4)
    word = (lax.shift_right_logical(x, shift) ^ x) * jnp.int32(277803737)
    return lax.shift_right_logical(word, jnp.int32(22)) ^ word


def _fold(h, v):
    return _pcg(h ^ (v + _GOLDEN + (h << jnp.int32(6))
                     + lax.shift_right_logical(h, jnp.int32(2))))


def _i32c(v: int) -> np.int32:
    """Python int → int32 constant with two's-complement wraparound."""
    v &= 0xFFFFFFFF
    return np.int32(v - (1 << 32) if v >= (1 << 31) else v)


def _uniform(base, dim: int):
    bits = _pcg(base + _i32c(dim * 0x9E3779B9))
    return (lax.shift_right_logical(bits, jnp.int32(8)).astype(jnp.float32)
            * jnp.float32(_INV_2_24))


def _acos(x):
    """Abramowitz-Stegun 4.4.45 polynomial acos, |err| <= 6.7e-5."""
    ax = jnp.abs(x)
    p = jnp.sqrt(jnp.maximum(1.0 - ax, 0.0)) * (
        1.5707288 + ax * (-0.2121144 + ax * (0.0742610 + ax * (-0.0187293))))
    return jnp.where(x < 0, jnp.float32(_PI) - p, p)


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _normalize3(v, eps=1e-12):
    n = jnp.sqrt(jnp.maximum(_dot3(v, v), eps * eps))
    return [v[0] / n, v[1] / n, v[2] / n]


def _where3(c, a, b):
    return [jnp.where(c, a[i], b[i]) for i in range(3)]


def _sample_at_sphere(u1, u2):
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    theta = jnp.float32(_TWO_PI) * u2
    return [r * jnp.cos(theta), r * jnp.sin(theta), z]


def _sample_lambertian(nrm, u1, u2):
    s = _sample_at_sphere(u1, u2)
    return _normalize3([nrm[0] + s[0], nrm[1] + s[1], nrm[2] + s[2]])


def _reflect(d, n):
    k = 2.0 * _dot3(d, n)
    return [d[0] - k * n[0], d[1] - k * n[1], d[2] - k * n[2]]


def _slerp(a, b, t):
    cosw = jnp.clip(_dot3(a, b), -1.0, 1.0)
    omega = _acos(cosw)
    so = jnp.sqrt(jnp.maximum(1.0 - cosw * cosw, 0.0))
    near = so < 1e-6
    safe_so = jnp.where(near, 1.0, so)
    s_a = jnp.sin((1.0 - t) * omega) / safe_so
    s_b = jnp.sin(t * omega) / safe_so
    wa = jnp.where(near, 1.0 - t, s_a)
    wb = jnp.where(near, t, s_b)
    return _normalize3([wa * a[i] + wb * b[i] for i in range(3)])


def _schlick(cos_theta, f0):
    c = jnp.maximum(cos_theta, 0.0)
    m = 1.0 - c
    m2 = m * m
    return f0 + (1.0 - f0) * (m2 * m2 * m)


def _refract(d, n, ior):
    k = _dot3(d, n)
    rp = [(d[i] - k * n[i]) / ior for i in range(3)]
    p2 = _dot3(rp, rp)
    kk = jnp.sqrt(jnp.maximum(1.0 - p2, 0.0))
    refr = [rp[i] - kk * n[i] for i in range(3)]
    return _where3(p2 > 1.0, _reflect(d, n), refr)


def _kernel(table_ref, attr_ref, scalf_ref, scali_ref, stf_ref, sti_ref,
            stf_out, sti_out, *, s_total, n, spp, groups, w, h, limit, t_min):
    B = stf_ref.shape[1]
    ro = [stf_ref[_RO + i, :] for i in range(3)]
    rd = [stf_ref[_RD + i, :] for i in range(3)]
    thp = [stf_ref[_THP + i, :] for i in range(3)]
    alive = stf_ref[_ALIVE, :] > 0.5
    k = sti_ref[_K, :]
    bounce = sti_ref[_BOUNCE, :]
    seed = scali_ref[0]

    lane = (jnp.reshape(lax.broadcasted_iota(jnp.int32, (1, B), 1), (B,))
            + pl.program_id(0) * jnp.int32(B))
    g = lane // jnp.int32(spp)
    sample = lane % jnp.int32(spp)
    pixel = g + k * jnp.int32(groups)

    # ---- intersect (sphere table scan; MXU dots + quadratic epilogue) ----
    ro3 = stf_ref[_RO:_RO + 3, :]
    rd3 = stf_ref[_RD:_RD + 3, :]
    o_dot_d = _dot3(ro, rd)
    o_dot_o = _dot3(ro, ro)
    dn = (((0,), (0,)), ((), ()))
    t_best = jnp.full((B,), jnp.inf, jnp.float32)
    idx_best = jnp.zeros((B,), jnp.int32)
    for s0 in range(0, s_total, SPHERE_CHUNK):
        sc = min(SPHERE_CHUNK, s_total - s0)
        negc = table_ref[_NEGC0:_NEGC0 + 3, s0:s0 + sc]
        m2c = table_ref[_M2C0:_M2C0 + 3, s0:s0 + sc]
        ccc = table_ref[_CCC, s0:s0 + sc]
        flag = table_ref[_FLAG, s0:s0 + sc]
        g1 = lax.dot_general(rd3, negc, dn, preferred_element_type=jnp.float32)
        g2 = lax.dot_general(ro3, m2c, dn, preferred_element_type=jnp.float32)
        half_b = o_dot_d[:, None] + g1
        cterm = (o_dot_o[:, None] + g2) + ccc[None, :]
        disc = half_b * half_b - cterm
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t_near = -half_b - sq
        use_far = (t_near < t_min) & (flag[None, :] > 1.5)
        t = jnp.where(use_far, t_near + 2.0 * sq, t_near)
        ok = (disc >= 0.0) & (t >= t_min) & (flag[None, :] > 0.5)
        t = jnp.where(ok, t, jnp.inf)
        t_chunk = jnp.min(t, axis=1)
        col = lax.broadcasted_iota(jnp.int32, t.shape, 1)
        hit_col = jnp.where(t == t_chunk[:, None], col, jnp.int32(2 ** 30))
        idx_chunk = jnp.min(hit_col, axis=1) + s0
        better = t_chunk < t_best
        t_best = jnp.where(better, t_chunk, t_best)
        idx_best = jnp.where(better, idx_chunk, idx_best)

    # winning sphere attributes via one-hot MXU gather (exact)
    rows = lax.broadcasted_iota(jnp.int32, (s_total, B), 0)
    onehot = (rows == idx_best[None, :]).astype(jnp.float32)
    attr = lax.dot_general(attr_ref[:, :], onehot, (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)

    hit = t_best < jnp.float32(jnp.inf)
    t_safe = jnp.where(hit, t_best, 0.0)
    point = [ro[i] + t_safe * rd[i] for i in range(3)]
    inv_r = attr[_AINVR, :]
    nrm = [(point[i] - attr[_AC + i, :]) * inv_r for i in range(3)]
    backface = _dot3(rd, nrm) > 0.0
    nrm = _where3(backface, [-nrm[0], -nrm[1], -nrm[2]], nrm)
    ior = attr[_AIOR, :]
    ior = jnp.where(backface, 1.0 / jnp.maximum(ior, 1e-9), ior)

    # ---- escaped-ray sky contribution (10_final/__main__.py:58-62) ----
    escaped = alive & ~hit
    tsky = 0.5 * (rd[1] + 1.0)
    sky = [(1.0 - tsky) + tsky * 0.5,
           (1.0 - tsky) + tsky * 0.7,
           (1.0 - tsky) + tsky * 1.0]
    esc = escaped.astype(jnp.float32)
    for i in range(3):
        stf_out[_CONTRIB + i, :] = esc * sky[i] * thp[i]

    # ---- modern BSDF scatter (bsdf/bsdf.py:scatter_modern) ----
    stream = _pcg(seed ^ _SEED_XOR)
    stream = _fold(stream, sample)
    stream = _fold(stream, bounce * _BOUNCE_MIX + jnp.int32(1))  # STREAM_BSDF
    base = _fold(stream, pixel)
    u1, u2 = _uniform(base, 0), _uniform(base, 1)
    u_roul = _uniform(base, 2)
    u3, u4 = _uniform(base, 3), _uniform(base, 4)

    rough = attr[_AROUGH, :]
    s_lamb = _sample_lambertian(nrm, u1, u2)
    refl = _reflect(rd, nrm)
    perturbed = _slerp(refl, s_lamb, rough * rough)
    n_pert = _normalize3([perturbed[i] - rd[i] for i in range(3)])
    cos_theta = jnp.maximum(-_dot3(n_pert, rd), 0.0)

    alb = [attr[_AALB + i, :] for i in range(3)]
    rd_metal = _reflect(rd, n_pert)
    l_metal = [thp[i] * _schlick(cos_theta, alb[i]) for i in range(3)]

    f0q = (ior - 1.0) / (ior + 1.0)
    f0 = f0q * f0q
    f_diel = _schlick(cos_theta, f0)
    rd_refr = _refract(rd, n_pert, ior)
    rd_diff = _sample_lambertian(nrm, u3, u4)
    transmit = u_roul > f_diel
    transparent = attr[_ATRANS, :] > 0.0
    rd_nonspec = _where3(transparent, rd_refr, rd_diff)
    rd_diel = _where3(transmit, rd_nonspec, _reflect(rd, n_pert))
    l_diel = [jnp.where(transmit, thp[i] * alb[i], thp[i]) for i in range(3)]

    is_metal = attr[_AMETAL, :] == 1.0
    rd_new = _where3(is_metal, rd_metal, rd_diel)
    thp_new = [jnp.where(is_metal, l_metal[i], l_diel[i]) for i in range(3)]

    # ---- work-item advance + thin-lens regeneration ----
    survived = alive & hit & (bounce + 1 < jnp.int32(limit))
    ended = alive & ~survived
    next_k = k + ended.astype(jnp.int32)
    nvalid = (next_k < jnp.int32(spp)) & (lane < jnp.int32(n))
    need_regen = ended & nvalid
    npix = g + next_k * jnp.int32(groups)

    cstream = _pcg(seed ^ _SEED_XOR)
    cstream = _fold(cstream, sample)
    cstream = _fold(cstream, jnp.int32(0))   # bounce 0, STREAM_CAMERA
    cbase = _fold(cstream, npix)
    c0, c1 = _uniform(cbase, 0), _uniform(cbase, 1)
    c2, c3 = _uniform(cbase, 2), _uniform(cbase, 3)
    fi = (npix // jnp.int32(h)).astype(jnp.float32)
    fj = (npix % jnp.int32(h)).astype(jnp.float32)
    vw, vh = scalf_ref[_SVW], scalf_ref[_SVH]
    direc = [scalf_ref[_SDIR + i] for i in range(3)]
    wa = [scalf_ref[_SWA + i] for i in range(3)]
    ha = [scalf_ref[_SHA + i] for i in range(3)]
    pos = [scalf_ref[_SPOS + i] for i in range(3)]
    du = ((fi + c0) * jnp.float32(1.0 / w) - 0.5) * vw
    dv = ((fj + c1) * jnp.float32(1.0 / h) - 0.5) * vh
    focal = scalf_ref[_SFOCAL]
    target = [focal * (direc[i] + du * wa[i] + dv * ha[i]) for i in range(3)]
    dr = jnp.sqrt(c2)
    dth = jnp.float32(_TWO_PI) * c3
    dx, dy = dr * jnp.cos(dth), dr * jnp.sin(dth)
    half_ap = scalf_ref[_SHALFAP]
    orig = [half_ap * (dx * wa[i] + dy * ha[i]) for i in range(3)]
    ro_fresh = [pos[i] + orig[i] for i in range(3)]
    rd_fresh = _normalize3([target[i] - orig[i] for i in range(3)])

    # ---- select next state ----
    ro_next = _where3(survived, point, _where3(need_regen, ro_fresh, ro))
    rd_next = _where3(survived, rd_new, _where3(need_regen, rd_fresh, rd))
    one = jnp.ones((B,), jnp.float32)
    thp_next = [jnp.where(survived, thp_new[i],
                          jnp.where(need_regen, one, thp[i]))
                for i in range(3)]
    alive_next = survived | need_regen
    bounce_next = jnp.where(survived, bounce + 1, jnp.int32(0))

    for i in range(3):
        stf_out[_RO + i, :] = ro_next[i]
        stf_out[_RD + i, :] = rd_next[i]
        stf_out[_THP + i, :] = thp_next[i]
    stf_out[_ALIVE, :] = alive_next.astype(jnp.float32)
    for r in range(_CONTRIB + 3, 16):
        stf_out[r, :] = jnp.zeros((B,), jnp.float32)
    sti_out[_K, :] = next_k
    sti_out[_BOUNCE, :] = bounce_next
    for r in range(2, 8):
        sti_out[r, :] = jnp.zeros((B,), jnp.int32)


@functools.partial(jax.jit, static_argnames=(
    "resolution", "spp", "limit", "t_min", "interpret"))
def bounce_pass(stf, sti, table, attrs, scalf, scali, resolution, spp,
                limit=32, t_min=1e-4, interpret=False):
    """Run one fused persistent pass. Returns (stf', sti')."""
    w, h = resolution
    n = w * h
    n_pad = stf.shape[1]
    s_pad = table.shape[1]
    groups = n // spp
    grid = (n_pad // RAY_BLOCK,)
    kern = functools.partial(
        _kernel, s_total=s_pad, n=n, spp=spp, groups=groups, w=w, h=h,
        limit=limit, t_min=t_min)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, s_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ATTR_ROWS, s_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((16, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((16, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((16, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((8, n_pad), jnp.int32),
        ],
        interpret=interpret,
    )(table, attrs, scalf, scali, stf, sti)


def pack_scene(world_data):
    """(table f32[8,S_pad], attrs f32[16,S_pad]) for the megakernel."""
    centers, radii = world_data.centers, world_data.radii
    m = world_data.materials
    s = centers.shape[0]
    s_pad = -(-s // 128) * 128
    table = jnp.zeros((8, s_pad), jnp.float32)
    table = table.at[_NEGC0:_NEGC0 + 3, :s].set(-centers.T)
    table = table.at[_M2C0:_M2C0 + 3, :s].set(-2.0 * centers.T)
    table = table.at[_CCC, :s].set(jnp.sum(centers * centers, -1)
                                   - radii * radii)
    flags = jnp.where(radii > 0, jnp.where(m.transparency > 0, 2.0, 1.0), 0.0)
    table = table.at[_FLAG, :s].set(flags)

    attrs = jnp.zeros((ATTR_ROWS, s_pad), jnp.float32)
    attrs = attrs.at[_AC:_AC + 3, :s].set(centers.T)
    attrs = attrs.at[_AINVR, :s].set(1.0 / jnp.maximum(radii, 1e-12))
    attrs = attrs.at[_AALB:_AALB + 3, :s].set(m.albedo.T)
    attrs = attrs.at[_AROUGH, :s].set(m.roughness)
    attrs = attrs.at[_AMETAL, :s].set(m.metallic)
    attrs = attrs.at[_AIOR, :s].set(m.ior)
    attrs = attrs.at[_ATRANS, :s].set(m.transparency)
    return table, attrs


def pack_camera(cam, resolution):
    """Thin-lens camera constants as f32[16] (SMEM scalar vector)."""
    from ..camera.camera import rotation_matrix

    w, h = resolution
    trans = rotation_matrix(cam.yaw, cam.pitch, cam.roll)
    fov_scale = cam.fov_scale if cam.fov_scale is not None else 0.5
    view_width = 2.0 * jnp.tan(jnp.deg2rad(cam.fov) * fov_scale)
    view_height = view_width * (h / w)
    direction = trans @ jnp.array([0.0, 0.0, -1.0], jnp.float32)
    width_axis = trans @ jnp.array([1.0, 0.0, 0.0], jnp.float32)
    height_axis = trans @ jnp.array([0.0, 1.0, 0.0], jnp.float32)
    scalf = jnp.zeros((16,), jnp.float32)
    scalf = scalf.at[_SPOS:_SPOS + 3].set(cam.position)
    scalf = scalf.at[_SDIR:_SDIR + 3].set(direction)
    scalf = scalf.at[_SWA:_SWA + 3].set(width_axis)
    scalf = scalf.at[_SHA:_SHA + 3].set(height_axis)
    scalf = scalf.at[_SVW].set(view_width)
    scalf = scalf.at[_SVH].set(view_height)
    scalf = scalf.at[_SHALFAP].set(cam.aperture * 0.5)
    scalf = scalf.at[_SFOCAL].set(cam.focal_length)
    return scalf
