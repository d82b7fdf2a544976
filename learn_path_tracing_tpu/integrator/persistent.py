"""Persistent-wavefront integrator with path regeneration.

The reference's wavefront relies on Taichi's sparse bitmasked pools to skip
dead rays (15_module.py:56-57,1032-1034). On TPU, masked lanes still burn
VPU cycles, so a fixed bounce loop wastes ~(limit / avg_bounces)x of the
intersection work. This integrator keeps every lane busy instead:

- the render is a list of ``N*spp`` work items; item ``w`` is
  (pixel = w // spp, sample = w % spp); lane ``i`` processes items
  ``i, i+N, i+2N, ...`` — successive items on a lane land on *different*
  pixels, so per-lane total path length concentrates around the mean and
  the straggler tail stays small (unlike binding a lane to one pixel,
  where a single glassy pixel serializes spp * max_bounce passes);
- when a lane's path ends (escape or bounce budget), it immediately starts
  its next work item's primary ray;
- escaped radiance accumulation exploits the work-item algebra: with
  ``witem = lane + k*n`` and ``spp | n``, the target pixel decomposes as
  ``pixel = group + k*(n/spp)`` where ``group = lane // spp`` is *static*
  per lane and only ``k`` (the per-lane item counter, < spp) is dynamic.
  The per-pixel scatter-add (measured 42 ms/pass in round 1 — XLA
  serializes TPU scatters) therefore becomes a batched one-hot matmul
  over the tiny spp axis into an ``[n/spp, spp, 3]`` accumulator, plus a
  single transpose at the end. When ``spp`` does not divide ``n`` the
  scatter fallback is used.

RNG streams are counter-based on absolute (pixel, sample, bounce), so this
computes exactly the same per-sample radiance values as
integrator.wavefront.render — only the per-pixel summation order differs
(f32 reassociation ~1 ulp). Traced-segment counts match exactly
(tests/test_persistent.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..bsdf.bsdf import SCATTERERS
from ..camera.camera import CameraParams, generate_rays_for_pixels
from ..core import rng
from ..core.pytree import tree_where
from .wavefront import _scene_fns

# Smallest auto-policy pool: 56 sphere-kernel blocks of 1024 lanes — enough
# grid steps to amortize per-pass fixed costs (measured knee on v5e; the
# n/32 = 28.8k-lane point regressed 106.9 -> 92.2 Mrays/s).
POOL_FLOOR = 57600


@partial(jax.jit, static_argnames=("resolution", "spp", "limit", "bsdf",
                                   "camera_model", "scene", "hit_backend",
                                   "engine", "pool_mult", "pool_div",
                                   "drain_ratio", "drain_floor",
                                   "drain_unroll", "acc_split", "stats"))
def render_persistent(world_data, cam: CameraParams, resolution, spp: int,
                      limit: int = 32, seed=0, bsdf: str = "modern",
                      camera_model: str = "thinlens", scene: str = "spheres",
                      hit_backend: str = "auto", engine: str = "auto",
                      pool_mult: int = 0, pool_div: int = 0,
                      drain_ratio: int = 8, drain_floor: int = 0,
                      drain_unroll: int = 0, acc_split: int = 0,
                      stats: bool = False):
    """Returns (image f32[W,H,3], segments f32). Same sample values as
    wavefront.render; per-pixel sum order differs (~1 ulp).

    ``engine``: 'mega' runs the whole pass as one fused Pallas kernel
    (ops/bounce_megakernel.py — spheres + modern BSDF + thin-lens only,
    spp | n); 'modular' composes the per-stage ops. 'auto' picks 'modular':
    measured on v5e, the megakernel is ~1.6x *slower* (31.8 vs 50.6 Mrays/s
    at 1280x720) because Mosaic's scalar-loop transcendental lowering loses
    to XLA's fused wide elementwise pipeline for the BSDF/camera math — the
    hybrid split (Pallas for the [rays, spheres] scan + one-hot gather, XLA
    for [n]-wide shading) is the fast configuration. The megakernel's
    sampling matches the modular path's RNG counters exactly but its
    transcendental approximations differ at ~1e-4, so images agree within
    MC noise rather than bitwise.
    """
    w, h = resolution
    if engine == "auto":
        engine = "modular"
    if engine == "mega":
        return _render_mega(world_data, cam, resolution, spp, limit, seed)
    n = w * h
    out = _persistent_core(
        world_data, cam, resolution, n, 0, 0, spp, limit, seed, bsdf,
        camera_model, scene, hit_backend, pool_mult, pool_div, drain_ratio,
        drain_floor, drain_unroll, acc_split, stats)
    if stats:
        acc_flat, segments, st = out
        return (acc_flat / spp).reshape(w, h, 3), segments, st
    acc_flat, segments = out
    return (acc_flat / spp).reshape(w, h, 3), segments


def _persistent_core(world_data, cam: CameraParams, resolution, n: int,
                     pixel_base, sample_base, spp: int, limit: int, seed,
                     bsdf: str, camera_model: str, scene: str,
                     hit_backend: str, pool_mult: int, pool_div: int,
                     drain_ratio: int, drain_floor: int = 0,
                     drain_unroll: int = 0, acc_split: int = 0,
                     stats: bool = False):
    """Persistent render over a pixel range and sample range.

    Traces samples ``[sample_base, sample_base + spp)`` of pixels
    ``[pixel_base, pixel_base + n)`` of the full ``resolution`` image and
    returns ``(acc f32[n, 3] radiance sums, segments f32)`` (plus a stats
    dict when requested). ``pixel_base``/``sample_base`` may be traced
    scalars — this is the shard body for parallel.mesh's tile/spp-sharded
    persistent path: the item schedule, drain cascade and accumulation are
    all local to the range, so a shard needs no cross-chip traffic until
    the final image gather. RNG streams are keyed on absolute
    (pixel, sample), so per-sample radiance is reshard-invariant.
    """
    total = n * spp
    pixel_base = jnp.uint32(pixel_base)
    sample_base = jnp.uint32(sample_base)
    scatter = SCATTERERS[bsdf]
    hit_fn, background_fn = _scene_fns(scene)
    matmul_acc = (n % spp == 0)

    # Pool sizing. The work-item algebra holds for ANY pool size with
    # spp | pool and pool | n*spp: item k of lane L is
    # pixel = L//spp + k*G (G = pool//spp), sample = L % spp,
    # k < items_per = n*spp/pool.
    #
    # pool > n (pool_mult, round-1 experiment) was measured slower at every
    # size on v5e: both compute engines walk ray blocks sequentially, so a
    # wider pool adds no parallelism — it only shortens per-lane item lists
    # (occupancy decay dominates sooner), widens drain levels, grows the
    # sort. pool < n (pool_div) goes the other way: longer item lists =
    # sharper lane-work concentration = higher occupancy, at the price of
    # more passes (per-pass fixed overhead). Default: auto policy below.
    if pool_mult and pool_div:
        raise ValueError("pool_mult and pool_div are mutually exclusive")
    if not matmul_acc:
        if pool_mult or pool_div:
            raise ValueError(
                f"pool_mult/pool_div need spp | n (n={n}, spp={spp})")
        pool = n
    elif pool_mult:
        if spp % pool_mult != 0:
            # items_per = spp // q truncates; a non-divisor q would silently
            # drop the last spp % q samples of every pixel (image still
            # divided by the full spp → darkened render).
            raise ValueError(
                f"pool_mult={pool_mult} must divide spp={spp} "
                f"(each lane runs spp/pool_mult work items)")
        pool = pool_mult * n
    elif pool_div:
        # Fractional pool: fewer lanes, each running ~pool_div*spp work
        # items. Longer per-lane item lists concentrate total lane work
        # around the mean (CLT), so end-of-schedule occupancy decay — the
        # dominant loss at large n (61% occupancy at 921k lanes, round 1) —
        # shrinks as 1/sqrt(items_per). The item algebra needs only
        # spp | pool (items_per is a ceiling; overshoot items are masked).
        pool = -(-(n // pool_div) // spp) * spp
        if pool < spp:
            raise ValueError(
                f"pool_div={pool_div} leaves a pool below spp={spp}")
    else:
        # Auto policy (v5e sweep, 1280x720 spp64 headline): 86.2 Mrays/s at
        # pool=n, 92.4 at n/2, 94.4 at n/4, 104.1 at n/8, 106.9 at n/16
        # (pool 57.6k), 92.2 at n/32 — occupancy keeps improving with item
        # list length until per-pass fixed costs dominate below ~50k lanes.
        # Halve while staying >= POOL_FLOOR, then round up to an spp
        # multiple (works for ANY n, e.g. the 3000x2000 flagship render).
        #
        # Legacy mesh scenes invert the trade: their pass body carries ~3x
        # the fixed kernel-launch cost (sorts + packet kernel + atlas
        # gathers, BASELINE.md round-3), so fewer/wider passes win — the
        # yoimiya sweep measured 12.18 Mrays/s at pool=n vs 12.11 (n/2) and
        # 11.98 (n/4 auto); keep the full-width pool there.
        pool = n
        if matmul_acc and scene != "legacy":
            while pool // 2 >= POOL_FLOOR:
                pool //= 2
            pool = -(-pool // spp) * spp
            # Align the pool to whole 1024-lane kernel blocks when spp
            # allows: 57600 lanes = 56.25 blocks pads 768 dead lanes into
            # every intersect pass (1.3% pure waste). Floor to the largest
            # block-aligned spp-multiple >= POOL_FLOOR/2.
            import math

            step = math.lcm(1024, spp)
            if step <= pool and (pool // step) * step * 2 >= POOL_FLOOR:
                pool = (pool // step) * step
    # items_per is a CEILING: pool need not divide n*spp — item slots whose
    # pixel lands past n are masked invalid in item_of and never traced.
    items_per = -(-(n * spp) // pool) if matmul_acc else spp
    lanes = jnp.arange(pool, dtype=jnp.uint32)
    groups = pool // spp if matmul_acc else 0

    sample_const = (lanes % jnp.uint32(spp)) if matmul_acc else None
    group_const = (lanes // jnp.uint32(spp)) if matmul_acc else None

    def item_of(k):
        """k-th work item of each lane → (valid, pixel u32[P], sample u32[P])."""
        if matmul_acc:
            pixel = group_const + k * jnp.uint32(groups)
            valid = (k < jnp.uint32(items_per)) & (pixel < jnp.uint32(n))
            pixel = jnp.minimum(pixel, jnp.uint32(n - 1))
            return valid, pixel, sample_const
        witem = lanes + k * jnp.uint32(pool)
        valid = witem < total
        pixel = jnp.minimum(witem // jnp.uint32(spp), jnp.uint32(n - 1))
        sample = witem % jnp.uint32(spp)
        return valid, pixel, sample

    def primary(pixel, sample):
        # item-algebra pixels/samples are range-local; RNG + camera take
        # absolute ids so shards compute identical per-sample radiance
        return generate_rays_for_pixels(cam, resolution, pixel + pixel_base,
                                        seed, sample + sample_base,
                                        model=camera_model)

    valid0, pix0, samp0 = item_of(jnp.uint32(0))
    rays0 = primary(pix0, samp0)
    rays0 = type(rays0)(ro=rays0.ro, rd=rays0.rd, throughput=rays0.throughput,
                        alive=valid0)
    live0 = jnp.sum(valid0.astype(jnp.float32))

    # The live-lane count is CARRIED in the loop state (computed inside the
    # body where it fuses with the alive-mask math) so every while cond is a
    # scalar compare instead of a fresh full-array reduction — per-pass cost
    # here is billed by kernel launches, not FLOPs (BASELINE.md round-3).
    def cond(state):
        return state[-1] > 0.0

    # Factorized one-hot accumulation (k = q*P + p via two small one-hots:
    # tmp[g,r,p,c] = onehot_p * c elementwise, then a q-contraction).
    # Identical term set per (g,q,p,c) cell — both one-hots are exact 0/1
    # factors — so results differ from the flat path only by f32 add order
    # within a cell (~1 ulp, the integrator's documented freedom).
    # MEASURED SLOWER than the flat one-hot on the headline config
    # (standalone 0.74 vs 0.52 ms/pass at items=1024/P=32; end-to-end
    # 95.5 vs 97.6 Mrays/s, v5e 2026-08-20): the [g,spp,P,3] tmp expand
    # plus the second one-hot cost more than the saved contraction width —
    # XLA evidently does NOT pay the naive [g,spp,items] materialization
    # bytes at large sizes (time1024's items≈16k runs fine on the flat
    # path). Kept behind ``acc_split`` for ablation; 0 = flat (default).
    _acc_P = 1
    if matmul_acc and acc_split > 1 and items_per % acc_split == 0:
        _acc_P = acc_split

    def accumulate(acc, k, pixel, contrib):
        """Add per-lane contributions to the accumulator.

        matmul path: ``acc`` is ``f32[groups, items_per, 3]`` indexed by
        (lane//spp, k); one-hot(s) over k ride the MXU as batched
        contractions — no scatter.
        """
        if not matmul_acc:
            return acc.at[pixel].add(contrib)
        k_g = k.reshape(groups, spp)
        c_g = contrib.reshape(groups, spp, 3)
        if _acc_P > 1:
            q_w = items_per // _acc_P
            q_g = k_g // jnp.uint32(_acc_P)
            p_g = k_g % jnp.uint32(_acc_P)
            oh_p = (p_g[:, :, None]
                    == jnp.arange(_acc_P, dtype=jnp.uint32)
                    ).astype(jnp.float32)                  # [g, spp, P]
            tmp = (oh_p[..., None] * c_g[:, :, None, :]
                   ).reshape(groups, spp, _acc_P * 3)      # [g, spp, P*3]
            oh_q = (q_g[:, :, None]
                    == jnp.arange(q_w, dtype=jnp.uint32)
                    ).astype(jnp.float32)                  # [g, spp, q_w]
            delta = jax.lax.dot_general(
                oh_q, tmp, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)       # [g, q_w, P*3]
            return acc + delta.reshape(groups, items_per, 3)
        # Exact bf16-split accumulation on the DEFAULT MXU path. Default
        # precision would truncate the radiance contributions to bf16
        # (banding in smooth gradients) and precision=HIGHEST fixes that by
        # running ~6 bf16 passes over BOTH operands — but the one-hot
        # operand is exactly representable in bf16 (entries are 0/1), and
        # an f32 contribution splits EXACTLY into 3 non-overlapping bf16
        # parts (24 = 3x8 mantissa bits; each bf16xbf16 product is exact
        # and the MXU accumulates in f32). One default-precision pass over
        # [spp, 3*items] replaces HIGHEST's multi-pass split of both
        # operands. Same term set per (g, item) cell — only f32 add
        # order differs (~1 ulp, the integrator's documented freedom).
        onehot = (k_g[:, :, None] == jnp.arange(items_per, dtype=jnp.uint32)
                  ).astype(jnp.bfloat16)
        hi = c_g.astype(jnp.bfloat16)
        r1 = c_g - hi.astype(jnp.float32)
        lo = r1.astype(jnp.bfloat16)
        lo2 = (r1 - lo.astype(jnp.float32)).astype(jnp.bfloat16)
        c9 = jnp.concatenate([hi, lo, lo2], axis=-1)     # bf16 [g, spp, 9]
        d = jax.lax.dot_general(
            onehot, c9, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # [g, items, 9]
        return acc + (d[..., 0:3] + d[..., 3:6] + d[..., 6:9])

    def step(rays, k, bounce, pixel, sample, item_fn):
        """One bounce pass; shared by the full-width and drain loops.
        Returns (rays', k', bounce', contrib, live_before, live_after)."""
        hits = hit_fn(world_data, rays, hit_backend)
        live = jnp.sum(rays.alive.astype(jnp.float32))

        escaped = rays.alive & ~hits.hit
        contrib = jnp.where(
            escaped[:, None],
            background_fn(world_data, rays.rd, escaped) * rays.throughput, 0.0)

        base = rng.base(rng.stream(seed, sample + sample_base, bounce,
                                   rng.STREAM_BSDF),
                        pixel + pixel_base)
        scattered = scatter(rays, hits, base)
        survived = rays.alive & hits.hit & (bounce + 1 < limit)

        # lanes whose path ended advance to their next work item
        ended = rays.alive & ~survived
        next_k = k + ended.astype(jnp.uint32)
        nvalid, npix, nsamp = item_fn(next_k)
        need_regen = ended & nvalid
        fresh = primary(npix, nsamp)

        rays = tree_where(survived, scattered,
                          tree_where(need_regen, fresh, rays))
        alive = survived | need_regen
        rays = type(rays)(ro=rays.ro, rd=rays.rd, throughput=rays.throughput,
                          alive=alive)
        bounce = jnp.where(survived, bounce + 1, jnp.uint32(0))
        live_after = jnp.sum(alive.astype(jnp.float32))
        return rays, next_k, bounce, contrib, live, live_after

    def body(state):
        rays, k, bounce, acc, segments, passes, _ = state
        _, pixel, sample = item_of(k)
        rays, next_k, bounce, contrib, live, live_after = step(
            rays, k, bounce, pixel, sample, item_of)
        acc = accumulate(acc, k, pixel, contrib)
        return (rays, next_k, bounce, acc, segments + live, passes + 1.0,
                live_after)

    acc0 = (jnp.zeros((groups, items_per, 3), jnp.float32) if matmul_acc
            else jnp.zeros((n, 3), jnp.float32))
    state0 = (
        rays0,
        jnp.zeros((pool,), jnp.uint32),
        jnp.zeros((pool,), jnp.uint32),
        acc0,
        jnp.float32(0.0),
        jnp.float32(0.0),   # pass counter (telemetry)
        live0,              # carried live count (cond reads a scalar)
    )

    # Drain compaction: the static item schedule leaves a long straggler
    # tail — the last few % of work can take most of the passes, each
    # paying full-wavefront intersect/shade cost. Cascade: whenever the
    # live-lane count falls below the next (8x narrower) width, argsort-
    # compact the surviving lane state into that width, so tail passes cost
    # 1/8, 1/64, ... of a full pass. Contributions in drain levels
    # scatter-add into a flat pixel accumulator (cheap at narrow widths).
    def _round256(v):
        return -(-v // 256) * 256

    # drain_floor: narrowest level the cascade may reach. For packet BVH
    # traversal a narrow incoherent pass still walks ~the whole tree (drain
    # passes averaged ~6 ms vs 2.58 ms full-width on Yoimiya), so raising
    # the floor looked promising — but the end-to-end sweep refutes it:
    # floor 256 = 11.25 Mrays/s, 1024 = 10.82, 4096 = 10.52, no drain =
    # 10.29 (scripts/sweep_drain_floor.py, v5e 2026-08-18). Fewer full-width
    # passes (338 vs 453) outweigh the expensive tail, so the deep cascade
    # stays the default everywhere.
    if drain_floor <= 0:
        drain_floor = 256
    _ratio = drain_ratio  # 8 measured best on v5e (4 worse; see BASELINE.md)
    levels = []
    lw = _round256(pool // _ratio)
    while (matmul_acc and lw >= drain_floor
           and lw < (levels[-1] if levels else pool)):
        levels.append(lw)
        lw = _round256(lw // _ratio)

    if levels:
        def cond1(state):
            return state[-1] > jnp.float32(levels[0])
    else:
        cond1 = cond
    (rays, k, bounce, acc, segments, passes_full,
     live_now) = jax.lax.while_loop(cond1, body, state0)
    drain_passes = []

    if matmul_acc:
        # acc[g, k] holds pixel g + k*groups → transpose to pixel-major.
        # The ceil item schedule can overshoot n; the excess rows are
        # all-zero (their items were masked invalid) — slice them off.
        acc = acc.transpose(1, 0, 2).reshape(groups * items_per, 3)[:n]
    acc_flat = acc

    g_arr = lanes // jnp.uint32(spp)
    samp_arr = lanes % jnp.uint32(spp) if matmul_acc else None
    for li, lw in enumerate(levels):
        order = jnp.argsort(jnp.logical_not(rays.alive), stable=True)
        sel = order[:lw]
        g_arr = jnp.take(g_arr, sel, axis=0)
        samp_arr = jnp.take(samp_arr, sel, axis=0)
        rays = type(rays)(
            ro=jnp.take(rays.ro, sel, axis=0),
            rd=jnp.take(rays.rd, sel, axis=0),
            throughput=jnp.take(rays.throughput, sel, axis=0),
            alive=jnp.take(rays.alive, sel, axis=0),
        )
        k = jnp.take(k, sel, axis=0)
        bounce = jnp.take(bounce, sel, axis=0)

        g_cur, samp_cur = g_arr, samp_arr

        def item_of_d(kv, g_cur=g_cur, samp_cur=samp_cur):
            pixel = g_cur + kv * jnp.uint32(groups)
            valid = (kv < jnp.uint32(items_per)) & (pixel < jnp.uint32(n))
            pixel = jnp.minimum(pixel, jnp.uint32(n - 1))
            return valid, pixel, samp_cur

        next_w = levels[li + 1] if li + 1 < len(levels) else 0

        def cond_d(state, next_w=next_w):
            return state[-1] > jnp.float32(next_w)

        # drain_unroll > 1 runs that many bounce steps per while iteration
        # (steps on a drained pool are exact no-ops, so overshoot past the
        # level boundary never changes results). Measured NEUTRAL on v5e:
        # yoimiya spp64 wall was 1.670 s with unroll 1 and with 2/4/8 —
        # while-iteration overhead inside a jitted loop is ~0 on this
        # runtime; drain cost is per-STEP compute (the packet kernel's
        # node union, width-independent — see c9b0878). Kept as an
        # ablation knob; auto stays 1.
        unroll = drain_unroll if drain_unroll > 0 else 1

        def body_d(state, item_of_d=item_of_d, samp_cur=samp_cur,
                   unroll=unroll):
            rays, k, bounce, acc, segments, passes, live_now = state
            for _ in range(unroll):
                _, pixel, _ = item_of_d(k)
                rays, k, bounce, contrib, live, live_now = step(
                    rays, k, bounce, pixel, samp_cur, item_of_d)
                acc = acc.at[pixel].add(contrib)
                segments = segments + live
                passes = passes + 1.0
            return (rays, k, bounce, acc, segments, passes, live_now)

        (rays, k, bounce, acc_flat, segments, lvl_passes,
         live_now) = jax.lax.while_loop(
            cond_d, body_d,
            (rays, k, bounce, acc_flat, segments, jnp.float32(0.0), live_now))
        drain_passes.append(lvl_passes)

    if stats:
        return acc_flat, segments, {
            "pool": pool,   # actual full-width lane count (auto policy)
            "passes_full": passes_full,
            "drain_widths": tuple(levels),
            "drain_passes": tuple(drain_passes),
        }
    return acc_flat, segments


def _render_mega(world_data, cam: CameraParams, resolution, spp: int,
                 limit: int, seed, interpret: bool | None = None):
    """Fused-megakernel persistent render (see ops/bounce_megakernel.py)."""
    from ..ops import bounce_megakernel as mk

    if interpret is None:
        # Pallas interpreter on CPU so the megakernel stays testable there.
        interpret = jax.default_backend() == "cpu"

    w, h = resolution
    n = w * h
    groups = n // spp
    n_pad = -(-n // mk.RAY_BLOCK) * mk.RAY_BLOCK

    table, attrs = mk.pack_scene(world_data)
    scalf = mk.pack_camera(cam, resolution)
    scali = jnp.asarray([seed], jnp.int32)

    lanes = jnp.arange(n, dtype=jnp.uint32)
    pix0 = lanes // jnp.uint32(spp)
    samp0 = lanes % jnp.uint32(spp)
    rays0 = generate_rays_for_pixels(cam, resolution, pix0, seed, samp0,
                                     model="thinlens")
    stf = jnp.zeros((16, n_pad), jnp.float32)
    stf = stf.at[mk._RO:mk._RO + 3, :n].set(rays0.ro.T)
    stf = stf.at[mk._RD:mk._RD + 3, :n].set(rays0.rd.T)
    stf = stf.at[mk._THP:mk._THP + 3, :n].set(rays0.throughput.T)
    stf = stf.at[mk._ALIVE, :n].set(1.0)
    sti = jnp.zeros((8, n_pad), jnp.int32)

    karange = jnp.arange(spp, dtype=jnp.int32)

    def accumulate(acc, k, contrib):
        # contrib rows f32[3, n_pad]; lane→(group, k) one-hot matmul as in
        # the modular path (pad lanes/k>=spp fall outside the onehot).
        k_g = k[:n].reshape(groups, spp)
        c_g = contrib[:, :n].reshape(3, groups, spp)
        onehot = (k_g[:, :, None] == karange).astype(jnp.float32)
        # [g, r, k] x [c, g, r] -> [g, k, c]
        delta = jnp.einsum("grk,cgr->gkc", onehot, c_g,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
        return acc + delta

    def cond(state):
        stf, _, _, _ = state
        return jnp.any(stf[mk._ALIVE] > 0.5)

    def body(state):
        stf, sti, acc, segments = state
        segments = segments + jnp.sum(stf[mk._ALIVE, :])
        k_in = sti[mk._K]
        stf2, sti2 = mk.bounce_pass(stf, sti, table, attrs, scalf, scali,
                                    resolution, spp, limit=limit,
                                    interpret=interpret)
        acc = accumulate(acc, k_in, stf2[mk._CONTRIB:mk._CONTRIB + 3])
        return stf2, sti2, acc, segments

    acc0 = jnp.zeros((groups, spp, 3), jnp.float32)
    state0 = (stf, sti, acc0, jnp.float32(0.0))
    _, _, acc, segments = jax.lax.while_loop(cond, body, state0)
    img = acc.transpose(1, 0, 2).reshape(n, 3)
    return (img / spp).reshape(w, h, 3), segments
