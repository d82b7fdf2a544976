"""Count compiled-kernel launches (HLO fusions/customs) inside the
persistent-integrator while-loop bodies, for the mesh and sphere scenes.

The axon-tunneled runtime charges a large fixed cost per kernel launch
(~30-100 us measured via chained fori_loop floors), so per-pass kernel
COUNT — not FLOPs — dominates the mesh path's 3.48 ms/pass. This dumps the
optimized HLO of a representative pass body and tallies launchable ops.

Usage:  python scripts/profile_kernelcount.py [--scene yoimiya|10_final]
"""

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="yoimiya",
                   choices=["yoimiya", "10_final"])
    p.add_argument("--lanes", type=int, default=57600)
    p.add_argument("--dump", default=None, help="write full HLO text here")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from learn_path_tracing_tpu.bsdf.bsdf import scatter_legacy, scatter_modern
    from learn_path_tracing_tpu.camera import LegacyCamera, Camera
    from learn_path_tracing_tpu.camera.camera import generate_rays_for_pixels
    from learn_path_tracing_tpu.core import rng
    from learn_path_tracing_tpu.core.pytree import tree_where
    from learn_path_tracing_tpu.integrator.wavefront import _scene_fns

    res = (640, 360)
    n = res[0] * res[1]
    pool = args.lanes
    spp = 64
    groups = pool // spp
    items_per = n * spp // pool

    if args.scene == "yoimiya":
        from worldcache import load_world
        wd = load_world()
        cam = LegacyCamera(res)
        cam.set_fov(30)
        cam.set_position((0, 8, -30))
        cam.look_at((0, 8, 0))
        scatter = scatter_legacy
        scene = "legacy"
        model = "jitter"
    else:
        from learn_path_tracing_tpu.models.scenes import random_scene
        wd = random_scene()
        cam = Camera(res)
        cam.set_fov(40)
        cam.set_position((13, 2, 3))
        cam.look_at((0, 0, 0))
        scatter = scatter_modern
        scene = "spheres"
        model = "thinlens"
    cp = cam.params()
    hit_fn, background_fn = _scene_fns(scene)

    lanes = jnp.arange(pool, dtype=jnp.uint32)
    sample_const = lanes % jnp.uint32(spp)
    group_const = lanes // jnp.uint32(spp)
    karange = jnp.arange(items_per, dtype=jnp.uint32)

    def body(wd, rays, k, acc):
        """One full-width pass: the real step() + accumulate composition."""
        pix = jnp.minimum(group_const + k * jnp.uint32(groups),
                          jnp.uint32(n - 1))
        hits = hit_fn(wd, rays, "auto")
        escaped = rays.alive & ~hits.hit
        contrib = jnp.where(
            escaped[:, None],
            background_fn(wd, rays.rd, escaped) * rays.throughput, 0.0)
        base = rng.base(rng.stream(0, sample_const, 1, rng.STREAM_BSDF), pix)
        sc = scatter(rays, hits, base)
        survived = rays.alive & hits.hit
        ended = rays.alive & ~survived
        next_k = k + ended.astype(jnp.uint32)
        npix = jnp.minimum(group_const + next_k * jnp.uint32(groups),
                           jnp.uint32(n - 1))
        fresh = generate_rays_for_pixels(cp, res, npix, 0, sample_const,
                                         model=model)
        out = tree_where(survived, sc, tree_where(ended, fresh, rays))
        k_g = k.reshape(groups, spp)
        c_g = contrib.reshape(groups, spp, 3)
        onehot = (k_g[:, :, None] == karange).astype(jnp.float32)
        acc = acc + jax.lax.dot_general(
            onehot, c_g, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        return out, next_k, acc

    rays0 = generate_rays_for_pixels(
        cp, res, jnp.minimum(group_const, jnp.uint32(n - 1)), 0,
        sample_const, model=model)
    k0 = jnp.zeros((pool,), jnp.uint32)
    acc0 = jnp.zeros((groups, items_per, 3), jnp.float32)

    lowered = jax.jit(body).lower(wd, rays0, k0, acc0)
    compiled = lowered.compile()
    txt = compiled.as_text()
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(txt)

    # Launchable-op census over the entry computation: every top-level
    # instruction that is a fusion/custom-call/sort/etc is ~one launch.
    counts = collections.Counter()
    entry = False
    for line in txt.splitlines():
        s = line.strip()
        if s.startswith("ENTRY"):
            entry = True
            continue
        if not entry:
            continue
        if s.startswith("}"):
            break
        m = re.match(r"%?[\w.\-]+ = \S+ ([a-z\-]+)", s)
        if not m:
            continue
        op = m.group(1)
        if op in ("parameter", "constant", "get-tuple-element", "tuple",
                  "bitcast"):
            continue
        counts[op] += 1
    total = sum(counts.values())
    print(f"scene={args.scene} pool={pool}")
    print(f"entry launchable ops: {total}")
    for op, c in counts.most_common():
        print(f"  {op:24s} {c}")
    # fusions inside while bodies etc. — count globally too
    allf = collections.Counter(re.findall(r" = \S+ (fusion|custom-call|sort|"
                                          r"gather|scatter|while|dot|"
                                          r"dynamic-slice|dynamic-update-slice"
                                          r"|reduce|transpose|copy)\(", txt))
    print("whole-module op census:", dict(allf))


if __name__ == "__main__":
    main()
