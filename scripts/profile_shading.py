"""Isolate the post-traversal shading costs of hit_legacy on the live chip:
tri-attribute row gather, bilinear atlas tap, environment tap, argsort.

Usage:  python scripts/profile_shading.py
"""

import os
import sys
import warnings

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from learn_path_tracing_tpu.camera import LegacyCamera
    from learn_path_tracing_tpu.camera.camera import generate_rays_for_pixels
    from learn_path_tracing_tpu.io.texture import sample_bilinear_strips
    from learn_path_tracing_tpu.ops.packet_traverse import (
        _coherence_order, packet_traverse)
    from learn_path_tracing_tpu.scene.legacy_world import (
        LegacyWorld, environment_color, hit_legacy)
    from learn_path_tracing_tpu.stages.legacy_common import make_asset_path_map
    from learn_path_tracing_tpu.utils.benchlib import time_fn

    res = (640, 360)
    n = res[0] * res[1]
    world = LegacyWorld()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        wd = world.load("/root/reference/legacy/Yoimiya.world.npy",
                        path_map=make_asset_path_map())
    cam = LegacyCamera(res)
    cam.set_fov(30)
    cam.set_position((0, 8, -30))
    cam.look_at((0, 8, 0))
    cp = cam.params()
    pix = jnp.arange(n, dtype=jnp.uint32)
    rays = jax.jit(lambda s: generate_rays_for_pixels(cp, res, pix, s, 0))(0)
    mesh = wd.meshes[0]
    nodes, entries, runs = mesh.packet
    t_inf = jnp.full((n,), jnp.inf, jnp.float32)
    alive = jnp.ones((n,), bool)

    trav = jax.jit(lambda nd, en, ru, ro, rd: packet_traverse(
        nd, en, ru, ro, rd, t_inf, alive, sort_rays=False))
    t, prim = trav(nodes, entries, runs, rays.ro, rays.rd)
    pidx = jnp.maximum(prim, 0)

    T = wd.tri_attr.shape[0]
    key = jax.random.PRNGKey(0)
    rnd_idx = jax.random.randint(key, (n,), 0, T)

    @jax.jit
    def attr_gather(tab, idx):
        return jnp.take(tab, idx, axis=0).sum()

    @jax.jit
    def atlas_tap(a, u, v, tex):
        return sample_bilinear_strips(a, tex, u, v, channels=8).sum()

    @jax.jit
    def env_tap(envs, rd):
        m = jnp.ones((n,), bool)
        return environment_color(envs, wd.env_id, rd, m).sum()

    @jax.jit
    def argsort_only(nd, ent, ro, rd):
        return _coherence_order(nd, ent, ro, rd)[1]

    @jax.jit
    def hit_full(wd, rays):
        return hit_legacy(wd, rays).t.sum()

    u = jax.random.uniform(key, (n,))
    v = jax.random.uniform(jax.random.PRNGKey(1), (n,))
    tex = jnp.zeros((n,), jnp.int32)

    for name, f, fargs in [
        ("traverse_nosort", trav, (nodes, entries, runs, rays.ro, rays.rd)),
        ("attr_gather_hitorder", attr_gather, (wd.tri_attr, pidx)),
        ("attr_gather_random", attr_gather, (wd.tri_attr, rnd_idx)),
        ("atlas_tap", atlas_tap, (wd.atlas, u, v, tex)),
        ("env_tap", env_tap, (wd.envs, rays.rd)),
        ("argsort_only", argsort_only, (nodes, entries, rays.ro, rays.rd)),
        ("hit_legacy_full", hit_full, (wd, rays)),
    ]:
        dt, _ = time_fn(f, *fargs, iters=4)
        print(f"{name:22s} {dt*1e3:8.2f} ms ({n/dt/1e6:7.1f} Mlanes/s)",
              flush=True)


if __name__ == "__main__":
    main()
