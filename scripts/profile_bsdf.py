"""Break scatter_legacy's per-pass cost into components and ablate
candidate cheaper formulations (all semantically equivalent or
distribution-equivalent; see notes inline).

Usage:  python scripts/profile_bsdf.py [--n 230400]
"""

import argparse
import os
import sys
import warnings

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=230400)
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from learn_path_tracing_tpu.bsdf import sampling as sp
    from learn_path_tracing_tpu.bsdf.bsdf import scatter_legacy
    from learn_path_tracing_tpu.core import rng
    from learn_path_tracing_tpu.core.types import Hits, Materials, Rays
    from learn_path_tracing_tpu.utils.benchlib import time_fn

    n = args.n
    key = jax.random.PRNGKey(0)
    ro = jax.random.normal(key, (n, 3))
    rd = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    nrm = jax.random.normal(jax.random.PRNGKey(2), (n, 3))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    point = jax.random.normal(jax.random.PRNGKey(3), (n, 3))
    thp = jnp.abs(jax.random.normal(jax.random.PRNGKey(4), (n, 3)))

    mat = Materials(
        albedo=jnp.abs(jax.random.normal(jax.random.PRNGKey(5), (n, 3))),
        roughness=jnp.abs(jax.random.normal(jax.random.PRNGKey(6), (n,))),
        metallic=jax.random.uniform(jax.random.PRNGKey(7), (n,)),
        transparency=jnp.zeros((n,)),
        ior=jnp.full((n,), 1.5),
        absorptivity=jnp.zeros((n,)),
    )
    rays = Rays(ro=ro, rd=rd, throughput=thp,
                alive=jnp.ones((n,), jnp.bool_))
    hits = Hits(hit=jnp.ones((n,), jnp.bool_), t=jnp.ones((n,)),
                point=point, normal=nrm, uv=jnp.zeros((n, 2)),
                obj=jnp.zeros((n,), jnp.int32), material=mat)

    base = rng.base(rng.stream(0, jnp.zeros((n,), jnp.uint32), 0,
                               rng.STREAM_BSDF),
                    jnp.arange(n, dtype=jnp.uint32))

    @jax.jit
    def full(rays, hits, base):
        r = scatter_legacy(rays, hits, base)
        return r.ro + r.rd + r.throughput

    @jax.jit
    def rng_only(base):
        u_metal = rng.uniform(base, 0)
        u1, u2, u3 = rng.uniform3(base, 1)
        u_fresnel = rng.uniform(base, 4)
        u5, u6 = rng.uniform2(base, 5)
        return u_metal + u1 + u2 + u3 + u_fresnel + u5 + u6

    @jax.jit
    def roughen_only(rd, nrm, base):
        u1, u2, u3 = rng.uniform3(base, 1)
        mr = jnp.abs(nrm[:, 0])
        return sp.roughen(sp.reflect(rd, nrm), mr, u1, u2, u3)

    @jax.jit
    def lambertian_only(nrm, base):
        u5, u6 = rng.uniform2(base, 5)
        return sp.sample_lambertian(nrm, u5, u6)

    @jax.jit
    def schlick_only(rd, nrm, thp):
        c = jnp.maximum(jnp.sum(nrm * (-rd), axis=-1), 0.0)
        return sp.schlick(c[..., None], thp) + sp.schlick(c, 0.04)[..., None]

    @jax.jit
    def refract_only(rd, nrm):
        return sp.refract_legacy(rd, nrm, 1.5)

    # variant: pow5 via explicit squaring (is XLA lowering x**5 well?)
    @jax.jit
    def schlick_sq(rd, nrm, thp):
        c = jnp.maximum(jnp.sum(nrm * (-rd), axis=-1), 0.0)

        def s(f0, c):
            m = 1.0 - c
            m2 = m * m
            return f0 + (1.0 - f0) * (m2 * m2 * m)

        return s(thp, c[..., None]) + s(0.04, c)[..., None]

    for name, f, fargs in [
        ("scatter_legacy", full, (rays, hits, base)),
        ("rng_draws_x7", rng_only, (base,)),
        ("roughen(reflect)", roughen_only, (rd, nrm, base)),
        ("sample_lambertian", lambertian_only, (nrm, base)),
        ("schlick_pair_pow", schlick_only, (rd, nrm, thp)),
        ("schlick_pair_sq", schlick_sq, (rd, nrm, thp)),
        ("refract_legacy", refract_only, (rd, nrm)),
    ]:
        dt, _ = time_fn(f, *fargs, iters=4)
        print(f"{name:18s} {dt * 1e3:8.2f} ms  ({n / dt / 1e6:8.1f} Mlanes/s)",
              flush=True)


if __name__ == "__main__":
    main()
