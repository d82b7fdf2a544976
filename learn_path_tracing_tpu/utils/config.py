"""Render configuration (the reference's module-level constants, as data).

Mirrors the knob set of 15_module.py:36-44 and 10_final/__main__.py:50-52:
resolution / spp / batch / propagate_limit / epsilon plus our TPU-side
options. Plain dataclass — hashable fields are jit-static by construction.

Ablation-only environment knobs (the complete list). All are Pallas kernel
block sizes, read ONCE at module import (never at trace time inside jitted
code), with measured defaults — set them only when re-running the block
sweeps in scripts/:

  LPT_SPHERE_BLOCK      rays/grid-step of ops/sphere_scan.py (default 1024)
  LPT_PACKET_BLOCK      rays/packet of ops/packet_traverse.py (default 1024)
  LPT_MEGA_RAY_BLOCK    ops/bounce_megakernel.py ray block (default 2048;
  LPT_MEGA_SPHERE_CHUNK   ... sphere chunk, 256) — non-default engine

Everything else (pool sizing, drain cascade, sort behavior, backends) is a
keyword argument of render_persistent / hit functions with the measured
default; no other os.environ reads exist in the library.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass, replace


@dataclass(frozen=True)
class RenderConfig:
    width: int = 1280
    height: int = 720
    spp: int = 128
    batch: int = 1            # samples per progressive pass
    propagate_limit: int = 32
    epsilon: float = 1e-4
    seed: int = 0
    bsdf: str = "modern"          # diffuse | modern | legacy
    scene: str = "spheres"        # spheres | legacy
    camera_model: str = "thinlens"
    hit_backend: str = "auto"     # auto | xla | pallas | bvh
    early_exit: bool = True
    out: str | None = None        # output path override (stages/CLI)

    @property
    def resolution(self):
        return (self.width, self.height)

    @property
    def limit(self):
        return self.propagate_limit

    def with_(self, **kw) -> "RenderConfig":
        return replace(self, **kw)

    def to_dict(self) -> dict:
        return asdict(self)


# Stage presets (file:line cites in stages/*.py). Keys: modern stages 1-10,
# legacy stages as "l11".."l15".
STAGE_CONFIGS = {
    1: RenderConfig(width=256, height=256, spp=1),
    2: RenderConfig(spp=1),
    3: RenderConfig(spp=1),
    4: RenderConfig(spp=1),
    5: RenderConfig(spp=100),
    6: RenderConfig(spp=8192, bsdf="diffuse"),
    7: RenderConfig(spp=8192),
    8: RenderConfig(spp=8192),
    9: RenderConfig(spp=8192),
    10: RenderConfig(spp=8192),
    "l11": RenderConfig(width=640, height=360, spp=128, propagate_limit=10,
                        bsdf="legacy", hit_backend="auto"),
    "l12": RenderConfig(width=640, height=360, spp=128, propagate_limit=10,
                        bsdf="legacy"),
    "l13": RenderConfig(spp=128, bsdf="legacy"),
    "l14": RenderConfig(width=1500, height=1000, spp=32, bsdf="legacy",
                        scene="legacy"),
    "l15": RenderConfig(width=1500, height=1000, spp=32, bsdf="legacy",
                        scene="legacy"),
}
