"""Progressive accumulation renderer with movement-aware restart.

Mirrors the legacy ``render(moved)`` loop
(/root/reference/legacy/PT_in_one_weekend/15_module.py:1022-1036): an
accumulator image plus an spp counter that reset when the camera moves and
keep integrating otherwise; the display frame is ``(acc / spp) ** (1/2.2)``
(legacy line uses plain gamma, no ACES).

``ti.GUI`` has no TPU analog — the interactive surface here is either a
frame callback (PNG stream / notebook display) or the scripted flythrough
in stages/l12_free_view.py. Camera state persists across frames as an
in-memory render-resume checkpoint; ``state()``/``restore()`` expose it for
disk checkpointing (the accumulator + spp + RNG counters are the complete
resume state thanks to the counter-based RNG).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..camera.camera import Camera
from ..integrator.wavefront import render_accumulate


@functools.partial(jax.jit, static_argnames=())
def _to_frame(acc, spp):
    return jnp.maximum(acc / jnp.maximum(spp, 1.0), 0.0) ** (1.0 / 2.2)


class ProgressiveRenderer:
    def __init__(self, world_data, camera: Camera, resolution,
                 spp_per_frame: int = 32, limit: int = 32, seed: int = 0,
                 bsdf: str = "legacy", scene: str = "legacy",
                 camera_model: str = "thinlens", hit_backend: str = "auto",
                 preview_spp: int = 0, preview_limit: int = 2):
        """``preview_spp > 0`` enables motion preview: while the camera is
        moving, frames render at ``preview_spp`` samples and ``preview_limit``
        bounces (first hit + one scatter + env ≈ shaded geometry) instead of
        the full quality settings, so free-fly stays responsive on scenes
        whose full pass is below interactive rate (the 23k-tri mesh scenes —
        the reference free-flies such scenes at 640x360, 12_free_view.py:26-30).
        The first still frame discards the preview and restarts clean
        accumulation at full quality."""
        self.world_data = world_data
        self.camera = camera
        self.resolution = (int(resolution[0]), int(resolution[1]))
        self.spp_per_frame = int(spp_per_frame)
        self.limit = int(limit)
        self.seed = int(seed)
        self.bsdf = bsdf
        self.scene = scene
        self.camera_model = camera_model
        self.hit_backend = hit_backend
        self.preview_spp = int(preview_spp)
        self.preview_limit = int(preview_limit)
        w, h = self.resolution
        self.acc = jnp.zeros((w * h, 3), jnp.float32)
        self.spp = 0
        self._preview_only = False

    def render(self, moved: bool = True):
        """Add one batch of samples; reset the accumulator if the camera
        moved. Returns the current display frame ``f32[W,H,3]``."""
        w, h = self.resolution
        if moved and self.preview_spp:
            acc, _ = render_accumulate(
                self.world_data, self.camera.params(),
                jnp.zeros((w * h, 3), jnp.float32), jnp.uint32(0),
                self.resolution, self.preview_spp, limit=self.preview_limit,
                seed=self.seed, bsdf=self.bsdf,
                camera_model=self.camera_model, scene=self.scene,
                hit_backend=self.hit_backend)
            self.acc = acc
            self.spp = self.preview_spp
            self._preview_only = True
            return self.frame()
        if moved or self._preview_only:
            self.acc = jnp.zeros((w * h, 3), jnp.float32)
            self.spp = 0
            self._preview_only = False
        self.acc, _ = render_accumulate(
            self.world_data, self.camera.params(), self.acc,
            jnp.uint32(self.spp), self.resolution, self.spp_per_frame,
            limit=self.limit, seed=self.seed, bsdf=self.bsdf,
            camera_model=self.camera_model, scene=self.scene,
            hit_backend=self.hit_backend)
        self.spp += self.spp_per_frame
        return self.frame()

    def frame(self):
        w, h = self.resolution
        return _to_frame(self.acc, jnp.float32(self.spp)).reshape(w, h, 3)

    # ------------------------------------------------- resume checkpoint --
    def state(self) -> dict:
        """Serializable render-resume state (accumulator + counters)."""
        return {
            "acc": np.asarray(self.acc),
            "spp": self.spp,
            "seed": self.seed,
            "resolution": self.resolution,
        }

    def restore(self, state: dict) -> None:
        if tuple(state["resolution"]) != self.resolution:
            raise ValueError("resolution mismatch")
        self.acc = jnp.asarray(state["acc"])
        self.spp = int(state["spp"])
        self.seed = int(state["seed"])
