"""Stage 10: the RTIOW cover scene (10_final/__main__.py: ~490 spheres,
camera (13,2,3) → (0,0,0), fov 40, focal 10, aperture 0.2, spp 8192)."""

from ..models import random_scene, stage10_camera
from .common import parse_args, run_path_traced
from ..utils.config import STAGE_CONFIGS


def main():
    args = parse_args(STAGE_CONFIGS[10], description=__doc__)
    # The reference uses the unseeded host RNG for scene placement; we default
    # to a fixed seed so runs are reproducible.
    world = random_scene(seed=20230328)
    cam = stage10_camera((args.width, args.height))
    run_path_traced(world, cam, args, "10_final.png")


if __name__ == "__main__":
    main()
