"""Unified CLI: ``python -m learn_path_tracing_tpu <command> [...]``.

Commands:
  render --stage N [stage args...]   run a tutorial/legacy stage script
  stages                             list available stages
  smoke                              device smoke test (legacy/test.py analog)
  bench [...]                        run the benchmark (same as bench.py)
"""

from __future__ import annotations

import importlib
import sys

STAGES = {
    "1": "s01_save_img", "2": "s02_camera_and_ray", "3": "s03_adding_a_sphere",
    "4": "s04_objects", "5": "s05_anti_aliasing", "6": "s06_diffuse",
    "7": "s07_reflect", "8": "s08_refract", "9": "s09_dof", "10": "s10_final",
    "l11": "l11_bvh", "l12": "l12_free_view", "l13": "l13_texture",
    "l14": "l14_mesh", "l15": "l15_module",
}


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    cmd = argv.pop(0)

    if cmd == "stages":
        for key, mod in STAGES.items():
            print(f"{key:>4}  learn_path_tracing_tpu.stages.{mod}")
        return 0

    if cmd == "render":
        if argv and argv[0] == "--stage":
            argv.pop(0)
            stage = argv.pop(0)
        elif argv:
            stage = argv.pop(0)
        else:
            print("usage: render --stage <1..10|l11..l15> [stage args]")
            return 2
        mod_name = STAGES.get(str(stage))
        if mod_name is None:
            print(f"unknown stage {stage!r}; see 'stages'")
            return 2
        sys.argv = [f"stage {stage}"] + argv
        mod = importlib.import_module(
            f"learn_path_tracing_tpu.stages.{mod_name}")
        mod.main()
        return 0

    if cmd == "smoke":
        from .utils.checks import device_smoke_test

        device_smoke_test()
        print("device smoke test passed")
        return 0

    if cmd == "bench":
        import runpy

        sys.argv = ["bench.py"] + argv
        runpy.run_path("bench.py", run_name="__main__")
        return 0

    print(f"unknown command {cmd!r}")
    return 2


if __name__ == "__main__":
    sys.exit(main())
