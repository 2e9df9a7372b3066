"""--report mode: all 4 scenes x 7 algorithms -> BMPs + index.html.

Mirrors FullReport (smallvcm.cxx:156-263): renders every combination,
saves gamma-2.2 BMPs with the reference's default filenames, emits the
thumbnail matrix with the good/poor border colors and the 4-way
PPM/BPM/BPT/VCM split per scene.
"""

from __future__ import annotations

import time

from .io.framebuffer import save_bmp
from .io.html import GOOD_ALGORITHMS, GREEN, NONE, POOR_ALGORITHMS, RED, HtmlWriter
from .render import ALGORITHM_NAMES, ALGORITHMS, RenderConfig, render
from .scene.scene import SCENE_CONFIGS, get_scene_name, load_cornell_box


def full_report(args) -> None:
    html = HtmlWriter("index.html")
    split_acronyms = ["PPM", "BPM", "BPT", "VCM"]

    start = time.time()
    for scene_id, scene_config in enumerate(SCENE_CONFIGS):
        resolution = tuple(args.resolution)
        scene = load_cornell_box(resolution, scene_config)
        scene_name, _ = get_scene_name(scene_config)
        html.add_scene(scene_name)
        print(f"Scene: {scene_name}")

        split_files = ["", "", "", ""]
        split_borders = [NONE] * 4

        # Merge caps are scene/resolution properties, not algorithm
        # properties: carry the sized caps from one merging algorithm to
        # the next so only the first pays the sizing recompiles (the
        # ladder still grows them if an algorithm needs more).
        sized_caps = {}

        for alg in ALGORITHMS:
            cfg = RenderConfig(
                algorithm=alg,
                iterations=args.iterations,
                max_time=args.max_time,
                resolution=resolution,
                base_seed=args.seed,
                max_path_length=args.max_path_length,
                min_path_length=args.min_path_length,
                radius_factor=args.radius_factor,
                radius_alpha=args.radius_alpha,
                # The report renders several merging algorithms in one
                # process; the pallas backend holds at most one Mosaic
                # kernel shape per process (see render.py), so pin the
                # portable XLA merge here.
                merge_backend="xla",
                **sized_caps,
            )
            print(f"Running {ALGORITHM_NAMES[alg]}... ", end="", flush=True)
            img, elapsed, iters = render(scene, cfg)
            print(f"done in {elapsed:.2f} s")
            if alg in ("ppm", "bpm", "vcm"):
                sized_caps = dict(
                    pair_factor=max(cfg.pair_factor,
                                    sized_caps.get("pair_factor", 0.0)),
                    photon_factor=max(cfg.photon_factor,
                                      sized_caps.get("photon_factor", 0.0)),
                    query_factor=max(cfg.query_factor,
                                     sized_caps.get("query_factor", 0.0)),
                )

            from .cli import build_default_filename

            filename = build_default_filename(scene_config, alg)
            save_bmp(img, filename, gamma=2.2)

            border = NONE
            if alg in POOR_ALGORITHMS[scene_id]:
                border = RED
            if alg in GOOD_ALGORITHMS[scene_id]:
                border = GREEN

            html.add_rendering(
                ALGORITHM_NAMES[alg], filename, elapsed, border,
                f"<br/>Iterations: {iters}",
            )

            if alg in ("ppm", "bpm", "bpt", "vcm"):
                idx = ("ppm", "bpm", "bpt", "vcm").index(alg)
                split_files[idx] = filename
                split_borders[idx] = border

        html.add_four_way_split(
            split_files, split_acronyms, split_borders, resolution[0]
        )

    html.close()
    print(f"Whole run took {time.time() - start:.2f} s")
