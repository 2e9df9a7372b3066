"""Pallas dense-slab merge backend vs the XLA merge (interpreter mode).

The Pallas backend (ops/pallas_merge.py) rebuilds the photon merge around
cell-sorted slabs and per-tile dense evaluation; this pins it against the
XLA merge_stage, which is itself pinned against a dense all-pairs oracle
(test_merge_stage.py). Runs the kernel in interpreter mode so the check
works on the CPU CI mesh."""

import numpy as np
import jax
import pytest

from smallvcm_tpu.algorithms import vcm
from smallvcm_tpu.ops import pallas_merge as PM
from smallvcm_tpu.ops.pallas_merge import merge_stage_pallas
from smallvcm_tpu.scene.scene import SCENE_CONFIGS, load_cornell_box

from .test_merge_stage import _random_vertices


@pytest.mark.parametrize("ppm", [False, True])
@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_merge_matches_xla(ppm, seed):
    res = 8
    n = res * res
    scene = load_cornell_box((res, res), SCENE_CONFIGS[1])
    misc = vcm.compute_misc(scene, 0, n, 0.05, 0.75, True, True)

    key = jax.random.PRNGKey(seed)
    kq, kp = jax.random.split(key)
    span = float(misc.radius) * 30.0
    queries = _random_vertices(kq, 4, n, 0.0, span, 9)
    light_verts = _random_vertices(kp, 5, n, 0.0, span, 9)

    want, ovf_x, _ = vcm.merge_stage(
        scene, misc, queries, light_verts, num_cells=2 * n,
        pair_cap=64 * n, ppm=ppm, max_path_length=7, min_path_length=0,
        photon_cap=5 * n, query_cap=4 * n, n_paths=n,
    )
    assert int(ovf_x) == 0

    got, ovf_p, stats = merge_stage_pallas(
        scene, misc, queries, light_verts, work_cap=8192, ppm=ppm,
        max_path_length=7, min_path_length=0,
        photon_cap=384, query_cap=256, n_paths=n, interpret=True,
    )
    assert int(ovf_p) == 0
    assert int(stats[0]) > 0
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=3e-5, atol=1e-7
        )


def test_measure_matches_kernel_stats():
    """measure_only returns the exact work demand the kernel run reports."""
    res = 8
    n = res * res
    scene = load_cornell_box((res, res), SCENE_CONFIGS[1])
    misc = vcm.compute_misc(scene, 0, n, 0.05, 0.75, True, True)
    key = jax.random.PRNGKey(3)
    kq, kp = jax.random.split(key)
    span = float(misc.radius) * 20.0
    queries = _random_vertices(kq, 4, n, 0.0, span, 9)
    light_verts = _random_vertices(kp, 5, n, 0.0, span, 9)

    none_out, ovf_m, stats_m = merge_stage_pallas(
        scene, misc, queries, light_verts, work_cap=0, ppm=False,
        max_path_length=7, min_path_length=0,
        photon_cap=384, query_cap=256, n_paths=n, measure_only=True,
    )
    assert none_out is None
    _, ovf_k, stats_k = merge_stage_pallas(
        scene, misc, queries, light_verts, work_cap=8192, ppm=False,
        max_path_length=7, min_path_length=0,
        photon_cap=384, query_cap=256, n_paths=n, interpret=True,
    )
    assert int(ovf_m) == int(ovf_k) == 0
    assert [int(v) for v in stats_m] == [int(v) for v in stats_k]


def test_driver_split_pallas_path_matches_xla():
    """render() through the split trace/measure/merge driver equals the
    single-executable XLA path (interpreter-mode kernel on CPU)."""
    from smallvcm_tpu import render as R

    res = 24
    scene = load_cornell_box((res, res), SCENE_CONFIGS[0])
    cfg_x = R.RenderConfig(
        algorithm="vcm", iterations=2, resolution=(res, res),
        merge_backend="xla",
    )
    img_x, _, _ = R.render(scene, cfg_x)
    cfg_p = R.RenderConfig(
        algorithm="vcm", iterations=2, resolution=(res, res),
        merge_backend="pallas_interpret",
    )
    img_p, _, _ = R.render(scene, cfg_p)
    assert cfg_p.merge_caps_frozen
    np.testing.assert_allclose(
        np.asarray(img_p), np.asarray(img_x), rtol=3e-5, atol=1e-6
    )


def test_pallas_merge_compaction_overflow_reported():
    """Per-tile slab work is unbounded by design (no work cap), but the
    photon/query compaction caps still report overflow so the driver can
    grow them and retry."""
    res = 8
    n = res * res
    scene = load_cornell_box((res, res), SCENE_CONFIGS[1])
    misc = vcm.compute_misc(scene, 0, n, 0.05, 0.75, True, True)
    key = jax.random.PRNGKey(2)
    kq, kp = jax.random.split(key)
    span = float(misc.radius) * 4.0
    queries = _random_vertices(kq, 4, n, 0.0, span, 9)
    light_verts = _random_vertices(kp, 5, n, 0.0, span, 9)
    _, overflow, stats = merge_stage_pallas(
        scene, misc, queries, light_verts, work_cap=0, ppm=False,
        max_path_length=9, min_path_length=0,
        photon_cap=PM.SLAB, query_cap=PM.QTILE, n_paths=n,
        interpret=True,
    )
    assert int(overflow) > 0
    assert int(stats[0]) > 0
