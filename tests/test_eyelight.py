"""End-to-end parity of the eye-light integrator vs the reference binary."""

import numpy as np
import pytest

from smallvcm_tpu.algorithms.eyelight import render_iteration
from smallvcm_tpu.io.framebuffer import load_bmp, save_bmp
from smallvcm_tpu.scene.scene import SCENE_CONFIGS, load_cornell_box

from .conftest import run_reference


@pytest.mark.parametrize("scene_id", [0, 1])
def test_eyelight_matches_reference(reference_binary, tmp_path, scene_id):
    res = 128
    scene = load_cornell_box((res, res), SCENE_CONFIGS[scene_id])
    fb = np.asarray(render_iteration(scene, 0, res, res))
    assert np.isfinite(fb).all()
    save_bmp(fb, str(tmp_path / "mine.bmp"), gamma=2.2)

    # Reference renders 512x512 only via CLI; patch resolution by rendering
    # at default res and downsampling is lossy — instead compare at 512.
    # For CI speed we render 512 reference once and crop-compare stats.
    run_reference(reference_binary, tmp_path, "-s", str(scene_id), "-a", "el",
                  "-i", "1")
    ref_name = [p for p in tmp_path.iterdir() if p.suffix == ".bmp"
                and p.name != "mine.bmp"]
    assert ref_name
    ref = load_bmp(str(ref_name[0]))

    scene512 = load_cornell_box((512, 512), SCENE_CONFIGS[scene_id])
    mine512 = np.asarray(render_iteration(scene512, 0, 512, 512))
    save_bmp(mine512, str(tmp_path / "mine512.bmp"), gamma=2.2)
    mine = load_bmp(str(tmp_path / "mine512.bmp"))

    diff = np.abs(ref - mine)
    # Differences only from sub-pixel jitter at silhouettes (different RNG).
    assert diff.mean() < 0.01
    assert (diff == 0).mean() > 0.5


def test_eyelight_iteration1_is_centered():
    """eyelight.hxx:59-60: iteration 1 uses pixel centers."""
    scene = load_cornell_box((64, 64), SCENE_CONFIGS[0])
    a = np.asarray(render_iteration(scene, 1, 64, 64))
    b = np.asarray(render_iteration(scene, 1, 64, 64))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(render_iteration(scene, 0, 64, 64))
    assert np.abs(a - c).max() > 0
