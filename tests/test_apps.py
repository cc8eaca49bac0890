"""Demo-app controller smoke tests (headless path, tiny models)."""

import numpy as np
import pytest

# full train/eval loops with multi-minute compiles on the 1-core box:
# the whole module lives in the slow tier (run `pytest tests/` for it)
pytestmark = pytest.mark.slow


def test_animate_controller_mask_semantics(tmp_path):
    import app as app_module

    controller = app_module.AnimateController(
        None, {"num_frames": 2, "height": 32, "width": 32},
        output_dir=str(tmp_path), model_size="tiny",
    )
    image = (np.random.default_rng(0).random((40, 40, 3)) * 255).astype(np.uint8)
    # gradio-sketch dict input: mask from the drawing layer's alpha
    layers = np.zeros((40, 40, 4), np.uint8)
    layers[10:20, 10:20, 3] = 128
    path = controller.animate(
        {"background": image, "layers": [layers]},
        motion_scale=4.0, prompt="move", sample_steps=2, cfg_scale=9, seed=1,
    )
    import os

    assert os.path.exists(path) and path.endswith(".gif")
    # empty drawing → everything animates (mask all-255), still works
    path2 = controller.animate(
        {"background": image, "layers": [np.zeros((40, 40, 4), np.uint8)]},
        motion_scale=4.0, prompt="move", sample_steps=2, cfg_scale=9, seed=1,
    )
    assert os.path.exists(path2)
