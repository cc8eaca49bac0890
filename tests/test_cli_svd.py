"""SVD CLI surface tests: eval_file batch eval (reference
train_svd.py:810-826) and extra_train_data dataset assembly
(train_svd.py:561-566) — tiny random-init models, CPU."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from animate_anything_tpu import cli_svd

# full train/eval loops with multi-minute compiles on the 1-core box:
# the whole module lives in the slow tier (run `pytest tests/` for it)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def svd_workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("svd_cli")
    rng = np.random.default_rng(0)
    for sub in ("vids_a", "vids_b"):
        (d / sub).mkdir()
        base = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        frames = []
        for i in range(6):
            fr = base.copy()
            fr[4:12, (2 + 3 * i) : (8 + 3 * i)] = [255, 0, 0]
            frames.append(Image.fromarray(fr))
        frames[0].save(d / sub / "v.gif", save_all=True,
                       append_images=frames[1:], duration=100, loop=0)
    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    Image.fromarray(img).save(d / "ref.png")
    # sidecar motion-mask label (reference convention: <stem>_label.jpg)
    label = np.zeros((64, 64), np.uint8)
    label[:32] = 200
    Image.fromarray(label).save(d / "ref_label.jpg")
    return d


def test_svd_eval_file_batch(svd_workdir, tmp_path):
    """eval_file = JSON [[image, prompt], ...]; `iters` gifs per entry under
    <output_dir>/<image-stem>/<t>.gif (reference naming)."""
    eval_file = tmp_path / "validation_file.json"
    eval_file.write_text(json.dumps([
        [str(svd_workdir / "ref.png"), "a test prompt"],
        ["missing_image.jpg", "fallback goes random"],
    ]))
    out = tmp_path / "out"
    res = cli_svd.main_eval(
        output_dir=str(out),
        model_size="tiny",
        mixed_precision="no",
        motion_mask=True,
        eval_file=str(eval_file),
        iters=2,
        validation_data=dict(width=64, height=64, num_frames=3,
                             num_inference_steps=2, fps=7),
        seed=0,
    )
    assert len(res["sample_paths"]) == 4
    for stem in ("ref", "missing_image"):
        for t in range(2):
            assert os.path.exists(out / stem / f"{t}.gif")
    # the ref entry has a sidecar label → binarized mask saved next to output
    assert os.path.exists(out / "ref" / "0_mask.jpg")
    assert not os.path.exists(out / "missing_image" / "0_mask.jpg")


def test_svd_train_extra_train_data(svd_workdir, tmp_path):
    """extra_train_data groups join the primary dataset for training."""
    out = tmp_path / "out"
    run_dir = cli_svd.main(
        output_dir=str(out),
        model_size="tiny",
        mixed_precision="no",
        motion_mask=True,
        dataset_types=["folder"],
        train_data=dict(path=str(svd_workdir / "vids_a"), width=32, height=32,
                        n_sample_frames=4, motion_threshold=0),
        extra_train_data=[
            dict(dataset_types=["folder"],
                 train_data=dict(path=str(svd_workdir / "vids_b"), width=32,
                                 height=32, n_sample_frames=4,
                                 motion_threshold=0)),
        ],
        extend_dataset=True,
        train_batch_size=1,
        max_train_steps=2,
        checkpointing_steps=2,
        learning_rate=1e-4,
        log_every=1,
        save_pretrained_model=False,
        mesh=dict(data=1),
        seed=0,
    )
    log = os.path.join(run_dir, "train_log.jsonl")
    assert os.path.exists(log)
    lines = [json.loads(l) for l in open(log)]
    assert len(lines) >= 2
    assert all(np.isfinite(l["loss"]) for l in lines)
    assert os.path.isdir(os.path.join(run_dir, "ckpt"))
