"""Prompt-to-prompt attention control, sequence alignment, and LaMa
inpainting — the reference's auxiliary tooling (SURVEY §2.1 'orphans' row:
utils/ptp_utils.py, utils/seq_aligner.py, utils/lama.py)."""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from animate_anything_tpu.models.factory import HashTokenizer


# -- seq alignment ------------------------------------------------------------

def test_global_align_identity():
    from animate_anything_tpu.utils.seq_align import aligned_sequences, global_align

    x = [1, 2, 3, 4]
    _, trace = global_align(x, x)
    xs, ys, pairs = aligned_sequences(x, x, trace)
    np.testing.assert_array_equal(pairs[:, 0], pairs[:, 1])


def test_refinement_mapper_marks_new_words():
    from animate_anything_tpu.utils.seq_align import get_refinement_mapper

    tok = HashTokenizer()
    mappers, alphas = get_refinement_mapper(
        ["a cat on a bench", "a fluffy cat on a bench"], tok, max_len=16)
    assert mappers.shape == (1, 16) and alphas.shape == (1, 16)
    # 'fluffy' (token position 2 incl BOS) is new → alpha 0 there
    assert alphas[0, 2] == 0.0
    # matched tokens keep alpha 1 and map to their source positions
    assert alphas[0, 1] == 1.0 and mappers[0, 1] == 1


def test_replacement_mapper_word_swap():
    from animate_anything_tpu.utils.seq_align import get_replacement_mapper

    tok = HashTokenizer()
    m = get_replacement_mapper(["a cat on a bench", "a dog on a bench"], tok, max_len=12)
    assert m.shape == (1, 12, 12)
    # HashTokenizer is 1 token/word → the swap maps diagonally; every source
    # token distributes exactly unit mass
    np.testing.assert_allclose(m[0, 2, 2], 1.0)  # 'cat'→'dog'
    np.testing.assert_allclose(m[0].sum(axis=-1)[:6], np.ones(6))


def test_replacement_mapper_rejects_length_mismatch():
    from animate_anything_tpu.utils.seq_align import get_replacement_mapper_

    with pytest.raises(ValueError, match="word count"):
        get_replacement_mapper_("a cat", "a big cat", HashTokenizer())


# -- attention control --------------------------------------------------------

def test_attention_store_captures_cross_and_self():
    from animate_anything_tpu.models.attention import SpatialTransformer
    from animate_anything_tpu.utils.ptp import AttentionStore, attention_control

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 64))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 32))
    m = SpatialTransformer(2, 32, context_dim=32, dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(2), x, ctx)

    store = AttentionStore()
    with attention_control(store):
        out = m.apply(params, x, ctx)
        store.between_steps()
    avg = {k: v for k, v in store.attention_store.items() if v}
    assert any(k.endswith("_cross") for k in avg), avg.keys()
    assert any(k.endswith("_self") for k in avg)
    cross = [m_ for k, v in avg.items() if k.endswith("_cross") for m_ in v]
    assert cross[0].shape == (2 * 2, 16, 7)  # (b·heads, hw, tokens)
    # softmax rows sum to 1
    np.testing.assert_allclose(cross[0].sum(-1), np.ones((4, 16)), atol=1e-5)


def test_attention_control_can_edit_probs():
    from animate_anything_tpu.models.attention import SpatialTransformer
    from animate_anything_tpu.utils.ptp import AttentionControl, attention_control

    class ZeroLastToken(AttentionControl):
        def forward(self, attn, is_cross, place):
            if is_cross:
                attn = np.asarray(attn).copy()
                attn[..., -1] = 0.0
            return attn

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 64))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 32))
    m = SpatialTransformer(2, 32, context_dim=32, dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(2), x, ctx)
    base = m.apply(params, x, ctx)
    with attention_control(ZeroLastToken()):
        edited = m.apply(params, x, ctx)
    assert float(jnp.abs(base - edited).max()) > 1e-6


def test_alpha_time_words_schedule():
    from animate_anything_tpu.utils.ptp import get_time_words_attention_alpha

    tok = HashTokenizer()
    alpha = get_time_words_attention_alpha(
        ["a cat", "a dog"], 10, {"default_": (0.0, 0.5), "dog": (0.0, 0.8)}, tok, 8)
    assert alpha.shape == (11, 1, 1, 1, 8)
    # default tokens replaced for the first half of the steps only
    assert alpha[2, 0, 0, 0, 1] == 1.0 and alpha[9, 0, 0, 0, 1] == 0.0


# -- LaMa ---------------------------------------------------------------------

def _tiny_cfg():
    from animate_anything_tpu.models.lama import LamaConfig

    return LamaConfig(ngf=8, n_downsampling=2, n_blocks=2, max_features=32)


@pytest.mark.slow
def test_lama_inpaints_masked_region():
    from animate_anything_tpu.models.lama import LargeMaskInpainting, inpaint_video

    model = LargeMaskInpainting(_tiny_cfg())
    img = jnp.ones((1, 32, 32, 3)) * 0.5
    mask = jnp.zeros((1, 32, 32, 1)).at[:, 8:16, 8:16].set(1.0)
    params = model.init(jax.random.PRNGKey(0), img, mask)
    out = model.apply(params, img, mask)
    assert out.shape == img.shape
    # outside the mask the original pixels pass through exactly
    np.testing.assert_allclose(np.asarray(out[:, :4, :4]), 0.5, atol=1e-6)
    # video entry
    vid = (np.random.default_rng(0).random((3, 32, 32, 3)) * 255).astype(np.uint8)
    m8 = np.zeros((32, 32), np.uint8); m8[8:16, 8:16] = 255
    res = inpaint_video(vid, m8, params, model=model, chunk=2)
    assert res.shape == vid.shape and res.dtype == np.uint8
    np.testing.assert_array_equal(res[:, :4, :4], vid[:, :4, :4])


def test_lama_torch_import_parity():
    """Import a randomly initialized torch big-lama (tiny config) through
    import_lama_torch_state and check forward parity vs the torch reference
    implementation loaded from /root/reference (stubbing its unused heavy
    imports)."""
    torch = pytest.importorskip("torch")

    for name in ("torchvision", "torchvision.transforms", "torchvision.transforms.functional"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["torchvision.transforms.functional"].to_tensor = lambda x: x
    sys.modules.setdefault("train", types.ModuleType("train"))
    sys.modules["train"].export_to_video = lambda *a, **k: None
    sys.path.insert(0, "/root/reference")
    try:
        from utils.lama import LargeMaskInpainting as TorchLama
    finally:
        sys.path.pop(0)

    cfg = _tiny_cfg()
    tm = TorchLama(input_nc=cfg.input_nc, output_nc=cfg.output_nc, ngf=cfg.ngf,
                   n_downsampling=cfg.n_downsampling, n_blocks=cfg.n_blocks,
                   max_features=cfg.max_features).eval()
    # randomize running stats so BN import is actually exercised
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.1)
                mod.running_var.uniform_(0.5, 1.5)

    from animate_anything_tpu.models.lama import LargeMaskInpainting, import_lama_torch_state

    params = import_lama_torch_state(
        {k: v.numpy() for k, v in tm.state_dict().items()}, cfg)
    jm = LargeMaskInpainting(cfg)

    rng = np.random.default_rng(0)
    img = rng.random((1, 32, 32, 3), np.float32)
    mask = np.zeros((1, 32, 32, 1), np.float32); mask[:, 8:20, 4:16] = 1.0

    with torch.inference_mode():
        ref = tm(torch.from_numpy(img.transpose(0, 3, 1, 2)),
                 torch.from_numpy(mask.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)
    out = np.asarray(jm.apply(params, jnp.asarray(img), jnp.asarray(mask)))
    np.testing.assert_allclose(out, ref, atol=2e-4)
