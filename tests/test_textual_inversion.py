import jax
import jax.numpy as jnp
import numpy as np

from animate_anything_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from animate_anything_tpu.models.factory import HashTokenizer
from animate_anything_tpu.models.textual_inversion import (
    TokenizerWithPlaceholders,
    inject_embeddings,
    load_embedding_file,
)


def test_inject_and_tokenize(tmp_path):
    cfg = CLIPTextConfig.tiny()
    model = CLIPTextModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    tok = HashTokenizer(cfg.vocab_size, cfg.max_position_embeddings)

    vec = np.full((1, cfg.hidden_size), 0.25, np.float32)
    from safetensors.numpy import save_file

    p = tmp_path / "emb.safetensors"
    save_file({"<mytok>": vec}, str(p))
    loaded = load_embedding_file(str(p))
    assert loaded["<mytok>"].shape == (1, cfg.hidden_size)

    new_params, wrapped, num_added = inject_embeddings(params, tok, loaded)
    assert num_added == 1
    import dataclasses

    model = CLIPTextModel(dataclasses.replace(cfg, vocab_size=cfg.vocab_size + num_added))
    table = new_params["params"]["token_embedding"]["embedding"]
    assert table.shape[0] == cfg.vocab_size + 1
    np.testing.assert_allclose(table[-1], 0.25)

    ids = wrapped("a <mytok> b", padding="max_length", max_length=16).input_ids
    assert (ids == cfg.vocab_size).any()  # placeholder id spliced in
    out = model.apply(new_params, jnp.asarray(ids))
    assert out.shape == (1, 16, cfg.hidden_size)
    # placeholder changes the encoding vs the plain prompt
    ids_plain = tok("a b", padding="max_length", max_length=16).input_ids
    out_plain = model.apply(new_params, jnp.asarray(ids_plain))
    assert float(jnp.abs(out - out_plain).max()) > 1e-6
