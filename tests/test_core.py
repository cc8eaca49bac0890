import jax
import jax.numpy as jnp
import numpy as np
import pytest

from animate_anything_tpu.core import (
    AXIS_DATA,
    AXIS_FRAME,
    Config,
    create_mesh,
    load_config,
    merge_dotlist,
    named_sharding,
    shard_batch,
)
from animate_anything_tpu.core.dtypes import cast_floating, half_policy, policy_from_string
from animate_anything_tpu.core.mesh import constrain


def test_config_attr_access_and_nesting():
    cfg = Config({"train_data": {"width": 256, "use_bucketing": True}, "lr": 5e-6})
    assert cfg.train_data.width == 256
    assert cfg["train_data"]["use_bucketing"] is True
    cfg.train_data.width = 512
    assert cfg.to_dict()["train_data"]["width"] == 512


def test_config_dotlist_overrides():
    cfg = Config({"a": {"b": 1}, "flag": False})
    merge_dotlist(cfg, ["a.b=2", "flag=true", "new.deep.key=1e-4", "s=hello"])
    assert cfg.a.b == 2
    assert cfg.flag is True
    assert cfg.new.deep.key == pytest.approx(1e-4)
    assert cfg.s == "hello"


def test_config_yaml_roundtrip(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("train_data:\n  width: 128\nmotion_mask: true\n")
    cfg = load_config(str(p), overrides=["train_data.width=64"])
    assert cfg.train_data.width == 64
    assert cfg.motion_mask is True
    out = tmp_path / "saved.yaml"
    cfg.save(str(out))
    cfg2 = load_config(str(out))
    assert cfg2.to_dict() == cfg.to_dict()


def test_config_save_with_dicts_in_lists(tmp_path):
    """Mappings nested inside lists (e.g. extra_train_data) wrap to Config on
    set and must unwrap again for yaml.safe_dump."""
    from animate_anything_tpu.core.config import Config

    cfg = Config({"extra_train_data": [
        {"dataset_types": ["folder"], "train_data": {"path": "/x"}},
    ]})
    out = tmp_path / "c.yaml"
    cfg.save(str(out))
    cfg2 = load_config(str(out))
    assert cfg2.to_dict() == cfg.to_dict()
    assert cfg2.extra_train_data[0].train_data.path == "/x"


def test_config_merge_deep():
    a = Config({"x": {"y": 1, "z": 2}})
    a.merge({"x": {"y": 10}, "w": 3})
    assert a.x.y == 10 and a.x.z == 2 and a.w == 3


def test_mesh_shapes():
    assert len(jax.devices()) == 8
    mesh = create_mesh({AXIS_DATA: 4, AXIS_FRAME: 2})
    assert mesh.devices.shape == (4, 2)
    mesh2 = create_mesh({AXIS_DATA: -1, AXIS_FRAME: 2})
    assert mesh2.devices.shape == (4, 2)
    # subset meshes are allowed (single-device training on a multi-device host)
    assert create_mesh({AXIS_DATA: 3}).devices.shape == (3,)
    with pytest.raises(ValueError):
        create_mesh({AXIS_DATA: 16})  # more than available


def test_shard_batch_places_on_data_axis():
    mesh = create_mesh({AXIS_DATA: 8})
    batch = {"x": np.ones((16, 4), np.float32), "t": np.arange(16)}
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding == named_sharding(mesh, AXIS_DATA, None)


def test_constrain_inside_jit():
    mesh = create_mesh({AXIS_DATA: 8})

    @jax.jit
    def f(x):
        x = constrain(x, mesh, AXIS_DATA, None)
        return (x * 2).sum()

    x = jnp.ones((8, 3))
    assert f(x) == 48.0


def test_dtype_policy():
    pol = half_policy()
    tree = {"w": jnp.ones((2, 2), jnp.float32), "step": jnp.array(3, jnp.int32)}
    lo = pol.cast_to_compute(tree)
    assert lo["w"].dtype == jnp.bfloat16
    assert lo["step"].dtype == jnp.int32
    hi = pol.cast_to_param(lo)
    assert hi["w"].dtype == jnp.float32
    assert policy_from_string("fp16").compute_dtype == jnp.bfloat16
    assert policy_from_string(None).compute_dtype == jnp.float32
