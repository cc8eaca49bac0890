"""In-suite tensor-parallel coverage (VERDICT r1 #5): the TP rules in
parallel/partition.py were previously exercised only by the driver's dryrun.

On the 8-device virtual CPU mesh (conftest): mesh {data:2, frame:2, tensor:2},
assert (a) attention/MLP kernels actually LAND tensor-sharded per _TP_RULES,
(b) a ZeRO+TP train step runs to a finite loss, (c) the sharded forward
matches the replicated forward to reduction-order tolerance, and (d) the
sharding check has teeth — with the rules emptied, (a) fails.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from animate_anything_tpu.core import AXIS_DATA, AXIS_FRAME, AXIS_TENSOR, create_mesh
from animate_anything_tpu.core.mesh import shard_batch
from animate_anything_tpu.diffusion import make_schedule
from animate_anything_tpu.models import UNet3DConditionModel, UNet3DConfig
from animate_anything_tpu.parallel import infer_state_shardings
from animate_anything_tpu.parallel import partition
from animate_anything_tpu.train import TrainConfig, create_train_state, make_train_step

pytestmark = pytest.mark.slow


def _nano_unet():
    cfg = UNet3DConfig(
        block_out_channels=(32, 64),
        down_block_types=("CrossAttnDownBlock3D", "DownBlock3D"),
        up_block_types=("UpBlock3D", "CrossAttnUpBlock3D"),
        layers_per_block=1,
        cross_attention_dim=32,
        attention_head_dim=8,
        norm_num_groups=8,
        motion_mask=True,
        motion_strength=True,
    )
    return UNet3DConditionModel(cfg)


def _count_tensor_sharded(sharding_tree):
    leaves = jax.tree_util.tree_leaves(
        sharding_tree, is_leaf=lambda x: hasattr(x, "spec"))
    return sum(1 for s in leaves if AXIS_TENSOR in jax.tree_util.tree_leaves(tuple(s.spec)))


@pytest.fixture(scope="module")
def tp_setup():
    mesh = create_mesh({AXIS_DATA: 2, AXIS_FRAME: 2, AXIS_TENSOR: 2})
    unet = _nano_unet()
    b, f, hw = 2, 4, 2
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(0), (b, f, hw, hw, 4)),
        "mask": jnp.full((b, hw * 8, hw * 8), 255.0),
        "encoder_hidden_states": jax.random.normal(jax.random.PRNGKey(1), (b, 7, 32)),
        "uncond_hidden_states": jnp.zeros((b, 7, 32)),
    }
    params = unet.init(
        jax.random.PRNGKey(2), batch["latents"], jnp.array(1),
        batch["encoder_hidden_states"], batch["latents"][:, :1],
        jnp.ones((b, 1, hw, hw, 1)), jnp.ones((b,)),
    )
    return mesh, unet, params, batch


def test_tp_params_land_sharded(tp_setup):
    mesh, unet, params, _ = tp_setup
    tconf = TrainConfig(motion_mask=True, motion_strength=True, cache_latents=True)
    state = create_train_state(params, tconf)
    shardings = infer_state_shardings(state, mesh, min_shard_size=0)

    n_tp = _count_tensor_sharded(shardings.params)
    # every attention site contributes to_q/k/v/out; both ffs contribute 2 —
    # at least the cross-attn blocks must be covered
    assert n_tp >= 16, f"only {n_tp} tensor-sharded params"

    # the placed arrays really are split: a to_q kernel's addressable shard
    # is half-width on the last dim
    placed = jax.tree_util.tree_map(jax.device_put, state, shardings)
    q = placed.params["params"]["mid_block"]["attentions_0"][
        "transformer_blocks_0"]["attn1"]["to_q"]["kernel"]
    spec = tuple(q.sharding.spec)
    assert AXIS_TENSOR in jax.tree_util.tree_leaves(spec), spec
    shard_shape = q.addressable_shards[0].data.shape
    assert shard_shape[-1] == q.shape[-1] // 2

    # ZeRO: adam moments sharded over data
    n_zero = sum(
        1 for s in jax.tree_util.tree_leaves(
            shardings.opt_state, is_leaf=lambda x: hasattr(x, "spec"))
        if AXIS_DATA in jax.tree_util.tree_leaves(tuple(s.spec)))
    assert n_zero > 0


def test_tp_rules_check_has_teeth(tp_setup, monkeypatch):
    """Emptying _TP_RULES must make the sharded-params assertion fail — the
    positive test above cannot silently pass on replicated params."""
    mesh, unet, params, _ = tp_setup
    monkeypatch.setattr(partition, "_TP_RULES", ())
    tconf = TrainConfig(motion_mask=True, motion_strength=True, cache_latents=True)
    state = create_train_state(params, tconf)
    shardings = infer_state_shardings(state, mesh, min_shard_size=0)
    assert _count_tensor_sharded(shardings.params) == 0


@pytest.mark.slow
def test_tp_train_step_and_forward_parity(tp_setup):
    mesh, unet, params, batch = tp_setup
    tconf = TrainConfig(motion_mask=True, motion_strength=True, cache_latents=True)
    state = create_train_state(params, tconf)
    shardings = infer_state_shardings(state, mesh, min_shard_size=0)
    state_sh = jax.tree_util.tree_map(jax.device_put, state, shardings)
    dev_batch = shard_batch(batch, mesh, AXIS_DATA)

    step_fn = jax.jit(make_train_step(unet, make_schedule(), tconf))
    new_state, metrics = step_fn(state_sh, dev_batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    # updated params keep their TP shardings (no silent re-replication)
    q = new_state.params["params"]["mid_block"]["attentions_0"][
        "transformer_blocks_0"]["attn1"]["to_q"]["kernel"]
    assert AXIS_TENSOR in jax.tree_util.tree_leaves(tuple(q.sharding.spec))

    # sharded forward == replicated forward (reduction-order tolerance)
    b, f, hw = 2, 4, 2
    args = (batch["latents"], jnp.array(5), batch["encoder_hidden_states"],
            batch["latents"][:, :1], jnp.ones((b, 1, hw, hw, 1)), jnp.ones((b,)))
    out_rep = jax.jit(unet.apply)(params, *args)
    params_sh = jax.tree_util.tree_map(
        jax.device_put, params,
        jax.tree_util.tree_map_with_path(
            lambda p, v: jax.sharding.NamedSharding(
                mesh, partition.param_partition_spec(p, v, mesh)), params))
    out_sh = jax.jit(unet.apply)(params_sh, *args)
    np.testing.assert_allclose(np.asarray(out_rep), np.asarray(out_sh),
                               atol=2e-4, rtol=2e-4)
