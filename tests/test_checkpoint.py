"""Checkpoint tests: reference filename encoding, strict=False merge, and
round-tripping full train state incl. multi_transform optimizer state."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from xmir_tpu.utils import (
    BestCheckpointPolicy,
    checkpoint_name,
    load_checkpoint,
    merge_params,
    save_checkpoint,
)


class TestNaming:
    def test_reference_encoding(self):
        assert checkpoint_name("covid", "densenet121", 32, False, False, 0,
                               epoch=5, is_best=True) == \
            "covid_densenet121_embed_32_seed_0_best_ckpt.msgpack"
        assert checkpoint_name("nih", "dinov2", None, True, True, 7,
                               epoch=10, is_best=False) == \
            "nih_dinov2_anomaly_randresize_seed_7_epoch_10_ckpt.msgpack"


class TestRoundTrip:
    def test_full_train_state_with_multitransform(self, tmp_path, rng):
        """Regression: multi_transform PartitionState must serialize
        (caught live by the train-CLI drive)."""
        import flax.linen as nn
        from xmir_tpu.train import build_optimizer, create_train_state

        class M(nn.Module):
            @nn.compact
            def __call__(self, x, train=False):
                h = nn.Dense(8, name="backbone_fc")(x)
                return {"embedding": nn.Dense(4, name="fc")(h)}

        model = M()
        x = jnp.asarray(rng.standard_normal((2, 6)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x)
        tx = build_optimizer(variables["params"], lr=1e-3,
                             backbone_prefixes=("backbone_fc",))
        state = create_train_state(model, jax.random.PRNGKey(0), x, tx,
                                   variables=variables)
        p = str(tmp_path / "state.msgpack")
        save_checkpoint(p, {"params": state.params, "opt_state": state.opt_state,
                            "step": state.step}, metadata={"epoch": 1})
        loaded = load_checkpoint(p)
        assert "params" in loaded and "opt_state" in loaded
        merged, missing, unexpected = merge_params(variables["params"],
                                                   loaded["params"])
        assert not missing and not unexpected
        np.testing.assert_allclose(
            np.asarray(merged["fc"]["kernel"]),
            np.asarray(state.params["fc"]["kernel"]),
        )

    def test_strict_false_merge(self, rng):
        target = {"a": {"k": np.zeros((2, 2), np.float32)},
                  "b": {"k": np.zeros((3,), np.float32)}}
        loaded = {"a": {"k": np.ones((2, 2))}, "c": {"k": np.ones(1)}}
        merged, missing, unexpected = merge_params(target, loaded)
        np.testing.assert_array_equal(merged["a"]["k"], np.ones((2, 2)))
        np.testing.assert_array_equal(merged["b"]["k"], np.zeros(3))
        assert any(m.startswith("b") for m in missing) and "c" in unexpected

    def test_shape_mismatch_keeps_target(self):
        target = {"w": np.zeros((2, 2), np.float32)}
        loaded = {"w": np.ones((3, 3))}
        merged, missing, _ = merge_params(target, loaded)
        np.testing.assert_array_equal(merged["w"], np.zeros((2, 2)))
        assert "w" in missing

    def test_state_dict_unwrapping(self, tmp_path):
        save_checkpoint(str(tmp_path / "w.msgpack"),
                        {"state_dict": {"w": np.ones(3)}})
        loaded = load_checkpoint(str(tmp_path / "w.msgpack"))
        assert "w" in loaded


class TestBestPolicy:
    def test_best_and_periodic(self, tmp_path):
        policy = BestCheckpointPolicy(
            str(tmp_path), dict(dataset="covid", model="densenet121",
                                embedding_dim=None, anomaly=False,
                                rand_resize=False, seed=0),
        )
        assert policy.update(2, 50.0, {"w": np.ones(2)}) is not None
        assert policy.update(4, 40.0, {"w": np.ones(2)}) is None  # worse
        assert policy.update(6, 60.0, {"w": np.ones(2)}) is not None
        assert policy.best_epoch == 6
        # periodic save at epoch 10 even when not best
        policy.update(10, 10.0, {"w": np.ones(2)})
        assert (tmp_path / "covid_densenet121_seed_0_epoch_10_ckpt.msgpack").exists()
