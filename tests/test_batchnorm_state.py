"""True train-time BatchNorm: torch-parity numerics and trainer threading
of the `batch_stats` model state (ref nn.BatchNorm1d semantics, e.g.
tacotron2.py:30 / tacotron.py:37)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from tpu_tts.layers.common import TorchBatchNorm


def _run_torch_bn(x_steps, momentum, eps):
    import torch

    bn = torch.nn.BatchNorm1d(x_steps[0].shape[-1], momentum=momentum, eps=eps)
    bn.train()
    outs = []
    for x in x_steps:
        # torch layout [B, C, T]
        xt = torch.from_numpy(np.transpose(x, (0, 2, 1)))
        outs.append(np.transpose(bn(xt).detach().numpy(), (0, 2, 1)))
    bn.eval()
    x_eval = torch.from_numpy(np.transpose(x_steps[-1], (0, 2, 1)))
    eval_out = np.transpose(bn(x_eval).detach().numpy(), (0, 2, 1))
    return outs, eval_out, bn.running_mean.numpy(), bn.running_var.numpy()


def test_torch_batchnorm_parity():
    rng = np.random.RandomState(0)
    B, T, C = 4, 7, 5
    steps = [rng.randn(B, T, C).astype(np.float32) * (i + 1) + i for i in range(3)]
    for momentum, eps in [(0.1, 1e-5), (0.99, 1e-3)]:
        t_outs, t_eval, t_mean, t_var = _run_torch_bn(steps, momentum, eps)

        bn = TorchBatchNorm(C, eps=eps, momentum=momentum)
        variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(steps[0]), train=True)
        state = {"batch_stats": variables["batch_stats"]}
        for i, x in enumerate(steps):
            y, mutated = bn.apply(
                {"params": variables["params"], **state}, jnp.asarray(x), train=True,
                mutable=["batch_stats"],
            )
            np.testing.assert_allclose(np.asarray(y), t_outs[i], atol=2e-5, rtol=1e-4)
            state = dict(mutated)
        np.testing.assert_allclose(np.asarray(state["batch_stats"]["mean"]), t_mean, atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(state["batch_stats"]["var"]), t_var, atol=1e-4, rtol=1e-4)
        # eval mode uses the running stats
        y_eval = bn.apply({"params": variables["params"], **state}, jnp.asarray(steps[-1]), train=False)
        np.testing.assert_allclose(np.asarray(y_eval), t_eval, atol=2e-5, rtol=1e-4)


class _StatefulToyModel:
    """Minimal state-aware trainer model: one weight, a BN-like running stat."""

    def __init__(self):
        self.config = None
        self.params = None
        self.model_state = {"batch_stats": {"counter": jnp.zeros(())}}

    def init_params(self, rng):
        self.params = {"w": jnp.ones((1,))}
        return self.params

    def num_optimizers(self):
        return 1

    def get_optimizer(self):
        import optax

        return optax.sgd(0.1)

    def loss_fn(self, params, batch, rng, optimizer_idx=0, model_state=None):
        loss = jnp.sum((params["w"] * batch["x"]) ** 2)
        if model_state is None:
            return loss, {"loss": loss}
        new_state = {"batch_stats": {"counter": model_state["batch_stats"]["counter"] + 1}}
        return loss, ({"loss": loss}, new_state)


def test_trainer_threads_model_state(tmp_path):
    from tpu_tts.config.base import Coqpit
    from tpu_tts.train.trainer import Trainer, TrainerArgs
    from dataclasses import dataclass

    @dataclass
    class _Cfg(Coqpit):
        training_seed: int = 1
        dashboard_logger: str = "none"
        epochs: int = 1
        print_step: int = 100
        save_step: int = 0
        lr: float = 0.1

    model = _StatefulToyModel()
    cfg = _Cfg()
    model.config = cfg
    trainer = Trainer(TrainerArgs(), cfg, str(tmp_path), model=model, train_samples=None)
    assert trainer._state_aware
    batch = {"x": np.ones((len(jax.devices()),), np.float32)}
    for _ in range(3):
        trainer.train_step(batch)
    assert int(trainer.model_state["batch_stats"]["counter"]) == 3
    # params trained, state excluded from gradients
    assert not np.allclose(np.asarray(trainer.params["w"]), 1.0)
    # checkpoint round-trip carries model_state
    sd = trainer._state_dict()
    assert "model_state" in sd
    trainer.save_checkpoint()
    import glob

    ckpt = glob.glob(os.path.join(str(tmp_path), "checkpoint_*"))[0]
    trainer2 = Trainer(TrainerArgs(), cfg, str(tmp_path / "r2"), model=_new_toy(cfg))
    trainer2._restore(ckpt, full_state=True)
    assert int(trainer2.model_state["batch_stats"]["counter"]) == 3


def _new_toy(cfg):
    m = _StatefulToyModel()
    m.config = cfg
    return m
