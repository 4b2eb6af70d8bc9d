"""LR schedule family + config-driven optimizer (reference
hooks/lr_updater.py:10-165 and apis/train.py:218-290 equivalents).
Expected values are hand-computed from the reference formulas."""

import numpy as np
import pytest

from partner_tpu.train.optim import (build_lr_schedule, build_optimizer,
                                     with_warmup)


def _v(sched, step):
    return float(sched(step))


class TestSchedules:
    def test_fixed(self):
        s = build_lr_schedule(dict(type="fixed", lr=0.02), 100)
        assert _v(s, 0) == _v(s, 99) == pytest.approx(0.02)

    def test_step_int_by_epoch(self):
        # gamma^(epoch // step); steps_per_epoch=10, step=2
        s = build_lr_schedule(dict(type="step", lr=1.0, step=2, gamma=0.1),
                              100, steps_per_epoch=10)
        assert _v(s, 0) == pytest.approx(1.0)
        assert _v(s, 19) == pytest.approx(1.0)     # epoch 1
        assert _v(s, 20) == pytest.approx(0.1)     # epoch 2
        assert _v(s, 45) == pytest.approx(0.01)    # epoch 4

    def test_step_list(self):
        s = build_lr_schedule(
            dict(type="step", lr=1.0, step=[3, 6], gamma=0.5),
            100, steps_per_epoch=10)
        assert _v(s, 25) == pytest.approx(1.0)     # epoch 2 < 3
        assert _v(s, 30) == pytest.approx(0.5)     # epoch 3
        assert _v(s, 60) == pytest.approx(0.25)    # epoch 6

    def test_exp(self):
        s = build_lr_schedule(dict(type="exp", lr=1.0, gamma=0.5),
                              100, steps_per_epoch=10)
        assert _v(s, 35) == pytest.approx(0.5 ** 3)

    def test_poly(self):
        # (base - min) * (1 - progress/max)^power + min; 10 epochs
        s = build_lr_schedule(
            dict(type="poly", lr=1.0, power=2.0, min_lr=0.1),
            100, steps_per_epoch=10)
        want = 0.9 * (1 - 5 / 10) ** 2 + 0.1
        assert _v(s, 50) == pytest.approx(want)

    def test_inv(self):
        s = build_lr_schedule(
            dict(type="inv", lr=1.0, gamma=0.1, power=2.0),
            100, steps_per_epoch=10)
        want = (1 + 0.1 * 4) ** -2.0
        assert _v(s, 45) == pytest.approx(want)

    def test_cosine(self):
        s = build_lr_schedule(dict(type="cosine", lr=1.0, target_lr=0.0),
                              100, steps_per_epoch=10)
        assert _v(s, 0) == pytest.approx(1.0)
        assert _v(s, 50) == pytest.approx(0.5, abs=1e-6)  # half-way epoch 5

    def test_warmup_shapes(self):
        base = lambda step: np.float32(1.0)
        lin = with_warmup(base, "linear", 10, warmup_ratio=0.1)
        # k = (1 - t/10) * 0.9; lr = 1 - k
        assert _v(lin, 0) == pytest.approx(0.1)
        assert _v(lin, 5) == pytest.approx(1 - 0.5 * 0.9)
        assert _v(lin, 10) == pytest.approx(1.0)
        const = with_warmup(base, "constant", 10, warmup_ratio=0.3)
        assert _v(const, 3) == pytest.approx(0.3)
        assert _v(const, 10) == pytest.approx(1.0)
        expw = with_warmup(base, "exp", 10, warmup_ratio=0.1)
        assert _v(expw, 5) == pytest.approx(0.1 ** 0.5)

    def test_one_cycle_passthrough(self):
        s = build_lr_schedule(
            dict(type="one_cycle", lr_max=0.003, div_factor=10.0,
                 pct_start=0.4), 100)
        assert _v(s, 0) == pytest.approx(0.0003)
        assert _v(s, 40) == pytest.approx(0.003, rel=1e-3)


class TestBuildOptimizer:
    def _params(self):
        import jax.numpy as jnp

        return {"conv": {"kernel": jnp.ones((3, 3)), "bias": jnp.ones((3,))},
                "norm": {"scale": jnp.ones((4, 4))}}

    def test_wd_mask_excludes_patterns_and_vectors(self):
        import jax
        import jax.numpy as jnp
        import optax

        params = self._params()
        tx = build_optimizer(dict(type="adam", wd=0.5),
                             lambda s: 0.1, grad_clip=1e9,
                             no_wd_patterns=("norm",))
        state = tx.init(params)
        grads = jax.tree_util.tree_map(jnp.zeros_like, params)
        # zero grads isolate the decay term: update = -lr * wd * p only
        # where decay applies (after adam's zero moment -> zero scale)
        updates, _ = tx.update(grads, state, params)
        # kernel (ndim 2, not excluded): decayed
        assert abs(float(updates["conv"]["kernel"][0, 0])) > 0
        # bias (ndim 1): no decay
        assert float(jnp.abs(updates["conv"]["bias"]).max()) == 0
        # norm/scale (ndim 2 but name-excluded): no decay
        assert float(jnp.abs(updates["norm"]["scale"]).max()) == 0

    def test_sgd_and_amsgrad_run(self):
        import jax
        import jax.numpy as jnp

        params = self._params()
        for cfg in (dict(type="sgd", momentum=0.9, wd=0.0),
                    dict(type="amsgrad", wd=0.01)):
            tx = build_optimizer(cfg, lambda s: 0.01)
            state = tx.init(params)
            grads = jax.tree_util.tree_map(
                lambda p: jnp.ones_like(p), params)
            updates, state = tx.update(grads, state, params)
            flat = jax.tree_util.tree_leaves(updates)
            assert all(np.isfinite(np.asarray(u)).all() for u in flat)


class TestOneCycleGoldenParity:
    """Golden parity vs the EXECUTED reference OneCycle scheduler
    (det3d/solver/learning_schedules_fastai.py:77-96 via its FakeOptim)
    for both the LR and the momentum trajectory, including non-integral
    pct_start * total splits and the low_lr/1e4 final target (:88)."""

    @pytest.mark.parametrize("total,lr_max,moms,div,pct", [
        (100, 3e-3, (0.95, 0.85), 10.0, 0.4),
        (937, 1e-3, (0.9, 0.8), 25.0, 0.3),   # non-integral split 281.1
        (50, 3e-4, (0.95, 0.85), 10.0, 0.1),
    ])
    def test_lr_and_momentum_match_reference(self, total, lr_max, moms,
                                             div, pct):
        import sys

        sys.path.insert(0, str(__import__("pathlib").Path(
            __file__).resolve().parent))
        from reference_loader import load_reference_one_cycle

        from partner_tpu.train.optim import (one_cycle_lr,
                                             one_cycle_momentum)

        OneCycle, FakeOptim = load_reference_one_cycle()
        opt = FakeOptim()
        ref = OneCycle(opt, total, lr_max, list(moms), div, pct)
        ours_lr = one_cycle_lr(lr_max, total, div_factor=div, pct_start=pct)
        ours_mom = one_cycle_momentum(moms, total, pct_start=pct)
        for step in range(total):
            ref.step(step)
            np.testing.assert_allclose(
                float(ours_lr(step)), opt.lr, rtol=3e-4, atol=1e-10,
                err_msg=f"lr step {step}")
            np.testing.assert_allclose(
                float(ours_mom(step)), opt.mom, rtol=3e-4, atol=1e-10,
                err_msg=f"mom step {step}")


class TestOneCycleOptimizerGoldenParity:
    """End-to-end training-update parity: the reference's fastai
    OptimWrapper (true_wd Adam, fastai_optim.py:155-171) driven by its
    OneCycle scheduler vs our build_one_cycle_optimizer optax chain, same
    params and grads, several steps. bn_wd=True at both reference call
    sites (torchie/apis/train.py:212, builder.py:103) means EVERY param
    (incl. bias and BN affine) is decayed — the chain now matches."""

    def test_multi_step_updates_match_reference(self):
        import sys

        sys.path.insert(0, str(__import__("pathlib").Path(
            __file__).resolve().parent))
        from functools import partial

        import jax
        import jax.numpy as jnp
        import torch
        from reference_loader import (load_reference_one_cycle,
                                      load_reference_optim_wrapper)

        from partner_tpu.train.optim import build_one_cycle_optimizer

        OptimWrapper = load_reference_optim_wrapper()
        OneCycle, _ = load_reference_one_cycle()

        torch.manual_seed(0)
        lin = torch.nn.Linear(4, 8)
        bn = torch.nn.BatchNorm1d(8)
        groups = [torch.nn.Sequential(lin, bn)]
        total, lr_max, moms, div, pct, wd = 10, 1e-2, [0.95, 0.85], 10.0, 0.4, 0.01
        wrapper = OptimWrapper.create(
            partial(torch.optim.Adam, betas=(0.9, 0.99), amsgrad=False),
            3e-3, groups, wd=wd, true_wd=True, bn_wd=True)
        sched = OneCycle(wrapper, total, lr_max, moms, div, pct)

        # identical starting pytree + per-step grads on both sides.
        # .copy() is load-bearing: on the CPU backend jnp.asarray
        # zero-copy aliases the torch storage, and wrapper.step()'s
        # in-place p.data updates would mutate our "initial" params.
        params = {
            "w": jnp.asarray(lin.weight.detach().numpy().copy()),
            "b": jnp.asarray(lin.bias.detach().numpy().copy()),
            "g": jnp.asarray(bn.weight.detach().numpy().copy()),
            "beta": jnp.asarray(bn.bias.detach().numpy().copy()),
        }
        tx = build_one_cycle_optimizer(
            lr_max=lr_max, total_steps=total, wd=wd, moms=tuple(moms),
            div_factor=div, pct_start=pct)
        opt_state = tx.init(params)

        rng = np.random.RandomState(3)
        tparams = [lin.weight, lin.bias, bn.weight, bn.bias]
        keys = ["w", "b", "g", "beta"]
        for i in range(6):
            grads_np = [rng.randn(*p.shape).astype(np.float32) * 0.1
                        for p in tparams]
            sched.step(i)
            for p, g in zip(tparams, grads_np):
                p.grad = torch.from_numpy(g)
            wrapper.step()
            gtree = {k: jnp.asarray(g) for k, g in zip(keys, grads_np)}
            updates, opt_state = tx.update(gtree, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params,
                                            updates)
        for k, p in zip(keys, tparams):
            np.testing.assert_allclose(
                np.asarray(params[k]), p.detach().numpy(),
                rtol=2e-5, atol=2e-7, err_msg=f"param {k} after 6 steps")
