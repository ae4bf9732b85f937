"""Optimizer/scheduler parity vs torch: identical update trajectories for
Adam(eps=1e-4)/SGD-nesterov/AdamW given identical gradient sequences, and
ReduceLROnPlateau / CosineAnnealingLR step-for-step LR parity."""

import jax.numpy as jnp
import numpy as np
import optax
import torch

from multi_task_breast_cancer_tpu.train.optim import (
    CosineAnnealingScheduler,
    PlateauScheduler,
    init_optimizer,
)


def _run_pair(opt_name, torch_opt_fn, lr=1e-3, steps=10, seed=0):
    rng = np.random.default_rng(seed)
    p0 = rng.normal(size=(5, 3)).astype(np.float32)
    grads = [rng.normal(size=(5, 3)).astype(np.float32) for _ in range(steps)]

    # torch
    tp = torch.nn.Parameter(torch.tensor(p0.copy()))
    topt = torch_opt_fn([tp], lr)
    for g in grads:
        topt.zero_grad()
        tp.grad = torch.tensor(g)
        topt.step()

    # ours
    tx = init_optimizer(opt_name, lr)
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]), tp.detach().numpy(),
                               rtol=2e-5, atol=2e-6)


def test_adam_parity():
    _run_pair("Adam", lambda p, lr: torch.optim.Adam(p, lr=lr, eps=1e-4))


def test_sgd_nesterov_parity():
    _run_pair("SGD", lambda p, lr: torch.optim.SGD(p, lr=lr, momentum=0.9,
                                                   nesterov=True))


def test_adamw_parity():
    _run_pair("AdamW", lambda p, lr: torch.optim.AdamW(p, lr=lr))


def test_plateau_scheduler_matches_torch():
    losses = [1.0, 0.9, 0.8, 0.8, 0.8, 0.81, 0.82, 0.79, 0.79, 0.785,
              0.784, 0.784, 0.784, 0.9, 0.9, 0.9, 0.9, 0.9, 0.9, 0.9]
    base_lr = 1e-3

    p = torch.nn.Parameter(torch.zeros(1))
    topt = torch.optim.SGD([p], lr=base_lr)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        topt, mode="min", factor=0.5, patience=3, min_lr=1e-6)

    ours = PlateauScheduler(base_lr=base_lr, factor=0.5, patience=3, min_lr=1e-6)
    for loss in losses:
        tsched.step(loss)
        ours.step(loss)
        assert abs(topt.param_groups[0]["lr"] - ours.lr) < 1e-12, \
            (loss, topt.param_groups[0]["lr"], ours.lr)


def test_cosine_scheduler_matches_torch():
    base_lr, t_max, eta_min = 1e-3, 10, 1e-6
    p = torch.nn.Parameter(torch.zeros(1))
    topt = torch.optim.SGD([p], lr=base_lr)
    tsched = torch.optim.lr_scheduler.CosineAnnealingLR(topt, T_max=t_max,
                                                        eta_min=eta_min)
    ours = CosineAnnealingScheduler(base_lr=base_lr, t_max=t_max, eta_min=eta_min)
    for _ in range(t_max):
        topt.step()
        tsched.step()
        ours.step()
        np.testing.assert_allclose(topt.param_groups[0]["lr"], ours.lr, rtol=1e-9)
