"""LR scheduler parity vs torch.optim.lr_scheduler (the reference reflects
any torch scheduler type from config, parse_config.py init_obj; gan zoo
policies at /root/reference/models/gan_networks.py:39-65).

Convention under test: trainers query lr_fn(epoch) at the START of 1-indexed
epoch `epoch`, after epoch-1 scheduler steps — i.e. it must equal the torch
optimizer lr observed before the epoch's step() call."""
import numpy as np
import pytest
import torch

from stinet_tpu.trainers.graph_common import step_lr, PlateauLR
from stinet_tpu.models.gan_networks import get_scheduler

BASE_LR = 0.02


def torch_lr_curve(make_sched, epochs, metrics=None):
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=BASE_LR)
    sched = make_sched(opt)
    lrs = []
    for e in range(epochs):
        lrs.append(opt.param_groups[0]["lr"])
        if metrics is not None:
            sched.step(metrics[e])
        else:
            sched.step()
    return np.asarray(lrs)


def ours_lr_curve(config, epochs, metrics=None):
    fn = step_lr(BASE_LR, config)
    lrs = []
    for e in range(1, epochs + 1):
        lrs.append(fn(e))
        if metrics is not None:
            fn.observe(metrics[e - 1])
    return np.asarray(lrs)


@pytest.mark.parametrize("config,make", [
    ({"type": "StepLR", "args": {"step_size": 4, "gamma": 0.5}},
     lambda o: torch.optim.lr_scheduler.StepLR(o, step_size=4, gamma=0.5)),
    ({"type": "ExponentialLR", "args": {"gamma": 0.9}},
     lambda o: torch.optim.lr_scheduler.ExponentialLR(o, gamma=0.9)),
    ({"type": "CosineAnnealingLR", "args": {"T_max": 10, "eta_min": 1e-4}},
     lambda o: torch.optim.lr_scheduler.CosineAnnealingLR(
         o, T_max=10, eta_min=1e-4)),
    ({"type": "LinearLR",
      "args": {"start_factor": 0.25, "end_factor": 1.0, "total_iters": 6}},
     lambda o: torch.optim.lr_scheduler.LinearLR(
         o, start_factor=0.25, end_factor=1.0, total_iters=6)),
])
def test_stateless_policies_match_torch(config, make):
    want = torch_lr_curve(make, 12)
    got = ours_lr_curve(config, 12)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_plateau_matches_torch():
    # loss improves, plateaus (trips patience), improves, plateaus again
    metrics = [1.0, 0.9, 0.8, 0.8, 0.8, 0.8, 0.8, 0.79, 0.5,
               0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5]
    cfg = {"type": "ReduceLROnPlateau",
           "args": {"mode": "min", "factor": 0.5, "patience": 2,
                    "threshold": 0.01, "cooldown": 1}}
    want = torch_lr_curve(
        lambda o: torch.optim.lr_scheduler.ReduceLROnPlateau(
            o, mode="min", factor=0.5, patience=2, threshold=0.01,
            cooldown=1),
        len(metrics), metrics)
    got = ours_lr_curve(cfg, len(metrics), metrics)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_plateau_max_mode_and_min_lr():
    metrics = [0.1] * 30  # never improves after the first observation
    cfg = {"type": "ReduceLROnPlateau",
           "args": {"mode": "max", "factor": 0.1, "patience": 1,
                    "min_lr": 1e-5}}
    want = torch_lr_curve(
        lambda o: torch.optim.lr_scheduler.ReduceLROnPlateau(
            o, mode="max", factor=0.1, patience=1, min_lr=1e-5),
        len(metrics), metrics)
    got = ours_lr_curve(cfg, len(metrics), metrics)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_gan_plateau_policy_multiplier():
    """gan_networks.get_scheduler('plateau') reproduces the reference's
    ReduceLROnPlateau(mode=min, factor=0.2, threshold=0.01, patience=5)
    as a stateful multiplier."""
    metrics = [1.0] + [1.0] * 8 + [0.2] + [0.2] * 8
    sched = get_scheduler("plateau", {})
    assert isinstance(sched, PlateauLR)
    want = torch_lr_curve(
        lambda o: torch.optim.lr_scheduler.ReduceLROnPlateau(
            o, mode="min", factor=0.2, threshold=0.01, patience=5),
        len(metrics), metrics) / BASE_LR
    got = []
    for e in range(1, len(metrics) + 1):
        got.append(sched(e))
        sched.observe(metrics[e - 1])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)
