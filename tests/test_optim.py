"""Scheduler parity vs the reference's exact stepping cadences."""
import numpy as np

from pointcontrast_tpu.train import optim


def simulate_pretrain_reference(iters: int, gamma: float, freq: int):
    """LR used at each 1-indexed iteration of the reference pretrain loop:
    torch ExponentialLR advanced AFTER the iteration when
    ``curr_iter % freq == 0 or curr_iter == 1`` (ddp_trainer.py:250-260)."""
    lr, out = 1.0, []
    for i in range(1, iters + 1):
        out.append(lr)
        if i % freq == 0 or i == 1:
            lr *= gamma
    return out


def test_exp_lr_pretrain_cadence():
    gamma, freq = 0.99, 10
    ref = simulate_pretrain_reference(35, gamma, freq)
    fac = optim.exp_lr(gamma, freq, stepped=True)
    ours = [float(fac(s)) for s in range(35)]  # optax step s == iteration s+1
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_exp_lr_semseg_is_continuous():
    # solvers.py:40-47 ExpLR: gamma ** (s / step_size), float division
    gamma, size = 0.9, 7
    fac = optim.exp_lr(gamma, size)
    for s in (0, 1, 3, 7, 20):
        np.testing.assert_allclose(float(fac(s)), gamma ** (s / size),
                                   rtol=1e-6)


def test_poly_and_step_lr_formulas():
    fac = optim.poly_lr(100, power=0.9)
    for s in (0, 10, 99):
        np.testing.assert_allclose(
            float(fac(s)), (1 - s / 101) ** 0.9, rtol=1e-6)
    fac = optim.step_lr(30, gamma=0.1)
    assert float(fac(29)) == 1.0
    np.testing.assert_allclose(float(fac(30)), 0.1)
    np.testing.assert_allclose(float(fac(60)), 0.01)


def test_make_scheduler_selects_cadence():
    class NS:
        exp_gamma = 0.99
        exp_step_size = 10
        max_iter = 100

    cont = optim.make_scheduler("explr", NS())
    np.testing.assert_allclose(float(cont(5)), 0.99 ** 0.5, rtol=1e-6)

    NS.pretrain_step_cadence = True
    stepped = optim.make_scheduler("explr", NS())
    np.testing.assert_allclose(float(stepped(5)), 0.99, rtol=1e-6)
