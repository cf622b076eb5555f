"""Optimizers and LR schedules."""

from physicsbasedfwi2_tpu.optim.schedules import make_scheduler
from physicsbasedfwi2_tpu.optim.lbfgs import lbfgs_wolfe, LbfgsState
from physicsbasedfwi2_tpu.optim.sgmcmc import sgld, sghmc

__all__ = ["make_scheduler", "lbfgs_wolfe", "LbfgsState", "sgld", "sghmc"]
