"""Solver layer: pure jitted MU and batched Newton (SURVEY.md §2 #3-4)."""
from .common import Coupled, Hyper, SolverConfig, make_hyper
from .mu import make_mu_step, run_mu
from .newton import make_newton_step, run_newton

__all__ = ["Coupled", "Hyper", "SolverConfig", "make_hyper",
           "make_mu_step", "run_mu", "make_newton_step", "run_newton"]
