"""Example: fitting with a custom pressure component.

Any object exposing ``default_params() -> ParamSet``, ``__call__(pars,
r_kpc)`` and (optionally) ``derivative(pars, r_kpc)`` plugs into the
framework — here a simple beta-model pressure profile, fit SZ-only.
"""

import pathlib
import sys
from collections import OrderedDict

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from joxsz_tpu.config import JoXSZConfig
from joxsz_tpu.build import build_session
from joxsz_tpu.models import JointModel, Param, ParamSet, gaussian_param
from joxsz_tpu.models.density import VikhlininDensity
from joxsz_tpu.models.temperature import UPPTemperature
from joxsz_tpu.sampling import run_fit


class BetaPressure:
    """P(r) = P0 (1 + (r/rc)^2)^(-3 beta / 2)."""

    name = "p"

    def default_params(self) -> ParamSet:
        return ParamSet(OrderedDict([
            ("P_0", Param(0.2, 0.0, 2.0, unit="keV.cm^{-3}")),
            ("r_{c,P}", Param(300.0, 20.0, 2000.0, unit="kpc")),
            (r"\beta_P", Param(1.0, 0.1, 4.0)),
        ]))

    def __call__(self, pars, r_kpc):
        x = jnp.asarray(r_kpc) / pars["r_{c,P}"]
        return pars["P_0"] * (1.0 + x * x) ** (-1.5 * pars[r"\beta_P"])

    def derivative(self, pars, r_kpc):
        f = lambda r: self(pars, r)
        return jax.vmap(jax.grad(f))(jnp.atleast_1d(jnp.asarray(r_kpc)))


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force the local CPU backend (the interpreter "
                         "boot may override JAX_PLATFORMS)")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny schedule for CI (posterior meaningless)")
    args = ap.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if jax.default_backend() == "cpu":
        jax.config.update("jax_enable_x64", True)
    cfg = JoXSZConfig.cl1226()
    sess = build_session(cfg, sz_only=True)

    pressure = BetaPressure()
    density = VikhlininDensity()
    temperature = UPPTemperature(pressure, density)

    pars = density.default_params()
    pars.update(pressure.default_params())
    pars.update(OrderedDict([("calibration",
                              gaussian_param(1.0, 1.0, 0.07))]))
    pars.freeze(r"\alpha", 0.0)
    pars.freeze(r"\gamma", 3.0)

    model = JointModel(pressure=pressure, density=density,
                       temperature=temperature, params=pars,
                       sz_data=sess.model.sz_data,
                       exclude_unphysical_mass=False)

    sched = (dict(nwalkers=30, nburn=40, nsteps=60, nthin=2,
                  prelim_iterations=20, max_prelim_rounds=1)
             if args.smoke else
             dict(nwalkers=30, nburn=300, nsteps=600, nthin=5,
                  prelim_iterations=200, max_prelim_rounds=2))
    res = run_fit(model.log_like, pars.thawed_values(), pars.lo, pars.hi,
                  pars.thawed, seed=0, **sched)
    res.print_summary([pars[n].unit for n in pars.thawed])


if __name__ == "__main__":
    main()
