"""Parameter system: named parameters, box/Gaussian priors, flat packing.

TPU-native replacement for mbproj2's ``Param``/``ParamGaussian`` objects and
the ``Fit.thawed``/``updateThawed`` machinery (reference usage:
/root/reference/joxsz_funcs.py:213-246, joxsz_main.py:151-188).

Design: parameter *metadata* (bounds, frozen flags, units, prior kind) lives
in an ordered, immutable ``ParamSet`` built once on the host; the sampler
works on a flat float vector of the thawed values.  ``ParamSet.unpack``
reconstitutes the full name->value mapping (traced scalars for thawed
entries, python floats for frozen ones), and ``log_prior`` evaluates the box
+ Gaussian terms fully vectorised — out-of-box values contribute -inf via
``jnp.where`` so every walker keeps static shapes under vmap/scan.
"""

from __future__ import annotations

import dataclasses
from collections import OrderedDict
from typing import Iterable

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass
class Param:
    """One model parameter. ``prior='box'`` gives a uniform prior inside
    [minval, maxval]; ``prior='gauss'`` adds -0.5((x-mu)/sigma)^2 (optionally
    still bounded if minval/maxval set)."""

    val: float
    minval: float = -1e99
    maxval: float = 1e99
    unit: str = "."
    frozen: bool = False
    prior: str = "box"
    prior_mu: float | None = None
    prior_sigma: float | None = None

    def __repr__(self):
        if self.prior == "gauss":
            return (f"<Param val={self.val:.3g} N(mu={self.prior_mu:.3g}, "
                    f"sigma={self.prior_sigma:.3g}) unit={self.unit} "
                    f"frozen={self.frozen}>")
        return (f"<Param val={self.val:.3g} [{self.minval:.3g}, "
                f"{self.maxval:.3g}] unit={self.unit} frozen={self.frozen}>")


def gaussian_param(val: float, mu: float, sigma: float, unit: str = ".",
                   frozen: bool = False) -> Param:
    return Param(val=val, unit=unit, frozen=frozen, prior="gauss",
                 prior_mu=mu, prior_sigma=sigma)


class ParamSet:
    """Ordered parameter collection with flat-vector views."""

    def __init__(self, params: OrderedDict[str, Param] | Iterable):
        self._params: OrderedDict[str, Param] = OrderedDict(params)
        self._refresh()

    def _refresh(self):
        self.names = list(self._params)
        self.thawed = [n for n, p in self._params.items() if not p.frozen]
        self._thawed_idx = {n: i for i, n in enumerate(self.thawed)}
        th = [self._params[n] for n in self.thawed]
        # map the sentinel wide bounds to inf so casting to float32 on TPU
        # cannot overflow
        def _lo(p):
            v = p.minval if p.minval is not None else -np.inf
            return -np.inf if v <= -1e30 else v

        def _hi(p):
            v = p.maxval if p.maxval is not None else np.inf
            return np.inf if v >= 1e30 else v

        self.lo = np.array([_lo(p) for p in th])
        self.hi = np.array([_hi(p) for p in th])
        self.is_gauss = np.array([p.prior == "gauss" for p in th])
        self.mu = np.array([p.prior_mu if p.prior == "gauss" else 0.0
                            for p in th])
        self.sigma = np.array([p.prior_sigma if p.prior == "gauss" else 1.0
                               for p in th])

    # -- mutation (host-side, pre-jit configuration) -------------------------
    def __getitem__(self, name: str) -> Param:
        return self._params[name]

    def __contains__(self, name: str) -> bool:
        return name in self._params

    def update(self, other) -> "ParamSet":
        src = other._params if isinstance(other, ParamSet) else other
        self._params.update(src)
        self._refresh()
        return self

    def freeze(self, name: str, val: float | None = None):
        if val is not None:
            self._params[name].val = val
        self._params[name].frozen = True
        self._refresh()

    def thaw(self, name: str):
        self._params[name].frozen = False
        self._refresh()

    # -- flat-vector views ----------------------------------------------------
    @property
    def ndim(self) -> int:
        return len(self.thawed)

    def thawed_values(self) -> np.ndarray:
        return np.array([self._params[n].val for n in self.thawed])

    def set_thawed_values(self, theta):
        for n, v in zip(self.thawed, np.asarray(theta)):
            self._params[n].val = float(v)

    def unpack(self, theta) -> dict:
        """Flat thawed vector -> full name->value mapping (traceable)."""
        out = {}
        for name, p in self._params.items():
            if p.frozen:
                out[name] = p.val
            else:
                out[name] = theta[self._thawed_idx[name]]
        return out

    def log_prior(self, theta: jnp.ndarray) -> jnp.ndarray:
        """Box + Gaussian log-prior of a thawed vector; -inf outside any
        box.  Vectorised; safe under vmap."""
        lo = jnp.asarray(self.lo, dtype=theta.dtype)
        hi = jnp.asarray(self.hi, dtype=theta.dtype)
        inside = jnp.all((theta >= lo) & (theta <= hi))
        gauss = jnp.where(
            jnp.asarray(self.is_gauss),
            -0.5 * ((theta - jnp.asarray(self.mu, dtype=theta.dtype))
                    / jnp.asarray(self.sigma, dtype=theta.dtype)) ** 2,
            0.0,
        ).sum()
        return jnp.where(inside, gauss, -jnp.inf)

    def table_rows(self) -> list[tuple[str, float, str, bool]]:
        """(name, value, unit, frozen) rows for summaries."""
        return [(n, p.val, p.unit, p.frozen) for n, p in self._params.items()]

    def __repr__(self):
        rows = "\n  ".join(f"{n}: {p!r}" for n, p in self._params.items())
        return f"ParamSet(\n  {rows}\n)"
