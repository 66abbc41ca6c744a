"""Chain checkpointing: emcee-compatible HDF5 + JSON manifest, with resume.

The reference persists chains through emcee's ``HDFBackend`` and decorates
the file with ``param_names``/``burn``/``thin`` attrs
(/root/reference/joxsz_main.py:196-211, joxsz_funcs.py:637-650; SURVEY.md
§5.4 notes the reference writes but never resumes).  Here:

  * ``save_chain_hdf5`` writes the same layout emcee v3 uses (group
    'mcmc', datasets chain/log_prob/accepted, iteration attr) so any
    existing reader of `joxsz_chain.hdf5` keeps working, including the
    reference's own attr conventions;
  * ``save_state`` / ``load_state`` provide an .npz resume point (final
    walker positions + PRNG key + config hash) — an actual resume
    capability the reference lacks.
"""

from __future__ import annotations

import json
import pathlib

import numpy as np


def save_chain_hdf5(
    path: str,
    chain: np.ndarray,          # (n_saved, n_walkers, ndim)
    log_prob: np.ndarray,       # (n_saved, n_walkers)
    acceptance: np.ndarray,     # (n_walkers,)
    param_names: list[str],
    nburn: int,
    nthin: int,
    frame_spacing: float | None = None,
):
    """``frame_spacing``: raw sampler steps per saved frame — equals
    ``nthin`` for every regular sampler, but the hybrid coupled sampler
    records frames only inside its local windows so its effective
    spacing is ``nthin * sync_every / (sync_every - 1)`` (see
    ``parallel.kernel_sharded.run_hybrid_coupled_ensemble``).  Always
    written so downstream saved-frame -> raw-step conversions
    (tau, split-R-hat lengths) are self-correcting rather than
    convention-dependent."""
    import h5py

    with h5py.File(path, "w") as f:
        g = f.create_group("mcmc")
        g.attrs["version"] = 3
        g.attrs["nwalkers"] = chain.shape[1]
        g.attrs["ndim"] = chain.shape[2]
        g.attrs["has_blobs"] = False
        g.attrs["iteration"] = chain.shape[0]
        g.create_dataset("chain", data=chain, compression="gzip",
                         compression_opts=4)
        g.create_dataset("log_prob", data=log_prob, compression="gzip",
                         compression_opts=4)
        g.create_dataset("accepted", data=acceptance * chain.shape[0])
        # reference-compatible metadata (joxsz_funcs.py:637-650)
        g.attrs["param_names"] = np.array(
            [n.encode("utf-8") for n in param_names])
        g.attrs["burn"] = nburn
        g.attrs["thin"] = nthin
        g.attrs["frame_spacing"] = float(
            nthin if frame_spacing is None else frame_spacing)


def load_chain_hdf5(path: str):
    import h5py

    with h5py.File(path, "r") as f:
        g = f["mcmc"]
        return {
            "chain": np.asarray(g["chain"]),
            "log_prob": np.asarray(g["log_prob"]),
            "param_names": [n.decode() for n in g.attrs["param_names"]],
            "burn": int(g.attrs["burn"]),
            "thin": int(g.attrs["thin"]),
            # older files predate the attr: their frames are exactly
            # 'thin' steps apart
            "frame_spacing": float(g.attrs.get("frame_spacing",
                                               g.attrs["thin"])),
        }


def save_state(path: str, positions: np.ndarray, log_probs: np.ndarray,
               key_data: np.ndarray, meta: dict,
               temper_state: np.ndarray | None = None):
    """``temper_state``: the full (K, W, D) replica-ladder state of a
    tempered run, so a ``--temper`` resume continues the equilibrated
    ladder instead of re-replicating the cold rung."""
    pathlib.Path(path).parent.mkdir(parents=True, exist_ok=True)
    extra = {} if temper_state is None else {"temper_state": temper_state}
    np.savez_compressed(
        path, positions=positions, log_probs=log_probs, key=key_data,
        meta=np.bytes_(json.dumps(meta).encode()), **extra,
    )


def load_state(path: str):
    d = np.load(path)
    out = {
        "positions": d["positions"],
        "log_probs": d["log_probs"],
        "key": d["key"],
        "meta": json.loads(bytes(d["meta"]).decode()),
    }
    if "temper_state" in d.files:
        out["temper_state"] = d["temper_state"]
    return out
