"""End-to-end fit runner (CLI) — the framework's equivalent of the
reference's ``main()`` (/root/reference/joxsz_main.py:93-246):

  setup -> MLE -> MCMC -> posterior table -> checkpoints -> all six figures.

Usage:
    python -m joxsz_tpu.run                       # bundled CL J1226 config
    python -m joxsz_tpu.run --config my.json      # custom config
    python -m joxsz_tpu.run --sz-only --quick     # SZ-only smoke fit
"""

from __future__ import annotations

import argparse
import json
import pathlib
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description="JoXSZ-TPU joint SZ+X-ray fit")
    ap.add_argument("--config", help="JSON config file (default: bundled "
                    "CL J1226.9+3332)")
    ap.add_argument("--data-dir", default="/root/reference/data")
    ap.add_argument("--sz-only", action="store_true",
                    help="SZ-only fit (the preprofit capability)")
    ap.add_argument("--quick", action="store_true",
                    help="short chains for smoke testing")
    ap.add_argument("--cpu", action="store_true",
                    help="force the local CPU backend")
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--no-plots", action="store_true")
    ap.add_argument("--fresh-mle", action="store_true",
                    help="ignore the MLE disk cache (data/cache/mle_*) "
                         "and re-run the simplex warm start")
    ap.add_argument("--resume", metavar="STATE_NPZ",
                    help="resume sampling from a saved state file")
    ap.add_argument("--move", choices=["stretch", "de", "snooker"],
                    default="stretch",
                    help="ensemble move for the XLA sampler (stretch = "
                    "the reference's emcee default; de/snooker = emcee "
                    "move-zoo analogs, see sampling.stretch)")
    ap.add_argument("--reference-schedule", action="store_true",
                    help="use the reference's sampling schedule (30 "
                    "walkers, plain GW, 2000 burn / 5000 steps, "
                    "joxsz_main.py:42-46) instead of the converged TPU "
                    "default; kept for parity studies — W~30 fits pile "
                    "Z and epsilon at 0 and plain GW does not certify "
                    "convergence on this posterior (docs/PERFORMANCE.md)")
    ap.add_argument("--no-step-kernel", action="store_true",
                    help="keep the converged TPU default schedule but "
                    "sample through the XLA scan path instead of the "
                    "fused Pallas step kernel")
    ap.add_argument("--auto-extend", type=int, default=None, metavar="K",
                    help="after the scheduled steps, keep sampling up to "
                    "K more nsteps-chunks until the chain passes the "
                    "convergence bar (20x worst tau + split-Rhat <= 1.01); "
                    "composes with --temper (rule applied to the cold-rung "
                    "chain, extensions continue the full replica ladder)")
    ap.add_argument("--temper", type=int, default=None, metavar="K",
                    help="parallel-temper the sampling phase with K rungs "
                         "(multimodal posteriors); pass 1 to force a "
                         "plain (untempered) ensemble over the TPU "
                         "default of K=4")
    ap.add_argument("--walkers", type=int, default=None,
                    help="override the walker count (large ensembles are "
                         "effectively free on TPU and stabilise multimodal "
                         "posteriors; see docs/PERFORMANCE.md)")
    ap.add_argument("--mesh", type=int, default=0, metavar="N",
                    help="shard the sampling walkers over an N-device mesh")
    ap.add_argument("--pressure", choices=["gnfw", "knots"], default=None,
                    help="pressure parametrization (default gnfw; "
                         "'knots' = non-parametric log-lerp, config #4)")
    ap.add_argument("--temperature", choices=["upp", "vikhlinin"],
                    default=None,
                    help="temperature model (default upp = T_X derived "
                         "from P/n_e; 'vikhlinin' = parametric profile "
                         "decoupled from pressure, config #4)")
    ap.add_argument("--density", choices=["single", "double"],
                    default=None,
                    help="Vikhlinin density mode (reference mydens "
                         "mode; 'double' adds a second beta-model core "
                         "component)")
    ap.add_argument("--line-systematic", action="store_true",
                    help="thaw the line_scale nuisance (Gaussian "
                         "N(1, 0.25)) scaling the metal-line component "
                         "of the count-rate table — marginalizes the "
                         "fallback spectral model's anchored ~25% line-"
                         "emissivity systematic into the posterior "
                         "(PARITY.md #1) instead of documenting it; "
                         "joint fits only")
    ap.add_argument("--integ", action="store_true",
                    help="enable the integrated-Y Gaussian prior "
                         "(reference calc_integ, joxsz_main.py:65-67)")
    ap.add_argument("--fused", action="store_true",
                    help="use the fused (Pallas on TPU) batched likelihood "
                         "for the sampling phases")
    ap.add_argument("--step-kernel", action="store_true",
                    help="run prelim/burn/sampling through the fused Pallas "
                         "step-loop kernel (whole MCMC steps on-chip; "
                         "TPU only, flagship configuration only)")
    ap.add_argument("--laplace", action="store_true",
                    help="quick-look mode: MAP + autodiff-Hessian error "
                         "bars and Laplace evidence instead of MCMC "
                         "(seconds; run with --cpu for float64 curvature)")
    ap.add_argument("--postprocess", metavar="CHAIN_HDF5",
                    help="skip sampling: recompute the posterior table, "
                         "summary JSON, and all six figures from a saved "
                         "chain (pass the same model-family flags the "
                         "chain was sampled with)")
    ap.add_argument("--ppc", action="store_true",
                    help="posterior-predictive model check: Bayesian "
                         "p-values for the SZ chi^2 and X-ray deviance "
                         "discrepancies (after the fit, or with "
                         "--postprocess); p near 0 or 1 flags misfit")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      str(pathlib.Path(__file__).parents[1] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import numpy as np
    from .config import JoXSZConfig, resolve_mcmc_schedule
    from .build import build_session
    from .sampling import run_fit

    if args.config:
        cfg = JoXSZConfig.from_json(
            pathlib.Path(args.config).read_text())
    else:
        cfg = JoXSZConfig.cl1226(args.data_dir)
    if jax.default_backend() == "cpu":
        cfg.dtype = "float64"
        jax.config.update("jax_enable_x64", True)
    else:
        cfg.dtype = "float32"

    # flagless TPU runs get the measured-converged production schedule;
    # the reference 30-walker plain-GW schedule is a parity study behind
    # --reference-schedule (VERDICT r2 #1; config.resolve_mcmc_schedule)
    cfg.mcmc, converged_default = resolve_mcmc_schedule(
        cfg.mcmc, backend=jax.default_backend(),
        reference_schedule=args.reference_schedule, quick=args.quick,
        from_config=args.config is not None)
    if converged_default and args.move != "stretch":
        # the tempered/kernel paths are stretch-only; a non-stretch move
        # falls back to the plain XLA schedule rather than erroring
        cfg.mcmc.n_temper_rungs = 0
        print(f"note: --move {args.move} is XLA-plain only; dropping the "
              "default K=4 tempering (schedule otherwise unchanged)")
    # apply explicit schedule overrides BEFORE the banner so the log —
    # the primary record of detached TPU runs — states what actually ran
    if args.seed is not None:
        cfg.mcmc.seed = args.seed
    if args.walkers is not None:
        cfg.mcmc.nwalkers = args.walkers
    if args.temper is not None:
        cfg.mcmc.n_temper_rungs = args.temper
    if args.auto_extend is not None:
        cfg.mcmc.auto_extend = args.auto_extend
    if converged_default:
        k = cfg.mcmc.n_temper_rungs
        samp = f"K={k} tempered" if k > 1 else "plain GW"
        ext = (", auto-extend to split-Rhat <= 1.01"
               if cfg.mcmc.auto_extend else "")
        print(f"schedule: converged TPU default — W={cfg.mcmc.nwalkers} "
              f"x {samp}, {cfg.mcmc.nburn} burn + {cfg.mcmc.nsteps} "
              f"steps{ext} (--reference-schedule restores the "
              "reference's 30-walker plain-GW run)")
    elif args.reference_schedule:
        print("WARNING: --reference-schedule is a parity configuration: "
              "at W~30 the Z and epsilon posteriors pile at 0 (ensemble-"
              "size artifact) and plain GW does not certify convergence "
              "on this posterior (docs/PERFORMANCE.md)")
    if args.integ:
        cfg.sz.calc_integ = True
    if args.line_systematic:
        if args.sz_only or cfg.xray is None:
            raise SystemExit("--line-systematic needs the X-ray "
                             "likelihood (joint fits only)")
        cfg.xray.line_systematic = True
    if args.pressure is not None:
        cfg.pressure_model = args.pressure
    if args.temperature is not None:
        cfg.temperature_model = args.temperature
    if args.density is not None:
        cfg.density_mode = args.density

    print(f"backend: {jax.default_backend()}; dtype {cfg.dtype}")
    t0 = time.time()
    sess = build_session(cfg, sz_only=args.sz_only)
    print(f"session built in {time.time()-t0:.1f}s "
          f"(operator {sess.sz_operator.L.shape}, "
          f"{'SZ-only' if args.sz_only else 'joint SZ+X'})")

    if args.laplace:
        return _laplace_quicklook(sess, cfg)
    if args.postprocess:
        return _postprocess_saved_chain(sess, cfg, args.postprocess,
                                        no_plots=args.no_plots,
                                        ppc=args.ppc)

    m = cfg.mcmc
    if args.quick:
        m.nburn, m.nsteps, m.nthin = 200, 400, 5
        prelim, rounds = 100, 2
    else:
        prelim, rounds = m.prelim_iterations, 10

    mesh = None
    if args.mesh:
        from .parallel import make_mesh

        mesh = make_mesh(args.mesh, axis_names=("walker",))
        print(f"sampling sharded over {args.mesh} devices")

    ll_batch = None
    if args.fused:
        import jax as _jax
        from .io.readers import read_conversion_table, read_xy

        conv = read_conversion_table(cfg.sz.conversion_file)
        flux = read_xy(cfg.sz.flux_file, 3)
        use_pallas = _jax.default_backend() != "cpu"
        ll_batch = _jax.jit(sess.model.log_like_batch_fused(
            conv, flux, sess.sz_operator, use_pallas=use_pallas))
        print(f"fused batched likelihood "
              f"({'pallas' if use_pallas else 'jnp'} SZ core)")

    step_sampler = None
    # the fused kernel implements the stretch move only: a non-stretch
    # --move must not engage the default kernel path (run_fit would
    # reject it with advice to drop a flag the user never passed);
    # explicit --step-kernel still errors loudly in run_fit
    want_step_kernel = args.step_kernel or (converged_default
                                            and not args.no_step_kernel
                                            and args.move == "stretch")
    if want_step_kernel:
        if jax.default_backend() == "cpu":
            print("note: --step-kernel needs the TPU hardware PRNG; "
                  "falling back to the XLA sampler on CPU")
        else:
            from .sampling.kernel import make_kernel_sampler

            step_sampler = make_kernel_sampler(sess)
            if step_sampler is None:
                print("note: configuration outside the step-kernel "
                      "specialisation; falling back to the XLA sampler")
            else:
                print("sampling via the fused Pallas step-loop kernel")

    p = sess.params
    save = pathlib.Path(cfg.save_dir)
    # MLE disk cache keyed on the full config (+ model-family flags via
    # the thawed names): the simplex warm start is deterministic in
    # (config, data) and was the largest single block of the flagless
    # wall; the entry self-validates by re-evaluating the likelihood at
    # the cached optimum, so changed data invalidates it physically
    # (sampling.mle.find_mle_cached).  --fresh-mle disables.
    mle_cache = None
    if not args.fresh_mle:
        import dataclasses as _dc
        import hashlib

        # hash only what the (deterministic) MLE depends on: model +
        # data + dtype.  The MCMC schedule, seed, and output paths vary
        # per run and must NOT key the cache — hashing the full config
        # minted a fresh entry per seed (r5 hardware check)
        mle_cfg = _dc.replace(cfg, mcmc=type(cfg.mcmc)(),
                              save_dir=".", plot_dir=".")
        mkey = hashlib.sha256(
            (mle_cfg.to_json() + "|" + ",".join(p.thawed)
             + f"|dtype={cfg.dtype}").encode()).hexdigest()[:16]
        repo = pathlib.Path(__file__).resolve().parents[1]
        mle_cache = str(repo / "data" / "cache" / f"mle_{mkey}.json")
    res = run_fit(
        sess.log_like, p.thawed_values(), p.lo, p.hi, p.thawed,
        nwalkers=m.nwalkers, nburn=m.nburn, nsteps=m.nsteps, nthin=m.nthin,
        seed=m.seed, initspread=m.initspread, prelim_iterations=prelim,
        max_prelim_rounds=rounds,
        chain_path=str(save / f"{cfg.name}_chain.hdf5"),
        state_path=str(save / f"{cfg.name}_state.npz"),
        best_path=str(save / "fit.dat"),
        resume_from=args.resume,
        n_temper_rungs=m.n_temper_rungs,
        mesh=mesh,
        log_like_batch=ll_batch,
        step_sampler=step_sampler,
        move=args.move,
        auto_extend=m.auto_extend,
        mle_cache=mle_cache,
    )
    res.print_summary([p[n].unit for n in p.thawed])
    (save / f"{cfg.name}_timings.json").write_text(
        json.dumps(res.timings, indent=2, default=float))
    _summary_and_figures(sess, cfg, res, no_plots=args.no_plots)
    if args.ppc:
        _ppc_report(sess, cfg, res)
    return res


def _ppc_report(sess, cfg, res, n_draws=400):
    """--ppc: posterior-predictive p-values from the fit's chain."""
    import numpy as np
    from .postproc.ppc import posterior_predictive_pvalues

    flat = res.flat_chain
    rng = np.random.default_rng((cfg.mcmc.seed or 0) + 777)
    idx = (rng.choice(len(flat), n_draws, replace=False)
           if len(flat) > n_draws else np.arange(len(flat)))
    r = posterior_predictive_pvalues(sess.model, flat[idx], rng)

    def _verdict(pv):
        return ("OK" if pv is not None and 0.05 <= pv <= 0.95
                else "MISFIT" if pv is not None else "n/a")

    print(f"posterior-predictive check ({len(idx)} draws):")
    if r.p_sz is not None:
        print(f"  SZ chi^2      p = {r.p_sz:.3f}  [{_verdict(r.p_sz)}]  "
              f"(obs median {np.median(r.sz_obs):.1f}, "
              f"rep median {np.median(r.sz_rep):.1f})")
    if r.p_xray is not None:
        print(f"  X-ray deviance p = {r.p_xray:.3f}  "
              f"[{_verdict(r.p_xray)}]  "
              f"(obs median {np.median(r.xray_obs):.1f}, "
              f"rep median {np.median(r.xray_rep):.1f})")
    print("  (p near 0: data more discrepant than the model can "
          "replicate; near 1: model overfits/overdisperses)")

    out = {
        "n_draws": int(len(idx)),
        "p_sz": r.p_sz,
        "p_xray": r.p_xray,
        "sz_obs_median": (None if r.sz_obs is None
                          else float(np.median(r.sz_obs))),
        "sz_rep_median": (None if r.sz_rep is None
                          else float(np.median(r.sz_rep))),
        "xray_obs_median": (None if r.xray_obs is None
                            else float(np.median(r.xray_obs))),
        "xray_rep_median": (None if r.xray_rep is None
                            else float(np.median(r.xray_rep))),
    }
    path = pathlib.Path(cfg.save_dir) / f"{cfg.name}_ppc.json"
    path.write_text(json.dumps(out, indent=2))
    print(f"written {path}")
    return r


def _summary_and_figures(sess, cfg, res, no_plots=False):
    """Posterior summary JSON + all six figures from a FitResult-shaped
    chain carrier (shared by the fit path and --postprocess)."""
    import pathlib
    import time

    p = sess.params
    save = pathlib.Path(cfg.save_dir)

    from .postproc import summary_dict, save_summary

    save_summary(
        str(save / f"{cfg.name}_summary.json"),
        summary_dict(res.flat_chain, p.thawed,
                     units=[p[n].unit for n in p.thawed], ci=cfg.ci,
                     chain_3d=res.chain))

    if no_plots:
        return

    from .postproc import (
        compute_profiles, compute_mass_profiles, compute_gas_fraction,
        posterior_predictive,
    )
    from .plotting import (
        traceplot, cornerplot, fit_on_data, radial_profiles, mass_plot,
        gas_fraction_plot,
    )

    flat = res.flat_chain
    cube = res.cube_chain()
    plotdir = cfg.plot_dir
    r_pp = sess.geometry.r_press_kpc

    t0 = time.time()
    traceplot(cube, p.thawed, seed=cfg.mcmc.seed, plotdir=plotdir)
    cornerplot(flat, p.thawed, ci=cfg.ci, plotdir=plotdir)

    perc_x, perc_sz = posterior_predictive(sess.model, flat, ci=cfg.ci)
    # draw whenever EITHER probe has predictions: SZ-only fits have
    # perc_x=None but still get the reference's SZ data-vs-model panel
    # (fit_on_data draws each block only when its data exists)
    if ((perc_x is not None and sess.annuli is not None)
            or perc_sz is not None):
        fit_on_data(sess.bands, sess.annuli, sess.model.sz_data,
                    perc_x, perc_sz, ci=cfg.ci,
                    step_arcsec=cfg.step_arcsec, plotdir=plotdir)

    profs = compute_profiles(sess.model, sess.cosmology, r_pp, flat,
                             ci=cfg.ci)
    # UPP: overlay T_X when the log-ratio is fitted; parametric T has
    # t_x == t_sz by construction (no overlay)
    tempx_differs = ("log(T_X/T_{SZ})" in sess.params
                     and not sess.params["log(T_X/T_{SZ})"].frozen)
    radial_profiles(profs, tempx_differs, ci=cfg.ci, plotdir=plotdir)

    mass_bands, r_delta, m_delta = compute_mass_profiles(
        sess.model, sess.cosmology, r_pp, flat, delta=500.0, ci=cfg.ci)
    mass_plot(r_pp, mass_bands, sess.cosmology,
              r_delta=r_delta[:, 0], m_delta=m_delta[:, 0],
              plotdir=plotdir)

    # f_gas came out of the thermo pass (ProfileSet.gas_fraction) —
    # no third full-chain device pass; compute_gas_fraction remains the
    # standalone API
    fgas = (profs.gas_fraction if profs.gas_fraction is not None
            else compute_gas_fraction(sess.model, sess.cosmology, r_pp,
                                      flat, ci=cfg.ci))
    gas_fraction_plot(r_pp, fgas, ci=cfg.ci, plotdir=plotdir)
    print(f"figures written to {plotdir} in {time.time()-t0:.1f}s")


def _postprocess_saved_chain(sess, cfg, chain_path, no_plots=False,
                             ppc=False):
    """--postprocess: rebuild table/summary/figures from a saved chain.

    The reference can only produce figures inside a full ``main()`` run
    (joxsz_plots.py is driven by live sampler state); here any
    emcee-layout chain written by ``run_fit`` can be re-postprocessed
    against a freshly built session, so figure/summary tweaks never
    require re-sampling."""
    import numpy as np
    from .io.checkpoint import load_chain_hdf5
    from .sampling.driver import FitResult

    saved = load_chain_hdf5(chain_path)
    names = list(sess.params.thawed)
    if saved["param_names"] != names:
        raise SystemExit(
            f"chain {chain_path} was sampled with parameters "
            f"{saved['param_names']} but the session thaws {names}; "
            "pass the model-family flags (--pressure/--temperature/"
            "--density/--sz-only) the chain was produced with")
    chain = saved["chain"]
    res = FitResult(
        chain=chain,
        log_prob=saved["log_prob"],
        acceptance_fraction=np.full(chain.shape[1], np.nan),
        mle_theta=chain.reshape(-1, chain.shape[2])[
            np.argmax(saved["log_prob"].reshape(-1))],
        mle_loglike=float(saved["log_prob"].max()),
        param_names=names,
        timings={},
    )
    spacing_note = ""
    if saved["frame_spacing"] != saved["thin"]:
        # hybrid coupled chains: frames are spaced slightly wider than
        # the nominal thin (see io.checkpoint.save_chain_hdf5)
        spacing_note = f", frame_spacing={saved['frame_spacing']:.4g}"
    print(f"postprocessing {chain_path}: {chain.shape[0]} saved steps x "
          f"{chain.shape[1]} walkers (burn={saved['burn']}, "
          f"thin={saved['thin']}{spacing_note})")
    res.print_summary([sess.params[n].unit for n in names])
    _summary_and_figures(sess, cfg, res, no_plots=no_plots)
    if ppc:
        _ppc_report(sess, cfg, res)
    return res


def _laplace_quicklook(sess, cfg):
    """MAP + Hessian error bars without MCMC (--laplace)."""
    import numpy as np
    from .sampling import model_laplace

    t0 = time.time()
    res = model_laplace(sess.model, verbose=True)
    p = sess.params
    kind = ("interior mode" if res.ok and not res.at_boundary.any()
            else "boundary-pinned mode" if res.ok
            else "non-positive-definite curvature (mode on a veto/bound)")
    print(f"Laplace quick-look in {time.time() - t0:.1f}s — {kind}")
    sd_col = res.sd if res.ok else res.sd_conditional
    print(f"{'':>18} | {'MAP':>9} | {'Sd':>8} | {'Unit':>12}")
    print("-" * 57)
    for i, n in enumerate(p.thawed):
        sd = (f"{sd_col[i]:8.3f}" if np.isfinite(sd_col[i]) else "     n/a")
        flag = " *" if res.at_boundary[i] else ""
        print(f"{n:>18} | {res.theta_map[i]:9.3f} | {sd} | "
              f"{p[n].unit:>12}{flag}")
    if res.at_boundary.any():
        print("  (* = MAP pinned at a prior bound; the remaining error "
              "bars are conditional on the pinned values)")
    if np.isfinite(res.log_z_normalized):
        print(f"Laplace log-evidence (normalized prior): "
              f"{res.log_z_normalized:.2f} "
              f"(prior log-norm {res.prior_log_norm:.2f} "
              f"+- {res.prior_log_norm_err:.3f})")
    else:
        print("Laplace evidence undefined at a boundary-pinned mode; "
              "use sampling.model_evidence (stepping-stone ladder)")
    def _j(v):          # strict JSON: non-finite -> null
        v = float(v)
        return v if np.isfinite(v) else None

    out = {
        "ok": res.ok,
        "theta_map": dict(zip(p.thawed, map(_j, res.theta_map))),
        "sd": dict(zip(p.thawed, map(_j, res.sd))),
        "sd_conditional": dict(zip(p.thawed, map(_j, res.sd_conditional))),
        "at_boundary": dict(zip(p.thawed,
                                res.at_boundary.astype(bool).tolist())),
        "eigenvalues_negH": [_j(v) for v in res.eigenvalues],
        "log_post_map": _j(res.log_post_map),
        "log_z": _j(res.log_z),
        "log_z_normalized": _j(res.log_z_normalized),
        "prior_log_norm": _j(res.prior_log_norm),
        "prior_log_norm_err": _j(res.prior_log_norm_err),
    }
    path = pathlib.Path(cfg.save_dir) / f"{cfg.name}_laplace.json"
    path.write_text(json.dumps(out, indent=2, default=float))
    print(f"written {path}")
    return res


if __name__ == "__main__":
    main()
