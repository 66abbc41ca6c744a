"""Multi-process (multi-host) survey demo + correctness check.

Launches N worker processes (each with K virtual CPU devices, gloo
collectives) forming ONE jax.distributed job, fits a C-cluster survey
sharded over the global 'cluster' mesh axis (parallel.multihost), then
runs the IDENTICAL program in a single process over the same mesh size
and asserts the posteriors agree — the partitioned per-device programs
are the same, so the multi-process run must reproduce the single-process
one (bit-exactness is reported; the pass criterion is allclose).

This is the executable version of SURVEY.md §5.8's multi-host row
("batch multi-cluster fits over DCN ... only control-plane sync"): no
chain data crosses processes — each worker reports only its own cluster
block, and the launcher verifies the assembled survey.

Modes:
  (launcher, default)  spawn workers + single-process reference, verify
  --worker I           join the job as process I
  --single             the single-process reference run

Models:
  --model toy    anisotropic Gaussian per-cluster posterior (fast; used
                 by tests/test_multihost.py)
  --model joint  the real CL J1226-derived mock survey through the joint
                 SZ+X-ray likelihood (XLA path; --kernel adds the fused
                 cluster-grid Pallas kernel step in interpret mode)

Usage: python scripts/multihost_survey_demo.py [--nprocs 2]
           [--devices-per-proc 2] [--model toy|joint] [--kernel]
           [--steps 40] [--out results/multihost_demo.json]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import socket
import subprocess
import sys
import tempfile

REPO = pathlib.Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--devices-per-proc", type=int, default=2)
    ap.add_argument("--clusters", type=int, default=4)
    ap.add_argument("--walkers", type=int, default=16)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--model", choices=("toy", "joint"), default="toy")
    ap.add_argument("--kernel", action="store_true",
                    help="also run the fused cluster-grid kernel step "
                         "(interpret mode; implies --model joint)")
    ap.add_argument("--ensemble", action="store_true",
                    help="validate the SINGLE-ensemble multi-chip "
                         "samplers instead of the survey path: "
                         "run_coupled_sharded_ensemble + "
                         "run_hybrid_coupled_ensemble over a 'walker' "
                         "mesh (interpret-mode kernels), multi-process "
                         "vs single-process bit-match (VERDICT r4 #4)")
    ap.add_argument("--data-dir", default="/root/reference/data")
    ap.add_argument("--out", default=str(REPO / "results" /
                                         "multihost_demo.json"))
    # internal roles
    ap.add_argument("--worker", type=int, default=None, help=argparse.SUPPRESS)
    ap.add_argument("--single", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--coordinator", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--result", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args(argv)
    if args.kernel:
        args.model = "joint"
    return args


# ---------------------------------------------------------------- model


def build_problem(args):
    """Deterministic survey problem, identical in every process."""
    import numpy as np

    C, W = args.clusters, args.walkers
    if args.model == "toy":
        import jax
        import jax.numpy as jnp

        D = 3
        mu = np.linspace(-1.0, 1.0, C)[:, None] * np.arange(1, D + 1)
        sig = np.array([0.5, 1.0, 2.0])

        def one(x, m):
            return -0.5 * jnp.sum(((x - m) / jnp.asarray(sig)) ** 2)

        ll = jax.jit(jax.vmap(jax.vmap(one, in_axes=(0, None)),
                              in_axes=(0, 0)))
        # np constants embed as program literals (no committed device
        # placement — required for the multi-process SPMD program)
        mu_f = mu.astype(np.float32)

        def batched(x):
            return ll(x, jnp.asarray(mu_f))
        rng = np.random.default_rng(11)
        p0 = mu[:, None, :] + 0.1 * rng.standard_normal((C, W, D))
        return dict(log_like=batched, p0=p0.astype(np.float32), sess=None,
                    stacks=None)

    from joxsz_tpu.build import build_session
    from joxsz_tpu.config import JoXSZConfig
    from joxsz_tpu.models.multicluster import make_multicluster_log_like
    from joxsz_tpu.simulate import simulate_survey
    import jax

    cfg = JoXSZConfig.cl1226(args.data_dir)
    cfg.dtype = "float32"
    sess = build_session(cfg)
    D = len(sess.params.thawed)
    theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
    truths = np.tile(theta0, (C, 1))
    truths[:, list(sess.params.thawed).index("P_0")] *= np.linspace(
        0.85, 1.15, C)
    survey = simulate_survey(sess.model, truths, np.random.default_rng(6))
    batched = jax.jit(make_multicluster_log_like(
        sess.model, survey.sz_stack, survey.xray_stack))
    rng = np.random.default_rng(11)
    p0 = truths[:, None, :] * (
        1.0 + 0.01 * rng.standard_normal((C, W, D))).astype(np.float32)
    return dict(log_like=batched, p0=p0.astype(np.float32), sess=sess,
                stacks=(survey.sz_stack, survey.xray_stack))


def run_problem(args, mesh):
    """The run every process executes (SPMD over the global mesh)."""
    import numpy as np
    import jax
    from joxsz_tpu.parallel.multihost import (
        run_multihost_multi_cluster, make_multihost_multicluster_step,
        local_block)

    prob = build_problem(args)
    out = run_multihost_multi_cluster(
        prob["log_like"], prob["p0"], n_steps=args.steps,
        key=jax.random.PRNGKey(5), mesh=mesh, thin=args.steps)
    result = {
        "cluster_range": list(out["cluster_range"]),
        "log_prob": out["log_prob"].tolist(),
        "positions": out["positions"].tolist(),
        "acceptance_mean": float(out["acceptance_fraction"].mean()),
    }

    if args.kernel:
        sz_stack, xr_stack = prob["stacks"]
        sess = prob["sess"]
        step = make_multihost_multicluster_step(
            sess, sz_stack, xr_stack, mesh, n_inner=4,
            n_walkers=args.walkers, interpret=True)
        if step is None:
            raise SystemExit("kernel path unavailable for this family")
        C, W, _ = prob["p0"].shape
        lp0 = np.asarray(prob["log_like"](prob["p0"]), dtype=np.float32)
        seeds = np.arange(mesh.shape["cluster"], dtype=np.int32)
        x, lp, acc = step(prob["p0"], lp0,
                          np.zeros((C, W), np.float32), seeds)
        c0, c1, lp_loc = local_block(lp)
        _, _, x_loc = local_block(x)
        result["kernel"] = {
            "cluster_range": [c0, c1],
            "log_prob": lp_loc.tolist(),
            "positions": x_loc.tolist(),
        }
    return result


def run_ensemble_problem(args, mesh):
    """The coupled + hybrid single-ensemble samplers over a 'walker'
    mesh (VERDICT r4 #4): every process executes the same host loop;
    under multi-process each returns only its local walker block +
    global walker indices (chains never cross hosts)."""
    import numpy as np
    from joxsz_tpu.build import build_session
    from joxsz_tpu.config import JoXSZConfig
    from joxsz_tpu.parallel.kernel_sharded import (
        run_coupled_sharded_ensemble, run_hybrid_coupled_ensemble)

    cfg = JoXSZConfig.cl1226(args.data_dir)
    cfg.dtype = "float32"
    sess = build_session(cfg)
    D = len(sess.params.thawed)
    W = args.walkers
    theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
    rng = np.random.default_rng(11)
    p0 = (theta0[None] * (1 + 0.01 * rng.standard_normal((W, D)))
          ).astype(np.float32)

    def pack(res, W):
        d = {
            "chain": res.chain.tolist(),
            "log_prob": res.log_prob.tolist(),
            "acceptance": np.asarray(res.acceptance_fraction).tolist(),
            "walker_indices": (
                list(range(W)) if res.walker_indices is None
                else np.asarray(res.walker_indices).tolist()),
        }
        return d

    res_c = run_coupled_sharded_ensemble(
        sess, p0, n_steps=args.steps, seed=7, mesh=mesh, thin=2,
        interpret=True)
    if res_c is None:
        raise SystemExit("coupled kernel path unavailable")
    res_h = run_hybrid_coupled_ensemble(
        sess, p0, n_windows=2, sync_every=5, seed=9, mesh=mesh, thin=2,
        interpret=True, allow_small=True)
    if res_h is None:
        raise SystemExit("hybrid kernel path unavailable")
    return {"coupled": pack(res_c, W), "hybrid": pack(res_h, W)}


# ---------------------------------------------------------------- roles


def main_worker(args):
    from joxsz_tpu.parallel.multihost import initialize, global_mesh

    info = initialize(args.coordinator, args.nprocs, args.worker,
                      cpu_devices=args.devices_per_proc)
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    axis = "walker" if args.ensemble else "cluster"
    mesh = global_mesh(axis_names=(axis,))
    result = (run_ensemble_problem(args, mesh) if args.ensemble
              else run_problem(args, mesh))
    result["process_id"] = info.process_id
    result["local_devices"] = info.local_devices
    result["global_devices"] = info.global_devices
    pathlib.Path(args.result).write_text(json.dumps(result))
    span = (result["coupled"]["walker_indices"] if args.ensemble
            else result["cluster_range"])
    print(f"worker {info.process_id}: "
          f"{'walkers' if args.ensemble else 'clusters'} "
          f"{span if not args.ensemble else [span[0], span[-1]]} done",
          flush=True)


def main_single(args):
    n = args.nprocs * args.devices_per_proc
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from joxsz_tpu.parallel import make_mesh
    axis = "walker" if args.ensemble else "cluster"
    mesh = make_mesh(n, axis_names=(axis,))
    result = (run_ensemble_problem(args, mesh) if args.ensemble
              else run_problem(args, mesh))
    pathlib.Path(args.result).write_text(json.dumps(result))
    print("single-process reference done", flush=True)


def _assemble(parts, key, C):
    """Stitch per-worker cluster blocks into the full survey array."""
    import numpy as np

    blocks = {}
    for p in parts:
        src = p if key is None else p[key]
        c0, c1 = src["cluster_range"]
        blocks[c0] = (c1, np.asarray(src["log_prob"]),
                      np.asarray(src["positions"]))
    lp, pos, nxt = [], [], 0
    for c0 in sorted(blocks):
        c1, b_lp, b_pos = blocks[c0]
        if c0 != nxt:
            raise SystemExit(f"cluster coverage gap at {nxt} (got {c0})")
        lp.append(b_lp)
        pos.append(b_pos)
        nxt = c1
    if nxt != C:
        raise SystemExit(f"cluster coverage ends at {nxt}, expected {C}")
    return np.concatenate(lp, axis=0), np.concatenate(pos, axis=0)


def main_launcher(args):
    import numpy as np

    # bind-then-close port probe is racy in principle; a collision makes
    # the coordinator fail to bind and the poll loop below surfaces the
    # worker failures quickly instead of hanging
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    with tempfile.TemporaryDirectory(prefix="joxsz_mh_") as td:
        td = pathlib.Path(td)
        base = [sys.executable, "-u", str(pathlib.Path(__file__).resolve()),
                "--nprocs", str(args.nprocs),
                "--devices-per-proc", str(args.devices_per_proc),
                "--clusters", str(args.clusters),
                "--walkers", str(args.walkers),
                "--steps", str(args.steps),
                "--model", args.model,
                "--data-dir", args.data_dir] + \
               (["--kernel"] if args.kernel else []) + \
               (["--ensemble"] if args.ensemble else [])
        procs = []
        try:
            for i in range(args.nprocs):
                log = open(td / f"worker{i}.log", "w")
                procs.append((subprocess.Popen(
                    base + ["--worker", str(i), "--coordinator", coord,
                            "--result", str(td / f"worker{i}.json")],
                    stdout=log, stderr=subprocess.STDOUT,
                    cwd=str(REPO)), log))
            # poll ALL workers: one crashing early (bad data dir, port
            # collision) must not leave its peers blocked forever on the
            # jax.distributed barrier
            import time

            deadline = time.monotonic() + 600
            fail = False
            live = dict(enumerate(procs))
            while live and not fail:
                for i in list(live):
                    rc = live[i][0].poll()
                    if rc is None:
                        continue
                    del live[i]
                    if rc:
                        fail = True
                        print(f"worker {i} FAILED (rc={rc}):")
                        print((td / f"worker{i}.log").read_text()[-3000:])
                if time.monotonic() > deadline:
                    fail = True
                    print(f"TIMEOUT: workers {sorted(live)} still "
                          f"running after 600s")
                if live and not fail:
                    time.sleep(0.25)
        finally:
            for p, log in procs:
                if p.poll() is None:
                    p.terminate()
                    try:
                        p.wait(timeout=10)
                    except subprocess.TimeoutExpired:
                        p.kill()
                        p.wait()
                log.close()
        if fail:
            raise SystemExit(1)

        rc = subprocess.run(
            base + ["--single", "--result", str(td / "single.json")],
            cwd=str(REPO), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, timeout=900)
        if rc.returncode:
            print(rc.stdout.decode()[-3000:])
            raise SystemExit("single-process reference FAILED")

        workers = [json.loads((td / f"worker{i}.json").read_text())
                   for i in range(args.nprocs)]
        single = json.loads((td / "single.json").read_text())

    report = {
        "nprocs": args.nprocs,
        "devices_per_proc": args.devices_per_proc,
        "global_devices": workers[0]["global_devices"],
        "model": args.model,
        "ensemble": args.ensemble,
        "clusters": args.clusters,
        "walkers": args.walkers,
        "steps": args.steps,
        "per_worker_ranges": [
            (w["coupled"]["walker_indices"] if args.ensemble
             else w["cluster_range"]) for w in workers],
        "checks": {},
    }
    ok = True
    if args.ensemble:
        # single-ensemble samplers: workers hold walker-column blocks;
        # scatter each into the full (n_keep, W, D)/(n_keep, W) arrays
        # and compare against the single-process run (which returns the
        # full ensemble)
        def scatter(parts, name):
            ch = lp = acc = None
            for p in parts:
                src = p[name]
                idx = np.asarray(src["walker_indices"], int)
                c = np.asarray(src["chain"])
                l_ = np.asarray(src["log_prob"])
                a_ = np.asarray(src["acceptance"])
                if ch is None:
                    ch = np.full((c.shape[0], args.walkers, c.shape[2]),
                                 np.nan)
                    lp = np.full((c.shape[0], args.walkers), np.nan)
                    acc = np.full(args.walkers, np.nan)
                ch[:, idx] = c
                lp[:, idx] = l_
                acc[idx] = a_
            if np.isnan(lp).any() or np.isnan(acc).any():
                raise SystemExit(f"{name}: walker coverage incomplete")
            return ch, lp, acc

        for name in ("coupled", "hybrid"):
            mh_ch, mh_lp, mh_acc = scatter(workers, name)
            sp_ch, sp_lp, sp_acc = scatter([single], name)
            dch = float(np.abs(mh_ch - sp_ch).max())
            dlp = float(np.abs(mh_lp - sp_lp).max())
            dacc = float(np.abs(mh_acc - sp_acc).max())
            passed = bool(np.allclose(mh_ch, sp_ch, rtol=1e-5, atol=1e-6)
                          and np.allclose(mh_lp, sp_lp, rtol=1e-5,
                                          atol=1e-5)
                          and dacc == 0.0)
            report["checks"][name] = {
                "max_abs_dchain": dch,
                "max_abs_dlogprob": dlp,
                "max_abs_dacceptance": dacc,
                "bit_exact": bool(dch == 0.0 and dlp == 0.0
                                  and dacc == 0.0),
                "pass": passed,
            }
            ok = ok and passed
        report["pass"] = ok
        out = pathlib.Path(args.out)
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(json.dumps(report, indent=1))
        print(json.dumps(report, indent=1))
        if not ok:
            raise SystemExit(
                "multi-process ensemble run does not match "
                "single-process")
        return

    paths = [("xla", None)] + ([("kernel", "kernel")] if args.kernel else [])
    for name, key in paths:
        mh_lp, mh_pos = _assemble(workers, key, args.clusters)
        sp_lp, sp_pos = _assemble([single], key, args.clusters)
        dlp = float(np.abs(mh_lp - sp_lp).max())
        dpos = float(np.abs(mh_pos - sp_pos).max())
        passed = bool(np.allclose(mh_lp, sp_lp, rtol=1e-5, atol=1e-5)
                      and np.allclose(mh_pos, sp_pos, rtol=1e-5, atol=1e-6))
        report["checks"][name] = {
            "max_abs_dlogprob": dlp,
            "max_abs_dpos": dpos,
            "bit_exact": bool(dlp == 0.0 and dpos == 0.0),
            "pass": passed,
        }
        ok = ok and passed
    report["pass"] = ok

    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1))
    if not ok:
        raise SystemExit("multi-process run does not match single-process")


if __name__ == "__main__":
    a = parse_args()
    if a.worker is not None:
        main_worker(a)
    elif a.single:
        main_single(a)
    else:
        main_launcher(a)
