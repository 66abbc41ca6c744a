"""Hardware smoke of the auto-routed hybrid path through run_fit:
W=32 on a 1-device mesh (< 64/device) with a schedule long enough to
amortise windows -> KernelSampler.run_sharded must route to
run_hybrid_coupled_ensemble and the fit must complete end-to-end."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
t0 = time.time()
from joxsz_tpu.config import JoXSZConfig
from joxsz_tpu.build import build_session
from joxsz_tpu.sampling.kernel import make_kernel_sampler
from joxsz_tpu.sampling.driver import run_fit
from joxsz_tpu.parallel import make_mesh
import numpy as np

print(f"[{time.time()-t0:.0f}s] backend {jax.default_backend()}", flush=True)
cfg = JoXSZConfig.cl1226()
sess = build_session(cfg)
p = sess.params
ks = make_kernel_sampler(sess)
mesh = make_mesh(1, axis_names=("walker",))
res = run_fit(sess.log_like, np.asarray(p.thawed_values(), float),
              p.lo, p.hi, p.thawed, nwalkers=32, nburn=200, nsteps=1000,
              nthin=5, seed=7, prelim_iterations=100, max_prelim_rounds=2,
              step_sampler=ks, mesh=mesh, verbose=True)
n_frames = res.chain.shape[0]
print(f"[{time.time()-t0:.0f}s] chain {res.chain.shape}, "
      f"acc {float(np.mean(res.acceptance_fraction)):.3f}", flush=True)
# hybrid frames: round(1000/101) windows x (101-1)/5 frames = 10*20 = 200
assert n_frames == 200, f"expected 200 hybrid frames, got {n_frames}"
assert np.isfinite(res.log_prob).all()
assert 0.05 < float(np.mean(res.acceptance_fraction)) < 0.9
print("HYBRID FIT SMOKE PASS", flush=True)
