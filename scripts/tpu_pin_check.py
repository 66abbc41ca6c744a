"""Fresh-fit posterior pin check on real TPU hardware (VERDICT r2 #2b,
and the done-criterion of #1: a FLAGLESS run must end converged).

Runs `python -m joxsz_tpu.run` with no schedule flags — which must
resolve to the converged TPU default (W=1024, K=4 tempering, auto-extend
to split-Rhat <= 1.01) — into results/tpu_pin_fresh/, then compares the
fresh posterior against tests/fixtures/cl1226_posterior_pin.json in
fresh mode (MC-error-derived tolerances) and asserts the summary
certifies convergence.

NEVER point OUT at the pin-source run directory (results/tpu_r3/ since
the r3 re-pin): the fixture freezes that chain's SHA-256 and the
exact-mode test recomputes from it — overwriting it would break both.
Re-pinning (intended physics changes only) goes through
scripts/refreeze_pin.py against a run you designate.

Run:  setsid nohup python -u scripts/tpu_pin_check.py > /tmp/pin.log 2>&1 &
"""

import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
t0 = time.time()


def log(m):
    print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)


OUT = REPO / "results" / "tpu_pin_fresh"
OUT.mkdir(parents=True, exist_ok=True)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from joxsz_tpu import run as cli  # noqa: E402
from joxsz_tpu.postproc.pin import check_pin, load_pin  # noqa: E402

log(f"backend {jax.default_backend()}")
if jax.default_backend() == "cpu":
    log("FATAL: this check needs the TPU backend")
    sys.exit(1)

# flagless schedule — only output locations and the seed are set; the
# converged default must engage on its own
seed = int(sys.argv[1]) if len(sys.argv) > 1 else 31
import joxsz_tpu.config as cfgmod  # noqa: E402

_orig = cfgmod.JoXSZConfig.cl1226.__func__


def _cl1226_redirected(cls, *a, **kw):
    cfg = _orig(cls, *a, **kw)
    cfg.save_dir = str(OUT)
    cfg.plot_dir = str(OUT) + "/"
    return cfg


cfgmod.JoXSZConfig.cl1226 = classmethod(_cl1226_redirected)

log(f"starting flagless fit (seed {seed}) -> {OUT}")
cli.main(["--seed", str(seed), "--no-plots"])
log("fit done")

summary = json.loads((OUT / "joxsz_summary.json").read_text())
rhat = max(p.get("rhat", float("inf"))
           for p in summary["parameters"].values())
log(f"fresh-fit split-Rhat max: {rhat:.4f}")

ok, report = check_pin(summary, load_pin(), mode="fresh")
for line in report:
    log(f"PIN VIOLATION: {line}")
verdict = {
    "seed": seed,
    "split_rhat_max": rhat,
    "converged": rhat <= 1.01,
    "pin_ok": ok,
    "violations": report,
}
(OUT / "pin_check.json").write_text(json.dumps(verdict, indent=2))
log(f"pin check {'PASS' if ok and rhat <= 1.01 else 'FAIL'} "
    f"(written {OUT / 'pin_check.json'})")
print("DONE", flush=True)
