#!/usr/bin/env python
"""Measure the actual single-chip maximum grid size N on the TPU.

BASELINE's north star is a >=1024^3 box; the sharded SPMD step covers
that over 8 chips (SCALING_1024_TPU.json: 6.09 GiB/chip on a v5e:2x4
AOT topology).  This probe bounds what ONE chip can hold: for each
(N, mode) it runs the program end-to-end in a FRESH SUBPROCESS (a
failed op poisons the process's TPU client — CLAUDE.md) and records
ok/OOM plus the steady-state time, writing MAXN_SINGLECHIP.json.

Modes:
  signal    realise -> bias -> lognormal -> velocity -> RSD -> binned
            P(k)  (include_foregrounds=False, include_noise=False)
  pipeline  the full default mock pipeline (adds FG cube + PCA clean)

Run:  python scripts/probe_maxN.py            # on the TPU, repo root
      python scripts/probe_maxN.py --sizes 576 640 768
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
os.environ.setdefault("FASTBOX_MM_PRECISION", "HIGHEST")
import jax
os.makedirs(os.path.expanduser("~/.cache/jax_fastbox"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
import fastbox_tpu
fastbox_tpu.ensure_platform()
from fastbox_tpu.cosmology import build_cosmology
from fastbox_tpu.grid import GridSpec
from fastbox_tpu.pipeline import PipelineConfig, make_pipeline

N = int(sys.argv[1]); mode = sys.argv[2]
extra = json.loads(sys.argv[3]) if len(sys.argv) > 3 else {}
# Cap the box at 8 Gpc: the constant-resolution rule (4e3 * N/256) pushes
# the frequency channels NEGATIVE beyond ~544^3 (freq_array spans ~1.28
# GHz at z=0.8 regardless of N), which NaNs the noise/FG instrument
# constants — the round-4 "640^3 full-pipeline worker crash" was NaN data
# hitting eigh, not a size limit (round-5 bisect, scripts/maxn_logs/).
box = min(8e3, 4e3 * N / 256.0)
grid = GridSpec.create(box_scale=(box,) * 3, nsamp=N, redshift=0.8)
cosmo = build_cosmology(
    dict(Omega_c=0.25, Omega_b=0.05, h=0.7, n_s=0.95, sigma8=0.8),
    redshift=0.8)
kw = {} if mode == "pipeline" else dict(include_foregrounds=False,
                                        include_noise=False)
kw.update(extra)
fn = make_pipeline(grid, cosmo, PipelineConfig(**kw))
key = jax.random.PRNGKey(0)
t0 = time.perf_counter()
out = fn(key)
head = np.asarray(out["pk_cleaned"][:3])   # forces full execution
t_first = time.perf_counter() - t0
t0 = time.perf_counter()
head = np.asarray(fn(jax.random.PRNGKey(1))["pk_cleaned"][:3])
t_steady = time.perf_counter() - t0
print(json.dumps({"ok": True, "N": N, "mode": mode,
                  "t_first_s": round(t_first, 2),
                  "t_steady_s": round(t_steady, 3),
                  "pk_head": [float(x) for x in head]}), flush=True)
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[576, 640, 704, 768])
    ap.add_argument("--modes", nargs="+", default=["signal", "pipeline"])
    ap.add_argument("--extra", default=None,
                    help="JSON dict of extra PipelineConfig kwargs "
                         "(stage-bisection variants, e.g. "
                         "'{\"pallas_pk\": \"off\"}')")
    ap.add_argument("--tag", default=None,
                    help="variant tag recorded in results and log names")
    ap.add_argument("--timeout", type=float, default=1800.0)
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "MAXN_SINGLECHIP.json"))
    args = ap.parse_args()

    # Full, untruncated child logs (round-5 VERDICT #3: the 576^3
    # "lane-padding" hypothesis was unverifiable from the 400-char
    # truncations) — one file per probe cell.
    logdir = os.path.join(REPO, "scripts", "maxn_logs")
    os.makedirs(logdir, exist_ok=True)
    extra = args.extra or "{}"
    tag = f"_{args.tag}" if args.tag else ""

    results = []
    # Largest-known-good anchor first so a cold cache pays its tunnel
    # warm-up on a config that cannot OOM.
    for mode in args.modes:
        for N in args.sizes:
            print(f"[maxN] {mode}{tag} {N}^3 ...", flush=True)
            logf = os.path.join(logdir, f"{mode}{tag}_{N}.log")
            try:
                p = subprocess.run([sys.executable, "-c", CHILD, str(N),
                                    mode, extra], cwd=REPO,
                                   capture_output=True,
                                   text=True, timeout=args.timeout)
            except subprocess.TimeoutExpired:
                results.append({"ok": False, "N": N, "mode": mode,
                                "tag": args.tag,
                                "error": f"timeout {args.timeout:.0f}s"})
                print(f"[maxN] {mode}{tag} {N}^3 TIMEOUT", flush=True)
                continue
            with open(logf, "w") as f:
                f.write(f"# rc={p.returncode} extra={extra}\n"
                        f"# --- stdout ---\n{p.stdout}\n"
                        f"# --- stderr ---\n{p.stderr}\n")
            line = [l for l in p.stdout.splitlines()
                    if l.startswith('{"ok"')]
            if p.returncode == 0 and line:
                rec = json.loads(line[-1])
                if args.tag:
                    rec["tag"] = args.tag
                results.append(rec)
                print(f"[maxN] {mode}{tag} {N}^3 OK "
                      f"steady={rec['t_steady_s']}s", flush=True)
            else:
                tail = (p.stderr or p.stdout).strip().splitlines()[-12:]
                err = next((l for l in reversed(tail)
                            if "RESOURCE_EXHAUSTED" in l or "Error" in l
                            or "error" in l), tail[-1] if tail else "?")
                results.append({"ok": False, "N": N, "mode": mode,
                                "tag": args.tag, "rc": p.returncode,
                                "log": os.path.relpath(logf, REPO),
                                "error": err.strip()[:400]})
                print(f"[maxN] {mode}{tag} {N}^3 FAILED "
                      f"(full log: {logf}): {err.strip()[:160]}", flush=True)

    payload = {"chip": "v5e (16 GiB HBM), axon tunnel",
               "note": "each cell is a fresh subprocess; box scales with "
                       "N to keep the 256^3/4Gpc resolution",
               "results": results}
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"[maxN] wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
