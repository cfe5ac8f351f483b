#!/usr/bin/env python
"""The bf16-DFT debias experiment (round-5, VERDICT #7).

TRUTH_GATE_256_R4B.json rejected the DEFAULT (single-pass bf16) DFT
tiers despite their ~10% throughput win (110.8 vs ~101 pipelines/s at
256^3): bf16 rounding is additive noise power, biasing cleaned P(k)
systematically high (+2-4e-3 signed means on the low bins).  Additive
power is the one error class an estimator can subtract after
calibration.  This script tries exactly that:

 1. CALIBRATE on held-out keys (disjoint from the gate keys): run the
    incumbent (mm3d=HIGH) and the fast (mm3d=DEFAULT) configurations on
    the same realisations; debias = mean(pk_fast - pk_ref).
 2. GATE on the truth-file keys: run the fast config with
    ``pk_debias`` applied and compare per-bin against the f64 oracle,
    alongside the un-debiased fast config (the R4B rejection record)
    and the incumbent floor.

Usage (real TPU, from the repo root, no PYTHONPATH):

    python scripts/debias_pk.py --truth truth_gate_256.npz \
        --out DEBIAS_GATE_256.json

Admissibility is judged exactly like scripts/truth_gate.py: a debiased
max-rel in the incumbent's class (~1e-3 at 256^3) admits the fast tier;
anything sitting at the R4B 2-4e-3 level (or a surviving systematic
signed mean) is a measured refutation — either way the artifact records
it next to the R4B entry.
"""
import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from truth_gate import _build, _gate_config, _rel, _run, _setup_jax  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--truth", default="truth_gate_256.npz")
    ap.add_argument("--calib-key0", type=int, default=5000)
    ap.add_argument("--calib-keys", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="DEBIAS_GATE_256.json")
    args = ap.parse_args()

    jax = _setup_jax(cpu=args.cpu)
    import numpy as np

    d = np.load(args.truth)
    nsamp, box, redshift = d["meta"]
    gate_keys = [int(s) for s in d["keys"]]
    t_c = d["pk_cleaned"]
    floor = float(np.max(_rel(d["f32_pk_cleaned"], t_c)))

    grid, cosmology = _build(jax, int(nsamp), float(box), float(redshift))
    from fastbox_tpu.ops import fft_safe
    from fastbox_tpu.pipeline import calibrate_pk_debias

    fft_safe.PREFER_MM = True   # production 3D-transform path at 256^3+
    try:
        cfg_fast = _gate_config("float32", mm3d_precision="DEFAULT",
                                vel_precision="DEFAULT")
        cfg_ref = _gate_config("float32", mm3d_precision="HIGH",
                               vel_precision="DEFAULT")

        calib = [args.calib_key0 + i for i in range(args.calib_keys)]
        assert not set(calib) & set(gate_keys), \
            "calibration keys must be disjoint from the gate keys"
        print(f"[debias] calibrating on {len(calib)} held-out keys ...",
              flush=True)
        debias = calibrate_pk_debias(grid, cosmology, cfg_fast, cfg_ref,
                                     keys=calib)
        print(f"[debias] vector (low 5): {[f'{v:.4g}' for v in debias[:5]]}",
              flush=True)

        results = {}
        for name, cfg in [
            ("mm3d_default", cfg_fast),
            ("mm3d_default_debias",
             dataclasses.replace(cfg_fast, pk_debias=debias)),
            ("incumbent", cfg_ref),
        ]:
            _, c, dd, s = _run(jax, grid, cosmology, cfg, gate_keys)
            rel = _rel(c, t_c)
            good = np.isfinite(t_c) & (np.abs(t_c) > 0)
            signed = np.where(good,
                              (c - t_c) / np.where(good, np.abs(t_c), 1.0),
                              0.0)
            results[name] = {
                "pk_cleaned_max": float(rel.max()),
                "pk_cleaned_low5": float(rel[:, :5].max()),
                "pk_cleaned_bins": [float(v) for v in rel.max(axis=0)[:8]],
                "signed_mean_low5": [float(v)
                                     for v in np.mean(signed, axis=0)[:5]],
            }
            print(f"[debias] {name:22s} max={rel.max():.3e} "
                  f"low5={rel[:, :5].max():.3e} "
                  f"signed_low5={[f'{v:+.2e}' for v in np.mean(signed, axis=0)[:5]]}",
                  flush=True)
    finally:
        fft_safe.PREFER_MM = False

    summary = {
        "floor": floor,
        "nsamp": int(nsamp),
        "gate_keys": gate_keys,
        "calib_keys": calib,
        "debias_vector": [float(v) for v in debias],
        "variants": results,
    }
    print(json.dumps(summary))
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"[debias] wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
