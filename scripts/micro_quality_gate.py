"""Self-contained train → sample → FID quality gate (no network).

Runs rdm_tpu.eval.micro_gate: procedural colored-shapes dataset → tiny
VQ first stage from scratch → tiny RDM through the production trainer →
sampling through the production pipeline → FID/Precision/Recall through
the production eval harness. Passes when the trained model's FID is far
below the random-init model's — certifying the full loop the air gap
blocks on real checkpoints (reference README.md:153-164 protocol).

    python scripts/micro_quality_gate.py [--fast] [--out report.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--fast", action="store_true",
                   help="reduced steps (CI-sized, ~3 min CPU)")
    p.add_argument("--out", type=str, default=None,
                   help="write the report JSON here")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--gate_ratio", type=float, default=None,
                   help="pass iff fid_trained < ratio * fid_random "
                        "(default 0.6 full / 0.8 fast; measured seed 0: "
                        "3000 steps → 0.48, 900 steps → 0.63)")
    opt = p.parse_args()

    from rdm_tpu.eval.micro_gate import run_gate

    kw = dict(seed=opt.seed)
    if opt.fast:
        kw.update(rdm_steps=900)
    gate_ratio = opt.gate_ratio or (0.8 if opt.fast else 0.6)
    report = run_gate(**kw)
    report["gate_ratio"] = gate_ratio
    report["passed"] = bool(
        report["fid_trained"] < gate_ratio * report["fid_random_init"]
        and report["precision_trained"] > report["precision_random"])
    print(json.dumps(report))
    if opt.out:
        with open(opt.out, "w") as f:
            json.dump(report, f, indent=2)
    if not report["passed"]:
        raise SystemExit(
            f"GATE FAILED: fid_trained={report['fid_trained']} not < "
            f"{opt.gate_ratio} * fid_random={report['fid_random_init']}")


if __name__ == "__main__":
    main()
