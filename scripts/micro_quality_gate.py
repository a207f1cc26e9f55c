"""Self-contained train → sample → FID quality gate (no network).

Runs rdm_tpu.eval.micro_gate: procedural colored-shapes dataset → tiny
VQ first stage from scratch → tiny RDM (or RARM, --model rarm) through
the production trainer → sampling through the production pipeline →
FID/Precision/Recall through the production eval harness. Passes when
the trained model's FID is far below the random-init model's —
certifying the full loop the air gap blocks on real checkpoints
(reference README.md:153-164 protocol; RARM surface:
transformer.py:296-391).

    python scripts/micro_quality_gate.py [--model rdm|rarm] [--fast]
        [--out report.json]

The final line is ONE JSON record ({"metric": "quality_gate", ...}) so
per-round quality artifacts (QUALITY_r*.json) can be captured the same
way as BENCH_r*.json.
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
    p.add_argument("--model", type=str, default="rdm",
                   choices=["rdm", "rarm"])
    p.add_argument("--fast", action="store_true",
                   help="reduced steps (CI-sized, ~3 min CPU)")
    p.add_argument("--out", type=str, default=None,
                   help="write the report JSON here")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--gate_ratio", type=float, default=None,
                   help="pass iff fid_trained < ratio * fid_random. "
                        "Defaults per model/speed from the measured seed-0 "
                        "ratios: RDM 3000 steps → 0.48 (gate 0.6), 900 → "
                        "0.63 (gate 0.8); RARM 3000 steps → 0.54 (gate "
                        "0.7), 900 → 0.87 (gate 0.93 — the AR model needs "
                        "more steps to separate, so the fast tier is a "
                        "regression tripwire, not a quality bar)")
    opt = p.parse_args()

    from rdm_tpu.eval.micro_gate import run_gate, run_gate_rarm

    kw = dict(seed=opt.seed)
    steps_key = "rdm_steps" if opt.model == "rdm" else "rarm_steps"
    if opt.fast:
        kw[steps_key] = 900
    defaults = {("rdm", False): 0.6, ("rdm", True): 0.8,
                ("rarm", False): 0.7, ("rarm", True): 0.93}
    gate_ratio = opt.gate_ratio or defaults[(opt.model, opt.fast)]
    runner = run_gate if opt.model == "rdm" else run_gate_rarm
    report = runner(**kw)
    report["metric"] = "quality_gate"
    report["model"] = opt.model
    report["gate_ratio"] = gate_ratio
    report["passed"] = bool(
        report["fid_trained"] < gate_ratio * report["fid_random_init"]
        and report["precision_trained"] > report["precision_random"])
    if opt.out:
        with open(opt.out, "w") as f:
            json.dump(report, f, indent=2)
    print(json.dumps(report))
    if not report["passed"]:
        raise SystemExit(
            f"GATE FAILED: fid_trained={report['fid_trained']} not < "
            f"{gate_ratio} * fid_random={report['fid_random_init']}")


if __name__ == "__main__":
    main()
