"""Download scripts: DRY_RUN plans must reference real repo configs and
cover every released model (the scripts are the one reference workflow a
networked user executes first)."""

import os
import re
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _dry_run(script):
    out = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", script)],
        env={**os.environ, "DRY_RUN": "1"},
        capture_output=True, text=True, timeout=60)
    assert out.returncode == 0, out.stderr
    return out.stdout


def test_models_plan_fetches_ckpt_and_installs_config():
    plan = _dry_run("download_models.sh")
    fetches = re.findall(r"would fetch (\S+) -> (\S+)", plan)
    copies = re.findall(r"would copy (\S+) -> (\S+)", plan)
    assert len(fetches) == 6 and len(copies) == 6
    for src, dest in copies:
        assert os.path.isfile(os.path.join(REPO, src)), src
        assert dest.endswith("/config.yaml")
    # every model dir gets BOTH model.ckpt and config.yaml
    ckpt_dirs = {os.path.dirname(d) for _, d in fetches}
    cfg_dirs = {os.path.dirname(d) for _, d in copies}
    assert ckpt_dirs == cfg_dirs
    # release URL layout (reference scripts/download_models.sh)
    assert all(u.startswith("https://ommer-lab.com/files/rdm/models/")
               for u, _ in fetches)


def test_first_stage_plan_subset_arg():
    plan = _dry_run("download_first_stages.sh")
    assert plan.count("would fetch") == 9  # full LDM first-stage zoo
    out = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "download_first_stages.sh"),
         "vq-f4"],
        env={**os.environ, "DRY_RUN": "1"},
        capture_output=True, text=True, timeout=60)
    assert out.stdout.count("would fetch") == 1
    assert "vq-f4.zip" in out.stdout
