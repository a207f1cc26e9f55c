"""CLI flag parity with the reference sampling scripts.

The reference CLIs (/root/reference/scripts/rdm_sample.py:22-143,
/root/reference/scripts/rarm_sample.py:96-215) expose a fixed flag
surface; users' shell scripts must port verbatim.  These tests build the
argparse parsers without running the pipelines.
"""

import importlib
import sys


def _parse(module_name, argv):
    mod = importlib.import_module(module_name)
    old = sys.argv
    sys.argv = ["prog"] + argv
    try:
        return mod.parse_args()
    finally:
        sys.argv = old


RDM_REFERENCE_FLAGS = [
    "savepath", "model_path", "save_nns", "batch_size", "n_runs", "seed",
    "guidance_scale", "top_m", "k_nn", "steps", "caption", "only_caption",
    "omit_query", "use_weights", "keep_qids", "increase_guidance",
]

RARM_REFERENCE_FLAGS = [
    "savepath", "model_path", "save_nns", "batch_size", "n_runs", "seed",
    "increase_guidance", "keep_qids", "guidance_scale", "top_k",
    "temperature", "top_m", "k_nn", "caption", "only_caption",
    "unconditional", "use_weights",
]


def test_rdm_sample_reference_flags():
    opt = _parse("scripts.rdm_sample", [])
    for flag in RDM_REFERENCE_FLAGS:
        assert hasattr(opt, flag), f"rdm_sample missing --{flag}"


def test_rarm_sample_reference_flags():
    opt = _parse("scripts.rarm_sample", [])
    for flag in RARM_REFERENCE_FLAGS:
        assert hasattr(opt, flag), f"rarm_sample missing --{flag}"


def test_rarm_sample_guidance_and_qids_flags_parse():
    opt = _parse("scripts.rarm_sample",
                 ["--increase_guidance", "--keep_qids", "--seed", "3"])
    assert opt.increase_guidance and opt.keep_qids and opt.seed == 3


def test_top_m_int_coercion_matches_reference():
    # reference: top_m > 1.0 means a fixed image count (int), else a
    # fraction (rarm_sample.py:210-213)
    opt = _parse("scripts.rarm_sample", ["--top_m", "100"])
    assert isinstance(opt.top_m, int) and opt.top_m == 100
    opt = _parse("scripts.rarm_sample", ["--top_m", "0.01"])
    assert isinstance(opt.top_m, float)
