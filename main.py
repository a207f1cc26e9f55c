#!/usr/bin/env python
"""Training entry point — the reference's `python main.py -t --base ...`
surface (/root/reference/main.py). Thin forwarder to scripts/train.py."""

import runpy
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
runpy.run_path(
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "scripts", "train.py"),
    run_name="__main__")
