"""HLO-mapped per-op efficiency table from a device trace + compiled HLO.

Joins a jax.profiler trace (per-fusion device time, BENCH_PROFILE_DIR
hooks in bench.py / bench_train.py) with the compiled post-optimization
HLO (BENCH_DUMP_HLO) to produce the table behind the per-op MXU-
efficiency claims in COVERAGE.md: for every fusion/convolution/dot
instruction, its device time, analytic FLOPs (from the HLO shapes), and
achieved FLOP/s vs the v5e peak — with the jax source op_name so
forward ops separate from gradient ("transpose(") ops.

    python scripts/analyze_trace_hlo.py --trace /tmp/prof --hlo /tmp/x.hlo
        [--top 40] [--contains convolution]

The FLOPs model: conv = 2 * prod(out) * kh * kw * Cin / groups
(+ the same again for int8 ops counted at the bf16 peak unless
--int8-peak); dot = 2 * prod(out) * K. Elementwise-only fusions get
FLOPs 0 and efficiency "-" (they are bandwidth-, not MXU-, bound).
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import math
import re
import sys

V5E_BF16_PEAK = 197e12
V5E_INT8_PEAK = 394e12


def load_trace_durations(trace_dir: str):
    """Full-instance op durations (fusion.123 kept distinct) in us."""
    paths = sorted(
        glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    events = data["traceEvents"]
    dev_pids = {
        e["pid"] for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and re.search(r"TPU|/device:", e["args"].get("name", ""))
    }
    noise = re.compile(r"^(jit_|while|end: |PjRt|Pjit|CommonPjRt|"
                       r"ParseArguments|Handle inputs|ThreadpoolListener|"
                       r"ThunkExecutor|XLA launch)")
    dur = collections.Counter()
    cnt = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e["name"]
        if noise.match(name):
            continue
        dur[name] += e.get("dur", 0)
        cnt[name] += 1
    return dur, cnt, paths[-1]


_SHAPE = re.compile(r"(?:[a-z0-9]+)\[([\d,]*)\]")


def _dims(shape_str):
    m = _SHAPE.search(shape_str)
    if not m or not m.group(1):
        return []
    return [int(d) for d in m.group(1).split(",")]


def _operand_names(line: str, opcode: str):
    # anchor on the opcode — layouts like {2,3,1,0:T(8,128)} appear
    # earlier in the line and would otherwise match first
    m = re.search(r"\s" + opcode + r"\(([^)]*)\)", line)
    if not m:
        return []
    return [re.sub(r"^(/\*[^*]*\*/)?\s*%", "", a.strip())
            for a in m.group(1).split(",") if a.strip()]


def _conv_flops(line: str, shapes):
    """FLOPs of one HLO convolution line. Post-opt HLO prints operands
    as bare names (`convolution(%fusion.1, %fusion.2)`), so rhs dims come
    from the global name->shape map built in a first pass."""
    # 2 * prod(out) * prod(rhs_spatial) * rhs_input_features / groups;
    # dim_labels tell which rhs dims are o (output features).
    m = re.search(r"=\s*(\S+)\s+convolution", line)
    out_dims = _dims(m.group(1)) if m else []
    ops = _operand_names(line, "convolution")
    if len(ops) < 2 or not out_dims:
        return 0
    rhs_dims = shapes.get(ops[1], [])
    if not rhs_dims:
        return 0
    dl = re.search(r"dim_labels=([^, ]+)", line)
    fg = re.search(r"feature_group_count=(\d+)", line)
    groups = int(fg.group(1)) if fg else 1
    if dl:
        rhs_labels = dl.group(1).split("_")[1].split("-")[0]
        k_in = 1
        for ch, d in zip(rhs_labels, rhs_dims):
            if ch not in ("o",):
                k_in *= d  # spatial dims and input-feature dim
    else:
        k_in = math.prod(rhs_dims[:-1])
    # lhs_dilate (transposed / dot-strength-reduced convs): only every
    # dilate-th window tap lands on a real sample — useful MACs per
    # output shrink by prod(ceil(size/dilate))/prod(size)
    mw = re.search(r"window=\{([^}]*)\}", line)
    if mw:
        ms = re.search(r"size=([\dx]+)", mw.group(1))
        md = re.search(r"lhs_dilate=([\dx]+)", mw.group(1))
        if ms and md:
            sizes = [int(v) for v in ms.group(1).split("x")]
            dil = [int(v) for v in md.group(1).split("x")]
            for s, d in zip(sizes, dil):
                if d > 1 and s:
                    k_in = k_in * math.ceil(s / d) // s
    return 2 * math.prod(out_dims) * k_in // max(groups, 1)


def _dot_flops(line: str, shapes):
    m = re.search(r"=\s*(\S+)\s+dot\(", line)
    out_dims = _dims(m.group(1)) if m else []
    ops = _operand_names(line, "dot")
    if len(ops) < 2 or not out_dims:
        return 0
    lhs_dims = shapes.get(ops[0], [])
    c = re.search(r"lhs_contracting_dims=\{([\d,]*)\}", line)
    k = 1
    if c and c.group(1) and lhs_dims:
        for d in c.group(1).split(","):
            k *= lhs_dims[int(d)]
    return 2 * math.prod(out_dims) * k


def parse_hlo(hlo_path: str):
    """instruction name -> {flops, kind, op_name} for fusions/convs/dots.

    Fusions inherit the summed FLOPs of the conv/dot instructions inside
    their called computation."""
    with open(hlo_path) as f:
        text = f.read()
    # pass 0: global name -> dims map (post-opt HLO prints operands as
    # bare names, so conv/dot FLOPs need operand shapes resolved here)
    shapes = {}
    for line in text.splitlines():
        mi = re.match(r"\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\S+)", line)
        if mi:
            shapes[mi.group(1)] = _dims(mi.group(2))
    # computation bodies: "%name (params) -> type {" ... "}"
    comp_flops = {}
    comp_kinds = {}
    cur = None
    info = {}
    for line in text.splitlines():
        mc = re.match(r"\s*%?([\w.\-]+)\s+\([^)]*\)\s*->.*\{", line)
        if mc and not line.lstrip().startswith("ROOT"):
            cur = mc.group(1)
            comp_flops[cur] = 0
            comp_kinds[cur] = set()
            continue
        if line.strip() == "}":
            continue
        fl = kind = None
        if " convolution(" in line:
            fl, kind = _conv_flops(line, shapes), "conv"
        elif " dot(" in line:
            fl, kind = _dot_flops(line, shapes), "dot"
        elif " custom-call(" in line and "tpu_custom_call" in line:
            kind = "pallas"
        if kind and cur:
            comp_flops[cur] += fl or 0
            comp_kinds[cur].add(kind)
        # top-level entry instructions (also matched while inside the
        # entry computation): record named instructions
        mi = re.match(r"\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=", line)
        if not mi:
            continue
        name = mi.group(1)
        op_name = ""
        mo = re.search(r'op_name="([^"]*)"', line)
        if mo:
            op_name = mo.group(1)
        if " fusion(" in line:
            mcall = re.search(r"calls=%?([\w.\-]+)", line)
            info[name] = {"calls": mcall.group(1) if mcall else None,
                          "kind": "fusion", "op_name": op_name,
                          "flops": 0}
        elif " convolution(" in line:
            info[name] = {"calls": None, "kind": "conv",
                          "op_name": op_name,
                          "flops": _conv_flops(line, shapes)}
        elif " dot(" in line:
            info[name] = {"calls": None, "kind": "dot",
                          "op_name": op_name, "flops": _dot_flops(line, shapes)}
        elif " custom-call(" in line and "tpu_custom_call" in line:
            info[name] = {"calls": None, "kind": "pallas",
                          "op_name": op_name, "flops": 0}
    for name, rec in info.items():
        called = rec.pop("calls", None)
        if called and called in comp_flops:
            rec["flops"] = comp_flops[called]
            kinds = comp_kinds[called]
            if kinds:
                rec["kind"] = "fusion:" + "+".join(sorted(kinds))
    return info


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trace", required=True)
    p.add_argument("--hlo", required=True)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--contains", type=str, default=None,
                   help="only rows whose kind or op_name contains this")
    p.add_argument("--peak", type=float, default=V5E_BF16_PEAK)
    p.add_argument("--json", type=str, default=None)
    opt = p.parse_args()

    dur, cnt, trace_path = load_trace_durations(opt.trace)
    info = parse_hlo(opt.hlo)
    rows = []
    total_us = sum(dur.values())
    for name, us in dur.items():
        rec = info.get(name) or info.get(name.lstrip("%"))
        # trace may suffix duplicate launches; try stripping one id
        if rec is None:
            rec = info.get(re.sub(r"\.(\d+)$", "", name))
        kind = rec["kind"] if rec else "?"
        flops = rec["flops"] if rec else 0
        op_name = rec["op_name"] if rec else ""
        # us is summed over all instances; flops is per instance
        eff = (flops * cnt[name]) / (us * 1e-6) / opt.peak \
            if us and flops else None
        rows.append({"name": name, "us": us, "count": cnt[name],
                     "kind": kind, "flops": flops,
                     "eff": round(eff, 4) if eff is not None else None,
                     "grad": "transpose(" in op_name,
                     "op_name": op_name[-100:]})
    rows.sort(key=lambda r: -r["us"])
    shown = 0
    print(f"# total device time {total_us / 1e3:.2f} ms  ({trace_path})")
    print(f"{'us':>9} {'n':>4} {'eff':>6} {'kind':<14} {'grad':<4} name"
          f" :: op_name tail")
    for r in rows:
        if opt.contains and opt.contains not in r["kind"] \
                and opt.contains not in r["op_name"]:
            continue
        if shown >= opt.top:
            break
        shown += 1
        eff = f"{r['eff'] * 100:5.1f}%" if r["eff"] is not None else "    -"
        print(f"{r['us']:>9} {r['count']:>4} {eff} {r['kind']:<14} "
              f"{'bwd' if r['grad'] else 'fwd':<4} {r['name']}"
              f" :: {r['op_name']}")
    if opt.json:
        with open(opt.json, "w") as f:
            json.dump({"total_us": total_us, "rows": rows}, f)
        print(f"# wrote {opt.json}")


if __name__ == "__main__":
    sys.exit(main())
