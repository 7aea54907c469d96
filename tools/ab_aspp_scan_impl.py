"""Same-session on-chip A/B of the ASPP-scan bodies for the 512^2 train step.

Round-5 measurement behind ``MADM_ASPP_SCAN_IMPL`` (daformer.py
``sep_branch_scan``): the r5 trace attributed 753 of 1252 ms/step to the
'taps' body's backward (dynamic_update_slice/add_any cotangent plumbing);
the 'conv' body replaces it with static-dilation depthwise convs
(halo-chunked onto the batch axis for sublane fill) at +1.45G memory.

Each config runs in its own subprocess (an OOM can poison a process), in
anchor/candidate order within one chip session so numbers are comparable
(CLAUDE.md: cross-session drift ~15%).

Usage: python tools/ab_aspp_scan_impl.py  [--steps 4]
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import os, sys, json
sys.path.insert(0, {repo!r})
from tools.train_memory_probe import run_probe
try:
    ms = run_probe(opt={opt!r}, mu_dtype="bfloat16",
                   no_momentum={no_momentum!r}, steps={steps}, quiet=True)
    print(json.dumps({{"ok": True, "ms": ms}}))
except Exception as e:
    print(json.dumps({{"ok": False,
                       "err": (str(e).splitlines() or [""])[0][:300],
                       "type": type(e).__name__}}))
"""


def run_cfg(label, impl, opt, no_momentum, steps, timeout_s=1800):
    env = dict(os.environ, MADM_ASPP_SCAN="1", MADM_ASPP_SCAN_IMPL=impl)
    code = RUNNER.format(repo=REPO, opt=opt, no_momentum=no_momentum,
                         steps=steps)
    print(f"== {label}: impl={impl} opt={opt} no_momentum={no_momentum}",
          flush=True)
    try:
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        print(f"   TIMEOUT after {timeout_s}s", flush=True)
        return None
    out = [l for l in r.stdout.splitlines() if l.startswith("{")]
    print("   stderr tail:", "\n    ".join(r.stderr.splitlines()[-4:]),
          flush=True)
    if out:
        print(f"   -> {out[-1]}", flush=True)
        return out[-1]
    print(f"   no JSON (rc={r.returncode}); stdout tail: "
          f"{r.stdout.splitlines()[-3:]}", flush=True)
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--skip-adamw-conv", action="store_true")
    args = ap.parse_args()

    results = {}
    # anchor first: the r4 headline config
    results["taps/adamw"] = run_cfg("anchor", "taps", "adamw", False,
                                    args.steps)
    if not args.skip_adamw_conv:
        # expected OOM (+1.45G over the 16G fit) — confirm on chip
        results["conv/adamw"] = run_cfg("candidate", "conv", "adamw", False,
                                        args.steps)
    results["conv/adafactor"] = run_cfg("candidate", "conv", "adafactor",
                                        False, args.steps)
    results["taps/adafactor"] = run_cfg("anchor2", "taps", "adafactor",
                                        False, args.steps)
    print("\n== summary ==")
    for k, v in results.items():
        print(f"  {k}: {v}")


if __name__ == "__main__":
    main()
