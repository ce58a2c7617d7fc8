"""Summarize a jax.profiler device trace into an op-category table.

Usage:
  python tools/profile_lost.py --batches 32 --profile-dir /tmp/trace
  python tools/trace_report.py /tmp/trace [--top N]

Reads the xplane protobuf(s) under <dir>/plugins/profile/*/ with the
xprof converter (no TensorBoard UI needed) and prints:
  * self-time by HLO op category (convolution/custom-call/fusion/...)
  * the top-N individual ops with their bound-by classification and
    achieved GFLOP/s.

This is how the seq-pad optimization was found: pad + data-formatting
around the per-block flash calls showed up as ~23% of device time.
"""

import argparse
import glob
import json
import os
import sys
from collections import defaultdict


def find_xplanes(trace_dir: str):
    # each jax.profiler.trace capture makes a NEW timestamped run dir under
    # plugins/profile/ — report only the newest, or re-used --profile-dirs
    # would silently sum several captures into one op table
    run_dirs = sorted(glob.glob(os.path.join(trace_dir, "plugins", "profile", "*")))
    if run_dirs:
        hits = sorted(glob.glob(os.path.join(run_dirs[-1], "*.xplane.pb")))
        if hits:
            if len(run_dirs) > 1:
                print(f"[trace_report] {len(run_dirs)} captures under "
                      f"{trace_dir}; reporting the newest: "
                      f"{os.path.basename(run_dirs[-1])}", file=sys.stderr)
            return hits
    hits = sorted(glob.glob(os.path.join(trace_dir, "*.xplane.pb")))
    if hits:
        return hits
    raise FileNotFoundError(f"no *.xplane.pb under {trace_dir}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args()

    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(find_xplanes(args.trace_dir),
                                      "hlo_stats", {})
    obj = json.loads(data)
    cols = [c["label"] if isinstance(c, dict) else c for c in obj["cols"]]

    def idx(label):
        try:
            return next(i for i, c in enumerate(cols) if c == label)
        except StopIteration:
            raise SystemExit(
                f"hlo_stats column {label!r} not found (xprof schema "
                f"changed?); columns: {cols}"
            )

    i_cat = idx("HLO op category")
    i_name = idx("HLO op name")
    i_self = idx("Total self time (us)")
    i_bound = idx("Bound by")
    i_gfs = idx("Model GFLOP/s")

    def val(r, i):
        c = r["c"][i]
        return c.get("v") if isinstance(c, dict) else c

    bycat = defaultdict(float)
    rows = []
    total = 0.0
    for r in obj["rows"]:
        t = float(val(r, i_self) or 0)
        bycat[val(r, i_cat)] += t
        total += t
        rows.append((t, val(r, i_cat), val(r, i_name), val(r, i_bound),
                     val(r, i_gfs)))

    if total <= 0:
        raise SystemExit(
            "trace contains no device op time (host-only trace, or the "
            "profile window closed before the first dispatch)"
        )
    print(f"total device self-time: {total / 1e3:.2f} ms\n")
    print(f"{'category':<32} {'ms':>9} {'%':>6}")
    for cat, t in sorted(bycat.items(), key=lambda kv: -kv[1]):
        print(f"{cat:<32} {t / 1e3:9.2f} {t / total * 100:6.1f}")
    print(f"\ntop {args.top} ops by self-time:")
    for t, cat, name, bound, gfs in sorted(
        rows, key=lambda r: -r[0]
    )[: args.top]:
        gfs_s = f"{float(gfs):,.0f}" if gfs not in (None, "") else "-"
        print(f"{t / 1e3:8.2f} ms  {cat:<24} {str(name)[:44]:<44} "
              f"bound={bound} GFLOP/s={gfs_s}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
