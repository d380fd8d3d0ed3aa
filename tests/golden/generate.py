"""Compile the reference C core and generate golden fixtures for the cone pair.

Usage:  python tests/golden/generate.py [--reference /root/reference] [--out tests/golden/_cache]

Produces ``cone_goldens.npz`` with the reference layouts converted to this
framework's canonical (H, D, W) cost-volume layout.  Nothing from the
reference tree is copied — its sources are compiled in place (read-only).
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]
DEFAULT_REFERENCE = Path("/root/reference")


def generate(reference: Path, out_dir: Path) -> Path:
    sgm_dir = reference / "SemiGlobalMatching" / "SemiGlobalMatching"
    data_dir = reference / "SemiGlobalMatching" / "Data" / "cone"
    if not sgm_dir.exists():
        raise FileNotFoundError(f"reference sources not found under {reference}")

    out_dir.mkdir(parents=True, exist_ok=True)
    npz_path = out_dir / "cone_goldens.npz"

    with tempfile.TemporaryDirectory() as td:
        tdir = Path(td)
        exe = tdir / "gen_golden"
        # The reference CostAggregate has an out-of-bounds bug: the (1,1)
        # diagonal path starting at column 0 takes the left-edge wrap branch
        # (SemiGlobalMatching.c:304-310, current_col==0 matches), walks off
        # the image, and its final uint16 row write overflows
        # cost_aggr_buffer straight into cost_init_buffer (the arrays are
        # adjacent in BSS), corrupting cost_init[(h=1, w=294..295)] which is
        # then read back by the remaining diagonal passes.  The corrupted
        # values depend on heap garbage, so they are not a reproducible
        # contract.  We neutralise the overflow WITHOUT touching the
        # read-only reference source: a larger tentative definition of
        # cost_aggr_buffer is merged in via -fcommon, so the stray writes
        # land in slack and the observable goldens equal the reference's
        # in-bounds semantics on a pristine cost volume.
        # There are two stray paths: the (1,1) pass's column-0 path overflows
        # past cost_aggr's end, and the (-1,-1) pass's last path underflows
        # below its start (both by <= 47744 bytes).  Pad every buffer with
        # 128 KiB of tail slack so each neighbour's underflow is absorbed
        # too, regardless of how the linker orders the merged commons.
        guard = tdir / "guard.c"
        guard.write_text(
            "/* see generate.py: slack absorbing the reference's OOB writes */\n"
            "#define SLACK_B (128*1024)\n"
            "#define NPX (450*375)\n"
            "unsigned int   census_right_buffer[NPX + SLACK_B/4];\n"
            "unsigned int   census_left_buffer [NPX + SLACK_B/4];\n"
            "unsigned char  cost_init_buffer   [NPX*64 + SLACK_B];\n"
            "unsigned short cost_aggr_buffer   [NPX*64 + SLACK_B/2];\n"
            "float          disp_left_buffer   [NPX + SLACK_B/4];\n"
            "float          disp_right_buffer  [NPX + SLACK_B/4];\n"
        )
        cmd = [
            "gcc", "-O2", "-std=c11", "-fcommon",
            f"-I{sgm_dir}",
            str(REPO / "tests" / "golden" / "gen_golden.c"),
            str(sgm_dir / "SemiGlobalMatching.c"),
            str(guard),
            "-lm", "-o", str(exe),
        ]
        subprocess.run(cmd, check=True)
        subprocess.run(
            [str(exe), str(data_dir / "im2.png"), str(data_dir / "im6.png"), str(tdir)],
            check=True,
        )

        w, h, d = map(int, (tdir / "meta.txt").read_text().split())
        load = lambda name, dt: np.fromfile(tdir / name, dtype=dt)
        arrays = {
            "census_left": load("census_left.bin", np.uint32).reshape(h, w),
            "census_right": load("census_right.bin", np.uint32).reshape(h, w),
            # reference layout (H, W, D) -> canonical (H, D, W)
            "cost_init": load("cost_init.bin", np.uint8).reshape(h, w, d).transpose(0, 2, 1),
            "cost_aggr": load("cost_aggr.bin", np.uint16).reshape(h, w, d).transpose(0, 2, 1),
            "disp_right": load("disp_right.bin", np.float32).reshape(h, w),
            "disp_left_full": load("disp_left_full.bin", np.float32).reshape(h, w),
            "disp_left_wta_median": load("disp_left_wta_median.bin", np.float32).reshape(h, w),
        }
    np.savez_compressed(npz_path, **arrays)
    print(f"wrote {npz_path} ({npz_path.stat().st_size / 1e6:.1f} MB)")
    return npz_path


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", type=Path, default=DEFAULT_REFERENCE)
    ap.add_argument("--out", type=Path, default=REPO / "tests" / "golden" / "_cache")
    args = ap.parse_args()
    try:
        generate(args.reference, args.out)
    except FileNotFoundError as e:
        print(f"skipped: {e}", file=sys.stderr)
        sys.exit(2)
