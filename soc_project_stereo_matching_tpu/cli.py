"""Command-line interface.

``match`` mirrors the reference standalone CLI (``SemiGlobalMatching/
SemiGlobalMatching/main.c``): load a stereo PNG pair as stb-luma grayscale
(main.c:25-26), run the full SGM pipeline with the reference defaults
(:48-65), min/max-normalise the disparity to 8 bit and write a PNG
(:90-120).  ``eval`` and ``serve``/``client`` expose the evaluation
platform and the reference-protocol compatibility endpoints.

Usage:
    python -m soc_project_stereo_matching_tpu.cli match LEFT RIGHT [-o OUT]
    python -m soc_project_stereo_matching_tpu.cli eval --data DIR
    python -m soc_project_stereo_matching_tpu.cli serve / client ...
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time
from pathlib import Path

import numpy as np


def _add_sgm_flags(ap: argparse.ArgumentParser) -> None:
    ap.add_argument("--config", type=Path, default=None,
                    help="YAML config ({sgm: {...}, engine: {...}})")
    ap.add_argument("--num-paths", type=int, choices=(4, 8), default=None)
    ap.add_argument("--min-disparity", type=int, default=None)
    ap.add_argument("--max-disparity", type=int, default=None)
    ap.add_argument("--p1", type=int, default=None)
    ap.add_argument("--p2-init", type=int, default=None)
    ap.add_argument("--uniqueness-ratio", type=float, default=None)
    ap.add_argument("--no-lr-check", action="store_true")
    ap.add_argument("--no-speckle", action="store_true")
    ap.add_argument("--no-unique", action="store_true")
    ap.add_argument("--min-speckle-area", type=int, default=None)


def _options_from(args) -> "SGMOptions":
    from .config import SGMOptions, load_yaml_config

    if args.config is not None:
        opts, _ = load_yaml_config(args.config)
    else:
        opts = SGMOptions()
    overrides = {}
    for flag, field in (("num_paths", "num_paths"),
                        ("min_disparity", "min_disparity"),
                        ("max_disparity", "max_disparity"),
                        ("p1", "p1"), ("p2_init", "p2_init"),
                        ("uniqueness_ratio", "uniqueness_ratio"),
                        ("min_speckle_area", "min_speckle_area")):
        v = getattr(args, flag)
        if v is not None:
            overrides[field] = v
    if args.no_lr_check:
        overrides["is_check_lr"] = False
    if args.no_speckle:
        overrides["is_remove_speckles"] = False
    if args.no_unique:
        overrides["is_check_unique"] = False
    return dataclasses.replace(opts, **overrides)


def cmd_match(args) -> int:
    from .config import EngineConfig
    from .data.imageio import load_image_gray_stb, save_disparity_png
    from .models.sgm import SGMEngine

    left = load_image_gray_stb(args.left)
    right = load_image_gray_stb(args.right)
    if left.shape != right.shape:
        print(f"error: shape mismatch {left.shape} vs {right.shape}",
              file=sys.stderr)
        return 1

    options = _options_from(args)
    engine = SGMEngine(options, EngineConfig())
    t0 = time.perf_counter()
    disp = np.asarray(engine.match(left, right))
    compile_and_run = time.perf_counter() - t0
    t0 = time.perf_counter()
    disp = np.asarray(engine.match(left, right))
    run = time.perf_counter() - t0

    out = Path(args.output) if args.output else \
        Path(args.left).with_suffix(".d.png")
    lo, hi = save_disparity_png(out, disp)
    valid = float(np.isfinite(disp).mean())
    print(f"{out}  range=[{lo:.2f},{hi:.2f}]px valid={valid:.1%} "
          f"first={compile_and_run * 1e3:.0f}ms steady={run * 1e3:.1f}ms")
    return 0


def cmd_eval(args) -> int:
    from .eval import harness

    harness.main(args.rest)
    return 0


def cmd_serve(args) -> int:
    from .compat import server

    server.main(args.rest)
    return 0


def cmd_client(args) -> int:
    from .compat import client

    client.main(args.rest)
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="soc_project_stereo_matching_tpu",
                                 description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    m = sub.add_parser("match", help="stereo pair PNG -> disparity PNG "
                                     "(reference main.c equivalent)")
    m.add_argument("left")
    m.add_argument("right")
    m.add_argument("-o", "--output", default=None)
    _add_sgm_flags(m)
    m.set_defaults(fn=cmd_match)

    for name, fn, hlp in (
            ("eval", cmd_eval, "batched evaluation platform"),
            ("serve", cmd_serve, "reference-protocol TCP server"),
            ("client", cmd_client, "reference-protocol TCP client")):
        p = sub.add_parser(name, help=hlp)
        p.add_argument("rest", nargs=argparse.REMAINDER)
        p.set_defaults(fn=fn)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
