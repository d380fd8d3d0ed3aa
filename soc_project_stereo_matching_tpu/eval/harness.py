"""Batched evaluation harness — the TPU-native replacement for the
reference's socket round-trip test platform.

The reference scores depth maps inside a per-client server thread
(server.py:183-310) and writes per-client stats JSON (:292-310).  Here the
network round trip is replaced by an in-process, jit-compiled batch
pipeline; the stats schema is a superset of the reference's
(client/total_frames/total_time_s/fps/measurements[...]) so existing
tooling can consume it, and a run can resume from its own stats file
(measurements are keyed by dataset name/seq — the reference's seq ids made
this possible, SURVEY.md section 5 checkpoint note).

Usage:
    python -m soc_project_stereo_matching_tpu.eval.harness --data DIR [...]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time
from collections import defaultdict
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Union

import numpy as np

from ..config import SGMOptions
from ..data.datasets import StereoPair, discover_datasets, load_pair, reference_data_pairs
from ..models.sgm import SGMEngine
from . import metrics as M

PathLike = Union[str, Path]

# Stamped into every stats file.  Durations are RTT-cancelled device times
# (utils/profiling.chained_match_time), NOT the reference's wall-clock
# network round trips — resuming must not silently blend the two
# definitions in one file (ADVICE r3), so resume refuses a file written
# under any other methodology (including pre-stamp files).
TIMING_METHODOLOGY = "chained-rtt-cancelled"


@dataclasses.dataclass
class HarnessConfig:
    batch_size: int = 8
    abs_thresh_mm: float = 10.0
    disp_tau: float = 3.0
    stats_path: Optional[Path] = None   # write stats JSON here
    resume: bool = False                # skip pairs already in stats_path
    max_disparity: Optional[int] = None  # override per-pair dmax
    use_pair_disparity_range: bool = True
    # Chained-timing effort per pair (see utils/profiling.chained_match_time:
    # iters*repeats matches are run).  None = backend-aware default: the TPU
    # relay's RTT variance needs (32, 3); other backends (CPU directory
    # evals, tests) get the cheap (2, 1) — ~100 matches per pair would make
    # them two orders of magnitude slower for no benefit.
    timing_iters: Optional[int] = None
    timing_repeats: Optional[int] = None
    # Transient-failure recovery ladder (the reference's analog is the lwIP
    # error callback + reconnect, tcp_perf_client.c:37-49): a failed
    # batch/pair measurement re-probes the backend and retries this many
    # times before raising; the resumable stats file (written after every
    # measurement) covers anything the in-process retry cannot — a fresh
    # process with resume=True skips all completed work.
    measure_retries: int = 1

    def resolved_timing(self) -> tuple:
        import jax

        on_tpu = jax.default_backend() == "tpu"
        iters = self.timing_iters if self.timing_iters is not None \
            else (32 if on_tpu else 2)
        repeats = self.timing_repeats if self.timing_repeats is not None \
            else (3 if on_tpu else 1)
        return iters, repeats


class EvaluationHarness:
    def __init__(self, options: SGMOptions = SGMOptions(),
                 config: HarnessConfig = HarnessConfig()):
        self.base_options = options
        self.config = config
        self._engines: Dict[SGMOptions, SGMEngine] = {}

    # -- engine cache -------------------------------------------------------
    def _engine_for(self, pair: StereoPair) -> SGMEngine:
        opts = self.base_options
        if self.config.max_disparity is not None:
            opts = dataclasses.replace(opts, max_disparity=self.config.max_disparity)
        elif self.config.use_pair_disparity_range:
            opts = dataclasses.replace(
                opts, min_disparity=pair.dmin, max_disparity=pair.dmax
            )
        if opts not in self._engines:
            self._engines[opts] = SGMEngine(opts)
        return self._engines[opts]

    # -- single pair --------------------------------------------------------
    def evaluate_pair(self, pair: StereoPair) -> dict:
        engine = self._engine_for(pair)
        # Chained timing (utils/profiling.chained_match_time): the warm-up
        # compile is excluded (the reference's FPS likewise excludes board
        # boot), and the measured calls form a dependency chain so a lazily
        # dispatching TPU runtime cannot fake the number.
        iters, repeats = self.config.resolved_timing()
        duration, disp = self._measure_with_retry(
            engine.match, pair.img_left, pair.img_right,
            iters=iters, repeats=repeats)
        return self._metrics_for(pair, disp, duration)

    def _measure_with_retry(self, match_fn, left, right, *, iters, repeats):
        """chained_match_time with the transient-failure ladder: on error,
        re-probe the backend in a subprocess (a short window — the stats
        file makes a full restart cheap) and retry up to
        ``config.measure_retries`` times."""
        import logging

        from ..utils.profiling import chained_match_time

        last = None
        for attempt in range(self.config.measure_retries + 1):
            try:
                return chained_match_time(match_fn, left, right,
                                          iters=iters, repeats=repeats)
            except Exception as e:  # noqa: BLE001 — transient relay faults
                last = e
                if attempt == self.config.measure_retries:
                    break
                logging.getLogger("soc_sgm_tpu.eval").warning(
                    "measurement failed (%s: %s); re-probing backend, "
                    "retry %d/%d", type(e).__name__, e, attempt + 1,
                    self.config.measure_retries)
                from ..utils.relay import wait_for_backend

                wait_for_backend(max_wait_s=300.0)
        raise last

    def _metrics_for(self, pair: StereoPair, disp: np.ndarray,
                     duration: float) -> dict:
        valid = np.isfinite(disp)
        depth = np.where(
            valid, M.disparity_to_depth(disp, pair.calib, 0), np.nan
        ).astype(np.float32)

        if pair.gt_disp_left is not None:
            gt_r = pair.gt_disp_right if pair.gt_disp_right is not None \
                else pair.gt_disp_left
            h, w = disp.shape
            gt_depth = M.ground_truth_depth(pair.gt_disp_left, gt_r,
                                            pair.calib, w, h)
            depth_metrics = M.compare_depth(gt_depth, depth,
                                            self.config.abs_thresh_mm)
            disp_metrics = M.compare_disparity(pair.gt_disp_left, disp,
                                               self.config.disp_tau)
        else:
            depth_metrics = M.DepthMetrics(*([float("nan")] * 2), 0,
                                           *([float("nan")] * 3))
            disp_metrics = {"bad_tau": float("nan"), "avg_err": float("nan"),
                            "density": 0.0, "n_valid": 0}

        return {
            "name": pair.name,
            "duration_s": duration,
            "rmse_mm": depth_metrics.rmse,
            "bpr": depth_metrics.bpr,
            "n_valid": depth_metrics.n_valid,
            "me_mm": depth_metrics.me,
            "b1m": depth_metrics.b1m,
            "b1dm": depth_metrics.b1dm,
            f"disp_bad{self.config.disp_tau:g}": disp_metrics["bad_tau"],
            "disp_avg_err": disp_metrics["avg_err"],
            "disp_density": disp_metrics["density"],
            "valid_frac": float(valid.mean()),
        }

    # -- batched run --------------------------------------------------------
    def run_batched(self, folders: Sequence[PathLike],
                    client_id: str = "tpu-engine") -> dict:
        """Batched evaluation: same-shape pairs stream through
        ``match_batch`` in ``batch_size`` groups with background prefetch
        (the KITTI-2015 batched-eval configuration, BASELINE.json) —
        per-pair metrics, per-batch device time split evenly across the
        batch.  Unlike the reference's stats (which time the full network
        round trip), durations here are RTT-cancelled device times — see
        Timing below; don't mix stats files across the two definitions.

        Pairs within a batch must share the per-pair disparity range (the
        engine is built from the first pair's; a silent mismatch would
        score the others with a truncated range) — set ``max_disparity``
        for mixed datasets.  ``resume`` skips pairs already present in the
        stats file, exactly like ``run``.

        Timing: each batch is timed with the RTT-cancelling chained
        methodology (``chained_match_time`` on ``match_batch``) — a single
        ``perf_counter`` around one dispatch would embed one ~300 ms relay
        round trip per batch (~40 ms/frame of pure tunnel at batch 8 on a
        3 ms frame).  Batched runs use a reduced iteration count (the batch
        itself already amortises noise)."""
        from ..data.pipeline import batched_pair_stream

        done = self._load_resume()
        todo = [f for f in folders
                if getattr(f, "name", None) not in done]
        measurements: List[dict] = [
            dict(done[f.name]) for f in folders
            if getattr(f, "name", None) in done]

        iters, repeats = self.config.resolved_timing()
        if self.config.timing_iters is None:
            # default only: the batch already amortises noise, so the
            # backend-default chain shortens 4x — an explicit --timing-iters
            # is honoured verbatim
            iters = max(2, iters // 4)
        for lefts, rights, pairs in batched_pair_stream(
                todo, self.config.batch_size):
            if self.config.max_disparity is None \
                    and self.config.use_pair_disparity_range:
                ranges = {(p.dmin, p.dmax) for p in pairs}
                if len(ranges) > 1:
                    raise ValueError(
                        f"mixed disparity ranges in one batch {ranges}: "
                        "pass max_disparity or group datasets by range")
            engine = self._engine_for(pairs[0])
            # chained_match_time warms up (compile excluded, as in the
            # reference — board boot excluded) and returns the unperturbed
            # batch result plus the RTT-cancelled seconds per batch step;
            # per-batch retry ladder on transient relay faults
            dt_batch, disps = self._measure_with_retry(
                engine.match_batch, lefts, rights,
                iters=iters, repeats=repeats)
            dt = dt_batch / len(pairs)
            for pair, disp in zip(pairs, disps):
                measurements.append(self._metrics_for(pair, disp, dt))
            if self.config.stats_path:
                self._write_stats(client_id, self._renumbered(measurements))
        # resumed + fresh measurements can interleave (and a fully-resumed
        # run skips the loop entirely): renumber seq over the final order so
        # ids stay unique and contiguous (run() does the same via enumerate)
        return self._write_stats(client_id, self._renumbered(measurements))

    @staticmethod
    def _renumbered(measurements: List[dict]) -> List[dict]:
        for i, m in enumerate(measurements):
            m["seq"] = i
        return measurements

    def _load_resume(self) -> Dict[str, dict]:
        """Prior measurements keyed by pair name, when resuming.

        Refuses a stats file written under a different (or pre-stamp,
        i.e. wall-clock) timing methodology: blending RTT-inclusive and
        RTT-cancelled durations in one file would corrupt its fps."""
        if not (self.config.resume and self.config.stats_path
                and Path(self.config.stats_path).exists()):
            return {}
        prev = json.loads(Path(self.config.stats_path).read_text())
        meth = prev.get("timing_methodology")
        if prev.get("measurements") and meth != TIMING_METHODOLOGY:
            raise ValueError(
                f"stats file {self.config.stats_path} was written under "
                f"timing methodology {meth!r}; this harness writes "
                f"{TIMING_METHODOLOGY!r} durations — resuming would mix "
                "the two definitions in one file. Use a fresh --stats "
                "path (or delete the old file) instead.")
        return {m["name"]: m for m in prev.get("measurements", [])}

    # -- full run -----------------------------------------------------------
    def run(self, folders: Sequence[PathLike], client_id: str = "tpu-engine") -> dict:
        """Sequential (unbatched) evaluation with background IO: pair
        loading runs on a prefetch thread so disk/decode overlaps device
        compute, the same double-buffering the reference's superloop gets
        from its two-slot shared memory (main.c:224-233)."""
        from ..data.pipeline import PrefetchIterator

        done = self._load_resume()

        def staged():
            # producer thread: loads happen here, overlapping evaluate_pair
            for folder in folders:
                # resume fast path: lazy handles (KittiFrameRef, Path)
                # carry a .name — skip loading the frame entirely
                hint = getattr(folder, "name", None)
                if hint is not None and hint in done:
                    yield hint, None
                else:
                    yield None, load_pair(folder)

        measurements: List[dict] = []
        with PrefetchIterator(staged(), depth=2) as stream:
            for seq, (hint, pair) in enumerate(stream):
                if pair is None:
                    m = dict(done[hint])
                elif pair.name in done:
                    m = dict(done[pair.name])
                else:
                    m = self.evaluate_pair(pair)
                m["seq"] = seq
                measurements.append(m)
                if self.config.stats_path:
                    self._write_stats(client_id, measurements)

        return self._write_stats(client_id, measurements)

    def _write_stats(self, client_id: str, measurements: List[dict]) -> dict:
        total_time = sum(m["duration_s"] for m in measurements)
        stats = {
            "client": client_id,
            "timestamp": time.strftime("%Y-%m-%d %H:%M:%S", time.localtime()),
            "timing_methodology": TIMING_METHODOLOGY,
            "total_frames": len(measurements),
            "total_time_s": total_time,
            "fps": len(measurements) / total_time if total_time > 0 else 0,
            "measurements": measurements,
        }
        if self.config.stats_path:
            p = Path(self.config.stats_path)
            p.parent.mkdir(parents=True, exist_ok=True)
            p.write_text(json.dumps(stats, indent=2))
        return stats


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", type=Path, default=None,
                    help="base folder; every subdir with calib.txt or a "
                         "Middlebury PNG pair is evaluated "
                         "(default: the reference repo's Data/)")
    ap.add_argument("--stats", type=Path, default=Path("result/stats/tpu-engine.json"))
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--max-disparity", type=int, default=None)
    ap.add_argument("--num-paths", type=int, default=8, choices=(4, 8))
    ap.add_argument("--batched", action="store_true",
                    help="stream same-shape pairs through match_batch in "
                         "batch-size groups (KITTI-2015 batched eval)")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--timing-iters", type=int, default=None,
                    help="chained-timing chain length per pair (default: "
                         "32 on TPU, 2 elsewhere — the TPU relay's RTT "
                         "variance needs the long chain, CPU runs don't)")
    ap.add_argument("--timing-repeats", type=int, default=None,
                    help="min-of-N repeats per chain length (default: 3 on "
                         "TPU, 1 elsewhere)")
    args = ap.parse_args(argv)

    # Relay-outage probe before any in-process jax use (a failed first init
    # poisons the backend for the process lifetime — utils/relay doc).
    # Skipped when the run is pinned to CPU: a CPU directory eval should not
    # block on TPU-tunnel weather.
    import os

    want_cpu = "cpu" in os.environ.get("JAX_PLATFORMS", "").lower()
    if want_cpu:
        # the axon plugin overrides the env var; honour it via the config API
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass  # backend already initialised
    else:
        from ..utils.relay import wait_for_backend

        wait_for_backend()

    if args.data is not None and (Path(args.data) / "image_2").is_dir():
        from ..data.datasets import kitti_frame_refs

        # lazy refs: each frame is loaded inside the evaluation loop
        folders = kitti_frame_refs(args.data)
    elif args.data is not None:
        folders = discover_datasets(args.data) or sorted(
            p for p in Path(args.data).iterdir() if p.is_dir())
    else:
        folders = reference_data_pairs()
    if not folders:
        raise SystemExit("no datasets found")

    harness = EvaluationHarness(
        SGMOptions(num_paths=args.num_paths),
        HarnessConfig(stats_path=args.stats, resume=args.resume,
                      max_disparity=args.max_disparity,
                      batch_size=args.batch_size,
                      timing_iters=args.timing_iters,
                      timing_repeats=args.timing_repeats),
    )
    stats = harness.run_batched(folders) if args.batched \
        else harness.run(folders)
    for m in stats["measurements"]:
        print(f"{m['name']:12s} rmse={m['rmse_mm']:.2f}mm bpr={m['bpr']:.4f} "
              f"bad3={m.get('disp_bad3', float('nan')):.4f} "
              f"t={m['duration_s'] * 1e3:.1f}ms")
    print(f"FPS={stats['fps']:.2f} over {stats['total_frames']} frames")
    return stats


if __name__ == "__main__":
    main()
