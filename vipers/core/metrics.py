"""Metrics: structured JSONL writer + smoothed console meters.

Replaces the reference's ``MetricLogger``/``SmoothedValue``
(`/root/reference/utils.py:14-156`) and its scattered flat-file artifact
formats (``performance.txt``, ``results_iteration_NN.txt``, per-method
RMA/RRA txt files).  One JSONL stream carries everything; small helpers
re-emit the reference's legacy text contracts so the plotting layer (and any
external consumer of the reference's files) keeps working.
"""

from __future__ import annotations

import collections
import json
import math
import os
import time
from typing import Dict, Optional


class SmoothedScalar:
    """Windowed + global average of a scalar series.

    Mirrors the semantics of the reference SmoothedValue
    (`/root/reference/utils.py:14-66`): a deque window for display plus a
    running global sum/count.
    """

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.window = collections.deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1):
        value = float(value)
        self.window.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self) -> float:
        if not self.window:
            return math.nan
        s = sorted(self.window)
        return s[len(s) // 2]

    @property
    def avg(self) -> float:
        if not self.window:
            return math.nan
        return sum(self.window) / len(self.window)

    @property
    def global_avg(self) -> float:
        if self.count == 0:
            return math.nan
        return self.total / self.count

    @property
    def value(self) -> float:
        return self.window[-1] if self.window else math.nan

    def __str__(self):
        return self.fmt.format(
            median=self.median, avg=self.avg, global_avg=self.global_avg, value=self.value
        )


class MeterSet:
    """A named collection of SmoothedScalars with periodic console logging."""

    def __init__(self, delimiter: str = "  "):
        self.meters: Dict[str, SmoothedScalar] = collections.defaultdict(SmoothedScalar)
        self.delimiter = delimiter

    def update(self, n: int = 1, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(v, n=n)

    def __getattr__(self, name):
        meters = object.__getattribute__(self, "meters")
        if name in meters:
            return meters[name]
        raise AttributeError(name)

    def __str__(self):
        return self.delimiter.join(f"{k}: {m}" for k, m in self.meters.items())

    def log_every(self, iterable, print_freq: int, header: str = "",
                  total: Optional[int] = None, pre_print=None):
        """Yield items, printing progress/ETA every ``print_freq`` steps.

        Counterpart of `/root/reference/utils.py:101-156`.  ``pre_print``
        (optional callable) runs immediately before each print — the train
        loop uses it to flush its grouped device-metric fetches so every
        printed meter value matches the old per-step-fetch output exactly.
        """
        if total is None:
            try:
                total = len(iterable)  # type: ignore[arg-type]
            except TypeError:
                total = None
        start = time.time()
        iter_time = SmoothedScalar(fmt="{avg:.4f}")
        data_time = SmoothedScalar(fmt="{avg:.4f}")
        end = time.time()
        for i, obj in enumerate(iterable):
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if print_freq and i % print_freq == 0:
                if pre_print is not None:
                    pre_print()
                if total:
                    eta = iter_time.global_avg * (total - i)
                    eta_str = f" eta: {eta:.0f}s"
                    pos = f"[{i}/{total}]"
                else:
                    eta_str = ""
                    pos = f"[{i}]"
                print(
                    f"{header} {pos}{eta_str}  {self}  "
                    f"time: {iter_time}  data: {data_time}"
                )
            end = time.time()
        elapsed = time.time() - start
        print(f"{header} Total time: {elapsed:.1f}s")


class MetricsWriter:
    """Append-only JSONL metrics stream, one record per event.

    Record schema: {"ts": float, "step": int|None, "tag": str, **scalars}.
    ``export_performance_txt`` reproduces the reference's ``performance.txt``
    contract (header line, then one ``acc1\\tsparsity`` row per pruning
    iteration — consumed at `/root/reference/explain.py:272-284`,
    `/root/reference/lost_performance_plot.py:72-89`).
    """

    def __init__(self, path: Optional[str], also_print: bool = False,
                 wandb_run=None, use_wandb: bool = False):
        self.path = path
        self.also_print = also_print
        # Optional wandb adapter (the reference logs per-epoch scalars to
        # wandb — `/root/reference/train.py:86-89,546-557`); gated because
        # the dependency may be absent.
        self._wandb = wandb_run
        if use_wandb and wandb_run is None:
            try:  # pragma: no cover - depends on environment
                import wandb

                self._wandb = wandb.run or wandb.init(project="vipers")
            except Exception as e:
                print(f"[vipers.metrics] wandb unavailable: {e}")
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._fh = open(path, "a", buffering=1)
        else:
            self._fh = None

    def write(self, tag: str, step: Optional[int] = None, **scalars):
        rec = {"ts": time.time(), "tag": tag, "step": step}
        for k, v in scalars.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
        if self.also_print:
            print(json.dumps(rec))
        if self._wandb is not None:  # pragma: no cover
            payload = {f"{tag}/{k}": v for k, v in rec.items()
                       if k not in ("ts", "tag", "step")}
            self._wandb.log(payload, step=step)
        return rec

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None

    @staticmethod
    def export_performance_txt(path: str, rows, header: str = "acc1\tsparsity"):
        """rows: iterable of (acc1, sparsity) per pruning iteration."""
        with open(path, "w") as f:
            f.write(header + "\n")
            for acc1, sparsity in rows:
                f.write(f"{acc1}\t{sparsity}\n")

    @staticmethod
    def read_performance_txt(path: str):
        """Parse the reference's performance.txt: skip header, tab-separated."""
        rows = []
        with open(path) as f:
            lines = f.read().strip().splitlines()
        for line in lines[1:]:
            parts = line.replace(",", "\t").split("\t")
            if len(parts) >= 2:
                rows.append((float(parts[0]), float(parts[1])))
        return rows
