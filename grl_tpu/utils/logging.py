"""Console/file tee logger + scalar metric writer.

``Logger`` mirrors reference utils/logging.py:8-39 (stdout tee with flush
to disk). ``ScalarWriter`` replaces tensorboardX (trainer.py:63-65) with a
dependency-free JSONL scalar log that TensorBoard-style tooling or plain
numpy can consume.
"""

from __future__ import annotations

import json
import os
import os.path as osp
import sys


class Logger:
    def __init__(self, fpath=None):
        self.console = sys.stdout
        self.file = None
        if fpath is not None:
            os.makedirs(osp.dirname(fpath) or ".", exist_ok=True)
            self.file = open(fpath, "w")

    def __del__(self):
        self.close()

    def __enter__(self):
        return self

    def __exit__(self, *args):
        self.close()

    def write(self, msg):
        try:
            self.console.write(msg)
        except OSError:
            # a dead controlling terminal / broken stdout pipe (orphaned
            # nohup jobs, killed wrappers) must not take the run down —
            # especially not inside the SIGTERM handler's print, where it
            # would abort the graceful checkpoint
            pass
        if self.file is not None:
            self.file.write(msg)
            # hit disk per write like the reference (utils/logging.py:30-33):
            # training logs are monitored with tail -f and must survive a
            # hard kill mid-epoch
            self.file.flush()

    def flush(self):
        try:
            self.console.flush()
        except OSError:
            pass
        if self.file is not None:
            self.file.flush()
            os.fsync(self.file.fileno())

    def close(self):
        try:
            self.console.flush()
        except OSError:
            pass
        if self.file is not None:
            self.file.close()
            self.file = None


class ScalarWriter:
    """Append-only JSONL scalar stream: one {tag, step, value} per line.

    ``tensorboard=True`` additionally writes TensorBoard event files via
    tensorboardX (the reference's scalar surface, trainer.py:63-65), and
    ``wipe=True`` clears stale event files from the logdir first — the
    reference's remove_repeat_tensorboard_files (serialization.py:85-91).
    """

    def __init__(self, logdir, tensorboard=False, wipe=False):
        os.makedirs(logdir, exist_ok=True)
        if wipe:
            for name in os.listdir(logdir):
                if name.startswith("events.out.tfevents") or name == "scalars.jsonl":
                    os.remove(osp.join(logdir, name))
        self.path = osp.join(logdir, "scalars.jsonl")
        self._f = open(self.path, "a")
        self._tb = None
        if tensorboard:
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(logdir)

    def add_scalar(self, tag, value, step):
        self._f.write(json.dumps({"tag": tag, "step": int(step), "value": float(value)}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))

    def flush(self):
        self._f.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()
