"""Epoch-level training orchestration (reference reid/train/trainer.py).

Hosts the loader loop around the jitted train step: device transfer,
on-device augmentation with a per-step PRNG, meters, periodic console
prints (every 100 steps, trainer.py:68-78), and per-step scalar logging
(trainer.py:63-65, JSONL instead of tensorboardX).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from ..data.transforms import augment
from ..utils.meters import AverageMeter


class Trainer:
    def __init__(self, train_step, scalar_writer=None, print_freq=100, seed=0, mesh=None,
                 stop_event=None):
        self.train_step = train_step
        self.writer = scalar_writer
        self.print_freq = print_freq
        self.rng = jax.random.PRNGKey(seed)
        # data-parallel mesh (parallel/mesh.py): the uint8 batch is sharded
        # over its pair axis before the on-device augment, so augmentation
        # and the train step both run SPMD; train_state must already be
        # replicated by the caller
        self.mesh = mesh
        # graceful preemption: when set (e.g. by the CLI's SIGTERM handler),
        # the epoch loop stops at the next step boundary with a consistent
        # train_state the caller can checkpoint
        self.stop_event = stop_event
        self._multi_process = jax.process_count() > 1

    # multi-host: how often (in steps) the collective stop check runs. The
    # allgather's device_get would otherwise serialize host and device
    # every step, defeating the one-step metric pipelining below; at ~10
    # steps the preemption response stays well inside a SIGTERM grace
    # window while the barrier cost amortizes away.
    STOP_SYNC_EVERY = 10

    def _stop_requested(self, step_index):
        """Preemption check at the step boundary.

        Multi-host: the decision must be COLLECTIVE — SIGTERM lands on
        hosts at different times (or on only some), and a host that breaks
        while others dispatch another step leaves that step's gradient
        psum blocked forever. Every host contributes its local flag and
        all stop iff any host saw the signal. The check runs at the same
        step indices on every host (the loaders are capped to equal step
        counts, data/loader.py max_batches), every STOP_SYNC_EVERY steps,
        plus once at the end of every epoch (train()) so short epochs and
        late signals still resolve collectively before the caller's own
        stop_event gate runs.
        """
        local = self.stop_event is not None and self.stop_event.is_set()
        if not self._multi_process:
            return local
        if step_index % self.STOP_SYNC_EVERY:
            return False
        return self._collective_stop()

    def _collective_stop(self):
        """Allgather the local stop flag; any host's signal stops ALL hosts
        — and is propagated into every host's stop_event, so the caller's
        post-epoch ``stop.is_set()`` checkpoint gate fires on hosts that
        never received the signal themselves. Must be called the same
        number of times on every host."""
        import numpy as np
        from jax.experimental import multihost_utils

        local = self.stop_event is not None and self.stop_event.is_set()
        stop = bool(multihost_utils.process_allgather(np.int32(local)).max())
        if stop and self.stop_event is not None:
            self.stop_event.set()
        return stop

    def train(self, epoch, train_state, loader, lr):
        batch_time = AverageMeter()
        data_time = AverageMeter()
        losses = AverageMeter()
        prec_uncorr = AverageMeter()
        prec_vid = AverageMeter()
        prec_frame = AverageMeter()

        num_steps = len(loader)
        end = time.time()

        def materialize(pending):
            """Fetch a dispatched step's metric scalars and log them.

            Deferred by one step: the host never blocks on step i before
            step i+1's batch is dispatched, so the next batch's upload and
            augment overlap the device's current compute — on the tunneled
            TPU the upload is the dominant per-step cost.
            """
            m, n, i = pending
            losses.update(float(m["loss"]), n)
            prec_uncorr.update(float(m["prec_uncorr"]), n)
            prec_vid.update(float(m["prec_vid"]), n)
            prec_frame.update(float(m["prec_frame"]), n)
            step = num_steps * epoch + i
            if self.writer is not None:
                self.writer.add_scalar("train/total_loss_step", losses.val, step)
                self.writer.add_scalar("train/total_loss_avg", losses.avg, step)
            if (i + 1) % self.print_freq == 0:
                print(
                    "Epoch: [{}][{}/{}]\t"
                    "Loss {:.3f} ({:.3f})\t"
                    "uncorr_vid {:.2%} ({:.2%})\t"
                    "corr_vid {:.2%} ({:.2%})\t"
                    "corr_frame {:.2%} ({:.2%})\t".format(
                        epoch, i + 1, num_steps,
                        losses.val, losses.avg,
                        prec_uncorr.val, prec_uncorr.avg,
                        prec_vid.val, prec_vid.avg,
                        prec_frame.val, prec_frame.avg,
                    )
                )

        pending = None
        for i, (clips_u8, pids, _camids) in enumerate(loader):
            if self._stop_requested(i):
                print(f"Epoch: [{epoch}][{i}/{num_steps}]\tstop requested; "
                      "ending epoch early")
                break
            data_time.update(time.time() - end)

            self.rng, aug_rng = jax.random.split(self.rng)
            already_global = isinstance(clips_u8, jax.Array)
            clips_u8 = jnp.asarray(clips_u8)
            targets = jnp.asarray(pids)
            if self.mesh is not None and not already_global:
                # host numpy batch -> shard locally; a multi-host
                # GlobalBatchLoader already delivers globally-sharded
                # jax.Arrays (parallel/multihost.py)
                from ..parallel import shard_batch

                clips_u8 = shard_batch(clips_u8, self.mesh)
                targets = shard_batch(targets, self.mesh)
            clips = augment(aug_rng, clips_u8, train=True)

            train_state, m = self.train_step(train_state, clips, targets, lr)

            if pending is not None:
                materialize(pending)
            pending = (m, pids.shape[0], i)

            batch_time.update(time.time() - end)
            end = time.time()
        if pending is not None:
            materialize(pending)
        if self._multi_process:
            # epoch-boundary collective resolution: every host runs this
            # exactly once per epoch, so a signal that landed after the
            # last periodic check (or on only one host) still sets every
            # host's stop_event before the caller's checkpoint gate
            self._collective_stop()
        if self.writer is not None:
            self.writer.flush()
        return train_state, {
            "loss": losses.avg,
            "prec_uncorr": prec_uncorr.avg,
            "prec_vid": prec_vid.avg,
            "prec_frame": prec_frame.avg,
            "batch_time": batch_time.avg,
            "data_time": data_time.avg,
        }
