"""Sweep XLA TPU compiler options on the full-size training step.

Same methodology as tools/sweep_compiler_options.py but over the jitted
train step (model fwd/bwd + 5-term loss + SGD + OIM lut updates) at the
reference batch (16 clips = 8 pairs, seq_len 8, bf16).

Usage: python tools/sweep_train_compiler_options.py
"""

import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 16
SEQ_LEN = 8
H, W = 256, 128
NUM_CLASSES = 625

VARIANTS = {
    "default": None,
    # round-4 backward-conv candidates (VERDICT next-5): the roofline
    # table (tools/profile_train_step.py --roofline convolution) shows the
    # conv time 95% at >=70% of its binding roofline, so these probe the
    # residual scheduling/fusion margins rather than a known pathology.
    "vmem_64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "autotune_fusions": {"xla_tpu_autotune_fusions": "true"},
    "conv_input_downcast_fusion": {
        "xla_tpu_allow_conv_input_fusion_with_downcast_convert": "true"
    },
    "default2": None,
    "vmem_32m": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
}


def main():
    from grl_tpu import models
    from grl_tpu.engine.optim import SGD
    from grl_tpu.engine.train_step import init_train_state, make_train_step

    cnn = models.create("resnet50_grl", compute_dtype=jnp.bfloat16)
    siamese = models.Siamese(
        input_num=cnn.num_feat, output_num=512, compute_dtype=jnp.bfloat16
    )
    uncorr = models.SiameseVideo(input_num=cnn.num_feat, compute_dtype=jnp.bfloat16)
    optimizer = SGD()
    train_state = init_train_state(
        jax.random.PRNGKey(0), cnn, siamese, uncorr, NUM_CLASSES, cnn.num_feat,
        optimizer,
    )

    rng = np.random.RandomState(0)
    clips = jnp.asarray(rng.randn(BATCH, SEQ_LEN, H, W, 3).astype(np.float32))
    pids = np.repeat(np.arange(BATCH // 2) % NUM_CLASSES, 2).astype(np.int32)
    targets = jnp.asarray(pids)

    step_fn = make_train_step(cnn, siamese, uncorr, optimizer, donate=False)
    # make_train_step returns a jitted callable; re-lower its wrapped fn so
    # compiler options can vary per variant
    inner = getattr(step_fn, "__wrapped__", step_fn)
    lowered = jax.jit(inner).lower(train_state, clips, targets, 1e-3)

    for name, opts in VARIANTS.items():
        try:
            t0 = time.perf_counter()
            compiled = (
                lowered.compile(compiler_options=opts) if opts else lowered.compile()
            )
            t_compile = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001
            print(f"{name}: compile failed: {type(e).__name__}: {e}")
            continue

        def timed(iters):
            st = train_state
            t0 = time.perf_counter()
            acc = jnp.float32(0)
            for _ in range(iters):
                st, metrics = compiled(st, clips, targets, 1e-3)
                acc = acc + metrics["loss"]
            float(acc)
            return time.perf_counter() - t0

        timed(2)  # warm
        times = []
        for _ in range(3):
            dt = timed(10)
            times.append(dt / 10 * 1000)
        print(
            f"{name}: {', '.join(f'{t:.1f}' for t in times)} ms/step "
            f"(compile {t_compile:.1f}s)"
        )


if __name__ == "__main__":
    main()
