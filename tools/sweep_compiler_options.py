"""Sweep XLA TPU compiler options on the dense-eval descriptor program.

The axon client rejects backend flags in ``XLA_FLAGS`` (they are libtpu
flags, parsed server-side), so each variant is compiled via
``jax.jit(...).lower(...).compile(compiler_options=...)`` — the options
ride the compile RPC. Timing methodology matches bench.py (chained
dispatches, one float() sync).

Usage: python tools/sweep_compiler_options.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

MICRO_BATCH = 96
SEQ_LEN = 8
H, W = 256, 128

VARIANTS = {
    "default": None,
    "vmem_24m": {"xla_tpu_scoped_vmem_limit_kib": "24576"},
    "vmem_32m": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    "vmem_40m": {"xla_tpu_scoped_vmem_limit_kib": "40960"},
    "default2": None,
    "vmem_32m_2": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
}


def main():
    from grl_tpu import models
    from grl_tpu.data.transforms import normalize

    cnn = models.create("resnet50_grl", compute_dtype=jnp.bfloat16)
    siamese = models.create(
        "siamese", input_num=cnn.num_feat, output_num=512, compute_dtype=jnp.bfloat16
    )
    params, state = cnn.init(jax.random.PRNGKey(0))
    sp, ss = siamese.init(jax.random.PRNGKey(1))

    def describe(params, state, sp, ss, clips_u8):
        clips = normalize(clips_u8)
        (x_uncorr, x_corr), _ = cnn.apply(params, state, clips, training=False)
        pooled, _ = siamese.self_attention(sp, ss, x_corr, training=False)
        return jnp.concatenate([x_uncorr, pooled, jnp.mean(x_corr, axis=1)], axis=1)

    clips = jnp.asarray(
        np.random.RandomState(0).randint(
            0, 256, (MICRO_BATCH, SEQ_LEN, H, W, 3), np.uint8
        )
    )
    args = (params, state, sp, ss, clips)
    lowered = jax.jit(describe).lower(*args)

    for name, opts in VARIANTS.items():
        try:
            t0 = time.perf_counter()
            compiled = lowered.compile(
                compiler_options=opts) if opts else lowered.compile()
            t_compile = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001 - report and continue the sweep
            print(f"{name}: compile failed: {type(e).__name__}: {e}")
            continue

        def timed(iters):
            t0 = time.perf_counter()
            acc = jnp.float32(0)
            for _ in range(iters):
                acc = acc + jnp.sum(compiled(*args))
            float(acc)
            return time.perf_counter() - t0

        timed(2)  # warm
        rates = []
        for _ in range(3):
            dt = timed(10)
            rates.append(MICRO_BATCH * 10 / dt)
        print(
            f"{name}: {', '.join(f'{r:.0f}' for r in rates)} clips/s "
            f"(compile {t_compile:.1f}s)"
        )


if __name__ == "__main__":
    main()
