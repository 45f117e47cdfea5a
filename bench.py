"""Headline benchmark: MARS dense-eval clip-descriptor throughput per chip.

Measures the hot path of the evaluation stack (BASELINE.json north star:
"MARS clip features/sec/chip"): full-size ResNet-50 + GCE + TRL + attention
pooling producing the 6144-d descriptor for 8-frame 256x128 clips, bf16
compute, on the attached TPU. Also times the MARS-scale evaluation tail
(1980x11310 cosine distmat + device CMC/mAP protocol, 6144-d) and reports
it as ``gallery_queries_per_sec`` — the second north-star throughput in
BASELINE.json's metric line — so an eval-tail regression shows up in the
per-round BENCH_r*.json series, not just in docs/PERFORMANCE.md prose.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "clips/s", "vs_baseline": N,
   "gallery_queries_per_sec": N, ...}

The reference publishes no throughput numbers (BASELINE.md: "none
recorded") and no GPU is attached here, so the anchor is MEASURED from
the reference's own code on this VM's CPU: ``vs_baseline`` divides by
the reference ResNet50_GRL_Model dense-eval descriptor rate measured by
``tools/measure_reference_cpu.py`` (torch 2.13 CPU, 1 core — clearly a
different device class than the TPU numerator; the same-hardware
CPU-vs-CPU comparison is also recorded there and in docs/PERFORMANCE.md:
grl_tpu runs 1.3-1.6x the reference on the identical core). The round
1-2 nominal 100 clips/s anchor is kept as ``vs_nominal_100`` so the
earlier series stays comparable.
"""

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# tools/measure_reference_cpu.py, 2026-08-17 (two runs: 0.533 / 0.525;
# same-CPU grl_tpu fp32: 0.679 / 0.834 clips/s)
REF_CPU_MEASURED_CLIPS_PER_SEC = 0.53
REF_NOMINAL_CLIPS_PER_SEC = 100.0  # rounds 1-2 continuity anchor
MICRO_BATCH = 96  # measured best on v5e (64: 1077, 96: 1110, 112: 1076 clips/s)
SEQ_LEN = 8
H, W = 256, 128


def gallery_tail_queries_per_sec():
    """MARS-scale eval tail: 1980x11310 cosine distmat + device CMC/mAP.

    Features are generated and L2-normalized ON the device (the tail's
    cost is independent of feature values, and synthesizing on-chip keeps
    the ~330 MB of fp32 features off the 4-97 MB/s tunnel). Warm rate;
    evaluate_device pulls the CMC curve to host, which is the only true
    sync on the axon link.
    """
    from grl_tpu.engine import metrics
    from grl_tpu.engine.evaluator import cosine_distance

    q, extra_g, dim = 1980, 9330, 6144
    kq, kg = jax.random.split(jax.random.PRNGKey(0))
    qf = jax.random.normal(kq, (q, dim), jnp.float32)
    qf = qf / jnp.linalg.norm(qf, axis=1, keepdims=True)
    gfr = jax.random.normal(kg, (extra_g, dim), jnp.float32)
    gfr = gfr / jnp.linalg.norm(gfr, axis=1, keepdims=True)
    gf = jnp.concatenate([qf, gfr])  # reference protocol: gallery = query U gallery
    rng = np.random.RandomState(0)
    q_pids = rng.randint(0, q, q)
    g_pids = np.concatenate([q_pids, rng.randint(0, q, extra_g)])
    q_cams = rng.randint(0, 6, q)
    g_cams = np.concatenate([q_cams, rng.randint(0, 6, extra_g)])

    def tail():
        dist = cosine_distance(qf, gf)
        return metrics.evaluate_device(dist, q_pids, g_pids, q_cams, g_cams)

    tail()  # compile + warm
    t0 = time.perf_counter()
    tail()
    dt = time.perf_counter() - t0
    return q / dt


def main():
    from grl_tpu.utils.profiling import descriptor_compiler_options, enable_compilation_cache

    enable_compilation_cache()
    from grl_tpu import models
    from grl_tpu.data.transforms import normalize

    cnn = models.create("resnet50_grl", compute_dtype=jnp.bfloat16)
    siamese = models.create(
        "siamese", input_num=cnn.num_feat, output_num=512, compute_dtype=jnp.bfloat16
    )
    rng = jax.random.PRNGKey(0)
    params, state = cnn.init(rng)
    sp, ss = siamese.init(jax.random.PRNGKey(1))

    @partial(jax.jit, compiler_options=descriptor_compiler_options())
    def describe(params, state, sp, ss, clips_u8):
        clips = normalize(clips_u8)
        (x_uncorr, x_corr), _ = cnn.apply(params, state, clips, training=False)
        pooled, _ = siamese.self_attention(sp, ss, x_corr, training=False)
        return jnp.concatenate([x_uncorr, pooled, jnp.mean(x_corr, axis=1)], axis=1)

    clips = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (MICRO_BATCH, SEQ_LEN, H, W, 3), np.uint8)
    )

    # NOTE: on the axon-tunneled TPU, block_until_ready() returns before the
    # device finishes; only a host materialization truly synchronizes. Each
    # timing window therefore chains the outputs into one scalar and fetches
    # it with float().
    def timed(iters):
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        for _ in range(iters):
            acc = acc + jnp.sum(describe(params, state, sp, ss, clips))
        float(acc)
        return time.perf_counter() - t0

    timed(1)  # compile + warmup
    timed(2)  # spin up steady-state clocks
    dt = timed(10)

    clips_per_sec = MICRO_BATCH * 10 / dt
    queries_per_sec = gallery_tail_queries_per_sec()
    print(
        json.dumps(
            {
                "metric": "mars_clip_features_per_sec_per_chip",
                "value": round(clips_per_sec, 2),
                "unit": "clips/s",
                "vs_baseline": round(clips_per_sec / REF_CPU_MEASURED_CLIPS_PER_SEC, 1),
                "baseline": "reference dense-eval descriptor path, "
                            f"{REF_CPU_MEASURED_CLIPS_PER_SEC} clips/s cpu-measured "
                            "on this VM (tools/measure_reference_cpu.py; 1 TPU chip "
                            "vs 1 host core — same-CPU ratio is 1.3-1.6x)",
                "vs_nominal_100": round(clips_per_sec / REF_NOMINAL_CLIPS_PER_SEC, 3),
                "gallery_queries_per_sec": round(queries_per_sec, 1),
                "gallery_scale": "MARS 1980x11310, 6144-d, distmat + device CMC/mAP, warm",
            }
        )
    )


if __name__ == "__main__":
    main()
