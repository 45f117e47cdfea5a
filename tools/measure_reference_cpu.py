"""Measure the REFERENCE's dense-eval descriptor throughput on this CPU.

The reference repo publishes no throughput numbers (BASELINE.md) and no
GPU is attached here, so the only *measurable* anchor is the reference's
own evaluator hot path (attevaluator.py:58-123) run on this VM's CPU:
eval-mode ResNet50_GRL_Model forward in chunks of 8 clips + the Siamese
attention pooling, concatenated into the 6144-d descriptor.

For a same-hardware ratio it also times grl_tpu's descriptor path on the
SAME CPU (fp32, same micro-batch). Prints one JSON line; the measured
numbers are recorded in bench.py (REF_CPU_MEASURED) and
docs/PERFORMANCE.md.

Usage: python tools/measure_reference_cpu.py [--chunks 3]
"""

import argparse
import json
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))
sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "tests"))

CHUNK = 8  # the reference's eval micro-batch (attevaluator.py:74-76)
SEQ_LEN = 8
H, W = 256, 128


def measure_reference(chunks):
    import torch

    from reference_loader import load_reference_models

    ref = load_reference_models()
    cnn = ref.grl_model.ResNet50_GRL_Model(pretrained=False, numclasses=0).eval()
    sia = ref.Siamese.Siamese(2048, 512, 2).eval()

    clips = torch.from_numpy(
        np.random.RandomState(0).rand(CHUNK, SEQ_LEN, 3, H, W).astype(np.float32)
    )
    with torch.no_grad():
        # warmup (allocator, conv algorithm selection)
        cnn(clips[:2, :2].contiguous())
        t0 = time.perf_counter()
        for _ in range(chunks):
            x_uncorr, x_corr = cnn(clips)
            pooled = sia.self_attention(x_corr)
            desc = torch.cat((x_uncorr, pooled, x_corr.mean(dim=1)), dim=1)
            assert desc.shape == (CHUNK, 6144)
        dt = time.perf_counter() - t0
    return CHUNK * chunks / dt


def measure_grl_tpu(chunks):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from grl_tpu import models
    from grl_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    cnn = models.create("resnet50_grl")  # fp32: CPU apples-to-apples
    sia = models.create("siamese", input_num=cnn.num_feat, output_num=512)
    params, state = cnn.init(jax.random.PRNGKey(0))
    sp, ss = sia.init(jax.random.PRNGKey(1))

    @jax.jit
    def describe(params, state, sp, ss, clips):
        (x_uncorr, x_corr), _ = cnn.apply(params, state, clips, training=False)
        pooled, _ = sia.self_attention(sp, ss, x_corr, training=False)
        return jnp.concatenate([x_uncorr, pooled, jnp.mean(x_corr, axis=1)], axis=1)

    clips = jnp.asarray(
        np.random.RandomState(0).rand(CHUNK, SEQ_LEN, H, W, 3).astype(np.float32)
    )
    np.asarray(describe(params, state, sp, ss, clips))  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(chunks):
        np.asarray(describe(params, state, sp, ss, clips))
    dt = time.perf_counter() - t0
    return CHUNK * chunks / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=3)
    ap.add_argument("--skip-grl", action="store_true")
    args = ap.parse_args()

    ref = measure_reference(args.chunks)
    out = {
        "reference_cpu_clips_per_sec": round(ref, 3),
        "chunk": CHUNK,
        "seq_len": SEQ_LEN,
        "note": "reference ResNet50_GRL_Model dense-eval descriptor path, "
                "torch CPU on this VM (1 core)",
    }
    if not args.skip_grl:
        ours = measure_grl_tpu(args.chunks)
        out["grl_tpu_cpu_clips_per_sec"] = round(ours, 3)
        out["same_cpu_speedup"] = round(ours / ref, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
